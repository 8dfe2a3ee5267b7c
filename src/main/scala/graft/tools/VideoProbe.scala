package graft.tools

/** Margin probe for VideoDedup signatures (r10): frame-rate-doubled /
  * per-frame-JPEG / half-resolution / gain variants vs cross-seed Hamming
  * distances. `runMain graft.tools.VideoProbe` */
object VideoProbe {
  def main(args: Array[String]): Unit = {
    import graft.ext.VideoDedup._
    def sig(bytes: Array[Byte]): Long = signature64(bytes).get._1
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val seeds = 0L until 30L
    val base = seeds.map(s => sig(encodeSyntheticVideo(64, 48, 10.0, 2.0, s)))
    val fps2 = seeds.map(s => sig(encodeSyntheticVideo(64, 48, 20.0, 2.0, s)))
    val jpg  = seeds.map(s => sig(encodeSyntheticVideo(64, 48, 10.0, 2.0, s, jpeg = true)))
    val half = seeds.map(s => sig(encodeSyntheticVideo(32, 24, 10.0, 2.0, s)))
    val gain = seeds.map(s => sig(encodeSyntheticVideo(64, 48, 10.0, 2.0, s, gain = 0.7)))
    def stats(name: String, v: IndexedSeq[Long]): Unit = {
      val d = seeds.indices.map(i => ham(base(i), v(i)))
      println(f"$name%8s max=${d.max}%2d avg=${d.sum / d.size.toDouble}%5.2f")
    }
    stats("fps2", fps2)
    stats("jpeg", jpg)
    stats("half", half)
    stats("gain", gain)
    val cross = for { i <- seeds.indices; j <- seeds.indices if i < j }
      yield ham(base(i), base(j))
    println(f"   cross min=${cross.min}%2d avg=${cross.sum.toDouble / cross.size}%5.1f")
    println("   cross tail: " + cross.sorted.take(12).mkString(" "))
    val worstV = seeds.indices.map(i => math.max(
      math.max(ham(base(i), fps2(i)), ham(base(i), jpg(i))),
      math.max(ham(base(i), half(i)), ham(base(i), gain(i)))))
    println("   per-seed worst variant: " + worstV.mkString(" "))
  }
}
