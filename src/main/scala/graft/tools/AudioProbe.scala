package graft.tools

/** Margin probe for AudioDedup signatures (r10): resample / gain /
  * cross-seed Hamming distances, swept over the gradient dead-zone.
  * `runMain graft.tools.AudioProbe` */
object AudioProbe {
  def main(args: Array[String]): Unit = {
    import graft.ext.AudioDedup._
    import graft.ext.Multimodal.MediaCodec
    def sig(bytes: Array[Byte], dz: Double): Long = {
      val (fmt, pcm) = MediaCodec.decodeAudio(bytes).get
      signature64(monoSamples(fmt, pcm).get, fmt.getSampleRate.toDouble, dz).get
    }
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val seeds = 0L until 30L
    for (dz <- Seq(0.0, 0.002, 0.005, 0.01, 0.02, 0.04)) {
      val s8 = seeds.map(s => sig(encodeToneWav(8000, 8000, s), dz))
      val s11 = seeds.map(s => sig(encodeToneWav(11025, 11025, s), dz))
      val s16 = seeds.map(s => sig(encodeToneWav(16000, 16000, s), dz))
      val sg = seeds.map(s => sig(encodeToneWav(8000, 8000, s, gain = 0.5), dz))
      val r1 = seeds.indices.map(i => ham(s8(i), s11(i)))
      val r2 = seeds.indices.map(i => ham(s8(i), s16(i)))
      val g = seeds.indices.map(i => ham(s8(i), sg(i)))
      val cross = for { i <- seeds.indices; j <- seeds.indices if i < j }
        yield ham(s8(i), s8(j))
      println(f"dz=$dz%5.3f resample-max=${math.max(r1.max, r2.max)}%2d " +
        f"resample-avg=${(r1.sum + r2.sum) / 60.0}%5.2f gain-max=${g.max}%2d " +
        f"cross-min=${cross.min}%2d cross-avg=${cross.sum.toDouble / cross.size}%5.1f")
    }
  }
}
