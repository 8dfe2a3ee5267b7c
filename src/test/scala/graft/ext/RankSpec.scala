package graft.ext

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** [[Rank.pageRank]]: the distributed iteration against an in-memory
  * reference implementation of the same recurrence, plus the structural
  * properties (uniform init, damping-0 degeneration, leak direction). The
  * corpus-scale face is oracle-checked as x39_pagerank. */
class RankSpec extends SparkSpec {
  import spark.implicits._

  //  weighted digraph: 1 →(2) 2, 1 →(1) 3, 2 →(1) 1, 3 has no out-edges
  private val edgeSeq = Seq((1L, 2L, 2.0), (1L, 3L, 1.0), (2L, 1L, 1.0))
  private def edges: DataFrame = edgeSeq.toDF("src", "dst", "w")

  /** reference recurrence, straight off the scaladoc */
  private def reference(iters: Int, d: Double): Map[Long, Double] = {
    val nodes = edgeSeq.flatMap { case (s, t, _) => Seq(s, t) }.distinct
    val n = nodes.size.toDouble
    val outw = edgeSeq.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 0 until iters) {
      r = nodes.map { v =>
        val inflow = edgeSeq.collect {
          case (s, t, w) if t == v => r(s) * w / outw(s)
        }.sum
        v -> ((1 - d) / n + d * inflow)
      }.toMap
    }
    r
  }

  private def run(iters: Int, d: Double = 0.85): Map[Long, Double] =
    Rank.pageRank(edges, iters, d).as[(Long, Double)].collect().toMap

  test("matches the reference recurrence for 0..4 iterations") {
    for (i <- 0 to 4) {
      val got = run(i)
      val want = reference(i, 0.85)
      assert(got.keySet === want.keySet, s"iter $i node set")
      got.foreach { case (id, r) =>
        assert(math.abs(r - want(id)) < 1e-12, s"iter $i node $id: $r vs ${want(id)}")
      }
    }
  }

  test("iteration 0 and damping 0 are both the uniform distribution") {
    assert(run(0).values.forall(r => math.abs(r - 1.0 / 3) < 1e-12))
    assert(run(5, d = 0.0).values.forall(r => math.abs(r - 1.0 / 3) < 1e-12))
  }

  test("sink nodes leak mass; total stays in (0, 1]") {
    // node 3 has no out-edges, so its mass is lost each round (the
    // documented no-dangling-redistribution contract)
    val totals = (1 to 3).map(i => run(i).values.sum)
    assert(totals.forall(t => t > 0 && t <= 1.0 + 1e-12))
    assert(totals.sliding(2).forall { case Seq(a, b) => b <= a + 1e-12 },
      s"mass must not grow: $totals")
  }

  test("a hub receiving all inflow outranks its spokes") {
    val star = Seq((10L, 1L, 1.0), (11L, 1L, 1.0), (12L, 1L, 1.0))
      .toDF("src", "dst", "w")
    val r = Rank.pageRank(star, 3).as[(Long, Double)].collect().toMap
    assert(r(1L) > r(10L) && r(10L) === r(11L) && r(11L) === r(12L))
  }
}
