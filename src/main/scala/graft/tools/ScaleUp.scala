package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Rebuild the 10x stress set (sf1) from sf0.1: replicate each table N
  * times, shifting every key column by `replica * (keySpaceMax + 1)`.
  *
  * Key-space consistency: each logical key space (custkey, orderkey, ...)
  * has ONE offset — the max of its defining primary-key column — and every
  * column in that space (the PK and all FKs referencing it) shifts by the
  * same amount per replica. So replica i's orders reference replica i's
  * customers, lineitems reference replica i's orders/parts/suppliers, and
  * embeddings reference replica i's documents: equi-join selectivity per
  * replica matches the source exactly, as a true scale-up would.
  * `events.user_id` has no dim table; it gets its own key space so each
  * replica contributes a disjoint user population (the TPC-H convention:
  * scale grows the entity counts, not per-entity row counts).
  * region/nation are genuinely fixed-cardinality and copy through
  * unshifted, which keeps `*_nationkey` FKs valid without a key space.
  *
  * Usage: ScaleUp [srcDir] [dstDir] [factor]
  *   defaults: /root/testdata/sf0.1 /tmp/sf1 10
  */
object ScaleUp {

  /** key space → (table, column) whose max defines the offset. */
  val keySpaces: Seq[(String, (String, String))] = Seq(
    "custkey" -> ("customer", "c_custkey"),
    "orderkey" -> ("orders", "o_orderkey"),
    "partkey" -> ("part", "p_partkey"),
    "suppkey" -> ("supplier", "s_suppkey"),
    "docid" -> ("documents", "doc_id"),
    "eventid" -> ("events", "event_id"),
    "userid" -> ("events", "user_id"))

  /** table → columns to shift, each tagged with its key space. */
  val shiftedTables: Seq[(String, Seq[(String, String)])] = Seq(
    "customer" -> Seq("c_custkey" -> "custkey"),
    "orders" -> Seq("o_orderkey" -> "orderkey", "o_custkey" -> "custkey"),
    "lineitem" -> Seq("l_orderkey" -> "orderkey", "l_partkey" -> "partkey",
      "l_suppkey" -> "suppkey"),
    "part" -> Seq("p_partkey" -> "partkey"),
    "supplier" -> Seq("s_suppkey" -> "suppkey"),
    "events" -> Seq("event_id" -> "eventid", "user_id" -> "userid"),
    "documents" -> Seq("doc_id" -> "docid"),
    "embeddings" -> Seq("vec_id" -> "docid"))

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/tmp/sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = graft.core.Sessions.local(appName = "graft-scaleup")

    val offsets: Map[String, Long] = keySpaces.map {
      case (space, (t, c)) =>
        val m = graft.core.Tables.loadUncached(spark, src, t)
          .agg(max(col(c)).cast("long")).collect()(0).getLong(0)
        space -> (m + 1L)
    }.toMap
    println(s"[scaleup] offsets=$offsets")

    for (t <- Seq("region", "nation")) {
      graft.core.Tables.loadUncached(spark, src, t)
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[scaleup] $t copied")
    }
    for ((t, cols) <- shiftedTables) {
      val base = graft.core.Tables.loadUncached(spark, src, t)
      val scaled = (0 until factor)
        .map { i =>
          cols.foldLeft(base) { case (d, (c, space)) =>
            d.withColumn(c, col(c) + lit(i * offsets(space)))
          }
        }
        .reduce(_ unionByName _)
      scaled.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[scaleup] $t x$factor rows=" +
        spark.read.parquet(s"$dst/$t.parquet").count())
    }
    spark.stop()
  }
}
