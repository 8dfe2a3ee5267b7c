package graft.tools

import org.apache.spark.sql.functions._

import graft.core

/** One-off plan/time probe for the x0_web_pipeline restructure (r16). */
object WebProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf10")
    val spark = core.Sessions.local(appName = "graft-webprobe")
    // A/B: canonicalize kernel vs try_parse_url composition on the
    // all-rows URL-keying stage
    val id = col("doc_id")
    val urlOf = concat(
      when(id % 2 === 0, "HTTPS").otherwise("http"), lit("://"),
      when(id % 3 === 0, "www.").otherwise(""), col("source"),
      when(id % 4 === 0, ".com").otherwise(".co.uk"),
      lit("/p/"), (id % 150).cast("string"),
      when(id % 2 === 0, "/?utm_source=x&b=2&a=1").otherwise("?a=1"))
    def base = graft.core.Tables.load(spark, sfDir, "documents")
      .select(id, urlOf.as("url"))
    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[webprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    time("url synth only")(base)
    time("kernel canonical")(base.select(id,
      graft.ext.Urls.canonicalize(col("url")).as("canon")))
    time("composed canonical")(base.select(id,
      graft.ext.Urls.canonicalizeComposed(col("url")).as("canon")))
    time("kernel host+rdom")(base.select(id,
      graft.ext.Urls.registeredDomain(graft.ext.Urls.host(col("url"))).as("rdom")))
    time("composed host+rdom")(base.select(id,
      graft.ext.Urls.registeredDomain(graft.ext.Urls.hostComposed(col("url"))).as("rdom")))
    time("kernel both")(base.select(id,
      graft.ext.Urls.canonicalize(col("url")).as("canon"),
      graft.ext.Urls.registeredDomain(graft.ext.Urls.host(col("url"))).as("rdom")))
    time("composed both")(base.select(id,
      graft.ext.Urls.canonicalizeComposed(col("url")).as("canon"),
      graft.ext.Urls.registeredDomain(graft.ext.Urls.hostComposed(col("url"))).as("rdom")))
    def whole = graft.queries.ExtQueries.x0_web_pipeline(spark, sfDir)
    time("whole row")(whole)
    spark.stop()
  }
}
