package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Html]] — markup-to-text contract. The cross-engine face (synthesized
  * HTML, same RE2-safe patterns in DuckDB) is oracle-checked as
  * x61_html_strip. */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private val doc =
    """<html><head><title> My Page </title>
      |<style media="all">p { color: red }</style>
      |<script type="text/javascript">var x=1; if(x<2){x=3;}</script></head>
      |<body><!-- chrome --><h1>Head</h1>
      |<p>alpha &amp; beta &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</p>
      |<a href="https://a.com/1">one</a> <a href='skip'>x</a>
      |<a href="https://b.com/2">two</a></body></html>""".stripMargin

  private def run(c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String =
    Seq(doc).toDF("h").select(c(col("h")).cast("string")).as[String].head()

  test("stripTags: script/style/comment gone, tags gone, entities decoded") {
    assert(run(Html.stripTags) ===
      "My Page Head alpha & beta <tag> \"q\" 's' end one x two")
  }

  test("entity decode order: &amp;lt; is the literal &lt;, never <") {
    assert(Seq("<p>&amp;lt;</p>").toDF("h")
      .select(Html.stripTags(col("h"))).as[String].head() === "&lt;")
  }

  test("title: first element, trimmed; '' when absent") {
    assert(run(Html.title) === "My Page")
    assert(Seq("<p>no title</p>").toDF("h")
      .select(Html.title(col("h"))).as[String].head() === "")
  }

  test("links: double-quoted hrefs in document order") {
    val got = Seq(doc).toDF("h")
      .select(Html.links(col("h"))).as[Seq[String]].head()
    assert(got === Seq("https://a.com/1", "https://b.com/2"))
  }

  test("visibleRatio: bounded, 0 on empty, lower for chrome-heavy markup") {
    val r = Seq((doc, "<p>hi</p>", ""))
      .toDF("a", "b", "c")
      .select(Html.visibleRatio(col("a")), Html.visibleRatio(col("b")),
        Html.visibleRatio(col("c")))
      .as[(Double, Double, Double)].head()
    assert(r._1 > 0 && r._1 < 0.25)        // markup-heavy page
    assert(r._2 > 0.2 && r._2 <= 1.0)
    assert(r._3 === 0.0)
  }
}
