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

  test("kernel strip == reference regexp_replace chain, adversarial corpus") {
    // the r16 single-pass kernel must be BIT-equal to the regex chain it
    // replaced, including the pass-order traps: unterminated blocks,
    // blocks nested in comments and vice versa, "<>", entity chains,
    // mixed-case tags, every \s char, non-\s Unicode whitespace
    val adversarial = Seq(
      "", "plain text, no markup at all",
      "<>", "a<>b<p>c</p>", "<<p>>x", "a < b and c > d",
      "<script>var a=1;</script>tail",
      "<SCRIPT a='1>2'>x</sCrIpT>rest",      // '>' inside attr; mixed case
      "<script>no close tag ever",           // unterminated: tags pass strips
      "<script>a</script><script>b</script>",// two blocks
      "<script>a<style>s</style>b</script>", // style inside script
      "<style>a<script>s</script>b</style>", // script inside style
      "<!-- <style>p{}</style> --> a </style>", // style opened in comment
      "<script> x <!-- </script> --> y</script>", // comment split by close
      "<!-- unterminated comment <p>kept?</p>",
      "x<!---->y", "x<!-- c1 -->m<!-- c2 -->y",
      "&amp;lt; &amp;amp; &nbsp;&nbsp; &quot;&#39;",
      "&amp;nbsp; &AMP;lt;",                 // entity case sensitivity
      "a\tb\ncd\fe\rf  g", "\t lead and trail \n",
      "caf\u00e9 \u00a0nbsp\u00a0 \u2028ls", // non-\s whitespace survives
      "<scripty>not a script block</scripty>",
      "<styleish x>s</styleish>",
      "<p title=\"a>b\">text</p>",           // '>' ends the tag early
      doc)
    val df = adversarial.toDF("h")
      .select(Html.stripTags(col("h")).as("kernel"),
        Html.stripTagsRegex(col("h")).as("regex"))
      .as[(String, String)].collect()
    df.zip(adversarial).foreach { case ((k, r), in) =>
      assert(k === r, s"kernel diverged from regex chain on: ${in.take(80)}")
    }
  }

  test("kernel strip == regex chain on random markup soup (property)") {
    val rnd = new scala.util.Random(20260816L)
    val atoms = Seq("<script", "</script>", "<style>", "</style>", "<!--",
      "-->", "<", ">", "<p>", "</p>", "<>", "&amp;", "&lt;", "&nbsp;",
      "&#39;", "text", " ", "\t", "\n", "a", "é", ";", "=", "\"", "'")
    val soups = (1 to 300).map { _ =>
      (1 to rnd.nextInt(40)).map(_ => atoms(rnd.nextInt(atoms.size))).mkString
    }
    val got = soups.toDF("h")
      .select(Html.stripTags(col("h")).as("kernel"),
        Html.stripTagsRegex(col("h")).as("regex"))
      .as[(String, String)].collect()
    got.zip(soups).foreach { case ((k, r), in) =>
      assert(k === r, s"kernel diverged on soup: ${in.take(120)}")
    }
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
