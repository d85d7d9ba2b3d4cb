package graft.functions

import graft.slope.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HtmlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def one(html: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): org.apache.spark.sql.Row = {
    import spark.implicits._
    Seq(Tuple1(html)).toDF("h").select(c(col("h"))).collect().head
  }

  test("visibleText: scripts, styles, comments, tags gone; entities decoded; ws collapsed") {
    val html =
      """<html><head><title>T</title><script>var x = "<p>fake</p>";</script>
        |<style>p { color: red; }</style></head>
        |<body><!-- hidden note --><p>Tom &amp; Jerry say &quot;hi&quot;
        |   &lt;3</p><noscript>enable js</noscript></body></html>""".stripMargin
    val got = one(html, HtmlFunctions.visibleText).getString(0)
    assert(got == "T Tom & Jerry say \"hi\" <3", got)
  }

  test("entity decode order: &amp;lt; is the literal string &lt;, never a tag") {
    val got = one("<p>a &amp;lt; b</p>", HtmlFunctions.visibleText).getString(0)
    assert(got == "a &lt; b", got)
  }

  test("title: attributes tolerated, entities decoded, absent -> empty") {
    assert(one("""<title lang="en"> Doc &#39;7&#39;  &nbsp; ok </title>""",
      HtmlFunctions.htmlTitle).getString(0) == "Doc '7' ok")
    assert(one("<body>no title</body>", HtmlFunctions.htmlTitle)
      .getString(0) == "")
  }

  test("linkDensity: nav-heavy page high, prose low, empty page zero") {
    val nav = "<nav><a href='/'>Home</a> <a href='/a'>About us</a></nav><p>hi</p>"
    val prose = "<p>plain paragraph with many ordinary words and one " +
      "<a href='/x'>link</a> only</p>"
    val dNav = one(nav, HtmlFunctions.linkDensity).getDouble(0)
    val dProse = one(prose, HtmlFunctions.linkDensity).getDouble(0)
    assert(dNav > 0.6, s"nav density $dNav")
    assert(dProse < 0.15, s"prose density $dProse")
    assert(one("<script>x</script>", HtmlFunctions.linkDensity)
      .getDouble(0) == 0.0)
  }

  test("mainText: prose kept, nav/footer dropped by density, chrome dropped by length") {
    val words = (1 to 12).map(i => s"word$i").mkString(" ")
    val html =
      s"""<body><nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></nav>
         |<h1>Menu</h1>
         |<p>$words</p>
         |<div>second $words paragraph</div>
         |<footer><a href="/tos">Terms</a> &amp; <a href="/p">Privacy</a></footer></body>""".stripMargin
    val got = one(html, c => HtmlFunctions.mainText(c, minWords = 10,
      maxLinkDensity = 0.35)).getString(0)
    assert(got == s"$words\nsecond $words paragraph", got)
  }

  test("blockStats: one struct per non-empty block with words and link density") {
    val html = "<p>five words are in here</p><nav><a href='/'>Home page</a></nav>"
    val rows = one(html, HtmlFunctions.blockStats).getSeq[org.apache.spark.sql.Row](0)
    assert(rows.length == 2, rows.toString)
    assert(rows(0).getString(0) == "five words are in here" &&
      rows(0).getLong(1) == 5L && rows(0).getDouble(2) == 0.0)
    assert(rows(1).getString(0) == "Home page" && rows(1).getLong(1) == 2L &&
      rows(1).getDouble(2) == 1.0)
  }

  test("a-prefixed tags are not anchors; p-prefixed tags are not blocks") {
    // <article>/<aside> must not be read as anchor opens: a prefix
    // match would lazily swallow the prose up to the real </a> and
    // score the whole article as link text
    val html = "<article class='x'>" +
      ("plenty of ordinary prose words here " * 5) +
      "<a href='/t'>tos</a></article>"
    val ld = one(html, HtmlFunctions.linkDensity).getDouble(0)
    assert(ld < 0.05, s"article prose scored as anchor text: $ld")
    // and outlinks must not extract from <abbr data-href=...>
    val links = one("<abbr href=\"/not-a-link\">x</abbr>" +
      "<a href=\"/real\">y</a>", HtmlFunctions.outlinks).getSeq[String](0)
    assert(links == Seq("/real"), links.toString)
    // <path>/<param> must not split blocks at the 'p' alternative
    val blocks = one("<p>alpha beta <path d='M0 0'/> gamma</p>",
      HtmlFunctions.blockStats).getSeq[org.apache.spark.sql.Row](0)
    assert(blocks.length == 1 && blocks.head.getString(0) == "alpha beta gamma",
      blocks.toString)
  }

  test("outlinks: both quote styles extracted raw; hrefless anchors skipped") {
    val html = "<a href=\"/rel\">r</a><a href='http://x.example/a'>x</a>" +
      "<a href=\"#f\">f</a><a>none</a>" +
      "<a id=\"z\" href=\"https://Y.example:8443/b\">y</a>"
    val got = one(html, HtmlFunctions.outlinks).getSeq[String](0)
    assert(got.toSet == Set("/rel", "http://x.example/a", "#f",
      "https://Y.example:8443/b"), got.toString)
    assert(got.length == 4, got.toString)
  }

  test("malformed markup degrades to whitespace noise, never an exception") {
    val html = "<p>unclosed <div>nested <b>bold<p>and a stray > plus < floor"
    val got = one(html, HtmlFunctions.visibleText).getString(0)
    // unclosed tags and stray angle brackets survive as text (a lone
    // '<' with no closing '>' matches no tag pattern) — degradation is
    // noise words, never an exception
    assert(got == "unclosed nested bold and a stray > plus < floor", got)
    val main = one(html, c => HtmlFunctions.mainText(c, 1, 0.5)).getString(0)
    assert(main == "unclosed\nnested bold\nand a stray > plus < floor", main)
  }

  test("whole pipeline is one codegen'd projection: no exchange, no UDF in the plan") {
    import spark.implicits._
    val df = (0 until 64).map(i => (i.toLong, s"<p>body $i of doc</p>"))
      .toDF("id", "html")
      .select(col("id"), HtmlFunctions.mainText(col("html"), 2, 0.9).as("t"),
        HtmlFunctions.linkDensity(col("html")).as("ld"),
        HtmlFunctions.htmlTitle(col("html")).as("ti"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"extraction must not shuffle:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"no UDFs allowed:\n$plan")
    assert(df.count() == 64)
  }
}
