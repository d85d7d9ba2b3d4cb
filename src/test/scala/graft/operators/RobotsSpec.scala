package graft.operators

import graft.slope.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class RobotsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val robotsA =
    """# crawler policy
      |User-agent: graftbot
      |User-agent: otherbot
      |Disallow: /private/
      |Allow: /private/docs/
      |Crawl-delay: 10
      |
      |User-agent: *
      |Disallow: /
      |""".stripMargin

  private val robotsB =
    """Disallow: /ignored-before-any-group/
      |User-agent: *
      |Disallow: /tmp*
      |Disallow: /exact$
      |Allow: /tmp/keep_
      |Disallow:
      |""".stripMargin

  test("parseRules: groups, shared agents, comments, unknown directives, empty values") {
    import spark.implicits._
    val rules = Robots.parseRules(
      Seq(("a.example", robotsA), ("b.example", robotsB))
        .toDF("host", "txt"), "host", "txt")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet
    assert(rules == Set(
      // group 1 of a.example binds BOTH agents to both rules
      ("a.example", "graftbot", "disallow", "/private/"),
      ("a.example", "graftbot", "allow", "/private/docs/"),
      ("a.example", "otherbot", "disallow", "/private/"),
      ("a.example", "otherbot", "allow", "/private/docs/"),
      ("a.example", "*", "disallow", "/"),
      // b: the pre-group rule and the empty Disallow are dropped
      ("b.example", "*", "disallow", "/tmp*"),
      ("b.example", "*", "disallow", "/exact$"),
      ("b.example", "*", "allow", "/tmp/keep_")))
  }

  test("gate: precedence, longest match, allow ties, anchors, wildcards, escaping") {
    import spark.implicits._
    val rules = Robots.parseRules(
      Seq(("a.example", robotsA), ("b.example", robotsB))
        .toDF("host", "txt"), "host", "txt")
    val urls = Seq(
      "http://a.example/public/page",       // specific group: no match -> allow
      "http://a.example/private/page",      // disallow /private/
      "http://a.example/private/docs/x",    // longer allow wins
      "http://b.example/tmp123",            // /tmp* wildcard
      "http://b.example/exact",             // $ anchor hits
      "http://b.example/exactly",           // $ anchor must NOT hit
      "http://b.example/tmp/keep_it",       // allow, literal _ escaped
      "http://b.example/tmp/keepXit",       // _ is NOT a wildcard -> disallow by /tmp*
      "http://c.example/anything")          // no rules at all -> allow
      .toDF("url")
    val got = Robots.gate(urls, "url", rules, agent = "GraftBot")
      .collect().map(r => r.getString(0) -> ((r.getBoolean(3),
        Option(r.getString(5))))).toMap
    assert(got("http://a.example/public/page") == ((true, None)),
      "specific-agent group exists: the * group's Disallow / must not apply")
    assert(got("http://a.example/private/page") ==
      ((false, Some("/private/"))))
    assert(got("http://a.example/private/docs/x") ==
      ((true, Some("/private/docs/"))), "longest match wins")
    assert(got("http://b.example/tmp123") == ((false, Some("/tmp*"))))
    assert(got("http://b.example/exact") == ((false, Some("/exact$"))))
    assert(got("http://b.example/exactly") == ((true, None)),
      "$-anchored rule must not prefix-match")
    assert(got("http://b.example/tmp/keep_it") ==
      ((true, Some("/tmp/keep_"))),
      "allow is longer than /tmp* and its literal _ must match itself")
    assert(got("http://b.example/tmp/keepXit") == ((false, Some("/tmp*"))),
      "the escaped _ must NOT act as a single-char wildcard")
    assert(got("http://c.example/anything") == ((true, None)))
    assert(got.size == 9, "every URL comes back exactly once")
  }

  test("gate: allow wins a length tie; empty path matches '/' rules") {
    import spark.implicits._
    val rules = Robots.parseRules(Seq(("t.example",
      "User-agent: *\nDisallow: /a/\nAllow: /b/\nDisallow: /\n"))
      .toDF("host", "txt"), "host", "txt")
    // craft a tie: two 3-char patterns /a/ vs... use equal-length
    // allow+disallow on the same path prefix
    val tieRules = Robots.parseRules(Seq(("t.example",
      "User-agent: *\nDisallow: /x/\nAllow: /x/\n"))
      .toDF("host", "txt"), "host", "txt")
    val tie = Robots.gate(Seq("http://t.example/x/page").toDF("url"),
      "url", tieRules, "bot").collect().head
    assert(tie.getBoolean(3) && tie.getString(4) == "allow",
      "equal-length allow and disallow: allow wins")
    val rootHit = Robots.gate(Seq("http://t.example").toDF("url"),
      "url", rules, "bot").collect().head
    assert(!rootHit.getBoolean(3) && rootHit.getString(5) == "/",
      "a bare host URL matches as path '/'")
  }
}
