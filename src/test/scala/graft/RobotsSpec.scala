package graft

import graft.operators.Robots
import graft.operators.Robots.Rule

/** robots.txt operator (q146): group grammar, wildcard matcher vs a
  * regex reference, and the precedence rule. */
class RobotsSpec extends SparkSuite {

  import spark.implicits._

  test("parseRules: groups, comments, case-insensitive keys, empty no-ops, " +
    "foreign groups excluded, unknown fields keep the group open") {
    val txt =
      """# header comment
        |User-agent: megabot
        |Disallow: /everything
        |
        |user-AGENT: Foo
        |USER-AGENT: *
        |DISALLOW: /a/   # trailing comment
        |allow: /a/b
        |Crawl-delay: 5
        |Disallow: /c$
        |Disallow:
        |Sitemap: https://x/sitemap.xml
        |
        |User-agent: other
        |Disallow: /other
        |
        |User-agent: *
        |Allow: /late
        |""".stripMargin
    assert(Robots.parseRules(txt) === Seq(
      Rule(false, "/a/"), Rule(true, "/a/b"), Rule(false, "/c$"),
      Rule(true, "/late")))
    assert(Robots.parseRules(null) === Seq.empty)
    assert(Robots.parseRules("Disallow: /orphan") === Seq.empty) // no group
  }

  test("pathMatches equals a regex reference over seeded random patterns " +
    "(* runs, terminal-$ anchor, literal mid-$)") {
    def refMatch(path: String, pattern: String): Boolean = {
      val anchored = pattern.endsWith("$")
      val body = if (anchored) pattern.dropRight(1) else pattern
      val rx = body.split("\\*", -1).map(java.util.regex.Pattern.quote)
        .mkString(".*")
      val full = if (anchored) rx else rx + ".*"
      java.util.regex.Pattern.compile(full, java.util.regex.Pattern.DOTALL)
        .matcher(path).matches()
    }
    val rnd = new scala.util.Random(5)
    val alpha = "ab/$*"
    var checked = 0
    (1 to 4000).foreach { _ =>
      val pat = (1 to rnd.nextInt(6)).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      val path = (0 to rnd.nextInt(7)).map(_ => "ab/$"(rnd.nextInt(4))).mkString
      assert(Robots.pathMatches(path, pat) === refMatch(path, pat),
        s"path='$path' pat='$pat'")
      checked += 1
    }
    assert(checked === 4000)
    // hand anchors
    assert(Robots.pathMatches("/a/b.png", "/a/*.png$"))
    assert(!Robots.pathMatches("/a/b.png?x", "/a/*.png$"))
    assert(Robots.pathMatches("/a/b.png?x", "/a/*.png"))
    assert(Robots.pathMatches("/pre$fix", "/pre$f")) // mid-$ literal
    assert(!Robots.pathMatches("/prefix", "/pre$f"))
  }

  test("decide: longest pattern wins, Allow beats Disallow at equal " +
    "length, no match defaults to allow, max-rpath tie-break") {
    val urls = Seq(
      (1L, "d", "/a/b/c"),   // /a/ deny vs /a/b allow -> allow (longer)
      (2L, "d", "/a/x"),     // only /a/ deny -> denied
      (3L, "d", "/free"),    // no match -> default allow, null rule
      (4L, "d", "/e/q"),     // /e/q deny vs /e/* allow: equal len 4 -> allow wins
      (5L, "d", "/t/z")      // two same-prio deny rules match -> max rpath
    ).toDF("id", "domain", "path")
    val rules = Seq(
      ("d", false, "/a/"), ("d", true, "/a/b"),
      ("d", false, "/e/q"), ("d", true, "/e/*"),
      ("d", false, "/t/*"), ("d", false, "/t/z")
    ).toDF("domain", "allow", "rpath")
    val got = Robots.decide(urls, rules, "id", "domain", "path")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getBoolean(3),
        Option(r.getString(4)), if (r.isNullAt(5)) -1L else r.getLong(5)))
    assert(got.toSeq === Seq(
      (1L, true, Some("/a/b"), 4L),
      (2L, false, Some("/a/"), 3L),
      (3L, true, None, -1L),
      (4L, true, Some("/e/*"), 4L),
      (5L, false, Some("/t/z"), 4L)))
  }
}
