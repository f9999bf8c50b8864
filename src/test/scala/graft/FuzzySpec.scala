package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** fuzzyPairs1: symmetric-delete blocking must lose NO pair at edit
  * distance 1 — verified against the naive all-pairs levenshtein on
  * fixtures covering every edit kind and on random strings. */
class FuzzySpec extends SparkSuite {
  import spark.implicits._

  private def naive(vals: Seq[String]): Set[(String, String)] = {
    val d = vals.distinct
    (for {
      a <- d; b <- d if a < b
      if lev(a, b) <= 1
    } yield (a, b)).toSet
  }

  /** Plain DP Levenshtein, the independent reference. */
  private def lev(a: String, b: String): Int = {
    val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
        m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    m(a.length)(b.length)
  }

  private def run(vals: Seq[String]): Set[(String, String)] =
    Dedup.fuzzyPairs1(vals.toDF("s"), "s")
      .select("a", "b").collect().map(r => (r.getString(0), r.getString(1))).toSet

  test("substitution, insertion, deletion and far pairs against brute force") {
    val vals = Seq(
      "widget", "wadget",          // substitution
      "widgets",                   // insertion vs widget
      "idget",                     // deletion vs widget
      "gadget",                    // dist 2 from widget -> excluded
      "bolt", "bolts", "colt",
      "x", "", "y",                // empty string pairs with every 1-char string
      "aab", "ab",                 // repeated chars: delete either 'a' collapses
      "totally-unrelated")
    assert(run(vals) === naive(vals))
    // sanity on the fixture itself: the expected pairs are present
    assert(naive(vals).contains(("wadget", "widget")))
    assert(naive(vals).contains(("widget", "widgets")))
    assert(naive(vals).contains(("idget", "widget")))
    assert(!naive(vals).contains(("gadget", "widget")))
    assert(naive(vals).contains(("", "x")))
  }

  test("random digit-string corpus matches brute force (the entity-id shape)") {
    // deterministic pseudo-random short digit strings: dense distance-1
    // structure, many shared deletion variants
    val vals = (0 until 400).map { i =>
      val h = Integer.toString((i * 2654435761L % 100000).toInt)
      "ID" + ("0" * (5 - h.length)) + h
    }
    assert(run(vals) === naive(vals))
  }

  test("BMP unicode strings match brute force (char-based substr + levenshtein)") {
    // multi-byte UTF-8 but single-UTF-16-unit chars, so the JVM
    // brute force and the engine agree on character semantics;
    // surrogate-pair astral chars are deliberately out of the
    // fixture (code-unit vs code-point counting differs there)
    val vals = Seq("café", "cafe", "cafés", "caf", "naïve", "naive",
      "crème", "creme", "crêpe", "crépe", "日本語", "日本誤", "日本")
    assert(run(vals) === naive(vals))
    assert(naive(vals).contains(("cafe", "café")))
    assert(naive(vals).contains(("日本語", "日本誤")))
  }

  test("duplicate input values collapse to the distinct space, nulls drop") {
    val df = Seq(Some("abc"), Some("abc"), Some("abd"), None).toDF("s")
    val got = Dedup.fuzzyPairs1(df, "s").collect()
    assert(got.length === 1)
    assert(got.head.getString(0) === "abc" && got.head.getString(1) === "abd"
      && got.head.getInt(2) === 1)
  }

  private def naive2(vals: Seq[String]): Set[(String, String, Int)] = {
    val d = vals.distinct
    (for {
      a <- d; b <- d if a < b
      dd = lev(a, b) if dd <= 2
    } yield (a, b, dd)).toSet
  }

  private def run2(vals: Seq[String]): Set[(String, String, Int)] =
    Dedup.fuzzyPairs2(vals.toDF("s"), "s")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet

  test("k=2: every edit-kind COMBINATION against brute force " +
    "(sub+sub, sub+ins, ins+ins, del+del, mixed positions)") {
    val vals = Seq(
      "widget", "wadgit",          // two substitutions
      "widgetsx",                  // two insertions
      "dget",                      // two deletions
      "awidgt",                    // insert front + delete middle
      "gadget",                    // dist 2 (sub+sub) -> now INCLUDED
      "gadgets",                   // dist 3 from widget -> excluded
      "x", "", "xy",               // short strings: dist 1 and 2 chains
      "aabb", "ab",                // repeated-char collapses, dist 2
      "totally-unrelated")
    assert(run2(vals) === naive2(vals))
    assert(naive2(vals).contains(("gadget", "widget", 2)))
    assert(naive2(vals).exists(t => t._1 == "" && t._2 == "xy" && t._3 == 2))
    assert(!naive2(vals).exists(t => t._2 == "gadgets" && t._1 == "widget"))
  }

  test("k=2: random digit-string corpus matches brute force, and the " +
    "k=1 pairs are exactly the dist<=1 subset") {
    val vals = (0 until 300).map { i =>
      val h = Integer.toString((i * 2654435761L % 100000).toInt)
      "ID" + ("0" * (5 - h.length)) + h
    }
    val got2 = run2(vals)
    assert(got2 === naive2(vals))
    val got1 = run(vals)
    assert(got2.filter(_._3 <= 1).map(t => (t._1, t._2)) === got1)
    assert(got2.exists(_._3 == 2), "fixture produced no distance-2 pairs")
  }
}
