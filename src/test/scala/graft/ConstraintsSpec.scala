package graft

import graft.operators.Constraints
import graft.operators.Constraints._

/** Constraint suite (q153): per-type null semantics on a hand
  * fixture, the single-pass plan shape, and API guards. */
class ConstraintsSpec extends SparkSuite {

  import spark.implicits._

  private def fixture = Seq(
    (Some(1L), Some("a"), Some(5.0)),
    (Some(2L), Some("b"), Some(50.0)),
    (Some(2L), None, Some(-1.0)),
    (None, Some("z"), None))
    .toDF("id", "tag", "v")

  test("violation counts and null semantics per constraint type") {
    val got = Constraints.check(fixture, Seq(
        NotNull("id"), NotNull("tag"), Unique("id"),
        InRange("v", 0.0, 10.0), OneOf("tag", Seq("a", "b"))))
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(got("not_null:id") === ((1L, 4L, false)))
    assert(got("not_null:tag") === ((1L, 4L, false)))
    // duplicate non-null id 2 counts once; the null id is NotNull's
    assert(got("unique:id") === ((1L, 4L, false)))
    // -1.0 and 50.0 out of range; the null v does not violate
    assert(got("in_range:v") === ((2L, 4L, false)))
    // "z" outside the set; the null tag does not violate
    assert(got("one_of:tag") === ((1L, 4L, false)))
    // an all-passing suite reports passed = true
    val ok = Constraints.check(fixture.filter($"id".isNotNull && $"tag".isNotNull),
        Seq(OneOf("tag", Seq("a", "b"))))
      .collect()
    assert(ok.length === 1 && ok(0).getBoolean(4))
  }

  test("the whole suite evaluates in ONE aggregate over ONE scan") {
    val q = Constraints.check(fixture, Seq(
      NotNull("id"), Unique("id"), InRange("v", 0.0, 10.0),
      OneOf("tag", Seq("a", "b"))))
    val plan = q.queryExecution.optimizedPlan.toString
    // exactly one Aggregate node chain (the countDistinct rewrite
    // nests aggregates but never re-reads the source): one scan
    val scans = "LogicalRDD|Relation".r.findAllIn(plan).length
    assert(scans === 1, s"expected one scan:\n$plan")
  }

  test("duplicate labels and empty suites are rejected at the API boundary") {
    intercept[IllegalArgumentException](
      Constraints.check(fixture, Seq(NotNull("id"), NotNull("id"))))
    intercept[IllegalArgumentException](
      Constraints.check(fixture, Seq.empty))
  }
}
