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

  test("checkRef: non-null values absent from the reference violate; " +
    "null targets and null references are both inert") {
    val facts = Seq(Some(1L), Some(2L), Some(9L), Some(9L), None)
      .toDF("fk")
    val dims = Seq(Some(1L), Some(2L), Some(3L), None).toDF("pk")
    val r = Constraints.checkRef(facts, "fk", dims, "pk").collect()(0)
    assert(r.getString(0) === "ref:fk->pk" && r.getString(1) === "fk")
    // the two 9s violate (each occurrence counts); the null fk is
    // NotNull's business; the null pk vouches for nothing
    assert(r.getLong(2) === 2L && r.getLong(3) === 5L && !r.getBoolean(4))
    // a fully-covered target passes, empty reference = all violate
    val ok = Constraints.checkRef(facts.filter($"fk" <= 2), "fk", dims, "pk")
      .collect()(0)
    assert(ok.getLong(2) === 0L && ok.getBoolean(4))
    val none = Constraints.checkRef(facts, "fk", dims.limit(0), "pk").collect()(0)
    assert(none.getLong(2) === 4L && !none.getBoolean(4))
  }

  test("duplicate labels and empty suites are rejected at the API boundary") {
    intercept[IllegalArgumentException](
      Constraints.check(fixture, Seq(NotNull("id"), NotNull("id"))))
    intercept[IllegalArgumentException](
      Constraints.check(fixture, Seq.empty))
  }
}
