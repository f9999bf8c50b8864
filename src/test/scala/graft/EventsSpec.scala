package graft

import org.apache.spark.sql.functions._
import graft.queries.Events

class EventsSpec extends SparkSuite {

  test("native session_window boundary: a gap of EXACTLY the window " +
    "duration MERGES (the inclusive rule, same as q61's — pinned here " +
    "on a constructed fixture because q149's corpus has no boundary " +
    "gap; this experiment corrected an initially-assumed strict rule)") {
    import spark.implicits._
    val base = 1700000000000000L // epoch micros
    val gapUs = 30L * 60 * 1000000
    val rows = Seq(
      (1L, base), (1L, base + gapUs),          // exactly at the boundary
      (2L, base), (2L, base + gapUs - 1),      // one microsecond inside
      (3L, base), (3L, base + gapUs + 1))      // outside
      .toDF("user_id", "us")
      .select($"user_id", timestamp_micros($"us").as("ts"))
    val sessions = rows
      .groupBy($"user_id", session_window($"ts", "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n"))
      .groupBy($"user_id").agg(count(lit(1)).as("n_sessions"))
      .orderBy($"user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // inclusive merge rule: diff == gap merges, only diff > gap splits
    assert(sessions.toSeq === Seq((1L, 1L), (2L, 1L), (3L, 2L)))
  }

  test("sketch aggregates land within tolerance of exact values") {
    val approx = Events.q64(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("approx_users"), r.getAs[Double]("approx_median_value"))).toMap
    val exact = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("users"),
        expr("percentile(value, 0.5)").as("median"))
      .collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("users"), r.getAs[Double]("median"))).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (et, (users, median)) =>
      val (aUsers, aMedian) = approx(et)
      assert(math.abs(aUsers - users).toDouble / users < 0.1, s"$et HLL off")
      val spread = math.max(1.0, math.abs(median))
      assert(math.abs(aMedian - median) / spread < 0.2, s"$et quantile off")
    }
  }

  test("json props extraction is total on this dataset") {
    val out = Events.q63(spark, sf).collect()
    val totalWithK = out.map(_.getAs[Long]("n_with_k")).sum
    assert(totalWithK === Tables.events(spark, sf).count())
    out.foreach { r =>
      assert(r.getAs[Long]("min_k") <= r.getAs[Long]("max_k"))
    }
  }

  test("q64x sketch bounds hold (the driver-gated half of q64)") {
    val out = Events.q64x(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Boolean]("ndv_ok"), s"${r.getString(0)}: HLL outside 5% of exact")
      assert(r.getAs[Boolean]("med_ok"), s"${r.getString(0)}: approx median rank outside [0.45,0.55]")
      assert(r.getAs[Long]("n_events") > 0)
    }
  }

  test("trailing-stats RANGE frame includes equal-timestamp peers both ways") {
    import spark.implicits._
    // user 1: two events at the SAME instant plus one 2h earlier —
    // RANGE peers must see each other (count 2 for both), the stale
    // event must see only itself
    val base = 1600000000000000L
    val df = Seq(
      (1L, base - 7200L * 1000000, 1L, "view", 1.0, "{}"),
      (2L, base, 1L, "view", 2.0, "{}"),
      (3L, base, 1L, "click", 4.0, "{}"))
      .toDF("event_id", "tsus", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("tsus"))).drop("tsus")
    val tmp = java.nio.file.Files.createTempDirectory("graft_trail").toString
    df.write.mode("overwrite").parquet(tmp + "/events.parquet")
    val got = Events.q107(spark, tmp).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("n_trail_1h"), r.getAs[Double]("sum_trail_1h"))).toMap
    assert(got(1L) === ((1L, 1.0)))
    assert(got(2L) === ((2L, 6.0)), "equal-ts peer missing from the frame")
    assert(got(3L) === ((2L, 6.0)), "RANGE peers must be symmetric")
  }

  test("transition counts follow the (ts, event_id) total order per user") {
    import spark.implicits._
    val base = 1600000000000000L
    // user 7: view -> click -> purchase; user 8: single event, no
    // transition; equal-ts pair ordered by event_id
    val df = Seq(
      (10L, base, 7L, "view", 1.0, "{}"),
      (11L, base + 1000000, 7L, "click", 1.0, "{}"),
      (12L, base + 1000000, 7L, "purchase", 1.0, "{}"), // same ts as 11: id breaks the tie
      (13L, base, 8L, "signup", 1.0, "{}"))
      .toDF("event_id", "tsus", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("tsus"))).drop("tsus")
    val tmp = java.nio.file.Files.createTempDirectory("graft_trans").toString
    df.write.mode("overwrite").parquet(tmp + "/events.parquet")
    val got = Events.q108(spark, tmp).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_transitions")).toMap
    assert(got === Map(("view", "click") -> 1L, ("click", "purchase") -> 1L))
  }

  test("sliding windows cover each event exactly width/slide times") {
    // every event lands in exactly 4 of the 1h/15min windows, so the
    // window-count-weighted total equals 4x the event count
    val out = Events.q109(spark, sf).collect()
    val events = Tables.events(spark, sf).count()
    assert(out.map(_.getAs[Long]("n_events")).sum === 4 * events)
    // and each window's count is reachable from the tumbling side:
    // no window_start may predate the earliest event by >= 1h
    val minTs = Tables.events(spark, sf)
      .agg(min(unix_micros(col("ts")))).collect().head.getLong(0)
    out.foreach { r =>
      val ws = java.time.LocalDateTime.parse(
        r.getAs[String]("window_start").replace(' ', 'T'))
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
      assert(ws > minTs - 3600L * 1000000, s"window ${r.getString(0)} outside data span")
    }
  }
}
