package graft

import org.apache.spark.sql.functions._
import graft.queries.Events

class EventsSpec extends SparkSuite {

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
}
