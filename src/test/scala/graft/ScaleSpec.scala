package graft

import org.apache.spark.sql.functions._
import graft.operators.Scale

class ScaleSpec extends SparkSuite {

  test("saltedJoin equals the plain join result") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = li.join(o, "l_orderkey")
    val salted = Scale.saltedJoin(li, o, "l_orderkey", saltFactor = 8)
    assert(salted.count() === plain.count())
    // same aggregate over both
    val a = plain.agg(sum(col("l_quantity").cast("decimal(18,2)"))).collect()(0).getDecimal(0)
    val b = salted.agg(sum(col("l_quantity").cast("decimal(18,2)"))).collect()(0).getDecimal(0)
    assert(a === b)
  }

  test("bucketed tables join without an exchange on either side") {
    Scale.writeBucketed(
      Tables.orders(spark, sf).select("o_orderkey", "o_totalprice"),
      "b_orders", "o_orderkey", 4)
    Scale.writeBucketed(
      Tables.lineitem(spark, sf).select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "b_lineitem", "o_orderkey", 4)
    // small tables would broadcast (planner then skips bucketing);
    // force the sort-merge path to demonstrate the shuffle-free join
    // bucketing buys at scale
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Scale.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucketing not used:\n$plan")
      assert(joined.count() === Tables.lineitem(spark, sf).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}
