package graft

import org.apache.spark.sql.functions._

/** Bucketed-table sort-merge joins: the co-located fact-fact join
  * that eliminates the query-time shuffle entirely (the q17 salted
  * join's complement — salt when you cannot pre-bucket, bucket when
  * the join is recurring). */
class BucketedJoinSpec extends SparkSuite {

  import spark.implicits._

  private def freshTable(name: String, df: org.apache.spark.sql.DataFrame,
                         key: String, buckets: Int): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val path = java.nio.file.Files.createTempDirectory(s"graft_bkt_$name").toString
    df.repartition(buckets, col(key))
      .write.bucketBy(buckets, key).sortBy(key)
      .mode("overwrite").option("path", s"$path/t").saveAsTable(name)
  }

  test("join of two equally-bucketed tables plans with NO shuffle " +
    "exchange upstream of the sort-merge join, and matches the plain join") {
    val a = spark.range(0, 5000, 1, 4)
      .select(col("id").as("k"), (col("id") * 3).as("va"))
    val b = spark.range(0, 5000, 1, 4)
      .filter(col("id") % 2 === 0)
      .select(col("id").as("k"), (col("id") * 7).as("vb"))
    freshTable("graft_spec_a", a, "k", 8)
    freshTable("graft_spec_b", b, "k", 8)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      // the fixture is tiny, so the planner would rightly broadcast;
      // disable it to exercise the big-big SMJ path the buckets exist
      // for (at 100 TB neither fact side broadcasts)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("graft_spec_a")
        .join(spark.table("graft_spec_b"), "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      // Observed (established by experiment): the EXCHANGE is gone but
      // in-task Sort nodes remain — Spark's v1 bucketed scan does not
      // consume sortBy metadata to eliminate them, even at one file
      // per bucket. The shuffle elimination is the win that matters
      // at 100 TB (the sort is per-task, spill-aware, network-free);
      // pinned here so a planner upgrade that drops the sorts shows
      // up as a spec diff, not a silent change.
      assert(plan.contains("Sort "), s"expected the residual in-task sorts:\n$plan")
      val got = j.select(col("k"), col("va"), col("vb"))
        .as[(Long, Long, Long)].collect().sorted.toSeq
      val want = a.join(b, "k").select(col("k"), col("va"), col("vb"))
        .as[(Long, Long, Long)].collect().sorted.toSeq
      assert(got === want && got.size === 2500)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("mismatched bucket counts fall back to a correct (shuffled) join — " +
    "the optimization is an optimization, never a semantics change") {
    val a = spark.range(0, 1000).select(col("id").as("k"), col("id").as("va"))
    val b = spark.range(0, 1000).select(col("id").as("k"), col("id").as("vb"))
    freshTable("graft_spec_c", a, "k", 8)
    freshTable("graft_spec_d", b, "k", 4)
    val j = spark.table("graft_spec_c").join(spark.table("graft_spec_d"), "k")
    assert(j.count() === 1000L)
  }
}
