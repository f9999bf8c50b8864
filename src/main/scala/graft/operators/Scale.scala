package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale mechanics used across the engine (SURVEY.md §3/§4):
  * skew-salting for hot join keys and bucketed co-located joins.
  */
object Scale {

  /** Salted inner equi-join for skewed keys: the skewed (big) side
    * gets a random-but-deterministic salt in [0, saltFactor), the
    * small side explodes x saltFactor, and the join runs on
    * (key, salt) — a hot key's rows spread over saltFactor reducers
    * instead of one. Use when AQE's skew splitting isn't available
    * (e.g., non-sort-merge paths) or the skew is extreme.
    *
    * The salt derives from xxhash64 of the whole row's monotonically
    * increasing id surrogate — deterministic per run plan, uniform.
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor)).cast("int"))
    val exploded = other.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }

  /** Write a frame as a bucketed+sorted table: joins/aggregations on
    * the bucket key then need NO shuffle on the bucketed side(s).
    * Bucket count should match downstream parallelism at the target
    * scale (e.g., 2048 at 100 TB), not the local test value. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — shuffle-free
    * when bucketing lines up (assert via .explain: no Exchange above
    * either scan). */
  def bucketedJoin(spark: SparkSession, leftTable: String,
                   rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
