package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming over the events table (SURVEY.md §2.F).
  *
  * The same aggregation logic runs batch (queries.Events.q60) and
  * streaming — the transform is a function of a DataFrame, agnostic
  * to its source, which is the Spark-native way to keep batch and
  * stream semantics identical.
  */
object EventStreams {

  /** Historical on-disk schema: ts as TIMESTAMP(NANOS) surfaced as
    * long nanos (see Tables.events). Newer generator versions write
    * plain microsecond timestamps — [[readEventStream]] derives the
    * actual schema from the file instead of assuming this one. */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Tumbling 1-hour counts/sums per event type; works on batch AND
    * streaming frames. On a stream, pair with a watermark for state
    * eviction. */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Sliding 1-hour windows every 15 minutes per event type — each
    * event belongs to exactly width/slide = 4 windows; works on batch
    * AND streaming frames (queries.Events.q109 gates the batch leg,
    * the streaming spec reconciles stream == batch). On a stream a
    * watermark bounds state to open windows only. */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Read the events parquet as a stream (file source replays the
    * existing files — the standard local smoke path; the source needs
    * a directory, so glob-filter inside the sf dir). */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the stream source needs an explicit schema; take the REAL one
    // from the file so both generator schemas (long nanos vs
    // microsecond timestamp) replay with identical instants
    val onDisk = spark.read.option("pathGlobFilter", "events.parquet")
      .parquet(dir).schema
    val raw = spark.readStream.schema(onDisk)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    onDisk("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _        => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** Streaming exact dedup: drop events whose `event_id` was already
    * seen within the watermark window. State holds only keys newer
    * than the watermark — bounded on an unbounded stream (the
    * streaming counterpart of Dedup.exact for at-least-once sources).
    */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Run the tumbling agg as a streaming query into a memory sink and
    * block until all available input is processed. Watermark bounds
    * state: late events beyond 2 hours are dropped at scale.
    * @return the completed result as a DataFrame (from the sink table)
    */
  def runTumblingToMemory(spark: SparkSession, dir: String,
                          queryName: String = "events_tumbling"): DataFrame = {
    val stream = readEventStream(spark, dir)
      .withWatermark("ts", "2 hours")
    val q = tumblingAgg(stream)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(queryName)
  }
}
