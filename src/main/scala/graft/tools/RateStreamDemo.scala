package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.SessionizeStream

/** Live-source streaming demo: the built-in `rate` source stands in
  * for a Kafka-shaped unbounded feed (same unbounded micro-batch
  * semantics, zero external deps in this container), mapped to
  * synthetic (user, event-time) traffic and run through the stateful
  * sessionizer. Each 100-value block is one user's session; blocks
  * are 45 min apart in event time, so sessions continually close by
  * event-time timeout as the watermark advances — the demo prints
  * closed-session progress for ~15 s of wall clock.
  *
  * Run: sbt "runMain graft.tools.RateStreamDemo [rowsPerSecond]"
  */
object RateStreamDemo {
  def main(args: Array[String]): Unit = {
    val rps = args.headOption.map(_.toInt).getOrElse(2000)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = 1600000000000L
    val stream = spark.readStream.format("rate")
      .option("rowsPerSecond", rps).option("numPartitions", 1).load()
      .select(expr("(value div 100) % 5").cast("long").as("user_id"),
        timestamp_millis(lit(base) + expr("value div 100") * lit(2700000L) +
          (col("value") % 100) * lit(1000L)).as("ts"))
      .withWatermark("ts", "2 hours")

    val q = SessionizeStream.sessions(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("rate_demo_sessions")
      .start()
    try {
      for (tick <- 1 to 15) {
        Thread.sleep(1000)
        val n = spark.table("rate_demo_sessions").count()
        val rows = q.recentProgress.map(_.numInputRows).sum
        println(s"[rate-demo] t=${tick}s ingested=$rows closed_sessions=$n")
      }
    } finally q.stop()
    val out = spark.table("rate_demo_sessions")
    println(s"[rate-demo] final closed sessions: ${out.count()}")
    out.orderBy(col("user_id"), col("start_ms")).show(10, truncate = false)
    spark.stop()
  }
}
