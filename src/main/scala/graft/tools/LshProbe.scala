package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement probe for the LSH family's featurization share (guide
  * §1): times (a) the word-hash featurization + collapse checkpoint
  * that q31-class paths pay, (b) the full q31 pipeline, and (c) the
  * interpreted transform(words, xxhash64) lambda vs a pre-explode
  * equivalent — to decide whether the per-word HOF is worth a kernel. */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, dir)
    def time(label: String)(f: => Unit): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[probe] $label run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    val words = split(lower(col("text")), "\\s+")
    time("wordset+hash") {
      docs.select(col("doc_id"),
          transform(array_distinct(words), w => xxhash64(w)).as("h"))
        .write.format("noop").mode("overwrite").save()
    }
    time("wordset only") {
      docs.select(col("doc_id"), array_distinct(words).as("h"))
        .write.format("noop").mode("overwrite").save()
    }
    time("groups checkpoint") {
      docs.select(col("doc_id").as("id"),
          transform(array_distinct(words), w => xxhash64(w)).as("h"))
        .filter(size(col("h")) > 0)
        .groupBy(array_sort(col("h")).as("h"))
        .agg(min(col("id")).as("rep"), collect_list(col("id")).as("members"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
