package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** Diagnostic: stage-by-stage cardinalities/timings for the dedup
  * path. Run: sbt "runMain graft.tools.Diag /root/testdata/sf0.1" */
object Diag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[diag] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = Tables.documents(spark, dir)
      .select(col("doc_id").as("id"), Dedup.wordHashes(Dedup.wordSet(col("text"))).as("h"))
    docs.cache()
    println(s"[diag] docs: ${docs.count()}")
    println(s"[diag] distinct word sets: " +
      docs.select(array_sort(col("h"))).distinct().count())

    val sigs = timed("signatures") {
      val s = docs.select(col("id"), Dedup.minhashSignature(col("h"), 132).as("sig"))
      s.cache(); s.count(); s
    }
    // the real q31 path first collapses identical word sets to reps
    val groups = docs.groupBy(array_sort(col("h")).as("h"))
      .agg(min(col("id")).as("rep"))
    val reps = groups.select(col("rep").as("id"), col("h")).cache()
    println(s"[diag] reps after collapse: ${reps.count()}")
    val cands = timed("lshCandidates (reps)") {
      val c = Dedup.lshCandidates(reps, "id", col("h"))
      c.cache(); println(s"[diag] candidate pairs: ${c.count()}"); c
    }
    timed("verify") {
      println(s"[diag] rep pairs >= 0.95: " +
        Dedup.verifyJaccard(cands, reps).filter(col("jacc") >= 0.95).count())
    }
    timed("q31 end-to-end (minhashDuplicates)") {
      println(s"[diag] total pairs: " + Dedup.minhashDuplicates(
        Tables.documents(spark, dir), "doc_id", "text", 0.95).count())
    }
    spark.stop()
  }
}
