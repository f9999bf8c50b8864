package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TextAnalysis

/** Stage profile of the quality-classifier training loop.
  * Run: sbt "runMain graft.tools.Q87Prof /root/testdata/sf0.1" */
object Q87Prof {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q87prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import org.apache.spark.sql.graftext.ArrayOps
    val docs = Tables.documents(spark, dir)
    timed("docs scan")(docs.count())
    val tk = TextAnalysis.wsTokens(lower(col("text")))
    (1 to 2).foreach { r =>
      timed(s"tokens only r$r")(
        docs.select(tk.as("tk")).select(sum(size(col("tk")))).collect())
      timed(s"gramBuckets r$r")(
        docs.select(tk.as("tk"))
          .select(sum(size(ArrayOps.gramBuckets(col("tk"), 64L)))).collect())
      timed(s"gramBuckets+bincount r$r")(
        docs.select(tk.as("tk"))
          .select(sum(size(ArrayOps.bincount(
            ArrayOps.gramBuckets(col("tk"), 64L), 64, bias = true)))).collect())
      timed(s"old HOF md5 chain r$r") {
        val nBg = greatest(size(col("tk")) - 1, lit(0))
        val grams = concat(col("tk"),
          zip_with(slice(col("tk"), lit(1), nBg), slice(col("tk"), lit(2), nBg),
            (a, b) => concat(a, lit(""), b)))
        val bs = transform(grams, g =>
          pmod(conv(substring(md5(g), 1, 15), 16, 10).cast("long"), lit(64L)))
        docs.select(tk.as("tk")).select(sum(size(bs))).collect()
      }
    }
    // iters=1 first: if round plans share compiled code, the
    // following iters=5 cold run only pays 4 warm rounds on top
    timed("iters=1 COLD")(
      TextAnalysis.qualityPerceptron(docs, "doc_id", "text",
        col("lang") === "en", buckets = 64, iters = 1).count())
    (1 to 2).foreach { r =>
      timed(s"iters=5 run$r")(
        TextAnalysis.qualityPerceptron(docs, "doc_id", "text",
          col("lang") === "en", buckets = 64, iters = 5).count())
    }
    spark.stop()
  }
}
