package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: stage-by-stage timings for the symmetric-delete fuzzy
  * join at stress scale. Run: sbt "runMain graft.tools.FuzzyDiag [n]" */
object FuzzyDiag {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[fdiag] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r"); r
    }

    val names = spark.range(0, n, 1, 32)
      .select(concat(lit("ID"), lpad(col("id").cast("string"), 9, "0")).as("s"))

    val vals = names.select(col("s")).filter(col("s").isNotNull).distinct()
    timed("distinct vals")(vals.count())

    val variants = vals.select(col("s"), explode(array_distinct(concat(
      array(col("s")),
      transform(sequence(lit(1), length(col("s"))),
        i => concat(col("s").substr(lit(1), i - 1),
          col("s").substr(i + 1, length(col("s")))))))).as("v"))
    timed("variants")(variants.count())

    val left = variants.select(col("s").as("a"), col("v"))
    val right = variants.select(col("s").as("b"), col("v"))
    val cand = left.join(right, Seq("v"))
      .filter(col("a") < col("b") && levenshtein(col("a"), col("b"), 1) >= 0)
    timed("verified candidates")(cand.count())

    val out = cand.select(col("a"), col("b")).distinct()
      .withColumn("dist", levenshtein(col("a"), col("b")))
    timed("distinct verified pairs")(out.count())

    timed("end-to-end fuzzyPairs1")(
      graft.operators.Dedup.fuzzyPairs1(names, "s").count())

    spark.stop()
  }
}
