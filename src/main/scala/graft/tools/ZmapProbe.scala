package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement probe for the quantile-mapped code expression (guide
  * §1/§4): times a noop-sink pass over orders with (a) no codes,
  * (b) the interpreted HOF count-of-cuts (size∘filter), (c) a
  * codegen-friendly nested-CASE binary search — same value. */
object ZmapProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = graft.Tables.orders(spark, dir)
      .select(unix_micros(col("o_orderdate").cast("timestamp")).as("v1"),
        col("o_totalprice").as("v2"))
    val cuts1 = Array.tabulate(255)(i => 788918400000000L + i * 86400000000L)
    val cuts2 = Array.tabulate(255)(i => 900.0 + i * 1777.0)
    def hof(v: org.apache.spark.sql.Column, cuts: Array[Long]) =
      coalesce(size(filter(typedlit(cuts.toSeq), b => b <= v)).cast("long") * 256L, lit(0L))
    def hofD(v: org.apache.spark.sql.Column, cuts: Array[Double]) =
      coalesce(size(filter(typedlit(cuts.toSeq), b => b <= v)).cast("long") * 256L, lit(0L))
    def bs[T](v: org.apache.spark.sql.Column, cuts: Array[T])(lt: T => org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      def f(lo: Int, hi: Int): org.apache.spark.sql.Column =
        if (lo >= hi) lit(lo.toLong)
        else {
          val mid = (lo + hi) / 2
          when(v >= lt(cuts(mid)), f(mid + 1, hi)).otherwise(f(lo, mid))
        }
      coalesce(f(0, cuts.length) * 256L, lit(0L))
    }
    def time(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[probe] $label run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    time("plain")(src)
    time("hof")(src.withColumn("c1", hof(col("v1"), cuts1))
      .withColumn("c2", hofD(col("v2"), cuts2)))
    time("bsearch")(src.withColumn("c1", bs(col("v1"), cuts1)(l => lit(l)))
      .withColumn("c2", bs(col("v2"), cuts2)(d => lit(d))))
    // plan dumps (plans/r14 evidence): the code-projection shape
    if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")) {
      println("===HOF PLAN (before)===")
      println(src.withColumn("c1", hof(col("v1"), cuts1))
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      println("===BSEARCH PLAN (after)===")
      println(src.withColumn("c1", bs(col("v1"), cuts1)(l => lit(l)))
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    // value equality of the two encodings over the real data
    val neq = src.withColumn("a", hof(col("v1"), cuts1))
      .withColumn("b", bs(col("v1"), cuts1)(l => lit(l)))
      .withColumn("a2", hofD(col("v2"), cuts2))
      .withColumn("b2", bs(col("v2"), cuts2)(d => lit(d)))
      .filter(col("a") =!= col("b") || col("a2") =!= col("b2")).count()
    println(s"[probe] value mismatches: $neq")
    spark.stop()
  }
}
