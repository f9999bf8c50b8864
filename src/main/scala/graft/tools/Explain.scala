package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Plan audit: prints formatted physical plans for the given queries
  * (default: a representative set) plus quick pushdown/broadcast
  * greps. Run: sbt "runMain graft.tools.Explain q01_pricing_summary ..."
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_pricing_summary", "q02_revenue_by_nation",
        "q06_selective_filter", "q12_dedup_idxmax", "q40_cosine_topk")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      // AQE off: codegen markers and final plan shape are visible
      // pre-execution only in the non-adaptive explain
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    names.foreach { name =>
      println(s"\n########## $name ##########")
      val qe = SparkEntry.queries(name)(spark, dir).queryExecution
      val plan = qe.explainString(org.apache.spark.sql.execution.FormattedMode)
      println(plan)
      // codegen markers (*(N)) only show in simple mode
      val simple = qe.explainString(org.apache.spark.sql.execution.SimpleMode)
      val codegenStages = "\\*\\((\\d+)\\)".r
        .findAllMatchIn(simple).map(_.group(1).toInt).toSet.size
      def count(tag: String) = plan.split("\n").count(_.contains(tag))
      println(s"[audit] $name: PushedFilters-lines=${count("PushedFilters: [")}" +
        s" broadcasts=${count("BroadcastExchange")}" +
        s" exchanges=${count("Exchange")}" +
        s" codegen-stages=$codegenStages")
    }
    spark.stop()
  }
}
