package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Plan-evidence dumps for the r14 fold/scan restructures (the
  * judge's plans/ contract): rebuilds the BEFORE and AFTER job shapes
  * of the touched internal frames over the real gate fixtures and
  * prints their formatted physical plans —
  *
  *  - q166: the per-pair diff fold (two filter+agg jobs recomputing
  *    the exceptAll diff vs ONE groupBy(_change) fold);
  *  - q191 (MergeInto.general job 1): the matched per-file aggregate
  *    plus the separate NOT-MATCHED-BY-SOURCE anti-join scan vs the
  *    fused left_outer pass with null-position grouping.
  *
  * Shapes are verbatim reconstructions of the code paths (the gates
  * drive them through imperative/SQL surfaces that cannot be
  * explained directly). */
object FoldPlanDump {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Snapshots
    def fmt(df: DataFrame): String = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

    // ---- q166 fixture: publish -> append -> diff(v1, v2) ----
    val base = sys.props("java.io.tmpdir").stripSuffix("/") +
      "/graft_plandump_" + dir.replaceAll("[^A-Za-z0-9.]", "_")
    Snapshots.dropPath(spark, base)
    val out = s"$base/t"
    val src = graft.Tables.orders(spark, dir)
      .withColumn("bucket", expr("o_orderkey div 8192"))
    val v1 = Snapshots.publish(src, out, "bucket", Seq("o_orderkey"))
    val v2 = Snapshots.append(
      src.filter(col("o_orderkey") % 7 === 3)
        .withColumn("o_orderstatus", lit("A")),
      out, "bucket", Seq("o_orderkey"))
    val h: Column = conv(substring(md5(concat_ws("|",
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))), 1, 15),
      16, 10).cast("long")
    val d = Snapshots.diff(spark, out, v1, v2).withColumn("h", h)
    println("===Q166 BEFORE (x2 per pair: filter kind + agg; diff recomputed per job)===")
    println(fmt(d.filter(col("_change") === "insert")
      .agg(count(lit(1)), coalesce(expr("bit_xor(h)"), lit(0L)))))
    println("===Q166 AFTER (one groupBy(_change) fold; diff computed once)===")
    println(fmt(d.groupBy(col("_change"))
      .agg(count(lit(1)), coalesce(expr("bit_xor(h)"), lit(0L)))))

    // ---- q191 job-1 shapes over flat-table reads with positions ----
    val tgt = Snapshots.read(spark, out)
      .select(col("o_orderkey").as("k"), col("o_custkey").as("c"),
        input_file_name().as("__gfile"),
        monotonically_increasing_id().as("__gpos"))
    val srcM = spark.range(0, 1000).select(
      (col("id") * 3).as("k"), (col("id") + 77).as("c"))
    val cond = tgt("k") === srcM("k")
    val fireM = srcM("k") % 5 === 0
    val fireN = tgt("k") % 7 === 0
    println("===Q191 BEFORE (job 1a: inner-join per-file fire/dup aggregate)===")
    println(fmt(tgt.join(srcM, cond, "inner")
      .select(col("__gfile"), col("__gpos"),
        coalesce(fireM, lit(false)).as("__gmerge_fire"))
      .groupBy("__gfile", "__gpos")
      .agg(count(lit(1)).as("__gmerge_n"),
        max(col("__gmerge_fire").cast("int")).as("__gmerge_f"))
      .groupBy("__gfile")
      .agg(sum((col("__gmerge_n") > 1).cast("int")).as("__gmerge_dups"),
        max(col("__gmerge_f")).as("__gmerge_fire"))))
    println("===Q191 BEFORE (job 1b: SEPARATE left_anti scan for NOT MATCHED BY SOURCE files)===")
    println(fmt(tgt.join(srcM, cond, "left_anti").filter(fireN)
      .select("__gfile").distinct()))
    println("===Q191 AFTER (ONE left_outer pass: fire/dup aggregate + NMBS files; unmatched rows group under a NULL position so map-side partial agg collapses them)===")
    val sMark = srcM.withColumn("__gmerge_smark", lit(1))
    val isM = col("__gmerge_smark").isNotNull
    println(fmt(tgt.join(sMark, tgt("k") === sMark("k"), "left_outer")
      .select(col("__gfile"),
        when(isM, col("__gpos")).as("__gmerge_pos"),
        (isM && coalesce(fireM, lit(false))).cast("int").as("__gmerge_fire"),
        (!isM && coalesce(fireN, lit(false))).cast("int").as("__gmerge_fn"))
      .groupBy(col("__gfile"), col("__gmerge_pos"))
      .agg(count(col("__gmerge_pos")).as("__gmerge_n"),
        max(col("__gmerge_fire")).as("__gmerge_f"),
        max(col("__gmerge_fn")).as("__gmerge_fnx"))
      .groupBy(col("__gfile"))
      .agg(sum((col("__gmerge_n") > 1).cast("int")).as("__gmerge_dups"),
        max(col("__gmerge_f")).as("__gmerge_fire"),
        max(col("__gmerge_fnx")).as("__gmerge_fn"))))
    spark.stop()
  }
}
