package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Generic column profiler — the data-quality pass a pipeline runs
  * before trusting a new source: per column, null count, EXACT
  * distinct count, and min/max (numeric columns on a double surface,
  * string-ish columns on the binary-collation string surface;
  * timestamps profile as epoch micros, exact in double to ~285 years
  * of microseconds).
  *
  * Shape: ONE aggregate over the table. Multiple exact
  * count-distincts compile to Catalyst's Expand — each row is
  * replicated once per profiled column before the shuffle, the
  * standard cost of exact multi-column NDV. That prices a 100 TB
  * profile at (columns × scan) shuffle freight: fine for the
  * handful-of-columns tables it is meant for; for very wide tables
  * profile column batches separately, or accept the sketch and swap
  * `countDistinct` for `approx_count_distinct` (no SQL oracle can
  * then gate the result — the same envelope discipline as q64).
  */
object Profile {

  def profile(df: DataFrame): DataFrame = {
    val fields = df.schema.fields
    def surfaces(f: StructField): (Column, Column) = f.dataType match {
      case _: NumericType =>
        (col(f.name).cast("double"), lit(null).cast("string"))
      case _: TimestampType | _: TimestampNTZType =>
        // NTZ micros == what epoch_us reads off the same parquet
        (unix_micros(col(f.name).cast("timestamp")).cast("double"),
          lit(null).cast("string"))
      case _: StringType =>
        (lit(null).cast("double"), col(f.name))
      case _ =>
        (lit(null).cast("double"), col(f.name).cast("string"))
    }
    val aggExprs = fields.flatMap { f =>
      val c = col(f.name)
      val (num, str) = surfaces(f)
      Seq(
        count(when(c.isNull, 1)).as(s"${f.name}__nulls"),
        countDistinct(c).as(s"${f.name}__ndv"),
        min(num).as(s"${f.name}__minn"),
        max(num).as(s"${f.name}__maxn"),
        min(str).as(s"${f.name}__mins"),
        max(str).as(s"${f.name}__maxs"))
    }
    val wide = df.agg(aggExprs.head, aggExprs.tail: _*)
    wide.select(explode(array(fields.map { f =>
        struct(
          lit(f.name).as("column_name"),
          col(s"${f.name}__nulls").as("null_count"),
          col(s"${f.name}__ndv").as("n_distinct"),
          col(s"${f.name}__minn").as("min_num"),
          col(s"${f.name}__maxn").as("max_num"),
          col(s"${f.name}__mins").as("min_str"),
          col(s"${f.name}__maxs").as("max_str"))
      }: _*)).as("p"))
      .select(col("p.*"))
  }

  /** The WIDE-TABLE escape hatch [[profile]]'s docs price out: NDVs
    * via approx_count_distinct (HyperLogLog++), which needs NO
    * Expand — one unreplicated pass however many columns — at the
    * cost of sketch error. Emits per column the approx NDV AND an
    * `ndv_ok` envelope boolean (|approx − exact|/exact ≤ `rsdBound`,
    * exactness rides along for the check; a production wide-table
    * run drops the exact column and the Expand with it). The q64x
    * discipline: the sketch value itself is engine-specific, the
    * BOUND is what a cross-engine gate can state as TRUE. Default
    * bound 0.15 ≈ 3σ of the default 5% rsd. An all-null or empty
    * column has exact NDV 0; the relative-error ratio is undefined
    * there, so ndv_ok is the direct verdict `approx == 0` instead of
    * a silent NULL. */
  def profileApproxNdv(df: DataFrame, rsdBound: Double = 0.15): DataFrame = {
    val fields = df.schema.fields
    val aggExprs = fields.flatMap { f =>
      Seq(
        countDistinct(col(f.name)).as(s"${f.name}__ndv"),
        approx_count_distinct(col(f.name)).as(s"${f.name}__andv"))
    }
    val wide = df.agg(aggExprs.head, aggExprs.tail: _*)
    wide.select(explode(array(fields.map { f =>
        struct(
          lit(f.name).as("column_name"),
          col(s"${f.name}__ndv").as("n_distinct"),
          when(col(s"${f.name}__ndv") === 0, col(s"${f.name}__andv") === 0)
            .otherwise(
              abs(col(s"${f.name}__andv") - col(s"${f.name}__ndv")).cast("double") /
                col(s"${f.name}__ndv").cast("double") <= rsdBound).as("ndv_ok"))
      }: _*)).as("p"))
      .select(col("p.*"))
  }

  /** Exact q-quantile cut points of an integer-valued column — the
    * scale-correct alternative to a global ntile() (which serializes
    * EVERY row through one reducer's sort): ONE value-histogram
    * aggregate (shuffle carries distinct values, never rows) plus a
    * histogram-sized prefix window — the q99 rank discipline; the
    * q46 banded prefix is the documented escalation if value
    * cardinality ever outgrows a reducer. Cut d (1..q-1) is the
    * smallest value whose cumulative count cum satisfies
    * cum·q ≥ d·N — pure integer arithmetic, so any engine lands on
    * the same row with no interpolation-rule ambiguity.
    *
    * @return (bucket, cut_value, n_le, n_total) for d = 1..q-1
    */
  def exactQuantiles(df: DataFrame, valueCol: String, q: Int): DataFrame = {
    val hist = df.select(col(valueCol).cast("long").as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = hist.withColumn("cum", sum(col("c")).over(w))
      .crossJoin(broadcast(hist.agg(sum(col("c")).as("n"))))
    val ds = df.sparkSession.range(1, q).select(col("id").as("bucket"))
    cum.join(broadcast(ds), col("cum") * q >= col("bucket") * col("n"))
      .groupBy(col("bucket"))
      .agg(min(struct(col("v"), col("cum"), col("n"))).as("m"))
      .select(col("bucket"),
        col("m.v").as("cut_value"), col("m.cum").as("n_le"),
        col("m.n").as("n_total"))
      .orderBy(col("bucket"))
  }

  /** [[exactQuantiles]] PER GROUP — the calibration table sliced by
    * language/source/split, which is how curation thresholds are
    * actually applied (a global cut over mixed languages is wrong for
    * every language). Same integer cut rule (cum·q ≥ bucket·n per
    * group); the window is now PARTITIONED by the group key, so
    * unlike the global variant there is no single-partition window
    * at any scale — per-group histogram sizes bound the sequential
    * work. Null keys and null values drop. */
  def exactQuantilesBy(df: DataFrame, keyCol: String, valueCol: String,
                       q: Int): DataFrame = {
    require(q >= 2, s"q must be >= 2, got $q")
    val hist = df.select(col(keyCol).as("k"), col(valueCol).cast("long").as("v"))
      .filter(col("v").isNotNull && col("k").isNotNull)
      .groupBy(col("k"), col("v")).agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = hist.groupBy(col("k")).agg(sum(col("c")).as("n"))
    val cum = hist.withColumn("cum", sum(col("c")).over(w)).join(tot, "k")
    val ds = df.sparkSession.range(1, q).select(col("id").as("bucket"))
    cum.join(broadcast(ds), col("cum") * q >= col("bucket") * col("n"))
      .groupBy(col("k"), col("bucket"))
      .agg(min(struct(col("v"), col("cum"), col("n"))).as("m"))
      .select(col("k").as(keyCol), col("bucket"),
        col("m.v").as("cut_value"), col("m.cum").as("n_le"),
        col("m.n").as("n_total"))
      .orderBy(col(keyCol), col("bucket"))
  }
}
