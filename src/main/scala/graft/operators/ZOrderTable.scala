package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** MULTI-DIMENSIONAL (Z-order / Hilbert) clustering for the snapshot
  * table's WRITE PATH — the layout lever the single sort chain cannot
  * give (reference scope: pycart's spatial locality concern,
  * main.py's merge-key clustering, generalized to the lakehouse
  * Z-ORDER discipline of Delta's OPTIMIZE ZORDER BY / public Morton
  * order): rows are bucketed by the PREFIX of their space-filling
  * curve key and sorted by the full key inside each bucket, so every
  * data file covers one curve CELL whose per-dimension min/max box is
  * tight — a predicate on ANY clustered dimension prunes files from
  * the manifest ([[Snapshots.prunedScanAtBy]]), and an axis-aligned
  * BOX predicate prunes to just the intersecting cells
  * ([[Snapshots.prunedScanAtBox]]), where a linear sort order can
  * only ever prune on its leading column.
  *
  * Layout mechanics: the curve key ([[ZCol]], the 16-bit/dim Morton
  * interleave or Hilbert index from graftext.Bits — both hierarchical,
  * so a key PREFIX identifies a grid cell) and the bucket
  * ([[BCol]] = key >>> `shift`) are derived, materialized in the
  * files, and dropped by [[read]]. The layout descriptor rides as the
  * carried table property `zlayout=<curve>:<shift>:<dims>`, so
  * [[append]]/[[merge]]/[[delete]] re-derive the SAME layout from the
  * manifest alone, and the dimension columns are auto-declared as
  * typed-stats columns — pruning needs no extra setup. The shift is
  * FIXED at publish (changing it re-assigns buckets; evolving it
  * needs BucketedTable-style per-file epochs — use a fresh publish).
  *
  * Grid contract: dimension columns are LongType on the 16-bit grid
  * `[0, 65536)` (scale/bucket upstream — q112's `pmod` discipline).
  * Out-of-grid values only DEGRADE clustering (the key masks), never
  * correctness: pruning decisions come from the dimensions' own
  * recorded min/max, and residual filters are exact.
  *
  * Scale: everything here is [[Snapshots]] machinery — one hash
  * repartition + local sort per write, merge/delete cost ∝ touched
  * buckets, planning is manifest-only. At 100 TB pick `shift` so a
  * cell ≈ one task's worth of rows (buckets = 2^(keyBits − shift)).
  */
object ZOrderTable {

  /** The materialized curve-key column (dropped by [[read]]). */
  val ZCol = "__gzkey"

  /** The derived curve-prefix bucket column (dropped by [[read]]). */
  val BCol = "__gzbucket"

  private val PropKey = "zlayout"

  /** One table's clustering descriptor. */
  final case class ZLayout(curve: String, shift: Int, dims: Seq[String]) {
    require(curve == "z" || curve == "h",
      s"curve must be z (Morton) or h (Hilbert), got '$curve'")
    require(dims.size == 2 || dims.size == 3,
      s"z-order tables cluster on 2 or 3 dimensions, got ${dims.size}")
    require(dims.forall(d => d.nonEmpty && !d.contains(":") && !d.contains(",")),
      s"invalid dimension names: $dims")
    /** Total key bits: 16 per dimension. */
    def keyBits: Int = dims.size * 16
    require(shift > 0 && shift < keyBits,
      s"shift must be in (0, $keyBits) for ${dims.size} dims, got $shift")
    def propValue: String = s"$curve:$shift:${dims.mkString(",")}"
  }

  private def parseLayout(s: String): ZLayout = {
    val Array(c, sh, ds) = s.split(":", 3)
    ZLayout(c, sh.toInt, ds.split(",").toSeq)
  }

  /** The layout version `v` was written under (from the carried
    * `#prop:zlayout` line). */
  def layoutAt(spark: SparkSession, dir: String, v: Long): ZLayout =
    Snapshots.propsAt(spark, dir, v).get(PropKey).map(parseLayout)
      .getOrElse(throw new IllegalArgumentException(
        s"$dir version $v is not a z-order table (no zlayout property)"))

  /** The layout currently in force. */
  def currentLayout(spark: SparkSession, dir: String): ZLayout =
    layoutAt(spark, dir, Snapshots.latest(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"$dir has no snapshots")))

  private def keyExpr(l: ZLayout): Column = {
    import org.apache.spark.sql.graftext.Bits
    (l.curve, l.dims.map(col)) match {
      case ("z", Seq(x, y)) => Bits.zorder(x, y)
      case ("h", Seq(x, y)) => Bits.hilbert(x, y)
      case ("z", Seq(x, y, z)) => Bits.zorder3(x, y, z)
      case ("h", Seq(x, y, z)) => Bits.hilbert3(x, y, z)
      case _ => throw new IllegalArgumentException(s"unsupported layout $l")
    }
  }

  private def withLayout(df: DataFrame, l: ZLayout): DataFrame = {
    l.dims.foreach { d =>
      require(df.columns.contains(d), s"missing layout dimension column $d")
      require(df.schema(d).dataType == LongType,
        s"layout dimension $d must be LongType on the 16-bit grid " +
          s"(got ${df.schema(d).dataType}) — scale upstream")
    }
    require(!df.columns.contains(ZCol) && !df.columns.contains(BCol),
      s"column names $ZCol/$BCol are reserved for the z-order layout")
    df.withColumn(ZCol, keyExpr(l))
      .withColumn(BCol, shiftrightunsigned(col(ZCol), l.shift))
  }

  /** Publish the first version clustered on `dims` (2 or 3 LongType
    * grid columns): bucket = curve-key prefix (`2^(16·d − shift)`
    * cells), within-bucket sort = the full key (tight row groups),
    * per-dimension typed stats auto-declared. */
  def publish(df: DataFrame, dir: String, dims: Seq[String], shift: Int,
              curve: String = "z", blockSize: Long = 128L * 1024 * 1024,
              numTasks: Int = 32, extraStatsCols: Seq[String] = Nil,
              ndvCols: Seq[String] = Nil): Long = {
    val l = ZLayout(curve, shift, dims)
    Snapshots.publish(withLayout(df, l), dir, BCol, Seq(ZCol),
      blockSize, numTasks, meta = Seq(s"prop:$PropKey=${l.propValue}"),
      statsCols = (dims ++ extraStatsCols).distinct, ndvCols = ndvCols)
  }

  /** Incremental load under the table's OWN layout (re-derived from
    * the manifest — new rows land in their curve cells). */
  def append(df: DataFrame, dir: String,
             blockSize: Long = 128L * 1024 * 1024,
             numTasks: Int = 32): Long = {
    val spark = df.sparkSession
    Snapshots.append(withLayout(df, currentLayout(spark, dir)), dir, BCol,
      Seq(ZCol), blockSize, numTasks)
  }

  /** Upsert by `keyCols` — the PRUNED path (cost ∝ touched cells),
    * which is only sound when the key DETERMINES the cell: the
    * dimension columns must be part of the key (a spatial entity
    * keyed by its grid position, a fact keyed on source × day × id
    * grid columns). With attribute dims a row's cell can MOVE under
    * an update and the pruned merge would leave the old row alive in
    * its untouched cell — refused here; use [[mergeMoving]]. */
  def merge(updates: DataFrame, dir: String, keyCols: Seq[String],
            blockSize: Long = 128L * 1024 * 1024,
            numTasks: Int = 32): Long = {
    val spark = updates.sparkSession
    val l = currentLayout(spark, dir)
    require(l.dims.forall(keyCols.contains),
      s"merge by $keyCols cannot prune safely: the layout dims ${l.dims} " +
        "are not all key columns, so an update may MOVE a row's cell and " +
        "orphan the old copy — use mergeMoving (one locate scan)")
    Snapshots.merge(withLayout(updates, l), dir,
      BCol, keyCols, Seq(ZCol), blockSize, numTasks)
  }

  /** Upsert by `keyCols` when the dims are ATTRIBUTES (an update may
    * move a row across cells): the keys' CURRENT rows are located
    * with one table scan filtered by a BROADCAST semi join (no
    * shuffle of the table), then old positions drop and new rows
    * land in ONE commit — rewrite cost still ∝ touched cells; the
    * locate scan is the honest price of key-moving upserts without a
    * key index. Same-key delete+insert here is the upsert itself
    * (every dropped key re-inserts from `updates`). */
  def mergeMoving(updates: DataFrame, dir: String, keyCols: Seq[String],
                  blockSize: Long = 128L * 1024 * 1024,
                  numTasks: Int = 32): Long = {
    val spark = updates.sparkSession
    val l = currentLayout(spark, dir)
    val up = withLayout(updates, l)
    val oldPositions = Snapshots.read(spark, dir)
      .join(broadcast(updates.select(keyCols.map(col): _*).distinct()),
        keyCols, "left_semi")
      .select(keyCols.map(col) :+ col(BCol): _*)
    Snapshots.applyChanges(up, oldPositions, dir, BCol, keyCols, Seq(ZCol),
      blockSize, numTasks)
  }

  /** Delete by key — `keys` must carry `keyCols` AND the dimension
    * columns (cells are located without scanning the table). */
  def delete(keys: DataFrame, dir: String, keyCols: Seq[String],
             blockSize: Long = 128L * 1024 * 1024,
             numTasks: Int = 32): Long = {
    val spark = keys.sparkSession
    Snapshots.delete(withLayout(keys, currentLayout(spark, dir)), dir,
      BCol, keyCols, Seq(ZCol), blockSize, numTasks)
  }

  /** Re-sector fragmented cells (2+ files) back to one file each,
    * preserving the in-cell key order. Props/stats carry. */
  def compact(spark: SparkSession, dir: String,
              blockSize: Long = 128L * 1024 * 1024): Long =
    Snapshots.compact(spark, dir, BCol, Seq(ZCol), blockSize)

  /** The table surface (derived layout columns dropped). */
  def read(spark: SparkSession, dir: String): DataFrame =
    Snapshots.read(spark, dir).drop(ZCol, BCol)

  /** Time travel (derived layout columns dropped). */
  def readAt(spark: SparkSession, dir: String, v: Long): DataFrame =
    Snapshots.readAt(spark, dir, v).drop(ZCol, BCol)

  /** Manifest-pruned BOX scan: `[lo, hi)` per dimension, reading only
    * the files whose curve cell intersects the box (+ exact residual).
    * Equals the full-scan filter always. */
  def box(spark: SparkSession, dir: String, v: Long,
          preds: Seq[(String, Long, Long)]): DataFrame =
    Snapshots.prunedScanAtBox(spark, dir, v,
      preds.map { case (c, lo, hi) => (c, lo: Any, hi: Any) })
      .drop(ZCol, BCol)

  /** The box pruning DECISION (files to read) — for gates/benchmarks. */
  def boxFiles(spark: SparkSession, dir: String, v: Long,
               preds: Seq[(String, Long, Long)]): Seq[String] =
    Snapshots.prunedFilesBox(spark, dir, v,
      preds.map { case (c, lo, hi) => (c, lo: Any, hi: Any) })
}
