package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PARTITION EVOLUTION on snapshot tables — re-bucket a table's
  * layout width WITHOUT rewriting history. A bucketed table derives
  * its bucket from the layout key (`bucket = key div width`) instead
  * of taking a caller-supplied column, and the WIDTH is table
  * metadata (`#bucketw` in each manifest) that [[evolveWidth]]
  * changes with a METADATA-ONLY commit: existing files keep their
  * epoch's layout untouched, new loads bucket at the new width, and
  * [[compact]] is the migrator that folds old-epoch files into the
  * current width as maintenance — never as a blocking rewrite.
  *
  * Why this is nearly free here: scan planning and MERGE never
  * consult bucket arithmetic at all — they plan from the manifest's
  * per-file key min/max ([[Snapshots]] `#stat` lines), which are
  * epoch-independent. Pruned scans therefore work unchanged across
  * epoch boundaries, and [[merge]] picks its rewrite set as "files
  * whose key RANGE intersects the update keys" (broadcast range join
  * of the manifest-sized stats list against the updates) — FINER
  * than bucket matching, and correct whatever width each file was
  * written under. Bucket width is exactly what it should be: a
  * write-side layout knob (file sizing / pruning resolution), not a
  * correctness surface.
  *
  * Per-file epochs ride in the manifest as `#filew:<width>:<rel>`
  * lines (carried forward like stats), so [[compact]] knows which
  * files predate the current width without opening any of them, and
  * [[fileWidths]] exposes the epoch census for gates/specs.
  *
  * Keys must be non-negative integers (`div` bucketing); the derived
  * bucket column ([[BCol]]) is materialized in the data files —
  * [[read]] drops it, and its per-file constancy IS the epoch's
  * layout, inspectable.
  *
  * Scale shape: evolveWidth is O(manifest); merge cost ∝ the key
  * ranges the updates touch (at most what bucket-matching rewrote,
  * usually less); compact cost ∝ old-epoch + fragmented data only.
  */
object BucketedTable {

  /** The derived bucket column materialized in the data files. */
  val BCol = "__gbucket"

  private def withBucket(df: DataFrame, keyCol: String, w: Long): DataFrame =
    df.withColumn(BCol, expr(s"$keyCol div $w"))

  /** (keyCol, width) currently in force, from the latest manifest. */
  def currentWidth(spark: SparkSession, dir: String): (String, Long) = {
    val v = Snapshots.latest(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"$dir has no snapshots"))
    widthAt(spark, dir, v)
  }

  private def widthAt(spark: SparkSession, dir: String, v: Long): (String, Long) =
    Snapshots.committedManifest(spark, dir, v).metaValues("bucketw").headOption
      .map { s =>
        val Array(k, w) = s.split(":", 2)
        (k, w.toLong)
      }
      .getOrElse(throw new IllegalArgumentException(
        s"$dir version $v is not a bucketed table (no #bucketw metadata)"))

  /** Per-file write-epoch widths of version `v` (manifest-only). */
  def fileWidths(spark: SparkSession, dir: String, v: Long): Map[String, Long] =
    Snapshots.committedManifest(spark, dir, v).metaValues("filew").map { s =>
      val Array(w, rel) = s.split(":", 2)
      rel -> w.toLong
    }.toMap

  private def filewLines(rels: Seq[String], w: Long): Seq[String] =
    rels.map(r => s"filew:$w:$r")

  private def carriedFilew(m: Snapshots.Manifest, kept: Set[String]): Seq[String] =
    m.meta.filter(_.startsWith("#filew:")).map(_.stripPrefix("#"))
      .filter(l => kept.contains(l.split(":", 3).last))

  private def carriedStats(m: Snapshots.Manifest, kept: Set[String]): Seq[String] =
    m.statLines.filter(l => kept.contains(l.split(":", 6).last))

  /** Publish the first version, bucketing `keyCol div width`. */
  def publish(df: DataFrame, dir: String, keyCol: String, width: Long,
              sortCols: Seq[String] = Nil,
              blockSize: Long = 128L * 1024 * 1024, numTasks: Int = 32): Long = {
    require(width > 0, "bucket width must be positive")
    val spark = df.sparkSession
    Snapshots.resolveForWrite(spark, dir)
    require(Snapshots.latest(spark, dir).isEmpty,
      s"$dir already has snapshots — use append")
    val sorts = if (sortCols.nonEmpty) sortCols else Seq(keyCol)
    val st = Snapshots.stage(withBucket(df, keyCol, width), dir, BCol,
      sorts, blockSize, numTasks)
    val v = Snapshots.claimAbove(spark, dir, 0L)
    Snapshots.commit(spark, dir, v, st.rels,
      Seq("format:2", s"schema:${st.schemaJson}", s"bucketw:$keyCol:$width") ++
        filewLines(st.rels, width) ++ st.statLines ++ st.sizeLines)
    v
  }

  /** Incremental load at the CURRENT width (new files join the
    * current epoch; older epochs' files are untouched). */
  def append(df: DataFrame, dir: String,
             blockSize: Long = 128L * 1024 * 1024, numTasks: Int = 32): Long = {
    val spark = df.sparkSession
    Snapshots.resolveForWrite(spark, dir)
    val prev = Snapshots.latest(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"$dir has no snapshots — use publish"))
    val pm = Snapshots.committedManifest(spark, dir, prev)
    val (keyCol, w) = widthAt(spark, dir, prev)
    val st = Snapshots.stage(withBucket(df, keyCol, w), dir, BCol,
      Seq(keyCol), blockSize, numTasks)
    val schema = pm.schemaOpt match {
      case Some(ps) =>
        Snapshots.mergeSchemas(ps,
          Snapshots.nullable(withBucket(df, keyCol, w).schema)).json
      case None => st.schemaJson
    }
    val v = Snapshots.claimAbove(spark, dir, prev)
    Snapshots.commit(spark, dir, v, pm.files ++ st.rels,
      Seq("format:2", s"schema:$schema") ++ Snapshots.carriedBatch(pm) ++
        pm.propLines ++ Seq(s"bucketw:$keyCol:$w") ++
        carriedFilew(pm, pm.files.toSet) ++ filewLines(st.rels, w) ++
        pm.statLines ++ st.statLines ++ pm.fsizeLines ++ st.sizeLines ++
        pm.dvLines)
    v
  }

  /** Change the bucket width — a METADATA-ONLY commit: the new
    * manifest lists the SAME files with the same stats and epochs,
    * only `#bucketw` changes. O(manifest) however large the table;
    * subsequent loads bucket at the new width; [[compact]] migrates
    * old epochs when maintenance chooses to. */
  def evolveWidth(spark: SparkSession, dir: String, newWidth: Long): Long = {
    require(newWidth > 0, "bucket width must be positive")
    Snapshots.resolveForWrite(spark, dir)
    val prev = Snapshots.latest(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"$dir has no snapshots"))
    val pm = Snapshots.committedManifest(spark, dir, prev)
    val (keyCol, _) = widthAt(spark, dir, prev)
    val schema = pm.schemaOpt.map(Snapshots.nullable(_).json).getOrElse(
      throw new IllegalArgumentException(s"$dir has no recorded schema"))
    val v = Snapshots.claimAbove(spark, dir, prev)
    Snapshots.commit(spark, dir, v, pm.files,
      Seq("format:2", s"schema:$schema") ++ Snapshots.carriedBatch(pm) ++
        pm.propLines ++ Seq(s"bucketw:$keyCol:$newWidth") ++
        carriedFilew(pm, pm.files.toSet) ++ pm.statLines ++ pm.fsizeLines ++
        pm.dvLines)
    v
  }

  /** MERGE across epochs — upsert where the rewrite set is chosen by
    * the manifest STATS, not bucket arithmetic: a file is rewritten
    * iff its key range intersects the update keys (one broadcast
    * range join of the manifest-sized stats list against the
    * updates). Rewritten rows restage at the CURRENT width —
    * touched data migrates as a side effect; untouched files (any
    * epoch) are shared byte-for-byte. */
  def merge(updates: DataFrame, dir: String, keyCols: Seq[String],
            blockSize: Long = 128L * 1024 * 1024, numTasks: Int = 32): Long = {
    require(keyCols.nonEmpty, "merge needs key columns")
    val spark = updates.sparkSession
    Snapshots.resolveForWrite(spark, dir)
    val prev = Snapshots.latest(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"$dir has no snapshots — use publish"))
    val pm = Snapshots.committedManifest(spark, dir, prev)
    val (keyCol, w) = widthAt(spark, dir, prev)
    require(keyCols.contains(keyCol),
      s"merge keys must include the layout key $keyCol")
    // NO persist of the update batch here: this path is updates-only
    // (guard + range-touch fold + staging write over a typically
    // trivial upstream DAG) — the [[Snapshots.mergeImpl]] measurement
    // showed the materialization tax exceeding the saved recompute on
    // exactly this shape (+0.36 s on q174 in the mid-round window).
    // A caller with an expensive batch DAG persists it itself.
    require(updates.filter(col(keyCol).isNull).isEmpty,
      s"merge: update rows carry NULL $keyCol values")
    // rewrite set from the manifest stats — zero data-file opens
    val stats = Snapshots.versionStats(spark, dir, prev, keyCol)
    import spark.implicits._
    val ranges = stats.map(s =>
        (s.path.stripPrefix(s"$dir/"), s.min, s.max))
      .toDF("__file", "__mn", "__mx")
    val touched = updates.join(broadcast(ranges),
        col(keyCol) >= col("__mn") && col(keyCol) <= col("__mx"))
      .select("__file").distinct().as[String].collect().toSet
    val upd = withBucket(updates, keyCol, w)
    val mergedRows =
      if (touched.isEmpty) upd
      else {
        val existing = Snapshots.readFiles(spark, dir,
          touched.toSeq.sorted, pm.schemaOpt, sizes = pm.fileSizes,
          dv = Snapshots.resolveDv(spark, dir, pm))
        // additive/widening alignment, then restaged rows RE-derive
        // their bucket at the current width (the epoch migration
        // side effect overrides whatever stale epoch values the old
        // files' materialized bucket column carries)
        val (ex0, up) = Snapshots.mergeAlign(existing, upd)
        ex0.withColumn(BCol, expr(s"$keyCol div $w"))
          .join(up.select(keyCols.map(col): _*), keyCols, "left_anti")
          .unionByName(up)
      }
    val st = Snapshots.stage(withBucket(mergedRows.drop(BCol), keyCol, w),
      dir, BCol, Seq(keyCol), blockSize, numTasks)
    val kept = pm.files.filterNot(touched)
    val keptSet = kept.toSet
    val schema = pm.schemaOpt match {
      case Some(ps) =>
        Snapshots.mergeSchemas(ps, Snapshots.nullable(mergedRows.schema)).json
      case None => st.schemaJson
    }
    val v = Snapshots.claimAbove(spark, dir, prev)
    Snapshots.commit(spark, dir, v, kept ++ st.rels,
      Seq("format:2", s"schema:$schema") ++ Snapshots.carriedBatch(pm) ++
        pm.propLines ++ Seq(s"bucketw:$keyCol:$w") ++
        carriedFilew(pm, keptSet) ++ filewLines(st.rels, w) ++
        carriedStats(pm, keptSet) ++ st.statLines ++
        pm.fsizeLines.filter(l => keptSet.contains(l.split(":", 3).last)) ++
        st.sizeLines ++
        pm.dvLines.filter(l => keptSet.contains(Snapshots.dvRelOf(l))))
    v
  }

  /** Compaction = the epoch MIGRATOR: rewrite, into one file per
    * current-width bucket, every file that (a) predates the current
    * width, (b) holds a current-epoch bucket the MIGRATING data will
    * land in (otherwise migration would CREATE fragmentation there —
    * the landing buckets come from the stale files' manifest stats,
    * zero data opens), or (c) shares its current-epoch bucket with
    * another file. Fully-migrated single-file buckets are not
    * touched, not even read — maintenance stays ∝ old-epoch +
    * fragmented data. Returns the previous version when there is
    * nothing to do. */
  def compact(spark: SparkSession, dir: String,
              blockSize: Long = 128L * 1024 * 1024): Long = {
    Snapshots.resolveForWrite(spark, dir)
    val prev = Snapshots.latest(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"$dir has no snapshots"))
    val pm = Snapshots.committedManifest(spark, dir, prev)
    val (keyCol, w) = widthAt(spark, dir, prev)
    val epochs = fileWidths(spark, dir, prev)
    val stale = pm.files.filter(f => !epochs.get(f).contains(w))
    val current = pm.files.filterNot(stale.contains)
    // where the stale files' keys will land, from manifest stats
    val ranges = Snapshots.versionStats(spark, dir, prev, keyCol)
      .map(s => s.path.stripPrefix(s"$dir/") -> ((s.min, s.max))).toMap
    val landing = stale.flatMap(f =>
      ranges.get(f).toSeq.flatMap { case (mn, mx) => (mn / w) to (mx / w) }).toSet
    // a stale file without stats has unknown landing buckets: be
    // conservative and pull every current file into the rewrite
    val conflict =
      if (stale.exists(f => !ranges.contains(f))) current
      else current.filter(f => Snapshots.fileBucket(f).exists(landing.contains))
    val frag = current.groupBy(f =>
        Snapshots.fileBucket(f).getOrElse(-1L))
      .filter(_._2.size >= 2).values.flatten.toSeq
    // DV-bearing files rewrite too: the DV-filtered read below
    // MATERIALIZES the deletes and their lines drop with the files
    val fullDv = Snapshots.resolveDv(spark, dir, pm)
    val dvFiles = pm.files.filter(fullDv.contains)
    val rewrite = (stale ++ conflict ++ frag ++ dvFiles).distinct.sorted
    if (rewrite.isEmpty) return prev
    val df = Snapshots.readFiles(spark, dir, rewrite, pm.schemaOpt,
      sizes = pm.fileSizes, dv = fullDv)
      .withColumn(BCol, expr(s"$keyCol div $w"))
    val st = Snapshots.stage(withBucket(df.drop(BCol), keyCol, w),
      dir, BCol, Seq(keyCol), blockSize, 32)
    val kept = pm.files.filterNot(rewrite.contains)
    val keptSet = kept.toSet
    val schema = pm.schemaOpt.map(Snapshots.nullable(_).json).getOrElse(st.schemaJson)
    val v = Snapshots.claimAbove(spark, dir, prev)
    Snapshots.commit(spark, dir, v, kept ++ st.rels,
      Seq("format:2", s"schema:$schema") ++ Snapshots.carriedBatch(pm) ++
        pm.propLines ++ Seq(s"bucketw:$keyCol:$w") ++
        carriedFilew(pm, keptSet) ++ filewLines(st.rels, w) ++
        carriedStats(pm, keptSet) ++ st.statLines ++
        pm.fsizeLines.filter(l => keptSet.contains(l.split(":", 3).last)) ++
        st.sizeLines ++
        pm.dvLines.filter(l => keptSet.contains(Snapshots.dvRelOf(l))))
    v
  }

  /** Props-driven maintenance for width-bucketed tables
    * ([[Snapshots.maintain]]'s core with THIS layout's compactor —
    * the landing-bucket-aware migrator). */
  def maintain(spark: SparkSession, dir: String,
               retainMs: Long = Snapshots.DefaultRetainMs,
               blockSize: Long = 128L * 1024 * 1024): Snapshots.Maintenance =
    Snapshots.maintainImpl(spark, dir, retainMs,
      () => compact(spark, dir, blockSize))

  /** Read version `v` (time travel), derived bucket dropped. */
  def readAt(spark: SparkSession, dir: String, v: Long): DataFrame =
    Snapshots.readAt(spark, dir, v).drop(BCol)

  /** Read the latest version, derived bucket dropped. */
  def read(spark: SparkSession, dir: String): DataFrame =
    Snapshots.read(spark, dir).drop(BCol)

  /** Stats-pruned range scan at version `v` — works UNCHANGED across
    * epoch boundaries (pruning consults per-file min/max, never
    * bucket arithmetic). */
  def prunedScanAt(spark: SparkSession, dir: String, v: Long,
                   lo: Long, hi: Long): DataFrame = {
    val (keyCol, _) = widthAt(spark, dir, v)
    Snapshots.prunedScanAt(spark, dir, v, keyCol, lo, hi).drop(BCol)
  }
}
