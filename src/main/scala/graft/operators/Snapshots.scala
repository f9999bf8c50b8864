package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Manifest-committed snapshot tables — the atomicity upgrade path
  * [[Layout.compact]]'s docstring names, built: a table is a
  * sequence of VERSIONS, each a manifest file listing exactly the
  * data files that version reads. Writers stage data files first
  * and publish them with ONE atomic manifest create; readers resolve
  * a manifest and never see a write in flight. This is the public
  * table-format core (Delta/Iceberg-class, minus their schema/txn
  * extras): snapshot isolation, time travel, compaction that never
  * breaks a concurrent reader, and vacuum as the ONLY operation
  * that deletes data.
  *
  * Commit protocol: data files land under `dir/data/<token>/…`
  * (token unique per write — staging is invisible until committed),
  * then the manifest `dir/_manifests/v<n>` is created with
  * create-EXCLUSIVE semantics: claiming version n is atomic, two
  * racing writers cannot both win it, and a loser retries against
  * the new latest. A crash BEFORE the manifest create leaves the
  * previous version fully readable plus orphaned staging files that
  * [[vacuum]] sweeps; there is no state in between.
  *
  * Scale shape (100 TB): a manifest is one small file per commit —
  * reading it is O(files listed), the same driver-side metadata
  * walk [[Layout.rowGroupStats]] already does; data moves only in
  * the staged writes themselves. [[compact]] stages merged files
  * for FRAGMENTED buckets only and the new manifest re-points those
  * buckets — old versions keep reading the old files untouched
  * (maintenance ∝ churn, readers ∝ nothing).
  */
object Snapshots {

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(dir: String) =
    new org.apache.hadoop.fs.Path(dir, "_manifests")

  private def manifestPath(dir: String, v: Long) =
    new org.apache.hadoop.fs.Path(manifestDir(dir), f"v$v%020d")

  /** All committed versions, ascending. */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val f = fs(spark, dir)
    val md = manifestDir(dir)
    if (!f.exists(md)) Seq.empty
    else f.listStatus(md).toSeq
      .map(_.getPath.getName)
      .filter(_.matches("v\\d{20}"))
      .map(_.drop(1).toLong)
      .sorted
  }

  /** Latest committed version, if any. */
  def latest(spark: SparkSession, dir: String): Option[Long] =
    versions(spark, dir).lastOption

  private def manifestLines(spark: SparkSession, dir: String,
                            v: Long): Seq[String] = {
    val p = manifestPath(dir, v)
    val f = fs(spark, dir)
    require(f.exists(p), s"snapshot version $v does not exist under $dir")
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).toList
    finally in.close()
  }

  /** The data files (paths relative to `dir`) version `v` reads. */
  def files(spark: SparkSession, dir: String, v: Long): Seq[String] =
    manifestLines(spark, dir, v).filterNot(_.startsWith("#"))

  /** The streaming batch ids already applied to this table (the
    * `#batch:` headers across all manifests) — the full ledger, for
    * inspection/audit. O(versions); the hot-path replay check is
    * [[lastAppliedBatch]]. */
  def appliedBatches(spark: SparkSession, dir: String): Set[Long] =
    versions(spark, dir).flatMap(v =>
      manifestLines(spark, dir, v).filter(_.startsWith("#batch:"))
        .map(_.stripPrefix("#batch:").toLong)).toSet

  /** The HIGHEST applied batch id — found by scanning manifests
    * newest-first and stopping at the first batch header (batch ids
    * are monotone per streaming query, so the newest header carries
    * the max). This keeps [[mergeBatch]]'s per-batch replay check at
    * O(non-batch commits since the last batch), not O(all versions)
    * — a stream sinking thousands of batches would otherwise pay a
    * quadratic manifest re-scan over its life. */
  def lastAppliedBatch(spark: SparkSession, dir: String): Option[Long] =
    versions(spark, dir).reverseIterator
      .map(v => manifestLines(spark, dir, v)
        .find(_.startsWith("#batch:")).map(_.stripPrefix("#batch:").toLong))
      .collectFirst { case Some(id) => id }

  /** Atomically commit `relFiles` as version `v`. Create-exclusive:
    * if `v` already exists (a racing writer won it), this throws and
    * nothing changes — the caller re-reads latest and retries.
    * `meta` lines (each rendered as `#key:value`) ride in the same
    * atomic write — metadata and file list cannot diverge. */
  def commit(spark: SparkSession, dir: String, v: Long,
             relFiles: Seq[String], meta: Seq[String] = Nil): Unit = {
    require(v >= 1, "versions start at 1")
    require(meta.forall(m => m.nonEmpty && !m.contains("\n")),
      "meta lines must be non-empty and single-line")
    val f = fs(spark, dir)
    f.mkdirs(manifestDir(dir))
    val p = manifestPath(dir, v)
    // overwrite=false — the atomic claim; throws if v is taken
    val out = f.create(p, false)
    try out.write(((meta.map("#" + _) ++ relFiles).mkString("\n") + "\n")
      .getBytes("UTF-8"))
    finally out.close()
  }

  /** Stage one bucket-partitioned, key-sorted load under a fresh
    * token dir and return the staged files relative to `dir`.
    * Nothing is visible until a manifest referencing them commits. */
  private def stage(df: DataFrame, dir: String, bucketCol: String,
                    sortCols: Seq[String], blockSize: Long,
                    numTasks: Int): Seq[String] = {
    val token = java.util.UUID.randomUUID().toString.take(8)
    val stageDir = s"$dir/data/$token"
    df.repartition(numTasks, col(bucketCol))
      .sortWithinPartitions(col(bucketCol) +: sortCols.map(col): _*)
      .write.mode("errorifexists")
      .option("parquet.block.size", blockSize)
      .partitionBy(bucketCol)
      .parquet(stageDir)
    val f = fs(df.sparkSession, dir)
    def walk(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] =
      f.listStatus(p).toSeq.flatMap { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (st.getPath.getName.endsWith(".parquet")) Seq(st.getPath)
        else Seq.empty
      }
    val staged = walk(new org.apache.hadoop.fs.Path(stageDir))
      .map(p => s"data/$token/" + p.toString.split(s"/data/$token/").last)
    // a zero-file stage would commit a manifest no reader can resolve
    // a schema from — almost certainly an empty input upstream; fail
    // loudly rather than poison the version history
    require(staged.nonEmpty,
      s"stage produced no data files under $stageDir — refusing to " +
        "commit an unreadable version (empty input?)")
    staged
  }

  /** Publish the FIRST version of a snapshot table. */
  def publish(df: DataFrame, dir: String, bucketCol: String,
              sortCols: Seq[String], blockSize: Long = 128L * 1024 * 1024,
              numTasks: Int = 32): Long = {
    val spark = df.sparkSession
    require(latest(spark, dir).isEmpty,
      s"$dir already has snapshots — use append")
    val staged = stage(df, dir, bucketCol, sortCols, blockSize, numTasks)
    commit(spark, dir, 1L, staged)
    1L
  }

  /** Commit an incremental load: next version = previous files + the
    * newly staged ones (one new file per touched bucket). */
  def append(df: DataFrame, dir: String, bucketCol: String,
             sortCols: Seq[String], blockSize: Long = 128L * 1024 * 1024,
             numTasks: Int = 32): Long = {
    val spark = df.sparkSession
    val prev = latest(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"$dir has no snapshots — use publish"))
    val staged = stage(df, dir, bucketCol, sortCols, blockSize, numTasks)
    val v = prev + 1
    commit(spark, dir, v, files(spark, dir, prev) ++ staged)
    v
  }

  /** Read a set of manifest-relative files, bucket column recovered.
    * Files are grouped by staging token so partition discovery gets
    * one basePath per group, then unioned WITH null-fill for columns
    * a group predates — ADDITIVE schema evolution (new columns
    * appear over a table's life; old files read them as null; column
    * DROPS are not supported and surface loudly at merge). */
  private def readFiles(spark: SparkSession, dir: String,
                        rels: Seq[String]): DataFrame = {
    val byToken = rels.groupBy(_.split("/")(1))
    byToken.toSeq.sortBy(_._1).map { case (token, fls) =>
      spark.read.option("basePath", s"$dir/data/$token")
        .parquet(fls.map(f => s"$dir/$f"): _*)
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Bucket value encoded in a manifest-relative file path. */
  private def bucketOf(bucketCol: String)(rel: String): Long = {
    val seg = rel.split("/").find(_.startsWith(s"$bucketCol="))
      .getOrElse(throw new IllegalArgumentException(
        s"data file outside a bucket directory: $rel"))
    seg.substring(seg.indexOf('=') + 1).toLong
  }

  /** Read the table at version `v` (time travel). */
  def readAt(spark: SparkSession, dir: String, v: Long): DataFrame =
    readFiles(spark, dir, files(spark, dir, v))

  /** Read the latest version. */
  def read(spark: SparkSession, dir: String): DataFrame =
    readAt(spark, dir, latest(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"$dir has no snapshots")))

  /** Compaction through the manifest layer: merge every bucket that
    * is FRAGMENTED in the latest version (≥ 2 files) into one staged
    * key-sorted file, and commit a manifest re-pointing those
    * buckets. Old files are NOT deleted — earlier versions keep
    * reading them; [[vacuum]] reclaims them once their last
    * referencing version is dropped. Never breaks a reader. */
  def compact(spark: SparkSession, dir: String, bucketCol: String,
              sortCols: Seq[String], blockSize: Long = 128L * 1024 * 1024):
      Long = {
    val prev = latest(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"$dir has no snapshots"))
    val prevFiles = files(spark, dir, prev)
    val bOf = bucketOf(bucketCol) _
    val frag = prevFiles.groupBy(bOf).filter(_._2.size >= 2)
    if (frag.isEmpty) return prev
    val fragDf = readFiles(spark, dir, frag.values.flatten.toSeq)
    val staged = stage(fragDf, dir, bucketCol, sortCols, blockSize,
      math.max(frag.size, 1))
    val kept = prevFiles.filterNot(f => frag.contains(bOf(f)))
    val v = prev + 1
    commit(spark, dir, v, kept ++ staged)
    v
  }

  /** MERGE (upsert) — the CDC apply step: commit a new version where
    * every target row whose key matches an update row is REPLACED
    * and every update row is inserted (rows with unmatched keys are
    * pure inserts, including into brand-new buckets). Only the
    * buckets the updates touch are rewritten — untouched buckets
    * share their files with the previous version byte-for-byte, and
    * earlier versions keep reading the pre-merge state (time travel
    * across a merge works). Updates must carry exactly the target's
    * columns, including `bucketCol`; key uniqueness WITHIN the
    * update batch is the caller's contract (duplicate update keys
    * all insert — dedup upstream, e.g. q12's idxmax keep-latest).
    *
    * Scale: one driver-side distinct on the touched-bucket ids
    * (bounded by bucket count, a manifest-sized list), one anti-join
    * of ONLY the touched buckets' rows against the update keys, one
    * staged write of those buckets. Cost ∝ touched data, never
    * table size. */
  def merge(updates: DataFrame, dir: String, bucketCol: String,
            keyCols: Seq[String], sortCols: Seq[String],
            blockSize: Long = 128L * 1024 * 1024,
            numTasks: Int = 32, meta: Seq[String] = Nil): Long = {
    require(keyCols.nonEmpty, "merge needs key columns")
    val spark = updates.sparkSession
    val prev = latest(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"$dir has no snapshots — use publish"))
    val prevFiles = files(spark, dir, prev)
    val bOf = bucketOf(bucketCol) _
    val touched = updates.select(col(bucketCol).cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    if (touched.isEmpty) return prev // empty batch: nothing to commit
    val existingFiles = prevFiles.filter(f => touched.contains(bOf(f)))
    val mergedRows = {
      val aligned =
        if (existingFiles.isEmpty) updates
        else {
          val existing = readFiles(spark, dir, existingFiles)
          // additive evolution: updates may ADD columns (old rows
          // null-fill on read); dropping target columns is refused
          val dropped = existing.columns.toSet -- updates.columns.toSet
          require(dropped.isEmpty,
            s"merge: updates drop target columns ${dropped.toSeq.sorted.mkString(",")} " +
              "— additive evolution only (add columns, never remove)")
          // align names AND types (partition discovery may narrow the
          // bucket column) to the update side, null-filling columns
          // the target predates, then drop matched keys
          existing.select(updates.columns.map(c =>
            (if (existing.columns.contains(c)) col(c)
             else lit(null)).cast(updates.schema(c).dataType).as(c)): _*)
            .join(updates.select(keyCols.map(col): _*), keyCols, "left_anti")
            .unionByName(updates)
        }
      aligned
    }
    val staged = stage(mergedRows, dir, bucketCol, sortCols, blockSize, numTasks)
    val kept = prevFiles.filterNot(f => touched.contains(bOf(f)))
    val v = prev + 1
    commit(spark, dir, v, kept ++ staged, meta)
    v
  }

  /** Idempotent batch upsert — the foreachBatch EXACTLY-ONCE sink
    * discipline: the applied batch id rides in the committed
    * manifest itself (same atomic write as the file list), and a
    * REPLAY of an already-applied id is a no-op returning the
    * current version. This is what makes a Structured Streaming
    * restart safe: the engine re-delivers the last unacknowledged
    * batch, the ledger absorbs it, the table state stays applied-
    * once. Batch ids are monotone per query, so "already applied" =
    * "id ≤ [[lastAppliedBatch]]" — checked off the newest
    * batch-bearing manifest only, never a full ledger scan.
    * Single-writer discipline (one streaming query per table)
    * is the stated contract — foreachBatch already serializes
    * batches within a query; a second concurrent writer should go
    * through its own table and a downstream merge. */
  def mergeBatch(batchId: Long, updates: DataFrame, dir: String,
                 bucketCol: String, keyCols: Seq[String],
                 sortCols: Seq[String],
                 blockSize: Long = 128L * 1024 * 1024,
                 numTasks: Int = 32): Long = {
    val spark = updates.sparkSession
    // batch ids are MONOTONE per streaming query (Spark's checkpoint
    // guarantees it), so any id <= the highest applied one is a
    // re-delivery — absorbed without reading a single manifest
    // beyond the newest batch-bearing one (the Delta-sink
    // txn-version semantics; an all-manifests ledger scan per batch
    // would go quadratic over a long stream's life)
    if (lastAppliedBatch(spark, dir).exists(batchId <= _))
      latest(spark, dir).get // re-delivery: already applied, change nothing
    else
      merge(updates, dir, bucketCol, keyCols, sortCols, blockSize,
        numTasks, meta = Seq(s"batch:$batchId"))
  }

  /** [[mergeBatch]] curried for `writeStream.foreachBatch`. */
  def foreachBatchMerge(dir: String, bucketCol: String,
                        keyCols: Seq[String], sortCols: Seq[String]):
      (DataFrame, Long) => Unit =
    (batchDf, batchId) => {
      mergeBatch(batchId, batchDf, dir, bucketCol, keyCols, sortCols)
      ()
    }

  /** Row-level change feed between two versions (CDC EMIT — the
    * complement of [[merge]]'s CDC apply): `_change` = 'insert' for
    * rows present in `vNew` but not `vOld`, 'delete' for the
    * reverse, EXACT MULTISET semantics (a replaced row appears as
    * one delete + one insert; duplicates count). Reads ONLY the
    * files the two manifests do NOT share — file sharing makes the
    * carried-over bulk cancel at the metadata level, so a diff
    * across a merge reads just the rewritten buckets, and a diff
    * across a COMPACTION is provably empty (same rows, different
    * files — the q166 gate pins it). Cost ∝ churn between the
    * versions, never table size. */
  def diff(spark: SparkSession, dir: String, vOld: Long, vNew: Long): DataFrame = {
    val fo = files(spark, dir, vOld).toSet
    val fn = files(spark, dir, vNew).toSet
    val onlyOld = (fo -- fn).toSeq.sorted
    val onlyNew = (fn -- fo).toSeq.sorted
    lazy val empty = readFiles(spark, dir, files(spark, dir, vNew)).limit(0)
    val newSide = if (onlyNew.isEmpty) empty else readFiles(spark, dir, onlyNew)
    val oldSide = if (onlyOld.isEmpty) empty else readFiles(spark, dir, onlyOld)
    // align partition-discovered column types across token groups,
    // null-filling columns the old side predates (additive evolution)
    val oldAligned = oldSide.select(newSide.columns.map(c =>
      (if (oldSide.columns.contains(c)) col(c)
       else lit(null)).cast(newSide.schema(c).dataType).as(c)): _*)
    newSide.exceptAll(oldAligned).withColumn("_change", lit("insert"))
      .unionByName(oldAligned.exceptAll(newSide).withColumn("_change", lit("delete")))
  }

  /** Footer-pruned range scan of a VERSION — time travel composed
    * with [[Layout]]'s min/max skipping: the manifest supplies the
    * file list (no directory walk — unreferenced/orphaned files
    * never consulted), real parquet footers supply per-row-group
    * min/max, and only surviving files are read before the residual
    * filter. Same rows as `readAt(v).filter(lo <= key < hi)`, I/O
    * proportional to the predicate's key range within that
    * version. */
  /** Footer stats for version `v`'s files — compute once and pass to
    * repeated [[prunedScanAt]] calls over the same version (a scan
    * planner caches exactly this). */
  def versionStats(spark: SparkSession, dir: String, v: Long,
                   keyCol: String): Seq[Layout.RowGroupStat] =
    Layout.rowGroupStatsFiles(spark,
      files(spark, dir, v).map(r => s"$dir/$r"), keyCol)

  def prunedScanAt(spark: SparkSession, dir: String, v: Long,
                   keyCol: String, lo: Long, hi: Long,
                   stats: Option[Seq[Layout.RowGroupStat]] = None): DataFrame = {
    val st = stats.getOrElse(versionStats(spark, dir, v, keyCol))
    val surviving = st.filter(s => s.max >= lo && s.min < hi)
      .map(_.path.stripPrefix(s"$dir/")).distinct
    val residual = col(keyCol) >= lo && col(keyCol) < hi
    if (surviving.isEmpty)
      readFiles(spark, dir, files(spark, dir, v)).filter(residual).limit(0)
    else readFiles(spark, dir, surviving).filter(residual)
  }

  /** Drop every version below `keepFrom` and delete the data files
    * no kept version references. Returns (manifests dropped, data
    * files deleted, data files kept). This is the ONLY operation
    * that deletes data — everything else only adds. */
  def vacuum(spark: SparkSession, dir: String, keepFrom: Long):
      (Long, Long, Long) = {
    val vs = versions(spark, dir)
    require(vs.contains(keepFrom), s"keepFrom=$keepFrom is not a version of $dir")
    val (drop, keep) = vs.partition(_ < keepFrom)
    val referenced = keep.flatMap(v => files(spark, dir, v)).toSet
    val f = fs(spark, dir)
    // every data file on disk, relative
    val dataRoot = new org.apache.hadoop.fs.Path(dir, "data")
    def walk(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] =
      if (!f.exists(p)) Seq.empty
      else f.listStatus(p).toSeq.flatMap { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (st.getPath.getName.endsWith(".parquet")) Seq(st.getPath)
        else Seq.empty
      }
    val prefix = new org.apache.hadoop.fs.Path(dir).toUri.getPath.stripSuffix("/")
    val all = walk(dataRoot).map { p =>
      val abs = p.toUri.getPath
      abs.stripPrefix(prefix).stripPrefix("/")
    }
    val orphans = all.filterNot(referenced)
    orphans.foreach(rel =>
      f.delete(new org.apache.hadoop.fs.Path(s"$dir/$rel"), false))
    drop.foreach(v => f.delete(manifestPath(dir, v), false))
    (drop.size.toLong, orphans.size.toLong, (all.size - orphans.size).toLong)
  }
}
