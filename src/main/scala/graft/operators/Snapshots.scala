package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

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
  * Manifest format (v2): alongside the file list, each manifest
  * carries `#`-prefixed META that makes planning manifest-only —
  *  - `#schema:<json>`  the version's logical schema. Reads pass it
  *    as the EXPLICIT parquet read schema, so any file mix (tokens,
  *    schema epochs) reads in ONE `spark.read.parquet(files:_*)`
  *    relation — no per-token partition discovery, no unionByName
  *    chain growing with commit count, and files that predate a
  *    column null-fill it natively (additive evolution).
  *  - `#stat:<key>:<rows>:<min>:<max>:<relpath>`  per-FILE min/max
  *    of the layout key, footer-walked at WRITE time over ONLY the
  *    newly staged files and carried forward for kept files — so
  *    [[prunedScanAt]]/[[versionStats]] plan from the manifest alone
  *    with ZERO data-file opens (the Delta/Iceberg stats-in-metadata
  *    shape; the footer walk remains as the verification path).
  *  - `#batch:<id>`  the exactly-once sink's ledger entry.
  * The bucket value is stored as a DATA column (the staging write
  * duplicates it into the `__bdir=N` directory for layout); reads
  * never need partition discovery to recover it, and its original
  * type survives.
  *
  * Scale shape (100 TB): a manifest is one small file per commit —
  * reading it is O(files listed); scan PLANNING is a pure manifest
  * read (no footer opens — at a million files the difference is
  * hours); data moves only in the staged writes themselves.
  * [[compact]] stages merged files for FRAGMENTED buckets only and
  * the new manifest re-points those buckets — old versions keep
  * reading the old files untouched (maintenance ∝ churn, readers
  * ∝ nothing).
  */
object Snapshots {

  /** Directory-partition column name used by the staging write — the
    * bucket value itself stays in the data (see class doc). */
  private[graft] val DirCol = "__bdir"

  /** Default [[vacuum]] retention: data files younger than this are
    * never swept as orphans, so a vacuum racing an in-flight writer
    * cannot delete files the writer has staged but not yet committed
    * (the Delta/Iceberg retention-threshold guard). Tests and
    * exclusive-access maintenance pass 0 explicitly. */
  val DefaultRetainMs: Long = 7L * 24 * 3600 * 1000

  /** The pluggable atomic-claim primitive every manifest commit and
    * txn record goes through — see [[CommitStore]] for the exact
    * filesystem contract and when the default does NOT hold (plain
    * S3A). Process-wide, set once at startup. */
  @volatile var commitStore: CommitStore = AtomicCreateStore

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(dir: String) =
    new org.apache.hadoop.fs.Path(dir, "_manifests")

  private def manifestPath(dir: String, v: Long) =
    new org.apache.hadoop.fs.Path(manifestDir(dir), f"v$v%020d")

  /** Every version NUMBER a manifest file exists for, ascending —
    * including transactional manifests whose record is still
    * in-flight or aborted (tombstones). Version claims go above
    * these; READERS want [[versions]]. */
  // hoisted: String.matches would re-compile the pattern on EVERY
  // manifest-listing entry
  private val ManifestName = java.util.regex.Pattern.compile("v\\d{20}")

  /** Cached manifest listing per table dir. Version claims are DENSE
    * at the top (every writer claims rawTop + 1; only vacuum removes,
    * and only from the bottom), so after one full listing the set is
    * maintained by PROBING `top + 1` — a steady-state streaming
    * trigger costs ONE existence check instead of an O(all versions)
    * directory listing (on an object store: one HEAD instead of a
    * paged LIST). Writers in this process extend it at commit;
    * foreign writers are discovered by the probe; vacuum drops the
    * entry (next call re-lists). Like every metadata cache here it
    * assumes the vacuum retention discipline the docstrings demand —
    * a FOREIGN process must not vacuum versions this one still
    * replays. */
  private val dirListCache =
    new java.util.concurrent.ConcurrentHashMap[String, Vector[Long]]()

  private[graft] def rawVersions(spark: SparkSession, dir: String): Seq[Long] = {
    val f = fs(spark, dir)
    val cached = dirListCache.get(dir)
    if (cached == null || cached.isEmpty) {
      val md = manifestDir(dir)
      val full =
        if (!f.exists(md)) Vector.empty[Long]
        else f.listStatus(md).toVector
          .map(_.getPath.getName)
          .filter(ManifestName.matcher(_).matches())
          .map(_.drop(1).toLong)
          .sorted
      if (full.nonEmpty) dirListCache.put(dir, full)
      full
    } else if (!f.exists(manifestPath(dir, cached.last))) {
      // out-of-band wipe guard: the cached top vanished, so the
      // location was deleted/rebuilt outside the protocol (vacuum
      // never touches the top) — purge EVERYTHING cached under it
      // and re-list from disk
      invalidate(dir)
      rawVersions(spark, dir)
    } else {
      var ext = cached
      while (f.exists(manifestPath(dir, ext.last + 1))) ext = ext :+ (ext.last + 1)
      if (ext ne cached) dirListCache.put(dir, ext)
      ext
    }
  }

  // -----------------------------------------------------------------
  // Driver-side metadata caches. Manifests are IMMUTABLE once written
  // (version numbers are never reused; vacuum deletes but never
  // rewrites), a DECIDED transaction record is permanent, and
  // committedness can only go one way (in-flight → decided). So:
  // parsed manifests cache until evicted, decided txn records cache
  // forever, and committedness caches once true. This is what keeps
  // [[versions]]/[[latest]] manifest-read-FREE on hot paths — the
  // change feed's admission-control `latestOffset` calls [[versions]]
  // EVERY microbatch trigger, and without the cache a long-lived
  // table would pay O(all versions) small-file reads per trigger
  // (the quadratic-over-a-stream's-life shape the batch ledger and
  // the high-water sink check already avoid). A fresh process still
  // pays O(versions) reads ONCE to warm; after that a trigger costs
  // one directory listing plus reads for genuinely NEW manifests.
  // -----------------------------------------------------------------
  private val ManifestCacheMax = 4096
  private val manifestCache: java.util.Map[String, Manifest] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, Manifest](128, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Manifest]): Boolean =
          size() > ManifestCacheMax
      })
  /** Manifest paths KNOWN committed — monotone, never invalidated
    * (only vacuum removes entries, with their manifests). */
  private val committedCache =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  /** Decided transaction records: recordPath → committed?. */
  private val txnCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** Drop all cached metadata — the stress/spec hook that simulates a
    * FRESH process attaching to an existing table (the one-time warm
    * cost the caches amortize). */
  private[graft] def clearCaches(): Unit = {
    manifestCache.clear()
    committedCache.clear()
    txnCache.clear()
    dirListCache.clear()
    checkpointLoaded.clear()
    dvSidecarCache.clear()
  }

  /** Cache key for (dir, version) — a plain string concat, NOT a
    * hadoop Path: Path.toString re-parses the URI every time, and the
    * hot paths build one key per version per trigger. */
  private def cacheKey(dir: String, v: Long): String = dir + " " + v

  /** Purge every cached metadata entry at or under `path` (no
    * filesystem change). Needed when a table LOCATION is wiped and
    * rebuilt outside the commit protocol (tests, benchmarks): the
    * immutability assumptions the caches rest on do not survive an
    * out-of-band delete+recreate. */
  def invalidate(path: String): Unit = {
    val pfx = path.stripSuffix("/")
    val hit: java.util.function.Predicate[String] = k =>
      k == pfx || k.startsWith(pfx + "/") || k.startsWith(pfx + " ")
    manifestCache.synchronized { manifestCache.keySet().removeIf(hit) }
    committedCache.removeIf(hit)
    txnCache.keySet().removeIf(hit)
    dirListCache.keySet().removeIf(hit)
    checkpointLoaded.removeIf(hit)
    dvSidecarCache.keySet().removeIf(hit)
  }

  /** Delete `path` recursively AND purge the metadata caches under it
    * — the only safe way to wipe and rebuild a table location within
    * one process (a raw `fs.delete` would leave the caches serving
    * the dead table's manifests). */
  def dropPath(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    invalidate(path)
  }

  private def checkpointPath(dir: String) =
    new org.apache.hadoop.fs.Path(manifestDir(dir), "_checkpoint")

  /** Persist a COMMITTEDNESS CHECKPOINT (the Delta `_last_checkpoint`
    * discipline, for the one thing our cold path pays for): a fresh
    * process attaching to a long-lived table must otherwise OPEN
    * every manifest once just to learn whether it carries `#txn` —
    * O(versions) small-file reads. The checkpoint records each
    * version's DECIDED state (`c` committed / `a` aborted tombstone);
    * undecided in-flight transactions are deliberately OMITTED (their
    * fate is open — readers must re-check the record). Written to a
    * temp sibling and RENAMED in (content-atomic, like the compaction
    * journal); safe to regenerate at any time, stale checkpoints just
    * cover fewer versions. Run it as maintenance after batch loads —
    * cold attach cost drops to one listing + one file read + opens
    * for versions ABOVE the checkpoint only. */
  def checkpoint(spark: SparkSession, dir: String): Long = {
    val f = fs(spark, dir)
    val lines = rawVersions(spark, dir).flatMap { v =>
      val m = manifest(spark, dir, v)
      m.metaValues("txn").headOption match {
        case None => Some(s"$v:c")
        case Some(rec) => txnState(spark, rec) match {
          case Some(true) => Some(s"$v:c")
          case Some(false) => Some(s"$v:a")
          case None => None // in flight: fate open, never checkpointed
        }
      }
    }
    val tmp = new org.apache.hadoop.fs.Path(manifestDir(dir), "_checkpoint.tmp")
    f.mkdirs(manifestDir(dir))
    val out = f.create(tmp, true)
    try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    f.delete(checkpointPath(dir), false)
    require(f.rename(tmp, checkpointPath(dir)),
      s"checkpoint rename failed under $dir")
    lines.size.toLong
  }

  /** How many versions the persisted committedness checkpoint covers
    * (None if no checkpoint has been written) — operational
    * visibility for the `ckptevery` policy and the maintenance docs. */
  def checkpointCoverage(spark: SparkSession, dir: String): Option[Long] = {
    val f = fs(spark, dir)
    val cp = checkpointPath(dir)
    if (!f.exists(cp)) None
    else {
      val in = f.open(cp)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .count(_.nonEmpty).toLong)
      finally in.close()
    }
  }

  /** Seed the committedness caches from the checkpoint, if present —
    * called once per (process, dir) on the first cold committedness
    * miss. Aborted entries seed the decided-txn knowledge indirectly:
    * the version is simply never marked committed, and the one
    * manifest+record read it would cost only happens if someone asks
    * about that tombstone specifically. */
  private val checkpointLoaded =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def loadCheckpoint(spark: SparkSession, dir: String): Unit = {
    if (!checkpointLoaded.add(dir)) return
    val f = fs(spark, dir)
    val cp = checkpointPath(dir)
    if (!f.exists(cp)) return
    val in = f.open(cp)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).toList
      finally in.close()
    lines.foreach { l =>
      l.split(":", 2) match {
        case Array(v, "c") if v.forall(_.isDigit) =>
          committedCache.add(cacheKey(dir, v.toLong))
        case _ => () // aborted or malformed: decide from disk if asked
      }
    }
  }

  /** A transaction record's state: absent (in flight), committed, or
    * aborted. The record is create-exclusive — its first writer
    * decides, permanently (which is what makes the decided state
    * cacheable). */
  private def txnState(spark: SparkSession, rec: String): Option[Boolean] = {
    val cached = txnCache.get(rec)
    if (cached != null) return Some(cached.booleanValue())
    val p = new org.apache.hadoop.fs.Path(rec)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val first =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .find(_.nonEmpty).getOrElse("")
        finally in.close()
      val st = first.startsWith("commit")
      txnCache.put(rec, java.lang.Boolean.valueOf(st))
      Some(st)
    }
  }

  /** Is this manifest visible to readers? Plain manifests always;
    * transactional ones only once their record says `commit`. */
  private def isCommitted(spark: SparkSession, m: Manifest): Boolean =
    m.metaValues("txn").headOption.forall(rec =>
      txnState(spark, rec).contains(true))

  private def isCommittedVersion(spark: SparkSession, dir: String,
                                 v: Long): Boolean = {
    val key = cacheKey(dir, v)
    if (committedCache.contains(key)) true
    else {
      // first cold miss per (process, dir): seed from the persisted
      // checkpoint so attaching to a long history opens no manifests
      loadCheckpoint(spark, dir)
      if (committedCache.contains(key)) true
      else {
        val ok = isCommitted(spark, manifest(spark, dir, v))
        if (ok) committedCache.add(key)
        ok
      }
    }
  }

  /** All COMMITTED versions, ascending — the reader's view. Plain
    * manifests need no extra I/O; transactional ones cost one record
    * existence check each. */
  def versions(spark: SparkSession, dir: String): Seq[Long] =
    rawVersions(spark, dir).filter(isCommittedVersion(spark, dir, _))

  /** Latest committed version, if any — walks the manifest listing
    * from the top and stops at the first committed one (normally the
    * very first probe). */
  def latest(spark: SparkSession, dir: String): Option[Long] =
    rawVersions(spark, dir).reverseIterator
      .find(isCommittedVersion(spark, dir, _))

  /** Resolve the manifest of a COMMITTED version, refusing aborted /
    * in-flight transactional manifests — the accessor every read
    * path goes through. */
  private[operators] def committedManifest(spark: SparkSession, dir: String,
                                v: Long): Manifest = {
    val m = manifest(spark, dir, v)
    require(isCommitted(spark, m),
      s"snapshot version $v of $dir is not committed (an in-flight or " +
        "aborted transaction) — readers see only committed versions")
    m
  }

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

  /** One parsed manifest: the file list plus keyed meta accessors. */
  private[graft] case class Manifest(files: Seq[String], meta: Seq[String]) {
    def metaValues(key: String): Seq[String] = {
      val p = s"#$key:"
      meta.collect { case m if m.startsWith(p) => m.stripPrefix(p) }
    }
    /** The version's logical read schema, if recorded (format 2). */
    def schemaOpt: Option[StructType] =
      metaValues("schema").headOption.map(j =>
        org.apache.spark.sql.types.DataType.fromJson(j).asInstanceOf[StructType])
    /** Per-file (rows, min, max) stats recorded for `keyCol`. */
    def stats(keyCol: String): Map[String, (Long, Long, Long)] =
      metaValues("stat").flatMap { s =>
        // key:rows:min:max:relpath — path last (never contains ':')
        s.split(":", 5) match {
          case Array(k, rows, mn, mx, rel) if k == keyCol =>
            Some(rel -> ((rows.toLong, mn.toLong, mx.toLong)))
          case _ => None
        }
      }.toMap
    /** Raw stat meta lines (for carrying kept files forward). */
    def statLines: Seq[String] = meta.filter(_.startsWith("#stat:"))
      .map(_.stripPrefix("#"))
    /** Typed per-file stats for a PHYSICAL column (format 2.1
      * `#stat2:<col>:<kind>:<rows>:<min>:<max>:<rel>` lines):
      * rel → (rows, kind, minEnc, maxEnc). */
    def stats2(colPhys: String): Map[String, (Long, String, String, String)] =
      metaValues("stat2").flatMap { s =>
        s.split(":", 6) match {
          case Array(c, kind, rows, mn, mx, rel) if c == colPhys =>
            Some(rel -> ((rows.toLong, kind, mn, mx)))
          case _ => None
        }
      }.toMap
    /** Raw stat2 AND stat3 lines (ONE carry surface, the [[dvLines]]
      * discipline — every kept-file carry site filters these by
      * [[Snapshots.statRelOf]], so the row-group family cannot be
      * silently dropped by a site that predates it). */
    def stat2Lines: Seq[String] = meta.filter(m =>
      m.startsWith("#stat2:") || m.startsWith("#stat3:"))
      .map(_.stripPrefix("#"))
    /** Per-ROW-GROUP typed stats for a PHYSICAL column (format 2.3
      * `#stat3:<col>:<kind>:<start>:<len>:<rows>:<min>:<max>:<rel>`
      * lines — recorded at staging only for files with ≥ 2 row
      * groups): rel → row groups in byte order. */
    def stats3(colPhys: String): Map[String, Seq[Layout.TypedRgStat]] =
      metaValues("stat3").flatMap { s =>
        s.split(":", 8) match {
          case Array(c, kind, start, len, rows, mn, mx, rel) if c == colPhys =>
            Some(Layout.TypedRgStat(rel, c, start.toLong, len.toLong,
              rows.toLong, kind, mn, mx))
          case _ => None
        }
      }.groupBy(_.path).map { case (rel, gs) =>
        rel -> gs.sortBy(_.start).toSeq
      }
    /** The declared typed-stats column list (PHYSICAL names). */
    def statCols: Seq[String] = metaValues("statcols").headOption
      .map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)
    /** The statcols declaration line, for carry-forward. */
    def statColsLines: Seq[String] =
      metaValues("statcols").headOption.map(s => s"statcols:$s").toSeq
    /** Per-file KMV NDV sketches for a PHYSICAL column (format 2.1
      * `#ndv:<col>:<b64>:<rel>` lines): rel → decoded sketch. */
    def ndvSketches(colPhys: String): Map[String, Array[Long]] =
      metaValues("ndv").flatMap { s =>
        s.split(":", 3) match {
          case Array(c, b64, rel) if c == colPhys =>
            Some(rel -> Ndv.decode(b64))
          case _ => None
        }
      }.toMap
    /** Raw ndv lines (carry-forward). */
    def ndvLines: Seq[String] = meta.filter(_.startsWith("#ndv:"))
      .map(_.stripPrefix("#"))
    /** The declared NDV column list (PHYSICAL names). */
    def ndvCols: Seq[String] = metaValues("ndvcols").headOption
      .map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)
    def ndvColsLines: Seq[String] =
      metaValues("ndvcols").headOption.map(s => s"ndvcols:$s").toSeq
    /** Column RENAME map, physical → logical (format 2.1): entries
      * exist only for renamed columns. The PHYSICAL name — the name a
      * column was born under, the one every data file stores — never
      * changes; the manifest schema carries the current LOGICAL name
      * and this map ties them. */
    def colMap: Map[String, String] = metaValues("colmap").map { s =>
      val Array(p, l) = s.split(":", 2)
      p -> l
    }.toMap
    /** logical → physical (the staging/stat direction). */
    def toPhysical: Map[String, String] = colMap.map(_.swap)
    /** Raw colmap lines for carrying forward. */
    def colmapLines: Seq[String] = meta.filter(_.startsWith("#colmap:"))
      .map(_.stripPrefix("#"))
    /** Per-file byte sizes (`#fsize:<bytes>:<rel>`, recorded from the
      * staging listing — Iceberg's file_size_in_bytes): size-based
      * planning reads the manifest, never the filesystem. */
    def fileSizes: Map[String, Long] = metaValues("fsize").flatMap { s =>
      s.split(":", 2) match {
        case Array(n, rel) => Some(rel -> n.toLong)
        case _ => None
      }
    }.toMap
    /** Raw fsize lines (carry-forward). */
    def fsizeLines: Seq[String] = meta.filter(_.startsWith("#fsize:"))
      .map(_.stripPrefix("#"))
    /** Per-file DELETION VECTORS (format 2.2 `#dv:<b64>:<rel>` lines —
      * merge-on-read deletes): rel → sorted dead row POSITIONS
      * ([[Dv]] codec). A version's logical content is its files'
      * rows MINUS these positions; every read path applies them,
      * rewrites materialize them (the rewrite reads DV-filtered) and
      * drop the line, and [[compact]] is the reclaimer. DVs only
      * GROW on a given file — shrinking would resurrect rows. */
    def dv: Map[String, Array[Long]] = metaValues("dv").flatMap { s =>
      s.split(":", 2) match {
        case Array(b64, rel) => Some(rel -> Dv.decode(b64))
        case _ => None
      }
    }.toMap
    /** SIDECAR deletion-vector references (format 2.2
      * `#dvf:<count>:<sidecar-rel>:<rel>` — vectors past
      * [[Dv.InlineMax]] live in one immutable varint file under
      * `dir/dv/`; the count rides in the line so [[rowCountAt]]
      * stays manifest-only): rel → (dead count, sidecar rel). */
    def dvRefs: Map[String, (Long, String)] = metaValues("dvf").flatMap { s =>
      s.split(":", 3) match {
        case Array(cnt, sc, rel) => Some(rel -> ((cnt.toLong, sc)))
        case _ => None
      }
    }.toMap
    /** Raw dv AND dvf lines (ONE carry surface — every kept-file carry
      * site filters these by [[Snapshots.dvRelOf]], so adding a line
      * family cannot silently skip a site). */
    def dvLines: Seq[String] = meta.filter(m =>
      m.startsWith("#dv:") || m.startsWith("#dvf:"))
      .map(_.stripPrefix("#"))
    /** Generic CARRIED table properties (`#prop:key=value` — the
      * Delta table-properties shape): set once at publish (via the
      * `meta` arg) or later with [[setProp]], and copied forward
      * verbatim by EVERY write path, so a policy rides on all future
      * versions until changed. The channel behind the auto-checkpoint
      * policy (`ckptevery`) and the Z-order layout descriptor
      * (`zlayout`). */
    def props: Map[String, String] = metaValues("prop").map { s =>
      val i = s.indexOf('=')
      require(i > 0, s"malformed #prop line (need key=value): $s")
      s.substring(0, i) -> s.substring(i + 1)
    }.toMap
    /** Raw prop lines for carrying forward. */
    def propLines: Seq[String] = meta.filter(_.startsWith("#prop:"))
      .map(_.stripPrefix("#"))
  }

  private[graft] def manifest(spark: SparkSession, dir: String,
                                  v: Long): Manifest = {
    val key = cacheKey(dir, v)
    val hit = manifestCache.get(key)
    if (hit != null) hit
    else {
      val (meta, files) = manifestLines(spark, dir, v).partition(_.startsWith("#"))
      val m = Manifest(files, meta)
      manifestCache.put(key, m)
      m
    }
  }

  /** The data files (paths relative to `dir`) version `v` reads. */
  def files(spark: SparkSession, dir: String, v: Long): Seq[String] =
    committedManifest(spark, dir, v).files

  /** The streaming batch ids already applied to this table (the
    * `#batch:` headers across all committed manifests) — the full
    * ledger, for inspection/audit. O(versions); the hot-path replay
    * check is [[lastAppliedBatch]]. */
  def appliedBatches(spark: SparkSession, dir: String): Set[Long] =
    versions(spark, dir).flatMap(v =>
      manifest(spark, dir, v).metaValues("batch").map(_.toLong)).toSet

  /** The HIGHEST applied batch id — found by scanning manifests
    * newest-first and stopping at the first committed batch header
    * (batch ids are monotone per streaming query, so the newest
    * header carries the max). This keeps [[mergeBatch]]'s per-batch
    * replay check at O(non-batch commits since the last batch), not
    * O(all versions) — a stream sinking thousands of batches would
    * otherwise pay a quadratic manifest re-scan over its life. */
  def lastAppliedBatch(spark: SparkSession, dir: String): Option[Long] =
    rawVersions(spark, dir).reverseIterator
      .map(v => manifest(spark, dir, v))
      .filter(isCommitted(spark, _))
      .map(_.metaValues("batch").headOption.map(_.toLong))
      .collectFirst { case Some(id) => id }

  /** The newest COMMITTED version carrying a `#batch:` header — the
    * version a retention vacuum must never drop: erasing every
    * batch-bearing manifest would make [[lastAppliedBatch]] return
    * None, and a streaming restart's re-delivered batch would then
    * RE-APPLY instead of being absorbed (the exactly-once claim
    * broken). [[maintainImpl]] clamps its vacuum floor to this. */
  private[operators] def newestBatchVersion(spark: SparkSession,
                                            dir: String): Option[Long] =
    rawVersions(spark, dir).reverseIterator.find { v =>
      val m = manifest(spark, dir, v)
      m.metaValues("batch").nonEmpty && isCommitted(spark, m)
    }

  /** The batch-LEDGER carry for a commit on top of `pm`: the previous
    * manifest's newest `#batch:` header, copied forward verbatim —
    * unless the new commit stamps its own batch id (`newMeta` already
    * carries one). Every non-batch commit path (compaction,
    * metadata-only commits, plain loads) carries this, the same way
    * `#prop` lines carry, so the exactly-once ledger SURVIVES
    * maintenance: without the carry, a `retainversions` vacuum on a
    * streaming-sink table could drop every batch-bearing manifest
    * while batch-less compact/setProp commits sit on top, and the
    * next restart's re-delivered batch would re-apply. O(1) — reads
    * only the prev manifest already in hand, and the carry chain
    * keeps the newest manifest batch-bearing forever after the first
    * batch. */
  private[operators] def carriedBatch(pm: Manifest,
                                      newMeta: Seq[String] = Nil): Seq[String] =
    if (newMeta.exists(_.startsWith("batch:"))) Nil
    else pm.metaValues("batch").headOption.map(id => s"batch:$id").toSeq

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
    // every commit stamps its WALL TIME (`#ts:<epochMicros>` — the
    // Delta/Iceberg commit-timestamp line behind TIMESTAMP AS OF);
    // per-version, never carried, so no commit site can forget it.
    // Writer-clock skew is handled at RESOLUTION (running max), not
    // here — rewriting history's timestamps would lie to the reader.
    val stamped =
      if (meta.exists(_.startsWith("ts:"))) meta
      else s"ts:${clockMicros(spark)}" +: meta
    // the atomic claim (pluggable — see CommitStore): throws if v is
    // taken, never leaves a partial or replaced manifest
    commitStore.createExclusive(f, p,
      ((stamped.map("#" + _) ++ relFiles).mkString("\n") + "\n").getBytes("UTF-8"))
    // keep the listing cache current: dense extension when this commit
    // is the next version, otherwise invalidate (re-list on next read)
    dirListCache.computeIfPresent(dir, (_, old) =>
      if (old.nonEmpty && old.last == v - 1) old :+ v else null)
    // PERIODIC CHECKPOINT POLICY (`prop:ckptevery=N`, carried): every
    // Nth version refreshes the committedness checkpoint as part of
    // the write itself — long-lived tables keep their cold-attach
    // cost at one file read WITHOUT anyone remembering to run
    // maintenance. Provisional transaction manifests never trigger it
    // (their fate is undecided; the txn's own commit cannot be
    // checkpointed from here anyway). A checkpoint failure must not
    // fail the WRITE — the commit is already durable; the checkpoint
    // is an optimization that the next policy hit retries.
    if (!meta.exists(_.startsWith("txn:")))
      meta.collectFirst {
        case m if m.startsWith("prop:ckptevery=") =>
          m.stripPrefix("prop:ckptevery=")
      }.flatMap(s => scala.util.Try(s.toLong).toOption) // malformed: ignore
        .filter(_ > 0).foreach { n =>
          if (v % n == 0)
            try checkpoint(spark, dir)
            catch { case scala.util.control.NonFatal(_) => () }
        }
  }

  /** Test seam for the commit clock (`spark.graft.testClockMicros` —
    * specs pin commit wall-times deterministically); production reads
    * the system clock. */
  val TestClockKey = "spark.graft.testClockMicros"

  private def clockMicros(spark: SparkSession): Long =
    spark.conf.getOption(TestClockKey).map(_.toLong)
      .getOrElse(System.currentTimeMillis() * 1000L)

  /** The RECORDED commit wall-time of version `v` (epoch micros), if
    * the manifest carries one — manifests written before the `#ts`
    * line predate it. Raw, unadjusted: see [[versionAtTimestamp]] for
    * the skew-safe resolution surface. */
  def commitTsAt(spark: SparkSession, dir: String, v: Long): Option[Long] =
    committedManifest(spark, dir, v).metaValues("ts").headOption.map(_.toLong)

  /** Resolve `TIMESTAMP AS OF`: the NEWEST committed version whose
    * commit time is ≤ `micros` — the Delta/Iceberg rule, including
    * the MONOTONICITY adjustment for writer-clock skew: a commit
    * stamped earlier than its predecessor resolves as predecessor+1µs
    * (recorded timestamps are never rewritten; only resolution
    * adjusts, so the answer is stable and history never reorders).
    * A version predating the `#ts` line inherits its predecessor's
    * adjusted time (it can never win over a later stamped version).
    * Before the first stamped commit refuses with the valid range;
    * after the latest resolves to the latest (the audit-read
    * convention: "as of yesterday 09:00" on a quiet table is the
    * current version). */
  def versionAtTimestamp(spark: SparkSession, dir: String,
                         micros: Long): Long = {
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"$dir has no snapshots")
    var running = Long.MinValue
    val adjusted = vs.map { v =>
      val raw = commitTsAt(spark, dir, v)
      running = raw match {
        case Some(t) if running == Long.MinValue => t
        case Some(t) => math.max(t, running + 1)
        case None if running == Long.MinValue => Long.MinValue
        case None => running + 1
      }
      v -> running
    }
    val stamped = adjusted.filter(_._2 != Long.MinValue)
    require(stamped.nonEmpty,
      s"$dir predates commit timestamps (no #ts lines) — " +
        "TIMESTAMP AS OF needs at least one stamped commit; " +
        "use VERSION AS OF")
    val hit = stamped.filter(_._2 <= micros)
    require(hit.nonEmpty,
      s"no version of $dir existed at timestamp $micros µs — the " +
        s"earliest stamped commit is version ${stamped.head._1} at " +
        s"${stamped.head._2} µs")
    hit.last._1
  }

  /** Table properties of version `v` (the carried `#prop` lines). */
  def propsAt(spark: SparkSession, dir: String, v: Long): Map[String, String] =
    committedManifest(spark, dir, v).props

  /** Set (or with `value = None` REMOVE) one carried table property —
    * a METADATA-ONLY commit: same files, same schema, same stats,
    * only the `#prop` set changes. O(manifest). Property keys and
    * values must be single-line and colon-free on the key side
    * (the manifest line grammar). */
  def setProp(spark: SparkSession, dir: String, key: String,
              value: Option[String]): Long =
    setProps(spark, dir, Seq(key -> value))

  /** Set/remove SEVERAL carried properties in ONE metadata-only
    * commit — the atomicity `ALTER TABLE ... SET TBLPROPERTIES('a'=…,
    * 'b'=…)` needs (per-key commits would half-apply a refused
    * statement and burn one version per key). EVERY change validates
    * BEFORE anything commits; `None` removes; the last occurrence of
    * a repeated key wins. */
  def setProps(spark: SparkSession, dir: String,
               changes: Seq[(String, Option[String])]): Long = {
    require(changes.nonEmpty, "setProps needs at least one change")
    changes.foreach { case (key, value) =>
      require(key.nonEmpty && !key.contains("=") && !key.contains("\n") &&
        !key.contains(":"), s"invalid property key '$key'")
      value.foreach(vv => require(!vv.contains("\n"),
        s"invalid property value for '$key' (must be single-line)"))
    }
    val effective = scala.collection.mutable.LinkedHashMap[String, Option[String]]()
    changes.foreach { case (k, vv) => effective.remove(k); effective.put(k, vv) }
    resolveForWrite(spark, dir)
    val prev = latest(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"$dir has no snapshots"))
    val pm = manifest(spark, dir, prev)
    // #batch deliberately carries (the exactly-once ledger must
    // survive metadata-only commits — see carriedBatch); #txn must not
    // (this commit is not that transaction's member)
    val keys = effective.keySet
    // #ts must not carry either: commit() stamps fresh only when no
    // ts line exists, so a carried predecessor stamp would give this
    // ALTER its predecessor's wall time (TIMESTAMP AS OF would then
    // resolve a version that did not exist at that time)
    val kept = pm.meta.filterNot(m => m.startsWith("#format:") ||
        keys.exists(k => m.startsWith(s"#prop:$k=")) || m.startsWith("#txn:") ||
        m.startsWith("#ts:"))
      .map(_.stripPrefix("#"))
    val v = claimAbove(spark, dir, prev)
    commit(spark, dir, v, pm.files,
      Seq("format:2") ++ kept ++ effective.toSeq.collect {
        case (k, Some(vv)) => s"prop:$k=$vv"
      })
    v
  }

  /** ADDITIVE/WIDENING schema evolution as ONE METADATA-ONLY commit
    * (the catalog's ALTER TABLE ADD COLUMNS / type-widen hook, and
    * what the analyzer's MERGE ... WITH SCHEMA EVOLUTION calls
    * through it): `adds` append nullable top-level columns — files
    * never rewrite, readers null-fill (the same additive contract
    * [[mergeSchemas]] gives appends) — and `widenTo` moves existing
    * columns up the lossless [[widens]] lattice (old files widen
    * natively under the explicit read schema, the q175 machinery).
    * Everything else about the version carries VERBATIM (same files,
    * stats, vectors, epochs, props, ledger — the setProps blacklist
    * discipline), with a fresh #ts. An added name may not collide
    * with any LOGICAL name or any colmap PHYSICAL name (a file's
    * stored column would leak into the "new" column instead of
    * null-filling). */
  def evolveSchema(spark: SparkSession, dir: String,
                   adds: Seq[org.apache.spark.sql.types.StructField],
                   widenTo: Seq[(String, org.apache.spark.sql.types.DataType)]
                     = Nil): Long = {
    require(adds.nonEmpty || widenTo.nonEmpty,
      "evolveSchema needs at least one change")
    resolveForWrite(spark, dir)
    val prev = latest(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"$dir has no snapshots"))
    val pm = manifest(spark, dir, prev)
    val base = pm.schemaOpt.getOrElse(throw new IllegalArgumentException(
      s"$dir predates manifest format 2 — schema evolution needs a " +
        "recorded schema"))
    val taken = base.fieldNames.toSet ++ pm.colMap.keySet
    adds.foreach(f => require(!taken.contains(f.name),
      s"cannot add column ${f.name}: the name is already a logical or " +
        "physical column of the table"))
    val widenMap = widenTo.toMap
    widenTo.foreach { case (c, t) =>
      require(base.fieldNames.contains(c),
        s"cannot widen unknown column $c")
      val from = base(c).dataType
      require(from == t || widens(from, t),
        s"schema evolution is ADDITIVE/WIDENING only: column $c cannot " +
          s"change type ${from.simpleString} -> ${t.simpleString}")
    }
    val ns = StructType(base.fields.map(f =>
      widenMap.get(f.name).fold(f)(t => f.copy(dataType = t))) ++
      adds.map(_.copy(nullable = true)))
    val kept = pm.meta.filterNot(m => m.startsWith("#format:") ||
        m.startsWith("#schema:") || m.startsWith("#txn:") ||
        m.startsWith("#ts:"))
      .map(_.stripPrefix("#"))
    val v = claimAbove(spark, dir, prev)
    commit(spark, dir, v, pm.files,
      Seq("format:2", s"schema:${nullable(ns).json}") ++ kept)
    v
  }

  /** A staged write's outcome: the new files plus the meta lines
    * (schema + per-file stats + byte sizes) the commit should carry. */
  private[graft] case class Staged(rels: Seq[String], schemaJson: String,
                            statLines: Seq[String],
                            stat2Lines: Seq[String] = Nil,
                            ndvLines: Seq[String] = Nil,
                            sizeLines: Seq[String] = Nil)

  private[operators] def nullable(s: StructType): StructType =
    StructType(s.fields.map(_.copy(nullable = true)))

  /** Lossless type-WIDENING lattice — exactly the promotions Spark's
    * parquet reader performs natively when the requested schema is
    * wider than a file's (probed on this distribution: int32 files
    * read as long/double, float as double, etc.), so a widened
    * manifest schema needs NO rewrite of old files. Long→double is
    * deliberately absent (lossy above 2^53). */
  private[operators] def widens(from: org.apache.spark.sql.types.DataType,
                                to: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    (from, to) match {
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType) => true
      case (IntegerType, LongType) => true
      case (FloatType, DoubleType) => true
      case (ByteType | ShortType | IntegerType, DoubleType) => true
      case _ => false
    }
  }

  /** Additive + WIDENING schema merge: columns only one side carries
    * are appended (files that predate a column null-fill it at
    * read); shared columns keep their type or widen losslessly in
    * either direction — the manifest records the WIDEST, and old
    * files widen natively under the explicit read schema. Anything
    * else (drops, narrows, incomparable changes) refuses. */
  private[operators] def mergeSchemas(base: StructType, add: StructType): StructType = {
    val addMap = add.fields.map(f => f.name -> f).toMap
    val merged = base.fields.map { bf =>
      addMap.get(bf.name) match {
        case Some(af) if af.dataType == bf.dataType => bf
        case Some(af) if widens(bf.dataType, af.dataType) =>
          bf.copy(dataType = af.dataType)
        case Some(af) if widens(af.dataType, bf.dataType) => bf
        case Some(af) =>
          throw new IllegalArgumentException(
            s"schema evolution is ADDITIVE/WIDENING only: column ${bf.name} " +
              s"cannot change type ${bf.dataType.simpleString} -> " +
              s"${af.dataType.simpleString}")
        case None => bf
      }
    }
    StructType(merged ++
      add.fields.filterNot(f => base.fieldNames.contains(f.name)))
  }

  /** Widening-aware MERGE alignment: both sides cast to the
    * per-column WIDEST type, target column order = the update
    * batch's. Dropping a target column refuses; incomparable type
    * changes refuse. */
  private[operators] def mergeAlign(existing: DataFrame,
                                    updates: DataFrame): (DataFrame, DataFrame) = {
    val dropped = existing.columns.toSet -- updates.columns.toSet
    require(dropped.isEmpty,
      s"merge: updates drop target columns ${dropped.toSeq.sorted.mkString(",")} " +
        "— additive evolution only (add columns, never remove)")
    val target = updates.columns.map { c =>
      val u = updates.schema(c).dataType
      val t =
        if (!existing.columns.contains(c)) u
        else {
          val e = existing.schema(c).dataType
          if (e == u || widens(e, u)) u
          else if (widens(u, e)) e
          else throw new IllegalArgumentException(
            s"merge: column $c cannot change type ${e.simpleString} -> " +
              s"${u.simpleString} (additive/widening evolution only)")
        }
      c -> t
    }
    val ex = existing.select(target.map { case (c, t) =>
      (if (existing.columns.contains(c)) col(c) else lit(null)).cast(t).as(c)
    }: _*)
    val up = updates.select(target.map { case (c, t) =>
      col(c).cast(t).as(c)
    }: _*)
    (ex, up)
  }

  /** Stage one bucket-partitioned, key-sorted load under a fresh
    * token dir and return the staged files relative to `dir`, plus
    * the meta (schema json + per-file key stats) for the commit.
    * Nothing is visible until a manifest referencing them commits.
    * The bucket value is DUPLICATED into the `__bdir` directory
    * column, so the data files carry the full logical schema —
    * readers never need partition discovery.
    *
    * Stats are footer-walked over ONLY the files this stage just
    * wrote (cost ∝ this commit's churn, incremental by
    * construction); non-INT64 sort keys simply record no stats and
    * [[versionStats]] falls back to the verification walk. */
  /** Serializes the [[stage]] `outputTimestampType` set/restore window
    * (see there) — staging writes to DIFFERENT tables still overlap
    * in every phase except the parquet write itself. */
  private val stageTsLock = new Object

  private[operators] def stage(df: DataFrame, dir: String, bucketCol: String,
                    sortCols: Seq[String], blockSize: Long,
                    numTasks: Int, stat2Cols: Seq[String] = Nil,
                    ndvCols: Seq[String] = Nil): Staged = {
    require(!df.columns.contains(DirCol),
      s"column name $DirCol is reserved for the staging layout")
    require(sortCols.nonEmpty, "snapshot writes need the layout sort columns")
    val token = java.util.UUID.randomUUID().toString.take(8)
    val stageDir = s"$dir/data/$token"
    // TimestampType columns must land as INT64 TIMESTAMP(MICROS), not
    // Spark's legacy INT96 default: INT96 is deprecated and parquet
    // writes NO column statistics for it, which would make every
    // with-zone timestamp invisible to the manifest's typed stats —
    // no #stat2 lines, no data skipping, no box pruning (NTZ columns
    // already land as INT64). Session-conf only (parquet exposes no
    // per-write option), so set/restore around the one staging write —
    // SERIALIZED on a JVM-global lock: two concurrent stage() calls
    // would otherwise race the restore (one writer reinstating INT96
    // before the other's write executes — silently statistics-free
    // timestamps for that commit). Only frames that actually carry a
    // with-zone TimestampType take the lock — for everything else the
    // conf is irrelevant (NTZ lands INT64 regardless) and concurrent
    // staging writes proceed unserialized. A concurrent NON-graft parquet
    // write during the window inherits TIMESTAMP_MICROS, which is the
    // value everything downstream wants anyway (and what Spark's own
    // migration guide recommends); a user's own concurrent set of
    // this key can still be clobbered by the restore — documented
    // limitation of a session-global conf.
    val tsKey = "spark.sql.parquet.outputTimestampType"
    def hasTz(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case org.apache.spark.sql.types.TimestampType => true
      case s: StructType => s.fields.exists(f => hasTz(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hasTz(a.elementType)
      case m: org.apache.spark.sql.types.MapType =>
        hasTz(m.keyType) || hasTz(m.valueType)
      case _ => false
    }
    def writeStaged(): Unit = df.withColumn(DirCol, col(bucketCol))
      .repartition(numTasks, col(bucketCol))
      // DirCol leads the local sort: FileFormatWriter requires its
      // partition column ordered and cannot see that DirCol aliases
      // bucketCol — without the prefix it would inject its own
      // NON-STABLE sort by DirCol alone, destroying the key order
      // inside each file (caught by the merged-file-sorted spec)
      .sortWithinPartitions(
        col(DirCol) +: col(bucketCol) +: sortCols.map(col): _*)
      .write.mode("errorifexists")
      .option("parquet.block.size", blockSize)
      .partitionBy(DirCol)
      .parquet(stageDir)
    graft.Prof(s"stage.write $dir") {
      if (!df.schema.fields.exists(f => hasTz(f.dataType))) writeStaged()
      else stageTsLock.synchronized {
        val tsPrev = df.sparkSession.conf.getOption(tsKey)
        df.sparkSession.conf.set(tsKey, "TIMESTAMP_MICROS")
        try writeStaged()
        finally tsPrev match {
          case Some(v) => df.sparkSession.conf.set(tsKey, v)
          case None => df.sparkSession.conf.unset(tsKey)
        }
      }
    }
    val f = fs(df.sparkSession, dir)
    def walk(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] =
      f.listStatus(p).toSeq.flatMap { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (st.getPath.getName.endsWith(".parquet")) Seq(st)
        else Seq.empty
      }
    val walked = walk(new org.apache.hadoop.fs.Path(stageDir))
    def relOf(p: org.apache.hadoop.fs.Path): String =
      s"data/$token/" + p.toString.split(s"/data/$token/").last
    val staged = walked.map(st => relOf(st.getPath))
    // per-file BYTE sizes, from the listing this walk already did
    // (Iceberg's file_size_in_bytes discipline): size-based planning —
    // broadcast-vs-shuffle decisions, compaction targeting — reads the
    // MANIFEST, never the filesystem
    val sizeLines = walked.map(st => s"fsize:${st.getLen}:${relOf(st.getPath)}")
    // a zero-file stage would commit a manifest no reader can resolve
    // a schema from — almost certainly an empty input upstream; fail
    // loudly rather than poison the version history
    require(staged.nonEmpty,
      s"stage produced no data files under $stageDir — refusing to " +
        "commit an unreadable version (empty input?)")
    val keyCol = sortCols.head
    // ALL manifest statistics from ONE footer walk (guide §6: footer
    // I/O is priced per open — the key-stat walk and the typed-stat
    // walk each opened every staged file, doubling the metadata round
    // trips per commit; now one open per file emits the `stat:` key
    // lines, the per-file `stat2:` typed lines AND the per-row-group
    // `stat3:` detail). Contracts unchanged: key stats stay
    // ALL-OR-NOTHING across the staged set (a partial set would hide
    // unlisted files from pruning), typed stats stay per-(file,
    // column) conservative, any walk failure records nothing.
    val keyOk = df.schema.fieldNames.contains(keyCol) &&
      df.schema(keyCol).dataType == LongType
    val typedCols = stat2Cols.filter(c => !c.contains(":"))
    val (statLines, stat2, stat3): (Seq[String], Seq[String], Seq[String]) =
      graft.Prof(s"stage.stats $dir") {
        if (!keyOk && typedCols.isEmpty) (Seq.empty, Seq.empty, Seq.empty)
        else scala.util.Try {
          val (keyTry, fileStats, rgStats) = Layout.statsWithKey(
            df.sparkSession, staged.map(r => s"$dir/$r"),
            if (keyOk) Some(keyCol) else None, typedCols)
          (keyTry.map(_.groupBy(_.path).toSeq.map { case (p, gs) =>
              val rel = p.stripPrefix(s"$dir/")
              s"stat:$keyCol:${gs.map(_.rowCount).sum}:" +
                s"${gs.map(_.min).min}:${gs.map(_.max).max}:$rel"
            }).getOrElse(Seq.empty),
           fileStats.map(ts => s"stat2:${ts.column}:${ts.kind}:${ts.rows}:" +
             s"${ts.min}:${ts.max}:${ts.path.stripPrefix(s"$dir/")}"),
           rgStats.map(rg => s"stat3:${rg.column}:${rg.kind}:${rg.start}:" +
             s"${rg.len}:${rg.rows}:${rg.min}:${rg.max}:" +
             rg.path.stripPrefix(s"$dir/")))
        }.getOrElse((Seq.empty, Seq.empty, Seq.empty))
      }
    // KMV NDV sketches for the DECLARED ndv columns: one distinct +
    // windowed-top-k pass over ONLY this commit's new files
    val ndvL: Seq[String] = graft.Prof(s"stage.ndv $dir") {
      if (ndvCols.isEmpty) Seq.empty
      else {
        val back = df.sparkSession.read.parquet(staged.map(r => s"$dir/$r"): _*)
        val cols = ndvCols.filter(c =>
          back.columns.contains(c) && !c.contains(":"))
        if (cols.isEmpty) Seq.empty
        else {
          // ONE pass sketches every declared column (guide §1.2) —
          // hashes per (file, column) bit-identical to the per-column
          // walk this replaced
          val sk = Ndv.fileSketchesMulti(back, cols)
          cols.flatMap { c =>
            sk.toSeq.collect { case ((cc, fname), s) if cc == c =>
              val rel = staged.find(r => fname.endsWith(r)).getOrElse(
                throw new IllegalStateException(
                  s"ndv sketch for unknown staged file $fname"))
              s"ndv:$c:${Ndv.encode(s)}:$rel"
            }
          }
        }
      }
    }
    Staged(staged, nullable(df.schema).json, statLines, stat2 ++ stat3,
      ndvL, sizeLines)
  }

  /** Claim the next version number for a write PLANNED against
    * version `basedOn` — the optimistic-concurrency check every
    * writer must pass. The claim may sit above `basedOn` only across
    * ABORTED-transaction tombstones (their manifests hold version
    * numbers but no state); if any raw version in `(basedOn, top]`
    * is committed or still in flight, a concurrent writer advanced
    * the table after this write read its base, and committing above
    * it would silently drop the racer's rows from the table head (a
    * lost update) — so this throws and the caller re-reads latest
    * and retries. The create-exclusive manifest write remains the
    * backstop for two writers that both pass this check and race the
    * same number. */
  private[graft] def claimAbove(spark: SparkSession, dir: String,
                                basedOn: Long): Long = {
    val above = rawVersions(spark, dir).filter(_ > basedOn)
    above.foreach { rv =>
      val aborted = manifest(spark, dir, rv).metaValues("txn").headOption
        .exists(rec => txnState(spark, rec).contains(false))
      if (!aborted)
        throw new java.util.ConcurrentModificationException(
          s"snapshot write to $dir was planned against version $basedOn, " +
            s"but version $rv was committed (or is in flight) by a " +
            "concurrent writer — committing above it would drop the " +
            "racer's rows from the table head; re-read latest and retry")
    }
    above.lastOption.getOrElse(basedOn) + 1
  }

  /** Resolve an UNDECIDED transactional manifest sitting at the raw
    * top before claiming above it: force-abort it by winning its
    * create-exclusive record with `abort`. This is the liveness
    * valve — a crashed transaction can never write-lock its tables —
    * and the serializability guard: a writer never bases a commit on
    * a version whose fate is still open (either the force-abort wins
    * and the txn's own commit() throws, or the txn committed first
    * and [[latest]] sees it). Callers coordinating transactions
    * should not run plain writers against member tables mid-txn:
    * the plain writer WILL abort them. */
  private[operators] def resolveForWrite(spark: SparkSession, dir: String): Unit =
    rawVersions(spark, dir).lastOption.foreach { rv =>
      manifest(spark, dir, rv).metaValues("txn").headOption.foreach { rec =>
        if (txnState(spark, rec).isEmpty) writeTxnRecord(spark, rec, commit = false)
      }
    }

  /** Try to win a transaction record create-exclusively; returns
    * whether THIS call decided it. Only the contract's loser signal
    * ([[org.apache.hadoop.fs.FileAlreadyExistsException]] — see
    * [[CommitStore]]) means "someone else decided"; any other
    * IOException is a real store failure and propagates. */
  private def writeTxnRecord(spark: SparkSession, rec: String,
                             commit: Boolean): Boolean = {
    val p = new org.apache.hadoop.fs.Path(rec)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (p.getParent != null) f.mkdirs(p.getParent)
    try {
      commitStore.createExclusive(f, p,
        (if (commit) "commit\n" else "abort\n").getBytes("UTF-8"))
      txnCache.put(rec, java.lang.Boolean.valueOf(commit))
      true
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
    }
  }

  /** Publish the FIRST version of a snapshot table. `meta` lines ride
    * in the manifest like [[merge]]'s — in particular a streaming
    * bootstrap passes `batch:<id>` so the FIRST batch enters the
    * exactly-once ledger too (a replayed bootstrap batch is then
    * absorbed by [[mergeBatch]]'s high-water check instead of
    * re-merging its rows). */
  def publish(df: DataFrame, dir: String, bucketCol: String,
              sortCols: Seq[String], blockSize: Long = 128L * 1024 * 1024,
              numTasks: Int = 32, meta: Seq[String] = Nil,
              statsCols: Seq[String] = Nil,
              ndvCols: Seq[String] = Nil): Long =
    publishImpl(df, dir, bucketCol, sortCols, blockSize, numTasks, meta,
      statsCols, ndvCols)

  private def publishImpl(df: DataFrame, dir: String, bucketCol: String,
                          sortCols: Seq[String], blockSize: Long,
                          numTasks: Int, extraMeta: Seq[String],
                          statsCols: Seq[String] = Nil,
                          ndvCols: Seq[String] = Nil): Long = {
    val spark = df.sparkSession
    resolveForWrite(spark, dir)
    require(latest(spark, dir).isEmpty,
      s"$dir already has snapshots — use append")
    require((statsCols ++ ndvCols).forall(c => c.nonEmpty && !c.contains(":") &&
      !c.contains(",") && df.columns.contains(c)),
      s"stats/ndv columns must be existing plain-named columns: " +
        s"$statsCols / $ndvCols")
    val st = stage(df, dir, bucketCol, sortCols, blockSize, numTasks,
      stat2Cols = statsCols, ndvCols = ndvCols)
    // planned against "no committed state": anything committed during
    // staging is a conflict (claimAbove tolerates only tombstones)
    val v = claimAbove(spark, dir, 0L)
    val scLine =
      if (statsCols.isEmpty) Nil
      else Seq(s"statcols:${statsCols.mkString(",")}")
    val ncLine =
      if (ndvCols.isEmpty) Nil
      else Seq(s"ndvcols:${ndvCols.mkString(",")}")
    commit(spark, dir, v, st.rels,
      extraMeta ++ Seq("format:2", s"schema:${st.schemaJson}") ++ scLine ++
        ncLine ++ st.statLines ++ st.stat2Lines ++ st.ndvLines ++ st.sizeLines)
    v
  }

  /** Commit an incremental load: next version = previous files + the
    * newly staged ones (one new file per touched bucket). The new
    * manifest's schema is the ADDITIVE merge of the table's and the
    * batch's; kept files carry their stats forward unwalked. */
  def append(df: DataFrame, dir: String, bucketCol: String,
             sortCols: Seq[String], blockSize: Long = 128L * 1024 * 1024,
             numTasks: Int = 32): Long =
    appendImpl(df, dir, bucketCol, sortCols, blockSize, numTasks, Nil)

  /** Swap a frame's columns logical → PHYSICAL for staging (renamed
    * columns write under their birth names so every file in the
    * table agrees — see [[rename]]). */
  private[operators] def toPhysicalDf(df: DataFrame, toPhys: Map[String, String]): DataFrame =
    if (toPhys.isEmpty) df
    else df.select(df.columns.map(c => col(c).as(toPhys.getOrElse(c, c))): _*)

  /** The SHARED incremental-write prologue ([[append]] and
    * [[overwrite]] differ only in the committed file list and the
    * carried per-file lines): resolve, stage under physical names
    * with the table's declared stats/ndv columns, merge the schema
    * additively, claim the next version. */
  private def stagedIncremental(df: DataFrame, dir: String,
      bucketCol: String, sortCols: Seq[String], blockSize: Long,
      numTasks: Int): (Manifest, Staged, String, Long) = {
    val spark = df.sparkSession
    resolveForWrite(spark, dir)
    val prev = latest(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"$dir has no snapshots — use publish"))
    val pm = manifest(spark, dir, prev)
    val tp = pm.toPhysical
    val st = stage(toPhysicalDf(df, tp), dir,
      tp.getOrElse(bucketCol, bucketCol),
      sortCols.map(c => tp.getOrElse(c, c)), blockSize, numTasks,
      stat2Cols = pm.statCols, ndvCols = pm.ndvCols)
    val schema = pm.schemaOpt match {
      case Some(ps) => mergeSchemas(ps, nullable(df.schema)).json
      case None => st.schemaJson
    }
    (pm, st, schema, claimAbove(spark, dir, prev))
  }

  private def appendImpl(df: DataFrame, dir: String, bucketCol: String,
                         sortCols: Seq[String], blockSize: Long,
                         numTasks: Int, extraMeta: Seq[String]): Long = {
    val spark = df.sparkSession
    val (pm, st, schema, v) =
      stagedIncremental(df, dir, bucketCol, sortCols, blockSize, numTasks)
    commit(spark, dir, v, pm.files ++ st.rels,
      extraMeta ++ Seq("format:2", s"schema:$schema") ++
        carriedBatch(pm, extraMeta) ++ pm.propLines ++
        pm.colmapLines ++
        pm.statColsLines ++ pm.ndvColsLines ++ pm.statLines ++ st.statLines ++
        pm.stat2Lines ++ st.stat2Lines ++ pm.ndvLines ++ st.ndvLines ++
        pm.fsizeLines ++ st.sizeLines ++ pm.dvLines)
    v
  }

  /** REPLACE the table head's content in one commit (SQL `INSERT
    * OVERWRITE` / `df.writeTo(...).overwrite(lit(true))` land here
    * through the catalog): the new version references ONLY the newly
    * staged files — previous versions keep reading their own state
    * (time travel across an overwrite works) and [[vacuum]] reclaims
    * the dropped files once retention passes them. Carried metadata
    * follows the drop: props, colmap, stats/ndv DECLARATIONS and the
    * batch-ledger header carry; per-file stats/sizes/vectors do NOT
    * (they describe files this version no longer references). Schema
    * stays additive like [[append]] — an overwrite may add/widen
    * columns, never drop them (the read surface of a table must not
    * shrink behind a reader's back; rebuild under a new dir for a
    * breaking change).
    *
    * FLAT tables only — same refusal as the SQL path
    * ([[NamedTables.overwriteInto]]): an overwrite of a z/hash/width
    * table writes files with NO layout epoch lines, silently
    * de-clustering it (z keeps its `zlayout` prop but every new file
    * lands on the conservative unknown-epoch path). Re-publishing
    * through the layout's own APIs is the supported move. */
  def overwrite(df: DataFrame, dir: String, bucketCol: String,
                sortCols: Seq[String], blockSize: Long = 128L * 1024 * 1024,
                numTasks: Int = 32): Long = {
    val spark = df.sparkSession
    latest(spark, dir).foreach { cur =>
      val layout = NamedTables.layoutAt(spark, dir, cur)
      require(layout == "flat",
        s"overwrite is not supported on a $layout-layout table ($dir) " +
          "— overwriting a clustered table is a re-publish decision; " +
          "use the layout's own publish APIs")
    }
    val (pm, st, schema, v) =
      stagedIncremental(df, dir, bucketCol, sortCols, blockSize, numTasks)
    commit(spark, dir, v, st.rels,
      Seq("format:2", s"schema:$schema") ++ carriedBatch(pm) ++
        pm.propLines ++ pm.colmapLines ++
        pm.statColsLines ++ pm.ndvColsLines ++
        st.statLines ++ st.stat2Lines ++ st.ndvLines ++ st.sizeLines)
    v
  }

  /** Read a set of manifest-relative files. With a recorded schema
    * (format 2) this is ONE relation over a MANIFEST-BACKED
    * [[org.apache.spark.sql.graftext.ManifestFileIndex]] (the public
    * Delta-Lake shape: the log's file list + recorded `#fsize` byte
    * lengths become the FileIndex inside a HadoopFsRelation):
    *  - plan size flat in commit count, no partition discovery (the
    *    bucket is a data column), files that predate a column
    *    null-fill natively (additive evolution);
    *  - ZERO filesystem calls at planning — the stock path's
    *    InMemoryFileIndex `getFileStatus`es every file per query, a
    *    million metadata ops at a million files (`sizes` misses fall
    *    back to one stat each — legacy manifests only);
    *  - the relation reports the manifest byte sum as `sizeInBytes`,
    *    so Spark's OWN optimizer sees real table statistics: a plain
    *    `read(fact).join(smallDim)` broadcasts under the session's
    *    `autoBroadcastJoinThreshold` (× its documented
    *    `fileCompressionFactor`) with no JoinPlanner call;
    *  - `pruner` (when a manifest's typed stats back it) drops whole
    *    files at PLANNING time from pushed-down range predicates —
    *    data skipping on every plain `.filter`, not just the explicit
    *    prunedScan APIs.
    * Everything downstream is the stock V1 parquet path (vectorized
    * reader, pushdown, codegen). `colMap` (physical → logical,
    * format 2.1) handles RENAMED columns: the relation reads under
    * the files' PHYSICAL names and ONE projection restores the
    * logical surface — still a single scan. Without a recorded schema
    * (legacy manifests written via raw [[commit]]), falls back to the
    * per-token basePath union that recovers directory-partition
    * columns. */
  /** A file-pruning hook for [[readFiles]]: pushed-down data filters
    * in, `Some(surviving manifest-relative files)` out (None = no
    * claim, read everything). [[statsPruner]] builds one from a
    * manifest's typed stats. */
  private[operators] type FilePruner =
    Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
      Option[Set[String]]
  private[operators] val NoPrune: FilePruner = _ => None

  /** The manifest-relative path of the file a row came from, derived
    * from `_metadata.file_path` by stripping the table's QUALIFIED
    * directory prefix — the metadata value is the same qualified URI
    * the [[graftext.ManifestFileIndex]] statuses were built from
    * (`makeQualified(dir + "/" + rel)`), so dropping `qualDir + "/"`
    * is exact. NOT derived by splitting on the "/data/" substring:
    * a table directory whose own last segment is named "data"
    * (e.g. /warehouse/tbl/data) would split to "data/data/<token>/…"
    * — rel paths no manifest carries, so DV lines would record
    * against ghost files and readFiles' rel filter would silently
    * drop them (erased rows resurrecting on every read). */
  private def relPathCol(qualDir: String): org.apache.spark.sql.Column =
    col("_metadata.file_path").substr(lit(qualDir.length + 2), lit(Int.MaxValue))

  /** Internal row-position columns ([[readFiles]] `withPos`):
    * manifest-relative source file and within-file row index — what a
    * deletion vector addresses. */
  private[operators] val FileCol = "__gfile"
  private[operators] val PosCol = "__gpos"

  /** Conf key bounding how many TOTAL dead positions a read will
    * materialize on the driver as the anti-join's pairs side: past it,
    * `#dvf` SIDECAR vectors are read DISTRIBUTED (one task per
    * immutable sidecar file via the binaryFile source) instead of
    * decoded into a driver LocalRelation — a table carrying deep
    * uncompacted merge-on-read debt across many files would otherwise
    * put gigabytes of (file, position) pairs on the driver and
    * re-serialize them into EVERY query's plan. Inline `#dv` vectors
    * (≤ [[Dv.InlineMax]] positions each) always stay driver-side —
    * the manifest parse already holds them. */
  val DvDistributeThresholdKey = "spark.graft.dv.distributeThreshold"

  private def dvDistributeThreshold(spark: SparkSession): Long =
    spark.conf.getOption(DvDistributeThresholdKey).map(_.toLong)
      .getOrElse(1000000L)

  /** Conf key: candidate-scan byte sum (off the manifest's `#fsize`
    * lines — free at planning) above which a vectored delete PERSISTS
    * its hits frame across the refusal guard and the collect. The
    * persist buys the single-scan property — one read of the
    * candidate files however wide the erasure — which matters when
    * the candidates are tens of GB; below the threshold a re-scan is
    * cheaper than materializing the cache (measured: ~+2 s per delete
    * at gate scale, pure overhead). */
  val DvPersistHitsBytesKey = "spark.graft.dv.persistHitsBytes"

  private def dvPersistHitsBytes(spark: SparkSession): Long =
    spark.conf.getOption(DvPersistHitsBytesKey).map(_.toLong)
      .getOrElse(256L * 1024 * 1024)

  /** Conf key: TOTAL matched positions above which a vectored-delete
    * COMMIT encodes vectors (and writes sidecars) FROM TASKS instead
    * of collecting every (file, position) pair onto the driver. The
    * per-file budget ([[Dv.MaxInlinePositions]]) bounds each file's
    * vector but not their SUM — a scattered 100M-key erasure over a
    * 100 TB table passes every per-file check and would otherwise
    * materialize 100M pairs driver-side before encoding. Past this
    * threshold the driver receives one (rel, count, payload) row per
    * touched file — exactly what the manifest will carry anyway. The
    * write-side mirror of [[DvDistributeThresholdKey]]. */
  val DvWriteDistributeThresholdKey = "spark.graft.dv.writeDistributeThreshold"

  private def dvWriteDistributeThreshold(spark: SparkSession): Long =
    spark.conf.getOption(DvWriteDistributeThresholdKey).map(_.toLong)
      .getOrElse(1000000L)

  private[operators] def readFiles(spark: SparkSession, dir: String,
                        rels: Seq[String],
                        schema: Option[StructType],
                        colMap: Map[String, String] = Map.empty,
                        sizes: Map[String, Long] = Map.empty,
                        pruner: FilePruner = NoPrune,
                        dv: Map[String, Array[Long]] = Map.empty,
                        withPos: Boolean = false,
                        dvRefs: Map[String, (Long, String)] = Map.empty)
      : DataFrame =
    schema match {
    case Some(s) =>
      val f = fs(spark, dir)
      val qual = rels.map(r =>
        r -> f.makeQualified(new org.apache.hadoop.fs.Path(s"$dir/$r")))
      val files = qual.map { case (r, p) =>
        p -> sizes.getOrElse(r, f.getFileStatus(p).getLen)
      }
      val toPhys = colMap.map(_.swap)
      val physSchema =
        if (colMap.isEmpty) s
        else StructType(s.fields.map(fd =>
          fd.copy(name = toPhys.getOrElse(fd.name, fd.name))))
      val qualOf = qual.toMap
      val qualDir = f.makeQualified(new org.apache.hadoop.fs.Path(dir))
      val base = org.apache.spark.sql.graftext.ManifestFileIndex.relation(
        spark, qualDir, files,
        physSchema,
        filters => pruner(filters).map(_.map(r => qualOf(r).toString)))
      // DELETION VECTORS: a file with recorded dead positions reads
      // through one anti-join on (file, position) — rewrites of those
      // files therefore materialize the DV for free, and a DV-less
      // read pays nothing (the common case: no extra columns, no
      // join, same single codegen'd scan)
      val relsSet = rels.toSet
      val liveDv = dv.filter { case (r, ps) =>
        ps.nonEmpty && relsSet.contains(r)
      }
      val liveRefs = dvRefs.filter { case (r, (c, _)) =>
        c > 0 && relsSet.contains(r) && !liveDv.contains(r)
      }
      val anyDv = liveDv.nonEmpty || liveRefs.nonEmpty
      val posed =
        if (!anyDv && !withPos) base
        else base.withColumn(FileCol, relPathCol(qualDir.toString))
          .withColumn(PosCol, col("_metadata.row_index"))
      val filtered =
        if (!anyDv) posed
        else {
          import spark.implicits._
          val total = liveDv.valuesIterator.map(_.length.toLong).sum +
            liveRefs.valuesIterator.map(_._1).sum
          def localPairs(m: Map[String, Array[Long]]): DataFrame =
            m.toSeq.flatMap { case (r, ps) => ps.map(p => (r, p)) }
              .toDF(FileCol, PosCol)
          // broadcast while the dead set is broadcast-SIZED (~1M
          // (path, pos) pairs ≈ tens of MB built, sidecars decoded
          // once through the immutable cache); a table carrying more
          // dead positions (deep merge-on-read debt compact has not
          // reclaimed) reads its SIDECAR vectors DISTRIBUTED — one
          // task per immutable sidecar file, never a driver
          // LocalRelation — and anti-joins through the shuffle
          // instead of pinning a giant hash relation on every
          // executor (see [[DvDistributeThresholdKey]])
          val dead =
            if (total <= dvDistributeThreshold(spark))
              broadcast(localPairs(liveDv ++ liveRefs.map {
                case (r, (_, sc)) => r -> readSidecar(spark, dir, sc)
              }))
            else if (liveRefs.isEmpty) localPairs(liveDv)
            else {
              val byPath = liveRefs.map { case (r, (_, sc)) =>
                f.makeQualified(
                  new org.apache.hadoop.fs.Path(s"$dir/$sc")).toString -> r
              }
              val relOfPath = udf((p: String) => byPath.getOrElse(p,
                throw new IllegalStateException(
                  s"dv sidecar scan returned an unexpected path: $p")))
              val decodePositions = udf((b: Array[Byte]) => Dv.decodeBytes(b))
              val sidecarPairs = spark.read.format("binaryFile")
                .load(byPath.keys.toSeq.sorted: _*)
                .select(relOfPath(col("path")).as(FileCol),
                  explode(decodePositions(col("content"))).as(PosCol))
              if (liveDv.isEmpty) sidecarPairs
              else sidecarPairs.unionByName(localPairs(liveDv))
            }
          posed.join(dead, Seq(FileCol, PosCol), "left_anti")
        }
      val surface = s.fields.map(fd =>
        col(toPhys.getOrElse(fd.name, fd.name)).as(fd.name)) ++
        (if (withPos) Seq(col(FileCol), col(PosCol)) else Nil)
      if (colMap.isEmpty && !anyDv && !withPos) base
      else filtered.select(surface: _*)
    case None =>
      val byToken = rels.groupBy(_.split("/")(1))
      byToken.toSeq.sortBy(_._1).map { case (token, fls) =>
        spark.read.option("basePath", s"$dir/data/$token")
          .parquet(fls.map(f => s"$dir/$f"): _*)
      }.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Bucket value encoded in a manifest-relative file path (the
    * `__bdir=N` staging directory; legacy manifests used the bucket
    * column's own name). */
  private def bucketOf(bucketCol: String)(rel: String): Long =
    fileBucket(rel).getOrElse(throw new IllegalArgumentException(
      s"data file outside a bucket directory: $rel"))

  /** The bucket a manifest-relative data file belongs to, parsed
    * from its staging directory — the public path-inspection helper
    * gates and specs use. */
  def fileBucket(rel: String): Option[Long] =
    rel.split("/").find(_.contains("=")).flatMap { seg =>
      scala.util.Try(seg.substring(seg.indexOf('=') + 1).toLong).toOption
    }

  /** Build a [[FilePruner]] from a manifest's recorded per-file stats
    * (`#stat2` typed lines for the declared stats columns, plus the
    * layout key's own `#stat` lines): pushed-down comparison
    * predicates on those columns drop whole files at PLANNING time —
    * Delta-style data skipping for every plain `.filter` on a
    * snapshot read, not just the explicit prunedScan APIs. Strictly
    * CONSERVATIVE: only bare `attr <op> literal` conjuncts prune
    * (casts, expressions, unknown shapes make no claim), a file
    * without a recorded stat for the column survives, and null rows
    * cannot match a comparison anyway so min/max exclusion is sound.
    * The residual filter still runs — pruning never changes answers,
    * only I/O. Attribute names here are PHYSICAL (the relation reads
    * under physical names; stats are stored physical-keyed —
    * rename-proof on both sides). */
  private[operators] def statsPruner(m: Manifest): FilePruner = {
    val statKeyCols = m.metaValues("stat").flatMap(_.split(":", 2).headOption)
      .distinct
    val availCols = (m.statCols ++ statKeyCols).toSet
    if (availCols.isEmpty) NoPrune
    else filters => {
      import org.apache.spark.sql.catalyst.expressions._
      // survives(kind, minEnc, maxEnc)
      type Test = (String, String, String) => Boolean
      def longTest(mode: Char, v: Long): Test = (kind, mn, mx) =>
        kind != "i" || (mode match {
          case '=' => mn.toLong <= v && v <= mx.toLong
          case '>' => mx.toLong > v
          case 'g' => mx.toLong >= v
          case '<' => mn.toLong < v
          case _ => mn.toLong <= v // 'l'
        })
      def dblTest(mode: Char, v: Double): Test = (kind, mn, mx) =>
        kind != "d" || (mode match {
          case '=' => mn.toDouble <= v && v <= mx.toDouble
          case '>' => mx.toDouble > v
          case 'g' => mx.toDouble >= v
          case '<' => mn.toDouble < v
          case _ => mn.toDouble <= v
        })
      def strTest(mode: Char, v: Array[Byte]): Test = (kind, mn, mx) =>
        kind != "s" || {
          val dec = java.util.Base64.getDecoder
          lazy val lo = dec.decode(mn)
          lazy val hi = dec.decode(mx)
          mode match {
            case '=' => !Layout.bytesLt(v, lo) && !Layout.bytesLt(hi, v)
            case '>' => Layout.bytesLt(v, hi) // max > v
            case 'g' => !Layout.bytesLt(hi, v) // max >= v
            case '<' => Layout.bytesLt(lo, v) // min < v
            case _ => !Layout.bytesLt(v, lo) // min <= v
          }
        }
      def litTest(mode: Char, l: Literal): Option[Test] = l.value match {
        case null => None
        case i: java.lang.Integer => Some(longTest(mode, i.longValue))
        case j: java.lang.Long => Some(longTest(mode, j.longValue))
        case sh: java.lang.Short => Some(longTest(mode, sh.longValue))
        case b: java.lang.Byte => Some(longTest(mode, b.longValue))
        case d: java.lang.Double => Some(dblTest(mode, d.doubleValue))
        case fl: java.lang.Float => Some(dblTest(mode, fl.doubleValue))
        case u: org.apache.spark.unsafe.types.UTF8String =>
          Some(strTest(mode, u.getBytes))
        case _ => None
      }
      def attrOf(e: Expression): Option[String] = e match {
        case a: AttributeReference if availCols.contains(a.name) => Some(a.name)
        case _ => None
      }
      def mk(a: Expression, mode: Char, l: Literal): Option[(String, Test)] =
        for (c <- attrOf(a); t <- litTest(mode, l)) yield (c, t)
      // a file survives an IN list iff ANY member's point-test survives
      def anyOf(tests: Seq[Test]): Test = (kind, mn, mx) =>
        tests.exists(_(kind, mn, mx))
      // strings starting with prefix p live in [p, succ(p)): succ
      // increments the last non-0xFF byte (all-0xFF → unbounded above)
      def startsWithTest(p: Array[Byte]): Test = {
        val succ: Option[Array[Byte]] = {
          val b = p.clone()
          var i = b.length - 1
          while (i >= 0 && b(i) == -1) { b(i) = 0; i -= 1 }
          if (i < 0) None else { b(i) = (b(i) + 1).toByte; Some(b.take(i + 1)) }
        }
        (kind, mn, mx) =>
          kind != "s" || {
            val dec = java.util.Base64.getDecoder
            !Layout.bytesLt(dec.decode(mx), p) && // max >= p
              succ.forall(u => Layout.bytesLt(dec.decode(mn), u)) // min < succ
          }
      }
      def test(e: Expression): Option[(String, Test)] = e match {
        case EqualTo(a, l: Literal) => mk(a, '=', l)
        case EqualTo(l: Literal, a) => mk(a, '=', l)
        case EqualNullSafe(a, l: Literal) if l.value != null => mk(a, '=', l)
        case EqualNullSafe(l: Literal, a) if l.value != null => mk(a, '=', l)
        case GreaterThan(a, l: Literal) => mk(a, '>', l)
        case GreaterThan(l: Literal, a) => mk(a, '<', l)
        case GreaterThanOrEqual(a, l: Literal) => mk(a, 'g', l)
        case GreaterThanOrEqual(l: Literal, a) => mk(a, 'l', l)
        case LessThan(a, l: Literal) => mk(a, '<', l)
        case LessThan(l: Literal, a) => mk(a, '>', l)
        case LessThanOrEqual(a, l: Literal) => mk(a, 'l', l)
        case LessThanOrEqual(l: Literal, a) => mk(a, 'g', l)
        case In(a, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
          for {
            c <- attrOf(a)
            ts <- {
              val each = vs.map(v => litTest('=', v.asInstanceOf[Literal]))
              if (each.forall(_.isDefined)) Some(each.flatten) else None
            }
          } yield (c, anyOf(ts))
        case InSet(a, hset) if hset.nonEmpty =>
          for {
            c <- attrOf(a)
            ts <- {
              val each = hset.toSeq.map {
                case null => None
                case u: org.apache.spark.unsafe.types.UTF8String =>
                  Some(strTest('=', u.getBytes))
                case i: java.lang.Integer => Some(longTest('=', i.longValue))
                case j: java.lang.Long => Some(longTest('=', j.longValue))
                case sh: java.lang.Short => Some(longTest('=', sh.longValue))
                case b: java.lang.Byte => Some(longTest('=', b.longValue))
                case d: java.lang.Double => Some(dblTest('=', d.doubleValue))
                case fl: java.lang.Float => Some(dblTest('=', fl.doubleValue))
                case _ => None
              }
              if (each.forall(_.isDefined)) Some(each.flatten) else None
            }
          } yield (c, anyOf(ts))
        case StartsWith(a, l: Literal) =>
          attrOf(a).flatMap(c => l.value match {
            case u: org.apache.spark.unsafe.types.UTF8String =>
              Some(c -> startsWithTest(u.getBytes))
            case _ => None
          })
        case _ => None
      }
      val tests = filters.flatMap(test)
      if (tests.isEmpty) None
      else {
        // per-column per-file stats: typed #stat2 first, the layout
        // key's #stat lines (kind "i" by construction) as fallback
        val byCol = tests.map(_._1).distinct.map { c =>
          val typed = m.stats2(c).map { case (rel, (_, kind, mn, mx)) =>
            rel -> ((kind, mn, mx))
          }
          val keyed = m.stats(c).map { case (rel, (_, mn, mx)) =>
            rel -> (("i", mn.toString, mx.toString))
          }
          c -> (keyed ++ typed)
        }.toMap
        Some(m.files.filter { rel =>
          tests.forall { case (c, t) =>
            byCol(c).get(rel) match {
              case Some((kind, mn, mx)) => t(kind, mn, mx)
              case None => true // no stats claim: must read the file
            }
          }
        }.toSet)
      }
    }
  }

  /** Read the table at version `v` (time travel) — under that
    * VERSION's logical schema and column names (pre-rename versions
    * read under the old names), with the manifest's byte sizes as the
    * relation's reported statistics and its per-file stats as the
    * planning-time file pruner (see [[readFiles]]). */
  def readAt(spark: SparkSession, dir: String, v: Long): DataFrame = {
    val m = committedManifest(spark, dir, v)
    readFiles(spark, dir, m.files, m.schemaOpt, m.colMap, m.fileSizes,
      statsPruner(m), m.dv, dvRefs = m.dvRefs)
  }

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
    resolveForWrite(spark, dir)
    val prev = latest(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"$dir has no snapshots"))
    val pm = manifest(spark, dir, prev)
    val bOf = bucketOf(bucketCol) _
    val frag = pm.files.groupBy(bOf).filter(_._2.size >= 2)
    // DELETION-VECTOR reclaim: a DV-bearing file rewrites here even if
    // its bucket is not fragmented — the read below is DV-filtered, so
    // the rewrite MATERIALIZES the deletes and the dv line drops
    // (vacuum then reclaims the pre-delete bytes)
    val fullDv = resolveDv(spark, dir, pm)
    val dvBuckets = pm.files.filter(fullDv.contains).map(bOf).toSet
    val rewriteBuckets = frag.keySet ++ dvBuckets
    if (rewriteBuckets.isEmpty) return prev
    val fragFiles = pm.files.filter(f => rewriteBuckets.contains(bOf(f)))
    val fragDf = readFiles(spark, dir, fragFiles, pm.schemaOpt, pm.colMap,
      pm.fileSizes, dv = fullDv)
    val tp = pm.toPhysical
    val st = stage(toPhysicalDf(fragDf, tp), dir,
      tp.getOrElse(bucketCol, bucketCol),
      sortCols.map(c => tp.getOrElse(c, c)), blockSize,
      math.max(rewriteBuckets.size, 1), stat2Cols = pm.statCols,
      ndvCols = pm.ndvCols)
    val kept = pm.files.filterNot(f => rewriteBuckets.contains(bOf(f)))
    val keptSet = kept.toSet
    // stat:<key>:<rows>:<min>:<max>:<relpath> — path is the 6th field
    val keptStats = pm.statLines.filter(l =>
      keptSet.contains(l.split(":", 6).last))
    // stat2 lines carry SEVEN fields (stat2:col:kind:rows:min:max:rel)
    // and ndv lines FOUR (ndv:col:b64:rel) — the path is always last
    val keptStats2 = pm.stat2Lines.filter(l =>
      keptSet.contains(statRelOf(l)))
    val keptNdv = pm.ndvLines.filter(l =>
      keptSet.contains(l.split(":", 4).last))
    val keptSizes = pm.fsizeLines.filter(l =>
      keptSet.contains(l.split(":", 3).last))
    val keptDv = pm.dvLines.filter(l => keptSet.contains(dvRelOf(l)))
    val schema = pm.schemaOpt.map(nullable(_).json).getOrElse(st.schemaJson)
    val v = claimAbove(spark, dir, prev)
    commit(spark, dir, v, kept ++ st.rels,
      Seq("format:2", s"schema:$schema") ++ carriedBatch(pm) ++
        pm.propLines ++ pm.colmapLines ++
        pm.statColsLines ++ pm.ndvColsLines ++ keptStats ++ st.statLines ++
        keptStats2 ++ st.stat2Lines ++ keptNdv ++ st.ndvLines ++
        keptSizes ++ st.sizeLines ++ keptDv)
    v
  }

  /** Run a snapshot WRITE under the optimistic-concurrency RETRY loop
    * the claim contract expects of callers: every write function
    * plans from `latest()` at entry, [[claimAbove]] throws
    * ConcurrentModificationException when a racer committed above the
    * planned base, and the create-exclusive commit throws
    * FileAlreadyExists when two writers race the same number — both
    * are "re-plan from the new head and try again" signals, which is
    * exactly what re-executing the closure does. ONLY those two
    * racing-loser signals retry; real failures propagate
    * immediately. Usage:
    * `Snapshots.retryingWrite() { Snapshots.append(df, dir, ...) }` */
  def retryingWrite[T](maxAttempts: Int = 5)(op: => T): T = {
    require(maxAttempts >= 1, "need at least one attempt")
    var attempt = 1
    while (true) {
      try return op
      catch {
        case e @ (_: java.util.ConcurrentModificationException |
                  _: org.apache.hadoop.fs.FileAlreadyExistsException) =>
          if (attempt >= maxAttempts) throw e
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** One maintenance pass's outcome. */
  final case class Maintenance(compactedTo: Option[Long],
                               vacuumedFrom: Option[Long],
                               manifestsDropped: Long, filesDeleted: Long,
                               checkpointCovers: Long)

  /** ONE maintenance entry point, driven by the table's OWN carried
    * properties — the piece that turns the format's maintenance
    * primitives into something a scheduler can call blindly per
    * table (no per-table configuration lives outside the table):
    *
    *  1. [[compact]] — always offered; a no-op commit-free return
    *     when no bucket is fragmented;
    *  2. retention vacuum — only if the table declares
    *     `prop:retainversions=N`: keep the newest N committed
    *     versions, [[vacuum]] the rest (with `retainMs` still
    *     guarding concurrent writers' staged files — pass 0 only
    *     under exclusive access, same contract as vacuum itself).
    *     Malformed/absent property → no deletion, ever;
    *  3. [[checkpoint]] — always (cheap; keeps cold attach at one
    *     file read even between `ckptevery` hits).
    *
    * Deliberately NOT run inside commits: compaction is a data
    * rewrite and vacuum is the format's only destructive operation —
    * neither belongs on a writer's latency path nor under its
    * permissions. This is the side-channel runner the `ckptevery`
    * in-commit policy cannot be. */
  def maintain(spark: SparkSession, dir: String, bucketCol: String,
               sortCols: Seq[String], retainMs: Long = DefaultRetainMs,
               blockSize: Long = 128L * 1024 * 1024): Maintenance =
    maintainImpl(spark, dir, retainMs,
      () => compact(spark, dir, bucketCol, sortCols, blockSize))

  /** The maintenance core behind [[maintain]] and the layout tables'
    * variants ([[ZOrderTable.maintain]], [[HashBucketedTable
    * .maintain]]) — each layout supplies its OWN compactor (the step
    * that knows about cells/epochs); retention + checkpoint are
    * layout-independent. */
  private[operators] def maintainImpl(spark: SparkSession, dir: String,
                                      retainMs: Long,
                                      compactor: () => Long): Maintenance = {
    val before = latest(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"$dir has no snapshots"))
    val props = propsAt(spark, dir, before)
    val afterCompact = compactor()
    val compacted = if (afterCompact != before) Some(afterCompact) else None
    val retainN = props.get("retainversions")
      .flatMap(s => scala.util.Try(s.toLong).toOption).filter(_ >= 1)
    val (vFrom, dropped, deleted) = retainN match {
      case Some(n) => retentionVacuum(spark, dir, n, retainMs)
      case None => (None, 0L, 0L)
    }
    val covers = checkpoint(spark, dir)
    Maintenance(compacted, vFrom, dropped, deleted, covers)
  }

  /** VERSION-retention vacuum: keep the newest `n` committed versions
    * and [[vacuum]] everything older — the arithmetic behind
    * `prop:retainversions` maintenance and the SQL `VACUUM ... RETAIN
    * n VERSIONS` statement (ONE implementation, so the two surfaces
    * cannot disagree on the clamp). Returns (keepFrom if anything
    * dropped, versions dropped, files deleted). */
  private[graft] def retentionVacuum(spark: SparkSession, dir: String,
                                     n: Long, retainMs: Long)
      : (Option[Long], Long, Long) = {
    require(n >= 1, s"retention must keep at least one version (got $n)")
    val vs = versions(spark, dir)
    val byRetention = vs.takeRight(math.min(n, vs.size.toLong).toInt).head
    // never vacuum past the newest batch-bearing version: dropping
    // the whole exactly-once ledger would let a restart's
    // re-delivered batch RE-APPLY (defense in depth — carriedBatch
    // keeps the newest manifest batch-bearing, so this clamp only
    // binds when a foreign writer broke the carry chain)
    val keepFrom = newestBatchVersion(spark, dir) match {
      case Some(bv) => math.min(byRetention, bv)
      case None => byRetention
    }
    if (keepFrom > vs.head) {
      val (d, del, _) = vacuum(spark, dir, keepFrom, retainMs)
      (Some(keepFrom), d, del)
    } else (None, 0L, 0L)
  }

  /** MERGE (upsert) — the CDC apply step: commit a new version where
    * every target row whose key matches an update row is REPLACED
    * and every update row is inserted (rows with unmatched keys are
    * pure inserts, including into brand-new buckets). Only the
    * buckets the updates touch are rewritten — untouched buckets
    * share their files with the previous version byte-for-byte, and
    * earlier versions keep reading the pre-merge state (time travel
    * across a merge works). Updates must carry at least the target's
    * columns (additive evolution: they may add new ones), including
    * `bucketCol` — NON-NULL on every row; key uniqueness WITHIN the
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
            numTasks: Int = 32, meta: Seq[String] = Nil): Long =
    mergeImpl(Some(updates), None, dir, bucketCol, keyCols, sortCols,
      blockSize, numTasks, meta)

  /** DELETE rows by key — the missing half of CDC apply (and the
    * GDPR-erasure / retention-purge primitive): commit a new version
    * where every target row whose key matches a `keys` row is GONE.
    * `keys` must carry `keyCols` and a non-null `bucketCol` (locate
    * the buckets without scanning the table). Only buckets holding
    * delete keys are rewritten; a bucket whose every row is deleted
    * simply drops out of the manifest (no empty files). Earlier
    * versions keep reading the pre-delete state — time travel across
    * a delete works, and the data files are reclaimed by [[vacuum]]
    * once no kept version references them (deletion of HISTORY is
    * still vacuum's job alone; this deletes from the table HEAD).
    * Keys matching nothing simply rewrite their bucket unchanged.
    * Cost ∝ touched buckets, never table size. */
  def delete(keys: DataFrame, dir: String, bucketCol: String,
             keyCols: Seq[String], sortCols: Seq[String],
             blockSize: Long = 128L * 1024 * 1024,
             numTasks: Int = 32, meta: Seq[String] = Nil): Long =
    mergeImpl(None, Some(keys), dir, bucketCol, keyCols, sortCols,
      blockSize, numTasks, meta)

  /** MERGE-ON-READ delete (deletion vectors — the public Delta DV /
    * Iceberg position-delete shape): commit a new version where every
    * row matching a `keys` row is gone, while writing ZERO data files
    * — the commit is METADATA-ONLY, recording the matched rows'
    * within-file positions as `#dv` lines. This is what a GDPR
    * erasure of scattered keys needs at 100 TB: [[delete]]
    * (copy-on-write) rewrites every bucket holding a matched key —
    * potentially a large fraction of the table for a few thousand
    * rows — where this pays ONE read of the candidate buckets
    * (positions located, nothing staged) and a small manifest line.
    * Reads apply the vectors via one broadcast anti-join on
    * (file, position); time travel still reads the pre-delete state;
    * the change feed emits the newly-dead rows as deletes; any later
    * rewrite of a vectored file (merge, [[compact]] — which targets
    * DV-bearing files explicitly) MATERIALIZES the vector and drops
    * the line, and [[vacuum]] then reclaims the bytes. Same key
    * contract as [[delete]]: `keys` carries `keyCols` plus a non-null
    * `bucketCol` locating the buckets without a table scan.
    * Vectors past [[Dv.MaxInlinePositions]] per file refuse — use
    * the copy-on-write delete (rewriting is cheaper at that churn).
    * Returns the previous version when nothing matches (no empty
    * commits). */
  def deleteVectored(keys: DataFrame, dir: String, bucketCol: String,
                     keyCols: Seq[String]): Long =
    deleteVectoredBy(keys, dir, keyCols, { pm =>
      val bOf = bucketOf(bucketCol) _
      val bRows = keys.select(col(bucketCol).cast("long")).distinct().collect()
      require(bRows.forall(!_.isNullAt(0)),
        s"delete keys carry NULL $bucketCol values — every row must have " +
          "a non-null bucket (derive it from the key upstream)")
      val touched = bRows.map(_.getLong(0)).toSet
      pm.files.filter(f => touched.contains(bOf(f)))
    })

  /** [[deleteVectored]]'s engine with the CANDIDATE-FILE selection
    * abstracted out — the layout tables route their own epoch
    * arithmetic through here (z: cells at each epoch's shift; hash:
    * key hashes at each epoch's modulus) so a scattered erasure on a
    * layout table is metadata-only too, instead of the full bucket
    * rewrites the layouts' copy-on-write delete pays. `candidatesOf`
    * sees the LATEST manifest (the one the commit will be planned
    * against) and returns the files that could hold matching rows —
    * over-selection costs a wasted read, under-selection loses
    * deletes, so be conservative. */
  private[operators] def deleteVectoredBy(keys: DataFrame, dir: String,
      keyCols: Seq[String], candidatesOf: Manifest => Seq[String]): Long = {
    require(keyCols.nonEmpty, "delete needs key columns")
    val spark = keys.sparkSession
    deleteVectoredHits(spark, dir) { pm =>
      val candidates = candidatesOf(pm)
      if (candidates.isEmpty) None
      // ONE read of the candidate buckets (already-dead rows excluded
      // so a vector never double-records — sidecar debt stays off the
      // driver via the dvRefs passthrough), broadcast-semi-joined to
      // the keys: the matched rows' (file, position) pairs ARE the
      // delete
      else Some((readFiles(spark, dir, candidates, pm.schemaOpt, pm.colMap,
          pm.fileSizes, dv = pm.dv, dvRefs = pm.dvRefs, withPos = true)
        .join(broadcast(keys.select(keyCols.map(col): _*).distinct()),
          keyCols, "left_semi")
        .select(FileCol, PosCol),
        candidates.iterator.flatMap(pm.fileSizes.get).sum))
    }
  }

  /** MERGE-ON-READ delete by PREDICATE — the SQL `DELETE FROM ...
    * WHERE` engine ([[graft.sources.GraftTable]]'s SupportsDelete
    * lands here): rows matching `condition` at the table HEAD commit
    * as deletion-vector positions, ZERO files written — the shape a
    * GDPR `DELETE FROM t WHERE id IN (...)` wants on ANY layout
    * (positions are layout-agnostic; no key/bucket contract needed).
    * File pruning comes free: pushed-down conjuncts of `condition`
    * drop whole files at planning via the manifest's typed stats.
    * The per-file [[Dv.MaxInlinePositions]] refusal applies — a
    * rewrite-scale delete (e.g. an unfiltered TRUNCATE) refuses
    * toward the copy-on-write paths. */
  def deleteWhere(spark: SparkSession, dir: String,
                  condition: org.apache.spark.sql.Column): Long =
    deleteVectoredHits(spark, dir) { pm =>
      Some((readFiles(spark, dir, pm.files, pm.schemaOpt, pm.colMap,
          pm.fileSizes, statsPruner(pm), dv = pm.dv, dvRefs = pm.dvRefs,
          withPos = true)
        .filter(condition)
        .select(FileCol, PosCol),
        pm.fileSizes.values.sum))
    }

  /** The vectored-delete ENGINE: `hitsOf` turns the latest manifest
    * into the (file, position) frame to kill plus a candidate-scan
    * byte estimate (off the manifest's `#fsize` lines) — None/empty
    * means nothing matched and nothing commits. Guards the per-file
    * inline budget, grows vectors, re-encodes inline-vs-sidecar,
    * carries everything else verbatim, one metadata-only commit.
    *
    * Old-vector exclusion rides `hitsOf`'s own read (inline `#dv`
    * plus `#dvf` refs passthrough — deep sidecar debt never
    * materializes on the driver here), and the budget guard reads the
    * LINE-carried counts, so no sidecar opens before the encode pass.
    *
    * Two scale knobs:
    *  - the hits frame PERSISTS across the refusal guard and the
    *    encode pass only when the candidate scan is worth caching
    *    ([[DvPersistHitsBytesKey]] — below it a re-scan beats the
    *    materialization, measured ~2 s per delete at gate scale);
    *  - past [[DvWriteDistributeThresholdKey]] TOTAL matched
    *    positions, vectors encode (and sidecars write) FROM TASKS —
    *    the driver collects one (rel, count, payload) row per touched
    *    file, never the pairs themselves, so the commit path is
    *    bounded by file count like every other metadata operation. */
  private def deleteVectoredHits(spark: SparkSession, dir: String)(
      hitsOf: Manifest => Option[(DataFrame, Long)]): Long = {
    resolveForWrite(spark, dir)
    val prev = latest(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"$dir has no snapshots"))
    val pm = manifest(spark, dir, prev)
    val schema = pm.schemaOpt.map(nullable(_).json).getOrElse(
      throw new IllegalArgumentException(
        s"$dir predates manifest format 2 — deleteVectored needs a schema"))
    val (hitsDf, candBytes) = hitsOf(pm) match {
      case None => return prev
      case Some(h) => h
    }
    // existing debt per file from the manifest LINES alone (sidecar
    // lines carry their counts) — the guard never opens a sidecar
    def oldLen(rel: String): Long =
      pm.dvRefs.get(rel).map(_._1)
        .orElse(pm.dv.get(rel).map(_.length.toLong)).getOrElse(0L)
    val doPersist = candBytes >= dvPersistHitsBytes(spark)
    if (doPersist)
      hitsDf.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one (rel, grown count, payload) per touched file;
    // payload "i:<b64>" = inline line body, "f:<rel>" = sidecar path
    val encoded: Array[(String, Long, String)] = try {
      // ENFORCE the documented refusal before anything lands on the
      // driver: a vector past Dv.MaxInlinePositions per file means the
      // erasure is rewrite-scale — the copy-on-write delete is the
      // right tool (an unbounded collect would OOM the driver, not
      // refuse)
      val perFile = hitsDf.groupBy(FileCol).count().collect()
      perFile.foreach { r =>
        val total = r.getLong(1) + oldLen(r.getString(0))
        require(total <= Dv.MaxInlinePositions,
          s"deleteVectored would grow ${r.getString(0)}'s vector to " +
            s"$total positions (> ${Dv.MaxInlinePositions})" +
            " — use the copy-on-write delete; rewriting is cheaper at that churn")
      }
      if (perFile.isEmpty) Array.empty[(String, Long, String)]
      else if (perFile.iterator.map(_.getLong(1)).sum <=
          dvWriteDistributeThreshold(spark)) {
        // bounded erasure: collect the pairs, merge + encode on the
        // driver; old SIDECARS are read for touched files only
        hitsDf.collect().groupBy(_.getString(0)).toArray.map {
          case (rel, rs) =>
            val old = pm.dvRefs.get(rel) match {
              case Some((_, sc)) => readSidecar(spark, dir, sc)
              case None => pm.dv.getOrElse(rel, Array.empty[Long])
            }
            val grown = Dv.merge(old, rs.map(_.getLong(1)))
            if (grown.length <= Dv.InlineMax)
              (rel, grown.length.toLong, s"i:${Dv.encode(grown)}")
            else
              (rel, grown.length.toLong,
                s"f:${writeDvSidecar(spark, dir, grown)}")
        }
      } else distributedDvEncode(spark, dir, pm, hitsDf)
    } finally if (doPersist) hitsDf.unpersist()
    if (encoded.isEmpty) return prev
    // untouched files keep their existing lines VERBATIM (inline or
    // sidecar ref); grown files re-encode — inline up to Dv.InlineMax,
    // one immutable sidecar past it (the old sidecar becomes an
    // orphan; vacuum reclaims it once no kept manifest references it)
    val grownRels = encoded.iterator.map(_._1).toSet
    val untouched = pm.dvLines.filterNot(l => grownRels.contains(dvRelOf(l)))
    val dvAll = untouched ++ encoded.sortBy(_._1).map {
      case (rel, _, p) if p.startsWith("i:") => s"dv:${p.drop(2)}:$rel"
      case (rel, cnt, p) => s"dvf:$cnt:${p.drop(2)}:$rel"
    }
    // everything else carries verbatim — same files, same stats (now
    // per-FILE upper bounds; rowCountAt subtracts the dead positions)
    val carried = pm.meta.filter(m => m.startsWith("#stat:") ||
      m.startsWith("#stat2:") || m.startsWith("#stat3:") ||
      m.startsWith("#statcols:") ||
      m.startsWith("#ndv:") || m.startsWith("#ndvcols:") ||
      m.startsWith("#bucketw:") || m.startsWith("#filew:") ||
      m.startsWith("#bucketh:") || m.startsWith("#fileh:") ||
      m.startsWith("#filez:") || m.startsWith("#colmap:") ||
      m.startsWith("#prop:") || m.startsWith("#fsize:"))
      .map(_.stripPrefix("#"))
    // NOTE: dv/dvf lines are NOT in this list — untouched ones are
    // carried via `untouched` below, grown ones re-encode
    val v = claimAbove(spark, dir, prev)
    commit(spark, dir, v, pm.files,
      Seq("format:2", s"schema:$schema") ++ carriedBatch(pm) ++
        carried ++ dvAll)
    v
  }

  /** The wide-erasure encode: grow + encode every touched file's
    * vector IN TASKS and write sidecars from the task that owns the
    * file — the driver receives one (rel, count, payload) row per
    * touched file (bounded by file count; the manifest carries the
    * same rows), never the (file, position) pairs. Shape: shuffle the
    * pairs partitioned by FILE and sorted by (file, position), then
    * stream each partition's consecutive runs — one primitive-array
    * build per file, no boxed groupBy. Old vectors resolve task-side:
    * inline `#dv` arrays ride a broadcast (the driver already holds
    * them — they ARE manifest lines); `#dvf` sidecars are read by the
    * one task that owns the file. A retried/speculated task can leave
    * an orphan sidecar under `dv/` (fresh UUID per attempt, only one
    * attempt's rows are consumed) — the same crash-orphan story as
    * every staged write here; vacuum sweeps it. */
  private def distributedDvEncode(spark: SparkSession, dir: String,
      pm: Manifest, hitsDf: DataFrame): Array[(String, Long, String)] = {
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val inlineBc = spark.sparkContext.broadcast(pm.dv)
    val refsBc = spark.sparkContext.broadcast(pm.dvRefs)
    val dirStr = dir
    val inlineMax = Dv.InlineMax
    val nParts = math.max(32, spark.sparkContext.defaultParallelism)
    val byFile = new org.apache.spark.Partitioner {
      override def numPartitions: Int = nParts
      override def getPartition(key: Any): Int = key match {
        case (f: String, _) => (f.hashCode & Int.MaxValue) % nParts
        case _ => 0
      }
    }
    hitsDf.rdd.map(r => ((r.getString(0), r.getLong(1)), ()))
      .repartitionAndSortWithinPartitions(byFile)
      .mapPartitions { it =>
        val buf = it.buffered
        new Iterator[(String, Long, String)] {
          override def hasNext: Boolean = buf.hasNext
          override def next(): (String, Long, String) = {
            val rel = buf.head._1._1
            val ps = new scala.collection.mutable.ArrayBuilder.ofLong
            while (buf.hasNext && buf.head._1._1 == rel) {
              ps += buf.next()._1._2
            }
            val conf = confBc.value.value
            val old: Array[Long] = refsBc.value.get(rel) match {
              case Some((_, sc)) =>
                val p = new org.apache.hadoop.fs.Path(s"$dirStr/$sc")
                val f = p.getFileSystem(conf)
                val in = f.open(p)
                try {
                  val bytes = new Array[Byte](f.getFileStatus(p).getLen.toInt)
                  in.readFully(bytes)
                  Dv.decodeBytes(bytes)
                } finally in.close()
              case None =>
                inlineBc.value.getOrElse(rel, Array.empty[Long])
            }
            val grown = Dv.merge(old, ps.result())
            if (grown.length <= inlineMax)
              (rel, grown.length.toLong, s"i:${Dv.encode(grown)}")
            else {
              val scRel =
                s"dv/${java.util.UUID.randomUUID().toString.take(8)}.dvs"
              val p = new org.apache.hadoop.fs.Path(s"$dirStr/$scRel")
              val f = p.getFileSystem(conf)
              f.mkdirs(p.getParent)
              val out = f.create(p, false)
              try out.write(Dv.encodeBytes(grown)) finally out.close()
              (rel, grown.length.toLong, s"f:$scRel")
            }
          }
        }
      }.collect()
  }

  /** Upserts and deletes in ONE commit — the full CDC apply step a
    * net change batch needs (replaced keys arrive as upserts, gone
    * keys as deletes; both land atomically in one version). Keep the
    * update and delete key sets DISJOINT for CDC applies (a replaced
    * key is an upsert, not a delete+insert) — that disjointness is
    * exactly what [[graft.streaming.ChangeFeed.net]] plus a same-key
    * anti-join gives a consumer. A key present on BOTH sides is
    * dropped from its delete-side bucket and re-inserted from the
    * update side (the update wins) — the behavior
    * [[ZOrderTable.mergeMoving]] uses deliberately to relocate rows
    * whose bucket changed. */
  def applyChanges(updates: DataFrame, deletes: DataFrame, dir: String,
                   bucketCol: String, keyCols: Seq[String],
                   sortCols: Seq[String],
                   blockSize: Long = 128L * 1024 * 1024,
                   numTasks: Int = 32, meta: Seq[String] = Nil): Long =
    mergeImpl(Some(updates), Some(deletes), dir, bucketCol, keyCols, sortCols,
      blockSize, numTasks, meta)

  private def mergeImpl(updatesOpt: Option[DataFrame],
                        deletesOpt: Option[DataFrame], dir: String,
                        bucketCol: String, keyCols: Seq[String],
                        sortCols: Seq[String], blockSize: Long,
                        numTasks: Int, meta: Seq[String]): Long = {
    require(keyCols.nonEmpty, "merge/delete needs key columns")
    val spark = updatesOpt.orElse(deletesOpt).get.sparkSession
    resolveForWrite(spark, dir)
    val prev = latest(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"$dir has no snapshots — use publish"))
    val pm = manifest(spark, dir, prev)
    val bOf = bucketOf(bucketCol) _
    // MATERIALIZE each incoming side once on the TWO-SIDED (CDC) shape
    // (guide §5 — with deletes present a merge consumes its sides
    // through 3-4 independent actions: two bucket-location folds, the
    // emptiness probe, and the staging write, the last two via the
    // dropKeys anti-join). Without a persist every action recomputes
    // the side's full upstream DAG — for a streaming CDC microbatch
    // that is the whole changed-file read + net() shuffle, measured
    // 0.7–1.8 s PER ACTION on q178's replica at sf0.1. Batches are
    // churn-sized (never table-sized), so MEMORY_AND_DISK is safe at
    // any scale; the same materialize-the-source discipline Delta's
    // MERGE applies. An updates-ONLY merge deliberately does NOT
    // persist: its side feeds one fold plus one write, and the
    // materialization tax measured LARGER than the saved recompute on
    // ordinary parquet-backed batches (+0.2-0.4 s per merge across
    // q161/q164/q170/q174/q192 in the mid-round window). Frames the
    // caller already persisted are left alone (and not unpersisted
    // behind the caller's back).
    import org.apache.spark.storage.StorageLevel
    val wantPersist = deletesOpt.isDefined
    def materialize(df: DataFrame): (DataFrame, Boolean) =
      if (!wantPersist || df.storageLevel != StorageLevel.NONE) (df, false)
      else (df.persist(StorageLevel.MEMORY_AND_DISK), true)
    val (updatesP, updOwned) = updatesOpt.map(materialize)
      .map(t => (Some(t._1), t._2)).getOrElse((None, false))
    val (deletesP, delOwned) = deletesOpt.map(materialize)
      .map(t => (Some(t._1), t._2)).getOrElse((None, false))
    try {
      // ONE pass per side yields the touched buckets AND the row count
      // (the count lets the common case skip the emptiness probe below)
      def bucketsOf(df: DataFrame, what: String): (Set[Long], Long) =
        graft.Prof(s"merge.buckets($what) $dir") {
          val rows = df.groupBy(col(bucketCol).cast("long").as("__b"))
            .count().collect()
          // fail fast with the contract, not an NPE deep in the plan — a
          // NULL bucket would otherwise stage into an unparseable directory
          require(rows.forall(!_.isNullAt(0)),
            s"$what rows carry NULL $bucketCol values — every row must have " +
              "a non-null bucket (derive it from the key upstream)")
          (rows.map(_.getLong(0)).toSet, rows.map(_.getLong(1)).sum)
        }
      val (updBuckets, updRows) = updatesP.map(bucketsOf(_, "merge: update"))
        .getOrElse((Set.empty[Long], 0L))
      val (delBuckets, _) = deletesP.map(bucketsOf(_, "delete: key"))
        .getOrElse((Set.empty[Long], 0L))
      val touched = updBuckets ++ delBuckets
      if (touched.isEmpty) return prev // empty batch: nothing to commit
      val existingFiles = pm.files.filter(f => touched.contains(bOf(f)))
      // the keys whose existing rows must NOT survive: replaced + deleted
      val dropKeys = (updatesP.toSeq ++ deletesP.toSeq)
        .map(_.select(keyCols.map(col): _*))
        .reduce(_.unionByName(_))
      if (existingFiles.isEmpty && updatesP.isEmpty)
        return prev // pure delete of keys in non-existent buckets: no-op
      val mergedRows =
        if (existingFiles.isEmpty) updatesP.get
        else {
          val existing = readFiles(spark, dir, existingFiles, pm.schemaOpt,
            pm.colMap, pm.fileSizes, dv = resolveDv(spark, dir, pm))
          // additive/WIDENING evolution: updates may ADD columns (old
          // rows null-fill on read) and shared columns may WIDEN in
          // either direction — both sides align to the per-column
          // widest type, then matched/deleted keys drop
          updatesP match {
            case Some(updates) =>
              val (ex, up) = mergeAlign(existing, updates)
              ex.join(dropKeys, keyCols, "left_anti").unionByName(up)
            case None =>
              existing.join(dropKeys, keyCols, "left_anti")
          }
        }
      // a delete can empty its buckets entirely: commit kept files only
      // (the bucket disappears) — stage refuses zero-file writes. The
      // emptiness probe runs only when it can actually fire: deletes
      // present AND no surviving update row (a merged frame that unions
      // a non-empty update side can never be empty — the bucket fold
      // above already counted it, so the probe's extra scan is skipped
      // on every ordinary CDC batch).
      val tp = pm.toPhysical
      val st =
        if (deletesOpt.isDefined && updRows == 0L &&
            graft.Prof(s"merge.emptyProbe $dir")(mergedRows.isEmpty))
          Staged(Nil, pm.schemaOpt.map(nullable(_).json).getOrElse(
            nullable(mergedRows.schema).json), Nil)
        else stage(toPhysicalDf(mergedRows, tp), dir,
          tp.getOrElse(bucketCol, bucketCol),
          sortCols.map(c => tp.getOrElse(c, c)), blockSize,
          // staged rows live in exactly the touched buckets, so more
          // write tasks than buckets is pure scheduling overhead
          // (guide §2: derive partitioning from the data, not a
          // constant) — file count is partitionBy(bucket), unchanged
          math.min(numTasks, math.max(1, touched.size)),
          stat2Cols = pm.statCols, ndvCols = pm.ndvCols)
      val kept = pm.files.filterNot(f => touched.contains(bOf(f)))
      val schema = pm.schemaOpt match {
        case Some(ps) if updatesP.isEmpty => nullable(ps).json // deletes never evolve
        case Some(ps) => mergeSchemas(ps, nullable(mergedRows.schema)).json
        case None => st.schemaJson
      }
      commitReplacing(spark, dir, pm, prev, kept, st, schema, meta)
    } finally {
      if (updOwned) updatesP.foreach(_.unpersist(false))
      if (delOwned) deletesP.foreach(_.unpersist(false))
    }
  }

  /** The REPLACE-FILES commit every rewrite path shares (bucket-merge,
    * SQL MERGE's copy-on-write): kept files carry their per-file lines
    * verbatim, staged files bring theirs, declarations and the ledger
    * header carry, ONE manifest lands. The rewritten files' deletion
    * vectors drop with the files — the rewrite read was DV-filtered,
    * so the deletes just MATERIALIZED. */
  private[operators] def commitReplacing(spark: SparkSession, dir: String,
      pm: Manifest, prev: Long, kept: Seq[String], st: Staged,
      schemaJson: String, meta: Seq[String] = Nil): Long = {
    val keptSet = kept.toSet
    val keptStats = pm.statLines.filter(l =>
      keptSet.contains(l.split(":", 6).last))
    // stat2 lines carry SEVEN fields (stat2:col:kind:rows:min:max:rel)
    // and ndv lines FOUR (ndv:col:b64:rel) — the path is always last
    val keptStats2 = pm.stat2Lines.filter(l =>
      keptSet.contains(statRelOf(l)))
    val keptNdv = pm.ndvLines.filter(l =>
      keptSet.contains(l.split(":", 4).last))
    val keptSizes = pm.fsizeLines.filter(l =>
      keptSet.contains(l.split(":", 3).last))
    val keptDv = pm.dvLines.filter(l => keptSet.contains(dvRelOf(l)))
    val v = claimAbove(spark, dir, prev)
    commit(spark, dir, v, kept ++ st.rels,
      Seq("format:2", s"schema:$schemaJson") ++ meta ++ carriedBatch(pm, meta) ++
        pm.propLines ++
        pm.colmapLines ++
        pm.statColsLines ++ pm.ndvColsLines ++ keptStats ++ st.statLines ++
        keptStats2 ++ st.stat2Lines ++ keptNdv ++ st.ndvLines ++
        keptSizes ++ st.sizeLines ++ keptDv)
    v
  }

  /** Column RENAME as a METADATA-ONLY commit (format 2.1 — the
    * Iceberg-class evolution axis): the new manifest lists the SAME
    * files; only the logical schema and the physical→logical column
    * map (`#colmap` lines) change. The PHYSICAL name a column was
    * born under never changes and is what every data file stores —
    * later writes stage under physical names, reads pass the
    * physical schema to ONE parquet relation and restore the logical
    * surface with a single projection, stats stay keyed by the
    * physical name (rename-proof), and time travel reads each
    * version under ITS OWN names. Renaming a width-bucketed table's
    * layout key is refused (`#bucketw` binds it by name), as is any
    * name containing `:`/newline (the meta-line encoding). O(manifest)
    * however large the table. */
  def rename(spark: SparkSession, dir: String, oldName: String,
             newName: String): Long = {
    resolveForWrite(spark, dir)
    val prev = latest(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"$dir has no snapshots"))
    val pm = manifest(spark, dir, prev)
    val ps = pm.schemaOpt.getOrElse(throw new IllegalArgumentException(
      s"$dir predates manifest format 2 — rename needs a recorded schema"))
    require(ps.fieldNames.contains(oldName),
      s"rename: no column $oldName in $dir")
    require(!ps.fieldNames.contains(newName),
      s"rename: column $newName already exists in $dir")
    require(newName.nonEmpty && !newName.contains(":") &&
      !newName.contains("\n") && newName != DirCol,
      s"rename: invalid column name '$newName'")
    require(!pm.metaValues("bucketw").exists(_.split(":", 2)(0) == oldName),
      s"rename: $oldName is a width-bucketed table's layout key — " +
        "unsupported (the #bucketw metadata binds it by name)")
    require(!pm.props.get("zlayout").exists(
        _.split(":", 3)(2).split(",").contains(oldName)),
      s"rename: $oldName is a z-order table's layout dimension — " +
        "unsupported (the zlayout property binds it by name)")
    require(!pm.metaValues("bucketh").exists(_.split(":", 2)(0) == oldName),
      s"rename: $oldName is a hash-bucketed table's key column — " +
        "unsupported (the #bucketh metadata binds it by name)")
    require(!pm.props.contains(s"zmap.$oldName"),
      s"rename: $oldName is a quantile-mapped z-order dimension — " +
        "unsupported (the zmap property binds it by name)")
    val phys = pm.toPhysical.getOrElse(oldName, oldName)
    val newMap = (pm.colMap - phys) ++
      (if (phys == newName) Map.empty[String, String]
       else Map(phys -> newName)) // rename back to birth name drops the entry
    val schema = StructType(ps.fields.map(f =>
      if (f.name == oldName) f.copy(name = newName) else f))
    val carried = pm.meta.filter(m => m.startsWith("#stat:") ||
      m.startsWith("#stat2:") || m.startsWith("#stat3:") ||
      m.startsWith("#statcols:") ||
      m.startsWith("#ndv:") || m.startsWith("#ndvcols:") ||
      m.startsWith("#bucketw:") || m.startsWith("#filew:") ||
      m.startsWith("#bucketh:") || m.startsWith("#fileh:") ||
      m.startsWith("#filez:") || m.startsWith("#dv:") ||
      m.startsWith("#dvf:") ||
      m.startsWith("#prop:") || m.startsWith("#fsize:"))
      .map(_.stripPrefix("#"))
    val v = claimAbove(spark, dir, prev)
    commit(spark, dir, v, pm.files,
      Seq("format:2", s"schema:${nullable(schema).json}") ++
        carriedBatch(pm) ++
        newMap.toSeq.sorted.map { case (p, l) => s"colmap:$p:$l" } ++ carried)
    v
  }

  /** Validate a SEQUENCE of renames against the table's current state
    * WITHOUT committing anything — the all-or-nothing half of ALTER
    * TABLE: the catalog runs this before its property commit so a
    * rename that would be refused (missing column, taken name,
    * layout-bound key) refuses the WHOLE statement up front instead
    * of landing the property changes and then failing. Simulates the
    * sequence over the evolving field set; the layout bindings are
    * invariant across it (a bound name can never be renamed, so it
    * can never be freed or shadowed mid-sequence). */
  def renamePrecheck(spark: SparkSession, dir: String,
                     renames: Seq[(String, String)]): Unit = {
    if (renames.isEmpty) return
    val prev = latest(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"$dir has no snapshots"))
    val pm = manifest(spark, dir, prev)
    val ps = pm.schemaOpt.getOrElse(throw new IllegalArgumentException(
      s"$dir predates manifest format 2 — rename needs a recorded schema"))
    var names = ps.fieldNames.toSet
    renames.foreach { case (oldName, newName) =>
      require(names.contains(oldName),
        s"rename: no column $oldName in $dir")
      require(!names.contains(newName),
        s"rename: column $newName already exists in $dir")
      require(newName.nonEmpty && !newName.contains(":") &&
        !newName.contains("\n") && newName != DirCol,
        s"rename: invalid column name '$newName'")
      require(!pm.metaValues("bucketw").exists(_.split(":", 2)(0) == oldName),
        s"rename: $oldName is a width-bucketed table's layout key — " +
          "unsupported (the #bucketw metadata binds it by name)")
      require(!pm.props.get("zlayout").exists(
          _.split(":", 3)(2).split(",").contains(oldName)),
        s"rename: $oldName is a z-order table's layout dimension — " +
          "unsupported (the zlayout property binds it by name)")
      require(!pm.metaValues("bucketh").exists(_.split(":", 2)(0) == oldName),
        s"rename: $oldName is a hash-bucketed table's key column — " +
          "unsupported (the #bucketh metadata binds it by name)")
      require(!pm.props.contains(s"zmap.$oldName"),
        s"rename: $oldName is a quantile-mapped z-order dimension — " +
          "unsupported (the zmap property binds it by name)")
      names = names - oldName + newName
    }
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
                 numTasks: Int = 32,
                 deletes: Option[DataFrame] = None): Long = {
    val spark = updates.sparkSession
    // batch ids are MONOTONE per streaming query (Spark's checkpoint
    // guarantees it), so any id <= the highest applied one is a
    // re-delivery — absorbed without reading a single manifest
    // beyond the newest batch-bearing one (the Delta-sink
    // txn-version semantics; an all-manifests ledger scan per batch
    // would go quadratic over a long stream's life)
    if (lastAppliedBatch(spark, dir).exists(batchId <= _))
      latest(spark, dir).get // re-delivery: already applied, change nothing
    else latest(spark, dir) match {
      case None =>
        // BOOTSTRAP: the first batch creates the table — stamped into
        // the ledger like any other batch, so a crash-replay of the
        // bootstrap batch is absorbed above instead of re-merged
        publishImpl(updates, dir, bucketCol, sortCols, blockSize,
          numTasks, Seq(s"batch:$batchId"))
      case Some(_) => deletes match {
        case Some(d) =>
          applyChanges(updates, d, dir, bucketCol, keyCols, sortCols,
            blockSize, numTasks, meta = Seq(s"batch:$batchId"))
        case None =>
          merge(updates, dir, bucketCol, keyCols, sortCols, blockSize,
            numTasks, meta = Seq(s"batch:$batchId"))
      }
    }
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
    val mOld = committedManifest(spark, dir, vOld)
    val mNew = committedManifest(spark, dir, vNew)
    val fo = mOld.files.toSet
    val fn = mNew.files.toSet
    val onlyOld = (fo -- fn).toSeq.sorted
    val onlyNew = (fn -- fo).toSeq.sorted
    // DELETION VECTORS: each side reads under ITS OWN version's
    // vectors (a row dead at vOld must not re-delete; a row dead at
    // vNew must not re-insert), and a SHARED file whose vector GREW
    // contributes its newly-dead rows — deletes the file sets alone
    // cannot see, because a DV commit changes no files at all
    val dvOldM = resolveDv(spark, dir, mOld)
    val dvNewM = resolveDv(spark, dir, mNew)
    val grown: Map[String, Array[Long]] = (fo & fn).toSeq.flatMap { rel =>
      val od = dvOldM.getOrElse(rel, Array.empty[Long]).toSet
      val nd = dvNewM.getOrElse(rel, Array.empty[Long]).filterNot(od)
      if (nd.isEmpty) None else Some(rel -> nd)
    }.toMap
    val sizes = mOld.fileSizes ++ mNew.fileSizes
    // both sides read under vNew's schema AND column names: columns
    // the old files predate null-fill natively (additive evolution);
    // renamed columns resolve by PHYSICAL name on both sides
    lazy val empty = readFiles(spark, dir, mNew.files, mNew.schemaOpt,
      mNew.colMap, sizes).limit(0)
    val newSide =
      if (onlyNew.isEmpty) empty
      else readFiles(spark, dir, onlyNew, mNew.schemaOpt, mNew.colMap,
        sizes, dv = dvNewM)
    val grownRows =
      if (grown.isEmpty) empty
      else {
        import spark.implicits._
        val sel = broadcast(grown.toSeq
          .flatMap { case (r, ps) => ps.map(p => (r, p)) }
          .toDF(FileCol, PosCol))
        readFiles(spark, dir, grown.keys.toSeq.sorted, mNew.schemaOpt,
            mNew.colMap, sizes, withPos = true)
          .join(sel, Seq(FileCol, PosCol), "left_semi")
          .drop(FileCol, PosCol)
      }
    val oldSide =
      (if (onlyOld.isEmpty) empty
       else readFiles(spark, dir, onlyOld, mNew.schemaOpt, mNew.colMap,
         sizes, dv = dvOldM))
        .unionByName(grownRows)
    // align column order/types (a no-op under a recorded schema;
    // legacy manifests' partition discovery may disagree per token)
    val oldAligned = oldSide.select(newSide.columns.map(c =>
      (if (oldSide.columns.contains(c)) col(c)
       else lit(null)).cast(newSide.schema(c).dataType).as(c)): _*)
    newSide.exceptAll(oldAligned).withColumn("_change", lit("insert"))
      .unionByName(oldAligned.exceptAll(newSide).withColumn("_change", lit("delete")))
  }

  /** Per-file key stats for version `v` — read from the MANIFEST
    * (zero data-file opens: the stats were footer-walked once at
    * write time over just that commit's new files). Files the
    * manifest carries no stats for — legacy manifests, or a
    * different key column than the one recorded — fall back to the
    * footer walk, which stays the verification path (the spec pins
    * manifest == footers). Compute once and pass to repeated
    * [[prunedScanAt]] calls over the same version. */
  def versionStats(spark: SparkSession, dir: String, v: Long,
                   keyCol: String): Seq[Layout.RowGroupStat] = {
    val m = committedManifest(spark, dir, v)
    // stats are keyed by the PHYSICAL column name (rename-proof) —
    // translate the caller's logical name through this version's map
    val phys = m.toPhysical.getOrElse(keyCol, keyCol)
    val recorded = m.stats(phys)
    val (have, missing) = m.files.partition(recorded.contains)
    val fromManifest = have.map { rel =>
      val (rows, mn, mx) = recorded(rel)
      Layout.RowGroupStat(s"$dir/$rel", fileBucket(rel), rows, mn, mx)
    }
    val walked =
      if (missing.isEmpty) Seq.empty
      else Layout.rowGroupStatsFiles(spark, missing.map(r => s"$dir/$r"), phys)
    fromManifest ++ walked
  }

  /** Footer-pruned range scan of a VERSION — time travel composed
    * with min/max skipping, planned ENTIRELY from the manifest: the
    * manifest supplies the file list AND the per-file key stats (no
    * directory walk, no footer opens — unreferenced/orphaned files
    * never consulted, non-surviving files never touched), and only
    * surviving files are read before the residual filter. Same rows
    * as `readAt(v).filter(lo <= key < hi)`, I/O proportional to the
    * predicate's key range within that version. */
  def prunedScanAt(spark: SparkSession, dir: String, v: Long,
                   keyCol: String, lo: Long, hi: Long,
                   stats: Option[Seq[Layout.RowGroupStat]] = None): DataFrame = {
    val m = committedManifest(spark, dir, v)
    val st = stats.getOrElse(versionStats(spark, dir, v, keyCol))
    val surviving = st.filter(s => s.max >= lo && s.min < hi)
      .map(_.path.stripPrefix(s"$dir/")).distinct
    val residual = col(keyCol) >= lo && col(keyCol) < hi
    if (surviving.isEmpty)
      readFiles(spark, dir, m.files, m.schemaOpt, m.colMap, m.fileSizes,
        dv = m.dv, dvRefs = m.dvRefs)
        .filter(residual).limit(0)
    else readFiles(spark, dir, surviving, m.schemaOpt, m.colMap, m.fileSizes,
      dv = m.dv, dvRefs = m.dvRefs)
      .filter(residual)
  }

  /** Typed per-file stats for ANY declared stats column of version
    * `v` — read from the MANIFEST (zero data-file opens; the
    * `#stat2` lines were typed-footer-walked once at write time over
    * each commit's new files). Files without a recorded entry fall
    * back to the typed footer walk, the verification path (the spec
    * pins manifest == footers per recorded column). `column` is the
    * version's LOGICAL name; stats are stored physical-keyed
    * (rename-proof). */
  def versionStatsFor(spark: SparkSession, dir: String, v: Long,
                      column: String): Seq[Layout.TypedFileStat] = {
    val m = committedManifest(spark, dir, v)
    val phys = m.toPhysical.getOrElse(column, column)
    val recorded = m.stats2(phys)
    val (have, missing) = m.files.partition(recorded.contains)
    val fromManifest = have.map { rel =>
      val (rows, kind, mn, mx) = recorded(rel)
      Layout.TypedFileStat(s"$dir/$rel", phys, rows, kind, mn, mx)
    }
    val walked =
      if (missing.isEmpty) Seq.empty
      else Layout.typedStatsFiles(spark, missing.map(r => s"$dir/$r"), Seq(phys))
    fromManifest ++ walked
  }

  /** [lo, hi) survival decision on one encoded typed stat. */
  private def stat2Survives(kind: String, minEnc: String, maxEnc: String,
                            lo: Any, hi: Any): Boolean = kind match {
    case "i" =>
      maxEnc.toLong >= lo.asInstanceOf[Number].longValue &&
        minEnc.toLong < hi.asInstanceOf[Number].longValue
    case "d" =>
      maxEnc.toDouble >= lo.asInstanceOf[Number].doubleValue &&
        minEnc.toDouble < hi.asInstanceOf[Number].doubleValue
    case "s" =>
      val dec = java.util.Base64.getDecoder
      val lb = lo.asInstanceOf[String].getBytes("UTF-8")
      val hb = hi.asInstanceOf[String].getBytes("UTF-8")
      // max >= lo && min < hi, unsigned byte order (parquet's own)
      !Layout.bytesLt(dec.decode(maxEnc), lb) &&
        Layout.bytesLt(dec.decode(minEnc), hb)
    case _ => true // unknown kind: keep the file (conservative)
  }

  /** Stats-pruned range scan of a version on ANY declared stats
    * column, [lo, hi) — the q169 discipline generalized past the
    * INT64 layout key: string and timestamp predicates prune too,
    * planned entirely from the manifest. Typing: integer-family
    * columns take Long bounds, double/float take Doubles, strings
    * take Strings, and TIMESTAMP columns take MICROS-since-epoch
    * Longs (the residual compares `unix_micros`). Pruning is
    * CONSERVATIVE — a file without a recorded stat is read, the
    * residual filter is exact — so the result always equals the
    * full-scan filter. */
  def prunedScanAtBy(spark: SparkSession, dir: String, v: Long,
                     column: String, lo: Any, hi: Any,
                     stats: Option[Seq[Layout.TypedFileStat]] = None): DataFrame =
    prunedScanAtBox(spark, dir, v, Seq((column, lo, hi)), stats.map(s =>
      Map(column -> s)))

  /** The manifest-relative files a `[lo, hi)` predicate on `column`
    * must read at version `v` — the pruning DECISION alone (what
    * [[prunedScanAtBy]] scans), exposed so layout gates/benchmarks
    * can count skipped files without touching data. Conservative:
    * files without a recorded stat survive. */
  def prunedFilesBy(spark: SparkSession, dir: String, v: Long,
                    column: String, lo: Any, hi: Any): Seq[String] =
    prunedFilesBox(spark, dir, v, Seq((column, lo, hi)))

  /** [[prunedFilesBy]] for a CONJUNCTION of range predicates — the
    * multi-dimensional pruning decision a Z-ORDER layout exists for:
    * a file survives only if EVERY predicate's recorded min/max
    * window overlaps it, so per-file survival sets INTERSECT across
    * dimensions (under a z-prefix bucketing each dimension's stats
    * box is the bucket cell's projection — an axis-aligned box reads
    * just the cells it intersects). */
  def prunedFilesBox(spark: SparkSession, dir: String, v: Long,
                     preds: Seq[(String, Any, Any)],
                     stats: Option[Map[String, Seq[Layout.TypedFileStat]]] = None)
      : Seq[String] = {
    require(preds.nonEmpty, "box pruning needs at least one predicate")
    val m = committedManifest(spark, dir, v)
    val byCol = preds.map { case (c, _, _) =>
      val st = stats.flatMap(_.get(c))
        .getOrElse(versionStatsFor(spark, dir, v, c))
      c -> st.map(s => s.path -> s).toMap
    }.toMap
    m.files.filter { rel =>
      preds.forall { case (c, lo, hi) =>
        byCol(c).get(s"$dir/$rel") match {
          case Some(s) => stat2Survives(s.kind, s.min, s.max, lo, hi)
          case None => true // no stats claim for this file: must read it
        }
      }
    }
  }

  /** The ROW-GROUP refinement of [[prunedFilesBox]] (format 2.3
    * `#stat3` consumption): split the file-level survivors into files
    * read WHOLE and files read as surviving BYTE RANGES only —
    * decided entirely from the manifest, zero footer opens. Per
    * box-surviving file: no `#stat3` claim (single-row-group files
    * never record one), a deletion vector (positions are whole-file
    * row indices), or inconsistent block sets across predicate
    * columns → WHOLE (conservative); every block surviving → WHOLE
    * (the vectorized path is cheaper than the range reader when
    * nothing skips); otherwise the CONTIGUOUS runs of surviving
    * blocks become ranges (a file whose every block fails drops
    * entirely — finer than the file-level decision). */
  def prunedRangesBox(spark: SparkSession, dir: String, v: Long,
                      preds: Seq[(String, Any, Any)],
                      fileSurvivors: Option[Seq[String]] = None)
      : (Seq[String], Seq[(String, Seq[(Long, Long)])]) = {
    val m = committedManifest(spark, dir, v)
    // callers that already ran the file-level pass (prunedScanAtBox)
    // hand its survivors in rather than paying the pruning twice
    val surviving = fileSurvivors.getOrElse(
      prunedFilesBox(spark, dir, v, preds))
    val dvRels = m.dv.keySet ++ m.dvRefs.keySet
    val byCol = preds.map { case (c, _, _) =>
      c -> m.stats3(m.toPhysical.getOrElse(c, c))
    }.toMap
    val whole = Seq.newBuilder[String]
    val partial = Seq.newBuilder[(String, Seq[(Long, Long)])]
    surviving.foreach { rel =>
      val claims = preds.flatMap { case (c, lo, hi) =>
        byCol(c).get(rel).map(gs => (lo, hi, gs))
      }
      val blockSets = claims.map(_._3.map(g => (g.start, g.len))).distinct
      if (claims.isEmpty || dvRels.contains(rel) || blockSets.size != 1)
        whole += rel
      else {
        val blocks = blockSets.head
        val surviveIdx = blocks.indices.filter { i =>
          claims.forall { case (lo, hi, gs) =>
            stat2Survives(gs(i).kind, gs(i).min, gs(i).max, lo, hi)
          }
        }
        if (surviveIdx.size == blocks.size) whole += rel
        else if (surviveIdx.nonEmpty) {
          // merge CONSECUTIVE surviving blocks into one byte range
          // (never bridging a skipped block — midpoint selection
          // would resurrect it)
          val runs = Seq.newBuilder[(Long, Long)]
          var runStart = -1L
          var runEnd = -1L
          var prevI = -2
          surviveIdx.foreach { i =>
            val (st, ln) = blocks(i)
            if (i == prevI + 1 && runStart >= 0) runEnd = st + ln
            else {
              if (runStart >= 0) runs += ((runStart, runEnd - runStart))
              runStart = st; runEnd = st + ln
            }
            prevI = i
          }
          runs += ((runStart, runEnd - runStart))
          partial += rel -> runs.result()
        } // else: every block fails — the file drops entirely
      }
    }
    (whole.result(), partial.result())
  }

  /** Stats-pruned scan of a version under a CONJUNCTION of range
    * predicates, `[lo, hi)` each — [[prunedScanAtBy]] generalized to
    * the multi-dimensional box query: planned entirely from the
    * manifest, surviving files = the per-dimension survivals'
    * INTERSECTION refined to surviving ROW GROUPS where `#stat3`
    * lines exist ([[prunedRangesBox]] — partially-surviving files
    * read as byte ranges through [[RgRead]], skipping whole row
    * groups without a footer open at planning), residual = the exact
    * AND. Always equals the full-scan filter. */
  /** Conf key: execute partially-surviving files as BYTE-RANGE reads
    * ([[RgRead]]) instead of whole-file vectorized reads. DEFAULT OFF
    * — measured honestly (ScaleStress `rgscan`, BENCH.md): on a local
    * filesystem with statistics-bearing footers, Spark's OWN task-side
    * row-group pruning reads the same surviving bytes VECTORIZED
    * (~20× the record-materializing range reader's throughput), so the
    * range path only wins where the PLANNING properties dominate —
    * high-latency object stores (footer round-trips priced per file)
    * or schedulers that must size tasks by true surviving bytes. The
    * DECISION surface ([[prunedRangesBox]]) is always available and
    * always manifest-only. */
  val RgScanKey = "spark.graft.scan.rowGroupRanges"

  def prunedScanAtBox(spark: SparkSession, dir: String, v: Long,
                      preds: Seq[(String, Any, Any)],
                      stats: Option[Map[String, Seq[Layout.TypedFileStat]]] = None)
      : DataFrame = {
    val m = committedManifest(spark, dir, v)
    val surviving0 = prunedFilesBox(spark, dir, v, preds, stats)
    // the row-group refinement only engages on the manifest's own
    // stats (an explicit `stats` override is the verification path —
    // footer-walked per FILE, so it stays file-granular) and when the
    // range-read execution is asked for; the DECISION still tightens
    // the file set either way (a file whose every row group fails
    // drops entirely — finer than the file-level stats)
    val rgExec = spark.conf.getOption(RgScanKey).exists(_.toBoolean)
    val (whole, partial) =
      if (stats.isDefined) (surviving0, Seq.empty)
      else {
        val (w, p) = prunedRangesBox(spark, dir, v, preds, Some(surviving0))
        if (rgExec) (w, p) else (w ++ p.map(_._1), Seq.empty)
      }
    val surviving = whole
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val residual = preds.map { case (column, lo, hi) =>
      val isTs = m.schemaOpt.exists { s =>
        s.fieldNames.contains(column) &&
          (s(column).dataType == TimestampType ||
            s(column).dataType == TimestampNTZType)
      }
      // NTZ casts through TimestampType under the pinned-UTC session —
      // identical micros to the parquet INT64 the stats recorded
      val c = if (isTs) unix_micros(col(column).cast("timestamp"))
              else col(column)
      c >= lit(lo) && c < lit(hi)
    }.reduce(_ && _)
    val wholePart =
      if (surviving.isEmpty)
        readFiles(spark, dir, m.files, m.schemaOpt, m.colMap, m.fileSizes,
          dv = m.dv, dvRefs = m.dvRefs)
          .filter(residual).limit(0)
      else readFiles(spark, dir, surviving, m.schemaOpt, m.colMap,
        m.fileSizes, dv = m.dv, dvRefs = m.dvRefs)
        .filter(residual)
    if (partial.isEmpty) wholePart
    else {
      // the partially-surviving files read as BYTE RANGES (whole row
      // groups skip without their pages ever leaving disk); DV-bearing
      // files never land here (prunedRangesBox degrades them), so no
      // position filtering is owed on this side
      val ranges = partial.flatMap { case (rel, rs) =>
        rs.map { case (start, len) => RgRead.Range(s"$dir/$rel", start, len) }
      }
      val rgPart = RgRead.read(spark, m.schemaOpt.get, m.toPhysical, ranges)
        .filter(residual)
      wholePart.unionByName(rgPart)
    }
  }

  /** TOTAL byte size of version `v`, planned from the manifest's
    * per-file `#fsize` lines (recorded free at staging from the
    * listing). Files without a recorded size — legacy manifests —
    * are stat'ed once from the filesystem, the conservative fallback
    * every stats reader here uses. */
  def sizeAt(spark: SparkSession, dir: String, v: Long): Long = {
    val m = committedManifest(spark, dir, v)
    val recorded = m.fileSizes
    val f = fs(spark, dir)
    m.files.map { rel =>
      recorded.getOrElse(rel,
        f.getFileStatus(new org.apache.hadoop.fs.Path(s"$dir/$rel")).getLen)
    }.sum
  }

  /** TOTAL row count of version `v` from the MANIFEST alone: per-file
    * row counts ride in the `#stat` / `#stat2` lines. None when any
    * file lacks one (no stats columns were declared) — callers fall
    * back to counting, or treat the table as stats-less. */
  def rowCountAt(spark: SparkSession, dir: String, v: Long): Option[Long] = {
    val m = committedManifest(spark, dir, v)
    val rows: Map[String, Long] =
      (m.metaValues("stat").flatMap { s =>
        s.split(":", 5) match {
          case Array(_, r, _, _, rel) => Some(rel -> r.toLong)
          case _ => None
        }
      } ++ m.metaValues("stat2").flatMap { s =>
        s.split(":", 6) match {
          case Array(_, _, r, _, _, rel) => Some(rel -> r.toLong)
          case _ => None
        }
      }).toMap
    val per = m.files.map(rows.get)
    // merge-on-read deletes: per-file row counts are PRE-DV (the stat
    // lines describe the physical file); the version's logical count
    // subtracts the recorded dead positions
    val dead = m.dv.valuesIterator.map(_.length.toLong).sum +
      m.dvRefs.valuesIterator.map(_._1).sum // sidecar counts ride inline
    if (per.exists(_.isEmpty)) None else Some(per.flatten.sum - dead)
  }

  /** Approximate DISTINCT COUNT of `column` at version `v`, planned
    * from the MANIFEST alone: the per-file KMV sketches ([[Ndv]],
    * `#ndv` lines, computed once per immutable file at its staging)
    * merge EXACTLY to the union's sketch, so the estimate needs zero
    * data reads however many commits built the version. Returns
    * (estimate, exact?) — exact when the merged sketch holds fewer
    * than k hashes. Files without a recorded sketch (legacy, or a
    * column outside the declared `ndvCols` list) are sketched on the
    * fly — the verification path, reads those files once. The use
    * case is JOIN PLANNING: NDV + row counts (the `#stat` lines)
    * decide broadcast vs shuffle and flag low-NDV skew keys before a
    * stage burns on them. */
  def approxDistinctAt(spark: SparkSession, dir: String, v: Long,
                       column: String): (Double, Boolean) =
    Ndv.estimate(ndvSketchAt(spark, dir, v, column))

  /** The version's MERGED KMV sketch for `column` (the union of its
    * files' recorded sketches; files without one — legacy, or the
    * column wasn't declared — are sketched on the fly, the
    * verification path). Feed two tables' sketches to
    * [[Ndv.intersectEstimate]] for join-overlap planning. */
  def ndvSketchAt(spark: SparkSession, dir: String, v: Long,
                  column: String): Array[Long] = {
    val m = committedManifest(spark, dir, v)
    val phys = m.toPhysical.getOrElse(column, column)
    val recorded = m.ndvSketches(phys)
    val (have, missing) = m.files.partition(recorded.contains)
    val extra =
      if (missing.isEmpty) Seq.empty[Array[Long]]
      else Ndv.fileSketches(
        spark.read.parquet(missing.map(r => s"$dir/$r"): _*), phys)
        .values.toSeq
    Ndv.merge(have.map(recorded) ++ extra)
  }

  /** The data-file rel path of one dv/dvf carry line (the LAST field
    * either way) — what kept-file carry filters match on. */
  private[operators] def dvRelOf(line: String): String =
    if (line.startsWith("dvf:")) line.split(":", 4).last
    else line.split(":", 3).last

  /** The manifest-relative path of a stat2 OR stat3 line — the path
    * is always the LAST field and never contains ':' (the line
    * grammar), so one extractor covers both families the shared
    * [[Manifest.stat2Lines]] carry surface mixes. */
  private[operators] def statRelOf(line: String): String =
    line.substring(line.lastIndexOf(':') + 1)

  /** Immutable sidecar payloads cache (a sidecar is written once and
    * never modified; rewrites drop the reference and vacuum reclaims
    * the file). */
  private val dvSidecarCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()

  /** Read ONE sidecar vector (driver-side, through the immutable
    * cache) — [[resolveDv]]'s per-file body, also the small-debt
    * materialization path in [[readFiles]]. */
  private def readSidecar(spark: SparkSession, dir: String,
                          sidecarRel: String): Array[Long] =
    dvSidecarCache.computeIfAbsent(s"$dir/$sidecarRel", { abs =>
      val p = new org.apache.hadoop.fs.Path(abs)
      val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val in = f.open(p)
      try {
        val len = f.getFileStatus(p).getLen.toInt
        val bytes = new Array[Byte](len)
        in.readFully(bytes)
        Dv.decodeBytes(bytes)
      } finally in.close()
    })

  /** Resolve a manifest's FULL deletion vectors: inline `#dv` lines
    * plus `#dvf` sidecar files (read once per sidecar per process —
    * they are immutable). The planning-only surfaces ([[rowCountAt]])
    * use the line-carried counts instead and never open a sidecar;
    * the READ path ([[readAt]]) passes the refs through to
    * [[readFiles]] so deep debt can stay OFF the driver entirely. */
  private[graft] def resolveDv(spark: SparkSession, dir: String,
                               m: Manifest): Map[String, Array[Long]] = {
    val refs = m.dvRefs
    if (refs.isEmpty) m.dv
    else m.dv ++ refs.map { case (rel, (_, sc)) =>
      rel -> readSidecar(spark, dir, sc)
    }
  }

  /** Stage one sidecar deletion-vector file under `dir/dv/` (written
    * BEFORE the manifest commit like data files — a crash leaves an
    * orphan the vacuum sweeps) and return its manifest-relative path. */
  private def writeDvSidecar(spark: SparkSession, dir: String,
                             positions: Array[Long]): String = {
    val rel = s"dv/${java.util.UUID.randomUUID().toString.take(8)}.dvs"
    val p = new org.apache.hadoop.fs.Path(s"$dir/$rel")
    val f = fs(spark, dir)
    f.mkdirs(p.getParent)
    val out = f.create(p, false)
    try out.write(Dv.encodeBytes(positions)) finally out.close()
    dvSidecarCache.put(s"$dir/$rel", positions.distinct.sorted)
    rel
  }

  /** The version's DEAD-row count, manifest-only: inline vector
    * lengths plus the sidecar lines' carried counts — never opens a
    * sidecar (the `graft_history` / planning surface). */
  def deadRowsAt(spark: SparkSession, dir: String, v: Long): Long = {
    val m = committedManifest(spark, dir, v)
    m.dv.valuesIterator.map(_.length.toLong).sum +
      m.dvRefs.valuesIterator.map(_._1).sum
  }

  /** The batch-ledger header riding on version `v`, if any — carried
    * headers included (a compact/metadata commit reports the id it
    * carried forward). Inspection surface for `graft_history`. */
  def batchAt(spark: SparkSession, dir: String, v: Long): Option[Long] =
    committedManifest(spark, dir, v).metaValues("batch").headOption
      .map(_.toLong)

  /** The deletion vectors of version `v` — manifest-relative file →
    * sorted dead row positions. Inspection surface for gates/ops
    * (how much merge-on-read debt a table carries; [[compact]] is
    * the reclaimer). */
  def deletionVectorsAt(spark: SparkSession, dir: String,
                        v: Long): Map[String, Array[Long]] =
    resolveDv(spark, dir, committedManifest(spark, dir, v))

  /** Drop every version below `keepFrom` and delete the data files
    * no kept version references. Returns (manifests dropped, data
    * files deleted, data files kept). This is the ONLY operation
    * that deletes data — everything else only adds.
    *
    * `retainMs` is the concurrent-writer guard: a racing writer's
    * staged-but-uncommitted files are unreferenced by ANY manifest,
    * so an unguarded sweep would delete them and the writer's
    * subsequent commit would publish an unreadable version. Files
    * younger than the window are therefore skipped (they count as
    * kept); pass 0 ONLY under exclusive access (no concurrent
    * writers — e.g. single-writer maintenance jobs and tests).
    *
    * Transactions: tombstone manifests (aborted txns) below
    * `keepFrom` are dropped like any other, which unreferences their
    * staged files for the sweep — how an aborted transaction's space
    * is reclaimed. Kept tombstones' files stay protected: an
    * in-flight txn at the top may still commit. */
  def vacuum(spark: SparkSession, dir: String, keepFrom: Long,
             retainMs: Long = DefaultRetainMs): (Long, Long, Long) = {
    require(versions(spark, dir).contains(keepFrom),
      s"keepFrom=$keepFrom is not a committed version of $dir")
    val (drop, keep) = rawVersions(spark, dir).partition(_ < keepFrom)
    val referenced = keep.flatMap(v => manifest(spark, dir, v).files).toSet
    val f = fs(spark, dir)
    // every data file on disk, relative, with its modification time
    val dataRoot = new org.apache.hadoop.fs.Path(dir, "data")
    def walk(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] =
      if (!f.exists(p)) Seq.empty
      else f.listStatus(p).toSeq.flatMap { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (st.getPath.getName.endsWith(".parquet")) Seq(st)
        else Seq.empty
      }
    val prefix = new org.apache.hadoop.fs.Path(dir).toUri.getPath.stripSuffix("/")
    val cutoff = System.currentTimeMillis() - retainMs
    val all = walk(dataRoot).map { st =>
      val abs = st.getPath.toUri.getPath
      (abs.stripPrefix(prefix).stripPrefix("/"), st.getModificationTime)
    }
    val orphans = all.filter { case (rel, mod) =>
      !referenced(rel) && mod <= cutoff
    }
    orphans.foreach { case (rel, _) =>
      f.delete(new org.apache.hadoop.fs.Path(s"$dir/$rel"), false)
    }
    // DELETION-VECTOR sidecars reclaim the same way: a sidecar is
    // referenced while any kept manifest carries its #dvf line; a
    // rewrite/re-grow drops the reference and the file becomes an
    // orphan (same retainMs guard — an in-flight writer's
    // just-written sidecar is protected)
    val dvRoot = new org.apache.hadoop.fs.Path(dir, "dv")
    val referencedDv = keep.flatMap(v =>
      manifest(spark, dir, v).dvRefs.valuesIterator.map(_._2)).toSet
    val dvOrphans =
      if (!f.exists(dvRoot)) Seq.empty
      else f.listStatus(dvRoot).toSeq.filter(!_.isDirectory).flatMap { st =>
        val rel = "dv/" + st.getPath.getName
        if (!referencedDv(rel) && st.getModificationTime <= cutoff) Some(rel)
        else None
      }
    dvOrphans.foreach { rel =>
      f.delete(new org.apache.hadoop.fs.Path(s"$dir/$rel"), false)
      dvSidecarCache.remove(s"$dir/$rel")
    }
    drop.foreach { v =>
      f.delete(manifestPath(dir, v), false)
      // a dropped version's manifest must not survive in the caches —
      // readers should see the same "does not exist" the disk says
      manifestCache.remove(cacheKey(dir, v))
      committedCache.remove(cacheKey(dir, v))
    }
    dirListCache.remove(dir)
    // a checkpoint may still list dropped versions as committed —
    // refresh it in place (cheap here: this process's caches are warm)
    if (f.exists(checkpointPath(dir))) checkpoint(spark, dir)
    (drop.size.toLong, (orphans.size + dvOrphans.size).toLong,
      (all.size - orphans.size).toLong)
  }

  // -----------------------------------------------------------------
  // Multi-table transactions
  // -----------------------------------------------------------------

  /** Begin a MULTI-TABLE transaction — one atomic commit spanning N
    * snapshot tables (the fact+dims publish every warehouse load
    * needs: either every table advances or none does).
    *
    * Protocol — the create-exclusive claim GENERALIZED: each member
    * write stages its data files and claims its table's next version
    * normally, but the manifest carries `#txn:<recordPath>` — such a
    * manifest is PROVISIONAL: readers treat it as committed only
    * once the shared record file says `commit`. [[Txn.commit]] is
    * ONE create-exclusive write of that record — the single atomic
    * point at which every member version becomes visible at once.
    * A crash before it leaves every table at its old version (the
    * provisional manifests are invisible tombstones); there is no
    * state in between, per table or across tables.
    *
    * Arbitration / liveness: the record is first-writer-wins with
    * `commit` or `abort` content. A plain writer that finds an
    * UNDECIDED transactional manifest at its table's top force-
    * aborts it (writes `abort`) before claiming above — so a crashed
    * transaction never write-locks its tables, and a transaction
    * racing a plain writer fails cleanly at [[Txn.commit]] instead
    * of publishing a half-visible state. Tombstoned version numbers
    * are never reused (claims go above them); their staged files are
    * reclaimed once [[vacuum]]'s `keepFrom` passes the tombstone.
    *
    * Scale: zero new I/O classes — the record check is one small-
    * file existence/read per TRANSACTIONAL manifest encountered
    * (plain manifests pay nothing), and commit cost is one file
    * create regardless of member count or data volume.
    *
    * @param recordPath the shared record location (any FS path the
    *   members can all reach, e.g. a `_txns/<id>` sibling). Must be
    *   unused — one record per transaction. */
  def beginTxn(spark: SparkSession, recordPath: String): Txn = {
    require(txnState(spark, recordPath).isEmpty,
      s"transaction record $recordPath already exists — records are one-shot")
    new Txn(spark, recordPath)
  }

  /** A handle for one in-flight multi-table transaction; see
    * [[beginTxn]] for the protocol. NOT thread-safe (one coordinator
    * drives a txn). */
  final class Txn private[Snapshots] (spark: SparkSession, val recordPath: String) {
    private val txnMeta = Seq(s"txn:$recordPath")
    private val claimed = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    private var resolved = false

    private def claim(dir: String, v: Long): Long = {
      require(!resolved, "transaction already resolved")
      claimed.put(dir, v)
      v
    }

    /** Members claimed so far: table dir → provisional version. */
    def claims: Seq[(String, Long)] = claimed.toSeq

    /** Stage + provisionally claim a FIRST version (see [[Snapshots.publish]]). */
    def publish(df: DataFrame, dir: String, bucketCol: String,
                sortCols: Seq[String], blockSize: Long = 128L * 1024 * 1024,
                numTasks: Int = 32): Long = {
      require(!claimed.contains(dir), s"transaction already claimed $dir")
      claim(dir, publishImpl(df, dir, bucketCol, sortCols, blockSize,
        numTasks, txnMeta))
    }

    /** Stage + provisionally claim an incremental load (see [[Snapshots.append]]). */
    def append(df: DataFrame, dir: String, bucketCol: String,
               sortCols: Seq[String], blockSize: Long = 128L * 1024 * 1024,
               numTasks: Int = 32): Long = {
      require(!claimed.contains(dir), s"transaction already claimed $dir")
      claim(dir, appendImpl(df, dir, bucketCol, sortCols, blockSize,
        numTasks, txnMeta))
    }

    /** Stage + provisionally claim an upsert (see [[Snapshots.merge]]). */
    def merge(updates: DataFrame, dir: String, bucketCol: String,
              keyCols: Seq[String], sortCols: Seq[String],
              blockSize: Long = 128L * 1024 * 1024,
              numTasks: Int = 32): Long = {
      require(!claimed.contains(dir), s"transaction already claimed $dir")
      claim(dir, Snapshots.merge(updates, dir, bucketCol, keyCols, sortCols,
        blockSize, numTasks, meta = txnMeta))
    }

    /** Stage + provisionally claim a delete (see [[Snapshots.delete]]) —
      * the cross-table erasure shape: delete a key from N tables, all
      * visible at one record write. */
    def delete(keys: DataFrame, dir: String, bucketCol: String,
               keyCols: Seq[String], sortCols: Seq[String],
               blockSize: Long = 128L * 1024 * 1024,
               numTasks: Int = 32): Long = {
      require(!claimed.contains(dir), s"transaction already claimed $dir")
      claim(dir, Snapshots.delete(keys, dir, bucketCol, keyCols, sortCols,
        blockSize, numTasks, meta = txnMeta))
    }

    /** THE atomic point: win the record with `commit` and every
      * member version becomes visible at once. Throws (and no table
      * changes — the manifests stay tombstones) if a concurrent
      * writer force-aborted this transaction first. Idempotent if
      * this transaction already committed. */
    def commit(): Unit = {
      require(claimed.nonEmpty, "transaction has no members to commit")
      resolved = true
      if (!writeTxnRecord(spark, recordPath, commit = true) &&
          !txnState(spark, recordPath).contains(true))
        throw new IllegalStateException(
          s"transaction $recordPath was aborted by a concurrent writer — " +
            "no member table changed (provisional versions stay invisible)")
    }

    /** Explicitly abandon: write `abort` (first-writer-wins; a no-op
      * if something already resolved the record). Throws if the
      * record already says `commit` — a committed txn cannot be
      * taken back. */
    def abort(): Unit = {
      resolved = true
      writeTxnRecord(spark, recordPath, commit = false)
      if (txnState(spark, recordPath).contains(true))
        throw new IllegalStateException(
          s"transaction $recordPath already committed — cannot abort")
    }
  }
}
