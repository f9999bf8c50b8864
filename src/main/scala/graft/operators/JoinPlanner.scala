package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MANIFEST-DRIVEN JOIN STRATEGY CHOOSER — the r10-backlog item that
  * closes the statistics loop: the manifest already records per-file
  * byte sizes (`#fsize`), row counts (`#stat`/`#stat2`) and KMV NDV
  * sketches (`#ndv`); this turns them into the three decisions a
  * 100 TB join actually needs, with ZERO data opens (reference scope:
  * pycart main.py:118/216 — `places_df.merge(sub_pop, on=code_type)` /
  * `val.merge(geo, on='ISO')`, pandas joins that single-node never has
  * to plan; at cluster scale the same step needs a STRATEGY, decided
  * here from table statistics instead of defaulted):
  *
  *  - BROADCAST when a side's manifest byte size fits the threshold
  *    (Spark's own autoBroadcastJoinThreshold discipline, but decided
  *    from TABLE stats rather than Spark's often-missing relation
  *    estimates — a snapshot read is a file-list relation whose plan
  *    size Spark can only guess);
  *  - SALTED when both sides are big and a side's average key
  *    multiplicity (rows/NDV — [[Ndv.skewRisk]]) crosses the skew
  *    threshold: the skewed side salts, the other explodes
  *    ([[Scale.saltedJoin]]) — the regime where a plain shuffle join
  *    funnels a hot key through one reducer;
  *  - plain SHUFFLE otherwise (AQE handles residual runtime skew).
  *
  * [[estimateJoinRows]] adds the planning number optimizers want
  * next: expected output cardinality = (overlapping distinct keys,
  * from the two sketches' KMV intersection — [[Ndv.intersectEstimate]])
  * × each side's average multiplicity, under the uniform-multiplicity
  * assumption (stated; a per-key histogram would refine it).
  *
  * Everything here is driver-side arithmetic over two manifests —
  * safe to call per query. Missing stats degrade gracefully: no
  * sizes → filesystem stat fallback ([[Snapshots.sizeAt]]); no row
  * counts or sketches → the chooser returns SHUFFLE (never guesses
  * skew it cannot see).
  */
object JoinPlanner {

  /** One side's manifest-only planning numbers. */
  final case class SideStats(dir: String, version: Long, bytes: Long,
                             rows: Option[Long], ndv: Option[Double],
                             mult: Option[Double])

  /** The decision, with the numbers that drove it (for explain/gates). */
  final case class Decision(strategy: String, buildSide: String,
                            saltFactor: Int, left: SideStats,
                            right: SideStats)

  /** The version's merged KMV sketch for a physical column, from the
    * MANIFEST alone — and only when EVERY listed file has a recorded
    * sketch. A partial sketch set (files written before `ndvCols` was
    * declared, legacy manifests) would UNDERESTIMATE NDV and inflate
    * the rows/NDV multiplicity — flipping decisions to SALTED on skew
    * the planner cannot actually see — so partial degrades to None
    * (→ shuffle), honoring both the "never guesses skew" stance and
    * the zero-data-opens contract (no on-the-fly sketching here). */
  private def recordedSketch(m: Snapshots.Manifest,
                             phys: String): Option[Array[Long]] = {
    if (!m.ndvCols.contains(phys)) None
    else {
      val sketches = m.ndvSketches(phys) // parse the lines ONCE
      if (m.files.forall(sketches.contains))
        Some(Ndv.merge(m.files.map(sketches)))
      else None // partial stats: no estimate beats a skewed one
    }
  }

  /** Collect one side's stats from its latest (or given) manifest. */
  def sideStats(spark: SparkSession, dir: String, key: String,
                version: Option[Long] = None): SideStats = {
    val v = version.getOrElse(Snapshots.latest(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"$dir has no snapshots")))
    val bytes = Snapshots.sizeAt(spark, dir, v)
    val rows = Snapshots.rowCountAt(spark, dir, v)
    val m = Snapshots.committedManifest(spark, dir, v)
    val phys = m.toPhysical.getOrElse(key, key)
    val ndv = recordedSketch(m, phys).map(sk => Ndv.estimate(sk)._1)
    val mult = for (r <- rows; n <- ndv) yield Ndv.skewRisk(r, n)
    SideStats(dir, v, bytes, rows, ndv, mult)
  }

  /** Salt DOSE derived from the measured skew instead of a constant:
    * spreading a key of multiplicity `mult` over F reducers leaves
    * `mult / F` rows per reducer per key, so F = the next power of
    * two ≥ `mult / targetMult` brings every hot key back under the
    * per-reducer target the skew threshold itself defines. `floor`
    * keeps the historical ×16 minimum; 256 caps the explode side's
    * blow-up (the other side replicates ×F). A constant dose would
    * re-create the hot-reducer failure one order of magnitude later
    * — a 3,000-multiplicity key over a fixed ×16 is still ~190×
    * average load on its reducer. */
  private[graft] def saltDose(mult: Double, targetMult: Double,
                              floor: Int): Int = {
    val need = math.ceil(mult / math.max(targetMult, 1.0))
    val pow2 = java.lang.Long.highestOneBit(
      math.max(1L, math.min(need.toLong, 256L)) * 2 - 1).toInt
    math.min(256, math.max(floor, pow2))
  }

  /** Choose the strategy for an equi-join of two snapshot tables on
    * `key`. `broadcastBytes` mirrors Spark's threshold default
    * (10 MiB) — but manifest byte sizes are AT-REST (snappy parquet
    * commonly inflates 3–10× decompressed in executor memory, the
    * same reason Spark has `spark.sql.sources.fileCompressionFactor`),
    * so the comparison applies `compressionFactor` (default 4×,
    * documented mid-band) to the manifest size first: a "10 MiB"
    * parquet side is NOT a 10 MiB broadcast build. `skewMult` is the
    * average-multiplicity bound above which a shuffle join is
    * presumed hot-keyed; `saltFactor` is the salt FLOOR — the actual
    * dose scales with the measured multiplicity ([[saltDose]]). */
  def plan(spark: SparkSession, leftDir: String, rightDir: String,
           key: String, broadcastBytes: Long = 10L * 1024 * 1024,
           skewMult: Double = 64.0, saltFactor: Int = 16,
           leftVersion: Option[Long] = None,
           rightVersion: Option[Long] = None,
           compressionFactor: Double = 4.0): Decision = {
    require(compressionFactor >= 1.0,
      s"compressionFactor inflates at-rest bytes (got $compressionFactor)")
    val l = sideStats(spark, leftDir, key, leftVersion)
    val r = sideStats(spark, rightDir, key, rightVersion)
    if (math.min(l.bytes, r.bytes) * compressionFactor <= broadcastBytes)
      Decision("broadcast", if (r.bytes <= l.bytes) "right" else "left",
        1, l, r)
    else {
      val lm = l.mult.getOrElse(0.0)
      val rm = r.mult.getOrElse(0.0)
      if (math.max(lm, rm) >= skewMult)
        // the skewed (hot-multiplicity) side salts; the other explodes
        Decision("salted", if (lm >= rm) "left" else "right",
          saltDose(math.max(lm, rm), skewMult, saltFactor), l, r)
      else Decision("shuffle", "none", 1, l, r)
    }
  }

  /** Execute a [[Decision]] over the two sides' frames (read them with
    * [[Snapshots.readAt]] at the decision's versions for consistency).
    * Inner equi-join on `key`; result content is strategy-independent
    * — the strategy only moves bytes differently. */
  def execute(left: DataFrame, right: DataFrame, key: String,
              d: Decision): DataFrame = d.strategy match {
    case "broadcast" =>
      if (d.buildSide == "right") left.join(broadcast(right), key)
      else broadcast(left).join(right, key)
    case "salted" =>
      if (d.buildSide == "left")
        Scale.saltedJoin(left, right, key, d.saltFactor)
      else Scale.saltedJoin(right, left, key, d.saltFactor)
    case _ => left.join(right, key)
  }

  /** [[plan]] + read + [[execute]] in one call, reading both sides at
    * the planned versions. */
  def join(spark: SparkSession, leftDir: String, rightDir: String,
           key: String, broadcastBytes: Long = 10L * 1024 * 1024,
           skewMult: Double = 64.0, saltFactor: Int = 16): DataFrame = {
    val d = plan(spark, leftDir, rightDir, key, broadcastBytes, skewMult,
      saltFactor)
    execute(Snapshots.readAt(spark, leftDir, d.left.version),
      Snapshots.readAt(spark, rightDir, d.right.version), key, d)
  }

  /** Pre-size a shuffle or staged write off manifest numbers — the
    * piece AQE supplies only at RUNTIME (after a wasted
    * mis-partitioned exchange): tasks = ceil(rows / rowsPerTask),
    * clamped to [1, maxTasks]. Feed it [[Snapshots.rowCountAt]] for a
    * table rewrite, or [[estimateJoinRows]] for a join's output side
    * (e.g. the `numTasks` of a downstream
    * [[Snapshots.publish]]/[[Snapshots.merge]]). */
  def suggestTasks(rows: Long, rowsPerTask: Long = 4000000L,
                   maxTasks: Int = 2048): Int = {
    require(rowsPerTask > 0 && maxTasks >= 1,
      s"need positive sizing (rowsPerTask=$rowsPerTask, maxTasks=$maxTasks)")
    val t = (rows + rowsPerTask - 1) / rowsPerTask
    math.max(1L, math.min(t, maxTasks.toLong)).toInt
  }

  /** BYTE-based task pre-sizing — preferred over [[suggestTasks]]
    * whenever the manifest records `#fsize` sums ([[Snapshots
    * .sizeAt]]): rows are a terrible proxy for bytes (a documents
    * table at 10 KB/row vs a keys table at 16 B/row differ ~600× in
    * bytes per task at equal row count), and the thing a task
    * actually has to fit is BYTES in executor memory. Default target
    * 256 MB at-rest per task (the 128 MB-block × compression
    * convention); same [1, maxTasks] clamp. */
  def suggestTasksBytes(bytes: Long, bytesPerTask: Long = 256L * 1024 * 1024,
                        maxTasks: Int = 2048): Int = {
    require(bytesPerTask > 0 && maxTasks >= 1,
      s"need positive sizing (bytesPerTask=$bytesPerTask, maxTasks=$maxTasks)")
    val t = (bytes + bytesPerTask - 1) / bytesPerTask
    math.max(1L, math.min(t, maxTasks.toLong)).toInt
  }

  /** [[suggestTasksBytes]] off a version's manifest size when `#fsize`
    * lines exist, [[suggestTasks]] off its row count otherwise — the
    * "prefer bytes when sizes are recorded" dispatch in one call. */
  def suggestTasksFor(spark: SparkSession, dir: String, version: Long,
                      bytesPerTask: Long = 256L * 1024 * 1024,
                      rowsPerTask: Long = 4000000L,
                      maxTasks: Int = 2048): Int = {
    val m = Snapshots.committedManifest(spark, dir, version)
    if (m.files.forall(m.fileSizes.contains))
      suggestTasksBytes(Snapshots.sizeAt(spark, dir, version), bytesPerTask,
        maxTasks)
    else Snapshots.rowCountAt(spark, dir, version) match {
      case Some(rows) => suggestTasks(rows, rowsPerTask, maxTasks)
      case None => math.min(maxTasks, 32) // stats-less: the write default
    }
  }

  /** Expected inner equi-join output rows, manifest-only: overlapping
    * distinct keys (KMV intersection of the two sides' RECORDED
    * sketches — the same recorded-only sketches [[sideStats]] prices
    * multiplicity from, so the two numbers can never disagree about
    * what the manifest knows) × each side's average key multiplicity.
    * Uniform-multiplicity assumption stated in the object doc. None
    * when either side lacks declared row counts or a COMPLETE
    * recorded sketch set for `key` (partial sketches never estimate;
    * on-the-fly sketching would open data, against the zero-data-opens
    * planning contract — [[Snapshots.ndvSketchAt]] remains the
    * verification path, not the planner's). */
  def estimateJoinRows(spark: SparkSession, leftDir: String,
                       rightDir: String, key: String,
                       leftVersion: Option[Long] = None,
                       rightVersion: Option[Long] = None): Option[Double] = {
    val lv = leftVersion.getOrElse(Snapshots.latest(spark, leftDir).get)
    val rv = rightVersion.getOrElse(Snapshots.latest(spark, rightDir).get)
    val l = sideStats(spark, leftDir, key, Some(lv))
    val r = sideStats(spark, rightDir, key, Some(rv))
    val lm0 = Snapshots.committedManifest(spark, leftDir, lv)
    val rm0 = Snapshots.committedManifest(spark, rightDir, rv)
    for {
      lm <- l.mult; rm <- r.mult
      ls <- recordedSketch(lm0, lm0.toPhysical.getOrElse(key, key))
      rs <- recordedSketch(rm0, rm0.toPhysical.getOrElse(key, key))
    } yield Ndv.intersectEstimate(ls, rs) * lm * rm
  }
}
