package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K-MINIMUM-VALUES distinct-count sketches — the mergeable NDV
  * statistic the manifest carries per FILE (format 2.1 `#ndv` lines)
  * so JOIN PLANNING can read cardinalities without scanning data
  * (choose broadcast vs shuffle, spot a low-NDV skew key before it
  * burns a stage — the Iceberg-puffin/Delta-stats use case).
  *
  * Why KMV over HLL here: same mergeability and similar accuracy per
  * byte at this k, but an EXACTNESS property that makes it
  * spec-pinnable — the merge of two KMV sketches is EXACTLY the
  * sketch of the union (the k smallest distinct hashes of A ∪ B are
  * a deterministic function of the k smallest of A and of B), so
  * "version NDV = merge of its files' sketches" has no drift to
  * argue about, and a sketch with FEWER than k values is an EXACT
  * distinct count. Hashes are xxhash64 (Spark-native, stable), so
  * sketches are deterministic and engine-reproducible.
  *
  * Incrementality rides the file-immutability the whole format rests
  * on: a file's sketch is computed ONCE when the file is staged
  * (cost ∝ that commit's new data — one distinct + one windowed
  * top-k over it) and carried forward like the min/max stats;
  * merges/deletes re-sketch only the rewritten buckets, so the
  * version-level estimate tracks row removal too. Estimator:
  * (k-1) / fraction-of-hash-space-below-the-kth-value; relative
  * error ~ 1/sqrt(k-2) (≈ 9% at the default k=128).
  */
object Ndv {

  /** Default sketch size: 128 hashes = 1 KiB raw per file per column,
    * ~9% standard error, exact below 128 distinct values. */
  val K = 128

  /** Per-file KMV sketches for `column` over `paths`, computed with
    * ONE distinct pass + ONE windowed top-k (both ∝ the listed data,
    * never the table): path → ascending k smallest distinct
    * xxhash64 values. Null values are ignored (NDV counts values). */
  def fileSketches(df: DataFrame, column: String, k: Int = K): Map[String, Array[Long]] =
    fileSketchesMulti(df, Seq(column), k).map { case ((_, f), s) => f -> s }

  /** [[fileSketches]] for SEVERAL columns in ONE pass over the data
    * (guide §1.2: don't re-read what one pass can carry) — a staging
    * commit with N declared ndv columns would otherwise scan its new
    * files N times. Hashes per (file, column) are bit-identical to
    * the per-column path: each column's values hash through the same
    * `xxhash64`, nulls dropped per column, distinct + windowed top-k
    * now keyed by (file, column). Returns (column, path) → sketch. */
  def fileSketchesMulti(df: DataFrame, columns: Seq[String],
                        k: Int = K): Map[(String, String), Array[Long]] = {
    require(columns.nonEmpty, "fileSketchesMulti: no columns")
    val stacked = df
      .select(input_file_name().as("__f"), explode(array(columns.map(c =>
        struct(lit(c).as("__c"), col(c).isNotNull.as("__n"),
          xxhash64(col(c)).as("__h"))): _*)).as("__e"))
      .filter(col("__e.__n"))
      .select(col("__f"), col("__e.__c").as("__c"), col("__e.__h").as("__h"))
      .distinct()
    val w = Window.partitionBy("__f", "__c").orderBy("__h")
    stacked.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy("__f", "__c")
      .agg(sort_array(collect_list(col("__h"))).as("__kmv"))
      .collect()
      .map(r => (r.getString(1), r.getString(0)) -> r.getSeq[Long](2).toArray)
      .toMap
  }

  /** Merge sketches: the k smallest distinct hashes of the union —
    * EXACTLY the sketch that would have been computed over the
    * concatenated data (the property the spec pins). */
  def merge(sketches: Seq[Array[Long]], k: Int = K): Array[Long] =
    sketches.flatten.distinct.sorted.take(k).toArray

  /** Distinct-count estimate from a sketch: EXACT when the sketch
    * holds fewer than k hashes (every distinct value is present),
    * else (k-1) / (fraction of the 64-bit hash space at or below the
    * k-th smallest). Returns (estimate, exact?). */
  def estimate(sketch: Array[Long], k: Int = K): (Double, Boolean) = {
    if (sketch.length < k) (sketch.length.toDouble, true)
    else {
      val kth = sketch(k - 1)
      // unsigned position of kth in [0, 2^64), as a fraction
      val frac = (kth.toDouble - Long.MinValue.toDouble) / math.pow(2.0, 64)
      ((k - 1).toDouble / math.max(frac, java.lang.Double.MIN_NORMAL), false)
    }
  }

  /** Wire encoding for a manifest meta line: big-endian longs,
    * base64 (colon- and newline-free). */
  def encode(sketch: Array[Long]): String = {
    val bb = java.nio.ByteBuffer.allocate(sketch.length * 8)
    sketch.foreach(bb.putLong)
    java.util.Base64.getEncoder.encodeToString(bb.array())
  }

  def decode(s: String): Array[Long] = {
    val bytes = java.util.Base64.getDecoder.decode(s)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  /** The planning decision the sketch exists for: given an estimated
    * row count and NDV for a join key side, is it broadcast-safe /
    * skew-prone? Pure arithmetic over manifest numbers — no scan. */
  def skewRisk(rows: Long, ndv: Double): Double =
    if (ndv <= 0) Double.PositiveInfinity else rows / ndv

  /** Estimated DISTINCT-VALUE INTERSECTION |A ∩ B| of two sketched
    * sets — the standard KMV set-operation estimator (Beyer et al.,
    * SIGMOD 2007): take the union's k smallest hashes, count how many
    * appear in BOTH input sketches (a Jaccard sample over the union),
    * and scale by the union's cardinality estimate. EXACT when both
    * sides sit below k (every distinct hash is present). The
    * join-cardinality primitive: overlapping key count with zero
    * data opens. */
  def intersectEstimate(a: Array[Long], b: Array[Long], k: Int = K): Double = {
    val u = merge(Seq(a, b), k)
    if (u.isEmpty) return 0.0
    val aSet = a.toSet
    val bSet = b.toSet
    val j = u.count(h => aSet(h) && bSet(h))
    val (uEst, _) = estimate(u, k)
    uEst * j.toDouble / u.length
  }
}
