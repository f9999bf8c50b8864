package graft.operators

/** DELETION-VECTOR position codec — the payload of the manifest's
  * `#dv:<b64>:<rel>` lines (merge-on-read row deletes, the public
  * Delta deletion-vectors / Iceberg position-deletes shape): a file's
  * dead rows are recorded as their within-file ROW POSITIONS
  * (parquet row order, `_metadata.row_index`), encoded as
  * delta-varints over the sorted positions and base64'd so they ride
  * in one colon-free manifest meta field.
  *
  * Positions-not-keys because positions are TYPE-AGNOSTIC (any key
  * shape, any column mix deletes the same way) and O(1) to apply per
  * row at read time. Delta-varint because GDPR-style deletes are
  * scattered-but-clustered: ~1.2 bytes/position for dense runs,
  * ≤10 bytes worst case — a 10k-row erasure is a ~15 KB manifest
  * line. Inline-in-the-manifest is the documented size trade: the
  * write path refuses vectors past [[MaxInlinePositions]] (at that
  * point a copy-on-write [[Snapshots.delete]] rewrite is cheaper
  * anyway — Delta makes the same inline-vs-sidecar split).
  */
object Dv {

  /** Inline manifest-line budget: [[encode]] (the `#dv` line form)
    * refuses past this — a megabyte meta line carried on every future
    * manifest is the wrong shape. Larger vectors go to a SIDECAR file
    * (`#dvf` lines — [[Snapshots.deleteVectored]] switches at
    * [[InlineMax]]); the bytes form ([[encodeBytes]]) is unbounded. */
  val MaxInlinePositions: Int = 1000000

  /** The write path's inline-vs-sidecar switch: vectors of at most
    * this many positions ride inline in the manifest (≤ ~8 KB
    * encoded); larger ones land in one immutable sidecar file and the
    * manifest carries only `count:path` (the Delta inline-vs-file DV
    * split). */
  val InlineMax: Int = 4096

  /** Delta-varint bytes of sorted-deduped non-negative positions —
    * the sidecar file format, and the payload behind [[encode]]. */
  def encodeBytes(positions: Array[Long]): Array[Byte] = {
    val sorted = positions.distinct.sorted
    require(sorted.isEmpty || sorted.head >= 0,
      s"row positions are non-negative (got ${sorted.headOption})")
    val out = new java.io.ByteArrayOutputStream(sorted.length * 2)
    var prev = -1L
    var i = 0
    while (i < sorted.length) {
      var d = sorted(i) - prev // >= 1: strictly increasing
      prev = sorted(i)
      while ((d & ~0x7fL) != 0) {
        out.write(((d & 0x7f) | 0x80).toInt)
        d >>>= 7
      }
      out.write(d.toInt)
      i += 1
    }
    out.toByteArray
  }

  /** Decode delta-varint bytes to the sorted position array. */
  def decodeBytes(bytes: Array[Byte]): Array[Long] = {
    val buf = new scala.collection.mutable.ArrayBuffer[Long](bytes.length)
    var i = 0
    var prev = -1L
    while (i < bytes.length) {
      var shift = 0
      var d = 0L
      var b = 0
      do {
        b = bytes(i) & 0xff
        i += 1
        d |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      prev += d
      buf += prev
    }
    buf.toArray
  }

  /** Encode sorted-deduped non-negative positions as base64 delta
    * varints (the inline `#dv` line form). Idempotent under
    * re-encode(decode(_)). */
  def encode(positions: Array[Long]): String = {
    require(positions.distinct.length <= MaxInlinePositions,
      s"deletion vector of ${positions.distinct.length} positions exceeds " +
        s"the inline budget ($MaxInlinePositions) — use a sidecar")
    java.util.Base64.getEncoder.encodeToString(encodeBytes(positions))
  }

  /** Decode the inline form to the sorted position array. */
  def decode(s: String): Array[Long] =
    decodeBytes(java.util.Base64.getDecoder.decode(s))

  /** Merge two position sets (the grow-only DV union). */
  def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    (a ++ b).distinct.sorted
}
