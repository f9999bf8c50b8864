package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** WebDataset-style tar-shard export — the container format
  * large-scale training pipelines actually ship corpora in (one
  * POSIX ustar archive per shard, entries iterated sequentially by
  * the data loader; the public WebDataset convention). Beyond-
  * reference component motivated by SURVEY §2.E's training-data ops:
  * after curation/packing, the corpus leaves Spark as size-budgeted
  * shards.
  *
  * Two layers, split exactly like q46/binSlices:
  *
  *  - ASSIGNMENT (gated, q143): pure integer arithmetic. An entry
  *    costs `512 + ceil(bytes/512)·512` (header block + payload
  *    rounded to whole 512-byte blocks); entries order by id within
  *    stream; `start_bytes` is the running sum BEFORE the entry
  *    (computed by [[Sampling.packChunks]]'s banded two-phase prefix
  *    sum — no per-stream single-reducer window at scale);
  *    `shard = start_bytes div budget`. Entries NEVER straddle
  *    shards (unlike q46's token bins — a tar entry is atomic), so
  *    the rule trades perfect fill for parallelism: a shard's
  *    payload is at most `budget + max_entry − 1` bytes (bounded
  *    overshoot, spec-pinned) and at least one entry.
  *  - BYTES (spec'd): [[shardBytes]] renders a shard's entries as a
  *    deterministic POSIX ustar stream (fixed mtime 0, uid/gid 0,
  *    mode 0644, NUL-padded fields, the checksum-over-spaces rule,
  *    two 512-zero trailer blocks); [[readEntries]] parses it back
  *    verifying every checksum. [[writeShards]] runs one task per
  *    (stream, shard) group — parallelism = shard count, memory =
  *    one shard's bytes (the documented buffer contract; budget is
  *    the knob).
  *
  * Scale shape: assignment is the q46 machinery (vocabulary-free,
  * two bounded shuffles + banded windows); writing shuffles each
  * entry once to its (stream, shard) reducer — the minimum possible
  * movement for a format whose entries are physically concatenated.
  */
object TarShards {

  val BlockSize = 512

  /** Tar entry cost: one header block + payload rounded up to whole
    * blocks. */
  def entryBytes(payloadBytes: Long): Long =
    BlockSize + ((payloadBytes + BlockSize - 1) / BlockSize) * BlockSize

  /** Shard assignment (the gated arithmetic): per stream, entries in
    * id order get `start_bytes` (prefix sum of entry costs),
    * `shard = start_bytes div budget`, and their byte offset inside
    * the shard. A NULL or negative payload size FAILS the job loudly
    * (raise_error) — a null would otherwise null `_entry` and slip
    * past packChunks' positives filter, silently dropping the row
    * from the shard manifest, which is a silently incomplete export;
    * sizes are payload bytes (0 allowed — a header-only entry still
    * costs 512).
    *
    * @return streamCol, idCol, n_bytes, entry_bytes, start_bytes,
    *         shard, offset_in_shard
    */
  def assign(df: DataFrame, idCol: String, bytesCol: String,
             streamCol: String, budget: Long): DataFrame = {
    require(budget >= BlockSize * 2,
      s"budget must hold at least one entry (>= ${BlockSize * 2}), got $budget")
    val sized = df
      .withColumn("n_bytes",
        when(col(bytesCol).isNotNull && col(bytesCol).cast("long") >= 0L,
          col(bytesCol).cast("long"))
          .otherwise(raise_error(concat(
            lit(s"TarShards.assign: NULL or negative $bytesCol for entry "),
            col(idCol).cast("string")))))
      // integer div keeps the arithmetic exact at any byte scale (a
      // double division would wobble past 2^53)
      .withColumn("_entry",
        lit(BlockSize.toLong) +
          expr(s"((n_bytes + ${BlockSize - 1}) div $BlockSize) * $BlockSize"))
    // packChunks computes the banded two-phase prefix sum; _entry > 0
    // always (>= 512), so its positives filter drops nothing
    val packed = Sampling.packChunks(sized, idCol, "_entry", streamCol, budget)
      .withColumnRenamed("n_tokens", "entry_bytes")
      .withColumnRenamed("start_tok", "start_bytes")
      .withColumn("shard", expr(s"start_bytes div $budget"))
    val wShard = Window.partitionBy(col(streamCol), col("shard"))
    packed
      .join(sized.select(col(streamCol), col(idCol), col("n_bytes")),
        Seq(streamCol, idCol))
      .withColumn("offset_in_shard",
        col("start_bytes") - min(col("start_bytes")).over(wShard))
      .select(col(streamCol), col(idCol), col("n_bytes"), col("entry_bytes"),
        col("start_bytes"), col("shard"), col("offset_in_shard"))
  }

  // ---- deterministic POSIX ustar rendering (pure JVM) ----

  private def octal(v: Long, width: Int): Array[Byte] = {
    // width-1 octal digits, zero-padded, then NUL (the POSIX layout)
    val s = java.lang.Long.toOctalString(v)
    require(s.length <= width - 1, s"value $v overflows $width-byte octal field")
    val out = new Array[Byte](width)
    val pad = width - 1 - s.length
    var i = 0
    while (i < pad) { out(i) = '0'; i += 1 }
    s.foreach { c => out(i) = c.toByte; i += 1 }
    out(width - 1) = 0
    out
  }

  /** One 512-byte ustar header. Deterministic: mtime 0, uid/gid 0,
    * mode 0644, empty uname/gname, zero dev fields. Names longer
    * than 100 bytes raise (the 155-byte prefix field is a documented
    * non-goal — shard entry names are ids, not paths). */
  def header(name: String, size: Long): Array[Byte] = {
    val nameB = name.getBytes("UTF-8")
    require(nameB.length > 0 && nameB.length <= 100,
      s"tar entry name must be 1..100 bytes, got ${nameB.length} ($name)")
    require(size >= 0, s"negative entry size: $size")
    val h = new Array[Byte](BlockSize)
    System.arraycopy(nameB, 0, h, 0, nameB.length)
    System.arraycopy(octal(420, 8), 0, h, 100, 8) // mode 0644
    System.arraycopy(octal(0, 8), 0, h, 108, 8) // uid
    System.arraycopy(octal(0, 8), 0, h, 116, 8) // gid
    System.arraycopy(octal(size, 12), 0, h, 124, 12)
    System.arraycopy(octal(0, 12), 0, h, 136, 12) // mtime
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum = spaces while summing
    h(156) = '0' // typeflag: regular file
    System.arraycopy("ustar".getBytes("US-ASCII"), 0, h, 257, 5) // magic + NUL at 262
    h(263) = '0'; h(264) = '0' // version "00"
    var sum = 0L
    var i = 0
    while (i < BlockSize) { sum += (h(i) & 0xff); i += 1 }
    // checksum: 6 octal digits, NUL, space
    val cs = java.lang.Long.toOctalString(sum)
    val pad = 6 - cs.length
    i = 0
    while (i < pad) { h(148 + i) = '0'; i += 1 }
    cs.foreach { c => h(148 + i) = c.toByte; i += 1 }
    h(154) = 0
    h(155) = ' '
    h
  }

  /** Render one shard: entries concatenated as header + payload +
    * zero padding to the block boundary, closed by two zero blocks.
    * Total length is exactly Σ entryBytes + 1024. */
  def shardBytes(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val total = entries.map(e => entryBytes(e._2.length.toLong)).sum + 2L * BlockSize
    require(total <= Int.MaxValue, s"shard of $total bytes exceeds a JVM array")
    val out = new Array[Byte](total.toInt)
    var off = 0
    entries.foreach { case (name, payload) =>
      val h = header(name, payload.length.toLong)
      System.arraycopy(h, 0, out, off, BlockSize)
      off += BlockSize
      System.arraycopy(payload, 0, out, off, payload.length)
      off += (entryBytes(payload.length.toLong) - BlockSize).toInt
    }
    out // trailing 1024 bytes stay zero
  }

  /** Parse a ustar stream back to (name, payload) entries, verifying
    * every header checksum; raises on any malformed header (the
    * writer is ours — corruption is a bug, not an ingest condition;
    * WarcSource owns the quarantine discipline for FOREIGN bytes). */
  def readEntries(tar: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
    var off = 0
    var done = false
    while (!done && off + BlockSize <= tar.length) {
      if ((0 until BlockSize).forall(i => tar(off + i) == 0)) done = true
      else {
        var stored = 0L
        var sum = 0L
        var i = 0
        while (i < BlockSize) {
          val b = tar(off + i) & 0xff
          sum += (if (i >= 148 && i < 156) ' '.toInt else b)
          i += 1
        }
        val csField = new String(tar, off + 148, 8, "US-ASCII")
        stored = java.lang.Long.parseLong(csField.takeWhile(c => c >= '0' && c <= '7'), 8)
        require(stored == sum, s"tar checksum mismatch at offset $off: $stored != $sum")
        val nameEnd = (0 until 100).find(i => tar(off + i) == 0).getOrElse(100)
        val name = new String(tar, off, nameEnd, "UTF-8")
        val sizeField = new String(tar, off + 124, 12, "US-ASCII")
        val size = java.lang.Long.parseLong(
          sizeField.takeWhile(c => c >= '0' && c <= '7'), 8)
        val payload = java.util.Arrays.copyOfRange(tar, off + BlockSize,
          off + BlockSize + size.toInt)
        out += ((name, payload))
        off += entryBytes(size).toInt
      }
    }
    out.toSeq
  }

  /** Materialize shards: group assigned entries by (stream, shard),
    * sort by id inside the group, render the tar. One task per
    * shard; the group buffer holds one shard (≤ budget + max entry —
    * the documented memory contract, sized by the budget knob).
    *
    * @param withPayload [[assign]] output joined back to (idCol,
    *                    nameCol, payloadCol)
    * @return streamCol, shard, n_entries, tar_bytes
    */
  def writeShards(withPayload: DataFrame, idCol: String, nameCol: String,
                  payloadCol: String, streamCol: String): DataFrame = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    val ds: Dataset[(String, Long, Long, String, Array[Byte])] = withPayload
      .select(col(streamCol).cast("string"), col("shard").cast("long"),
        col(idCol).cast("long"), col(nameCol).cast("string"),
        col(payloadCol).cast("binary"))
      .as[(String, Long, Long, String, Array[Byte])]
    ds.groupByKey(r => (r._1, r._2))
      .mapGroups((key: (String, Long),
                  it: Iterator[(String, Long, Long, String, Array[Byte])]) => {
        val entries = it.toArray.sortBy(_._3)
        (key._1, key._2, entries.length.toLong,
          shardBytes(entries.map(e => (e._4, e._5)).toSeq))
      })
      .toDF(streamCol, "shard", "n_entries", "tar_bytes")
  }
}
