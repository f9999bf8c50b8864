package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500 / WARC 1.0) container source — the
  * genuine front door of a CommonCrawl-class 100 TB text pipeline:
  * the crawl lands as `.warc.gz` files long before any of q119's
  * HTML extraction can run. (Reference scope note: the reference
  * pipeline ingests already-extracted tabular shapes — main.py:1 —
  * so this source is a beyond-reference component of block E's
  * curation front door.)
  *
  * Format (public spec): a WARC file is a sequence of records, each
  *   `WARC/1.0\r\n` + header lines (`Name: value\r\n`) + `\r\n` +
  *   exactly Content-Length block bytes + `\r\n\r\n`.
  * The .gz convention records one gzip MEMBER per record so readers
  * can resynchronize; `java.util.zip.GZIPInputStream` inflates
  * concatenated members natively, so both member-per-record and
  * whole-file-stream gzip decode through the same path.
  *
  * Design rules, inherited from [[JsonlSource]]'s ingest discipline:
  *  - PERMISSIVE + QUARANTINE, never fail-fast, never silent drop: a
  *    malformed record surfaces as a row with `error` set and its
  *    uncompressed byte offset; the parser then RESYNCS at the next
  *    `WARC/` magic at a line start, so one bad record costs its own
  *    bytes, not the rest of a multi-GB file. [[stats]] gives the
  *    exact good/quarantined accounting a corruption budget gates on.
  *  - One task per file, parallelism ACROSS files (the CsvSource
  *    multiLine stance): gzip is not block-splittable, and WARC
  *    record boundaries are content-defined, so the scale contract is
  *    many moderate files — exactly how CommonCrawl ships (~1 GB
  *    segments). The binaryFile scan preserves that unit of work.
  *  - Headers are parsed case-insensitively (the spec allows any
  *    case); bare-LF line endings are tolerated on header lines
  *    (real crawls contain them) while the block length is governed
  *    solely by Content-Length, never by delimiter scanning.
  */
object WarcSource {

  /** One parsed record (error == null) or one quarantined region
    * (error != null; header fields best-effort, body = the raw
    * skipped bytes up to [[QuarantineCap]]). Offsets are in the
    * UNCOMPRESSED stream. */
  case class WarcRec(
      path: String, offset: Long, warc_type: String, record_id: String,
      target_uri: String, warc_date: String, content_type: String,
      content_length: Long, body: Array[Byte], error: String)

  /** Quarantined regions keep at most this many verbatim bytes — the
    * accounting stays exact (offsets), the payload stays bounded. */
  val QuarantineCap = 4096

  private val GzipMagic0 = 0x1f.toByte
  private val GzipMagic1 = 0x8b.toByte

  /** Inflate a (possibly multi-member) gzip stream; pass through
    * plain bytes untouched. A corrupt deflate stream inflates as far
    * as it goes — the parser quarantines the tail by offset. */
  def inflate(bytes: Array[Byte]): Array[Byte] = {
    if (bytes.length < 2 || bytes(0) != GzipMagic0 || bytes(1) != GzipMagic1)
      return bytes
    val out = new ByteArrayOutputStream(bytes.length * 4)
    val buf = new Array[Byte](64 * 1024)
    try {
      val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    } catch { case _: java.io.IOException => () } // keep what inflated
    out.toByteArray
  }

  /** Find the end (exclusive) of the header line starting at `i`:
    * index after the terminating LF, or len if unterminated. */
  private def lineEnd(b: Array[Byte], i: Int): Int = {
    var j = i
    while (j < b.length && b(j) != '\n') j += 1
    math.min(j + 1, b.length)
  }

  private def lineStr(b: Array[Byte], i: Int, end: Int): String = {
    var e = end
    if (e > i && e <= b.length && (e == b.length || b(e - 1) == '\n')) {
      if (e > i && b(e - 1) == '\n') e -= 1
      if (e > i && b(e - 1) == '\r') e -= 1
    }
    new String(b, i, e - i, java.nio.charset.StandardCharsets.UTF_8)
  }

  private def startsWith(b: Array[Byte], i: Int, s: String): Boolean =
    i + s.length <= b.length && s.indices.forall(k => b(i + k) == s.charAt(k).toByte)

  /** Next position >= from where a `WARC/` magic sits at a line
    * start (position 0 or preceded by LF); -1 if none. */
  private def nextMagic(b: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    while (i < b.length) {
      if ((i == 0 || b(i - 1) == '\n') && startsWith(b, i, "WARC/")) return i
      i += 1
    }
    -1
  }

  private def quarantine(path: String, b: Array[Byte], from: Int, until: Int,
                         err: String): WarcRec = {
    val cap = math.min(until - from, QuarantineCap)
    WarcRec(path, from.toLong, null, null, null, null, null, -1L,
      java.util.Arrays.copyOfRange(b, from, from + cap), err)
  }

  /** Parse one uncompressed WARC stream into records + quarantined
    * regions, in stream order. Pure function — the spec's surface. */
  def parseStream(path: String, stream: Array[Byte]): Seq[WarcRec] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRec]
    val b = stream
    var i = 0
    // leading junk before the first record is quarantined like any
    // other unparseable region
    while (i < b.length) {
      if (!startsWith(b, i, "WARC/")) {
        val nxt = nextMagic(b, i + 1)
        val until = if (nxt < 0) b.length else nxt
        out += quarantine(path, b, i, until, "no WARC/ magic at record start")
        i = until
      } else {
        val recStart = i
        // version line
        val ve = lineEnd(b, i)
        val version = lineStr(b, i, ve)
        i = ve
        if (!version.startsWith("WARC/1.") && !version.startsWith("WARC/0.")) {
          val nxt = nextMagic(b, recStart + 1)
          val until = if (nxt < 0) b.length else nxt
          out += quarantine(path, b, recStart, until, s"unsupported version line: $version")
          i = until
        } else {
          // header lines until blank line
          var hdrs = Map.empty[String, String]
          var bad: String = null
          var blank = false
          while (!blank && bad == null && i < b.length) {
            val he = lineEnd(b, i)
            val line = lineStr(b, i, he)
            i = he
            if (line.isEmpty) blank = true
            else {
              val c = line.indexOf(':')
              if (c <= 0) bad = s"malformed header line: $line"
              else hdrs += (line.substring(0, c).trim.toLowerCase ->
                line.substring(c + 1).trim)
            }
          }
          val lenOpt = hdrs.get("content-length").flatMap(s => s.toLongOption)
          if (bad == null && !blank) bad = "truncated headers (EOF before blank line)"
          if (bad == null && lenOpt.isEmpty)
            bad = "missing or non-numeric Content-Length"
          if (bad == null && i + lenOpt.get > b.length)
            bad = s"truncated block: declared ${lenOpt.get}, ${b.length - i} bytes left"
          if (bad != null) {
            val nxt = nextMagic(b, recStart + 1)
            val until = if (nxt < 0) b.length else nxt
            out += quarantine(path, b, recStart, until, bad)
            i = until
          } else {
            val len = lenOpt.get
            val body = java.util.Arrays.copyOfRange(b, i, i + len.toInt)
            i += len.toInt
            // spec terminator \r\n\r\n; tolerate any run of CR/LF
            while (i < b.length && (b(i) == '\r' || b(i) == '\n')) i += 1
            out += WarcRec(path, recStart.toLong,
              hdrs.getOrElse("warc-type", null),
              hdrs.getOrElse("warc-record-id", null),
              hdrs.getOrElse("warc-target-uri", null),
              hdrs.getOrElse("warc-date", null),
              hdrs.getOrElse("content-type", null),
              len, body, null)
          }
        }
      }
    }
    out.toSeq
  }

  /** Read WARC files (plain or .gz) under `path` into the record
    * frame. One task per file — the non-splittability contract; at
    * 100 TB the parallelism is the file count, which is how crawls
    * ship. Rows with `error != null` are quarantined regions. */
  def read(spark: SparkSession, path: String): DataFrame = {
    implicit val enc = Encoders.product[WarcRec]
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])](Encoders.tuple(Encoders.STRING, Encoders.BINARY))
      .flatMap { case (p, bytes) => parseStream(p, inflate(bytes)) }
      .toDF()
  }

  /** The well-formed records. */
  def records(raw: DataFrame): DataFrame =
    raw.filter(col("error").isNull).drop("error")

  /** The quarantined regions, verbatim (capped) bytes + offsets. */
  def corrupt(raw: DataFrame): DataFrame =
    raw.filter(col("error").isNotNull)
      .select(col("path"), col("offset"), col("error"), col("body"))

  /** Exact (good, quarantined) accounting in one pass. */
  def stats(raw: DataFrame): (Long, Long) = {
    val r = raw.agg(
      sum(when(col("error").isNull, 1L).otherwise(0L)),
      sum(when(col("error").isNotNull, 1L).otherwise(0L))).collect()(0)
    (if (r.isNullAt(0)) 0L else r.getLong(0),
      if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  // ---------------------------------------------------------------
  // Synthetic WARC bytes for the driver gate (the q70/q95/q128
  // discipline): every surface is closed-form in doc_id, laid out in
  // the genuine byte format, so the oracle restates arithmetic while
  // the hash check exercises version/header/Content-Length parsing,
  // block slicing and (odd ids) multi-member gzip inflation.
  // ---------------------------------------------------------------

  /** Per-id record count: 1 + id % 3. */
  def synthNRecords(id: Long): Int = (1 + id % 3).toInt

  /** Per-(id, j) block length: 40 + (7·id + 13·j) % 100. */
  def synthBlockLen(id: Long, j: Int): Int = (40 + (7 * id + 13 * j) % 100).toInt

  private val SynthTypes = Array("response", "request", "metadata")

  /** Build one record's exact bytes (CRLF line endings, spec layout). */
  private[sources] def synthRecordBytes(id: Long, j: Int): Array[Byte] = {
    val len = synthBlockLen(id, j)
    val hdr = new StringBuilder
    hdr ++= "WARC/1.0\r\n"
    hdr ++= s"WARC-Type: ${SynthTypes(j % 3)}\r\n"
    hdr ++= s"WARC-Record-ID: <urn:uuid:${id}-${j}>\r\n"
    hdr ++= s"WARC-Date: 2026-01-01T00:00:00Z\r\n"
    hdr ++= s"WARC-Target-URI: http://host-${id % 50}.example/p/${id}/${j}\r\n"
    hdr ++= "Content-Type: application/http; msgtype=response\r\n"
    hdr ++= s"Content-Length: ${len}\r\n"
    hdr ++= "\r\n"
    val head = hdr.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](head.length + len + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    var i = 0
    while (i < len) { out(head.length + i) = ((id + j + i) % 256).toByte; i += 1 }
    out(head.length + len) = '\r'; out(head.length + len + 1) = '\n'
    out(head.length + len + 2) = '\r'; out(head.length + len + 3) = '\n'
    out
  }

  private def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(bytes.length)
    val g = new GZIPOutputStream(bos)
    g.write(bytes); g.close()
    bos.toByteArray
  }

  /** A complete synthetic WARC stream for `id`: [[synthNRecords]]
    * records; odd ids are gzip MEMBER-PER-RECORD (the crawl-standard
    * layout), even ids plain. */
  def synthWarcBytes(id: Long): Array[Byte] = {
    val n = synthNRecords(id)
    val recs = (0 until n).map(j => synthRecordBytes(id, j))
    val parts = if (id % 2 == 1) recs.map(gzipMember) else recs
    val out = new ByteArrayOutputStream()
    parts.foreach(out.write)
    out.toByteArray
  }

  /** Column form of [[synthWarcBytes]] for the gated query. */
  def syntheticWarcUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((id: Long) => synthWarcBytes(id))

  // ---------------------------------------------------------------
  // HTTP-payload records (the layout CommonCrawl response records
  // actually carry: the block is a full HTTP message — status line,
  // headers, blank line, entity body).
  // ---------------------------------------------------------------

  /** The fixed HTTP response head used by the synthetic crawl
    * records (status line + one header + blank line). */
  val SynthHttpHead: String =
    "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"

  /** Split an HTTP message block into its entity body: everything
    * after the first CRLFCRLF (tolerating bare LFLF); the whole
    * block if no header terminator exists (a non-HTTP block passes
    * through — the permissive discipline). */
  def httpBody(block: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i + 1 < block.length) {
      if (block(i) == '\n') {
        // \n\n or \n\r\n end the header section
        if (block(i + 1) == '\n')
          return java.util.Arrays.copyOfRange(block, i + 2, block.length)
        if (i + 2 < block.length && block(i + 1) == '\r' && block(i + 2) == '\n')
          return java.util.Arrays.copyOfRange(block, i + 3, block.length)
        if (i + 2 >= block.length && block(i + 1) == '\r')
          return Array.emptyByteArray
      }
      i += 1
    }
    block
  }

  /** Column form of [[httpBody]]. */
  def httpBodyUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((b: Array[Byte]) => httpBody(b))

  /** HTTP message-head metadata — the WAT projection's parse:
    * (status code from the status line, header-line count, declared
    * Content-Type or null). Permissive like [[httpBody]]: a non-HTTP
    * block yields (0, 0, null) rather than failing. */
  def httpMeta(block: Array[Byte]): (Int, Int, String) = {
    var end = block.length
    var i = 0
    var found = false
    while (i + 1 < block.length && !found) {
      if (block(i) == '\n') {
        if (block(i + 1) == '\n') { end = i; found = true }
        else if (i + 2 < block.length && block(i + 1) == '\r' &&
          block(i + 2) == '\n') { end = i; found = true }
      }
      i += 1
    }
    val head = new String(block, 0, end, "ISO-8859-1")
    val lines = head.split("\n", -1).map(_.stripSuffix("\r"))
    val status = lines.headOption.flatMap { l =>
      val parts = l.split(" ")
      if (parts.length >= 2 && parts(0).startsWith("HTTP/")) parts(1).toIntOption
      else None
    }.getOrElse(0)
    if (status == 0) (0, 0, null)
    else {
      val hdrs = lines.drop(1).filter(_.contains(':'))
      val ct = hdrs.find(_.toLowerCase.startsWith("content-type:"))
        .map(_.split(":", 2)(1).trim).orNull
      (status, hdrs.length, ct)
    }
  }

  def httpMetaUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((b: Array[Byte]) => httpMeta(b))

  /** WET view — the CommonCrawl "conversion" sibling record as a
    * SELECT-level projection (the q140 composition, named): one row
    * per well-formed RESPONSE record with the HTTP entity body
    * reduced to plain text (tag strip + entity decode, the q119
    * transform) and WET's Content-Length = octet length of the
    * extracted text. Map-side end to end. */
  def wet(raw: DataFrame): DataFrame =
    records(raw).filter(col("warc_type") === "response")
      .withColumn("text", graft.operators.TextAnalysis.decodeEntities(
        graft.operators.TextAnalysis.stripTags(
          decode(httpBodyUdf(col("body")), "UTF-8"))))
      .select(col("path"), col("offset"), col("target_uri"), col("warc_date"),
        col("text"), octet_length(col("text")).cast("long").as("content_length"))

  /** WAT view — the metadata sibling record: per-record envelope
    * fields + the parsed HTTP head (status, header count, declared
    * Content-Type). Map-side. */
  def wat(raw: DataFrame): DataFrame =
    records(raw)
      .withColumn("__m", httpMetaUdf(col("body")))
      .select(col("path"), col("offset"), col("warc_type"), col("target_uri"),
        col("warc_date"), col("content_type"), col("content_length"),
        col("__m._1").as("http_status"), col("__m._2").as("n_http_headers"),
        col("__m._3").as("http_content_type"))

  /** One synthetic crawl record: a WARC response whose block is the
    * genuine HTTP message [[SynthHttpHead]] + `html` (the
    * CommonCrawl layout). Odd ids gzip the record (one member). */
  def synthHttpWarcBytes(id: Long, html: String): Array[Byte] = {
    val body = (SynthHttpHead + html).getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val hdr = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Record-ID: <urn:uuid:crawl-${id}>\r\n" +
      s"WARC-Date: 2026-01-01T00:00:00Z\r\n" +
      s"WARC-Target-URI: http://host-${id % 50}.example/page/${id}\r\n" +
      s"Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n")
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val rec = hdr ++ body ++ "\r\n\r\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    if (id % 2 == 1) gzipMember(rec) else rec
  }

  /** Column form of [[synthHttpWarcBytes]]. */
  def syntheticHttpWarcUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((id: Long, html: String) => synthHttpWarcBytes(id, html))

  /** Batched parse of per-row WARC payload bytes (the decodeBatch
    * shape: partition-wise, no driver involvement). `idCol` rides
    * along as the path field. */
  def parseBatch(payloads: DataFrame, idCol: String = "id",
                 payloadCol: String = "payload"): DataFrame = {
    implicit val enc = Encoders.product[WarcRec]
    payloads
      .select(col(idCol).cast("string").as("id"), col(payloadCol).as("p"))
      .as[(String, Array[Byte])](Encoders.tuple(Encoders.STRING, Encoders.BINARY))
      .flatMap { case (id, bytes) => parseStream(id, inflate(bytes)) }
      .toDF()
  }
}
