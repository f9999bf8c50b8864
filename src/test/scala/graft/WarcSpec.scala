package graft

import java.nio.charset.StandardCharsets.US_ASCII
import java.nio.file.{Files, Paths}

import graft.sources.WarcSource

class WarcSpec extends SparkSuite {

  private def rec(typ: String, uri: String, body: String,
                  declaredLen: Option[Int] = None): Array[Byte] = {
    val b = body.getBytes(US_ASCII)
    val len = declaredLen.getOrElse(b.length)
    (s"WARC/1.0\r\nWARC-Type: $typ\r\nWARC-Record-ID: <urn:uuid:$uri>\r\n" +
      s"WARC-Target-URI: $uri\r\nWARC-Date: 2026-01-01T00:00:00Z\r\n" +
      s"Content-Length: $len\r\n\r\n").getBytes(US_ASCII) ++ b ++
      "\r\n\r\n".getBytes(US_ASCII)
  }

  private def gz(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b); g.close(); bos.toByteArray
  }

  test("parseStream: clean multi-record stream, fields and offsets exact") {
    val r1 = rec("response", "u1", "hello world")
    val r2 = rec("request", "u2", "GET / HTTP/1.1")
    val out = WarcSource.parseStream("f", r1 ++ r2)
    assert(out.size === 2)
    assert(out.forall(_.error == null))
    assert(out(0).offset === 0L && out(1).offset === r1.length.toLong)
    assert(out(0).warc_type === "response" && out(1).warc_type === "request")
    assert(out(0).target_uri === "u1")
    assert(new String(out(0).body, US_ASCII) === "hello world")
    assert(out(1).content_length === 14L)
  }

  test("parseStream quarantines + RESYNCS: bad record costs its own " +
    "bytes, later records survive") {
    val good1 = rec("response", "a", "first")
    val badHeader = "WARC/1.0\r\nNoColonHere\r\nContent-Length: 5\r\n\r\nxxxxx\r\n\r\n"
      .getBytes(US_ASCII)
    val junk = "random bytes not a record\r\n".getBytes(US_ASCII)
    val good2 = rec("metadata", "b", "second")
    val out = WarcSource.parseStream("f", good1 ++ badHeader ++ junk ++ good2)
    val good = out.filter(_.error == null)
    val bad = out.filter(_.error != null)
    assert(good.map(_.target_uri) === Seq("a", "b"))
    // resync jumps to the NEXT magic, so the bad record and the junk
    // after it coalesce into one quarantined region with exact offsets
    assert(bad.size === 1)
    assert(bad(0).offset === good1.length.toLong)
    assert(bad(0).error.contains("malformed header line"))
    // the second good record's offset is past the quarantined region
    assert(good(1).offset ===
      (good1.length + badHeader.length + junk.length).toLong)
  }

  test("parseStream quarantines truncated blocks and missing Content-Length") {
    val truncated = rec("response", "t", "full body here",
      declaredLen = Some(10000))
    val out1 = WarcSource.parseStream("f", truncated)
    assert(out1.size === 1 && out1.head.error.contains("truncated block"))

    val noLen = ("WARC/1.0\r\nWARC-Type: response\r\n\r\nbody\r\n\r\n").getBytes(US_ASCII)
    val out2 = WarcSource.parseStream("f", noLen)
    assert(out2.size === 1 &&
      out2.head.error.contains("missing or non-numeric Content-Length"))

    // EOF mid-headers
    val eof = "WARC/1.0\r\nWARC-Type: resp".getBytes(US_ASCII)
    val out3 = WarcSource.parseStream("f", eof)
    assert(out3.size === 1 && out3.head.error.contains("truncated headers"))
  }

  test("binary-safe blocks: body bytes containing WARC/ magic or CRLFs " +
    "are governed by Content-Length, not delimiter scanning") {
    val evil = "x\r\n\r\nWARC/1.0\r\nfake\r\n\r\ny"
    val stream = rec("response", "e", evil) ++ rec("response", "after", "ok")
    val out = WarcSource.parseStream("f", stream)
    assert(out.forall(_.error == null), out.map(_.error).mkString("; "))
    assert(out.size === 2)
    assert(new String(out(0).body, US_ASCII) === evil)
    assert(out(1).target_uri === "after")
  }

  test("inflate: member-per-record gzip, whole-stream gzip, and plain " +
    "all decode to the same records") {
    val r1 = rec("response", "g1", "alpha")
    val r2 = rec("response", "g2", "beta")
    val plain = WarcSource.parseStream("f", r1 ++ r2)
    val members = WarcSource.parseStream("f",
      WarcSource.inflate(gz(r1) ++ gz(r2)))
    val whole = WarcSource.parseStream("f", WarcSource.inflate(gz(r1 ++ r2)))
    def surf(rs: Seq[WarcSource.WarcRec]) =
      rs.map(r => (r.offset, r.warc_type, r.target_uri, r.content_length,
        new String(r.body, US_ASCII), r.error))
    assert(surf(members) === surf(plain))
    assert(surf(whole) === surf(plain))
  }

  test("end-to-end file read: one task per file, stats accounting, " +
    "quarantine across plain and gzip siblings") {
    val dir = Files.createTempDirectory("graft_warc").toString
    val good = rec("response", "f1", "doc one") ++ rec("request", "f2", "doc two")
    val withBad = rec("response", "f3", "doc three") ++
      "GARBAGE-BETWEEN\r\n".getBytes(US_ASCII) ++ rec("response", "f4", "doc four")
    Files.write(Paths.get(dir, "a.warc"), good)
    Files.write(Paths.get(dir, "b.warc.gz"), gz(withBad))
    val raw = WarcSource.read(spark, dir)
    val (ok, bad) = WarcSource.stats(raw)
    assert(ok === 4L && bad === 1L)
    val uris = WarcSource.records(raw).select("target_uri")
      .collect().map(_.getString(0)).toSet
    assert(uris === Set("f1", "f2", "f3", "f4"))
    val q = WarcSource.corrupt(raw).collect()
    assert(q.length === 1)
    assert(new String(q(0).getAs[Array[Byte]]("body"), US_ASCII)
      .startsWith("GARBAGE-BETWEEN"))
    // parallelism contract: one input row (= one task's worth) per file
    assert(raw.select("path").distinct().count() === 2L)
  }

  test("WET/WAT views: conversion text + metadata projections off the " +
    "parsed records; non-HTTP and non-response records handled") {
    import org.apache.spark.sql.Encoders
    val html = "<html><body>A &amp; B</body></html>"
    val stream =
      WarcSource.synthHttpWarcBytes(2L, html) ++ // response w/ HTTP + html
        rec("request", "req1", "GET / HTTP/1.1\r\nHost: h\r\n\r\n") ++
        rec("metadata", "meta1", "not an http message")
    val raw = spark.createDataset(
      WarcSource.parseStream("t", WarcSource.inflate(stream)))(
      Encoders.product[WarcSource.WarcRec]).toDF()
    // WET: only the response row, tags stripped + entities decoded,
    // content_length = extracted-text octets
    val wet = WarcSource.wet(raw).collect()
    assert(wet.length === 1)
    val w = wet(0)
    assert(w.getAs[String]("target_uri") === "http://host-2.example/page/2")
    assert(w.getAs[String]("text") === "A & B")
    assert(w.getAs[Long]("content_length") === 5L)
    // WAT: every well-formed record; http fields only where a status
    // line exists
    val wat = WarcSource.wat(raw).orderBy("offset").collect()
    assert(wat.length === 3)
    val byType = wat.map(r => r.getAs[String]("warc_type") -> r).toMap
    assert(byType("response").getAs[Int]("http_status") === 200)
    assert(byType("response").getAs[Int]("n_http_headers") === 1)
    assert(byType("response").getAs[String]("http_content_type")
      === "text/html; charset=utf-8")
    // the request block IS an HTTP message but not a STATUS line ->
    // permissive (0, 0, null)
    assert(byType("request").getAs[Int]("http_status") === 0)
    assert(byType("metadata").getAs[Int]("http_status") === 0)
    assert(byType("metadata").getAs[String]("http_content_type") == null)
  }

  test("httpMeta: status line, header count, content-type case folding, " +
    "permissive non-HTTP") {
    def m(s: String) = WarcSource.httpMeta(s.getBytes(US_ASCII))
    assert(m("HTTP/1.1 404 Not Found\r\ncontent-TYPE: text/plain\r\nX: 1\r\n\r\nbody")
      === ((404, 2, "text/plain")))
    assert(m("HTTP/1.0 301\nLocation: /x\n\n") === ((301, 1, null)))
    assert(m("not http at all") === ((0, 0, null)))
    assert(m("") === ((0, 0, null)))
    // malformed status code -> permissive zero
    assert(m("HTTP/1.1 abc\r\n\r\n") === ((0, 0, null)))
  }

  test("httpBody: CRLF and bare-LF header terminators, body bytes " +
    "verbatim, non-HTTP blocks pass through") {
    def s2b(s: String) = s.getBytes(US_ASCII)
    def body(s: String) = new String(WarcSource.httpBody(s2b(s)), US_ASCII)
    assert(body("HTTP/1.1 200 OK\r\nX: y\r\n\r\n<html>hi</html>") === "<html>hi</html>")
    assert(body("HTTP/1.1 200 OK\nX: y\n\n<html>hi</html>") === "<html>hi</html>")
    // body containing its own blank lines: only the FIRST terminator splits
    assert(body("H: v\r\n\r\nline1\r\n\r\nline2") === "line1\r\n\r\nline2")
    // no terminator: permissive pass-through
    assert(body("no header terminator here") === "no header terminator here")
    assert(body("") === "")
    // the q140 fixture round-trips: head + html -> html
    val html = "<html><body>x &amp; y</body></html>"
    val rec = WarcSource.parseStream("7",
      WarcSource.inflate(WarcSource.synthHttpWarcBytes(7L, html))).head
    assert(rec.error == null)
    assert(rec.content_length === (WarcSource.SynthHttpHead + html).length.toLong)
    assert(new String(WarcSource.httpBody(rec.body), US_ASCII) === html)
  }

  test("synthetic stream surfaces match their closed forms (the q134 " +
    "fixture's self-check), including the gzip leg") {
    for (id <- 0L to 7L) {
      val out = WarcSource.parseStream(id.toString,
        WarcSource.inflate(WarcSource.synthWarcBytes(id)))
      assert(out.forall(_.error == null))
      assert(out.size === WarcSource.synthNRecords(id))
      out.zipWithIndex.foreach { case (r, j) =>
        assert(r.content_length === WarcSource.synthBlockLen(id, j).toLong)
        assert(r.target_uri === s"http://host-${id % 50}.example/p/$id/$j")
        val want = (0 until r.body.length).map(i => (id + j + i) % 256).sum
        assert(r.body.map(_ & 0xff).map(_.toLong).sum === want)
      }
    }
  }
}
