package graft

import org.apache.spark.sql.functions._

import graft.operators.TarShards

/** Tar-shard export (q143 + TarShards): ustar layout constants,
  * byte-level roundtrip, checksum enforcement, the assignment
  * arithmetic vs a driver reference, the bounded-overshoot
  * contract, and the keystone cross-check — rendered header offsets
  * inside each shard equal the gated assignment arithmetic. */
class TarShardsSpec extends SparkSuite {

  import spark.implicits._

  test("header matches the POSIX ustar layout for a known entry") {
    val h = TarShards.header("a", 5L)
    assert(h.length === 512)
    assert(new String(h, 0, 1, "US-ASCII") === "a" && h(1) === 0)
    assert(new String(h, 100, 8, "US-ASCII") === "0000644\u0000")
    assert(new String(h, 124, 12, "US-ASCII") === "00000000005\u0000")
    assert(new String(h, 136, 12, "US-ASCII") === "00000000000\u0000") // mtime 0
    assert(h(156) === '0'.toByte)
    assert(new String(h, 257, 6, "US-ASCII") === "ustar\u0000")
    assert(new String(h, 263, 2, "US-ASCII") === "00")
    // checksum: recompute over the header with the field as spaces
    var sum = 0L
    (0 until 512).foreach(i => sum += (if (i >= 148 && i < 156) ' '.toInt else h(i) & 0xff))
    val stored = java.lang.Long.parseLong(
      new String(h, 148, 8, "US-ASCII").takeWhile(c => c >= '0' && c <= '7'), 8)
    assert(stored === sum)
    assert(h(154) === 0 && h(155) === ' '.toByte)
  }

  test("shardBytes/readEntries roundtrip: empty, sub-block, exact-block " +
    "and multi-block payloads; 512-aligned; zero-block trailer") {
    val rnd = new scala.util.Random(7)
    val entries = Seq(
      ("empty", Array.emptyByteArray),
      ("one", Array.fill(1)(65.toByte)),
      ("exact", Array.fill(512)(66.toByte)),
      ("big", Array.fill(1500)(rnd.nextInt(256).toByte)))
    val tar = TarShards.shardBytes(entries)
    assert(tar.length % 512 === 0)
    assert(tar.length === entries.map(e => TarShards.entryBytes(e._2.length.toLong)).sum + 1024)
    assert(tar.takeRight(1024).forall(_ == 0))
    val back = TarShards.readEntries(tar)
    assert(back.map(_._1) === entries.map(_._1))
    back.zip(entries).foreach { case ((_, got), (_, want)) =>
      assert(java.util.Arrays.equals(got, want))
    }
  }

  test("readEntries rejects a corrupted header byte and oversize names raise") {
    val tar = TarShards.shardBytes(Seq(("x", Array.fill(10)(1.toByte))))
    tar(0) = 'y' // flip the name -> checksum no longer matches
    intercept[IllegalArgumentException](TarShards.readEntries(tar))
    intercept[IllegalArgumentException](TarShards.header("n" * 101, 0L))
    intercept[IllegalArgumentException](TarShards.header("", 0L))
  }

  private def fixture = {
    val rnd = new scala.util.Random(11)
    (1 to 60).map { i =>
      (i.toLong, s"s${i % 3}", rnd.nextInt(1301).toLong)
    }.toDF("doc_id", "source", "payload")
  }

  test("assign equals the driver-side prefix-sum reference on every column") {
    val budget = 4096L
    val got = TarShards.assign(fixture, "doc_id", "payload", "source", budget)
      .orderBy("source", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val rows = fixture.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = rows.groupBy(_._2).toSeq.flatMap { case (src, g) =>
      var cum = 0L
      val starts = g.sortBy(_._1).map { case (id, _, n) =>
        val e = TarShards.entryBytes(n)
        val s = cum; cum += e
        (id, n, e, s, s / budget)
      }
      val shardStart = starts.groupBy(_._5).map { case (sh, es) => sh -> es.map(_._4).min }
      starts.map { case (id, n, e, s, sh) =>
        (src, id, n, e, s, sh, s - shardStart(sh))
      }
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq === want)
  }

  test("writeShards: every shard parses back to its assigned entries in id " +
    "order, rendered header offsets equal the assignment arithmetic, and " +
    "shard payload respects the bounded-overshoot contract") {
    val budget = 4096L
    val df = fixture.withColumn("name", concat(lit("doc-"), col("doc_id")))
      .withColumn("body",
        expr("substring(repeat(cast(doc_id as string), 200), 1, cast(payload as int))")
          .cast("binary"))
      .withColumn("payload", length(col("body")).cast("long"))
    val assigned = TarShards.assign(df, "doc_id", "payload", "source", budget)
    val withPayload = assigned.join(
      df.select(col("doc_id"), col("name"), col("body")), Seq("doc_id"))
    val shards = TarShards.writeShards(withPayload, "doc_id", "name", "body", "source")
      .collect().map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getAs[Array[Byte]](3))))
      .toMap
    val byShard = assigned.orderBy("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(5), r.getLong(6), r.getLong(3)))
      .groupBy(t => (t._1, t._3))
    assert(byShard.keySet === shards.keySet)
    byShard.foreach { case (key, rows) =>
      val (n, tar) = shards(key)
      assert(n === rows.length.toLong)
      val entries = TarShards.readEntries(tar)
      assert(entries.map(_._1) === rows.map(r => s"doc-${r._2}").toSeq)
      // actual byte offset of each header inside the tar == gated arithmetic
      var off = 0L
      entries.zip(rows).foreach { case ((_, payload), r) =>
        assert(off === r._4, s"shard $key entry doc-${r._2}")
        off += TarShards.entryBytes(payload.length.toLong)
        assert(TarShards.entryBytes(payload.length.toLong) === r._5)
      }
      // bounded overshoot: entries (sans trailer) stay under budget + max entry
      val maxEntry = rows.map(_._5).max
      assert(tar.length - 1024 <= budget + maxEntry - 1,
        s"shard $key size ${tar.length}")
    }
  }

  test("assign FAILS LOUDLY on NULL or negative payload sizes instead of " +
    "silently dropping the row from the shard manifest") {
    import spark.implicits._
    def allMessages(t: Throwable): String = {
      val sb = new StringBuilder
      var cur: Throwable = t
      while (cur != null) {
        sb.append(Option(cur.getMessage).getOrElse("")).append('\n')
        cur = cur.getCause
      }
      sb.toString
    }
    val withNull = Seq((1L, Some(10L), "s"), (2L, None, "s"))
      .toDF("id", "bytes", "stream")
    val eNull = intercept[Exception] {
      TarShards.assign(withNull, "id", "bytes", "stream", 4096L).collect()
    }
    assert(allMessages(eNull).contains("NULL or negative"),
      s"got: ${allMessages(eNull)}")
    val withNeg = Seq((1L, 10L, "s"), (2L, -1L, "s"))
      .toDF("id", "bytes", "stream")
    val eNeg = intercept[Exception] {
      TarShards.assign(withNeg, "id", "bytes", "stream", 4096L).collect()
    }
    assert(allMessages(eNeg).contains("NULL or negative"),
      s"got: ${allMessages(eNeg)}")
    // clean input still assigns every row (the fix must not cost rows)
    val ok = TarShards.assign(
      Seq((1L, 10L, "s"), (2L, 0L, "s")).toDF("id", "bytes", "stream"),
      "id", "bytes", "stream", 4096L)
    assert(ok.count() === 2L)
  }
}
