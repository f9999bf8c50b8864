package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.queries.Events
import graft.streaming.{EventStreams, RollupStream}

class StreamingSpec extends SparkSuite {

  test("streaming tumbling agg equals the batch q60 result") {
    val streamed = EventStreams.runTumblingToMemory(spark, sf, "t_stream_spec")
      .collect().map(_.toSeq).toSet
    val batch = Events.q60(spark, sf).collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("RollupStream: the drained stream equals the one-shot batch rollup " +
    "on every exact surface; NDV estimate inside the q131 envelope") {
    val stream = EventStreams.readEventStream(spark, sf)
    val q = RollupStream.rollup(stream)
      .writeStream.outputMode("complete").format("memory")
      .queryName("rollup_stream_spec").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("rollup_stream_spec")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getLong(5)))
      .toMap
    val batch = RollupStream.rollup(Tables.events(spark, sf))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getLong(5)))
      .toMap
    val exactNdv = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("ndv"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed.keySet === batch.keySet && streamed.nonEmpty)
    streamed.foreach { case (k, s) =>
      val b = batch(k)
      // exact surfaces identical (decimal sums are order-independent)
      assert(s._1 === b._1 && s._2 === b._2 && s._3 === b._3 && s._4 === b._4,
        s"type=$k stream=$s batch=$b")
      // both estimates inside the envelope of the exact NDV
      val e = exactNdv(k).toDouble
      assert(math.abs(s._5 - e) / e <= 0.15, s"type=$k stream ndv ${s._5} vs $e")
      assert(math.abs(b._5 - e) / e <= 0.15, s"type=$k batch ndv ${b._5} vs $e")
    }
  }

  test("streaming sliding agg equals the batch q109 result") {
    val stream = EventStreams.readEventStream(spark, sf)
      .withWatermark("ts", "2 hours")
    val q = EventStreams.slidingAgg(stream)
      .writeStream.outputMode("complete").format("memory")
      .queryName("sliding_stream_spec").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("sliding_stream_spec")
      .collect().map(_.toSeq).toSet
    val batch = Events.q109(spark, sf).collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("streaming transitions match the batch successor pairs (finalized subset)") {
    val stream = EventStreams.readEventStream(spark, sf)
      .withWatermark("ts", "2 hours")
    val q = graft.streaming.TransitionStream.transitions(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("trans_stream_spec").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("trans_stream_spec").collect()
      .map(r => r.getAs[Long]("from_id") ->
        ((r.getAs[Long]("to_id"), r.getAs[String]("from_type"),
          r.getAs[String]("to_type")))).toMap
    assert(got.size === got.keySet.size, "a from-event emitted twice")

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val want = Tables.events(spark, sf)
      .withColumn("to_id", lead(col("event_id"), 1).over(w))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_id").isNotNull)
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((r.getAs[Long]("to_id"), r.getAs[String]("event_type"),
          r.getAs[String]("to_type")))).toMap
    // every emitted pair must equal the batch successor, and the
    // final watermark must have finalized a meaningful share
    assert(got.nonEmpty && got.size >= want.size / 2,
      s"only ${got.size} of ${want.size} transitions finalized")
    got.foreach { case (fid, g) =>
      assert(g == want(fid), s"from $fid: stream $g vs batch ${want(fid)}")
    }
  }

  test("transition updateUser: boundary finality and tail-event seeding") {
    import graft.streaming.TransitionStream
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    def mkState(st: Option[TransitionStream.St], wm: Long): TestGroupState[TransitionStream.St] =
      TestGroupState.create[TransitionStream.St](
        st.map(Optional.of[TransitionStream.St]).getOrElse(Optional.empty[TransitionStream.St]()),
        GroupStateTimeout.EventTimeTimeout, 0L,
        Optional.of(wm), hasTimedOut = false)
    def ev(ms: Long, id: Long, t: String) =
      TransitionStream.Ev(1L, new java.sql.Timestamp(ms), id, t)
    // trigger 1: two events, watermark passed only the first — the
    // pair must NOT emit yet (the successor at ts == wm could still
    // be preceded by a late arrival at the same instant)
    val s1 = mkState(None, 2000L)
    val out1 = TransitionStream.updateUser(1L,
      Iterator(ev(1000, 10, "view"), ev(2000, 11, "click")), s1).toSeq
    assert(out1.isEmpty, "successor at ts == wm must not finalize")
    assert(s1.get.last == Some((1000L, 10L, "view")) &&
      s1.get.pend == List((2000L, 11L, "click")))
    // trigger 2: watermark passes the successor; the pair emits and
    // the successor becomes the new tail
    val s2 = mkState(Some(s1.get), 2001L)
    val out2 = TransitionStream.updateUser(1L, Iterator.empty, s2).toSeq
    assert(out2 == Seq(TransitionStream.Out(1L, 10L, 11L, "view", "click")))
    assert(s2.get.last == Some((2000L, 11L, "click")) && s2.get.pend.isEmpty)
    // trigger 3: a much later event chains off the kept tail; equal-ts
    // pending events order by event_id
    val s3 = mkState(Some(s2.get), 9000L)
    val out3 = TransitionStream.updateUser(1L,
      Iterator(ev(5000, 13, "purchase"), ev(5000, 12, "error")), s3).toSeq
    assert(out3 == Seq(
      TransitionStream.Out(1L, 11L, 12L, "click", "error"),
      TransitionStream.Out(1L, 12L, 13L, "error", "purchase")))
  }

  test("streaming dedup drops replayed duplicates within the watermark") {
    // replay the events file TWICE through one stream: every event is
    // then an at-least-once duplicate; the deduped output must equal
    // the distinct batch count
    val tmp = java.nio.file.Files.createTempDirectory("graft_dup").toString
    val batch = Tables.events(spark, sf)
    batch.write.mode("overwrite").parquet(tmp + "/a.parquet")
    batch.write.mode("append").parquet(tmp + "/a.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stream = spark.readStream
      .schema(EventStreams.schema.fields.foldLeft(new org.apache.spark.sql.types.StructType())(
        (st, f) => if (f.name == "ts") st.add("ts", org.apache.spark.sql.types.TimestampType)
                   else st.add(f)))
      .parquet(tmp + "/a.parquet")
    val q = EventStreams.dedupStream(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_stream_spec").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("dedup_stream_spec").count()
    assert(got === batch.count(), s"streamed dedup $got vs batch ${batch.count()}")
  }

  test("streaming near-dup dedup keeps exactly one doc per simhash signature") {
    // documents + id-shifted clones (identical text -> identical
    // signature) replayed through one stream; survivors must be one
    // per DISTINCT signature, matching the batch signature-distinct
    // count — the identical-signature-class filter of crawl ingest
    val tmp = java.nio.file.Files.createTempDirectory("graft_neardup").toString
    val base = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .withColumn("ts", timestamp_micros(lit(1600000000000000L) + col("doc_id") * 1000000L))
    base.write.mode("overwrite").parquet(tmp + "/a.parquet")
    base.withColumn("doc_id", col("doc_id") + 1000000)
      .write.mode("append").parquet(tmp + "/a.parquet")
    val schema = new org.apache.spark.sql.types.StructType()
      .add("doc_id", org.apache.spark.sql.types.LongType)
      .add("text", org.apache.spark.sql.types.StringType)
      .add("ts", org.apache.spark.sql.types.TimestampType)
    val stream = spark.readStream.schema(schema).parquet(tmp + "/a.parquet")
    val q = graft.streaming.DedupStream
      .nearDedupStream(stream, "doc_id", "text", "ts")
      .writeStream.outputMode("append").format("memory")
      .queryName("neardup_stream_spec").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("neardup_stream_spec")
    val gotSigs = got
      .select(graft.operators.Dedup.simhash(graft.operators.Dedup.wordSet(col("text"))))
      .collect().map(_.getLong(0))
    val wantSigs = base
      .select(graft.operators.Dedup.simhash(graft.operators.Dedup.wordSet(col("text"))))
      .distinct().collect().map(_.getLong(0))
    // one survivor per distinct signature, no signature lost
    assert(gotSigs.length === gotSigs.distinct.length, "a signature survived twice")
    assert(gotSigs.toSet === wantSigs.toSet)
  }

  test("streaming as-of finalizes matches identical to the batch asOfJoin") {
    val lookbackMs = 2L * 3600 * 1000
    val stream = EventStreams.readEventStream(spark, sf)
      .filter(col("event_type").isin("click", "view"))
      .withWatermark("ts", "2 hours")
      .select(col("user_id"), col("ts"),
        (col("event_type") === "click").as("left"),
        when(col("event_type") === "click", col("event_id")).otherwise(0L).as("lid"),
        when(col("event_type") === "view", col("value")).otherwise(0.0).as("v"))
    val q = graft.streaming.AsOfStream.matches(stream, lookbackMs)
      .writeStream.outputMode("append").format("memory")
      .queryName("asof_stream_spec").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("asof_stream_spec").collect()
      .map(r => r.getAs[Long]("lid") ->
        ((Option(r.get(r.fieldIndex("matched_ms"))),
          Option(r.get(r.fieldIndex("view_value")))))).toMap

    val e = Tables.events(spark, sf)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        unix_millis(col("ts")).as("cts"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), unix_millis(col("ts")).as("vts"),
        col("value").as("view_value"))
    val want = graft.operators.TemporalJoin
      .asOfJoin(clicks, views, "user_id", "cts", "vts",
        tolerance = Some(lookbackMs))
      .collect()
      .map(r => r.getAs[Long]("click_id") ->
        ((Option(r.get(r.fieldIndex("matched_ts"))),
          Option(r.get(r.fieldIndex("view_value")))))).toMap

    // the stream can only finalize lefts the final watermark passed —
    // every emitted match must equal the batch answer, and the
    // watermark must have finalized a meaningful share
    assert(got.nonEmpty && got.size >= want.size / 2,
      s"only ${got.size} of ${want.size} clicks finalized")
    got.foreach { case (lid, g) =>
      assert(g == want(lid), s"click $lid: stream $g vs batch ${want(lid)}")
    }
  }

  test("CoverageStream seals islands identical to the batch q115 fold, exactly once") {
    import graft.streaming.CoverageStream
    val dur = (get_json_object(col("props"), "$.k").cast("long") % 30 + 1) * 60000L
    val stream = EventStreams.readEventStream(spark, sf)
      .filter(col("user_id").isNotNull && col("props").isNotNull)
      .withWatermark("ts", "2 hours")
      .select(col("user_id"), col("ts"), col("event_id").as("eid"), dur.as("dur_ms"))
    val q = CoverageStream.islands(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("coverage_stream_spec").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("coverage_stream_spec").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_ms"),
        r.getAs[Long]("end_ms"), r.getAs[Long]("covered_ms")))
    assert(got.length === got.distinct.length, "an island sealed twice")
    got.foreach { case (_, s, e, c) => assert(c == e - s && e > s) }

    // batch reference: the q115 fold per user over ALL events
    val evs = Tables.events(spark, sf)
      .filter(col("user_id").isNotNull && col("props").isNotNull)
      .select(col("user_id"), unix_millis(col("ts")).as("tms"),
        col("event_id").as("eid"), dur.as("dur_ms"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = evs.groupBy(_._1).flatMap { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val islands = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      var open: Option[(Long, Long)] = None
      sorted.foreach { case (_, s0, _, d) =>
        val e0 = s0 + d
        open = open match {
          case Some((s, e)) if s0 <= e => Some((s, math.max(e, e0)))
          case Some((s, e)) => islands += ((u, s, e, e - s)); Some((s0, e0))
          case None => Some((s0, e0))
        }
      }
      open.foreach { case (s, e) => islands += ((u, s, e, e - s)) }
      islands
    }.toSet
    // every sealed island must be a batch island verbatim, and the
    // watermark must have sealed a meaningful share
    assert(got.nonEmpty && got.size >= want.size / 2,
      s"only ${got.size} of ${want.size} islands sealed")
    got.foreach(i => assert(want.contains(i), s"island $i not in batch fold"))
  }

  test("CoverageStream.updateUser: out-of-order merge inside the lateness window, " +
    "strict-boundary pending, sealing only below the watermark") {
    import graft.streaming.CoverageStream
    import graft.streaming.CoverageStream.{Ev, Island, St}
    def mkState(st: Option[St], wm: Long): org.apache.spark.sql.streaming.TestGroupState[St] =
      org.apache.spark.sql.streaming.TestGroupState.create[St](
        st.map(org.apache.spark.api.java.Optional.of(_))
          .getOrElse(org.apache.spark.api.java.Optional.empty()),
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout,
        0L, org.apache.spark.api.java.Optional.of(java.lang.Long.valueOf(wm)), false)
    def ev(ts: Long, eid: Long, dur: Long) =
      Ev(1L, new java.sql.Timestamp(ts), eid, dur)
    // batch 1, wm=0: nothing ripe — everything pends
    val st1 = mkState(None, 0L)
    val out1 = CoverageStream.updateUser(1L,
      Iterator(ev(1000, 1, 500), ev(100, 2, 500)), st1).toSeq
    assert(out1.isEmpty && st1.get.pending.size == 2 && st1.get.open.isEmpty)
    // batch 2, wm=1500: both ripen OUT OF ORDER and merge
    // ([100,600] then [1000,1500] — gap -> two islands, first seals
    // (end 600 < wm), second has end 1500 == wm -> stays open
    val st2 = mkState(Some(st1.get), 1500L)
    val out2 = CoverageStream.updateUser(1L, Iterator.empty, st2).toSeq
    assert(out2 == Seq(Island(1L, 100, 600, 500)), s"got $out2")
    assert(st2.get.open.contains((1000L, 1500L)))
    // an event AT the watermark pends (strict <)
    val st3 = mkState(Some(st2.get), 1500L)
    val out3 = CoverageStream.updateUser(1L, Iterator(ev(1500, 3, 100)), st3).toSeq
    assert(out3.isEmpty && st3.get.pending == List((1500L, 3L, 100L)))
    // wm passes everything: 1500-event merges? no — it STARTS at the
    // open island's end boundary (1500 <= 1500 merges by the batch
    // rule), extending to 1600; island seals at wm 2000
    val st4 = mkState(Some(st3.get), 2000L)
    val out4 = CoverageStream.updateUser(1L, Iterator.empty, st4).toSeq
    assert(out4 == Seq(Island(1L, 1000, 1600, 600)), s"got $out4")
    assert(!st4.exists || (st4.get.pending.isEmpty && st4.get.open.isEmpty))
  }

  test("hash-gated sampling is stateless and streaming-safe: stream == batch sample") {
    val q = graft.operators.Sampling
      .hashSample(EventStreams.readEventStream(spark, sf), "event_id", 0.3)
      .select("event_id").writeStream.outputMode("append").format("memory")
      .queryName("sample_stream_spec").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("sample_stream_spec").collect().map(_.getLong(0)).toSet
    val want = graft.operators.Sampling
      .hashSample(Tables.events(spark, sf), "event_id", 0.3)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got.nonEmpty && got == want)
  }

  test("streaming attribution interval join reconciles with the batch range join") {
    def side() = EventStreams.readEventStream(spark, sf)
    val pairs = graft.streaming.AttributionStream.attributedPairs(
      side().filter(col("event_type") === "view"),
      side().filter(col("event_type") === "purchase"))
    val q = pairs.writeStream.outputMode("append").format("memory")
      .queryName("attrib_spec").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("attrib_spec")
      .select(col("purchase_id"), unix_micros(col("vts")).as("vts")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val e = Tables.events(spark, sf)
    val hourUs = 3600L * 1000000
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        unix_micros(col("ts")).as("pts"))
      .withColumn("w_start", col("pts") - hourUs).withColumn("w_end", col("pts"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), unix_micros(col("ts")).as("vts"))
    val want = graft.operators.TemporalJoin.rangeJoin(views, purchases, "user_id",
        "vts", "w_start", "w_end", hourUs)
      .select(col("purchase_id"), col("vts")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.nonEmpty)
    assert(got === want)
  }

  test("frameSampleBatch/resizeBatch/featureBatch: shapes, edges, and ANN composition") {
    import spark.implicits._
    val payloads = Seq(
      (1L, Array.tabulate(200)(_.toByte)),  // 200 bytes -> 4 frames of 64
      (2L, Array[Byte]()),                  // empty -> 1 empty frame
      (3L, Array.tabulate(64)(i => (i * 3).toByte))
    ).toDF("id", "payload")
    val frames = Multimodal.frameSampleBatch(payloads, stride = 2, frameBytes = 64).collect()
    val byDoc = frames.groupBy(_.getAs[Long]("id"))
    // doc1: frames 0 and 2 (stride 2 of 4); doc2: single empty frame; doc3: frame 0
    assert(byDoc(1L).map(_.getAs[Int]("frame_idx")).sorted.toSeq === Seq(0, 2))
    assert(byDoc(1L).find(_.getAs[Int]("frame_idx") == 2).get
      .getAs[Array[Byte]]("frame").length === 64)
    assert(byDoc(2L).map(_.getAs[Array[Byte]]("frame").length).toSeq === Seq(0))
    assert(byDoc(3L).map(_.getAs[Int]("frame_idx")).toSeq === Seq(0))

    val resized = Multimodal.resizeBatch(payloads, w = 64, h = 64).collect()
    resized.foreach { r =>
      assert(r.getAs[Int]("width") === 64)
      assert(r.getAs[Array[Byte]]("payload").length === 64 * 64 / 256)
    }

    // features are embedding-shaped and compose with Similarity ANN
    val feats = Multimodal.featureBatch(payloads.filter(col("id") =!= 2), dim = 8)
    val topk = graft.operators.Similarity.bruteForceTopK(
      feats.select(col("id").as("qid"), col("features").as("vec")),
      feats.select(col("id").as("cid"), col("features").as("vec")), k = 1)
      .collect()
    assert(topk.length === 2) // each of the 2 docs finds the other
    feats.collect().foreach { r =>
      val f = r.getSeq[Float](r.fieldIndex("features"))
      assert(f.length === 8 && f.forall(v => v >= 0.0f && v <= 1.0f))
    }
  }

  test("as-of finality is strict: a left at exactly the watermark waits for " +
       "an equal-timestamp right") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    import graft.streaming.AsOfStream
    def mkState(st: Option[AsOfStream.St], wm: Long): TestGroupState[AsOfStream.St] =
      TestGroupState.create[AsOfStream.St](
        st.map(Optional.of[AsOfStream.St]).getOrElse(Optional.empty[AsOfStream.St]()),
        GroupStateTimeout.EventTimeTimeout, 0L,
        Optional.of(wm), hasTimedOut = false)
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    // trigger 1: a left lands exactly AT the watermark — Spark still
    // admits rows with event time == watermark, so an equal-timestamp
    // right may yet arrive; the left must stay pending (the pre-fix
    // partition on <= wm emitted it unmatched here)
    val s1 = mkState(None, 5000L)
    val out1 = AsOfStream.updateUser(1000L)(1L,
      Iterator(AsOfStream.Row(1L, ts(5000), left = true, lid = 10L, v = 0.0)), s1).toSeq
    assert(out1.isEmpty, "left at lts == watermark must not finalize yet")
    assert(s1.exists && s1.get.lefts == List((5000L, 10L)))
    // trigger 2: the rts == lts == wm right arrives; left still pending
    val s2 = mkState(Some(s1.get), 5000L)
    val out2 = AsOfStream.updateUser(1000L)(1L,
      Iterator(AsOfStream.Row(1L, ts(5000), left = false, lid = 0L, v = 42.0)), s2).toSeq
    assert(out2.isEmpty && s2.exists)
    // trigger 3: watermark passes; the left finalizes WITH the match —
    // and the boundary right at (wm - lookback) survives eviction
    val s3 = mkState(Some(s2.get), 6000L)
    val out3 = AsOfStream.updateUser(1000L)(1L, Iterator.empty, s3).toSeq
    assert(out3 == Seq(AsOfStream.Out(10L, 1L, 5000L, Some(5000L), Some(42.0))))
    assert(s3.exists && s3.get.rights == List((5000L, 42.0)))
  }

  test("decodeBatch parses real PNG/JPEG/GIF headers and rejects junk honestly") {
    val payloads = Tables.documents(spark, sf)
      .select(col("doc_id").as("id"),
        Multimodal.syntheticMediaUdf(col("doc_id")).as("payload"))
    val out = Multimodal.decodeBatch(payloads, batchSize = 16).collect()
    assert(out.length === payloads.count())
    // every decoded row matches the closed forms the synthesizer
    // encoded into the genuine header byte layouts
    out.foreach { r =>
      val id = r.getAs[Long]("id")
      assert(r.getAs[Int]("width") === 16 + (id % 1000).toInt)
      assert(r.getAs[Int]("height") === 16 + ((id * 7) % 1000).toInt)
      assert(r.getAs[String]("format") ===
        Seq("png", "jpeg", "gif")((id % 3).toInt))
      assert(r.getAs[Int]("n_bytes") === Seq(33, 27, 10)((id % 3).toInt))
    }
  }

  test("CapStream admits at most cap docs per group across micro-batches, " +
    "state carrying over") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(String, Long)]
    val q = graft.streaming.CapStream
      .admitted(ms.toDF.toDF("source", "doc_id"), "source", "doc_id", cap = 3)
      .writeStream.outputMode("append").format("memory")
      .queryName("cap_stream_spec").start()
    try {
      // batch 1: group a saturates (5 arrivals, lowest 3 ids admitted
      // within the batch), group b admits 2 of 2
      ms.addData(Seq(("a", 15L), ("a", 11L), ("a", 13L), ("a", 12L), ("a", 14L),
        ("b", 1L), ("b", 2L)))
      q.processAllAvailable()
      // batch 2: a is full -> 0 admitted; b has 1 slot left
      ms.addData(Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cap_stream_spec")
      .as[(String, Long, Int)].collect().toSet
    assert(got == Set(
      ("a", 11L, 1), ("a", 12L, 2), ("a", 13L, 3),
      ("b", 1L, 1), ("b", 2L, 2), ("b", 3L, 3)))
    // pure-function check: a saturated group admits nothing more
    val st = org.apache.spark.sql.streaming.TestGroupState.create[
      graft.streaming.CapStream.CapState](
      org.apache.spark.api.java.Optional.of(graft.streaming.CapStream.CapState(3)),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      0L, org.apache.spark.api.java.Optional.empty(), false)
    val out = graft.streaming.CapStream.updateGroup(3)("a",
      Iterator(graft.streaming.CapStream.Doc("a", 99L)), st)
    assert(out.isEmpty)
  }

  test("map-side curation gates are stream-safe: gopher rules, blocklist, " +
    "PII redaction and C4 line cleaning produce identical rows on a stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.TextAnalysis
    val rows = Seq(
      (1L, "the data have to be with that and more words here ok."),
      (2L, "dup dup dup"),
      (3L, "mail me at a.b@example.com or call 12345678\nshort.\n" +
        "a full line with five words."),
      (4L, ""))
    def gates(df: org.apache.spark.sql.DataFrame) = {
      val g = TextAnalysis.gopherFlags(df, "doc_id", "text")
        .select($"id", $"n_words", $"n_stopwords", $"passes")
      val b = TextAnalysis.blocklist(df, "doc_id", "text", Seq("dup"))
        .select($"id", $"n_blocked", $"keep".as("bl_keep"))
      val p = TextAnalysis.piiStats(df, "doc_id", "text")
      val c = TextAnalysis.c4LineClean(df, "doc_id", "text")
        .select($"id", $"n_kept", $"clean_text")
      val d = TextAnalysis.charDiversity(df, "doc_id", "text")
        .select($"id", $"sum_sq", $"simpson")
      g.join(b, "id").join(p, "id").join(c, "id").join(d, "id")
    }
    val batch = gates(rows.toDF("doc_id", "text")).collect().map(_.toSeq).toSet
    val ms = MemoryStream[(Long, String)]
    val q = gates(ms.toDF.toDF("doc_id", "text"))
      .writeStream.outputMode("append").format("memory")
      .queryName("curation_gates_stream").start()
    try {
      ms.addData(rows.take(2)); q.processAllAvailable()
      ms.addData(rows.drop(2)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("curation_gates_stream").collect().map(_.toSeq).toSet
    assert(streamed === batch, "stream and batch gate results differ")
    assert(batch.size == rows.size)
  }

  test("Jpeg decoder: within +/-1 gray level of the JDK's independent " +
    "ImageIO decode; rejects color/progressive/corrupt honestly") {
    import graft.operators.Jpeg
    def grayImage(w: Int, h: Int, f: (Int, Int) => Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, f(x, y) & 0xff)
      img
    }
    def jpegBytes(img: java.awt.image.BufferedImage, quality: Float): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val params = writer.getDefaultWriteParam
      params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      params.setCompressionQuality(quality)
      writer.setOutput(javax.imageio.ImageIO.createImageOutputStream(out))
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
      writer.dispose()
      out.toByteArray
    }
    // smooth gradient, checkerboard, and a noisy pattern, at sizes
    // that exercise partial edge blocks; two quality levels
    val fixtures = Seq(
      (16, 16, (x: Int, y: Int) => x * 8 + y * 8),
      (17, 9, (x: Int, y: Int) => if ((x / 4 + y / 4) % 2 == 0) 40 else 215),
      (24, 13, (x: Int, y: Int) => (x * 37 + y * 101 + x * y * 7) % 256))
    for ((w, h, f) <- fixtures; quality <- Seq(0.95f, 0.6f)) {
      val bytes = jpegBytes(grayImage(w, h, f), quality)
      val mine = Jpeg.decode(bytes)
      assert(mine.isDefined, s"decode failed at ${w}x$h q$quality")
      val r = mine.get
      assert(r.width == w && r.height == h && r.channels == 1)
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w) {
        val d = math.abs((r.pixels(y * w + x) & 0xff) - ref.getRaster.getSample(x, y, 0))
        if (d > maxDiff) maxDiff = d
      }
      assert(maxDiff <= 1,
        s"IDCT deviation $maxDiff > 1 vs ImageIO at ${w}x$h q$quality")
    }
    // color baseline is IN the envelope since r7 (JpegColorSpec owns
    // its parity pins) — here just assert it decodes as 3-channel
    val colorImg = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val colorBytes = {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(colorImg, "jpg", out)
      out.toByteArray
    }
    val colorDec = Jpeg.decode(colorBytes)
    assert(colorDec.isDefined && colorDec.get.channels == 3,
      "color baseline decodes since r7")
    // honest None: junk, truncated scan
    assert(Jpeg.decode("not a jpeg".getBytes).isEmpty)
    val good = jpegBytes(grayImage(16, 16, (x, y) => x + y), 0.9f)
    assert(Jpeg.decode(good.dropRight(good.length / 3)).isEmpty, "truncated scan")
  }

  test("rasterFeatures: hand-computed surfaces; decodeAnyRaster sniffs " +
    "PNG and JPEG payloads") {
    import graft.operators.{Jpeg, Multimodal}
    val r = Multimodal.Raster(2, 2, 1, Array[Byte](10, 20, 30, 40))
    val (sum, sq, gx, gy, bins, feat) = Multimodal.rasterFeatures(r)
    assert(sum == 100L && sq == 3000L && gx == 20L && gy == 40L)
    assert(bins.toSeq == Seq(1L, 2L, 1L) ++ Seq.fill(13)(0L))
    assert(feat(0) == 25.0f)
    assert(feat(4) == 0.25f && feat(5) == 0.5f && feat(6) == 0.25f)
    // sniff: the PNG synthetic payload and a JPEG byte stream both
    // decode through the same entry point
    val png = Multimodal.Png.encode(Multimodal.syntheticRaster(3L))
    assert(Multimodal.decodeAnyRaster(png).isDefined)
    val jpg = Multimodal.syntheticJpegGray(5L)
    val viaAny = Multimodal.decodeAnyRaster(jpg)
    assert(viaAny.isDefined && viaAny.get.pixels.toSeq ==
      Jpeg.decode(jpg).get.pixels.toSeq)
    assert(Multimodal.decodeAnyRaster("neither".getBytes).isEmpty)
  }

  test("Png codec: encode/decode round-trips every filter type and color " +
    "type; rejects the unsupported subset honestly") {
    import Multimodal.{Png, Raster}
    // heights >= 6 so the y % 5 filter cycle covers all five types;
    // widths include 1 (no left neighbor anywhere) and odd sizes
    for (ch <- Seq(1, 3, 4); (w, h) <- Seq((1, 6), (3, 7), (8, 6), (5, 11))) {
      val px = Array.tabulate(w * h * ch)(i => ((i * 37 + 11) % 256).toByte)
      val r = Raster(w, h, ch, px)
      val back = Png.decode(Png.encode(r))
      assert(back.isDefined, s"round trip failed at $w x $h x $ch")
      assert(back.get.width == w && back.get.height == h && back.get.channels == ch)
      assert(java.util.Arrays.equals(back.get.pixels, px),
        s"pixels differ at $w x $h x $ch")
    }
    // resize: nearest-neighbor floor mapping, checked by hand
    val src = Raster(4, 2, 1, Array.tabulate(8)(_.toByte))
    val up = Png.resizeNearest(src, 8, 2)
    assert(up.pixels.toSeq == Seq[Byte](0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7))
    val down = Png.resizeNearest(src, 2, 1)
    assert(down.pixels.toSeq == Seq[Byte](0, 2))
    // honest None on: junk, the header-only synthetic PNG (no
    // IDAT/IEND), a corrupted CRC, and a truncated IDAT stream
    assert(Png.decode("not a png".getBytes).isEmpty)
    assert(Png.decode(Multimodal.syntheticMedia(0L)).isEmpty)
    val good = Png.encode(Raster(3, 3, 1, new Array[Byte](9)))
    val badCrc = good.clone(); badCrc(badCrc.length - 1) = (badCrc.last ^ 1).toByte
    assert(Png.decode(badCrc).isEmpty)
    val truncated = java.util.Arrays.copyOf(good, good.length - 13) // drop IEND + a byte
    assert(Png.decode(truncated).isEmpty)
    // a 16-bit-depth PNG is outside the subset: flip the depth byte
    // (and fix the IHDR CRC) -> None, never garbage pixels
    val deep = good.clone()
    deep(24) = 16.toByte // IHDR bit-depth field
    val crc = new java.util.zip.CRC32()
    crc.update(deep, 12, 4 + 13)
    val cv = crc.getValue.toInt
    deep(29) = (cv >>> 24).toByte; deep(30) = (cv >>> 16).toByte
    deep(31) = (cv >>> 8).toByte; deep(32) = cv.toByte
    assert(Png.decode(deep).isEmpty)
  }

  test("resizeBatch takes the real pixel path for decodable PNGs and the " +
    "stub for everything else") {
    import spark.implicits._
    import Multimodal.{Png, Raster}
    val ids = spark.range(0, 30).select(col("id"))
    val payloads = ids.select(col("id"),
      Multimodal.syntheticPngUdf(col("id")).as("payload"))
    val out = Multimodal.resizeBatch(payloads, w = 8, h = 8).collect()
    assert(out.length == 30)
    out.foreach { r =>
      val id = r.getAs[Long]("id")
      val dec = Png.decode(r.getAs[Array[Byte]]("payload"))
      assert(dec.isDefined, s"resized payload of $id is not a valid PNG")
      val expect = Png.resizeNearest(Multimodal.syntheticRaster(id), 8, 8)
      assert(dec.get.channels == expect.channels)
      assert(java.util.Arrays.equals(dec.get.pixels, expect.pixels),
        s"resized pixels differ for id $id")
    }
    // non-PNG payloads (q71's text bytes) still take the stub path
    val stub = Multimodal.resizeBatch(
      Seq((1L, "just text".getBytes)).toDF("id", "payload"), w = 64, h = 64).collect()
    assert(stub.head.getAs[Array[Byte]]("payload").length == 64 * 64 / 256)
  }

  test("WavDecoder: chunk walk with odd-size padding and ancillary chunks; " +
    "honest None on non-PCM, truncation, and inconsistent headers") {
    import Multimodal.WavDecoder.decode
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, data: Array[Byte]) =
      id.getBytes("US-ASCII") ++ le32(data.length) ++ data ++
        (if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def fmt(rate: Int, ch: Int, bits: Int, audioFmt: Int = 1,
            byteRateOverride: Int = -1) = {
      val ba = ch * bits / 8
      val br = if (byteRateOverride >= 0) byteRateOverride else rate * ba
      chunk("fmt ", le16(audioFmt) ++ le16(ch) ++ le32(rate) ++ le32(br) ++
        le16(ba) ++ le16(bits))
    }
    def wav(chunks: Array[Byte]*) = {
      val body = "WAVE".getBytes("US-ASCII") ++ chunks.flatten
      "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    }
    // an odd-sized LIST chunk before fmt exercises RIFF's even padding
    val good = wav(chunk("LIST", Array.fill(7)(0x41.toByte)),
      fmt(16000, 2, 16), chunk("data", new Array[Byte](64)))
    assert(decode(good) === Some((16000, 2, 16, 64L)))
    // the driver-gated synthetic payloads decode to their closed forms
    assert(decode(Multimodal.syntheticWav(7L)) ===
      Some((8000 + (7 % 5) * 4000, 1 + (7 % 2).toInt, 16, ((100 + 7) * 2 * 2).toLong)))
    // honest None: not RIFF, compressed format, truncated data chunk,
    // byte rate inconsistent with the PCM parameters
    assert(decode("not audio at all".getBytes).isEmpty)
    assert(decode(wav(fmt(8000, 1, 16, audioFmt = 2),
      chunk("data", new Array[Byte](8)))).isEmpty)
    val truncated = good.dropRight(10)
    assert(decode(truncated).isEmpty)
    assert(decode(wav(fmt(8000, 1, 16, byteRateOverride = 999),
      chunk("data", new Array[Byte](8)))).isEmpty)
  }

  test("WavDecoder.pcm16Stats: exact sample statistics off real int16 bytes; " +
    "rejects non-16-bit and odd data lengths") {
    import Multimodal.WavDecoder.pcm16Stats
    // hand-built mono PCM16 with known samples: 3, -2, 0, -1, 5
    // sum 5, sumSq 9+4+0+1+25=39, min -2, max 5,
    // crossings (3,-2) (−2,0) (0,−1) (−1,5) = 4 (zero counts non-negative)
    val samples = Array[Short](3, -2, 0, -1, 5)
    val b = java.nio.ByteBuffer.allocate(44 + 10)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + 10)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
    b.put("data".getBytes("US-ASCII")).putInt(10)
    samples.foreach(b.putShort)
    assert(pcm16Stats(b.array()) === Some((5L, 5L, 39L, -2, 5, 4L)))
    // the driver-gated synthetic payloads: stats match the generator
    // formula computed independently
    val id = 13L
    val n = 200 + (id % 300).toInt
    val gen = Array.tabulate(n)(i => (((id * 31 + i.toLong * 7919) % 65536) - 32768).toInt)
    val Some((gn, gSum, gSq, gMn, gMx, gZc)) =
      pcm16Stats(Multimodal.syntheticWavPcm16(id))
    assert(gn == n.toLong && gSum == gen.map(_.toLong).sum &&
      gSq == gen.map(s => s.toLong * s).sum &&
      gMn == gen.min && gMx == gen.max)
    val expZc = gen.sliding(2).count(p => (p(0) < 0) != (p(1) < 0))
    assert(gZc == expZc.toLong && gZc > 10L,
      s"sawtooth must cross densely, got $gZc")
    // PCM8 payloads (q95's id%3==0 class) reject: not 16-bit
    assert(pcm16Stats(Multimodal.syntheticWav(9L)).isEmpty)
    // odd data length contradicts int16 frames
    val odd = b.array().clone()
    // patch the data chunk length to 9 (offset 40, little-endian)
    odd(40) = 9.toByte
    assert(pcm16Stats(odd.dropRight(1)).isEmpty)
  }

  test("WavDecoder.haarEnergies: matches a recursive reference, satisfies " +
    "the multiresolution energy identity, and rejects non-PCM16") {
    import Multimodal.WavDecoder.haarEnergies
    // recursive reference on plain Long arrays
    def ref(a: Seq[Long]): (Seq[Long], Long) =
      if (a.length == 1) (Nil, a.head * a.head)
      else {
        val pairs = a.grouped(2).toSeq
        val e = pairs.map(p => (p(0) - p(1)) * (p(0) - p(1))).sum
        val (rest, ap) = ref(pairs.map(p => p(0) + p(1)))
        (e +: rest, ap)
      }
    Seq(3L, 17L, 100L).foreach { id =>
      val gen = Array.tabulate(64)(i =>
        (((id * 31 + i.toLong * 7919) % 65536) - 32768))
      val Some((es, ap)) = haarEnergies(Multimodal.syntheticWavPcm16(id), 64, 6)
      val (wantE, wantAp) = ref(gen.toSeq)
      assert(es.toSeq === wantE, s"id=$id")
      assert(ap === wantAp)
      // the identity tying q145's surface to q97's sum_sq over the
      // frame: approx^2 + sum_k 2^(6-k) E_k == 64 * sum s^2
      val frameSq = gen.map(s => s * s).sum
      assert(ap + es.zipWithIndex.map { case (e, i) => e << (5 - i) }.sum
        === 64L * frameSq, s"id=$id")
    }
    // shorter-than-frame files zero-pad: hand WAV with samples 1, -1
    val b = java.nio.ByteBuffer.allocate(44 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + 4)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
    b.put("data".getBytes("US-ASCII")).putInt(4)
    b.putShort(1).putShort(-1)
    val Some((es2, ap2)) = haarEnergies(b.array(), 4, 2)
    // a0 = [1,-1,0,0]: level1 sums [0,0] diffs [2,0] -> E1 = 4;
    // level2 sum 0 diff 0 -> E2 = 0; approx 0
    assert(es2.toSeq === Seq(4L, 0L) && ap2 === 0L)
    // PCM8 rejects; frame != 2^levels raises
    assert(haarEnergies(Multimodal.syntheticWav(9L), 64, 6).isEmpty)
    intercept[IllegalArgumentException](haarEnergies(b.array(), 48, 6))
  }

  test("Multimodal.dhash: hand-checked bits, BT.601 integer luma, and " +
    "2x-replication invariance (the perceptual property)") {
    import Multimodal.{Raster, dhash, lumaAt, syntheticRaster}
    // 2x1 gray [10, 200]: grid x(j) = j*2/9 -> 0 for j<=4, 1 for j>=5,
    // so the only rising pair is j=4 -> bit i*8+4 for every i
    val (hi, lo) = dhash(Raster(2, 1, 1, Array(10.toByte, 200.toByte)))
    assert(lo === ((1L << 4) | (1L << 12) | (1L << 20) | (1L << 28)))
    assert(hi === ((1L << 4) | (1L << 12) | (1L << 20) | (1L << 28)))
    // BT.601 integer luma with the pinned div-1000
    assert(lumaAt(Raster(1, 1, 3,
      Array(100.toByte, 200.toByte, 50.toByte)), 0, 0)
      === (299 * 100 + 587 * 200 + 114 * 50) / 1000)
    // alpha ignored on RGBA
    assert(lumaAt(Raster(1, 1, 4,
      Array(10.toByte, 20.toByte, 30.toByte, 250.toByte)), 0, 0)
      === (299 * 10 + 587 * 20 + 114 * 30) / 1000)
    // perceptual invariance: pixel-replicated 2x upscale hashes
    // identically (floor(floor(2a)/2) == floor(a) for the grid map)
    def rep2(r: Raster): Raster = {
      val px = new Array[Byte](r.width * 2 * r.height * 2 * r.channels)
      var y = 0
      while (y < r.height * 2) {
        var x = 0
        while (x < r.width * 2) {
          var c = 0
          while (c < r.channels) {
            px((y * r.width * 2 + x) * r.channels + c) =
              r.pixels(((y / 2) * r.width + x / 2) * r.channels + c)
            c += 1
          }
          x += 1
        }
        y += 1
      }
      Raster(r.width * 2, r.height * 2, r.channels, px)
    }
    (1L to 12L).foreach { id =>
      val r = syntheticRaster(id)
      assert(dhash(rep2(r)) === dhash(r), s"id=$id")
    }
  }

  test("Multimodal.dhashBatch decodes PNG, JPEG and GIF payloads " +
    "(magic sniff, not PNG-only) and sentinels undecodables as width 0 " +
    "so the width > 0 banding filter excludes them") {
    import spark.implicits._
    import Multimodal.{dhash, decodeAnyRaster, syntheticRaster,
      syntheticJpegGray, syntheticGif, Png}
    val png = Png.encode(syntheticRaster(3L))
    val jpg = syntheticJpegGray(4L)
    val gif = syntheticGif(5L)
    val junk = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10)
    val df = Seq((1L, png), (2L, jpg), (3L, gif), (4L, junk))
      .toDF("id", "payload")
    val out = Multimodal.dhashBatch(df).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4))).toMap
    // each decodable format matches dhash over its own decoder
    Seq(1L -> png, 2L -> jpg, 3L -> gif).foreach { case (id, bytes) =>
      val r = decodeAnyRaster(bytes).get
      val (hi, lo) = dhash(r)
      assert(out(id) === ((r.width, r.height, hi, lo)), s"id=$id")
    }
    // undecodable: width-0 sentinel, kept for accounting...
    assert(out(4L) === ((0, 0, 0L, 0L)))
    // ...and excluded by the documented banding-side contract filter
    val banded = Multimodal.dhashBatch(df)
      .filter(col("width") > 0).select("id").as[Long].collect().sorted
    assert(banded.toSeq === Seq(1L, 2L, 3L))
  }

  test("HeaderDecoder handles fill bytes, big dims, and corrupt streams") {
    import Multimodal.HeaderDecoder.decode
    // JPEG with fill FFs before SOF2 (progressive) and a skipped
    // comment segment; dims above 255 exercise both u16 bytes
    val jpeg = (Array(0xff, 0xd8) ++
      Array(0xff, 0xfe, 0x00, 0x04, 0x41, 0x42) ++ // COM, len 4
      Array(0xff, 0xff) ++                         // fill byte
      Array(0xff, 0xc2, 0x00, 0x0b, 0x08, 0x04, 0x00, 0x03, 0x20, 0x01, 0x22, 0x00, 0x00))
      .map(_.toByte)
    val m = decode(7L, jpeg)
    assert(m.format == "jpeg" && m.width == 0x320 && m.height == 0x400)
    // truncated JPEG (SOI only), wrong PNG signature, empty payload
    assert(decode(1L, Array(0xff, 0xd8).map(_.toByte)).format == "unknown")
    assert(decode(2L, "not an image".getBytes).format == "unknown")
    assert(decode(3L, Array.empty[Byte]).format == "unknown")
    val meta0 = decode(4L, Array.empty[Byte])
    assert(meta0.width == 0 && meta0.height == 0 && meta0.n_bytes == 0)
    // a JPEG whose scan hits SOS before any SOF reports unknown
    val sosFirst = Array(0xff, 0xd8, 0xff, 0xda, 0x00, 0x02).map(_.toByte)
    assert(decode(5L, sosFirst).format == "unknown")
    // GIF87a variant parses too
    val gif87 = (Array[Int]('G', 'I', 'F', '8', '7', 'a', 0x34, 0x12, 0x78, 0x56))
      .map(_.toByte)
    val g = decode(6L, gif87)
    assert(g.format == "gif" && g.width == 0x1234 && g.height == 0x5678)
  }

  test("HeaderDecoder TIFF: both endians, LONG-typed dims, corrupt IFDs honest") {
    import Multimodal.HeaderDecoder.decode
    // generator round-trip, both parities
    for (id <- Seq(0L, 1L, 8L, 13L)) {
      val m = decode(id, Multimodal.syntheticTiff(id))
      assert(m.format == (if (id % 2 == 0) "tiff-le" else "tiff-be"), s"id=$id")
      assert(m.width == 3 + (id % 9).toInt && m.height == 2 + ((id * 3) % 9).toInt)
      assert(m.n_bytes == 38)
    }
    // hand-built BE TIFF with LONG (type 4) dims above 16 bits
    val be = (Array[Int]('M', 'M', 0, 0x2a, 0, 0, 0, 8, // magic + IFD@8
      0, 2, // 2 entries
      0x01, 0x00, 0, 4, 0, 0, 0, 1, 0x00, 0x01, 0x00, 0x10, // width LONG 65552
      0x01, 0x01, 0, 4, 0, 0, 0, 1, 0x00, 0x00, 0x00, 0x07, // height LONG 7
      0, 0, 0, 0)).map(_.toByte)
    val mBe = decode(20L, be)
    assert(mBe.format == "tiff-be" && mBe.width == 65552 && mBe.height == 7)
    // corrupt: IFD offset past the payload; entry table truncated;
    // dims missing (only one tag) — all honest unknown
    val badOff = (Array[Int]('I', 'I', 0x2a, 0, 0x40, 0, 0, 0)).map(_.toByte)
    assert(decode(21L, badOff).format == "unknown")
    val trunc = Multimodal.syntheticTiff(2L).take(16)
    assert(decode(22L, trunc).format == "unknown")
    val oneTag = (Array[Int]('I', 'I', 0x2a, 0, 8, 0, 0, 0,
      1, 0, 0x00, 0x01, 3, 0, 1, 0, 0, 0, 5, 0, 0, 0,
      0, 0, 0, 0)).map(_.toByte)
    assert(decode(23L, oneTag).format == "unknown")
  }

  test("Gif codec: ImageIO round-trip restores the closed-form RGB content; " +
    "hand-packed non-interlaced stream decodes; rejection cases honest") {
    import graft.operators.Multimodal
    import Multimodal.Gif
    // the q105 path: independent encoder (interlaced by default),
    // full RGB equality — stronger than the gate's channel sums
    for (id <- Seq(0L, 3L, 7L, 12L, 48L)) {
      val want = Multimodal.syntheticGifRaster(id)
      val got = Gif.decode(Multimodal.syntheticGif(id))
      assert(got.isDefined, s"decode failed for id=$id")
      assert(got.get.width == want.width && got.get.height == want.height
        && got.get.channels == 3)
      assert(java.util.Arrays.equals(got.get.pixels, want.pixels),
        s"pixels differ for id=$id")
    }
    // hand-built NON-interlaced GIF87a: 2x2, 4-color palette, LZW
    // minCode=2 (clear=4, eoi=5) — literals 0,1,2,3; the dictionary
    // reaches 8 entries after the third literal, so the last codes
    // widen to 4 bits mid-stream (the growth rule under test)
    def pack(codes: Seq[(Int, Int)]): Array[Byte] = {
      var acc = 0L; var nbits = 0
      val out = Seq.newBuilder[Byte]
      codes.foreach { case (c, width) =>
        acc |= c.toLong << nbits; nbits += width
        while (nbits >= 8) { out += (acc & 0xff).toByte; acc >>>= 8; nbits -= 8 }
      }
      if (nbits > 0) out += (acc & 0xff).toByte
      out.result().toArray
    }
    val lzwBody = pack(Seq((4, 3), (0, 3), (1, 3), (2, 3), (3, 4), (5, 4)))
    val palette = Array[Byte](10, 11, 12, 20, 21, 22, 30, 31, 32, 40, 41, 42)
    val tiny = Array.concat(
      "GIF87a".getBytes("US-ASCII"),
      Array[Byte](2, 0, 2, 0, (0x80 | 0x01).toByte, 0, 0), // screen: GCT, 4 colors
      palette,
      Array[Byte](0x2c, 0, 0, 0, 0, 2, 0, 2, 0, 0, // descriptor, no interlace
        2, lzwBody.length.toByte), lzwBody, Array[Byte](0, 0x3b))
    val t = Gif.decode(tiny)
    assert(t.isDefined && t.get.width == 2 && t.get.height == 2)
    assert(t.get.pixels.toSeq == palette.toSeq)
    // rejections: junk, truncated entropy stream, index past palette
    assert(Gif.decode("not a gif at all".getBytes).isEmpty)
    val full = Multimodal.syntheticGif(9L)
    assert(Gif.decode(java.util.Arrays.copyOf(full, full.length / 2)).isEmpty)
    val overrun = tiny.clone()
    // shrink the GCT claim to 2 colors: index 2/3 now overrun -> None
    overrun(10) = 0x80.toByte
    val shrunk = Array.concat(overrun.take(13), palette.take(6),
      overrun.drop(13 + palette.length))
    assert(Gif.decode(shrunk).isEmpty)
    // sniff via the shared entry point
    assert(Multimodal.decodeAnyRaster(full).isDefined)
  }

  test("BloomStream admits first sight exactly once across micro-batches " +
    "in constant state, reconciling with a driver bloom replay") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.Bloom
    val buckets = 8; val m = 1 << 12; val k = 3
    // 300 distinct keys, each arriving twice (id and id+1000), split
    // so the repeat of an early key lands in a LATER batch
    val b1 = (0 until 200).map(i => (i.toLong, s"key-$i"))
    val b2 = (0 until 200).map(i => (i + 1000L, s"key-$i")) ++
      (200 until 300).map(i => (i.toLong, s"key-$i"))
    val ms = MemoryStream[(Long, String)]
    val q = graft.streaming.BloomStream
      .admitted(ms.toDF.toDF("doc_id", "key"), "doc_id", "key",
        buckets = buckets, mBitsPerBucket = m, k = k)
      .writeStream.outputMode("append").format("memory")
      .queryName("bloom_stream_spec").start()
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("bloom_stream_spec")
      .as[(Long, Int)].collect().map(_._1).toSet
    // driver replay: same buckets, same bitmaps, same batch/id order
    val bucketOf = (key: String) => {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"bloombucket:$key".getBytes("UTF-8"))
      (java.lang.Long.parseLong(md.map(b => f"$b%02x").mkString.take(15), 16)
        % buckets).toInt
    }
    val words = Array.fill(buckets)(new Array[Long](m / 64))
    val expect = Set.newBuilder[Long]
    Seq(b1, b2).foreach(batch =>
      batch.groupBy { case (_, key) => bucketOf(key) }.toSeq
        .foreach { case (b, rows) =>
          rows.sortBy(_._1).foreach { case (id, key) =>
            val ps = Bloom.positionsJvm(key, m, k)
            val seen = ps.forall(p => ((words(b)((p / 64).toInt) >>> (p % 64).toInt) & 1L) == 1L)
            if (!seen) {
              ps.foreach(p => words(b)((p / 64).toInt) |= 1L << (p % 64).toInt)
              expect += id
            }
          }
        })
    assert(got == expect.result())
    // no key admitted twice: the 200 batch-2 repeats all dropped
    assert(!got.exists(id => id >= 1000L))
    // false drops bounded: ≥ 280 of the 300 distinct keys admitted
    // (fill here is ~1.5%, so expected false drops ≈ 0)
    assert(got.size >= 280, s"only ${got.size} admitted")
  }

  test("TopKStream reconciles with batch counts across micro-batches " +
    "when shard capacity suffices (exact mode)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val b1 = Seq("a", "b", "a", "c", "d", "a", "b").zipWithIndex
      .map { case (t, i) => (t, i.toLong) }
    val b2 = Seq("c", "c", "a", "e", "b", "a").zipWithIndex
      .map { case (t, i) => (t, 100L + i) }
    val ms = MemoryStream[(String, Long)]
    val q = graft.streaming.TopKStream
      .summaries(ms.toDF.toDF("token", "eid"), "token", "eid", nShards = 4, k = 8)
      .writeStream.outputMode("update").format("memory")
      .queryName("topk_stream_spec").start()
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("topk_stream_spec")
      .as[(Int, String, Long, Long)].collect()
    // counts only grow in exact mode: the max per token is the final
    // summary value, and it must equal the batch count; err stays 0
    assert(rows.forall(_._4 == 0L), "err nonzero despite free capacity")
    val finalCount = rows.groupBy(_._2).view.mapValues(_.map(_._3).max).toMap
    val want = (b1 ++ b2).groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(finalCount == want, s"$finalCount != $want")
    // a token lives in exactly one shard
    assert(rows.groupBy(_._2).forall(_._2.map(_._1).distinct.size == 1))
  }

  test("TopKStream drops null tokens before sharding instead of " +
    "failing the Tok conversion") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(Option[String], Long)]
    val q = graft.streaming.TopKStream
      .summaries(ms.toDF.toDF("token", "eid"), "token", "eid", nShards = 2, k = 4)
      .writeStream.outputMode("update").format("memory")
      .queryName("topk_null_spec").start()
    try {
      ms.addData(Seq(Some("a") -> 0L, None -> 1L, Some("a") -> 2L, None -> 3L))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("topk_null_spec")
      .as[(Int, String, Long, Long)].collect()
    assert(rows.map(_._2).toSet === Set("a"))
    assert(rows.find(_._2 == "a").get._3 === 2L)
  }

  test("TopKStream: SpaceSaving invariants under eviction (k=3, single shard)") {
    import graft.streaming.TopKStream
    // skewed substream: one heavy token + a churn of singletons that
    // force evictions
    val toks = (Seq.fill(20)("hot") ++ (0 until 15).map(i => s"rare-$i") ++
      Seq.fill(6)("warm")).zipWithIndex.map { case (t, i) => TopKStream.Tok(0, t, i.toLong) }
    val st = org.apache.spark.sql.streaming.TestGroupState.create[TopKStream.ShardState](
      org.apache.spark.api.java.Optional.empty(),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      0L, org.apache.spark.api.java.Optional.empty(), false)
    val out = TopKStream.updateShard(3)(0, toks.iterator, st).toSeq
    val trueCount = toks.groupBy(_.token).view.mapValues(_.size.toLong).toMap
    val n = toks.size.toLong
    assert(out.size <= 3)
    out.foreach { s =>
      // overestimate bounded by err; count - err is a LOWER bound
      assert(s.count >= trueCount.getOrElse(s.token, 0L), s"$s undercounts")
      assert(s.count - s.err <= trueCount.getOrElse(s.token, 0L), s"$s err bound")
    }
    // the SpaceSaving guarantee: every token with true count > N/k
    // is tracked (N/k = 41/3 ≈ 13.7 -> "hot" at 20 must survive)
    trueCount.filter(_._2 > n / 3).keys.foreach { t =>
      assert(out.exists(_.token == t), s"heavy token $t evicted")
    }
    // determinism: identical input replays to the identical summary
    val st2 = org.apache.spark.sql.streaming.TestGroupState.create[TopKStream.ShardState](
      org.apache.spark.api.java.Optional.empty(),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      0L, org.apache.spark.api.java.Optional.empty(), false)
    assert(TopKStream.updateShard(3)(0, toks.iterator, st2).toSeq == out)
  }
}
