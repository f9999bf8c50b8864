package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TemporalJoin

/** TemporalJoin (as-of + bucketized range join) against hand-computed
  * fixtures and a brute-force formulation on real event data. */
class TemporalJoinSpec extends SparkSuite {
  import spark.implicits._

  private def leftDf: DataFrame = Seq(
    // (key, lts, tag)
    (1L, 100L, "a"), (1L, 200L, "b"), (1L, 50L, "c"),
    (2L, 100L, "d"), (3L, 100L, "e")
  ).toDF("k", "lts", "tag")

  private def rightDf: DataFrame = Seq(
    // (key, rts, v)
    (1L, 90L, 9.0), (1L, 100L, 10.0), (1L, 150L, 15.0),
    (2L, 300L, 30.0)
  ).toDF("k", "rts", "v")

  test("asOfJoin backward: most recent right at or before each left ts") {
    val out = TemporalJoin.asOfJoin(leftDf, rightDf, "k", "lts", "rts")
      .select($"tag", $"v", $"matched_ts").collect()
      .map(r => (r.getString(0), (Option(r.get(1)), Option(r.get(2))))).toMap
    assert(out("a") == ((Some(10.0), Some(100L))))  // ts=100 matches inclusively
    assert(out("b") == ((Some(15.0), Some(150L))))  // newest of 90/100/150
    assert(out("c") == ((None, None)))              // nothing at or before 50
    assert(out("d") == ((None, None)))              // right is later (300 > 100)
    assert(out("e") == ((None, None)))              // key 3 absent from right
  }

  test("asOfJoin forward: earliest right at or after each left ts") {
    val out = TemporalJoin.asOfJoin(leftDf, rightDf, "k", "lts", "rts",
        forward = true)
      .select($"tag", $"v", $"matched_ts").collect()
      .map(r => (r.getString(0), (Option(r.get(1)), Option(r.get(2))))).toMap
    assert(out("a") == ((Some(10.0), Some(100L))))  // inclusive at 100
    assert(out("b") == ((None, None)))              // nothing at or after 200
    assert(out("c") == ((Some(9.0), Some(90L))))    // earliest of 90/100/150
    assert(out("d") == ((Some(30.0), Some(300L))))
  }

  test("asOfJoin tolerance nulls distant matches but keeps the left row") {
    val out = TemporalJoin.asOfJoin(leftDf, rightDf, "k", "lts", "rts",
        tolerance = Some(30L))
      .select($"tag", $"v", $"matched_ts").collect()
      .map(r => (r.getString(0), (Option(r.get(1)), Option(r.get(2))))).toMap
    assert(out.size == 5)                           // as-of is a LEFT join
    assert(out("a") == ((Some(10.0), Some(100L))))  // distance 0 <= 30
    assert(out("b") == ((None, None)))              // 200 - 150 = 50 > 30
  }

  test("asOfJoin collapses right timestamp ties deterministically (max payload)") {
    val l = Seq((1L, 10L)).toDF("k", "lts")
    val r = Seq((1L, 5L, 1.0), (1L, 5L, 7.0), (1L, 5L, 3.0)).toDF("k", "rts", "v")
    val out = TemporalJoin.asOfJoin(l, r, "k", "lts", "rts").collect()
    assert(out.length == 1 && out(0).getAs[Double]("v") == 7.0)
  }

  test("asOfJoinNearest picks the closer side, ties backward, tolerance nulls") {
    val l = Seq((1L, 100L, "mid"), (1L, 200L, "far"), (2L, 100L, "tie"),
        (3L, 150L, "exact"))
      .toDF("k", "lts", "tag")
    val r = Seq((1L, 90L, 9.0), (1L, 105L, 10.5),
        (2L, 95L, 9.5), (2L, 105L, 10.5),
        (3L, 150L, 15.0))
      .toDF("k", "rts", "v")
    val out = TemporalJoin.asOfJoinNearest(l, r, "k", "lts", "rts")
      .collect().map(x => (x.getString(2), (Option(x.get(3)), Option(x.get(4))))).toMap
    assert(out("mid") == ((Some(10.5), Some(105L))))   // 5 ahead beats 10 behind
    assert(out("far") == ((Some(10.5), Some(105L))))   // only side available
    assert(out("tie") == ((Some(9.5), Some(95L))))     // equal distance -> backward
    assert(out("exact") == ((Some(15.0), Some(150L)))) // distance 0
    val tol = TemporalJoin.asOfJoinNearest(l, r, "k", "lts", "rts",
        tolerance = Some(20L))
      .collect().map(x => (x.getString(2), Option(x.get(3)))).toMap
    assert(tol("far") == None && tol("mid") == Some(10.5)) // 95 > 20 nulls out
  }

  test("asOfJoin ignores null timestamps on either side (no phantom matches)") {
    val l = Seq((1L, Some(50L), "early"), (1L, Some(200L), "late"),
        (1L, None: Option[Long], "nullts"))
      .toDF("k", "lts", "tag")
    val r = Seq((1L, None: Option[Long], 99.0), (1L, Some(100L), 10.0))
      .toDF("k", "rts", "v")
    val back = TemporalJoin.asOfJoin(l, r, "k", "lts", "rts")
      .collect().map(x => (x.getString(2), Option(x.get(3)))).toMap
    // the null-ts right row must NOT phantom-match the early left row
    assert(back("early") == None && back("late") == Some(10.0) && back("nullts") == None)
    val fwd = TemporalJoin.asOfJoin(l, r, "k", "lts", "rts", forward = true)
      .collect().map(x => (x.getString(2), Option(x.get(3)))).toMap
    // a null-ts LEFT row must not pick up the last right payload
    assert(fwd("early") == Some(10.0) && fwd("late") == None && fwd("nullts") == None)
  }

  test("rangeJoin throws loudly on an interval exploding past the bucket budget") {
    val pts = Seq((1L, 5L)).toDF("k", "ts")
    val ivs = Seq((1L, 0L, Long.MaxValue / 2, "sentinel")).toDF("k", "s", "e", "itag")
    val ex = intercept[Exception] {
      TemporalJoin.rangeJoin(pts, ivs, "k", "ts", "s", "e", bucketWidth = 10L).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
    assert(messages(ex).exists(m => m != null && m.contains("rangeJoin")),
      s"expected the rangeJoin budget error, got: ${ex.getMessage}")
  }

  test("asOfJoin equals the brute-force per-row maximum on real events") {
    val e = Tables.events(spark, sf)
    val clicks = e.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("click_id"), unix_micros($"ts").as("cts"))
    val views = e.filter($"event_type" === "view")
      .select($"user_id", unix_micros($"ts").as("vts"), $"value".as("vv"))
    val got = TemporalJoin.asOfJoin(clicks, views, "user_id", "cts", "vts")
      .select($"click_id", $"matched_ts")
    // brute force: max view ts <= click ts per click; clicks with no
    // qualifying view (including users with only LATER views) keep a
    // null — the left-join shape of as-of
    val brute = clicks.join(
        clicks.join(views, Seq("user_id"))
          .filter($"vts" <= $"cts")
          .groupBy($"click_id").agg(max($"vts").as("mt")),
        Seq("click_id"), "left")
      .select($"click_id", $"mt".as("matched_ts"))
    assert(got.count() == clicks.count())
    assert(got.except(brute).isEmpty && brute.except(got).isEmpty)
  }

  test("rangeJoin matches the unbucketized theta join on real events") {
    val e = Tables.events(spark, sf)
    val hourUs = 3600L * 1000000
    val purchases = e.filter($"event_type" === "purchase")
      .select($"event_id".as("pid"), $"user_id", unix_micros($"ts").as("pts"))
      .withColumn("w_start", $"pts" - hourUs).withColumn("w_end", $"pts")
    val views = e.filter($"event_type" === "view")
      .select($"user_id", unix_micros($"ts").as("vts"))
    val got = TemporalJoin.rangeJoin(views, purchases, "user_id",
        "vts", "w_start", "w_end", bucketWidth = hourUs)
      .select($"pid", $"vts")
    val brute = purchases.join(views, Seq("user_id"))
      .filter($"vts" >= $"w_start" && $"vts" <= $"w_end")
      .select($"pid", $"vts")
    assert(got.count() == brute.count()) // exactly-once: no dedup hides doubles
    assert(got.except(brute).isEmpty && brute.except(got).isEmpty)
    assert(got.count() > 0) // fixture actually exercises the join
  }

  test("asOfJoinBy partitions on the composite key") {
    val l = Seq((1L, "A", 100L, "a"), (1L, "B", 100L, "b"), (2L, "A", 100L, "c"))
      .toDF("k1", "k2", "lts", "tag")
    val r = Seq((1L, "A", 90L, 9.0), (1L, "B", 95L, 9.5), (2L, "B", 80L, 8.0))
      .toDF("k1", "k2", "rts", "v")
    val out = TemporalJoin.asOfJoinBy(l, r, Seq("k1", "k2"), "lts", "rts")
      .collect().map(x => (x.getString(3), Option(x.get(4)))).toMap
    assert(out("a") == Some(9.0))
    assert(out("b") == Some(9.5))
    assert(out("c") == None) // (2, A) must not see (2, B)'s rows
  }

  test("asOfJoin (all directions) equals brute force on seeded random data") {
    val rng = new scala.util.Random(42)
    // dense key space + small ts range forces heavy ties and
    // same-ts left/right collisions — the edge cases that matter
    val lRows = Seq.fill(300)((rng.nextInt(8).toLong, rng.nextInt(50).toLong, rng.nextInt()))
      .zipWithIndex.map { case ((k, ts, x), i) => (k, ts, i.toLong) }
    val rRows = Seq.fill(300)((rng.nextInt(8).toLong, rng.nextInt(50).toLong,
      rng.nextInt(1000).toDouble))
    val l = lRows.toDF("k", "lts", "lid")
    val r = rRows.toDF("k", "rts", "v")
    // reference model: per (key, ts) the max payload; then scan
    val byKey = rRows.groupBy(_._1).map { case (k, rows) =>
      k -> rows.groupBy(_._2).map { case (ts, g) => ts -> g.map(_._3).max }.toMap
    }
    def expected(k: Long, ts: Long, dir: String, tol: Option[Long]): Option[(Long, Double)] = {
      val cands = byKey.getOrElse(k, Map.empty)
      val pick = dir match {
        case "backward" => cands.keys.filter(_ <= ts).minByOption(t => ts - t)
        case "forward"  => cands.keys.filter(_ >= ts).minByOption(t => t - ts)
        case "nearest"  =>
          cands.keys.minByOption(t => (math.abs(t - ts), t)) match {
            case None => None
            case Some(_) =>
              val best = cands.keys.map(t => (math.abs(t - ts), t)).min
              // tie at equal distance -> the earlier (backward) match
              Some(cands.keys.filter(t => math.abs(t - ts) == best._1).min)
          }
      }
      pick.filter(t => tol.forall(math.abs(t - ts) <= _)).map(t => (t, cands(t)))
    }
    for (dir <- Seq("backward", "forward", "nearest"); tol <- Seq(None, Some(7L))) {
      val got = (dir match {
        case "backward" => TemporalJoin.asOfJoin(l, r, "k", "lts", "rts", tolerance = tol)
        case "forward"  => TemporalJoin.asOfJoin(l, r, "k", "lts", "rts",
          forward = true, tolerance = tol)
        case "nearest"  => TemporalJoin.asOfJoinNearest(l, r, "k", "lts", "rts", tol)
      }).collect().map(x => x.getAs[Long]("lid") ->
        (Option(x.get(x.fieldIndex("matched_ts"))), Option(x.get(x.fieldIndex("v"))))).toMap
      assert(got.size == lRows.size, s"$dir/$tol row count")
      lRows.foreach { case (k, ts, lid) =>
        val want = expected(k, ts, dir, tol)
        val g = got(lid)
        assert(g._1 == want.map(_._1) && g._2 == want.map(_._2),
          s"$dir/$tol mismatch at k=$k ts=$ts: got $g want $want")
      }
    }
  }

  test("rangeJoin covers intervals wider than one bucket and drops inverted ones") {
    val pts = Seq((1L, 5L, "p5"), (1L, 25L, "p25"), (1L, 95L, "p95"))
      .toDF("k", "ts", "ptag")
    val ivs = Seq((1L, 0L, 100L, "wide"), (1L, 24L, 26L, "narrow"),
        (1L, 50L, 40L, "inverted"))
      .toDF("k", "s", "e", "itag")
    val out = TemporalJoin.rangeJoin(pts, ivs, "k", "ts", "s", "e", bucketWidth = 10L)
      .select($"itag", $"ptag").as[(String, String)].collect().toSet
    assert(out == Set(("wide", "p5"), ("wide", "p25"), ("wide", "p95"),
      ("narrow", "p25")))
  }
}
