package graft

import graft.queries.Relational

class RelationalSpec extends SparkSuite {

  test("every relational query runs and returns rows at sf0.001") {
    Relational.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("q01 aggregates are internally consistent") {
    val rows = Relational.q01(spark, sf).collect()
    assert(rows.length === 6) // 3 returnflags x 2 linestatus
    rows.foreach { r =>
      val sumQty = r.getAs[Double]("sum_qty")
      val avgQty = r.getAs[Double]("avg_qty")
      val cnt = r.getAs[Long]("count_order")
      assert(math.abs(sumQty / cnt - avgQty) < 1e-9)
      assert(r.getAs[Double]("sum_disc_price") <= r.getAs[Double]("sum_base_price"))
    }
  }

  test("q04 top-k is sorted descending and deterministic") {
    val prices = Relational.q04(spark, sf).collect().map(_.getAs[Double]("o_totalprice"))
    assert(prices.length === 10)
    assert(prices.sameElements(prices.sortBy(-_)))
  }

  test("q05 ranks are within 1..3 and unique per customer") {
    val rows = Relational.q05(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("o_custkey")).foreach { case (_, rs) =>
      val rnks = rs.map(_.getAs[Int]("rnk")).sorted
      assert(rnks.forall(r => r >= 1 && r <= 3))
      assert(rnks.distinct.length === rnks.length)
    }
  }

  test("q12 keeps exactly one row per orderkey") {
    val df = Relational.q12(spark, sf)
    val n = df.count()
    val distinctKeys = df.select("l_orderkey").distinct().count()
    assert(n === distinctKeys)
  }

  test("oracle map covers every query") {
    assert(Relational.queries.keySet === Relational.oracleSql.keySet)
  }

  test("q15 pivot cells partition the joined order count; absent cells are 0") {
    val total = graft.Tables.orders(spark, sf).count()
    val out = Relational.q15(spark, sf).collect()
    val cellSum = out.map(r => (1 to 5).map(r.getLong(_)).sum).sum
    assert(cellSum === total, "pivot cells must partition the orders")
    assert(out.forall(r => (1 to 5).forall(!r.isNullAt(_))), "cells never null")
  }

  test("Profile: hand-checked nulls, exact NDV, typed min/max surfaces") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    val df = Seq(
      (Some(3L), Some("b"), Some(1.5), Some(2000000L)),
      (None, Some("a"), Some(-0.5), None),
      (Some(3L), None, None, Some(1000000L)))
      .toDF("k", "s", "v", "tus")
      .withColumn("ts", timestamp_micros(col("tus"))).drop("tus")
    val p = graft.operators.Profile.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p("k").getLong(1) === 1L && p("k").getLong(2) === 1L)
    assert(p("k").getDouble(3) === 3.0 && p("k").getDouble(4) === 3.0)
    assert(p("k").isNullAt(5) && p("k").isNullAt(6))
    assert(p("s").getLong(1) === 1L && p("s").getLong(2) === 2L)
    assert(p("s").getString(5) === "a" && p("s").getString(6) === "b")
    assert(p("s").isNullAt(3) && p("s").isNullAt(4))
    assert(p("v").getLong(1) === 1L && p("v").getLong(2) === 2L)
    assert(p("v").getDouble(3) === -0.5 && p("v").getDouble(4) === 1.5)
    assert(p("ts").getLong(1) === 1L && p("ts").getLong(2) === 2L)
    assert(p("ts").getDouble(3) === 1000000.0 && p("ts").getDouble(4) === 2000000.0)
  }

  test("profileApproxNdv: all-null column gets a verdict, not a NULL ndv_ok") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[String]), (2L, None), (3L, None))
      .toDF("k", "dead")
    val p = graft.operators.Profile.profileApproxNdv(df).collect()
      .map(r => r.getString(0) -> r).toMap
    // exact NDV 0 and approx NDV 0 → ndv_ok must be TRUE, never null
    assert(!p("dead").isNullAt(2), "ndv_ok is null for an all-null column")
    assert(p("dead").getBoolean(2))
    assert(p("dead").getLong(1) === 0L)
    assert(p("k").getBoolean(2))
  }

  test("exactQuantiles: cut rule on hand fixtures, heavy ties, null drop") {
    import spark.implicits._
    // 1..10 once each: decile d cuts exactly at value d
    val u = (1L to 10L).toDF("v")
    val q1 = graft.operators.Profile.exactQuantiles(u, "v", 10).collect()
    assert(q1.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      (1L to 9L).map(d => (d, d)))
    assert(q1.forall(r => r.getLong(3) === 10L))
    // heavy ties: 90 zeros + 10 ones -> cuts 1..9 all at 0
    val t = (Seq.fill(90)(0L) ++ Seq.fill(10)(1L)).toDF("v")
    val q2 = graft.operators.Profile.exactQuantiles(t, "v", 10).collect()
    assert(q2.map(_.getLong(1)).forall(_ === 0L))
    assert(q2.head.getLong(2) === 90L) // n_le at the cut value
    // quartiles of 1..8 with a null: null drops, N = 8
    val n = (Seq[Option[Long]](Some(1L), Some(2L), Some(3L), Some(4L),
      Some(5L), Some(6L), Some(7L), Some(8L), None)).toDF("v")
    val q3 = graft.operators.Profile.exactQuantiles(n, "v", 4).collect()
    assert(q3.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 2L), (2L, 4L), (3L, 6L)))
    assert(q3.forall(r => r.getLong(3) === 8L))
    // the defining inequality holds tightly: cum(cut)*q >= d*N and
    // the previous value (cum - count(cut)) misses it
    q3.foreach { r =>
      val (d, cut, nle, tot) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nle * 4 >= d * tot)
      assert((nle - 1) * 4 < d * tot, s"cut $cut not minimal for d=$d")
    }
  }

  test("exactQuantilesBy: each group's cuts equal the global operator " +
    "run on that group alone; null keys drop") {
    import spark.implicits._
    val df = ((1L to 10L).map(("a", _)) ++
      (Seq.fill(90)(0L) ++ Seq.fill(10)(1L)).map(("b", _)) ++
      Seq[(String, Long)](null.asInstanceOf[String] -> 99L)).toDF("k", "v")
    val by = graft.operators.Profile.exactQuantilesBy(df, "k", "v", 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(by.forall(_._1 != null), "null key leaked")
    Seq("a", "b").foreach { g =>
      val alone = graft.operators.Profile
        .exactQuantiles(df.filter($"k" === g).select($"v"), "v", 10)
        .collect().map(r => (g, r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(by.filter(_._1 == g).toSeq === alone.toSeq, s"group $g diverges")
    }
  }
}
