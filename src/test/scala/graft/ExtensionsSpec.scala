package graft

import graft.functions.GeoFunctions

/** The extension injection path: the SAME builder lambdas that
  * GraftExtensions injects (toScalaUDF bridge + native expression
  * constructors), exercised through the shared session's function
  * registry — a second SparkContext per JVM is impossible, so the
  * withExtensions wiring itself is verified by the standalone
  * `sbt "runMain"` path and covers only trivial plumbing on top. */
class ExtensionsSpec extends SparkSuite {

  test("LevenshteinThresholdRule: all four literal-comparison forms " +
    "rewrite to the banded threshold expression with identical rows; " +
    "non-positive bounds are left alone") {
    import org.apache.spark.sql.graftext.LevenshteinThresholdRule
    import spark.implicits._
    val prior = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prior :+ LevenshteinThresholdRule
    try {
      val df = Seq(("kitten", "sitting"), ("abc", "abd"), ("same", "same"),
        (null.asInstanceOf[String], "x"))
        .toDF("a", "b").localCheckpoint()
      val forms = Seq(
        "levenshtein(a, b) <= 2" -> Seq(("abc", "abd"), ("same", "same")),
        "2 >= levenshtein(a, b)" -> Seq(("abc", "abd"), ("same", "same")),
        "levenshtein(a, b) < 1" -> Seq(("same", "same")),
        "1 > levenshtein(a, b)" -> Seq(("same", "same")))
      forms.foreach { case (pred, want) =>
        val q = df.filter(org.apache.spark.sql.functions.expr(pred))
        // the optimized plan carries the THRESHOLD form (3-arg) and
        // no unbounded 2-arg call survives
        val plan = q.queryExecution.optimizedPlan.toString
        assert(plan.matches("(?s).*levenshtein\\([^()]*, [^()]*, Some\\(\\d\\)\\) >= 0.*"),
          s"$pred not rewritten:\n$plan")
        assert(q.collect().map(r => (r.getString(0), r.getString(1))).toSeq
          .sortBy(_._1) === want.sortBy(_._1), s"rows changed under $pred")
      }
      // lev <= -1: out of the rule's domain, plan keeps the 2-arg form
      val neg = df.filter(org.apache.spark.sql.functions.expr("levenshtein(a, b) <= -1"))
      assert(neg.count() === 0L)
    } finally spark.experimental.extraOptimizations = prior
  }

  test("injected builders resolve st_* and sorted_intersect_count in SQL") {
    GeoFunctions.registerBuilders(spark)
    val row = spark.sql(
      """SELECT st_area('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))') AS a,
        |  sorted_intersect_count(array(1L, 2L, 5L), array(2L, 3L, 5L)) AS c,
        |  vec_dot(array(CAST(1.5 AS FLOAT), CAST(-2.0 AS FLOAT)),
        |          array(CAST(4.0 AS FLOAT), CAST(0.25 AS FLOAT))) AS d
        |""".stripMargin).collect()(0)
    assert(row.getAs[Double]("a") === 4.0)
    assert(row.getAs[Int]("c") === 2)
    assert(row.getAs[Double]("d") === 1.5 * 4.0 + -2.0 * 0.25)
  }

  test("injected native text/layout builders resolve in SQL") {
    graft.functions.TextFunctions.registerBuilders(spark)
    val row = spark.sql(
      """SELECT
        |  zorder_key(3L, 5L) AS zk,
        |  vec_l2sq(array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE)),
        |           array(CAST(3.0 AS DOUBLE), CAST(0.0 AS DOUBLE))) AS l2,
        |  unicode_normalize('Café', 'NFC') AS nf
        |""".stripMargin).collect()(0)
    // z(3,5) = interleave x=011, y=101 -> bits y2 x2 y1 x1 y0 x0 = 100111
    assert(row.getAs[Long]("zk") ===
      java.lang.Long.parseLong("100111", 2))
    assert(row.getAs[Double]("l2") === 8.0)
    assert(row.getAs[String]("nf") === "Café")
  }

  test("vec_dot propagates a null element to a null result (SQL surface)") {
    GeoFunctions.registerBuilders(spark)
    // arbitrary user arrays reach the SQL function; a null element must
    // yield null (the HOF chain's behavior), not a garbage/0 read
    val rows = spark.sql(
      """SELECT vec_dot(array(CAST(1.0 AS DOUBLE), CAST(NULL AS DOUBLE)),
        |               array(CAST(2.0 AS DOUBLE), CAST(3.0 AS DOUBLE))) AS bad,
        |  vec_dot(array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE)),
        |          array(CAST(2.0 AS DOUBLE), CAST(3.0 AS DOUBLE))) AS good
        |""".stripMargin).collect()(0)
    assert(rows.isNullAt(0), "null element must null the dot product")
    assert(rows.getAs[Double]("good") === 8.0)
  }

  test("VecHyperplaneBuckets equals the HOF lshBucket per table on real embeddings") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftext.ArrayOps
    import graft.operators.Similarity
    val e = Tables.embeddings(spark, sf).limit(300)
    val planes = 4; val tables = 8
    val rows = e.select(
        ArrayOps.hyperplaneBuckets(col("embedding"), planes, tables).as("fused"),
        array((0 until tables).map(t =>
          Similarity.lshBucket(col("embedding"), planes, lit(t * planes))): _*).as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    }
  }

  test("VecMinhashSig and VecSimhash equal their HOF formulations on real documents") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    val numHashes = 24
    val d = Tables.documents(spark, sf).limit(300)
      .select(Dedup.wordHashes(Dedup.wordSet(col("text"))).as("h"))
    val ps = sequence(lit(0), lit(numHashes - 1))
    val hofMinhash = aggregate(col("h"),
      transform(ps, _ => lit(Long.MaxValue)),
      (acc, h) => zip_with(acc, ps, (m, p) => least(m, xxhash64(h, p))))
    val ks = sequence(lit(0), lit(63))
    val bitSums = aggregate(col("h"),
      transform(ks, _ => lit(0)),
      (acc, h) => zip_with(acc, ks,
        (s, k) => s + when(call_function("shiftright", h, k).bitwiseAND(1) === 1, 1).otherwise(-1)))
    val hofSimhash = aggregate(
      zip_with(bitSums, ks,
        (s, k) => when(s > 0, call_function("shiftleft", lit(1L), k)).otherwise(0L)),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
    val rows = d.select(
        Dedup.minhashSignature(col("h"), numHashes).as("fusedM"), hofMinhash.as("hofM"),
        org.apache.spark.sql.graftext.ArrayOps.simhash(col("h")).as("fusedS"),
        hofSimhash.as("hofS"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
      assert(r.getLong(2) === r.getLong(3))
    }
  }

  test("VecDotSeq is bit-identical to the interpreted HOF left fold on real embeddings") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftext.ArrayOps
    val e = Tables.embeddings(spark, sf).limit(200)
    val hof = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x)
    val rows = e.crossJoin(e.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
        .limit(50))
      .select(
        ArrayOps.vecDot(col("embedding"), col("cvec")).as("fast"),
        hof(col("embedding"), col("cvec")).as("slow"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // exact: same IEEE op sequence, not a tolerance comparison
      assert(java.lang.Double.compare(r.getAs[Double]("fast"), r.getAs[Double]("slow")) == 0)
    }
  }

  test("VecGramBuckets equals the md5-HOF gram chain on real documents") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftext.ArrayOps
    import graft.operators.TextAnalysis
    val buckets = 64L
    val d = Tables.documents(spark, sf).limit(300)
      .select(TextAnalysis.wsTokens(lower(col("text"))).as("tk"))
    val nBg = greatest(size(col("tk")) - 1, lit(0))
    val grams = concat(col("tk"),
      zip_with(slice(col("tk"), lit(1), nBg), slice(col("tk"), lit(2), nBg),
        (a, b) => concat(a, lit("\u0001"), b)))
    val hof = transform(grams, g =>
      pmod(conv(substring(md5(g), 1, 15), 16, 10).cast("long"), lit(buckets)))
    val rows = d.select(
        ArrayOps.gramBuckets(col("tk"), buckets).as("fused"),
        hof.as("slow"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    }
  }

  test("VecBincount equals the 64-pass filter histogram, and " +
    "VecDotLongConst equals the interpreted long fold") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftext.ArrayOps
    import graft.operators.TextAnalysis
    val buckets = 64
    val w = Array.tabulate(buckets + 1)(i => (i * 2654435761L) % 1000L - 500L)
    val d = Tables.documents(spark, sf).limit(300)
      .select(ArrayOps.gramBuckets(
        TextAnalysis.wsTokens(lower(col("text"))), buckets.toLong).as("bs"))
    val hofHist = concat(
      transform(sequence(lit(0L), lit(buckets.toLong - 1)), i =>
        size(filter(col("bs"), b => b === i)).cast("long")),
      array(lit(1L)))
    val rows = d.select(
        ArrayOps.bincount(col("bs"), buckets, bias = true).as("fast"),
        hofHist.as("slow"))
      .select(col("fast"), col("slow"),
        ArrayOps.vecDotLong(col("fast"), w).as("dotFast"),
        aggregate(zip_with(col("fast"), typedlit(w.toSeq), (a, b) => a * b),
          lit(0L), (acc, v) => acc + v).as("dotSlow"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
      assert(r.getLong(2) === r.getLong(3))
    }
    // out-of-range and null bucket ids count nowhere; bias slot is 1
    val edge = spark.sql(
      s"""SELECT array(0L, 1L, 1L, CAST(NULL AS BIGINT), 99L, -3L) AS bs""")
    val e = edge.select(ArrayOps.bincount(col("bs"), 4, bias = true)).collect()(0)
    assert(e.getSeq[Long](0) === Seq(1L, 2L, 0L, 0L, 1L))
  }

  test("VecL2SqSeq at every subspace offset is bit-identical to the " +
    "slice + zip_with + aggregate chain on real embeddings") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftext.ArrayOps
    val e = Tables.embeddings(spark, sf).limit(100)
    val pairs = e.crossJoin(
      e.select(col("vec_id").as("cid"), col("embedding").as("cvec")).limit(20))
    val ds = 8
    val checks = (0 until 8).flatMap { s =>
      val sub = slice(transform(col("cvec"), x => x.cast("double")),
        s * ds + 1, ds)
      val hof = aggregate(
        zip_with(slice(transform(col("embedding"), x => x.cast("double")),
          s * ds + 1, ds), sub, (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x)
      Seq(ArrayOps.vecL2Sq(col("embedding"), sub, s * ds).as(s"fast$s"),
        hof.as(s"slow$s"))
    }
    val rows = pairs.select(checks: _*).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      (0 until 8).foreach { s =>
        assert(java.lang.Double.compare(
          r.getAs[Double](s"fast$s"), r.getAs[Double](s"slow$s")) == 0,
          s"subspace $s differs")
      }
    }
    // a window past the array end folds the OVERLAP only (the HOF
    // chain null-pads via zip_with and nulls the whole fold — the
    // expression is deliberately better defined there): fold vs a
    // codeword of zeros at offset 60 on a 64-dim vector == squared
    // norm of the last 4 elements
    val tail = e.select(
      ArrayOps.vecL2Sq(col("embedding"), typedlit(Seq.fill(ds)(0.0)), 60).as("fast"),
      aggregate(zip_with(
        slice(transform(col("embedding"), x => x.cast("double")), 61, 4),
        typedlit(Seq.fill(4)(0.0)), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x).as("slow")).collect()
    tail.foreach { r =>
      assert(java.lang.Double.compare(r.getAs[Double]("fast"), r.getAs[Double]("slow")) == 0)
    }
  }
}
