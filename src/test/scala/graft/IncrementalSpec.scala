package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.Incremental

/** Incremental rollup maintenance (q147): the merge identity over
  * arbitrary splits, missing-key batches, and the sketch envelope. */
class IncrementalSpec extends SparkSuite {

  import spark.implicits._

  private def fixture = {
    val rnd = new scala.util.Random(23)
    (1 to 3000).map { i =>
      (i.toLong, s"t${i % 5}", rnd.nextDouble() * 100 - 50, (i % 700).toLong)
    }.toDF("id", "typ", "value", "uid").localCheckpoint()
  }

  test("merged state over ANY split equals the one-shot recompute on " +
    "every exact surface; sketch estimate stays inside the envelope") {
    val df = fixture
    val direct = df.groupBy($"typ").agg(
        count(lit(1)).as("n_rows"),
        sum($"value".cast(DecimalType(18, 6))).as("sum_v"),
        min($"value").as("min_v"), max($"value").as("max_v"),
        countDistinct($"uid").as("ndv"))
      .orderBy($"typ").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).doubleValue(),
        r.getDouble(3), r.getDouble(4), r.getLong(5)))
    Seq(1, 2, 4).foreach { nParts =>
      val parts = (0 until nParts).map(i =>
        Incremental.rollupState(df.filter(pmod($"id", lit(nParts)) === i),
          Seq("typ"), "value", "uid"))
      val merged = Incremental.mergeStates(parts, Seq("typ"))
        .orderBy($"typ").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).doubleValue(),
          r.getDouble(3), r.getDouble(4), r.getLong(5)))
      merged.zip(direct).foreach { case (m, d) =>
        assert(m._1 === d._1 && m._2 === d._2 && m._4 === d._4 && m._5 === d._5,
          s"nParts=$nParts: $m vs $d")
        assert(math.abs(m._3 - d._3) < 1e-9, s"sum drift at nParts=$nParts")
        // HLL estimate vs exact NDV: the q131 envelope
        assert(math.abs(m._6.toDouble - d._6) / d._6 <= 0.15,
          s"nParts=$nParts ndv est ${m._6} vs exact ${d._6}")
      }
    }
  }

  test("a batch missing some keys merges cleanly (union-of-states, not " +
    "join-of-states)") {
    val a = Seq((1L, "x", 1.0, 1L), (2L, "y", 2.0, 2L))
      .toDF("id", "typ", "value", "uid")
    val b = Seq((3L, "x", 3.0, 3L)).toDF("id", "typ", "value", "uid")
    val merged = Incremental.mergeStates(
        Seq(a, b).map(Incremental.rollupState(_, Seq("typ"), "value", "uid")),
        Seq("typ"))
      .orderBy($"typ").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3), r.getDouble(4)))
    assert(merged.toSeq === Seq(("x", 2L, 1.0, 3.0), ("y", 1L, 2.0, 2.0)))
  }
}
