package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.queries.Events
import graft.streaming.EventStreams

class StreamingSpec extends SparkSuite {

  test("streaming tumbling agg equals the batch q60 result") {
    val streamed = EventStreams.runTumblingToMemory(spark, sf, "t_stream_spec")
      .collect().map(_.toSeq).toSet
    val batch = Events.q60(spark, sf).collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("decodeBatch emits deterministic stub metadata matching the decoder") {
    val payloads = Tables.documents(spark, sf)
      .select(col("doc_id").as("id"), col("text").cast("binary").as("payload"))
    val out = Multimodal.decodeBatch(payloads, batchSize = 16).collect()
    assert(out.length === payloads.count())
    val byId = out.map(r => r.getAs[Long]("id") -> r).toMap
    // cross-check a few rows against a local decode of the same bytes
    Tables.documents(spark, sf).select("doc_id", "text").limit(5).collect()
      .foreach { r =>
        val expect = Multimodal.StubDecoder.decode(
          r.getLong(0), r.getString(1).getBytes("UTF-8"))
        val got = byId(r.getLong(0))
        assert(got.getAs[Int]("width") === expect.width)
        assert(got.getAs[Int]("height") === expect.height)
        assert(got.getAs[String]("sha") === expect.sha)
        assert(got.getAs[String]("format") === expect.format)
      }
    // metadata ranges from the stub's contract
    out.foreach { r =>
      assert(r.getAs[Int]("width") >= 64 && r.getAs[Int]("width") <= 544)
      assert(Set("png", "jpeg").contains(r.getAs[String]("format")))
    }
  }
}
