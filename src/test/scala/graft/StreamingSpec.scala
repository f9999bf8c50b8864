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
