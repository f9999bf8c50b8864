package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.sources.AvroSource

/** Avro container source: typed round trips on the stated contract,
  * schema-resolution evolution, quarantine-and-resync on planted
  * corruption (flip, sync damage, truncation, junk, empty), exact
  * accounting, and loud refusal outside the contract. */
class AvroSpec extends SparkSuite {

  private val docSchema =
    """{"type":"record","name":"Doc","fields":[
      |{"name":"id","type":"long"},
      |{"name":"s","type":"string"}]}""".stripMargin

  /** One single-file container of rows (i, "row-i"). */
  private def docBytes(n: Int, codec: String, syncEvery: Int): Array[Byte] = {
    import spark.implicits._
    val df = (0 until n).map(i => (i.toLong, s"row-$i")).toDF("id", "s")
    val dir = java.nio.file.Files.createTempDirectory("avro_spec").toString
    AvroSource.write(df.coalesce(1), dir, docSchema, codec, syncEvery)
    val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro")).head
    java.nio.file.Files.readAllBytes(f.toPath)
  }

  private def goods(rows: Seq[Row]): Seq[Row] = rows.filter(_.getString(3) == null)
  private def bads(rows: Seq[Row]): Seq[Row] = rows.filter(_.getString(3) != null)

  test("round trip preserves every contract type exactly, null and deflate codecs") {
    val schema =
      """{"type":"record","name":"All","fields":[
        |{"name":"b","type":"boolean"},
        |{"name":"i","type":"int"},
        |{"name":"l","type":"long"},
        |{"name":"f","type":"float"},
        |{"name":"d","type":"double"},
        |{"name":"s","type":"string"},
        |{"name":"by","type":"bytes"},
        |{"name":"fx","type":{"type":"fixed","name":"F4","size":4}},
        |{"name":"e","type":{"type":"enum","name":"E","symbols":["S0","S1","S2"]}},
        |{"name":"arr","type":{"type":"array","items":"long"}},
        |{"name":"m","type":{"type":"map","values":"long"}},
        |{"name":"rec","type":{"type":"record","name":"Inner","fields":[
        |  {"name":"rs","type":"string"},{"name":"rn","type":"long"}]}},
        |{"name":"opt","type":["null","long"]}]}""".stripMargin
    val sparkSchema = AvroSource.structType(new org.apache.avro.Schema.Parser().parse(schema))
    val rows = Seq(
      Row(true, 42, 7L, 1.5f, -2.25, "héllo",
        Array[Byte](1, 2, -3), Array[Byte](9, 8, 7, 6), "S1",
        Seq(1L, 2L, 3L), Map("a" -> 10L, "b" -> 20L), Row("in", 99L), 5L),
      Row(false, -42, -7L, -0.5f, 3.75, "",
        Array.emptyByteArray, Array[Byte](0, 0, 0, 0), "S2",
        Seq.empty[Long], Map.empty[String, Long], Row("", -1L), null))
    val df = spark.createDataFrame(rows.asJavaList, sparkSchema)
    for (codec <- Seq("null", "deflate")) {
      val dir = java.nio.file.Files.createTempDirectory(s"avro_all_$codec").toString
      AvroSource.write(df.coalesce(1), dir, schema, codec)
      val back = AvroSource.records(AvroSource.read(spark, dir, schema))
        .orderBy(desc("b")).collect()
      assert(back.length === 2, codec)
      val r0 = back(0)
      assert(r0.getBoolean(0) === true && r0.getInt(1) === 42 && r0.getLong(2) === 7L)
      assert(r0.getFloat(3) === 1.5f && r0.getDouble(4) === -2.25)
      assert(r0.getString(5) === "héllo")
      assert(r0.getAs[Array[Byte]](6).toSeq === Seq[Byte](1, 2, -3))
      assert(r0.getAs[Array[Byte]](7).toSeq === Seq[Byte](9, 8, 7, 6))
      assert(r0.getString(8) === "S1")
      assert(r0.getSeq[Long](9) === Seq(1L, 2L, 3L))
      assert(r0.getMap[String, Long](10) === Map("a" -> 10L, "b" -> 20L))
      assert(r0.getStruct(11) === Row("in", 99L))
      assert(r0.getLong(12) === 5L)
      val r1 = back(1)
      assert(r1.getString(5) === "" && r1.getSeq[Long](9).isEmpty)
      assert(r1.isNullAt(12), "union[null,long] null must survive")
    }
  }

  test("schema resolution: reader drops a writer field, fills a defaulted " +
    "field, reorders by name — per-shard evolution absorbed") {
    val bytes = docBytes(4, "deflate", 0)
    val dir = java.nio.file.Files.createTempDirectory("avro_evo").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.avro"), bytes)
    // reader: s first (reorder), id dropped, extra defaulted
    val readerSchema =
      """{"type":"record","name":"Doc","fields":[
        |{"name":"s","type":"string"},
        |{"name":"extra","type":"long","default":-1}]}""".stripMargin
    val back = AvroSource.records(AvroSource.read(spark, dir, readerSchema))
      .orderBy("s").collect()
    assert(back.map(_.getString(0)).toSeq === Seq("row-0", "row-1", "row-2", "row-3"))
    assert(back.forall(_.getLong(1) === -1L), "reader-only field takes its default")
  }

  test("flipped byte mid-block quarantines EXACTLY that block and resyncs: " +
    "rest of the file survives, error row carries the sync position") {
    val clean = docBytes(10, "deflate", 1) // one record per block
    val flipped = clean.clone()
    flipped(clean.length / 2) = (flipped(clean.length / 2) ^ 0x5a).toByte
    val rows = AvroSource.parseFile("f", flipped, docSchema)
    assert(rows.size === 10)
    assert(bads(rows).size === 1, "blast radius is one block")
    assert(goods(rows).size === 9)
    val lostId = (0L until 10L).toSet -- goods(rows).map(_.getLong(4)).toSet
    assert(lostId.size === 1)
    val err = bads(rows).head
    assert(err.getLong(1) > 0, "block sync position recorded")
    assert((4 until 6).forall(err.isNullAt), "data columns null on quarantine rows")
  }

  test("damaged sync marker: one block quarantined, resync recovers the rest") {
    val clean = docBytes(10, "deflate", 1)
    val rows0 = AvroSource.parseFile("f", clean, docSchema)
    val pos1 = goods(rows0)(1).getLong(1).toInt
    val dmg = clean.clone()
    dmg(pos1 + 2) = (dmg(pos1 + 2) ^ 0xff).toByte
    val rows = AvroSource.parseFile("f", dmg, docSchema)
    assert(bads(rows).size === 1 && goods(rows).size === 9)
  }

  test("FAILS LOUDLY in accounting: truncated final block is a quarantine " +
    "row with the byte count, never a silent drop (established by " +
    "experiment: Avro's reader reports clean EOF there)") {
    val clean = docBytes(10, "deflate", 1)
    val trunc = clean.take(clean.length - 7)
    val rows = AvroSource.parseFile("f", trunc, docSchema)
    assert(goods(rows).size === 9, "records before the cut survive")
    assert(bads(rows).size === 1)
    val err = bads(rows).head
    assert(err.getString(3).contains("truncated or trailing bytes: 20 bytes"),
      s"got: ${err.getString(3)}")
    // clean file has NO truncation row (container ends exactly at last sync)
    assert(bads(AvroSource.parseFile("f", clean, docSchema)).isEmpty)
  }

  test("junk and empty files: one header quarantine row each, zero goods") {
    val junk = AvroSource.parseFile("f", "not avro at all".getBytes, docSchema)
    assert(junk.size === 1 && junk.head.getString(3).startsWith("header:"))
    val empty = AvroSource.parseFile("f", Array.emptyByteArray, docSchema)
    assert(empty.size === 1 && empty.head.getString(3).startsWith("header:"))
  }

  test("end-to-end directory read: one row set per file, good and corrupt " +
    "files mixed, exact stats accounting, records/corrupt views") {
    val dir = java.nio.file.Files.createTempDirectory("avro_e2e").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "good.avro"),
      docBytes(5, "deflate", 0))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "junk.avro"),
      "zzzz".getBytes)
    val raw = AvroSource.read(spark, dir, docSchema)
    val (good, bad) = AvroSource.stats(raw)
    assert(good === 5L && bad === 1L)
    assert(AvroSource.records(raw).columns.toSeq === Seq("id", "s"))
    val c = AvroSource.corrupt(raw).collect()
    assert(c.length === 1 && c.head.getString(0).endsWith("junk.avro"))
  }

  test("write: one file per non-empty partition, named by partition id") {
    import spark.implicits._
    val df = (0 until 20).map(i => (i.toLong, s"row-$i")).toDF("id", "s")
    val dir = java.nio.file.Files.createTempDirectory("avro_parts").toString
    AvroSource.write(df.repartition(3, col("id")), dir, docSchema, "null")
    // ignore Hadoop local-FS .crc sidecars: dot-prefixed = hidden to
    // Spark's file listing, so read() never sees them either
    val all = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted.toSeq
    // job commit: the marker exists, and no task left a temp file behind
    assert(all.contains("_SUCCESS"), all.toString)
    val files = all.filterNot(_.startsWith("_"))
    assert(files.forall(_.matches("part-\\d{5}\\.avro")), files.toString)
    assert(files.size >= 2 && files.size <= 3)
    val back = AvroSource.records(AvroSource.read(spark, dir, docSchema))
    assert(back.count() === 20L)
    assert(back.agg(sum("id")).collect()(0).getLong(0) === 190L)
  }

  test("loud refusal outside the contract: multi-branch union, meta-column " +
    "clash, unsupported codec, null into a non-nullable field") {
    val multiUnion =
      """{"type":"record","name":"U","fields":[
        |{"name":"u","type":["null","long","string"]}]}""".stripMargin
    val e1 = intercept[IllegalArgumentException](AvroSource.outputSchema(multiUnion))
    assert(e1.getMessage.contains("union"))
    val clash =
      """{"type":"record","name":"C","fields":[
        |{"name":"error","type":"string"}]}""".stripMargin
    val e2 = intercept[IllegalArgumentException](AvroSource.outputSchema(clash))
    assert(e2.getMessage.contains("error"))
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "s")
    val dir = java.nio.file.Files.createTempDirectory("avro_bad").toString
    val e3 = intercept[IllegalArgumentException](
      AvroSource.write(df, dir, docSchema, codec = "snappy"))
    assert(e3.getMessage.contains("codec"))
    val withNull = Seq((Some(1L), "a"), (None, "b")).toDF("id", "s")
    val e4 = intercept[org.apache.spark.SparkException](
      AvroSource.write(withNull, dir, docSchema, "null"))
    assert(e4.getMessage != null)
  }

  private implicit class SeqOps(rows: Seq[Row]) {
    def asJavaList: java.util.List[Row] = {
      val l = new java.util.ArrayList[Row](rows.size)
      rows.foreach(l.add)
      l
    }
  }
}
