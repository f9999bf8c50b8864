package graft.sources

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro object-container source/sink — the row-oriented sibling of
  * the parquet tables: the interchange format Kafka archives, Hive
  * ingest drops and CDC streams land as long before a columnar
  * rewrite runs. (Reference scope note: the reference ingests CSV/
  * parquet tabular shapes only — main.py:1 — so this source is a
  * beyond-reference component of the ingest front door, the r7
  * verdict's task #5.)
  *
  * The distribution carries the core Avro library (avro-1.12.1.jar)
  * but NOT the `spark-avro` DataSource module, so
  * `spark.read.format("avro")` does not resolve here; this source
  * builds the same contract on the public container spec instead.
  *
  * Format (public spec): magic `Obj` + header (schema JSON +
  * codec in a metadata map) + a random 16-byte sync marker, then
  * blocks of [record count varint, byte size varint, codec-compressed
  * records, sync marker].
  *
  * Design rules, inherited from [[JsonlSource]]/[[WarcSource]]:
  *  - The READER schema is REQUIRED, never inferred from the first
  *    file: callers state the contract and Avro's public schema
  *    resolution (match by field name, skip writer-only fields, fill
  *    reader-only fields from defaults) absorbs shard-to-shard
  *    evolution — a 100 TB archive written over months never has one
  *    schema. The writer schema comes from each file's own header.
  *  - PERMISSIVE + QUARANTINE + RESYNC, never fail-fast, never
  *    silent drop: a corrupt block surfaces as a row with `error`
  *    set and the block's sync position, then the reader seeks to
  *    the NEXT sync marker — the format's own recovery mechanism —
  *    so one flipped byte costs its block, not the rest of the file.
  *    [[stats]] gives the exact good/quarantined accounting a
  *    corruption budget gates on.
  *  - One task per file, parallelism ACROSS files. Avro blocks are
  *    sync-splittable, so the deeper scale path is a split-aware
  *    FileFormat; at the shard-sized files real archives ship
  *    (Kafka/CDC rolls files at 100 MB–1 GB), per-file parallelism
  *    saturates a cluster with simpler failure accounting, exactly
  *    like [[WarcSource]].
  *
  * Type contract (stated, checked loudly at schema conversion):
  * boolean/int/long/float/double/string/bytes/fixed, enum (as
  * string), arrays, string-keyed maps, nested records, and
  * `union[null, T]` as a nullable column. Anything else —
  * multi-branch unions, logical-type reinterpretation — is refused
  * with the offending path named, not guessed at.
  */
object AvroSource {

  /** Metadata columns prepended to the reader-schema columns:
    * source file, the record's block sync position (bytes), the
    * record index within the file, and the quarantine error (null
    * for good rows). */
  val MetaCols: Seq[StructField] = Seq(
    StructField("path", StringType, nullable = true),
    StructField("block_pos", LongType, nullable = true),
    StructField("rec_idx", LongType, nullable = true),
    StructField("error", StringType, nullable = true))

  // ---------------------------------------------------------------
  // Avro schema -> Spark schema (the stated subset, loud refusal)
  // ---------------------------------------------------------------

  /** Spark type + nullability for one Avro schema node. */
  def sparkType(s: Schema, path: String): (DataType, Boolean) = s.getType match {
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT     => (IntegerType, false)
    case Schema.Type.LONG    => (LongType, false)
    case Schema.Type.FLOAT   => (FloatType, false)
    case Schema.Type.DOUBLE  => (DoubleType, false)
    case Schema.Type.STRING  => (StringType, false)
    case Schema.Type.BYTES   => (BinaryType, false)
    case Schema.Type.FIXED   => (BinaryType, false)
    case Schema.Type.ENUM    => (StringType, false)
    case Schema.Type.ARRAY =>
      val (et, en) = sparkType(s.getElementType, s"$path[]")
      (ArrayType(et, containsNull = en), false)
    case Schema.Type.MAP =>
      val (vt, vn) = sparkType(s.getValueType, s"$path{}")
      (MapType(StringType, vt, valueContainsNull = vn), false)
    case Schema.Type.RECORD => (structType(s, path), false)
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1 && branches.size <= 2,
        s"unsupported Avro union at $path: only [null, T] is in the " +
          s"stated contract, got ${branches.map(_.getType).mkString("[", ",", "]")}")
      val (t, _) = sparkType(nonNull.head, path)
      (t, true)
    case other =>
      sys.error(s"unsupported Avro type $other at $path — outside the stated contract")
  }

  /** Spark struct for an Avro record schema. */
  def structType(rec: Schema, path: String = ""): StructType = {
    require(rec.getType == Schema.Type.RECORD,
      s"expected an Avro record schema at ${if (path.isEmpty) "<root>" else path}, got ${rec.getType}")
    StructType(rec.getFields.asScala.map { f =>
      val (t, n) = sparkType(f.schema(), s"$path.${f.name}")
      StructField(f.name, t, nullable = n)
    }.toArray)
  }

  /** The full output schema of [[read]] for a reader schema. */
  def outputSchema(readerSchemaJson: String): StructType = {
    val data = structType(new Schema.Parser().parse(readerSchemaJson))
    val clash = data.fieldNames.toSet.intersect(MetaCols.map(_.name).toSet)
    require(clash.isEmpty,
      s"reader schema must not declare ${clash.mkString(",")} — the reader adds them")
    // data columns forced nullable: quarantine rows carry nulls there
    StructType(MetaCols ++ data.fields.map(_.copy(nullable = true)))
  }

  // ---------------------------------------------------------------
  // Avro runtime values -> Spark row values
  // ---------------------------------------------------------------

  private def toSpark(v: Any): Any = v match {
    case null                                               => null
    case u: org.apache.avro.util.Utf8                       => u.toString
    case s: String                                          => s
    case b: java.nio.ByteBuffer =>
      val d = b.duplicate(); val a = new Array[Byte](d.remaining()); d.get(a); a
    case f: org.apache.avro.generic.GenericFixed            => f.bytes().clone()
    case e: org.apache.avro.generic.GenericEnumSymbol[_]    => e.toString
    case r: GenericRecord =>
      Row.fromSeq(r.getSchema.getFields.asScala.map(f => toSpark(r.get(f.pos()))).toSeq)
    case l: java.util.Collection[_]                         => l.asScala.map(toSpark).toSeq
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, x) => (k.toString, toSpark(x)) }.toMap
    case b: java.lang.Boolean                               => b
    case i: java.lang.Integer                               => i
    case l: java.lang.Long                                  => l
    case f: java.lang.Float                                 => f
    case d: java.lang.Double                                => d
    case other =>
      sys.error(s"unexpected Avro runtime value ${other.getClass.getName} — outside the stated contract")
  }

  // ---------------------------------------------------------------
  // One file -> rows (pure function — the spec's surface)
  // ---------------------------------------------------------------

  /** Parse one container file into good rows + quarantined blocks,
    * in stream order. Resync discipline: on any per-block failure,
    * emit one quarantine row at the block's sync position, then seek
    * to the next sync marker STRICTLY past it; a resync that fails
    * or does not advance quarantines the tail inside the same row
    * and stops (progress is guaranteed — no infinite loop on
    * adversarial bytes). A clean EOF that leaves unconsumed bytes
    * past the last sync point (a truncated final block — Avro's
    * reader reports EOF there, which unguarded is a SILENT drop,
    * established by experiment) is quarantined by byte count. */
  def parseFile(path: String, bytes: Array[Byte], readerSchemaJson: String): Seq[Row] = {
    val readerSchema = new Schema.Parser().parse(readerSchemaJson)
    val fields = readerSchema.getFields.asScala.toArray
    def qrow(pos: Long, idx: Long, err: String): Row =
      Row.fromSeq(Seq(path, pos, idx, err) ++ Seq.fill(fields.length)(null))
    val out = mutable.ArrayBuffer.empty[Row]
    val reader =
      try new DataFileReader[GenericRecord](new SeekableByteArrayInput(bytes),
        new GenericDatumReader[GenericRecord](null, readerSchema))
      catch {
        case scala.util.control.NonFatal(e) =>
          return Seq(qrow(0L, 0L, s"header: ${e.getClass.getSimpleName}: ${e.getMessage}"))
      }
    var idx = 0L
    var done = false
    var lastFailPos = -1L
    try {
      while (!done) {
        val pos = try reader.previousSync() catch { case scala.util.control.NonFatal(_) => -1L }
        try {
          if (!reader.hasNext) {
            done = true
            // a well-formed container ends exactly at the last sync
            if (pos >= 0 && pos < bytes.length) {
              out += qrow(pos, idx,
                s"truncated or trailing bytes: ${bytes.length - pos} bytes past the last sync point")
              idx += 1
            }
          } else {
            val rec = reader.next()
            out += Row.fromSeq(Seq(path, reader.previousSync(), idx, null) ++
              fields.map(f => toSpark(rec.get(f.pos()))))
            idx += 1
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            val advanced =
              if (pos <= lastFailPos) false
              else {
                lastFailPos = pos
                try {
                  reader.sync(math.max(pos, 0L) + 1)
                  reader.previousSync() > pos
                } catch { case scala.util.control.NonFatal(_) => false }
              }
            val tail = if (advanced) ""
              else s"; tail unresyncable (${bytes.length - math.max(pos, 0L)} bytes quarantined)"
            out += qrow(pos, idx, s"${e.getClass.getSimpleName}: ${e.getMessage}$tail")
            idx += 1
            if (!advanced) done = true
        }
      }
    } finally reader.close()
    out.toSeq
  }

  // ---------------------------------------------------------------
  // Distributed read
  // ---------------------------------------------------------------

  /** Read a directory (or glob) of `.avro` container files under an
    * explicit reader-schema contract. One task per file; rows carry
    * [[MetaCols]] + the reader-schema columns (null on quarantine
    * rows). Compose with [[records]] / [[corrupt]] / [[stats]]. */
  def read(spark: SparkSession, path: String, readerSchemaJson: String): DataFrame = {
    val outSchema = outputSchema(readerSchemaJson) // validates the contract on the driver
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])](Encoders.tuple(Encoders.STRING, Encoders.BINARY))
      .flatMap { case (p, bytes) => parseFile(p, bytes, readerSchemaJson) }(
        Encoders.row(outSchema))
  }

  /** The well-formed records, contract columns only. */
  def records(raw: DataFrame): DataFrame =
    raw.filter(col("error").isNull)
      .drop(MetaCols.map(_.name): _*)

  /** The quarantined blocks: file, sync position, record index at
    * which the failure surfaced, and the error. */
  def corrupt(raw: DataFrame): DataFrame =
    raw.filter(col("error").isNotNull)
      .select(col("path"), col("block_pos"), col("rec_idx"), col("error"))

  /** Exact (good, quarantined) accounting in one pass. */
  def stats(raw: DataFrame): (Long, Long) = {
    val r = raw.agg(
      sum(when(col("error").isNull, 1L).otherwise(0L)),
      sum(when(col("error").isNotNull, 1L).otherwise(0L))).collect()(0)
    (if (r.isNullAt(0)) 0L else r.getLong(0),
      if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  // ---------------------------------------------------------------
  // Spark row values -> Avro runtime values
  // ---------------------------------------------------------------

  private def nonNullBranch(s: Schema): Schema =
    s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get

  private def toAvro(v: Any, s: Schema): Any = s.getType match {
    case Schema.Type.UNION =>
      if (v == null) null else toAvro(v, nonNullBranch(s))
    case _ if v == null =>
      sys.error(s"null value for non-nullable Avro ${s.getType} — declare union[null, T]")
    case Schema.Type.ARRAY =>
      v.asInstanceOf[scala.collection.Seq[_]].map(toAvro(_, s.getElementType)).asJava
    case Schema.Type.MAP =>
      v.asInstanceOf[scala.collection.Map[String, _]]
        .map { case (k, x) => (k, toAvro(x, s.getValueType)) }.asJava
    case Schema.Type.BYTES =>
      java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
    case Schema.Type.FIXED =>
      new GenericData.Fixed(s, v.asInstanceOf[Array[Byte]])
    case Schema.Type.ENUM =>
      new GenericData.EnumSymbol(s, v.toString)
    case Schema.Type.RECORD =>
      val row = v.asInstanceOf[Row]
      val rec = new GenericData.Record(s)
      s.getFields.asScala.foreach(f => rec.put(f.pos(), toAvro(row.get(f.pos()), f.schema())))
      rec
    case _ => v // primitives and strings pass through
  }

  // ---------------------------------------------------------------
  // Distributed write
  // ---------------------------------------------------------------

  /** Write a DataFrame as Avro container files — one file per
    * partition (each shard independently block-splittable and
    * independently recoverable, the [[JsonlSource.write]] stance),
    * columns matched to the schema's fields BY NAME. Files are named
    * by partition id. `syncEvery` > 0 forces a block boundary every
    * that many records — smaller blast radius per corrupt block at a
    * few bytes/block overhead (the knob the [[AvroSource]] spec uses
    * to pin resync exactly).
    *
    * Task-commit protocol: each task writes to a temp name carrying
    * its task ATTEMPT number and renames to the final part name only
    * after a clean close — a speculative or zombie duplicate attempt
    * writes its OWN temp file and the rename is a whole-file swap,
    * so two attempts can never interleave bytes into one container.
    * The job writes a `_SUCCESS` marker after all tasks return, so a
    * partial output (mid-job crash) is detectable: readers that care
    * check the marker. Executors build their FileSystem from the
    * SESSION's Hadoop configuration (broadcast via
    * `SerializableConfiguration`), not a bare `new Configuration()`
    * — object-store credentials / fs.defaultFS settings configured
    * on the session apply to the task-side writes too.
    *
    * Codecs: "null" (none) and "deflate" (built-in everywhere); the
    * snappy codec needs a jar this distribution does not pin for
    * avro, so it is refused rather than best-effort. */
  def write(df: DataFrame, path: String, avroSchemaJson: String,
            codec: String = "deflate", syncEvery: Int = 0): Unit = {
    val schema = new Schema.Parser().parse(avroSchemaJson)
    require(schema.getType == Schema.Type.RECORD, "writer schema must be a record")
    require(codec == "null" || codec == "deflate", s"unsupported codec $codec")
    val names = schema.getFields.asScala.map(_.name).toSeq
    val selected = df.select(names.map(col): _*)
    // fresh output dir, driver-side (mode=overwrite semantics)
    val sc = df.sparkSession.sparkContext
    val dirPath = new org.apache.hadoop.fs.Path(path)
    val fs = dirPath.getFileSystem(sc.hadoopConfiguration)
    fs.delete(dirPath, true)
    fs.mkdirs(dirPath)
    val confBc = sc.broadcast(
      new org.apache.spark.util.SerializableConfiguration(sc.hadoopConfiguration))
    selected.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val taskSchema = new Schema.Parser().parse(avroSchemaJson)
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        val finalPath = new org.apache.hadoop.fs.Path(path, f"part-$pid%05d.avro")
        // attempt-unique temp name: concurrent attempts never share a file
        val tmpPath = new org.apache.hadoop.fs.Path(path,
          f".part-$pid%05d-attempt-${tc.taskAttemptId()}.avro.tmp")
        val tfs = finalPath.getFileSystem(confBc.value.value)
        val os = tfs.create(tmpPath, true)
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](taskSchema))
        w.setCodec(if (codec == "null") CodecFactory.nullCodec()
                   else CodecFactory.deflateCodec(6))
        w.create(taskSchema, os)
        var committed = false
        try {
          var n = 0
          val fields = taskSchema.getFields.asScala.toArray
          it.foreach { row =>
            val rec = new GenericData.Record(taskSchema)
            var i = 0
            while (i < fields.length) {
              rec.put(i, toAvro(row.get(i), fields(i).schema())); i += 1
            }
            w.append(rec)
            n += 1
            if (syncEvery > 0 && n % syncEvery == 0) w.sync()
          }
          w.close()
          // task commit: whole-file swap; a lost race (the other
          // attempt already committed) just discards this attempt
          if (!tfs.rename(tmpPath, finalPath)) tfs.delete(tmpPath, false)
          committed = true
        } finally {
          if (!committed) {
            try w.close() catch { case _: Throwable => () }
            try tfs.delete(tmpPath, false) catch { case _: Throwable => () }
          }
        }
      }
    }
    // job commit marker: absent => the output may be partial
    fs.create(new org.apache.hadoop.fs.Path(dirPath, "_SUCCESS"), true).close()
  }
}
