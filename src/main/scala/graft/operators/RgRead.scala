package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftext.PlanBridge
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** BYTE-RANGE parquet reads — the execution half of the manifest's
  * per-row-group statistics (`#stat3`, see
  * [[Snapshots.prunedScanAtBox]]): read ONLY the row groups whose
  * recorded byte range survived pruning, selected by parquet's own
  * midpoint rule (`ParquetReader.withFileRange` keeps the groups
  * whose middle byte falls inside the range — exactly how Spark's
  * splits pick row groups). One task per (file, contiguous surviving
  * range); the partially-read file never materializes its skipped
  * groups' pages.
  *
  * Scope (documented, conservative): flat scalar schemas (the
  * snapshot-table write shape — same contract as the change feed's
  * reader, whose [[graft.streaming.GroupDecode]] this reuses,
  * widening included); DV-bearing files never route here (positions
  * are whole-file row indices — the caller degrades them to the
  * whole-file read). The stock FileIndex path cannot express sub-file
  * splits, so this reader exists for the engine's OWN scan paths; the
  * named/SQL reads keep their file-level skipping + Spark's task-side
  * footer pruning. */
private[operators] object RgRead {

  /** One read unit: absolute path, byte range, and the file's rows
    * for sanity (unused at read; carried for debuggability). */
  case class Range(absPath: String, start: Long, len: Long)

  /** Read the given byte ranges under the table's LOGICAL schema
    * (physical names resolved via `toPhysical`; files predating a
    * column null-fill). */
  def read(spark: SparkSession, schema: StructType,
           toPhysical: Map[String, String], ranges: Seq[Range]): DataFrame = {
    val confBc = spark.sparkContext.broadcast(
      new SerializableConfiguration(spark.sparkContext.hadoopConfiguration))
    val physNames = schema.fields.map(f =>
      toPhysical.getOrElse(f.name, f.name))
    val dataTypes = schema.fields.map(_.dataType)
    val n = math.max(1, math.min(ranges.size,
      spark.sparkContext.defaultParallelism))
    val rdd = spark.sparkContext.parallelize(ranges, n)
      .mapPartitions { it =>
        val conf = confBc.value.value
        it.flatMap { r =>
          new Iterator[InternalRow] {
            private val reader = org.apache.parquet.hadoop.ParquetReader
              .builder(
                new org.apache.parquet.hadoop.example.GroupReadSupport(),
                new org.apache.hadoop.fs.Path(r.absPath))
              .withConf(conf)
              .withFileRange(r.start, r.start + r.len)
              .build()
            private var closed = false
            private def closeOnce(): Unit =
              if (!closed) { closed = true; reader.close() }
            // limit()/take()/task failure stop consuming mid-range
            // and never drive hasNext to exhaustion — the task
            // listener is what keeps the file handle from leaking
            Option(org.apache.spark.TaskContext.get()).foreach(
              _.addTaskCompletionListener[Unit](_ => closeOnce()))
            private var g: org.apache.parquet.example.data.Group = reader.read()
            private var fieldIdx: Array[Int] = _
            private var fieldPrim: Array[org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName] = _
            override def hasNext: Boolean = {
              val h = g != null
              if (!h) closeOnce()
              h
            }
            override def next(): InternalRow = {
              if (fieldIdx == null) {
                val resolved = graft.streaming.GroupDecode
                  .resolve(g.getType, physNames)
                fieldIdx = resolved._1
                fieldPrim = resolved._2
              }
              val out = new Array[Any](physNames.length)
              var i = 0
              while (i < physNames.length) {
                val fi = fieldIdx(i)
                out(i) =
                  if (fi < 0 || g.getFieldRepetitionCount(fi) == 0) null
                  else graft.streaming.GroupDecode.readValue(
                    g, fi, fieldPrim(i), dataTypes(i), r.absPath)
                i += 1
              }
              g = reader.read()
              new GenericInternalRow(out)
            }
          }
        }
      }
    PlanBridge.internalFrame(spark, rdd, Snapshots.nullable(schema))
  }
}
