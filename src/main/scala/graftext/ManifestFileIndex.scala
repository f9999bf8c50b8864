package org.apache.spark.sql.graftext

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** MANIFEST-BACKED [[FileIndex]] — the piece that makes a snapshot
  * read feed Spark's OWN optimizer instead of bypassing it (the
  * public Delta-Lake pattern: Delta's TahoeFileIndex wraps the
  * transaction log's file list + sizes in a FileIndex inside a
  * HadoopFsRelation, so `sizeInBytes` comes from the LOG and the
  * planner's broadcast/join decisions see real table statistics).
  *
  * Two wins over the stock `spark.read.parquet(files: _*)` relation
  * the snapshot read path used before:
  *
  *  1. STATISTICS: `sizeInBytes` is the manifest's recorded `#fsize`
  *     sum — so a plain `Snapshots.read(fact).join(smallDim)` plans a
  *     BroadcastHashJoin under the session's own
  *     `autoBroadcastJoinThreshold` with NO JoinPlanner call and no
  *     filesystem consultation (Spark multiplies by its documented
  *     `spark.sql.sources.fileCompressionFactor` on top, the knob for
  *     at-rest→in-memory inflation).
  *  2. NO PER-QUERY LISTING: the stock path builds an
  *     InMemoryFileIndex that `getFileStatus`es EVERY file at
  *     relation-creation time — at a million manifest-listed files
  *     that is a million namenode/object-store calls per query. Here
  *     the statuses are fabricated from the manifest's recorded
  *     byte lengths (exact: recorded from the staging listing of
  *     immutable files), so planning is zero-filesystem-op.
  *
  * Everything downstream is the stock V1 parquet path — vectorized
  * reader, predicate pushdown, column pruning, whole-stage codegen,
  * `_metadata` columns — because the relation IS a HadoopFsRelation
  * over ParquetFileFormat; only the file enumeration and statistics
  * come from the manifest.
  *
  * `dataFilters`-driven file skipping is [[ManifestFileIndex.listFiles]]'
  * seam: this index is handed per-file min/max pruning hooks by the
  * caller (graft.operators.Snapshots supplies closures over its
  * `#stat2` typed stats), so a pushed-down range predicate on a stats
  * column drops whole files at PLANNING time — Delta data skipping.
  *
  * Blocksize rides as the split hint (`parquet.block.size` staging
  * default); modification times are 0 (immutable staged files are
  * never re-read by mtime).
  */
final class ManifestFileIndex(
    root: Path,
    files: Seq[(Path, Long)],
    pruner: Seq[Expression] => Option[Set[String]] = _ => None)
  extends FileIndex {

  private val statuses: Array[FileStatus] = files.map { case (p, len) =>
    new FileStatus(len, false, 1, 128L * 1024 * 1024, 0L, p)
  }.toArray

  override def rootPaths: Seq[Path] = Seq(root)

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val surviving = pruner(dataFilters) match {
      case Some(keep) => statuses.filter(st => keep.contains(st.getPath.toString))
      case None => statuses
    }
    Seq(PartitionDirectory(InternalRow.empty, surviving))
  }

  override def inputFiles: Array[String] = statuses.map(_.getPath.toString)

  override def refresh(): Unit = () // manifest-listed files are immutable

  /** The manifest's recorded byte sum — what the planner sees
    * (× Spark's fileCompressionFactor) as the relation size. */
  override val sizeInBytes: Long = files.map(_._2).sum

  override def partitionSchema: StructType = new StructType()
}

/** Builds the DataFrame over a [[ManifestFileIndex]] — needs the
  * `org.apache.spark.sql` package for `Dataset.ofRows` and the
  * private[sql] relation constructors. */
object ManifestFileIndex {
  def relation(spark: SparkSession, root: Path, files: Seq[(Path, Long)],
               dataSchema: StructType,
               pruner: Seq[Expression] => Option[Set[String]] = _ => None)
      : DataFrame = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val fsRelation = HadoopFsRelation(
      new ManifestFileIndex(root, files, pruner),
      partitionSchema = new StructType(),
      dataSchema = dataSchema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map.empty)(cs)
    org.apache.spark.sql.classic.Dataset.ofRows(cs,
      LogicalRelation(fsRelation, isStreaming = false))
  }
}
