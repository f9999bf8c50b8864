package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** The PUBLISH path — the step every real pipeline runs last and the
  * reference's missing "save the output" step (reference main.py
  * computes frames and plots them; it never writes a dataset): write
  * a layout-sorted, bucket-partitioned parquet dataset, then read it
  * back through footer min/max pruning and prove the round trip.
  *
  * Composition of already-gated pieces: a layout key (q112 Z-order /
  * q144 Hilbert or any integer sort key) orders rows inside each
  * file, directory bucketing bounds which files a key range can
  * touch, the q118 checksum proves the read-back identical, and a
  * q153 constraint suite gates the write ([[publishChecked]] refuses
  * to publish a batch that fails its suite — the Deequ discipline
  * applied where it matters, BEFORE the data ships).
  *
  * Scale shape (100 TB): the write is ONE hash repartition on the
  * bucket column + a local sort — the standard lakehouse write; each
  * bucket's rows land in exactly one task, so every bucket directory
  * holds exactly ONE file per write (deterministic layout, no
  * small-file spray). Footer statistics are per-file METADATA (KBs
  * per file regardless of file size): [[rowGroupStats]] walks them
  * driver-side, which is exactly what a table-format manifest read
  * is; at very large file counts the walk parallelizes trivially
  * (it is a per-file map), and the row-group min/max it reads are
  * the same stats any engine's scan-planner skip consults. A pruned
  * scan then reads ONLY the surviving files — I/O proportional to
  * the predicate's key range, not the table.
  */
object Layout {

  /** Per-row-group footer statistics of one parquet data file.
    * @param bucket the directory-partition value (`bucket=N`), if the
    *               file sits under one
    * @param min/max the row group's footer min/max for the key column */
  case class RowGroupStat(path: String, bucket: Option[Long],
                          rowCount: Long, min: Long, max: Long)

  /** Write `df` as a bucket-partitioned, key-sorted parquet dataset.
    * Each distinct `bucketCol` value becomes one directory holding
    * exactly one file (rows hash-repartition on the bucket, so a
    * bucket never splits across tasks), with rows sorted by
    * `sortCols` inside the file — the layout that makes footer
    * min/max pruning on the sort key effective.
    *
    * @param blockSize parquet row-group target in bytes (small values
    *                  give pruning resolution inside big files) */
  def publish(df: DataFrame, outDir: String, bucketCol: String,
              sortCols: Seq[String], blockSize: Long = 128L * 1024 * 1024,
              numTasks: Int = 32): Unit = {
    require(sortCols.nonEmpty, "publish needs at least one sort column")
    df.repartition(numTasks, col(bucketCol))
      .sortWithinPartitions(col(bucketCol) +: sortCols.map(col): _*)
      .write.mode("overwrite")
      .option("parquet.block.size", blockSize)
      .partitionBy(bucketCol)
      .parquet(outDir)
  }

  /** [[publish]] gated by a constraint suite (the Deequ discipline:
    * validation BEFORE the data ships). Throws with the failing
    * labels and writes NOTHING if any constraint is violated; the
    * suite costs one extra scan of `df` (its own single-pass
    * aggregate), which is the price of the guarantee. */
  def publishChecked(df: DataFrame, outDir: String, bucketCol: String,
                     sortCols: Seq[String],
                     constraints: Seq[Constraints.Constraint],
                     blockSize: Long = 128L * 1024 * 1024,
                     numTasks: Int = 32): Unit = {
    require(constraints.nonEmpty,
      "publishChecked needs a non-empty suite; use publish for ungated writes")
    val report = Constraints.check(df, constraints).collect()
    val failed = report.filter(!_.getAs[Boolean]("passed"))
    if (failed.nonEmpty) {
      val detail = failed.map(r =>
        s"${r.getAs[String]("constraint")} (${r.getAs[Long]("violations")} violations)")
      throw new IllegalStateException(
        s"publishChecked: refusing to publish — ${detail.mkString(", ")}")
    }
    publish(df, outDir, bucketCol, sortCols, blockSize, numTasks)
  }

  /** Per-row-group footer min/max statistics for an INT64 key column
    * across every data file under `dir` (recursing into `bucket=N`
    * partition directories). This is the metadata a scan planner's
    * row-group skip consults, read off the real footers. */
  def rowGroupStats(spark: SparkSession, dir: String,
                    keyCol: String): Seq[RowGroupStat] = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(hconf)
    def dataFiles(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(p).toSeq.flatMap { st =>
        if (st.isDirectory) dataFiles(st.getPath)
        else if (st.getPath.getName.endsWith(".parquet")) Seq(st)
        else Seq.empty
      }
    dataFiles(dirPath).flatMap { f =>
      val bucket = f.getPath.getParent.getName match {
        case s if s.contains("=") =>
          scala.util.Try(s.substring(s.indexOf('=') + 1).toLong).toOption
        case _ => None
      }
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f.getPath, hconf))
      try {
        rd.getFooter.getBlocks.asScala.toSeq.map { b =>
          val st = b.getColumns.asScala
            .find(_.getPath.toDotString == keyCol)
            .getOrElse(throw new IllegalArgumentException(
              s"rowGroupStats: no column '$keyCol' in ${f.getPath}"))
            .getStatistics
            .asInstanceOf[org.apache.parquet.column.statistics.LongStatistics]
          RowGroupStat(f.getPath.toString, bucket, b.getRowCount,
            st.getMin, st.getMax)
        }
      } finally rd.close()
    }
  }

  /** The files whose footer stats intersect [lo, hi) — the min/max
    * skip decision, made from [[rowGroupStats]] output. */
  def survivingFiles(stats: Seq[RowGroupStat], lo: Long, hi: Long): Seq[String] =
    stats.filter(s => s.max >= lo && s.min < hi).map(_.path).distinct

  /** Footer-pruned range scan: read ONLY the files whose min/max
    * intersect [lo, hi), then apply the residual predicate. Returns
    * the same rows as a full-table `keyCol in [lo, hi)` filter (the
    * spec and the q156 gate prove it) while touching I/O proportional
    * to the key range. An empty survivor set yields an empty frame
    * with the full-scan schema. */
  def prunedScan(spark: SparkSession, dir: String, keyCol: String,
                 lo: Long, hi: Long,
                 stats: Option[Seq[RowGroupStat]] = None): DataFrame = {
    val st = stats.getOrElse(rowGroupStats(spark, dir, keyCol))
    val files = survivingFiles(st, lo, hi)
    val residual = col(keyCol) >= lo && col(keyCol) < hi
    if (files.isEmpty)
      spark.read.parquet(dir).filter(residual).limit(0)
    else
      spark.read.parquet(files: _*).filter(residual)
  }
}
