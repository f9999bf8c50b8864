package graft.sources

import java.util

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.{DataSourceRegister, InsertableRelation, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.{NamedTables, Snapshots}

/** The DSv2 entry point that gives graft tables NAMES — the public
  * Delta shape (DeltaDataSource: a TableProvider + DataSourceRegister
  * so `spark.read.format("graft").load(dir)` resolves by short name,
  * plus the V1 streaming-sink hook so `writeStream.format("graft")`
  * lands on the exactly-once batch ledger):
  *
  *  - BATCH READ: `spark.read.format("graft").load(dir)`, with an
  *    optional `versionAsOf` TIME-TRAVEL option. The relation the
  *    planner ultimately sees is the SAME manifest-statistics
  *    HadoopFsRelation every Scala read builds (statistics, data
  *    skipping, DV filtering, rename mapping included) — the
  *    [[GraftRelationRule]] resolution rule swaps the V2 relation
  *    for it, so deploy with
  *    `spark.sql.extensions=graft.GraftExtensions` (exactly Delta's
  *    deployment contract).
  *  - BATCH WRITE: `INSERT INTO` / `df.writeTo(...).append()` via the
  *    V1 write fallback ([[org.apache.spark.sql.connector.write.V1Write]]
  *    — the public Delta pattern): the insert IS
  *    [[NamedTables.insertInto]], a layout-dispatched append through
  *    the staging path with carried props/stats/ledger.
  *  - STREAMING SINK: `writeStream.format("graft")` creates a V1
  *    [[Sink]] wrapping [[Snapshots.mergeBatch]] — the batch id rides
  *    in the committed manifest, so a restarted query REPLAYS nothing
  *    (the q167 discipline, now the default instead of a
  *    foreachBatch convention). Options: `keys` (comma-separated
  *    merge keys, required), `bucket` (the bucket column, required),
  *    `sort` (defaults to `keys`).
  *
  * Named SQL reads (`SELECT ... FROM cat.db.t`) come from
  * [[GraftCatalog]], which loads the same [[GraftTable]].
  */
class GraftDataSource extends TableProvider with DataSourceRegister
    with StreamSinkProvider {

  override def shortName(): String = "graft"

  // schema comes from the table's own manifest, never from the user
  override def supportsExternalMetadata(): Boolean = false

  private def dirOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(throw new IllegalArgumentException(
      "format(\"graft\") needs a table directory: " +
        "spark.read.format(\"graft\").load(dir)"))

  /** Time-travel options: `versionAsOf` (a snapshot version) or
    * `timestampAsOf` (epoch MICROS, or a `yyyy-MM-dd HH:mm:ss[.f…]`
    * local timestamp — the Delta option shape), resolved through
    * [[graft.operators.Snapshots.versionAtTimestamp]]. The timestamp
    * resolution is memoized per (dir, micros) on this provider
    * instance: `inferSchema` and `getTable` both resolve, and a
    * commit landing between the two walks could otherwise hand the
    * relation a schema from a DIFFERENT version than its data. */
  @volatile private var tsResolved: (String, Long, Long) = null

  private def versionOf(options: CaseInsensitiveStringMap): Option[Long] =
    Option(options.get("versionAsOf")).map(_.toLong).orElse(
      Option(options.get("timestampAsOf")).map { s =>
        val micros = scala.util.Try(s.toLong).getOrElse {
          val t = java.sql.Timestamp.valueOf(s)
          t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
        }
        val dir = dirOf(options)
        val cached = tsResolved
        if (cached != null && cached._1 == dir && cached._2 == micros)
          cached._3
        else {
          val v = graft.operators.Snapshots.versionAtTimestamp(
            SparkSession.active, dir, micros)
          tsResolved = (dir, micros, v)
          v
        }
      })

  /** Empty for a directory with no committed snapshots rather than
    * throwing: the STREAMING-SINK path probes the provider's table
    * before falling back to [[createSink]] (the target usually does
    * not exist yet), and a READ of a missing table still fails loudly
    * — at analysis, where [[GraftRelationRule]] resolves the read. */
  private def feedMode(options: CaseInsensitiveStringMap): Boolean =
    Option(options.get("changeFeed")).exists(_.toBoolean)

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    val dir = dirOf(options)
    if (graft.operators.Snapshots.latest(spark, dir).isEmpty)
      new StructType()
    else if (feedMode(options))
      graft.streaming.ChangeFeed.feedSchema(spark, dir)
    else NamedTables.schemaNamed(spark, dir, versionOf(options))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    if (feedMode(opts)) {
      // readStream.format("graft").option("changeFeed", true): the CDC
      // feed (schema gains _change/_version) — exactly
      // ChangeFeed.readStream, reachable by short name
      def num(k: String): Long = Option(opts.get(k)).map(_.toLong).getOrElse(0L)
      graft.streaming.ChangeFeed.feedTable(dirOf(opts),
        num("startVersion"), num("maxVersionsPerBatch"),
        num("maxBytesPerBatch"),
        graft.streaming.ChangeFeed.feedSchema(SparkSession.active, dirOf(opts)))
    } else GraftTable(dirOf(opts), versionOf(opts))
  }

  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: OutputMode): Sink = {
    def req(k: String): String = parameters.getOrElse(k,
      throw new IllegalArgumentException(
        s"writeStream.format(\"graft\") needs the '$k' option " +
          "(plus 'path'; 'sort' defaults to 'keys')"))
    val dir = req("path")
    val keys = req("keys").split(",").toSeq.filter(_.nonEmpty)
    val bucket = req("bucket")
    val sorts = parameters.get("sort")
      .map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(keys)
    require(keys.nonEmpty, "the 'keys' option must name at least one column")
    new GraftSink(dir, bucket, keys, sorts)
  }
}

/** One named graft table (a directory + optional time-travel pin).
  * The Delta shape: reads are swapped to the V1 manifest relation by
  * [[GraftRelationRule]]; writes go through the V1 fallback so the
  * insert is the Scala API's layout-dispatched append. */
final case class GraftTable(dir: String, versionAsOf: Option[Long])
    extends Table with SupportsRead with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete {

  override def name(): String =
    versionAsOf.fold(s"graft.`$dir`")(v => s"graft.`$dir`@v$v")

  override lazy val schema: StructType =
    NamedTables.schemaNamed(SparkSession.active, dir, versionAsOf)

  override def properties(): util.Map[String, String] = {
    val m = new util.HashMap[String, String]()
    NamedTables.propsNamed(SparkSession.active, dir)
      .foreach { case (k, v) => m.put(k, v) }
    // the provider key drives SHOW CREATE TABLE's `USING graft` — the
    // emitted DDL must be re-runnable against this catalog
    m.put(org.apache.spark.sql.connector.catalog.TableCatalog.PROP_PROVIDER,
      "graft")
    m
  }

  override def capabilities(): util.Set[TableCapability] =
    // TRUNCATE = "can replace all content" — what lets INSERT
    // OVERWRITE (OverwriteByExpression with a true filter) reach the
    // V1 fallback's insert(data, overwrite = true).
    // MICRO_BATCH_READ = the APPEND-ONLY TAIL stream: a catalog ident
    // (readStream.table("cat.db.t")) or a bare format load streams
    // the new versions' inserted rows under the TABLE's own schema —
    // a catalog-resolved relation cannot grow the _change/_version
    // columns, so non-append changes REFUSE (the Delta source
    // contract) and CDC goes through option("changeFeed", true)
    // AUTOMATIC_SCHEMA_EVOLUTION = the analyzer may widen this table
    // for MERGE ... WITH SCHEMA EVOLUTION (ResolveMergeIntoSchema-
    // Evolution computes the TableChanges and routes them through the
    // catalog's alterTable -> Snapshots.evolveSchema: additive
    // nullable adds + lossless widening, ONE metadata commit)
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.AUTOMATIC_SCHEMA_EVOLUTION)

  /** Batch half never EXECUTES in a correctly-deployed session: the
    * [[GraftRelationRule]] resolution rule replaces read relations
    * with the manifest-statistics V1 plan long before scan planning.
    * The builder itself must still CONSTRUCT, though — `DELETE FROM`
    * keeps its V2 relation and Spark's V2ScanRelationPushDown calls
    * newScanBuilder on it during optimization even though the
    * metadata-only delete never runs the scan — so only `toBatch`
    * (actual execution) refuses, with the deployment story. The
    * STREAMING half is real: `toMicroBatchStream` is the append-only
    * tail (reader options — startVersion, maxVersionsPerBatch,
    * maxBytesPerBatch — arrive here on both the `.table(ident)` and
    * the format paths). */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): org.apache.spark.sql.connector.read.Scan =
        new org.apache.spark.sql.connector.read.Scan {
          override def readSchema(): StructType = schema
          override def description(): String = name()
          override def toBatch: org.apache.spark.sql.connector.read.Batch =
            throw new IllegalStateException(
              "graft named-table reads plan through the GraftExtensions " +
                "resolution rule — start the session with " +
                "spark.sql.extensions=graft.GraftExtensions (the same " +
                "deployment contract as Delta's extension). A DELETE " +
                "whose condition Spark cannot push down as filters — " +
                "e.g. a subquery — also lands here: use " +
                "Snapshots.deleteWhere(Column) with the materialized " +
                "key set instead")
          override def toMicroBatchStream(checkpointLocation: String)
              : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
            require(versionAsOf.isEmpty,
              "cannot STREAM a time-travel (versionAsOf) read")
            require(!Option(options.get("changeFeed")).exists(_.toBoolean),
              "the _change/_version columns cannot ride a catalog-resolved " +
                "relation's fixed schema — read the CDC feed via " +
                "spark.readStream.format(\"graft\")" +
                ".option(\"changeFeed\", true).load(dir)")
            def num(k: String): Long =
              Option(options.get(k)).map(_.toLong).getOrElse(0L)
            graft.streaming.ChangeFeed.appendTailStream(dir,
              num("startVersion"), num("maxVersionsPerBatch"),
              num("maxBytesPerBatch"), schema)
          }
        }
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(dir, versionAsOf, overwriting = false)

  /** SQL `DELETE FROM ... WHERE` — a MERGE-ON-READ delete on any
    * layout ([[Snapshots.deleteWhere]]: matched positions commit as
    * deletion vectors, zero files written; the per-file inline budget
    * refuses rewrite-scale deletes toward the copy-on-write paths).
    * Spark hands us the condition as source Filters only when it is
    * fully translatable — which covers the GDPR headline
    * (`WHERE id IN (...)`, equality, ranges); richer predicates go
    * through the Scala `deleteWhere(Column)` directly. */
  override def canDeleteWhere(
      filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    filters.forall(f => GraftTable.filterToColumn(f).isDefined)

  override def deleteWhere(
      filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    require(versionAsOf.isEmpty,
      "cannot DELETE from a time-travel (versionAsOf) read")
    val cond = filters.map(f => GraftTable.filterToColumn(f).getOrElse(
        throw new UnsupportedOperationException(
          s"cannot translate delete filter $f — use " +
            "Snapshots.deleteWhere(Column) for richer predicates")))
      .reduceOption(_ && _)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    Snapshots.deleteWhere(SparkSession.active, dir, cond)
    ()
  }
}

object GraftTable {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.sources

  /** Translate one pushed-down source Filter back to a Column — the
    * exact evaluation [[Snapshots.deleteWhere]] runs (null semantics
    * match the filters' own contracts: comparisons null out, In
    * matches non-null members only). */
  private[sources] def filterToColumn(f: sources.Filter): Option[Column] =
    f match {
      case sources.EqualTo(a, v) => Some(col(a) === lit(v))
      case sources.EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
      case sources.GreaterThan(a, v) => Some(col(a) > lit(v))
      case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
      case sources.LessThan(a, v) => Some(col(a) < lit(v))
      case sources.LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
      case sources.In(a, vs) => Some(col(a).isin(vs.toSeq: _*))
      case sources.IsNull(a) => Some(col(a).isNull)
      case sources.IsNotNull(a) => Some(col(a).isNotNull)
      case sources.StringStartsWith(a, v) => Some(col(a).startsWith(v))
      case sources.StringEndsWith(a, v) => Some(col(a).endsWith(v))
      case sources.StringContains(a, v) => Some(col(a).contains(v))
      case sources.And(l, r) =>
        for (lc <- filterToColumn(l); rc <- filterToColumn(r)) yield lc && rc
      case sources.Or(l, r) =>
        for (lc <- filterToColumn(l); rc <- filterToColumn(r)) yield lc || rc
      case sources.Not(c) => filterToColumn(c).map(!_)
      case sources.AlwaysTrue() => Some(lit(true))
      case sources.AlwaysFalse() => Some(lit(false))
      case _ => None
    }
}

/** The V1-fallback write: INSERT INTO appends, and the planner's
  * `truncate()` call (INSERT OVERWRITE with an always-true filter —
  * Spark requires the builder to IMPLEMENT SupportsTruncate, the
  * TRUNCATE capability alone is not consulted here) switches the
  * insert to [[NamedTables.overwriteInto]]. */
private[sources] final class GraftWriteBuilder(
    dir: String, versionAsOf: Option[Long], overwriting: Boolean)
    extends WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {

  override def truncate(): WriteBuilder =
    new GraftWriteBuilder(dir, versionAsOf, overwriting = true)

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, overwrite: Boolean): Unit = {
          require(versionAsOf.isEmpty,
            "cannot INSERT into a time-travel (versionAsOf) read")
          if (overwriting || overwrite)
            NamedTables.overwriteInto(data.sparkSession, dir, data)
          else NamedTables.insertInto(data.sparkSession, dir, data)
          ()
        }
      }
  }
}

/** The V1 streaming sink: every microbatch is one
  * [[Snapshots.mergeBatch]] — an atomic manifest commit carrying the
  * batch id, so the ledger absorbs replays after a restart (the
  * exactly-once contract, spec-pinned with a REAL writeStream restart).
  * The incoming frame is re-wrapped batch-style
  * ([[org.apache.spark.sql.graftext.StreamBatch.rebatch]] — the
  * foreachBatch discipline) because the merge runs joins and
  * aggregates the streaming-tagged plan would refuse. */
final class GraftSink(dir: String, bucket: String, keys: Seq[String],
                      sorts: Seq[String]) extends Sink {
  override def name(): String = s"graft.`$dir`"
  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val batch = org.apache.spark.sql.graftext.StreamBatch.rebatch(data)
    Snapshots.mergeBatch(batchId, batch, dir, bucket, keys, sorts)
  }
  override def toString: String = s"GraftSink[$dir]"
}
