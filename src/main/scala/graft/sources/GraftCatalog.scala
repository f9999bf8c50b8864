package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, StagedTable, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.{NamedTables, Snapshots}

/** A FILESYSTEM-BACKED [[TableCatalog]] over a warehouse root — the
  * piece that makes `SELECT ... FROM cat.db.t` and
  * `CREATE TABLE cat.db.t ... USING graft` work (the public
  * DeltaCatalog shape, minus the Hive metastore: here the filesystem
  * IS the metastore, which is exactly how the maintenance sweep
  * ([[graft.operators.MaintenanceRunner.runAll]]) already discovers
  * tables — a directory with a `_manifests` child is a table).
  *
  * Deploy:
  * {{{
  * --conf spark.sql.catalog.graft=graft.sources.GraftCatalog
  * --conf spark.sql.catalog.graft.warehouse=/warehouse
  * --conf spark.sql.extensions=graft.GraftExtensions
  * }}}
  * then `graft.db.t` maps to `/warehouse/db/t`. Reads inherit the
  * manifest statistics / skipping / DV / rename machinery (the
  * [[GraftRelationRule]] swap); `VERSION AS OF n` time travel resolves
  * through [[loadTable(ident:Identifier,version:String)*]];
  * INSERT INTO appends through the table's own layout.
  *
  * CREATE TABLE commits an EMPTY version 1 carrying the declared
  * schema and TBLPROPERTIES (declare `maintain.bucket` /
  * `maintain.sort` there to make a flat table insertable — the same
  * properties every other surface dispatches on). DROP TABLE deletes
  * the directory. ALTER TABLE SET/UNSET TBLPROPERTIES and RENAME
  * COLUMN pass through to the format's metadata-only commits
  * (properties land atomically in ONE commit); structural column
  * changes and RENAME TABLE are refused — schema evolves through the
  * format's own merge paths.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with org.apache.spark.sql.connector.catalog.StagingTableCatalog {

  private var catName: String = _
  private var warehouse: String = _

  private def spark: SparkSession = SparkSession.active

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catName = name
    warehouse = Option(options.get("warehouse")).map(_.stripSuffix("/"))
      .getOrElse(throw new IllegalArgumentException(
        s"catalog $name needs a warehouse root: set " +
          s"spark.sql.catalog.$name.warehouse=<dir>"))
  }

  override def name(): String = catName

  /** Identifier segments become PATH segments — validate them as
    * such, or a backtick-quoted identifier like `..` (or one carrying
    * a slash) escapes the warehouse root and a DROP deletes data
    * OUTSIDE the catalog. One plain directory name per segment. */
  private def segment(s: String): String = {
    require(s.nonEmpty && s != "." && s != ".." &&
      !s.contains("/") && !s.contains("\\") && s.indexOf(0) < 0,
      s"invalid catalog identifier segment '$s' — one plain " +
        "directory name per namespace/table level (no separators, " +
        "no relative-path segments)")
    s
  }

  private def dirFor(ident: Identifier): String =
    (warehouse +: ident.namespace.toSeq.map(segment) :+
      segment(ident.name)).mkString("/")

  private def dirFor(ns: Seq[String]): String =
    (warehouse +: ns.map(segment)).mkString("/")

  private def fs(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def isTable(dir: String): Boolean =
    Snapshots.latest(spark, dir).isDefined

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val p = new Path(dirFor(namespace.toSeq))
    val f = fs(p)
    if (!f.exists(p)) throw new NoSuchNamespaceException(namespace)
    f.listStatus(p).filter(_.isDirectory).map(_.getPath)
      .filter(d => f.exists(new Path(d, "_manifests")))
      .map(d => Identifier.of(namespace, d.getName)).sortBy(_.name)
  }

  override def tableExists(ident: Identifier): Boolean =
    isTable(dirFor(ident))

  override def loadTable(ident: Identifier): Table = {
    val dir = dirFor(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    GraftTable(dir, None)
  }

  /** SQL `VERSION AS OF n` time travel. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = dirFor(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val v = scala.util.Try(version.toLong).getOrElse(
      throw new IllegalArgumentException(
        s"graft VERSION AS OF takes a numeric snapshot version, got: " +
          version))
    require(Snapshots.versions(spark, dir).contains(v),
      s"$dir has no committed version $v " +
        s"(versions: ${Snapshots.versions(spark, dir).mkString(",")})")
    GraftTable(dir, Some(v))
  }

  /** SQL `TIMESTAMP AS OF t` time travel — the V2 contract hands the
    * evaluated timestamp in EPOCH MICROS; resolution (newest stamped
    * commit ≤ t, writer-skew adjusted) is
    * [[Snapshots.versionAtTimestamp]]. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val dir = dirFor(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    GraftTable(dir, Some(Snapshots.versionAtTimestamp(spark, dir, timestamp)))
  }

  /** Keys Spark itself attaches to CREATE TABLE that are not CARRIED
    * table properties. */
  private val ReservedProps =
    Set("provider", "location", "owner", "external", "comment",
      "option.path", "path")

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft tables declare their layout as table properties " +
        "(maintain.bucket/maintain.sort) or are created through the " +
        "layout APIs — PARTITIONED BY is not the model")
    val dir = dirFor(ident)
    if (isTable(dir)) throw new TableAlreadyExistsException(ident)
    import scala.jdk.CollectionConverters._
    val props = properties.asScala.toMap
      .filterNot { case (k, _) => ReservedProps.contains(k.toLowerCase) }
    NamedTables.createEmpty(spark, dir, schema, props)
    GraftTable(dir, None)
  }

  /** ALTER TABLE passthrough to the format's own METADATA-ONLY
    * commits: SET/UNSET TBLPROPERTIES → [[Snapshots.setProp]] (one
    * commit per key, each a carried-property replace), RENAME COLUMN
    * → [[Snapshots.rename]] (the colmap commit — files keep their
    * birth names, stats stay physical-keyed). Structural changes
    * (add/drop/retype columns) refuse: schema evolves through the
    * format's additive/widening MERGE paths, where the data that
    * justifies the change arrives with it. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = dirFor(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    // VALIDATE every change before committing anything — a refused
    // change in the middle of the list must leave the table
    // unmodified (the alterTable contract); then all property changes
    // land in ONE metadata commit (setProps), not one per key
    val propChanges = changes.collect {
      case s: TableChange.SetProperty => s.property() -> Some(s.value())
      case r: TableChange.RemoveProperty => r.property() -> None
    }
    val renames = changes.collect { case rc: TableChange.RenameColumn => rc }
    val adds = changes.collect { case a: TableChange.AddColumn => a }
    val widenings = changes.collect {
      case u: TableChange.UpdateColumnType => u
    }
    changes.foreach {
      case _: TableChange.SetProperty | _: TableChange.RemoveProperty => ()
      case rc: TableChange.RenameColumn =>
        require(rc.fieldNames().length == 1,
          "RENAME COLUMN supports top-level columns only " +
            s"(got ${rc.fieldNames().mkString(".")})")
      case a: TableChange.AddColumn =>
        // ADD COLUMNS = the format's additive evolution (metadata
        // only, readers null-fill) — also what the analyzer's
        // MERGE ... WITH SCHEMA EVOLUTION routes here
        require(a.fieldNames().length == 1,
          "ADD COLUMNS supports top-level columns only " +
            s"(got ${a.fieldNames().mkString(".")})")
        require(a.position() == null,
          "ADD COLUMNS appends at the end — FIRST/AFTER positions " +
            "would reorder a columnar schema for nothing")
        require(a.defaultValue() == null,
          "ADD COLUMNS with a DEFAULT is not supported — added " +
            "columns null-fill (backfill with UPDATE)")
      case u: TableChange.UpdateColumnType =>
        require(u.fieldNames().length == 1,
          "ALTER COLUMN TYPE supports top-level columns only " +
            s"(got ${u.fieldNames().mkString(".")})")
      case other => throw new UnsupportedOperationException(
        s"ALTER TABLE change ${other.getClass.getSimpleName} is not " +
          "supported — graft schemas evolve additively (ADD COLUMNS, " +
          "lossless type widening, RENAME COLUMN); drops/narrows are " +
          "a rewrite decision")
    }
    propChanges.foreach { case (k, vv) =>
      require(k.nonEmpty && !k.contains("=") && !k.contains("\n") &&
        !k.contains(":"), s"invalid property key '$k'")
      vv.foreach(x => require(!x.contains("\n"),
        s"invalid property value for '$k' (must be single-line)"))
    }
    // renames run AFTER the property commit — pre-validate the whole
    // rename sequence against the current schema/layout bindings so a
    // refusable rename refuses the statement BEFORE anything lands
    Snapshots.renamePrecheck(spark, dir,
      renames.map(rc => rc.fieldNames()(0) -> rc.newName()))
    if (propChanges.nonEmpty) Snapshots.setProps(spark, dir, propChanges)
    renames.foreach(rc =>
      Snapshots.rename(spark, dir, rc.fieldNames()(0), rc.newName()))
    if (adds.nonEmpty || widenings.nonEmpty)
      Snapshots.evolveSchema(spark, dir,
        adds.map(a => org.apache.spark.sql.types.StructField(
          a.fieldNames()(0), a.dataType(), nullable = true)),
        widenings.map(u => u.fieldNames()(0) -> u.newDataType()))
    GraftTable(dir, None)
  }

  // ---- StagingTableCatalog: atomic CTAS + HISTORY-PRESERVING
  // ---- REPLACE (the Delta StagedDeltaTableV2 shape). Spark prefers
  // ---- these over the non-atomic create-then-write / drop-then-
  // ---- create fallbacks whenever the catalog implements the
  // ---- interface; the staged data lands under dir/data INVISIBLY
  // ---- (no manifest references it) and one commitStagedChanges
  // ---- makes the whole definition appear — or, for REPLACE, lands
  // ---- ONE head-replacing version while every earlier version
  // ---- stays time-travelable (`VERSION AS OF` across a REPLACE).

  override def stageCreate(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): StagedTable = {
    val dir = dirFor(ident)
    if (isTable(dir)) throw new TableAlreadyExistsException(ident)
    newStaged(ident, dir, schema, partitions, properties, replace = false,
      orCreate = false)
  }

  override def stageReplace(ident: Identifier, schema: StructType,
                            partitions: Array[Transform],
                            properties: util.Map[String, String]): StagedTable = {
    val dir = dirFor(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    newStaged(ident, dir, schema, partitions, properties, replace = true,
      orCreate = false)
  }

  override def stageCreateOrReplace(ident: Identifier, schema: StructType,
                                    partitions: Array[Transform],
                                    properties: util.Map[String, String])
      : StagedTable = {
    val dir = dirFor(ident)
    newStaged(ident, dir, schema, partitions, properties, replace = true,
      orCreate = true)
  }

  private def newStaged(ident: Identifier, dir: String, schema: StructType,
                        partitions: Array[Transform],
                        properties: util.Map[String, String],
                        replace: Boolean, orCreate: Boolean): StagedTable = {
    require(partitions.isEmpty,
      "graft tables declare their layout as table properties " +
        "(maintain.bucket/maintain.sort) — PARTITIONED BY is not the model")
    import scala.jdk.CollectionConverters._
    val props = properties.asScala.toMap
      .filterNot { case (k, _) => ReservedProps.contains(k.toLowerCase) }
    new StagedGraftTable(ident, dir, schema, props, replace, orCreate)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirFor(ident)
    if (!isTable(dir)) false
    else {
      // dropPath already deletes the directory recursively AND purges
      // the metadata caches; the contract's boolean is "a table was
      // deleted", which we just established
      Snapshots.dropPath(spark, dir)
      true
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "RENAME TABLE is not supported on the filesystem catalog")

  // ---- namespaces: directories under the warehouse root ----

  override def listNamespaces(): Array[Array[String]] = {
    val p = new Path(warehouse)
    val f = fs(p)
    if (!f.exists(p)) Array.empty
    else f.listStatus(p).filter(_.isDirectory).map(_.getPath)
      .filterNot(d => f.exists(new Path(d, "_manifests")))
      .map(d => Array(d.getName)).sortBy(_.mkString)
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else {
      if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
      Array.empty
    }

  override def namespaceExists(namespace: Array[String]): Boolean = {
    val p = new Path(dirFor(namespace.toSeq))
    fs(p).exists(p)
  }

  override def loadNamespaceMetadata(
      namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    new util.HashMap[String, String]()
  }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit = {
    val p = new Path(dirFor(namespace.toSeq))
    fs(p).mkdirs(p)
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "namespace metadata is not supported on the filesystem catalog")

  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    val p = new Path(dirFor(namespace.toSeq))
    val f = fs(p)
    if (!f.exists(p)) false
    else {
      require(cascade || f.listStatus(p).isEmpty,
        s"namespace ${namespace.mkString(".")} is not empty")
      f.delete(p, true)
    }
  }
}

/** The staged half of [[GraftCatalog]]'s atomic CTAS / REPLACE: a V1
  * write ([[org.apache.spark.sql.connector.write.V1Write]], the same
  * fallback every graft write uses) STAGES parquet under `dir/data`
  * with the definition's declared `maintain.*` layout — invisible
  * until [[commitStagedChanges]] lands the single manifest commit
  * ([[graft.operators.NamedTables.commitStagedCreate]] /
  * [[graft.operators.NamedTables.commitStagedReplace]]). Abort
  * deletes exactly what was staged (create-mode: the whole directory,
  * which held nothing else). */
private[sources] final class StagedGraftTable(
    ident: Identifier, dir: String, declaredSchema: StructType,
    props: Map[String, String], replace: Boolean, orCreate: Boolean)
    extends org.apache.spark.sql.connector.catalog.StagedTable
    with org.apache.spark.sql.connector.catalog.SupportsWrite {

  import org.apache.spark.sql.connector.catalog.TableCapability
  import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write, WriteBuilder}
  import org.apache.spark.sql.sources.InsertableRelation

  @volatile private var staged: Option[graft.operators.Snapshots.Staged] = None

  override def name(): String = ident.toString
  override def schema(): StructType = declaredSchema
  override def capabilities(): util.Set[TableCapability] =
    // TRUNCATE: the REPLACE ... AS SELECT write plans as a
    // truncate-mode write on the STAGED table — which stages only the
    // new definition's data anyway, so truncate() is the same write
    util.EnumSet.of(TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder
      with org.apache.spark.sql.connector.write.SupportsTruncate {
      override def truncate(): WriteBuilder = this
      override def build(): org.apache.spark.sql.connector.write.Write =
        new V1Write {
          override def toInsertableRelation: InsertableRelation =
            new InsertableRelation {
              override def insert(data: org.apache.spark.sql.DataFrame,
                                  overwrite: Boolean): Unit = {
                staged = Some(
                  graft.operators.NamedTables.stageData(data, dir, props))
                ()
              }
            }
        }
    }

  override def commitStagedChanges(): Unit = {
    val spark = SparkSession.active
    if (replace)
      graft.operators.NamedTables.commitStagedReplace(
        spark, dir, declaredSchema, props, staged, orCreate)
    else
      graft.operators.NamedTables.commitStagedCreate(
        spark, dir, declaredSchema, props, staged)
    ()
  }

  override def abortStagedChanges(): Unit = {
    val spark = SparkSession.active
    val f = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    if (!replace && Snapshots.latest(spark, dir).isEmpty) {
      // create-mode: nothing committed ever lived here — drop the dir
      Snapshots.dropPath(spark, dir)
    } else staged.foreach(_.rels.foreach { rel =>
      f.delete(new Path(s"$dir/$rel"), false); ()
    })
  }
}
