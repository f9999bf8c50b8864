package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
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
class GraftCatalog extends TableCatalog with SupportsNamespaces {

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
    changes.foreach {
      case _: TableChange.SetProperty | _: TableChange.RemoveProperty => ()
      case rc: TableChange.RenameColumn =>
        require(rc.fieldNames().length == 1,
          "RENAME COLUMN supports top-level columns only " +
            s"(got ${rc.fieldNames().mkString(".")})")
      case other => throw new UnsupportedOperationException(
        s"ALTER TABLE change ${other.getClass.getSimpleName} is not " +
          "supported — graft schemas evolve through the format's own " +
          "additive/widening merge paths (Snapshots.merge)")
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
    GraftTable(dir, None)
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
