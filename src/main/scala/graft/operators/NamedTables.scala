package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** The LAYOUT-DISPATCHED surface behind NAMED tables (the DSv2
  * `format("graft")` provider and the `GraftCatalog` — see
  * [[graft.sources.GraftDataSource]]): one place that answers "what
  * does a user-facing read/insert of THIS directory mean", by the
  * table's OWN metadata — never by guessing (the
  * [[MaintenanceRunner.maintainOne]] discipline applied to the query
  * surface):
  *
  *  - a z-order table reads through [[ZOrderTable.readAt]] (derived
  *    curve/bucket/mapped-grid columns dropped) and inserts through
  *    [[ZOrderTable.append]] / [[ZOrderTable.appendMapped]] (codes
  *    re-derived from the carried layout — same cells whoever
  *    writes);
  *  - a hash-bucketed table reads through
  *    [[HashBucketedTable.readAt]] and appends at the CURRENT
  *    modulus;
  *  - a width-bucketed table reads through [[BucketedTable.readAt]]
  *    and appends at the current width;
  *  - a FLAT table reads [[Snapshots.readAt]] directly and inserts
  *    via [[Snapshots.append]] under its carried `maintain.bucket` /
  *    `maintain.sort` properties (the same properties the
  *    maintenance sweep dispatches on — declare the layout once,
  *    every surface agrees);
  *  - a table with neither layout metadata nor those properties
  *    READS fine but REFUSES inserts with the fix spelled out.
  *
  * Reads inherit everything the Scala API has — the
  * manifest-statistics relation, data skipping, DV filtering, rename
  * mapping — because these ARE the Scala API's plans.
  */
object NamedTables {

  /** The table's layout at version `v`, from its own metadata:
    * "z" / "hash" / "width" / "flat". The ONE detector every surface
    * shares ([[MaintenanceRunner.maintainOne]] dispatches off it too
    * — two detectors could classify the same table differently). A
    * layout line that does not PARSE does not classify: a malformed
    * `#bucketh` must not send an insert into hash arithmetic that
    * will crash deeper in. */
  def layoutAt(spark: SparkSession, dir: String, v: Long): String = {
    val m = Snapshots.committedManifest(spark, dir, v)
    def wellFormed(key: String): Boolean =
      m.metaValues(key).headOption.exists(s => s.split(":", 2) match {
        case Array(k, n) =>
          k.nonEmpty && scala.util.Try(n.toLong).toOption.exists(_ > 0)
        case _ => false
      })
    if (m.props.contains("zlayout")) "z"
    else if (wellFormed("bucketh")) "hash"
    else if (wellFormed("bucketw")) "width"
    else "flat"
  }

  private def resolve(spark: SparkSession, dir: String,
                      version: Option[Long]): Long =
    version.getOrElse(Snapshots.latest(spark, dir).getOrElse(
      throw new IllegalArgumentException(
        s"$dir has no committed snapshots — not a graft table")))

  /** The named-table READ: time travel via `version`, layout-derived
    * columns dropped — what `SELECT * FROM t` should show. */
  def readNamed(spark: SparkSession, dir: String,
                version: Option[Long] = None): DataFrame = {
    val v = resolve(spark, dir, version)
    layoutAt(spark, dir, v) match {
      case "z" => ZOrderTable.readAt(spark, dir, v)
      case "hash" => HashBucketedTable.readAt(spark, dir, v)
      case "width" => BucketedTable.readAt(spark, dir, v)
      case _ => Snapshots.readAt(spark, dir, v)
    }
  }

  /** The named-table read SCHEMA (plan-only — zero jobs; the
    * manifest-backed relation fabricates statuses, no data opens). */
  def schemaNamed(spark: SparkSession, dir: String,
                  version: Option[Long] = None): StructType =
    readNamed(spark, dir, version).schema

  /** The carried table properties of the latest version (the DSv2
    * `Table.properties()` surface); empty for a bare table. */
  def propsNamed(spark: SparkSession, dir: String): Map[String, String] =
    Snapshots.latest(spark, dir)
      .map(v => Snapshots.propsAt(spark, dir, v)).getOrElse(Map.empty)

  /** The named-table INSERT (SQL `INSERT INTO` lands here through the
    * provider's V1 write): an APPEND through the table's own layout —
    * staged, stat-walked, committed exactly like the Scala API's,
    * with carried props/stats/ledger intact (it IS the Scala API's
    * append). Returns the committed version. */
  def insertInto(spark: SparkSession, dir: String, data: DataFrame): Long = {
    val v = resolve(spark, dir, None)
    layoutAt(spark, dir, v) match {
      case "z" =>
        val mapped = ZOrderTable.layoutAt(spark, dir, v).dims
          .forall(_.startsWith(ZOrderTable.MapPrefix))
        if (mapped) ZOrderTable.appendMapped(data, dir)
        else ZOrderTable.append(data, dir)
      case "hash" => HashBucketedTable.append(data, dir)
      case "width" => BucketedTable.append(data, dir)
      case _ =>
        val props = Snapshots.propsAt(spark, dir, v)
        (props.get("maintain.bucket"), props.get("maintain.sort")) match {
          case (Some(b), Some(s)) =>
            Snapshots.append(data, dir, b,
              s.split(",").toSeq.filter(_.nonEmpty))
          case _ => throw new IllegalArgumentException(
            s"INSERT INTO a flat graft table needs its write layout " +
              "declared as table properties: set maintain.bucket and " +
              "maintain.sort (TBLPROPERTIES at CREATE, or " +
              "Snapshots.setProp) — a write surface never guesses " +
              s"a table's layout ($dir)")
        }
    }
  }

  /** The named-table INSERT OVERWRITE: replace the head's content
    * through [[Snapshots.overwrite]] — supported for FLAT tables
    * under their declared `maintain.*` layout; the clustered layouts
    * refuse (an overwrite of a z/hash/width table is a re-publish
    * decision — their own publish/compact APIs own cell/bucket
    * assignment, and guessing here would silently de-cluster). */
  def overwriteInto(spark: SparkSession, dir: String,
                    data: DataFrame): Long = {
    val v = resolve(spark, dir, None)
    layoutAt(spark, dir, v) match {
      case "flat" =>
        val props = Snapshots.propsAt(spark, dir, v)
        (props.get("maintain.bucket"), props.get("maintain.sort")) match {
          case (Some(b), Some(s)) =>
            Snapshots.overwrite(data, dir, b,
              s.split(",").toSeq.filter(_.nonEmpty))
          case _ => throw new IllegalArgumentException(
            s"INSERT OVERWRITE needs the flat table's write layout " +
              "declared as maintain.bucket/maintain.sort table " +
              s"properties ($dir)")
        }
      case other => throw new IllegalArgumentException(
        s"INSERT OVERWRITE is not supported on a $other-layout table " +
          s"($dir) — overwriting a clustered table is a re-publish " +
          "decision; use the layout's own publish APIs")
    }
  }

  /** CREATE TABLE's backing commit: an EMPTY version 1 carrying the
    * declared schema and the TBLPROPERTIES as `#prop:` lines — zero
    * data files (reads are empty, the first INSERT appends under the
    * declared `maintain.*` layout). Refuses if the directory already
    * holds snapshots. */
  def createEmpty(spark: SparkSession, dir: String, schema: StructType,
                  props: Map[String, String]): Unit = {
    require(Snapshots.latest(spark, dir).isEmpty,
      s"$dir already holds a graft table")
    Snapshots.commit(spark, dir, 1L, Nil,
      Seq("format:2", s"schema:${Snapshots.nullable(schema).json}") ++
        propLinesOf(props))
  }

  /** Validated `prop:` lines for a definition's TBLPROPERTIES — the
    * SAME validation rule as Snapshots.setProp (a key a create/replace
    * accepts but setProp refuses would be a property no API can ever
    * update or remove). */
  private def propLinesOf(props: Map[String, String]): Seq[String] = {
    props.foreach { case (k, vv) =>
      require(k.nonEmpty && !k.contains("=") && !k.contains("\n") &&
        !k.contains(":"), s"invalid table property key '$k'")
      require(!vv.contains("\n"),
        s"invalid table property value for '$k' (must be single-line)")
    }
    props.toSeq.sortBy(_._1).map { case (k, vv) => s"prop:$k=$vv" }
  }

  // ---- the StagingTableCatalog halves (ATOMIC CTAS, history-
  // ---- preserving REPLACE — [[graft.sources.GraftCatalog]])

  /** Stage CTAS/RTAS data under `dir` WITHOUT committing: files land
    * in `dir/data` but stay invisible (no manifest references them)
    * until the staged commit lands — abort just deletes them. The
    * definition must declare the flat write layout (`maintain.*` in
    * its TBLPROPERTIES), the same never-guess contract as INSERT. */
  def stageData(data: DataFrame, dir: String,
                props: Map[String, String]): Snapshots.Staged =
    (props.get("maintain.bucket"), props.get("maintain.sort")) match {
      case (Some(b), Some(s)) =>
        Snapshots.stage(data, dir, b, s.split(",").toSeq.filter(_.nonEmpty),
          128L * 1024 * 1024, 32)
      case _ => throw new IllegalArgumentException(
        "CREATE/REPLACE TABLE ... AS SELECT needs the flat write layout " +
          "declared in the definition: TBLPROPERTIES(" +
          s"'maintain.bucket'=..., 'maintain.sort'=...) ($dir)")
    }

  /** The atomic-CTAS commit: ONE version carrying the declared
    * schema, the TBLPROPERTIES and the staged files together — the
    * table either exists complete or not at all (contrast the
    * non-staged fallback's empty-create + append pair). */
  def commitStagedCreate(spark: SparkSession, dir: String,
                         schema: StructType, props: Map[String, String],
                         st: Option[Snapshots.Staged]): Unit = {
    require(Snapshots.latest(spark, dir).isEmpty,
      s"$dir already holds a graft table")
    Snapshots.commit(spark, dir, 1L, st.map(_.rels).getOrElse(Nil),
      Seq("format:2", s"schema:${Snapshots.nullable(schema).json}") ++
        propLinesOf(props) ++
        st.toSeq.flatMap(s0 =>
          s0.statLines ++ s0.stat2Lines ++ s0.ndvLines ++ s0.sizeLines))
  }

  /** The HISTORY-PRESERVING REPLACE commit (Delta's REPLACE
    * semantics, vs the drop+recreate fallback): one head-replacing
    * version holding ONLY the new definition — new schema, new
    * props, only the staged files — while every earlier version
    * stays time-travelable. The old definition's colmap/statcols do
    * NOT carry (the files that justified them are not referenced
    * here); the exactly-once batch ledger DOES (a restart's
    * re-delivered batch must still absorb — the carriedBatch
    * discipline every non-batch commit follows). */
  def commitStagedReplace(spark: SparkSession, dir: String,
                          schema: StructType, props: Map[String, String],
                          st: Option[Snapshots.Staged],
                          orCreate: Boolean): Long =
    Snapshots.latest(spark, dir) match {
      case None =>
        require(orCreate, s"$dir has no table to REPLACE " +
          "(use CREATE OR REPLACE)")
        commitStagedCreate(spark, dir, schema, props, st)
        1L
      case Some(prev) =>
        val pm = Snapshots.manifest(spark, dir, prev)
        val v = Snapshots.claimAbove(spark, dir, prev)
        Snapshots.commit(spark, dir, v, st.map(_.rels).getOrElse(Nil),
          Seq("format:2", s"schema:${Snapshots.nullable(schema).json}") ++
            Snapshots.carriedBatch(pm) ++ propLinesOf(props) ++
            st.toSeq.flatMap(s0 =>
              s0.statLines ++ s0.stat2Lines ++ s0.ndvLines ++ s0.sizeLines))
        v
    }
}
