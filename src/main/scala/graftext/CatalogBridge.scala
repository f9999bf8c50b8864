package org.apache.spark.sql.graftext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog}

/** Multipart-identifier → V2 table resolution for code OUTSIDE the
  * sql package tree (the session's CatalogManager is `private[sql]`;
  * this package sits inside it — the [[PlanBridge]] pattern). Used by
  * the maintenance SQL statements ([[graft.sources.GraftSqlParser]]),
  * which run at EXECUTION time and so cannot lean on the analyzer's
  * own relation resolution. */
object CatalogBridge {

  /** Resolve `parts` the way Spark's analyzer does: a first part that
    * names a registered catalog selects it, anything else resolves in
    * the current catalog; a bare name lands in the current namespace.
    * Throws the catalog's own no-such-table error for missing tables. */
  def loadTable(spark: SparkSession, parts: Seq[String]): Table = {
    val cm = spark.sessionState.catalogManager
    val (cat, ident) =
      if (parts.size > 1 && scala.util.Try(cm.catalog(parts.head)).isSuccess)
        (cm.catalog(parts.head),
          Identifier.of(parts.tail.init.toArray, parts.last))
      else if (parts.size == 1)
        (cm.currentCatalog, Identifier.of(cm.currentNamespace, parts.head))
      else
        (cm.currentCatalog, Identifier.of(parts.init.toArray, parts.last))
    cat match {
      case tc: TableCatalog => tc.loadTable(ident)
      case other => throw new IllegalArgumentException(
        s"catalog ${other.name} cannot load tables (not a TableCatalog)")
    }
  }
}
