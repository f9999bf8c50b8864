package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Attribute-table (CSV) helpers mirroring the reference's data prep
  * (reference main.py:79 `to_int`, :89 `parse_pop`, :96 `get_sub_pop`,
  * :116 `make_gdf`): parse CSVs with messy numeric columns, subset by
  * code lists, and merge attributes onto an entity/geometry frame.
  */
object CsvAttrs {

  /** Header CSV -> DataFrame (all columns string; clean explicitly). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").csv(path)

  /** The reference's `to_int`: values like "1,234,567" (and plain
    * ints) -> long. Null-safe; non-numeric residue becomes null
    * rather than an ANSI cast error. */
  def cleanLong(c: Column): Column =
    regexp_replace(c.cast("string"), ",", "").try_cast("long")

  /** get_sub_pop: keep rows whose key is in the entity frame's key
    * set — expressed as a semi join so the code list never needs to
    * be collected (main.py loops a python list; this streams). */
  def subsetByKeys(attrs: DataFrame, attrKey: String,
                   entities: DataFrame, entityKey: String): DataFrame =
    attrs.join(entities.select(col(entityKey).as(attrKey)).distinct(),
      Seq(attrKey), "left_semi")

  /** make_gdf: merge attribute columns onto the entity frame by key
    * (inner, like pandas merge default). */
  def mergeAttrs(entities: DataFrame, entityKey: String,
                 attrs: DataFrame, attrKey: String): DataFrame =
    entities.join(attrs.withColumnRenamed(attrKey, entityKey), Seq(entityKey))
}
