package graft

import org.apache.spark.sql.functions._

/** Source/sink format breadth: the engine's frames round-trip through
  * the columnar formats Spark ships (parquet is the native test data;
  * ORC here; CSV/JSON/text covered by CsvAttrs/GeoJsonSource specs). */
class FormatsSpec extends SparkSuite {

  test("ORC round trip preserves schema and values") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val src = Tables.nation(spark, sf)
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema === src.schema)
    assert(back.orderBy("n_nationkey").collect().toSeq ===
      src.orderBy("n_nationkey").collect().toSeq)
  }

  test("partitioned parquet write prunes partitions on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables.customer(spark, sf)
      .write.mode("overwrite").partitionBy("c_mktsegment").parquet(dir)
    val one = spark.read.parquet(dir).filter(col("c_mktsegment") === "BUILDING")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || one.count() > 0)
    val expected = Tables.customer(spark, sf)
      .filter(col("c_mktsegment") === "BUILDING").count()
    assert(one.count() === expected)
  }
}
