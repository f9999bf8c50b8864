package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.ArrayOps

/** Regression: the Vec* fold kernels must codegen-compile when their
  * input column is NON-NULLABLE with non-nullable elements.
  *
  * nullSafeCodeGen's non-nullable branch swaps ev.isNull to the
  * `false` literal AFTER the template string is built, so any
  * `${ev.isNull}` reference in the template keeps the original
  * variable name — which is then never declared in the generated
  * source, and Janino rejects the whole projection ("isNull_N is not
  * an rvalue"). Spark silently falls back to the INTERPRETED
  * projection, so results stay correct but every per-row fold loses
  * codegen — exactly the constant-factor cliff these kernels exist to
  * remove. Parquet-sourced columns are nullable, which hid this; a
  * checkpointed Dataset-derived frame (KmeansSpec's corpus shape) has
  * containsNull = false and exposed it.
  *
  * CODEGEN_ONLY turns the silent fallback into a hard failure, so
  * this spec pins compilability itself, not just values.
  */
class CodegenNullabilitySpec extends SparkSuite {
  import spark.implicits._

  private def withCodegenOnly[A](f: => A): A = {
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try f finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("float/double/long fold kernels compile on non-nullable inputs") {
    // explicit non-nullable schema: field nullable=false AND
    // containsNull=false, the combination that routes nullSafeCodeGen
    // into its non-nullable branch
    import org.apache.spark.sql.types._
    def arr(t: DataType) = ArrayType(t, containsNull = false)
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("fvec", arr(FloatType), nullable = false),
      StructField("dvec", arr(DoubleType), nullable = false),
      StructField("lvec", arr(LongType), nullable = false)))
    val rows = java.util.Arrays.asList(org.apache.spark.sql.Row(
      1L, Array(1.0f, 2.0f, 3.0f), Array(2.0, 0.5, 1.0), Array(3L, 4L, 5L)))
    val fd = spark.createDataFrame(rows, schema)
    assert(!fd.schema("fvec").nullable &&
      !fd.schema("fvec").dataType.asInstanceOf[ArrayType].containsNull,
      "fixture must be non-nullable for the regression to bite")
    val ld = fd

    withCodegenOnly {
      val r = fd.select(
        ArrayOps.vecDot(col("fvec"), col("dvec")).as("dot"),
        ArrayOps.vecL2Sq(col("fvec"), col("dvec"), 1).as("l2"))
        .collect()(0)
      assert(r.getDouble(0) == 1.0 * 2.0 + 2.0 * 0.5 + 3.0 * 1.0)
      // window [2f,3f] vs [2.0,0.5]: 0 + 2.5^2
      assert(r.getDouble(1) == 0.0 + 2.5 * 2.5)
      val d = ld.select(ArrayOps.vecDotLong(col("lvec"), Array(2L, 3L, 4L)).as("dl"))
        .collect()(0)
      assert(d.getLong(0) == 6L + 12L + 20L)
    }
  }

  test("the same kernels still null out NULL elements on nullable inputs") {
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(Array[Any](1.0, null, 3.0)),
      org.apache.spark.sql.Row(Array[Any](1.0, 2.0, 3.0)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = true))))
    val df = spark.createDataFrame(rows, schema)
    withCodegenOnly {
      val got = df.select(ArrayOps.vecDot(col("v"), col("v")).as("n2"))
        .collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
      assert(got(0) == null && got(1) == 14.0)
    }
  }

  test("scalar kernels (ZOrderKey, DeflateSize) compile on non-nullable inputs") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("x", LongType, nullable = false),
      StructField("y", LongType, nullable = false),
      StructField("s", StringType, nullable = false)))
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(3L, 1L, "abcabcabc"))
    val df = spark.createDataFrame(rows, schema).localCheckpoint()
    withCodegenOnly {
      val r = df.select(
        org.apache.spark.sql.graftext.Bits.zorder(col("x"), col("y")).as("z"),
        org.apache.spark.sql.graftext.TextNorm.deflateLen(col("s")).as("d"))
        .collect()(0)
      assert(r.getLong(0) === 7L)
      assert(r.getLong(1) > 0L && r.getLong(1) <= 11L) // 9 repetitive bytes deflate small
    }
  }
}
