package graft.tools

import org.apache.spark.sql.SparkSession

/** The q105 in-suite-slowness probe (r12/r13 bench adjudications): is
  * the 2×+ wall growth of a code-untouched query inside the 187-query
  * suite WHOLE-STAGE-CODEGEN CACHE THRASH? Spark's generated-class
  * cache holds `spark.sql.codegen.cache.maxEntries` (default 100)
  * compiled classes JVM-wide; a suite compiling hundreds of distinct
  * stages evicts everything each round, so every "warm" round pays
  * Janino again — CPU wall with near-zero GC, exactly the signature
  * the bench's gc_ms probe measured (q105: 2.06 s in-suite, 7 ms GC,
  * 0.9 s isolated).
  *
  * Protocol: time the target warm (twice), FLOOD the cache by running
  * a broad slice of other queries once, then time the target again.
  * Run with the default cache and with it raised:
  *   sbt "runMain graft.tools.CacheProbe q105_gif_pixels"
  *   SPARK_GRAFT_CODEGEN_CACHE=4096 sbt "runMain ..."
  * If flooded-vs-warm reproduces the in-suite number at default and
  * vanishes when raised, the adjudication is mechanical. */
object CacheProbe {
  def main(args: Array[String]): Unit = {
    val target = args.headOption.getOrElse("q105_gif_pixels")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cache = sys.env.get("SPARK_GRAFT_CODEGEN_CACHE")
    val b = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    cache.foreach(n => b.config("spark.sql.codegen.cache.maxEntries", n))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.entry(spark).count()
    def time(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[cacheprobe] cache=${cache.getOrElse("default(100)")} target=$target")
    time(target) // compile
    println(f"[cacheprobe] warm1: ${time(target)}%.2f s")
    println(f"[cacheprobe] warm2: ${time(target)}%.2f s")
    // flood: a broad, cheap slice of the suite (planning diversity is
    // what evicts — exclude the target and the heavyweights)
    val flood = graft.SparkEntry.queries.keys.toSeq.sorted
      .filterNot(Set(target, "q104_pagerank", "q178_delete_cdc",
        "q187_z_cdc", "q176_cdc_loop", "q188_dv_delete", "q31_minhash_pairs",
        "q190_named_catalog", "q191_sql_merge", "q192_sql_update",
        "q193_sql_maintain", "q186_maintain", "q173_txn_publish"))
      .take(120)
    val tf0 = System.nanoTime()
    flood.foreach(q => scala.util.Try(
      graft.SparkEntry.queries(q)(spark, dir).count()))
    println(f"[cacheprobe] flooded ${flood.size} queries in " +
      f"${(System.nanoTime() - tf0) / 1e9}%.1f s")
    println(f"[cacheprobe] after-flood1: ${time(target)}%.2f s")
    println(f"[cacheprobe] after-flood2: ${time(target)}%.2f s")
    spark.stop()
  }
}
