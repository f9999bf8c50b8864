package graft

/** Phase profiler for optimization passes (guide §1: measure first).
  * Wall-clock per labeled phase to stderr, enabled by SPARK_GRAFT_PROF=1
  * — one cached boolean test when off, so instrumented hot paths cost
  * nothing in production or in the bench. Output is a flat stream of
  * `[prof] <seconds> <label>` lines; attribution to a query is by
  * reading them in order next to the caller's own timestamps
  * (BenchOne prints per-run walls around each query). */
object Prof {
  val on: Boolean = sys.env.get("SPARK_GRAFT_PROF").contains("1")
  def apply[T](label: => String)(f: => T): T =
    if (!on) f
    else {
      val t0 = System.nanoTime()
      try f
      finally System.err.println(
        f"[prof] ${(System.nanoTime() - t0) / 1e9}%8.3f s  $label")
    }
}
