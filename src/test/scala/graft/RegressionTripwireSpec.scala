package graft

/** Stage-time tripwire for the three queries whose round-3 bench
  * recordings looked (falsely) regressed: a generous min-of-3 warmed
  * ceiling at sf0.01. The MIN of three runs is what a layout/kernel
  * regression cannot hide under and machine contention cannot inflate
  * past ~3× — so a failure here means the PLAN changed (a scan
  * serialized, an explode returned, a broadcast fell away), not that
  * the box was busy. Ceilings carry ~10–20× headroom over the
  * quiet-box warmed times, so this spec stays green through contention
  * and fails only on structural damage.
  */
class RegressionTripwireSpec extends SparkSpecBase {

  private val sf001 = "/root/testdata/sf0.01"

  /** (query, generous ceiling sec; quiet-box warmed ≈ 0.3–0.9 s). */
  private val ceilings = Seq(
    "partition_pruned" -> 8.0,
    "orc_roundtrip" -> 8.0,
    "minhash_lsh" -> 12.0,
    // round-5 curve additions: the bloom-prefiltered span detector and
    // the IVF probe face (quiet-box warmed ≈ 0.5–1.5 s at sf0.01)
    "dup_ngram_spans" -> 15.0,
    "ann_ivf_probe" -> 15.0,
    // round-6: the auto-sized default IVF face (quiet-box warmed
    // ≈ 0.6 s at sf0.01) and the round-5 curve-less queries, now on
    // the measured curve (SCALING.md §round-6)
    "ann_ivf_auto" -> 15.0,
    "ngram_novelty" -> 18.0,
    // round-11: the four round-10 warmed-bench drifters — all
    // recovered on a quiet box (0.11/0.15/0.55/0.17 s warmed at
    // sf0.1), adjudicating the drift as machine noise; tripwired here
    // so a real plan regression in any of them is caught structurally
    "stratified_sample" -> 10.0,
    "skew_profile" -> 10.0,
    "split_leak_check" -> 15.0,
    "scd2_history" -> 10.0)

  test("prior worst-case queries stay under generous warmed stage ceilings at sf0.01") {
    for ((name, ceiling) <- ceilings) {
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sf001).count()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm: plan, codegen, one-time tmp-table writes
      val best = Seq(once(), once(), once()).min
      spark.catalog.clearCache()
      assert(best < ceiling,
        f"$name min-of-3 warmed ${best}%.2f s exceeds the ${ceiling}%.1f s " +
          "tripwire — a plan-level regression (serialized scan, returned " +
          "explode, lost broadcast), not machine noise")
    }
  }

  /** Driver-budget tripwire: the driver benches every registered query
    * in SINGLE-RUN mode (Bench's default protocol). This runs exactly
    * that — every query once, cold, sum of wall times — under a ceiling
    * generous enough for a contended box (quiet-box sum ≈ 60–90 s at
    * sf0.01) but far below the driver's wall budget, so a future
    * pathological query (the round-4 failure mode: a bench that cannot
    * finish) is caught HERE, before the driver ever runs it.
    */
  test("single-run sweep of every registered query stays within the driver-budget ceiling at sf0.01") {
    // budget scales with the registered-query count (round-5 verdict:
    // a fixed bound silently becomes the timeout as the suite grows) —
    // ~2.5 s/query at sf0.01 is ≥3× the observed contended per-query
    // mean, with a 300 s floor preserving the original calibration
    val budget = math.max(300.0, 2.5 * SparkEntry.queries.size)
    var total = 0.0
    var worst = ("", 0.0)
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val t0 = System.nanoTime()
      fn(spark, sf001).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      total += dt
      if (dt > worst._2) worst = (name, dt)
      assert(total < budget,
        f"single-run sweep blew the ${budget}%.0f s driver-budget ceiling " +
          f"after '$name' (sum ${total}%.1f s; worst so far ${worst._1} " +
          f"${worst._2}%.1f s) — a query got pathologically slow and " +
          "would time out the driver's bench")
    }
  }
}
