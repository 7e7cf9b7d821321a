package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line of per-query timings, built to survive
  * a slow or contended driver box (round 4's rc=124 lesson).
  *
  * Execution protocol is budget-proof four ways:
  *  - `SPARK_GRAFT_BENCH_RUNS` (default **1**) controls runs per query.
  *    The default is a SINGLE timed run — the driver pays ~110 query
  *    executions, not the 440 a warmed median-of-3 costs. Opt into
  *    `SPARK_GRAFT_BENCH_RUNS=3` locally for the warmed median-of-3
  *    protocol (one untimed warm + 3 timed, median recorded) when
  *    measuring engine changes on an uncontended box.
  *  - a `[bench] <name> <secs>` stderr line is flushed AS EACH QUERY
  *    FINISHES, so a killed run's tail names the query it died in.
  *  - `target/bench.json` is rewritten after EVERY query with the
  *    results so far (`"partial":true` until the final write), so even
  *    a timeout-killed run leaves a parseable per-query artifact.
  *  - the multi-row-group input copy is content-fingerprint cached
  *    across JVMs (BenchData.realisticCopy), so repeated bench runs pay
  *    the rewrite once, not per launch.
  *
  * Failures are reported as timing -1 and listed under "failed" instead
  * of being silently recorded as fast successes. The session cache is
  * cleared between queries (caller-owned lifecycle for the persisted
  * relations inside the dedup/LSH pipelines) so no storage leaks across
  * the run and timings are independent of query order.
  *
  * Machine-sanity evidence rides in the artifact: /proc/loadavg at start
  * and end plus bench wall time vs sum-of-timings, so a run recorded on
  * a contended box is self-evident from the JSON alone. Output is
  * truncation-proof three ways: a short headline line FIRST (survives a
  * head-keeping capture), the full JSON line LAST (survives a
  * tail-keeping capture), and a full-precision copy at target/bench.json
  * (survives any stdout capture).
  */
object Bench {

  private def loadavg(): String =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
      .split(" ").take(3).mkString(",")
    catch { case _: Throwable => "na" }

  private def load1(): Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
      .split(" ").head.toDouble
    catch { case _: Throwable => -1.0 }

  /** LOAD GATE (round 13 — the r12 lesson: a warmed median-of-3
    * recorded at loadavg 4.7 drifted +10% across the board and could
    * not demonstrate the round's perf work). In warmed mode the bench
    * DEFENDS its own artifact: it refuses to start measuring until
    * the 1-min loadavg falls to `SPARK_GRAFT_BENCH_MAX_LOAD` (default
    * 1.5), polling every 30 s up to `SPARK_GRAFT_BENCH_LOAD_WAIT_SEC`
    * (default 600); on timeout it still runs — data beats no data —
    * but stamps `"load_gate":"FAILED ..."` into the sanity block so
    * the artifact can never pass as a clean record. Single-run
    * (driver-protocol) mode never waits: the driver owns that budget.
    * Returns the sanity-field value.
    */
  private def awaitQuietBox(warmed: Boolean): String = {
    if (!warmed) return "skipped(single-run)"
    // an unreadable /proc/loadavg (load1 = -1) is a DISTINCT outcome, not
    // a pass: an unmeasurable environment must not masquerade as a clean
    // record (ADVICE r13)
    if (load1() < 0) return "unknown(loadavg-unreadable)"
    val maxLoad = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_LOAD", "1.5")
      .toDouble
    val waitSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_LOAD_WAIT_SEC",
      "600").toLong
    val deadline = System.nanoTime() + waitSec * 1000000000L
    var l = load1()
    while (l > maxLoad && System.nanoTime() < deadline) {
      System.err.println(
        s"[bench] load gate: 1-min loadavg $l > $maxLoad — waiting 30s")
      Thread.sleep(30000L)
      l = load1()
    }
    if (l < 0) "unknown(loadavg-unreadable)"
    else if (l <= maxLoad) s"pass(load=$l,max=$maxLoad)"
    else s"FAILED(load=$l,max=$maxLoad,waited=${waitSec}s)"
  }

  /** Box-speed calibration: a fixed single-threaded xorshift loop timed
    * once per bench launch (after the load gate, before the first query)
    * and recorded as `calib_sec` in the sanity block — so cross-round
    * comparisons can normalize by a MEASURED per-core-speed constant
    * instead of an untouched-query-family median heuristic (VERDICT r13
    * item 5). Single-threaded on purpose: it calibrates core speed, the
    * thing that scales every query's CPU time; the load gate already
    * covers contention. The accumulator is returned and printed so the
    * loop cannot be dead-code-eliminated.
    */
  private def calibrate(): Double = {
    var x = 0x9E3779B97F4A7C15L
    var acc = 0L
    val t0 = System.nanoTime()
    var i = 0
    while (i < 400000000) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      acc += x
      i += 1
    }
    val dt = (System.nanoTime() - t0) / 1e9
    System.err.println(s"[bench] calib_sec=${fmt(dt)} (acc=$acc)")
    dt
  }

  /** Locale-pinned number format: the f-interpolator honors the default
    * locale, and a comma-decimal locale would emit invalid JSON
    * ("0,123"). package-visible so BenchFormatSpec can pin this under a
    * comma-decimal default locale.
    */
  private[graft] def fmt(v: Double): String =
    if (v < 0) "-1"
    else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runsPerQuery =
      math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "1").toInt)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      // LOCAL-ONLY seed: shuffle.partitions = cores is right for a
      // single-JVM bench; on a cluster you'd start high (2-3x total
      // cores) and let AQE coalesce — do not copy this 32 into a
      // cluster conf (see SCALING.md)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // size scan splits to the SF (the brief's maxPartitionBytes rule):
    // the default 128 MB split is right at 100 TB but folds the whole
    // ~10 MB test fact into one task; with the multi-row-group copies
    // below this gives real parallel scans + AQE partition statistics
    operators.BenchData.scanSplitConf.foreach { case (k, v) =>
      builder.config(k, v)
    }
    // AQE coalescing floor sized to the box, not the 1 MB cluster
    // default (round 15 — see BenchData.adaptiveConf's scale note)
    operators.BenchData.adaptiveConf.foreach { case (k, v) =>
      builder.config(k, v)
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    plans.VectorExprs.register(spark)
    // multi-row-group copies of the fact tables (dims symlinked) so the
    // bench exercises multi-task scans instead of the driver parquet's
    // single-row-group serial reads
    val benchDir = operators.BenchData.realisticCopy(spark, sfDir)
    System.err.println(s"[bench] realistic multi-row-group inputs at $benchDir")
    // untimed global warmup: JIT/codegen/classloading paths, not query work
    try {
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/region.parquet")
        .groupBy(col("r_name")).count().count()
    } catch { case _: Throwable => () }
    val loadGate = awaitQuietBox(warmed = runsPerQuery > 1)
    System.err.println(s"[bench] load_gate=$loadGate")
    val calibSec = calibrate()
    // a query is flagged CONTENDED when the 1-min loadavg at its
    // finish exceeds what this bench can generate by itself (the
    // SPARK_GRAFT_CPUS local threads plus scheduler slack) — evidence
    // of a co-tenant mid-run, recorded per query so a drifting artifact
    // names its own suspects; skipped entirely when loadavg is
    // unreadable (a failed measurement can neither flag nor clear)
    val selfAllow = cpus.toInt * 1.25 +
      sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_LOAD", "1.5").toDouble
    val contended = scala.collection.mutable.ArrayBuffer.empty[String]
    val loadStart = loadavg()
    val wall0 = System.nanoTime()

    def artifactJson(results: Seq[(String, Double)], partial: Boolean,
                     wall: Double, loadEnd: String): String = {
      val total = results.collect { case (_, v) if v >= 0 => v }.sum
      val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
        .mkString("[", ",", "]")
      val cont = contended.map("\"" + _ + "\"").mkString("[", ",", "]")
      val sanity = s"""{"runs_per_query":$runsPerQuery,"partial":$partial,""" +
        s""""wall_sec":${fmt(wall)},"sum_sec":${fmt(total)},""" +
        s""""load_start":"$loadStart","load_end":"$loadEnd",""" +
        s""""load_gate":"$loadGate","calib_sec":${fmt(calibSec)},""" +
        s""""contended":$cont}"""
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec"""" +
        s""","queries":$qs,"failed":$failed,"sf":"$sfDir","sanity":$sanity}"""
    }
    // anchor the committed artifact to the repo root (nearest ancestor
    // of CWD holding build.sbt), not the bare CWD — a bench launched
    // from outside the repo otherwise silently drops the committed copy
    // somewhere else (ADVICE r9)
    val repoRoot: java.nio.file.Path = {
      var d = java.nio.file.Paths.get("").toAbsolutePath
      var found: Option[java.nio.file.Path] = None
      while (d != null && found.isEmpty) {
        if (java.nio.file.Files.exists(d.resolve("build.sbt"))) found = Some(d)
        d = d.getParent
      }
      found.getOrElse(java.nio.file.Paths.get("").toAbsolutePath)
    }
    // a SPARK_GRAFT_BENCH_ONLY subset run writes to its own artifact —
    // it must never clobber the committed full-registry record
    val artifactPaths =
      if (sys.env.contains("SPARK_GRAFT_BENCH_ONLY"))
        Seq(repoRoot.resolve("target/bench_only.json"))
      else Seq(repoRoot.resolve("target/bench.json"),
        repoRoot.resolve("BENCH_latest_full.json"))
    def writeArtifact(json: String): Unit =
      // two copies: target/bench.json (the historical dev location) and
      // BENCH_latest_full.json at the repo root — target/ is
      // .gitignored, so per-query history depended on a head-truncated
      // stdout capture (r7/r8 ADVICE); the root copy is plain-committed
      // with the round, closing that gap for every future run
      for (path <- artifactPaths) {
        try {
          val w = new java.io.PrintWriter(path.toFile)
          try w.println(json) finally w.close()
        } catch { case e: Throwable =>
          System.err.println(s"[bench] could not write $path: $e")
        }
      }
    System.err.println(
      s"[bench] artifacts anchored at ${repoRoot.toAbsolutePath}")

    val done = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    // SPARK_GRAFT_BENCH_ONLY: comma-separated query names to measure a
    // targeted subset (A/B adjudication, single-query iteration) under
    // the exact bench protocol. Unset = the full registry. Unknown names
    // fail loudly — a typo must not silently measure nothing.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val all = SparkEntry.queries.toSeq.sortBy(_._1)
    only.foreach { o =>
      val unknown = o -- all.map(_._1).toSet
      require(unknown.isEmpty, s"SPARK_GRAFT_BENCH_ONLY names unknown " +
        s"queries: ${unknown.toSeq.sorted.mkString(",")}")
    }
    val names = only.fold(all)(o => all.filter(kv => o.contains(kv._1)))
    for ((name, fn) <- names) {
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, benchDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1.0
        }
      }
      val dt =
        if (runsPerQuery == 1) once()
        else {
          // warmed median: one untimed warm, then `runs` timed
          val warmedOk = once() >= 0
          if (!warmedOk) -1.0 else {
            val runs = Seq.fill(runsPerQuery)(once()).sorted
            if (runs.head < 0) -1.0 else runs(runsPerQuery / 2)
          }
        }
      spark.catalog.clearCache()
      val lq = load1()
      if (lq >= 0 && lq > selfAllow) contended += name
      done += (name -> dt)
      // progress line flushed per query: a killed run's tail names the
      // query it died in (round 4's silent 42-minute gap)
      System.err.println(s"[bench] $name ${fmt(dt)} (${done.size}/${names.size})")
      System.err.flush()
      // partial artifact after every query: a timeout kill still leaves
      // a parseable per-query record
      writeArtifact(artifactJson(done.toSeq, partial = true,
        (System.nanoTime() - wall0) / 1e9, loadavg()))
    }
    val wall = (System.nanoTime() - wall0) / 1e9
    val loadEnd = loadavg()
    val results = done.toSeq
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    // headline FIRST on its own short line: survives a capture that
    // keeps the head and truncates the long per-query line
    println(s"[bench] total_sec=${fmt(total)} n_queries=${results.size} " +
      s"runs_per_query=$runsPerQuery wall_sec=${fmt(wall)} " +
      s"load_start=$loadStart load_end=$loadEnd")
    val json = artifactJson(results, partial = false, wall, loadEnd)
    println(json)
    writeArtifact(json)
    spark.stop()
  }
}
