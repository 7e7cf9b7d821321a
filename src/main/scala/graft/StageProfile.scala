package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: per-stage wall time for one query.
  *
  * `SPARK_GRAFT_BENCH_LAYOUT=1` profiles against the same
  * multi-row-group BenchData copies (and the bench's SF-sized scan
  * splits) that graft.Bench times, so stage timings explain the bench
  * numbers instead of the single-row-group driver parquet's serial
  * scans.
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val srcDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val name = if (args.length > 1) args(1) else "minhash_lsh"
    val benchLayout = sys.env.get("SPARK_GRAFT_BENCH_LAYOUT").contains("1")
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (benchLayout) {
      (operators.BenchData.scanSplitConf ++
        operators.BenchData.adaptiveConf).foreach { case (k, v) =>
        builder.config(k, v)
      }
    }
    // ad-hoc conf experiments: SPARK_GRAFT_EXTRA_CONF="k=v;k2=v2"
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach { s =>
      s.split(";").filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k.trim, v.trim)
      }
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir =
      if (benchLayout) {
        val d = operators.BenchData.realisticCopy(spark, srcDir)
        System.err.println(s"[profile] bench layout at $d")
        d
      } else srcDir
    // per-run stage aggregation: count, wall-sum, task-time sum, GC —
    // so a warmed run can be split into stage work vs driver-side gaps
    // (planning, listing, codegen). Volatile: listener runs on the
    // event bus thread.
    @volatile var stageCount = 0
    @volatile var stageWallMs = 0L
    @volatile var taskTimeMs = 0L
    @volatile var gcMs = 0L
    val verbose = !sys.env.get("SPARK_GRAFT_PROFILE_QUIET").contains("1")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val info = s.stageInfo
        val ms = for {
          st <- info.submissionTime; ct <- info.completionTime
        } yield ct - st
        stageCount += 1
        stageWallMs += ms.getOrElse(0L)
        taskTimeMs += info.taskMetrics.executorRunTime
        gcMs += info.taskMetrics.jvmGCTime
        if (verbose)
          println(f"[stage] ${info.stageId}%3d ${ms.getOrElse(-1L)}%6d ms  tasks=${info.numTasks}%3d  ${info.name.take(90)}")
      }
    })
    // the codegen-cache conf is STATIC — a pre-existing session in this
    // JVM would silently ignore it (ADVICE r15); surface that instead
    // of profiling a different engine than the bench measures
    if (benchLayout) {
      val want = operators.BenchData.adaptiveConf
        .toMap.apply("spark.sql.codegen.cache.maxEntries")
      val got = spark.conf.get("spark.sql.codegen.cache.maxEntries")
      if (got != want) System.err.println(
        s"[profile] WARNING: static codegen.cache.maxEntries=$got " +
          s"(wanted $want) — pre-existing session?")
    }
    // warm up common paths first
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // validated parse: a typo'd env var must fail the launch legibly,
    // not NumberFormatException after the session spun up (ADVICE r15)
    val runs = sys.env.get("SPARK_GRAFT_PROFILE_RUNS")
      .map(s => s.toIntOption.getOrElse(sys.error(
        s"SPARK_GRAFT_PROFILE_RUNS not an int: '$s'"))).getOrElse(1)
    for (r <- 1 to runs) {
      stageCount = 0; stageWallMs = 0L; taskTimeMs = 0L; gcMs = 0L
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      // drain the async listener bus BEFORE reading the counters — a
      // run's last stage events otherwise bleed into run r+1's summary
      // (ADVICE r15), skewing exactly the stage-work/driver-gap split
      // this tool exists to measure. The bus has no public drain, so
      // poll the counters until they sit still for two 200 ms windows.
      var settled = 0
      var last = (stageCount, stageWallMs, taskTimeMs)
      val drainDeadline = System.nanoTime() + 10L * 1000000000L
      while (settled < 2 && System.nanoTime() < drainDeadline) {
        Thread.sleep(200)
        val now = (stageCount, stageWallMs, taskTimeMs)
        if (now == last) settled += 1 else { settled = 0; last = now }
      }
      println(f"[run $r] total=$dt%.2f s stages=$stageCount " +
        f"stage_wall=${stageWallMs / 1e3}%.2f s " +
        f"task_time=${taskTimeMs / 1e3}%.2f s gc=${gcMs / 1e3}%.2f s")
    }
    Thread.sleep(500)
    spark.stop()
  }
}
