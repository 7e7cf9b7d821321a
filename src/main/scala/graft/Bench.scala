package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: warmed, median-of-3 per-query timings as one JSON line.
  *
  * Per query: one untimed warm run (plan, codegen, JIT, cache fill), then
  * THREE timed runs with the median recorded — a single contended run can
  * no longer masquerade as an engine regression, and one fast outlier
  * can't hide one. Failures are reported as timing -1 and listed under
  * "failed" instead of being silently recorded as fast successes. The
  * session cache is cleared between queries (caller-owned lifecycle for
  * the persisted relations inside the dedup/LSH pipelines) so no storage
  * leaks across the run and timings are independent of query order.
  *
  * Machine-sanity evidence rides in the artifact: /proc/loadavg at start
  * and end plus bench wall time vs sum-of-medians, so a run recorded on a
  * contended box is self-evident from the JSON alone. Output is
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

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
    val loadStart = loadavg()
    val wall0 = System.nanoTime()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, benchDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1.0
        }
      }
      val warmedOk = once() >= 0
      val dt = if (!warmedOk) -1.0 else {
        val runs = Seq(once(), once(), once()).sorted
        if (runs.head < 0) -1.0 else runs(1) // median of 3
      }
      spark.catalog.clearCache()
      name -> dt
    }
    val wall = (System.nanoTime() - wall0) / 1e9
    val loadEnd = loadavg()
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    def fmt(v: Double): String = if (v < 0) "-1" else f"$v%.3f"
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val sanity = s"""{"runs_per_query":3,"wall_sec":${fmt(wall)},""" +
      s""""sum_median_sec":${fmt(total)},"load_start":"$loadStart",""" +
      s""""load_end":"$loadEnd"}"""
    // headline FIRST on its own short line: survives a capture that
    // keeps the head and truncates the long per-query line
    println(f"[bench] total_sec=$total%.3f n_queries=${results.size}%d " +
      s"wall_sec=${fmt(wall)} load_start=$loadStart load_end=$loadEnd")
    val json = s"""{"metric":"total","value":${fmt(total)},"unit":"sec"""" +
      s""","queries":$qs,"failed":$failed,"sf":"$sfDir","sanity":$sanity}"""
    println(json)
    try {
      val w = new java.io.PrintWriter("target/bench.json")
      try w.println(json) finally w.close()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write target/bench.json: $e")
    }
    spark.stop()
  }
}
