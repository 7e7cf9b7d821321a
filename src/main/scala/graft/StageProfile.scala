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
      operators.BenchData.scanSplitConf.foreach { case (k, v) =>
        builder.config(k, v)
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
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val info = s.stageInfo
        val ms = for {
          st <- info.submissionTime; ct <- info.completionTime
        } yield ct - st
        println(f"[stage] ${info.stageId}%3d ${ms.getOrElse(-1L)}%6d ms  tasks=${info.numTasks}%3d  ${info.name.take(90)}")
      }
    })
    // warm up common paths first
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir).count()
    println(f"[total] ${(System.nanoTime() - t0) / 1e9}%.2f s")
    Thread.sleep(500)
    spark.stop()
  }
}
