package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: per-stage wall time for one query. */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val name = if (args.length > 1) args(1) else "minhash_lsh"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
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
