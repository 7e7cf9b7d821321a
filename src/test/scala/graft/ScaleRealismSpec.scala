package graft

import org.apache.spark.sql.functions._

/** The two runtime behaviors the single-row-group driver parquet can
  * never exercise, demonstrated on derived multi-file copies:
  *
  *  1. scan parallelism — BenchData's multi-row-group fact copies split
  *     into >1 input partition once maxPartitionBytes is sized to the
  *     SF (the bench runs with exactly this layout + sizing);
  *  2. AQE skew-join splitting — a deliberately hot-keyed relation gets
  *     its oversized shuffle partition split at runtime, which is the
  *     mechanism SCALING.md leans on for skewed keys at 100 TB.
  */
class ScaleRealismSpec extends SparkSpecBase {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("multi-row-group fact copies scan with >1 EFFECTIVE task (rows in >1 partition)") {
    val benchDir = operators.BenchData.realisticCopy(spark, sf)
    // nominal split count is byte-range based, so even a single-row-group
    // file "splits" — but every split except the one holding the row
    // group's start produces ZERO rows. Effective parallelism = partitions
    // that actually emit rows, which only multiple row groups can raise.
    def effectiveTasks(path: String): Int =
      spark.read.parquet(path).select(lit(1))
        .rdd.mapPartitions(it => Iterator(if (it.hasNext) 1 else 0))
        .collect().sum
    // same sizing the bench session uses, scaled to the tiny spec SF
    withConf(
      "spark.sql.files.maxPartitionBytes" -> "64k",
      "spark.sql.files.openCostInBytes" -> "16k") {
      val copyTasks = effectiveTasks(s"$benchDir/lineitem.parquet")
      val origTasks = effectiveTasks(s"$sf/lineitem.parquet")
      assert(origTasks == 1,
        s"expected the driver's single-row-group source to feed 1 task, got $origTasks")
      assert(copyTasks > 1,
        s"lineitem copy still feeds $copyTasks task(s) — multi-row-group " +
          "rewrite is not taking effect")
    }
  }

  test("AQE splits the hot partition of a deliberately skewed join") {
    import spark.implicits._
    // KEY FINDING pinned here: AQE splits a skewed reduce partition at
    // MAPPER boundaries, so a 1-mapper shuffle (exactly what the driver's
    // single-row-group parquet produces) is INDIVISIBLE and skew handling
    // silently never fires. The multi-row-group BenchData copy is what
    // makes the mitigation possible at all — same reason the bench uses
    // it. sf0.01 so the per-file row groups carry enough bytes to clear
    // the (lowered) skew threshold.
    val sf01 = new java.io.File(new java.io.File(sf).getParentFile, "sf0.01").getPath
    assume(new java.io.File(sf01).isDirectory, s"needs the sf0.01 dataset at $sf01")
    val benchDir = operators.BenchData.realisticCopy(spark, sf01)
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32k",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.files.maxPartitionBytes" -> "64k",
      "spark.sql.files.openCostInBytes" -> "16k") {
      // hot-keyed events copy, inflated ×20: ~80% of rows land on key 0
      val hot = Tables.load(spark, benchDir, "events")
        .select(col("event_id"), col("value"))
        .withColumn("m", explode(expr("sequence(1, 20)")))
        .withColumn("k",
          when((col("event_id") + col("m")) % 10 < 8, lit(0L))
            .otherwise((col("event_id") + col("m")) % 1000))
      val dim = (0L until 1000L).map(k => (k, s"grp$k")).toDF("k", "grp")
      val joined = hot.join(dim, Seq("k"))
        .groupBy(col("grp")).agg(sum(col("value")).as("v"))
      joined.collect() // AQE re-plans during execution
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"no skew split in the final adaptive plan:\n$finalPlan")
    }
  }
}
