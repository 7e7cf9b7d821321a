package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for plan-hygiene review —
  * PushedFilters on scans, pruned ReadSchema, broadcast joins on dims,
  * WholeStageCodegen span coverage.
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("sales_rollup", "events_filtered", "hierarchy_join",
        "cosine_pairs", "minhash_lsh")
    val builder = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // same engine-level session confs as the bench (round 15), so a
    // committed plan dump reflects the plans the bench actually runs
    operators.BenchData.adaptiveConf.foreach { case (k, v) =>
      builder.config(k, v)
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      // per-query cache lifecycle like Bench/Verify: without this, a
      // later query's dump renders InMemoryRelations registered by an
      // EARLIER query's persistOnce calls — not the plan it gets when
      // run alone (round 16)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
