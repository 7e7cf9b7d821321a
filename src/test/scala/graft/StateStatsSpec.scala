package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.streaming.{IndexStream, LsmIndex}

/** The operational DESCRIBE face (LsmIndex.stats + per-gate
  * stateStats): FS-metadata + marker truth an operator reads before
  * compaction/redomain/migration decisions — generation counts track
  * folds and deletes, corpus rows track the markers, the ledger and
  * pins sections mirror OpLog/Pins, and compaction collapses what it
  * merged. No data files are read (the whole report is listings).
  */
class StateStatsSpec extends SparkSpecBase {

  private def docs(rows: Seq[(Long, String)]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, t) =>
        Row(id, t, "s") }),
      IndexStream.docSchema)

  private def statMap(df: DataFrame): Map[(String, String), Long] =
    df.filter(col("value").isNotNull).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  test("stats track folds, deletes, pins, and compaction") {
    val root = Files.createTempDirectory("graft-stats").toString
    val state = s"$root/state"
    val fixture = (1L to 20L).map(i =>
      (i, (1L to 6L).map(j => s"w${(i * 7 + j * 3) % 17}").mkString(" ")))
    val (h0, h1) = fixture.partition(_._1 % 2 == 0)
    IndexStream.applyBatch(spark, state, docs(h0), 0L)
    IndexStream.applyBatch(spark, state, docs(h1), 1L)

    val s1 = statMap(IndexStream.stateStats(spark, state))
    assert(s1(("sub:postings", "generations")) == 2L)
    assert(s1(("sub:docs", "generations")) == 2L)
    assert(s1(("sub:dfs", "generations")) == 2L)
    assert(s1(("corpus", "n_docs")) == 20L)
    assert(s1(("corpus", "tot_dl")) == 120L)
    assert(s1(("ledger", "entries")) == 2L)
    assert(s1(("ledger", "compactions")) == 0L)
    assert(s1(("pins", "registered")) == 0L)
    assert(s1(("sub:postings", "bytes")) > 0L)
    // the layout row rides text, not value
    val lay = IndexStream.stateStats(spark, state)
      .filter(col("section") === "layout").collect()
    assert(lay.length == 1 && lay.head.getString(3).contains("graft-ridx"))

    // delete: tombs + negative-stat generations appear, survivors drop
    import spark.implicits._
    IndexStream.deleteDocs(spark, state,
      Seq(2L, 4L).toDF("doc_id"), deleteId = 0L)
    val s2 = statMap(IndexStream.stateStats(spark, state))
    assert(s2(("sub:tombs", "generations")) == 1L)
    assert(s2(("corpus", "n_docs")) == 18L)
    assert(s2(("ledger", "entries")) == 3L)

    // a registered pin surfaces; compaction (blocked) records nothing
    LsmIndex.Pins(state).register(spark, "run1", 2L)
    val s3 = statMap(IndexStream.stateStats(spark, state))
    assert(s3(("pins", "registered")) == 1L)
    assert(s3(("pins", "min_seq")) == 2L)
    IndexStream.compactState(spark, state, targetFileBytes = 1L << 20)
    assert(statMap(IndexStream.stateStats(spark, state))(
      ("ledger", "compactions")) == 0L, "pinned: no barrier recorded")

    // release -> compaction merges: generations collapse, tombs gone
    LsmIndex.Pins(state).release(spark, "run1")
    IndexStream.compactState(spark, state, targetFileBytes = 1L << 20)
    val s4 = statMap(IndexStream.stateStats(spark, state))
    assert(s4(("sub:postings", "generations")) == 1L)
    assert(s4(("sub:tombs", "generations")) == 0L,
      "physical reclaim drops the tombs sub-table")
    assert(s4(("ledger", "compactions")) == 1L)
    assert(s4(("corpus", "n_docs")) == 18L,
      "corpus stats unchanged by compaction")
    // the maintenance section (round 13): no cron cycle has run on
    // this state, then one does and DESCRIBE reflects it
    assert(s4(("maintenance", "cycles")) == 0L)
    IndexStream.maintainIfDue(spark, state)
    val s5 = statMap(IndexStream.stateStats(spark, state))
    assert(s5(("maintenance", "cycles")) == 1L)
    assert(s5.contains(("maintenance", "last_acted")))
    spark.catalog.clearCache()
  }

  test("pipeline fan-out reports all three gates") {
    val root = Files.createTempDirectory("graft-stats-pipe").toString
    import spark.implicits._
    val batch = (1L to 12L).map { i =>
      (i, s"alpha beta w$i gamma delta",
        Array.tabulate(8)(j => (i * 13 + j * 7 % 11).toDouble), "s")
    }.toDF("doc_id", "text", "embedding", "source")
    graft.streaming.PipelineStream.applyBatch(spark, s"$root/pipe",
      batch, 0L)
    val st = graft.streaming.PipelineStream.stateStats(spark, s"$root/pipe")
    val gates = st.select("gate").distinct().collect()
      .map(_.getString(0)).toSet
    assert(gates == Set("txt", "vec", "ridx", "pipeline"))
    val m = st.filter(col("gate") === "ridx").collect()
      .filter(_.get(2) != null)
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m(("corpus", "n_docs")) > 0L)
    // pipeline-grain maintenance rollup: no cycle has run yet, so
    // zero gates report and none acted
    def roll(): Map[String, Long] =
      graft.streaming.PipelineStream.stateStats(spark, s"$root/pipe")
        .filter(col("gate") === "pipeline").collect()
        .map(r => r.getString(1) -> r.getLong(2)).toMap
    val r0 = roll()
    assert(r0("gates_reporting") == 0L &&
      r0("gates_acted_last_cycle") == 0L, s"pre-maintenance: $r0")
    // after one maintenance pass every gate's maintlog has a cycle,
    // and the rollup counts reporting gates and the acted subset
    graft.streaming.PipelineStream.maintainIfDue(spark, s"$root/pipe")
    val r1 = roll()
    assert(r1("gates_reporting") == 3L, s"post-maintenance: $r1")
    assert(r1("gates_acted_last_cycle") <= 3L, s"post-maintenance: $r1")
    spark.catalog.clearCache()
  }
}
