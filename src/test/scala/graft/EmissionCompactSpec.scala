package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.streaming.{CurationStream, LsmIndex, NearDupStream,
  PipelineStream}

/** Emission-log compaction (round 11): the gates' flagged-pair logs
  * accrete one `batch_id=` partition per micro-batch forever;
  * LsmIndex.compactEmissions consolidates them into a single deduped
  * `batch_id=-1` partition under the state compactor's crash contract.
  * Pinned here: the dir bound, bit-identical verdicts and keep
  * decisions across the consolidation, convergence under replay of a
  * consolidated-away batch, and the no-op guard.
  */
class EmissionCompactSpec extends SparkSpecBase {

  private val t1 =
    "the quick brown fox jumps over the lazy dog near the quiet river bank today"
  private val t3 =
    "completely different content about database engines and query planners in distributed systems"
  private val t4 =
    "weather stations on the high ridge report wind and snowfall every morning"
  private val t5 =
    "numbers and tables fill the ledger while auditors check the totals twice"

  private def unit(axis: Int): Seq[Double] =
    (0 until 64).map(i => if (i == axis) 1.0 else 0.0)

  private def batchOf(rows: Seq[(Long, String, Seq[Double])]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (id, t, v) => Row(id, t, v, "s") }),
      CurationStream.rowSchema)

  private def outDirs(dir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("batch_id=")).sorted
  }

  private def verdictMap(state: String) =
    CurationStream.verdicts(spark, state).collect()
      .map(r => r.getLong(0) -> ((r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        r.getInt(3), r.getInt(4)))).toMap

  test("consolidation bounds the log to one partition and leaves every verdict face bit-identical") {
    val root = Files.createTempDirectory("graft-emis").toString
    val state = s"$root/state"

    // base corpus, then three batches each carrying a text dup AND a
    // vector dup — only flagging batches write an emission partition,
    // so both logs accrete three batch dirs
    CurationStream.applyBatch(spark, state,
      batchOf(Seq((1L, t1, unit(0)), (3L, t3, unit(5)))), batchId = 0L)
    CurationStream.applyBatch(spark, state,
      batchOf(Seq((10L, t1 + " again", unit(1)), (11L, t5, unit(5)))),
      batchId = 1L)
    CurationStream.applyBatch(spark, state,
      batchOf(Seq((20L, t1 + " twice over", unit(2)), (21L, t4, unit(5)))),
      batchId = 2L)
    CurationStream.applyBatch(spark, state,
      batchOf(Seq(
        (30L, t1 + " thrice indeed", unit(3)),
        (31L, "totally fresh words about mountains and rivers flowing here",
          unit(5)))),
      batchId = 3L)

    val txtOut = s"$state/txt_out"; val vecOut = s"$state/vec_out"
    assert(outDirs(txtOut).size == 3 && outDirs(vecOut).size == 3,
      s"one partition per flagging batch before: " +
        s"${outDirs(txtOut)} / ${outDirs(vecOut)}")

    val before = verdictMap(state)
    assert(before(10L) == (("drop", 1L, 1, 0)) &&
      before(11L) == (("drop", 3L, 0, 1)) &&
      before(1L)._1 == "keep" && before(3L)._1 == "keep",
      s"fixture verdicts: $before")
    val keepBefore = NearDupStream.keepDecisions(spark, s"$state/txt_state",
      txtOut).collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq

    val (dirs, filesB, filesA) = LsmIndex.compactEmissions(spark, txtOut,
      CurationStream.txtOutSchema, targetFileBytes = 1L << 20)
    assert(dirs == 3 && filesA < filesB,
      s"txt log must consolidate: dirs=$dirs files $filesB -> $filesA")
    val (vdirs, _, _) = LsmIndex.compactEmissions(spark, vecOut,
      CurationStream.vecOutSchema, targetFileBytes = 1L << 20)
    assert(vdirs == 3, s"vec log must consolidate: $vdirs")

    assert(outDirs(txtOut) == Seq("batch_id=-1") &&
      outDirs(vecOut) == Seq("batch_id=-1"),
      s"one consolidated partition after: ${outDirs(txtOut)} / ${outDirs(vecOut)}")

    // every read face is bit-identical across the consolidation
    assert(verdictMap(state) == before,
      "consolidation changed the composed verdicts")
    val keepAfter = NearDupStream.keepDecisions(spark, s"$state/txt_state",
      txtOut).collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(keepAfter == keepBefore,
      s"consolidation changed keepDecisions: $keepAfter vs $keepBefore")

    // a consolidated log is below the dir bound -> second call no-ops
    assert(LsmIndex.compactEmissions(spark, txtOut,
      CurationStream.txtOutSchema, targetFileBytes = 1L << 20) == ((0, 0, 0)),
      "re-compacting a consolidated log must no-op")

    // REPLAY of a consolidated-away batch: the gate re-emits under its
    // own batch_id (duplicates against the consolidated rows) and every
    // read face still converges — the state compactor's
    // re-delivery-after-merge story, one level up
    CurationStream.applyBatch(spark, state,
      batchOf(Seq((10L, t1 + " again", unit(1)), (11L, t5, unit(5)))),
      batchId = 1L)
    assert(outDirs(txtOut).toSet == Set("batch_id=-1", "batch_id=1"),
      s"replay re-emits its own partition: ${outDirs(txtOut)}")
    assert(verdictMap(state) == before,
      "replay after consolidation changed the verdicts")
    // and the NEXT consolidation folds the duplicate bytes back in
    LsmIndex.compactEmissions(spark, txtOut, CurationStream.txtOutSchema,
      targetFileBytes = 1L << 20, minDirs = 2)
    assert(outDirs(txtOut) == Seq("batch_id=-1") &&
      verdictMap(state) == before,
      "re-consolidation after replay changed the verdicts")
  }

  test("pipeline maintenance consolidates the logs and hybrid retrieval answers unchanged") {
    val root = Files.createTempDirectory("graft-emis-pipe").toString
    val state = s"$root/state"
    PipelineStream.applyBatch(spark, state,
      batchOf(Seq((1L, t1, unit(0)), (3L, t3, unit(5)))), batchId = 0L)
    PipelineStream.applyBatch(spark, state,
      batchOf(Seq((10L, t1 + " again", unit(1)), (11L, t5, unit(5)))),
      batchId = 1L)
    PipelineStream.applyBatch(spark, state,
      batchOf(Seq((12L, t4, unit(9)))), batchId = 2L)

    import spark.implicits._
    val q = Seq((900L, "weather stations ledger", unit(9)))
      .toDF("query_id", "text", "embedding")
    val beforeRows = PipelineStream.hybridTopK(spark, state, q).collect().toSeq

    assert(PipelineStream.compactIfDue(spark, state,
      targetFileBytes = 1L << 20, maxGen = 1),
      "maintenance with fragmented logs must report work")
    assert(outDirs(s"$state/txt_out") == Seq("batch_id=-1") &&
      outDirs(s"$state/vec_out") == Seq("batch_id=-1"),
      "pipeline maintenance must consolidate both emission logs")

    val afterRows = PipelineStream.hybridTopK(spark, state, q).collect().toSeq
    assert(afterRows == beforeRows,
      s"hybrid retrieval changed across log consolidation: " +
        s"$afterRows vs $beforeRows")
  }
}
