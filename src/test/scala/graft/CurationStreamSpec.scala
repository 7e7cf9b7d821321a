package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.streaming.CurationStream

/** The incremental composed curation gate: one file-source stream
  * through BOTH near-dup gates with checkpointed micro-batches,
  * cross-batch catches in each modality, and the composed verdict view
  * over everything indexed so far.
  */
class CurationStreamSpec extends SparkSpecBase {

  private val t1 =
    "the quick brown fox jumps over the lazy dog near the quiet river bank today"
  private val t3 =
    "completely different content about database engines and query planners in distributed systems"
  private val t5 =
    "numbers and tables fill the ledger while auditors check the totals twice"

  private def unit(axis: Int): Seq[Double] =
    (0 until 64).map(i => if (i == axis) 1.0 else 0.0)

  private def writeBatch(dir: String,
      rows: Seq[(Long, String, Seq[Double])]): Unit =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (id, t, v) => Row(id, t, v, "s") }),
      CurationStream.rowSchema)
      .coalesce(1).write.mode("append").parquet(dir)

  test("streamed corpus: cross-batch text and vector catches compose into one verdict view") {
    val root = Files.createTempDirectory("graft-curstream").toString
    val src = s"$root/src"; val state = s"$root/state"
    val ckpt = s"$root/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(src))

    // batch 1: the base corpus
    writeBatch(src, Seq(
      (1L, t1, unit(0)),
      (3L, t3, unit(5))))
    CurationStream.start(spark, src, state, ckpt).awaitTermination()

    // batch 2, against the INDEXED state: a text near-dup of doc 1
    // (orthogonal embedding) and a paraphrase of doc 3 (same embedding,
    // disjoint wording)
    writeBatch(src, Seq(
      (10L, t1 + " again", unit(1)),
      (11L, t5, unit(5))))
    CurationStream.start(spark, src, state, ckpt).awaitTermination()

    val rows = CurationStream.verdicts(spark, state).collect()
      .map(r => r.getLong(0) -> ((r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        r.getInt(3), r.getInt(4)))).toMap
    assert(rows.keySet == Set(1L, 3L, 10L, 11L),
      s"one verdict per indexed doc: ${rows.keySet}")
    assert(rows(1L) == (("keep", -1L, 0, 0)))
    assert(rows(3L) == (("keep", -1L, 0, 0)))
    assert(rows(10L) == (("drop", 1L, 1, 0)),
      s"cross-batch text catch: ${rows(10L)}")
    assert(rows(11L) == (("drop", 3L, 0, 1)),
      s"cross-batch vector catch: ${rows(11L)}")

    // maintenance fans out to both gates without disturbing verdicts
    CurationStream.compactIfDue(spark, state, targetFileBytes = 1L << 20,
      maxGen = 1)
    val after = CurationStream.verdicts(spark, state).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after == Map(1L -> "keep", 3L -> "keep",
      10L -> "drop", 11L -> "drop"))
    spark.catalog.clearCache()
  }
}
