package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.streaming.{IndexStream, LsmIndex}

/** Snapshot / as-of reads over the retrieval index (round 10): the
  * operation ledger (LsmIndex.OpLog) totally orders folds, deletes,
  * and compaction barriers; `IndexStream.snapshotTo` materializes a
  * self-contained state root holding exactly the generations of
  * operations at or before a ledger seq. Pins: as-of answers are
  * bit-identical to a fresh index built from the same operation
  * prefix (including "before the delete" still answering with the
  * later-deleted doc), snapshot isolation from later source mutations,
  * the compaction barrier fail-fast, and ledger idempotence under
  * re-delivery.
  */
class SnapshotSpec extends SparkSpecBase {

  private def docs(rows: Seq[(Long, String)]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, t) =>
        Row(id, t, "s") }),
      IndexStream.docSchema)

  private def fixture: Seq[(Long, String)] = (1L to 30L).map { i =>
    val rnd = new scala.util.Random(i)
    (i, Seq.fill(12)(s"w${rnd.nextInt(60)}").mkString(" "))
  }

  private def queries: DataFrame = {
    import spark.implicits._
    fixture.take(4).map { case (i, t) => (900L + i, t) }
      .toDF("query_id", "text")
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("as-of answers equal a fresh index built from the operation prefix; a pre-delete snapshot still answers with the deleted doc") {
    val root = Files.createTempDirectory("graft-snap").toString
    val state = s"$root/state"
    val all = fixture
    val (half0, half1) = all.partition(_._1 % 2 == 0)
    IndexStream.applyBatch(spark, state, docs(half0), 0L) // seq 1
    IndexStream.applyBatch(spark, state, docs(half1), 1L) // seq 2
    import spark.implicits._
    val doomed = all.map(_._1).filter(_ % 7 == 2)
    IndexStream.deleteDocs(spark, state, doomed.toDF("doc_id"),
      deleteId = 0L) // seq 3

    // seq 1: first fold only
    val s1 = s"$root/s1"
    IndexStream.snapshotTo(spark, state, s1, asOfSeq = 1L)
    val fresh1 = s"$root/f1"
    IndexStream.applyBatch(spark, fresh1, docs(half0), 0L)
    assert(rows(IndexStream.queryTopK(spark, s1, queries)) ==
      rows(IndexStream.queryTopK(spark, fresh1, queries)),
      "seq-1 snapshot must equal a fresh first-fold index")

    // seq 2: both folds, BEFORE the delete — the later-deleted docs
    // still answer
    val s2 = s"$root/s2"
    IndexStream.snapshotTo(spark, state, s2, asOfSeq = 2L)
    val fresh2 = s"$root/f2"
    IndexStream.applyBatch(spark, fresh2, docs(all), 0L)
    val got2 = rows(IndexStream.queryTopK(spark, s2, queries))
    assert(got2 == rows(IndexStream.queryTopK(spark, fresh2, queries)),
      "seq-2 snapshot must equal a fresh full-corpus index")
    assert(got2 != rows(IndexStream.queryTopK(spark, state, queries)),
      "fixture: the delete must visibly change live answers")

    // seq 3: after the delete — equals the live state
    val s3 = s"$root/s3"
    IndexStream.snapshotTo(spark, state, s3, asOfSeq = 3L)
    assert(rows(IndexStream.queryTopK(spark, s3, queries)) ==
      rows(IndexStream.queryTopK(spark, state, queries)),
      "seq-3 snapshot must equal the live post-delete state")
  }

  test("PipelineStream.snapshotTo pins all three states and the emission logs at a batch; answers equal a fresh pipeline of that prefix") {
    val rnd = new scala.util.Random(13)
    def vec(): Array[Double] = Array.fill(32)(rnd.nextGaussian())
    val root = Files.createTempDirectory("graft-snap-pipe").toString
    def prow(id: Long, t: String, v: Array[Double]) =
      Row(id, t, v.toSeq, "s")
    val b0 = Seq(
      prow(1L, "alpha beta gamma delta epsilon", vec()),
      prow(2L, "one two three four five six", vec()),
      prow(3L, "alpha beta gamma delta epsilon", vec())) // text dup of 1
    val b1 = Seq(
      prow(10L, "fresh words arrive later tonight", vec()),
      prow(11L, "entirely different second batch text", vec()))
    def pb(rows0: Seq[Row]) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows0),
      graft.streaming.PipelineStream.rowSchema)
    val P = graft.streaming.PipelineStream
    P.applyBatch(spark, root, pb(b0), 0L)
    P.applyBatch(spark, root, pb(b1), 1L)
    import spark.implicits._
    P.delete(spark, root, Seq(2L).toDF("doc_id"), deleteId = 0L)

    val qs = spark.createDataFrame(
      spark.sparkContext.parallelize((b0 ++ b1).map(r =>
        Row(900L + r.getLong(0), r.getString(1), r.getSeq[Double](2)))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("query_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)))))
    def faces(r: String): Seq[Set[Seq[Any]]] = Seq(
      rows(P.queryTopK(spark, r, qs.select(col("query_id"), col("text")))),
      rows(P.hybridTopK(spark, r, qs)),
      rows(P.verdicts(spark, r)))

    // pin at batch 0: equals a fresh pipeline fed batch 0 only
    val s0 = s"$root/snap0"
    P.snapshotTo(spark, root, s0, batchId = 0L)
    val f0 = s"$root/fresh0"
    P.applyBatch(spark, f0, pb(b0), 0L)
    assert(faces(s0) == faces(f0),
      "batch-0 pipeline snapshot must equal a fresh batch-0 pipeline")

    // pin at batch 1: both batches, the later delete invisible
    val s1 = s"$root/snap1"
    P.snapshotTo(spark, root, s1, batchId = 1L)
    val f1 = s"$root/fresh1"
    P.applyBatch(spark, f1, pb(b0), 0L)
    P.applyBatch(spark, f1, pb(b1), 1L)
    assert(faces(s1) == faces(f1),
      "batch-1 pipeline snapshot must equal the pre-delete pipeline")
    assert(rows(P.queryTopK(spark, s1,
        qs.select(col("query_id"), col("text"))))
      .exists(_(2) == 2L),
      "the later-deleted doc must still answer in the pre-delete pin")
  }

  test("snapshot isolation: later folds and deletes on the source leave an existing snapshot's answers unchanged") {
    val root = Files.createTempDirectory("graft-snap-iso").toString
    val state = s"$root/state"
    val all = fixture
    IndexStream.applyBatch(spark, state, docs(all.take(15)), 0L)
    val snap = s"$root/snap"
    IndexStream.snapshotTo(spark, state, snap, asOfSeq = 1L)
    val want = rows(IndexStream.queryTopK(spark, snap, queries))
    assert(want.nonEmpty)

    IndexStream.applyBatch(spark, state, docs(all.drop(15)), 1L)
    import spark.implicits._
    IndexStream.deleteDocs(spark, state, Seq(2L).toDF("doc_id"), 0L)
    assert(rows(IndexStream.queryTopK(spark, snap, queries)) == want,
      "later source mutations leaked into the snapshot")
  }

  test("compaction is an epoch barrier: snapshots before it fail fast, at/after it work; ledger seqs are re-delivery-stable") {
    val root = Files.createTempDirectory("graft-snap-bar").toString
    val state = s"$root/state"
    val all = fixture
    IndexStream.applyBatch(spark, state, docs(all.take(15)), 0L) // seq 1
    IndexStream.applyBatch(spark, state, docs(all.drop(15)), 1L) // seq 2
    // re-delivery keeps the original seq
    IndexStream.applyBatch(spark, state, docs(all.take(15)), 0L)
    assert(LsmIndex.OpLog(state).entries(spark)
      .map(e => (e._1, e._2, e._3)) ==
      Seq((1L, "fold", 0L), (2L, "fold", 1L)),
      "re-delivered fold must keep its ledger seq")

    val live = rows(IndexStream.queryTopK(spark, state, queries))
    IndexStream.compactState(spark, state, 64L * 1024 * 1024) // seq 3
    val err = intercept[IllegalArgumentException] {
      IndexStream.snapshotTo(spark, state, s"$root/pre", asOfSeq = 2L)
    }
    assert(err.getMessage.contains("barrier"),
      s"pre-barrier snapshot must fail fast: ${err.getMessage}")

    val post = s"$root/post"
    IndexStream.snapshotTo(spark, state, post, asOfSeq = 3L)
    assert(rows(IndexStream.queryTopK(spark, post, queries)) == live,
      "at-barrier snapshot must answer as the compacted state")
  }
}
