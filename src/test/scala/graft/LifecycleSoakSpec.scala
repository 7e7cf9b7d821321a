package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.streaming.IndexStream

/** Whole-lifecycle soak for the retrieval index (round 10): one state
  * lives through interleaved folds and deletes, gets pinned by
  * snapshots along the way, then compacted (physical reclaim +
  * marker consolidation + epoch barrier) and finally layout-migrated
  * — with the invariants checked at every step:
  *  - a snapshot answers EXACTLY what the live index answered at its
  *    pin, forever (through later folds, deletes, compaction,
  *    migration of the source);
  *  - compaction and migration never change live answers;
  *  - deletes stay exact across the whole history (the live index
  *    always equals a fresh index of the current survivor set).
  * The single-operator pieces are pinned in DeleteSpec/SnapshotSpec/
  * IndexStreamSpec; this spec exists for their INTERACTIONS.
  */
class LifecycleSoakSpec extends SparkSpecBase {

  private def docsOf(ids: Seq[Long]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(ids.map { id =>
        val rnd = new scala.util.Random(id)
        Row(id, Seq.fill(10)(s"w${rnd.nextInt(50)}").mkString(" "), "s")
      }),
      IndexStream.docSchema)

  private def queries: DataFrame = {
    import spark.implicits._
    Seq(1L, 3L, 105L, 212L).map { id =>
      val rnd = new scala.util.Random(id)
      (900L + id, Seq.fill(10)(s"w${rnd.nextInt(50)}").mkString(" "))
    }.toDF("query_id", "text")
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("folds, deletes, snapshots, compaction, and migration compose: pins stay exact, live always equals survivors") {
    val root = Files.createTempDirectory("graft-soak").toString
    val state = s"$root/state"
    import spark.implicits._

    var indexed = Set.empty[Long]
    var deleted = Set.empty[Long]
    var nextSeq = 0L
    val pins = scala.collection.mutable.ArrayBuffer
      .empty[(String, Set[Seq[Any]])]

    for (r <- 0 until 6) {
      val ids = (r * 100L + 1L) to (r * 100L + 40L)
      IndexStream.applyBatch(spark, state, docsOf(ids), r.toLong)
      indexed ++= ids; nextSeq += 1
      if (r % 2 == 1) {
        val doomed = indexed.filter(i => i % 5 == 1 && i < r * 100L)
          .toSeq.sorted
        val n = IndexStream.deleteDocs(spark, state,
          doomed.toDF("doc_id"), deleteId = r.toLong)
        assert(n == (doomed.toSet -- deleted).size,
          s"round $r: deleted $n of expected")
        deleted ++= doomed; nextSeq += 1
      }
      if (r % 3 == 2) {
        val snap = s"$root/pin_r$r"
        IndexStream.snapshotTo(spark, state, snap, asOfSeq = nextSeq)
        pins += ((snap, rows(IndexStream.queryTopK(spark, state,
          queries))))
      }
      // the live index always equals a fresh survivors-only index
      val fresh = s"$root/fresh_r$r"
      IndexStream.applyBatch(spark, fresh,
        docsOf((indexed -- deleted).toSeq.sorted), 0L)
      assert(rows(IndexStream.queryTopK(spark, state, queries)) ==
        rows(IndexStream.queryTopK(spark, fresh, queries)),
        s"round $r: live diverged from the survivor set")
    }
    assert(pins.size == 2 && deleted.nonEmpty, "fixture shape")

    // every pin still answers its pinned value
    for ((snap, want) <- pins)
      assert(rows(IndexStream.queryTopK(spark, snap, queries)) == want,
        s"pin $snap drifted before maintenance")

    // compaction: physical reclaim + barrier; live unchanged, pins
    // (byte copies) untouched
    val live = rows(IndexStream.queryTopK(spark, state, queries))
    IndexStream.compactState(spark, state, 64L * 1024 * 1024)
    assert(rows(IndexStream.queryTopK(spark, state, queries)) == live,
      "compaction changed live answers")
    assert(spark.read.parquet(s"$state/postings")
      .filter(col("doc_id").isin(deleted.toSeq: _*)).count() == 0,
      "compaction must have reclaimed deleted postings")
    for ((snap, want) <- pins)
      assert(rows(IndexStream.queryTopK(spark, snap, queries)) == want,
        s"pin $snap drifted across source compaction")

    // migration: rebuild from raw; live unchanged, pins untouched
    val hfs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val out = hfs.create(
      new org.apache.hadoop.fs.Path(s"$state/_LAYOUT"), true)
    try out.write("graft-ridx-v3-soak-rebuild".getBytes("UTF-8"))
    finally out.close()
    assert(IndexStream.migrateState(spark, state), "rebuild must run")
    assert(rows(IndexStream.queryTopK(spark, state, queries)) == live,
      "migration changed live answers")
    for ((snap, want) <- pins)
      assert(rows(IndexStream.queryTopK(spark, snap, queries)) == want,
        s"pin $snap drifted across source migration")
  }
}
