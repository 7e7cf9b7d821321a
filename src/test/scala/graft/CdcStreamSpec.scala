package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.CdcStream

class CdcStreamSpec extends SparkSpecBase {

  private def write(src: String,
      rows: Seq[(Long, Long, Long, String, Double)]): Unit = {
    import spark.implicits._
    rows.toDF("user_id", "tus", "event_id", "op", "value")
      .coalesce(1).write.mode("append").parquet(src)
  }

  test("cdc stream: upserts, updates, and deletes fold across micro-batches; late ops lose") {
    val root = Files.createTempDirectory("graft-cdc").toString
    val src = s"$root/src"; val state = s"$root/state"; val ckp = s"$root/ckp"
    Files.createDirectories(java.nio.file.Paths.get(src))

    // batch 1: three inserts
    write(src, Seq(
      (1L, 100L, 10L, "upsert", 1.0),
      (2L, 100L, 11L, "upsert", 2.0),
      (3L, 100L, 12L, "upsert", 3.0)))
    CdcStream.start(spark, src, state, ckp).awaitTermination()
    val s1 = CdcStream.readState(spark, state)
    assert(s1.count() == 3, s"batch 1 should leave 3 keys, got ${s1.count()}")

    // batch 2: update key 2, delete key 3, insert key 4 (different
    // bucket spread), and a LATE op for key 1 that must lose
    write(src, Seq(
      (2L, 200L, 20L, "upsert", 2.5),
      (3L, 200L, 21L, "delete", 0.0),
      (4L, 200L, 22L, "upsert", 4.0),
      (1L, 50L, 23L, "upsert", 99.0))) // older tus than state's 100
    CdcStream.start(spark, src, state, ckp).awaitTermination()

    val s2 = CdcStream.readState(spark, state).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(s2.keySet == Set(1L, 2L, 4L),
      s"final keys wrong: ${s2.keySet} (3 deleted, 4 inserted)")
    assert(s2(1L) == ((100L, 1.0)), s"late op regressed key 1: ${s2(1L)}")
    assert(s2(2L) == ((200L, 2.5)), s"update lost on key 2: ${s2(2L)}")
    assert(s2(4L) == ((200L, 4.0)), s"insert lost on key 4: ${s2(4L)}")

    // the delete is retained as a tombstone in the raw state table
    val raw3 = spark.read.parquet(state)
      .filter(col("user_id") === 3L).collect()
    assert(raw3.length == 1 && raw3.head.getAs[String]("op") == "delete",
      "applied delete must persist as a tombstone row")

    // restart with the same checkpoint and no new files: state unchanged
    CdcStream.start(spark, src, state, ckp).awaitTermination()
    assert(CdcStream.readState(spark, state).count() == 3,
      "an empty restart changed the state table")

    // deleted key can come back in a later batch with a NEWER op
    write(src, Seq((3L, 300L, 30L, "upsert", 3.5)))
    CdcStream.start(spark, src, state, ckp).awaitTermination()
    val s4 = CdcStream.readState(spark, state)
      .filter(col("user_id") === 3L).collect()
    assert(s4.length == 1 && s4.head.getDouble(3) == 3.5,
      "re-insert after delete did not revive the key")
  }

  test("cdc stream: an out-of-order upsert OLDER than an applied delete cannot resurrect the key") {
    val root = Files.createTempDirectory("graft-cdc-oo").toString
    val src = s"$root/src"; val state = s"$root/state"; val ckp = s"$root/ckp"
    Files.createDirectories(java.nio.file.Paths.get(src))

    // batch 1: insert then (logically later) delete key 5
    write(src, Seq(
      (5L, 100L, 10L, "upsert", 5.0),
      (5L, 300L, 11L, "delete", 0.0)))
    CdcStream.start(spark, src, state, ckp).awaitTermination()
    assert(CdcStream.readState(spark, state).count() == 0,
      "delete in batch 1 did not land")

    // batch 2: an op that is OLDER than the applied delete arrives late
    // — without a tombstone this would resurrect the key
    write(src, Seq((5L, 200L, 12L, "upsert", 55.0)))
    CdcStream.start(spark, src, state, ckp).awaitTermination()
    assert(CdcStream.readState(spark, state).count() == 0,
      "out-of-order upsert resurrected a deleted key across batches")

    // matches the batch operator's global last-op-wins replay semantics
    val tombstone = spark.read.parquet(state).collect()
    assert(tombstone.length == 1 &&
      tombstone.head.getAs[String]("op") == "delete" &&
      tombstone.head.getAs[Long]("tus") == 300L,
      "tombstone must remain the per-key winner")

    // GC below the lateness horizon drops the tombstone, keeps live rows
    write(src, Seq((6L, 400L, 13L, "upsert", 6.0)))
    CdcStream.start(spark, src, state, ckp).awaitTermination()
    CdcStream.gcTombstones(spark, state, horizonUs = 350L)
    val afterGc = spark.read.schema(CdcStream.stateSchema)
      .parquet(state).collect()
    assert(afterGc.length == 1 && afterGc.head.getAs[Long]("user_id") == 6L,
      s"GC should keep only the live row, got ${afterGc.toSeq}")
  }

  test("cdc stream: GC that reclaims EVERY row leaves a readable empty state and the stream keeps working") {
    val root = Files.createTempDirectory("graft-cdc-gcall").toString
    val src = s"$root/src"; val state = s"$root/state"; val ckp = s"$root/ckp"
    Files.createDirectories(java.nio.file.Paths.get(src))

    // one key, deleted: the state table holds only a tombstone
    write(src, Seq(
      (7L, 100L, 10L, "upsert", 7.0),
      (7L, 200L, 11L, "delete", 0.0)))
    CdcStream.start(spark, src, state, ckp).awaitTermination()

    // GC with a horizon above every op reclaims everything — the state
    // directory ends with ZERO data files and must still read cleanly
    CdcStream.gcTombstones(spark, state, horizonUs = 1000L)
    assert(CdcStream.readState(spark, state).count() == 0,
      "empty state table must read as zero rows, not fail")

    // and the next micro-batch folds into the emptied state normally
    write(src, Seq((8L, 300L, 12L, "upsert", 8.0)))
    CdcStream.start(spark, src, state, ckp).awaitTermination()
    val s = CdcStream.readState(spark, state).collect()
    assert(s.length == 1 && s.head.getLong(0) == 8L,
      s"post-GC batch did not land: ${s.toSeq}")
  }
}
