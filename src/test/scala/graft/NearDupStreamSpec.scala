package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.NearDupStream

class NearDupStreamSpec extends SparkSpecBase {

  private val baseText =
    "the quick brown fox jumps over the lazy dog near the quiet river bank today"

  private def write(src: String, rows: Seq[(Long, String, String)]): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "source")
      .coalesce(1).write.mode("append").parquet(src)
  }

  test("near-dup ingestion gate: cross-batch and within-batch dups flagged once, verified, exactly-once across restarts") {
    val root = Files.createTempDirectory("graft-neardup").toString
    val src = s"$root/src"; val state = s"$root/state"
    val out = s"$root/out"; val ckp = s"$root/ckp"
    Files.createDirectories(java.nio.file.Paths.get(src))

    // batch 1: two distinct docs + a within-batch near-identical pair
    // (3L is 1L plus a trailing word — high Jaccard on 3-gram shingles)
    write(src, Seq(
      (1L, baseText, "s"),
      (2L, "completely different content about database engines and " +
        "query planners in distributed systems running on clusters", "s"),
      (3L, baseText + " tonight", "s")))
    NearDupStream.start(spark, src, state, out, ckp).awaitTermination()
    val after1 = spark.read.parquet(out)
      .select("new_id", "dup_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after1 == Set((3L, 1L)),
      s"batch 1 should flag exactly the within-batch pair (3,1): $after1")

    // batch 2: a near-dup of doc 1 (cross-batch, against the INDEX —
    // doc 1's text is never re-delivered) + an unrelated doc
    write(src, Seq(
      (10L, baseText + " again", "s"),
      (11L, "unrelated words entirely fresh material nothing shared " +
        "with any earlier document in this stream at all honestly", "s")))
    NearDupStream.start(spark, src, state, out, ckp).awaitTermination()
    val after2 = spark.read.parquet(out)
      .select("new_id", "dup_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 10 collides with both 1 and 3 (all share the base text's shingles)
    assert(after2.contains((10L, 1L)) && after2.contains((10L, 3L)),
      s"cross-batch near-dups of the indexed docs not flagged: $after2")
    assert(!after2.exists(p => p._1 == 11L || p._2 == 11L),
      s"unrelated doc flagged: $after2")
    assert(!after2.exists(p => p._1 == 2L || p._2 == 2L),
      s"distinct doc flagged: $after2")
    // every emitted pair is verified: jaccard present and >= the floor
    assert(spark.read.parquet(out)
      .filter(col("jaccard") < 0.5 || col("jaccard").isNull)
      .count() == 0, "an unverified pair was emitted")

    // restart with the same checkpoint and no new data: nothing re-emitted
    val n2 = spark.read.parquet(out).count()
    NearDupStream.start(spark, src, state, out, ckp).awaitTermination()
    assert(spark.read.parquet(out).count() == n2,
      "an empty restart re-emitted pairs")

    // manual re-delivery of a processed batch (same batchId) is
    // idempotent end-to-end: same emissions, same index
    val batch = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(10L, baseText + " again", "s"),
        org.apache.spark.sql.Row(11L, "unrelated words entirely fresh " +
          "material nothing shared with any earlier document in this " +
          "stream at all honestly", "s"))), NearDupStream.docSchema)
    val bucketsBefore = spark.read.parquet(s"$state/buckets").count()
    NearDupStream.applyBatch(spark, state, out, batch, batchId = 1L)
    assert(spark.read.parquet(out)
      .select("new_id", "dup_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == after2,
      "re-delivered batch changed the emitted pair set")
    assert(spark.read.parquet(s"$state/buckets").count() == bucketsBefore,
      "re-delivered batch grew the bucket index")

    // the index holds one docs row per doc and 4 band rows per doc
    assert(spark.read.parquet(s"$state/docs")
      .select("doc_id").distinct().count() == 5)
    assert(spark.read.parquet(s"$state/buckets").count() == 5 * 4)

    // the keep/drop policy view a training-data writer consumes:
    // near-dups drop and point at their smallest representative
    val verdicts = NearDupStream.keepDecisions(spark, state, out)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(verdicts(1L) == (("keep", -1L)) &&
      verdicts(2L) == (("keep", -1L)) && verdicts(11L) == (("keep", -1L)),
      s"originals must keep: $verdicts")
    assert(verdicts(3L) == (("drop", 1L)) && verdicts(10L) == (("drop", 1L)),
      s"near-dups must drop toward the smallest representative: $verdicts")
    assert(verdicts.size == 5, s"one verdict per indexed doc: $verdicts")
  }

  test("keepDecisions resolves kept_id transitively to a keep-verdict representative") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-neardup-chain").toString
    val state = s"$root/state"; val out = s"$root/out"
    // synthetic index + emission log (keepDecisions reads only these):
    // chain 3→2→1 where 3 was never flagged against 1 (its Jaccard to
    // the chain head fell below the floor), plus a diamond 5→{2,4}
    // whose min partner 2 is itself dropped, and an untouched doc 9
    Seq(1L, 2L, 3L, 4L, 5L, 9L)
      .map(id => (id, s"t$id", 1L, id % 256, 0L))
      .toDF("doc_id", "lt", "n_sh", "dbucket", "ingest")
      .write.partitionBy("dbucket", "ingest").parquet(s"$state/docs")
    // a hand-authored index must carry the layout marker (the version
    // fail-fast refuses unmarked pre-existing state)
    Files.write(java.nio.file.Paths.get(state, "_LAYOUT"),
      NearDupStream.layoutVersion.getBytes("UTF-8"))
    Seq((2L, 1L, 0.9, 0L), (3L, 2L, 0.8, 1L),
        (5L, 2L, 0.7, 2L), (5L, 4L, 0.9, 2L))
      .toDF("new_id", "dup_id", "jaccard", "batch_id")
      .write.partitionBy("batch_id").parquet(out)
    val v = NearDupStream.keepDecisions(spark, state, out)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(v(1L) == (("keep", -1L)) && v(9L) == (("keep", -1L)))
    assert(v(4L) == (("keep", -1L)), s"4 was only a dup TARGET: $v")
    assert(v(2L) == (("drop", 1L)))
    assert(v(3L) == (("drop", 1L)),
      s"3's immediate partner 2 is dropped — must resolve to 1: $v")
    assert(v(5L) == (("drop", 1L)),
      s"5's min partner 2 is dropped — must resolve through it to 1: $v")
  }

  test("state compaction: accreted ingest generations collapse per partition; index content and the stream survive") {
    val root = Files.createTempDirectory("graft-neardup-compact").toString
    val src = s"$root/src"; val state = s"$root/state"
    val out = s"$root/out"; val ckp = s"$root/ckp"
    Files.createDirectories(java.nio.file.Paths.get(src))

    // several batches hitting the SAME doc bucket (doc_ids ≡ 0 mod 256)
    // — each leaves its own ingest=<batchId> generation, so the
    // fragmentation the compactor exists for accretes NATURALLY
    for (k <- 0 until 3) {
      write(src, Seq((k * 256L,
        s"unique content batch $k " + ("filler word " * 10) + k, "s")))
      NearDupStream.start(spark, src, state, out, ckp).awaitTermination()
    }
    val dbDir = new org.apache.hadoop.fs.Path(s"$state/docs/dbucket=0")
    val fs = dbDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(dbDir).count(s => s.isDirectory &&
      s.getPath.getName.startsWith("ingest=")) == 3,
      "each batch must leave its own ingest generation")
    // content comparison on data + hash-partition columns: compaction
    // rewrites generations, so ingest is exactly what may change
    def docsContent(): Set[(Long, String, Long, Long)] =
      spark.read.parquet(s"$state/docs")
        .select(col("doc_id"), col("lt"), col("n_sh"),
          col("dbucket").cast("long")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
    val docsBefore = docsContent()
    val (parts, before, after) =
      NearDupStream.compactState(spark, state, targetFileBytes = 64L * 1024 * 1024)
    assert(parts >= 1, "no partition qualified for compaction — fixture broke")
    assert(after < before,
      s"compaction did not reduce file count ($before -> $after)")
    assert(fs.listStatus(dbDir).count(_.isDirectory) == 1,
      "generations under dbucket=0 must collapse to the single ingest=-1")
    assert(docsContent() == docsBefore,
      "compaction changed index content")

    // the stream keeps working against the compacted index: a near-dup
    // of the first doc is still caught
    write(src, Seq((999L,
      "unique content batch 0 " + ("filler word " * 10) + "0 extra", "s")))
    NearDupStream.start(spark, src, state, out, ckp).awaitTermination()
    val flagged = spark.read.parquet(out)
      .select("new_id", "dup_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(flagged.contains((999L, 0L)),
      s"post-compaction batch missed a near-dup of an indexed doc: $flagged")
  }
}
