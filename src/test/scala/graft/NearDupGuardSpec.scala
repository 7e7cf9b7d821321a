package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.streaming.NearDupStream

/** Guards on the near-dup ingestion gate's edge contracts:
  * idempotent emission when a doc_id sits in BOTH the stored index and
  * the current batch, negative-doc_id verification (floorMod vs signed
  * %), the state-layout version marker, and the compaction cadence /
  * bounded-read-amplification invariant.
  */
class NearDupGuardSpec extends SparkSpecBase {

  private val baseText =
    "the quick brown fox jumps over the lazy dog near the quiet river bank today"

  private def batchDf(rows: Seq[(Long, String)]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, t) => Row(id, t, "s") }),
      NearDupStream.docSchema)

  test("a doc_id in both the stored index and the current batch emits each flagged pair exactly once") {
    val root = Files.createTempDirectory("graft-nd-dup").toString
    val state = s"$root/state"; val out = s"$root/out"
    NearDupStream.applyBatch(spark, state, out,
      batchDf(Seq(1L -> baseText,
        2L -> ("completely different content about database engines and " +
          "query planners in distributed systems running on clusters"))),
      batchId = 0L)
    // batch 1 re-delivers doc 1 (same id+text: an upstream anomaly, not
    // a foreachBatch retry) alongside a fresh near-dup of it
    NearDupStream.applyBatch(spark, state, out,
      batchDf(Seq(1L -> baseText, 5L -> (baseText + " again"))),
      batchId = 1L)
    val rows = spark.read.parquet(out)
      .select("new_id", "dup_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows.count(_ == ((5L, 1L))) == 1,
      s"pair (5,1) must be emitted exactly once, got: $rows")
    // and per-(batch,pair) uniqueness holds across the whole emission log
    val dupPairs = spark.read.parquet(out)
      .groupBy("batch_id", "new_id", "dup_id").count()
      .filter(col("count") > 1).count()
    assert(dupPairs == 0, "duplicate emission rows within a batch")
  }

  test("negative doc_ids are still verified (write-side pmod vs read-side floorMod)") {
    val root = Files.createTempDirectory("graft-nd-neg").toString
    val state = s"$root/state"; val out = s"$root/out"
    NearDupStream.applyBatch(spark, state, out,
      batchDf(Seq(-7L -> baseText)), batchId = 0L)
    NearDupStream.applyBatch(spark, state, out,
      batchDf(Seq(5L -> (baseText + " again"))), batchId = 1L)
    val rows = spark.read.parquet(out)
      .select("new_id", "dup_id", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.exists(r => r._1 == 5L && r._2 == -7L && r._3 >= 0.5),
      s"near-dup of a negative-id doc must be flagged, got: ${rows.toSeq}")
  }

  test("layout marker: stamped on first touch, mismatching or missing marker on existing state fails fast") {
    val root = Files.createTempDirectory("graft-nd-layout").toString
    val state = s"$root/state"; val out = s"$root/out"
    NearDupStream.applyBatch(spark, state, out,
      batchDf(Seq(1L -> baseText)), batchId = 0L)
    val marker = java.nio.file.Paths.get(state, "_LAYOUT")
    assert(Files.exists(marker), "first touch must stamp the layout marker")
    assert(new String(Files.readAllBytes(marker), "UTF-8").trim ==
      NearDupStream.layoutVersion)
    // tamper: an index written by a different layout generation (drop
    // the local-fs checksum shadow too, or the open fails on CRC
    // before the version check can run)
    Files.write(marker, "graft-neardup-v1 buckets=16".getBytes("UTF-8"))
    Files.deleteIfExists(java.nio.file.Paths.get(state, "._LAYOUT.crc"))
    val e = intercept[IllegalArgumentException] {
      NearDupStream.applyBatch(spark, state, out,
        batchDf(Seq(9L -> baseText)), batchId = 1L)
    }
    assert(e.getMessage.contains("layout"))
    // missing marker but pre-existing state dirs: also refuse
    Files.delete(marker)
    val e2 = intercept[IllegalArgumentException] {
      NearDupStream.keepDecisions(spark, state, out)
    }
    assert(e2.getMessage.contains("_LAYOUT"))
  }

  test("compaction cadence: generations accrete per batch, compactIfDue holds read amplification <= G") {
    val root = Files.createTempDirectory("graft-nd-cadence").toString
    val state = s"$root/state"; val out = s"$root/out"
    val G = 3
    // identical text every batch -> every batch lands in the SAME 4
    // (band_idx, bpfx) bucket dirs, the worst-case generation pile-up
    var maxSeen = 0
    for (i <- 0 until 2 * G) {
      NearDupStream.applyBatch(spark, state, out,
        batchDf(Seq((100L + i) -> baseText)), batchId = i.toLong)
      maxSeen = math.max(maxSeen, NearDupStream.maxGenerations(spark, state))
      NearDupStream.compactIfDue(spark, state,
        targetFileBytes = 1L << 20, maxGen = G)
      // the bounded-read invariant: under the cadence, no candidate
      // read ever opens more than G generations per partition dir
      assert(NearDupStream.maxGenerations(spark, state) < G,
        "cadence failed to hold generations below G")
    }
    assert(maxSeen >= G, "test never reached the compaction threshold")
    // content survives the cadence: every doc indexed once, flags intact
    assert(spark.read.parquet(s"$state/docs")
      .select("doc_id").distinct().count() == 2L * G)
    val verdicts = NearDupStream.keepDecisions(spark, state, out)
      .filter(col("verdict") === "drop").count()
    assert(verdicts == 2L * G - 1,
      "all later identical docs must drop toward doc 100")
  }
}
