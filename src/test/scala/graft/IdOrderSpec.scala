package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import graft.streaming.{NearDupStream, VecDupStream}

/** Enforcement of the gates' id-monotonicity ingest contract (round
  * 10, verdict item 3): keep-at-ingest finality — the soundness
  * premise of the composed pipeline — requires ids to increase with
  * arrival order. Both gates now fail fast when a genuinely-new batch
  * carries an id at or below the recorded high water, while replays
  * (a batch id at or below one already recorded — the streaming
  * runner's re-delivery path) stay exempt, and a layout migration
  * seeds the water from the migrated ids so pre-enforcement state is
  * covered from its first post-migration batch.
  */
class IdOrderSpec extends SparkSpecBase {

  private def docBatch(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def vec(): Array[Double] = {
    val r = new scala.util.Random(42)
    Array.fill(16)(r.nextGaussian())
  }

  private def vecBatch(rows: Seq[(Long, Array[Double])]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
  }

  test("text gate: an out-of-order batch fails fast with a clear error; replays and advancing batches pass") {
    val root = Files.createTempDirectory("graft-idorder-txt").toString
    val state = s"$root/state"; val out = s"$root/out"
    NearDupStream.applyBatch(spark, state, out,
      docBatch(Seq(10L -> "alpha beta gamma delta",
        20L -> "epsilon zeta eta theta")), 0L)
    // a NEW batch id regressing below the high water: clear error
    val e = intercept[IllegalArgumentException] {
      NearDupStream.applyBatch(spark, state, out,
        docBatch(Seq(5L -> "iota kappa lambda mu")), 1L)
    }
    assert(e.getMessage.contains("id-monotonicity"),
      s"error must name the violated contract: ${e.getMessage}")
    // the failed batch must not have been ingested
    assert(!spark.read.parquet(s"$state/docs")
      .select("doc_id").collect().map(_.getLong(0)).contains(5L))
    // replay of batch 0 (same ids, same batch id): exempt and idempotent
    NearDupStream.applyBatch(spark, state, out,
      docBatch(Seq(10L -> "alpha beta gamma delta",
        20L -> "epsilon zeta eta theta")), 0L)
    // a properly advancing batch passes
    NearDupStream.applyBatch(spark, state, out,
      docBatch(Seq(30L -> "nu xi omicron pi")), 2L)
    // RE-ARRIVAL of an already-indexed id in a new batch is tolerated
    // (at-least-once sources duplicate rows across batch boundaries;
    // the re-arrival's comparison set is its original one, so its
    // verdict cannot change) — but a new id below the water in the
    // same batch still fails
    NearDupStream.applyBatch(spark, state, out,
      docBatch(Seq(10L -> "alpha beta gamma delta",
        40L -> "rho sigma tau upsilon")), 3L)
    val e2 = intercept[IllegalArgumentException] {
      NearDupStream.applyBatch(spark, state, out,
        docBatch(Seq(10L -> "alpha beta gamma delta",
          15L -> "phi chi psi omega")), 4L)
    }
    assert(e2.getMessage.contains("id-monotonicity") &&
      e2.getMessage.contains("15"),
      s"the NEW sub-water id must be the one reported: ${e2.getMessage}")
  }

  test("vec gate: same contract; compaction consolidates the water without weakening it") {
    val root = Files.createTempDirectory("graft-idorder-vec").toString
    val state = s"$root/state"; val out = s"$root/out"
    VecDupStream.applyBatch(spark, state, out,
      vecBatch(Seq(100L -> vec(), 200L -> vec())), 0L)
    VecDupStream.applyBatch(spark, state, out,
      vecBatch(Seq(300L -> vec())), 1L)
    VecDupStream.compactState(spark, state, 64L * 1024 * 1024)
    // post-compaction the merged marker must still catch a regression
    val e = intercept[IllegalArgumentException] {
      VecDupStream.applyBatch(spark, state, out,
        vecBatch(Seq(150L -> vec())), 2L)
    }
    assert(e.getMessage.contains("id-monotonicity"))
    // and still admit an advancing batch
    VecDupStream.applyBatch(spark, state, out,
      vecBatch(Seq(400L -> vec())), 2L)
  }

  test("migration seeds the high water: pre-enforcement state rejects a regressing first batch") {
    val root = Files.createTempDirectory("graft-idorder-mig").toString
    val state = s"$root/state"; val out = s"$root/out"
    VecDupStream.applyBatch(spark, state, out,
      vecBatch(Seq(100L -> vec(), 200L -> vec())), 0L)
    // simulate pre-enforcement state: drop the hiwater dir, then force
    // a migration by rewriting the layout marker to an older version
    val hw = new org.apache.hadoop.fs.Path(s"$state/hiwater")
    hw.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(hw, true)
    java.nio.file.Files.write(java.nio.file.Paths.get(state, "_LAYOUT"),
      ("graft-vecdup-v0 buckets=(tbl,bpfx=low8(bucket16),ingest):4x256 " +
        "prefix-maskable16 vecs=(vbucket=pmod256,ingest)").getBytes("UTF-8"))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(state, "._LAYOUT.crc"))
    assert(VecDupStream.migrateState(spark, state), "migration must run")
    val e = intercept[IllegalArgumentException] {
      VecDupStream.applyBatch(spark, state, out,
        vecBatch(Seq(50L -> vec())), 1L)
    }
    assert(e.getMessage.contains("id-monotonicity"),
      "migration must seed the water from the migrated ids")
    VecDupStream.applyBatch(spark, state, out,
      vecBatch(Seq(300L -> vec())), 1L)
  }
}
