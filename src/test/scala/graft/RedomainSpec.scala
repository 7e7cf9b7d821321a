package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.{IndexStream, LsmIndex, NearDupStream, VecDupStream}

/** The GROWTH half of the corpus-adaptive dir-domain story (round 11):
  * a state created small through `initState` grows its directory
  * fan-out as the corpus grows, via `redomainIfDue` — a migrate-shell
  * rebuild at the larger geometry. Pinned here, per gate: the no-op
  * while the recorded domain fits (measured path), grow-only (a
  * shrinking expectation never thrashes the domain down), pin-awareness
  * (the rebuild is an epoch barrier, so it must not seal history a
  * registered pin addresses), result bit-identity across the rebuild,
  * the expanded physical fan-out, and that tombstoned docs stay deleted
  * through the rebuild.
  */
class RedomainSpec extends SparkSpecBase {

  private def doc(i: Int): String = {
    val words = Seq("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima")
    (0 until 12).map(j => words((i * 5 + j * 7) % words.length))
      .mkString(" ") + s" tail$i"
  }

  private def docsOf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.map { case (id, t) => (id, t, "s") }
      .toDF("doc_id", "text", "source")
  }

  private def vec(i: Int): Seq[Double] =
    (0 until 64).map(j => math.sin(0.1 * (i * 17 + j * 3) % 31) + 0.1 * j)

  private def dirNames(dir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.getName)
  }

  test("retrieval index: redomain grows the domain, keeps results bit-identical, respects pins, never shrinks") {
    val root = Files.createTempDirectory("graft-redomain").toString
    val st = s"$root/ridx"
    IndexStream.initState(spark, st, expectedDocs = 40)
    IndexStream.applyBatch(spark, st,
      docsOf((0L until 25L).map(i => i -> doc(i.toInt))), batchId = 0L)
    IndexStream.applyBatch(spark, st,
      docsOf((25L until 40L).map(i => i -> doc(i.toInt))), batchId = 1L)
    import spark.implicits._
    IndexStream.deleteDocs(spark, st, Seq(7L).toDF("doc_id"),
      deleteId = 0L)
    assert(IndexStream.geomOf(spark, st) == IndexStream.Geom(16, 1))

    // measured path: 39 live docs fit the recorded domain — no-op
    assert(!IndexStream.redomainIfDue(spark, st))

    val q = Seq((900L, doc(3)), (901L, doc(33))).toDF("query_id", "text")
    def topk() = IndexStream.queryTopK(spark, st, q).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    val before = topk()
    assert(before.nonEmpty && !before.exists(_._3 == 7L),
      "fixture must rank and must not rank the deleted doc")

    // a registered pin blocks the rebuild (it is an epoch barrier)
    LsmIndex.Pins(st).register(spark, "audit", 1L)
    assert(!IndexStream.redomainIfDue(spark, st,
      expectedDocs = Some(1L << 22)))
    assert(IndexStream.geomOf(spark, st) == IndexStream.Geom(16, 1))
    LsmIndex.Pins(st).release(spark, "audit")

    // released: the growth runs, results stay bit-identical, the
    // deleted doc stays deleted, the fan-out expands
    assert(IndexStream.redomainIfDue(spark, st,
      expectedDocs = Some(1L << 22)))
    assert(IndexStream.geomOf(spark, st) == IndexStream.defaultGeom)
    assert(topk() == before, "retrieval changed across the re-domain")
    assert(dirNames(s"$st/docs").size > 16,
      s"docs fan-out did not expand: ${dirNames(s"$st/docs").size}")

    // grow-only: a smaller expectation is a no-op at the grown domain
    assert(!IndexStream.redomainIfDue(spark, st, expectedDocs = Some(10)))
    assert(IndexStream.geomOf(spark, st) == IndexStream.defaultGeom)
    // idempotent: already at the warranted domain
    assert(!IndexStream.redomainIfDue(spark, st,
      expectedDocs = Some(1L << 22)))
  }

  test("text gate: redomain keeps keep/drop decisions; measured path no-ops while small") {
    val root = Files.createTempDirectory("graft-redomain-t").toString
    val st = s"$root/txt"; val out = s"$root/out"
    NearDupStream.initState(spark, st, expectedDocs = 33)
    NearDupStream.applyBatch(spark, st, out,
      docsOf((0L until 30L).map(i => i -> doc(i.toInt))), batchId = 0L)
    NearDupStream.applyBatch(spark, st, out,
      docsOf(Seq(40L -> doc(3).replace("tail3", "tailx"),
        41L -> doc(41))), batchId = 1L)
    def keeps() = NearDupStream.keepDecisions(spark, st, out).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val before = keeps()
    assert(before.exists(_._2 == "drop"), "fixture must flag a near-dup")

    // measured path (docs-scan survivor count): 32 docs fit — no-op
    assert(!NearDupStream.redomainIfDue(spark, st))
    assert(NearDupStream.redomainIfDue(spark, st,
      expectedDocs = Some(1L << 22)))
    assert(NearDupStream.geomOf(spark, st) == NearDupStream.defaultGeom)
    assert(keeps() == before, "decisions changed across the re-domain")
    assert(dirNames(s"$st/docs").size > 16)
    // the grown gate keeps flagging arrivals against the rebuilt index
    NearDupStream.applyBatch(spark, st, out,
      docsOf(Seq(50L -> doc(5).replace("tail5", "taily"))), batchId = 2L)
    assert(keeps().exists(d => d._1 == 50L && d._2 == "drop"),
      "post-redomain arrival was not flagged against the rebuilt index")
  }

  test("vec gate: redomain retrains the codebook and keeps retrieval identical") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-redomain-v").toString
    val st = s"$root/vec"; val out = s"$root/out"
    VecDupStream.initState(spark, st, expectedVecs = 60)
    VecDupStream.applyBatch(spark, st, out,
      (0L until 40L).map(i => i -> vec(i.toInt)).toDF("vec_id", "embedding"),
      batchId = 0L)
    VecDupStream.applyBatch(spark, st, out,
      (40L until 60L).map(i => i -> vec(i.toInt)).toDF("vec_id", "embedding"),
      batchId = 1L)
    assert(VecDupStream.geomOf(spark, st) == VecDupStream.Geom(16, 4))
    // measured path: the ncount markers say 60 — fits, no-op
    assert(!VecDupStream.redomainIfDue(spark, st))

    val probe = Seq((900L, vec(3)), (901L, vec(45)))
      .toDF("query_id", "embedding")
    def ranked() = VecDupStream.queryTopK(spark, st, probe, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).sorted.toSeq
    val before = ranked()
    assert(before.nonEmpty)

    assert(VecDupStream.redomainIfDue(spark, st,
      expectedVecs = Some(1L << 22)))
    assert(VecDupStream.geomOf(spark, st) == VecDupStream.defaultGeom)
    assert(ranked() == before, "retrieval changed across the re-domain")
    assert(dirNames(s"$st/vecs").size > 16)
    // the compressed leg survived the rebuild: codebook present and
    // the drift metric computes over the re-encoded codes
    val drift = VecDupStream.codebookDrift(spark, st).collect()
    assert(drift.nonEmpty && drift.forall(_.getLong(1) > 0L),
      "post-redomain codebook/codes missing or empty")
  }
}
