package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.{IndexStream, NearDupStream}

/** Corpus-adaptive dir domains for the text gate and the retrieval
  * index (round 11 — the VecGeomSpec contract on the other two LSM
  * states): the domain is a creation-time `_LAYOUT` term; every
  * derived dir key is computed from the recorded geometry; results are
  * bit-identical across domains; the default regenerates the
  * historical layout strings byte-for-byte so existing states stay
  * valid.
  */
class GateGeomSpec extends SparkSpecBase {

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

  private def dirNames(dir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.getName)
  }

  test("default geometries regenerate the historical layout strings; adaptive choices parse back") {
    assert(NearDupStream.layoutVersionFor(NearDupStream.defaultGeom) ==
      NearDupStream.layoutVersion)
    assert(NearDupStream.layoutVersion ==
      "graft-neardup-v3 buckets=(band_idx,bpfx,ingest):4x256 " +
        "docs=(dbucket=pmod256,ingest) tombs=(dbucket,ingest)")
    assert(IndexStream.layoutVersionFor(IndexStream.defaultGeom) ==
      IndexStream.layoutVersion)
    assert(IndexStream.layoutVersion ==
      "graft-ridx-v8 postings=(tpfx=md5hex2(term),ingest):256 sort=term " +
        "pos=sorted-int-array title-first " +
        "docs=(dbucket=pmod256,ingest) sort=doc_id ttl-col " +
        "dfs=(dpfx=md5hex1(term),ingest):16 sort=term gen-col dft-col " +
        "impact=max_tf " +
        "tombs=(dbucket=pmod256,ingest) del=neg-df+neg-markers " +
        "tok=lower-ws ncount=(n_docs,tot_dl,tot_ttl) title=5x2 " +
        "cap=2df<=n")
    assert(NearDupStream.parseGeom(NearDupStream.layoutVersion)
      .contains(NearDupStream.defaultGeom))
    assert(IndexStream.parseGeom(IndexStream.layoutVersion)
      .contains(IndexStream.defaultGeom))
    assert(NearDupStream.parseGeom(
        NearDupStream.adaptiveLayoutVersion(100))
      .contains(NearDupStream.Geom(16, 1)))
    assert(IndexStream.parseGeom(IndexStream.adaptiveLayoutVersion(100))
      .contains(IndexStream.Geom(16, 1)))
    assert(IndexStream.adaptiveGeom(1L << 40) == IndexStream.defaultGeom)
  }

  test("text gate: a small-domain state emits and decides identically to a default-domain state") {
    val root = Files.createTempDirectory("graft-ggeom").toString
    val sA = s"$root/small"; val oA = s"$root/small_out"
    val sB = s"$root/dflt"; val oB = s"$root/dflt_out"
    val b1 = (0L until 30L).map(i => i -> doc(i.toInt))
    // near-dup of doc 3 (one word changed) + fresh docs
    val b2 = Seq(40L -> (doc(3).replace("tail3", "tailx")),
      41L -> doc(41), 42L -> doc(42))

    NearDupStream.initState(spark, sA, expectedDocs = 33)
    Seq(sA -> oA, sB -> oB).foreach { case (st, o) =>
      NearDupStream.applyBatch(spark, st, o, docsOf(b1), batchId = 0L)
      NearDupStream.applyBatch(spark, st, o, docsOf(b2), batchId = 1L)
    }
    assert(dirNames(s"$sA/docs").size <= 16 &&
      dirNames(s"$sA/buckets/band_idx=0").size <= 16,
      s"small text domain exceeded: ${dirNames(s"$sA/docs").size} / " +
        s"${dirNames(s"$sA/buckets/band_idx=0").size}")

    def pairs(o: String) = spark.read.parquet(o)
      .select(col("new_id"), col("dup_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(pairs(oA) == pairs(oB) && pairs(oA).contains((40L, 3L)),
      s"emissions differ across domains: ${pairs(oA)} vs ${pairs(oB)}")
    def keeps(st: String, o: String) =
      NearDupStream.keepDecisions(spark, st, o).collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(keeps(sA, oA) == keeps(sB, oB))
    // delete + verdicts hold across domains
    import spark.implicits._
    Seq(sA, sB).foreach(st => NearDupStream.deleteDocs(spark, st,
      Seq(41L).toDF("doc_id"), deleteId = 0L))
    assert(keeps(sA, oA) == keeps(sB, oB),
      "post-delete decisions differ across domains")
    assert(NearDupStream.geomOf(spark, sA) == NearDupStream.Geom(16, 1))
    assert(NearDupStream.geomOf(spark, sB) == NearDupStream.defaultGeom)
  }

  test("retrieval index: a small-domain state ranks, phrase-matches, and deletes identically to a default-domain state") {
    val root = Files.createTempDirectory("graft-rgeom").toString
    val sA = s"$root/small"; val sB = s"$root/dflt"
    val b1 = (0L until 25L).map(i => i -> doc(i.toInt))
    val b2 = (25L until 40L).map(i => i -> doc(i.toInt))

    IndexStream.initState(spark, sA, expectedDocs = 40)
    Seq(sA, sB).foreach { st =>
      IndexStream.applyBatch(spark, st, docsOf(b1), batchId = 0L)
      IndexStream.applyBatch(spark, st, docsOf(b2), batchId = 1L)
    }
    assert(dirNames(s"$sA/postings").size <= 16 &&
      dirNames(s"$sA/docs").size <= 16,
      s"small index domain exceeded: ${dirNames(s"$sA/postings").size}")
    assert(dirNames(s"$sB/postings").size > 16,
      "fixture too small to distinguish the domains")

    import spark.implicits._
    val q = Seq((900L, doc(3)), (901L, doc(33))).toDF("query_id", "text")
    def topk(st: String) = IndexStream.queryTopK(spark, st, q).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    def phr(st: String) = IndexStream.queryPhrase(spark, st, q).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    def near(st: String) = IndexStream.queryNear(spark, st, q,
        sloppy = true).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    assert(topk(sA) == topk(sB) && topk(sA).nonEmpty,
      s"BM25 differs across domains")
    assert(phr(sA) == phr(sB), "phrase retrieval differs across domains")
    assert(near(sA) == near(sB), "NEAR retrieval differs across domains")

    Seq(sA, sB).foreach(st => IndexStream.deleteDocs(spark, st,
      Seq(3L).toDF("doc_id"), deleteId = 0L))
    assert(topk(sA) == topk(sB),
      "post-delete retrieval differs across domains")
    IndexStream.compactState(spark, sA, targetFileBytes = 1L << 20)
    assert(topk(sA) == topk(sB),
      "post-compaction retrieval differs across domains")
    assert(IndexStream.geomOf(spark, sA) == IndexStream.Geom(16, 1))
  }
}
