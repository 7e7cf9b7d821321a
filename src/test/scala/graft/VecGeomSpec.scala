package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.VecDupStream

/** Corpus-adaptive dir domains for the vec gate (round 11): the
  * buckets/vecs/pq/tombs fan-outs are a LAYOUT term chosen at state
  * creation (`initState`), recorded in `_LAYOUT`, parsed back on every
  * open — so a small corpus stops paying the production 4×256/256
  * per-dir file constants while the LSH signatures, read width, and
  * every result stay identical. Pinned here: the adaptive choice, the
  * physical dir bound, result/emission equivalence against a
  * default-domain state across query, delete, and compaction, and the
  * immutability of a recorded domain.
  */
class VecGeomSpec extends SparkSpecBase {

  private def vec(i: Int): Seq[Double] =
    (0 until 64).map(j => math.sin(0.1 * (i * 17 + j * 3) % 31) + 0.1 * j)

  private def vecsOf(rows: Seq[(Long, Seq[Double])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private def dirNames(dir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.getName)
  }

  test("adaptive geometry picks the smallest domain holding ~4096 vectors per dir, clamped to production") {
    assert(VecDupStream.adaptiveGeom(0) == VecDupStream.Geom(16, 4))
    assert(VecDupStream.adaptiveGeom(8000) == VecDupStream.Geom(16, 4))
    assert(VecDupStream.adaptiveGeom(70000) == VecDupStream.Geom(32, 5))
    assert(VecDupStream.adaptiveGeom(2000000) == VecDupStream.Geom(256, 8))
    assert(VecDupStream.adaptiveGeom(Long.MaxValue / 2) ==
      VecDupStream.defaultGeom)
    // the default geometry regenerates the production layout string
    // byte-identically — existing states stay valid under the
    // parametrization
    assert(VecDupStream.layoutVersionFor(VecDupStream.defaultGeom) ==
      VecDupStream.layoutVersion)
    assert(VecDupStream.parseGeom(VecDupStream.layoutVersion)
      .contains(VecDupStream.defaultGeom))
    assert(VecDupStream.parseGeom(
        VecDupStream.adaptiveLayoutVersion(100))
      .contains(VecDupStream.Geom(16, 4)))
  }

  test("a small-domain state answers, emits, deletes, and compacts identically to a default-domain state") {
    val root = Files.createTempDirectory("graft-geom").toString
    val sA = s"$root/small"; val oA = s"$root/small_out"
    val sB = s"$root/dflt"; val oB = s"$root/dflt_out"

    val b1 = (0L until 40L).map(i => i -> vec(i.toInt))
    val b2 = (40L until 60L).map(i =>
      i -> (if (i % 7 == 0) vec((i - 40L).toInt) else vec(i.toInt)))

    VecDupStream.initState(spark, sA, expectedVecs = 60)
    VecDupStream.applyBatch(spark, sA, oA, vecsOf(b1), batchId = 0L)
    VecDupStream.applyBatch(spark, sA, oA, vecsOf(b2), batchId = 1L)
    VecDupStream.applyBatch(spark, sB, oB, vecsOf(b1), batchId = 0L)
    VecDupStream.applyBatch(spark, sB, oB, vecsOf(b2), batchId = 1L)

    // the physical fan-out is bounded by the recorded domain (16
    // vbuckets, 4×16 bucket dirs) instead of the production 256/1024
    assert(dirNames(s"$sA/vecs").size <= 16,
      s"vecs dirs exceed the small domain: ${dirNames(s"$sA/vecs")}")
    val bDirs = dirNames(s"$sA/buckets")
      .flatMap(t => dirNames(s"$sA/buckets/$t").map(b => s"$t/$b"))
    assert(bDirs.size <= 4 * 16,
      s"bucket dirs exceed the small domain: ${bDirs.size}")
    assert(dirNames(s"$sB/vecs").size > 16,
      "fixture too small to distinguish the domains")

    // identical emissions (same pairs, same sims) and identical
    // retrieval under both domains
    def pairs(o: String) = spark.read.parquet(o)
      .select(col("new_id"), col("dup_id"), col("sim_micro"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    assert(pairs(oA) == pairs(oB),
      s"emissions differ across domains: ${pairs(oA)} vs ${pairs(oB)}")
    import spark.implicits._
    val probe = Seq((900L, vec(3)), (901L, vec(45)))
      .toDF("query_id", "embedding")
    def ranked(s: String) = VecDupStream.queryTopK(spark, s, probe, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).sorted.toSeq
    assert(ranked(sA) == ranked(sB),
      s"retrieval differs across domains")

    // delete + compact on the small-domain state: same contract
    assert(VecDupStream.deleteDocs(spark, sA,
      Seq(3L).toDF("vec_id"), deleteId = 0L) == 1L)
    assert(VecDupStream.deleteDocs(spark, sB,
      Seq(3L).toDF("vec_id"), deleteId = 0L) == 1L)
    VecDupStream.compactState(spark, sA, targetFileBytes = 1L << 20)
    assert(ranked(sA) == ranked(sB),
      "post-delete/compact retrieval differs across domains")

    // the recorded domain is immutable: a later init with a different
    // expectation keeps the stamp, and geomOf round-trips it
    VecDupStream.initState(spark, sA, expectedVecs = 1L << 40)
    assert(VecDupStream.geomOf(spark, sA) == VecDupStream.Geom(16, 4),
      "an existing state's geometry must not be re-stamped")
    assert(VecDupStream.geomOf(spark, sB) == VecDupStream.defaultGeom)
  }
}
