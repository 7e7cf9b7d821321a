package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.streaming.VecDupStream

/** The embedding-ingestion near-dup gate: cross-batch and within-batch
  * semantic dups flagged exactly once with verified cosine, the
  * prefix-maskable index surviving a width change WITHOUT rehashing,
  * re-delivery idempotence, keep/drop policy view, and the shared
  * layout-marker fail-fast under this stream's own version string.
  */
class VecDupStreamSpec extends SparkSpecBase {

  private val rnd = new scala.util.Random(31)
  private def vec(): Array[Double] = Array.fill(64)(rnd.nextGaussian())
  private def perturb(v: Array[Double]): Array[Double] =
    v.map(x => x + 0.01 * rnd.nextGaussian())

  private def batchDf(rows: Seq[(Long, Array[Double])]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (id, v) => Row(id, v.toSeq, "s") }),
      VecDupStream.vecSchema)

  test("cross-batch and within-batch embedding dups flagged once with verified cosine; re-delivery idempotent") {
    val root = Files.createTempDirectory("graft-vecdup").toString
    val state = s"$root/state"; val out = s"$root/out"
    val v1 = vec(); val v2 = vec()
    // batch 0: two distinct vectors + a within-batch near-identical of v1
    VecDupStream.applyBatch(spark, state, out,
      batchDf(Seq(1L -> v1, 2L -> v2, 3L -> perturb(v1))), batchId = 0L)
    val after0 = spark.read.parquet(out)
      .select("new_id", "dup_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after0 == Set((3L, 1L)),
      s"batch 0 must flag exactly the within-batch pair (3,1): $after0")

    // batch 1: a near-dup of INDEXED v1 (never re-delivered), an
    // unrelated vector, and vector 1 itself re-arriving (store+batch
    // overlap must not double-emit)
    val v10 = perturb(v1); val v11 = vec()
    val batch1 = Seq(10L -> v10, 11L -> v11, 1L -> v1)
    VecDupStream.applyBatch(spark, state, out, batchDf(batch1),
      batchId = 1L)
    val rows1 = spark.read.parquet(out)
      .select("new_id", "dup_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows1.count(_ == ((10L, 1L))) == 1,
      s"cross-batch pair (10,1) must be emitted exactly once: $rows1")
    assert(rows1.count(_ == ((10L, 3L))) == 1,
      s"pair (10,3) must be emitted exactly once: $rows1")
    assert(!rows1.exists(p => p._1 == 11L || p._2 == 11L),
      s"unrelated vector flagged: $rows1")
    assert(spark.read.parquet(out)
      .filter(col("sim_micro") < 900000L).count() == 0,
      "an unverified pair was emitted (sim below the floor)")

    // re-delivery of batch 1 (same batchId): same emissions, same index
    val pairsBefore = spark.read.parquet(out)
      .select("new_id", "dup_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketsBefore = spark.read.parquet(s"$state/buckets").count()
    VecDupStream.applyBatch(spark, state, out, batchDf(batch1),
      batchId = 1L)
    assert(spark.read.parquet(out)
      .select("new_id", "dup_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == pairsBefore,
      "re-delivered batch changed the emitted pair set")
    assert(spark.read.parquet(s"$state/buckets").count() == bucketsBefore,
      "re-delivered batch grew the bucket index")

    // keep/drop policy: dups drop toward the smallest representative
    val verdicts = VecDupStream.keepDecisions(spark, state, out)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(verdicts(1L) == (("keep", -1L)) && verdicts(2L) == (("keep", -1L)))
    assert(verdicts(3L) == (("drop", 1L)) && verdicts(10L) == (("drop", 1L)))
  }

  test("prefix-maskable growth: state indexed at a narrow width is read correctly after the corpus forces a wider mask — no rehash") {
    val root = Files.createTempDirectory("graft-vecdup-grow").toString
    val state = s"$root/state"; val out = s"$root/out"
    val seed = vec()
    // batch 0: 10 vectors -> read width p = lshAutoPlanes(10) = 1
    val early = (0 until 10).map(i => (100L + i) ->
      (if (i == 0) seed else vec()))
    VecDupStream.applyBatch(spark, state, out, batchDf(early), batchId = 0L)
    assert(graft.operators.Similarity.lshAutoPlanes(10) == 1)

    // batch 1: 200 fresh vectors + ONE near-dup of the vector indexed
    // at width 1. Corpus is now 211 -> p = 5: the stored full-width
    // buckets are masked at 5 bits AT READ TIME; nothing was rehashed.
    val fresh = (0 until 200).map(i => (1000L + i) -> vec())
    VecDupStream.applyBatch(spark, state, out,
      batchDf(fresh :+ (5000L -> perturb(seed))), batchId = 1L)
    assert(graft.operators.Similarity.lshAutoPlanes(211) == 5)
    val pairs = spark.read.parquet(out)
      .filter(col("new_id") === 5000L)
      .select("dup_id").collect().map(_.getLong(0)).toSet
    assert(pairs.contains(100L),
      s"near-dup of the narrow-width-indexed vector must be found " +
        s"after the width grew, got partners: $pairs")
  }

  test("layout marker: stamped with the vecdup version; foreign layout fails fast") {
    val root = Files.createTempDirectory("graft-vecdup-layout").toString
    val state = s"$root/state"; val out = s"$root/out"
    VecDupStream.applyBatch(spark, state, out,
      batchDf(Seq(1L -> vec())), batchId = 0L)
    val marker = java.nio.file.Paths.get(state, "_LAYOUT")
    assert(new String(Files.readAllBytes(marker), "UTF-8").trim ==
      VecDupStream.layoutVersion)
    // a NearDupStream-layout dir is a foreign layout here: refuse
    Files.write(marker,
      graft.streaming.NearDupStream.layoutVersion.getBytes("UTF-8"))
    Files.deleteIfExists(java.nio.file.Paths.get(state, "._LAYOUT.crc"))
    val e = intercept[IllegalArgumentException] {
      VecDupStream.applyBatch(spark, state, out,
        batchDf(Seq(9L -> vec())), batchId = 1L)
    }
    assert(e.getMessage.contains("layout"))
  }

  test("streaming runner: file-source micro-batches flow through the gate with checkpointed exactly-once") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-vecdup-stream").toString
    val src = s"$root/src"; val state = s"$root/state"
    val out = s"$root/out"; val ckp = s"$root/ckp"
    Files.createDirectories(java.nio.file.Paths.get(src))
    val v1 = vec()
    def write(rows: Seq[(Long, Array[Double])]): Unit =
      rows.map { case (id, v) => (id, v.toSeq, "s") }
        .toDF("vec_id", "embedding", "source")
        .coalesce(1).write.mode("append").parquet(src)
    write(Seq(1L -> v1, 2L -> vec()))
    VecDupStream.start(spark, src, state, out, ckp).awaitTermination()
    write(Seq(10L -> perturb(v1)))
    VecDupStream.start(spark, src, state, out, ckp).awaitTermination()
    val pairs = spark.read.parquet(out)
      .select("new_id", "dup_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((10L, 1L)), s"got $pairs")
    // empty restart re-emits nothing
    val n = spark.read.parquet(out).count()
    VecDupStream.start(spark, src, state, out, ckp).awaitTermination()
    assert(spark.read.parquet(out).count() == n)
  }

  test("queryTopK: the dedup index answers ranked ANN retrieval; exclude drops candidates before ranking") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-vecq").toString
    val state = s"$root/state"; val out = s"$root/out"
    val v1 = vec(); val v2 = vec(); val v3 = vec()
    VecDupStream.applyBatch(spark, state, out,
      batchDf(Seq(1L -> v1, 2L -> v2)), batchId = 0L)
    VecDupStream.applyBatch(spark, state, out,
      batchDf(Seq(3L -> v3)), batchId = 1L)

    // a probe near v2 must rank vector 2 first with near-1.0 cosine
    val probe = Seq((900L, perturb(v2).toSeq)).toDF("query_id", "embedding")
    val got = VecDupStream.queryTopK(spark, state, probe)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.nonEmpty && got.head._2 == 2L,
      s"probe near v2 must retrieve vector 2 first: ${got.toSeq}")
    assert(got.head._3 > 990000L,
      s"top hit must verify with near-1.0 cosine: ${got.toSeq}")

    // the same probe with vector 2 excluded never returns it
    val excl = Seq(2L).toDF("vec_id")
    val got2 = VecDupStream.queryTopK(spark, state, probe,
      exclude = Some(excl)).collect().map(_.getLong(2)).toSet
    assert(!got2.contains(2L),
      s"excluded candidate leaked into the ranking: $got2")

    // allow (filtered ANN): only the allowed subset ranks, and the
    // constrained list is full-depth (contiguous ranks from 1), not a
    // post-filtered stub with holes
    val got3 = VecDupStream.queryTopK(spark, state, probe,
        allow = Some(Seq(1L, 3L).toDF("vec_id"))).collect()
      .map(r => (r.getInt(1), r.getLong(2))).sortBy(_._1)
    assert(got3.nonEmpty && got3.map(_._2).toSet.subsetOf(Set(1L, 3L)),
      s"allow leaked a non-allowed candidate: ${got3.toSeq}")
    assert(got3.map(_._1).toSeq == (1 to got3.length).toSeq,
      s"filtered ranking must be contiguous from 1: ${got3.toSeq}")

    // deterministic across runs
    val a = VecDupStream.queryTopK(spark, state, probe).collect().toSeq
    spark.catalog.clearCache()
    val b = VecDupStream.queryTopK(spark, state, probe).collect().toSeq
    assert(a == b, "queryTopK is not run-deterministic")
    spark.catalog.clearCache()
  }
}
