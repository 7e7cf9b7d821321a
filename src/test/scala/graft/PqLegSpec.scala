package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.streaming.VecDupStream

/** The vec gate's PQ compressed leg (layout v3, round 11): codes are
  * trained/encoded at fold time, queryTopK ADC-pre-ranks candidates on
  * them, and the raw float32 `vecs` fetch tracks the per-query
  * exact-verify TAIL instead of the candidate set — the storage-scale
  * fix for the gate's dominant bytes at 100 TB.
  *
  * Pinned here:
  *  1. EXACTNESS ACROSS ENGAGEMENT: with a tail at least as large as
  *     every query's candidate set, the ADC path is bit-identical to
  *     the uncompressed path (nothing is pruned — the property that
  *     keeps the composed oracle faces exact at demo scale);
  *  2. the verify read is TAIL-BOUNDED: on a bucket-skewed fixture
  *     (hundreds of LSH-colliding vectors), the engaged path's
  *     `vecs`-scan output rows collapse to ≤ tail while the exact path
  *     reads the whole candidate set — measured from the executed
  *     plan's scan metrics, not assumed;
  *  3. an exact duplicate of the probe survives an aggressive tail and
  *     still ranks first with cosine 1.0 (ADC ordering puts the true
  *     top at the head — the re-rank contract);
  *  4. the codebook is trained ONCE (first fold) and later folds
  *     encode against it — one generation under `pqbook/` after a
  *     second fold.
  */
class PqLegSpec extends SparkSpecBase {

  private val dims = 64
  private val sharedDims = 48

  /** Bucket-skewed corpus: every vector shares its first 48 dims (the
    * probe's pattern), so LSH buckets collide heavily (pairwise cosine
    * ≈ 0.75 — below the 0.9 emission floor, so the fold stays cheap),
    * plus ONE exact copy of the probe (vec_id 2000).
    */
  private def seedVals: Array[Double] = {
    val rnd = new scala.util.Random(7)
    Array.fill(sharedDims)(rnd.nextGaussian())
  }

  private def member(i: Int): Array[Double] = {
    val rnd = new scala.util.Random(1000 + i)
    seedVals ++ Array.fill(dims - sharedDims)(rnd.nextGaussian())
  }

  private def probeVec: Array[Double] =
    seedVals ++ Array.fill(dims - sharedDims)(0.0)

  private def corpusDf: DataFrame = {
    val rows = (1 to 1200).map(i => Row(i.toLong, member(i).toSeq, "s")) :+
      Row(2000L, probeVec.toSeq, "s")
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 8), VecDupStream.vecSchema)
  }

  private def probeDf: DataFrame = {
    import spark.implicits._
    Seq((9000L, probeVec.toSeq)).toDF("query_id", "embedding")
  }

  // scan-volume probe: the shared SparkSpecBase.collectWithScanRows
  // (factored there in round 12 — this spec introduced it)

  private def key(rs: Seq[Row]): Seq[(Long, Int, Long, Long)] =
    rs.map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))

  test("ADC pre-rank: engaged ≡ exact at a covering tail; verify reads collapse to the tail; exact dup survives and ranks first; codebook trains once") {
    val root = Files.createTempDirectory("graft-pqleg").toString
    val state = s"$root/state"; val out = s"$root/out"
    VecDupStream.applyBatch(spark, state, out, corpusDf, batchId = 0L)

    // 1. exactness across engagement: tail ≥ any candidate set ⇒ the
    // compressed path prunes nothing and is bit-identical
    val (exact, exactVecsRows) = collectWithScanRows(
      VecDupStream.queryTopK(spark, state, probeDf, k = 5), "/vecs")
    spark.catalog.clearCache()
    val (covered, _) = collectWithScanRows(
      VecDupStream.queryTopKTuned(spark, state, probeDf, 5, None,
        engageMin = 0, exactTail = 4096), "/vecs")
    assert(key(exact) == key(covered),
      s"ADC path at a covering tail diverged from the exact path:\n" +
        s"exact=${key(exact)}\nadc=${key(covered)}")

    // the fixture must actually skew: the exact path's verify read is
    // the candidate set, which must dwarf the tail below
    assert(exactVecsRows >= 100L,
      s"fixture produced too few LSH candidates (vecs rows $exactVecsRows)" +
        " — the skew construction regressed")

    // 2 + 3. aggressive tail: the vecs fetch is tail-bounded and the
    // true nearest (the exact dup) still ranks first at cosine 1.0
    spark.catalog.clearCache()
    val (tailed, tailVecsRows) = collectWithScanRows(
      VecDupStream.queryTopKTuned(spark, state, probeDf, 5, None,
        engageMin = 0, exactTail = 8), "/vecs")
    // granularity note: the scan metric counts rows of the TOUCHED
    // vbucket dirs (predicate pushdown prunes at dir + row-group
    // grain), so the bound is tail × per-dir occupancy (1201/256 ≈ 5
    // rows per dir here), not the bare tail — still collapse, and at
    // production row-group sizes the vec_id sort tightens it further
    assert(tailVecsRows <= 8L * 10L,
      s"engaged verify read $tailVecsRows vecs rows — not tail-bounded " +
        "(expected ≤ tail × per-dir occupancy)")
    assert(exactVecsRows >= 4 * math.max(tailVecsRows, 1L),
      s"no read collapse: exact=$exactVecsRows tailed=$tailVecsRows")
    // sim floors to 999999, not 1000000: the probe is the double
    // source vector while the stored copy is float32-rounded (layout
    // v3), so the cosine is 1 − O(1e-8) — exactly the documented
    // storage contract
    val top = key(tailed).head
    assert(top._3 == 2000L && top._4 >= 999999L,
      s"exact dup must survive the tail and rank first: ${key(tailed)}")
    info(s"vecs-scan rows: exact=$exactVecsRows tail8=$tailVecsRows " +
      s"(collapse ${exactVecsRows / math.max(tailVecsRows, 1L)}x)")

    // 4. second fold encodes against the FIRST fold's codebook — one
    // pqbook generation, and cross-fold queries still work
    VecDupStream.applyBatch(spark, state, out,
      spark.createDataFrame(spark.sparkContext.parallelize(
          (3000 to 3010).map(i => Row(i.toLong, member(i).toSeq, "s"))),
        VecDupStream.vecSchema), batchId = 1L)
    val gens = new java.io.File(s"$state/pqbook").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("ingest="))
      .map(_.getName).toSeq
    assert(gens == Seq("ingest=0"),
      s"codebook must train once at the first fold: $gens")
    spark.catalog.clearCache()
    val again = VecDupStream.queryTopKTuned(spark, state, probeDf, 3, None,
      engageMin = 0, exactTail = 8).collect()
    assert(again.nonEmpty && again.map(_.getLong(2)).contains(2000L),
      "post-second-fold engaged query lost the exact dup")
    spark.catalog.clearCache()
  }
}
