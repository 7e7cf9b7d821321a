package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.streaming.{NearDupStream, VecDupStream}
import graft.operators.Similarity

/** Layout migration (r9, the r8 verdict's top item) and the LSM state
  * crash contracts it completes:
  *
  *  - `migrateState` rebuilds a gate's DERIVED sub-tables from its raw
  *    sub-table under the current `_LAYOUT` — pinned by writing state
  *    under the OLD layout (16-bit planes for the vec gate, pmod16 doc
  *    buckets for the text gate), migrating, and asserting the gate's
  *    NEXT-BATCH emissions are identical to a fresh-indexed run;
  *  - interrupted migrations fail fast at ensureLayout and are
  *    completed by re-running migrateState;
  *  - interrupted compactions auto-recover on the next state touch
  *    (ADVICE r8: the old window silently served an EMPTY index);
  *  - interrupted count-marker consolidations never double the stored
  *    count (ADVICE r8).
  */
class MigrateSpec extends SparkSpecBase {

  private val rnd = new scala.util.Random(47)
  private def vec(): Array[Double] = Array.fill(64)(rnd.nextGaussian())
  private def perturb(v: Array[Double]): Array[Double] =
    v.map(x => x + 0.01 * rnd.nextGaussian())

  private def vecBatch(rows: Seq[(Long, Array[Double])]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (id, v) => Row(id, v.toSeq, "s") }),
      VecDupStream.vecSchema)

  private def docBatch(rows: Seq[(Long, String)]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, t) => Row(id, t, "s") }),
      NearDupStream.docSchema)

  private def hfs = org.apache.hadoop.fs.FileSystem.getLocal(
    spark.sparkContext.hadoopConfiguration)
  private def hp(s: String) = new org.apache.hadoop.fs.Path(s)

  private def emissions(dir: String, batchId: Long): Set[(Long, Long, Long)] =
    spark.read.parquet(dir).filter(col("batch_id") === batchId)
      .select("new_id", "dup_id", "sim_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  /** Write a vec-gate state dir exactly as the PRE-WIDENING (round-8
    * 16-plane) layout stored it: full 16-bit signatures in a column
    * named `bucket16`, the same raw `vecs` sub-table, a per-batch
    * count marker, and the old `_LAYOUT` string.
    */
  private def writeOldVecState(state: String,
      rows: Seq[(Long, Array[Double])]): Unit = {
    graft.plans.VectorExprs.register(spark)
    val base = vecBatch(rows)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val tableStructs = (0 until 4).map { l =>
      val bucket = Similarity.planesForAuto(l).take(16).zipWithIndex
        .map { case (pl, j) =>
          when(expr(s"graft_dot(v, ${Similarity.planeSparkLit(pl)})") > 0,
            lit(1L << j)).otherwise(lit(0L))
        }.reduce(_ + _)
      struct(lit(l).as("tbl"), bucket.as("bucket16"))
    }
    base.select(col("vec_id"), explode(array(tableStructs: _*)).as("tb"))
      .select(col("vec_id"), col("tb.tbl").as("tbl"),
        col("tb.bucket16").as("bucket16"))
      .withColumn("bpfx", col("bucket16").bitwiseAND(lit(255L)))
      .withColumn("ingest", lit(0L))
      .write.partitionBy("tbl", "bpfx", "ingest").parquet(s"$state/buckets")
    base.withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
      .withColumn("vbucket", pmod(col("vec_id"), lit(256)))
      .withColumn("ingest", lit(0L))
      .write.partitionBy("vbucket", "ingest").parquet(s"$state/vecs")
    Files.createDirectories(java.nio.file.Paths.get(state, "ncount"))
    Files.write(java.nio.file.Paths.get(state, "ncount", "ingest=0"),
      rows.size.toString.getBytes("UTF-8"))
    Files.write(java.nio.file.Paths.get(state, "_LAYOUT"),
      ("graft-vecdup-v0 buckets=(tbl,bpfx=low8(bucket16),ingest):4x256 " +
        "prefix-maskable16 vecs=(vbucket=pmod256,ingest)").getBytes("UTF-8"))
  }

  test("vec gate: pre-widening 16-bit state migrates; next-batch emissions identical to a fresh-indexed run") {
    val root = Files.createTempDirectory("graft-mig-vec").toString
    val v1 = vec(); val v2 = vec(); val v3 = vec()
    val batch0 = Seq(1L -> v1, 2L -> v2, 3L -> v3)
    val batch1 = Seq(10L -> perturb(v1), 11L -> vec(), 12L -> perturb(v2))

    // reference: a fresh index built by the current code
    val freshState = s"$root/fresh_state"; val freshOut = s"$root/fresh_out"
    VecDupStream.applyBatch(spark, freshState, freshOut, vecBatch(batch0), 0L)
    VecDupStream.applyBatch(spark, freshState, freshOut, vecBatch(batch1), 1L)
    val want = emissions(freshOut, 1L)
    assert(want.map(p => (p._1, p._2)) == Set((10L, 1L), (12L, 2L)),
      s"fixture must flag exactly the two seeded near-dups: $want")

    // old-layout state: fails fast until migrated, then behaves fresh
    val oldState = s"$root/old_state"; val oldOut = s"$root/old_out"
    writeOldVecState(oldState, batch0)
    val e = intercept[IllegalArgumentException] {
      VecDupStream.applyBatch(spark, oldState, oldOut, vecBatch(batch1), 1L)
    }
    assert(e.getMessage.contains("layout"))
    assert(VecDupStream.migrateState(spark, oldState), "migration must run")
    assert(!VecDupStream.migrateState(spark, oldState),
      "second call must be a version-match no-op")
    assert(new String(Files.readAllBytes(
      java.nio.file.Paths.get(oldState, "_LAYOUT")), "UTF-8").trim ==
      VecDupStream.layoutVersion)
    assert(spark.read.parquet(s"$oldState/buckets")
      .columns.contains("bucket32"), "derived sub-table must be rebuilt")
    VecDupStream.applyBatch(spark, oldState, oldOut, vecBatch(batch1), 1L)
    assert(emissions(oldOut, 1L) == want,
      "migrated index must emit exactly what a fresh-indexed run emits")
  }

  test("text gate: pmod16-dbucket v1 state migrates; junk n_sh and stale bpfx are re-derived; emissions match fresh") {
    val root = Files.createTempDirectory("graft-mig-txt").toString
    val t1 = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
    val t2 = "completely different content about database engines and query planners in distributed systems"
    val batch0 = Seq(1L -> t1, 2L -> t2)
    val batch1 = Seq(10L -> (t1 + " again"), 11L -> "unrelated short words entirely elsewhere")

    val freshState = s"$root/fresh_state"; val freshOut = s"$root/fresh_out"
    NearDupStream.applyBatch(spark, freshState, freshOut, docBatch(batch0), 0L)
    NearDupStream.applyBatch(spark, freshState, freshOut, docBatch(batch1), 1L)
    val want = spark.read.parquet(freshOut).filter(col("batch_id") === 1L)
      .select("new_id", "dup_id", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(want.map(p => (p._1, p._2)) == Set((10L, 1L)))

    // v1-layout state: 16 doc buckets, single-hex bpfx, n_sh junk —
    // the migrator must re-derive ALL of it from (doc_id, lt)
    val oldState = s"$root/old_state"; val oldOut = s"$root/old_out"
    graft.plans.TextExprs.register(spark)
    val sigs = docBatch(batch0)
      .select(col("doc_id"), lower(col("text")).as("lt"))
      .withColumn("n_sh", lit(-1L))
      .withColumn("dbucket", pmod(col("doc_id"), lit(16)))
      .withColumn("ingest", lit(0L))
    sigs.write.partitionBy("dbucket", "ingest").parquet(s"$oldState/docs")
    docBatch(batch0)
      .select(col("doc_id"), expr("graft_minhash(lower(text))").as("m"))
      .withColumn("b0", md5(concat(col("m.s0"), col("m.s1"))))
      .selectExpr("doc_id", "0 AS band_idx", "b0 AS bucket")
      .withColumn("bpfx", substring(col("bucket"), 1, 1))
      .withColumn("ingest", lit(0L))
      .write.partitionBy("band_idx", "bpfx", "ingest")
      .parquet(s"$oldState/buckets")
    Files.write(java.nio.file.Paths.get(oldState, "_LAYOUT"),
      "graft-neardup-v1 buckets=(band_idx,bpfx=hex1) docs=(dbucket=pmod16)"
        .getBytes("UTF-8"))

    assert(NearDupStream.migrateState(spark, oldState))
    // re-derived: 4 bands present again, dbucket pmod256, real n_sh
    val mig = spark.read.parquet(s"$oldState/docs")
    assert(mig.filter(col("n_sh") <= 0L).count() == 0,
      "junk n_sh must be recomputed from lt")
    assert(spark.read.parquet(s"$oldState/buckets")
      .select("band_idx").distinct().count() == 4)
    NearDupStream.applyBatch(spark, oldState, oldOut, docBatch(batch1), 1L)
    val got = spark.read.parquet(oldOut).filter(col("batch_id") === 1L)
      .select("new_id", "dup_id", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want,
      s"migrated index emissions must match fresh-indexed: $got vs $want")
  }

  test("interrupted migration: ensureLayout fails fast; re-running migrateState completes the swap") {
    val root = Files.createTempDirectory("graft-mig-crash").toString
    val v1 = vec()
    val batch0 = Seq(1L -> v1, 2L -> vec())
    val state = s"$root/state"; val out = s"$root/out"
    writeOldVecState(state, batch0)
    // build the "complete staging" a crashed migration would have left,
    // by migrating a copy of the old state
    val copied = s"$root/copy"
    org.apache.hadoop.fs.FileUtil.copy(hfs, hp(state), hfs, hp(copied),
      false, spark.sparkContext.hadoopConfiguration)
    assert(VecDupStream.migrateState(spark, copied))
    // simulate the crash window between the two swap renames:
    // root absent, retired = old state, staging = complete new state
    assert(hfs.rename(hp(state), hp(state + "_pre_migrate")))
    assert(hfs.rename(hp(copied), hp(state + "_migrate_staging")))
    val e = intercept[IllegalArgumentException] {
      VecDupStream.applyBatch(spark, state, out,
        vecBatch(Seq(10L -> perturb(v1))), 1L)
    }
    assert(e.getMessage.contains("migration"))
    assert(VecDupStream.migrateState(spark, state),
      "re-run must complete the interrupted swap")
    assert(!Files.exists(java.nio.file.Paths.get(state + "_pre_migrate")))
    assert(!Files.exists(java.nio.file.Paths.get(state + "_migrate_staging")))
    VecDupStream.applyBatch(spark, state, out,
      vecBatch(Seq(10L -> perturb(v1))), 1L)
    assert(emissions(out, 1L).map(p => (p._1, p._2)) == Set((10L, 1L)))
  }

  test("empty state (marker only, no data yet) migrates to a usable root") {
    val root = Files.createTempDirectory("graft-mig-empty").toString
    val state = s"$root/state"; val out = s"$root/out"
    Files.createDirectories(java.nio.file.Paths.get(state))
    Files.write(java.nio.file.Paths.get(state, "_LAYOUT"),
      "graft-vecdup-v0 something-old".getBytes("UTF-8"))
    assert(VecDupStream.migrateState(spark, state))
    assert(new String(Files.readAllBytes(
      java.nio.file.Paths.get(state, "_LAYOUT")), "UTF-8").trim ==
      VecDupStream.layoutVersion)
    // and the migrated empty root ingests normally
    val v1 = vec()
    VecDupStream.applyBatch(spark, state, out,
      vecBatch(Seq(1L -> v1, 2L -> perturb(v1))), 0L)
    assert(emissions(out, 0L).map(p => (p._1, p._2)) == Set((2L, 1L)))
  }

  test("interrupted compaction: a missing sub-table root is restored from the retired copy, never served as empty") {
    val root = Files.createTempDirectory("graft-compact-crash").toString
    val state = s"$root/state"; val out = s"$root/out"
    val t1 = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
    NearDupStream.applyBatch(spark, state, out, docBatch(Seq(1L -> t1)), 0L)
    // crash window W1: root renamed aside, staging present
    assert(hfs.rename(hp(s"$state/docs"), hp(s"$state/docs_pre_compact")))
    Files.createDirectories(
      java.nio.file.Paths.get(state, "docs_compact_staging"))
    // next touch auto-recovers — and the near-dup of the stored doc is
    // still caught (the old contract read an EMPTY docs table here and
    // silently dropped the flag at verification)
    NearDupStream.applyBatch(spark, state, out,
      docBatch(Seq(5L -> (t1 + " again"))), 1L)
    val pairs = spark.read.parquet(out)
      .select("new_id", "dup_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((5L, 1L)),
      s"flag lost across compaction-crash recovery: $pairs")
    assert(!Files.exists(java.nio.file.Paths.get(state, "docs_pre_compact")))
    assert(!Files.exists(
      java.nio.file.Paths.get(state, "docs_compact_staging")))
  }

  test("orphan compaction staging with no live or retired root fails fast") {
    val root = Files.createTempDirectory("graft-compact-orphan").toString
    val state = s"$root/state"; val out = s"$root/out"
    val t1 = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
    NearDupStream.applyBatch(spark, state, out, docBatch(Seq(1L -> t1)), 0L)
    hfs.delete(hp(s"$state/docs"), true)
    Files.createDirectories(
      java.nio.file.Paths.get(state, "docs_compact_staging"))
    val e = intercept[IllegalArgumentException] {
      NearDupStream.applyBatch(spark, state, out,
        docBatch(Seq(5L -> (t1 + " again"))), 1L)
    }
    assert(e.getMessage.contains("staging"))
  }

  test("count-marker consolidation is crash-safe: no window doubles the stored count") {
    val root = Files.createTempDirectory("graft-ncount-crash").toString
    val state = s"$root/state"; val out = s"$root/out"
    VecDupStream.applyBatch(spark, state, out,
      vecBatch(Seq(1L -> vec(), 2L -> vec())), 0L)
    VecDupStream.applyBatch(spark, state, out,
      vecBatch(Seq(3L -> vec())), 1L)
    def markers(dir: String): Map[String, Long] = {
      val d = java.nio.file.Paths.get(dir)
      if (!Files.exists(d)) Map.empty
      else {
        val s = Files.list(d)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala
            .filter(p => p.getFileName.toString.startsWith("ingest="))
            .map(p => p.getFileName.toString ->
              new String(Files.readAllBytes(p), "UTF-8").trim.toLong)
            .toMap
        } finally s.close()
      }
    }
    // consolidation happens inside compactState
    VecDupStream.compactState(spark, state, targetFileBytes = 1L << 20,
      minFiles = 1)
    assert(markers(s"$state/ncount") == Map("ingest=-1" -> 3L),
      "consolidation must merge to a single total marker")
    // crash window A: stale ncount_new left before the swap began
    Files.createDirectories(java.nio.file.Paths.get(state, "ncount_new"))
    Files.write(java.nio.file.Paths.get(state, "ncount_new", "ingest=-1"),
      "999".getBytes("UTF-8"))
    VecDupStream.applyBatch(spark, state, out,
      vecBatch(Seq(4L -> vec())), 2L)
    assert(!Files.exists(java.nio.file.Paths.get(state, "ncount_new")))
    assert(markers(s"$state/ncount") ==
      Map("ingest=-1" -> 3L, "ingest=2" -> 1L),
      "stale staging must not leak into the count")
    // crash window B: between the swap renames (live dir briefly gone)
    assert(hfs.rename(hp(s"$state/ncount"), hp(s"$state/ncount_old")))
    VecDupStream.applyBatch(spark, state, out,
      vecBatch(Seq(5L -> vec())), 3L)
    assert(!Files.exists(java.nio.file.Paths.get(state, "ncount_old")))
    assert(markers(s"$state/ncount") ==
      Map("ingest=-1" -> 3L, "ingest=2" -> 1L, "ingest=3" -> 1L),
      "the restored markers must sum to the true count, never doubled")
  }
}
