package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.streaming.{NearDupStream, PipelineStream, VecDupStream}

/** Right-to-be-forgotten across the dedup gates and the composed
  * pipeline (round 10): after `deleteDocs`, forgotten content (a) never
  * ranks in ANN retrieval, (b) never flags a future arrival as its
  * duplicate, (c) leaves the keep/drop verdict universe — immediately,
  * via tombstone anti-joins, while past emissions stay as the
  * historical record; compaction makes the delete physical (bytes
  * gone, tombstones cleared) without changing any answer. The
  * retrieval-index delete faces are pinned in DeleteSpec; this spec
  * pins the gates and the PipelineStream composition.
  */
class GateDeleteSpec extends SparkSpecBase {

  private val rnd = new scala.util.Random(77)
  private def vec(): Array[Double] = Array.fill(64)(rnd.nextGaussian())
  private def perturb(v: Array[Double]): Array[Double] =
    v.map(x => x + 0.01 * rnd.nextGaussian())

  private def vbatch(rows: Seq[(Long, Array[Double])]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (id, v) => Row(id, v.toSeq, "s") }),
      VecDupStream.vecSchema)

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("vec gate: deleted vectors stop ranking and stop flagging arrivals; answers equal a fresh survivors-only index") {
    val root = Files.createTempDirectory("graft-vdel").toString
    val state = s"$root/state"; val out = s"$root/out"
    val vs = (1L to 8L).map(i => i -> vec())
    VecDupStream.applyBatch(spark, state, out, vbatch(vs.take(4)), 0L)
    VecDupStream.applyBatch(spark, state, out, vbatch(vs.drop(4)), 1L)

    import spark.implicits._
    assert(VecDupStream.deleteDocs(spark, state,
      Seq(2L, 6L).toDF("vec_id"), deleteId = 0L) == 2L)
    // idempotent re-delivery; cross-operation double delete is a no-op
    assert(VecDupStream.deleteDocs(spark, state,
      Seq(2L, 6L).toDF("vec_id"), deleteId = 0L) == 2L)
    assert(VecDupStream.deleteDocs(spark, state,
      Seq(2L).toDF("vec_id"), deleteId = 1L) == 0L)

    // ranked ANN: bit-identical to a fresh index of the survivors
    // (the negative count marker keeps the read width p sized to the
    // survivors, so even the probe geometry matches)
    val fresh = s"$root/fresh"
    VecDupStream.applyBatch(spark, fresh, s"$root/fout",
      vbatch(vs.filterNot(r => r._1 == 2L || r._1 == 6L)), 0L)
    val probes = spark.createDataFrame(
      spark.sparkContext.parallelize(vs.map { case (id, v) =>
        Row(100L + id, perturb(v).toSeq) }),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("query_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)))))
    val want = rows(VecDupStream.queryTopK(spark, fresh, probes))
    assert(want.nonEmpty)
    assert(rows(VecDupStream.queryTopK(spark, state, probes)) == want,
      "post-delete ANN must equal a fresh survivors-only index")

    // a new arrival duplicating ONLY deleted content is NOT flagged —
    // the content is forgotten (readOrEmpty: distinct fixture vectors
    // mean no emission dir may exist at all)
    VecDupStream.applyBatch(spark, state, out,
      vbatch(Seq(20L -> perturb(vs(1)._2))), 2L)
    val em2 = graft.streaming.LsmIndex.readOrEmpty(spark, out,
        graft.streaming.CurationStream.vecOutSchema)
      .filter(col("batch_id") === 2L).collect()
    assert(em2.isEmpty,
      s"arrival duplicating deleted content must not be flagged: ${em2.toSeq}")
    // and the verdict universe excludes the deleted ids
    val verdictIds = VecDupStream.keepDecisions(spark, state, out)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(!verdictIds.contains(2L) && !verdictIds.contains(6L),
      "deleted ids must leave keepDecisions")
    assert(verdictIds.contains(20L))
  }

  test("vec gate: compaction physically reclaims (bytes gone, tombs cleared, answers and stored count unchanged)") {
    val root = Files.createTempDirectory("graft-vdel-c").toString
    val state = s"$root/state"; val out = s"$root/out"
    val vs = (1L to 8L).map(i => i -> vec())
    VecDupStream.applyBatch(spark, state, out, vbatch(vs.take(4)), 0L)
    VecDupStream.applyBatch(spark, state, out, vbatch(vs.drop(4)), 1L)
    import spark.implicits._
    VecDupStream.deleteDocs(spark, state, Seq(3L, 7L).toDF("vec_id"), 0L)
    val probes = spark.createDataFrame(
      spark.sparkContext.parallelize(vs.map { case (id, v) =>
        Row(100L + id, perturb(v).toSeq) }),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("query_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)))))
    val want = rows(VecDupStream.queryTopK(spark, state, probes))
    val stBefore = graft.streaming.LsmIndex.Markers(state).stored(spark)

    VecDupStream.compactState(spark, state, 64L * 1024 * 1024)

    assert(spark.read.parquet(s"$state/vecs")
      .filter(col("vec_id").isin(3L, 7L)).count() == 0,
      "compaction must drop deleted vectors' rows")
    assert(spark.read.parquet(s"$state/buckets")
      .filter(col("vec_id").isin(3L, 7L)).count() == 0,
      "compaction must drop deleted vectors' bucket rows")
    assert(spark.read.parquet(s"$state/pq")
      .filter(col("vec_id").isin(3L, 7L)).count() == 0,
      "compaction must drop deleted vectors' PQ-code rows")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$state/tombs")),
      "compaction must clear the tombstones")
    assert(rows(VecDupStream.queryTopK(spark, state, probes)) == want,
      "reclaiming compaction changed ANN answers")
    assert(graft.streaming.LsmIndex.Markers(state).stored(spark) ==
      stBefore, "reclaiming compaction changed the stored count")
  }

  test("text gate: deleted docs stop flagging arrivals, leave verdicts; compaction reclaims") {
    val root = Files.createTempDirectory("graft-tdel").toString
    val state = s"$root/state"; val out = s"$root/out"
    def tbatch(rows0: Seq[(Long, String)]): DataFrame =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows0.map { case (id, t) =>
          Row(id, t, "s") }),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("text",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("source",
            org.apache.spark.sql.types.StringType))))
    val t1 = "the quick brown fox jumps over the lazy dog tonight"
    val t2 = "completely different words about spark and parquet files"
    NearDupStream.applyBatch(spark, state, out,
      tbatch(Seq(1L -> t1, 2L -> t2)), 0L)

    import spark.implicits._
    assert(NearDupStream.deleteDocs(spark, state,
      Seq(1L).toDF("doc_id"), deleteId = 0L) == 1L)
    assert(NearDupStream.deleteDocs(spark, state,
      Seq(1L).toDF("doc_id"), deleteId = 1L) == 0L,
      "cross-operation double delete must be a no-op")

    // an arrival duplicating the DELETED doc's text is kept silently
    NearDupStream.applyBatch(spark, state, out,
      tbatch(Seq(30L -> t1)), 1L)
    assert(graft.streaming.LsmIndex.readOrEmpty(spark, out,
        graft.streaming.CurationStream.txtOutSchema)
      .filter(col("batch_id") === 1L).collect().isEmpty,
      "arrival duplicating deleted content must not be flagged")
    val verdicts = NearDupStream.keepDecisions(spark, state, out)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(!verdicts.contains(1L), "deleted id must leave keepDecisions")
    assert(verdicts(30L) == "keep")

    NearDupStream.compactState(spark, state, 64L * 1024 * 1024)
    assert(spark.read.parquet(s"$state/docs")
      .filter(col("doc_id") === 1L).count() == 0,
      "compaction must drop the deleted doc's rows")
    assert(spark.read.parquet(s"$state/buckets")
      .filter(col("doc_id") === 1L).count() == 0,
      "compaction must drop the deleted doc's bucket rows")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$state/tombs")),
      "compaction must clear the tombstones")
    // post-reclaim: an arrival duplicating SURVIVING content still flags
    NearDupStream.applyBatch(spark, state, out,
      tbatch(Seq(40L -> t2)), 2L)
    val em2 = spark.read.parquet(out).filter(col("batch_id") === 2L)
      .select(col("new_id"), col("dup_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(em2 == Set((40L, 2L)),
      s"surviving content must still gate arrivals after reclaim: $em2")
  }

  test("expireThrough: the id watermark retires everything at or below it; later ingest unaffected") {
    val root = Files.createTempDirectory("graft-ttl").toString
    def prow(id: Long, t: String) = Row(id, t, vec().toSeq, "s")
    def pb(rows0: Seq[Row]) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows0), PipelineStream.rowSchema)
    val texts: Map[Long, String] = (1L to 14L).map(i =>
      i -> s"unique body number$i with words ${"w" * (i % 3 + 1).toInt}")
      .toMap
    PipelineStream.applyBatch(spark, root,
      pb((1L to 6L).map(i => prow(i, texts(i)))), 0L)
    PipelineStream.applyBatch(spark, root,
      pb((10L to 14L).map(i => prow(i, texts(i)))), 1L)

    assert(PipelineStream.expireThrough(spark, root, maxId = 6L,
      deleteId = 0L) == 6L)
    // idempotent under a different operation id: nothing left below
    assert(PipelineStream.expireThrough(spark, root, maxId = 6L,
      deleteId = 1L) == 0L)

    val qs = spark.createDataFrame(
      spark.sparkContext.parallelize((1L to 14L)
        .filter(texts.contains).map(i =>
          Row(900L + i, texts(i), null)).toSeq),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("query_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)))))
    val ids = PipelineStream.queryTopK(spark, root,
        qs.select(col("query_id"), col("text")))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(ids.forall(_ >= 10L),
      s"expired ids must never surface: $ids")
    assert((10L to 14L).toSet.subsetOf(ids),
      s"survivors must stay searchable: $ids")

    // later ingest above the high water folds and searches normally
    PipelineStream.applyBatch(spark, root,
      pb(Seq(prow(20L, "fresh follow-up document body"))), 2L)
    import spark.implicits._
    val q20 = Seq((990L, "fresh follow-up document body"))
      .toDF("query_id", "text")
    assert(PipelineStream.queryTopK(spark, root, q20)
      .select(col("doc_id")).collect().map(_.getLong(0)).contains(20L))
  }

  test("startDeletes: deletion requests arrive as a stream; replay is idempotent") {
    val root = Files.createTempDirectory("graft-delstream").toString
    val state = s"$root/state"; val src = s"$root/src"
    val ckpt = s"$root/ckpt"
    def prow(id: Long, t: String) = Row(id, t, vec().toSeq, "s")
    // 4 docs so the head-term cap (2·df ≤ n_docs) still admits df=1
    // terms after one delete leaves 3 survivors
    PipelineStream.applyBatch(spark, state,
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        prow(1L, "first target document alpha beta"),
        prow(2L, "second surviving document gamma delta"),
        prow(3L, "third filler text epsilon zeta"),
        prow(4L, "fourth filler text eta theta"))),
        PipelineStream.rowSchema), 0L)

    import spark.implicits._
    Seq(1L).toDF("doc_id").coalesce(1)
      .write.mode("append").parquet(src)
    PipelineStream.startDeletes(spark, src, state, ckpt)
      .awaitTermination()
    val q = Seq((900L, "target alpha beta"),
      (901L, "surviving gamma delta"))
      .toDF("query_id", "text")
    def hits() = PipelineStream.queryTopK(spark, state, q)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(!hits().contains(1L), "streamed delete must take effect")
    assert(hits().contains(2L))

    // restart with the same checkpoint: no new files, no-op
    PipelineStream.startDeletes(spark, src, state, ckpt)
      .awaitTermination()
    assert(!hits().contains(1L) && hits().contains(2L))

    // a second request naming the same id is a later deleteId: no-op,
    // stats unchanged
    val st = graft.streaming.LsmIndex.Markers(s"$state/ridx_state")
      .stored(spark)
    Seq(1L).toDF("doc_id").coalesce(1)
      .write.mode("append").parquet(src)
    PipelineStream.startDeletes(spark, src, state, ckpt)
      .awaitTermination()
    assert(graft.streaming.LsmIndex.Markers(s"$state/ridx_state")
      .stored(spark) == st,
      "re-requested delete changed the corpus stats")
    assert(!hits().contains(1L) && hits().contains(2L))
  }

  test("PipelineStream.delete forgets a doc across all three states; history stays") {
    val root = Files.createTempDirectory("graft-pdel").toString
    val v1 = vec(); val v2 = vec(); val v3 = vec()
    def prow(id: Long, t: String, v: Array[Double]) =
      Row(id, t, v.toSeq, "s")
    val batch = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        prow(1L, "alpha beta gamma delta epsilon zeta", v1),
        prow(2L, "one two three four five six seven", v2),
        // 3 duplicates 1's text → dropped by the text gate, kept_id=1
        prow(3L, "alpha beta gamma delta epsilon zeta", perturb(v1)),
        prow(4L, "totally unrelated content goes here now", v3))),
      PipelineStream.rowSchema)
    PipelineStream.applyBatch(spark, root, batch, 0L)

    import spark.implicits._
    // delete doc 1 — the KEPT representative
    assert(PipelineStream.delete(spark, root,
      Seq(1L).toDF("doc_id"), deleteId = 0L) == 1L)

    val qs = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(90L, "alpha beta gamma delta epsilon zeta", perturb(v1).toSeq),
        Row(91L, "one two three four five six seven", perturb(v2).toSeq))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("query_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)))))

    // no query face ever surfaces the forgotten doc
    val sparseIds = PipelineStream.queryTopK(spark, root,
        qs.select(col("query_id"), col("text")))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(!sparseIds.contains(1L), "BM25 surfaced a deleted doc")
    assert(sparseIds.contains(2L), "control doc must still rank")
    val phraseIds = PipelineStream.queryPhrase(spark, root,
        qs.select(col("query_id"), col("text")))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(!phraseIds.contains(1L), "phrase surfaced a deleted doc")
    val hybridIds = PipelineStream.hybridTopK(spark, root, qs)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(!hybridIds.contains(1L), "hybrid surfaced a deleted doc")
    assert(hybridIds.contains(2L), "control doc must still rank in hybrid")

    // history is NOT retracted: doc 3's drop verdict (against 1) stays
    val v3row = PipelineStream.verdicts(spark, root,
        Some(Seq(3L).toDF("doc_id")))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(v3row == Set((3L, "drop")),
      s"historical drop verdict must survive the delete: $v3row")
  }
}
