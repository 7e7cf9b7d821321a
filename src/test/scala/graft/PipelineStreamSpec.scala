package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.streaming.{CurationStream, PipelineStream}

/** The composed ingestion pipeline (round 9): firehose → both dedup
  * gates → retrieval index of the KEPT corpus, one stream. Pins the
  * property the composition exists for — retrieval can never surface
  * a curation-rejected doc, and a rejected doc's vocabulary never
  * enters the index — plus re-delivery idempotence across all three
  * states and restart no-op.
  */
class PipelineStreamSpec extends SparkSpecBase {

  private val t1 =
    "the quick brown fox jumps over the lazy dog near the quiet river bank today"
  private val t3 =
    "completely different content about database engines and query planners in distributed systems"
  private val t5 =
    "numbers and tables fill the xzledger while auditors check the totals twice"
  private val t6 =
    "fresh xzmaterial about telescopes and the xznebula survey results"

  private def unit(axis: Int): Seq[Double] =
    (0 until 64).map(i => if (i == axis) 1.0 else 0.0)

  private def writeBatch(dir: String,
      rows: Seq[(Long, String, Seq[Double])]): Unit =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (id, t, v) => Row(id, t, v, "s") }),
      PipelineStream.rowSchema)
      .coalesce(1).write.mode("append").parquet(dir)

  private def queriesOf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("query_id", "text")
  }

  test("phrase retrieval over the kept corpus: a dropped doc never phrase-matches, even when it contains the phrase") {
    val root = Files.createTempDirectory("graft-pipe-phrase").toString
    val src = s"$root/src"; val state = s"$root/state"
    val ckpt = s"$root/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(src))

    writeBatch(src, Seq((1L, t1, unit(0)), (3L, t3, unit(5))))
    PipelineStream.start(spark, src, state, ckpt).awaitTermination()
    // doc 10: a text near-dup of doc 1 (dropped) that ALSO contains
    // both the kept phrase AND a unique trailing bigram
    writeBatch(src, Seq(
      (10L, t1 + " zqalpha zqbeta", unit(1)),
      (12L, t6, unit(9))))
    PipelineStream.start(spark, src, state, ckpt).awaitTermination()

    // the phrase "quick brown" occurs in kept doc 1 AND dropped doc
    // 10 — only the kept doc may surface
    val hits = PipelineStream.queryPhrase(spark, state,
      queriesOf(900L -> "quick brown query"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(hits == Set(1L),
      s"phrase must match exactly the kept occurrence: $hits")
    // the dropped doc's unique bigram is unsearchable
    assert(PipelineStream.queryPhrase(spark, state,
      queriesOf(901L -> "zqalpha zqbeta query")).count() == 0,
      "a curation-rejected doc's phrase leaked into the index")
    // a kept doc's own phrase retrieves it
    assert(PipelineStream.queryPhrase(spark, state,
      queriesOf(902L -> "fresh xzmaterial query"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet == Set(12L))
  }

  test("dropped docs never reach the index: their vocabulary is unsearchable, kept docs retrieve") {
    val root = Files.createTempDirectory("graft-pipeline").toString
    val src = s"$root/src"; val state = s"$root/state"
    val ckpt = s"$root/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(src))

    // batch 1: two distinct keepers
    writeBatch(src, Seq(
      (1L, t1, unit(0)),
      (3L, t3, unit(5))))
    PipelineStream.start(spark, src, state, ckpt).awaitTermination()

    // batch 2: a text near-dup of doc 1 (drop), a PARAPHRASE of doc 3
    // (same embedding, disjoint words — the vector gate's catch; its
    // unique word 'xzledger' must NOT become searchable), and a fresh
    // keeper with unique words
    writeBatch(src, Seq(
      (10L, t1 + " again", unit(1)),
      (11L, t5, unit(5)),
      (12L, t6, unit(9))))
    PipelineStream.start(spark, src, state, ckpt).awaitTermination()

    val v = PipelineStream.verdicts(spark, state).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v == Map(1L -> "keep", 3L -> "keep", 10L -> "drop",
      11L -> "drop", 12L -> "keep"), s"verdicts: $v")

    // the kept corpus is searchable...
    val hits = PipelineStream.queryTopK(spark, state,
      queriesOf(900L -> "xzmaterial xznebula unseenz"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(hits == Set(12L), s"fresh keeper must retrieve: $hits")
    // ...and the vector-dropped doc's unique vocabulary is NOT — the
    // paraphrase was rejected before indexing, so its words have no
    // postings (doc 3, the kept representative, shares none of them)
    val ghost = PipelineStream.queryTopK(spark, state,
      queriesOf(901L -> "xzledger unseenq unseenr"))
    assert(ghost.count() == 0,
      "a curation-rejected doc's vocabulary leaked into the index")
    // the indexed universe is exactly the keep set
    val indexed = spark.read
      .parquet(s"$state/ridx_state/docs")
      .select(col("doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(indexed == Set(1L, 3L, 12L), s"indexed: $indexed")

    // re-delivery of batch 2 (same id): all three states converge
    val batch2 = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(10L, t1 + " again", unit(1), "s"),
        Row(11L, t5, unit(5), "s"),
        Row(12L, t6, unit(9), "s"))),
      PipelineStream.rowSchema)
    val postingsBefore =
      spark.read.parquet(s"$state/ridx_state/postings").count()
    PipelineStream.applyBatch(spark, state, batch2, batchId = 1L)
    assert(spark.read.parquet(s"$state/ridx_state/postings").count() ==
      postingsBefore, "re-delivered batch changed the postings")
    assert(PipelineStream.verdicts(spark, state).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap == v,
      "re-delivered batch changed the verdicts")

    // restart with no new files: nothing re-folds
    PipelineStream.start(spark, src, state, ckpt).awaitTermination()
    assert(spark.read.parquet(s"$state/ridx_state/postings").count() ==
      postingsBefore, "an empty restart re-folded a batch")

    // maintenance fans out to all three states; answers hold
    PipelineStream.compactIfDue(spark, state, targetFileBytes = 1L << 20,
      maxGen = 1)
    assert(PipelineStream.queryTopK(spark, state,
      queriesOf(902L -> "xzmaterial xznebula unseenz"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet == Set(12L),
      "compaction changed retrieval over the kept corpus")

    // STREAMING HYBRID over the same LSM state: a query whose words
    // match doc 12 and whose embedding matches doc 3 must surface both
    // (each leg contributes a doc the other can't see), and the
    // curation-dropped doc 11 — whose embedding the query matches
    // EXACTLY as well — must never appear (the dense leg excludes the
    // drop set before ranking)
    import spark.implicits._
    val hq = Seq((903L, "xzmaterial xznebula unseenz", unit(5)))
      .toDF("query_id", "text", "embedding")
    val hybrid = PipelineStream.hybridTopK(spark, state, hq)
      .collect().map(r => (r.getLong(2), r.getInt(4))).toSeq
    val byDoc = hybrid.toMap
    assert(byDoc.contains(12L) && byDoc.contains(3L),
      s"hybrid must surface the sparse-only and dense-only docs: $hybrid")
    assert(!byDoc.contains(11L),
      s"hybrid surfaced a curation-dropped doc: $hybrid")

    // THREE-LEG hybrid (round 11): a query whose leading bigram sits
    // ADJACENT in doc 12 ("xzmaterial about" in t6), whose words match
    // it, and whose embedding matches it gets all three votes — n_legs
    // = 3 — and the curation-dropped doc 11 still never appears (the
    // prox leg reads the kept index, which never held it)
    val pq = Seq((906L, "xzmaterial about telescopes", unit(9)))
      .toDF("query_id", "text", "embedding")
    val proxed = PipelineStream.hybridProxTopK(spark, state, pq)
      .collect().map(r => (r.getLong(2), r.getInt(4))).toMap
    assert(proxed.get(12L).contains(3),
      s"doc 12 must carry all three legs' votes: $proxed")
    assert(!proxed.contains(11L),
      s"three-leg hybrid surfaced a curation-dropped doc: $proxed")
    // two-leg and three-leg fusion agree where the prox leg abstains:
    // a query with no ordered co-occurrence anywhere ranks identically
    // under both (the third leg contributes 0 to every candidate)
    val nq = Seq((907L, "unseenz xzmaterial", unit(5)))
      .toDF("query_id", "text", "embedding")
    val two = PipelineStream.hybridTopK(spark, state, nq)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    val three = PipelineStream.hybridProxTopK(spark, state, nq)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(two == three,
      s"prox-abstaining fusion must equal two-leg fusion: $two vs $three")

    // one-legged queries degrade instead of erroring: a null text
    // answers from the dense leg alone, a null embedding from the
    // sparse leg alone (each leg filters its own nulls; the fusion is
    // a full outer join)
    val oneLegged = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(904L, null, unit(0), "q"),
        Row(905L, t6, null, "q"))),
      PipelineStream.rowSchema)
      .select(col("doc_id").as("query_id"), col("text"), col("embedding"))
    val legged = PipelineStream.hybridTopK(spark, state, oneLegged)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getInt(4)))
      .toMap
    assert(legged.get((904L, 1L)).contains(1),
      s"null-text query must still answer from the dense leg: $legged")
    assert(legged.get((905L, 12L)).contains(1),
      s"null-embedding query must still answer from the sparse leg: $legged")
  }

  test("fielded corpus through the composed pipeline (round 13): titles reach the v7 fold; a dropped doc's title never searches") {
    import org.apache.spark.sql.types._
    val root = Files.createTempDirectory("graft-pipe-titled").toString
    val src = s"$root/src"; val state = s"$root/state"
    val ckpt = s"$root/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(src))
    def writeTitled(rows: Seq[(Long, String, Seq[Double], String)]): Unit =
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          rows.map { case (id, t, v, ti) => Row(id, t, v, "s", ti) }),
        PipelineStream.titledRowSchema)
        .coalesce(1).write.mode("append").parquet(src)
    writeTitled(Seq(
      (1L, t1, unit(0), "xtriver report"),
      (3L, t3, unit(5), "xtengines digest")))
    PipelineStream.start(spark, src, state, ckpt,
      sourceSchema = PipelineStream.titledRowSchema).awaitTermination()
    // doc 10: a text near-dup of doc 1 (dropped by the gate) whose
    // TITLE carries a unique term — it must never become searchable
    writeTitled(Seq(
      (10L, t1 + " zqgamma", unit(1), "xtleaked headline"),
      (12L, t6, unit(9), "xtsurvey notes")))
    PipelineStream.start(spark, src, state, ckpt,
      sourceSchema = PipelineStream.titledRowSchema).awaitTermination()
    // fielded retrieval over the kept corpus equals the batch face
    // over the same kept titled docs (shared definitions end to end)
    val keptRows = Seq(
      (1L, "xtriver report", t1, "src1"),
      (3L, "xtengines digest", t3, "src1"),
      (12L, "xtsurvey notes", t6, "src1"),
      (900L, "", "xtriver totals query", "src0"))
    val keptDf = spark.createDataFrame(
      spark.sparkContext.parallelize(keptRows.map {
        case (id, ti, t, s) => Row(id, ti, t, s) }),
      StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("title", StringType, nullable = false),
        StructField("text", StringType, nullable = false),
        StructField("source", StringType, nullable = false))))
    val want = graft.operators.CorpusOps.bm25fTopkOn(keptDf)
      .select("query_id", "rank", "doc_id", "score_micro", "n_terms")
      .collect().map(_.toSeq).toSet
    val got = PipelineStream.queryFielded(spark, state,
        queriesOf(900L -> "xtriver totals query"))
      .select("query_id", "rank", "doc_id", "score_micro", "n_terms")
      .collect().map(_.toSeq).toSet
    assert(want.nonEmpty && got == want,
      s"pipeline fielded face must equal the titled batch face: " +
        s"$got vs $want")
    // the title term ranks its doc (a title hit is in the index)
    assert(got.exists(r => r(2) == 1L),
      s"the titled doc must rank for its title term: $got")
    // the DROPPED doc's unique title term is unsearchable (probe
    // terms chosen fully off-vocabulary except the leaked one)
    assert(PipelineStream.queryTopK(spark, state,
      queriesOf(901L -> "xtleaked xtunseen xtnovocab")).count() == 0,
      "a curation-rejected doc's TITLE leaked into the index")
  }
}
