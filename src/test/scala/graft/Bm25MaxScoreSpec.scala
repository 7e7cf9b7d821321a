package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.CorpusOps

/** The exact-all-terms MaxScore face (bm25_full_topk): pruned ranking
  * must be indistinguishable from naive full scoring, the pruning must
  * be real (measured candidate volume), the fallback must trigger only
  * when the upper-bound proof genuinely fails — and stay exact when it
  * does.
  */
class Bm25MaxScoreSpec extends SparkSpecBase {

  private def docs(rows: Seq[(Long, String, String)]): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("source", StringType, nullable = false),
      StructField("text", StringType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (id, src, t) => Row(id, src, t) }, 2), schema)
  }

  /** Naive exact reference: score EVERY uncapped query term over the
    * full corpus, no candidate restriction — the definitional answer.
    */
  private def naiveAll(d: DataFrame): Seq[(Long, Int, Long, Long, Long)] = {
    val toks = d.filter(col("source") =!= "src0")
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stamp = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("totdl"))
    val q = d.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"),
        explode(array_distinct(split(lower(col("text")), " "))).as("term"))
    val scored = q.join(dfT, Seq("term")).crossJoin(broadcast(stamp))
      .filter(col("df") * 2 <= col("n_docs"))
      .join(tf, Seq("term")).join(dl, Seq("doc_id"))
      .withColumn("term_micro", expr(CorpusOps.bm25TermMicroExpr))
      .groupBy("query_id", "doc_id")
      .agg(sum("term_micro").as("score_micro"), count(lit(1)).as("n_terms"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("query_id", "rank", "doc_id", "score_micro", "n_terms")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq.sorted
  }

  private def faceRows(out: DataFrame): Seq[(Long, Int, Long, Long, Long)] =
    out.select("query_id", "rank", "doc_id", "score_micro", "n_terms")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq.sorted

  test("matches naive full scoring on the documents fixture, zero fallback") {
    val d = Tables.load(spark, sf, "documents")
    val (out, fb, cand, restricted) = CorpusOps.bm25FullParts(d)
    assert(faceRows(out) == naiveAll(d))
    assert(fb.count() == 0,
      "the natural corpus must not trip the upper-bound fallback")
    // pruning is real: the candidate universe is far below queries x corpus
    val nq = d.filter(col("source") === "src0").count()
    val nTrain = d.filter(col("source") =!= "src0").count()
    val candPairs = cand.count()
    assert(candPairs < nq * nTrain / 2,
      s"candidates $candPairs must be well under queries*corpus ${nq * nTrain}")
    assert(restricted.count() == cand.count(),
      "scored pairs = candidate pairs (one scored row per candidate)")
  }

  test("adversarial corpus trips the fallback and stays exact") {
    // Query holds 4 terms: rare1 (df=1), rare2 (df=1), rare3 (df=2,
    // term-asc tie-break) are essential; "zmid" (df=2 but after rare3
    // in the total order) is non-essential. The zmid-only docs carry
    // huge tf while the rare3 docs are LONG (low dl-normalized score),
    // so ub(zmid) exceeds the k-th candidate score -> the proof
    // obligation fails -> per-query fallback, whose unrestricted
    // ranking must surface the zmid doc the candidate universe missed.
    val midSpam = "zmid " * 40
    val pad = (0 until 12).map(i => s"p$i").mkString(" ")
    val corpus = Seq[(Long, String, String)](
      (1L, "train", "rare1 filler0"),
      (2L, "train", "rare2 filler1"),
      (3L, "train", s"rare3 $pad"),
      (4L, "train", s"rare3 $pad"),
      (5L, "train", midSpam.trim),              // zmid-only, huge tf
      (6L, "train", midSpam.trim + " filler4"),
      (7L, "train", "filler5 filler6"),
      (8L, "train", "filler7 filler8"),
      (9L, "train", "filler9 fillerA"),
      (100L, "src0", "rare1 rare2 rare3 zmid"))
    val d = docs(corpus)
    val (out, fb, _, _) = CorpusOps.bm25FullParts(d)
    assert(fb.count() == 1, "the bound must fail for the spammed query")
    assert(faceRows(out) == naiveAll(d))
    // the mid-spam doc must actually rank (proof the fallback mattered):
    // essential candidates are only docs 1-4
    val rankedDocs = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rankedDocs.contains(5L),
      "unrestricted fallback must surface the non-candidate top doc")
  }

  test("well-separated multi-term queries prune without fallback") {
    // 5-term queries over a corpus where rare terms dominate scoring:
    // non-essential bounds stay below the k-th candidate score.
    val corpus: Seq[(Long, String, String)] =
      (0 until 40).map { i =>
        (i.toLong, "train",
          s"unique$i shared${i % 4} shared${(i + 1) % 4} pad padd")
      } :+ ((900L, "src0", "unique3 unique7 unique11 shared1 shared2"))
    val d = docs(corpus)
    val (out, fb, _, _) = CorpusOps.bm25FullParts(d)
    assert(fb.count() == 0, "separated corpus must not fall back")
    assert(faceRows(out) == naiveAll(d))
  }

  private def buildState(d: DataFrame): String = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-maxscore").toString
    graft.streaming.IndexStream.initState(spark, root, expectedDocs = 100L)
    val train = d.filter(col("source") =!= "src0")
      .select(col("doc_id"), col("text"))
    graft.streaming.IndexStream.applyBatch(spark, root,
      train.filter(pmod(col("doc_id"), lit(2)) === 0), 0L)
    graft.streaming.IndexStream.applyBatch(spark, root,
      train.filter(pmod(col("doc_id"), lit(2)) === 1), 1L)
    root
  }

  private def queriesOf(d: DataFrame): DataFrame =
    d.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"), col("text"))

  test("index face (queryTopKAll) matches naive over a 2-generation state") {
    // the separated corpus: prunes with no fallback on the batch face;
    // the index face must agree with naive either way
    val corpus: Seq[(Long, String, String)] =
      (0 until 40).map { i =>
        (i.toLong, "train",
          s"unique$i shared${i % 4} shared${(i + 1) % 4} pad padd")
      } :+ ((900L, "src0", "unique3 unique7 unique11 shared1 shared2"))
    val d = docs(corpus)
    val root = buildState(d)
    val got = graft.streaming.IndexStream
      .queryTopKAll(spark, root, queriesOf(d))
    assert(faceRows(got) == naiveAll(d))
    spark.catalog.clearCache()
  }

  test("index face prunes exactly through the adversarial fallback") {
    val midSpam = "zmid " * 40
    val pad = (0 until 12).map(i => s"p$i").mkString(" ")
    val corpus = Seq[(Long, String, String)](
      (1L, "train", "rare1 filler0"),
      (2L, "train", "rare2 filler1"),
      (3L, "train", s"rare3 $pad"),
      (4L, "train", s"rare3 $pad"),
      (5L, "train", midSpam.trim),
      (6L, "train", midSpam.trim + " filler4"),
      (7L, "train", "filler5 filler6"),
      (8L, "train", "filler7 filler8"),
      (9L, "train", "filler9 fillerA"),
      (100L, "src0", "rare1 rare2 rare3 zmid"))
    val d = docs(corpus)
    val root = buildState(d)
    val got = graft.streaming.IndexStream
      .queryTopKAll(spark, root, queriesOf(d))
    val rows = faceRows(got)
    assert(rows == naiveAll(d))
    assert(rows.map(_._3).contains(5L),
      "the non-candidate zmid doc must rank via the fallback")
    spark.catalog.clearCache()
  }

  test("stale impact bound after a delete stays an upper bound (exact answers)") {
    // delete the doc that CARRIES a term's max_tf: the stored bound is
    // now stale-high, which may cost a fallback but never exactness
    val corpus: Seq[(Long, String, String)] =
      (0 until 30).map { i =>
        (i.toLong, "train",
          s"unique$i shared${i % 4} shared${(i + 1) % 4} pad padd")
      } ++ Seq(
        (50L, "train", ("shared1 " * 20).trim), // max_tf carrier for shared1
        (900L, "src0", "unique3 unique7 shared1 shared2"))
    val d = docs(corpus.toSeq)
    val root = buildState(d)
    val doomed = spark.range(50, 51).select(col("id").as("doc_id"))
    val n = graft.streaming.IndexStream.deleteDocs(spark, root, doomed, 0L)
    assert(n == 1L)
    spark.catalog.clearCache()
    val got = graft.streaming.IndexStream
      .queryTopKAll(spark, root, queriesOf(d))
    val survivors = d.filter(col("doc_id") =!= 50L)
    assert(faceRows(got) == naiveAll(survivors))
    spark.catalog.clearCache()
  }

  test("filtered full-term retrieval: allow set re-ranks under whole-corpus stats") {
    val corpus: Seq[(Long, String, String)] =
      (0 until 40).map { i =>
        (i.toLong, "train",
          s"unique$i shared${i % 4} shared${(i + 1) % 4} pad padd")
      } :+ ((900L, "src0", "unique3 unique7 unique11 shared1 shared2"))
    val d = docs(corpus)
    val root = buildState(d)
    // allow only even doc_ids; expected = naive full scoring with the
    // predicate UNDER the rank window (stats whole-corpus)
    val allow = spark.range(0, 40, 2).select(col("id").as("doc_id"))
    val got = graft.streaming.IndexStream
      .queryTopKAll(spark, root, queriesOf(d), allow = Some(allow))
    val unfiltered = graft.streaming.IndexStream
      .queryTopKAll(spark, root, queriesOf(d))
    assert(faceRows(got).forall(t => t._3 % 2 == 0),
      "only allowed docs may rank")
    // scores of surviving docs are the unfiltered scores (whole-corpus
    // stats): every (doc, score) pair in the filtered answer that also
    // ranked unfiltered must carry the identical score
    val unf = faceRows(unfiltered).map(t => (t._1, t._3) -> t._4).toMap
    assert(faceRows(got).forall { t =>
      unf.get((t._1, t._3)).forall(_ == t._4) })
    spark.catalog.clearCache()
  }

  test("default bm25Ctes SQL is unchanged by the allTerms refactor") {
    val sql = CorpusOps.bm25Ctes("train_rel", "query_rel")
    assert(sql.contains("WHERE trank <= 3"))
    assert(sql.contains("row_number() OVER (PARTITION BY q.query_id"))
    val all = CorpusOps.bm25Ctes("train_rel", "query_rel", allTerms = true)
    assert(!all.contains("trank"))
    assert(all.contains("WHERE 2 * d.df <= st.n_docs"))
  }
}
