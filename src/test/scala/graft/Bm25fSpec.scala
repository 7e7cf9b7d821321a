package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.CorpusOps

/** Fielded retrieval (bm25f_topk): the simple-BM25F blend — weighted
  * tf/dl through ONE shared saturation — must rank a title hit above
  * an identical body hit, and reduce to something the unfielded face
  * ties on.
  */
class Bm25fSpec extends SparkSpecBase {

  private def docs(rows: Seq[(Long, String, String)]): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = false),
      StructField("source", StringType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (id, t, s) => Row(id, t, s) }, 2), schema)
  }

  test("a title hit outranks the same hit in the body") {
    // identical 8-token docs; "rare" sits at pos 0 (title) in doc 1,
    // pos 7 (body) in doc 2 -> same plain-BM25 score (tie broken by
    // doc_id), but BM25F weights the title hit double
    val d = docs(Seq(
      (100L, "rare off1 off2", "src0"),
      (1L, "rare pad pad pad pad fill fill fill", "src1"),
      (2L, "pad pad pad pad pad fill fill rare", "src1"),
      (3L, "pad fill pad fill pad fill pad fill", "src1"),
      (4L, "fill pad fill pad fill pad fill pad", "src1")))
    val got = CorpusOps.bm25fTopkOn(d)
      .select("rank", "doc_id", "score_micro").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.map(_._2).toSeq == Seq(1L, 2L),
      s"title hit must outrank the body hit: ${got.toSeq}")
    assert(got(0)._3 > got(1)._3,
      s"BM25F must separate the scores: ${got.toSeq}")
    // the unfielded face ties them (identical tf/dl/df)
    val plain = CorpusOps.bm25TopkOn(d)
      .select("doc_id", "score_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(plain(1L) == plain(2L),
      s"fixture broken: plain BM25 should tie docs 1 and 2: $plain")
  }

  test("index face is bit-identical to the batch face, with no fielded state") {
    import java.nio.file.Files
    import graft.streaming.IndexStream
    val d = docs(Seq(
      (100L, "rare off1 off2", "src0"),
      (1L, "rare pad pad pad pad fill fill fill", "src1"),
      (2L, "pad pad pad pad pad fill fill rare", "src1"),
      (3L, "pad fill pad fill pad fill pad fill", "src1"),
      (4L, "fill pad fill pad fill pad fill pad", "src1")))
    val root = Files.createTempDirectory("graft-bm25f").toString
    val state = s"$root/state"
    // two generations so the marker sum and positions both span folds
    IndexStream.applyBatch(spark, state,
      d.filter(col("source") =!= "src0")
        .filter(col("doc_id") <= 2L), 0L)
    IndexStream.applyBatch(spark, state,
      d.filter(col("source") =!= "src0")
        .filter(col("doc_id") > 2L), 1L)
    val q = d.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"), col("text"))
    val batch = CorpusOps.bm25fTopkOn(d)
      .select("query_id", "rank", "doc_id", "score_micro", "n_terms")
      .collect().map(_.toSeq).toSet
    val index = IndexStream.queryFielded(spark, state, q)
      .select("query_id", "rank", "doc_id", "score_micro", "n_terms")
      .collect().map(_.toSeq).toSet
    assert(batch == index, "fielded index face must equal the batch face")
    assert(batch.nonEmpty, "fixture must produce matches")
  }

  test("fielded scores over survivors are exact after a delete") {
    import java.nio.file.Files
    import spark.implicits._
    import graft.streaming.IndexStream
    val all = Seq(
      (100L, "rare off1 off2", "src0"),
      (1L, "rare pad pad pad pad fill fill fill", "src1"),
      (2L, "pad pad pad pad pad fill fill rare", "src1"),
      (3L, "pad fill pad fill pad fill pad fill", "src1"),
      (4L, "fill pad fill pad fill pad fill pad", "src1"),
      (5L, "rare fill pad pad pad pad", "src1"))
    val root = Files.createTempDirectory("graft-bm25f-del").toString
    val state = s"$root/state"
    IndexStream.applyBatch(spark, state,
      docs(all).filter(col("source") =!= "src0"), 0L)
    IndexStream.deleteDocs(spark, state, Seq(5L).toDF("doc_id"), 0L)
    val q = docs(all).filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"), col("text"))
    val got = IndexStream.queryFielded(spark, state, q)
      .select("query_id", "rank", "doc_id", "score_micro", "n_terms")
      .collect().map(_.toSeq).toSet
    // survivors-only reference: the batch face over the corpus minus
    // doc 5 (the delete subtracts its tot_ttl share too — wTot exact)
    val want = CorpusOps.bm25fTopkOn(docs(all.filterNot(_._1 == 5L)))
      .select("query_id", "rank", "doc_id", "score_micro", "n_terms")
      .collect().map(_.toSeq).toSet
    assert(got == want,
      "post-delete fielded scores must equal a fresh survivors-only index")
  }

  private def fieldedDocs(
      rows: Seq[(Long, String, String, String)]): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("title", StringType, nullable = false),
      StructField("text", StringType, nullable = false),
      StructField("source", StringType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (id, ti, t, s) => Row(id, ti, t, s) }, 2), schema)
  }

  test("schema-driven fields: a real title column IS the title field; the positional convention is its degenerate case") {
    // titles of exactly titleTokens (5) tokens: the schema-driven
    // shape must rank bit-identically to the positional shape over
    // the concatenated text — the convention is the degenerate case
    val fielded = fieldedDocs(Seq(
      (100L, "zz zz zz zz zz", "rare off1 off2", "src0"),
      (1L, "rare pad pad pad pad", "fill fill fill", "src1"),
      (2L, "pad pad pad pad pad", "fill fill rare", "src1"),
      (3L, "pad fill pad fill pad", "fill pad fill", "src1"),
      (4L, "fill pad fill pad fill", "pad fill pad", "src1")))
    val positional = docs(Seq(
      (100L, "rare off1 off2", "src0"),
      (1L, "rare pad pad pad pad fill fill fill", "src1"),
      (2L, "pad pad pad pad pad fill fill rare", "src1"),
      (3L, "pad fill pad fill pad fill pad fill", "src1"),
      (4L, "fill pad fill pad fill pad fill pad", "src1")))
    val gotF = CorpusOps.bm25fTopkOn(fielded)
      .select("query_id", "rank", "doc_id", "score_micro", "n_terms")
      .collect().map(_.toSeq).toSet
    val gotP = CorpusOps.bm25fTopkOn(positional)
      .select("query_id", "rank", "doc_id", "score_micro", "n_terms")
      .collect().map(_.toSeq).toSet
    assert(gotF.nonEmpty && gotF == gotP,
      s"5-token titles must reduce to the positional convention: " +
        s"$gotF vs $gotP")

    // titles of OTHER lengths separate the shapes: only the title's
    // own tokens weigh double, never "the first five of the concat" —
    // doc 1 holds rare in a 2-token TITLE (w=2), doc 2 in the BODY
    // (w=1); positionally (concat) both would sit under pos 5 and tie
    val short = fieldedDocs(Seq(
      (100L, "zz zz", "rare off1 off2", "src0"),
      (1L, "rare tt", "pad pad pad pad pad pad", "src1"),
      (2L, "tt tt", "rare pad pad pad pad pad", "src1"),
      (3L, "tt pad", "fill pad fill pad fill pad", "src1"),
      (4L, "pad tt", "pad fill pad fill pad fill", "src1")))
    val gotS = CorpusOps.bm25fTopkOn(short)
      .select("rank", "doc_id", "score_micro").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(gotS.map(_._2).toSeq == Seq(1L, 2L),
      s"title hit must outrank the body hit: ${gotS.toSeq}")
    assert(gotS(0)._3 > gotS(1)._3,
      s"2-token title must weigh as a field, not as position<5: " +
        s"${gotS.toSeq}")
  }

  test("layout v7 fielded state: a titled fold stores the field boundary; index = batch across two generations, a delete, and a redomain rebuild") {
    import java.nio.file.Files
    import spark.implicits._
    import graft.streaming.IndexStream
    // titles of VARYING length (1-3 tokens) — never the degenerate
    // 5-token convention, so a positional reading of the stored
    // stream would mis-weight every document
    val all = Seq(
      (100L, "zz tt", "rare off1 off2", "src0"),
      (1L, "rare tt", "pad pad pad pad pad pad", "src1"),
      (2L, "tt tt tt", "rare pad pad pad pad pad", "src1"),
      (3L, "tt", "fill pad fill pad fill pad", "src1"),
      (4L, "pad tt fill", "pad fill pad fill pad fill", "src1"),
      (5L, "rare rare", "fill fill", "src1"),
      // filler keeps df(rare) = 3 of 6 under the head-term cap
      (6L, "pad", "fill fill pad tt", "src1"))
    val d = fieldedDocs(all)
    val root = Files.createTempDirectory("graft-bm25f-v7").toString
    val state = s"$root/state"
    // small initial dir domain so the redomain below genuinely grows
    IndexStream.initState(spark, state, 100L)
    IndexStream.applyBatch(spark, state,
      d.filter(col("source") =!= "src0").filter(col("doc_id") <= 2L), 0L)
    IndexStream.applyBatch(spark, state,
      d.filter(col("source") =!= "src0").filter(col("doc_id") > 2L), 1L)
    val q = d.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"), col("text"))
    val cols = Seq("query_id", "rank", "doc_id", "score_micro", "n_terms")
    def got(): Set[Seq[Any]] =
      IndexStream.queryFielded(spark, state, q)
        .select(cols.head, cols.tail: _*)
        .collect().map(_.toSeq).toSet
    def want(rows: Seq[(Long, String, String, String)]): Set[Seq[Any]] =
      CorpusOps.bm25fTopkOn(fieldedDocs(rows))
        .select(cols.head, cols.tail: _*)
        .collect().map(_.toSeq).toSet
    val batch = want(all)
    assert(batch.nonEmpty && got() == batch,
      "fielded index face must equal the titled batch face")
    // the UNFIELDED faces see the one title-first token stream: the
    // index's plain BM25 equals the batch face over the concatenation
    val concat = docs(all.map { case (id, ti, t, s) =>
      (id, s"$ti $t", s) })
    val plainIdx = IndexStream.queryTopK(spark, state, q)
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    val plainBatch = CorpusOps.bm25TopkOn(concat)
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    assert(plainIdx == plainBatch && plainBatch.nonEmpty,
      "unfielded retrieval over a titled fold must score the " +
        "title ++ body stream")
    // delete a TITLE-HEAVY doc: the stored boundary (not the
    // positional convention) must be what the negative marker
    // subtracts, or wTot skews every surviving score
    IndexStream.deleteDocs(spark, state, Seq(5L).toDF("doc_id"), 0L)
    val survivors = want(all.filterNot(_._1 == 5L))
    assert(got() == survivors,
      "post-delete fielded scores must equal a fresh titled " +
        "survivors-only corpus")
    // a redomain REBUILD re-derives postings from lt — the field
    // boundary cannot re-derive from the concatenated stream, so the
    // rebuild must carry the STORED ttl through
    assert(IndexStream.redomainIfDue(spark, state,
        expectedDocs = Some(1L << 22)),
      "fixture must force a redomain rebuild")
    assert(got() == survivors,
      "the rebuild must carry the stored field boundary")
  }

  test("length normalization runs on the WEIGHTED length") {
    // both docs hold "rare" once in the BODY (equal wtf); doc 1's
    // weighted length is smaller -> higher score
    val d = docs(Seq(
      (100L, "rare off1 off2", "src0"),
      (1L, "pad pad pad pad pad rare", "src1"),
      (2L, "pad pad pad pad pad rare fill", "src1"),
      (3L, "pad fill pad fill pad fill", "src1"),
      (4L, "fill pad fill pad fill pad", "src1")))
    val got = CorpusOps.bm25fTopkOn(d)
      .select("rank", "doc_id").collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    assert(got.map(_._2).toSeq == Seq(1L, 2L),
      s"shorter doc must rank first under length normalization: " +
        s"${got.toSeq}")
  }
}
