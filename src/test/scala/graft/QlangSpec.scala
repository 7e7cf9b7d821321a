package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.CorpusOps
import graft.streaming.IndexStream

/** The COMPOSED query language (round 15): one string carries term
  * clauses (field tags, boosts) AND a slop-tagged quoted run; the
  * term clauses score through the field-local-df BM25F leg, the run
  * through the slop-capped fielded proximity leg, fused by the shared
  * integer RRF tail. The sf0.01 gate rows never produce a two-leg
  * agreement (the legs rank different documents there), so this spec
  * pins the 2-leg fusion arithmetic on a constructed corpus, plus the
  * one-string-two-parsers split and index ≡ batch.
  */
class QlangSpec extends SparkSpecBase {

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

  private def queriesOf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("query_id", "text")
  }

  // doc 1 holds BOTH signals: rare term `rr` in its body AND the
  // phrase `aa bb` adjacent in its title. doc 2 holds only the term,
  // doc 3 only the title phrase. Filler docs keep n_docs high enough
  // that rr/aa/bb pass the 2·df ≤ n stopword cap.
  private val train = Seq(
    (1L, "aa bb", "rr pad pad", "src1"),
    (2L, "tt tt", "rr pad qq", "src1"),
    (3L, "aa bb", "pad pad qq", "src1")) ++
    (4L to 12L).map(i => (i, s"t$i t$i", s"w$i w$i w$i", "src1"))

  test("one string parses into both clause families: run words never become term clauses, tags and slop both read") {
    val q = queriesOf(Seq((100L, "rr title:\"aa bb\"~1 qq^2")))
    val trips = CorpusOps.parseFieldedQuery(q).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(trips == Set(("rr", "any", 1L), ("qq", "any", 2L)),
      s"term clauses must be the out-of-run tokens only: $trips")
    val runs = CorpusOps.parseTaggedPhrase(q).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(runs == Set(("aa bb", "title", 1L)),
      s"the quoted run must parse with field and slop: $runs")
  }

  test("two-leg agreement fuses with the exact integer RRF sum; single-leg docs keep their one-leg grade") {
    val d = fieldedDocs((100L, "zz zz", "ignored", "src0") +: train)
    val q = queriesOf(Seq((100L, "rr title:\"aa bb\"~0")))
    val got = CorpusOps.qlangOn(d, q)
      .select("doc_id", "rrf_micro", "n_legs").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    // term leg ranks docs holding rr: 1 and 2 (tie → doc_id asc, so
    // doc 1 rank 1, doc 2 rank 2... their dls differ via titles; what
    // is pinned EXACTLY here is the fusion arithmetic given the legs'
    // ranks, recomputed below from the legs themselves
    val sparse = CorpusOps.bm25fScoredOn(d,
        CorpusOps.parseFieldedQuery(q), fieldLocalDf = true)
      .select("doc_id", "rank").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val prox = CorpusOps.nearQtagMatchOn(d, q, len = 2)
      .select("doc_id", "rank").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(sparse.contains(1L) && prox.contains(1L),
      s"fixture must put doc 1 on BOTH legs: sparse=$sparse prox=$prox")
    def rrf(r: Option[Int]): Long =
      r.map(x => 1000000L / (60L + x)).getOrElse(0L)
    val want = (sparse.keySet ++ prox.keySet).map { id =>
      id -> ((rrf(sparse.get(id)) + rrf(prox.get(id)),
        Seq(sparse.get(id), prox.get(id)).flatten.size))
    }.toMap
    val wantTop = want.toSeq
      .sortBy { case (id, (g, _)) => (-g, id) }.take(3).toMap
    assert(got == wantTop,
      s"fusion must be the exact integer RRF over the legs' ranks: " +
        s"$got vs $wantTop")
    assert(got(1L)._2 == 2,
      s"the both-signals doc must fuse with n_legs = 2: $got")
  }

  test("index face ≡ batch face over the shared state") {
    val d = fieldedDocs((100L, "zz zz", "ignored", "src0") +: train)
    val root = Files.createTempDirectory("graft-qlang").toString
    val state = s"$root/state"
    IndexStream.applyBatch(spark, state,
      d.filter(col("source") =!= "src0").filter(col("doc_id") <= 6L), 0L)
    IndexStream.applyBatch(spark, state,
      d.filter(col("source") =!= "src0").filter(col("doc_id") > 6L), 1L)
    val q = queriesOf(Seq(
      (100L, "rr title:\"aa bb\"~0"),
      (101L, "qq^2 body:\"rr pad\"~1")))
    val cols = Seq("query_id", "rank", "doc_id", "rrf_micro", "n_legs")
    val batch = CorpusOps.qlangOn(d, q)
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    val index = graft.Tables.canon(
        graft.operators.CorpusOps.rrfFuseLegs(Seq(
          IndexStream.queryFieldedTagged(spark, state, q,
              fieldLocalDf = true)
            .select(col("query_id"), col("doc_id"),
              col("rank").as("rank_sparse")),
          IndexStream.queryNearTagged(spark, state, q, len = 2)
            .select(col("query_id"), col("doc_id"),
              col("rank").as("rank_prox")))))
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    assert(batch == index && batch.nonEmpty,
      s"composed index face must equal the batch face: $index vs $batch")
  }

  test("queryLangParts shared fetch is bit-identical to the two standalone faces (r15 optimization)") {
    val d = fieldedDocs((100L, "zz zz", "ignored", "src0") +: train)
    val root = Files.createTempDirectory("graft-qlangparts").toString
    val state = s"$root/state"
    IndexStream.applyBatch(spark, state,
      d.filter(col("source") =!= "src0"), 0L)
    val q = queriesOf(Seq(
      (100L, "rr title:\"aa bb\"~0"),      // both legs live
      (101L, "qq^2 body:\"rr pad\"~1"),    // both legs live
      (102L, "rr qq"),                     // no quoted run: prox empty
      (103L, "title:\"nosuch words\"~2"))) // run off-vocabulary
    val (gotS, gotP) = IndexStream.queryLangParts(spark, state, q,
      len = 2, fieldLocalDf = true)
    val wantS = IndexStream.queryFieldedTagged(spark, state, q,
      fieldLocalDf = true)
    val wantP = IndexStream.queryNearTagged(spark, state, q, len = 2)
    def rows(df: DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet
    assert(rows(gotS) == rows(wantS) && rows(gotS).nonEmpty,
      s"sparse leg must match the standalone fielded face: " +
        s"${rows(gotS)} vs ${rows(wantS)}")
    assert(rows(gotP) == rows(wantP) && rows(gotP).nonEmpty,
      s"prox leg must match the standalone near-tagged face: " +
        s"${rows(gotP)} vs ${rows(wantP)}")
    assert(gotS.schema == wantS.schema && gotP.schema == wantP.schema,
      "shared-fetch schemas must match the standalone faces")
  }
}
