package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.CorpusOps
import graft.streaming.IndexStream

/** TAGGED fielded phrase retrieval (round 15): the field restriction
  * rides the query STRING (`title:"a b"` / `body:"a b"`, the
  * quoted-run grammar of CorpusOps.parseTaggedPhrase) instead of a
  * Scala parameter, per query — one query set can mix title- and
  * body-restricted phrases. Also pins the grammar interactions: the
  * per-token parser must strip quoted runs (no bag-of-words leakage),
  * and the boost cast can never overflow to null (ADVICE r14).
  */
class PhraseQtagSpec extends SparkSpecBase {

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

  // phrase "aa bb". doc 1: in TITLE; doc 2: in BODY (twice);
  // doc 3: STRADDLES the seam; doc 4: neither.
  private val train = Seq(
    (1L, "aa bb", "pad pad pad", "src1"),
    (2L, "tt tt", "aa bb pad aa bb", "src1"),
    (3L, "tt aa", "bb pad pad", "src1"),
    (4L, "aa tt", "pad bb aa", "src1"))

  test("parseTaggedPhrase: first tagged run wins; untagged quotes, unknown prefixes, and unterminated quotes are not tags") {
    val q = queriesOf(Seq(
      (1L, "lead title:\"aa bb\" tail"),
      (2L, "body:\"cc dd\" then title:\"ee ff\""),
      (3L, "\"bare quotes\" no tag"),
      (4L, "foo:\"not a field\" either"),
      (5L, "title:\"unterminated run"),
      (6L, "no quotes at all"),
      (7L, "mytitle:\"embedded tag must not match\"")))
    val got = CorpusOps.parseTaggedPhrase(q).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(
      (1L, "aa bb", "title"),
      (2L, "cc dd", "body"),
      // the unterminated-quote text never closes, so the grammar sees
      // no run; query 7's tag is inside a larger word — \b rejects it
      ),
      s"quoted-run grammar parsed wrong: $got")
  }

  test("parseFieldedQuery strips quoted runs: a phrase run's words never leak in as term clauses") {
    val q = queriesOf(Seq(
      (1L, "keep title:\"aa bb\" also^2 title:rest")))
    val got = CorpusOps.parseFieldedQuery(q).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(got == Set(
      ("keep", "any", 1L), ("also", "any", 2L), ("rest", "title", 1L)),
      s"quoted run must vanish from the term clauses: $got")
  }

  test("boost digits cap at 9: a longer digit tail is literal term text, never a null qw (ADVICE r14)") {
    val q = queriesOf(Seq(
      (1L, "t^999999999 u^9999999999")))
    val got = CorpusOps.parseFieldedQuery(q).collect()
      .map(r => (r.getString(1), r.getLong(3))).toSet
    assert(got == Set(("t", 999999999L), ("u^9999999999", 1L)),
      s"over-long boost must stay literal, in-range boost must cast: $got")
  }

  test("one query set mixes title- and body-restricted phrases; straddling runs match neither") {
    val d = fieldedDocs((100L, "zz zz", "ignored", "src0") +: train)
    val q = queriesOf(Seq(
      (100L, "x title:\"aa bb\" y"),
      (101L, "body:\"aa bb\"")))
    val got = CorpusOps.phraseQtagMatchOn(d, q, len = 2)
      .select("query_id", "doc_id", "n_occ").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((100L, 1L, 1L), (101L, 2L, 2L)),
      s"title query must hit doc 1 only, body query doc 2 twice " +
        s"(straddle doc 3 excluded for both): $got")
  }

  test("the gate tagging rule targets tokens 1..2 with parity fields, and the shared parser round-trips it") {
    val q = queriesOf(Seq(
      (10L, "D0 D1 D2 D3"),
      (11L, "e0 e1 e2"),
      (12L, "too short")))
    val tagged = CorpusOps.withTaggedPhraseText(q, len = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(tagged == Map(
      10L -> "d0 title:\"d1 d2\" d3",
      11L -> "e0 body:\"e1 e2\""),
      s"tagging rule drifted (queries under len+1 tokens drop): $tagged")
    val parsed = CorpusOps.parseTaggedPhrase(
        CorpusOps.withTaggedPhraseText(q, len = 2)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(parsed == Set((10L, "d1 d2", "title"), (11L, "e1 e2", "body")),
      s"parser must recover exactly the tagged runs: $parsed")
  }

  test("index face: tagged queries over the stored boundary, bit-identical to the batch face across two generations") {
    val d = fieldedDocs((100L, "zz zz", "ignored", "src0") +: train)
    val root = Files.createTempDirectory("graft-phrq").toString
    val state = s"$root/state"
    IndexStream.applyBatch(spark, state,
      d.filter(col("source") =!= "src0").filter(col("doc_id") <= 2L), 0L)
    IndexStream.applyBatch(spark, state,
      d.filter(col("source") =!= "src0").filter(col("doc_id") > 2L), 1L)
    val q = queriesOf(Seq(
      (100L, "x title:\"aa bb\" y"),
      (101L, "body:\"aa bb\""),
      (102L, "no tag here")))
    val cols = Seq("query_id", "rank", "doc_id", "n_occ")
    val batch = CorpusOps.phraseQtagMatchOn(d, q, len = 2)
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    val index = IndexStream.queryPhraseTagged(spark, state, q, len = 2)
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    assert(batch == index && batch.nonEmpty,
      s"tagged index face must equal the batch face: $batch vs $index")
  }

  test("charSuccessor: order-safe bounds only — surrogate-adjacent and lone-surrogate prefixes get no upper bound") {
    assert(IndexStream.charSuccessor("ab") == Some("ac"))
    assert(IndexStream.charSuccessor("") == None)
    assert(IndexStream.charSuccessor("a\uffff") == None)
    // U+D7FF + 1 = U+D800 (unpaired surrogate -- Java encodes it as
    // '?', which would sort BELOW real completions): no bound
    assert(IndexStream.charSuccessor("a\ud7ff") == None)
    // a lone surrogate's own encoding is undefined: no bound
    assert(IndexStream.charSuccessor("a\ud800") == None)
    assert(IndexStream.charSuccessor("a\udfff") == None)
    // just past the surrogate block increments normally
    assert(IndexStream.charSuccessor("a\ue000") == Some("a\ue001"))
  }
}
