package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.CorpusOps

/** Fielded QUERIES (round 14): per-field tags and query weights —
  * `title:term`, `body:term`, `term^w` — parsed by the ONE shared
  * parser and scored identically by the batch face and the v7 index
  * face. Pins the parse table, the field-restriction semantics (the
  * row where a title-targeted query ranks DIFFERENTLY from the
  * unfielded query), the exact integer boost, and index ≡ batch over
  * a multi-generation titled state.
  */
class Bm25fQuerySpec extends SparkSpecBase {

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
    val schema = StructType(Seq(
      StructField("query_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (id, t) => Row(id, t) }, 2), schema)
  }

  // rare: title of doc 1, body of doc 2; fill: bodies only.
  // n_docs = 4, df(rare) = 2 -> 2*2 <= 4 passes the head-term cap.
  private val corpus = Seq(
    (100L, "zz zz", "placeholder", "src0"),
    (1L, "rare tt", "pad pad pad pad pad pad", "src1"),
    (2L, "tt tt", "rare pad pad pad pad pad", "src1"),
    (3L, "tt pad", "fill pad fill pad pad pad", "src1"),
    (4L, "pad tt", "pad fill pad fill pad pad", "src1"))

  test("parseFieldedQuery: the full token syntax table") {
    val got = CorpusOps.parseFieldedQuery(queriesOf(Seq(
      (1L, "foo title:bar body:baz qux^3 title:quux^2 odd:x ^7 body: a^b"))))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    assert(got == Set(
      (1L, "foo", "any", 1L),      // bare
      (1L, "bar", "title", 1L),    // field restriction
      (1L, "baz", "body", 1L),
      (1L, "qux", "any", 3L),      // query weight
      (1L, "quux", "title", 2L),   // both
      (1L, "odd:x", "any", 1L),    // unknown prefix stays literal
      (1L, "a^b", "any", 1L)),     // ^ not followed by trailing digits
      s"parse table mismatch: $got")
    // '^7' alone and 'body:' alone have empty terms -> dropped;
    // duplicate clauses collapse to one triple
    val dup = CorpusOps.parseFieldedQuery(queriesOf(Seq(
      (2L, "foo foo title:foo foo^1"))))
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(dup == Set(("foo", "any", 1L), ("foo", "title", 1L)),
      s"duplicate clauses must collapse, distinct tags must not: $dup")
  }

  test("a title-targeted query ranks differently from the unfielded query over the same corpus") {
    val d = fieldedDocs(corpus)
    val tagged = CorpusOps.bm25fScoredOn(d,
      CorpusOps.parseFieldedQuery(queriesOf(Seq((100L, "title:rare")))))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(tagged == Seq(1L),
      s"title:rare must match ONLY the title occurrence: $tagged")
    val bare = CorpusOps.bm25fScoredOn(d,
      CorpusOps.parseFieldedQuery(queriesOf(Seq((100L, "rare")))))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(bare == Set(1L, 2L),
      s"bare rare must match both fields: $bare")
    val body = CorpusOps.bm25fScoredOn(d,
      CorpusOps.parseFieldedQuery(queriesOf(Seq((100L, "body:rare")))))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(body == Seq(2L),
      s"body:rare must match ONLY the body occurrence: $body")
  }

  test("the query weight multiplies the clause µ-score exactly, after the floor") {
    val d = fieldedDocs(corpus)
    val both = CorpusOps.bm25fScoredOn(d,
      CorpusOps.parseFieldedQuery(queriesOf(Seq(
        (100L, "rare"), (200L, "rare^3")))))
      .select("query_id", "doc_id", "score_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val docs = both.keys.filter(_._1 == 100L).map(_._2)
    assert(docs.nonEmpty, "fixture must match")
    docs.foreach { id =>
      assert(both((200L, id)) == 3L * both((100L, id)),
        s"^3 must scale doc $id's µ-score exactly 3x: $both")
    }
  }

  test("index face ≡ batch face over a two-generation titled v7 state") {
    import java.nio.file.Files
    import graft.streaming.IndexStream
    val d = fieldedDocs(corpus)
    val root = Files.createTempDirectory("graft-bm25fq").toString
    val state = s"$root/state"
    IndexStream.applyBatch(spark, state,
      d.filter(col("source") =!= "src0")
        .filter(col("doc_id") <= 2L), 0L)
    IndexStream.applyBatch(spark, state,
      d.filter(col("source") =!= "src0")
        .filter(col("doc_id") > 2L), 1L)
    // one query exercising a restriction, a boost, and a bare blend
    // at once; one query that must come back empty (title-only term
    // restricted to the body)
    val q = queriesOf(Seq(
      (100L, "title:rare tt^2 fill"),
      (200L, "body:zz title:fill")))
    val cols = Seq("query_id", "rank", "doc_id", "score_micro", "n_terms")
    val batch = CorpusOps.bm25fScoredOn(d, CorpusOps.parseFieldedQuery(q))
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    val index = IndexStream.queryFieldedTagged(spark, state, q)
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    assert(batch == index,
      s"tagged index face must equal the batch face: $batch vs $index")
    assert(batch.nonEmpty, "fixture must produce matches")
    assert(!batch.exists(_.head == 200L),
      s"query 200's clauses all miss their fields -> no rows: $batch")
  }

  test("as-of tagged queries read only the sealed history") {
    import java.nio.file.Files
    import graft.streaming.IndexStream
    val d = fieldedDocs(corpus)
    val root = Files.createTempDirectory("graft-bm25fq-asof").toString
    val state = s"$root/state"
    // gen 0 = docs 1, 3, 4 (rare's df stays 1 of 3, under the
    // head-term cap); gen 1 adds doc 2 (rare's second, body-side doc)
    IndexStream.applyBatch(spark, state,
      d.filter(col("source") =!= "src0").filter(col("doc_id") =!= 2L),
      0L) // seq 1
    IndexStream.applyBatch(spark, state,
      d.filter(col("source") =!= "src0").filter(col("doc_id") === 2L),
      1L) // seq 2
    val q = queriesOf(Seq((100L, "title:rare tt^2")))
    val cols = Seq("query_id", "rank", "doc_id", "score_micro", "n_terms")
    val asOf1 = IndexStream.queryFieldedTagged(spark, state, q,
        asOf = Some(1L))
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    val wantGen0 = CorpusOps.bm25fScoredOn(
        fieldedDocs(corpus.filter(r => r._4 == "src0" || r._1 != 2L)),
        CorpusOps.parseFieldedQuery(q))
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    assert(asOf1 == wantGen0 && asOf1.nonEmpty,
      s"asOf=1 must equal the gen-0-only batch face: $asOf1 vs $wantGen0")
    // the full state sees doc 2's body occurrence too — but a
    // title-tagged query still ranks doc 1 alone
    val full = IndexStream.queryFieldedTagged(spark, state, q)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(full == Set(1L),
      s"full-state title:rare must still match only the title hit: $full")
  }

  test("the unfielded faces are the degenerate all-(any,1) case of the shared scorer — unchanged by the refactor") {
    // the gate rows bm25f_titled / bm25f_titled_index already pin
    // this against the oracle; this is the fast local tripwire
    val d = fieldedDocs(corpus)
    val viaTrips = CorpusOps.bm25fScoredOn(d,
      CorpusOps.parseFieldedQuery(queriesOf(Seq((100L, "rare tt fill")))))
      .select("doc_id", "score_micro").collect().map(_.toSeq).toSet
    val viaFace = CorpusOps.bm25fTopkOn(
      fieldedDocs(corpus.map { case (id, ti, t, s) =>
        (id, ti, if (s == "src0") "rare tt fill" else t, s) }))
      .select("doc_id", "score_micro").collect().map(_.toSeq).toSet
    assert(viaTrips == viaFace,
      s"bare queries must reduce to the unfielded face: " +
        s"$viaTrips vs $viaFace")
  }
}
