package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.CorpusOps
import graft.streaming.IndexStream

/** SLOP-tagged fielded proximity (round 15): `title:"a b"~w` in the
  * query string — ordered runs with span ≤ len−1+w entirely within
  * the tagged field, scored by sloppy frequency over qualifying ends.
  * Pins the ~w grammar (cap, lookahead), the per-query slop cap, the
  * in-field chain restriction, the phrase/NEAR face split on slop,
  * and index ≡ batch.
  */
class NearQtagSpec extends SparkSpecBase {

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

  // doc 1: "aa bb" ADJACENT in title; doc 2: "aa xx bb" in title
  // (span 2 = slop 1); doc 3: "aa bb" straddles the seam; doc 4:
  // adjacent in BODY only.
  private val train = Seq(
    (1L, "aa bb pad", "pad pad", "src1"),
    (2L, "aa xx bb", "pad pad", "src1"),
    (3L, "pad aa", "bb pad", "src1"),
    (4L, "tt tt", "aa bb pad", "src1"))

  test("parseTaggedPhrase slop grammar: ~w caps at 4 digits with no half-read tails") {
    val q = queriesOf(Seq(
      (1L, "title:\"aa bb\"~2"),
      (2L, "body:\"cc dd\" bare"),
      (3L, "title:\"ee ff\"~1234"),
      (4L, "title:\"gg hh\"~12345 over")))
    val got = CorpusOps.parseTaggedPhrase(q).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    assert(got == Set(
      (1L, "aa bb", "title", 2L),
      (2L, "cc dd", "body", 0L),
      (3L, "ee ff", "title", 1234L),
      // 5 digits: the suffix is NOT half-read as slop 1234 — the whole
      // ~12345 stays literal text after the run, slop defaults to 0
      (4L, "gg hh", "title", 0L)),
      s"slop grammar parsed wrong: $got")
  }

  test("slop caps the in-field window per query; straddles and the wrong field never match") {
    val d = fieldedDocs((100L, "zz zz", "ignored", "src0") +: train)
    def run(qs: Seq[(Long, String)]): Map[(Long, Long), Long] =
      CorpusOps.nearQtagMatchOn(d, queriesOf(qs), len = 2)
        .select("query_id", "doc_id", "sloppy_micro").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // slop 0: adjacency only, title only — doc 1 alone, at the full
    // 10^6 grade (straddling doc 3 and body-adjacent doc 4 excluded)
    val s0 = run(Seq((100L, "title:\"aa bb\"~0")))
    assert(s0 == Map((100L, 1L) -> 1000000L),
      s"slop 0 must match only the title-adjacent doc at 10^6: $s0")
    // slop 1 admits doc 2's span-2 window at half grade
    val s1 = run(Seq((100L, "title:\"aa bb\"~1")))
    assert(s1 == Map((100L, 1L) -> 1000000L, (100L, 2L) -> 500000L),
      s"slop 1 must add the span-2 title window at 500000: $s1")
    // body field: only doc 4 matches, regardless of slop
    val sb = run(Seq((100L, "body:\"aa bb\"~2")))
    assert(sb == Map((100L, 4L) -> 1000000L),
      s"body tag must match only the body-internal run: $sb")
    // one query set mixes fields AND slops
    val mix = run(Seq((100L, "title:\"aa bb\"~1"),
      (101L, "body:\"aa bb\"~0")))
    assert(mix == Map((100L, 1L) -> 1000000L, (100L, 2L) -> 500000L,
      (101L, 4L) -> 1000000L), s"mixed per-query fields/slops: $mix")
  }

  test("the exact-phrase faces answer slop-0 runs only; the slop-tagged run is the NEAR face's") {
    val d = fieldedDocs((100L, "zz zz", "ignored", "src0") +: train)
    val slopQ = queriesOf(Seq((100L, "title:\"aa bb\"~1")))
    assert(CorpusOps.phraseQtagMatchOn(d, slopQ, len = 2)
      .collect().isEmpty,
      "a ~w run must not phrase-match")
    assert(CorpusOps.nearQtagMatchOn(d, slopQ, len = 2)
      .collect().nonEmpty,
      "the same run must near-match")
  }

  test("index face: stored boundary + per-query slop, bit-identical to the batch face across two generations") {
    val d = fieldedDocs((100L, "zz zz", "ignored", "src0") +: train)
    val root = Files.createTempDirectory("graft-nearq").toString
    val state = s"$root/state"
    IndexStream.applyBatch(spark, state,
      d.filter(col("source") =!= "src0").filter(col("doc_id") <= 2L), 0L)
    IndexStream.applyBatch(spark, state,
      d.filter(col("source") =!= "src0").filter(col("doc_id") > 2L), 1L)
    val q = queriesOf(Seq(
      (100L, "title:\"aa bb\"~1"),
      (101L, "body:\"aa bb\"~0"),
      (102L, "no tag")))
    val cols = Seq("query_id", "rank", "doc_id", "sloppy_micro")
    val batch = CorpusOps.nearQtagMatchOn(d, q, len = 2)
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    val index = IndexStream.queryNearTagged(spark, state, q, len = 2)
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    assert(batch == index && batch.nonEmpty,
      s"tagged NEAR index face must equal the batch face: " +
        s"$index vs $batch")
  }
}
