package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.CorpusOps
import graft.streaming.IndexStream

/** Prefix retrieval (bm25_prefix_topk / bm25_prefix_index): the
  * fixed-width expansion rule, the rarest-first expansion cap, the
  * blended multi-term scoring, and batch/index bit-identity.
  */
class PrefixQuerySpec extends SparkSpecBase {

  private def docs(rows: Seq[(Long, String, String)]): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = false),
      StructField("source", StringType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (id, t, s) => Row(id, t, s) }, 2), schema)
  }

  private def out(df: DataFrame): Set[(Long, Long, Long)] =
    df.select("query_id", "doc_id", "n_terms").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  // df: apricot=1, april=1, apple=2; pad/fill are frequent noise.
  // Query 100's only in-vocabulary term is "apple" -> seed, prefix
  // "ap" at len=2 -> expansion {apricot, april, apple} rarest-first.
  private val fixture = Seq(
    (100L, "apple offvocab", "src0"),
    (1L, "apple pad pad", "src1"),
    (2L, "apricot pad fill", "src1"),
    (3L, "april apple fill", "src1"),
    (4L, "pad fill pad", "src1"))

  test("expansion scores every completion of the prefix") {
    val got = out(CorpusOps.prefixTopkOn(docs(fixture), len = 2, max = 4))
    // doc1 matches via apple (1 term), doc2 via apricot, doc3 via
    // april AND apple (2 terms), doc4 not at all
    assert(got == Set((100L, 1L, 1L), (100L, 2L, 1L), (100L, 3L, 2L)),
      s"expansion semantics wrong: $got")
  }

  test("the expansion cap keeps the RAREST completions (the seed itself can drop)") {
    val got = out(CorpusOps.prefixTopkOn(docs(fixture), len = 2, max = 2))
    // rarest-first: apricot(df=1), april(df=1) survive; apple(df=2)
    // truncates out -> doc1 no longer matches, doc3 matches on april only
    assert(got == Set((100L, 2L, 1L), (100L, 3L, 1L)),
      s"expansion cap wrong: $got")
  }

  test("a seed shorter than the prefix width expands only to itself") {
    val d = docs(Seq(
      (100L, "a offvocab", "src0"),
      (1L, "a pad", "src1"),
      (2L, "apple pad", "src1"),
      (3L, "pad pad", "src1")))
    val got = out(CorpusOps.prefixTopkOn(d, len = 2, max = 4))
    assert(got == Set((100L, 1L, 1L)),
      s"fixed-width rule wrong (apple must NOT match seed 'a'): $got")
  }

  test("index face is bit-identical to the batch face") {
    val d = docs(fixture)
    val root = Files.createTempDirectory("graft-prefix").toString
    val state = s"$root/state"
    IndexStream.applyBatch(spark, state,
      d.filter(col("source") =!= "src0"), 0L)
    val q = d.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"), col("text"))
    for (max <- Seq(2, 4)) {
      val batch = CorpusOps.prefixTopkOn(d, len = 2, max = max)
        .select("query_id", "rank", "doc_id", "score_micro", "n_terms")
        .collect().map(_.toSeq).toSet
      val index = IndexStream.queryPrefix(spark, state, q,
          len = 2, max = max)
        .select("query_id", "rank", "doc_id", "score_micro", "n_terms")
        .collect().map(_.toSeq).toSet
      assert(batch == index,
        s"index face must equal the batch face at max=$max")
      assert(batch.nonEmpty, "fixture must produce matches")
    }
  }

  test("a batch re-delivered after compaction cannot double-count df in the expansion") {
    // compaction moves a generation's dfs rows into the physical
    // ingest=-1 dir (logical gen preserved); re-delivering the same
    // batch id then writes byte-identical rows into its own ingest dir
    // again. The vocabulary-grain df sum must collapse the duplicates
    // (distinct over (term, df, gen), mirroring dfsRowsFor) or the
    // rarest-first expansion cap flips: here apricot's df doubles
    // 1 -> 2, loses its term-asc tie against apple, and the match set
    // silently swaps doc 2 for doc 1.
    val d = docs(Seq(
      (100L, "apple offvocab", "src0"),
      (1L, "apple pad pad", "src1"),
      (2L, "apricot pad fill", "src1"),
      (3L, "april apple fill", "src1"),
      (4L, "pad fill pad", "src1")))
    val root = Files.createTempDirectory("graft-prefix3").toString
    val state = s"$root/state"
    val batch0 = d.filter(col("doc_id") === 2L)
    val batch1 = d.filter(col("source") =!= "src0" && col("doc_id") =!= 2L)
    IndexStream.applyBatch(spark, state, batch0, 0L)
    IndexStream.applyBatch(spark, state, batch1, 1L)
    IndexStream.compactState(spark, state, 64L * 1024 * 1024)
    IndexStream.applyBatch(spark, state, batch0, 0L) // re-delivery
    val q = d.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"), col("text"))
    // match set only: the documented marker tolerance (bounded N/totdl
    // overcount on re-delivery-after-consolidation) may perturb scores,
    // but never which terms expand or which docs match
    val got = out(IndexStream.queryPrefix(spark, state, q,
      len = 2, max = 2))
    val want = out(CorpusOps.prefixTopkOn(d, len = 2, max = 2))
    assert(want == Set((100L, 2L, 1L), (100L, 3L, 1L)),
      s"fixture drifted: $want")
    assert(got == want,
      s"duplicate dfs rows perturbed the expansion: $got != $want")
  }

  test("deletes apply and df-ranks re-derive over survivors") {
    import spark.implicits._
    val d = docs(fixture)
    val root = Files.createTempDirectory("graft-prefix2").toString
    val state = s"$root/state"
    IndexStream.applyBatch(spark, state,
      d.filter(col("source") =!= "src0"), 0L)
    // deleting doc 2 removes apricot from the vocabulary entirely:
    // expansion at max=2 then keeps {april, apple} (apple re-enters)
    IndexStream.deleteDocs(spark, state, Seq(2L).toDF("doc_id"), 1L)
    val q = d.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"), col("text"))
    val got = out(IndexStream.queryPrefix(spark, state, q,
      len = 2, max = 2))
    assert(got == Set((100L, 1L, 1L), (100L, 3L, 2L)),
      s"survivor expansion wrong: $got")
  }
}
