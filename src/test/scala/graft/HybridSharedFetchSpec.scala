package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.IndexStream

/** The shared posting fetch behind the three-leg hybrid face
  * (round 12): `queryHybridParts` runs ONE dfs-shortlisted posting
  * read projecting BOTH payloads (tf for the BM25 leg, positions for
  * the proximity leg) where the standalone faces each ran their own.
  * Pinned here: both legs are bit-identical to the standalone faces —
  * through multiple generations, a delete, and the case where the
  * BM25 selection and the phrase terms diverge (a capped head term
  * still fetches for proximity; a rare non-leading term still scores
  * for BM25) — and the posting sub-table is read once, not twice.
  */
class HybridSharedFetchSpec extends SparkSpecBase {

  private def docsOf(rows: Seq[(Long, String)]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (id, t) => Row(id, t, "s") }, 2),
      IndexStream.docSchema)

  private def doc(i: Int): String = {
    val words = Seq("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet")
    (0 until 10).map(j => words((i * 3 + j * 7) % words.length))
      .mkString(" ") + s" tail$i"
  }

  private def ranked(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toSeq).toSeq
      .sortBy(r => (r(0).toString, r(1).toString, r(2).toString))

  test("both legs are bit-identical to the standalone faces; the postings sub-table is read once") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-hshared").toString
    val state = s"$root/state"
    IndexStream.applyBatch(spark, state,
      docsOf((0L until 18L).map(i => i -> doc(i.toInt))), 0L)
    IndexStream.applyBatch(spark, state,
      docsOf((18L until 30L).map(i => i -> doc(i.toInt))), 1L)
    IndexStream.deleteDocs(spark, state, Seq(7L).toDF("doc_id"), 0L)

    // queries: leading bigram drives the proximity leg, the remaining
    // terms widen the BM25 selection beyond the phrase terms
    val q = Seq(
      (900L, doc(3)),
      (901L, doc(21)),
      (902L, "alpha bravo tail5 tail9")).toDF("query_id", "text")

    val wantSparse = ranked(IndexStream.queryTopK(spark, state, q))
    val wantProx = ranked(
      IndexStream.queryNear(spark, state, q, sloppy = true))
    spark.catalog.clearCache()

    val ((gotSparse, gotProx), postRows) = scanRowsDuring("/postings") {
      val (s, p) = IndexStream.queryHybridParts(spark, state, q,
        sloppy = true)
      (ranked(s), ranked(p))
    }
    spark.catalog.clearCache()
    assert(wantSparse.nonEmpty && wantProx.nonEmpty,
      "fixture must rank in both legs")
    assert(gotSparse == wantSparse,
      "shared-fetch BM25 leg must equal queryTopK bit-for-bit")
    assert(gotProx == wantProx,
      "shared-fetch proximity leg must equal queryNear bit-for-bit")

    // the separate faces pay the posting read twice
    val (_, postRowsSeparate) = scanRowsDuring("/postings") {
      IndexStream.queryTopK(spark, state, q).collect()
      IndexStream.queryNear(spark, state, q, sloppy = true).collect()
    }
    spark.catalog.clearCache()
    assert(postRows > 0 && postRows < postRowsSeparate,
      s"shared fetch must read fewer posting rows than the two " +
        s"standalone faces ($postRows vs $postRowsSeparate)")
  }

  test("a doc re-folded with reordered text does not double-count in the shared sparse leg") {
    import spark.implicits._
    // two generations carry doc 1 with the SAME term frequencies but
    // DIFFERENT positions payloads (reordered text) — the tf rows are
    // byte-identical after projection, the 4-column rows are not;
    // queryTopK's 3-column distinct collapses them and the shared
    // fetch must rank identically, not score the terms twice
    val root = Files.createTempDirectory("graft-hshared2").toString
    val state = s"$root/state"
    IndexStream.applyBatch(spark, state, docsOf(Seq(
      1L -> "alpha bravo charlie delta",
      2L -> "alpha echo foxtrot golf",
      3L -> "bravo echo golf hotel") ++
      (4L until 10L).map(i => i -> s"pad$i fill$i zz$i yy$i")), 0L)
    IndexStream.applyBatch(spark, state, docsOf(Seq(
      1L -> "delta charlie bravo alpha")), 1L)
    val q = Seq((900L, "alpha bravo")).toDF("query_id", "text")
    val want = ranked(IndexStream.queryTopK(spark, state, q))
    spark.catalog.clearCache()
    val (s2, _) = IndexStream.queryHybridParts(spark, state, q)
    val got = ranked(s2)
    spark.catalog.clearCache()
    assert(want.nonEmpty && got == want,
      s"re-folded doc double-counted in the shared leg: $got vs $want")
  }
}
