package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.streaming.IndexStream

/** Growth curve for the exact full-query face (queryTopKAll), in the
  * scale specs' un-flakeable quantities: task-metric SHUFFLE bytes for
  * a fixed query against a 1× → 5× → 10× index, plus bit-identity
  * with the batch face at every size.
  *
  * The fixture isolates what MaxScore is FOR: the query carries three
  * rare essential terms (df fixed at 8 as the corpus grows) and one
  * FREQUENT non-essential term (~25 % of the corpus, uncapped), so the
  * frequent term's posting volume grows 10× while the candidate
  * universe stays 8 docs. The scoring shuffle must therefore stay flat
  * — the candidate semi-join broadcasts its small side and the
  * posting-volume hits never pay a shuffle write. (Input BYTES grow
  * with the frequent term's postings — inherent to fetching its tf for
  * candidates at row-group grain — which is why the assertion is on
  * shuffle volume, the term that owns a 100 TB join's cost.)
  * A fallback would also blow the shuffle flatness: this doubles as
  * the proof the upper-bound check holds at every size.
  */
class Bm25MaxScoreScaleSpec extends SparkSpecBase {

  private class ShuffleMeter extends SparkListener {
    val shuffleW = new AtomicLong
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) shuffleW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
    }
  }

  private def measuredShuffle(f: => Unit): Long = {
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    f
    Thread.sleep(800)
    spark.sparkContext.removeSparkListener(meter)
    meter.shuffleW.get
  }

  /** ids 1..8 carry the three rare terms; ~25 % of filler docs carry
    * the frequent non-essential term.
    */
  private def docsOf(ids: Seq[Long]): Seq[Row] = ids.map { id =>
    val rnd = new scala.util.Random(id)
    val filler = Seq.fill(40)(s"w${rnd.nextInt(1000)}").mkString(" ")
    val text =
      if (id <= 8L) s"xr1 xr2 xr3 $filler"
      else if (id % 4 == 1) s"zmidfreq $filler"
      else filler
    Row(id, text, "s")
  }

  private def batchDf(rows: Seq[Row]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), IndexStream.docSchema)

  private val queryText = "xr1 xr2 xr3 zmidfreq zzunseen"

  private def queriesDf = {
    import spark.implicits._
    Seq((900001L, queryText)).toDF("query_id", "text")
  }

  test("scoring shuffle stays candidate-bounded while the non-essential posting volume grows 10x; answers stay exact") {
    val root = Files.createTempDirectory("graft-maxscore-scale").toString
    val state = s"$root/state"
    var corpus: Seq[Long] = Seq.empty

    def seed(ids: Seq[Long], batchId: Long): Unit = {
      corpus = corpus ++ ids
      IndexStream.applyBatch(spark, state, batchDf(docsOf(ids)), batchId)
    }
    def query(): (Long, Seq[(Long, Int, Long, Long, Long)]) = {
      var got: Seq[(Long, Int, Long, Long, Long)] = Seq.empty
      val sh = measuredShuffle {
        got = IndexStream.queryTopKAll(spark, state, queriesDf)
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
            r.getLong(3), r.getLong(4))).toSeq.sorted
      }
      spark.catalog.clearCache()
      (sh, got)
    }
    // the batch face over the same corpus — the exactness reference
    def want(): Seq[(Long, Int, Long, Long, Long)] = {
      val d = batchDf(docsOf(corpus))
        .unionByName(spark.createDataFrame(
          spark.sparkContext.parallelize(
            Seq(Row(900001L, queryText, "src0"))), IndexStream.docSchema))
        .select(col("doc_id"), col("source"), col("text"))
      val w = graft.operators.CorpusOps.bm25FullTopkOn(d)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq.sorted
      spark.catalog.clearCache()
      w
    }

    seed(1L to 500L, 100L)
    val (s1, r1) = query()
    assert(r1 == want(), "1x: index face must equal the batch face")
    assert(r1.nonEmpty && r1.forall(t => t._3 <= 8L),
      s"top-k must be the rare-term docs: $r1")
    // every ranked doc scored all 4 live query terms? no — rare docs
    // carry xr1..xr3 (+ zmidfreq only by filler chance); at least the
    // three essential terms must have scored
    assert(r1.forall(_._5 >= 3L), s"n_terms must count all hits: $r1")

    seed(501L to 2500L, 101L)
    val (s5, r5) = query()
    assert(r5 == want(), "5x: index face must equal the batch face")

    seed(2501L to 5000L, 102L)
    val (s10, r10) = query()
    assert(r10 == want(), "10x: index face must equal the batch face")

    info(f"scoring shuffle bytes 1x=$s1 5x=$s5 10x=$s10")
    assert(s10 <= s1 * 3 + (1L << 20),
      s"scoring shuffle grew with posting volume (1x=$s1, 10x=$s10) — " +
        "the candidate restriction is not engaging")
  }

  test("fallback dl-fetch split: a no-fallback query's dl read stays candidate-bounded; a forced-fallback query re-ranks exactly over its own wider universe") {
    val root = Files.createTempDirectory("graft-maxscore-fb").toString
    val state = s"$root/state"
    // the scale fixture's corpus at 10x, plus two docs carrying rare
    // terms yr1..yr3 that only THEY hold: a query on them has 2
    // candidates < k=3, so its kth score is undefined and it MUST fall
    // back (the forced-on case); the xr query keeps its zero-fallback
    // proof (forced-off)
    val base = docsOf(1L to 5000L)
    val extra = Seq(
      Row(9001L, "yr1 yr2 yr3 zmidfreq pada padb", "s"),
      Row(9002L, "yr1 yr2 yr3 padc padd pade", "s"))
    IndexStream.applyBatch(spark, state, batchDf(base ++ extra), 0L)

    import spark.implicits._
    val qA = Seq((900001L, queryText)).toDF("query_id", "text")
    val qB = Seq((900002L, "yr1 yr2 yr3 zmidfreq")).toDF("query_id", "text")

    // the no-fallback query ALONE: the docs-sub-table read (the dl
    // fetch) must be candidate-bounded — BEFORE the split it covered
    // every posting hit, i.e. the frequent term's ~25% of the corpus.
    // scanRowsDuring (not the returned plan alone): the kth-score
    // probe inside queryTopKAll materializes the caches, so the dl
    // scan runs there
    val (gotA, docsRowsA) = scanRowsDuring("/docs") {
      IndexStream.queryTopKAll(spark, state, qA).collect().toSeq
    }
    spark.catalog.clearCache()
    assert(gotA.nonEmpty && gotA.forall(_.getLong(2) <= 8L),
      s"top-k must stay the rare-term docs: ${gotA.toSeq}")
    // ~8 candidates land as ~160 scan-output rows (row-group slack
    // around the id pushdown); the PRE-SPLIT fetch covered the
    // frequent term's posting universe (~1250 docs) — the bound sits
    // well under that and far over the slack
    assert(docsRowsA <= 400L,
      s"dl fetch read $docsRowsA docs rows for ~8 candidates — " +
        "the fallback universe is widening the main branch's fetch")

    // both queries together: the fallback query re-ranks over ALL its
    // posting hits (its own dl fetch), and both answers equal the
    // full-scoring batch face
    val both = IndexStream.queryTopKAll(spark, state,
        qA.unionByName(qB)).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq.sorted
    spark.catalog.clearCache()
    val ref = batchDf(base ++ extra)
      .unionByName(spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          Row(900001L, queryText, "src0"),
          Row(900002L, "yr1 yr2 yr3 zmidfreq", "src0"))),
        IndexStream.docSchema))
      .select(col("doc_id"), col("source"), col("text"))
    val want = graft.operators.CorpusOps.bm25FullTopkOn(ref)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq.sorted
    spark.catalog.clearCache()
    assert(both == want,
      "fallback + main branches must equal the batch face exactly")
    assert(both.exists(_._1 == 900002L),
      "the forced-fallback query must still rank its matches")
  }

  test("block-max pruning: the frequent term's posting scan stays candidate-bounded as its posting volume grows 10x") {
    // small row groups + pages so the fixture-scale files carry MANY
    // row groups — the unit the doc_id min/max stats skip at. The
    // writer sorts (tpfx, term, doc_id) within partitions, so a
    // frequent term's row groups carry tight disjoint doc_id ranges
    // and the candidate IN pushdown skips all but the candidates'.
    val hc = spark.sparkContext.hadoopConfiguration
    val oldBlock = hc.get("parquet.block.size")
    val oldPage = hc.get("parquet.page.size")
    hc.setInt("parquet.block.size", 16 * 1024)
    hc.setInt("parquet.page.size", 2 * 1024)
    try {
      val root = Files.createTempDirectory("graft-blockmax").toString
      val state = s"$root/state"
      IndexStream.applyBatch(spark, state, batchDf(docsOf(1L to 500L)), 0L)
      def postRows(): Long = {
        val (rows, n) = scanRowsDuring("/postings") {
          IndexStream.queryTopKAll(spark, state, queriesDf).collect().toSeq
        }
        spark.catalog.clearCache()
        assert(rows.nonEmpty && rows.forall(_.getLong(2) <= 8L),
          s"top-k must stay the rare-term docs: $rows")
        n
      }
      val p1 = postRows()
      IndexStream.applyBatch(spark, state,
        batchDf(docsOf(501L to 5000L)), 1L)
      val p10 = postRows()
      info(s"posting-scan rows 1x=$p1 10x=$p10")
      // without the candidate pushdown the frequent term's ~25% of the
      // corpus is scanned wholesale: ~125 rows at 1x, ~1250 at 10x.
      // With it, surviving row groups track the FIXED candidate set —
      // growth stays far under the posting-volume curve
      assert(p10 <= p1 * 3 + 64,
        s"non-essential posting scan grew with posting volume " +
          s"(1x=$p1, 10x=$p10) — the candidate IN is not reaching " +
          "the row-group stats")
    } finally {
      if (oldBlock == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", oldBlock)
      if (oldPage == null) hc.unset("parquet.page.size")
      else hc.set("parquet.page.size", oldPage)
    }
  }
}
