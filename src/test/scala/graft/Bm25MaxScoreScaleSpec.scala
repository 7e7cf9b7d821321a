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
}
