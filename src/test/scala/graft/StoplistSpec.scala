package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.FormattedMode
import graft.streaming.IndexStream
import graft.operators.CorpusOps

/** The head-term (stopword) cap, round 10's top verdict item: a term
  * occurring in more than half the corpus (2·df > n_docs,
  * CorpusOps.bm25CapOk) is never selected for scoring, and — on the
  * incremental face — its posting lists are PROVABLY never read: term
  * selection happens against the vocabulary-sized `dfs` sub-table
  * before any posting file is opened. This spec pins:
  *  - the all-stopword query answers empty with ZERO posting-file
  *    reads (no parquet scan of `postings/` in its plan at all);
  *  - a mixed query (stopword + rare term) scores only the rare term
  *    and its posting read skips the stopword's heavy posting dirs
  *    (byte-level assertion: the read is a sliver of the stopword-
  *    dominated index);
  *  - the dfs-derived generation shortlist prunes `ingest=` dirs the
  *    rare term does not touch (plan-level partition-filter
  *    assertion);
  *  - batch face and index face stay bit-identical under the cap —
  *    uncapped terms score exactly as before.
  */
class StoplistSpec extends SparkSpecBase {

  private class IoMeter extends SparkListener {
    val read = new AtomicLong
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) read.addAndGet(m.inputMetrics.bytesRead)
    }
  }

  private def readBytes(f: => Unit): Long = {
    val meter = new IoMeter
    spark.sparkContext.addSparkListener(meter)
    f
    Thread.sleep(800) // drain the listener bus before reading counters
    spark.sparkContext.removeSparkListener(meter)
    meter.read.get
  }

  private def dirBytes(dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L
    else {
      val it = fs.listFiles(p, true)
      var n = 0L
      while (it.hasNext) { val s = it.next(); if (s.isFile) n += s.getLen }
      n
    }
  }

  /** 120 docs, 3 batches of 40: every doc carries the stopword
    * `zstopword` plus heavy per-doc filler (so the stopword's posting
    * dirs dominate the index bytes); docs 1..6 (batch 0 only) also
    * carry the rare term `xrare` (df=6 — uncapped at every corpus
    * size here).
    */
  private def docsOf(ids: Seq[Long]): Seq[Row] = ids.map { id =>
    val rnd = new scala.util.Random(id)
    val filler = Seq.fill(60)(s"w${rnd.nextInt(4000)}_$id").mkString(" ")
    val text =
      if (id <= 6L) s"xrare zstopword $filler"
      else s"zstopword $filler"
    Row(id, text, "s")
  }

  private def batchDf(rows: Seq[Row]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), IndexStream.docSchema)

  private def queryDf(text: String) = {
    import spark.implicits._
    Seq((900001L, text)).toDF("query_id", "text")
  }

  test("all-stopword query: empty answer, zero posting reads; mixed query skips the head posting lists; gen shortlist prunes") {
    val root = Files.createTempDirectory("graft-stoplist").toString
    val state = s"$root/state"
    IndexStream.applyBatch(spark, state, batchDf(docsOf(1L to 40L)), 0L)
    IndexStream.applyBatch(spark, state, batchDf(docsOf(41L to 80L)), 1L)
    IndexStream.applyBatch(spark, state, batchDf(docsOf(81L to 120L)), 2L)

    // ---- the all-stopword query: df(zstopword)=120 > 60 → capped.
    // The answer is empty AND the returned plan holds NO file scan at
    // all — postings are provably skipped, not just filtered. The byte
    // meter wraps CONSTRUCTION too (the face's bounded driver actions
    // read dfs + markers there), so the assertion covers the whole
    // query: its I/O is the vocabulary-sized dfs fetch, never the
    // stopword-dominated postings.
    val dfsB = dirBytes(s"$state/dfs")
    val postingsBytes = dirBytes(s"$state/postings")
    assert(postingsBytes > dfsB * 4,
      s"fixture broken: postings ($postingsBytes B) must dominate dfs " +
        s"($dfsB B) for the skip assertions to mean anything")
    var stopEmpty = false
    val stopBytes = readBytes {
      val st = IndexStream.queryTopK(spark, state, queryDf("zstopword"))
      val stopPlan = st.queryExecution.executedPlan.toString
      assert(!stopPlan.contains("Scan parquet") &&
        !stopPlan.contains("FileScan"),
        s"all-stopword query must not plan any file read:\n$stopPlan")
      stopEmpty = st.collect().isEmpty
    }
    assert(stopEmpty, "all-stopword query must answer empty")
    assert(stopBytes <= dfsB * 2 + (1L << 16),
      s"all-stopword query read $stopBytes B — more than the dfs fetch " +
        s"(dfs=$dfsB B): posting lists were touched")

    // ---- the mixed query: zstopword capped, xrare (df=6) selected.
    // Hits come only from the rare docs, and the posting read skips
    // the stopword-dominated bulk of the index.
    var got: Set[Long] = Set.empty
    val mixedBytes = readBytes {
      got = IndexStream.queryTopK(spark, state,
          queryDf("zstopword xrare"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    assert(got.size == 3 && got.subsetOf((1L to 6L).toSet),
      s"mixed query must retrieve the rare-term docs: $got")
    assert(mixedBytes < postingsBytes / 4,
      s"mixed query read $mixedBytes of a $postingsBytes-byte posting " +
        "set — the capped stopword's head lists were not skipped")

    // ---- generation shortlist: xrare lives only in generation 0, so
    // the posting scan's partition filter must admit its tpfx dir for
    // ingest=0 (and the compacted -1) but NOT generations 1 and 2
    val mixed = IndexStream.queryTopK(spark, state,
      queryDf("zstopword xrare"))
    val plan = mixed.queryExecution.explainString(FormattedMode)
    val tp = IndexStream.tpfxOf("xrare")
    assert(plan.contains(s"$tp/0"),
      s"generation shortlist lost the rare term's own generation:\n$plan")
    assert(!plan.contains(s"$tp/1") && !plan.contains(s"$tp/2"),
      "posting scan admits generations the rare term never touched — " +
        "the dfs gen shortlist is not pruning")

    // ---- cap-equivalence: batch face over the same corpus agrees
    // bit-for-bit (shared selection + cap definitions)
    val corpus = batchDf(docsOf(1L to 120L))
      .withColumnRenamed("source", "drop_me")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.lit("src1").as("source"),
        org.apache.spark.sql.functions.col("text"))
      .unionByName(queryDf("zstopword xrare")
        .select(org.apache.spark.sql.functions.col("query_id").as("doc_id"),
          org.apache.spark.sql.functions.lit("src0").as("source"),
          org.apache.spark.sql.functions.col("text")))
    val batch = CorpusOps.bm25TopkOn(corpus)
      .select("query_id", "doc_id", "score_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val index = mixed.select("query_id", "doc_id", "score_micro")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch == index,
      s"cap broke the batch/index equivalence: batch=$batch index=$index")
    spark.catalog.clearCache()
  }

  test("batch face: an all-stopword query retrieves nothing (and head terms never score for mixed queries)") {
    import spark.implicits._
    // 4 train docs all sharing "common" (df=4 > 2) + one rare term
    val docs = Seq(
      (1L, "src1", "common rarey pad1"),
      (2L, "src1", "common pad2 pad2b"),
      (3L, "src1", "common pad3 pad3b"),
      (4L, "src1", "common pad4 pad4b"),
      (100L, "src0", "common"),
      (101L, "src0", "common rarey")).toDF("doc_id", "source", "text")
    val out = CorpusOps.bm25TopkOn(docs)
      .select("query_id", "doc_id", "n_terms").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(!out.exists(_._1 == 100L),
      "all-stopword query must retrieve nothing under the cap")
    val q101 = out.filter(_._1 == 101L)
    assert(q101.map(_._2).toSet == Set(1L),
      s"only the rare-term doc may be retrieved: ${q101.toSeq}")
    assert(q101.forall(_._3 == 1L),
      "the capped term must not score (n_terms must count rarey only)")
    spark.catalog.clearCache()
  }
}
