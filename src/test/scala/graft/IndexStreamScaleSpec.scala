package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.Row
import graft.streaming.IndexStream

/** Index-growth curve for the RETRIEVAL index gate, in the same
  * un-flakeable quantities as the dedup gates' scale specs:
  * task-metric bytes written / bytes read plus result correctness, for
  * a fixed workload against a 1× → 5× → 10× index.
  *
  * The corpus is built so the measurement isolates the engine from the
  * corpus shape: the query's surviving term is RARE BY CONSTRUCTION
  * (df fixed at 8 as the corpus grows — the Zipf-tail case BM25's
  * rarest-terms pruning is designed around), so the selected posting
  * volume is constant and any read growth is layout overhead
  * (tpfx-dir co-residents at one-row-group-per-file grain), not
  * candidate volume.
  */
class IndexStreamScaleSpec extends SparkSpecBase {

  private class IoMeter extends SparkListener {
    val read = new AtomicLong; val written = new AtomicLong
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        read.addAndGet(m.inputMetrics.bytesRead)
        written.addAndGet(m.outputMetrics.bytesWritten)
      }
    }
  }

  private def measured(f: => Unit): (Double, Long, Long) = {
    val meter = new IoMeter
    spark.sparkContext.addSparkListener(meter)
    val t0 = System.nanoTime()
    f
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(800) // drain the listener bus before reading counters
    spark.sparkContext.removeSparkListener(meter)
    (wall, meter.read.get, meter.written.get)
  }

  /** Deterministic filler docs over a 1000-word vocab; ids 1..8 also
    * carry the rare marker term, so its df stays 8 at every corpus
    * size.
    */
  private def docsOf(ids: Seq[Long]): Seq[Row] = ids.map { id =>
    val rnd = new scala.util.Random(id)
    val filler = Seq.fill(40)(s"w${rnd.nextInt(1000)}").mkString(" ")
    val text = if (id <= 8L) s"xrareq $filler" else filler
    Row(id, text, "s")
  }

  private def batchDf(rows: Seq[Row]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), IndexStream.docSchema)

  private def queriesDf = {
    import spark.implicits._
    Seq((900001L, "xrareq zzunseen1 zzunseen2"))
      .toDF("query_id", "text")
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

  test("cost vs index size: fold writes flat, rare-term query reads stay a sliver of the index, results exact at every size") {
    val root = Files.createTempDirectory("graft-ridx-scale").toString
    val state = s"$root/state"

    def seed(ids: Seq[Long], batchId: Long): Unit =
      IndexStream.applyBatch(spark, state, batchDf(docsOf(ids)), batchId)
    def fold(firstId: Long, batchId: Long): (Double, Long, Long) =
      measured {
        IndexStream.applyBatch(spark, state,
          batchDf(docsOf(firstId until (firstId + 8L))), batchId)
      }
    def query(): ((Double, Long, Long), Set[Long]) = {
      var got: Set[Long] = Set.empty
      val m = measured {
        got = IndexStream.queryTopK(spark, state, queriesDf)
          .select("doc_id").collect().map(_.getLong(0)).toSet
      }
      (m, got)
    }

    seed(1L to 500L, 100L)
    val f1 = fold(9000000L, 200L)
    val (q1, r1) = query()
    seed(501L to 2500L, 101L)
    val f5 = fold(9100000L, 201L)
    val (q5, r5) = query()
    seed(2501L to 5000L, 102L)
    val f10 = fold(9200000L, 202L)
    val (q10, r10) = query()

    // correctness at every size: only the rare term survives selection
    // (the zz terms have no postings), so hits come from docs 1..8
    for ((r, at) <- Seq((r1, "1x"), (r5, "5x"), (r10, "10x"))) {
      assert(r.size == 3 && r.subsetOf((1L to 8L).toSet),
        s"query at $at index must return 3 of the 8 rare-term docs: $r")
    }

    // FOLD WRITES: O(batch) — appends its own generation only
    assert(f10._3 <= f1._3 * 3 + (1L << 20),
      s"fold bytes-written grew with index size: 1x=${f1._3} 10x=${f10._3}")

    // QUERY READS: directory + row-group pruning keeps the read a
    // sliver of the index — the selected term touches 1 of 256 posting
    // dirs and ≤ 8 of 256 doc dirs. At this one-row-group-per-file
    // grain the touched dirs' co-resident terms are read too (prune
    // grain is the row group; production file sizes prune finer), so
    // the bound is a generous share, not a constant.
    val indexBytes = dirBytes(s"$state/postings") + dirBytes(s"$state/docs")
    assert(q10._2 <= indexBytes / 4,
      s"10x query read ${q10._2} of a ${indexBytes}-byte index — " +
        "pruning is not engaging")
    info(f"fold bytes-written 1x=${f1._3} 5x=${f5._3} 10x=${f10._3}")
    info(f"query bytes-read 1x=${q1._2} 5x=${q5._2} 10x=${q10._2} " +
      f"index=$indexBytes")
    info(f"query wall 1x=${q1._1}%.2f 5x=${q5._1}%.2f 10x=${q10._1}%.2f s")

    // compaction: answers hold and the read level does not regress
    IndexStream.compactState(spark, state, 64L * 1024 * 1024)
    val (qc, rc) = query()
    assert(rc == r10, "compaction changed the query answer")
    assert(qc._2 <= q10._2 * 2 + (1L << 20),
      s"post-compaction query read blew up: ${qc._2} vs ${q10._2}")
    info(f"post-compaction query bytes-read ${qc._2}")
  }
}
