package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.Row
import graft.streaming.IndexStream

/** Scale shape of the delete path, in the same un-flakeable
  * task-metric quantities as IndexStreamScaleSpec: a FIXED-size delete
  * against a 1× → 4× index must not scan the index (its reads are
  * bounded by the deleted ids' dbucket dirs — a 256th of the docs
  * sub-table each — never the corpus), its writes are O(deleted)
  * regardless of index size, and a query AFTER the delete reads no
  * more posting bytes than before it (the tombstone anti-join is
  * candidate-side; posting fetch volume is unchanged).
  */
class DeleteScaleSpec extends SparkSpecBase {

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

  private def measured(f: => Unit): (Long, Long) = {
    val meter = new IoMeter
    spark.sparkContext.addSparkListener(meter)
    f
    Thread.sleep(800) // drain the listener bus before reading counters
    spark.sparkContext.removeSparkListener(meter)
    (meter.read.get, meter.written.get)
  }

  /** Deterministic filler docs over a 1000-word vocab; ids 1..8 carry
    * the rare query term (df fixed at 8 at every corpus size — the
    * query workload is constant by construction). The DELETED ids are
    * filler-only, so the delete never changes the query's candidate
    * volume — any post-delete read growth is pure delete overhead.
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

  private def indexBytes(state: String): Long = {
    val p = new org.apache.hadoop.fs.Path(state)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var n = 0L
    while (it.hasNext) { val s = it.next(); if (s.isFile) n += s.getLen }
    n
  }

  test("fixed delete: writes flat as the index grows 4x, reads a sliver of the index, query reads do not grow post-delete") {
    val root = Files.createTempDirectory("graft-del-scale").toString
    val deletedIds = (101L to 116L)
    import spark.implicits._

    def build(state: String, n: Long): Unit =
      (0 until 2).foreach { b =>
        IndexStream.applyBatch(spark, state,
          batchDf(docsOf((1L + b * n / 2) to ((b + 1) * n / 2))),
          b.toLong)
      }

    // 1× index
    val s1 = s"$root/s1"
    build(s1, 800L)
    val (_, w1) = measured {
      assert(IndexStream.deleteDocs(spark, s1,
        deletedIds.toDF("doc_id"), 0L) == 16L)
    }

    // 4× index
    val s4 = s"$root/s4"
    build(s4, 3200L)
    val bytes4 = indexBytes(s4)
    val (qr4pre, _) = measured {
      IndexStream.queryTopK(spark, s4, queriesDf).collect()
    }
    val (r4, w4) = measured {
      assert(IndexStream.deleteDocs(spark, s4,
        deletedIds.toDF("doc_id"), 0L) == 16L)
    }
    val (qr4post, _) = measured {
      IndexStream.queryTopK(spark, s4, queriesDf).collect()
    }

    // delete WRITES are O(deleted): the same 16 docs cost the same
    // negative-df + tombstone bytes whatever the index size (generous
    // 2x slack for parquet footer variance)
    assert(w4 <= w1 * 2,
      s"delete writes grew with the index: 1x=$w1 B, 4x=$w4 B")
    // delete READS never scan the index: the membership fetch is
    // dbucket-dir-pruned to the deleted ids' buckets (16 of 256 dirs)
    assert(r4 <= bytes4 / 2,
      s"delete read half the index ($r4 of $bytes4 B) — dir pruning lost")
    // a query after the delete reads no more than before it (tombstone
    // relation is O(deleted); posting fetch volume unchanged)
    assert(qr4post <= (qr4pre * 1.3).toLong + 64 * 1024,
      s"post-delete query reads grew: pre=$qr4pre B, post=$qr4post B")
  }
}
