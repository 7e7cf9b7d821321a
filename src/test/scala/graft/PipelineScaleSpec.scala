package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.Row
import graft.streaming.PipelineStream

/** End-to-end growth curve for the COMPOSED pipeline (the three
  * per-gate curves exist — NearDupScaleSpec, VecDupScaleSpec,
  * IndexStreamScaleSpec; this pins their SUM): per-batch cost of
  * firehose → both dedup gates → kept-corpus index against a
  * 1× → 5× → 10× accumulated state, in task-metric bytes.
  */
class PipelineScaleSpec extends SparkSpecBase {

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
    Thread.sleep(800)
    spark.sparkContext.removeSparkListener(meter)
    (wall, meter.read.get, meter.written.get)
  }

  /** Deterministic rows: id-seeded filler docs (1000-word vocab) with
    * id-seeded gaussian embeddings — ids never repeat, so probe
    * batches carry no true near-dups and every doc is kept.
    */
  private def rowsOf(ids: Seq[Long]): Seq[Row] = ids.map { id =>
    val rnd = new scala.util.Random(id)
    val text = Seq.fill(40)(s"w${rnd.nextInt(1000)}").mkString(" ")
    Row(id, text, Seq.fill(64)(rnd.nextGaussian()), "s")
  }

  private def batchDf(rows: Seq[Row]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), PipelineStream.rowSchema)

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

  test("composed per-batch cost vs accumulated state: fold writes flat, hybrid query reads a sliver") {
    val root = Files.createTempDirectory("graft-pipescale").toString
    val state = s"$root/state"

    def seed(ids: Seq[Long], batchId: Long): Unit =
      PipelineStream.applyBatch(spark, state, batchDf(rowsOf(ids)), batchId)
    def fold(firstId: Long, batchId: Long): (Double, Long, Long) =
      measured {
        PipelineStream.applyBatch(spark, state,
          batchDf(rowsOf(firstId until (firstId + 8L))), batchId)
      }

    seed(1L to 500L, 100L)
    val f1 = fold(9000000L, 200L)
    seed(501L to 2500L, 101L)
    val f5 = fold(9100000L, 201L)
    seed(2501L to 5000L, 102L)
    val f10 = fold(9200000L, 202L)

    // FOLD WRITES: O(batch) through ALL THREE states — each stage
    // appends only its own generations
    assert(f10._3 <= f1._3 * 3 + (1L << 20),
      s"composed fold bytes-written grew with state size: " +
        s"1x=${f1._3} 10x=${f10._3}")
    info(f"composed fold bytes-written 1x=${f1._3} 5x=${f5._3} 10x=${f10._3}")
    info(f"composed fold wall 1x=${f1._1}%.1f 5x=${f5._1}%.1f 10x=${f10._1}%.1f s")

    // HYBRID QUERY over the full state: correct and read-bounded.
    // doc 42 is indexed (unique filler words by seed); probe its text
    // + its embedding — both legs should agree on it
    import spark.implicits._
    val target = rowsOf(Seq(42L)).head
    val hq = Seq((910L, target.getString(1),
      target.getSeq[Double](2))).toDF("query_id", "text", "embedding")
    var got: Seq[(Long, Int)] = Nil
    val q = measured {
      got = PipelineStream.hybridTopK(spark, state, hq)
        .collect().map(r => (r.getLong(2), r.getInt(4))).toSeq
    }
    assert(got.nonEmpty && got.head._1 == 42L && got.head._2 == 2,
      s"both legs must retrieve the probed doc first: $got")
    val stateBytes = dirBytes(state)
    // the 40-term query touches ~40/256 posting dirs and the dense
    // probe fans over (p+1)×4 bucket dirs; at this one-row-group-per-
    // file grain the touched dirs read whole (measured ~34% — the
    // same grain caveat as the per-gate specs; production file sizes
    // prune at row-group grain). What must NOT happen is an
    // unpruned full-state pass per leg.
    assert(q._2 <= (stateBytes * 2) / 5,
      s"hybrid query read ${q._2} of a $stateBytes-byte state — " +
        "pruning is not engaging")
    info(f"hybrid query bytes-read ${q._2} of $stateBytes state " +
      f"(${100.0 * q._2 / stateBytes}%.1f%%), wall ${q._1}%.1f s")
    spark.catalog.clearCache()
  }
}
