package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.Row
import graft.streaming.VecDupStream

/** Index-growth curve for the EMBEDDING ingestion gate, in the same
  * un-flakeable quantities as NearDupScaleSpec: task-metric bytes
  * written / bytes read plus a generous wall bound, for a fixed 8-vector
  * probe against a 1× → 5× → 10× index.
  *
  * The vec gate adds one promise the doc gate doesn't make: because the
  * read width p grows with the indexed count (prefix-masking), bucket
  * OCCUPANCY stays near the target as the index grows — so probe reads
  * are bounded by touched partitions × target occupancy, not by index
  * size, even before compaction.
  */
class VecDupScaleSpec extends SparkSpecBase {

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

  /** Deterministic per-id gaussian-ish vectors: ids never repeat, so
    * probes carry no true near-dups and the verified-pair load is
    * candidate-bounded at every index size.
    */
  private def vecsOf(ids: Seq[Long]): Seq[Row] = ids.map { id =>
    val rnd = new scala.util.Random(id)
    Row(id, Seq.fill(64)(rnd.nextGaussian()), "s")
  }

  private def batchDf(rows: Seq[Row]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), VecDupStream.vecSchema)

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

  test("per-batch cost vs index size: writes flat, reads occupancy-bounded, compaction restores the read level") {
    val root = Files.createTempDirectory("graft-vecdup-scale").toString
    val state = s"$root/state"; val out = s"$root/out"

    def seed(ids: Seq[Long], batchId: Long): Unit =
      VecDupStream.applyBatch(spark, state, out, batchDf(vecsOf(ids)), batchId)
    def probe(firstId: Long, batchId: Long): (Double, Long, Long) =
      measured {
        VecDupStream.applyBatch(spark, state, out,
          batchDf(vecsOf(firstId until (firstId + 8L))), batchId)
      }

    seed(1L to 500L, 100L)
    val p1 = probe(9000000L, 200L)
    seed(501L to 2500L, 101L)
    val p5 = probe(9100000L, 201L)
    seed(2501L to 5000L, 102L)
    val p10 = probe(9200000L, 202L)

    val indexBytes = dirBytes(s"$state/buckets") + dirBytes(s"$state/vecs")

    // WRITES: O(batch) — the fold appends its own generation only
    assert(p10._3 <= p1._3 * 3 + (1L << 20),
      s"probe bytes-written grew with index size: 1x=${p1._3} 10x=${p10._3}")
    // READS: one bounded pass, never a multi-pass blowup. Unlike the
    // doc gate's unique-shingle probes (zero candidates), an LSH probe
    // ALWAYS carries ~tables × probes × occupancy candidates, and at
    // this corpus size those ids span every vbucket dir at
    // one-row-group-per-file grain — so the verify read legitimately
    // approaches one pass of the small index here (row-group pruning
    // takes over at production file sizes; the fold writes vec_id-
    // sorted row groups for exactly that). What must NOT happen at any
    // scale: the probe reading a multiple of the index (re-scans per
    // table / per probe / per join leg would show as 4-40x).
    assert(p10._2 <= indexBytes + (1L << 21),
      s"probe read ${p10._2} of a $indexBytes-byte index — the candidate/" +
        "verify path is re-scanning state per table or per probe")
    assert(p10._1 <= p1._1 * 3 + 2.0,
      f"probe wall grew with index size: 1x=${p1._1}%.2f s 10x=${p10._1}%.2f s")

    // compaction consolidates files and must not inflate probe reads
    val (_, before, after) =
      VecDupStream.compactState(spark, state, targetFileBytes = 64L * 1024 * 1024)
    assert(after < before, s"compaction did not consolidate ($before -> $after)")
    // the sizing markers consolidate too (else their file count grows
    // one-per-batch forever) and the merged total is preserved
    val ncountFiles = new java.io.File(s"$state/ncount")
      .listFiles().filter(f => f.isFile && !f.getName.startsWith("."))
    assert(ncountFiles.length == 1,
      s"count markers not consolidated: ${ncountFiles.length} files")
    assert(new String(java.nio.file.Files.readAllBytes(
      ncountFiles.head.toPath), "UTF-8").trim.toLong == 5000L + 3 * 8,
      "consolidated count marker lost the indexed total")
    val pc = probe(9300000L, 203L)
    assert(pc._2 <= p10._2 + (1L << 20),
      s"post-compaction probe reads grew: ${pc._2} vs pre ${p10._2}")
    // ... and once compaction has merged the fragments into sorted
    // multi-row-group files, the vec_id pushdown prunes at row-group
    // grain and the verify read becomes candidate-bounded for real:
    // measured ~12% of the index (vs ~84% over the fragments above)
    assert(pc._2 <= indexBytes * 35 / 100,
      s"post-compaction probe read ${pc._2} of $indexBytes bytes — " +
        "row-group pruning over the compacted sorted files regressed")

    info(f"probe wall/read/written: 1x=${p1._1}%.2fs/${p1._2}/${p1._3}  " +
      f"5x=${p5._1}%.2fs/${p5._2}/${p5._3}  10x=${p10._1}%.2fs/${p10._2}/${p10._3}  " +
      f"postcompact=${pc._1}%.2fs/${pc._2}/${pc._3}  index=${indexBytes}B " +
      s"files $before->$after")
  }
}
