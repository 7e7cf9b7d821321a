package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.{IndexStream, LsmIndex, NearDupStream,
  PipelineStream, VecDupStream}

/** The composed maintenance policy (round 12): `maintainIfDue` orders
  * the lifecycle pieces an operator would otherwise have to sequence
  * by hand — pin check → redomain-if-grown → retrain-if-drifted (vec
  * gate) → compact-if-fragmented — and reports which actions fired.
  * Pinned here: nothing fires on a healthy state; a pin addressing
  * recorded history blocks EVERY structural action even when one is
  * due; drift past the named threshold triggers a retrain that
  * repairs the metric; growth triggers a redomain that subsumes the
  * retrain; the compaction leg consolidates generations; and the
  * pipeline fan-out reports per gate.
  */
class MaintenancePolicySpec extends SparkSpecBase {

  private def unit(axis: Int): Seq[Double] =
    (0 until 64).map(i => if (i == axis) 1.0 else 0.0)

  private def dense(i: Int): Seq[Double] =
    (0 until 64).map(j => 0.3 + 0.01 * ((i * (j + 3)) % 7))

  private def vecsOf(rows: Seq[(Long, Seq[Double])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private val idle =
    LsmIndex.Maintenance(pinned = false, redomained = false,
      retrained = false, compacted = false)

  /** The action fields alone — the vec gate also REPORTS the drift
    * ratio it measured (round 13), which these policy assertions
    * don't pin value-by-value.
    */
  private def acts(m: LsmIndex.Maintenance): LsmIndex.Maintenance =
    m.copy(driftMicro = -1L)

  test("vec gate: pin blocks all actions; drift retrains; growth redomains and subsumes the retrain; compaction fires on cadence") {
    val root = Files.createTempDirectory("graft-maint").toString
    val st = s"$root/state"; val out = s"$root/out"
    VecDupStream.initState(spark, st, expectedVecs = 60)
    VecDupStream.applyBatch(spark, st, out,
      vecsOf((0L until 20L).map(i => i -> unit(i.toInt))), batchId = 0L)

    // healthy small state: nothing is due, nothing fires
    assert(acts(VecDupStream.maintainIfDue(spark, st)) == idle,
      "a healthy state must not trigger maintenance")

    // a same-distribution generation does not trip the drift leg
    VecDupStream.applyBatch(spark, st, out,
      vecsOf((20L until 28L).map(i => i -> unit((i - 20L).toInt))),
      batchId = 1L)
    assert(!VecDupStream.driftRetrainDue(spark, st),
      "same-distribution material must not read as drift")
    assert(acts(VecDupStream.maintainIfDue(spark, st)) == idle)

    // a shifted generation trips it — but a pin addressing recorded
    // history blocks the WHOLE cycle (retrain replaces sub-tables a
    // pinned as-of read still addresses)
    VecDupStream.applyBatch(spark, st, out,
      vecsOf((30L until 38L).map(i => i -> dense(i.toInt))), batchId = 2L)
    assert(VecDupStream.driftRetrainDue(spark, st),
      "the shifted generation must register as drift")
    val staleDrift = VecDupStream.codebookDrift(spark, st).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    LsmIndex.Pins(st).register(spark, "audit", 1L)
    assert(acts(VecDupStream.maintainIfDue(spark, st)) ==
      idle.copy(pinned = true),
      "a pin on recorded history must block every structural action")
    assert(VecDupStream.codebookDrift(spark, st).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap == staleDrift,
      "the blocked cycle must leave the codebook untouched")
    LsmIndex.Pins(st).release(spark, "audit")

    // released: the drift leg fires, the metric collapses — and the
    // report carries the measured ratio that justified it (round 13)
    val r1 = VecDupStream.maintainIfDue(spark, st)
    assert(acts(r1) == idle.copy(retrained = true),
      s"expected exactly the retrain to fire: $r1")
    assert(r1.driftMicro > VecDupStream.driftRetrainRatio * 1000000L,
      s"the retrain cycle must record the drift evidence: $r1")
    val postDrift = VecDupStream.codebookDrift(spark, st).collect()
      .map(r => r.getLong(2))
    assert(postDrift.nonEmpty && postDrift.max < staleDrift(2L),
      "the retrain must repair the shifted family's error")
    assert(!VecDupStream.driftRetrainDue(spark, st),
      "the repaired state must not re-trigger")

    // growth: the redomain leg fires and SUBSUMES the retrain (the
    // rebuild retrains over the grown corpus by construction)
    val r2 = VecDupStream.maintainIfDue(spark, st,
      expectedVecs = Some(1L << 22))
    assert(r2.redomained && !r2.retrained && !r2.pinned,
      s"growth must redomain without a second retrain: $r2")
    assert(VecDupStream.geomOf(spark, st) == VecDupStream.defaultGeom)
    import spark.implicits._
    val hits = VecDupStream.queryTopK(spark, st,
        Seq((900L, dense(31))).toDF("query_id", "embedding"))
      .collect().map(_.getLong(2))
    assert(hits.headOption.contains(31L),
      s"retrieval must survive the maintenance cycle: ${hits.toSeq}")

    // idempotent: the grown, repaired, consolidated state is healthy
    assert(acts(VecDupStream.maintainIfDue(spark, st,
      expectedVecs = Some(1L << 22))) == idle)

    // cadence compaction: fresh generations accrete past maxGen and
    // the compact leg consolidates them
    VecDupStream.applyBatch(spark, st, out,
      vecsOf(Seq(50L -> unit(5))), batchId = 3L)
    VecDupStream.applyBatch(spark, st, out,
      vecsOf(Seq(51L -> unit(7))), batchId = 4L)
    val r3 = VecDupStream.maintainIfDue(spark, st, maxGen = 2)
    assert(r3.compacted && !r3.redomained && !r3.retrained,
      s"expected exactly the compaction to fire: $r3")
    assert(VecDupStream.maxGenerations(spark, st) <= 1,
      "compaction must consolidate the generations")

    // the persisted report log (round 13): one entry per cycle above
    // — idle, idle, pinned, retrained, redomained, idle, compacted —
    // with the retrain's measured drift on its own row. That the
    // EARLY entries are still readable proves the log survived both
    // the redomain's root swap (migrate carries it next to the
    // ledger) and the compaction (which never touches it).
    val log = LsmIndex.MaintLog(st).entries(spark)
    assert(log.map(_._1) == (1L to 7L),
      s"log cycles: ${log.map(_._1)}")
    assert(log(2)._3.pinned && log(3)._3.retrained &&
      log(4)._3.redomained && log(6)._3.compacted,
      s"log actions: ${log.map(_._3)}")
    assert(log(3)._3.driftMicro >
      VecDupStream.driftRetrainRatio * 1000000L,
      s"the retrain entry must carry its evidence: ${log(3)}")
    // cycle 1 has a single generation (no post-training era: -1);
    // cycle 2 measured the same-distribution generation as benign
    assert(log(0)._3.driftMicro == -1L,
      s"a one-era state measures nothing: ${log(0)}")
    assert(log(1)._3.driftMicro >= 0L &&
      log(1)._3.driftMicro <= 2L * 1000000L,
      s"healthy cycles record the benign measurement: ${log(1)}")
  }

  test("index gate: pin blocks; growth redomains; compaction consolidates; retrain never reports") {
    val root = Files.createTempDirectory("graft-maint-r").toString
    val st = s"$root/ridx"
    def doc(i: Int): String = {
      val w = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot")
      (0 until 8).map(j => w((i * 5 + j * 7) % w.length)).mkString(" ")
    }
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize((0L until 30L).map(i =>
        org.apache.spark.sql.Row(i, doc(i.toInt), "s"))),
      IndexStream.docSchema)
    IndexStream.initState(spark, st, expectedDocs = 30)
    IndexStream.applyBatch(spark, st, d, 0L)
    assert(IndexStream.maintainIfDue(spark, st) == idle)

    LsmIndex.Pins(st).register(spark, "hold", 0L)
    assert(IndexStream.maintainIfDue(spark, st,
      expectedDocs = Some(1L << 22)) == idle.copy(pinned = true))
    LsmIndex.Pins(st).release(spark, "hold")

    val r = IndexStream.maintainIfDue(spark, st,
      expectedDocs = Some(1L << 22))
    assert(r.redomained && !r.retrained && !r.compacted, s"$r")
    assert(IndexStream.geomOf(spark, st) == IndexStream.defaultGeom)

    IndexStream.applyBatch(spark, st,
      d.filter(col("doc_id") < 2L)
        .withColumn("doc_id", col("doc_id") + 100L), 1L)
    IndexStream.applyBatch(spark, st,
      d.filter(col("doc_id") < 2L)
        .withColumn("doc_id", col("doc_id") + 200L), 2L)
    val rc = IndexStream.maintainIfDue(spark, st, maxGen = 2)
    assert(rc.compacted && !rc.redomained, s"$rc")
    assert(IndexStream.maxGenerations(spark, st) <= 1)
  }

  test("pipeline fan-out: per-gate reports under txt/vec/ridx keys") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-maint-p").toString
    val batch = (0L until 12L).map { i =>
      (i, s"alpha bravo charlie tail$i word${i % 5} delta echo fox$i",
        unit((i % 20).toInt), "s")
    }.toDF("doc_id", "text", "embedding", "source")
    PipelineStream.applyBatch(spark, root, batch, 0L)
    val rep = PipelineStream.maintainIfDue(spark, root)
    assert(rep.keySet == Set("txt", "vec", "ridx"), s"$rep")
    assert(rep.values.forall(m => !m.pinned && !m.any),
      s"a one-batch pipeline must be healthy: $rep")
    // a pin on the index gate blocks only the index gate
    LsmIndex.Pins(s"$root/ridx_state").register(spark, "hold", 0L)
    val rep2 = PipelineStream.maintainIfDue(spark, root)
    assert(rep2("ridx").pinned && !rep2("txt").pinned &&
      !rep2("vec").pinned, s"$rep2")
    LsmIndex.Pins(s"$root/ridx_state").release(spark, "hold")
  }
}
