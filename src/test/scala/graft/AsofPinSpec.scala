package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, Row}
import graft.streaming.{IndexStream, LsmIndex}

/** Round 11: the NATIVE as-of read (`queryTopK(asOf = seq)` filters
  * generations in place — no snapshot materialization) and
  * reproducibility pins (a registered pin blocks the compaction
  * barrier until released). Pins:
  *  - as-of answers ≡ snapshotTo + query at EVERY ledger seq of the
  *    fold/fold/delete fixture, for the BM25, phrase, and NEAR faces;
  *  - as-of past a compaction barrier fails fast; at the barrier it
  *    answers as the live state;
  *  - a registered pin makes compactState a no-op (no barrier
  *    recorded, pinned reads still correct); releasing it lets
  *    compaction proceed and the barrier fail-fast then applies;
  *  - a pin above every recorded seq blocks nothing;
  *  - migration carries the ledger (seqs continue, never recycle) and
  *    records itself as a barrier, so pre-migration seqs fail fast
  *    instead of silently answering empty.
  */
class AsofPinSpec extends SparkSpecBase {

  private def docs(rows: Seq[(Long, String)]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, t) =>
        Row(id, t, "s") }),
      IndexStream.docSchema)

  private def fixture: Seq[(Long, String)] = (1L to 30L).map { i =>
    val rnd = new scala.util.Random(i)
    (i, Seq.fill(12)(s"w${rnd.nextInt(60)}").mkString(" "))
  }

  private def queries: DataFrame = {
    import spark.implicits._
    fixture.take(4).map { case (i, t) => (900L + i, t) }
      .toDF("query_id", "text")
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("queryTopK/queryPhrase/queryNear(asOf) equal snapshotTo + query at every ledger seq") {
    val root = Files.createTempDirectory("graft-asof").toString
    val state = s"$root/state"
    val all = fixture
    val (half0, half1) = all.partition(_._1 % 2 == 0)
    IndexStream.applyBatch(spark, state, docs(half0), 0L) // seq 1
    IndexStream.applyBatch(spark, state, docs(half1), 1L) // seq 2
    import spark.implicits._
    IndexStream.deleteDocs(spark, state,
      all.map(_._1).filter(_ % 7 == 2).toDF("doc_id"),
      deleteId = 0L) // seq 3

    for (seq <- 1L to 3L) {
      val snap = s"$root/s$seq"
      IndexStream.snapshotTo(spark, state, snap, asOfSeq = seq)
      assert(rows(IndexStream.queryTopK(spark, state, queries,
          asOf = Some(seq))) ==
        rows(IndexStream.queryTopK(spark, snap, queries)),
        s"BM25 asOf=$seq must equal the seq-$seq snapshot")
      assert(rows(IndexStream.queryPhrase(spark, state, queries,
          asOf = Some(seq))) ==
        rows(IndexStream.queryPhrase(spark, snap, queries)),
        s"phrase asOf=$seq must equal the seq-$seq snapshot")
      assert(rows(IndexStream.queryNear(spark, state, queries,
          asOf = Some(seq))) ==
        rows(IndexStream.queryNear(spark, snap, queries)),
        s"NEAR asOf=$seq must equal the seq-$seq snapshot")
      assert(rows(IndexStream.queryTopKAll(spark, state, queries,
          asOf = Some(seq))) ==
        rows(IndexStream.queryTopKAll(spark, snap, queries)),
        s"MaxScore asOf=$seq must equal the seq-$seq snapshot")
      spark.catalog.clearCache()
    }
    // the fixture is discriminating: the three prefixes answer
    // differently, so the equalities above are not vacuous
    val answers = (1L to 3L).map(seq => rows(
      IndexStream.queryTopK(spark, state, queries, asOf = Some(seq))))
    assert(answers.distinct.size == 3,
      "fixture: each ledger seq must answer differently")
    // asOf at the latest seq equals the live read
    assert(answers.last ==
      rows(IndexStream.queryTopK(spark, state, queries)),
      "asOf at the newest seq must equal the live answer")
  }

  test("dense leg: VecDupStream.queryTopK(asOf) equals snapshotTo + query at every ledger seq") {
    import spark.implicits._
    import graft.streaming.VecDupStream
    val root = Files.createTempDirectory("graft-vasof").toString
    val state = s"$root/state"; val out = s"$root/out"
    def vec(i: Int): Seq[Double] =
      (0 until 64).map(j => math.sin(0.1 * (i * 17 + j * 3) % 31) + 0.1 * j)
    VecDupStream.applyBatch(spark, state, out,
      (0L until 30L).map(i => i -> vec(i.toInt))
        .toDF("vec_id", "embedding"), batchId = 0L) // seq 1
    VecDupStream.applyBatch(spark, state, out,
      (30L until 50L).map(i => i -> vec(i.toInt))
        .toDF("vec_id", "embedding"), batchId = 1L) // seq 2
    VecDupStream.deleteDocs(spark, state,
      Seq(3L, 31L).toDF("vec_id"), deleteId = 0L)   // seq 3

    val probe = Seq((900L, vec(3)), (901L, vec(31)), (902L, vec(45)))
      .toDF("query_id", "embedding")
    for (seq <- 1L to 3L) {
      val snap = s"$root/s$seq"
      VecDupStream.snapshotTo(spark, state, snap, asOfSeq = seq)
      assert(rows(VecDupStream.queryTopK(spark, state, probe, k = 5,
          asOf = Some(seq))) ==
        rows(VecDupStream.queryTopK(spark, snap, probe, k = 5)),
        s"dense asOf($seq) differs from snapshot($seq) + query")
    }
    // the as-of read never sees post-seq state: the seq-1 answer must
    // rank only batch-0 vectors, and the seq-3 one must exclude the
    // deleted ids
    val seq1Ids = VecDupStream.queryTopK(spark, state, probe, k = 5,
      asOf = Some(1L)).select("vec_id").collect().map(_.getLong(0))
    assert(seq1Ids.nonEmpty && seq1Ids.forall(_ < 30L))
    val seq3Ids = VecDupStream.queryTopK(spark, state, probe, k = 5,
      asOf = Some(3L)).select("vec_id").collect().map(_.getLong(0))
    assert(!seq3Ids.contains(3L) && !seq3Ids.contains(31L))
    // and the force-engaged ADC path agrees with its snapshot twin too
    // (the codebook read is generation-filtered like every other)
    assert(rows(VecDupStream.queryTopKTuned(spark, state, probe, 5, None,
        engageMin = 0, exactTail = 4096, allow = None,
        asOf = Some(2L))) ==
      rows(VecDupStream.queryTopKTuned(spark, s"$root/s2", probe, 5,
        None, engageMin = 0, exactTail = 4096)),
      "force-engaged ADC asOf differs from its snapshot twin")
  }

  test("asOf past a compaction barrier fails fast; at the barrier it answers live") {
    val root = Files.createTempDirectory("graft-asof-bar").toString
    val state = s"$root/state"
    val all = fixture
    IndexStream.applyBatch(spark, state, docs(all.take(15)), 0L) // seq 1
    IndexStream.applyBatch(spark, state, docs(all.drop(15)), 1L) // seq 2
    val live = rows(IndexStream.queryTopK(spark, state, queries))
    IndexStream.compactState(spark, state, 64L * 1024 * 1024) // seq 3
    val err = intercept[IllegalArgumentException] {
      IndexStream.queryTopK(spark, state, queries, asOf = Some(2L))
        .collect()
    }
    assert(err.getMessage.contains("barrier"),
      s"pre-barrier asOf must fail fast: ${err.getMessage}")
    assert(rows(IndexStream.queryTopK(spark, state, queries,
        asOf = Some(3L))) == live,
      "asOf at the barrier must answer as the compacted state")
  }

  test("a registered pin blocks compaction (no barrier, pinned reads stay correct); release lets it proceed") {
    val root = Files.createTempDirectory("graft-pin").toString
    val state = s"$root/state"
    val all = fixture
    IndexStream.applyBatch(spark, state, docs(all.take(15)), 0L) // seq 1
    IndexStream.applyBatch(spark, state, docs(all.drop(15)), 1L) // seq 2
    val pinned = rows(IndexStream.queryTopK(spark, state, queries,
      asOf = Some(1L)))

    LsmIndex.Pins(state).register(spark, "train-run-7", 1L)
    val r = IndexStream.compactState(spark, state, 64L * 1024 * 1024)
    assert(r == ((0, 0, 0)), "pinned compaction must be a no-op")
    assert(!LsmIndex.OpLog(state).entries(spark).exists(_._2 == "compact"),
      "pinned compaction must not record a barrier")
    assert(rows(IndexStream.queryTopK(spark, state, queries,
        asOf = Some(1L))) == pinned,
      "the pinned seq must still answer correctly after the no-op")
    // snapshotting the pinned seq still works too
    IndexStream.snapshotTo(spark, state, s"$root/pin-snap", asOfSeq = 1L)

    LsmIndex.Pins(state).release(spark, "train-run-7")
    val r2 = IndexStream.compactState(spark, state, 64L * 1024 * 1024)
    assert(r2._3 > 0, "released pin: compaction must actually run")
    val err = intercept[IllegalArgumentException] {
      IndexStream.queryTopK(spark, state, queries, asOf = Some(1L))
        .collect()
    }
    assert(err.getMessage.contains("barrier"),
      "after release + compaction the stale seq must fail fast")
  }

  test("a pin above every recorded seq does not block maintenance") {
    val root = Files.createTempDirectory("graft-pin-hi").toString
    val state = s"$root/state"
    val all = fixture
    IndexStream.applyBatch(spark, state, docs(all.take(15)), 0L) // seq 1
    IndexStream.applyBatch(spark, state, docs(all.drop(15)), 1L) // seq 2
    LsmIndex.Pins(state).register(spark, "future", 99L)
    val r = IndexStream.compactState(spark, state, 64L * 1024 * 1024)
    assert(r._3 > 0, "a future pin addresses nothing and must not block")
  }

  test("migration carries the ledger and is a barrier: seqs continue, pre-migration asOf fails fast") {
    val root = Files.createTempDirectory("graft-asof-mig").toString
    val state = s"$root/state"
    val all = fixture
    IndexStream.applyBatch(spark, state, docs(all.take(15)), 0L) // seq 1
    IndexStream.applyBatch(spark, state, docs(all.drop(15)), 1L) // seq 2
    // force a migration by stamping a fake older layout version
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(state, "_LAYOUT")
    val out = fs.create(marker, true)
    try out.write("graft-ridx-v0 test-stale".getBytes("UTF-8"))
    finally out.close()
    assert(IndexStream.migrateState(spark, state), "migration must run")

    val es = LsmIndex.OpLog(state).entries(spark)
    assert(es.map(e => (e._1, e._2, e._3)) ==
      Seq((1L, "fold", 0L), (2L, "fold", 1L), (3L, "migrate", 0L)),
      s"ledger must be carried and the migration recorded: $es")
    val err = intercept[IllegalArgumentException] {
      IndexStream.queryTopK(spark, state, queries, asOf = Some(2L))
        .collect()
    }
    assert(err.getMessage.contains("barrier"),
      "pre-migration seqs must fail fast, not answer empty")
    // post-migration operations get FRESH seqs (4...), never recycled
    IndexStream.applyBatch(spark, state, docs(Seq((31L, "new doc here"))),
      2L)
    assert(LsmIndex.OpLog(state).entries(spark).map(_._1).max == 4L,
      "post-migration ops must continue the carried seq numbering")
    // and asOf at the migration barrier answers as the migrated state
    assert(rows(IndexStream.queryTopK(spark, state, queries,
        asOf = Some(3L))).nonEmpty,
      "asOf at the migration barrier must answer over the rebuilt state")
  }
}
