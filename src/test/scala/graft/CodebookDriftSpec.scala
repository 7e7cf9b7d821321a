package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.VecDupStream

/** Codebook drift metric (round 11): the vec gate's PQ codebook is
  * frozen at first fold, so a moving embedding distribution quantizes
  * progressively worse and the ADC pre-rank silently degrades;
  * `codebookDrift` surfaces the staleness as per-generation mean
  * quantization error over a deterministic sample. Pinned here: a
  * same-distribution generation scores like the training generation, a
  * shifted generation scores far above it (the retrain signal), the
  * metric is deterministic, and a migration retrain collapses the
  * shifted family's error.
  */
class CodebookDriftSpec extends SparkSpecBase {

  private def unit(axis: Int): Seq[Double] =
    (0 until 64).map(i => if (i == axis) 1.0 else 0.0)

  // a dense pattern the one-hot-trained codebook has never seen
  private def dense(i: Int): Seq[Double] =
    (0 until 64).map(j => 0.3 + 0.01 * ((i * (j + 3)) % 7))

  private def vecsOf(rows: Seq[(Long, Seq[Double])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("a shifted generation's quantization error flags the frozen codebook; migration retrain absorbs it") {
    val root = Files.createTempDirectory("graft-drift").toString
    val state = s"$root/state"; val out = s"$root/out"

    // gen 0 trains the codebook: 20 one-hot vectors
    VecDupStream.applyBatch(spark, state, out,
      vecsOf((0L until 20L).map(i => i -> unit(i.toInt))), batchId = 0L)
    // gen 1: the SAME distribution (copies of training vectors under
    // new ids — the gate may flag them as dups; they still index)
    VecDupStream.applyBatch(spark, state, out,
      vecsOf((20L until 28L).map(i => i -> unit((i - 20L).toInt))),
      batchId = 1L)
    // gen 2: a SHIFTED distribution — dense patterns
    VecDupStream.applyBatch(spark, state, out,
      vecsOf((30L until 38L).map(i => i -> dense(i.toInt))), batchId = 2L)

    val drift = VecDupStream.codebookDrift(spark, state).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(drift.keySet == Set(0L, 1L, 2L),
      s"one row per generation: ${drift.keySet}")
    assert(drift.values.forall(_._1 > 0), s"empty samples: $drift")
    val (e0, e1, e2) = (drift(0L)._2, drift(1L)._2, drift(2L)._2)
    // same-distribution generation scores like training-era material;
    // the shifted generation is the unambiguous retrain signal
    assert(e1 <= math.max(2L * e0, 1000L),
      s"same-distribution gen must not drift: e0=$e0 e1=$e1")
    assert(e2 > 2L * math.max(e0, math.max(e1, 1L)),
      s"shifted gen must stand out: e0=$e0 e1=$e1 e2=$e2")

    // deterministic: same sample, same integers, on every call
    val again = VecDupStream.codebookDrift(spark, state).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(again == drift, s"metric must be deterministic: $again vs $drift")

    // the empty-state contract: no codebook -> empty metric, not a throw
    val fresh = s"$root/fresh"
    VecDupStream.applyBatch(spark, fresh, s"$root/out2",
      vecsOf(Seq.empty), batchId = 0L)
    assert(VecDupStream.codebookDrift(spark, fresh).isEmpty,
      "a codebook-less state must yield an empty metric")

    // the remedy: retrain from the full surviving corpus and re-encode
    // — the shifted family's error collapses (every generation now
    // sits below the stale book's error on gen 2), and retrieval still
    // answers over the re-encoded codes
    assert(VecDupStream.retrainCodebook(spark, state),
      "retrain over a populated state must run")
    val post = VecDupStream.codebookDrift(spark, state).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(post.nonEmpty && post.values.max < e2,
      s"retrained codebook must beat the stale one on the shifted " +
        s"family: post=$post vs stale e2=$e2")
    import spark.implicits._
    val hits = VecDupStream.queryTopK(spark, state,
        Seq((900L, dense(31))).toDF("query_id", "embedding"))
      .collect().map(r => r.getLong(2))
    assert(hits.headOption.contains(31L),
      s"retrieval after retrain must still rank the true neighbor " +
        s"first: ${hits.toSeq}")

    // retrain is idempotent: a second run (e.g. a crash retry)
    // converges to the same metric
    assert(VecDupStream.retrainCodebook(spark, state))
    val post2 = VecDupStream.codebookDrift(spark, state).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(post2 == post, s"retrain retry must converge: $post2 vs $post")
  }
}
