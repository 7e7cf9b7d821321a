package graft

import graft.operators.TrainOps

/** The N-round BPE trainer (TrainOps.bpeTrainN): the production form
  * of the 3-round oracle face. Two pins:
  *
  *  1. Semantics: rounds 1-3 of the N-round loop emit EXACTLY the
  *     bpe_merges rule table — the literal-stamped rewrite is
  *     bit-identical to the crossJoin(broadcast) one, so the two
  *     faces cannot drift.
  *  2. Flat per-round cost at 50 rounds (sf0.01, the verdict's done
  *     condition): with lineage truncated to depth 1 each round, late
  *     rounds cost what early rounds cost. Without truncation the
  *     unrolled plan grows with k and analysis time alone bends the
  *     curve upward. The bound is deliberately generous (3× between
  *     early-round and late-round medians) so contention can't flake
  *     it — plan growth shows up as a monotone many-fold blowup, not
  *     a 2× wobble.
  */
class BpeTrainNSpec extends SparkSpecBase {

  private val sf001 = "/root/testdata/sf0.01"

  test("bpeTrainN rounds 1-3 reproduce the bpe_merges oracle face exactly") {
    val unrolled = TrainOps.bpeMerges(spark, sf)
      .select("step", "l", "r", "merged", "cnt").collect().toSeq
    val (looped, _) = TrainOps.bpeTrainN(spark, sf, 3)
    val loopRows = looped
      .select("step", "l", "r", "merged", "cnt").collect().toSeq
    assert(loopRows == unrolled,
      s"N-round trainer diverged from the oracle face:\n" +
        s"  unrolled: $unrolled\n  looped:   $loopRows")
  }

  test("50 rounds at sf0.01: per-round wall time stays flat (lineage truncation holds)") {
    val (rules, secs) = TrainOps.bpeTrainN(spark, sf001, 50)
    val n = rules.count()
    assert(n > 0, "no merge rules learned")
    assert(secs.size.toLong == math.max(n, secs.size.toLong),
      "per-round timings missing")
    // sf0.01 text has far more than 50 mergeable pairs — the loop must
    // not exhaust early (an early stop would vacuously pass the bound)
    assert(n == 50, s"expected 50 rules, got $n (loop exhausted early)")
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val early = median(secs.slice(5, 15)) // past warm-up wobble
    val late = median(secs.takeRight(10))
    assert(late < early * 3.0 + 0.25,
      f"late rounds ${late}%.2f s vs early ${early}%.2f s — per-round " +
        "cost is growing with round index: lineage truncation regressed " +
        "(plan depth or cached-generation leak)")
  }
}
