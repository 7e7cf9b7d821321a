package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.{canon, canonOrderSql, load}
import graft.functions.Fns

/** Corpus-management operators a training-data pipeline runs between
  * ingest and training: statistical fluency scoring, per-source
  * sampling caps, and one-pass data profiling.
  *
  * All arithmetic that crosses an aggregation is exact-integer
  * (µ-unit floor quantization) so results hash-match the DuckDB
  * oracle regardless of summation order — see the probability and
  * ratio rules shared by centroid_residuals / repetition_stats.
  */
object CorpusOps {

  // ---------------------------------------------------------------------
  // bigram_lm — CCNet-style statistical fluency scoring
  // ---------------------------------------------------------------------

  /** The per-document bigram relation (with source, for held-out
    * splits): one explode of the token array — no join builds pairs.
    * Persisted because each LM query consumes it twice (model build +
    * scoring); the callers clear caches between queries, so the reuse
    * is intra-query.
    */
  private def bigramRel(spark: SparkSession, sfDir: String): DataFrame = {
    val d = load(spark, sfDir, "documents")
    Caching.persistOnce(
      d.select(col("doc_id"), col("source"),
          split(col("text"), " ").as("toks"))
        .select(col("doc_id"), col("source"), expr(
          """explode(transform(
            |  if(size(toks) > 1, sequence(1, size(toks) - 1), array_repeat(1, 0)),
            |  i -> struct(toks[i-1] AS w1, toks[i] AS w2))) AS bg""".stripMargin))
        .select(col("doc_id"), col("source"),
          col("bg.w1").as("w1"), col("bg.w2").as("w2")))
  }

  /** Conditional-probability model in exact µ-units over a bigram set. */
  private def lmModel(bigrams: DataFrame): DataFrame =
    bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      .withColumn("c1", sum(col("c2")).over(Window.partitionBy("w1")))
      .select(col("w1"), col("w2"),
        expr("(c2 * 1000000L) div c1").as("p_micro"))

  /** Bigram language-model scoring: train conditional bigram
    * probabilities p(w2|w1) on the corpus itself, then score every
    * document by its mean (and minimum) bigram probability — the
    * classic perplexity-style quality gate (CCNet) without the libm
    * `log`, which is not bit-portable across engines. Probabilities
    * are exact integers in µ-units: p_micro = (c(w1,w2)*1e6) div
    * c(w1,·), so sums and means are order-free.
    *
    * Scale: the model aggregates to DISTINCT-BIGRAM cardinality —
    * bounded by vocabulary², not corpus size — and the scoring join
    * shuffles on (w1,w2) with map-side partial aggregation on doc_id
    * afterwards. No forced broadcast: the model scales with type
    * count, so AQE decides (it will broadcast for any natural-language
    * vocabulary, but nothing breaks if a garbage corpus explodes the
    * type count).
    */
  def bigramLm(spark: SparkSession, sfDir: String): DataFrame = {
    val bigrams = bigramRel(spark, sfDir)
    val model = lmModel(bigrams)
    val out = bigrams.join(model, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(p_micro) div count(1)").as("avg_p_micro"),
        min(col("p_micro")).as("min_p_micro"))
    canon(out)
  }

  val bigramLmSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
       |), bg AS (
       |  SELECT doc_id, t[i.i - 1] AS w1, t[i.i] AS w2
       |  FROM toks, unnest(generate_series(2, len(t))) AS i(i)
       |), model AS (
       |  SELECT w1, w2,
       |    CAST((count(*) * 1000000) //
       |      (sum(count(*)) OVER (PARTITION BY w1)) AS BIGINT) AS p_micro
       |  FROM bg GROUP BY w1, w2
       |)
       |SELECT doc_id, count(*) AS n_bigrams,
       |  CAST(sum(p_micro) // count(*) AS BIGINT) AS avg_p_micro,
       |  CAST(min(p_micro) AS BIGINT) AS min_p_micro
       |FROM bg JOIN model USING (w1, w2)
       |GROUP BY doc_id
       |${canonOrderSql(Seq("doc_id", "n_bigrams", "avg_p_micro", "min_p_micro"))}""".stripMargin

  /** The source held out of LM training (and the only one scored). */
  private val heldoutSrc = "src0"

  /** Held-out LM scoring — the train/test discipline the in-corpus
    * variant lacks: the model trains on every source EXCEPT
    * [[heldoutSrc]] and scores only its documents, so a document never
    * contributes to the probabilities that judge it. Unseen bigrams
    * surface as an explicit OOV count (left join; the inner-join
    * variant would silently drop them) and the mean covers scored
    * bigrams only — NULL when everything is OOV, never a fake zero.
    * (The shared-vocabulary fixtures produce zero OOV rows, so the OOV
    * path is pinned by CorpusOpsSpec on a constructed corpus with a
    * genuinely unseen bigram.)
    *
    * Same shapes and scale behavior as [[bigramLm]]; the split is a
    * filter over the shared bigram relation.
    */
  def bigramLmHeldout(spark: SparkSession, sfDir: String): DataFrame = {
    val bigrams = bigramRel(spark, sfDir)
    val model = lmModel(bigrams.filter(col("source") =!= heldoutSrc))
    val out = bigrams.filter(col("source") === heldoutSrc)
      .join(model, Seq("w1", "w2"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        count(col("p_micro")).as("n_scored"),
        (count(lit(1)) - count(col("p_micro"))).as("n_oov"),
        when(count(col("p_micro")) > 0,
          expr("sum(p_micro) div count(p_micro)")).as("avg_p_micro"),
        min(col("p_micro")).as("min_p_micro"))
    canon(out)
  }

  val bigramLmHeldoutSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
       |), bg AS (
       |  SELECT doc_id, source, t[i.i - 1] AS w1, t[i.i] AS w2
       |  FROM toks, unnest(generate_series(2, len(t))) AS i(i)
       |), model AS (
       |  SELECT w1, w2,
       |    CAST((count(*) * 1000000) //
       |      (sum(count(*)) OVER (PARTITION BY w1)) AS BIGINT) AS p_micro
       |  FROM bg WHERE source <> '$heldoutSrc' GROUP BY w1, w2
       |), scored AS (
       |  SELECT b.doc_id, m.p_micro
       |  FROM bg b LEFT JOIN model m ON b.w1 = m.w1 AND b.w2 = m.w2
       |  WHERE b.source = '$heldoutSrc'
       |)
       |SELECT doc_id, count(*) AS n_bigrams,
       |  count(p_micro) AS n_scored,
       |  count(*) - count(p_micro) AS n_oov,
       |  CASE WHEN count(p_micro) > 0
       |    THEN CAST(sum(p_micro) // count(p_micro) AS BIGINT) END AS avg_p_micro,
       |  CAST(min(p_micro) AS BIGINT) AS min_p_micro
       |FROM scored
       |GROUP BY doc_id
       |${canonOrderSql(Seq("doc_id", "n_bigrams", "n_scored", "n_oov",
         "avg_p_micro", "min_p_micro"))}""".stripMargin

  // ---------------------------------------------------------------------
  // pmi_cooccur — pointwise mutual information word association
  // ---------------------------------------------------------------------

  /** Associations below this pair frequency are noise — dropped. */
  private val pmiMinSupport = 5L

  /** PMI word-association mining over adjacent pairs: for each bigram
    * with support ≥ [[pmiMinSupport]], the pointwise mutual information
    * ratio p(w1,w2)/(p(w1)·p(w2)) — equivalently c12·N/(c1·c2) — in
    * exact µ-units (single integer division at the end, so no libm log
    * and no float summation anywhere). >1e6 means the pair co-occurs
    * more than independence predicts — the collocation detector behind
    * phrase-vocabulary induction.
    *
    * Scale: everything downstream of the one bigram groupBy runs at
    * DISTINCT-BIGRAM cardinality (vocab²-bounded, like the LM model
    * build); the marginals are windows over that bounded relation
    * keyed by w1/w2, and N attaches as a 1-row broadcast stamp. Both
    * the numerator c12·N·1e6 and the denominator c1·c2 are computed in
    * 128-bit exact arithmetic (DECIMAL(38,0) on Spark, HUGEINT in the
    * oracle): in BIGINT the numerator wraps once c12·N exceeds ~9.2e12
    * — for a frequent collocation (c12 ∝ N) that is only a few million
    * bigrams, and Spark longs wrap SILENTLY while DuckDB raises, so
    * the overflow would not even fail loudly. The widened relation is
    * the bounded distinct-bigram one, so the cost is nil.
    */
  def pmiCooccur(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = bigramRel(spark, sfDir)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val tot = pairs.agg(sum(col("c12")).as("n_total"))
    val out = pairs
      .withColumn("c1", sum(col("c12")).over(Window.partitionBy("w1")))
      .withColumn("c2", sum(col("c12")).over(Window.partitionBy("w2")))
      .crossJoin(broadcast(tot))
      .filter(col("c12") >= pmiMinSupport)
      .select(col("w1"), col("w2"), col("c12"),
        expr("cast((cast(c12 as decimal(38,0)) * n_total * 1000000) div " +
          "(cast(c1 as decimal(38,0)) * c2) as bigint)").as("pmi_micro"))
    canon(out)
  }

  val pmiCooccurSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
       |), bg AS (
       |  SELECT doc_id, t[i.i - 1] AS w1, t[i.i] AS w2
       |  FROM toks, unnest(generate_series(2, len(t))) AS i(i)
       |), p AS (
       |  SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2
       |), t AS (
       |  SELECT sum(c12) AS n_total FROM p
       |), m AS (
       |  SELECT w1, w2, c12,
       |    sum(c12) OVER (PARTITION BY w1) AS c1,
       |    sum(c12) OVER (PARTITION BY w2) AS c2
       |  FROM p
       |)
       |SELECT w1, w2, c12,
       |  CAST((CAST(c12 AS HUGEINT) * n_total * 1000000)
       |    // (CAST(c1 AS HUGEINT) * c2) AS BIGINT) AS pmi_micro
       |FROM m, t WHERE c12 >= $pmiMinSupport
       |${canonOrderSql(Seq("w1", "w2", "c12", "pmi_micro"))}""".stripMargin

  // ---------------------------------------------------------------------
  // stratified_sample — deterministic per-source document caps
  // ---------------------------------------------------------------------

  /** Per-stratum sampling cap: keep at most K documents per `source`,
    * chosen by a salted-hash ranking (the mixture_sample discipline:
    * RNG-free, so the sample is identical at any partitioning and
    * resumable). The real-pipeline use is per-domain caps before
    * training so one crawler domain cannot dominate the mixture.
    *
    * Scale: one shuffle keyed by source for the per-stratum
    * row_number. A pathologically hot stratum serializes its own
    * window; domains at corpus scale are many and the cap output is
    * K·|strata| — both bounded.
    */
  private val stratCap = 10

  def stratifiedSample(spark: SparkSession, sfDir: String): DataFrame = {
    val d = load(spark, sfDir, "documents")
    val u = expr(
      "cast(conv(substr(md5(concat('strat:', cast(doc_id as string))), 1, 8), 16, 10) as bigint)")
    val rk = row_number().over(
      Window.partitionBy(col("source")).orderBy(col("u"), col("doc_id")))
    val out = d.select(col("doc_id"), col("source"), u.as("u"))
      .withColumn("rk", rk)
      .filter(col("rk") <= stratCap)
      .select(col("doc_id"), col("source"), col("rk"))
    canon(out)
  }

  val stratifiedSampleSql: String =
    s"""WITH ranked AS (
       |  SELECT doc_id, source,
       |    row_number() OVER (
       |      PARTITION BY source
       |      ORDER BY ('0x' || substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
       |               doc_id) AS rk
       |  FROM documents
       |)
       |SELECT doc_id, source, rk FROM ranked WHERE rk <= $stratCap
       |${canonOrderSql(Seq("doc_id", "source", "rk"))}""".stripMargin

  // ---------------------------------------------------------------------
  // temperature_sample — sqrt-temperature source rebalancing
  // ---------------------------------------------------------------------

  /** Target-count scale: target = floor(sqrt(n_source · 25)), so a
    * source of ≤25 docs keeps everything and larger sources keep ~5·√n.
    */
  private val tempScale = 25L

  /** Temperature-based source rebalancing (the multilingual-mixture
    * move: sampling sources ∝ n^α with α<1 so head domains stop
    * drowning tail domains): per source keep floor(sqrt(n·25)) docs —
    * α=0.5 exactly. sqrt is the one temperature exponent that is
    * BIT-PORTABLE across engines (IEEE sqrt is correctly rounded
    * everywhere; pow(x, 0.7) is not), and the target is a per-source
    * expression with no cross-source float sum, so the oracle
    * hash-matches with zero float hazard. Selection is the
    * salted-hash ranking discipline (RNG-free, partitioning-independent,
    * resumable) shared with stratified/mixture_sample.
    *
    * Scale: one bounded groupBy for counts (broadcast back), one
    * source-keyed window for the ranking — same shape as
    * stratified_sample, whose hot-stratum caveat applies unchanged.
    */
  def temperatureSample(spark: SparkSession, sfDir: String): DataFrame = {
    val d = load(spark, sfDir, "documents")
    val counts = d.groupBy(col("source")).agg(count(lit(1)).as("n_source"))
      .withColumn("target_n", greatest(lit(1L),
        expr(s"cast(floor(sqrt(cast(n_source as double) * $tempScale.0)) as bigint)")))
    val u = expr(
      "cast(conv(substr(md5(concat('temp:', cast(doc_id as string))), 1, 8), 16, 10) as bigint)")
    val rk = row_number().over(
      Window.partitionBy(col("source")).orderBy(col("u"), col("doc_id")))
    val out = d.select(col("doc_id"), col("source"), u.as("u"))
      .withColumn("pick_rank", rk)
      .join(broadcast(counts), Seq("source")) // source domain is bounded
      .filter(col("pick_rank") <= col("target_n"))
      .select(col("doc_id"), col("source"), col("n_source"),
        col("target_n"), col("pick_rank"))
    canon(out)
  }

  val temperatureSampleSql: String =
    s"""WITH c AS (
       |  SELECT source, count(*) AS n_source FROM documents GROUP BY 1
       |), t AS (
       |  SELECT source, n_source,
       |    greatest(CAST(1 AS BIGINT),
       |      CAST(floor(sqrt(CAST(n_source AS DOUBLE) * $tempScale.0)) AS BIGINT))
       |      AS target_n
       |  FROM c
       |), ranked AS (
       |  SELECT doc_id, source,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY ('0x' || substr(md5('temp:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
       |               doc_id) AS pick_rank
       |  FROM documents
       |)
       |SELECT r.doc_id, r.source, t.n_source, t.target_n, r.pick_rank
       |FROM ranked r JOIN t USING (source)
       |WHERE r.pick_rank <= t.target_n
       |${canonOrderSql(Seq("doc_id", "source", "n_source", "target_n",
         "pick_rank"))}""".stripMargin

  // ---------------------------------------------------------------------
  // table_profile — one-pass per-column data profiling
  // ---------------------------------------------------------------------

  /** Column profiler over lineitem: per column, row count, null count,
    * exact distinct count, and canonical min/max strings — the
    * data-quality snapshot a pipeline records before/after each load.
    *
    * Plan shape (r4, Expand-free): counts and typed min/max come from
    * ONE non-distinct aggregation pass (map-side partials, 1-row
    * output, `stack`-pivoted to a row per column); exact distincts come
    * from [[meltDistinct]] — the multi-DISTINCT formulation Catalyst
    * plans as an Expand was measured 2× slower and is gone from both
    * faces. min/max are taken on the TYPED value and stringified after
    * (string-ordering min would be wrong for numerics); doubles
    * canonicalize via DECIMAL(18,2), timestamps via the shared µs
    * format.
    */
  private val profileCols: Seq[(String, String)] = Seq(
    // (column, kind) — kind selects the canonical string conversion
    "l_orderkey" -> "int", "l_partkey" -> "int", "l_suppkey" -> "int",
    "l_linenumber" -> "int", "l_quantity" -> "num2",
    "l_extendedprice" -> "num2", "l_discount" -> "num2", "l_tax" -> "num2",
    "l_returnflag" -> "str", "l_linestatus" -> "str", "l_shipdate" -> "ts")

  private def canonStr(kind: String, c: Column): Column = kind match {
    case "int"  => c.cast("string")
    case "num2" => Fns.canonNum(c)
    case "str"  => c
    case "ts"   => Fns.tsStr(c)
  }

  private def canonStrSql(kind: String, e: String): String = kind match {
    case "int"  => s"CAST($e AS VARCHAR)"
    case "num2" => s"CAST(CAST($e AS DECIMAL(18,2)) AS VARCHAR)"
    case "str"  => e
    case "ts"   => s"strftime($e, '%Y-%m-%d %H:%M:%S.%f')"
  }

  /** Exact per-column distinct counts WITHOUT an Expand: melt the
    * profiled columns to (column_name, canonical_value) pairs with one
    * Generate, then a SINGLE-distinct aggregate — Catalyst's
    * single-distinct rewrite plans it as a two-stage agg keyed on the
    * pair. Shared by the exact and approx profiler faces. Measured ~2×
    * cheaper than the multi-DISTINCT Expand plan at sf0.1: the Expand
    * replicates full-width rows once per profiled column; the melt
    * shuffles narrow pairs.
    */
  /** (column_name, canonical_value) pairs — one Generate, 11 narrow
    * rows per source row, shared by both profiler faces.
    */
  private def meltPairs(li: DataFrame): DataFrame = {
    val pairs = profileCols.map { case (c, kind) =>
      struct(lit(c).as("column_name"), canonStr(kind, col(c)).as("v"))
    }
    li.select(explode(array(pairs: _*)).as("p"))
      .select(col("p.column_name").as("column_name"), col("p.v").as("v"))
  }

  private def meltDistinct(li: DataFrame): DataFrame =
    meltPairs(li)
      .groupBy(col("column_name"))
      .agg(countDistinct(col("v")).as("n_distinct"))

  def tableProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val li = load(spark, sfDir, "lineitem")
    // one NON-distinct pass for counts and typed min/max (map-side
    // partials, 1-row output) ...
    val aggs = count(lit(1)).as("n_rows") +: profileCols.flatMap {
      case (c, kind) => Seq(
        count(col(c)).as(s"np_$c"),
        canonStr(kind, min(col(c))).as(s"mn_$c"),
        canonStr(kind, max(col(c))).as(s"mx_$c"))
    }
    val metrics = li.agg(aggs.head, aggs.tail: _*)
    val stackArgs = profileCols.map { case (c, _) =>
      s"'$c', np_$c, mn_$c, mx_$c"
    }.mkString(", ")
    val wide = metrics.selectExpr("n_rows",
      s"stack(${profileCols.size}, $stackArgs) AS (column_name, n_present, min_s, max_s)")
    // ... joined with the Expand-free exact distincts (11 rows × 11 rows)
    val out = wide.join(meltDistinct(li), Seq("column_name"))
      .select(col("column_name"), col("n_rows"),
        (col("n_rows") - col("n_present")).as("n_nulls"),
        col("n_distinct"), col("min_s"), col("max_s"))
    canon(out)
  }

  val tableProfileSql: String = profileCols.map { case (c, kind) =>
    s"""SELECT '$c' AS column_name, count(*) AS n_rows,
       |  count(*) - count($c) AS n_nulls,
       |  count(DISTINCT $c) AS n_distinct,
       |  ${canonStrSql(kind, s"min($c)")} AS min_s,
       |  ${canonStrSql(kind, s"max($c)")} AS max_s
       |FROM lineitem""".stripMargin
  }.mkString("", "\nUNION ALL\n", "\n" +
    canonOrderSql(Seq("column_name", "n_rows", "n_nulls", "n_distinct",
      "min_s", "max_s")))

  /** The sketch face of [[tableProfile]]: per-column distinct counts as
    * HLL sketches (`approx_count_distinct`, rsd 2%) checked against the
    * exact anchor the oracle gate needs — `hll_ok` asserts each sketch
    * landed within 10% of exact (5σ at rsd 2%), so a sketch regression
    * hash-mismatches.
    *
    * Plan shape (r6): ONE scan — sketch and exact ride the same
    * [[meltPairs]] Generate and aggregate in one two-phase groupBy
    * (Catalyst's single-distinct rewrite: partial agg on
    * (column_name, v), final on column_name — no Expand, asserted by
    * PlanHygieneSpec). The previous shape ran the HLL pass as its own
    * full scan beside the melt and joined them: the imperative HLL agg
    * is non-codegen, so that stage cost ~4 s cold and its 32 tasks
    * contended with the melt's — 5.9 s driver-mode vs 1.1 s exact
    * (round-5 verdict item). Sharing the scan measured ~5× cheaper.
    *
    * 100 TB mode: drop the countDistinct column and the SAME plan
    * map-side combines — the Generate multiplies rows in the pipeline
    * (no materialization), and the only shuffle is 11 × n_tasks sketch
    * partials. The exact anchor is what turns it into corpus×K pair
    * shuffles; production profiling runs the sketch columns alone.
    */
  def tableProfileApprox(spark: SparkSession, sfDir: String): DataFrame = {
    val li = load(spark, sfDir, "lineitem")
    val out = meltPairs(li).groupBy(col("column_name"))
      .agg(
        count(lit(1)).as("n_rows"), // every source row melts to 11 pairs
        count(col("v")).as("n_present"),
        countDistinct(col("v")).as("n_distinct"),
        approx_count_distinct(col("v"), 0.02).as("approx_nd"))
      .select(col("column_name"), col("n_rows"),
        (col("n_rows") - col("n_present")).as("n_nulls"),
        col("n_distinct"),
        when(col("n_distinct") === 0,
          when(col("approx_nd") === 0, 1).otherwise(0))
          .otherwise(
            when(abs(col("approx_nd") - col("n_distinct")).cast("double")
              / col("n_distinct").cast("double") <= 0.1, 1).otherwise(0))
          .as("hll_ok"))
    canon(out)
  }

  val tableProfileApproxSql: String = profileCols.map { case (c, kind) =>
    s"""SELECT '$c' AS column_name, count(*) AS n_rows,
       |  count(*) - count($c) AS n_nulls,
       |  count(DISTINCT ${canonStrSql(kind, c)}) AS n_distinct,
       |  1 AS hll_ok
       |FROM lineitem""".stripMargin
  }.mkString("", "\nUNION ALL\n", "\n" +
    canonOrderSql(Seq("column_name", "n_rows", "n_nulls", "n_distinct",
      "hll_ok")))

  // ---------------------------------------------------------------------
  // length_outliers — IQR-fence outlier flagging on exact quantiles
  // ---------------------------------------------------------------------

  /** Tukey-fence outlier flagging: per language, documents whose length
    * falls outside [q1 − 1.5·IQR, q3 + 1.5·IQR] — the standard
    * distribution-aware cleaning gate (a fixed length threshold is
    * wrong for every language at once). Quantiles are EXACT rank
    * statistics (the approx_quantiles discipline: ceil-div rank
    * targets, integer arithmetic end to end — 1.5·IQR becomes
    * (3·IQR) div 2), so the fences and flags are bit-identical across
    * engines.
    *
    * Scale: the rank window partitions by lang — the documented exact
    * baseline (per-group serialization); the shipped 100 TB shape is
    * [[lengthOutliersApprox]], which swaps the rank statistic for a
    * mergeable percentile_approx sketch with fences unchanged. The
    * per-lang fence relation is domain-bounded, so the enrich join
    * broadcasts.
    */
  /** Exact per-language Tukey fences via rank statistics — shared by the
    * exact and approx outlier faces.
    */
  private def exactLengthFences(d: DataFrame): DataFrame = {
    val w = Window.partitionBy("lang").orderBy(col("n_chars"), col("doc_id"))
    val ranked = d
      .withColumn("rk", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("lang")))
    ranked.groupBy(col("lang"))
      .agg(
        min(when(col("rk") === expr("(cnt * 25 + 99) div 100"),
          col("n_chars"))).as("q1"),
        min(when(col("rk") === expr("(cnt * 75 + 99) div 100"),
          col("n_chars"))).as("q3"))
      .select(col("lang"),
        expr("q1 - (3 * (q3 - q1)) div 2").as("lo"),
        expr("q3 + (3 * (q3 - q1)) div 2").as("hi"))
  }

  def lengthOutliers(spark: SparkSession, sfDir: String): DataFrame = {
    val d = load(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val fences = exactLengthFences(d)
    val out = d.join(broadcast(fences), Seq("lang")) // lang domain is bounded
      .select(col("doc_id"), col("lang"), col("n_chars"),
        col("lo"), col("hi"),
        when(col("n_chars") < col("lo") || col("n_chars") > col("hi"), 1)
          .otherwise(0).as("is_outlier"))
    canon(out)
  }

  val lengthOutliersSql: String =
    s"""WITH ranked AS (
       |  SELECT doc_id, lang, n_chars,
       |    row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rk,
       |    count(*) OVER (PARTITION BY lang) AS cnt
       |  FROM documents
       |), fences AS (
       |  SELECT lang,
       |    min(CASE WHEN rk = (cnt * 25 + 99) // 100 THEN n_chars END) AS q1,
       |    min(CASE WHEN rk = (cnt * 75 + 99) // 100 THEN n_chars END) AS q3
       |  FROM ranked GROUP BY lang
       |), f AS (
       |  SELECT lang, q1 - (3 * (q3 - q1)) // 2 AS lo,
       |    q3 + (3 * (q3 - q1)) // 2 AS hi
       |  FROM fences
       |)
       |SELECT d.doc_id, lang, d.n_chars, f.lo, f.hi,
       |  CASE WHEN d.n_chars < f.lo OR d.n_chars > f.hi THEN 1 ELSE 0 END
       |    AS is_outlier
       |FROM documents d JOIN f USING (lang)
       |${canonOrderSql(Seq("doc_id", "lang", "n_chars", "lo", "hi",
         "is_outlier"))}""".stripMargin

  /** Sketch accuracy for the approx quantile face: rank error is
    * bounded by n/accuracy, so below this group size the sketch is
    * EXACT and the approx face agrees with the exact face bit-for-bit.
    */
  private val lengthOutlierAccuracy = 10000

  /** The 100 TB face of [[lengthOutliers]]: per-language quartiles from
    * a mergeable `percentile_approx` sketch (one map-side-combinable
    * aggregate — no per-group rank sort, no per-group serialization),
    * fences and flag arithmetic unchanged. The output is the per-lang
    * rollup: exact outlier counts (oracle-anchored), the count of docs
    * whose approx flag disagrees with the exact flag, and an ok-flag
    * bounding that disagreement at 1% — the approx_distinct discipline:
    * a sketch regression hash-mismatches instead of hiding.
    *
    * At the gate SFs every language group is smaller than
    * [[lengthOutlierAccuracy]], so the sketch degenerates to exact and
    * n_disagree is exactly 0 — the oracle claims that. Past sketch
    * scale, disagreement can only occur for docs BETWEEN the exact and
    * approx fence (rank error ≤ n/accuracy), which the ok-flag bounds.
    */
  def lengthOutliersApprox(spark: SparkSession, sfDir: String): DataFrame = {
    val d = load(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val ef = exactLengthFences(d)
    val af = d.groupBy(col("lang"))
      .agg(percentile_approx(col("n_chars"),
        array(lit(0.25), lit(0.75)), lit(lengthOutlierAccuracy)).as("qs"))
      .select(col("lang"), col("qs").getItem(0).as("q1"),
        col("qs").getItem(1).as("q3"))
      .select(col("lang"),
        expr("q1 - (3 * (q3 - q1)) div 2").as("alo"),
        expr("q3 + (3 * (q3 - q1)) div 2").as("ahi"))
    val flagged = d
      .join(broadcast(ef), Seq("lang")) // lang domain is bounded
      .join(broadcast(af), Seq("lang"))
      .select(col("lang"),
        when(col("n_chars") < col("lo") || col("n_chars") > col("hi"), 1)
          .otherwise(0).as("fe"),
        when(col("n_chars") < col("alo") || col("n_chars") > col("ahi"), 1)
          .otherwise(0).as("fa"))
    val out = flagged.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("fe")).as("n_outliers"),
        sum(when(col("fe") =!= col("fa"), 1).otherwise(0)).as("n_disagree"))
      .select(col("lang"), col("n_docs"), col("n_outliers"),
        col("n_disagree"),
        when(col("n_disagree") * 100 <= col("n_docs"), 1).otherwise(0)
          .as("approx_ok"))
    canon(out)
  }

  val lengthOutliersApproxSql: String =
    s"""WITH ranked AS (
       |  SELECT doc_id, lang, n_chars,
       |    row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rk,
       |    count(*) OVER (PARTITION BY lang) AS cnt
       |  FROM documents
       |), fences AS (
       |  SELECT lang,
       |    min(CASE WHEN rk = (cnt * 25 + 99) // 100 THEN n_chars END) AS q1,
       |    min(CASE WHEN rk = (cnt * 75 + 99) // 100 THEN n_chars END) AS q3
       |  FROM ranked GROUP BY lang
       |), f AS (
       |  SELECT lang, q1 - (3 * (q3 - q1)) // 2 AS lo,
       |    q3 + (3 * (q3 - q1)) // 2 AS hi
       |  FROM fences
       |)
       |SELECT lang, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN d.n_chars < f.lo OR d.n_chars > f.hi
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       |  CAST(0 AS BIGINT) AS n_disagree, 1 AS approx_ok
       |FROM documents d JOIN f USING (lang)
       |GROUP BY lang
       |${canonOrderSql(Seq("lang", "n_docs", "n_outliers", "n_disagree",
         "approx_ok"))}""".stripMargin

  // ---------------------------------------------------------------------
  // shard_pack — deterministic training-shard assignment
  // ---------------------------------------------------------------------

  /** Token-budget shard packing: concatenate each source's documents
    * (in doc_id order) into a token stream and chunk it into
    * fixed-budget shards — a document lands in the shard containing
    * its first token (`(cum - n) div budget`). This is the
    * deterministic, join-free formulation of the packing step that
    * builds training shards; greedy bin-packing is inherently
    * sequential, start-offset packing is one cumulative window.
    *
    * Scale: the cumulative sum partitions by SOURCE (shards are built
    * per domain slice), so no global single-partition window exists —
    * the shuffle keys on source and each partition's window is
    * independent. Token counts and offsets are exact integers.
    */
  private[graft] val shardBudget = 500L

  /** The packing relation shared by [[shardPack]] (its canon face) and
    * [[packEfficiency]] (its rollup), so the two can never disagree on
    * shard geometry.
    */
  private def shardRel(spark: SparkSession, sfDir: String): DataFrame = {
    val d = load(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val w = Window.partitionBy("source").orderBy("doc_id")
    d.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("shard_id",
        expr(s"(cum_tokens - n_tokens) div $shardBudget"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("cum_tokens"), col("shard_id"))
  }

  def shardPack(spark: SparkSession, sfDir: String): DataFrame =
    canon(shardRel(spark, sfDir))

  /** Packing-efficiency audit over the [[shardPack]] assignment: per
    * (source, shard) the document count, token load, exact µ-unit fill
    * ratio against the budget, and an over-budget flag (a shard exceeds
    * the budget exactly when a document straddles its boundary — the
    * first-token rule never splits documents). The report that sizes
    * padding waste and decides whether the budget or the packing rule
    * needs tuning before a training run materializes shards.
    *
    * Scale: one groupBy at (source, shard) grain downstream of the
    * shardRel window — output is |shards|, map-side combinable.
    * fill_micro stays in BIGINT: tokens·1e6 wraps only past ~9.2e12
    * shard tokens, and a shard is budget-bounded by construction
    * (budget + one document), far below that for any sane budget.
    */
  def packEfficiency(spark: SparkSession, sfDir: String): DataFrame = {
    val out = shardRel(spark, sfDir)
      .groupBy(col("source"), col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("shard_tokens"))
      .select(col("source"), col("shard_id"), col("n_docs"),
        col("shard_tokens"),
        expr(s"(shard_tokens * 1000000L) div $shardBudget")
          .as("fill_micro"),
        when(col("shard_tokens") > shardBudget, 1).otherwise(0)
          .as("over_budget"))
    canon(out)
  }

  val packEfficiencySql: String =
    s"""WITH d AS (
       |  SELECT doc_id, source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents
       |), c AS (
       |  SELECT source, n_tokens,
       |    sum(n_tokens) OVER (
       |      PARTITION BY source ORDER BY doc_id) AS cum_tokens
       |  FROM d
       |), s AS (
       |  SELECT source,
       |    CAST((cum_tokens - n_tokens) // $shardBudget AS BIGINT)
       |      AS shard_id,
       |    n_tokens
       |  FROM c
       |)
       |SELECT source, shard_id, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
       |  (CAST(sum(n_tokens) AS BIGINT) * 1000000) // $shardBudget
       |    AS fill_micro,
       |  CASE WHEN sum(n_tokens) > $shardBudget THEN 1 ELSE 0 END
       |    AS over_budget
       |FROM s GROUP BY 1, 2
       |${canonOrderSql(Seq("source", "shard_id", "n_docs", "shard_tokens",
         "fill_micro", "over_budget"))}""".stripMargin

  val shardPackSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents
       |), c AS (
       |  SELECT doc_id, source, n_tokens,
       |    sum(n_tokens) OVER (
       |      PARTITION BY source ORDER BY doc_id) AS cum_tokens
       |  FROM d
       |)
       |SELECT doc_id, source, n_tokens,
       |  CAST(cum_tokens AS BIGINT) AS cum_tokens,
       |  CAST((cum_tokens - n_tokens) // $shardBudget AS BIGINT) AS shard_id
       |FROM c
       |${canonOrderSql(Seq("doc_id", "source", "n_tokens", "cum_tokens",
         "shard_id"))}""".stripMargin

  // ---------------------------------------------------------------------
  // inverted_index — term → posting-list build
  // ---------------------------------------------------------------------

  /** Inverted-index build: per lowercased term, document frequency,
    * total term frequency, and an md5 digest of the SORTED posting list
    * (the full list stays in the pipeline; the digest keeps the oracle
    * row narrow while still pinning list content AND order). This is
    * the indexing half of any corpus search/contamination tool.
    *
    * Scale: explode → distinct-per-(term,doc) → groupBy(term) — two
    * shuffles keyed by term with map-side partials. collect_list order
    * is nondeterministic at any parallelism, so the digest sorts FIRST
    * (sort_array) — the classic reduce-side determinism trap, made
    * explicit here because the oracle would catch anyone removing it.
    */
  def invertedIndex(spark: SparkSession, sfDir: String): DataFrame = {
    val d = load(spark, sfDir, "documents")
    val terms = d.select(col("doc_id"),
      explode(split(lower(col("text")), " ")).as("term"))
    val perDoc = terms.groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    val out = perDoc.groupBy(col("term"))
      .agg(count(lit(1)).as("doc_freq"),
        sum(col("tf")).as("term_freq"),
        md5(array_join(
          expr("transform(sort_array(collect_list(doc_id)), x -> cast(x as string))"),
          ",")).as("postings_digest"))
    canon(out)
  }

  val invertedIndexSql: String =
    s"""WITH terms AS (
       |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
       |  FROM documents
       |), per_doc AS (
       |  SELECT term, doc_id, count(*) AS tf FROM terms GROUP BY term, doc_id
       |)
       |SELECT term, count(*) AS doc_freq,
       |  CAST(sum(tf) AS BIGINT) AS term_freq,
       |  md5(array_to_string(
       |    list_transform(list_sort(list(doc_id)), x -> CAST(x AS VARCHAR)),
       |    ',')) AS postings_digest
       |FROM per_doc
       |GROUP BY term
       |${canonOrderSql(Seq("term", "doc_freq", "term_freq", "postings_digest"))}""".stripMargin

  // ---------------------------------------------------------------------
  // bm25_topk — pruned BM25 ranked retrieval over the inverted index
  // ---------------------------------------------------------------------

  /** Query terms kept per query document (the df-rarest ones). Shared
    * with the incremental face (streaming.IndexStream.queryTopK) so
    * both retrieval paths select identically.
    */
  private[graft] val bm25QueryTerms = 3

  /** Results kept per query (shared with the incremental face). */
  private[graft] val bm25K = 3

  /** HEAD-TERM (stopword) CAP, shared by both retrieval faces and the
    * oracle: a term occurring in MORE THAN HALF the corpus (2·df >
    * n_docs) is excluded from query-term selection entirely — it never
    * scores and, in the incremental face, its posting lists are never
    * even fetched. Rationale: the df-rarest-[[bm25QueryTerms]] rule
    * already prefers rare terms, but a query made ONLY of stopwords
    * would still fetch the longest posting lists in the corpus (Σ df
    * explodes at scale — the one candidate-volume term the static-WAND
    * pruning doesn't bound). With the cap, an all-stopword query is
    * answered with NO results and NO posting reads. df > N/2 is the
    * classic stopword line: such a term's raw-odds idf
    * (N − df + ½)/(df + ½) is below 1, i.e. it carries negative
    * log-evidence and mostly reshuffles ties while costing the most to
    * read. The rule is exact-integer (2·df ≤ n_docs) so both engines
    * and the SQL oracle agree bit-for-bit.
    */
  private[graft] def bm25CapOk(df: Column, nDocs: Column): Column =
    df * lit(2) <= nDocs

  /** The retrieval tokenizer — whitespace split of the lowercased
    * text. Shared with the incremental face so index-time and
    * query-time tokenization cannot drift.
    */
  private[graft] def bm25Tokens(text: Column): Column =
    split(lower(text), " ")

  /** The exact-integer BM25 per-term µ-score over columns
    * (tf, df, dl, n_docs, totdl) — see [[bm25TopkOn]] for the
    * derivation. ONE definition shared by the batch face and the
    * incremental index face (streaming.IndexStream), so their scores
    * are bit-identical by construction, not by parallel maintenance.
    */
  private[graft] val bm25TermMicroExpr: String =
    """cast((cast(22 as decimal(38,0)) * tf * totdl
      |        * (2 * n_docs - 2 * df + 1) * 1000000)
      |  div ((2 * df + 1)
      |        * (cast(10 as decimal(38,0)) * tf * totdl
      |           + 3 * totdl + 9 * dl * n_docs))
      |  as bigint)""".stripMargin

  /** BM25 ranked retrieval: each benchmark document (the `src0` slice,
    * the eval-set convention shared with contamination_check) queries
    * the train corpus (everything else) and gets its top-[[bm25K]]
    * scoring train documents. The retrieval half of the corpus-search
    * tooling whose indexing half is [[invertedIndex]] — and the
    * query-based decontamination shape: "which training docs does this
    * eval item retrieve" is the audit behind every contamination
    * report.
    *
    * Scoring is BM25 (k1=1.2, b=0.75) made engine-exact in the house
    * style: the idf is Robertson's raw odds (N - df + ½)/(df + ½) —
    * kept as the rational (2N−2df+1)/(2df+1) instead of its log (libm
    * log() can differ across engines by an ulp; an integer ratio
    * cannot; the raw odds are also strictly positive, so no negative-idf
    * clamp is needed), and the tf saturation term
    * tf·(k1+1)/(tf + k1(1−b+b·dl/avgdl)) is multiplied through by
    * 10·totdl (avgdl = totdl/N) into the integer ratio
    * 22·tf·totdl / (10·tf·totdl + 3·totdl + 9·dl·N). Each term's score
    * is floored to µ-units in 128-bit exact arithmetic (DECIMAL(38,0)
    * here, HUGEINT in the oracle) and the per-doc score is the integer
    * SUM of term µ-scores — deterministic at any parallelism.
    *
    * Pruning: only the [[bm25QueryTerms]] df-RAREST terms of each query
    * score (tie-break df asc, term asc — a total order on a query's
    * distinct terms). That is the WAND idea reduced to its static core:
    * candidate volume is Σ df over the selected terms — the shortest
    * posting lists by construction — instead of queries × corpus. Terms
    * absent from the train vocabulary carry no postings and contribute
    * 0, so the inner df-join dropping them is exact (a query with NO
    * surviving term emits no rows, in both engines). Head terms
    * (2·df > n_docs — see [[bm25CapOk]]) are excluded BEFORE ranking,
    * so Σ df over selected terms is bounded by a corpus fraction even
    * for an all-stopword query (which retrieves nothing rather than
    * fetching the corpus's longest posting lists).
    *
    * Scale: tf/dl/df aggregate at (doc,term)/doc/vocab grain with
    * map-side partials; N and totdl ride a 1-row broadcast stamp;
    * retrieval is ONE shuffle equi-join on the term key (posting-list
    * fetch) whose input is bounded by the selected posting lengths; the
    * final top-k window partitions by query_id (query-count
    * cardinality, high and even).
    */
  def bm25Topk(spark: SparkSession, sfDir: String): DataFrame =
    bm25TopkOn(load(spark, sfDir, "documents"))

  /** [[bm25Topk]] over an explicit documents relation (doc_id, source,
    * text) — the spec seam.
    */
  def bm25TopkOn(d: DataFrame): DataFrame = {
    val toks = d.filter(col("source") =!= "src0")
      .select(col("doc_id"),
        explode(bm25Tokens(col("text"))).as("term"))
    // persisted: tf feeds dl, df, AND the posting fetch
    val tf = Caching.persistOnce(
      toks.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf")))
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stamp = dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("totdl"))
    val qTerms = d.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"),
        explode(array_distinct(bm25Tokens(col("text")))).as("term"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("df").asc, col("term").asc)
    // stamp rides the selection (one 1-row broadcast cross for the
    // whole face): the head-term cap filters BEFORE ranking, so capped
    // terms free their slots for the next-rarest uncapped terms, and
    // n_docs/totdl are simply carried through to scoring
    val selected = qTerms.join(dfT, Seq("term"))
      .crossJoin(broadcast(stamp))
      .filter(bm25CapOk(col("df"), col("n_docs")))
      .withColumn("trank", row_number().over(wq))
      .filter(col("trank") <= bm25QueryTerms)
      .select(col("term"), col("query_id"), col("df"),
        col("n_docs"), col("totdl"))
    // repartition on doc_id between the posting fetch and the dl join:
    // at scale dl is corpus-sized, so the join needs this exchange
    // anyway (co-partitioning), and locally it stops AQE from fusing
    // the CPU-heavy 128-bit scoring into the coalesced single-partition
    // tail of the tiny broadcast-join chain (measured 13.1 → 8.1 s
    // at sf0.1, StageProfile)
    val scoredTerms = selected.join(tf, Seq("term"))
      .repartition(col("doc_id"))
      .join(dl, Seq("doc_id"))
      .withColumn("term_micro", expr(bm25TermMicroExpr))
    val wd = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col("doc_id").asc)
    val out = scoredTerms.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("term_micro")).as("score_micro"),
        count(lit(1)).as("n_terms"))
      .withColumn("rank", row_number().over(wd))
      .filter(col("rank") <= bm25K)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("score_micro"), col("n_terms"))
    canon(out)
  }

  /** The BM25 oracle CTE chain over PLUGGABLE (doc_id, text) relations
    * — `train` and `queries` are FROM-able SQL fragments (a table name
    * or a parenthesized subquery). ONE definition feeds bm25_topk,
    * bm25_index_topk, hybrid_topk, and the composed-pipeline oracle
    * (hybrid_index_topk's sparse leg over the KEPT corpus), so the
    * scoring/selection/cap SQL cannot drift between oracle rows.
    * Emits CTEs `toks..ranked`; the caller selects from `ranked`.
    */
  /** `allowPred` (round 11, filtered retrieval): an optional SQL
    * predicate on `scored` rows inserted UNDER the rank window (so the
    * ranked list re-ranks over the allowed docs) while every corpus
    * statistic above it — df, n_docs, totdl, term selection, the
    * head-term cap — stays whole-corpus, matching the query faces'
    * filtered-retrieval contract. Empty = the historical unfiltered
    * SQL, byte-identical.
    */
  /** `allTerms` (round 11, the MaxScore face): when true, the `sel`
    * CTE keeps EVERY uncapped query term (no df-rarest limit) — the
    * exact full-query scoring semantics of [[bm25FullTopkOn]]. False
    * emits the historical rarest-[[bm25QueryTerms]] SQL byte-identically.
    */
  /** The corpus-statistics oracle CTE prefix (`toks..qterms`) every
    * retrieval oracle builds on — tokenizer, tf/dl/df grains, the
    * 1-row corpus stamp, and the query-term unnest. ONE definition
    * shared by [[bm25Ctes]], [[boolCtes]], and the expansion/facet
    * chains, mirroring how the Spark faces share [[bm25Tokens]].
    */
  private[graft] def coreCtes(train: String, queries: String): String =
    s"""toks AS (
       |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
       |  FROM $train
       |), tf AS (
       |  SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2
       |), dl AS (
       |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1
       |), dft AS (
       |  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1
       |), stamp AS (
       |  SELECT count(*)::BIGINT AS n_docs, CAST(sum(dl) AS BIGINT) AS totdl
       |  FROM dl
       |), qterms AS (
       |  SELECT doc_id AS query_id,
       |    unnest(list_distinct(string_split(lower(text), ' '))) AS term
       |  FROM $queries
       |)""".stripMargin

  /** The exact-integer BM25 µ-score in DuckDB HUGEINT arithmetic over
    * pluggable tf/df/dl expressions (a `stamp st` relation must be in
    * scope) — the oracle twin of [[bm25TermMicroExpr]], one definition
    * for every chain that scores.
    */
  private[graft] def termMicroSql(tf: String, df: String,
      dl: String): String =
    s"""CAST((CAST(22 AS HUGEINT) * $tf * st.totdl
       |            * (2 * st.n_docs - 2 * $df + 1) * 1000000)
       |      // ((2 * $df + 1)
       |            * (CAST(10 AS HUGEINT) * $tf * st.totdl
       |               + 3 * st.totdl + 9 * $dl * st.n_docs))
       |      AS BIGINT)""".stripMargin

  private[graft] def bm25Ctes(train: String, queries: String,
      allowPred: String = "", allTerms: Boolean = false): String = {
    val sel =
      if (!allTerms)
        s"""  SELECT term, query_id, df FROM (
           |    SELECT q.term, q.query_id, d.df,
           |      row_number() OVER (PARTITION BY q.query_id
           |        ORDER BY d.df ASC, q.term ASC) AS trank
           |    FROM qterms q JOIN dft d USING (term), stamp st
           |    WHERE 2 * d.df <= st.n_docs)
           |  WHERE trank <= $bm25QueryTerms""".stripMargin
      else
        s"""  SELECT q.term, q.query_id, d.df
           |  FROM qterms q JOIN dft d USING (term), stamp st
           |  WHERE 2 * d.df <= st.n_docs""".stripMargin
    s"""${coreCtes(train, queries)}, sel AS (
       |$sel
       |), scored_terms AS (
       |  SELECT s.query_id, tf.doc_id,
       |    ${termMicroSql("tf.tf", "s.df", "dl.dl")} AS term_micro
       |  FROM sel s JOIN tf USING (term) JOIN dl ON tf.doc_id = dl.doc_id,
       |    stamp st
       |), scored AS (
       |  SELECT query_id, doc_id, CAST(sum(term_micro) AS BIGINT) AS score_micro,
       |    count(*)::BIGINT AS n_terms
       |  FROM scored_terms GROUP BY 1, 2
       |), ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY score_micro DESC, doc_id ASC) AS rank
       |  FROM scored$allowPred
       |)""".stripMargin
  }

  val bm25TopkSql: String =
    s"""WITH ${bm25Ctes(
        "(SELECT doc_id, text FROM documents WHERE source <> 'src0')",
        "(SELECT doc_id, text FROM documents WHERE source = 'src0')")}
       |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, score_micro, n_terms
       |FROM ranked WHERE rank <= $bm25K
       |${canonOrderSql(Seq("query_id", "rank", "doc_id", "score_micro",
         "n_terms"))}""".stripMargin

  // ---------------------------------------------------------------------
  // bm25_full_topk — exact ALL-terms BM25 via MaxScore-style pruning
  // ---------------------------------------------------------------------

  /** bm25_full_topk — EXACT full-query BM25: every uncapped query term
    * scores (not just the df-rarest [[bm25QueryTerms]]), and the
    * top-[[bm25K]] is still computed without ranking the whole corpus —
    * the MaxScore idea (Turtle & Flood, "Query evaluation: strategies
    * and optimizations", 1995) recast set-wise for a shuffle engine:
    *
    *  1. ESSENTIAL terms: the [[bm25QueryTerms]] df-rarest per query
    *     (the same static-WAND selection [[bm25TopkOn]] uses). Their
    *     postings define the candidate universe — Σ df over the
    *     shortest lists, never queries × corpus.
    *  2. Candidates get their FULL exact score: ALL uncapped query
    *     terms' postings join, restricted to candidates by a left-semi
    *     join — at scale a frequent term's posting fetch prunes to the
    *     candidate docs (row-group grain) instead of scoring its whole
    *     list, and the scoring shuffle is candidate-volume, not
    *     posting-volume.
    *  3. The PROOF that no non-candidate doc belongs in the top-k: a
    *     non-candidate contains no essential term, so its score is at
    *     most Σ ub(t) over the query's NON-essential terms, where
    *     ub(t) = max over t's postings of the exact per-term µ-score.
    *     If that bound is STRICTLY below the query's k-th candidate
    *     score, the restricted ranking is provably exact (strict also
    *     settles ties — the doc_id-asc tiebreak could otherwise admit
    *     a tying non-candidate).
    *  4. Queries where the bound fails — or with fewer than
    *     [[bm25K]] candidates — FALL BACK to unrestricted full scoring
    *     for that query only: exact by construction, never wrong, just
    *     unpruned. Bm25MaxScoreSpec pins that natural corpora don't
    *     trigger it and an adversarial one does (and stays exact).
    *
    * Everything stays exact-integer (ub is a max of the same µ-score
    * expression the oracle computes), so the ok/fallback routing — and
    * therefore the plan shape — is deterministic, and the oracle is
    * simply the full-scoring SQL ([[bm25Ctes]] with `allTerms = true`):
    * the pruning must be invisible in the answer.
    */
  def bm25FullTopk(spark: SparkSession, sfDir: String): DataFrame =
    bm25FullTopkOn(load(spark, sfDir, "documents"))

  def bm25FullTopkOn(d: DataFrame): DataFrame = canon(bm25FullParts(d)._1)

  /** The MaxScore plan's parts, for the spec: (result, fallback
    * queries, candidate pairs, restricted scored pairs). */
  private[graft] def bm25FullParts(d: DataFrame)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val toks = d.filter(col("source") =!= "src0")
      .select(col("doc_id"),
        explode(bm25Tokens(col("text"))).as("term"))
    val tf = Caching.persistOnce(
      toks.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf")))
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stamp = dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("totdl"))
    val qTerms = d.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"),
        explode(array_distinct(bm25Tokens(col("text")))).as("term"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("df").asc, col("term").asc)
    // every uncapped query term, essentialness ranked by df
    val qsel = Caching.persistOnce(qTerms.join(dfT, Seq("term"))
      .crossJoin(broadcast(stamp))
      .filter(bm25CapOk(col("df"), col("n_docs")))
      .withColumn("trank", row_number().over(wq)))
    val essential = qsel.filter(col("trank") <= bm25QueryTerms)
    val nonEss = qsel.filter(col("trank") > bm25QueryTerms)
    // tight per-term upper bound: max over the term's postings of the
    // exact µ-score — computed only for terms some query holds
    // non-essentially (query-vocabulary grain, not corpus grain)
    val ubT = tf
      .join(nonEss.select(col("term")).distinct(), Seq("term"), "left_semi")
      .join(dl, Seq("doc_id"))
      .join(dfT, Seq("term"))
      .crossJoin(broadcast(stamp))
      .withColumn("m", expr(bm25TermMicroExpr))
      .groupBy(col("term")).agg(max(col("m")).as("ub_micro"))
    // candidate universe: docs holding >=1 essential term
    val cand = essential.select(col("term"), col("query_id"))
      .join(tf, Seq("term"))
      .select(col("query_id"), col("doc_id")).distinct()
    // ONE scoring chain for the restricted and fallback branches —
    // a pipeline change cannot reach one and miss the other
    def scoreRank(sel: DataFrame,
        restrictTo: Option[DataFrame]): DataFrame = {
      val wd = Window.partitionBy(col("query_id"))
        .orderBy(col("score_micro").desc, col("doc_id").asc)
      restrictTo.foldLeft(sel.join(tf, Seq("term")))(
          (b, c) => b.join(c, Seq("query_id", "doc_id"), "left_semi"))
        .repartition(col("doc_id"))
        .join(dl, Seq("doc_id"))
        .withColumn("term_micro", expr(bm25TermMicroExpr))
        .groupBy(col("query_id"), col("doc_id"))
        .agg(sum(col("term_micro")).as("score_micro"),
          count(lit(1)).as("n_terms"))
        .withColumn("rank", row_number().over(wd))
    }
    // full exact scores, candidate-restricted
    val ranked = Caching.persistOnce(scoreRank(
      qsel.select(col("term"), col("query_id"), col("df"),
        col("n_docs"), col("totdl")), Some(cand)))
    val kth = ranked.filter(col("rank") === bm25K)
      .select(col("query_id"), col("score_micro").as("kth_micro"))
    // fallback iff the query HAS non-essential terms and their summed
    // bound could reach the k-th candidate (or candidates < k)
    val fb = nonEss.join(ubT, Seq("term"))
      .groupBy(col("query_id")).agg(sum(col("ub_micro")).as("sum_ub"))
      .join(kth, Seq("query_id"), "left")
      .filter(col("kth_micro").isNull || col("sum_ub") >= col("kth_micro"))
      .select(col("query_id"))
    val fbTop = scoreRank(
      qsel.join(broadcast(fb), Seq("query_id"), "left_semi")
        .select(col("term"), col("query_id"), col("df"),
          col("n_docs"), col("totdl")), None)
    val cols = Seq(col("query_id"), col("rank"), col("doc_id"),
      col("score_micro"), col("n_terms"))
    val out = ranked.join(broadcast(fb), Seq("query_id"), "left_anti")
      .filter(col("rank") <= bm25K).select(cols: _*)
      .unionByName(fbTop.filter(col("rank") <= bm25K).select(cols: _*))
    (out, fb, cand, ranked)
  }

  val bm25FullTopkSql: String =
    s"""WITH ${bm25Ctes(
        "(SELECT doc_id, text FROM documents WHERE source <> 'src0')",
        "(SELECT doc_id, text FROM documents WHERE source = 'src0')",
        allTerms = true)}
       |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, score_micro, n_terms
       |FROM ranked WHERE rank <= $bm25K
       |${canonOrderSql(Seq("query_id", "rank", "doc_id", "score_micro",
         "n_terms"))}""".stripMargin

  // ---------------------------------------------------------------------
  // bool_topk — boolean retrieval (MUST / MUST NOT) with BM25 ranking
  // ---------------------------------------------------------------------

  /** MUST conjuncts per boolean query (the derivation rule below). */
  private[graft] val boolMustTerms = 2

  /** bool_topk — BOOLEAN retrieval: conjunction + exclusion with BM25
    * ranking, the `+a +b -c` query shape every search surface exposes
    * next to ranked bag-of-words. The query derivation is the same
    * deterministic convention as the other retrieval faces (each src0
    * document IS a query): rank the query's distinct in-vocabulary
    * terms by (df asc, term asc) — the bm25_topk selection order —
    * then
    *
    *  - the [[boolMustTerms]] RAREST terms are MUST conjuncts: a
    *    document matches only if it contains ALL of them;
    *  - the NEXT term (when the query has one) is the MUST NOT
    *    exclusion: any document containing it is dropped;
    *  - matches rank by the integer sum of the must terms' exact BM25
    *    µ-scores ([[bm25TermMicroExpr]]), tie-broken doc_id asc,
    *    top-[[bm25K]] per query. Queries with fewer than
    *    [[boolMustTerms]] in-vocabulary terms return nothing (an
    *    undefined conjunction matches nothing, in both engines, by the
    *    same HAVING count = n rule).
    *
    * Unlike the SCORING faces, no head-term cap applies: boolean
    * operators are FILTERS the user asked for by name — `+the` must
    * match documents containing "the" (the same contract as the phrase
    * face, which also answers stopword phrases and pays their posting
    * volume). The µ-score stays well-defined at any df (the raw-odds
    * idf (2N−2df+1)/(2df+1) is strictly positive up to df = N).
    *
    * Scale: the conjunction is the INTERSECTION of the must posting
    * lists — `HAVING count(*) = 2` over the joined hits IS set
    * intersection ((doc, term)-grain tf rows exist at most once), one
    * aggregation, no self-join; read volume is Σ df(must) — the df-asc
    * derivation keeps the demo rows on the SHORT lists, and a
    * stopword conjunct costs what it names; the exclusion is a
    * left-anti join at candidate grain. Nothing touches
    * queries × corpus.
    */
  def boolTopk(spark: SparkSession, sfDir: String): DataFrame =
    boolTopkOn(load(spark, sfDir, "documents"))

  def boolTopkOn(d: DataFrame): DataFrame = {
    val toks = d.filter(col("source") =!= "src0")
      .select(col("doc_id"),
        explode(bm25Tokens(col("text"))).as("term"))
    val tf = Caching.persistOnce(
      toks.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf")))
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stamp = dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("totdl"))
    val qTerms = d.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"),
        explode(array_distinct(bm25Tokens(col("text")))).as("term"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("df").asc, col("term").asc)
    val qsel = qTerms.join(dfT, Seq("term"))
      .crossJoin(broadcast(stamp))
      .withColumn("trank", row_number().over(wq))
    val must = qsel.filter(col("trank") <= boolMustTerms)
      .select(col("term"), col("query_id"), col("df"),
        col("n_docs"), col("totdl"))
    val mustNot = qsel.filter(col("trank") === boolMustTerms + 1)
      .select(col("term"), col("query_id"))
    // intersection: a (doc, term) tf row exists at most once, so a
    // candidate matched ALL must terms iff its hit count equals
    // boolMustTerms — which also erases queries with < boolMustTerms
    // eligible terms (their count can never reach it)
    val conj = must.join(tf, Seq("term"))
      .repartition(col("doc_id"))
      .join(dl, Seq("doc_id"))
      .withColumn("term_micro", expr(bm25TermMicroExpr))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("term_micro")).as("score_micro"),
        count(lit(1)).as("n_terms"))
      .filter(col("n_terms") === boolMustTerms)
    val notPairs = mustNot
      .join(tf.select(col("term"), col("doc_id")), Seq("term"))
      .select(col("query_id"), col("doc_id"))
    val wd = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col("doc_id").asc)
    val out = conj.join(notPairs, Seq("query_id", "doc_id"), "left_anti")
      .withColumn("rank", row_number().over(wd))
      .filter(col("rank") <= bm25K)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("score_micro"), col("n_terms"))
    canon(out)
  }

  /** The boolean-retrieval oracle chain — same derivation, conjunction
    * (HAVING count = [[boolMustTerms]]), exclusion anti-join, and
    * µ-score ranking as [[boolTopkOn]]. Emits `..branked`.
    */
  private[graft] def boolCtes(train: String, queries: String): String =
    s"""${coreCtes(train, queries)}, bqsel AS (
       |  SELECT q.term, q.query_id, d.df,
       |    row_number() OVER (PARTITION BY q.query_id
       |      ORDER BY d.df ASC, q.term ASC) AS trank
       |  FROM qterms q JOIN dft d USING (term)
       |), bmust AS (
       |  SELECT term, query_id, df FROM bqsel WHERE trank <= $boolMustTerms
       |), bnot AS (
       |  SELECT term, query_id FROM bqsel WHERE trank = ${boolMustTerms + 1}
       |), bterms AS (
       |  SELECT s.query_id, tf.doc_id,
       |    ${termMicroSql("tf.tf", "s.df", "dl.dl")} AS term_micro
       |  FROM bmust s JOIN tf USING (term) JOIN dl ON tf.doc_id = dl.doc_id,
       |    stamp st
       |), bconj AS (
       |  SELECT query_id, doc_id, CAST(sum(term_micro) AS BIGINT) AS score_micro,
       |    count(*)::BIGINT AS n_terms
       |  FROM bterms GROUP BY 1, 2 HAVING count(*) = $boolMustTerms
       |), bkept AS (
       |  SELECT c.query_id, c.doc_id, c.score_micro, c.n_terms FROM bconj c
       |  WHERE NOT EXISTS (
       |    SELECT 1 FROM bnot m JOIN tf t USING (term)
       |    WHERE m.query_id = c.query_id AND t.doc_id = c.doc_id)
       |), branked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY score_micro DESC, doc_id ASC) AS rank
       |  FROM bkept
       |)""".stripMargin

  val boolTopkSql: String =
    s"""WITH ${boolCtes(
        "(SELECT doc_id, text FROM documents WHERE source <> 'src0')",
        "(SELECT doc_id, text FROM documents WHERE source = 'src0')")}
       |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, score_micro, n_terms
       |FROM branked WHERE rank <= $bm25K
       |${canonOrderSql(Seq("query_id", "rank", "doc_id", "score_micro",
         "n_terms"))}""".stripMargin

  /** bool_index_topk — the INCREMENTAL boolean face over the shared
    * LSM index state: same dfs-before-postings read discipline as
    * bm25_index_topk (selection and the cap run on the vocabulary
    * sub-table; only the must/mustNot terms' posting dirs are ever
    * opened), bit-identical to [[boolTopkOn]] by shared definitions,
    * and driver-checked against the same [[boolTopkSql]].
    */
  def boolIndexTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val (state, q) = ridxStateAndQueries(spark, sfDir)
    canon(graft.streaming.IndexStream.queryBool(spark, state, q))
  }

  // ---------------------------------------------------------------------
  // bm25_prefix_topk — prefix (multi-term expansion) retrieval
  // ---------------------------------------------------------------------

  /** Prefix width of the expansion faces' oracle rows. The synthetic
    * corpus's vocabulary shares no multi-character prefixes (31 terms,
    * all 4-prefixes unique), so the DRIVER-CHECKED rows pin width 1 —
    * the only width where expansion sets exceed one term here; the
    * width is an API parameter and the spec exercises wider ones.
    */
  private[graft] val prefixLen = 1

  /** Expansion cap — Lucene's maxExpansions: at most this many
    * vocabulary terms score per prefix, rarest (df asc, term asc)
    * first, which both bounds the posting volume (Σ df over ≤ max
    * terms) and keeps the selection deterministic.
    */
  private[graft] val prefixExpandMax = 4

  /** bm25_prefix_topk — PREFIX retrieval (`dat*`): the query's rarest
    * in-vocabulary term seeds a prefix, every vocabulary term sharing
    * that prefix (up to [[prefixExpandMax]], rarest first) becomes a
    * disjunct, and documents rank by the integer sum of the matched
    * disjuncts' exact BM25 µ-scores — Lucene's multi-term query
    * rewrite (prefix → bounded OR over the term dictionary) with the
    * blended scoring of its SynonymQuery. As in Lucene, NO head-term
    * cap applies: a prefix names every completion, stopwords included;
    * the expansion cap is what bounds cost. The "prefix" is the
    * fixed-width rule substring(term, 1, len) on BOTH sides (an exact
    * equi-join — a seed shorter than `len` expands only to itself),
    * so both engines and the oracle agree bit-for-bit.
    *
    * Scale: expansion runs entirely on the VOCABULARY grain (dft —
    * never a posting or the corpus), as an equi-join on the computed
    * prefix key; posting I/O is Σ df over ≤ [[prefixExpandMax]]
    * selected terms; scoring/ranking are the bm25_topk plan shapes.
    */
  def prefixTopk(spark: SparkSession, sfDir: String): DataFrame =
    prefixTopkOn(load(spark, sfDir, "documents"))

  def prefixTopkOn(d: DataFrame, len: Int = prefixLen,
      max: Int = prefixExpandMax): DataFrame = {
    val toks = d.filter(col("source") =!= "src0")
      .select(col("doc_id"),
        explode(bm25Tokens(col("text"))).as("term"))
    val tf = Caching.persistOnce(
      toks.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf")))
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val dfT = Caching.persistOnce(
      tf.groupBy(col("term")).agg(count(lit(1)).as("df")))
    val stamp = dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("totdl"))
    val qTerms = d.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"),
        explode(array_distinct(bm25Tokens(col("text")))).as("term"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("df").asc, col("term").asc)
    val seed = qTerms.join(dfT, Seq("term"))
      .withColumn("trank", row_number().over(wq))
      .filter(col("trank") === 1)
      .select(col("query_id"),
        substring(col("term"), 1, len).as("pfx"))
    // vocabulary-grain expansion: an equi-join on the fixed-width
    // prefix key (the seed side is queries-count — broadcast)
    val wx = Window.partitionBy(col("query_id"))
      .orderBy(col("df").asc, col("term").asc)
    val expd = dfT.withColumn("pfx", substring(col("term"), 1, len))
      .join(broadcast(seed), Seq("pfx"))
      .withColumn("xrank", row_number().over(wx))
      .filter(col("xrank") <= max)
      .select(col("term"), col("query_id"), col("df"))
      .crossJoin(broadcast(stamp))
    val scoredTerms = expd.join(tf, Seq("term"))
      .repartition(col("doc_id"))
      .join(dl, Seq("doc_id"))
      .withColumn("term_micro", expr(bm25TermMicroExpr))
    val wd = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col("doc_id").asc)
    val out = scoredTerms.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("term_micro")).as("score_micro"),
        count(lit(1)).as("n_terms"))
      .withColumn("rank", row_number().over(wd))
      .filter(col("rank") <= bm25K)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("score_micro"), col("n_terms"))
    canon(out)
  }

  /** The prefix-expansion oracle chain — same seed (uncapped trank-1),
    * fixed-width prefix equi-join, rarest-first expansion cap, and
    * µ-score ranking as [[prefixTopkOn]]. Emits `..xranked`.
    */
  private[graft] def prefixCtes(train: String, queries: String,
      len: Int = prefixLen, max: Int = prefixExpandMax): String =
    s"""${coreCtes(train, queries)}, pqsel AS (
       |  SELECT q.term, q.query_id, d.df,
       |    row_number() OVER (PARTITION BY q.query_id
       |      ORDER BY d.df ASC, q.term ASC) AS trank
       |  FROM qterms q JOIN dft d USING (term)
       |), pseed AS (
       |  SELECT query_id, substring(term, 1, $len) AS pfx FROM pqsel
       |  WHERE trank = 1
       |), pexp AS (
       |  SELECT query_id, term, df FROM (
       |    SELECT s.query_id, d.term, d.df,
       |      row_number() OVER (PARTITION BY s.query_id
       |        ORDER BY d.df ASC, d.term ASC) AS xrank
       |    FROM pseed s JOIN dft d
       |      ON substring(d.term, 1, $len) = s.pfx)
       |  WHERE xrank <= $max
       |), xterms AS (
       |  SELECT s.query_id, tf.doc_id,
       |    ${termMicroSql("tf.tf", "s.df", "dl.dl")} AS term_micro
       |  FROM pexp s JOIN tf USING (term) JOIN dl ON tf.doc_id = dl.doc_id,
       |    stamp st
       |), xscored AS (
       |  SELECT query_id, doc_id, CAST(sum(term_micro) AS BIGINT) AS score_micro,
       |    count(*)::BIGINT AS n_terms
       |  FROM xterms GROUP BY 1, 2
       |), xranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY score_micro DESC, doc_id ASC) AS rank
       |  FROM xscored
       |)""".stripMargin

  val prefixTopkSql: String =
    s"""WITH ${prefixCtes(
        "(SELECT doc_id, text FROM documents WHERE source <> 'src0')",
        "(SELECT doc_id, text FROM documents WHERE source = 'src0')")}
       |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, score_micro, n_terms
       |FROM xranked WHERE rank <= $bm25K
       |${canonOrderSql(Seq("query_id", "rank", "doc_id", "score_micro",
         "n_terms"))}""".stripMargin

  /** bm25_prefix_index — the INCREMENTAL prefix face: expansion runs
    * on the vocabulary-grain `dfs` sub-table (prefix-pushdown pruned,
    * ZERO posting reads), then only the ≤ [[prefixExpandMax]] selected
    * completions' generation-shortlisted postings are fetched.
    * Bit-identical to [[prefixTopkOn]] by shared definitions and
    * driver-checked against the same [[prefixTopkSql]].
    */
  def prefixIndexTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val (state, q) = ridxStateAndQueries(spark, sfDir)
    canon(graft.streaming.IndexStream.queryPrefix(spark, state, q))
  }

  // ---------------------------------------------------------------------
  // search_facets — facet counts over the full match set
  // ---------------------------------------------------------------------

  /** search_facets — FACETED search: for each query, the count of
    * matching documents per metadata value (`lang` here), over the
    * FULL match set — every document holding at least one selected
    * query term under the standard bm25_topk selection (df-rarest
    * uncapped terms) — not just the top-k. The facet attribute lives
    * in the document table, not the index: the classic architecture
    * where the inverted index serves ids and a doc-attribute store
    * serves fields, so the incremental face needs NO extra index
    * state.
    *
    * Scale: the match set is the same posting-bounded candidate
    * universe the ranked face already computes (Σ df over selected
    * terms, never queries × corpus); the facet join is one equi-join
    * at candidate grain against the attribute table; counts aggregate
    * at (query, value) grain — facet-value cardinality, tiny. Facet
    * values rank (count desc, value asc) for a deterministic order.
    */
  def searchFacets(spark: SparkSession, sfDir: String): DataFrame =
    searchFacetsOn(load(spark, sfDir, "documents"))

  def searchFacetsOn(d: DataFrame): DataFrame = {
    val toks = d.filter(col("source") =!= "src0")
      .select(col("doc_id"),
        explode(bm25Tokens(col("text"))).as("term"))
    val tf = Caching.persistOnce(
      toks.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf")))
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = tf.select(col("doc_id")).distinct()
      .agg(count(lit(1)).as("n_docs"))
    val qTerms = d.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"),
        explode(array_distinct(bm25Tokens(col("text")))).as("term"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("df").asc, col("term").asc)
    val selected = qTerms.join(dfT, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .filter(bm25CapOk(col("df"), col("n_docs")))
      .withColumn("trank", row_number().over(wq))
      .filter(col("trank") <= bm25QueryTerms)
      .select(col("term"), col("query_id"))
    val matches = selected
      .join(tf.select(col("term"), col("doc_id")), Seq("term"))
      .select(col("query_id"), col("doc_id")).distinct()
    facetRollup(matches, d)
  }

  /** Facet counts of a (query_id, doc_id) match set against the
    * documents attribute table — shared by the batch and index faces
    * (and usable over PipelineStream.queryMatches' kept-corpus ids).
    */
  private[graft] def facetRollup(matches: DataFrame,
      d: DataFrame): DataFrame = {
    val wf = Window.partitionBy(col("query_id"))
      .orderBy(col("n_docs").desc, col("lang").asc)
    // attribute universe = the TRAIN slice only, matching the match
    // set's universe — doc_id is unique per source, not globally, so
    // joining the full table would silently inflate counts on a
    // src0/train id collision (identically in engine and oracle, which
    // is exactly why parity tests can't catch it)
    val out = matches
      .join(d.filter(col("source") =!= "src0")
        .select(col("doc_id"), col("lang")), Seq("doc_id"))
      .groupBy(col("query_id"), col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("rank", row_number().over(wf))
      .select(col("query_id"), col("rank"), col("lang"), col("n_docs"))
    canon(out)
  }

  val searchFacetsSql: String =
    s"""WITH ${bm25Ctes(
        "(SELECT doc_id, text FROM documents WHERE source <> 'src0')",
        "(SELECT doc_id, text FROM documents WHERE source = 'src0')")},
       |fmatch AS (
       |  SELECT DISTINCT query_id, doc_id FROM scored
       |), facets AS (
       |  SELECT m.query_id, d.lang, count(*)::BIGINT AS n_docs
       |  FROM fmatch m
       |  JOIN (SELECT doc_id, lang FROM documents
       |        WHERE source <> 'src0') d USING (doc_id)
       |  GROUP BY 1, 2
       |)
       |SELECT query_id,
       |  CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY n_docs DESC, lang ASC) AS INT) AS rank,
       |  lang, n_docs
       |FROM facets
       |${canonOrderSql(Seq("query_id", "rank", "lang", "n_docs"))}"""
      .stripMargin

  /** search_facets_index — the INCREMENTAL facet face: match ids come
    * from the LSM index (dfs-shortlisted posting fetch, tombstones
    * applied), facet attributes from the external documents table —
    * the id-server/attribute-store split. Driver-checked against the
    * same [[searchFacetsSql]].
    */
  def searchFacetsIndex(spark: SparkSession, sfDir: String): DataFrame = {
    val (state, q) = ridxStateAndQueries(spark, sfDir)
    facetRollup(
      graft.streaming.IndexStream.queryMatches(spark, state, q),
      load(spark, sfDir, "documents"))
  }

  // ---------------------------------------------------------------------
  // bm25f_topk — fielded retrieval (simple BM25F)
  // ---------------------------------------------------------------------

  /** Tokens of the TITLE field: the document's first [[titleTokens]]
    * tokens. The corpus has a single text column, so fields derive
    * deterministically from position — the convention a real fielded
    * corpus would replace with its own column split; everything
    * downstream is field-source-agnostic.
    */
  private[graft] val titleTokens = 5

  /** Title weight of the simple-BM25F blend (body weight 1). */
  private[graft] val titleWeight = 2

  /** bm25f_topk — FIELDED retrieval, the simple BM25F of Robertson,
    * Zaragoza & Taylor (CIKM 2004): instead of scoring fields
    * separately and summing (which double-counts the tf saturation),
    * per-term frequencies BLEND ACROSS FIELDS with field weights
    * BEFORE the one shared saturation —
    *
    *   wtf(t, d) = [[titleWeight]] · tf_title + tf_body,
    *   wdl(d)    = [[titleWeight]] · |title| + |body|,
    *
    * then the standard exact-integer machinery runs unchanged on
    * (wtf, wdl, Σ wdl): one µ-score expression, one selection rule
    * (df-rarest uncapped — df stays a DOCUMENT count, fields don't
    * change it), one top-[[bm25K]] window. A term hit in the title is
    * worth [[titleWeight]] body hits, and a long title lengthens the
    * normalizing length accordingly — exactly the paper's structure,
    * made engine-exact in µ-units.
    *
    * Scale: identical plan shapes to [[bm25TopkOn]] — the weighting is
    * a per-row CASE on the token position before the same (doc, term)/
    * doc/vocab-grain aggregations; nothing new shuffles.
    */
  def bm25fTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val d = load(spark, sfDir, "documents")
    // the REGISTERED bm25f_topk oracle models the positional
    // convention only; if the stored corpus ever grows a real title
    // column, bm25fTopkOn would silently take the schema branch and
    // diverge from its SQL — fail loudly and point at the titled pair
    // instead (ADVICE r12)
    require(!d.columns.contains("title"),
      "bm25f_topk is oracle-paired with the positional title " +
        "convention; a corpus with a real title column must use the " +
        "bm25f_titled faces (bm25fTitledSql)")
    bm25fTopkOn(d)
  }

  /** SCHEMA-DRIVEN FIELDS (round 12): when the corpus carries a real
    * `title` column, it IS the title field (weighted [[titleWeight]])
    * and `text` is the body — the positional first-[[titleTokens]]
    * convention is the single-text-column fallback only. Queries stay
    * unfielded (their terms come from `text`) in both shapes. With a
    * title of exactly [[titleTokens]] tokens the two shapes blend
    * identical (wtf, wdl) and rank bit-identically (spec-pinned) —
    * the convention is the degenerate case of the schema.
    */
  def bm25fTopkOn(d: DataFrame): DataFrame =
    bm25fScoredOn(d,
      d.filter(col("source") === "src0")
        .select(col("doc_id").as("query_id"),
          explode(array_distinct(bm25Tokens(col("text")))).as("term"))
        .withColumn("fld", lit("any")).withColumn("qw", lit(1L)))

  /** FIELDED QUERIES (round 14): parse per-field query tags out of a
    * whitespace query string. Token syntax, Lucene-style:
    *
    *   token := [("title" | "body") ":"] term ["^" digits]
    *
    * `title:foo` restricts foo to the title field, `body:foo` to the
    * body, a bare term matches ANY field (the standard BM25F blend);
    * `^w` multiplies the term's µ-score contribution by the integer
    * query weight w (default 1; 1–9 digits — a longer digit tail is
    * LITERAL term text, never a boost, so the cast can never
    * overflow long and null-propagate into the µ-score, ADVICE r14;
    * the flip side, documented contract: a corpus query token that
    * legitimately ends in `^d` with d ≤ 9 digits IS always read as a
    * boost — escape hatches are a tokenizer concern, not a parser
    * one). Unknown prefixes (`foo:bar`) are NOT
    * field tags — the whole token stays a literal term, so a corpus
    * token containing ':' can never be silently re-parsed. TAGGED
    * QUOTED RUNS (`title:"a b c"` — round 15) are PHRASE clauses,
    * owned by the quoted-run grammar ([[parseTaggedPhrase]]); this
    * per-token parser strips them from the text before tokenizing,
    * so a phrase run's words never leak in as bag-of-words term
    * clauses. Returns
    * DISTINCT (query_id, term, fld, qw) triples — the same term
    * tagged two ways in one query is two clauses, each scoring
    * (mirrored in the oracle CTEs). Shared by the batch face
    * ([[bm25fScoredOn]]) and the index face
    * (streaming.IndexStream.queryFieldedTagged) so query parsing
    * cannot drift between them.
    */
  private[graft] def parseFieldedQuery(queries: DataFrame): DataFrame = {
    val toks = queries.filter(col("text").isNotNull)
      .select(col("query_id"), explode(bm25Tokens(
        regexp_replace(col("text"), taggedPhrasePat, ""))).as("tok"))
    toks
      .withColumn("fld",
        when(col("tok").startsWith("title:"), lit("title"))
          .when(col("tok").startsWith("body:"), lit("body"))
          .otherwise(lit("any")))
      .withColumn("rest",
        when(col("fld") === "any", col("tok"))
          .otherwise(expr("substring(tok, instr(tok, ':') + 1)")))
      .withColumn("qws", regexp_extract(col("rest"), "\\^(\\d{1,9})$", 1))
      .withColumn("qw",
        when(length(col("qws")) > 0, col("qws").cast("long"))
          .otherwise(lit(1L)))
      .withColumn("term", regexp_replace(col("rest"), "\\^\\d{1,9}$", ""))
      .filter(length(col("term")) > 0)
      .select(col("query_id"), col("term"), col("fld"), col("qw"))
      .distinct()
  }

  /** The quoted-run grammar (round 15), layered on the per-token one:
    *
    *   run := ("title" | "body") ":" '"' term (" " term)* '"' ["~" digits]
    *
    * `title:"a b c"` restricts the EXACT consecutive run `a b c` to
    * the title field, `body:"…"` to the body — the query-string form
    * of the field parameter the phrase_title faces take in Scala —
    * and a `~w` suffix (Lucene slop) relaxes adjacency to an ordered
    * window of span ≤ len−1+w, still entirely in-field (the NEAR
    * faces answer those; the exact-phrase faces answer slop-0 runs
    * only). Extracts the FIRST tagged quoted run per query as
    * (query_id, ptext, fld, slop) with slop = 0 when untagged;
    * queries with no tagged run parse to zero rows (nothing phrasal
    * to match — bare terms are [[parseFieldedQuery]] clauses). An
    * UNTAGGED quoted run (`"a b"`) and an unknown prefix
    * (`foo:"a b"`) are not phrase tags, mirroring the per-token
    * parser's unknown-prefix rule; slop digits cap at 4 (a span cap
    * is a small number — longer digit tails stay literal text after
    * the run, exactly the boost-cap discipline). Shared by the batch
    * faces ([[phraseQtagMatch]], [[nearQtagMatch]]) and the index
    * faces (streaming.IndexStream.queryPhraseTagged /
    * queryNearTagged) so tag parsing cannot drift between them.
    */
  private[graft] val taggedPhrasePat =
    "\\b(title|body):\"([^\"]+)\"(~\\d{1,4}(?!\\d))?"

  private[graft] def parseTaggedPhrase(queries: DataFrame): DataFrame =
    queries.filter(col("text").isNotNull)
      .withColumn("fld", regexp_extract(col("text"), taggedPhrasePat, 1))
      .withColumn("ptext", regexp_extract(col("text"), taggedPhrasePat, 2))
      .withColumn("slops",
        regexp_extract(col("text"), taggedPhrasePat, 3))
      .withColumn("slop",
        when(length(col("slops")) > 1,
          expr("substring(slops, 2)").cast("long"))
          .otherwise(lit(0L)))
      .filter(length(col("fld")) > 0 && length(col("ptext")) > 0)
      .select(col("query_id"), col("ptext"), col("fld"), col("slop"))

  /** The ONE fielded scorer both BM25F batch faces run through —
    * unfielded queries are the degenerate all-('any', 1) triple set,
    * so bm25f_topk / bm25f_titled pin this refactor bit-for-bit on
    * the oracle gate. Semantics per (term, fld, qw) clause:
    *
    *   wtf = [[titleWeight]]·tf_title + tf_body   (fld = any — the
    *         simple-BM25F blend of Robertson, Zaragoza & Taylor),
    *       = [[titleWeight]]·tf_title              (fld = title),
    *       = tf_body                               (fld = body);
    *   clause µ-score = qw · bm25µ(wtf, df, wdl)   (integer product
    *         AFTER the µ-floor — exact in both engines);
    *
    * wdl and Σ wdl stay the blended document lengths (normalization
    * is a document property, query-independent), df stays the
    * any-field DOCUMENT count (the stored statistic — a field-local
    * df would need per-field vocab state for a second-order idf
    * effect). Clauses with wtf = 0 (the term only in the other field)
    * do not match — that is exactly how `title:foo` ranks differently
    * from bare `foo`. Selection stays df-rarest-[[bm25QueryTerms]]
    * with the head-term cap, totally ordered by
    * (df, term, fld, qw) ascending over the distinct triples.
    *
    * Scale: identical plan shapes to [[bm25TopkOn]] — per-field tfs
    * are two conditional sums at the same (doc, term) grain; nothing
    * new shuffles.
    */
  private[graft] def bm25fScoredOn(d: DataFrame,
      trips: DataFrame, fieldLocalDf: Boolean = false): DataFrame = {
    val train = d.filter(col("source") =!= "src0")
    val ftoks =
      if (d.columns.contains("title"))
        train.select(col("doc_id"),
            explode(bm25Tokens(col("title"))).as("term"))
          .withColumn("infld", lit("title"))
          .unionByName(train.select(col("doc_id"),
              explode(bm25Tokens(col("text"))).as("term"))
            .withColumn("infld", lit("body")))
      else train
        .select(col("doc_id"),
          posexplode(bm25Tokens(col("text"))).as(Seq("pos", "term")))
        .withColumn("infld",
          when(col("pos") < titleTokens, lit("title"))
            .otherwise(lit("body")))
        .select(col("doc_id"), col("term"), col("infld"))
    // per-field tf pair at the same (doc, term) grain as the
    // unfielded face; the blended dl/df/stamp derive from it
    val tf = Caching.persistOnce(
      ftoks.groupBy(col("doc_id"), col("term"))
        .agg(sum(when(col("infld") === "title", lit(1L))
            .otherwise(lit(0L))).as("tft"),
          sum(when(col("infld") === "body", lit(1L))
            .otherwise(lit(0L))).as("tfb")))
    val dl = tf.groupBy(col("doc_id"))
      .agg(sum(col("tft") * titleWeight + col("tfb")).as("dl"))
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"),
      sum(when(col("tft") > 0, lit(1L)).otherwise(lit(0L))).as("dft"))
    val stamp = dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("totdl"))
    // FIELD-LOCAL DF (round 15): under `fieldLocalDf` a
    // title-restricted clause selects and scores with its TITLE-LOCAL
    // document frequency (`dft` — docs holding the term in the title
    // field), the clause df `cdf`; body/any clauses keep the
    // any-field count (the body dominates document mass, so its df IS
    // the any-field df to first order). A title clause with cdf = 0
    // cannot match and is not a clause. Off by default — the
    // unfielded/qtag faces stay pinned to any-field semantics.
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("cdf").asc, col("term").asc, col("fld").asc,
        col("qw").asc)
    val selected = trips.join(dfT, Seq("term"))
      .withColumn("cdf",
        if (fieldLocalDf)
          when(col("fld") === "title", col("dft")).otherwise(col("df"))
        else col("df"))
      .filter(col("cdf") > 0)
      .crossJoin(broadcast(stamp))
      .filter(bm25CapOk(col("cdf"), col("n_docs")))
      .withColumn("trank", row_number().over(wq))
      .filter(col("trank") <= bm25QueryTerms)
      .select(col("term"), col("query_id"), col("fld"), col("qw"),
        col("cdf").as("df"), col("n_docs"), col("totdl"))
    val scoredTerms = selected.join(tf, Seq("term"))
      .repartition(col("doc_id"))
      .join(dl, Seq("doc_id"))
      .withColumn("tf",
        when(col("fld") === "title", col("tft") * titleWeight)
          .when(col("fld") === "body", col("tfb"))
          .otherwise(col("tft") * titleWeight + col("tfb")))
      .filter(col("tf") > 0)
      .withColumn("term_micro", expr(bm25TermMicroExpr) * col("qw"))
    val wd = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col("doc_id").asc)
    val out = scoredTerms.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("term_micro")).as("score_micro"),
        count(lit(1)).as("n_terms"))
      .withColumn("rank", row_number().over(wd))
      .filter(col("rank") <= bm25K)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("score_micro"), col("n_terms"))
    canon(out)
  }

  /** The BM25F oracle chain — position-derived field weights feeding
    * the same selection/scoring text as the unfielded chain. Emits
    * `..franked`.
    */
  private[graft] def bm25fCtes(train: String, queries: String): String =
    s"""ftoks AS (
       |  SELECT doc_id,
       |    unnest(string_split(lower(text), ' ')) AS term,
       |    unnest(generate_series(0,
       |      len(string_split(lower(text), ' ')) - 1)) AS pos
       |  FROM $train
       |), fwtoks AS (
       |  SELECT doc_id, term,
       |    CASE WHEN pos < $titleTokens THEN $titleWeight ELSE 1 END AS w
       |  FROM ftoks
       |), ${bm25fScoreCtes(queries)}""".stripMargin

  /** The BM25F oracle chain for a REAL `title` column (round 13 —
    * the oracle twin of bm25fTopkOn's schema-driven branch): title
    * terms at weight [[titleWeight]] union body terms at 1, feeding
    * the same blend-before-saturate scoring tail. `train` must expose
    * (doc_id, title, text). Emits `..franked`.
    */
  private[graft] def bm25fTitledCtes(train: String,
      queries: String): String =
    s"""fwtoks AS (
       |  SELECT doc_id, unnest(string_split(lower(title), ' ')) AS term,
       |    $titleWeight AS w
       |  FROM $train WHERE title IS NOT NULL
       |  UNION ALL
       |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term,
       |    1 AS w
       |  FROM $train WHERE text IS NOT NULL
       |), ${bm25fScoreCtes(queries)}""".stripMargin

  /** The shared BM25F scoring tail over a weighted-token CTE `fwtoks`
    * (doc_id, term, w): blended tf/dl, any-field df, the unfielded
    * selection rule, one µ-score ranking. Emits `..franked`.
    */
  private def bm25fScoreCtes(queries: String): String =
    s"""tf AS (
       |  SELECT doc_id, term, CAST(sum(w) AS BIGINT) AS tf
       |  FROM fwtoks GROUP BY 1, 2
       |), dl AS (
       |  SELECT doc_id, CAST(sum(w) AS BIGINT) AS dl FROM fwtoks GROUP BY 1
       |), dft AS (
       |  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1
       |), stamp AS (
       |  SELECT count(*)::BIGINT AS n_docs, CAST(sum(dl) AS BIGINT) AS totdl
       |  FROM dl
       |), qterms AS (
       |  SELECT doc_id AS query_id,
       |    unnest(list_distinct(string_split(lower(text), ' '))) AS term
       |  FROM $queries
       |), fsel AS (
       |  SELECT term, query_id, df FROM (
       |    SELECT q.term, q.query_id, d.df,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY d.df ASC, q.term ASC) AS trank
       |    FROM qterms q JOIN dft d USING (term), stamp st
       |    WHERE 2 * d.df <= st.n_docs)
       |  WHERE trank <= $bm25QueryTerms
       |), fterms AS (
       |  SELECT s.query_id, tf.doc_id,
       |    ${termMicroSql("tf.tf", "s.df", "dl.dl")} AS term_micro
       |  FROM fsel s JOIN tf USING (term) JOIN dl ON tf.doc_id = dl.doc_id,
       |    stamp st
       |), fscored AS (
       |  SELECT query_id, doc_id, CAST(sum(term_micro) AS BIGINT) AS score_micro,
       |    count(*)::BIGINT AS n_terms
       |  FROM fterms GROUP BY 1, 2
       |), franked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY score_micro DESC, doc_id ASC) AS rank
       |  FROM fscored
       |)""".stripMargin

  val bm25fTopkSql: String =
    s"""WITH ${bm25fCtes(
        "(SELECT doc_id, text FROM documents WHERE source <> 'src0')",
        "(SELECT doc_id, text FROM documents WHERE source = 'src0')")}
       |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, score_micro, n_terms
       |FROM franked WHERE rank <= $bm25K
       |${canonOrderSql(Seq("query_id", "rank", "doc_id", "score_micro",
         "n_terms"))}""".stripMargin

  // ---------------------------------------------------------------------
  // bm25f_titled — BM25F over a REAL title column (round 13)
  // ---------------------------------------------------------------------

  /** The titled-corpus derivation shared by the bm25f_titled faces
    * and their oracle: each document's title is its 1 + doc_id % 5
    * TRAILING tokens (varying length — never the degenerate
    * first-[[titleTokens]] convention — with vocabulary that
    * naturally overlaps query terms). Exact-integer arithmetic and a
    * whitespace join that round-trips the shared tokenizer, so both
    * engines derive byte-identical titles.
    */
  private[graft] def withDerivedTitle(d: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val n = (lit(1) + pmod(col("doc_id"), lit(5)).cast("int"))
    d.withColumn("title",
      array_join(slice(toks, greatest(lit(1), size(toks) - n + 1), n),
        " "))
  }

  private def titledTrainSql(src: String): String =
    s"""(SELECT doc_id, text,
       |  array_to_string(
       |    list_slice(string_split(text, ' '),
       |      greatest(1, len(string_split(text, ' '))
       |        - (1 + doc_id % 5) + 1),
       |      len(string_split(text, ' '))), ' ') AS title
       |FROM documents WHERE source <> '$src')""".stripMargin

  /** bm25f_titled — the schema-driven BM25F branch on the hard gate
    * (round 13): the corpus carries a REAL `title` column (derived
    * identically in both engines), so title terms weigh
    * [[titleWeight]] as a FIELD, not by position. Exercises
    * bm25fTopkOn's `title`-column branch against [[bm25fTitledCtes]].
    */
  def bm25fTitled(spark: SparkSession, sfDir: String): DataFrame =
    bm25fTopkOn(withDerivedTitle(load(spark, sfDir, "documents")))

  /** bm25f_titled_index — the layout-v7 FIELDED STATE on the hard
    * gate: the titled corpus folds into an LSM index whose docs
    * sub-table stores each document's real field boundary (ttl =
    * |title tokens|), and IndexStream.queryFielded consumes the
    * STORED boundary — bit-identical to [[bm25fTitled]] by shared
    * definitions, checked against the same oracle SQL.
    */
  def bm25fTitledIndex(spark: SparkSession, sfDir: String): DataFrame = {
    val (state, q) = ridxfStateAndQueries(spark, sfDir)
    canon(graft.streaming.IndexStream.queryFielded(spark, state, q))
  }

  val bm25fTitledSql: String =
    s"""WITH titled AS ${titledTrainSql("src0")},
       |${bm25fTitledCtes("titled",
        "(SELECT doc_id, text FROM documents WHERE source = 'src0')")}
       |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, score_micro, n_terms
       |FROM franked WHERE rank <= $bm25K
       |${canonOrderSql(Seq("query_id", "rank", "doc_id", "score_micro",
         "n_terms"))}""".stripMargin

  // ---------------------------------------------------------------------
  // bm25f_qtag — FIELDED QUERIES: per-field tags + query weights (r14)
  // ---------------------------------------------------------------------

  /** The deterministic tagging rule the two bm25f_qtag gate rows query
    * with: token at position p of the raw query text becomes
    * `title:<tok>` when p % 3 = 0, `<tok>^2` when p % 3 = 1, and stays
    * bare otherwise — so every query exercises a field restriction, an
    * explicit query weight, and the default blend at once. The Spark
    * faces PARSE these tagged strings back through
    * [[parseFieldedQuery]] (the feature under test); the oracle
    * derives the same (term, fld, qw) triples arithmetically from the
    * raw text, so a parse bug cannot hide.
    */
  private[graft] def withTaggedQueryText(q: DataFrame): DataFrame =
    q.withColumn("text", array_join(expr(
      "transform(split(lower(text), ' '), (t, i) -> " +
        "CASE WHEN i % 3 = 0 THEN concat('title:', t) " +
        "WHEN i % 3 = 1 THEN concat(t, '^2') ELSE t END)"), " "))

  /** bm25f_qtag_topk — fielded QUERIES on the hard gate: the titled
    * corpus of [[bm25fTitled]] queried with per-field tags and query
    * weights (see [[parseFieldedQuery]] for the syntax and
    * [[bm25fScoredOn]] for the clause semantics). A `title:`-tagged
    * term matches only title occurrences — the row where a
    * title-targeted query ranks DIFFERENTLY from the unfielded query
    * over the same corpus.
    */
  def bm25fQtagTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val d = withDerivedTitle(load(spark, sfDir, "documents"))
    val q = withTaggedQueryText(d.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"), col("text")))
    bm25fScoredOn(d, parseFieldedQuery(q))
  }

  /** bm25f_qtag_index — the INCREMENTAL fielded-query face over the
    * SAME shared v7 state as bm25f_titled_index (no extra state
    * build): tagged queries parse through the shared
    * [[parseFieldedQuery]], per-field tfs derive from the stored
    * positions against the STORED field boundary, and the result must
    * reproduce [[bm25fQtagTopk]]'s oracle bit-for-bit.
    */
  def bm25fQtagIndex(spark: SparkSession, sfDir: String): DataFrame = {
    val (state, q) = ridxfStateAndQueries(spark, sfDir)
    canon(graft.streaming.IndexStream.queryFieldedTagged(spark, state,
      withTaggedQueryText(q)))
  }

  /** bm25f_ldf_topk — FIELD-LOCAL DF (round 15) on the hard gate: the
    * same tagged queries as bm25f_qtag_topk, scored with each
    * `title:` clause's TITLE-LOCAL document frequency (docs holding
    * the term in the title field) instead of the understating
    * any-field count — the second-order idf effect the v7 fielded
    * state could not express. The oracle derives dft arithmetically
    * from raw text; the row where a title-restricted ranking provably
    * uses title rarity.
    */
  def bm25fLdfTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val d = withDerivedTitle(load(spark, sfDir, "documents"))
    val q = withTaggedQueryText(d.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"), col("text")))
    bm25fScoredOn(d, parseFieldedQuery(q), fieldLocalDf = true)
  }

  /** bm25f_ldf_index — the INCREMENTAL field-local-df face over the
    * SAME shared v8 state (no extra state build): per-clause df from
    * the dfs sub-table's fold-maintained `dft` column, reproducing
    * [[bm25fLdfTopk]]'s oracle bit-for-bit.
    */
  def bm25fLdfIndex(spark: SparkSession, sfDir: String): DataFrame = {
    val (state, q) = ridxfStateAndQueries(spark, sfDir)
    canon(graft.streaming.IndexStream.queryFieldedTagged(spark, state,
      withTaggedQueryText(q), fieldLocalDf = true))
  }

  /** The fielded-QUERY oracle chain: per-field tf pair at (doc, term)
    * grain, blended dl, any-field df, the rule-derived query triples,
    * the (df, term, fld, qw)-ordered selection, and the per-clause
    * wtf CASE — the SQL twin of [[bm25fScoredOn]] over
    * [[parseFieldedQuery]] output. Emits `..franked`.
    */
  private def bm25fQtagCtes(titledTrain: String,
      queries: String, fieldLocalDf: Boolean = false,
      excludeRun: Option[Int] = None): String = {
    val cdf = if (fieldLocalDf)
      "CASE WHEN q.fld = 'title' THEN d.dft ELSE d.df END"
    else "d.df"
    // the qlang rule: token positions 1..len form the quoted phrase
    // run, so they are NOT term clauses
    val runFilter = excludeRun
      .map(l => s"WHERE pos NOT BETWEEN 1 AND $l").getOrElse("")
    s"""ftoks AS (
       |  SELECT doc_id, unnest(string_split(lower(title), ' ')) AS term,
       |    'title' AS infld
       |  FROM $titledTrain WHERE title IS NOT NULL
       |  UNION ALL
       |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term,
       |    'body' AS infld
       |  FROM $titledTrain WHERE text IS NOT NULL
       |), ftf AS (
       |  SELECT doc_id, term,
       |    CAST(sum(CASE WHEN infld = 'title' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS tft,
       |    CAST(sum(CASE WHEN infld = 'body' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS tfb
       |  FROM ftoks GROUP BY 1, 2
       |), fdl AS (
       |  SELECT doc_id, CAST(sum($titleWeight * tft + tfb) AS BIGINT) AS dl
       |  FROM ftf GROUP BY 1
       |), fdft AS (
       |  SELECT term, count(*)::BIGINT AS df,
       |    CAST(sum(CASE WHEN tft > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS dft
       |  FROM ftf GROUP BY 1
       |), stamp AS (
       |  SELECT count(*)::BIGINT AS n_docs, CAST(sum(dl) AS BIGINT) AS totdl
       |  FROM fdl
       |), qtrips AS (
       |  SELECT DISTINCT doc_id AS query_id, term,
       |    CASE WHEN pos % 3 = 0 THEN 'title' ELSE 'any' END AS fld,
       |    CAST(CASE WHEN pos % 3 = 1 THEN 2 ELSE 1 END AS BIGINT) AS qw
       |  FROM (
       |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term,
       |      unnest(generate_series(0,
       |        len(string_split(lower(text), ' ')) - 1)) AS pos
       |    FROM $queries)
       |  $runFilter
       |), qsel AS (
       |  SELECT query_id, term, fld, qw, df FROM (
       |    SELECT q.query_id, q.term, q.fld, q.qw, $cdf AS df,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY $cdf ASC, q.term ASC, q.fld ASC, q.qw ASC)
       |        AS trank
       |    FROM qtrips q JOIN fdft d USING (term), stamp st
       |    WHERE $cdf > 0 AND 2 * ($cdf) <= st.n_docs)
       |  WHERE trank <= $bm25QueryTerms
       |), fhits AS (
       |  SELECT s.query_id, f.doc_id, s.qw, s.df, dl.dl,
       |    CASE WHEN s.fld = 'title' THEN $titleWeight * f.tft
       |         WHEN s.fld = 'body' THEN f.tfb
       |         ELSE $titleWeight * f.tft + f.tfb END AS wtf
       |  FROM qsel s JOIN ftf f USING (term)
       |    JOIN fdl dl ON f.doc_id = dl.doc_id
       |), fterms AS (
       |  SELECT query_id, doc_id,
       |    h.qw * ${termMicroSql("h.wtf", "h.df", "h.dl")} AS term_micro
       |  FROM fhits h, stamp st WHERE h.wtf > 0
       |), fscored AS (
       |  SELECT query_id, doc_id,
       |    CAST(sum(term_micro) AS BIGINT) AS score_micro,
       |    count(*)::BIGINT AS n_terms
       |  FROM fterms GROUP BY 1, 2
       |), franked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY score_micro DESC, doc_id ASC) AS rank
       |  FROM fscored
       |)""".stripMargin
  }

  val bm25fQtagSql: String =
    s"""WITH titled AS ${titledTrainSql("src0")},
       |${bm25fQtagCtes("titled",
        "(SELECT doc_id, text FROM documents WHERE source = 'src0')")}
       |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, score_micro, n_terms
       |FROM franked WHERE rank <= $bm25K
       |${canonOrderSql(Seq("query_id", "rank", "doc_id", "score_micro",
         "n_terms"))}""".stripMargin

  val bm25fLdfSql: String =
    s"""WITH titled AS ${titledTrainSql("src0")},
       |${bm25fQtagCtes("titled",
        "(SELECT doc_id, text FROM documents WHERE source = 'src0')",
        fieldLocalDf = true)}
       |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, score_micro, n_terms
       |FROM franked WHERE rank <= $bm25K
       |${canonOrderSql(Seq("query_id", "rank", "doc_id", "score_micro",
         "n_terms"))}""".stripMargin

  /** bm25f_index — the INCREMENTAL fielded face: weighted tf from the
    * positional postings the layout already carries, weighted dl from
    * the stored dl, the weighted corpus length from the v6 markers —
    * no fielded state at all (see IndexStream.queryFielded).
    * Driver-checked against the same [[bm25fTopkSql]].
    */
  def bm25fIndex(spark: SparkSession, sfDir: String): DataFrame = {
    val (state, q) = ridxStateAndQueries(spark, sfDir)
    canon(graft.streaming.IndexStream.queryFielded(spark, state, q))
  }

  /** bm25_index_topk — the INCREMENTAL retrieval face, driver-checked
    * against the same oracle as bm25_topk. The corpus is folded into
    * the LSM inverted index (streaming.IndexStream) in three
    * micro-batch generations plus one compaction, then ranked
    * retrieval runs over the accumulated state. Because the tokenizer,
    * term-selection rule, scoring expression, and k are shared
    * definitions with [[bm25TopkOn]], the index face must reproduce
    * the batch face's oracle SQL bit-for-bit — the gate's equivalence
    * contract surfaced as a CORRECTNESS row, not just a spec.
    */
  def bm25IndexTopk(spark: SparkSession, sfDir: String): DataFrame = {
    // three generations, UNcompacted: 3 ≤ the gate's compaction
    // cadence (defaultMaxGenerations = 8), so the query face is
    // exercised at honest LSM read amplification — compaction is
    // maintenance, not query work (IndexStreamSpec pins that it
    // preserves answers)
    val (state, q) = ridxStateAndQueries(spark, sfDir)
    canon(graft.streaming.IndexStream.queryTopK(spark, state, q))
  }

  /** bm25_full_index — the INCREMENTAL MaxScore face: full-query exact
    * BM25 (every uncapped term scores) over the SAME LSM index state as
    * bm25_index_topk, with the pruning proof served from the dfs
    * sub-table's stored per-term impact bound (`max_tf`, layout v5) —
    * no posting list is read to decide exactness. Driver-checked
    * against the same full-scoring SQL as the batch face
    * (bm25_full_topk): the shared tokenizer/cap/scoring/k definitions
    * make the two faces bit-identical by construction.
    */
  def bm25FullIndex(spark: SparkSession, sfDir: String): DataFrame = {
    val (state, q) = ridxStateAndQueries(spark, sfDir)
    canon(graft.streaming.IndexStream.queryTopKAll(spark, state, q))
  }

  /** bm25_after_redomain — the GROWTH path of the corpus-adaptive dir
    * domains (round 11) on the driver's oracle gate: the train corpus
    * folds into a state created at the SMALLEST domain (Geom(16,1) —
    * as if sized for a tiny corpus), then `redomainIfDue` grows it to
    * the production domain through the migrate-shell rebuild, and
    * ranked retrieval over the re-domained state must still reproduce
    * the same first-principles oracle SQL as bm25_index_topk. This is
    * the one oracle row that drives the migration/rebuild machinery
    * end-to-end at SF scale (elsewhere it is spec-pinned only); it
    * also proves the rebuild's physical tombstone reclaim implicitly —
    * the state carries no tombs here, but the consolidated ingest=-1
    * generation, re-derived markers, and dfs re-aggregation are all on
    * the scored path.
    */
  private val ridxGrowRecipe =
    "ridxgrow: init tiny Geom(16,1); 2 folds pmod(doc_id,2)=i; " +
      "redomainIfDue to production"

  def bm25AfterRedomain(spark: SparkSession, sfDir: String): DataFrame = {
    val d = load(spark, sfDir, "documents")
    val layTiny = graft.streaming.IndexStream.adaptiveLayoutVersion(1L)
    val layProd = graft.streaming.IndexStream.layoutVersion
    val state = TmpData.sharedState("ridxgrow", sfDir,
        TmpData.stampOf(layTiny, layProd, ridxGrowRecipe),
        Seq(layProd)) { staging =>
      graft.streaming.IndexStream.initState(spark, staging,
        expectedDocs = 1L)
      val train = d.filter(col("source") =!= "src0")
        .select(col("doc_id"), col("text"), col("source"))
      (0 until 2).foreach { i =>
        graft.streaming.IndexStream.applyBatch(spark, staging,
          train.filter(pmod(col("doc_id"), lit(2)) === i), i.toLong)
      }
      require(graft.streaming.IndexStream.redomainIfDue(spark, staging,
        expectedDocs = Some(1L << 22)),
        s"redomain did not run while growing $staging")
    }
    val q = d.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"), col("text"))
    canon(graft.streaming.IndexStream.queryTopK(spark, state, q))
  }

  // ---------------------------------------------------------------------
  // phrase_match — positional exact-phrase retrieval
  // ---------------------------------------------------------------------

  /** Tokens of a phrase query: the first [[phraseLen]] tokens of the
    * query text (the retrieval convention: the query's leading bigram
    * is its phrase). Shared with the incremental face
    * (streaming.IndexStream.queryPhrase) so phrase extraction cannot
    * drift between engines.
    */
  private[graft] val phraseLen = 2

  private[graft] def phraseTerms(text: Column,
      len: Int = phraseLen): Column =
    slice(bm25Tokens(text), 1, len)

  /** The positional-match core shared by the batch face and the
    * incremental index face: given anchor rows (query_id, doc_id,
    * anchor) — one row per (phrase slot i, document position p) with
    * term agreement, anchor = p − i — a document matches the phrase at
    * an anchor iff ALL [[phraseLen]] slots produced that anchor (each
    * slot contributes at most one row per anchor since p = anchor + i
    * is determined, so count(*) counts matched slots exactly; an
    * anchor < 0 or past the document end can never reach the full
    * count, so no bounds filter is needed). Occurrences may overlap
    * ("a a a" contains "a a" at anchors 0 and 1 → n_occ = 2). Ranking:
    * occurrence count desc, doc_id asc, top [[bm25K]] per query —
    * ONE definition, so the two faces agree bit-for-bit by
    * construction.
    */
  private[graft] def phraseRank(anchors: DataFrame,
      len: Int = phraseLen): DataFrame = {
    val occ = anchors
      .groupBy(col("query_id"), col("doc_id"), col("anchor"))
      .agg(count(lit(1)).as("nm"))
      .filter(col("nm") === len)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_occ"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("n_occ").desc, col("doc_id").asc)
    occ.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= bm25K)
      .select(col("query_id"), col("rank"), col("doc_id"), col("n_occ"))
  }

  /** Exact-phrase retrieval: each benchmark document (src0, the
    * eval-set slice) queries the train corpus for documents containing
    * its leading [[phraseLen]]-token phrase as a CONSECUTIVE token
    * sequence, ranked by occurrence count. The positional complement
    * of [[bm25Topk]] — bag-of-words scoring cannot express adjacency;
    * a positional index can (verbatim-quotation contamination audits,
    * boilerplate detection, exact-quote attribution all reduce to
    * this).
    *
    * Plan shape: the term equi-join IS the posting fetch — candidate
    * volume is Σ df over the phrase's terms (never queries × corpus),
    * and the phrase side (queries × [[phraseLen]] rows) broadcasts.
    * The anchor intersection is a groupBy at (query, doc, anchor)
    * grain bounded by the fetched posting volume — the classic
    * positions-list merge expressed as one aggregation instead of a
    * per-document cursor walk, which is what distributes.
    */
  def phraseMatch(spark: SparkSession, sfDir: String): DataFrame =
    phraseMatchOn(load(spark, sfDir, "documents"))

  /** The slot-position rows (query_id, doc_id, i, pos) both positional
    * faces consume: one row per (phrase slot i, document position pos)
    * with term agreement — the posting fetch expressed as the term
    * equi-join. Shared by [[phraseMatchOn]] and [[nearMatchOn]].
    */
  private def phrasePosRowsOn(d: DataFrame,
      len: Int = phraseLen, distinctTerms: Boolean = false): DataFrame = {
    val toks = d.filter(col("source") =!= "src0")
      .select(col("doc_id"),
        posexplode(bm25Tokens(col("text"))).as(Seq("pos", "term")))
    val qp = d.filter(col("source") === "src0")
      .filter(size(bm25Tokens(col("text"))) >= len)
      // the unordered face's contract: all len phrase terms distinct
      .filter(if (distinctTerms)
          size(array_distinct(phraseTerms(col("text"), len))) === len
        else lit(true))
      .select(col("doc_id").as("query_id"),
        posexplode(phraseTerms(col("text"), len)).as(Seq("i", "term")))
    qp.join(toks, Seq("term"))
      .select(col("query_id"), col("doc_id"), col("i"), col("pos"))
  }

  /** [[phraseMatch]] over an explicit documents relation — the spec
    * seam. The anchor core is length-generic (a document matches at an
    * anchor iff all `len` slots produced it), so phrase length is an
    * API parameter; the bigram default is the retrieval convention the
    * fixed oracle rows pin.
    */
  def phraseMatchOn(d: DataFrame, len: Int = phraseLen): DataFrame = {
    val anchors = phrasePosRowsOn(d, len)
      .select(col("query_id"), col("doc_id"),
        (col("pos") - col("i")).as("anchor"))
    canon(phraseRank(anchors, len))
  }

  /** FIELD-RESTRICTED phrase retrieval (round 14): the phrase must lie
    * ENTIRELY within one field of a titled corpus — `title` means
    * every slot position < |title tokens|, `body` means the anchor
    * starts at or past the boundary; a run straddling the title/body
    * seam matches neither (it is not a phrase of either field). Over
    * the v7 token stream (title ++ body, one position space) this is
    * one predicate on the anchor against the per-doc boundary — the
    * same number the fielded index state stores as `ttl` — so the
    * batch and index faces share everything but where the boundary
    * comes from (recomputed here, STORED there). The anchor filter
    * applies before [[phraseRank]]'s count-of-slots gate and keeps or
    * drops whole anchor groups, so occurrence counts stay exact.
    */
  def phraseFieldMatchOn(d: DataFrame, len: Int = phraseLen,
      field: String = "title"): DataFrame = {
    require(field == "title" || field == "body",
      s"field must be title|body, got $field")
    val qp = d.filter(col("source") === "src0")
      .filter(size(bm25Tokens(col("text"))) >= len)
      .select(col("doc_id").as("query_id"), lit(field).as("fld"),
        posexplode(phraseTerms(col("text"), len)).as(Seq("i", "term")))
    phraseFieldRankOn(d, qp, len)
  }

  /** The ONE field-restricted anchor core both phrase faces above and
    * the tagged face below run through — `qp` is the slot relation
    * (query_id, fld, i, term) with fld ∈ {title, body} PER QUERY; the
    * constant-field face is the degenerate all-one-field case, which
    * keeps this core pinned bit-for-bit by phrase_title_match /
    * phrase_title_index on the oracle gate. The per-query field rides
    * the slot rows (fld is functionally dependent on query_id), so
    * the anchor predicate is one CASE against the recomputed
    * boundary — no extra join over the constant-field shape.
    */
  /** The titled corpus's (position stream, boundary) pair — the
    * title ++ body token positions and per-doc ttl the
    * field-restricted positional faces consume. ONE definition so the
    * phrase and NEAR tagged faces cannot drift on the stream shape.
    */
  private def titledStream(d: DataFrame): (DataFrame, DataFrame) = {
    require(d.columns.contains("title"),
      "field-restricted positional faces need a titled corpus " +
        "(title column)")
    val train = d.filter(col("source") =!= "src0")
    val ttoksC = when(col("title").isNotNull, bm25Tokens(col("title")))
      .otherwise(array())
    (train.select(col("doc_id"),
        posexplode(concat(ttoksC, bm25Tokens(col("text"))))
          .as(Seq("pos", "term"))),
      train.select(col("doc_id"), size(ttoksC).cast("long").as("ttl")))
  }

  private def phraseFieldRankOn(d: DataFrame, qp: DataFrame,
      len: Int): DataFrame = {
    val (toks, bound) = titledStream(d)
    val anchors = qp.join(toks, Seq("term"))
      .select(col("query_id"), col("fld"), col("doc_id"),
        (col("pos") - col("i")).as("anchor"))
      .join(bound, Seq("doc_id"))
      .filter(when(col("fld") === "title",
          col("anchor") + (len - 1) < col("ttl"))
        .otherwise(col("anchor") >= col("ttl")))
      .select(col("query_id"), col("doc_id"), col("anchor"))
    canon(phraseRank(anchors, len))
  }

  /** phrase_title_match / phrase_title_index — the field-restricted
    * phrase pair on the hard gate: bigram phrases that must match
    * inside the derived TITLE (trailing 1 + doc_id % 5 tokens — so a
    * straddling run exists to be excluded). The index face reuses the
    * shared ridxf v7 state and its STORED boundary.
    */
  def phraseTitleMatch(spark: SparkSession, sfDir: String): DataFrame =
    phraseFieldMatchOn(withDerivedTitle(load(spark, sfDir, "documents")),
      len = 2, field = "title")

  def phraseTitleIndex(spark: SparkSession, sfDir: String): DataFrame = {
    val (state, q) = ridxfStateAndQueries(spark, sfDir)
    canon(graft.streaming.IndexStream.queryPhraseFielded(spark, state, q,
      len = 2, field = "title"))
  }

  /** The field-restricted phrase oracle chain over a titled train
    * relation: the concatenated title ++ body position space, the
    * per-doc boundary, and the anchor-window predicate — the SQL twin
    * of [[phraseFieldMatchOn]]. Emits `..pranked`.
    */
  private def phraseFieldCtes(titledTrain: String, queries: String,
      len: Int, field: String): String = {
    val pred =
      if (field == "title") s"a.anchor + ${len - 1} < b.ttl"
      else "a.anchor >= b.ttl"
    s"""fstream AS (
       |  SELECT doc_id,
       |    list_concat(string_split(lower(title), ' '),
       |      string_split(lower(text), ' ')) AS toks,
       |    len(string_split(lower(title), ' '))::BIGINT AS ttl
       |  FROM $titledTrain
       |), ptoks AS (
       |  SELECT doc_id, unnest(toks) AS term,
       |    unnest(generate_series(0, len(toks) - 1)) AS pos
       |  FROM fstream
       |), qp AS (
       |  SELECT doc_id AS query_id,
       |    unnest(list_slice(string_split(lower(text), ' '), 1,
       |      $len)) AS term,
       |    unnest(generate_series(0, $len - 1)) AS i
       |  FROM $queries
       |  WHERE len(string_split(lower(text), ' ')) >= $len
       |), panchor AS (
       |  SELECT q.query_id, t.doc_id, t.pos - q.i AS anchor
       |  FROM qp q JOIN ptoks t USING (term)
       |), pfanchor AS (
       |  SELECT a.query_id, a.doc_id, a.anchor
       |  FROM panchor a JOIN fstream b USING (doc_id)
       |  WHERE $pred
       |), pocc AS (
       |  SELECT query_id, doc_id, count(*)::BIGINT AS n_occ FROM (
       |    SELECT query_id, doc_id, anchor FROM pfanchor
       |    GROUP BY 1, 2, 3 HAVING count(*) = $len)
       |  GROUP BY 1, 2
       |), pranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY n_occ DESC, doc_id ASC) AS rank
       |  FROM pocc
       |)""".stripMargin
  }

  val phraseTitleSql: String =
    s"""WITH titled AS ${titledTrainSql("src0")},
       |${phraseFieldCtes("titled",
        "(SELECT doc_id, text FROM documents WHERE source = 'src0')",
        len = 2, field = "title")}
       |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, n_occ
       |FROM pranked WHERE rank <= $bm25K
       |${canonOrderSql(Seq("query_id", "rank", "doc_id", "n_occ"))}""".stripMargin

  // ---------------------------------------------------------------------
  // phrase_qtag — TAGGED fielded phrase: title:"a b" in the query STRING
  // ---------------------------------------------------------------------

  /** The deterministic tagging rule the two phrase_qtag gate rows
    * query with: lowered query tokens t₀ t₁ … become
    * `t₀ fld:"t₁ … t_len" t_{len+1} …` with fld = title when
    * query_id is even, body when odd — so the phrase is NOT the
    * leading run (an implementation that ignores the tag and phrases
    * the leading tokens diverges), both field branches exercise in
    * one gate row, and the bare distractor tokens around the quoted
    * run prove the parser selects the run. Queries with fewer than
    * len + 1 tokens have no room for the leading distractor and are
    * excluded (mirrored in the oracle's WHERE). The Spark faces PARSE
    * the tagged strings back through [[parseTaggedPhrase]] (the
    * feature under test); the oracle derives fld and the run's slot
    * terms arithmetically from the RAW text, so a parse bug cannot
    * hide.
    */
  private[graft] def withTaggedPhraseText(q: DataFrame,
      len: Int = 2): DataFrame = {
    val toks = split(lower(col("text")), " ")
    q.filter(size(toks) >= len + 1)
      .withColumn("text", concat_ws(" ",
        array(element_at(toks, 1),
          concat(
            when(pmod(col("query_id"), lit(2)) === 0, lit("title"))
              .otherwise(lit("body")),
            lit(":\""),
            array_join(slice(toks, 2, len), " "),
            lit("\""))),
        slice(toks, lit(len + 2), greatest(size(toks) - (len + 1), lit(0)))))
  }

  /** phrase_qtag_match — field-restricted phrase retrieval where the
    * restriction is expressed IN the query string (`title:"a b"` /
    * `body:"a b"`, parsed by the shared [[parseTaggedPhrase]]) instead
    * of a Scala parameter: the quoted run must lie entirely within
    * the tagged field of the titled corpus, per query. Routes through
    * the same [[phraseFieldRankOn]] core as the parameterized
    * phrase_title faces — the constant-field face is the degenerate
    * case that pins the core.
    */
  def phraseQtagMatch(spark: SparkSession, sfDir: String): DataFrame = {
    val d = withDerivedTitle(load(spark, sfDir, "documents"))
    val q = withTaggedPhraseText(d.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"), col("text")), len = 2)
    phraseQtagMatchOn(d, q, len = 2)
  }

  /** [[phraseQtagMatch]] over explicit corpus + tagged-query
    * relations — the spec seam. */
  private[graft] def phraseQtagMatchOn(d: DataFrame, queries: DataFrame,
      len: Int): DataFrame = {
    // a slop-tagged run is a PROXIMITY clause ([[nearQtagMatch]]
    // answers it); the exact-phrase face answers slop-0 runs only
    val parsed = parseTaggedPhrase(queries).filter(col("slop") === 0L)
    val qp = parsed.filter(size(bm25Tokens(col("ptext"))) >= len)
      .select(col("query_id"), col("fld"),
        posexplode(phraseTerms(col("ptext"), len)).as(Seq("i", "term")))
    phraseFieldRankOn(d, qp, len)
  }

  /** phrase_qtag_index — the INCREMENTAL tagged-phrase face over the
    * SAME shared v7 state as phrase_title_index (no extra state
    * build): tagged queries parse through the shared
    * [[parseTaggedPhrase]], the per-query field restriction applies
    * against the STORED boundary, and the result must reproduce
    * [[phraseQtagMatch]]'s oracle bit-for-bit.
    */
  def phraseQtagIndex(spark: SparkSession, sfDir: String): DataFrame = {
    val (state, q) = ridxfStateAndQueries(spark, sfDir)
    canon(graft.streaming.IndexStream.queryPhraseTagged(spark, state,
      withTaggedPhraseText(q, len = 2), len = 2))
  }

  /** The tagged-phrase oracle chain: the titled position space and
    * boundary of the phrase_title oracle, with fld and the quoted
    * run's slot terms derived ARITHMETICALLY from the raw query text
    * (fld from query_id parity, slots from token positions
    * 1..len — never from the tagged string the engine parses).
    * Emits `..pranked`.
    */
  private def phraseQtagCtes(titledTrain: String, queries: String,
      len: Int): String =
    s"""fstream AS (
       |  SELECT doc_id,
       |    list_concat(string_split(lower(title), ' '),
       |      string_split(lower(text), ' ')) AS toks,
       |    len(string_split(lower(title), ' '))::BIGINT AS ttl
       |  FROM $titledTrain
       |), ptoks AS (
       |  SELECT doc_id, unnest(toks) AS term,
       |    unnest(generate_series(0, len(toks) - 1)) AS pos
       |  FROM fstream
       |), qsel AS (
       |  SELECT doc_id AS query_id,
       |    CASE WHEN doc_id % 2 = 0 THEN 'title' ELSE 'body' END AS fld,
       |    string_split(lower(text), ' ') AS qtoks
       |  FROM $queries
       |  WHERE len(string_split(lower(text), ' ')) >= ${len + 1}
       |), qp AS (
       |  SELECT query_id, fld,
       |    unnest(list_slice(qtoks, 2, ${len + 1})) AS term,
       |    unnest(generate_series(0, ${len - 1})) AS i
       |  FROM qsel
       |), panchor AS (
       |  SELECT q.query_id, q.fld, t.doc_id, t.pos - q.i AS anchor
       |  FROM qp q JOIN ptoks t USING (term)
       |), pfanchor AS (
       |  SELECT a.query_id, a.doc_id, a.anchor
       |  FROM panchor a JOIN fstream b USING (doc_id)
       |  WHERE CASE WHEN a.fld = 'title'
       |    THEN a.anchor + ${len - 1} < b.ttl
       |    ELSE a.anchor >= b.ttl END
       |), pocc AS (
       |  SELECT query_id, doc_id, count(*)::BIGINT AS n_occ FROM (
       |    SELECT query_id, doc_id, anchor FROM pfanchor
       |    GROUP BY 1, 2, 3 HAVING count(*) = $len)
       |  GROUP BY 1, 2
       |), pranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY n_occ DESC, doc_id ASC) AS rank
       |  FROM pocc
       |)""".stripMargin

  val phraseQtagSql: String =
    s"""WITH titled AS ${titledTrainSql("src0")},
       |${phraseQtagCtes("titled",
        "(SELECT doc_id, text FROM documents WHERE source = 'src0')",
        len = 2)}
       |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, n_occ
       |FROM pranked WHERE rank <= $bm25K
       |${canonOrderSql(Seq("query_id", "rank", "doc_id", "n_occ"))}""".stripMargin

  // ---------------------------------------------------------------------
  // near_qtag — SLOP-tagged fielded proximity: title:"a b"~w (round 15)
  // ---------------------------------------------------------------------

  /** The deterministic tagging rule the two near_qtag gate rows query
    * with: [[withTaggedPhraseText]]'s shape plus a `~slop` suffix
    * with slop = query_id % 3 — so slop 0 (exact adjacency), 1, and 2
    * all exercise, per query, alongside the parity field.
    */
  private[graft] def withTaggedNearText(q: DataFrame,
      len: Int = 2): DataFrame = {
    val toks = split(lower(col("text")), " ")
    q.filter(size(toks) >= len + 1)
      .withColumn("text", concat_ws(" ",
        array(element_at(toks, 1),
          concat(
            when(pmod(col("query_id"), lit(2)) === 0, lit("title"))
              .otherwise(lit("body")),
            lit(":\""),
            array_join(slice(toks, 2, len), " "),
            lit("\"~"),
            pmod(col("query_id"), lit(3)).cast("string"))),
        slice(toks, lit(len + 2),
          greatest(size(toks) - (len + 1), lit(0)))))
  }

  /** near_qtag_match — SLOP-tagged fielded proximity in the query
    * STRING: `title:"a b"~w` matches ordered in-order runs of the
    * quoted terms with span ≤ len−1+w lying ENTIRELY within the
    * tagged field (every chained position classifies to the field —
    * simpler than the phrase anchor-window rule because proximity
    * has no contiguity to preserve across the seam), scored by the
    * Lucene-style sloppy frequency ([[nearRank]]'s µ-grade) over the
    * qualifying ends only. Slop 0 degenerates to exact in-field
    * adjacency — 10⁶ per occurrence, the phrase face's n_occ in
    * µ-units.
    */
  def nearQtagMatch(spark: SparkSession, sfDir: String): DataFrame = {
    val d = withDerivedTitle(load(spark, sfDir, "documents"))
    val q = withTaggedNearText(d.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"), col("text")), len = 2)
    nearQtagMatchOn(d, q, len = 2)
  }

  /** [[nearQtagMatch]] over explicit corpus + tagged-query relations —
    * the spec seam. */
  private[graft] def nearQtagMatchOn(d: DataFrame, queries: DataFrame,
      len: Int): DataFrame = {
    val parsed = parseTaggedPhrase(queries)
    val qp = parsed.filter(size(bm25Tokens(col("ptext"))) >= len)
      .select(col("query_id"), col("fld"), col("slop"),
        posexplode(phraseTerms(col("ptext"), len)).as(Seq("i", "term")))
    val (toks, bound) = titledStream(d)
    val posRows = qp.join(toks, Seq("term"))
      .join(bound, Seq("doc_id"))
      .filter(when(col("fld") === "title", col("pos") < col("ttl"))
        .otherwise(col("pos") >= col("ttl")))
      .select(col("query_id"), col("doc_id"), col("i"), col("pos"),
        col("slop"))
    canon(nearRank(posRows, len, sloppy = true, slopCapped = true))
  }

  /** near_qtag_index — the INCREMENTAL slop-tagged face over the SAME
    * shared v8 state: the field classifies each stored position
    * against the STORED boundary, the per-query slop caps the chained
    * ends, bit-identical to [[nearQtagMatch]]'s oracle.
    */
  def nearQtagIndex(spark: SparkSession, sfDir: String): DataFrame = {
    val (state, q) = ridxfStateAndQueries(spark, sfDir)
    canon(graft.streaming.IndexStream.queryNearTagged(spark, state,
      withTaggedNearText(q, len = 2), len = 2))
  }

  /** The slop-tagged proximity oracle chain: the titled position
    * space and boundary, fld/slop/slot terms derived ARITHMETICALLY
    * from raw text, the in-field position filter, the same chained
    * IGNORE NULLS merge as [[nearCtes]], and the per-query slop cap
    * on the qualifying ends. Emits `..nranked` with `sloppy_micro`.
    */
  private def nearQtagCtes(titledTrain: String, queries: String,
      len: Int): String = {
    // CTE names are prefixed n*/f* disjointly from bm25fQtagCtes so
    // the two chains COMPOSE under one WITH (the qlang oracle)
    val chain = (1 until len).map { j =>
      val carried = if (j == 1) "CASE WHEN i = 0 THEN pos END"
        else s"CASE WHEN i = ${j - 1} THEN g${j - 1} END"
      val from = if (j == 1) "nposr" else s"s${j - 1}"
      s"""s$j AS (
         |  SELECT *, last_value($carried IGNORE NULLS)
         |    OVER (PARTITION BY query_id, doc_id
         |      ORDER BY pos ASC, i DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |    AS g$j
         |  FROM $from
         |)""".stripMargin
    }.mkString(", ")
    val g = s"g${len - 1}"
    s"""fstream AS (
       |  SELECT doc_id,
       |    list_concat(string_split(lower(title), ' '),
       |      string_split(lower(text), ' ')) AS toks,
       |    len(string_split(lower(title), ' '))::BIGINT AS ttl
       |  FROM $titledTrain
       |), ptoks AS (
       |  SELECT doc_id, unnest(toks) AS term,
       |    unnest(generate_series(0, len(toks) - 1)) AS pos
       |  FROM fstream
       |), nqsel AS (
       |  SELECT doc_id AS query_id,
       |    CASE WHEN doc_id % 2 = 0 THEN 'title' ELSE 'body' END AS fld,
       |    CAST(doc_id % 3 AS BIGINT) AS slop,
       |    string_split(lower(text), ' ') AS qtoks
       |  FROM $queries
       |  WHERE len(string_split(lower(text), ' ')) >= ${len + 1}
       |), nqp AS (
       |  SELECT query_id, fld, slop,
       |    unnest(list_slice(qtoks, 2, ${len + 1})) AS term,
       |    unnest(generate_series(0, ${len - 1})) AS i
       |  FROM nqsel
       |), nposr AS (
       |  SELECT q.query_id, t.doc_id, q.i, t.pos, q.slop
       |  FROM nqp q JOIN ptoks t USING (term)
       |    JOIN fstream b ON t.doc_id = b.doc_id
       |  WHERE CASE WHEN q.fld = 'title' THEN t.pos < b.ttl
       |    ELSE t.pos >= b.ttl END
       |), $chain, nspan AS (
       |  SELECT query_id, doc_id,
       |    CAST(sum(1000000 // (1 + pos - $g - ${len - 1}))
       |      AS BIGINT) AS sloppy_micro
       |  FROM s${len - 1}
       |  WHERE i = ${len - 1} AND $g IS NOT NULL
       |    AND pos - $g - ${len - 1} <= slop
       |  GROUP BY 1, 2
       |), nranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY sloppy_micro DESC, doc_id ASC) AS rank
       |  FROM nspan
       |)""".stripMargin
  }

  val nearQtagSql: String =
    s"""WITH titled AS ${titledTrainSql("src0")},
       |${nearQtagCtes("titled",
        "(SELECT doc_id, text FROM documents WHERE source = 'src0')",
        len = 2)}
       |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, sloppy_micro
       |FROM nranked WHERE rank <= $bm25K
       |${canonOrderSql(Seq("query_id", "rank", "doc_id",
         "sloppy_micro"))}""".stripMargin

  // ---------------------------------------------------------------------
  // qlang — the COMPOSED query language: terms + boosts + field tags +
  // a slop-tagged quoted run in ONE string, fused (round 15)
  // ---------------------------------------------------------------------

  /** The deterministic composed-query rule the two qlang gate rows
    * query with, over raw tokens t₀ t₁ t₂ t₃ …:
    *
    *   `title:t₀ fld:"t₁ … t_len"~s  <t_{len+1} … by the %3 rule>`
    *
    * — tokens 1..len become the quoted run (fld = query parity,
    * slop = query_id % 3), every OTHER token keeps the round-14
    * per-token tagging rule AT ITS ORIGINAL POSITION (p % 3 = 0 →
    * `title:t`, 1 → `t^w`, else bare; position 0 is always p%3=0).
    * One string exercises the whole grammar: the per-token parser
    * must strip the run and read the tags, the quoted-run parser must
    * read the run, and the oracle derives both clause families
    * arithmetically from the raw text.
    */
  private[graft] def withQlangText(q: DataFrame,
      len: Int = 2): DataFrame = {
    val toks = split(lower(col("text")), " ")
    val fldS = when(pmod(col("query_id"), lit(2)) === 0, lit("title"))
      .otherwise(lit("body"))
    val restArr = expr(
      s"transform(slice(split(lower(text), ' '), ${len + 2}, " +
        s"greatest(size(split(lower(text), ' ')) - ${len + 1}, 0)), " +
        s"(t, i) -> CASE WHEN (i + ${len + 1}) % 3 = 0 " +
        "THEN concat('title:', t) " +
        s"WHEN (i + ${len + 1}) % 3 = 1 THEN concat(t, '^2') " +
        "ELSE t END)")
    q.filter(size(toks) >= len + 1)
      .withColumn("text", concat_ws(" ",
        array(
          concat(lit("title:"), element_at(toks, 1)),
          concat(fldS, lit(":\""),
            array_join(slice(toks, 2, len), " "),
            lit("\"~"), pmod(col("query_id"), lit(3)).cast("string"))),
        restArr))
  }

  /** qlang_topk — the composed query language on the hard gate: ONE
    * tagged string per query parses into BOTH clause families — the
    * field-tagged/boosted term clauses score through the
    * field-local-df BM25F leg ([[bm25fScoredOn]] over
    * [[parseFieldedQuery]], which strips the run), the quoted run
    * scores through the slop-capped fielded proximity leg
    * ([[nearQtagMatchOn]]) — and the two legs fuse under the shared
    * integer RRF tail ([[rrfFuseLegs]]), the same arity-generic
    * fusion every hybrid face uses. This is the full-query-language
    * row: a user types Lucene-style syntax, the engine answers with
    * ranked fusion.
    */
  def qlangTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val d = withDerivedTitle(load(spark, sfDir, "documents"))
    val q = withQlangText(d.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"), col("text")))
    qlangOn(d, q)
  }

  /** [[qlangTopk]] over explicit corpus + composed-query relations —
    * the spec seam. */
  private[graft] def qlangOn(d: DataFrame, q: DataFrame): DataFrame =
    canon(rrfFuseLegs(Seq(
      bm25fScoredOn(d, parseFieldedQuery(q), fieldLocalDf = true)
        .select(col("query_id"), col("doc_id"),
          col("rank").as("rank_sparse")),
      nearQtagMatchOn(d, q, len = 2)
        .select(col("query_id"), col("doc_id"),
          col("rank").as("rank_prox")))))

  /** qlang_index — the INCREMENTAL composed face over the SAME shared
    * v8 state: both legs (field-local-df BM25F, slop-capped fielded
    * proximity) parse the same strings through the same shared
    * parsers and read the same stored state, fused identically.
    */
  def qlangIndex(spark: SparkSession, sfDir: String): DataFrame = {
    val (state, q) = ridxfStateAndQueries(spark, sfDir)
    val tq = withQlangText(q)
    // ONE shared state fetch for both legs (round 15 optimization —
    // the qlang twin of hybrid_prox_topk's r12 shared fetch): dfs,
    // postings, and (dl, ttl) each read once, the scoring tails are
    // the same shared definitions the standalone faces run
    val (sparse, prox) = graft.streaming.IndexStream.queryLangParts(
      spark, state, tq, len = 2, fieldLocalDf = true)
    canon(rrfFuseLegs(Seq(
      sparse.select(col("query_id"), col("doc_id"),
        col("rank").as("rank_sparse")),
      prox.select(col("query_id"), col("doc_id"),
        col("rank").as("rank_prox")))))
  }

  /** The composed-query oracle: BOTH leg chains under one WITH (their
    * CTE names are disjoint by construction), each deriving its
    * clauses arithmetically from the raw text — the term leg from
    * token positions OUTSIDE the run (the `excludeRun` window), the
    * proximity leg from positions 1..len — then the integer RRF
    * fusion. The gate filter (≥ len+1 tokens, the composed rule's
    * minimum) applies to BOTH legs through the shared queries
    * relation.
    */
  // lazy: rrfConst is declared later in this object body, and a
  // strict val here would interpolate its pre-init 0 (object vals
  // initialize in declaration order)
  lazy val qlangSql: String = {
    val qrel = "(SELECT doc_id, text FROM documents " +
      "WHERE source = 'src0' " +
      "AND len(string_split(lower(text), ' ')) >= 3)"
    s"""WITH titled AS ${titledTrainSql("src0")},
       |${bm25fQtagCtes("titled", qrel, fieldLocalDf = true,
        excludeRun = Some(2))},
       |${nearQtagCtes("titled", qrel, len = 2)},
       |sparse AS (
       |  SELECT query_id, doc_id, rank AS rank_sparse
       |  FROM franked WHERE rank <= $bm25K
       |), prox AS (
       |  SELECT query_id, doc_id, rank AS rank_prox
       |  FROM nranked WHERE rank <= $bm25K
       |), qfused AS (
       |  SELECT coalesce(s.query_id, p.query_id) AS query_id,
       |    coalesce(s.doc_id, p.doc_id) AS doc_id,
       |    CAST(coalesce(1000000 // ($rrfConst + s.rank_sparse), 0)
       |       + coalesce(1000000 // ($rrfConst + p.rank_prox), 0)
       |      AS BIGINT) AS rrf_micro,
       |    CAST((s.rank_sparse IS NOT NULL)::INT
       |       + (p.rank_prox IS NOT NULL)::INT AS INT) AS n_legs
       |  FROM sparse s FULL OUTER JOIN prox p
       |    ON s.query_id = p.query_id AND s.doc_id = p.doc_id
       |), qranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY rrf_micro DESC, doc_id ASC) AS rank
       |  FROM qfused)
       |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, rrf_micro,
       |  n_legs
       |FROM qranked WHERE rank <= $bm25K
       |${canonOrderSql(Seq("query_id", "rank", "doc_id", "rrf_micro",
         "n_legs"))}""".stripMargin
  }

  /** The ordered-proximity core shared by the batch and index faces:
    * given the slot-position rows of [[phrasePosRowsOn]], the MINIMAL
    * ordered window span per (query, doc) — min over strictly
    * increasing position chains p₀ < p₁ < … < p_{len−1} (one position
    * per slot, in slot order) of p_{len−1} − p₀; span len−1 ⟺ exact
    * adjacency, so NEAR-with-slop-w is the consumer filter
    * span ≤ len−1+w. Computed as a LINEAR merge, never a positions ×
    * positions join (round 11 — length-generic): each document's slot
    * rows sort ONCE by (pos, i desc), and len−1 chained
    * last-ignore-nulls passes over a running frame that stops one row
    * short of the current one carry the chain — g₁ at a slot-1 row is
    * the last slot-0 position strictly before it, g_j the start of
    * the LATEST-STARTING ordered chain ending at slot j there (g_{j−1}
    * is non-decreasing along the order, so "last" = "max start", and
    * the minimal span per end position follows). The i-desc tiebreak
    * keeps same-position rows of earlier slots OUT of the frame, so a
    * repeated-term phrase still needs len distinct positions.
    *
    * Scoring faces (one shared core, two grades):
    *  - `sloppy = false`: min_span asc (tighter is better), doc_id
    *    asc — the NEAR ranking;
    *  - `sloppy = true` (round 11): Lucene-style sloppy frequency —
    *    each end position contributes ⌊10⁶/(1 + slop)⌋ with
    *    slop = span − (len−1) ≥ 0 (exact adjacency = 10⁶ per
    *    occurrence), summed per document in exact integer µ-units —
    *    the fusion-ready grade (same scale as rrf_micro/score_micro),
    *    ranked desc, doc_id asc.
    */
  private[graft] def nearRank(posRows: DataFrame,
      len: Int = phraseLen, sloppy: Boolean = false,
      slopCapped: Boolean = false): DataFrame = {
    require(len >= 2, s"NEAR needs at least 2 slots, got $len")
    val wseq = Window.partitionBy(col("query_id"), col("doc_id"))
      .orderBy(col("pos").asc, col("i").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val chained = (1 until len).foldLeft(posRows) { (df, j) =>
      val carried =
        if (j == 1) when(col("i") === 0, col("pos"))
        else when(col("i") === j - 1, col(s"g${j - 1}"))
      df.withColumn(s"g$j", last(carried, ignoreNulls = true).over(wseq))
    }
    val g = col(s"g${len - 1}")
    val ends0 = chained.filter(col("i") === len - 1 && g.isNotNull)
      .withColumn("span", (col("pos") - g).cast("bigint"))
    // the NEAR-with-slop-w consumer filter of the scaladoc, per ROW
    // (round 15 — the tagged ~w grammar carries a PER-QUERY cap):
    // an end whose minimal span exceeds len−1+slop has no qualifying
    // chain (the carried chain is the latest-starting, i.e. minimal
    // span, at that end — any other chain there is wider)
    val ends =
      if (slopCapped)
        ends0.filter(col("span") - (len - 1) <= col("slop"))
      else ends0
    val spans =
      if (!sloppy)
        ends.groupBy(col("query_id"), col("doc_id"))
          .agg(min(col("span")).as("min_span"))
      else
        ends.withColumn("contrib",
            expr(s"cast(1000000 div (1 + span - ${len - 1}) as bigint)"))
          .groupBy(col("query_id"), col("doc_id"))
          .agg(sum(col("contrib")).as("sloppy_micro"))
    val w =
      if (!sloppy) Window.partitionBy(col("query_id"))
        .orderBy(col("min_span").asc, col("doc_id").asc)
      else Window.partitionBy(col("query_id"))
        .orderBy(col("sloppy_micro").desc, col("doc_id").asc)
    spans.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= bm25K)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col(if (sloppy) "sloppy_micro" else "min_span"))
  }

  /** Ordered proximity retrieval (NEAR): each benchmark document
    * queries the train corpus for documents containing its leading
    * phrase's terms IN ORDER, ranked by how tightly they co-occur
    * (the minimal ordered window span — 1 = exact adjacency). The
    * relevance-graded relaxation of [[phraseMatch]]: a phrase miss
    * with the words three apart still surfaces, ranked behind every
    * tighter occurrence — the positional-index query shape behind
    * every NEAR/proximity operator.
    */
  def nearMatch(spark: SparkSession, sfDir: String): DataFrame =
    nearMatchOn(load(spark, sfDir, "documents"))

  /** [[nearMatch]] over an explicit documents relation — `len` and
    * `sloppy` as in [[nearRank]] (round 11: length-generic + the
    * sloppy-frequency grade).
    */
  def nearMatchOn(d: DataFrame, len: Int = phraseLen,
      sloppy: Boolean = false): DataFrame =
    canon(nearRank(phrasePosRowsOn(d, len), len, sloppy))

  /** near3_match — ordered proximity at phrase length 3: the minimal
    * strictly-increasing window containing the query's leading TRIGRAM
    * terms in order (round 11 — the length-generic linear merge; the
    * bigram rows stay as the fixed oracle convention).
    */
  def near3Match(spark: SparkSession, sfDir: String): DataFrame =
    nearMatchOn(load(spark, sfDir, "documents"), len = 3)

  /** near_sloppy — Lucene-style sloppy-frequency scoring over the
    * bigram proximity rows: Σ ⌊10⁶/(1+slop)⌋ per document in exact
    * µ-units (adjacency = 10⁶ per occurrence), the fusion-ready
    * relevance grade of NEAR (same integer scale as rrf_micro).
    */
  def nearSloppy(spark: SparkSession, sfDir: String): DataFrame =
    nearMatchOn(load(spark, sfDir, "documents"), sloppy = true)

  /** UNORDERED proximity (round 11 — NEAR/w without the order
    * constraint, the other half of every proximity operator family):
    * the minimal window containing ALL the query phrase's terms in ANY
    * order, per (query, doc). Same span scale as the ordered face
    * (len − 1 = the terms are mutually adjacent), same two ranking
    * grades (min_span asc / sloppy Σ ⌊10⁶/(1+slop)⌋ with
    * slop = span − (len−1)).
    *
    * Linear, like the ordered merge — never positions^len: each
    * document's slot rows sort once by position, and one running
    * per-slot max frame (UNBOUNDED PRECEDING .. CURRENT ROW) carries
    * the LAST position of every slot; a row where all `len` slots have
    * been seen closes the minimal window ending there —
    * span = pos − least(lasts) (the classic minimal-cover sweep). The
    * face requires the phrase's `len` terms to be DISTINCT (the
    * unordered window of a duplicated term needs multiplicity
    * counting, which this face deliberately does not define — the
    * query filter is part of the contract and mirrored in the oracle
    * SQL), so each document position matches exactly one slot and the
    * per-slot lasts are distinct positions: span ≥ len − 1 always
    * holds and the sloppy divisor stays ≥ 1.
    */
  /** The minimal-cover ends — ONE definition shared by unordered NEAR
    * and snippet extraction (a snippet IS the min-span window, so the
    * two faces must sweep identically): one row per position where
    * every slot has been seen, carrying the window start
    * (least of the per-slot running lasts) and span = pos − start.
    */
  private def coverEndsOn(posRows: DataFrame, len: Int): DataFrame = {
    require(len >= 2, s"unordered cover needs at least 2 slots, got $len")
    val w = Window.partitionBy(col("query_id"), col("doc_id"))
      .orderBy(col("pos").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lasts = (0 until len).map(k =>
      max(when(col("i") === k, col("pos"))).over(w).as(s"l$k"))
    val withL = posRows.select(
      Seq(col("query_id"), col("doc_id"), col("pos")) ++ lasts: _*)
    val allSeen = (0 until len).map(k => col(s"l$k").isNotNull)
      .reduce(_ && _)
    withL.filter(allSeen)
      .withColumn("snip_start",
        least((0 until len).map(k => col(s"l$k")): _*))
      .withColumn("span",
        (col("pos") - col("snip_start")).cast("bigint"))
      .select(col("query_id"), col("doc_id"), col("pos"),
        col("snip_start"), col("span"))
  }

  private[graft] def nearUnorderedRank(posRows: DataFrame,
      len: Int = phraseLen, sloppy: Boolean = false): DataFrame = {
    val ends = coverEndsOn(posRows, len)
    val spans =
      if (!sloppy)
        ends.groupBy(col("query_id"), col("doc_id"))
          .agg(min(col("span")).as("min_span"))
      else
        ends.withColumn("contrib",
            expr(s"cast(1000000 div (1 + span - ${len - 1}) as bigint)"))
          .groupBy(col("query_id"), col("doc_id"))
          .agg(sum(col("contrib")).as("sloppy_micro"))
    val wr =
      if (!sloppy) Window.partitionBy(col("query_id"))
        .orderBy(col("min_span").asc, col("doc_id").asc)
      else Window.partitionBy(col("query_id"))
        .orderBy(col("sloppy_micro").desc, col("doc_id").asc)
    spans.withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= bm25K)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col(if (sloppy) "sloppy_micro" else "min_span"))
  }

  /** [[nearUnorderedRank]] over an explicit documents relation — the
    * batch face; queries whose leading phrase holds duplicate terms
    * are excluded by contract (see the rank core).
    */
  def nearUnorderedOn(d: DataFrame, len: Int = phraseLen,
      sloppy: Boolean = false): DataFrame =
    canon(nearUnorderedRank(
      phrasePosRowsOn(d, len, distinctTerms = true), len, sloppy))

  /** near_unordered — minimal any-order window of the query's leading
    * bigram terms over the train corpus, ranked tightest-first.
    */
  def nearUnordered(spark: SparkSession, sfDir: String): DataFrame =
    nearUnorderedOn(load(spark, sfDir, "documents"))

  /** near_unordered_sloppy — the sloppy-frequency grade of unordered
    * proximity (Σ ⌊10⁶/(1+slop)⌋ over minimal covers, slop = span −
    * (len−1)) — puts [[nearUnorderedCtes]]'s sloppy branch on the
    * driver gate so both engines' division/arithmetic parity is
    * oracle-checked, not just spec-pinned.
    */
  def nearUnorderedSloppy(spark: SparkSession, sfDir: String): DataFrame =
    nearUnorderedOn(load(spark, sfDir, "documents"), sloppy = true)

  val nearUnorderedSloppySql: String =
    s"""WITH ${nearUnorderedCtes(
        "(SELECT doc_id, text FROM documents WHERE source <> 'src0')",
        "(SELECT doc_id, text FROM documents WHERE source = 'src0')",
        sloppy = true)}
       |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, sloppy_micro
       |FROM uranked WHERE rank <= $bm25K
       |${canonOrderSql(Seq("query_id", "rank", "doc_id",
         "sloppy_micro"))}""".stripMargin

  /** search_snippets — SNIPPET EXTRACTION, the result-shaping step
    * between ranked retrieval and a human (or an LLM context window):
    * for each query and each of its top-[[bm25K]] proximity-ranked
    * documents, the BEST WINDOW — the minimal any-order cover of the
    * query's phrase terms (ties broken to the EARLIEST window) — is
    * located and the covered token run is emitted as text. Runs on the
    * same linear per-slot sweep as [[nearUnorderedRank]]; the argmin
    * is one row_number over (span asc, start asc) per (query, doc),
    * then one join back to the document text for the token slice —
    * O(ranked docs), never a re-scan. Both engines slice the SAME
    * lowered-tokenization (1-based slice of span+1 tokens), so the
    * emitted snippet strings are byte-identical.
    */
  def searchSnippets(spark: SparkSession, sfDir: String): DataFrame =
    searchSnippetsOn(load(spark, sfDir, "documents"))

  def searchSnippetsOn(d: DataFrame, len: Int = phraseLen): DataFrame = {
    val ends = coverEndsOn(
      phrasePosRowsOn(d, len, distinctTerms = true), len)
    val wb = Window.partitionBy(col("query_id"), col("doc_id"))
      .orderBy(col("span").asc, col("snip_start").asc)
    val best = ends.withColumn("rn", row_number().over(wb))
      .filter(col("rn") === 1)
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(col("span").asc, col("doc_id").asc)
    val ranked = best.withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= bm25K)
    val train = d.filter(col("source") =!= "src0")
      .select(col("doc_id"), bm25Tokens(col("text")).as("toks"))
    val out = ranked.join(train, Seq("doc_id"))
      .withColumn("snippet", array_join(
        slice(col("toks"), col("snip_start") + lit(1),
          col("span") + lit(1)), " "))
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("snip_start").cast("bigint").as("snip_start"),
        col("snippet"))
    canon(out)
  }

  val searchSnippetsSql: String = {
    val len = phraseLen
    val (lasts, nn, leastE) = coverSqlParts(len)
    s"""WITH ${posCtes(
        "(SELECT doc_id, text FROM documents WHERE source <> 'src0')",
        "(SELECT doc_id, text FROM documents WHERE source = 'src0')",
        len, distinctTerms = true)}, uposr AS (
       |  SELECT q.query_id, t.doc_id, q.i, t.pos
       |  FROM qp q JOIN ptoks t USING (term)
       |), ulast AS (
       |  SELECT query_id, doc_id, pos,
       |$lasts
       |  FROM uposr
       |  WINDOW uw AS (PARTITION BY query_id, doc_id ORDER BY pos ASC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |), uend AS (
       |  SELECT query_id, doc_id, $leastE AS snip_start,
       |    CAST(pos - $leastE AS BIGINT) AS span
       |  FROM ulast WHERE $nn
       |), ubest AS (
       |  SELECT query_id, doc_id, snip_start, span FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id, doc_id
       |      ORDER BY span ASC, snip_start ASC) AS rn FROM uend)
       |  WHERE rn = 1
       |), uranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY span ASC, doc_id ASC) AS rank
       |  FROM ubest
       |)
       |SELECT query_id, rank, doc_id, snip_start, snippet FROM (
       |  SELECT r.query_id, CAST(r.rank AS INT) AS rank, r.doc_id,
       |    r.snip_start,
       |    array_to_string(list_slice(string_split(lower(d.text), ' '),
       |      r.snip_start + 1, r.snip_start + r.span + 1), ' ') AS snippet
       |  FROM uranked r JOIN (SELECT doc_id, text FROM documents
       |    WHERE source <> 'src0') d ON r.doc_id = d.doc_id
       |  WHERE r.rank <= $bm25K)
       |${canonOrderSql(Seq("query_id", "rank", "doc_id", "snip_start",
         "snippet"))}""".stripMargin
  }

  /** The phrase oracle CTE chain over pluggable (doc_id, text)
    * relations — same contract as [[bm25Ctes]]: ONE definition feeds
    * phrase_match and phrase_index_match so the semantics cannot
    * drift between oracle rows. DuckDB zip-unnests the term list with
    * generate_series for positions. Emits `ptoks..pranked`; the
    * caller selects from `pranked`.
    */
  /** The positional-token + query-slot CTEs (`ptoks`, `qp`) shared by
    * the phrase and NEAR oracle chains.
    */
  private def posCtes(train: String, queries: String,
      len: Int = phraseLen, distinctTerms: Boolean = false): String = {
    val dt = if (!distinctTerms) ""
      else s"\n    AND len(list_distinct(list_slice(" +
        s"string_split(lower(text), ' '), 1, $len))) = $len"
    s"""ptoks AS (
       |  SELECT doc_id,
       |    unnest(string_split(lower(text), ' ')) AS term,
       |    unnest(generate_series(0,
       |      len(string_split(lower(text), ' ')) - 1)) AS pos
       |  FROM $train
       |), qp AS (
       |  SELECT doc_id AS query_id,
       |    unnest(list_slice(string_split(lower(text), ' '), 1,
       |      $len)) AS term,
       |    unnest(generate_series(0, $len - 1)) AS i
       |  FROM $queries
       |  WHERE len(string_split(lower(text), ' ')) >= $len$dt
       |)""".stripMargin
  }

  private[graft] def phraseCtes(train: String, queries: String,
      len: Int = phraseLen): String =
    s"""${posCtes(train, queries, len)}, panchor AS (
       |  SELECT q.query_id, t.doc_id, t.pos - q.i AS anchor
       |  FROM qp q JOIN ptoks t USING (term)
       |), pocc AS (
       |  SELECT query_id, doc_id, count(*)::BIGINT AS n_occ FROM (
       |    SELECT query_id, doc_id, anchor FROM panchor
       |    GROUP BY 1, 2, 3 HAVING count(*) = $len)
       |  GROUP BY 1, 2
       |), pranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY n_occ DESC, doc_id ASC) AS rank
       |  FROM pocc
       |)""".stripMargin

  /** The NEAR oracle chain — the same length-generic window-merge as
    * [[nearRank]]: len−1 chained DuckDB IGNORE NULLS last_value passes
    * over the (pos asc, i desc) order with a 1-preceding frame, then
    * either the min-span or the sloppy-frequency aggregation. Emits
    * `..nranked` with a `min_span` or `sloppy_micro` value column.
    */
  private[graft] def nearCtes(train: String, queries: String,
      len: Int = phraseLen, sloppy: Boolean = false): String = {
    val chain = (1 until len).map { j =>
      val carried = if (j == 1) "CASE WHEN i = 0 THEN pos END"
        else s"CASE WHEN i = ${j - 1} THEN g${j - 1} END"
      val from = if (j == 1) "nposr" else s"s${j - 1}"
      s"""s$j AS (
         |  SELECT *, last_value($carried IGNORE NULLS)
         |    OVER (PARTITION BY query_id, doc_id
         |      ORDER BY pos ASC, i DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |    AS g$j
         |  FROM $from
         |)""".stripMargin
    }.mkString(", ")
    val g = s"g${len - 1}"
    val agg =
      if (!sloppy) s"CAST(min(pos - $g) AS BIGINT) AS min_span"
      else s"CAST(sum(1000000 // (1 + pos - $g - ${len - 1})) " +
        "AS BIGINT) AS sloppy_micro"
    val order = if (!sloppy) "min_span ASC" else "sloppy_micro DESC"
    s"""${posCtes(train, queries, len)}, nposr AS (
       |  SELECT q.query_id, t.doc_id, q.i, t.pos
       |  FROM qp q JOIN ptoks t USING (term)
       |), $chain, nspan AS (
       |  SELECT query_id, doc_id, $agg
       |  FROM s${len - 1}
       |  WHERE i = ${len - 1} AND $g IS NOT NULL
       |  GROUP BY 1, 2
       |), nranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY $order, doc_id ASC) AS rank
       |  FROM nspan
       |)""".stripMargin
  }

  /** The UNORDERED proximity oracle chain — the same minimal-cover
    * sweep as [[nearUnorderedRank]]: one running per-slot max window
    * (aggregate window functions skip NULLs in both engines), a row
    * where every slot has been seen closes span = pos − least(lasts).
    * Emits `..uranked` with a `min_span` or `sloppy_micro` column.
    */
  /** The SQL fragments of the minimal-cover sweep (per-slot running
    * maxes, the all-seen predicate, the least-of-lasts start) — ONE
    * definition shared by the unordered-NEAR and snippet oracles.
    */
  private def coverSqlParts(len: Int): (String, String, String) = {
    val lasts = (0 until len).map(k =>
      s"    max(CASE WHEN i = $k THEN pos END) OVER uw AS l$k")
      .mkString(",\n")
    val nn = (0 until len).map(k => s"l$k IS NOT NULL").mkString(" AND ")
    val leastE = s"least(${(0 until len).map(k => s"l$k").mkString(", ")})"
    (lasts, nn, leastE)
  }

  private[graft] def nearUnorderedCtes(train: String, queries: String,
      len: Int = phraseLen, sloppy: Boolean = false): String = {
    val (lasts, nn, leastE) = coverSqlParts(len)
    val agg =
      if (!sloppy) s"CAST(min(pos - $leastE) AS BIGINT) AS min_span"
      else s"CAST(sum(1000000 // (1 + pos - $leastE - ${len - 1})) " +
        "AS BIGINT) AS sloppy_micro"
    val order = if (!sloppy) "min_span ASC" else "sloppy_micro DESC"
    s"""${posCtes(train, queries, len, distinctTerms = true)}, uposr AS (
       |  SELECT q.query_id, t.doc_id, q.i, t.pos
       |  FROM qp q JOIN ptoks t USING (term)
       |), ulast AS (
       |  SELECT query_id, doc_id, pos,
       |$lasts
       |  FROM uposr
       |  WINDOW uw AS (PARTITION BY query_id, doc_id ORDER BY pos ASC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |), uspan AS (
       |  SELECT query_id, doc_id, $agg
       |  FROM ulast WHERE $nn
       |  GROUP BY 1, 2
       |), uranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY $order, doc_id ASC) AS rank
       |  FROM uspan
       |)""".stripMargin
  }

  val nearUnorderedSql: String =
    s"""WITH ${nearUnorderedCtes(
        "(SELECT doc_id, text FROM documents WHERE source <> 'src0')",
        "(SELECT doc_id, text FROM documents WHERE source = 'src0')")}
       |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, min_span
       |FROM uranked WHERE rank <= $bm25K
       |${canonOrderSql(Seq("query_id", "rank", "doc_id", "min_span"))}""".stripMargin

  val nearMatchSql: String =
    s"""WITH ${nearCtes(
        "(SELECT doc_id, text FROM documents WHERE source <> 'src0')",
        "(SELECT doc_id, text FROM documents WHERE source = 'src0')")}
       |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, min_span
       |FROM nranked WHERE rank <= $bm25K
       |${canonOrderSql(Seq("query_id", "rank", "doc_id", "min_span"))}""".stripMargin

  val near3MatchSql: String =
    s"""WITH ${nearCtes(
        "(SELECT doc_id, text FROM documents WHERE source <> 'src0')",
        "(SELECT doc_id, text FROM documents WHERE source = 'src0')",
        len = 3)}
       |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, min_span
       |FROM nranked WHERE rank <= $bm25K
       |${canonOrderSql(Seq("query_id", "rank", "doc_id", "min_span"))}""".stripMargin

  val nearSloppySql: String =
    s"""WITH ${nearCtes(
        "(SELECT doc_id, text FROM documents WHERE source <> 'src0')",
        "(SELECT doc_id, text FROM documents WHERE source = 'src0')",
        sloppy = true)}
       |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, sloppy_micro
       |FROM nranked WHERE rank <= $bm25K
       |${canonOrderSql(Seq("query_id", "rank", "doc_id",
         "sloppy_micro"))}""".stripMargin

  val phraseMatchSql: String =
    s"""WITH ${phraseCtes(
        "(SELECT doc_id, text FROM documents WHERE source <> 'src0')",
        "(SELECT doc_id, text FROM documents WHERE source = 'src0')")}
       |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, n_occ
       |FROM pranked WHERE rank <= $bm25K
       |${canonOrderSql(Seq("query_id", "rank", "doc_id", "n_occ"))}""".stripMargin

  /** phrase_index_match — the INCREMENTAL positional face,
    * driver-checked against the same oracle as phrase_match. Reuses
    * the SAME LSM index state as bm25_index_topk (one `ridx` build per
    * process — the positional columns ride the v3 postings layout, and
    * parquet column pruning keeps the BM25 face's posting reads
    * position-free), so the oracle row costs no extra state build.
    */
  /** The process-shared 3-generation LSM index state over the train
    * corpus (built once — bm25_index_topk, phrase_index_match, and
    * near_index_match all query the same state) and the src0 queries.
    */
  /** Demo-state roots are CONTENT-KEYED and shared across processes
    * (round 11 — the r10 driver bench rebuilt all five roots in every
    * JVM, ~730 s of its 1359 s wall): the states are pure functions of
    * (source bytes, layout version, build recipe), all folded into the
    * [[TmpData.sharedState]] key, built once under a pid staging dir
    * and published by atomic rename. Each recipe string pins ITS
    * builder's shape — editing a build must edit its recipe.
    */
  private val ridxRecipe = "ridx: 3 folds pmod(doc_id,3)=i over train"

  private def ridxStateAndQueries(spark: SparkSession,
      sfDir: String): (String, DataFrame) = {
    val d = load(spark, sfDir, "documents")
    val n = docCount(spark, sfDir)
    val lay = graft.streaming.IndexStream.adaptiveLayoutVersion(n)
    val state = TmpData.sharedState("ridx", sfDir,
        TmpData.stampOf(lay, ridxRecipe), Seq(lay)) { staging =>
      graft.streaming.IndexStream.initState(spark, staging, n)
      val train = d.filter(col("source") =!= "src0")
        .select(col("doc_id"), col("text"), col("source"))
      (0 until 3).foreach { i =>
        graft.streaming.IndexStream.applyBatch(spark, staging,
          train.filter(pmod(col("doc_id"), lit(3)) === i), i.toLong)
      }
    }
    (state, d.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"), col("text")))
  }

  /** The TITLED twin of [[ridxStateAndQueries]] (round 13, layout v7):
    * the derived-title corpus folds in three generations with its
    * `title` column intact, so the state stores each doc's real field
    * boundary and bm25f_titled_index exercises the fielded fold end
    * to end.
    */
  private val ridxfRecipe =
    "ridxf: 3 folds pmod(doc_id,3)=i over titled train (tail 1+id%5)"

  private def ridxfStateAndQueries(spark: SparkSession,
      sfDir: String): (String, DataFrame) = {
    val d = withDerivedTitle(load(spark, sfDir, "documents"))
    val n = docCount(spark, sfDir)
    val lay = graft.streaming.IndexStream.adaptiveLayoutVersion(n)
    val state = TmpData.sharedState("ridxf", sfDir,
        TmpData.stampOf(lay, ridxfRecipe), Seq(lay)) { staging =>
      graft.streaming.IndexStream.initState(spark, staging, n)
      val train = d.filter(col("source") =!= "src0")
        .select(col("doc_id"), col("title"), col("text"))
      (0 until 3).foreach { i =>
        graft.streaming.IndexStream.applyBatch(spark, staging,
          train.filter(pmod(col("doc_id"), lit(3)) === i), i.toLong)
      }
    }
    (state, d.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"), col("text")))
  }

  def phraseIndexMatch(spark: SparkSession, sfDir: String): DataFrame = {
    val (state, q) = ridxStateAndQueries(spark, sfDir)
    canon(graft.streaming.IndexStream.queryPhrase(spark, state, q))
  }

  /** phrase3_match / phrase3_index_match — ARBITRARY-LENGTH phrases
    * (round 10): the anchor core is length-generic (a document matches
    * at an anchor iff all `len` slots produced it), so phrase length
    * is an API parameter on both faces; these rows pin len=3 — each
    * query's leading TRIGRAM as a consecutive sequence — against the
    * same parametrized oracle CTEs. The index face reuses the shared
    * ridx state (the positions arrays already carry everything any
    * length needs; no extra state build).
    */
  def phrase3Match(spark: SparkSession, sfDir: String): DataFrame =
    phraseMatchOn(load(spark, sfDir, "documents"), len = 3)

  def phrase3IndexMatch(spark: SparkSession, sfDir: String): DataFrame = {
    val (state, q) = ridxStateAndQueries(spark, sfDir)
    canon(graft.streaming.IndexStream.queryPhrase(spark, state, q,
      len = 3))
  }

  val phrase3MatchSql: String =
    s"""WITH ${phraseCtes(
        "(SELECT doc_id, text FROM documents WHERE source <> 'src0')",
        "(SELECT doc_id, text FROM documents WHERE source = 'src0')",
        len = 3)}
       |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, n_occ
       |FROM pranked WHERE rank <= $bm25K
       |${canonOrderSql(Seq("query_id", "rank", "doc_id", "n_occ"))}""".stripMargin

  /** near_index_match — the incremental NEAR face over the same LSM
    * state as bm25_index_topk / phrase_index_match, driver-checked
    * against the same oracle as near_match.
    */
  def nearIndexMatch(spark: SparkSession, sfDir: String): DataFrame = {
    val (state, q) = ridxStateAndQueries(spark, sfDir)
    canon(graft.streaming.IndexStream.queryNear(spark, state, q))
  }

  /** near3_index_match / near_sloppy_index — the incremental faces of
    * the length-generic and sloppy-scored NEAR grades (round 11), over
    * the same shared LSM state, checked against the same parametrized
    * oracle CTEs as their batch twins.
    */
  def near3IndexMatch(spark: SparkSession, sfDir: String): DataFrame = {
    val (state, q) = ridxStateAndQueries(spark, sfDir)
    canon(graft.streaming.IndexStream.queryNear(spark, state, q, len = 3))
  }

  def nearSloppyIndex(spark: SparkSession, sfDir: String): DataFrame = {
    val (state, q) = ridxStateAndQueries(spark, sfDir)
    canon(graft.streaming.IndexStream.queryNear(spark, state, q,
      sloppy = true))
  }

  /** near_unordered_index — the incremental unordered-proximity face
    * over the same shared LSM state, checked against the same
    * minimal-cover oracle as near_unordered.
    */
  def nearUnorderedIndex(spark: SparkSession, sfDir: String): DataFrame = {
    val (state, q) = ridxStateAndQueries(spark, sfDir)
    canon(graft.streaming.IndexStream.queryNearUnordered(spark, state, q))
  }

  /** The train-doc predicate of the delete faces' oracle: every 7th
    * doc (pmod 2) is deleted AFTER being indexed. Exact-integer so
    * both engines and the SQL agree.
    */
  private val deleteSlice = "doc_id % 7 = 2"

  /** The process-shared DELETED index state: the full train corpus
    * folds in (two generations), then the [[deleteSlice]] docs are
    * DELETED via IndexStream.deleteDocs — tombstones + negative df
    * rows + a negative count marker, no index rewrite. The query rows
    * over this state are checked against oracles over the SURVIVING
    * corpus only, so the driver gate proves the delete path's exact
    * semantics end-to-end: idf/avgdl from the negative marker,
    * selection from the df sums with the negative rows, candidate
    * exclusion via the tombstone anti-join.
    */
  private val ridxDelRecipe =
    s"ridxdel: 2 folds pmod(doc_id,2)=i; delete [$deleteSlice] id 0"

  private def ridxDelStateAndQueries(spark: SparkSession,
      sfDir: String): (String, DataFrame) = {
    val d = load(spark, sfDir, "documents")
    val n = docCount(spark, sfDir)
    val lay = graft.streaming.IndexStream.adaptiveLayoutVersion(n)
    val state = TmpData.sharedState("ridxdel", sfDir,
        TmpData.stampOf(lay, ridxDelRecipe), Seq(lay)) { staging =>
      graft.streaming.IndexStream.initState(spark, staging, n)
      val train = d.filter(col("source") =!= "src0")
        .select(col("doc_id"), col("text"), col("source"))
      (0 until 2).foreach { i =>
        graft.streaming.IndexStream.applyBatch(spark, staging,
          train.filter(pmod(col("doc_id"), lit(2)) === i), i.toLong)
      }
      graft.streaming.IndexStream.deleteDocs(spark, staging,
        train.filter(expr(deleteSlice)).select(col("doc_id")),
        deleteId = 0L)
    }
    (state, d.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"), col("text")))
  }

  /** bm25_asof — SNAPSHOT / as-of retrieval (round 10): the shared
    * deleted-index state is pinned at ledger seq 1 (after the FIRST
    * fold only — before the second fold and the delete), and ranked
    * retrieval over the snapshot is checked against BM25 over exactly
    * that half of the corpus. Proves the reproducibility pin
    * end-to-end: the snapshot is a self-contained state root whose
    * answers are the index as it stood at that operation — later folds
    * and deletes invisible.
    */
  def bm25Asof(spark: SparkSession, sfDir: String): DataFrame = {
    val (state, q) = ridxDelStateAndQueries(spark, sfDir)
    val lay = graft.streaming.IndexStream.adaptiveLayoutVersion(
      docCount(spark, sfDir))
    val snap = TmpData.sharedState("ridxsnap", sfDir,
        TmpData.stampOf(lay, ridxDelRecipe, "snap: asOfSeq=1"),
        Seq(lay)) { staging =>
      // snapshotTo requires a non-existent destination; sharedState's
      // staging dir is created by the build itself
      graft.streaming.IndexStream.snapshotTo(spark, state, staging,
        asOfSeq = 1L)
    }
    canon(graft.streaming.IndexStream.queryTopK(spark, snap, q))
  }

  val bm25AsofSql: String =
    s"""WITH ${bm25Ctes(
        "(SELECT doc_id, text FROM documents " +
          "WHERE source <> 'src0' AND doc_id % 2 = 0)",
        "(SELECT doc_id, text FROM documents WHERE source = 'src0')")}
       |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, score_micro, n_terms
       |FROM ranked WHERE rank <= $bm25K
       |${canonOrderSql(Seq("query_id", "rank", "doc_id", "score_micro",
         "n_terms"))}""".stripMargin

  /** bm25_after_delete — ranked retrieval after a tombstone delete,
    * oracle-checked against BM25 over the surviving corpus alone.
    */
  def bm25AfterDelete(spark: SparkSession, sfDir: String): DataFrame = {
    val (state, q) = ridxDelStateAndQueries(spark, sfDir)
    canon(graft.streaming.IndexStream.queryTopK(spark, state, q))
  }

  val bm25AfterDeleteSql: String =
    s"""WITH ${bm25Ctes(
        "(SELECT doc_id, text FROM documents " +
          s"WHERE source <> 'src0' AND NOT ($deleteSlice))",
        "(SELECT doc_id, text FROM documents WHERE source = 'src0')")}
       |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, score_micro, n_terms
       |FROM ranked WHERE rank <= $bm25K
       |${canonOrderSql(Seq("query_id", "rank", "doc_id", "score_micro",
         "n_terms"))}""".stripMargin

  /** phrase_after_delete — the positional face over the same deleted
    * state: a deleted doc's phrases never match.
    */
  def phraseAfterDelete(spark: SparkSession, sfDir: String): DataFrame = {
    val (state, q) = ridxDelStateAndQueries(spark, sfDir)
    canon(graft.streaming.IndexStream.queryPhrase(spark, state, q))
  }

  val phraseAfterDeleteSql: String =
    s"""WITH ${phraseCtes(
        "(SELECT doc_id, text FROM documents " +
          s"WHERE source <> 'src0' AND NOT ($deleteSlice))",
        "(SELECT doc_id, text FROM documents WHERE source = 'src0')")}
       |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, n_occ
       |FROM pranked WHERE rank <= $bm25K
       |${canonOrderSql(Seq("query_id", "rank", "doc_id", "n_occ"))}""".stripMargin

  // ---------------------------------------------------------------------
  // hybrid_topk — reciprocal-rank fusion of sparse + dense retrieval
  // ---------------------------------------------------------------------

  /** RRF rank constant (Cormack/Clarke/Büttcher 2009's k=60). */
  private val rrfConst = 60

  /** Hybrid retrieval: the sparse leg ([[bm25TopkOn]] — lexical BM25)
    * and a dense leg (embedding cosine, candidates blocked to the
    * query's IVF cell — the label-equi join of ann_topk, never a
    * cartesian) each rank their top-[[bm25K]], then the legs fuse by
    * reciprocal-rank fusion: rrf(d) = Σ_legs ⌊10⁶/(k + rank_leg)⌋,
    * k = [[rrfConst]] — integer by construction, so the fused ranking
    * is engine-exact without touching either leg's score scale (RRF's
    * whole point: ranks fuse, incomparable scores don't).
    *
    * This is the retrieval-stack composition a RAG or dedup-audit
    * pipeline actually runs — lexical match catches what embeddings
    * blur (rare ids, numbers), embeddings catch what words miss
    * (paraphrase) — and a doc surfaced by BOTH legs outranks a doc
    * either leg ranks alone at the same position (2·⌊10⁶/63⌋ >
    * ⌊10⁶/61⌋). At scale each leg swaps in its auto-sized face
    * (bm25_index_topk / ann_lsh_auto) under the identical fusion —
    * fusion cost is legs × queries × k rows, independent of corpus.
    */
  def hybridTopk(spark: SparkSession, sfDir: String): DataFrame =
    hybridTopkOn(load(spark, sfDir, "documents"),
      load(spark, sfDir, "embeddings"))

  /** [[hybridTopk]] over explicit (doc_id, source, text) documents and
    * (vec_id, label, embedding) embeddings — the spec seam.
    */
  def hybridTopkOn(d: DataFrame, e: DataFrame): DataFrame =
    canon(rrfFuse(
      bm25TopkOn(d).select(col("query_id"), col("doc_id"),
        col("rank").as("rank_sparse")),
      denseLegOn(d, e)))

  /** The exact-cosine dense leg shared by [[hybridTopkOn]] and
    * [[hybridFullTopkOn]]: candidates blocked to the query's IVF cell
    * (label equi-join, never a cartesian), µ-floored cosine, top-k.
    */
  private def denseLegOn(d: DataFrame, e: DataFrame): DataFrame = {
    graft.plans.VectorExprs.register(d.sparkSession)
    val ev = e.select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
    val qv = d.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"))
      .join(ev.select(col("vec_id").as("query_id"), col("label"),
        col("v").as("vq"), col("nrm").as("nq")), Seq("query_id"))
    val cv = d.filter(col("source") =!= "src0")
      .select(col("doc_id"))
      .join(ev.select(col("vec_id").as("doc_id"), col("label"),
        col("v").as("vc"), col("nrm").as("nc")), Seq("doc_id"))
    val wd = Window.partitionBy(col("query_id"))
      .orderBy(col("sim_micro").desc, col("doc_id").asc)
    qv.join(cv, Seq("label"))
      .withColumn("sim_micro",
        floor(expr("graft_dot(vq, vc)") / (col("nq") * col("nc"))
          * lit(1000000.0)).cast("long"))
      .withColumn("rank_dense", row_number().over(wd))
      .filter(col("rank_dense") <= bm25K)
      .select(col("query_id"), col("doc_id"), col("rank_dense"))
  }

  /** hybrid_full_topk — the hybrid composition with the EXACT
    * full-query sparse leg: [[bm25FullTopkOn]] (MaxScore) replaces the
    * rarest-3 approximation under the identical dense leg and RRF
    * fusion, so the flagship retrieval composition carries true BM25
    * semantics end-to-end. The oracle swaps the sparse subquery of the
    * hybrid SQL for the full-scoring chain — one template, two rows.
    */
  def hybridFullTopk(spark: SparkSession, sfDir: String): DataFrame =
    hybridFullTopkOn(load(spark, sfDir, "documents"),
      load(spark, sfDir, "embeddings"))

  def hybridFullTopkOn(d: DataFrame, e: DataFrame): DataFrame =
    canon(rrfFuse(
      bm25FullTopkOn(d).select(col("query_id"), col("doc_id"),
        col("rank").as("rank_sparse")),
      denseLegOn(d, e)))

  /** The RRF fusion tail — shared by the batch face above and the
    * streaming face (streaming.PipelineStream.hybridTopK), so both
    * fuse with the identical integer arithmetic. Inputs: (query_id,
    * doc_id, rank_sparse) and (query_id, doc_id, rank_dense).
    */
  private[graft] def rrfFuse(sparse: DataFrame,
      dense: DataFrame): DataFrame = rrfFuseLegs(Seq(sparse, dense))

  /** N-leg RRF fusion (round 11 — the proximity leg made fusion
    * arity-generic): each leg carries (query_id, doc_id, rank_<leg>)
    * with a distinct rank column name; legs are chained full-outer on
    * (query_id, doc_id) — the using-column join coalesces the keys,
    * so the chain is the SQL `coalesce`-key pattern exactly — and
    * every candidate's grade is Σ over legs of
    * ⌊10⁶/(rrfConst + rank_leg)⌋ (0 for a leg that missed it), in
    * exact integer µ-units. `n_legs` counts supporting legs, the
    * agreement signal consumers threshold on. For two legs this is
    * bit-identical to the round-9 fusion (same joins, same integer
    * arithmetic), which is what keeps the existing hybrid oracle rows
    * green under the generalization.
    */
  private[graft] def rrfFuseLegs(legs: Seq[DataFrame]): DataFrame = {
    require(legs.nonEmpty, "rrfFuseLegs needs at least one leg")
    val joined = legs.reduce(
      _.join(_, Seq("query_id", "doc_id"), "full_outer"))
    val rankCols = joined.columns.filter(_.startsWith("rank_")).toSeq
    require(rankCols.length == legs.length,
      s"each leg must carry exactly one rank_* column, got $rankCols")
    val fused = joined
      .withColumn("rrf_micro",
        rankCols.map(c =>
          coalesce(expr(s"cast(1000000 div ($rrfConst + $c) as bigint)"),
            lit(0L))).reduce(_ + _))
      .withColumn("n_legs",
        rankCols.map(c => when(col(c).isNotNull, 1).otherwise(0))
          .reduce(_ + _).cast("int"))
    val wf = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_micro").desc, col("doc_id").asc)
    fused.withColumn("rank", row_number().over(wf))
      .filter(col("rank") <= bm25K)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("rrf_micro"), col("n_legs"))
  }

  /** The hybrid oracle template over a pluggable sparse-leg SQL —
    * ONE definition feeds hybrid_topk (rarest-3 leg) and
    * hybrid_full_topk (the MaxScore full-scoring leg).
    */
  private def hybridSqlOver(sparseSql: String): String =
    s"""WITH sparse AS (
       |  SELECT query_id, doc_id, rank AS rank_sparse FROM (
       |    $sparseSql
       |  )
       |), e AS (
       |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
       |), qv AS (
       |  SELECT d.doc_id AS query_id, e.label, e.v
       |  FROM documents d JOIN e ON d.doc_id = e.vec_id
       |  WHERE d.source = 'src0'
       |), cv AS (
       |  SELECT d.doc_id, e.label, e.v
       |  FROM documents d JOIN e ON d.doc_id = e.vec_id
       |  WHERE d.source <> 'src0'
       |), dsim AS (
       |  SELECT a.query_id, b.doc_id,
       |    CAST(floor(list_dot_product(a.v, b.v)
       |        / (sqrt(list_dot_product(a.v, a.v))
       |           * sqrt(list_dot_product(b.v, b.v)))
       |      * 1000000.0) AS BIGINT) AS sim_micro
       |  FROM qv a JOIN cv b ON a.label = b.label
       |), dense AS (
       |  SELECT query_id, doc_id, rank_dense FROM (
       |    SELECT query_id, doc_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY sim_micro DESC, doc_id ASC) AS rank_dense
       |    FROM dsim)
       |  WHERE rank_dense <= $bm25K
       |), fused AS (
       |  SELECT coalesce(s.query_id, de.query_id) AS query_id,
       |    coalesce(s.doc_id, de.doc_id) AS doc_id,
       |    CAST(coalesce(1000000 // ($rrfConst + s.rank_sparse), 0)
       |       + coalesce(1000000 // ($rrfConst + de.rank_dense), 0)
       |      AS BIGINT) AS rrf_micro,
       |    CAST((s.rank_sparse IS NOT NULL)::INT
       |       + (de.rank_dense IS NOT NULL)::INT AS INT) AS n_legs
       |  FROM sparse s FULL OUTER JOIN dense de
       |    ON s.query_id = de.query_id AND s.doc_id = de.doc_id
       |), ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY rrf_micro DESC, doc_id ASC) AS rank
       |  FROM fused)
       |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, rrf_micro, n_legs
       |FROM ranked WHERE rank <= $bm25K
       |${canonOrderSql(Seq("query_id", "rank", "doc_id", "rrf_micro",
         "n_legs"))}""".stripMargin

  val hybridTopkSql: String = hybridSqlOver(bm25TopkSql)

  val hybridFullTopkSql: String = hybridSqlOver(bm25FullTopkSql)

  /** hybrid_fielded_topk — the hybrid composition with a FIELDED
    * sparse leg (round 14): the tagged-query BM25F face
    * ([[bm25fQtagTopk]] — field restrictions + query weights over the
    * titled corpus) replaces the unfielded sparse leg under the
    * identical dense leg and RRF fusion. One template, third row:
    * the oracle swaps the sparse subquery for the fielded chain.
    */
  def hybridFieldedTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val d = withDerivedTitle(load(spark, sfDir, "documents"))
    val e = load(spark, sfDir, "embeddings")
    canon(rrfFuse(
      bm25fQtagTopk(spark, sfDir).select(col("query_id"), col("doc_id"),
        col("rank").as("rank_sparse")),
      denseLegOn(d, e)))
  }

  val hybridFieldedTopkSql: String = hybridSqlOver(bm25fQtagSql)

  /** hybrid_index_topk — the WHOLE streaming retrieval stack as one
    * driver-checked oracle row (round 10, verdict item 2): the train
    * corpus goes through streaming.PipelineStream — BOTH dedup gates,
    * then the kept docs into the incremental BM25 index — and the
    * query face is PipelineStream.hybridTopK: the kept-corpus sparse
    * leg (IndexStream.queryTopK) fused by shared-definition RRF with
    * the dense leg served from the vector GATE's own LSM LSH index
    * (VecDupStream.queryTopK, curation drop set excluded before
    * ranking). Every stage is production gate code; nothing is
    * re-implemented for the query.
    *
    * The oracle re-derives all of it in SQL: both gates' emission
    * logs (the minhash/Jaccard emulation and the masked-bucket
    * Hamming-1 LSH geometry with p recomputed from count(*), exactly
    * as curation_verdicts' oracle), the kept corpus as train minus
    * flagged new_ids, the BM25 chain over the KEPT corpus (the same
    * [[bm25Ctes]] the batch oracle uses), the dense leg as exact
    * cosine over the query's own masked-bucket ∪ Hamming-1 candidates
    * minus the drop set, and the integer RRF fusion — making the
    * composed pipeline's retrieval path oracle-checked end-to-end,
    * not just spec-pinned.
    */
  /** The (doc_id, text, embedding, source) corpus the composed
    * pipeline faces share.
    */
  private def pipelineCorpus(spark: SparkSession,
      sfDir: String): DataFrame = {
    val d = load(spark, sfDir, "documents")
    val e = load(spark, sfDir, "embeddings")
    d.select(col("doc_id"), col("text"), col("source"))
      .join(e.select(col("vec_id").as("doc_id"),
          col("embedding").cast("array<double>").as("embedding")),
        Seq("doc_id"), "left")
  }

  /** The process-shared composed-pipeline state root: the train corpus
    * through PipelineStream once per (process, dataset) — the build's
    * per-file creation constant is the dominant cold cost of every
    * composed face, so it is paid exactly once and shared.
    */
  private val pipeRecipe = "pipe: one PipelineStream batch 0 over train"

  /** Corpus cardinality for the adaptive dir-domain choice — a
    * metadata-only parquet count, one cheap driver job per face
    * invocation (the same cost class as TmpData's fingerprint
    * listing).
    */
  private def docCount(spark: SparkSession, sfDir: String): Long =
    load(spark, sfDir, "documents").count()

  /** The pipe root's layout strings — the vec gate's is the
    * CORPUS-SIZED adaptive domain (round 11): the demo corpus pays
    * per-dir file constants across the full fan-out on every fold and
    * probe, so the state is created via `VecDupStream.initState` at
    * the domain its cardinality warrants; the layout string rides the
    * shared-state key, so a re-sized corpus keys a fresh root.
    */
  private def pipeLayouts(spark: SparkSession,
      sfDir: String): Seq[String] = {
    val n = docCount(spark, sfDir)
    Seq(
      graft.streaming.IndexStream.adaptiveLayoutVersion(n),
      graft.streaming.NearDupStream.adaptiveLayoutVersion(n),
      graft.streaming.VecDupStream.adaptiveLayoutVersion(n))
  }

  private def pipeRootFor(spark: SparkSession, sfDir: String): String = {
    val lays = pipeLayouts(spark, sfDir)
    TmpData.sharedState("pipe", sfDir,
        TmpData.stampOf(lays :+ pipeRecipe: _*), lays) {
      staging =>
        val n = docCount(spark, sfDir)
        graft.streaming.VecDupStream.initState(spark,
          s"$staging/vec_state", n)
        graft.streaming.NearDupStream.initState(spark,
          s"$staging/txt_state", n)
        graft.streaming.IndexStream.initState(spark,
          s"$staging/ridx_state", n)
        graft.streaming.PipelineStream.applyBatch(spark, staging,
          pipelineCorpus(spark, sfDir)
            .filter(col("source") =!= "src0")
            .select(col("doc_id"), col("text"), col("embedding"),
              col("source")),
          batchId = 0L)
    }
  }

  def hybridIndexTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val root = pipeRootFor(spark, sfDir)
    val qs = pipelineCorpus(spark, sfDir)
      .filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"), col("text"), col("embedding"))
    graft.streaming.PipelineStream.hybridTopK(spark, root, qs)
  }

  /** The LSH bucket UNION-ALL tables of the vec gate's geometry, as
    * oracle SQL — shared by the kept-set derivation and the dense-leg
    * emulation.
    */
  private def lshBucketTablesSql(rel: String, idAs: String): String =
    (0 until Similarity.lshAutoTables).map { l =>
      val bucketSql = Similarity.planesForAuto(l).zipWithIndex
        .map { case (pl, j) =>
          s"CASE WHEN list_dot_product(v, ${Similarity.planeSqlLit(pl)}) > 0 " +
            s"THEN CAST(${1L << j} AS BIGINT) ELSE 0 END"
        }.mkString(" + ")
      s"SELECT $idAs, $l AS tbl, $bucketSql AS bucket32 FROM $rel"
    }.mkString("\n  UNION ALL ")

  /** The composed pipeline's keep-set derivation as a reusable oracle
    * CTE chain `corpus .. kept` (round 10): both gates' emission logs
    * re-derived in SQL — the text gate's minhash/banded-Jaccard and
    * the vec gate's masked-bucket + Hamming-1 LSH with p recomputed
    * from count(*) — and `kept` = train minus every flagged new_id.
    * ONE definition feeds hybrid_index_topk and phrase_index_kept so
    * the keep-set SQL cannot drift between the composed oracle rows.
    */
  private[graft] def pipelineKeptCtes: String = {
    val sigSelect = (0 until 8).map { k =>
      val src = if (k < 4) "md5(shingle)" else "md5('x:' || shingle)"
      s"min(substr($src, ${(k % 4) * 8 + 1}, 8)) AS s$k"
    }.mkString(", ")
    s"""corpus AS (
       |  SELECT d.doc_id, d.text, d.source, e.embedding::DOUBLE[] AS v
       |  FROM documents d LEFT JOIN embeddings e ON d.doc_id = e.vec_id),
       |train AS (SELECT * FROM corpus WHERE source <> 'src0'),
       |tbase AS (
       |  SELECT doc_id, lower(text) AS lt, string_split(lower(text), ' ') AS t
       |  FROM train WHERE text IS NOT NULL),
       |sh0 AS (
       |  SELECT doc_id, unnest(
       |    CASE WHEN len(t) >= 3
       |      THEN list_transform(range(1, len(t) - 1),
       |                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
       |      ELSE [lt] END) AS shingle
       |  FROM tbase),
       |sh AS (SELECT DISTINCT doc_id, shingle FROM sh0),
       |sigs AS (SELECT doc_id, $sigSelect, count(*) AS n_sh FROM sh GROUP BY 1),
       |banded AS (
       |  SELECT doc_id, 0 AS band_idx, md5(s0 || s1) AS bucket FROM sigs
       |  UNION ALL SELECT doc_id, 1, md5(s2 || s3) FROM sigs
       |  UNION ALL SELECT doc_id, 2, md5(s4 || s5) FROM sigs
       |  UNION ALL SELECT doc_id, 3, md5(s6 || s7) FROM sigs),
       |tcand AS (
       |  SELECT x.doc_id AS dup_id, y.doc_id AS new_id
       |  FROM banded x JOIN banded y
       |    ON x.band_idx = y.band_idx AND x.bucket = y.bucket
       |      AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2),
       |tshr AS (
       |  SELECT c.dup_id, c.new_id, count(*) AS shared
       |  FROM tcand c
       |  JOIN sh a ON c.dup_id = a.doc_id
       |  JOIN sh b ON c.new_id = b.doc_id AND a.shingle = b.shingle
       |  GROUP BY 1, 2),
       |tpairs AS (
       |  SELECT c.new_id, c.dup_id
       |  FROM tcand c
       |  LEFT JOIN tshr s ON c.dup_id = s.dup_id AND c.new_id = s.new_id
       |  JOIN sigs ca ON c.dup_id = ca.doc_id
       |  JOIN sigs cb ON c.new_id = cb.doc_id
       |  WHERE CAST(coalesce(s.shared, 0) AS DOUBLE)
       |    / CAST(ca.n_sh + cb.n_sh - coalesce(s.shared, 0) AS DOUBLE)
       |    >= 0.5),
       |ev AS (SELECT doc_id AS vec_id, v FROM train WHERE v IS NOT NULL),
       |psel AS (SELECT coalesce(min(pb), ${Similarity.lshMaxAutoPlanes}) AS p
       |         FROM (SELECT unnest(generate_series(1,
       |                 ${Similarity.lshMaxAutoPlanes})) AS pb),
       |              (SELECT count(*) AS n FROM ev)
       |         WHERE (CAST(1 AS BIGINT) << pb)
       |           * ${Similarity.lshTargetOcc} >= n),
       |b32 AS (
       |  ${lshBucketTablesSql("ev", "vec_id")}),
       |vb AS (SELECT vec_id, tbl,
       |         bucket32 & ((CAST(1 AS BIGINT) << p) - 1) AS bucket
       |       FROM b32, psel),
       |vprobes AS (
       |  SELECT vec_id AS new_id, tbl, bucket FROM vb
       |  UNION ALL
       |  SELECT b.vec_id, b.tbl,
       |    xor(b.bucket, CAST(1 AS BIGINT) << g.i) AS bucket
       |  FROM vb b CROSS JOIN (
       |    SELECT unnest(generate_series(0, (SELECT p - 1 FROM psel)))
       |      AS i) g),
       |vcand AS (
       |  SELECT DISTINCT pr.new_id, q.vec_id AS dup_id
       |  FROM vprobes pr JOIN vb q ON pr.tbl = q.tbl AND pr.bucket = q.bucket
       |  WHERE q.vec_id < pr.new_id),
       |vpairs AS (
       |  SELECT c.new_id, c.dup_id
       |  FROM vcand c
       |  JOIN ev a ON c.new_id = a.vec_id
       |  JOIN ev x ON c.dup_id = x.vec_id
       |  WHERE list_dot_product(a.v, x.v)
       |    / (sqrt(list_dot_product(a.v, a.v))
       |       * sqrt(list_dot_product(x.v, x.v))) >= 0.9),
       |dropped AS (
       |  SELECT new_id FROM tpairs UNION SELECT new_id FROM vpairs),
       |kept AS (
       |  SELECT doc_id, text FROM train
       |  WHERE doc_id NOT IN (SELECT new_id FROM dropped))""".stripMargin
  }

  /** The composed hybrid-retrieval oracle SQL, parametrized by an
    * optional DELETE slice (a predicate template over an id column,
    * `%s` substituted): when present, the sparse leg runs over the
    * kept corpus MINUS the slice, the dense-leg candidates exclude the
    * slice on top of the curation drop set, and — the subtle part —
    * the QUERY-TIME read width re-derives from the SURVIVOR count
    * (`pselq`), exactly as the streaming face's negative count markers
    * make VecDupStream.queryTopK size p to the survivors. The keep-set
    * CTEs keep the INGEST-time width (deletes happen after folding).
    * With no slice, `pselq` degenerates to `psel` and this is the
    * round-9 hybrid_index_topk oracle unchanged in meaning.
    */
  private def hybridIndexSqlFor(slice: Option[String],
      prox: Boolean = false): String = {
    val keptRel = slice.fold("kept")(s =>
      s"(SELECT doc_id, text FROM kept WHERE NOT (${s.format("doc_id")}))")
    val pselq = slice.fold("pselq AS (SELECT p FROM psel)")(s =>
      s"""pselq AS (
         |  SELECT coalesce(min(pb), ${Similarity.lshMaxAutoPlanes}) AS p
         |  FROM (SELECT unnest(generate_series(1,
         |          ${Similarity.lshMaxAutoPlanes})) AS pb),
         |       (SELECT count(*) AS n FROM ev
         |        WHERE NOT (${s.format("vec_id")}))
         |  WHERE (CAST(1 AS BIGINT) << pb)
         |    * ${Similarity.lshTargetOcc} >= n)""".stripMargin)
    val denseExtra = slice.fold("")(s =>
      s" AND NOT (${s.format("s.vec_id")})")
    s"""WITH $pipelineKeptCtes,
       |${bm25Ctes(keptRel,
          "(SELECT doc_id, text FROM corpus WHERE source = 'src0')")},
       |sparse AS (
       |  SELECT query_id, doc_id, rank AS rank_sparse FROM ranked
       |  WHERE rank <= $bm25K),
       |qv AS (
       |  SELECT doc_id AS query_id, v FROM corpus
       |  WHERE source = 'src0' AND v IS NOT NULL),
       |$pselq,
       |vbq AS (SELECT vec_id, tbl,
       |          bucket32 & ((CAST(1 AS BIGINT) << p) - 1) AS bucket
       |        FROM b32, pselq),
       |qb32 AS (
       |  ${lshBucketTablesSql("qv", "query_id AS vec_id")}),
       |qvb AS (SELECT vec_id AS query_id, tbl,
       |          bucket32 & ((CAST(1 AS BIGINT) << p) - 1) AS bucket
       |        FROM qb32, pselq),
       |qprobes AS (
       |  SELECT query_id, tbl, bucket FROM qvb
       |  UNION ALL
       |  SELECT b.query_id, b.tbl,
       |    xor(b.bucket, CAST(1 AS BIGINT) << g.i) AS bucket
       |  FROM qvb b CROSS JOIN (
       |    SELECT unnest(generate_series(0, (SELECT p - 1 FROM pselq)))
       |      AS i) g),
       |dcand AS (
       |  SELECT DISTINCT pr.query_id, s.vec_id
       |  FROM qprobes pr JOIN vbq s ON pr.tbl = s.tbl AND pr.bucket = s.bucket
       |  WHERE s.vec_id NOT IN (SELECT new_id FROM dropped)$denseExtra),
       |dsim AS (
       |  SELECT c.query_id, c.vec_id AS doc_id,
       |    CAST(floor(list_dot_product(q.v, s.v)
       |        / (sqrt(list_dot_product(q.v, q.v))
       |           * sqrt(list_dot_product(s.v, s.v)))
       |      * 1000000.0) AS BIGINT) AS sim_micro
       |  FROM dcand c JOIN qv q ON c.query_id = q.query_id
       |  JOIN ev s ON c.vec_id = s.vec_id),
       |dense AS (
       |  SELECT query_id, doc_id, rank_dense FROM (
       |    SELECT query_id, doc_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY sim_micro DESC, doc_id ASC) AS rank_dense
       |    FROM dsim)
       |  WHERE rank_dense <= $bm25K),
       |${if (!prox) "" else
          s"""${nearCtes(keptRel,
               "(SELECT doc_id, text FROM corpus WHERE source = 'src0')",
               sloppy = true)},
             |prox AS (
             |  SELECT query_id, doc_id, rank AS rank_prox FROM nranked
             |  WHERE rank <= $bm25K),
             |""".stripMargin}fused AS (
       |  SELECT coalesce(s.query_id, de.query_id${
           if (prox) ", px.query_id" else ""}) AS query_id,
       |    coalesce(s.doc_id, de.doc_id${
           if (prox) ", px.doc_id" else ""}) AS doc_id,
       |    CAST(coalesce(1000000 // ($rrfConst + s.rank_sparse), 0)
       |       + coalesce(1000000 // ($rrfConst + de.rank_dense), 0)${
           if (prox)
             s"\n       + coalesce(1000000 // ($rrfConst + px.rank_prox), 0)"
           else ""}
       |      AS BIGINT) AS rrf_micro,
       |    CAST((s.rank_sparse IS NOT NULL)::INT
       |       + (de.rank_dense IS NOT NULL)::INT${
           if (prox) "\n       + (px.rank_prox IS NOT NULL)::INT"
           else ""} AS INT) AS n_legs
       |  FROM sparse s FULL OUTER JOIN dense de
       |    ON s.query_id = de.query_id AND s.doc_id = de.doc_id${
           if (prox)
             s"""\n  FULL OUTER JOIN prox px
                |    ON coalesce(s.query_id, de.query_id) = px.query_id
                |   AND coalesce(s.doc_id, de.doc_id) = px.doc_id""".stripMargin
           else ""}),
       |franked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY rrf_micro DESC, doc_id ASC) AS rank
       |  FROM fused)
       |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, rrf_micro, n_legs
       |FROM franked WHERE rank <= $bm25K
       |${canonOrderSql(Seq("query_id", "rank", "doc_id", "rrf_micro",
         "n_legs"))}""".stripMargin
  }

  val hybridIndexTopkSql: String = hybridIndexSqlFor(None)

  /** hybrid_prox_topk — THREE-LEG hybrid retrieval over the composed
    * pipeline (round 11, roadmap "proximity leg in hybrid fusion"):
    * [[hybridIndexTopk]]'s sparse (kept-corpus BM25) and dense
    * (vec-gate LSM, drop set excluded) legs plus a PROXIMITY leg —
    * sloppy-frequency NEAR over the kept positional index (Σ
    * ⌊10⁶/(1+slop)⌋ per doc, Lucene's sloppy-phrase grade) — fused by
    * the arity-generic shared RRF (rrfFuseLegs). The oracle re-derives
    * all three legs AND the keep set in SQL: the shared kept CTEs,
    * the BM25 chain, the dense LSH emulation, and the same
    * length-generic window-merge NEAR chain the standalone
    * `near_sloppy` rows pin — then the 3-way coalesce-key full-outer
    * fusion in exact integer µ-units.
    */
  def hybridProxTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val root = pipeRootFor(spark, sfDir)
    val qs = pipelineCorpus(spark, sfDir)
      .filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"), col("text"), col("embedding"))
    graft.streaming.PipelineStream.hybridProxTopK(spark, root, qs)
  }

  val hybridProxTopkSql: String = hybridIndexSqlFor(None, prox = true)

  /** The deleted slice of the composed-pipeline delete face: every
    * 11th train doc (pmod 3), deleted AFTER the pipeline indexed the
    * batch. `%s` is the id column (doc_id / vec_id / s.vec_id in the
    * three oracle contexts).
    */
  private val hybridDeleteSlice = "%s %% 11 = 3"

  /** hybrid_after_delete — RIGHT-TO-BE-FORGOTTEN over the WHOLE
    * composed pipeline, driver-checked: the train corpus runs through
    * PipelineStream (both gates → kept corpus → BM25 index), then the
    * slice is DELETED via [[graft.streaming.PipelineStream.delete]] —
    * one call tombstoning all three LSM states — and the query face is
    * the same streaming hybrid retrieval as hybrid_index_topk. The
    * oracle re-derives the keep set at ingest-time geometry, the
    * sparse leg over kept-minus-deleted (survivor idf/avgdl/df from
    * the negative markers and df rows), the dense leg at the
    * SURVIVOR-sized read width with deleted candidates excluded, and
    * the shared RRF fusion — so the delete path of every state is
    * checked end-to-end against first-principles SQL, not just specs.
    */
  def hybridAfterDelete(spark: SparkSession, sfDir: String): DataFrame = {
    val corpus = pipelineCorpus(spark, sfDir)
    // own root: deleting from the shared "pipe" root would poison
    // hybrid_index_topk's shared state. The state is CLONED from the
    // published pipe root with one local-fs recursive copy instead of
    // re-running the whole pipeline build — the build's per-file
    // creation constant is the dominant cold cost (~45 s flat at any
    // SF), the copy is not; LSM state roots are self-contained dirs,
    // so a byte copy IS the state. The delete happens INSIDE the
    // build, so the published root is immutable like the others.
    val delLays = pipeLayouts(spark, sfDir)
    val root = TmpData.sharedState("pipedel", sfDir,
        TmpData.stampOf(delLays ++ Seq(pipeRecipe,
          s"pipedel: delete [${hybridDeleteSlice.format("doc_id")}] id 0"): _*),
        delLays) { staging =>
      val src = pipeRootFor(spark, sfDir)
      val conf = spark.sparkContext.hadoopConfiguration
      val fs = new org.apache.hadoop.fs.Path(src).getFileSystem(conf)
      require(org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(src), fs,
        new org.apache.hadoop.fs.Path(staging), false, true, conf),
        s"pipeline state clone failed: $src -> $staging")
      graft.streaming.PipelineStream.delete(spark, staging,
        corpus.filter(col("source") =!= "src0")
          .filter(expr(hybridDeleteSlice.format("doc_id")))
          .select(col("doc_id")),
        deleteId = 0L)
    }
    val qs = corpus.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"), col("text"),
        col("embedding"))
    graft.streaming.PipelineStream.hybridTopK(spark, root, qs)
  }

  val hybridAfterDeleteSql: String =
    hybridIndexSqlFor(Some(hybridDeleteSlice))

  /** phrase_index_kept — exact-phrase retrieval over the composed
    * pipeline's KEPT corpus: the train corpus runs through
    * PipelineStream (both dedup gates, keep set into the positional
    * BM25 index), then each src0 query's leading phrase searches the
    * accumulated index. No drop-set exclusion exists at query time —
    * a rejected document's phrases are unsearchable because its
    * postings never entered the index (keep-at-ingest finality,
    * HiWater-enforced). The oracle composes the shared keep-set CTE
    * chain ([[pipelineKeptCtes]] — the same SQL hybrid_index_topk
    * checks against) with the shared phrase chain ([[phraseCtes]]):
    * curation and positional retrieval verified END-TO-END in one
    * driver-checked row.
    */
  def phraseIndexKept(spark: SparkSession, sfDir: String): DataFrame = {
    val root = pipeRootFor(spark, sfDir)
    val qs = pipelineCorpus(spark, sfDir)
      .filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"), col("text"))
    canon(graft.streaming.PipelineStream.queryPhrase(spark, root, qs))
  }

  val phraseIndexKeptSql: String =
    s"""WITH $pipelineKeptCtes,
       |${phraseCtes("kept",
          "(SELECT doc_id, text FROM corpus WHERE source = 'src0')")}
       |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, n_occ
       |FROM pranked WHERE rank <= $bm25K
       |${canonOrderSql(Seq("query_id", "rank", "doc_id", "n_occ"))}""".stripMargin

  /** dense_index_adc — the composed pipeline's dense retrieval leg
    * served ENTIRELY through the vec gate's PQ-compressed read path
    * (round 11): queries run [[graft.streaming.PipelineStream.denseTopK]]
    * with ADC pre-rank force-engaged (engageMin = 0) at a covering
    * exact-verify tail, so the codebook read, candidate code fetch,
    * exact-integer ADC table, pre-rank window, and tail-bounded raw
    * float32 fetch all sit on the oracle path. The covering tail makes
    * the compressed path bit-identical to exact by construction
    * (nothing is pruned — PqLegSpec pins the same equality at the
    * plan-metrics level), so the oracle is the dense-leg SQL of the
    * hybrid chain: LSH candidates at corpus-derived width, curation
    * drop set excluded, exact cosine, top-k.
    */
  def denseIndexAdc(spark: SparkSession, sfDir: String): DataFrame = {
    val root = pipeRootFor(spark, sfDir)
    val qs = pipelineCorpus(spark, sfDir)
      .filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"), col("embedding"))
    canon(graft.streaming.PipelineStream.denseTopK(spark, root, qs))
  }

  val denseIndexAdcSql: String = denseLegSqlFor("")

  /** dense_index_filtered — FILTERED ANN over the composed pipeline's
    * vector index (round 11): the dense leg constrained to an ALLOW
    * set (here: train docs from three named sources — the "top-k among
    * docs from source X" shape a metadata-constrained RAG query runs),
    * applied to candidates BEFORE ranking so the constrained list is
    * full-depth over the allowed subset, never a post-filtered stub.
    * Runs through the same force-engaged compressed leg as
    * dense_index_adc, so allow × ADC compose on the oracle path.
    */
  private val denseAllowSources = Seq("src1", "src2", "src3")

  def denseIndexFiltered(spark: SparkSession, sfDir: String): DataFrame = {
    val root = pipeRootFor(spark, sfDir)
    val corpus = pipelineCorpus(spark, sfDir)
    val qs = corpus.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"), col("embedding"))
    val allow = corpus.filter(col("source").isin(denseAllowSources: _*))
      .select(col("doc_id").as("vec_id"))
    canon(graft.streaming.PipelineStream.denseTopK(spark, root, qs,
      allow = Some(allow)))
  }

  private def denseLegSqlFor(candExtra: String): String =
    s"""WITH $pipelineKeptCtes,
       |qv AS (
       |  SELECT doc_id AS query_id, v FROM corpus
       |  WHERE source = 'src0' AND v IS NOT NULL),
       |vbq AS (SELECT vec_id, tbl,
       |          bucket32 & ((CAST(1 AS BIGINT) << p) - 1) AS bucket
       |        FROM b32, psel),
       |qb32 AS (
       |  ${lshBucketTablesSql("qv", "query_id AS vec_id")}),
       |qvb AS (SELECT vec_id AS query_id, tbl,
       |          bucket32 & ((CAST(1 AS BIGINT) << p) - 1) AS bucket
       |        FROM qb32, psel),
       |qprobes AS (
       |  SELECT query_id, tbl, bucket FROM qvb
       |  UNION ALL
       |  SELECT b.query_id, b.tbl,
       |    xor(b.bucket, CAST(1 AS BIGINT) << g.i) AS bucket
       |  FROM qvb b CROSS JOIN (
       |    SELECT unnest(generate_series(0, (SELECT p - 1 FROM psel)))
       |      AS i) g),
       |dcand AS (
       |  SELECT DISTINCT pr.query_id, s.vec_id
       |  FROM qprobes pr JOIN vbq s ON pr.tbl = s.tbl AND pr.bucket = s.bucket
       |  WHERE s.vec_id NOT IN (SELECT new_id FROM dropped)$candExtra),
       |dsim AS (
       |  SELECT c.query_id, c.vec_id,
       |    CAST(floor(list_dot_product(q.v, s.v)
       |        / (sqrt(list_dot_product(q.v, q.v))
       |           * sqrt(list_dot_product(s.v, s.v)))
       |      * 1000000.0) AS BIGINT) AS sim_micro
       |  FROM dcand c JOIN qv q ON c.query_id = q.query_id
       |  JOIN ev s ON c.vec_id = s.vec_id),
       |dranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY sim_micro DESC, vec_id ASC) AS rank
       |  FROM dsim)
       |SELECT query_id, CAST(rank AS INT) AS rank, vec_id, sim_micro
       |FROM dranked WHERE rank <= $bm25K
       |${canonOrderSql(Seq("query_id", "rank", "vec_id", "sim_micro"))}""".stripMargin

  val denseIndexFilteredSql: String = denseLegSqlFor(
    "\n      AND s.vec_id IN (SELECT doc_id FROM corpus WHERE source IN (" +
      denseAllowSources.map(s => s"'$s'").mkString(", ") + "))")

  /** bm25_index_filtered — FILTERED sparse retrieval (round 11), the
    * BM25 twin of `dense_index_filtered`'s allow sets: only documents
    * in the allow relation (here the same three-source slice as the
    * dense face, so the two legs demonstrate one tenant-scoping
    * contract) may rank, applied to the posting hits BEFORE ranking
    * and before the dl fetch, while every corpus statistic — df-based
    * term selection, the head-term cap, n_docs, totdl — stays
    * whole-index so scores stay comparable across filters. The oracle
    * re-ranks the first-principles BM25 scores over the allowed docs
    * (the predicate sits under the rank window, above nothing else).
    */
  def bm25IndexFiltered(spark: SparkSession, sfDir: String): DataFrame = {
    val (state, q) = ridxStateAndQueries(spark, sfDir)
    val allow = load(spark, sfDir, "documents")
      .filter(col("source").isin(denseAllowSources: _*))
      .select(col("doc_id"))
    canon(graft.streaming.IndexStream.queryTopK(spark, state, q,
      allow = Some(allow)))
  }

  val bm25IndexFilteredSql: String =
    s"""WITH ${bm25Ctes(
        "(SELECT doc_id, text FROM documents WHERE source <> 'src0')",
        "(SELECT doc_id, text FROM documents WHERE source = 'src0')",
        "\n  WHERE doc_id IN (SELECT doc_id FROM documents " +
          "WHERE source IN (" +
          denseAllowSources.map(s => s"'$s'").mkString(", ") + "))")}
       |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, score_micro, n_terms
       |FROM ranked WHERE rank <= $bm25K
       |${canonOrderSql(Seq("query_id", "rank", "doc_id", "score_micro",
         "n_terms"))}""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bm25_topk" -> bm25Topk,
    "bm25_full_topk" -> bm25FullTopk,
    "bm25_full_index" -> bm25FullIndex,
    "bm25_index_topk" -> bm25IndexTopk,
    "bm25_after_redomain" -> bm25AfterRedomain,
    "bm25_index_filtered" -> bm25IndexFiltered,
    "bool_topk" -> boolTopk,
    "bool_index_topk" -> boolIndexTopk,
    "bm25_prefix_topk" -> prefixTopk,
    "bm25_prefix_index" -> prefixIndexTopk,
    "search_facets" -> searchFacets,
    "search_facets_index" -> searchFacetsIndex,
    "bm25f_topk" -> bm25fTopk,
    "bm25f_index" -> bm25fIndex,
    "bm25f_titled" -> bm25fTitled,
    "bm25f_titled_index" -> bm25fTitledIndex,
    "bm25f_qtag_topk" -> bm25fQtagTopk,
    "bm25f_qtag_index" -> bm25fQtagIndex,
    "bm25f_ldf_topk" -> bm25fLdfTopk,
    "bm25f_ldf_index" -> bm25fLdfIndex,
    "phrase_title_match" -> phraseTitleMatch,
    "phrase_title_index" -> phraseTitleIndex,
    "phrase_qtag_match" -> phraseQtagMatch,
    "phrase_qtag_index" -> phraseQtagIndex,
    "near_qtag_match" -> nearQtagMatch,
    "near_qtag_index" -> nearQtagIndex,
    "qlang_topk" -> qlangTopk,
    "qlang_index" -> qlangIndex,
    "hybrid_fielded_topk" -> hybridFieldedTopk,
    "hybrid_topk" -> hybridTopk,
    "hybrid_full_topk" -> hybridFullTopk,
    "hybrid_index_topk" -> hybridIndexTopk,
    "hybrid_prox_topk" -> hybridProxTopk,
    "dense_index_adc" -> denseIndexAdc,
    "dense_index_filtered" -> denseIndexFiltered,
    "phrase_match" -> phraseMatch,
    "phrase_index_match" -> phraseIndexMatch,
    "phrase_index_kept" -> phraseIndexKept,
    "near_match" -> nearMatch,
    "near_index_match" -> nearIndexMatch,
    "near3_match" -> near3Match,
    "near3_index_match" -> near3IndexMatch,
    "near_sloppy" -> nearSloppy,
    "near_sloppy_index" -> nearSloppyIndex,
    "near_unordered" -> nearUnordered,
    "near_unordered_index" -> nearUnorderedIndex,
    "near_unordered_sloppy" -> nearUnorderedSloppy,
    "search_snippets" -> searchSnippets,
    "phrase3_match" -> phrase3Match,
    "phrase3_index_match" -> phrase3IndexMatch,
    "bm25_after_delete" -> bm25AfterDelete,
    "phrase_after_delete" -> phraseAfterDelete,
    "hybrid_after_delete" -> hybridAfterDelete,
    "bm25_asof" -> bm25Asof,
    "bigram_lm" -> bigramLm,
    "bigram_lm_heldout" -> bigramLmHeldout,
    "stratified_sample" -> stratifiedSample,
    "temperature_sample" -> temperatureSample,
    "table_profile" -> tableProfile,
    "table_profile_approx" -> tableProfileApprox,
    "inverted_index" -> invertedIndex,
    "shard_pack" -> shardPack,
    "pack_efficiency" -> packEfficiency,
    "length_outliers" -> lengthOutliers,
    "length_outliers_approx" -> lengthOutliersApprox,
    "pmi_cooccur" -> pmiCooccur)

  val oracles: Map[String, String] = Map(
    "bm25_topk" -> bm25TopkSql,
    "bm25_full_topk" -> bm25FullTopkSql,
    "bm25_full_index" -> bm25FullTopkSql,
    "bm25_index_topk" -> bm25TopkSql,
    "bm25_after_redomain" -> bm25TopkSql,
    "bm25_index_filtered" -> bm25IndexFilteredSql,
    "bool_topk" -> boolTopkSql,
    "bool_index_topk" -> boolTopkSql,
    "bm25_prefix_topk" -> prefixTopkSql,
    "bm25_prefix_index" -> prefixTopkSql,
    "search_facets" -> searchFacetsSql,
    "search_facets_index" -> searchFacetsSql,
    "bm25f_topk" -> bm25fTopkSql,
    "bm25f_index" -> bm25fTopkSql,
    "bm25f_titled" -> bm25fTitledSql,
    "bm25f_titled_index" -> bm25fTitledSql,
    "bm25f_qtag_topk" -> bm25fQtagSql,
    "bm25f_qtag_index" -> bm25fQtagSql,
    "bm25f_ldf_topk" -> bm25fLdfSql,
    "bm25f_ldf_index" -> bm25fLdfSql,
    "phrase_title_match" -> phraseTitleSql,
    "phrase_title_index" -> phraseTitleSql,
    "phrase_qtag_match" -> phraseQtagSql,
    "phrase_qtag_index" -> phraseQtagSql,
    "near_qtag_match" -> nearQtagSql,
    "near_qtag_index" -> nearQtagSql,
    "qlang_topk" -> qlangSql,
    "qlang_index" -> qlangSql,
    "hybrid_fielded_topk" -> hybridFieldedTopkSql,
    "hybrid_topk" -> hybridTopkSql,
    "hybrid_full_topk" -> hybridFullTopkSql,
    "hybrid_index_topk" -> hybridIndexTopkSql,
    "hybrid_prox_topk" -> hybridProxTopkSql,
    "dense_index_adc" -> denseIndexAdcSql,
    "dense_index_filtered" -> denseIndexFilteredSql,
    "phrase_match" -> phraseMatchSql,
    "phrase_index_match" -> phraseMatchSql,
    "phrase_index_kept" -> phraseIndexKeptSql,
    "near_match" -> nearMatchSql,
    "near_index_match" -> nearMatchSql,
    "near3_match" -> near3MatchSql,
    "near3_index_match" -> near3MatchSql,
    "near_sloppy" -> nearSloppySql,
    "near_sloppy_index" -> nearSloppySql,
    "near_unordered" -> nearUnorderedSql,
    "near_unordered_index" -> nearUnorderedSql,
    "near_unordered_sloppy" -> nearUnorderedSloppySql,
    "search_snippets" -> searchSnippetsSql,
    "phrase3_match" -> phrase3MatchSql,
    "phrase3_index_match" -> phrase3MatchSql,
    "bm25_after_delete" -> bm25AfterDeleteSql,
    "phrase_after_delete" -> phraseAfterDeleteSql,
    "hybrid_after_delete" -> hybridAfterDeleteSql,
    "bm25_asof" -> bm25AsofSql,
    "bigram_lm" -> bigramLmSql,
    "bigram_lm_heldout" -> bigramLmHeldoutSql,
    "stratified_sample" -> stratifiedSampleSql,
    "temperature_sample" -> temperatureSampleSql,
    "table_profile" -> tableProfileSql,
    "table_profile_approx" -> tableProfileApproxSql,
    "inverted_index" -> invertedIndexSql,
    "shard_pack" -> shardPackSql,
    "pack_efficiency" -> packEfficiencySql,
    "length_outliers" -> lengthOutliersSql,
    "length_outliers_approx" -> lengthOutliersApproxSql,
    "pmi_cooccur" -> pmiCooccurSql)
}
