package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{canon, canonOrderSql, load}

/** Text-analysis operators for large-scale training-data pipelines:
  * quality scoring, language-ID heuristic, tokenization counts, and
  * document fingerprinting — all as codegen'd built-in expressions
  * (no UDFs), each with a DuckDB oracle.
  *
  * Scale: every query is a single narrow scan + projection (+ one
  * shuffle-free aggregation) — embarrassingly parallel at 100 TB.
  */
object TextOps {

  private val stopwords = Seq("the", "a", "data", "table", "row")
  private def sqlList(xs: Seq[String]) = xs.map(s => s"'$s'").mkString(", ")

  /** Quality scoring: token/char counts, lexical diversity, stopword
    * ratio, shortness flag.
    */
  def textStats(spark: SparkSession, sfDir: String): DataFrame = {
    val d = load(spark, sfDir, "documents")
    val out = d
      .withColumn("toks", split(col("text"), " "))
      .select(
        col("doc_id"),
        length(col("text")).as("n_chars_calc"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_distinct"),
        expr(s"size(filter(toks, x -> array_contains(array(${sqlList(stopwords)}), x)))")
          .as("n_stopwords"),
        (size(array_distinct(col("toks"))).cast("double") /
          size(col("toks")).cast("double")).as("token_diversity"),
        when(length(col("text")) < 150, 1).otherwise(0).as("is_short"))
    canon(out)
  }

  val textStatsSql: String =
    s"""SELECT doc_id,
       |  length(text) AS n_chars_calc,
       |  len(string_split(text, ' ')) AS n_tokens,
       |  len(list_distinct(string_split(text, ' '))) AS n_distinct,
       |  len(list_filter(string_split(text, ' '),
       |      x -> list_contains([${sqlList(stopwords)}], x))) AS n_stopwords,
       |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
       |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS token_diversity,
       |  CASE WHEN length(text) < 150 THEN 1 ELSE 0 END AS is_short
       |FROM documents
       |${canonOrderSql(Seq("doc_id", "n_chars_calc", "n_tokens", "n_distinct",
         "n_stopwords", "token_diversity", "is_short"))}""".stripMargin

  /** Language-ID heuristic: stopword-marker counts per language with a
    * deterministic argmax chain. (The synthetic corpus shares one
    * vocabulary across langs, so this checks function parity, not
    * classifier accuracy.)
    */
  private val langMarkers = Seq(
    "en" -> Seq("the", "a", "of"),
    "de" -> Seq("der", "die", "das"),
    "fr" -> Seq("le", "la", "les"),
    "es" -> Seq("el", "los", "las"))

  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    val d = load(spark, sfDir, "documents")
    val withScores = langMarkers.foldLeft(
      d.withColumn("toks", split(lower(col("text")), " "))) {
      case (df, (lang, markers)) =>
        df.withColumn(s"s_$lang",
          expr(s"size(filter(toks, x -> array_contains(array(${sqlList(markers)}), x)))"))
    }
    // deterministic argmax: first language (in declaration order) with the
    // maximal score wins
    val predicted = langMarkers.map(_._1).foldRight(lit("und"): org.apache.spark.sql.Column) {
      case (lang, els) =>
        val isMax = langMarkers.map(_._1).filter(_ != lang)
          .map(o => col(s"s_$lang") >= col(s"s_$o")).reduce(_ && _)
        when(isMax, lit(lang)).otherwise(els)
    }
    val out = withScores.select(
      col("doc_id"), col("lang").as("labeled_lang"),
      col("s_en"), col("s_de"), col("s_fr"), col("s_es"),
      predicted.as("predicted_lang"))
    canon(out)
  }

  /** Shared oracle builders — one definition of the score expressions
    * and the argmax chain so langIdSql and langConfusionSql cannot
    * drift (the Spark side already shares code: langConfusion calls
    * langId).
    */
  private val langScoresSql: String = langMarkers.map { case (lang, markers) =>
    s"len(list_filter(string_split(lower(text), ' '), x -> list_contains([${sqlList(markers)}], x))) AS s_$lang"
  }.mkString(",\n  ")

  private val langChainSql: String = {
    val langs = langMarkers.map(_._1)
    langs.map { lang =>
      val cond = langs.filter(_ != lang).map(o => s"s_$lang >= s_$o").mkString(" AND ")
      s"WHEN $cond THEN '$lang'"
    }.mkString(" ")
  }

  val langIdSql: String =
    s"""WITH scored AS (
       |  SELECT doc_id, lang AS labeled_lang, $langScoresSql
       |  FROM documents
       |)
       |SELECT doc_id, labeled_lang, s_en, s_de, s_fr, s_es,
       |  CASE $langChainSql ELSE 'und' END AS predicted_lang
       |FROM scored
       |${canonOrderSql(Seq("doc_id", "labeled_lang", "s_en", "s_de", "s_fr",
         "s_es", "predicted_lang"))}""".stripMargin

  /** Classifier evaluation against the corpus ground truth: the
    * confusion matrix of lang_id's predictions vs the labeled `lang`
    * column, plus per-cell share of the label's row — the quality gate
    * any classifier-driven filter stage needs before it routes corpus
    * slices. One aggregation over the scored relation; cardinality is
    * |langs|² regardless of corpus size.
    */
  def langConfusion(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = langId(spark, sfDir)
      .select(col("labeled_lang"), col("predicted_lang"))
    val totals = scored.groupBy(col("labeled_lang"))
      .agg(count(lit(1)).as("n_labeled"))
    val cells = scored.groupBy(col("labeled_lang"), col("predicted_lang"))
      .agg(count(lit(1)).as("n_docs"))
    // share via exact integer floor-quantization (µ-units) — decimal
    // division rounding is engine-specific, integer div is not
    val out = cells.join(totals, Seq("labeled_lang"))
      .select(col("labeled_lang"), col("predicted_lang"), col("n_docs"),
        (expr("(n_docs * 1000000) div n_labeled").cast("double") / 1e6)
          .as("share"))
    canon(out)
  }

  val langConfusionSql: String =
    s"""WITH scored AS (
       |  SELECT doc_id, lang AS labeled_lang, $langScoresSql
       |  FROM documents
       |), pred AS (
       |  SELECT labeled_lang, CASE $langChainSql ELSE 'und' END AS predicted_lang
       |  FROM scored
       |), cells AS (
       |  SELECT labeled_lang, predicted_lang, count(*) AS n_docs
       |  FROM pred GROUP BY 1, 2
       |), totals AS (
       |  SELECT labeled_lang, count(*) AS n_labeled FROM pred GROUP BY 1
       |)
       |SELECT c.labeled_lang, c.predicted_lang, c.n_docs,
       |  CAST((c.n_docs * 1000000) // t.n_labeled AS DOUBLE) / 1e6 AS share
       |FROM cells c JOIN totals t USING (labeled_lang)
       |${canonOrderSql(Seq("labeled_lang", "predicted_lang", "n_docs", "share"))}""".stripMargin


  /** Token counting: whitespace tokens + a BPE-ish regex tokenizer
    * (letter runs / digit runs / single other symbols).
    */
  def tokenCount(spark: SparkSession, sfDir: String): DataFrame = {
    val d = load(spark, sfDir, "documents")
    val pat = "[a-z]+|[0-9]+|[^a-z0-9 ]"
    val out = d.select(
      col("doc_id"),
      size(split(col("text"), " ")).as("n_ws_tokens"),
      size(expr(s"regexp_extract_all(lower(text), '$pat', 0)")).as("n_bpe_tokens"),
      (length(col("text")).cast("double") /
        greatest(size(expr(s"regexp_extract_all(lower(text), '$pat', 0)")), lit(1))
          .cast("double")).as("chars_per_token"))
    canon(out)
  }

  val tokenCountSql: String =
    s"""SELECT doc_id,
       |  len(string_split(text, ' ')) AS n_ws_tokens,
       |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_tokens,
       |  CAST(length(text) AS DOUBLE) /
       |    CAST(greatest(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')), 1) AS DOUBLE)
       |    AS chars_per_token
       |FROM documents
       |${canonOrderSql(Seq("doc_id", "n_ws_tokens", "n_bpe_tokens", "chars_per_token"))}""".stripMargin

  /** Document fingerprinting: full-text digest, 64-char-prefix digest,
    * and a single-seed minhash over 3-gram shingles (rolling-hash
    * analog) on whitespace-normalized text.
    */
  def docFingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    val d = load(spark, sfDir, "documents")
    val out = d
      .withColumn("norm", trim(regexp_replace(lower(col("text")), "\\s+", " ")))
      .withColumn("t", split(col("norm"), " "))
      .withColumn("shingles", expr(Dedup.shingleArrayExpr("norm")))
      .select(
        col("doc_id"),
        md5(col("norm")).as("fingerprint"),
        md5(substring(col("norm"), 1, 64)).as("prefix_fp"),
        expr("array_min(transform(shingles, s -> md5(s)))").as("shingle_min_fp"))
    canon(out)
  }

  val docFingerprintSql: String =
    s"""WITH normed AS (
       |  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
       |  FROM documents
       |), sh AS (
       |  SELECT doc_id, norm, string_split(norm, ' ') AS t FROM normed
       |), shingled AS (
       |  SELECT doc_id, norm,
       |    CASE WHEN len(t) >= 3
       |      THEN list_transform(range(1, len(t) - 1),
       |                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
       |      ELSE [norm] END AS shingles
       |  FROM sh
       |)
       |SELECT doc_id, md5(norm) AS fingerprint,
       |  md5(substr(norm, 1, 64)) AS prefix_fp,
       |  list_min(list_transform(shingles, s -> md5(s))) AS shingle_min_fp
       |FROM shingled
       |${canonOrderSql(Seq("doc_id", "fingerprint", "prefix_fp", "shingle_min_fp"))}""".stripMargin

  /** TF-IDF top terms per document. The score is kept rational
    * (tf * n_docs / df — one exact-integer multiply, one double divide)
    * instead of log-idf: libm log() may differ across engines by an ulp,
    * a division of exact integers cannot.
    */
  def tfidfTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val d = load(spark, sfDir, "documents")
    val toks = d.select(col("doc_id"),
      explode(split(lower(col("text")), " ")).as("tok"))
    val tf = toks.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val df_ = toks.select(col("doc_id"), col("tok")).distinct()
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val nDocs = d.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("tok").asc)
    val out = tf.join(df_, "tok").crossJoin(broadcast(nDocs))
      .withColumn("score",
        (col("tf") * col("n_docs")).cast("double") / col("df").cast("double"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("tok").as("term"), col("rank"),
        col("tf"), col("df"), col("score"))
    canon(out)
  }

  val tfidfTopkSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
       |  FROM documents
       |), tf AS (
       |  SELECT doc_id, tok, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2
       |), df AS (
       |  SELECT tok, count(DISTINCT doc_id)::BIGINT AS df FROM toks GROUP BY 1
       |), n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
       |scored AS (
       |  SELECT tf.doc_id, tf.tok, tf.tf, df.df,
       |    CAST(tf.tf * n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE) AS score
       |  FROM tf JOIN df USING (tok), n
       |), ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY doc_id
       |    ORDER BY score DESC, tok ASC) AS rank
       |  FROM scored
       |)
       |SELECT doc_id, tok AS term, CAST(rank AS INT) AS rank, tf, df, score
       |FROM ranked WHERE rank <= 3
       |${canonOrderSql(Seq("doc_id", "term", "rank", "tf", "df", "score"))}""".stripMargin

  /** Benchmark-contamination check: fraction of each document's 3-gram
    * shingles that appear in a benchmark set (here: the src0 slice) —
    * the train/test-overlap scan every training-data pipeline needs.
    * The benchmark shingle set scales with the benchmark corpus, so the
    * membership tests are shuffle left-semi joins on the shingle key (one
    * exchange each) rather than forced broadcasts — AQE downgrades them
    * to broadcast joins at runtime while the set is actually small.
    */
  def contaminationCheck(spark: SparkSession, sfDir: String): DataFrame = {
    graft.plans.BloomExprs.register(spark)
    val d = load(spark, sfDir, "documents")
    // one shared (and persisted) shingle definition with the dedup family
    val all = Dedup.shingles(d)
    val benchIds = d.filter(col("source") === "src0").select(col("doc_id"))
    // persisted: the distinct bench-shingle set feeds BOTH the bloom
    // build and the exact semi-join — without the cache its semi-join +
    // distinct exchange would run twice per query
    val benchSet = Caching.persistOnce(
      all.join(benchIds, Seq("doc_id"), "left_semi")
        .select(col("shingle")).distinct())
    // bloom pre-filter BEFORE the exact semi-join: at 100 TB the corpus'
    // full shingle stream would otherwise shuffle into the membership
    // join; the bench set's bloom (built once, attached as a scalar
    // subquery — the same BloomFilterAggregate/MightContain machinery the
    // optimizer's runtime filters use) drops non-hits at the scan side,
    // so only near-hits shuffle. The semi-join stays as the exact verify:
    // false positives are re-checked there, false negatives can't happen.
    val bloom = benchSet
      .agg(expr("graft_bloom_agg(xxhash64(shingle))").as("bf")).scalar()
    val nearHits = all.filter(
      call_function("graft_bloom_contains", bloom, xxhash64(col("shingle"))))
    val hits = nearHits.join(benchSet, Seq("shingle"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
    val totals = all.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val out = totals.join(hits, Seq("doc_id"), "left")
      .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
      .withColumn("contamination",
        col("n_hit").cast("double") / col("n_sh").cast("double"))
      .withColumn("flagged",
        when(col("contamination") > 0.5, 1).otherwise(0))
      .select("doc_id", "n_sh", "n_hit", "contamination", "flagged")
    canon(out)
  }

  val contaminationCheckSql: String =
    s"""WITH base AS (
       |  SELECT doc_id, source, lower(text) AS lt, string_split(lower(text), ' ') AS t
       |  FROM documents
       |), sh0 AS (
       |  SELECT doc_id, source, unnest(
       |    CASE WHEN len(t) >= 3
       |      THEN list_transform(range(1, len(t) - 1),
       |                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
       |      ELSE [lt] END) AS shingle
       |  FROM base
       |), sh AS (SELECT DISTINCT doc_id, source, shingle FROM sh0),
       |bench AS (SELECT DISTINCT shingle FROM sh WHERE source = 'src0'),
       |tot AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
       |hit AS (
       |  SELECT s.doc_id, count(*) AS n_hit FROM sh s
       |  WHERE EXISTS (SELECT 1 FROM bench b WHERE b.shingle = s.shingle)
       |  GROUP BY 1)
       |, res AS (
       |  SELECT t.doc_id AS doc_id, t.n_sh, coalesce(h.n_hit, 0) AS n_hit,
       |    CAST(coalesce(h.n_hit, 0) AS DOUBLE) / CAST(t.n_sh AS DOUBLE) AS contamination,
       |    CASE WHEN CAST(coalesce(h.n_hit, 0) AS DOUBLE) / CAST(t.n_sh AS DOUBLE) > 0.5
       |         THEN 1 ELSE 0 END AS flagged
       |  FROM tot t LEFT JOIN hit h ON t.doc_id = h.doc_id)
       |SELECT * FROM res
       |${canonOrderSql(Seq("doc_id", "n_sh", "n_hit", "contamination", "flagged"))}""".stripMargin

  /** Text cleaning: stopword removal + whitespace normalization —
    * emitted as digest + removal stats (full cleaned text stays in the
    * pipeline, the digest keeps the oracle row narrow).
    */
  def cleanText(spark: SparkSession, sfDir: String): DataFrame = {
    val d = load(spark, sfDir, "documents")
    val out = d
      .withColumn("toks", split(lower(col("text")), " "))
      .withColumn("kept", expr(
        s"filter(toks, x -> NOT array_contains(array(${sqlList(stopwords)}), x))"))
      .select(
        col("doc_id"),
        md5(array_join(col("kept"), " ")).as("cleaned_digest"),
        size(col("toks")).as("n_before"),
        size(col("kept")).as("n_after"),
        (size(col("toks")) - size(col("kept"))).as("n_removed"))
    canon(out)
  }

  val cleanTextSql: String =
    s"""WITH c AS (
       |  SELECT doc_id,
       |    string_split(lower(text), ' ') AS toks,
       |    list_filter(string_split(lower(text), ' '),
       |      x -> NOT list_contains([${sqlList(stopwords)}], x)) AS kept
       |  FROM documents
       |)
       |SELECT doc_id,
       |  md5(array_to_string(kept, ' ')) AS cleaned_digest,
       |  len(toks) AS n_before, len(kept) AS n_after,
       |  len(toks) - len(kept) AS n_removed
       |FROM c
       |${canonOrderSql(Seq("doc_id", "cleaned_digest", "n_before", "n_after", "n_removed"))}""".stripMargin

  /** Repetition stats — the Gopher-style within-document repetition
    * signals every pretraining filter uses: duplicate 3-gram fraction
    * (1 − distinct/total) and the most-frequent-token share. One narrow
    * pass + one per-doc aggregation; linear at any scale.
    */
  def repetitionStats(spark: SparkSession, sfDir: String): DataFrame = {
    val d = load(spark, sfDir, "documents")
    val withArrs = d
      .withColumn("t", split(lower(col("text")), " "))
      .withColumn("sh", expr(Dedup.shingleArrayExpr("lower(text)")))
    // top-token share via the token multiset's mode count: explode-free
    // (aggregate over the array) would need a map type; an explode +
    // two-level agg stays one shuffle keyed by doc_id — fine at scale
    val tokCounts = withArrs
      .select(col("doc_id"), explode(col("t")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("top_tok_count"), sum(col("c")).as("n_toks"))
    val shStats = withArrs.select(
      col("doc_id"),
      size(col("sh")).as("n_grams"),
      size(array_distinct(col("sh"))).as("n_distinct_grams"))
    val out = shStats.join(tokCounts, "doc_id")
      .select(
        col("doc_id"), col("n_grams"), col("n_distinct_grams"),
        ((col("n_grams") - col("n_distinct_grams")).cast("double") /
          col("n_grams").cast("double")).as("dup_gram_frac"),
        (col("top_tok_count").cast("double") / col("n_toks").cast("double"))
          .as("top_token_share"))
    canon(out)
  }

  val repetitionStatsSql: String =
    s"""WITH base AS (
       |  SELECT doc_id, lower(text) AS lt, string_split(lower(text), ' ') AS t
       |  FROM documents
       |), grams AS (
       |  SELECT doc_id,
       |    CASE WHEN len(t) >= 3
       |      THEN list_transform(range(1, len(t) - 1),
       |                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
       |      ELSE [lt] END AS sh
       |  FROM base
       |), toks AS (
       |  SELECT doc_id, unnest(t) AS tok FROM base
       |), tc AS (
       |  SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2
       |), tops AS (
       |  SELECT doc_id, max(c) AS top_tok_count, sum(c) AS n_toks
       |  FROM tc GROUP BY 1
       |)
       |SELECT g.doc_id AS doc_id,
       |  len(g.sh) AS n_grams,
       |  len(list_distinct(g.sh)) AS n_distinct_grams,
       |  CAST(len(g.sh) - len(list_distinct(g.sh)) AS DOUBLE)
       |    / CAST(len(g.sh) AS DOUBLE) AS dup_gram_frac,
       |  CAST(t.top_tok_count AS DOUBLE) / CAST(t.n_toks AS DOUBLE) AS top_token_share
       |FROM grams g JOIN tops t ON g.doc_id = t.doc_id
       |${canonOrderSql(Seq("doc_id", "n_grams", "n_distinct_grams",
         "dup_gram_frac", "top_token_share"))}""".stripMargin

  /** PII scrubbing — email/phone redaction, the mandatory pre-training
    * hygiene pass. The synthetic corpus contains no PII, so the query
    * decorates deterministically first (doc_id-derived email/phone
    * appended for two of every three docs), then scrubs with anchored
    * regexes and reports match counts. Regexes stay inside the
    * Java/DuckDB common syntax subset so both engines agree exactly.
    */
  def piiScrub(spark: SparkSession, sfDir: String): DataFrame = {
    val d = load(spark, sfDir, "documents")
    val emailRe = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
    val phoneRe = "[0-9]{3}-[0-9]{4}"
    val k = col("doc_id") % 3
    val decorated = when(k === 0,
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com now")))
      .when(k === 1,
        concat(col("text"), lit(" call 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
      .otherwise(col("text"))
    val base = d.select(col("doc_id"), decorated.as("raw"))
    val out = base.select(
      col("doc_id"),
      regexp_count(col("raw"), lit(emailRe)).cast("int").as("n_emails"),
      regexp_count(col("raw"), lit(phoneRe)).cast("int").as("n_phones"),
      md5(regexp_replace(regexp_replace(col("raw"), emailRe, "<EMAIL>"),
        phoneRe, "<PHONE>")).as("scrubbed_digest"))
    canon(out)
  }

  val piiScrubSql: String =
    s"""WITH base AS (
       |  SELECT doc_id,
       |    CASE CAST(doc_id % 3 AS INT)
       |      WHEN 0 THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
       |      WHEN 1 THEN text || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |      ELSE text END AS raw
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(raw, '[a-z0-9]+@[a-z0-9]+\\.[a-z]+')) AS INT) AS n_emails,
       |  CAST(len(regexp_extract_all(raw, '[0-9]{3}-[0-9]{4}')) AS INT) AS n_phones,
       |  md5(regexp_replace(regexp_replace(raw, '[a-z0-9]+@[a-z0-9]+\\.[a-z]+', '<EMAIL>', 'g'),
       |      '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS scrubbed_digest
       |FROM base
       |${canonOrderSql(Seq("doc_id", "n_emails", "n_phones", "scrubbed_digest"))}""".stripMargin

  /** Mixture sampling — per-source keep rates (the domain-reweighting
    * step that turns a raw crawl into a training mixture), implemented
    * as DETERMINISTIC hash-based sampling: u = first 8 md5 hex digits of
    * a salted doc key as a uniform in [0,1), keep iff u < rate(source).
    * Unlike RNG `sample()`, this is reproducible across runs, engines,
    * partitionings, and retries — the only sampler that is safely
    * resumable at 100 TB — and per-document parallel.
    */
  private val mixtureRates = Seq("src0" -> 0.25, "src1" -> 0.50,
    "src2" -> 0.75, "src3" -> 1.00)

  def mixtureSample(spark: SparkSession, sfDir: String): DataFrame = {
    val d = load(spark, sfDir, "documents")
    val u = expr(
      "CAST(conv(substring(md5(concat('samp:', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT)")
      .cast("double") / lit(4294967296.0)
    val rate = mixtureRates.foldRight(lit(0.0): org.apache.spark.sql.Column) {
      case ((src, r), acc) => when(col("source") === src, lit(r)).otherwise(acc)
    }
    val out = d.select(col("doc_id"), col("source"), u.as("u"), rate.as("rate"))
      .filter(col("u") < col("rate"))
      .select(col("doc_id"), col("source"),
        floor(col("u") * lit(1000000.0)).cast("long").as("u_micro"))
    canon(out)
  }

  val mixtureSampleSql: String = {
    val rateCase = mixtureRates
      .map { case (s, r) => s"WHEN source = '$s' THEN $r" }
      .mkString("CASE ", " ", " ELSE 0.0 END")
    s"""WITH scored AS (
       |  SELECT doc_id, source,
       |    CAST(('0x' || substr(md5('samp:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS DOUBLE)
       |      / 4294967296.0 AS u,
       |    $rateCase AS rate
       |  FROM documents)
       |SELECT doc_id, source,
       |  CAST(floor(u * 1000000.0) AS BIGINT) AS u_micro
       |FROM scored WHERE u < rate
       |${canonOrderSql(Seq("doc_id", "source", "u_micro"))}""".stripMargin
  }

  /** Unicode NFC canonicalization via the native `graft_nfc` kernel.
    * The corpus text is ASCII (already NFC), so the query manufactures
    * the hard cases from the data itself: each document's first token
    * suffixed with decomposed e+COMBINING ACUTE (U+0301), A+COMBINING
    * RING (U+030A), and the ANGSTROM SIGN singleton (U+212B) — NFC must
    * compose the first two and rewrite the third to U+00C5. The oracle
    * face is DuckDB's `nfc_normalize`; digests match only if the two
    * NFC implementations agree byte-for-byte. Length drop (2 per
    * combining pair) is emitted so the composition is visible, not just
    * hashed. Scale: narrow per-row map, shuffle-free.
    */
  def unicodeNormalize(spark: SparkSession, sfDir: String): DataFrame = {
    graft.plans.TextExprs.register(spark)
    val d = load(spark, sfDir, "documents")
    val raw = concat(split(col("text"), " ").getItem(0),
      lit(" cafe\u0301 A\u030a \u212b"))
    val out = d
      .withColumn("raw", raw)
      .withColumn("nfc", call_function("graft_nfc", col("raw")))
      .select(
        col("doc_id"),
        length(col("raw")).as("raw_len"),
        length(col("nfc")).as("nfc_len"),
        md5(col("nfc")).as("nfc_digest"))
    canon(out)
  }

  val unicodeNormalizeSql: String =
    s"""WITH r AS (
       |  SELECT doc_id,
       |    string_split(text, ' ')[1] || ' cafe' || chr(769) || ' A' || chr(778)
       |      || ' ' || chr(8491) AS raw
       |  FROM documents
       |)
       |SELECT doc_id,
       |  length(raw) AS raw_len,
       |  length(nfc_normalize(raw)) AS nfc_len,
       |  md5(nfc_normalize(raw)) AS nfc_digest
       |FROM r
       |${canonOrderSql(Seq("doc_id", "raw_len", "nfc_len", "nfc_digest"))}""".stripMargin

  // ---------------------------------------------------------------------
  // dup_ngram_spans — cross-document repeated-span coverage
  // ---------------------------------------------------------------------

  /** Span width for the repeated-span detector. */
  private val spanN = 5

  /** Cross-document repeated-span coverage: for every document, the
    * fraction of its POSITIONS whose [[spanN]]-gram also appears in at
    * least one OTHER document — the "duplicate text fraction" signal
    * behind exact-substring dedup (boilerplate headers, licence blocks,
    * templated spam all light up here long before whole-doc near-dup
    * fires), and the memorization-risk score a training pipeline caps.
    * Distinct from contamination_check: that measures overlap with a
    * FIXED benchmark set, this measures corpus-internal duplication.
    *
    * Coverage is positional (a doc repeating a shared gram five times
    * has five covered positions), duplication is by DISTINCT doc count
    * (self-repeats inside one doc do not count as cross-doc spans).
    * Ratio in exact µ-units (integer div — no float).
    *
    * Scale: the gram stream is corpus×positions (the shingle
    * discipline); gram frequencies aggregate at DISTINCT-GRAM
    * cardinality. The expensive part is the frequency join back to
    * positions, so a bloom of the shared-gram set pre-filters the
    * position stream BEFORE the exact semi-join (the
    * contamination_check machinery): positions whose gram cannot be
    * shared never shuffle — and since most positions in a clean corpus
    * are NOT duplicated, the bloom drops the bulk of the join input.
    * False positives are re-checked by the exact semi-join; false
    * negatives can't happen, and n_grams comes from the un-filtered
    * persisted stream, so totals are unaffected.
    */
  def dupNgramSpans(spark: SparkSession, sfDir: String): DataFrame = {
    graft.plans.BloomExprs.register(spark)
    val d = load(spark, sfDir, "documents")
    val grams = d
      .select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
      .select(col("doc_id"), expr(
        s"""explode(transform(
           |  if(size(toks) >= $spanN, sequence($spanN, size(toks)), array_repeat(1, 0)),
           |  i -> struct(i AS pos, concat_ws(' ', slice(toks, i - ${spanN - 1}, $spanN)) AS gram))) AS g""".stripMargin))
      .select(col("doc_id"), col("g.pos").as("pos"), col("g.gram").as("gram"))
    val gramsP = Caching.persistOnce(grams)
    // shared grams: present in >= 2 DISTINCT docs (distinct-gram bounded)
    val shared = Caching.persistOnce(
      gramsP.select(col("doc_id"), col("gram")).distinct()
        .groupBy(col("gram")).agg(count(lit(1)).as("nd"))
        .filter(col("nd") >= 2).select(col("gram")))
    val bloom = shared
      .agg(expr("graft_bloom_agg(xxhash64(gram))").as("bf")).scalar()
    val nearHits = gramsP.filter(
      call_function("graft_bloom_contains", bloom, xxhash64(col("gram"))))
    val dupCounts = nearHits
      .join(shared, Seq("gram"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup"))
    val perDoc = gramsP.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"))
      .join(dupCounts, Seq("doc_id"), "left")
      .withColumn("n_dup", coalesce(col("n_dup"), lit(0L)))
    val out = perDoc.select(col("doc_id"), col("n_grams"), col("n_dup"),
      expr("(n_dup * 1000000L) div n_grams").as("dup_micro"))
      .withColumn("flagged",
        when(col("dup_micro") > 500000L, 1).otherwise(0))
    canon(out)
  }

  val dupNgramSpansSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
       |), g AS (
       |  SELECT doc_id, i.i AS pos,
       |    t[i.i - 4] || ' ' || t[i.i - 3] || ' ' || t[i.i - 2] || ' ' ||
       |    t[i.i - 1] || ' ' || t[i.i] AS gram
       |  FROM toks, unnest(generate_series($spanN, len(t))) AS i(i)
       |), shared AS (
       |  SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM g)
       |  GROUP BY gram HAVING count(*) >= 2
       |), agg AS (
       |  SELECT g.doc_id, count(*) AS n_grams,
       |    CAST(sum(CASE WHEN s.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_dup
       |  FROM g LEFT JOIN shared s ON g.gram = s.gram
       |  GROUP BY g.doc_id
       |)
       |SELECT doc_id, n_grams, n_dup,
       |  (n_dup * 1000000) // n_grams AS dup_micro,
       |  CASE WHEN (n_dup * 1000000) // n_grams > 500000 THEN 1 ELSE 0 END
       |    AS flagged
       |FROM agg
       |${canonOrderSql(Seq("doc_id", "n_grams", "n_dup", "dup_micro",
         "flagged"))}""".stripMargin

  // ---------------------------------------------------------------------
  // ngram_novelty — first-occurrence novelty per document
  // ---------------------------------------------------------------------

  /** Novelty floor below which a document is flagged as mostly-seen. */
  private val noveltyFloorMicro = 300000L

  /** Per-document n-gram NOVELTY in doc_id order: the fraction of a
    * document's [[spanN]]-gram positions whose gram first appears in
    * THIS document (min doc_id over the corpus) — the ordered-curation
    * dual of dup_ngram_spans (that asks "how much of me exists
    * elsewhere", this asks "what do I add beyond every earlier doc").
    * Streams deduped in arrival order use exactly this signal to drop
    * low-novelty documents; within-doc repeats of a first-seen gram
    * count novel (the doc introduced them), in exact µ-units.
    *
    * Scale: gram counts aggregate at (doc, gram) grain with map-side
    * partials; first-occurrence is a min at DISTINCT-GRAM cardinality;
    * the join back keys on gram, co-partitioned with the aggregate
    * that produced it. Unlike dup_ngram_spans no bloom helps here —
    * novel grams are the MAJORITY in a clean corpus, so there is no
    * selective side to prefilter; the join is distinct-gram bounded by
    * construction.
    */
  def ngramNovelty(spark: SparkSession, sfDir: String): DataFrame = {
    val d = load(spark, sfDir, "documents")
    val grams = d
      .select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
      .select(col("doc_id"), expr(
        s"""explode(transform(
           |  if(size(toks) >= $spanN, sequence($spanN, size(toks)), array_repeat(1, 0)),
           |  i -> concat_ws(' ', slice(toks, i - ${spanN - 1}, $spanN)))) AS gram""".stripMargin))
      .groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("c"))
    val first = grams.groupBy(col("gram"))
      .agg(min(col("doc_id")).as("first_doc"))
    val out = grams.join(first, Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), col("c"))
          .otherwise(lit(0L))).as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        expr("(n_novel * 1000000L) div n_grams").as("novelty_micro"))
      .withColumn("flagged",
        when(col("novelty_micro") < noveltyFloorMicro, 1).otherwise(0))
    canon(out)
  }

  val ngramNoveltySql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
       |), g AS (
       |  SELECT doc_id,
       |    t[i.i - 4] || ' ' || t[i.i - 3] || ' ' || t[i.i - 2] || ' ' ||
       |    t[i.i - 1] || ' ' || t[i.i] AS gram
       |  FROM toks, unnest(generate_series($spanN, len(t))) AS i(i)
       |), dg AS (
       |  SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2
       |), f AS (
       |  SELECT gram, min(doc_id) AS first_doc FROM dg GROUP BY 1
       |), agg AS (
       |  SELECT dg.doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
       |    CAST(sum(CASE WHEN f.first_doc = dg.doc_id THEN c ELSE 0 END)
       |      AS BIGINT) AS n_novel
       |  FROM dg JOIN f USING (gram) GROUP BY 1
       |)
       |SELECT doc_id, n_grams, n_novel,
       |  (n_novel * 1000000) // n_grams AS novelty_micro,
       |  CASE WHEN (n_novel * 1000000) // n_grams < $noveltyFloorMicro
       |       THEN 1 ELSE 0 END AS flagged
       |FROM agg
       |${canonOrderSql(Seq("doc_id", "n_grams", "n_novel",
         "novelty_micro", "flagged"))}""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ngram_novelty" -> ngramNovelty,
    "unicode_normalize" -> unicodeNormalize,
    "dup_ngram_spans" -> dupNgramSpans,
    "text_stats" -> textStats,
    "lang_id" -> langId,
    "lang_confusion" -> langConfusion,
    "token_count" -> tokenCount,
    "doc_fingerprint" -> docFingerprint,
    "tfidf_topk" -> tfidfTopk,
    "contamination_check" -> contaminationCheck,
    "clean_text" -> cleanText,
    "repetition_stats" -> repetitionStats,
    "pii_scrub" -> piiScrub,
    "mixture_sample" -> mixtureSample)

  val oracles: Map[String, String] = Map(
    "ngram_novelty" -> ngramNoveltySql,
    "unicode_normalize" -> unicodeNormalizeSql,
    "dup_ngram_spans" -> dupNgramSpansSql,
    "text_stats" -> textStatsSql,
    "lang_id" -> langIdSql,
    "lang_confusion" -> langConfusionSql,
    "token_count" -> tokenCountSql,
    "doc_fingerprint" -> docFingerprintSql,
    "tfidf_topk" -> tfidfTopkSql,
    "contamination_check" -> contaminationCheckSql,
    "clean_text" -> cleanTextSql,
    "repetition_stats" -> repetitionStatsSql,
    "pii_scrub" -> piiScrubSql,
    "mixture_sample" -> mixtureSampleSql)
}
