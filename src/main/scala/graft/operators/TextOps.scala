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

  val langIdSql: String = {
    val scores = langMarkers.map { case (lang, markers) =>
      s"len(list_filter(string_split(lower(text), ' '), x -> list_contains([${sqlList(markers)}], x))) AS s_$lang"
    }.mkString(",\n  ")
    val langs = langMarkers.map(_._1)
    val chain = langs.map { lang =>
      val cond = langs.filter(_ != lang).map(o => s"s_$lang >= s_$o").mkString(" AND ")
      s"WHEN $cond THEN '$lang'"
    }.mkString(" ")
    s"""WITH scored AS (
       |  SELECT doc_id, lang AS labeled_lang, $scores
       |  FROM documents
       |)
       |SELECT doc_id, labeled_lang, s_en, s_de, s_fr, s_es,
       |  CASE $chain ELSE 'und' END AS predicted_lang
       |FROM scored
       |${canonOrderSql(Seq("doc_id", "labeled_lang", "s_en", "s_de", "s_fr",
         "s_es", "predicted_lang"))}""".stripMargin
  }

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
      .withColumn("shingles", expr(
        """CASE WHEN size(t) >= 3
          |THEN transform(sequence(0, size(t) - 3),
          |               i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))
          |ELSE array(norm) END""".stripMargin))
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_stats" -> textStats,
    "lang_id" -> langId,
    "token_count" -> tokenCount,
    "doc_fingerprint" -> docFingerprint)

  val oracles: Map[String, String] = Map(
    "text_stats" -> textStatsSql,
    "lang_id" -> langIdSql,
    "token_count" -> tokenCountSql,
    "doc_fingerprint" -> docFingerprintSql)
}
