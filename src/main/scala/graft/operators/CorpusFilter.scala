package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.{canon, canonOrderSql, load}

/** The capstone training-data op: a per-document keep/drop verdict
  * combining quality stats, language allow-list, and exact dedup —
  * what an LLM data pipeline runs as its final corpus gate.
  *
  * Rules (first failing rule names the reason):
  *   1. too_short       — n_chars < 150
  *   2. low_diversity   — distinct/total tokens < 0.15
  *   3. bad_lang        — lang not in allow-list
  *   4. duplicate       — not the min doc_id of its exact-text group
  *   5. keep
  */
object CorpusFilter {

  private val allowedLangs = Seq("en", "de", "fr", "es")

  def corpusFilter(spark: SparkSession, sfDir: String): DataFrame = {
    val d = load(spark, sfDir, "documents")
    val w = Window.partitionBy(md5(col("text")))
    val out = d
      .withColumn("toks", split(lower(col("text")), " "))
      .withColumn("diversity",
        size(array_distinct(col("toks"))).cast("double") /
          size(col("toks")).cast("double"))
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .withColumn("reason",
        when(col("n_chars") < 150, "too_short")
          .when(col("diversity") < 0.15, "low_diversity")
          .when(!col("lang").isin(allowedLangs: _*), "bad_lang")
          .when(col("doc_id") =!= col("canonical_id"), "duplicate")
          .otherwise("keep"))
      .select(col("doc_id"), col("lang"), col("n_chars"),
        col("diversity"), col("canonical_id"),
        when(col("reason") === "keep", 1).otherwise(0).as("keep"),
        col("reason"))
    canon(out)
  }

  val corpusFilterSql: String = {
    val langs = allowedLangs.map(l => s"'$l'").mkString(", ")
    s"""WITH base AS (
       |  SELECT doc_id, lang, n_chars, text,
       |    CAST(len(list_distinct(string_split(lower(text), ' '))) AS DOUBLE)
       |      / CAST(len(string_split(lower(text), ' ')) AS DOUBLE) AS diversity,
       |    min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id
       |  FROM documents
       |), verdict AS (
       |  SELECT doc_id, lang, n_chars, diversity, canonical_id,
       |    CASE WHEN n_chars < 150 THEN 'too_short'
       |         WHEN diversity < 0.15 THEN 'low_diversity'
       |         WHEN lang NOT IN ($langs) THEN 'bad_lang'
       |         WHEN doc_id <> canonical_id THEN 'duplicate'
       |         ELSE 'keep' END AS reason
       |  FROM base
       |)
       |SELECT doc_id, lang, n_chars, diversity, canonical_id,
       |  CASE WHEN reason = 'keep' THEN 1 ELSE 0 END AS keep, reason
       |FROM verdict
       |${canonOrderSql(Seq("doc_id", "lang", "n_chars", "diversity",
         "canonical_id", "keep", "reason"))}""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_filter" -> corpusFilter)

  val oracles: Map[String, String] = Map(
    "corpus_filter" -> corpusFilterSql)
}
