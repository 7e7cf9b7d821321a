package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.CorpusOps
import graft.streaming.IndexStream

/** Field-restricted phrase retrieval (round 14): a phrase must lie
  * ENTIRELY within its field of the title ++ body stream — straddling
  * runs match neither field (but do match the unfielded face), and
  * the index face consumes the STORED v7 boundary.
  */
class PhraseFieldSpec extends SparkSpecBase {

  private def fieldedDocs(
      rows: Seq[(Long, String, String, String)]): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("title", StringType, nullable = false),
      StructField("text", StringType, nullable = false),
      StructField("source", StringType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (id, ti, t, s) => Row(id, ti, t, s) }, 2), schema)
  }

  // query phrase: "aa bb". doc 1: in TITLE; doc 2: in BODY (twice);
  // doc 3: STRADDLES the seam (title ends "aa", body starts "bb");
  // doc 4: neither.
  private val corpus = Seq(
    (100L, "zz zz", "aa bb", "src0"),
    (1L, "aa bb", "pad pad pad", "src1"),
    (2L, "tt tt", "aa bb pad aa bb", "src1"),
    (3L, "tt aa", "bb pad pad", "src1"),
    (4L, "aa tt", "pad bb aa", "src1"))

  test("title face matches only title-internal runs; straddle excluded") {
    val got = CorpusOps.phraseFieldMatchOn(fieldedDocs(corpus),
        len = 2, field = "title")
      .select("doc_id", "n_occ").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L),
      s"title phrase must match doc 1 only (straddle doc 3 excluded): $got")
  }

  test("body face matches only body-internal runs, with exact counts") {
    val got = CorpusOps.phraseFieldMatchOn(fieldedDocs(corpus),
        len = 2, field = "body")
      .select("doc_id", "n_occ").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(2L -> 2L),
      s"body phrase must match doc 2 twice (straddle excluded): $got")
  }

  test("the unfielded face over the same stream DOES match the straddling run — the restriction is what changes") {
    // concat title+text as the single-text stream the unfielded face
    // sees — train docs only (the query's phrase is its own leading
    // bigram, not its title's)
    val flat = fieldedDocs(corpus)
      .withColumn("text",
        when(col("source") === "src0", col("text"))
          .otherwise(concat_ws(" ", col("title"), col("text"))))
      .drop("title")
    val got = CorpusOps.phraseMatchOn(flat, len = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L),
      s"unfielded phrase must also match the straddling doc 3: $got")
  }

  test("index face consumes the stored boundary: bit-identical to the batch face across two generations and a delete") {
    import spark.implicits._
    val d = fieldedDocs(corpus)
    val root = Files.createTempDirectory("graft-phrf").toString
    val state = s"$root/state"
    IndexStream.applyBatch(spark, state,
      d.filter(col("source") =!= "src0").filter(col("doc_id") <= 2L), 0L)
    IndexStream.applyBatch(spark, state,
      d.filter(col("source") =!= "src0").filter(col("doc_id") > 2L), 1L)
    val q = d.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"), col("text"))
    val cols = Seq("query_id", "rank", "doc_id", "n_occ")
    for (f <- Seq("title", "body")) {
      val batch = CorpusOps.phraseFieldMatchOn(d, len = 2, field = f)
        .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
      val index = IndexStream.queryPhraseFielded(spark, state, q,
          len = 2, field = f)
        .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
      assert(batch == index && batch.nonEmpty,
        s"$f: index face must equal the batch face: $batch vs $index")
    }
    // delete the only title match: the title face goes empty, exactly
    IndexStream.deleteDocs(spark, state, Seq(1L).toDF("doc_id"), 0L)
    val after = IndexStream.queryPhraseFielded(spark, state, q,
        len = 2, field = "title").collect()
    assert(after.isEmpty,
      s"post-delete title phrase must have no survivors: ${after.toSeq}")
  }
}
