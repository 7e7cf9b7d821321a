package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.CorpusOps
import graft.streaming.IndexStream

/** Faceted search (search_facets / search_facets_index): counts over
  * the FULL match set per facet value, the id-server/attribute-store
  * split, and batch/index bit-identity.
  */
class SearchFacetsSpec extends SparkSpecBase {

  private def docs(rows: Seq[(Long, String, String, String)]): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = false),
      StructField("source", StringType, nullable = false),
      StructField("lang", StringType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (id, t, s, l) => Row(id, t, s, l) }, 2), schema)
  }

  // Query 100 selects "rare" (the only uncapped term it holds: pad and
  // fill are head terms). Match set = docs 1, 2, 3 -> en:2, de:1.
  private val fixture = Seq(
    (100L, "rare pad fill", "src0", "en"),
    (1L, "rare pad fill", "src1", "en"),
    (2L, "rare fill pad", "src1", "de"),
    (3L, "rare pad pad", "src1", "en"),
    (4L, "pad fill pad", "src1", "en"),
    (5L, "pad fill fill", "src1", "de"),
    (6L, "fill pad fill", "src1", "de"),
    (7L, "pad pad fill", "src1", "en"))

  private def out(df: DataFrame): Set[(Long, Int, String, Long)] =
    df.select("query_id", "rank", "lang", "n_docs").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .toSet

  test("facet counts cover the FULL match set, not the top-k") {
    val got = out(CorpusOps.searchFacetsOn(docs(fixture)))
    assert(got == Set((100L, 1, "en", 2L), (100L, 2, "de", 1L)),
      s"facet rollup wrong: $got")
  }

  test("index face is bit-identical; attributes come from the doc table") {
    val d = docs(fixture)
    val root = Files.createTempDirectory("graft-facet").toString
    val state = s"$root/state"
    IndexStream.applyBatch(spark, state,
      d.filter(col("source") =!= "src0")
        .select("doc_id", "text", "source"), 0L)
    val q = d.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"), col("text"))
    val matches = IndexStream.queryMatches(spark, state, q)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(matches == Set((100L, 1L), (100L, 2L), (100L, 3L)),
      s"index match set wrong: $matches")
  }

  test("tombstoned docs drop out of the facet counts") {
    import spark.implicits._
    val d = docs(fixture)
    val root = Files.createTempDirectory("graft-facet2").toString
    val state = s"$root/state"
    IndexStream.applyBatch(spark, state,
      d.filter(col("source") =!= "src0")
        .select("doc_id", "text", "source"), 0L)
    IndexStream.deleteDocs(spark, state, Seq(2L).toDF("doc_id"), 1L)
    val q = d.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"), col("text"))
    val matches = IndexStream.queryMatches(spark, state, q)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(matches == Set((100L, 1L), (100L, 3L)),
      s"deleted doc must leave the match set: $matches")
  }
}
