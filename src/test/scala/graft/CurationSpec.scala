package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Curation

/** The composed curation verdict face: a doc caught ONLY by the vector
  * gate (paraphrase: same embedding, disjoint wording), a doc caught
  * ONLY by the text gate (near-identical shingles, orthogonal
  * embedding), and a kept_id chain that crosses gates (a vector-dup of
  * a text-dup must resolve to the text-dup's own keep representative).
  */
class CurationSpec extends SparkSpecBase {

  private val t1 =
    "the quick brown fox jumps over the lazy dog near the quiet river bank today"
  private val t3 =
    "completely different content about database engines and query planners in distributed systems"
  private val t4 =
    "unrelated weather report with sunny skies and mild winds across the coast"
  private val t5 =
    "numbers and tables fill the ledger while auditors check the totals twice"

  private def unit(axis: Int): Seq[Double] =
    (0 until 64).map(i => if (i == axis) 1.0 else 0.0)

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("embedding", ArrayType(DoubleType))))

  test("text-only, vector-only, and cross-gate chained drops resolve to flag-free representatives") {
    val corpus = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        // 1: the base doc
        Row(1L, t1, unit(0)),
        // 2: near-identical SHINGLES, ORTHOGONAL embedding → text-only
        Row(2L, t1 + " again", unit(1)),
        // 3: disjoint wording, SAME embedding as 1 → vector-only
        Row(3L, t3, unit(0)),
        // 4: unrelated in both modalities → keep
        Row(4L, t4, unit(2)),
        // 5: disjoint wording, embedding = doc 2's → a VECTOR dup of a
        // TEXT dup; kept_id must chain through 2 to 1
        Row(5L, t5, unit(1).map(_ * 0.9)))),
      schema)
    val rows = Curation.curationVerdictsOn(corpus).collect()
      .map(r => r.getLong(0) -> ((r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        r.getInt(3), r.getInt(4)))).toMap

    assert(rows(1L) == (("keep", -1L, 0, 0)))
    assert(rows(4L) == (("keep", -1L, 0, 0)))
    assert(rows(2L) == (("drop", 1L, 1, 0)),
      s"doc 2 must be a text-only drop toward 1: ${rows(2L)}")
    assert(rows(3L) == (("drop", 1L, 0, 1)),
      s"doc 3 must be a vector-only drop toward 1: ${rows(3L)}")
    // the cross-gate chain: 5 is flagged (vector) only against 2, whose
    // own verdict is a TEXT drop toward 1 — per-gate resolution would
    // hand a writer the discarded doc 2
    assert(rows(5L) == (("drop", 1L, 0, 1)),
      s"doc 5 must chain-resolve across gates to 1: ${rows(5L)}")
  }

  test("sfDir face joins documents to embeddings and emits one verdict per corpus doc") {
    val out = Curation.curationVerdicts(spark, sf)
    val n = graft.Tables.load(spark, sf, "documents")
      .join(graft.Tables.load(spark, sf, "embeddings")
        .select(col("vec_id").as("doc_id")), Seq("doc_id")).count()
    assert(out.count() == n, "one verdict row per document-with-embedding")
    assert(out.filter(col("verdict") === "drop").count() > 0,
      "the sf0.001 corpus contains seeded near-dups; none were dropped")
    // every kept_id a writer dereferences must itself be a keep
    val bad = out.filter(col("verdict") === "drop").as("d")
      .join(out.filter(col("verdict") === "drop").select(
        col("doc_id").as("kept_id")).as("k"), Seq("kept_id"), "left_semi")
      .count()
    assert(bad == 0, "a drop's kept_id points at another dropped doc")
    spark.catalog.clearCache()
  }
}
