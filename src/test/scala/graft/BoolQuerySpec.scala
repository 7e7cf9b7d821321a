package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.CorpusOps
import graft.streaming.IndexStream

/** Boolean retrieval (bool_topk / bool_index_topk): MUST conjunction,
  * MUST NOT exclusion, BM25 µ-score ranking over the matches — and
  * bit-identity between the batch face and the incremental index face.
  */
class BoolQuerySpec extends SparkSpecBase {

  private def docs(rows: Seq[(Long, String, String)]): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = false),
      StructField("source", StringType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (id, t, s) => Row(id, t, s) }, 2), schema)
  }

  private def out(df: DataFrame): Set[(Long, Int, Long, Long)] =
    df.select("query_id", "rank", "doc_id", "n_terms").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet

  // Derivation on this fixture: query 100's terms ranked df-asc are
  // "rare" (df=3), "mid" (df=4), "common" (df=5) -> must = {rare, mid},
  // mustNot = common.
  private val fixture = Seq(
    (100L, "rare mid common", "src0"),
    (1L, "rare mid fill pad", "src1"),    // both musts, no common
    (2L, "rare mid common fill", "src1"), // both musts but excluded
    (3L, "common fill pad zz", "src1"),   // mustNot only
    (4L, "mid common fill pad", "src1"),  // one must only
    (5L, "rare mid pad pad zz", "src1"),  // both musts, no common
    (6L, "common fill zz pad", "src1"),   // mustNot only
    (7L, "common fill zz zz", "src1"))    // mustNot only

  test("conjunction matches ALL must terms; exclusion drops mustNot docs") {
    val got = out(CorpusOps.boolTopkOn(docs(fixture)))
    // docs 1 and 5 match (both musts, no common); 2 is excluded by
    // "common"; 3/4 hold only one must; 6 holds none
    assert(got.map(_._3) == Set(1L, 5L), s"match set wrong: $got")
    assert(got.forall(_._4 == CorpusOps.boolMustTerms),
      s"n_terms must equal the conjunct count: $got")
  }

  test("ranking is the exact µ-score sum over the must terms") {
    val o = CorpusOps.boolTopkOn(docs(fixture))
      .select("query_id", "rank", "doc_id", "score_micro").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    // doc 5 (dl=5) vs doc 1 (dl=4): same tf for both musts, shorter
    // doc scores higher under length normalization
    assert(o.map(_._2).toSeq == Seq(1L, 5L),
      s"rank order must follow the µ-score: ${o.toSeq}")
    assert(o(0)._3 > o(1)._3, s"doc 1 must outscore doc 5: ${o.toSeq}")
  }

  test("a query with fewer than boolMustTerms in-vocabulary terms matches nothing") {
    val d = docs(fixture :+ (200L, "rare offvocab0 offvocab1", "src0"))
    val got = CorpusOps.boolTopkOn(d)
      .filter(col("query_id") === 200L).count()
    assert(got == 0L, "an undefined conjunction must match nothing")
  }

  test("index face is bit-identical to the batch face (fixture and corpus)") {
    val d = docs(fixture)
    val root = Files.createTempDirectory("graft-bool").toString
    val state = s"$root/state"
    IndexStream.applyBatch(spark, state,
      d.filter(col("source") =!= "src0"), 0L)
    val q = d.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"), col("text"))
    val batch = CorpusOps.boolTopkOn(d)
      .select("query_id", "rank", "doc_id", "score_micro", "n_terms")
      .collect().map(_.toSeq).toSet
    val index = IndexStream.queryBool(spark, state, q)
      .select("query_id", "rank", "doc_id", "score_micro", "n_terms")
      .collect().map(_.toSeq).toSet
    assert(batch == index, "index face must equal the batch face")
    assert(batch.nonEmpty, "fixture must produce matches")
  }

  test("no mustNot term (2-term query) means pure conjunction — and zero exclusion fetch") {
    val d = docs(Seq(
      (100L, "rare mid", "src0"),
      (1L, "rare mid pad", "src1"),
      (2L, "rare pad pad", "src1"),
      (3L, "rare mid rare", "src1")))
    val got = out(CorpusOps.boolTopkOn(d))
    assert(got.map(_._3) == Set(1L, 3L), s"pure conjunction wrong: $got")
    val root = Files.createTempDirectory("graft-bool2").toString
    val state = s"$root/state"
    IndexStream.applyBatch(spark, state,
      d.filter(col("source") =!= "src0"), 0L)
    val q = d.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"), col("text"))
    assert(out(IndexStream.queryBool(spark, state, q)).map(_._3) ==
      Set(1L, 3L), "index face pure conjunction wrong")
  }

  test("rarest-must pushdown: flat posting scan under 10x growth of the frequent must and mustNot terms; bit-identical to the batch face") {
    // the conjunction twin of the positional prune (round 12): must =
    // {xanchor (df 8), zcommon (~25%)}, mustNot = zexclude (~40%) —
    // the frequent must term's read is bounded by xanchor's docs, the
    // exclusion read by the conjunction's ids
    val hc = spark.sparkContext.hadoopConfiguration
    val oldBlock = hc.get("parquet.block.size")
    val oldPage = hc.get("parquet.page.size")
    hc.setInt("parquet.block.size", 16 * 1024)
    hc.setInt("parquet.page.size", 2 * 1024)
    try {
      def rowsOf(ids: Seq[Long]): Seq[(Long, String, String)] = ids.map { id =>
        val rnd = new scala.util.Random(id)
        val filler = (0 until 25).map(_ => s"w${rnd.nextInt(800)}")
          .mkString(" ")
        // df order asc: xanchor (8) < zmust (~25%) < zstop (~50%), so
        // must = {xanchor, zmust}, mustNot = zstop
        val t =
          if (id <= 5L) s"xanchor zmust $filler"          // conj match
          else if (id <= 8L) s"xanchor zmust zstop $filler" // excluded
          else if (id % 4 == 1) s"zmust $filler"
          else if (id % 2 == 0) s"zstop $filler"
          else filler
        (id, t, "s")
      }
      val root = Files.createTempDirectory("graft-boolprune").toString
      val state = s"$root/state"
      var corpus: Seq[Long] = Seq.empty
      def seed(ids: Seq[Long], batchId: Long): Unit = {
        corpus = corpus ++ ids
        IndexStream.applyBatch(spark, state,
          docs(rowsOf(ids)), batchId)
      }
      val qRow = Seq((900001L, "xanchor zmust zstop", "src0"))
      def want(): Set[(Long, Int, Long, Long)] = {
        val w = out(CorpusOps.boolTopkOn(docs(rowsOf(corpus) ++ qRow)))
        spark.catalog.clearCache()
        w
      }
      def got(): (Set[(Long, Int, Long, Long)], Long) = {
        import spark.implicits._
        val q = Seq((900001L, "xanchor zmust zstop"))
          .toDF("query_id", "text")
        val (rows, n) = scanRowsDuring("/postings") {
          out(IndexStream.queryBool(spark, state, q))
        }
        spark.catalog.clearCache()
        (rows, n)
      }
      seed(1L to 500L, 0L)
      val (g1, p1) = got()
      val w1 = want()
      assert(w1.nonEmpty && w1.forall(t => t._3 <= 5L),
        s"fixture must conjoin on docs 1..5: $w1")
      assert(g1 == w1, "1x: index face must equal the batch face")
      seed(501L to 5000L, 1L)
      val (g10, p10) = got()
      assert(g10 == want(), "10x: index face must equal the batch face")
      info(s"posting-scan rows 1x=$p1 10x=$p10")
      assert(p10 <= p1 * 3 + 64,
        s"boolean posting scan grew with the frequent terms " +
          s"(1x=$p1, 10x=$p10) — the rarest-must/conjunction pushdown " +
          "is not reaching the row-group stats")
    } finally {
      if (oldBlock == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", oldBlock)
      if (oldPage == null) hc.unset("parquet.page.size")
      else hc.set("parquet.page.size", oldPage)
    }
  }

  test("deletes apply: a tombstoned doc stops matching the boolean face") {
    import spark.implicits._
    val d = docs(fixture)
    val root = Files.createTempDirectory("graft-bool3").toString
    val state = s"$root/state"
    IndexStream.applyBatch(spark, state,
      d.filter(col("source") =!= "src0"), 0L)
    IndexStream.deleteDocs(spark, state, Seq(1L).toDF("doc_id"), 1L)
    val q = d.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"), col("text"))
    val got = out(IndexStream.queryBool(spark, state, q))
    assert(got.map(_._3) == Set(5L),
      s"deleted doc 1 must stop matching: $got")
  }

  test("driver must-set derivation survives duplicate dfs rows with equal df but different max_tf (ADVICE r12)") {
    // corpus: aa in docs 1-6 (df 6), bb in docs 1-4 (df 4), cc in
    // docs 1-7 (df 7); per-doc filler keeps the rest of the
    // vocabulary unique. Query: "aa bb cc".
    val rows = (1L to 10L).map { i =>
      val terms = Seq(
        if (i <= 6) Some("aa") else None,
        if (i <= 4) Some("bb") else None,
        if (i <= 7) Some("cc") else None,
        Some(s"zz$i")).flatten
      (i, terms.mkString(" "), "src1")
    } :+ ((100L, "aa bb cc", "src0"))
    val d = docs(rows)
    val root = Files.createTempDirectory("graft-booldup").toString
    val state = s"$root/state"
    IndexStream.applyBatch(spark, state,
      d.filter(col("source") =!= "src0"), 0L)
    // inject a SECOND dfs row for "bb" into its own generation dir
    // with the SAME df but a DIFFERENT max_tf (a stale-high impact
    // bound is always legal). dfsRowsFor's (term, df, max_tf, gen)
    // distinct keeps both rows, so every Spark-side consumer sums
    // df("bb") = 8 — a (term, gen, df)-grain driver map would still
    // see 4, flip the rarest order between the driver's must set
    // ({bb, aa}) and the trank window's ({aa, cc}), and the engaged
    // fetch would omit cc's postings: the conjunction silently
    // empties (the pre-fix failure mode this pins)
    val dupSchema = StructType(Seq(
      StructField("term", StringType),
      StructField("df", LongType),
      StructField("max_tf", LongType),
      StructField("gen", LongType)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row("bb", 4L, 2L, 0L)), 1),
        dupSchema)
      .write.mode("append")
      .parquet(s"$state/dfs/dpfx=${IndexStream.dpfxOf("bb")}/ingest=0")
    spark.catalog.refreshByPath(s"$state/dfs")
    val q = d.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"), col("text"))
    val got = IndexStream.queryBool(spark, state, q)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // with df(bb) = 8 corpus-wide the window ranks aa(6), cc(7),
    // bb(8): must = {aa, cc}, exclusion = bb -> (aa ∧ cc) \ bb
    assert(got == Set(5L, 6L), s"conjunction lost matches: $got")
  }
}
