package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.streaming.IndexStream

/** The positional faces' two-phase candidate pushdown (round 12 — the
  * phrase/NEAR twin of the exact-BM25 block-max prune): a phrase match
  * holds EVERY slot term, so the rarest term's doc ids bound the
  * frequent terms' read. Pinned here: bit-identity with the batch face
  * at 1× and 10× posting volume, flat posting-scan rows while the
  * frequent term's postings grow 10× (the df-ratio rule engages on the
  * skewed fixture), and the below-ratio path (uniform dfs) staying
  * bit-identical too.
  */
class PhrasePruneSpec extends SparkSpecBase {

  private def docsOf(ids: Seq[Long]): Seq[Row] = ids.map { id =>
    val rnd = new scala.util.Random(id)
    val filler = Seq.fill(30)(s"w${rnd.nextInt(800)}").mkString(" ")
    val text =
      if (id <= 3L) s"xanchor zcommon $filler"
      else if (id <= 8L) s"xanchor $filler"
      else if (id % 2 == 1) s"zcommon $filler"
      else filler
    Row(id, text, "s")
  }

  private def batchDf(rows: Seq[Row]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), IndexStream.docSchema)

  private val queryText = "xanchor zcommon"

  private def queriesDf = {
    import spark.implicits._
    Seq((900001L, queryText)).toDF("query_id", "text")
  }

  private def keyOf(rs: Seq[Row]): Seq[Seq[Any]] =
    rs.map(_.toSeq.toSeq).sortBy(_.mkString("|"))

  test("skewed dfs engage the prune: flat posting scan under 10x growth, bit-identical to the batch face") {
    val hc = spark.sparkContext.hadoopConfiguration
    val oldBlock = hc.get("parquet.block.size")
    val oldPage = hc.get("parquet.page.size")
    hc.setInt("parquet.block.size", 16 * 1024)
    hc.setInt("parquet.page.size", 2 * 1024)
    try {
      val root = Files.createTempDirectory("graft-phraseprune").toString
      val state = s"$root/state"
      var corpus: Seq[Long] = Seq.empty
      def seed(ids: Seq[Long], batchId: Long): Unit = {
        corpus = corpus ++ ids
        IndexStream.applyBatch(spark, state, batchDf(docsOf(ids)), batchId)
      }
      def want(): Seq[Seq[Any]] = {
        val d = batchDf(docsOf(corpus))
          .unionByName(spark.createDataFrame(
            spark.sparkContext.parallelize(
              Seq(Row(900001L, queryText, "src0"))), IndexStream.docSchema))
          .select(col("doc_id"), col("source"), col("text"))
        val w = keyOf(graft.operators.CorpusOps.phraseMatchOn(d)
          .collect().toSeq)
        spark.catalog.clearCache()
        w
      }
      def got(): (Seq[Seq[Any]], Long) = {
        val (rows, n) = scanRowsDuring("/postings") {
          IndexStream.queryPhrase(spark, state, queriesDf).collect().toSeq
        }
        spark.catalog.clearCache()
        (keyOf(rows), n)
      }
      seed(1L to 500L, 0L)
      val (g1, p1) = got()
      val w1 = want()
      assert(w1.nonEmpty, "fixture must produce phrase matches")
      assert(g1 == w1, "1x: index face must equal the batch face")

      seed(501L to 5000L, 1L)
      val (g10, p10) = got()
      assert(g10 == want(), "10x: index face must equal the batch face")
      info(s"posting-scan rows 1x=$p1 10x=$p10")
      // zcommon's postings grow ~10x (~250 -> ~2500 docs); with the
      // candidate pushdown the surviving row groups track xanchor's
      // FIXED 8 docs
      assert(p10 <= p1 * 3 + 64,
        s"positional posting scan grew with the frequent term " +
          s"(1x=$p1, 10x=$p10) — the rarest-term candidate pushdown " +
          "is not reaching the row-group stats")

      // the sloppy NEAR grade rides the same fetch
      val nearGot = keyOf(IndexStream.queryNear(spark, state, queriesDf,
        sloppy = true).collect().toSeq)
      val dRef = batchDf(docsOf(corpus))
        .unionByName(spark.createDataFrame(
          spark.sparkContext.parallelize(
            Seq(Row(900001L, queryText, "src0"))), IndexStream.docSchema))
        .select(col("doc_id"), col("source"), col("text"))
      val nearWant = keyOf(graft.operators.CorpusOps.nearMatchOn(dRef,
        sloppy = true).collect().toSeq)
      spark.catalog.clearCache()
      assert(nearGot == nearWant,
        "sloppy NEAR must stay bit-identical under the prune")
    } finally {
      if (oldBlock == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", oldBlock)
      if (oldPage == null) hc.unset("parquet.page.size")
      else hc.set("parquet.page.size", oldPage)
    }
  }

  test("uniform dfs stay on the single-fetch path and bit-identical") {
    // both phrase terms near-equal df: the ratio rule must NOT engage
    // (no second fetch to repay) and results are unchanged
    val root = Files.createTempDirectory("graft-phraseflat").toString
    val state = s"$root/state"
    val rows = (1L to 60L).map { id =>
      val t =
        if (id % 5 == 0) s"aterm bterm pad$id fill"
        else if (id % 2 == 0) s"aterm pad$id fill pad"
        else s"bterm pad$id fill pad"
      Row(id, t, "s")
    }
    IndexStream.applyBatch(spark, state, batchDf(rows), 0L)
    import spark.implicits._
    val q = Seq((900L, "aterm bterm")).toDF("query_id", "text")
    val got = keyOf(IndexStream.queryPhrase(spark, state, q)
      .collect().toSeq)
    val d = batchDf(rows)
      .unionByName(spark.createDataFrame(
        spark.sparkContext.parallelize(
          Seq(Row(900L, "aterm bterm", "src0"))), IndexStream.docSchema))
      .select(col("doc_id"), col("source"), col("text"))
    val want = keyOf(graft.operators.CorpusOps.phraseMatchOn(d)
      .collect().toSeq)
    spark.catalog.clearCache()
    assert(want.nonEmpty && got == want,
      "uniform-df phrase must stay bit-identical on the single fetch")
  }
}
