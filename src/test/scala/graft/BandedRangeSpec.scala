package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.CorpusOps
import graft.streaming.IndexStream

/** BANDED range pruning (round 15) — the round-14 residual closed: a
  * query set spanning the whole lexicon defeats a single [min, max]
  * fallback range (it prunes nothing), so the fallback scans now cut
  * the set into ≤ 64 contiguous bands at the largest vocabulary gaps
  * and push the OR of band ranges. These specs build FULL-SPAN query
  * sets (clusters at both ends of the alphabet) over a mid-alphabet
  * vocabulary that grows 10×, and assert the fallback scans stay flat
  * while remaining bit-identical to the unpruned/batch answers.
  */
class BandedRangeSpec extends SparkSpecBase {

  private def docs(rows: Seq[(Long, String, String)]): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = false),
      StructField("source", StringType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (id, t, s) => Row(id, t, s) }, 4), schema)
  }

  private def withSmallRowGroups[T](f: => T): T = {
    val hc = spark.sparkContext.hadoopConfiguration
    val oldBlock = hc.get("parquet.block.size")
    val oldPage = hc.get("parquet.page.size")
    hc.setInt("parquet.block.size", 16 * 1024)
    hc.setInt("parquet.page.size", 2 * 1024)
    try f finally {
      if (oldBlock == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", oldBlock)
      if (oldPage == null) hc.unset("parquet.page.size")
      else hc.set("parquet.page.size", oldPage)
    }
  }

  private def withPushdownMax[T](v: Int)(f: => T): T = {
    val old = sys.props.get("graft.pushdown.max")
    sys.props("graft.pushdown.max") = v.toString
    try f finally old.fold { sys.props -= "graft.pushdown.max"; () } {
      x => sys.props("graft.pushdown.max") = x; ()
    }
  }

  test("full-span prefix seeds: banded seed ranges keep the fallback dfs scan off the mid-alphabet vocabulary") {
    withSmallRowGroups {
      // 286 DISTINCT seed prefixes clustered at BOTH alphabet ends
      // (aa..jz and za..zz) — past prefixOrMax (256) so the expansion
      // takes the fallback, and spanning a..z so the round-14 single
      // [min, max] range would cover the ENTIRE lexicon and prune
      // nothing; the m* vocabulary between the clusters grows 10x
      val prefixes = (for (c1 <- 'a' to 'j'; c2 <- 'a' to 'z')
        yield s"$c1$c2") ++ ('a' to 'z').map(c2 => s"z$c2")
      val pfxDocs = prefixes.zipWithIndex.map { case (p, i) =>
        (1000L + i, s"${p}x common", "src1")
      }
      def noise(ids: Seq[Long]): Seq[(Long, String, String)] = ids.map {
        id =>
          val rnd = new scala.util.Random(id)
          (100000L + id, (0 until 6).map(_ => s"mw${rnd.nextInt(3000)}")
            .mkString(" "), "src1")
      }
      val qRows = prefixes.zipWithIndex.map { case (p, i) =>
        (9000L + i, s"${p}x offvocab", "src0")
      }
      val root = Files.createTempDirectory("graft-band-pfx").toString
      val state = s"$root/state"
      var corpus = pfxDocs ++ noise(1L to 200L)
      IndexStream.applyBatch(spark, state, docs(corpus), 0L)
      import spark.implicits._
      val q = qRows.map { case (id, t, _) => (id, t) }
        .toDF("query_id", "text")
      val cols = Seq("query_id", "rank", "doc_id", "score_micro",
        "n_terms")
      def got(): (Set[Seq[Any]], Long) = {
        val r = scanRowsDuring("/dfs") {
          IndexStream.queryPrefix(spark, state, q, len = 2, max = 4)
            .select(cols.head, cols.tail: _*)
            .collect().map(_.toSeq).toSet
        }
        spark.catalog.clearCache()
        r
      }
      def want(): Set[Seq[Any]] = {
        val w = CorpusOps.prefixTopkOn(docs(corpus ++ qRows),
            len = 2, max = 4)
          .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
        spark.catalog.clearCache()
        w
      }
      val (g1, d1) = got()
      assert(g1.nonEmpty && g1 == want(),
        "full-span fallback must stay bit-identical to the batch face")
      val grow = noise(201L to 2200L)
      corpus = corpus ++ grow
      IndexStream.applyBatch(spark, state, docs(grow), 1L)
      val (g10, d10) = got()
      assert(g10 == want(),
        "10x: full-span fallback must equal the batch face")
      info(s"dfs-scan rows full-span 1x=$d1 10x=$d10")
      // the second generation legitimately re-reads the seed bands'
      // row groups once more; what must NOT happen is the scan
      // following the mid-alphabet vocabulary's 10x growth — which is
      // exactly what the single [min(aa), next(zz)) range would read
      assert(d10 <= d1 * 3 + 512,
        s"full-span fallback dfs scan grew with the mid-alphabet " +
          s"vocabulary (1x=$d1, 10x=$d10) — seed banding is not " +
          "reaching the row-group stats")
    }
  }

  test("full-span bm25 term set: banded term ranges keep the fallback dfs and posting scans off the mid-alphabet vocabulary") {
    withSmallRowGroups {
      // the query's terms cluster at BOTH alphabet ends; the m*
      // vocabulary between them grows 10x. pushdown.max = 4 forces
      // both the dfs fetch (5 distinct terms > 4) and the posting
      // fetch (selected terms x 2 generations > 4) onto their
      // fallback paths, whose round-14 single [aq1, zq2] range would
      // cover every m* row group
      def rowsOf(ids: Seq[Long]): Seq[(Long, String, String)] = ids.map {
        id =>
          val rnd = new scala.util.Random(id)
          val filler = (0 until 6).map(_ => s"mw${rnd.nextInt(3000)}")
            .mkString(" ")
          if (id <= 8L)
            (id, s"aq${1 + id % 2} zq${1 + id % 2} $filler", "src1")
          else (id, filler, "src1")
      }
      val root = Files.createTempDirectory("graft-band-term").toString
      val state = s"$root/state"
      IndexStream.applyBatch(spark, state, docs(rowsOf(1L to 150L)), 0L)
      IndexStream.applyBatch(spark, state,
        docs(rowsOf(151L to 300L)), 1L)
      import spark.implicits._
      val q = Seq((900001L, "aq1 aq2 zq1 zq2 offvocab"))
        .toDF("query_id", "text")
      val cols = Seq("query_id", "rank", "doc_id", "score_micro",
        "n_terms")
      def run(): Set[Seq[Any]] =
        IndexStream.queryTopK(spark, state, q)
          .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
      val unforced = { val r = run(); spark.catalog.clearCache(); r }
      def got(): (Set[Seq[Any]], Long, Long) = withPushdownMax(4) {
        val ((r, dp), dd) = scanRowsDuring("/dfs") {
          scanRowsDuring("/postings")(run())
        }
        spark.catalog.clearCache()
        (r, dd, dp)
      }
      val (g1, d1, p1) = got()
      assert(g1.nonEmpty && g1 == unforced,
        s"fallback must stay bit-identical to the pushdown path: " +
          s"$g1 vs $unforced")
      IndexStream.applyBatch(spark, state,
        docs(rowsOf(301L to 3000L)), 2L)
      val unforced10 = { val r = run(); spark.catalog.clearCache(); r }
      val (g10, d10, p10) = got()
      assert(g10 == unforced10,
        "10x: fallback must equal the pushdown path")
      info(s"full-span scans dfs 1x=$d1 10x=$d10 postings 1x=$p1 10x=$p10")
      // one more generation adds one more band row-group set; the m*
      // volume (10x) must stay outside the bands on BOTH scans
      assert(d10 <= d1 * 3 + 512,
        s"fallback dfs scan grew with the mid-alphabet vocabulary " +
          s"(1x=$d1, 10x=$d10)")
      assert(p10 <= p1 * 3 + 256,
        s"fallback posting scan grew with the mid-alphabet vocabulary " +
          s"(1x=$p1, 10x=$p10)")
    }
  }
}
