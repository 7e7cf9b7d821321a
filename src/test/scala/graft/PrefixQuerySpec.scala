package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.CorpusOps
import graft.streaming.IndexStream

/** Prefix retrieval (bm25_prefix_topk / bm25_prefix_index): the
  * fixed-width expansion rule, the rarest-first expansion cap, the
  * blended multi-term scoring, and batch/index bit-identity.
  */
class PrefixQuerySpec extends SparkSpecBase {

  private def docs(rows: Seq[(Long, String, String)]): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = false),
      StructField("source", StringType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (id, t, s) => Row(id, t, s) }, 2), schema)
  }

  private def out(df: DataFrame): Set[(Long, Long, Long)] =
    df.select("query_id", "doc_id", "n_terms").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  // df: apricot=1, april=1, apple=2; pad/fill are frequent noise.
  // Query 100's only in-vocabulary term is "apple" -> seed, prefix
  // "ap" at len=2 -> expansion {apricot, april, apple} rarest-first.
  private val fixture = Seq(
    (100L, "apple offvocab", "src0"),
    (1L, "apple pad pad", "src1"),
    (2L, "apricot pad fill", "src1"),
    (3L, "april apple fill", "src1"),
    (4L, "pad fill pad", "src1"))

  test("expansion scores every completion of the prefix") {
    val got = out(CorpusOps.prefixTopkOn(docs(fixture), len = 2, max = 4))
    // doc1 matches via apple (1 term), doc2 via apricot, doc3 via
    // april AND apple (2 terms), doc4 not at all
    assert(got == Set((100L, 1L, 1L), (100L, 2L, 1L), (100L, 3L, 2L)),
      s"expansion semantics wrong: $got")
  }

  test("the expansion cap keeps the RAREST completions (the seed itself can drop)") {
    val got = out(CorpusOps.prefixTopkOn(docs(fixture), len = 2, max = 2))
    // rarest-first: apricot(df=1), april(df=1) survive; apple(df=2)
    // truncates out -> doc1 no longer matches, doc3 matches on april only
    assert(got == Set((100L, 2L, 1L), (100L, 3L, 1L)),
      s"expansion cap wrong: $got")
  }

  test("a seed shorter than the prefix width expands only to itself") {
    val d = docs(Seq(
      (100L, "a offvocab", "src0"),
      (1L, "a pad", "src1"),
      (2L, "apple pad", "src1"),
      (3L, "pad pad", "src1")))
    val got = out(CorpusOps.prefixTopkOn(d, len = 2, max = 4))
    assert(got == Set((100L, 1L, 1L)),
      s"fixed-width rule wrong (apple must NOT match seed 'a'): $got")
  }

  test("index face is bit-identical to the batch face") {
    val d = docs(fixture)
    val root = Files.createTempDirectory("graft-prefix").toString
    val state = s"$root/state"
    IndexStream.applyBatch(spark, state,
      d.filter(col("source") =!= "src0"), 0L)
    val q = d.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"), col("text"))
    for (max <- Seq(2, 4)) {
      val batch = CorpusOps.prefixTopkOn(d, len = 2, max = max)
        .select("query_id", "rank", "doc_id", "score_micro", "n_terms")
        .collect().map(_.toSeq).toSet
      val index = IndexStream.queryPrefix(spark, state, q,
          len = 2, max = max)
        .select("query_id", "rank", "doc_id", "score_micro", "n_terms")
        .collect().map(_.toSeq).toSet
      assert(batch == index,
        s"index face must equal the batch face at max=$max")
      assert(batch.nonEmpty, "fixture must produce matches")
    }
  }

  test("a batch re-delivered after compaction cannot double-count df in the expansion") {
    // compaction moves a generation's dfs rows into the physical
    // ingest=-1 dir (logical gen preserved); re-delivering the same
    // batch id then writes byte-identical rows into its own ingest dir
    // again. The vocabulary-grain df sum must collapse the duplicates
    // (distinct over (term, df, gen), mirroring dfsRowsFor) or the
    // rarest-first expansion cap flips: here apricot's df doubles
    // 1 -> 2, loses its term-asc tie against apple, and the match set
    // silently swaps doc 2 for doc 1.
    val d = docs(Seq(
      (100L, "apple offvocab", "src0"),
      (1L, "apple pad pad", "src1"),
      (2L, "apricot pad fill", "src1"),
      (3L, "april apple fill", "src1"),
      (4L, "pad fill pad", "src1")))
    val root = Files.createTempDirectory("graft-prefix3").toString
    val state = s"$root/state"
    val batch0 = d.filter(col("doc_id") === 2L)
    val batch1 = d.filter(col("source") =!= "src0" && col("doc_id") =!= 2L)
    IndexStream.applyBatch(spark, state, batch0, 0L)
    IndexStream.applyBatch(spark, state, batch1, 1L)
    IndexStream.compactState(spark, state, 64L * 1024 * 1024)
    IndexStream.applyBatch(spark, state, batch0, 0L) // re-delivery
    val q = d.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"), col("text"))
    // match set only: the documented marker tolerance (bounded N/totdl
    // overcount on re-delivery-after-consolidation) may perturb scores,
    // but never which terms expand or which docs match
    val got = out(IndexStream.queryPrefix(spark, state, q,
      len = 2, max = 2))
    val want = out(CorpusOps.prefixTopkOn(d, len = 2, max = 2))
    assert(want == Set((100L, 2L, 1L), (100L, 3L, 1L)),
      s"fixture drifted: $want")
    assert(got == want,
      s"duplicate dfs rows perturbed the expansion: $got != $want")
  }

  test("deletes apply and df-ranks re-derive over survivors") {
    import spark.implicits._
    val d = docs(fixture)
    val root = Files.createTempDirectory("graft-prefix2").toString
    val state = s"$root/state"
    IndexStream.applyBatch(spark, state,
      d.filter(col("source") =!= "src0"), 0L)
    // deleting doc 2 removes apricot from the vocabulary entirely:
    // expansion at max=2 then keeps {april, apple} (apple re-enters)
    IndexStream.deleteDocs(spark, state, Seq(2L).toDF("doc_id"), 1L)
    val q = d.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"), col("text"))
    val got = out(IndexStream.queryPrefix(spark, state, q,
      len = 2, max = 2))
    assert(got == Set((100L, 1L, 1L), (100L, 3L, 2L)),
      s"survivor expansion wrong: $got")
  }

  test("completion MaxScore (round 13): flat posting scan under 10x growth of a frequent completion; bit-identical to the batch face") {
    // the expansion is a DISJUNCTION, so the conjunction faces'
    // candidate rule can't apply — instead the df-rarest completions
    // are the essential set (fetched whole, the candidate source) and
    // the frequent completion's read pushes the candidate ids down,
    // exact by the MaxScore bound from the stored max_tf. Fixture:
    // completions of "qa" are qa1(2) qa2(3) qa3(3) (docs 1..8 only,
    // FIXED) and qafreq (~40% of the corpus, grows 10x).
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
        val t =
          if (id <= 8L)
            s"qa${1 + (id % 3)}" +
              (if (id % 2 == 0) " qafreq" else "") + s" $filler"
          else if (id % 5 < 2) s"qafreq $filler"
          else filler
        (id, t, "s")
      }
      val root = Files.createTempDirectory("graft-prefixmax").toString
      val state = s"$root/state"
      var corpus: Seq[Long] = Seq.empty
      def seed(ids: Seq[Long], batchId: Long): Unit = {
        corpus = corpus ++ ids
        IndexStream.applyBatch(spark, state, docs(rowsOf(ids)), batchId)
      }
      val qRow = Seq((900001L, "qa1 offvocab", "src0"))
      val cols = Seq("query_id", "rank", "doc_id", "score_micro",
        "n_terms")
      def want(): Set[Seq[Any]] = {
        val w = CorpusOps.prefixTopkOn(docs(rowsOf(corpus) ++ qRow),
            len = 2, max = 4)
          .select(cols.head, cols.tail: _*)
          .collect().map(_.toSeq).toSet
        spark.catalog.clearCache()
        w
      }
      def got(): (Set[Seq[Any]], Long) = {
        import spark.implicits._
        val q = Seq((900001L, "qa1 offvocab")).toDF("query_id", "text")
        val (rows, n) = scanRowsDuring("/postings") {
          IndexStream.queryPrefix(spark, state, q, len = 2, max = 4)
            .select(cols.head, cols.tail: _*)
            .collect().map(_.toSeq).toSet
        }
        spark.catalog.clearCache()
        (rows, n)
      }
      seed(1L to 500L, 0L)
      val (g1, p1) = got()
      val w1 = want()
      assert(w1.nonEmpty && g1 == w1,
        "1x: index face must equal the batch face")
      // top-k must come from the rare completions' candidates (the
      // MaxScore proof's main branch, never the fallback)
      assert(w1.forall(_(2).asInstanceOf[Long] <= 8L),
        s"fixture must rank qa-completion docs: $w1")
      seed(501L to 5000L, 1L)
      val (g10, p10) = got()
      assert(g10 == want(), "10x: index face must equal the batch face")
      info(s"posting-scan rows 1x=$p1 10x=$p10")
      assert(p10 <= p1 * 3 + 64,
        s"prefix posting scan grew with the frequent completion " +
          s"(1x=$p1, 10x=$p10) — the completion MaxScore pushdown " +
          "is not reaching the row-group stats")
    } finally {
      if (oldBlock == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", oldBlock)
      if (oldPage == null) hc.unset("parquet.page.size")
      else hc.set("parquet.page.size", oldPage)
    }
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

  test("above the OR-chain cap (>256 prefixes) the expansion scan is range-pruned: flat dfs rows under 10x far-vocabulary growth") {
    withSmallRowGroups {
      // 260 queries with 260 DISTINCT 2-char seed prefixes aa..jz —
      // past prefixOrMax (256), so the expansion takes the semi-join
      // fallback; the round-14 [min(pfx), next(max(pfx))) range must
      // keep its dfs scan off the far vocabulary (w*), which grows 10x
      val prefixes = for (c1 <- 'a' to 'j'; c2 <- 'a' to 'z')
        yield s"$c1$c2"
      val pfxDocs = prefixes.zipWithIndex.map { case (p, i) =>
        (1000L + i, s"${p}x common", "src1")
      }
      def noise(ids: Seq[Long]): Seq[(Long, String, String)] = ids.map {
        id =>
          val rnd = new scala.util.Random(id)
          // id space disjoint from pfxDocs (1000-1259) and queries —
          // a colliding id would be an LSM re-delivery, not growth
          (100000L + id, (0 until 6).map(_ => s"w${rnd.nextInt(3000)}")
            .mkString(" "), "src1")
      }
      val qRows = prefixes.zipWithIndex.map { case (p, i) =>
        (9000L + i, s"${p}x offvocab", "src0")
      }
      val root = Files.createTempDirectory("graft-prefix-range").toString
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
        ">256-prefix fallback must stay bit-identical to the batch face")
      val grow = noise(201L to 2200L)
      corpus = corpus ++ grow
      IndexStream.applyBatch(spark, state, docs(grow), 1L)
      val (g10, d10) = got()
      assert(g10 == want(),
        "10x: >256-prefix fallback must equal the batch face")
      info(s"dfs-scan rows 1x=$d1 10x=$d10")
      // the second generation legitimately re-reads the qa-band row
      // groups once more (one dfs file set per generation); what must
      // NOT happen is the scan following the w* vocabulary's 10x growth
      assert(d10 <= d1 * 3 + 512,
        s"expansion dfs scan grew with the far vocabulary " +
          s"(1x=$d1, 10x=$d10) — the prefix-range prune is not " +
          "reaching the row-group stats")
    }
  }

  test("above pushdownMax the posting fetch is term-range-pruned: flat posting rows under 10x far-vocabulary growth") {
    withSmallRowGroups {
      // graft.pushdown.max is the TEST seam that drives the fallback
      // paths at fixture scale: with it at 4, the 3 selected
      // completions x 2 generations exceed the IN-pushdown cap and the
      // posting fetch takes the semi-join fallback, whose round-14
      // [min(term), max(term)] range must keep the scan off the far
      // vocabulary's postings
      def rowsOf(ids: Seq[Long]): Seq[(Long, String, String)] = ids.map {
        id =>
          val rnd = new scala.util.Random(id)
          val filler = (0 until 6).map(_ => s"w${rnd.nextInt(3000)}")
            .mkString(" ")
          if (id <= 8L) (id, s"qa${1 + (id % 3)} $filler", "src1")
          else (id, filler, "src1")
      }
      val root = Files.createTempDirectory("graft-prefix-post").toString
      val state = s"$root/state"
      var corpus: Seq[Long] = (1L to 300L)
      IndexStream.applyBatch(spark, state, docs(rowsOf(1L to 150L)), 0L)
      IndexStream.applyBatch(spark, state, docs(rowsOf(151L to 300L)), 1L)
      val qRow = Seq((900001L, "qa1 offvocab", "src0"))
      import spark.implicits._
      val q = Seq((900001L, "qa1 offvocab")).toDF("query_id", "text")
      val cols = Seq("query_id", "rank", "doc_id", "score_micro",
        "n_terms")
      def want(): Set[Seq[Any]] = {
        val w = CorpusOps.prefixTopkOn(docs(rowsOf(corpus) ++ qRow),
            len = 2, max = 4)
          .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
        spark.catalog.clearCache()
        w
      }
      def got(): (Set[Seq[Any]], Long) = {
        val old = sys.props.get("graft.pushdown.max")
        sys.props("graft.pushdown.max") = "4"
        try {
          val r = scanRowsDuring("/postings") {
            IndexStream.queryPrefix(spark, state, q, len = 2, max = 4)
              .select(cols.head, cols.tail: _*)
              .collect().map(_.toSeq).toSet
          }
          spark.catalog.clearCache()
          r
        } finally {
          old.fold { sys.props -= "graft.pushdown.max"; () } { v =>
            sys.props("graft.pushdown.max") = v; ()
          }
        }
      }
      val (g1, p1) = got()
      assert(g1.nonEmpty && g1 == want(),
        "fallback posting fetch must stay bit-identical to the batch face")
      IndexStream.applyBatch(spark, state,
        docs(rowsOf(301L to 3000L)), 2L)
      corpus = 1L to 3000L
      val (g10, p10) = got()
      assert(g10 == want(),
        "10x: fallback posting fetch must equal the batch face")
      info(s"posting-scan rows 1x=$p1 10x=$p10")
      // one more generation adds one more qa row-group set; the w*
      // posting volume (10x) must stay outside the term range
      assert(p10 <= p1 * 3 + 256,
        s"fallback posting scan grew with the far vocabulary " +
          s"(1x=$p1, 10x=$p10) — the term-range prune is not " +
          "reaching the row-group stats")
    }
  }
}
