package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.CorpusOps

class CorpusOpsSpec extends SparkSpecBase {

  test("bigram_lm: probabilities are valid µ-unit conditionals; every multi-token doc scored") {
    val df = CorpusOps.bigramLm(spark, sf).cache()
    try {
      val bad = df.filter(
        col("min_p_micro") <= 0 || col("min_p_micro") > 1000000L ||
          col("avg_p_micro") < col("min_p_micro") ||
          col("avg_p_micro") > 1000000L).count()
      assert(bad == 0, "a bigram probability escaped (0, 1] in µ-units")
      val docs = Tables.load(spark, sf, "documents")
        .filter(size(split(col("text"), " ")) >= 2)
      assert(df.count() == docs.count(), "a multi-token doc is missing a score")
      // n_bigrams must equal token count - 1 (the chain length)
      val wrongN = df.join(
        docs.select(col("doc_id"),
          (size(split(col("text"), " ")) - 1).cast("long").as("expect_n")),
        "doc_id").filter(col("n_bigrams") =!= col("expect_n")).count()
      assert(wrongN == 0, "bigram count disagrees with token chain length")
    } finally df.unpersist()
  }

  test("bigram_lm_heldout: OOV path on a constructed corpus — unseen bigrams counted, all-OOV doc gets NULL mean") {
    // the fixture corpus shares one vocabulary, so OOV never fires there;
    // this corpus has bigrams genuinely absent from training
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-oov").toString
    try {
      Seq(
        (1L, "a b a c", "train"), // model: p(a,b)=p(a,c)=0.5, p(b,a)=1.0
        (10L, "a b x", "src0"),   // (a,b) scored at 500000; (b,x) unseen
        (11L, "q r", "src0"))     // every bigram unseen
        .toDF("doc_id", "text", "source")
        .write.parquet(s"$dir/documents.parquet")
      val rows = graft.operators.CorpusOps.bigramLmHeldout(spark, dir)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3),
            Option(r.get(4)), Option(r.get(5)))).toMap
      assert(rows(10L) == ((2L, 1L, 1L, Some(500000L), Some(500000L))),
        "partially-OOV doc must score only the seen bigram")
      assert(rows(11L) == ((1L, 0L, 1L, None, None)),
        "all-OOV doc must get NULL mean/min, not a fake zero")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("bigram_lm_heldout: scores only the held-out source, OOV accounting is exact") {
    val df = CorpusOps.bigramLmHeldout(spark, sf).cache()
    try {
      val heldout = Tables.load(spark, sf, "documents")
        .filter(col("source") === "src0" &&
          size(split(col("text"), " ")) >= 2)
      assert(df.count() == heldout.count(),
        "held-out scoring must cover exactly src0's multi-token docs")
      val bad = df.filter(
        col("n_scored") + col("n_oov") =!= col("n_bigrams") ||
          (col("n_scored") === 0 && col("avg_p_micro").isNotNull) ||
          (col("n_scored") > 0 &&
            (col("avg_p_micro") <= 0 || col("avg_p_micro") > 1000000L))).count()
      assert(bad == 0, "OOV split or probability bounds violated")
    } finally df.unpersist()
  }

  test("stratified_sample: per-source cap holds and ranks are a dense 1..n prefix") {
    val df = CorpusOps.stratifiedSample(spark, sf).cache()
    try {
      val perSource = df.groupBy("source")
        .agg(count(lit(1)).as("n"), max(col("rk")).as("max_rk"),
          countDistinct(col("rk")).as("nd_rk"))
      val overCap = perSource.filter(col("n") > 10).count()
      assert(overCap == 0, "a stratum exceeded its cap")
      val sparseRk = perSource.filter(
        col("max_rk") =!= col("n") || col("nd_rk") =!= col("n")).count()
      assert(sparseRk == 0, "ranks are not a dense 1..n prefix")
      // cap is min(10, stratum size): no source may be under-sampled
      val actual = Tables.load(spark, sf, "documents")
        .groupBy("source").agg(count(lit(1)).as("total"))
      val underSampled = perSource.join(actual, "source")
        .filter(col("n") < least(lit(10L), col("total"))).count()
      assert(underSampled == 0, "a stratum was sampled below min(cap, size)")
    } finally df.unpersist()
  }

  test("inverted_index: doc_freq bounds, mass conservation vs token count") {
    val df = CorpusOps.invertedIndex(spark, sf).cache()
    try {
      val nDocs = Tables.load(spark, sf, "documents").count()
      val bad = df.filter(col("doc_freq") <= 0 || col("doc_freq") > nDocs ||
        col("term_freq") < col("doc_freq")).count()
      assert(bad == 0, "doc_freq/term_freq bounds violated")
      // every token occurrence lands in exactly one posting: term_freq sums
      // to the corpus token count
      val totalTf = df.agg(sum(col("term_freq"))).first().getLong(0)
      val totalToks = Tables.load(spark, sf, "documents")
        .agg(sum(size(split(lower(col("text")), " ")))).first().getLong(0)
      assert(totalTf == totalToks, "token occurrences lost or duplicated")
    } finally df.unpersist()
  }

  test("shard_pack: shards respect the start-offset rule and cover every doc exactly once") {
    val df = CorpusOps.shardPack(spark, sf).cache()
    try {
      assert(df.count() ==
        Tables.load(spark, sf, "documents").count(),
        "packing must cover every document exactly once")
      // recompute token counts from the SOURCE text (not the query's own
      // output) so a tokenizer or window-ordering bug can't self-certify
      val expected = Tables.load(spark, sf, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("src_tokens"))
      val wrongTokens = df.join(expected, "doc_id")
        .filter(col("n_tokens") =!= col("src_tokens")).count()
      assert(wrongTokens == 0, "token counts disagree with the source text")
      val bad = df.filter(
        col("shard_id") =!= expr(
          s"(cum_tokens - n_tokens) div ${CorpusOps.shardBudget}") ||
          col("shard_id") < 0).count()
      assert(bad == 0, "start-offset rule violated")
      // within a source, shard ids are non-decreasing in doc order and
      // the cumulative stream has no gaps
      val w = Window.partitionBy("source").orderBy("doc_id")
      val broken = df
        .withColumn("prev_cum", lag(col("cum_tokens"), 1, 0L).over(w))
        .withColumn("prev_shard", lag(col("shard_id"), 1, 0L).over(w))
        .filter(col("cum_tokens") =!= col("prev_cum") + col("n_tokens") ||
          col("shard_id") < col("prev_shard")).count()
      assert(broken == 0, "cumulative stream has gaps or shard ids regress")
    } finally df.unpersist()
  }

  test("length_outliers: a genuinely extreme doc IS flagged (constructed corpus)") {
    // the fixture corpora contain zero outliers at every SF, so without
    // this corpus the outlier branch would be pinned by nothing (same
    // precedent as the held-out LM's OOV corpus)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-outlier").toString
    try {
      val docs = ((1L to 10L).map(i => (i, "xx", 100L)) :+
        ((11L, "xx", 90L)) :+ ((12L, "xx", 10000L)))
        .toDF("doc_id", "lang", "n_chars")
      docs.write.parquet(s"$dir/documents.parquet")
      // n=12 → q1 = rank 3 = 100, q3 = rank 9 = 100 → IQR 0, fences [100,100]
      val rows = graft.operators.CorpusOps.lengthOutliers(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getInt(5)).toMap
      assert(rows(12L) == 1, "the 10000-char doc must be flagged")
      assert(rows(11L) == 1, "the below-fence doc must be flagged")
      assert(rows(1L) == 0, "a bulk doc must not be flagged")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("length_outliers: full coverage, coherent fences, flag matches the bounds") {
    val df = CorpusOps.lengthOutliers(spark, sf).cache()
    try {
      assert(df.count() == Tables.load(spark, sf, "documents").count(),
        "every document must be classified")
      val bad = df.filter(col("lo") > col("hi") ||
        col("is_outlier") =!= when(
          col("n_chars") < col("lo") || col("n_chars") > col("hi"), 1)
          .otherwise(0)).count()
      assert(bad == 0, "fences inverted or flag inconsistent with bounds")
      // Tukey fences at 1.5 IQR must keep the bulk of any distribution:
      // the interquartile half is inside the fences by construction
      val perLang = df.groupBy("lang").agg(
        (sum(col("is_outlier")).cast("double") / count(lit(1))).as("frac"))
      assert(perLang.filter(col("frac") > 0.5).count() == 0,
        "a language flagged most of its docs — fences are broken")
    } finally df.unpersist()
  }

  test("table_profile: one row per profiled column with coherent counts") {
    val df = CorpusOps.tableProfile(spark, sf).cache()
    try {
      assert(df.count() == 11, "expected one row per lineitem column")
      val incoherent = df.filter(
        col("n_nulls") < 0 || col("n_distinct") > col("n_rows") ||
          (col("n_distinct") === 0 && col("n_nulls") =!= col("n_rows"))).count()
      assert(incoherent == 0, "profile metrics are incoherent")
      // string ordering == value ordering only for the non-numeric columns
      // (a numeric min like 9.00 sorts lexicographically after 10.00)
      val lexiSafe = Seq("l_returnflag", "l_linestatus", "l_shipdate")
      val inverted = df.filter(col("column_name").isin(lexiSafe: _*) &&
        col("min_s") > col("max_s")).count()
      assert(inverted == 0, "min exceeds max on a lexicographically-safe column")
      val rows = Tables.load(spark, sf, "lineitem").count()
      assert(df.filter(col("n_rows") =!= rows).count() == 0)
    } finally df.unpersist()
  }

  test("table_profile_approx: exact anchors match the exact profiler; every sketch within bound") {
    val approx = CorpusOps.tableProfileApprox(spark, sf).cache()
    val exact = CorpusOps.tableProfile(spark, sf).cache()
    try {
      assert(approx.count() == 11, "expected one row per lineitem column")
      assert(approx.filter(col("hll_ok") =!= 1).count() == 0,
        "an HLL sketch landed outside the 10% bound")
      // both faces share the melt exact branch; their exact metrics and
      // null accounting must agree column for column
      val joined = approx.select(col("column_name"),
          col("n_distinct").as("nd_a"), col("n_nulls").as("nn_a"))
        .join(exact.select(col("column_name"), col("n_distinct"),
          col("n_nulls")), Seq("column_name"))
      assert(joined.filter(col("nd_a") =!= col("n_distinct") ||
        col("nn_a") =!= col("n_nulls")).count() == 0,
        "approx face's exact metrics diverge from the exact profiler")
    } finally { approx.unpersist(); exact.unpersist() }
  }

  test("length_outliers_approx: below sketch scale the approx face agrees with exact bit-for-bit") {
    val approx = CorpusOps.lengthOutliersApprox(spark, sf).cache()
    val exact = CorpusOps.lengthOutliers(spark, sf).cache()
    try {
      assert(approx.filter(col("n_disagree") =!= 0).count() == 0,
        "sketch is exact below accuracy-group-size, flags must agree")
      assert(approx.filter(col("approx_ok") =!= 1).count() == 0,
        "disagreement bound flag must hold")
      // per-lang exact outlier counts must reconcile with the exact face
      val fromExact = exact.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs_e"),
          sum(col("is_outlier")).as("n_out_e"))
      val j = approx.join(fromExact, Seq("lang"))
      assert(j.filter(col("n_docs") =!= col("n_docs_e") ||
        col("n_outliers") =!= col("n_out_e")).count() == 0,
        "approx face's exact rollup diverges from the exact face")
    } finally { approx.unpersist(); exact.unpersist() }
  }

  test("pmi_cooccur: support floor holds; hand-computed PMI on a constructed corpus") {
    val df = CorpusOps.pmiCooccur(spark, sf)
    assert(df.filter(col("c12") < 5).count() == 0, "support floor violated")
    assert(df.filter(col("pmi_micro") <= 0).count() == 0,
      "a surviving pair has non-positive PMI ratio")

    // constructed corpus: 5×"a b" and 5×"c d" → for (a,b): c12=5, c1=5,
    // c2=5, N=10 → PMI ratio = 5·10/(5·5) = 2.0 → 2_000_000 µ-units
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pmi").toString
    try {
      (1 to 5).map(i => (i.toLong, "a b", "s")) ++
        (6 to 10).map(i => (i.toLong, "c d", "s")) match {
        case rows => rows.toDF("doc_id", "text", "source")
          .write.parquet(s"$dir/documents.parquet")
      }
      val r = CorpusOps.pmiCooccur(spark, dir).collect()
        .map(x => (x.getString(0), x.getString(1)) -> x.getLong(3)).toMap
      assert(r(("a", "b")) == 2000000L, s"PMI(a,b) wrong: $r")
      assert(r(("c", "d")) == 2000000L, s"PMI(c,d) wrong: $r")
      assert(r.size == 2, s"unexpected pairs survived: $r")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
