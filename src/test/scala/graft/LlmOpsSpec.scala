package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal, Similarity, TextOps}

class LlmOpsSpec extends SparkSpecBase {

  test("dedup_exact: canonical id is the min doc_id of its group, groups cover all docs") {
    val df = Dedup.dedupExact(spark, sf)
    val docs = Tables.load(spark, sf, "documents").count()
    assert(df.agg(sum("n_copies")).collect()(0).getLong(0) == docs)
  }

  test("minhash_lsh candidates are a superset of high-jaccard pairs it reports") {
    val lsh = Dedup.minhashLsh(spark, sf).cache()
    val jac = Dedup.ngramJaccard(spark, sf) // pairs with jaccard >= 0.3
    // every verified-high-jaccard pair that shares a band must appear in LSH output
    val missed = jac.join(lsh, Seq("a_id", "b_id"), "left_anti").count()
    // LSH is approximate: banding with 4 bands of 2 rows catches j>=0.3
    // pairs with prob 1-(1-j^2)^4; on this corpus all 0.3+ pairs collide
    assert(missed == 0, s"$missed high-jaccard pairs missed by LSH bands")
    lsh.unpersist()
  }

  test("simhash: near-identical docs get close signatures, value is 32-bit") {
    val df = Dedup.simhash(spark, sf)
    val bad = df.filter(col("simhash") < 0 || col("simhash") > (1L << 32) - 1).count()
    assert(bad == 0)
    assert(df.count() == 500)
  }

  test("ann_topk: exactly k neighbors per query, ranks 1..3, no self-match") {
    val df = Similarity.annTopk(spark, sf).cache()
    assert(df.filter(col("query_id") === col("neighbor_id")).count() == 0)
    val badRank = df.groupBy("query_id")
      .agg(count(lit(1)).as("n"), max("rank").as("mx"))
      .filter(col("n") =!= 3 || col("mx") =!= 3).count()
    assert(badRank == 0)
    df.unpersist()
  }

  test("cosine similarity is symmetric and bounded") {
    val df = Similarity.cosinePairs(spark, sf)
    assert(df.filter(col("sim_micro") > 1000000L ||
      col("sim_micro") < -1000000L).count() == 0)
  }

  test("multimodal decode stub: mapPartitions path agrees with expression path") {
    val d = Tables.load(spark, sf, "documents")
    val media = d.select(col("doc_id"), col("text").cast("binary").as("media"))
    val decoded = Multimodal.decodeMedia(spark, media).toDF()
    val exprPath = Multimodal.multimodalFeatures(spark, sf)
      .select("doc_id", "n_bytes", "format", "width", "height", "n_frames", "checksum")
    val joined = decoded.join(exprPath, Seq("doc_id"))
    val disagree = joined.filter(
      decoded("n_bytes") =!= exprPath("n_bytes") ||
        decoded("format") =!= exprPath("format") ||
        decoded("checksum") =!= exprPath("checksum")).count()
    assert(disagree == 0)
    assert(decoded.count() == d.count())
  }

  test("text_stats: diversity in (0,1], stopword count <= token count") {
    val df = TextOps.textStats(spark, sf)
    assert(df.filter(col("token_diversity") <= 0 || col("token_diversity") > 1).count() == 0)
    assert(df.filter(col("n_stopwords") > col("n_tokens")).count() == 0)
  }

  test("fuzzy_match: composite ranking resolves every record exactly; name distance alone is ambiguous") {
    val df = Dedup.fuzzyMatch(spark, sf).cache()
    try {
      val n = Tables.load(spark, sf, "supplier").count()
      assert(df.count() == n, "a dirty record found no candidate in its block")
      assert(df.filter(col("lev") > 2 || col("lev") < 1).count() == 0,
        "resolution outside the verify band (perturbation guarantees lev >= 1)")
      // the second attribute makes resolution exact: balance delta 0,
      // true key recovered for every record
      assert(df.filter(col("matched_key") =!= col("dirty_key") ||
        col("bal_delta") =!= 0).count() == 0,
        "composite (distance, balance) ranking failed to recover a true key")
      // ...and the ambiguity it resolved was real: name-only candidates
      // are plural for at least some records
      assert(df.agg(max("n_candidates")).head.getLong(0) > 1,
        "no ambiguity present — the composite ranking proved nothing")
    } finally df.unpersist()
  }

  test("dup_ngram_spans: hand-computed coverage on a constructed corpus; self-repeats don't count") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-spans").toString
    try {
      Seq(
        // A and B share the 5-gram "a b c d e"; C is unique; D is ONLY
        // the shared gram (full coverage → flagged); E repeats its own
        // gram twice but shares with nobody (self-repeat must not count)
        (1L, "a b c d e f g", "en", "s", 13L),
        (2L, "a b c d e x", "en", "s", 11L),
        (3L, "p q r s t u", "en", "s", 11L),
        (4L, "a b c d e", "en", "s", 9L),
        (5L, "m n o p2 q2 m n o p2 q2", "en", "s", 23L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val rows = graft.operators.TextOps.dupNgramSpans(spark, dir)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
      // A: grams at pos 5,6,7 → 3 total, 1 shared → 333333, not flagged
      assert(rows(1L) == ((3L, 1L, 333333L, 0)), s"doc A wrong: ${rows(1L)}")
      // B: 2 grams, 1 shared → exactly 500000 → NOT flagged (strict >)
      assert(rows(2L) == ((2L, 1L, 500000L, 0)), s"doc B wrong: ${rows(2L)}")
      // C: nothing shared
      assert(rows(3L) == ((2L, 0L, 0L, 0)), s"doc C wrong: ${rows(3L)}")
      // D: its single gram is shared → full coverage, flagged
      assert(rows(4L) == ((1L, 1L, 1000000L, 1)), s"doc D wrong: ${rows(4L)}")
      // E: 6 grams, all self-repeats, zero cross-doc → no dup credit
      assert(rows(5L)._2 == 0L && rows(5L)._4 == 0,
        s"self-repeat counted as cross-doc duplication: ${rows(5L)}")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("temperature_sample: sqrt-temperature caps the head source, keeps the tail whole, deterministic") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-temp").toString
    try {
      val docs =
        (1L to 100L).map(i => (i, s"doc $i", "en", "head", 10L)) ++
          (101L to 104L).map(i => (i, s"doc $i", "en", "tail", 10L))
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val once = graft.operators.CorpusOps.temperatureSample(spark, dir)
      val kept = once.groupBy("source").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // head: floor(sqrt(100·25)) = 50 of 100; tail: target 10 > 4 → all 4
      assert(kept == Map("head" -> 50L, "tail" -> 4L),
        s"wrong per-source keep counts: $kept")
      // salted-hash selection is deterministic: a re-run picks the same set
      val again = graft.operators.CorpusOps.temperatureSample(spark, dir)
      assert(once.select("doc_id").except(again.select("doc_id")).count() == 0,
        "temperature sampling is not deterministic across runs")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
