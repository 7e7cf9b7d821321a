package graft

import org.apache.spark.sql.functions._
import graft.operators.{Similarity, TrainOps}

class TrainOpsSpec extends SparkSpecBase {

  test("vocab_build: ids dense from 0 in (count desc, token asc) order; min-count floor holds") {
    val v = TrainOps.vocabBuild(spark, sf).cache()
    try {
      val n = v.count()
      assert(n > 0, "empty vocabulary")
      assert(v.filter(col("n_count") < 5).count() == 0,
        "a token below the min-count floor entered the vocabulary")
      // dense ids 0..n-1, no gaps or dups
      assert(v.agg(min("token_id")).head.getLong(0) == 0L)
      assert(v.agg(max("token_id")).head.getLong(0) == n - 1)
      assert(v.select("token_id").distinct().count() == n)
      // id order IS (count desc, token asc): walking ids ascending,
      // (n_count desc, token asc) must be non-increasing
      val rows = v.orderBy("token_id")
        .select("n_count", "token").collect()
      rows.sliding(2).foreach {
        case Array(p, q) =>
          val ok = q.getLong(0) < p.getLong(0) ||
            (q.getLong(0) == p.getLong(0) &&
              q.getString(1) > p.getString(1))
          assert(ok, s"id order broke frequency order at $p -> $q")
        case _ =>
      }
    } finally v.unpersist()
  }

  test("dataset_split: identical text always lands in the same split (leakage guard)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-split").toString
    try {
      Seq(
        (1L, "the quick brown fox", "srcA"),
        (2L, "the quick brown fox", "srcB"), // byte-identical dup, other source
        (3L, "a different document", "srcA"))
        .toDF("doc_id", "text", "source")
        .write.parquet(s"$dir/documents.parquet")
      val s = TrainOps.datasetSplit(spark, dir).collect()
        .map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
      assert(s(1L) == s(2L),
        "byte-identical documents were split apart — train/test leakage")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("dataset_split: buckets in [0,100) and split labels match the bucket ranges") {
    val s = TrainOps.datasetSplit(spark, sf).cache()
    try {
      assert(s.filter(col("bucket") < 0 || col("bucket") >= 100).count() == 0)
      val wrong = s.filter(
        (col("bucket") < 80 && col("split") =!= "train") ||
          (col("bucket") >= 80 && col("bucket") < 90 && col("split") =!= "valid") ||
          (col("bucket") >= 90 && col("split") =!= "test")).count()
      assert(wrong == 0, "a split label disagrees with its bucket range")
      assert(s.count() ==
        Tables.load(spark, sf, "documents").count(), "a document lost its split")
    } finally s.unpersist()
  }

  test("curriculum_bins: per-language bins are 1..4, balanced, and ordered by (n_chars, doc_id)") {
    val b = TrainOps.curriculumBins(spark, sf).cache()
    try {
      assert(b.filter(col("bin") < 1 || col("bin") > 4).count() == 0)
      // ntile balance: within a language, bin sizes differ by at most 1
      val skew = b.groupBy("lang", "bin").count()
        .groupBy("lang").agg((max("count") - min("count")).as("d"))
        .filter(col("d") > 1).count()
      assert(skew == 0, "ntile bins unbalanced within a language")
      // bins respect the (n_chars, doc_id) curriculum order
      b.select("lang", "bin", "n_chars", "doc_id").collect()
        .groupBy(_.getString(0)).foreach { case (_, rows) =>
          val sorted = rows.sortBy(r => (r.getLong(2), r.getLong(3)))
          val bins = sorted.map(_.getLong(1))
          assert(bins.sameElements(bins.sorted),
            "a longer document landed in an earlier bin")
        }
    } finally b.unpersist()
  }

  test("tokenizer_apply: every doc encoded; OOV sentinel and exact digest on a constructed corpus") {
    val t = TrainOps.tokenizerApply(spark, sf).cache()
    try {
      val docs = Tables.load(spark, sf, "documents")
      assert(t.count() == docs.count(), "a document lost its encoding")
      assert(t.filter(col("n_oov") > col("n_tokens") ||
        col("n_oov") < 0).count() == 0)
      // n_tokens is the split length
      val wrong = t.join(docs.select(col("doc_id"),
          size(split(lower(col("text")), " ")).cast("long").as("expect_n")),
        "doc_id").filter(col("n_tokens") =!= col("expect_n")).count()
      assert(wrong == 0, "token count disagrees with the split length")
    } finally t.unpersist()

    // constructed corpus: x appears 6x, y 5x, z once (below min-count 5)
    // vocab: x -> 0, y -> 1; doc 6 = "x z" encodes [0, -1]
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tok").toString
    try {
      ((1 to 5).map(i => (i.toLong, "x y", "s")) :+ (6L, "x z", "s"))
        .toDF("doc_id", "text", "source")
        .write.parquet(s"$dir/documents.parquet")
      val r = TrainOps.tokenizerApply(spark, dir).collect()
        .map(x => x.getLong(0) -> (x.getLong(2), x.getString(3))).toMap
      def md5hex(s: String): String = java.security.MessageDigest
        .getInstance("MD5").digest(s.getBytes).map("%02x".format(_)).mkString
      assert(r(6L) == ((1L, md5hex("0,-1"))),
        s"doc 6 should encode [0, -1] with one OOV: ${r(6L)}")
      assert(r(1L) == ((0L, md5hex("0,1"))),
        s"doc 1 should encode [0, 1] with no OOV: ${r(1L)}")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("tokenizer_apply: an all-OOV corpus (empty vocabulary) encodes every token as the sentinel") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-oovall").toString
    try {
      // every token occurs once — all below the min-count floor, so the
      // vocabulary is EMPTY and the left join runs against zero rows
      Seq((1L, "aa bb", "s"), (2L, "cc dd ee", "s"))
        .toDF("doc_id", "text", "source")
        .write.parquet(s"$dir/documents.parquet")
      val r = operators.TrainOps.tokenizerApply(spark, dir).collect()
        .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
      assert(r == Map(1L -> ((2L, 2L)), 2L -> ((3L, 3L))),
        s"all-OOV corpus mis-encoded: $r")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("semdedup: one row per vector; pruned rows point at a lower-id cluster-mate; cluster minima never pruned") {
    val d = Similarity.semDedup(spark, sf).cache()
    try {
      val n = Tables.load(spark, sf, "embeddings").count()
      assert(d.count() == n, "semdedup dropped or duplicated a vector")
      val badPruned = d.filter(col("is_pruned") === 1 &&
        (col("keep_id").isNull || col("keep_id") >= col("vec_id") ||
          col("n_dups") < 1)).count()
      assert(badPruned == 0, "a pruned vector lacks a valid lower-id keeper")
      val badKept = d.filter(col("is_pruned") === 0 &&
        (col("keep_id").isNotNull || col("n_dups") =!= 0)).count()
      assert(badKept == 0, "a kept vector carries dup metadata")
      // the lowest id in each cluster has no lower-id mate -> never pruned
      val minPruned = d.groupBy("cell").agg(min("vec_id").as("mn"))
        .join(d, col("mn") === col("vec_id"))
        .filter(col("is_pruned") === 1).count()
      assert(minPruned == 0, "a cluster's lowest-id vector was pruned")
    } finally d.unpersist()
  }

  test("bpe_merges: no phantom (char, '') pair — fixture where the trailing-empty split artifact would win round 1") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-phantom").toString
    try {
      // five DISTINCT words sharing the final char 'b': a trailing-empty
      // split would count a phantom (b, '') pair with cnt 5, beating
      // every real pair (each cnt 1) and emitting a bogus round-1 merge
      // rule. Correct round 1: all real pairs tie at 1 -> lexicographic
      // (l asc, r asc) picks (a, b); rounds 2-3 then take (c,b), (d,b).
      Seq((1L, "ab cb db eb fb", "en", "s", 14L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val rows = graft.operators.TrainOps.bpeMerges(spark, dir)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).sortBy(_._1)
      assert(rows(0) == ((1, "a", "b", "ab", 1L)),
        s"round 1 must be the real (a,b), not a phantom (b,''): ${rows(0)}")
      assert(rows(1) == ((2, "c", "b", "cb", 1L)), s"step2: ${rows(1)}")
      assert(rows(2) == ((3, "d", "b", "db", 1L)), s"step3: ${rows(2)}")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("bpe_merges: hand-computed merge sequence — frequency order, lexicographic tie-break, merged symbols pair up") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    try {
      // corpus: "aaab" ×2, "aab" ×1 (as documents)
      Seq((1L, "aaab aaab", "en", "s", 9L), (2L, "aab", "en", "s", 3L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val rows = graft.operators.TrainOps.bpeMerges(spark, dir)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).sortBy(_._1)
      // step 1: (a,a) weighted 2·2+1 = 5 beats (a,b) 3
      assert(rows(0) == ((1, "a", "a", "aa", 5L)), s"step1: ${rows(0)}")
      // step 2: 'aa a b'(×2) + 'aa b'(×1) → (aa,a)=2 TIES (a,b)=2;
      // lexicographic l breaks it: 'a' < 'aa' → (a,b) wins
      assert(rows(1) == ((2, "a", "b", "ab", 2L)), s"step2: ${rows(1)}")
      // step 3: merged symbols pair up — 'aa ab'(×2) → (aa,ab)=2
      assert(rows(2) == ((3, "aa", "ab", "aaab", 2L)), s"step3: ${rows(2)}")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
