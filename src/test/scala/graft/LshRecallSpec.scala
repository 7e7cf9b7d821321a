package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Quantified recall of the approximate (LSH) paths against their exact
  * baselines, on SEEDED data with known near-dups. MlLshSpec cross-checks
  * signatures; this spec checks what the user actually cares about — how
  * many true near-dup pairs the bucketed path recovers. Everything here
  * is deterministic (seeded generator + md5/plane hashing), so the
  * asserted floors are stable, not flaky.
  */
class LshRecallSpec extends SparkSpecBase {

  private def pairKey = (a: Long, b: Long) => (math.min(a, b), math.max(a, b))

  /** Shared seeded corpus for the banded-simhash tests: 40 base docs,
    * the first 25 duplicated with ONE token mutated (near-identical
    * token multisets put signatures within a few bits) — both geometries
    * pin their floors on the SAME distribution, varied only by seed.
    */
  private def mutatedCorpus(seed: Int): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val vocab = (0 until 60).map(i => s"tok$i")
    def sentence(): Array[String] =
      Array.fill(30)(vocab(rnd.nextInt(vocab.length)))
    val bases = (0 until 40).map(i => (i.toLong, sentence()))
    val dups = bases.take(25).map { case (i, toks) =>
      val copy = toks.clone()
      copy(7) = vocab(rnd.nextInt(vocab.length))
      (100L + i, copy)
    }
    (bases ++ dups)
      .map { case (id, toks) => (id, toks.mkString(" ")) }
      .toDF("doc_id", "text")
  }

  test("minhash_lsh recall >= 0.8 vs exact ngram-jaccard on seeded near-dups") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 60).map(i => s"tok$i")
    def sentence(): Array[String] =
      Array.fill(30)(vocab(rnd.nextInt(vocab.length)))
    // 25 base docs; the first 15 get a near-dup copy with 2 tokens
    // mutated (3-gram shingle jaccard ≈ 0.6-0.8 — inside the LSH
    // sweet spot for 4 bands × 2 rows)
    val bases = (0 until 25).map(i => (i.toLong, sentence()))
    val dups = bases.take(15).map { case (i, toks) =>
      val copy = toks.clone()
      copy(5) = vocab(rnd.nextInt(vocab.length))
      copy(20) = vocab(rnd.nextInt(vocab.length))
      (100L + i, copy)
    }
    val docs = (bases ++ dups)
      .map { case (id, toks) => (id, toks.mkString(" ")) }
      .toDF("doc_id", "text")

    // exact baseline: pairs with true jaccard >= 0.5
    val truth = Dedup.ngramJaccardOn(docs)
      .filter(col("jaccard") >= 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect()
      .map(p => pairKey(p._1, p._2)).toSet
    assert(truth.size >= 10, s"seed produced only ${truth.size} true pairs")

    // approximate path: any LSH candidate pair counts as recovered
    val found = Dedup.minhashLshOn(docs)
      .select("a_id", "b_id").as[(Long, Long)].collect()
      .map(p => pairKey(p._1, p._2)).toSet

    val recall = truth.count(found).toDouble / truth.size
    info(f"minhash_lsh recall: $recall%.3f over ${truth.size} true pairs")
    assert(recall >= 0.8,
      f"LSH recall $recall%.3f below floor 0.8 (${truth.size} true pairs)")
    spark.catalog.clearCache()
  }

  test("simhash_neardup: banded recall is 1.0 at hamming <= 3 (pigeonhole) and >= 0.6 at <= 6") {
    import spark.implicits._
    val docs = mutatedCorpus(seed = 11)

    // exact baseline: all-pairs hamming over the signatures (65 docs)
    val sigs = Dedup.simhashOn(docs)
    val a = sigs.select(col("doc_id").as("a_id"), col("simhash").as("sa"))
    val b = sigs.select(col("doc_id").as("b_id"), col("simhash").as("sb"))
    val exact = a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))))
      .filter(col("hamming") <= 6)
      .select(col("a_id"), col("b_id"), col("hamming"))
      .as[(Long, Long, Long)].collect()
    val truth3 = exact.filter(_._3 <= 3).map(p => pairKey(p._1, p._2)).toSet
    val truth6 = exact.map(p => pairKey(p._1, p._2)).toSet
    assert(truth3.size >= 5, s"seed produced only ${truth3.size} pairs at <= 3")
    assert(truth6.size > truth3.size, "seed produced no pairs in the 4-6 range")

    val found = Dedup.simhashNeardupOn(docs)
      .select("a_id", "b_id").as[(Long, Long)].collect()
      .map(p => pairKey(p._1, p._2)).toSet

    // 4 bands x 8 bits: <= 3 differing bits leave at least one band clean
    val recall3 = truth3.count(found).toDouble / truth3.size
    val recall6 = truth6.count(found).toDouble / truth6.size
    info(f"simhash banded recall: $recall3%.3f at <=3 (${truth3.size} pairs), " +
      f"$recall6%.3f at <=6 (${truth6.size} pairs)")
    assert(recall3 == 1.0,
      f"pigeonhole guarantee violated: recall $recall3%.3f at hamming <= 3")
    // worst case d=6 with uniformly-spread bits: P(all 4 bands dirty) =
    // (4^6 - 4*3^6 + 6*2^6 - 4) / 4^6 = 1560/4096 ~ 0.38, so per-pair
    // recall >= 0.62 even at the threshold edge; the mixed 4-6 population
    // sits above it (measured 0.66 on this seed)
    assert(recall6 >= 0.6,
      f"banded recall $recall6%.3f below the d=6 theory floor 0.6")
  }

  test("simhash_neardup_wide: pigeonhole guarantee holds at the production geometry") {
    import spark.implicits._
    val docs = mutatedCorpus(seed = 13)

    val sigs = Dedup.simhash60On(docs)
    val a = sigs.select(col("doc_id").as("a_id"), col("simhash").as("sa"))
    val b = sigs.select(col("doc_id").as("b_id"), col("simhash").as("sb"))
    val truth3 = a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))))
      .filter(col("hamming") <= 3)
      .select(col("a_id"), col("b_id"))
      .as[(Long, Long)].collect().map(p => pairKey(p._1, p._2)).toSet
    assert(truth3.size >= 5, s"seed produced only ${truth3.size} pairs at <= 3")

    val found = Dedup.simhashWideNeardupOn(docs)
      .select("a_id", "b_id").as[(Long, Long)].collect()
      .map(p => pairKey(p._1, p._2)).toSet
    val recall3 = truth3.count(found).toDouble / truth3.size
    info(f"wide-band recall: $recall3%.3f at <=3 (${truth3.size} pairs)")
    // 4 bands x 15 bits: <= 3 differing bits still leave a clean band —
    // the guarantee survives the 128x bucket-count increase
    assert(recall3 == 1.0,
      f"pigeonhole guarantee violated at 15-bit bands: $recall3%.3f")
  }

  test("ann_lsh recall >= 0.6 vs exact cosine on seeded near-identical vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def vec(): Array[Double] = Array.fill(64)(rnd.nextGaussian())
    // 20 base vectors; the first 12 get a tiny-perturbation dup
    // (cosine ≈ 0.999 — the hyperplane-sign bucket rarely flips)
    val bases = (0 until 20).map(i => (i.toLong, vec()))
    val dups = bases.take(12).map { case (i, v) =>
      (100L + i, v.map(x => x + 0.02 * rnd.nextGaussian()))
    }
    val embs = (bases ++ dups)
      .map { case (id, v) => (id, 0L, v.toSeq) }
      .toDF("vec_id", "label", "embedding")

    // exact baseline: all-pairs cosine > 0.9 (the seeded dup pairs)
    graft.plans.VectorExprs.register(spark)
    val e = embs.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val a = e.select(col("vec_id").as("a_id"), col("v").as("va"))
    val b = e.select(col("vec_id").as("b_id"), col("v").as("vb"))
    val truth = a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("sim", expr("graft_dot(va, vb)") /
        (sqrt(expr("graft_dot(va, va)")) * sqrt(expr("graft_dot(vb, vb)"))))
      .filter(col("sim") > 0.9)
      .select("a_id", "b_id").as[(Long, Long)].collect()
      .map(p => pairKey(p._1, p._2)).toSet
    assert(truth.size == 12, s"expected the 12 seeded dup pairs, got ${truth.size}")

    val found = Similarity.annLshOn(embs)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .map(p => pairKey(p._1, p._2)).toSet

    val recall = truth.count(found).toDouble / truth.size
    info(f"ann_lsh recall: $recall%.3f over ${truth.size} true pairs")
    // single-table 8-plane LSH: P(same bucket) ≈ (1 - θ/π)^8 ≈ 0.9 at
    // cosine 0.999 — the floor reflects the documented recall/cost trade
    assert(recall >= 0.6,
      f"ANN-LSH recall $recall%.3f below floor 0.6 (${truth.size} true pairs)")

    // the multi-table variant (4 × 6 planes, collide-in-ANY-table) is
    // the recall lever IN EXPECTATION — the two variants use independent
    // plane sets, so per-instance dominance isn't guaranteed and is not
    // asserted; the check is the raised absolute floor on seeded truth
    val foundMulti = Similarity.annLshMultiOn(embs)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .map(p => pairKey(p._1, p._2)).toSet
    val recallMulti = truth.count(foundMulti).toDouble / truth.size
    info(f"ann_lsh_multi recall: $recallMulti%.3f over ${truth.size} true pairs")
    assert(recallMulti >= 0.8,
      f"multi-table recall $recallMulti%.3f below floor 0.8")
    spark.catalog.clearCache()
  }

  test("ann_ivf_probe: nprobe=2 recall@3 vs brute force; structure valid") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = Similarity.annIvfProbe(spark, sf).cache()
    try {
      assert(df.filter(col("query_id") === col("neighbor_id")).count() == 0,
        "self-match leaked into the neighbor list")
      assert(df.filter(col("rank") < 1 || col("rank") > 3).count() == 0)
      val probe = df.select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet
      // brute-force truth: top-3 by (sim desc, id asc) over ALL pairs
      graft.plans.VectorExprs.register(spark)
      val e = Tables.load(spark, sf, "embeddings")
        .select(col("vec_id"),
          expr("cast(embedding as array<double>)").as("v"))
      val a = e.select(col("vec_id").as("a_id"), col("v").as("va"))
      val b = e.select(col("vec_id").as("b_id"), col("v").as("vb"))
      val scored = a.crossJoin(b).filter(col("a_id") =!= col("b_id"))
        .withColumn("sim", expr("graft_dot(va, vb) / " +
          "(sqrt(graft_dot(va, va)) * sqrt(graft_dot(vb, vb)))"))
      val w = Window.partitionBy(col("a_id"))
        .orderBy(col("sim").desc, col("b_id").asc)
      val truth = scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      val recall = truth.count(probe).toDouble / truth.size
      info(f"ann_ivf_probe recall@3: $recall%.3f over ${truth.size} truths")
      // the fixture's labels are NOT geometric clusters, so recall can
      // only track probe coverage (nprobe/k = 2/5 = 0.4 here) — the
      // honest IVF property: index quality bounds recall, nprobe buys
      // coverage. The geometric-cluster test below shows the same code
      // at ~1.0 when cells mean something.
      assert(recall >= 0.35,
        f"nprobe=2 recall $recall%.3f fell below the 2-of-5-cell " +
          "coverage baseline — the probe join itself is broken")
    } finally { df.unpersist(); spark.catalog.clearCache() }
  }

  test("ann_lsh_multi_wide: 10-plane geometry cuts bucket occupancy and candidate pairs vs 6-plane") {
    // the knob for the measured super-linear saturation (SCALING.md
    // §Measured): same corpus, both geometries, occupancy compared
    graft.plans.VectorExprs.register(spark)
    val e = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), expr("cast(embedding as array<double>)").as("v"))
    def pairsFor(planes: Int => Seq[Array[Double]]): (Long, Long) = {
      val occ = (0 until 4).map { l =>
        val bucket = planes(l).zipWithIndex.map { case (p, j) =>
          val lit = p.map(x => s"${x}D").mkString("array(", ", ", ")")
          when(expr(s"graft_dot(v, $lit)") > 0,
            org.apache.spark.sql.functions.lit(1 << j))
            .otherwise(org.apache.spark.sql.functions.lit(0))
        }.reduce(_ + _)
        e.select(org.apache.spark.sql.functions.lit(l).as("tbl"),
          bucket.as("bucket"))
      }.reduce(_ unionByName _)
        .groupBy("tbl", "bucket").count()
      val maxOcc = occ.agg(max("count")).head.getLong(0)
      val pairs = occ.agg(sum(expr("count * (count - 1) div 2")))
        .head.getLong(0)
      (maxOcc, pairs)
    }
    val (maxNarrow, pairsNarrow) =
      pairsFor(graft.operators.Similarity.planesFor)
    val (maxWide, pairsWide) =
      pairsFor(graft.operators.Similarity.planesForWide)
    info(s"occupancy max narrow=$maxNarrow wide=$maxWide; " +
      s"candidate pairs narrow=$pairsNarrow wide=$pairsWide")
    assert(maxWide < maxNarrow,
      "wide geometry did not reduce peak bucket occupancy")
    assert(pairsWide * 4 <= pairsNarrow,
      s"expected >=4x candidate reduction, got $pairsNarrow -> $pairsWide")
  }

  test("ann_ivf_subcell: residual-sign refinement cuts block occupancy; recall holds on seeded near-identical vectors") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfsub").toString
    try {
      // ONE label cell: the subcell refinement is the only blocking, so
      // this isolates exactly what the knob buys. 40 base vectors, the
      // first 24 get a near-identical dup (cosine ≈ 0.999) — residuals
      // of a dup pair share sign except where a component sits within
      // the perturbation of the centroid boundary.
      val rnd = new scala.util.Random(11)
      def vec(): Array[Double] = Array.fill(16)(rnd.nextGaussian())
      val bases = (0 until 40).map(i => (i.toLong, vec()))
      val dups = bases.take(24).map { case (i, v) =>
        (100L + i, v.map(x => x + 0.02 * rnd.nextGaussian()))
      }
      (bases ++ dups).map { case (id, v) => (id, 0L, v.toSeq) }
        .toDF("vec_id", "label", "embedding")
        .write.parquet(s"$dir/embeddings.parquet")

      // occupancy: blocks by cell alone vs (cell, sub) — the candidate
      // volume Σ n(n-1)/2 is what saturates at scale
      val blocks = Similarity.ivfAssignedBlocks(spark, dir).cache()
      def pairs(cols: Seq[String]): Long =
        blocks.groupBy(cols.map(col): _*).count()
          .agg(sum(expr("count * (count - 1) div 2"))).head.getLong(0)
      val cellPairs = pairs(Seq("cell"))
      val subPairs = pairs(Seq("cell", "sub"))
      info(s"candidate pairs: cell-only=$cellPairs refined=$subPairs")
      assert(subPairs * 3 <= cellPairs,
        s"expected >=3x candidate reduction from ${1 << 3} subcells, " +
          s"got $cellPairs -> $subPairs")
      blocks.unpersist()

      // recall on the seeded dup pairs (the exact cosine > 0.9 truths)
      graft.plans.VectorExprs.register(spark)
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("v"))
      val a = e.select(col("vec_id").as("a_id"), col("v").as("va"))
      val b = e.select(col("vec_id").as("b_id"), col("v").as("vb"))
      val truth = a.crossJoin(b).filter(col("a_id") < col("b_id"))
        .withColumn("sim", expr("graft_dot(va, vb)") /
          (sqrt(expr("graft_dot(va, va)")) * sqrt(expr("graft_dot(vb, vb)"))))
        .filter(col("sim") > 0.9)
        .select("a_id", "b_id").as[(Long, Long)].collect()
        .map(p => pairKey(p._1, p._2)).toSet
      assert(truth.size == 24, s"expected 24 seeded dup pairs, got ${truth.size}")
      val found = Similarity.annIvfSubcell(spark, dir)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .map(p => pairKey(p._1, p._2)).toSet
      val recall = truth.count(found).toDouble / truth.size
      info(f"ann_ivf_subcell recall: $recall%.3f over ${truth.size} true pairs")
      // a dup pair separates only when a residual component lies within
      // the perturbation of the centroid boundary (~2% per bit, 3 bits)
      assert(recall >= 0.75,
        f"subcell recall $recall%.3f below floor 0.75 — refinement is " +
          "splitting near-identical pairs far beyond the boundary-flip rate")

      // the Hamming-1 multi-probe variant (r9, ROADMAP carry): its
      // candidate set is a strict superset (the own-subcell probe is in
      // the probe set), so recall can only improve — and a dup pair is
      // now missed only when >= 2 residual components straddle their
      // centroid boundaries, so the floor rises to the auto face's
      spark.catalog.clearCache()
      val foundProbe = Similarity.annIvfSubcellProbe(spark, dir)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .map(p => pairKey(p._1, p._2)).toSet
      val recallProbe = truth.count(foundProbe).toDouble / truth.size
      info(f"ann_ivf_subcell_probe recall: $recallProbe%.3f")
      assert(recallProbe >= recall,
        f"multi-probe recall $recallProbe%.3f fell below the non-probe " +
          f"face's $recall%.3f — its candidates are a superset, impossible")
      assert(recallProbe >= 0.85,
        f"multi-probe recall $recallProbe%.3f below floor 0.85 — " +
          "Hamming-1 probing is not recovering single boundary flips")
      spark.catalog.clearCache()
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("ann_ivf_auto: bits derive from corpus size; occupancy stays bounded; Hamming-1 probing holds recall on seeded near-identicals") {
    import spark.implicits._
    // the sizing rule itself: block count tracks N (the SCALING.md law)
    assert(Similarity.ivfAutoBits(100, 10) == 1)
    assert(Similarity.ivfAutoBits(1000, 10) == 4)
    assert(Similarity.ivfAutoBits(10000, 10) == 7)
    assert(Similarity.ivfAutoBits(100000, 10) == 11)
    // 10x data => +3..4 bits => ~10x blocks => occupancy ~constant
    assert(Similarity.ivfAutoBits(10, 1) == 1, "tiny corpora floor at 1 bit")
    assert(Similarity.ivfAutoBits(Long.MaxValue / 16, 1) == 16, "cap holds")

    val dir = java.nio.file.Files.createTempDirectory("graft-ivfauto").toString
    try {
      // one label cell, 80 bases + 40 seeded near-identical dups: n=120,
      // k=1 → bits = 4 (1·2⁴·8 = 128 ≥ 120), i.e. 16 subcells — WIDER
      // than the fixed 3-bit face, which is the point of the auto sizing
      val rnd = new scala.util.Random(11)
      def vec(): Array[Double] = Array.fill(16)(rnd.nextGaussian())
      val bases = (0 until 80).map(i => (i.toLong, vec()))
      val dups = bases.take(40).map { case (i, v) =>
        (200L + i, v.map(x => x + 0.02 * rnd.nextGaussian()))
      }
      (bases ++ dups).map { case (id, v) => (id, 0L, v.toSeq) }
        .toDF("vec_id", "label", "embedding")
        .write.parquet(s"$dir/embeddings.parquet")

      val (bits, blocks0) = Similarity.ivfAutoBlocks(spark, dir)
      assert(bits == 4,
        s"auto face must size from the corpus (n=120, k=1 -> 4), got $bits")
      val blocks = blocks0.cache()
      def pairs(cols: Seq[String]): Long =
        blocks.groupBy(cols.map(col): _*).count()
          .agg(sum(expr("count * (count - 1) div 2"))).head.getLong(0)
      val cellPairs = pairs(Seq("cell"))
      val subPairs = pairs(Seq("cell", "sub"))
      info(s"bits=$bits candidate pairs: cell-only=$cellPairs auto=$subPairs")
      // 2^4 subcells on near-gaussian data: expect a much deeper cut
      // than the fixed 3-bit face's 3x floor
      assert(subPairs * 5 <= cellPairs,
        s"auto blocking cut only $cellPairs -> $subPairs")
      blocks.unpersist()

      // recall on the seeded dup pairs: a pair separates only when >= 2
      // residual components straddle their centroid boundary (Hamming-1
      // probing recovers every single-flip miss)
      graft.plans.VectorExprs.register(spark)
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("v"))
      val a = e.select(col("vec_id").as("a_id"), col("v").as("va"))
      val b = e.select(col("vec_id").as("b_id"), col("v").as("vb"))
      val truth = a.crossJoin(b).filter(col("a_id") < col("b_id"))
        .withColumn("sim", expr("graft_dot(va, vb)") /
          (sqrt(expr("graft_dot(va, va)")) * sqrt(expr("graft_dot(vb, vb)"))))
        .filter(col("sim") > 0.9)
        .select("a_id", "b_id").as[(Long, Long)].collect()
        .map(p => pairKey(p._1, p._2)).toSet
      assert(truth.size == 40, s"expected 40 seeded dup pairs, got ${truth.size}")
      val found = Similarity.annIvfAuto(spark, dir)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .map(p => pairKey(p._1, p._2)).toSet
      val recall = truth.count(found).toDouble / truth.size
      info(f"ann_ivf_auto recall: $recall%.3f over ${truth.size} true pairs")
      assert(recall >= 0.85,
        f"auto recall $recall%.3f below floor 0.85 — Hamming-1 probing " +
          "is not recovering boundary flips")
      spark.catalog.clearCache()
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("ann_ivf_probe: near-perfect recall on geometric clusters incl. cross-boundary queries") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    try {
      // three well-separated clusters (centers 10·e0, 10·e1, 10·e2) with
      // deterministic jitter, plus boundary points midway A↔B whose
      // nearest neighbors live in BOTH cells — exactly what nprobe=1
      // misses and nprobe=2 must recover
      def vec(c: Int, j: Int): Array[Float] = {
        val v = Array.fill(8)(0.0f)
        v(c) = 10.0f
        v((c + j) % 8) += 0.1f * (j + 1)
        v
      }
      val core = for (c <- 0 until 3; j <- 0 until 10)
        yield (c * 100L + j, vec(c, j), c)
      val boundary = (0 until 4).map { j =>
        val v = Array.fill(8)(0.0f)
        v(0) = 7.0f; v(1) = 7.0f; v(7) = 0.05f * (j + 1)
        (900L + j, v, j % 2) // labeled A or B — either way both get probed
      }
      (core ++ boundary).toDF("vec_id", "embedding", "label")
        .write.parquet(s"$dir/embeddings.parquet")

      val probe = Similarity.annIvfProbe(spark, dir)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      graft.plans.VectorExprs.register(spark)
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"),
          expr("cast(embedding as array<double>)").as("v"))
      val a = e.select(col("vec_id").as("a_id"), col("v").as("va"))
      val b = e.select(col("vec_id").as("b_id"), col("v").as("vb"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("a_id")).orderBy(col("sim").desc, col("b_id").asc)
      val truth = a.crossJoin(b).filter(col("a_id") =!= col("b_id"))
        .withColumn("sim", expr("graft_dot(va, vb) / " +
          "(sqrt(graft_dot(va, va)) * sqrt(graft_dot(vb, vb)))"))
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      val recall = truth.count(probe).toDouble / truth.size
      info(f"geometric-cluster recall@3: $recall%.3f over ${truth.size}")
      assert(recall >= 0.9,
        f"recall $recall%.3f < 0.9 on separable clusters — the probe " +
          "face is not recovering cross-boundary neighbors")
      spark.catalog.clearCache()
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("ann_lsh_auto: planes derive from corpus size; occupancy tracks the target at 10x data; recall holds on seeded near-identicals") {
    import spark.implicits._
    // the sizing rule: smallest p with 2^p * 8 >= n (p ~ log2(n/8))
    assert(Similarity.lshAutoPlanes(10) == 1, "tiny corpora floor at 1 plane")
    assert(Similarity.lshAutoPlanes(100) == 4)
    assert(Similarity.lshAutoPlanes(1000) == 7)
    assert(Similarity.lshAutoPlanes(10000) == 11)
    assert(Similarity.lshAutoPlanes(100000) == 14)
    // the width a 100 TB corpus actually asks for fits the 32-plane sets
    assert(Similarity.lshAutoPlanes(1000000000L) == 27)
    assert(Similarity.lshAutoPlanes(Long.MaxValue / 16) == 32, "cap holds")

    // prefix-maskability: the first p planes of the fixed 32-plane set
    // ARE the p-plane geometry, so growing p refines buckets by
    // splitting — verify the plane sets are stable and table-distinct
    assert(Similarity.planesForAuto(0).take(4).map(_.toSeq) ==
      Similarity.planesForAuto(0).take(4).map(_.toSeq))
    assert(Similarity.planesForAuto(0).head.toSeq !=
      Similarity.planesForAuto(1).head.toSeq)

    def corpus(nBase: Int, seed: Int): Seq[(Long, Long, Seq[Double])] = {
      val rnd = new scala.util.Random(seed)
      def vec(): Array[Double] = Array.fill(64)(rnd.nextGaussian())
      val bases = (0 until nBase).map(i => (i.toLong, vec()))
      val dups = bases.take(nBase / 2).map { case (i, v) =>
        (100000L + i, v.map(x => x + 0.02 * rnd.nextGaussian()))
      }
      (bases ++ dups).map { case (id, v) => (id, 0L, v.toSeq) }
    }

    // occupancy law: avg bucket occupancy stays near the target as the
    // corpus grows 10x, because p grows with log2(N)
    def avgOccupancy(rows: Seq[(Long, Long, Seq[Double])]): Double = {
      graft.plans.VectorExprs.register(spark)
      val p = Similarity.lshAutoPlanes(rows.size)
      val e = rows.toDF("vec_id", "label", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val bucket = Similarity.planesForAuto(0).take(p).zipWithIndex
        .map { case (pl, j) =>
          when(expr(s"graft_dot(v, ${Similarity.planeSparkLit(pl)})") > 0,
            lit(1L << j)).otherwise(lit(0L))
        }.reduce(_ + _)
      e.select(bucket.as("b")).groupBy("b").count()
        .agg(avg("count")).head.getDouble(0)
    }
    val occ1 = avgOccupancy(corpus(80, 11))
    val occ10 = avgOccupancy(corpus(800, 12))
    info(f"avg occupancy: 1x=$occ1%.1f 10x=$occ10%.1f (target 8)")
    assert(occ10 <= 3 * occ1 + 8,
      f"occupancy must stay ~flat across 10x data, got $occ1%.1f -> $occ10%.1f")

    val dir = java.nio.file.Files.createTempDirectory("graft-lshauto").toString
    try {
      corpus(80, 11).toDF("vec_id", "label", "embedding")
        .write.parquet(s"$dir/embeddings.parquet")
      graft.plans.VectorExprs.register(spark)
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("v"))
      val a = e.select(col("vec_id").as("a_id"), col("v").as("va"))
      val b = e.select(col("vec_id").as("b_id"), col("v").as("vb"))
      val truth = a.crossJoin(b).filter(col("a_id") < col("b_id"))
        .withColumn("sim", expr("graft_dot(va, vb)") /
          (sqrt(expr("graft_dot(va, va)")) * sqrt(expr("graft_dot(vb, vb)"))))
        .filter(col("sim") > 0.9)
        .select("a_id", "b_id").as[(Long, Long)].collect()
        .map(p => pairKey(p._1, p._2)).toSet
      assert(truth.size == 40, s"expected 40 seeded dup pairs, got ${truth.size}")
      val found = Similarity.annLshAuto(spark, dir)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .map(p => pairKey(p._1, p._2)).toSet
      val recall = truth.count(found).toDouble / truth.size
      info(f"ann_lsh_auto recall: $recall%.3f over ${truth.size} true pairs")
      // near-identical pairs flip a plane only when it passes between
      // them; 4 tables + Hamming-1 probing make a miss need >= 2 flips
      // in EVERY table
      assert(recall >= 0.9,
        f"auto recall $recall%.3f below floor 0.9")
      spark.catalog.clearCache()
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
