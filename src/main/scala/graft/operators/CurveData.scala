package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic mult-x corpora for the scaling curve (see graft.ScaleCurve
  * for the measurement harness and the synthesis-rule rationale).
  */
object CurveData {

  /** Per-copy key offset — far above any base key. */
  private val keyStride = 10000000000L

  private def unionCopies(base: DataFrame, mult: Int)(
      rekey: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until mult).map(k => if (k == 0) base else rekey(base, k))
      .reduce(_ unionByName _)

  def synth(spark: SparkSession, baseDir: String, mult: Int): String = {
    val t = TmpData.tag(baseDir)
    val root = TmpData.path(s"curve${mult}x", t)
    TmpData.once(s"curve${mult}x:$t") {
      Files.createDirectories(Paths.get(root))
      // input-split count tracks the corpus but caps: at 400× a
      // 16·mult layout would mean 6400 splits of a 200k-row table —
      // pure task-scheduling overhead at this box's scale
      val parts = math.min(16 * mult, 512)

      val docs = spark.read.parquet(s"$baseDir/documents.parquet")
      unionCopies(docs, mult) { (d, k) =>
        d.select((col("doc_id") + lit(k * keyStride)).as("doc_id"),
          array_join(transform(split(col("text"), " "),
            tok => concat(tok, lit("~" + k))), " ").as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.repartition(parts).write.mode("overwrite")
        .parquet(s"$root/documents.parquet")

      // per-copy coordinate ROTATION, not a constant shift: rotation
      // preserves every within-copy dot product and norm exactly (the
      // copy's neighbor structure is bit-identical to the base) while
      // decorrelating sign-hyperplane projections across copies. A
      // constant shift c·1 instead adds c·Σw to EVERY projection, so at
      // large c one copy collapses into a single LSH bucket and the
      // verify step goes quadratic — a synthesis artifact, not a
      // property of the engine (observed: ann_lsh_multi 10x hung).
      //
      // Rotations alone wrap at 64 copies (64-dim vectors): copy 64
      // would stack EXACT duplicates of copy 0, turning a >64× corpus
      // into an all-duplicates fixture. Copies beyond 64 therefore also
      // apply a per-group deterministic SIGN PATTERN (r9, unblocking
      // the 100×/400× crossover measurement): a diagonal ±1 transform
      // is orthogonal, so within-copy dot products and norms are still
      // EXACTLY preserved, while projections decorrelate across groups
      // — 64·2⁶⁴ distinct transforms, far past any mult this harness
      // meets. x·(±1) then cast back to float is lossless.
      val emb = spark.read.parquet(s"$baseDir/embeddings.parquet")
      unionCopies(emb, mult) { (d, k) =>
        val r = k % 64
        val g = k / 64
        val rot =
          s"concat(slice(embedding, ${r + 1}, size(embedding) - $r), " +
            s"slice(embedding, 1, $r))"
        val rotFlip =
          if (g == 0) rot
          else {
            val md = java.security.MessageDigest.getInstance("MD5")
            val signs = (0 until 64).map { i =>
              val h = md.digest(s"curvesign:$g:$i".getBytes)
              if ((h(0) & 1) == 0) 1 else -1
            }
            s"zip_with($rot, ${signs.mkString("array(", ", ", ")")}, " +
              "(x, s) -> CAST(x * s AS FLOAT))"
          }
        d.select((col("vec_id") + lit(k * keyStride)).as("vec_id"),
          expr(rotFlip).as("embedding"), col("label"))
      }.repartition(parts).write.mode("overwrite")
        .parquet(s"$root/embeddings.parquet")

      val li = spark.read.parquet(s"$baseDir/lineitem.parquet")
      unionCopies(li, mult) { (d, k) =>
        d.withColumn("l_orderkey", col("l_orderkey") + lit(k * keyStride))
      }.repartition(parts).write.mode("overwrite")
        .parquet(s"$root/lineitem.parquet")

      val o = spark.read.parquet(s"$baseDir/orders.parquet")
      unionCopies(o, mult) { (d, k) =>
        d.withColumn("o_orderkey", col("o_orderkey") + lit(k * keyStride))
      }.repartition(parts).write.mode("overwrite")
        .parquet(s"$root/orders.parquet")

      val synthesized = Set("documents", "embeddings", "lineitem", "orders")
      linkRest(baseDir, root, synthesized)
    }
    root
  }

  /** High-duplication documents fixture: mult copies of the base corpus
    * with RE-KEYED doc_ids but UNCHANGED text — the adversarial opposite
    * of [[synth]]'s content-disjoint copies. Every gram present in the
    * base becomes a cross-document duplicate, so the bloom pre-filter in
    * dup_ngram_spans passes essentially every position and the exact
    * semi-join sees the FULL gram stream: this measures the operator's
    * floor when its selectivity assumption ("most positions are NOT
    * duplicated") is maximally violated — template-spam / boilerplate
    * corpora do exactly this in production.
    */
  def synthDup(spark: SparkSession, baseDir: String, mult: Int): String = {
    val t = TmpData.tag(baseDir)
    val root = TmpData.path(s"curvedup${mult}x", t)
    TmpData.once(s"curvedup${mult}x:$t") {
      Files.createDirectories(Paths.get(root))
      val docs = spark.read.parquet(s"$baseDir/documents.parquet")
      unionCopies(docs, mult) { (d, k) =>
        d.withColumn("doc_id", col("doc_id") + lit(k * keyStride))
      }.repartition(16 * mult).write.mode("overwrite")
        .parquet(s"$root/documents.parquet")
      linkRest(baseDir, root, Set("documents"))
    }
    root
  }

  private def linkRest(baseDir: String, root: String,
      synthesized: Set[String]): Unit = {
    for (f <- new java.io.File(baseDir).listFiles().toSeq
        .filter(_.getName.endsWith(".parquet"))
        .filterNot(f => synthesized(f.getName.stripSuffix(".parquet")))) {
      val link = Paths.get(root, f.getName)
      Files.deleteIfExists(link)
      Files.createSymbolicLink(link, f.toPath.toAbsolutePath)
    }
  }
}
