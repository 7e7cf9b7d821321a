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
      val parts = 16 * mult

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
      val emb = spark.read.parquet(s"$baseDir/embeddings.parquet")
      unionCopies(emb, mult) { (d, k) =>
        val r = k % 64
        d.select((col("vec_id") + lit(k * keyStride)).as("vec_id"),
          expr(s"concat(slice(embedding, ${r + 1}, size(embedding) - $r), " +
            s"slice(embedding, 1, $r))").as("embedding"),
          col("label"))
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
