package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.{canon, canonOrderSql, load}

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Dot products use higher-order functions (zip_with + aggregate) over
  * vectors cast to array<double> — strictly left-to-right summation, so
  * results are bit-identical to the DuckDB oracle's list_dot_product and
  * the formula dot / (sqrt(dot_aa) * sqrt(dot_bb)) is mirrored exactly.
  *
  * Scale path: all pair generation is blocked on the `label` column
  * (IVF-style cell restriction) — candidate pairs are |cell|² per cell,
  * never N². At 100 TB the label plays the coarse-quantizer cell id;
  * the same-label equi-join shuffles both sides on label once. The
  * brute-force all-pairs variant is intentionally absent.
  */
object Similarity {

  /** Vectors with their norms precomputed ONCE per vector (not per pair —
    * at N vectors and P pairs that is N sqrt+dot evaluations instead of
    * 2P). Dot products use the codegen'd native DotProduct expression.
    */
  private def vecs(spark: SparkSession, sfDir: String): DataFrame =
    // NOTE: deliberately NOT repartitioned here — at test scale the
    // label join broadcasts one side, so an input repartition is a pure
    // extra shuffle (measured +0.5s); at real scale the table arrives in
    // many splits and the join shuffles on the cell id anyway.
    vecsOn(load(spark, sfDir, "embeddings"))

  private def vecsOn(d: DataFrame): DataFrame = {
    graft.plans.VectorExprs.register(d.sparkSession)
    d.select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
  }

  /** sim = dot(a,b) / (||a|| * ||b||) — identical double sequence to the
    * per-pair HOF formula dot / (sqrt(dot_aa) * sqrt(dot_bb)).
    */
  private def cosine: org.apache.spark.sql.Column =
    expr("graft_dot(va, vb)") / (col("na") * col("nb"))

  /** Same-label pair similarities above a threshold (IVF-blocked). */
  def cosinePairs(spark: SparkSession, sfDir: String): DataFrame = {
    val e = vecs(spark, sfDir)
    val a = e.select(col("vec_id").as("a_id"), col("label"),
      col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("b_id"), col("label"),
      col("v").as("vb"), col("nrm").as("nb"))
    val out = a.join(b, Seq("label"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("sim", cosine)
      .filter(col("sim") > 0.35)
      .select(col("a_id"), col("b_id"), col("label").as("cell"),
        round(col("sim"), 6).as("sim_r"))
    canon(out)
  }

  private val duckCos =
    "list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"

  val cosinePairsSql: String =
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
       |SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.label AS cell,
       |  round($duckCos, 6) AS sim_r
       |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
       |WHERE $duckCos > 0.35
       |${canonOrderSql(Seq("a_id", "b_id", "cell", "sim_r"))}""".stripMargin

  /** ANN top-k per query vector, restricted to its IVF cell (label):
    * rank by (similarity DESC, neighbor id ASC) — deterministic.
    */
  def annTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val e = vecs(spark, sfDir)
    val q = e.select(col("vec_id").as("query_id"), col("label"),
      col("v").as("va"), col("nrm").as("na"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("label"),
      col("v").as("vb"), col("nrm").as("nb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    val out = q.join(c, Seq("label"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("sim"), 6).as("sim_r"))
    canon(out)
  }

  val annTopkSql: String =
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |scored AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    $duckCos AS sim
       |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, sim,
       |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, rank, round(sim, 6) AS sim_r
       |FROM ranked WHERE rank <= 3
       |${canonOrderSql(Seq("query_id", "neighbor_id", "rank", "sim_r"))}""".stripMargin

  /** Embedding-cosine near-dup: each doc maps to its lowest-id neighbor
    * above the dup threshold (transitive chains keep the min id).
    */
  def dedupEmbedding(spark: SparkSession, sfDir: String): DataFrame = {
    val e = vecs(spark, sfDir)
    val a = e.select(col("vec_id").as("a_id"), col("label"),
      col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("b_id"), col("label"),
      col("v").as("vb"), col("nrm").as("nb"))
    val out = a.join(b, Seq("label"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("sim", cosine)
      .filter(col("sim") > 0.44)
      .groupBy(col("b_id").as("dup_id"))
      .agg(min(col("a_id")).as("keep_id"), count(lit(1)).as("n_matches"))
    canon(out)
  }

  val dedupEmbeddingSql: String =
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
       |SELECT b.vec_id AS dup_id, min(a.vec_id) AS keep_id, count(*) AS n_matches
       |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
       |WHERE $duckCos > 0.44
       |GROUP BY 1
       |${canonOrderSql(Seq("dup_id", "keep_id", "n_matches"))}""".stripMargin

  // ---- hyperplane-LSH ANN (the bucketed scale path complementing the
  // IVF/label variant) ------------------------------------------------

  /** 8 deterministic pseudo-random hyperplanes derived from md5 — every
    * component is a half-integer in [-7.5, 7.5] (hex digit − 7.5), so
    * the plane literals are EXACTLY representable doubles and both
    * engines compute bit-identical projections (sign decisions can't
    * diverge by an ulp).
    */
  private[operators] val planes: Seq[Array[Double]] = {
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes).map("%02x".format(_)).mkString
    (0 until 8).map { j =>
      (md5hex(s"p:$j:0") + md5hex(s"p:$j:1"))
        .map(c => Integer.parseInt(c.toString, 16) - 7.5).toArray
    }
  }

  private def planeSqlLit(p: Array[Double]): String =
    p.map(x => if (x == x.floor) f"$x%.1f" else x.toString).mkString("[", ", ", "]")

  private def planeSparkLit(p: Array[Double]): String =
    p.map(x => s"${x}D").mkString("array(", ", ", ")")

  /** ANN via hyperplane LSH: bucket = sign bits of 8 projections;
    * candidates are same-bucket pairs only (no cell/label metadata
    * needed — the pure content-based scale path). Approximate: vectors
    * alone in their bucket return no neighbors.
    */
  def annLsh(spark: SparkSession, sfDir: String): DataFrame =
    annLshOn(vecs(spark, sfDir))

  /** Core on an arbitrary (vec_id, label, embedding) relation — lets
    * specs seed vectors with known near-dups (LshRecallSpec).
    */
  def annLshOn(d: DataFrame): DataFrame = {
    val e = if (d.columns.contains("v")) d else vecsOn(d)
    val bucket = planes.zipWithIndex.map { case (p, j) =>
      when(expr(s"graft_dot(v, ${planeSparkLit(p)})") > 0, lit(1 << j))
        .otherwise(lit(0))
    }.reduce(_ + _)
    val withB = e.withColumn("bucket", bucket)
    val q = withB.select(col("vec_id").as("query_id"), col("bucket"),
      col("v").as("va"), col("nrm").as("na"))
    val c = withB.select(col("vec_id").as("neighbor_id"), col("bucket"),
      col("v").as("vb"), col("nrm").as("nb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    val out = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("neighbor_id"), col("bucket"),
        col("rank"), round(col("sim"), 6).as("sim_r"))
    canon(out)
  }

  val annLshSql: String = {
    val bucketSql = planes.zipWithIndex.map { case (p, j) =>
      s"CASE WHEN list_dot_product(v, ${planeSqlLit(p)}) > 0 THEN ${1 << j} ELSE 0 END"
    }.mkString(" + ")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |b AS (SELECT vec_id, v, $bucketSql AS bucket FROM e),
       |scored AS (
       |  SELECT a.vec_id AS query_id, x.vec_id AS neighbor_id, a.bucket,
       |    list_dot_product(a.v, x.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(x.v, x.v))) AS sim
       |  FROM b a JOIN b x ON a.bucket = x.bucket AND a.vec_id <> x.vec_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, bucket, sim,
       |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, bucket, CAST(rank AS INT) AS rank,
       |  round(sim, 6) AS sim_r
       |FROM ranked WHERE rank <= 3
       |${canonOrderSql(Seq("query_id", "neighbor_id", "bucket", "rank", "sim_r"))}""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cosine_pairs" -> cosinePairs,
    "ann_topk" -> annTopk,
    "ann_lsh" -> annLsh,
    "dedup_embedding" -> dedupEmbedding)

  val oracles: Map[String, String] = Map(
    "cosine_pairs" -> cosinePairsSql,
    "ann_topk" -> annTopkSql,
    "ann_lsh" -> annLshSql,
    "dedup_embedding" -> dedupEmbeddingSql)
}
