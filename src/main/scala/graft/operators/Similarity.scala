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
        // floor-µ-units, not round(x, 6): round's decimal half-rule can
        // diverge between engines on a stored double (proved by
        // sales_rank at sf0.1); floor of the identical double has no
        // half case. Discipline applied to every ratio emission.
        floor(col("sim") * lit(1000000.0)).cast("long").as("sim_micro"))
    canon(out)
  }

  private val duckCos =
    "list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"

  val cosinePairsSql: String =
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
       |SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.label AS cell,
       |  CAST(floor($duckCos * 1000000.0) AS BIGINT) AS sim_micro
       |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
       |WHERE $duckCos > 0.35
       |${canonOrderSql(Seq("a_id", "b_id", "cell", "sim_micro"))}""".stripMargin

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
        floor(col("sim") * lit(1000000.0)).cast("long").as("sim_micro"))
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
       |SELECT query_id, neighbor_id, rank,
       |  CAST(floor(sim * 1000000.0) AS BIGINT) AS sim_micro
       |FROM ranked WHERE rank <= 3
       |${canonOrderSql(Seq("query_id", "neighbor_id", "rank", "sim_micro"))}""".stripMargin

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
  /** The ONE plane constructor (parity-critical: exactly-representable
    * half-integer components so both engines' sign decisions agree) —
    * both LSH variants derive their plane sets from it, only the salt
    * and count differ.
    */
  private def mkPlanes(n: Int, salt: Int => String): Seq[Array[Double]] = {
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes).map("%02x".format(_)).mkString
    (0 until n).map { j =>
      (md5hex(s"${salt(j)}:0") + md5hex(s"${salt(j)}:1"))
        .map(c => Integer.parseInt(c.toString, 16) - 7.5).toArray
    }
  }

  private[operators] val planes: Seq[Array[Double]] =
    mkPlanes(8, j => s"p:$j")

  private[graft] def planeSqlLit(p: Array[Double]): String =
    p.map(x => if (x == x.floor) f"$x%.1f" else x.toString).mkString("[", ", ", "]")

  private[graft] def planeSparkLit(p: Array[Double]): String =
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
        col("rank"),
        floor(col("sim") * lit(1000000.0)).cast("long").as("sim_micro"))
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
       |  CAST(floor(sim * 1000000.0) AS BIGINT) AS sim_micro
       |FROM ranked WHERE rank <= 3
       |${canonOrderSql(Seq("query_id", "neighbor_id", "bucket", "rank", "sim_micro"))}""".stripMargin
  }

  /** IVF centroid residuals — the coarse-quantizer training/assignment
    * step behind the `ann_topk` cell restriction: per-cell centroids
    * (dimension-wise mean) and each vector's L2 distance to its cell
    * centroid (the residual a product quantizer would encode).
    *
    * Cross-row float sums are order-dependent, so all aggregated values
    * are quantized FIRST (floor(x·10⁶) → exact BIGINT sums, order-free;
    * floor has no round-half ambiguity) and every remaining double op is
    * per-row deterministic — both engines produce identical bits.
    *
    * Scale: the dimension explode is ×dim rows, but the centroid
    * relation is FIXED cardinality (cells × dims = 640 here), hence the
    * justified broadcast; one shuffle for the centroid agg, one for the
    * per-vector residual sum.
    */
  def centroidResiduals(spark: SparkSession, sfDir: String): DataFrame = {
    // the residual is against the vector's OWN cell only, so the kernel
    // join is a broadcast equi-join on the cell id (N rows, one d2qExpr
    // evaluation each) — the exploded join-on-(label,pos) + groupBy it
    // replaces computed the identical per-pos terms and long sum
    val vf = Caching.persistOnce(vecsFull(spark, sfDir))
    val centArr = centArrOf(centroidsOf(quantizedOf(vf)))
    val out = vf.select(col("vec_id"), col("label"), col("xqs"))
      .join(broadcast(centArr), col("label") === col("cand"))
      .select(col("vec_id"), col("label").as("cell"),
        floor(sqrt(expr(d2qExpr).cast("double") / lit(1.0e12))
          * lit(1000000.0)).cast("long").as("dist_micro"))
    canon(out)
  }

  val centroidResidualsSql: String =
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |px AS (SELECT vec_id, label, v,
       |         unnest(generate_series(1, len(v))) AS i FROM e),
       |pos AS (SELECT vec_id, label, i - 1 AS pos, v[i] AS x FROM px),
       |q AS (SELECT vec_id, label, pos,
       |        CAST(floor(x * 1000000) AS BIGINT) AS xq FROM pos),
       |cent AS (SELECT label, pos,
       |           CAST(sum(xq) AS DOUBLE) / (1000000.0 * count(*)) AS c
       |         FROM q GROUP BY 1, 2),
       |r AS (SELECT q.vec_id, q.label,
       |        CAST(floor(
       |          ((CAST(q.xq AS DOUBLE) / 1000000.0 - c.c)
       |            * (CAST(q.xq AS DOUBLE) / 1000000.0 - c.c)) * 1e12)
       |          AS BIGINT) AS sqq
       |      FROM q JOIN cent c ON q.label = c.label AND q.pos = c.pos)
       |SELECT vec_id, label AS cell,
       |  CAST(floor(sqrt(CAST(sum(sqq) AS DOUBLE) / 1e12) * 1000000.0)
       |    AS BIGINT) AS dist_micro
       |FROM r GROUP BY 1, 2
       |${canonOrderSql(Seq("vec_id", "cell", "dist_micro"))}""".stripMargin

  // ---- multi-table hyperplane LSH: the recall lever ------------------

  /** Per-table plane sets (6 planes each), salted by table id. */
  private[graft] def planesFor(table: Int): Seq[Array[Double]] =
    mkPlanes(6, j => s"mt:$table:$j")

  /** ANN via MULTI-TABLE hyperplane LSH: 4 independent tables of 6
    * planes each; a pair is a candidate if it collides in ANY table.
    * The standard recall lever over the single-table variant — at
    * cosine 0.9 the candidate probability rises from ~0.29 (one
    * 8-plane table) to ~0.87 (4×6), for the same number of plane dots
    * per vector (24 vs 8, still O(1)). Cost shape is unchanged: one
    * equi-join on (table, bucket), pairs bounded by bucket collisions.
    *
    * SIZE THE PLANE COUNT TO THE CORPUS (measured, SCALING.md
    * §Measured): the bucket space is 2^planes per table, so once
    * N exceeds bucket-count × target-occupancy, per-bucket population
    * grows ∝ N and candidate pairs ∝ N² — the 6-plane geometry here is
    * right for thousands of vectors and measurably super-linear by
    * ~sf1 (11.6× time at 10× data). Planes must scale with log₂(N)
    * (~20 at billions) to hold occupancy constant; nothing else in the
    * operator changes.
    */
  def annLshMulti(spark: SparkSession, sfDir: String): DataFrame =
    annLshMultiOn(vecs(spark, sfDir))

  /** Planes per table for the wide (corpus-sized) geometry: 2¹⁰ buckets
    * per table instead of 2⁶ — the log₂(N) sizing rule measured in
    * SCALING.md §Measured applied, exactly as simhash_neardup_wide
    * applies it to banded signatures.
    */
  private val widePlanes = 10

  private[graft] def planesForWide(table: Int): Seq[Array[Double]] =
    mkPlanes(widePlanes, j => s"mtw:$table:$j")

  /** The production-geometry face of [[annLshMulti]]: same 4-table
    * collide-in-ANY structure, 10 planes per table — 2⁴× more buckets,
    * so per-bucket occupancy (and the quadratic within-bucket candidate
    * term that made the 6-plane geometry super-linear by ~sf1 in the
    * measured curve) drops by the same factor. Recall per table falls
    * (more planes = stricter collision), which is why the table count
    * is the companion knob — at real scale you raise both together.
    * The spec demonstrates the occupancy/candidate reduction on the
    * same corpus; everything else (join shape, scoring, ranking) is
    * byte-identical to the narrow face.
    */
  def annLshMultiWide(spark: SparkSession, sfDir: String): DataFrame =
    annLshCore(vecs(spark, sfDir), 4, planesForWide)

  /** Core on an arbitrary (vec_id, label, embedding) relation. */
  def annLshMultiOn(d: DataFrame): DataFrame =
    annLshCore(d, 4, planesFor)

  // ---- auto-sized multi-table LSH: the DEFAULT production face -------

  /** Target per-bucket occupancy for [[annLshAuto]] — the same knob
    * role as [[ivfTargetOcc]] plays for the auto-sized IVF face.
    */
  private[graft] val lshTargetOcc = 8L

  /** Upper bound on auto-sized planes per table — the fixed width of
    * the pre-generated plane sets below. 32 (round 8, was 16): the
    * sizing rule wants p = ⌈log₂(N/occ)⌉ ≈ 27 at 10⁹ vectors, so a
    * 16-bit ceiling re-entered quadratic growth at N ≈ occ·2¹⁶ ≈ 5×10⁵
    * — measured in SCALING.md's crossover table. At 32 the cap binds
    * only past ~3×10¹⁰ vectors. Cost of the width is the ONE-OFF
    * signature computation (32 dots per table instead of 16) on the
    * write path; reads mask to the corpus-derived p and never touch
    * the unused high bits.
    */
  private[graft] val lshMaxAutoPlanes = 32

  private[graft] val lshAutoTables = 4

  /** The sizing rule, applied to hyperplane LSH: planes per table must
    * be a FUNCTION OF N, never a constant (the narrow 6-plane and wide
    * 10-plane faces above are both fixed geometries, and both saturate
    * — per-bucket occupancy grows ∝ N once N exceeds bucket-count ×
    * occupancy, and the within-bucket candidate term goes ∝ N²).
    * Smallest p ∈ [1, lshMaxAutoPlanes] with 2^p · targetOcc ≥ n, i.e.
    * p ≈ ⌈log₂(n / targetOcc)⌉: 10× data ⇒ ~3.3 more planes ⇒ ~10×
    * more buckets ⇒ occupancy (and the quadratic term) stays ~constant
    * and candidate volume scales ∝ N.
    */
  private[graft] def lshAutoPlanes(n: Long): Int = {
    var p = 1
    while (p < lshMaxAutoPlanes && (1L << p) * lshTargetOcc < n) p += 1
    p
  }

  /** PREFIX-MASKABLE plane sets: each table owns a fixed, deterministic
    * 32-plane set, and a corpus using p planes hashes with the FIRST p
    * — equivalently the low-p-bit mask of the full 32-bit bucket. Both
    * engines can therefore share one static plane literal set while the
    * WIDTH is derived from the data (the oracle SQL computes the same
    * p from count(*) and masks the same 32-bit bucket), and growing the
    * corpus refines existing buckets by splitting instead of rehashing
    * — the same property a prefix-coded LSM or extendible hash uses.
    */
  private[graft] def planesForAuto(table: Int): Seq[Array[Double]] =
    mkPlanes(lshMaxAutoPlanes, j => s"mta:$table:$j")

  /** The DEFAULT multi-table LSH ANN face: 4 tables whose per-table
    * plane count is [[lshAutoPlanes]](N) — corpus-derived, exactly as
    * [[annIvfAuto]] derives its subcell bits — with recall defended
    * two ways as p grows: the 4-table collide-in-ANY union (unchanged),
    * and HAMMING-1 BUCKET MULTI-PROBE on the query side — each query
    * probes its own bucket plus every 1-bit flip of it, so a
    * near-neighbor is missed in a table only when ≥ 2 of that table's
    * hyperplanes separate the pair. Probe volume is 4·(p+1) buckets
    * per vector — log-growth in N, amortized by the occupancy cut it
    * buys. The only driver-side read is the corpus count that sizes p
    * (the bounded-collect contract every auto face follows).
    */
  def annLshAuto(spark: SparkSession, sfDir: String): DataFrame = {
    val n = load(spark, sfDir, "embeddings").count()
    val p = lshAutoPlanes(n)
    val e = Caching.persistOnce(vecs(spark, sfDir))
    val tableStructs = (0 until lshAutoTables).map { l =>
      // first p planes of the fixed 32-plane set = low-p-bit mask
      val bucket = planesForAuto(l).take(p).zipWithIndex.map { case (pl, j) =>
        when(expr(s"graft_dot(v, ${planeSparkLit(pl)})") > 0, lit(1L << j))
          .otherwise(lit(0L))
      }.reduce(_ + _)
      struct(lit(l).as("tbl"), bucket.as("bucket"))
    }
    val b = Caching.persistOnce(e.select(col("vec_id"),
        explode(array(tableStructs: _*)).as("tb"))
      .select(col("vec_id"), col("tb.tbl").as("tbl"),
        col("tb.bucket").as("bucket")))
    // query-side probe list: own bucket + every Hamming-1 flip of it
    val variants = col("bucket") +: (0 until p).map(i =>
      col("bucket").bitwiseXOR(lit(1L << i)))
    val probes = b.select(col("vec_id").as("a_id"), col("tbl"),
      explode(array(variants: _*)).as("bucket"))
    // directional candidates: probes are query-side only, so (a,b) and
    // (b,a) each arise from their own probe row — no symmetrize step
    val cand = probes
      .join(b.select(col("vec_id").as("b_id"), col("tbl"), col("bucket")),
        Seq("tbl", "bucket"))
      .filter(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    val va = e.select(col("vec_id").as("a_id"), col("v").as("va"),
      col("nrm").as("na"))
    val vb = e.select(col("vec_id").as("b_id"), col("v").as("vb"),
      col("nrm").as("nb"))
    val scored = cand.join(va, "a_id").join(vb, "b_id")
      .withColumn("sim", cosine)
    val w = Window.partitionBy(col("a_id"))
      .orderBy(col("sim").desc, col("b_id").asc)
    val out = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("a_id").as("query_id"), col("b_id").as("neighbor_id"),
        col("rank"),
        floor(col("sim") * lit(1000000.0)).cast("long").as("sim_micro"))
    canon(out)
  }

  /** Oracle: the SAME sizing rule computed in SQL from count(*) (the
    * geometry is checked semantics, not a hidden constant), masking the
    * same static 32-plane buckets to the derived width and probing the
    * same Hamming-1 neighborhood.
    */
  val annLshAutoSql: String = {
    val tables = (0 until lshAutoTables).map { l =>
      val bucketSql = planesForAuto(l).zipWithIndex.map { case (pl, j) =>
        s"CASE WHEN list_dot_product(v, ${planeSqlLit(pl)}) > 0 " +
          s"THEN CAST(${1L << j} AS BIGINT) ELSE 0 END"
      }.mkString(" + ")
      s"SELECT vec_id, $l AS tbl, $bucketSql AS bucket32 FROM e"
    }.mkString("\n  UNION ALL ")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |psel AS (SELECT coalesce(min(pb), $lshMaxAutoPlanes) AS p
       |         FROM (SELECT unnest(generate_series(1, $lshMaxAutoPlanes))
       |                 AS pb),
       |              (SELECT count(*) AS n FROM embeddings)
       |         WHERE (CAST(1 AS BIGINT) << pb) * $lshTargetOcc >= n),
       |b32 AS (
       |  $tables),
       |b AS (SELECT vec_id, tbl,
       |        bucket32 & ((CAST(1 AS BIGINT) << p) - 1) AS bucket
       |      FROM b32, psel),
       |probes AS (
       |  SELECT vec_id AS a_id, tbl, bucket FROM b
       |  UNION ALL
       |  SELECT b.vec_id, b.tbl,
       |    xor(b.bucket, CAST(1 AS BIGINT) << g.i) AS bucket
       |  FROM b CROSS JOIN (
       |    SELECT unnest(generate_series(0, (SELECT p - 1 FROM psel)))
       |      AS i) g),
       |cand AS (
       |  SELECT DISTINCT pr.a_id, q.vec_id AS b_id
       |  FROM probes pr JOIN b q ON pr.tbl = q.tbl AND pr.bucket = q.bucket
       |  WHERE pr.a_id <> q.vec_id),
       |scored AS (
       |  SELECT c.a_id, c.b_id,
       |    list_dot_product(a.v, x.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(x.v, x.v))) AS sim
       |  FROM cand c
       |  JOIN e a ON c.a_id = a.vec_id
       |  JOIN e x ON c.b_id = x.vec_id),
       |ranked AS (
       |  SELECT a_id, b_id, sim,
       |    row_number() OVER (PARTITION BY a_id
       |      ORDER BY sim DESC, b_id ASC) AS rank
       |  FROM scored)
       |SELECT a_id AS query_id, b_id AS neighbor_id,
       |  CAST(rank AS INT) AS rank,
       |  CAST(floor(sim * 1000000.0) AS BIGINT) AS sim_micro
       |FROM ranked WHERE rank <= 3
       |${canonOrderSql(Seq("query_id", "neighbor_id", "rank",
         "sim_micro"))}""".stripMargin
  }

  /** Shared multi-table LSH pipeline, parameterized by plane geometry. */
  private def annLshCore(d: DataFrame, nTables: Int,
      planes: Int => Seq[Array[Double]]): DataFrame = {
    // persisted: the vector relation feeds the bucket build and both
    // sides of the scoring joins, and the bucket relation sits on both
    // sides of the candidate self-join — Catalyst does not dedup
    // self-join subplans, so without the caches every vector's 24 plane
    // dots run twice and its norm four times (callers own the cache
    // lifecycle: Verify/Bench clearCache between queries)
    val e = Caching.persistOnce(if (d.columns.contains("v")) d else vecsOn(d))
    val tableStructs = (0 until nTables).map { l =>
      val bucket = planes(l).zipWithIndex.map { case (p, j) =>
        when(expr(s"graft_dot(v, ${planeSparkLit(p)})") > 0, lit(1 << j))
          .otherwise(lit(0))
      }.reduce(_ + _)
      struct(lit(l).as("tbl"), bucket.as("bucket"))
    }
    val b = Caching.persistOnce(e.select(col("vec_id"),
        explode(array(tableStructs: _*)).as("tb"))
      .select(col("vec_id"),
        col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket")))
    // candidates = same-(table,bucket) pairs, deduped across tables
    val cand = b.select(col("vec_id").as("a_id"), col("tbl"), col("bucket"))
      .join(b.select(col("vec_id").as("b_id"), col("tbl"), col("bucket")),
        Seq("tbl", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    val va = e.select(col("vec_id").as("a_id"), col("v").as("va"),
      col("nrm").as("na"))
    val vb = e.select(col("vec_id").as("b_id"), col("v").as("vb"),
      col("nrm").as("nb"))
    val scored = cand.join(va, "a_id").join(vb, "b_id")
      .withColumn("sim", cosine)
    // emit both directions so every vector ranks its own neighbors
    val sym = scored.select(col("a_id").as("query_id"),
        col("b_id").as("neighbor_id"), col("sim"))
      .unionByName(scored.select(col("b_id").as("query_id"),
        col("a_id").as("neighbor_id"), col("sim")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    val out = sym.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        floor(col("sim") * lit(1000000.0)).cast("long").as("sim_micro"))
    canon(out)
  }

  val annLshMultiSql: String = annLshCoreSql(planesFor)

  val annLshMultiWideSql: String = annLshCoreSql(planesForWide)

  private def annLshCoreSql(planes: Int => Seq[Array[Double]]): String = {
    val tables = (0 until 4).map { l =>
      val bucketSql = planes(l).zipWithIndex.map { case (p, j) =>
        s"CASE WHEN list_dot_product(v, ${planeSqlLit(p)}) > 0 THEN ${1 << j} ELSE 0 END"
      }.mkString(" + ")
      s"SELECT vec_id, v, $l AS tbl, $bucketSql AS bucket FROM e"
    }.mkString("\n  UNION ALL ")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |b AS (
       |  $tables),
       |cand AS (
       |  SELECT DISTINCT x.vec_id AS a_id, y.vec_id AS b_id
       |  FROM b x JOIN b y ON x.tbl = y.tbl AND x.bucket = y.bucket
       |    AND x.vec_id < y.vec_id),
       |scored AS (
       |  SELECT c.a_id, c.b_id,
       |    list_dot_product(a.v, x.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(x.v, x.v))) AS sim
       |  FROM cand c
       |  JOIN e a ON c.a_id = a.vec_id
       |  JOIN e x ON c.b_id = x.vec_id),
       |sym AS (
       |  SELECT a_id AS query_id, b_id AS neighbor_id, sim FROM scored
       |  UNION ALL
       |  SELECT b_id, a_id, sim FROM scored),
       |ranked AS (
       |  SELECT query_id, neighbor_id, sim,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY sim DESC, neighbor_id ASC) AS rank
       |  FROM sym)
       |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
       |  CAST(floor(sim * 1000000.0) AS BIGINT) AS sim_micro
       |FROM ranked WHERE rank <= 3
       |${canonOrderSql(Seq("query_id", "neighbor_id", "rank", "sim_micro"))}""".stripMargin
  }

  /** Distributed k-means assignment (one Lloyd's iteration's assign
    * step): every vector is scored against EVERY cell centroid and
    * assigned to the nearest — the step that would re-train the IVF
    * coarse quantizer. Distances stay exact integers (same floor-
    * quantization as centroidResiduals), so the argmin and its
    * (distance, cell-id) tie-break are bit-deterministic — no
    * float-comparison hazard in the ranking.
    *
    * Scale: work is vectors × k (k = cell count, fixed), the centroid
    * table is broadcast (fixed cardinality), and the one data shuffle
    * keys on vec_id for the per-candidate distance sums + argmin window.
    */
  /** Nearest-centroid assignment relation shared by kmeans_assign and
    * semdedup: (vec_id, own_cell, assigned_cell, d2q), one row per
    * vector, argmin tie-broken on cell id — all exact-integer.
    */
  /** Full centroid-distance ranking per vector: (vec_id, own_cell,
    * cand, d2q, rn) with rn = 1 the nearest cell — rn = 1 is the
    * assignment, rn ≤ p is the multi-probe list.
    */
  /** The ONE embedding scan every IVF/PQ face derives from (round 16):
    * exact doubles (v, nrm) for the cosine tails plus the µ-quantized
    * array (xqs) for the integer distance kernels — callers persistOnce
    * it so the whole face pays a single parquet read and a single cache
    * entry instead of one per derived relation.
    */
  private def vecsFull(spark: SparkSession, sfDir: String): DataFrame =
    vecsOn(load(spark, sfDir, "embeddings"))
      .withColumn("xqs",
        expr("transform(v, x -> CAST(floor(x * 1000000) AS BIGINT))"))

  /** µ-quantized per-dimension view: (vec_id, label, pos, xq) —
    * exploded ON TOP of the shared scan, used only where a per-dim
    * aggregation genuinely needs rows (centroid means); the distance
    * kernels below stay array-native.
    */
  private def quantizedOf(vf: DataFrame): DataFrame =
    vf.select(col("vec_id"), col("label"),
      posexplode(col("xqs")).as(Seq("pos", "xq")))

  /** Per-cell centroids of the quantized view: (cand, pos, c). */
  private def centroidsOf(q: DataFrame): DataFrame =
    q.groupBy(col("label").as("cand"), col("pos"))
      .agg((sum(col("xq")).cast("double") /
        (lit(1000000.0) * count(lit(1)))).as("c"))

  /** (cand, cs): each cell's centroid reshaped to a pos-ordered array —
    * the tiny broadcast side of the array-native distance kernel.
    */
  private def centArrOf(cent: DataFrame): DataFrame =
    cent.groupBy(col("cand")).agg(expr(
      "transform(array_sort(collect_list(struct(pos, c))), e -> e.c)")
      .as("cs"))

  /** d² between the µ-quantized vector array and a centroid array,
    * term-for-term the exploded kernel it replaced (round 16): per pos,
    * dx = xq/10⁶ − c (the identical IEEE doubles), the µ²-floored
    * square is an exact BIGINT, and the long sum is order-free — bits
    * cannot differ from the old join-on-pos + groupBy shape. A native
    * codegen expression (plans.QuantDist — the graft_dot precedent,
    * guide §4): one tight loop over N×k rows instead of an
    * N×k×64-row join feeding a hash aggregate, and no interpreted
    * HOF lambdas in the hot path.
    */
  private val d2qExpr: String = "graft_qdist(xqs, cs)"

  /** Residual-sign subcell of the vector against a centroid array —
    * bit p set iff xqs[p]/10⁶ − cs[p] ≥ 0, the exploded kernel's exact
    * per-bit comparison (same doubles, same shiftleft), summed as a
    * long over the first `bits` dimensions.
    */
  private def subExpr(bits: Int): String = s"graft_qsub(xqs, cs, $bits)"

  /** Every vector scored against every cell centroid (N×k rows — the
    * deliberate broadcast cross join every nearest-centroid assignment
    * pays), ranked per vector by (d2q, cand). `bits > 0` additionally
    * emits the residual-sign subcell in the SAME pass, so the subcell
    * faces need no second kernel join. One window shuffle; no exploded
    * join, no hash aggregate (round 16 — guide §1.2/§2.3).
    */
  private def assignRankedFrom(vf: DataFrame, centArr: DataFrame,
      bits: Int): DataFrame = {
    val dists = vf.select(col("vec_id"), col("label").as("own_cell"),
        col("xqs"))
      .crossJoin(broadcast(centArr))
      .withColumn("d2q", expr(d2qExpr))
    val withSub =
      if (bits > 0) dists.withColumn("sub", expr(subExpr(bits)))
      else dists
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("d2q").asc, col("cand").asc)
    withSub.drop("xqs", "cs").withColumn("rn", row_number().over(w))
  }

  private def assignRelFrom(vf: DataFrame): DataFrame =
    assignRankedFrom(vf, centArrOf(centroidsOf(quantizedOf(vf))), bits = 0)
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("own_cell"),
        col("cand").as("assigned_cell"), col("d2q"))

  def kmeansAssign(spark: SparkSession, sfDir: String): DataFrame = {
    val out = assignRelFrom(Caching.persistOnce(vecsFull(spark, sfDir)))
      .select(col("vec_id"), col("own_cell"), col("assigned_cell"),
        when(col("own_cell") === col("assigned_cell"), 1).otherwise(0)
          .as("stable"),
        floor(sqrt(col("d2q").cast("double") / lit(1.0e12))
          * lit(1000000.0)).cast("long").as("dist_micro"))
    canon(out)
  }

  /** The assignment CTE chain shared by kmeans_assign and semdedup —
    * one SQL source of truth for the [[assignRel]] arithmetic.
    */
  private val assignCteSql: String =
    """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      |px AS (SELECT vec_id, label, v,
      |         unnest(generate_series(1, len(v))) AS i FROM e),
      |pos AS (SELECT vec_id, label, i - 1 AS pos, v[i] AS x FROM px),
      |q AS (SELECT vec_id, label, pos,
      |        CAST(floor(x * 1000000) AS BIGINT) AS xq FROM pos),
      |cent AS (SELECT label AS cand, pos,
      |           CAST(sum(xq) AS DOUBLE) / (1000000.0 * count(*)) AS c
      |         FROM q GROUP BY 1, 2),
      |d AS (SELECT q.vec_id, q.label AS own_cell, c.cand,
      |        sum(CAST(floor(
      |          ((CAST(q.xq AS DOUBLE) / 1000000.0 - c.c)
      |            * (CAST(q.xq AS DOUBLE) / 1000000.0 - c.c)) * 1e12)
      |          AS BIGINT)) AS d2q
      |      FROM q JOIN cent c ON q.pos = c.pos
      |      GROUP BY 1, 2, 3),
      |r AS (SELECT *, row_number() OVER (PARTITION BY vec_id
      |        ORDER BY d2q ASC, cand ASC) AS rn FROM d)""".stripMargin

  val kmeansAssignSql: String =
    s"""$assignCteSql
       |SELECT vec_id, own_cell, cand AS assigned_cell,
       |  CASE WHEN own_cell = cand THEN 1 ELSE 0 END AS stable,
       |  CAST(floor(sqrt(CAST(d2q AS DOUBLE) / 1e12) * 1000000.0) AS BIGINT)
       |    AS dist_micro
       |FROM r WHERE rn = 1
       |${canonOrderSql(Seq("vec_id", "own_cell", "assigned_cell", "stable", "dist_micro"))}""".stripMargin

  /** Probe width for the IVF query face. */
  private val ivfProbes = 2

  /** The IVF QUERY face (completing the build stack of
    * centroid_residuals / kmeans_assign): every vector queries the
    * index by searching the vectors ASSIGNED to its `ivfProbes`
    * nearest cells — the nprobe recall/cost knob every IVF system
    * exposes. nprobe=1 misses true neighbors that sit just across a
    * cell boundary; widening to 2 recovers most of them for ~2× the
    * candidate volume (and the spec measures exactly that recall gain
    * against brute force). Ranking and µ-floor are the shared ANN
    * discipline.
    *
    * Scale: candidates are CELL-BLOCKED (probe list ⋈ assignment on
    * cell — never all-pairs); the centroid ranking reuses the exact
    * same broadcast-centroid arithmetic as the assignment relation,
    * so the whole face adds one cell-keyed equi-join to the index
    * it already maintains.
    *
    * DIDACTIC FACE, NOT THE DEFAULT: its cell count is fixed, so the
    * measured curve saturates (27.8× at 10× data, SCALING.md round-5)
    * — kept, like ann_lsh_multi's narrow geometry, as the measured
    * baseline the sizing rule is judged against. Production workloads
    * use [[annIvfAuto]], whose block count scales with the corpus.
    */
  def annIvfProbe(spark: SparkSession, sfDir: String): DataFrame = {
    val vf = Caching.persistOnce(vecsFull(spark, sfDir))
    val ranked = Caching.persistOnce(
      assignRankedFrom(vf, centArrOf(centroidsOf(quantizedOf(vf))), bits = 0)
        .select(col("vec_id"), col("cand"), col("rn")))
    val base = ranked.filter(col("rn") === 1)
      .select(col("vec_id").as("b_id"), col("cand").as("cell"))
    val probes = ranked.filter(col("rn") <= ivfProbes)
      .select(col("vec_id").as("a_id"), col("cand").as("cell"))
    val cand = probes.join(base, Seq("cell"))
      .filter(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    val va = vf.select(col("vec_id").as("a_id"), col("v").as("va"),
      col("nrm").as("na"))
    val vb = vf.select(col("vec_id").as("b_id"), col("v").as("vb"),
      col("nrm").as("nb"))
    val scored = cand.join(va, "a_id").join(vb, "b_id")
      .withColumn("sim", cosine)
    val w = Window.partitionBy(col("a_id"))
      .orderBy(col("sim").desc, col("b_id").asc)
    val out = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("a_id").as("query_id"), col("b_id").as("neighbor_id"),
        col("rank"),
        floor(col("sim") * lit(1000000.0)).cast("long").as("sim_micro"))
    canon(out)
  }

  val annIvfProbeSql: String =
    s"""$assignCteSql,
       |probes AS (SELECT vec_id AS a_id, cand AS cell FROM r
       |           WHERE rn <= $ivfProbes),
       |base AS (SELECT vec_id AS b_id, cand AS cell FROM r WHERE rn = 1),
       |cand AS (SELECT DISTINCT a_id, b_id
       |         FROM probes JOIN base USING (cell) WHERE a_id <> b_id),
       |ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |scored AS (
       |  SELECT c.a_id, c.b_id,
       |    list_dot_product(a.v, b.v) /
       |      (sqrt(list_dot_product(a.v, a.v)) *
       |       sqrt(list_dot_product(b.v, b.v))) AS sim
       |  FROM cand c
       |  JOIN ev a ON c.a_id = a.vec_id
       |  JOIN ev b ON c.b_id = b.vec_id),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY a_id
       |    ORDER BY sim DESC, b_id ASC) AS rank FROM scored)
       |SELECT a_id AS query_id, b_id AS neighbor_id,
       |  CAST(rank AS INT) AS rank,
       |  CAST(floor(sim * 1000000.0) AS BIGINT) AS sim_micro
       |FROM ranked WHERE rank <= 3
       |${canonOrderSql(Seq("query_id", "neighbor_id", "rank",
         "sim_micro"))}""".stripMargin

  /** Residual-sign bits per (vector, cell): the scaling knob the
    * round-5 curve demands (see SCALING.md §round-5: ann_ivf_probe goes
    * ~N² once the fixed label-cell space saturates).
    */
  private val ivfSubBits = 3

  /** (vec_id, cand, sub): the [[ivfSubBits]]-bit subcell of a vector
    * WITHIN a cell — bit p set iff the residual against that cell's
    * centroid is ≥ 0 in dimension p. Near-identical vectors have
    * near-identical residuals, so they share a subcell except when a
    * residual component sits exactly at a centroid boundary.
    * Deterministic across engines: xq/1e6 and the centroid are the same
    * IEEE doubles both sides (the d2q discipline), so the ≥ 0 test is
    * bit-stable.
    */
  /** Test-facing view of the refined blocking: each vector's ASSIGNED
    * cell and its residual-sign subcell there — what LshRecallSpec uses
    * to compare block occupancy with and without the refinement.
    */
  private[graft] def ivfAssignedBlocks(spark: SparkSession,
      sfDir: String): DataFrame = {
    val vf = Caching.persistOnce(vecsFull(spark, sfDir))
    assignRankedFrom(vf, centArrOf(centroidsOf(quantizedOf(vf))),
        bits = ivfSubBits)
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cand").as("cell"), col("sub"))
  }

  /** The IVF saturation KNOB (SCALING.md §round-5 measured ann_ivf_probe
    * at 27.8× for 10× data — fixed cells go quadratic past saturation):
    * refine every cell with an [[ivfSubBits]]-bit residual-sign subcell,
    * multiplying the effective cell count by 2³ without retraining —
    * the poor man's form of "k must scale with N" (production IVF
    * retrains its coarse quantizer; residual sign bits are the
    * train-free equivalent, exactly the 1-bit product-quantizer idea).
    * Candidates must now match on (cell, subcell), cutting per-cell
    * candidate volume ~2^bits× at the cost of missing neighbors whose
    * residual flips a sign — the recall/occupancy trade every blocking
    * scheme prices (LshRecallSpec measures both sides).
    *
    * Scale: subcell computation is vectors × k × bits against the same
    * broadcast centroid table the distance ranking already uses; the
    * candidate join keys widen from cell to (cell, sub) — shape
    * unchanged, blocks 8× finer.
    */
  def annIvfSubcell(spark: SparkSession, sfDir: String): DataFrame = {
    val vf = Caching.persistOnce(vecsFull(spark, sfDir))
    // rn, d2q AND the subcell in one kernel pass (round 16) — the old
    // shape computed subcells in a second exploded join and re-attached
    // them to the ranking with two (vec_id, cand) joins
    val ranked = Caching.persistOnce(
      assignRankedFrom(vf, centArrOf(centroidsOf(quantizedOf(vf))),
          bits = ivfSubBits)
        .select(col("vec_id"), col("cand"), col("rn"), col("sub")))
    val base = ranked.filter(col("rn") === 1)
      .select(col("vec_id").as("b_id"), col("cand").as("cell"), col("sub"))
    val probes = ranked.filter(col("rn") <= ivfProbes)
      .select(col("vec_id").as("a_id"), col("cand").as("cell"), col("sub"))
    val cand = probes.join(base, Seq("cell", "sub"))
      .filter(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    val va = vf.select(col("vec_id").as("a_id"), col("v").as("va"),
      col("nrm").as("na"))
    val vb = vf.select(col("vec_id").as("b_id"), col("v").as("vb"),
      col("nrm").as("nb"))
    val scored = cand.join(va, "a_id").join(vb, "b_id")
      .withColumn("sim", cosine)
    val w = Window.partitionBy(col("a_id"))
      .orderBy(col("sim").desc, col("b_id").asc)
    val out = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("a_id").as("query_id"), col("b_id").as("neighbor_id"),
        col("rank"),
        floor(col("sim") * lit(1000000.0)).cast("long").as("sim_micro"))
    canon(out)
  }

  val annIvfSubcellSql: String =
    s"""$assignCteSql,
       |sub AS (
       |  SELECT q.vec_id, c.cand,
       |    CAST(sum(CASE WHEN CAST(q.xq AS DOUBLE) / 1000000.0 - c.c >= 0
       |      THEN (CAST(1 AS BIGINT) << q.pos) ELSE 0 END) AS BIGINT)
       |      AS sub
       |  FROM q JOIN cent c ON q.pos = c.pos
       |  WHERE q.pos < $ivfSubBits GROUP BY 1, 2),
       |probes AS (SELECT r.vec_id AS a_id, r.cand AS cell, s.sub
       |           FROM r JOIN sub s
       |             ON r.vec_id = s.vec_id AND r.cand = s.cand
       |           WHERE r.rn <= $ivfProbes),
       |base AS (SELECT r.vec_id AS b_id, r.cand AS cell, s.sub
       |         FROM r JOIN sub s
       |           ON r.vec_id = s.vec_id AND r.cand = s.cand
       |         WHERE r.rn = 1),
       |cand AS (SELECT DISTINCT a_id, b_id
       |         FROM probes JOIN base USING (cell, sub)
       |         WHERE a_id <> b_id),
       |ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |scored AS (
       |  SELECT c.a_id, c.b_id,
       |    list_dot_product(a.v, b.v) /
       |      (sqrt(list_dot_product(a.v, a.v)) *
       |       sqrt(list_dot_product(b.v, b.v))) AS sim
       |  FROM cand c
       |  JOIN ev a ON c.a_id = a.vec_id
       |  JOIN ev b ON c.b_id = b.vec_id),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY a_id
       |    ORDER BY sim DESC, b_id ASC) AS rank FROM scored)
       |SELECT a_id AS query_id, b_id AS neighbor_id,
       |  CAST(rank AS INT) AS rank,
       |  CAST(floor(sim * 1000000.0) AS BIGINT) AS sim_micro
       |FROM ranked WHERE rank <= 3
       |${canonOrderSql(Seq("query_id", "neighbor_id", "rank",
         "sim_micro"))}""".stripMargin

  /** [[annIvfSubcell]] with HAMMING-1 SUBCELL MULTI-PROBE (ROADMAP
    * carry, closed r9): each query probes its own residual-sign
    * subcell plus every 1-bit flip of it — the recall lever the
    * subcell refinement prices in. A candidate probe set of
    * ([[ivfSubBits]]+1) subcells recovers every neighbor that lost
    * exactly one boundary sign flip, so a miss now needs ≥ 2 residual
    * components straddling their centroid boundaries. Candidates are a
    * strict SUPERSET of the non-probe face's (the own-subcell probe is
    * in the set), so recall can only improve; the price is ≤
    * (bits+1)× the candidate volume of the refined face — still
    * 2^bits/(bits+1) ≈ 2× below the unrefined cell blocking at 3 bits,
    * and the gap widens with bits. Same shape as [[annIvfAuto]]'s
    * probe stage, here at the FIXED didactic geometry.
    */
  def annIvfSubcellProbe(spark: SparkSession, sfDir: String): DataFrame = {
    val vf = Caching.persistOnce(vecsFull(spark, sfDir))
    val ranked = Caching.persistOnce(
      assignRankedFrom(vf, centArrOf(centroidsOf(quantizedOf(vf))),
          bits = ivfSubBits)
        .select(col("vec_id"), col("cand"), col("rn"), col("sub")))
    val base = ranked.filter(col("rn") === 1)
      .select(col("vec_id").as("b_id"), col("cand").as("cell"), col("sub"))
    val variants = col("sub") +: (0 until ivfSubBits).map(p =>
      col("sub").bitwiseXOR(lit(1L << p)))
    val probes = ranked.filter(col("rn") <= ivfProbes)
      .select(col("vec_id").as("a_id"), col("cand").as("cell"),
        explode(array(variants: _*)).as("sub"))
    val cand = probes.join(base, Seq("cell", "sub"))
      .filter(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    val va = vf.select(col("vec_id").as("a_id"), col("v").as("va"),
      col("nrm").as("na"))
    val vb = vf.select(col("vec_id").as("b_id"), col("v").as("vb"),
      col("nrm").as("nb"))
    val scored = cand.join(va, "a_id").join(vb, "b_id")
      .withColumn("sim", cosine)
    val w = Window.partitionBy(col("a_id"))
      .orderBy(col("sim").desc, col("b_id").asc)
    val out = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("a_id").as("query_id"), col("b_id").as("neighbor_id"),
        col("rank"),
        floor(col("sim") * lit(1000000.0)).cast("long").as("sim_micro"))
    canon(out)
  }

  val annIvfSubcellProbeSql: String =
    s"""$assignCteSql,
       |sub AS (
       |  SELECT q.vec_id, c.cand,
       |    CAST(sum(CASE WHEN CAST(q.xq AS DOUBLE) / 1000000.0 - c.c >= 0
       |      THEN (CAST(1 AS BIGINT) << q.pos) ELSE 0 END) AS BIGINT)
       |      AS sub
       |  FROM q JOIN cent c ON q.pos = c.pos
       |  WHERE q.pos < $ivfSubBits GROUP BY 1, 2),
       |psub AS (
       |  SELECT vec_id, cand, sub FROM sub
       |  UNION ALL
       |  SELECT s.vec_id, s.cand,
       |    xor(s.sub, CAST(1 AS BIGINT) << g.p) AS sub
       |  FROM sub s CROSS JOIN (
       |    SELECT unnest(generate_series(0, ${ivfSubBits - 1})) AS p) g),
       |probes AS (SELECT r.vec_id AS a_id, r.cand AS cell, s.sub
       |           FROM r JOIN psub s
       |             ON r.vec_id = s.vec_id AND r.cand = s.cand
       |           WHERE r.rn <= $ivfProbes),
       |base AS (SELECT r.vec_id AS b_id, r.cand AS cell, s.sub
       |         FROM r JOIN sub s
       |           ON r.vec_id = s.vec_id AND r.cand = s.cand
       |         WHERE r.rn = 1),
       |cand AS (SELECT DISTINCT a_id, b_id
       |         FROM probes JOIN base USING (cell, sub)
       |         WHERE a_id <> b_id),
       |ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |scored AS (
       |  SELECT c.a_id, c.b_id,
       |    list_dot_product(a.v, b.v) /
       |      (sqrt(list_dot_product(a.v, a.v)) *
       |       sqrt(list_dot_product(b.v, b.v))) AS sim
       |  FROM cand c
       |  JOIN ev a ON c.a_id = a.vec_id
       |  JOIN ev b ON c.b_id = b.vec_id),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY a_id
       |    ORDER BY sim DESC, b_id ASC) AS rank FROM scored)
       |SELECT a_id AS query_id, b_id AS neighbor_id,
       |  CAST(rank AS INT) AS rank,
       |  CAST(floor(sim * 1000000.0) AS BIGINT) AS sim_micro
       |FROM ranked WHERE rank <= 3
       |${canonOrderSql(Seq("query_id", "neighbor_id", "rank",
         "sim_micro"))}""".stripMargin

  // ---- auto-sized IVF: the DEFAULT production face -------------------

  /** Target per-(cell, subcell) occupancy for [[annIvfAuto]]. */
  private val ivfTargetOcc = 8L

  /** Upper bound on auto-sized subcell bits (2¹⁶ subcells per cell is
    * far past any corpus this sizing rule meets before occupancy ~1).
    */
  private val ivfMaxAutoBits = 16

  /** The sizing rule SCALING.md states and the fixed faces violate:
    * block count must be a function of N, never a constant. Smallest
    * b ∈ [1, 16] with k·2^b·targetOcc ≥ n — i.e. enough subcells that
    * expected (cell, subcell) occupancy stays ≤ [[ivfTargetOcc]] as the
    * corpus grows. 10× data ⇒ ~log₂10 ≈ 3.3 more bits ⇒ ~10× more
    * blocks ⇒ occupancy (and the per-block quadratic candidate term)
    * stays ~constant, so candidate volume scales ∝ N.
    */
  private[graft] def ivfAutoBits(n: Long, k: Long): Int = {
    var b = 1
    while (b < ivfMaxAutoBits &&
      k.max(1L) * (1L << b) * ivfTargetOcc < n) b += 1
    b
  }

  /** Test-facing view of the auto-sized blocking: each vector's
    * assigned (cell, subcell) under [[ivfAutoBits]] geometry, plus the
    * chosen width — what the occupancy/curve specs inspect.
    */
  private[graft] def ivfAutoBlocks(spark: SparkSession,
      sfDir: String): (Int, DataFrame) = {
    val st = load(spark, sfDir, "embeddings")
      .agg(count(lit(1)), countDistinct(col("label"))).head
    val bits = ivfAutoBits(st.getLong(0), st.getLong(1))
    val vf = Caching.persistOnce(vecsFull(spark, sfDir))
    (bits, assignRankedFrom(vf, centArrOf(centroidsOf(quantizedOf(vf))),
        bits)
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cand").as("cell"), col("sub")))
  }

  /** The DEFAULT IVF ANN face (round-6: the fixed-geometry
    * `ann_ivf_probe` measured 27.8× at 10× data — its label-cell count
    * is constant, so per-cell occupancy grows ∝ N and the within-cell
    * candidate join ∝ N²). Here the refinement width is DERIVED FROM
    * THE CORPUS ([[ivfAutoBits]]): k·2^bits blocks sized so expected
    * occupancy stays ≤ [[ivfTargetOcc]], which holds the per-block
    * quadratic term constant and the total candidate volume ∝ N — the
    * "k scales with N" law production IVF implements by retraining its
    * coarse quantizer, realized train-free with residual-sign bits.
    *
    * Recall is defended two ways as bits grow: cell-level multi-probe
    * (rn ≤ [[ivfProbes]], unchanged), and HAMMING-1 SUBCELL MULTI-PROBE
    * — each query probes its own subcell plus every 1-bit flip of it,
    * so a near-neighbor is missed only when ≥ 2 residual components
    * sit across their centroid boundaries (boundary-flip probability is
    * per-bit small and independent; the spec pins the floor on seeded
    * near-identical pairs). Probe volume is (bits+1)× the base — log-
    * growth in N, amortized by the occupancy cut it buys.
    *
    * The one driver-side read is the 2-long metadata row sizing the
    * geometry (count, distinct labels) — the same bounded-collect
    * contract as the streaming maintenance paths, never data-sized.
    */
  def annIvfAuto(spark: SparkSession, sfDir: String): DataFrame = {
    val st = load(spark, sfDir, "embeddings")
      .agg(count(lit(1)), countDistinct(col("label"))).head
    val bits = ivfAutoBits(st.getLong(0), st.getLong(1))
    val vf = Caching.persistOnce(vecsFull(spark, sfDir))
    val ranked = Caching.persistOnce(
      assignRankedFrom(vf, centArrOf(centroidsOf(quantizedOf(vf))), bits)
        .select(col("vec_id"), col("cand"), col("rn"), col("sub")))
    val base = ranked.filter(col("rn") === 1)
      .select(col("vec_id").as("b_id"), col("cand").as("cell"), col("sub"))
    // probe list: own subcell + every Hamming-1 flip of it
    val variants = col("sub") +: (0 until bits).map(p =>
      col("sub").bitwiseXOR(lit(1L << p)))
    val probes = ranked.filter(col("rn") <= ivfProbes)
      .select(col("vec_id").as("a_id"), col("cand").as("cell"),
        explode(array(variants: _*)).as("sub"))
    val cand = probes.join(base, Seq("cell", "sub"))
      .filter(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    val va = vf.select(col("vec_id").as("a_id"), col("v").as("va"),
      col("nrm").as("na"))
    val vb = vf.select(col("vec_id").as("b_id"), col("v").as("vb"),
      col("nrm").as("nb"))
    val scored = cand.join(va, "a_id").join(vb, "b_id")
      .withColumn("sim", cosine)
    val w = Window.partitionBy(col("a_id"))
      .orderBy(col("sim").desc, col("b_id").asc)
    val out = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("a_id").as("query_id"), col("b_id").as("neighbor_id"),
        col("rank"),
        floor(col("sim") * lit(1000000.0)).cast("long").as("sim_micro"))
    canon(out)
  }

  /** Oracle: the SAME sizing rule computed in SQL (coalesce(min b, 16)
    * over the identical inequality), so both engines derive the same
    * bits from the same data — the geometry is part of the checked
    * semantics, not a hidden constant.
    */
  val annIvfAutoSql: String =
    s"""$assignCteSql,
       |bstat AS (SELECT count(*) AS n, count(DISTINCT label) AS k
       |          FROM embeddings),
       |bsel AS (SELECT coalesce(min(b), $ivfMaxAutoBits) AS bits
       |         FROM (SELECT unnest(generate_series(1, $ivfMaxAutoBits))
       |                 AS b), bstat
       |         WHERE greatest(k, 1) * (CAST(1 AS BIGINT) << b)
       |                 * $ivfTargetOcc >= n),
       |sub AS (
       |  SELECT q.vec_id, c.cand,
       |    CAST(sum(CASE WHEN CAST(q.xq AS DOUBLE) / 1000000.0 - c.c >= 0
       |      THEN (CAST(1 AS BIGINT) << q.pos) ELSE 0 END) AS BIGINT)
       |      AS sub
       |  FROM q JOIN cent c ON q.pos = c.pos, bsel
       |  WHERE q.pos < bsel.bits GROUP BY 1, 2),
       |psub AS (
       |  SELECT vec_id, cand, sub FROM sub
       |  UNION ALL
       |  SELECT s.vec_id, s.cand,
       |    xor(s.sub, CAST(1 AS BIGINT) << g.p) AS sub
       |  FROM sub s CROSS JOIN (
       |    SELECT unnest(generate_series(0,
       |      (SELECT bits - 1 FROM bsel))) AS p) g),
       |probes AS (SELECT r.vec_id AS a_id, r.cand AS cell, s.sub
       |           FROM r JOIN psub s
       |             ON r.vec_id = s.vec_id AND r.cand = s.cand
       |           WHERE r.rn <= $ivfProbes),
       |base AS (SELECT r.vec_id AS b_id, r.cand AS cell, s.sub
       |         FROM r JOIN sub s
       |           ON r.vec_id = s.vec_id AND r.cand = s.cand
       |         WHERE r.rn = 1),
       |cand AS (SELECT DISTINCT a_id, b_id
       |         FROM probes JOIN base USING (cell, sub)
       |         WHERE a_id <> b_id),
       |ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |scored AS (
       |  SELECT c.a_id, c.b_id,
       |    list_dot_product(a.v, b.v) /
       |      (sqrt(list_dot_product(a.v, a.v)) *
       |       sqrt(list_dot_product(b.v, b.v))) AS sim
       |  FROM cand c
       |  JOIN ev a ON c.a_id = a.vec_id
       |  JOIN ev b ON c.b_id = b.vec_id),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY a_id
       |    ORDER BY sim DESC, b_id ASC) AS rank FROM scored)
       |SELECT a_id AS query_id, b_id AS neighbor_id,
       |  CAST(rank AS INT) AS rank,
       |  CAST(floor(sim * 1000000.0) AS BIGINT) AS sim_micro
       |FROM ranked WHERE rank <= 3
       |${canonOrderSql(Seq("query_id", "neighbor_id", "rank",
         "sim_micro"))}""".stripMargin

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    * cluster the embedding space (the k-means assignment above), then
    * prune, within each cluster, every vector that has a LOWER-id
    * cluster-mate above the cosine threshold — keep-lowest-id greedy
    * semantics, the same chain rule as dedup_embedding but blocked by
    * the LEARNED cluster rather than the given label. One row per
    * input vector: pruned flag, the kept representative, and the
    * within-cluster match count.
    *
    * Scale: assignment is vectors × k against broadcast centroids; the
    * pair join is cluster-blocked (never all-pairs — the whole point of
    * SemDeDup is that the quadratic term is per-cluster), and the
    * verdict aggregates per vector with map-side partials. The cosine
    * is the same codegen'd graft_dot sequence as cosine_pairs, so the
    * threshold decision is bit-identical across engines.
    */
  def semDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val vf = Caching.persistOnce(vecsFull(spark, sfDir))
    val asg = assignRelFrom(vf)
      .select(col("vec_id"), col("assigned_cell").as("cell"))
    val e = Caching.persistOnce(vf.select(col("vec_id"), col("v"),
      col("nrm")).join(asg, Seq("vec_id")))
    val a = e.select(col("vec_id").as("a_id"), col("cell"),
      col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("b_id"), col("cell"),
      col("v").as("vb"), col("nrm").as("nb"))
    val pruned = a.join(b, Seq("cell"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("sim", cosine)
      .filter(col("sim") > 0.44)
      .groupBy(col("b_id").as("vec_id"))
      .agg(min(col("a_id")).as("keep_id"), count(lit(1)).as("n_dups"))
    val out = e.select(col("vec_id"), col("cell"))
      .join(pruned, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        when(col("keep_id").isNotNull, 1).otherwise(0).as("is_pruned"),
        col("keep_id"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"))
    canon(out)
  }

  val semDedupSql: String =
    s"""$assignCteSql,
       |asg AS (SELECT vec_id, cand AS cell FROM r WHERE rn = 1),
       |ev AS (SELECT e.vec_id, a.cell, e.v
       |       FROM e JOIN asg a ON e.vec_id = a.vec_id),
       |pruned AS (
       |  SELECT b.vec_id AS vec_id, min(a.vec_id) AS keep_id,
       |    count(*) AS n_dups
       |  FROM ev a JOIN ev b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE $duckCos > 0.44
       |  GROUP BY 1)
       |SELECT vec_id, cell,
       |  CASE WHEN keep_id IS NOT NULL THEN 1 ELSE 0 END AS is_pruned,
       |  keep_id, coalesce(n_dups, 0) AS n_dups
       |FROM ev LEFT JOIN pruned USING (vec_id)
       |${canonOrderSql(Seq("vec_id", "cell", "is_pruned", "keep_id", "n_dups"))}""".stripMargin

  // ---------------------------------------------------------------------
  // ann_pq — product-quantization codebook + ADC ranking (the IVF-PQ
  // compressed-index shape; Jégou, Douze, Schmid 2011, "Product
  // Quantization for Nearest Neighbor Search")
  // ---------------------------------------------------------------------

  /** PQ subspaces; dims split round-robin (sub = pos % pqM), which
    * balances subspaces for any dimensionality.
    */
  private val pqM = 4

  /** Codes per subspace codebook. */
  private val pqK = 8

  /** Neighbors kept per query. */
  private val pqTopK = 3

  /** Product-quantization ANN: train an M×K codebook (one K-entry
    * codebook per round-robin subspace), ENCODE every vector as M small
    * codes, then rank each vector's own-cell (label-blocked) candidates
    * by Asymmetric Distance Computation — the query's exact subvector
    * against the candidate's CODE centroids, candidates never touch
    * their raw vectors. This is the compressed-index half of IVF-PQ:
    * at 100 TB a 64-dim float vector costs 256 B while its PQ codes
    * cost M bytes — the difference between an index that fits executor
    * memory and one that doesn't.
    *
    * Codebook training is RNG-free in the house style: the K seed
    * vectors are the salted-md5 top-K over vec_id (a distributed
    * TakeOrderedAndProject — the only global ordering, K rows; code id
    * = hash rank), followed by ONE Lloyd refinement per subspace
    * (assign to nearest seed subvector, recompute µ-quantized means) —
    * a production build would loop the same two bounded jobs, each
    * round costing vectors × K narrow work against a broadcast
    * codebook. Distances are the exact-integer floor-quantized d2 of
    * the k-means family, so every argmin (assignment, encode, final
    * ranking) is bit-deterministic with (d2, code) / (adc, neighbor)
    * tie-breaks. Codes that lose all their vectors in refinement
    * simply go unused (real PQ has dead codes too) — the encode argmin
    * ranges over the codes that survive.
    *
    * Scale: seeds/codebooks are tiny broadcasts (K·D rows); encode and
    * distance-table builds are vectors × K with map-side partial sums;
    * the candidate join is label-blocked (the IVF coarse cell — never
    * all-pairs); ADC re-scoring joins the candidate's M codes to the
    * query's M×K distance table on (query, sub, code) — volume is
    * pairs × M, and the per-pair payload is integer d2 sums, not
    * vectors. Top-k per query is one window at query cardinality.
    */
  /** PQ codebook machinery shared by [[annPq]] (label-blocked didactic
    * face) and [[annIvfPq]] (derived-cell production face): trains the
    * M×K codebook and returns the persisted query-side ADC distance
    * table d1 = (vec_id, sub, code, d2) and the encode relation
    * codes = (n_id, n_sub, n_code).
    */
  private def pqDistAndCodes(spark: SparkSession,
      sfDir: String): (DataFrame, DataFrame) =
    pqDistAndCodesRounds(spark, sfDir, rounds = 1)

  /** [[pqDistAndCodes]] with the Lloyd refinement depth exposed
    * (private[graft] — the production faces pin rounds = 1; the
    * recall-vs-rounds measurement in RetrievalSpec drives this knob
    * directly, and SCALING.md records the measured knee behind the
    * pinned default). Each extra round costs the same two bounded jobs
    * (assign: vectors × K against a broadcast codebook; means: one
    * grouped pass), so depth is a linear-cost dial, not a redesign.
    */
  private[graft] def pqDistAndCodesRounds(spark: SparkSession,
      sfDir: String, rounds: Int): (DataFrame, DataFrame) = {
    require(rounds >= 1, s"PQ needs at least one Lloyd round: $rounds")
    val vf = Caching.persistOnce(vecsFull(spark, sfDir))
    // exploded view only where per-(sub, code, pos) means need rows
    // (the refine step); the ADC distance kernel below is array-native
    def qp = quantizedOf(vf).withColumn("sub", pmod(col("pos"), lit(pqM)))
    val seedPick = vf.select(col("vec_id"))
      .withColumn("h", expr(
        "cast(conv(substr(md5(cast(vec_id as string)), 1, 8), 16, 10) as bigint)"))
      .orderBy(col("h").asc, col("vec_id").asc).limit(pqK)
    val seeds = seedPick
      .withColumn("code", row_number().over(
        Window.orderBy(col("h").asc, col("vec_id").asc)) - 1)
      .select(col("vec_id").as("seed_id"), col("code"))
    val c0 = qp.join(broadcast(seeds), col("vec_id") === col("seed_id"))
      .select(col("code"), col("sub"), col("pos"),
        (col("xq").cast("double") / lit(1000000.0)).as("c"))
    // per-(sub, code) codebook entry reshaped to its pos-ordered
    // (pos, c) array — the broadcast side of the ADC kernel
    def bookOf(cent: DataFrame): DataFrame =
      cent.groupBy(col("sub"), col("code"))
        .agg(expr("array_sort(collect_list(struct(pos, c)))").as("pcs"))
    // d² of the vector's subspace slice against one codebook entry:
    // per codebook pos, the same xq/10⁶ − c doubles and µ²-floored
    // BIGINT terms as the exploded join-on-(sub, pos) + groupBy shape
    // it replaces (round 16), summed as order-free longs — N×(M·K)
    // rows out of one codegen'd expression, no hash aggregate
    def d2To(cent: DataFrame): DataFrame =
      vf.select(col("vec_id"), col("xqs"))
        .crossJoin(broadcast(bookOf(cent)))
        .select(col("vec_id"), col("sub"), col("code"),
          expr("graft_qdist_at(xqs, pcs)").as("d2"))
    val wsub = Window.partitionBy(col("vec_id"), col("sub"))
      .orderBy(col("d2").asc, col("code").asc)
    def refine(cent: DataFrame): DataFrame = {
      val assign = d2To(cent).withColumn("rn", row_number().over(wsub))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("sub"), col("code"))
      qp.join(assign, Seq("vec_id", "sub"))
        .groupBy(col("sub"), col("code"), col("pos"))
        .agg((sum(col("xq")).cast("double") /
          (lit(1000000.0) * count(lit(1)))).as("c"))
    }
    // K·D-row centroid relations: persist each round so round r+1's
    // assign reads a materialized codebook instead of replaying every
    // earlier round's lineage
    var cent = c0
    for (_ <- 0 until rounds) cent = Caching.persistOnce(refine(cent))
    // one relation serves twice: rn=1 is the encode, the full table is
    // the query-side ADC distance table
    val d1 = Caching.persistOnce(d2To(cent))
    val codes = d1.withColumn("rn", row_number().over(wsub))
      .filter(col("rn") === 1)
      .select(col("vec_id").as("n_id"), col("sub").as("n_sub"),
        col("code").as("n_code"))
    (d1, codes)
  }

  /** ADC ranking tail shared by both PQ faces: candidates re-scored by
    * joining the neighbor's M codes to the query's M×K distance table
    * (pairs × M integer rows — no raw vectors on the candidate side),
    * top-k per query with deterministic (adc, neighbor) tie-break.
    */
  private def pqAdcRank(cand: DataFrame, d1: DataFrame,
      codes: DataFrame): DataFrame = {
    val dtab = d1.select(col("vec_id").as("q_id"), col("sub"),
      col("code"), col("d2"))
    val adc = cand.join(codes, col("neighbor_id") === col("n_id"))
      .join(dtab, col("q_id") === col("query_id") &&
        col("sub") === col("n_sub") && col("code") === col("n_code"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("d2")).as("adc"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("neighbor_id").asc)
    adc.withColumn("rank", row_number().over(wq))
      .filter(col("rank") <= pqTopK)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        floor(sqrt(col("adc").cast("double") / lit(1.0e12))
          * lit(1000000.0)).cast("long").as("adc_micro"))
  }

  def annPq(spark: SparkSession, sfDir: String): DataFrame =
    annPqRounds(spark, sfDir, rounds = 1)

  /** [[annPq]] at an explicit Lloyd depth — the RetrievalSpec
    * recall-vs-rounds measurement seam.
    */
  private[graft] def annPqRounds(spark: SparkSession, sfDir: String,
      rounds: Int): DataFrame = {
    val (d1, codes) = pqDistAndCodesRounds(spark, sfDir, rounds)
    // same plan as the codebook's persisted scan -> reads the cache
    val lbl = Caching.persistOnce(vecsFull(spark, sfDir))
      .select(col("vec_id"), col("label"))
    val cand = lbl.select(col("vec_id").as("query_id"), col("label"))
      .join(lbl.select(col("vec_id").as("neighbor_id"), col("label")),
        Seq("label"))
      .filter(col("query_id") =!= col("neighbor_id"))
    canon(pqAdcRank(cand, d1, codes))
  }

  /** FULL IVF-PQ — the production composition (Jégou, Douze, Schmid
    * 2011, §IV): the coarse k-means quantizer supplies candidate
    * blocking — each query probes its nprobe=[[ivfProbes]] nearest
    * DERIVED cells (the same assignment relation as
    * kmeans_assign/ann_ivf_auto, not the ground-truth label [[annPq]]
    * blocks on didactically) — and PQ ADC supplies the compressed
    * re-rank over exactly those candidates.
    *
    * Scale: candidates are cell-equi-join bounded (nprobe × cell
    * occupancy per query, never all-pairs); the candidate side carries
    * only M code bytes per vector; the coarse centroids and the
    * product codebooks are both tiny broadcasts; everything else is
    * the two faces' shared bounded machinery.
    */
  def annIvfPq(spark: SparkSession, sfDir: String): DataFrame = {
    val vf = Caching.persistOnce(vecsFull(spark, sfDir))
    val ranked = Caching.persistOnce(
      assignRankedFrom(vf, centArrOf(centroidsOf(quantizedOf(vf))),
          bits = 0)
        .select(col("vec_id"), col("cand"), col("rn")))
    // pqDistAndCodes persistOnce-shares the same vecsFull plan, so the
    // coarse quantizer and the codebook read ONE cached scan
    val (d1, codes) = pqDistAndCodes(spark, sfDir)
    val base = ranked.filter(col("rn") === 1)
      .select(col("vec_id").as("neighbor_id"), col("cand"))
    val probes = ranked.filter(col("rn") <= ivfProbes)
      .select(col("vec_id").as("query_id"), col("cand"))
    val cand = probes.join(base, Seq("cand"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id")).distinct()
    canon(pqAdcRank(cand, d1, codes))
  }

  val annPqSql: String =
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |px AS (SELECT vec_id, label, v,
       |         unnest(generate_series(1, len(v))) AS i FROM e),
       |q AS (SELECT vec_id, label, i - 1 AS pos, (i - 1) % $pqM AS sub,
       |        CAST(floor(v[i] * 1000000) AS BIGINT) AS xq FROM px),
       |seedrank AS (
       |  SELECT vec_id, row_number() OVER (ORDER BY
       |      ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT ASC,
       |      vec_id ASC) - 1 AS code
       |  FROM e),
       |seeds AS (SELECT vec_id AS seed_id, code FROM seedrank
       |          WHERE code < $pqK),
       |c0 AS (SELECT s.code, q.sub, q.pos,
       |         CAST(q.xq AS DOUBLE) / 1000000.0 AS c
       |       FROM seeds s JOIN q ON s.seed_id = q.vec_id),
       |d0 AS (SELECT q.vec_id, q.sub, c.code,
       |         sum(CAST(floor(
       |           (CAST(q.xq AS DOUBLE) / 1000000.0 - c.c)
       |             * (CAST(q.xq AS DOUBLE) / 1000000.0 - c.c) * 1e12)
       |           AS BIGINT)) AS d2
       |       FROM q JOIN c0 c ON q.sub = c.sub AND q.pos = c.pos
       |       GROUP BY 1, 2, 3),
       |a0 AS (SELECT vec_id, sub, code FROM (
       |         SELECT *, row_number() OVER (PARTITION BY vec_id, sub
       |           ORDER BY d2 ASC, code ASC) AS rn FROM d0) WHERE rn = 1),
       |c1 AS (SELECT a.sub, a.code, q.pos,
       |         CAST(sum(q.xq) AS DOUBLE) / (1000000.0 * count(*)) AS c
       |       FROM a0 a JOIN q ON a.vec_id = q.vec_id AND a.sub = q.sub
       |       GROUP BY 1, 2, 3),
       |d1 AS (SELECT q.vec_id, q.sub, c.code,
       |         sum(CAST(floor(
       |           (CAST(q.xq AS DOUBLE) / 1000000.0 - c.c)
       |             * (CAST(q.xq AS DOUBLE) / 1000000.0 - c.c) * 1e12)
       |           AS BIGINT)) AS d2
       |       FROM q JOIN c1 c ON q.sub = c.sub AND q.pos = c.pos
       |       GROUP BY 1, 2, 3),
       |codes AS (SELECT vec_id, sub, code FROM (
       |            SELECT *, row_number() OVER (PARTITION BY vec_id, sub
       |              ORDER BY d2 ASC, code ASC) AS rn FROM d1) WHERE rn = 1),
       |cand AS (SELECT x.vec_id AS query_id, y.vec_id AS neighbor_id
       |         FROM e x JOIN e y ON x.label = y.label
       |           AND x.vec_id <> y.vec_id),
       |adc AS (SELECT c.query_id, c.neighbor_id, sum(d.d2) AS adc
       |        FROM cand c
       |        JOIN codes k ON c.neighbor_id = k.vec_id
       |        JOIN d1 d ON d.vec_id = c.query_id AND d.sub = k.sub
       |          AND d.code = k.code
       |        GROUP BY 1, 2),
       |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |             ORDER BY adc ASC, neighbor_id ASC) AS rank FROM adc)
       |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
       |  CAST(floor(sqrt(CAST(adc AS DOUBLE) / 1e12) * 1000000.0) AS BIGINT)
       |    AS adc_micro
       |FROM ranked WHERE rank <= $pqTopK
       |${canonOrderSql(Seq("query_id", "neighbor_id", "rank", "adc_micro"))}""".stripMargin

  /** Oracle: the coarse assignment CTEs (the kmeans_assign oracle) and
    * the PQ codebook CTEs (the ann_pq oracle) composed — candidates
    * come from the derived-cell probe join, scoring from ADC.
    */
  val annIvfPqSql: String =
    s"""$assignCteSql,
       |qs AS (SELECT vec_id, pos, pos % $pqM AS sub, xq FROM q),
       |seedrank AS (
       |  SELECT vec_id, row_number() OVER (ORDER BY
       |      ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT ASC,
       |      vec_id ASC) - 1 AS code
       |  FROM e),
       |seeds AS (SELECT vec_id AS seed_id, code FROM seedrank
       |          WHERE code < $pqK),
       |c0 AS (SELECT s.code, t.sub, t.pos,
       |         CAST(t.xq AS DOUBLE) / 1000000.0 AS c
       |       FROM seeds s JOIN qs t ON s.seed_id = t.vec_id),
       |d0 AS (SELECT t.vec_id, t.sub, c.code,
       |         sum(CAST(floor(
       |           (CAST(t.xq AS DOUBLE) / 1000000.0 - c.c)
       |             * (CAST(t.xq AS DOUBLE) / 1000000.0 - c.c) * 1e12)
       |           AS BIGINT)) AS d2
       |       FROM qs t JOIN c0 c ON t.sub = c.sub AND t.pos = c.pos
       |       GROUP BY 1, 2, 3),
       |a0 AS (SELECT vec_id, sub, code FROM (
       |         SELECT *, row_number() OVER (PARTITION BY vec_id, sub
       |           ORDER BY d2 ASC, code ASC) AS rn FROM d0) WHERE rn = 1),
       |c1 AS (SELECT a.sub, a.code, t.pos,
       |         CAST(sum(t.xq) AS DOUBLE) / (1000000.0 * count(*)) AS c
       |       FROM a0 a JOIN qs t ON a.vec_id = t.vec_id AND a.sub = t.sub
       |       GROUP BY 1, 2, 3),
       |d1 AS (SELECT t.vec_id, t.sub, c.code,
       |         sum(CAST(floor(
       |           (CAST(t.xq AS DOUBLE) / 1000000.0 - c.c)
       |             * (CAST(t.xq AS DOUBLE) / 1000000.0 - c.c) * 1e12)
       |           AS BIGINT)) AS d2
       |       FROM qs t JOIN c1 c ON t.sub = c.sub AND t.pos = c.pos
       |       GROUP BY 1, 2, 3),
       |codes AS (SELECT vec_id, sub, code FROM (
       |            SELECT *, row_number() OVER (PARTITION BY vec_id, sub
       |              ORDER BY d2 ASC, code ASC) AS rn FROM d1) WHERE rn = 1),
       |cnd AS (SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
       |        FROM r a JOIN r b ON a.cand = b.cand
       |        WHERE b.rn = 1 AND a.rn <= $ivfProbes
       |          AND a.vec_id <> b.vec_id),
       |adc AS (SELECT c.query_id, c.neighbor_id, sum(d.d2) AS adc
       |        FROM cnd c
       |        JOIN codes k ON c.neighbor_id = k.vec_id
       |        JOIN d1 d ON d.vec_id = c.query_id AND d.sub = k.sub
       |          AND d.code = k.code
       |        GROUP BY 1, 2),
       |rankedq AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |              ORDER BY adc ASC, neighbor_id ASC) AS rank FROM adc)
       |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
       |  CAST(floor(sqrt(CAST(adc AS DOUBLE) / 1e12) * 1000000.0) AS BIGINT)
       |    AS adc_micro
       |FROM rankedq WHERE rank <= $pqTopK
       |${canonOrderSql(Seq("query_id", "neighbor_id", "rank", "adc_micro"))}""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_pq" -> annPq,
    "ann_ivf_pq" -> annIvfPq,
    "cosine_pairs" -> cosinePairs,
    "ann_topk" -> annTopk,
    "ann_lsh" -> annLsh,
    "dedup_embedding" -> dedupEmbedding,
    "centroid_residuals" -> centroidResiduals,
    "kmeans_assign" -> kmeansAssign,
    "ann_ivf_probe" -> annIvfProbe,
    "ann_ivf_subcell" -> annIvfSubcell,
    "ann_ivf_subcell_probe" -> annIvfSubcellProbe,
    "ann_ivf_auto" -> annIvfAuto,
    "ann_lsh_multi" -> annLshMulti,
    "ann_lsh_multi_wide" -> annLshMultiWide,
    "ann_lsh_auto" -> annLshAuto,
    "semdedup" -> semDedup)

  val oracles: Map[String, String] = Map(
    "ann_pq" -> annPqSql,
    "ann_ivf_pq" -> annIvfPqSql,
    "cosine_pairs" -> cosinePairsSql,
    "ann_topk" -> annTopkSql,
    "ann_lsh" -> annLshSql,
    "dedup_embedding" -> dedupEmbeddingSql,
    "centroid_residuals" -> centroidResidualsSql,
    "kmeans_assign" -> kmeansAssignSql,
    "ann_ivf_probe" -> annIvfProbeSql,
    "ann_ivf_subcell" -> annIvfSubcellSql,
    "ann_ivf_subcell_probe" -> annIvfSubcellProbeSql,
    "ann_ivf_auto" -> annIvfAutoSql,
    "ann_lsh_multi" -> annLshMultiSql,
    "ann_lsh_multi_wide" -> annLshMultiWideSql,
    "ann_lsh_auto" -> annLshAutoSql,
    "semdedup" -> semDedupSql)
}
