package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.Tables.{canon, canonOrderSql, load}

/** Deduplication family over `documents` (SURVEY.md north-star ops):
  * exact (hash groupBy), n-gram Jaccard pairs, MinHash+LSH
  * (shingle → md5-family minhash → banded buckets → candidate join →
  * verify), and SimHash. All engine-independent: every hash is md5-based
  * so the DuckDB oracles reproduce signatures bit-for-bit.
  *
  * Scale notes:
  *  - shingle self-join shuffles on the shingle key; popular shingles are
  *    the skew risk → AQE skew-join handles it, and the LSH path bounds
  *    candidate pairs to same-bucket docs (the 100 TB-safe route vs the
  *    quadratic all-pairs verify).
  *  - minhash/simhash signatures are one groupBy(doc_id) each — linear.
  */
object Dedup {

  /** The single 3-gram shingle-array formulation (over a token array
    * column `t`), shared by every consumer so the md5-based oracle
    * parity cannot drift between copies. `fallback` is the whole-text
    * shingle used for under-3-token docs.
    */
  private[graft] def shingleArrayExpr(fallback: String): String =
    s"""CASE WHEN size(t) >= 3
       |THEN transform(sequence(0, size(t) - 3),
       |               i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))
       |ELSE array($fallback) END""".stripMargin

  /** (doc_id, shingle) with distinct 3-gram shingles per doc, persisted.
    * Consumers: ngram_jaccard (pair generation IS the shingle-key join)
    * and TextOps.contaminationCheck (per-shingle membership counts) —
    * the LSH path no longer touches this relation (native signatures +
    * per-pair overlap verify). MEMORY_AND_DISK for safety at larger SFs.
    */
  private[operators] def shingles(d: DataFrame): DataFrame =
    // repartition BEFORE the explode: the input is a handful of parquet
    // files (few input splits), but the work is per-shingle — size the
    // partitioning for the post-expansion volume or the whole hash
    // pipeline runs single-threaded (measured: 2.5s 1-task stages)
    Caching.persistOnce(
      d.repartition(d.sparkSession.sparkContext.defaultParallelism, col("doc_id"))
        .withColumn("t", split(lower(col("text")), " "))
        .withColumn("sh", expr(shingleArrayExpr("lower(text)")))
        .select(col("doc_id"), explode(array_distinct(col("sh"))).as("shingle")))

  private val shinglesCte =
    """base AS (
      |  SELECT doc_id, lower(text) AS lt, string_split(lower(text), ' ') AS t
      |  FROM documents
      |), sh0 AS (
      |  SELECT doc_id, unnest(
      |    CASE WHEN len(t) >= 3
      |      THEN list_transform(range(1, len(t) - 1),
      |                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
      |      ELSE [lt] END) AS shingle
      |  FROM base
      |), sh AS (SELECT DISTINCT doc_id, shingle FROM sh0)""".stripMargin

  /** Exact dedup: group by text digest, keep min doc_id as canonical. */
  def dedupExact(spark: SparkSession, sfDir: String): DataFrame = {
    val d = load(spark, sfDir, "documents")
    val out = d.groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("n_copies"))
    canon(out)
  }

  val dedupExactSql: String =
    s"""SELECT md5(text) AS text_hash, min(doc_id) AS canonical_id,
       |  count(*) AS n_copies
       |FROM documents GROUP BY 1
       |${canonOrderSql(Seq("text_hash", "canonical_id", "n_copies"))}""".stripMargin

  /** N-gram Jaccard near-dup pairs: 3-gram shingle sets, pairwise
    * |∩| / |∪| over a shingle-key self-join.
    */
  def ngramJaccard(spark: SparkSession, sfDir: String): DataFrame =
    ngramJaccardOn(load(spark, sfDir, "documents"))

  /** Core on an arbitrary (doc_id, text) relation — lets specs seed
    * documents with known near-dups (LshRecallSpec).
    */
  def ngramJaccardOn(d: DataFrame): DataFrame = {
    val sh = shingles(d)
    val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val pairs = sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("shared"))
    val jac = col("shared").cast("double") /
      (col("na") + col("nb") - col("shared")).cast("double")
    val out = pairs
      .join(counts.withColumnRenamed("n_sh", "na").withColumnRenamed("doc_id", "ka"),
        col("a_id") === col("ka"))
      .join(counts.withColumnRenamed("n_sh", "nb").withColumnRenamed("doc_id", "kb"),
        col("b_id") === col("kb"))
      .select(col("a_id"), col("b_id"), col("shared"), jac.as("jaccard"))
      .filter(col("jaccard") >= 0.3)
    canon(out)
  }

  val ngramJaccardSql: String =
    s"""WITH $shinglesCte,
       |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
       |pr AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS shared
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT a_id, b_id, shared,
       |  CAST(shared AS DOUBLE) / CAST(ca.n_sh + cb.n_sh - shared AS DOUBLE) AS jaccard
       |FROM pr
       |JOIN cnt ca ON pr.a_id = ca.doc_id
       |JOIN cnt cb ON pr.b_id = cb.doc_id
       |WHERE CAST(shared AS DOUBLE) / CAST(ca.n_sh + cb.n_sh - shared AS DOUBLE) >= 0.3
       |${canonOrderSql(Seq("a_id", "b_id", "shared", "jaccard"))}""".stripMargin

  /** MinHash + LSH near-dup: 8 md5-family minhashes per doc, 4 bands of 2
    * rows; docs sharing any band bucket become candidates; candidates are
    * verified with true Jaccard. The banded-bucket join is the scale path:
    * candidate count is bounded by bucket collisions, never all-pairs.
    */
  def minhashLsh(spark: SparkSession, sfDir: String): DataFrame =
    minhashLshOn(load(spark, sfDir, "documents"))

  /** Core on an arbitrary (doc_id, text) relation (see ngramJaccardOn). */
  def minhashLshOn(d: DataFrame): DataFrame = {
    graft.plans.TextExprs.register(d.sparkSession)
    // signatures + n_sh in ONE narrow pass via the native graft_minhash
    // expression (plans/TextExprs.scala): 8 independent 32-bit min-hashes
    // from TWO md5 evaluations per shingle, with NO shingle explode and
    // NO groupBy shuffle.
    val sigs = d
      .filter(col("text").isNotNull) // NULL text has no shingles → no sig row
      .select(col("doc_id"), lower(col("text")).as("lt"),
        expr("graft_minhash(lower(text))").as("m"))
      .select((col("doc_id") +: col("lt") +:
        (0 until 8).map(k => col(s"m.s$k").as(s"s$k"))) :+
        col("m.n_sh").as("n_sh"): _*)
    val banded = sigs
      .withColumn("b0", md5(concat(col("s0"), col("s1"))))
      .withColumn("b1", md5(concat(col("s2"), col("s3"))))
      .withColumn("b2", md5(concat(col("s4"), col("s5"))))
      .withColumn("b3", md5(concat(col("s6"), col("s7"))))
      .selectExpr("doc_id",
        "stack(4, 0, b0, 1, b1, 2, b2, 3, b3) AS (band_idx, bucket)")
    // NOT persisted: since the native-overlap rewrite, cand has exactly
    // one consumer (the meta join chain below) — a cache here would be a
    // full extra write of the candidate set for zero reuse
    val cand = banded.as("x")
      .join(banded.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .agg(count(lit(1)).as("n_shared_bands"))
    // verify with true jaccard computed ONLY for candidate pairs (the LSH
    // point: intersection work is bounded by bucket collisions, never by
    // all overlapping pairs). The intersection |A ∩ B| is computed by the
    // native graft_shingle_overlap kernel ON the pair row — one
    // (doc_id, lowered-text, n_sh) join per side replaces the old
    // explode(shingles) → two shingle-key joins → groupBy(pair) pipeline,
    // deleting the last explode (and its persisted relation) from this
    // path. cand scales with corpus size × dup rate, so no forced
    // broadcast: the join key is doc_id and SMJ/AQE handle a
    // near-dup-heavy corpus where cand outgrows the broadcast threshold.
    val meta = sigs.select(col("doc_id"), col("lt"), col("n_sh"))
    val out = cand
      .join(meta.select(col("doc_id").as("ka"), col("lt").as("la"),
        col("n_sh").as("na")), col("a_id") === col("ka"))
      .join(meta.select(col("doc_id").as("kb"), col("lt").as("lb"),
        col("n_sh").as("nb")), col("b_id") === col("kb"))
      .withColumn("shared", expr("graft_shingle_overlap(la, lb)"))
      .select(col("a_id"), col("b_id"), col("n_shared_bands"),
        (col("shared").cast("double") /
          (col("na") + col("nb") - col("shared")).cast("double"))
          .as("jaccard"))
    canon(out)
  }

  /** The minhash-LSH pair pipeline as a reusable CTE chain ending in
    * `mh_pairs(a_id, b_id, n_shared_bands, jaccard)` — single SQL source
    * of truth for [[minhashLshOn]], consumed by minhash_lsh itself and
    * by TrainOps.splitLeakCheck.
    */
  private[operators] val minhashPairsCte: String = {
    val sigSelect = (0 until 8).map { k =>
      val src = if (k < 4) "md5(shingle)" else "md5('x:' || shingle)"
      s"min(substr($src, ${(k % 4) * 8 + 1}, 8)) AS s$k"
    }.mkString(", ")
    s"""$shinglesCte,
       |sigs AS (SELECT doc_id, $sigSelect, count(*) AS n_sh FROM sh GROUP BY 1),
       |banded AS (
       |  SELECT doc_id, 0 AS band_idx, md5(s0 || s1) AS bucket FROM sigs
       |  UNION ALL SELECT doc_id, 1, md5(s2 || s3) FROM sigs
       |  UNION ALL SELECT doc_id, 2, md5(s4 || s5) FROM sigs
       |  UNION ALL SELECT doc_id, 3, md5(s6 || s7) FROM sigs),
       |cand AS (
       |  SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS n_shared_bands
       |  FROM banded x JOIN banded y
       |    ON x.band_idx = y.band_idx AND x.bucket = y.bucket
       |      AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2),
       |cnt AS (SELECT doc_id, n_sh FROM sigs),
       |shr AS (
       |  SELECT c.a_id AS sa, c.b_id AS sb, count(*) AS shared
       |  FROM cand c
       |  JOIN sh a ON c.a_id = a.doc_id
       |  JOIN sh b ON c.b_id = b.doc_id AND a.shingle = b.shingle
       |  GROUP BY 1, 2),
       |mh_pairs AS (
       |  SELECT c.a_id, c.b_id, c.n_shared_bands,
       |    CAST(coalesce(s.shared, 0) AS DOUBLE)
       |      / CAST(ca.n_sh + cb.n_sh - coalesce(s.shared, 0) AS DOUBLE) AS jaccard
       |  FROM cand c
       |  LEFT JOIN shr s ON c.a_id = s.sa AND c.b_id = s.sb
       |  JOIN cnt ca ON c.a_id = ca.doc_id
       |  JOIN cnt cb ON c.b_id = cb.doc_id)""".stripMargin
  }

  val minhashLshSql: String =
    s"""WITH $minhashPairsCte
       |SELECT a_id, b_id, n_shared_bands, jaccard FROM mh_pairs
       |${canonOrderSql(Seq("a_id", "b_id", "n_shared_bands", "jaccard"))}""".stripMargin

  /** SimHash: 32-bit signature from per-token md5 bit votes (weighted by
    * occurrence), via the native codegen'd `graft_simhash` expression
    * (plans/TextExprs.scala) — one narrow pass per document, NO token
    * explode, NO shuffle, no 32-aggregate codegen blowup. Bit-identical
    * to the SQL formulation the DuckDB oracle runs (simhashCte below).
    */
  private[operators] def simhashSigs(d: DataFrame): DataFrame = {
    graft.plans.TextExprs.register(d.sparkSession)
    // NULL text must DROP the document (the old explode pipeline and the
    // DuckDB oracle's unnest both emit zero rows for it) — without the
    // filter the null-intolerant expression would keep a NULL-sig row
    d.filter(col("text").isNotNull)
      .select(col("doc_id"), expr("graft_simhash(lower(text))").as("simhash"))
  }

  def simhash(spark: SparkSession, sfDir: String): DataFrame =
    canon(simhashSigs(load(spark, sfDir, "documents")))

  /** Signatures on an arbitrary (doc_id, text) relation — lets the recall
    * spec compute an exact all-pairs hamming baseline on seeded docs.
    */
  def simhashOn(d: DataFrame): DataFrame = canon(simhashSigs(d))

  /** SimHash near-dup pairs, pigeonhole-banded: the 32-bit signature is
    * split into 4 bands of 8 bits; docs colliding in ANY band become
    * candidates (deduped), then exact hamming via bit_count(xor) keeps
    * pairs at distance <= 6. The pigeonhole principle makes recall
    * GUARANTEED for distance <= 3 (3 differing bits cannot dirty all 4
    * bands) and high for 4-6 (LshRecallSpec pins the measured floor);
    * the old single high-16-bit block could miss a distance-1 pair
    * outright. Join shape is the same (band_idx, band_val) equi-join the
    * MinHash LSH path uses — candidates bounded by band collisions, never
    * all-pairs.
    *
    * Scale note: band WIDTH sets bucket cardinality — w-bit bands give
    * 2^w buckets, so expected candidates grow ~N²/2^w per band. The
    * 32-bit/4×8 geometry here is the oracle-parity demo; at corpus scale
    * the same pipeline widens to a 64⁺-bit signature with 16-bit bands
    * (65k buckets, pigeonhole radius 3 preserved) — identical join shape,
    * only the stack() literals change.
    */
  def simhashNeardup(spark: SparkSession, sfDir: String): DataFrame =
    simhashNeardupOn(load(spark, sfDir, "documents"))

  /** Core on an arbitrary (doc_id, text) relation (see ngramJaccardOn). */
  def simhashNeardupOn(d: DataFrame): DataFrame =
    bandedNeardup(simhashSigs(d), bandBits = 8)

  /** The ONE banded near-dup pipeline, shared by the demo (4×8-bit) and
    * production (4×15-bit) geometries — band width really is the only
    * difference between them. Hamming filter BEFORE the dedup: a pair
    * can collide in up to 4 bands, but the exact-hamming test is a
    * cheap scalar on the joined row while distinct() is a shuffle —
    * filtering first shrinks the dedup's input from all band collisions
    * to true near-dup pairs. Same output rows either way.
    */
  private def bandedNeardup(sigs: DataFrame, bandBits: Int): DataFrame =
    canon(bandedNeardupRaw(sigs, bandBits))

  /** Pre-canon pair set — clustering consumes this directly: it feeds a
    * groupBy, so the query-facing global ORDER BY would be wasted work.
    */
  private def bandedNeardupRaw(sigs: DataFrame, bandBits: Int): DataFrame = {
    val mask = (1 << bandBits) - 1
    val bands = (0 until 4).map(i =>
      s"$i, shiftright(simhash, ${i * bandBits}) & $mask").mkString(",\n  ")
    val banded = sigs.selectExpr("doc_id", "simhash",
      s"stack(4,\n  $bands) AS (band_idx, band_val)")
    val a = banded.select(col("doc_id").as("a_id"), col("simhash").as("sa"),
      col("band_idx"), col("band_val"))
    val b = banded.select(col("doc_id").as("b_id"), col("simhash").as("sb"),
      col("band_idx"), col("band_val"))
    a.join(b, Seq("band_idx", "band_val"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))))
      .filter(col("hamming") <= 6)
      .select(col("a_id"), col("b_id"), col("hamming").cast("int").as("hamming"))
      .distinct()
  }

  /** 60-bit signatures (graft_simhash60) — the production-geometry face. */
  private[operators] def simhash60Sigs(d: DataFrame): DataFrame = {
    graft.plans.TextExprs.register(d.sparkSession)
    d.filter(col("text").isNotNull)
      .select(col("doc_id"), expr("graft_simhash60(lower(text))").as("simhash"))
  }

  /** Signatures accessor for the recall spec's exact baseline. */
  def simhash60On(d: DataFrame): DataFrame = canon(simhash60Sigs(d))

  /** SimHash near-dup pairs at the PRODUCTION band geometry promised in
    * SCALING.md: 60-bit signature, 4 bands × 15 bits → 32768 buckets per
    * band, so candidate volume shrinks ~2^7× per band vs the 8-bit demo
    * bands while the pigeonhole guarantee (full recall at hamming ≤ 3)
    * is unchanged — the join shape is IDENTICAL to `simhash_neardup`,
    * only the stack() literals changed. Demonstrates that widening the
    * geometry is a constant-edit, not a redesign.
    */
  def simhashWideNeardup(spark: SparkSession, sfDir: String): DataFrame =
    simhashWideNeardupOn(load(spark, sfDir, "documents"))

  /** Core on an arbitrary (doc_id, text) relation (see ngramJaccardOn). */
  def simhashWideNeardupOn(d: DataFrame): DataFrame =
    bandedNeardup(simhash60Sigs(d), bandBits = 15)

  /** The ONE DuckDB simhash-signature CTE, parameterized by signature
    * width (hex chars = bits/4, per-token hash = leading hex of md5).
    */
  private def simhashCteFor(bits: Int): String = {
    val hexChars = bits / 4
    val bitSums = (0 until bits).map(j =>
      s"sum(((h >> $j) & 1) * 2 - 1) AS bit$j").mkString(",\n    ")
    val sig = (0 until bits).map(j =>
      s"CASE WHEN bit$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
    s"""toks AS (
       |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
       |  FROM documents
       |), hashed AS (
       |  SELECT doc_id, ('0x' || substr(md5(tok), 1, $hexChars))::BIGINT AS h FROM toks
       |), sums AS (
       |  SELECT doc_id,
       |    $bitSums
       |  FROM hashed GROUP BY 1
       |), sig AS (
       |  SELECT doc_id, $sig AS simhash FROM sums
       |)""".stripMargin
  }

  private val simhashCte: String = simhashCteFor(32)
  private val simhash60Cte: String = simhashCteFor(60)

  /** Shared CTE prefix (signatures → bands → candidate pairs), reused by
    * the pairs oracle and the clusters oracle.
    */
  private def bandedCandCte(cte: String, bandBits: Int): String = {
    val mask = (1 << bandBits) - 1
    val bandRows = (0 until 4).map { i =>
      val head = if (i == 0) "" else "UNION ALL "
      s"$head  SELECT doc_id, simhash, $i AS band_idx, " +
        s"(simhash >> ${i * bandBits}) & $mask AS band_val FROM sig"
    }.mkString("\n")
    s"""$cte,
       |banded AS (
       |$bandRows),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
       |    a.simhash AS sa, b.simhash AS sb
       |  FROM banded a JOIN banded b
       |    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       |      AND a.doc_id < b.doc_id)""".stripMargin
  }

  /** The ONE banded-pairs oracle SQL, mirroring [[bandedNeardup]]. */
  private def bandedNeardupSql(cte: String, bandBits: Int): String =
    s"""WITH ${bandedCandCte(cte, bandBits)}
       |SELECT a_id, b_id, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
       |FROM cand WHERE bit_count(xor(sa, sb)) <= 6
       |${canonOrderSql(Seq("a_id", "b_id", "hamming"))}""".stripMargin

  val simhashWideNeardupSql: String = bandedNeardupSql(simhash60Cte, 15)

  /** Near-dup CLUSTERING: connected components over the wide-band
    * near-dup pair graph — the step a training-data pipeline runs after
    * pair detection (keep one canonical document per duplicate cluster,
    * count cluster mass). cluster_id = min doc_id in the component
    * (deterministic), cluster_size includes singletons, is_canonical
    * marks the kept document.
    *
    * Distributed shape: iterative min-label propagation WITH pointer
    * jumping (label(v) ← label(label(v)) each round), so convergence is
    * O(log diameter) rounds — measured 13 → 5 at sf0.1 on diameter-12
    * chains; alternating small-star/large-star is the next rung if an
    * adversarial graph ever needs O(log n). Each round is one shuffle
    * keyed by doc_id plus the jump self-join; the driver reads ONE
    * aggregate row per round for loop control (the monotone label sum,
    * summed as DECIMAL so huge id domains can't overflow), data never
    * collects. Lineage is truncated every round by round-tripping
    * through an explicitly persisted RDD — without truncation the
    * driver dies optimizing exponentially deep plans at ANY data size
    * (observed at 500 docs) — and the previous round's blocks are
    * unpersisted as soon as the next materializes, so executor storage
    * holds exactly one generation.
    */
  def dedupClusters(spark: SparkSession, sfDir: String): DataFrame =
    dedupClustersOn(load(spark, sfDir, "documents"))

  /** Core on an arbitrary (doc_id, text) relation (see ngramJaccardOn). */
  def dedupClustersOn(d: DataFrame): DataFrame = {
    val spark = d.sparkSession
    val docs = d.filter(col("text").isNotNull).select(col("doc_id"))
    // pre-canon pairs: the clustering groupBy destroys order, so the
    // query-facing global sort would be pure waste; persisted because
    // both edge directions and every round's join read it
    val pairs = Caching.persistOnce(
      bandedNeardupRaw(simhash60Sigs(d), bandBits = 15)
        .select(col("a_id"), col("b_id")))
    val edges = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
      .unionByName(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
    val labelSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("label", LongType)))
    // lineage truncation with an EXPLICIT storage handle: the plan is
    // rebuilt over a persisted RDD[Row] each round, and the superseded
    // round's blocks are dropped immediately (localCheckpoint would
    // leave every generation to asynchronous GC cleanup)
    def truncate(df: DataFrame): (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]) = {
      val rdd = df.rdd
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      (spark.createDataFrame(rdd, labelSchema), rdd)
    }
    // the loop runs ONLY over nodes that appear in some pair — a doc in
    // no pair is its own singleton cluster forever, and at real dup
    // rates that excludes most of the corpus from every round.
    // Seeded at min(self, min neighbor) rather than identity
    // (round 15): identity labels made round 1 compute exactly this
    // aggregation through the full prop+jump+sum cycle — seeding folds
    // that round into initialization (one aggregation, no join), and
    // min-propagation's unique fixpoint keeps the converged labels
    // identical (oracle-pinned)
    var (labels, curRdd) = truncate(
      edges.groupBy(col("src").as("doc_id"))
        .agg(min(col("dst")).as("mn"))
        .select(col("doc_id"),
          least(col("doc_id"), col("mn")).as("label")))
    // convergence via the label sum: min-propagation is monotone
    // non-increasing per node, so an unchanged sum == no change anywhere
    // — one aggregate action per round. DECIMAL(38,0) sum: a LONG sum
    // overflows (ANSI: throws) on billions of snowflake-sized ids, and
    // the empty-graph sum is NULL → "0"
    def labelSum(df: DataFrame): String =
      Option(df.agg(sum(col("label").cast("decimal(38,0)")))
        .head().getDecimal(0)).map(_.toString).getOrElse("empty")
    var prevSum = labelSum(labels)
    // empty pair graph (NULL sum, not a numeric sentinel — doc_ids may
    // legitimately sum to zero): all docs are singletons, skip the loop
    var converged = prevSum == "empty"
    var rounds = 0
    while (!converged && rounds < 50) {
      rounds += 1
      // neighbor labels flow along edges; min with own label per node —
      // truncated+persisted because the pointer jump below self-joins it
      // (Catalyst reuses the exchange but re-executes the aggregation
      // once per consumer otherwise)
      val (prop, propRdd) = truncate(
        labels.unionByName(
          labels.join(edges, col("doc_id") === col("src"))
            .select(col("dst").as("doc_id"), col("label")))
          .groupBy(col("doc_id")).agg(min(col("label")).as("label")))
      // pointer jumping: label(v) ← label(label(v)). Every label is
      // itself a paired node, and min-propagation is monotone, so the
      // jump can only lower labels
      val (nextLabels, nextRdd) = truncate(prop
        .join(prop.select(col("doc_id").as("p"), col("label").as("plabel")),
          col("label") === col("p"), "left")
        .select(col("doc_id"),
          coalesce(col("plabel"), col("label")).as("label")))
      val s = labelSum(nextLabels) // materializes propRdd then nextRdd
      propRdd.unpersist(false)
      curRdd.unpersist(false)
      labels = nextLabels
      curRdd = nextRdd
      converged = s == prevSum
      prevSum = s
    }
    require(converged, s"label propagation did not converge in $rounds rounds")
    // singletons (docs in no pair) rejoin with label = self. The final
    // labels RDD stays persisted — the caller's action reads it; blocks
    // are freed by the session's ContextCleaner when the frame is GC'd
    val allLabels = docs.join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("label"))
    val sizes = allLabels.groupBy(col("label")).agg(count(lit(1)).as("cluster_size"))
    val out = allLabels.join(sizes, Seq("label"))
      .select(col("doc_id"), col("label").as("cluster_id"),
        col("cluster_size"),
        when(col("doc_id") === col("label"), 1).otherwise(0).as("is_canonical"))
    canon(out)
  }

  /** Oracle: transitive closure via a recursive CTE over the same pair
    * graph; label = min reachable doc_id (including self).
    */
  val dedupClustersSql: String =
    s"""WITH RECURSIVE ${bandedCandCte(simhash60Cte, 15)},
       |pairs AS (
       |  SELECT a_id, b_id FROM cand WHERE bit_count(xor(sa, sb)) <= 6),
       |edges AS (
       |  SELECT a_id AS src, b_id AS dst FROM pairs
       |  UNION ALL SELECT b_id, a_id FROM pairs),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |docs AS (SELECT doc_id FROM documents WHERE text IS NOT NULL),
       |lab AS (
       |  SELECT d.doc_id,
       |    least(d.doc_id, coalesce(min(r.dst), d.doc_id)) AS cluster_id
       |  FROM docs d LEFT JOIN reach r ON d.doc_id = r.src
       |  GROUP BY d.doc_id),
       |sizes AS (
       |  SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY 1)
       |SELECT l.doc_id, cluster_id, s.cluster_size,
       |  CASE WHEN l.doc_id = cluster_id THEN 1 ELSE 0 END AS is_canonical
       |FROM lab l JOIN sizes s USING (cluster_id)
       |${canonOrderSql(Seq("doc_id", "cluster_id", "cluster_size", "is_canonical"))}""".stripMargin

  val simhashSql: String =
    s"""WITH $simhashCte
       |SELECT doc_id, simhash FROM sig
       |${canonOrderSql(Seq("doc_id", "simhash"))}""".stripMargin

  val simhashNeardupSql: String = bandedNeardupSql(simhashCte, 8)

  /** Priority-aware exact dedup: among exact-text duplicates keep the
    * copy from the MOST TRUSTED source (curated beats crawl), breaking
    * ties on doc_id — the canonicalization rule real corpus builds use
    * instead of min-id. One groupBy on the text digest; the keeper is
    * picked with a single min(struct(priority, doc_id)) aggregate (no
    * window, no second shuffle).
    */
  private val sourcePriority = Seq("src1", "src3", "src0", "src2")

  def dedupPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val d = load(spark, sfDir, "documents")
    val prio = sourcePriority.zipWithIndex.foldRight(lit(99): Column) {
      case ((src, p), acc) => when(col("source") === src, lit(p)).otherwise(acc)
    }
    val out = d
      .select(md5(col("text")).as("text_hash"), col("doc_id"),
        col("source"), prio.as("prio"))
      .groupBy(col("text_hash"))
      .agg(
        min(struct(col("prio"), col("doc_id"), col("source"))).as("best"),
        count(lit(1)).as("n_copies"))
      .select(col("text_hash"), col("best.doc_id").as("keep_id"),
        col("best.source").as("keep_source"), col("n_copies"))
    canon(out)
  }

  val dedupPrioritySql: String = {
    val prioCase = sourcePriority.zipWithIndex
      .map { case (s, p) => s"WHEN source = '$s' THEN $p" }
      .mkString("CASE ", " ", " ELSE 99 END")
    s"""WITH scored AS (
       |  SELECT md5(text) AS text_hash, doc_id, source,
       |    $prioCase AS prio
       |  FROM documents),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY text_hash
       |    ORDER BY prio ASC, doc_id ASC) AS rn,
       |    count(*) OVER (PARTITION BY text_hash) AS n_copies
       |  FROM scored)
       |SELECT text_hash, doc_id AS keep_id, source AS keep_source, n_copies
       |FROM ranked WHERE rn = 1
       |${canonOrderSql(Seq("text_hash", "keep_id", "keep_source", "n_copies"))}""".stripMargin
  }

  // ---------------------------------------------------------------------
  // fuzzy_match — blocked-Levenshtein entity resolution
  // ---------------------------------------------------------------------

  /** Entity resolution by blocking + composite similarity: a "dirty"
    * registry (supplier names with one deterministically dropped
    * character, balances intact) is matched back to the clean table.
    * Candidates form only WITHIN a name-prefix block (never all-pairs —
    * the fuzzy-join analog of the LSH bucket) and must pass
    * `levenshtein ≤ 2`; resolution then ranks by the COMPOSITE key
    * (edit distance, |balance delta| in exact cents, key). The two-field
    * ranking is the demonstrated point: these synthetic names differ
    * only in digits, so name distance alone is maximally ambiguous
    * (n_candidates ≈ block size — visible in the output), and the
    * second attribute is what makes resolution exact; real-world
    * resolvers are composite for the same reason.
    *
    * Scale: the block join keys on a 16-char prefix whose trailing
    * digits bound each block at 100 names, so per-block work is bounded
    * regardless of table size; one more shuffle ranks candidates per
    * dirty record. Levenshtein cost is per candidate pair, not per
    * cross pair — and block width is THE cost knob: widening to 15
    * chars (1000-name blocks) measured 10× the pair work at sf0.1 for
    * recall this corruption model never needs (both corruption
    * positions sit past char 16, so the true match always shares the
    * 16-prefix).
    */
  def fuzzyMatch(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = load(spark, sfDir, "supplier")
      .select(col("s_suppkey"), col("s_name"),
        expr("cast(cast(s_acctbal as decimal(14,2)) * 100 as decimal(18,0))")
          .as("cents"))
    // drop the last char (even keys) or the 17th (odd keys) — both past
    // the blocking prefix, so the block key survives the corruption
    val dirty = s.select(col("s_suppkey").as("dirty_key"),
      when(col("s_suppkey") % 2 === 0, expr("substring(s_name, 1, 17)"))
        .otherwise(concat(expr("substring(s_name, 1, 16)"),
          expr("substring(s_name, 18, 1)"))).as("dirty_name"),
      col("cents").as("dirty_cents"))
    val cand = dirty
      .withColumn("blk", expr("substring(dirty_name, 1, 16)"))
      .join(s.withColumn("blk", expr("substring(s_name, 1, 16)")),
        Seq("blk"))
      .withColumn("lev", expr("levenshtein(dirty_name, s_name)"))
      .filter(col("lev") <= 2)
      .withColumn("bal_delta",
        abs(col("dirty_cents") - col("cents")).cast("long"))
    val w = Window.partitionBy(col("dirty_key"))
      .orderBy(col("lev").asc, col("bal_delta").asc, col("s_suppkey").asc)
    val out = cand
      .withColumn("rn", row_number().over(w))
      .withColumn("n_candidates",
        count(lit(1)).over(Window.partitionBy(col("dirty_key"))))
      .filter(col("rn") === 1)
      .select(col("dirty_key"), col("s_suppkey").as("matched_key"),
        col("lev"), col("bal_delta"), col("n_candidates"))
    canon(out)
  }

  val fuzzyMatchSql: String =
    s"""WITH s AS (
       |  SELECT s_suppkey, s_name,
       |    CAST(CAST(s_acctbal AS DECIMAL(14,2)) * 100 AS DECIMAL(18,0))
       |      AS cents
       |  FROM supplier
       |), dirty AS (
       |  SELECT s_suppkey AS dirty_key,
       |    CASE WHEN s_suppkey % 2 = 0 THEN substring(s_name, 1, 17)
       |         ELSE substring(s_name, 1, 16) || substring(s_name, 18, 1)
       |    END AS dirty_name,
       |    cents AS dirty_cents
       |  FROM s
       |), cand AS (
       |  SELECT d.dirty_key, s.s_suppkey,
       |    levenshtein(d.dirty_name, s.s_name) AS lev,
       |    CAST(abs(d.dirty_cents - s.cents) AS BIGINT) AS bal_delta
       |  FROM dirty d JOIN s
       |    ON substring(d.dirty_name, 1, 16) = substring(s.s_name, 1, 16)
       |  WHERE levenshtein(d.dirty_name, s.s_name) <= 2
       |), ranked AS (
       |  SELECT *,
       |    row_number() OVER (PARTITION BY dirty_key
       |      ORDER BY lev ASC, bal_delta ASC, s_suppkey ASC) AS rn,
       |    count(*) OVER (PARTITION BY dirty_key) AS n_candidates
       |  FROM cand
       |)
       |SELECT dirty_key, s_suppkey AS matched_key, lev, bal_delta,
       |  CAST(n_candidates AS BIGINT) AS n_candidates
       |FROM ranked WHERE rn = 1
       |${canonOrderSql(Seq("dirty_key", "matched_key", "lev", "bal_delta",
         "n_candidates"))}""".stripMargin

  /** Cross-corpus NEAR-dup contamination: the train/eval leakage scan
    * [[graft.operators.TextOps.contaminationCheck]] can't do — that
    * face counts exact shingle membership, so an eval document lightly
    * paraphrased into the training set (reordered sentences, a few
    * token edits) sails under it. This face runs the minhash-LSH
    * machinery ACROSS the split boundary: bench = the `src0` slice
    * (the same eval-set convention as contamination_check), train =
    * everything else, candidates = banded-bucket collisions between a
    * train doc and a bench doc ONLY — never train×train (the dedup
    * family owns those), never bench×bench. One row per train doc that
    * collides with any bench doc: its best-matching bench partner
    * (highest verified Jaccard, ties to the smaller bench id), its
    * candidate count, and a flag at the 0.5 floor.
    *
    * Scale: the bucket join is train-bands × BENCH-bands — the right
    * side scales with the eval corpus (tiny vs training data), so the
    * collision volume is bench-bounded, not corpus²; verification is
    * the same candidate-only graft_shingle_overlap contract as
    * minhash_lsh. No forced broadcast: AQE broadcasts the bench side
    * while it is actually small.
    *
    * Oracle note: candidates here are exactly the cross-source subset
    * of minhash_lsh's pair set, so the oracle reuses
    * [[minhashPairsCte]] and filters — one SQL source of truth for the
    * signature arithmetic.
    */
  def contaminationNeardup(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = load(spark, sfDir, "documents")
    graft.plans.TextExprs.register(spark)
    val sigs = d
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"), lower(col("text")).as("lt"),
        expr("graft_minhash(lower(text))").as("m"))
      .select((col("doc_id") +: col("source") +: col("lt") +:
        (0 until 8).map(k => col(s"m.s$k").as(s"s$k"))) :+
        col("m.n_sh").as("n_sh"): _*)
    val banded = sigs
      .withColumn("b0", md5(concat(col("s0"), col("s1"))))
      .withColumn("b1", md5(concat(col("s2"), col("s3"))))
      .withColumn("b2", md5(concat(col("s4"), col("s5"))))
      .withColumn("b3", md5(concat(col("s6"), col("s7"))))
      .selectExpr("doc_id", "source",
        "stack(4, 0, b0, 1, b1, 2, b2, 3, b3) AS (band_idx, bucket)")
    val bench = banded.filter(col("source") === "src0")
    val train = banded.filter(col("source") =!= "src0")
    val cand = train.as("x")
      .join(bench.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.bucket") === col("y.bucket"))
      .groupBy(col("x.doc_id").as("doc_id"), col("y.doc_id").as("bench_id"))
      .agg(count(lit(1)).as("n_shared_bands"))
    val meta = sigs.select(col("doc_id"), col("lt"), col("n_sh"))
    val verified = cand
      .join(meta.select(col("doc_id").as("ka"), col("lt").as("la"),
        col("n_sh").as("na")), col("doc_id") === col("ka"))
      .join(meta.select(col("doc_id").as("kb"), col("lt").as("lb"),
        col("n_sh").as("nb")), col("bench_id") === col("kb"))
      .withColumn("shared", expr("graft_shingle_overlap(la, lb)"))
      .select(col("doc_id"), col("bench_id"),
        (col("shared").cast("double") /
          (col("na") + col("nb") - col("shared")).cast("double"))
          .as("jaccard"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("jaccard").desc, col("bench_id").asc)
    val out = verified
      .withColumn("rn", row_number().over(w))
      .withColumn("n_cand",
        count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("n_cand"),
        col("bench_id").as("best_bench_id"),
        col("jaccard").as("best_jaccard"),
        when(col("jaccard") >= 0.5, 1).otherwise(0).as("flagged"))
    canon(out)
  }

  val contaminationNeardupSql: String =
    s"""WITH $minhashPairsCte,
       |src AS (SELECT doc_id, source FROM documents),
       |crossp AS (
       |  SELECT
       |    CASE WHEN sa.source = 'src0' THEN p.b_id ELSE p.a_id END AS doc_id,
       |    CASE WHEN sa.source = 'src0' THEN p.a_id ELSE p.b_id END AS bench_id,
       |    p.jaccard
       |  FROM mh_pairs p
       |  JOIN src sa ON p.a_id = sa.doc_id
       |  JOIN src sb ON p.b_id = sb.doc_id
       |  WHERE (sa.source = 'src0') <> (sb.source = 'src0')),
       |r AS (
       |  SELECT doc_id, bench_id, jaccard,
       |    row_number() OVER (PARTITION BY doc_id
       |      ORDER BY jaccard DESC, bench_id ASC) AS rn,
       |    count(*) OVER (PARTITION BY doc_id) AS n_cand
       |  FROM crossp)
       |SELECT doc_id, CAST(n_cand AS BIGINT) AS n_cand,
       |  bench_id AS best_bench_id, jaccard AS best_jaccard,
       |  CASE WHEN jaccard >= 0.5 THEN 1 ELSE 0 END AS flagged
       |FROM r WHERE rn = 1
       |${canonOrderSql(Seq("doc_id", "n_cand", "best_bench_id",
         "best_jaccard", "flagged"))}""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "contamination_neardup" -> contaminationNeardup,
    "fuzzy_match" -> fuzzyMatch,
    "dedup_exact" -> dedupExact,
    "dedup_priority" -> dedupPriority,
    "ngram_jaccard" -> ngramJaccard,
    "minhash_lsh" -> minhashLsh,
    "simhash" -> simhash,
    "simhash_neardup" -> simhashNeardup,
    "simhash_neardup_wide" -> simhashWideNeardup,
    "dedup_clusters" -> dedupClusters)

  val oracles: Map[String, String] = Map(
    "contamination_neardup" -> contaminationNeardupSql,
    "fuzzy_match" -> fuzzyMatchSql,
    "dedup_exact" -> dedupExactSql,
    "dedup_priority" -> dedupPrioritySql,
    "ngram_jaccard" -> ngramJaccardSql,
    "minhash_lsh" -> minhashLshSql,
    "simhash" -> simhashSql,
    "simhash_neardup" -> simhashNeardupSql,
    "simhash_neardup_wide" -> simhashWideNeardupSql,
    "dedup_clusters" -> dedupClustersSql)
}
