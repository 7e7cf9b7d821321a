package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Near-duplicate detection AT INGESTION: the streaming face of the
  * minhash-LSH pipeline (operators.Dedup.minhashLshOn) — documents
  * arrive in micro-batches, each batch is checked against an
  * incrementally-maintained LSH index of everything seen so far, and
  * verified near-dup pairs are emitted as they are discovered. This is
  * the dedup gate a training-data pipeline runs on the crawl firehose:
  * flag (and optionally drop) a document the moment it arrives, without
  * ever re-scanning the accumulated corpus.
  *
  * Index layout is the scale story (the CdcStream bucket discipline
  * applied to an LSH index):
  *
  *  - `buckets/` — (band_idx, bucket, doc_id), partitioned by
  *    (band_idx, bpfx) where bpfx = first hex byte of the bucket hash:
  *    4 × 256 = 1024 fixed partitions. A micro-batch touches only the
  *    partitions its docs hash into (≤ 4 × batch size, ≤ 1024), reads
  *    ONLY those (directory-pruned scan), and dynamically overwrites
  *    only those — per-batch work scales with the batch's hash spread
  *    TIMES the occupancy of the touched buckets, never with corpus
  *    size.
  *  - `docs/` — (doc_id, lt, n_sh) the verify side-table (lowered text
  *    + shingle count, ONE copy per doc, never 4×), partitioned by
  *    pmod(doc_id, 16) exactly like CdcStream state.
  *
  * Candidates are banded-bucket collisions (new docs vs accumulated ∪
  * within-batch, lower doc_id = the kept representative), verified with
  * TRUE Jaccard via the native graft_shingle_overlap kernel before
  * emission — the same candidate-only verify contract as the batch
  * operator, so the stream never does all-pairs work.
  *
  * Exactly-once: emissions are written with dynamic partition overwrite
  * keyed on batch_id (the QuarantineStream idempotence discipline) — a
  * retried micro-batch REPLACES its own output partition instead of
  * appending a duplicate; index updates are merge-dedup overwrites of
  * the touched partitions, so re-applying a batch is a no-op there too.
  */
object NearDupStream {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("source", StringType)))

  private val bucketsSchema: StructType = StructType(Seq(
    StructField("band_idx", IntegerType),
    StructField("bucket", StringType),
    StructField("doc_id", LongType),
    StructField("bpfx", StringType)))

  private val docsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lt", StringType),
    StructField("n_sh", LongType),
    StructField("dbucket", LongType)))

  /** Verified-Jaccard floor for emitting a pair. */
  private val jaccardFloor = 0.5

  private val nDocBuckets = 16

  /** Banded signature rows of a (doc_id, text) relation — the exact
    * band geometry of Dedup.minhashLshOn (8 native minhashes, 4 bands
    * of 2), plus the bucket-prefix partition column.
    */
  private def bandRel(d: DataFrame): DataFrame = {
    graft.plans.TextExprs.register(d.sparkSession)
    d.filter(col("text").isNotNull)
      .select(col("doc_id"), expr("graft_minhash(lower(text))").as("m"))
      .withColumn("b0", md5(concat(col("m.s0"), col("m.s1"))))
      .withColumn("b1", md5(concat(col("m.s2"), col("m.s3"))))
      .withColumn("b2", md5(concat(col("m.s4"), col("m.s5"))))
      .withColumn("b3", md5(concat(col("m.s6"), col("m.s7"))))
      .selectExpr("doc_id",
        "stack(4, 0, b0, 1, b1, 2, b2, 3, b3) AS (band_idx, bucket)")
      .withColumn("bpfx", substring(col("bucket"), 1, 2))
  }

  /** Verify side-table rows of a (doc_id, text) relation. */
  private def sigRel(d: DataFrame): DataFrame = {
    graft.plans.TextExprs.register(d.sparkSession)
    d.filter(col("text").isNotNull)
      .select(col("doc_id"), lower(col("text")).as("lt"),
        expr("graft_minhash(lower(text)).n_sh").as("n_sh"))
      .withColumn("dbucket", pmod(col("doc_id"), lit(nDocBuckets)))
  }

  private def readOrEmpty(spark: SparkSession, dir: String,
      schema: StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(schema).parquet(dir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Durably materialize `df` into `stagingDir`, then dynamic-overwrite
    * `destDir`'s touched partitions FROM THE STAGING FILES. The
    * gcTombstones/compactParquet verify-then-swap discipline applied to
    * a partitioned sink (ADVICE r5): a persist+count before overwriting
    * the very partitions the plan read is NOT crash-safe — an executor
    * loss mid-write drops cached blocks and the recompute reads
    * already-deleted files. The staging write is an ACTION against
    * untouched inputs; the overwrite's lineage then roots in the staging
    * files, never in the partitions being replaced. Costs one extra
    * write+read of the touched volume (bounded by the batch's hash
    * spread, not the corpus).
    */
  private def stageAndOverwrite(spark: SparkSession, df: DataFrame,
      schema: StructType, stagingDir: String, destDir: String,
      partCols: Seq[String]): Unit = {
    val p = new org.apache.hadoop.fs.Path(stagingDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    df.write.mode("overwrite").parquet(stagingDir)
    spark.read.schema(schema).parquet(stagingDir)
      .write.partitionBy(partCols: _*)
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(destDir)
    fs.delete(p, true)
  }

  /** Check one micro-batch against the index, emit verified pairs to
    * `outDir/batch_id=<id>/`, and fold the batch into the index.
    * Exposed for the spec; `start` wires it into foreachBatch.
    *
    * Crash-consistency: emissions land first (batchId-keyed overwrite),
    * then the buckets fold, then the docs fold — each fold via
    * [[stageAndOverwrite]]. A crash between any two steps leaves the
    * index halves momentarily inconsistent, and the RETRY heals it:
    * foreachBatch re-delivers the uncommitted batch, every step is a
    * merge-dedup or keyed overwrite, so re-applying converges to the
    * identical state (the idempotence the spec pins).
    */
  def applyBatch(spark: SparkSession, stateDir: String, outDir: String,
      batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return
    val bucketsDir = s"$stateDir/buckets"
    val docsDir = s"$stateDir/docs"
    // distinct() everywhere batch rows enter state: a re-delivered
    // batch must merge to the identical index
    val b = bandRel(batch).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dNew = sigRel(batch).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // touched partition sets are bounded: ≤ 4 × batch docs and ≤ the
      // fixed 4 × 256 (bpfx) / 16 (dbucket) domains — fixed-size driver
      // lists, not data-sized collects
      val touchedPfx = b.select(col("band_idx"), col("bpfx")).distinct()
        .collect().map(r => (r.getInt(0), r.getString(1)))
      val touchedDb = dNew.select(col("dbucket")).distinct()
        .collect().map(_.getLong(0)).toSeq
      // prune on the EXACT touched (band_idx, bpfx) pairs — an
      // isin × isin filter is their cross product, and since all 4
      // band_idx values are present in almost every batch it reads (and
      // then rewrites, byte-identical) up to ~4× more partitions than
      // the docs actually hash into (ADVICE r5)
      val pairKeys = touchedPfx.map { case (bi, px) => s"$bi/$px" }.toSeq
      val oldBuckets = readOrEmpty(spark, bucketsDir, bucketsSchema)
        .filter(concat_ws("/", col("band_idx"), col("bpfx"))
          .isin(pairKeys: _*))
      // candidates: a new doc against anything already indexed in its
      // buckets, plus within-batch collisions; lower id = kept rep
      val known = oldBuckets.select(col("band_idx"), col("bucket"),
        col("doc_id")).unionByName(
        b.select(col("band_idx"), col("bucket"), col("doc_id")))
      val cand = b.as("x").join(known.as("y"),
          col("x.band_idx") === col("y.band_idx") &&
            col("x.bucket") === col("y.bucket") &&
            col("y.doc_id") < col("x.doc_id"))
        .select(col("x.doc_id").as("new_id"), col("y.doc_id").as("dup_id"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // verify with true Jaccard before emitting (candidate-only
        // work). The new side's text lives in the BATCH (dNew); the dup
        // side's read of the docs side-table is CANDIDATE-BOUNDED —
        // directory-pruned to the candidates' doc buckets, then
        // semi-joined to the candidate id set — so per-batch verify
        // work scales with candidates, never with corpus size
        // (ADVICE r5: an unpruned read grew with the corpus).
        val dupIds = cand.select(col("dup_id")).distinct()
        val dupDb = dupIds
          .select(pmod(col("dup_id"), lit(nDocBuckets)).as("dbucket"))
          .distinct().collect().map(_.getLong(0)).toSeq // ≤ 16, fixed
        val dupDocs = readOrEmpty(spark, docsDir, docsSchema)
          .filter(col("dbucket").isin(dupDb: _*))
          .join(broadcast(dupIds), col("doc_id") === col("dup_id"),
            "left_semi")
          .select(col("doc_id"), col("lt"), col("n_sh"))
          .unionByName(dNew.select(col("doc_id"), col("lt"), col("n_sh")))
        val flagged = cand
          .join(dNew.select(col("doc_id").as("new_id"),
            col("lt").as("la"), col("n_sh").as("na")), Seq("new_id"))
          .join(dupDocs.select(col("doc_id").as("dup_id"),
            col("lt").as("lb"), col("n_sh").as("nb")), Seq("dup_id"))
          .withColumn("shared", expr("graft_shingle_overlap(la, lb)"))
          .withColumn("jaccard", col("shared").cast("double") /
            (col("na") + col("nb") - col("shared")).cast("double"))
          .filter(col("jaccard") >= jaccardFloor)
          .select(col("new_id"), col("dup_id"), col("jaccard"))
        // batchId-keyed dynamic overwrite: a retried batch REPLACES its
        // own emission partition (idempotent), never appends a duplicate
        flagged.withColumn("batch_id", lit(batchId))
          .write.partitionBy("batch_id")
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite").parquet(outDir)
      } finally cand.unpersist()
      // fold the batch into the index: merge-dedup ONLY the touched
      // partitions, via the crash-safe staging protocol
      stageAndOverwrite(spark,
        oldBuckets
          .unionByName(b.select(bucketsSchema.fieldNames.map(col).toSeq: _*))
          .distinct(),
        bucketsSchema, s"$stateDir/buckets_batch_staging", bucketsDir,
        Seq("band_idx", "bpfx"))
      val oldDocs = readOrEmpty(spark, docsDir, docsSchema)
        .filter(col("dbucket").isin(touchedDb: _*))
      stageAndOverwrite(spark,
        oldDocs
          .unionByName(dNew.select(docsSchema.fieldNames.map(col).toSeq: _*))
          .distinct(),
        docsSchema, s"$stateDir/docs_batch_staging", docsDir,
        Seq("dbucket"))
    } finally { b.unpersist(); dNew.unpersist() }
    ()
  }

  /** Maintenance pass closing the loop between the accreting state
    * sinks and LoadOps.compactParquet: every micro-batch dynamic-
    * overwrites only the partitions it touches, so UNTOUCHED partitions
    * keep their historical small files and file count — not data size —
    * starts to drive scan task count and listing pressure. Each
    * partition directory is itself a flat parquet dataset, so the
    * verify-then-swap compactor applies per partition; only partitions
    * above `minFiles` are rewritten (touched-partition work only, the
    * same bounded-work discipline as the batches). Returns
    * (partitionsCompacted, filesBefore, filesAfter).
    *
    * Run it OUTSIDE the foreachBatch (between stream runs, like any
    * table-maintenance job): compaction is layout-only and the swap is
    * crash-safe, but rewriting partitions mid-batch would race the
    * batch's own dynamic overwrite.
    */
  def compactState(spark: SparkSession, stateDir: String,
      targetFileBytes: Long, minFiles: Int = 2): (Int, Int, Int) = {
    val conf = spark.sparkContext.hadoopConfiguration
    var parts = 0; var before = 0; var after = 0
    for (sub <- Seq("buckets", "docs")) {
      val root = new org.apache.hadoop.fs.Path(s"$stateDir/$sub")
      val fs = root.getFileSystem(conf)
      if (fs.exists(root)) {
        // partition dirs at any nesting depth (band_idx=i/bpfx=xx, or
        // dbucket=n) — a leaf is a dir containing part- files
        def leaves(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
          val st = fs.listStatus(p).toSeq
          val dirs = st.filter(_.isDirectory)
          if (dirs.isEmpty) Seq(p) else dirs.flatMap(d => leaves(d.getPath))
        }
        for (leaf <- leaves(root) if leaf != root) {
          val n = fs.listStatus(leaf).count(s => s.isFile &&
            s.getPath.getName.startsWith("part-"))
          if (n >= minFiles) {
            val (b, a) = graft.operators.LoadOps
              .compactParquet(spark, leaf.toString, targetFileBytes)
            parts += 1; before += b; after += a
          }
        }
      }
    }
    (parts, before, after)
  }

  /** The KEEP/DROP policy view a training-data writer consumes: one
    * row per INDEXED document with its verdict — `drop` iff the doc was
    * flagged as a near-dup of an earlier (lower-id or earlier-arriving)
    * document, plus the kept representative it duplicates. Derived
    * entirely from the index and the emission log, so it can be read at
    * any point in the stream's life.
    *
    * `kept_id` is resolved TRANSITIVELY to a document whose own verdict
    * is `keep` (ADVICE r5): a doc flagged only against a mid-chain
    * near-dup would otherwise point at a partner that is itself
    * dropped, and a writer dereferencing `kept_id` as "the retained
    * representative" would read a discarded doc. Every flagged pair has
    * dup_id < new_id, so the min-partner mapping is strictly
    * id-decreasing and its fixpoint is a doc with no flagged row — a
    * keep. Pointer jumping (kept ← kept's own kept, where present)
    * reaches the fixpoint in O(log chain-depth) rounds; each round is
    * one self-join of the SMALL flagged relation (dropped docs only,
    * never the corpus), materialized per round so plan depth stays
    * constant.
    */
  def keepDecisions(spark: SparkSession, stateDir: String,
      outDir: String): DataFrame = {
    val docs = readOrEmpty(spark, s"$stateDir/docs", docsSchema)
      .select(col("doc_id"))
    val outSchema = StructType(Seq(
      StructField("new_id", LongType),
      StructField("dup_id", LongType),
      StructField("jaccard", DoubleType),
      StructField("batch_id", LongType)))
    // one candidate verdict per dropped doc: the smallest flagged
    // partner (deterministic under ties), then chain-resolved below
    var cur = readOrEmpty(spark, outDir, outSchema)
      .groupBy(col("new_id").as("doc_id"))
      .agg(min(col("dup_id")).as("kept_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cur.count()
    var done = false
    while (!done) {
      val jumped = cur.as("a")
        .join(cur.select(col("doc_id").as("kept_id"),
          col("kept_id").as("jump")).as("b"), Seq("kept_id"), "left")
        .select(col("doc_id"),
          coalesce(col("jump"), col("kept_id")).as("kept_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      jumped.count()
      // converged when no kept_id is itself a dropped doc
      done = jumped.as("a")
        .join(jumped.select(col("doc_id")).as("b"),
          col("a.kept_id") === col("b.doc_id"), "left_semi")
        .isEmpty
      cur.unpersist()
      cur = jumped
    }
    docs.join(cur, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("kept_id").isNull, lit("keep")).otherwise(lit("drop"))
          .as("verdict"),
        col("kept_id"))
  }

  /** File-source streaming runner: watch `sourceDir` for document
    * parquet and run each micro-batch through the ingestion gate.
    */
  def start(spark: SparkSession, sourceDir: String, stateDir: String,
      outDir: String, checkpointDir: String): StreamingQuery = {
    spark.readStream
      .schema(docSchema)
      .parquet(sourceDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatch(spark, stateDir, outDir, batch, id)
      }
      .start()
  }
}
