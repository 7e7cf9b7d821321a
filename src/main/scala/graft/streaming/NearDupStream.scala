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

  /** Check one micro-batch against the index, emit verified pairs to
    * `outDir/batch_id=<id>/`, and fold the batch into the index.
    * Exposed for the spec; `start` wires it into foreachBatch.
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
      val oldBuckets = readOrEmpty(spark, bucketsDir, bucketsSchema)
        .filter(col("band_idx").isin(touchedPfx.map(_._1).distinct: _*) &&
          col("bpfx").isin(touchedPfx.map(_._2).distinct: _*))
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
      // verify with true Jaccard before emitting (candidate-only work);
      // the dup side's text comes from the docs side-table — the corpus
      // itself is never re-read
      val allDocs = readOrEmpty(spark, docsDir, docsSchema)
        .select(col("doc_id"), col("lt"), col("n_sh"))
        .unionByName(dNew.select(col("doc_id"), col("lt"), col("n_sh")))
      val flagged = cand
        .join(allDocs.select(col("doc_id").as("new_id"),
          col("lt").as("la"), col("n_sh").as("na")), Seq("new_id"))
        .join(allDocs.select(col("doc_id").as("dup_id"),
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
      // fold the batch into the index: merge-dedup ONLY the touched
      // partitions, materialized before the overwrite (the CdcStream
      // read-then-replace discipline)
      val mergedBuckets = oldBuckets
        .unionByName(b.select(bucketsSchema.fieldNames.map(col).toSeq: _*))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        mergedBuckets.count()
        mergedBuckets.write.partitionBy("band_idx", "bpfx")
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite").parquet(bucketsDir)
      } finally mergedBuckets.unpersist()
      val oldDocs = readOrEmpty(spark, docsDir, docsSchema)
        .filter(col("dbucket").isin(touchedDb: _*))
      val mergedDocs = oldDocs
        .unionByName(dNew.select(docsSchema.fieldNames.map(col).toSeq: _*))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        mergedDocs.count()
        mergedDocs.write.partitionBy("dbucket")
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite").parquet(docsDir)
      } finally mergedDocs.unpersist()
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
    * any point in the stream's life; keep-lowest-id greedy semantics,
    * the same chain rule as the batch dedup family (a doc that
    * duplicates a dropped doc still points at ITS representative — the
    * flagged pair always names the earlier doc).
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
    val flagged = readOrEmpty(spark, outDir, outSchema)
      // one verdict per dropped doc: the smallest representative
      // (deterministic under ties on multiple flagged partners)
      .groupBy(col("new_id").as("doc_id"))
      .agg(min(col("dup_id")).as("kept_id"))
    docs.join(flagged, Seq("doc_id"), "left")
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
