package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Incremental RETRIEVAL INDEX maintenance: the streaming face of the
  * BM25 retrieval pipeline (operators.CorpusOps.bm25TopkOn, whose
  * batch indexing half is inverted_index). Documents arrive in
  * micro-batches; each batch APPENDS its postings to an
  * incrementally-maintained inverted index without ever re-scanning or
  * re-folding the accumulated corpus, and [[queryTopK]] answers ranked
  * BM25 retrieval over everything indexed so far — with scores
  * BIT-IDENTICAL to the batch face run fresh over the same corpus
  * (the scoring expression, tokenizer, term-selection rule, and k are
  * shared `private[graft]` definitions in CorpusOps, not parallel
  * copies). This is the corpus-search half a training-data pipeline
  * keeps warm beside the dedup gates: eval-set decontamination audits
  * ("which training docs does this eval item retrieve") and
  * membership/attribution queries run against the live index as the
  * crawl lands, not against a nightly rebuild.
  *
  * State layout follows the LSM contracts shared by the dedup gates
  * ([[LsmIndex]]): per-micro-batch `ingest=<batchId>` generations
  * (O(batch) writes, no state reads on the write path; a retried batch
  * dynamic-overwrites exactly its own generation — idempotent),
  * `_LAYOUT` fail-fast versioning with [[migrateState]] as the
  * supported cross-layout path, and maintenance compaction bounding
  * read amplification to ≤ G generations per touched partition dir.
  *
  *  - `postings/` — (term, doc_id, tf), partitioned by (tpfx, ingest)
  *    where tpfx = first hex byte of md5(term) (256 fixed hash
  *    partitions), files sorted by term so parquet row-group stats
  *    serve the query read's term IN pushdown. The posting-list fetch
  *    for a query batch is directory-pruned to the terms' tpfx dirs
  *    and row-group-pruned by the term predicate — read volume tracks
  *    the SELECTED posting lists (Σ df over the df-rarest query
  *    terms, the WAND-style static pruning of the batch face), not
  *    the index.
  *  - `docs/` — (doc_id, lt, dl) the doc-stats + raw-text side table
  *    (dl = document length for the BM25 saturation term; lt = the
  *    lowered text, this gate's layout-stable RAW column: a tokenizer
  *    or layout revision rebuilds postings from `docs.lt` as one batch
  *    job instead of re-ingesting the corpus), partitioned by
  *    (dbucket = pmod(doc_id, 256), ingest), files sorted by doc_id.
  *    The dl fetch is candidate-bounded: dbucket directory pruning
  *    plus a doc_id IN predicate when the candidate set collects
  *    under the cap, with a distributed semi-join fallback above it —
  *    the verify-read contract of the dedup gates.
  *  - `ncount/` — per-generation (n_docs, tot_dl) markers
  *    ([[LsmIndex.Markers]]): BM25's corpus constants are
  *    O(generations) driver-side file reads, never an index scan, so
  *    query cost is independent of corpus size for fixed result
  *    volume.
  *
  * Ingest contract: each document is indexed ONCE (the upstream dedup
  * gates guarantee that in the composed pipeline — see
  * streaming.CurationStream); re-delivery of a whole batch is
  * idempotent (generation + marker overwrite), and read-side
  * distinct()s keep results correct if a compaction merged an
  * uncommitted batch's generation before its retry (the duplicate
  * bytes persist until the next compaction, the same tolerance as the
  * dedup gates — the markers then overcount that batch, which shifts
  * idf slightly until reconciled by a migration rebuild; bounded, and
  * only on the crash-during-maintenance path).
  */
object IndexStream {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("source", StringType)))

  /** Stored layouts: data columns + hash partition dirs + the ingest
    * generation dir.
    */
  private val postingsSchema: StructType = StructType(Seq(
    StructField("term", StringType),
    StructField("doc_id", LongType),
    StructField("tf", LongType),
    StructField("tpfx", StringType),
    StructField("ingest", LongType)))

  private val docsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lt", StringType),
    StructField("dl", LongType),
    StructField("dbucket", LongType),
    StructField("ingest", LongType)))

  private val subTables = Seq(
    LsmIndex.Sub("postings", postingsSchema, Seq("tpfx"),
      sortCols = Seq("term")),
    LsmIndex.Sub("docs", docsSchema, Seq("dbucket"),
      sortCols = Seq("doc_id")))

  private[graft] val layoutVersion =
    "graft-ridx-v1 postings=(tpfx=md5hex2(term),ingest):256 sort=term " +
      "docs=(dbucket=pmod256,ingest) sort=doc_id tok=lower-ws " +
      "ncount=(n_docs,tot_dl)"

  private val nDocBuckets = 256

  /** Largest term set a query batch pushes down as a term IN (...)
    * parquet predicate (queries are the small side by contract); above
    * it the posting fetch falls back to a tpfx-dir-pruned scan plus a
    * distributed semi-join, which stays correct at any query volume.
    * Same discipline for the candidate doc_id set on the dl fetch.
    */
  private val pushdownMax = 65536

  val defaultMaxGenerations: Int = NearDupStream.defaultMaxGenerations

  private def markers(stateDir: String) = LsmIndex.Markers(stateDir)

  private[streaming] def ensureLayout(spark: SparkSession,
      stateDir: String): Unit = {
    LsmIndex.ensureLayout(spark, stateDir, layoutVersion,
      subTables.map(_.name))
    markers(stateDir).recover(spark)
  }

  def maxGenerations(spark: SparkSession, stateDir: String): Int =
    LsmIndex.maxGenerations(spark, stateDir, subTables.map(_.name))

  def compactionDue(spark: SparkSession, stateDir: String,
      maxGen: Int = defaultMaxGenerations): Boolean =
    maxGenerations(spark, stateDir) >= maxGen

  def compactIfDue(spark: SparkSession, stateDir: String,
      targetFileBytes: Long,
      maxGen: Int = defaultMaxGenerations): Boolean = {
    val due = compactionDue(spark, stateDir, maxGen)
    if (due) compactState(spark, stateDir, targetFileBytes)
    due
  }

  def compactState(spark: SparkSession, stateDir: String,
      targetFileBytes: Long, minFiles: Int = 2): (Int, Int, Int) = {
    ensureLayout(spark, stateDir)
    val r = LsmIndex.compact(spark, stateDir, subTables, targetFileBytes,
      minFiles)
    markers(stateDir).consolidate(spark)
    r
  }

  /** The md5-hex-prefix partition key of a term, computed driver-side
    * for directory shortlists — MUST match Spark's md5() (lowercase
    * hex over UTF-8 bytes), pinned by spec.
    */
  private[graft] def tpfxOf(term: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(term.getBytes("UTF-8"))
    f"${d(0) & 0xff}%02x"
  }

  /** The per-batch posting rows (term, doc_id, tf, tpfx) of a
    * (doc_id, text) relation, via the SHARED tokenizer.
    */
  private def tfRel(d: DataFrame): DataFrame =
    d.filter(col("text").isNotNull)
      .select(col("doc_id"),
        explode(graft.operators.CorpusOps.bm25Tokens(col("text")))
          .as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("tpfx", substring(md5(col("term")), 1, 2))

  /** The per-batch doc-stats rows (doc_id, lt, dl, dbucket); dl from
    * the posting rows so the two sub-tables can never disagree.
    */
  private def docsRel(d: DataFrame, tf: DataFrame): DataFrame =
    tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      .join(d.filter(col("text").isNotNull)
        .select(col("doc_id"), lower(col("text")).as("lt")).distinct(),
        Seq("doc_id"))
      .withColumn("dbucket", pmod(col("doc_id"), lit(nDocBuckets)))
      .select(col("doc_id"), col("lt"), col("dl"), col("dbucket"))

  /** Fold one micro-batch of documents into the index. O(batch): the
    * write path never reads accumulated state; corpus constants ride
    * the count markers.
    */
  def applyBatch(spark: SparkSession, stateDir: String, batch: DataFrame,
      batchId: Long): Unit = {
    if (batch.isEmpty) return
    ensureLayout(spark, stateDir)
    val b = batch.select(col("doc_id"), col("text")).distinct()
    val tf = tfRel(b)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val docs = docsRel(b, tf)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val stats = docs.agg(count(lit(1)).as("n"),
          coalesce(sum(col("dl")), lit(0L)).as("t")).collect()(0)
        // repartition on the dir key before the partitioned write so a
        // generation lands as ONE file per touched dir, not one per
        // (task, dir) — without it a w-task batch writes up to w× the
        // files, and the LSM read amplification bound (≤ G generations
        // per dir) silently becomes ≤ G·w files per dir
        tf.withColumn("ingest", lit(batchId))
          .repartition(spark.sparkContext.defaultParallelism,
            col("tpfx"))
          .sortWithinPartitions(col("tpfx"), col("term"))
          .write.partitionBy("tpfx", "ingest")
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite").parquet(s"$stateDir/postings")
        docs.withColumn("ingest", lit(batchId))
          .repartition(spark.sparkContext.defaultParallelism,
            col("dbucket"))
          .sortWithinPartitions(col("dbucket"), col("doc_id"))
          .write.partitionBy("dbucket", "ingest")
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite").parquet(s"$stateDir/docs")
        markers(stateDir).write(spark, batchId,
          Seq(stats.getLong(0), stats.getLong(1)))
        // a re-delivered batch REPLACES its generation's part files;
        // drop any cached file listing of the sub-tables so a
        // same-session read after the overwrite can't chase deleted
        // files (the session-shared FileStatusCache has no TTL)
        spark.catalog.refreshByPath(s"$stateDir/postings")
        spark.catalog.refreshByPath(s"$stateDir/docs")
      } finally docs.unpersist()
    } finally tf.unpersist()
    ()
  }

  /** Ranked BM25 retrieval over the accumulated index: for each query
    * (query_id, text), the top-k indexed documents under the batch
    * face's exact scoring — (query_id, rank, doc_id, score_micro,
    * n_terms), bit-identical to CorpusOps.bm25TopkOn over the same
    * corpus.
    *
    * Read shape: posting fetch pruned to the query terms' tpfx dirs +
    * term IN row-group pushdown (semi-join fallback above the cap);
    * per-term df computed FROM that pruned read (exact — a term's
    * postings are wholly inside its tpfx dirs); dl fetch
    * candidate-bounded on the docs sub-table. No read touches state
    * outside the query's reach, and the corpus constants come from the
    * markers — O(generations) driver file reads.
    */
  def queryTopK(spark: SparkSession, stateDir: String,
      queries: DataFrame): DataFrame = {
    ensureLayout(spark, stateDir)
    val st = markers(stateDir).stored(spark)
    val nDocs = if (st.nonEmpty) st.head else 0L
    val totDl = if (st.size > 1) st(1) else 0L
    // cache lifecycle is CALLER-OWNED (the Verify/Bench convention —
    // clearCache() between queries): q feeds the sample collect AND
    // the selection join; post feeds df AND the posting fetch; hits
    // feeds the candidate-id collect AND the scoring join. The
    // returned DataFrame is the LIVE retrieval plan (inspectable by
    // PlanHygieneSpec), not a checkpointed copy.
    val q = queries.filter(col("text").isNotNull)
      .select(col("query_id"),
        explode(array_distinct(
          graft.operators.CorpusOps.bm25Tokens(col("text")))).as("term"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val termSample = q.select(col("term")).distinct()
      .limit(pushdownMax + 1).collect().map(_.getString(0))
    val base = LsmIndex.readOrEmpty(spark, s"$stateDir/postings",
      postingsSchema)
    val pruned =
      if (termSample.length <= pushdownMax) {
        val pfx = termSample.map(tpfxOf).distinct.toSeq
        base.filter(col("tpfx").isin(pfx: _*) &&
          col("term").isin(termSample.toSeq: _*))
      } else {
        val pfx = q.select(substring(md5(col("term")), 1, 2).as("tpfx"))
          .distinct().collect().map(_.getString(0)).toSeq // ≤ 256, fixed
        base.filter(col("tpfx").isin(pfx: _*))
          .join(q.select(col("term")).distinct(), Seq("term"),
            "left_semi")
      }
    // distinct: a batch re-delivered after compaction merged its
    // generation may have left duplicate posting rows
    val post = pruned.select(col("term"), col("doc_id"), col("tf"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfT = post.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("df").asc, col("term").asc)
    val selected = q.join(dfT, Seq("term"))
      .withColumn("trank", row_number().over(wq))
      .filter(col("trank") <= graft.operators.CorpusOps.bm25QueryTerms)
      .select(col("term"), col("query_id"), col("df"))
    val hits = selected.join(post, Seq("term"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val candIds = hits.select(col("doc_id")).distinct()
    val idSample = candIds.limit(pushdownMax + 1)
      .collect().map(_.getLong(0))
    val docsBase = LsmIndex.readOrEmpty(spark, s"$stateDir/docs",
      docsSchema)
    val dlSide =
      if (idSample.length <= pushdownMax) {
        val dbs = idSample
          .map(i => Math.floorMod(i, nDocBuckets.toLong))
          .distinct.toSeq
        docsBase.filter(col("dbucket").isin(dbs: _*) &&
          col("doc_id").isin(idSample.toSeq: _*))
      } else {
        val dbs = candIds
          .select(pmod(col("doc_id"), lit(nDocBuckets)).as("dbucket"))
          .distinct().collect().map(_.getLong(0)).toSeq // ≤ 256
        docsBase.filter(col("dbucket").isin(dbs: _*))
          .join(candIds, Seq("doc_id"), "left_semi")
      }
    val dl = dlSide.select(col("doc_id"), col("dl")).distinct()
    // co-partition the posting hits with the dl fetch on doc_id (the
    // batch face's scale-shape exchange; locally it also keeps the
    // 128-bit scoring out of a coalesced single-partition tail)
    val scoredTerms = hits.repartition(col("doc_id")).join(dl, Seq("doc_id"))
      .withColumn("n_docs", lit(nDocs))
      .withColumn("totdl", lit(totDl))
      .withColumn("term_micro",
        expr(graft.operators.CorpusOps.bm25TermMicroExpr))
    val wd = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col("doc_id").asc)
    scoredTerms.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("term_micro")).as("score_micro"),
        count(lit(1)).as("n_terms"))
      .withColumn("rank", row_number().over(wd))
      .filter(col("rank") <= graft.operators.CorpusOps.bm25K)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("score_micro"), col("n_terms"))
  }

  /** LAYOUT MIGRATION: rebuild the DERIVED state — `postings`, the dl
    * column, and the count markers — from the layout-stable raw column
    * `docs.lt` (the lowered text survives every layout revision), and
    * stamp the current [[layoutVersion]]. One batch job over the
    * index; never a re-ingestion of the corpus. The transactional
    * shell (staging, verify, swap, crash recovery) is
    * [[LsmIndex.migrate]]'s.
    */
  def migrateState(spark: SparkSession, stateDir: String): Boolean =
    LsmIndex.migrate(spark, stateDir, layoutVersion) { (oldRoot, staging) =>
      val fs = new org.apache.hadoop.fs.Path(oldRoot)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val docsPath = new org.apache.hadoop.fs.Path(s"$oldRoot/docs")
      if (fs.exists(docsPath)) {
        // tolerant read: NO forced schema — old layouts may partition
        // differently or carry extra columns; only the raw data
        // columns are contracted
        val raw = spark.read.parquet(docsPath.toString)
          .select(col("doc_id"), col("lt")).distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val n = raw.count()
          // lt is already lowered; the shared tokenizer's lower() is
          // idempotent, so re-tokenizing lt equals tokenizing the
          // original text
          val asBatch = raw.select(col("doc_id"), col("lt").as("text"))
          val tf = tfRel(asBatch)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            val docs = docsRel(asBatch, tf)
            tf.withColumn("ingest", lit(-1L))
              .sortWithinPartitions(col("tpfx"), col("term"))
              .write.partitionBy("tpfx", "ingest")
              .parquet(s"$staging/postings")
            docs.withColumn("ingest", lit(-1L))
              .sortWithinPartitions(col("dbucket"), col("doc_id"))
              .write.partitionBy("dbucket", "ingest")
              .parquet(s"$staging/docs")
            val staged = spark.read.schema(docsSchema)
              .parquet(s"$staging/docs")
            val got = staged.select(col("doc_id")).distinct().count()
            require(got == n,
              s"migration staging lost documents ($got != $n) for " +
                s"$oldRoot; original untouched")
            val totDl = staged.agg(
              coalesce(sum(col("dl")), lit(0L))).collect()(0).getLong(0)
            LsmIndex.Markers(staging).write(spark, -1L, Seq(n, totDl))
          } finally tf.unpersist()
        } finally raw.unpersist()
      }
    }

  /** File-source streaming runner: watch `sourceDir` for document
    * parquet and fold each micro-batch into the index.
    */
  def start(spark: SparkSession, sourceDir: String, stateDir: String,
      checkpointDir: String): StreamingQuery = {
    spark.readStream
      .schema(docSchema)
      .parquet(sourceDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatch(spark, stateDir, batch, id)
      }
      .start()
  }
}
