package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** THE COMPOSED INGESTION PIPELINE: crawl firehose → both near-dup
  * gates → retrieval index of the KEPT corpus, as one stream. Each
  * micro-batch of (doc_id, text, embedding, source) rows runs through
  * the text gate (shingle/Jaccard) and the vector gate
  * (prefix-maskable LSH/cosine) via [[CurationStream]], and the docs
  * NOT flagged by either gate — the batch's keep set — fold into the
  * incremental BM25 index ([[IndexStream]]). The result a
  * training-data pipeline actually operates: at any point in the
  * stream's life, `verdicts` says what was kept and why, and
  * `queryTopK` searches exactly the deduplicated corpus (a dropped
  * doc's vocabulary never pollutes df/N, and retrieval can never
  * surface a document curation rejected).
  *
  * The composition is sound because KEEP-AT-INGEST IS FINAL: both
  * gates emit only (dup_id < new_id) pairs and a doc appears as
  * `new_id` only in its own batch (ids increase with arrival order —
  * the gates' stated contract), so a doc kept when its batch landed
  * can never be flagged by a later batch. The keep set is therefore
  * exact at fold time — no retraction path is needed, and the index
  * never holds a doc whose verdict could flip. Since round 10 that
  * premise is ENFORCED, not assumed: both gates keep a max-id
  * high-water marker ([[LsmIndex.HiWater]]) and fail fast when a
  * genuinely-new batch carries an id at or below it — a source that
  * violates arrival-ordered ids gets a clear error instead of a
  * silently-stale index.
  *
  * Crash/idempotence: every stage is keyed-overwrite idempotent (the
  * gates' generation + emission overwrites, the index's generation +
  * marker overwrites), and the drop set is recomputed from the batch's
  * own freshly-overwritten emission partitions — so a retry after a
  * crash anywhere between the stages converges all three states.
  */
object PipelineStream {

  val rowSchema: StructType = CurationStream.rowSchema

  /** Source schema for a FIELDED corpus (round 13): the `title`
    * column rides through [[applyBatch]] to the index gate's v7 fold
    * — pass to [[start]] as `sourceSchema`.
    */
  val titledRowSchema: StructType = StructType(
    rowSchema.fields.toSeq :+
      org.apache.spark.sql.types.StructField("title",
        org.apache.spark.sql.types.StringType))

  private def ridxState(root: String) = s"$root/ridx_state"

  /** One micro-batch through the gates, then the keep set into the
    * retrieval index.
    */
  def applyBatch(spark: SparkSession, rootDir: String, batch: DataFrame,
      batchId: Long): Unit = {
    if (batch.isEmpty) return
    CurationStream.applyBatch(spark, rootDir, batch, batchId)
    // this batch's drop set: read ONLY the batch's own emission
    // partitions (batch_id dir pruning — an O(batch) read)
    val dropped = LsmIndex.readOrEmpty(spark, s"$rootDir/txt_out",
        CurationStream.txtOutSchema)
      .filter(col("batch_id") === batchId).select(col("new_id"))
      .unionByName(LsmIndex.readOrEmpty(spark, s"$rootDir/vec_out",
          CurationStream.vecOutSchema)
        .filter(col("batch_id") === batchId).select(col("new_id")))
      .select(col("new_id").as("doc_id")).distinct()
    // a fielded corpus (round 13): the title column rides through to
    // the index gate, whose v7 fold stores the field boundary — the
    // dedup gates themselves judge `text` alone (titles are short and
    // duplicative by nature; fielding them would only add noise to
    // the shingle/vector verdicts)
    val keptCols = Seq(col("doc_id"), col("text"), col("source")) ++
      (if (batch.columns.contains("title")) Seq(col("title")) else Nil)
    val kept = batch.select(keptCols: _*)
      .join(dropped, Seq("doc_id"), "left_anti")
    IndexStream.applyBatch(spark, ridxState(rootDir), kept, batchId)
  }

  /** Ranked BM25 retrieval over the kept corpus. */
  def queryTopK(spark: SparkSession, rootDir: String,
      queries: DataFrame): DataFrame =
    IndexStream.queryTopK(spark, ridxState(rootDir), queries)

  /** Exact full-query BM25 over the kept corpus — the MaxScore face
    * ([[IndexStream.queryTopKAll]]) served from the pipeline's index;
    * same keep-at-ingest contract as [[queryTopK]].
    */
  def queryTopKAll(spark: SparkSession, rootDir: String,
      queries: DataFrame): DataFrame =
    IndexStream.queryTopKAll(spark, ridxState(rootDir), queries)

  /** Exact-phrase retrieval over the kept corpus (round 10): the
    * pipeline's BM25 index holds EXACTLY the keep set (dropped docs
    * never fold in, and keep-at-ingest finality — enforced by the
    * HiWater markers — means nothing indexed is ever retracted), so
    * the positional face needs no drop-set exclusion at query time: a
    * curation-rejected document's phrases are unsearchable by
    * construction.
    */
  def queryPhrase(spark: SparkSession, rootDir: String,
      queries: DataFrame): DataFrame =
    IndexStream.queryPhrase(spark, ridxState(rootDir), queries)

  /** Boolean (MUST / MUST NOT) retrieval over the kept corpus — the
    * round-11-late face served from the pipeline's index; same
    * keep-at-ingest contract as [[queryTopK]].
    */
  def queryBool(spark: SparkSession, rootDir: String,
      queries: DataFrame): DataFrame =
    IndexStream.queryBool(spark, ridxState(rootDir), queries)

  /** Prefix (multi-term expansion) retrieval over the kept corpus —
    * expansion runs on the kept index's vocabulary, so a dropped doc's
    * unique completions are unexpandable by construction.
    */
  def queryPrefix(spark: SparkSession, rootDir: String,
      queries: DataFrame,
      len: Int = graft.operators.CorpusOps.prefixLen,
      max: Int = graft.operators.CorpusOps.prefixExpandMax): DataFrame =
    IndexStream.queryPrefix(spark, ridxState(rootDir), queries, len, max)

  /** Fielded (simple BM25F) retrieval over the kept corpus. */
  def queryFielded(spark: SparkSession, rootDir: String,
      queries: DataFrame): DataFrame =
    IndexStream.queryFielded(spark, ridxState(rootDir), queries)

  /** The full (query_id, doc_id) match set over the kept corpus — the
    * id half of faceted search (CorpusOps.facetRollup joins the
    * attribute table).
    */
  def queryMatches(spark: SparkSession, rootDir: String,
      queries: DataFrame): DataFrame =
    IndexStream.queryMatches(spark, ridxState(rootDir), queries)

  /** STREAMING HYBRID RETRIEVAL (round 9): reciprocal-rank fusion of
    * the sparse leg (the kept-corpus BM25 index) and the dense leg
    * (the vector gate's own LSM LSH index, with the curation drop set
    * excluded BEFORE ranking) — the whole retrieval stack served from
    * the pipeline's accumulated state, no batch-side corpus scan
    * anywhere. Fusion arithmetic is the batch face's exact shared
    * definition (CorpusOps.rrfFuse), so a streaming hybrid and the
    * batch hybrid rank identically given identical legs.
    *
    * Queries carry (query_id, text, embedding). The dense exclude set
    * is an O(flagged) read of the emission logs — the drop set is
    * precisely the new_ids ever flagged (keep-at-ingest is final).
    */
  def hybridTopK(spark: SparkSession, rootDir: String,
      queries0: DataFrame): DataFrame = {
    // both legs project from the same query relation (the composed
    // faces pass a documents ⋈ embeddings join) — persist it once so
    // the corpus join is scanned once, not per leg (round 15; cache
    // lifecycle stays caller-owned like every face)
    val queries =
      if (queries0.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        queries0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else queries0
    val sparse = IndexStream.queryTopK(spark, ridxState(rootDir),
        queries.select(col("query_id"), col("text")))
      .select(col("query_id"), col("doc_id"),
        col("rank").as("rank_sparse"))
    val dropped = CurationStream.pairLog(spark, rootDir)
      .select(col("new_id").as("vec_id")).distinct()
    val dense = VecDupStream.queryTopK(spark, s"$rootDir/vec_state",
        queries.select(col("query_id"), col("embedding")),
        k = graft.operators.CorpusOps.bm25K, exclude = Some(dropped))
      .select(col("query_id"), col("vec_id").as("doc_id"),
        col("rank").as("rank_dense"))
    // canon like the batch hybrid face: consumers comparing collected
    // output get a deterministic row order (ADVICE r9 — rrfFuse alone
    // leaves the fused order nondeterministic)
    graft.Tables.canon(graft.operators.CorpusOps.rrfFuse(sparse, dense))
  }

  /** THREE-LEG HYBRID RETRIEVAL (round 11): [[hybridTopK]]'s sparse
    * and dense legs plus a PROXIMITY leg — sloppy-frequency NEAR over
    * the kept-corpus positional index ([[IndexStream.queryNear]] with
    * `sloppy = true`: Σ ⌊10⁶/(1+slop)⌋ per document, the Lucene
    * sloppy-phrase grade) — fused by the arity-generic shared RRF
    * (CorpusOps.rrfFuseLegs). Phrase-proximity evidence is the signal
    * the other two legs can't see: BM25 is bag-of-words (order-blind)
    * and the dense leg is whole-document geometry, so a document
    * carrying the query's leading terms adjacent and in order gets a
    * third independent vote. All three legs are served from the
    * pipeline's accumulated LSM state — no batch-side corpus scan.
    */
  def hybridProxTopK(spark: SparkSession, rootDir: String,
      queries0: DataFrame): DataFrame = {
    // persist the shared query relation once across the three legs
    // (round 15 — see hybridTopK)
    val queries =
      if (queries0.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        queries0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else queries0
    // ONE posting fetch serves the sparse AND proximity legs (round 12
    // — IndexStream.queryHybridParts): previously the two legs each
    // ran the dfs shortlist + posting fetch over the same terms, one
    // projecting tf, one positions
    val (sparse0, prox0) = IndexStream.queryHybridParts(spark,
      ridxState(rootDir), queries.select(col("query_id"), col("text")),
      sloppy = true)
    val sparse = sparse0.select(col("query_id"), col("doc_id"),
      col("rank").as("rank_sparse"))
    val prox = prox0.select(col("query_id"), col("doc_id"),
      col("rank").as("rank_prox"))
    val dropped = CurationStream.pairLog(spark, rootDir)
      .select(col("new_id").as("vec_id")).distinct()
    val dense = VecDupStream.queryTopK(spark, s"$rootDir/vec_state",
        queries.select(col("query_id"), col("embedding")),
        k = graft.operators.CorpusOps.bm25K, exclude = Some(dropped))
      .select(col("query_id"), col("vec_id").as("doc_id"),
        col("rank").as("rank_dense"))
    graft.Tables.canon(graft.operators.CorpusOps.rrfFuseLegs(
      Seq(sparse, dense, prox)))
  }

  /** The hybrid face's DENSE LEG alone — ranked ANN over the vector
    * gate's LSM index, curation drop set excluded before ranking —
    * with the PQ/ADC thresholds exposed (round 11): the driver-checked
    * oracle row `dense_index_adc` runs it FULLY ENGAGED (engageMin =
    * 0) at a covering tail, so the compressed leg — codebook read,
    * candidate code fetch, exact-integer ADC table, pre-rank window,
    * tail-bounded raw fetch — is oracle-checked bit-identical against
    * the exact dense-leg SQL, not just spec-pinned.
    */
  /** `allow` (optional): metadata-constrained retrieval — only these
    * vec_ids may rank (applied before ranking, after the drop set).
    */
  def denseTopK(spark: SparkSession, rootDir: String, queries: DataFrame,
      engageMin: Int = 0, exactTail: Int = 1 << 20,
      allow: Option[DataFrame] = None): DataFrame = {
    val dropped = CurationStream.pairLog(spark, rootDir)
      .select(col("new_id").as("vec_id")).distinct()
    VecDupStream.queryTopKTuned(spark, s"$rootDir/vec_state",
      queries.select(col("query_id"), col("embedding")),
      graft.operators.CorpusOps.bm25K, Some(dropped), engageMin, exactTail,
      allow)
  }

  /** DELETE documents from the WHOLE pipeline — right-to-be-forgotten
    * across all three LSM states in one call: the retrieval index
    * (BM25/phrase/NEAR stop answering with the doc, idf/avgdl/df
    * re-derive over the survivors immediately), the vector gate (the
    * doc stops ranking in the dense leg and stops flagging future
    * arrivals as its duplicates), and the text gate (likewise). Each
    * gate's delete is its own idempotent tombstone operation under the
    * shared `deleteId` namespace; physical reclaim happens at each
    * state's next compaction ([[compactIfDue]]). Ids never indexed by
    * a given state (e.g. a doc the gates DROPPED is absent from the
    * retrieval index) are no-ops there — deleting by id is safe
    * whether the doc was kept or dropped. Past emission logs are the
    * record of actions taken while the doc was live and are not
    * retracted; [[verdicts]] for a deleted doc keep their history.
    *
    * Returns the number of docs newly deleted from the retrieval
    * index (the kept-corpus count — the number a caller usually wants;
    * gate-side deletions may be larger since gates index drops too).
    */
  def delete(spark: SparkSession, rootDir: String, ids: DataFrame,
      deleteId: Long): Long = {
    val byDoc = ids.select(col("doc_id")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = IndexStream.deleteDocs(spark, ridxState(rootDir), byDoc,
        deleteId)
      NearDupStream.deleteDocs(spark, s"$rootDir/txt_state", byDoc,
        deleteId)
      VecDupStream.deleteDocs(spark, s"$rootDir/vec_state",
        byDoc.select(col("doc_id").as("vec_id")), deleteId)
      n
    } finally byDoc.unpersist()
  }

  /** SNAPSHOT the WHOLE pipeline as it stood after `batchId` landed:
    * each of the three LSM states is pinned at ITS ledger seq for that
    * batch's fold (the driver applies operations in one total order,
    * so per-state seq filters select consistent prefixes — deletes
    * issued after the batch have higher seqs everywhere and drop out),
    * and both emission logs are copied for exactly the folded batches.
    * The result is a self-contained pipeline root: `queryTopK` /
    * `queryPhrase` / `hybridTopK` / `verdicts` all work over it
    * unchanged and answer as the live pipeline did at that moment —
    * the train-set pin, addressable by the batch that closed it.
    *
    * Fails fast when a state has no fold for `batchId` (a batch whose
    * keep set was empty never folds into the retrieval index): pin at
    * a batch every state recorded, or snapshot the states individually.
    */
  def snapshotTo(spark: SparkSession, rootDir: String, destRoot: String,
      batchId: Long): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val destP = new org.apache.hadoop.fs.Path(destRoot)
    val fs = destP.getFileSystem(conf)
    require(!fs.exists(destP), s"snapshot destination exists: $destRoot")
    val states = Seq(
      ("txt_state", (st: String, d: String, q: Long) =>
        NearDupStream.snapshotTo(spark, st, d, q)),
      ("vec_state", (st: String, d: String, q: Long) =>
        VecDupStream.snapshotTo(spark, st, d, q)),
      ("ridx_state", (st: String, d: String, q: Long) =>
        IndexStream.snapshotTo(spark, st, d, q)))
    val pinSeqs = states.map { case (name, _) =>
      val st = s"$rootDir/$name"
      val es = LsmIndex.OpLog(st).entries(spark)
      val hit = es.find(e => e._2 == "fold" && e._3 == batchId)
      require(hit.isDefined,
        s"state $st has no fold for batch $batchId (empty keep set?) " +
          "— pin at a batch every state recorded, or snapshot states " +
          "individually")
      name -> hit.get._1
    }.toMap
    for ((name, snap) <- states)
      snap(s"$rootDir/$name", s"$destRoot/$name", pinSeqs(name))
    // emission logs: exactly the batches folded at or before the pin
    // (the txt gate sees every batch, so its ledger is the batch list)
    val folded = LsmIndex.OpLog(s"$rootDir/txt_state").entries(spark)
      .filter(e => e._2 == "fold" && e._1 <= pinSeqs("txt_state"))
      .map(_._3).toSet
    for (out <- Seq("txt_out", "vec_out")) {
      val src = new org.apache.hadoop.fs.Path(s"$rootDir/$out")
      if (fs.exists(src))
        for (st <- fs.listStatus(src) if st.isDirectory) {
          val nm = st.getPath.getName
          if (nm.startsWith("batch_id=") &&
              folded.contains(nm.stripPrefix("batch_id=").toLong)) {
            val d = new org.apache.hadoop.fs.Path(s"$destRoot/$out/$nm")
            fs.mkdirs(d.getParent)
            require(org.apache.hadoop.fs.FileUtil.copy(fs, st.getPath,
              fs, d, false, true, conf),
              s"snapshot copy failed: $out/$nm")
          }
        }
    }
    ()
  }

  /** RETENTION EXPIRY across the whole pipeline: delete everything
    * with id ≤ `maxId` from all three states. Ids are monotone with
    * arrival order (HiWater-enforced), so an id watermark IS a
    * retention watermark — a pipeline whose ids embed ingest time
    * (snowflake-style) gets time-based TTL from this directly. Each
    * gate enumerates its own survivors below the cutoff (row-group
    * pruned — files are id-sorted) and delegates to its `deleteDocs`,
    * so idempotence, exact survivor stats, and reclaim-at-compaction
    * all hold. Returns the number expired from the retrieval index.
    */
  def expireThrough(spark: SparkSession, rootDir: String, maxId: Long,
      deleteId: Long): Long = {
    val n = IndexStream.deleteThrough(spark, ridxState(rootDir), maxId,
      deleteId)
    NearDupStream.deleteThrough(spark, s"$rootDir/txt_state", maxId,
      deleteId)
    VecDupStream.deleteThrough(spark, s"$rootDir/vec_state", maxId,
      deleteId)
    n
  }

  /** File-source streaming runner for DELETION REQUESTS: watch
    * `sourceDir` for parquet of (doc_id) rows — takedowns,
    * right-to-be-forgotten tickets — and run each micro-batch through
    * [[delete]]. The micro-batch id is the deleteId, so Structured
    * Streaming's replay semantics land on deleteDocs' idempotent keyed
    * overwrites: a re-delivered deletion batch re-derives and
    * overwrites exactly its own generations. Runs AGAINST THE SAME
    * rootDir as the ingestion stream but must not run concurrently
    * with it (the gates' states are single-writer, same operational
    * contract as compaction).
    */
  def startDeletes(spark: SparkSession, sourceDir: String,
      rootDir: String, checkpointDir: String): StreamingQuery = {
    spark.readStream
      .schema(StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType))))
      .parquet(sourceDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        delete(spark, rootDir, batch, id); ()
      }
      .start()
  }

  /** The composed keep/drop verdicts (see CurationStream.verdicts). */
  def verdicts(spark: SparkSession, rootDir: String,
      ids: Option[DataFrame] = None): DataFrame =
    CurationStream.verdicts(spark, rootDir, ids)

  /** Maintenance fan-out: the gates' and the index's cadence rule in
    * one call. Returns whether any compaction ran.
    */
  def compactIfDue(spark: SparkSession, rootDir: String,
      targetFileBytes: Long,
      maxGen: Int = NearDupStream.defaultMaxGenerations): Boolean = {
    val g = CurationStream.compactIfDue(spark, rootDir, targetFileBytes,
      maxGen)
    val r = IndexStream.compactIfDue(spark, ridxState(rootDir),
      targetFileBytes, maxGen)
    g || r
  }

  /** The composed maintenance policy, pipeline-wide (round 12): run
    * each gate's `maintainIfDue` — pin check → redomain-if-grown →
    * retrain-if-drifted (vec gate only) → compact-if-fragmented — and
    * consolidate the two emission logs on the same fragmentation
    * cadence. THE one call an operator crons against a pipeline root;
    * per-gate reports keyed `txt`/`vec`/`ridx` tell it what ran and
    * what a pin blocked.
    */
  def maintainIfDue(spark: SparkSession, rootDir: String,
      targetFileBytes: Long = LsmIndex.defaultTargetFileBytes,
      maxGen: Int = NearDupStream.defaultMaxGenerations)
      : Map[String, LsmIndex.Maintenance] = {
    val t = NearDupStream.maintainIfDue(spark, s"$rootDir/txt_state",
      targetFileBytes, maxGen)
    val v = VecDupStream.maintainIfDue(spark, s"$rootDir/vec_state",
      targetFileBytes, maxGen)
    val r = IndexStream.maintainIfDue(spark, ridxState(rootDir),
      targetFileBytes, maxGen)
    // emission logs carry no pins or domains — consolidation is their
    // whole maintenance story; fold it into the owning gate's report
    val to = LsmIndex.compactEmissions(spark, s"$rootDir/txt_out",
      CurationStream.txtOutSchema, targetFileBytes,
      minDirs = maxGen)._1 > 0
    val vo = LsmIndex.compactEmissions(spark, s"$rootDir/vec_out",
      CurationStream.vecOutSchema, targetFileBytes,
      minDirs = maxGen)._1 > 0
    Map(
      "txt" -> t.copy(compacted = t.compacted || to),
      "vec" -> v.copy(compacted = v.compacted || vo),
      "ridx" -> r)
  }

  /** Operational DESCRIBE fan-out: all three gates' [[LsmIndex.stats]]
    * rows under a `gate` column — the one dashboard call an operator
    * makes before deciding which state to compact, re-domain, or
    * investigate. FS metadata + markers only, no data read.
    */
  def stateStats(spark: SparkSession, rootDir: String): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val perGate = NearDupStream.stateStats(spark, s"$rootDir/txt_state")
      .withColumn("gate", lit("txt"))
      .unionByName(VecDupStream.stateStats(spark, s"$rootDir/vec_state")
        .withColumn("gate", lit("vec")))
      .unionByName(IndexStream.stateStats(spark, ridxState(rootDir))
        .withColumn("gate", lit("ridx")))
    // PIPELINE-GRAIN maintenance rollup (round 14): the operator
    // question "did the last maintenance cycle act anywhere, and how
    // bad is the worst measured drift" answered in ONE call — derived
    // from the same per-gate maintlogs the gate rows expose, so the
    // rollup can never disagree with its details
    val lasts = Seq("txt" -> s"$rootDir/txt_state",
        "vec" -> s"$rootDir/vec_state", "ridx" -> ridxState(rootDir))
      .flatMap { case (_, dir) =>
        LsmIndex.MaintLog(dir).entries(spark).lastOption }
    val drifts = lasts.map(_._3.driftMicro).filter(_ >= 0L)
    val roll = Seq(
      ("maintenance", "gates_reporting", lasts.size.toLong),
      ("maintenance", "gates_acted_last_cycle",
        lasts.count(_._3.any).toLong)) ++
      (if (drifts.nonEmpty)
         Seq(("maintenance", "max_last_drift_micro", drifts.max))
       else Nil)
    perGate.unionByName(spark.createDataFrame(
      spark.sparkContext.parallelize(roll.map { case (s, n, v) =>
        org.apache.spark.sql.Row(s, n, java.lang.Long.valueOf(v), null,
          "pipeline")
      }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("section",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("name",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("gate",
          org.apache.spark.sql.types.StringType)))))
  }

  /** RE-DOMAIN fan-out (round 11): grow each state's dir-domain
    * geometry to what its live cardinality warrants (see
    * [[IndexStream.redomainIfDue]] — grow-only, pin-aware, an epoch
    * barrier when it runs). The text gate's measurement is a survivor
    * count over its docs sub-table, so call this at maintenance
    * cadence or rarer — never per batch. Returns whether any state was
    * rebuilt.
    */
  def redomainIfDue(spark: SparkSession, rootDir: String): Boolean = {
    val t = NearDupStream.redomainIfDue(spark, s"$rootDir/txt_state")
    val v = VecDupStream.redomainIfDue(spark, s"$rootDir/vec_state")
    val r = IndexStream.redomainIfDue(spark, ridxState(rootDir))
    t || v || r
  }

  /** File-source streaming runner over (doc_id, text, embedding,
    * source) parquet.
    */
  def start(spark: SparkSession, sourceDir: String, rootDir: String,
      checkpointDir: String,
      sourceSchema: StructType = rowSchema): StreamingQuery = {
    spark.readStream
      .schema(sourceSchema)
      .parquet(sourceDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatch(spark, rootDir, batch, id)
      }
      .start()
  }
}
