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
  * Index layout is the scale story — an LSM-shaped partitioned index
  * (round 6; the round-5 merge-dedup fold read AND rewrote the touched
  * partitions' full occupancy every batch, a per-batch write term that
  * approaches rewriting the whole index once batches spread across the
  * partition domain):
  *
  *  - `buckets/` — (band_idx, bucket, doc_id), partitioned by
  *    (band_idx, bpfx, ingest) where bpfx = first hex byte of the
  *    bucket hash (4 × 256 = 1024 fixed hash partitions) and ingest =
  *    the batch id that wrote the rows. A micro-batch APPENDS its own
  *    rows as a new `ingest=<batchId>` generation under the (band,
  *    bpfx) dirs its docs hash into — per-batch WRITE work is O(batch),
  *    it never reads accumulated state to fold, and a retried batch
  *    dynamic-overwrites exactly its own generation dirs (idempotent).
  *    The candidate READ is directory-pruned to the touched (band_idx,
  *    bpfx) pairs — that read scales with the touched buckets'
  *    occupancy (inherent: a new doc must be compared against
  *    everything indexed in its buckets), and with nothing else.
  *  - `docs/` — (doc_id, lt, n_sh) the verify side-table (lowered text
  *    + shingle count, ONE copy per doc, never 4×), partitioned by
  *    (pmod(doc_id, 256), ingest) the same way. The verify read is
  *    candidate-bounded: dbucket directory pruning plus — when the
  *    candidate id set is small enough to collect (the normal case) —
  *    a doc_id IN (...) predicate that reaches the parquet row-group
  *    stats, so verify IO tracks the candidate set, not the corpus.
  *
  * Generations are consolidated by [[compactState]] (the LSM
  * compaction), run as a maintenance job between stream runs — so
  * per-batch cost stays flat while listing pressure is bounded by
  * maintenance cadence, the same contract as LoadOps.compactParquet.
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
  * appending a duplicate; index folds REPLACE the batch's own ingest
  * generation, so re-applying a batch converges to the identical index.
  */
object NearDupStream {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("source", StringType)))

  /** Stored layout: data columns + hash partition dirs + the ingest
    * generation dir. Reads always go through these (ingest included);
    * writers add `ingest` per batch.
    */
  private val bucketsSchema: StructType = StructType(Seq(
    StructField("band_idx", IntegerType),
    StructField("bucket", StringType),
    StructField("doc_id", LongType),
    StructField("bpfx", StringType),
    StructField("ingest", LongType)))

  private val docsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lt", StringType),
    StructField("n_sh", LongType),
    StructField("dbucket", LongType),
    StructField("ingest", LongType)))

  /** Verified-Jaccard floor for emitting a pair. */
  private val jaccardFloor = 0.5

  /** Per-state directory-domain geometry (round 11 — corpus-adaptive
    * dir domains, the same creation-time layout term as
    * [[VecDupStream.Geom]]): `db` = dbucket count (docs/tombs dirs),
    * `hx` = bpfx hex chars (each band has 16^hx bucket dirs). The
    * production default (256, 2) regenerates the historical layout
    * string byte-identically, so existing states stay valid; a small
    * corpus created through [[initState]] stops paying the 4×256+256
    * per-dir file constants. Derived columns (`bpfx`, `dbucket`) are
    * always computed FROM the state's recorded geometry.
    */
  private[graft] case class Geom(db: Int, hx: Int) {
    require(Integer.bitCount(db) == 1 && (hx == 1 || hx == 2),
      s"geometry must be power-of-two db and hx in {1,2}: db=$db hx=$hx")
    def bandDirs: Int = 1 << (4 * hx)
  }

  /** Production default: 256 doc buckets (round 6: directory pruning
    * on dbucket saturates once the candidate set covers the bucket
    * domain, so the domain must comfortably exceed a batch's typical
    * candidate spread; the doc_id IN pushdown prunes row groups below
    * that) and two bpfx hex chars (256 bucket dirs per band).
    */
  private[graft] val defaultGeom = Geom(256, 2)

  /** Smallest domain keeping ~≤4096 docs per dbucket dir (clamped to
    * [16, production] — below that a dir's per-generation file
    * overhead dwarfs its data and the doc_id IN pushdown prunes at
    * row-group grain anyway), and one bpfx hex char until the corpus
    * is large enough that 16 dirs per band would hold foreign-bucket
    * bulk a candidate read cannot skip.
    */
  private[graft] def adaptiveGeom(expectedDocs: Long): Geom = {
    var bb = 4
    while (bb < 8 && (expectedDocs >> bb) > 4096) bb += 1
    Geom(1 << bb, if (expectedDocs <= (1L << 18)) 1 else 2)
  }

  private[graft] def layoutVersionFor(g: Geom): String =
    s"graft-neardup-v3 buckets=(band_idx,bpfx,ingest):4x${g.bandDirs} " +
      s"docs=(dbucket=pmod${g.db},ingest) tombs=(dbucket,ingest)"

  private val geomRe = """:4x(\d+) docs=\(dbucket=pmod(\d+)""".r.unanchored

  private[graft] def parseGeom(layout: String): Option[Geom] =
    layout match {
      case geomRe(bd, db) =>
        try Some(Geom(db.toInt, if (bd.toInt == 16) 1 else 2))
        catch { case _: Exception => None }
      case _ => None
    }

  private[graft] def geomOf(spark: SparkSession, stateDir: String): Geom =
    LsmIndex.readLayout(spark, stateDir)
      .flatMap(parseGeom).getOrElse(defaultGeom)

  /** Create a FRESH state with a corpus-sized dir domain; no-op on an
    * existing state (the domain is immutable after creation —
    * [[migrateState]] re-domains).
    */
  def initState(spark: SparkSession, stateDir: String,
      expectedDocs: Long): Unit =
    ensureLayout(spark, stateDir, adaptiveGeom(expectedDocs))

  private[graft] def adaptiveLayoutVersion(expectedDocs: Long): String =
    layoutVersionFor(adaptiveGeom(expectedDocs))

  /** Largest candidate-id set the verify read will collect and push
    * down as a doc_id IN (...) parquet predicate (~0.5 MB of longs at
    * the cap — bounded driver cost). Above it — a pathological
    * all-duplicates batch — verification falls back to a semi-join
    * against the dbucket-pruned scan, which stays correct and
    * distributed at any candidate volume.
    */
  private val verifyIdPushdownMax = 65536

  /** Banded signature rows of a (doc_id, text) relation — the exact
    * band geometry of Dedup.minhashLshOn (8 native minhashes, 4 bands
    * of 2), plus the bucket-prefix partition column.
    */
  private def bandRel(d: DataFrame, g: Geom = defaultGeom): DataFrame = {
    graft.plans.TextExprs.register(d.sparkSession)
    d.filter(col("text").isNotNull)
      .select(col("doc_id"), expr("graft_minhash(lower(text))").as("m"))
      .withColumn("b0", md5(concat(col("m.s0"), col("m.s1"))))
      .withColumn("b1", md5(concat(col("m.s2"), col("m.s3"))))
      .withColumn("b2", md5(concat(col("m.s4"), col("m.s5"))))
      .withColumn("b3", md5(concat(col("m.s6"), col("m.s7"))))
      .selectExpr("doc_id",
        "stack(4, 0, b0, 1, b1, 2, b2, 3, b3) AS (band_idx, bucket)")
      .withColumn("bpfx", substring(col("bucket"), 1, g.hx))
  }

  /** Verify side-table rows of a (doc_id, text) relation. */
  private def sigRel(d: DataFrame, g: Geom = defaultGeom): DataFrame = {
    graft.plans.TextExprs.register(d.sparkSession)
    d.filter(col("text").isNotNull)
      .select(col("doc_id"), lower(col("text")).as("lt"),
        expr("graft_minhash(lower(text)).n_sh").as("n_sh"))
      .withColumn("dbucket", pmod(col("doc_id"), lit(g.db)))
  }

  /** Index layout version, stamped as `stateDir/_LAYOUT` the first time
    * a state dir is touched and checked on every subsequent touch. The
    * layout has already changed once (round 6: 16→256 doc buckets plus
    * the `ingest=` generation dirs); an old-layout index read by new
    * code is silently mishandled (wrong-dir pruning makes verification
    * drop docs, compaction no-ops), so a mismatch — or pre-existing
    * state with no marker at all — must FAIL FAST instead.
    */
  private[graft] val layoutVersion = layoutVersionFor(defaultGeom)

  /** Tombstone sub-table (layout v3): one row per DELETED document
    * under `ingest=-(2+deleteId)` generations — right-to-be-forgotten,
    * same contract as IndexStream/VecDupStream: logical-first delete,
    * physical reclaim at compaction.
    */
  private val tombsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("dbucket", LongType),
    StructField("ingest", LongType)))

  private val subTables = Seq(
    LsmIndex.Sub("buckets", bucketsSchema, Seq("band_idx", "bpfx")),
    // docs sorted by doc_id within files: the verify read's doc_id IN
    // pushdown prunes at row-group grain on compacted files
    LsmIndex.Sub("docs", docsSchema, Seq("dbucket"),
      sortCols = Seq("doc_id")),
    LsmIndex.Sub("tombs", tombsSchema, Seq("dbucket")))

  private[streaming] def ensureLayout(spark: SparkSession,
      stateDir: String, geom: Geom = defaultGeom): Unit = {
    // an existing state's recorded domain is authoritative (see
    // VecDupStream.ensureLayout); only a fresh state takes `geom`
    val expect = LsmIndex.readLayout(spark, stateDir)
      .flatMap(parseGeom).map(layoutVersionFor)
      .getOrElse(layoutVersionFor(geom))
    LsmIndex.ensureLayout(spark, stateDir, expect, subTables.map(_.name))
  }

  private def readOrEmpty(spark: SparkSession, dir: String,
      schema: StructType): DataFrame = LsmIndex.readOrEmpty(spark, dir, schema)

  /** Check one micro-batch against the index, emit verified pairs to
    * `outDir/batch_id=<id>/`, and fold the batch into the index.
    * Exposed for the spec; `start` wires it into foreachBatch.
    *
    * Crash-consistency: emissions land first (batchId-keyed overwrite),
    * then the buckets fold, then the docs fold. Each fold writes ONLY
    * the batch's own rows into `ingest=<batchId>` generation dirs —
    * its lineage roots in the (persisted) batch, never in partitions
    * being replaced, so the round-5 self-overwrite hazard cannot
    * arise, and there is nothing to stage. A crash between steps
    * leaves the index halves momentarily inconsistent, and the RETRY
    * heals it: foreachBatch re-delivers the uncommitted batch and
    * every step is a keyed overwrite of its own partitions, so
    * re-applying converges to the identical state (the idempotence the
    * spec pins).
    */
  def applyBatch(spark: SparkSession, stateDir: String, outDir: String,
      batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return
    ensureLayout(spark, stateDir)
    val g = geomOf(spark, stateDir)
    val bucketsDir = s"$stateDir/buckets"
    val docsDir = s"$stateDir/docs"
    // ENFORCE the id-monotonicity ingest contract this gate's
    // keep-at-ingest finality rests on (round 10): a genuinely-NEW id
    // must lie above everything already ingested — checked BEFORE any
    // emission or fold so a violating source cannot leave a
    // silently-stale index. Fast path (no id at or below the water)
    // reads no state; ids at/below it are allowed only as RE-ARRIVALS
    // of already-indexed rows (membership probe, candidate-bounded
    // like the verify read) — a re-arrival's verdict cannot change
    // because everything ingested after it has higher ids.
    val idSpan = batch.agg(min(col("doc_id")), max(col("doc_id")))
      .collect()(0)
    val hiw = LsmIndex.HiWater(stateDir)
    if (!idSpan.isNullAt(0)) {
      hiw.highWaterFor(spark, batchId).foreach { high =>
        if (idSpan.getLong(0) <= high) {
          val stale = batch.filter(col("doc_id") <= high)
            .select(col("doc_id")).distinct()
          val sample = stale.limit(verifyIdPushdownMax + 1)
            .collect().map(_.getLong(0))
          val docsBase = readOrEmpty(spark, docsDir, docsSchema)
          val indexed =
            if (sample.length <= verifyIdPushdownMax) {
              val dbs = sample
                .map(i => Math.floorMod(i, g.db.toLong))
                .distinct.toSeq
              docsBase.filter(col("dbucket").isin(dbs: _*) &&
                col("doc_id").isin(sample.toSeq: _*))
            } else docsBase
          val offender = stale
            .join(indexed.select(col("doc_id")).distinct(),
              Seq("doc_id"), "left_anti")
            .limit(1).collect()
          require(offender.isEmpty,
            hiw.violationMsg(batchId, offender(0).getLong(0), high))
        }
      }
    }
    // distinct() everywhere batch rows enter state: a re-delivered
    // batch must merge to the identical index
    val b = bandRel(batch, g).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dNew = sigRel(batch, g).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // touched hash-partition set is bounded: ≤ 4 × batch docs and ≤
      // the fixed 4 × 256 (band_idx, bpfx) domain — a fixed-size driver
      // list, not a data-sized collect
      val touchedPfx = b.select(col("band_idx"), col("bpfx")).distinct()
        .collect().map(r => (r.getInt(0), r.getString(1)))
      // prune on the EXACT touched (band_idx, bpfx) pairs — an
      // isin × isin filter is their cross product, and since all 4
      // band_idx values are present in almost every batch it would read
      // up to ~4× more partitions than the docs hash into (ADVICE r5)
      val pairKeys = touchedPfx.map { case (bi, px) => s"$bi/$px" }.toSeq
      val oldBuckets = readOrEmpty(spark, bucketsDir, bucketsSchema)
        .filter(concat_ws("/", col("band_idx"), col("bpfx"))
          .isin(pairKeys: _*))
      // candidates: a new doc against anything already indexed in its
      // buckets, plus within-batch collisions; lower id = kept rep.
      // Tombstoned (deleted) docs leave the stored leg: forgotten
      // content must not flag a new arrival as its duplicate
      val known = minusTombs(spark, stateDir,
        oldBuckets.select(col("band_idx"), col("bucket"),
          col("doc_id"))).unionByName(
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
        // side's read of the docs side-table is CANDIDATE-BOUNDED:
        // normally the candidate ids fit the bounded collect and become
        // a dbucket-dir prune PLUS a doc_id IN predicate the parquet
        // reader prunes row groups with; a pathological batch overflows
        // to a dbucket-pruned scan + semi-join — correct and
        // distributed at any candidate volume (ADVICE r5: an unpruned
        // read grew with the corpus).
        val dupIds = cand.select(col("dup_id")).distinct()
        val idSample = dupIds.limit(verifyIdPushdownMax + 1)
          .collect().map(_.getLong(0)) // one bounded action
        val dupBase = readOrEmpty(spark, docsDir, docsSchema)
        val dupSide =
          if (idSample.length <= verifyIdPushdownMax) {
            // floorMod, NOT Scala's signed %: the write side buckets
            // with pmod(doc_id, n) which is always non-negative, so a
            // negative doc_id under % would prune the WRONG dbucket dir
            // and silently drop the doc from verification
            val dbs =
              idSample.map(i => Math.floorMod(i, g.db.toLong)).distinct.toSeq
            dupBase.filter(col("dbucket").isin(dbs: _*) &&
              col("doc_id").isin(idSample.toSeq: _*))
          } else {
            val dupDb = dupIds
              .select(pmod(col("dup_id"), lit(g.db)).as("dbucket"))
              .distinct().collect().map(_.getLong(0)).toSeq // ≤ 256, fixed
            dupBase.filter(col("dbucket").isin(dupDb: _*))
              .join(dupIds, col("doc_id") === col("dup_id"), "left_semi")
          }
        // exactly ONE verify row per dup-side doc_id. Two hazards:
        // (a) generations are merge-free, so a doc re-indexed by an
        // upstream anomaly (or a batch re-delivered after its
        // generation was compacted away) may appear in two generations
        // — handled by the stored-side distinct; (b) a doc_id present
        // in BOTH the stored side-table and the current batch would
        // yield one row from each leg, and every flagged pair against
        // it would emit twice — handled by anti-joining the batch's
        // ids out of the stored leg FIRST (the batch's row wins; it is
        // also robust to text drift between the two copies, where a
        // union-then-distinct would still keep both). Candidate-bounded
        // relation, so both steps are cheap.
        val dupDocs = dupSide
          .select(col("doc_id"), col("lt"), col("n_sh")).distinct()
          .join(dNew.select(col("doc_id")), Seq("doc_id"), "left_anti")
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
      // LSM fold: the batch's own rows become a new ingest generation
      // under the hash partitions they belong to. O(batch) write, zero
      // read of accumulated state; dynamic overwrite keyed on the
      // batch's own (… , ingest=batchId) dirs makes a retry replace —
      // not duplicate — its generation. Repartitioned on the dir keys
      // first so a generation lands as ONE file per touched dir — a
      // w-task batch otherwise writes up to w× the files, turning the
      // cadence bound "≤ G generations per dir" into ≤ G·w files per
      // dir of listing/open overhead (round 9; measured as the
      // dominant cost of the whole-corpus curation face).
      b.withColumn("ingest", lit(batchId))
        .repartition(spark.sparkContext.defaultParallelism,
          col("band_idx"), col("bpfx"))
        .write.partitionBy("band_idx", "bpfx", "ingest")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(bucketsDir)
      dNew.withColumn("ingest", lit(batchId))
        .repartition(spark.sparkContext.defaultParallelism,
          col("dbucket"))
        .sortWithinPartitions(col("dbucket"), col("doc_id"))
        .write.partitionBy("dbucket", "ingest")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(docsDir)
      // high-water marker last: a crash before it leaves the batch
      // unrecorded and the retry re-checks + re-records (idempotent)
      if (!idSpan.isNullAt(1))
        LsmIndex.HiWater(stateDir).record(spark, batchId,
          idSpan.getLong(1))
      LsmIndex.OpLog(stateDir).record(spark, "fold", batchId)
    } finally { b.unpersist(); dNew.unpersist() }
    ()
  }

  /** Compaction cadence contract. Per-batch folds are O(batch) and
    * never read accumulated state, so the quantity that grows without
    * bound between maintenance runs is the GENERATION COUNT: each
    * batch adds one `ingest=<id>` dir (≈ one data file) under every
    * hash-partition dir it touches, and the candidate/verify reads
    * open every generation of every touched partition. Read
    * amplification is therefore bounded by generations-per-partition,
    * and the cadence rule is: run [[compactState]] whenever the worst
    * partition dir holds ≥ `defaultMaxGenerations` generations. Under
    * that cadence (enforceable via [[compactIfDue]] after each batch,
    * or between stream runs) a candidate read opens at most
    * G = `defaultMaxGenerations` files per touched partition dir — the
    * bounded-read invariant NearDupScaleSpec pins.
    */
  val defaultMaxGenerations = 8

  /** Worst-case generations per hash-partition dir across both
    * sub-tables — the read-amplification factor of the next candidate
    * lookup. Pure driver-side listing of a fixed dir domain (≤ 1024 +
    * 256 partition dirs), no Spark job.
    */
  def maxGenerations(spark: SparkSession, stateDir: String): Int =
    LsmIndex.maxGenerations(spark, stateDir, subTables.map(_.name))

  /** Operational DESCRIBE of a text-gate state root — see
    * [[LsmIndex.stats]] (this gate keeps no corpus marker; live doc
    * count is a docs-minus-tombs read the dashboard doesn't pay).
    */
  def stateStats(spark: SparkSession, stateDir: String): DataFrame = {
    ensureLayout(spark, stateDir)
    LsmIndex.stats(spark, stateDir, subTables.map(_.name), Seq.empty)
  }

  /** True when the cadence rule says to compact now. */
  def compactionDue(spark: SparkSession, stateDir: String,
      maxGen: Int = defaultMaxGenerations): Boolean =
    maxGenerations(spark, stateDir) >= maxGen

  /** Enforce the cadence: compact iff due. Returns whether compaction
    * ran. Call between micro-batches (foreachBatch tail) or between
    * stream runs — see compactState's crash contract for the
    * cleanly-stopped-stream caveat on compacting uncommitted
    * generations.
    */
  def compactIfDue(spark: SparkSession, stateDir: String,
      targetFileBytes: Long,
      maxGen: Int = defaultMaxGenerations): Boolean = {
    val due = compactionDue(spark, stateDir, maxGen)
    if (due) compactState(spark, stateDir, targetFileBytes)
    due
  }

  /** The composed maintenance policy (round 12): pin check →
    * redomain-if-grown → compact-if-fragmented; no codebook on the
    * text gate, so `retrained` is always false (see
    * [[VecDupStream.maintainIfDue]] for the drift leg).
    */
  def maintainIfDue(spark: SparkSession, stateDir: String,
      targetFileBytes: Long = LsmIndex.defaultTargetFileBytes,
      maxGen: Int = defaultMaxGenerations,
      expectedDocs: Option[Long] = None): LsmIndex.Maintenance = {
    ensureLayout(spark, stateDir)
    val report =
      if (LsmIndex.pinBlocksCompaction(spark, stateDir))
        LsmIndex.Maintenance(pinned = true, redomained = false,
          retrained = false, compacted = false)
      else {
        val redomained = redomainIfDue(spark, stateDir, expectedDocs)
        val compacted =
          compactIfDue(spark, stateDir, targetFileBytes, maxGen)
        LsmIndex.Maintenance(pinned = false, redomained,
          retrained = false, compacted = compacted)
      }
    LsmIndex.MaintLog(stateDir).record(spark, report)
    report
  }

  /** The LSM compaction: every micro-batch appends an
    * `ingest=<batchId>` generation under the hash partitions it
    * touches, so per-batch cost stays O(batch) while GENERATION COUNT
    * — not data size — starts to drive listing pressure, scan task
    * count, and candidate-read file opens. This pass consolidates each
    * sub-table's generations into a single `ingest=-1` generation
    * (deduped — a batch re-delivered after its generation was already
    * merged converges here), sized to `targetFileBytes`, as ONE
    * read→write job per sub-table — not a per-partition driver loop,
    * which over the 1024-dir domain would mean thousands of sequential
    * Spark jobs. Runs only if some partition holds ≥ `minFiles` data
    * files. Returns (fragmentedPartitionsBefore, filesBefore,
    * filesAfter).
    *
    * Crash contract (compactParquet's): staging write + row-count
    * verify BEFORE any delete; the window between moving the old root
    * aside and renaming the staging in is a read hole, not data loss
    * (both dirs survive for manual recovery). Run it OUTSIDE the
    * foreachBatch, against a CLEANLY STOPPED stream (checkpoint
    * committed): compacting an uncommitted batch's generation away
    * would let its re-delivery re-append rows the merged generation
    * already holds — the read-side distinct()s keep that correct, but
    * the duplicate bytes persist until the next compaction.
    */
  def compactState(spark: SparkSession, stateDir: String,
      targetFileBytes: Long, minFiles: Int = 2): (Int, Int, Int) = {
    ensureLayout(spark, stateDir)
    // PHYSICAL tombstone reclamation (round 10) — crash-ordered like
    // IndexStream.compactState: data rewrites first, tombs dropped last
    val tombsRoot = new org.apache.hadoop.fs.Path(s"$stateDir/tombs")
    val tfs = tombsRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val reclaim = tfs.exists(tombsRoot) &&
      !spark.read.schema(tombsSchema).parquet(tombsRoot.toString).isEmpty
    // no-op maintenance must not seal snapshot history; a real merge
    // records its epoch barrier BEFORE the destructive rewrite so a
    // crash mid-merge fails later pre-barrier snapshots fast
    // (ADVICE r10 — same contract as IndexStream.compactState)
    if (!reclaim && LsmIndex.fragmentedSubs(spark, stateDir, subTables,
        minFiles).isEmpty)
      return (0, 0, 0)
    // pin-aware maintenance (round 11): a registered pin addressing
    // recorded history blocks the barrier until released
    if (LsmIndex.pinBlocksCompaction(spark, stateDir)) return (0, 0, 0)
    val log = LsmIndex.OpLog(stateDir)
    log.record(spark, "compact",
      log.entries(spark).count(_._2 == "compact").toLong)
    val r =
      if (!reclaim)
        LsmIndex.compact(spark, stateDir, subTables, targetFileBytes,
          minFiles)
      else {
        val tombIds = spark.read.schema(tombsSchema)
          .parquet(tombsRoot.toString)
          .select(col("doc_id")).distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val dropDoomed: DataFrame => DataFrame =
            _.join(tombIds, Seq("doc_id"), "left_anti")
          val res = LsmIndex.compact(spark, stateDir,
            subTables.filterNot(_.name == "tombs"),
            targetFileBytes, minFiles,
            transforms = Map("buckets" -> dropDoomed, "docs" -> dropDoomed),
            force = Set("buckets", "docs"))
          tfs.delete(tombsRoot, true)
          spark.catalog.refreshByPath(tombsRoot.toString)
          res
        } finally tombIds.unpersist()
      }
    LsmIndex.HiWater(stateDir).consolidate(spark)
    r
  }

  /** Snapshot this gate's state as of a ledger seq — see
    * [[LsmIndex.snapshot]]; the composed pin is
    * [[PipelineStream.snapshotTo]].
    */
  def snapshotTo(spark: SparkSession, stateDir: String, destDir: String,
      asOfSeq: Long): Unit = {
    ensureLayout(spark, stateDir)
    LsmIndex.snapshot(spark, stateDir, destDir, asOfSeq, subTables,
      Seq("hiwater"))
  }

  /** DELETE documents from the gate's index — right-to-be-forgotten,
    * the same contract as [[VecDupStream.deleteDocs]] (which see for
    * the full rationale): O(deleted) tombstone write, candidate
    * generation and [[keepDecisions]] anti-join immediately, physical
    * reclaim at [[compactState]], no retraction of past emissions.
    * This gate keeps no corpus-count marker, so the tombstones are the
    * whole of the delete. Returns the number newly deleted.
    */
  def deleteDocs(spark: SparkSession, stateDir: String, ids: DataFrame,
      deleteId: Long): Long = {
    require(deleteId >= 0, s"deleteId must be >= 0, got $deleteId")
    ensureLayout(spark, stateDir)
    val g = geomOf(spark, stateDir)
    val gen = -(2L + deleteId)
    val want = ids.select(col("doc_id")).distinct()
    val priorTombs = readOrEmpty(spark, s"$stateDir/tombs", tombsSchema)
      .filter(col("ingest") =!= gen).select(col("doc_id")).distinct()
    val alive = want.join(priorTombs, Seq("doc_id"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val idSample = alive.limit(verifyIdPushdownMax + 1).collect()
        .map(_.getLong(0))
      if (idSample.isEmpty) return 0L
      val docsBase = readOrEmpty(spark, s"$stateDir/docs", docsSchema)
      val doomedRows =
        if (idSample.length <= verifyIdPushdownMax) {
          val dbs = idSample.map(i => Math.floorMod(i, g.db.toLong))
            .distinct.toSeq
          docsBase.filter(col("dbucket").isin(dbs: _*) &&
            col("doc_id").isin(idSample.toSeq: _*))
        } else {
          docsBase.join(alive, Seq("doc_id"), "left_semi")
        }
      val doomed = doomedRows.select(col("doc_id")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val n = doomed.count()
        if (n == 0L) return 0L
        doomed
          .withColumn("dbucket", pmod(col("doc_id"), lit(g.db)))
          .withColumn("ingest", lit(gen))
          .repartition(spark.sparkContext.defaultParallelism,
            col("dbucket"))
          .write.partitionBy("dbucket", "ingest")
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite").parquet(s"$stateDir/tombs")
        LsmIndex.OpLog(stateDir).record(spark, "del", deleteId)
        spark.catalog.refreshByPath(s"$stateDir/tombs")
        n
      } finally doomed.unpersist()
    } finally alive.unpersist()
  }

  /** RETENTION EXPIRY: delete every indexed doc with id ≤ `maxId`
    * (see IndexStream.deleteThrough — ids are monotone with arrival,
    * so the id watermark is the retention watermark; `docs` files are
    * doc_id-sorted so the cutoff prunes at row-group grain).
    */
  def deleteThrough(spark: SparkSession, stateDir: String, maxId: Long,
      deleteId: Long): Long = {
    ensureLayout(spark, stateDir)
    deleteDocs(spark, stateDir,
      readOrEmpty(spark, s"$stateDir/docs", docsSchema)
        .filter(col("doc_id") <= maxId).select(col("doc_id")),
      deleteId)
  }

  /** Drop tombstoned doc_ids from a relation; skipped entirely while
    * no tombstone exists (one driver-side dir check).
    */
  private def minusTombs(spark: SparkSession, stateDir: String,
      rel: DataFrame): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$stateDir/tombs")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) rel
    else rel.join(
      spark.read.schema(tombsSchema).parquet(p.toString)
        .select(col("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
  }

  /** LAYOUT MIGRATION (r8 verdict top item; see
    * VecDupStream.migrateState for the full rationale): rebuild the
    * derived `buckets` sub-table — band signatures and partition keys
    * — from the raw lowered text that survives every layout
    * (`docs.lt`), re-derive the docs sub-table's own bucketing
    * (round 6 changed dbucket from pmod16 to pmod256 — exactly the
    * revision this migrates across), and stamp the current
    * [[layoutVersion]]. One batch job over the index; never a
    * re-ingestion of the corpus. The swap's transactional shell is
    * [[LsmIndex.migrate]].
    */
  def migrateState(spark: SparkSession, stateDir: String): Boolean = {
    // the rebuild keeps the state's recorded dir-domain geometry;
    // unparsable pre-geometry layouts rebuild at the production domain
    val gOld = LsmIndex.readLayout(spark, stateDir)
      .flatMap(parseGeom).getOrElse(defaultGeom)
    rebuildTo(spark, stateDir, gOld)
  }

  /** RE-DOMAIN (round 11 — [[IndexStream.redomainIfDue]]'s contract on
    * this gate): rebuild at the dir-domain geometry the CURRENT live
    * corpus warrants, grow-only and pin-aware. This gate has no O(1)
    * count markers, so the measurement is one survivor count over the
    * docs sub-table — call at maintenance cadence (or rarer), not per
    * batch. Returns true iff a rebuild ran.
    */
  def redomainIfDue(spark: SparkSession, stateDir: String,
      expectedDocs: Option[Long] = None): Boolean = {
    ensureLayout(spark, stateDir)
    val gOld = geomOf(spark, stateDir)
    val n = expectedDocs.getOrElse {
      val docs = readOrEmpty(spark, s"$stateDir/docs", docsSchema)
        .select(col("doc_id")).distinct()
      val tombs = readOrEmpty(spark, s"$stateDir/tombs", tombsSchema)
        .select(col("doc_id")).distinct()
      docs.join(tombs, Seq("doc_id"), "left_anti").count()
    }
    val gNew = adaptiveGeom(n)
    if (gNew.db <= gOld.db && gNew.hx <= gOld.hx) return false
    if (LsmIndex.pinBlocksCompaction(spark, stateDir)) return false
    rebuildTo(spark, stateDir,
      Geom(math.max(gNew.db, gOld.db), math.max(gNew.hx, gOld.hx)))
  }

  /** Rebuild the derived state from the layout-stable raw columns at
    * TARGET geometry `gNew` inside [[LsmIndex.migrate]]'s shell.
    */
  private def rebuildTo(spark: SparkSession, stateDir: String,
      gNew: Geom): Boolean = {
    LsmIndex.migrate(spark, stateDir, layoutVersionFor(gNew)) {
        (oldRoot, staging) =>
      val fs = new org.apache.hadoop.fs.Path(oldRoot)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val docsPath = new org.apache.hadoop.fs.Path(s"$oldRoot/docs")
      if (fs.exists(docsPath)) {
        // tolerant read: no forced schema — only (doc_id, lt) are the
        // migration contract; n_sh/dbucket are re-derived. Tombstoned
        // docs are EXCLUDED: the rebuild makes logical deletes
        // physical, so the migrated state carries no tombs and cannot
        // resurrect forgotten content
        val tombsPath = new org.apache.hadoop.fs.Path(s"$oldRoot/tombs")
        val rawAll = spark.read.parquet(docsPath.toString)
          .select(col("doc_id"), col("lt")).distinct()
        val raw = (if (fs.exists(tombsPath))
            rawAll.join(spark.read.parquet(tombsPath.toString)
                .select(col("doc_id")).distinct(),
              Seq("doc_id"), "left_anti")
          else rawAll)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val n = raw.select(col("doc_id")).distinct().count()
          // lt is already lowercased, so feeding it back through the
          // (lower-casing) signature pipeline is idempotent
          val asBatch = raw.select(col("doc_id"), col("lt").as("text"))
          bandRel(asBatch, gNew).withColumn("ingest", lit(-1L))
            .write.partitionBy("band_idx", "bpfx", "ingest")
            .parquet(s"$staging/buckets")
          sigRel(asBatch, gNew).withColumn("ingest", lit(-1L))
            .sortWithinPartitions(col("dbucket"), col("doc_id"))
            .write.partitionBy("dbucket", "ingest")
            .parquet(s"$staging/docs")
          val got = spark.read.schema(docsSchema)
            .parquet(s"$staging/docs")
            .select(col("doc_id")).distinct().count()
          require(got == n,
            s"migration staging lost docs ($got != $n) for $oldRoot; " +
              "original untouched")
          // seed the id-monotonicity high water from the migrated ids
          // so enforcement covers pre-round-10 state from the first
          // post-migration batch
          val maxIdRow = raw.agg(max(col("doc_id"))).collect()(0)
          if (!maxIdRow.isNullAt(0))
            LsmIndex.HiWater(staging).record(spark, -1L,
              maxIdRow.getLong(0))
        } finally raw.unpersist()
      }
    }
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
    ensureLayout(spark, stateDir)
    // deleted (tombstoned) docs leave the verdict universe; the
    // emission log keeps the historical actions
    val docs = minusTombs(spark, stateDir,
      readOrEmpty(spark, s"$stateDir/docs", docsSchema)
        .select(col("doc_id")).distinct())
    val outSchema = StructType(Seq(
      StructField("new_id", LongType),
      StructField("dup_id", LongType),
      StructField("jaccard", DoubleType),
      StructField("batch_id", LongType)))
    // one candidate verdict per dropped doc: the smallest flagged
    // partner (deterministic under ties), chain-resolved by the shared
    // fixpoint resolver
    val resolved = KeepResolve.resolve(readOrEmpty(spark, outDir, outSchema))
      .select(col("id").as("doc_id"), col("kept_id"))
    docs.join(resolved, Seq("doc_id"), "left")
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
