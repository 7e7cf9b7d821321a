package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  *  - `postings/` — (term, doc_id, tf, positions), partitioned by
  *    (tpfx, ingest) where tpfx = first hex byte of md5(term) (256
  *    fixed hash partitions), files sorted by term so parquet
  *    row-group stats serve the query read's term IN pushdown.
  *    `positions` (layout v3) is the sorted token-offset list backing
  *    [[queryPhrase]]; it lives in its own parquet column chunks, so
  *    bag-of-words reads that project it away never fetch it. The
  *    posting-list fetch for a query batch is directory-pruned to the
  *    terms' tpfx dirs and row-group-pruned by the term predicate —
  *    read volume tracks the SELECTED posting lists (Σ df over the
  *    df-rarest query terms, the WAND-style static pruning of the
  *    batch face), not the index.
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

  /** Source schema for a FIELDED corpus (layout v7): the `title`
    * column makes [[applyBatch]] store each doc's real field boundary
    * — pass to [[start]] as `sourceSchema`.
    */
  val titledDocSchema: StructType = StructType(
    docSchema.fields.toSeq :+ StructField("title", StringType))

  /** Stored layouts: data columns + hash partition dirs + the ingest
    * generation dir.
    */
  private val postingsSchema: StructType = StructType(Seq(
    StructField("term", StringType),
    StructField("doc_id", LongType),
    StructField("tf", LongType),
    StructField("positions", ArrayType(IntegerType)),
    StructField("tpfx", StringType),
    StructField("ingest", LongType)))

  /** v7 (round 13): `ttl` is the STORED per-doc title length — the
    * token count of the document's title field when the batch carried
    * a real `title` column, `min(dl, titleTokens)` (the positional
    * first-titleTokens convention, its degenerate case) when it
    * didn't. The fielded face reads this instead of assuming the
    * constant convention at query time, which is what lets a real
    * fielded corpus answer BM25F bit-identically to the batch face.
    * Nullable for pre-v7 generations: readers coalesce to the
    * positional convention, so mixed-generation states stay exact.
    */
  private val docsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lt", StringType),
    StructField("dl", LongType),
    StructField("ttl", LongType),
    StructField("dbucket", LongType),
    StructField("ingest", LongType)))

  /** The per-generation document-frequency sub-table (round 10): one
    * (term, df, gen) row per distinct term of each ingested batch,
    * where `gen` is the batch id the count belongs to (a DATA column,
    * so compaction's generic distinct-merge keeps per-generation counts
    * additive and a re-delivered batch's rows dedup exactly). The query
    * face reads THIS — a vocabulary-sized relation of 2 small columns —
    * to select and cap query terms BEFORE any posting list is opened:
    *  - exact cumulative df per query term = sum over its gen rows
    *    (each doc is indexed once, so per-generation dfs add);
    *  - the head-term cap (CorpusOps.bm25CapOk) then drops stopwords
    *    with no posting I/O at all;
    *  - the surviving ≤ bm25QueryTerms terms' gen rows say EXACTLY
    *    which `ingest=` generation dirs can contain their postings —
    *    an exact per-term generation shortlist that supersedes a bloom
    *    sidecar (zero false positives, maintained for free by the
    *    fold).
    * 16 `dpfx` dirs (vs the postings' 256): the relation is small, so
    * fewer dirs keep the per-generation file-creation constant low
    * while term-sorted files still serve the term IN row-group
    * pushdown.
    */
  private val dfsSchema: StructType = StructType(Seq(
    StructField("term", StringType),
    StructField("df", LongType),
    StructField("max_tf", LongType),
    StructField("dft", LongType),
    StructField("gen", LongType),
    StructField("dpfx", StringType),
    StructField("ingest", LongType)))

  /** The tombstone sub-table (layout v4): one (doc_id, dbucket) row
    * per DELETED document, under its own `ingest=-(2+deleteId)`
    * generations (the negative namespace keeps delete generations
    * disjoint from fold generations ≥ 0 and the compacted -1). A
    * delete is logical-first: postings and docs rows of a deleted doc
    * stay on disk until a rebuild reclaims them, but every query face
    * anti-joins its candidates against this relation, and the
    * CORPUS-STAT side of the delete is exact IMMEDIATELY — see
    * [[deleteDocs]].
    */
  private val tombsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("dbucket", LongType),
    StructField("ingest", LongType)))

  private val subTables = Seq(
    LsmIndex.Sub("postings", postingsSchema, Seq("tpfx"),
      // (term, doc_id): compacted row groups keep the tight per-term
      // doc_id ranges the block-max candidate pushdown skips on
      sortCols = Seq("term", "doc_id")),
    LsmIndex.Sub("docs", docsSchema, Seq("dbucket"),
      sortCols = Seq("doc_id")),
    LsmIndex.Sub("dfs", dfsSchema, Seq("dpfx"),
      sortCols = Seq("term")),
    LsmIndex.Sub("tombs", tombsSchema, Seq("dbucket"),
      sortCols = Seq("doc_id")))

  /** Per-state directory-domain geometry (round 11 — corpus-adaptive
    * dir domains, the same creation-time layout term as
    * [[VecDupStream.Geom]]): `db` = dbucket count (docs/tombs dirs),
    * `hx` = tpfx hex chars (the postings sub-table has 16^hx dirs).
    * The production default (256, 2) regenerates the historical
    * layout string byte-identically, so existing states stay valid; a
    * small corpus created through [[initState]] stops paying the
    * 256+256 per-dir file constants on every fold and posting fetch.
    * The dfs sub-table keeps its fixed 16-dir dpfx domain — it is
    * vocabulary-sized and already coarse. Derived columns (`tpfx`,
    * `dbucket`) are always computed FROM the state's recorded
    * geometry.
    */
  private[graft] case class Geom(db: Int, hx: Int) {
    require(Integer.bitCount(db) == 1 && (hx == 1 || hx == 2),
      s"geometry must be power-of-two db and hx in {1,2}: db=$db hx=$hx")
    def tpfxDirs: Int = 1 << (4 * hx)
  }

  private[graft] val defaultGeom = Geom(256, 2)

  /** Smallest domain keeping ~≤4096 docs per dbucket dir (clamped to
    * [16, production] — below that a dir's per-generation file
    * overhead dwarfs its data and the doc_id IN pushdown prunes at
    * row-group grain anyway), and one tpfx hex char until the corpus
    * is large enough that a fold's vocabulary spread across 16 dirs
    * would make posting files unwieldy (a point query touches only
    * its own terms' dirs at either width; term-sorted files prune the
    * rest at row-group grain).
    */
  private[graft] def adaptiveGeom(expectedDocs: Long): Geom = {
    var bb = 4
    while (bb < 8 && (expectedDocs >> bb) > 4096) bb += 1
    Geom(1 << bb, if (expectedDocs <= (1L << 18)) 1 else 2)
  }

  /** v6 (round 11): the ncount markers carry a THIRD element,
    * tot_ttl = Σ ttl — the fielded face's weighted corpus length
    * derives as tot_dl + (titleWeight−1)·tot_ttl without any
    * corpus-grain read (see [[queryFielded]]); folds, deletes, and
    * rebuilds all maintain it next to (n_docs, tot_dl).
    *
    * v7 (round 13 — FIELDED STATE): a fold whose batch carries a real
    * `title` column indexes the document as the ONE token stream
    * `title ++ body` (title tokens occupy positions 0..ttl−1) and
    * stores the per-doc field boundary `ttl` = |title tokens| in the
    * docs sub-table; an unfielded fold stores ttl = min(dl,
    * titleTokens), the positional convention, as its degenerate case.
    * Everything else is UNCHANGED because the generalization is
    * position-shaped: weighted tf = tf + (w−1)·|positions < ttl|,
    * weighted dl = dl + (w−1)·ttl, df counts docs holding the term in
    * ANY field (postings exist iff tf > 0 over the combined stream) —
    * exactly the batch face's blend-before-saturate quantities. No
    * per-field posting rows, no second dfs: the stored boundary is
    * the entire fielded state.
    *
    * v8 (round 15 — FIELD-LOCAL DF): the dfs sub-table carries ONE
    * extra long per (term, gen) row, `dft` = the generation's count
    * of documents holding the term at a position < their stored
    * field boundary (title-local document frequency) — maintained by
    * the fold from the same posting rows as df, subtracted exactly by
    * deletes, summed by reclaim, re-derived exactly by rebuilds. A
    * `title:`-restricted clause under field-local scoring then reads
    * its true title rarity instead of the understating any-field df;
    * body/any clauses keep the any-field count (the body dominates
    * document mass, so its df IS the any-field df to first order —
    * storing a third per-field count would buy nothing). Pre-v8
    * generation rows (no dft column) coalesce to their any-field df
    * on read — the v7 ttl coalesce pattern.
    */
  private[graft] def layoutVersionFor(g: Geom): String =
    s"graft-ridx-v8 postings=(tpfx=md5hex${g.hx}(term),ingest):" +
      s"${g.tpfxDirs} sort=term " +
      "pos=sorted-int-array title-first " +
      s"docs=(dbucket=pmod${g.db},ingest) sort=doc_id ttl-col " +
      "dfs=(dpfx=md5hex1(term),ingest):16 sort=term gen-col dft-col " +
      "impact=max_tf " +
      s"tombs=(dbucket=pmod${g.db},ingest) del=neg-df+neg-markers " +
      "tok=lower-ws ncount=(n_docs,tot_dl,tot_ttl) " +
      s"title=${graft.operators.CorpusOps.titleTokens}x" +
      s"${graft.operators.CorpusOps.titleWeight} cap=2df<=n"

  private[graft] val layoutVersion = layoutVersionFor(defaultGeom)

  private val geomRe =
    """md5hex(\d)\(term\).*dbucket=pmod(\d+)""".r.unanchored

  private[graft] def parseGeom(layout: String): Option[Geom] =
    layout match {
      case geomRe(hx, db) =>
        try Some(Geom(db.toInt, hx.toInt))
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

  /** Largest term set a query batch pushes down as a term IN (...)
    * parquet predicate (queries are the small side by contract); above
    * it the posting fetch falls back to a tpfx-dir-pruned, term-RANGE-
    * pruned scan plus a distributed semi-join, which stays correct at
    * any query volume. Same discipline for the candidate doc_id set on
    * the dl fetch. The `graft.pushdown.max` system property is a TEST
    * seam only (it lets a spec drive the fallback paths at fixture
    * scale); production leaves it unset.
    */
  private def pushdownMax: Int =
    sys.props.get("graft.pushdown.max").map(_.toInt).getOrElse(65536)

  /** Cap for the startsWith-OR pushdown branch of [[queryPrefix]] —
    * far below [[pushdownMax]] because OR chains (unlike isin) grow
    * the Catalyst expression tree one node per predicate.
    */
  private val prefixOrMax = 256

  /** The smallest string strictly above every completion of prefix
    * `p` in Spark's STRING order (UTF-8 byte comparison), or None
    * when no safe bound exists — the upper end of a prefix-range scan
    * predicate. `p.init + (p.last + 1)` is order-correct exactly when
    * the incremented char is a real scalar value: UTF-8 encodes code
    * points order-preservingly and is prefix-free, so
    * bytes(c + 1) > bytes(c · anything) for any valid c + 1. The two
    * holes (ADVICE r14): c + 1 landing in the surrogate block
    * (U+D7FF → U+D800 — Java encodes the unpaired surrogate as '?'
    * 0x3F, which would sort BELOW real completions and silently drop
    * hits), and p already ending in a lone surrogate (its own
    * encoding is undefined). Both fall to None — no upper bound; the
    * exact semi-join downstream is always the correctness filter,
    * the range only a pushable superset.
    */
  private[graft] def charSuccessor(p: String): Option[String] = {
    if (p.isEmpty || p.last >= '￿') return None
    val next = (p.last + 1).toChar
    if (Character.isSurrogate(p.last) || Character.isSurrogate(next)) None
    else Some(p.init + next)
  }

  /** Maximum contiguous bands a fallback range prune ORs together —
    * 64 bands = 128 comparison leaves, far below the OR-chain blowup
    * the [[prefixOrMax]] cap guards against, and enough resolution to
    * skip the dead space between clustered term groups.
    */
  private val rangeBandMax = 64

  /** Cap on the 2-char-prefix group listing a banded prune collects —
    * the retrieval tokenizer lowercases, so real vocabularies sit far
    * below it; an adversarial alphabet falls back to the single
    * range, never an unbounded collect.
    */
  private val rangeGroupCap = 4096

  /** Partition an lo-ASCENDING array of [lo, hi] string ranges into
    * ≤ k contiguous chunks at the k−1 numerically-largest adjacent
    * gaps (gap proxy: the difference between the next range's lo and
    * this range's hi at two-char-prefix-code grain — exact enough to
    * find the dead vocabulary space the bands exist to skip; a bad
    * proxy costs pruning, never correctness). Returns each chunk's
    * covering [first.lo, last.hi], in order.
    */
  private def gapChunks(groups: Array[(String, String)],
      k: Int): Array[(String, String)] = {
    if (groups.isEmpty) return Array.empty
    def codeOf(x: String): Long =
      (if (x.nonEmpty) x.charAt(0).toLong << 16 else 0L) |
        (if (x.length > 1) x.charAt(1).toLong else 0L)
    val splits = (1 until groups.length)
      .map(i => (codeOf(groups(i)._1) - codeOf(groups(i - 1)._2), i))
      .sortBy(-_._1).take(k - 1).map(_._2).sorted
    val bounds = (0 +: splits) :+ groups.length
    bounds.init.zip(bounds.tail)
      .map { case (a, b) => (groups(a)._1, groups(b - 1)._2) }.toArray
  }

  /** Balanced OR of a non-empty predicate array (a linear `||` fold
    * would build a depth-n Catalyst tree).
    */
  private def orBalanced(ps: Array[Column]): Column =
    if (ps.length == 1) ps(0)
    else {
      val (l, r) = ps.splitAt(ps.length / 2)
      orBalanced(l) || orBalanced(r)
    }

  /** The prefix fallback's scan shape: the pushable range predicate
    * rides the dfs scan, the fixed-width-prefix semi-join is the
    * exact rule.
    */
  private def dfsPruned0(dfsBase: DataFrame, range: Column,
      seed: DataFrame, len: Int): DataFrame =
    dfsBase.filter(range)
      .join(seed.select(col("pfx")).distinct(),
        substring(col("term"), 1, len) === col("pfx"), "left_semi")

  /** BANDED term-range predicate (round 15) for the >[[pushdownMax]]
    * fallback scans — the answer to the round-14 residual: a query
    * set spanning the whole lexicon defeats a single [min, max] range
    * (it prunes nothing), but term sets in that regime are usually
    * CLUSTERED (prefix expansions, sharded vocabularies), so k
    * contiguous bands cut at the largest gaps skip the dead space
    * between clusters while still being one pushable predicate.
    * Groups the distinct term set by its 2-char prefix (cardinality
    * alphabet² — a bounded collect), takes each group's exact
    * [min, max], merges groups into ≤ [[rangeBandMax]] bands at the
    * largest inter-group gaps, and returns the balanced OR of closed
    * band ranges. Degenerates gracefully: spread-everywhere sets get
    * bands that together cover what the single range covered (never
    * wider); a group listing over [[rangeGroupCap]] falls back to the
    * single range. None = the term set is empty. The exact semi-join
    * downstream remains the correctness filter in every case — the
    * bands are only its pushable superset.
    */
  private def bandedTermRange(terms: DataFrame,
      c: Column): Option[Column] = {
    val g2 = terms
      .groupBy(substring(col("term"), 1, 2).as("p2"))
      .agg(org.apache.spark.sql.functions.min(col("term")).as("lo"),
        org.apache.spark.sql.functions.max(col("term")).as("hi"))
      .limit(rangeGroupCap + 1).collect()
    if (g2.isEmpty) return None
    if (g2.length > rangeGroupCap) {
      // adversarial alphabet: the r14 single range (2-value aggregate)
      val b = terms.agg(
        org.apache.spark.sql.functions.min(col("term")),
        org.apache.spark.sql.functions.max(col("term"))).collect()(0)
      return if (b.isNullAt(0)) None
      else Some(c >= b.getString(0) && c <= b.getString(1))
    }
    val bands = gapChunks(
      g2.map(r => (r.getString(1), r.getString(2))).sortBy(_._1),
      rangeBandMax)
    Some(orBalanced(bands.map { case (lo, hi) => c >= lo && c <= hi }))
  }

  val defaultMaxGenerations: Int = NearDupStream.defaultMaxGenerations

  private def markers(stateDir: String) = LsmIndex.Markers(stateDir)

  private[streaming] def ensureLayout(spark: SparkSession,
      stateDir: String, geom: Geom = defaultGeom): Unit = {
    // an existing state's recorded domain is authoritative (see
    // VecDupStream.ensureLayout); only a fresh state takes `geom`
    val expect = LsmIndex.readLayout(spark, stateDir)
      .flatMap(parseGeom).map(layoutVersionFor)
      .getOrElse(layoutVersionFor(geom))
    LsmIndex.ensureLayout(spark, stateDir, expect, subTables.map(_.name))
    markers(stateDir).recover(spark)
  }

  def maxGenerations(spark: SparkSession, stateDir: String): Int =
    LsmIndex.maxGenerations(spark, stateDir, subTables.map(_.name))

  /** Operational DESCRIBE of an index state root — see
    * [[LsmIndex.stats]]; corpus rows are the marker-stored (n_docs,
    * tot_dl).
    */
  def stateStats(spark: SparkSession, stateDir: String): DataFrame = {
    ensureLayout(spark, stateDir)
    val st = markers(stateDir).stored(spark)
    LsmIndex.stats(spark, stateDir, subTables.map(_.name),
      Seq("n_docs", "tot_dl", "tot_ttl").zip(st))
  }

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

  /** The composed maintenance policy (round 12): pin check →
    * redomain-if-grown → compact-if-fragmented — the index gate has no
    * codebook, so `retrained` is always false here (the vec gate's
    * [[VecDupStream.maintainIfDue]] carries the drift leg). A pin
    * addressing recorded history blocks the cycle whole.
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

  /** Compaction with PHYSICAL tombstone reclamation: when tombstones
    * exist, the merged sub-tables are rewritten without the deleted
    * docs — postings and docs rows anti-joined away, dfs re-aggregated
    * to survivor counts (the negative delete rows cancel exactly, and
    * zero-sum ghost terms vanish), and the tombs sub-table dropped
    * LAST, only after every data rewrite landed. Crash-ordering makes
    * this monotone-safe: at any interruption the surviving tombstones
    * still cover whatever posting bytes remain, so queries stay exact
    * (an already-reclaimed id in a tombstone is a no-op anti-join).
    * Physical reclaim also RETIRES the delete-re-delivery tolerance:
    * a delete re-delivered after its generation was compacted finds no
    * docs rows to subtract and returns 0 instead of double-counting.
    */
  def compactState(spark: SparkSession, stateDir: String,
      targetFileBytes: Long, minFiles: Int = 2): (Int, Int, Int) = {
    ensureLayout(spark, stateDir)
    val tombsRoot = new org.apache.hadoop.fs.Path(s"$stateDir/tombs")
    val fs = tombsRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val reclaim = fs.exists(tombsRoot) &&
      !spark.read.schema(tombsSchema).parquet(tombsRoot.toString)
        .isEmpty
    // no-op maintenance (nothing fragmented, no tombstones) must not
    // seal snapshot history — return without recording a barrier or
    // consolidating markers (ADVICE r10)
    if (!reclaim && LsmIndex.fragmentedSubs(spark, stateDir, subTables,
        minFiles).isEmpty)
      return (0, 0, 0)
    // pin-aware maintenance (round 11): while a registered pin
    // addresses recorded history, compaction would seal it (the new
    // barrier outranks every current seq) — skip until released
    if (LsmIndex.pinBlocksCompaction(spark, stateDir)) return (0, 0, 0)
    // the epoch barrier is recorded BEFORE the destructive merge
    // (ADVICE r10 medium): a crash mid-merge leaves the barrier in the
    // ledger, so a later snapshot at a pre-compaction seq fails fast
    // instead of silently materializing over half-merged generations;
    // until the merge starts, the named generations still exist, so a
    // snapshot AT the barrier seq stays answerable throughout
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
          // tombs is not rewritten — it is deleted whole below, and an
          // interruption before that must leave it exactly as-is
          val res = LsmIndex.compact(spark, stateDir,
            subTables.filterNot(_.name == "tombs"),
            targetFileBytes, minFiles,
            transforms = Map(
              "postings" -> dropDoomed,
              "docs" -> dropDoomed,
              // survivor df: per-generation positive rows and the
              // deletes' negative rows cancel to the surviving count;
              // fully-deleted terms sum to 0 and leave the index
              "dfs" -> (d => d.groupBy(col("term"))
                .agg(sum(col("df")).as("df"),
                  // the impact bound survives as the max of history —
                  // possibly stale-high after reclaim (the max-tf doc
                  // may be gone), which stays a valid upper bound;
                  // migration rebuilds tighten it
                  max(col("max_tf")).as("max_tf"),
                  // pre-v8 rows coalesce their unknown title-df to the
                  // any-field df (stale-HIGH, like max_tf: a too-high
                  // dft understates a title clause's rarity, never
                  // inflates it); rebuilds tighten it to exact
                  sum(coalesce(col("dft"), col("df"))).as("dft"))
                .filter(col("df") > 0)
                .withColumn("gen", lit(-1L))
                .withColumn("dpfx", substring(md5(col("term")), 1, 1)))),
            // tombstones may only be cleared once EVERY data sub-table
            // was rewritten — force them all regardless of fragmentation
            force = Set("postings", "docs", "dfs"))
          fs.delete(tombsRoot, true)
          spark.catalog.refreshByPath(tombsRoot.toString)
          res
        } finally tombIds.unpersist()
      }
    markers(stateDir).consolidate(spark)
    r
  }

  /** The md5-hex-prefix partition key of a term, computed driver-side
    * for directory shortlists — MUST match Spark's md5() (lowercase
    * hex over UTF-8 bytes), pinned by spec.
    */
  private[graft] def tpfxOf(term: String,
      hx: Int = defaultGeom.hx): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(term.getBytes("UTF-8"))
    f"${d(0) & 0xff}%02x".substring(0, hx)
  }

  /** The dfs sub-table's coarser dir key: first hex CHAR of md5(term)
    * (16 dirs) — the leading nibble of [[tpfxOf]], so the two
    * shortlists derive from one digest.
    */
  private[graft] def dpfxOf(term: String): String =
    tpfxOf(term, hx = 2).substring(0, 1)

  /** The per-batch posting rows (term, doc_id, tf, positions, tpfx) of
    * a (doc_id, text) relation, via the SHARED tokenizer. `positions`
    * is the sorted 0-based token-offset list (layout v3) — the
    * positional payload phrase retrieval merges; sort_array makes the
    * stored array deterministic at any shuffle parallelism, and
    * tf = size(positions) by construction (both aggregate the same
    * exploded rows). BM25-only reads never pay for it: the column
    * lives in its own parquet chunks and every bag-of-words read
    * projects it away before the scan (column pruning, spec-pinned).
    */
  private def tfRel(d: DataFrame, g: Geom = defaultGeom): DataFrame =
    d.filter(col("text").isNotNull)
      .select(col("doc_id"),
        posexplode(graft.operators.CorpusOps.bm25Tokens(col("text")))
          .as(Seq("pos", "term")))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("pos"))).as("positions"))
      .withColumn("tpfx", substring(md5(col("term")), 1, g.hx))

  /** The per-batch df rows (term, df, max_tf, dft, gen, dpfx) — df
    * counted from the same posting rows the batch writes, so dfs and
    * postings can never disagree; `dft` (layout v8) is the
    * title-local document count, from the same rows' positions
    * against the boundary the docs rows store. `max_tf` (layout v5) is the term's IMPACT
    * BOUND: the largest tf any posting of this generation carries.
    * [[queryTopKAll]] turns it into a per-term score upper bound
    * (µ-score at tf = dl = max_tf — valid because the µ-score rises in
    * tf, falls in dl, and tf ≤ dl in every real posting), so the
    * MaxScore exactness proof reads NO posting list. Deletes write
    * max_tf = 0 rows and reclaim keeps the max of survivors' history —
    * the stored bound can only ever be stale-HIGH, which keeps it a
    * bound (a too-high max_tf costs a fallback, never a wrong answer);
    * migration/redomain rebuilds tighten it back to exact.
    */
  private def dfsRel(tf: DataFrame, docs: DataFrame,
      batchId: Long): DataFrame =
    tf.join(docs.select(col("doc_id"), col("ttl")), Seq("doc_id"))
      .withColumn("intitle",
        expr("size(filter(positions, p -> p < ttl)) > 0"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"),
        max(col("tf")).as("max_tf"),
        sum(when(col("intitle"), lit(1L)).otherwise(lit(0L))).as("dft"))
      .withColumn("gen", lit(batchId))
      .withColumn("dpfx", substring(md5(col("term")), 1, 1))

  /** The per-batch doc-stats rows (doc_id, lt, dl, ttl, dbucket); dl
    * from the posting rows so the two sub-tables can never disagree.
    * `ttl` (layout v7) is taken from `d` when the fold's title
    * normalization supplied it (a real title column), else the
    * positional convention min(dl, titleTokens).
    */
  private def docsRel(d: DataFrame, tf: DataFrame,
      g: Geom = defaultGeom): DataFrame = {
    val hasTtl = d.columns.contains("ttl")
    val keyed = d.filter(col("text").isNotNull)
      .select(Seq(col("doc_id"), lower(col("text")).as("lt")) ++
        (if (hasTtl) Seq(col("ttl")) else Nil): _*)
      .distinct()
    tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      .join(keyed, Seq("doc_id"))
      .withColumn("ttl",
        if (hasTtl) col("ttl")
        else least(col("dl"),
          lit(graft.operators.CorpusOps.titleTokens.toLong)))
      .withColumn("dbucket", pmod(col("doc_id"), lit(g.db)))
      .select(col("doc_id"), col("lt"), col("dl"), col("ttl"),
        col("dbucket"))
  }

  /** Fold one micro-batch of documents into the index. O(batch): the
    * write path never reads accumulated state; corpus constants ride
    * the count markers.
    */
  def applyBatch(spark: SparkSession, stateDir: String, batch: DataFrame,
      batchId: Long): Unit = {
    if (batch.isEmpty) return
    ensureLayout(spark, stateDir)
    val g = geomOf(spark, stateDir)
    // FIELDED fold (layout v7): a batch carrying a real `title`
    // column is indexed as the single token stream title ++ body —
    // title tokens occupy positions 0..ttl−1 — with the per-doc field
    // boundary ttl = |title tokens| stored alongside dl. concat_ws
    // skips NULLs, so a null title degrades to body-only (ttl = 0)
    // and a null body to title-only; only a doc with BOTH null stays
    // out of the corpus (matching the batch face, whose two explodes
    // both produce nothing). Titles are single-space token streams by
    // contract (the shared tokenizer is a whitespace split).
    val b =
      (if (batch.columns.contains("title"))
         batch.select(col("doc_id"),
           when(col("title").isNull && col("text").isNull,
             lit(null).cast("string"))
             .otherwise(concat_ws(" ", col("title"), col("text")))
             .as("text"),
           when(col("title").isNull, lit(0L))
             .otherwise(size(split(lower(col("title")), " ")).cast("long"))
             .as("ttl"))
       else batch.select(col("doc_id"), col("text")))
        .distinct()
    val tf = tfRel(b, g)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val docs = docsRel(b, tf, g)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val stats = docs.agg(count(lit(1)).as("n"),
          coalesce(sum(col("dl")), lit(0L)).as("t"),
          coalesce(sum(col("ttl")), lit(0L)).as("w")).collect()(0)
        // repartition on the dir key before the partitioned write so a
        // generation lands as ONE file per touched dir, not one per
        // (task, dir) — without it a w-task batch writes up to w× the
        // files, and the LSM read amplification bound (≤ G generations
        // per dir) silently becomes ≤ G·w files per dir
        tf.withColumn("ingest", lit(batchId))
          .repartition(spark.sparkContext.defaultParallelism,
            col("tpfx"))
          // doc_id joins the sort (round 12 — block-max pruning): a
          // term's row groups then carry tight disjoint doc_id ranges,
          // so a candidate-id IN pushdown skips the row groups holding
          // none of them (parquet min/max stats ARE the block-max
          // sidecar — no extra metadata table)
          .sortWithinPartitions(col("tpfx"), col("term"), col("doc_id"))
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
        dfsRel(tf, docs, batchId).withColumn("ingest", lit(batchId))
          .repartition(spark.sparkContext.defaultParallelism,
            col("dpfx"))
          .sortWithinPartitions(col("dpfx"), col("term"))
          .write.partitionBy("dpfx", "ingest")
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite").parquet(s"$stateDir/dfs")
        markers(stateDir).write(spark, batchId,
          Seq(stats.getLong(0), stats.getLong(1), stats.getLong(2)))
        LsmIndex.OpLog(stateDir).record(spark, "fold", batchId)
        // a re-delivered batch REPLACES its generation's part files;
        // drop any cached file listing of the sub-tables so a
        // same-session read after the overwrite can't chase deleted
        // files (the session-shared FileStatusCache has no TTL)
        spark.catalog.refreshByPath(s"$stateDir/postings")
        spark.catalog.refreshByPath(s"$stateDir/docs")
        spark.catalog.refreshByPath(s"$stateDir/dfs")
      } finally docs.unpersist()
    } finally tf.unpersist()
    ()
  }

  /** DELETE documents from the index with EXACT retrieval semantics —
    * the right-to-be-forgotten path of a training-data platform.
    * O(deleted), never a scan or rewrite of the index:
    *
    *  1. the ids still alive (candidate-bounded read of existing
    *     tombstones, excluding this delete's own generation so a
    *     retry re-derives from scratch) fetch their (lt, dl) rows
    *     from `docs` — the same bounded verify-read as the dl fetch;
    *  2. their term contributions re-derive from the layout-stable
    *     `lt` via the SHARED tokenizer, and land as NEGATIVE df rows
    *     in the `dfs` sub-table — per-generation df counts are summed
    *     by every query face, so cumulative df, the head-term cap,
    *     and the df-rarest selection are exact the moment the delete
    *     commits (a term whose corpus vanished sums to 0 and is
    *     dropped from selection — without this a ghost term would
    *     outrank real rare terms, see queryTopK's df > 0 filter);
    *  3. a NEGATIVE (−n, −Σdl) count marker keeps N/totdl — and
    *     therefore idf and the dl saturation — exact immediately;
    *  4. tombstone rows record the ids; every query face anti-joins
    *     its candidates against them, so deleted docs never rank even
    *     though their posting bytes persist until a rebuild
    *     ([[migrateState]] applies tombstones physically).
    *
    * Scores over the surviving corpus are therefore bit-identical to
    * an index freshly built WITHOUT the deleted docs (spec-pinned) —
    * not approximately, and not only after compaction.
    *
    * `deleteId ≥ 0` namespaces the operation's generations as
    * `ingest=-(2+deleteId)`: disjoint from fold generations (≥ 0) and
    * the compacted dir (−1), so a delete can never dynamic-overwrite
    * a fold's partitions or marker. Re-delivery of the same deleteId
    * overwrites exactly its own generations — idempotent. Re-delivery
    * AFTER a compaction merged its generation is ALSO safe: compaction
    * physically reclaims ([[compactState]]), so the re-delivered
    * delete finds no docs rows for its ids and subtracts nothing.
    *
    * Returns the number of documents newly deleted.
    */
  def deleteDocs(spark: SparkSession, stateDir: String, ids: DataFrame,
      deleteId: Long): Long = {
    require(deleteId >= 0, s"deleteId must be >= 0, got $deleteId")
    ensureLayout(spark, stateDir)
    val g = geomOf(spark, stateDir)
    val gen = -(2L + deleteId)
    val want = ids.select(col("doc_id")).distinct()
    // already-tombstoned ids (by OTHER operations) contribute nothing:
    // a second delete of the same doc must not subtract its stats
    // twice. This delete's own generation is excluded so a retry
    // recomputes its full contribution (its partitions are about to be
    // overwritten anyway).
    val priorTombs = LsmIndex.readOrEmpty(spark, s"$stateDir/tombs",
        tombsSchema)
      .filter(col("ingest") =!= gen).select(col("doc_id")).distinct()
    val alive = want.join(priorTombs, Seq("doc_id"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val idSample = alive.limit(pushdownMax + 1).collect()
        .map(_.getLong(0))
      if (idSample.isEmpty) return 0L
      val docsBase = LsmIndex.readOrEmpty(spark, s"$stateDir/docs",
        docsSchema)
      val doomedRows =
        if (idSample.length <= pushdownMax) {
          val dbs = idSample.map(i => Math.floorMod(i, g.db.toLong))
            .distinct.toSeq
          docsBase.filter(col("dbucket").isin(dbs: _*) &&
            col("doc_id").isin(idSample.toSeq: _*))
        } else {
          docsBase.join(alive, Seq("doc_id"), "left_semi")
        }
      // the stored ttl is the doc's true field boundary (v7);
      // pre-v7 rows coalesce to the positional convention they were
      // folded under, so the negative marker subtracts exactly what
      // the fold once added
      val doomed = doomedRows.select(col("doc_id"), col("lt"), col("dl"),
          coalesce(col("ttl"), least(col("dl"),
            lit(graft.operators.CorpusOps.titleTokens.toLong)))
            .as("ttl"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val stats = doomed.agg(count(lit(1)).as("n"),
          coalesce(sum(col("dl")), lit(0L)).as("t"),
          coalesce(sum(col("ttl")), lit(0L)).as("w")).collect()(0)
        val n = stats.getLong(0)
        if (n == 0L) return 0L
        // TOMBSTONES FIRST (ADVICE r10): the safety-relevant half of
        // the delete — the doc stops ranking — must hold at every
        // crash point. Writing the stat-side (negative dfs rows,
        // negative marker) before the tombstones left a window where
        // the forgotten content kept ranking with skewed scores until
        // the delete was re-delivered; this order degrades the other
        // way (doc invisible, stats briefly over-counting the corpus —
        // conservative), and the retry path tolerates either order
        // (own-generation exclusion above).
        doomed.select(col("doc_id"))
          .withColumn("dbucket", pmod(col("doc_id"), lit(g.db)))
          .withColumn("ingest", lit(gen))
          .repartition(spark.sparkContext.defaultParallelism,
            col("dbucket"))
          .sortWithinPartitions(col("dbucket"), col("doc_id"))
          .write.partitionBy("dbucket", "ingest")
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite").parquet(s"$stateDir/tombs")
        // negative df rows from the deleted docs' own term sets (lt is
        // layout-stable and the tokenizer shared, so these are exactly
        // the contributions their fold once added)
        val negDfs = tfRel(doomed.select(col("doc_id"),
            col("lt").as("text")), g)
          .join(doomed.select(col("doc_id"), col("ttl")), Seq("doc_id"))
          .withColumn("intitle",
            expr("size(filter(positions, p -> p < ttl)) > 0"))
          .groupBy(col("term")).agg((-count(lit(1))).as("df"),
            (-sum(when(col("intitle"), lit(1L)).otherwise(lit(0L))))
              .as("dft"))
          // max_tf = 0: a delete row never LOWERS the stored impact
          // bound (max over gens) — stale-high is safe, see dfsRel
          .withColumn("max_tf", lit(0L))
          .withColumn("gen", lit(gen))
          .withColumn("dpfx", substring(md5(col("term")), 1, 1))
        negDfs.withColumn("ingest", lit(gen))
          .repartition(spark.sparkContext.defaultParallelism, col("dpfx"))
          .sortWithinPartitions(col("dpfx"), col("term"))
          .write.partitionBy("dpfx", "ingest")
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite").parquet(s"$stateDir/dfs")
        markers(stateDir).write(spark, gen,
          Seq(-n, -stats.getLong(1), -stats.getLong(2)))
        LsmIndex.OpLog(stateDir).record(spark, "del", deleteId)
        spark.catalog.refreshByPath(s"$stateDir/dfs")
        spark.catalog.refreshByPath(s"$stateDir/tombs")
        n
      } finally doomed.unpersist()
    } finally alive.unpersist()
  }

  /** RETENTION EXPIRY: delete every indexed doc with id ≤ `maxId` —
    * ids are monotone with arrival order (the HiWater-enforced ingest
    * contract), so an id watermark IS a retention watermark. The
    * enumerate read is this state's own `docs` sub-table with the
    * `doc_id <= maxId` predicate pushed to parquet — files are
    * doc_id-sorted within each dbucket partition, so row-group min/max
    * stats exclude everything above the cutoff. Delegates to
    * [[deleteDocs]] (same tombstone/negative-stat/idempotence
    * contract). Returns the number newly expired.
    */
  def deleteThrough(spark: SparkSession, stateDir: String, maxId: Long,
      deleteId: Long): Long = {
    ensureLayout(spark, stateDir)
    deleteDocs(spark, stateDir,
      LsmIndex.readOrEmpty(spark, s"$stateDir/docs", docsSchema)
        .filter(col("doc_id") <= maxId).select(col("doc_id")),
      deleteId)
  }

  /** SNAPSHOT the index AS OF a ledger sequence number: materialize a
    * new, fully self-contained state root holding exactly the
    * generations of operations with `seq ≤ asOfSeq` — the
    * reproducibility pin a training platform needs ("the corpus the
    * run trained on"), addressable by one number. Every query face
    * works unchanged over the snapshot because it IS a valid state
    * root; answers are bit-identical to the live index at that moment
    * (spec-pinned: a snapshot taken before a delete still answers with
    * the later-deleted doc; one taken after does not).
    *
    * Mechanics: generation dirs are IMMUTABLE once their operation
    * commits, so a snapshot is a pure byte copy of the selected
    * `ingest=` dirs (plus the matching count/hiwater marker files,
    * `_LAYOUT`, and the ledger prefix) — no Spark job, no rewrite; on
    * a real DFS this is a server-side copy or reflink of O(selected
    * bytes). Compactions are epoch barriers: they merge earlier
    * generations into `ingest=-1` (and consolidate the markers), so a
    * snapshot BEFORE the latest barrier is unaddressable and fails
    * fast — take snapshots before compacting, or compact less often
    * than you pin.
    */
  def snapshotTo(spark: SparkSession, stateDir: String, destDir: String,
      asOfSeq: Long): Unit = {
    ensureLayout(spark, stateDir)
    LsmIndex.snapshot(spark, stateDir, destDir, asOfSeq, subTables,
      Seq("ncount", "hiwater"))
  }

  /** Candidate-bounded (doc_id, dl) fetch from the docs sub-table —
    * doc_id IN + dbucket dir pruning when the id set samples under
    * [[pushdownMax]], a distributed semi-join (still dbucket-pruned)
    * above it. ONE definition shared by [[queryTopK]] and
    * [[queryTopKAll]], so a pushdown fix cannot reach one face and
    * miss the other.
    */
  private def dlFor(spark: SparkSession, stateDir: String, g: Geom,
      ids: DataFrame, gens: Option[Set[Long]],
      withTtl: Boolean = false): DataFrame = {
    val idSample = ids.limit(pushdownMax + 1).collect().map(_.getLong(0))
    val docsBase = gens.foldLeft(
      LsmIndex.readOrEmpty(spark, s"$stateDir/docs", docsSchema))(
      (d, gg) => d.filter(col("ingest").isin(gg.toSeq: _*)))
    val dlSide =
      if (idSample.length <= pushdownMax) {
        val dbs = idSample.map(i => Math.floorMod(i, g.db.toLong))
          .distinct.toSeq
        docsBase.filter(col("dbucket").isin(dbs: _*) &&
          col("doc_id").isin(idSample.toSeq: _*))
      } else {
        val dbs = ids
          .select(pmod(col("doc_id"), lit(g.db)).as("dbucket"))
          .distinct().collect().map(_.getLong(0)).toSeq // ≤ db
        docsBase.filter(col("dbucket").isin(dbs: _*))
          .join(ids, Seq("doc_id"), "left_semi")
      }
    // the fielded face's extra column rides the same pruned read;
    // pre-v7 rows coalesce to the positional convention (ttl = null
    // in their files)
    dlSide.select(Seq(col("doc_id"), col("dl")) ++
        (if (withTtl)
           Seq(coalesce(col("ttl"), least(col("dl"),
             lit(graft.operators.CorpusOps.titleTokens.toLong)))
             .as("ttl"))
         else Nil): _*)
      .distinct()
  }

  /** Drop tombstoned doc_ids from a relation — the query faces'
    * candidate exclusion. One distributed anti-join keyed doc_id
    * against the O(deleted) tombstone relation (broadcast when small,
    * shuffled when not — never a driver loop); skipped entirely while
    * no tombstone exists (the common case costs one driver-side dir
    * listing).
    */
  private def minusTombs(spark: SparkSession, stateDir: String,
      rel: DataFrame, gens: Option[Set[Long]] = None): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$stateDir/tombs")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) rel
    else {
      // as-of reads exclude tombstones of deletes AFTER the pinned seq
      // — a doc deleted later must still answer at the pin
      val tombs = gens.foldLeft(
        spark.read.schema(tombsSchema).parquet(p.toString))(
        (t, g) => t.filter(col("ingest").isin(g.toSeq: _*)))
      rel.join(tombs.select(col("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
    }
  }

  /** Ranked BM25 retrieval over the accumulated index: for each query
    * (query_id, text), the top-k indexed documents under the batch
    * face's exact scoring — (query_id, rank, doc_id, score_micro,
    * n_terms), bit-identical to CorpusOps.bm25TopkOn over the same
    * corpus.
    *
    * Read shape (round 10 — selection BEFORE fetch): per-term df comes
    * from the vocabulary-sized `dfs` sub-table (dir-pruned + term IN
    * pushdown), so term selection and the head-term cap
    * (CorpusOps.bm25CapOk) run before ANY posting list is opened.
    * Posting I/O then covers only the SELECTED ≤ bm25QueryTerms terms
    * per query — never a capped stopword's head lists — and is pruned
    * to exactly the (tpfx, ingest) generation dirs the selected terms'
    * dfs rows name (plus each tpfx's compacted `ingest=-1` dir): an
    * exact generation shortlist with zero false positives, where a
    * bloom sidecar would be probabilistic. dl fetch stays
    * candidate-bounded on the docs sub-table, and the corpus constants
    * come from the markers — O(generations) driver file reads.
    */
  /** `asOf` (round 11 — the NATIVE as-of read): a ledger seq to answer
    * at, WITHOUT materializing a snapshot copy. Generations of later
    * operations are filtered out of every read in place — the dfs/
    * posting/docs fetches by their `ingest` partition value, the
    * corpus-constant markers by generation, and tombstones of LATER
    * deletes are ignored so a doc deleted after the pin still answers
    * — under exactly [[LsmIndex.gensAsOf]]'s addressability contract
    * (fail-fast past a compaction/migration barrier). Answers are
    * bit-identical to `snapshotTo(seq)` + query (spec-pinned), at zero
    * copy cost: the right tool for ad-hoc historical queries, with
    * snapshots reserved for long-lived reproducibility roots.
    */
  def queryTopK(spark: SparkSession, stateDir: String,
      queries: DataFrame, asOf: Option[Long] = None,
      allow: Option[DataFrame] = None): DataFrame = {
    ensureLayout(spark, stateDir)
    val g = geomOf(spark, stateDir)
    val gens = asOf.map(seq => LsmIndex.gensAsOf(spark, stateDir, seq))
    val st = markers(stateDir).stored(spark, gens)
    val nDocs = if (st.nonEmpty) st.head else 0L
    val totDl = if (st.size > 1) st(1) else 0L
    def emptyOut = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("query_id", LongType),
        StructField("rank", IntegerType, nullable = false),
        StructField("doc_id", LongType),
        StructField("score_micro", LongType),
        StructField("n_terms", LongType, nullable = false))))
    // ZERO-CORPUS GUARD (ADVICE r9): empty markers (empty state, or the
    // bounded consolidation-crash window) must NOT score with
    // n_docs=0/totdl=0 — the integer division nulls out term_micro and
    // ranked rows would still emit with meaningless scores. Answer
    // empty instead, the gates' conservative-degrade contract.
    if (nDocs <= 0L || totDl <= 0L) return emptyOut
    // cache lifecycle is CALLER-OWNED (the Verify/Bench convention —
    // clearCache() between queries): q feeds the sample collect AND
    // the selection join; dfsR feeds the df totals AND the generation
    // shortlist; selected feeds the shortlist collect AND the posting
    // join; hits feeds the candidate-id collect AND the scoring join.
    // The returned DataFrame is the LIVE retrieval plan (inspectable
    // by PlanHygieneSpec), not a checkpointed copy.
    val q = queries.filter(col("text").isNotNull)
      .select(col("query_id"),
        explode(array_distinct(
          graft.operators.CorpusOps.bm25Tokens(col("text")))).as("term"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val termSample = q.select(col("term")).distinct()
      .limit(pushdownMax + 1).collect().map(_.getString(0))
    if (termSample.isEmpty) return emptyOut
    // STEP 1 — df fetch from the dfs sub-table (vocabulary grain, two
    // small columns): selection and capping run BEFORE any posting
    // list is opened.
    val dfsR = dfsRowsFor(spark, stateDir,
      q.select(col("term")).distinct(), termSample, gens)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // df > 0: per-generation counts include deletes' NEGATIVE rows; a
    // term whose corpus was entirely deleted sums to 0 and must leave
    // selection entirely — df-asc ranking would otherwise hand the
    // ghost term a slot a surviving rare term deserves
    val dfT = dfsR.groupBy(col("term")).agg(sum(col("df")).as("df"))
      .filter(col("df") > 0)
    // STEP 2 — selection + head-term cap, BEFORE any posting I/O
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("df").asc, col("term").asc)
    val selected = q.join(dfT, Seq("term"))
      .filter(graft.operators.CorpusOps.bm25CapOk(col("df"), lit(nDocs)))
      .withColumn("trank", row_number().over(wq))
      .filter(col("trank") <= graft.operators.CorpusOps.bm25QueryTerms)
      .select(col("term"), col("query_id"), col("df"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // STEP 3 — the exact (term → generations) posting-dir shortlist
    val selPairs = selected.select(col("term")).distinct()
      .join(dfsR, Seq("term"))
      .select(col("term"), col("gen")).distinct()
      .limit(pushdownMax + 1).collect()
    // every query term absent from the vocabulary or capped as a head
    // term: answer empty with ZERO posting reads (the all-stopword
    // query is exactly this path)
    if (selPairs.isEmpty) return emptyOut
    // distinct: a batch re-delivered after compaction merged its
    // generation may have left duplicate posting rows. The projection
    // here column-prunes the v3 positions payload OUT of the parquet
    // read — bag-of-words scoring never pays for the positional index
    // (spec-pinned on the ReadSchema).
    val post = minusTombs(spark, stateDir,
      postingsFor(spark, stateDir, selPairs,
          selected.select(col("term")).distinct(), gens, g)
        .select(col("term"), col("doc_id"), col("tf"))
        .distinct(), gens)
    rankBm25Hits(spark, stateDir, g, gens, selected, post,
      nDocs, totDl, allow)
  }

  /** The BM25 scoring tail shared by [[queryTopK]] and the hybrid
    * shared-fetch face ([[queryHybridParts]]): allow-filter the
    * posting hits, fetch dl candidate-bounded, score in exact µ-units,
    * rank top-[[graft.operators.CorpusOps.bm25K]].
    *
    * FILTERED RETRIEVAL (round 11 — the sparse twin of VecDupStream's
    * allow sets): only doc_ids IN the allow relation may rank, applied
    * to the posting hits BEFORE ranking and before the dl fetch (the
    * allow set SHRINKS the candidate read — a tenant-scoped query
    * reads that tenant's dl rows, not the corpus's). Corpus statistics
    * (n_docs, totdl, df-based term selection and the head-term cap)
    * stay WHOLE-INDEX by contract: scores mean the same thing inside
    * and outside the filter, and the ranked list is the unfiltered
    * list's allowed suffix re-ranked — matching the dense leg's
    * semantics.
    */
  private def rankBm25Hits(spark: SparkSession, stateDir: String,
      g: Geom, gens: Option[Set[Long]], selected: DataFrame,
      post: DataFrame, nDocs: Long, totDl: Long,
      allow: Option[DataFrame]): DataFrame = {
    val hits = allow.foldLeft(selected.join(post, Seq("term")))(
        (h, a) => h.join(a.select(col("doc_id")).distinct(),
          Seq("doc_id"), "left_semi"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val candIds = hits.select(col("doc_id")).distinct()
    val dl = dlFor(spark, stateDir, g, candIds, gens)
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

  /** ONE posting fetch serving BOTH legs of a hybrid sparse+proximity
    * query (round 12 — the r11 verdict's named lever on
    * hybrid_prox_topk): [[queryTopK]] and [[queryNear]] previously
    * fetched the same dfs-shortlisted postings twice, once projecting
    * tf and once positions. Here the (term, gen) shortlist covers the
    * UNION of the BM25-selected terms and the query's leading phrase
    * terms, the postings read projects both payloads, and the
    * persisted relation feeds the BM25 scoring tail and the proximity
    * rank core. Results are bit-identical to running the two faces
    * separately (spec-pinned): the scoring chains are shared
    * definitions, only the fetch is consolidated. Returns
    * (bm25 top-k, proximity top-k).
    */
  def queryHybridParts(spark: SparkSession, stateDir: String,
      queries: DataFrame,
      len: Int = graft.operators.CorpusOps.phraseLen,
      sloppy: Boolean = true,
      asOf: Option[Long] = None): (DataFrame, DataFrame) = {
    ensureLayout(spark, stateDir)
    val g = geomOf(spark, stateDir)
    val gens = asOf.map(seq => LsmIndex.gensAsOf(spark, stateDir, seq))
    val ops = graft.operators.CorpusOps
    val st = markers(stateDir).stored(spark, gens)
    val nDocs = if (st.nonEmpty) st.head else 0L
    val totDl = if (st.size > 1) st(1) else 0L
    def emptySparse = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("query_id", LongType),
        StructField("rank", IntegerType, nullable = false),
        StructField("doc_id", LongType),
        StructField("score_micro", LongType),
        StructField("n_terms", LongType, nullable = false))))
    def emptyProx =
      emptyRanked(spark, if (sloppy) "sloppy_micro" else "min_span")
    if (nDocs <= 0L || totDl <= 0L) return (emptySparse, emptyProx)
    val q = queries.filter(col("text").isNotNull)
      .select(col("query_id"),
        explode(array_distinct(ops.bm25Tokens(col("text")))).as("term"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the proximity leg's slot rows — [[phrasePosRows]]'s exact query
    // shape (ordered NEAR: no distinct-terms contract)
    val qp = queries.filter(col("text").isNotNull)
      .filter(size(ops.bm25Tokens(col("text"))) >= len)
      .select(col("query_id"),
        posexplode(ops.phraseTerms(col("text"), len)).as(Seq("i", "term")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val termSample = q.select(col("term")).distinct()
      .limit(pushdownMax + 1).collect().map(_.getString(0))
    if (termSample.isEmpty) return (emptySparse, emptyProx)
    val dfsR = dfsRowsFor(spark, stateDir,
      q.select(col("term")).distinct(), termSample, gens)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfT = dfsR.groupBy(col("term")).agg(sum(col("df")).as("df"))
      .filter(col("df") > 0)
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("df").asc, col("term").asc)
    val selected = q.join(dfT, Seq("term"))
      .filter(ops.bm25CapOk(col("df"), lit(nDocs)))
      .withColumn("trank", row_number().over(wq))
      .filter(col("trank") <= ops.bm25QueryTerms)
      .select(col("term"), col("query_id"), col("df"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // fetch universe = BM25-selected ∪ phrase terms: a head term the
    // cap excluded from scoring still fetches when the proximity leg
    // needs its positions (phrase terms carry no df selection — the
    // exact contract of the standalone positional faces)
    val fetchTerms = selected.select(col("term"))
      .union(qp.select(col("term"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val selPairs = fetchTerms.join(dfsR, Seq("term"))
      .select(col("term"), col("gen")).distinct()
      .limit(pushdownMax + 1).collect()
    if (selPairs.isEmpty) return (emptySparse, emptyProx)
    val post = minusTombs(spark, stateDir,
      postingsFor(spark, stateDir, selPairs, fetchTerms, gens, g)
        .select(col("term"), col("doc_id"), col("tf"), col("positions"))
        .distinct(), gens)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // distinct AFTER the tf projection: two generations can carry the
    // same (term, doc_id, tf) with different positions payloads (a doc
    // re-folded with reordered text) — queryTopK's 3-column distinct
    // collapses them, so the shared leg must too or that term would
    // double-count
    val sparse = rankBm25Hits(spark, stateDir, g, gens, selected,
      post.select(col("term"), col("doc_id"), col("tf")).distinct(),
      nDocs, totDl, None)
    val posRows = qp.join(post, Seq("term"))
      .select(col("query_id"), col("doc_id"), col("i"),
        explode(col("positions")).as("pos"))
    (sparse, ops.nearRank(posRows, len, sloppy))
  }

  /** Full-query EXACT BM25 over the accumulated index — the
    * incremental twin of CorpusOps.bm25FullTopkOn: EVERY uncapped
    * query term scores (not just the df-rarest [[graft.operators
    * .CorpusOps.bm25QueryTerms]]), with MaxScore pruning whose proof
    * obligation reads NO posting list:
    *
    *  - the `dfs` sub-table (layout v5) stores each term's IMPACT
    *    BOUND `max_tf` next to its df, maintained by the fold for
    *    free; ub(term) = µ-score at tf = dl = max_tf (valid since the
    *    µ-score rises in tf, falls in dl, and tf ≤ dl in any posting;
    *    deletes/reclaim only ever leave the bound stale-HIGH — a
    *    fallback trigger, never a wrong answer);
    *  - candidates come from the essential (df-rarest) terms' postings
    *    — the same generation-shortlisted, tombstone-anti-joined fetch
    *    as [[queryTopK]]; non-essential postings join candidate-
    *    restricted, so the scoring shuffle is candidate-volume;
    *  - a query whose non-essential bounds could reach its k-th
    *    candidate score falls back to unrestricted ranking over its
    *    posting hits (exact by construction).
    *
    * Answers are bit-identical to the batch face over the same corpus
    * (shared tokenizer/cap/scoring/k definitions) and therefore to the
    * full-scoring oracle SQL.
    */
  /** `asOf` and `allow` carry [[queryTopK]]'s exact contracts: as-of
    * filters generations in place under the ledger's addressability
    * rules, and an allow set restricts the RANKED universe (applied to
    * the posting hits before candidates, ranking, and the dl fetch)
    * while corpus statistics — df, the cap, n_docs/totdl, the impact
    * bounds — stay whole-index. The MaxScore proof still holds
    * filtered: a non-candidate ALLOWED doc contains no essential term,
    * so its score is bounded by the same non-essential ub sum, checked
    * against the k-th ALLOWED candidate.
    */
  def queryTopKAll(spark: SparkSession, stateDir: String,
      queries: DataFrame, asOf: Option[Long] = None,
      allow: Option[DataFrame] = None): DataFrame = {
    ensureLayout(spark, stateDir)
    val g = geomOf(spark, stateDir)
    val gens = asOf.map(seq => LsmIndex.gensAsOf(spark, stateDir, seq))
    val st = markers(stateDir).stored(spark, gens)
    val nDocs = if (st.nonEmpty) st.head else 0L
    val totDl = if (st.size > 1) st(1) else 0L
    def emptyOut = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("query_id", LongType),
        StructField("rank", IntegerType, nullable = false),
        StructField("doc_id", LongType),
        StructField("score_micro", LongType),
        StructField("n_terms", LongType, nullable = false))))
    if (nDocs <= 0L || totDl <= 0L) return emptyOut
    val q = queries.filter(col("text").isNotNull)
      .select(col("query_id"),
        explode(array_distinct(
          graft.operators.CorpusOps.bm25Tokens(col("text")))).as("term"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val termSample = q.select(col("term")).distinct()
      .limit(pushdownMax + 1).collect().map(_.getString(0))
    if (termSample.isEmpty) return emptyOut
    val dfsR = dfsRowsFor(spark, stateDir,
      q.select(col("term")).distinct(), termSample, gens)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // cumulative df + the stored impact bound, per live term
    val dfT = dfsR.groupBy(col("term"))
      .agg(sum(col("df")).as("df"), max(col("max_tf")).as("max_tf"))
      .filter(col("df") > 0)
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("df").asc, col("term").asc)
    // EVERY uncapped query term, essentialness ranked by df
    val qsel = q.join(dfT, Seq("term"))
      .filter(graft.operators.CorpusOps.bm25CapOk(col("df"), lit(nDocs)))
      .withColumn("trank", row_number().over(wq))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val essSel = qsel
      .filter(col("trank") <= graft.operators.CorpusOps.bm25QueryTerms)
      .select(col("term"), col("query_id"), col("df"), col("trank"))
    val nonSel = qsel
      .filter(col("trank") > graft.operators.CorpusOps.bm25QueryTerms)
      .select(col("term"), col("query_id"), col("df"), col("trank"))
    def allowed(h: DataFrame): DataFrame =
      allow.foldLeft(h)((x, a) =>
        x.join(a.select(col("doc_id")).distinct(),
          Seq("doc_id"), "left_semi"))
    def pairsOf(sel: DataFrame): Array[org.apache.spark.sql.Row] =
      sel.select(col("term")).distinct()
        .join(dfsR, Seq("term"))
        .select(col("term"), col("gen")).distinct()
        .limit(pushdownMax + 1).collect()
    // ESSENTIAL fetch: the df-rarest terms' full postings — the
    // candidate source, never doc-restricted
    val essPairs = pairsOf(essSel)
    if (essPairs.isEmpty) return emptyOut
    val postEss = minusTombs(spark, stateDir,
      postingsFor(spark, stateDir, essPairs,
          essSel.select(col("term")).distinct(), gens, g)
        .select(col("term"), col("doc_id"), col("tf"))
        .distinct(), gens)
    val hitsEss = allowed(essSel.join(postEss, Seq("term")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // candidate universe: docs holding >=1 essential term
    val cand = hitsEss
      .select(col("query_id"), col("doc_id")).distinct()
    // BLOCK-MAX candidate pushdown (round 12, ROADMAP item): the
    // NON-essential (frequent) terms' postings join candidate-
    // restricted, and when the candidate ids sample under the pushdown
    // cap they reach the posting scan as a doc_id IN predicate — the
    // write-side (tpfx, term, doc_id) sort gives each term's row
    // groups tight disjoint doc_id ranges, so parquet's min/max stats
    // skip every row group holding no candidate (the stats ARE the
    // block-max sidecar; no extra metadata table, maintained by the
    // writer for free). The per-query exact rule stays the semi-join
    // below — the IN is a superset filter, never the semantics.
    val candIdArr = cand.select(col("doc_id")).distinct()
      .limit(pushdownMax + 1).collect().map(_.getLong(0))
    val nonPairs = pairsOf(nonSel)
    def nonHits(restrict: Boolean): DataFrame = {
      val raw = postingsFor(spark, stateDir, nonPairs,
        nonSel.select(col("term")).distinct(), gens, g)
      val pruned =
        if (restrict && candIdArr.length <= pushdownMax)
          raw.filter(col("doc_id").isin(candIdArr.toSeq: _*))
        else raw
      allowed(nonSel.join(
        minusTombs(spark, stateDir,
          pruned.select(col("term"), col("doc_id"), col("tf"))
            .distinct(), gens), Seq("term")))
    }
    val hitsMain =
      (if (nonPairs.isEmpty) hitsEss
       else hitsEss.unionByName(nonHits(restrict = true)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // dl fetch SPLIT (round 12 — r11 verdict item 7): the MAIN branch
    // fetches dl for the CANDIDATE ids only; the fallback branch —
    // when a query actually falls back — fetches its own posting-hit
    // universe separately below. One shared hit-grain fetch would
    // widen the common (zero-fallback) case to posting volume: a
    // frequent non-essential term's hits are posting-grain, its
    // candidates essential-grain.
    val dlMain = dlFor(spark, stateDir, g,
      cand.select(col("doc_id")).distinct(), gens)
    def scoreRank(hits: DataFrame, dl: DataFrame): DataFrame = {
      val wd = Window.partitionBy(col("query_id"))
        .orderBy(col("score_micro").desc, col("doc_id").asc)
      hits.repartition(col("doc_id")).join(dl, Seq("doc_id"))
        .withColumn("n_docs", lit(nDocs))
        .withColumn("totdl", lit(totDl))
        .withColumn("term_micro",
          expr(graft.operators.CorpusOps.bm25TermMicroExpr))
        .groupBy(col("query_id"), col("doc_id"))
        .agg(sum(col("term_micro")).as("score_micro"),
          count(lit(1)).as("n_terms"))
        .withColumn("rank", row_number().over(wd))
    }
    // the candidate semi-join must not shuffle the posting hits: a
    // frequent non-essential term's hits are posting-volume, and an
    // SMJ semi-join would pay their full shuffle write before AQE
    // could flip strategy. Candidates are essential-posting-bounded,
    // so when they sample under the pushdown cap (the common case —
    // queries × Σ df(essential)), BROADCAST them and the big side
    // streams map-side; the distributed join stays as the fallback
    // at any candidate volume. Same discipline as the dl fetch.
    val candSide =
      if (candIdArr.length <= pushdownMax) broadcast(cand) else cand
    val ranked = scoreRank(
      hitsMain.join(candSide, Seq("query_id", "doc_id"), "left_semi"),
      dlMain)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val kth = ranked
      .filter(col("rank") === graft.operators.CorpusOps.bm25K)
      .select(col("query_id"), col("score_micro").as("kth_micro"))
    // the per-query proof obligation, from dfs metadata alone:
    // ub(term) = µ-score at tf = dl = max_tf
    val sumUb = qsel
      .filter(col("trank") > graft.operators.CorpusOps.bm25QueryTerms)
      .select(col("query_id"), col("df"),
        col("max_tf").as("tf"), col("max_tf").as("dl"))
      .withColumn("n_docs", lit(nDocs))
      .withColumn("totdl", lit(totDl))
      .withColumn("ub_micro",
        expr(graft.operators.CorpusOps.bm25TermMicroExpr))
      .groupBy(col("query_id")).agg(sum(col("ub_micro")).as("sum_ub"))
    val fb = sumUb.join(kth, Seq("query_id"), "left")
      .filter(col("kth_micro").isNull ||
        col("sum_ub") >= col("kth_micro"))
      .select(col("query_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cols = Seq(col("query_id"), col("rank"), col("doc_id"),
      col("score_micro"), col("n_terms"))
    val mainTop = ranked
      .join(broadcast(fb), Seq("query_id"), "left_anti")
      .filter(col("rank") <= graft.operators.CorpusOps.bm25K)
      .select(cols: _*)
    // the fallback branch exists ONLY when a query actually fell back
    // (zero on well-bounded corpora, spec-pinned): its unrestricted
    // re-rank fetches dl over ITS OWN posting-hit universe, so a
    // fallback-heavy workload widens its own read, never the main
    // branch's candidate-bounded fetch. The ≤-queries-row collect is
    // the branch decision, not a data read.
    if (fb.limit(1).collect().isEmpty) mainTop
    else {
      // the fallback's unrestricted universe: essential hits carry no
      // doc restriction already; the non-essential postings re-fetch
      // WITHOUT the candidate pushdown (only here — a fallback-heavy
      // workload widens its own read, never the main branch's)
      val hitsFb =
        (if (nonPairs.isEmpty) hitsEss
         else hitsEss.unionByName(nonHits(restrict = false)))
          .join(broadcast(fb), Seq("query_id"), "left_semi")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val dlFb = dlFor(spark, stateDir, g,
        hitsFb.select(col("doc_id")).distinct(), gens)
      mainTop.unionByName(scoreRank(hitsFb, dlFb)
        .filter(col("rank") <= graft.operators.CorpusOps.bm25K)
        .select(cols: _*))
    }
  }

  /** Boolean retrieval (MUST / MUST NOT) over the accumulated index —
    * the incremental twin of CorpusOps.boolTopkOn, bit-identical by
    * shared definitions (tokenizer, cap, trank derivation, µ-score,
    * k). Read shape: the derivation runs on the vocabulary-grain `dfs`
    * sub-table BEFORE any posting I/O; the conjunction fetches only
    * the [[graft.operators.CorpusOps.boolMustTerms]] rarest terms'
    * generation-shortlisted postings and intersects them with ONE
    * `HAVING count = n` aggregation (candidate volume ≤ the shorter
    * list); the MUST NOT term's postings fetch term-pruned the same
    * way (a stopword exclusion pays its named posting volume — the
    * boolean faces carry NO head-term cap, see the batch face) and
    * drops candidates with one left-anti join. `asOf` carries
    * [[queryTopK]]'s exact contract.
    */
  def queryBool(spark: SparkSession, stateDir: String,
      queries: DataFrame, asOf: Option[Long] = None): DataFrame = {
    ensureLayout(spark, stateDir)
    val g = geomOf(spark, stateDir)
    val gens = asOf.map(seq => LsmIndex.gensAsOf(spark, stateDir, seq))
    val st = markers(stateDir).stored(spark, gens)
    val nDocs = if (st.nonEmpty) st.head else 0L
    val totDl = if (st.size > 1) st(1) else 0L
    def emptyOut = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("query_id", LongType),
        StructField("rank", IntegerType, nullable = false),
        StructField("doc_id", LongType),
        StructField("score_micro", LongType),
        StructField("n_terms", LongType, nullable = false))))
    if (nDocs <= 0L || totDl <= 0L) return emptyOut
    val q = queries.filter(col("text").isNotNull)
      .select(col("query_id"),
        explode(array_distinct(
          graft.operators.CorpusOps.bm25Tokens(col("text")))).as("term"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val termSample = q.select(col("term")).distinct()
      .limit(pushdownMax + 1).collect().map(_.getString(0))
    if (termSample.isEmpty) return emptyOut
    val dfsR = dfsRowsFor(spark, stateDir,
      q.select(col("term")).distinct(), termSample, gens)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfT = dfsR.groupBy(col("term")).agg(sum(col("df")).as("df"))
      .filter(col("df") > 0)
    // NO head-term cap here: boolean operators are filters the user
    // asked for by name (CorpusOps.boolTopkOn — same contract as the
    // phrase face, which also answers stopword phrases)
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("df").asc, col("term").asc)
    val qsel = q.join(dfT, Seq("term"))
      .withColumn("trank", row_number().over(wq))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mustN = graft.operators.CorpusOps.boolMustTerms
    val must = qsel.filter(col("trank") <= mustN)
      .select(col("term"), col("query_id"), col("df"))
    val mustNot = qsel.filter(col("trank") === mustN + 1)
      .select(col("term"), col("query_id"))
    // RAREST-MUST candidate pushdown (round 12, the conjunction twin
    // of the positional faces' two-phase fetch): a conjunction match
    // holds EVERY must term, so docs holding some query's RAREST must
    // term bound the other must terms' read — engaged by the same
    // df-ratio cost rule, decided from vocabulary-grain dfs rows
    // before any posting I/O. The HAVING count = mustN aggregation
    // stays the exact rule; the IN is a superset filter.
    // ONE collect of dfsR's EXACT rows serves the (term, gen) dir
    // shortlists of every fetch below AND the df values the prune
    // decision needs. dfMap sums the SAME (term, df, max_tf, gen)
    // projection the trank window's dfT sums (ADVICE r12): a narrower
    // (term, gen, df)-distinct here would single-count a (term, gen)
    // that ever carried two rows with equal df but different max_tf,
    // the driver-picked must set would stop matching the window's
    // trank<=mustN terms, and an engaged fetch would omit a must
    // term's postings — conjunctions silently returning no matches.
    val selRows = dfsR.limit(pushdownMax + 1).collect()
    if (selRows.isEmpty) return emptyOut
    val dfComplete = selRows.length <= pushdownMax
    val dfMap = selRows.toSeq
      .map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sum }
      .filter(_._2 > 0)
    def fetchBool(terms: DataFrame,
        pairs: Array[org.apache.spark.sql.Row], projCols: Seq[Column],
        docFilter: Option[Array[Long]]): DataFrame = {
      if (pairs.isEmpty) return null
      val raw = postingsFor(spark, stateDir, pairs, terms, gens, g)
      minusTombs(spark, stateDir,
        docFilter.filter(_.length <= pushdownMax)
          .foldLeft(raw)((r, ids) =>
            r.filter(col("doc_id").isin(ids.toSeq: _*)))
          .select(projCols: _*).distinct(), gens)
    }
    def pairsFor(ts: Set[String]): Array[org.apache.spark.sql.Row] =
      selRows.filter(r => ts(r.getString(0)) && dfMap.contains(r.getString(0)))
        .map(r => org.apache.spark.sql.Row(r.getString(0), r.getLong(3)))
        .distinct
    val tfCols = Seq(col("term"), col("doc_id"), col("tf"))
    import spark.implicits._
    // the rare/must split DRIVER-side over one bounded pair collect
    // (the same (df asc, term asc) rule the trank window uses) — no
    // Spark job is spent deciding not to engage
    val qPairRows = q.select(col("query_id"), col("term")).distinct()
      .limit(pushdownMax + 1).collect()
    val pairsComplete = qPairRows.length <= pushdownMax
    val perQuery: Map[Long, Seq[String]] =
      if (!pairsComplete || !dfComplete) Map.empty
      else qPairRows.toSeq
        .map(r => (r.getLong(0), r.getString(1)))
        .filter(p => dfMap.contains(p._2))
        .groupBy(_._1)
        .map { case (qid, ps) =>
          qid -> ps.map(_._2).sortBy(t => (dfMap(t), t))
        }
    val rareArr = perQuery.values.flatMap(_.headOption)
      .toArray.distinct
    val mustTermArr = perQuery.values.flatMap(_.take(mustN))
      .toArray.distinct
    val restArr = mustTermArr.diff(rareArr)
    val sumRare = rareArr.map(dfMap.getOrElse(_, 0L)).sum
    val sumRest = restArr.map(dfMap.getOrElse(_, 0L)).sum
    val engage = restArr.nonEmpty && rareArr.nonEmpty &&
      sumRest > phrasePruneRatio * math.max(1L, sumRare)
    val post =
      if (!engage) {
        // pairs driver-filtered when the collects were complete; the
        // over-cap fallback re-derives them with one bounded job
        val mustPairs =
          if (pairsComplete && dfComplete) pairsFor(mustTermArr.toSet)
          else must.select(col("term")).distinct()
            .join(dfsR, Seq("term"))
            .select(col("term"), col("gen")).distinct()
            .limit(pushdownMax + 1).collect()
        fetchBool(must.select(col("term")).distinct(), mustPairs,
          tfCols, None)
      } else {
        val postRare = fetchBool(rareArr.toSeq.toDF("term"),
          pairsFor(rareArr.toSet), tfCols, None)
        if (postRare == null) null
        else {
          val pr = postRare.persist(
            org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val candIdArr = pr.select(col("doc_id")).distinct()
            .limit(pushdownMax + 1).collect().map(_.getLong(0))
          val postRest = fetchBool(restArr.toSeq.toDF("term"),
            pairsFor(restArr.toSet), tfCols, Some(candIdArr))
          if (postRest == null) pr else pr.unionByName(postRest)
        }
      }
    if (post == null) return emptyOut
    val hits = must.join(post, Seq("term"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val candIds = hits.select(col("doc_id")).distinct()
    val dl = dlFor(spark, stateDir, g, candIds, gens)
    val conj = hits.repartition(col("doc_id")).join(dl, Seq("doc_id"))
      .withColumn("n_docs", lit(nDocs))
      .withColumn("totdl", lit(totDl))
      .withColumn("term_micro",
        expr(graft.operators.CorpusOps.bm25TermMicroExpr))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("term_micro")).as("score_micro"),
        count(lit(1)).as("n_terms"))
      .filter(col("n_terms") === mustN)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the exclusion fetch: term-pruned to the mustNot terms' own
    // generation dirs; empty when no query carries a third eligible
    // term (zero extra posting reads on pure conjunctions). The
    // exclusion only matters for docs IN the conjunction, so its
    // posting read pushes the conjunction's ids down too — a stopword
    // exclusion then reads candidate-grain row groups, never its
    // named posting volume
    val notPairs =
      if (pairsComplete && dfComplete)
        pairsFor(perQuery.values
          .flatMap(_.slice(mustN, mustN + 1)).toSet)
      else mustNot.select(col("term")).distinct()
        .join(dfsR, Seq("term"))
        .select(col("term"), col("gen")).distinct()
        .limit(pushdownMax + 1).collect()
    val kept =
      if (notPairs.isEmpty) conj
      else {
        val conjIdArr = conj.select(col("doc_id")).distinct()
          .limit(pushdownMax + 1).collect().map(_.getLong(0))
        if (conjIdArr.isEmpty) conj
        else {
          val postNot = fetchBool(mustNot.select(col("term")).distinct(),
            notPairs, Seq(col("term"), col("doc_id")),
            Some(conjIdArr))
          conj.join(mustNot.join(postNot, Seq("term"))
              .select(col("query_id"), col("doc_id")),
            Seq("query_id", "doc_id"), "left_anti")
        }
      }
    val wd = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col("doc_id").asc)
    kept.withColumn("rank", row_number().over(wd))
      .filter(col("rank") <= graft.operators.CorpusOps.bm25K)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("score_micro"), col("n_terms"))
  }

  /** Prefix (multi-term expansion) retrieval over the accumulated
    * index — the incremental twin of CorpusOps.prefixTopkOn,
    * bit-identical by shared definitions. Read shape: the seed (each
    * query's rarest in-vocabulary term) resolves on the query's OWN
    * terms' dfs rows; the EXPANSION is a vocabulary-grain dfs read —
    * prefix-pushdown pruned (StringStartsWith reaches the parquet
    * row groups; the fixed-width substring equi-join above it is the
    * exact rule) and NEVER a posting read; then only the selected
    * ≤ max completions' generation-shortlisted postings are fetched,
    * exactly [[queryTopK]]'s fetch/score/rank path. `asOf` carries
    * [[queryTopK]]'s contract.
    */
  def queryPrefix(spark: SparkSession, stateDir: String,
      queries: DataFrame,
      len: Int = graft.operators.CorpusOps.prefixLen,
      max: Int = graft.operators.CorpusOps.prefixExpandMax,
      asOf: Option[Long] = None): DataFrame = {
    ensureLayout(spark, stateDir)
    val g = geomOf(spark, stateDir)
    val gens = asOf.map(seq => LsmIndex.gensAsOf(spark, stateDir, seq))
    val st = markers(stateDir).stored(spark, gens)
    val nDocs = if (st.nonEmpty) st.head else 0L
    val totDl = if (st.size > 1) st(1) else 0L
    def emptyOut = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("query_id", LongType),
        StructField("rank", IntegerType, nullable = false),
        StructField("doc_id", LongType),
        StructField("score_micro", LongType),
        StructField("n_terms", LongType, nullable = false))))
    if (nDocs <= 0L || totDl <= 0L) return emptyOut
    val q = queries.filter(col("text").isNotNull)
      .select(col("query_id"),
        explode(array_distinct(
          graft.operators.CorpusOps.bm25Tokens(col("text")))).as("term"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val termSample = q.select(col("term")).distinct()
      .limit(pushdownMax + 1).collect().map(_.getString(0))
    if (termSample.isEmpty) return emptyOut
    // seed resolution: df ranks over the query's own terms only
    val dfsQ = dfsRowsFor(spark, stateDir,
      q.select(col("term")).distinct(), termSample, gens)
    val dfQ = dfsQ.groupBy(col("term")).agg(sum(col("df")).as("df"))
      .filter(col("df") > 0)
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("df").asc, col("term").asc)
    val seed = q.join(dfQ, Seq("term"))
      .withColumn("trank", row_number().over(wq))
      .filter(col("trank") === 1)
      .select(col("query_id"),
        substring(col("term"), 1, len).as("pfx"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pfxSample = seed.select(col("pfx")).distinct()
      .limit(pushdownMax + 1).collect().map(_.getString(0))
    if (pfxSample.isEmpty) return emptyOut
    // vocabulary-grain expansion on the dfs sub-table: startsWith is
    // the PUSHABLE superset filter (row-group pruning), the
    // fixed-width substring key the exact rule
    val dfsBase = gens.foldLeft(
      LsmIndex.readOrEmpty(spark, s"$stateDir/dfs", dfsSchema))(
      (d, gg) => d.filter(col("ingest").isin(gg.toSeq: _*)))
    // startsWith predicates cannot use the isin fast path, so a
    // pushdownMax-deep OR chain would hand Catalyst a 65k-node
    // expression tree (planning blowup / stack risk, unlike isin);
    // prefix-seed cardinality is query-count-bounded anyway — cap the
    // OR branch low and build it as a balanced reduction
    val dfsPruned =
      if (pfxSample.length <= prefixOrMax)
        dfsBase.filter(
          orBalanced(pfxSample.map(p => col("term").startsWith(p))))
      else if (pfxSample.length <= pushdownMax) {
        // above the OR-chain cap with a COMPLETE seed sample
        // (round 15): every completion of seed p lies in
        // [p, successor(p)), so chunking the sorted seeds at their
        // largest gaps into ≤ rangeBandMax contiguous bands — each
        // [chunk.first, successor(chunk.last)) — gives a range
        // predicate that skips the vocabulary BETWEEN seed clusters,
        // which the round-14 single [min, max] range could not (a
        // seed set spanning the lexicon pruned nothing). The
        // semi-join below stays the exact rule.
        val chunks = gapChunks(pfxSample.sorted.map(p => (p, p)),
          rangeBandMax)
        dfsPruned0(dfsBase, orBalanced(chunks.map { case (lo, hi) =>
          charSuccessor(hi).fold(col("term") >= lo)(h =>
            col("term") >= lo && col("term") < h)
        }), seed, len)
      } else {
        // seed sample TRUNCATED (more seed prefixes than pushdownMax):
        // the sample must not bound anything — fall back to the
        // round-14 single range from a 2-value distributed aggregate
        val b = seed.agg(org.apache.spark.sql.functions.min(col("pfx")),
          org.apache.spark.sql.functions.max(col("pfx"))).collect()(0)
        val hi = charSuccessor(b.getString(1))
        dfsPruned0(dfsBase, col("term") >= b.getString(0) &&
          hi.fold(lit(true))(h => col("term") < h), seed, len)
      }
    // collapse byte-identical dfs rows before summing, mirroring
    // dfsRowsFor's distinct over (term, df, gen): a batch re-delivered
    // after compaction leaves the same logical row in both the
    // compacted ingest=-1 dir and its own ingest dir — without the
    // collapse, df double-counts and perturbs BOTH the rarest-first
    // expansion cap and the µ-score (df feeds bm25TermMicroExpr),
    // breaking bit-identity with prefixTopkOn/prefixTopkSql
    val vocab = dfsPruned
      .select(col("term"), col("df"), col("gen")).distinct()
      .groupBy(col("term"))
      .agg(sum(col("df")).as("df")).filter(col("df") > 0)
      .withColumn("pfx", substring(col("term"), 1, len))
    val wx = Window.partitionBy(col("query_id"))
      .orderBy(col("df").asc, col("term").asc)
    val expd = vocab.join(broadcast(seed), Seq("pfx"))
      .withColumn("xrank", row_number().over(wx))
      .filter(col("xrank") <= max)
      .select(col("term"), col("query_id"), col("df"), col("xrank"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the selected completions' exact generation shortlist, then the
    // standard fetch/score/rank path
    val expSample = expd.select(col("term")).distinct()
      .limit(pushdownMax + 1).collect().map(_.getString(0))
    if (expSample.isEmpty) return emptyOut
    val dfsE = dfsRowsFor(spark, stateDir,
      expd.select(col("term")).distinct(), expSample, gens)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val selPairs = expd.select(col("term")).distinct()
      .join(dfsE, Seq("term"))
      .select(col("term"), col("gen")).distinct()
      .limit(pushdownMax + 1).collect()
    if (selPairs.isEmpty) return emptyOut
    // COMPLETION MaxScore (round 13 — the expansion's frequent tail
    // stops reading whole): a prefix query is a DISJUNCTION over its
    // completions, so no conjunction-style candidate rule applies —
    // instead the df-rarest ≤ bm25QueryTerms completions per query
    // are the ESSENTIAL set (the candidate source, fetched whole) and
    // the frequent rest fetch candidate-restricted, exactly
    // [[queryTopKAll]]'s block-max discipline: exactness holds
    // because a doc with NO essential completion scores at most
    // Σ ub(non-essential) (µ-score at tf = dl = max_tf, the stored
    // impact bound), and any query whose kth candidate score does not
    // beat that bound falls back to its own unrestricted re-fetch.
    // The engage decision is driver-side from rows ALREADY collected
    // (the df ratio rule every pushdown face shares); the declining
    // path costs exactly the single fetch it always did. The driver
    // split and the Spark-side xrank partition both read expd's own
    // rows, so they cannot disagree (the ADVICE r12 coupling lesson).
    val expRows = expd.limit(pushdownMax + 1).collect()
    val expComplete = expRows.length <= pushdownMax
    val essN = graft.operators.CorpusOps.bm25QueryTerms
    // a completion's essential/non-essential class is QUERY-INVARIANT
    // (load-bearing for the per-term fetch split below): two queries
    // with the same seed prefix expand to the same completion set
    // ranked by the same (df asc, term asc) window, and different
    // fixed-width prefixes have disjoint completion sets — so a term
    // can never be essential for one query and non-essential for
    // another, and the two term arrays below partition the fetch. The
    // exact-BM25 face (queryTopKAll) has no such invariant, which is
    // why it fetches each selection side's own term set un-diffed.
    val essTermArr = expRows.filter(_.getInt(3) <= essN)
      .map(_.getString(0)).distinct
    val nonTermArr = expRows.filter(_.getInt(3) > essN)
      .map(_.getString(0)).distinct
    // ASSERT the invariance rather than silently diffing it away: a
    // term on BOTH sides of the split would mean two queries disagree
    // on its class — under a silent .diff that query's non-essential
    // hits would just vanish; under this require a future regression
    // of the argument above surfaces as an error (ADVICE r13)
    require(!nonTermArr.exists(essTermArr.toSet), {
      val both = nonTermArr.filter(essTermArr.toSet).take(5)
      s"prefix MaxScore split violated query-invariance: terms " +
        s"${both.mkString(",")} are essential for one query and " +
        s"non-essential for another"
    })
    val dfOf = expRows.map(r => r.getString(0) -> r.getLong(2)).toMap
    val sumEss = essTermArr.map(dfOf.getOrElse(_, 0L)).sum
    val sumNon = nonTermArr.map(dfOf.getOrElse(_, 0L)).sum
    // completeness gates the prune (a truncated collect could hide a
    // completion or a generation pair from the driver split)
    val engage = expComplete && selPairs.length <= pushdownMax &&
      nonTermArr.nonEmpty &&
      sumNon > phrasePruneRatio * math.max(1L, sumEss)
    def fetchExp(terms: Array[String],
        docFilter: Option[Array[Long]]): DataFrame = {
      import spark.implicits._
      val tset = terms.toSet
      val pairs = selPairs.filter(r => tset(r.getString(0)))
      val raw = postingsFor(spark, stateDir, pairs,
        terms.toSeq.toDF("term"), gens, g)
      minusTombs(spark, stateDir,
        docFilter.filter(_.length <= pushdownMax)
          .foldLeft(raw)((r, ids) =>
            r.filter(col("doc_id").isin(ids.toSeq: _*)))
          .select(col("term"), col("doc_id"), col("tf"))
          .distinct(), gens)
    }
    val wd = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col("doc_id").asc)
    def scoreRank(hits: DataFrame, dl: DataFrame): DataFrame =
      hits.repartition(col("doc_id")).join(dl, Seq("doc_id"))
        .withColumn("n_docs", lit(nDocs))
        .withColumn("totdl", lit(totDl))
        .withColumn("term_micro",
          expr(graft.operators.CorpusOps.bm25TermMicroExpr))
        .groupBy(col("query_id"), col("doc_id"))
        .agg(sum(col("term_micro")).as("score_micro"),
          count(lit(1)).as("n_terms"))
        .withColumn("rank", row_number().over(wd))
    val outCols = Seq(col("query_id"), col("rank"), col("doc_id"),
      col("score_micro"), col("n_terms"))
    if (!engage) {
      val post = minusTombs(spark, stateDir,
        postingsFor(spark, stateDir, selPairs,
            expd.select(col("term")).distinct(), gens, g)
          .select(col("term"), col("doc_id"), col("tf"))
          .distinct(), gens)
      val hits = expd.join(post, Seq("term"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val candIds = hits.select(col("doc_id")).distinct()
      val dl = dlFor(spark, stateDir, g, candIds, gens)
      return scoreRank(hits, dl)
        .filter(col("rank") <= graft.operators.CorpusOps.bm25K)
        .select(outCols: _*)
    }
    val essSel = expd.filter(col("xrank") <= essN)
    val nonSel = expd.filter(col("xrank") > essN)
    val postEss = fetchExp(essTermArr, None)
    val hitsEss = essSel.join(postEss, Seq("term"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = hitsEss.select(col("query_id"), col("doc_id")).distinct()
    val candIdArr = cand.select(col("doc_id")).distinct()
      .limit(pushdownMax + 1).collect().map(_.getLong(0))
    def allHits(restrict: Boolean): DataFrame =
      hitsEss.unionByName(nonSel.join(
        fetchExp(nonTermArr,
          if (restrict) Some(candIdArr) else None), Seq("term")))
    val candSide =
      if (candIdArr.length <= pushdownMax) broadcast(cand) else cand
    val dlMain = dlFor(spark, stateDir, g,
      cand.select(col("doc_id")).distinct(), gens)
    val ranked = scoreRank(
      allHits(restrict = true)
        .join(candSide, Seq("query_id", "doc_id"), "left_semi"), dlMain)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val kth = ranked
      .filter(col("rank") === graft.operators.CorpusOps.bm25K)
      .select(col("query_id"), col("score_micro").as("kth_micro"))
    // the proof obligation from dfs metadata alone: ub(term) =
    // µ-score at tf = dl = max_tf (the stored stale-high-safe bound)
    val maxTfT = dfsE.groupBy(col("term"))
      .agg(org.apache.spark.sql.functions.max(col("max_tf"))
        .as("max_tf"))
    val sumUb = nonSel.join(maxTfT, Seq("term"))
      .select(col("query_id"), col("df"),
        col("max_tf").as("tf"), col("max_tf").as("dl"))
      .withColumn("n_docs", lit(nDocs))
      .withColumn("totdl", lit(totDl))
      .withColumn("ub_micro",
        expr(graft.operators.CorpusOps.bm25TermMicroExpr))
      .groupBy(col("query_id")).agg(sum(col("ub_micro")).as("sum_ub"))
    val fb = sumUb.join(kth, Seq("query_id"), "left")
      .filter(col("kth_micro").isNull ||
        col("sum_ub") >= col("kth_micro"))
      .select(col("query_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mainTop = ranked
      .join(broadcast(fb), Seq("query_id"), "left_anti")
      .filter(col("rank") <= graft.operators.CorpusOps.bm25K)
      .select(outCols: _*)
    if (fb.limit(1).collect().isEmpty) mainTop
    else {
      val hitsFb = allHits(restrict = false)
        .join(broadcast(fb), Seq("query_id"), "left_semi")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val dlFb = dlFor(spark, stateDir, g,
        hitsFb.select(col("doc_id")).distinct(), gens)
      mainTop.unionByName(scoreRank(hitsFb, dlFb)
        .filter(col("rank") <= graft.operators.CorpusOps.bm25K)
        .select(outCols: _*))
    }
  }

  /** The full match set (query_id, doc_id) of each query under the
    * standard ranked-retrieval term selection — every indexed document
    * holding at least one selected term, tombstones applied. The id
    * half of the faceted-search face (CorpusOps.searchFacetsIndex):
    * the index serves ids, the document table serves attributes. Same
    * dfs-before-postings read discipline as [[queryTopK]]; the result
    * is candidate-grain (never ranked, never joined to dl — facet
    * counting needs no scores).
    */
  def queryMatches(spark: SparkSession, stateDir: String,
      queries: DataFrame, asOf: Option[Long] = None): DataFrame = {
    ensureLayout(spark, stateDir)
    val g = geomOf(spark, stateDir)
    val gens = asOf.map(seq => LsmIndex.gensAsOf(spark, stateDir, seq))
    val st = markers(stateDir).stored(spark, gens)
    val nDocs = if (st.nonEmpty) st.head else 0L
    def emptyOut = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("query_id", LongType),
        StructField("doc_id", LongType))))
    if (nDocs <= 0L) return emptyOut
    val q = queries.filter(col("text").isNotNull)
      .select(col("query_id"),
        explode(array_distinct(
          graft.operators.CorpusOps.bm25Tokens(col("text")))).as("term"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val termSample = q.select(col("term")).distinct()
      .limit(pushdownMax + 1).collect().map(_.getString(0))
    if (termSample.isEmpty) return emptyOut
    val dfsR = dfsRowsFor(spark, stateDir,
      q.select(col("term")).distinct(), termSample, gens)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfT = dfsR.groupBy(col("term")).agg(sum(col("df")).as("df"))
      .filter(col("df") > 0)
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("df").asc, col("term").asc)
    val selected = q.join(dfT, Seq("term"))
      .filter(graft.operators.CorpusOps.bm25CapOk(col("df"), lit(nDocs)))
      .withColumn("trank", row_number().over(wq))
      .filter(col("trank") <= graft.operators.CorpusOps.bm25QueryTerms)
      .select(col("term"), col("query_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val selPairs = selected.select(col("term")).distinct()
      .join(dfsR, Seq("term"))
      .select(col("term"), col("gen")).distinct()
      .limit(pushdownMax + 1).collect()
    if (selPairs.isEmpty) return emptyOut
    val post = minusTombs(spark, stateDir,
      postingsFor(spark, stateDir, selPairs,
          selected.select(col("term")).distinct(), gens, g)
        .select(col("term"), col("doc_id"))
        .distinct(), gens)
    selected.join(post, Seq("term"))
      .select(col("query_id"), col("doc_id")).distinct()
  }

  /** FIELDED (simple BM25F) retrieval over the accumulated index — the
    * incremental twin of CorpusOps.bm25fTopkOn, bit-identical by
    * shared definitions. The fielded state is exactly ONE stored
    * number per document (layout v7): the field boundary `ttl` in the
    * docs sub-table. A title hit is a position < ttl in the
    * title-first token stream the fold indexed, so the weighted term
    * frequency derives from the positional postings the v3+ layout
    * already carries (wtf = tf + (w−1)·|positions < ttl|), the
    * weighted document length from the stored (dl, ttl) pair (wdl =
    * dl + (w−1)·ttl), and the weighted corpus length from the v6+
    * markers' third element (tot_ttl). The face therefore reads
    * exactly what [[queryTopK]] reads plus one parquet column chunk
    * (positions) on the selected terms, plus the ttl column riding
    * the same candidate-bounded docs read as dl. For an UNFIELDED
    * corpus the stored ttl is min(dl, titleTokens) — the positional
    * first-titleTokens convention, reproduced bit-identically (and
    * pre-v7 generations, whose files lack the column, coalesce to it
    * on read). Selection, the head-term cap, and df are the unfielded
    * definitions over the combined stream (a fielded fold's postings
    * exist iff the term occurs in ANY field, so df = the batch face's
    * any-field document count). `asOf` carries [[queryTopK]]'s
    * contract.
    */
  def queryFielded(spark: SparkSession, stateDir: String,
      queries: DataFrame, asOf: Option[Long] = None): DataFrame =
    queryFieldedOn(spark, stateDir,
      queries.filter(col("text").isNotNull)
        .select(col("query_id"),
          explode(array_distinct(
            graft.operators.CorpusOps.bm25Tokens(col("text"))))
            .as("term"))
        .withColumn("fld", lit("any")).withColumn("qw", lit(1L)),
      asOf)

  /** FIELDED QUERIES over the fielded state (round 14): queries whose
    * tokens carry per-field tags and query weights
    * (`title:term`, `body:term`, `term^w` — parsed by the SHARED
    * graft.operators.CorpusOps.parseFieldedQuery, so index-time and
    * batch-time query parsing cannot drift). Per-field tfs derive
    * from the positions already stored against the STORED v7 field
    * boundary — a field-restricted query costs the same one posting
    * read as the blended query.
    */
  def queryFieldedTagged(spark: SparkSession, stateDir: String,
      queries: DataFrame, asOf: Option[Long] = None,
      fieldLocalDf: Boolean = false): DataFrame =
    queryFieldedOn(spark, stateDir,
      graft.operators.CorpusOps.parseFieldedQuery(queries), asOf,
      fieldLocalDf)

  /** The ONE fielded scorer both faces above run through — `trips` is
    * the DISTINCT (query_id, term, fld, qw) clause relation; the
    * unfielded face is the degenerate all-('any', 1) set, which keeps
    * this core pinned bit-for-bit by bm25f_index / bm25f_titled_index
    * on the oracle gate. Clause semantics match
    * graft.operators.CorpusOps.bm25fScoredOn exactly: wtf per field
    * from (tf, |positions < ttl|), blended dl, any-field df, the
    * (df, term, fld, qw)-ordered df-rarest selection, the clause
    * µ-score × qw.
    */
  private def queryFieldedOn(spark: SparkSession, stateDir: String,
      trips: DataFrame, asOf: Option[Long],
      fieldLocalDf: Boolean = false): DataFrame = {
    ensureLayout(spark, stateDir)
    val g = geomOf(spark, stateDir)
    val gens = asOf.map(seq => LsmIndex.gensAsOf(spark, stateDir, seq))
    val st = markers(stateDir).stored(spark, gens)
    val nDocs = if (st.nonEmpty) st.head else 0L
    val totDl = if (st.size > 1) st(1) else 0L
    val totTtl = if (st.size > 2) st(2) else 0L
    val tw = graft.operators.CorpusOps.titleWeight
    val wTot = totDl + (tw - 1).toLong * totTtl
    def emptyOut = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("query_id", LongType),
        StructField("rank", IntegerType, nullable = false),
        StructField("doc_id", LongType),
        StructField("score_micro", LongType),
        StructField("n_terms", LongType, nullable = false))))
    if (nDocs <= 0L || totDl <= 0L || totTtl <= 0L) return emptyOut
    val q = trips
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val termSample = q.select(col("term")).distinct()
      .limit(pushdownMax + 1).collect().map(_.getString(0))
    if (termSample.isEmpty) return emptyOut
    val dfsR = dfsRowsFor(spark, stateDir,
      q.select(col("term")).distinct(), termSample, gens)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfT = dfsR.groupBy(col("term")).agg(sum(col("df")).as("df"),
        sum(col("dft")).as("dft"))
      .filter(col("df") > 0)
    // FIELD-LOCAL DF (layout v8): a title-restricted clause scores and
    // selects with its title-local document frequency — the clause df
    // `cdf` — instead of the understating any-field count; body/any
    // clauses keep the any-field df (see the layout doc). A title
    // clause whose term never appears in any title (cdf = 0) cannot
    // match and is not a clause. Off by default: the unfielded and
    // qtag faces stay pinned to the any-field semantics their oracle
    // rows fix.
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("cdf").asc, col("term").asc, col("fld").asc,
        col("qw").asc)
    val selected = q.join(dfT, Seq("term"))
      .withColumn("cdf",
        if (fieldLocalDf)
          when(col("fld") === "title", col("dft")).otherwise(col("df"))
        else col("df"))
      .filter(col("cdf") > 0)
      .filter(graft.operators.CorpusOps.bm25CapOk(col("cdf"), lit(nDocs)))
      .withColumn("trank", row_number().over(wq))
      .filter(col("trank") <= graft.operators.CorpusOps.bm25QueryTerms)
      .select(col("term"), col("query_id"), col("fld"), col("qw"),
        col("cdf").as("df"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val selPairs = selected.select(col("term")).distinct()
      .join(dfsR, Seq("term"))
      .select(col("term"), col("gen")).distinct()
      .limit(pushdownMax + 1).collect()
    if (selPairs.isEmpty) return emptyOut
    // the ONE read this face adds over queryTopK: the positions column
    // rides the same pruned posting rows
    val post = minusTombs(spark, stateDir,
      postingsFor(spark, stateDir, selPairs,
          selected.select(col("term")).distinct(), gens, g)
        .select(col("term"), col("doc_id"), col("tf"), col("positions"))
        .distinct(), gens)
    val hits = selected.join(post, Seq("term"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val candIds = hits.select(col("doc_id")).distinct()
    val dl = dlFor(spark, stateDir, g, candIds, gens, withTtl = true)
    rankFieldedHits(hits, dl, nDocs, wTot)
  }

  /** The fielded BM25F scoring tail shared by [[queryFieldedOn]] and
    * the composed-query shared-fetch face ([[queryLangParts]]) —
    * `hits` is the (selected clause ⋈ posting) relation carrying
    * (query_id, term, fld, qw, df, doc_id, tf, positions), `dl` the
    * candidate-bounded (doc_id, dl, ttl) fetch. ONE definition so the
    * consolidation cannot drift from the standalone face.
    */
  private def rankFieldedHits(hits: DataFrame, dl: DataFrame,
      nDocs: Long, wTot: Long): DataFrame = {
    val tw = graft.operators.CorpusOps.titleWeight
    val wd = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col("doc_id").asc)
    hits.repartition(col("doc_id")).join(dl, Seq("doc_id"))
      // the per-clause wtf against the STORED field boundary: the
      // title tf is |positions < ttl| (already-fetched payload, no
      // extra read), dl/totdl stay the blended document lengths, the
      // µ-score expression runs unchanged and the clause weight
      // multiplies AFTER the µ-floor (exact in both engines)
      .withColumn("tft", expr(
        "cast(size(filter(positions, p -> p < ttl)) as bigint)"))
      .withColumn("tf",
        when(col("fld") === "title", col("tft") * tw)
          .when(col("fld") === "body", col("tf") - col("tft"))
          .otherwise(col("tf") + col("tft") * (tw - 1)))
      .filter(col("tf") > 0)
      .withColumn("dl", expr(s"dl + ${tw - 1} * ttl"))
      .withColumn("n_docs", lit(nDocs))
      .withColumn("totdl", lit(wTot))
      .withColumn("term_micro",
        expr(graft.operators.CorpusOps.bm25TermMicroExpr) * col("qw"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("term_micro")).as("score_micro"),
        count(lit(1)).as("n_terms"))
      .withColumn("rank", row_number().over(wd))
      .filter(col("rank") <= graft.operators.CorpusOps.bm25K)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("score_micro"), col("n_terms"))
  }

  /** The dfs sub-table rows for a query term set — dpfx dir shortlist
    * + term IN row-group pushdown when the term sample collected under
    * [[pushdownMax]], distributed left-semi join above it. Returns
    * distinct (term, df, gen): a batch re-delivered after compaction
    * merged its generation leaves byte-identical duplicate rows;
    * collapsing them keeps the per-generation sums exact. Shared by
    * the BM25 and phrase query faces.
    */
  private def dfsRowsFor(spark: SparkSession, stateDir: String,
      terms: DataFrame, termSample: Array[String],
      gens: Option[Set[Long]] = None): DataFrame = {
    val dfsBase = gens.foldLeft(
      LsmIndex.readOrEmpty(spark, s"$stateDir/dfs", dfsSchema))(
      (d, g) => d.filter(col("ingest").isin(g.toSeq: _*)))
    val rows =
      if (termSample.length <= pushdownMax) {
        val pfx = termSample.map(dpfxOf).distinct.toSeq
        dfsBase.filter(col("dpfx").isin(pfx: _*) &&
          col("term").isin(termSample.toSeq: _*))
      } else {
        // term-RANGE row-group prune (round 14, BANDED round 15): dfs
        // files are write-sorted by (dpfx, term), so a range over the
        // query's terms reaches the parquet statistics where the IN
        // list can't (the sample truncated above pushdownMax — the
        // bounds come from bounded distributed aggregates, never the
        // truncated sample); ≤ rangeBandMax gap-cut bands also skip
        // the vocabulary BETWEEN term clusters, which the single
        // [min, max] could not. The semi-join stays the exact filter.
        val ranged = bandedTermRange(terms, col("term"))
          .fold(dfsBase)(dfsBase.filter)
        ranged.join(terms, Seq("term"), "left_semi")
      }
    rows.select(col("term"), col("df"), col("max_tf"), col("gen"),
        // pre-v8 generation files carry no dft column — their rows
        // coalesce to the any-field df (layout v8 doc)
        coalesce(col("dft"), col("df")).as("dft"))
      .distinct()
  }

  /** The pruned posting read for an exact (term, gen) shortlist
    * `selPairs`: each term's own generation dirs plus its tpfx's
    * compacted `ingest=-1` dir (compaction rewrites the physical dir
    * while dfs keeps the logical gen), with the term IN row-group
    * pushdown — falling back above [[pushdownMax]] to a tpfx-dir scan
    * plus a distributed semi-join against `selectedTerms`. Returns the
    * raw pruned relation; callers project exactly the columns they
    * score with (so parquet column pruning drops what they don't —
    * the BM25 face never reads the positional payload). Shared by the
    * BM25 and phrase query faces.
    */
  private def postingsFor(spark: SparkSession, stateDir: String,
      selPairs: Array[org.apache.spark.sql.Row],
      selectedTerms: DataFrame,
      gens: Option[Set[Long]] = None,
      g: Geom = defaultGeom): DataFrame = {
    // the main path's exact (term, gen) dir shortlist already carries
    // the as-of restriction (selPairs derive from gen-filtered dfs
    // rows); the fallback's tpfx-dir scan needs the explicit filter
    val base = gens.foldLeft(
      LsmIndex.readOrEmpty(spark, s"$stateDir/postings", postingsSchema))(
      (p, g) => p.filter(col("ingest").isin(g.toSeq: _*)))
    if (selPairs.length <= pushdownMax) {
      val selTerms = selPairs.map(_.getString(0)).distinct.toSeq
      val tpfxs = selTerms.map(tpfxOf(_, g.hx)).distinct
      val dirs = (selPairs.map(r =>
          s"${tpfxOf(r.getString(0), g.hx)}/${r.getLong(1)}") ++
        tpfxs.map(p => s"$p/-1")).distinct.toSeq
      base.filter(col("tpfx").isin(tpfxs: _*) &&
        concat_ws("/", col("tpfx"), col("ingest")).isin(dirs: _*) &&
        col("term").isin(selTerms: _*))
    } else {
      val pfx = selectedTerms
        .select(substring(md5(col("term")), 1, g.hx).as("tpfx"))
        .distinct().collect().map(_.getString(0)).toSeq // ≤ 16^hx, fixed
      // TERM-RANGE row-group prune on the fallback (round 14, BANDED
      // round 15): the posting files are write-sorted by
      // (tpfx, term, doc_id), so a range predicate over the selected
      // terms reaches the parquet term statistics even when the term
      // set itself is too large for an IN predicate — and the
      // gap-cut bands skip the row groups between term clusters the
      // single [min, max] had to read. The semi-join stays the exact
      // filter, the bands its pushable superset; all collects are
      // bounded (group listing ≤ rangeGroupCap).
      val scanned = base.filter(col("tpfx").isin(pfx: _*))
      val ranged = bandedTermRange(
          selectedTerms.select(col("term")).distinct(), col("term"))
        .fold(scanned)(scanned.filter)
      ranged.join(selectedTerms.select(col("term")).distinct(),
        Seq("term"), "left_semi")
    }
  }

  /** Exact-phrase retrieval over the accumulated index: for each query
    * (query_id, text), the top-k indexed documents containing the
    * query's leading phrase (CorpusOps.phraseTerms) as a consecutive
    * token sequence — (query_id, rank, doc_id, n_occ), bit-identical
    * to CorpusOps.phraseMatchOn over the same corpus: phrase
    * extraction, tokenizer, and the anchor-merge/rank core
    * (CorpusOps.phraseRank) are shared definitions.
    *
    * Read shape: same dfs-driven fetch as [[queryTopK]] — the (term →
    * generations) shortlist prunes posting dirs exactly, and the term
    * IN predicate row-group-prunes within them — but a phrase needs
    * ALL its terms (adjacency has no df-rarest relaxation), so there
    * is no head-term cap on this face: a phrase of stopwords is
    * answerable and pays its posting volume (inherent to positional
    * semantics, bounded by the phrase's Σ df). The positions arrays
    * ride the SAME posting rows (v3 layout) — the fetch costs one
    * extra parquet column chunk only on this face, and the anchor
    * merge is one aggregation at (query, doc, anchor) grain.
    */
  /** The slot-position rows (query_id, doc_id, i, pos) of the phrase
    * faces, fetched from the positional postings: the dfs-driven
    * (term → generations) shortlist prunes the read, the positions
    * arrays explode to one row per occurrence. None when no phrase
    * term exists in the vocabulary (zero posting reads — nothing can
    * match). Shared by [[queryPhrase]] and [[queryNear]].
    */
  private def phrasePosRows(spark: SparkSession, stateDir: String,
      queries: DataFrame,
      len: Int = graft.operators.CorpusOps.phraseLen,
      asOf: Option[Long] = None,
      distinctTerms: Boolean = false): Option[DataFrame] = {
    ensureLayout(spark, stateDir)
    val g = geomOf(spark, stateDir)
    val gens = asOf.map(seq => LsmIndex.gensAsOf(spark, stateDir, seq))
    val ops = graft.operators.CorpusOps
    val q = queries.filter(col("text").isNotNull)
      .filter(size(ops.bm25Tokens(col("text"))) >= len)
      // the unordered face's contract: all len phrase terms distinct
      .filter(if (distinctTerms)
          size(array_distinct(ops.phraseTerms(col("text"), len))) === len
        else lit(true))
      .select(col("query_id"),
        posexplode(ops.phraseTerms(col("text"), len)).as(Seq("i", "term")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE bounded collect serves the term sample AND (driver-side) the
    // per-query rarest-term split below — the prune's engage decision
    // must not cost an extra Spark job on the path that declines it
    val qPairRows = q.select(col("query_id"), col("term")).distinct()
      .limit(pushdownMax + 1).collect()
    if (qPairRows.isEmpty) return None
    val pairsComplete = qPairRows.length <= pushdownMax
    val termSample =
      if (pairsComplete) qPairRows.map(_.getString(1)).distinct
      else q.select(col("term")).distinct()
        .limit(pushdownMax + 1).collect().map(_.getString(0))
    val dfsR = dfsRowsFor(spark, stateDir,
      q.select(col("term")).distinct(), termSample, gens)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE collect of dfsR's EXACT rows serves the (term, gen) dir
    // shortlist AND the df values the prune decision needs — dfMap
    // sums the same (term, df, max_tf, gen) projection every
    // Spark-side df consumer sums (ADVICE r12, see queryBool); the
    // unengaged path costs exactly the single fetch it always did
    val selRows = dfsR.limit(pushdownMax + 1).collect()
    if (selRows.isEmpty) return None
    // a TRUNCATED row collect may hide (term, gen) pairs behind the
    // cap even after dedup — re-collect the pair projection so
    // postingsFor's completeness check sees the true pair count (its
    // over-cap fallback scans tpfx dirs + semi-joins, exact at any
    // volume); one extra bounded job only in the over-cap regime
    val selPairs =
      if (selRows.length <= pushdownMax)
        selRows
          .map(r => org.apache.spark.sql.Row(r.getString(0), r.getLong(3)))
          .distinct
      else dfsR.select(col("term"), col("gen")).distinct()
        .limit(pushdownMax + 1).collect()
    // TWO-PHASE candidate pushdown (round 12 — the positional twin of
    // queryTopKAll's block-max prune): a phrase match must hold EVERY
    // slot term, so docs holding some query's RAREST term are a
    // superset of every match. When the rest of the terms' cumulative
    // posting volume is markedly wider than the rarest terms'
    // (df-ratio cost rule, decided from vocabulary-grain dfs rows
    // before any posting I/O), fetch the rarest terms' postings first
    // and push their doc ids into the remaining terms' read — the
    // (tpfx, term, doc_id) write sort makes parquet row-group stats
    // skip the frequent terms' non-candidate row groups. Below the
    // ratio (uniform-df phrases, tiny corpora) the single fetch stays.
    //
    // completeness gates the prune: a TRUNCATED collect could leave
    // some query without a rare term in the candidate union, and its
    // matches would be filtered away
    val dfComplete = selRows.length <= pushdownMax
    val dfMap = selRows.toSeq
      .map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sum }
      .filter(_._2 > 0)
    def fetch(terms: DataFrame, pairs: Array[org.apache.spark.sql.Row],
        docFilter: Option[Array[Long]]): DataFrame = {
      val raw = postingsFor(spark, stateDir, pairs, terms, gens, g)
      docFilter.filter(_.length <= pushdownMax)
        .foldLeft(raw)((r, ids) => r.filter(col("doc_id").isin(ids.toSeq: _*)))
        .select(col("term"), col("doc_id"), col("positions"))
        .distinct()
    }
    // per-query rarest term, DRIVER-side over the already-collected
    // pairs (df asc, term asc — the faces' shared tie rule); no Spark
    // job is spent deciding not to engage
    val rareTermArr: Array[String] =
      if (!pairsComplete || !dfComplete) Array.empty
      else qPairRows.toSeq
        .map(r => (r.getLong(0), r.getString(1)))
        .filter(p => dfMap.contains(p._2))
        .groupBy(_._1).values
        .map(_.minBy(p => (dfMap(p._2), p._2))._2)
        .toArray.distinct
    val restArr = dfMap.keys.toArray.diff(rareTermArr)
    val sumRare = rareTermArr.map(dfMap.getOrElse(_, 0L)).sum
    val sumRest = restArr.map(dfMap.getOrElse(_, 0L)).sum
    val engage = restArr.nonEmpty && rareTermArr.nonEmpty &&
      sumRest > phrasePruneRatio * math.max(1L, sumRare)
    import spark.implicits._
    val post =
      if (!engage)
        minusTombs(spark, stateDir,
          fetch(q.select(col("term")).distinct(), selPairs, None), gens)
      else {
        val rareSet = rareTermArr.toSet
        val restSet = restArr.toSet
        val postRare = fetch(rareTermArr.toSeq.toDF("term"),
            selPairs.filter(r => rareSet(r.getString(0))), None)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val candIdArr = postRare.select(col("doc_id")).distinct()
          .limit(pushdownMax + 1).collect().map(_.getLong(0))
        val postRest = fetch(restArr.toSeq.toDF("term"),
          selPairs.filter(r => restSet(r.getString(0))),
          Some(candIdArr))
        minusTombs(spark, stateDir,
          postRare.unionByName(postRest), gens)
      }
    Some(q.join(post, Seq("term"))
      .select(col("query_id"), col("doc_id"), col("i"),
        explode(col("positions")).as("pos")))
  }

  /** Engage [[phrasePosRows]]' two-phase candidate pushdown only when
    * the non-rarest terms' cumulative df is this many times the rarest
    * terms' — below it the second fetch's savings can't repay its
    * extra job.
    */
  private val phrasePruneRatio = 4L

  private def emptyRanked(spark: SparkSession,
      valueCol: String): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("query_id", LongType),
        StructField("rank", IntegerType, nullable = false),
        StructField("doc_id", LongType),
        StructField(valueCol, LongType, nullable = false))))

  def queryPhrase(spark: SparkSession, stateDir: String,
      queries: DataFrame,
      len: Int = graft.operators.CorpusOps.phraseLen,
      asOf: Option[Long] = None): DataFrame =
    phrasePosRows(spark, stateDir, queries, len, asOf) match {
      case None => emptyRanked(spark, "n_occ")
      case Some(pr) =>
        graft.operators.CorpusOps.phraseRank(
          pr.select(col("query_id"), col("doc_id"),
            (col("pos") - col("i")).as("anchor")), len)
    }

  /** FIELD-RESTRICTED phrase retrieval (round 14) over the fielded
    * (v7) state: the phrase must lie entirely within the title
    * (every slot < the STORED per-doc boundary `ttl`) or entirely
    * within the body (anchor ≥ ttl) — the positional twin of
    * queryFielded's weighted-tf read. Same pruned posting fetch as
    * [[queryPhrase]]; the boundary rides the same candidate-bounded
    * docs read as dl; semantics shared with
    * CorpusOps.phraseFieldMatchOn (which recomputes the boundary the
    * fold stored).
    */
  def queryPhraseFielded(spark: SparkSession, stateDir: String,
      queries: DataFrame,
      len: Int = graft.operators.CorpusOps.phraseLen,
      field: String = "title",
      asOf: Option[Long] = None): DataFrame = {
    require(field == "title" || field == "body",
      s"field must be title|body, got $field")
    val q = queries.filter(col("text").isNotNull)
      .select(col("query_id"), col("text"))
    queryPhraseFieldedOn(spark, stateDir, q,
      q.select(col("query_id"), lit(field).as("fld")), len, asOf)
  }

  /** TAGGED fielded phrase retrieval (round 15): the field restriction
    * is expressed IN the query string — `title:"a b"` / `body:"a b"`,
    * parsed by the SHARED graft.operators.CorpusOps.parseTaggedPhrase
    * (so index-time and batch-time phrase-tag parsing cannot drift) —
    * instead of the Scala parameter [[queryPhraseFielded]] takes. The
    * quoted run is the phrase, the tag its per-query field; everything
    * downstream is the one fielded anchor core below.
    */
  def queryPhraseTagged(spark: SparkSession, stateDir: String,
      queries: DataFrame,
      len: Int = graft.operators.CorpusOps.phraseLen,
      asOf: Option[Long] = None): DataFrame = {
    // slop-tagged runs are proximity clauses (queryNearTagged); the
    // exact-phrase face answers slop-0 runs only — shared rule with
    // the batch face
    val parsed = graft.operators.CorpusOps.parseTaggedPhrase(queries)
      .filter(col("slop") === 0L)
    queryPhraseFieldedOn(spark, stateDir,
      parsed.select(col("query_id"), col("ptext").as("text")),
      parsed.select(col("query_id"), col("fld")), len, asOf)
  }

  /** The ONE field-restricted anchor core both faces above run
    * through — `q` is the (query_id, text) phrase relation (text IS
    * the phrase text: the raw query for the parameterized face, the
    * extracted quoted run for the tagged one), `fldOf` the per-query
    * field with fld ∈ {title, body}. The constant-field face is the
    * degenerate all-one-field case, which keeps this core pinned
    * bit-for-bit by phrase_title_index on the oracle gate. `fldOf` is
    * query-count-bounded (one row per query), so it broadcasts onto
    * the anchor rows; the boundary rides the same candidate-bounded
    * docs read as dl.
    */
  private def queryPhraseFieldedOn(spark: SparkSession, stateDir: String,
      q: DataFrame, fldOf: DataFrame, len: Int,
      asOf: Option[Long]): DataFrame =
    phrasePosRows(spark, stateDir, q, len, asOf) match {
      case None => emptyRanked(spark, "n_occ")
      case Some(pr) =>
        val g = geomOf(spark, stateDir)
        val gens = asOf.map(seq => LsmIndex.gensAsOf(spark, stateDir, seq))
        val anchors = pr.select(col("query_id"), col("doc_id"),
          (col("pos") - col("i")).as("anchor"))
        val bound = dlFor(spark, stateDir, g,
            anchors.select(col("doc_id")).distinct(), gens,
            withTtl = true)
          .select(col("doc_id"), col("ttl"))
        graft.operators.CorpusOps.phraseRank(
          anchors.join(bound, Seq("doc_id"))
            .join(broadcast(fldOf), Seq("query_id"))
            .filter(when(col("fld") === "title",
                col("anchor") + (len - 1) < col("ttl"))
              .otherwise(col("anchor") >= col("ttl")))
            .select(col("query_id"), col("doc_id"), col("anchor")),
          len)
    }

  /** SLOP-tagged fielded proximity over the accumulated index
    * (round 15): `title:"a b"~w` parsed by the SHARED
    * graft.operators.CorpusOps.parseTaggedPhrase — ordered in-order
    * runs with span ≤ len−1+w entirely within the tagged field (each
    * stored position classifies against the STORED v7/v8 boundary),
    * scored by sloppy frequency over the qualifying ends. Same
    * pruned posting fetch as [[queryPhrase]]; the boundary rides the
    * candidate-bounded docs read; the rank core is the shared
    * CorpusOps.nearRank with the per-query slop cap.
    */
  def queryNearTagged(spark: SparkSession, stateDir: String,
      queries: DataFrame,
      len: Int = graft.operators.CorpusOps.phraseLen,
      asOf: Option[Long] = None): DataFrame = {
    val parsed = graft.operators.CorpusOps.parseTaggedPhrase(queries)
    phrasePosRows(spark, stateDir,
        parsed.select(col("query_id"), col("ptext").as("text")),
        len, asOf) match {
      case None => emptyRanked(spark, "sloppy_micro")
      case Some(pr) =>
        val g = geomOf(spark, stateDir)
        val gens = asOf.map(seq => LsmIndex.gensAsOf(spark, stateDir, seq))
        val bound = dlFor(spark, stateDir, g,
            pr.select(col("doc_id")).distinct(), gens, withTtl = true)
          .select(col("doc_id"), col("ttl"))
        rankNearTagged(pr, bound, parsed, len)
    }
  }

  /** The slop-tagged fielded proximity tail shared by
    * [[queryNearTagged]] and the composed-query shared-fetch face
    * ([[queryLangParts]]) — `pr` the slot-position rows (query_id,
    * doc_id, i, pos), `bound` the (doc_id, ttl) boundary rows,
    * `fldSlop` the per-query (query_id, fld, slop) tags. ONE
    * definition so the consolidation cannot drift from the
    * standalone face.
    */
  private def rankNearTagged(pr: DataFrame, bound: DataFrame,
      fldSlop: DataFrame, len: Int): DataFrame = {
    val posRows = pr.join(bound.select(col("doc_id"), col("ttl")),
        Seq("doc_id"))
      .join(broadcast(fldSlop.select(col("query_id"), col("fld"),
        col("slop"))), Seq("query_id"))
      .filter(when(col("fld") === "title", col("pos") < col("ttl"))
        .otherwise(col("pos") >= col("ttl")))
      .select(col("query_id"), col("doc_id"), col("i"), col("pos"),
        col("slop"))
    graft.operators.CorpusOps.nearRank(posRows, len,
      sloppy = true, slopCapped = true)
  }

  /** ONE state fetch serving BOTH legs of a composed-language query
    * (round 15 — the qlang twin of [[queryHybridParts]]'s r12
    * consolidation): [[queryFieldedTagged]] and [[queryNearTagged]]
    * each read dfs, postings, and docs separately when a composed
    * `title:a fld:"b c"~s d^2 …` string runs both, doubling every
    * state scan. Here both clause families parse once, the dfs read
    * covers the UNION of the fielded clauses' terms and the quoted
    * run's slot terms, the postings read projects (tf, positions) for
    * that union, and the (dl, ttl) fetch is candidate-bounded over
    * BOTH legs' hit documents. Results are bit-identical to running
    * the two faces separately (spec-pinned, and the qlang oracle rows
    * hash-pin the fusion): the scoring tails are the SAME definitions
    * ([[rankFieldedHits]], [[rankNearTagged]]), only the fetch is
    * consolidated. The proximity leg's two-phase rarest-term prune
    * does not engage on this face (its candidate split would narrow
    * the shared read the sparse leg needs whole). Returns
    * (fielded BM25F top-k, slop-capped fielded proximity top-k).
    */
  def queryLangParts(spark: SparkSession, stateDir: String,
      queries: DataFrame,
      len: Int = graft.operators.CorpusOps.phraseLen,
      fieldLocalDf: Boolean = true): (DataFrame, DataFrame) = {
    ensureLayout(spark, stateDir)
    val g = geomOf(spark, stateDir)
    val ops = graft.operators.CorpusOps
    val st = markers(stateDir).stored(spark, None)
    val nDocs = if (st.nonEmpty) st.head else 0L
    val totDl = if (st.size > 1) st(1) else 0L
    val totTtl = if (st.size > 2) st(2) else 0L
    val tw = ops.titleWeight
    val wTot = totDl + (tw - 1).toLong * totTtl
    def emptySparse = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("query_id", LongType),
        StructField("rank", IntegerType, nullable = false),
        StructField("doc_id", LongType),
        StructField("score_micro", LongType),
        StructField("n_terms", LongType, nullable = false))))
    def emptyProx = emptyRanked(spark, "sloppy_micro")
    // the fielded face's zero-corpus guard; the proximity leg has no
    // marker dependency and degrades through its own vocabulary check
    val sparseLive = nDocs > 0L && totDl > 0L && totTtl > 0L
    val trips = ops.parseFieldedQuery(queries)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val parsed = ops.parseTaggedPhrase(queries)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val qp = parsed.filter(size(ops.bm25Tokens(col("ptext"))) >= len)
      .select(col("query_id"),
        posexplode(ops.phraseTerms(col("ptext"), len)).as(Seq("i", "term")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val fSample = trips.select(col("term")).distinct()
      .limit(pushdownMax + 1).collect().map(_.getString(0))
    val pSample = qp.select(col("term")).distinct()
      .limit(pushdownMax + 1).collect().map(_.getString(0))
    if (fSample.isEmpty && pSample.isEmpty) return (emptySparse, emptyProx)
    val uTerms = trips.select(col("term"))
      .unionByName(qp.select(col("term"))).distinct()
    // either family's truncated sample leaves the union sample over
    // pushdownMax, so dfsRowsFor's exact distributed fallback engages
    val uSample = (fSample ++ pSample).distinct
    val dfsR = dfsRowsFor(spark, stateDir, uTerms, uSample, None)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // --- fielded clause selection: queryFieldedOn's exact chain ---
    val dfT = dfsR.groupBy(col("term")).agg(sum(col("df")).as("df"),
        sum(col("dft")).as("dft"))
      .filter(col("df") > 0)
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("cdf").asc, col("term").asc, col("fld").asc,
        col("qw").asc)
    val selected = trips.join(dfT, Seq("term"))
      .withColumn("cdf",
        if (fieldLocalDf)
          when(col("fld") === "title", col("dft")).otherwise(col("df"))
        else col("df"))
      .filter(col("cdf") > 0)
      .filter(ops.bm25CapOk(col("cdf"), lit(nDocs)))
      .withColumn("trank", row_number().over(wq))
      .filter(col("trank") <= ops.bm25QueryTerms)
      .select(col("term"), col("query_id"), col("fld"), col("qw"),
        col("cdf").as("df"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val selPairsF = selected.select(col("term")).distinct()
      .join(dfsR, Seq("term"))
      .select(col("term"), col("gen")).distinct()
      .limit(pushdownMax + 1).collect()
    val sparseable = sparseLive && fSample.nonEmpty && selPairsF.nonEmpty
    // --- prox emptiness: phrasePosRows' contract (no slot rows, or
    // no slot term in the vocabulary → the empty ranked relation) ---
    val proxable = pSample.nonEmpty &&
      dfsR.join(qp.select(col("term")).distinct(), Seq("term"),
        "left_semi").limit(1).collect().nonEmpty
    if (!sparseable && !proxable) return (emptySparse, emptyProx)
    // --- the ONE posting read: union fetch universe, both payloads ---
    val fetchTerms = (if (sparseable) selected.select(col("term"))
        else selected.select(col("term")).limit(0))
      .unionByName(if (proxable) qp.select(col("term"))
        else qp.select(col("term")).limit(0))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val fetchPairs = fetchTerms.join(dfsR, Seq("term"))
      .select(col("term"), col("gen")).distinct()
      .limit(pushdownMax + 1).collect()
    if (fetchPairs.isEmpty) return (emptySparse, emptyProx)
    val post = minusTombs(spark, stateDir,
      postingsFor(spark, stateDir, fetchPairs, fetchTerms, None, g)
        .select(col("term"), col("doc_id"), col("tf"), col("positions"))
        .distinct(), None)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hits = selected.join(post, Seq("term"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the standalone prox face's exact 3-column-distinct projection
    val pr = qp.join(post.select(col("term"), col("doc_id"),
          col("positions")).distinct(), Seq("term"))
      .select(col("query_id"), col("doc_id"), col("i"),
        explode(col("positions")).as("pos"))
    // --- the ONE candidate-bounded (dl, ttl) fetch for BOTH legs ---
    val candIds = hits.select(col("doc_id"))
      .unionByName(pr.select(col("doc_id"))).distinct()
    val dlAll = dlFor(spark, stateDir, g, candIds, None, withTtl = true)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sparse =
      if (!sparseable) emptySparse
      else rankFieldedHits(hits, dlAll.select(col("doc_id"), col("dl"),
        col("ttl")), nDocs, wTot)
    val prox =
      if (!proxable) emptyProx
      else rankNearTagged(pr, dlAll.select(col("doc_id"), col("ttl")),
        parsed, len)
    (sparse, prox)
  }

  /** Ordered proximity retrieval (NEAR) over the accumulated index:
    * minimal ordered window span of the query's phrase terms per
    * document (1 = exact adjacency), the relevance-graded relaxation
    * of [[queryPhrase]] — same posting fetch, same shared
    * linear-merge core (CorpusOps.nearRank) as the batch face.
    */
  def queryNear(spark: SparkSession, stateDir: String,
      queries: DataFrame,
      len: Int = graft.operators.CorpusOps.phraseLen,
      sloppy: Boolean = false, asOf: Option[Long] = None): DataFrame =
    phrasePosRows(spark, stateDir, queries, len, asOf) match {
      case None =>
        emptyRanked(spark, if (sloppy) "sloppy_micro" else "min_span")
      case Some(pr) =>
        graft.operators.CorpusOps.nearRank(pr, len, sloppy)
    }

  /** UNORDERED proximity over the accumulated index: minimal any-order
    * window of the query's phrase terms per document — same posting
    * fetch as [[queryNear]], the shared minimal-cover sweep
    * (CorpusOps.nearUnorderedRank) as the rank core, and the same
    * distinct-terms query contract as the batch face.
    */
  def queryNearUnordered(spark: SparkSession, stateDir: String,
      queries: DataFrame,
      len: Int = graft.operators.CorpusOps.phraseLen,
      sloppy: Boolean = false, asOf: Option[Long] = None): DataFrame =
    phrasePosRows(spark, stateDir, queries, len, asOf,
        distinctTerms = true) match {
      case None =>
        emptyRanked(spark, if (sloppy) "sloppy_micro" else "min_span")
      case Some(pr) =>
        graft.operators.CorpusOps.nearUnorderedRank(pr, len, sloppy)
    }

  /** LAYOUT MIGRATION: rebuild the DERIVED state — `postings`, the dl
    * column, and the count markers — from the layout-stable raw column
    * `docs.lt` (the lowered text survives every layout revision), and
    * stamp the current [[layoutVersion]]. One batch job over the
    * index; never a re-ingestion of the corpus. The transactional
    * shell (staging, verify, swap, crash recovery) is
    * [[LsmIndex.migrate]]'s.
    */
  def migrateState(spark: SparkSession, stateDir: String): Boolean = {
    // the rebuild keeps the state's recorded dir-domain geometry;
    // unparsable pre-geometry layouts rebuild at the production domain
    val gOld = LsmIndex.readLayout(spark, stateDir)
      .flatMap(parseGeom).getOrElse(defaultGeom)
    rebuildTo(spark, stateDir, gOld)
  }

  /** RE-DOMAIN (round 11, the growth half of the adaptive-domain
    * story): rebuild the state at the dir-domain geometry its CURRENT
    * live cardinality warrants — a state created small through
    * [[initState]] grows its fan-out as the corpus grows instead of
    * hitting per-dir file bloat at scale. GROW-ONLY (a shrinking
    * corpus never thrashes the domain back down; an explicit
    * [[migrateState]]-class rebuild is the shrink path if one is ever
    * wanted), pin-aware like compaction (the rebuild is an epoch
    * barrier — it consolidates history into `ingest=-1` — so it must
    * not seal generations a registered pin still addresses), and a
    * no-op while the recorded domain already fits. The measurement is
    * O(1): the live doc count from the ncount markers (deletes
    * subtract). Returns true iff a rebuild ran.
    */
  def redomainIfDue(spark: SparkSession, stateDir: String,
      expectedDocs: Option[Long] = None): Boolean = {
    ensureLayout(spark, stateDir)
    val gOld = geomOf(spark, stateDir)
    val n = expectedDocs.getOrElse(
      markers(stateDir).stored(spark).headOption.getOrElse(0L))
    val gNew = adaptiveGeom(n)
    if (gNew.db <= gOld.db && gNew.hx <= gOld.hx) return false
    if (LsmIndex.pinBlocksCompaction(spark, stateDir)) return false
    rebuildTo(spark, stateDir,
      Geom(math.max(gNew.db, gOld.db), math.max(gNew.hx, gOld.hx)))
  }

  /** Rebuild the derived state from the layout-stable raw columns at
    * TARGET geometry `gNew` (the recorded one for a version upgrade, a
    * larger one for a re-domain) inside [[LsmIndex.migrate]]'s
    * transactional shell.
    */
  private def rebuildTo(spark: SparkSession, stateDir: String,
      gNew: Geom): Boolean = {
    LsmIndex.migrate(spark, stateDir, layoutVersionFor(gNew)) {
        (oldRoot, staging) =>
      val fs = new org.apache.hadoop.fs.Path(oldRoot)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val docsPath = new org.apache.hadoop.fs.Path(s"$oldRoot/docs")
      if (fs.exists(docsPath)) {
        // tolerant read: NO forced schema — old layouts may partition
        // differently or carry extra columns; only the raw data
        // columns are contracted. Tombstoned docs are EXCLUDED: the
        // rebuild is where logical deletes become physical (their
        // postings, docs rows, and df contributions simply never land
        // in the staging), so the migrated state carries no tombs and
        // its markers/dfs re-derive from the surviving corpus alone —
        // a rebuild can never resurrect a deleted document.
        val tombsPath = new org.apache.hadoop.fs.Path(s"$oldRoot/tombs")
        val rawDocs = spark.read.parquet(docsPath.toString)
        // the field boundary is RAW data (it cannot re-derive from lt
        // — the title-first concat erased the seam): carry the stored
        // ttl, coalescing pre-v7 rows to the positional convention
        // they were folded under. Layouts predating even the stored
        // dl carry no boundary at all — docsRel then re-derives the
        // positional convention from the recomputed dl.
        val tt = lit(graft.operators.CorpusOps.titleTokens.toLong)
        val ttlSel: Seq[Column] =
          if (rawDocs.columns.contains("ttl") &&
              rawDocs.columns.contains("dl"))
            Seq(coalesce(col("ttl"), least(col("dl"), tt)).as("ttl"))
          else if (rawDocs.columns.contains("dl"))
            Seq(least(col("dl"), tt).as("ttl"))
          else Nil
        val rawAll = rawDocs
          .select(Seq(col("doc_id"), col("lt")) ++ ttlSel: _*).distinct()
        val raw = (if (fs.exists(tombsPath))
            rawAll.join(spark.read.parquet(tombsPath.toString)
              .select(col("doc_id")).distinct(), Seq("doc_id"), "left_anti")
          else rawAll)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val n = raw.count()
          // lt is already lowered; the shared tokenizer's lower() is
          // idempotent, so re-tokenizing lt equals tokenizing the
          // original text
          val asBatch = raw.select(
            Seq(col("doc_id"), col("lt").as("text")) ++
              (if (raw.columns.contains("ttl")) Seq(col("ttl"))
               else Nil): _*)
          val tf = tfRel(asBatch, gNew)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            val docs = docsRel(asBatch, tf, gNew)
            tf.withColumn("ingest", lit(-1L))
              .sortWithinPartitions(col("tpfx"), col("term"),
                col("doc_id"))
              .write.partitionBy("tpfx", "ingest")
              .parquet(s"$staging/postings")
            docs.withColumn("ingest", lit(-1L))
              .sortWithinPartitions(col("dbucket"), col("doc_id"))
              .write.partitionBy("dbucket", "ingest")
              .parquet(s"$staging/docs")
            // dfs rebuilt whole-corpus as the single gen=-1 generation
            // (sum over one generation = the exact corpus df)
            dfsRel(tf, docs, -1L).withColumn("ingest", lit(-1L))
              .sortWithinPartitions(col("dpfx"), col("term"))
              .write.partitionBy("dpfx", "ingest")
              .parquet(s"$staging/dfs")
            val staged = spark.read.schema(docsSchema)
              .parquet(s"$staging/docs")
            val got = staged.select(col("doc_id")).distinct().count()
            require(got == n,
              s"migration staging lost documents ($got != $n) for " +
                s"$oldRoot; original untouched")
            val totRow = staged.agg(
              coalesce(sum(col("dl")), lit(0L)),
              coalesce(sum(col("ttl")), lit(0L))).collect()(0)
            LsmIndex.Markers(staging).write(spark, -1L,
              Seq(n, totRow.getLong(0), totRow.getLong(1)))
          } finally tf.unpersist()
        } finally raw.unpersist()
      }
    }
  }

  /** File-source streaming runner: watch `sourceDir` for document
    * parquet and fold each micro-batch into the index. Pass
    * [[titledDocSchema]] as `sourceSchema` for a fielded corpus.
    */
  def start(spark: SparkSession, sourceDir: String, stateDir: String,
      checkpointDir: String,
      sourceSchema: StructType = docSchema): StreamingQuery = {
    spark.readStream
      .schema(sourceSchema)
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
