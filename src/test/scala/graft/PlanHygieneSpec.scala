package graft

import org.apache.spark.sql.execution.FormattedMode

/** Regression guard for plan hygiene — the properties that make these
  * operators scale-safe must stay visible in the physical plan:
  * predicate pushdown to the parquet scan, column pruning, and broadcast
  * joins on dimension tables (never a shuffle of the fact for dim joins).
  */
class PlanHygieneSpec extends SparkSpecBase {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution
      .explainString(FormattedMode)

  /** Round 16: the IVF/PQ faces score every vector against every
    * centroid through ONE bounded broadcast cross (N×k rows, k tiny
    * centroid-array rows broadcast) instead of the exploded
    * join-on-pos + hash-aggregate shape. That deliberate kernel is the
    * only nested-loop allowed: every BNLJ tree node must be the
    * Cross BuildRight broadcast of the array relation, and the plan
    * must carry the array-native distance expression. Candidate
    * generation stays equi-join — asserted per face on its keys.
    */
  private def assertOnlyKernelCross(p: String, face: String): Unit = {
    assert(!p.contains("CartesianProduct"),
      s"$face: a true cartesian appeared")
    val bnlj = p.linesIterator.filter(l =>
      l.contains("BroadcastNestedLoopJoin") && l.contains("- "))
    assert(bnlj.forall(_.contains("Cross BuildRight")),
      s"$face: a nested-loop join other than the bounded centroid " +
        "kernel cross appeared")
    assert(p.contains("graft_qdist"),
      s"$face: native quantized-distance kernel missing — the cross " +
        "is not the centroid scoring pass")
  }

  test("sales_rollup: filters pushed to scans, dims broadcast, no sort-merge join") {
    val p = plan("sales_rollup")
    assert(p.contains("PushedFilters"), "no pushdown visible")
    assert(p.contains("GreaterThan(l_shipdate"), "shipdate filter not pushed to scan")
    assert(p.contains("Not(EqualTo(o_orderstatus,P))"), "status filter not pushed to scan")
    assert(p.contains("BroadcastHashJoin"), "dims not broadcast")
    assert(!p.contains("SortMergeJoin"), "unexpected shuffle join for a dim")
  }

  test("sales_rollup: lineitem scan prunes to the 7 needed columns") {
    val p = plan("sales_rollup")
    val readSchemas = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    val liSchema = readSchemas.find(_.contains("l_orderkey")).get
    assert(!liSchema.contains("l_tax"), "unused column read from lineitem")
    assert(!liSchema.contains("l_suppkey"), "unused column read from lineitem")
  }

  test("events_filtered: all four predicates reach the scan") {
    val p = plan("events_filtered")
    assert(p.contains("PushedFilters"))
    assert(p.contains("In(event_type"), "IN-list not pushed")
    assert(p.contains("GreaterThan(value,10.0)"), "range filter not pushed")
  }

  test("hierarchy_join: both dims broadcast") {
    val p = plan("hierarchy_join")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("lot_fallback: equi-joins only (no nested loop), events scan pruned to the needed columns") {
    val p = plan("lot_fallback")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "fallback coalesce must stay an equi-join family on user_id")
    val evSchema = p.linesIterator.filter(_.contains("ReadSchema"))
      .find(_.contains("event_type")).get
    assert(!evSchema.contains("props"),
      "unused props column read from events")
    assert(!evSchema.contains("event_id"),
      "unused event_id column read from events")
  }

  test("lot_updates_report: orders scan pruned to custkey+orderdate; one aggregate pass, no second orders shuffle") {
    val p = plan("lot_updates_report")
    val oSchema = p.linesIterator.filter(_.contains("ReadSchema"))
      .find(_.contains("o_custkey")).get
    assert(!oSchema.contains("o_totalprice") && !oSchema.contains("o_comment"),
      "unused columns read from orders")
    // first_loaded and last_updated are conditional min/max in ONE
    // aggregate: only one orders-side hashpartitioning(custkey) exchange
    val custShuffles = "hashpartitioning\\(custkey".r.findAllIn(p).length +
      "hashpartitioning\\(o_custkey".r.findAllIn(p).length
    assert(custShuffles <= 2, // partial/final agg pair + possible join side
      s"orders aggregated more than once: $custShuffles custkey exchanges")
  }

  test("conditional_agg: exactly one data shuffle (partial agg is map-side)") {
    val p = plan("conditional_agg")
    // FormattedMode lists partitioning on Arguments lines
    val dataShuffles = "hashpartitioning\\(".r.findAllIn(p).length
    assert(dataShuffles == 1,
      s"expected 1 hash exchange (partial+final agg), found $dataShuffles")
    assert(p.contains("HashAggregate"), "hash aggregation expected")
  }

  test("sales_rollup: oversized SF-scaled dims fall back to SMJ, fixed dims stay broadcast") {
    // SF-scaled dims (customer/part) carry NO forced broadcast hint, so when
    // they exceed spark.sql.autoBroadcastJoinThreshold the planner must pick
    // a shuffle join instead of OOMing on a forced broadcast. Shrinking the
    // threshold makes every hint-free table "oversized" at test SF — the
    // 100 TB shape in miniature.
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "1KB")
      val p = plan("sales_rollup")
      assert(p.contains("SortMergeJoin"),
        "customer/part above the broadcast threshold must degrade to a shuffle join")
      assert(p.contains("BroadcastHashJoin"),
        "fixed-cardinality nation/region hints must survive regardless of threshold")
    } finally spark.conf.set(key, old)
  }

  test("dim_upsert: oversized update set falls back to SMJ (no forced broadcast)") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "1KB")
      val p = plan("dim_upsert")
      assert(p.contains("SortMergeJoin"),
        "updates above the broadcast threshold must degrade to a shuffle join")
    } finally spark.conf.set(key, old)
  }

  test("cosine_pairs: native graft_dot expression in the plan (no HOF lambdas)") {
    val p = plan("cosine_pairs")
    assert(p.contains("graft_dot"), "native dot-product expression missing")
    assert(!p.contains("lambdafunction"), "interpreted HOF lambda in hot path")
  }

  test("partition_pruned: event_type predicate prunes at the directory level") {
    val p = plan("partition_pruned")
    val pf = p.linesIterator.filter(_.contains("PartitionFilters")).toSeq
    assert(pf.nonEmpty, "no PartitionFilters on the partitioned scan")
    assert(pf.exists(_.contains("click")),
      s"event_type=click not pushed to partition pruning: $pf")
  }

  test("dpp_join: runtime dynamic partition pruning reaches the fact scan") {
    val p = plan("dpp_join")
    assert(p.contains("dynamicpruning"),
      "no dynamicpruningexpression in the fact scan's PartitionFilters — " +
        "the dim filter is not pruning fact partitions at runtime")
    // and the pruning must be RUNTIME-only: no static literal on the
    // partition column anywhere in the scan
    val pf = p.linesIterator.filter(_.contains("PartitionFilters")).mkString
    assert(!pf.contains("= click") && !pf.contains("= view"),
      "partition pruning must come from the dim join, not a static literal")
  }

  test("minhash_lsh: native overlap verify — no explode anywhere in the plan") {
    val p = plan("minhash_lsh")
    assert(p.contains("graft_minhash"), "native signature expression missing")
    assert(p.contains("graft_shingle_overlap"),
      "pair verify must use the native shingle-overlap kernel")
    // the 4-way band stack generator is intrinsic to LSH banding; the
    // SHINGLE explode (rows per 3-gram, the scale hazard) must be gone
    assert(!p.contains("explode"),
      "shingle explode survives in the LSH path — the exploded relation " +
        "should be gone now that the verify is per-pair native")
  }

  test("contamination_check: bloom pre-filter guards the exact semi-join") {
    val p = plan("contamination_check")
    assert(p.contains("might_contain"),
      "bloom pre-filter missing — the full shingle stream would shuffle " +
        "into the membership join at scale")
    assert(p.contains("LeftSemi"), "exact semi-join verify must remain")
  }

  test("dup_ngram_spans: bloom pre-filter ahead of the shared-gram semi-join") {
    val p = plan("dup_ngram_spans")
    assert(p.contains("might_contain"),
      "bloom pre-filter missing — every gram position would shuffle " +
        "into the shared-gram join at scale")
    assert(p.contains("LeftSemi"), "exact semi-join verify must remain")
  }

  test("simhash: native graft_simhash, no explode/aggregate/shuffle before the output sort") {
    val p = plan("simhash")
    assert(p.contains("graft_simhash"), "native simhash expression missing")
    assert(!p.contains("Generate"), "token explode should be gone")
    assert(!p.contains("HashAggregate"), "bit-vote aggregation should be gone")
    // only exchange allowed is the canonical output sort's range partition
    assert(!p.contains("hashpartitioning("), "unexpected data shuffle")
  }

  test("nullsafe_join: <=> plans as a hash join, never a nested loop") {
    val p = plan("nullsafe_join")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "null-safe equality degenerated to a nested loop")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      "expected a keyed join on the null-safe bucket")
  }

  test("zorder_layout: chunking is a projection — no window, no global sort before the rollup") {
    val p = plan("zorder_layout")
    assert(!p.contains("Window"), "z-chunking must not use a window function")
    // one aggregate pair (partial+final) over the projected chunk id
    assert(p.contains("HashAggregate"), "chunk rollup missing")
  }

  test("tokenizer_apply / dataset_split: the split is shuffle-free and the vocab join is not forced") {
    val ps = plan("dataset_split")
    assert(!ps.contains("hashpartitioning("),
      "dataset_split should be a stateless projection (plus output sort)")
    val pt = plan("tokenizer_apply")
    assert(pt.contains("sort_array"),
      "the id sequence must sort by position before the digest " +
        "(collect_list order is nondeterministic)")
  }

  test("table_profile faces: NO Expand in either plan (melt + single-distinct replaced it, measured 2× cheaper)") {
    val exact = plan("table_profile")
    assert(!exact.contains("Expand"),
      "the exact profiler regressed to the multi-DISTINCT Expand plan")
    val approx = plan("table_profile_approx")
    assert(!approx.contains("Expand"),
      "the approx profiler must not contain an Expand")
    assert(approx.contains("approx_count_distinct") ||
      approx.contains("HyperLogLog"), "sketch aggregate missing from plan")
  }

  test("length_outliers_approx: sketch quartiles are one mergeable aggregate, not a rank window") {
    val p = plan("length_outliers_approx")
    assert(p.contains("percentile_approx") || p.contains("ApproximatePercentile"),
      "approx quantile sketch missing from plan")
    // the exact-anchor branch still windows; the SKETCH branch must not
    // add a second one — exactly one window (from exactLengthFences)
    val windows = p.linesIterator.count(_.trim.startsWith("Window"))
    assert(windows <= 2, s"sketch branch leaked extra rank windows: $windows")
  }

  test("doc_chunk: one Generate in the pipeline, no shuffle except the canonical sort") {
    val p = plan("doc_chunk")
    assert(p.linesIterator.count(
        _.trim.matches("""\(\d+\) Generate.*""")) == 1,
      "chunking must be a single streamed Generate")
    // the only exchange is the range partitioning for the output sort —
    // a chunker that shuffles data to chunk has lost the pipeline shape
    assert(p.linesIterator.count(
        _.trim.matches("""\(\d+\) Exchange.*""")) == 1 &&
      p.contains("rangepartitioning"),
      "unexpected exchanges in a pipeline-only operator")
  }

  test("contamination_neardup: equi bucket join, never a cross product") {
    val p = plan("contamination_neardup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "cross-corpus candidates must come from the banded equi-join")
    assert(p.contains("graft_shingle_overlap") ||
      p.contains("ShingleOverlap"),
      "candidate-only verify kernel missing from the plan")
  }

  test("ann_lsh_auto: equi (tbl, bucket) candidate join with the native dot kernel — no cross product, cached relations reused") {
    val p = plan("ann_lsh_auto")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "candidates must come from the (tbl, bucket) equi-join, " +
        "never an all-pairs product")
    assert(p.contains("graft_dot") || p.contains("DotProduct"),
      "native dot kernel missing — scoring fell back to HOF lambdas")
    // the vector and bucket relations each feed both sides of a
    // self-join; without InMemoryRelation reuse every plane dot and
    // norm would compute twice
    assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"),
      "persisted self-join inputs missing from the plan")
    spark.catalog.clearCache()
  }

  test("ann_ivf_subcell_probe: probe fan-out stays an equi (cell, sub) join — candidate side never a product, native dot kernel") {
    val p = plan("ann_ivf_subcell_probe")
    assertOnlyKernelCross(p, "ann_ivf_subcell_probe")
    // Hamming-1 probing must explode the query side and equi-join on
    // (cell, sub), never widen the CANDIDATE side to an all-pairs
    // product — the keys must be visible on a hash/merge join
    assert("""Left keys \[2\]: \[cell#""".r.findFirstIn(p).nonEmpty,
      "candidate join lost its (cell, sub) equi keys")
    assert(p.contains("graft_dot") || p.contains("DotProduct"),
      "native dot kernel missing — scoring fell back to HOF lambdas")
    spark.catalog.clearCache()
  }

  test("bm25_topk: source filters pushed to both scans, pruned ReadSchema, tf relation persisted, no cartesian") {
    val p = plan("bm25_topk")
    assert(p.contains("EqualTo(source,src0)"),
      "eval-slice filter not pushed to the query scan")
    assert(p.contains("Not(EqualTo(source,src0))"),
      "train-slice filter not pushed to the corpus scan")
    val schemas = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(schemas.nonEmpty && schemas.forall(s =>
      !s.contains("lang") && !s.contains("n_chars")),
      "unused documents columns read")
    assert(!p.contains("CartesianProduct"),
      "a true cartesian appeared — only the broadcast 1-row stamp " +
        "cross is allowed")
    // tf feeds dl, df AND the posting fetch — without persistence the
    // corpus explode+agg would run three times
    assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"),
      "persisted tf relation missing from the plan")
    spark.catalog.clearCache()
  }

  test("ann_pq: seed pick is a distributed top-K, codebooks broadcast, candidates label-equi — candidate side never a product") {
    val p = plan("ann_pq")
    assertOnlyKernelCross(p, "ann_pq")
    assert("""Left keys \[1\]: \[label#""".r.findFirstIn(p).nonEmpty,
      "candidates must stay label-blocked equi-joins, never all-pairs")
    assert(p.contains("TakeOrderedAndProject"),
      "seed pick must plan as a distributed top-K, not a global sort")
    assert(p.contains("BroadcastExchange"),
      "codebook joins must broadcast the K·D-row centroid relations")
    // the c1 distance relation serves encode AND the ADC distance table
    assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"),
      "persisted d1 relation missing — the vectors×K distance build " +
        "would run twice")
    spark.catalog.clearCache()
  }

  test("ann_ivf_pq: candidates blocked on the DERIVED cell, codebooks broadcast, candidate side never a product") {
    val p = plan("ann_ivf_pq")
    assertOnlyKernelCross(p, "ann_ivf_pq")
    assert("""Left keys \[1\]: \[cand#""".r.findFirstIn(p).nonEmpty,
      "candidates must stay derived-cell equi-joins, never all-pairs")
    assert(p.contains("TakeOrderedAndProject"),
      "seed pick must plan as a distributed top-K")
    assert(p.contains("BroadcastExchange"),
      "coarse centroids / codebooks must broadcast")
    assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"),
      "the shared assignment/d1 relations must be persisted")
    spark.catalog.clearCache()
  }

  test("hybrid_topk: dense leg stays label-equi, fusion is a keyed outer join — no cartesian anywhere") {
    val p = plan("hybrid_topk")
    assert(!p.contains("CartesianProduct"),
      "a true cartesian appeared")
    // the only nested-loop join allowed is the sparse leg's 1-row
    // broadcast stamp (N/totdl); the dense leg must block on the IVF
    // label and the fusion must join on (query_id, doc_id)
    // node detail headers look like "(54) BroadcastNestedLoopJoin" —
    // count NODES, not tree+detail line pairs
    val bnlj = "\\(\\d+\\) BroadcastNestedLoopJoin".r
      .findAllIn(p).length
    assert(bnlj <= 1,
      s"$bnlj nested-loop joins — only the bm25 stamp cross is allowed")
    assert(p.contains("FullOuter"),
      "leg fusion must be the full outer join (a doc may appear in " +
        "either leg alone)")
    assert(p.contains("EqualTo(source,src0)") &&
      p.contains("Not(EqualTo(source,src0))"),
      "query/corpus slice filters not pushed to the documents scans")
    spark.catalog.clearCache()
  }

  test("bm25_index_topk: posting fetch is partition-pruned and term-pushed; no index-wide scan") {
    // build (or reuse) the in-process index state, then inspect the
    // QUERY face's plan
    val df = SparkEntry.queries("bm25_index_topk")(spark, sf)
    val p = df.queryExecution.explainString(FormattedMode)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "retrieval over the index must stay keyed joins")
    // the tpfx dir shortlist must reach the postings scan as a
    // partition filter, and (round 10) the dfs-derived generation
    // shortlist must prune (tpfx, ingest) PAIR dirs — the exact
    // per-term generation pruning that supersedes a bloom sidecar
    assert(p.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("tpfx")),
      "tpfx dir shortlist did not become a partition filter — the " +
        "posting fetch would list the whole index")
    assert(p.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("concat_ws") &&
        l.contains("ingest")),
      "the (tpfx, ingest) generation shortlist did not become a " +
        "partition filter — posting reads would touch every generation")
    // term selection reads the dfs sub-table first: its dpfx dirs are
    // partition-pruned and the query terms push down to its row groups
    assert(p.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("dpfx")),
      "dfs dir shortlist did not become a partition filter")
    assert(p.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("In(term")),
      "term IN predicate did not reach the parquet row-group stats")
    spark.catalog.clearCache()
  }

  test("round-11-late faces: no cartesian anywhere; snippets and unordered NEAR broadcast their small sides; full-BM25 source filters pushed") {
    for (name <- Seq("bm25_full_topk", "near_unordered",
        "search_snippets", "hybrid_full_topk")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"),
        s"$name plans a cartesian product")
    }
    // the corpus split reaches the documents scan as a pushed filter
    val pf = plan("bm25_full_topk")
    assert(pf.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("source")),
      "the src0/train split must push to the documents scan")
    // the queries x phraseLen side broadcasts on the positional faces
    assert(plan("near_unordered").contains("BroadcastHashJoin"),
      "unordered NEAR's phrase side should broadcast")
    assert(plan("search_snippets").contains("BroadcastHashJoin"),
      "snippets' phrase side should broadcast")
    spark.catalog.clearCache()
  }

  test("boolean/prefix/facet/fielded faces: no cartesian; source split pushed; the one crossJoin is the 1-row stamp") {
    for (name <- Seq("bool_topk", "bm25_prefix_topk", "search_facets",
        "bm25f_topk")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"),
        s"$name plans a cartesian product")
      assert(p.linesIterator.exists(l =>
        l.contains("PushedFilters") && l.contains("source")),
        s"$name: the src0/train split must push to the documents scan")
    }
    // prefix expansion joins the vocabulary on the computed prefix key
    // — a hash join; the only nested loop allowed is the 1-row corpus
    // stamp's broadcast cross
    val pp = plan("bm25_prefix_topk")
    assert(pp.contains("BroadcastHashJoin"),
      "prefix expansion must be an equi-join on the prefix key")
    // FormattedMode prints each operator twice (tree sketch + numbered
    // detail section) — count node detail headers "(N) ...", never raw
    // substring occurrences
    val bnljNodes = "\\(\\d+\\) BroadcastNestedLoopJoin".r
      .findAllIn(pp).length
    assert(bnljNodes <= 1,
      s"$bnljNodes nested loops — only the 1-row stamp may plan one")
    spark.catalog.clearCache()
  }
}
