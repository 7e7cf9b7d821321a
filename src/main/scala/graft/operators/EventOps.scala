package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.{canon, canonOrderSql, load}

/** Event-sequence analytics over the events stream: ordered funnel
  * conversion and type-2 slowly-changing-dimension history. Both are
  * staples of the warehouse the reference feeds (its sales/audit
  * queries aggregate event-shaped rows; these are the sequence-aware
  * faces of the same data).
  *
  * Time comparisons happen in epoch MICROseconds on both engines
  * (Spark `unix_micros` ↔ DuckDB `epoch_us`) — never seconds, never
  * raw timestamps across the output boundary.
  */
object EventOps {

  /** Ordered funnel: view → click → purchase, strictly increasing in
    * event time per user. Step N's timestamp is the EARLIEST qualifying
    * event after step N-1's timestamp, so a user who clicked before
    * ever viewing does not count as converted.
    *
    * Scale (measured in the executed plan): each step reads its OWN
    * pruned scan — the event_type filter is pushed to parquet, so a
    * step never scans the other types' rows — and shuffles once on
    * user_id with map-side partial min()s; the view-step aggregate's
    * exchange is reused by both downstream consumers, and the tiny
    * per-step min-relations join via AQE-chosen broadcast locally
    * (co-partitioned SMJ at scale, where every side is already keyed
    * on user_id). Output is 3 rows. No window functions, no per-user
    * state: this is the join formulation that survives a billion-user
    * event log.
    */
  def funnelSteps(spark: SparkSession, sfDir: String): DataFrame = {
    val e = load(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"))
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("tus")).as("t1"))
    val c = e.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("tus") > col("t1"))
      .groupBy("user_id").agg(min(col("tus")).as("t2"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("tus") > col("t2"))
      .groupBy("user_id").agg(min(col("tus")).as("t3"))
    val out = v.select(lit("1_view").as("step"), col("user_id"))
      .union(c.select(lit("2_click").as("step"), col("user_id")))
      .union(p.select(lit("3_purchase").as("step"), col("user_id")))
      .groupBy("step").agg(count(lit(1)).as("n_users"))
    canon(out)
  }

  val funnelStepsSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_type, epoch_us(ts) AS tus FROM events
       |), v AS (
       |  SELECT user_id, min(tus) AS t1 FROM e
       |  WHERE event_type = 'view' GROUP BY user_id
       |), c AS (
       |  SELECT e.user_id AS user_id, min(tus) AS t2
       |  FROM e JOIN v ON e.user_id = v.user_id
       |  WHERE event_type = 'click' AND tus > t1 GROUP BY e.user_id
       |), p AS (
       |  SELECT e.user_id AS user_id, min(tus) AS t3
       |  FROM e JOIN c ON e.user_id = c.user_id
       |  WHERE event_type = 'purchase' AND tus > t2 GROUP BY e.user_id
       |)
       |SELECT step, count(*) AS n_users FROM (
       |  SELECT '1_view' AS step, user_id FROM v
       |  UNION ALL SELECT '2_click', user_id FROM c
       |  UNION ALL SELECT '3_purchase', user_id FROM p
       |) GROUP BY step
       |${canonOrderSql(Seq("step", "n_users"))}""".stripMargin

  /** Type-2 slowly-changing-dimension history: treat each user's event
    * stream as a state log (state = event_type), collapse consecutive
    * repeats (a no-op change opens no new version), and emit validity
    * ranges [valid_from, valid_to) with the open current version's
    * valid_to NULL. This is the history-preserving counterpart of the
    * type-1 `dim_upsert` (reference: bulk_loader.py's replace-style
    * dimension load keeps no history; a warehouse consumer needs both).
    *
    * Scale: two window functions over the SAME (user_id; tus, event_id)
    * partitioning/ordering — one shuffle + one sort, the second window
    * reuses both. The (tus, event_id) ordering key makes equal-time
    * events deterministic.
    */
  def scd2History(spark: SparkSession, sfDir: String): DataFrame = {
    val e = load(spark, sfDir, "events")
      .select(col("user_id"), col("event_type").as("state"),
        unix_micros(col("ts")).as("tus"), col("event_id"))
    val w = Window.partitionBy("user_id").orderBy(col("tus"), col("event_id"))
    val changes = e
      .withColumn("prev", lag(col("state"), 1).over(w))
      .filter(!(col("prev") <=> col("state")))
    val out = changes
      .withColumn("valid_to_us", lead(col("tus"), 1).over(w))
      .select(col("user_id"), col("state"),
        col("tus").as("valid_from_us"), col("valid_to_us"),
        when(col("valid_to_us").isNull, 1).otherwise(0).as("is_current"))
    canon(out)
  }

  val scd2HistorySql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_type AS state, epoch_us(ts) AS tus, event_id
       |  FROM events
       |), changes AS (
       |  SELECT user_id, state, tus, event_id
       |  FROM (
       |    SELECT *, lag(state) OVER (
       |      PARTITION BY user_id ORDER BY tus, event_id) AS prev
       |    FROM e)
       |  WHERE prev IS DISTINCT FROM state
       |)
       |SELECT user_id, state, tus AS valid_from_us,
       |  lead(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS valid_to_us,
       |  CASE WHEN lead(tus) OVER (
       |    PARTITION BY user_id ORDER BY tus, event_id) IS NULL
       |    THEN 1 ELSE 0 END AS is_current
       |FROM changes
       |${canonOrderSql(Seq("user_id", "state", "valid_from_us", "valid_to_us",
         "is_current"))}""".stripMargin

  /** Weighted PageRank over the event-type transition graph: edges are
    * consecutive-event pairs per user (one window pass), and five
    * power iterations rank which states user flows concentrate on —
    * the link-analysis primitive domain-ranking pipelines run, on the
    * graph this dataset actually contains. All rank arithmetic is
    * exact-integer µ-units (contribution = (r·w) div outw per edge,
    * damping = 30000 + (85·Σ) div 100), so the fixpoint is
    * bit-identical across engines and partitionings — the oracle
    * unrolls the same five iterations as chained CTEs.
    *
    * Scale: the ONE data-sized job is the edge build (a lag window
    * keyed by user_id + a transition rollup); iterations run on the
    * |states|² edge relation — bounded by the type domain, not the
    * corpus — so the loop costs five tiny jobs regardless of input
    * size. Same iterative discipline as dedup_clusters, but with
    * bounded state there is nothing to checkpoint.
    */
  private val prIters = 5

  def eventPagerank(spark: SparkSession, sfDir: String): DataFrame = {
    val e = load(spark, sfDir, "events")
      .select(col("user_id"), col("event_type").as("dst"),
        unix_micros(col("ts")).as("tus"), col("event_id"))
    val w = Window.partitionBy("user_id").orderBy(col("tus"), col("event_id"))
    val edges = Caching.persistOnce(e
      .withColumn("src", lag(col("dst"), 1).over(w))
      .filter(col("src").isNotNull)
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
      .withColumn("outw",
        sum(col("w")).over(Window.partitionBy(col("src")))))
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst"))).distinct()
    val r0 = nodes.withColumn("r", lit(200000L))
    val rFinal = (1 to prIters).foldLeft(r0) { case (r, _) =>
      val contribs = edges
        .join(r.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          expr("(r * w) div outw").as("contrib"))
        .groupBy("node").agg(sum(col("contrib")).as("contrib"))
      nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(30000L) + expr("(85 * coalesce(contrib, 0L)) div 100"))
            .as("r"))
    }
    canon(rFinal.select(col("node"), col("r").as("rank_micro")))
  }

  val eventPagerankSql: String = {
    val iter = (k: Int) =>
      s"""r$k AS (
         |  SELECT n.node AS node,
         |    CAST(30000 + (85 * coalesce(c.contrib, 0)) // 100 AS BIGINT) AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node, sum((r.r * e.w) // e.outw) AS contrib
         |    FROM edges e JOIN r${k - 1} r ON e.src = r.node
         |    GROUP BY e.dst) c ON n.node = c.node)"""
    s"""WITH seq AS (
       |  SELECT user_id, event_type AS dst, epoch_us(ts) AS tus, event_id,
       |    lag(event_type) OVER (
       |      PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS src
       |  FROM events
       |), e0 AS (
       |  SELECT src, dst, count(*) AS w FROM seq
       |  WHERE src IS NOT NULL GROUP BY src, dst
       |), edges AS (
       |  SELECT src, dst, w,
       |    sum(w) OVER (PARTITION BY src) AS outw
       |  FROM e0
       |), nodes AS (
       |  SELECT src AS node FROM edges UNION SELECT dst FROM edges
       |), r0 AS (SELECT node, 200000 AS r FROM nodes),
       |${(1 to prIters).map(iter).mkString(",\n").stripMargin}
       |SELECT node, r AS rank_micro FROM r$prIters
       |${canonOrderSql(Seq("node", "rank_micro"))}""".stripMargin
  }

  /** Retention cohort grid: users bucketed by the week they FIRST
    * appeared, then (cohort_week, weeks-since-first) cells counting
    * distinct returning users and their events — the standard retention
    * triangle. Weeks are pure integer day-arithmetic (`days-since-epoch
    * div 7`), not calendar `date_trunc` — no engine-specific
    * week-start convention can diverge, and the cohort key stays a
    * compact BIGINT index.
    *
    * Scale: two shuffles — min(date) per user (map-side partials), then
    * the cohort-cell aggregate whose distinct-count keys on
    * (cohort, offset, user) before collapsing; the enrich join keys on
    * user_id both sides, so at scale it co-partitions with the first
    * aggregate's exchange rather than adding a third shuffle.
    */
  def retentionCohorts(spark: SparkSession, sfDir: String): DataFrame = {
    val e = load(spark, sfDir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d"))
    val first = e.groupBy(col("user_id")).agg(min(col("d")).as("d0"))
    val out = e.join(first, Seq("user_id"))
      .select(col("user_id"),
        // FLOOR week index: a pre-1970 cohort date must land in the
        // preceding week, not truncate toward week 0 (week_offset is
        // non-negative by construction — d >= d0 — so plain div is fine)
        expr("(datediff(d0, date'1970-01-01') - " +
          "pmod(datediff(d0, date'1970-01-01'), 7)) div 7")
          .as("cohort_week"),
        expr("datediff(d, d0) div 7").as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
    canon(out)
  }

  val retentionCohortsSql: String =
    s"""WITH e AS (
       |  SELECT user_id, CAST(ts AS DATE) AS d FROM events
       |), f AS (
       |  SELECT user_id, min(d) AS d0 FROM e GROUP BY 1
       |), x AS (
       |  SELECT e.user_id,
       |    (date_diff('day', DATE '1970-01-01', f.d0)
       |      - ((date_diff('day', DATE '1970-01-01', f.d0) % 7) + 7) % 7)
       |      // 7 AS cohort_week,
       |    date_diff('day', f.d0, e.d) // 7 AS week_offset
       |  FROM e JOIN f USING (user_id)
       |)
       |SELECT cohort_week, week_offset,
       |  count(DISTINCT user_id) AS n_users, count(*) AS n_events
       |FROM x GROUP BY 1, 2
       |${canonOrderSql(Seq("cohort_week", "week_offset", "n_users",
         "n_events"))}""".stripMargin

  /** A/B experiment readout: users deterministically assigned to
    * variants by salted content hash (RNG-free — re-runs, retries, and
    * both engines agree on every assignment), conversion = a high-value
    * purchase, and the two-proportion comparison emitted as exact
    * µ-unit rates plus a pooled z-score. The z is the one
    * floating-point emission: a single IEEE expression tree (divisions,
    * sqrt — both correctly rounded) written identically on both
    * engines, floored to µ-units (no round-half hazard).
    *
    * Scale: two distinct-aggregates keyed on user_id and one 1-row
    * summary — the experiment readout never materializes more than its
    * per-variant counters, at any corpus size.
    */
  def abTest(spark: SparkSession, sfDir: String): DataFrame = {
    val e = load(spark, sfDir, "events")
    val u = e.select(col("user_id")).distinct()
      .withColumn("variant", expr(
        "if(cast(conv(substr(md5(concat('ab:', cast(user_id as string))), 1, 8), 16, 10) as bigint) % 2 = 0, 'A', 'B')"))
    val conv = e
      .filter(col("event_type") === "purchase" && col("value") > 200.0)
      .select(col("user_id")).distinct()
      .withColumn("cv", lit(1L))
    val agg = u.join(conv, Seq("user_id"), "left").agg(
      sum(when(col("variant") === "A", 1L).otherwise(0L)).as("n_a"),
      sum(when(col("variant") === "B", 1L).otherwise(0L)).as("n_b"),
      sum(when(col("variant") === "A" && col("cv").isNotNull, 1L)
        .otherwise(0L)).as("conv_a"),
      sum(when(col("variant") === "B" && col("cv").isNotNull, 1L)
        .otherwise(0L)).as("conv_b"))
    val out = agg
      .withColumn("rate_a_micro", expr("(conv_a * 1000000L) div n_a"))
      .withColumn("rate_b_micro", expr("(conv_b * 1000000L) div n_b"))
      .withColumn("lift_micro", col("rate_b_micro") - col("rate_a_micro"))
      .withColumn("z_micro", expr(
        """cast(floor(
          |  ((cast(conv_b as double) / cast(n_b as double))
          |    - (cast(conv_a as double) / cast(n_a as double)))
          |  / sqrt(
          |      ((cast(conv_a as double) + cast(conv_b as double))
          |        / (cast(n_a as double) + cast(n_b as double)))
          |      * (1.0 - ((cast(conv_a as double) + cast(conv_b as double))
          |        / (cast(n_a as double) + cast(n_b as double))))
          |      * ((1.0 / cast(n_a as double)) + (1.0 / cast(n_b as double))))
          |  * 1000000.0) as bigint)""".stripMargin))
    canon(out)
  }

  val abTestSql: String =
    s"""WITH u AS (SELECT DISTINCT user_id FROM events),
       |v AS (
       |  SELECT user_id,
       |    CASE WHEN ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 = 0
       |         THEN 'A' ELSE 'B' END AS variant
       |  FROM u
       |), c AS (
       |  SELECT DISTINCT user_id FROM events
       |  WHERE event_type = 'purchase' AND value > 200.0
       |), agg AS (
       |  SELECT
       |    CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |    CAST(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |    CAST(sum(CASE WHEN variant = 'A' AND c.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS conv_a,
       |    CAST(sum(CASE WHEN variant = 'B' AND c.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS conv_b
       |  FROM v LEFT JOIN c USING (user_id)
       |)
       |SELECT n_a, n_b, conv_a, conv_b,
       |  (conv_a * 1000000) // n_a AS rate_a_micro,
       |  (conv_b * 1000000) // n_b AS rate_b_micro,
       |  (conv_b * 1000000) // n_b - (conv_a * 1000000) // n_a AS lift_micro,
       |  CAST(floor(
       |    ((CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
       |      - (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)))
       |    / sqrt(
       |        ((CAST(conv_a AS DOUBLE) + CAST(conv_b AS DOUBLE))
       |          / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
       |        * (1.0 - ((CAST(conv_a AS DOUBLE) + CAST(conv_b AS DOUBLE))
       |          / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))))
       |        * ((1.0 / CAST(n_a AS DOUBLE)) + (1.0 / CAST(n_b AS DOUBLE))))
       |    * 1000000.0) AS BIGINT) AS z_micro
       |FROM agg
       |${canonOrderSql(Seq("n_a", "n_b", "conv_a", "conv_b",
         "rate_a_micro", "rate_b_micro", "lift_micro", "z_micro"))}""".stripMargin

  // ---------------------------------------------------------------------
  // trend_slope — per-user exact-integer OLS trend
  // ---------------------------------------------------------------------

  /** Per-user linear trend of value over time: the OLS slope
    * (n·Σxy − Σx·Σy) / (n·Σxx − Σx²) computed ENTIRELY in exact integer
    * arithmetic — x is whole hours since the user's first event, y is
    * exact cents (DECIMAL(18,2)·100), the four moment sums and the
    * final ratio run in 128-bit (DECIMAL(38,0) / HUGEINT; the
    * numerator n·Σxy·10⁶ overflows BIGINT at ordinary activity levels),
    * and the slope floors to µ-cents-per-hour. No float enters at any
    * point, so the oracle hash-matches regardless of summation order —
    * the same discipline that makes this trustworthy across 1000
    * executors. Users with a degenerate x spread (one event, or all in
    * one hour bucket) emit NULL rather than a fake slope.
    *
    * Scale: one user-keyed aggregate with map-side partials (moment
    * sums are associative — this is the mergeable-statistics shape),
    * anchored on a per-user min that co-partitions with the main
    * aggregate's shuffle.
    *
    * Known engine asymmetry at the 128-bit CEILING: if a decimal(38,0)
    * product itself overflows 38 digits (≳10³⁸ — ~10²⁵ events per user
    * at these unit scales, beyond any physical corpus), Spark's
    * non-ANSI decimal arithmetic yields NULL for that user while the
    * HUGEINT oracle raises. The failure mode is a NULL slope, never a
    * silently wrong one — the reason decimal(38,0) is used instead of
    * BIGINT, which wraps silently at ~9.2e18.
    */
  def trendSlope(spark: SparkSession, sfDir: String): DataFrame = {
    val e = load(spark, sfDir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        col("value"))
    val t0 = e.groupBy(col("user_id")).agg(min(col("tus")).as("t0"))
    val xy = e.join(t0, Seq("user_id")) // co-partitions with the agg below
      .select(col("user_id"),
        expr("cast((tus - t0) div 3600000000L as decimal(38,0))").as("x"),
        expr("cast(cast(value as decimal(18,2)) * 100 as decimal(38,0))")
          .as("y"))
    val out = xy.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("user_id"), col("n_events"),
        expr("""cast(CASE
                |  WHEN n_events * sxx - sx * sx = 0 THEN NULL
                |  ELSE (1000000 * (n_events * sxy - sx * sy))
                |       div (n_events * sxx - sx * sx)
                |END as bigint)""".stripMargin).as("slope_micro"))
    canon(out)
  }

  val trendSlopeSql: String =
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(ts) AS tus, value FROM events
       |), t0 AS (
       |  SELECT user_id, min(tus) AS t0 FROM e GROUP BY 1
       |), xy AS (
       |  SELECT e.user_id,
       |    CAST((e.tus - t0.t0) // 3600000000 AS HUGEINT) AS x,
       |    CAST(CAST(e.value AS DECIMAL(18,2)) * 100 AS HUGEINT) AS y
       |  FROM e JOIN t0 USING (user_id)
       |), m AS (
       |  SELECT user_id, count(*) AS n_events,
       |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
       |  FROM xy GROUP BY 1
       |)
       |SELECT user_id, n_events,
       |  CAST(CASE
       |    WHEN n_events * sxx - sx * sx = 0 THEN NULL
       |    ELSE (1000000 * (n_events * sxy - sx * sy))
       |         // (n_events * sxx - sx * sx)
       |  END AS BIGINT) AS slope_micro
       |FROM m
       |${canonOrderSql(Seq("user_id", "n_events", "slope_micro"))}""".stripMargin

  // ---------------------------------------------------------------------
  // event_transitions — first-order Markov transition matrix
  // ---------------------------------------------------------------------

  /** First-order Markov transition matrix over per-user event streams:
    * for every ordered pair of event types, the count of adjacent
    * (prev → next) transitions and the exact µ-unit conditional
    * probability p(next | prev) — the behavioral model behind
    * session-flow analysis and synthetic-trace generation. Ordering is
    * the deterministic (tus, event_id) discipline; probabilities are
    * integer-division µ-units (no float), so rows hash-match.
    *
    * Scale: one user-keyed window for the lag (the sessionize shuffle
    * shape), then an aggregate at |event_types|² cardinality — the
    * output is domain-bounded however large the corpus.
    */
  def eventTransitions(spark: SparkSession, sfDir: String): DataFrame = {
    val e = load(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"), col("event_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
    val pairs = e
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
    val out = pairs.groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n_trans"))
      .withColumn("n_from",
        sum(col("n_trans")).over(Window.partitionBy(col("prev_type"))))
      .select(col("prev_type"), col("next_type"), col("n_trans"),
        // 128-bit numerator (the pmi_cooccur discipline): n_trans·1e6
        // wraps BIGINT at ~9.2e12 transitions in one matrix cell —
        // reachable at corpus scale — and Spark wraps SILENTLY while
        // the HUGEINT oracle raises, so the overflow would surface as
        // a quiet divergence, not an error
        expr("cast((cast(n_trans as decimal(38,0)) * 1000000) " +
          "div n_from as bigint)").as("p_micro"))
    canon(out)
  }

  val eventTransitionsSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_type, epoch_us(ts) AS tus, event_id
       |  FROM events
       |), p AS (
       |  SELECT user_id, event_type,
       |    lag(event_type) OVER (PARTITION BY user_id
       |      ORDER BY tus, event_id) AS prev_type
       |  FROM e
       |), c AS (
       |  SELECT prev_type, event_type AS next_type, count(*) AS n_trans
       |  FROM p WHERE prev_type IS NOT NULL
       |  GROUP BY 1, 2
       |)
       |SELECT prev_type, next_type, n_trans,
       |  CAST((CAST(n_trans AS HUGEINT) * 1000000) //
       |    (sum(n_trans) OVER (PARTITION BY prev_type)) AS BIGINT) AS p_micro
       |FROM c
       |${canonOrderSql(Seq("prev_type", "next_type", "n_trans",
         "p_micro"))}""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "funnel_steps" -> funnelSteps,
    "trend_slope" -> trendSlope,
    "event_transitions" -> eventTransitions,
    "scd2_history" -> scd2History,
    "event_pagerank" -> eventPagerank,
    "retention_cohorts" -> retentionCohorts,
    "ab_test" -> abTest)

  val oracles: Map[String, String] = Map(
    "funnel_steps" -> funnelStepsSql,
    "trend_slope" -> trendSlopeSql,
    "event_transitions" -> eventTransitionsSql,
    "scd2_history" -> scd2HistorySql,
    "event_pagerank" -> eventPagerankSql,
    "retention_cohorts" -> retentionCohortsSql,
    "ab_test" -> abTestSql)
}
