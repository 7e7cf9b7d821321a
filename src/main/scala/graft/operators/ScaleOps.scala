package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{canon, canonOrderSql, load}
import graft.plans.ScaleJoins

/** Driver-gated faces of the 100 TB join techniques (plans/ScaleJoins):
  * a pre-bucketed co-located join and a salted skew join, each with a
  * DuckDB oracle so the driver verifies the technique produces exactly
  * the plain-join semantics. The plan-level properties (zero exchanges
  * for the bucketed join, multiset equality for the salted join) are
  * asserted in ScaleJoinsSpec; these queries make the driver gate
  * exercise the same code paths round over round.
  */
object ScaleOps {

  /** Bucketed co-located join: both sides written bucketed+sorted on the
    * join key (the shuffle paid once at write time), read back and joined
    * bucket-to-bucket, then rolled up. At 100 TB this is the amortized
    * shape for any fact⋈fact join that recurs across runs — every
    * subsequent join of the bucketed copies is exchange-free.
    */
  // One bucketed write per (session, dataset): bucketing's contract is
  // "shuffle once at write time, join exchange-free forever after" — so
  // repeated calls (bench warm+timed) measure the amortized join, not a
  // redundant rewrite. TmpData provides the per-(process, dataset)
  // isolation, atomic mark-after-success write-once, and exit cleanup.
  def bucketedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val tag = TmpData.tag(sfDir)
    val base = TmpData.path("bucketed", tag)
    val (liTbl, oTbl) = (s"graft_li_bkt_$tag", s"graft_o_bkt_$tag")
    TmpData.once(s"bucketed:${spark.hashCode}:$tag") {
      val li = load(spark, sfDir, "lineitem")
        .select("l_orderkey", "l_quantity", "l_extendedprice")
      val o = load(spark, sfDir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_orderpriority")
      ScaleJoins.writeBucketed(li, liTbl, "l_orderkey", 8, Some(s"$base/li"))
      ScaleJoins.writeBucketed(o, oTbl, "o_orderkey", 8, Some(s"$base/o"))
    }
    val out = spark.table(liTbl)
      .join(spark.table(oTbl),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus").as("order_status"),
        col("o_orderpriority").as("priority"))
      .agg(
        sum(col("l_quantity").cast("decimal(14,2)")).cast("double")
          .as("total_qty"),
        count(lit(1)).as("n_lines"))
    canon(out)
  }

  val bucketedJoinSql: String =
    s"""SELECT o.o_orderstatus AS order_status,
       |  o.o_orderpriority AS priority,
       |  CAST(sum(CAST(l.l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS total_qty,
       |  count(*) AS n_lines
       |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |GROUP BY 1, 2
       |${canonOrderSql(Seq("order_status", "priority", "total_qty", "n_lines"))}""".stripMargin

  /** Salted skew join: events⋈customer on a deliberately skew-prone key,
    * run through ScaleJoins.saltedJoin (key → (key, salt), small side
    * replicated) so a hot key's rows spread over `salts` reducers. The
    * oracle is the PLAIN join rolled up — proving the salted rewrite is
    * semantics-preserving end-to-end.
    */
  def saltedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val e = load(spark, sfDir, "events")
      .select("event_id", "user_id", "value")
    val c = load(spark, sfDir, "customer")
      .select("c_custkey", "c_mktsegment")
    val joined = ScaleJoins.saltedJoin(e, c, "user_id", "c_custkey", 7)
    val out = joined
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(
        sum(col("value").cast("decimal(14,2)")).cast("double")
          .as("total_value"),
        count(lit(1)).as("n_events"))
    canon(out)
  }

  val saltedJoinSql: String =
    s"""SELECT c.c_mktsegment AS segment,
       |  CAST(sum(CAST(e.value AS DECIMAL(14,2))) AS DOUBLE) AS total_value,
       |  count(*) AS n_events
       |FROM events e JOIN customer c ON e.user_id = c.c_custkey
       |GROUP BY 1
       |${canonOrderSql(Seq("segment", "total_value", "n_events"))}""".stripMargin


  /** Partition-pruned scan: events written `partitionBy(event_type)` once
    * (the layout a 100 TB table would ship with), then a filtered rollup
    * whose predicate prunes at the DIRECTORY level — the scan never opens
    * non-matching partitions (PlanHygieneSpec asserts the
    * PartitionFilters entry). Partition layout is the cheapest scan
    * eliminator there is: pruning cost is metadata-only, independent of
    * data volume.
    */
  /** Events written `partitionBy(event_type)` once per (process, sfDir)
    * — the 100 TB layout both partition-pruning queries scan.
    */
  private def partitionedEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val tag = TmpData.tag(sfDir)
    val base = TmpData.path("part_events", tag)
    TmpData.once(s"part:$tag") {
      load(spark, sfDir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .write.mode("overwrite").partitionBy("event_type").parquet(base)
    }
    spark.read.parquet(base)
  }

  def partitionPruned(spark: SparkSession, sfDir: String): DataFrame = {
    val e = partitionedEvents(spark, sfDir)
    val out = e.filter(col("event_type") === "click")
      .groupBy(graft.functions.Fns.dayStr(col("ts")).as("day"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(14,2)")).cast("double")
          .as("total_value"))
    canon(out)
  }

  val partitionPrunedSql: String =
    s"""SELECT strftime(ts, '%Y-%m-%d') AS day,
       |  count(*) AS n_events,
       |  CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
       |FROM events WHERE event_type = 'click'
       |GROUP BY 1
       |${canonOrderSql(Seq("day", "n_events", "total_value"))}""".stripMargin

  /** Runtime dynamic partition pruning: the partitioned events copy
    * joined to a SEPARATE small dim table (event_type → category) that is
    * filtered on a NON-join column. No static predicate mentions the
    * partition column, so only DPP can prune the fact's directories —
    * Catalyst plants a dynamicpruningexpression in the scan's
    * PartitionFilters that is evaluated from the dim's broadcast values
    * at runtime (PlanHygieneSpec asserts it). This is the reference's
    * enrichment-join shape (netsuite_pipeline/sales_data.py:129-134) at
    * the 100 TB layout: the dim filter, not a literal, decides which
    * fact partitions are read.
    */
  def dppJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val e = partitionedEvents(spark, sfDir)
    val tag = TmpData.tag(sfDir)
    val dimPath = TmpData.path("evtype_dim", tag)
    TmpData.once(s"evdim:$tag") {
      // distinct over the PARTITION COLUMN of the partitioned copy: the
      // values come from the directory listing, not a full fact scan —
      // at the 100 TB shape building a 5-row dim must not read the fact
      e.select("event_type").distinct()
        .withColumn("category",
          when(col("event_type").isin("click", "view"), "engagement")
            .otherwise("other"))
        .coalesce(1).write.mode("overwrite").parquet(dimPath)
    }
    val dim = spark.read.parquet(dimPath)
    val out = e.join(dim, Seq("event_type"))
      .filter(col("category") === "engagement")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(14,2)")).cast("double")
          .as("total_value"))
    canon(out)
  }

  val dppJoinSql: String =
    s"""WITH dim AS (
       |  SELECT event_type,
       |    CASE WHEN event_type IN ('click', 'view') THEN 'engagement'
       |         ELSE 'other' END AS category
       |  FROM (SELECT DISTINCT event_type FROM events))
       |SELECT e.event_type AS event_type, count(*) AS n_events,
       |  CAST(sum(CAST(e.value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
       |FROM events e JOIN dim d ON e.event_type = d.event_type
       |WHERE d.category = 'engagement'
       |GROUP BY 1
       |${canonOrderSql(Seq("event_type", "n_events", "total_value"))}""".stripMargin

  /** Key-distribution skew profiler — the diagnostic a pipeline runs
    * BEFORE choosing a salt factor or trusting AQE: per-key row counts
    * histogrammed into power-of-two buckets (bucket = floor(log2(rows)),
    * computed as length(bin(c))-1 so both engines do pure integer work —
    * libm log2 is not bit-portable at bucket boundaries). Output is one
    * row per occupied bucket: how many keys land there and the hottest
    * key's share of all rows in µ-units. A healthy key space
    * concentrates in low buckets; mass in high buckets says "salt this
    * join".
    *
    * Scale: one shuffle keyed by user_id with map-side partial counts,
    * then a second aggregation over DISTINCT-KEY cardinality rows into
    * ≤64 buckets. Linear, no collect.
    */
  def skewProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val e = load(spark, sfDir, "events")
    val perKey = e.groupBy(col("user_id")).agg(count(lit(1)).as("c"))
    val total = perKey.agg(sum(col("c")).as("total_rows"))
    val out = perKey
      .withColumn("bucket", (length(expr("bin(c)")) - 1).cast("int"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_keys"),
        min(col("c")).as("min_rows"),
        max(col("c")).as("max_rows"),
        sum(col("c")).as("bucket_rows"))
      .crossJoin(broadcast(total)) // 1-row stamp
      .withColumn("bucket_share_micro",
        expr("(bucket_rows * 1000000L) div total_rows"))
      .drop("total_rows")
    canon(out)
  }

  val skewProfileSql: String =
    s"""WITH per_key AS (
       |  SELECT user_id, count(*) AS c FROM events GROUP BY user_id
       |), t AS (SELECT CAST(sum(c) AS BIGINT) AS total_rows FROM per_key)
       |SELECT CAST(length(bin(c)) - 1 AS INT) AS bucket,
       |  count(*) AS n_keys,
       |  min(c) AS min_rows, max(c) AS max_rows,
       |  CAST(sum(c) AS BIGINT) AS bucket_rows,
       |  CAST((CAST(sum(c) AS BIGINT) * 1000000) // t.total_rows AS BIGINT)
       |    AS bucket_share_micro
       |FROM per_key, t
       |GROUP BY 1, t.total_rows
       |${canonOrderSql(Seq("bucket", "n_keys", "min_rows", "max_rows",
         "bucket_rows", "bucket_share_micro"))}""".stripMargin

  /** Output rows per source row beyond which a join key is "hot". */
  private val fanoutThreshold = 50L

  /** Pre-join fan-out guard, the companion diagnostic to
    * [[skewProfile]]: skew asks "is one key heavy on ONE side"; this
    * asks "what does the JOIN PRODUCE" — per key, both sides'
    * cardinalities and their product (the exact output row count an
    * inner join emits for that key). A many-to-many key whose product
    * explodes is the classic silent pipeline killer: each input scans
    * fine, the join output is quadratic in the hot key. Run this
    * BEFORE shipping a new join; keys flagged `hot` get pre-aggregated,
    * deduplicated, or salted first. Here over orders⋈lineitem on
    * orderkey (safely 1-to-few — the audit proves it and pins the
    * worst key).
    *
    * Scale: two map-side-combinable per-key aggregates co-partitioned
    * on the join key, then a key-keyed equi-join of the two BOUNDED
    * per-key relations and a domain-bounded rollup — strictly cheaper
    * than the join it audits.
    */
  def fanoutGuard(spark: SparkSession, sfDir: String): DataFrame = {
    val l = load(spark, sfDir, "orders").groupBy(col("o_orderkey").as("k"))
      .agg(count(lit(1)).as("n_left"))
    val r = load(spark, sfDir, "lineitem").groupBy(col("l_orderkey").as("k"))
      .agg(count(lit(1)).as("n_right"))
    val perKey = l.join(r, Seq("k"), "full_outer")
      .select(col("k"),
        coalesce(col("n_left"), lit(0L)).as("n_left"),
        coalesce(col("n_right"), lit(0L)).as("n_right"))
      .withColumn("out_rows", col("n_left") * col("n_right"))
    val flagged = perKey
      .withColumn("hot", when(col("out_rows") > fanoutThreshold, 1)
        .otherwise(0))
    // worst key via max_by on (out_rows, k) INSIDE the aggregate: a
    // window partitioned by the 2-valued `hot` column would funnel
    // every distinct join key through at most 2 sort tasks — the exact
    // serialization this audit exists to catch, and a contradiction of
    // the "strictly cheaper than the join it audits" contract. max_by
    // keeps map-side partials; the struct's k term makes the tie-break
    // deterministic (max k among keys at the max out_rows).
    val out = flagged.groupBy(col("hot"))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("out_rows")).as("join_output_rows"),
        max(col("out_rows")).as("worst_key_rows"),
        max_by(col("k"), struct(col("out_rows"), col("k"))).as("worst_key"))
    canon(out)
  }

  val fanoutGuardSql: String =
    s"""WITH l AS (
       |  SELECT o_orderkey AS k, count(*) AS n_left FROM orders GROUP BY 1
       |), r AS (
       |  SELECT l_orderkey AS k, count(*) AS n_right FROM lineitem GROUP BY 1
       |), per_key AS (
       |  SELECT coalesce(l.k, r.k) AS k,
       |    coalesce(n_left, 0) AS n_left, coalesce(n_right, 0) AS n_right,
       |    coalesce(n_left, 0) * coalesce(n_right, 0) AS out_rows
       |  FROM l FULL OUTER JOIN r ON l.k = r.k
       |), h AS (
       |  SELECT k, out_rows,
       |    CASE WHEN out_rows > $fanoutThreshold THEN 1 ELSE 0 END AS hot,
       |    max(out_rows) OVER (PARTITION BY CASE WHEN out_rows > $fanoutThreshold
       |      THEN 1 ELSE 0 END) AS mx
       |  FROM per_key
       |)
       |SELECT hot, count(*) AS n_keys,
       |  CAST(sum(out_rows) AS BIGINT) AS join_output_rows,
       |  CAST(max(out_rows) AS BIGINT) AS worst_key_rows,
       |  max(CASE WHEN out_rows = mx THEN k END) AS worst_key
       |FROM h GROUP BY hot
       |${canonOrderSql(Seq("hot", "n_keys", "join_output_rows",
         "worst_key_rows", "worst_key"))}""".stripMargin

  /** Range-join binning rewrite: classify orders into price bands
    * (lo ≤ price < hi) WITHOUT the theta join a BETWEEN predicate
    * naively produces. A theta join plans as BroadcastNestedLoopJoin —
    * O(rows × bands) comparisons and no shuffle key — which melts at
    * fact scale even when the band table is tiny. The rewrite computes
    * each row's covering bin (`floor(price / width)`) and EQUI-joins on
    * it, keeping the range test only as a residual filter; for uniform
    * bands bin membership IS band membership, and for non-uniform bands
    * the same shape works by expanding each band to the bins it covers.
    * ScaleJoinsSpec asserts the plan contains a hash/merge equi-join
    * and no nested-loop join; the oracle is the plain BETWEEN
    * formulation, proving the rewrite is semantics-preserving.
    *
    * The division is double IEEE arithmetic — identical bit results in
    * both engines for the same literal width; the floor lands exactly
    * on integers at band boundaries because boundary prices are exact
    * multiples of the width.
    */
  private[graft] val bandWidth = 50000L
  private[graft] val nBands = 12L

  /** The uniform price-band table; shared with the spec so the band
    * geometry has exactly one definition.
    */
  private[graft] def priceBands(spark: SparkSession): DataFrame =
    spark.range(0, nBands).select(
      col("id").as("band_id"),
      (col("id") * bandWidth).cast("double").as("lo"),
      ((col("id") + 1) * bandWidth).cast("double").as("hi"))

  def rangeBinJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val bands = priceBands(spark)
    val o = load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .withColumn("bin",
        expr(s"cast(floor(o_totalprice / $bandWidth.0D) as bigint)"))
    val out = o.join(bands, col("bin") === col("band_id"))
      .filter(col("o_totalprice") >= col("lo") &&
        col("o_totalprice") < col("hi")) // residual: redundant for uniform bands, kept as the general shape
      .groupBy(col("band_id"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("band_total"))
    canon(out)
  }

  val rangeBinJoinSql: String =
    s"""WITH bands AS (
       |  SELECT i AS band_id,
       |    CAST(i * $bandWidth AS DOUBLE) AS lo,
       |    CAST((i + 1) * $bandWidth AS DOUBLE) AS hi
       |  FROM generate_series(0, ${nBands - 1}) t(i)
       |)
       |SELECT b.band_id, b.lo, b.hi, count(*) AS n_orders,
       |  CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
       |    AS band_total
       |FROM orders o JOIN bands b
       |  ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
       |GROUP BY b.band_id, b.lo, b.hi
       |${canonOrderSql(Seq("band_id", "lo", "hi", "n_orders", "band_total"))}""".stripMargin

  // ---------------------------------------------------------------------
  // zorder_layout — multi-dimensional clustering for scan locality
  // ---------------------------------------------------------------------

  /** Bits per dimension in the Z-order (Morton) key. */
  private val zBits = 10

  /** Quadtree-cell width: chunks are zkey div 2^zChunkShift, so each
    * chunk covers a 2^(zChunkShift/2) × 2^(zChunkShift/2) tile.
    */
  private val zChunkShift = 14

  /** Z-order (Morton) layout: interleave the bits of two scan dimensions
    * (user bucket × day bucket) into one sort key, then report per
    * quadtree-cell chunk stats. The point of the layout: a file holding
    * one Z-range is simultaneously narrow in BOTH dimensions (each
    * chunk is a 128×128 tile here), so a predicate on EITHER dimension
    * prunes files — a linear sort clusters one dimension and scatters
    * the other. This is the data-layout move (Z-ordering) behind
    * multi-dimensional clustering in lakehouse table formats.
    *
    * Chunking is `zkey div 2^$zChunkShift` — a pure projection, NOT a
    * global row_number (which would serialize the corpus through one
    * window partition); the one shuffle is the bounded-cardinality
    * chunk rollup. The spec asserts the locality property itself:
    * every chunk's span in BOTH dimensions is < 2^(zChunkShift/2).
    */
  def zorderLayout(spark: SparkSession, sfDir: String): DataFrame = {
    val sparkZ = (0 until zBits).map { i =>
      s"shiftleft((shiftright(zx, $i) & 1), ${2 * i}) + " +
        s"shiftleft((shiftright(zy, $i) & 1), ${2 * i + 1})"
    }.mkString(" + ")
    val e = load(spark, sfDir, "events")
      // pmod, not %: a pre-1970 day index must map into [0, 1024) or
      // the bit interleave below operates on a negative value
      .select((col("user_id") % 1024).cast("long").as("zx"),
        expr("cast(pmod(datediff(to_date(ts), date'1970-01-01'), 1024) " +
          "as bigint)").as("zy"))
      .withColumn("zkey", expr(sparkZ))
    val out = e
      .groupBy(expr(s"zkey div ${1L << zChunkShift}").as("chunk_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("zx")).as("x_min"), max(col("zx")).as("x_max"),
        min(col("zy")).as("y_min"), max(col("zy")).as("y_max"))
    canon(out)
  }

  val zorderLayoutSql: String = {
    val duckZ = (0 until zBits).map { i =>
      s"(((zx >> $i) & 1) << ${2 * i}) + (((zy >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")
    s"""WITH d AS (
       |  SELECT user_id % 1024 AS zx,
       |    ((date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 1024)
       |      + 1024) % 1024 AS zy
       |  FROM events
       |), z AS (
       |  SELECT zx, zy, $duckZ AS zkey FROM d
       |)
       |SELECT zkey // ${1L << zChunkShift} AS chunk_id, count(*) AS n_rows,
       |  min(zx) AS x_min, max(zx) AS x_max,
       |  min(zy) AS y_min, max(zy) AS y_max
       |FROM z GROUP BY 1
       |${canonOrderSql(Seq("chunk_id", "n_rows", "x_min", "x_max",
         "y_min", "y_max"))}""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "zorder_layout" -> zorderLayout,
    "bucketed_join" -> bucketedJoin,
    "salted_join" -> saltedJoin,
    "partition_pruned" -> partitionPruned,
    "dpp_join" -> dppJoin,
    "skew_profile" -> skewProfile,
    "fanout_guard" -> fanoutGuard,
    "range_bin_join" -> rangeBinJoin)

  val oracles: Map[String, String] = Map(
    "zorder_layout" -> zorderLayoutSql,
    "bucketed_join" -> bucketedJoinSql,
    "salted_join" -> saltedJoinSql,
    "partition_pruned" -> partitionPrunedSql,
    "dpp_join" -> dppJoinSql,
    "skew_profile" -> skewProfileSql,
    "fanout_guard" -> fanoutGuardSql,
    "range_bin_join" -> rangeBinJoinSql)
}
