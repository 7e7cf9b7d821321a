package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Tables.{canon, canonOrderSql, load}

/** Flagship + relational core (SURVEY.md §2.2-§2.6, §7.1).
  *
  * Every query here is paired with a DuckDB oracle SQL string; both sides
  * alias output columns identically and end with the canonical name-sorted
  * ORDER BY (NULLS FIRST) so the driver's hash compare is deterministic.
  *
  * Scale notes: only fixed-cardinality dims (region=5, nation=25) carry an
  * explicit `broadcast()` hint. SF-scaled dims (customer/part/supplier grow
  * linearly with data volume — multi-GB at the 100 TB north star) get NO
  * hint: Catalyst's size-based join selection broadcasts them while they fit
  * under spark.sql.autoBroadcastJoinThreshold and AQE converts SMJ→BHJ at
  * runtime from measured sizes, so the plan degrades to a shuffle join
  * instead of OOMing the driver when the dim outgrows the threshold
  * (PlanHygieneSpec asserts the SMJ fallback on an oversized dim).
  */
object Relational {

  /** Flagship — the reference's NetSuite sales rollup (sales_data.py:49-83)
    * re-expressed on the TPC-H-ish star: 5-way dim join + conditional
    * aggregation (A5), sign-flip measure (F10), date formatting (F8),
    * multi-key grouping (A4), canonical ordering (W1).
    */
  def salesRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val li = load(spark, sfDir, "lineitem")
    val o  = load(spark, sfDir, "orders")
    val c  = load(spark, sfDir, "customer")
    val n  = load(spark, sfDir, "nation")
    val r  = load(spark, sfDir, "region")
    val p  = load(spark, sfDir, "part")

    val joined = li
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .join(p, li("l_partkey") === p("p_partkey"))
      .filter(o("o_orderstatus") =!= "P" &&
        li("l_shipdate") > lit("1996-01-01").cast("timestamp"))

    // Exact-decimal arithmetic (inputs are 2-decimal doubles): cast to
    // DECIMAL per-row BEFORE multiply/sum so both engines compute the same
    // exact rational, then cast the exact sum to DOUBLE — bit-identical
    // across Spark and DuckDB, immune to float summation-order and
    // round-half divergence.
    val price = li("l_extendedprice").cast("decimal(14,2)")
    val qty   = li("l_quantity").cast("decimal(14,2)")
    val disc  = (lit(1.0) - li("l_discount")).cast("decimal(14,2)")
    val agg = joined
      .groupBy(
        c("c_name").as("customer_name"),
        n("n_name").as("nation_name"),
        r("r_name").as("region_name"),
        date_format(o("o_orderdate"), "yyyy-MM-dd").as("sales_date"),
        p("p_brand").as("brand"))
      .agg(
        sum(qty).cast("double").as("total_qty"),
        sum(when(li("l_returnflag") === "N", price)
          .otherwise(lit(0).cast("decimal(14,2)"))).cast("double")
          .as("inv_amount"),
        (-sum(when(li("l_returnflag") === "R", price)
          .otherwise(lit(0).cast("decimal(14,2)"))).cast("double"))
          .as("credmem_amount"),
        sum(price * disc).cast("double").as("net_amount"),
        count(lit(1)).as("n_lines"))
    canon(agg)
  }

  private val salesRollupCols = Seq("customer_name", "nation_name",
    "region_name", "sales_date", "brand", "total_qty", "inv_amount",
    "credmem_amount", "net_amount", "n_lines")

  val salesRollupSql: String =
    s"""SELECT c.c_name AS customer_name, n.n_name AS nation_name,
       |  r.r_name AS region_name,
       |  strftime(o.o_orderdate, '%Y-%m-%d') AS sales_date,
       |  p.p_brand AS brand,
       |  CAST(sum(CAST(l.l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS total_qty,
       |  CAST(sum(CASE WHEN l.l_returnflag = 'N' THEN CAST(l.l_extendedprice AS DECIMAL(14,2)) ELSE CAST(0 AS DECIMAL(14,2)) END) AS DOUBLE) AS inv_amount,
       |  -CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN CAST(l.l_extendedprice AS DECIMAL(14,2)) ELSE CAST(0 AS DECIMAL(14,2)) END) AS DOUBLE) AS credmem_amount,
       |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(14,2)) * CAST(1 - l.l_discount AS DECIMAL(14,2))) AS DOUBLE) AS net_amount,
       |  count(*) AS n_lines
       |FROM lineitem l
       |JOIN orders o ON l.l_orderkey = o.o_orderkey
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |JOIN nation n ON c.c_nationkey = n.n_nationkey
       |JOIN region r ON n.n_regionkey = r.r_regionkey
       |JOIN part p ON l.l_partkey = p.p_partkey
       |WHERE o.o_orderstatus <> 'P' AND l.l_shipdate > TIMESTAMP '1996-01-01'
       |GROUP BY 1, 2, 3, 4, 5
       |${canonOrderSql(salesRollupCols)}""".stripMargin

  /** Ranking analytics over the same star: per-nation customer revenue
    * leaderboard exercising the full SQL ranking-function family — rank
    * (gaps on ties), dense_rank (no gaps), percent_rank, cume_dist.
    * Revenue sums are exact DECIMAL (the sales_rollup discipline), so
    * the rank ORDER BY never compares floats; ties therefore rank
    * identically in both engines WITHOUT an id tie-break — which is the
    * point: rank/dense_rank/percent_rank/cume_dist are functions of the
    * VALUE, deterministic under ties at any partitioning.
    *
    * Scale: one shuffle for the per-customer revenue agg (map-side
    * partials), one keyed by nation for the window — nations are a
    * coarse but bounded partition (25); at real scale the revenue agg
    * dominates and the window input is customer-cardinality, not fact-
    * cardinality.
    */
  def salesRank(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = load(spark, sfDir, "orders")
      .select(col("o_custkey"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
    val c = load(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val rev = o.groupBy(col("o_custkey")).agg(sum(col("p")).as("rev"))
    val w = Window.partitionBy(col("c_nationkey")).orderBy(col("rev").desc)
    val out = c.join(rev, c("c_custkey") === rev("o_custkey"))
      .select(col("c_custkey"), col("c_nationkey"), col("rev"))
      .withColumn("rnk", rank().over(w).cast("long"))
      .withColumn("dense_rnk", dense_rank().over(w).cast("long"))
      // floor-µ-units, NOT round(x, 6): the ratio is one IEEE division so
      // both engines hold the identical double, but round's half-rule
      // differs at an exact .xxxxx5 (bit at sf0.1: cume 0.5046875) —
      // floor has no half case.
      .withColumn("pct_rank_micro",
        floor(percent_rank().over(w) * lit(1000000.0)).cast("long"))
      .withColumn("cume_micro",
        floor(cume_dist().over(w) * lit(1000000.0)).cast("long"))
      .select(col("c_custkey"), col("c_nationkey"),
        col("rev").cast("decimal(18,2)").cast("string").as("rev_s"),
        col("rnk"), col("dense_rnk"), col("pct_rank_micro"),
        col("cume_micro"))
    canon(out)
  }

  val salesRankSql: String =
    s"""WITH rev AS (
       |  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
       |  FROM orders GROUP BY 1
       |)
       |SELECT c.c_custkey, c.c_nationkey,
       |  CAST(CAST(r.rev AS DECIMAL(18,2)) AS VARCHAR) AS rev_s,
       |  rank() OVER w AS rnk,
       |  dense_rank() OVER w AS dense_rnk,
       |  CAST(floor(percent_rank() OVER w * 1000000.0) AS BIGINT)
       |    AS pct_rank_micro,
       |  CAST(floor(cume_dist() OVER w * 1000000.0) AS BIGINT) AS cume_micro
       |FROM customer c JOIN rev r ON c.c_custkey = r.o_custkey
       |WINDOW w AS (PARTITION BY c.c_nationkey ORDER BY r.rev DESC)
       |${canonOrderSql(Seq("c_custkey", "c_nationkey", "rev_s", "rnk",
         "dense_rnk", "pct_rank_micro", "cume_micro"))}""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sales_rollup" -> salesRollup,
    "sales_rank" -> salesRank)

  val oracles: Map[String, String] = Map(
    "sales_rollup" -> salesRollupSql,
    "sales_rank" -> salesRankSql)
}
