package graft

import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpecBase {

  test("entry flagship returns rows with expected schema") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.sorted.toSeq == Seq("brand", "credmem_amount",
      "customer_name", "inv_amount", "n_lines", "nation_name",
      "net_amount", "region_name", "sales_date", "total_qty"))
    assert(df.count() > 0)
  }

  test("sales_rollup: credmem is non-positive, net equals price*(1-disc) sum") {
    val df = operators.Relational.salesRollup(spark, sf)
    val bad = df.filter(col("credmem_amount") > 0).count()
    assert(bad == 0)
    // n_lines positive everywhere
    assert(df.filter(col("n_lines") <= 0).count() == 0)
  }

  test("every query name has either an oracle or is explicitly rows-only") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle keys without query: ${o.diff(q)}")
  }

  test("sales_rank: ranking-family invariants hold per nation") {
    val df = operators.Relational.salesRank(spark, sf).cache()
    try {
      // rank 1 exists in every nation; dense_rank never exceeds rank;
      // percent_rank/cume_dist live in [0,1] with cume > 0
      val nations = df.select("c_nationkey").distinct().count()
      val tops = df.filter(col("rnk") === 1)
        .select("c_nationkey").distinct().count()
      assert(tops == nations, "a nation lost its rank-1 customer")
      assert(df.filter(col("dense_rnk") > col("rnk")).count() == 0)
      assert(df.filter(col("pct_rank_micro") < 0 ||
        col("pct_rank_micro") > 1000000 ||
        col("cume_micro") <= 0 || col("cume_micro") > 1000000).count() == 0)
      // within a nation, equal revenue => equal rank (tie correctness)
      val tieBreaks = df.groupBy("c_nationkey", "rev_s")
        .agg(countDistinct("rnk").as("nr")).filter(col("nr") > 1).count()
      assert(tieBreaks == 0, "equal revenues ranked differently")
    } finally df.unpersist()
  }
}
