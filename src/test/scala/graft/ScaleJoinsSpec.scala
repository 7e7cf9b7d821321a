package graft

import org.apache.spark.sql.functions._
import graft.plans.ScaleJoins

class ScaleJoinsSpec extends SparkSpecBase {

  test("bucketed tables join with zero exchanges") {
    val li = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val o = Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_orderstatus")
    ScaleJoins.writeBucketed(li, "li_bucketed", "l_orderkey", 8)
    ScaleJoins.writeBucketed(o, "o_bucketed", "o_orderkey", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // and it is still correct
      val expected = Tables.load(spark, sf, "lineitem").count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("range_bin_join plans as an equi-join, never a nested loop, and matches the theta join") {
    val df = graft.operators.ScaleOps.rangeBinJoin(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"binning rewrite degraded to a nested-loop theta join:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"no equi-join found in the rewritten plan:\n$plan")
    // semantics-preserving: identical to the naive BETWEEN formulation
    // (same band builder as the operator — one definition of the geometry)
    val o = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val bands = graft.operators.ScaleOps.priceBands(spark)
    val theta = o.join(bands,
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy("band_id").agg(count(lit(1)).as("n_orders"))
    val mismatches = df.select("band_id", "n_orders")
      .join(theta.withColumnRenamed("n_orders", "n_theta"), "band_id", "full_outer")
      .filter(!(col("n_orders") <=> col("n_theta"))).count()
    assert(mismatches == 0, "binning rewrite changed the join result")
  }

  test("salted join returns the exact multiset of the plain join") {
    val e = Tables.load(spark, sf, "events")
      .select("event_id", "user_id", "value")
    val c = Tables.load(spark, sf, "customer")
      .select("c_custkey", "c_name")
    val plain = e.join(c, e("user_id") === c("c_custkey"))
    val salted = ScaleJoins.saltedJoin(e, c, "user_id", "c_custkey", 7)
    assert(salted.count() == plain.count())
    val cols = plain.columns.map(col).toSeq
    assert(salted.select(cols: _*).exceptAll(plain.select(cols: _*)).count() == 0)
    assert(plain.select(cols: _*).exceptAll(salted.select(cols: _*)).count() == 0)
  }

  test("zorder_layout: every chunk is narrow in BOTH dimensions (the locality property)") {
    val df = operators.ScaleOps.zorderLayout(spark, sf).cache()
    try {
      assert(df.count() > 0)
      // a 2^14 z-range covers a 128x128 tile: both spans must fit it.
      // A linear sort on one dim would scatter the other across its full
      // 0..1023 range — this is the property z-ordering buys.
      val wide = df.filter(
        (col("x_max") - col("x_min")) >= 128 ||
          (col("y_max") - col("y_min")) >= 128).count()
      assert(wide == 0, "a z-chunk spans more than its quadtree tile")
      // mass conservation: chunk rows sum to the event count
      val total = df.agg(sum("n_rows")).head.getLong(0)
      assert(total == Tables.load(spark, sf, "events").count())
    } finally df.unpersist()
  }

  test("nullsafe_join: the NULL bucket pairs up; a plain equi-join drops it") {
    val df = operators.Core.nullsafeJoin(spark, sf).cache()
    try {
      assert(df.filter(col("bucket").isNull).count() == 1,
        "the NULL-key row did not survive the null-safe join")
      assert(df.filter(col("n_click") < 1 || col("n_buy") < 1).count() == 0)
      // 9 non-null buckets + 1 null bucket
      assert(df.count() == 10, s"expected 10 buckets, got ${df.count()}")
    } finally df.unpersist()
  }
}
