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
}
