package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{canon, canonOrderSql, load}

/** Data-quality expectation gate: a declarative rule table evaluated in
  * one pass per source table — the dbt-test / expectations pattern a
  * pipeline runs between load and publish. Each rule emits its
  * violation count and a pass flag, so the gate's output is itself a
  * small table a scheduler can assert on (and the driver can hash).
  *
  * Scale: every non-referential rule folds into ONE aggregate over its
  * table's single pushed-down scan (violations are conditional counts,
  * so 4 lineitem rules cost one pass, not four); the referential rule
  * is a left-anti join on the order key — the only shuffle, and the
  * same key the fact already joins on everywhere else.
  */
object QualityOps {

  /** (rule name, violation predicate) over lineitem — evaluated in one
    * aggregate pass.
    */
  private def lineitemRules: Seq[(String, Column)] = Seq(
    "lineitem.quantity_not_null" -> col("l_quantity").isNull,
    "lineitem.quantity_range" ->
      (col("l_quantity") < 1 || col("l_quantity") > 50),
    "lineitem.returnflag_accepted" ->
      !col("l_returnflag").isin("A", "N", "R"),
    "lineitem.price_positive" -> (col("l_extendedprice") <= 0))

  private def ordersRules: Seq[(String, Column)] = Seq(
    "orders.totalprice_positive" -> (col("o_totalprice") <= 0),
    "orders.status_accepted" ->
      !col("o_orderstatus").isin("F", "O", "P"))

  private def ruleAgg(d: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val aggs = rules.map { case (name, bad) =>
      sum(when(bad, 1L).otherwise(0L)).as(s"v_${name.replace('.', '_')}")
    }
    val metrics = d.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.map { case (name, _) =>
      s"'$name', v_${name.replace('.', '_')}"
    }.mkString(", ")
    metrics.selectExpr(
      s"stack(${rules.size}, $stackArgs) AS (rule, n_violations)")
  }

  def expectationsReport(spark: SparkSession, sfDir: String): DataFrame = {
    val li = load(spark, sfDir, "lineitem")
    val o  = load(spark, sfDir, "orders")
    // referential: every lineitem order key must exist in orders
    val orphan = li.select(col("l_orderkey"))
      .join(o.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("lineitem.orderkey_in_orders").as("rule"),
        col("n_violations"))
    // uniqueness: order keys must not repeat (extra copies count)
    val dup = o.groupBy(col("o_orderkey")).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(col("c") - 1), lit(0L)).as("n_violations"))
      .select(lit("orders.orderkey_unique").as("rule"), col("n_violations"))
    val out = ruleAgg(li, lineitemRules)
      .unionByName(ruleAgg(o, ordersRules))
      .unionByName(orphan)
      .unionByName(dup)
      .withColumn("passed", when(col("n_violations") === 0, 1).otherwise(0))
    canon(out)
  }

  val expectationsReportSql: String = {
    def scalarRule(table: String, name: String, badSql: String): String =
      s"""SELECT '$name' AS rule,
         |  CAST(sum(CASE WHEN $badSql THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_violations
         |FROM $table""".stripMargin
    val rules = Seq(
      scalarRule("lineitem", "lineitem.quantity_not_null",
        "l_quantity IS NULL"),
      scalarRule("lineitem", "lineitem.quantity_range",
        "l_quantity < 1 OR l_quantity > 50"),
      scalarRule("lineitem", "lineitem.returnflag_accepted",
        "l_returnflag NOT IN ('A', 'N', 'R')"),
      scalarRule("lineitem", "lineitem.price_positive",
        "l_extendedprice <= 0"),
      scalarRule("orders", "orders.totalprice_positive",
        "o_totalprice <= 0"),
      scalarRule("orders", "orders.status_accepted",
        "o_orderstatus NOT IN ('F', 'O', 'P')"),
      """SELECT 'lineitem.orderkey_in_orders' AS rule,
        |  CAST(count(*) AS BIGINT) AS n_violations
        |FROM lineitem l
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)""".stripMargin,
      """SELECT 'orders.orderkey_unique' AS rule,
        |  CAST(coalesce(sum(c - 1), 0) AS BIGINT) AS n_violations
        |FROM (SELECT o_orderkey, count(*) AS c FROM orders
        |      GROUP BY 1)""".stripMargin)
    s"""WITH r AS (
       |${rules.mkString("", "\nUNION ALL\n", "")}
       |)
       |SELECT rule, n_violations,
       |  CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS passed
       |FROM r
       |${canonOrderSql(Seq("rule", "n_violations", "passed"))}""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "expectations_report" -> expectationsReport)

  val oracles: Map[String, String] = Map(
    "expectations_report" -> expectationsReportSql)
}
