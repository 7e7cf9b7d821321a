package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TEMPORARY dev probe (not committed): A/B the table_profile_approx
  * cost structure at sf0.1 bench layout.
  */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    operators.BenchData.scanSplitConf.foreach { case (k, v) =>
      builder.config(k, v)
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = operators.BenchData.realisticCopy(spark, "/root/testdata/sf0.1")
    val li = Tables.load(spark, dir, "lineitem")

    val cols = Seq(
      "l_orderkey" -> "int", "l_partkey" -> "int", "l_suppkey" -> "int",
      "l_linenumber" -> "int", "l_quantity" -> "num2",
      "l_extendedprice" -> "num2", "l_discount" -> "num2", "l_tax" -> "num2",
      "l_returnflag" -> "str", "l_linestatus" -> "str", "l_shipdate" -> "ts")
    def canonStr(kind: String, c: org.apache.spark.sql.Column) = kind match {
      case "int"  => c.cast("string")
      case "num2" => functions.Fns.canonNum(c)
      case "str"  => c
      case "ts"   => functions.Fns.tsStr(c)
    }
    def melted: DataFrame = {
      val pairs = cols.map { case (c, kind) =>
        struct(lit(c).as("column_name"), canonStr(kind, col(c)).as("v"))
      }
      li.select(explode(array(pairs: _*)).as("p"))
        .select(col("p.column_name").as("column_name"), col("p.v").as("v"))
    }

    def time(label: String)(mk: => DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime(); mk.count(); (System.nanoTime() - t0) / 1e9
      }
      once()
      val w = once()
      println(f"[probe] $label%-34s warmed=${w}%.2f s")
    }

    time("melt_exact_distinct") {
      melted.groupBy("column_name").agg(countDistinct(col("v")).as("nd"))
    }
    time("hll11_rsd02_raw") {
      li.agg(count(lit(1)).as("n"),
        cols.map { case (c, _) => approx_count_distinct(col(c), 0.02).as(s"ad_$c") }: _*)
    }
    time("hll11_rsd05_raw") {
      li.agg(count(lit(1)).as("n"),
        cols.map { case (c, _) => approx_count_distinct(col(c), 0.05).as(s"ad_$c") }: _*)
    }
    time("metrics_count_min_max") {
      val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { case (c, kind) =>
        Seq(count(col(c)).as(s"np_$c"),
          canonStr(kind, min(col(c))).as(s"mn_$c"),
          canonStr(kind, max(col(c))).as(s"mx_$c"))
      }
      li.agg(aggs.head, aggs.tail: _*)
    }
    time("counts_only") {
      val aggs = count(lit(1)).as("n_rows") +: cols.map { case (c, _) =>
        count(col(c)).as(s"np_$c") }
      li.agg(aggs.head, aggs.tail: _*)
    }
    time("melt_exact_plus_hll_per_group") {
      melted.groupBy("column_name")
        .agg(countDistinct(col("v")).as("nd"),
          approx_count_distinct(col("v"), 0.02).as("ad"),
          count(col("v")).as("np"))
    }
    time("hll11_rsd02_canon") {
      li.agg(count(lit(1)).as("n"),
        cols.map { case (c, kind) =>
          approx_count_distinct(canonStr(kind, col(c)), 0.02).as(s"ad_$c") }: _*)
    }
    def timeCold(label: String)(mk: => DataFrame): Unit = {
      val t0 = System.nanoTime(); mk.count()
      val cold = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); mk.count()
      val warm = (System.nanoTime() - t1) / 1e9
      spark.catalog.clearCache()
      println(f"[probe] $label%-34s cold=${cold}%.2f warm=${warm}%.2f s")
    }
    timeCold("q_table_profile") {
      SparkEntry.queries("table_profile")(spark, dir)
    }
    timeCold("q_table_profile_approx") {
      SparkEntry.queries("table_profile_approx")(spark, dir)
    }
    spark.stop()
  }
}
