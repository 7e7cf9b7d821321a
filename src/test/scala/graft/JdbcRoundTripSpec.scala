package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import graft.sources.Jdbc

/** S7/S8 closed for real: a full JDBC round-trip against in-process
  * Apache Derby — the embedded SQL engine Spark itself ships for the
  * Hive metastore, so this exercises the genuine JDBC code path
  * (DriverManager, DatabaseMetaData schema inference, PreparedStatement
  * batches, remote-SQL pushdown) with zero new dependencies and no
  * network.
  */
class JdbcRoundTripSpec extends SparkSpecBase {

  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"
  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  test("jdbc: DDL bootstrap + batch insert + scan round-trip preserves rows and types") {
    import spark.implicits._
    val src = Seq(
      (1L, "alpha", 10.5), (2L, "beta", 20.25), (3L, "gamma", -3.0),
      (4L, "delta", 0.0), (5L, "epsilon", 99.99))
      .toDF("id", "name", "amount")

    // overwrite bootstraps the table from the DataFrame schema (S9)
    Jdbc.write(src, url, "items", driver, mode = "overwrite")
    val back = Jdbc.read(spark, url, "items", driver)
    assert(back.count() == 5, "row count lost in the round trip")
    assert(back.schema.fieldNames.map(_.toLowerCase).sorted
      .sameElements(Array("amount", "id", "name")), "schema lost")
    val amounts = back.collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("amount")).toMap
    assert(amounts(5L) == 99.99 && amounts(3L) == -3.0,
      "values corrupted in the round trip")

    // append is the S8 batch-insert face
    Jdbc.write(Seq((6L, "zeta", 1.25)).toDF("id", "name", "amount"),
      url, "items", driver, mode = "append")
    assert(Jdbc.read(spark, url, "items", driver).count() == 6,
      "batch append did not land")
  }

  test("jdbc: predicates push down into the remote SQL") {
    import spark.implicits._
    Jdbc.write((1L to 100L).map(i => (i, s"n$i")).toDF("k", "v"),
      url, "pushdown_t", driver, mode = "overwrite")
    val q = Jdbc.read(spark, url, "pushdown_t", driver)
      .filter(col("k") > 90L)
      .select(col("k"))
    assert(q.count() == 10, "filtered scan returned wrong rows")
    val plan = q.queryExecution.explainString(FormattedMode)
    assert(plan.contains("PushedFilters"), "no pushdown section in scan")
    assert(plan.contains("GreaterThan(K,90)") || plan.contains("K > 90") ||
      plan.contains("GreaterThan(k,90)"),
      s"k > 90 not pushed to the database:\n$plan")
  }

  test("jdbc: range-partitioned scan parallelizes without changing results") {
    import spark.implicits._
    Jdbc.write((1L to 1000L).map(i => (i, i % 7)).toDF("k", "m"),
      url, "part_t", driver, mode = "overwrite")
    val part = Jdbc.readPartitioned(spark, url, "part_t", driver,
      partitionColumn = "k", lowerBound = 1L, upperBound = 1000L,
      numPartitions = 8)
    assert(part.rdd.getNumPartitions == 8,
      "partitioned read did not split into range tasks")
    assert(part.count() == 1000, "partitioned scan lost rows")
    // rows OUTSIDE the bounds still arrive via the open end-ranges
    val whole = Jdbc.read(spark, url, "part_t", driver)
      .agg(sum(col("k"))).collect().head.getLong(0)
    val split = part.agg(sum(col("k"))).collect().head.getLong(0)
    assert(whole == split, "partitioned union diverged from the flat scan")
  }
}
