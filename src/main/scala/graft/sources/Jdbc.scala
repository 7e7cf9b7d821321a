package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC scan + batch-insert surface (SURVEY.md §2 S7/S8; reference
  * `netsuite_pipeline/inventory_data.py:67-69`, `sales_data.py:85-87`:
  * full-query reads from a warehouse connection and executemany-style
  * batch inserts).
  *
  * Thin, deliberately: Spark's built-in JDBC source already does the
  * right things — filter/column pushdown into the remote SQL, typed
  * schema inference from database metadata, and batched PreparedStatement
  * writes — so the library's job is only to pin the scale-relevant
  * options:
  *
  *  - READ: an unpartitioned JDBC scan is ONE task holding one
  *    connection — fine for dimension pulls, fatal for a fact table.
  *    `readPartitioned` splits the scan into `numPartitions` range
  *    predicates on a numeric column, giving parallel connections and
  *    restartable tasks. Filters still push down per-partition.
  *  - WRITE: `batchsize` controls rows per executeBatch round-trip;
  *    each task opens its own connection, so write parallelism is the
  *    DataFrame's partitioning (repartition BEFORE write to match what
  *    the database can absorb — 1000 executors hammering one Postgres
  *    is a denial of service, not a pipeline).
  *
  * Verified end-to-end against in-process Apache Derby (the engine
  * Spark itself ships for the Hive metastore) in JdbcRoundTripSpec:
  * DDL bootstrap, batch insert, scan, partitioned scan, predicate
  * pushdown.
  */
object Jdbc {

  /** Single-partition JDBC scan — dimension-table sized pulls only. */
  def read(spark: SparkSession, url: String, table: String,
      driver: String, options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("driver", driver)
      .options(options)
      .load()

  /** Range-partitioned JDBC scan: `numPartitions` parallel connections,
    * each reading `partitionColumn` slices of [lowerBound, upperBound].
    * Rows outside the bounds are still read (first/last partition take
    * the open ranges) — bounds shape parallelism, not correctness.
    */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      driver: String, partitionColumn: String, lowerBound: Long,
      upperBound: Long, numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("driver", driver)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound.toString)
      .option("upperBound", upperBound.toString)
      .option("numPartitions", numPartitions.toString)
      .load()

  /** Batched insert; `mode` "overwrite" bootstraps/replaces the table
    * (DDL from the DataFrame schema — S9's writer-schema discipline),
    * "append" adds rows.
    */
  def write(df: DataFrame, url: String, table: String, driver: String,
      mode: String = "append", batchSize: Int = 1000): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("driver", driver)
      .option("batchsize", batchSize.toString)
      .mode(mode)
      .save()
}
