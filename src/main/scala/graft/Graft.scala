package graft

import org.apache.spark.sql.SparkSession

/** User-facing entry point: make the warehouse queryable through plain
  * `spark.sql`, the way reference users query their warehouse through
  * PostgreSQL/NetSuite SQL.
  *
  * After `Graft.init(spark, sfDir)`:
  *  - every table (region … embeddings) is a temp view named as-is;
  *  - `graft_dot(a, b)`, `graft_simhash(str)`, `graft_minhash(str)` are
  *    available in SQL for vector/dedup work.
  */
object Graft {
  def init(spark: SparkSession, sfDir: String): Unit = {
    Tables.all.foreach { name =>
      Tables.load(spark, sfDir, name).createOrReplaceTempView(name)
    }
    plans.VectorExprs.register(spark)
    plans.TextExprs.register(spark)
  }
}
