package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join techniques for 100 TB shapes that the optimizer can't derive on
  * its own: pre-bucketed co-located joins (no shuffle at read time) and
  * key salting for skew (when AQE's skew split isn't available/enough).
  */
object ScaleJoins {

  /** Write a table bucketed+sorted on its join key. A pair of tables
    * bucketed the same way joins with ZERO exchanges — the shuffle is
    * paid once at write time and amortized over every subsequent join
    * (ScaleJoinsSpec asserts the exchange-free plan).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, path: Option[String] = None): Unit = {
    val w = df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
    // explicit path → external table (keeps data out of the default
    // warehouse dir when callers manage their own storage location)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Salted inner equi-join for skewed keys: each left row gets a
    * deterministic salt from its own content, the right side is
    * replicated `salts` ways, and the join key becomes (key, salt) —
    * a hot key's rows spread over `salts` reducers instead of one.
    * Result is the exact multiset of the unsalted join (each left row
    * matches exactly one replica of each matching right row).
    */
  def saltedJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, salts: Int): DataFrame = {
    val saltAll: Column =
      pmod(hash(left.columns.map(col).toSeq: _*), lit(salts))
    val l = left.withColumn("__salt", saltAll)
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, l(leftKey) === r(rightKey) && l("__salt") === r("__salt"))
      .drop("__salt")
  }
}
