package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL faces for Spark's built-in bloom-filter machinery (the same
  * `BloomFilterAggregate`/`BloomFilterMightContain` pair the optimizer's
  * own runtime-filter injection plants, exposed as session functions so a
  * pipeline can build an EXPLICIT bloom pre-filter where the optimizer's
  * size heuristics would never fire).
  *
  * Pattern (TextOps.contaminationCheck): aggregate the build side's keys
  * into one bloom (`graft_bloom_agg(xxhash64(k))`), attach it as a scalar
  * subquery, and pre-filter the probe side with
  * `graft_bloom_contains(bf, xxhash64(k))` BEFORE the exact semi-join —
  * at 100 TB the probe side's shuffle volume drops to near-hits while the
  * exact join keeps correctness (bloom false positives are re-checked,
  * false negatives are impossible).
  */
object BloomExprs {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("graft_bloom_agg"))) {
      reg.createOrReplaceTempFunction("graft_bloom_agg", exprs =>
        exprs match {
          case Seq(child) => new BloomFilterAggregate(child)
          case Seq(child, items) => new BloomFilterAggregate(child, items)
          case Seq(child, items, bits) =>
            new BloomFilterAggregate(child, items, bits)
          case _ => throw new IllegalArgumentException(
            s"graft_bloom_agg expects 1-3 arguments, got ${exprs.length}")
        }, "built-in")
    }
    if (!reg.functionExists(FunctionIdentifier("graft_bloom_contains"))) {
      reg.createOrReplaceTempFunction("graft_bloom_contains", exprs =>
        BloomFilterMightContain(exprs(0), exprs(1)), "built-in")
    }
  }
}
