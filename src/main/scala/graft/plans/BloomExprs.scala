package graft.plans

import org.apache.spark.sql.SparkSession

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

  /** Idempotent — delegates to the canonical [[GraftExtensions]]
    * description list (graft_bloom_agg / graft_bloom_contains included).
    */
  def register(spark: SparkSession): Unit =
    GraftExtensions.registerInSession(spark)
}
