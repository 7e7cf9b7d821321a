package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The ONE min-partner fixpoint resolver behind every keep/drop policy
  * view (both gates' `keepDecisions` and the composed
  * `curation_verdicts` face — three identical copies before r9).
  *
  * Input: a flagged-pair relation with columns (new_id, dup_id) where
  * every row has dup_id < new_id — both gates emit only such pairs, so
  * the min-partner map is STRICTLY DECREASING and its fixpoint is an
  * id with no flagged row (a keep). Output: one row per dropped id —
  * (id, kept_id) with kept_id chain-resolved to a flag-free
  * representative (a doc flagged only against a mid-chain near-dup
  * must not hand writers a partner that is itself dropped).
  *
  * Pointer jumping (kept ← kept's own kept, where present) reaches the
  * fixpoint in O(log chain-depth) rounds; each round is one self-join
  * of the SMALL flagged relation (dropped ids only, never the corpus),
  * materialized per round so plan depth stays constant. The final
  * relation is left persisted — callers own the cache lifecycle
  * (Verify/Bench clearCache between queries), same contract as every
  * persisted intermediate in the engine.
  */
private[graft] object KeepResolve {

  def resolve(pairs: DataFrame): DataFrame = {
    var cur = pairs.groupBy(col("new_id").as("id"))
      .agg(min(col("dup_id")).as("kept_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cur.count()
    var done = false
    while (!done) {
      val jumped = cur.as("a")
        .join(cur.select(col("id").as("kept_id"),
          col("kept_id").as("jump")).as("b"), Seq("kept_id"), "left")
        .select(col("id"),
          coalesce(col("jump"), col("kept_id")).as("kept_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      jumped.count()
      // converged when no kept_id is itself a dropped id
      done = jumped.as("a")
        .join(jumped.select(col("id")).as("b"),
          col("a.kept_id") === col("b.id"), "left_semi")
        .isEmpty
      cur.unpersist()
      cur = jumped
    }
    cur
  }
}
