package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** The INCREMENTAL composed curation gate: one ingestion stream of
  * (doc_id, text, embedding) rows run through BOTH near-dup gates —
  * the text gate ([[NearDupStream]], shingle/Jaccard) and the vector
  * gate ([[VecDupStream]], prefix-maskable LSH/cosine) — inside a
  * single foreachBatch, with one composed KEEP/DROP verdict view over
  * the union of their emission logs. This is the streaming face of
  * operators.Curation.curationVerdicts (which delegates here with the
  * whole corpus as batch 0): a training-data pipeline points its crawl
  * firehose at `start` and reads `verdicts` at any point in the
  * stream's life.
  *
  * Composition semantics: a doc drops if EITHER gate flagged it;
  * kept_id is chain-resolved across the UNION of both logs (per-gate
  * resolution would let a vector-dup of a text-dup point a writer at
  * a discarded doc — CurationSpec pins the cross-gate chain). Both
  * gates emit only dup_id < new_id pairs, so the combined min-partner
  * map is still strictly decreasing and [[KeepResolve]] applies
  * unchanged.
  *
  * Everything operational is the gates' own contracts, inherited
  * verbatim: batchId-keyed idempotent emissions, O(batch) LSM folds,
  * `_LAYOUT` fail-fast + [[NearDupStream.migrateState]]/
  * [[VecDupStream.migrateState]] migration, cadence-bounded compaction
  * ([[compactIfDue]] fans out to both states).
  */
object CurationStream {

  val rowSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("embedding", ArrayType(DoubleType)),
    StructField("source", StringType)))

  private[graft] val txtOutSchema = StructType(Seq(
    StructField("new_id", LongType),
    StructField("dup_id", LongType),
    StructField("jaccard", DoubleType),
    StructField("batch_id", LongType)))

  private[graft] val vecOutSchema = StructType(Seq(
    StructField("new_id", LongType),
    StructField("dup_id", LongType),
    StructField("sim_micro", LongType),
    StructField("batch_id", LongType)))

  private def txtState(root: String) = s"$root/txt_state"
  private def vecState(root: String) = s"$root/vec_state"
  private def txtOut(root: String) = s"$root/txt_out"
  private def vecOut(root: String) = s"$root/vec_out"

  /** One micro-batch through both gates. Each gate's applyBatch is
    * individually crash-idempotent (keyed overwrites throughout), so a
    * retry after a crash between the two calls converges both.
    */
  def applyBatch(spark: SparkSession, rootDir: String, batch: DataFrame,
      batchId: Long): Unit = {
    NearDupStream.applyBatch(spark, txtState(rootDir), txtOut(rootDir),
      batch.select(col("doc_id"), col("text")), batchId)
    VecDupStream.applyBatch(spark, vecState(rootDir), vecOut(rootDir),
      batch.select(col("doc_id").as("vec_id"), col("embedding")), batchId)
  }

  /** The combined flagged-pair log: (new_id, dup_id, is_text, is_vec). */
  private[graft] def pairLog(spark: SparkSession, rootDir: String): DataFrame =
    LsmIndex.readOrEmpty(spark, txtOut(rootDir), txtOutSchema)
      .select(col("new_id"), col("dup_id"),
        lit(1).as("is_text"), lit(0).as("is_vec"))
      .unionByName(
        LsmIndex.readOrEmpty(spark, vecOut(rootDir), vecOutSchema)
          .select(col("new_id"), col("dup_id"),
            lit(0).as("is_text"), lit(1).as("is_vec")))

  /** Composed KEEP/DROP policy view over every id indexed by EITHER
    * gate: verdict, chain-resolved kept_id, and which gate(s) flagged
    * the doc. `ids` (optional) restricts the output universe — the
    * batch face passes the corpus so null-text/null-embedding rows
    * (invisible to both indexes) still get their keep row.
    */
  def verdicts(spark: SparkSession, rootDir: String,
      ids: Option[DataFrame] = None): DataFrame = {
    val indexed = ids.getOrElse {
      val txtDocs = LsmIndex.readOrEmpty(spark,
          s"${txtState(rootDir)}/docs", StructType(Seq(
            StructField("doc_id", LongType), StructField("lt", StringType),
            StructField("n_sh", LongType), StructField("dbucket", LongType),
            StructField("ingest", LongType))))
        .select(col("doc_id"))
      val vecIds = LsmIndex.readOrEmpty(spark,
          s"${vecState(rootDir)}/vecs", VecDupStream.vecsSchema)
        .select(col("vec_id").as("doc_id"))
      // deleted (tombstoned) ids leave the default verdict universe —
      // a forgotten doc gets no row; explicit `ids` callers may still
      // ask about anything (the emission log is the historical record)
      val tombsSchema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("dbucket", LongType),
        StructField("ingest", LongType)))
      val deleted = LsmIndex.readOrEmpty(spark,
          s"${txtState(rootDir)}/tombs", tombsSchema)
        .select(col("doc_id"))
        .unionByName(LsmIndex.readOrEmpty(spark,
            s"${vecState(rootDir)}/tombs", StructType(Seq(
              StructField("vec_id", LongType),
              StructField("vbucket", LongType),
              StructField("ingest", LongType))))
          .select(col("vec_id").as("doc_id")))
        .distinct()
      txtDocs.unionByName(vecIds).distinct()
        .join(deleted, Seq("doc_id"), "left_anti")
    }
    val pairs = pairLog(spark, rootDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairs.count()
    val resolved = KeepResolve.resolve(pairs)
      .select(col("id").as("doc_id"), col("kept_id"))
    val flags = pairs.groupBy(col("new_id").as("doc_id"))
      .agg(max(col("is_text")).as("text_dup"),
        max(col("is_vec")).as("vec_dup"))
    indexed.join(resolved, Seq("doc_id"), "left")
      .join(flags, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("kept_id").isNull, lit("keep")).otherwise(lit("drop"))
          .as("verdict"),
        col("kept_id"),
        coalesce(col("text_dup"), lit(0)).as("text_dup"),
        coalesce(col("vec_dup"), lit(0)).as("vec_dup"))
  }

  /** Both gates' cadence rule in one call (see
    * NearDupStream.defaultMaxGenerations): compact whichever state has
    * accreted ≥ maxGen generations in its worst partition dir, and
    * (round 11) consolidate either EMISSION log once it has accreted
    * ≥ maxGen `batch_id=` partitions — the logs grow one dir per
    * batch forever, the same generation-count pressure one level up
    * (LsmIndex.compactEmissions). Returns whether any compaction ran.
    */
  def compactIfDue(spark: SparkSession, rootDir: String,
      targetFileBytes: Long,
      maxGen: Int = NearDupStream.defaultMaxGenerations): Boolean = {
    val t = NearDupStream.compactIfDue(spark, txtState(rootDir),
      targetFileBytes, maxGen)
    val v = VecDupStream.compactIfDue(spark, vecState(rootDir),
      targetFileBytes, maxGen)
    val to = LsmIndex.compactEmissions(spark, txtOut(rootDir),
      txtOutSchema, targetFileBytes, minDirs = maxGen)._1 > 0
    val vo = LsmIndex.compactEmissions(spark, vecOut(rootDir),
      vecOutSchema, targetFileBytes, minDirs = maxGen)._1 > 0
    t || v || to || vo
  }

  /** File-source streaming runner over (doc_id, text, embedding,
    * source) parquet.
    */
  def start(spark: SparkSession, sourceDir: String, rootDir: String,
      checkpointDir: String): StreamingQuery = {
    spark.readStream
      .schema(rowSchema)
      .parquet(sourceDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatch(spark, rootDir, batch, id)
      }
      .start()
  }
}
