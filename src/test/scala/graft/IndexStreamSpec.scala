package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.streaming.IndexStream
import graft.operators.CorpusOps

/** The incremental retrieval index (round 9): an LSM inverted index
  * maintained per micro-batch whose [[IndexStream.queryTopK]] answers
  * are BIT-IDENTICAL to the batch BM25 face over the same corpus — the
  * scoring expression, tokenizer, term selection, and k are shared
  * definitions, and this spec pins the equivalence at TWO corpus
  * states (so N/df/totdl tracking is exercised, not just one frozen
  * snapshot), across idempotent re-delivery, compaction, the
  * streaming runner, and a layout migration rebuilt from `docs.lt`.
  */
class IndexStreamSpec extends SparkSpecBase {

  private def documents: DataFrame =
    spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))

  private def trainSlices(n: Int): Seq[DataFrame] = {
    val train = documents.filter(col("source") =!= "src0")
    (0 until n).map(i => train.filter(pmod(col("doc_id"), lit(n)) === i))
  }

  private def queries: DataFrame =
    documents.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"), col("text"))

  private def rows(df: DataFrame): Set[(Long, Int, Long, Long, Long)] =
    df.select(col("query_id"), col("rank").cast("int"), col("doc_id"),
        col("score_micro"), col("n_terms")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet

  /** The batch face over an explicit corpus state (queries ∪ the
    * indexed train docs).
    */
  private def batchFace(trainParts: Seq[DataFrame]): Set[(Long, Int, Long, Long, Long)] = {
    val corpus = trainParts.foldLeft(
      documents.filter(col("source") === "src0"))(_ unionByName _)
    rows(CorpusOps.bm25TopkOn(corpus))
  }

  test("incremental index matches the batch BM25 face at every corpus state, through re-delivery and compaction") {
    val root = Files.createTempDirectory("graft-ridx").toString
    val state = s"$root/state"
    val parts = trainSlices(3)

    IndexStream.applyBatch(spark, state, parts(0), 0L)
    assert(rows(IndexStream.queryTopK(spark, state, queries)) ==
      batchFace(parts.take(1)),
      "partial-corpus retrieval must equal the batch face over the " +
        "same partial corpus (N/df/totdl tracked incrementally)")

    IndexStream.applyBatch(spark, state, parts(1), 1L)
    IndexStream.applyBatch(spark, state, parts(2), 2L)
    val want = batchFace(parts)
    assert(want.nonEmpty, "fixture must retrieve something")
    assert(rows(IndexStream.queryTopK(spark, state, queries)) == want,
      "full-corpus retrieval must equal the batch face bit-for-bit")

    // re-delivered batch (same id): same index, same answers
    val postingsBefore = spark.read.parquet(s"$state/postings").count()
    IndexStream.applyBatch(spark, state, parts(1), 1L)
    assert(spark.read.parquet(s"$state/postings").count() == postingsBefore,
      "re-delivered batch changed the postings row count")
    assert(rows(IndexStream.queryTopK(spark, state, queries)) == want,
      "re-delivered batch changed retrieval results")

    // compaction: generations collapse, markers consolidate, answers hold
    assert(IndexStream.maxGenerations(spark, state) == 3)
    IndexStream.compactState(spark, state, 64L * 1024 * 1024)
    assert(IndexStream.maxGenerations(spark, state) == 1,
      "compaction must consolidate the ingest generations")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val nMarkers = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$state/ncount"))
      .count(st => st.isFile && st.getPath.getName.startsWith("ingest="))
    assert(nMarkers == 1, "compaction must consolidate the count markers")
    assert(rows(IndexStream.queryTopK(spark, state, queries)) == want,
      "compaction changed retrieval results")
  }

  test("streaming runner: checkpointed file-source batches fold into the index; restart is a no-op") {
    val root = Files.createTempDirectory("graft-ridx-stream").toString
    val src = s"$root/src"; val state = s"$root/state"
    val ckp = s"$root/ckp"
    Files.createDirectories(java.nio.file.Paths.get(src))
    val parts = trainSlices(2)

    parts(0).coalesce(1).write.mode("append").parquet(src)
    IndexStream.start(spark, src, state, ckp).awaitTermination()
    parts(1).coalesce(1).write.mode("append").parquet(src)
    IndexStream.start(spark, src, state, ckp).awaitTermination()
    val want = batchFace(parts)
    assert(rows(IndexStream.queryTopK(spark, state, queries)) == want,
      "streamed index must equal the batch face over the full corpus")

    // restart with no new data: index untouched
    val postingsBefore = spark.read.parquet(s"$state/postings").count()
    IndexStream.start(spark, src, state, ckp).awaitTermination()
    assert(spark.read.parquet(s"$state/postings").count() == postingsBefore,
      "an empty restart re-folded a batch")
  }

  test("layout migration: v0 state (coarser tpfx, no stored dl) rebuilds from docs.lt; retrieval matches a fresh index") {
    val root = Files.createTempDirectory("graft-ridx-mig").toString
    val state = s"$root/state"
    val parts = trainSlices(2)
    val all = parts(0).unionByName(parts(1))

    // manufacture a v0-layout state: postings under a 16-dir tpfx (one
    // hex char), docs WITHOUT the dl column — v1 derives dl at rebuild
    all.filter(col("text").isNotNull)
      .select(col("doc_id"),
        explode(split(lower(col("text")), " ")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("tpfx", substring(md5(col("term")), 1, 1))
      .withColumn("ingest", lit(0L))
      .write.partitionBy("tpfx", "ingest").parquet(s"$state/postings")
    all.filter(col("text").isNotNull)
      .select(col("doc_id"), lower(col("text")).as("lt"))
      .withColumn("dbucket", pmod(col("doc_id"), lit(256)))
      .withColumn("ingest", lit(0L))
      .write.partitionBy("dbucket", "ingest").parquet(s"$state/docs")
    Files.write(java.nio.file.Paths.get(state, "_LAYOUT"),
      ("graft-ridx-v0 postings=(tpfx=md5hex1(term),ingest):16 " +
        "docs=(dbucket=pmod256,ingest) tok=lower-ws").getBytes("UTF-8"))

    // fails fast until migrated
    val e = intercept[IllegalArgumentException] {
      IndexStream.queryTopK(spark, state, queries)
    }
    assert(e.getMessage.contains("layout"))
    assert(IndexStream.migrateState(spark, state), "migration must run")
    assert(!IndexStream.migrateState(spark, state),
      "second call must be a version-match no-op")

    val freshState = s"$root/fresh"
    IndexStream.applyBatch(spark, freshState, all, 0L)
    val want = rows(IndexStream.queryTopK(spark, freshState, queries))
    assert(want.nonEmpty, "fixture must retrieve something")
    assert(rows(IndexStream.queryTopK(spark, state, queries)) == want,
      "migrated index must answer exactly like a fresh-built index")
  }

  test("driver-side tpfx shortlist matches Spark's md5 partition key") {
    val terms = documents.filter(col("text").isNotNull)
      .select(explode(split(lower(col("text")), " ")).as("term"))
      .distinct().limit(200)
    val mismatches = terms
      .withColumn("spark_pfx", substring(md5(col("term")), 1, 2))
      .collect().filter(r =>
        IndexStream.tpfxOf(r.getString(0)) != r.getString(1))
    assert(mismatches.isEmpty,
      s"driver/Spark md5 prefix disagreement: ${mismatches.take(3).toSeq}")
  }

  test("filtered retrieval: allow sets restrict candidates and re-rank; stats stay whole-index") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-ridx-allow").toString
    val state = s"$root/state"
    trainSlices(2).zipWithIndex.foreach { case (p, i) =>
      IndexStream.applyBatch(spark, state, p, i.toLong)
    }
    val full = IndexStream.queryTopK(spark, state, queries)
    val fullRows = rows(full)
    assert(fullRows.nonEmpty)

    // a covering allow set is a no-op (bit-identical, ranks included)
    val all = documents.filter(col("source") =!= "src0")
      .select(col("doc_id"))
    assert(rows(IndexStream.queryTopK(spark, state, queries,
      allow = Some(all))) == fullRows)

    // a real allow slice: every returned doc is allowed, scores equal
    // the unfiltered face's scores for those docs (whole-index stats),
    // and ranks are contiguous from 1 per query (re-ranked, not
    // post-filtered with holes)
    val allowSrc = documents.filter(col("source").isin("src1", "src2"))
      .select(col("doc_id"))
    val allowed = allowSrc.collect().map(_.getLong(0)).toSet
    val filt = rows(IndexStream.queryTopK(spark, state, queries,
      allow = Some(allowSrc)))
    assert(filt.nonEmpty && filt.forall(r => allowed.contains(r._3)),
      "a non-allowed doc ranked")
    val fullScores = fullRows.map(r => (r._1, r._3) -> (r._4, r._5)).toMap
    // only docs the unfiltered top-k also surfaced are comparable;
    // deeper allowed docs are below its k cutoff by construction
    filt.filter(r => fullScores.contains((r._1, r._3))).foreach { r =>
      assert(fullScores((r._1, r._3)) == ((r._4, r._5)),
        s"score changed under the filter for ${(r._1, r._3)}")
    }
    filt.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).toSeq.sorted == (1 to rs.size),
        s"ranks not contiguous for query $q")
    }

    // empty allow set: no rows, never an error
    assert(rows(IndexStream.queryTopK(spark, state, queries,
      allow = Some(Seq.empty[Long].toDF("doc_id")))).isEmpty)
  }

  test("query on empty state returns no rows") {
    val root = Files.createTempDirectory("graft-ridx-empty").toString
    val out = IndexStream.queryTopK(spark, s"$root/state", queries)
    assert(out.count() == 0)
    assert(out.columns.toSeq ==
      Seq("query_id", "rank", "doc_id", "score_micro", "n_terms"))
  }
}
