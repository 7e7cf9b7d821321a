package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.operators.CorpusOps
import graft.streaming.IndexStream

/** Tombstone deletes with exact retrieval semantics (round 10): after
  * `IndexStream.deleteDocs`, every query face must answer
  * BIT-IDENTICAL to an index freshly built WITHOUT the deleted docs —
  * immediately (negative count markers keep N/totdl exact, negative
  * df rows keep cumulative df / the cap / the df-rarest selection
  * exact, tombstone anti-joins keep candidates exact), not only after
  * a rebuild. Pins idempotent re-delivery, cross-operation
  * double-delete, nonexistent-id no-op, the ghost-term selection
  * hazard (a fully-deleted term must FREE its selection slot), answer
  * stability through compaction, and physical reclamation at
  * migration (no resurrection, tombstones cleared, posting bytes
  * gone).
  */
class DeleteSpec extends SparkSpecBase {

  private def documents: DataFrame =
    spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))

  private def queries: DataFrame =
    documents.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"), col("text"))

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def buildDeleted(state: String): DataFrame = {
    val train = documents.filter(col("source") =!= "src0")
    (0 until 2).foreach { i =>
      IndexStream.applyBatch(spark, state,
        train.filter(pmod(col("doc_id"), lit(2)) === i), i.toLong)
    }
    val doomed = train.filter(col("doc_id") % 7 === 2)
      .select(col("doc_id"))
    val n = IndexStream.deleteDocs(spark, state, doomed, deleteId = 0L)
    assert(n == doomed.count(), s"deleted $n of ${doomed.count()}")
    train.filter(col("doc_id") % 7 =!= 2)
  }

  test("all three query faces equal a fresh index built without the deleted docs") {
    val root = Files.createTempDirectory("graft-del").toString
    val state = s"$root/state"
    val surviving = buildDeleted(state)
    val freshState = s"$root/fresh"
    IndexStream.applyBatch(spark, freshState, surviving, 0L)

    for ((name, q) <- Seq[(String,
        (org.apache.spark.sql.SparkSession, String,
         DataFrame) => DataFrame)](
        ("bm25", (s: org.apache.spark.sql.SparkSession, st: String,
          q: DataFrame) => IndexStream.queryTopK(s, st, q)),
        ("phrase", (s: org.apache.spark.sql.SparkSession, st: String,
          q: DataFrame) => IndexStream.queryPhrase(s, st, q)),
        ("near", (s: org.apache.spark.sql.SparkSession, st: String,
          q: DataFrame) => IndexStream.queryNear(s, st, q)))) {
      val want = rows(q(spark, freshState, queries))
      assert(want.nonEmpty, s"$name fixture must retrieve something")
      assert(rows(q(spark, state, queries)) == want,
        s"$name after delete must equal a fresh survivors-only index")
    }
  }

  test("delete is idempotent, double-deletes are no-ops, nonexistent ids delete nothing; compaction preserves answers") {
    val root = Files.createTempDirectory("graft-del-idem").toString
    val state = s"$root/state"
    buildDeleted(state)
    val want = rows(IndexStream.queryTopK(spark, state, queries))
    val doomed = documents.filter(col("source") =!= "src0")
      .filter(col("doc_id") % 7 === 2).select(col("doc_id"))

    // re-delivery of the SAME delete operation: overwrites its own
    // generations, stored stats unchanged
    val stBefore = graft.streaming.LsmIndex.Markers(state).stored(spark)
    IndexStream.deleteDocs(spark, state, doomed, deleteId = 0L)
    assert(graft.streaming.LsmIndex.Markers(state).stored(spark) ==
      stBefore, "re-delivered delete changed the corpus stats")
    assert(rows(IndexStream.queryTopK(spark, state, queries)) == want)

    // a DIFFERENT delete operation naming already-deleted ids must
    // subtract nothing
    assert(IndexStream.deleteDocs(spark, state, doomed,
      deleteId = 1L) == 0L, "double delete must be a no-op")
    assert(graft.streaming.LsmIndex.Markers(state).stored(spark) ==
      stBefore, "double delete changed the corpus stats")

    // ids that were never indexed delete nothing
    import spark.implicits._
    assert(IndexStream.deleteDocs(spark, state,
      Seq(999999901L, 999999902L).toDF("doc_id"), deleteId = 2L) == 0L)
    assert(rows(IndexStream.queryTopK(spark, state, queries)) == want)

    // compaction (generic distinct-merge incl. the tombs sub-table):
    // answers hold
    val phraseWant = rows(IndexStream.queryPhrase(spark, state, queries))
    IndexStream.compactState(spark, state, 64L * 1024 * 1024)
    assert(rows(IndexStream.queryTopK(spark, state, queries)) == want,
      "compaction changed post-delete answers")
    assert(rows(IndexStream.queryPhrase(spark, state, queries)) ==
      phraseWant, "compaction changed post-delete phrase answers")
  }

  test("ghost-term hazard: a fully-deleted rare term frees its selection slot") {
    val root = Files.createTempDirectory("graft-del-ghost").toString
    val state = s"$root/state"
    // rare term zzghost lives ONLY in doc 1000; zzalt only in 1001.
    // filler docs give the common words high df.
    val base = (1L to 20L).map(i =>
      (i, "common words fill the corpus body here", "src1"))
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize((base ++ Seq(
        (1000L, "zzghost common words", "src1"),
        (1001L, "zzalt common words", "src1"))).map {
        case (id, t, s) => Row(id, t, s)
      }), IndexStream.docSchema)
    IndexStream.applyBatch(spark, state, d, 0L)
    import spark.implicits._
    IndexStream.deleteDocs(spark, state, Seq(1000L).toDF("doc_id"),
      deleteId = 0L)

    // a query carrying BOTH rare terms: zzghost's df sum is now 0, so
    // it must leave selection entirely and zzalt (plus the surviving
    // common terms) must score exactly as in a fresh survivors-only
    // index — if the ghost term held its slot, the selected term set
    // (and so the scores) would differ
    val q = Seq((900L, "zzghost zzalt common words")).toDF("query_id", "text")
    val freshState = s"$root/fresh"
    IndexStream.applyBatch(spark, freshState,
      d.filter(col("doc_id") =!= 1000L), 0L)
    val want = rows(IndexStream.queryTopK(spark, freshState, q))
    assert(want.nonEmpty)
    assert(rows(IndexStream.queryTopK(spark, state, q)) == want,
      "ghost term must not occupy a selection slot")
  }

  test("compaction physically reclaims: posting bytes dropped, tombstones cleared, survivor dfs, re-delivered delete subtracts nothing") {
    val root = Files.createTempDirectory("graft-del-compact").toString
    val state = s"$root/state"
    buildDeleted(state)
    val want = rows(IndexStream.queryTopK(spark, state, queries))
    val phraseWant = rows(IndexStream.queryPhrase(spark, state, queries))
    val deletedIds = documents.filter(col("source") =!= "src0")
      .filter(col("doc_id") % 7 === 2)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet

    IndexStream.compactState(spark, state, 64L * 1024 * 1024)

    // physical: deleted docs' posting and docs bytes are gone, the
    // tombs sub-table is dropped, dfs carries survivor counts only
    assert(spark.read.parquet(s"$state/postings")
      .filter(col("doc_id").isin(deletedIds.toSeq: _*)).count() == 0,
      "compaction must physically drop deleted docs' postings")
    assert(spark.read.parquet(s"$state/docs")
      .filter(col("doc_id").isin(deletedIds.toSeq: _*)).count() == 0,
      "compaction must physically drop deleted docs' rows")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$state/tombs")),
      "compaction must clear the tombstones after reclaiming")
    assert(spark.read.parquet(s"$state/dfs")
      .filter(col("df") <= 0).count() == 0,
      "compacted dfs must carry positive survivor counts only")

    // logical: answers unchanged
    assert(rows(IndexStream.queryTopK(spark, state, queries)) == want,
      "reclaiming compaction changed BM25 answers")
    assert(rows(IndexStream.queryPhrase(spark, state, queries)) ==
      phraseWant, "reclaiming compaction changed phrase answers")

    // the retired tolerance: a delete re-delivered AFTER its
    // generation was compacted away finds no docs rows and subtracts
    // nothing — no double-count window
    val st = graft.streaming.LsmIndex.Markers(state).stored(spark)
    val doomed = documents.filter(col("source") =!= "src0")
      .filter(col("doc_id") % 7 === 2).select(col("doc_id"))
    assert(IndexStream.deleteDocs(spark, state, doomed,
      deleteId = 0L) == 0L,
      "re-delivered delete after reclaim must subtract nothing")
    assert(graft.streaming.LsmIndex.Markers(state).stored(spark) == st,
      "re-delivered delete after reclaim changed corpus stats")
    assert(rows(IndexStream.queryTopK(spark, state, queries)) == want)
  }

  test("migration physically reclaims: no resurrection, tombstones cleared, deleted posting bytes gone") {
    val root = Files.createTempDirectory("graft-del-mig").toString
    val state = s"$root/state"
    val surviving = buildDeleted(state)
    val want = rows(IndexStream.queryTopK(spark, state, queries))
    val phraseWant = rows(IndexStream.queryPhrase(spark, state, queries))

    val deletedIds = documents.filter(col("source") =!= "src0")
      .filter(col("doc_id") % 7 === 2)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(spark.read.parquet(s"$state/postings")
      .filter(col("doc_id").isin(deletedIds.toSeq: _*)).count() > 0,
      "fixture: deleted docs' posting bytes should still exist pre-rebuild")

    // force the rebuild through the migration machinery by restamping
    // the layout as an older version (the supported rebuild path);
    // write through the Hadoop FS so the local-FS .crc sidecar stays
    // consistent
    val hfs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val layoutPath = new org.apache.hadoop.fs.Path(s"$state/_LAYOUT")
    val out = hfs.create(layoutPath, true)
    try out.write("graft-ridx-v3-for-rebuild-test".getBytes("UTF-8"))
    finally out.close()
    assert(IndexStream.migrateState(spark, state), "rebuild must run")

    assert(rows(IndexStream.queryTopK(spark, state, queries)) == want,
      "rebuild changed BM25 answers")
    assert(rows(IndexStream.queryPhrase(spark, state, queries)) ==
      phraseWant, "rebuild changed phrase answers")
    assert(spark.read.parquet(s"$state/postings")
      .filter(col("doc_id").isin(deletedIds.toSeq: _*)).count() == 0,
      "rebuild must physically drop deleted docs' postings")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val tombs = new org.apache.hadoop.fs.Path(s"$state/tombs")
    assert(!fs.exists(tombs) ||
      spark.read.parquet(tombs.toString).count() == 0,
      "rebuild must clear the tombstones")
    // the docs universe equals the survivors exactly
    assert(spark.read.parquet(s"$state/docs")
      .select(col("doc_id")).distinct().count() == surviving.count(),
      "rebuilt docs universe must equal the survivors")
  }
}
