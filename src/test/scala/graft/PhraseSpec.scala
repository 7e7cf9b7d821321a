package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import graft.operators.CorpusOps
import graft.streaming.IndexStream

/** Positional phrase retrieval (round 10): the batch face
  * (CorpusOps.phraseMatchOn) and the incremental face
  * (IndexStream.queryPhrase over the v3 positional postings) share the
  * phrase extraction, tokenizer, and anchor-merge/rank core — this
  * spec pins the semantics on crafted corpora (overlapping
  * occurrences, repeated-term phrases, vocabulary misses), the
  * bit-identical batch/index equivalence at two corpus states and
  * through compaction, the v2→v3 layout migration (positions rebuilt
  * from docs.lt), and the column-pruning contract: the BM25 face's
  * posting reads must NOT pay for the positional payload.
  */
class PhraseSpec extends SparkSpecBase {

  private def docs(rows: Seq[(Long, String, String)]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map {
        case (id, text, src) => Row(id, text, src)
      }),
      IndexStream.docSchema)

  private def outCol(df: DataFrame,
      valueCol: String): Set[(Long, Int, Long, Long)] =
    df.select(col("query_id"), col("rank").cast("int"), col("doc_id"),
        col(valueCol)).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet

  private def out(df: DataFrame): Set[(Long, Int, Long, Long)] =
    outCol(df, "n_occ")

  private def outSpan(df: DataFrame): Set[(Long, Int, Long, Long)] =
    outCol(df, "min_span")

  test("batch face: adjacency, overlap, and repeated-term phrases count exactly") {
    val d = docs(Seq(
      // query 100: phrase "big cat"
      (100L, "big cat query", "src0"),
      // one occurrence
      (1L, "the big cat sat", "src1"),
      // two non-overlapping occurrences
      (2L, "big cat and big cat", "src1"),
      // both words present but never adjacent: no match
      (3L, "big dog cat", "src1"),
      // reversed order: no match
      (4L, "cat big", "src1"),
      // query 101: repeated-term phrase "a a"; doc 5 "a a a" overlaps
      // at anchors 0 and 1 -> n_occ = 2
      (101L, "a a tail", "src0"),
      (5L, "a a a", "src1"),
      (6L, "a b a", "src1")))
    val got = out(CorpusOps.phraseMatchOn(d))
    assert(got == Set(
      (100L, 1, 2L, 2L), (100L, 2, 1L, 1L),
      (101L, 1, 5L, 2L)),
      s"phrase semantics mismatch: $got")
  }

  test("arbitrary phrase length: len=3 is strictly stricter than the bigram default; batch and index faces agree") {
    val d = docs(Seq(
      // query 100: leading trigram "big cat sat"
      (100L, "big cat sat query", "src0"),
      // full trigram, one occurrence
      (1L, "the big cat sat down", "src1"),
      // bigram "big cat" present but trigram broken: len=3 no match
      (2L, "big cat ran away", "src1"),
      // trigram twice
      (3L, "big cat sat big cat sat", "src1")))
    val got3 = out(CorpusOps.phraseMatchOn(d, len = 3))
    assert(got3 == Set((100L, 1, 3L, 2L), (100L, 2, 1L, 1L)),
      s"len=3 semantics mismatch: $got3")
    // the bigram default also matches doc 2 — len=3 must not
    val got2 = out(CorpusOps.phraseMatchOn(d))
    assert(got2.exists(_._3 == 2L),
      "fixture broken: bigram face should match doc 2")

    // incremental face: same answers over the same corpus
    val root = Files.createTempDirectory("graft-phrase3").toString
    val state = s"$root/state"
    IndexStream.applyBatch(spark, state,
      d.filter(col("source") =!= "src0"), 0L)
    val q = d.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"), col("text"))
    assert(out(IndexStream.queryPhrase(spark, state, q, len = 3)) ==
      got3, "index face len=3 must equal the batch face")
    // a query shorter than len retrieves nothing (no truncated phrase)
    import spark.implicits._
    assert(IndexStream.queryPhrase(spark, state,
      Seq((900L, "big cat")).toDF("query_id", "text"), len = 3)
      .collect().isEmpty,
      "a 2-token query must not phrase-match at len=3")
  }

  test("batch face: phrase terms absent from the train vocabulary retrieve nothing") {
    val d = docs(Seq(
      (100L, "zz yy rest", "src0"),
      (1L, "totally different words", "src1")))
    assert(out(CorpusOps.phraseMatchOn(d)).isEmpty)
  }

  test("incremental index matches the batch face at every corpus state, through compaction") {
    val root = Files.createTempDirectory("graft-phrase").toString
    val state = s"$root/state"
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    val train = d.filter(col("source") =!= "src0")
    val parts = (0 until 2).map(i =>
      train.filter(pmod(col("doc_id"), lit(2)) === i))
    val queries = d.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"), col("text"))
    def batchFace(n: Int): Set[(Long, Int, Long, Long)] = {
      val corpus = parts.take(n).foldLeft(
        d.filter(col("source") === "src0"))(_ unionByName _)
      out(CorpusOps.phraseMatchOn(corpus))
    }

    IndexStream.applyBatch(spark, state, parts(0), 0L)
    assert(out(IndexStream.queryPhrase(spark, state, queries)) ==
      batchFace(1),
      "partial-corpus phrase retrieval must equal the batch face")

    IndexStream.applyBatch(spark, state, parts(1), 1L)
    val want = batchFace(2)
    assert(want.nonEmpty, "fixture must retrieve something")
    assert(out(IndexStream.queryPhrase(spark, state, queries)) == want,
      "full-corpus phrase retrieval must equal the batch face")

    IndexStream.compactState(spark, state, 64L * 1024 * 1024)
    assert(out(IndexStream.queryPhrase(spark, state, queries)) == want,
      "compaction changed phrase results")
  }

  test("v2 -> v3 layout migration: positions rebuilt from docs.lt; phrase and BM25 answers match a fresh index") {
    val root = Files.createTempDirectory("graft-phrase-mig").toString
    val state = s"$root/state"
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    val train = d.filter(col("source") =!= "src0")
    val queries = d.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"), col("text"))

    // manufacture the state EXACTLY as the round-9 v2 layout stored it:
    // postings WITHOUT a positions column, docs with (lt, dl), dfs with
    // per-generation df rows, count markers, and the v2 _LAYOUT string
    val tf = train.filter(col("text").isNotNull)
      .select(col("doc_id"),
        explode(split(lower(col("text")), " ")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    tf.withColumn("tpfx", substring(md5(col("term")), 1, 2))
      .withColumn("ingest", lit(0L))
      .write.partitionBy("tpfx", "ingest").parquet(s"$state/postings")
    val docsRel = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      .join(train.filter(col("text").isNotNull)
        .select(col("doc_id"), lower(col("text")).as("lt")), Seq("doc_id"))
    docsRel.withColumn("dbucket", pmod(col("doc_id"), lit(256)))
      .withColumn("ingest", lit(0L))
      .write.partitionBy("dbucket", "ingest").parquet(s"$state/docs")
    tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .withColumn("gen", lit(0L))
      .withColumn("dpfx", substring(md5(col("term")), 1, 1))
      .withColumn("ingest", lit(0L))
      .write.partitionBy("dpfx", "ingest").parquet(s"$state/dfs")
    val stats = docsRel.agg(count(lit(1)), sum(col("dl"))).collect()(0)
    graft.streaming.LsmIndex.Markers(state)
      .write(spark, 0L, Seq(stats.getLong(0), stats.getLong(1)))
    Files.write(java.nio.file.Paths.get(state, "_LAYOUT"),
      ("graft-ridx-v2 postings=(tpfx=md5hex2(term),ingest):256 sort=term " +
        "docs=(dbucket=pmod256,ingest) sort=doc_id " +
        "dfs=(dpfx=md5hex1(term),ingest):16 sort=term gen-col " +
        "tok=lower-ws ncount=(n_docs,tot_dl) cap=2df<=n").getBytes("UTF-8"))

    // a v3 reader fails fast on v2 state until migrated
    val e = intercept[IllegalArgumentException] {
      IndexStream.queryPhrase(spark, state, queries)
    }
    assert(e.getMessage.contains("layout"))
    assert(IndexStream.migrateState(spark, state), "migration must run")
    assert(!IndexStream.migrateState(spark, state),
      "second call must be a version-match no-op")

    val freshState = s"$root/fresh"
    IndexStream.applyBatch(spark, freshState, train, 0L)
    val wantPhrase = out(IndexStream.queryPhrase(spark, freshState, queries))
    assert(wantPhrase.nonEmpty, "fixture must retrieve something")
    assert(out(IndexStream.queryPhrase(spark, state, queries)) == wantPhrase,
      "migrated positional index must answer exactly like a fresh one")
    val wantBm = IndexStream.queryTopK(spark, freshState, queries)
      .collect().map(_.toSeq).toSet
    assert(IndexStream.queryTopK(spark, state, queries)
      .collect().map(_.toSeq).toSet == wantBm,
      "migration must preserve BM25 answers too")
  }

  test("column pruning: the BM25 index face never reads the positions payload; the phrase face does") {
    val root = Files.createTempDirectory("graft-phrase-prune").toString
    val state = s"$root/state"
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    IndexStream.applyBatch(spark, state,
      d.filter(col("source") =!= "src0"), 0L)
    val queries = d.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"), col("text"))

    val bm = IndexStream.queryTopK(spark, state, queries)
      .queryExecution.explainString(FormattedMode)
    val bmPostings = bm.linesIterator
      .filter(_.contains("ReadSchema")).filter(_.contains("tf")).toSeq
    assert(bmPostings.nonEmpty, "no postings scan in the BM25 plan")
    assert(!bmPostings.exists(_.contains("positions")),
      "BM25 posting read pays for the positional payload")

    val ph = IndexStream.queryPhrase(spark, state, queries)
      .queryExecution.explainString(FormattedMode)
    val phPostings = ph.linesIterator
      .filter(_.contains("ReadSchema")).filter(_.contains("positions")).toSeq
    assert(phPostings.nonEmpty,
      "phrase face must read positions from the postings scan")
    assert(ph.contains("PushedFilters"),
      "phrase posting fetch lost its pushed filters")
  }

  test("NEAR: ordered window spans are minimal, order is required, repeated terms need distinct positions") {
    val d = docs(Seq(
      // query 100: terms ("big", "cat") in order
      (100L, "big cat query", "src0"),
      (1L, "big cat here", "src1"),          // adjacent: span 1
      (2L, "big dog dog cat", "src1"),       // span 3
      (3L, "cat big", "src1"),               // wrong order: no match
      (4L, "big then a cat and big cat", "src1"), // minimal span is 1
      // query 101: repeated-term phrase ("a", "a")
      (101L, "a a query", "src0"),
      (5L, "a b a", "src1"),                 // two distinct positions: span 2
      (6L, "b a b", "src1")))                // ONE position: no ordered pair
    val got = outSpan(CorpusOps.nearMatchOn(d))
    assert(got == Set(
      (100L, 1, 1L, 1L), (100L, 2, 4L, 1L), (100L, 3, 2L, 3L),
      (101L, 1, 5L, 2L)),
      s"NEAR semantics mismatch: $got")
  }

  test("NEAR: incremental index face matches the batch face") {
    val root = Files.createTempDirectory("graft-near").toString
    val state = s"$root/state"
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    IndexStream.applyBatch(spark, state,
      d.filter(col("source") =!= "src0"), 0L)
    val queries = d.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"), col("text"))
    val want = outSpan(CorpusOps.nearMatchOn(d))
    assert(want.nonEmpty, "fixture must retrieve something")
    assert(outSpan(IndexStream.queryNear(spark, state, queries)) == want,
      "index NEAR must equal the batch face bit-for-bit")
  }

  test("NEAR len=3 (round 11): chains are strictly increasing in slot order; minimal span found across interleavings") {
    val d = docs(Seq(
      (100L, "one two three query words", "src0"),
      (1L, "one two three", "src1"),         // adjacent: span 2
      (2L, "one x two y three", "src1"),     // span 4
      (3L, "three two one", "src1"),         // wrong order: no match
      // chains 0<1<4 (span 4), 0<3<4 (span 4), 2<3<4 (span 2): the
      // linear merge must find the LATEST-starting chain per end
      (4L, "one two one two three", "src1"),
      (5L, "two three one", "src1")))        // no ordered chain
    val got = outSpan(CorpusOps.nearMatchOn(d, len = 3))
    assert(got == Set(
      (100L, 1, 1L, 2L), (100L, 2, 4L, 2L), (100L, 3, 2L, 4L)),
      s"NEAR len-3 semantics mismatch: $got")
  }

  test("NEAR sloppy (round 11): adjacency scores 10^6 per occurrence, slop divides, documents rank by the exact-integer total") {
    val d = docs(Seq(
      (100L, "big cat query", "src0"),
      (1L, "big cat here", "src1"),          // one adjacency: 1000000
      (2L, "big x cat", "src1"),             // slop 1: 500000
      // ends at cat@1 (slop 0) and cat@4 (latest big@3, slop 0):
      // 2000000 — two tight occurrences outrank one
      (3L, "big cat and big cat", "src1"),
      (4L, "cat big", "src1")))              // wrong order: no match
    val got = outCol(CorpusOps.nearMatchOn(d, sloppy = true),
      "sloppy_micro")
    assert(got == Set(
      (100L, 1, 3L, 2000000L), (100L, 2, 1L, 1000000L),
      (100L, 3, 2L, 500000L)),
      s"sloppy-frequency semantics mismatch: $got")
  }

  test("NEAR len-generic + sloppy: incremental index faces match the batch faces bit-for-bit") {
    val root = Files.createTempDirectory("graft-near-gen").toString
    val state = s"$root/state"
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    IndexStream.applyBatch(spark, state,
      d.filter(col("source") =!= "src0"), 0L)
    val queries = d.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"), col("text"))
    val want3 = outSpan(CorpusOps.nearMatchOn(d, len = 3))
    assert(want3.nonEmpty, "len-3 fixture must retrieve something")
    assert(outSpan(IndexStream.queryNear(spark, state, queries,
      len = 3)) == want3,
      "index NEAR len-3 must equal the batch face")
    val wantS = outCol(CorpusOps.nearMatchOn(d, sloppy = true),
      "sloppy_micro")
    assert(wantS.nonEmpty, "sloppy fixture must retrieve something")
    assert(outCol(IndexStream.queryNear(spark, state, queries,
      sloppy = true), "sloppy_micro") == wantS,
      "index sloppy NEAR must equal the batch face")
  }

  test("batch face plan: no cartesian product; the phrase side broadcasts") {
    val p = SparkEntry.queries("phrase_match")(spark, sf)
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("CartesianProduct"),
      "phrase match must stay an equi-join on term")
    assert(p.contains("BroadcastHashJoin"),
      "the queries x phraseLen side should broadcast")
  }

  test("unordered NEAR: any-order windows, ordered misses recovered, dup-term phrases excluded") {
    val d = docs(Seq(
      (100L, "big cat query", "src0"),
      (1L, "big cat here", "src1"),     // adjacent in order: span 1
      (2L, "cat big", "src1"),          // adjacent REVERSED: span 1 here,
                                        // invisible to ordered NEAR
      (3L, "big x y cat", "src1"),      // span 3 either way
      (4L, "cat z big", "src1"),        // reversed span 2
      (5L, "big dog", "src1"),          // cat missing: no window
      // dup-term phrase query: excluded by the distinct-terms contract
      (101L, "a a query", "src0"),
      (6L, "a a a", "src1")))
    val got = outSpan(CorpusOps.nearUnorderedOn(d))
    assert(got == Set(
      (100L, 1, 1L, 1L), (100L, 2, 2L, 1L), (100L, 3, 4L, 2L)),
      s"unordered NEAR semantics mismatch: $got")
    assert(!got.exists(_._1 == 101L),
      "dup-term phrase queries must be excluded")
    // the ordered face cannot see doc 2's reversed adjacency
    val ordered = outSpan(CorpusOps.nearMatchOn(d))
    assert(!ordered.exists(t => t._1 == 100L && t._3 == 2L),
      "fixture broken: ordered NEAR should miss the reversed pair")
  }

  test("unordered NEAR len=3: minimal cover across interleavings; sloppy grade exact") {
    val d = docs(Seq(
      (100L, "one two three query words", "src0"),
      (1L, "three one two", "src1"),         // any-order adjacent: span 2
      (2L, "one x two y three", "src1"),     // span 4
      // minimal cover is the TAIL window [three@3, two@4, one@5]:
      // span 2 — the sweep must find it among the earlier, wider
      // covers ending at three@3 (span 3) and two@4 (span 3)
      (3L, "two one z three two one", "src1"),
      (4L, "one two", "src1")))              // three missing: no window
    val got = outSpan(CorpusOps.nearUnorderedOn(d, len = 3))
    assert(got == Set(
      (100L, 1, 1L, 2L), (100L, 2, 3L, 2L), (100L, 3, 2L, 4L)),
      s"unordered NEAR len-3 mismatch: $got")
    val sloppy = outCol(CorpusOps.nearUnorderedOn(d, sloppy = true),
      "sloppy_micro")
    // bigram "one two": doc1 reversed-adjacent windows... recompute on
    // the len=2 face: doc 1 "three one two" -> one@1,two@2: span 1 =
    // 10^6; doc 2 span 2 (one@0,two@2) = 500000; doc 3 windows ending
    // at one@1 (two@0: span 1 -> 10^6), two@4 (one@1? latest one@1,
    // span 3 -> 333333), one@5 (two@4, span 1 -> 10^6); doc 4 span 1
    assert(sloppy.exists(t => t._3 == 3L && t._4 == 2333333L),
      s"sloppy unordered total mismatch: $sloppy")
  }

  test("snippets: best window located (ties -> earliest), token run sliced exactly") {
    val d = docs(Seq(
      (100L, "big cat query", "src0"),
      // two windows: [big@1, cat@3] span 2 and [cat@3, big@4] span 1
      // -> best is the TIGHTER reversed one: "cat big"
      (1L, "x big y cat big z", "src1"),
      // tie on span (two adjacencies): earliest window wins
      (2L, "big cat then big cat", "src1"),
      (3L, "cat q r s big", "src1")))      // span 4: "cat q r s big"
    val got = graft.operators.CorpusOps.searchSnippetsOn(d)
      .select("query_id", "rank", "doc_id", "snip_start", "snippet")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSet
    assert(got == Set(
      (100L, 1, 1L, 3L, "cat big"),
      (100L, 2, 2L, 0L, "big cat"),
      (100L, 3, 3L, 0L, "cat q r s big")),
      s"snippet semantics mismatch: $got")
  }

  test("unordered NEAR: incremental index face matches the batch face") {
    val root = Files.createTempDirectory("graft-near-unord").toString
    val state = s"$root/state"
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    IndexStream.applyBatch(spark, state,
      d.filter(col("source") =!= "src0"), 0L)
    val queries = d.filter(col("source") === "src0")
      .select(col("doc_id").as("query_id"), col("text"))
    val want = outSpan(CorpusOps.nearUnorderedOn(d))
    assert(want.nonEmpty, "fixture must retrieve something")
    assert(outSpan(IndexStream.queryNearUnordered(spark, state,
      queries)) == want,
      "index unordered NEAR must equal the batch face bit-for-bit")
  }
}
