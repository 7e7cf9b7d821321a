package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.CorpusOps
import graft.streaming.IndexStream

/** FIELD-LOCAL DF (round 15, layout v8): a `title:`-restricted clause
  * selects and scores with its title-local document frequency (the
  * dfs sub-table's fold-maintained `dft` column) instead of the
  * understating any-field df — so a term common in bodies but rare in
  * titles is RARE for a title-restricted query. Pins the fold/delete
  * maintenance of dft, index ≡ batch, the pre-v8 coalesce, and that
  * migration tightens a coalesced dft back to exact.
  */
class Bm25fLdfSpec extends SparkSpecBase {

  private def fieldedDocs(
      rows: Seq[(Long, String, String, String)]): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("title", StringType, nullable = false),
      StructField("text", StringType, nullable = false),
      StructField("source", StringType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (id, ti, t, s) => Row(id, ti, t, s) }, 2), schema)
  }

  // `zz` appears in EVERY body (any-field df = 8 of 8 train docs —
  // over the 2·df ≤ n cap, a stopword) but in only ONE title
  // (dft = 1 — rare). `qq` is body-only rare. Query 100 restricts zz
  // to the title; under any-field df the clause caps out, under
  // field-local df it ranks doc 1 on title rarity.
  private val train = (1L to 8L).map { i =>
    val ti = if (i == 1L) "zz top" else s"t$i top"
    (i, ti, s"zz filler$i " + (if (i <= 2) "qq" else s"w$i"), "src1")
  }
  private val corpus = (100L, "qz qz", "title:zz qq", "src0") +: train

  private def queries(spark: org.apache.spark.sql.SparkSession) = {
    import spark.implicits._
    Seq((100L, "title:zz qq")).toDF("query_id", "text")
  }

  test("a title-restricted clause uses title rarity: stopword-by-any-field-df becomes the rarest clause") {
    val d = fieldedDocs(corpus)
    val trips = CorpusOps.parseFieldedQuery(queries(spark))
    val anyDf = CorpusOps.bm25fScoredOn(d, trips)
      .select("query_id", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ldf = CorpusOps.bm25fScoredOn(d, trips, fieldLocalDf = true)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(4))).toSet
    // any-field: the zz clause is capped (df=8 of n=8), only qq
    // scores → docs 1 and 2 surface on qq alone
    assert(anyDf.map(_._2) == Set(1L, 2L),
      s"any-field df must cap the zz clause to qq-only matches: $anyDf")
    // field-local: zz@title has cdf=1 (rarest), so doc 1 (the one
    // titled zz) must now rank FIRST with BOTH clauses scoring
    val first = ldf.find(t => t._2 == 1)
    assert(first.exists(t => t._3 == 1L && t._4 == 2L),
      s"field-local df must rank the zz-titled doc first with 2 " +
        s"scoring clauses: $ldf")
  }

  test("index face maintains dft across folds and deletes, bit-identical to the batch face") {
    import spark.implicits._
    val d = fieldedDocs(corpus)
    val root = Files.createTempDirectory("graft-ldf").toString
    val state = s"$root/state"
    IndexStream.applyBatch(spark, state,
      d.filter(col("source") =!= "src0").filter(col("doc_id") <= 4L), 0L)
    IndexStream.applyBatch(spark, state,
      d.filter(col("source") =!= "src0").filter(col("doc_id") > 4L), 1L)
    val q = queries(spark)
    val cols = Seq("query_id", "rank", "doc_id", "score_micro", "n_terms")
    val batch = CorpusOps.bm25fScoredOn(d,
        CorpusOps.parseFieldedQuery(q), fieldLocalDf = true)
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    val index = IndexStream.queryFieldedTagged(spark, state, q,
        fieldLocalDf = true)
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    assert(batch == index && batch.nonEmpty,
      s"ldf index face must equal the batch face: $index vs $batch")
    // delete the ONLY zz-titled doc: its negative dfs row must carry
    // dft = -1, so the title clause's cdf drops to 0 and the ranking
    // degrades to the qq-only matches — equal to the batch face over
    // the shrunken corpus
    IndexStream.deleteDocs(spark, state, Seq(1L).toDF("doc_id"), 0L)
    val after = IndexStream.queryFieldedTagged(spark, state, q,
        fieldLocalDf = true)
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    val batchAfter = CorpusOps.bm25fScoredOn(
        fieldedDocs(corpus.filterNot(_._1 == 1L)),
        CorpusOps.parseFieldedQuery(q), fieldLocalDf = true)
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    assert(after == batchAfter && after.nonEmpty,
      s"post-delete dft must subtract exactly: $after vs $batchAfter")
    assert(!after.exists(_(2) == 1L),
      s"the deleted doc must not rank: $after")
  }

  test("pre-v8 generation rows coalesce dft to any-field df; migration tightens back to exact") {
    val d = fieldedDocs(corpus)
    val root = Files.createTempDirectory("graft-ldf-mig").toString
    val state = s"$root/state"
    IndexStream.applyBatch(spark, state,
      d.filter(col("source") =!= "src0"), 0L)
    val q = queries(spark)
    val cols = Seq("query_id", "rank", "doc_id", "score_micro", "n_terms")
    val exact = IndexStream.queryFieldedTagged(spark, state, q,
        fieldLocalDf = true)
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    // simulate an upgraded-in-place state: rewrite the generation's
    // dfs files WITHOUT the dft column (exactly what a pre-v8 fold
    // left on disk)
    val stripped = spark.read.parquet(s"$state/dfs")
      .select(col("term"), col("df"), col("max_tf"), col("gen"),
        col("dpfx").cast("string"), col("ingest").cast("long"))
      .collect()
    val schema = StructType(Seq(
      StructField("term", StringType), StructField("df", LongType),
      StructField("max_tf", LongType), StructField("gen", LongType),
      StructField("dpfx", StringType), StructField("ingest", LongType)))
    val hfs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    hfs.delete(new org.apache.hadoop.fs.Path(s"$state/dfs"), true)
    spark.createDataFrame(
        spark.sparkContext.parallelize(stripped.toSeq, 2), schema)
      .write.partitionBy("dpfx", "ingest").parquet(s"$state/dfs")
    spark.catalog.refreshByPath(s"$state/dfs")
    // coalesced read: the title clause's cdf falls back to the
    // any-field df (8 — capped out), so ldf degrades to the qq-only
    // ranking, exactly the any-field result — never an error
    val coalesced = IndexStream.queryFieldedTagged(spark, state, q,
        fieldLocalDf = true)
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    val anyField = IndexStream.queryFieldedTagged(spark, state, q)
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    assert(coalesced == anyField && coalesced.nonEmpty,
      s"pre-v8 rows must coalesce to any-field semantics: " +
        s"$coalesced vs $anyField")
    assert(coalesced != exact,
      "the fixture must make coalesced and exact dft distinguishable")
    // a GENUINE pre-v8 state (old _LAYOUT string): queries refuse
    // fast, and migrateState re-derives dft exactly from positions vs
    // the stored boundary — the ldf ranking returns to the v8 result
    // through the hadoop fs (not raw nio): ensureLayout wrote the
    // marker with a checksum sidecar a raw overwrite would invalidate
    val lout = hfs.create(
      new org.apache.hadoop.fs.Path(state, "_LAYOUT"), true)
    try lout.write(
      ("graft-ridx-v7 postings=(tpfx=md5hex2(term),ingest):256 " +
        "sort=term pos=sorted-int-array title-first " +
        "docs=(dbucket=pmod256,ingest) sort=doc_id ttl-col " +
        "dfs=(dpfx=md5hex1(term),ingest):16 sort=term gen-col " +
        "impact=max_tf " +
        "tombs=(dbucket=pmod256,ingest) del=neg-df+neg-markers " +
        "tok=lower-ws ncount=(n_docs,tot_dl,tot_ttl) title=5x2 " +
        "cap=2df<=n").getBytes("UTF-8"))
    finally lout.close()
    val e = intercept[IllegalArgumentException] {
      IndexStream.queryFieldedTagged(spark, state, q,
        fieldLocalDf = true).collect()
    }
    assert(e.getMessage.contains("layout"),
      s"a pre-v8 layout must refuse to serve: ${e.getMessage}")
    assert(IndexStream.migrateState(spark, state))
    val migrated = IndexStream.queryFieldedTagged(spark, state, q,
        fieldLocalDf = true)
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    assert(migrated == exact,
      s"migration must tighten dft to exact: $migrated vs $exact")
  }
}
