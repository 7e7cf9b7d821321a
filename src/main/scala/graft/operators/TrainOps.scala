package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.{canon, canonOrderSql, load}

/** Training-preparation operators: the steps between a cleaned corpus
  * and a tokenized training run — vocabulary construction, leak-proof
  * dataset splitting, and curriculum binning.
  *
  * Shares the corpus-wide disciplines of [[CorpusOps]]: RNG-free
  * determinism (salted md5, not `rand()`), exact-integer arithmetic
  * across aggregations, and canonical output order.
  */
object TrainOps {

  // ---------------------------------------------------------------------
  // vocab_build — tokenizer vocabulary with deterministic id assignment
  // ---------------------------------------------------------------------

  /** Tokens below this corpus frequency stay out of the vocabulary. */
  private val vocabMinCount = 5L

  /** Vocabulary construction: corpus-wide token frequencies, a min-count
    * floor, and a deterministic token-id assignment (ids dense from 0,
    * ordered by frequency DESC then token ASC — the ordering every
    * tokenizer trainer fixes so that re-running on the same corpus
    * yields the same id map).
    *
    * Scale: the count aggregates token-wise with map-side partials, so
    * the shuffle carries distinct-token partial counts — bounded by
    * type count, not corpus size. The id-assigning window is GLOBAL
    * (single partition) by necessity — ids are a total order — but it
    * runs over the post-filter vocabulary, again type-count-bounded
    * (a few million rows for any natural-language corpus, not 100 TB).
    *
    * This relation (token, n_count, token_id) is shared by vocab_build
    * and tokenizer_apply.
    */
  private def vocabRel(d: DataFrame): DataFrame = {
    val counts = d
      .select(explode(split(lower(col("text")), " ")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n_count"))
      .filter(col("n_count") >= vocabMinCount)
    // DISTRIBUTED total-order rank (round 16): the previous
    // Window.orderBy with no partition moved the whole post-filter
    // vocabulary through ONE task (Spark's "No Partition Defined"
    // warning — the largest serial chokepoint left in a declared query
    // path). Standard two-level rank instead: range-partition by the
    // id ordering, rank within each range, then add per-range offsets.
    // The ids depend only on the (n_count DESC, token ASC) total order
    // — token is unique, so ranks are unambiguous and the output is
    // bit-identical to the single-partition window. The ranked relation
    // is persisted so the offsets (computed from it) and the final
    // projection read ONE materialization — range boundaries are
    // sampled per execution, and an unpersisted double execution could
    // assign rows to different ranges than the offsets were summed
    // over. The offset collect is partition-count-bounded (the same
    // bounded-collect contract as the auto-sized ANN faces), never
    // data-sized.
    val wLocal = Window.partitionBy(col("pid"))
      .orderBy(col("n_count").desc, col("token").asc)
    val ranked = Caching.persistOnce(
      counts.repartitionByRange(col("n_count").desc, col("token").asc)
        .withColumn("pid", spark_partition_id())
        .withColumn("lrn", row_number().over(wLocal)))
    val counted = ranked.groupBy(col("pid"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    var acc = 0L
    val bases = counted.map { case (pid, cnt) =>
      val b = (pid, acc); acc += cnt; b
    }.toSeq
    val spark = d.sparkSession
    import spark.implicits._
    ranked.join(broadcast(bases.toDF("pid", "base")), Seq("pid"))
      .withColumn("token_id", (col("base") + col("lrn") - 1).cast("long"))
      .select(col("token"), col("n_count"), col("token_id"))
  }

  /** The matching SQL as a CTE chain ending in
    * `vocab(token, n_count, token_id)`.
    */
  private val vocabCteSql: String =
    s"""vtoks AS (
       |  SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents
       |), vc AS (
       |  SELECT token, count(*) AS n_count FROM vtoks
       |  GROUP BY token HAVING count(*) >= $vocabMinCount
       |), vocab AS (
       |  SELECT token, n_count,
       |    CAST(row_number() OVER (ORDER BY n_count DESC, token ASC) - 1
       |      AS BIGINT) AS token_id
       |  FROM vc
       |)""".stripMargin

  def vocabBuild(spark: SparkSession, sfDir: String): DataFrame =
    canon(vocabRel(load(spark, sfDir, "documents")))

  val vocabBuildSql: String =
    s"""WITH $vocabCteSql
       |SELECT token, n_count, token_id FROM vocab
       |${canonOrderSql(Seq("token", "n_count", "token_id"))}""".stripMargin

  // ---------------------------------------------------------------------
  // tokenizer_apply — encode the corpus with the trained vocabulary
  // ---------------------------------------------------------------------

  /** The apply half of the vocabulary story: every document encoded as
    * its token-id sequence under the vocab_build id map — out-of-vocab
    * tokens become the -1 sentinel and are counted explicitly. The
    * sequence itself is pinned by an md5 digest of the ORDERED id list
    * (one narrow oracle row per document, but any reordering, dropped
    * token, or wrong id changes the hash).
    *
    * Scale: the token explode joins the vocabulary on the token key —
    * vocab is type-count-bounded so AQE broadcasts it (no hint: a
    * garbage corpus degrades to SMJ, not OOM) — then one shuffle keyed
    * by doc_id re-assembles sequences. collect_list order is
    * nondeterministic, so the ids sort by position BEFORE the digest
    * (the inverted_index discipline).
    */
  def tokenizerApply(spark: SparkSession, sfDir: String): DataFrame = {
    val d = load(spark, sfDir, "documents")
    val toks = d.select(col("doc_id"),
      posexplode(split(lower(col("text")), " ")).as(Seq("pos", "token")))
    val ids = toks
      .join(vocabRel(d).select(col("token"), col("token_id")),
        Seq("token"), "left")
      .select(col("doc_id"), col("pos"),
        coalesce(col("token_id"), lit(-1L)).as("id"))
    val out = ids.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("id") === -1L, 1L).otherwise(0L)).as("n_oov"),
        md5(array_join(expr(
          """transform(
            |  sort_array(collect_list(named_struct('p', pos, 'id', id))),
            |  x -> cast(x.id as string))""".stripMargin), ","))
          .as("ids_digest"))
    canon(out)
  }

  val tokenizerApplySql: String =
    s"""WITH $vocabCteSql,
       |dt AS (
       |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
       |), tok AS (
       |  SELECT doc_id, i.i AS pos, t[i.i] AS token
       |  FROM dt, unnest(generate_series(1, len(t))) AS i(i)
       |), j AS (
       |  SELECT tok.doc_id, tok.pos,
       |    coalesce(v.token_id, -1) AS id
       |  FROM tok LEFT JOIN vocab v ON tok.token = v.token
       |)
       |SELECT doc_id, count(*) AS n_tokens,
       |  CAST(sum(CASE WHEN id = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       |  md5(array_to_string(
       |    list_transform(list(id ORDER BY pos), x -> CAST(x AS VARCHAR)),
       |    ',')) AS ids_digest
       |FROM j GROUP BY doc_id
       |${canonOrderSql(Seq("doc_id", "n_tokens", "n_oov", "ids_digest"))}""".stripMargin

  // ---------------------------------------------------------------------
  // dataset_split — content-hash train/valid/test assignment
  // ---------------------------------------------------------------------

  /** Deterministic train/valid/test split keyed on a hash of the TEXT,
    * not the id: byte-identical documents always land in the same
    * split, so exact duplicates can never leak across the train/test
    * boundary. (Id-keyed splits — the obvious formulation — put two
    * copies of the same document on both sides; this is the standard
    * fix.) 80/10/10 by the first 8 md5 hex digits mod 100 — the same
    * salted-hash discipline as mixture_sample/stratified_sample, so the
    * assignment is identical at any partitioning and over re-runs.
    *
    * Scale: stateless per-row projection — no shuffle at all beyond the
    * canonical output sort.
    *
    * This raw assignment (doc_id, source, bucket, split) is shared by
    * dataset_split and split_leak_check.
    */
  private def splitRel(d: DataFrame): DataFrame = d
    .select(col("doc_id"), col("source"),
      expr("cast(conv(substr(md5(text), 1, 8), 16, 10) as bigint) % 100")
        .as("bucket"))
    .withColumn("split",
      when(col("bucket") < 80, "train")
        .when(col("bucket") < 90, "valid")
        .otherwise("test"))

  /** The matching SQL, as a CTE body over `documents`. */
  private val splitRelSql: String =
    """SELECT doc_id,
      |    CASE WHEN b < 80 THEN 'train'
      |         WHEN b < 90 THEN 'valid'
      |         ELSE 'test' END AS split
      |  FROM (SELECT doc_id,
      |          ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 AS b
      |        FROM documents)""".stripMargin

  def datasetSplit(spark: SparkSession, sfDir: String): DataFrame =
    canon(splitRel(load(spark, sfDir, "documents")))

  val datasetSplitSql: String =
    s"""WITH b AS (
       |  SELECT doc_id, source,
       |    ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 AS bucket
       |  FROM documents
       |)
       |SELECT doc_id, source, bucket,
       |  CASE WHEN bucket < 80 THEN 'train'
       |       WHEN bucket < 90 THEN 'valid'
       |       ELSE 'test' END AS split
       |FROM b
       |${canonOrderSql(Seq("doc_id", "source", "bucket", "split"))}""".stripMargin

  // ---------------------------------------------------------------------
  // split_leak_check — cross-split near-duplicate contamination audit
  // ---------------------------------------------------------------------

  /** Near-dup pairs that STRADDLE a split boundary: the dataset_split
    * content-hash guard stops byte-identical leakage, but a train
    * document that is merely NEAR-identical to a test document still
    * contaminates evaluation. This audit runs the minhash-LSH near-dup
    * pipeline (bucketed candidates + exact-Jaccard verify — never
    * all-pairs) and keeps verified pairs (jaccard ≥ 0.3) whose members
    * landed in different splits — the report an eval-integrity gate
    * consumes before a training run ships.
    *
    * Scale: inherits minhash_lsh's shape (the one quadratic-free
    * near-dup route); the two split joins key on doc_id against a
    * stateless projection, so they co-partition with the pair
    * relation's existing keys.
    */
  def splitLeakCheck(spark: SparkSession, sfDir: String): DataFrame = {
    val d = load(spark, sfDir, "documents")
    val pairs = Dedup.minhashLshOn(d).filter(col("jaccard") >= 0.3)
    val sp = splitRel(d).select(col("doc_id"), col("split"))
    val out = pairs
      .join(sp.select(col("doc_id").as("a_id"), col("split").as("split_a")),
        Seq("a_id"))
      .join(sp.select(col("doc_id").as("b_id"), col("split").as("split_b")),
        Seq("b_id"))
      .filter(col("split_a") =!= col("split_b"))
      .select(col("a_id"), col("b_id"), col("split_a"), col("split_b"),
        floor(col("jaccard") * lit(1000000.0)).cast("long").as("jac_micro"))
    canon(out)
  }

  val splitLeakCheckSql: String =
    s"""WITH ${Dedup.minhashPairsCte},
       |splits AS (
       |  $splitRelSql
       |)
       |SELECT p.a_id, p.b_id, sa.split AS split_a, sb.split AS split_b,
       |  CAST(floor(p.jaccard * 1000000.0) AS BIGINT) AS jac_micro
       |FROM mh_pairs p
       |JOIN splits sa ON p.a_id = sa.doc_id
       |JOIN splits sb ON p.b_id = sb.doc_id
       |WHERE p.jaccard >= 0.3 AND sa.split <> sb.split
       |${canonOrderSql(Seq("a_id", "b_id", "split_a", "split_b", "jac_micro"))}""".stripMargin

  // ---------------------------------------------------------------------
  // curriculum_bins — per-language quartile binning by length
  // ---------------------------------------------------------------------

  /** Curriculum binning: each document's length quartile WITHIN its
    * language (`ntile(4)`) — the easy→hard ordering signal a curriculum
    * schedule consumes, computed per language because absolute length
    * thresholds are not comparable across languages (the
    * length_outliers argument). Ties break on doc_id so the bin
    * boundary is deterministic.
    *
    * Scale: one shuffle keyed by lang for the window; a language is a
    * coarse partition (the documented per-group serialization of the
    * exact rank family) — at 100 TB the same ntile runs over
    * (lang, bucket-of-doc_id) salts with a merge of boundary counts, or
    * the fences come from approx_percentile as in length_outliers.
    */
  def curriculumBins(spark: SparkSession, sfDir: String): DataFrame = {
    val d = load(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n_chars").asc, col("doc_id").asc)
    val out = d.withColumn("bin", ntile(4).over(w).cast("long"))
    canon(out)
  }

  val curriculumBinsSql: String =
    s"""SELECT doc_id, lang, n_chars,
       |  CAST(ntile(4) OVER (
       |    PARTITION BY lang ORDER BY n_chars ASC, doc_id ASC) AS BIGINT)
       |    AS bin
       |FROM documents
       |${canonOrderSql(Seq("doc_id", "lang", "n_chars", "bin"))}""".stripMargin

  // ---------------------------------------------------------------------
  // bpe_merges — byte-pair-encoding merge-rule training
  // ---------------------------------------------------------------------

  /** Merge rounds trained (each round = one learned merge rule). */
  private val bpeSteps = 3

  /** BPE tokenizer training, the merge-rule half vocab_build doesn't
    * cover: split every distinct word into characters, then repeatedly
    * (a) count adjacent symbol pairs weighted by word frequency,
    * (b) take the top pair (count DESC, then lexicographic — the
    * deterministic tie-break every reproducible trainer fixes), and
    * (c) rewrite the sequences with the pair merged. Emits the learned
    * merge table (step, l, r, merged, cnt) — the artifact a tokenizer
    * ships.
    *
    * The rewrite must be BIT-PORTABLE across engines, so it is defined
    * as exactly two sentinel-padded `replace` passes
    * (`' '||seq||' '` with pattern `' l r '` → `' lr '`, then trim):
    * both engines' replace scans left-to-right non-overlapping with
    * identical semantics, and the second pass catches the
    * shared-boundary-space occurrence the first pass skips in an odd
    * run. (This deviates from textbook BPE only on 4+ runs of the same
    * symbol pair inside one word — and identically on both engines, so
    * the oracle pins the exact behavior.)
    *
    * Scale: the classic BPE trick — train on the DISTINCT-WORD relation
    * (type-bounded, carrying corpus counts), never the corpus. Each
    * round is one pair-count shuffle at symbol²-bounded cardinality, a
    * 1-row top-pair broadcast stamp, and a projection-only rewrite.
    * Rounds are inherently sequential (merge k+1 counts pairs created
    * by merge k) — K bounded shuffles, same dependency structure as
    * dedup_clusters' rounds.
    */
  /** The BPE training loop's full result: the per-step merge rules AND
    * the final post-merge sequences — one implementation feeding both
    * [[bpeMerges]] (the rule table) and [[bpeVocab]] (the symbol
    * vocabulary the rules induce).
    */
  private def bpeTrain(spark: SparkSession,
      sfDir: String): (Seq[DataFrame], DataFrame) = {
    val words = load(spark, sfDir, "documents")
      .select(explode(split(lower(col("text")), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
    // "(?!$)" splits at every inter-character boundary but NOT at end of
    // string: Java's split(regex, -1) keeps the trailing empty element a
    // bare "" pattern produces, so round-1 counts would see a phantom
    // (last-char, "") pair weighted by word frequency — frequent enough
    // on realistic text (final 'e' etc.) to WIN round 1 and emit a bogus
    // merge rule. DuckDB's string_split(word, '') never yields the
    // phantom, so this is also a silent cross-engine divergence;
    // TrainOpsSpec pins a fixture where the phantom pair would win.
    var seqs = words.select(col("word"), col("n"),
      array_join(split(col("word"), "(?!$)"), " ").as("seq"))
    val merges = (1 to bpeSteps).map { k =>
      // persisted: each round reads the relation twice (pair count +
      // rewrite); callers own the cache lifecycle
      val s = Caching.persistOnce(seqs)
      val pairs = s
        .select(col("n"), split(col("seq"), " ").as("t"))
        .select(col("n"), expr(
          """explode(transform(
            |  if(size(t) > 1, sequence(2, size(t)), array_repeat(1, 0)),
            |  i -> struct(t[i-2] AS l, t[i-1] AS r))) AS p""".stripMargin))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("n")).as("cnt"))
      val top = pairs.orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1)
      seqs = s.crossJoin(broadcast(top))
        .select(col("word"), col("n"), trim(expr(
          "replace(replace(concat(' ', seq, ' '), " +
            "concat(' ', l, ' ', r, ' '), concat(' ', l, r, ' ')), " +
            "concat(' ', l, ' ', r, ' '), concat(' ', l, r, ' '))"))
          .as("seq"))
      top.select(lit(k).as("step"), col("l"), col("r"),
        concat(col("l"), col("r")).as("merged"), col("cnt"))
    }
    (merges, seqs)
  }

  def bpeMerges(spark: SparkSession, sfDir: String): DataFrame =
    canon(bpeTrain(spark, sfDir)._1.reduce(_ unionByName _))

  /** Adjacent-symbol pair counts over a (n, seq) relation — the
    * per-round aggregate both training loops share.
    */
  private def bpePairCounts(s: DataFrame): DataFrame = s
    .select(col("n"), split(col("seq"), " ").as("t"))
    .select(col("n"), expr(
      """explode(transform(
        |  if(size(t) > 1, sequence(2, size(t)), array_repeat(1, 0)),
        |  i -> struct(t[i-2] AS l, t[i-1] AS r))) AS p""".stripMargin))
    .groupBy(col("p.l").as("l"), col("p.r").as("r"))
    .agg(sum(col("n")).as("cnt"))

  /** The production form of [[bpeTrain]]: N merge rounds at FLAT
    * per-round cost. The 3-round face above is the oracle anchor (a
    * recursive-CTE chain DuckDB can mirror); a real tokenizer trains
    * thousands of rounds, and the unrolled loop is driver-side plan
    * growth waiting to happen — round k's sequences are a plan over
    * round k-1's, so analysis/optimization cost grows with k even
    * though each round's DATA work is constant.
    *
    * Same recipe as dedup_clusters' propagation loop
    * ([[Dedup.dedupClustersOn]]): each round's sequences are rebuilt
    * over an explicitly persisted RDD[Row] (lineage truncated to depth
    * 1), the superseded generation's blocks are dropped as soon as the
    * next is materialized, and the only driver-side data is the 1-row
    * winning pair per round — the same bounded driver pattern as the
    * convergence sum there. The winner is stamped into the rewrite as
    * a LITERAL (not the 3-round face's crossJoin(broadcast(top))), so
    * plan size is round-independent.
    *
    * Rewrite semantics are bit-identical to the 3-round face (same
    * two sentinel-padded replace passes); BpeTrainNSpec pins rounds
    * 1-3 equal to [[bpeMerges]] and per-round wall time flat over 50
    * rounds. Returns (merge table, per-round wall seconds).
    */
  private[graft] def bpeTrainN(spark: SparkSession, sfDir: String,
      steps: Int): (DataFrame, Seq[Double]) = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val words = load(spark, sfDir, "documents")
      .select(explode(split(lower(col("text")), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
    val seqSchema = StructType(Seq(
      StructField("n", LongType), StructField("seq", StringType)))
    def truncate(df: DataFrame): (DataFrame, org.apache.spark.rdd.RDD[Row]) = {
      val rdd = df.rdd
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      (spark.createDataFrame(rdd, seqSchema), rdd)
    }
    // the word column is training metadata the loop never reads — drop
    // it so each generation's persisted footprint is (count, sequence)
    var (seqs, curRdd) = truncate(words.select(col("n"),
      array_join(split(col("word"), "(?!$)"), " ").as("seq")))
    val merges = scala.collection.mutable.ArrayBuffer.empty[Row]
    val roundSecs = scala.collection.mutable.ArrayBuffer.empty[Double]
    var k = 0
    var exhausted = false
    while (k < steps && !exhausted) {
      k += 1
      val t0 = System.nanoTime()
      // one driver row per round: the winning (l, r, cnt). This action
      // also materializes the current generation's persisted RDD.
      val top = bpePairCounts(seqs)
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) {
        // every word is a single symbol — nothing left to merge
        exhausted = true
      } else {
        val (l, r, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Row(k, l, r, l + r, cnt)
        val pat = concat(lit(" "), lit(l), lit(" "), lit(r), lit(" "))
        val rep = concat(lit(" "), lit(l + r), lit(" "))
        val padded = concat(lit(" "), col("seq"), lit(" "))
        val (next, nextRdd) = truncate(seqs.select(col("n"),
          trim(replace(replace(padded, pat, rep), pat, rep)).as("seq")))
        nextRdd.count() // materialize BEFORE dropping the parent blocks
        curRdd.unpersist(false)
        seqs = next
        curRdd = nextRdd
      }
      roundSecs += (System.nanoTime() - t0) / 1e9
    }
    curRdd.unpersist(false)
    val mergeSchema = StructType(Seq(
      StructField("step", org.apache.spark.sql.types.IntegerType),
      StructField("l", StringType), StructField("r", StringType),
      StructField("merged", StringType), StructField("cnt", LongType)))
    val out = spark.createDataFrame(
      spark.sparkContext.parallelize(merges.toSeq, 1), mergeSchema)
    (canon(out), roundSecs.toSeq)
  }

  /** The OTHER half of the tokenizer-training artifact: the symbol
    * vocabulary the learned merges induce — every distinct symbol in
    * the post-merge sequences with its corpus occurrence count (word
    * counts weighting each in-word occurrence). After K merges the
    * vocabulary is base characters plus ≤ K merged symbols; a tokenizer
    * ships exactly (merge rules, vocabulary) as its model.
    *
    * Scale: the symbol explode runs over the DISTINCT-WORD relation
    * (type-bounded, like the training loop itself), and the final
    * aggregate is at vocabulary cardinality — map-side combinable.
    */
  def bpeVocab(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, seqs) = bpeTrain(spark, sfDir)
    val out = seqs
      .select(col("n"), explode(split(col("seq"), " ")).as("symbol"))
      .groupBy(col("symbol"))
      .agg(sum(col("n")).as("n_count"))
      .withColumn("is_merged",
        when(length(col("symbol")) > 1, 1).otherwise(0))
    canon(out)
  }

  val bpeVocabSql: String =
    s"""$bpeCtes
       |SELECT symbol, CAST(sum(n) AS BIGINT) AS n_count,
       |  CASE WHEN length(symbol) > 1 THEN 1 ELSE 0 END AS is_merged
       |FROM (SELECT n, unnest(string_split(seq, ' ')) AS symbol
       |      FROM s$bpeSteps) t
       |GROUP BY 1
       |${canonOrderSql(Seq("symbol", "n_count", "is_merged"))}""".stripMargin

  /** The BPE training loop as a shared CTE chain ending in the final
    * sequences `s<K>` and per-step winners `m1..mK` — single SQL source
    * of truth for [[bpeMergesSql]] and [[bpeVocabSql]].
    */
  // def, not val: bpeVocabSql is declared ABOVE this and a val would
  // still be null during its initializer (object init runs in order)
  private def bpeCtes: String = {
    def step(k: Int): String =
      s"""p$k AS (
         |  SELECT t[i.i-1] AS l, t[i.i] AS r, CAST(sum(n) AS BIGINT) AS cnt
         |  FROM (SELECT n, string_split(seq, ' ') AS t FROM s${k - 1}) x,
         |    unnest(generate_series(2, len(t))) AS i(i)
         |  GROUP BY 1, 2
         |), m$k AS (
         |  SELECT l, r, cnt FROM p$k ORDER BY cnt DESC, l ASC, r ASC LIMIT 1
         |), s$k AS (
         |  SELECT word, n,
         |    trim(replace(replace(' '||seq||' ',
         |      ' '||m.l||' '||m.r||' ', ' '||m.l||m.r||' '),
         |      ' '||m.l||' '||m.r||' ', ' '||m.l||m.r||' ')) AS seq
         |  FROM s${k - 1}, m$k m
         |)""".stripMargin
    s"""WITH words AS (
       |  SELECT tok AS word, count(*) AS n
       |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok
       |        FROM documents) t
       |  GROUP BY 1
       |), s0 AS (
       |  SELECT word, n, array_to_string(string_split(word, ''), ' ') AS seq
       |  FROM words
       |), ${(1 to bpeSteps).map(step).mkString(", ")}""".stripMargin
  }

  val bpeMergesSql: String =
    s"""$bpeCtes
       |${(1 to bpeSteps).map(k =>
           s"SELECT $k AS step, l, r, l||r AS merged, cnt FROM m$k")
           .mkString("\nUNION ALL ")}
       |${canonOrderSql(Seq("step", "l", "r", "merged", "cnt"))}""".stripMargin

  // ---------------------------------------------------------------------
  // split_balance — language-mix audit across the train/valid/test split
  // ---------------------------------------------------------------------

  /** Does the content-hash split skew the language mixture? For every
    * (split, lang) cell: document and token counts, the language's
    * token share WITHIN the split, its share in the full corpus, and the
    * skew ratio between the two — all in exact µ-units (the ratio of
    * ratios is one 128-bit multiply per side, single integer division
    * at the end, no float anywhere). skew_micro ≈ 1e6 means the split
    * preserved the corpus mixture; a cell far from 1e6 is the signal an
    * eval-integrity gate alarms on (a test split over-weighted in one
    * language silently reweights the benchmark). Companion to
    * split_leak_check: that audits content leakage, this audits
    * distributional drift.
    *
    * Scale: one (split, lang)-keyed aggregate over the corpus with
    * map-side partials; the share windows and the global total run over
    * the POST-aggregate relation (|splits|·|langs| rows — bounded), so
    * the unpartitioned window is over a handful of rows, never the
    * corpus.
    */
  def splitBalance(spark: SparkSession, sfDir: String): DataFrame = {
    val d = load(spark, sfDir, "documents")
    val toks = d.select(col("doc_id"), col("lang"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val s = splitRel(d).select(col("doc_id"), col("split"))
    val base = Caching.persistOnce(
      toks.join(s, Seq("doc_id")) // co-keyed on doc_id
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens")))
    // corpus total as a 1-row broadcast stamp (the house pattern) over
    // the persisted bounded aggregate — not an unpartitioned window
    // (same 15 rows, but window-over-no-partition trips the planner's
    // single-partition warning and reads as a scale smell it isn't)
    val tot = base.agg(sum(col("n_tokens")).as("corpus_tokens"))
    val out = base
      .withColumn("split_tokens",
        sum(col("n_tokens")).over(Window.partitionBy(col("split"))))
      .withColumn("lang_tokens",
        sum(col("n_tokens")).over(Window.partitionBy(col("lang"))))
      .crossJoin(broadcast(tot))
      .select(col("split"), col("lang"), col("n_docs"), col("n_tokens"),
        expr("cast((cast(n_tokens as decimal(38,0)) * 1000000) " +
          "div split_tokens as bigint)").as("split_share_micro"),
        expr("cast((cast(lang_tokens as decimal(38,0)) * 1000000) " +
          "div corpus_tokens as bigint)").as("corpus_share_micro"),
        expr("cast((cast(n_tokens as decimal(38,0)) * corpus_tokens " +
          "* 1000000) div (cast(split_tokens as decimal(38,0)) " +
          "* lang_tokens) as bigint)").as("skew_micro"))
    canon(out)
  }

  val splitBalanceSql: String =
    s"""WITH sp AS (
       |  SELECT doc_id,
       |    CASE WHEN b < 80 THEN 'train'
       |         WHEN b < 90 THEN 'valid'
       |         ELSE 'test' END AS split
       |  FROM (SELECT doc_id,
       |          ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 AS b
       |        FROM documents)
       |), t AS (
       |  SELECT d.doc_id, d.lang,
       |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents d
       |), base AS (
       |  SELECT split, lang, count(*) AS n_docs,
       |    CAST(sum(n_tokens) AS BIGINT) AS n_tokens
       |  FROM t JOIN sp USING (doc_id) GROUP BY 1, 2
       |), w AS (
       |  SELECT *,
       |    sum(n_tokens) OVER (PARTITION BY split) AS split_tokens,
       |    sum(n_tokens) OVER (PARTITION BY lang) AS lang_tokens,
       |    sum(n_tokens) OVER () AS corpus_tokens
       |  FROM base
       |)
       |SELECT split, lang, n_docs, n_tokens,
       |  CAST((CAST(n_tokens AS HUGEINT) * 1000000) // split_tokens
       |    AS BIGINT) AS split_share_micro,
       |  CAST((CAST(lang_tokens AS HUGEINT) * 1000000) // corpus_tokens
       |    AS BIGINT) AS corpus_share_micro,
       |  CAST((CAST(n_tokens AS HUGEINT) * corpus_tokens * 1000000)
       |    // (CAST(split_tokens AS HUGEINT) * lang_tokens)
       |    AS BIGINT) AS skew_micro
       |FROM w
       |${canonOrderSql(Seq("split", "lang", "n_docs", "n_tokens",
         "split_share_micro", "corpus_share_micro", "skew_micro"))}""".stripMargin

  // ---------------------------------------------------------------------
  // doc_chunk — context-window chunking with overlap
  // ---------------------------------------------------------------------

  /** Tokens per chunk / stride between chunk starts (overlap = 16). */
  private val chunkLen = 128
  private val chunkStride = 112

  /** Context-window chunking: split each document's token stream into
    * overlapping fixed-width windows — the step between a cleaned
    * corpus and sequence packing, where a doc longer than the model
    * context must become several training sequences whose boundaries
    * overlap (so no bigram at a cut point is lost to every sequence).
    * One row per (doc, chunk): its start offset, its token count
    * (= chunkLen except the tail), and the md5 of the space-joined
    * chunk text — the digest keeps the oracle row narrow while pinning
    * the exact chunk CONTENT, not just its geometry.
    *
    * Chunk rule: starts at 0, chunkStride, 2·chunkStride, … while
    * start < n_tokens — every token is covered, consecutive chunks
    * share chunkLen − chunkStride tokens, and a short tail chunk is
    * emitted rather than silently dropping the remainder.
    *
    * Scale: one Generate in the pipeline — rows multiply by
    * ceil(n_tokens / stride) with NO shuffle and no materialized
    * blowup (the explode streams through the projection into the
    * digest); output volume is corpus tokens / stride. The only
    * exchange is the canonical output sort.
    */
  def docChunk(spark: SparkSession, sfDir: String): DataFrame = {
    val d = load(spark, sfDir, "documents")
    val out = d.filter(col("text").isNotNull)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), size(col("t")).as("n_tokens"), expr(
        s"""explode(transform(
           |  sequence(0, (size(t) - 1) div $chunkStride),
           |  k -> struct(k AS chunk_idx,
           |              k * $chunkStride AS start_tok,
           |              md5(concat_ws(' ',
           |                slice(t, k * $chunkStride + 1, $chunkLen)))
           |                AS chunk_md5))) AS c""".stripMargin))
      .select(col("doc_id"),
        col("c.chunk_idx").cast("long").as("chunk_idx"),
        col("c.start_tok").cast("long").as("start_tok"),
        least(lit(chunkLen), col("n_tokens") - col("c.start_tok"))
          .cast("long").as("n_chunk_tokens"),
        col("c.chunk_md5"))
    canon(out)
  }

  val docChunkSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
       |  WHERE text IS NOT NULL
       |), ch AS (
       |  SELECT doc_id, len(t) AS n_tokens, k.k AS chunk_idx,
       |    k.k * $chunkStride AS start_tok,
       |    md5(array_to_string(
       |      t[k.k * $chunkStride + 1 : k.k * $chunkStride + $chunkLen], ' '))
       |      AS chunk_md5
       |  FROM toks, unnest(generate_series(0, (len(t) - 1) // $chunkStride))
       |    AS k(k))
       |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       |  CAST(start_tok AS BIGINT) AS start_tok,
       |  CAST(least($chunkLen, n_tokens - start_tok) AS BIGINT)
       |    AS n_chunk_tokens,
       |  chunk_md5
       |FROM ch
       |${canonOrderSql(Seq("doc_id", "chunk_idx", "start_tok",
         "n_chunk_tokens", "chunk_md5"))}""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "doc_chunk" -> docChunk,
    "bpe_merges" -> bpeMerges,
    "bpe_vocab" -> bpeVocab,
    "vocab_build" -> vocabBuild,
    "dataset_split" -> datasetSplit,
    "split_balance" -> splitBalance,
    "curriculum_bins" -> curriculumBins,
    "split_leak_check" -> splitLeakCheck,
    "tokenizer_apply" -> tokenizerApply)

  val oracles: Map[String, String] = Map(
    "doc_chunk" -> docChunkSql,
    "bpe_merges" -> bpeMergesSql,
    "bpe_vocab" -> bpeVocabSql,
    "vocab_build" -> vocabBuildSql,
    "dataset_split" -> datasetSplitSql,
    "split_balance" -> splitBalanceSql,
    "curriculum_bins" -> curriculumBinsSql,
    "split_leak_check" -> splitLeakCheckSql,
    "tokenizer_apply" -> tokenizerApplySql)
}
