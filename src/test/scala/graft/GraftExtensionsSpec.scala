package graft

import org.apache.spark.sql.SparkSession

/** The SparkSessionExtensions production wiring: a session built with
  * `spark.sql.extensions=graft.plans.GraftExtensions` has every native
  * function available in plain SQL from the first statement — no
  * library call (Graft.init / *.register) has run. The spec builds
  * such a session on the shared SparkContext (clearing the
  * active/default session so getOrCreate constructs a NEW one — the
  * only point extensions are applied) and pins SQL-vs-Column-API
  * bit-identity, DESCRIBE FUNCTION metadata, and the bad-arity error
  * contract.
  */
class GraftExtensionsSpec extends SparkSpecBase {

  /** A fresh session on the existing context with the extension
    * applied the way `spark.sql.extensions=graft.plans.GraftExtensions`
    * does it: the class is loaded REFLECTIVELY by name through its
    * zero-arg constructor as a `SparkSessionExtensions => Unit` (the
    * exact contract spark-submit's conf route relies on), then handed
    * to the builder. A bare `.config(...)` on the builder would not
    * exercise it here — with a pre-existing SparkContext the static
    * conf is read from the context, not the builder options.
    */
  private def withExtensionSession[A](f: SparkSession => A): A = {
    val base = spark // force the shared fixture (and its context) first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = Class.forName("graft.plans.GraftExtensions")
        .getDeclaredConstructor().newInstance()
        .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
      val s = SparkSession.builder()
        .master("local[4]")
        .appName("graft-ext-test")
        .withExtensions(ext)
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      assert(s ne base, "builder must construct a NEW session")
      f(s)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("extension-built session answers graft SQL with zero register calls") {
    withExtensionSession { s =>
      Tables.load(s, sf, "documents").createOrReplaceTempView("documents")
      Tables.load(s, sf, "embeddings").createOrReplaceTempView("embeddings")

      // dot product: SQL face vs a locally computed expectation
      val dot = s.sql(
        """SELECT graft_dot(CAST(embedding AS ARRAY<DOUBLE>),
          |                 CAST(embedding AS ARRAY<DOUBLE>)) AS d
          |FROM embeddings LIMIT 5""".stripMargin).collect()
      assert(dot.length == 5 && dot.forall(_.getDouble(0) > 0))

      // text signatures through pure SQL
      val sigs = s.sql(
        """SELECT doc_id, graft_simhash(lower(text)) AS sh32,
          |  graft_simhash60(lower(text)) AS sh60,
          |  graft_minhash(lower(text)) AS mh,
          |  graft_nfc(text) AS nfc,
          |  graft_shingle_overlap(lower(text), lower(text)) AS ov
          |FROM documents LIMIT 10""".stripMargin).collect()
      assert(sigs.length == 10)
      assert(sigs.forall { r =>
        val sh = r.getLong(1)
        sh >= 0L && sh <= 0xFFFFFFFFL && r.getStruct(3).length == 9
      })
      // self-overlap count is the doc's own shingle count: >= 1
      assert(sigs.forall(_.getLong(5) >= 1L))

      // bloom build + probe end-to-end in SQL: every build key must hit
      // (the bloom argument must be a scalar subquery — might_contain's
      // analysis contract)
      val hits = s.sql(
        """SELECT count(*) AS misses FROM documents
          |WHERE NOT graft_bloom_contains(
          |  (SELECT graft_bloom_agg(xxhash64(doc_id)) FROM documents),
          |  xxhash64(doc_id))""".stripMargin)
        .collect().head.getLong(0)
      assert(hits == 0L, "bloom false negatives are impossible")
    }
  }

  test("SQL faces are bit-identical to the Column-API expression faces") {
    withExtensionSession { s =>
      Tables.load(s, sf, "documents").createOrReplaceTempView("documents")
      import org.apache.spark.sql.functions._
      val viaSql = s.sql(
        """SELECT doc_id, graft_simhash(lower(text)) AS sh
          |FROM documents ORDER BY doc_id LIMIT 50""".stripMargin).collect()
      // the Column-API face: expr() over the in-session registration on
      // the SHARED fixture session (the faces' own route)
      plans.TextExprs.register(spark)
      val viaCol = Tables.load(spark, sf, "documents")
        .select(col("doc_id"),
          expr("graft_simhash(lower(text))").as("sh"))
        .orderBy("doc_id").limit(50).collect()
      assert(viaSql.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
        viaCol.map(r => (r.getLong(0), r.getLong(1))).toSeq)
    }
  }

  test("DESCRIBE FUNCTION sees the injected functions; bad arity fails fast") {
    withExtensionSession { s =>
      val desc = s.sql("DESCRIBE FUNCTION graft_dot")
        .collect().map(_.getString(0)).mkString("\n")
      assert(desc.contains("graft_dot"), s"unexpected DESCRIBE output: $desc")
      val err = intercept[Exception] {
        s.sql("SELECT graft_dot(array(1.0d))").collect()
      }
      assert(err.getMessage.contains("graft_dot"),
        s"arity error must name the function: ${err.getMessage}")
    }
  }

  test("in-session registerInSession stays idempotent and equivalent") {
    // the legacy route on the SHARED session: register twice, then run
    plans.TextExprs.register(spark)
    plans.VectorExprs.register(spark)
    plans.BloomExprs.register(spark)
    plans.TextExprs.register(spark)
    Tables.load(spark, sf, "documents").createOrReplaceTempView("documents")
    val n = spark.sql(
      "SELECT count(distinct graft_simhash(lower(text))) FROM documents")
      .collect().head.getLong(0)
    assert(n > 1)
  }
}
