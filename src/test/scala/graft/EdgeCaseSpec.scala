package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Goldens pinning the §7.4 watch-list semantics: null behavior in the
  * change-key (pandas NaN vs SQL NULL), 6-hour window edge assignment
  * (boundary and completeness-lag off-by-ones), and native-expression
  * parity with their SQL formulations on inputs the corpus never
  * produces (empty text, consecutive spaces, under-3-token docs).
  */
class EdgeCaseSpec extends SparkSpecBase {

  private val edgeDocs = Seq(
    (1L, ""),                       // empty → one empty token
    (2L, "one"),                    // single token, < 3 → whole-text shingle
    (3L, "two words"),              // 2 tokens, < 3 → whole-text shingle
    (4L, "exactly three tokens"),   // 3 tokens → one 3-gram
    (5L, "a  b c"),                 // consecutive spaces → empty token
    (6L, "a a a a"),                // repeated tokens → duplicate shingles
    (7L, "Mixed CASE Text here"))   // caller-side lower() path

  test("graft_simhash matches the explode+bit-vote SQL pipeline on edge inputs") {
    import spark.implicits._
    graft.plans.TextExprs.register(spark)
    val d = edgeDocs.toDF("doc_id", "text")
    val native = d.select(col("doc_id"),
      expr("graft_simhash(lower(text))").as("simhash"))
    // the original aggregate formulation, inline
    val toks = d.select(col("doc_id"),
      explode(split(lower(col("text")), " ")).as("tok"))
      .withColumn("h32",
        expr("CAST(conv(substring(md5(tok), 1, 8), 16, 10) AS BIGINT)"))
    val bitSums = (0 until 32).map(j =>
      sum(expr(s"(shiftright(h32, $j) & 1) * 2 - 1")).as(s"bit$j"))
    val sums = toks.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 32).map(j =>
      when(col(s"bit$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    val sqlWay = sums.select(col("doc_id"), sig.as("simhash"))
    assert(native.exceptAll(sqlWay).count() == 0 &&
      sqlWay.exceptAll(native).count() == 0,
      "native simhash diverges from the SQL pipeline on edge inputs")
  }

  test("graft_simhash60 matches the explode+bit-vote SQL pipeline on edge inputs") {
    import spark.implicits._
    graft.plans.TextExprs.register(spark)
    val d = edgeDocs.toDF("doc_id", "text")
    val native = d.select(col("doc_id"),
      expr("graft_simhash60(lower(text))").as("simhash"))
    // the aggregate formulation over the 15-hex-char (60-bit) hash —
    // pins the native kernel's byte→nibble extraction (bytes 0..6 plus
    // the HIGH nibble of byte 7) against conv(substr(md5,1,15),16,10)
    val toks = d.select(col("doc_id"),
      explode(split(lower(col("text")), " ")).as("tok"))
      .withColumn("h60",
        expr("CAST(conv(substring(md5(tok), 1, 15), 16, 10) AS BIGINT)"))
    val bitSums = (0 until 60).map(j =>
      sum(expr(s"(shiftright(h60, $j) & 1) * 2 - 1")).as(s"bit$j"))
    val sums = toks.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 60).map(j =>
      when(col(s"bit$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    val sqlWay = sums.select(col("doc_id"), sig.as("simhash"))
    assert(native.exceptAll(sqlWay).count() == 0 &&
      sqlWay.exceptAll(native).count() == 0,
      "native 60-bit simhash diverges from the SQL pipeline on edge inputs")
  }

  test("graft_minhash matches the explode+groupBy-min SQL pipeline on edge inputs") {
    import spark.implicits._
    graft.plans.TextExprs.register(spark)
    val d = edgeDocs.toDF("doc_id", "text")
    val native = d
      .select(col("doc_id"), expr("graft_minhash(lower(text))").as("m"))
      .select((col("doc_id") +:
        (0 until 8).map(k => col(s"m.s$k").as(s"s$k"))) :+
        col("m.n_sh").as("n_sh"): _*)
    // the original shingle+groupBy formulation, via the canonical
    // shingle definition
    val sh = d
      .withColumn("t", split(lower(col("text")), " "))
      .withColumn("sh", expr(operators.Dedup.shingleArrayExpr("lower(text)")))
      .select(col("doc_id"), explode(array_distinct(col("sh"))).as("shingle"))
      .withColumn("h0", md5(col("shingle")))
      .withColumn("h1", md5(concat(lit("x:"), col("shingle"))))
    val sigCols = (0 until 8).map { k =>
      val src = if (k < 4) "h0" else "h1"
      min(substring(col(src), (k % 4) * 8 + 1, 8)).as(s"s$k")
    } :+ count(lit(1)).as("n_sh")
    val sqlWay = sh.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
    assert(native.exceptAll(sqlWay).count() == 0 &&
      sqlWay.exceptAll(native).count() == 0,
      "native minhash diverges from the SQL pipeline on edge inputs")
  }

  test("graft_shingle_overlap matches the explode+join intersection on edge pairs") {
    import spark.implicits._
    graft.plans.TextExprs.register(spark)
    val d = edgeDocs.toDF("doc_id", "text")
    // all ordered pairs (including self-pairs: overlap = own shingle count)
    val pairs = d.select(col("doc_id").as("a_id"), lower(col("text")).as("la"))
      .crossJoin(d.select(col("doc_id").as("b_id"), lower(col("text")).as("lb")))
    val native = pairs.select(col("a_id"), col("b_id"),
      expr("graft_shingle_overlap(la, lb)").as("shared"))
    // the exploded-relation formulation the DuckDB oracle uses — pulled
    // from the canonical definition so this test tracks the source of
    // truth instead of a pasted copy
    val sh = d
      .withColumn("t", split(lower(col("text")), " "))
      .withColumn("sh", expr(operators.Dedup.shingleArrayExpr("lower(text)")))
      .select(col("doc_id"), explode(array_distinct(col("sh"))).as("shingle"))
    val sqlWay = sh.select(col("doc_id").as("a_id"), col("shingle"))
      .join(sh.select(col("doc_id").as("b_id"), col("shingle")), Seq("shingle"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("shared"))
    // sqlWay has no rows for zero-overlap pairs; native must report 0 there
    val joined = native.join(sqlWay.withColumnRenamed("shared", "sql_shared"),
      Seq("a_id", "b_id"), "left")
      .withColumn("sql_shared", coalesce(col("sql_shared"), lit(0L)))
    val diverging = joined.filter(col("shared") =!= col("sql_shared")).count()
    assert(diverging == 0,
      s"native shingle overlap diverges from the SQL join on $diverging pair(s)")
  }

  test("changeKey: concat_ws skips nulls — 'a'|null|'c' hashes like 'a'|'c'") {
    import spark.implicits._
    val df = Seq(("a", Option.empty[String], "c"), ("a", Some("c"), null))
      .toDF("x", "y", "z")
      .select(Fns.changeKey(col("x"), col("y"), col("z")).as("h"))
    val hs = df.collect().map(_.getString(0))
    // both rows reduce to "a|c" — the documented (and pinned) semantics
    assert(hs(0) == hs(1))
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("a|c".getBytes).map("%02x".format(_)).mkString
    assert(hs(0) == expected)
  }

  test("changeKey: all-null row hashes the empty string, not null") {
    import spark.implicits._
    val df = Seq((Option.empty[String], Option.empty[String]))
      .toDF("x", "y")
      .select(Fns.changeKey(col("x"), col("y")).as("h"))
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("".getBytes).map("%02x".format(_)).mkString
    assert(df.collect()(0).getString(0) == expected)
  }

  test("6h window assignment: exact boundary belongs to the NEXT window") {
    import spark.implicits._
    val rows = Seq(
      Timestamp.valueOf("2024-05-01 05:59:59"), // [00:00, 06:00)
      Timestamp.valueOf("2024-05-01 06:00:00"), // [06:00, 12:00) — boundary
      Timestamp.valueOf("2024-05-01 11:59:59")  // [06:00, 12:00)
    ).toDF("ts")
    val got = rows.select(window(col("ts"), "6 hours").as("w"))
      .select(col("w.start").cast("string").as("s")).collect().map(_.getString(0))
    assert(got(0) == "2024-05-01 00:00:00")
    assert(got(1) == "2024-05-01 06:00:00", "boundary event must open the next window")
    assert(got(2) == "2024-05-01 06:00:00")
  }

  test("completeness lag: window ending exactly 6h before max_ts IS included") {
    import spark.implicits._
    // max_ts = 18:00; window [06:00,12:00) ends at 12:00 == max_ts - 6h → included;
    // window [12:00,18:00) ends at 18:00 > max_ts - 6h → excluded
    val rows = Seq(
      (1L, Timestamp.valueOf("2024-05-01 07:00:00"), 1L, "click", 1.0),
      (2L, Timestamp.valueOf("2024-05-01 13:00:00"), 1L, "click", 1.0),
      (3L, Timestamp.valueOf("2024-05-01 18:00:00"), 1L, "click", 1.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val maxTs = rows.agg(max(col("ts")).as("max_ts"))
    val included = rows.crossJoin(broadcast(maxTs))
      .withColumn("w", window(col("ts"), "6 hours"))
      .filter(col("w.end") <= col("max_ts") - expr("INTERVAL 6 HOURS"))
      .select(col("w.start").cast("string")).collect().map(_.getString(0))
    assert(included.toSeq == Seq("2024-05-01 06:00:00"))
  }
}
