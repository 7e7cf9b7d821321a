package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.operators.LoadOps
import graft.functions.Fns

class LoadOpsSpec extends SparkSpecBase {

  test("replace is idempotent: replace(replace(s,b),b) == replace(s,b)") {
    val e = Tables.load(spark, sf, "events")
      .select("event_id", "user_id", "event_type", "value")
    val batch = LoadOps.correctedClickBatch(e)
    val once = LoadOps.applyReplace(e, batch)
    val twice = LoadOps.applyReplace(once, batch)
    assert(once.count() == twice.count())
    assert(once.exceptAll(twice).count() == 0)
    assert(twice.exceptAll(once).count() == 0)
  }

  test("upsert preserves dim row count (update-else-keep, never dup)") {
    val df = LoadOps.dimUpsert(spark, sf)
    val total = Tables.load(spark, sf, "customer").count()
    assert(df.count() == total)
    assert(df.groupBy("custkey").count().filter(col("count") > 1).count() == 0)
  }

  test("lot_fallback: primary wins over fallback; fallback fills primary gaps; both-empty flags Fail with the reference message") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-lotfb").toString
    try {
      // events store raw NANOSECOND longs (Tables.eventsRawSchema)
      val t0 = java.sql.Timestamp.valueOf("2024-05-01 12:00:00")
        .getTime * 1000000L
      // user 1: qualifying purchase AND view -> primary must win
      // user 2: qualifying view only        -> fallback
      // user 3: only sub-floor / other events -> both empty -> Fail
      Seq(
        (1L, 1L, t0, "purchase", 99.0), (2L, 1L, t0, "view", 99.0),
        (3L, 2L, t0, "view", 99.0),
        (4L, 3L, t0, "click", 99.0), (5L, 3L, t0, "purchase", 10.0))
        .toDF("event_id", "user_id", "ts", "event_type", "value")
        .write.parquet(s"$dir/events.parquet")
      val r = graft.operators.LotPipeline.lotFallback(spark, dir).collect()
        .map(x => x.getString(0) -> (x.getString(1), x.getString(2),
          x.getString(5), x.getString(6))).toMap
      assert(r("LOT-1") == (("primary", "BR-1", "Success", "")),
        s"primary metadata must win when both exist: ${r("LOT-1")}")
      assert(r("LOT-2") == (("fallback", "TPL-2", "Success", "")),
        s"fallback must fill a primary gap: ${r("LOT-2")}")
      assert(r("LOT-3") == (("none", "", "Fail",
        "Both api_1 calls returned empty")),
        s"both-empty lot must flag Fail with the reference message: ${r("LOT-3")}")
      assert(r.size == 3, s"one status row per lot, got ${r.size}")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("lot_updates_report: only lots updated within 7 days of the anchor; first_loaded spans full history; dormant lots excluded") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-lotupd").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    try {
      // c1: anchors the window (latest update overall), first order 1995
      // c2: updated 3 days before the anchor -> included
      // c3: updated 10 days before the anchor -> outside the 7-day window
      // c4: only pre-2000 orders -> dormant, never enters the report
      Seq(
        (1L, ts("1995-06-01")), (1L, ts("2001-08-10")),
        (2L, ts("2001-08-07")),
        (3L, ts("2001-07-31")),
        (4L, ts("1999-05-05")))
        .toDF("o_custkey", "o_orderdate")
        .write.parquet(s"$dir/orders.parquet")
      Seq((1L, "Cust1"), (2L, "Cust2"), (3L, "Cust3"), (4L, "Cust4"))
        .toDF("c_custkey", "c_name")
        .write.parquet(s"$dir/customer.parquet")
      val r = LoadOps.lotUpdatesReport(spark, dir).collect()
        .map(x => x.getString(0) -> (x.getString(3), x.getString(4))).toMap
      assert(r.keySet == Set("LOT-1", "LOT-2"),
        s"7-day window wrong: ${r.keySet} (LOT-3 is 10 days stale, LOT-4 dormant)")
      assert(r("LOT-1") == (("1995-06-01", "2001-08-10")),
        s"first_loaded must span full history: ${r("LOT-1")}")
      assert(r("LOT-2") == (("2001-08-07", "2001-08-07")), s"${r("LOT-2")}")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("data_hash is stable and 32-hex") {
    val df = LoadOps.dataHash(spark, sf)
    assert(df.filter(!col("data_hash").rlike("^[0-9a-f]{32}$")).count() == 0)
  }

  test("reformatEastern handles both sides of a DST switch, unpadded") {
    import spark.implicits._
    // US DST 2024: EST→EDT at 2024-03-10 07:00 UTC
    val df = Seq(
      "2024-03-10 06:59:00", // EST: UTC-5 → 3/10/2024 1:59
      "2024-03-10 07:01:00", // EDT: UTC-4 → 3/10/2024 3:01
      "2024-07-04 13:05:00", // EDT → 7/4/2024 9:05
      "2024-12-25 01:07:00"  // EST → 12/24/2024 20:07
    ).toDF("s").select(Fns.reformatEastern(col("s").cast("timestamp")).as("f"))
    val got = df.collect().map(_.getString(0)).toSeq
    assert(got == Seq("3/10/2024 1:59", "3/10/2024 3:01",
      "7/4/2024 9:05", "12/24/2024 20:07"))
  }

  test("sentinel + label concat mirror reference semantics") {
    import spark.implicits._
    val df = Seq(("lbl", Some(3)), ("lbl", None), ("0", Some(5)))
      .toDF("label", "iter")
      .select(Fns.labelWithIteration(col("label"),
        Fns.sentinelInt(col("iter"))).as("out"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("lbl - 3", "lbl", "0"))
  }

  test("cdc_apply: trailing deletes remove the key; survivors match an independent last-op recompute") {
    val df = LoadOps.cdcApply(spark, sf).cache()
    try {
      // independent formulation: max(struct(tus, event_id, op)) per user
      val last = Tables.load(spark, sf, "events")
        .filter(col("event_type").isin("view", "purchase", "error"))
        .select(col("user_id"), expr("unix_micros(ts)").as("tus"),
          col("event_id"),
          when(col("event_type") === "error", "delete")
            .otherwise("upsert").as("op"))
        .groupBy("user_id")
        .agg(max(struct(col("tus"), col("event_id"), col("op"))).as("m"),
          count(lit(1)).as("n"))
      val survivors = last.filter(col("m.op") === "upsert")
      assert(df.count() == survivors.count(),
        "survivor set disagrees with the max-struct recompute")
      val mismatch = df.join(survivors, Seq("user_id"))
        .filter(col("updated_tus") =!= col("m.tus") ||
          col("n_ops") =!= col("n")).count()
      assert(mismatch == 0, "last-op timestamp or op count disagrees")
      val deleted = last.filter(col("m.op") === "delete")
        .join(df, Seq("user_id")).count()
      assert(deleted == 0, "a tombstoned key survived")
    } finally df.unpersist()
  }

  test("expectations_report: clean fixture passes all rules; a dirty corpus counts each violation exactly") {
    val clean = operators.QualityOps.expectationsReport(spark, sf)
    assert(clean.count() == 8)
    assert(clean.filter(col("passed") =!= 1).count() == 0,
      "the clean fixture tripped an expectation")

    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dq").toString
    try {
      // lineitem: one NULL qty, one out-of-range qty, one bad flag,
      // one non-positive price, one orphan order key (42 not in orders)
      Seq(
        (1L, Some(5.0), "A", 10.0),
        (1L, None, "N", 10.0),
        (2L, Some(999.0), "R", 10.0),
        (2L, Some(5.0), "X", 10.0),
        (42L, Some(5.0), "A", -1.0))
        .toDF("l_orderkey", "l_quantity", "l_returnflag", "l_extendedprice")
        .write.parquet(s"$dir/lineitem.parquet")
      // orders: duplicated key 1, a bad status, a non-positive total
      Seq((1L, "F", 10.0), (1L, "F", 10.0), (2L, "Z", 0.0))
        .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
        .write.parquet(s"$dir/orders.parquet")
      val r = operators.QualityOps.expectationsReport(spark, dir).collect()
        .map(x => x.getString(0) -> x.getLong(1)).toMap
      assert(r == Map(
        "lineitem.quantity_not_null" -> 1L,
        "lineitem.quantity_range" -> 1L,
        "lineitem.returnflag_accepted" -> 1L,
        "lineitem.price_positive" -> 1L,
        "lineitem.orderkey_in_orders" -> 1L,
        "orders.totalprice_positive" -> 1L,
        "orders.status_accepted" -> 1L,
        "orders.orderkey_unique" -> 1L), s"violation counts wrong: $r")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("compactParquet: many small files collapse to the byte-target count; content identical") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val data = s"$dir/data"
    try {
      // simulate an accreted streaming sink: 40 one-row appends
      for (i <- 1 to 40)
        Seq((i.toLong, s"payload-$i", i * 1.5))
          .toDF("id", "name", "v").coalesce(1)
          .write.mode("append").parquet(data)
      val beforeDf = spark.read.parquet(data)
      val beforeHash = beforeDf.orderBy("id").collect().toSeq

      // a generous byte target collapses everything to one file
      val (nBefore, nAfter) =
        graft.operators.LoadOps.compactParquet(spark, data, 64L * 1024 * 1024)
      assert(nBefore == 40, s"expected 40 part files before, got $nBefore")
      assert(nAfter == 1, s"expected 1 part file after, got $nAfter")

      val afterDf = spark.read.parquet(data)
      assert(afterDf.count() == 40)
      assert(afterDf.orderBy("id").collect().toSeq == beforeHash,
        "compaction changed content")
      // no staging residue
      assert(!new java.io.File(data + "_compact_staging").exists(),
        "staging directory left behind")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
