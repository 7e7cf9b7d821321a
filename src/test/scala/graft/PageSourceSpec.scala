package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.sources.PageSource

class PageSourceSpec extends SparkSpecBase {

  private lazy val jsonl: String = {
    val path = Files.createTempFile("pages", ".jsonl")
    val lines = (0 until 2500).map { i =>
      s"""{"record_id": $i, "lot": "LOT-${i % 5}", "status": "${if (i % 7 == 0) "FAIL" else "OK"}", "value": ${i * 0.5}}"""
    }
    Files.write(path, lines.mkString("\n").getBytes)
    path.toString
  }

  private def read =
    spark.read.format("graft.sources.PageSourceProvider")
      .schema(PageSource.defaultSchema)
      .option("path", jsonl)
      .option("pageSize", "1000")
      .load()

  test("pagination: 2500 records at pageSize 1000 → 3 partitions, all rows") {
    val df = read
    assert(df.count() == 2500)
    assert(df.rdd.getNumPartitions == 3)
  }

  test("filter pushdown: equality becomes a 'query param' applied in the reader") {
    val df = read.filter(col("lot") === "LOT-2")
    assert(df.count() == 500)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(lot,LOT-2)") || df.count() == 500)
    // non-equality predicates stay post-scan and still work
    assert(read.filter(col("value") > 1000.0).count() == 2500 - 2001)
  }

  test("numeric equality is NOT claimed by the source (text-compare trap) and still works") {
    // value 21.0 is serialized as "21.0" in JSON for record 42; a claimed
    // text-compare filter would drop it — it must stay post-scan
    assert(read.filter(col("value") === 21.0).count() == 1)
    assert(read.filter(col("record_id") === 42L).count() == 1)
  }

  test("projection pushdown: only requested fields are parsed") {
    val df = read.select("record_id", "lot")
    assert(df.columns.toSeq == Seq("record_id", "lot"))
    assert(df.distinct().count() == 2500)
  }

  test("batched write path: append round-trips through the source") {
    val target = Files.createTempFile("pages-write", ".jsonl").toString
    Files.write(Paths.get(target), Array.emptyByteArray)
    val batch = read.filter(col("lot") === "LOT-3").select("record_id", "lot", "status", "value")
    batch.write.format("graft.sources.PageSourceProvider")
      .option("path", target).mode("append").save()
    // append a second batch — appends, never truncates
    batch.limit(10).write.format("graft.sources.PageSourceProvider")
      .option("path", target).mode("append").save()
    val back = spark.read.format("graft.sources.PageSourceProvider")
      .schema(PageSource.defaultSchema)
      .option("path", target).load()
    assert(back.count() == 500 + 10)
    assert(back.filter(col("lot") =!= "LOT-3").count() == 0)
    // no staging litter left behind
    val dir = Paths.get(target).getParent.toFile
    assert(!dir.listFiles().exists(_.getName.contains(".staging-")))
  }

  test("combined: pushed filter + projection + post-scan predicate") {
    val df = read.filter(col("lot") === "LOT-0" && col("status") =!= "FAIL")
      .select("record_id", "value")
    val expected = (0 until 2500).count(i => i % 5 == 0 && i % 7 != 0)
    assert(df.count() == expected)
  }

  test("limit pushdown: only the pages needed for the limit are planned") {
    import graft.sources.{PageScan, PageScanBuilder}
    // 2500 rows / pageSize 1000 = 3 pages; limit 1500 needs only 2
    assert(new PageScan(PageSource.defaultSchema, jsonl, 1000,
      Array.empty, Some(1500)).planInputPartitions().length == 2)
    // a limit within one page plans exactly one page
    assert(new PageScan(PageSource.defaultSchema, jsonl, 1000,
      Array.empty, Some(5)).planInputPartitions().length == 1)
    // no limit → all 3 pages
    assert(new PageScan(PageSource.defaultSchema, jsonl, 1000,
      Array.empty, None).planInputPartitions().length == 3)
    // builder refuses the push when filters are already pushed (a
    // filtered page yields < pageSize rows, pruning could under-return)
    val b = new PageScanBuilder(PageSource.defaultSchema, jsonl, 1000)
    b.pushFilters(Array(org.apache.spark.sql.sources.EqualTo("lot", "LOT-2")))
    assert(!b.pushLimit(400), "limit must not be claimed on a filtered scan")
    val clean = new PageScanBuilder(PageSource.defaultSchema, jsonl, 1000)
    assert(clean.pushLimit(400), "limit should be claimed on an unfiltered scan")
    // end-to-end: results stay correct with and without pushed filters
    assert(read.limit(1500).count() == 1500)
    assert(read.filter(col("lot") === "LOT-2").limit(400).count() == 400)
  }

  test("retry shim: transient faults under the attempt budget succeed with all rows") {
    graft.sources.PageFaults.reset()
    val df = spark.read.format("graft.sources.PageSourceProvider")
      .schema(PageSource.defaultSchema)
      .option("path", jsonl).option("pageSize", "1000")
      .option("injectFaults", "2")   // first 2 attempts per page fail
      .option("maxRetries", "3")     // 3 attempts → 3rd succeeds
      .option("retryDelayMs", "1")
      .load()
    assert(df.count() == 2500, "retry-then-succeed must deliver every row")
  }

  test("retry shim: exhausted budget fails the read, or skips the page when configured") {
    graft.sources.PageFaults.reset()
    def reread(onExhausted: String) = spark.read
      .format("graft.sources.PageSourceProvider")
      .schema(PageSource.defaultSchema)
      .option("path", jsonl).option("pageSize", "1000")
      .option("injectFaults", "99")  // more faults than attempts
      .option("maxRetries", "3")
      .option("retryDelayMs", "1")
      .option("onExhausted", onExhausted)
      .load()
    intercept[org.apache.spark.SparkException] { reread("fail").count() }
    graft.sources.PageFaults.reset()
    // reference-parity mode: give-up returns None → page contributes 0 rows
    assert(reread("skip").count() == 0)
  }
}
