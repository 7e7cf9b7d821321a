package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.LotSink

class LotSinkSpec extends SparkSpecBase {

  private def lots = {
    import spark.implicits._
    Seq(
      ("LOT-1", 1L, "a", 10.0),
      ("LOT-1", 2L, "b", 20.0),
      ("LOT-2", 3L, "c", 30.0),
      ("LOT-3", 4L, "d", 40.0)
    ).toDF("lot_number", "record_id", "label", "value")
  }

  test("S5: per-lot CSV layout — one directory per lot, header round-trip") {
    val dir = Files.createTempDirectory("lot-csv").toString
    LotSink.writeLotCsv(lots, dir)
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("lot_number=")).sorted
    assert(dirs.toSeq == Seq("lot_number=LOT-1", "lot_number=LOT-2", "lot_number=LOT-3"))
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.count() == 4)
  }

  test("T6: dynamic partition overwrite replaces only delivered lots") {
    val dir = Files.createTempDirectory("lot-replace").toString
    LotSink.replaceLots(lots, dir)
    import spark.implicits._
    // corrected re-delivery of LOT-1 only (one row now)
    val corrected = Seq(("LOT-1", 9L, "z", 99.0))
      .toDF("lot_number", "record_id", "label", "value")
    LotSink.replaceLots(corrected, dir)
    val state = spark.read.parquet(dir)
    assert(state.count() == 3) // 1 (new LOT-1) + 1 (LOT-2) + 1 (LOT-3)
    assert(state.filter(col("lot_number") === "LOT-1").count() == 1)
    assert(state.filter(col("record_id") === 9L).count() == 1)
    assert(state.filter(col("lot_number") === "LOT-2").count() == 1)
    // idempotence: same delivery again → same state
    LotSink.replaceLots(corrected, dir)
    assert(spark.read.parquet(dir).count() == 3)
  }

  test("S6: append-mode audit sink accumulates") {
    val dir = Files.createTempDirectory("audit").toString + "/log"
    import spark.implicits._
    val row = Seq(("f1.csv", "LOT-1", "success", 2L))
      .toDF("filename", "lot_number", "status", "record_count")
    LotSink.appendAudit(row, dir)
    LotSink.appendAudit(row, dir)
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("approx_distinct: HLL within 10% of exact, exact column independently verified") {
    val out = operators.Rollups.approxDistinct(spark, sf)
    // hll_ok is the in-query 10%-bound flag; any violation surfaces here
    // (and as an oracle hash mismatch in the driver gate)
    assert(out.filter(col("hll_ok") =!= 1).count() == 0)
    val exact = Tables.load(spark, sf, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("chk"))
    assert(out.join(exact, "event_type")
      .filter(col("exact_users") =!= col("chk")).count() == 0)
  }

  test("schema evolution: mergeSchema unifies drifting parquet batches; ensureColumns pads beyond") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-evolve").toString
    try {
      // batch 1 ships two columns; a later producer adds a third —
      // the classic upstream schema drift an ingest layer must absorb
      Seq((1L, "a1"), (2L, "a2")).toDF("id", "a")
        .write.mode("append").parquet(dir)
      Seq((3L, "a3", "b3")).toDF("id", "a", "b")
        .write.mode("append").parquet(dir)
      val merged = spark.read.option("mergeSchema", "true").parquet(dir)
      assert(merged.columns.sorted.toSeq == Seq("a", "b", "id"),
        s"mergeSchema lost a column: ${merged.columns.toSeq}")
      // pre-drift rows surface the new column as NULL, not an error
      assert(merged.filter(col("b").isNull).count() == 2)
      assert(merged.filter(col("b") === "b3").count() == 1)
      // the P2 padding contract then takes the unified schema the rest
      // of the way: a column no batch ever shipped arrives as ''
      val padded = Tables.ensureColumns(merged, Seq("id", "a", "b", "c"))
      assert(padded.columns.toSeq == Seq("id", "a", "b", "c"))
      assert(padded.filter(col("c") =!= "").count() == 0)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
