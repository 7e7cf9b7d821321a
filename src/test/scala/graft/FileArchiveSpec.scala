package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.sources.FileArchive
import graft.streaming.IncrementalPipeline

/** S12 archive/move semantics (reference file_utils.py:19-45):
  * processed/ copy, dated+timestamped archive copy, delete-on-incremental,
  * re-run idempotence — plus the streaming foreachBatch integration.
  */
class FileArchiveSpec extends SparkSpecBase {

  private def hconf = spark.sparkContext.hadoopConfiguration

  // fixed clock → deterministic archive names: 2024-05-01 12:30:45 UTC
  private val fixedMs = () => 1714566645000L

  private def mkFile(dir: String, name: String, body: String = "x"): String = {
    val p = Paths.get(dir, name)
    Files.write(p, body.getBytes("UTF-8"))
    p.toString
  }

  test("initial_load: processed + dated archive copies, original kept") {
    val root = Files.createTempDirectory("graft-arch").toString
    val in = Files.createTempDirectory("graft-arch-in").toString
    val f = mkFile(in, "lots.csv", "a,b\n1,2\n")

    val processed = FileArchive.archiveFile(hconf, f, root, "initial_load", fixedMs)

    assert(Files.exists(Paths.get(f)), "original must be kept for initial_load")
    assert(processed.toString.endsWith("processed/lots.csv"))
    assert(Files.exists(Paths.get(root, "processed", "lots.csv")))
    assert(Files.exists(Paths.get(root, "archive", "initial_load",
      "2024-05-01", "lots_20240501_123045.csv")))
    // same content in both copies
    assert(new String(Files.readAllBytes(
      Paths.get(root, "processed", "lots.csv")), "UTF-8") == "a,b\n1,2\n")
  }

  test("incremental_load: original deleted after both copies succeed") {
    val root = Files.createTempDirectory("graft-arch").toString
    val in = Files.createTempDirectory("graft-arch-in").toString
    val f = mkFile(in, "delta.csv")

    FileArchive.archiveFile(hconf, f, root, "incremental_load", fixedMs)

    assert(!Files.exists(Paths.get(f)), "incremental_load must delete the original")
    assert(Files.exists(Paths.get(root, "processed", "delta.csv")))
    assert(Files.exists(Paths.get(root, "archive", "incremental_load",
      "2024-05-01", "delta_20240501_123045.csv")))
  }

  test("re-run is idempotent for initial_load; unknown type / missing file rejected") {
    val root = Files.createTempDirectory("graft-arch").toString
    val in = Files.createTempDirectory("graft-arch-in").toString
    val f = mkFile(in, "lots.csv")

    FileArchive.archiveFile(hconf, f, root, "initial_load", fixedMs)
    FileArchive.archiveFile(hconf, f, root, "initial_load", fixedMs) // no throw
    assert(Files.exists(Paths.get(root, "processed", "lots.csv")))

    intercept[IllegalArgumentException] {
      FileArchive.archiveFile(hconf, f, root, "bogus_type", fixedMs)
    }
    intercept[IllegalArgumentException] {
      FileArchive.archiveFile(hconf, s"$in/nope.csv", root, "initial_load", fixedMs)
    }
  }

  test("archiveDir archives every data file, skipping hidden/marker files") {
    val root = Files.createTempDirectory("graft-arch").toString
    val in = Files.createTempDirectory("graft-arch-in").toString
    mkFile(in, "a.csv"); mkFile(in, "b.csv")
    mkFile(in, "_SUCCESS"); mkFile(in, ".hidden")

    val out = FileArchive.archiveDir(hconf, in, root, "incremental_load", fixedMs)

    assert(out.map(_.getName).sorted == Seq("a.csv", "b.csv"))
    assert(!Files.exists(Paths.get(in, "a.csv")) && !Files.exists(Paths.get(in, "b.csv")))
    assert(Files.exists(Paths.get(in, "_SUCCESS")), "marker files must be left alone")
  }

  test("streaming load pass archives exactly the consumed source files") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-arch").toString
    val srcRoot = Files.createTempDirectory("graft-arch-stream").toString
    val src = s"$srcRoot/src"; val out = s"$srcRoot/out"; val ckp = s"$srcRoot/ckp"
    Files.createDirectories(Paths.get(src))

    Seq((1L, Timestamp.valueOf("2024-05-01 01:00:00"), 7L, "click", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(src)

    val archived = IncrementalPipeline.runWithArchive(
      spark, src, out, ckp, root, "incremental_load", fixedMs)

    assert(archived.nonEmpty, "consumed parquet files must be archived")
    val fs = new Path(root).getFileSystem(hconf)
    val processed = fs.listStatus(new Path(root, "processed"))
      .map(_.getPath.getName).filter(_.endsWith(".parquet"))
    assert(processed.nonEmpty, "consumed parquet files must land in processed/")
    // incremental_load deletes consumed originals from the source dir
    val remaining = Files.list(Paths.get(src)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet"))
    assert(remaining.isEmpty, s"originals not deleted: ${remaining.mkString(",")}")
    // the sink output still materialized (load happened before archive)
    assert(spark.read.parquet(out).count() == 1)
  }
}
