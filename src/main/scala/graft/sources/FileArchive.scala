package graft.sources

import java.time.{Instant, ZoneOffset}
import java.time.format.DateTimeFormatter

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}

/** S12: processed-file archival (reference
  * mastercontrol_pipeline/data_load_system/utils/file_utils.py:19-45):
  *
  *  1. copy the file to `<root>/processed/<filename>`
  *  2. copy it to `<root>/archive/<processType>/<yyyy-MM-dd>/` with a
  *     `_yyyyMMdd_HHmmss` timestamp suffix before the extension
  *  3. for `incremental_load`, delete the original after both copies
  *     succeed (initial_load keeps it — same as the reference)
  *
  * Built on the Hadoop FileSystem API so the same code moves files on
  * local disk, HDFS, or an object store on a real cluster. The reference
  * stamps wall-clock local time; here the clock is injectable (UTC
  * rendering) so specs are deterministic.
  */
object FileArchive {

  private val dayFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd").withZone(ZoneOffset.UTC)
  private val tsFmt =
    DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss").withZone(ZoneOffset.UTC)

  /** Archive one file; returns the processed-copy path.
    * Re-running for a still-present original is idempotent at the
    * `processed/` path (overwrite) and adds/overwrites the archive copy
    * for the current timestamp.
    */
  def archiveFile(conf: Configuration, filePath: String, rootDir: String,
      processType: String = "initial_load",
      nowMs: () => Long = System.currentTimeMillis): Path = {
    require(processType == "initial_load" || processType == "incremental_load",
      s"unknown process type: $processType")
    val src = new Path(filePath)
    val fs = src.getFileSystem(conf)
    require(fs.exists(src), s"cannot archive missing file: $filePath")
    val now = Instant.ofEpochMilli(nowMs())
    val name = src.getName
    val (base, ext) = name.lastIndexOf('.') match {
      case -1 => (name, "")
      case i => (name.substring(0, i), name.substring(i))
    }

    val processedDir = new Path(rootDir, "processed")
    val archiveDir = new Path(new Path(new Path(rootDir, "archive"),
      processType), dayFmt.format(now))
    fs.mkdirs(processedDir)
    fs.mkdirs(archiveDir)

    val processed = new Path(processedDir, name)
    val archived = new Path(archiveDir, s"${base}_${tsFmt.format(now)}$ext")
    // copy (not rename): the original must survive both copies so a crash
    // between steps never loses the file; delete-on-incremental is last
    FileUtil.copy(fs, src, fs, processed, false, true, conf)
    FileUtil.copy(fs, src, fs, archived, false, true, conf)
    if (processType == "incremental_load") fs.delete(src, false)
    processed
  }

  /** Archive every data file under `dir` (non-recursive, skips hidden
    * files and Spark markers) — the per-batch loop shape of the
    * reference's bulk loader (processors/bulk_loader.py:53-54,85-86).
    */
  def archiveDir(conf: Configuration, dir: String, rootDir: String,
      processType: String,
      nowMs: () => Long = System.currentTimeMillis): Seq[Path] = {
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith(".") &&
        !s.getPath.getName.startsWith("_"))
      .map(s => archiveFile(conf, s.getPath.toString, rootDir, processType, nowMs))
  }
}
