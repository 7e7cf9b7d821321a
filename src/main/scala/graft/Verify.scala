package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional trailing names: dump only those queries (dev loop);
    // oracle_sql.json is always complete
    val (sfDir, outDir) = (args(0), args(1))
    val onlyNames = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // conf parity with the bench session (round 16 — VERDICT r15 gap):
    // the oracle must verify the exact engine configuration the bench
    // measures (notably constraintPropagation=false), not the defaults.
    // Same env overrides as Bench; scan-split sizing stays off because
    // Verify reads the driver's original single-row-group layout.
    operators.BenchData.adaptiveConf.foreach { case (k, v) =>
      builder.config(k, v)
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => onlyNames.isEmpty || onlyNames(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // caller-owned cache lifecycle: the dedup/LSH pipelines persist
      // intermediate relations; without this, each of the 45+ queries
      // leaks another cached plan for the session lifetime
      spark.catalog.clearCache()
    }
    // Full JSON escape (all control chars) — a tab or CR in
    // builder-authored SQL would otherwise make the driver's json.load
    // fail and silently zero the round's correctness.
    def q(s: String): String = JsonUtil.quote(s)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
