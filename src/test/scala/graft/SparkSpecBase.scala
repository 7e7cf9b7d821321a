package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs — one JVM-wide session (getOrCreate)
  * so suites don't pay repeated startup.
  */
trait SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpecBase.session
  val sf: String = "/root/testdata/sf0.001"

  /** Cache hygiene between tests (round 16): the session — and its
    * CacheManager — is JVM-wide, and a query face's persisted relations
    * outlive the test that made them. A later suite's state WRITE then
    * makes Spark try to rebuild those stale entries
    * (CacheManager.recacheByPath), which flaked the round-15 driver run
    * with an NPE inside tryRebuildCacheEntry (VERIFY_r15 test_tail).
    * Clearing after every test bounds every entry's lifetime to its
    * test, so no write can ever meet another suite's leftovers.
    */
  override def withFixture(test: NoArgTest): org.scalatest.Outcome =
    try super.withFixture(test)
    finally spark.catalog.clearCache()

  /** Summed `numOutputRows` of every file scan in `plan` whose path
    * contains `dirToken` — the scan-volume probe shared by the
    * plan-metrics specs (PqLegSpec introduced it; factored here in
    * round 12).
    */
  protected def scanRowsOf(plan: org.apache.spark.sql.execution.SparkPlan,
      dirToken: String): Long =
    scanRowsInto(plan, dirToken, newPlanSeen())

  // identity-dedup: cached relations and reused exchanges surface the
  // SAME physical scan node from several parents (and, under
  // scanRowsDuring, from several executions' plans) — its metric is
  // cumulative and must count once per probe
  private def newPlanSeen(): java.util.Set[
      org.apache.spark.sql.execution.SparkPlan] =
    java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[
        org.apache.spark.sql.execution.SparkPlan, java.lang.Boolean]())

  private def scanRowsInto(
      plan: org.apache.spark.sql.execution.SparkPlan,
      dirToken: String,
      seen: java.util.Set[org.apache.spark.sql.execution.SparkPlan])
      : Long = {
    var n = 0L
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
      val q = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case x => x
      }
      if (!seen.add(q)) return
      q match {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.relation.location.rootPaths
              .exists(_.toString.contains(dirToken)) =>
          n += f.metrics("numOutputRows").value
        // AQE materializes sub-plans behind QueryStageExec whose
        // children list is EMPTY — the subtree hangs off .plan
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(s.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          walk(r.child)
        // a persisted relation hides its build plan behind the
        // columnar scan — the actual file scan lives in cachedPlan
        case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          walk(m.relation.cachedPlan)
        case _ =>
      }
      q.children.foreach(walk)
      q.subqueries.foreach(walk)
    }
    walk(plan)
    n
  }

  /** Collect a result and the matching scans' summed rows of ITS OWN
    * executed plan — enough when the probed scan runs in the final
    * action (cached relations hide earlier executions' scans: use
    * [[scanRowsDuring]] for those).
    */
  protected def collectWithScanRows(
      df: org.apache.spark.sql.DataFrame,
      dirToken: String): (Seq[org.apache.spark.sql.Row], Long) = {
    val rows = df.collect().toSeq
    (rows, scanRowsOf(df.queryExecution.executedPlan, dirToken))
  }

  /** Run `f` and sum the matching scans' rows over EVERY DataFrame
    * action it triggers (a QueryExecutionListener sees eager probes
    * and cache materializations the final plan hides).
    */
  protected def scanRowsDuring[T](dirToken: String)(f: => T): (T, Long) = {
    val total = new java.util.concurrent.atomic.AtomicLong
    val seen = newPlanSeen()
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = seen.synchronized {
        total.addAndGet(scanRowsInto(qe.executedPlan, dirToken, seen))
        ()
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      val r = f
      Thread.sleep(800) // the listener bus is asynchronous
      (r, total.get)
    } finally spark.listenerManager.unregister(l)
  }
}

object SparkSpecBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
