package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM, one session). */
object TestSession {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("local[4]", shufflePartitions = 4).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
  def sf: String = TestSession.sf

  /** Assert the query's EXECUTED plan carries a live
    * DynamicPruningExpression — not Spark's literal-true fallback,
    * which AQE substitutes when it declines to prune (e.g. when
    * broadcast reuse fails) and which a bare
    * `plan.contains("dynamicpruning")` check cannot distinguish.
    * Runs collect() on THIS DataFrame first: a noop-write executes a
    * cloned QueryExecution and leaves this df's AdaptiveSparkPlan
    * unfinalized, so asserting before an action only ever sees the
    * initial plan (where DPP is always live). Returns the finalized
    * executed-plan string for further shape assertions.
    */
  def assertLiveDpp(df: org.apache.spark.sql.DataFrame, label: String): String = {
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruningexpression("),
      s"$label: expected a DynamicPruningExpression on the partitioned scan; plan:\n${plan.take(4000)}")
    assert(!plan.toLowerCase.contains("dynamicpruningexpression(true)"),
      s"$label: DPP degraded to the literal-true fallback — planned but NOT pruning at runtime; plan:\n${plan.take(4000)}")
    plan
  }

  /** Post-execution partitions-read of every file scan in the
    * finalized plan that carries a dynamic pruning partition filter
    * (recursing through AQE roots, query stages, and subqueries).
    * Call after an action; compares against on-disk partition counts
    * to prove pruning skipped directories, not just planned to.
    */
  def dppScanPartitionsRead(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
    import org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression
    executedFileScans(df)
      .filter(_.partitionFilters.exists(
        _.exists(_.isInstanceOf[DynamicPruningExpression])))
      .map(_.metrics("numPartitions").value)
  }

  /** Every FileSourceScanExec in the finalized plan, recursing through
    * AQE roots, query stages, and subqueries. Call after an action so
    * stage plans and metrics are populated.
    */
  def executedFileScans(df: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def walk(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec        => walk(q.plan)
      case f: FileSourceScanExec    => Seq(f)
      case other =>
        other.children.flatMap(walk) ++ other.subqueries.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }
}
