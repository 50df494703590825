package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Physical-plan traversal for plan-quality gates. `SparkPlan.collect`
  * stops at AQE wrapper nodes (AdaptiveSparkPlanExec and QueryStageExec
  * are leaf nodes holding their subplans in fields) and does NOT descend
  * into expression subqueries — which is exactly right for scan-counting
  * gates: a DPP subquery's copy of the probe subtree re-USES the main
  * plan's broadcast at runtime and must not count as a second scan. */
object PlanTestUtils {

  def fileScans(p: SparkPlan): Seq[FileSourceScanExec] = {
    val here = p match {
      case f: FileSourceScanExec => Seq(f)
      case _ => Nil
    }
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    here ++ kids.flatMap(fileScans)
  }

  /** Scans whose file location path contains `pathPart`. */
  def scansOf(p: SparkPlan, pathPart: String): Seq[FileSourceScanExec] =
    fileScans(p).filter(
      _.relation.location.rootPaths.exists(_.toString.contains(pathPart)))
}
