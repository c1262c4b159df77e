package graft.tools

import org.apache.spark.sql.DataFrame

/** Shared physical-plan scan used by every audit surface ([[PlanAudit]]
  * over the contract queries, [[PipelineScaleProbe]] /
  * [[ScaleProbe]] over the synthetic-scale workloads): one definition
  * of "the join shapes that die at 100× scale", so a future addition
  * to the forbidden list lands everywhere at once. */
object PlanScan {
  /** Operators that turn into O(n·m) work or single-task collapse at
    * scale — any occurrence outside an audited-benign one-row cross
    * fails an audit. */
  val forbiddenOps: Seq[String] = Seq("BroadcastNestedLoopJoin", "CartesianProduct")

  def opCount(plan: String, op: String): Int = op.r.findAllIn(plan).length

  def badJoinCount(df: DataFrame): Int = {
    val plan = df.queryExecution.executedPlan.toString
    forbiddenOps.map(opCount(plan, _)).sum
  }
}
