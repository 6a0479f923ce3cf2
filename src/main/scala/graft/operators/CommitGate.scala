package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Commit-gate aggregates (SURVEY W3/W4/W5/W7).
  *
  * Reference: legacy-java/.../InMemoryCommitGateAdapter.java —
  * isCommitApproved (:212-227) is "all regions approved ∧ no rejection";
  * getCommitStatus (CommitGatePort.scala:42-57) rolls up per-region
  * completed/failed/pending lists.
  *
  * Spark-first: quorum is `bool_and` (a codegen'd declarative aggregate
  * with map-side partial combine — no custom UDAF needed); the rollup is
  * conditional counts in one hash aggregate, not a pivot, so the shuffle
  * carries one row per commit.
  */
object CommitGate {

  /** W4 quorum: per commit, all regions approved ∧ at least one vote. */
  def quorum(approvals: DataFrame, commitCol: String = "commit_id",
             approvedCol: String = "approved"): DataFrame =
    approvals.groupBy(col(commitCol))
      .agg(bool_and(col(approvedCol)).as("approved"),
           count(lit(1)).as("votes"))

  /** W7 per-commit status rollup: counts per lifecycle state in one pass. */
  def statusRollup(events: DataFrame, commitCol: String = "commit_id",
                   statusCol: String = "status"): DataFrame =
    events.groupBy(col(commitCol))
      .agg(
        sum(when(col(statusCol) === "Completed", 1).otherwise(0)).as("completed"),
        sum(when(col(statusCol) === "Failed", 1).otherwise(0)).as("failed"),
        sum(when(col(statusCol) === "Pending", 1).otherwise(0)).as("pending"),
        sum(when(col(statusCol) === "InProgress", 1).otherwise(0)).as("in_progress"))

  /** W5 pending commits per region, deduped. */
  def pendingByRegion(events: DataFrame, region: String): DataFrame =
    events.filter(col("status") === "Pending" && col("target_region") === region)
      .select(col("commit_id")).distinct()
}
