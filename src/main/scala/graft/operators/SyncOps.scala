package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sync-event query surface + progress/SLO derivations
  * (SURVEY Y2/Y4/Y5/Y8, E4/E5/E6, Y20).
  *
  * Reference semantics:
  *  - getPendingEvents (SyncPort.scala:42-45): status==Pending ∧ region.
  *  - getSyncEvents (InMemorySyncAdapter.scala:29-30): filter + sort by
  *    createdAt.
  *  - retryFailedEvent (:79-94): only Failed events reset to Pending.
  *  - SyncProgress ETA (SyncProgress.scala:25-39): avgTimePerEvent ×
  *    remaining.
  *  - backpressure tiers (iceberg-arch-hybrid-replica-dr.md:478-505):
  *    Green/Yellow/Orange/Red from lag thresholds.
  *
  * All are filters/aggregates that stay in whole-stage codegen; the
  * event log at scale is an append-only table partitioned by
  * (target_region, date(created_at)) so the per-region worker scans only
  * its partition.
  */
object SyncOps {

  def pendingEvents(events: DataFrame, region: String): DataFrame =
    events.filter(col("status") === "Pending" && col("target_region") === region)
      .orderBy(col("created_at"), col("event_id"))

  def failedEvents(events: DataFrame): DataFrame =
    events.filter(col("status") === "Failed")
      .orderBy(col("created_at"), col("event_id"))

  /** Y8: Failed → Pending transition (projection form; the stateful MERGE
    * lives in the streaming worker). */
  def retryCandidates(events: DataFrame): DataFrame =
    failedEvents(events).withColumn("status", lit("Pending"))

  /** E5: counts by (region, status). */
  def eventStats(events: DataFrame): DataFrame =
    events.groupBy(col("target_region"), col("status")).agg(count(lit(1)).as("cnt"))

  /** E4: per-region progress + ETA = avg(duration of completed) × remaining. */
  def progress(events: DataFrame): DataFrame =
    events.groupBy(col("target_region"))
      .agg(
        count(lit(1)).as("total"),
        sum(when(col("status") === "Completed", 1).otherwise(0)).as("completed"),
        sum(when(col("status") === "Failed", 1).otherwise(0)).as("failed"),
        avg(when(col("status") === "Completed", col("duration_ms"))).as("avg_ms"))
      .withColumn("remaining", col("total") - col("completed") - col("failed"))
      .withColumn("eta_ms", round(col("avg_ms") * col("remaining"), 2))

  /** Y20: backpressure tier from a lag signal (doc thresholds are config;
    * defaults here are the test thresholds). */
  def backpressureTier(lag: Column,
                       yellow: Double = 1e4, orange: Double = 5e4, red: Double = 2e5): Column =
    when(lag < yellow, "Green")
      .when(lag < orange, "Yellow")
      .when(lag < red, "Orange")
      .otherwise("Red")

  /** Scalar dual of [[backpressureTier]] for driver-side controllers. */
  def tierOf(lag: Double,
             yellow: Double = 1e4, orange: Double = 5e4, red: Double = 2e5): String =
    if (lag < yellow) "Green"
    else if (lag < orange) "Yellow"
    else if (lag < red) "Orange"
    else "Red"

  /** Y20 closed loop: per-trigger admission limit by tier (doc
    * iceberg-arch-hybrid-replica-dr.md:478-505). None = unthrottled; on a
    * file-source stream this value maps onto `maxFilesPerTrigger`, on the
    * event worker it caps how many pending events a trigger drains.
    * Red pauses ingestion entirely so the backlog drains. */
  def throttleLimit(tier: String, base: Int = 1000): Option[Int] = tier match {
    case "Green"  => None
    case "Yellow" => Some(base)
    case "Orange" => Some(math.max(1, base / 10))
    case _        => Some(0)
  }
}
