package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming surface for the sync-event lifecycle
  * (SURVEY Y1/Y6/Y9/Y10 + §2.9 streaming categories).
  *
  * Reference semantics (InMemorySyncAdapter.scala:32-44, 79-94):
  * status transitions Pending→InProgress→{Completed,Failed}; retry resets
  * only Failed events back to Pending; unknown events are errors.
  *
  * Spark-first: the per-event state machine is `mapGroupsWithState`
  * keyed by event_id (exactly-once transitions within the query,
  * checkpoint-recoverable); per-region throughput metrics are a
  * watermarked tumbling-window aggregate, so late events beyond the
  * watermark are dropped deterministically. At production scale events
  * shard by event_id hash across executors — no driver state.
  */
object SyncEventStream {

  case class EventUpdate(eventId: Long, targetRegion: String, requested: String,
                         eventTime: Timestamp)
  case class EventState(status: String, transitions: Int)
  case class EventStatus(eventId: Long, targetRegion: String, status: String,
                         transitions: Int, valid: Boolean)

  /** Legal transitions of the reference's lifecycle. */
  private[streaming] def transition(current: String, requested: String): Option[String] =
    (current, requested) match {
      case ("Pending", "InProgress")    => Some("InProgress")
      case ("InProgress", "Completed")  => Some("Completed")
      case ("InProgress", "Failed")     => Some("Failed")
      case ("Failed", "Pending")        => Some("Pending")    // retry (Y8)
      case _                            => None               // illegal — rejected
    }

  /** Per-event state machine over a stream of requested transitions.
    * Emits the post-update status; illegal requests are flagged invalid
    * and leave state untouched (idempotent replays are no-ops). */
  /** State discipline: event ids grow without bound, so NoTimeout would
    * pin every finished event in the state store forever (checkpoint +
    * executor memory climb until the query dies). A Completed event's
    * state is only needed to reject late duplicates; it expires once the
    * event-time watermark passes its completion by `completedStateTtlMs`.
    * (Failed is NOT terminal — retry resets it to Pending — so it keeps
    * its state.) A duplicate arriving after expiry restarts the key at
    * Pending: the same at-least-once tradeoff the batch worker's retry
    * path makes. EventTimeTimeout, deliberately NOT ProcessingTimeTimeout:
    * processing-time timeouts force `shouldRunAnotherBatch` true on every
    * trigger (the engine can never quiesce — an idle query spins empty
    * batches and processAllAvailable never returns), and they are not
    * replay-deterministic; watermark-driven expiry is both.
    *
    * Output contract: when a Completed key's state expires, ONE final row
    * is emitted with status `"Expired"` (targetRegion empty, transitions
    * preserved) — distinguishable from every lifecycle status, so
    * downstream consumers never see a duplicate terminal `Completed` row.
    *
    * `latenessMs` bounds how far behind max event time an update may
    * arrive before the watermark drops it — a SEPARATE knob from
    * `completedStateTtlMs` (how long a Completed key keeps rejecting
    * late duplicates). Pass -1 (default) to reuse the TTL for both,
    * the historical behavior. */
  def lifecycle(updates: Dataset[EventUpdate],
                completedStateTtlMs: Long = 3600000L,
                latenessMs: Long = -1L)
               (implicit spark: SparkSession): Dataset[EventStatus] = {
    import spark.implicits._
    val lateness = if (latenessMs >= 0) latenessMs else completedStateTtlMs
    updates.withWatermark("eventTime", s"$lateness milliseconds")
      .groupByKey(_.eventId)
      .mapGroupsWithState[EventState, EventStatus](GroupStateTimeout.EventTimeTimeout) {
        (eventId, batch, state: GroupState[EventState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            // distinct terminal marker — NOT a re-emission of Completed
            EventStatus(eventId, "", "Expired", st.transitions, valid = true)
          } else {
            var st = state.getOption.getOrElse(EventState("Pending", 0))
            var region = ""
            var lastValid = true
            var maxTs = 0L
            batch.toSeq.sortBy(_.eventTime.getTime).foreach { u =>
              region = u.targetRegion
              maxTs = math.max(maxTs, u.eventTime.getTime)
              transition(st.status, u.requested) match {
                case Some(next) => st = EventState(next, st.transitions + 1); lastValid = true
                case None       => lastValid = false
              }
            }
            state.update(st)
            if (st.status == "Completed")
              state.setTimeoutTimestamp(
                math.max(maxTs + completedStateTtlMs, state.getCurrentWatermarkMs() + 1))
            EventStatus(eventId, region, st.status, st.transitions, lastValid)
          }
      }
  }

  /** [[lifecycle]] dual that emits the FULL TIMELINE: one row per
    * requested transition (applied or rejected), not just the final
    * state per trigger — `flatMapGroupsWithState` instead of
    * `mapGroupsWithState`, for audit-log sinks that need every hop of
    * Pending→InProgress→{Completed,Failed}→(retry)Pending. */
  def lifecycleTimeline(updates: Dataset[EventUpdate],
                        completedStateTtlMs: Long = 3600000L,
                        latenessMs: Long = -1L)
                       (implicit spark: SparkSession): Dataset[EventStatus] = {
    import spark.implicits._
    val lateness = if (latenessMs >= 0) latenessMs else completedStateTtlMs
    updates.withWatermark("eventTime", s"$lateness milliseconds")
      .groupByKey(_.eventId)
      .flatMapGroupsWithState[EventState, EventStatus](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (eventId, batch, state: GroupState[EventState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            // same eviction contract as [[lifecycle]]: the audit timeline
            // records the expiry hop too, so a key never just vanishes
            Iterator.single(EventStatus(eventId, "", "Expired", st.transitions, valid = true))
          } else {
            var st = state.getOption.getOrElse(EventState("Pending", 0))
            var maxTs = 0L
            val out = batch.toSeq.sortBy(_.eventTime.getTime).map { u =>
              maxTs = math.max(maxTs, u.eventTime.getTime)
              transition(st.status, u.requested) match {
                case Some(next) =>
                  st = EventState(next, st.transitions + 1)
                  EventStatus(eventId, u.targetRegion, next, st.transitions, valid = true)
                case None =>
                  EventStatus(eventId, u.targetRegion, st.status, st.transitions, valid = false)
              }
            }
            state.update(st)
            // same eviction contract as [[lifecycle]]
            if (st.status == "Completed")
              state.setTimeoutTimestamp(
                math.max(maxTs + completedStateTtlMs, state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  /** Watermarked tumbling-window per-region event counts (late data beyond
    * the watermark is dropped). */
  def regionThroughput(events: DataFrame, watermark: String = "10 minutes",
                       window_ : String = "1 minute"): DataFrame =
    events
      .withWatermark("eventTime", watermark)
      .groupBy(window(col("eventTime"), window_), col("targetRegion"))
      .agg(count(lit(1)).as("events"))
      .select(col("window.start").as("window_start"), col("targetRegion"), col("events"))

  /** Y9 worker loop as foreachBatch: process the batch's pending events
    * (the `process` callback does the copy work) and return the
    * completion updates — the batch-stream duality of the reference's
    * processPendingEvents. */
  def pendingWorker(events: DataFrame, process: DataFrame => DataFrame): DataFrame =
    process(events.filter(col("status") === "Pending"))

  /** Y20 CLOSED-LOOP worker: the tier computed from the batch's own
    * pending lag (sum of duration_ms) throttles how much of the batch is
    * admitted to `process` — Green drains everything, Yellow/Orange cap
    * the drain (oldest first), Red admits nothing so the copy plane can
    * catch up. The same limit maps to `maxFilesPerTrigger` when the
    * source is a file stream. Returns (tier, processed-result). */
  def throttledPendingWorker(events: DataFrame, process: DataFrame => DataFrame,
                             base: Int = 1000): (String, DataFrame) = {
    import graft.operators.SyncOps
    val pending = events.filter(col("status") === "Pending")
    val lag = pending.agg(coalesce(sum(col("duration_ms")), lit(0.0)))
      .collect().head.getDouble(0)
    val tier = SyncOps.tierOf(lag)
    val admitted = SyncOps.throttleLimit(tier, base) match {
      case Some(n) => pending.orderBy(col("created_at"), col("event_id")).limit(n)
      case None    => pending
    }
    (tier, process(admitted))
  }
}
