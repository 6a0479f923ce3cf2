package graft.operators

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** G3: the GC execution state machine over an event-sourced
  * `gc_executions` log (doc iceberg-arch-geo-distributed-ha.md:798-819):
  *
  *   planned → deleting → {deleted, missing, error}
  *
  * Each transition APPENDS a row (execution_id, path, state,
  * updated_at_ms) — current state is the latest row per (execution, path),
  * with a state-precedence tiebreaker so a transition landing in the same
  * millisecond as its predecessor still resolves deterministically
  * (terminal beats in-flight beats planned).
  *
  * Idempotent re-runs: the work set excludes terminal states, so
  * re-executing a crashed round retries only `planned`/`deleting`/`error`
  * paths, and the physical delete itself is naturally idempotent (a
  * second attempt observes `missing`).
  *
  * Scale: state resolution is one ranked window partitioned by
  * (execution_id, path); the delete fan-out is mapPartitions with
  * executor-side FileSystem clients — no driver loop.
  */
object GcExecutor {

  /** Total order of states for same-timestamp ties: later pipeline stages
    * rank higher, terminal outcomes highest. */
  def stateRank(state: Column): Column =
    when(state === "planned", 0)
      .when(state === "deleting", 1)
      .when(state === "error", 2)
      .otherwise(3) // deleted / missing

  val Terminal: Seq[String] = Seq("deleted", "missing")

  /** Rows to append when an execution is planned. */
  def planRows(plan: DataFrame, executionId: String, nowMs: Long,
               pathCol: String = "path"): DataFrame =
    plan.select(
      lit(executionId).as("execution_id"),
      col(pathCol).as("path"),
      lit("planned").as("state"),
      lit(nowMs).as("updated_at_ms"))

  /** Latest state per (execution_id, path). Extra `tieBreak` columns rank
    * AFTER the timestamp and state precedence (e.g. a unique append id). */
  def currentState(log: DataFrame, tieBreak: Seq[Column] = Seq.empty): DataFrame = {
    val w = Window.partitionBy(col("execution_id"), col("path"))
      .orderBy((Seq(col("updated_at_ms").desc, stateRank(col("state")).desc)
                ++ tieBreak): _*)
    log.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** Non-terminal paths of one execution — the idempotent re-run work set. */
  def workSet(log: DataFrame, executionId: String): DataFrame =
    currentState(log.filter(col("execution_id") === executionId))
      .filter(!col("state").isin(Terminal: _*))
      .select("execution_id", "path")

  /** Distributed delete attempt: (path, state) outcomes with executor-side
    * FileSystem clients — deleted | missing | error. */
  def attemptDeletes(work: DataFrame, pathCol: String = "path"): DataFrame = {
    val spark = work.sparkSession
    import spark.implicits._
    val confSer = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    work.select(col(pathCol)).as[String].mapPartitions { paths =>
      val conf = confSer.value
      paths.map { p0 =>
        try {
          val p = new HPath(p0)
          val fs = p.getFileSystem(conf)
          if (!fs.exists(p)) (p0, "missing")
          else if (fs.delete(p, false)) (p0, "deleted")
          else (p0, "error")
        } catch { case _: Exception => (p0, "error") }
      }
    }.toDF(pathCol, "state")
  }

  /** One execution round: attempt every non-terminal path and return the
    * log rows to append (a `deleting` marker plus the outcome per path —
    * the caller appends them atomically with its log's commit primitive).
    *
    * The delete attempt is EAGERLY materialized exactly once
    * (localCheckpoint): attemptDeletes has physical side effects, so a
    * caller that evaluates the returned frame twice (count then write) or
    * a task retry must observe the first run's outcomes, not re-delete
    * and flip verdicts to 'missing'. */
  def executeRound(log: DataFrame, executionId: String, nowMs: Long): DataFrame = {
    // checkpoint the work set ONCE: marker and outcomes must derive from
    // the SAME materialized snapshot — re-running the window over a live
    // log for the marker could emit 'deleting' rows for paths the delete
    // pass never saw (and pays the shuffle twice)
    val work = workSet(log, executionId).localCheckpoint()
    val outcomes = attemptDeletes(work).localCheckpoint()
    val marker = work.select(
      col("execution_id"), col("path"),
      lit("deleting").as("state"), lit(nowMs).as("updated_at_ms"))
    marker.unionByName(outcomes.select(
      lit(executionId).as("execution_id"), col("path"), col("state"),
      lit(nowMs + 1).as("updated_at_ms")))
  }
}
