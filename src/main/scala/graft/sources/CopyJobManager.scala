package graft.sources

import java.util.UUID
import java.util.concurrent.{ConcurrentHashMap, Executors}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S6: asynchronous, tracked, cancellable manifest copies.
  *
  * Reference: modules/ports/.../StoragePort.scala:57-69 — `copyFileAsync`
  * returns a job handle; `getCopyJobStatus` reports Running/Completed/
  * Failed/Cancelled with byte progress; `cancelCopyJob` aborts.
  *
  * Spark-first: the copy itself is the distributed exists-guarded
  * manifest copy (StorageOps.distributedCopyStats); "async" is a driver
  * thread that tags the Spark jobs with a job group, so cancellation maps
  * to `SparkContext.cancelJobGroup` — tasks are interrupted cluster-wide,
  * and because the copy is idempotent a cancelled job can simply be
  * resubmitted. Job state lives in a driver-side registry surfaced as a
  * DataFrame (`statusTable`) for SQL over job progress; at warehouse
  * scale the terminal states would additionally append to a `copy_jobs`
  * system table (the shape the `storage_copy_jobs` oracle query checks).
  */
object CopyJobManager {
  final case class CopyJobStatus(job_id: String, state: String, files_copied: Long,
                                 bytes_copied: Long, updated_at_ms: Long)
}

final class CopyJobManager(spark: SparkSession) {
  import CopyJobManager.CopyJobStatus

  private val jobs = new ConcurrentHashMap[String, CopyJobStatus]()
  private val pool = Executors.newCachedThreadPool(r => {
    val t = new Thread(r, "graft-copy-job"); t.setDaemon(true); t
  })

  /** Submit a manifest copy; returns immediately with the job id. */
  def submit(manifest: DataFrame): String = {
    val jobId = s"copy-${UUID.randomUUID()}"
    jobs.put(jobId, CopyJobStatus(jobId, "Running", 0L, 0L, System.currentTimeMillis()))
    pool.execute { () =>
      // job-group tag is thread-local: set it on the worker thread so only
      // this copy's Spark jobs are cancelled by cancel(jobId)
      spark.sparkContext.setJobGroup(jobId, s"graft copy job $jobId", interruptOnCancel = true)
      try {
        val (files, bytes) = StorageOps.distributedCopyStats(manifest)
        jobs.computeIfPresent(jobId, (_, st) =>
          if (st.state == "Cancelled") st
          else CopyJobStatus(jobId, "Completed", files, bytes, System.currentTimeMillis()))
      } catch {
        case e: Exception =>
          jobs.computeIfPresent(jobId, (_, st) =>
            if (st.state == "Cancelled") st
            else CopyJobStatus(jobId, "Failed", st.files_copied, st.bytes_copied,
                               System.currentTimeMillis()))
      } finally spark.sparkContext.clearJobGroup()
    }
    jobId
  }

  def status(jobId: String): Option[CopyJobStatus] = Option(jobs.get(jobId))

  /** Cancel a RUNNING job: interrupts the job group's tasks cluster-wide.
    * Terminal jobs are left untouched (returns false). The copy is
    * exists-guarded, so a cancelled job resumes by plain resubmission. */
  def cancel(jobId: String): Boolean =
    Option(jobs.get(jobId)).filter(_.state == "Running").exists { _ =>
      spark.sparkContext.cancelJobGroup(jobId)
      // transition atomically and ONLY from Running: the worker may reach
      // Completed between our read and this write, and a completed copy
      // must never be downgraded to Cancelled with stale progress
      val updated = jobs.computeIfPresent(jobId, (_, cur) =>
        if (cur.state == "Running")
          CopyJobStatus(jobId, "Cancelled", cur.files_copied, cur.bytes_copied,
                        System.currentTimeMillis())
        else cur)
      updated != null && updated.state == "Cancelled"
    }

  /** Registry as a DataFrame for SQL over job progress. */
  def statusTable: DataFrame = {
    import spark.implicits._
    jobs.values.asScala.toSeq.toDF()
  }

  /** Block until the job leaves Running (test/ops convenience). */
  def await(jobId: String, timeoutMs: Long = 60000): CopyJobStatus = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var st = jobs.get(jobId)
    while (st != null && st.state == "Running" && System.currentTimeMillis() < deadline) {
      Thread.sleep(25); st = jobs.get(jobId)
    }
    require(st != null, s"unknown copy job $jobId")
    st
  }
}
