package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.catalog.{GraftCatalog, GraftMaterializedView}
import graft.pipeline.Similarity

/** Streaming auto-refresh of DERIVED STATE (round-14): a
  * [[GraftTableSourceProvider]]-driven worker that follows a base
  * table's commits and refreshes the registered materialized views and
  * persisted IVF-PQ indexes after every micro-batch — the reference's
  * sync-worker model (a loop that watches a commit log and maintains
  * downstream replicas, SyncOrchestrator.scala:20) applied to derived
  * data instead of file replicas.
  *
  * The stream is only the COMMIT SIGNAL: the batch DataFrame is never
  * executed (no double read of the delta). Each refresh consumes the
  * catalog's own changefeed from the derived state's recorded
  * watermark and publishes state + watermark in ONE snapshot, so a
  * REPLAYED batch (crash between the refresh and the offset commit)
  * finds the watermark already at the head and no-ops — the same
  * idempotence discipline as [[CatalogStreamSink]]'s (queryTag,
  * batchId) guard, enforced here by the derived state itself rather
  * than the sink. Index maintenance goes through
  * [[Similarity.maintainIvfPqIndex]], so sustained quantization drift
  * triggers the one-shot re-train inside the same worker loop.
  *
  * 100 TB shape: per batch the worker pays O(delta) per MV (signed
  * changefeed merge) and O(batch) per index (assign + encode with the
  * frozen quantizers) — never a base rescan; the signal stream itself
  * reads nothing.
  */
object DerivedStateWorker {

  /** Start the worker over `baseNs.baseTable` in `warehouse`.
    * `mvs` are (namespace, viewName) pairs; `ivfPqIndexes` are
    * (namespace, prefix) pairs built by
    * [[Similarity.buildIvfPqIndexForTable]]. `trigger` defaults to
    * continuous micro-batches; pass `Trigger.AvailableNow()` for a
    * drain-and-stop maintenance run. */
  def start(spark: SparkSession, warehouse: String,
            baseNs: String, baseTable: String,
            mvs: Seq[(String, String)] = Seq.empty,
            ivfPqIndexes: Seq[(String, String)] = Seq.empty,
            checkpointDir: String,
            trigger: Trigger = Trigger.ProcessingTime(0L),
            driftBound: Double = 1.5): StreamingQuery = {
    require(mvs.nonEmpty || ivfPqIndexes.nonEmpty,
      "DerivedStateWorker needs at least one MV or index to maintain")
    val signal = spark.readStream
      .format("graft.streaming.GraftTableSourceProvider")
      .option("warehouse", warehouse)
      .option("table", s"$baseNs.$baseTable")
      // cdc mode: delete/replace/maintenance commits must tick the
      // signal, not kill the stream (the appends mode's loud contract)
      .option("mode", "cdc")
      .option("starting-seq", "latest")
      .load()
    signal.writeStream
      .queryName(s"graft-derived-$baseNs-$baseTable")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (_: DataFrame, batchId: Long) =>
        val cat = new GraftCatalog(spark, warehouse)
        // PER-TARGET isolation: one failing refresh (a benign CAS
        // conflict with a concurrent manual REFRESH, a dropped view)
        // must not terminate the stream and silently stop maintenance
        // of every OTHER target — the failure is logged loudly per
        // batch and the next window retries, which the watermark
        // idempotence makes safe. A conflict-aborted refresh in
        // particular is already applied or will be re-derived.
        def guarded(what: String)(body: => Unit): Unit =
          try body catch { case e: Exception =>
            System.err.println(s"[derived-worker] batch $batchId: " +
              s"refresh of $what failed (will retry next window): " +
              s"${e.getClass.getSimpleName}: ${e.getMessage}")
          }
        mvs.foreach { case (ns, name) =>
          guarded(s"mv $ns.$name") {
            GraftMaterializedView.refresh(spark, cat, ns, name,
              s"$ns.$name"): Unit
          }
        }
        ivfPqIndexes.foreach { case (ns, prefix) =>
          guarded(s"index $ns.$prefix") {
            Similarity.maintainIvfPqIndex(cat, ns, prefix, driftBound): Unit
          }
        }
      }
      .start()
  }
}
