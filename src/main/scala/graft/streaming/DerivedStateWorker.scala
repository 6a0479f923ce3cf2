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

  /** Discover EVERY derived state the warehouse records and start one
    * worker per base table — no manual registration, the reference's
    * sync-orchestrator model (scan the control plane, maintain
    * everything downstream) applied to derived data:
    *  - incremental materialized views name their base in the
    *    `graft.mv.base` table property (full-mode MVs record no base —
    *    their definition may span several tables — and are skipped);
    *  - persisted IVF-PQ indexes name theirs in `graft.ann.base` on
    *    their `{prefix}_codes` table.
    * Checkpoints land under `checkpointRoot/<ns>.<table>`. Returns the
    * started queries (one per base table with derived state). */
  def startAll(spark: SparkSession, warehouse: String,
               checkpointRoot: String,
               trigger: Trigger = Trigger.ProcessingTime(0L),
               driftBound: Double = 1.5): Seq[StreamingQuery] = {
    val cat = new GraftCatalog(spark, warehouse)
    val root = java.nio.file.Paths.get(warehouse)
    val namespaces: Seq[String] =
      if (!java.nio.file.Files.isDirectory(root)) Seq.empty
      else {
        val s = java.nio.file.Files.list(root)
        try {
          val b = Seq.newBuilder[String]
          s.forEach { p =>
            val n = p.getFileName.toString
            if (java.nio.file.Files.isDirectory(p) &&
                !n.startsWith(".") && !n.startsWith("_")) b += n
          }
          b.result().sorted
        } finally s.close()
      }
    val mvsByBase = scala.collection.mutable.Map
      .empty[(String, String), Vector[(String, String)]]
    val idxByBase = scala.collection.mutable.Map
      .empty[(String, String), Vector[(String, String)]]
    for (ns <- namespaces; t <- cat.listTables(ns)) {
      val props = cat.tableProperties(ns, t)
      props.get(GraftMaterializedView.BaseProp)
        .filter(_ => props.contains(GraftMaterializedView.QueryProp))
        .foreach { b =>
          val Array(bns, bt) = b.split(" ")
          mvsByBase((bns, bt)) =
            mvsByBase.getOrElse((bns, bt), Vector.empty) :+ ((ns, t))
        }
      if (t.endsWith("_codes"))
        props.get(Similarity.AnnBaseProp).foreach { b =>
          val Array(bns, bt) = b.split(" ")
          idxByBase((bns, bt)) = idxByBase.getOrElse((bns, bt), Vector.empty) :+
            ((ns, t.stripSuffix("_codes")))
        }
    }
    (mvsByBase.keySet ++ idxByBase.keySet).toSeq.sorted.map { case (bns, bt) =>
      start(spark, warehouse, bns, bt,
        mvs = mvsByBase.getOrElse((bns, bt), Vector.empty),
        ivfPqIndexes = idxByBase.getOrElse((bns, bt), Vector.empty),
        checkpointDir = s"$checkpointRoot/$bns.$bt",
        trigger = trigger, driftBound = driftBound)
    }
  }

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
