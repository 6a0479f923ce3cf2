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

  /** One pooled worker's share: a base table plus the derived states
    * that follow it. */
  case class PoolMember(ns: String, table: String,
                        mvs: Seq[(String, String)],
                        ivfPqIndexes: Seq[(String, String)])

  /** Discover EVERY derived state the warehouse records and start a
    * BOUNDED POOL of workers multiplexing them — no manual
    * registration, the reference's sync-orchestrator model (scan the
    * control plane, maintain everything downstream) applied to derived
    * data:
    *  - incremental materialized views name their base in the
    *    `graft.mv.base` table property (full-mode MVs record no base —
    *    their definition may span several tables — and are skipped);
    *  - persisted IVF-PQ indexes name theirs in `graft.ann.base` on
    *    their `{prefix}_codes` table.
    * Base tables are sharded round-robin over at most `poolSize`
    * streaming queries (fewer when there are fewer bases), each
    * unioning its members' commit signals into ONE stream — a
    * warehouse of thousands of tables costs `poolSize` streams,
    * checkpoints, and scheduler loops, not thousands
    * ([[startPool]] for the per-batch cost shape). Checkpoints land
    * under `checkpointRoot/pool-<i>-<topology-hash>`: the hash keys
    * the member list, so adding/removing a base re-shards onto FRESH
    * checkpoints (source order inside a Spark checkpoint is fixed) and
    * the derived states' own watermarks carry exactly-once across the
    * switch. Returns the started queries (≤ poolSize). */
  def startAll(spark: SparkSession, warehouse: String,
               checkpointRoot: String,
               trigger: Trigger = Trigger.ProcessingTime(0L),
               driftBound: Double = 1.5,
               poolSize: Int = 4): Seq[StreamingQuery] = {
    require(poolSize > 0, s"poolSize must be positive, got $poolSize")
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
    val bases = (mvsByBase.keySet ++ idxByBase.keySet).toSeq.sorted
    if (bases.isEmpty) return Seq.empty
    val buckets = math.min(poolSize, bases.size)
    bases.zipWithIndex.groupMap(_._2 % buckets)(_._1).toSeq.sortBy(_._1)
      .map { case (i, members) =>
        val pool = members.map { case (bns, bt) =>
          PoolMember(bns, bt, mvsByBase.getOrElse((bns, bt), Vector.empty),
            idxByBase.getOrElse((bns, bt), Vector.empty))
        }
        // topology-keyed checkpoint: a re-shard must NOT resume a
        // checkpoint whose source list differs (member set/order is
        // baked into Spark's offset log)
        val topo = java.security.MessageDigest.getInstance("MD5")
          .digest(members.map(m => s"${m._1}.${m._2}").mkString(";")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          .take(4).map("%02x".format(_)).mkString
        startPool(spark, warehouse, pool,
          checkpointDir = s"$checkpointRoot/pool-$i-$topo",
          trigger = trigger, driftBound = driftBound)
      }
  }

  /** Start ONE streaming query maintaining every member base's derived
    * states: the members' cdc commit signals union into a single
    * stream (each projected to one constant column — the batch rows
    * are never executed, the sources only tick offsets), and each
    * micro-batch refreshes only the targets whose base HEAD moved
    * since the last successful refresh (one `latest()` metadata probe
    * per member per batch — no data read for quiet tables). A failed
    * refresh leaves its target's marker unset, so the next window
    * retries it; replay after a crash re-runs markers from empty and
    * the derived states' own watermarks no-op the already-applied ones
    * — the same exactly-once discipline as the single-base worker. */
  def startPool(spark: SparkSession, warehouse: String,
                members: Seq[PoolMember],
                checkpointDir: String,
                trigger: Trigger = Trigger.ProcessingTime(0L),
                driftBound: Double = 1.5): StreamingQuery = {
    require(members.nonEmpty, "startPool needs at least one member")
    require(members.forall(m => m.mvs.nonEmpty || m.ivfPqIndexes.nonEmpty),
      "every pool member needs at least one MV or index to maintain")
    import org.apache.spark.sql.functions.lit
    val signal = members.map { m =>
      spark.readStream
        .format("graft.streaming.GraftTableSourceProvider")
        .option("warehouse", warehouse)
        .option("table", s"${m.ns}.${m.table}")
        // cdc mode: delete/replace/maintenance commits must tick the
        // signal, not kill the stream (the appends mode's loud contract)
        .option("mode", "cdc")
        .option("starting-seq", "latest")
        .load()
        // common one-column shape so heterogeneous tables union; the
        // projection is never executed (signal only)
        .select(lit(1).as("tick"))
    }.reduce(_ unionAll _)
    // (kind, ns, name) -> base head seq at last SUCCESSFUL refresh;
    // worker-local (rebuilt empty on restart — the first batch then
    // re-attempts everything and the watermarks no-op what's done)
    val lastDone = scala.collection.mutable.Map.empty[(String, String, String), Long]
    val poolName = members.map(m => s"${m.ns}-${m.table}").mkString("_")
    signal.writeStream
      .queryName(s"graft-derived-pool-${poolName.take(64)}")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (_: DataFrame, batchId: Long) =>
        val cat = new GraftCatalog(spark, warehouse)
        def guarded(what: String)(body: => Unit): Unit =
          try body catch { case e: Exception =>
            System.err.println(s"[derived-worker] batch $batchId: " +
              s"refresh of $what failed (will retry next window): " +
              s"${e.getClass.getSimpleName}: ${e.getMessage}")
          }
        members.foreach { m =>
          val head = cat.latest(m.ns, m.table).map(_.seq).getOrElse(-1L)
          m.mvs.foreach { case (ns, name) =>
            val key = ("mv", ns, name)
            if (!lastDone.get(key).contains(head)) guarded(s"mv $ns.$name") {
              GraftMaterializedView.refresh(spark, cat, ns, name,
                s"$ns.$name"): Unit
              lastDone(key) = head
            }
          }
          m.ivfPqIndexes.foreach { case (ns, prefix) =>
            val key = ("idx", ns, prefix)
            if (!lastDone.get(key).contains(head)) guarded(s"index $ns.$prefix") {
              Similarity.maintainIvfPqIndex(cat, ns, prefix, driftBound): Unit
              lastDone(key) = head
            }
          }
        }
      }
      .start()
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
