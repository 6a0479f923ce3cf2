package graft.streaming

import graft.catalog.GraftCatalog
import org.apache.spark.sql.DataFrame

/** Streaming ingestion into the catalog: each micro-batch commits as ONE
  * table version (SURVEY §7.3 "sync worker state machine → foreachBatch +
  * MERGE"; here the MERGE is an append commit).
  *
  * Exactly-once versions on top of at-least-once foreachBatch: the
  * commitId is derived from (queryTag, batchId), so a Spark retry of a
  * failed/duplicated batch finds the id already in the commit log and
  * skips — the same replay guard a replicated sync commit uses
  * (commitFiles dedups landed files against the parent). The check runs
  * again INSIDE the CAS closure, so two racing replays cannot both land.
  *
  * At scale each batch is a distributed executor write (stageDataFiles),
  * the commit itself is metadata-only, and version history doubles as
  * the stream's progress log — readIncremental(v, v') replays exactly
  * the batches in between.
  */
object CatalogStreamSink {

  /** Pass to `writeStream.foreachBatch(...)`. */
  def foreachBatchCommit(cat: GraftCatalog, ns: String, table: String,
                         queryTag: String = "stream"): (DataFrame, Long) => Unit =
    guarded(cat, ns, table, _, _, queryTag,
      (df, cid) => cat.commitAppend(ns, table, df, commitId = Some(cid)))

  /** CDC-MERGE form of [[foreachBatchCommit]]: each micro-batch UPSERTS
    * by `keyCols` — one atomic equality-delete+append commit per batch
    * (GraftCatalog.commitUpsert), the sink that keeps a 100 TB mirror
    * table current from a change stream without rewriting data files.
    * Batches must carry at most one row per key (the standard MERGE
    * contract — pre-aggregate with latest-row-wins upstream). Shares the
    * append sink's two replay guards, so a crash-replayed batch is a
    * no-op and racing replays cannot both land. */
  def foreachBatchUpsert(cat: GraftCatalog, ns: String, table: String,
                         keyCols: Seq[String],
                         queryTag: String = "cdc"): (DataFrame, Long) => Unit =
    guarded(cat, ns, table, _, _, queryTag,
      (df, cid) => cat.commitUpsert(ns, table, df, keyCols, commitId = Some(cid)))

  /** CHANGE-FEED apply form — the sink half of the reference's sync DAG
    * (`iceberg-arch-geo-distributed-ha.md:1314-1367`, t6_cas_commit_
    * replica) run as ONE streaming job: each micro-batch of cdc rows
    * (`_change_type` ∈ insert|delete — what [[GraftTableSourceProvider]]
    * emits in cdc mode) applies to the replica table as ONE atomic
    * commit ([[GraftCatalog.commitCdcApply]]): deleted keys erase,
    * inserted rows upsert. Shares both replay guards, so checkpoint
    * recovery across a source replace/compaction stays exactly-once. */
  def foreachBatchApplyCdc(cat: GraftCatalog, ns: String, table: String,
                           keyCols: Seq[String],
                           queryTag: String = "cdcapply"): (DataFrame, Long) => Unit =
    (df0, batchId) =>
      guarded(cat, ns, table, df0, batchId, queryTag, (d0, cid) => {
        import org.apache.spark.sql.functions.col
        // the batch feeds two legs (inserts + delete keys): pin it so
        // the incremental read underneath runs once, not per leg — and
        // only INSIDE the commit closure, so a replayed batch the
        // high-water mark skips never materializes its cdc diff at all
        val d = d0.localCheckpoint()
        // an empty range (idle tick) must not pollute the replica's
        // history with no-op versions
        if (!d.isEmpty) {
          val ins = d.filter(col("_change_type") === "insert").drop("_change_type")
          val delKeys = d.filter(col("_change_type") === "delete")
            .select(keyCols.map(col): _*).distinct()
          cat.commitCdcApply(ns, table, ins, delKeys, keyCols,
            commitId = Some(cid)): Unit
        }
      })

  /** ATOMIC MULTI-TABLE fan-out form: each micro-batch splits into N
    * table-targeted frames (`routes` maps each (ns, table) to its
    * slice) and publishes them as ONE transaction
    * ([[GraftCatalog.commitTransaction]]) — either every target table
    * gets its slice of the batch or none does. Exactly-once on top of
    * at-least-once foreachBatch: the transaction id derives from
    * (queryTag, batchId), pending transaction state is RESOLVED before
    * the replay probe (so a batch that published its journal but
    * crashed pre-apply reads as done, never double-lands), and a lost
    * publish race resolves by re-probing the applied commit ids. The
    * routed-fan-out shape is the reference's event fan-out (one sync
    * event per target region) applied to streaming table writes. */
  def foreachBatchFanout(cat: GraftCatalog,
                         routes: Seq[(String, String, DataFrame => DataFrame)],
                         queryTag: String = "fanout")
      : (DataFrame, Long) => Unit = (df0, batchId) => {
    require(routes.nonEmpty, "fanout sink needs at least one route")
    require(routes.map(r => (r._1, r._2)).distinct.size == routes.size,
      "fanout routes name each table at most once")
    val tag = queryTag.replaceAll("[^A-Za-z0-9_-]", "-")
    val txnId = s"$tag-b$batchId"
    def appliedAll(): Boolean = routes.indices.forall { i =>
      cat.byCommitId(routes(i)._1, routes(i)._2, s"txn-$txnId-$i").isDefined
    }
    // surface pending transaction state BEFORE probing: a journal
    // published by a crashed attempt completes here and the probe then
    // reads the batch as done
    routes.foreach { case (ns, t, _) => cat.resolveTxnBarriers(ns, t) }
    val branch = s"sink-$txnId"
    def dropStaleBranches(): Unit = routes.foreach { case (ns, t, _) =>
      if (cat.branchExists(ns, t, branch))
        try cat.dropBranch(ns, t, branch) catch { case _: Throwable => () }
    }
    // an empty batch (idle tick) must not pollute N tables' histories
    // with no-op versions — same guard as the cdc sink
    lazy val batchEmpty = { val d = df0.localCheckpoint(); (d, d.isEmpty) }
    if (appliedAll()) {
      // a crashed attempt's staging may survive its own recovery (the
      // out-of-band completion never reaches the coordinator's drop)
      dropStaleBranches()
    } else if (!batchEmpty._2) {
      // the batch frame feeds every route: pin it once
      val df = batchEmpty._1
      try {
        val parts = routes.map { case (ns, t, route) =>
          // a crashed earlier attempt may have left a half-staged
          // branch — rebuild it from scratch (staging is cheap and
          // invisible; the TRANSACTION is the only visibility point)
          if (cat.branchExists(ns, t, branch)) cat.dropBranch(ns, t, branch)
          cat.createBranch(ns, t, branch)
          cat.commitAppendToBranch(ns, t, branch, route(df)): Unit
          cat.TxnPart(ns, t, branch)
        }
        cat.commitTransaction(parts, txnId = txnId): Unit
      } catch {
        // a racing replay won the journal CAS or the entry probe: this
        // is success-by-other-means iff every part is applied — drop
        // our orphaned staging and move on; anything else rethrows and
        // Spark retries the batch
        case e: Throwable =>
          routes.foreach { case (ns, t, _) => cat.resolveTxnBarriers(ns, t) }
          if (!appliedAll()) throw e
          dropStaleBranches()
      }
    }
  }

  private def guarded(cat: GraftCatalog, ns: String, table: String,
                      df: DataFrame, batchId: Long, queryTag: String,
                      commit: (DataFrame, String) => Unit): Unit =
    {
      import java.nio.charset.StandardCharsets.UTF_8
      import java.nio.file.{Files, StandardCopyOption}
      // replay guard #1 — monotonic high-water mark: batches commit in
      // order, so any batchId at or below the mark is a replay. The mark
      // is max(live tag commits, durable marker file): the live scan
      // alone FAILS OPEN once compaction + expiry leave no tag commit in
      // the retained log, so the marker (written after every commit,
      // monotonic) carries the mark across expiry; the live scan in turn
      // covers a crash BETWEEN commit and marker write.
      val prefix = s"$queryTag-batch-"
      val marker = cat.tablePath(ns, table).resolve(s"_meta/stream-hwm-$queryTag")
      val durable =
        if (Files.exists(marker))
          new String(Files.readAllBytes(marker), UTF_8).trim.toLongOption
        else None
      val maxLive = cat.snapshots(ns, table).map(_.commitId)
        .filter(_.startsWith(prefix))
        .flatMap(c => c.stripPrefix(prefix).toLongOption)
        .maxOption
      if ((durable ++ maxLive).maxOption.forall(batchId > _)) {
        val cid = s"$prefix$batchId"
        // replay guard #2: the per-commitId check, re-validated inside
        // the commit's CAS closure for racing replays
        try { commit(df, cid); () }
        catch { case _: GraftCatalog.DuplicateCommitException => () }
        // advance the durable mark (batchId > previous mark by the guard
        // above); tmp + atomic move so a crashed write can't corrupt it
        val tmp = marker.resolveSibling(s".tmp-hwm-${java.util.UUID.randomUUID()}")
        Files.write(tmp, batchId.toString.getBytes(UTF_8))
        Files.move(tmp, marker, StandardCopyOption.REPLACE_EXISTING,
          StandardCopyOption.ATOMIC_MOVE): Unit
      }
    }
}
