package graft.queries

import graft.Tables
import graft.meta.ControlTables
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Control-plane operator queries (SURVEY §2.1-§2.8), each backed by the
  * generic operators in graft.operators and checked against a DuckDB
  * oracle over the identical derived control tables (graft.meta).
  */
object ControlPlane {

  type Q = (SparkSession, String) => DataFrame

  // ---- shared oracle CTEs (must mirror graft.meta.ControlTables) ----

  private val FILES =
    """files AS (
      SELECT 's3://primary/' || l_orderkey || '/' || l_partkey || '-' || l_suppkey || '-' || l_linenumber || '.parquet' AS path,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS size_bytes,
             CAST(l_orderkey * 10 + l_linenumber AS VARCHAR) AS etag,
             r_name AS region, l_shipdate AS shipped_at,
             l_orderkey AS commit_seq, l_linenumber, l_discount, l_tax, l_returnflag
      FROM lineitem JOIN region ON l_suppkey % 5 = r_regionkey)"""

  private val EV =
    """ev AS (
      SELECT event_id, CAST(ts AS TIMESTAMP) AS created_at, user_id AS commit_id,
             r_name AS target_region,
             CASE CAST(json_extract_string(props, '$.k') AS INT) % 4
               WHEN 0 THEN 'Pending' WHEN 1 THEN 'InProgress'
               WHEN 2 THEN 'Completed' ELSE 'Failed' END AS status,
             value AS duration_ms, event_type
      FROM events JOIN region ON user_id % 5 = r_regionkey)"""

  private val REG =
    """reg AS (
      SELECT n_name AS entry, r_name AS region,
             CASE WHEN n_nationkey % 3 = 0 THEN 'Active' ELSE 'Inactive' END AS status
      FROM nation JOIN region ON n_regionkey = r_regionkey)"""

  private val COMMITS =
    """commits AS (
      SELECT o_custkey AS table_id, o_orderkey AS commit_seq,
             o_orderdate AS committed_at, o_orderstatus AS commit_status
      FROM orders)"""

  // ---- path localization config (shared Spark/oracle) ----

  private val regions = Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
  private val localizeMappings: Seq[(String, String)] =
    regions.flatMap(r => Seq(
      s"s3://src-$r/data/" -> s"file:///ssd/$r/data/",
      s"s3://src-$r/"      -> s"file:///local/$r/"))

  // ======================= §2.4 sync / replication =======================

  /** Y2/Y4 getPendingEvents: filter + sort over the event log. */
  private def syncPending: Q = (s, d) =>
    SyncOps.pendingEvents(ControlTables.syncEvents(s, d), "ASIA")
      .select(col("event_id"), col("created_at"), col("commit_id"), col("duration_ms"))

  /** E5 getEventCountByStatus per region. */
  private def syncEventStats: Q = (s, d) =>
    SyncOps.eventStats(ControlTables.syncEvents(s, d))
      .orderBy(col("target_region"), col("status"))

  /** Y8 retryFailedEvents: Failed → Pending projection. */
  private def syncRetry: Q = (s, d) =>
    SyncOps.retryCandidates(ControlTables.syncEvents(s, d))
      .select(col("event_id"), col("target_region"), col("status"))
      .orderBy(col("event_id"))

  /** Y14 snapshot diff (list_added_files): files added between versions. */
  private def snapshotDiff: Q = (s, d) => {
    val files = ControlTables.fileInventory(s, d)
    val atV1 = files.filter(col("shipped_at") <= lit("1995-06-01")).select("path")
    val atV2 = files.filter(col("shipped_at") <= lit("1997-06-01")).select("path")
    SnapshotDiff.addedFiles(atV1, atV2, Seq("path")).orderBy(col("path"))
  }

  /** Y15 three-level replication plan.
    *
    * The derived inventory feeds all four legs (src/dst/inv/stat) as a
    * re-derived narrow parquet scan per leg (round-16): the round-15
    * `localCheckpoint` materialized 600k ten-column rows (~125 MB of
    * deserialized checkpoint blocks) and every leg's re-SCAN of that
    * checkpoint measured 2-5× the cost of just recomputing the pruned
    * columnar scan + path concat (~0.4 cpu-s). At warehouse scale the
    * inventory IS a table and each leg is an independent pruned scan of
    * it — exactly this shape. */
  private def replicationPlan: Q = (s, d) => {
    val files = ControlTables.fileInventory(s, d)
    val src = files.select("path", "size_bytes", "etag")
    val dst = files.filter(col("shipped_at") < lit("1995-06-01"))
    val inv = files.filter(col("shipped_at") < lit("1996-06-01") && col("l_returnflag") =!= "R")
    val stat = files.filter(col("shipped_at") < lit("1997-01-01"))
      .select(col("path"),
        (col("size_bytes") + when(col("l_discount") > 0.08, 1).otherwise(0)).as("size_bytes"),
        col("etag"))
    ReplicationPlanner.plan(src, dst, inv, stat)
      .select(col("path")).orderBy(col("path"))
  }

  /** Y15 Bloom-accelerated plan (G7 scale path). Bloom positives are
    * resolved against the real inventory, so the output is provably
    * identical to the exact plan — same oracle. */
  private def replicationPlanBloom: Q = (s, d) => {
    // same re-derive-per-leg shape as replicationPlan (round-16): the
    // checkpoint cost more than the scans it saved
    val files = ControlTables.fileInventory(s, d)
    val src = files.select("path", "size_bytes", "etag")
    val dst = files.filter(col("shipped_at") < lit("1995-06-01"))
    val inv = files.filter(col("shipped_at") < lit("1996-06-01") && col("l_returnflag") =!= "R")
    val stat = files.filter(col("shipped_at") < lit("1997-01-01"))
      .select(col("path"),
        (col("size_bytes") + when(col("l_discount") > 0.08, 1).otherwise(0)).as("size_bytes"),
        col("etag"))
    ReplicationPlanner.planWithBloomInventory(src, dst, inv, stat)
      .select(col("path")).orderBy(col("path"))
  }

  /** Y16/G8 reconciliation defect report (missing / size mismatch). */
  private def reconDefects: Q = (s, d) => {
    val files = ControlTables.fileInventory(s, d)
    val manifest = files.filter(col("shipped_at") >= lit("1997-06-01"))
      .select("path", "size_bytes")
    val stat = files.filter(col("shipped_at") >= lit("1997-06-01") && !(col("l_discount") > 0.09))
      .select(col("path"),
        (col("size_bytes") + when(col("l_tax") > 0.05, 1).otherwise(0)).as("size_bytes"))
    StateReconciler.defects(manifest, stat)
      .select(col("path"), col("defect")).orderBy(col("path"))
  }

  /** Y16-L0 sampled verification: defects over the k hash-smallest
    * manifest paths, k = clamp(ceil(total·2%), 100, 500). */
  private def verifySample: Q = (s, d) => {
    val files = ControlTables.fileInventory(s, d)
    val manifest = files.filter(col("shipped_at") >= lit("1997-06-01"))
      .select("path", "size_bytes")
    val stat = files.filter(col("shipped_at") >= lit("1997-06-01") && !(col("l_discount") > 0.09))
      .select(col("path"),
        (col("size_bytes") + when(col("l_tax") > 0.05, 1).otherwise(0)).as("size_bytes"))
    StateReconciler.sampledDefects(manifest, stat, p = 0.02, kMin = 100, kMax = 500)
      .select(col("path"), col("defect")).orderBy(col("path"))
  }

  /** E4 per-region sync progress + ETA. */
  private def syncProgress: Q = (s, d) =>
    SyncOps.progress(ControlTables.syncEvents(s, d))
      .select(col("target_region"), col("total"), col("completed"), col("failed"),
              round(col("avg_ms"), 4).as("avg_ms"), col("remaining"), col("eta_ms"))
      .orderBy(col("target_region"))

  /** Y20 backpressure tiers from pending-work lag per region. */
  private def backpressure: Q = (s, d) =>
    ControlTables.syncEvents(s, d)
      .filter(col("status") === "Pending")
      .groupBy(col("target_region"))
      .agg(round(sum(col("duration_ms")), 2).as("lag"))
      .withColumn("tier", SyncOps.backpressureTier(col("lag")))
      .orderBy(col("target_region"))

  /** Y19 fast-forward decision per table. */
  private def fastForward: Q = (s, d) =>
    ControlTables.commits(s, d)
      .filter(col("table_id") < 100)
      .groupBy(col("table_id"))
      .agg(min(col("commit_seq")).as("current_seq"),
           max(col("commit_seq")).as("latest_seq"),
           count(lit(1)).as("versions"))
      .withColumn("action",
        when(col("latest_seq") - col("current_seq") > 50000, "fast_forward")
          .otherwise("incremental"))
      .orderBy(col("table_id"))

  // ======================= §2.7 GC / reconciliation =======================

  /** G2 produce_gc_candidates: unreachable = all − reachable.
    *
    * Reachability is COMMIT-keyed here (a file is reachable iff its
    * commit_seq has a live order), so the set difference anti-joins on
    * the compact long key instead of first materializing the reachable
    * PATH strings via a files⋈orders join and then shuffling ~40-byte
    * paths on both sides (guide §2.3: shuffle keys, not payloads).
    * Row-identical by construction — each file's membership in the
    * round-15 reachable path set was decided exactly by its own
    * commit_seq (paths are collision-free per row) — and the oracle
    * re-proves it. */
  private def gcCandidates: Q = (s, d) => {
    val files = ControlTables.fileInventory(s, d)
    val reachable = Tables.orders(s, d).filter(col("o_orderstatus") =!= "F")
      .select(col("o_orderkey").as("commit_seq"))
    GcPlanner.candidates(files, reachable, Seq("commit_seq"), "shipped_at", 7)
      .select(col("path"), col("delete_after")).orderBy(col("path"))
  }

  /** G6 orphan sweep with _tmp/ short-grace heuristic. */
  private def gcOrphans: Q = (s, d) => {
    val files = ControlTables.fileInventory(s, d)
    val inv = files.select(
      concat(when(col("l_discount") >= 0.1, "_tmp/").otherwise(""), col("path")).as("path"),
      col("shipped_at"))
    val reachable = files.filter(col("l_tax") < 0.07).select("path")
    GcPlanner.orphans(inv, reachable, Seq("path"), "shipped_at")
      .select(col("path"), col("grace_days"), col("delete_after"))
      .orderBy(col("path"))
  }

  /** G4 delete guard chain: safety window + consistency waterline.
    * Same commit-keyed reachability anti-join as [[gcCandidates]]
    * (guide §2.3) — row-identical, oracle-proven. */
  private def gcDeleteGuard: Q = (s, d) => {
    val files = ControlTables.fileInventory(s, d)
    val reachable = Tables.orders(s, d).filter(col("o_orderstatus") =!= "F")
      .select(col("o_orderkey").as("commit_seq"))
    val cands = GcPlanner.candidates(files, reachable, Seq("commit_seq"), "shipped_at", 7)
      .withColumn("watermark",
        when(col("region").isin("ASIA", "AMERICA"), lit("1996-06-01").cast("timestamp")))
    GcPlanner.deleteGuard(cands, lit("1997-01-01").cast("timestamp"),
        "shipped_at", 30L * 86400, cloudSide = false, "watermark")
      .select(col("path"), col("region")).orderBy(col("path"))
  }

  /** G3 gc_executions state machine: latest state per (execution, path)
    * — timestamp, then state precedence, then event id break ties —
    * rolled up by state. */
  private def gcExecStatus: Q = (s, d) =>
    GcExecutor.currentState(ControlTables.gcExecutions(s, d),
        tieBreak = Seq(col("event_id").desc))
      .groupBy(col("state")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("state"))

  /** Small-file compaction planning (the docs' 256MB-1GB file-target
    * policy, scaled to this dataset): tables whose average file size is
    * below threshold get a bin-pack target of ceil(total/target) files —
    * the planning half of GraftCatalog.compact. */
  private def compactionPlan: Q = (s, d) =>
    ControlTables.fileInventory(s, d)
      .groupBy((col("commit_seq") % 40).as("table_bucket"))
      .agg(count(lit(1)).as("file_cnt"), sum(col("size_bytes")).as("total_bytes"))
      .filter(col("total_bytes") / col("file_cnt") < 5300000.0 && col("file_cnt") > 1)
      .withColumn("target_files",
        greatest(lit(1L), ceil(col("total_bytes") / 10000000.0)))
      .orderBy(col("table_bucket"))

  // ======================= §2.6 read routing =======================

  /** Q3/Q4 weighted region scoring (0.7/0.3 weights, 0.3 inactive floor). */
  private def routeScores: Q = (s, d) =>
    ReadRouterOps.scoreRegions(ControlTables.regionHealth(s, d))
      .select(col("region"), col("storage_available"), col("active"),
              round(col("score"), 3).as("score"))
      .orderBy(col("region"))

  /** Q3 argmax region. */
  private def routeOptimal: Q = (s, d) =>
    ReadRouterOps.selectOptimal(ControlTables.regionHealth(s, d))
      .select(col("region"), round(col("score"), 3).as("score"))

  /** Q9 v1 watermark routing (MEET_WATERMARK policy). */
  private def routeWatermark: Q = (s, d) =>
    ReadRouterOps.routeByWatermark(
        ControlTables.commits(s, d).filter(col("table_id") % 100 === 7),
        "committed_at", lit("1997-01-01").cast("timestamp"), "MEET_WATERMARK")
      .select(col("commit_seq"), col("target"))
      .orderBy(col("commit_seq"))

  // ======================= §2.5 write coordination =======================

  /** W4 quorum: bool_and over per-region approvals. */
  private def commitQuorum: Q = (s, d) => {
    val approvals = ControlTables.syncEvents(s, d)
      .select(col("commit_id"), col("target_region"),
              (col("duration_ms") >= 50.0).as("approved"))
    CommitGate.quorum(approvals).orderBy(col("commit_id"))
  }

  /** W7 per-commit lifecycle rollup. */
  private def commitRollup: Q = (s, d) =>
    CommitGate.statusRollup(ControlTables.syncEvents(s, d))
      .orderBy(col("commit_id"))

  // ======================= §2.3 registry + §2.1 catalog =======================

  /** R5 active regions. */
  private def registryActive: Q = (s, d) =>
    RegistryOps.activeRegions(ControlTables.registry(s, d)).orderBy(col("region"))

  /** R8 registry stats by status. */
  private def registryStats: Q = (s, d) =>
    RegistryOps.stats(ControlTables.registry(s, d)).orderBy(col("status"))

  /** R7 batch path lookup: keys probe a broadcast registry; misses null. */
  private def registryLookup: Q = (s, d) => {
    val keys = Tables.customer(s, d).filter(col("c_custkey") < 100)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("entry"))
    val active = ControlTables.registry(s, d).filter(col("status") === "Active")
      .select(col("entry"), col("region"))
    RegistryOps.lookupBatch(keys, active, Seq("entry"))
      .select(col("c_custkey"), col("entry"), col("region"))
      .orderBy(col("c_custkey"))
  }

  /** C7 paginated namespace listing (offset + limit over a stable order). */
  private def catPaginated: Q = (s, d) =>
    Tables.part(s, d).select(col("p_name")).distinct()
      .orderBy(col("p_name")).offset(50).limit(25)

  /** C8/Y3 continuation-token pagination: the third 25-row page reached
    * by chaining opaque tokens (keyset form — each page is one
    * distributed top-k, no offset rescans). */
  private def catPaginatedToken: Q = (s, d) => {
    val names = Tables.part(s, d).select(col("p_name")).distinct()
    val t1 = Pagination.nextToken(names, "p_name", 25, None)
    val t2 = Pagination.nextToken(names, "p_name", 25, t1)
    Pagination.page(names, "p_name", 25, t2)
  }

  /** C9 commit history for one table, newest first. */
  private def catHistory: Q = (s, d) =>
    ControlTables.commits(s, d)
      .filter(col("table_id") % 100 === 7)
      .select(col("table_id"), col("commit_seq"), col("committed_at"))
      .orderBy(col("committed_at").desc, col("commit_seq").desc)
      .limit(200)

  /** C2 latest metadata per table (argmax via ranked window). */
  private def catLatest: Q = (s, d) => {
    val w = Window.partitionBy(col("table_id"))
      .orderBy(col("committed_at").desc, col("commit_seq").desc)
    ControlTables.commits(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("table_id"), col("commit_seq"), col("committed_at"))
      .orderBy(col("table_id"))
  }

  /** C10 getMetadataBatch: broadcast key-set join against latest versions. */
  private def catBatch: Q = (s, d) => {
    val keys = Tables.customer(s, d).filter(col("c_custkey") < 100)
      .select(col("c_custkey").as("table_id"))
    catLatest(s, d).join(broadcast(keys), Seq("table_id"))
      .orderBy(col("table_id"))
  }

  // ======================= R9 path localization + S11 storage =======================

  /** R9 longest-prefix path localization (codegen'd when-chain, no UDF). */
  private def pathLocalize: Q = (s, d) => {
    val files = ControlTables.fileInventory(s, d).filter(col("commit_seq") % 7 === 0)
    val raw = concat(lit("s3://src-"), col("region"), lit("/"),
      when(col("l_linenumber") === 1, "meta/").otherwise("data/"),
      col("commit_seq").cast("string"), lit("."),
      col("l_linenumber").cast("string"), lit(".parquet"))
    files.select(raw.as("raw_path"),
        PathLocalizer.localize(raw, localizeMappings).as("localized"))
      .orderBy(col("raw_path"))
  }

  /** S11 storage stats per region. */
  private def storageStats: Q = (s, d) =>
    ControlTables.fileInventory(s, d)
      .groupBy(col("region"))
      .agg(count(lit(1)).as("file_cnt"), sum(col("size_bytes")).as("total_bytes"))
      .orderBy(col("region"))

  /** S6 copy-job progress rollup per state. */
  private def copyJobStats: Q = (s, d) =>
    ControlTables.copyJobs(s, d)
      .groupBy(col("state"))
      .agg(count(lit(1)).as("jobs"),
           sum(col("bytes_copied")).as("total_bytes"),
           round(avg(col("files_copied")), 2).as("avg_files"),
           max(col("updated_at")).as("last_update"))
      .orderBy(col("state"))

  /** G5 lease guard: GC candidates minus snapshots pinned by active
    * query leases (anti-join; reference GCCoordinator.java:86). */
  private def gcLeaseGuard: Q = (s, d) => {
    val now = lit("1998-01-01").cast("timestamp")
    val cands = ControlTables.fileInventory(s, d)
      .filter(col("l_returnflag") === "R")
      .select(col("path"),
        concat(lit("tbl"), (col("commit_seq") % 10).cast("string")).as("table_entry"),
        (col("commit_seq") % 100).cast("int").as("pinned_seq"))
    val leases = Tables.supplier(s, d).select(
      concat(lit("lease-"), col("s_suppkey").cast("string")).as("lease_id"),
      concat(lit("tbl"), (col("s_suppkey") % 10).cast("string")).as("table_entry"),
      (col("s_suppkey") % 100).cast("int").as("pinned_seq"),
      (lit("1998-01-01").cast("timestamp") +
        when(col("s_acctbal") > 0, 30).otherwise(-30) * expr("INTERVAL 1 DAY")).as("expires_at"))
    LeaseOps.leaseGuard(cands, leases, now)
      .select(col("path"), col("table_entry"), col("pinned_seq"))
      .orderBy(col("path"))
  }

  /** E6 100 TB variants: HLL distinct + approx percentile (sketch results
    * are engine-specific — rows-only check; the exact duals are
    * rel_distinct_users / slo_percentiles). */
  private def sloApprox: Q = (s, d) =>
    ControlTables.syncEvents(s, d)
      .groupBy(col("target_region"))
      .agg(approx_count_distinct(col("commit_id")).as("approx_commits"),
           percentile_approx(col("duration_ms"), lit(0.95), lit(1000)).as("p95_approx"))
      .orderBy(col("target_region"))

  /** In-engine verifier for the approx-distinct path: HLL++ estimates
    * per event_type checked against the exact distinct count, emitting
    * every group whose relative error exceeds 20% (4× the default 5%
    * rsd). The oracle is the typed EMPTY SET — the sketches are
    * engine-defined so their values admit no cross-engine oracle, but
    * their accuracy contract does (the simhash_exact_diff pattern). The
    * exact side is the verifier; the approx side is the operator a 100 TB
    * deployment would actually run (fixed sketch memory vs a
    * distinct-sized hash table per group). */
  private def sloHllCheck: Q = (s, d) =>
    graft.Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"),
           approx_count_distinct(col("user_id")).as("approx_users"))
      .filter(abs(col("approx_users") - col("exact_users")).cast("double")
                > col("exact_users") * lit(0.2))
      .select(col("event_type"), col("exact_users"), col("approx_users"))
      .orderBy(col("event_type"))

  /** In-engine verifier for the count-min sketch path: per-event-type
    * CMS estimates vs exact counts, emitting any key the sketch
    * UNDERcounts — provably none (every cell counts a superset of its
    * key's occurrences), so the oracle is the typed empty set. At 100 TB
    * the sketch is the operator (fixed d·w memory, mergeable); the exact
    * side is its verifier, same split as slo_hll_check. */
  private def sloCmsCheck: Q = (s, d) => {
    val ev = graft.Tables.events(s, d)
    val sketch = graft.pipeline.Sketches.cmsBuild(ev, "event_type")
    val exact = ev.groupBy(col("event_type")).agg(count(lit(1)).as("exact_count"))
    graft.pipeline.Sketches.cmsEstimate(sketch, exact.select("event_type"), "event_type")
      .join(exact, "event_type")
      .filter(col("cms_estimate") < col("exact_count"))
      .select(col("event_type"), col("exact_count"), col("cms_estimate"))
      .orderBy(col("event_type"))
  }

  /** In-engine verifier for the approx-percentile path: per event_type,
    * percentile_approx(accuracy=100) carries a deterministic rank
    * guarantee — the returned value's rank lies within ±n/accuracy of
    * the target rank q·n (Greenwald-Khanna summaries, not sampling). We
    * recompute each approx value's true rank interval [rank_lo+1,
    * rank_hi] with one extra pass and emit every (group, q) whose
    * interval misses [floor((q−ε)·n), ceil((q+ε)·n)] — provably none,
    * so the oracle is the typed empty set (slo_hll_check pattern). At
    * 100 TB the sketch is the operator: fixed memory, mergeable
    * map-side, no per-group sort. */
  private def sloQuantileCheck: Q = (s, d) => {
    val qs = Seq(0.5, 0.95)
    val eps = 0.01 // = 1/accuracy
    val ev = graft.Tables.events(s, d).select(col("event_type"), col("value"))
    val approx = ev.groupBy(col("event_type"))
      .agg(percentile_approx(col("value"), array(qs.map(lit): _*), lit(100)).as("qv"),
        count(lit(1)).as("n"))
      .select(col("event_type"), col("n"),
        posexplode(col("qv")).as(Seq("qi", "approx_val")))
      .withColumn("q", element_at(array(qs.map(lit): _*), col("qi") + 1))
      .drop("qi")
    ev.join(approx, "event_type")
      .groupBy(col("event_type"), col("q"), col("approx_val"), col("n"))
      .agg(sum(when(col("value") < col("approx_val"), 1L).otherwise(0L)).as("rank_lo"),
        sum(when(col("value") <= col("approx_val"), 1L).otherwise(0L)).as("rank_hi"))
      .filter(col("rank_hi") < floor((col("q") - eps) * col("n")) ||
        col("rank_lo") + 1 > ceil((col("q") + eps) * col("n")))
      .select(col("event_type"), col("q"), col("approx_val"),
        col("n"), col("rank_lo"), col("rank_hi"))
      .orderBy(col("event_type"), col("q"))
  }

  /** E6 SLO lag percentiles (exact interpolated percentile — the
    * approx_percentile path is the 100 TB variant, not oracle-checkable). */
  private def sloPercentiles: Q = (s, d) =>
    ControlTables.syncEvents(s, d)
      .groupBy(col("event_type"))
      .agg(round(expr("percentile(duration_ms, 0.5)"), 4).as("p50"),
           round(expr("percentile(duration_ms, 0.95)"), 4).as("p95"))
      .orderBy(col("event_type"))

  // ======================= registry =======================

  val queries: Map[String, Q] = Map(
    "sync_pending_events"    -> syncPending,
    "sync_event_stats"       -> syncEventStats,
    "sync_retry_candidates"  -> syncRetry,
    "sync_snapshot_diff"     -> snapshotDiff,
    "sync_replication_plan"  -> replicationPlan,
    "sync_replication_bloom" -> replicationPlanBloom,
    "sync_recon_defects"     -> reconDefects,
    "sync_verify_sample"     -> verifySample,
    "sync_progress_eta"      -> syncProgress,
    "sync_backpressure"      -> backpressure,
    "sync_fast_forward"      -> fastForward,
    "gc_candidates"          -> gcCandidates,
    "gc_orphans"             -> gcOrphans,
    "gc_delete_guard"        -> gcDeleteGuard,
    "route_scores"           -> routeScores,
    "route_optimal"          -> routeOptimal,
    "route_watermark"        -> routeWatermark,
    "commit_quorum"          -> commitQuorum,
    "commit_rollup"          -> commitRollup,
    "registry_active"        -> registryActive,
    "registry_stats"         -> registryStats,
    "registry_lookup"        -> registryLookup,
    "cat_paginated"          -> catPaginated,
    "cat_paginated_token"    -> catPaginatedToken,
    "cat_history"            -> catHistory,
    "cat_latest"             -> catLatest,
    "cat_batch"              -> catBatch,
    "path_localize"          -> pathLocalize,
    "storage_stats"          -> storageStats,
    "storage_copy_jobs"      -> copyJobStats,
    "slo_percentiles"        -> sloPercentiles,
    "gc_lease_guard"         -> gcLeaseGuard,
    "gc_exec_status"         -> gcExecStatus,
    "gc_compaction_plan"     -> compactionPlan,
    "slo_approx"             -> sloApprox,
    "slo_quantile_check"     -> sloQuantileCheck,
    "slo_hll_check"          -> sloHllCheck,
    "slo_cms_check"          -> sloCmsCheck,
  )

  // ---- oracle SQL (DuckDB) ----

  private def localizeCaseSql(pathExpr: String): String = {
    val ordered = localizeMappings.sortBy { case (src, _) => -src.length }
    val branches = ordered.map { case (src, dst) =>
      s"WHEN starts_with($pathExpr, '$src') THEN '$dst' || substr($pathExpr, ${src.length + 1})"
    }.mkString("\n           ")
    s"CASE $branches ELSE NULL END"
  }

  // Shared by sync_replication_plan and sync_replication_bloom (identical
  // semantics; the Bloom sketch only restructures the joins). The level-2
  // inventory check is path-only here because the derived inventory rows
  // carry the same size/etag as the source listing — the size/etag
  // disagreement branch (ReplicationPlanner.notSatisfiedByInventory) is
  // exercised by ScalaTest instead.
  private val replicationPlanSql: String =
    s"""WITH $FILES,
        dst AS (SELECT path FROM files WHERE shipped_at < TIMESTAMP '1995-06-01'),
        inv AS (SELECT path FROM files WHERE shipped_at < TIMESTAMP '1996-06-01' AND l_returnflag <> 'R'),
        stat AS (SELECT path, size_bytes + CASE WHEN l_discount > 0.08 THEN 1 ELSE 0 END AS stat_size,
                        etag AS stat_etag
                 FROM files WHERE shipped_at < TIMESTAMP '1997-01-01'),
        cand AS (SELECT f.* FROM files f
                 WHERE NOT EXISTS (SELECT 1 FROM dst WHERE dst.path = f.path)
                   AND NOT EXISTS (SELECT 1 FROM inv WHERE inv.path = f.path))
        SELECT c.path FROM cand c LEFT JOIN stat s ON c.path = s.path
        WHERE s.stat_size IS NULL OR s.stat_size <> c.size_bytes
           OR (s.stat_etag IS NOT NULL AND c.etag IS NOT NULL AND s.stat_etag <> c.etag)
        ORDER BY c.path"""

  val oracles: Map[String, String] = Map(
    "sync_pending_events" ->
      s"""WITH $EV SELECT event_id, created_at, commit_id, duration_ms
          FROM ev WHERE status = 'Pending' AND target_region = 'ASIA'
          ORDER BY created_at, event_id""",
    "sync_event_stats" ->
      s"""WITH $EV SELECT target_region, status, count(*) AS cnt
          FROM ev GROUP BY 1, 2 ORDER BY 1, 2""",
    "sync_retry_candidates" ->
      s"""WITH $EV SELECT event_id, target_region, 'Pending' AS status
          FROM ev WHERE status = 'Failed' ORDER BY event_id""",
    "sync_snapshot_diff" ->
      s"""WITH $FILES
          SELECT path FROM files WHERE shipped_at <= TIMESTAMP '1997-06-01'
          EXCEPT
          SELECT path FROM files WHERE shipped_at <= TIMESTAMP '1995-06-01'
          ORDER BY path""",
    // Bloom variant resolves positives against the real inventory, so its
    // output (and oracle) is identical to the exact three-level plan.
    "sync_replication_bloom" -> replicationPlanSql,
    "sync_replication_plan" -> replicationPlanSql,
    "sync_recon_defects" ->
      s"""WITH $FILES,
          manifest AS (SELECT path, size_bytes FROM files WHERE shipped_at >= TIMESTAMP '1997-06-01'),
          stat AS (SELECT path, size_bytes + CASE WHEN l_tax > 0.05 THEN 1 ELSE 0 END AS stat_size
                   FROM files WHERE shipped_at >= TIMESTAMP '1997-06-01' AND NOT (l_discount > 0.09))
          SELECT m.path, CASE WHEN s.stat_size IS NULL THEN 'missing' ELSE 'size_mismatch' END AS defect
          FROM manifest m LEFT JOIN stat s ON m.path = s.path
          WHERE s.stat_size IS NULL OR s.stat_size <> m.size_bytes
          ORDER BY m.path""",
    "sync_progress_eta" ->
      s"""WITH $EV SELECT target_region,
          count(*) AS total,
          count(*) FILTER (WHERE status = 'Completed') AS completed,
          count(*) FILTER (WHERE status = 'Failed') AS failed,
          round(avg(duration_ms) FILTER (WHERE status = 'Completed'), 4) AS avg_ms,
          count(*) - count(*) FILTER (WHERE status = 'Completed')
                   - count(*) FILTER (WHERE status = 'Failed') AS remaining,
          round(avg(duration_ms) FILTER (WHERE status = 'Completed')
                * (count(*) - count(*) FILTER (WHERE status = 'Completed')
                            - count(*) FILTER (WHERE status = 'Failed')), 2) AS eta_ms
          FROM ev GROUP BY 1 ORDER BY 1""",
    "sync_backpressure" ->
      s"""WITH $EV SELECT target_region, round(sum(duration_ms), 2) AS lag,
          CASE WHEN sum(duration_ms) < 10000 THEN 'Green'
               WHEN sum(duration_ms) < 50000 THEN 'Yellow'
               WHEN sum(duration_ms) < 200000 THEN 'Orange'
               ELSE 'Red' END AS tier
          FROM ev WHERE status = 'Pending' GROUP BY 1 ORDER BY 1""",
    "sync_fast_forward" ->
      s"""WITH $COMMITS SELECT table_id, min(commit_seq) AS current_seq,
          max(commit_seq) AS latest_seq, count(*) AS versions,
          CASE WHEN max(commit_seq) - min(commit_seq) > 50000
               THEN 'fast_forward' ELSE 'incremental' END AS action
          FROM commits WHERE table_id < 100 GROUP BY 1 ORDER BY 1""",
    "gc_candidates" ->
      s"""WITH $FILES
          SELECT path, shipped_at + INTERVAL 7 DAY AS delete_after FROM files
          WHERE NOT EXISTS (
            SELECT 1 FROM orders WHERE o_orderkey = files.commit_seq AND o_orderstatus <> 'F')
          ORDER BY path""",
    "gc_orphans" ->
      s"""WITH $FILES,
          inv AS (SELECT CASE WHEN l_discount >= 0.1 THEN '_tmp/' ELSE '' END || path AS path,
                         shipped_at FROM files),
          reachable AS (SELECT path FROM files WHERE l_tax < 0.07)
          SELECT i.path,
                 CASE WHEN starts_with(i.path, '_tmp/') OR i.path LIKE '%/!_tmp/%' ESCAPE '!'
                       OR starts_with(i.path, '_staging/') OR i.path LIKE '%/!_staging/%' ESCAPE '!'
                       OR starts_with(i.path, '._tmp_') OR i.path LIKE '%/.!_tmp!_%' ESCAPE '!'
                      THEN 3 ELSE 14 END AS grace_days,
                 i.shipped_at + CASE WHEN starts_with(i.path, '_tmp/') OR i.path LIKE '%/!_tmp/%' ESCAPE '!'
                       OR starts_with(i.path, '_staging/') OR i.path LIKE '%/!_staging/%' ESCAPE '!'
                       OR starts_with(i.path, '._tmp_') OR i.path LIKE '%/.!_tmp!_%' ESCAPE '!'
                      THEN 3 ELSE 14 END * INTERVAL 1 DAY AS delete_after
          FROM inv i WHERE NOT EXISTS (SELECT 1 FROM reachable r WHERE r.path = i.path)
          ORDER BY i.path""",
    "gc_delete_guard" ->
      s"""WITH $FILES,
          cand AS (SELECT path, region, shipped_at FROM files
                   WHERE NOT EXISTS (
                     SELECT 1 FROM orders WHERE o_orderkey = files.commit_seq AND o_orderstatus <> 'F'))
          SELECT path, region FROM (
            SELECT path, region, shipped_at,
                   CASE WHEN region IN ('ASIA', 'AMERICA') THEN TIMESTAMP '1996-06-01' END AS watermark
            FROM cand) c
          WHERE TIMESTAMP '1997-01-01' > shipped_at + INTERVAL 30 DAY
            AND (watermark IS NULL OR NOT (watermark < shipped_at))
          ORDER BY path""",
    "route_scores" ->
      """SELECT r_name AS region,
         r_regionkey <> 3 AS storage_available,
         r_regionkey % 2 = 0 AS active,
         round(CASE WHEN r_regionkey <> 3 THEN CAST(1.0 AS DOUBLE) ELSE 0.0 END * 0.7
             + CASE WHEN r_regionkey % 2 = 0 THEN CAST(1.0 AS DOUBLE) ELSE 0.3 END * 0.3, 3) AS score
         FROM region ORDER BY region""",
    "route_optimal" ->
      """SELECT region, score FROM (
           SELECT r_name AS region,
             round(CASE WHEN r_regionkey <> 3 THEN CAST(1.0 AS DOUBLE) ELSE 0.0 END * 0.7
                 + CASE WHEN r_regionkey % 2 = 0 THEN CAST(1.0 AS DOUBLE) ELSE 0.3 END * 0.3, 3) AS score
           FROM region) t
         WHERE score > 0 ORDER BY score DESC, region LIMIT 1""",
    "route_watermark" ->
      s"""WITH $COMMITS SELECT commit_seq,
          CASE WHEN committed_at <= TIMESTAMP '1997-01-01' THEN 'CLOUD' ELSE 'ONPREM' END AS target
          FROM commits WHERE table_id % 100 = 7 ORDER BY commit_seq""",
    "commit_quorum" ->
      s"""WITH $EV SELECT commit_id, bool_and(duration_ms >= 50.0) AS approved,
          count(*) AS votes FROM ev GROUP BY 1 ORDER BY 1""",
    "commit_rollup" ->
      s"""WITH $EV SELECT commit_id,
          count(*) FILTER (WHERE status = 'Completed') AS completed,
          count(*) FILTER (WHERE status = 'Failed') AS failed,
          count(*) FILTER (WHERE status = 'Pending') AS pending,
          count(*) FILTER (WHERE status = 'InProgress') AS in_progress
          FROM ev GROUP BY 1 ORDER BY 1""",
    "registry_active" ->
      s"""WITH $REG SELECT DISTINCT region FROM reg WHERE status = 'Active' ORDER BY region""",
    "registry_stats" ->
      s"""WITH $REG SELECT status, count(*) AS cnt FROM reg GROUP BY 1 ORDER BY 1""",
    "registry_lookup" ->
      s"""WITH $REG SELECT c_custkey, n_name AS entry, r.region
          FROM customer JOIN nation ON c_nationkey = n_nationkey
          LEFT JOIN (SELECT entry, region FROM reg WHERE status = 'Active') r ON n_name = r.entry
          WHERE c_custkey < 100 ORDER BY c_custkey""",
    "cat_paginated" ->
      """SELECT DISTINCT p_name FROM part ORDER BY p_name LIMIT 25 OFFSET 50""",
    // keyset pagination over unique sorted keys is positionally identical
    // to offset pagination — the token form must land on the same page 3
    "cat_paginated_token" ->
      """SELECT DISTINCT p_name FROM part ORDER BY p_name LIMIT 25 OFFSET 50""",
    "sync_verify_sample" ->
      s"""WITH $FILES,
          manifest AS (SELECT path, size_bytes FROM files WHERE shipped_at >= TIMESTAMP '1997-06-01'),
          stat AS (SELECT path, size_bytes + CASE WHEN l_tax > 0.05 THEN 1 ELSE 0 END AS stat_size
                   FROM files WHERE shipped_at >= TIMESTAMP '1997-06-01' AND NOT (l_discount > 0.09)),
          sampled AS (
            SELECT path, size_bytes FROM (
              SELECT m.path, m.size_bytes,
                     row_number() OVER (ORDER BY md5(m.path), m.path) AS rn,
                     count(*) OVER () AS total
              FROM manifest m) t
            WHERE rn <= least(greatest(CAST(ceil(total * 0.02) AS BIGINT), 100), 500))
          SELECT s.path,
                 CASE WHEN st.stat_size IS NULL THEN 'missing' ELSE 'size_mismatch' END AS defect
          FROM sampled s LEFT JOIN stat st ON s.path = st.path
          WHERE st.stat_size IS NULL OR st.stat_size <> s.size_bytes
          ORDER BY s.path""",
    "cat_history" ->
      s"""WITH $COMMITS SELECT table_id, commit_seq, committed_at FROM commits
          WHERE table_id % 100 = 7
          ORDER BY committed_at DESC, commit_seq DESC LIMIT 200""",
    "cat_latest" ->
      s"""WITH $COMMITS SELECT table_id, commit_seq, committed_at FROM (
            SELECT table_id, commit_seq, committed_at,
                   row_number() OVER (PARTITION BY table_id
                     ORDER BY committed_at DESC, commit_seq DESC) AS rn
            FROM commits) t WHERE rn = 1 ORDER BY table_id""",
    "cat_batch" ->
      s"""WITH $COMMITS SELECT table_id, commit_seq, committed_at FROM (
            SELECT table_id, commit_seq, committed_at,
                   row_number() OVER (PARTITION BY table_id
                     ORDER BY committed_at DESC, commit_seq DESC) AS rn
            FROM commits) t
          WHERE rn = 1 AND table_id IN (SELECT c_custkey FROM customer WHERE c_custkey < 100)
          ORDER BY table_id""",
    "path_localize" -> {
      val raw = """'s3://src-' || region || '/' ||
            CASE WHEN l_linenumber = 1 THEN 'meta/' ELSE 'data/' END ||
            commit_seq || '.' || l_linenumber || '.parquet'"""
      s"""WITH $FILES,
          rawp AS (SELECT $raw AS raw_path FROM files WHERE commit_seq % 7 = 0)
          SELECT raw_path, ${localizeCaseSql("raw_path")} AS localized
          FROM rawp ORDER BY raw_path"""
    },
    "storage_stats" ->
      s"""WITH $FILES SELECT region, count(*) AS file_cnt,
          CAST(sum(size_bytes) AS BIGINT) AS total_bytes
          FROM files GROUP BY 1 ORDER BY 1""",
    "storage_copy_jobs" ->
      """WITH cj AS (
           SELECT 'copy-' || event_id AS job_id,
                  CASE CAST(json_extract_string(props, '$.k') AS INT) % 4
                    WHEN 0 THEN 'Running' WHEN 1 THEN 'Completed'
                    WHEN 2 THEN 'Failed' ELSE 'Cancelled' END AS state,
                  event_id % 1000 AS files_copied,
                  CAST(round(value * 1000000) AS BIGINT) AS bytes_copied,
                  CAST(ts AS TIMESTAMP) AS updated_at
           FROM events)
         SELECT state, count(*) AS jobs,
                CAST(sum(bytes_copied) AS BIGINT) AS total_bytes,
                round(avg(files_copied), 2) AS avg_files,
                max(updated_at) AS last_update
         FROM cj GROUP BY 1 ORDER BY 1""",
    "gc_lease_guard" ->
      s"""WITH $FILES,
          cand AS (SELECT path, 'tbl' || (commit_seq % 10) AS table_entry,
                          CAST(commit_seq % 100 AS INT) AS pinned_seq
                   FROM files WHERE l_returnflag = 'R'),
          pins AS (SELECT 'tbl' || (s_suppkey % 10) AS table_entry,
                          CAST(s_suppkey % 100 AS INT) AS pinned_seq
                   FROM supplier
                   WHERE TIMESTAMP '1998-01-01' +
                         CASE WHEN s_acctbal > 0 THEN 30 ELSE -30 END * INTERVAL 1 DAY
                         > TIMESTAMP '1998-01-01')
          SELECT path, table_entry, pinned_seq FROM cand c
          WHERE NOT EXISTS (SELECT 1 FROM pins p
                            WHERE p.table_entry = c.table_entry
                              AND p.pinned_seq = c.pinned_seq)
          ORDER BY path""",
    "gc_compaction_plan" ->
      s"""WITH $FILES
          SELECT commit_seq % 40 AS table_bucket, count(*) AS file_cnt,
                 CAST(sum(size_bytes) AS BIGINT) AS total_bytes,
                 greatest(CAST(1 AS BIGINT),
                          CAST(ceil(sum(size_bytes) / 10000000.0) AS BIGINT)) AS target_files
          FROM files GROUP BY 1
          HAVING sum(size_bytes) / count(*) < 5300000.0 AND count(*) > 1
          ORDER BY table_bucket""",
    "gc_exec_status" ->
      """WITH gx AS (
           SELECT 'exec-' || (user_id % 10) AS execution_id,
                  's3://gc/' || (event_id % 997) AS path,
                  CASE CAST(json_extract_string(props, '$.k') AS INT) % 5
                    WHEN 0 THEN 'planned' WHEN 1 THEN 'deleting'
                    WHEN 2 THEN 'deleted' WHEN 3 THEN 'missing'
                    ELSE 'error' END AS state,
                  CAST(ts AS TIMESTAMP) AS updated_at, event_id
           FROM events),
         cur AS (
           SELECT state FROM (
             SELECT state, row_number() OVER (
               PARTITION BY execution_id, path
               ORDER BY updated_at DESC,
                        CASE state WHEN 'planned' THEN 0 WHEN 'deleting' THEN 1
                                   WHEN 'error' THEN 2 ELSE 3 END DESC,
                        event_id DESC) AS rn
             FROM gx) t WHERE rn = 1)
         SELECT state, count(*) AS cnt FROM cur GROUP BY 1 ORDER BY 1""",
    "slo_percentiles" ->
      s"""WITH $EV SELECT event_type,
          round(quantile_cont(duration_ms, 0.5), 4) AS p50,
          round(quantile_cont(duration_ms, 0.95), 4) AS p95
          FROM ev GROUP BY 1 ORDER BY 1""",
    "slo_hll_check" ->
      """SELECT CAST(NULL AS VARCHAR) AS event_type,
                CAST(NULL AS BIGINT) AS exact_users,
                CAST(NULL AS BIGINT) AS approx_users WHERE 1 = 0""",
    // CMS never undercounts — a theorem about the sketch, not a
    // tolerance — so the oracle is the typed empty set (the
    // slo_hll_check / dedup_simhash_exact_diff pattern)
    "slo_cms_check" ->
      """SELECT CAST(NULL AS VARCHAR) AS event_type,
                CAST(NULL AS BIGINT) AS exact_count,
                CAST(NULL AS BIGINT) AS cms_estimate WHERE 1 = 0""",
    // the GK summary's rank guarantee is deterministic, so violations
    // are the typed empty set (slo_hll_check pattern)
    "slo_quantile_check" ->
      """SELECT CAST(NULL AS VARCHAR) AS event_type,
                CAST(NULL AS DOUBLE) AS q,
                CAST(NULL AS DOUBLE) AS approx_val,
                CAST(NULL AS BIGINT) AS n,
                CAST(NULL AS BIGINT) AS rank_lo,
                CAST(NULL AS BIGINT) AS rank_hi WHERE 1 = 0""",
  )
}
