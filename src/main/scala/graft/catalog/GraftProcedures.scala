package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL stored procedures for the DSv2 catalog plugin — Spark 4's native
  * `CALL` surface (the analyzer's ResolveProcedures/InvokeProcedures
  * path, the same mechanism Iceberg exposes its maintenance actions
  * through), so a SQL-only user can run the table-maintenance and
  * interop actions without touching the Scala API:
  *
  * {{{
  *   CALL graft.system.compact('ns', 't', 134217728)
  *   CALL graft.system.expire_snapshots('ns', 't', 2)
  *   CALL graft.system.rollback('ns', 't', 3)
  *   CALL graft.system.iceberg_export('ns', 't', '/path/dest')
  *   CALL graft.system.iceberg_import('ns', 't2', '/path/dest')
  * }}}
  *
  * Each call runs the SAME transactional catalog operation the Scala
  * API runs (one CAS commit; concurrent-append aborts surface as
  * errors) and returns its report as a one-row result via LocalScan —
  * driver-side metadata, never a data scan. Procedures live under the
  * `system` namespace (Iceberg's convention); the bare-namespace form
  * `CALL graft.compact(...)` also resolves. */
object GraftProcedures {

  private val Names = Seq("compact", "expire_snapshots",
    "expire_snapshots_auto", "rollback",
    "iceberg_export", "iceberg_import",
    "create_branch", "fast_forward", "create_tag", "commit_transaction",
    "snapshot_consistent", "sweep_orphan_manifests",
    "backfill_stats", "rewrite_manifests", "rewrite_position_deletes",
    "refresh_mv", "create_changelog_view")

  def list(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("system")))
      Names.map(n => Identifier.of(Array("system"), n)).toArray
    else Array.empty

  def load(cat: GraftCatalog, ident: Identifier): Option[UnboundProcedure] = {
    if (ident.namespace().nonEmpty && !ident.namespace().sameElements(Array("system")))
      return None
    ident.name() match {
      case "compact" => Some(proc("compact",
        Seq("ns" -> StringType, "tbl" -> StringType,
          "target_file_bytes" -> LongType),
        StructType(Seq(StructField("version", LongType),
          StructField("file_count", LongType), StructField("total_bytes", LongType))),
        { case Seq(ns: String, t: String, target: java.lang.Long) =>
          // a zero/negative target would plan ceil(x/0.0)=Int.MaxValue
          // shuffle partitions — fail the SQL user with an argument
          // error, not a hung driver
          require(target > 0L, s"compact: target_file_bytes must be > 0, got $target")
          val s = cat.compact(ns, t, target)
          Seq(Seq(s.seq, s.fileCount, s.totalBytes)) }))
      case "expire_snapshots" => Some(proc("expire_snapshots",
        Seq("ns" -> StringType, "tbl" -> StringType, "retain_last" -> LongType),
        StructType(Seq(StructField("removed_files", LongType),
          StructField("live_versions", LongType))),
        { case Seq(ns: String, t: String, keep: java.lang.Long) =>
          // guard BEFORE the int narrowing: retain_last 2^32 would
          // truncate to 0 and expire EVERY snapshot — data destruction
          // from a plausible SQL typo
          require(keep >= 1L && keep <= Int.MaxValue,
            s"expire_snapshots: retain_last must be in [1, ${Int.MaxValue}], got $keep")
          val removed = cat.expireSnapshots(ns, t, keep.toInt)
          Seq(Seq(removed.size.toLong, cat.snapshots(ns, t).size.toLong)) }))
      // property-driven retention: policy rides the table's OWN
      // history.expire.* TBLPROPERTIES (max-snapshot-age-ms +
      // min-snapshots-to-keep) — the scheduled-maintenance form, same
      // shape as the no-target compact
      case "expire_snapshots_auto" => Some(proc("expire_snapshots_auto",
        Seq("ns" -> StringType, "tbl" -> StringType),
        StructType(Seq(StructField("removed_files", LongType),
          StructField("live_versions", LongType))),
        { case Seq(ns: String, t: String) =>
          val removed = cat.expireSnapshots(ns, t)
          Seq(Seq(removed.size.toLong, cat.snapshots(ns, t).size.toLong)) }))
      // the scheduled-maintenance spelling of REFRESH MATERIALIZED VIEW
      // (same shared entry point; reports which path the refresh took
      // and the post-refresh staleness watermark)
      case "refresh_mv" => Some(proc("refresh_mv",
        Seq("ns" -> StringType, "tbl" -> StringType),
        StructType(Seq(StructField("mode", StringType),
          StructField("base_seq", LongType))),
        { case Seq(ns: String, t: String) =>
          val mode = GraftMaterializedView.refresh(
            org.apache.spark.sql.SparkSession.active, cat, ns, t, s"$ns.$t")
          val wm = cat.tableProperties(ns, t)
            .get(GraftMaterializedView.BaseSeqProp).map(_.toLong).getOrElse(-1L)
          Seq(Seq(mode, wm)) }))
      // Iceberg's CDC spelling (spark procedure create_changelog_view):
      // registers the row-level changefeed of (from_seq, to_seq] as a
      // TEMP VIEW carrying _change_type, so a SQL-only consumer reads
      // CDC without the Scala API — same O(delta) machinery
      // (changesBetween incl. the maintenance-segmented path); the view
      // is LAZY, so registration is metadata-only
      case "create_changelog_view" => Some(proc("create_changelog_view",
        Seq("ns" -> StringType, "tbl" -> StringType,
          "from_seq" -> LongType, "to_seq" -> LongType),
        StructType(Seq(StructField("changelog_view", StringType))),
        { case Seq(ns: String, t: String, from: java.lang.Long,
                   to: java.lang.Long) =>
          val name = s"${t}_changes"
          cat.changesBetween(ns, t, from.longValue(), to.longValue())
            .createOrReplaceTempView(name)
          Seq(Seq(name)) }))
      case "rollback" => Some(proc("rollback",
        Seq("ns" -> StringType, "tbl" -> StringType, "seq" -> LongType),
        StructType(Seq(StructField("head_seq", LongType),
          StructField("restored_seq", LongType))),
        { case Seq(ns: String, t: String, seq: java.lang.Long) =>
          val s = cat.rollbackTo(ns, t, seq.longValue())
          Seq(Seq(s.seq, seq.longValue())) }))
      case "iceberg_export" => Some(proc("iceberg_export",
        Seq("ns" -> StringType, "tbl" -> StringType, "dest" -> StringType),
        StructType(Seq(StructField("metadata_file", StringType),
          StructField("snapshots", LongType), StructField("manifests", LongType),
          StructField("data_files", LongType), StructField("rows", LongType),
          StructField("timestamp_int96_risk", BooleanType))),
        { case Seq(ns: String, t: String, dest: String) =>
          val r = IcebergExport.exportTable(cat, ns, t, dest)
          Seq(Seq(r.metadataFile, r.snapshots.toLong, r.manifests.toLong,
            r.dataFiles.toLong, r.rows, r.timestampInt96Risk)) }))
      case "iceberg_import" => Some(proc("iceberg_import",
        Seq("ns" -> StringType, "tbl" -> StringType, "location" -> StringType),
        StructType(Seq(StructField("table", StringType),
          StructField("replays", LongType), StructField("replaces", LongType),
          StructField("data_files", LongType), StructField("rows", LongType))),
        { case Seq(ns: String, t: String, loc: String) =>
          val r = IcebergImport.importTable(cat, ns, t, loc)
          Seq(Seq(r.table, r.replays.toLong, r.replaces.toLong,
            r.dataFiles.toLong, r.rows)) }))
      case "create_branch" => Some(proc("create_branch",
        Seq("ns" -> StringType, "tbl" -> StringType, "branch" -> StringType),
        StructType(Seq(StructField("branch", StringType),
          StructField("fork_seq", LongType))),
        { case Seq(ns: String, t: String, branch: String) =>
          cat.createBranch(ns, t, branch)
          Seq(Seq(branch, cat.branchFork(ns, t, branch)._1)) }))
      case "commit_transaction" => Some(proc("commit_transaction",
        // parts spell "ns.table:branch" joined by ';' — one SQL string
        // because CALL takes scalars; each part stages on an ordinary
        // branch (create_branch + branch writes), and the call publishes
        // them ATOMICALLY across tables (all land or none)
        Seq("parts" -> StringType, "txn_id" -> StringType),
        StructType(Seq(StructField("tbl", StringType),
          StructField("seq", LongType), StructField("commit_id", StringType))),
        { case Seq(partsSpec: String, txnId: String) =>
          val parts = partsSpec.split(';').toSeq.map(_.trim).filter(_.nonEmpty)
            .map { s =>
              val m = "([^.:;]+)\\.([^.:;]+):([^.:;]+)".r
              s match {
                case m(ns, t, b) => cat.TxnPart(ns, t, b)
                case other => throw new IllegalArgumentException(
                  s"commit_transaction: part '$other' must spell ns.table:branch")
              }
            }
          val snaps = cat.commitTransaction(parts, txnId = txnId)
          parts.zip(snaps).map { case (p, s) =>
            Seq(s"${p.ns}.${p.table}", s.seq, s.commitId) } }))
      case "snapshot_consistent" => Some(proc("snapshot_consistent",
        // tables spell "ns.table" joined by ';' — returns one row per
        // table with the PINNED version of a transactionally-consistent
        // cut (no multi-table transaction split across the rows); read
        // the pins with VERSION AS OF
        Seq("tables" -> StringType),
        StructType(Seq(StructField("tbl", StringType),
          StructField("seq", LongType), StructField("commit_id", StringType))),
        { case Seq(tablesSpec: String) =>
          val tabs = tablesSpec.split(';').toSeq.map(_.trim).filter(_.nonEmpty)
            .map { s0 =>
              val m = "([^.:;]+)\\.([^.:;]+)".r
              s0 match {
                case m(ns, t) => (ns, t)
                case other => throw new IllegalArgumentException(
                  s"snapshot_consistent: '$other' must spell ns.table")
              }
            }
          val pins = cat.snapshotConsistent(tabs)
          tabs.zip(pins).map { case ((ns, t), p) =>
            Seq(s"$ns.$t", p.seq, p.commitId) } }))
      case "fast_forward" => Some(proc("fast_forward",
        Seq("ns" -> StringType, "tbl" -> StringType, "branch" -> StringType),
        StructType(Seq(StructField("merged_seq", LongType),
          StructField("commit_id", StringType))),
        { case Seq(ns: String, t: String, branch: String) =>
          val s = cat.fastForwardMerge(ns, t, branch)
          Seq(Seq(s.seq, s.commitId)) }))
      case "create_tag" => Some(proc("create_tag",
        Seq("ns" -> StringType, "tbl" -> StringType, "tag" -> StringType,
          "seq" -> LongType),
        StructType(Seq(StructField("tag", StringType),
          StructField("tagged_seq", LongType))),
        { case Seq(ns: String, t: String, tag: String, seq: java.lang.Long) =>
          cat.createTag(ns, t, tag, Some(seq.longValue()))
          Seq(Seq(tag, seq.longValue())) }))
      case "backfill_stats" => Some(proc("backfill_stats",
        Seq("ns" -> StringType, "tbl" -> StringType),
        StructType(Seq(StructField("version", LongType),
          StructField("rewritten_manifests", LongType))),
        { case Seq(ns: String, t: String) =>
          val (snap, n) = cat.backfillStats(ns, t)
          Seq(Seq(snap.seq, n.toLong)) }))
      case "rewrite_manifests" => Some(proc("rewrite_manifests",
        Seq("ns" -> StringType, "tbl" -> StringType, "target_entries" -> LongType),
        StructType(Seq(StructField("version", LongType),
          StructField("eliminated_manifests", LongType))),
        { case Seq(ns: String, t: String, target: java.lang.Long) =>
          // guard the Long->Int narrowing BEFORE it truncates (2^32+k
          // would silently become k; 2^32 exactly would become 0) —
          // same convention as expire_snapshots' retain_last
          require(target >= 1L && target <= Int.MaxValue.toLong,
            s"rewrite_manifests: target_entries out of range [1, 2^31-1]: $target")
          val (snap, n) = cat.rewriteManifests(ns, t, target.intValue())
          Seq(Seq(snap.seq, n.toLong)) }))
      case "rewrite_position_deletes" => Some(proc("rewrite_position_deletes",
        Seq("ns" -> StringType, "tbl" -> StringType),
        StructType(Seq(StructField("version", LongType),
          StructField("eliminated_delete_files", LongType))),
        { case Seq(ns: String, t: String) =>
          val (snap, n) = cat.rewritePositionDeletes(ns, t)
          Seq(Seq(snap.seq, n.toLong)) }))
      case "sweep_orphan_manifests" => Some(proc("sweep_orphan_manifests",
        Seq("ns" -> StringType, "tbl" -> StringType, "grace_ms" -> LongType),
        StructType(Seq(StructField("removed", LongType))),
        { case Seq(ns: String, t: String, grace: java.lang.Long) =>
          // every commit path writes its manifest BEFORE the CAS
          // publish — a sub-minute grace would reap an in-flight
          // commit's manifest and corrupt the snapshot it publishes
          require(grace >= 60000L,
            s"sweep_orphan_manifests: grace_ms must be >= 60000 (1 min) — " +
              s"a shorter window reaps in-flight commits' manifests; got $grace")
          Seq(Seq(cat.sweepOrphanManifests(ns, t, grace.longValue()).size.toLong)) }))
      case _ => None
    }
  }

  /** One IN-parameter procedure: binds as itself, extracts arguments by
    * the declared parameter types, runs the action on the DRIVER (these
    * are metadata/commit operations; any heavy lifting inside them is
    * already distributed by the catalog), and returns the report rows
    * through a LocalScan. */
  private def proc(procName: String, params: Seq[(String, DataType)],
                   outSchema: StructType,
                   run: PartialFunction[Seq[Any], Seq[Seq[Any]]]): UnboundProcedure =
    new UnboundProcedure with BoundProcedure {
      override def name(): String = procName
      override def description(): String = s"graft $procName"
      override def bind(inputType: StructType): BoundProcedure = this
      override def isDeterministic: Boolean = false
      override def parameters(): Array[ProcedureParameter] =
        params.map { case (n, dt) => ProcedureParameter.in(n, dt).build() }.toArray
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val args: Seq[Any] = params.zipWithIndex.map { case ((n, dt), i) =>
          require(!input.isNullAt(i), s"$procName: argument $n must not be null")
          dt match {
            case StringType => input.getUTF8String(i).toString
            case LongType => java.lang.Long.valueOf(input.getLong(i))
            case other => throw new IllegalArgumentException(
              s"$procName: unsupported parameter type $other")
          }
        }
        val out = run.applyOrElse(args, (a: Seq[Any]) =>
          throw new IllegalArgumentException(s"$procName: bad arguments $a"))
        val rowArr = out.map { vals =>
          new GenericInternalRow(vals.map {
            case s: String => UTF8String.fromString(s)
            case other => other.asInstanceOf[AnyRef]
          }.toArray[Any]): InternalRow
        }.toArray
        val scan: Scan = new LocalScan {
          override def rows(): Array[InternalRow] = rowArr
          override def readSchema(): StructType = outSchema
        }
        java.util.Collections.singletonList(scan).iterator()
      }
    }
}
