package graft.catalog

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, RowLevelOperationBuilder, RowLevelOperationInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{BaseRelation, Filter, InsertableRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Spark DataSource-V2 catalog plugin over [[GraftCatalog]] — the SQL
  * front door. Register once:
  *
  * {{{
  *   spark.sql.catalog.graft            = graft.catalog.GraftSparkCatalog
  *   spark.sql.catalog.graft.warehouse  = /path/to/warehouse
  * }}}
  *
  * and every SQL user can read graft tables with standard syntax —
  * including native time travel, which Spark routes to the dedicated
  * loadTable overloads:
  *
  * {{{
  *   SELECT * FROM graft.ns.t WHERE id > 5
  *   SELECT * FROM graft.ns.t VERSION AS OF 2
  *   SELECT * FROM graft.ns.t TIMESTAMP AS OF '2024-06-01 00:00:00'
  *   SHOW TABLES IN graft.ns
  * }}}
  *
  * Read path: each table serves scans through the V1Scan bridge (the
  * public connector API the JDBC source uses) wrapping the catalog's
  * own DataFrame plan, with REQUIRED-COLUMN pruning and filter pushdown
  * forwarded into that inner plan — so the parquet scans underneath
  * still receive PushedFilters/ReadSchema exactly as the DataFrame API
  * path does, merge-on-read deletes and schema evolution included.
  * Pushed filters are also reported back as residuals (Spark re-applies
  * them), so a partially-translatable predicate can never change
  * results.
  *
  * Write path: `INSERT INTO` bridges through V1Write onto ONE atomic
  * commitAppend (a CAS-published version per statement); `INSERT
  * OVERWRITE` is one commitReplace. CREATE/DROP TABLE map 1:1 to the
  * catalog DDL; ALTER TABLE publishes a metadata-only schema-evolution
  * version (add/drop/type-promote — see alterTable). Row-level SQL
  * (UPDATE/DELETE/MERGE) runs through SupportsRowLevelOperations
  * (GraftRowLevelOps); table RENAME is unsupported.
  *
  * Reference analog: the reference's query module resolves catalog
  * tables server-side; this is that resolution expressed as the
  * engine-native catalog plugin.
  */
class GraftSparkCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog with ViewCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  private def spark: SparkSession = SparkSession.active
  // ONE catalog instance per plugin: the plugin is cached per session by
  // Spark's CatalogManager, and the GraftCatalog's snapshot/manifest
  // caches (immutable files) are the whole point — a fresh instance per
  // statement would re-parse every version JSON per query
  // exposed to the package's DDL commands (materialized views commit
  // state + watermark through the catalog directly)
  private[graft] lazy val cat: GraftCatalog = new GraftCatalog(spark, warehouse)

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = options.get("warehouse")
    require(warehouse != null,
      s"spark.sql.catalog.$name.warehouse must point at a graft warehouse")
    // row-level SQL (UPDATE/MERGE/subquery DELETE) needs the COW scan
    // substitution rule in the session's optimizer — idempotent (one
    // shared rule object), and experimental.extraOptimizations is the
    // one injection point that still works on an already-built session
    val exp = spark.experimental
    exp.synchronized {
      if (!exp.extraOptimizations.contains(GraftCowScanSubstitution))
        exp.extraOptimizations = exp.extraOptimizations :+ GraftCowScanSubstitution
      // planner statistics for V1-bridged scans (see GraftStatsRelation)
      if (!exp.extraOptimizations.contains(GraftStatsInjection))
        exp.extraOptimizations = exp.extraOptimizations :+ GraftStatsInjection
      if (!exp.extraStrategies.contains(GraftStatsStrategy))
        exp.extraStrategies = exp.extraStrategies :+ GraftStatsStrategy
    }
  }

  override def name(): String = catalogName

  // the analyzer expects NoSuchTableException for unresolvable shapes
  // (a require would abort analysis with an internal-style error)
  private def nsOf(ident: Identifier): String = {
    if (ident.namespace().length != 1) throw new NoSuchTableException(ident)
    ident.namespace()(0)
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (namespace.length != 1) throw new NoSuchNamespaceException(namespace)
    cat.listTables(namespace(0)).map(t => Identifier.of(namespace, t)).toArray
  }

  private def insertInto(ns: String, t: String): (DataFrame, Boolean) => Unit =
    (data, overwrite) => {
      // `write.bloom-columns` TBLPROPERTY: the SQL INSERT path records
      // per-file blooms on the listed columns (point-lookup pruning on
      // hash-distributed keys) — the knob rides the table's metadata,
      // not the writing job. INSERT OVERWRITE honors it too, or one
      // rewrite would silently de-index the table
      // ONE head read serves every property (bloom + sort + schema from
      // the SAME version — separate reads could observe different
      // versions under a concurrent ALTER)
      val head = cat.latest(ns, t)
      val props = head.map(_.properties).getOrElse(Map.empty)
      val schema = head.flatMap(_.schemaJson).map(j =>
        org.apache.spark.sql.types.DataType.fromJson(j)
          .asInstanceOf[StructType])
      // layout: the PARTITION SPEC's clustering columns first (identity/
      // temporal/truncate cluster by their monotone source; bucket by
      // the Iceberg-spec bucket value), then `write.sort-columns` —
      // files carry TIGHT min/max bounds on the spec sources and the
      // sort columns (Iceberg's write.distribution-mode=range habit).
      // Partition count follows the session's shuffle setting;
      // compact() later re-bins to the target file size, re-clustered
      // by the same properties.
      val pspec = GraftCatalog.validatedPartitionSpec(s"$ns.$t", props, schema)
      // bucket-transform sources of the partition spec bloom-index
      // automatically — bucket pruning IS the bloom path
      val bloomCols = GraftCatalog.writeBloomColumnsOf(props, pspec)
      val clusterCols =
        pspec.map(GraftCatalog.partitionClusterColumn(_)) ++
        GraftCatalog.validatedSortColumns(s"$ns.$t", props, schema).map(col)
      val shaped =
        if (clusterCols.isEmpty) data
        else data.repartitionByRange(clusterCols: _*)
          .sortWithinPartitions(clusterCols: _*)
      // spec'd tables stage partition-ALIGNED (each file = one tuple);
      // the range clustering above keeps each task's tuples contiguous
      // so alignment splits, not fragments, the output
      if (overwrite) cat.commitReplace(ns, t, shaped, bloomCols = bloomCols,
        alignSpec = pspec.nonEmpty): Unit
      else cat.commitAppend(ns, t, shaped, bloomCols = bloomCols,
        alignSpec = pspec.nonEmpty): Unit
    }

  /** DELETE WHERE cond: re-read the CURRENT version at execution time,
    * keep the non-matching rows (null-cond rows survive — they do not
    * MATCH the predicate), publish as a replace CONDITIONAL on the
    * version that was read — a concurrent commit aborts the delete. */
  private def deleteWhereIn(ns: String, t: String): Column => Unit = cond => {
    val c = cat
    val cur = c.latest(ns, t).map(_.seq)
    c.commitReplace(ns, t, c.read(ns, t).filter(!cond || cond.isNull),
      expectedParentSeq = cur)
    ()
  }

  override def loadTable(ident: Identifier): Table = {
    // Iceberg-style METADATA TABLES: `SELECT * FROM graft.ns.t.history`
    // resolves here as namespace [ns, t] + name "history" — read-only
    // views over the commit log / manifests, no data files touched.
    // Schemas are STATIC (declared below, thunk stays lazy): resolving
    // .files must not list manifests at analysis time just for a schema
    if (ident.namespace().length == 2) {
      val Array(mns, mt) = ident.namespace()
      if (cat.tableExists(mns, mt)) {
        // WRITABLE branch view (Iceberg's `table.branch_<name>` habit):
        // `INSERT INTO graft.ns.t.branch_b` stages an append on the
        // branch, `SELECT` reads the branch head — the SQL-only staging
        // half of a multi-table transaction (publish with
        // CALL graft.system.commit_transaction) and of WAP. INSERT
        // OVERWRITE refuses: branches stage APPENDS; replace semantics
        // belong to main-table commits.
        if (ident.name().startsWith("branch_")) {
          val branch = ident.name().stripPrefix("branch_")
          if (cat.branchExists(mns, mt, branch)) {
            val head = cat.branchHead(mns, mt, branch)
            val schema = head.schemaJson
              .map(org.apache.spark.sql.types.DataType.fromJson(_)
                .asInstanceOf[StructType])
              .getOrElse(cat.readBranch(mns, mt, branch).schema)
            return new GraftV2Table(
              s"$catalogName.$mns.$mt.${ident.name()}",
              () => cat.readBranch(mns, mt, branch), schema,
              insert = Some((df, overwrite) => {
                require(!overwrite,
                  s"branch view $mns.$mt.${ident.name()} stages appends — " +
                    "INSERT INTO only, not INSERT OVERWRITE")
                cat.commitAppendToBranch(mns, mt, branch, df): Unit
              }))
          }
        }
        val entry: Option[(StructType, () => DataFrame)] = ident.name() match {
          case "history" | "snapshots" =>
            Some((GraftSparkCatalog.HistorySchema, () => cat.history(mns, mt)))
          case "files" =>
            // unlike the raw manifest union, the exposed table CARRIES
            // the content kind — a merge-on-read head lists its
            // equality-delete files as 'deletes', never disguised as
            // data (a storage-reconciling user must not double-count)
            Some((GraftSparkCatalog.FilesSchema, () => {
              val rows = cat.latest(mns, mt).toSeq.flatMap { snap =>
                cat.dataFileEntries(mns, mt, snap)
                  .map { case (p, sz) => Row(p, sz, "data") } ++
                cat.deleteFileEntries(mns, mt, snap)
                  .map { case (p, sz) => Row(p, sz, "deletes") }
              }
              spark.createDataFrame(
                spark.sparkContext.parallelize(rows, 1),
                GraftSparkCatalog.FilesSchema)
            }))
          case "manifests" =>
            // one row per manifest of the HEAD version (Iceberg's
            // `.manifests` habit): content kind, entry/size rollups, and
            // the seq that first published it (= added it — manifests
            // are immutable, so first appearance is authorship)
            Some((GraftSparkCatalog.ManifestsSchema, () => {
              val snaps = cat.snapshots(mns, mt)
              val addedAt: Map[String, Long] = {
                val m = scala.collection.mutable.Map.empty[String, Long]
                snaps.foreach(s => s.manifests.foreach(r =>
                  if (!m.contains(r)) m(r) = s.seq))
                m.toMap
              }
              val rows = snaps.lastOption.toSeq.flatMap { head =>
                cat.manifestsFull(mns, mt, head).map { case (rel, isDel, entries) =>
                  Row(rel, if (isDel) "deletes" else "data",
                    entries.size.toLong, entries.map(_.sizeBytes).sum,
                    addedAt(rel))
                }
              }
              spark.createDataFrame(
                spark.sparkContext.parallelize(rows, 1),
                GraftSparkCatalog.ManifestsSchema)
            }))
          case "refs" =>
            // every named ref (Iceberg's `.refs`): main, branches, tags
            Some((GraftSparkCatalog.RefsSchema, () => {
              val main = cat.latest(mns, mt).toSeq.map(s =>
                Row("main", "branch", s.seq, s.commitId))
              val branches = cat.listBranches(mns, mt).map { b =>
                val h = cat.branchHead(mns, mt, b)
                Row(b, "branch", h.seq, h.commitId)
              }
              val tags = cat.listTags(mns, mt).map { t0 =>
                val seq = cat.tagSeq(mns, mt, t0)
                Row(t0, "tag", seq,
                  cat.snapshots(mns, mt).find(_.seq == seq)
                    .map(_.commitId).orNull)
              }
              spark.createDataFrame(
                spark.sparkContext.parallelize(main ++ branches ++ tags, 1),
                GraftSparkCatalog.RefsSchema)
            }))
          case _ => None
        }
        entry.foreach { case (schema, thunk) =>
          return new GraftV2Table(
            s"$catalogName.$mns.$mt.${ident.name()}", thunk, schema)
        }
      }
    }
    val (ns, t) = (nsOf(ident), ident.name())
    if (!cat.tableExists(ns, t)) throw new NoSuchTableException(ident)
    // schema from the commit log when recorded; the data-path-resolving
    // read is DEFERRED so metadata-served statements (count/min/max
    // pushdown, DDL) never touch a data file
    val schema = cat.tableSchema(ns, t).getOrElse(cat.read(ns, t).schema)
    new GraftRowLevelTable(s"$catalogName.$ns.$t", () => cat.read(ns, t), schema,
      insert = Some(insertInto(ns, t)), delete = Some(deleteWhereIn(ns, t)),
      // metadata aggregates are only authoritative for the LATEST
      // version — time-travel loads don't get them
      meta = Some(GraftMetaAggs(
        () => cat.countFastOpt(ns, t), c => cat.minMaxFast(ns, t, c))),
      rowLevel = new GraftRowLevelContext(cat, ns, t))
  }

  /** VERSION AS OF <seq> */
  /** `VERSION AS OF x` — x is a SEQ number, a BRANCH name (reads the
    * branch head, the Iceberg branch-identifier habit), or a TAG name
    * (reads the tagged main version). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val (ns, t) = (nsOf(ident), ident.name())
    if (!cat.tableExists(ns, t)) throw new NoSuchTableException(ident)
    // resolution order: an all-digit string is FIRST a main-lineage seq
    // (numeric seqs shadow a branch/tag of the same name), but a MISSING
    // numeric seq falls back to the branch/tag lookup rather than
    // refusing a branch legitimately named '2024'
    def byRef: Option[cat.Snapshot] =
      if (cat.listBranches(ns, t).contains(version))
        Some(cat.branchHead(ns, t, version))
      else if (cat.listTags(ns, t).contains(version))
        Some(cat.snapshots(ns, t).find(_.seq == cat.tagSeq(ns, t, version))
          .getOrElse(throw new IllegalArgumentException(
            s"tag '$version' of $ns.$t points at an expired version")))
      else None
    val snap =
      if (version.nonEmpty && version.forall(_.isDigit))
        cat.snapshots(ns, t).find(_.seq == version.toLong)
          .orElse(byRef)
          .getOrElse(throw new IllegalArgumentException(
            s"no version, branch or tag '$version' on $ns.$t (numeric " +
              "names resolve as version seqs first, then branches/tags)"))
      else byRef.getOrElse(throw new IllegalArgumentException(
        s"no version, branch or tag '$version' on $ns.$t"))
    timeTravelTable(ns, t, s"$catalogName.$ns.$t@$version", snap)
  }

  /** TIMESTAMP AS OF <ts> — Spark passes MICROseconds since epoch. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val (ns, t) = (nsOf(ident), ident.name())
    if (!cat.tableExists(ns, t)) throw new NoSuchTableException(ident)
    val snap = cat.versionAsOfTimestamp(ns, t, timestampMicros / 1000L)
      .getOrElse(throw new IllegalArgumentException(
        s"no version of $ns.$t at or before $timestampMicros"))
    timeTravelTable(ns, t, s"$catalogName.$ns.$t@$timestampMicros", snap)
  }

  /** Read-only table pinned to one snapshot, filtered scans stats-pruned
    * against THAT snapshot's manifests. */
  private def timeTravelTable(ns: String, t: String, name: String,
                              snap: cat.Snapshot): Table = {
    // read the SNAPSHOT itself, never resolve by seq again: a branch
    // head lives on the branch log, where a main-lineage seq lookup
    // would miss it (or worse, hit an unrelated main version)
    val df = cat.readFilteredSnapshot(ns, t, snap, Array.empty)
    new GraftV2Table(name, () => df, df.schema,
      pruned = Some((fs: Array[Filter], _: Boolean) =>
        cat.readFilteredSnapshot(ns, t, snap, fs)),
      estimate = Some((fs: Array[Filter]) =>
        cat.estimateScanBytes(ns, t, snap, fs)),
      // time travel reads the VERSION'S OWN properties, like its schema
      props = snap.properties)
  }

  /** One SQL `PARTITIONED BY` transform → the catalog's canonical
    * partition field. Connector shapes accepted: identity references,
    * years/months/days/hours(col), bucket(n, col), truncate(w, col) —
    * width and column in either order (both spellings exist in the
    * wild). Anything else refuses with the supported list. */
  private def parsePartitionField(t: Transform,
      table: String): GraftCatalog.PartitionField = {
    import org.apache.spark.sql.connector.expressions.{Literal => CLiteral, NamedReference}
    def refOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case nr: NamedReference =>
          require(nr.fieldNames().length == 1,
            s"$table: nested partition source ${nr.fieldNames().mkString(".")} " +
              "is not supported — partition on a top-level column")
          Some(nr.fieldNames()(0))
        case _ => None
      }
    def intOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[Int] =
      e match {
        case l: CLiteral[_] => Some(l.value().toString.toInt)
        case _ => None
      }
    val args = t.arguments().toSeq
    def oneRef: String = args.flatMap(refOf).headOption.getOrElse(
      throw new UnsupportedOperationException(
        s"$table: partition transform ${t.describe()} names no column"))
    t.name() match {
      case "identity" => GraftCatalog.PartitionField("identity", oneRef)
      case "years" | "year" => GraftCatalog.PartitionField("year", oneRef)
      case "months" | "month" => GraftCatalog.PartitionField("month", oneRef)
      case "days" | "day" => GraftCatalog.PartitionField("day", oneRef)
      case "hours" | "hour" => GraftCatalog.PartitionField("hour", oneRef)
      case "bucket" | "truncate" =>
        val canonical = if (t.name() == "bucket") "bucket" else "truncate"
        val n = args.flatMap(intOf).headOption.getOrElse(
          throw new UnsupportedOperationException(
            s"$table: ${t.describe()} needs an integer " +
              (if (canonical == "bucket") "bucket count" else "width")))
        GraftCatalog.PartitionField(canonical, oneRef, n)
      case other => throw new UnsupportedOperationException(
        s"$table: unsupported partition transform '$other' — supported: " +
          "identity, bucket(n, col), truncate(w, col), years/months/days/" +
          "hours(col)")
    }
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    // PARTITIONED BY persists as the graft.partition-spec TBLPROPERTY
    // (versioned table state, honored by INSERT clustering, bloom
    // indexing, compact, and the Iceberg export's real partition spec)
    val specProps: Map[String, String] =
      if (partitions.isEmpty) Map.empty
      else {
        require(!properties.containsKey(GraftCatalog.PartitionSpecProp),
          s"declare partitioning via PARTITIONED BY or the " +
            s"${GraftCatalog.PartitionSpecProp} property, not both")
        val fields = partitions.toSeq.map(
          parsePartitionField(_, s"${nsOf(ident)}.${ident.name()}"))
        val dup = fields.map(_.source).diff(fields.map(_.source).distinct)
        require(dup.isEmpty,
          s"PARTITIONED BY references column(s) ${dup.distinct.mkString(", ")} " +
            "more than once")
        Map(GraftCatalog.PartitionSpecProp ->
          GraftCatalog.partitionSpecJson(fields))
      }
    // validate transform/type legality against the DECLARED schema NOW —
    // a bad DDL must refuse at CREATE, not at the first INSERT
    GraftCatalog.validatedPartitionSpec(s"${nsOf(ident)}.${ident.name()}",
      specProps ++ properties.asScala, Some(schema)): Unit
    cat.createTable(nsOf(ident), ident.name())
    // commit an EMPTY v0 carrying the declared schema — without it the
    // table reads as zero columns until the first insert, breaking the
    // canonical CREATE ... then INSERT/SELECT flow. All-or-nothing: a
    // failed v0 commit drops the just-registered table, so SQL CREATE
    // never leaves a schema-less half-created table behind
    try {
      cat.commitAppend(nsOf(ident), ident.name(),
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema))
      // CREATE TABLE ... TBLPROPERTIES: persist the USER's keys as a
      // second metadata commit (Spark rides reserved engine keys —
      // provider/location/owner/... — on the same map; those describe
      // the catalog, not the table, and are not table state)
      val userProps = (properties.asScala.toMap --
        GraftSparkCatalog.ReservedTableProps) ++ specProps
      if (userProps.nonEmpty)
        cat.commitProperties(nsOf(ident), ident.name(), userProps): Unit
    } catch { case e: Throwable =>
      try cat.dropTable(nsOf(ident), ident.name()) catch { case _: Throwable => () }
      throw e
    }
    new GraftV2Table(s"$catalogName.${nsOf(ident)}.${ident.name()}",
      () => spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema), schema,
      insert = Some(insertInto(nsOf(ident), ident.name())),
      props = cat.tableProperties(nsOf(ident), ident.name()))
  }

  /** ALTER TABLE as ONE metadata-only schema-evolution commit (a new
    * CAS-published version; time travel reads the pre-alter schema).
    * Supported: ADD COLUMN(S) (top-level, nullable — position honored),
    * DROP COLUMN (guarded against live equality deletes), ALTER COLUMN
    * TYPE along the Iceberg promotion lattice, nullability loosening,
    * column comments (ADD ... COMMENT / ALTER ... COMMENT — StructField
    * models them natively), and RENAME COLUMN — metadata-only via the
    * column-mapping layer: the field keeps its stable PHYSICAL (parquet)
    * name ([[GraftCatalog.PhysicalKey]] StructField metadata) and only
    * the logical name changes, so no committed file is rewritten and
    * time travel reads each version under its own names (the same trick
    * Delta's column-mapping mode plays; Iceberg gets it from field-ids).
    * An ADD COLUMN whose name is the parked physical name of a renamed
    * sibling gets a FRESH physical name — the logical namespace stays
    * free while the physical bytes stay owned. SET/UNSET TBLPROPERTIES
    * commit through [[GraftCatalog.commitProperties]] — versioned like
    * the schema, consulted by compact() and the INSERT bloom path. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val (ns, t) = (nsOf(ident), ident.name())
    if (!cat.tableExists(ns, t)) throw new NoSuchTableException(ident)
    // SET/UNSET TBLPROPERTIES: one metadata-only properties commit,
    // versioned like the schema. Spark sends a pure-property ALTER as
    // property changes only, so the schema path below is untouched
    val (propChanges, schemaChanges) = changes.partition {
      case _: TableChange.SetProperty | _: TableChange.RemoveProperty => true
      case _ => false
    }
    val sets = propChanges.collect {
      case sp: TableChange.SetProperty => sp.property() -> sp.value() }.toMap
    val unsets = propChanges.collect {
      case rp: TableChange.RemoveProperty => rp.property() }
    // a pure-property ALTER is one properties commit; a MIXED batch
    // (schema + properties — reachable via the DSv2 API) folds the
    // property changes into the schema-evolution CAS below, so one
    // ALTER is ONE version and a failed schema half never leaves the
    // property half already published
    if (schemaChanges.isEmpty) {
      if (propChanges.nonEmpty) cat.commitProperties(ns, t, sets, unsets): Unit
      return loadTable(ident)
    }
    val prev = cat.tableSchema(ns, t).getOrElse(throw new IllegalStateException(
      s"$ns.$t records no schema to alter — insert data first"))
    var fields: Vector[org.apache.spark.sql.types.StructField] = prev.fields.toVector
    def idx(name: Array[String]): Int = {
      require(name.length == 1,
        s"nested column ${name.mkString(".")}: graft schemas are flat")
      val i = fields.indexWhere(_.name == name(0))
      require(i >= 0, s"no such column ${name(0)} in $ns.$t")
      i
    }
    schemaChanges.foreach {
      case a: TableChange.AddColumn =>
        require(a.fieldNames().length == 1,
          s"nested column ${a.fieldNames().mkString(".")}: graft schemas are flat")
        require(a.isNullable,
          s"new column ${a.fieldNames()(0)} must be nullable — existing rows " +
            "cannot supply a value")
        val f0 = org.apache.spark.sql.types.StructField(
          a.fieldNames()(0), a.dataType(), nullable = true)
        // a comment riding on the ADD is schema metadata — keep it
        // (StructField models comments natively), never drop silently
        val f1 = Option(a.comment()).map(f0.withComment).getOrElse(f0)
        // the logical name may be free while its PHYSICAL name is still
        // owned (a renamed sibling parked there, or a dropped column's
        // bytes are live) — park the NEW column under a fresh physical
        // name so old files simply read it as null
        val ownedPhys = fields.map(GraftCatalog.physicalName).toSet
        val f =
          if (ownedPhys(f1.name))
            GraftCatalog.withPhysical(f1,
              s"${f1.name}_${java.util.UUID.randomUUID().toString.take(8)}")
          else f1
        require(!fields.exists(_.name == f.name), s"column ${f.name} already exists")
        val at = a.position() match {
          case null => fields.size
          case _: TableChange.First => 0
          case after: TableChange.After => idx(Array(after.column())) + 1
          case other => throw new UnsupportedOperationException(
            s"unsupported column position $other")
        }
        fields = (fields.take(at) :+ f) ++ fields.drop(at)
      case d: TableChange.DeleteColumn =>
        fields = fields.patch(idx(d.fieldNames()), Nil, 1)
      case u: TableChange.UpdateColumnType =>
        val i = idx(u.fieldNames())
        fields = fields.updated(i, fields(i).copy(dataType = u.newDataType()))
      case n: TableChange.UpdateColumnNullability =>
        require(n.nullable(),
          s"cannot tighten ${n.fieldNames()(0)} to NOT NULL: existing files " +
            "are not re-validated")
        val i = idx(n.fieldNames())
        fields = fields.updated(i, fields(i).copy(nullable = true))
      case cm: TableChange.UpdateColumnComment =>
        val i = idx(cm.fieldNames())
        fields = fields.updated(i, fields(i).withComment(cm.newComment()))
      case r: TableChange.RenameColumn =>
        val i = idx(r.fieldNames())
        val f = fields(i)
        require(!fields.exists(_.name == r.newName()),
          s"column ${r.newName()} already exists in $ns.$t")
        // pin the CURRENT physical name (a first rename pins the original
        // name; a re-rename keeps the original pin) — committed files
        // keep serving reads unrewritten
        fields = fields.updated(i,
          GraftCatalog.withPhysical(f, GraftCatalog.physicalName(f))
            .copy(name = r.newName()))
      case other =>
        throw new UnsupportedOperationException(
          s"unsupported ALTER TABLE change $other: graft models schema " +
            "(incl. column comments, renames) and TBLPROPERTIES only")
    }
    // expectedPrev: a concurrent schema change aborts THIS statement
    // loudly instead of being overwritten (validated inside the CAS)
    cat.commitSchemaEvolution(ns, t, StructType(fields), expectedPrev = Some(prev),
      propsSet = sets, propsUnset = unsets)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val (ns, t) = (nsOf(ident), ident.name())
    if (!cat.tableExists(ns, t)) false
    else { cat.dropTable(ns, t); true }
  }

  /** `ALTER TABLE ... RENAME TO ...` — one atomic directory move (the
    * table's whole versioned state is self-contained under its
    * directory; see [[GraftCatalog.renameTable]]). */
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!cat.tableExists(nsOf(oldIdent), oldIdent.name()))
      throw new NoSuchTableException(oldIdent)
    cat.renameTable(nsOf(oldIdent), oldIdent.name(),
      nsOf(newIdent), newIdent.name())
  }

  // ---- stored procedures: CALL graft.system.<proc>(...) ----
  // (GraftProcedures — compact / expire_snapshots / rollback /
  // iceberg_export / iceberg_import, each one transactional catalog op)

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    GraftProcedures.load(cat, ident).getOrElse(
      throw new RuntimeException(
        s"no such procedure ${ident.namespace().mkString(".")}.${ident.name()} — " +
          s"available: ${GraftProcedures.list(Array("system")).map(_.name()).mkString(", ")}"))

  override def listProcedures(namespace: Array[String]): Array[Identifier] = {
    // contract parity with listTables: an unknown namespace is an
    // error, not an empty listing that masks a typo
    if (namespace.nonEmpty && !namespace.sameElements(Array("system")))
      throw new NoSuchNamespaceException(namespace)
    GraftProcedures.list(namespace)
  }

  // ---- namespaces: one directory level under the warehouse root ----

  private def nsDir(ns: Array[String]) =
    java.nio.file.Paths.get(warehouse, ns.mkString("/"))

  override def listNamespaces(): Array[Array[String]] = {
    val root = java.nio.file.Paths.get(warehouse)
    if (!java.nio.file.Files.isDirectory(root)) return Array.empty
    val it = java.nio.file.Files.list(root).iterator()
    val out = Array.newBuilder[Array[String]]
    while (it.hasNext) {
      val p = it.next()
      val n = p.getFileName.toString
      if (java.nio.file.Files.isDirectory(p) && !n.startsWith(".") && !n.startsWith("_"))
        out += Array(n)
    }
    out.result().sortBy(_.mkString)
  }

  override def listNamespaces(parent: Array[String]): Array[Array[String]] =
    if (parent.isEmpty) listNamespaces()
    else if (namespaceExists(parent)) Array.empty // single-level namespaces
    else throw new NoSuchNamespaceException(parent)

  override def namespaceExists(ns: Array[String]): Boolean =
    ns.length == 1 && java.nio.file.Files.isDirectory(nsDir(ns))

  // namespace properties persist in a sidecar JSON under the namespace
  // dir (underscore-prefixed: never a table name — listTables filters
  // non-directories and _-names). Writes go tmp + ATOMIC_MOVE; two
  // racing property ALTERs are last-writer-wins at map granularity —
  // namespace properties are operator configuration, not versioned
  // table state (those ride the commit log, commitProperties)
  private def nsPropsFile(ns: Array[String]) =
    nsDir(ns).resolve("_ns_properties.json")

  private def readNsProps(ns: Array[String]): Map[String, String] = {
    val f = nsPropsFile(ns)
    if (!java.nio.file.Files.exists(f)) Map.empty
    else GraftCatalog.propsMapper
      .readTree(java.nio.file.Files.readAllBytes(f))
      .properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
  }

  private def writeNsProps(ns: Array[String], props: Map[String, String]): Unit = {
    val f = nsPropsFile(ns)
    if (props.isEmpty) { java.nio.file.Files.deleteIfExists(f); () }
    else {
      val tm = new java.util.TreeMap[String, String]()
      props.foreach { case (k, v) => tm.put(k, v) }
      val tmp = f.resolveSibling(s".tmp-nsprops-${java.util.UUID.randomUUID()}")
      java.nio.file.Files.write(tmp,
        GraftCatalog.propsMapper.writeValueAsBytes(tm))
      java.nio.file.Files.move(tmp, f,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
    }
  }

  override def loadNamespaceMetadata(ns: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(ns)) throw new NoSuchNamespaceException(ns)
    val m = new util.HashMap[String, String]()
    readNsProps(ns).foreach { case (k, v) => m.put(k, v) }
    m.put(SupportsNamespaces.PROP_LOCATION, nsDir(ns).toString)
    m
  }

  override def createNamespace(ns: Array[String],
                               metadata: util.Map[String, String]): Unit = {
    require(ns.length == 1, s"graft namespaces are single-level: ${ns.mkString(".")}")
    java.nio.file.Files.createDirectories(nsDir(ns)): Unit
    // location is derived (the directory itself); everything else —
    // comment, owner, user keys — persists
    val user = metadata.asScala.toMap - SupportsNamespaces.PROP_LOCATION
    if (user.nonEmpty) writeNsProps(ns, user)
  }

  override def alterNamespace(ns: Array[String], changes: NamespaceChange*): Unit = {
    if (!namespaceExists(ns)) throw new NoSuchNamespaceException(ns)
    val next = changes.foldLeft(readNsProps(ns)) {
      case (m, sp: NamespaceChange.SetProperty) => m + (sp.property() -> sp.value())
      case (m, rp: NamespaceChange.RemoveProperty) => m - rp.property()
      case (_, other) => throw new UnsupportedOperationException(
        s"unsupported namespace change $other")
    }
    writeNsProps(ns, next - SupportsNamespaces.PROP_LOCATION)
  }

  override def dropNamespace(ns: Array[String], cascade: Boolean): Boolean = {
    if (!namespaceExists(ns)) return false
    val tables = cat.listTables(ns(0))
    if (tables.nonEmpty && !cascade)
      throw new org.apache.spark.sql.catalyst.analysis.NonEmptyNamespaceException(ns)
    tables.foreach(t => cat.dropTable(ns(0), t))
    // remove the now-empty namespace dir (and any stray empties inside)
    val d = nsDir(ns)
    java.nio.file.Files.walk(d).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.deleteIfExists(p): Unit)
    true
  }

  // ---- persistent views (ViewCatalog) ----
  // CREATE/ALTER/DROP/SHOW VIEW against this catalog PERSIST in the
  // warehouse (GraftCatalog.createView — versioned sidecar JSON under
  // <ns>/_views/), so a view OUTLIVES the session that created it: a
  // fresh session or another process mounting the same warehouse
  // resolves and reads it like any engine view. The stored definition
  // carries the SQL text plus the full resolution context Spark's
  // analyzer replays (defining catalog + namespace, declared schema,
  // query column names, aliases, comments, properties).
  //
  // Reference basis: the design docs query inventories through engine
  // views (iceberg-arch-geo-distributed-ha.md:1206-1222 — Athena/
  // BigQuery view DDL over the control-plane tables).

  import org.apache.spark.sql.catalyst.analysis.{NoSuchViewException, ViewAlreadyExistsException}

  private def nsOfView(ident: Identifier): String = {
    if (ident.namespace().length != 1) throw new NoSuchViewException(ident)
    ident.namespace()(0)
  }

  override def listViews(namespace: String*): Array[Identifier] = {
    if (namespace.length != 1)
      throw new NoSuchNamespaceException(namespace.toArray)
    cat.listViews(namespace.head)
      .map(Identifier.of(namespace.toArray, _)).toArray
  }

  override def viewExists(ident: Identifier): Boolean =
    ident.namespace().length == 1 &&
      cat.viewExists(ident.namespace()(0), ident.name())

  override def loadView(ident: Identifier): View = {
    val ns = nsOfView(ident)
    val json = cat.loadViewJson(ns, ident.name())
      .getOrElse(throw new NoSuchViewException(ident))
    GraftSparkCatalog.parseView(ident.name(), json)
  }

  override def createView(info: ViewInfo): View = {
    val ns = nsOfView(info.ident)
    if (cat.viewExists(ns, info.ident.name()))
      throw new ViewAlreadyExistsException(info.ident)
    cat.createView(ns, info.ident.name(),
      GraftSparkCatalog.viewJson(info), replace = false)
    loadView(info.ident)
  }

  override def replaceView(info: ViewInfo, orCreate: Boolean): View = {
    val ns = nsOfView(info.ident)
    if (!orCreate && !cat.viewExists(ns, info.ident.name()))
      throw new NoSuchViewException(info.ident)
    // one new VERSION of the same view (atomic publish) — never the
    // default drop-then-create, whose failure window loses the view
    cat.createView(ns, info.ident.name(),
      GraftSparkCatalog.viewJson(info), replace = true)
    loadView(info.ident)
  }

  override def alterView(ident: Identifier, changes: ViewChange*): View = {
    val ns = nsOfView(ident)
    val cur = cat.loadViewJson(ns, ident.name())
      .getOrElse(throw new NoSuchViewException(ident))
    val next = changes.foldLeft(cur) { (j, ch) =>
      ch match {
        case s: ViewChange.SetProperty =>
          GraftSparkCatalog.viewJsonWithProps(j, _ + (s.property -> s.value))
        case r: ViewChange.RemoveProperty =>
          GraftSparkCatalog.viewJsonWithProps(j, _ - r.property)
        case other => throw new IllegalArgumentException(
          s"unsupported view change $other")
      }
    }
    cat.createView(ns, ident.name(), next, replace = true)
    loadView(ident)
  }

  override def dropView(ident: Identifier): Boolean =
    ident.namespace().length == 1 &&
      cat.dropView(ident.namespace()(0), ident.name())

  override def renameView(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val (ons, nns) = (nsOfView(oldIdent), nsOfView(newIdent))
    if (!cat.viewExists(ons, oldIdent.name()))
      throw new NoSuchViewException(oldIdent)
    if (cat.viewExists(nns, newIdent.name()) ||
        cat.tableExists(nns, newIdent.name()))
      throw new ViewAlreadyExistsException(newIdent)
    cat.renameView(ons, oldIdent.name(), nns, newIdent.name())
  }
}

/** A readable + insertable graft table: schema from the catalog's
  * (version-correct) DataFrame plan; scans bridge through V1Scan with
  * pruning/pushdown forwarded into that plan; INSERTs bridge through
  * V1Write onto the TRANSACTIONAL commit path — `INSERT INTO` is one
  * atomic commitAppend (a new CAS-published version), `INSERT
  * OVERWRITE` one commitReplace. Time-travel tables are read-only
  * (`writable = false`): inserting "into the past" would silently
  * target the LATEST version. */
/** Driver-side metadata aggregate accessors for the pushdown path. */
private[catalog] case class GraftMetaAggs(count: () => Option[Long],
                                          minMax: String => Option[(String, String)])

private[catalog] class GraftV2Table(tableName: String, dfThunk: () => DataFrame,
                                    tableSchema: StructType,
                                    insert: Option[(DataFrame, Boolean) => Unit] = None,
                                    delete: Option[Column => Unit] = None,
                                    meta: Option[GraftMetaAggs] = None,
                                    pruned: Option[(Array[Filter], Boolean) => DataFrame] = None,
                                    estimate: Option[Array[Filter] => Long] = None,
                                    props: Map[String, String] = Map.empty)
    extends Table with SupportsRead with SupportsWrite with SupportsDelete {

  /** TBLPROPERTIES from the commit log (SHOW TBLPROPERTIES / DESCRIBE
    * EXTENDED read this). */
  override def properties(): util.Map[String, String] = {
    val m = new util.HashMap[String, String]()
    props.foreach { case (k, v) => m.put(k, v) }
    m
  }

  /** `DELETE FROM ... WHERE <cond>`: accepted only when every filter
    * translates (canDeleteWhere — Spark raises an analysis error
    * otherwise, never a partial delete), then executed by the catalog
    * closure as ONE atomic CAS-conditional replace of the CURRENT
    * version with the surviving rows: fully transactional, CDC-visible,
    * time-travel-reversible, and a concurrent commit aborts the delete
    * loudly instead of being silently dropped. An empty filter array is
    * SQL TRUNCATE semantics — keep nothing. */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    delete.isDefined && filters.forall(f => GraftScanBuilder.toColumn(f).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    val cond = filters.flatMap(GraftScanBuilder.toColumn(_).toSeq)
      .reduceOption(_ && _).getOrElse(lit(true))
    delete.getOrElse(throw new UnsupportedOperationException(
      s"$tableName is read-only (time travel)"))(cond)
  }

  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    if (insert.isDefined)
      util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
        TableCapability.TRUNCATE)
    else util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(dfThunk, tableSchema, meta, pruned, estimate)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = new V1Write {
        // alias: inside InsertableRelation the name `insert` is the
        // method being defined, not the table's insert closure
        private val doInsert = GraftV2Table.this.insert
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, legacyOverwrite: Boolean): Unit =
              doInsert.getOrElse(throw new UnsupportedOperationException(
                s"$tableName is read-only (time travel)"))(data, overwrite)
          }
      }
    }
}

/** The latest-version writable table, which additionally speaks Spark's
  * row-level SQL (UPDATE / MERGE INTO / subquery DELETE) — group-based
  * copy-on-write at file granularity, see [[GraftCowOperation]]. A
  * SEPARATE subclass rather than a capability flag because advertising
  * `SupportsRowLevelOperations` changes how the analyzer routes DELETE
  * for every instance — time-travel and metadata tables must keep
  * their plain read-only analysis errors. (Simple DELETEs still take
  * the metadata path: Spark's optimizer converts a rewrite back to
  * `deleteWhere` when every filter translates.) */
private[catalog] final class GraftRowLevelTable(
    tableName: String, dfThunk: () => DataFrame, tableSchema: StructType,
    insert: Option[(DataFrame, Boolean) => Unit],
    delete: Option[Column => Unit],
    meta: Option[GraftMetaAggs],
    rowLevel: GraftRowLevelContext)
  extends GraftV2Table(tableName, dfThunk, tableSchema, insert, delete, meta,
    // one read closure serves BOTH the plain filtered scan and the
    // lineage (metadata-column) scan: stats-pruned by the pushed
    // filters, full when none pushed — see GraftScanBuilder.build
    pruned = Some((fs, lineage) =>
      rowLevel.cat.readFilteredLatest(rowLevel.ns, rowLevel.name, fs, lineage)),
    estimate = Some(fs => rowLevel.cat.latest(rowLevel.ns, rowLevel.name)
      .map(s => rowLevel.cat.estimateScanBytes(rowLevel.ns, rowLevel.name, s, fs))
      .getOrElse(0L)),
    props = rowLevel.cat.tableProperties(rowLevel.ns, rowLevel.name))
  with SupportsRowLevelOperations with SupportsMetadataColumns {

  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    new GraftCowOperationBuilder(rowLevel, info)

  /** Conditional DELETEs route through the ROW-LEVEL machinery —
    * file-granular copy-on-write (or O(changed rows) merge-on-read
    * deltas), stats-pruned and runtime-group-filtered — by refusing the
    * metadata path here: the metadata closure's one implementation is a
    * whole-table conditional REPLACE, which at 100 TB is exactly the
    * rewrite the row-level path exists to avoid (and in merge-on-read
    * mode it would break the mode's O(changed rows) contract). The
    * metadata path keeps only the shape it serves without reading data:
    * the WHERE-less truncate (AlwaysTrue). */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    super.canDeleteWhere(filters) &&
      filters.forall(_ == org.apache.spark.sql.sources.AlwaysTrue())

  /** Row lineage, the Iceberg `_file`/`_pos` habit — served by the
    * scan's lineage thunk for plain SELECTs and REQUIRED by the COW
    * operation (see GraftCowOperation.requiredMetadataAttributes).
    * A table whose DATA schema already uses a lineage name keeps its
    * own column (the metadata twin is not advertised — row-level ops
    * on such a table refuse at planning, see GraftCowOperationBuilder). */
  override def metadataColumns(): Array[MetadataColumn] = Array[MetadataColumn](
    GraftMetaColumn("_file", org.apache.spark.sql.types.StringType,
      "manifest-relative data file holding the row"),
    GraftMetaColumn("_pos", org.apache.spark.sql.types.LongType,
      "row ordinal within _file"))
    .filterNot(m => tableSchema.fieldNames.contains(m.name()))
}

private[catalog] case class GraftMetaColumn(colName: String,
                                            colType: org.apache.spark.sql.types.DataType,
                                            colComment: String)
    extends MetadataColumn {
  override def name(): String = colName
  override def dataType(): org.apache.spark.sql.types.DataType = colType
  // NON-nullable: delta-mode row IDs must be (NULLABLE_ROW_ID check);
  // declared preserved on update/delete so the rewrites never nullify
  // lineage (the writers don't read it back, but the plan must not
  // assign null into a non-nullable attribute)
  override def isNullable: Boolean = false
  override def comment(): String = colComment
  override def metadataInJSON(): String =
    s"""{"${MetadataColumn.PRESERVE_ON_UPDATE}": true,
       | "${MetadataColumn.PRESERVE_ON_DELETE}": true}""".stripMargin
}

private[catalog] class GraftScanBuilder(dfThunk: () => DataFrame,
                                        tableSchema: StructType,
                                        meta: Option[GraftMetaAggs] = None,
                                        pruned: Option[(Array[Filter], Boolean) => DataFrame] = None,
                                        estimate: Option[Array[Filter] => Long] = None)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {

  // data paths resolve only when a REAL scan is built — metadata-served
  // aggregates never touch this
  private lazy val df: DataFrame = dfThunk()
  private var pushed: Array[Filter] = Array.empty
  // ALL pushed filters, translatable or not — the manifest-stats file
  // pruner (`pruned`) evaluates shapes the Column translation can't
  // and stays conservative on the rest
  private var allFilters: Array[Filter] = Array.empty
  private var required: StructType = tableSchema
  private var aggResult: Option[DataFrame] = None

  /** COUNT(*)/MIN/MAX with no grouping and no filters answer from the
    * MANIFESTS (countFastOpt/minMaxFast — zero data reads), the Iceberg
    * aggregate pushdown. Claimed ONLY when metadata is authoritative:
    * latest version, no delete manifests, every file stat-bearing, no
    * pushed filters (metadata ignores them), bounds parseable. Complete
    * pushdown — Spark consumes the single row as the final result. */
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    tryMetaAgg(agg).isDefined

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    tryMetaAgg(agg) match {
      case Some(result) =>
        aggResult = Some(result); required = result.schema; true
      case None => false
    }

  private def tryMetaAgg(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[DataFrame] = {
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    import org.apache.spark.sql.connector.expressions.NamedReference
    def fieldOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case nr: NamedReference if nr.fieldNames().length == 1 =>
          Some(nr.fieldNames()(0))
        case _ => None
      }
    if (meta.isEmpty || pushed.nonEmpty || agg.groupByExpressions().nonEmpty) return None
    val m = meta.get
    val cols: Seq[Option[Column]] = agg.aggregateExpressions().toSeq.map {
      case _: CountStar => m.count().map(lit(_).as("cnt"))
      case mn: Min => fieldOf(mn.column()).flatMap { f =>
        val dt = tableSchema.fields.find(_.name == f).map(_.dataType)
        m.minMax(f).flatMap(b => dt.map(t => lit(b._1).cast(t).as(s"min_$f")))
      }
      case mx: Max => fieldOf(mx.column()).flatMap { f =>
        val dt = tableSchema.fields.find(_.name == f).map(_.dataType)
        m.minMax(f).flatMap(b => dt.map(t => lit(b._2).cast(t).as(s"max_$f")))
      }
      case _ => None
    }
    if (cols.isEmpty || cols.exists(_.isEmpty)) None
    else Some(SparkSession.active.range(1).select(cols.map(_.get): _*))
  }

  /** Translatable filters are applied to the inner plan (reaching the
    * parquet scan) but ALSO returned as residuals — Spark re-evaluates
    * them above the scan, so partial translation is always safe. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    allFilters = filters
    pushed = filters.filter(f => GraftScanBuilder.toColumn(f).isDefined)
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    if (aggResult.isEmpty) {
      // Spark 4 prunes NESTED fields too (`SELECT meta._2` arrives as
      // meta: struct<_2>); the V1 row bridge re-encodes the inner plan's
      // FULL struct values against readSchema, so a nested-pruned field
      // widens back to its declared type — this scan prunes TOP-LEVEL
      // columns only (metadata lineage columns keep their pushed shape)
      required = StructType(requiredSchema.fields.map { f =>
        tableSchema.fields.find(_.name == f.name).getOrElse(f)
      })
    }

  override def build(): Scan = {
    val requiredNames = required.fieldNames.toSeq
    // the metadata-served branch must not force the lazy df (it would
    // resolve data paths a metadata answer never needs)
    val inner = aggResult.getOrElse {
      // a scan referencing the lineage METADATA columns reads through
      // the lineage thunk (position-carrying MoR scan) instead — but a
      // DATA column that happens to be named _file/_pos stays on the
      // plain path (the lineage twin is not advertised for it, and the
      // rename inside the thunk would collide). Filtered scans route
      // through the manifest-stats file pruner when the table provides
      // one — same file set the readWhere family would plan.
      val lineageRead = requiredNames.exists(n =>
        (n == "_file" || n == "_pos") && !tableSchema.fieldNames.contains(n))
      val base =
        if (lineageRead)
          pruned.map(_(allFilters, true)).getOrElse(sys.error(
            s"lineage columns required but the table serves no lineage read"))
        else if (allFilters.nonEmpty && pruned.isDefined) pruned.get(allFilters, false)
        else df
      val inner0 = pushed.foldLeft(base)((d, f) =>
        GraftScanBuilder.toColumn(f).map(d.filter).getOrElse(d))
      // a fully-pruned scan (count(*)) selects ZERO columns — legal: the
      // rdd yields empty Rows, preserving only the row count
      inner0.select(requiredNames.map(col): _*)
    }
    // planner statistics (SupportsReportStatistics — the hook V2 scan
    // relations actually read at optimization): the manifests know
    // exactly how many bytes the stats-pruned scan will touch. Reported
    // instead of Spark's never-broadcast defaultSizeInBytes, so a dim
    // table — or a fact side pruned to one file — gets cost-based join
    // treatment (broadcast under the threshold). Row count rides along
    // when metadata is authoritative and no filter distorts it.
    // Metadata-only: cached manifests answer, no file opened.
    val estBytes: Option[Long] =
      if (aggResult.isDefined) Some(1024L) else estimate.map(_(allFilters))
    val estRows: Option[Long] =
      if (aggResult.isDefined) Some(1L)
      else if (allFilters.isEmpty) meta.flatMap(_.count())
      else None
    new V1Scan with org.apache.spark.sql.connector.read.SupportsReportStatistics {
      override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
        new org.apache.spark.sql.connector.read.Statistics {
          override def sizeInBytes(): java.util.OptionalLong =
            estBytes.map(java.util.OptionalLong.of)
              .getOrElse(java.util.OptionalLong.empty())
          override def numRows(): java.util.OptionalLong =
            estRows.map(java.util.OptionalLong.of)
              .getOrElse(java.util.OptionalLong.empty())
        }
      override def readSchema(): StructType = required
      override def toV1TableScan[T <: BaseRelation with TableScan](
          context: SQLContext): T =
        new BaseRelation with TableScan {
          override def sqlContext: SQLContext = context
          override def schema: StructType = required
          override def sizeInBytes: Long =
            estBytes.getOrElse(super.sizeInBytes)
          override def buildScan(): RDD[Row] = inner.rdd
        }.asInstanceOf[T]
    }
  }
}

/** Planner-statistics carrier for the V1 scan bridge. Spark's
  * `V1ScanWrapper` drops `SupportsReportStatistics` on the floor
  * (DataSourceV2ScanRelation.computeStats checks the WRAPPER, which
  * never implements it), so every V1-bridged graft read would plan
  * with the never-broadcast `defaultSizeInBytes`. This leaf re-attaches
  * the manifest-derived (stats-pruned) size so JoinSelection makes
  * cost-based choices; [[GraftStatsStrategy]] plans it straight back
  * to the wrapped relation — zero execution footprint. */
private[graft] case class GraftStatsRelation(
    relation: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
    bytes: BigInt, rows: Option[BigInt])
    extends org.apache.spark.sql.catalyst.plans.logical.LeafNode {
  override def output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    relation.output
  override def computeStats(): org.apache.spark.sql.catalyst.plans.logical.Statistics =
    org.apache.spark.sql.catalyst.plans.logical.Statistics(
      sizeInBytes = bytes, rowCount = rows)
}

/** Late optimizer rule (installed with GraftCowScanSubstitution): wrap
  * every V1-bridged graft scan whose underlying scan reports statistics
  * in a [[GraftStatsRelation]]. Runs in the last optimizer batch — after
  * pruning/pushdown fixed the scan, before physical planning reads the
  * stats. The relation rides INSIDE the leaf (not as a child), so the
  * rule is trivially idempotent. */
private[graft] object GraftStatsInjection
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, LogicalPlan}
  import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, V1ScanWrapper}

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // command TABLE slots must stay verbatim relations —
    // DataSourceV2Strategy pattern-matches them (a wrapped
    // DeleteFromTable target is an internal error); stats only matter
    // in query subtrees anyway
    val held = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]())
    plan.foreach {
      case d: DeleteFromTable => held.add(d.table): Unit
      case _ => ()
    }
    plan.transform {
      case rel: DataSourceV2ScanRelation
          if !held.contains(rel) && rel.scan.isInstanceOf[V1ScanWrapper] =>
        rel.scan.asInstanceOf[V1ScanWrapper].v1Scan match {
          case s: org.apache.spark.sql.connector.read.SupportsReportStatistics =>
            val st = s.estimateStatistics()
            if (st.sizeInBytes.isPresent)
              GraftStatsRelation(rel, BigInt(st.sizeInBytes.getAsLong),
                if (st.numRows().isPresent) Some(BigInt(st.numRows().getAsLong))
                else None)
            else rel
          case _ => rel
        }
    }
  }
}

/** Plans [[GraftStatsRelation]] back to its wrapped relation. */
private[graft] object GraftStatsStrategy
    extends org.apache.spark.sql.execution.SparkStrategy {
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.execution.SparkPlan
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GraftStatsRelation(rel, _, _) => Seq(planLater(rel))
    case _ => Nil
  }
}

object GraftSparkCatalog {
  import org.apache.spark.sql.types.{LongType, StringType, StructField}

  // ---- view definition (de)serialization ----

  private val viewMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private[catalog] def viewJson(info: org.apache.spark.sql.connector.catalog.ViewInfo): String = {
    val o = viewMapper.createObjectNode()
    o.put("sql", info.sql): Unit
    o.put("currentCatalog", info.currentCatalog): Unit
    o.put("schemaJson", info.schema.json): Unit
    def arr(k: String, vs: Array[String]): Unit = {
      val a = o.putArray(k)
      vs.foreach(v => if (v == null) a.addNull(): Unit else a.add(v): Unit)
    }
    arr("currentNamespace", info.currentNamespace)
    arr("queryColumnNames", info.queryColumnNames)
    arr("columnAliases", info.columnAliases)
    arr("columnComments", info.columnComments)
    val p = o.putObject("properties")
    info.properties.asScala.foreach { case (k, v) => p.put(k, v): Unit }
    viewMapper.writeValueAsString(o)
  }

  /** Rewrite only the `properties` object of a stored view JSON. */
  private[catalog] def viewJsonWithProps(json: String,
      f: Map[String, String] => Map[String, String]): String = {
    val o = viewMapper.readTree(json)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val cur = Option(o.get("properties")).map(_.properties().asScala
      .map(e => e.getKey -> e.getValue.asText()).toMap).getOrElse(Map.empty)
    val p = o.putObject("properties")
    f(cur).foreach { case (k, v) => p.put(k, v): Unit }
    viewMapper.writeValueAsString(o)
  }

  private[catalog] def parseView(viewName: String, json: String)
      : org.apache.spark.sql.connector.catalog.View = {
    val o = viewMapper.readTree(json)
    def arr(k: String): Array[String] =
      Option(o.get(k)).map(_.elements().asScala.map(n =>
        if (n.isNull) null else n.asText()).toArray).getOrElse(Array.empty)
    new GraftView(
      viewName,
      o.get("sql").asText(),
      o.get("currentCatalog").asText(),
      arr("currentNamespace"),
      org.apache.spark.sql.types.DataType.fromJson(
        o.get("schemaJson").asText()).asInstanceOf[StructType],
      arr("queryColumnNames"),
      arr("columnAliases"),
      arr("columnComments"),
      Option(o.get("properties")).map(_.properties().asScala
        .map(e => e.getKey -> e.getValue.asText()).toMap).getOrElse(Map.empty))
  }

  /** Spark rides engine-reserved keys on the CREATE TABLE properties
    * map; they describe the catalog entry, not versioned table state. */
  private[catalog] val ReservedTableProps: Set[String] =
    Set(TableCatalog.PROP_PROVIDER, TableCatalog.PROP_LOCATION,
      TableCatalog.PROP_COMMENT, TableCatalog.PROP_OWNER,
      TableCatalog.PROP_EXTERNAL, TableCatalog.PROP_IS_MANAGED_LOCATION)

  /** Static schemas of the metadata tables (resolution must not touch
    * the log or the manifests just to answer DESCRIBE). */
  private[catalog] val HistorySchema = StructType(Seq(
    StructField("seq", LongType), StructField("commit_id", StringType),
    StructField("parent_id", StringType), StructField("timestamp_ms", LongType),
    StructField("file_cnt", LongType), StructField("source_region", StringType)))
  private[catalog] val FilesSchema = StructType(Seq(
    StructField("path", StringType), StructField("size_bytes", LongType),
    StructField("content", StringType)))
  private[catalog] val ManifestsSchema = StructType(Seq(
    StructField("path", StringType), StructField("content", StringType),
    StructField("file_cnt", LongType), StructField("total_size_bytes", LongType),
    StructField("added_at_seq", LongType)))
  private[catalog] val RefsSchema = StructType(Seq(
    StructField("name", StringType), StructField("type", StringType),
    StructField("seq", LongType), StructField("commit_id", StringType)))

  /** Register (idempotently) a session catalog over `warehouse` and
    * return its name. The name derives from the warehouse path because
    * catalog plugins are CACHED by name per session — a fixed name
    * would silently keep serving the first warehouse it saw. Call this
    * on EVERY use, not once: the conf is per-SparkSession, so a second
    * session in the same JVM needs its own registration. */
  def registerSqlCatalog(spark: SparkSession, warehouse: String): String = {
    val name = "graftq_" + java.security.MessageDigest.getInstance("MD5")
      .digest(warehouse.getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    spark.conf.set(s"spark.sql.catalog.$name", "graft.catalog.GraftSparkCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", warehouse)
    name
  }
}

private[catalog] object GraftScanBuilder {
  /** Partial Filter → Column translation: the common pruning-relevant
    * shapes. None = untranslated (harmless: it stays a residual). */
  def toColumn(f: Filter): Option[Column] = f match {
    case sources.EqualTo(a, v)            => Some(col(a) === lit(v))
    case sources.GreaterThan(a, v)        => Some(col(a) > lit(v))
    case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case sources.LessThan(a, v)           => Some(col(a) < lit(v))
    case sources.LessThanOrEqual(a, v)    => Some(col(a) <= lit(v))
    case sources.In(a, vs)                => Some(col(a).isin(vs.toSeq: _*))
    case sources.IsNull(a)                => Some(col(a).isNull)
    case sources.IsNotNull(a)             => Some(col(a).isNotNull)
    case sources.StringStartsWith(a, v)   => Some(col(a).startsWith(v))
    case sources.And(l, r) =>
      for (lc <- toColumn(l); rc <- toColumn(r)) yield lc && rc
    case sources.Or(l, r) =>
      for (lc <- toColumn(l); rc <- toColumn(r)) yield lc || rc
    case sources.Not(c) => toColumn(c).map(!_)
    // a WHERE-less DELETE parses to condition TRUE -> AlwaysTrue; without
    // this case plain `DELETE FROM t` would be rejected at analysis
    case sources.AlwaysTrue()  => Some(lit(true))
    case sources.AlwaysFalse() => Some(lit(false))
    case _ => None
  }
}

/** A persisted graft view — the stored definition handed back to
  * Spark's analyzer, which re-parses `query` under the recorded
  * catalog/namespace context and validates it against the recorded
  * schema/column lineage. */
private[catalog] class GraftView(
    viewName: String,
    viewQuery: String,
    cat0: String,
    ns0: Array[String],
    viewSchema: org.apache.spark.sql.types.StructType,
    qCols: Array[String],
    aliases: Array[String],
    comments: Array[String],
    props: Map[String, String])
  extends org.apache.spark.sql.connector.catalog.View {
  override def name(): String = viewName
  override def query(): String = viewQuery
  override def currentCatalog(): String = cat0
  override def currentNamespace(): Array[String] = ns0
  override def schema(): org.apache.spark.sql.types.StructType = viewSchema
  override def queryColumnNames(): Array[String] = qCols
  override def columnAliases(): Array[String] = aliases
  override def columnComments(): Array[String] = comments
  override def properties(): java.util.Map[String, String] = {
    import scala.jdk.CollectionConverters._
    props.asJava
  }
}
