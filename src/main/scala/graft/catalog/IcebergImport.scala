package graft.catalog

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode
import org.apache.avro.generic.GenericRecord
import org.apache.spark.sql.types.StructType

/** Apache-Iceberg-format IMPORT: replay a foreign Iceberg v2 table —
  * metadata JSON, Avro manifest lists, Avro manifests, parquet data —
  * into a GraftCatalog table, PRESERVING the main-branch snapshot
  * history. This is the read side of the interop seam [[IcebergExport]]
  * opened (reference premise: `iceberg-arch-geo-distributed-ha.md:233-241`
  * replicates standard Iceberg metadata objects); together they close
  * the "a real user with existing Iceberg tables hits this on day one"
  * gap: export makes graft tables consumable by Iceberg runtimes, import
  * makes Iceberg tables consumable by everything in this engine
  * (time travel, incremental reads, changefeeds, GC, sync, SQL via the
  * DSv2 catalog).
  *
  * Mapping (spec https://iceberg.apache.org/spec/, v2):
  *  - the MAIN lineage is recovered by walking `parent-snapshot-id`
  *    back from `current-snapshot-id` — the flat `snapshots` array may
  *    carry other refs' snapshots, which a history replay must skip;
  *  - each Iceberg snapshot's live state becomes ORDERED MANIFEST UNITS:
  *    entries grouped by (data sequence number, is-delete), sorted
  *    ascending by sequence with deletes FIRST within one sequence.
  *    That order realizes the spec's equality-delete rule ("applies to
  *    data files whose data sequence number is STRICTLY LESS than the
  *    delete's") under graft's positional rule (a delete manifest erases
  *    data manifests EARLIER in the list — [[GraftCatalog.morScan]]), so
  *    merge-on-read history replays with the deletes applied at the
  *    right snapshots. Grouping by ENTRY-level sequence also places
  *    rewritten (status EXISTING) entries correctly: a compacted
  *    manifest carrying old-sequence files still lands those files
  *    before the deletes that erase them;
  *  - a snapshot whose parent's unit list is a PREFIX of its own replays
  *    as [[GraftCatalog.commitFilesMor]] (append — stays O(delta)
  *    incremental-readable); anything else as
  *    [[GraftCatalog.commitFilesReplaceMor]] (overwrite, classified
  *    exactly like native [[GraftCatalog.commitReplace]]);
  *  - per-snapshot `schema-id` maps through the metadata's `schemas`
  *    list, so schema EVOLUTION replays version-accurate (old versions
  *    time-travel to their own column set; pre-evolution parquet
  *    null-fills on read, the same projection a real Iceberg reader
  *    does by field id);
  *  - data AND equality-delete files are copied DISTRIBUTED (one Spark
  *    task per file batch, the same shape as export/GC/replication
  *    copies), deduped across snapshots by source URI so a file kept
  *    through many snapshots is copied once;
  *  - commitIds derive from the foreign snapshot ids, so a re-imported
  *    snapshot is rejected by the catalog's idempotence fast path
  *    instead of duplicating history.
  *
  * FAILURE-ATOMIC: every refusal below is checked BEFORE the target
  * table is created, and any failure after creation (mid-copy, mid-
  * replay) DROPS the just-created table — a crashed import never leaves
  * a half-created table that poisons the retry's tableExists
  * precondition.
  *
  * Scope and honesty (documented refusals, never silent wrong answers):
  *  - POSITION deletes (data_file content=1) refuse — graft's
  *    merge-on-read model is equality-keyed ([[GraftCatalog
  *    .commitDelete]]); a position delete names (file, row ordinal)
  *    pairs, which a name-keyed anti-join cannot express — compact them
  *    in the source engine first. Equality deletes (content=2) import
  *    exactly;
  *  - equality-delete files must key on ONE column set per table (the
  *    same constraint [[GraftCatalog.commitDelete]] enforces natively —
  *    morScan's per-epoch anti-join is a single join) and must carry
  *    exactly their equality columns (the layout the spec recommends
  *    and every graft export produces);
  *  - column RENAME/TYPE-CHANGE across snapshots refuses: Iceberg
  *    resolves columns by field id, graft by name, so a rename is not
  *    representable without rewriting history (additive evolution — the
  *    common case — imports exactly);
  *  - partition-spec columns are not reconstructed (identity data is in
  *    the files; graft re-derives pruning stats at its next compact or
  *    [[GraftCatalog.backfillStats]]).
  */
object IcebergImport {

  /** What one import produced. `replays` counts graft commits created
    * (= main-lineage snapshots), `replaces` how many were overwrites;
    * `rows` is the head's physical data-file row count (pre-MoR). */
  case class ImportReport(table: String, replays: Int, replaces: Int,
                          dataFiles: Int, rows: Long, schemas: Int,
                          deleteFiles: Int = 0)

  /** One live manifest entry of one snapshot: source URI, recorded row
    * count, delete-ness, data sequence number, equality ids (deletes). */
  private case class Entry0(uri: String, rows: Long, isDelete: Boolean,
                            seq: Long, eqIds: Seq[Int])

  /** Import the main-branch history of the Iceberg v2 table at
    * `location` into `ns.name` (created here; must not already exist). */
  def importTable(cat: GraftCatalog, ns: String, name: String,
                  location: String): ImportReport = {
    require(!cat.tableExists(ns, name),
      s"import target $ns.$name already exists — import creates the table")
    val meta = Paths.get(location, "metadata")
    val hint = new String(Files.readAllBytes(meta.resolve("version-hint.text")),
      StandardCharsets.UTF_8).trim
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(Files.readAllBytes(meta.resolve(s"v$hint.metadata.json")))
    require(root.get("format-version").asInt() == 2,
      s"IcebergImport: format-version 2 required, got ${root.get("format-version")}")

    // schemas by id, both as Spark schema and as (id -> name/type) for
    // the rename/type-change refusal below
    val schemaNodes: Map[Int, JsonNode] = root.get("schemas").elements().asScala
      .map(n => n.get("schema-id").asInt() -> n).toMap
    val sparkSchemas: Map[Int, StructType] =
      schemaNodes.map { case (id, n) => id -> IcebergExport.sparkSchema(n) }
    val currentSchemaId = root.get("current-schema-id").asInt()

    // main lineage: parent-chain walk from current-snapshot-id
    val currentId =
      Option(root.get("current-snapshot-id")).map(_.asLong()).getOrElse(-1L)
    val byId: Map[Long, JsonNode] =
      Option(root.get("snapshots")).toSeq.flatMap(_.elements().asScala)
        .map(n => n.get("snapshot-id").asLong() -> n).toMap
    val lineage: Seq[JsonNode] = {
      var chain = List.empty[JsonNode]
      val visited = scala.collection.mutable.Set.empty[Long]
      var cur = currentId
      while (cur != -1L && byId.contains(cur)) {
        require(visited.add(cur),
          s"IcebergImport: parent-snapshot-id cycle at snapshot $cur — " +
            "corrupt metadata, refusing")
        val n = byId(cur)
        chain = n :: chain
        cur = Option(n.get("parent-snapshot-id")).map(_.asLong()).getOrElse(-1L)
      }
      chain
    }

    // ---- EVERY refusal runs before createTable (failure atomicity) ----

    // refuse renames/type changes across the schemas the lineage uses:
    // (field id -> name:type) must agree wherever two schemas overlap
    val usedSchemaIds =
      if (lineage.isEmpty) Seq(currentSchemaId)
      else lineage.map(schemaIdOf(_, currentSchemaId)).distinct
    val idSig: Map[Int, Map[Int, String]] = usedSchemaIds.map { sid =>
      sid -> fieldSignatures(schemaNodes(sid))
    }.toMap
    for (a <- usedSchemaIds; b <- usedSchemaIds if a != b;
         (fid, sig) <- idSig(a); other <- idSig(b).get(fid))
      require(sig == other,
        s"IcebergImport: field id $fid is '$sig' in schema $a but '$other' in " +
          s"schema $b — renames/type changes are id-resolved in Iceberg and not " +
          "representable in a name-resolved catalog; rewrite history first")

    // per-snapshot live entries via the spec artifacts (data + equality
    // deletes; position deletes refuse)
    val liveSets: Seq[(JsonNode, Seq[Entry0])] = lineage.map { snap =>
      val listPath = Paths.get(java.net.URI.create(snap.get("manifest-list").asText()))
      val entries = IcebergExport.readAvro(listPath).flatMap { mf =>
        val mContent = anyInt(IcebergExport.getOpt(mf, "content"))
        require(mContent == 0 || mContent == 1,
          s"IcebergImport: unknown manifest content $mContent")
        val mSeq = anyLong(IcebergExport.getOpt(mf, "sequence_number"))
        IcebergExport.readAvro(
            Paths.get(java.net.URI.create(mf.get("manifest_path").toString)))
          .filter(e => anyInt(IcebergExport.getOpt(e, "status")) != 2) // DELETED excluded
          .map { e =>
            val df = e.get("data_file").asInstanceOf[GenericRecord]
            val seq = anyLongOr(IcebergExport.getOpt(e, "sequence_number"), mSeq)
            anyInt(IcebergExport.getOpt(df, "content")) match {
              case 0 =>
                Entry0(df.get("file_path").toString,
                  anyLong(IcebergExport.getOpt(df, "record_count")),
                  isDelete = false, seq, Seq.empty)
              case 2 =>
                val ids = Option(IcebergExport.getOpt(df, "equality_ids"))
                  .map(_.asInstanceOf[java.util.List[_]].asScala
                    .map(x => anyInt(x.asInstanceOf[AnyRef])).toSeq)
                  .getOrElse(Seq.empty)
                require(ids.nonEmpty, "IcebergImport: equality-delete file " +
                  s"${df.get("file_path")} carries no equality_ids")
                Entry0(df.get("file_path").toString,
                  anyLong(IcebergExport.getOpt(df, "record_count")),
                  isDelete = true, seq, ids)
              case 1 => throw new IllegalArgumentException(
                s"IcebergImport: snapshot ${snap.get("snapshot-id")} carries a " +
                  "POSITION delete file — graft's merge-on-read model is " +
                  "equality-keyed; compact position deletes in the source engine first")
              case other => throw new IllegalArgumentException(
                s"IcebergImport: unknown data_file content $other")
            }
          }
      }
      (snap, entries)
    }

    // one equality-column set per table (commitDelete's native
    // constraint — morScan anti-joins each epoch in a single join), and
    // each delete parquet must carry exactly those columns
    val eqIdSets = liveSets.flatMap(_._2).filter(_.isDelete).map(_.eqIds.sorted).distinct
    require(eqIdSets.size <= 1,
      s"IcebergImport: equality-delete files key on ${eqIdSets.size} different " +
        "column sets — graft tables key merge-on-read deletes on one set; " +
        "compact in the source engine first")
    val nameOfId: Map[Int, String] = schemaNodes(currentSchemaId)
      .get("fields").elements().asScala
      .map(f => f.get("id").asInt() -> f.get("name").asText()).toMap
    val eqCols: Seq[String] = eqIdSets.headOption.getOrElse(Seq.empty)
      .map(id => nameOfId.getOrElse(id, throw new IllegalArgumentException(
        s"IcebergImport: equality id $id resolves to no current-schema column")))
    liveSets.flatMap(_._2).filter(_.isDelete).map(_.uri).distinct.foreach { uri =>
      val cols = IcebergExport.parquetColumnNames(
        Paths.get(java.net.URI.create(uri)).toString,
        cat.spark.sparkContext.hadoopConfiguration)
      require(cols.toSet == eqCols.toSet,
        s"IcebergImport: equality-delete file $uri carries columns $cols but " +
          s"its equality_ids resolve to $eqCols — delete files must hold exactly " +
          "their equality columns (rewrite in the source engine first)")
    }

    // ---- all checks passed: create, then copy + replay atomically ----

    cat.createTable(ns, name)
    try {
      if (lineage.isEmpty) {
        // empty table: one empty v0 carrying the current schema, so a
        // cold SELECT resolves columns (same contract as SQL CREATE TABLE)
        cat.commitFilesReplace(ns, name, Seq.empty, sourceRegion = "iceberg-import",
          schemaJson = Some(sparkSchemas(currentSchemaId).json))
        return ImportReport(s"$ns.$name", 0, 0, 0, 0L, 1)
      }

      // copy distinct files DISTRIBUTED; dedup by source URI so a file
      // kept across snapshots lands once. Relative names carry a
      // URI-hash prefix — foreign basenames may collide across
      // directories
      val tableRoot = cat.tablePath(ns, name)
      val relOf: Map[String, String] = liveSets.flatMap(_._2).map(_.uri).distinct
        .map { uri =>
          val base = Paths.get(java.net.URI.create(uri)).getFileName.toString
          uri -> s"data/imported-${md5_8(uri)}-$base"
        }.toMap
      val copies = relOf.toSeq.map { case (uri, rel) =>
        (Paths.get(java.net.URI.create(uri)).toAbsolutePath.toString,
          tableRoot.resolve(rel).toAbsolutePath.toString)
      }
      cat.spark.sparkContext
        .parallelize(copies, math.max(1, math.min(copies.size, 32)))
        .foreach { case (src, dst) =>
          Files.copy(Paths.get(src), Paths.get(dst), StandardCopyOption.REPLACE_EXISTING): Unit
        }

      // ordered units per snapshot: group by (sequence, delete-ness),
      // ascending sequence, deletes FIRST within a sequence (see the
      // mapping note in the scaladoc)
      def unitsOf(entries: Seq[Entry0]): Seq[(Seq[String], Boolean, Long)] =
        entries.groupBy(e => (e.seq, e.isDelete)).toSeq
          .sortBy { case ((seq, isDel), _) => (seq, if (isDel) 0 else 1) }
          .map { case ((seq, isDel), es) =>
            (es.map(e => relOf(e.uri)).distinct.sorted, isDel, seq)
          }

      // replay the lineage: parent units a prefix -> MoR append commit,
      // anything else -> MoR replace; schema rides each commit
      // version-accurately
      var prev = Seq.empty[(Seq[String], Boolean, Long)]
      var replaces = 0
      liveSets.foreach { case (snap, entries) =>
        val units = unitsOf(entries)
        val sid = snap.get("snapshot-id").asLong()
        val schema = sparkSchemas(schemaIdOf(snap, currentSchemaId))
        if (units.startsWith(prev))
          cat.commitFilesMor(ns, name,
            units.drop(prev.size).map(u => (u._1, u._2)),
            sourceRegion = "iceberg-import", schemaJson = Some(schema.json),
            commitId = Some(s"iceberg-$sid"))
        else {
          replaces += 1
          cat.commitFilesReplaceMor(ns, name, units.map(u => (u._1, u._2)),
            sourceRegion = "iceberg-import", schemaJson = Some(schema.json),
            commitId = Some(s"iceberg-$sid"))
        }
        prev = units
      }

      val allEntries = liveSets.flatMap(_._2)
      ImportReport(s"$ns.$name", lineage.size, replaces,
        allEntries.filterNot(_.isDelete).map(_.uri).distinct.size,
        liveSets.last._2.filterNot(_.isDelete).map(_.rows).sum,
        usedSchemaIds.size,
        allEntries.filter(_.isDelete).map(_.uri).distinct.size)
    } catch { case e: Throwable =>
      // failure atomicity: never leave a half-created table behind — the
      // retry must pass the tableExists precondition
      try cat.dropTable(ns, name) catch { case cleanup: Throwable =>
        e.addSuppressed(cleanup)
      }
      throw e
    }
  }

  private def schemaIdOf(snap: JsonNode, fallback: Int): Int =
    Option(snap.get("schema-id")).map(_.asInt()).getOrElse(fallback)

  /** field-id -> "name:type" signature map of one Iceberg schema JSON
    * (list element ids contribute their own "<elem>:type" signature). */
  private def fieldSignatures(schemaNode: JsonNode): Map[Int, String] =
    schemaNode.get("fields").elements().asScala.flatMap { f =>
      val own = f.get("id").asInt() ->
        s"${f.get("name").asText()}:${typeText(f.get("type"))}"
      if (f.get("type").isTextual) Seq(own)
      else Seq(own, f.get("type").get("element-id").asInt() ->
        s"<elem>:${f.get("type").get("element").asText()}")
    }.toMap

  private def typeText(t: JsonNode): String =
    if (t.isTextual) t.asText() else s"list<${t.get("element").asText()}>"

  // Avro generic values arrive as java.lang boxes whose concrete width
  // depends on the writer's declared type — normalize, don't cast
  private def anyInt(v: AnyRef): Int = v match {
    case null => 0
    case n: java.lang.Number => n.intValue()
    case other => other.toString.toInt
  }
  private def anyLong(v: AnyRef): Long = v match {
    case null => 0L
    case n: java.lang.Number => n.longValue()
    case other => other.toString.toLong
  }
  private def anyLongOr(v: AnyRef, dflt: Long): Long =
    if (v == null) dflt else anyLong(v)

  private def md5_8(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .take(4).map("%02x".format(_)).mkString
}
