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
  *    does by field id). When the table's CURRENT schema differs from
  *    the last snapshot's (a rename/promotion published after the last
  *    write — ALTER TABLE creates no snapshot), one extra metadata-only
  *    graft commit carries it, so the imported head reads under the
  *    same schema a live Iceberg reader would use;
  *  - column RENAMES import as schema ERAS: Iceberg resolves columns by
  *    field id, graft by name, so at each point in history where a
  *    field id's name changes, the importer starts a new era and
  *    replays the first post-rename snapshot as an overwrite whose data
  *    files are REWRITTEN once with the era's column names (driver-
  *    orchestrated, one small Spark job per straddling file). Within an
  *    era everything is a plain copy. This materializes what an
  *    id-resolving reader does lazily — the honest price of a
  *    name-resolved catalog, paid once at import (renames are rare;
  *    only files straddling the rename are duplicated, and old eras
  *    stay time-travel-exact under their own names);
  *  - TYPE CHANGES import when they follow the spec's promotion lattice
  *    (int→long, float→double, decimal precision widening at fixed
  *    scale): each version keeps its declared type and Spark's parquet
  *    reader serves the widening read natively (a long-schema scan over
  *    int32 pages). Narrowing or lateral changes refuse;
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
  * POSITION deletes (data_file content=1) import exactly: the delete
  * parquet's foreign data-file URIs rewrite to the imported files'
  * graft-relative paths (one small driver job per delete file), the
  * unit order places them AFTER their sequence's data (the spec's
  * less-or-equal rule under morScan's positional rule), and the scan
  * applies them via [[GraftCatalog.commitDeletePositions]]'s machinery
  * (`_metadata` row ordinals — row order is preserved by the plain
  * file copy).
  *
  * Scope and honesty (documented refusals, never silent wrong answers):
  *  - position deletes COMBINED WITH column renames refuse: replaying a
  *    rename rewrites data files, which would orphan the (file, row
  *    ordinal) identities — compact in the source engine first;
  *  - equality-delete files must key on ONE field-id set per table (the
  *    same constraint [[GraftCatalog.commitDelete]] enforces natively —
  *    morScan's per-epoch anti-join is a single join) and must carry
  *    exactly their equality columns (the layout the spec recommends
  *    and every graft export produces);
  *  - a column NAME reused for a different field id across the table's
  *    life (rename a→b, then a NEW column named a) makes footer-name
  *    resolution ambiguous and refuses;
  *  - partition-spec columns are not reconstructed (identity data is in
  *    the files; graft re-derives pruning stats at its next compact or
  *    [[GraftCatalog.backfillStats]]).
  */
object IcebergImport {

  /** What one import produced. `replays` counts graft commits created
    * (main-lineage snapshots, +1 when a current-schema step is
    * synthesized), `replaces` how many were overwrites; `rows` is the
    * head's physical data-file row count (pre-MoR); `rewrittenFiles`
    * counts per-era rename rewrites (0 for rename-free histories). */
  case class ImportReport(table: String, replays: Int, replaces: Int,
                          dataFiles: Int, rows: Long, schemas: Int,
                          deleteFiles: Int = 0, rewrittenFiles: Int = 0)

  /** One live manifest entry of one snapshot: source URI, recorded row
    * count, kind (GraftCatalog.UnitData/UnitEqDelete/UnitPosDelete),
    * data sequence number, equality ids (equality deletes only). */
  private case class Entry0(uri: String, rows: Long, kind: String,
                            seq: Long, eqIds: Seq[Int]) {
    def isDelete: Boolean = kind != GraftCatalog.UnitData
    def isPos: Boolean = kind == GraftCatalog.UnitPosDelete
  }

  /** One replay step: the snapshot-derived commit id, its entries, its
    * schema id, and its rename era. `commitId` is synthetic for the
    * current-schema step. */
  private case class Step(commitId: String, entries: Seq[Entry0],
                          schemaId: Int, era: Int)

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

    // schema-id sequence the replay walks: per-snapshot ids, plus the
    // CURRENT schema as a final metadata-only step when a rename/
    // promotion was published after the last write (ALTER TABLE creates
    // no snapshot, but a live Iceberg reader uses current-schema-id)
    val lineageSchemaIds = lineage.map(schemaIdOf(_, currentSchemaId))
    val stepSchemaIds =
      if (lineage.isEmpty) Seq(currentSchemaId)
      else if (lineageSchemaIds.last != currentSchemaId)
        lineageSchemaIds :+ currentSchemaId
      else lineageSchemaIds
    val usedSchemaIds = stepSchemaIds.distinct
    usedSchemaIds.foreach(sid => require(schemaNodes.contains(sid),
      s"IcebergImport: schema $sid is referenced but not declared"))

    // TYPE rule: along the step order, a field id's type may only stay
    // or follow the spec's promotion lattice (widening reads are served
    // natively by Spark's parquet reader — a long-schema scan over
    // int32 pages); anything else refuses
    val typeMaps: Map[Int, Map[Int, String]] =
      usedSchemaIds.map(sid => sid -> typeMapOf(schemaNodes(sid))).toMap
    locally {
      var cur = Map.empty[Int, String]
      stepSchemaIds.foreach { sid =>
        typeMaps(sid).foreach { case (fid, t) =>
          cur.get(fid).foreach(prev => require(promotes(prev, t),
            s"IcebergImport: field id $fid changes type '$prev' -> '$t' — " +
              "only the spec's promotions (int->long, float->double, decimal " +
              "precision widening) are importable; rewrite history first"))
          cur += fid -> t
        }
      }
    }

    // the spec's `schema.name-mapping.default` property (emitted by
    // engines whose data files carry no embedded field-ids — including
    // [[IcebergExport]] for renamed tables): an AUTHORITATIVE
    // footer-name -> field-id map. When present, EVERY data file of
    // every era spells the mapping's names, so the import needs no
    // rename-era rewrites at all — files plain-copy and the destination
    // schemas carry the mapping natively (graft's column-mapping layer,
    // [[GraftCatalog.PhysicalKey]]); position deletes stay valid because
    // file identities are preserved.
    val nameMapping: Map[String, Int] = {
      val pairs: Seq[(String, Int)] = Option(root.get("properties"))
        .flatMap(p => Option(p.get("schema.name-mapping.default")))
        .map(_.asText()).map { j =>
          mapper.readTree(j).elements().asScala.flatMap { e =>
            val fid = e.get("field-id").asInt()
            e.get("names").elements().asScala.map(_.asText() -> fid)
          }.toSeq
        }.getOrElse(Seq.empty)
      // a (spec-invalid) mapping binding ONE name to two different field
      // ids would silently last-wins here, and fieldIdOf would then
      // resolve footer columns to the wrong id — the silent-NULL-column
      // class; refuse loudly, same style as the multi-names-per-id
      // guard below
      val dup = pairs.groupBy(_._1)
        .collect { case (n, vs) if vs.map(_._2).distinct.size > 1 => n }
      require(dup.isEmpty,
        s"IcebergImport: name-mapping binds name(s) ${dup.mkString(", ")} " +
          "to multiple field ids — footer-name resolution would be " +
          "ambiguous; fix the mapping in the source engine first")
      pairs.toMap
    }
    val physOfId: Map[Int, String] =
      nameMapping.groupBy(_._2).map { case (id, m) =>
        // a multi-name entry (legacy alias + current spelling) leaves
        // the files' ACTUAL spelling ambiguous — picking one and being
        // wrong reads the whole column as silent NULLs; refuse loudly
        require(m.size == 1,
          s"IcebergImport: name-mapping entry for field id $id carries " +
            s"${m.size} names (${m.keys.mkString(", ")}) — the physical " +
            "spelling is ambiguous; rewrite or simplify the mapping in " +
            "the source engine first")
        id -> m.keys.head
      }

    // RENAME eras: a new era starts whenever a schema names a known
    // field id differently than the accumulated era map; each era's
    // full id->name map is what files read under that era must carry.
    // A name-mapped table has ONE physical era by construction — files
    // never change spelling across renames
    val nameMaps: Map[Int, Map[Int, String]] =
      usedSchemaIds.map(sid => sid -> nameMapOf(schemaNodes(sid))).toMap
    val (stepEras, eraMaps) = if (nameMapping.nonEmpty)
      (stepSchemaIds.map(_ => 0), Seq(Map.empty[Int, String]))
    else {
      val eras = scala.collection.mutable.ArrayBuffer.empty[Int]
      val maps = scala.collection.mutable.ArrayBuffer.empty[Map[Int, String]]
      var acc = Map.empty[Int, String]
      var era = -1
      stepSchemaIds.foreach { sid =>
        val nm = nameMaps(sid)
        val conflict = era < 0 || nm.exists { case (id, n) => acc.get(id).exists(_ != n) }
        if (conflict) { era += 1; acc = nm; maps += acc }
        else { acc ++= nm; maps(era) = acc }
        eras += era
      }
      (eras.toSeq, maps.toSeq)
    }
    val multiEra = eraMaps.size > 1

    // footer-name -> field id, unioned across the table's life; a name
    // reused for a DIFFERENT id is ambiguous and refuses on use
    val idOfName = scala.collection.mutable.Map.empty[String, Int]
    val ambiguousNames = scala.collection.mutable.Set.empty[String]
    usedSchemaIds.foreach(sid => nameMaps(sid).foreach { case (id, n) =>
      idOfName.get(n) match {
        case Some(other) if other != id => ambiguousNames += n
        case _ => idOfName(n) = id
      }
    })
    // (nameMapping defined above, before the era computation — it wins
    // over, and disambiguates, the schema-derived union here)

    // ---- partition specs ----
    // (transform, source-id, field name) per declared spec (flat JSON);
    // the NAME is how a manifest's partition tuple is addressed
    val specFieldsById: Map[Int, Seq[(String, Int, String)]] =
      Option(root.get("partition-specs")).toSeq
        .flatMap(_.elements().asScala).map { sp =>
          sp.get("spec-id").asInt() ->
            sp.get("fields").elements().asScala.map(f =>
              (f.get("transform").asText(), f.get("source-id").asInt(),
                f.get("name").asText())).toSeq
        }.toMap
    def specHasIdentity(specId: Int): Boolean =
      specFieldsById.getOrElse(specId, Seq.empty).exists(_._1 == "identity")

    // per-snapshot live entries via the spec artifacts (data + equality
    // deletes; position deletes refuse). For manifests whose spec has
    // IDENTITY fields (and only those — ordinary imports stay
    // O(manifests) on the driver), each data file's manifest,
    // partition-spec-id and PARTITION TUPLE are captured for the
    // identity-omission reconstruction below (the tuple is what fills
    // an omitted identity source column — spec §Column Projection).
    val dataFilePartitions = scala.collection.mutable.LinkedHashMap
      .empty[String, (String, Int, Option[GenericRecord])]
    val liveSets: Seq[Seq[Entry0]] = lineage.map { snap =>
      val listPath = Paths.get(java.net.URI.create(snap.get("manifest-list").asText()))
      IcebergExport.readAvro(listPath).flatMap { mf =>
        val mContent = anyInt(IcebergExport.getOpt(mf, "content"))
        require(mContent == 0 || mContent == 1,
          s"IcebergImport: unknown manifest content $mContent")
        val mSeq = anyLong(IcebergExport.getOpt(mf, "sequence_number"))
        val mPath = mf.get("manifest_path").toString
        val mSpecId = anyInt(IcebergExport.getOpt(mf, "partition_spec_id"))
        IcebergExport.readAvro(
            Paths.get(java.net.URI.create(mPath)))
          .filter(e => anyInt(IcebergExport.getOpt(e, "status")) != 2) // DELETED excluded
          .map { e =>
            if (mContent == 0 && specHasIdentity(mSpecId)) {
              val df0 = e.get("data_file").asInstanceOf[GenericRecord]
              if (anyInt(IcebergExport.getOpt(df0, "content")) == 0) {
                val uri0 = df0.get("file_path").toString
                if (!dataFilePartitions.contains(uri0))
                  dataFilePartitions(uri0) = (mPath, mSpecId,
                    Option(IcebergExport.getOpt(df0, "partition"))
                      .collect { case r: GenericRecord => r })
              }
            }
            e
          }
          .map { e =>
            val df = e.get("data_file").asInstanceOf[GenericRecord]
            val seq = anyLongOr(IcebergExport.getOpt(e, "sequence_number"), mSeq)
            anyInt(IcebergExport.getOpt(df, "content")) match {
              case 0 =>
                Entry0(df.get("file_path").toString,
                  anyLong(IcebergExport.getOpt(df, "record_count")),
                  GraftCatalog.UnitData, seq, Seq.empty)
              case 2 =>
                val ids = Option(IcebergExport.getOpt(df, "equality_ids"))
                  .map(_.asInstanceOf[java.util.List[_]].asScala
                    .map(x => anyInt(x.asInstanceOf[AnyRef])).toSeq)
                  .getOrElse(Seq.empty)
                require(ids.nonEmpty, "IcebergImport: equality-delete file " +
                  s"${df.get("file_path")} carries no equality_ids")
                Entry0(df.get("file_path").toString,
                  anyLong(IcebergExport.getOpt(df, "record_count")),
                  GraftCatalog.UnitEqDelete, seq, ids)
              case 1 =>
                Entry0(df.get("file_path").toString,
                  anyLong(IcebergExport.getOpt(df, "record_count")),
                  GraftCatalog.UnitPosDelete, seq, Seq.empty)
              case other => throw new IllegalArgumentException(
                s"IcebergImport: unknown data_file content $other")
            }
          }
      }
    }

    // replay steps: one per lineage snapshot (+ the current-schema step,
    // re-publishing the head's entries under the current schema)
    val steps: Seq[Step] = {
      val snapSteps = lineage.zip(liveSets).zip(stepEras).map {
        case ((snap, entries), era) =>
          Step(s"iceberg-${snap.get("snapshot-id").asLong()}", entries,
            schemaIdOf(snap, currentSchemaId), era)
      }
      if (stepSchemaIds.size > lineage.size)
        snapSteps :+ Step(s"iceberg-current-schema-$currentId",
          liveSets.lastOption.getOrElse(Seq.empty), currentSchemaId,
          stepEras.last)
      else snapSteps
    }

    // driver-side footer-schema cache (one read per distinct file)
    val footerCache = scala.collection.mutable.Map.empty[String, Seq[String]]
    def footerCols(uri: String): Seq[String] =
      footerCache.getOrElseUpdate(uri, IcebergExport.parquetColumnNames(
        Paths.get(java.net.URI.create(uri)).toString,
        cat.spark.sparkContext.hadoopConfiguration))
    def fieldIdOf(uri: String, col0: String): Int =
      nameMapping.getOrElse(col0, {
        require(!ambiguousNames(col0),
          s"IcebergImport: column name '$col0' (in $uri) was reused for " +
            "different field ids across this table's schemas — footer-name " +
            "resolution is ambiguous; rewrite history first")
        idOfName.getOrElse(col0, throw new IllegalArgumentException(
          s"IcebergImport: file $uri carries column '$col0' that no schema " +
            "of this table declares (and no name-mapping resolves it)"))
      })

    // IDENTITY-OMISSION RECONSTRUCTION: the spec allows writers to OMIT
    // identity source columns from data files — the REQUIRED reader
    // behavior (spec §Column Projection) is to produce the value from
    // the manifest's partition tuple. Graft plain-copies files and
    // resolves columns by footer name, so an omitted column would read
    // as silent NULLs; instead, such a file is rewritten ONCE at import
    // with the constant materialized from its tuple. Refusal remains
    // only for the genuinely unreconstructible shapes: no tuple
    // recorded, a non-literal-able source type, or rename eras (whose
    // per-era rewrite identity the fill would have to compose with).
    // Footer probes are per-FILE but driver-cheap (the same footer
    // cache the equality-delete check uses; metadata-only reads).
    val currentTypeOf: Map[Int, String] = typeMapOf(schemaNodes(currentSchemaId))
    val currentNameOf: Map[Int, String] = nameMapOf(schemaNodes(currentSchemaId))
    // uri -> (fill column name, type text, avro partition value)
    val idFillOf = scala.collection.mutable.LinkedHashMap
      .empty[String, Seq[(String, String, AnyRef)]]
    dataFilePartitions.foreach { case (uri, (mPath, specId, partRec)) =>
      val identitySources = specFieldsById.getOrElse(specId, Seq.empty)
        .collect { case ("identity", srcId, fieldName) => (srcId, fieldName) }
      val missing = identitySources.filterNot { case (srcId, _) =>
        // mirrors fieldIdOf's PER-NAME fallback: a name absent from the
        // mapping resolves via the schema index — a partial mapping
        // (legacy aliases only) must not falsely refuse a table whose
        // files DO carry the column under its current name
        footerCols(uri).exists(c =>
          nameMapping.get(c).contains(srcId) ||
            (!nameMapping.contains(c) && !ambiguousNames(c) &&
              idOfName.get(c).contains(srcId)))
      }
      if (missing.nonEmpty) {
        def refuse(why: String): Nothing = throw new IllegalArgumentException(
          s"IcebergImport: data file $uri (manifest $mPath, partition spec " +
            s"$specId) omits its identity partition source column and $why " +
            "— rewrite the table with the column materialized in the data " +
            "files (e.g. Iceberg rewrite_data_files) first")
        if (multiEra) refuse("the table also carries column-rename eras " +
          "(the fill cannot compose with per-era rewrite identity)")
        val part = partRec.getOrElse(
          refuse("its manifest records no partition tuple to fill it from"))
        val fills = missing.map { case (srcId, fieldName) =>
          if (part.getSchema.getField(fieldName) == null)
            refuse(s"its partition tuple carries no field '$fieldName'")
          val tpe = currentTypeOf.getOrElse(srcId,
            refuse(s"field id $srcId is not in the current schema"))
          if (!Seq("int", "long", "string", "date", "timestamp",
              "timestamptz").contains(tpe))
            refuse(s"source type '$tpe' is not reconstructible")
          val name = physOfId.getOrElse(srcId, currentNameOf.getOrElse(srcId,
            refuse(s"field id $srcId has no current name")))
          (name, tpe, part.get(fieldName))
        }
        idFillOf(uri) = fills
      }
    }
    val idFillRelOf: Map[String, String] = idFillOf.keys.map { uri =>
      val base = Paths.get(java.net.URI.create(uri)).getFileName.toString
      uri -> s"data/imported-idf-${md5_8(uri)}-$base"
    }.toMap

    // one equality-column FIELD-ID set per table (commitDelete's native
    // constraint — morScan anti-joins each epoch in a single join), and
    // each delete parquet must carry exactly those columns (id-resolved:
    // pre-rename delete files legitimately carry era-old names)
    val eqIdSets = liveSets.flatten
      .filter(e => e.isDelete && !e.isPos).map(_.eqIds.sorted).distinct
    require(eqIdSets.size <= 1,
      s"IcebergImport: equality-delete files key on ${eqIdSets.size} different " +
        "column sets — graft tables key merge-on-read deletes on one set; " +
        "compact in the source engine first")
    val eqIdSet = eqIdSets.headOption.getOrElse(Seq.empty).toSet
    liveSets.flatten.filter(e => e.isDelete && !e.isPos)
      .map(_.uri).distinct.foreach { uri =>
      val ids = footerCols(uri).map(c => fieldIdOf(uri, c)).toSet
      require(ids == eqIdSet,
        s"IcebergImport: equality-delete file $uri carries field ids $ids but " +
          s"its equality_ids resolve to $eqIdSet — delete files must hold exactly " +
          "their equality columns (rewrite in the source engine first)")
    }
    // position deletes name (data file, row ordinal) pairs; a rename-era
    // data rewrite would invalidate the file identity the ordinals hang
    // off — the composition is refused rather than silently mis-applied.
    // A NAME-MAPPED table never rewrites (multiEra is structurally false
    // above): renames × position deletes import fine there
    val posDeleteUris = liveSets.flatten.filter(_.isPos).map(_.uri).distinct
    require(posDeleteUris.isEmpty || !multiEra,
      "IcebergImport: this table carries BOTH column renames and position-" +
        "delete files; replaying renames rewrites data files, which would " +
        "orphan the (file, ordinal) identities — compact the deletes in the " +
        "source engine first (tables with schema.name-mapping.default " +
        "import without rewrites and are exempt)")
    // same (file, ordinal)-identity rule for identity-fill rewrites: a
    // pos-deleted file that ALSO omits its identity source would need
    // its fill rewrite to provably preserve row order — refuse rather
    // than rely on it
    if (posDeleteUris.nonEmpty && idFillOf.nonEmpty) {
      val targets = posDeleteUris.flatMap { uri =>
        cat.spark.read.parquet(Paths.get(java.net.URI.create(uri)).toString)
          .select("file_path").distinct()
          .collect().map(_.getString(0))
      }.toSet
      val clash = idFillOf.keys.filter(targets)
      require(clash.isEmpty,
        s"IcebergImport: position-delete files reference data file(s) " +
          s"${clash.mkString(", ")} whose omitted identity column requires " +
          "a rewrite — the (file, ordinal) identities would not survive; " +
          "compact the deletes in the source engine first")
    }

    // era-aware rel resolution: within one era a file is a plain copy;
    // a file read under an era that names its columns differently is
    // REWRITTEN once per distinct target-name vector
    val baseRelOf = scala.collection.mutable.Map.empty[String, String]
    // (uri, target names) -> rel
    val rewriteOf = scala.collection.mutable.Map.empty[(String, Seq[String]), String]
    def baseRel(uri: String): String =
      baseRelOf.getOrElseUpdate(uri, {
        val base = Paths.get(java.net.URI.create(uri)).getFileName.toString
        s"data/imported-${md5_8(uri)}-$base"
      })
    def relFor(uri: String, era: Int): String =
      // identity-fill rewrites supersede the plain copy (never coexist
      // with rename eras — the planner refuses that composition)
      if (idFillRelOf.contains(uri)) idFillRelOf(uri)
      else if (!multiEra) baseRel(uri)
      else {
        val cols = footerCols(uri)
        val target = cols.map(c => eraMaps(era).getOrElse(fieldIdOf(uri, c), c))
        if (target == cols) baseRel(uri)
        else rewriteOf.getOrElseUpdate((uri, target), {
          val base = Paths.get(java.net.URI.create(uri)).getFileName.toString
          s"data/imported-rw-${md5_8(uri + "|" + target.mkString(","))}-$base"
        })
      }
    // position-delete files are never plain-copied: their file_path
    // column holds FOREIGN data-file URIs, which the import rewrites to
    // the graft-relative paths of the copied files (the spec's reserved
    // columns file_path/pos are not table fields, so the rename-era
    // machinery never touches them)
    val pdRelOf: Map[String, String] = posDeleteUris.map { uri =>
      val base = Paths.get(java.net.URI.create(uri)).getFileName.toString
      uri -> s"data/imported-pd-${md5_8(uri)}-$base"
    }.toMap

    // ordered units per step (resolving every rel also surfaces every
    // ambiguity/unknown-column refusal BEFORE the table exists). Kind
    // order within one sequence realizes both spec rules positionally:
    // equality deletes BEFORE the sequence's data (strictly-less rule),
    // position deletes AFTER it (less-or-equal rule)
    def kindOrder(kind: String): Int = kind match {
      case GraftCatalog.UnitEqDelete => 0
      case GraftCatalog.UnitData => 1
      case _ => 2
    }
    def unitsOf(step: Step): Seq[(Seq[String], String, Long)] =
      step.entries.groupBy(e => (e.seq, e.kind)).toSeq
        .sortBy { case ((seq, kind), _) => (seq, kindOrder(kind)) }
        .map { case ((seq, kind), es) =>
          val rels = es.map { e =>
            if (e.isPos) pdRelOf(e.uri) else relFor(e.uri, step.era)
          }
          (rels.distinct.sorted, kind, seq)
        }
    val stepUnits: Seq[Seq[(Seq[String], String, Long)]] = steps.map(unitsOf)

    // destination schemas carry the name-mapping as graft's native
    // column mapping: each field whose mapping (physical/parquet) name
    // differs from its logical name gets the PhysicalKey metadata, so
    // the imported table reads the plain-copied files directly and
    // every later rename/read keeps working on the same machinery
    def schemaWithMapping(sid: Int): StructType =
      if (nameMapping.isEmpty) sparkSchemas(sid)
      else {
        val idOfLogical = nameMapOf(schemaNodes(sid)).map(_.swap)
        StructType(sparkSchemas(sid).fields.map { f =>
          idOfLogical.get(f.name).flatMap(physOfId.get)
            .filter(_ != f.name)
            .map(p => GraftCatalog.withPhysical(f, p))
            .getOrElse(f)
        })
      }

    // ---- all checks passed: create, then copy + replay atomically ----

    cat.createTable(ns, name)
    try {
      if (lineage.isEmpty) {
        // empty table: one empty v0 carrying the current schema, so a
        // cold SELECT resolves columns (same contract as SQL CREATE TABLE)
        cat.commitFilesReplace(ns, name, Seq.empty, sourceRegion = "iceberg-import",
          schemaJson = Some(schemaWithMapping(currentSchemaId).json))
        return ImportReport(s"$ns.$name", 0, 0, 0, 0L, 1)
      }

      // plain copies DISTRIBUTED, deduped by source URI so a file kept
      // across snapshots lands once. Relative names carry a URI-hash
      // prefix — foreign basenames may collide across directories
      val tableRoot = cat.tablePath(ns, name)
      val copies = baseRelOf.toSeq.map { case (uri, rel) =>
        (Paths.get(java.net.URI.create(uri)).toAbsolutePath.toString,
          tableRoot.resolve(rel).toAbsolutePath.toString)
      }
      if (copies.nonEmpty)
        cat.spark.sparkContext
          .parallelize(copies, math.max(1, math.min(copies.size, 32)))
          .foreach { case (src, dst) =>
            Files.copy(Paths.get(src), Paths.get(dst),
              StandardCopyOption.REPLACE_EXISTING): Unit
          }

      // rename rewrites: one small Spark job per straddling file —
      // driver-orchestrated because each output must stay 1:1 with its
      // source for per-era unit identity (renames are rare; a
      // production migration compacts right after import anyway)
      rewriteOf.foreach { case ((uri, target), rel) =>
        val src = Paths.get(java.net.URI.create(uri)).toString
        val df = cat.spark.read.parquet(src)
        val renameMap = df.columns.zip(
          df.columns.map(c => eraTargetFor(footerCols(uri), target, c)))
          .filter(p => p._1 != p._2).toMap
        IcebergExport.writeSingleParquet(
          df.withColumnsRenamed(renameMap), tableRoot.resolve(rel)): Unit
      }

      // identity-fill rewrites: materialize each omitted identity source
      // as the typed CONSTANT from the file's manifest partition tuple —
      // one small job per file, 1:1 with its source (same shape as the
      // rename rewrites; omissions are rare and a production migration
      // compacts right after import anyway)
      idFillOf.foreach { case (uri, fills) =>
        val src = Paths.get(java.net.URI.create(uri)).toString
        val filled = fills.foldLeft(cat.spark.read.parquet(src)) {
          case (df, (colName, tpe, v)) =>
            df.withColumn(colName, identityLiteral(tpe, v))
        }
        IcebergExport.writeSingleParquet(
          filled, tableRoot.resolve(idFillRelOf(uri))): Unit
      }

      // position-delete rewrites: map each foreign data-file URI in the
      // delete parquet to its imported graft-relative path (driver-side
      // — delete files are the small side by contract), sorted for
      // deterministic replays
      if (posDeleteUris.nonEmpty) {
        import cat.spark.implicits._
        posDeleteUris.sorted.foreach { uri =>
          val rows = cat.spark.read
            .parquet(Paths.get(java.net.URI.create(uri)).toString)
            .select("file_path", "pos").as[(String, Long)].collect()
            .map { case (fp, pos) =>
              (baseRelOf.getOrElse(fp, throw new IllegalStateException(
                s"position-delete file $uri references $fp, which no imported " +
                  "snapshot carries")), pos)
            }.sortBy(identity).toSeq
          IcebergExport.writeSingleParquet(
            rows.toDF("file_path", "pos"), tableRoot.resolve(pdRelOf(uri))): Unit
        }
      }

      // replay: same era + parent units a prefix -> MoR append commit,
      // anything else (true overwrite OR an era boundary, whose units
      // reference the era's rewritten rels) -> MoR replace; schema rides
      // each commit version-accurately
      var prev = Seq.empty[(Seq[String], String, Long)]
      var prevEra = steps.headOption.map(_.era).getOrElse(0)
      var replaces = 0
      steps.zip(stepUnits).foreach { case (step, units) =>
        val schema = schemaWithMapping(step.schemaId)
        if (step.era == prevEra && units.startsWith(prev))
          cat.commitFilesMor(ns, name,
            units.drop(prev.size).map(u => (u._1, u._2)),
            sourceRegion = "iceberg-import", schemaJson = Some(schema.json),
            commitId = Some(step.commitId))
        else {
          replaces += 1
          cat.commitFilesReplaceMor(ns, name, units.map(u => (u._1, u._2)),
            sourceRegion = "iceberg-import", schemaJson = Some(schema.json),
            commitId = Some(step.commitId))
        }
        prev = units; prevEra = step.era
      }

      // restore the source's TBLPROPERTIES (minus the engine keys the
      // import consumed) as one final metadata-only commit — an Iceberg
      // user's write.target-file-size-bytes etc. keep working here
      val srcProps = Option(root.get("properties")).toSeq
        .flatMap(_.properties().asScala)
        .map(e => e.getKey -> e.getValue.asText())
        .filterNot { case (k, _) =>
          k == "write.format.default" || k == "schema.name-mapping.default" }
        .toMap
      // map the DEFAULT partition spec onto graft's own partition model
      // (graft.partition-spec), so the imported table keeps clustering,
      // bucket-blooming and re-exporting under the source's layout.
      // Best-effort layout METADATA, never correctness: an unmappable
      // spec (void/unknown transform, unresolvable source, type the
      // graft model refuses) imports the data fine and just skips the
      // property.
      val mappedSpec: Option[String] = {
        val defaultSpecId = Option(root.get("default-spec-id"))
          .map(_.asInt()).getOrElse(0)
        val curNames = nameMapOf(schemaNodes(currentSchemaId))
        val B = """bucket\[(\d+)\]""".r
        val T = """truncate\[(\d+)\]""".r
        val fields: Option[Seq[GraftCatalog.PartitionField]] =
          specFieldsById.get(defaultSpecId).filter(_.nonEmpty).flatMap { fs =>
            val mapped = fs.map { case (tr, srcId, _) =>
              curNames.get(srcId).flatMap { src =>
                tr match {
                  case "identity" => Some(GraftCatalog.PartitionField("identity", src))
                  case B(n) => Some(GraftCatalog.PartitionField("bucket", src, n.toInt))
                  case T(w) => Some(GraftCatalog.PartitionField("truncate", src, w.toInt))
                  case "year" | "years" => Some(GraftCatalog.PartitionField("year", src))
                  case "month" | "months" => Some(GraftCatalog.PartitionField("month", src))
                  case "day" | "days" => Some(GraftCatalog.PartitionField("day", src))
                  case "hour" | "hours" => Some(GraftCatalog.PartitionField("hour", src))
                  case _ => None
                }
              }
            }
            if (mapped.forall(_.isDefined)) Some(mapped.map(_.get)) else None
          }
        fields.map(GraftCatalog.partitionSpecJson).filter { j =>
          scala.util.Try(GraftCatalog.validatedPartitionSpec(s"$ns.$name",
            Map(GraftCatalog.PartitionSpecProp -> j),
            Some(schemaWithMapping(currentSchemaId)))).isSuccess
        }
      }
      val finalProps = srcProps ++
        (if (srcProps.contains(GraftCatalog.PartitionSpecProp)) None
         else mappedSpec.map(GraftCatalog.PartitionSpecProp -> _))
      if (finalProps.nonEmpty) cat.commitProperties(ns, name, finalProps): Unit

      val allEntries = liveSets.flatten
      ImportReport(s"$ns.$name", steps.size, replaces,
        allEntries.filterNot(_.isDelete).map(_.uri).distinct.size,
        steps.last.entries.filterNot(_.isDelete).map(_.rows).sum,
        usedSchemaIds.size,
        allEntries.filter(_.isDelete).map(_.uri).distinct.size,
        rewriteOf.size + idFillOf.size)
    } catch { case e: Throwable =>
      // failure atomicity: never leave a half-created table behind — the
      // retry must pass the tableExists precondition
      try cat.dropTable(ns, name) catch { case cleanup: Throwable =>
        e.addSuppressed(cleanup)
      }
      throw e
    }
  }

  /** Typed Spark literal for one identity partition value from a
    * manifest tuple (spec avro forms: int/long/string(Utf8)/date(epoch
    * days as int)/timestamp(epoch micros as long)); null stays a typed
    * null (a file in the null partition). */
  private def identityLiteral(tpe: String, v: AnyRef)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.lit
    import org.apache.spark.sql.types._
    val dt: DataType = tpe match {
      case "int" => IntegerType
      case "long" => LongType
      case "string" => StringType
      case "date" => DateType
      case "timestamp" | "timestamptz" => TimestampType
      case other => throw new IllegalArgumentException(
        s"IcebergImport: identity fill on type '$other' is not supported")
    }
    if (v == null) return lit(null).cast(dt)
    dt match {
      case IntegerType => lit(anyInt(v))
      case LongType => lit(anyLong(v))
      case StringType => lit(v.toString)
      case DateType => lit(java.time.LocalDate.ofEpochDay(anyInt(v).toLong))
      case TimestampType => lit(java.time.Instant.EPOCH.plus(
        anyLong(v), java.time.temporal.ChronoUnit.MICROS))
      case _ => throw new IllegalStateException("unreachable")
    }
  }

  /** Target name of column `c` given the parallel (sourceCols ->
    * targetCols) vectors computed at rel-resolution time. */
  private def eraTargetFor(sourceCols: Seq[String], targetCols: Seq[String],
                           c: String): String = {
    val i = sourceCols.indexOf(c)
    if (i < 0) c else targetCols(i)
  }

  private def schemaIdOf(snap: JsonNode, fallback: Int): Int =
    Option(snap.get("schema-id")).map(_.asInt()).getOrElse(fallback)

  /** field-id -> name map of one Iceberg schema JSON (top-level fields —
    * list element ids carry no name). */
  private def nameMapOf(schemaNode: JsonNode): Map[Int, String] =
    schemaNode.get("fields").elements().asScala
      .map(f => f.get("id").asInt() -> f.get("name").asText()).toMap

  /** field-id -> type-text map of one Iceberg schema JSON (list element
    * ids contribute their own entries so element-type changes are also
    * checked). */
  private def typeMapOf(schemaNode: JsonNode): Map[Int, String] =
    schemaNode.get("fields").elements().asScala.flatMap { f =>
      val own = f.get("id").asInt() -> typeText(f.get("type"))
      val t = f.get("type")
      // a primitive LIST element keeps its own promotable entry (list<int>
      // -> list<long> is spec-legal element promotion); deeper nested
      // types are equality-pinned through the canonical own-entry text
      if (!t.isTextual && t.get("type").asText() == "list" &&
          t.get("element").isTextual)
        Seq(own, t.get("element-id").asInt() -> t.get("element").asText())
      else Seq(own)
    }.toMap

  /** Canonical type text for cross-version comparison — recursive for
    * the nested struct/list/map forms (nested types must stay EQUAL
    * across versions; only top-level and list-element primitives ride
    * the promotion lattice). */
  private def typeText(t: JsonNode): String =
    if (t.isTextual) t.asText()
    else t.get("type").asText() match {
      case "list" => s"list<${typeText(t.get("element"))}>"
      case "struct" => "struct<" + t.get("fields").elements().asScala
        .map(f => s"${f.get("name").asText()}:${typeText(f.get("type"))}")
        .mkString(",") + ">"
      case "map" => s"map<${typeText(t.get("key"))},${typeText(t.get("value"))}>"
      case other => s"?$other"
    }

  /** Spec §Schema Evolution: legal primitive promotions. */
  private def promotes(from: String, to: String): Boolean =
    from == to ||
      (from == "int" && to == "long") ||
      (from == "float" && to == "double") || {
        val D = """decimal\((\d+),\s*(\d+)\)""".r
        (from, to) match {
          case (D(p1, s1), D(p2, s2)) => s1 == s2 && p2.toInt >= p1.toInt
          case _ => false
        }
      }

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
