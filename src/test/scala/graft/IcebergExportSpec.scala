package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.functions._

import graft.catalog.{GraftCatalog, IcebergExport}

/** Spec-shape conformance of the Iceberg v2 export (no Iceberg jars in
  * the offline build, so the format itself is the contract under test:
  * iceberg.apache.org/spec — metadata JSON required fields, Avro
  * manifest-list/manifest field names + ids, counts, and an independent
  * read-back that consumes ONLY the exported artifacts). */
class IcebergExportSpec extends SparkSpec {

  private lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def freshCat(): GraftCatalog =
    new GraftCatalog(spark, Files.createTempDirectory("iceberg-export-spec").toString)

  private def readAvro(uri: String): (Seq[GenericRecord], Map[String, String]) = {
    val f = Paths.get(java.net.URI.create(uri)).toFile
    val r = new DataFileReader[GenericRecord](f, new GenericDatumReader[GenericRecord]())
    try {
      val metaKeys = r.getMetaKeys.asScala.toSeq
        .filterNot(_.startsWith("avro.")).map(k => k -> r.getMetaString(k)).toMap
      (r.iterator().asScala.toList, metaKeys)
    } finally r.close()
  }

  test("export emits spec-complete v2 metadata JSON, Avro manifests round-trip, " +
       "and an artifacts-only reader reproduces the table") {
    val cat = freshCat()
    val orders = Tables.orders(spark, sf())
      .select("o_orderkey", "o_custkey", "o_totalprice")
    cat.createTable("ns", "t")
    cat.commitAppend("ns", "t", orders.filter(col("o_orderkey") % 2 === 0))
    cat.commitAppend("ns", "t", orders.filter(col("o_orderkey") % 2 === 1))

    val dest = Files.createTempDirectory("iceberg-out").toString
    val report = IcebergExport.exportTable(cat, "ns", "t", dest)
    assert(report.snapshots === 2)
    assert(!report.timestampInt96Risk)

    // ---- metadata JSON: required v2 fields ----
    val root = mapper.readTree(Files.readAllBytes(Paths.get(report.metadataFile)))
    assert(root.get("format-version").asInt() === 2)
    for (k <- Seq("table-uuid", "location", "last-sequence-number",
        "last-updated-ms", "last-column-id", "current-schema-id", "schemas",
        "default-spec-id", "partition-specs", "default-sort-order-id",
        "sort-orders", "current-snapshot-id", "snapshots", "snapshot-log", "refs"))
      assert(root.has(k), s"metadata missing required field $k")
    val schemaF = root.get("schemas").get(0).get("fields")
    assert(schemaF.size() === 3)
    assert(schemaF.get(0).get("id").asInt() === 1)
    assert(schemaF.get(0).get("name").asText() === "o_orderkey")
    assert(schemaF.get(0).get("type").asText() === "long")
    assert(schemaF.get(2).get("type").asText() === "double")
    val snapsJ = root.get("snapshots").elements().asScala.toSeq
    assert(snapsJ.map(_.get("sequence-number").asLong()) === Seq(1L, 2L))
    assert(snapsJ.last.get("snapshot-id").asLong() ===
      root.get("current-snapshot-id").asLong())
    assert(root.get("refs").get("main").get("snapshot-id").asLong() ===
      root.get("current-snapshot-id").asLong())
    assert(snapsJ.last.get("parent-snapshot-id").asLong() ===
      snapsJ.head.get("snapshot-id").asLong())
    assert(snapsJ.forall(_.get("summary").get("operation").asText() == "append"))

    // ---- manifest list Avro: spec field names, counts ----
    val (listRecs, listMeta) = readAvro(snapsJ.last.get("manifest-list").asText())
    assert(listMeta("format-version") === "2")
    assert(listRecs.size === 2, "head manifest list must carry both commits' manifests")
    val fieldNames = listRecs.head.getSchema.getFields.asScala.map(_.name()).toSet
    for (f <- Seq("manifest_path", "manifest_length", "partition_spec_id", "content",
        "sequence_number", "min_sequence_number", "added_snapshot_id",
        "added_files_count", "existing_files_count", "deleted_files_count",
        "added_rows_count", "existing_rows_count", "deleted_rows_count"))
      assert(fieldNames.contains(f), s"manifest_file missing $f")
    // the counts describe each manifest FILE's entry statuses (spec
    // field 504: entries with status ADDED) — every entry in a shared
    // manifest is ADDED, so a manifest reused by later lists keeps its
    // original counts; snapshots attribute manifests via
    // added_snapshot_id / sequence_number, which must differ here
    assert(listRecs.forall(_.get("added_files_count").asInstanceOf[Int] > 0))
    assert(listRecs.forall(_.get("existing_files_count").asInstanceOf[Int] === 0))
    assert(listRecs.map(_.get("sequence_number").asInstanceOf[Long]).toSet ===
      Set(1L, 2L))
    assert(listRecs.map(_.get("added_snapshot_id").asInstanceOf[Long]).distinct.size === 2)

    // ---- manifest Avro: entry shape + file metadata keys ----
    val (entries, mMeta) = readAvro(listRecs.head.get("manifest_path").toString)
    for (k <- Seq("schema", "partition-spec", "partition-spec-id",
        "format-version", "content"))
      assert(mMeta.contains(k), s"manifest avro metadata missing $k")
    assert(entries.nonEmpty)
    val df0 = entries.head.get("data_file").asInstanceOf[GenericRecord]
    assert(df0.get("file_format").toString === "PARQUET")
    assert(df0.get("record_count").asInstanceOf[Long] > 0L)
    assert(df0.get("file_path").toString.startsWith("file:"))

    // per-manifest added row counts must sum to the table's rows
    val listedRows = listRecs.map(_.get("added_rows_count").asInstanceOf[Long]).sum
    assert(listedRows === orders.count())

    // ---- independent read-back: artifacts only, must equal the source ----
    val back = IcebergExport.readExported(spark, dest)
    assert(back.count() === orders.count())
    assert(back.agg(sum(col("o_orderkey"))).head().getLong(0) ===
      orders.agg(sum(col("o_orderkey"))).head().getLong(0))
  }

  test("replace commits export as overwrite snapshots and the head read-back " +
       "sees only live files") {
    val cat = freshCat()
    val orders = Tables.orders(spark, sf()).select("o_orderkey", "o_totalprice")
    cat.createTable("ns", "r")
    cat.commitAppend("ns", "r", orders.filter(col("o_orderkey") % 4 === 0))
    cat.commitReplace("ns", "r", orders.filter(col("o_orderkey") % 4 === 1))

    val dest = Files.createTempDirectory("iceberg-out-replace").toString
    val report = IcebergExport.exportTable(cat, "ns", "r", dest)
    val root = mapper.readTree(Files.readAllBytes(Paths.get(report.metadataFile)))
    val ops = root.get("snapshots").elements().asScala.toSeq
      .map(_.get("summary").get("operation").asText())
    assert(ops === Seq("append", "overwrite"))
    val back = IcebergExport.readExported(spark, dest)
    val expected = orders.filter(col("o_orderkey") % 4 === 1)
    assert(back.count() === expected.count())
    assert(back.filter(col("o_orderkey") % 4 === 0).count() === 0L)
  }

  test("merge-on-read equality deletes export as v2 delete manifests and the " +
       "artifacts-only reader applies them per the sequence rule") {
    val cat = freshCat()
    val orders = Tables.orders(spark, sf()).select("o_orderkey", "o_totalprice")
    val base = orders.filter(col("o_orderkey") % 4 === 0)
    cat.createTable("ns", "d")
    cat.commitAppend("ns", "d", base)                                     // seq 1
    cat.commitDelete("ns", "d",
      orders.filter(col("o_orderkey") % 8 === 0).select("o_orderkey"))    // seq 2
    // re-add previously-deleted keys: the seq-2 delete must NOT erase
    // seq-3 data (strictly-less rule)
    cat.commitAppend("ns", "d", base.filter(col("o_orderkey") % 8 === 0)) // seq 3
    // upsert: the delete it ships with must not erase its own rows
    cat.commitUpsert("ns", "d",
      base.filter(col("o_orderkey") % 16 === 0)
        .select(col("o_orderkey"),
          round(col("o_totalprice") * 2, 2).as("o_totalprice")),
      Seq("o_orderkey"))                                                  // seq 4

    val dest = Files.createTempDirectory("iceberg-out-mor").toString
    val report = IcebergExport.exportTable(cat, "ns", "d", dest)
    assert(report.deleteFiles > 0)

    val root = mapper.readTree(Files.readAllBytes(Paths.get(report.metadataFile)))
    val snapsJ = root.get("snapshots").elements().asScala.toSeq
    assert(snapsJ.map(_.get("summary").get("operation").asText()) ===
      Seq("append", "delete", "append", "overwrite"))

    // the delete manifest is content=1 in the list; its entries are
    // content=2 with equality_ids naming the key column by field id
    val (l1, _) = readAvro(snapsJ(1).get("manifest-list").asText())
    val delMf = l1.filter(_.get("content").asInstanceOf[Int] == 1)
    assert(delMf.size === 1)
    assert(l1.count(_.get("content").asInstanceOf[Int] == 0) === 1)
    val (delEntries, delMeta) = readAvro(delMf.head.get("manifest_path").toString)
    assert(delMeta("content") === "deletes")
    val ddf = delEntries.head.get("data_file").asInstanceOf[GenericRecord]
    assert(ddf.get("content").asInstanceOf[Int] === 2)
    assert(ddf.get("equality_ids").asInstanceOf[java.util.List[Integer]]
      .asScala.map(_.intValue).toSeq === Seq(1)) // o_orderkey is field id 1

    // catalog view and artifacts-only reader must agree ROW-FOR-ROW at
    // every version (both read the same physical files, so exceptAll is
    // bit-exact)
    for (seq <- 0 to 3) {
      val viaCat = cat.readVersion("ns", "d", seq.toLong)
      val viaFmt = IcebergExport.readExportedAt(spark, dest,
        Some(IcebergExport.exportedSnapshotId(seq)))
      assert(viaFmt.count() === viaCat.count(), s"row count diverges at v$seq")
      assert(viaFmt.exceptAll(viaCat).count() === 0L, s"rows diverge at v$seq")
      assert(viaCat.exceptAll(viaFmt).count() === 0L, s"rows diverge at v$seq")
    }
    // sequence-rule survival: re-added keys and the upsert's own rows live
    val head = IcebergExport.readExported(spark, dest)
    assert(head.count() === base.count())
    assert(head.filter(col("o_orderkey") % 8 === 0).count() ===
      base.filter(col("o_orderkey") % 8 === 0).count())
  }

  test("a commit whose manifests interleave data around a delete (replayed " +
       "multi-sequence foreign snapshot) refuses export — one sequence number " +
       "cannot express it") {
    import spark.implicits._
    val cat = freshCat()
    cat.createTable("ns", "nc")
    // land three files by hand: data f1, an equality-delete keyed on id,
    // data f2 — then pack them NON-canonically (data, delete, data) into
    // one commit via the MoR unit API. Graft's positional rule reads this
    // fine (the delete erases only f1's key), but a single Iceberg
    // sequence number per commit cannot say that.
    def land(rel: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val target = cat.tablePath("ns", "nc").resolve(rel)
      IcebergExport.writeSingleParquet(df, target): Unit
    }
    land("data/f1.parquet", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    land("data/del1.parquet", Seq(Tuple1(1L)).toDF("id"))
    land("data/f2.parquet", Seq((1L, "a2")).toDF("id", "v"))
    cat.commitFilesMor("ns", "nc", Seq(
        (Seq("data/f1.parquet"), graft.catalog.GraftCatalog.UnitData),
        (Seq("data/del1.parquet"), graft.catalog.GraftCatalog.UnitEqDelete),
        (Seq("data/f2.parquet"), graft.catalog.GraftCatalog.UnitData)),
      sourceRegion = "test",
      schemaJson = Some(Seq((1L, "a")).toDF("id", "v").schema.json))
    // graft itself reads it correctly: f1's id=1 erased, f2's survives
    assert(cat.read("ns", "nc").as[(Long, String)].collect().toSet ===
      Set((2L, "b"), (1L, "a2")))
    val e = intercept[IllegalArgumentException] {
      IcebergExport.exportTable(cat, "ns", "nc",
        Files.createTempDirectory("iceberg-nc").toString)
    }
    assert(e.getMessage.contains("sequence numbers"))
  }

  test("a rollback past a replace re-exports cleanly: the position/sequence " +
       "guard keys on FIRST-carrying snapshots, not the immediate parent") {
    val cat = freshCat()
    val orders = Tables.orders(spark, sf()).select("o_orderkey", "o_totalprice")
    cat.createTable("ns", "rb")
    cat.commitAppend("ns", "rb", orders.filter(col("o_orderkey") % 6 === 0)) // v0
    cat.commitDelete("ns", "rb",
      orders.filter(col("o_orderkey") % 12 === 0).select("o_orderkey"))      // v1
    cat.commitAppend("ns", "rb", orders.filter(col("o_orderkey") % 6 === 1)) // v2
    cat.compact("ns", "rb", targetFileBytes = 256L * 1024 * 1024)            // v3
    cat.rollbackTo("ns", "rb", 2L)                                           // v4 = v2's list
    val dest = Files.createTempDirectory("iceberg-rb").toString
    // the rolled-back head re-lists manifests its immediate parent (the
    // compacted v3) does not carry — a parent-diff guard would refuse a
    // perfectly expressible table here
    IcebergExport.exportTable(cat, "ns", "rb", dest): Unit
    val back = IcebergExport.readExported(spark, dest)
    val viaCat = cat.read("ns", "rb")
    assert(back.count() === viaCat.count())
    assert(back.exceptAll(viaCat).count() === 0L)
  }

  test("a crashed export re-runs to completion on the same dest: copies are " +
       "idempotent, metadata is rewritten fresh") {
    val cat = freshCat()
    val orders = Tables.orders(spark, sf()).select("o_orderkey", "o_totalprice")
    cat.createTable("ns", "cx")
    cat.commitAppend("ns", "cx", orders.filter(col("o_orderkey") % 3 === 0))
    cat.commitAppend("ns", "cx", orders.filter(col("o_orderkey") % 3 === 1))
    val dest = Files.createTempDirectory("iceberg-crash").toString
    val first = IcebergExport.exportTable(cat, "ns", "cx", dest)

    // simulate a kill between export steps: the metadata JSON, the
    // version hint, one manifest-list Avro and one copied data file are
    // gone — the partial layout a crash mid-write leaves behind
    Files.delete(Paths.get(first.metadataFile))
    Files.delete(Paths.get(dest, "metadata", "version-hint.text"))
    val metaDir = Paths.get(dest, "metadata")
    Files.list(metaDir).iterator().asScala
      .find(_.getFileName.toString.startsWith("snap-")).foreach(Files.delete)
    Files.list(Paths.get(dest, "data")).iterator().asScala
      .find(_.toString.endsWith(".parquet")).foreach(Files.delete)

    // the SAME call completes the export: deterministic flat names make
    // data copies idempotent (REPLACE_EXISTING), metadata and manifests
    // are rewritten whole — stale avro from the dead attempt is inert
    // garbage the fresh metadata never references
    val second = IcebergExport.exportTable(cat, "ns", "cx", dest)
    assert(second.snapshots === first.snapshots)
    assert(second.dataFiles === first.dataFiles)
    assert(second.rows === first.rows)
    val back = IcebergExport.readExported(spark, dest)
    val expected = orders.filter(col("o_orderkey") % 3 <= 1)
    assert(back.count() === expected.count())
    assert(back.agg(sum(col("o_orderkey"))).head().getLong(0) ===
      expected.agg(sum(col("o_orderkey"))).head().getLong(0))
  }

  test("timestamp exports are physically INT64 micros (bootstrap conf) and the " +
       "INT96 flag only fires for a physically INT96 foreign file") {
    def primitiveTypes(dir: String): Seq[(String, String)] = {
      val files = Files.list(Paths.get(dir, "data")).iterator().asScala.toSeq
        .filter(_.getFileName.toString.endsWith(".parquet"))
      files.flatMap { p =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(p.toString),
          spark.sparkContext.hadoopConfiguration)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getFileMetaData.getSchema.getColumns.asScala.map { c =>
          (c.getPath.mkString("."),
            c.getPrimitiveType.getPrimitiveTypeName.toString)
        }.toSeq
        finally r.close()
      }
    }
    val cat = freshCat()
    val ev = Tables.events(spark, sf()).select("event_id", "ts").limit(100)
    cat.createTable("ns", "ts")
    cat.commitAppend("ns", "ts", ev)
    val dest = Files.createTempDirectory("iceberg-out-ts").toString
    val report = IcebergExport.exportTable(cat, "ns", "ts", dest)
    // bootstrap forces TIMESTAMP_MICROS, so the risk is structurally
    // false AND the exported files are physically INT64
    assert(!report.timestampInt96Risk)
    val tsTypes = primitiveTypes(dest).filter(_._1 == "ts").map(_._2).distinct
    assert(tsTypes === Seq("INT64"), s"ts column not INT64: $tsTypes")
    // and the schema maps to timestamptz per spec
    val root = mapper.readTree(Files.readAllBytes(Paths.get(report.metadataFile)))
    val types = root.get("schemas").get(0).get("fields").elements().asScala
      .map(_.get("type").asText()).toSeq
    assert(types.contains("timestamptz"))

    // the verdict is PHYSICAL, not schema-derived: a file a FOREIGN
    // writer landed as INT96 and registered via commitFiles (bypassing
    // the catalog's micros-forcing staging path) must flip the flag
    // even though the table schema is identical
    val cat96 = freshCat()
    cat96.createTable("ns", "ts96")
    val foreign = Files.createTempDirectory("foreign-int96")
    val prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    try {
      spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
      ev.coalesce(1).write.mode("overwrite").parquet(foreign.toString)
    } finally spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    val dataDir = cat96.tablePath("ns", "ts96").resolve("data/foreign")
    Files.createDirectories(dataDir)
    val rels = Files.list(foreign).iterator().asScala.toSeq
      .filter(_.getFileName.toString.endsWith(".parquet")).map { p =>
        Files.copy(p, dataDir.resolve(p.getFileName)): Unit
        s"data/foreign/${p.getFileName}"
      }
    cat96.commitFiles("ns", "ts96", rels, sourceRegion = "test",
      schemaJson = Some(ev.schema.json))
    val report96 = IcebergExport.exportTable(cat96, "ns", "ts96",
      Files.createTempDirectory("iceberg-out-ts96").toString)
    assert(report96.timestampInt96Risk)
  }

  test("the read-back consumes a FOREIGN-written Iceberg layout: different id " +
       "conventions, reordered avro fields, DELETED entries excluded") {
    import org.apache.avro.Schema
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter}
    // independent writer: hand-authored artifacts, avro fields in a
    // DIFFERENT order than IcebergExport emits (name-based resolution,
    // not positional), random-looking snapshot ids, version-hint 3
    val loc = Files.createTempDirectory("iceberg-foreign")
    val meta = loc.resolve("metadata"); Files.createDirectories(meta)
    val dataDir = loc.resolve("data"); Files.createDirectories(dataDir)
    import spark.implicits._
    val live = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name")
    val dead = Seq((99L, "zz")).toDF("id", "name")
    live.coalesce(1).write.parquet(dataDir.resolve("live").toString)
    dead.coalesce(1).write.parquet(dataDir.resolve("dead").toString)
    def onlyParquet(dir: java.nio.file.Path): String =
      Files.list(dir).iterator().asScala
        .find(_.toString.endsWith(".parquet")).get.toUri.toString

    val entrySchema = new Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        {"name":"data_file","type":{"type":"record","name":"r2","fields":[
          {"name":"file_path","type":"string","field-id":100},
          {"name":"record_count","type":"long","field-id":103},
          {"name":"file_size_in_bytes","type":"long","field-id":104},
          {"name":"file_format","type":"string","field-id":101},
          {"name":"content","type":"int","field-id":134}
        ]},"field-id":2},
        {"name":"status","type":"int","field-id":0},
        {"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1}
      ]}""")
    val manifestPath = meta.resolve("foreign-manifest.avro")
    val mw = new DataFileWriter[org.apache.avro.generic.GenericRecord](
      new GenericDatumWriter[org.apache.avro.generic.GenericRecord](entrySchema))
    mw.create(entrySchema, manifestPath.toFile)
    def entry(uri: String, status: Int, rows: Long) = {
      val df = new GenericData.Record(entrySchema.getField("data_file").schema())
      df.put("file_path", uri); df.put("record_count", Long.box(rows))
      df.put("file_size_in_bytes", Long.box(1L)); df.put("file_format", "PARQUET")
      df.put("content", Int.box(0))
      val r = new GenericData.Record(entrySchema)
      r.put("data_file", df); r.put("status", Int.box(status))
      r.put("snapshot_id", Long.box(7700000001L))
      r
    }
    mw.append(entry(onlyParquet(dataDir.resolve("live")), 1, 3L))
    mw.append(entry(onlyParquet(dataDir.resolve("dead")), 2, 1L)) // DELETED
    mw.close()

    val listSchema = new Schema.Parser().parse(
      """{"type":"record","name":"manifest_file","fields":[
        {"name":"added_snapshot_id","type":"long","field-id":503},
        {"name":"manifest_path","type":"string","field-id":500},
        {"name":"manifest_length","type":"long","field-id":501},
        {"name":"content","type":"int","field-id":517},
        {"name":"partition_spec_id","type":"int","field-id":502},
        {"name":"sequence_number","type":"long","field-id":515},
        {"name":"min_sequence_number","type":"long","field-id":516}
      ]}""")
    val listPath = meta.resolve("snap-7700000001-foreign.avro")
    val lw = new DataFileWriter[org.apache.avro.generic.GenericRecord](
      new GenericDatumWriter[org.apache.avro.generic.GenericRecord](listSchema))
    lw.create(listSchema, listPath.toFile)
    val lr = new GenericData.Record(listSchema)
    lr.put("added_snapshot_id", Long.box(7700000001L))
    lr.put("manifest_path", manifestPath.toUri.toString)
    lr.put("manifest_length", Long.box(Files.size(manifestPath)))
    lr.put("content", Int.box(0)); lr.put("partition_spec_id", Int.box(0))
    lr.put("sequence_number", Long.box(1L)); lr.put("min_sequence_number", Long.box(1L))
    lw.append(lr); lw.close()

    val metadataJson =
      s"""{"format-version":2,"table-uuid":"0000-foreign","location":"${loc.toUri}",
          "last-sequence-number":1,"last-updated-ms":1,"last-column-id":2,
          "current-schema-id":5,
          "schemas":[{"type":"struct","schema-id":5,"fields":[
            {"id":1,"name":"id","required":false,"type":"long"},
            {"id":2,"name":"name","required":false,"type":"string"}]}],
          "default-spec-id":0,"partition-specs":[{"spec-id":0,"fields":[]}],
          "default-sort-order-id":0,"sort-orders":[{"order-id":0,"fields":[]}],
          "current-snapshot-id":7700000001,
          "snapshots":[{"snapshot-id":7700000001,"sequence-number":1,"timestamp-ms":1,
            "summary":{"operation":"append","foreign-extra":"ignored"},
            "manifest-list":"${listPath.toUri}","schema-id":5}],
          "snapshot-log":[],"metadata-log":[]}"""
    Files.write(meta.resolve("v3.metadata.json"),
      metadataJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Files.write(meta.resolve("version-hint.text"),
      "3".getBytes(java.nio.charset.StandardCharsets.UTF_8))

    val back = IcebergExport.readExported(spark, loc.toString)
    assert(back.columns.toSeq === Seq("id", "name"))
    assert(back.count() === 3L, "DELETED entry must be excluded")
    assert(back.agg(sum(col("id"))).head().getLong(0) === 6L)
  }

  test("schema-evolved tables read back with pre-evolution files null-filled") {
    val cat = freshCat()
    val orders = Tables.orders(spark, sf())
    cat.createTable("ns", "e")
    cat.commitAppend("ns", "e", orders.filter(col("o_orderkey") % 3 === 0)
      .select("o_orderkey", "o_totalprice"))
    cat.commitAppend("ns", "e", orders.filter(col("o_orderkey") % 3 === 1)
      .select("o_orderkey", "o_totalprice", "o_orderstatus"))
    val dest = Files.createTempDirectory("iceberg-out-evolve").toString
    IcebergExport.exportTable(cat, "ns", "e", dest)
    val back = IcebergExport.readExported(spark, dest)
    // projection comes from the METADATA schema, so files written before
    // the column existed read it as null (what a field-id reader does)
    assert(back.columns.toSeq === Seq("o_orderkey", "o_totalprice", "o_orderstatus"))
    val preEvolution = orders.filter(col("o_orderkey") % 3 === 0).count()
    assert(back.filter(col("o_orderstatus").isNull).count() === preEvolution)
    assert(back.count() ===
      orders.filter(col("o_orderkey") % 3 === 0).count() +
      orders.filter(col("o_orderkey") % 3 === 1).count())
  }

  test("RENAMED tables export as one field id with per-version names + " +
       "a name-mapping property, and round-trip through import") {
    import spark.implicits._
    val wh = Files.createTempDirectory("iceberg-ren-src").toString
    val cat = new GraftCatalog(spark, wh)
    val c = graft.catalog.GraftSparkCatalog.registerSqlCatalog(spark, wh)
    spark.sql(s"CREATE TABLE $c.ns.rt (id BIGINT, qty BIGINT)")
    spark.sql(s"INSERT INTO $c.ns.rt VALUES (1, 10), (2, 20)")
    spark.sql(s"ALTER TABLE $c.ns.rt RENAME COLUMN qty TO quantity")
    spark.sql(s"INSERT INTO $c.ns.rt VALUES (3, 30)")

    val dest = Files.createTempDirectory("iceberg-out-ren").toString
    val report = IcebergExport.exportTable(cat, "ns", "rt", dest)
    val root = mapper.readTree(Files.readAllBytes(Paths.get(report.metadataFile)))

    // the RENAME is one field id whose name differs per schema version —
    // the spec-native representation (never drop+add of a fresh id)
    val schemas = root.get("schemas").elements().asScala.toSeq
    def idOf(s: com.fasterxml.jackson.databind.JsonNode, n: String): Option[Int] =
      s.get("fields").elements().asScala.find(_.get("name").asText() == n)
        .map(_.get("id").asInt())
    val preIds = schemas.flatMap(idOf(_, "qty"))
    val postIds = schemas.flatMap(idOf(_, "quantity"))
    assert(preIds.nonEmpty && postIds.nonEmpty)
    assert((preIds ++ postIds).distinct.size === 1,
      s"qty/quantity must share ONE field id, got pre=$preIds post=$postIds")

    // the name-mapping property resolves the PHYSICAL parquet names
    val nm = root.get("properties").get("schema.name-mapping.default")
    assert(nm != null, "renamed export must emit schema.name-mapping.default")
    val nmEntries = mapper.readTree(nm.asText()).elements().asScala.toSeq
    assert(nmEntries.exists(e =>
      e.get("names").elements().asScala.exists(_.asText() == "qty") &&
        e.get("field-id").asInt() === postIds.head))

    // the artifacts-only reader sees the HEAD names
    val back = IcebergExport.readExported(spark, dest)
    assert(back.columns.toSeq === Seq("id", "quantity"))
    assert(back.agg(sum("quantity")).head().getLong(0) === 60L)

    // full import roundtrip into a fresh catalog
    val cat2 = new GraftCatalog(spark,
      Files.createTempDirectory("iceberg-ren-dst").toString)
    graft.catalog.IcebergImport.importTable(cat2, "ns", "rt", dest)
    val got = cat2.read("ns", "rt")
    assert(got.columns.toSeq === Seq("id", "quantity"))
    assert(got.select("id", "quantity").as[(Long, Long)].collect().toSet ===
      Set((1L, 10L), (2L, 20L), (3L, 30L)))
    // some imported version still reads the PRE-rename name
    val eras = cat2.snapshots("ns", "rt").flatMap(_.schemaJson)
      .map(j => org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSeq)
    assert(eras.exists(_.contains("qty")) && eras.last.contains("quantity"))
  }

  test("renames x position deletes round-trip through a name-mapped " +
       "export: files plain-copy (no rewrite), ordinals stay valid, and " +
       "the imported table carries the column mapping natively") {
    import spark.implicits._
    val wh = Files.createTempDirectory("iceberg-renpd-src").toString
    val cat = new GraftCatalog(spark, wh)
    val c = graft.catalog.GraftSparkCatalog.registerSqlCatalog(spark, wh)
    spark.sql(s"CREATE TABLE $c.ns.rp (id BIGINT, qty BIGINT)")
    spark.sql(s"INSERT INTO $c.ns.rp VALUES (1, 10), (2, 20), (3, 30)")
    // position-delete one physical row of the pre-rename file
    cat.commitDeletePositions("ns", "rp",
      cat.positionsWhere("ns", "rp", col("id") === 2L))
    spark.sql(s"ALTER TABLE $c.ns.rp RENAME COLUMN qty TO quantity")
    spark.sql(s"INSERT INTO $c.ns.rp VALUES (4, 40)")
    assert(spark.sql(s"SELECT sum(quantity) FROM $c.ns.rp").head().getLong(0) === 80L)

    val dest = Files.createTempDirectory("iceberg-out-renpd").toString
    val report = IcebergExport.exportTable(cat, "ns", "rp", dest)
    // the artifacts-only reader agrees (position rule through the format)
    assert(IcebergExport.readExported(spark, dest)
      .agg(sum("quantity")).head().getLong(0) === 80L)

    // import: NO rename rewrites (name-mapped → single physical era)
    val cat2 = new GraftCatalog(spark,
      Files.createTempDirectory("iceberg-renpd-dst").toString)
    val rep = graft.catalog.IcebergImport.importTable(cat2, "ns", "rp", dest)
    assert(rep.rewrittenFiles === 0,
      s"name-mapped import must plain-copy, rewrote ${rep.rewrittenFiles}")
    val got = cat2.read("ns", "rp")
    assert(got.columns.toSeq === Seq("id", "quantity"))
    assert(got.select("id", "quantity").as[(Long, Long)].collect().toSet ===
      Set((1L, 10L), (3L, 30L), (4L, 40L)))
    // the mapping is native in the destination: a FURTHER rename works
    val c2 = graft.catalog.GraftSparkCatalog.registerSqlCatalog(spark, cat2.warehouse)
    spark.sql(s"ALTER TABLE $c2.ns.rp RENAME COLUMN quantity TO amount")
    assert(spark.sql(s"SELECT sum(amount) FROM $c2.ns.rp").head().getLong(0) === 80L)
    assert(report.snapshots >= 3)
  }

  test("a renamed table WITH nested columns emits nested name-mapping " +
       "entries (spec: unmapped nested fields read null) and round-trips") {
    import spark.implicits._
    val wh = Files.createTempDirectory("iceberg-rennest-src").toString
    val cat = new GraftCatalog(spark, wh)
    val c = graft.catalog.GraftSparkCatalog.registerSqlCatalog(spark, wh)
    spark.sql(s"CREATE TABLE $c.ns.rn (id BIGINT, qty BIGINT, " +
      "meta STRUCT<tag: STRING, w: DOUBLE>)")
    spark.sql(s"INSERT INTO $c.ns.rn VALUES (1, 10, named_struct('tag', 'a', 'w', 0.5))")
    spark.sql(s"ALTER TABLE $c.ns.rn RENAME COLUMN qty TO quantity")
    spark.sql(s"INSERT INTO $c.ns.rn VALUES (2, 20, named_struct('tag', 'b', 'w', 1.5))")
    val dest = Files.createTempDirectory("iceberg-out-rennest").toString
    val report = IcebergExport.exportTable(cat, "ns", "rn", dest)
    val root = mapper.readTree(Files.readAllBytes(Paths.get(report.metadataFile)))
    val nm = mapper.readTree(
      root.get("properties").get("schema.name-mapping.default").asText())
    val metaEntry = nm.elements().asScala
      .find(e => e.get("names").elements().asScala.exists(_.asText() == "meta"))
      .getOrElse(fail("no mapping entry for the struct column"))
    val nestedNames = metaEntry.get("fields").elements().asScala
      .flatMap(_.get("names").elements().asScala.map(_.asText())).toSet
    assert(nestedNames === Set("tag", "w"),
      s"nested mapping entries must cover the struct fields, got $nestedNames")
    // artifacts-only reader resolves BOTH the renamed flat column and
    // the nested values through the mapping
    val back = IcebergExport.readExported(spark, dest)
    assert(back.select(col("quantity")).as[Long].collect().sorted.toSeq ===
      Seq(10L, 20L))
    assert(back.select(col("meta.w")).as[Double].collect().sorted.toSeq ===
      Seq(0.5, 1.5))
    // and the full import
    val cat2 = new GraftCatalog(spark,
      Files.createTempDirectory("iceberg-rennest-dst").toString)
    graft.catalog.IcebergImport.importTable(cat2, "ns", "rn", dest)
    assert(cat2.read("ns", "rn").select(col("meta.tag")).as[String]
      .collect().sorted.toSeq === Seq("a", "b"))
  }

  test("ALTER COLUMN TYPE promotions stay exportable: one field id, " +
       "per-version types, int32 pages read under the widened schema") {
    import spark.implicits._
    val wh = Files.createTempDirectory("iceberg-promo-src").toString
    val cat = new GraftCatalog(spark, wh)
    val c = graft.catalog.GraftSparkCatalog.registerSqlCatalog(spark, wh)
    spark.sql(s"CREATE TABLE $c.ns.pm (id INT, v STRING)")
    spark.sql(s"INSERT INTO $c.ns.pm VALUES (1, 'a')")
    spark.sql(s"ALTER TABLE $c.ns.pm ALTER COLUMN id TYPE BIGINT")
    spark.sql(s"INSERT INTO $c.ns.pm VALUES (2147483648, 'b')") // needs 64 bits
    val dest = Files.createTempDirectory("iceberg-out-promo").toString
    val report = IcebergExport.exportTable(cat, "ns", "pm", dest)
    val root = mapper.readTree(Files.readAllBytes(Paths.get(report.metadataFile)))
    // one field id for 'id' across versions; each schema its own type
    val types = root.get("schemas").elements().asScala.toSeq.flatMap { s =>
      s.get("fields").elements().asScala
        .filter(_.get("name").asText() == "id")
        .map(f => (f.get("id").asInt(), f.get("type").asText()))
    }
    assert(types.map(_._1).distinct.size === 1,
      s"'id' must keep ONE field id across versions, got $types")
    assert(types.map(_._2).toSet === Set("int", "long"), s"got $types")
    // the read-back widens int32 pages natively
    assert(IcebergExport.readExported(spark, dest)
      .agg(sum("id")).head().getLong(0) === 2147483649L)
    // and the import replays the promotion
    val cat2 = new GraftCatalog(spark,
      Files.createTempDirectory("iceberg-promo-dst").toString)
    graft.catalog.IcebergImport.importTable(cat2, "ns", "pm", dest)
    assert(cat2.tableSchema("ns", "pm").get.fields
      .find(_.name == "id").get.dataType ===
      org.apache.spark.sql.types.LongType)
    assert(cat2.read("ns", "pm").agg(sum("id")).head().getLong(0) === 2147483649L)
  }

  test("TBLPROPERTIES survive the export->import roundtrip (Iceberg's " +
       "metadata properties map)") {
    import spark.implicits._
    val wh = Files.createTempDirectory("iceberg-prop-src").toString
    val cat = new GraftCatalog(spark, wh)
    cat.createTable("ns", "pp")
    cat.commitAppend("ns", "pp", Seq((1L, "a")).toDF("id", "v"))
    cat.commitProperties("ns", "pp", Map(
      "write.target-file-size-bytes" -> "268435456", "owner.team" -> "data"))
    val dest = Files.createTempDirectory("iceberg-out-prop").toString
    val report = IcebergExport.exportTable(cat, "ns", "pp", dest)
    val root = mapper.readTree(Files.readAllBytes(Paths.get(report.metadataFile)))
    assert(root.get("properties").get("owner.team").asText() === "data")
    assert(root.get("properties").get("write.target-file-size-bytes")
      .asText() === "268435456")
    val cat2 = new GraftCatalog(spark,
      Files.createTempDirectory("iceberg-prop-dst").toString)
    graft.catalog.IcebergImport.importTable(cat2, "ns", "pp", dest)
    assert(cat2.tableProperties("ns", "pp") === Map(
      "write.target-file-size-bytes" -> "268435456", "owner.team" -> "data"))
    assert(cat2.targetFileSizeBytes("ns", "pp") === 268435456L)
  }

  // ---- shared content-addressed store: O(delta) metadata re-export ----

  /** Every file in the store, name -> md5 (byte identity across exports). */
  private def storeState(shared: String): Map[String, String] = {
    def files(sub: String): Seq[java.nio.file.Path] = {
      val d = Paths.get(shared, sub)
      if (!Files.isDirectory(d)) Seq.empty
      else { val s = Files.list(d); try s.iterator().asScala.toList finally s.close() }
    }
    (files("data") ++ files("metadata")).map { p =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(Files.readAllBytes(p)).map("%02x".format(_)).mkString
      s"${p.getParent.getFileName}/${p.getFileName}" -> h
    }.toMap
  }

  test("shared-store re-export is O(delta): unchanged manifests, lists, and " +
       "data files reuse byte-identical store objects; only the new commit writes") {
    val cat = freshCat()
    val orders = Tables.orders(spark, sf())
      .select("o_orderkey", "o_custkey", "o_totalprice")
    cat.createTable("ns", "sh")
    cat.commitAppend("ns", "sh", orders.filter(col("o_orderkey") % 3 === 0))
    cat.commitAppend("ns", "sh", orders.filter(col("o_orderkey") % 3 === 1))

    val shared = Files.createTempDirectory("iceberg-shared").toString
    val dest1 = Files.createTempDirectory("iceberg-sh1").toString
    val r1 = IcebergExport.exportTable(cat, "ns", "sh", dest1,
      sharedStore = Some(shared))
    assert(r1.reusedManifests === 0 && r1.writtenManifests === 2)
    assert(r1.reusedLists === 0 && r1.writtenLists === 2)
    assert(Files.isRegularFile(Paths.get(dest1, "refs.txt")))
    val before = storeState(shared)

    cat.commitAppend("ns", "sh", orders.filter(col("o_orderkey") % 3 === 2))
    val dest2 = Files.createTempDirectory("iceberg-sh2").toString
    val r2 = IcebergExport.exportTable(cat, "ns", "sh", dest2,
      sharedStore = Some(shared))
    // exactly the delta: one new manifest, one new list, the new files
    assert(r2.reusedManifests === 2 && r2.writtenManifests === 1)
    assert(r2.reusedLists === 2 && r2.writtenLists === 1)
    assert(r2.copiedDataFiles === r2.dataFiles - r1.dataFiles)
    assert(r2.copiedDataFiles > 0)
    // every pre-existing store object is byte-untouched (reuse, not rewrite)
    val after = storeState(shared)
    before.foreach { case (n, h) =>
      assert(after.get(n).contains(h), s"store object $n changed across re-export") }
    // and both trees read back complete tables
    assert(IcebergExport.readExported(spark, dest2).count() === orders.count())
    assert(IcebergExport.readExported(spark, dest1).count() ===
      orders.filter(col("o_orderkey") % 3 =!= 2).count())
    assert(IcebergExport.readExported(spark, dest2)
      .agg(sum(col("o_orderkey"))).head().getLong(0) ===
      orders.agg(sum(col("o_orderkey"))).head().getLong(0))
  }

  test("shared-store reuse across DIFFERENT warehouse roots (round-15, " +
       "the DR/mirror scenario): a byte-mirrored warehouse at a new " +
       "root re-derives digest-identical store objects — zero data " +
       "copies, zero manifest/list writes, every store object " +
       "byte-untouched — because the digests embed only rel-path-" +
       "stable inputs; a fresh commit on the mirror then composes " +
       "O(delta); a mirror whose rel paths drifted (compaction " +
       "re-staged the files) derives NEW names and never serves " +
       "stale objects") {
    val whA = Files.createTempDirectory("iceberg-mirror-a").toString
    val catA = new GraftCatalog(spark, whA)
    val orders = Tables.orders(spark, sf())
      .select("o_orderkey", "o_custkey", "o_totalprice")
    catA.createTable("ns", "m")
    catA.commitAppend("ns", "m", orders.filter(col("o_orderkey") % 3 === 0))
    catA.commitAppend("ns", "m", orders.filter(col("o_orderkey") % 3 === 1))
    val shared = Files.createTempDirectory("iceberg-mirror-store").toString
    val destA = Files.createTempDirectory("iceberg-mirror-da").toString
    val rA = IcebergExport.exportTable(catA, "ns", "m", destA,
      sharedStore = Some(shared))
    assert(rA.writtenManifests === 2 && rA.writtenLists === 2)
    val before = storeState(shared)

    // byte-mirror the warehouse to a DIFFERENT root
    def copyTree(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
      val s = Files.walk(src)
      try s.iterator().asScala.foreach { p =>
        val t = dst.resolve(src.relativize(p))
        if (Files.isDirectory(p)) Files.createDirectories(t): Unit
        else Files.copy(p, t,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
      } finally s.close()
    }
    val whB = Files.createTempDirectory("iceberg-mirror-b").toString
    copyTree(Paths.get(whA), Paths.get(whB))
    val catB = new GraftCatalog(spark, whB)
    assert(catB.read("ns", "m").count() === catA.read("ns", "m").count())

    // B's first export against the SAME store: complete reuse
    val destB = Files.createTempDirectory("iceberg-mirror-db").toString
    val rB = IcebergExport.exportTable(catB, "ns", "m", destB,
      sharedStore = Some(shared))
    assert(rB.copiedDataFiles === 0,
      s"mirror re-export must copy no data (copied=${rB.copiedDataFiles})")
    assert(rB.writtenManifests === 0 && rB.reusedManifests === 2,
      s"mirror re-export must reuse every manifest " +
        s"(written=${rB.writtenManifests})")
    assert(rB.writtenLists === 0 && rB.reusedLists === 2,
      s"mirror re-export must reuse every manifest list " +
        s"(written=${rB.writtenLists})")
    val afterB = storeState(shared)
    assert(afterB === before, "B's export must leave the store byte-identical")
    assert(IcebergExport.readExported(spark, destB).count() ===
      catB.read("ns", "m").count())

    // a fresh commit on the MIRROR composes O(delta) on the shared store
    catB.commitAppend("ns", "m", orders.filter(col("o_orderkey") % 3 === 2))
    val destB2 = Files.createTempDirectory("iceberg-mirror-db2").toString
    val rB2 = IcebergExport.exportTable(catB, "ns", "m", destB2,
      sharedStore = Some(shared))
    assert(rB2.reusedManifests === 2 && rB2.writtenManifests === 1)
    assert(rB2.reusedLists === 2 && rB2.writtenLists === 1)
    assert(rB2.copiedDataFiles > 0)
    val afterB2 = storeState(shared)
    before.foreach { case (n, h) =>
      assert(afterB2.get(n).contains(h),
        s"store object $n changed across the mirror's commit") }
    assert(IcebergExport.readExported(spark, destB2).count() ===
      orders.count())
    assert(IcebergExport.readExported(spark, destB2)
      .agg(sum(col("o_orderkey"))).head().getLong(0) ===
      orders.agg(sum(col("o_orderkey"))).head().getLong(0))

    // rel-path DRIFT: a mirror whose restore re-staged the files
    // (compaction rewrites every rel path) derives NEW store names —
    // content addressing writes fresh objects and can never serve the
    // drifted table through stale ones
    val whC = Files.createTempDirectory("iceberg-mirror-c").toString
    copyTree(Paths.get(whA), Paths.get(whC))
    val catC = new GraftCatalog(spark, whC)
    catC.compact("ns", "m"): Unit
    val destC = Files.createTempDirectory("iceberg-mirror-dc").toString
    val rC = IcebergExport.exportTable(catC, "ns", "m", destC,
      sharedStore = Some(shared))
    assert(rC.writtenManifests > 0,
      "drifted rel paths must derive fresh store objects, not reuse")
    assert(rC.copiedDataFiles > 0)
    assert(IcebergExport.readExported(spark, destC).count() ===
      catC.read("ns", "m").count())
    // and the drift wrote NEW names; nothing pre-existing was touched
    val afterC = storeState(shared)
    before.foreach { case (n, h) =>
      assert(afterC.get(n).contains(h),
        s"store object $n changed across the drifted export") }
  }

  test("shared-store MoR re-export reuses equality-delete manifests and " +
       "rewritten position-delete files; the read-back still applies both") {
    val cat = freshCat()
    val orders = Tables.orders(spark, sf()).select("o_orderkey", "o_totalprice")
    val base = orders.filter(col("o_orderkey") % 4 === 0)
    cat.createTable("ns", "shm")
    cat.commitAppend("ns", "shm", base)
    cat.commitDelete("ns", "shm",
      orders.filter(col("o_orderkey") % 8 === 0).select("o_orderkey"))
    cat.commitDeletePositions("ns", "shm",
      cat.positionsWhere("ns", "shm", col("o_orderkey") % 16 === 4))

    val shared = Files.createTempDirectory("iceberg-shared-mor").toString
    val dest1 = Files.createTempDirectory("iceberg-shm1").toString
    val r1 = IcebergExport.exportTable(cat, "ns", "shm", dest1,
      sharedStore = Some(shared))
    val expectHead = IcebergExport.readExported(spark, dest1)
    val expectCnt = expectHead.count()
    val before = storeState(shared)

    cat.commitUpsert("ns", "shm",
      base.filter(col("o_orderkey") % 32 === 0)
        .select(col("o_orderkey"),
          round(col("o_totalprice") * 2, 2).as("o_totalprice")),
      Seq("o_orderkey"))
    val dest2 = Files.createTempDirectory("iceberg-shm2").toString
    val r2 = IcebergExport.exportTable(cat, "ns", "shm", dest2,
      sharedStore = Some(shared))
    // all three prior manifests (data, equality-delete, position-delete)
    // reuse; the upsert adds its delete+data manifests
    assert(r2.reusedManifests === r1.writtenManifests)
    assert(r2.writtenManifests === 2)
    assert(r2.reusedLists === r1.writtenLists && r2.writtenLists === 1)
    val after = storeState(shared)
    before.foreach { case (n, h) =>
      assert(after.get(n).contains(h), s"store object $n changed across re-export") }
    // MoR semantics through the reused artifacts: catalog and format agree
    val head = IcebergExport.readExported(spark, dest2)
    val viaCat = cat.read("ns", "shm")
    assert(head.count() === viaCat.count())
    assert(head.exceptAll(viaCat).count() === 0L)
    assert(viaCat.exceptAll(head).count() === 0L)
    // the superseded tree still serves its own (pre-upsert) version
    assert(IcebergExport.readExported(spark, dest1).count() === expectCnt)
  }

  test("snapshot expiry re-exports O(expired): persisted attribution + " +
       "seq-keyed ids keep every surviving manifest and all but one list " +
       "byte-reused; the sweep reclaims retired objects while the " +
       "serving window stays readable") {
    val cat = freshCat()
    val orders = Tables.orders(spark, sf()).select("o_orderkey", "o_totalprice")
    cat.createTable("ns", "she")
    cat.commitAppend("ns", "she", orders.filter(col("o_orderkey") % 3 === 0))
    cat.commitAppend("ns", "she", orders.filter(col("o_orderkey") % 3 === 1))
    cat.commitAppend("ns", "she", orders.filter(col("o_orderkey") % 3 === 2))

    val shared = Files.createTempDirectory("iceberg-shared-exp").toString
    val dest1 = Files.createTempDirectory("iceberg-she1").toString
    IcebergExport.exportTable(cat, "ns", "she", dest1,
      sharedStore = Some(shared)): Unit

    cat.expireSnapshots("ns", "she", retainLast = 2): Unit
    val dest2 = Files.createTempDirectory("iceberg-she2").toString
    val r2 = IcebergExport.exportTable(cat, "ns", "she", dest2,
      sharedStore = Some(shared))
    // round-15: expiry is O(expired), not O(history) — snapshot ids are
    // graft-seq-keyed (stable across expiry) and each manifest's
    // attribution was PERSISTED at first export, so every surviving
    // manifest reuses byte-exact and only the oldest retained
    // snapshot's list rewrites (its parent pointer died with the
    // expired snapshot); the newer list reuses verbatim.
    assert(r2.reusedManifests === 3 && r2.writtenManifests === 0,
      s"expiry must not rewrite surviving manifests " +
        s"(reused=${r2.reusedManifests}, written=${r2.writtenManifests})")
    assert(r2.reusedLists === 1 && r2.writtenLists === 1,
      s"only the expiry-adjacent list rewrites " +
        s"(reused=${r2.reusedLists}, written=${r2.writtenLists})")

    // sweep with the serving window (new + superseded) keeps both readable
    val swept = IcebergExport.sweepSharedStore(shared, Seq(
      s"$dest2/refs.txt", s"$dest1/refs.txt"))
    assert(swept.isEmpty,
      s"window refs must retain everything both trees use, swept: $swept")
    assert(IcebergExport.readExported(spark, dest1).count() === orders.count())
    assert(IcebergExport.readExported(spark, dest2).count() === orders.count())

    // narrowing the window to the new tree reclaims the retired objects
    // (old manifests/lists whose attribution died with the expiry)
    val swept2 = IcebergExport.sweepSharedStore(shared, Seq(s"$dest2/refs.txt"))
    assert(swept2.nonEmpty)
    assert(IcebergExport.readExported(spark, dest2).count() === orders.count())
    assert(IcebergExport.readExported(spark, dest2)
      .agg(sum(col("o_orderkey"))).head().getLong(0) ===
      orders.agg(sum(col("o_orderkey"))).head().getLong(0))
  }

  test("schema evolution between shared-store exports rewrites the embedded " +
       "metadata (digests moved) instead of serving stale schemas") {
    import spark.implicits._
    val wh = Files.createTempDirectory("iceberg-shev-src").toString
    val cat = new GraftCatalog(spark, wh)
    val c = graft.catalog.GraftSparkCatalog.registerSqlCatalog(spark, wh)
    spark.sql(s"CREATE TABLE $c.ns.shv (id BIGINT, qty BIGINT)")
    spark.sql(s"INSERT INTO $c.ns.shv VALUES (1, 10), (2, 20)")

    val shared = Files.createTempDirectory("iceberg-shared-ev").toString
    val dest1 = Files.createTempDirectory("iceberg-shv1").toString
    val r1 = IcebergExport.exportTable(cat, "ns", "shv", dest1,
      sharedStore = Some(shared))
    assert(r1.writtenManifests >= 1 && r1.reusedManifests === 0)

    spark.sql(s"ALTER TABLE $c.ns.shv RENAME COLUMN qty TO quantity")
    spark.sql(s"INSERT INTO $c.ns.shv VALUES (3, 30)")
    val dest2 = Files.createTempDirectory("iceberg-shv2").toString
    val r2 = IcebergExport.exportTable(cat, "ns", "shv", dest2,
      sharedStore = Some(shared))
    // the head schema is embedded in every manifest: evolution must
    // rewrite them all, never reuse the stale-schema objects
    assert(r2.reusedManifests === 0)
    val back = IcebergExport.readExported(spark, dest2)
    assert(back.columns.toSeq === Seq("id", "quantity"))
    assert(back.select("id", "quantity").as[(Long, Long)].collect().toSet ===
      Set((1L, 10L), (2L, 20L), (3L, 30L)))
  }

  test("array-of-primitive columns export with list element ids past the " +
       "top-level ids") {
    val cat = freshCat()
    val emb = Tables.embeddings(spark, sf()).select("vec_id", "embedding").limit(50)
    cat.createTable("ns", "v")
    cat.commitAppend("ns", "v", emb)
    val dest = Files.createTempDirectory("iceberg-out-vec").toString
    val report = IcebergExport.exportTable(cat, "ns", "v", dest)
    val root = mapper.readTree(Files.readAllBytes(Paths.get(report.metadataFile)))
    val f = root.get("schemas").get(0).get("fields").get(1)
    assert(f.get("type").get("type").asText() === "list")
    assert(f.get("type").get("element").asText() === "float")
    assert(f.get("type").get("element-id").asInt() === 3) // 2 cols -> element id 3
    assert(root.get("last-column-id").asInt() === 3)
    assert(IcebergExport.readExported(spark, dest).count() === 50L)
  }
}