package graft

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.catalog.{GraftCatalog, IcebergExport, IcebergImport}

/** Iceberg v2 IMPORT: replaying a foreign Iceberg layout into a
  * GraftCatalog table must preserve the main-branch history exactly —
  * per-version reads, append-vs-overwrite classification, per-version
  * schemas — and refuse the unrepresentable cases loudly. Export is the
  * only Iceberg writer in the offline sandbox, but the import path is
  * exercised against its artifacts ONLY (no catalog state is shared),
  * and the export spec separately proves a hand-authored foreign layout
  * reads identically. */
class IcebergImportSpec extends SparkSpec {

  private def freshCat(): GraftCatalog =
    new GraftCatalog(spark, Files.createTempDirectory("iceberg-import-spec").toString)

  private def rows(df: DataFrame): Seq[(Long, Double)] =
    df.select(col("o_orderkey"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq.sorted

  test("append/append/overwrite history round-trips: per-version reads equal, " +
       "overwrite classified as replace, incremental read stays O(delta)") {
    val src = freshCat()
    val orders = Tables.orders(spark, sf())
      .select("o_orderkey", "o_totalprice")
    src.createTable("ns", "t")
    src.commitAppend("ns", "t", orders.filter(col("o_orderkey") % 3 === 2))
    src.commitAppend("ns", "t", orders.filter(col("o_orderkey") % 3 === 0))
    src.commitReplace("ns", "t",
      src.read("ns", "t").filter(col("o_orderkey") % 9 =!= 0))

    val dest = Files.createTempDirectory("iceberg-rt").toString
    IcebergExport.exportTable(src, "ns", "t", dest): Unit

    val dst = freshCat()
    val report = IcebergImport.importTable(dst, "imp", "t", dest)
    assert(report.replays === 3)
    assert(report.replaces === 1, "the overwrite snapshot must replay as a replace")

    // full history: every version reads identically to the source
    (0 to 2).foreach { v =>
      assert(rows(dst.readVersion("imp", "t", v)) ===
        rows(src.readVersion("ns", "t", v)), s"version $v diverged")
    }
    // imported appends keep the manifest-set incremental-read contract
    assert(rows(dst.readIncremental("imp", "t", 0, 1)) ===
      rows(orders.filter(col("o_orderkey") % 3 === 0)))
    // the replace is visible to the changefeed as row-level deletes
    val feed = dst.changesBetween("imp", "t", 1, 2)
    assert(feed.filter(col("_change_type") === "delete").count() ===
      orders.filter(col("o_orderkey") % 3 =!= 1)
        .filter(col("o_orderkey") % 9 === 0).count())
    // provenance: foreign snapshot ids ride the commitIds
    assert(dst.snapshots("imp", "t").forall(_.commitId.startsWith("iceberg-")))
    assert(dst.snapshots("imp", "t").forall(_.sourceRegion == "iceberg-import"))
  }

  test("property: export -> import round-trips RANDOM commit histories — " +
       "every version of every replayed table reads identically") {
    import org.apache.spark.sql.DataFrame
    val base = Tables.orders(spark, sf()).select("o_orderkey", "o_totalprice")
      .filter(col("o_orderkey") <= 600)
    for (seed <- 0 until 5) {
      val rnd = new scala.util.Random(seed)
      val src = freshCat()
      src.createTable("p", "t")
      src.commitAppend("p", "t", base.filter(col("o_orderkey") % 3 === 0))
      val nOps = 2 + rnd.nextInt(3)
      (0 until nOps).foreach { _ =>
        val m = 2 + rnd.nextInt(7)
        if (rnd.nextInt(4) == 0)
          // overwrite: keep a keyed subset of the current state
          src.commitReplace("p", "t",
            src.read("p", "t").filter(col("o_orderkey") % m =!= 0))
        else
          src.commitAppend("p", "t", base
            .filter(col("o_orderkey") % 3 === 1)
            .filter(col("o_orderkey") % m === 0))
      }
      val dest = Files.createTempDirectory(s"iceberg-prop-$seed").toString
      IcebergExport.exportTable(src, "p", "t", dest): Unit
      val dst = freshCat()
      val report = IcebergImport.importTable(dst, "p", "t", dest)
      val versions = src.snapshots("p", "t").map(_.seq)
      assert(report.replays === versions.size, s"seed $seed")
      versions.foreach { v =>
        assert(rows(dst.readVersion("p", "t", v)) ===
          rows(src.readVersion("p", "t", v)),
          s"seed $seed version $v diverged")
      }
    }
  }

  test("merge-on-read history round-trips: deletes applied at the right " +
       "snapshots, delete commits replay as appends, upsert rows survive") {
    val src = freshCat()
    val orders = Tables.orders(spark, sf()).select("o_orderkey", "o_totalprice")
    val base = orders.filter(col("o_orderkey") % 4 === 0)
    src.createTable("ns", "m")
    src.commitAppend("ns", "m", base)                                     // v0
    src.commitDelete("ns", "m",
      orders.filter(col("o_orderkey") % 3 === 0).select("o_orderkey"))    // v1
    src.commitAppend("ns", "m", base.filter(col("o_orderkey") % 3 === 0)) // v2 re-add
    src.commitUpsert("ns", "m",
      base.filter(col("o_orderkey") % 16 === 0)
        .select(col("o_orderkey"),
          round(col("o_totalprice") * 2, 2).as("o_totalprice")),
      Seq("o_orderkey"))                                                  // v3
    src.compact("ns", "m", targetFileBytes = 256L * 1024 * 1024)          // v4

    val dest = Files.createTempDirectory("iceberg-mor-rt").toString
    val exp = IcebergExport.exportTable(src, "ns", "m", dest)
    assert(exp.deleteFiles === 2) // the standalone delete + the upsert's

    val dst = freshCat()
    val report = IcebergImport.importTable(dst, "imp", "m", dest)
    assert(report.replays === 5)
    assert(report.replaces === 1, "only the compaction replays as a replace")
    assert(report.deleteFiles === 2)

    (0 to 4).foreach { v =>
      assert(rows(dst.readVersion("imp", "m", v.toLong)) ===
        rows(src.readVersion("ns", "m", v.toLong)), s"version $v diverged")
    }
    // the delete replayed as a MoR commit, not a rewrite: v1 keeps v0's
    // data manifests and carries a live delete-file set; the compacted
    // head is clean (deletes materialized by the replayed replace)
    val v1snap = dst.snapshots("imp", "m").find(_.seq == 1L).get
    assert(dst.deleteFileEntries("imp", "m", v1snap).nonEmpty)
    assert(dst.deleteFileEntries("imp", "m",
      dst.latest("imp", "m").get).isEmpty)
    val v1 = v1snap
    val v0 = dst.snapshots("imp", "m").find(_.seq == 0L).get
    assert(v0.manifests.forall(v1.manifests.contains),
      "the delete commit must keep the parent's manifests (append-shaped)")
  }

  test("property: random MoR histories (append/delete/upsert/replace) " +
       "round-trip version-exact") {
    val base = Tables.orders(spark, sf()).select("o_orderkey", "o_totalprice")
      .filter(col("o_orderkey") <= 600)
    for (seed <- 10 until 14) {
      val rnd = new scala.util.Random(seed)
      val src = freshCat()
      src.createTable("p", "m")
      src.commitAppend("p", "m", base.filter(col("o_orderkey") % 3 === 0))
      val nOps = 2 + rnd.nextInt(3)
      (0 until nOps).foreach { _ =>
        val m = 2 + rnd.nextInt(7)
        rnd.nextInt(5) match {
          case 0 =>
            src.commitDelete("p", "m",
              base.filter(col("o_orderkey") % m === 0).select("o_orderkey"))
          case 1 =>
            src.commitUpsert("p", "m",
              base.filter(col("o_orderkey") % m === 0)
                .select(col("o_orderkey"),
                  round(col("o_totalprice") + 1, 2).as("o_totalprice")),
              Seq("o_orderkey"))
          case 2 =>
            src.commitReplace("p", "m",
              src.read("p", "m").filter(col("o_orderkey") % m =!= 0))
          case 3 =>
            src.commitDeletePositions("p", "m",
              src.positionsWhere("p", "m", col("o_orderkey") % m === 0))
          case _ =>
            src.commitAppend("p", "m", base
              .filter(col("o_orderkey") % 3 === 1)
              .filter(col("o_orderkey") % m === 0))
        }
      }
      val dest = Files.createTempDirectory(s"iceberg-mor-prop-$seed").toString
      IcebergExport.exportTable(src, "p", "m", dest): Unit
      val dst = freshCat()
      val report = IcebergImport.importTable(dst, "p", "m", dest)
      val versions = src.snapshots("p", "m").map(_.seq)
      assert(report.replays === versions.size, s"seed $seed")
      versions.foreach { v =>
        assert(rows(dst.readVersion("p", "m", v)) ===
          rows(src.readVersion("p", "m", v)),
          s"seed $seed version $v diverged")
      }
    }
  }

  test("import is failure-atomic: a mid-copy crash leaves NO half-created " +
       "table and the retry succeeds") {
    val src = freshCat()
    val orders = Tables.orders(spark, sf()).select("o_orderkey", "o_totalprice")
    src.createTable("ns", "t")
    src.commitAppend("ns", "t", orders.filter(col("o_orderkey") % 5 === 0))
    src.commitAppend("ns", "t", orders.filter(col("o_orderkey") % 5 === 1))
    val dest = Files.createTempDirectory("iceberg-atomic").toString
    IcebergExport.exportTable(src, "ns", "t", dest): Unit

    // crash injection: remove one exported data file — the distributed
    // copy task must throw mid-import
    import scala.jdk.CollectionConverters._
    val dataDir = Paths.get(dest, "data")
    val victim = Files.list(dataDir).iterator().asScala
      .find(_.toString.endsWith(".parquet")).get
    val stash = Files.readAllBytes(victim)
    Files.delete(victim)

    val dst = freshCat()
    intercept[Exception] {
      IcebergImport.importTable(dst, "imp", "t", dest)
    }
    assert(!dst.tableExists("imp", "t"),
      "a failed import must not leave a half-created table behind")

    // heal the layout: the SAME call that just failed now succeeds —
    // no manual dropTable needed
    Files.write(victim, stash)
    val report = IcebergImport.importTable(dst, "imp", "t", dest)
    assert(report.replays === 2)
    assert(rows(dst.read("imp", "t")) === rows(src.read("ns", "t")))
  }

  test("position-delete history round-trips: content=1 delete files rewrite " +
       "to imported paths and apply at the right snapshots") {
    val src = freshCat()
    val orders = Tables.orders(spark, sf()).select("o_orderkey", "o_totalprice")
    src.createTable("ns", "pd")
    src.commitAppend("ns", "pd", orders.filter(col("o_orderkey") % 4 === 0)) // v0
    src.commitDeletePositions("ns", "pd",
      src.positionsWhere("ns", "pd", col("o_orderkey") % 3 === 0))           // v1
    src.commitAppend("ns", "pd", orders.filter(col("o_orderkey") % 4 === 2)) // v2
    val dest = Files.createTempDirectory("iceberg-pd-rt").toString
    val exp = IcebergExport.exportTable(src, "ns", "pd", dest)
    assert(exp.deleteFiles === 1)

    // the exported position-delete file holds EXPORTED data-file URIs
    // (spec reserved columns), not graft-relative paths
    import scala.jdk.CollectionConverters._
    val delFile = java.nio.file.Files.list(Paths.get(dest, "data"))
      .iterator().asScala.map(_.toString)
      .flatMap { f =>
        val cols = spark.read.parquet(f).columns.toSeq
        if (cols == Seq("file_path", "pos")) Some(f) else None
      }.toSeq
    assert(delFile.size === 1)
    val refs = spark.read.parquet(delFile.head)
      .select("file_path").distinct().collect().map(_.getString(0))
    assert(refs.forall(_.startsWith("file:")), s"expected URIs, got ${refs.head}")

    // format-only read-back agrees with the catalog at every version
    (0 to 2).foreach { v =>
      val viaCat = src.readVersion("ns", "pd", v.toLong)
      val viaFmt = IcebergExport.readExportedAt(spark, dest,
        Some(IcebergExport.exportedSnapshotId(v)))
      assert(viaFmt.count() === viaCat.count(), s"count diverges at v$v")
      assert(viaFmt.exceptAll(viaCat).count() === 0L, s"rows diverge at v$v")
    }

    // and the import replays it: position deletes land as p- manifests
    // applied through the scan's row ordinals
    val dst = freshCat()
    val report = IcebergImport.importTable(dst, "imp", "pd", dest)
    assert(report.replays === 3)
    assert(report.deleteFiles === 1)
    (0 to 2).foreach { v =>
      assert(rows(dst.readVersion("imp", "pd", v.toLong)) ===
        rows(src.readVersion("ns", "pd", v.toLong)), s"version $v diverged")
    }
  }

  test("position deletes COMBINED with a rename refuse BEFORE the target " +
       "table is created (ordinals would orphan under the era rewrite)") {
    val src = freshCat()
    val orders = Tables.orders(spark, sf()).select("o_orderkey", "o_totalprice")
    src.createTable("ns", "pdr")
    src.commitAppend("ns", "pdr", orders.limit(60))
    src.commitDeletePositions("ns", "pdr",
      src.positionsWhere("ns", "pdr", col("o_orderkey") % 2 === 0))
    val dest = Files.createTempDirectory("iceberg-pdr").toString
    IcebergExport.exportTable(src, "ns", "pdr", dest): Unit
    editMetadata(dest) { root =>
      addEvolvedSchema(root, 1, renames = Map("o_orderkey" -> "order_id"))
      root.put("current-schema-id", 1): Unit
    }
    val dst = freshCat()
    val e = intercept[IllegalArgumentException] {
      IcebergImport.importTable(dst, "imp", "pdr", dest)
    }
    assert(e.getMessage.contains("position"))
    assert(!dst.tableExists("imp", "pdr"))
  }

  test("a hand-authored foreign layout with an unreadable position-delete " +
       "file fails ATOMICALLY (no table residue)") {
    import org.apache.avro.Schema
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter}
    val loc = Files.createTempDirectory("iceberg-posdel")
    val meta = loc.resolve("metadata"); Files.createDirectories(meta)

    val entrySchema = new Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        {"name":"status","type":"int","field-id":0},
        {"name":"data_file","type":{"type":"record","name":"r2","fields":[
          {"name":"content","type":"int","field-id":134},
          {"name":"file_path","type":"string","field-id":100},
          {"name":"record_count","type":"long","field-id":103}
        ]},"field-id":2}
      ]}""")
    val mPath = meta.resolve("posdel-manifest.avro")
    val mw = new DataFileWriter[org.apache.avro.generic.GenericRecord](
      new GenericDatumWriter[org.apache.avro.generic.GenericRecord](entrySchema))
    mw.create(entrySchema, mPath.toFile)
    val df = new GenericData.Record(entrySchema.getField("data_file").schema())
    df.put("content", Int.box(1)) // POSITION_DELETES
    df.put("file_path", s"${loc.toUri}data/pd.parquet")
    df.put("record_count", Long.box(1L))
    val rec = new GenericData.Record(entrySchema)
    rec.put("status", Int.box(1)); rec.put("data_file", df)
    mw.append(rec); mw.close()

    val listSchema = new Schema.Parser().parse(
      """{"type":"record","name":"manifest_file","fields":[
        {"name":"manifest_path","type":"string","field-id":500},
        {"name":"content","type":"int","field-id":517},
        {"name":"sequence_number","type":"long","field-id":515}
      ]}""")
    val lPath = meta.resolve("snap-21-posdel.avro")
    val lw = new DataFileWriter[org.apache.avro.generic.GenericRecord](
      new GenericDatumWriter[org.apache.avro.generic.GenericRecord](listSchema))
    lw.create(listSchema, lPath.toFile)
    val lr = new GenericData.Record(listSchema)
    lr.put("manifest_path", mPath.toUri.toString)
    lr.put("content", Int.box(1)); lr.put("sequence_number", Long.box(1L))
    lw.append(lr); lw.close()

    val metadataJson =
      s"""{"format-version":2,"table-uuid":"x","location":"${loc.toUri}",
          "last-sequence-number":1,"last-updated-ms":1,"last-column-id":1,
          "current-schema-id":0,
          "schemas":[{"type":"struct","schema-id":0,"fields":[
            {"id":1,"name":"k","required":false,"type":"long"}]}],
          "default-spec-id":0,"partition-specs":[{"spec-id":0,"fields":[]}],
          "default-sort-order-id":0,"sort-orders":[{"order-id":0,"fields":[]}],
          "current-snapshot-id":21,
          "snapshots":[{"snapshot-id":21,"sequence-number":1,"timestamp-ms":1,
            "schema-id":0,"summary":{"operation":"overwrite"},
            "manifest-list":"${lPath.toUri}"}],
          "snapshot-log":[],"metadata-log":[]}"""
    Files.write(meta.resolve("v1.metadata.json"),
      metadataJson.getBytes(StandardCharsets.UTF_8))
    Files.write(meta.resolve("version-hint.text"), "1".getBytes(StandardCharsets.UTF_8))

    val dst = freshCat()
    // the layout parses (position deletes are importable now) but the
    // delete file itself is missing — the failure must drop the
    // just-created table so a retry passes the exists precondition
    intercept[Exception] {
      IcebergImport.importTable(dst, "imp", "pdx", loc.toString)
    }
    assert(!dst.tableExists("imp", "pdx"),
      "a failed import must leave no table residue")
  }

  test("re-importing a snapshot id is rejected by commit idempotence; " +
       "import into an existing table refuses") {
    val src = freshCat()
    val orders = Tables.orders(spark, sf()).select("o_orderkey", "o_totalprice")
    src.createTable("ns", "t")
    src.commitAppend("ns", "t", orders.limit(100))
    val dest = Files.createTempDirectory("iceberg-idem").toString
    IcebergExport.exportTable(src, "ns", "t", dest): Unit

    val dst = freshCat()
    IcebergImport.importTable(dst, "imp", "t", dest): Unit
    val e = intercept[IllegalArgumentException] {
      IcebergImport.importTable(dst, "imp", "t", dest)
    }
    assert(e.getMessage.contains("already exists"))
    // same layout into a DIFFERENT table name is fine (fresh history)
    IcebergImport.importTable(dst, "imp", "t2", dest): Unit
    assert(rows(dst.read("imp", "t2")) === rows(dst.read("imp", "t")))
  }

  test("schema evolution replays version-accurate: v0 keeps its own column " +
       "set, the head null-fills pre-evolution files") {
    val src = freshCat()
    val orders = Tables.orders(spark, sf())
    src.createTable("ns", "ev")
    src.commitAppend("ns", "ev", orders.filter(col("o_orderkey") % 3 === 0)
      .select("o_orderkey", "o_totalprice"))
    src.commitAppend("ns", "ev", orders.filter(col("o_orderkey") % 3 === 1)
      .select("o_orderkey", "o_totalprice", "o_orderstatus"))
    val dest = Files.createTempDirectory("iceberg-ev").toString
    IcebergExport.exportTable(src, "ns", "ev", dest): Unit

    val dst = freshCat()
    val report = IcebergImport.importTable(dst, "imp", "ev", dest)
    assert(report.schemas >= 1)
    assert(dst.readVersion("imp", "ev", 0).columns.toSeq ===
      Seq("o_orderkey", "o_totalprice"))
    val head = dst.read("imp", "ev")
    assert(head.columns.toSeq === Seq("o_orderkey", "o_totalprice", "o_orderstatus"))
    assert(head.filter(col("o_orderkey") % 3 === 0)
      .filter(col("o_orderstatus").isNotNull).count() === 0L,
      "pre-evolution files must project the added column as null")
    assert(head.count() === src.read("ns", "ev").count())
  }

  test("backfillStats makes an imported table plan like a native one: " +
       "countFast answers from metadata and reads prune on bounds") {
    import spark.implicits._
    val src = freshCat()
    src.createTable("ns", "t")
    src.commitAppend("ns", "t",
      (0 until 1000).map(i => (i.toLong, s"row$i")).toDF("id", "payload")
        .repartitionByRange(10, col("id")))
    val dest = Files.createTempDirectory("iceberg-backfill").toString
    IcebergExport.exportTable(src, "ns", "t", dest): Unit
    val dst = freshCat()
    IcebergImport.importTable(dst, "p", "t", dest): Unit

    // imported files carry no stats: count falls back, nothing prunes
    assert(dst.countFastOpt("p", "t").isEmpty)
    assert(dst.readWhere("p", "t", "id", Some("150"), Some("249"))
      .inputFiles.length === 10, "stat-less files must all be read")

    val (snap, rewritten) = dst.backfillStats("p", "t")
    assert(rewritten === 1, "the one imported manifest gets stats")
    assert(dst.countFastOpt("p", "t") === Some(1000L))
    val pruned = dst.readWhere("p", "t", "id", Some("150"), Some("249"))
    assert(pruned.inputFiles.length <= 2,
      s"expected <=2 files read post-backfill, got ${pruned.inputFiles.length}")
    assert(pruned.select("id").as[Long].collect().sorted === (150L to 249L).toArray)

    // idempotent: a second call rewrites nothing and publishes nothing
    val (snap2, rewritten2) = dst.backfillStats("p", "t")
    assert(rewritten2 === 0)
    assert(snap2.seq === snap.seq)
    // the pre-backfill version stays time-travelable and identical
    assert(dst.readVersion("p", "t", 0).count() === 1000L)
  }

  // ---- rename / type-promotion fixtures: a real export whose metadata
  //      JSON is then edited the way a foreign ALTER TABLE would ----

  private def editMetadata(dest: String)(
      f: com.fasterxml.jackson.databind.node.ObjectNode => Unit): Unit = {
    val mp = Paths.get(dest, "metadata", "v1.metadata.json")
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.readTree(Files.readAllBytes(mp))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    f(root)
    Files.write(mp, m.writeValueAsBytes(root)): Unit
  }

  /** Clone schema 0 as `newId`, renaming / retyping the named fields. */
  private def addEvolvedSchema(root: com.fasterxml.jackson.databind.node.ObjectNode,
                               newId: Int, renames: Map[String, String],
                               retypes: Map[String, String] = Map.empty): Unit = {
    val schemas = root.get("schemas")
      .asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode]
    val s = schemas.get(0)
      .deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
    s.put("schema-id", newId)
    s.get("fields").forEach { fn =>
      val fo = fn.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      val orig = fo.get("name").asText()
      retypes.get(orig).foreach(t => fo.put("name", orig).put("type", t): Unit)
      renames.get(orig).foreach(n => fo.put("name", n): Unit)
    }
    schemas.add(s): Unit
  }

  test("a rename published AFTER the last write (ALTER TABLE, no snapshot) " +
       "imports: history keeps old names, the head reads the renamed schema") {
    val src = freshCat()
    val orders = Tables.orders(spark, sf()).select("o_orderkey", "o_totalprice")
    src.createTable("ns", "rn")
    src.commitAppend("ns", "rn", orders.filter(col("o_orderkey") % 3 === 0))
    src.commitAppend("ns", "rn", orders.filter(col("o_orderkey") % 3 === 1))
    val dest = Files.createTempDirectory("iceberg-rn").toString
    IcebergExport.exportTable(src, "ns", "rn", dest): Unit
    editMetadata(dest) { root =>
      addEvolvedSchema(root, 1, renames = Map("o_orderkey" -> "order_id"))
      root.put("current-schema-id", 1): Unit
    }

    val dst = freshCat()
    val report = IcebergImport.importTable(dst, "imp", "rn", dest)
    assert(report.replays === 3, "2 snapshots + the current-schema step")
    assert(report.replaces === 1, "the rename step is an era-boundary replace")
    assert(report.rewrittenFiles > 0, "straddling files are rewritten once")

    // pre-rename versions time-travel under their OWN names
    (0 to 1).foreach { v =>
      assert(dst.readVersion("imp", "rn", v.toLong).columns.toSeq ===
        Seq("o_orderkey", "o_totalprice"), s"v$v names")
      assert(rows(dst.readVersion("imp", "rn", v.toLong)) ===
        rows(src.readVersion("ns", "rn", v.toLong)), s"v$v rows")
    }
    // the head reads what a live Iceberg reader reads: the renamed schema
    val head = dst.read("imp", "rn")
    assert(head.columns.toSeq === Seq("order_id", "o_totalprice"))
    assert(head.select(col("order_id").as("o_orderkey"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq.sorted ===
      rows(src.read("ns", "rn")))
  }

  test("a mid-history rename imports as an era boundary: old versions keep " +
       "old names, post-rename versions read rewritten files") {
    val src = freshCat()
    val orders = Tables.orders(spark, sf()).select("o_orderkey", "o_totalprice")
    src.createTable("ns", "rm")
    src.commitAppend("ns", "rm", orders.filter(col("o_orderkey") % 3 === 0))
    src.commitAppend("ns", "rm", orders.filter(col("o_orderkey") % 3 === 1))
    src.commitAppend("ns", "rm", orders.filter(col("o_orderkey") % 3 === 2))
    val dest = Files.createTempDirectory("iceberg-rm").toString
    IcebergExport.exportTable(src, "ns", "rm", dest): Unit
    editMetadata(dest) { root =>
      addEvolvedSchema(root, 1, renames = Map("o_orderkey" -> "order_id"))
      root.put("current-schema-id", 1): Unit
      // the THIRD snapshot was written under the renamed schema
      root.get("snapshots")
        .asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode].get(2)
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        .put("schema-id", 1): Unit
    }

    val dst = freshCat()
    val report = IcebergImport.importTable(dst, "imp", "rm", dest)
    assert(report.replays === 3)
    assert(report.replaces === 1, "the era boundary replays as a replace")
    (0 to 1).foreach { v =>
      assert(dst.readVersion("imp", "rm", v.toLong).columns.head === "o_orderkey")
      assert(rows(dst.readVersion("imp", "rm", v.toLong)) ===
        rows(src.readVersion("ns", "rm", v.toLong)), s"v$v rows")
    }
    val v2 = dst.readVersion("imp", "rm", 2L)
    assert(v2.columns.toSeq === Seq("order_id", "o_totalprice"))
    assert(v2.select(col("order_id").as("o_orderkey"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq.sorted ===
      rows(src.readVersion("ns", "rm", 2L)))
  }

  test("rename composes with merge-on-read: delete files' key columns rename " +
       "too and the renamed head still applies them") {
    val src = freshCat()
    val orders = Tables.orders(spark, sf()).select("o_orderkey", "o_totalprice")
    src.createTable("ns", "rd")
    src.commitAppend("ns", "rd", orders.filter(col("o_orderkey") % 4 === 0))
    src.commitDelete("ns", "rd",
      orders.filter(col("o_orderkey") % 8 === 0).select("o_orderkey"))
    val dest = Files.createTempDirectory("iceberg-rd").toString
    IcebergExport.exportTable(src, "ns", "rd", dest): Unit
    editMetadata(dest) { root =>
      addEvolvedSchema(root, 1, renames = Map("o_orderkey" -> "order_id"))
      root.put("current-schema-id", 1): Unit
    }
    val dst = freshCat()
    val report = IcebergImport.importTable(dst, "imp", "rd", dest)
    assert(report.deleteFiles === 1)
    assert(report.rewrittenFiles > 0)
    // pre-rename MoR version: old names, delete applied
    assert(rows(dst.readVersion("imp", "rd", 1L)) ===
      rows(src.readVersion("ns", "rd", 1L)))
    // renamed head: the rewritten delete file anti-joins on the NEW name
    val head = dst.read("imp", "rd")
    assert(head.columns.toSeq === Seq("order_id", "o_totalprice"))
    val expected = orders.filter(col("o_orderkey") % 4 === 0)
      .filter(col("o_orderkey") % 8 =!= 0)
    assert(head.count() === expected.count())
    assert(head.select(col("order_id").as("o_orderkey"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq.sorted ===
      rows(expected))
  }

  test("int->long promotion imports (widening parquet read); narrowing refuses") {
    import spark.implicits._
    val src = freshCat()
    src.createTable("ns", "pr")
    src.commitAppend("ns", "pr", Seq((7, "a"), (9, "b")).toDF("k", "v"))
    val dest = Files.createTempDirectory("iceberg-pr").toString
    IcebergExport.exportTable(src, "ns", "pr", dest): Unit
    editMetadata(dest) { root =>
      addEvolvedSchema(root, 1, renames = Map.empty,
        retypes = Map("k" -> "long"))
      root.put("current-schema-id", 1): Unit
    }
    val dst = freshCat()
    val report = IcebergImport.importTable(dst, "imp", "pr", dest)
    assert(report.replays === 2)
    assert(report.rewrittenFiles === 0, "a promotion rewrites nothing")
    // v0 keeps its declared int; the head serves long over int32 pages
    assert(dst.readVersion("imp", "pr", 0L).schema("k").dataType ===
      org.apache.spark.sql.types.IntegerType)
    val head = dst.read("imp", "pr")
    assert(head.schema("k").dataType === org.apache.spark.sql.types.LongType)
    assert(head.select("k").as[Long].collect().sorted.toSeq === Seq(7L, 9L))

    // the reverse direction (long -> int) is not a spec promotion
    val dest2 = Files.createTempDirectory("iceberg-pr2").toString
    val src2 = freshCat()
    src2.createTable("ns", "pn")
    src2.commitAppend("ns", "pn", Seq((7L, "a")).toDF("k", "v"))
    IcebergExport.exportTable(src2, "ns", "pn", dest2): Unit
    editMetadata(dest2) { root =>
      addEvolvedSchema(root, 1, renames = Map.empty, retypes = Map("k" -> "int"))
      root.put("current-schema-id", 1): Unit
    }
    val e = intercept[IllegalArgumentException] {
      IcebergImport.importTable(dst, "imp", "pn", dest2)
    }
    assert(e.getMessage.contains("changes type"))
    assert(!dst.tableExists("imp", "pn"))
  }

  test("a column name REUSED for a different field id refuses (ambiguous " +
       "footer resolution), before the table is created") {
    val src = freshCat()
    val orders = Tables.orders(spark, sf()).select("o_orderkey", "o_totalprice")
    src.createTable("ns", "am")
    src.commitAppend("ns", "am", orders.limit(50))
    val dest = Files.createTempDirectory("iceberg-am").toString
    IcebergExport.exportTable(src, "ns", "am", dest): Unit
    editMetadata(dest) { root =>
      // rename o_orderkey -> order_id AND add a NEW field named o_orderkey
      addEvolvedSchema(root, 1, renames = Map("o_orderkey" -> "order_id"))
      val s1 = root.get("schemas")
        .asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode].get(1)
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      val f = s1.get("fields")
        .asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode].addObject()
      f.put("id", 99).put("name", "o_orderkey").put("required", false)
        .put("type", "string"): Unit
      root.put("current-schema-id", 1): Unit
      root.put("last-column-id", 99): Unit
    }
    val dst = freshCat()
    val e = intercept[IllegalArgumentException] {
      IcebergImport.importTable(dst, "imp", "am", dest)
    }
    assert(e.getMessage.contains("ambiguous"))
    assert(!dst.tableExists("imp", "am"))
  }

  test("a name-mapping binding ONE name to two different field ids refuses " +
       "loudly (last-wins would resolve footers to the wrong id — silent " +
       "NULL columns), before the table is created") {
    val src = freshCat()
    val orders = Tables.orders(spark, sf()).select("o_orderkey", "o_totalprice")
    src.createTable("ns", "dm")
    src.commitAppend("ns", "dm", orders.limit(50))
    val dest = Files.createTempDirectory("iceberg-dm").toString
    IcebergExport.exportTable(src, "ns", "dm", dest): Unit
    editMetadata(dest) { root =>
      val props = root.get("properties")
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      props.put("schema.name-mapping.default",
        """[{"field-id":1,"names":["o_orderkey"]},""" +
          """{"field-id":2,"names":["o_orderkey"]}]"""): Unit
    }
    val dst = freshCat()
    val e = intercept[IllegalArgumentException] {
      IcebergImport.importTable(dst, "imp", "dm", dest)
    }
    assert(e.getMessage.contains("multiple field ids"))
    assert(!dst.tableExists("imp", "dm"))
  }

  test("empty table (no current snapshot) imports as an empty v0 carrying " +
       "the schema, so a cold read resolves columns") {
    val loc = Files.createTempDirectory("iceberg-empty")
    val meta = loc.resolve("metadata"); Files.createDirectories(meta)
    val metadataJson =
      s"""{"format-version":2,"table-uuid":"x","location":"${loc.toUri}",
          "last-sequence-number":0,"last-updated-ms":1,"last-column-id":2,
          "current-schema-id":0,
          "schemas":[{"type":"struct","schema-id":0,"fields":[
            {"id":1,"name":"k","required":false,"type":"long"},
            {"id":2,"name":"v","required":false,"type":"string"}]}],
          "default-spec-id":0,"partition-specs":[{"spec-id":0,"fields":[]}],
          "default-sort-order-id":0,"sort-orders":[{"order-id":0,"fields":[]}],
          "current-snapshot-id":-1,"snapshots":[],
          "snapshot-log":[],"metadata-log":[]}"""
    Files.write(meta.resolve("v1.metadata.json"),
      metadataJson.getBytes(StandardCharsets.UTF_8))
    Files.write(meta.resolve("version-hint.text"), "1".getBytes(StandardCharsets.UTF_8))
    val dst = freshCat()
    val report = IcebergImport.importTable(dst, "imp", "empty", loc.toString)
    assert(report.replays === 0)
    val df = dst.read("imp", "empty")
    assert(df.columns.toSeq === Seq("k", "v"))
    assert(df.count() === 0L)
  }
}
