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

  test("a rename across the lineage's schemas refuses loudly (id-resolved " +
       "evolution is not representable name-resolved)") {
    val loc = Files.createTempDirectory("iceberg-rename")
    val meta = loc.resolve("metadata"); Files.createDirectories(meta)
    // two schemas: field id 1 is "a" in schema 0 but "renamed_a" in schema 1
    val metadataJson =
      s"""{"format-version":2,"table-uuid":"x","location":"${loc.toUri}",
          "last-sequence-number":2,"last-updated-ms":1,"last-column-id":2,
          "current-schema-id":1,
          "schemas":[
            {"type":"struct","schema-id":0,"fields":[
              {"id":1,"name":"a","required":false,"type":"long"}]},
            {"type":"struct","schema-id":1,"fields":[
              {"id":1,"name":"renamed_a","required":false,"type":"long"}]}],
          "default-spec-id":0,"partition-specs":[{"spec-id":0,"fields":[]}],
          "default-sort-order-id":0,"sort-orders":[{"order-id":0,"fields":[]}],
          "current-snapshot-id":11,
          "snapshots":[
            {"snapshot-id":10,"sequence-number":1,"timestamp-ms":1,"schema-id":0,
             "summary":{"operation":"append"},"manifest-list":"${loc.toUri}m1.avro"},
            {"snapshot-id":11,"parent-snapshot-id":10,"sequence-number":2,
             "timestamp-ms":2,"schema-id":1,
             "summary":{"operation":"append"},"manifest-list":"${loc.toUri}m2.avro"}],
          "snapshot-log":[],"metadata-log":[]}"""
    Files.write(meta.resolve("v1.metadata.json"),
      metadataJson.getBytes(StandardCharsets.UTF_8))
    Files.write(meta.resolve("version-hint.text"), "1".getBytes(StandardCharsets.UTF_8))
    val dst = freshCat()
    val e = intercept[IllegalArgumentException] {
      IcebergImport.importTable(dst, "imp", "bad", loc.toString)
    }
    assert(e.getMessage.contains("field id 1"))
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
