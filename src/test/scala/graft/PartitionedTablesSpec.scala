package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.catalog.{GraftCatalog, IcebergExport, IcebergImport}
import graft.functions.IcebergHash

/** PARTITIONED BY as a first-class surface: transforms map onto graft's
  * write-time clustering + bounds/bloom pruning (no hive-style dirs),
  * the Iceberg export declares a REAL partition spec with per-file
  * tuples derived from recorded stats, and import maps foreign specs
  * back onto the same model. */
class PartitionedTablesSpec extends SparkSpec {
  import spark.implicits._

  private def freshCatalog(): GraftCatalog =
    new GraftCatalog(spark, Files.createTempDirectory("graft-part").toString)

  test("IcebergHash matches the Iceberg spec's Appendix-B murmur3 seed-0 " +
       "test vectors (bit-compatibility is what makes exported bucket " +
       "tuples prunable by foreign engines)") {
    assert(IcebergHash.hashLong(34L) === 2017239379)
    assert(IcebergHash.hashBytes("iceberg".getBytes("UTF-8")) === 1210000089)
    // int promotes to long: same hash (spec: bucket(int) == bucket(long))
    assert(IcebergHash.bucketLong(34, 16) === IcebergHash.bucketLong(34L, 16))
    // bucket is non-negative for negative hashes too
    assert((0 until 1000).forall(i => {
      val b = IcebergHash.bucketLong(i.toLong * 2654435761L, 8)
      b >= 0 && b < 8
    }))
  }

  test("the IcebergBucket expression agrees with IcebergHash across types " +
       "and codegen paths") {
    import graft.functions.PartitionFunctions.icebergBucket
    val df = Seq((34L, "iceberg", java.sql.Date.valueOf("2017-11-16")))
      .toDF("l", "s", "d")
      .select(icebergBucket(col("l"), 16).as("bl"),
        icebergBucket(col("s"), 16).as("bs"),
        icebergBucket(col("d"), 16).as("bd"))
    val r = df.head()
    assert(r.getInt(0) === (2017239379 & Int.MaxValue) % 16)
    assert(r.getInt(1) === (1210000089 & Int.MaxValue) % 16)
    // date hashes as its epoch-day promoted to long
    assert(r.getInt(2) ===
      IcebergHash.bucketLong(java.time.LocalDate.of(2017, 11, 16).toEpochDay, 16))
  }

  test("PARTITIONED BY end-to-end in SQL: CREATE persists the spec, INSERT " +
       "clusters + bloom-indexes, scans prune files on both axes, results " +
       "stay exact") {
    val cat = freshCatalog()
    val c = graft.catalog.GraftSparkCatalog.registerSqlCatalog(spark, cat.warehouse)
    spark.sql(
      s"""CREATE TABLE $c.ns.pt (id BIGINT, v DOUBLE, d DATE)
         |PARTITIONED BY (days(d), bucket(4, id))""".stripMargin)
    assert(cat.tableProperties("ns", "pt").contains(GraftCatalog.PartitionSpecProp))
    // 12 days × 100 ids; one INSERT — clustering splits by (day, bucket)
    val src = (0 until 1200).map { i =>
      (i.toLong, i / 10.0, java.sql.Date.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(i % 12)))
    }.toDF("id", "v", "d")
    src.createOrReplaceTempView("pt_src")
    spark.sql(s"INSERT INTO $c.ns.pt SELECT * FROM pt_src").collect(): Unit

    import org.apache.spark.sql.sources
    val total = cat.read("ns", "pt").inputFiles.length
    assert(total > 1, "fixture must span multiple files for pruning to show")
    // temporal axis: one day's range predicate prunes (clustered by d)
    val oneDay = cat.readFilteredLatest("ns", "pt",
      Array[sources.Filter](sources.EqualTo("d", java.sql.Date.valueOf("2024-01-03"))),
      carryPosition = false)
    assert(oneDay.inputFiles.length < total,
      s"day probe read ${oneDay.inputFiles.length}/$total files — no pruning")
    // bucket axis: a point id lookup prunes via the auto-recorded bloom
    // (bounds are useless — every file's id range spans the table)
    val oneId = cat.readFilteredLatest("ns", "pt",
      Array[sources.Filter](sources.EqualTo("id", 777L)), carryPosition = false)
    assert(oneId.inputFiles.length < total,
      s"point probe read ${oneId.inputFiles.length}/$total files — bucket bloom dead")
    // exactness through the pruned scans
    assert(spark.sql(s"SELECT count(*) FROM $c.ns.pt WHERE d = DATE'2024-01-03'")
      .head().getLong(0) === 100L)
    assert(spark.sql(s"SELECT v FROM $c.ns.pt WHERE id = 777").head().getDouble(0)
      === 77.7)
    // the SQL scan path prunes too (pushed filters reach the manifest
    // pruner through the DSv2 bridge, not only the programmatic API)
    assert(spark.sql(s"SELECT * FROM $c.ns.pt WHERE d = DATE'2024-01-03'")
      .inputFiles.length < total, "SQL day probe did not prune")
    assert(spark.sql(s"SELECT * FROM $c.ns.pt WHERE id = 777")
      .inputFiles.length < total, "SQL point probe did not prune")
    // per-file derived bucket stat recorded under the reserved key
    val head = cat.latest("ns", "pt").get
    val stats = cat.prunedDataEntries("ns", "pt", head, Array.empty).toSeq
      .filterNot(_.stats.get("__rows").exists(_._1 == "0"))
    assert(stats.nonEmpty)
    assert(stats.forall(_.stats.contains(GraftCatalog.bucketStatKey(4, "id"))),
      "partitioned commits must record the per-file bucket stat")
  }

  test("bucket(n, timestampCol): the auto-recorded bloom is built AND probed " +
       "in the tz-stable epoch-micros form, so point lookups on a " +
       "timestamp bucket source actually prune") {
    val cat = freshCatalog()
    val c = graft.catalog.GraftSparkCatalog.registerSqlCatalog(spark, cat.warehouse)
    spark.sql(
      s"""CREATE TABLE $c.ns.tsb (ts TIMESTAMP, v BIGINT)
         |PARTITIONED BY (bucket(8, ts))""".stripMargin)
    // 400 distinct second-spaced timestamps; bucket clustering spreads
    // them hash-wise, so every file's [min, max] covers most probes —
    // only the bloom can prune a point lookup
    val src = (0 until 400).map { i =>
      (java.sql.Timestamp.valueOf(java.time.LocalDateTime
        .of(2024, 6, 1, 12, 0, 0).plusSeconds(i.toLong)), i.toLong)
    }.toDF("ts", "v")
    src.createOrReplaceTempView("tsb_src")
    spark.sql(s"INSERT INTO $c.ns.tsb SELECT * FROM tsb_src").collect(): Unit
    val total = cat.read("ns", "tsb").inputFiles.length
    assert(total > 1, "fixture must span multiple files for pruning to show")
    // SQL point probe: pushed EqualTo(ts) reaches the manifest pruner;
    // the micros-form bloom rejects the non-matching bucket files
    val probe = spark.sql(
      s"SELECT v FROM $c.ns.tsb WHERE ts = TIMESTAMP'2024-06-01 12:03:17'")
    assert(probe.inputFiles.length < total,
      s"timestamp point probe read ${probe.inputFiles.length}/$total files " +
        "— the bucket bloom on a timestamp source is dead")
    assert(probe.as[Long].collect().toSeq === Seq(197L))
    // programmatic path too (readWhereEquals probes the same form)
    val rwe = cat.readWhereEquals("ns", "tsb", "ts", "2024-06-01 12:03:17")
    assert(rwe.inputFiles.length < total)
    assert(rwe.count() === 1L)
  }

  test("bucket point pruning is SATURATION-PROOF: past ~BloomBits distinct " +
       "keys per file the bloom goes all-ones, but the per-file derived " +
       "bucket stat still prunes equality probes exactly (the 100 TB " +
       "file-size regime, measured in SCALE_r12)") {
    val cat = freshCatalog()
    val c = graft.catalog.GraftSparkCatalog.registerSqlCatalog(spark, cat.warehouse)
    spark.sql(s"""CREATE TABLE $c.ns.sat (pk BIGINT, v DOUBLE)
                  PARTITIONED BY (bucket(4, pk))""")
    // 160k distinct keys over 4 bucket files = ~40k keys/file — 2.4×
    // the 16384-bit bloom capacity, saturating every filter
    val src = (0 until 160000).map(i => (i.toLong, i / 10.0)).toDF("pk", "v")
    src.createOrReplaceTempView("sat_src")
    spark.sql(s"INSERT INTO $c.ns.sat SELECT * FROM sat_src").collect(): Unit
    val total = cat.read("ns", "sat").inputFiles.length
    assert(total >= 4, s"expected one file per bucket, got $total")
    import org.apache.spark.sql.sources
    val probe = cat.readFilteredLatest("ns", "sat",
      Array[sources.Filter](sources.EqualTo("pk", 12345L)),
      carryPosition = false)
    assert(probe.inputFiles.length < total,
      s"point probe read ${probe.inputFiles.length}/$total files — bucket " +
        "pruning must survive bloom saturation via the derived stat")
    // exactness through the pruned SQL scan (readFilteredLatest prunes
    // FILES; the residual filter is the consumer's)
    assert(spark.sql(s"SELECT v FROM $c.ns.sat WHERE pk = 12345")
      .head().getDouble(0) === 1234.5)
    assert(spark.sql(s"SELECT * FROM $c.ns.sat WHERE pk = 12345")
      .inputFiles.length < total, "the SQL scan path must prune too")
    // programmatic path prunes identically
    val rwe = cat.readWhereEquals("ns", "sat", "pk", "12345")
    assert(rwe.inputFiles.length < total && rwe.count() === 1L)
    // the bucket stat prunes through COMPOUND filters too (an equality
    // probe nested under AND must keep its spec threading)
    val compound = cat.readFilteredLatest("ns", "sat",
      Array[sources.Filter](sources.And(
        sources.EqualTo("pk", 12345L), sources.GreaterThan("v", 0.0))),
      carryPosition = false)
    assert(compound.inputFiles.length < total,
      s"AND-nested point probe read ${compound.inputFiles.length}/$total " +
        "files — the spec must thread through compile's recursion")
    // and an ABSENT key inside the bucket's range still returns empty
    // (the residual filter keeps exactness; pruning is never the answer)
    assert(cat.readWhereEquals("ns", "sat", "pk", "9999999").count() === 0L)
  }

  test("compact preserves the partitioned layout: clustering AND the bucket " +
       "bloom survive the rewrite (a compaction that de-indexes would rot " +
       "pruning silently)") {
    val cat = freshCatalog()
    val c = graft.catalog.GraftSparkCatalog.registerSqlCatalog(spark, cat.warehouse)
    spark.sql(
      s"""CREATE TABLE $c.ns.pc (id BIGINT, d DATE)
         |PARTITIONED BY (days(d), bucket(4, id))""".stripMargin)
    val src = (0 until 800).map { i =>
      (i.toLong, java.sql.Date.valueOf(
        java.time.LocalDate.of(2024, 3, 1).plusDays(i % 8)))
    }.toDF("id", "d")
    src.createOrReplaceTempView("pc_src")
    // two inserts -> compact folds them, re-clustered per the spec
    spark.sql(s"INSERT INTO $c.ns.pc SELECT * FROM pc_src WHERE id % 2 = 0").collect(): Unit
    spark.sql(s"INSERT INTO $c.ns.pc SELECT * FROM pc_src WHERE id % 2 = 1").collect(): Unit
    cat.compact("ns", "pc", targetFileBytes = 4L * 1024)
    import org.apache.spark.sql.sources
    val total = cat.read("ns", "pc").inputFiles.length
    assert(total > 1)
    val dayFiles = cat.readFilteredLatest("ns", "pc",
      Array[sources.Filter](sources.EqualTo("d", java.sql.Date.valueOf("2024-03-02"))),
      carryPosition = false).inputFiles.length
    assert(dayFiles < total, s"compact lost the temporal clustering ($dayFiles/$total)")
    val idFiles = cat.readFilteredLatest("ns", "pc",
      Array[sources.Filter](sources.EqualTo("id", 99L)), carryPosition = false)
      .inputFiles.length
    assert(idFiles < total, s"compact de-indexed the bucket bloom ($idFiles/$total)")
    assert(cat.read("ns", "pc").count() === 800L)
  }

  test("DDL validation refuses loudly: unknown source, wrong source type, " +
       "hour on date, zero buckets, spec + property double declaration") {
    val cat = freshCatalog()
    val c = graft.catalog.GraftSparkCatalog.registerSqlCatalog(spark, cat.warehouse)
    def ddl(p: String) =
      s"CREATE TABLE $c.ns.bad (id BIGINT, v DOUBLE, d DATE) PARTITIONED BY ($p)"
    intercept[Exception](spark.sql(ddl("days(nope)")))
    intercept[Exception](spark.sql(ddl("days(v)")))       // double source
    intercept[Exception](spark.sql(ddl("hours(d)")))      // hour needs timestamp
    intercept[Exception](spark.sql(ddl("bucket(0, id)")))
    intercept[Exception](spark.sql(ddl("truncate(4, d)"))) // truncate: int/long/string
    // identity restricts to the spec-EXPORTABLE set: a double source
    // would create fine and then brick iceberg_export + the REST shim
    intercept[Exception](spark.sql(ddl("v")))
    intercept[Exception](spark.sql(
      s"""CREATE TABLE $c.ns.bad (id BIGINT) PARTITIONED BY (bucket(4, id))
         |TBLPROPERTIES ('${GraftCatalog.PartitionSpecProp}'='[]')""".stripMargin))
    // reserved staging/stat prefixes refuse at DDL time, not first INSERT
    intercept[Exception](spark.sql(
      s"CREATE TABLE $c.ns.bad (id BIGINT, __ptw_0 INT) PARTITIONED BY (bucket(4, id))"))
    intercept[Exception](spark.sql(
      s"CREATE TABLE $c.ns.bad (id BIGINT, __pt_x INT) PARTITIONED BY (bucket(4, id))"))
    assert(!cat.tableExists("ns", "bad"))
    // a malformed spec riding a MIXED schema+props DSv2 ALTER batch
    // refuses atomically too — same guard as the pure-property path
    cat.createTable("ns", "mixed")
    import spark.implicits._
    cat.commitAppend("ns", "mixed", Seq((1L, "a")).toDF("id", "s"))
    val before = cat.latest("ns", "mixed").get.seq
    intercept[Exception](cat.commitSchemaEvolution("ns", "mixed",
      org.apache.spark.sql.types.StructType(
        cat.tableSchema("ns", "mixed").get.fields :+
          org.apache.spark.sql.types.StructField("extra",
            org.apache.spark.sql.types.IntegerType)),
      propsSet = Map(GraftCatalog.PartitionSpecProp ->
        """[{"transform":"day","source":"nope"}]""")))
    assert(cat.latest("ns", "mixed").get.seq === before,
      "the mixed batch must refuse atomically — nothing published")
  }

  test("pure-schema ALTERs on a partitioned table keep the spec valid: " +
       "adding a reserved-prefix column or dropping a spec source " +
       "refuses AT the ALTER (publishing either would brick every " +
       "later write)") {
    val cat = freshCatalog()
    val c = graft.catalog.GraftSparkCatalog.registerSqlCatalog(spark, cat.warehouse)
    spark.sql(
      s"""CREATE TABLE $c.ns.pa (id BIGINT, v DOUBLE, d DATE)
         |PARTITIONED BY (days(d))""".stripMargin)
    spark.sql(s"INSERT INTO $c.ns.pa VALUES (1, 1.0, DATE'2024-11-01')").collect(): Unit
    intercept[Exception](spark.sql(s"ALTER TABLE $c.ns.pa ADD COLUMN __ptw_0 INT"))
    intercept[Exception](spark.sql(s"ALTER TABLE $c.ns.pa DROP COLUMN d"))
    // the table still writes — nothing half-published
    spark.sql(s"INSERT INTO $c.ns.pa VALUES (2, 2.0, DATE'2024-11-02')").collect(): Unit
    assert(spark.sql(s"SELECT count(*) FROM $c.ns.pa").head().getLong(0) === 2L)
    // a legal ADD still works
    spark.sql(s"ALTER TABLE $c.ns.pa ADD COLUMN note STRING")
    assert(cat.tableSchema("ns", "pa").get.fieldNames.contains("note"))
  }

  test("export declares the REAL partition spec and derives per-file tuples " +
       "a foreign engine can prune on: tuple-pruned file reads == the " +
       "filtered table, straddling files honestly export unpartitioned") {
    val cat = freshCatalog()
    val c = graft.catalog.GraftSparkCatalog.registerSqlCatalog(spark, cat.warehouse)
    spark.sql(
      s"""CREATE TABLE $c.ns.pe (id BIGINT, v DOUBLE, d DATE)
         |PARTITIONED BY (days(d), bucket(4, id))""".stripMargin)
    // one insert per day -> each file provably sits in one (day, bucket)
    val src = (0 until 600).map { i =>
      (i.toLong, i / 10.0, java.sql.Date.valueOf(
        java.time.LocalDate.of(2024, 6, 1).plusDays(i % 3)))
    }.toDF("id", "v", "d")
    src.createOrReplaceTempView("pe_src")
    (0 until 3).foreach { day =>
      spark.sql(s"INSERT INTO $c.ns.pe SELECT * FROM pe_src " +
        s"WHERE d = DATE'2024-06-0${day + 1}'").collect(): Unit
    }
    val dest = Files.createTempDirectory("graft-pe-export").toString
    IcebergExport.exportTable(cat, "ns", "pe", dest): Unit

    // metadata declares the spec
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(Files.readAllBytes(
      java.nio.file.Paths.get(dest, "metadata", "v1.metadata.json")))
    assert(root.get("default-spec-id").asInt() === 1)
    val specs = root.get("partition-specs").elements()
    import scala.jdk.CollectionConverters._
    val spec1 = specs.asScala.find(_.get("spec-id").asInt() == 1).get
    val fields = spec1.get("fields").elements().asScala.toSeq
    assert(fields.map(_.get("transform").asText()) === Seq("day", "bucket[4]"))
    assert(fields.map(_.get("name").asText()) === Seq("d_day", "id_bucket"))
    assert(fields.map(_.get("field-id").asInt()) === Seq(1000, 1001))
    assert(root.get("last-partition-id").asInt() === 1001)

    // walk the current snapshot exactly like a foreign engine: collect
    // (file, tuple) from spec-1 manifests and prune by ONE day's tuple
    val curId = root.get("current-snapshot-id").asLong()
    val snap = root.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong() == curId).get
    val listPath = java.nio.file.Paths.get(
      java.net.URI.create(snap.get("manifest-list").asText()))
    var tupled = Seq.empty[(String, Int, Int)] // (file, d_day, id_bucket)
    var plainFiles = Seq.empty[String]
    IcebergExport.readAvro(listPath).foreach { mf =>
      val specId = mf.get("partition_spec_id").asInstanceOf[Int]
      IcebergExport.readAvro(java.nio.file.Paths.get(
        java.net.URI.create(mf.get("manifest_path").toString))).foreach { e =>
        val df0 = e.get("data_file")
          .asInstanceOf[org.apache.avro.generic.GenericRecord]
        val part = df0.get("partition")
          .asInstanceOf[org.apache.avro.generic.GenericRecord]
        val path = df0.get("file_path").toString
        val nRows = df0.get("record_count").asInstanceOf[Long]
        if (specId == 1)
          tupled :+= ((path, part.get("d_day").asInstanceOf[Int],
            part.get("id_bucket").asInstanceOf[Int]))
        // the empty v0 schema-anchor file carries no rows and (honestly)
        // no tuple — only ROW-BEARING files must all derive tuples
        else if (nRows > 0L) plainFiles :+= path
      }
    }
    assert(tupled.nonEmpty, "no per-file partition tuples derived")
    assert(plainFiles.isEmpty,
      s"per-day inserts must derive every tuple, got ${plainFiles.size} plain files")
    val day2 = java.time.LocalDate.of(2024, 6, 2).toEpochDay.toInt
    val dayFiles = tupled.filter(_._2 == day2).map(_._1)
    assert(dayFiles.nonEmpty && dayFiles.size < tupled.size)
    val pruned = spark.read.parquet(dayFiles.map(u =>
      java.nio.file.Paths.get(java.net.URI.create(u)).toString): _*)
    val want = cat.read("ns", "pe").filter(col("d") === lit("2024-06-02").cast("date"))
    assert(pruned.count() === want.count())
    assert(pruned.agg(sum("id")).head().getLong(0) ===
      want.agg(sum("id")).head().getLong(0))
    // bucket tuple correctness: every row in each file hashes to its tuple
    tupled.groupBy(_._3).foreach { case (bucket, fs) =>
      val ids = spark.read.parquet(fs.map(t =>
        java.nio.file.Paths.get(java.net.URI.create(t._1)).toString): _*)
        .select("id").as[Long].collect()
      assert(ids.forall(IcebergHash.bucketLong(_, 4) == bucket),
        s"file claims bucket $bucket but holds foreign ids")
    }

    // roundtrip: import maps the spec back to graft.partition-spec and
    // reproduces the data
    val dst = freshCatalog()
    IcebergImport.importTable(dst, "imp", "pe", dest): Unit
    assert(dst.read("imp", "pe").count() === 600L)
    assert(dst.tableProperties("imp", "pe").contains(GraftCatalog.PartitionSpecProp))
  }

  test("timestamp partition axis: days(ts) prunes range probes AND pushed " +
       "Timestamp filters via tz-stable micros bounds, and the export " +
       "derives spec-exact temporal tuples (UTC epoch days)") {
    val cat = freshCatalog()
    val c = graft.catalog.GraftSparkCatalog.registerSqlCatalog(spark, cat.warehouse)
    spark.sql(
      s"""CREATE TABLE $c.ns.tt (id BIGINT, ts TIMESTAMP)
         |PARTITIONED BY (days(ts), bucket(2, id))""".stripMargin)
    val src = (0 until 400).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 5, 1 + i % 4, i % 24, 30)))
    }.toDF("id", "ts")
    src.createOrReplaceTempView("tt_src")
    spark.sql(s"INSERT INTO $c.ns.tt SELECT * FROM tt_src").collect(): Unit

    val total = cat.read("ns", "tt").inputFiles.length
    assert(total > 2, "fixture must span several files")
    // string-bounds probe (readWhere): one day's slice prunes
    val day2 = cat.readWhere("ns", "tt", "ts",
      Some("2024-05-02"), Some("2024-05-02 23:59:59"))
    assert(day2.inputFiles.length < total,
      s"day slice read ${day2.inputFiles.length}/$total files")
    assert(day2.count() === 100L)
    // typed pushed-filter probe (the SQL scan path): java.sql.Timestamp
    import org.apache.spark.sql.sources
    val tail = cat.readFilteredLatest("ns", "tt", Array[sources.Filter](
      sources.GreaterThanOrEqual("ts",
        java.sql.Timestamp.valueOf("2024-05-04 00:00:00"))),
      carryPosition = false)
    assert(tail.inputFiles.length < total,
      s"timestamp filter read ${tail.inputFiles.length}/$total files")
    assert(spark.sql(
      s"SELECT count(*) FROM $c.ns.tt WHERE ts >= TIMESTAMP'2024-05-04 00:00:00'")
      .head().getLong(0) === 100L)

    // export derives day tuples from the micros bounds
    val dest = Files.createTempDirectory("graft-tt-export").toString
    IcebergExport.exportTable(cat, "ns", "tt", dest): Unit
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(Files.readAllBytes(
      java.nio.file.Paths.get(dest, "metadata", "v1.metadata.json")))
    val curId = root.get("current-snapshot-id").asLong()
    val snap = root.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong() == curId).get
    var dayVals = Set.empty[Int]
    var plainRows = 0L
    IcebergExport.readAvro(java.nio.file.Paths.get(
      java.net.URI.create(snap.get("manifest-list").asText()))).foreach { mf =>
      val specId = mf.get("partition_spec_id").asInstanceOf[Int]
      IcebergExport.readAvro(java.nio.file.Paths.get(
        java.net.URI.create(mf.get("manifest_path").toString))).foreach { e =>
        val df0 = e.get("data_file")
          .asInstanceOf[org.apache.avro.generic.GenericRecord]
        if (specId == 1)
          dayVals += df0.get("partition")
            .asInstanceOf[org.apache.avro.generic.GenericRecord]
            .get("ts_day").asInstanceOf[Int]
        else plainRows += df0.get("record_count").asInstanceOf[Long]
      }
    }
    assert(plainRows === 0L, "every row-bearing file must derive its tuple")
    assert(dayVals === (0 until 4).map(d =>
      java.time.LocalDate.of(2024, 5, 1 + d).toEpochDay.toInt).toSet)
  }

  test("identity and truncate transforms derive export tuples from " +
       "recorded bounds: per-category files carry the exact string/" +
       "prefix values a foreign engine prunes on") {
    val cat = freshCatalog()
    val c = graft.catalog.GraftSparkCatalog.registerSqlCatalog(spark, cat.warehouse)
    spark.sql(
      s"""CREATE TABLE $c.ns.it (k BIGINT, category STRING, sku STRING)
         |PARTITIONED BY (category, truncate(3, sku))""".stripMargin)
    val src = (0 until 120).map { i =>
      (i.toLong, if (i % 2 == 0) "web" else "app",
        f"SKU${i % 3}%d-${i}%04d")
    }.toDF("k", "category", "sku")
    src.createOrReplaceTempView("it_src")
    spark.sql(s"INSERT INTO $c.ns.it SELECT * FROM it_src").collect(): Unit
    val dest = Files.createTempDirectory("graft-it-export").toString
    IcebergExport.exportTable(cat, "ns", "it", dest): Unit
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(Files.readAllBytes(
      java.nio.file.Paths.get(dest, "metadata", "v1.metadata.json")))
    val spec1 = root.get("partition-specs").elements().asScala
      .find(_.get("spec-id").asInt() == 1).get
    assert(spec1.get("fields").elements().asScala
      .map(_.get("transform").asText()).toSeq === Seq("identity", "truncate[3]"))
    val curId = root.get("current-snapshot-id").asLong()
    val snap = root.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong() == curId).get
    var tuples = Set.empty[(String, String)]
    var plainRows = 0L
    IcebergExport.readAvro(java.nio.file.Paths.get(
      java.net.URI.create(snap.get("manifest-list").asText()))).foreach { mf =>
      val specId = mf.get("partition_spec_id").asInstanceOf[Int]
      IcebergExport.readAvro(java.nio.file.Paths.get(
        java.net.URI.create(mf.get("manifest_path").toString))).foreach { e =>
        val df0 = e.get("data_file")
          .asInstanceOf[org.apache.avro.generic.GenericRecord]
        if (specId == 1) {
          val part = df0.get("partition")
            .asInstanceOf[org.apache.avro.generic.GenericRecord]
          tuples += ((part.get("category").toString,
            part.get("sku_trunc").toString))
        } else plainRows += df0.get("record_count").asInstanceOf[Long]
      }
    }
    assert(plainRows === 0L, "every row-bearing file must derive its tuple")
    // SKU prefixes: "SKU" for every sku (3 chars) — so truncate yields
    // one value, identity two; 2 tuples, proving BOTH transform kinds
    assert(tuples === Set(("web", "SKU"), ("app", "SKU")))
  }

  test("a STRADDLING file (bounds spanning several days) exports under the " +
       "empty spec-0 — never a wrong tuple") {
    val cat = freshCatalog()
    val c = graft.catalog.GraftSparkCatalog.registerSqlCatalog(spark, cat.warehouse)
    spark.sql(s"CREATE TABLE $c.ns.st (id BIGINT, d DATE) PARTITIONED BY (days(d))")
    // bypass the clustering INSERT path: one commitAppend with ONE file
    // spanning 5 days (a foreign/programmatic writer's layout)
    cat.commitAppend("ns", "st", (0 until 50).map(i =>
      (i.toLong, java.sql.Date.valueOf(
        java.time.LocalDate.of(2024, 7, 1).plusDays(i % 5))))
      .toDF("id", "d").coalesce(1))
    val dest = Files.createTempDirectory("graft-st-export").toString
    IcebergExport.exportTable(cat, "ns", "st", dest): Unit
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(Files.readAllBytes(
      java.nio.file.Paths.get(dest, "metadata", "v1.metadata.json")))
    import scala.jdk.CollectionConverters._
    assert(root.get("default-spec-id").asInt() === 1, "spec still declared")
    val curId = root.get("current-snapshot-id").asLong()
    val snap = root.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong() == curId).get
    val specIds = IcebergExport.readAvro(java.nio.file.Paths.get(
      java.net.URI.create(snap.get("manifest-list").asText())))
      .map(_.get("partition_spec_id").asInstanceOf[Int])
    assert(specIds.nonEmpty && specIds.forall(_ == 0),
      s"straddling file must ride spec-0, got $specIds")
    // and the exported table still reads exactly
    assert(IcebergExport.readExported(spark, dest).count() === 50L)
  }

  test("partition-spec EVOLUTION via ALTER SET TBLPROPERTIES: the new " +
       "spec drives subsequent writes (Iceberg's evolution model — " +
       "committed files keep their layout); a malformed spec refuses AT " +
       "the ALTER, not at the next INSERT") {
    val cat = freshCatalog()
    val c = graft.catalog.GraftSparkCatalog.registerSqlCatalog(spark, cat.warehouse)
    spark.sql(s"CREATE TABLE $c.ns.ev (id BIGINT, d DATE)")
    val src = (0 until 400).map { i =>
      (i.toLong, java.sql.Date.valueOf(
        java.time.LocalDate.of(2024, 8, 1 + i % 4)))
    }.toDF("id", "d")
    src.createOrReplaceTempView("ev_src")
    spark.sql(s"INSERT INTO $c.ns.ev SELECT * FROM ev_src WHERE id < 200").collect(): Unit
    // evolve: declare the spec post-hoc
    spark.sql(s"""ALTER TABLE $c.ns.ev SET TBLPROPERTIES (
      '${GraftCatalog.PartitionSpecProp}'=
      '[{"transform":"day","source":"d"},{"transform":"bucket","source":"id","n":2}]')""")
    spark.sql(s"INSERT INTO $c.ns.ev SELECT * FROM ev_src WHERE id >= 200").collect(): Unit
    // the post-evolution files are tuple-aligned: the bucket derived
    // stat is recorded (pre-evolution files simply lack it — honest)
    val head = cat.latest("ns", "ev").get
    val entries = cat.prunedDataEntries("ns", "ev", head, Array.empty).toSeq
      .filterNot(_.stats.get("__rows").exists(_._1 == "0"))
    val tagged = entries.count(_.stats.contains(GraftCatalog.bucketStatKey(2, "id")))
    assert(tagged > 0 && tagged < entries.size,
      s"expected a mixed-era layout, got $tagged/${entries.size} tagged files")
    assert(spark.sql(s"SELECT count(*) FROM $c.ns.ev").head().getLong(0) === 400L)

    // malformed specs refuse at the ALTER itself
    intercept[Exception](spark.sql(
      s"""ALTER TABLE $c.ns.ev SET TBLPROPERTIES (
         '${GraftCatalog.PartitionSpecProp}'='[{"transform":"day","source":"nope"}]')"""))
    intercept[Exception](spark.sql(
      s"""ALTER TABLE $c.ns.ev SET TBLPROPERTIES (
         '${GraftCatalog.PartitionSpecProp}'='[{"transform":"hour","source":"d"}]')"""))
    // and the table still writes under the LAST VALID spec
    spark.sql(s"INSERT INTO $c.ns.ev VALUES (9999, DATE'2024-08-02')").collect(): Unit
    assert(spark.sql(s"SELECT count(*) FROM $c.ns.ev").head().getLong(0) === 401L)
  }

  test("ALTER TABLE ADD/DROP/REPLACE PARTITION FIELD — Iceberg's native " +
       "evolution DDL: spec changes publish as validated property " +
       "commits, REPLACE is atomic, refusals are loud, and writes after " +
       "each change cluster by the then-current spec") {
    val cat = freshCatalog()
    val c = graft.catalog.GraftSparkCatalog.registerSqlCatalog(spark, cat.warehouse)
    spark.sql(s"""CREATE TABLE $c.ns.pd (id BIGINT, s STRING, d DATE)
                  PARTITIONED BY (days(d))""")
    def spec(): Seq[GraftCatalog.PartitionField] =
      GraftCatalog.validatedPartitionSpec("ns.pd",
        cat.tableProperties("ns", "pd"), cat.tableSchema("ns", "pd"))

    spark.sql(s"ALTER TABLE $c.ns.pd ADD PARTITION FIELD bucket(4, id)")
    assert(spec() === Seq(GraftCatalog.PartitionField("day", "d"),
      GraftCatalog.PartitionField("bucket", "id", 4)))
    // writes under the evolved spec record the bucket derived stat
    val src = (0 until 200).map { i =>
      (i.toLong, s"s$i", java.sql.Date.valueOf(
        java.time.LocalDate.of(2024, 8, 1 + i % 3)))
    }.toDF("id", "s", "d")
    src.createOrReplaceTempView("pd_src")
    spark.sql(s"INSERT INTO $c.ns.pd SELECT * FROM pd_src").collect(): Unit
    val head = cat.latest("ns", "pd").get
    val entries = cat.prunedDataEntries("ns", "pd", head, Array.empty).toSeq
      .filterNot(_.stats.get("__rows").exists(_._1 == "0"))
    assert(entries.nonEmpty &&
      entries.forall(_.stats.contains(GraftCatalog.bucketStatKey(4, "id"))))

    // DROP by exact transform; bare column spells identity only
    spark.sql(s"ALTER TABLE $c.ns.pd DROP PARTITION FIELD days(d)")
    assert(spec() === Seq(GraftCatalog.PartitionField("bucket", "id", 4)))
    // REPLACE publishes drop+add as ONE commit (no fieldless window)
    val vBefore = cat.latest("ns", "pd").get.seq
    spark.sql(s"ALTER TABLE $c.ns.pd REPLACE PARTITION FIELD " +
      "bucket(4, id) WITH truncate(100, id)")
    assert(spec() === Seq(GraftCatalog.PartitionField("truncate", "id", 100)))
    assert(cat.latest("ns", "pd").get.seq === vBefore + 1,
      "REPLACE must publish exactly one version")
    // time travel reads each version's own spec
    assert(GraftCatalog.validatedPartitionSpec("ns.pd",
      cat.snapshots("ns", "pd").find(_.seq == vBefore).get.properties,
      cat.tableSchema("ns", "pd"))
      === Seq(GraftCatalog.PartitionField("bucket", "id", 4)))

    // refusals: unmatched drop, duplicate source, unknown column, bad
    // type — all loud, none publish
    val v = cat.latest("ns", "pd").get.seq
    intercept[Exception](spark.sql(
      s"ALTER TABLE $c.ns.pd DROP PARTITION FIELD bucket(8, id)"))
    intercept[Exception](spark.sql(
      s"ALTER TABLE $c.ns.pd ADD PARTITION FIELD days(id)")) // wrong type
    intercept[Exception](spark.sql(
      s"ALTER TABLE $c.ns.pd ADD PARTITION FIELD bucket(4, nope)"))
    intercept[Exception](spark.sql(
      s"ALTER TABLE $c.ns.pd ADD PARTITION FIELD truncate(10, id)")) // dup source
    assert(cat.latest("ns", "pd").get.seq === v, "refusals must not publish")

    // identity via bare column; drop down to unpartitioned removes the
    // property entirely
    spark.sql(s"ALTER TABLE $c.ns.pd ADD PARTITION FIELD s")
    assert(spec().contains(GraftCatalog.PartitionField("identity", "s")))
    spark.sql(s"ALTER TABLE $c.ns.pd DROP PARTITION FIELD s")
    spark.sql(s"ALTER TABLE $c.ns.pd DROP PARTITION FIELD truncate(100, id)")
    assert(!cat.tableProperties("ns", "pd")
      .contains(GraftCatalog.PartitionSpecProp))
    // a non-graft target keeps the stock parse error (no silent no-op)
    intercept[Exception](spark.sql(
      "ALTER TABLE spark_catalog.default.nope ADD PARTITION FIELD bucket(4, x)"))
    // data intact through the whole evolution
    assert(spark.sql(s"SELECT count(*), sum(id) FROM $c.ns.pd").head()
      === org.apache.spark.sql.Row(200L, (0 until 200).map(_.toLong).sum))
  }

  test("the streaming cdc sink is a property-honoring writer: a " +
       "partitioned replica keeps aligned files, derived bucket stats " +
       "and blooms batch over batch (layout is table state, not a " +
       "writer courtesy)") {
    val cat = freshCatalog()
    val c = graft.catalog.GraftSparkCatalog.registerSqlCatalog(spark, cat.warehouse)
    spark.sql(
      s"""CREATE TABLE $c.ns.rep (id BIGINT, d DATE)
         |PARTITIONED BY (days(d), bucket(2, id))""".stripMargin)
    // batch 1 through the cdc-apply commit (what foreachBatchApplyCdc
    // issues), spanning 2 days x 2 buckets
    def batch(lo: Int, hi: Int) = (lo until hi).map(i =>
      (i.toLong, java.sql.Date.valueOf(
        java.time.LocalDate.of(2024, 10, 1 + i % 2)))).toDF("id", "d")
    cat.commitCdcApply("ns", "rep", batch(0, 40),
      Seq.empty[Long].toDF("id"), keyCols = Seq("id")): Unit
    cat.commitCdcApply("ns", "rep", batch(40, 80),
      Seq(Tuple1(3L)).toDF("id"), keyCols = Seq("id")): Unit
    assert(cat.read("ns", "rep").count() === 79L) // 80 upserted - 1 deleted
    val head = cat.latest("ns", "rep").get
    val dataEntries = cat.prunedDataEntries("ns", "rep", head, Array.empty)
      .toSeq.filterNot(_.stats.get("__rows").exists(_._1 == "0"))
    assert(dataEntries.nonEmpty)
    // every row-bearing cdc data file is tuple-aligned: single day
    // (min == max) and single bucket (derived stat present, min == max)
    dataEntries.foreach { e =>
      val (dMin, dMax) = e.stats("d")
      assert(dMin === dMax, s"${e.path} straddles days [$dMin, $dMax]")
      val (bMin, bMax) = e.stats(GraftCatalog.bucketStatKey(2, "id"))
      assert(bMin === bMax, s"${e.path} straddles buckets [$bMin, $bMax]")
      assert(e.blooms.contains("id"), s"${e.path} lost the bucket bloom")
    }
  }

  test("identity-omission guard: a foreign table whose data files OMIT an " +
       "identity partition source column refuses loudly instead of reading " +
       "silent NULLs; the same table with the column present imports fine") {
    val cat = freshCatalog()
    cat.createTable("ns", "io")
    cat.commitAppend("ns", "io",
      Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("region", "payload").coalesce(1))
    val dest = Files.createTempDirectory("graft-io-export").toString
    IcebergExport.exportTable(cat, "ns", "io", dest): Unit
    // doctor the metadata: declare spec-0 (the one the manifests
    // reference) as identity-partitioned on region (field id 1)
    val mp = java.nio.file.Paths.get(dest, "metadata", "v1.metadata.json")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(Files.readAllBytes(mp))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val specsArr = root.putArray("partition-specs")
    val sp = specsArr.addObject()
    sp.put("spec-id", 0): Unit
    val f = sp.putArray("fields").addObject()
    f.put("name", "region").put("transform", "identity")
      .put("source-id", 1).put("field-id", 1000): Unit
    root.put("last-partition-id", 1000): Unit
    Files.write(mp, mapper.writeValueAsBytes(root)): Unit

    // positive control: files still carry `region` -> imports, and the
    // foreign identity spec maps onto graft.partition-spec
    val ok = freshCatalog()
    IcebergImport.importTable(ok, "imp", "io", dest): Unit
    assert(ok.read("imp", "io").count() === 3L)
    assert(ok.tableProperties("imp", "io")
      .get(GraftCatalog.PartitionSpecProp).exists(_.contains("identity")))

    // now OMIT the column from the data file (what a spec-reliant
    // foreign writer does) — the import must refuse, not NULL-fill
    val dataDir = java.nio.file.Paths.get(dest, "data")
    val files = Files.list(dataDir).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toList
    files.foreach { p =>
      val stripped = spark.read.parquet(p.toString).drop("region")
      val tmp = Files.createTempDirectory("io-strip")
      stripped.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).iterator().asScala
        .find(_.toString.endsWith(".parquet")).get
      Files.move(part, p, java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
    }
    val bad = freshCatalog()
    val e = intercept[IllegalArgumentException] {
      IcebergImport.importTable(bad, "imp", "io2", dest)
    }
    assert(e.getMessage.contains("identity partition source"))
    assert(e.getMessage.contains("partition tuple"),
      "the doctored spec's manifests carry an EMPTY tuple — the refusal " +
        "must say reconstruction had nothing to fill from")
    assert(!bad.tableExists("imp", "io2"))
  }

  test("identity-omission RECONSTRUCTION: when the manifests DO record " +
       "partition tuples, an omitted identity source column imports by " +
       "rewriting each file once with the constant from its tuple — the " +
       "spec's required reader behavior, not a refusal") {
    val cat = freshCatalog()
    val c = graft.catalog.GraftSparkCatalog.registerSqlCatalog(spark, cat.warehouse)
    // identity-partitioned table -> aligned files -> the export derives
    // PROVABLE per-file tuples (round-11 machinery)
    spark.sql(s"""CREATE TABLE $c.ns.idr (region STRING, id BIGINT, d DATE)
                  PARTITIONED BY (region)""")
    val src = (0 until 90).map { i =>
      (Seq("emea", "apac", "amer")(i % 3), i.toLong,
        java.sql.Date.valueOf(java.time.LocalDate.of(2024, 7, 1 + i % 5)))
    }.toDF("region", "id", "d")
    src.createOrReplaceTempView("idr_src")
    spark.sql(s"INSERT INTO $c.ns.idr SELECT * FROM idr_src").collect(): Unit
    val expect = spark.sql(
      s"SELECT region, count(*) AS cnt, sum(id) AS s FROM $c.ns.idr " +
        "GROUP BY region ORDER BY region").collect().toSeq

    val dest = Files.createTempDirectory("graft-idr-export").toString
    IcebergExport.exportTable(cat, "ns", "idr", dest): Unit
    // a spec-reliant foreign writer: strip the identity source column
    // from EVERY data file (readers must fill it from the tuple)
    val dataDir = java.nio.file.Paths.get(dest, "data")
    val files = Files.list(dataDir).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toList
    assert(files.size >= 3, "fixture must have at least one file per region")
    // the empty-v0 zero-row file rides a spec-0 (unpartitioned) manifest
    // and never needs a fill — only row-carrying files count
    val filled = files.count(p => spark.read.parquet(p.toString).count() > 0)
    files.foreach { p =>
      val stripped = spark.read.parquet(p.toString).drop("region")
      val tmp = Files.createTempDirectory("idr-strip")
      stripped.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).iterator().asScala
        .find(_.toString.endsWith(".parquet")).get
      Files.move(part, p, java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
    }

    val imp = freshCatalog()
    val report = IcebergImport.importTable(imp, "imp", "idr", dest)
    assert(report.rewrittenFiles === filled,
      s"every stripped row-carrying file must rewrite once, got " +
        s"${report.rewrittenFiles} of $filled")
    // the reconstructed column equals the original data exactly
    val got = imp.read("imp", "idr")
      .groupBy(col("region")).agg(count(lit(1)).as("cnt"), sum("id").as("s"))
      .orderBy(col("region")).collect().toSeq
    assert(got === expect, s"reconstructed values must match: $got vs $expect")
    assert(imp.read("imp", "idr").filter(col("region").isNull).count() === 0L)
  }
}
