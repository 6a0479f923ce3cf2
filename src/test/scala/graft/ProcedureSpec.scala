package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.catalog.GraftCatalog

/** SQL stored procedures (Spark 4 DSv2 ProcedureCatalog → `CALL`): the
  * maintenance and Iceberg-interop actions a SQL-only user runs without
  * the Scala API. Each CALL must execute the real transactional catalog
  * operation and return its report row. */
class ProcedureSpec extends SparkSpec {
  import spark.implicits._

  private def register(): (GraftCatalog, String) = {
    val wh = Files.createTempDirectory("graft-proc").toString
    (new GraftCatalog(spark, wh),
      graft.catalog.GraftSparkCatalog.registerSqlCatalog(spark, wh))
  }

  test("CALL compact bin-packs to one file and reports the new version; " +
       "expire_snapshots reclaims and reports; rollback restores") {
    val (cat, c) = register()
    cat.createTable("m", "t")
    (1 to 3).foreach(i => cat.commitAppend("m", "t",
      Seq((i.toLong, i * 1.5)).toDF("id", "v").repartition(2)))

    val comp = spark.sql(s"CALL $c.system.compact('m', 't', ${256L * 1024 * 1024})")
    assert(comp.columns.toSeq === Seq("version", "file_count", "total_bytes"))
    val compRow = comp.head()
    assert(compRow.getLong(0) === 3L)
    assert(compRow.getLong(1) === 1L, "everything fits one target-size file")
    assert(spark.sql(s"SELECT sum(id) FROM $c.m.t").head().getLong(0) === 6L)

    val exp = spark.sql(s"CALL $c.system.expire_snapshots('m', 't', 1)").head()
    assert(exp.getLong(0) > 0L, "pre-compaction files must be reclaimed")
    assert(exp.getLong(1) === 1L, "one live version remains")

    // fresh history for rollback (expiry above dropped the old versions)
    cat.commitAppend("m", "t", Seq((99L, 0.0)).toDF("id", "v"))
    val headBefore = cat.latest("m", "t").get.seq
    val rb = spark.sql(s"CALL $c.system.rollback('m', 't', ${headBefore - 1})").head()
    assert(rb.getLong(0) === headBefore + 1, "rollback publishes a NEW head")
    assert(spark.sql(s"SELECT sum(id) FROM $c.m.t").head().getLong(0) === 6L,
      "the bad append must be gone from the head")
  }

  test("CALL iceberg_export then iceberg_import round-trips a table " +
       "through the Iceberg v2 format entirely in SQL") {
    val (cat, c) = register()
    cat.createTable("m", "src")
    cat.commitAppend("m", "src", Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
    cat.commitAppend("m", "src", Seq((3L, "c")).toDF("id", "name"))
    val dest = Files.createTempDirectory("graft-proc-ice").toString

    val er = spark.sql(s"CALL $c.system.iceberg_export('m', 'src', '$dest')").head()
    assert(er.getLong(1) === 2L, "two snapshots exported")
    assert(er.getLong(4) === 3L, "head rows")
    assert(Files.exists(java.nio.file.Paths.get(er.getString(0))))

    val ir = spark.sql(s"CALL $c.system.iceberg_import('m', 'back', '$dest')").head()
    assert(ir.getString(0) === "m.back")
    assert(ir.getLong(1) === 2L, "both snapshots replayed")
    assert(ir.getLong(2) === 0L, "appends only")
    // the imported table is immediately a first-class SQL table:
    // reads, time travel, the lot
    assert(spark.sql(s"SELECT * FROM $c.m.back ORDER BY id")
      .as[(Long, String)].collect().toSeq === Seq((1L, "a"), (2L, "b"), (3L, "c")))
    assert(spark.sql(s"SELECT count(*) FROM $c.m.back VERSION AS OF 0")
      .head().getLong(0) === 2L)
  }

  test("metadata tables: graft.ns.t.history and .files serve the commit " +
       "log / manifest list as read-only SQL tables") {
    val (cat, c) = register()
    cat.createTable("m", "t")
    cat.commitAppend("m", "t", Seq((1L, "a")).toDF("id", "v"))
    cat.commitAppend("m", "t", Seq((2L, "b"), (3L, "c")).toDF("id", "v"))
    val h = spark.sql(s"SELECT seq, file_cnt FROM $c.m.t.history ORDER BY seq")
      .as[(Long, Long)].collect().toSeq
    assert(h.map(_._1) === Seq(0L, 1L))
    assert(h.last._2 === cat.latest("m", "t").get.fileCount)
    assert(spark.sql(s"SELECT * FROM $c.m.t.snapshots").count() === 2L)
    val files = spark.sql(s"SELECT path, size_bytes, content FROM $c.m.t.files")
      .as[(String, Long, String)].collect()
    assert(files.length.toLong === cat.latest("m", "t").get.fileCount)
    assert(files.forall(_._2 > 0L))
    assert(files.forall(_._3 == "data"))
    // merge-on-read head: the delete file appears AS a delete, never
    // disguised as data
    cat.commitDelete("m", "t", Seq(1L).toDF("id"))
    val byContent = spark.sql(s"SELECT content, count(*) FROM $c.m.t.files GROUP BY 1")
      .as[(String, Long)].collect().toMap
    assert(byContent("deletes") === 1L)
    assert(byContent("data") === files.length.toLong)
    // .manifests: one row per HEAD manifest — content kind, entry/size
    // rollups, and the seq that first published it
    val mans = spark.sql(s"SELECT path, content, file_cnt, total_size_bytes, " +
        s"added_at_seq FROM $c.m.t.manifests")
      .as[(String, String, Long, Long, Long)].collect()
    assert(mans.length === 3, "two data manifests + one delete manifest")
    assert(mans.count(_._2 == "deletes") === 1)
    assert(mans.filter(_._2 == "data").map(_._3).sum === files.length.toLong)
    assert(mans.map(_._5).sorted.toSeq === Seq(0L, 1L, 2L),
      "each manifest is attributed to the commit that published it")
    assert(mans.forall(_._4 > 0L))
    // .refs: main + branches + tags with their head seq / commit id
    cat.createBranch("m", "t", "dev")
    cat.createTag("m", "t", "rel-1", atSeq = Some(1L))
    val refs = spark.sql(s"SELECT name, type, seq, commit_id FROM $c.m.t.refs " +
        "ORDER BY name")
      .as[(String, String, Long, String)].collect().toSeq
    assert(refs.map(r => (r._1, r._2)) ===
      Seq(("dev", "branch"), ("main", "branch"), ("rel-1", "tag")))
    assert(refs.find(_._1 == "main").get._3 === cat.latest("m", "t").get.seq)
    assert(refs.find(_._1 == "main").get._4 === cat.latest("m", "t").get.commitId)
    assert(refs.find(_._1 == "rel-1").get._3 === 1L)
    // a metadata name on a MISSING table still resolves nothing
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM $c.m.nope.history").collect()
    }
    assert(e.getMessage.toLowerCase.contains("table"))
  }

  test("CALL create_branch / fast_forward / create_tag / " +
       "sweep_orphan_manifests run the real ref machinery") {
    val (cat, c) = register()
    cat.createTable("m", "t")
    cat.commitAppend("m", "t", Seq((1L, "a")).toDF("id", "v"))
    val cb = spark.sql(s"CALL $c.system.create_branch('m', 't', 'dev')").head()
    assert((cb.getString(0), cb.getLong(1)) === ("dev", 0L))
    cat.commitAppendToBranch("m", "t", "dev", Seq((2L, "b")).toDF("id", "v"))
    val ff = spark.sql(s"CALL $c.system.fast_forward('m', 't', 'dev')").head()
    assert(ff.getLong(0) === 1L)
    assert(spark.sql(s"SELECT sum(id) FROM $c.m.t").head().getLong(0) === 3L)
    val tg = spark.sql(s"CALL $c.system.create_tag('m', 't', 'v0', 0)").head()
    assert((tg.getString(0), tg.getLong(1)) === ("v0", 0L))
    assert(cat.readTag("m", "t", "v0").count() === 1L)
    // a freshly-committed table has no orphans; sub-minute grace would
    // reap in-flight commits' manifests and must refuse
    assert(spark.sql(s"CALL $c.system.sweep_orphan_manifests('m', 't', 3600000)")
      .head().getLong(0) === 0L)
    val eg = intercept[Exception] {
      spark.sql(s"CALL $c.system.sweep_orphan_manifests('m', 't', 0)").collect()
    }
    assert(eg.getMessage.contains("grace_ms"))
  }

  test("CALL backfill_stats turns a files-registered table metadata-countable") {
    val (cat, c) = register()
    cat.createTable("m", "t")
    val staged = Files.createDirectories(cat.tablePath("m", "t").resolve("data/landed"))
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(staged.toString)
    val files = java.nio.file.Files.list(staged).iterator()
    val rel = new scala.collection.mutable.ArrayBuffer[String]
    while (files.hasNext) {
      val f = files.next().getFileName.toString
      if (f.endsWith(".parquet")) rel += s"data/landed/$f"
    }
    cat.commitFiles("m", "t", rel.toSeq, sourceRegion = "remote",
      schemaJson = Some(Seq((1L, "a")).toDF("id", "v").schema.json))
    assert(cat.countFastOpt("m", "t").isEmpty, "files-registered: no stats yet")
    val r = spark.sql(s"CALL $c.system.backfill_stats('m', 't')").head()
    assert(r.getLong(1) === 1L)
    assert(cat.countFastOpt("m", "t") === Some(3L))
    // second call is a no-op at the same version
    assert(spark.sql(s"CALL $c.system.backfill_stats('m', 't')").head().getLong(1) === 0L)
  }

  test("CALL rewrite_manifests consolidates planning metadata without " +
       "touching data") {
    val (cat, c) = register()
    cat.createTable("m", "rm")
    (1 to 5).foreach(i => cat.commitAppend("m", "rm",
      Seq((i.toLong, s"v$i")).toDF("id", "v")))
    assert(cat.latest("m", "rm").get.manifests.size === 5)
    val r = spark.sql(s"CALL $c.system.rewrite_manifests('m', 'rm', 10000)").head()
    assert(r.getLong(1) === 4L, "5 manifests fold into 1")
    assert(cat.latest("m", "rm").get.manifests.size === 1)
    assert(spark.sql(s"SELECT count(*) FROM $c.m.rm").head().getLong(0) === 5L)
    // stats survived the consolidation: metadata count still answers
    assert(cat.countFastOpt("m", "rm") === Some(5L))
    // no-op second call
    assert(spark.sql(s"CALL $c.system.rewrite_manifests('m', 'rm', 10000)")
      .head().getLong(1) === 0L)
  }

  test("destructive-argument guards: retain_last 0 and 2^32 (int-truncates " +
       "to 0) refuse before touching the log; compact target 0 refuses") {
    val (cat, c) = register()
    cat.createTable("m", "t")
    cat.commitAppend("m", "t", Seq((1L, "a")).toDF("id", "v"))
    for (bad <- Seq("0", "-1", (1L << 32).toString)) {
      val e = intercept[Exception] {
        spark.sql(s"CALL $c.system.expire_snapshots('m', 't', $bad)").collect()
      }
      assert(e.getMessage.contains("retain_last"), s"for $bad got: ${e.getMessage}")
    }
    val e2 = intercept[Exception] {
      spark.sql(s"CALL $c.system.compact('m', 't', 0)").collect()
    }
    assert(e2.getMessage.contains("target_file_bytes"))
    // nothing was expired or rewritten by the refused calls
    assert(cat.snapshots("m", "t").map(_.seq) === Seq(0L))
  }

  test("an unknown procedure fails with the available list in the message") {
    val (_, c) = register()
    val e = intercept[Exception] {
      spark.sql(s"CALL $c.system.vacuum('m', 't')").collect()
    }
    // Spark wraps the plugin error in FAILED_TO_LOAD_ROUTINE; our
    // available-procedures message rides the cause chain
    val messages = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString("\n")
    assert(messages.contains("FAILED_TO_LOAD_ROUTINE"))
    assert(messages.contains("iceberg_export"),
      s"error should list available procedures, got:\n$messages")
  }

  test("property-driven retention: expire_snapshots_auto honors the " +
       "table's OWN history.expire.* TBLPROPERTIES — age cutoff with a " +
       "min-snapshots floor; malformed values refuse loudly; defaults " +
       "(5 days / keep 1) expire nothing fresh") {
    val (cat, c) = register()
    cat.createTable("m", "ret")
    (1 to 4).foreach(i => cat.commitAppend("m", "ret",
      Seq((i.toLong, i * 1.0)).toDF("id", "v").coalesce(1)))
    assert(cat.snapshots("m", "ret").size === 4)

    // defaults: everything is seconds old, far inside 5 days → no-op
    val noop = spark.sql(s"CALL $c.system.expire_snapshots_auto('m', 'ret')").head()
    assert(noop.getLong(0) === 0L && noop.getLong(1) === 4L)

    // aggressive age + floor of 2: every version is older than 1 ms,
    // the floor keeps exactly the newest two
    Thread.sleep(20)
    spark.sql(s"""ALTER TABLE $c.m.ret SET TBLPROPERTIES (
      '${GraftCatalog.MaxSnapshotAgeMsProp}'='1',
      '${GraftCatalog.MinSnapshotsToKeepProp}'='2')""")
    Thread.sleep(20)
    // the property commit itself is now the head; floor 2 keeps it + one
    val out = spark.sql(s"CALL $c.system.expire_snapshots_auto('m', 'ret')").head()
    assert(out.getLong(1) === 2L, s"floor must keep 2, kept ${out.getLong(1)}")
    // the table still reads exactly (latest data intact)
    assert(spark.sql(s"SELECT sum(id) FROM $c.m.ret").head().getLong(0) === 10L)

    // malformed policy refuses loudly instead of expiring on defaults
    spark.sql(s"""ALTER TABLE $c.m.ret SET TBLPROPERTIES (
      '${GraftCatalog.MaxSnapshotAgeMsProp}'='five days')""")
    val e = intercept[Exception](cat.expireSnapshots("m", "ret"))
    assert(e.getMessage.contains(GraftCatalog.MaxSnapshotAgeMsProp))
  }

  test("SQL-only multi-table transaction: INSERT INTO writable branch " +
       "views stages (main untouched), CALL commit_transaction publishes " +
       "ATOMICALLY across tables, and INSERT OVERWRITE on a branch view " +
       "refuses") {
    val (cat, c) = register()
    spark.sql(s"CREATE TABLE $c.q.x1 (id BIGINT, v DOUBLE)")
    spark.sql(s"CREATE TABLE $c.q.x2 (id BIGINT, s STRING)")
    spark.sql(s"INSERT INTO $c.q.x1 VALUES (1, 1.0)").collect(): Unit
    spark.sql(s"INSERT INTO $c.q.x2 VALUES (1, 'a')").collect(): Unit
    spark.sql(s"CALL $c.system.create_branch('q', 'x1', 'st')").collect(): Unit
    spark.sql(s"CALL $c.system.create_branch('q', 'x2', 'st')").collect(): Unit

    spark.sql(s"INSERT INTO $c.q.x1.branch_st VALUES (2, 2.0)").collect(): Unit
    spark.sql(s"INSERT INTO $c.q.x2.branch_st VALUES (2, 'b')").collect(): Unit
    // the branch view reads STAGED state; main is untouched
    assert(spark.sql(s"SELECT count(*) FROM $c.q.x1.branch_st")
      .head().getLong(0) === 2L)
    assert(spark.sql(s"SELECT count(*) FROM $c.q.x1").head().getLong(0) === 1L)
    assert(spark.sql(s"SELECT count(*) FROM $c.q.x2").head().getLong(0) === 1L)

    val rows = spark.sql(
      s"CALL $c.system.commit_transaction('q.x1:st;q.x2:st', 'sqltxn1')")
      .collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("q.x1", "q.x2"))
    assert(rows.map(_.getString(2)).toSeq ===
      Seq("txn-sqltxn1-0", "txn-sqltxn1-1"))
    assert(spark.sql(s"SELECT count(*) FROM $c.q.x1").head().getLong(0) === 2L)
    assert(spark.sql(s"SELECT count(*) FROM $c.q.x2").head().getLong(0) === 2L)
    // the staged branches are gone with the publish
    assert(cat.listBranches("q", "x1").isEmpty)

    // INSERT OVERWRITE on a branch view refuses (branches stage appends)
    spark.sql(s"CALL $c.system.create_branch('q', 'x1', 'ow')").collect(): Unit
    val e2 = intercept[Exception] {
      spark.sql(s"INSERT OVERWRITE $c.q.x1.branch_ow VALUES (9, 9.0)")
        .collect(): Unit
    }
    assert(e2.getMessage.contains("INSERT INTO only") ||
      Option(e2.getCause).exists(_.getMessage.contains("INSERT INTO only")),
      s"unexpected: ${e2.getMessage}")
    // a malformed parts spec refuses loudly
    val e3 = intercept[Exception] {
      spark.sql(s"CALL $c.system.commit_transaction('q.x1', 'sqltxn2')")
        .collect(): Unit
    }
    assert(e3.getMessage.contains("ns.table:branch") ||
      Option(e3.getCause).exists(_.getMessage.contains("ns.table:branch")))

    // the read-side dual: a transactionally-consistent CUT over SQL —
    // the pinned pair carries the committed transaction on BOTH tables
    // and reads coherently via VERSION AS OF
    val cut = spark.sql(
      s"CALL $c.system.snapshot_consistent('q.x1;q.x2')").collect()
    assert(cut.map(_.getString(0)).toSeq === Seq("q.x1", "q.x2"))
    assert(cut.map(_.getString(2)).toSeq ===
      Seq("txn-sqltxn1-0", "txn-sqltxn1-1"))
    val (s1, s2) = (cut(0).getLong(1), cut(1).getLong(1))
    assert(spark.sql(s"SELECT count(*) FROM $c.q.x1 VERSION AS OF $s1")
      .head().getLong(0) === 2L)
    assert(spark.sql(s"SELECT count(*) FROM $c.q.x2 VERSION AS OF $s2")
      .head().getLong(0) === 2L)
  }
}
