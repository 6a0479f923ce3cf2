package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.catalog.GraftCatalog

/** Persistent views: CREATE VIEW against the graft catalog persists the
  * definition in the WAREHOUSE (versioned sidecar JSON), so views
  * outlive the session that created them — a fresh catalog instance
  * mounting the same warehouse resolves and reads them. */
class ViewsSpec extends SparkSpec {
  import spark.implicits._

  private def freshWarehouse(): String =
    Files.createTempDirectory("graft-views").toString

  private def seed(c: String): Unit = {
    spark.sql(s"CREATE TABLE $c.ns.t (id BIGINT, v DOUBLE)")
    Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0))
      .toDF("id", "v").createOrReplaceTempView("views_src")
    spark.sql(s"INSERT INTO $c.ns.t SELECT * FROM views_src").collect(): Unit
  }

  test("SQL view lifecycle: CREATE VIEW persists, SELECT reads through " +
       "it, SHOW VIEWS lists it, REPLACE updates it, DROP removes it") {
    val w = freshWarehouse()
    val c = graft.catalog.GraftSparkCatalog.registerSqlCatalog(spark, w)
    seed(c)
    spark.sql(s"CREATE VIEW $c.ns.big AS SELECT id, v FROM $c.ns.t WHERE id > 2")
    assert(spark.sql(s"SELECT sum(id) FROM $c.ns.big").head().getLong(0) === 7L)
    // listed
    val shown = spark.sql(s"SHOW VIEWS IN $c.ns").collect().map(_.getString(1))
    assert(shown.contains("big"))
    // view and table names share one namespace
    intercept[Exception](
      spark.sql(s"CREATE TABLE $c.ns.big (x INT)"))
    intercept[Exception](
      spark.sql(s"CREATE VIEW $c.ns.t AS SELECT 1 AS one"))
    // CREATE OR REPLACE publishes a NEW VERSION (history retained)
    spark.sql(s"CREATE OR REPLACE VIEW $c.ns.big AS " +
      s"SELECT id, v FROM $c.ns.t WHERE id > 3")
    assert(spark.sql(s"SELECT sum(id) FROM $c.ns.big").head().getLong(0) === 4L)
    val cat = new GraftCatalog(spark, w)
    assert(cat.viewHistory("ns", "big").size === 2,
      "replace must version, not overwrite")
    // ALTER VIEW SET/UNSET TBLPROPERTIES round-trips
    spark.sql(s"ALTER VIEW $c.ns.big SET TBLPROPERTIES ('owner.note'='x1')")
    assert(spark.sql(s"SHOW TBLPROPERTIES $c.ns.big").collect()
      .exists(r => r.getString(0) == "owner.note" && r.getString(1) == "x1"))
    spark.sql(s"ALTER VIEW $c.ns.big UNSET TBLPROPERTIES ('owner.note')")
    assert(!spark.sql(s"SHOW TBLPROPERTIES $c.ns.big").collect()
      .exists(_.getString(0) == "owner.note"))
    // DROP
    spark.sql(s"DROP VIEW $c.ns.big")
    assert(!new GraftCatalog(spark, w).viewExists("ns", "big"))
    intercept[Exception](spark.sql(s"SELECT * FROM $c.ns.big").collect())
  }

  test("USE-scoped names work: under `USE <cat>.<ns>`, 1-part CREATE " +
       "VIEW / SELECT / DROP resolve through the current catalog+" +
       "namespace, and a same-named TEMP view keeps its stock precedence") {
    val w = freshWarehouse()
    val c = graft.catalog.GraftSparkCatalog.registerSqlCatalog(spark, w)
    seed(c)
    try {
      spark.sql(s"USE $c.ns")
      spark.sql("CREATE VIEW uv AS SELECT id FROM t WHERE id >= 3")
      assert(spark.sql("SELECT sum(id) FROM uv").head().getLong(0) === 7L)
      // 2-part spelling resolves through the current CATALOG
      assert(spark.sql(s"SELECT sum(id) FROM ns.uv").head().getLong(0) === 7L)
      // persisted where the 3-part spelling finds it
      assert(spark.sql(s"SELECT count(*) FROM $c.ns.uv").head().getLong(0) === 2L)
      // a session TEMP view of the same name WINS over the graft view
      // (stock precedence) and is never silently shadowed
      Seq(100L).toDF("id").createOrReplaceTempView("uv")
      assert(spark.sql("SELECT sum(id) FROM uv").head().getLong(0) === 100L)
      spark.catalog.dropTempView("uv")
      assert(spark.sql("SELECT sum(id) FROM uv").head().getLong(0) === 7L)
      spark.sql("DROP VIEW uv")
      assert(!new GraftCatalog(spark, w).viewExists("ns", "uv"))
    } finally spark.sql("USE spark_catalog.default")
  }

  test("a view OUTLIVES its defining session: a fresh catalog instance " +
       "mounting the same warehouse resolves and reads it (and the " +
       "definition references resolve against the DEFINING catalog)") {
    val w = freshWarehouse()
    val c1 = graft.catalog.GraftSparkCatalog.registerSqlCatalog(spark, w)
    seed(c1)
    spark.sql(s"CREATE VIEW $c1.ns.evens AS " +
      s"SELECT id, v * 10 AS v10 FROM $c1.ns.t WHERE id % 2 = 0")
    // a SECOND registration under a DIFFERENT alias = a fresh
    // GraftSparkCatalog instance with its own GraftCatalog (fresh
    // caches) mounting the same warehouse — the in-session analogue of
    // a new process / restarted session
    val c2 = s"${c1}_second"
    spark.conf.set(s"spark.sql.catalog.$c2", "graft.catalog.GraftSparkCatalog")
    spark.conf.set(s"spark.sql.catalog.$c2.warehouse", w)
    assert(c2 != c1)
    val rows = spark.sql(s"SELECT id, v10 FROM $c2.ns.evens ORDER BY id")
      .as[(Long, Double)].collect().toSeq
    assert(rows === Seq((2L, 20.0), (4L, 40.0)))
    // rename moves the whole version history atomically
    spark.sql(s"ALTER VIEW $c2.ns.evens RENAME TO ns.pairs")
    assert(spark.sql(s"SELECT count(*) FROM $c2.ns.pairs").head().getLong(0) === 2L)
    assert(!new GraftCatalog(spark, w).viewExists("ns", "evens"))
  }

  test("view depth: ALTER VIEW ... AS redefines (new version, history " +
       "kept), SHOW CREATE TABLE emits re-runnable CREATE VIEW DDL, and " +
       "a view-over-view chain re-resolves through an ALTERed base") {
    val w = freshWarehouse()
    val c = graft.catalog.GraftSparkCatalog.registerSqlCatalog(spark, w)
    seed(c)
    spark.sql(s"CREATE VIEW $c.ns.base (key, val) " +
      s"COMMENT 'layer 1' TBLPROPERTIES ('tier'='bronze') AS " +
      s"SELECT id, v FROM $c.ns.t WHERE id > 1")
    spark.sql(s"CREATE VIEW $c.ns.top AS " +
      s"SELECT sum(val) AS total, count(*) AS cnt FROM $c.ns.base")
    assert(spark.sql(s"SELECT total, cnt FROM $c.ns.top").head()
      === org.apache.spark.sql.Row(9.0, 3L))

    // ALTER VIEW ... AS replaces the query (a new version; properties
    // carry over) and the view STACK sees the change on the next read
    spark.sql(s"ALTER VIEW $c.ns.base AS SELECT id AS key, v AS val " +
      s"FROM $c.ns.t WHERE id > 3")
    assert(spark.sql(s"SELECT total, cnt FROM $c.ns.top").head()
      === org.apache.spark.sql.Row(4.0, 1L))
    val cat = new GraftCatalog(spark, w)
    assert(cat.viewHistory("ns", "base").size === 2)
    assert(spark.sql(s"SHOW TBLPROPERTIES $c.ns.base").collect()
      .exists(r => r.getString(0) == "tier" && r.getString(1) == "bronze"),
      "ALTER ... AS must carry existing properties over")

    // an ALTERed base TABLE flows through the whole stack (views
    // re-resolve at read time — Spark's schema-evolution binding)
    spark.sql(s"INSERT INTO $c.ns.t VALUES (10, 10.0)")
    assert(spark.sql(s"SELECT total, cnt FROM $c.ns.top").head()
      === org.apache.spark.sql.Row(14.0, 2L))

    // SHOW CREATE TABLE on the view: DDL round-trips — drop the view,
    // re-run the emitted statement, the rebuilt view answers identically
    val ddl = spark.sql(s"SHOW CREATE TABLE $c.ns.base").head().getString(0)
    assert(ddl.contains("CREATE VIEW") && ddl.contains("TBLPROPERTIES"),
      ddl)
    spark.sql(s"DROP VIEW $c.ns.base")
    spark.sql(ddl)
    assert(spark.sql(s"SELECT total, cnt FROM $c.ns.top").head()
      === org.apache.spark.sql.Row(14.0, 2L))
    assert(spark.sql(s"SHOW TBLPROPERTIES $c.ns.base").collect()
      .exists(r => r.getString(0) == "tier" && r.getString(1) == "bronze"),
      "the emitted DDL must carry user properties")
    // SHOW CREATE TABLE on a graft TABLE keeps its stock path (no
    // view reroute)
    assert(!spark.sql(s"SHOW CREATE TABLE $c.ns.t").head().getString(0)
      .contains("CREATE VIEW"))
  }

  test("view reads compose with catalog features through the underlying " +
       "table: new INSERTs are visible (views are definitions, not " +
       "materializations), and pruning still reaches the scan") {
    val w = freshWarehouse()
    val c = graft.catalog.GraftSparkCatalog.registerSqlCatalog(spark, w)
    seed(c)
    spark.sql(s"CREATE VIEW $c.ns.live AS SELECT id FROM $c.ns.t WHERE id >= 3")
    assert(spark.sql(s"SELECT count(*) FROM $c.ns.live").head().getLong(0) === 2L)
    spark.sql(s"INSERT INTO $c.ns.t VALUES (9, 9.0)").collect(): Unit
    assert(spark.sql(s"SELECT count(*) FROM $c.ns.live").head().getLong(0) === 3L)
    // the view body's filter reaches the parquet scan as a pushed filter
    val plan = spark.sql(s"SELECT * FROM $c.ns.live")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(id,3)"), s"no pushdown in:\n$plan")
  }

  test("persisted definitions REFUSE temporary views at CREATE/ALTER " +
       "time (a temp reference would vanish — or silently REBIND to a " +
       "same-named catalog table — at read time), while CTE names that " +
       "shadow a temp view stay legal") {
    val w = freshWarehouse()
    val c = graft.catalog.GraftSparkCatalog.registerSqlCatalog(spark, w)
    seed(c)
    Seq((99L, 9.9)).toDF("id", "v").createOrReplaceTempView("views_tmp")
    val e = intercept[Exception](spark.sql(
      s"CREATE VIEW $c.ns.bad AS SELECT * FROM views_tmp"))
    assert(e.getMessage.contains("temporary view"))
    assert(!new GraftCatalog(spark, w).viewExists("ns", "bad"))
    // nested in a subquery too
    val e2 = intercept[Exception](spark.sql(
      s"CREATE VIEW $c.ns.bad AS SELECT * FROM $c.ns.t " +
        "WHERE id IN (SELECT id FROM views_tmp)"))
    assert(e2.getMessage.contains("temporary view"))
    // a CTE named like the temp view BINDS the name — legal, and reads
    // through the CTE (never the temp view) after a restart analogue
    spark.sql(s"""CREATE VIEW $c.ns.ok AS
      WITH views_tmp AS (SELECT id, v FROM $c.ns.t WHERE id >= 3)
      SELECT sum(id) AS s FROM views_tmp""")
    assert(spark.sql(s"SELECT s FROM $c.ns.ok").head().getLong(0) === 7L)
    // ALTER ... AS gets the same guard
    val e3 = intercept[Exception](spark.sql(
      s"ALTER VIEW $c.ns.ok AS SELECT * FROM views_tmp"))
    assert(e3.getMessage.contains("temporary view"))
  }

  test("view-body qualification is CTE-SCOPE-AWARE: a subquery's CTE " +
       "name does not exempt a same-named OUTER table from resolving " +
       "against the view's defining catalog") {
    val w = freshWarehouse()
    val c = graft.catalog.GraftSparkCatalog.registerSqlCatalog(spark, w)
    seed(c)
    // a second table named like the subquery's CTE
    spark.sql(s"CREATE TABLE $c.ns.x (id BIGINT)")
    spark.sql(s"INSERT INTO $c.ns.x VALUES (100), (200)").collect(): Unit
    // create under the defining context (what makes unqualified names
    // meaningful — the recorded currentCatalog/currentNamespace)
    spark.sql(s"USE $c.ns")
    try {
      // outer `x` = the catalog table (must qualify against the
      // defining catalog); inner `x` = the CTE (must stay untouched)
      spark.sql(s"""CREATE VIEW $c.ns.scoped AS
        SELECT (SELECT sum(o.id) FROM x o) AS outer_sum,
               (SELECT a FROM (WITH x AS (SELECT 7 AS a) SELECT a FROM x) q)
                 AS cte_val""")
    } finally spark.sql("USE spark_catalog.default")
    val r = spark.sql(s"SELECT outer_sum, cte_val FROM $c.ns.scoped").head()
    assert(r.getLong(0) === 300L, "outer x must be the defining catalog's table")
    assert(r.getInt(1) === 7, "inner x must stay the CTE")
  }

  test("RECURSIVE view bodies work: the CTE's self-reference is scope-" +
       "bound (never qualified into a catalog table), and a temporary " +
       "FUNCTION reference refuses like a temp view") {
    val w = freshWarehouse()
    val c = graft.catalog.GraftSparkCatalog.registerSqlCatalog(spark, w)
    seed(c)
    // a catalog table named like the recursive CTE — the trap: a
    // bind-after-body scope would qualify the self-reference into it
    spark.sql(s"CREATE TABLE $c.ns.r (n INT)")
    spark.sql(s"INSERT INTO $c.ns.r VALUES (999)").collect(): Unit
    spark.sql(s"""CREATE VIEW $c.ns.rec AS
      WITH RECURSIVE r AS (SELECT 1 AS n UNION ALL SELECT n + 1 FROM r WHERE n < 5)
      SELECT sum(n) AS s FROM r""")
    assert(spark.sql(s"SELECT s FROM $c.ns.rec").head().getLong(0) === 15L,
      "the self-reference must stay the CTE, never the catalog table")
    // temp functions vanish with the session — refuse at CREATE
    spark.udf.register("views_tmp_fn", (x: Long) => x * 2)
    val e = intercept[Exception](spark.sql(
      s"CREATE VIEW $c.ns.badfn AS SELECT views_tmp_fn(id) AS d FROM $c.ns.t"))
    assert(e.getMessage.contains("temporary function"))
    assert(!new GraftCatalog(spark, w).viewExists("ns", "badfn"))
  }

  test("listings stay honest: _views plumbing is invisible to SHOW " +
       "TABLES / listTables / pagination, and view names refuse the " +
       "same reserved prefixes as tables") {
    val w = freshWarehouse()
    val c = graft.catalog.GraftSparkCatalog.registerSqlCatalog(spark, w)
    seed(c)
    spark.sql(s"CREATE VIEW $c.ns.v1 AS SELECT id FROM $c.ns.t")
    val cat = new GraftCatalog(spark, w)
    assert(cat.listTables("ns") === Seq("t"))
    assert(spark.sql(s"SHOW TABLES IN $c.ns").collect().map(_.getString(1))
      .toSeq === Seq("t"))
    intercept[Exception](cat.createView("ns", "_hidden", "{}", replace = false))
    intercept[Exception](cat.createView("ns", ".dot", "{}", replace = false))
  }
}
