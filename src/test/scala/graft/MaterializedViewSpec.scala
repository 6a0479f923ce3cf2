package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.catalog.GraftCatalog

/** SQL materialized views: CREATE materializes the query into a graft
  * table with the definition + staleness watermark in TBLPROPERTIES;
  * REFRESH maintains it — by signed changefeed delta for the
  * count/sum GROUP BY shape (O(changed groups), never a base rescan),
  * by full rebuild for everything else. */
class MaterializedViewSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): (GraftCatalog, String) = {
    val cat = new GraftCatalog(spark,
      Files.createTempDirectory("graft-mv").toString)
    (cat, graft.catalog.GraftSparkCatalog.registerSqlCatalog(spark, cat.warehouse))
  }

  test("incremental MV lifecycle: CREATE pins the shape + watermark, " +
       "REFRESH applies inserts AND deletes as signed deltas (zero-count " +
       "groups vanish), a fresh view no-ops, and the result always " +
       "equals the full recompute") {
    val (cat, c) = fresh()
    spark.sql(s"CREATE TABLE $c.ns.base (id BIGINT, grp BIGINT, cents BIGINT)")
    val src = (0 until 300).map(i => (i.toLong, (i % 5).toLong, i.toLong * 7))
      .toDF("id", "grp", "cents")
    src.createOrReplaceTempView("mv_src")
    spark.sql(s"INSERT INTO $c.ns.base SELECT * FROM mv_src").collect(): Unit

    spark.sql(s"CREATE MATERIALIZED VIEW $c.ns.stats AS " +
      s"SELECT grp, count(*) AS cnt, sum(cents) AS total " +
      s"FROM $c.ns.base GROUP BY grp")
    def expect() = spark.sql(
      s"SELECT grp, count(*) AS cnt, sum(cents) AS total FROM $c.ns.base " +
        "GROUP BY grp ORDER BY grp").collect().toSeq
    def got() = spark.sql(s"SELECT grp, cnt, total FROM $c.ns.stats " +
      "ORDER BY grp").collect().toSeq
    assert(got() === expect())
    val props0 = cat.tableProperties("ns", "stats")
    assert(props0("graft.mv.mode") === "incremental")
    assert(props0("graft.mv.base") === "ns base")
    val wm0 = props0("graft.mv.base-seq").toLong

    // a fresh view refreshes as a NO-OP (no new version)
    val vFresh = cat.latest("ns", "stats").get.seq
    spark.sql(s"REFRESH MATERIALIZED VIEW $c.ns.stats")
    assert(cat.latest("ns", "stats").get.seq === vFresh)

    // inserts + MoR deletes on the base -> one signed-delta refresh
    spark.sql(s"INSERT INTO $c.ns.base VALUES (1000, 1, 999), (1001, 9, 5)")
    spark.sql(s"DELETE FROM $c.ns.base WHERE grp = 2") // whole group gone
    spark.sql(s"DELETE FROM $c.ns.base WHERE id = 3")  // partial group
    spark.sql(s"REFRESH MATERIALIZED VIEW $c.ns.stats")
    assert(got() === expect(), "refreshed state must equal full recompute")
    assert(!got().exists(_.getLong(0) == 2L), "zero-count group must vanish")
    assert(got().exists(_.getLong(0) == 9L), "new group must appear")
    val props1 = cat.tableProperties("ns", "stats")
    assert(props1("graft.mv.base-seq").toLong > wm0,
      "the staleness watermark must advance with the refresh")
    // watermark rides the SAME snapshot as the state (crash-atomic)
    assert(cat.latest("ns", "stats").get.properties("graft.mv.base-seq")
      === props1("graft.mv.base-seq"))

    // second wave, including an expression-valued refresh path
    spark.sql(s"INSERT INTO $c.ns.base SELECT id + 2000, grp, cents * 2 " +
      s"FROM $c.ns.base WHERE grp = 1")
    spark.sql(s"REFRESH MATERIALIZED VIEW $c.ns.stats")
    assert(got() === expect())

    // DROP removes it; a plain table refuses the MV spelling
    spark.sql(s"DROP MATERIALIZED VIEW $c.ns.stats")
    assert(!cat.tableExists("ns", "stats"))
    val e = intercept[Exception](
      spark.sql(s"DROP MATERIALIZED VIEW $c.ns.base"))
    assert(e.getMessage.contains("plain table"))
    spark.sql(s"DROP MATERIALIZED VIEW IF EXISTS $c.ns.stats") // no-op
  }

  test("incremental shape tolerates WHERE + expression keys; non-" +
       "maintainable queries (joins, avg) pin mode=full and refresh by " +
       "rebuild; duplicate CREATE refuses unless IF NOT EXISTS") {
    val (cat, c) = fresh()
    spark.sql(s"CREATE TABLE $c.ns.t (k BIGINT, v BIGINT)")
    (0 until 100).map(i => (i.toLong, i.toLong)).toDF("k", "v")
      .createOrReplaceTempView("mv_src2")
    spark.sql(s"INSERT INTO $c.ns.t SELECT * FROM mv_src2").collect(): Unit

    // WHERE + expression key stays incremental
    spark.sql(s"CREATE MATERIALIZED VIEW $c.ns.m1 AS " +
      s"SELECT k % 7 AS bucket, count(*) AS cnt, sum(v) AS s " +
      s"FROM $c.ns.t WHERE v > 10 GROUP BY k % 7")
    assert(cat.tableProperties("ns", "m1")("graft.mv.mode") === "incremental")
    spark.sql(s"INSERT INTO $c.ns.t VALUES (200, 500), (201, 2)")
    spark.sql(s"REFRESH MATERIALIZED VIEW $c.ns.m1")
    assert(spark.sql(s"SELECT * FROM $c.ns.m1 ORDER BY bucket").collect().toSeq
      === spark.sql(s"SELECT k % 7 AS bucket, count(*) AS cnt, sum(v) AS s " +
        s"FROM $c.ns.t WHERE v > 10 GROUP BY k % 7 ORDER BY bucket")
        .collect().toSeq)

    // min -> full mode (deletes break monotonicity), still correct
    // through rebuilds; avg without count(*) selected also pins full
    // (the merge needs the weight column)
    spark.sql(s"CREATE MATERIALIZED VIEW $c.ns.m2 AS " +
      s"SELECT k % 3 AS g, min(v) AS mn FROM $c.ns.t GROUP BY k % 3")
    assert(cat.tableProperties("ns", "m2")("graft.mv.mode") === "full")
    spark.sql(s"CREATE MATERIALIZED VIEW $c.ns.m2b AS " +
      s"SELECT k % 3 AS g, avg(v) AS a FROM $c.ns.t GROUP BY k % 3")
    assert(cat.tableProperties("ns", "m2b")("graft.mv.mode") === "full",
      "avg without count(*) has no merge weight — must pin full")
    spark.sql(s"INSERT INTO $c.ns.t VALUES (300, 300)")
    spark.sql(s"REFRESH MATERIALIZED VIEW $c.ns.m2")
    assert(spark.sql(s"SELECT * FROM $c.ns.m2 ORDER BY g").collect().toSeq
      === spark.sql(s"SELECT k % 3 AS g, min(v) AS mn FROM $c.ns.t " +
        "GROUP BY k % 3 ORDER BY g").collect().toSeq)

    // duplicate CREATE refuses; IF NOT EXISTS no-ops
    intercept[Exception](spark.sql(
      s"CREATE MATERIALIZED VIEW $c.ns.m1 AS SELECT 1 AS one"))
    spark.sql(s"CREATE MATERIALIZED VIEW IF NOT EXISTS $c.ns.m1 AS " +
      "SELECT 1 AS one")
    assert(spark.sql(s"SELECT count(*) FROM $c.ns.m1").head().getLong(0) > 1L,
      "IF NOT EXISTS must keep the original definition")

    // a temp-view reference refuses at CREATE (persisted definition)
    Seq(1L).toDF("x").createOrReplaceTempView("mv_tmp")
    val e = intercept[Exception](spark.sql(
      s"CREATE MATERIALIZED VIEW $c.ns.m3 AS SELECT count(*) AS c FROM mv_tmp"))
    assert(e.getMessage.contains("temporary"))
  }

  test("shape guardrails: count(expr) (NULL-skipping) and GLOBAL " +
       "aggregates pin mode=full — signed deltas would drift them; a " +
       "subquery-projection shape stays incremental (_sign carried " +
       "through the projection) and refreshes correctly") {
    val (cat, c) = fresh()
    spark.sql(s"CREATE TABLE $c.ns.t (k BIGINT, p DOUBLE)")
    spark.sql(s"INSERT INTO $c.ns.t VALUES (1, 1.0), (2, CAST(NULL AS DOUBLE))," +
      " (3, 3.0), (4, 4.0)").collect(): Unit

    // count(p) skips NULLs — sum(_sign) cannot; must be FULL mode
    spark.sql(s"CREATE MATERIALIZED VIEW $c.ns.g1 AS " +
      s"SELECT k % 2 AS g, count(p) AS c FROM $c.ns.t GROUP BY k % 2")
    assert(cat.tableProperties("ns", "g1")("graft.mv.mode") === "full")
    spark.sql(s"INSERT INTO $c.ns.t VALUES (5, CAST(NULL AS DOUBLE))")
    spark.sql(s"REFRESH MATERIALIZED VIEW $c.ns.g1")
    assert(spark.sql(s"SELECT * FROM $c.ns.g1 ORDER BY g").collect().toSeq
      === spark.sql(s"SELECT k % 2 AS g, count(p) AS c FROM $c.ns.t " +
        "GROUP BY k % 2 ORDER BY g").collect().toSeq)

    // global aggregate: deleting every row must keep SQL's one-row
    // (0, NULL) shape — only a rebuild preserves that
    spark.sql(s"CREATE MATERIALIZED VIEW $c.ns.g2 AS " +
      s"SELECT count(*) AS c, sum(p) AS s FROM $c.ns.t")
    assert(cat.tableProperties("ns", "g2")("graft.mv.mode") === "full")
    spark.sql(s"DELETE FROM $c.ns.t WHERE k > 0")
    spark.sql(s"REFRESH MATERIALIZED VIEW $c.ns.g2")
    assert(spark.sql(s"SELECT * FROM $c.ns.g2").collect().toSeq
      === Seq(Row(0L, null)))

    // subquery projection: the signed plan must thread _sign through
    // the Project or every refresh dies unresolved
    spark.sql(s"INSERT INTO $c.ns.t VALUES (10, 1.0), (11, 2.0), (17, 3.0)")
    spark.sql(s"CREATE MATERIALIZED VIEW $c.ns.g3 AS " +
      s"SELECT grp, count(*) AS c FROM " +
      s"(SELECT k % 7 AS grp FROM $c.ns.t) GROUP BY grp")
    assert(cat.tableProperties("ns", "g3")("graft.mv.mode") === "incremental")
    spark.sql(s"INSERT INTO $c.ns.t VALUES (24, 9.0)")
    spark.sql(s"REFRESH MATERIALIZED VIEW $c.ns.g3")
    assert(spark.sql(s"SELECT * FROM $c.ns.g3 ORDER BY grp").collect().toSeq
      === spark.sql(s"SELECT k % 7 AS grp, count(*) AS c FROM $c.ns.t " +
        "GROUP BY k % 7 ORDER BY grp").collect().toSeq)
  }

  test("more shape guardrails: a grouping expr absent from the SELECT " +
       "list pins mode=full (the merge re-groups by the view's own " +
       "columns — it would collapse the hidden group); a view pinned " +
       "incremental by an earlier laxer detector DOWNGRADES to full on " +
       "refresh instead of refusing forever") {
    val (cat, c) = fresh()
    spark.sql(s"CREATE TABLE $c.ns.t (k BIGINT, j BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $c.ns.t VALUES (1, 1, 10), (1, 2, 20), (2, 1, 30)")

    // GROUP BY k, j but only k selected: two j-groups share each k row
    spark.sql(s"CREATE MATERIALIZED VIEW $c.ns.h1 AS " +
      s"SELECT k, count(*) AS c FROM $c.ns.t GROUP BY k, j")
    assert(cat.tableProperties("ns", "h1")("graft.mv.mode") === "full")
    spark.sql(s"INSERT INTO $c.ns.t VALUES (1, 2, 5)")
    spark.sql(s"REFRESH MATERIALIZED VIEW $c.ns.h1")
    assert(spark.sql(s"SELECT * FROM $c.ns.h1 ORDER BY k, c").collect().toSeq
      === spark.sql(s"SELECT k, count(*) AS c FROM $c.ns.t GROUP BY k, j " +
        "ORDER BY k, c").collect().toSeq)

    // legacy-pinned incremental whose stored definition the CURRENT
    // detector rejects: refresh rebuilds AND records mode=full
    spark.sql(s"CREATE MATERIALIZED VIEW $c.ns.h2 AS " +
      s"SELECT k, count(*) AS c FROM $c.ns.t GROUP BY k")
    assert(cat.tableProperties("ns", "h2")("graft.mv.mode") === "incremental")
    cat.commitProperties("ns", "h2", Map(
      "graft.mv.query" -> s"SELECT k, count(v) AS c FROM $c.ns.t GROUP BY k")):
      Unit // count(expr): the old detector accepted this, the new refuses
    spark.sql(s"INSERT INTO $c.ns.t VALUES (3, 1, 7)")
    spark.sql(s"REFRESH MATERIALIZED VIEW $c.ns.h2") // must not throw
    assert(cat.tableProperties("ns", "h2")("graft.mv.mode") === "full",
      "the un-maintainable view must downgrade, not refuse forever")
    assert(spark.sql(s"SELECT * FROM $c.ns.h2 ORDER BY k").collect().toSeq
      === spark.sql(s"SELECT k, count(v) AS c FROM $c.ns.t GROUP BY k " +
        "ORDER BY k").collect().toSeq)
  }

  test("incremental AVG (round-13): a bare-column avg with count(*) " +
       "maintains by signed-sum reconstruction under inserts AND " +
       "deletes; a NULL-bearing base pins full at CREATE; a NULL " +
       "arriving in a delta DOWNGRADES the view instead of silently " +
       "drifting it") {
    val (cat, c) = fresh()
    spark.sql(s"CREATE TABLE $c.ns.t (k BIGINT, v BIGINT)")
    (0 until 200).map(i => ((i % 7).toLong, i.toLong * 3)).toDF("k", "v")
      .createOrReplaceTempView("mv_avg_src")
    spark.sql(s"INSERT INTO $c.ns.t SELECT * FROM mv_avg_src").collect(): Unit

    spark.sql(s"CREATE MATERIALIZED VIEW $c.ns.av AS " +
      s"SELECT k, count(*) AS c, sum(v) AS s, avg(v) AS a " +
      s"FROM $c.ns.t GROUP BY k")
    assert(cat.tableProperties("ns", "av")("graft.mv.mode") === "incremental")

    def expectRows() = spark.sql(
      s"SELECT k, count(*) AS c, sum(v) AS s, avg(v) AS a FROM $c.ns.t " +
        "GROUP BY k ORDER BY k").collect().toSeq
    def gotRows() = spark.sql(s"SELECT k, c, s, a FROM $c.ns.av ORDER BY k")
      .collect().toSeq
    def assertMatches(): Unit = {
      val (g, e) = (gotRows(), expectRows())
      assert(g.size === e.size)
      g.zip(e).foreach { case (gr, er) =>
        assert(gr.getLong(0) === er.getLong(0))
        assert(gr.getLong(1) === er.getLong(1))
        assert(gr.getLong(2) === er.getLong(2))
        // reconstruction is float-exact up to ~1 ulp per refresh
        assert(math.abs(gr.getDouble(3) - er.getDouble(3)) <=
          math.max(1e-9, math.abs(er.getDouble(3)) * 1e-12),
          s"avg drifted for k=${gr.getLong(0)}: ${gr.getDouble(3)} vs " +
            s"${er.getDouble(3)}")
      }
    }
    assertMatches()

    // churn: inserts, a whole-group delete, a partial delete -> one
    // incremental refresh
    spark.sql(s"INSERT INTO $c.ns.t VALUES (9, 100), (9, 200), (1, 77)")
    spark.sql(s"DELETE FROM $c.ns.t WHERE k = 2")
    spark.sql(s"DELETE FROM $c.ns.t WHERE k = 3 AND v < 100")
    val v0 = cat.latest("ns", "av").get.seq
    spark.sql(s"REFRESH MATERIALIZED VIEW $c.ns.av")
    assert(cat.latest("ns", "av").get.seq === v0 + 1)
    assert(cat.tableProperties("ns", "av")("graft.mv.mode") === "incremental")
    assertMatches()
    assert(!gotRows().exists(_.getLong(0) == 2L), "zero-count group vanishes")

    // second refresh wave (reconstruction compounds; still within ulp)
    spark.sql(s"INSERT INTO $c.ns.t SELECT k, v * 2 FROM $c.ns.t WHERE k = 4")
    spark.sql(s"REFRESH MATERIALIZED VIEW $c.ns.av")
    assertMatches()

    // a NULL arriving in the delta: avg skips it, count(*) cannot —
    // the refresh must rebuild AND downgrade, never reconstruct
    spark.sql(s"INSERT INTO $c.ns.t VALUES (5, CAST(NULL AS BIGINT))")
    spark.sql(s"REFRESH MATERIALIZED VIEW $c.ns.av")
    assert(cat.tableProperties("ns", "av")("graft.mv.mode") === "full",
      "a NULL-bearing delta must downgrade the avg view")
    assertMatches()

    // a NULL-bearing base pins full at CREATE
    spark.sql(s"CREATE TABLE $c.ns.tn (k BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $c.ns.tn VALUES (1, 10), (2, CAST(NULL AS BIGINT))")
    spark.sql(s"CREATE MATERIALIZED VIEW $c.ns.avn AS " +
      s"SELECT k, count(*) AS c, avg(v) AS a FROM $c.ns.tn GROUP BY k")
    assert(cat.tableProperties("ns", "avn")("graft.mv.mode") === "full")
  }

  test("incremental MIN/MAX (round-13/14): monotone merge under insert-" +
       "only deltas (strings included); a delete-bearing delta takes the " +
       "GROUP-SCOPED HYBRID refresh without losing the incremental mode, " +
       "and the next insert-only window is incremental again") {
    val (cat, c) = fresh()
    spark.sql(s"CREATE TABLE $c.ns.t (k BIGINT, v BIGINT, s STRING)")
    spark.sql(s"INSERT INTO $c.ns.t VALUES " +
      "(1, 10, 'm'), (1, 20, 'a'), (2, 5, 'q'), (2, 50, 'z')")
    spark.sql(s"CREATE MATERIALIZED VIEW $c.ns.mm AS " +
      s"SELECT k, count(*) AS c, sum(v) AS sv, min(v) AS mn, " +
      s"max(v) AS mx, min(s) AS ms FROM $c.ns.t GROUP BY k")
    assert(cat.tableProperties("ns", "mm")("graft.mv.mode") === "incremental")

    def expect() = spark.sql(s"SELECT k, count(*) AS c, sum(v) AS sv, " +
      s"min(v) AS mn, max(v) AS mx, min(s) AS ms FROM $c.ns.t " +
      "GROUP BY k ORDER BY k").collect().toSeq
    def got() = spark.sql(
      s"SELECT k, c, sv, mn, mx, ms FROM $c.ns.mm ORDER BY k")
      .collect().toSeq
    def path() = spark.sql(s"CALL $c.system.refresh_mv('ns', 'mm')")
      .head().getString(0)

    // insert-only wave: new extrema on both ends, a new group, a new
    // string minimum
    spark.sql(s"INSERT INTO $c.ns.t VALUES " +
      "(1, 3, 'zz'), (1, 99, 'b'), (3, 7, 'x'), (2, 50, 'Q')")
    assert(path() === "incremental")
    assert(got() === expect())

    // a delete: the erased row held group 2's max -> group-scoped
    // hybrid (only k=2 re-derives from the base), mode retained
    spark.sql(s"DELETE FROM $c.ns.t WHERE k = 2 AND v = 50 AND s = 'z'")
    assert(path() === "hybrid", "a delete-bearing window must take the " +
      "group-scoped hybrid refresh")
    assert(cat.tableProperties("ns", "mm")("graft.mv.mode") === "incremental",
      "the hybrid refresh must not downgrade the mode")
    assert(got() === expect())

    // back to insert-only -> incremental again
    spark.sql(s"INSERT INTO $c.ns.t VALUES (3, 1, 'a')")
    assert(path() === "incremental")
    assert(got() === expect())

    // min/max of a NESTED-function argument still pins full
    spark.sql(s"CREATE MATERIALIZED VIEW $c.ns.mm2 AS " +
      s"SELECT k, count(*) AS c, min(abs(v)) AS mn FROM $c.ns.t GROUP BY k")
    assert(cat.tableProperties("ns", "mm2")("graft.mv.mode") === "full")
  }

  test("review regression: a window carrying BOTH a delete and a NULL " +
       "avg argument DOWNGRADES the view — the NULL probe must win over " +
       "the min/max one-off rebuild, or the NULL enters the base below " +
       "the watermark and every later avg reconstruction silently drifts") {
    val (cat, c) = fresh()
    spark.sql(s"CREATE TABLE $c.ns.t (k BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $c.ns.t VALUES (1, 10), (2, 20), (2, 30)")
    spark.sql(s"CREATE MATERIALIZED VIEW $c.ns.x AS " +
      s"SELECT k, count(*) AS c, avg(v) AS a, max(v) AS mx " +
      s"FROM $c.ns.t GROUP BY k")
    assert(cat.tableProperties("ns", "x")("graft.mv.mode") === "incremental")
    spark.sql(s"DELETE FROM $c.ns.t WHERE k = 2 AND v = 30")
    spark.sql(s"INSERT INTO $c.ns.t VALUES (5, CAST(NULL AS BIGINT))")
    spark.sql(s"REFRESH MATERIALIZED VIEW $c.ns.x")
    assert(cat.tableProperties("ns", "x")("graft.mv.mode") === "full",
      "delete+NULL window must downgrade, not take the mode-retaining rebuild")
    assert(spark.sql(s"SELECT k, c, a, mx FROM $c.ns.x ORDER BY k")
      .collect().toSeq ===
      spark.sql(s"SELECT k, count(*) AS c, avg(v) AS a, max(v) AS mx " +
        s"FROM $c.ns.t GROUP BY k ORDER BY k").collect().toSeq)
  }

  test("a star projection on the path pins mode=full (at refresh the " +
       "star would expand the delta view's own _sign and the appended " +
       "_sign would collide — ambiguous reference with no downgrade " +
       "exit), and a LEGACY view pinned incremental over a star " +
       "definition downgrades on refresh instead of dying") {
    val (cat, c) = fresh()
    spark.sql(s"CREATE TABLE $c.ns.t (k BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $c.ns.t VALUES (1, 10), (2, 20), (1, 5)")

    spark.sql(s"CREATE MATERIALIZED VIEW $c.ns.sv AS " +
      s"SELECT k, count(*) AS c FROM (SELECT * FROM $c.ns.t) GROUP BY k")
    assert(cat.tableProperties("ns", "sv")("graft.mv.mode") === "full")
    spark.sql(s"INSERT INTO $c.ns.t VALUES (3, 1)")
    spark.sql(s"REFRESH MATERIALIZED VIEW $c.ns.sv")
    assert(spark.sql(s"SELECT * FROM $c.ns.sv ORDER BY k").collect().toSeq
      === spark.sql(s"SELECT k, count(*) AS c FROM $c.ns.t GROUP BY k " +
        "ORDER BY k").collect().toSeq)

    // legacy-pinned incremental whose stored definition carries a star:
    // refresh must rebuild + downgrade, never die on the duplicate _sign
    spark.sql(s"CREATE MATERIALIZED VIEW $c.ns.sv2 AS " +
      s"SELECT k, count(*) AS c FROM $c.ns.t GROUP BY k")
    assert(cat.tableProperties("ns", "sv2")("graft.mv.mode") === "incremental")
    cat.commitProperties("ns", "sv2", Map("graft.mv.query" ->
      s"SELECT k, count(*) AS c FROM (SELECT * FROM $c.ns.t) GROUP BY k")): Unit
    spark.sql(s"INSERT INTO $c.ns.t VALUES (4, 2)")
    spark.sql(s"REFRESH MATERIALIZED VIEW $c.ns.sv2") // must not throw
    assert(cat.tableProperties("ns", "sv2")("graft.mv.mode") === "full")
    assert(spark.sql(s"SELECT * FROM $c.ns.sv2 ORDER BY k").collect().toSeq
      === spark.sql(s"SELECT k, count(*) AS c FROM $c.ns.t GROUP BY k " +
        "ORDER BY k").collect().toSeq)
  }

  test("pinBaseVersion pins a NEGATIVE watermark to the empty plan " +
       "(LIMIT 0): a base commit racing the lazy CREATE/rebuild " +
       "execution can never make the state newer than the -1 watermark " +
       "(which would double-apply the first incremental delta)") {
    import org.apache.spark.sql.catalyst.plans.logical.GlobalLimit
    val parsed = spark.sessionState.sqlParser.parsePlan(
      "SELECT k, count(*) AS c FROM some_base GROUP BY k")
    val pinned = graft.catalog.GraftMaterializedView.pinBaseVersion(parsed, -1L)
    assert(pinned.isInstanceOf[GlobalLimit],
      s"seq<0 must pin to LIMIT 0, got ${pinned.getClass.getSimpleName}")
    // and the end-to-end shape: state committed under a -1 watermark is
    // EMPTY, so the first refresh applies every base row exactly once
    val (cat, c) = fresh()
    spark.sql(s"CREATE TABLE $c.ns.b (g BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $c.ns.b VALUES (1, 10), (2, 20)")
    spark.sql(s"CREATE MATERIALIZED VIEW $c.ns.m AS " +
      s"SELECT g, count(*) AS cnt, sum(v) AS s FROM $c.ns.b GROUP BY g")
    // simulate the race: rewind the watermark to -1 with the CURRENT
    // state replaced by the empty frame the pin guarantees
    val empty = spark.sql(s"SELECT * FROM $c.ns.m LIMIT 0")
    cat.commitReplace("ns", "m", empty, sourceRegion = "test",
      propsSet = Map("graft.mv.base-seq" -> "-1")): Unit
    spark.sql(s"REFRESH MATERIALIZED VIEW $c.ns.m")
    assert(spark.sql(s"SELECT * FROM $c.ns.m ORDER BY g").collect().toSeq
      === spark.sql(s"SELECT g, count(*) AS cnt, sum(v) AS s FROM $c.ns.b " +
        "GROUP BY g ORDER BY g").collect().toSeq,
      "a -1 watermark over empty state must converge on first refresh")
  }

  test("CALL graft.system.refresh_mv is the scheduled-maintenance " +
       "spelling: same shared refresh, reports the path taken and the " +
       "post-refresh watermark") {
    val (cat, c) = fresh()
    spark.sql(s"CREATE TABLE $c.ns.b (g BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $c.ns.b VALUES (1, 10), (2, 20)")
    spark.sql(s"CREATE MATERIALIZED VIEW $c.ns.m AS " +
      s"SELECT g, count(*) AS cnt, sum(v) AS s FROM $c.ns.b GROUP BY g")
    // fresh -> noop
    val r0 = spark.sql(s"CALL $c.system.refresh_mv('ns', 'm')").head()
    assert(r0.getString(0) === "noop")
    spark.sql(s"INSERT INTO $c.ns.b VALUES (1, 5)")
    val r1 = spark.sql(s"CALL $c.system.refresh_mv('ns', 'm')").head()
    assert(r1.getString(0) === "incremental")
    assert(r1.getLong(1) === cat.latest("ns", "b").get.seq,
      "reported watermark must be the base head")
    assert(spark.sql(s"SELECT s FROM $c.ns.m WHERE g = 1").head().getLong(0)
      === 15L)
  }

  test("refreshes are CAS-anchored: a conditional property commit with a " +
       "stale expected parent aborts loudly (the primitive REFRESH and " +
       "ADD/DROP PARTITION FIELD anchor on)") {
    val (cat, c) = fresh()
    spark.sql(s"CREATE TABLE $c.ns.a (k BIGINT)")
    spark.sql(s"INSERT INTO $c.ns.a VALUES (1)")
    val seq = cat.latest("ns", "a").get.seq
    spark.sql(s"INSERT INTO $c.ns.a VALUES (2)") // someone else commits
    intercept[java.util.ConcurrentModificationException](
      cat.commitProperties("ns", "a", Map("x" -> "y"),
        expectedParentSeq = Some(seq)))
    // the fresh head still works
    cat.commitProperties("ns", "a", Map("x" -> "y"),
      expectedParentSeq = Some(cat.latest("ns", "a").get.seq)): Unit
    assert(cat.tableProperties("ns", "a")("x") === "y")
  }

  test("the MV survives its defining session's catalog instance and an " +
       "expired changefeed window falls back to a full rebuild") {
    val (cat, c) = fresh()
    spark.sql(s"CREATE TABLE $c.ns.b (g BIGINT, v BIGINT)")
    (0 until 60).map(i => ((i % 3).toLong, i.toLong)).toDF("g", "v")
      .createOrReplaceTempView("mv_src3")
    spark.sql(s"INSERT INTO $c.ns.b SELECT * FROM mv_src3").collect(): Unit
    spark.sql(s"CREATE MATERIALIZED VIEW $c.ns.mv AS " +
      s"SELECT g, count(*) AS cnt, sum(v) AS s FROM $c.ns.b GROUP BY g")

    // churn the base past the retention window, expire the old versions
    (0 until 3).foreach { i =>
      spark.sql(s"INSERT INTO $c.ns.b VALUES ($i, ${1000 + i})")
    }
    cat.expireSnapshots("ns", "b", retainLast = 1): Unit
    // the recorded watermark's version is gone -> changefeed unavailable
    spark.sql(s"REFRESH MATERIALIZED VIEW $c.ns.mv")
    assert(spark.sql(s"SELECT * FROM $c.ns.mv ORDER BY g").collect().toSeq
      === spark.sql(s"SELECT g, count(*) AS cnt, sum(v) AS s FROM $c.ns.b " +
        "GROUP BY g ORDER BY g").collect().toSeq,
      "an expired window must rebuild, never half-apply")
    // a fresh catalog instance (new session mount) still refreshes
    spark.sql(s"INSERT INTO $c.ns.b VALUES (2, 7777)")
    spark.sql(s"REFRESH MATERIALIZED VIEW $c.ns.mv")
    assert(spark.sql(s"SELECT s FROM $c.ns.mv WHERE g = 2").head().getLong(0)
      === spark.sql(s"SELECT sum(v) FROM $c.ns.b WHERE g = 2")
        .head().getLong(0))
  }

  test("GROUP-SCOPED HYBRID (round-14): a mixed avg+min/max view under a " +
       "delete-bearing window keeps avg/count/sum signed-delta and " +
       "re-derives ONLY the touched groups; the recompute reads a " +
       "bounded slice of the base (job-metrics assert); null group keys " +
       "and the changed-group cap both stay correct") {
    val (cat, c) = fresh()
    // merge-on-read deletes: the 100 TB churn shape this path exists
    // for — a CoW delete rewrites files, breaks the manifest-prefix
    // invariant and forces the changefeed onto the two-snapshot diff,
    // which would drown the job-metrics comparison below
    val prevMode = spark.conf.getOption("spark.graft.rowlevel.mode")
    spark.conf.set("spark.graft.rowlevel.mode", "merge-on-read")
    try {
    spark.sql(s"CREATE TABLE $c.ns.t (k BIGINT, v BIGINT)")
    // 8 groups x 5000 rows, one file per group (clustered) so the
    // recompute's key filter prunes; big enough that the O(base) full
    // rebuild dominates the hybrid's O(delta + changed-group slice)
    // reads in the job-metrics comparison below — which therefore ALSO
    // pins the pruning (an unpruned recompute alone reads > one base)
    (0 until 40000).map(i => ((i % 8).toLong, i.toLong * 3)).toDF("k", "v")
      .repartitionByRange(8, col("k")).createOrReplaceTempView("hy_src")
    spark.sql(s"INSERT INTO $c.ns.t SELECT * FROM hy_src").collect(): Unit
    spark.sql(s"CREATE MATERIALIZED VIEW $c.ns.h AS " +
      s"SELECT k, count(*) AS cnt, sum(v) AS sv, avg(v) AS av, " +
      s"min(v) AS mn, max(v) AS mx FROM $c.ns.t GROUP BY k")
    assert(cat.tableProperties("ns", "h")("graft.mv.mode") === "incremental")
    def path() = spark.sql(s"CALL $c.system.refresh_mv('ns', 'h')")
      .head().getString(0)
    def expect() = spark.sql(s"SELECT k, count(*) AS cnt, sum(v) AS sv, " +
      s"avg(v) AS av, min(v) AS mn, max(v) AS mx FROM $c.ns.t " +
      "GROUP BY k ORDER BY k").collect().toSeq
    def got() = spark.sql(
      s"SELECT k, cnt, sv, av, mn, mx FROM $c.ns.h ORDER BY k")
      .collect().toSeq
    def assertMatches(): Unit = got().zip(expect()).foreach { case (g, e) =>
      assert(g.get(0) === e.get(0)) // null-safely: NULL is a legal group
      assert(g.getLong(1) === e.getLong(1))
      assert(g.getLong(2) === e.getLong(2))
      assert(math.abs(g.getDouble(3) - e.getDouble(3)) <=
        math.max(1e-9, math.abs(e.getDouble(3)) * 1e-12),
        s"avg drifted for k=${g.get(0)}")
      assert(g.getLong(4) === e.getLong(4) && g.getLong(5) === e.getLong(5))
    }

    // records-read meter across the refresh (job-metrics assert)
    val recordsRead = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        recordsRead.addAndGet(te.taskMetrics.inputMetrics.recordsRead): Unit
    }
    def metered(body: => String): (String, Long) = {
      spark.sparkContext.addSparkListener(listener)
      recordsRead.set(0L)
      try {
        val p = body
        // listener bus is async — drain before reading the counter
        var spins = 0
        var last = -1L
        while (spins < 100 && recordsRead.get() != last) {
          last = recordsRead.get(); Thread.sleep(50); spins += 1
        }
        (p, recordsRead.get())
      } finally spark.sparkContext.removeSparkListener(listener)
    }

    // delete the max of ONE group (+ an insert elsewhere): hybrid path,
    // every column correct, mode retained
    spark.sql(s"DELETE FROM $c.ns.t WHERE k = 3 AND v = " +
      s"(SELECT max(v) FROM $c.ns.t WHERE k = 3)")
    spark.sql(s"INSERT INTO $c.ns.t VALUES (1, 9999)")
    val (p1, hybridRecords) = metered(path())
    assert(p1 === "hybrid")
    assert(cat.tableProperties("ns", "h")("graft.mv.mode") === "incremental")
    assertMatches()

    // the same churn resolved by a FULL rebuild on a copy reads the
    // whole base; the hybrid — changefeed + state + the changed-group
    // slice — must have read strictly less than one whole base pass
    spark.sql(s"CREATE MATERIALIZED VIEW $c.ns.hfull AS " +
      s"SELECT k, count(*) AS cnt, sum(v) AS sv, avg(v) AS av, " +
      s"min(v) AS mn, max(v) AS mx FROM $c.ns.t GROUP BY k")
    cat.commitProperties("ns", "hfull", Map("graft.mv.mode" -> "full")): Unit
    spark.sql(s"INSERT INTO $c.ns.t VALUES (2, 1)")
    val (p2, fullRecords) = metered(
      spark.sql(s"CALL $c.system.refresh_mv('ns', 'hfull')")
        .head().getString(0))
    assert(p2 === "full")
    assert(hybridRecords < fullRecords,
      s"hybrid must read less than a full rebuild: $hybridRecords vs " +
        s"$fullRecords")

    // null group key: a delete inside the NULL group re-derives it
    // null-safely (EqualNullSafe path), never drops or duplicates it
    spark.sql(s"INSERT INTO $c.ns.t VALUES " +
      "(CAST(NULL AS BIGINT), 10), (CAST(NULL AS BIGINT), 20)")
    assert(path() === "incremental")
    spark.sql(s"DELETE FROM $c.ns.t WHERE k IS NULL AND v = 20")
    assert(path() === "hybrid")
    val nullRows = got().filter(_.isNullAt(0))
    assert(nullRows.size === 1, s"exactly one NULL-key group, got $nullRows")
    assert(nullRows.head.getLong(1) === 1L &&
      nullRows.head.getLong(2) === 10L)
    assertMatches()

    // changed-group cap: churn touching > HybridKeyCap groups falls
    // back to the one-off full rebuild, mode retained
    spark.sql(s"CREATE TABLE $c.ns.wide (k BIGINT, v BIGINT)")
    (0 until 3000).map(i => (i.toLong, i.toLong)).toDF("k", "v")
      .createOrReplaceTempView("hy_wide")
    spark.sql(s"INSERT INTO $c.ns.wide SELECT * FROM hy_wide").collect(): Unit
    spark.sql(s"CREATE MATERIALIZED VIEW $c.ns.hw AS " +
      s"SELECT k, count(*) AS cnt, max(v) AS mx FROM $c.ns.wide GROUP BY k")
    spark.sql(s"DELETE FROM $c.ns.wide WHERE k % 2 = 0") // 1500 groups
    assert(spark.sql(s"CALL $c.system.refresh_mv('ns', 'hw')")
      .head().getString(0) === "full",
      "past the changed-group cap the one-off rebuild wins")
    assert(cat.tableProperties("ns", "hw")("graft.mv.mode") === "incremental")
    assert(spark.sql(s"SELECT k, cnt, mx FROM $c.ns.hw ORDER BY k")
      .collect().toSeq ===
      spark.sql(s"SELECT k, count(*) AS cnt, max(v) AS mx FROM $c.ns.wide " +
        "GROUP BY k ORDER BY k").collect().toSeq)
    } finally prevMode match {
      case Some(m) => spark.conf.set("spark.graft.rowlevel.mode", m)
      case None => spark.conf.unset("spark.graft.rowlevel.mode")
    }
  }

  test("review regression (round-14): the hybrid recompute resolves " +
       "under the MV's DEFINING catalog/namespace — an MV whose stored " +
       "definition spells an unqualified base name, refreshed from a " +
       "session parked in another catalog, must recompute from the " +
       "right table (never resolve in the session's current catalog)") {
    val (cat, c) = fresh()
    spark.sql(s"CREATE TABLE $c.ns.t (k BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $c.ns.t VALUES (1, 10), (1, 20), (2, 5)")
    spark.sql(s"USE $c.ns")
    try spark.sql("CREATE MATERIALIZED VIEW hmv AS " +
      "SELECT k, count(*) AS cnt, max(v) AS mx FROM t GROUP BY k")
    finally spark.sql("USE spark_catalog.default")
    assert(cat.tableProperties("ns", "hmv")("graft.mv.mode") === "incremental")
    assert(cat.tableProperties("ns", "hmv")("graft.mv.query")
      .contains("FROM t"), "fixture must store the UNQUALIFIED spelling")
    // delete-bearing MoR window -> the hybrid recompute must qualify
    // 't' under the defining context, not spark_catalog.default
    val prevMode = spark.conf.getOption("spark.graft.rowlevel.mode")
    spark.conf.set("spark.graft.rowlevel.mode", "merge-on-read")
    try spark.sql(s"DELETE FROM $c.ns.t WHERE k = 1 AND v = 20")
    finally prevMode match {
      case Some(m) => spark.conf.set("spark.graft.rowlevel.mode", m)
      case None => spark.conf.unset("spark.graft.rowlevel.mode")
    }
    assert(spark.sql(s"CALL $c.system.refresh_mv('ns', 'hmv')")
      .head().getString(0) === "hybrid")
    assert(spark.sql(s"SELECT k, cnt, mx FROM $c.ns.hmv ORDER BY k")
      .collect().toSeq ===
      spark.sql(s"SELECT k, count(*) AS cnt, max(v) AS mx FROM $c.ns.t " +
        "GROUP BY k ORDER BY k").collect().toSeq)
  }

  test("hybrid guardrail: a delete the defining WHERE filters out " +
       "touches no group — the refresh stays plain incremental; and an " +
       "expired window on an avg view RE-PROBES the base at the pinned " +
       "head (a NULL that arrived inside the lost window downgrades " +
       "instead of silently corrupting later reconstructions)") {
    val (cat, c) = fresh()
    spark.sql(s"CREATE TABLE $c.ns.t (k BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $c.ns.t VALUES (1, 10), (2, 20), (-5, 7)")
    spark.sql(s"CREATE MATERIALIZED VIEW $c.ns.f AS " +
      s"SELECT k, count(*) AS cnt, max(v) AS mx FROM $c.ns.t " +
      s"WHERE k >= 0 GROUP BY k")
    assert(cat.tableProperties("ns", "f")("graft.mv.mode") === "incremental")
    // the deleted row never passed the WHERE -> zero changed groups
    spark.sql(s"DELETE FROM $c.ns.t WHERE k = -5")
    assert(spark.sql(s"CALL $c.system.refresh_mv('ns', 'f')")
      .head().getString(0) === "incremental")
    assert(spark.sql(s"SELECT k, cnt, mx FROM $c.ns.f ORDER BY k")
      .collect().toSeq ===
      spark.sql(s"SELECT k, count(*) AS cnt, max(v) AS mx FROM $c.ns.t " +
        "WHERE k >= 0 GROUP BY k ORDER BY k").collect().toSeq)

    // ADVICE r13 (high): expired window + avg view. A NULL avg argument
    // arrives in the window, the window expires, the fallback rebuild
    // runs — incremental mode MUST NOT survive with the NULL now below
    // the watermark.
    spark.sql(s"CREATE TABLE $c.ns.b (k BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $c.ns.b VALUES (1, 10)")
    spark.sql(s"CREATE MATERIALIZED VIEW $c.ns.av AS " +
      s"SELECT k, count(*) AS cnt, avg(v) AS a FROM $c.ns.b GROUP BY k")
    assert(cat.tableProperties("ns", "av")("graft.mv.mode") === "incremental")
    // NULL lands inside the soon-to-expire window
    spark.sql(s"INSERT INTO $c.ns.b VALUES (1, CAST(NULL AS BIGINT))")
    spark.sql(s"INSERT INTO $c.ns.b VALUES (1, 20)")
    cat.expireSnapshots("ns", "b", retainLast = 1): Unit
    spark.sql(s"REFRESH MATERIALIZED VIEW $c.ns.av")
    assert(cat.tableProperties("ns", "av")("graft.mv.mode") === "full",
      "the expired-window fallback must re-probe the base and downgrade")
    // a later refresh over fresh churn still equals the recompute (no
    // reconstruction drift — (10+20)/2=15, never (10*2+20)/3=13.33)
    spark.sql(s"INSERT INTO $c.ns.b VALUES (1, 30)")
    spark.sql(s"REFRESH MATERIALIZED VIEW $c.ns.av")
    val row = spark.sql(s"SELECT cnt, a FROM $c.ns.av WHERE k = 1").head()
    assert(row.getLong(0) === 4L)
    assert(math.abs(row.getDouble(1) - 20.0) < 1e-9,
      s"avg must be (10+20+30)/3=20 over non-NULLs, got ${row.getDouble(1)}")

    // the clean-base expired window keeps incremental (probe passes)
    spark.sql(s"CREATE TABLE $c.ns.b2 (k BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $c.ns.b2 VALUES (1, 10)")
    spark.sql(s"CREATE MATERIALIZED VIEW $c.ns.av2 AS " +
      s"SELECT k, count(*) AS cnt, avg(v) AS a FROM $c.ns.b2 GROUP BY k")
    spark.sql(s"INSERT INTO $c.ns.b2 VALUES (1, 20)")
    spark.sql(s"INSERT INTO $c.ns.b2 VALUES (1, 30)")
    cat.expireSnapshots("ns", "b2", retainLast = 1): Unit
    spark.sql(s"REFRESH MATERIALIZED VIEW $c.ns.av2")
    assert(cat.tableProperties("ns", "av2")("graft.mv.mode") === "incremental",
      "a NULL-free base must keep incremental mode through the fallback")
    spark.sql(s"INSERT INTO $c.ns.b2 VALUES (1, 40)")
    spark.sql(s"REFRESH MATERIALIZED VIEW $c.ns.av2")
    val r2 = spark.sql(s"SELECT cnt, a FROM $c.ns.av2 WHERE k = 1").head()
    assert(r2.getLong(0) === 4L && math.abs(r2.getDouble(1) - 25.0) < 1e-9)
  }
}
