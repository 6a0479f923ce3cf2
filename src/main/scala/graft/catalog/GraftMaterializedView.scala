package graft.catalog

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, Multiply, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.{col, lit, sum, when}

/** SQL materialized views over graft tables:
  *
  *   CREATE MATERIALIZED VIEW [IF NOT EXISTS] mv AS <query>
  *   REFRESH MATERIALIZED VIEW mv
  *   DROP MATERIALIZED VIEW [IF EXISTS] mv
  *
  * (no stock grammar — same text-level intercept as
  * [[GraftPartitionDdl]]; a non-graft target falls through to the stock
  * parser's own error.)
  *
  * The view is an ordinary graft TABLE holding the query result, plus
  * TBLPROPERTIES metadata: the definition (`graft.mv.query` + defining
  * catalog/namespace, recorded like persisted views), the maintenance
  * MODE, and — for incremental views — the base table and the base
  * VERSION the state reflects (`graft.mv.base-seq`, the staleness
  * watermark a reader compares against the base's head).
  *
  * REFRESH picks the cheapest correct path:
  *
  *  - **incremental** (mode recorded at CREATE): queries of the shape
  *    `SELECT keys..., count(*) AS c, sum(e) AS s... FROM base [chain
  *    of WHERE/projections] GROUP BY keys` maintain by SIGNED DELTA —
  *    the base's row-level changefeed ([[GraftCatalog.changesBetween]]
  *    from the recorded watermark) is pushed through the query's OWN
  *    plan with `count(*) -> sum(_sign)` and `sum(e) -> sum(e * _sign)`
  *    (deletes weigh −1), then merged with the current state by one
  *    group-key aggregation. Cost O(changed groups) compute, never a
  *    base rescan — the reference recomputes derived tables per sync
  *    cycle, which a 100 TB base cannot afford. Groups whose count
  *    reaches zero vanish. Falls back to a full rebuild when the
  *    changefeed window has been expired.
  *    `avg(bare column)` also maintains incrementally (round-13): the
  *    merge runs in SUM space — state avg × count(*) plus the delta's
  *    signed sum, divided back — guarded by a NULL-free argument
  *    invariant (probed over the base at CREATE, re-probed per delta; a
  *    NULL downgrades the view to full, since avg skips NULLs while
  *    count(*) cannot) and a DoubleType result.
  *    `min`/`max` of a simple expression maintain MONOTONICALLY while
  *    deltas are insert-only (the 100 TB append-dominant shape); a
  *    delta carrying deletes takes the GROUP-SCOPED HYBRID path
  *    (round-14): sum/count/avg columns still merge by signed delta,
  *    and only the groups the delta touched re-derive from the pinned
  *    base (an erased row may have held their extremum) — mode kept,
  *    cost O(delta + changed groups), never a whole-view rebuild
  *    (fallback past [[HybridKeyCap]] changed groups).
  *  - **full** (everything else — joins, subqueries, DISTINCT):
  *    re-run the stored definition and replace the state.
  *
  * State + watermark publish as ONE snapshot (commitReplace propsSet) —
  * a crash can never leave a new state with an old watermark, which
  * would double-apply the next delta. */
private[graft] object GraftMaterializedView {

  val QueryProp = "graft.mv.query"
  val CatalogProp = "graft.mv.catalog"
  val NamespaceProp = "graft.mv.namespace"
  val ModeProp = "graft.mv.mode" // incremental | full
  val BaseProp = "graft.mv.base" // ns.table, incremental only
  val BaseSeqProp = "graft.mv.base-seq" // staleness watermark
  val AggColsProp = "graft.mv.agg-cols" // SELECT positions of aggregates
  val CountColProp = "graft.mv.count-col" // zero-group removal column

  private val Create =
    ("""(?is)\s*CREATE\s+MATERIALIZED\s+VIEW\s+(?:(IF\s+NOT\s+EXISTS)\s+)?""" +
      """([\w.`]+)\s+AS\s+(.+?)\s*;?\s*""").r
  private val DropR =
    """(?is)\s*DROP\s+MATERIALIZED\s+VIEW\s+(?:(IF\s+EXISTS)\s+)?([\w.`]+)\s*;?\s*""".r
  private val RefreshR =
    """(?is)\s*REFRESH\s+MATERIALIZED\s+VIEW\s+([\w.`]+)\s*;?\s*""".r

  def parse(sqlText: String, session: SparkSession,
            parseIdent: String => Seq[String]): Option[LogicalPlan] = {
    def target(raw: String): Option[Seq[String]] = {
      val parts = try parseIdent(raw) catch { case _: Exception => return None }
      GraftViewSql.viewTarget(session, parts).map(_ => parts)
    }
    sqlText match {
      case Create(ine, t, q) =>
        target(t).map(GraftCreateMvCommand(_, ine != null, q.trim))
      case DropR(ie, t) => target(t).map(GraftDropMvCommand(_, ie != null))
      case RefreshR(t) => target(t).map(GraftRefreshMvCommand(_))
      case _ => None
    }
  }

  /** The incrementally-maintainable shape of a PARSED (unresolved)
    * query, when it has one: the single base relation's name parts, the
    * SELECT positions that are aggregates, the positions that are
    * count(*) items, and a rebuild of the plan over a substitute
    * relation with the aggregates SIGNED. None -> maintain by full
    * rebuild. */
  private[catalog] case class MvShape(
      baseParts: Seq[String], aggPositions: Seq[Int], countPositions: Seq[Int],
      avgPositions: Seq[Int], avgArgCols: Seq[String],
      minPositions: Seq[Int], maxPositions: Seq[Int],
      signedPlanOver: String => LogicalPlan)

  private[catalog] def incrementalShape(parsed: LogicalPlan): Option[MvShape] =
    parsed match {
      case agg @ Aggregate(group, aggExprs, child, _)
          // a GLOBAL aggregate is NOT signed-maintainable: deleting the
          // last row must yield the one-row (0, NULL) shape SQL defines,
          // while the merge's zero-count filter would yield zero rows
          if group.nonEmpty =>
        // exactly one base relation under a chain of row-level nodes
        // (WHERE / projections / aliases) — those commute with signed
        // deltas; anything else (joins, set ops, windows) does not.
        // Projections must CARRY _sign through (they prune columns),
        // so swap() appends it to every Project on the path.
        var baseParts: Option[Seq[String]] = None
        var pathHasProject = false
        def swap(p: LogicalPlan, sub: LogicalPlan): Option[LogicalPlan] = p match {
          case r: UnresolvedRelation if baseParts.isEmpty =>
            baseParts = Some(r.multipartIdentifier); Some(sub)
          // a star would EXPAND the delta view's own _sign at refresh
          // and the appended _sign would duplicate it (ambiguous
          // reference, refresh dies with no downgrade path) — pin full
          case pj: Project if pj.projectList.exists(_.exists(
              _.isInstanceOf[org.apache.spark.sql.catalyst.analysis
                .UnresolvedStar])) => None
          case pj: Project => pathHasProject = true
            swap(pj.child, sub).map(n => pj.copy(
              projectList = pj.projectList :+ UnresolvedAttribute("_sign"),
              child = n))
          case f: Filter => swap(f.child, sub).map(n => f.copy(child = n))
          case sa: SubqueryAlias => swap(sa.child, sub).map(n => sa.copy(child = n))
          case _ => None
        }
        if (agg.expressions.exists(_.exists(_.isInstanceOf[SubqueryExpression])))
          return None
        val groupSqls = group.map(_.sql).toSet
        def isAgg(f: UnresolvedFunction, nm: String): Boolean =
          f.nameParts.map(_.toLowerCase) == Seq(nm) && !f.isDistinct &&
            f.filter.isEmpty
        // count(*) / count(1) ONLY: count(expr) skips NULL arguments,
        // which sum(_sign) cannot see — treating it as row count would
        // silently drift the view on every NULL-bearing delta
        def isCountStar(f: UnresolvedFunction): Boolean =
          isAgg(f, "count") && (f.arguments match {
            case Seq() => true
            case Seq(_: org.apache.spark.sql.catalyst.analysis.UnresolvedStar) => true
            case Seq(org.apache.spark.sql.catalyst.expressions
              .Literal(v, _)) => v != null
            case _ => false
          })
        def sumOf(e: Expression): Expression =
          UnresolvedFunction(Seq("sum"), Seq(e), isDistinct = false)
        val aggPos = scala.collection.mutable.ArrayBuffer.empty[Int]
        val cntPos = scala.collection.mutable.ArrayBuffer.empty[Int]
        val avgPos = scala.collection.mutable.ArrayBuffer.empty[Int]
        val avgArgs = scala.collection.mutable.ArrayBuffer.empty[String]
        val minPos = scala.collection.mutable.ArrayBuffer.empty[Int]
        val maxPos = scala.collection.mutable.ArrayBuffer.empty[Int]
        var maintainable = true
        val signed: Seq[Expression] = aggExprs.zipWithIndex.map {
          case (Alias(f: UnresolvedFunction, name), i) if isCountStar(f) =>
            aggPos += i; cntPos += i
            Alias(sumOf(UnresolvedAttribute("_sign")), name)()
          case (Alias(f: UnresolvedFunction, name), i)
              if isAgg(f, "sum") && f.arguments.size == 1 &&
                !f.arguments.head.exists(_.isInstanceOf[UnresolvedFunction]) =>
            aggPos += i
            Alias(sumOf(Multiply(f.arguments.head,
              UnresolvedAttribute("_sign"))), name)()
          // avg(bare column): the DELTA carries the signed SUM; the merge
          // converts the state's avg to a count(*)-weighted sum and back
          // (sound only while the column carries no NULLs — avg skips
          // them, count(*) does not; the callers probe the base at
          // CREATE, re-probe every delta, and downgrade on violation)
          case (Alias(f: UnresolvedFunction, name), i)
              if isAgg(f, "avg") && (f.arguments match {
                case Seq(a: UnresolvedAttribute) if a.nameParts.size == 1 => true
                case _ => false
              }) =>
            aggPos += i; avgPos += i
            avgArgs += f.arguments.head
              .asInstanceOf[UnresolvedAttribute].nameParts.head
            Alias(sumOf(Multiply(f.arguments.head,
              UnresolvedAttribute("_sign"))), name)()
          // min/max of a simple expression: MONOTONE under inserts, so
          // the delta aggregates the ORIGINAL expression (no signing —
          // the refresh falls back to a one-off full rebuild the moment
          // a delta carries deletes, see refresh()); min/max skip NULLs
          // natively, so no null invariant is needed
          case (a @ Alias(f: UnresolvedFunction, _), i)
              if (isAgg(f, "min") || isAgg(f, "max")) &&
                f.arguments.size == 1 &&
                !f.arguments.head.exists(_.isInstanceOf[UnresolvedFunction]) =>
            aggPos += i
            if (f.nameParts.map(_.toLowerCase) == Seq("min")) minPos += i
            else maxPos += i
            a
          case (e, _) if groupSqls.contains(stripAlias(e).sql) => e
          case _ => maintainable = false; null
        }
        // EVERY grouping expression must also be SELECTED: the refresh
        // merge re-groups by the view's own non-aggregate columns, so a
        // grouping expr absent from the SELECT list (GROUP BY k, j with
        // only k selected) would collapse distinct j-groups into one row
        // on the first incremental refresh — silent corruption
        val keySqls = aggExprs.zipWithIndex.collect {
          case (e, i) if maintainable && !aggPos.contains(i) =>
            stripAlias(e).sql
        }.toSet
        if (!maintainable || cntPos.isEmpty ||
            !groupSqls.subsetOf(keySqls)) None
        else {
          val probe = swap(child, UnresolvedRelation(Seq("__probe__")))
          // avg reconstruction resolves its argument against the BASE
          // schema (the no-NULL probe needs the raw column) — a Project
          // on the path could alias an expression under the same name,
          // making the probe blind; pin full there
          if (avgPos.nonEmpty && pathHasProject) None
          else probe.flatMap(_ => baseParts).map { parts =>
            MvShape(parts, aggPos.toSeq, cntPos.toSeq, avgPos.toSeq,
              avgArgs.toSeq, minPos.toSeq, maxPos.toSeq, deltaView => {
              baseParts = None // reset for the real swap
              agg.copy(aggregateExpressions =
                  signed.map(_.asInstanceOf[org.apache.spark.sql.catalyst
                    .expressions.NamedExpression]),
                child = swap(child, UnresolvedRelation(Seq(deltaView))).get)
            })
          }
        }
      case _ => None
    }

  private def stripAlias(e: Expression): Expression = e match {
    case Alias(c, _) => c
    case other => other
  }

  /** Parse + qualify the stored definition under its DEFINING
    * catalog/namespace (same binding rule as persisted views). */
  private[catalog] def qualifiedDefinition(session: SparkSession,
      props: Map[String, String]): LogicalPlan = {
    val sql = props.getOrElse(QueryProp, throw new IllegalArgumentException(
      "not a materialized view (no graft.mv.query property)"))
    val cat0 = props.getOrElse(CatalogProp, session.sessionState
      .catalogManager.currentCatalog.name())
    val ns0 = props.get(NamespaceProp).toSeq.flatMap(_.split(" "))
    val parsed = session.sessionState.sqlParser.parsePlan(sql)
    GraftViewSql.qualifyRelations(session, parsed, ps =>
      if (ps.length == 1) cat0 +: (ns0 :+ ps.head) else cat0 +: ps)
  }

  private[catalog] def run(session: SparkSession, plan: LogicalPlan) =
    org.apache.spark.sql.graftbridge.ColumnBridge.ofRows(session, plan)

  /** The REFRESH entry point, shared by the `REFRESH MATERIALIZED VIEW`
    * statement and `CALL graft.system.refresh_mv`. Returns the path
    * taken: "noop" (watermark already at the base head), "incremental"
    * (signed changefeed delta) or "full" (definition re-run).
    *
    * ONE head read anchors the whole refresh: the state it reads, the
    * watermark it trusts, and the CAS it publishes under — a CONCURRENT
    * refresh (or any other MV commit) aborts loudly on the conditional
    * commit instead of merging an already-applied delta a second time. */
  private[graft] def refresh(session: SparkSession, cat: GraftCatalog,
                             ns: String, name: String,
                             label: String): String = {
    require(cat.tableExists(ns, name), s"no such materialized view $label")
    val mvSnap = cat.latest(ns, name).getOrElse(throw new IllegalStateException(
      s"$label has no committed version"))
    val props = mvSnap.properties
    require(props.contains(QueryProp),
      s"$label is a plain table, not a materialized view")

    /** `probeAvgArgs`: re-check the avg NULL-free invariant over the
      * base AT THE SAME pinned head this rebuild reads (the CREATE-time
      * probe) and DOWNGRADE the mode when it no longer holds — the
      * rebuild paths that retain incremental mode must pass it whenever
      * the view maintains an avg, because the rows this rebuild absorbs
      * sink below the new watermark where no per-delta probe will ever
      * see them again (an unseen NULL would silently corrupt every later
      * sum-space reconstruction: avg skips it, the count(*) weight
      * cannot). */
    def fullRebuild(extraProps: Map[String, String] = Map.empty,
                    probeAvgArgs: Seq[String] = Nil): String = {
      val (wm, plan) = props.get(BaseProp) match {
        case Some(b) =>
          val Array(bns, bt) = b.split(" ")
          val headSnap = cat.latest(bns, bt)
          val head = headSnap.map(_.seq).getOrElse(-1L)
          val nullSeen = probeAvgArgs.nonEmpty && headSnap.exists(hs =>
            !avgInvariantHolds(cat)(bns, bt, hs, probeAvgArgs))
          // pin the lazy rebuild read to the version the new watermark
          // names (same race as CREATE; the probe reads the SAME pinned
          // snapshot, so no NULL-bearing commit can slip between them)
          ((if (nullSeen) Map(ModeProp -> "full")
            else Map.empty[String, String]) +
            (BaseSeqProp -> head.toString),
            pinBaseVersion(qualifiedDefinition(session, props), head))
        case None =>
          (Map.empty[String, String], qualifiedDefinition(session, props))
      }
      cat.commitReplace(ns, name,
        GraftMaterializedView.run(session, plan), sourceRegion = "mv",
        expectedParentSeq = Some(mvSnap.seq),
        propsSet = wm ++ extraProps): Unit
      "full"
    }

    if (props.get(ModeProp).contains("incremental")) {
      val Array(bns, bt) = props(BaseProp).split(" ")
      val fromSeq = props(BaseSeqProp).toLong
      val headSeq = cat.latest(bns, bt).map(_.seq).getOrElse(-1L)
      if (headSeq == fromSeq) return "noop" // fresh — nothing to do
      // re-derive the signed plan from the STORED definition. A view
      // pinned incremental by an EARLIER (laxer) shape detector must
      // stay serviceable: rebuild it and DOWNGRADE the recorded mode so
      // later refreshes stop re-deriving — never a permanent refusal
      // whose only exit is DROP + recreate
      val parsed = session.sessionState.sqlParser.parsePlan(props(QueryProp))
      val shape = incrementalShape(parsed) match {
        case Some(s) => s
        case None => return fullRebuild(Map(ModeProp -> "full"))
      }
      // expired/unreadable window: the lost delta may have carried a
      // NULL avg argument that now sits in the base below the new
      // watermark — fullRebuild's probe re-checks the invariant (or
      // downgrades) instead of blindly retaining incremental mode
      val changes0 =
        try cat.changesBetween(bns, bt, fromSeq, headSeq)
        catch { case _: Exception =>
          return fullRebuild(probeAvgArgs = shape.avgArgCols) }
      val needDelProbe =
        shape.minPositions.nonEmpty || shape.maxPositions.nonEmpty
      val needNullProbe = shape.avgPositions.nonEmpty
      // the state the merge reads is the SNAPSHOT the CAS anchors on,
      // never "latest at execution time"
      val state = cat.readSnapshotPublic(ns, name, mvSnap)
      val schema = state.schema
      // SCHEMA-ONLY downgrades run before anything materializes: avg
      // reconstruction (state avg × count ↔ sum) is sound only over
      // DoubleType results with the argument column visible in the feed
      if (needNullProbe) {
        val typesOk = shape.avgPositions.forall(i =>
          schema.fields(i).dataType ==
            org.apache.spark.sql.types.DoubleType)
        if (!typesOk || !shape.avgArgCols.forall(changes0.columns.contains))
          return fullRebuild(Map(ModeProp -> "full"))
      }
      // probes + the delta aggregation would each re-execute the
      // changefeed plan — checkpoint ONCE when any probe is needed so
      // the O(delta) scan runs once per refresh (no-probe shapes keep
      // the single lazy use)
      val changes = if (needDelProbe || needNullProbe)
        changes0.localCheckpoint() else changes0
      // ONE pass answers both probes. ORDER MATTERS: the avg NULL
      // downgrade must win over the min/max one-off rebuild — a window
      // carrying BOTH a delete and a NULL avg argument leaves the NULL
      // in the base below the new watermark, so keeping mode=incremental
      // (as the plain rebuild does) would silently corrupt every later
      // avg reconstruction.
      var hybridDelete = false
      if (needDelProbe || needNullProbe) {
        val nullCond =
          if (needNullProbe)
            shape.avgArgCols.map(col(_).isNull).reduce(_ || _)
          else lit(false)
        // coalesce: an EMPTY window (props-only base commits) must
        // probe clean, not NPE on a null max
        val probe = changes.agg(
          org.apache.spark.sql.functions.coalesce(
            org.apache.spark.sql.functions.max(
              when(nullCond, 1).otherwise(0)), lit(0)).as("nulls"),
          org.apache.spark.sql.functions.coalesce(
            org.apache.spark.sql.functions.max(
              when(col("_change_type") === "delete", 1).otherwise(0)),
            lit(0)).as("dels"))
          .head()
        if (needNullProbe && probe.getInt(0) == 1)
          return fullRebuild(Map(ModeProp -> "full"))
        // min/max merge monotonically — sound for INSERT-ONLY deltas
        // only (an erased row may have held the extremum). A delete-
        // bearing delta takes the GROUP-SCOPED HYBRID below (round-14):
        // sum/count/avg columns still merge by signed delta for every
        // group, and only the groups the delta TOUCHED re-derive their
        // min/max (all columns, in fact) from the pinned base — the
        // common delete touches a handful of groups, so the refresh
        // stays O(delta + changed groups' base rows), never a whole-
        // view rebuild.
        if (needDelProbe && probe.getInt(1) == 1)
          hybridDelete = true
      }
      val deltaView = s"__mv_delta_${java.util.UUID.randomUUID().toString.take(8)}"
      changes.withColumn("_sign",
          when(col("_change_type") === "delete", lit(-1L)).otherwise(lit(1L)))
        .createOrReplaceTempView(deltaView)
      try {
        val delta = GraftMaterializedView.run(session,
          shape.signedPlanOver(deltaView))
        val aggIdx = shape.aggPositions.toSet
        val keyCols = schema.fieldNames.zipWithIndex
          .collect { case (n, i) if !aggIdx(i) => n }.toSeq
        val cntName = schema.fieldNames(shape.countPositions.head)
        val avgNames = shape.avgPositions.map(schema.fieldNames)
        // avg merges in SUM space: state avg -> count(*)-weighted sum
        // before the union (the delta already carries its signed sum)
        val stateW = avgNames.foldLeft(state)((df, n) =>
          df.withColumn(n, col(n) * col(cntName)))
        // one group-key aggregation of state ∪ delta; aggregate columns
        // re-cast to the view's recorded types (sum-of-sum widening must
        // not drift the schema refresh over refresh)
        val aggCols = shape.aggPositions.map { i =>
          val n = schema.fieldNames(i)
          val merged =
            if (shape.minPositions.contains(i))
              org.apache.spark.sql.functions.min(col(n))
            else if (shape.maxPositions.contains(i))
              org.apache.spark.sql.functions.max(col(n))
            else sum(col(n))
          merged.cast(schema.fields(i).dataType).as(n)
        }
        val merged0 = stateW.unionByName(delta.select(schema.fieldNames
            .map(col).toSeq: _*))
          .groupBy(keyCols.map(col): _*)
          .agg(aggCols.head, aggCols.tail: _*)
          .filter(col(cntName) > 0)
        // ... and back to avg space after the merge
        val merged = avgNames.foldLeft(merged0)((df, n) =>
            df.withColumn(n, (col(n) / col(cntName)).cast(
              org.apache.spark.sql.types.DoubleType)))
          .select(schema.fieldNames.map(col).toSeq: _*)
        if (!hybridDelete) {
          cat.commitReplace(ns, name, merged, sourceRegion = "mv",
            expectedParentSeq = Some(mvSnap.seq),
            propsSet = Map(BaseSeqProp -> headSeq.toString)): Unit
          "incremental"
        } else hybridRefresh(session, cat, ns, name,
          // the recompute resolves under the MV's DEFINING catalog/
          // namespace (qualifiedDefinition), never the refreshing
          // session's current context — an unqualified base name would
          // otherwise resolve against whatever catalog the worker
          // session happens to sit in (AnalysisException at best,
          // recomputing from a same-named foreign table at worst)
          qualifiedDefinition(session, props), merged,
          delta, schema, keyCols, mvSnap, headSeq) match {
          case Some(path) => path
          // more changed groups than the cap — the recompute would
          // approach a full scan anyway; one-off rebuild, mode retained
          // (the avg invariant re-probed at the pinned head)
          case None => fullRebuild(probeAvgArgs = shape.avgArgCols)
        }
      } finally session.catalog.dropTempView(deltaView): Unit
    } else fullRebuild()
  }

  /** The avg NULL-free-argument invariant over ONE pinned base
    * snapshot: every avg argument column present and carrying no NULLs
    * (avg skips NULLs, the count(*)-weighted sum reconstruction
    * cannot). ONE spelling shared by the CREATE-time probe and the
    * mode-retaining rebuild probes — two copies would silently diverge
    * into different downgrade behavior for the same base state. */
  private[catalog] def avgInvariantHolds(cat: GraftCatalog)(
      bns: String, bt: String, snap: cat.Snapshot,
      argCols: Seq[String]): Boolean = {
    val base = cat.readSnapshotPublic(bns, bt, snap)
    argCols.forall(base.columns.contains) &&
      base.filter(argCols.map(col(_).isNull).reduce(_ || _)).isEmpty
  }

  /** Changed-group cap for the hybrid delete refresh: past this many
    * touched groups the per-group recompute approaches the cost of the
    * one-off full rebuild it exists to avoid, so the caller falls back. */
  private[catalog] val HybridKeyCap = 1024

  /** Group-scoped hybrid refresh for delete-bearing windows on views
    * with min/max legs (round-14): `merged` (the signed-delta merge) is
    * already correct for every sum-mergeable column and for the min/max
    * of groups the delta never touched (their monotone merge saw no
    * delta rows); only the TOUCHED groups can have lost an extremum, so
    * those — and only those — re-derive from the defining query over
    * the base pinned at `headSeq`, filtered to the changed group keys
    * (a literal IN / null-safe key predicate, pushable to the scan when
    * the key is a raw clustered column). Returns Some("hybrid") on
    * commit, Some("incremental") when the delta touched no groups, None
    * when the changed-group count exceeds [[HybridKeyCap]]. */
  private def hybridRefresh(session: SparkSession, cat: GraftCatalog,
      ns: String, name: String, qualified: LogicalPlan,
      merged: org.apache.spark.sql.DataFrame,
      delta: org.apache.spark.sql.DataFrame,
      schema: org.apache.spark.sql.types.StructType, keyCols: Seq[String],
      mvSnap: GraftCatalog#Snapshot, headSeq: Long): Option[String] = {
    import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, In, Literal, Or, And => CAnd}
    val keyRows = delta.select(keyCols.map(col): _*).distinct()
      .limit(HybridKeyCap + 1).collect()
    if (keyRows.length > HybridKeyCap) return None
    def commit(df: org.apache.spark.sql.DataFrame, path: String) = {
      cat.commitReplace(ns, name, df, sourceRegion = "mv",
        expectedParentSeq = Some(mvSnap.seq),
        propsSet = Map(BaseSeqProp -> headSeq.toString)): Unit
      Some(path)
    }
    // a delete the defining query FILTERS OUT touches no group — the
    // plain merge is already the whole refresh
    if (keyRows.isEmpty) return commit(merged, "incremental")
    val agg = qualified.asInstanceOf[Aggregate]
    // group expr -> the view key column that selects it (every grouping
    // expression is selected — incrementalShape refused otherwise)
    val exprToCol: Seq[(Expression, String)] = agg.groupingExpressions.map { g =>
      val i = agg.aggregateExpressions.indexWhere(e =>
        stripAlias(e).sql == g.sql)
      g -> schema.fieldNames(i)
    }
    def litOf(colName: String, r: Row): Expression =
      Literal.create(r.get(r.fieldIndex(colName)),
        schema(colName).dataType)
    val singleKey = exprToCol.size == 1
    val anyNullKey = keyRows.exists(r => keyCols.exists(c =>
      r.isNullAt(r.fieldIndex(c))))
    // single non-null key -> IN(list) (translates to sources.In — the
    // shape manifest stats / partition pruning understands); otherwise
    // null-safe per-tuple conjunctions
    val cond: Expression =
      if (singleKey && !anyNullKey)
        In(exprToCol.head._1,
          keyRows.toSeq.map(litOf(exprToCol.head._2, _)))
      else keyRows.toSeq.map { r =>
        exprToCol.map { case (g, n) =>
          EqualNullSafe(g, litOf(n, r)): Expression
        }.reduce(CAnd(_, _))
      }.reduce(Or(_, _))
    val recomputed = run(session, pinBaseVersion(
        agg.copy(child = Filter(cond, agg.child)), headSeq))
      .select(schema.fieldNames.map(col).toSeq: _*)
    // nullable forced: a NULL group key is a legal group, whatever the
    // view schema recorded for the column
    val changedDf = session.createDataFrame(
      java.util.Arrays.asList(keyRows: _*),
      org.apache.spark.sql.types.StructType(
        keyCols.map(c => schema(c).copy(nullable = true)).toSeq))
    val keep = merged.join(
      org.apache.spark.sql.functions.broadcast(changedDf),
      keyCols.map(c => merged(c) <=> changedDf(c)).reduce(_ && _),
      "left_anti")
    commit(keep.select(schema.fieldNames.map(col).toSeq: _*)
      .unionByName(recomputed), "hybrid")
  }

  /** Pin every relation of an incremental MV's (single-relation) plan
    * to `VERSION AS OF seq` — the defining query is LAZY and otherwise
    * executes inside the commit, so a base commit racing the refresh
    * would make the state NEWER than the recorded watermark and the
    * next delta would double-apply. seq < 0 (a base with NO committed
    * version) has no version to pin, but the race is the same — a base
    * commit landing between the head read and the lazy execution would
    * make the state newer than the -1 watermark — so the plan is pinned
    * to EMPTY (LIMIT 0), exactly what "state reflects version -1"
    * means; the first refresh picks those rows up as the -1→head
    * delta. */
  private[graft] def pinBaseVersion(plan: LogicalPlan, seq: Long): LogicalPlan =
    if (seq < 0) Limit(org.apache.spark.sql.catalyst.expressions
      .Literal(0, org.apache.spark.sql.types.IntegerType), plan)
    else plan.transformUp {
      case r: UnresolvedRelation =>
        org.apache.spark.sql.catalyst.analysis.RelationTimeTravel(
          r, None, Some(seq.toString))
    }
}

private[catalog] case class GraftCreateMvCommand(parts: Seq[String],
    ifNotExists: Boolean, queryText: String) extends LeafRunnableCommand {
  import GraftMaterializedView._

  override def run(session: SparkSession): Seq[Row] = {
    val (g, ident) = GraftViewSql.viewTarget(session, parts).get
    val ns = ident.namespace()(0); val name = ident.name()
    if (g.cat.tableExists(ns, name) || g.viewExists(ident)) {
      if (ifNotExists) return Seq.empty
      throw new IllegalArgumentException(
        s"materialized view target ${parts.mkString(".")} already exists")
    }
    val parsed = session.sessionState.sqlParser.parsePlan(queryText)
    GraftViewSql.assertNoTempRefs(session, parsed,
      s"CREATE MATERIALIZED VIEW ${parts.mkString(".")}")
    val cm = session.sessionState.catalogManager
    val qualified = GraftViewSql.qualifyRelations(session, parsed, ps =>
      if (ps.length == 1)
        cm.currentCatalog.name() +: (cm.currentNamespace.toSeq :+ ps.head)
      else cm.currentCatalog.name() +: ps)

    // maintenance mode decided (and pinned) at CREATE: incremental when
    // the shape qualifies AND the base is a graft table of THIS catalog
    val shape = incrementalShape(parsed).filter { s =>
      GraftViewSql.viewTarget(session, s.baseParts).exists { case (bg, bid) =>
        bg.eq(g) && bg.cat.tableExists(bid.namespace()(0), bid.name())
      }
    }
    val (baseProps, df) = shape match {
      case Some(s) =>
        val (_, bid) = GraftViewSql.viewTarget(session, s.baseParts).get
        val (bns, bt) = (bid.namespace()(0), bid.name())
        // ONE head read anchors everything: the pinned defining read,
        // the recorded watermark, AND the avg NULL probe below — a
        // probe at "latest" with the pin read separately would let a
        // NULL-bearing commit slip between the two and corrupt every
        // later avg reconstruction
        val headSnap = g.cat.latest(bns, bt)
        val bSeq = headSnap.map(_.seq).getOrElse(-1L)
        // the query is lazy (it executes inside the commit below) —
        // pin it to THIS version or a racing base commit would make the
        // state newer than the watermark and double-apply the next delta
        val df0 = GraftMaterializedView.run(session,
          pinBaseVersion(qualified, bSeq))
        // avg reconstruction is double-space only (avg(decimal) would
        // need exact decimal sums the state does not carry) ...
        val avgTypesOk = s.avgPositions.forall(i =>
          df0.schema.fields(i).dataType ==
            org.apache.spark.sql.types.DoubleType)
        // ... and NULL-free-argument only (avg skips NULLs, the
        // count(*) weight cannot): one O(base) probe over the SAME
        // pinned version, next to the O(base) materialize CREATE
        // already pays. A base with no committed version is vacuously
        // NULL-free (state pins to LIMIT 0; refresh deltas re-probe).
        val avgNullFree = s.avgArgCols.isEmpty || headSnap.forall(hs =>
          avgInvariantHolds(g.cat)(bns, bt, hs, s.avgArgCols))
        if (!avgTypesOk || !avgNullFree) (Map(ModeProp -> "full"), df0)
        else (Map(ModeProp -> "incremental",
          BaseProp -> s"${bid.namespace()(0)} ${bid.name()}",
          BaseSeqProp -> bSeq.toString,
          AggColsProp -> s.aggPositions.mkString(","),
          CountColProp -> s.countPositions.head.toString),
          df0)
      case None =>
        (Map(ModeProp -> "full"),
          GraftMaterializedView.run(session, qualified))
    }
    val props = baseProps ++ Map(
      QueryProp -> queryText,
      CatalogProp -> cm.currentCatalog.name(),
      NamespaceProp -> cm.currentNamespace.mkString(" "))
    g.cat.createTable(ns, name)
    try g.cat.commitReplace(ns, name, df, sourceRegion = "mv",
      propsSet = props): Unit
    catch { case e: Throwable =>
      try g.cat.dropTable(ns, name) catch { case c: Throwable =>
        e.addSuppressed(c) }
      throw e
    }
    Seq.empty
  }
}

private[catalog] case class GraftRefreshMvCommand(parts: Seq[String])
  extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val (g, ident) = GraftViewSql.viewTarget(session, parts).get
    GraftMaterializedView.refresh(session, g.cat,
      ident.namespace()(0), ident.name(), parts.mkString(".")): Unit
    Seq.empty
  }
}

private[catalog] case class GraftDropMvCommand(parts: Seq[String],
    ifExists: Boolean) extends LeafRunnableCommand {
  import GraftMaterializedView._
  override def run(session: SparkSession): Seq[Row] = {
    val (g, ident) = GraftViewSql.viewTarget(session, parts).get
    val ns = ident.namespace()(0); val name = ident.name()
    if (!g.cat.tableExists(ns, name)) {
      if (ifExists) return Seq.empty
      throw new IllegalArgumentException(
        s"no such materialized view ${parts.mkString(".")}")
    }
    require(g.cat.tableProperties(ns, name).contains(QueryProp),
      s"${parts.mkString(".")} is a plain table — use DROP TABLE")
    g.cat.dropTable(ns, name)
    Seq.empty
  }
}
