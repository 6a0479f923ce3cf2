package graft.catalog

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{NoSuchViewException, UnresolvedAttribute, UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedTableOrView, UnresolvedView, ViewAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, View, ViewCatalog, ViewChange, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{StructField, StructType}

/** Persistent-view SQL support for graft catalogs.
  *
  * Spark 4.1 ships the DSv2 [[ViewCatalog]] INTERFACE but wires no
  * analyzer rule to it — `ResolveSessionCatalog` unconditionally throws
  * MISSING_CATALOG_ABILITY.VIEWS for any view DDL addressed at a
  * non-session catalog, and relation resolution never consults
  * `loadView`. So, exactly like Iceberg's Spark runtime does for its
  * own view support, graft ships the wiring in its session extensions:
  *
  *  - a PARSER post-processor ([[GraftViewSqlParser]]) that rewrites
  *    freshly-parsed view DDL (CREATE/ALTER/DROP/SHOW VIEWS, ALTER ...
  *    RENAME, SHOW TBLPROPERTIES on a view) addressed at a graft
  *    catalog into runnable commands over the catalog's [[ViewCatalog]]
  *    implementation — everything else passes through untouched, so
  *    session-catalog views keep their stock behavior;
  *  - a RESOLUTION rule ([[GraftViewSubstitution]]) that expands a
  *    `SELECT ... FROM <graftCatalog>.<ns>.<view>` reference by parsing
  *    the stored SQL, re-qualifying its relation references under the
  *    view's DEFINING catalog + namespace (recorded at CREATE time),
  *    and re-applying the declared column aliases.
  *
  * Binding semantics: definitions re-resolve at READ time (Spark's
  * schema-evolution mode for views) — a view over an ALTERed table sees
  * the table's current shape; the schema recorded at CREATE serves
  * DESCRIBE, not enforcement. Temp-view references inside a persisted
  * view fail at read time (the qualified name does not exist) — the
  * same contract Spark enforces for its own persisted views, checked
  * lazily here. Cyclic view definitions fail loudly at the analyzer's
  * iteration limit. */
private[graft] object GraftViewSql {

  /** The [[GraftSparkCatalog]] registered under `catName`, if any. */
  def graftPlugin(session: SparkSession, catName: String): Option[GraftSparkCatalog] =
    if (!session.conf.getOption(s"spark.sql.catalog.$catName")
        .contains(classOf[GraftSparkCatalog].getName)) None
    else session.sessionState.catalogManager.catalog(catName) match {
      case g: GraftSparkCatalog => Some(g)
      case _ => None
    }

  /** Identifier parts addressed at a graft catalog, qualified against
    * the session's CURRENT catalog/namespace when under-specified —
    * `USE <graftcat>.<ns>` followed by `CREATE VIEW v` / `SELECT * FROM
    * v` must hit the graft view support exactly like the 3-part
    * spelling does (stock resolution applies the same completion). When
    * the current catalog is not a graft catalog, 1/2-part names resolve
    * to None and every stock path keeps its behavior. */
  def viewTarget(session: SparkSession, parts: Seq[String])
      : Option[(GraftSparkCatalog, Identifier)] = {
    val cm = session.sessionState.catalogManager
    val full = parts.length match {
      case 3 => parts
      case 2 => cm.currentCatalog.name() +: parts
      case 1 => (cm.currentCatalog.name() +: cm.currentNamespace.toSeq) :+
        parts.head
      case _ => return None
    }
    if (full.length != 3) None
    else graftPlugin(session, full.head)
      .map(g => (g, Identifier.of(Array(full(1)), full(2))))
  }

  /** Name normalization for CTE-scope matching: identifier resolution
    * is case-insensitive unless spark.sql.caseSensitive says otherwise
    * — a hardcoded lowercase under caseSensitive=true would let a CTE
    * named `x` wrongly capture a DISTINCT table `X`. */
  private def norm(session: SparkSession)(n: String): String =
    if (session.sessionState.conf.caseSensitiveAnalysis) n else n.toLowerCase

  /** Each WITH's names in scope for one of its CTE bodies: the
    * previously-defined CTEs always; the CTE's OWN name too when the
    * WITH is RECURSIVE (a self-reference must never qualify into a
    * catalog table of the same name). */
  private def cteScopes(w: UnresolvedWith, bound: Set[String],
                        nm: String => String): (Seq[Set[String]], Set[String]) = {
    var seen = bound
    val perBody = w.cteRelations.map { case (n, _, _) =>
      val s = if (w.allowRecursion) seen + nm(n) else seen
      seen += nm(n)
      s
    }
    (perBody, seen)
  }

  /** Rewrite every under-qualified relation reference in `plan` through
    * `full`, CTE-SCOPE-AWARE and descending into expression subqueries:
    * a name bound by an enclosing WITH stays untouched (each CTE body
    * sees the CTEs defined before it — plus itself under RECURSIVE; the
    * main child sees them all), while a same-named relation OUTSIDE
    * that scope still qualifies — scope-blind exclusion would leave it
    * resolving against the READER's context instead of the view's
    * defining one. */
  def qualifyRelations(session: SparkSession, plan: LogicalPlan,
                       full: Seq[String] => Seq[String]): LogicalPlan = {
    val nm = norm(session) _
    def go(p: LogicalPlan, bound: Set[String]): LogicalPlan = p match {
      case w: UnresolvedWith =>
        val (perBody, all) = cteScopes(w, bound, nm)
        val rels = w.cteRelations.zip(perBody).map { case ((n, rel, o), s) =>
          (n, go(rel, s).asInstanceOf[SubqueryAlias], o)
        }
        w.copy(child = go(w.child, all), cteRelations = rels)
      case r @ UnresolvedRelation(ps, _, false)
          if ps.length < 3 && !(ps.length == 1 && bound(nm(ps.head))) =>
        r.copy(multipartIdentifier = full(ps))
      case other =>
        other.mapChildren(go(_, bound)).transformExpressionsUp {
          case s: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
            s.withNewPlan(go(s.plan, bound))
        }
    }
    go(plan, Set.empty)
  }

  /** Refuse persisted definitions over TEMPORARY objects — stock
    * Spark's rule for its own persisted views (its
    * verifyTemporaryObjectsNotExists), enforced here at CREATE/ALTER
    * time: a temp VIEW reference either vanishes at read time or,
    * worse, silently REBINDS to a same-named catalog table, and a temp
    * FUNCTION vanishes with the session. CTE-bound names are excluded
    * scope-aware (recursion included). */
  def assertNoTempRefs(session: SparkSession, plan: LogicalPlan,
                       what: String): Unit = {
    val nm = norm(session) _
    val cata = session.sessionState.catalog
    def checkExpr(e: org.apache.spark.sql.catalyst.expressions.Expression,
                  bound: Set[String]): Unit = e.foreach {
      case s: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
        go(s.plan, bound)
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if f.nameParts.length == 1 &&
            cata.isTemporaryFunction(
              org.apache.spark.sql.catalyst.FunctionIdentifier(f.nameParts.head)) =>
        throw new IllegalArgumentException(
          s"$what cannot reference the temporary function " +
            s"${f.nameParts.head} — persisted definitions must reference " +
            "catalog objects")
      case _ => ()
    }
    def go(p: LogicalPlan, bound: Set[String]): Unit = p match {
      case w: UnresolvedWith =>
        val (perBody, all) = cteScopes(w, bound, nm)
        w.cteRelations.zip(perBody).foreach { case ((_, rel, _), s) => go(rel, s) }
        go(w.child, all)
      case r: UnresolvedRelation =>
        val ps = r.multipartIdentifier
        val isTemp = ps.length match {
          case 1 => !bound(nm(ps.head)) && cata.isTempView(ps)
          case 2 => cata.isTempView(ps) // incl. global_temp.<name>
          case _ => false
        }
        require(!isTemp,
          s"$what cannot reference the temporary view ${ps.mkString(".")} — " +
            "persisted definitions must reference catalog objects")
      case other =>
        other.children.foreach(go(_, bound))
        other.expressions.foreach(checkExpr(_, bound))
    }
    go(plan, Set.empty)
  }
}

/** Parser wrapper: delegates everything, then rewrites parsed view DDL
  * addressed at graft catalogs (see [[GraftViewSql]]). */
class GraftViewSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    // partition-evolution DDL has no stock grammar (Iceberg ships it as
    // an ANTLR extension) — intercept the TEXT for graft targets before
    // the delegate parser rejects the syntax
    GraftPartitionDdl.parse(sqlText, SparkSession.active,
        delegate.parseMultipartIdentifier)
      .orElse(GraftMaterializedView.parse(sqlText, SparkSession.active,
        delegate.parseMultipartIdentifier))
      .getOrElse(rewrite(delegate.parsePlan(sqlText)))

  private def rewrite(plan: LogicalPlan): LogicalPlan = {
    val session = SparkSession.active
    def target(parts: Seq[String]) = GraftViewSql.viewTarget(session, parts)
    plan match {
      case cv: CreateView => cv.child match {
        case UnresolvedIdentifier(parts, _) if target(parts).isDefined =>
          require(cv.collation.isEmpty,
            "DEFAULT COLLATION on graft views is not supported")
          GraftCreateViewCommand(parts, cv.userSpecifiedColumns, cv.comment,
            cv.properties, cv.originalText, cv.query, cv.allowExisting,
            cv.replace)
        case _ => cv
      }
      case av: AlterViewAs => av.child match {
        case UnresolvedView(parts, _, _, _) if target(parts).isDefined =>
          GraftAlterViewAsCommand(parts, av.originalText, av.query)
        case _ => av
      }
      case dv: DropView => dv.child match {
        case UnresolvedIdentifier(parts, _) if target(parts).isDefined =>
          GraftDropViewCommand(parts, dv.ifExists)
        case _ => dv
      }
      case sv: ShowViews => sv.child match {
        case UnresolvedNamespace(parts, _)
            if parts.length == 2 &&
              GraftViewSql.graftPlugin(session, parts.head).isDefined =>
          GraftShowViewsCommand(parts, sv.pattern, sv.output)
        case _ => sv
      }
      case sp: SetViewProperties => sp.child match {
        case UnresolvedView(parts, _, _, _) if target(parts).isDefined =>
          GraftAlterViewPropsCommand(parts, sp.properties, Seq.empty)
        case _ => sp
      }
      case up: UnsetViewProperties => up.child match {
        case UnresolvedView(parts, _, _, _) if target(parts).isDefined =>
          GraftAlterViewPropsCommand(parts, Map.empty, up.propertyKeys)
        case _ => up
      }
      // ALTER VIEW ... RENAME TO parses as RenameTable(isView = true)
      case rt: RenameTable if rt.isView => rt.child match {
        case UnresolvedTableOrView(parts, _, _) if target(parts).isDefined =>
          GraftRenameViewCommand(parts, rt.newName)
        case _ => rt
      }
      // SHOW TBLPROPERTIES names a table OR a view — reroute only when
      // the identifier IS an existing graft view (tables keep their path)
      case st: ShowTableProperties => st.child match {
        case UnresolvedTableOrView(parts, _, _) =>
          target(parts) match {
            case Some((g, ident)) if g.viewExists(ident) =>
              GraftShowViewPropsCommand(parts, st.propertyKey, st.output)
            case _ => st
          }
        case _ => st
      }
      // SHOW CREATE TABLE is also the spelling for views (stock Spark
      // renders CREATE VIEW DDL for session-catalog views through it) —
      // reroute only when the identifier IS an existing graft view
      case sc: ShowCreateTable => sc.child match {
        case UnresolvedTableOrView(parts, _, _) =>
          target(parts) match {
            case Some((g, ident)) if g.viewExists(ident) =>
              GraftShowCreateViewCommand(parts, sc.output)
            case _ => sc
          }
        case _ => sc
      }
      case other => other
    }
  }

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
}

/** Read-side substitution: `FROM <graftCatalog>.<ns>.<view>` expands to
  * the stored definition (see [[GraftViewSql]] scaladoc for binding
  * semantics). Runs as an extended resolution rule — relations the
  * stock resolver already bound are never touched. */
case class GraftViewSubstitution(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan resolveOperatorsUp {
    // temp views KEEP their stock precedence: viewTarget completes 1/2-
    // part names through the current catalog/namespace (so `USE g.ns;
    // SELECT * FROM v` reads the graft view), but a same-named session
    // temp view must still win — this rule shares the Resolution batch
    // with the stock temp-view binding and could otherwise fire first
    case u @ UnresolvedRelation(parts, _, false)
        if !session.sessionState.catalog.isTempView(parts) =>
      GraftViewSql.viewTarget(session, parts) match {
        case Some((g, ident)) if g.viewExists(ident) =>
          expand(g.loadView(ident))
        case _ => u
      }
  }

  private def expand(view: View): LogicalPlan = {
    val parsed = session.sessionState.sqlParser.parsePlan(view.query)
    val qualified0 = GraftViewSql.qualifyRelations(session, parsed, ps =>
      if (ps.length == 1) view.currentCatalog +:
        (view.currentNamespace.toSeq :+ ps.head)
      else view.currentCatalog +: ps)
    // this rule runs in the RESOLUTION batch — the Substitution batch
    // (where CTESubstitution lives) already ran and will not run again,
    // so a WITH inside the freshly-injected body would survive to the
    // planner unsubstituted (or, worse, its references would resolve
    // against same-named temp views). Substitute here.
    val qualified =
      org.apache.spark.sql.catalyst.analysis.CTESubstitution(qualified0)
    val aliased =
      if (view.columnAliases.isEmpty ||
          view.columnAliases.sameElements(view.queryColumnNames)) qualified
      else Project(view.queryColumnNames.zip(view.columnAliases).toSeq
        .map { case (q, a) => Alias(UnresolvedAttribute.quoted(q), a)() },
        qualified)
    SubqueryAlias(view.name(), aliased)
  }
}

private[catalog] case class GraftCreateViewCommand(
    parts: Seq[String],
    userCols: Seq[(String, Option[String])],
    comment: Option[String],
    props: Map[String, String],
    originalText: Option[String],
    viewQuery: LogicalPlan,
    allowExisting: Boolean,
    replace: Boolean) extends LeafRunnableCommand {

  // the query is NOT a child (children of commands re-analyze per rule
  // batch); it is analyzed once in run() under the session's CURRENT
  // catalog/namespace — the context the stored definition records
  override def innerChildren: Seq[org.apache.spark.sql.catalyst.plans.QueryPlan[_]] =
    Seq(viewQuery)

  override def run(session: SparkSession): Seq[Row] = {
    val (g, ident) = GraftViewSql.viewTarget(session, parts).get
    if (g.viewExists(ident)) {
      if (allowExisting && !replace) return Seq.empty // IF NOT EXISTS
      if (!replace) throw new ViewAlreadyExistsException(ident)
    }
    val sqlText = originalText.getOrElse(throw new IllegalArgumentException(
      s"CREATE VIEW ${parts.mkString(".")}: no query text recorded"))
    GraftViewSql.assertNoTempRefs(session, viewQuery,
      s"CREATE VIEW ${parts.mkString(".")}")
    val analyzed = session.sessionState.executePlan(viewQuery).analyzed
    val qNames = analyzed.output.map(_.name)
    if (userCols.nonEmpty) require(userCols.length == qNames.length,
      s"CREATE VIEW ${parts.mkString(".")}: ${userCols.length} declared " +
        s"column(s) but the query produces ${qNames.length}")
    val aliases = if (userCols.nonEmpty) userCols.map(_._1) else qNames
    val comments: Seq[String] =
      if (userCols.nonEmpty) userCols.map(_._2.orNull) else qNames.map(_ => null)
    val schema = StructType(analyzed.output.zip(aliases).map { case (a0, nm) =>
      StructField(nm, a0.dataType, a0.nullable) })
    val cm = session.sessionState.catalogManager
    val allProps = props ++ comment.map(ViewCatalog.PROP_COMMENT -> _)
    val info = new ViewInfo(ident, sqlText, cm.currentCatalog.name(),
      cm.currentNamespace, schema, qNames.toArray, aliases.toArray,
      comments.toArray, allProps.asJava)
    if (replace) g.replaceView(info, true) else g.createView(info): Unit
    Seq.empty
  }
}

private[catalog] case class GraftAlterViewAsCommand(
    parts: Seq[String],
    originalText: String,
    viewQuery: LogicalPlan) extends LeafRunnableCommand {

  override def innerChildren: Seq[org.apache.spark.sql.catalyst.plans.QueryPlan[_]] =
    Seq(viewQuery)

  override def run(session: SparkSession): Seq[Row] = {
    val (g, ident) = GraftViewSql.viewTarget(session, parts).get
    val old = g.loadView(ident) // throws NoSuchViewException when absent
    GraftViewSql.assertNoTempRefs(session, viewQuery,
      s"ALTER VIEW ${parts.mkString(".")} AS")
    val analyzed = session.sessionState.executePlan(viewQuery).analyzed
    val qNames = analyzed.output.map(_.name)
    val schema = StructType(analyzed.output.map(a0 =>
      StructField(a0.name, a0.dataType, a0.nullable)))
    val cm = session.sessionState.catalogManager
    // ALTER ... AS replaces the QUERY; existing properties carry over
    val info = new ViewInfo(ident, originalText, cm.currentCatalog.name(),
      cm.currentNamespace, schema, qNames.toArray, qNames.toArray,
      qNames.map(_ => null: String).toArray, old.properties())
    g.replaceView(info, false): Unit
    Seq.empty
  }
}

private[catalog] case class GraftDropViewCommand(parts: Seq[String],
    ifExists: Boolean) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val (g, ident) = GraftViewSql.viewTarget(session, parts).get
    if (!g.dropView(ident) && !ifExists) throw new NoSuchViewException(ident)
    Seq.empty
  }
}

private[catalog] case class GraftRenameViewCommand(parts: Seq[String],
    newName: Seq[String]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val (g, ident) = GraftViewSql.viewTarget(session, parts).get
    val to = newName match {
      case Seq(n) => Identifier.of(ident.namespace(), n)
      case Seq(ns, n) => Identifier.of(Array(ns), n)
      case other => throw new IllegalArgumentException(
        s"rename target ${other.mkString(".")} must be [ns.]name")
    }
    g.renameView(ident, to)
    Seq.empty
  }
}

private[catalog] case class GraftAlterViewPropsCommand(parts: Seq[String],
    set: Map[String, String], unset: Seq[String]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val (g, ident) = GraftViewSql.viewTarget(session, parts).get
    val changes = set.toSeq.map { case (k, v) => ViewChange.setProperty(k, v) } ++
      unset.map(ViewChange.removeProperty)
    g.alterView(ident, changes: _*): Unit
    Seq.empty
  }
}

private[catalog] case class GraftShowViewsCommand(nsParts: Seq[String],
    pattern: Option[String], override val output: Seq[Attribute])
  extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val g = GraftViewSql.graftPlugin(session, nsParts.head).get
    g.listViews(nsParts(1))
      .filter(i => pattern.forall(p =>
        org.apache.spark.sql.catalyst.util.StringUtils
          .filterPattern(Seq(i.name()), p).nonEmpty))
      .map(i => Row(nsParts(1), i.name(), false)).toSeq
  }
}

/** Reconstructable DDL for a persisted view: declared columns (with
  * comments), view comment, user TBLPROPERTIES, and the stored query
  * text — running the emitted statement in the defining catalog/
  * namespace recreates the view. */
private[catalog] case class GraftShowCreateViewCommand(parts: Seq[String],
    override val output: Seq[Attribute]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val (g, ident) = GraftViewSql.viewTarget(session, parts).get
    val v = g.loadView(ident)
    def q(s: String) = "'" + s.replace("'", "''") + "'"
    val cols = v.columnAliases().zip(v.columnComments()).map {
      case (c, null) => s"  $c"
      case (c, cm) => s"  $c COMMENT ${q(cm)}"
    }.mkString("(\n", ",\n", ")")
    val props = v.properties().asScala.toMap
    val comment = props.get(ViewCatalog.PROP_COMMENT)
      .map(c => s"\nCOMMENT ${q(c)}").getOrElse("")
    val userProps = (props -- ViewCatalog.RESERVED_PROPERTIES.asScala)
      .toSeq.sortBy(_._1)
    val tbl =
      if (userProps.isEmpty) ""
      else userProps.map { case (k, v0) => s"${q(k)} = ${q(v0)}" }
        .mkString("\nTBLPROPERTIES (\n  ", ",\n  ", ")")
    // the name must spell the catalog the view LIVES in — NOT
    // v.currentCatalog(), which records the session's current catalog
    // at CREATE time (the defining context for 1-part references)
    val catName =
      if (parts.length == 3) parts.head
      else session.sessionState.catalogManager.currentCatalog.name()
    val fullName = (catName +: ident.namespace() :+ ident.name())
      .mkString(".")
    Seq(Row(s"CREATE VIEW $fullName $cols$comment$tbl AS\n${v.query}\n"))
  }
}

private[catalog] case class GraftShowViewPropsCommand(parts: Seq[String],
    propertyKey: Option[String], override val output: Seq[Attribute])
  extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val (g, ident) = GraftViewSql.viewTarget(session, parts).get
    val props = g.loadView(ident).properties().asScala
    propertyKey match {
      case Some(k) => Seq(Row(k, props.getOrElse(k,
        s"Table ${parts.mkString(".")} does not have property: $k")))
      case None => props.toSeq.sortBy(_._1).map { case (k, v) => Row(k, v) }
    }
  }
}
