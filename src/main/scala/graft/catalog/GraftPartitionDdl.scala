package graft.catalog

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/** Iceberg's native partition-evolution DDL over graft tables:
  *
  *   ALTER TABLE t ADD PARTITION FIELD <transform>
  *   ALTER TABLE t DROP PARTITION FIELD <transform>
  *   ALTER TABLE t REPLACE PARTITION FIELD <old> WITH <new>
  *
  * (transform := col | identity(col) | bucket(n, col) | truncate(n, col)
  *  | years/months/days/hours(col) — width/column in either order, both
  * spellings exist in the wild, same tolerance as PARTITIONED BY.)
  *
  * Stock Spark has no grammar for these (Iceberg ships them as an ANTLR
  * extension), so [[GraftViewSqlParser]] intercepts the statement TEXT
  * before delegation and resolves it here. The commands are sugar over
  * the existing validated spec-evolution commit (`ALTER ... SET
  * TBLPROPERTIES ('graft.partition-spec'= ...)`, GraftCatalog
  * .commitProperties): committed files keep their recorded layout, new
  * writes cluster by the new spec — exactly Iceberg's spec-evolution
  * model, and REPLACE is atomic by construction (drop + add publish as
  * ONE property commit). A non-graft target returns None and the stock
  * parser reports its own syntax error. */
private[graft] object GraftPartitionDdl {

  private val Add =
    """(?is)\s*ALTER\s+TABLE\s+([\w.`]+)\s+ADD\s+PARTITION\s+FIELD\s+(.+?)\s*;?\s*""".r
  private val Drop =
    """(?is)\s*ALTER\s+TABLE\s+([\w.`]+)\s+DROP\s+PARTITION\s+FIELD\s+(.+?)\s*;?\s*""".r
  private val Replace =
    ("""(?is)\s*ALTER\s+TABLE\s+([\w.`]+)\s+REPLACE\s+PARTITION\s+FIELD\s+""" +
      """(.+?)\s+WITH\s+(.+?)\s*;?\s*""").r

  /** Text-level intercept: Some(command) when the statement is partition
    * DDL addressed at a graft catalog; None lets the stock parser run
    * (and report its own error for the unsupported syntax). */
  def parse(sqlText: String, session: SparkSession,
            parseIdent: String => Seq[String]): Option[LogicalPlan] = {
    def target(raw: String): Option[Seq[String]] = {
      val parts = try parseIdent(raw) catch { case _: Exception => return None }
      GraftViewSql.viewTarget(session, parts).map(_ => parts)
    }
    sqlText match {
      case Replace(t, oldF, newF) => target(t).map(
        GraftAlterPartitionFieldCommand(_, drops = Seq(oldF), adds = Seq(newF)))
      case Add(t, f) => target(t).map(
        GraftAlterPartitionFieldCommand(_, drops = Seq.empty, adds = Seq(f)))
      case Drop(t, f) => target(t).map(
        GraftAlterPartitionFieldCommand(_, drops = Seq(f), adds = Seq.empty))
      case _ => None
    }
  }

  /** One transform spelling -> the catalog's canonical field (same
    * tolerance as the PARTITIONED BY connector path). */
  private[catalog] def parseFieldSpec(s0: String): GraftCatalog.PartitionField = {
    def unq(s: String) = s.trim.stripPrefix("`").stripSuffix("`")
    val s = s0.trim
    val Fn = """(?s)(\w+)\s*\(\s*(.*?)\s*\)""".r
    s match {
      case Fn(name, args) =>
        val as = args.split(",").map(unq).filter(_.nonEmpty).toSeq
        def colArg: String = as.find(a => !a.forall(_.isDigit)).getOrElse(
          throw new IllegalArgumentException(
            s"partition transform '$s' names no column"))
        def numArg(what: String): Int = as.find(_.forall(_.isDigit)).map(_.toInt)
          .getOrElse(throw new IllegalArgumentException(
            s"partition transform '$s' needs an integer $what"))
        name.toLowerCase match {
          case "identity" => GraftCatalog.PartitionField("identity", colArg)
          case "year" | "years" => GraftCatalog.PartitionField("year", colArg)
          case "month" | "months" => GraftCatalog.PartitionField("month", colArg)
          case "day" | "days" => GraftCatalog.PartitionField("day", colArg)
          case "hour" | "hours" => GraftCatalog.PartitionField("hour", colArg)
          case "bucket" =>
            GraftCatalog.PartitionField("bucket", colArg, numArg("bucket count"))
          case "truncate" =>
            GraftCatalog.PartitionField("truncate", colArg, numArg("width"))
          case other => throw new IllegalArgumentException(
            s"unsupported partition transform '$other' — supported: identity, " +
              "bucket(n, col), truncate(w, col), years/months/days/hours(col)")
        }
      case ident if ident.matches("[\\w`]+") =>
        GraftCatalog.PartitionField("identity", unq(ident))
      case other => throw new IllegalArgumentException(
        s"cannot parse partition transform '$other'")
    }
  }
}

/** Runs ADD/DROP/REPLACE PARTITION FIELD as ONE validated property
  * commit (REPLACE's drop+add are atomic — no window where the table
  * has neither field). */
private[catalog] case class GraftAlterPartitionFieldCommand(
    parts: Seq[String], drops: Seq[String], adds: Seq[String])
  extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    val (g, ident) = GraftViewSql.viewTarget(session, parts).get
    val name = parts.mkString(".")
    val ns = ident.namespace()(0); val t = ident.name()
    // ONE head read serves the spec this statement evolves AND anchors
    // the commit: the next spec is computed FROM the current one, so a
    // concurrent spec change must abort the statement (same rule as
    // compact's layout threading), never be silently overwritten by a
    // stale full-spec JSON
    val snap = g.cat.latest(ns, t).getOrElse(throw new IllegalStateException(
      s"$name has no committed version"))
    val props = snap.properties
    val schema = snap.schemaJson.map(org.apache.spark.sql.types.DataType
      .fromJson(_).asInstanceOf[org.apache.spark.sql.types.StructType])
    val cur = GraftCatalog.validatedPartitionSpec(name, props, schema)
    val cs = session.sessionState.conf.caseSensitiveAnalysis
    def sameCol(a: String, b: String) = if (cs) a == b else a.equalsIgnoreCase(b)
    def matches(f: GraftCatalog.PartitionField,
                d: GraftCatalog.PartitionField): Boolean =
      f.transform == d.transform && sameCol(f.source, d.source) && f.n == d.n

    val dropped = drops.map(GraftPartitionDdl.parseFieldSpec)
      .foldLeft(cur) { (spec, d) =>
        // a bare column drops its identity field; everything else exact
        val hit = spec.filter(matches(_, d))
        if (hit.isEmpty) throw new IllegalArgumentException(
          s"$name: DROP PARTITION FIELD ${d.transform}(${d.source}" +
            (if (d.n > 0) s", ${d.n}" else "") + ") matches no field of the " +
            s"current spec [${spec.map(f => s"${f.transform}(${f.source}" +
              (if (f.n > 0) s",${f.n}" else "") + ")").mkString(", ")}]")
        spec.filterNot(matches(_, d))
      }
    val next = adds.map(GraftPartitionDdl.parseFieldSpec)
      .foldLeft(dropped) { (spec, a) =>
        spec.find(f => sameCol(f.source, a.source)).foreach { f =>
          throw new IllegalArgumentException(
            s"$name: column ${a.source} is already a partition source " +
              s"(${f.transform}) — DROP or REPLACE it first")
        }
        spec :+ a
      }
    // route through the catalog's property commit (validation — types,
    // reserved prefixes — lives there; time travel reads each version's
    // own spec), CONDITIONAL on the head this statement derived from
    if (next.isEmpty)
      g.cat.commitProperties(ns, t, Map.empty,
        unset = Seq(GraftCatalog.PartitionSpecProp),
        expectedParentSeq = Some(snap.seq)): Unit
    else
      g.cat.commitProperties(ns, t,
        Map(GraftCatalog.PartitionSpecProp ->
          GraftCatalog.partitionSpecJson(next)),
        expectedParentSeq = Some(snap.seq)): Unit
    Seq.empty
  }
}
