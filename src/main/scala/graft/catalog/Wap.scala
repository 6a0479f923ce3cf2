package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}

/** Write-Audit-Publish: the staging pattern for untrusted ingest
  * (Iceberg's WAP / Netflix's audit pattern, public technique). A batch
  * is committed to an isolated BRANCH, the would-be table state is
  * audited there with declarative expectations, and only a fully clean
  * audit fast-forwards main — main never serves a row that failed a
  * check, and a failed batch stays parked on its branch for forensics
  * instead of vanishing.
  *
  * Composition of proven parts: branch CAS commits (isolation),
  * Profiling.expectations (one-pass rule evaluation over one scan),
  * fastForwardMerge (atomic publish, conflict-checked against
  * concurrent main movement). The audit reads the BRANCH state — table
  * + new batch — so cross-batch invariants (key uniqueness against
  * already-published data) are checked against exactly the state that
  * would go live.
  *
  * Scale: the only corpus-sized work is the audit scan (rules fold into
  * one aggregate); branch commit and merge are metadata-only beyond
  * writing the batch itself.
  */
object Wap {

  /** Outcome of a WAP attempt: published snapshot, or the parked branch
    * + per-rule violation report. */
  sealed trait Result
  final case class Published(snapshot: GraftCatalog#Snapshot) extends Result
  final case class Rejected(branch: String, report: Seq[(String, Long, Long)])
      extends Result

  /** Stage `batch` on `branch`, audit the branch state, publish on a
    * clean report. `rowRules` are row-local predicates (violation =
    * false OR null — fail closed); `uniqueCols`, when set, additionally
    * requires the branch state to be unique on those columns (the
    * cross-batch dup check). On rejection the branch is KEPT. */
  def writeAuditPublish(cat: GraftCatalog, ns: String, table: String,
                        batch: DataFrame, rowRules: Seq[(String, Column)],
                        uniqueCols: Option[Seq[String]] = None,
                        branch: String = s"wap-${java.util.UUID.randomUUID()}")
      : Result = {
    // validate BEFORE any state is created — a no-rules call must not
    // leak a staged branch per retry
    require(rowRules.nonEmpty || uniqueCols.nonEmpty,
      "writeAuditPublish needs at least one rule")
    cat.createBranch(ns, table, branch)
    // a failed STAGE write must not leave a dangling empty branch; a
    // failed AUDIT keeps the branch by design (that's the forensics)
    try cat.commitAppendToBranch(ns, table, branch, batch)
    catch { case e: Throwable =>
      try cat.dropBranch(ns, table, branch) catch { case _: Throwable => () }
      throw e
    }
    val staged = cat.readBranch(ns, table, branch)
    val audits =
      rowRules.headOption.map(_ =>
        graft.pipeline.Profiling.expectations(staged, rowRules)).toSeq ++
      uniqueCols.map(cols =>
        graft.pipeline.Profiling.uniqueExpectation(staged, cols,
          s"unique_${cols.mkString("_")}"))
    val report = audits.reduce(_ unionByName _)
      .collect()
      // defensive NULL->0: an all-NULL aggregate row (empty staged state)
      // must publish cleanly, not NPE after the branch was created
      .map(r => (r.getString(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L),
        Option(r.get(2)).map(_.asInstanceOf[Long]).getOrElse(0L)))
      .toSeq
    if (report.forall(_._2 == 0L)) {
      val snap = cat.fastForwardMerge(ns, table, branch)
      cat.dropBranch(ns, table, branch)
      Published(snap)
    } else Rejected(branch, report)
  }
}
