package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CatalogQueries, ControlPlane, Pipeline, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are grouped by SURVEY §2 category; each group object declares
  * both the Spark DataFrame query and (where SQL-expressible) the DuckDB
  * oracle with identical column names and deterministic ordering.
  */
object SparkEntry {

  private def groups: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Relational.queries, Relational.oracles),
      (ControlPlane.queries, ControlPlane.oracles),
      (Pipeline.queries, Pipeline.oracles),
      (CatalogQueries.queries, CatalogQueries.oracles),
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("rel_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = groups.map(_._1)
    val dup = all.flatMap(_.keys).groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    require(dup.isEmpty, s"duplicate query names across groups (silent override): $dup")
    all.reduce(_ ++ _)
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    groups.iterator.flatMap(_._2).toMap
}
