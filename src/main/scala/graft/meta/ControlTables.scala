package graft.meta

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic control-plane tables derived from the driver testdata.
  *
  * The reference's universe is files, snapshots, sync events, regions and
  * registry rows (SURVEY §1.1). The driver gives us a TPC-H-ish star
  * schema, so we derive those control tables from it with pure, engine-
  * agnostic arithmetic (modulo bucketing + string concat) that DuckDB
  * reproduces verbatim — letting every control-plane operator be checked
  * against the oracle while the operator implementations stay generic
  * DataFrame transforms usable on real metadata at 100 TB.
  *
  * Conventions:
  *  - 5 "regions" = the region table (r_regionkey 0..4).
  *  - a data file  = one lineitem row; path embeds (orderkey, linenumber);
  *    size_bytes = extendedprice in cents (exact integer).
  *  - a commit    = one orders row; commit_seq = o_orderkey, ts = o_orderdate.
  *  - a sync event = one events row; status from props.k % 4.
  */
object ControlTables {

  /** File inventory: one file per lineitem row.
    * Columns: path, size_bytes, etag, region (r_name), shipped_at, commit_seq. */
  def fileInventory(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
    val r = Tables.region(s, d)
    l.join(broadcast(r), l("l_suppkey") % 5 === r("r_regionkey"))
      .select(
        // (orderkey, linenumber, partkey, suppkey) is the unique row key in
        // this synthetic lineitem — the path must be collision-free for the
        // set-algebra operators to behave like real file listings.
        concat(lit("s3://primary/"), col("l_orderkey").cast("string"), lit("/"),
               col("l_partkey").cast("string"), lit("-"),
               col("l_suppkey").cast("string"), lit("-"),
               col("l_linenumber").cast("string"), lit(".parquet")).as("path"),
        // round before the bigint cast: Spark casts double→long by
        // truncation while DuckDB rounds, so an explicit round() is the
        // only portable semantics.
        round(col("l_extendedprice") * 100).cast("bigint").as("size_bytes"),
        (col("l_orderkey") * 10 + col("l_linenumber")).cast("string").as("etag"),
        col("r_name").as("region"),
        col("l_shipdate").as("shipped_at"),
        col("l_orderkey").as("commit_seq"),
        col("l_linenumber"),
        col("l_discount"), col("l_tax"), col("l_returnflag"))
  }

  /** Sync events: one per events row.
    * Columns: event_id, created_at, commit_id, target_region, status, duration_ms. */
  def syncEvents(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val r = Tables.region(s, d)
    val k = get_json_object(col("props"), "$.k").cast("int")
    e.join(broadcast(r), e("user_id") % 5 === r("r_regionkey"))
      .select(
        col("event_id"),
        col("ts").as("created_at"),
        col("user_id").as("commit_id"),
        col("r_name").as("target_region"),
        (when(k % 4 === 0, "Pending")
          .when(k % 4 === 1, "InProgress")
          .when(k % 4 === 2, "Completed")
          .otherwise("Failed")).as("status"),
        col("value").as("duration_ms"),
        col("event_type"))
  }

  /** Registry rows: one per nation — (table namespace ⇒ region, status). */
  def registry(s: SparkSession, d: String): DataFrame = {
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(
        col("n_name").as("entry"),
        col("r_name").as("region"),
        when(col("n_nationkey") % 3 === 0, "Active").otherwise("Inactive").as("status"))
  }

  /** Region health snapshot for read-routing (Q3/Q4 inputs):
    * storage availability and activity flags are derived deterministically. */
  def regionHealth(s: SparkSession, d: String): DataFrame =
    Tables.region(s, d).select(
      col("r_name").as("region"),
      (col("r_regionkey") =!= 3).as("storage_available"),
      (col("r_regionkey") % 2 === 0).as("active"))

  /** GC execution log (G3): one state transition per events row; path
    * collisions (event_id % 997) give multiple transitions per
    * (execution, path) so the latest-state resolution is meaningful. */
  def gcExecutions(s: SparkSession, d: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("int")
    Tables.events(s, d).select(
      concat(lit("exec-"), (col("user_id") % 10).cast("string")).as("execution_id"),
      concat(lit("s3://gc/"), (col("event_id") % 997).cast("string")).as("path"),
      when(k % 5 === 0, "planned").when(k % 5 === 1, "deleting")
        .when(k % 5 === 2, "deleted").when(k % 5 === 3, "missing")
        .otherwise("error").as("state"),
      col("ts").as("updated_at_ms"),
      col("event_id"))
  }

  /** Copy jobs (S6): one tracked async copy job per events row — the
    * warehouse-table shape of CopyJobManager's registry. */
  def copyJobs(s: SparkSession, d: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("int")
    Tables.events(s, d).select(
      concat(lit("copy-"), col("event_id").cast("string")).as("job_id"),
      when(k % 4 === 0, "Running").when(k % 4 === 1, "Completed")
        .when(k % 4 === 2, "Failed").otherwise("Cancelled").as("state"),
      (col("event_id") % 1000).as("files_copied"),
      round(col("value") * 1e6).cast("bigint").as("bytes_copied"),
      col("ts").as("updated_at"))
  }

  /** Commit log: one commit per orders row (table_id = o_custkey). */
  def commits(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_custkey").as("table_id"),
      col("o_orderkey").as("commit_seq"),
      col("o_orderdate").as("committed_at"),
      col("o_orderstatus").as("commit_status"),
      col("o_totalprice").as("commit_bytes"))
}
