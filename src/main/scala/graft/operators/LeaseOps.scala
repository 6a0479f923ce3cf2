package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Query-lease registry protecting snapshots from GC (SURVEY G5).
  *
  * Reference: legacy/modules/ports/.../LeasePort.java + the Redis adapter's
  * expiry filter (RedisInfraAdapters.java:29-34); GCCoordinator consults
  * active leases before deleting (GCCoordinator.java:86).
  *
  * Spark-first: leases live in a small table (lease_id, table_entry,
  * pinned_seq, expires_at); "active" is a codegen'd filter, and the GC
  * guard is an anti-join of candidates against the snapshots pinned by
  * live leases — set algebra instead of per-key Redis lookups. */
object LeaseOps {

  /** Leases still alive at `now`. */
  def listActive(leases: DataFrame, now: Column): DataFrame =
    leases.filter(col("expires_at") > now)

  /** Renewal = extend expiry (projection; persistence is a MERGE upstream). */
  def renew(leases: DataFrame, leaseIds: Seq[String], extendSeconds: Long): DataFrame =
    leases.withColumn("expires_at",
      when(col("lease_id").isin(leaseIds.map(_.asInstanceOf[Any]): _*),
           col("expires_at") + expr(s"INTERVAL $extendSeconds SECONDS"))
        .otherwise(col("expires_at")))

  /** GC lease guard: drop candidates whose snapshot sequence is pinned by
    * any active lease on the same table (anti-join on table+seq). */
  def leaseGuard(candidates: DataFrame, leases: DataFrame, now: Column,
                 tableCol: String = "table_entry", seqCol: String = "pinned_seq"): DataFrame = {
    val pins = listActive(leases, now).select(col(tableCol), col(seqCol))
    candidates.join(pins,
      candidates(tableCol) === pins(tableCol) && candidates(seqCol) === pins(seqCol),
      "left_anti")
  }
}
