package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Registry query surface (SURVEY R1-R8).
  *
  * Reference: modules/ports/.../RegistryPort.scala + the in-memory adapter
  * (InMemoryRegistryAdapter.scala): point lookups, inverted lookups,
  * active-region distinct, status stats, and batch lookups.
  *
  * Spark-first: the registry is dimension-sized (tables × regions), so
  * every join against it is a broadcast-hash join — batch lookups
  * (R7/C10) are "keys DF left-join broadcast(registry)", which amortizes
  * naturally instead of the reference's per-key map gets. Upserts (R2/R6)
  * are MERGE-shaped and live with the snapshot/catalog layer.
  */
object RegistryOps {

  /** R5: regions with at least one Active entry, deduped. */
  def activeRegions(registry: DataFrame): DataFrame =
    registry.filter(col("status") === "Active").select(col("region")).distinct()

  /** R3: regions hosting a given entry. */
  def regionsOf(registry: DataFrame, entry: String): DataFrame =
    registry.filter(col("entry") === entry).select(col("region"))

  /** R8: counts by status. */
  def stats(registry: DataFrame): DataFrame =
    registry.groupBy(col("status")).agg(count(lit(1)).as("cnt"))

  /** R7/C10: batch lookup — keys stay as the probe side, registry is
    * broadcast. Missing entries survive as nulls (caller decides policy). */
  def lookupBatch(keys: DataFrame, registry: DataFrame, keyCols: Seq[String]): DataFrame =
    keys.join(broadcast(registry), keyCols, "left_outer")

  /** Skew-safe large-×-large equi-join: salt the skewed left side into
    * `salts` sub-keys and explode the right side across all salt values,
    * then join on (key, salt). Use when one key dominates (hot tenant /
    * hot table) and AQE skew splitting isn't enough; salts multiplies the
    * right side, so keep it small (8-32). */
  def saltedJoin(left: DataFrame, right: DataFrame, keyCol: String,
                 salts: Int): DataFrame = {
    require(!left.columns.contains("_salt") && !right.columns.contains("_salt"),
      "saltedJoin reserves the _salt column; rename it on the inputs first")
    val saltedLeft = left.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)).cast("int"))
    val saltedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(saltedRight, Seq(keyCol, "_salt")).drop("_salt")
  }
}
