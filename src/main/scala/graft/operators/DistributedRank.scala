package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed dense_rank without a single global window.
  *
  * `dense_rank() OVER (ORDER BY key)` plans ONE window partition — the
  * whole dataset funnels through a single task, the classic global-sort
  * bottleneck. This operator computes the identical ranking with
  * bounded parallelism:
  *
  *  1. range-repartition by the key (equal keys land in ONE partition —
  *     RangePartitioner assigns by key range, so no key straddles a
  *     boundary);
  *  2. rank WITHIN each range partition (a window whose group is one
  *     range partition — corpus/P rows, the balanced unit of work);
  *  3. shift each partition's local ranks by the total distinct-key
  *     count of all earlier partitions (a P-row prefix sum — driver
  *     scale by construction).
  *
  * Same decomposition as Curation.globalShuffleShards' prefix-sum and
  * the reference's paginated listing: global order = local order +
  * broadcast offsets. Output: input columns + `rankCol` (1-based dense
  * rank, ties share a rank). Deterministic for any input partitioning.
  */
object DistributedRank {

  def denseRankBy(df: DataFrame, keyCols: Seq[Column], rankCol: String,
                  partitions: Int = 32): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val ranged = df.repartitionByRange(partitions, keyCols: _*)
      .withColumn("__pid", spark_partition_id())
    // per-partition window: the shuffle key is the partition id, so each
    // window group IS one range partition (bounded, balanced)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(keyCols: _*)
    // MATERIALIZED once: RangePartitioner samples its boundaries per
    // physical execution, so if the offsets aggregate and the final join
    // each re-executed the exchange they could see DIFFERENT partition
    // assignments — offsets would shift rank ranges against the wrong
    // partitions (observed: adjacent key ranges silently merging). The
    // checkpoint pins one assignment for both consumers.
    val local = ranged.withColumn("__lrank", dense_rank().over(w))
      .localCheckpoint()
    // P-row offset table: distinct keys per partition, prefix-summed
    val ow = org.apache.spark.sql.expressions.Window
      .orderBy(col("__pid"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("__pid"))
      .agg(max(col("__lrank")).as("__ndistinct"))
      .withColumn("__offset", coalesce(sum(col("__ndistinct")).over(ow), lit(0L)))
      .select(col("__pid"), col("__offset"))
    local.join(broadcast(offsets), "__pid")
      .withColumn(rankCol, col("__lrank") + col("__offset"))
      .drop("__pid", "__lrank", "__offset")
  }
}
