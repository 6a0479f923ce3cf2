package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Scan-parallelism guard for compute-heavy narrow stages.
  *
  * The declared corpora arrive as single parquet files a few hundred KB
  * to a few MB each, so a scan is ONE input split and every expensive
  * per-row projection chained onto it (MinHash signatures, shingle
  * sets, image decodes, wide profile aggregates) runs in one task —
  * cpu ≈ wall at any core count (the bench showed 1–2 busy cores out of
  * 32 on exactly these queries). The optimization guide's input-skew
  * rule (§2.5: "one huge unsplittable file … repartition immediately
  * after the read") applies: spread the rows BEFORE the heavy compute.
  *
  * Scale-adaptive by construction, not a local-mode constant: the
  * target is the session's defaultParallelism (local[n] → n; a real
  * cluster → its total cores), and the repartition fires ONLY when the
  * source scan would run with fewer tasks than that — at 100 TB the
  * same table is thousands of splits, the guard sees parallelism ≥
  * target, and no extra shuffle is paid. The shuffle it does introduce
  * locally moves the narrow pre-compute projection (KBs here), never a
  * computed result.
  *
  * Caller contract: `df` must be exchange-free (scan + narrow
  * filters/projections only, or an already-materialized
  * localCheckpoint) — probing `.rdd.getNumPartitions` on a plan with
  * exchanges would trigger AQE stage execution.
  */
object ScaleOut {

  /** `df` hash-repartitioned on `keys` (round-robin when empty) to the
    * session default parallelism, iff its current scan parallelism is
    * below that. Row set and per-row values are unchanged — only the
    * physical distribution moves. */
  def forCompute(df: DataFrame, keys: String*): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else if (keys.nonEmpty) df.repartition(target, keys.map(col): _*)
    else df.repartition(target)
  }
}
