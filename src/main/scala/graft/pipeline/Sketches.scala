package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch as pure column algebra over xxhash64 — the
  * fixed-memory frequency sketch (Cormode & Muthukrishnan 2005, public
  * algorithm) behind streaming heavy-hitter monitoring: at 100 TB the
  * exact per-key count table is itself a large dataset, while the sketch
  * is d·w cells REGARDLESS of corpus size or key cardinality, mergeable
  * across partitions/batches by cell-wise addition (it is an aggregate,
  * so partial combine gives the merge for free).
  *
  * Determinism: cells are exact integer sums of xxhash64-placed
  * increments — bit-reproducible across runs and partitionings. The cell
  * VALUES are engine-defined (no DuckDB xxhash64), so cross-engine
  * verification follows the slo_hll_check pattern: the accuracy CONTRACT
  * (estimate ≥ exact, always — a theorem, not a tolerance) is asserted
  * in-engine with a typed-empty-set oracle.
  */
object Sketches {

  /** Build a depth×width count-min sketch of `keyCol` occurrences.
    * Returns (row_id, bucket, cnt) — at most depth·width rows however
    * large the input. Each input row fans out to exactly `depth`
    * (row, bucket) increments which collapse immediately in the map-side
    * partial aggregate, so the shuffle carries ≤ depth·width rows per
    * upstream partition. */
  def cmsBuild(df: DataFrame, keyCol: String,
               depth: Int = 4, width: Int = 512): DataFrame = {
    require(depth >= 1, s"depth must be >= 1: $depth")
    require(width >= 2, s"width must be >= 2: $width")
    df.select(posexplode(array((0 until depth).map(r =>
        pmod(xxhash64(lit(r), col(keyCol)), lit(width))): _*))
        .as(Seq("row_id", "bucket")))
      .groupBy(col("row_id"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `probes`: est(k) = min_r sketch[r][h_r(k)],
    * absent cells read as 0 (a key the sketch never saw estimates 0).
    * The estimate NEVER underestimates — every cell counts a superset of
    * the key's occurrences — and overestimates by more than (e/width)·N
    * with probability at most e^−depth (the standard CMS bound). The
    * sketch side is ≤ depth·width rows and broadcasts. */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, keyCol: String,
                  depth: Int = 4, width: Int = 512): DataFrame = {
    val hashed = probes.select(col(keyCol),
      posexplode(array((0 until depth).map(r =>
        pmod(xxhash64(lit(r), col(keyCol)), lit(width))): _*))
        .as(Seq("row_id", "bucket")))
    hashed.join(broadcast(sketch), Seq("row_id", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_estimate"))
  }
}
