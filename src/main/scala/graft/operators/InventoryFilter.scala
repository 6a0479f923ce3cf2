package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Bloom-filter inventory membership (SURVEY G7).
  *
  * Reference: InventoryPort.contains — a per-file membership probe against
  * an offline object-store inventory; the design doc calls for a Bloom
  * index at scale (iceberg-arch-hybrid-replica-dr.md:510-515).
  *
  * Spark-first: build one Bloom filter over the inventory with Spark's
  * internal BloomFilterAggregate (the engine's own runtime-filter
  * machinery, exposed here through the Column bridge), broadcast the
  * single-row sketch, and probe candidates with BloomFilterMightContain.
  * For a billions-of-objects inventory this replaces a full anti-join
  * shuffle with a broadcast of a few MB: no false negatives, so a "not
  * in inventory" verdict is exact; false positives only cause harmless
  * re-verification (the planner's level-3 stat check catches them).
  */
object InventoryFilter {

  def bloomAgg(c: Column, expectedItems: Long, numBits: Long): Column =
    ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.expression(xxhash64(c)),
        ColumnBridge.expression(lit(expectedItems)),
        ColumnBridge.expression(lit(numBits))).toAggregateExpression())

  def mightContain(bloom: Column, c: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(bloom),
      ColumnBridge.expression(xxhash64(c))))

  /** Build the inventory sketch ONCE as a scalar-subquery column — pass
    * it to both membership filters instead of aggregating the (billions-
    * row) inventory twice for two identical sketches. */
  def bloomSketch(inventory: DataFrame, pathCol: String,
                  expectedItems: Long, numBits: Long): Column =
    bloomSubquery(inventory, pathCol, expectedItems, numBits)

  /** Membership filters over a prebuilt sketch (null sketch = empty
    * inventory: nothing is probably-in, everything is definitely-out). */
  def notInSketch(candidates: DataFrame, sketch: Column, pathCol: String = "path"): DataFrame =
    candidates.filter(!coalesce(mightContain(sketch, col(pathCol)), lit(false)))

  def probablyInSketch(candidates: DataFrame, sketch: Column, pathCol: String = "path"): DataFrame =
    candidates.filter(coalesce(mightContain(sketch, col(pathCol)), lit(false)))

  private def bloomSubquery(inventory: DataFrame, pathCol: String,
                            expectedItems: Long, numBits: Long): Column =
    ColumnBridge.scalarSubquery(
      inventory.agg(bloomAgg(col(pathCol), expectedItems, numBits).as("_bf")))

  /** Rows of `candidates` that are definitely NOT in the inventory
    * (exact: Bloom has no false negatives). The sketch rides as a scalar
    * subquery — one build, broadcast to every probe task. */
  def notInInventory(candidates: DataFrame, inventory: DataFrame,
                     pathCol: String = "path",
                     expectedItems: Long = 1000000L, numBits: Long = 8388608L): DataFrame =
    // an EMPTY inventory aggregates to a NULL sketch and might_contain
    // returns null — without the coalesce both membership filters drop
    // every row and a fresh destination silently plans ZERO copies
    candidates.filter(!coalesce(mightContain(
      bloomSubquery(inventory, pathCol, expectedItems, numBits), col(pathCol)), lit(false)))

  /** Probable members (candidates for the stat-verify level). */
  def probablyInInventory(candidates: DataFrame, inventory: DataFrame,
                          pathCol: String = "path",
                          expectedItems: Long = 1000000L, numBits: Long = 8388608L): DataFrame =
    // null sketch (empty inventory) -> nothing is probably-in
    candidates.filter(coalesce(mightContain(
      bloomSubquery(inventory, pathCol, expectedItems, numBits), col(pathCol)), lit(false)))
}
