package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Three-level deduplicating copy planner (SURVEY Y15).
  *
  * Reference: legacy/modules/app/.../ReplicationPlanner.java:70-101 —
  *  1. manifest level:   files in the source snapshot whose manifest is not
  *                       yet present at the destination;
  *  2. inventory level:  drop files already recorded in the (offline)
  *                       destination inventory — matching size/etag too when
  *                       the inventory carries them (InventoryPort.contains
  *                       compares path+etag+size, so a stale entry with a
  *                       mismatched size must not suppress a re-copy);
  *  3. object level:     stat the remainder — keep files that are missing,
  *                       or whose size/etag disagrees.
  *
  * Spark-first: each level is an anti/left join, so the whole plan is a
  * declarative three-join pipeline Catalyst can reorder and broadcast.
  * At 100 TB the inventory table is the big side (billions of objects) —
  * the candidate set after level 1 is small relative to it, so the planner
  * keeps candidates as the probe side; enable AQE so the level-2 join
  * flips to broadcast once level 1 has shrunk the candidates.
  */
object ReplicationPlanner {

  /** Level 2: candidates NOT satisfied by the inventory — path absent, or
    * present with a disagreeing size/etag (when the inventory carries
    * those columns; a path-only inventory degrades to pure membership).
    * A satisfied entry is trusted and skips the stat level, matching the
    * reference's InventoryPort.contains(path, etag, size) semantics. */
  private[operators] def notSatisfiedByInventory(
      candidates: DataFrame, inventory: DataFrame,
      pathCol: String, sizeCol: String, etagCol: String): DataFrame = {
    val invCols = inventory.columns.toSet
    if (!invCols.contains(sizeCol) && !invCols.contains(etagCol)) {
      JoinKeys.hashKeyedJoin(candidates, inventory.select(pathCol), Seq(pathCol), "left_anti")
    } else {
      val invSize =
        if (invCols.contains(sizeCol)) col(sizeCol) else lit(null).cast("long")
      val invEtag =
        if (invCols.contains(etagCol)) col(etagCol) else lit(null).cast("string")
      val inv = inventory.select(
        col(pathCol), invSize.as("inv_size"), invEtag.as("inv_etag"),
        lit(true).as("inv_hit"))
      JoinKeys.hashKeyedJoin(candidates, inv, Seq(pathCol), "left_outer")
        .filter(col("inv_hit").isNull ||
                (col("inv_size").isNotNull && col("inv_size") =!= col(sizeCol)) ||
                (col("inv_etag").isNotNull && col(etagCol).isNotNull &&
                 col("inv_etag") =!= col(etagCol)))
        .drop("inv_size", "inv_etag", "inv_hit")
    }
  }

  /** Level 3: keep candidates whose live stat is missing or disagrees. */
  private def statVerify(candidates: DataFrame, dstStat: DataFrame,
                         pathCol: String, sizeCol: String, etagCol: String): DataFrame = {
    val stat = dstStat.select(
      col(pathCol),
      col(sizeCol).as("stat_size"),
      col(etagCol).as("stat_etag"))
    JoinKeys.hashKeyedJoin(candidates, stat, Seq(pathCol), "left_outer")
      .filter(col("stat_size").isNull ||
              col("stat_size") =!= col(sizeCol) ||
              (col("stat_etag").isNotNull && col(etagCol).isNotNull &&
               col("stat_etag") =!= col(etagCol)))
      .drop("stat_size", "stat_etag")
  }

  /** Level 1+2+3 plan.
    *
    * @param srcFiles  source snapshot listing: pathCol, sizeCol, etagCol
    * @param dstFiles  destination's current listing (same schema)
    * @param inventory destination offline inventory: pathCol (+ optionally size/etag)
    * @param dstStat   destination live stat results: pathCol, sizeCol, etagCol
    * @return the rows of `srcFiles` that must be copied
    */
  def plan(srcFiles: DataFrame, dstFiles: DataFrame, inventory: DataFrame,
           dstStat: DataFrame, pathCol: String = "path", sizeCol: String = "size_bytes",
           etagCol: String = "etag"): DataFrame = {
    // 1. manifest diff: new files not yet at the destination
    val newFiles = JoinKeys.hashKeyedJoin(srcFiles, dstFiles.select(pathCol), Seq(pathCol), "left_anti")
    // 2. inventory probe: drop files the inventory records with agreeing size/etag
    val notInInventory = notSatisfiedByInventory(newFiles, inventory, pathCol, sizeCol, etagCol)
    // 3. object-level verify: missing stat, size mismatch, or etag mismatch
    statVerify(notInInventory, dstStat, pathCol, sizeCol, etagCol)
  }

  /** Bloom-accelerated variant: level 2 first probes a Bloom sketch of the
    * inventory (G7's scale path — at a billions-of-objects inventory the
    * broadcast sketch replaces the biggest shuffle). Bloom NEGATIVES are
    * exact ("definitely not in inventory") and go straight to level 3.
    * Bloom POSITIVES are only probable — a false positive is a file that
    * genuinely needs copying, so instead of dropping them (silent
    * under-replication) they are resolved against the real inventory; the
    * positive set is a small fraction of the candidates, so that precise
    * join is cheap (broadcastable under AQE). The sketch's job is to
    * shrink the expensive join's probe side, not to change the answer:
    * this plan's output is identical to [[plan]]'s. */
  def planWithBloomInventory(srcFiles: DataFrame, dstFiles: DataFrame, inventory: DataFrame,
                             dstStat: DataFrame, pathCol: String = "path",
                             sizeCol: String = "size_bytes", etagCol: String = "etag",
                             expectedItems: Long = 1000000L,
                             bloomBits: Long = 8388608L): DataFrame = {
    // materialized once (r15): BOTH membership filters below reference
    // the level-1 candidates, and without this the manifest anti-join —
    // the widest stage of the plan — executes twice. Candidates after
    // level 1 are the small side by design (the class scaladoc), so the
    // checkpoint is delta-sized at any corpus.
    val newFiles = JoinKeys.hashKeyedJoin(srcFiles, dstFiles.select(pathCol), Seq(pathCol), "left_anti")
      .localCheckpoint()
    // ONE sketch feeds both membership filters — the inventory aggregate
    // is the widest stage here and must not run twice. expectedItems is
    // a real tuning knob: size it to the inventory cardinality or the
    // saturated filter sends ~everything down the precise-join path.
    val sketch = InventoryFilter.bloomSketch(
      inventory.select(pathCol), pathCol, expectedItems, bloomBits)
    val negatives = InventoryFilter.notInSketch(newFiles, sketch, pathCol)
    val positives = InventoryFilter.probablyInSketch(newFiles, sketch, pathCol)
    val falsePositives = notSatisfiedByInventory(positives, inventory, pathCol, sizeCol, etagCol)
    statVerify(negatives.unionByName(falsePositives), dstStat, pathCol, sizeCol, etagCol)
  }
}
