package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Three-level deduplicating copy planner (SURVEY Y15).
  *
  * Reference: legacy/modules/app/.../ReplicationPlanner.java:70-101 —
  *  1. manifest level:   files in the source snapshot whose manifest is not
  *                       yet present at the destination;
  *  2. inventory level:  drop files already recorded in the (offline)
  *                       destination inventory;
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
    val newFiles = srcFiles.join(dstFiles.select(pathCol), Seq(pathCol), "left_anti")
    // 2. inventory probe: drop files the inventory already knows about
    val notInInventory = newFiles.join(inventory.select(pathCol), Seq(pathCol), "left_anti")
    // 3. object-level verify: missing stat, size mismatch, or etag mismatch
    val stat = dstStat.select(
      col(pathCol),
      col(sizeCol).as("stat_size"),
      col(etagCol).as("stat_etag"))
    notInInventory.join(stat, Seq(pathCol), "left_outer")
      .filter(col("stat_size").isNull ||
              col("stat_size") =!= col(sizeCol) ||
              (col("stat_etag").isNotNull && col(etagCol).isNotNull &&
               col("stat_etag") =!= col(etagCol)))
      .drop("stat_size", "stat_etag")
  }

  /** Bloom-accelerated variant: level 2 probes a Bloom sketch of the
    * inventory instead of anti-joining it (G7's scale path — at a
    * billions-of-objects inventory the sketch broadcast replaces the
    * biggest shuffle). Bloom false positives only *drop* copy candidates
    * that level 3 would also have dropped or that re-verification
    * catches; false negatives are impossible, so nothing is copied twice. */
  def planWithBloomInventory(srcFiles: DataFrame, dstFiles: DataFrame, inventory: DataFrame,
                             dstStat: DataFrame, pathCol: String = "path",
                             sizeCol: String = "size_bytes", etagCol: String = "etag",
                             bloomBits: Long = 8388608L): DataFrame = {
    val newFiles = srcFiles.join(dstFiles.select(pathCol), Seq(pathCol), "left_anti")
    val notInInventory = InventoryFilter.notInInventory(
      newFiles, inventory.select(pathCol), pathCol, numBits = bloomBits)
    val stat = dstStat.select(
      col(pathCol), col(sizeCol).as("stat_size"), col(etagCol).as("stat_etag"))
    notInInventory.join(stat, Seq(pathCol), "left_outer")
      .filter(col("stat_size").isNull ||
              col("stat_size") =!= col(sizeCol) ||
              (col("stat_etag").isNotNull && col(etagCol).isNotNull &&
               col("stat_etag") =!= col(etagCol)))
      .drop("stat_size", "stat_etag")
  }
}
