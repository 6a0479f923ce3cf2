package graft.operators

import org.apache.spark.sql.DataFrame

/** Snapshot set-algebra (SURVEY Y14, "list_added_files").
  *
  * Reference semantics: the ADDED-file set between snapshot vK and vN is
  * the set difference of their file listings (design doc
  * iceberg-arch-geo-distributed-ha.md:493-496; replica-dr doc :138).
  *
  * Spark-first: both inputs are file-listing DataFrames; the diff is a
  * left-anti join on the identifying columns, which Spark executes as a
  * shuffled (or broadcast, when one side is small) hash anti-join with
  * full predicate pushdown upstream. At 100 TB the listings are metadata
  * (~1e7 rows/PB), so this stays comfortably in one shuffle stage; AQE
  * will broadcast the older/smaller snapshot side when it fits.
  */
object SnapshotDiff {

  /** Files present in `newer` but not in `older` (by `keyCols`). */
  def addedFiles(older: DataFrame, newer: DataFrame, keyCols: Seq[String]): DataFrame =
    JoinKeys.hashKeyedJoin(newer, older, keyCols, "left_anti")

  /** Files removed between `older` and `newer`. */
  def removedFiles(older: DataFrame, newer: DataFrame, keyCols: Seq[String]): DataFrame =
    JoinKeys.hashKeyedJoin(older, newer, keyCols, "left_anti")

  /** Fast-forward catch-up (Y19): the same operation with a wider version
    * range — computing added files directly from vK to latest vN skips the
    * intermediate versions, which is what makes catch-up O(diff) instead
    * of O(versions). */
  def fastForwardAdded(atVersionK: DataFrame, latest: DataFrame, keyCols: Seq[String]): DataFrame =
    addedFiles(atVersionK, latest, keyCols)
}
