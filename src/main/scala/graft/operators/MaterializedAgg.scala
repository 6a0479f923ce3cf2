package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance for distributive aggregates
  * (COUNT and SUM — AVG and friends derive from the pair at read time).
  *
  * The view state is a plain table `keys..., cnt, sum_<col>...`. A
  * `refresh` applies a row-level changefeed (rows tagged `_change_type`
  * in {insert, delete}, the shape `GraftCatalog.changesBetween` emits)
  * as SIGNED deltas: deletes contribute multiplicity −1, inserts +1, so
  * the new state is one `|delta|`-sized aggregation plus one group-key
  * shuffle of `state ∪ delta` — O(changed groups), never O(table).
  * Groups whose count reaches zero vanish from the view.
  *
  * Scale rationale: the reference recomputes derived/stat tables on each
  * sync cycle (see reference modules' sync worker loop); at 100 TB a
  * per-commit full recompute is unaffordable, while signed-delta
  * maintenance touches only the groups present in the commit's diff.
  * Use integer-typed measure columns (e.g. cents) when exact
  * cross-engine equality matters — integer SUM is associative with no
  * float drift, so `init(full) == refresh*(init(v0))` bit-for-bit.
  */
object MaterializedAgg {

  private def aggExprs(sumCols: Seq[String], signed: Boolean) = {
    val cnt =
      if (signed) sum(col("_sign")).as("cnt") else count(lit(1)).as("cnt")
    val sums = sumCols.map { c =>
      val v = if (signed) col(c) * col("_sign") else col(c)
      sum(v).as(s"sum_$c")
    }
    (cnt, sums)
  }

  /** Full initial computation of the view from a base table. */
  def init(base: DataFrame, keys: Seq[String], sumCols: Seq[String]): DataFrame = {
    val (cnt, sums) = aggExprs(sumCols, signed = false)
    base.groupBy(keys.map(col): _*).agg(cnt, sums: _*)
  }

  /** O(delta) refresh of a prior `init`/`refresh` result. `changes` must
    * carry `_change_type` ∈ {insert, delete} plus the key/measure columns. */
  def refresh(state: DataFrame, changes: DataFrame,
              keys: Seq[String], sumCols: Seq[String]): DataFrame = {
    val (cnt, sums) = aggExprs(sumCols, signed = true)
    val delta = changes
      .withColumn("_sign",
        when(col("_change_type") === "delete", lit(-1L)).otherwise(lit(1L)))
      .groupBy(keys.map(col): _*)
      .agg(cnt, sums: _*)
    val merged = state.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"),
        sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c")): _*)
    merged.filter(col("cnt") > 0)
  }
}
