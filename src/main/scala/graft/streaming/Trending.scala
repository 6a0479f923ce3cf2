package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sliding-window trending counts — the "what's hot in the last 2 hours,
  * refreshed every 30 minutes" surface over the events stream.
  *
  * Reference analog: the reference's metrics rollups aggregate sync
  * events per region/window (modules/sync metrics); sliding windows are
  * the streaming generalization.
  *
  * Scale shape: Spark's `window(ts, W, S)` explodes each event into
  * W/S = 4 overlapping windows BEFORE the aggregate — a deliberate,
  * bounded 4× row fan-out that buys partial (map-side) aggregation on
  * (window, key), so the shuffle carries per-partition partial counts,
  * not events. The per-window top-N ranking runs on the aggregated table
  * (windows × distinct keys rows — metadata-scale next to the corpus).
  * The SAME `slidingCounts` plan runs unchanged over a watermarked
  * stream (append mode emits each window once the watermark passes its
  * end) — StreamingSpec proves stream ≡ batch on identical rows.
  */
object Trending {

  /** Counts per (sliding window, key). Works on a batch frame or a
    * watermarked streaming frame — the aggregation is the same plan. */
  def slidingCounts(events: DataFrame, tsCol: String, keyCol: String,
                    windowLen: String = "2 hours",
                    slide: String = "30 minutes"): DataFrame =
    events
      .groupBy(window(col(tsCol), windowLen, slide).as("w"), col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"), col(keyCol), col("cnt"))

  /** Top-N keys per window, ties to the smaller key. Batch /
    * foreachBatch side — rank-in-window is not expressible inside a
    * streaming agg, which is why the operator splits here. */
  def topNPerWindow(counts: DataFrame, n: Int,
                    keyCol: String = "event_type"): DataFrame =
    counts
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("window_start"))
          .orderBy(col("cnt").desc, col(keyCol))))
      .filter(col("rank") <= n)
}
