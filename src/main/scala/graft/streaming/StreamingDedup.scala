package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming duals of the dedup family — for ingest-time filtering of a
  * training-data firehose (the batch forms live in graft.pipeline.Dedup).
  *
  * State discipline at 100 TB/day: a plain `dropDuplicates` on a stream
  * keeps every fingerprint ever seen in the state store (unbounded);
  * `dropDuplicatesWithinWatermark` bounds state to the watermark horizon,
  * which is the correct contract for ingest dedup where duplicates arrive
  * near each other (retries, double-publishes, mirrored crawls).
  * Fingerprints are the SAME expressions as the batch dedup family
  * (TextAnalysis.fingerprint / bowFingerprint, called, not copied), so
  * stream-admitted and batch-admitted corpora always agree on identity —
  * one narrow state-store key, never the document body.
  */
object StreamingDedup {

  /** Exact-dup suppression on a stream: first occurrence within the
    * watermark horizon wins; re-occurrences inside the horizon drop.
    * `timeCol` must be the event-time column used by the watermark. */
  def dropExactDups(docs: DataFrame, timeCol: String = "event_time",
                    textCol: String = "text", watermark: String = "1 hour"): DataFrame =
    docs.withColumn("fp", graft.pipeline.TextAnalysis.fingerprint(col(textCol)))
      .withWatermark(timeCol, watermark)
      .dropDuplicatesWithinWatermark("fp")
      .drop("fp")

  /** Bag-of-words near-dup suppression: order-insensitive fingerprint
    * (sorted distinct tokens) so shuffled copies of a document dedup too —
    * the streaming twin of TextAnalysis.bowFingerprint. */
  def dropBowDups(docs: DataFrame, timeCol: String = "event_time",
                  textCol: String = "text", watermark: String = "1 hour"): DataFrame =
    docs.withColumn("fp", graft.pipeline.TextAnalysis.bowFingerprint(col(textCol)))
      .withWatermark(timeCol, watermark)
      .dropDuplicatesWithinWatermark("fp")
      .drop("fp")
}
