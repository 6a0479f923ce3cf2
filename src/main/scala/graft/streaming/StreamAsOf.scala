package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment — the stateful dual of
  * operators/AsOfJoin.asOf: reference-side updates (purchases, table
  * versions, model deployments) and probe-side events (clicks, reads)
  * arrive as ONE union stream keyed the same way; every probe emits
  * immediately, enriched with the latest reference row at-or-before its
  * event time among those SEEN SO FAR.
  *
  * Semantics are AT-ARRIVAL (the standard contract of streaming
  * enrichment joins): a reference row arriving after a probe was
  * already emitted does not rewrite history — it enriches later probes
  * only. Within one micro-batch, rows process in event-time order
  * (references before probes at the same timestamp), so any
  * intra-batch interleaving is invisible; fed in event-time order
  * across batches, the output equals the batch as-of join row for row
  * (StreamingSpec asserts exactly that).
  *
  * Scale shape: state per key is a BOUNDED list of the `maxEntries`
  * most recent references (a reorder buffer for late probes — at-
  * arrival enrichment needs only the latest reference unless probes
  * arrive out of order), so state size is O(keys · maxEntries)
  * regardless of stream length; one shuffle on the key, exactly like
  * the batch form.
  */
object StreamAsOf {

  /** Union-stream row: `isRef` selects the side; `refId` is the
    * reference payload, `probeId` the probe identity. */
  case class In(key: Long, isRef: Boolean, ts: Timestamp, refId: Long, probeId: Long)

  case class Enriched(probeId: Long, key: Long, ts: Timestamp,
                      asofTs: Option[Timestamp], asofRefId: Option[Long])

  /** (tsMillis, refId) newest-first; ties at one ts keep the larger
    * refId first — the batch form's "largest payload" tie rule. */
  case class RefState(entries: List[(Long, Long)])

  def enrich(in: Dataset[In], maxEntries: Int = 64)
            (implicit spark: SparkSession): Dataset[Enriched] = {
    import spark.implicits._
    require(maxEntries >= 1, s"maxEntries must be >= 1: $maxEntries")
    in.groupByKey(_.key)
      .flatMapGroupsWithState[RefState, Enriched](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (key, batch, state: GroupState[RefState]) =>
          var entries = state.getOption.map(_.entries).getOrElse(Nil)
          val out = batch.toSeq
            .sortBy(r => (r.ts.getTime, if (r.isRef) 0 else 1, r.refId))
            .flatMap { r =>
              if (r.isRef) {
                entries = ((r.ts.getTime, r.refId) :: entries)
                  .sortBy(e => (-e._1, -e._2)).take(maxEntries)
                None
              } else {
                val m = entries.find(_._1 <= r.ts.getTime)
                Some(Enriched(r.probeId, key, r.ts,
                  m.map(e => new Timestamp(e._1)), m.map(_._2)))
              }
            }
          state.update(RefState(entries))
          out.iterator
      }
  }
}
