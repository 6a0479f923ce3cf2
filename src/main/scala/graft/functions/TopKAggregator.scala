package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Distributed exact top-k per group via a bounded-heap Aggregator.
  *
  * The naive ranking pattern — `Window.partitionBy(query).orderBy(score)`
  * + row_number — sends EVERY scored row of a group to one task; with a
  * billion-row corpus a single partition holds the whole corpus' scores
  * for a query (OOM/straggler by construction). This aggregator keeps a
  * size-k sorted buffer instead, so Spark's partial aggregation
  * (ObjectHashAggregate) reduces each map partition to at most k entries
  * per group BEFORE the shuffle: the exchange carries O(partitions ·
  * groups · k) rows, never O(corpus · queries).
  *
  * Buffer = parallel arrays sorted best-first (score desc, id asc —
  * deterministic tie-break), mutated in place; the common case (row worse
  * than the current k-th) is a single comparison, no allocation.
  */
object TopKAggregator {

  /** Fixed-capacity sorted buffer: entries [0, n) of the parallel arrays,
    * best-first. Capacity k is allocated once per group. */
  case class TopKBuf(n: Int, scores: Array[Double], ids: Array[Long])

  case class TopKAgg(k: Int)
      extends Aggregator[(Double, Long), TopKBuf, TopKBuf] {

    // strict "a ranks before b": higher score, then smaller id
    private def before(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
      sa > sb || (sa == sb && ia < ib)

    private def insert(b: TopKBuf, score: Double, id: Long): TopKBuf = {
      if (b.n >= k && !before(score, id, b.scores(b.n - 1), b.ids(b.n - 1)))
        return b // worse than the current k-th: the hot path, no work
      // binary search for the insertion point in the sorted prefix
      var lo = 0; var hi = b.n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (before(b.scores(mid), b.ids(mid), score, id)) lo = mid + 1 else hi = mid
      }
      val newN = math.min(b.n + 1, k)
      val shift = newN - 1 - lo
      if (shift > 0) {
        System.arraycopy(b.scores, lo, b.scores, lo + 1, shift)
        System.arraycopy(b.ids, lo, b.ids, lo + 1, shift)
      }
      if (lo < k) { b.scores(lo) = score; b.ids(lo) = id }
      if (newN != b.n) b.copy(n = newN) else b
    }

    override def zero: TopKBuf = TopKBuf(0, new Array[Double](k), new Array[Long](k))

    override def reduce(b: TopKBuf, a: (Double, Long)): TopKBuf = insert(b, a._1, a._2)

    override def merge(x: TopKBuf, y: TopKBuf): TopKBuf = {
      var acc = x; var i = 0
      while (i < y.n) { acc = insert(acc, y.scores(i), y.ids(i)); i += 1 }
      acc
    }

    override def finish(b: TopKBuf): TopKBuf =
      TopKBuf(b.n, b.scores.take(b.n), b.ids.take(b.n))

    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  }

  /** Exact top-k rows per group over `scored` (must carry `groupCol`,
    * `idCol` castable to long, `scoreCol`). Returns (groupCol, idCol,
    * scoreCol, rank) with rank 1-based in (score desc, id asc) order —
    * identical output contract to the window-rank pattern, scalable plan.
    * `idType` restores the id column's original type after the long
    * round-trip through the aggregator. */
  def topKPerGroup(scored: DataFrame, k: Int, idType: DataType,
                   groupCol: String = "query_id", idCol: String = "neighbor_id",
                   scoreCol: String = "score"): DataFrame = {
    val topk = udaf(TopKAgg(k))
    scored
      .groupBy(col(groupCol))
      .agg(topk(col(scoreCol), col(idCol).cast("long")).as("_tk"))
      .select(col(groupCol),
        posexplode(arrays_zip(col("_tk.scores"), col("_tk.ids"))).as(Seq("_pos", "_e")))
      .select(col(groupCol),
        col("_e.ids").cast(idType).as(idCol),
        col("_e.scores").as(scoreCol),
        (col("_pos") + 1).as("rank"))
  }
}
