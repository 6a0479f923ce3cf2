package graft.functions

import scala.reflect.ClassTag
import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
  *
  * Scores compare via java.lang.Double.compare — a TOTAL order, so NaN
  * ranks as the largest score regardless of arrival or merge order
  * (matching Spark's own sort semantics, which the window-rank pattern
  * this replaces inherited). Without it, NaN would be rejected by the
  * full-buffer early-out but inserted at rank 1 by the binary search —
  * results would depend on arrival order.
  *
  * Ids are generic: integral id columns ride a primitive long buffer (no
  * boxing); any other id type (string/UUID doc ids) rides a string buffer
  * and is cast back to its original type on output — no silent
  * cast-to-null collapse for non-numeric ids.
  */
object TopKAggregator {

  /** Fixed-capacity sorted buffer: entries [0, n) of the parallel arrays,
    * best-first. Capacity k is allocated once per group. */
  case class TopKBuf[I](n: Int, scores: Array[Double], ids: Array[I])

  case class TopKAgg[I: Ordering : ClassTag : TypeTag](k: Int)
      extends Aggregator[(Double, I), TopKBuf[I], TopKBuf[I]] {

    private val idOrd = implicitly[Ordering[I]]

    // strict "a ranks before b": higher score (total order: NaN largest,
    // -0.0 < 0.0 — deterministic under any merge order), then smaller id
    private def before(sa: Double, ia: I, sb: Double, ib: I): Boolean = {
      val c = java.lang.Double.compare(sa, sb)
      c > 0 || (c == 0 && idOrd.lt(ia, ib))
    }

    private def insert(b: TopKBuf[I], score: Double, id: I): TopKBuf[I] = {
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

    override def zero: TopKBuf[I] = TopKBuf(0, new Array[Double](k), new Array[I](k))

    override def reduce(b: TopKBuf[I], a: (Double, I)): TopKBuf[I] = insert(b, a._1, a._2)

    override def merge(x: TopKBuf[I], y: TopKBuf[I]): TopKBuf[I] = {
      var acc = x; var i = 0
      while (i < y.n) { acc = insert(acc, y.scores(i), y.ids(i)); i += 1 }
      acc
    }

    override def finish(b: TopKBuf[I]): TopKBuf[I] =
      TopKBuf(b.n, b.scores.take(b.n), b.ids.take(b.n))

    override def bufferEncoder: Encoder[TopKBuf[I]] = Encoders.product[TopKBuf[I]]
    override def outputEncoder: Encoder[TopKBuf[I]] = Encoders.product[TopKBuf[I]]
  }

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Exact top-k rows per group over `scored` (must carry `groupCol`,
    * `idCol`, `scoreCol`). Returns (groupCol, idCol, scoreCol, rank) with
    * rank 1-based in (score desc, id asc) order — identical output
    * contract to the window-rank pattern, scalable plan. `idType` is the
    * id column's declared type: integral ids aggregate as primitive
    * longs; any other type aggregates as its string form and is cast
    * back, so string/UUID ids survive (they'd cast("long") to null). The
    * id-asc tie-break follows the aggregation representation (numeric for
    * integral ids, lexicographic otherwise). */
  def topKPerGroup(scored: DataFrame, k: Int, idType: DataType,
                   groupCol: String = "query_id", idCol: String = "neighbor_id",
                   scoreCol: String = "score"): DataFrame = {
    val (topk, idAgg) =
      if (isIntegral(idType)) (udaf(TopKAgg[Long](k)), col(idCol).cast("long"))
      else (udaf(TopKAgg[String](k)), col(idCol).cast("string"))
    scored
      // a null score/id (e.g. a null embedding upstream of cosine) can
      // never rank; dropping it here matters because the aggregator's
      // non-nullable (Double, id) tuple encoder otherwise ABORTS the job
      // on the first null — the window-rank pattern tolerated them
      .filter(col(scoreCol).isNotNull && col(idCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(topk(col(scoreCol), idAgg).as("_tk"))
      .select(col(groupCol),
        posexplode(arrays_zip(col("_tk.scores"), col("_tk.ids"))).as(Seq("_pos", "_e")))
      .select(col(groupCol),
        col("_e.ids").cast(idType).as(idCol),
        col("_e.scores").as(scoreCol),
        (col("_pos") + 1).as("rank"))
  }
}
