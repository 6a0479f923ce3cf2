package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: pair each point with every interval containing
  * it — `lo <= p <= hi` — without the cartesian product Spark plans for a
  * bare inequality join (BroadcastNestedLoop / O(|P|·|I|) compares).
  *
  * Bucketing turns it into an equi-join: quantize the value axis into
  * fixed-width buckets, explode each interval onto the buckets it covers,
  * and hash-join points to interval-fragments on the bucket id, then
  * re-check the exact predicate. Cost is O(|P| + |I|·w/bucket + matches):
  * linear scans, one shuffle on a well-distributed integer key, AQE-
  * splittable if one bucket runs hot. The classic trade-off applies —
  * `bucketWidth` should be near the typical interval width (too small
  * explodes intervals onto many buckets, too large floods each bucket
  * with non-matching candidates).
  */
object RangeJoin {

  /** @param points    DataFrame with `valueCol` (numeric)
    * @param intervals DataFrame with `loCol`/`hiCol` (numeric, lo <= hi)
    * @return all (point row ++ interval row) pairs with lo <= v <= hi */
  def pointsInIntervals(points: DataFrame, intervals: DataFrame,
                        valueCol: String, loCol: String, hiCol: String,
                        bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val p = points.withColumn("__bucket",
      floor(col(valueCol) / bucketWidth).cast("long"))
    // sequence() is bounded by the interval's own span: an interval
    // covering b buckets emits b fragments, so total fragments stay
    // O(|I| · avgWidth/bucketWidth) — no data-independent blow-up.
    val i = intervals.withColumn("__bucket",
      explode(sequence(floor(col(loCol) / bucketWidth).cast("long"),
                       floor(col(hiCol) / bucketWidth).cast("long"))))
    p.join(i, Seq("__bucket"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol))
      .drop("__bucket")
  }

  /** Interval×interval overlap join: all (left, right) row pairs with
    * `lLo <= rHi AND rLo <= lHi` — the two-sided generalization of
    * [[pointsInIntervals]], same bucket quantization, still no cartesian.
    *
    * Both sides explode onto their covering buckets; a pair overlapping
    * across several shared buckets would match in each of them, so the
    * pair is emitted only in its RESPONSIBLE bucket — the one containing
    * max(lLo, rLo), the overlap's left edge, which both fragments cover
    * by construction. Exactly-once emission is a cheap per-row condition,
    * never a distinct() shuffle over the match set.
    *
    * Column names must be disjoint across the two inputs (rename before
    * joining, as with every join here). */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
                          lLo: String, lHi: String, rLo: String, rHi: String,
                          bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    def frag(df: DataFrame, lo: String, hi: String) =
      df.withColumn("__bucket",
        explode(sequence(floor(col(lo) / bucketWidth).cast("long"),
                         floor(col(hi) / bucketWidth).cast("long"))))
    frag(left, lLo, lHi).join(frag(right, rLo, rHi), Seq("__bucket"))
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi))
      .filter(floor(greatest(col(lLo), col(rLo)) / bucketWidth).cast("long")
        === col("__bucket"))
      .drop("__bucket")
  }
}
