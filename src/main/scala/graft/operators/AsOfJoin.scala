package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for each left row, attach the single right row
  * with the greatest `rightTime <= leftTime` in the same key group — the
  * point-in-time lookup every event/metrics pipeline needs (reference
  * semantics: the read router resolves "state as of this read" the same
  * way, modules/domain TableMetadata version resolution).
  *
  * Implementation is the scalable union-scan form, NOT a per-key
  * subquery: tag both sides, union, and take a running
  * `last(right_payload, ignoreNulls)` over one (key, time)-sorted window.
  *
  *  - ONE shuffle, on the key — identical to what any equi-join would pay.
  *  - No range explosion: a naive `l JOIN r ON key AND r.t <= l.t` builds
  *    O(|L|·|R|) intermediate rows per key before the argmax; this carries
  *    one running value per partition stream instead, so a key with a
  *    million rows costs a sort, not a quadratic join.
  *  - The window frame is rowsBetween(unboundedPreceding, currentRow) on
  *    an ascending sort — Spark's WindowExec streams it with O(1) state
  *    per row (no frame rescans).
  *
  * Tie semantics: a right row exactly at `leftTime` matches (at-or-
  * before). Multiple right rows on the same (key, time) resolve to the
  * largest payload struct (deterministic, order-insensitive).
  */
object AsOfJoin {

  /** @param rightPayload right columns carried onto each left row,
    *                      emitted as `{prefix}{col}` (null when no right
    *                      row is at-or-before the left row — left-outer
    *                      semantics). `rightTime` is implicitly carried
    *                      as `{prefix}{rightTime}`. */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String,
           rightPayload: Seq[String], prefix: String = "asof_"): DataFrame = {
    val payload = (rightTime +: rightPayload.filterNot(_ == rightTime))
    val keyCols = keys.map(col)

    // left rows keep their full row as a struct so no column set is
    // assumed; right rows carry only key + time + payload.
    // a right row with a NULL time (or one whose cast fails) can never
    // be "at or before" anything — without this filter it sorts FIRST
    // (nulls-first asc) and fabricates a match for left rows that should
    // get left-outer nulls
    val taggedRight = right.select(
      keyCols :+ col(rightTime).cast("timestamp").as("__t") :+
        lit(1).as("__is_right") :+
        struct(payload.map(col): _*).as("__r") :+
        lit(null).cast(structType(left)).as("__l"): _*)
      .where(col("__t").isNotNull)
    val taggedLeft = left.select(
      keyCols :+ col(leftTime).cast("timestamp").as("__t") :+
        lit(0).as("__is_right") :+
        lit(null).cast(taggedRight.schema("__r").dataType).as("__r") :+
        struct(left.columns.map(col): _*).as("__l"): _*)

    // right rows sort BEFORE left rows at an equal timestamp
    // (__is_right desc) so "at-or-before" includes exact matches; the
    // trailing __r sort makes same-(key,time) right rows deterministic.
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t").asc, col("__is_right").desc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = taggedRight.unionByName(taggedLeft)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__is_right") === 0)

    val leftCols = left.columns.map(c => col(s"__l.$c").as(c))
    val asofCols = payload.map(c => col(s"__asof.$c").as(s"$prefix$c"))
    matched.select(leftCols ++ asofCols: _*)
  }

  /** Nearest-event join: each left row pairs with the right row whose
    * time is CLOSEST in EITHER direction (pandas merge_asof
    * direction='nearest'). Same union-scan shape as [[asOf]] — ONE
    * shuffle on the key, then TWO frames over the same sorted partition
    * stream (running last = at-or-before, running first = strictly
    * after; both stream with O(1) state off one sort), and a per-row
    * pick of the smaller |Δ|.
    *
    * Ties: equal |Δ| resolves to the at-or-before row. Multiple right
    * rows on the same (key, time) resolve to the largest payload struct
    * on the before side and the smallest on the after side (each
    * window's deterministic pick). */
  def asOfNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTime: String, rightTime: String,
                  rightPayload: Seq[String], prefix: String = "nearest_"): DataFrame = {
    val payload = (rightTime +: rightPayload.filterNot(_ == rightTime))
    val keyCols = keys.map(col)
    val taggedRight = right.select(
      keyCols :+ col(rightTime).cast("timestamp").as("__t") :+
        lit(1).as("__is_right") :+
        struct(payload.map(col): _*).as("__r") :+
        lit(null).cast(structType(left)).as("__l"): _*)
      .where(col("__t").isNotNull)
    val taggedLeft = left.select(
      keyCols :+ col(leftTime).cast("timestamp").as("__t") :+
        lit(0).as("__is_right") :+
        lit(null).cast(taggedRight.schema("__r").dataType).as("__r") :+
        struct(left.columns.map(col): _*).as("__l"): _*)

    val wPrev = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t").asc, col("__is_right").desc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the forward carry is a running `last` over the DESCENDING sort —
    // never a [currentRow, unboundedFollowing] frame, which Spark's
    // WindowExec evaluates by rescanning to the partition end per row
    // (O(n²) in a hot key group). Two sorts over ONE exchange instead.
    // At an equal __t the left row sorts BEFORE rights here
    // (__is_right asc), so same-ts rights stay out of the forward carry
    // — they belong to the backward side (Δ = 0 wins every tie anyway).
    val wNext = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t").desc, col("__is_right").asc, col("__r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val lt = unix_micros(col("__t"))
    val dPrev = lt - unix_micros(col(s"__prev.$rightTime").cast("timestamp"))
    val dNext = unix_micros(col(s"__next.$rightTime").cast("timestamp")) - lt
    val takePrev = col("__next").isNull ||
      (col("__prev").isNotNull && dPrev <= dNext)

    val matched = taggedRight.unionByName(taggedLeft)
      .withColumn("__prev", last(col("__r"), ignoreNulls = true).over(wPrev))
      .withColumn("__next", last(col("__r"), ignoreNulls = true).over(wNext))
      .filter(col("__is_right") === 0)
      .withColumn("__pick", when(takePrev, col("__prev")).otherwise(col("__next")))

    val leftCols = left.columns.map(c => col(s"__l.$c").as(c))
    val nearestCols = payload.map(c => col(s"__pick.$c").as(s"$prefix$c"))
    matched.select(leftCols ++ nearestCols: _*)
  }

  /** [[asOf]] as a first-class Catalyst operator: builds the custom
    * AsOfJoinNode logical plan (plans/AsOfJoinPlan.scala) and lets the
    * injected AsOfJoinStrategy plan the physical sort-merge — two
    * co-partitioned exchanges, two sorts, one O(1)-state streaming merge
    * per partition. Same signature, output schema, and row semantics as
    * [[asOf]] (property-checked equal in OperatorsSpec); requires the
    * session to carry graft.functions.GraftExtensions. */
  def asOfExec(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               rightPayload: Seq[String], prefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "asOfExec needs at least one key column " +
      "(a keyless as-of would cluster everything into one partition)")
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val spark = left.sparkSession
    val resolver = spark.sessionState.analyzer.resolver
    val lPlan = ColumnBridge.analyzed(left)
    // same null-time contract as the window form (see asOf)
    val rightNonNullTime = right.filter(org.apache.spark.sql.functions.col(rightTime).isNotNull)
    // a self-join (left and right reading the same source) would put the
    // same exprIds on both sides of the node; re-aliasing the right
    // output mints fresh ids (what the analyzer's DeduplicateRelations
    // does for built-in joins — our node builds on analyzed children, so
    // it must do this itself)
    val rPlan0 = ColumnBridge.analyzed(rightNonNullTime)
    val rPlan = org.apache.spark.sql.catalyst.plans.logical.Project(
      rPlan0.output.map(a => org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()), rPlan0)
    def attr(out: Seq[org.apache.spark.sql.catalyst.expressions.Attribute], name: String, side: String) =
      out.filter(a => resolver(a.name, name)) match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(s"$side column '$name' not found")
        case many => throw new IllegalArgumentException(s"$side column '$name' ambiguous: $many")
      }
    val rOut = rPlan.projectList.map(_.toAttribute)
    // dedup with the session resolver, not ==: under the default
    // case-insensitive resolution "TS" and "ts" are the same column
    val payloadNames = rightTime +: rightPayload.filterNot(resolver(_, rightTime))
    val payloadAttrs = payloadNames.map(attr(rOut, _, "right"))
    // the right side sorts by (keys, time, payload) for deterministic
    // same-timestamp resolution — every payload column must be orderable
    // (the window form has the identical constraint through its struct
    // sort; fail at construction, not deep inside planning)
    payloadAttrs.find(a => !org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(a.dataType))
      .foreach(a => throw new IllegalArgumentException(
        s"payload column '${a.name}' has non-orderable type ${a.dataType.simpleString}; " +
        "wrap or drop it (deterministic tie-breaking sorts the payload)"))
    val payloadOut = payloadAttrs.map(a =>
      AttributeReference(prefix + a.name, a.dataType, nullable = true)())
    val lKeys = keys.map(attr(lPlan.output, _, "left"))
    val rKeys = keys.map(attr(rOut, _, "right"))
    val lTime = attr(lPlan.output, leftTime, "left")
    val rTime = attr(rOut, rightTime, "right")
    // the exec hashes and compares each side with the LEFT types — a
    // left INT key against a right BIGINT key would hash-partition the
    // same value to different partitions and compare garbage. The window
    // form widens via its union; here mismatches must fail loudly (cast
    // the inputs explicitly instead).
    lKeys.zip(rKeys).find { case (l, r) => l.dataType != r.dataType }.foreach { case (l, r) =>
      throw new IllegalArgumentException(
        s"key type mismatch: left '${l.name}' ${l.dataType.simpleString} vs " +
        s"right '${r.name}' ${r.dataType.simpleString}; cast one side first") }
    if (lTime.dataType != rTime.dataType)
      throw new IllegalArgumentException(
        s"time type mismatch: left '${lTime.name}' ${lTime.dataType.simpleString} vs " +
        s"right '${rTime.name}' ${rTime.dataType.simpleString}; cast one side first")
    val node = graft.plans.AsOfJoinNode(
      lPlan, rPlan, lKeys, rKeys, lTime, rTime, payloadAttrs, payloadOut)
    ColumnBridge.ofRows(spark, node)
  }

  private def structType(df: DataFrame) =
    org.apache.spark.sql.types.StructType(df.schema.fields)
}
