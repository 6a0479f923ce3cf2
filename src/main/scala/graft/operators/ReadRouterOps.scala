package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Read routing: region scoring + watermark-consistency routing
  * (SURVEY Q1-Q4, Q9).
  *
  * Reference semantics reproduced exactly:
  *  - scoreRegion (modules/application/.../ReadRouter.scala:93-116):
  *    storageScore = 1.0 if storage reachable else 0.0;
  *    activityScore = 1.0 if region active else 0.3 (degraded, not zero —
  *    fallback still possible); final = storage*0.7 + activity*0.3.
  *  - selectOptimalRegion (:75-88): drop scores <= 0, take argmax.
  *  - v1 watermark routing (legacy/modules/app/.../ReadRouter.java:18-30):
  *    a replica ("CLOUD") may serve a snapshot iff
  *    requested.commitTs <= token.highWatermarkTs; PREFER_ONPREM always
  *    routes on-prem; PREFER_CLOUD / MEET_WATERMARK route cloud when ok.
  *
  * Spark-first: scoring is a scalar projection over a tiny regions frame
  * (broadcast everywhere it joins); argmax is orderBy+limit(1) which Spark
  * plans as TakeOrderedAndProject — no full sort. The watermark check is a
  * single codegen'd comparison joined against the consistency-token table.
  */
object ReadRouterOps {

  /** Weighted region scores. Input columns: region, storage_available
    * (bool), active (bool). Adds `score`. */
  def scoreRegions(regionHealth: DataFrame): DataFrame =
    regionHealth.withColumn("score",
      when(col("storage_available"), 1.0).otherwise(0.0) * 0.7 +
      when(col("active"), 1.0).otherwise(0.3) * 0.3)

  /** Argmax over positive scores; ties broken by region name for
    * determinism (the reference's maxByOption is list-order dependent). */
  def selectOptimal(regionHealth: DataFrame): DataFrame =
    scoreRegions(regionHealth)
      .filter(col("score") > 0.0)
      .orderBy(col("score").desc, col("region"))
      .limit(1)

  /** Driver-side twin of [[selectOptimal]] for the serving hot path: a
    * routed read scores the HANDFUL of regions hosting one table, and a
    * Spark job (plan + schedule + collect) per read costs tens of ms
    * for a 3-element argmax. Same arithmetic and tie-break, in-process;
    * spec-checked equal to the DataFrame form. The DataFrame form stays
    * for BATCH scoring (fleets of tables at once). */
  def selectOptimalLocal(health: Seq[(String, Boolean, Boolean)]): Option[(String, Double)] =
    health.map { case (region, storage, active) =>
      (region, (if (storage) 1.0 else 0.0) * 0.7 + (if (active) 1.0 else 0.3) * 0.3) }
      .filter(_._2 > 0.0)
      .sortBy { case (region, score) => (-score, region) }
      .headOption

  /** v1 watermark routing over a batch of read requests.
    * @param requests     one row per request with `requestedTsCol`
    * @param watermark    the table's consistency watermark (may be null)
    * @param policy       PREFER_CLOUD | PREFER_ONPREM | MEET_WATERMARK
    * Adds `target` ∈ {CLOUD, ONPREM}. */
  def routeByWatermark(requests: DataFrame, requestedTsCol: String,
                       watermark: Column, policy: String): DataFrame = {
    val cloudOk = watermark.isNotNull && col(requestedTsCol) <= watermark
    val target = policy match {
      case "PREFER_ONPREM" => lit("ONPREM")
      case _               => when(cloudOk, "CLOUD").otherwise("ONPREM")
    }
    requests.withColumn("target", target)
  }
}
