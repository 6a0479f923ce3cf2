package graft

import graft.operators.RegistryOps
import org.apache.spark.sql.functions._

/** Skew handling on a planted hot key: AQE's runtime skew-join split
  * (the first line of defense at 100 TB) and the explicit salted-join
  * fallback for skew AQE can't fix (e.g. one key so hot a single split
  * still straggles). */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // ~190k rows of one hot key with a fat payload vs a trickle of uniform
  // keys: the hot shuffle partition dwarfs the median by orders of
  // magnitude, which is exactly what AQE's skew detector keys on.
  private def skewedLeft = spark.range(200000)
    .select(
      when(col("id") % 20 =!= 0, lit(0L)).otherwise(col("id") % 100).as("key"),
      concat(lit("payload-"), lpad(col("id").cast("string"), 64, "x")).as("payload"))

  private def smallRight = spark.range(100)
    .select(col("id").as("key"), concat(lit("dim-"), col("id")).as("dim"))

  private def withConfs(confs: Seq[(String, String)])(body: => Unit): Unit = {
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits the planted skewed partition in a sort-merge join (skew=true in the final plan)") {
    withConfs(Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "16384",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")) {
      // execute THIS DataFrame (count() would spawn its own query
      // execution and leave joined's adaptive plan unfinalized); keep the
      // unique payload column so pruning can't shrink the hot partition's
      // shuffle bytes below the skew threshold
      val joined = skewedLeft.join(smallRight, "key")
      assert(joined.collect().length === 200000) // every key ∈ [0,100) matches the dim
      // after execution the adaptive plan is final: the SMJ must carry the
      // isSkewJoin marker, i.e. the hot partition was split at runtime
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected a skew-split sort-merge join in the final adaptive plan:\n$finalPlan")
    }
  }

  test("salted join spreads the hot key and matches the plain join's result") {
    // AQE off so partition sizes reflect the raw (key, salt) hash spread
    // rather than post-shuffle coalescing
    withConfs(Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")) {
      val plain = skewedLeft.join(smallRight, "key")
      val salted = RegistryOps.saltedJoin(skewedLeft, smallRight, "key", salts = 8)
      assert(salted.count() === plain.count())
      // same multiset of (key, dim) pairs
      val a = plain.groupBy("key", "dim").count().orderBy("key", "dim").collect()
      val b = salted.groupBy("key", "dim").count().orderBy("key", "dim").collect()
      assert(a.sameElements(b))
      // the hot key no longer lands in one task: with 8 salts no shuffle
      // partition of the salted join may hold the entire hot key
      val hot = 190000
      val sizes = salted.rdd.mapPartitions(it => Iterator(it.size)).collect()
      assert(sizes.max < hot,
        s"hot key must be split across salts (partition sizes: ${sizes.mkString(",")})")
    }
  }
}
