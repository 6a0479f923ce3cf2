package graft.operators

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** E3: the counter/gauge metrics surface (reference MetricsPort —
  * incrementCounter / setGauge / snapshot).
  *
  * Driver-side registry; distributed stages feed it from Spark
  * accumulator results (e.g. StorageOps.distributedCopyStats returns the
  * copy totals that callers record here). `asDataFrame` exposes the
  * snapshot for SQL/joins, which is how the reference's dashboards
  * consume it.
  */
final class Metrics {

  private val counters = new ConcurrentHashMap[String, LongAdder]()
  private val gauges = new ConcurrentHashMap[String, Double]()

  def increment(name: String, delta: Long = 1L): Unit =
    counters.computeIfAbsent(name, _ => new LongAdder).add(delta)

  def counter(name: String): Long =
    Option(counters.get(name)).map(_.sum()).getOrElse(0L)

  def setGauge(name: String, value: Double): Unit = gauges.put(name, value)

  // gauges.get on a scala.Double-valued map unboxes a missing key's null
  // to 0.0 BEFORE Option wraps it — containsKey first, or every absent
  // gauge reads as a healthy Some(0.0)
  def gauge(name: String): Option[Double] =
    if (gauges.containsKey(name)) Some(gauges.get(name)) else None

  /** Point-in-time snapshot as (metric, kind, value). */
  def asDataFrame(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows =
      counters.asScala.toSeq.map { case (k, v) => (k, "counter", v.sum().toDouble) } ++
      gauges.asScala.toSeq.map { case (k, v) => (k, "gauge", v) }
    rows.sortBy(_._1).toDF("metric", "kind", "value")
  }
}
