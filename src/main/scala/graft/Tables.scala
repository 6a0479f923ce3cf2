package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata (TESTDATA.md).
  *
  * All engine queries take a `sfDir` (scale-factor directory) so the same
  * code runs at sf0.001 (smoke), sf0.01 (correctness) and sf0.1 (bench) —
  * and, unchanged, against a 100 TB warehouse directory on a real cluster:
  * nothing here hardcodes data volume, and every reader is a plain columnar
  * Parquet scan that Catalyst can push filters/projections into.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.parquet has shipped `ts` two ways across testdata generations:
    * TIMESTAMP(NANOS) — which Spark's vectorized Parquet reader rejects, so
    * it is read as a nanosecond long (legacy conf) and converted — and
    * plain TIMESTAMP[us], which needs only a cast from NTZ to the session
    * (UTC) TimestampType. Dispatch on the loaded dtype so either layout
    * yields the same microsecond TimestampType column; both paths are a
    * single codegen'd projection.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val raw = load(s, d, "events")
    val tsCol =
      if (raw.schema("ts").dataType == LongType)
        timestamp_micros(expr("ts div 1000")) // nanos-as-long generation
      else col("ts").cast("timestamp")        // native timestamp generation
    raw.withColumn("ts", tsCol)
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view (for spark.sql-based entry
    * points). `events` goes through its nanos-safe loader. */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, sfDir) else load(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }
}
