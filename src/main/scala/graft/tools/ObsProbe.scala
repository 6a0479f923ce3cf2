package graft.tools

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** One-off probe: does Dataset.localCheckpoint(eager) deliver Observation
  * metrics (i.e. does the checkpoint action run QueryExecutionListeners)?
  * Measurement tooling for the optimization round, not product surface. */
object ObsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var df = spark.range(100).withColumn("x", col("id") % 7)
    for (i <- 1 to 10) {
      val obs = Observation(s"probe$i")
      val t0 = System.nanoTime()
      val ck = df.observe(obs, sum(when(col("x") === 0, 1L).otherwise(0L)).as("hits"),
          count(lit(1)).as("n"))
        .localCheckpoint()
      val t1 = System.nanoTime()
      @volatile var got: Option[Map[String, Any]] = None
      val t = new Thread(() => { got = Some(obs.get) })
      t.setDaemon(true); t.start(); t.join(10000)
      val t2 = System.nanoTime()
      println(f"OBS_ROUND=$i ckpt=${(t1 - t0) / 1e6}%.1fms get=${(t2 - t1) / 1e6}%.1fms got=$got")
      df = ck
    }
    spark.stop()
  }
}
