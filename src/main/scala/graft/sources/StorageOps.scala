package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, FileUtil, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage operators (SURVEY §2.2, S1-S11) over Hadoop FileSystem — the
  * same API that fronts S3/HDFS/local on a real cluster.
  *
  * Single-file ops are driver-side conveniences; the operators that matter
  * at 100 TB are the table-valued ones:
  *  - `listing` turns a storage prefix into a DataFrame (path/size/mtime)
  *    so existence checks become anti-joins instead of per-file HEADs
  *    (the reference's inventory pattern, G7);
  *  - `distributedCopy` fans a file manifest out over executors with
  *    foreachPartition — per-partition FileSystem clients, no driver
  *    bottleneck (Y12's foreachPar, Spark-shaped). Idempotent: an
  *    exists-guard skips files already at the destination.
  */
object StorageOps {

  private def fs(path: String, conf: Configuration): FileSystem =
    new HPath(path).getFileSystem(conf)

  // ---- S1/S2/S3/S7/S9: single-file ops ----

  def writeFile(path: String, bytes: Array[Byte], conf: Configuration = new Configuration()): Unit = {
    val out = fs(path, conf).create(new HPath(path), true)
    try out.write(bytes) finally out.close()
  }

  def readFile(path: String, conf: Configuration = new Configuration()): Array[Byte] = {
    val f = fs(path, conf)
    val len = f.getFileStatus(new HPath(path)).getLen
    require(len <= Int.MaxValue,
      s"readFile is a driver-side convenience capped at 2 GiB; $path is $len bytes")
    val in = f.open(new HPath(path))
    try {
      val buf = new Array[Byte](len.toInt)
      in.readFully(buf); buf
    } finally in.close()
  }

  def fileExists(path: String, conf: Configuration = new Configuration()): Boolean =
    fs(path, conf).exists(new HPath(path))

  def deleteFile(path: String, conf: Configuration = new Configuration()): Boolean =
    fs(path, conf).delete(new HPath(path), false)

  def stat(path: String, conf: Configuration = new Configuration()): Option[(Long, Long)] = {
    val f = fs(path, conf)
    val p = new HPath(path)
    if (f.exists(p)) { val st = f.getFileStatus(p); Some((st.getLen, st.getModificationTime)) }
    else None
  }

  // ---- S4/S9/S11: listings as DataFrames ----

  /** Recursive listing of a prefix as (path, size_bytes, mtime_ms) —
    * DISTRIBUTED: the driver reads ONE non-recursive page of the root
    * (O(direct children)); every child directory becomes a prefix listed
    * recursively by an EXECUTOR task (the S3-inventory prefix fan-out).
    * A million-object tree never materializes on the driver — rows flow
    * from executor listings straight into the downstream join/aggregate. */
  def listing(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val f = fs(root, conf)
    val rootPath = new HPath(root)
    if (!f.exists(rootPath))
      return Seq.empty[(String, Long, Long)].toDF("path", "size_bytes", "mtime_ms")
    val top = f.listStatus(rootPath)
    // paths are emitted FULLY QUALIFIED (scheme + authority): stripping
    // to the bare key made two buckets indistinguishable and broke every
    // anti-join against manifest URIs — and a bare key handed to a
    // FileSystem client resolves against the DEFAULT fs, not the listed one
    val rootFiles = top.filter(_.isFile)
      .map(st => (st.getPath.toString, st.getLen, st.getModificationTime)).toSeq
    val prefixes = top.filter(_.isDirectory).map(_.getPath.toString).toSeq
    val confSer = new org.apache.spark.util.SerializableConfiguration(conf)
    val prefixListing =
      if (prefixes.isEmpty) Seq.empty[(String, Long, Long)].toDS()
      else spark.createDataset(prefixes)
        .repartition(prefixes.size) // one prefix per task: listings run in parallel
        .mapPartitions { ps =>
          val c = confSer.value
          ps.flatMap { prefix =>
            val p = new HPath(prefix)
            val pfs = p.getFileSystem(c)
            val it = pfs.listFiles(p, true)
            new Iterator[(String, Long, Long)] {
              private var nextSt: Option[(String, Long, Long)] = advance()
              private def advance(): Option[(String, Long, Long)] = {
                while (it.hasNext) {
                  val st = it.next()
                  if (st.isFile)
                    return Some((st.getPath.toString, st.getLen, st.getModificationTime))
                }
                None
              }
              def hasNext: Boolean = nextSt.isDefined
              def next(): (String, Long, Long) = {
                val r = nextSt.get; nextSt = advance(); r
              }
            }
          }
        }
    rootFiles.toDS().union(prefixListing).toDF("path", "size_bytes", "mtime_ms")
  }

  /** S11: storage stats in one aggregate. */
  def storageStats(spark: SparkSession, root: String): DataFrame =
    listing(spark, root).agg(
      count(lit(1)).as("file_cnt"),
      coalesce(sum(col("size_bytes")), lit(0L)).as("total_bytes"))

  // ---- S5/S6 + Y12: distributed manifest copy ----

  /** Copy every (srcPathCol, dstPathCol) row of `manifest` using executor-
    * side FileSystem clients. Returns copied count. Exists-guarded
    * (idempotent re-runs, reference SyncOrchestrator.scala:114-118).
    *
    * `tolerant = true` turns a per-file failure (e.g. vanished source)
    * into a skip instead of failing the whole job — callers that batch
    * many logical events into one manifest (the sync worker) derive
    * per-event success from [[existsProbe]] afterwards. */
  def distributedCopy(manifest: DataFrame, srcPathCol: String = "src_path",
                      dstPathCol: String = "dst_path", tolerant: Boolean = false): Long =
    distributedCopyStats(manifest, srcPathCol, dstPathCol, tolerant)._1

  /** [[distributedCopy]] with (filesCopied, bytesCopied) accounting (E3 /
    * S6 progress metrics come from these accumulators). */
  def distributedCopyStats(manifest: DataFrame, srcPathCol: String = "src_path",
                           dstPathCol: String = "dst_path",
                           tolerant: Boolean = false): (Long, Long) = {
    val spark = manifest.sparkSession
    val confSer = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val copied = spark.sparkContext.longAccumulator("files_copied")
    val bytes = spark.sparkContext.longAccumulator("bytes_copied")
    manifest.select(col(srcPathCol), col(dstPathCol)).foreachPartition {
      rows: Iterator[org.apache.spark.sql.Row] =>
        val conf = confSer.value
        rows.foreach { r =>
          try {
            val src = new HPath(r.getString(0))
            val dst = new HPath(r.getString(1))
            val dstFs = dst.getFileSystem(conf)
            val srcFs = src.getFileSystem(conf)
            // the exists-guard also re-copies a SIZE-MISMATCHED dst: a
            // crash mid-copy used to leave a truncated dst that the
            // guard then treated as done — permanent silent corruption
            val srcLen = srcFs.getFileStatus(src).getLen
            val stale = dstFs.exists(dst) && dstFs.getFileStatus(dst).getLen != srcLen
            if (stale) dstFs.delete(dst, false)
            if (stale || !dstFs.exists(dst)) {
              dstFs.mkdirs(dst.getParent)
              // write to a temp sibling and rename: dst is either absent
              // or COMPLETE, never a partial file another worker's
              // exists-guard would wrongly trust
              val tmp = new HPath(dst.getParent,
                s"._tmp_${dst.getName}.${java.util.UUID.randomUUID()}")
              val renamed =
                try {
                  FileUtil.copy(srcFs, src, dstFs, tmp, false, conf)
                  val ok = dstFs.rename(tmp, dst)
                  if (!ok && !dstFs.exists(dst))
                    throw new java.io.IOException(s"rename $tmp -> $dst failed")
                  ok
                } finally { if (dstFs.exists(tmp)) dstFs.delete(tmp, false): Unit }
              // a lost rename race (speculative task, retry) means the
              // OTHER worker owns the copy — counting it here would
              // double the files/bytes metrics
              if (renamed) { copied.add(1); bytes.add(srcLen) }
            }
          } catch { case e: Exception => if (!tolerant) throw e }
        }
    }
    (copied.value, bytes.value)
  }

  /** Distributed existence probe: one boolean per manifest row, evaluated
    * with executor-side FileSystem clients (no driver HEAD loop). The
    * string `keyCol` rides along for downstream per-group verdicts. */
  /** Copy verification: for each manifest row, `ok` = dst exists AND its
    * length equals src's — existence alone would bless a truncated file
    * (see the temp+rename note in distributedCopyStats; this probe is
    * the belt to that suspender, and also catches pre-existing partial
    * files). One distributed pass, two stats per row. */
  def copyVerifyProbe(manifest: DataFrame, srcPathCol: String = "src_path",
                      dstPathCol: String = "dst_path",
                      keyCol: String = "event_id"): DataFrame = {
    val spark = manifest.sparkSession
    import spark.implicits._
    val confSer = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    manifest.select(col(keyCol).cast("string"), col(srcPathCol), col(dstPathCol))
      .as[(String, String, String)]
      .mapPartitions { rows =>
        val conf = confSer.value
        rows.map { case (key, s0, d0) =>
          val d = new HPath(d0)
          val fs = d.getFileSystem(conf)
          val ok = try {
            fs.exists(d) && {
              val s = new HPath(s0)
              s.getFileSystem(conf).getFileStatus(s).getLen == fs.getFileStatus(d).getLen
            }
          } catch { case _: Exception => false }
          (key, d0, ok)
        }
      }.toDF(keyCol, dstPathCol, "ok")
  }

  def existsProbe(manifest: DataFrame, pathCol: String = "dst_path",
                  keyCol: String = "event_id"): DataFrame = {
    val spark = manifest.sparkSession
    import spark.implicits._
    val confSer = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    manifest.select(col(keyCol).cast("string"), col(pathCol)).as[(String, String)]
      .mapPartitions { rows =>
        val conf = confSer.value
        rows.map { case (key, p0) =>
          // per-row tolerance (same as copyVerifyProbe): one malformed
          // path must yield exists=false, not fail the whole probe job
          val ex = try {
            val p = new HPath(p0)
            p.getFileSystem(conf).exists(p)
          } catch { case _: Exception => false }
          (key, p0, ex)
        }
      }.toDF(keyCol, pathCol, "exists")
  }
}
