package graft.catalog

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned-table catalog over Parquet — the Spark-native reproduction of
  * the reference's catalog/commit surface (SURVEY §2.1: C1-C14).
  *
  * The reference deploys Iceberg+Nessie; this environment ships no Iceberg
  * jars, so graft implements the same *semantics* directly:
  *  - a table = a directory of immutable Parquet data files plus an
  *    append-only JSON commit log (`_meta/vNNNNN.json`), one file per
  *    version — the Iceberg metadata-file pattern;
  *  - commits are optimistic CAS: the new version file is staged under a
  *    temp name and published with an atomic rename; a concurrent commit
  *    to the same version loses the rename and retries on a fresh version
  *    number (Iceberg's commit loop, C12);
  *  - reads resolve a version (latest, by sequence, or by commit id) to
  *    its file list and hand Spark exactly those files — time travel
  *    (`VERSION AS OF`, C1), incremental diff reads (Y14) and history
  *    scans (C9/C11) all fall out of the log.
  *
  * Scale notes: data files are written by Spark executors (distributed);
  * only the tiny JSON log touches the driver — same division of labor as
  * Iceberg. File lists ride in the log as relative paths; at real scale
  * the log would page into manifest Parquet files (the `t.files` pattern
  * queried by SnapshotDiff/GcPlanner operators).
  */
final class GraftCatalog(val spark: SparkSession, val warehouse: String) {

  case class Snapshot(seq: Long, commitId: String, parentId: Option[String],
                      timestampMs: Long, files: Seq[String], sourceRegion: String,
                      fileSizes: Seq[Long] = Seq.empty) {
    def fileEntries: Seq[(String, Long)] =
      files.zipAll(fileSizes, "", -1L).filter(_._1.nonEmpty)
  }

  private def tableDir(ns: String, name: String): Path = Paths.get(warehouse, ns, name)
  private def metaDir(ns: String, name: String): Path = tableDir(ns, name).resolve("_meta")
  private def dataDir(ns: String, name: String): Path = tableDir(ns, name).resolve("data")

  // ---- DDL (C4, C5, C6) ----

  def createTable(ns: String, name: String): Unit = {
    Files.createDirectories(metaDir(ns, name))
    Files.createDirectories(dataDir(ns, name))
  }

  def dropTable(ns: String, name: String): Unit = {
    def rm(p: Path): Unit = {
      if (Files.isDirectory(p)) Files.list(p).iterator().asScala.foreach(rm)
      Files.deleteIfExists(p)
    }
    rm(tableDir(ns, name))
    // a re-created table restarts at v0 on the same paths — drop any
    // cached snapshots under this table's meta dir
    val prefix = metaDir(ns, name).toAbsolutePath
    snapshotCache.keySet.removeIf(_.startsWith(prefix))
  }

  def tableExists(ns: String, name: String): Boolean =
    Files.isDirectory(metaDir(ns, name))

  def listTables(ns: String): Seq[String] = {
    val p = Paths.get(warehouse, ns)
    if (!Files.isDirectory(p)) Seq.empty
    else Files.list(p).iterator().asScala.map(_.getFileName.toString).toSeq.sorted
  }

  /** C7: offset/limit pagination over the (sorted) namespace listing. */
  def listTablesPaginated(ns: String, offset: Int, pageSize: Int): Seq[String] =
    listTables(ns).slice(offset, offset + pageSize)

  /** C8: streaming namespace listing — a lazy iterator that pulls
    * directory entries on demand instead of materializing the namespace
    * (the reference's listTablesStream; the token-paginated form is
    * operators.Pagination). Unordered, like a storage LIST. */
  def listTablesStream(ns: String): Iterator[String] = {
    val p = Paths.get(warehouse, ns)
    if (!Files.isDirectory(p)) Iterator.empty
    else Files.list(p).iterator().asScala.map(_.getFileName.toString)
  }

  // jittered exponential backoff between CAS retries (the reference's
  // commit envelope: retries with jitter — losing committers must spread
  // out instead of re-colliding in lockstep under hot contention).
  private def backoff(attempt: Int): Unit =
    Thread.sleep(scala.util.Random.nextInt(1 << math.min(attempt + 2, 8)).toLong)

  // ---- commit log ----

  private def versionFile(ns: String, name: String, seq: Long): Path =
    metaDir(ns, name).resolve(f"v$seq%06d.json")

  private def writeJson(s: Snapshot): String = {
    def q(x: String) = "\"" + x.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    s"""{"seq":${s.seq},"commitId":${q(s.commitId)},""" +
      s""""parentId":${s.parentId.map(q).getOrElse("null")},""" +
      s""""timestampMs":${s.timestampMs},"sourceRegion":${q(s.sourceRegion)},""" +
      s""""fileSizes":[${s.fileSizes.mkString(",")}],""" +
      s""""files":[${s.files.map(q).mkString(",")}]}"""
  }

  // Real JSON parsing (Jackson, already on Spark's classpath) — the
  // writer escapes quotes/backslashes, so paths containing `"`, `,` or
  // `]` must survive a round trip; a regex tokenizer cannot unescape.
  private val jsonMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def parseJson(j: String): Snapshot = {
    val n = jsonMapper.readTree(j)
    Snapshot(
      n.get("seq").asLong(),
      n.get("commitId").asText(),
      Option(n.get("parentId")).filterNot(_.isNull).map(_.asText()),
      n.get("timestampMs").asLong(),
      n.get("files").elements().asScala.map(_.asText()).toSeq,
      Option(n.get("sourceRegion")).map(_.asText()).getOrElse(""),
      Option(n.get("fileSizes")).map(_.elements().asScala.map(_.asLong()).toSeq)
        .getOrElse(Seq.empty))
  }

  // Published version files are immutable (hard-link create-if-absent), so
  // parsed snapshots cache by path forever; without this every commit's
  // CAS loop re-reads the whole log — O(V²) parses across a table's life.
  private val snapshotCache =
    new java.util.concurrent.ConcurrentHashMap[Path, Snapshot]()

  /** C9/C11: snapshots ordered by sequence. */
  def snapshots(ns: String, name: String): Seq[Snapshot] = {
    val md = metaDir(ns, name)
    if (!Files.isDirectory(md)) return Seq.empty
    Files.list(md).iterator().asScala
      .filter(_.getFileName.toString.matches("v\\d+\\.json"))
      .map(p => snapshotCache.computeIfAbsent(p.toAbsolutePath, ap =>
        parseJson(new String(Files.readAllBytes(ap), StandardCharsets.UTF_8))))
      .toSeq.sortBy(_.seq)
  }

  /** C2 / C1. */
  def latest(ns: String, name: String): Option[Snapshot] = snapshots(ns, name).lastOption
  def byCommitId(ns: String, name: String, commitId: String): Option[Snapshot] =
    snapshots(ns, name).find(_.commitId == commitId)

  /** C3/C12: append `df` as a new version with optimistic CAS on the
    * version number. Data files land distributed (executor writes); the
    * atomic rename of the version JSON is the commit point. */
  def commitAppend(ns: String, name: String, df: DataFrame,
                   sourceRegion: String = "local", maxRetries: Int = 5): Snapshot = {
    require(tableExists(ns, name), s"no such table $ns.$name")
    // 1. write data files (distributed, outside the commit critical section)
    val stagingId = UUID.randomUUID().toString.take(8)
    val outDir = dataDir(ns, name).resolve(stagingId)
    df.write.parquet(outDir.toString)
    val newFiles = Files.list(outDir).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".parquet"))
      .map(f => s"data/$stagingId/$f").toSeq.sorted
    val newSizes = newFiles.map(f => Files.size(tableDir(ns, name).resolve(f)))
    // 2. CAS loop on the version number
    var attempt = 0
    while (attempt < maxRetries) {
      val parent = latest(ns, name)
      val seq = parent.map(_.seq + 1).getOrElse(0L)
      val snap = Snapshot(seq, s"commit-${UUID.randomUUID()}", parent.map(_.commitId),
        System.currentTimeMillis(), parent.map(_.files).getOrElse(Seq.empty) ++ newFiles,
        sourceRegion,
        parent.map(_.fileSizes).getOrElse(Seq.empty) ++ newSizes)
      val tmp = metaDir(ns, name).resolve(s".tmp-${UUID.randomUUID()}.json")
      Files.write(tmp, writeJson(snap).getBytes(StandardCharsets.UTF_8))
      try {
        // atomic create-if-absent publish: a hard link FAILS if the target
        // exists (POSIX rename would silently overwrite a concurrent
        // winner). On an object store this becomes a conditional PUT /
        // If-None-Match — same CAS contract.
        Files.createLink(versionFile(ns, name, seq), tmp)
        Files.deleteIfExists(tmp)
        return snap
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp)
          attempt += 1 // lost the race — re-read parent and retry (C12)
          backoff(attempt)
      }
    }
    throw new IllegalStateException(s"commit conflict after $maxRetries retries on $ns.$name")
  }

  /** Overwrite commit: the new version references ONLY the files written
    * from `df` (previous files become unreachable → reclaimed by
    * expireSnapshots). Used by compaction. */
  def commitReplace(ns: String, name: String, df: DataFrame,
                    sourceRegion: String = "local", maxRetries: Int = 5): Snapshot = {
    require(tableExists(ns, name), s"no such table $ns.$name")
    val stagingId = UUID.randomUUID().toString.take(8)
    val outDir = dataDir(ns, name).resolve(stagingId)
    df.write.parquet(outDir.toString)
    val newFiles = Files.list(outDir).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".parquet"))
      .map(f => s"data/$stagingId/$f").toSeq.sorted
    val newSizes = newFiles.map(f => Files.size(tableDir(ns, name).resolve(f)))
    var attempt = 0
    while (attempt < maxRetries) {
      val parent = latest(ns, name)
      val seq = parent.map(_.seq + 1).getOrElse(0L)
      val snap = Snapshot(seq, s"commit-${UUID.randomUUID()}", parent.map(_.commitId),
        System.currentTimeMillis(), newFiles, sourceRegion, newSizes)
      val tmp = metaDir(ns, name).resolve(s".tmp-${UUID.randomUUID()}.json")
      Files.write(tmp, writeJson(snap).getBytes(StandardCharsets.UTF_8))
      try {
        Files.createLink(versionFile(ns, name, seq), tmp)
        Files.deleteIfExists(tmp)
        return snap
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp); attempt += 1; backoff(attempt)
      }
    }
    throw new IllegalStateException(s"commit conflict after $maxRetries retries on $ns.$name")
  }

  /** Bin-pack compaction (the reference docs' small-file control,
    * 256MB–1GB targets; rewriteDataFiles in Iceberg terms): rewrite the
    * current version into ceil(totalBytes / targetBytes) files via one
    * distributed repartition, committed as an overwrite. Old files stay
    * reachable from old versions until expireSnapshots reclaims them. */
  def compact(ns: String, name: String, targetFileBytes: Long): Snapshot = {
    val cur = latest(ns, name)
      .getOrElse(throw new IllegalStateException(s"nothing to compact in $ns.$name"))
    val totalBytes = math.max(1L, cur.fileSizes.sum)
    val parts = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    commitReplace(ns, name, read(ns, name).repartition(parts))
  }

  /** Replica-side commit (sync DAG t6_cas_commit_replica): register files
    * that already landed under the table dir (copied by the sync engine)
    * as a new version — same CAS loop, no data write. */
  def commitFiles(ns: String, name: String, newFiles: Seq[String],
                  sourceRegion: String, maxRetries: Int = 5): Snapshot = {
    require(tableExists(ns, name), s"no such table $ns.$name")
    var attempt = 0
    while (attempt < maxRetries) {
      val parent = latest(ns, name)
      val seq = parent.map(_.seq + 1).getOrElse(0L)
      val parentEntries = parent.map(_.fileEntries).getOrElse(Seq.empty)
      val landedEntries = newFiles.filterNot(parentEntries.map(_._1).contains)
        .map(f => f -> Files.size(tableDir(ns, name).resolve(f)))
      val allEntries = parentEntries ++ landedEntries
      val snap = Snapshot(seq, s"commit-${UUID.randomUUID()}", parent.map(_.commitId),
        System.currentTimeMillis(), allEntries.map(_._1), sourceRegion,
        allEntries.map(_._2))
      val tmp = metaDir(ns, name).resolve(s".tmp-${UUID.randomUUID()}.json")
      Files.write(tmp, writeJson(snap).getBytes(StandardCharsets.UTF_8))
      try {
        Files.createLink(versionFile(ns, name, seq), tmp)
        Files.deleteIfExists(tmp)
        return snap
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp); attempt += 1; backoff(attempt)
      }
    }
    throw new IllegalStateException(s"commit conflict after $maxRetries retries on $ns.$name")
  }

  def tablePath(ns: String, name: String): Path = tableDir(ns, name)

  // ---- visibility (C13: shadow→visible promotion) ----
  // Replica-side commits land as SHADOW versions; readers that ask for the
  // published view only see versions at or below the promoted floor
  // (reference setVisibility, used by StateReconciler.java:79 after the
  // verification join passes). The marker is a single JSON file updated
  // with the same atomic-publish pattern.

  private def publishedFile(ns: String, name: String): Path =
    metaDir(ns, name).resolve("published.json")

  /** Promote versions up to `seq`, effective at `visibleAtMs`. */
  def setVisibility(ns: String, name: String, seq: Long, visibleAtMs: Long): Unit = {
    val tmp = metaDir(ns, name).resolve(s".tmp-${UUID.randomUUID()}.json")
    Files.write(tmp, s"""{"publishedSeq":$seq,"visibleAtMs":$visibleAtMs}"""
      .getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, publishedFile(ns, name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Highest published version visible at `asOfMs` (None = nothing promoted). */
  def publishedSeq(ns: String, name: String, asOfMs: Long = Long.MaxValue): Option[Long] = {
    val pf = publishedFile(ns, name)
    if (!Files.exists(pf)) return None
    val j = new String(Files.readAllBytes(pf), StandardCharsets.UTF_8)
    val seq = """"publishedSeq":(\d+)""".r.findFirstMatchIn(j).map(_.group(1).toLong)
    val at = """"visibleAtMs":(\d+)""".r.findFirstMatchIn(j).map(_.group(1).toLong).getOrElse(0L)
    seq.filter(_ => at <= asOfMs)
  }

  /** Read the PUBLISHED view: latest promoted version, ignoring shadow
    * commits beyond the visibility floor. */
  def readVisible(ns: String, name: String, asOfMs: Long = Long.MaxValue): DataFrame =
    publishedSeq(ns, name, asOfMs) match {
      case Some(seq) => readVersion(ns, name, seq)
      case None      => spark.emptyDataFrame
    }

  // ---- reads ----

  private def readFiles(ns: String, name: String, files: Seq[String]): DataFrame =
    if (files.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(files.map(f => tableDir(ns, name).resolve(f).toString): _*)

  /** C2: current table state. */
  def read(ns: String, name: String): DataFrame =
    readFiles(ns, name, latest(ns, name).map(_.files).getOrElse(Seq.empty))

  /** C1: `VERSION AS OF seq` time travel. */
  def readVersion(ns: String, name: String, seq: Long): DataFrame = {
    val snap = snapshots(ns, name).find(_.seq == seq)
      .getOrElse(throw new IllegalArgumentException(s"no version $seq of $ns.$name"))
    readFiles(ns, name, snap.files)
  }

  /** Y14: incremental read — only rows in files ADDED in (fromSeq, toSeq]. */
  def readIncremental(ns: String, name: String, fromSeq: Long, toSeq: Long): DataFrame = {
    val snaps = snapshots(ns, name)
    val fromFiles = snaps.find(_.seq == fromSeq).map(_.files.toSet).getOrElse(Set.empty)
    val toFiles = snaps.find(_.seq == toSeq).map(_.files).getOrElse(Seq.empty)
    readFiles(ns, name, toFiles.filterNot(fromFiles))
  }

  /** History as a DataFrame (the `t.history` metadata-table pattern). */
  def history(ns: String, name: String): DataFrame = {
    import spark.implicits._
    snapshots(ns, name)
      .map(s => (s.seq, s.commitId, s.parentId.orNull, s.timestampMs, s.files.size, s.sourceRegion))
      .toDF("seq", "commit_id", "parent_id", "timestamp_ms", "file_cnt", "source_region")
  }

  /** Files metadata table (the `t.files` pattern driving diff/GC ops);
    * size_bytes is the AUTHORITATIVE size recorded at commit time — the
    * reconciliation operators compare live listings against it. */
  def filesTable(ns: String, name: String, seq: Long): DataFrame = {
    import spark.implicits._
    snapshots(ns, name).find(_.seq == seq).map(_.fileEntries).getOrElse(Seq.empty)
      .toDF("path", "size_bytes")
  }

  /** G1: expire old snapshots — drop version files below the keep floor,
    * then delete data files unreachable from any surviving version
    * (reachability set difference, the G2 primitive, driver-side here
    * because the log is small; the operator form is GcPlanner). */
  def expireSnapshots(ns: String, name: String, retainLast: Int): Seq[String] = {
    val snaps = snapshots(ns, name)
    if (snaps.size <= retainLast) return Seq.empty
    val (expired, kept) = snaps.splitAt(snaps.size - retainLast)
    val reachable = kept.flatMap(_.files).toSet
    val removable = expired.flatMap(_.files).filterNot(reachable).distinct
    expired.foreach(s => Files.deleteIfExists(versionFile(ns, name, s.seq)))
    removable.foreach(f => Files.deleteIfExists(tableDir(ns, name).resolve(f)))
    removable
  }
}
