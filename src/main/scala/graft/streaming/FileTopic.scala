package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka-shaped durable topic over append-only files — the external-queue
  * seam for E1 (reference stub: KafkaEventBusAdapter.java:7-16).
  *
  * Shape mirrors Kafka's contract, not its wire protocol:
  *  - a topic is a set of PARTITIONS; a record is (partition, offset,
  *    timestamp, key, value) with offsets dense and monotonic per
  *    partition; records are partitioned by key hash so one key's
  *    records stay totally ordered;
  *  - the producer appends SEGMENT files (one per flush, monotonically
  *    named) — never rewrites — so both the poll consumer and Spark's
  *    file streaming source see an immutable, replayable log;
  *  - consumers track progress as committed offsets per (group,
  *    partition), stored beside the log; delivery is at-least-once on
  *    redrive after a crash, exactly like a Kafka group rebalance.
  *
  * Single writer per partition (Kafka's broker-side invariant) — this
  * adapter is the local twin of a real broker, swap-compatible at the
  * call sites: `publish` matches EventBus's surface, `streamDF` feeds
  * SyncEventStream the same rows a kafka source would.
  */
final class FileTopic(root: String, topic: String, val partitions: Int = 4) {
  require(partitions >= 1, s"partitions=$partitions")

  private def partDir(p: Int): Path = Paths.get(root, topic, s"part=$p")
  private def offsetsDir: Path = Paths.get(root, topic, "_offsets")
  (0 until partitions).foreach(p => Files.createDirectories(partDir(p)))
  Files.createDirectories(offsetsDir)

  // next offset per partition, recovered from the log on open (a segment
  // file's name carries its base offset and record count)
  private val nextOffset: Array[AtomicLong] = Array.tabulate(partitions) { p =>
    new AtomicLong(segmentFiles(p).lastOption.map { f =>
      val (base, n) = FileTopic.segmentSpan(f)
      base + n
    }.getOrElse(0L))
  }
  private def segmentFiles(p: Int): Seq[Path] = {
    // Files.list streams hold a directory handle — close eagerly, or a
    // long-lived polling consumer leaks one fd per drain
    val s = Files.list(partDir(p))
    try s.iterator().asScala.toSeq
      .filter(_.getFileName.toString.startsWith("segment-"))
      .sortBy(_.getFileName.toString.stripPrefix("segment-")
        .stripSuffix(".jsonl").split("-").head.toLong)
    finally s.close()
  }

  // same Jackson stack the catalog's manifests use — proper escaping on
  // write, and corrupt lines surface with file context instead of
  // index-out-of-bounds from a bespoke scanner
  private val jsonMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def esc(s: String): String = {
    val q = jsonMapper.writeValueAsString(s)
    q.substring(1, q.length - 1)
  }

  def partitionFor(key: String): Int = math.floorMod(key.hashCode, partitions)

  /** Append a batch of (key, value) records with an explicit event
    * timestamp; one new segment file per touched partition (immutable —
    * the file-stream source and replaying consumers depend on it).
    * Returns the (partition, offset) of every record in input order. */
  def appendBatch(records: Seq[(String, String)], tsMs: Long): Seq[(Int, Long)] = {
    val byPart = records.zipWithIndex.groupBy { case ((k, _), _) => partitionFor(k) }
    val out = new Array[(Int, Long)](records.size)
    byPart.foreach { case (p, recs) =>
      val base = nextOffset(p).getAndAdd(recs.size)
      val lines = recs.zipWithIndex.map { case (((k, v), origIdx), i) =>
        out(origIdx) = (p, base + i)
        s"""{"partition":$p,"offset":${base + i},"ts":$tsMs,"key":"${esc(k)}","value":"${esc(v)}"}"""
      }
      // segment name = base offset + record count: unique because base
      // offsets are monotonic per partition (and recovered on reopen).
      // Write-then-ATOMIC_MOVE: a concurrent reader (poll from another
      // process, Spark's file-stream source listing part=*) must never
      // observe a half-written segment — the file-stream source would
      // mark it processed and permanently drop the missing tail
      val seg = partDir(p).resolve(s"segment-$base-${recs.size}.jsonl")
      val tmp = partDir(p).resolve(s".tmp-${java.util.UUID.randomUUID()}")
      Files.write(tmp, (lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
      // create-if-absent hard link (the catalog's commit-point pattern):
      // atomic for concurrent readers AND loud on a name collision,
      // which would mean the monotonic-offset invariant broke
      Files.createLink(seg, tmp)
      Files.delete(tmp)
    }
    out.toSeq
  }

  /** Idempotent single-partition append for the DISTRIBUTED producer:
    * the segment is TAGGED with a deterministic batch id, and the append
    * is skipped when a segment carrying that tag already exists — so a
    * Spark task RETRY after a successful append (which would recover the
    * now-advanced end offset and otherwise silently double-publish)
    * becomes a no-op. One directory listing serves BOTH guards: a
    * sequential retry sees the earlier attempt's tagged segment and
    * skips; a truly concurrent duplicate (speculative task) that listed
    * before the first attempt landed recovers the SAME base offset and
    * dies loudly on the atomic create-link collision. Either way the
    * partition's log carries the batch exactly once.
    * Returns the number of records appended (0 = duplicate skipped). */
  private[graft] def appendPartitionIdempotent(p: Int,
      recs: Seq[(String, String)], tsMs: Long, bid: String): Long = {
    val segs = segmentFiles(p)
    if (segs.exists(_.getFileName.toString.endsWith(s"-$bid.jsonl"))) 0L
    else {
      val base = segs.lastOption.map { f =>
        val (b, n) = FileTopic.segmentSpan(f); b + n
      }.getOrElse(0L)
      val lines = recs.zipWithIndex.map { case ((k, v), i) =>
        s"""{"partition":$p,"offset":${base + i},"ts":$tsMs,"key":"${esc(k)}","value":"${esc(v)}"}"""
      }
      val seg = partDir(p).resolve(s"segment-$base-${recs.size}-$bid.jsonl")
      val tmp = partDir(p).resolve(s".tmp-${java.util.UUID.randomUUID()}")
      Files.write(tmp, (lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
      Files.createLink(seg, tmp)
      Files.delete(tmp)
      nextOffset(p).set(math.max(nextOffset(p).get(), base + recs.size))
      recs.size.toLong
    }
  }

  /** EventBus-surface publish: event type is the record key (so one
    * type's events are totally ordered, like a keyed Kafka producer). */
  def publish(eventType: String, payload: String, tsMs: Long): (Int, Long) =
    appendBatch(Seq(eventType -> payload), tsMs).head

  case class Record(partition: Int, offset: Long, ts: Long, key: String, value: String)

  private def parse(line: String, src: Path): Record =
    try {
      val n = jsonMapper.readTree(line)
      Record(n.get("partition").asInt(), n.get("offset").asLong(), n.get("ts").asLong(),
        n.get("key").asText(), n.get("value").asText())
    } catch { case e: Exception =>
      // a corrupt record is data loss, not something to skip silently —
      // fail loudly with enough context to find the bad segment
      throw new IllegalStateException(s"corrupt record in $src: $line", e)
    }

  /** Read records of one partition from `fromOffset` (inclusive). */
  def poll(partition: Int, fromOffset: Long, max: Int = Int.MaxValue): Seq[Record] =
    segmentFiles(partition).iterator.flatMap { f =>
      val (base, n) = FileTopic.segmentSpan(f)
      if (base + n <= fromOffset) Iterator.empty
      else Files.readAllLines(f).asScala.iterator.map(parse(_, f))
        .filter(_.offset >= fromOffset)
    }.take(max).toSeq

  def endOffset(partition: Int): Long = nextOffset(partition).get()

  // ---- consumer groups: committed offsets live beside the log ----

  private def groupFile(group: String, p: Int): Path =
    offsetsDir.resolve(s"$group-$p.offset")

  def committedOffset(group: String, partition: Int): Long = {
    val f = groupFile(group, partition)
    if (Files.exists(f)) new String(Files.readAllBytes(f), StandardCharsets.UTF_8).trim.toLong
    else 0L
  }

  def commitOffset(group: String, partition: Int, offset: Long): Unit = {
    val tmp = offsetsDir.resolve(s".tmp-$group-$partition-${java.util.UUID.randomUUID()}")
    Files.write(tmp, offset.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, groupFile(group, partition),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Kafka-consumer-shaped drain: deliver every record past the group's
    * committed offsets to `handler`, then commit the new positions.
    * At-least-once: a crash between delivery and commit redelivers on
    * the next drain — same contract as a group rebalance mid-poll. */
  def drain(group: String)(handler: Record => Unit): Int = {
    var n = 0
    (0 until partitions).foreach { p =>
      val from = committedOffset(group, p)
      val recs = poll(p, from)
      recs.foreach(handler)
      if (recs.nonEmpty) { commitOffset(group, p, recs.last.offset + 1); n += recs.size }
    }
    n
  }

  val recordSchema: StructType = StructType(Seq(
    StructField("partition", IntegerType), StructField("offset", LongType),
    StructField("ts", LongType), StructField("key", StringType),
    StructField("value", StringType)))

  /** Structured-Streaming view of the topic — the `readStream` twin of a
    * kafka source: one row per record, `ts` surfaced as an event-time
    * timestamp column. New segment files become new micro-batch input,
    * so SyncEventStream consumes this exactly as it would a broker. */
  def streamDF(spark: SparkSession): DataFrame =
    spark.readStream.schema(recordSchema)
      .option("maxFilesPerTrigger", "16")
      .json(s"$root/$topic/part=*")
      .withColumn("eventTime", timestamp_millis(col("ts")))
}

object FileTopic {

  /** Distributed produce: publish a whole DataFrame of (key, value)
    * records into the topic WITHOUT collecting to the driver — the
    * 100 TB producer path (on a real cluster `root` is shared storage;
    * with a real broker each task holds a producer connection instead).
    *
    * Shape: the rows are hash-partitioned with the SAME key->partition
    * function the single-record producer uses, such that each Spark task
    * owns EXACTLY ONE topic partition — Kafka's single-writer-per-
    * partition broker invariant — so base offsets need no cross-task
    * coordination: each task recovers its partition's end offset from
    * the log and appends one segment. Records are sorted by key within
    * the task for deterministic replay, and the segment is tagged with a
    * content-derived batch id, so a task RETRY after a successful append
    * skips (idempotent — the broker-epoch dedup a real producer does)
    * while a concurrent speculative duplicate dies loudly on the atomic
    * create-link collision (see [[appendPartitionIdempotent]]).
    *
    * `df` must have exactly two string-castable columns: key, value.
    * Returns the number of records ACTUALLY APPENDED — a fully-deduped
    * replay (retry of an already-landed batch) returns 0. Note the
    * dedup-by-design consequence: re-publishing byte-identical content
    * at the same event timestamp IS the retry case and is skipped; a
    * legitimate re-publish must carry a new `tsMs`. */
  def produceDistributed(df: DataFrame, root: String, topic: String,
                         partitions: Int, tsMs: Long): Long = {
    val n = partitions
    require(df.columns.length == 2, s"expect (key, value) columns: ${df.columns.toSeq}")
    val Array(k0, v0) = df.columns
    val keyed = df
      .select(col(k0).cast("string").as("key"), col(v0).cast("string").as("value"))
      .rdd
      .map { r =>
        // typed contract failure instead of an opaque executor NPE from
        // null.hashCode (partial segments may already be on disk; the
        // caller sees WHICH contract broke)
        val key = r.getString(0)
        require(key != null,
          s"FileTopic.produceDistributed($topic): null key in (${k0}, ${v0})")
        (math.floorMod(key.hashCode, n), (key, r.getString(1)))
      }
      .partitionBy(new org.apache.spark.Partitioner {
        def numPartitions: Int = n
        def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
    keyed.mapPartitionsWithIndex { (p, it) =>
      val recs = it.map(_._2).toVector.sortBy(r => (r._1, r._2))
      val appended =
        if (recs.isEmpty) 0L
        else {
          // deterministic batch id: FULL 128-bit MD5 of the sorted
          // content + event timestamp — identical across task attempts
          // (a stable idempotence tag without driver-side coordination),
          // and wide enough that a collision between two DISTINCT
          // batches (which would silently skip one — the failure
          // appendBatch's loud collision guard exists to prevent) needs
          // ~2^64 batches per partition, not the ~2^16 a 32-bit tag gave
          val bid = md5Hex(s"$tsMs|" + recs.map { case (k, v) => s"$k\u0000$v" }
            .mkString("\u0001"))
          // constructed inside the task: recovers this partition's end
          // offset from the log; only (root, topic, n) cross the wire
          new FileTopic(root, topic, n).appendPartitionIdempotent(p, recs, tsMs, bid)
        }
      Iterator.single(appended)
    }.fold(0L)(_ + _)
  }

  /** (base offset, record count) parsed from a segment file name —
    * `segment-<base>-<n>[-<batchTag>].jsonl`; the optional tag is the
    * distributed producer's idempotence key and never offset-relevant. */
  private[streaming] def segmentSpan(f: Path): (Long, Long) = {
    val parts = f.getFileName.toString.stripPrefix("segment-")
      .stripSuffix(".jsonl").split("-")
    (parts(0).toLong, parts(1).toLong)
  }

  private[streaming] def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
}
