package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.streaming.SyncEventStream
import graft.streaming.SyncEventStream.{EventStatus, EventUpdate}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, expr, split}
import org.apache.spark.sql.streaming.OutputMode

/** Structured-Streaming lifecycle semantics via MemoryStream. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("catalog stream SOURCE (appends): commits arrive as micro-batches, " +
       "checkpoint restart is exactly-once, non-append commits fail loudly") {
    val wh = Files.createTempDirectory("graft-src-wh").toString
    val ckpt = Files.createTempDirectory("graft-src-ckpt").toString
    val outDir = Files.createTempDirectory("graft-src-out").toString
    val cat = new graft.catalog.GraftCatalog(spark, wh)
    cat.createTable("s", "feed")
    cat.commitAppend("s", "feed", Seq((1L, "pre")).toDF("id", "v"))

    // parquet sink: the fault-tolerant kind a checkpoint can recover
    // (memory sinks refuse recovery by design)
    def startStream() = spark.readStream
      .format("graft.streaming.GraftTableSourceProvider")
      .option("warehouse", wh).option("table", "s.feed")
      .load()
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt).start()
    def sunk(): Seq[Long] = {
      val files = new java.io.File(outDir).listFiles()
      if (files == null || !files.exists(_.getName.endsWith(".parquet"))) Seq.empty
      else spark.read.parquet(outDir).select("id").as[Long].collect().toSeq.sorted
    }

    val q1 = startStream()
    try {
      // starting-seq defaults to LATEST: the pre-existing row never arrives
      cat.commitAppend("s", "feed", Seq((2L, "a"), (3L, "b")).toDF("id", "v"))
      cat.commitAppend("s", "feed", Seq((4L, "c")).toDF("id", "v"))
      q1.processAllAvailable()
      assert(sunk() === Seq(2L, 3L, 4L))
    } finally q1.stop()

    // RESTART from the checkpoint: no duplicates, only new commits
    cat.commitAppend("s", "feed", Seq((5L, "d")).toDF("id", "v"))
    val q2 = startStream()
    try {
      q2.processAllAvailable()
      assert(sunk() === Seq(2L, 3L, 4L, 5L),
        "a restarted stream resumes, never replays")
      // a REPLACE cannot be represented by the appends stream — loud failure
      cat.commitReplace("s", "feed", Seq((9L, "z")).toDF("id", "v"))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
      }
      assert(e.getMessage.contains("non-append") ||
             Option(e.getCause).exists(_.getMessage.contains("non-append")),
        s"unexpected: ${e.getMessage}")
    } finally q2.stop()
  }

  test("catalog stream SOURCE: earliest starts with the full table; cdc " +
       "mode carries _change_type through a merge-on-read delete") {
    val wh = Files.createTempDirectory("graft-src2-wh").toString
    val cat = new graft.catalog.GraftCatalog(spark, wh)
    cat.createTable("s", "cfeed")
    cat.commitAppend("s", "cfeed", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))

    // earliest + appends: batch 0 is the current table
    val qe = spark.readStream
      .format("graft.streaming.GraftTableSourceProvider")
      .option("warehouse", wh).option("table", "s.cfeed")
      .option("starting-seq", "earliest")
      .load()
      .writeStream.format("memory").queryName("cfeed_all")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-src2-ck1").toString).start()
    try {
      qe.processAllAvailable()
      assert(spark.sql("SELECT id FROM cfeed_all ORDER BY id").as[Long]
        .collect().toSeq === Seq(1L, 2L))
    } finally qe.stop()

    // cdc: an equality delete arrives as a _change_type='delete' row
    val qc = spark.readStream
      .format("graft.streaming.GraftTableSourceProvider")
      .option("warehouse", wh).option("table", "s.cfeed")
      .option("mode", "cdc")
      .load()
      .writeStream.format("memory").queryName("cfeed_cdc")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-src2-ck2").toString).start()
    try {
      cat.commitAppend("s", "cfeed", Seq((3L, "c")).toDF("id", "v"))
      cat.commitDelete("s", "cfeed", Seq(1L).toDF("id"))
      qc.processAllAvailable()
      val rows = spark.sql("SELECT id, _change_type FROM cfeed_cdc ORDER BY id, _change_type")
        .as[(Long, String)].collect().toSeq
      assert(rows === Seq((1L, "delete"), (3L, "insert")),
        s"cdc must carry the delete: $rows")
    } finally qc.stop()
  }

  test("catalog stream SOURCE hardening: earliest applies MoR deletes, " +
       "start seq persists across restarts, expired/dropped batches fail loudly") {
    val wh = Files.createTempDirectory("graft-src3-wh").toString
    val cat = new graft.catalog.GraftCatalog(spark, wh)
    cat.createTable("s", "hfeed")
    cat.commitAppend("s", "hfeed", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    cat.commitDelete("s", "hfeed", Seq(1L).toDF("id")) // MoR equality delete

    // EARLIEST first batch = the SNAPSHOT (delete applied) — never the
    // raw union of historical files, which would resurrect id=1
    val qe = spark.readStream
      .format("graft.streaming.GraftTableSourceProvider")
      .option("warehouse", wh).option("table", "s.hfeed")
      .option("starting-seq", "earliest")
      .load()
      .writeStream.format("memory").queryName("hfeed_all")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-src3-ck").toString).start()
    try {
      qe.processAllAvailable()
      assert(spark.sql("SELECT id FROM hfeed_all ORDER BY id").as[Long]
        .collect().toSeq === Seq(2L),
        "a merge-on-read-deleted row must NOT stream as a ghost insert")
    } finally qe.stop()

    // START SEQ PERSISTENCE (the crash-recovery window): a second
    // createSource against the SAME metadata dir must anchor at the
    // FIRST resolution of 'latest', not re-resolve past missed commits
    val prov = new graft.streaming.GraftTableSourceProvider()
    val meta = Files.createTempDirectory("graft-src3-meta").toString
    val params = Map("warehouse" -> wh, "table" -> "s.hfeed")
    val src1 = prov.createSource(spark.sqlContext, meta, None, "x", params)
    cat.commitAppend("s", "hfeed", Seq((5L, "e")).toDF("id", "v"))
    val head = cat.latest("s", "hfeed").get.seq
    val src2 = prov.createSource(spark.sqlContext, meta, None, "x", params)
      .asInstanceOf[graft.streaming.GraftTableSource]
    // batchDf = getBatch minus the streaming re-rooting (collectable here)
    val replay = src2.batchDf(None,
      new org.apache.spark.sql.execution.streaming.runtime.LongOffset(head))
    assert(replay.select("id").as[Long].collect().toSeq === Seq(5L),
      "the replayed first batch must cover commits made after the ORIGINAL " +
        "start anchor — a re-resolved 'latest' would lose them")
    src1.stop(); src2.stop()

    // an in-flight batch whose END version was expired must fail loudly,
    // never replay silently empty
    val e = intercept[IllegalArgumentException] {
      src2.batchDf(None,
        new org.apache.spark.sql.execution.streaming.runtime.LongOffset(head + 50))
    }
    assert(e.getMessage.contains("no longer exists"), s"unexpected: ${e.getMessage}")

    // a batch that LOST a declared column (DROP COLUMN mid-stream) must
    // fail loudly — an empty batch would silently drop the range's rows.
    // The source is created BEFORE the drop (its declared schema still
    // carries v), then reads a post-drop appended file
    val src3 = prov.createSource(spark.sqlContext,
      Files.createTempDirectory("graft-src3-meta2").toString, None, "x", params)
      .asInstanceOf[graft.streaming.GraftTableSource]
    val c = graft.catalog.GraftSparkCatalog.registerSqlCatalog(spark, wh)
    cat.compact("s", "hfeed", 128L * 1024 * 1024) // materialize the delete
    spark.sql(s"ALTER TABLE $c.s.hfeed DROP COLUMN v")
    cat.commitAppend("s", "hfeed", Seq(Tuple1(7L)).toDF("id"))
    val d = intercept[IllegalArgumentException] {
      src3.batchDf(
        Some(new org.apache.spark.sql.execution.streaming.runtime.LongOffset(head + 2)),
        new org.apache.spark.sql.execution.streaming.runtime.LongOffset(head + 3))
    }
    assert(d.getMessage.contains("lost column"), s"unexpected: ${d.getMessage}")
    src3.stop()

    // a table option without the ns.table shape is a CONFIG error, not a
    // MatchError
    val m = intercept[IllegalArgumentException] {
      prov.createSource(spark.sqlContext,
        Files.createTempDirectory("graft-src3-meta3").toString, None, "x",
        Map("warehouse" -> wh, "table" -> "hfeed"))
    }
    assert(m.getMessage.contains("ns.table"), s"unexpected: ${m.getMessage}")
  }

  test("event lifecycle state machine enforces reference transitions") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventUpdate]
    val query = SyncEventStream.lifecycle(input.toDS())
      .writeStream.format("memory").queryName("lifecycle")
      .outputMode(OutputMode.Update()).start()
    try {
      // batch 1: both events claim InProgress
      input.addData(
        EventUpdate(1L, "eu", "InProgress", ts("2024-01-01 00:00:01")),
        EventUpdate(2L, "us", "InProgress", ts("2024-01-01 00:00:02")))
      query.processAllAvailable()
      // batch 2: 1 completes; 2 fails then retries (Failed->Pending)
      input.addData(
        EventUpdate(1L, "eu", "Completed", ts("2024-01-01 00:01:00")),
        EventUpdate(2L, "us", "Failed", ts("2024-01-01 00:01:00")),
        EventUpdate(2L, "us", "Pending", ts("2024-01-01 00:02:00")))
      query.processAllAvailable()
      // batch 3: illegal jump Pending->Completed is rejected
      input.addData(EventUpdate(2L, "us", "Completed", ts("2024-01-01 00:03:00")))
      query.processAllAvailable()

      val state = spark.table("lifecycle").as[EventStatus].collect()
        .groupBy(_.eventId).map { case (k, v) => k -> v.maxBy(_.transitions) }
      assert(state(1L).status === "Completed" && state(1L).transitions === 2)
      assert(state(2L).status === "Pending", "retry must land back on Pending")
      assert(state(2L).transitions === 3, "illegal Pending->Completed must not count")
      val lastBatch = spark.table("lifecycle").as[EventStatus].collect()
        .filter(e => e.eventId == 2L && !e.valid)
      assert(lastBatch.nonEmpty, "illegal transition must be flagged invalid")
    } finally query.stop()
  }

  test("completed state expires with a distinct Expired marker, never a duplicate Completed row") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventUpdate]
    // tiny TTL, tiny lateness: the next batch's watermark evicts the key
    val query = SyncEventStream.lifecycle(input.toDS(),
        completedStateTtlMs = 1000L, latenessMs = 500L)
      .writeStream.format("memory").queryName("lifecycle_expiry")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        EventUpdate(1L, "eu", "InProgress", ts("2024-01-01 00:00:01")),
        EventUpdate(1L, "eu", "Completed", ts("2024-01-01 00:00:02")))
      query.processAllAvailable()
      // unrelated event far in the future advances the watermark past
      // completion + TTL, firing the EventTimeTimeout for key 1
      input.addData(EventUpdate(9L, "us", "InProgress", ts("2024-01-01 01:00:00")))
      query.processAllAvailable()
      input.addData(EventUpdate(9L, "us", "Failed", ts("2024-01-01 01:00:01")))
      query.processAllAvailable()
      val rows = spark.table("lifecycle_expiry").as[EventStatus].collect()
        .filter(_.eventId == 1L)
      assert(rows.count(_.status == "Completed") === 1, "terminal Completed row emitted once")
      val expired = rows.filter(_.status == "Expired")
      assert(expired.length === 1, s"state eviction must emit one Expired marker, got: ${rows.toSeq}")
      assert(expired.head.transitions === 2, "expiry preserves the transition count")
    } finally query.stop()
  }

  test("lifecycle timeline emits EVERY transition hop (flatMapGroupsWithState audit form)") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventUpdate]
    val query = SyncEventStream.lifecycleTimeline(input.toDS())
      .writeStream.format("memory").queryName("timeline")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        EventUpdate(7L, "eu", "InProgress", ts("2024-01-01 00:00:01")),
        EventUpdate(7L, "eu", "Failed", ts("2024-01-01 00:00:02")),
        EventUpdate(7L, "eu", "Pending", ts("2024-01-01 00:00:03")),
        EventUpdate(7L, "eu", "Completed", ts("2024-01-01 00:00:04"))) // illegal from Pending
      query.processAllAvailable()
      val rows = spark.table("timeline").as[EventStatus].collect().sortBy(_.transitions)
      // every hop appears, in order, including the rejected final jump
      assert(rows.map(r => (r.status, r.valid)).toSeq === Seq(
        ("InProgress", true), ("Failed", true), ("Pending", true), ("Pending", false)))
    } finally query.stop()
  }

  test("distributed produce: single-writer-per-partition publish preserves the " +
       "offset/partition invariants and composes with driver-side appends") {
    import graft.streaming.FileTopic
    val root = Files.createTempDirectory("graft-topic-dist").toString
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, s"payload-$i")).toDF("k", "v")
      .repartition(7) // deliberately != topic partitions
    val n = FileTopic.produceDistributed(docs, root, "bulk", partitions = 3,
      tsMs = 1704067200000L)
    assert(n === 200L)
    val t = new FileTopic(root, "bulk", partitions = 3)
    // dense offsets per partition, count conserved
    val polled = (0 until 3).map(p => t.poll(p, 0L))
    assert(polled.map(_.size).sum === 200)
    polled.zipWithIndex.foreach { case (recs, p) =>
      assert(recs.map(_.offset) === recs.indices.map(_.toLong),
        s"partition $p offsets not dense from 0")
      // every record landed on the partition its key hashes to (the
      // same function the driver-side producer uses)
      recs.foreach(r => assert(t.partitionFor(r.key) === p))
    }
    // a driver-side publish composes on top: it must append AFTER the
    // distributed batch, not collide with its segment names
    val (pp, off) = t.publish("k-extra", "tail", 1704067201000L)
    assert(off === t.poll(pp, 0L).size - 1L)
    assert(t.poll(pp, off).map(_.value) === Seq("tail"))
  }

  test("distributed produce is idempotent under task retry: a re-run of the " +
       "same batch (same content + event time) publishes nothing new") {
    import graft.streaming.FileTopic
    val root = Files.createTempDirectory("graft-topic-idem").toString
    import spark.implicits._
    val docs = (0L until 60L).map(i => (i, s"payload-$i")).toDF("k", "v")
    FileTopic.produceDistributed(docs, root, "bulk", partitions = 3,
      tsMs = 1704067200000L): Unit
    // a retried/speculative task re-runs AFTER the first attempt's
    // append landed — whole-batch re-run simulates that for every
    // partition at once: the batch-id tag must make each a no-op, and
    // the return value must say so (0 records actually appended)
    val again = FileTopic.produceDistributed(docs, root, "bulk", partitions = 3,
      tsMs = 1704067200000L)
    assert(again === 0L, "a fully-deduped replay must report 0 appended")
    val t = new FileTopic(root, "bulk", partitions = 3)
    val polled = (0 until 3).map(p => t.poll(p, 0L))
    assert(polled.map(_.size).sum === 60, "retry double-published records")
    polled.foreach { recs =>
      assert(recs.map(_.offset) === recs.indices.map(_.toLong))
      assert(recs.map(_.key).distinct.size === recs.size)
    }
    // the single-partition guard directly: same bid appends once
    val n1 = t.appendPartitionIdempotent(0, Seq("a" -> "1", "b" -> "2"),
      1704067201000L, "feedbeef")
    val n2 = t.appendPartitionIdempotent(0, Seq("a" -> "1", "b" -> "2"),
      1704067201000L, "feedbeef")
    assert((n1, n2) === ((2L, 0L)))
    // a DIFFERENT batch (new bid) still appends and offsets stay dense
    val n3 = t.appendPartitionIdempotent(0, Seq("c" -> "3"), 1704067202000L, "0badf00d")
    assert(n3 === 1L)
    val p0 = t.poll(0, 0L)
    assert(p0.map(_.offset) === p0.indices.map(_.toLong))
  }

  test("Kafka-shaped FileTopic: durable offsets, consumer-group drain, and the lifecycle streams from it") {
    import graft.streaming.FileTopic
    implicit val s = spark
    val root = Files.createTempDirectory("graft-topic").toString
    val t = new FileTopic(root, "sync_events", partitions = 2)
    def pub(id: Long, region: String, req: String, at: String): Unit =
      { t.publish(id.toString, s"$region|$req", ts(at).getTime): Unit }
    pub(1L, "eu", "InProgress", "2024-01-01 00:00:01")
    pub(2L, "us", "InProgress", "2024-01-01 00:00:02")
    pub(1L, "eu", "Completed",  "2024-01-01 00:01:00")
    pub(2L, "us", "Failed",     "2024-01-01 00:01:01")

    // consumer-group drain: everything once, then nothing, then the delta
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    assert(t.drain("g1")(r => { seen += s"${r.key}:${r.value}"; () }) === 4)
    assert(t.drain("g1")(_ => fail("redelivery without new records")) === 0)
    pub(2L, "us", "Pending", "2024-01-01 00:02:00") // retry
    assert(t.drain("g1")(r => { seen += s"${r.key}:${r.value}"; () }) === 1)
    assert(seen.size === 5)
    // per-key total order survives partitioning (key -> one partition)
    val key2 = seen.filter(_.startsWith("2:")).toSeq
    assert(key2 === Seq("2:us|InProgress", "2:us|Failed", "2:us|Pending"))

    // a reopened topic recovers its end offsets from the segment log
    val reopened = new FileTopic(root, "sync_events", partitions = 2)
    assert((0 until 2).map(reopened.endOffset).sum === 5L)

    // the topic's stream view drives the sync-event lifecycle, exactly
    // as a broker-backed source would
    val updates = t.streamDF(spark)
      .select(col("key").cast("long").as("eventId"),
        split(col("value"), "\\|").getItem(0).as("targetRegion"),
        split(col("value"), "\\|").getItem(1).as("requested"),
        col("eventTime"))
      .as[EventUpdate]
    val query = SyncEventStream.lifecycle(updates)
      .writeStream.format("memory").queryName("topic_lifecycle")
      .outputMode(OutputMode.Update()).start()
    try {
      query.processAllAvailable()
      val state = spark.table("topic_lifecycle").as[EventStatus].collect()
        .groupBy(_.eventId).map { case (k, v) => k -> v.maxBy(_.transitions) }
      assert(state(1L).status === "Completed")
      assert(state(2L).status === "Pending", "Failed then retried lands on Pending")
    } finally query.stop()
  }

  test("streaming dedup: first occurrence wins, word-order copies collapse under the BoW fingerprint") {
    import graft.streaming.StreamingDedup
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDF().toDF("event_time", "doc_id", "text")
    val query = StreamingDedup.dropBowDups(docs)
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (ts("2024-01-01 00:00:01"), 1L, "the quick brown fox"),
        (ts("2024-01-01 00:00:02"), 2L, "the quick brown fox"),   // exact dup
        (ts("2024-01-01 00:00:03"), 3L, "fox brown quick the"),   // word-order dup
        (ts("2024-01-01 00:00:04"), 4L, "completely different"))
      query.processAllAvailable()
      val kept = spark.table("dedup_stream").select("doc_id")
        .as[Long].collect().sorted
      assert(kept === Array(1L, 4L), "only the first copy of each BoW class survives")
    } finally query.stop()
  }

  test("session windows close after the gap duration") {
    import org.apache.spark.sql.functions.{col, count, lit, session_window}
    // two bursts for user A separated by >5m gap -> two sessions; B -> one
    val events = Seq(
      ("A", ts("2024-01-01 00:00:00")), ("A", ts("2024-01-01 00:02:00")),
      ("A", ts("2024-01-01 00:20:00")),
      ("B", ts("2024-01-01 00:01:00"))
    ).toDF("user", "eventTime")
    val sessions = events
      .groupBy(session_window(col("eventTime"), "5 minutes"), col("user"))
      .agg(count(lit(1)).as("events"))
      .select("user", "events").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(sessions("A") === Seq(1L, 2L), "burst of 2 + later single = two sessions")
    assert(sessions("B") === Seq(1L))
  }

  test("streaming session_window ≡ batch sessionization on the same events") {
    import org.apache.spark.sql.functions.{count, lit, round, session_window, sum}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val stream = input.toDF().toDF("ts", "user_id", "value")
      .withWatermark("ts", "10 seconds")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"), col("sum_value"))
    val query = stream.writeStream.format("memory").queryName("sess_stream")
      .outputMode(OutputMode.Append()).start()
    val rows = Seq(
      // user 1: burst of 3, then a >30m gap, then 1 more -> two sessions
      (ts("2024-01-01 00:00:00"), 1L, 1.0), (ts("2024-01-01 00:10:00"), 1L, 2.0),
      (ts("2024-01-01 00:25:00"), 1L, 3.0), (ts("2024-01-01 01:10:00"), 1L, 4.0),
      // user 2: gap of exactly 30m -> still ONE session (Spark merges an
      // event landing exactly on the previous session's end)
      (ts("2024-01-01 00:00:00"), 2L, 5.0), (ts("2024-01-01 00:30:00"), 2L, 6.0))
    try {
      input.addData(rows: _*)
      query.processAllAvailable()
      // sentinel far in the future closes every real session's watermark
      input.addData((ts("2024-01-02 12:00:00"), 99L, 0.0))
      query.processAllAvailable()
      val streamed = spark.table("sess_stream")
        .filter(col("user_id") =!= 99L)
        .as[(Long, Timestamp, Timestamp, Long, Double)].collect().sortBy(r => (r._1, r._2.getTime))
      val batch = rows.toDF("ts", "user_id", "value")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
        .select(col("user_id"), col("sw.start"), col("sw.end"), col("n_events"), col("sum_value"))
        .as[(Long, Timestamp, Timestamp, Long, Double)].collect().sortBy(r => (r._1, r._2.getTime))
      assert(streamed === batch, "append-mode streaming sessions must equal the batch sessionization")
      assert(batch.count(_._1 == 1L) === 2, "a 45-minute gap closes user 1's first session")
      assert(batch.count(_._1 == 2L) === 1 && batch.find(_._1 == 2L).get._4 === 2L,
        "a gap of exactly the window merges: Spark extends a session whose end == next ts")
    } finally query.stop()
  }

  test("watermarked tumbling window counts per region") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val events = input.toDF().toDF("eventTime", "targetRegion")
    val query = SyncEventStream.regionThroughput(events, watermark = "5 minutes", window_ = "1 minute")
      .writeStream.format("memory").queryName("throughput")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (ts("2024-01-01 00:00:10"), "eu"), (ts("2024-01-01 00:00:40"), "eu"),
        (ts("2024-01-01 00:01:10"), "us"))
      query.processAllAvailable()
      // advance watermark far enough to close earlier windows
      input.addData((ts("2024-01-01 00:30:00"), "eu"))
      query.processAllAvailable()
      val rows = spark.table("throughput")
        .select("targetRegion", "events").as[(String, Long)].collect().toSet
      assert(rows.contains(("eu", 2L)))
      assert(rows.contains(("us", 1L)))
    } finally query.stop()
  }

  test("dropDuplicatesWithinWatermark: duplicates collapse inside the horizon, state then expires") {
    // the built-in bounded-state dedup (Spark 3.5+): unlike plain
    // dropDuplicates (state grows forever), the watermark bounds how
    // long a key is remembered — the only dedup shape that survives an
    // unbounded 100 TB stream. Semantics pinned: a duplicate arriving
    // within the watermark window is dropped even though its OWN
    // timestamp differs from the first occurrence's.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDF().toDF("event_time", "doc_id", "text")
      .withWatermark("event_time", "10 minutes")
      .dropDuplicatesWithinWatermark("text")
    val query = docs.writeStream.format("memory").queryName("wm_dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((ts("2024-01-01 00:00:00"), 1L, "alpha"))
      query.processAllAvailable()
      // same text, 5 min later (inside horizon): dropped
      input.addData((ts("2024-01-01 00:05:00"), 2L, "alpha"))
      query.processAllAvailable()
      // push the watermark far past alpha's expiry, then repeat it:
      // the state is gone, so the reappearance is admitted as new
      input.addData((ts("2024-01-01 01:00:00"), 3L, "beta"))
      query.processAllAvailable()
      input.addData((ts("2024-01-01 01:01:00"), 4L, "alpha"))
      query.processAllAvailable()
      val kept = spark.table("wm_dedup").select("doc_id").as[Long].collect().sorted
      assert(kept === Array(1L, 3L, 4L),
        "in-horizon dup dropped; post-expiry reappearance admitted")
    } finally query.stop()
  }

  test("RocksDB state store: streaming dedup behaves identically to the in-memory provider") {
    // The 100 TB streaming-state answer: HDFS-backed in-memory state
    // caps at executor heap; RocksDB spills per-key state to local disk
    // and changelogs to the checkpoint. Same query, same results —
    // provider choice is pure configuration, and this pins that no
    // dedup semantics leak through the provider boundary.
    import graft.streaming.StreamingDedup
    implicit val sqlCtx = spark.sqlContext
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(Timestamp, Long, String)]
      val docs = input.toDF().toDF("event_time", "doc_id", "text")
      val query = StreamingDedup.dropBowDups(docs)
        .writeStream.format("memory").queryName("rocksdb_dedup")
        .outputMode(OutputMode.Append()).start()
      try {
        input.addData(
          (ts("2024-01-01 00:00:01"), 1L, "the quick brown fox"),
          (ts("2024-01-01 00:00:02"), 2L, "fox brown quick the"),
          (ts("2024-01-01 00:00:03"), 3L, "something else"))
        query.processAllAvailable()
        // state survives across micro-batches inside RocksDB
        input.addData((ts("2024-01-01 00:00:04"), 4L, "the quick brown fox"))
        query.processAllAvailable()
        val kept = spark.table("rocksdb_dedup").select("doc_id")
          .as[Long].collect().sorted
        assert(kept === Array(1L, 3L))
      } finally query.stop()
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("Trigger.AvailableNow drains the backlog then terminates on its own") {
    // The incremental-batch trigger: process everything available, then
    // stop — the shape for a cron-scheduled catch-up job that shares
    // code with the always-on stream (no separate batch path to drift).
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    input.addData(
      (ts("2024-01-01 00:00:01"), 1L, "alpha"),
      (ts("2024-01-01 00:00:02"), 2L, "alpha"),
      (ts("2024-01-01 00:00:03"), 3L, "beta"))
    val query = graft.streaming.StreamingDedup.dropExactDups(
        input.toDF().toDF("event_time", "doc_id", "text"))
      .writeStream.format("memory").queryName("available_now")
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(query.awaitTermination(60000), "AvailableNow query did not self-terminate")
    val kept = spark.table("available_now").select("doc_id").as[Long].collect().sorted
    assert(kept === Array(1L, 3L))
  }

  test("late data past the watermark is dropped AND surfaces in the progress metrics") {
    // The observability half of watermarking: at 100 TB the difference
    // between "we silently lost late events" and "the pipeline reports
    // exactly how many rows the watermark dropped" is
    // numRowsDroppedByWatermark in each progress report — assert the
    // metric fires, not just the output-side effect.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val events = input.toDF().toDF("eventTime", "targetRegion")
    val query = SyncEventStream.regionThroughput(events, watermark = "5 minutes", window_ = "1 minute")
      .writeStream.format("memory").queryName("late_metrics")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((ts("2024-01-01 00:00:10"), "eu"))
      query.processAllAvailable()
      // push the watermark to ~00:55
      input.addData((ts("2024-01-01 01:00:00"), "eu"))
      query.processAllAvailable()
      // two hopeless stragglers in DIFFERENT windows (map-side partial
      // aggregation collapses same-window late rows into one pre-state
      // row, and the metric counts rows entering the state store)
      input.addData((ts("2024-01-01 00:01:00"), "late"), (ts("2024-01-01 00:03:30"), "late"))
      query.processAllAvailable()
      val dropped = query.recentProgress
        .flatMap(p => Option(p.stateOperators).toSeq.flatten)
        .map(_.numRowsDroppedByWatermark).sum
      assert(dropped === 2L, s"expected 2 watermark-dropped rows, metric says $dropped")
      // and the dropped region never reaches the results
      input.addData((ts("2024-01-01 02:00:00"), "eu"))
      query.processAllAvailable()
      val regions = spark.table("late_metrics")
        .select("targetRegion").as[String].collect().toSet
      assert(!regions.contains("late"), "late rows leaked into the output")
    } finally query.stop()
  }

  test("sliding-window trending: streaming counts equal the batch dual on the same events") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val events = input.toDF().toDF("ts", "event_type")
    val query = graft.streaming.Trending.slidingCounts(
        events.withWatermark("ts", "10 minutes"), "ts", "event_type",
        windowLen = "1 hour", slide = "15 minutes")
      .writeStream.format("memory").queryName("trending")
      .outputMode(OutputMode.Append()).start()
    try {
      val data = Seq(
        (ts("2024-01-01 00:05:00"), "click"),
        (ts("2024-01-01 00:20:00"), "click"),
        (ts("2024-01-01 00:20:30"), "view"),
        (ts("2024-01-01 00:50:00"), "view"))
      input.addData(data: _*)
      query.processAllAvailable()
      // a far-future marker advances the watermark past every data window
      input.addData((ts("2024-01-01 06:00:00"), "marker"))
      query.processAllAvailable()
      val streamed = spark.table("trending")
        .select("window_start", "event_type", "cnt")
        .as[(Timestamp, String, Long)].collect().toSet
      val batch = graft.streaming.Trending.slidingCounts(
          data.toDF("ts", "event_type"), "ts", "event_type", "1 hour", "15 minutes")
        .as[(Timestamp, String, Long)].collect().toSet
      // marker windows are still open (watermark never passes them), so
      // the emitted set is exactly the batch result over the data rows
      assert(streamed === batch)
      assert(batch.nonEmpty && batch.map(_._1).size >= 4) // real 4x fan-out
    } finally query.stop()
  }

  test("Y20 closed loop: the backpressure tier throttles how much backlog a trigger drains") {
    import org.apache.spark.sql.functions.col
    def backlog(n: Int, durationMs: Double) =
      (1 to n).map(i => (i, f"e$i%03d", "Pending", durationMs))
        .toDF("created_at", "event_id", "status", "duration_ms")

    // Green (lag < 1e4): everything drains
    val (t1, r1) = SyncEventStream.throttledPendingWorker(backlog(50, 10.0), identity, base = 20)
    assert(t1 === "Green" && r1.count() === 50)
    // Yellow (1e4 <= lag < 5e4): capped at base
    val (t2, r2) = SyncEventStream.throttledPendingWorker(backlog(30, 1000.0), identity, base = 20)
    assert(t2 === "Yellow" && r2.count() === 20)
    // Orange (5e4 <= lag < 2e5): capped at base/10, oldest first
    val (t3, r3) = SyncEventStream.throttledPendingWorker(backlog(50, 2000.0), identity, base = 20)
    assert(t3 === "Orange" && r3.count() === 2)
    assert(r3.orderBy(col("created_at")).select("event_id").as[String].collect()
      === Array("e001", "e002"))
    // Red (lag >= 2e5): ingestion pauses so the copy plane catches up
    val (t4, r4) = SyncEventStream.throttledPendingWorker(backlog(100, 10000.0), identity, base = 20)
    assert(t4 === "Red" && r4.count() === 0)
  }

  test("stream-stream interval join: purchases within 5 minutes of a click, watermark-bounded state") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val buys = MemoryStream[(Long, Long, Timestamp)]
    val c = clicks.toDS().toDF("click_id", "user_id", "cts")
      .withWatermark("cts", "10 minutes")
    val b = buys.toDS().toDF("buy_id", "buy_user", "bts")
      .withWatermark("bts", "10 minutes")
    // the time-range conjunct bounds the join state on BOTH sides: rows
    // beyond watermark+range are dropped from state, so the join runs
    // forever without unbounded memory (the batch dual is rel_asof/range)
    val joined = c.join(b, expr(
      "user_id = buy_user AND bts >= cts AND bts <= cts + interval 5 minutes"))
      .select("click_id", "buy_id")
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData((100L, 1L, ts("2024-01-01 10:00:00")), (101L, 2L, ts("2024-01-01 10:00:00")))
      buys.addData(
        (500L, 1L, ts("2024-01-01 10:03:00")),  // within window -> match
        (501L, 1L, ts("2024-01-01 10:20:00")),  // too late -> no match
        (502L, 3L, ts("2024-01-01 10:01:00")))  // other user -> no match
      q.processAllAvailable()
      val got = spark.table("ssjoin").as[(Long, Long)].collect().toSet
      assert(got === Set((100L, 500L)))
    } finally q.stop()
  }

  test("streaming ingest scores against the static LM; batch boundaries don't change scores") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Curation
    val corpus = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the mat"),
      (3L, "the cat and the dog")).toDF("doc_id", "text")
    val (vocab, total) = Curation.unigramLm(corpus, "doc_id", "text")
    // stream-static composition: the token→vocab join is stateless, the
    // per-doc aggregate is the only stateful piece (update mode)
    val input = MemoryStream[(Long, String)]
    val scored = Curation.scoreWithLm(
      input.toDS().toDF("doc_id", "text"), vocab, total, "doc_id", "text")
    val query = scored.writeStream.format("memory").queryName("lm_scores")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData((10L, "the cat sat"), (11L, "zzz yyy"))
      query.processAllAvailable()
      input.addData((12L, "the dog and the mat"))
      query.processAllAvailable()
      val got = spark.table("lm_scores")
        .select("doc_id", "avg_logprob").as[(Long, Double)].collect()
        .groupBy(_._1).map { case (k, v) => k -> v.last._2 }
      val want = Curation.scoreWithLm(
          Seq((10L, "the cat sat"), (11L, "zzz yyy"), (12L, "the dog and the mat"))
            .toDF("doc_id", "text"), vocab, total, "doc_id", "text")
        .select("doc_id", "avg_logprob").as[(Long, Double)].collect().toMap
      assert(got === want, "streaming scores must equal the batch computation")
    } finally query.stop()
  }

  test("foreachBatch near-dup gate over the persisted LSH index: stream admission equals batch loop") {
    import graft.catalog.GraftCatalog
    import graft.pipeline.Dedup
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val cat = new GraftCatalog(spark,
      Files.createTempDirectory("graft-lshstream").toString)
    val docs = Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text"))
    val batches = (0 to 2).map(i => docs.filter(col("doc_id") % 3 === i))
    Dedup.buildLshIndexTables(cat, "dd", "st", batches(0), "doc_id", "text",
      numHashes = 32, shingleK = 2, bands = 16)

    // stream the remaining docs; each micro-batch serves against the
    // index, rejects near-dups of ALREADY-ADMITTED docs, and admits the
    // rest with the epoch as the idempotent commitId — exactly the
    // foreachBatch shape a production ingest job runs
    val input = MemoryStream[(Long, String)]
    val query = input.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, epoch: Long) =>
        val batch = b.localCheckpoint()
        val dups = Dedup.dedupAgainstLshIndex(cat, "dd", "st", batch,
            "doc_id", "text", numHashes = 32, shingleK = 2, bands = 16, threshold = 0.5)
          .select(col("incoming_id").as("doc_id")).distinct()
        Dedup.appendToLshIndex(cat, "dd", "st",
          batch.join(dups, Seq("doc_id"), "left_anti"), "doc_id", "text",
          numHashes = 32, shingleK = 2, bands = 16, commitId = Some(s"epoch-$epoch"))
      }
      .start()
    try {
      val b1 = batches(1).as[(Long, String)].collect()
      val b2 = batches(2).as[(Long, String)].collect()
      input.addData(b1.toIndexedSeq: _*); query.processAllAvailable()
      input.addData(b2.toIndexedSeq: _*); query.processAllAvailable()
    } finally query.stop()
    val streamed = cat.read("dd", "st_sets").select("id").as[Long].collect().toSet

    // reference: the batch-mode admission loop from PipelineSpec
    var admitted = batches(0)
    batches.drop(1).foreach { b =>
      val dups = Dedup.minhashNearDupsAgainst(admitted, b, "doc_id", "text",
          numHashes = 32, shingleK = 2, bands = 16, threshold = 0.5)
        .select(col("incoming_id").as("doc_id")).distinct()
      admitted = admitted.unionByName(b.join(dups, Seq("doc_id"), "left_anti"))
        .localCheckpoint()
    }
    assert(streamed === admitted.select("doc_id").as[Long].collect().toSet)
  }

  test("E2E ingest loop: topic -> quality gate -> streaming dedup -> catalog equals batch curation") {
    import graft.streaming.{CatalogStreamSink, FileTopic, StreamingDedup}
    import graft.catalog.GraftCatalog
    import graft.pipeline.{TextAnalysis => TA}
    implicit val s = spark
    val t = new FileTopic(Files.createTempDirectory("graft-ingest").toString,
      "docs", partitions = 2)
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog and runs to the green field",
      2L -> "a second perfectly reasonable document about cats and dogs in the house",
      3L -> "the quick brown fox jumps over the lazy dog and runs to the green field", // dup of 1
      4L -> "yet another ordinary paragraph with many common words in it for the gate",
      5L -> "@@@ ### $$$ %%%", // fails the quality gate: pure punctuation
      6L -> "zzz")             // fails the quality gate: one junk token
    docs.zipWithIndex.foreach { case ((id, text), i) =>
      t.publish(id.toString, text, ts("2024-01-01 00:00:01").getTime + i * 1000L): Unit
    }

    val cat = new GraftCatalog(spark,
      Files.createTempDirectory("graft-ingest-cat").toString)
    cat.createTable("cur", "docs")
    val gated = t.streamDF(spark)
      .select(col("key").cast("long").as("doc_id"), col("value").as("text"),
        col("eventTime"))
      .filter(TA.qualityScore(col("text")) >= 0.5)
    val query = StreamingDedup.dropExactDups(gated, timeCol = "eventTime")
      .select("doc_id", "text")
      .writeStream
      .foreachBatch(CatalogStreamSink.foreachBatchCommit(cat, "cur", "docs", "ing"))
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ingest-ckpt").toString)
      .start()
    try query.processAllAvailable() finally query.stop()

    // the streamed corpus must equal the BATCH curation of the same raw
    // input (gate + exact dedup) — compared on text because which copy
    // of a duplicate survives a stream is arrival-order-defined
    val streamed = cat.read("cur", "docs").select("text").as[String].collect().toSet
    val expected = docs.toDF("doc_id", "text")
      .filter(TA.qualityScore(col("text")) >= 0.5)
      .select("text").distinct().as[String].collect().toSet
    assert(streamed === expected)
    assert(streamed.size === 3, "dup + both low-quality docs must be gone")
  }

  test("streaming sink commits one catalog version per batch, exactly-once under replay") {
    import graft.catalog.GraftCatalog
    import graft.streaming.CatalogStreamSink
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val cat = new GraftCatalog(spark,
      java.nio.file.Files.createTempDirectory("graft-sink").toString)
    cat.createTable("st", "ingest")

    val input = MemoryStream[(Long, String)]
    val sink = CatalogStreamSink.foreachBatchCommit(cat, "st", "ingest", "q1")
    val query = input.toDS().toDF("id", "payload")
      .writeStream.foreachBatch(sink)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-sink-ckpt").toString)
      .start()
    try {
      input.addData((1L, "a"), (2L, "b")); query.processAllAvailable()
      input.addData((3L, "c")); query.processAllAvailable()
      val versions = cat.snapshots("st", "ingest")
      assert(versions.map(_.commitId) === Seq("q1-batch-0", "q1-batch-1"))
      assert(cat.read("st", "ingest").count() === 3)

      // simulate Spark replaying batch 1 after a crash: no third version
      sink(Seq((3L, "c")).toDF("id", "payload"), 1L)
      assert(cat.snapshots("st", "ingest").size === 2)
      assert(cat.read("st", "ingest").count() === 3)

      // incremental read replays exactly the second batch
      assert(cat.readIncremental("st", "ingest", 0, 1)
        .select("id").as[Long].collect() === Array(3L))

      // replay guard survives snapshot expiry: after batch 0's version
      // ages out of retention, a re-run of batch 0 must STILL be a no-op
      // (the monotonic high-water mark on live commit ids catches it
      // even though the per-commitId check has forgotten the batch)
      cat.expireSnapshots("st", "ingest", retainLast = 1)
      assert(cat.snapshots("st", "ingest").size === 1)
      sink(Seq((1L, "a"), (2L, "b")).toDF("id", "payload"), 0L)
      assert(cat.snapshots("st", "ingest").size === 1,
        "expired-batch replay must not re-append")
    } finally query.stop()
  }

  test("CDC-MERGE sink: per-batch upserts converge to last-write-wins; replay is a no-op") {
    import graft.catalog.GraftCatalog
    import graft.streaming.CatalogStreamSink
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val cat = new GraftCatalog(spark,
      java.nio.file.Files.createTempDirectory("graft-cdc-sink").toString)
    cat.createTable("st", "mirror")

    val input = MemoryStream[(Long, String)]
    val sink = CatalogStreamSink.foreachBatchUpsert(cat, "st", "mirror", Seq("id"), "cdc")
    val query = input.toDS().toDF("id", "payload")
      .writeStream.foreachBatch(sink)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-cdc-ckpt").toString)
      .start()
    try {
      input.addData((1L, "a"), (2L, "b")); query.processAllAvailable()   // batch 0: inserts
      input.addData((1L, "a2"), (3L, "c")); query.processAllAvailable()  // batch 1: update + insert
      input.addData((2L, "b3")); query.processAllAvailable()             // batch 2: update again
      assert(cat.read("st", "mirror").as[(Long, String)].collect().toSet
        === Set((1L, "a2"), (2L, "b3"), (3L, "c")))
      // one version per batch, no data file was ever rewritten
      assert(cat.snapshots("st", "mirror").map(_.commitId)
        === Seq("cdc-batch-0", "cdc-batch-1", "cdc-batch-2"))
      // crash-replay of batch 1 must not fork a 4th version or undo batch 2
      sink(Seq((1L, "a2"), (3L, "c")).toDF("id", "payload"), 1L)
      assert(cat.snapshots("st", "mirror").size === 3)
      assert(cat.read("st", "mirror").as[(Long, String)].collect().toSet
        === Set((1L, "a2"), (2L, "b3"), (3L, "c")))
      // compaction folds the accumulated delete files into plain data
      cat.compact("st", "mirror", targetFileBytes = 256L * 1024 * 1024)
      assert(cat.deleteFileEntries("st", "mirror",
        cat.snapshots("st", "mirror").last).isEmpty)
      assert(cat.read("st", "mirror").as[(Long, String)].collect().toSet
        === Set((1L, "a2"), (2L, "b3"), (3L, "c")))
    } finally query.stop()
  }

  test("streaming as-of enrichment equals the batch as-of join on in-order feeds") {
    import graft.streaming.StreamAsOf
    import graft.streaming.StreamAsOf.In
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    def t(x: String) = Timestamp.valueOf(x)
    // two users; refs and probes interleaved, incl. same-ts tie (two refs
    // at one ts -> larger refId, the batch form's rule) and a pre-ref probe
    val batch1 = Seq(
      In(1L, isRef = true, t("2024-01-01 00:01:00"), 100L, 0L),
      In(1L, isRef = false, t("2024-01-01 00:00:30"), 0L, 10L), // before any ref
      In(1L, isRef = false, t("2024-01-01 00:02:00"), 0L, 11L),
      In(2L, isRef = true, t("2024-01-01 00:01:00"), 200L, 0L),
      In(2L, isRef = true, t("2024-01-01 00:01:00"), 201L, 0L)) // same-ts pair
    val batch2 = Seq(
      In(1L, isRef = true, t("2024-01-01 00:03:00"), 101L, 0L),
      In(1L, isRef = false, t("2024-01-01 00:03:00"), 0L, 12L), // exact-ts match
      In(2L, isRef = false, t("2024-01-01 00:05:00"), 0L, 20L))

    val input = MemoryStream[In]
    val query = StreamAsOf.enrich(input.toDS())
      .writeStream.format("memory").queryName("streamasof")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(batch1: _*); query.processAllAvailable()
      input.addData(batch2: _*); query.processAllAvailable()
      val streamed = spark.table("streamasof")
        .select("probeId", "asofRefId")
        .as[(Long, Option[Long])].collect().toMap

      // batch dual over the same rows
      val all = batch1 ++ batch2
      val probes = all.filter(!_.isRef).map(r => (r.probeId, r.key, r.ts))
        .toDF("probeId", "key", "ts")
      val refs = all.filter(_.isRef).map(r => (r.key, r.ts, r.refId))
        .toDF("key", "ts", "refId")
      val batchDual = graft.operators.AsOfJoin
        .asOf(probes, refs, Seq("key"), "ts", "ts", Seq("refId"))
        .select("probeId", "asof_refId")
        .as[(Long, Option[Long])].collect().toMap

      assert(streamed === batchDual)
      assert(streamed === Map(10L -> None, 11L -> Some(100L),
        12L -> Some(101L), 20L -> Some(201L)))
    } finally query.stop()
  }

  test("CMS merges across micro-batches by cell-wise addition: streamed sketch == batch sketch") {
    import graft.pipeline.Sketches
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    // the standing heavy-hitter monitor: per micro-batch, sketch ONLY the
    // batch (O(batch) work) and fold the ≤ d·w cells into the running
    // sketch — cell-wise addition IS the CMS merge, which is why the
    // shape works as a streaming aggregate at 100 TB (fixed-size state,
    // no keyspace-sized shuffle anywhere)
    val merged = scala.collection.mutable.Map.empty[(Int, Int), Long]
    val input = MemoryStream[String]
    val query = input.toDF().toDF("k").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Sketches.cmsBuild(batch, "k", depth = 4, width = 256)
          .collect().foreach { r =>
            val key = (r.getInt(0), r.getLong(1).toInt)
            merged(key) = merged.getOrElse(key, 0L) + r.getLong(2)
          }
      }.start()
    try {
      val b1 = Seq.fill(5)("alpha") ++ Seq.fill(2)("beta")
      val b2 = Seq.fill(3)("alpha") ++ Seq("gamma")
      input.addData(b1: _*); query.processAllAvailable()
      input.addData(b2: _*); query.processAllAvailable()
      val batchSketch = Sketches.cmsBuild((b1 ++ b2).toDF("k"), "k", depth = 4, width = 256)
        .collect().map(r => (r.getInt(0), r.getLong(1).toInt) -> r.getLong(2)).toMap
      assert(merged.toMap === batchSketch,
        "cell-wise merged micro-batch sketches must equal the one-shot sketch")
      // and the merged estimates behave: exact here, never undercounting
      val probeDf = Seq("alpha", "beta", "gamma", "absent").toDF("k")
      val sketchDf = merged.toSeq.map { case ((r, b), c) => (r, b.toLong, c) }
        .toDF("row_id", "bucket", "cnt")
      val estimates = Sketches.cmsEstimate(sketchDf, probeDf, "k", depth = 4, width = 256)
        .as[(String, Long)].collect().toMap
      assert(estimates("alpha") === 8L && estimates("beta") === 2L
        && estimates("gamma") === 1L && estimates("absent") === 0L)
    } finally query.stop()
  }

  test("topic broker over TCP: publish/produce/poll/consumer-group round-trip, " +
       "idempotent batch produce, distributed produce through the wire") {
    import graft.streaming.{FileTopic, TopicClient, TopicServer}
    import spark.implicits._
    val root = Files.createTempDirectory("graft-topic-srv").toString
    val topic = new FileTopic(root, "wire", partitions = 3)
    val server = new TopicServer(topic)
    val c = new TopicClient("127.0.0.1", server.boundPort)
    try {
      assert(c.ping())
      assert(c.partitions() === 3)
      // single publish lands where the embedded topic would put it
      val (p0, o0) = c.publish("k-1", "v-1", 1704067200000L)
      assert(p0 === topic.partitionFor("k-1") && o0 === 0L)
      // idempotent batch produce: a re-sent batch id appends nothing
      val recs = (0 until 40).map(i => (s"bk-$i", s"bv-$i"))
      val n1 = c.produce(recs, 1704067201000L, batchId = Some("epoch-7"))
      val n2 = c.produce(recs, 1704067201000L, batchId = Some("epoch-7"))
      assert(n1 === 40L)
      assert(n2 === 0L, "a client retry after a lost ACK must not double-publish")
      // polled records agree with the embedded log, offsets dense
      (0 until 3).foreach { p =>
        val viaWire = c.poll(p, 0L)
        val direct = topic.poll(p, 0L)
        assert(viaWire.map(r => (r._2, r._4, r._5)) ===
          direct.map(r => (r.offset, r.key, r.value)), s"partition $p diverges")
        assert(viaWire.map(_._2) === viaWire.indices.map(_.toLong))
        assert(c.endOffset(p) === direct.size.toLong)
      }
      // consumer-group offsets over the wire
      assert(c.committedOffset("g1", 0) === 0L)
      c.commitOffset("g1", 0, 5L)
      assert(c.committedOffset("g1", 0) === 5L)
      assert(topic.committedOffset("g1", 0) === 5L)
      // distributed produce THROUGH the broker: every Spark task holds a
      // producer connection; totals conserved, replay appends nothing
      val docs = (0L until 120L).map(i => (i, s"payload-$i")).toDF("k", "v")
        .repartition(5)
      val port = server.boundPort
      val sent = TopicClient.produceDistributed(docs, "127.0.0.1", port,
        tsMs = 1704067202000L)
      assert(sent === 120L)
      val again = TopicClient.produceDistributed(docs, "127.0.0.1", port,
        tsMs = 1704067202000L)
      assert(again === 0L, "a replayed distributed produce must append nothing")
      val total = (0 until 3).map(p => topic.poll(p, 0L).size).sum
      assert(total === 1 + 40 + 120)
    } finally { c.close(); server.stop() }
  }

  test("topic broker from a SECOND JVM: a foreign-process producer lands its " +
       "batch exactly once (retry deduped by producer-epoch batch id)") {
    import graft.streaming.{FileTopic, TopicServer}
    val root = Files.createTempDirectory("graft-topic-2jvm").toString
    val topic = new FileTopic(root, "wire2", partitions = 2)
    val server = new TopicServer(topic)
    try {
      val classpath = System.getProperty("java.class.path")
      val cmd = Seq(s"${System.getProperty("java.home")}/bin/java",
        "-cp", classpath, "graft.tools.TopicProducerAgent",
        server.boundPort.toString, "30", "1704067200000", "epoch-x1")
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(true)
      val proc = pb.start()
      val outLines = scala.io.Source.fromInputStream(proc.getInputStream).getLines().toList
      val rc = proc.waitFor()
      assert(rc === 0, s"agent failed: rc=$rc out=${outLines.mkString("; ")}")
      val line = outLines.find(_.startsWith("AGENT_APPENDED")).getOrElse(
        fail(s"no AGENT_APPENDED line in: ${outLines.mkString("; ")}"))
      assert(line === "AGENT_APPENDED 30 0",
        "the foreign producer's first send lands fully, its retry not at all")
      val total = (0 until 2).map(p => topic.poll(p, 0L).size).sum
      assert(total === 30)
      assert((0 until 2).forall(p =>
        topic.poll(p, 0L).map(_.offset) == topic.poll(p, 0L).indices.map(_.toLong)))
    } finally server.stop()
  }

  test("the reference sync DAG as ONE exactly-once streaming job: " +
       "catalog cdc source -> path localization -> atomic replica " +
       "commits; checkpoint restart across a replace converges") {
    // t1..t6 of iceberg-arch-geo-distributed-ha.md:1314-1367 composed
    // as a single Structured Streaming query: the manifest-diff cdc
    // source IS t1 (list added)/t2 (plan), the stream transform runs t5
    // (metadata path localization, codegen'd when-chain), and the
    // foreachBatch sink is t6 (one CAS commit per batch on the replica,
    // idempotent under replay). t3/t4 (physical copy + verify) are the
    // row payload itself here - the rows ARE the replicated state.
    val primaryWh = Files.createTempDirectory("graft-dag-primary").toString
    val replicaWh = Files.createTempDirectory("graft-dag-replica").toString
    val ckpt = Files.createTempDirectory("graft-dag-ckpt").toString
    val primary = new graft.catalog.GraftCatalog(spark, primaryWh)
    val replica = new graft.catalog.GraftCatalog(spark, replicaWh)
    primary.createTable("g", "files")
    replica.createTable("g", "files")
    val mappings = Seq("s3://us-east/" -> "s3://eu-west/")

    primary.commitAppend("g", "files", Seq(
      (1L, "s3://us-east/a.parquet", 100L),
      (2L, "s3://us-east/b.parquet", 200L)).toDF("file_id", "url", "bytes"))
    primary.commitAppend("g", "files",
      Seq((3L, "s3://us-east/c.parquet", 300L)).toDF("file_id", "url", "bytes"))

    def runOnce(): Unit = {
      val q = spark.readStream
        .format("graft.streaming.GraftTableSourceProvider")
        .option("warehouse", primaryWh).option("table", "g.files")
        .option("mode", "cdc").option("starting-seq", "earliest")
        .load()
        .withColumn("url",
          graft.operators.PathLocalizer.localize(col("url"), mappings))
        .writeStream
        .foreachBatch(graft.streaming.CatalogStreamSink.foreachBatchApplyCdc(
          replica, "g", "files", keyCols = Seq("file_id")))
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    runOnce()
    assert(replica.read("g", "files").select("file_id", "url", "bytes")
      .as[(Long, String, Long)].collect().toSet === Set(
        (1L, "s3://eu-west/a.parquet", 100L),
        (2L, "s3://eu-west/b.parquet", 200L),
        (3L, "s3://eu-west/c.parquet", 300L)),
      "replica must hold the LOCALIZED state after the first run")

    // a REPLACE on the primary (compaction dropping file 2, updating 3)
    // streams as the documented row-level cdc diff across restart
    primary.commitReplace("g", "files", Seq(
      (1L, "s3://us-east/a.parquet", 100L),
      (3L, "s3://us-east/c.parquet", 333L)).toDF("file_id", "url", "bytes"))
    primary.commitAppend("g", "files",
      Seq((4L, "s3://us-east/d.parquet", 400L)).toDF("file_id", "url", "bytes"))
    runOnce()
    assert(replica.read("g", "files").select("file_id", "url", "bytes")
      .as[(Long, String, Long)].collect().toSet === Set(
        (1L, "s3://eu-west/a.parquet", 100L),
        (3L, "s3://eu-west/c.parquet", 333L),
        (4L, "s3://eu-west/d.parquet", 400L)),
      "the replace must converge: file 2 erased, file 3 updated, 4 added")

    // replay with nothing new: exactly-once means NO new replica version
    val vBefore = replica.latest("g", "files").get.seq
    runOnce()
    assert(replica.latest("g", "files").get.seq === vBefore,
      "an idle restart must not publish no-op versions")
  }

  test("sync-DAG churn endurance: 96 MoR churn epochs with MID-STREAM " +
       "maintenance (rewrite_position_deletes + compact) and checkpoint " +
       "restarts — maintenance commits diff to ZERO cdc rows (no replica " +
       "pollution), the replica converges exactly, and expiring an " +
       "UNPROCESSED source version fails the stream loudly") {
    // The documented interaction (VERDICT r10 #6): the cdc source reads
    // maintenance REPLACES (compaction, rewrite_position_deletes)
    // through changesBetween's row-level diff, which resolves them to
    // an EMPTY change set — the sink's empty-batch guard then publishes
    // no replica version. Retention is the one maintenance op that can
    // break an in-flight stream: expiring a version the checkpoint has
    // not processed yet makes the next incremental read refuse loudly
    // (never silently skip data) — pinning that failure mode is part of
    // the contract.
    val primaryWh = Files.createTempDirectory("graft-churn-primary").toString
    val replicaWh = Files.createTempDirectory("graft-churn-replica").toString
    val ckpt = Files.createTempDirectory("graft-churn-ckpt").toString
    val primary = new graft.catalog.GraftCatalog(spark, primaryWh)
    val replica = new graft.catalog.GraftCatalog(spark, replicaWh)
    primary.createTable("g", "churn")
    replica.createTable("g", "churn")

    // seed + 96 churn epochs: appends, MoR equality deletes, MoR
    // position deletes — the reference's steady-state write mix
    primary.commitAppend("g", "churn",
      (0L until 40L).map(i => (i, s"v$i")).toDF("id", "v"))
    var nextId = 40L
    (1 to 96).foreach { ep =>
      ep % 3 match {
        case 0 => // MoR equality delete of one live low id
          primary.commitDelete("g", "churn",
            Seq(Tuple1(ep.toLong % 13)).toDF("id"))
        case 1 =>
          primary.commitAppend("g", "churn",
            Seq((nextId, s"v$nextId"), (nextId + 1, s"v${nextId + 1}"))
              .toDF("id", "v"))
          nextId += 2
        case 2 => // MoR position delete via the row-lineage probe
          primary.commitDeletePositions("g", "churn",
            primary.positionsWhere("g", "churn", col("id") === (100L + ep)))
      }
    }

    def runOnce(): Unit = {
      val q = spark.readStream
        .format("graft.streaming.GraftTableSourceProvider")
        .option("warehouse", primaryWh).option("table", "g.churn")
        .option("mode", "cdc").option("starting-seq", "earliest")
        .load()
        .writeStream
        .foreachBatch(graft.streaming.CatalogStreamSink.foreachBatchApplyCdc(
          replica, "g", "churn", keyCols = Seq("id"), queryTag = "churn"))
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    runOnce() // drain the 97 churn commits
    def stateOf(c: graft.catalog.GraftCatalog): Set[(Long, String)] =
      c.read("g", "churn").select("id", "v").as[(Long, String)].collect().toSet
    assert(stateOf(replica) === stateOf(primary),
      "replica must converge through the full churn")

    // MID-STREAM MAINTENANCE on the source: position-delete compaction
    // then a full compact — both replaces, both must stream as ZERO rows
    val replicaSeqBefore = replica.latest("g", "churn").get.seq
    primary.rewritePositionDeletes("g", "churn"): Unit
    primary.compact("g", "churn", 128L * 1024 * 1024): Unit
    runOnce()
    assert(replica.latest("g", "churn").get.seq === replicaSeqBefore,
      "maintenance commits must NOT publish replica versions")
    assert(stateOf(replica) === stateOf(primary))

    // more churn after maintenance, restart again: exact convergence
    primary.commitAppend("g", "churn",
      Seq((9000L, "late")).toDF("id", "v"))
    primary.commitDelete("g", "churn", Seq(Tuple1(1L)).toDF("id"))
    runOnce()
    assert(stateOf(replica) === stateOf(primary),
      "post-maintenance churn must keep converging across restarts")

    // retention hazard, pinned: expire source versions the checkpoint
    // HAS processed -> harmless; then new churn + expire THAT before
    // the stream sees it -> the next run must fail LOUDLY, not skip
    primary.commitAppend("g", "churn",
      Seq((9001L, "doomed")).toDF("id", "v"))
    primary.expireSnapshots("g", "churn", retainLast = 1): Unit
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runOnce()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(m => Option(m.getMessage).getOrElse(""))
      .mkString("\n")
    assert(msgs.contains("no version") || msgs.contains("expired"),
      s"expiring unprocessed versions must fail loudly, got:\n$msgs")
  }

  test("DerivedStateWorker (round-14): one commit-signal stream keeps an " +
       "MV and a persisted IVF-PQ index fresh — each window refreshes " +
       "exactly once, replayed/empty signals no-op via the watermarks, " +
       "deletes purge the index, and a checkpoint restart stays " +
       "exactly-once") {
    import graft.catalog.GraftCatalog
    import graft.pipeline.Similarity
    import graft.streaming.DerivedStateWorker
    val wh = Files.createTempDirectory("graft-dsw-wh").toString
    val ckpt = Files.createTempDirectory("graft-dsw-ckpt").toString
    val cat = new GraftCatalog(spark, wh)
    val dim = 8
    def vecs(from: Long, n: Int) = (0 until n).map { i =>
      (from + i, Array.tabulate(dim)(j =>
        (((from + i) * 7 + j) % 13 - 6).toFloat / 6f))
    }
    cat.createTable("w", "base")
    cat.commitAppend("w", "base", vecs(0, 300).toDF("vec_id", "embedding"))
    val c = graft.catalog.GraftSparkCatalog.registerSqlCatalog(spark, wh)
    spark.sql(s"""CREATE MATERIALIZED VIEW $c.w.stats AS
      SELECT vec_id % 5 AS grp, count(*) AS cnt
      FROM $c.w.base GROUP BY vec_id % 5""")
    assert(cat.tableProperties("w", "stats")("graft.mv.mode") === "incremental")
    Similarity.buildIvfPqIndexForTable(cat, "w", "ix", "w", "base",
      nlist = 4, m = 4, ksub = 8)

    def mvGot() = spark.sql(s"SELECT grp, cnt FROM $c.w.stats ORDER BY grp")
      .collect().toSeq
    def mvWant() = spark.sql(s"SELECT vec_id % 5 AS grp, count(*) AS cnt " +
      s"FROM $c.w.base GROUP BY vec_id % 5 ORDER BY grp").collect().toSeq
    def baseHead() = cat.latest("w", "base").get.seq

    // a NONEXISTENT target rides along: per-target isolation means its
    // per-batch failure is logged and every OTHER target keeps
    // refreshing (one bad entry must not kill the maintenance stream)
    val worker = DerivedStateWorker.start(spark, wh, "w", "base",
      mvs = Seq(("w", "ghost"), ("w", "stats")),
      ivfPqIndexes = Seq(("w", "ix")),
      checkpointDir = ckpt)
    try {
      // window 1: an append and a MoR delete
      cat.commitAppend("w", "base", vecs(1000, 50).toDF("vec_id", "embedding"))
      cat.commitDelete("w", "base", Seq(3L, 7L).toDF("vec_id"))
      worker.processAllAvailable()
      assert(mvGot() === mvWant())
      assert(cat.tableProperties("w", "stats")("graft.mv.base-seq").toLong
        === baseHead())
      assert(cat.tableProperties("w", "ix_codes")(Similarity.AnnBaseSeqProp)
        .toLong === baseHead())
      val codes = cat.read("w", "ix_codes")
      assert(codes.filter(col("neighbor_id") === 1049L).count() === 1L,
        "the appended batch must be encoded into the index")
      assert(codes.filter(col("neighbor_id").isin(3L, 7L)).count() === 0L,
        "deleted ids must purge from the index")

      // an EMPTY signal (no commits): neither derived state re-commits
      val (mvSeq, ixSeq) = (cat.latest("w", "stats").get.seq,
        cat.latest("w", "ix_codes").get.seq)
      worker.processAllAvailable()
      assert(cat.latest("w", "stats").get.seq === mvSeq)
      assert(cat.latest("w", "ix_codes").get.seq === ixSeq)
      // a REPLAYED window is a no-op through the watermark, the same
      // idempotence a (queryTag, batchId)-guarded sink enforces
      assert(Similarity.refreshIvfPqIndex(cat, "w", "ix") === "noop")

      // window 2 while the worker runs
      cat.commitAppend("w", "base", vecs(2000, 30).toDF("vec_id", "embedding"))
      worker.processAllAvailable()
      assert(mvGot() === mvWant())
      assert(cat.latest("w", "stats").get.seq === mvSeq + 1,
        "one window = exactly one MV refresh commit")
    } finally worker.stop()

    // checkpoint RESTART: the new worker resumes the signal stream and
    // stays exactly-once (no re-refresh of already-applied windows)
    val mvSeqBefore = cat.latest("w", "stats").get.seq
    cat.commitAppend("w", "base", vecs(3000, 20).toDF("vec_id", "embedding"))
    val worker2 = DerivedStateWorker.start(spark, wh, "w", "base",
      mvs = Seq(("w", "stats")), ivfPqIndexes = Seq(("w", "ix")),
      checkpointDir = ckpt)
    try {
      worker2.processAllAvailable()
      assert(mvGot() === mvWant())
      assert(cat.latest("w", "stats").get.seq === mvSeqBefore + 1)
      assert(cat.read("w", "ix_codes")
        .filter(col("neighbor_id") === 3019L).count() === 1L)
    } finally worker2.stop()
  }

  test("streaming semantic ADMISSION (round-14 composition): each " +
       "micro-batch gates against the admitted corpus via the persisted " +
       "IVF index (semDeDupIncremental), only novel vectors commit " +
       "(idempotent batch commitId), the index refreshes in the same " +
       "foreachBatch — so a near-dup of an EARLIER batch's admission is " +
       "rejected too") {
    import graft.catalog.GraftCatalog
    import graft.pipeline.Similarity
    val wh = Files.createTempDirectory("graft-adm-wh").toString
    val cat = new GraftCatalog(spark, wh)
    val dim = 8
    // axis clusters with jitter: distinct axes are near-orthogonal, so
    // cross-axis cosines sit far below the gate threshold while a
    // scaled copy scores ~1 (the drift-test fixture family)
    def cvec(axis: Int, i: Long): Seq[Float] = (0 until dim).map(j =>
      (if (j == axis) 1.0f else 0.0f) + ((i * 7 + j) % 5) * 0.01f)
    cat.createTable("adm", "corpus")
    cat.commitAppend("adm", "corpus",
      (0L until 100L).map(i => (i, cvec((i % 3).toInt, i)))
        .toDF("vec_id", "embedding"))
    Similarity.buildIvfPqIndexForTable(cat, "adm", "gate", "adm", "corpus",
      nlist = 4, m = 4, ksub = 8)

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Seq[Float])]
    val q = in.toDF().toDF("vec_id", "embedding")
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("graft-adm-ck").toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val batch = df.select(col("vec_id"),
          col("embedding").cast("array<float>").as("embedding"))
          .localCheckpoint()
        val dups = Similarity.semDeDupIncremental(cat, "adm", "gate",
            batch, tau = 0.95)
          .select(col("incoming_id").as("vec_id")).distinct()
        val admitted = batch.join(dups, Seq("vec_id"), "left_anti")
        // idempotent under replay: the batch id is the commit id
        try cat.commitAppend("adm", "corpus", admitted,
          commitId = Some(s"ingest-$batchId")): Unit
        catch { case _: GraftCatalog.DuplicateCommitException => () }
        Similarity.refreshIvfPqIndex(cat, "adm", "gate"): Unit
      }.start()
    try {
      // batch 1: two novel vectors (new axes) + a near-copy of corpus id 5
      in.addData((1000L, cvec(5, 1L)), (1001L, cvec(6, 2L)),
        (9005L, cvec((5 % 3).toInt, 5L).map(x => x * 1.01f)))
      q.processAllAvailable()
      val ids1 = cat.read("adm", "corpus").select("vec_id")
        .as[Long].collect().toSet
      assert(ids1.contains(1000L) && ids1.contains(1001L),
        "novel vectors must admit")
      assert(!ids1.contains(9005L), "a corpus near-dup must be rejected")

      // batch 2: a near-copy of BATCH 1's admitted vector — the gate
      // must see it because batch 1 refreshed the index
      in.addData((9100L, cvec(5, 1L).map(x => x * 0.99f)),
        (1002L, cvec(7, 3L)))
      q.processAllAvailable()
      val ids2 = cat.read("adm", "corpus").select("vec_id")
        .as[Long].collect().toSet
      assert(!ids2.contains(9100L),
        "a near-dup of an earlier ADMITTED batch must be rejected")
      assert(ids2.contains(1002L))
      // the index watermark tracks every admission commit
      assert(cat.tableProperties("adm", "gate_codes")(
        Similarity.AnnBaseSeqProp).toLong ===
        cat.latest("adm", "corpus").get.seq)
    } finally q.stop()
  }

  test("DerivedStateWorker.startAll discovers every derived state in " +
       "the warehouse by its recorded base (MVs via graft.mv.base, " +
       "IVF-PQ indexes via graft.ann.base on their codes table) and " +
       "starts one worker per base table; full-mode MVs (no recorded " +
       "base) are skipped; churn on both bases refreshes both sides") {
    import graft.catalog.GraftCatalog
    import graft.pipeline.Similarity
    import graft.streaming.DerivedStateWorker
    val wh = Files.createTempDirectory("graft-dsall-wh").toString
    val ckptRoot = Files.createTempDirectory("graft-dsall-ck").toString
    val cat = new GraftCatalog(spark, wh)
    val c = graft.catalog.GraftSparkCatalog.registerSqlCatalog(spark, wh)
    // base 1: a table with an incremental MV and an IVF-PQ index
    spark.sql(s"CREATE TABLE $c.a.b1 (vec_id BIGINT, embedding ARRAY<FLOAT>)")
    (0 until 200).map(i => (i.toLong,
        Array.tabulate(8)(j => ((i * 7 + j) % 13 - 6).toFloat / 6f)))
      .toDF("vec_id", "embedding").createOrReplaceTempView("dsall_src1")
    spark.sql(s"INSERT INTO $c.a.b1 SELECT * FROM dsall_src1").collect(): Unit
    spark.sql(s"CREATE MATERIALIZED VIEW $c.a.m1 AS " +
      s"SELECT vec_id % 4 AS grp, count(*) AS cnt FROM $c.a.b1 " +
      "GROUP BY vec_id % 4")
    Similarity.buildIvfPqIndexForTable(cat, "a", "ix", "a", "b1",
      nlist = 4, m = 4, ksub = 8)
    // base 2 in ANOTHER namespace: one MV
    spark.sql(s"CREATE TABLE $c.b.b2 (k BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $c.b.b2 VALUES (1, 10), (2, 20)").collect(): Unit
    spark.sql(s"CREATE MATERIALIZED VIEW $c.b.m2 AS " +
      s"SELECT k, sum(v) AS sv, count(*) AS cnt FROM $c.b.b2 GROUP BY k")
    // a FULL-mode MV (join — no recorded base): must be skipped, not die
    spark.sql(s"CREATE MATERIALIZED VIEW $c.b.mj AS " +
      s"SELECT t1.k, count(*) AS cnt FROM $c.b.b2 t1 " +
      s"JOIN $c.b.b2 t2 ON t1.k = t2.k GROUP BY t1.k")
    assert(cat.tableProperties("b", "mj")("graft.mv.mode") === "full")

    val workers = DerivedStateWorker.startAll(spark, wh, ckptRoot)
    try {
      assert(workers.size === 2, s"one worker per base, got ${workers.size}")
      spark.sql(s"INSERT INTO $c.a.b1 SELECT vec_id + 1000, embedding " +
        "FROM dsall_src1 WHERE vec_id < 40").collect(): Unit
      spark.sql(s"INSERT INTO $c.b.b2 VALUES (1, 5), (3, 30)").collect(): Unit
      workers.foreach(_.processAllAvailable())
      assert(spark.sql(s"SELECT grp, cnt FROM $c.a.m1 ORDER BY grp")
        .collect().toSeq ===
        spark.sql(s"SELECT vec_id % 4 AS grp, count(*) AS cnt " +
          s"FROM $c.a.b1 GROUP BY vec_id % 4 ORDER BY grp").collect().toSeq)
      assert(spark.sql(s"SELECT k, sv, cnt FROM $c.b.m2 ORDER BY k")
        .collect().toSeq ===
        spark.sql(s"SELECT k, sum(v) AS sv, count(*) AS cnt FROM $c.b.b2 " +
          "GROUP BY k ORDER BY k").collect().toSeq)
      assert(cat.read("a", "ix_codes")
        .filter(col("neighbor_id") === 1039L).count() === 1L,
        "the discovered index must follow base-1 commits")
      // the full-mode join MV was skipped: still serving its stale state
      assert(spark.sql(s"SELECT count(*) FROM $c.b.mj").head().getLong(0)
        === 2L)
    } finally workers.foreach(_.stop())
  }

  test("DerivedStateWorker pooled fan-in (round-15): startAll over 8 " +
       "base tables with poolSize=3 yields exactly 3 streams (not 8), " +
       "each multiplexing its members' commit signals; churn on every " +
       "base refreshes every MV through the pool; a pool restart over " +
       "the same checkpoints replays exactly-once (no double-apply, " +
       "and new churn still refreshes)") {
    import graft.catalog.GraftCatalog
    import graft.streaming.DerivedStateWorker
    val wh = Files.createTempDirectory("graft-dspool-wh").toString
    val ckptRoot = Files.createTempDirectory("graft-dspool-ck").toString
    val cat = new GraftCatalog(spark, wh)
    val c = graft.catalog.GraftSparkCatalog.registerSqlCatalog(spark, wh)
    val n = 8
    (0 until n).foreach { i =>
      spark.sql(s"CREATE TABLE $c.p.b$i (k BIGINT, v BIGINT)")
      spark.sql(s"INSERT INTO $c.p.b$i VALUES (1, ${10 * (i + 1)}), (2, 7)")
        .collect(): Unit
      spark.sql(s"CREATE MATERIALIZED VIEW $c.p.m$i AS " +
        s"SELECT k, sum(v) AS sv, count(*) AS cnt FROM $c.p.b$i GROUP BY k")
    }
    def mvMatchesBase(i: Int): Unit =
      assert(spark.sql(s"SELECT k, sv, cnt FROM $c.p.m$i ORDER BY k")
        .collect().toSeq ===
        spark.sql(s"SELECT k, sum(v) AS sv, count(*) AS cnt FROM $c.p.b$i " +
          "GROUP BY k ORDER BY k").collect().toSeq, s"mv m$i")
    val workers = DerivedStateWorker.startAll(spark, wh, ckptRoot,
      poolSize = 3)
    try {
      assert(workers.size === 3,
        s"8 bases over poolSize=3 must yield 3 pooled streams, got " +
          s"${workers.size}")
      (0 until n).foreach { i =>
        spark.sql(s"INSERT INTO $c.p.b$i VALUES (1, $i), (3, 3)")
          .collect(): Unit
      }
      workers.foreach(_.processAllAvailable())
      (0 until n).foreach(mvMatchesBase)
    } finally workers.foreach(_.stop())
    // restart over the SAME checkpoint root: replayed batches no-op
    // through the MV watermarks, fresh churn still refreshes
    val workers2 = DerivedStateWorker.startAll(spark, wh, ckptRoot,
      poolSize = 3)
    try {
      spark.sql(s"INSERT INTO $c.p.b0 VALUES (9, 99)").collect(): Unit
      spark.sql(s"INSERT INTO $c.p.b7 VALUES (9, 42)").collect(): Unit
      workers2.foreach(_.processAllAvailable())
      (0 until n).foreach(mvMatchesBase)
      assert(spark.sql(s"SELECT sv FROM $c.p.m0 WHERE k = 9")
        .head().getLong(0) === 99L, "no double-apply across restart")
    } finally workers2.foreach(_.stop())
    cat.listTables("p") // touch to keep cat referenced
  }

  test("DerivedStateWorker x hybrid MV (round-14 composition): the " +
       "worker session maintains a mixed avg+min/max view whose stored " +
       "definition spells an UNQUALIFIED base name — a MoR delete window " +
       "takes the group-scoped hybrid path inside foreachBatch, resolving " +
       "under the view's defining context, and matches the recompute") {
    import graft.catalog.GraftCatalog
    import graft.streaming.DerivedStateWorker
    val wh = Files.createTempDirectory("graft-dswh-wh").toString
    val ckpt = Files.createTempDirectory("graft-dswh-ckpt").toString
    val cat = new GraftCatalog(spark, wh)
    val c = graft.catalog.GraftSparkCatalog.registerSqlCatalog(spark, wh)
    spark.sql(s"CREATE TABLE $c.h.base (k BIGINT, v BIGINT)")
    (0 until 400).map(i => ((i % 8).toLong, i.toLong * 3)).toDF("k", "v")
      .createOrReplaceTempView("dswh_src")
    spark.sql(s"INSERT INTO $c.h.base SELECT * FROM dswh_src").collect(): Unit
    // defined under USE: the stored query text says 'FROM base'
    spark.sql(s"USE $c.h")
    try spark.sql("CREATE MATERIALIZED VIEW mx AS " +
      "SELECT k, count(*) AS cnt, sum(v) AS sv, avg(v) AS av, " +
      "min(v) AS mn, max(v) AS mx FROM base GROUP BY k")
    finally spark.sql("USE spark_catalog.default")
    assert(cat.tableProperties("h", "mx")("graft.mv.mode") === "incremental")

    def want() = spark.sql(s"SELECT k, count(*) AS cnt, sum(v) AS sv, " +
      s"avg(v) AS av, min(v) AS mn, max(v) AS mx FROM $c.h.base " +
      "GROUP BY k ORDER BY k").collect().toSeq
    def got() = spark.sql(
      s"SELECT k, cnt, sv, av, mn, mx FROM $c.h.mx ORDER BY k")
      .collect().toSeq

    val worker = DerivedStateWorker.start(spark, wh, "h", "base",
      mvs = Seq(("h", "mx")), checkpointDir = ckpt)
    try {
      // window 1: insert-only -> plain incremental inside the worker
      spark.sql(s"INSERT INTO $c.h.base VALUES (1, 9999), (9, 1)")
      worker.processAllAvailable()
      assert(got() === want())
      // window 2: a MoR delete erasing group 3's max -> the worker's
      // refresh must take the hybrid path and re-derive group 3 from
      // the DEFINING context (the worker session sits in spark_catalog)
      val prevMode = spark.conf.getOption("spark.graft.rowlevel.mode")
      spark.conf.set("spark.graft.rowlevel.mode", "merge-on-read")
      try spark.sql(s"DELETE FROM $c.h.base WHERE k = 3 AND v = " +
        s"(SELECT max(v) FROM $c.h.base WHERE k = 3)")
      finally prevMode match {
        case Some(m) => spark.conf.set("spark.graft.rowlevel.mode", m)
        case None => spark.conf.unset("spark.graft.rowlevel.mode")
      }
      val mvSeq0 = cat.latest("h", "mx").get.seq
      worker.processAllAvailable()
      assert(cat.latest("h", "mx").get.seq === mvSeq0 + 1,
        "the delete window must refresh exactly once")
      assert(cat.tableProperties("h", "mx")("graft.mv.mode") === "incremental")
      got().zip(want()).foreach { case (g, e) =>
        assert(g.getLong(0) === e.getLong(0))
        assert(g.getLong(1) === e.getLong(1) && g.getLong(2) === e.getLong(2))
        assert(math.abs(g.getDouble(3) - e.getDouble(3)) <= 1e-9 *
          math.max(1.0, math.abs(e.getDouble(3))))
        assert(g.getLong(4) === e.getLong(4) && g.getLong(5) === e.getLong(5),
          s"min/max must re-derive for k=${g.getLong(0)}")
      }
    } finally worker.stop()
  }

  test("atomic multi-table fan-out sink (round-14): each micro-batch " +
       "splits across TWO tables as ONE transaction — both tables get " +
       "their slice or neither does — and a replayed batch is a no-op " +
       "even when its transaction already applied out-of-band") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.CatalogStreamSink
    import org.apache.spark.sql.DataFrame
    val wh = Files.createTempDirectory("graft-fanout-wh").toString
    val ckpt = Files.createTempDirectory("graft-fanout-ckpt").toString
    val cat = new graft.catalog.GraftCatalog(spark, wh)
    cat.createTable("f", "evens")
    cat.createTable("f", "odds")
    cat.commitAppend("f", "evens", Seq((0L, "seed")).toDF("id", "v"))
    cat.commitAppend("f", "odds", Seq((1L, "seed")).toDF("id", "v"))
    val sink = CatalogStreamSink.foreachBatchFanout(cat, Seq(
      ("f", "evens", (d: DataFrame) => d.filter(col("id") % 2 === 0)),
      ("f", "odds", (d: DataFrame) => d.filter(col("id") % 2 === 1))), "fx")

    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("id", "v").writeStream
      .foreachBatch(sink)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      input.addData((2L, "a"), (3L, "b"), (4L, "c"))
      q.processAllAvailable()
    } finally q.stop()
    assert(cat.read("f", "evens").select("id").as[Long].collect().sorted
      === Seq(0L, 2L, 4L))
    assert(cat.read("f", "odds").select("id").as[Long].collect().sorted
      === Seq(1L, 3L))
    // both heads carry the SAME transaction's parts
    val ec = cat.latest("f", "evens").get.commitId
    val oc = cat.latest("f", "odds").get.commitId
    assert(ec.startsWith("txn-fx-b0-") && oc.startsWith("txn-fx-b0-"),
      s"expected one transaction across both heads, got $ec / $oc")

    // direct at-least-once replay of batch 0 (the crashed-offsets case):
    // pending state resolves, the commit-id probe reads it as done, and
    // NOTHING lands twice
    sink(Seq((2L, "a"), (3L, "b"), (4L, "c")).toDF("id", "v"), 0L)
    assert(cat.read("f", "evens").count() === 3L)
    assert(cat.read("f", "odds").count() === 2L)
    assert(cat.latest("f", "evens").get.commitId === ec)
    // no staging litter from the replay path
    assert(cat.listBranches("f", "evens").isEmpty)
    assert(cat.listBranches("f", "odds").isEmpty)
  }
}
