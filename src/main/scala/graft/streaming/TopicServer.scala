package graft.streaming

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TCP BROKER twin of [[FileTopic]] — the network seam the reference's
  * event port assumes (`legacy-java/.../EventPort.java:20-101`: a
  * Kafka-style pub/sub boundary producers and consumers reach over the
  * wire, never through in-process calls). The broker OWNS the log: the
  * embedded FileTopic stays the storage engine, remote producers and
  * consumers speak a JSON-line protocol on the
  * CommitGateServer/CatalogServer framing.
  *
  * Wire protocol (one JSON object per line, one reply per line):
  *
  *   {"op":"produce","ts":t,"batch_id":b?,"records":[{"k":..,"v":..},..]}
  *                         -> {"ok":true,"appended":n}
  *   {"op":"publish","key":k,"value":v,"ts":t}
  *                         -> {"ok":true,"partition":p,"offset":o}
  *   {"op":"poll","partition":p,"from":o,"max":m?}
  *                         -> {"ok":true,"records":[{...},..]}
  *   {"op":"end_offset","partition":p}   -> {"ok":true,"offset":o}
  *   {"op":"partitions"}                 -> {"ok":true,"partitions":n}
  *   {"op":"committed","group":g,"partition":p}   -> {"ok":true,"offset":o}
  *   {"op":"commit_offset","group":g,"partition":p,"offset":o} -> {"ok":true}
  *   {"op":"ping"}                       -> {"ok":true,"pong":true}
  *
  * Idempotent produce — the broker dual of the distributed producer's
  * content-derived batch tag: a `batch_id` keys PRODUCER-EPOCH dedup.
  * The broker partitions the batch by key, tags each partition's
  * segment with md5(batch_id | partition), and a re-sent batch (client
  * retry after a lost ACK — the classic duplicate-publish window)
  * appends nothing and reports 0. Without a batch_id the produce is
  * plain at-least-once, exactly like a non-idempotent Kafka producer.
  *
  * Per-partition locks serialize concurrent connections appending to
  * the same partition (the broker's single-writer-per-partition
  * invariant enforced server-side, so N producer connections never
  * trip the storage layer's loud createLink collision); different
  * partitions append concurrently. Failures return
  * {"ok":false,"error":..} — a protocol error surfaces to the caller,
  * never kills the broker.
  */
final class TopicServer(topic: FileTopic, port: Int = 0) {

  private val mapper = new ObjectMapper()
  private val server = new ServerSocket(port)
  @volatile private var running = true
  private val partLocks = Array.fill(topic.partitions)(new Object)

  def boundPort: Int = server.getLocalPort

  private val acceptLoop = new Thread(() => {
    while (running) {
      try {
        val sock = server.accept()
        val t = new Thread(() => handle(sock), s"topic-conn-${sock.getPort}")
        t.setDaemon(true)
        t.start()
      } catch {
        case _: java.net.SocketException if !running =>
        case e: Exception if running =>
          System.err.println(s"[topic] accept failed: ${e.getMessage}")
      }
    }
  }, "topic-accept")
  acceptLoop.setDaemon(true)
  acceptLoop.start()

  private def handle(sock: Socket): Unit = {
    val in = new BufferedReader(new InputStreamReader(sock.getInputStream, UTF_8))
    val out = new PrintWriter(sock.getOutputStream, true)
    try {
      var line = in.readLine()
      while (line != null) {
        out.println(dispatch(line))
        line = in.readLine()
      }
    } finally sock.close()
  }

  private def dispatch(line: String): String = {
    val reply: ObjectNode = mapper.createObjectNode()
    try {
      val req = mapper.readTree(line)
      req.get("op").asText() match {
        case "produce" =>
          val ts = req.get("ts").asLong()
          val batchId = Option(req.get("batch_id")).filterNot(_.isNull).map(_.asText())
          val recs = {
            val it = req.get("records").elements()
            val b = Seq.newBuilder[(String, String)]
            while (it.hasNext) {
              val r = it.next()
              b += ((r.get("k").asText(), r.get("v").asText()))
            }
            b.result()
          }
          val byPart = recs.groupBy { case (k, _) => topic.partitionFor(k) }
          var appended = 0L
          byPart.toSeq.sortBy(_._1).foreach { case (p, rs) =>
            partLocks(p).synchronized {
              appended += (batchId match {
                case Some(b) =>
                  topic.appendPartitionIdempotent(p, rs, ts,
                    TopicServer.md5Hex(s"$b|$p"))
                case None => topic.appendBatch(rs, ts); rs.size.toLong
              })
            }
          }
          reply.put("ok", true)
          reply.put("appended", appended)
        case "publish" =>
          val key = req.get("key").asText()
          val p = topic.partitionFor(key)
          val (part, off) = partLocks(p).synchronized {
            topic.publish(key, req.get("value").asText(), req.get("ts").asLong())
          }
          reply.put("ok", true)
          reply.put("partition", part)
          reply.put("offset", off)
        case "poll" =>
          val p = req.get("partition").asInt()
          val from = req.get("from").asLong()
          val max = Option(req.get("max")).filterNot(_.isNull)
            .map(_.asInt()).getOrElse(Int.MaxValue)
          reply.put("ok", true)
          val arr = reply.putArray("records")
          topic.poll(p, from, max).foreach { r =>
            val o = arr.addObject()
            o.put("partition", r.partition).put("offset", r.offset)
              .put("ts", r.ts).put("key", r.key).put("value", r.value): Unit
          }
        case "end_offset" =>
          reply.put("ok", true)
          reply.put("offset", topic.endOffset(req.get("partition").asInt()))
        case "partitions" =>
          reply.put("ok", true)
          reply.put("partitions", topic.partitions)
        case "committed" =>
          reply.put("ok", true)
          reply.put("offset", topic.committedOffset(
            req.get("group").asText(), req.get("partition").asInt()))
        case "commit_offset" =>
          topic.commitOffset(req.get("group").asText(),
            req.get("partition").asInt(), req.get("offset").asLong())
          reply.put("ok", true)
        case "ping" =>
          reply.put("ok", true)
          reply.put("pong", true)
        case other =>
          reply.put("ok", false)
          reply.put("error", s"unknown op: $other")
      }
    } catch {
      case e: Exception =>
        reply.put("ok", false)
        reply.put("error", String.valueOf(e.getMessage))
    }
    mapper.writeValueAsString(reply)
  }

  def stop(): Unit = {
    running = false
    server.close()
  }
}

object TopicServer {
  // one tag-derivation implementation for producer and broker — a
  // divergence would silently split their dedup key spaces
  private[streaming] def md5Hex(s: String): String = FileTopic.md5Hex(s)
}

/** Blocking line-protocol client for [[TopicServer]] — what a remote
  * producer/consumer embeds. One socket, ordered replies. */
final class TopicClient(host: String, port: Int) extends AutoCloseable {
  private val mapper = new ObjectMapper()
  private val sock = new Socket(host, port)
  private val in = new BufferedReader(new InputStreamReader(sock.getInputStream, UTF_8))
  private val out = new PrintWriter(sock.getOutputStream, true)

  private def call(fill: ObjectNode => Unit): com.fasterxml.jackson.databind.JsonNode = {
    val req = mapper.createObjectNode()
    fill(req)
    out.println(mapper.writeValueAsString(req))
    val reply = mapper.readTree(in.readLine())
    require(reply.get("ok").asBoolean(), s"topic error: ${reply.get("error")}")
    reply
  }

  /** Produce a batch; `batchId` (producer-epoch style) makes the send
    * idempotent under retry. Returns records actually appended. */
  def produce(records: Seq[(String, String)], tsMs: Long,
              batchId: Option[String] = None): Long =
    call { r =>
      r.put("op", "produce"); r.put("ts", tsMs)
      batchId.foreach(r.put("batch_id", _))
      val arr = r.putArray("records")
      records.foreach { case (k, v) => arr.addObject().put("k", k).put("v", v): Unit }
    }.get("appended").asLong()

  def publish(key: String, value: String, tsMs: Long): (Int, Long) = {
    val r = call { o =>
      o.put("op", "publish"); o.put("key", key)
      o.put("value", value); o.put("ts", tsMs): Unit
    }
    (r.get("partition").asInt(), r.get("offset").asLong())
  }

  def poll(partition: Int, from: Long, max: Int = Int.MaxValue)
      : Seq[(Int, Long, Long, String, String)] = {
    val it = call { r =>
      r.put("op", "poll"); r.put("partition", partition)
      r.put("from", from); r.put("max", max): Unit
    }.get("records").elements()
    val b = Seq.newBuilder[(Int, Long, Long, String, String)]
    while (it.hasNext) {
      val n = it.next()
      b += ((n.get("partition").asInt(), n.get("offset").asLong(),
        n.get("ts").asLong(), n.get("key").asText(), n.get("value").asText()))
    }
    b.result()
  }

  def endOffset(partition: Int): Long =
    call { r => r.put("op", "end_offset"); r.put("partition", partition): Unit }
      .get("offset").asLong()

  def partitions(): Int =
    call(r => r.put("op", "partitions"): Unit).get("partitions").asInt()

  def committedOffset(group: String, partition: Int): Long =
    call { r =>
      r.put("op", "committed"); r.put("group", group)
      r.put("partition", partition): Unit
    }.get("offset").asLong()

  def commitOffset(group: String, partition: Int, offset: Long): Unit =
    call { r =>
      r.put("op", "commit_offset"); r.put("group", group)
      r.put("partition", partition); r.put("offset", offset): Unit
    }: Unit

  def ping(): Boolean = call(r => r.put("op", "ping"): Unit).get("pong").asBoolean()

  override def close(): Unit = sock.close()
}

object TopicClient {

  /** Distributed produce THROUGH THE BROKER: publish a whole DataFrame
    * of (key, value) records without collecting to the driver — each
    * Spark task holds one producer connection (the real-broker shape
    * [[FileTopic.produceDistributed]]'s scaladoc promises) and sends
    * exactly the records of the one topic partition it owns, tagged
    * with a content-derived batch id so a task retry after a lost ACK
    * appends nothing. Returns records actually appended. */
  def produceDistributed(df: DataFrame, host: String, port: Int,
                         tsMs: Long): Long = {
    val n = {
      val c = new TopicClient(host, port)
      try c.partitions() finally c.close()
    }
    require(df.columns.length == 2, s"expect (key, value) columns: ${df.columns.toSeq}")
    val Array(k0, v0) = df.columns
    val keyed = df
      .select(col(k0).cast("string").as("key"), col(v0).cast("string").as("value"))
      .rdd
      .map { r =>
        val key = r.getString(0)
        require(key != null,
          s"TopicClient.produceDistributed: null key in ($k0, $v0)")
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
          val bid = TopicServer.md5Hex(
            s"$tsMs|$p|" + recs.map { case (k, v) => s"$k\u0000$v" }.mkString("\u0001"))
          val c = new TopicClient(host, port)
          try c.produce(recs, tsMs, batchId = Some(bid)) finally c.close()
        }
      Iterator.single(appended)
    }.fold(0L)(_ + _)
  }
}
