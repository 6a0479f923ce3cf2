package graft.service

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

/** Network boundary for the W1-W4 commit gate: the reference's production
  * intent is an RPC coordinator (CommitGatePort.scala:10-40 — request /
  * vote / status across regions; the in-memory adapter
  * InMemoryCommitGateAdapter.java:29-81 is its test stand-in). The
  * in-process `GeoReplicationService` methods stay the real
  * implementation; this server puts an actual TCP socket in front of
  * them, so a coordinator process and voting regions can live in
  * different JVMs while the decision state itself stays in the
  * file-CAS `_system.approvals` table (crash-safe, multi-process —
  * CatalogSpec's two-JVM CAS demo covers that layer).
  *
  * Wire protocol: one JSON object per line, one JSON reply per line —
  * the shape every RPC framing (REST, gRPC) reduces to, with zero
  * dependencies beyond the Jackson stack Spark already ships.
  *
  *   {"op":"request_approval","commit_id":c,"regions":[r...],"timeout_ms":n?}
  *   {"op":"vote","commit_id":c,"region":r,"approve":b}
  *   {"op":"status","commit_id":c}       -> {"ok":true,"status":"Pending|Approved|Rejected|TimedOut"}
  *   {"op":"is_approved","commit_id":c}  -> {"ok":true,"approved":b}
  *   {"op":"ping"}                       -> {"ok":true,"pong":true}
  *
  * Unknown ops and handler exceptions return {"ok":false,"error":...} —
  * a protocol error must surface to the caller, never kill the server.
  * Scale shape: the gate is control-plane (one request per table
  * commit, not per row); a single coordinator socket is the same
  * topology every metastore/catalog service runs.
  */
final class CommitGateServer(svc: GeoReplicationService, port: Int = 0) {

  private val mapper = new ObjectMapper()
  private val server = new ServerSocket(port)
  @volatile private var running = true

  /** The bound port (useful with port=0 ephemeral binds). */
  def boundPort: Int = server.getLocalPort

  private val acceptLoop = new Thread(() => {
    while (running) {
      try {
        val sock = server.accept()
        val t = new Thread(() => handle(sock), s"gate-conn-${sock.getPort}")
        t.setDaemon(true)
        t.start()
      } catch {
        case _: java.net.SocketException if !running => // closed on stop()
        case e: Exception if running =>
          System.err.println(s"[gate] accept failed: ${e.getMessage}")
      }
    }
  }, "gate-accept")
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
        case "request_approval" =>
          val regions = {
            val it = req.get("regions").elements()
            val b = Seq.newBuilder[String]
            while (it.hasNext) b += it.next().asText()
            b.result()
          }
          val timeout = Option(req.get("timeout_ms")).map(_.asLong())
          svc.requestCommitApproval(req.get("commit_id").asText(), regions, timeout)
          reply.put("ok", true)
        case "vote" =>
          svc.vote(req.get("commit_id").asText(), req.get("region").asText(),
            req.get("approve").asBoolean())
          reply.put("ok", true)
        case "status" =>
          reply.put("ok", true)
          reply.put("status", svc.approvalStatus(req.get("commit_id").asText()))
        case "is_approved" =>
          reply.put("ok", true)
          reply.put("approved", svc.isCommitApproved(req.get("commit_id").asText()))
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

/** Blocking line-protocol client for [[CommitGateServer]] — what a
  * writing region embeds. One socket, request/reply in order. */
final class CommitGateClient(host: String, port: Int) extends AutoCloseable {
  private val mapper = new ObjectMapper()
  private val sock = new Socket(host, port)
  private val in = new BufferedReader(new InputStreamReader(sock.getInputStream, UTF_8))
  private val out = new PrintWriter(sock.getOutputStream, true)

  private def call(fill: ObjectNode => Unit): com.fasterxml.jackson.databind.JsonNode = {
    val req = mapper.createObjectNode()
    fill(req)
    out.println(mapper.writeValueAsString(req))
    val reply = mapper.readTree(in.readLine())
    require(reply.get("ok").asBoolean(), s"gate error: ${reply.get("error")}")
    reply
  }

  def requestApproval(commitId: String, regions: Seq[String],
                      timeoutMs: Option[Long] = None): Unit =
    call { r =>
      r.put("op", "request_approval")
      r.put("commit_id", commitId)
      val arr = r.putArray("regions")
      regions.foreach(arr.add)
      timeoutMs.foreach(r.put("timeout_ms", _))
    }: Unit

  def vote(commitId: String, region: String, approve: Boolean): Unit =
    call { r =>
      r.put("op", "vote")
      r.put("commit_id", commitId)
      r.put("region", region)
      r.put("approve", approve): Unit
    }: Unit

  def status(commitId: String): String =
    call { r => r.put("op", "status"); r.put("commit_id", commitId): Unit }
      .get("status").asText()

  def isApproved(commitId: String): Boolean =
    call { r => r.put("op", "is_approved"); r.put("commit_id", commitId): Unit }
      .get("approved").asBoolean()

  def ping(): Boolean =
    call(r => r.put("op", "ping"): Unit).get("pong").asBoolean()

  override def close(): Unit = sock.close()
}
