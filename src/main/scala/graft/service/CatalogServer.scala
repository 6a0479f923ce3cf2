package graft.service

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

import graft.catalog.GraftCatalog

/** Network boundary for the catalog metadata surface (C1-C11): the
  * reference deploys its catalog AS A SERVICE (Nessie's REST endpoint —
  * every region's sync engine and query router talks to it over the
  * wire, never through in-process calls). The in-process GraftCatalog
  * stays the real implementation; this server puts a TCP line protocol
  * in front of the METADATA operations, so committers and readers in
  * other JVMs share one commit log. Data-plane reads stay local to each
  * engine (the server hands out file LISTS, exactly like a metastore —
  * shipping row data through a metadata endpoint is the anti-pattern).
  *
  * Wire protocol: one JSON object per line, one JSON reply per line
  * (the CommitGateServer framing):
  *
  *   {"op":"create_table","ns":n,"table":t}
  *   {"op":"drop_table","ns":n,"table":t}
  *   {"op":"list_tables","ns":n}                  -> {"ok":true,"tables":[...]}
  *   {"op":"table_exists","ns":n,"table":t}       -> {"ok":true,"exists":b}
  *   {"op":"latest","ns":n,"table":t}             -> {"ok":true,"found":b,seq,commit_id,file_count,total_bytes}
  *   {"op":"snapshots","ns":n,"table":t}          -> {"ok":true,"seqs":[...]}
  *   {"op":"data_files","ns":n,"table":t,"seq":s} -> {"ok":true,"files":[...]}
  *   {"op":"commit_files","ns":n,"table":t,"region":r,"files":[...],"commit_id":c?,"schema_json":j?}
  *                                                -> {"ok":true,"seq":s}
  *   {"op":"create_branch","ns":n,"table":t,"branch":b,"at_seq":s?}
  *   {"op":"list_branches","ns":n,"table":t}      -> {"ok":true,"branches":[...]}
  *   {"op":"create_tag","ns":n,"table":t,"tag":g,"at_seq":s?}
  *   {"op":"tag_seq","ns":n,"table":t,"tag":g}    -> {"ok":true,"seq":s}
  *   {"op":"ping"}                                -> {"ok":true,"pong":true}
  *
  * Failures (duplicate commitId, CAS conflict, unknown table/op) return
  * {"ok":false,"error":...} — a protocol error surfaces to the caller,
  * never kills the server. Concurrency needs no server-side locks: the
  * catalog's hard-link CAS is the serialization point, so N concurrent
  * client commits race exactly as N in-process committers do (C12).
  */
final class CatalogServer(cat: GraftCatalog, port: Int = 0) {

  private val mapper = new ObjectMapper()
  private val server = new ServerSocket(port)
  @volatile private var running = true

  def boundPort: Int = server.getLocalPort

  private val acceptLoop = new Thread(() => {
    while (running) {
      try {
        val sock = server.accept()
        val t = new Thread(() => handle(sock), s"catalog-conn-${sock.getPort}")
        t.setDaemon(true)
        t.start()
      } catch {
        case _: java.net.SocketException if !running =>
        case e: Exception if running =>
          System.err.println(s"[catalog] accept failed: ${e.getMessage}")
      }
    }
  }, "catalog-accept")
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
      def ns = req.get("ns").asText()
      def table = req.get("table").asText()
      def strings(field: String): Seq[String] = {
        val it = req.get(field).elements()
        val b = Seq.newBuilder[String]
        while (it.hasNext) b += it.next().asText()
        b.result()
      }
      def optLong(field: String) =
        Option(req.get(field)).filterNot(_.isNull).map(_.asLong())
      def optText(field: String) =
        Option(req.get(field)).filterNot(_.isNull).map(_.asText())
      req.get("op").asText() match {
        case "create_table" => cat.createTable(ns, table); reply.put("ok", true)
        case "drop_table"   => cat.dropTable(ns, table); reply.put("ok", true)
        case "list_tables" =>
          reply.put("ok", true)
          val arr = reply.putArray("tables")
          cat.listTables(ns).foreach(arr.add)
        case "table_exists" =>
          reply.put("ok", true)
          reply.put("exists", cat.tableExists(ns, table))
        case "latest" =>
          reply.put("ok", true)
          cat.latest(ns, table) match {
            case Some(s) =>
              reply.put("found", true)
              reply.put("seq", s.seq)
              reply.put("commit_id", s.commitId)
              reply.put("file_count", s.fileCount)
              reply.put("total_bytes", s.totalBytes)
            case None => reply.put("found", false)
          }
        case "snapshots" =>
          reply.put("ok", true)
          val arr = reply.putArray("seqs")
          cat.snapshots(ns, table).foreach(s => arr.add(s.seq))
        case "data_files" =>
          val seq = req.get("seq").asLong()
          val snap = cat.snapshots(ns, table).find(_.seq == seq)
            .getOrElse(throw new IllegalArgumentException(s"no version $seq"))
          reply.put("ok", true)
          val arr = reply.putArray("files")
          cat.dataFiles(ns, table, snap).foreach(arr.add)
        case "commit_files" =>
          val snap = cat.commitFiles(ns, table, strings("files"),
            req.get("region").asText(),
            schemaJson = optText("schema_json"), commitId = optText("commit_id"))
          reply.put("ok", true)
          reply.put("seq", snap.seq)
        case "create_branch" =>
          cat.createBranch(ns, table, req.get("branch").asText(), optLong("at_seq"))
          reply.put("ok", true)
        case "list_branches" =>
          reply.put("ok", true)
          val arr = reply.putArray("branches")
          cat.listBranches(ns, table).foreach(arr.add)
        case "create_tag" =>
          cat.createTag(ns, table, req.get("tag").asText(), optLong("at_seq"))
          reply.put("ok", true)
        case "tag_seq" =>
          reply.put("ok", true)
          reply.put("seq", cat.tagSeq(ns, table, req.get("tag").asText()))
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

/** Blocking line-protocol client for [[CatalogServer]] — what a remote
  * sync engine or query router embeds. One socket, ordered replies. */
final class CatalogClient(host: String, port: Int) extends AutoCloseable {
  private val mapper = new ObjectMapper()
  private val sock = new Socket(host, port)
  private val in = new BufferedReader(new InputStreamReader(sock.getInputStream, UTF_8))
  private val out = new PrintWriter(sock.getOutputStream, true)

  private def call(fill: ObjectNode => Unit): com.fasterxml.jackson.databind.JsonNode = {
    val req = mapper.createObjectNode()
    fill(req)
    out.println(mapper.writeValueAsString(req))
    val reply = mapper.readTree(in.readLine())
    require(reply.get("ok").asBoolean(), s"catalog error: ${reply.get("error")}")
    reply
  }

  private def tableReq(op: String, ns: String, table: String)(extra: ObjectNode => Unit = _ => ()) =
    call { r => r.put("op", op); r.put("ns", ns); r.put("table", table); extra(r) }

  def createTable(ns: String, table: String): Unit = tableReq("create_table", ns, table)(): Unit
  def dropTable(ns: String, table: String): Unit = tableReq("drop_table", ns, table)(): Unit

  def listTables(ns: String): Seq[String] = {
    val arr = call { r => r.put("op", "list_tables"); r.put("ns", ns): Unit }.get("tables")
    val it = arr.elements(); val b = Seq.newBuilder[String]
    while (it.hasNext) b += it.next().asText()
    b.result()
  }

  def tableExists(ns: String, table: String): Boolean =
    tableReq("table_exists", ns, table)().get("exists").asBoolean()

  /** (seq, commitId, fileCount, totalBytes) of the head, if any. */
  def latest(ns: String, table: String): Option[(Long, String, Long, Long)] = {
    val r = tableReq("latest", ns, table)()
    if (!r.get("found").asBoolean()) None
    else Some((r.get("seq").asLong(), r.get("commit_id").asText(),
      r.get("file_count").asLong(), r.get("total_bytes").asLong()))
  }

  def snapshotSeqs(ns: String, table: String): Seq[Long] = {
    val it = tableReq("snapshots", ns, table)().get("seqs").elements()
    val b = Seq.newBuilder[Long]
    while (it.hasNext) b += it.next().asLong()
    b.result()
  }

  def dataFiles(ns: String, table: String, seq: Long): Seq[String] = {
    val it = tableReq("data_files", ns, table)(_.put("seq", seq): Unit).get("files").elements()
    val b = Seq.newBuilder[String]
    while (it.hasNext) b += it.next().asText()
    b.result()
  }

  def commitFiles(ns: String, table: String, region: String, files: Seq[String],
                  commitId: Option[String] = None,
                  schemaJson: Option[String] = None): Long =
    tableReq("commit_files", ns, table) { r =>
      r.put("region", region)
      val arr = r.putArray("files")
      files.foreach(arr.add)
      commitId.foreach(r.put("commit_id", _))
      schemaJson.foreach(r.put("schema_json", _))
    }.get("seq").asLong()

  def createBranch(ns: String, table: String, branch: String,
                   atSeq: Option[Long] = None): Unit =
    tableReq("create_branch", ns, table) { r =>
      r.put("branch", branch); atSeq.foreach(r.put("at_seq", _))
    }: Unit

  def listBranches(ns: String, table: String): Seq[String] = {
    val it = tableReq("list_branches", ns, table)().get("branches").elements()
    val b = Seq.newBuilder[String]
    while (it.hasNext) b += it.next().asText()
    b.result()
  }

  def createTag(ns: String, table: String, tag: String, atSeq: Option[Long] = None): Unit =
    tableReq("create_tag", ns, table) { r =>
      r.put("tag", tag); atSeq.foreach(r.put("at_seq", _))
    }: Unit

  def tagSeq(ns: String, table: String, tag: String): Long =
    tableReq("tag_seq", ns, table)(_.put("tag", tag): Unit).get("seq").asLong()

  def ping(): Boolean = call(r => r.put("op", "ping"): Unit).get("pong").asBoolean()

  override def close(): Unit = sock.close()
}
