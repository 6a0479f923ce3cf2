package graft.service

import java.io.{BufferedReader, InputStreamReader, OutputStream}
import java.net.{ServerSocket, Socket, URLDecoder}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

import graft.catalog.{GraftCatalog, IcebergExport}

/** Read-only Iceberg REST-catalog shim over a graft warehouse — the
  * endpoint surface a foreign engine's `type=rest` catalog client
  * mounts (published spec: apache/iceberg
  * open-api/rest-catalog-open-api.yaml; the reference's architecture
  * doc assumes exactly this read path for cross-engine consumers,
  * iceberg-arch-geo-distributed-ha.md — Athena/BigQuery reading the
  * control-plane tables). GET-only by design: writes go through graft
  * commits; foreign engines READ.
  *
  *   GET  /v1/config                            -> {defaults, overrides}
  *   GET  /v1/namespaces                        -> {namespaces: [[ns]..]}
  *   GET  /v1/namespaces/{ns}                   -> {namespace, properties}
  *   GET  /v1/namespaces/{ns}/tables            -> {identifiers: [...]}
  *   GET  /v1/namespaces/{ns}/tables/{t}        -> LoadTableResult
  *   HEAD /v1/namespaces/{ns}/tables/{t}        -> 204 / 404
  *
  * LoadTableResult serves a REAL spec-compliant metadata tree: the
  * table is exported through [[IcebergExport]] ON DEMAND, memoized by
  * head commit id — a GET after a new graft commit re-exports and
  * returns a NEW metadata-location (the snapshot the foreign engine
  * pins), while repeated GETs of an unchanged table are free. Errors
  * use the spec's ErrorModel envelope; a protocol error surfaces to
  * the caller and never kills the server (same contract as
  * TopicServer/CatalogServer). */
final class IcebergRestServer(cat: GraftCatalog, exportRoot: String,
                              port: Int = 0) {
  private val server = new ServerSocket(port)
  def boundPort: Int = server.getLocalPort
  private val mapper = new ObjectMapper()
  @volatile private var running = true
  // per-table export memo; the MEMO OBJECT is the table's export lock
  // (a multi-second Spark export must never run inside the map's
  // compute(), whose bin lock would block unrelated same-bin tables)
  private final class Memo {
    var head: String = _ // commit id the current export serves
    var loc: String = _ // metadata-location of the current export
    var prev: Option[String] = None // immediately superseded location
  }
  private val exported =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Memo]()

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val sock = server.accept()
        val t = new Thread(() => handle(sock))
        t.setDaemon(true)
        t.start()
      } catch { case e: Exception =>
        // expected when stop() closes the socket; any OTHER persistent
        // accept failure (fd exhaustion) must not hot-spin the acceptor
        if (running) {
          System.err.println(s"[iceberg-rest] accept failed: ${e.getMessage}")
          Thread.sleep(100)
        }
      }
    }
  }, "iceberg-rest-acceptor")
  acceptor.setDaemon(true)
  acceptor.start()

  def stop(): Unit = { running = false; server.close() }

  private def handle(sock: Socket): Unit = {
    try {
      val in = new BufferedReader(new InputStreamReader(sock.getInputStream, UTF_8))
      val reqLine = in.readLine()
      if (reqLine == null) return
      // drain headers (Connection: close responses need no body read)
      while ({ val l = in.readLine(); l != null && l.nonEmpty }) ()
      val parts = reqLine.split(" ")
      val (method, rawPath) =
        (parts.headOption.getOrElse(""), parts.lift(1).getOrElse("/"))
      val path = rawPath.split("\\?")(0).split("/").filter(_.nonEmpty)
        .map(URLDecoder.decode(_, UTF_8)).toSeq
      val out = sock.getOutputStream
      try route(method, path, out)
      catch { case e: Exception =>
        reply(out, 500, err(500, "InternalServerError",
          Option(e.getMessage).getOrElse(e.getClass.getName)))
      }
    } catch { case _: Exception => () }
    finally { try sock.close() catch { case _: Exception => () } }
  }

  private def route(method: String, path: Seq[String], out: OutputStream): Unit =
    (method, path.toList) match {
      case ("GET", "v1" :: "config" :: Nil) =>
        reply(out, 200, """{"defaults":{},"overrides":{}}""")
      case ("GET", "v1" :: "namespaces" :: Nil) =>
        val nss = namespaces().map(n => s"""["${esc(n)}"]""")
        reply(out, 200, s"""{"namespaces":[${nss.mkString(",")}]}""")
      case ("GET", "v1" :: "namespaces" :: ns :: Nil) =>
        if (!namespaces().contains(ns))
          reply(out, 404, err(404, "NoSuchNamespaceException", s"namespace $ns"))
        else reply(out, 200, s"""{"namespace":["${esc(ns)}"],""" +
          s""""properties":{"location":"${esc(
            Paths.get(cat.warehouse, ns).toString)}"}}""")
      case ("GET", "v1" :: "namespaces" :: ns :: "tables" :: Nil) =>
        // spec: listing a MISSING namespace is NoSuchNamespaceException,
        // never an empty page (a client cannot tell empty from absent)
        if (!namespaces().contains(ns))
          reply(out, 404, err(404, "NoSuchNamespaceException", s"namespace $ns"))
        else {
          val ids = cat.listTables(ns).map(t =>
            s"""{"namespace":["${esc(ns)}"],"name":"${esc(t)}"}""")
          reply(out, 200, s"""{"identifiers":[${ids.mkString(",")}]}""")
        }
      case ("HEAD", "v1" :: "namespaces" :: ns :: "tables" :: t :: Nil) =>
        if (cat.tableExists(ns, t)) replyHead(out, 204) else replyHead(out, 404)
      case ("GET", "v1" :: "namespaces" :: ns :: "tables" :: t :: Nil) =>
        if (!cat.tableExists(ns, t))
          reply(out, 404, err(404, "NoSuchTableException", s"table $ns.$t"))
        else reply(out, 200, loadTableResult(ns, t))
      case _ =>
        reply(out, 404, err(404, "NotFoundException",
          s"$method /${path.mkString("/")}"))
    }

  // single-level namespaces = the warehouse's non-plumbing directories
  // (same contract as the catalog plugin's listNamespaces)
  private def namespaces(): Seq[String] = {
    val root = Paths.get(cat.warehouse)
    if (!Files.isDirectory(root)) Seq.empty
    else {
      val s = Files.list(root)
      try s.iterator().asScala
        .filter(p => Files.isDirectory(p))
        .map(_.getFileName.toString)
        .filterNot(n => n.startsWith(".") || n.startsWith("_"))
        .toSeq.sorted
      finally s.close()
    }
  }

  /** Export-on-demand, memoized by head commit id (one export per
    * graft version actually read, never per request). Retention = a
    * SERVING WINDOW of two trees: the new export plus the immediately
    * superseded one (a client pinned to the last served location
    * finishes its read); anything older is deleted — without this,
    * every served commit leaks a full table copy on disk. */
  private def loadTableResult(ns: String, t: String): String = {
    val headSnap = cat.latest(ns, t)
    val head = headSnap.map(_.commitId).getOrElse("v0-empty")
    val memo = exported.computeIfAbsent((ns, t), _ => new Memo)
    val loc = memo.synchronized {
      if (memo.head != head) {
        val dest = Paths.get(exportRoot, ns, t,
          java.util.UUID.randomUUID().toString.take(8))
        Files.createDirectories(dest.resolve("metadata"))
        val newLoc = headSnap match {
          case Some(_) =>
            IcebergExport.exportTable(cat, ns, t, dest.toString).metadataFile
          case None =>
            // created-but-never-committed: a REST client that just
            // LISTED the table must get valid metadata, not a 500 —
            // serve the spec's empty-table shape (no snapshots)
            val f = dest.resolve("metadata").resolve("v0.metadata.json")
            Files.writeString(f, emptyMetadataJson(ns, t))
            f.toAbsolutePath.toString
        }
        memo.prev.foreach(o => deleteTree(Paths.get(o).getParent.getParent))
        memo.prev = Option(memo.loc)
        memo.loc = newLoc
        memo.head = head
      }
      memo.loc
    }
    val metadataJson = new String(Files.readAllBytes(Paths.get(loc)), UTF_8)
    val o = mapper.createObjectNode()
    o.put("metadata-location", Paths.get(loc).toUri.toString): Unit
    // NB: set[T] infers its return from the expected type — an `: Unit`
    // ascription makes Jackson cast the node to BoxedUnit and throw
    o.set[com.fasterxml.jackson.databind.JsonNode](
      "metadata", mapper.readTree(metadataJson))
    o.set[com.fasterxml.jackson.databind.JsonNode](
      "config", mapper.createObjectNode())
    mapper.writeValueAsString(o)
  }

  /** Spec-shaped metadata for a table with NO committed versions: empty
    * schema-0, empty spec-0, no snapshots — what a freshly-created
    * Iceberg table's metadata looks like before its first append. */
  private def emptyMetadataJson(ns: String, t: String): String = {
    val uuid = java.util.UUID.nameUUIDFromBytes(s"$ns.$t".getBytes(UTF_8))
    s"""{"format-version":2,"table-uuid":"$uuid",
       |"location":"${esc(Paths.get(cat.warehouse, ns, t).toUri.toString)}",
       |"last-sequence-number":0,
       |"last-updated-ms":${System.currentTimeMillis()},
       |"last-column-id":0,"current-schema-id":0,
       |"schemas":[{"schema-id":0,"type":"struct","fields":[]}],
       |"default-spec-id":0,"partition-specs":[{"spec-id":0,"fields":[]}],
       |"last-partition-id":999,"default-sort-order-id":0,
       |"sort-orders":[{"order-id":0,"fields":[]}],
       |"properties":{},"snapshots":[],"snapshot-log":[],"metadata-log":[]}
       |""".stripMargin.replace("\n", "")
  }

  private def deleteTree(root: java.nio.file.Path): Unit =
    try {
      val s = Files.walk(root)
      try s.sorted(java.util.Comparator.reverseOrder()).iterator().asScala
        .foreach(p => Files.deleteIfExists(p): Unit)
      finally s.close()
    } catch { case _: Exception => () } // reclamation is best-effort

  private def err(code: Int, typ: String, msg: String): String =
    s"""{"error":{"message":"${esc(msg)}","type":"$typ","code":$code}}"""

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      // remaining control chars (Spark exception messages span lines and
      // carry them) would make the ErrorModel body invalid JSON, masking
      // the real error behind the client's parse failure
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def reply(out: OutputStream, code: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    val status = code match {
      case 200 => "200 OK"; case 404 => "404 Not Found"
      case 500 => "500 Internal Server Error"; case other => s"$other Error"
    }
    out.write((s"HTTP/1.1 $status\r\n" +
      "Content-Type: application/json\r\n" +
      s"Content-Length: ${bytes.length}\r\n" +
      "Connection: close\r\n\r\n").getBytes(UTF_8))
    out.write(bytes)
    out.flush()
  }

  private def replyHead(out: OutputStream, code: Int): Unit = {
    val status = if (code == 204) "204 No Content" else "404 Not Found"
    out.write((s"HTTP/1.1 $status\r\nContent-Length: 0\r\n" +
      "Connection: close\r\n\r\n").getBytes(UTF_8))
    out.flush()
  }
}
