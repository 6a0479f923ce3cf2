package graft

import java.nio.file.Files

import graft.catalog.GraftCatalog
import graft.service.{CommitGateClient, CommitGateServer, GeoReplicationService}

/** The W1-W4 commit gate over a REAL TCP socket: coordinator and voting
  * regions talk through the wire protocol, decisions land in the
  * file-CAS approvals table. Covers the reference's RPC-coordinator
  * production intent (CommitGatePort.scala:10-40) the in-process spec
  * can't: framing, concurrent connections, protocol errors. */
class GateServerSpec extends SparkSpec {

  private def freshService(regionNames: String*): GeoReplicationService = {
    val regions = regionNames.map { r =>
      r -> new GraftCatalog(spark, Files.createTempDirectory(s"graft-gate-$r").toString)
    }.toMap
    new GeoReplicationService(spark, regions, regionNames.head)
  }

  test("approval quorum over the wire: request, per-region votes, status transitions") {
    val svc = freshService("us-east-1", "eu-west-1")
    val server = new CommitGateServer(svc)
    try {
      val writer = new CommitGateClient("127.0.0.1", server.boundPort)
      val voterUs = new CommitGateClient("127.0.0.1", server.boundPort)
      val voterEu = new CommitGateClient("127.0.0.1", server.boundPort)
      try {
        assert(writer.ping())

        // happy path: both regions approve
        writer.requestApproval("c1", Seq("us-east-1", "eu-west-1"))
        assert(writer.status("c1") === "Pending")
        assert(!writer.isApproved("c1"))
        voterUs.vote("c1", "us-east-1", approve = true)
        assert(writer.status("c1") === "Pending", "one vote of two is not quorum")
        voterEu.vote("c1", "eu-west-1", approve = true)
        assert(writer.status("c1") === "Approved")
        assert(writer.isApproved("c1"))

        // any rejection vetoes
        writer.requestApproval("c2", Seq("us-east-1", "eu-west-1"))
        voterUs.vote("c2", "us-east-1", approve = true)
        voterEu.vote("c2", "eu-west-1", approve = false)
        assert(writer.status("c2") === "Rejected")
        assert(!writer.isApproved("c2"))

        // unanswered past the voting deadline times out
        writer.requestApproval("c3", Seq("us-east-1", "eu-west-1"), timeoutMs = Some(1L))
        Thread.sleep(50)
        assert(writer.status("c3") === "TimedOut")

        // socket-level state from one client is visible to every other
        // AND to the in-process service (same CAS table underneath)
        assert(svc.approvalStatus("c1") === "Approved")
        assert(svc.approvalStatus("c2") === "Rejected")
      } finally { writer.close(); voterUs.close(); voterEu.close() }
    } finally server.stop()
  }

  test("protocol errors surface to the caller and never kill the server") {
    val svc = freshService("solo")
    val server = new CommitGateServer(svc)
    try {
      val sock = new java.net.Socket("127.0.0.1", server.boundPort)
      try {
        val out = new java.io.PrintWriter(sock.getOutputStream, true)
        val in = new java.io.BufferedReader(
          new java.io.InputStreamReader(sock.getInputStream, java.nio.charset.StandardCharsets.UTF_8))
        out.println("""{"op":"no_such_op"}""")
        assert(in.readLine().contains("unknown op"))
        out.println("this is not json")
        assert(in.readLine().contains("\"ok\":false"))
        // the connection (and server) still serve valid requests after both errors
        out.println("""{"op":"ping"}""")
        assert(in.readLine().contains("\"pong\":true"))
      } finally sock.close()
      val c = new CommitGateClient("127.0.0.1", server.boundPort)
      try assert(c.ping()) finally c.close()
    } finally server.stop()
  }
}
