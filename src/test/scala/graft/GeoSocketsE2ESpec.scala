package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.catalog.GraftCatalog
import graft.service.{CatalogServer, CommitGateServer, GeoReplicationService}

/** The reference's geo-distributed E2E scenario
  * (GeoDistributedSystemE2ESpec.scala: write -> gate approval -> sync ->
  * routed read -> region-failure fallback) run across REAL process and
  * wire boundaries: the remote region is a second JVM that votes over
  * the TCP commit gate, replicates data files via shared storage, and
  * registers its replica snapshot through the catalog wire protocol.
  * The in-memory adapters of the reference are exactly the parts
  * replaced by sockets here. */
class GeoSocketsE2ESpec extends SparkSpec {

  private def spawnAgent(args: Seq[String]): Process = {
    val classpath = System.getProperty("java.class.path")
    val addOpens = Seq("java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
      "java.net", "java.nio", "java.util", "java.util.concurrent",
      "java.util.concurrent.atomic").map(p => s"--add-opens=java.base/$p=ALL-UNNAMED") ++
      Seq("sun.nio.ch", "sun.nio.cs", "sun.security.action", "sun.util.calendar")
        .map(p => s"--add-opens=java.base/$p=ALL-UNNAMED")
    val cmd = Seq(s"${System.getProperty("java.home")}/bin/java") ++ addOpens ++
      Seq("-Xmx1g", "-cp", classpath, "graft.tools.GeoRegionAgent") ++ args
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.start()
  }

  test("cross-process geo E2E over sockets: gate-approved write replicates to a " +
       "second region through the wire catalog and survives primary failure") {
    val whA = Files.createTempDirectory("geo-sock-a").toString
    val whB = Files.createTempDirectory("geo-sock-b").toString
    val catA = new GraftCatalog(spark, whA)
    val catB = new GraftCatalog(spark, whB)
    val svc = new GeoReplicationService(spark,
      Map("us" -> catA, "eu" -> catB), primaryRegion = "us")
    val gate = new CommitGateServer(svc)
    val catSrv = new CatalogServer(catB)
    try {
      catA.createTable("geo", "t")
      svc.registerTable("geo", "t", "us")
      val commitId = "geo-e2e-0001"
      // W2 over the wire: ask region eu to vote BEFORE the agent exists,
      // so its TCP vote is the thing that flips the quorum
      svc.requestCommitApproval(commitId, Seq("eu"), timeoutMs = Some(120000L))
      assert(!svc.isCommitApproved(commitId), "nothing voted yet")

      val child = spawnAgent(Seq(gate.boundPort.toString, catSrv.boundPort.toString,
        commitId, "eu", whA, whB, "geo", "t"))
      try {
        // the eu vote arrives over TCP from the other process
        val deadline = System.currentTimeMillis() + 120000L
        while (!svc.isCommitApproved(commitId) &&
               System.currentTimeMillis() < deadline) Thread.sleep(200)
        assert(svc.isCommitApproved(commitId), "agent vote never landed")

        // approved -> the primary writes the data commit under the SAME id
        val df = Tables.orders(spark, sf()).filter(col("o_orderkey") % 6 === 0)
          .select("o_orderkey", "o_totalprice")
        catA.commitAppend("geo", "t", df, sourceRegion = "us",
          commitId = Some(commitId))

        // agent: sees the commit point, copies the files, wire-commits to
        // eu. Drain stdout on a DAEMON thread: a synchronous mkString
        // before waitFor would block forever on a wedged child and make
        // the 120 s hang-guard below unreachable
        val outBuf = new java.lang.StringBuilder
        val drain = new Thread(() => {
          val src = scala.io.Source.fromInputStream(child.getInputStream)
          try src.getLines().foreach { l =>
            outBuf.synchronized { outBuf.append(l).append('\n'): Unit }
          } finally src.close()
        })
        drain.setDaemon(true); drain.start()
        def out = outBuf.synchronized(outBuf.toString)
        val finished = child.waitFor(120, java.util.concurrent.TimeUnit.SECONDS)
        if (!finished) child.destroyForcibly(): Unit
        drain.join(5000)
        assert(finished, s"agent hung:\n$out")
        assert(child.exitValue() === 0, s"agent failed:\n${out.takeRight(4000)}")
        assert(out.contains("AGENT-VOTED eu"), s"no vote marker:\n$out")
        assert(out.contains(s"AGENT-DONE eu $commitId"), s"no done marker:\n$out")

        // replica == primary, committed through the wire with the same id
        svc.registerTable("geo", "t", "eu")
        val replica = catB.snapshots("geo", "t").last
        assert(replica.commitId === commitId)
        assert(replica.sourceRegion === "eu")
        def agg(c: GraftCatalog) = c.read("geo", "t")
          .agg(count(lit(1)), round(sum(col("o_totalprice")), 2))
          .head()
        assert(agg(catB) === agg(catA))

        // Q1/Q6: healthy primary is preferred; a failed primary falls
        // back to the replica and the routed read serves the same data
        assert(svc.routeRead("geo", "t", Some("us")).region === "us")
        svc.unavailableRegions = Set("us")
        assert(svc.routeRead("geo", "t", Some("us")).region === "eu")
        val routed = svc.readRouted("geo", "t", Some("us"))
          .agg(count(lit(1)), round(sum(col("o_totalprice")), 2)).head()
        assert(routed === agg(catA))

        // INTEROP COMPOSED (iceberg-arch-geo-distributed-ha.md:233-241 —
        // replicated metadata objects ARE standard Iceberg): the table
        // the second JVM registered over the wire exports as a real
        // Iceberg v2 layout FROM THE REPLICA, replays into a fresh
        // catalog back on the primary side, and the imported rows are
        // byte-identical to the primary's — the full
        // geo-replicate -> export -> import loop in one scenario
        val interopDest = Files.createTempDirectory("geo-iceberg").toString
        graft.catalog.IcebergExport.exportTable(catB, "geo", "t", interopDest): Unit
        val catC = new GraftCatalog(spark,
          Files.createTempDirectory("geo-sock-c").toString)
        graft.catalog.IcebergImport.importTable(catC, "geo", "t", interopDest): Unit
        assert(agg(catC) === agg(catA))
        assert(catC.read("geo", "t").exceptAll(catA.read("geo", "t")).count() === 0L)
        assert(catA.read("geo", "t").exceptAll(catC.read("geo", "t")).count() === 0L)

        // idempotence across the wire: re-registering the same commitId
        // must raise, not double-commit
        val dup = intercept[Exception] {
          new graft.service.CatalogClient("127.0.0.1", catSrv.boundPort)
            .commitFiles("geo", "t", "eu",
              catB.dataFileEntries("geo", "t", replica).map(_._1),
              commitId = Some(commitId))
        }
        assert(dup.getMessage.toLowerCase.contains("already applied"),
          s"expected duplicate-commit rejection, got: ${dup.getMessage}")
      } finally if (child.isAlive) child.destroyForcibly(): Unit
    } finally {
      svc.unavailableRegions = Set.empty
      gate.stop()
      catSrv.stop()
    }
  }
}