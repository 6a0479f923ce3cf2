package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession

/** Cross-process region agent for the geo E2E spec (two JVMs, real
  * sockets — the reference's GeoDistributedSystemE2ESpec scenario run
  * over actual process and wire boundaries instead of in-memory
  * adapters). Acting as region `region`'s worker, it:
  *
  *  1. votes APPROVE on `commitId` over the TCP commit gate
  *     (CommitGateClient — W3 across a process boundary);
  *  2. waits for the primary region's data commit with that id to land
  *     (shared storage: polls the snapshot JSON log, the same
  *     commit-point a real replica watches);
  *  3. replicates the commit's data files into its own region's
  *     warehouse — the DATA plane is a storage copy, exactly like the
  *     production path (StorageOps/CopyJobManager shapes);
  *  4. registers the replica snapshot through the catalog WIRE protocol
  *     (CatalogClient.commitFiles) carrying the same commitId, so a
  *     replayed agent is idempotent (DuplicateCommitException, not a
  *     double version).
  *
  * args: gatePort catalogPort commitId region primaryWarehouse
  *       ownWarehouse ns table
  */
object GeoRegionAgent {
  def main(args: Array[String]): Unit = {
    val Array(gatePort, catPort, commitId, region, whA, whB, ns, table) = args.take(8)
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"geo-agent-$region")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val gate = new graft.service.CommitGateClient("127.0.0.1", gatePort.toInt)
      try {
        gate.vote(commitId, region, approve = true)
        println(s"AGENT-VOTED $region $commitId")
      } finally gate.close()

      // wait for the primary's commit-point (snapshot log on shared storage)
      val catA = new graft.catalog.GraftCatalog(spark, whA)
      val deadline = System.currentTimeMillis() + 120000L
      var snap = catA.byCommitId(ns, table, commitId)
      while (snap.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
        snap = catA.byCommitId(ns, table, commitId)
      }
      val sA = snap.getOrElse(sys.error(s"primary never committed $commitId"))

      // data plane: copy the snapshot's files into this region
      val entries = catA.dataFileEntries(ns, table, sA)
      val srcRoot = Paths.get(whA, ns, table)
      val dstRoot = Paths.get(whB, ns, table)
      entries.foreach { case (rel, _) =>
        val dst = dstRoot.resolve(rel)
        Files.createDirectories(dst.getParent)
        Files.copy(srcRoot.resolve(rel), dst, StandardCopyOption.REPLACE_EXISTING): Unit
      }

      // control plane: register the replica over the wire
      val cat = new graft.service.CatalogClient("127.0.0.1", catPort.toInt)
      try {
        if (!cat.tableExists(ns, table)) cat.createTable(ns, table)
        // the schema rides the wire commit: a replica registered without
        // it cannot serve schema-dependent paths (Iceberg export, SQL
        // DDL resolution) even though its data files are byte-identical
        val seq = cat.commitFiles(ns, table, region, entries.map(_._1),
          commitId = Some(commitId), schemaJson = sA.schemaJson)
        println(s"AGENT-DONE $region $commitId seq=$seq files=${entries.size}")
      } finally cat.close()
    } finally spark.stop()
  }
}