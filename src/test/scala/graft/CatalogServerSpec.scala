package graft

import java.nio.file.Files

import graft.catalog.GraftCatalog
import graft.service.{CatalogClient, CatalogServer}

/** The catalog metadata surface over a REAL TCP socket (the reference
  * deploys its catalog as a Nessie service every region talks to over
  * the wire): DDL, commit registration, scan planning, refs — all
  * through the line protocol, with the hard-link CAS as the only
  * serialization point. */
class CatalogServerSpec extends SparkSpec {

  private def fresh(): (GraftCatalog, CatalogServer) = {
    val cat = new GraftCatalog(spark, Files.createTempDirectory("graft-catsrv").toString)
    (cat, new CatalogServer(cat))
  }

  private def plant(cat: GraftCatalog, ns: String, t: String, rel: String): Unit = {
    val p = cat.tablePath(ns, t).resolve(rel)
    Files.createDirectories(p.getParent)
    Files.write(p, Array[Byte](1, 2, 3)): Unit
  }

  test("DDL, commit registration and scan planning over the wire; two clients share one log") {
    val (cat, server) = fresh()
    try {
      val a = new CatalogClient("127.0.0.1", server.boundPort)
      val b = new CatalogClient("127.0.0.1", server.boundPort)
      try {
        assert(a.ping())
        a.createTable("wire", "t")
        assert(b.tableExists("wire", "t"))
        assert(b.listTables("wire") === Seq("t"))
        assert(a.latest("wire", "t").isEmpty)

        // commit landed files through client A; client B sees the head
        plant(cat, "wire", "t", "data/f1.parquet")
        val seq = a.commitFiles("wire", "t", "us-east-1", Seq("data/f1.parquet"),
          commitId = Some("c-1"))
        assert(seq === 0L)
        val head = b.latest("wire", "t").get
        assert(head._1 === 0L && head._2 === "c-1" && head._3 === 1L)
        assert(b.dataFiles("wire", "t", 0L) === Seq("data/f1.parquet"))
        assert(b.snapshotSeqs("wire", "t") === Seq(0L))

        // the duplicate commitId surfaces as a protocol-level error,
        // never a second version
        plant(cat, "wire", "t", "data/f2.parquet")
        val dup = intercept[IllegalArgumentException](
          a.commitFiles("wire", "t", "us-east-1", Seq("data/f2.parquet"),
            commitId = Some("c-1")))
        assert(dup.getMessage.contains("already applied"))
        assert(b.snapshotSeqs("wire", "t") === Seq(0L))

        // refs over the wire
        a.createBranch("wire", "t", "dev")
        assert(b.listBranches("wire", "t") === Seq("dev"))
        a.createTag("wire", "t", "run-1")
        assert(b.tagSeq("wire", "t", "run-1") === 0L)
        // duplicate ref names error without killing the connection
        intercept[IllegalArgumentException](b.createBranch("wire", "t", "dev"))
        assert(b.ping(), "connection must survive a protocol error")
      } finally { a.close(); b.close() }
    } finally server.stop()
  }

  test("concurrent wire commits serialize through the CAS: every commit gets a distinct version") {
    val (cat, server) = fresh()
    try {
      cat.createTable("wire", "c")
      val n = 4
      val threads = (0 until n).map { i =>
        new Thread(() => {
          val c = new CatalogClient("127.0.0.1", server.boundPort)
          try {
            plant(cat, "wire", "c", s"data/t$i.parquet")
            c.commitFiles("wire", "c", s"region-$i", Seq(s"data/t$i.parquet"))
          } finally c.close()
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val seqs = cat.snapshots("wire", "c").map(_.seq)
      assert(seqs === (0L until n.toLong), s"expected $n linear versions, got $seqs")
      assert(cat.latest("wire", "c").get.fileCount === n.toLong)
    } finally server.stop()
  }
}
