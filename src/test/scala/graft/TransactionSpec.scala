package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.catalog.GraftCatalog

/** Multi-table transactions: atomic cross-table publish of staged
  * branches — the all-or-nothing guarantee, the crash-recovery
  * protocol (journal present = complete it; expired barrier without a
  * journal = abort it), writer serialization through the commit
  * funnel, and the loud-refusal edges. The crash tests fabricate the
  * exact on-disk states a dead coordinator leaves behind (barrier /
  * staged / journal files in their real formats) and drive recovery
  * through an ordinary commit. */
class TransactionSpec extends SparkSpec {
  import spark.implicits._

  private def freshCat(): GraftCatalog =
    new GraftCatalog(spark, Files.createTempDirectory("txn-spec").toString)

  private def mkTables(cat: GraftCatalog): Unit = {
    cat.createTable("a", "t1")
    cat.createTable("b", "t2")
    cat.commitAppend("a", "t1",
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"))
    cat.commitAppend("b", "t2",
      Seq((100L, "x"), (200L, "y")).toDF("k", "s"))
  }

  private def stagePair(cat: GraftCatalog, tag: String): Seq[GraftCatalog#TxnPart] = {
    cat.createBranch("a", "t1", s"stage-$tag")
    cat.createBranch("b", "t2", s"stage-$tag")
    cat.commitAppendToBranch("a", "t1", s"stage-$tag",
      Seq((3L, 30.0)).toDF("id", "v"))
    cat.commitAppendToBranch("b", "t2", s"stage-$tag",
      Seq((300L, "z")).toDF("k", "s"))
    Seq(cat.TxnPart("a", "t1", s"stage-$tag"),
        cat.TxnPart("b", "t2", s"stage-$tag"))
  }

  private def meta(cat: GraftCatalog, ns: String, t: String) =
    Paths.get(cat.warehouse, ns, t, "_meta")

  test("happy path: one transaction publishes appends to two tables — " +
       "both heads advance with txn commit ids, reads include the new " +
       "rows, branches drop, and no barrier/journal/staged litter stays") {
    val cat = freshCat()
    mkTables(cat)
    val parts = stagePair(cat, "ok")
    val snaps = cat.commitTransaction(parts.map(p =>
      cat.TxnPart(p.ns, p.table, p.branch)), txnId = "happy-1")
    assert(snaps.map(_.commitId) === Seq("txn-happy-1-0", "txn-happy-1-1"))
    assert(cat.read("a", "t1").count() === 3L)
    assert(cat.read("b", "t2").count() === 3L)
    assert(cat.latest("a", "t1").get.commitId === "txn-happy-1-0")
    assert(cat.latest("b", "t2").get.commitId === "txn-happy-1-1")
    assert(!cat.branchExists("a", "t1", "stage-ok"))
    assert(!cat.branchExists("b", "t2", "stage-ok"))
    assert(!Files.exists(meta(cat, "a", "t1").resolve(".txn-barrier.json")))
    assert(!Files.exists(meta(cat, "b", "t2").resolve(".txn-barrier.json")))
    assert(!Files.exists(Paths.get(cat.warehouse, "_txn", "happy-1.json")))
    // replaying the same txnId refuses like every commit flavor
    val again = stagePair(cat, "ok2")
    intercept[GraftCatalog.DuplicateCommitException] {
      cat.commitTransaction(Seq(
        cat.TxnPart("a", "t1", "stage-ok2"), cat.TxnPart("b", "t2", "stage-ok2")),
        txnId = "happy-1")
    }
    assert(again.size === 2) // staged branches stay parked for forensics
    assert(cat.branchExists("a", "t1", "stage-ok2"))
  }

  test("all-or-nothing: a fork conflict on the SECOND table publishes " +
       "NOTHING to either table and leaves no stakes behind") {
    val cat = freshCat()
    mkTables(cat)
    stagePair(cat, "cfl"): Unit
    // move main of t2 after the branch forked — the txn must refuse
    cat.commitAppend("b", "t2", Seq((999L, "w")).toDF("k", "s"))
    val h1 = cat.latest("a", "t1").get.seq
    val h2 = cat.latest("b", "t2").get.seq
    intercept[GraftCatalog.MergeConflictException] {
      cat.commitTransaction(Seq(
        cat.TxnPart("a", "t1", "stage-cfl"), cat.TxnPart("b", "t2", "stage-cfl")),
        txnId = "cfl-1")
    }
    assert(cat.latest("a", "t1").get.seq === h1, "t1 must not advance")
    assert(cat.latest("b", "t2").get.seq === h2, "t2 must not advance")
    assert(cat.read("a", "t1").count() === 2L)
    assert(!Files.exists(meta(cat, "a", "t1").resolve(".txn-barrier.json")))
    assert(!Files.exists(meta(cat, "b", "t2").resolve(".txn-barrier.json")))
    assert(!Files.exists(Paths.get(cat.warehouse, "_txn", "cfl-1.json")))
    // branches stay parked for retry after the caller reconciles
    assert(cat.branchExists("a", "t1", "stage-cfl"))
  }

  test("crash recovery, published: a dead coordinator's journal + " +
       "barriers + staged files are COMPLETED by the next ordinary " +
       "commit on ANY involved table — both tables advance atomically") {
    val cat = freshCat()
    mkTables(cat)
    // fabricate the exact post-publish, pre-apply state: stage real
    // branch commits, then write the merged version JSONs, barriers,
    // and journal the way the coordinator does — and "crash"
    stagePair(cat, "crash"): Unit
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    def stagedJson(ns: String, t: String, branch: String, cid: String): (Long, String) = {
      val head = cat.branchHead(ns, t, branch)
      val cur = cat.latest(ns, t).get
      val seq = cur.seq + 1
      val o = om.createObjectNode()
      o.put("seq", seq): Unit
      o.put("commitId", cid): Unit
      o.put("parentId", cur.commitId): Unit
      o.put("timestampMs", System.currentTimeMillis()): Unit
      o.put("sourceRegion", head.sourceRegion): Unit
      o.put("fileCount", head.fileCount): Unit
      o.put("totalBytes", head.totalBytes): Unit
      head.schemaJson.foreach(s => o.put("schemaJson", s): Unit)
      head.propsJson.foreach(s => o.put("propsJson", s): Unit)
      val arr = o.putArray("manifests")
      head.manifests.foreach(m => arr.add(m): Unit)
      (seq, om.writeValueAsString(o))
    }
    val deadline = System.currentTimeMillis() + 60000L
    val partsJson = Seq(("a", "t1", 0), ("b", "t2", 1)).map { case (ns, t, i) =>
      val cid = s"txn-crash-1-$i"
      val (seq, json) = stagedJson(ns, t, s"stage-crash", cid)
      val stagedName = s".txn-crash-1-v$seq.json"
      Files.write(meta(cat, ns, t).resolve(stagedName), json.getBytes(UTF_8))
      Files.write(meta(cat, ns, t).resolve(".txn-barrier.json"),
        s"""{"txnId":"crash-1","deadlineMs":$deadline}""".getBytes(UTF_8))
      s"""{"ns":"$ns","table":"$t","seq":$seq,"commitId":"$cid","staged":"$stagedName"}"""
    }
    val txnDir = Paths.get(cat.warehouse, "_txn")
    Files.createDirectories(txnDir)
    Files.write(txnDir.resolve("crash-1.json"),
      s"""{"txnId":"crash-1","parts":[${partsJson.mkString(",")}]}"""
        .getBytes(UTF_8))

    // an ordinary commit on ONE table finds the barrier, completes the
    // WHOLE transaction, and then lands on top of it
    val snap = cat.commitAppend("a", "t1", Seq((4L, 40.0)).toDF("id", "v"))
    assert(snap.parentId.contains("txn-crash-1-0"),
      "the recovery commit must land ON TOP of the completed txn")
    assert(cat.latest("b", "t2").get.commitId === "txn-crash-1-1",
      "the OTHER table must be completed too — atomicity across recovery")
    assert(cat.read("a", "t1").count() === 4L) // 2 base + txn + recovery append
    assert(cat.read("b", "t2").count() === 3L)
    assert(!Files.exists(txnDir.resolve("crash-1.json")))
    assert(!Files.exists(meta(cat, "a", "t1").resolve(".txn-barrier.json")))
    assert(!Files.exists(meta(cat, "b", "t2").resolve(".txn-barrier.json")))
  }

  test("crash recovery, unpublished: an EXPIRED barrier with no journal " +
       "is aborted — the staged stake is reclaimed and the ordinary " +
       "commit proceeds as if the transaction never happened") {
    val cat = freshCat()
    mkTables(cat)
    val expired = System.currentTimeMillis() - 1000L
    val staged = meta(cat, "a", "t1").resolve(".txn-dead-1-v99.json")
    Files.write(staged, "{}".getBytes(UTF_8))
    Files.write(meta(cat, "a", "t1").resolve(".txn-barrier.json"),
      s"""{"txnId":"dead-1","deadlineMs":$expired}""".getBytes(UTF_8))
    val snap = cat.commitAppend("a", "t1", Seq((4L, 40.0)).toDF("id", "v"))
    assert(snap.seq === 1L) // straight after the base commit (seq 0)
    assert(!Files.exists(staged), "the dead txn's stake must be reclaimed")
    assert(!Files.exists(meta(cat, "a", "t1").resolve(".txn-barrier.json")))
    assert(cat.read("a", "t1").count() === 3L)
  }

  test("a FRESH barrier blocks ordinary commits until its lease expires " +
       "(writer serialization through the funnel)") {
    val cat = freshCat()
    mkTables(cat)
    val deadline = System.currentTimeMillis() + 1500L
    Files.write(meta(cat, "a", "t1").resolve(".txn-barrier.json"),
      s"""{"txnId":"slow-1","deadlineMs":$deadline}""".getBytes(UTF_8))
    val t0 = System.nanoTime()
    cat.commitAppend("a", "t1", Seq((4L, 40.0)).toDF("id", "v")): Unit
    val waitedMs = (System.nanoTime() - t0) / 1e6
    assert(waitedMs >= 1000.0,
      s"the commit must wait out the fresh barrier, waited only $waitedMs ms")
    assert(cat.read("a", "t1").count() === 3L)
  }

  test("transactions serialize against CONCURRENT ordinary commits: " +
       "under a write storm on one member table, the transaction either " +
       "lands atomically or refuses — the log stays contiguous and no " +
       "version is ever lost") {
    val cat = freshCat()
    mkTables(cat)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val landed = new java.util.concurrent.atomic.AtomicInteger(0)
    val storm = new Thread(() => {
      var i = 0
      while (!stop.get()) {
        cat.commitAppend("a", "t1",
          Seq((1000L + i, 1.0)).toDF("id", "v"), maxRetries = 50): Unit
        landed.incrementAndGet(): Unit
        i += 1
      }
    })
    storm.start()
    var committed = 0
    var conflicts = 0
    (1 to 3).foreach { k =>
      val tag = s"storm$k"
      try {
        cat.createBranch("a", "t1", tag)
        cat.createBranch("b", "t2", tag)
        cat.commitAppendToBranch("a", "t1", tag,
          Seq((-k.toLong, 0.0)).toDF("id", "v"))
        cat.commitAppendToBranch("b", "t2", tag,
          Seq((-k.toLong * 100, "t")).toDF("k", "s"))
        cat.commitTransaction(Seq(
          cat.TxnPart("a", "t1", tag), cat.TxnPart("b", "t2", tag)),
          txnId = s"storm-$k")
        committed += 1
      } catch {
        case _: GraftCatalog.MergeConflictException => conflicts += 1
      }
    }
    stop.set(true)
    storm.join(30000)
    // once main is quiet, a fast-forward transaction must land (the
    // machinery is not wedged by the contention above) — retried
    // staging because the storm may still have raced the first fork
    var post = 0
    var tries = 0
    while (post == 0 && tries < 5) {
      tries += 1
      val tag = s"post$tries"
      cat.createBranch("a", "t1", tag)
      cat.createBranch("b", "t2", tag)
      cat.commitAppendToBranch("a", "t1", tag, Seq((-77L, 0.0)).toDF("id", "v"))
      cat.commitAppendToBranch("b", "t2", tag, Seq((-77L, "p")).toDF("k", "s"))
      try {
        cat.commitTransaction(Seq(
          cat.TxnPart("a", "t1", tag), cat.TxnPart("b", "t2", tag)),
          txnId = s"post-$tries")
        post = 1
        committed += 1
      } catch { case _: GraftCatalog.MergeConflictException => () }
    }
    assert(post === 1, "a transaction over a quiet main must land")
    // the log is contiguous: every seq from 0..head exists exactly once
    val seqs = cat.snapshots("a", "t1").map(_.seq)
    assert(seqs === (0L to seqs.max).toSeq, s"non-contiguous log: $seqs")
    // nothing lost: base + storm appends + committed txn parts
    assert(seqs.size === 1 + landed.get() + committed,
      s"expected 1 base + ${landed.get()} storm + $committed txn commits, " +
        s"log has ${seqs.size}")
    // atomicity: t2 carries exactly the committed txns' parts — a
    // conflicted transaction left NOTHING on either table
    val t2Txn = cat.snapshots("b", "t2").count(_.commitId.startsWith("txn-"))
    val t1Txn = seqs.size - 1 - landed.get()
    assert(t2Txn === committed && t1Txn === committed,
      s"txn parts diverge: t1=$t1Txn t2=$t2Txn committed=$committed")
    assert(conflicts + committed === 4) // 3 storm-phase outcomes + the post txn
  }

  test("a PUBLISHED transaction whose target slot was stolen before ANY " +
       "part applied is CANCELLED by recovery — later commits proceed, " +
       "nothing partial lands on either table, all stakes are reclaimed") {
    val cat = freshCat()
    mkTables(cat)
    // the breach the grace window normally prevents: a regular commit
    // takes t1's next slot FIRST...
    cat.commitAppend("a", "t1", Seq((7L, 7.0)).toDF("id", "v")): Unit
    // ...then a transaction's published state appears claiming that same
    // slot (the coordinator died right after publishing). Staged content
    // is never parsed on the cancel path, so stubs suffice.
    val deadline = System.currentTimeMillis() + 60000L
    val partsJson = Seq(("a", "t1", 1L, 0), ("b", "t2", 1L, 1)).map {
      case (ns, t, seq, i) =>
        val stagedName = s".txn-steal1-v$seq.json"
        Files.write(meta(cat, ns, t).resolve(stagedName), "{}".getBytes(UTF_8))
        Files.write(meta(cat, ns, t).resolve(".txn-barrier.json"),
          s"""{"txnId":"steal1","deadlineMs":$deadline}""".getBytes(UTF_8))
        s"""{"ns":"$ns","table":"$t","seq":$seq,""" +
          s""""commitId":"txn-steal1-$i","staged":"$stagedName"}"""
    }
    val txnDir = Paths.get(cat.warehouse, "_txn")
    Files.createDirectories(txnDir)
    Files.write(txnDir.resolve("steal1.json"),
      s"""{"txnId":"steal1","parts":[${partsJson.mkString(",")}]}"""
        .getBytes(UTF_8))

    // an ordinary commit on the OTHER table drives recovery: the txn
    // cancels cleanly (slot gone, nothing applied) instead of wedging
    // every involved table forever
    val s2 = cat.commitAppend("b", "t2", Seq((8L, "y")).toDF("k", "s"))
    assert(s2.seq === 1L)
    assert(!Files.exists(txnDir.resolve("steal1.json")),
      "the cancelled journal must be reclaimed")
    assert(!Files.exists(meta(cat, "a", "t1").resolve(".txn-barrier.json")))
    assert(!Files.exists(meta(cat, "b", "t2").resolve(".txn-barrier.json")))
    assert(!Files.exists(meta(cat, "a", "t1").resolve(".txn-steal1-v1.json")))
    assert(cat.snapshots("a", "t1").forall(!_.commitId.startsWith("txn-")),
      "no part of the cancelled transaction may appear on t1")
    assert(cat.snapshots("b", "t2").forall(!_.commitId.startsWith("txn-")),
      "no part of the cancelled transaction may appear on t2")
    // the warehouse is fully unwedged: a transaction commits normally
    val fresh = stagePair(cat, "after")
    val snaps = cat.commitTransaction(fresh.map(p =>
      cat.TxnPart(p.ns, p.table, p.branch)), txnId = "after-1")
    assert(snaps.size === 2)
  }

  test("snapshotConsistent: no cut ever splits a transaction — under a " +
       "committing storm every pinned pair sees the SAME set of applied " +
       "transactions on both tables, and the pins read coherently") {
    val cat = freshCat()
    mkTables(cat)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val committer = new Thread(() => {
      try {
        (1 to 10).foreach { k =>
          val tag = s"c$k"
          cat.createBranch("a", "t1", tag)
          cat.createBranch("b", "t2", tag)
          cat.commitAppendToBranch("a", "t1", tag,
            Seq((10L + k, 1.0)).toDF("id", "v"))
          cat.commitAppendToBranch("b", "t2", tag,
            Seq((10L + k, "x")).toDF("k", "s"))
          cat.commitTransaction(Seq(
            cat.TxnPart("a", "t1", tag), cat.TxnPart("b", "t2", tag)),
            txnId = s"cut$k"): Unit
        }
      } finally stop.set(true)
    })
    def txnIdsUpTo(ns: String, t: String, seq: Long): Set[String] =
      cat.snapshots(ns, t).filter(_.seq <= seq).map(_.commitId)
        .filter(_.startsWith("txn-cut"))
        .map(_.stripSuffix("-0").stripSuffix("-1")).toSet
    committer.start()
    var cuts = 0
    try {
      while (!stop.get()) {
        val pins = cat.snapshotConsistent(Seq(("a", "t1"), ("b", "t2")))
        assert(txnIdsUpTo("a", "t1", pins(0).seq) ===
          txnIdsUpTo("b", "t2", pins(1).seq),
          s"cut (${pins(0).seq}, ${pins(1).seq}) split a transaction")
        cuts += 1
        Thread.sleep(15)
      }
    } finally { stop.set(true); committer.join(60000) }
    assert(cuts > 0, "the reader must have taken at least one cut")
    // the final cut sees all ten transactions on both tables
    val fin = cat.snapshotConsistent(Seq(("a", "t1"), ("b", "t2")))
    assert(txnIdsUpTo("a", "t1", fin(0).seq).size === 10)
    assert(cat.readVersion("a", "t1", fin(0).seq).count() === 12L)
    assert(cat.readVersion("b", "t2", fin(1).seq).count() === 12L)
  }
}
