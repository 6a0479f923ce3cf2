package graft

import graft.pipeline.{GraphOps, Retrieval, Similarity}
import org.apache.spark.sql.functions._

/** BM25 retrieval, rank-quantile gating, PageRank, int8 quantization —
  * planted fixtures with hand-checkable arithmetic. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // ---------------- BM25 ----------------

  private val bmDocs = Seq(
    (0L, "x x x y"),      // tf(x)=3, dl=4
    (1L, "x y z z"),      // tf(x)=1, dl=4
    (2L, "y y y y"),      // no query term
    (3L, "x"),            // tf(x)=1, dl=1 — shorter doc, same tf as doc 1
    (4L, "x x y y")       // tf(x)=2, dl=4
  ).toDF("doc_id", "text")

  test("bm25: tf drives rank at equal length; shorter doc beats longer at equal tf") {
    val out = Retrieval.bm25TopK(bmDocs, "doc_id", "text", Seq("x"), topK = 10)
      .as[(Long, Double, Int)].collect().toSeq
    val ranks = out.map(r => r._1 -> r._3).toMap
    // doc 2 has no query term — absent
    assert(!ranks.contains(2L))
    assert(out.map(_._3) === (1 to out.size))
    // tf ordering at equal dl: 0 (tf3) before 4 (tf2) before 1 (tf1)
    assert(ranks(0L) < ranks(4L) && ranks(4L) < ranks(1L))
    // length normalization: doc 3 (dl=1) beats doc 1 (dl=4) at tf=1
    assert(ranks(3L) < ranks(1L))
  }

  test("bm25 score replays the formula by hand") {
    val out = Retrieval.bm25TopK(bmDocs, "doc_id", "text", Seq("x"), topK = 10)
      .as[(Long, Double, Int)].collect().map(r => r._1 -> r._2).toMap
    val n = 5.0; val df = 4.0; val avgdl = (4 + 4 + 4 + 1 + 4) / 5.0
    val idf = BigDecimal(math.log(1.0 + (n - df + 0.5) / (df + 0.5)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def score(tf: Double, dl: Double) = {
      val c = BigDecimal(idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      BigDecimal(c).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out(0L) === score(3, 4))
    assert(out(3L) === score(1, 1))
  }

  // ---------------- rank-quantile gate ----------------

  test("quantileGate keeps rows at or above the ceil(q*n) ascending rank") {
    val rows = ((1 to 8).map(i => (i.toLong, "g1", i.toDouble)) ++
                (1 to 5).map(i => (100L + i, "g2", i.toDouble)))
      .toDF("doc_id", "grp", "score")
    val kept = Retrieval.quantileGate(rows, "doc_id", "score", "grp", q = 0.75)
      .select("doc_id").as[Long].collect().toSet
    // g1: n=8, thr = value at rank ceil(6.0)=6 → scores {6,7,8}
    // g2: n=5, thr = value at rank ceil(3.75)=4 → scores {4,5}
    assert(kept === Set(6L, 7L, 8L, 104L, 105L))
  }

  test("quantileGate with all-equal scores keeps the whole group") {
    val rows = (1 to 4).map(i => (i.toLong, "g", 1.0)).toDF("doc_id", "grp", "score")
    val kept = Retrieval.quantileGate(rows, "doc_id", "score", "grp", q = 0.75)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 3L, 4L))
  }

  // ---------------- PageRank ----------------

  private def r9(x: Double) =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("pageRank matches an in-memory replay; highest-degree node wins; mass conserved") {
    // path 1-2-3 symmetrized, node 4 isolated (dangling every round)
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val got = GraphOps.pageRank(GraphOps.symmetrize(pairs, "id_a", "id_b"),
        nodes, iters = 3, damping = 0.85)
      .as[(Long, Double)].collect().toMap

    // naive replay with identical per-round rounding and the same double ops
    var pr = Seq(1L, 2L, 3L, 4L).map(_ -> r9(1.0 / 4.0)).toMap
    for (_ <- 1 to 3) {
      val dangling = pr(4L) // node 4 has no out-edges
      val in = Map(
        1L -> pr(2L) * (1.0 / 2.0),
        2L -> (pr(1L) * (1.0 / 1.0) + pr(3L) * (1.0 / 1.0)),
        3L -> pr(2L) * (1.0 / 2.0),
        4L -> 0.0)
      pr = pr.map { case (id, _) =>
        id -> r9((1.0 - 0.85) / 4.0 + 0.85 * (in(id) + dangling / 4.0))
      }
    }
    assert(got === pr)
    assert(got.maxBy(_._2)._1 === 2L)            // degree-2 hub wins
    assert(math.abs(got.values.sum - 1.0) < 1e-6) // dangling mass not lost
  }

  // ---------------- int8 quantization ----------------

  test("quantizeInt8 codes replay floor(v/scale + 0.5) exactly") {
    val df = Seq((0L, Array(1.0f, -0.5f, 0.25f, 0.0f))).toDF("vec_id", "embedding")
    val codes = df.select(Similarity.quantizeInt8(col("embedding")).as("q"))
      .as[Array[Long]].head()
    // scale = 1/127: 1.0→127, -0.5→floor(-63.5+0.5)=-63, 0.25→floor(32.25)=32
    assert(codes === Array(127L, -63L, 32L, 0L))
  }

  test("int8 cosine: identical vectors 1.0; zero vector scores 0.0, never NaN-ranks first") {
    val df = Seq(
      (0L, Array(0.3f, 0.7f, -0.2f)),
      (1L, Array(0.3f, 0.7f, -0.2f)),
      (2L, Array(0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = df.select(col("vec_id"), Similarity.quantizeInt8(col("embedding")).as("q"))
    val self = q.as("a").join(q.as("b"), col("a.vec_id") === 0 && col("b.vec_id") === 1)
      .select(Similarity.int8Cosine(col("a.q"), col("b.q"))).as[Double].head()
    assert(self === 1.0)
    val zeroCodes = q.filter(col("vec_id") === 2).select("q").as[Array[Long]].head()
    assert(zeroCodes === Array(0L, 0L, 0L)) // 1e-30 guard: codes collapse
    // the zero vector must score 0.0 against everything and land LAST,
    // not NaN (which sorts above every real score in a desc top-k)
    val top = Similarity.int8TopK(df, df.filter(col("vec_id") === 0), k = 2)
      .select("neighbor_id", "score", "rank").as[(Long, Double, Int)].collect().sortBy(_._3)
    assert(top.map(_._1).toSeq === Seq(1L, 2L))
    assert(top(1)._2 === 0.0 && !top(1)._2.isNaN)
  }

  test("int8TopK agrees with exact cosine top-1 when gaps dominate grid noise") {
    val corpus = (0 until 50).map { i =>
      val base = Array.tabulate(8)(j => math.sin(i * 8 + j).toFloat)
      (i.toLong, base)
    }.toDF("vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(corpus, corpus.filter(col("vec_id") < 5), 1)
      .filter(col("rank") === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    val q = Similarity.int8TopK(corpus, corpus.filter(col("vec_id") < 5), 1)
      .filter(col("rank") === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    // int8 perturbs each coordinate by <= scale/2 ≈ 0.004 — far below the
    // cosine gaps between sin-wave vectors, so the argmax is unchanged
    assert(q === exact)
  }

  // ---------------- first-occurrence novelty ----------------

  test("noveltyScore: first owner keeps, copies score 0, partial overlap is fractional") {
    val docs = Seq(
      (0L, "a b c d"),   // grams {a b c, b c d} — both introduced here
      (1L, "a b c d"),   // exact copy — nothing new
      (2L, "a b c x"),   // {a b c} owned by 0, {b c x} new → 0.5
      (3L, "zz")         // < 3 tokens — no grams, survives with novelty 0
    ).toDF("doc_id", "text")
    val out = graft.pipeline.Curation.noveltyScore(docs, "doc_id", "text", n = 3)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(0L) === ((2L, 1.0)))
    assert(out(1L) === ((2L, 0.0)))
    assert(out(2L) === ((2L, 0.5)))
    assert(out(3L) === ((0L, 0.0)))
  }

  test("noveltyAgainst: unseen grams count, seen grams don't, short docs survive") {
    val admitted = Seq((0L, "a b c d")).toDF("doc_id", "text") // grams {a b c, b c d}
    val batch = Seq(
      (10L, "a b c d"),  // both grams seen → 0.0
      (11L, "a b c x"),  // {a b c} seen, {b c x} new → 0.5
      (12L, "p q r s"),  // all new → 1.0
      (13L, "zz")        // gram-less → 0 grams, 0.0
    ).toDF("doc_id", "text")
    val out = graft.pipeline.Curation.noveltyAgainst(admitted, batch, "doc_id", "text", n = 3)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(10L) === ((2L, 0.0)))
    assert(out(11L) === ((2L, 0.5)))
    assert(out(12L) === ((2L, 1.0)))
    assert(out(13L) === ((0L, 0.0)))
  }

  test("vocabEncode: frequency-then-token ranking, in-order ids, OOV encodes as 0") {
    // counts: a=3, b=3 (tie → a first), c=1, x=1 (c ranks, x falls out at V=3)
    val docs = Seq((0L, "b a b c b a"), (1L, "a x")).toDF("doc_id", "text")
    val out = graft.pipeline.Curation.vocabEncode(docs, "doc_id", "text", vocabSize = 3)
      .as[(Long, Long, Long, Array[Int])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4.toSeq))).toMap
    assert(out(0L) === ((6L, 0L, Seq(2, 1, 2, 3, 2, 1))))
    assert(out(1L) === ((2L, 1L, Seq(1, 0))))
  }

  test("skew report finds the planted hot key ratio on a tiny frame") {
    val rows = (1 to 50).map(i => (1L, i)) ++ (2 to 11).map(i => (i.toLong, i))
    val counts = rows.toDF("k", "v").groupBy(col("k")).agg(count(lit(1)).as("cnt"))
    val r = counts.agg(
        max(col("cnt")).as("max_rows"),
        round(max(col("cnt")) / avg(col("cnt")), 4).as("skew_ratio"))
      .as[(Long, Double)].head()
    // key 1 holds 50 rows, 10 keys hold 1 → avg (50+10)/11, ratio 50/avg
    assert(r._1 === 50L)
    assert(r._2 === BigDecimal(50.0 / (60.0 / 11.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  // ---------------- centroid drift ----------------

  test("centroidDrift: unchanged distribution reads 1.0, rotated one reads 0") {
    val ref = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(1.0f, 0.1f), 0),
      (2L, Array(0.0f, 1.0f), 1), (3L, Array(0.1f, 1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val cur = Seq(
      (10L, Array(1.0f, 0.0f), 0), (11L, Array(1.0f, 0.1f), 0), // identical
      (12L, Array(1.0f, 0.0f), 1), (13L, Array(1.0f, -0.1f), 1) // ~90° rotation
    ).toDF("vec_id", "embedding", "label")
    val r = Similarity.centroidDrift(ref, cur)
      .as[(Int, Long, Long, Double)].collect().map(x => x._1 -> x._4).toMap
    assert(r(0) === 1.0)
    assert(r(1) === 0.0) // centroids (0.05,1.0) vs (1.0,-0.05): exact orthogonality
  }

  // ---------------- triangle counting ----------------

  test("triangleCounts: one triangle + pendant edge + isolated node; K4 gives 3 per node") {
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val r = GraphOps.triangleCounts(pairs, nodes)
      .as[(Long, Long)].collect().toMap
    assert(r === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L, 5L -> 0L))

    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("id_a", "id_b")
    val r4 = GraphOps.triangleCounts(k4, Seq(1L, 2L, 3L, 4L).toDF("id"))
      .as[(Long, Long)].collect().toMap
    assert(r4.values.toSeq === Seq(3L, 3L, 3L, 3L))
  }

  test("kCore peels a chain into the triangle core across cascading rounds") {
    // triangle {1,2,3} with a chain 3-4-5-6 hanging off: at k=2 the chain
    // peels one vertex per round (6, then 5, then 4) — a 3-round cascade —
    // leaving the triangle where everyone keeps degree 2
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("id_a", "id_b")
    val core = GraphOps.kCore(pairs, k = 2)
      .as[(Long, Long)].collect().toMap
    assert(core === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // k=3: the triangle itself dies -> empty core (terminates cleanly)
    assert(GraphOps.kCore(pairs, k = 3).count() === 0L)
    // a cascade deeper than maxRounds fails LOUDLY, never a partial core
    assertThrows[IllegalStateException] {
      GraphOps.kCore(pairs, k = 2, maxRounds = 2).count()
    }
  }

  // ---------------- RRF fusion ----------------

  test("rrfFuse: both-list docs outrank single-list docs; missing ranks contribute 0") {
    val lex = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rank")
    val sem = Seq((20L, 1), (40L, 2), (10L, 3)).toDF("doc_id", "rank")
    val out = Retrieval.rrfFuse(lex, sem, "doc_id", kConst = 60, topK = 10)
      .as[(Long, Option[Int], Option[Int], Double, Int)].collect().toSeq
    val byId = out.map(r => r._1 -> r).toMap
    def rrf(rs: Seq[Int]) = BigDecimal(rs.map(r => 1.0 / (r + 60)).sum)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 20: ranks (2,1); doc 10: ranks (1,3); both beat single-list 30/40
    assert(byId(20L)._4 === rrf(Seq(2, 1)))
    assert(byId(10L)._4 === rrf(Seq(1, 3)))
    assert(byId(30L)._4 === rrf(Seq(3)) && byId(30L)._3.isEmpty)
    assert(byId(40L)._4 === rrf(Seq(2)) && byId(40L)._2.isEmpty)
    assert(out.sortBy(_._5).map(_._1) === Seq(20L, 10L, 40L, 30L))
  }

  // ---------------- HLL accuracy contract ----------------

  test("approx distinct stays inside the 20% contract on the events table") {
    val violations = SparkEntry.queries("slo_hll_check")(spark, sf()).count()
    assert(violations === 0L)
  }

  // ---------------- count-min sketch ----------------

  test("CMS: estimates are exact at low load, never undercount, and unseen keys read 0") {
    import graft.pipeline.Sketches
    val rows = Seq.fill(7)("alpha") ++ Seq.fill(3)("beta") ++ Seq("gamma")
    val df = rows.toDF("k")
    val sketch = Sketches.cmsBuild(df, "k", depth = 4, width = 1024)
    // sketch is bounded: at most depth*width cells, exactly depth*distinct here
    assert(sketch.count() <= 4L * 1024)
    val probes = Seq("alpha", "beta", "gamma", "never_seen").toDF("k")
    val est = Sketches.cmsEstimate(sketch, probes, "k", depth = 4, width = 1024)
      .as[(String, Long)].collect().toMap
    // 3 keys in 1024 buckets: no full-depth collision, so estimates are exact
    assert(est("alpha") === 7L && est("beta") === 3L && est("gamma") === 1L)
    assert(est("never_seen") === 0L)
  }

  test("CMS never undercounts on the events table (the slo_cms_check contract)") {
    val violations = SparkEntry.queries("slo_cms_check")(spark, sf()).count()
    assert(violations === 0L)
  }

  // ---------------- inverted index ----------------

  test("invertedIndex postings are sorted per-doc-distinct; maxDf elides stop terms") {
    import graft.pipeline.Retrieval
    val docs = Seq(
      (3L, "the cat sat"), (1L, "the cat cat ran"), (2L, "the dog ran")
    ).toDF("doc_id", "text")
    val idx = Retrieval.invertedIndex(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getSeq[Long](2)))).toMap
    assert(idx("the") === ((3L, Seq(1L, 2L, 3L))))   // sorted despite arrival order
    assert(idx("cat") === ((2L, Seq(1L, 3L))))       // in-doc repeat counts once
    assert(idx("sat") === ((1L, Seq(3L))))
    // elision keeps the (token, df) row but nulls the postings — the
    // marker that lets a serve path distinguish elided from absent
    val byTok = Retrieval.invertedIndex(docs, "doc_id", "text", maxDf = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.isNullAt(2)))).toMap
    assert(byTok("the") === ((3L, true)), "stop term keeps df, loses postings")
    assert(byTok("cat") === ((2L, false)))
  }

  test("serveConjunctive from the index equals a direct corpus scan") {
    import graft.pipeline.Retrieval
    val docs = Seq(
      (1L, "spark merge vector io"), (2L, "spark merge"), (3L, "vector merge spark"),
      (4L, "spark vector"), (5L, "")
    ).toDF("doc_id", "text")
    val idx = Retrieval.invertedIndex(docs, "doc_id", "text")
    val served = Retrieval.serveConjunctive(idx, Seq("Spark", "vector", "MERGE", "spark"))
      .as[Long].collect().toSet
    assert(served === Set(1L, 3L))
    // empty-result conjunction (one term absent from the corpus)
    assert(Retrieval.serveConjunctive(idx, Seq("spark", "nosuchterm")).count() === 0L)
    // ... but a term ELIDED at build time must fail loudly, not return
    // a silently wrong empty intersection
    val tight = Retrieval.invertedIndex(docs, "doc_id", "text", maxDf = 3)
    val ex = intercept[IllegalArgumentException] {
      Retrieval.serveConjunctive(tight, Seq("spark", "vector")).count()
    }
    assert(ex.getMessage.contains("spark"), "error names the elided term")
  }
}
