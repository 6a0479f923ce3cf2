package graft

import graft.operators.{AsOfJoin, RangeJoin}
import graft.pipeline.Curation
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** As-of / range join semantics and curation (contamination, sampling,
  * repetition) on planted fixtures, each checked against the naive
  * brute-force computation of the same answer. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // ---------------- as-of join ----------------

  private val trades = Seq(
    (1L, "A", ts("2024-01-01 10:00:05"), 1.0),
    (2L, "A", ts("2024-01-01 10:00:20"), 2.0),
    (3L, "B", ts("2024-01-01 10:00:10"), 3.0),
    (4L, "C", ts("2024-01-01 09:00:00"), 4.0) // before any quote
  ).toDF("trade_id", "sym", "t", "qty")

  private val quotes = Seq(
    (10L, "A", ts("2024-01-01 10:00:00"), 99.0),
    (11L, "A", ts("2024-01-01 10:00:05"), 100.0), // exactly at trade 1
    (12L, "A", ts("2024-01-01 10:00:15"), 101.0),
    (13L, "B", ts("2024-01-01 10:00:01"), 200.0),
    (14L, "C", ts("2024-01-01 12:00:00"), 300.0)
  ).toDF("quote_id", "sym", "qt", "px")

  test("asOf picks the latest right row at-or-before each left row; left-outer when none") {
    val got = AsOfJoin.asOf(trades, quotes, Seq("sym"), "t", "qt", Seq("quote_id", "px"))
      .select("trade_id", "asof_quote_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(got === Map(
      1L -> Some(11L), // exact-timestamp quote matches (at-or-before)
      2L -> Some(12L),
      3L -> Some(13L),
      4L -> None))     // no quote at or before 09:00
  }

  test("asOfExec reproduces the planted trades/quotes semantics exactly") {
    val got = AsOfJoin.asOfExec(trades, quotes, Seq("sym"), "t", "qt", Seq("quote_id", "px"))
      .select("trade_id", "asof_quote_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(got === Map(
      1L -> Some(11L), // exact-timestamp quote matches (at-or-before)
      2L -> Some(12L),
      3L -> Some(13L),
      4L -> None))     // no quote at or before 09:00
  }

  test("asOfExec matches the window form on null keys and null timestamps") {
    // null keys group together (window-partition semantics); a null TIME
    // on either side can never satisfy "at or before" (SQL comparison
    // semantics, matching DuckDB ASOF): null-time rights are filtered,
    // null-time lefts get left-outer nulls
    val left = Seq(
      (1L, Option("A"), Option(ts("2024-01-01 10:00:10"))),
      (2L, Option("A"), Option.empty[Timestamp]),
      (3L, Option.empty[String], Option(ts("2024-01-01 10:00:10"))),
      (4L, Option.empty[String], Option.empty[Timestamp])
    ).toDF("lid", "k", "t")
    val right = Seq(
      (100L, Option("A"), Option(ts("2024-01-01 10:00:00"))),
      (101L, Option("A"), Option.empty[Timestamp]),
      (102L, Option.empty[String], Option(ts("2024-01-01 10:00:05"))),
      (103L, Option.empty[String], Option.empty[Timestamp])
    ).toDF("rid", "k", "rt")
    val ref = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("rid"))
      .select("lid", "asof_rid").as[(Long, Option[Long])].collect().toMap
    val got = AsOfJoin.asOfExec(left, right, Seq("k"), "t", "rt", Seq("rid"))
      .select("lid", "asof_rid").as[(Long, Option[Long])].collect().toMap
    assert(got === ref)
    // and the semantics themselves, not just parity
    assert(got === Map(1L -> Some(100L), 2L -> None,
                       3L -> Some(102L), 4L -> None))
  }

  test("asOf equals the brute-force argmax on a random fixture") {
    val r = new scala.util.Random(7)
    val left = (1 to 200).map(i =>
      (i.toLong, s"k${r.nextInt(5)}", new Timestamp(1700000000000L + r.nextInt(100000) * 1000L)))
      .toDF("lid", "k", "t")
    val right = (1 to 300).map(i =>
      (i.toLong, s"k${r.nextInt(5)}", new Timestamp(1700000000000L + r.nextInt(100000) * 1000L)))
      .toDF("rid", "k", "rt")
    val got = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("rid"))
      .select("lid", "asof_rid").as[(Long, Option[Long])].collect().toMap
    val naive = left.join(right, Seq("k"), "left")
      .filter(col("rt") <= col("t") || col("rt").isNull)
      .groupBy(col("lid"))
      .agg(max_by(col("rid"), struct(col("rt"), col("rid"))).as("rid"))
      .as[(Long, Option[Long])].collect().toMap
    val allLeft = left.select("lid").as[Long].collect()
      .map(l => l -> naive.getOrElse(l, None)).toMap
    assert(got === allLeft)
  }

  // ---------------- range join ----------------

  test("bucketed range join equals the naive inequality join") {
    val r = new scala.util.Random(11)
    val points = (1 to 500).map(i => (i.toLong, r.nextDouble() * 100)).toDF("pid", "v")
    val ivals = (1 to 200).map { i =>
      val lo = r.nextDouble() * 100
      (i.toLong, lo, lo + r.nextDouble() * 5)
    }.toDF("iid", "lo", "hi")
    val got = RangeJoin.pointsInIntervals(points, ivals, "v", "lo", "hi", bucketWidth = 3.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = points.crossJoin(ivals)
      .filter(col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got === naive)
    assert(got.nonEmpty)
  }

  test("interval overlap join equals the naive inequality join; multi-bucket overlaps emit once") {
    val r = new scala.util.Random(13)
    def ivals(n: Int, seedCol: String, maxW: Double) = (1 to n).map { i =>
      val lo = r.nextDouble() * 100
      (i.toLong, lo, lo + r.nextDouble() * maxW)
    }.toDF(seedCol, "lo", "hi")
    val a = ivals(200, "aid", 8.0).withColumnRenamed("lo", "a_lo").withColumnRenamed("hi", "a_hi")
    val b = ivals(200, "bid", 3.0).withColumnRenamed("lo", "b_lo").withColumnRenamed("hi", "b_hi")
    val got = RangeJoin.intervalOverlapJoin(a, b, "a_lo", "a_hi", "b_lo", "b_hi",
        bucketWidth = 2.0) // buckets much narrower than intervals: overlaps span many
      .select("aid", "bid").as[(Long, Long)].collect().toSeq
    val naive = a.crossJoin(b)
      .filter(col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    assert(got.toSet === naive)
    assert(got.size === got.toSet.size, "a pair emitted in more than one bucket")
    assert(got.nonEmpty)
  }

  // ---------------- curation ----------------

  private val docs = Seq(
    (0L, "src0", "alpha beta gamma delta epsilon zeta eta theta"),
    (1L, "src0", "alpha beta gamma delta DIFFERENT tail here now"),   // shares 3-grams with 0
    (2L, "src0", "totally unrelated words with no shared sequences"),
    (3L, "src1", "spam spam spam spam spam spam spam spam"),          // max repetition
    (4L, "src1", "eight distinct tokens make one diverse document x")
  ).toDF("doc_id", "source", "text")

  test("contamination flags docs sharing >= minShared n-grams with the eval set") {
    val eval  = docs.filter(col("doc_id") === 0)
    val train = docs.filter(col("doc_id") =!= 0)
    val hits = Curation.contamination(train, eval, "doc_id", "text", n = 3, minShared = 2)
      .select("train_doc", "eval_doc", "shared").as[(Long, Long, Long)].collect().toSet
    // doc 1 shares "alpha beta gamma" and "beta gamma delta" with doc 0
    assert(hits === Set((1L, 0L, 2L)))
  }

  test("stratifiedSample takes exactly k per stratum, deterministically") {
    val s1 = Curation.stratifiedSample(docs, "source", "doc_id", 2)
    val s2 = Curation.stratifiedSample(docs, "source", "doc_id", 2)
    val bySrc = s1.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySrc === Map("src0" -> 2L, "src1" -> 2L))
    assert(s1.select("doc_id").as[Long].collect().sorted
      === s2.select("doc_id").as[Long].collect().sorted)
  }

  test("tokenBudgetSample admits md5-ordered docs while the running total fits") {
    val withTokens = docs.withColumn("n_tokens", size(split(col("text"), " ")))
    val sel = Curation.tokenBudgetSample(withTokens, "source", "doc_id", "n_tokens", budget = 8)
    // every stratum spends within budget, and at least one doc is admitted
    val spend = sel.groupBy("source").agg(max("cum_tokens").as("m"))
      .as[(String, Long)].collect().toMap
    assert(spend.values.forall(_ <= 8))
    assert(spend.nonEmpty)
    // budget below the smallest doc admits nothing
    assert(Curation.tokenBudgetSample(withTokens, "source", "doc_id", "n_tokens", 5).count() === 0)
  }

  test("repetitionStats: repeated-token doc scores zero entropy and max repetition") {
    val stats = Curation.repetitionStats(docs, "doc_id", "text")
      .select("doc_id", "word_entropy", "top_bigram_frac", "dup_trigram_frac")
      .as[(Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val (e3, tb3, dup3) = stats(3L)
    assert(e3 === 0.0)      // single repeated token
    assert(tb3 === 1.0)     // the only bigram is the top bigram
    assert(dup3 === round6(1.0 - 1.0 / 6))  // 6 trigram slots, 1 distinct
    val (e4, _, dup4) = stats(4L)
    assert(e4 > 1.9 && dup4 === 0.0) // fully distinct doc
  }

  private def round6(d: Double) = math.round(d * 10000).toDouble / 10000

  test("lmQualityScore: common-vocabulary docs outscore rare-token docs; math matches brute force") {
    val corpus = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the mat"),
      (3L, "qzx vplk wyrt hjkm zzzq aa"), // gibberish: every token unique to it
      (4L, "the cat and the dog")
    ).toDF("doc_id", "text")
    val got = Curation.lmQualityScore(corpus, "doc_id", "text")
      .select("doc_id", "n_tokens", "avg_logprob")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // brute force: unigram p over the 23-token corpus
    val toks = Seq("the cat sat on the mat", "the dog sat on the mat",
      "qzx vplk wyrt hjkm zzzq aa", "the cat and the dog")
      .flatMap(_.split(" "))
    val p = toks.groupBy(identity).view.mapValues(_.size.toDouble / toks.size).toMap
    def score(text: String) = {
      val ws = text.split(" ")
      BigDecimal(ws.map(w => math.log(p(w))).sum / ws.size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got(1L)._1 === 6L)
    Seq(1L -> "the cat sat on the mat", 3L -> "qzx vplk wyrt hjkm zzzq aa").foreach {
      case (id, text) => assert(got(id)._2 === score(text), s"doc $id")
    }
    // the gibberish doc must sink below every prose doc
    assert(got(3L)._2 < Seq(1L, 2L, 4L).map(got(_)._2).min)
  }

  test("topNgrams counts occurrences and doc frequency; top-k cut is deterministic") {
    val corpus = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat ran and the cat hid"),
      (3L, "a dog sat")
    ).toDF("doc_id", "text")
    val got = Curation.topNgrams(corpus, "doc_id", "text", n = 2, k = 4)
      .as[(String, Long, Long)].collect()
    // brute-force replay: sliding bigrams per doc, tie-break gram asc
    val docs = Map(1L -> "the cat sat on the mat",
      2L -> "the cat ran and the cat hid", 3L -> "a dog sat")
    val grams = docs.toSeq.flatMap { case (id, t) =>
      t.split(" ").sliding(2).filter(_.length == 2).map(g => (id, g.mkString(" "))).toSeq
    }
    val occ = grams.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val dfreq = grams.distinct.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val expected = occ.toSeq.map { case (g, c) => (g, c, dfreq(g)) }
      .sortBy { case (g, c, _) => (-c, g) }.take(4)
    assert(got.toSeq === expected)
    // "the cat" appears 3 times across 2 docs — the clear heavy hitter
    assert(got.head === (("the cat", 3L, 2L)))
  }

  test("bigramLmScore sinks word-salad the unigram LM cannot see; replays the math") {
    val corpus = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the mat"),
      (3L, "the cat sat on the rug"),
      (4L, "mat the on sat cat the"), // shuffle of doc 1: same unigrams
      (5L, "solo")                    // no transitions
    ).toDF("doc_id", "text")
    val got = Curation.bigramLmScore(corpus, "doc_id", "text")
      .select("doc_id", "n_bigrams", "avg_logprob")
      .as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // brute-force replay of the interpolated math
    val texts = Map(1L -> "the cat sat on the mat", 2L -> "the dog sat on the mat",
      3L -> "the cat sat on the rug", 4L -> "mat the on sat cat the", 5L -> "solo")
    val allToks = texts.values.toSeq.flatMap(_.split(" "))
    val uni = allToks.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val nTotal = allToks.size.toDouble
    val allPairs = texts.values.toSeq.flatMap(t => t.split(" ").sliding(2).collect {
      case Array(a, b) => (a, b)
    })
    val bi = allPairs.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val w1 = allPairs.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    def score(t: String): Double = {
      val lps = t.split(" ").sliding(2).collect { case Array(a, b) =>
        math.log(0.7 * (bi((a, b)) / w1(a)) + 0.3 * (uni(b) / nTotal))
      }.toSeq
      BigDecimal(lps.sum / lps.size).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    Seq(1L, 2L, 3L, 4L).foreach { id =>
      assert(got(id)._1 === 5L)
      assert(got(id)._2 === Some(score(texts(id))), s"doc $id")
    }
    // the shuffle has a PERFECT unigram profile but improbable transitions
    assert(got(4L)._2.get < Seq(1L, 2L, 3L).map(got(_)._2.get).min,
      "word-salad must sink below every fluent doc")
    // and the unigram LM indeed cannot tell docs 1 and 4 apart
    val uniScores = Curation.lmQualityScore(corpus, "doc_id", "text")
      .select("doc_id", "avg_logprob").as[(Long, Double)].collect().toMap
    assert(uniScores(1L) === uniScores(4L))
    // a single-token doc surfaces with no transitions, not an error/drop
    assert(got(5L) === ((0L, None)))
  }

  test("chunkDocuments: full coverage, declared overlap, short last chunk only") {
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), // n=10: chunks at 1,4,7
      (2L, "a b c"),                           // n <= size: one whole chunk
      (3L, "x1 x2 x3 x4 x5")                   // n=5: [1-4] and short [4-5]
    ).toDF("doc_id", "text")
    val got = Curation.chunkDocuments(docs, "doc_id", "text", size = 4, stride = 3)
      .select("doc_id", "chunk_idx", "n_chunk_tokens", "chunk_text")
      .as[(Long, Int, Int, String)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got === Map(
      (1L, 0) -> ((4, "t1 t2 t3 t4")), (1L, 1) -> ((4, "t4 t5 t6 t7")),
      (1L, 2) -> ((4, "t7 t8 t9 t10")),
      (2L, 0) -> ((3, "a b c")),
      (3L, 0) -> ((4, "x1 x2 x3 x4")), (3L, 1) -> ((2, "x4 x5"))))
  }

  test("scoreWithLm against a persisted LM == self-scored corpus; OOV takes the floor") {
    val corpus = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the mat"),
      (3L, "the cat and the dog")
    ).toDF("doc_id", "text")
    val (vocab, total) = Curation.unigramLm(corpus, "doc_id", "text")
    val self = Curation.lmQualityScore(corpus, "doc_id", "text").collect().toSet
    val served = Curation.scoreWithLm(corpus, vocab, total, "doc_id", "text").collect().toSet
    assert(served === self)
    // a batch with out-of-vocabulary tokens scores at the floor (cnt=1),
    // not -inf / null
    val oov = Curation.scoreWithLm(
        Seq((9L, "zzz yyy")).toDF("doc_id", "text"), vocab, total, "doc_id", "text")
      .select("doc_id", "avg_logprob").as[(Long, Double)].collect().toMap
    val floor = BigDecimal(math.log(1.0 / 17)) // corpus has 6+6+5 = 17 tokens
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(oov(9L) === floor)
  }

  test("mixtureSample admits per-source md5-ordered docs within floor(budget*weight)") {
    val docs = Seq(
      (1L, "A", 4L), (2L, "A", 3L), (3L, "A", 5L),
      (10L, "B", 2L), (11L, "B", 6L),
      (20L, "C", 1L) // not in the mixture: must be dropped
    ).toDF("doc_id", "source", "n_tokens")
    val got = Curation.mixtureSample(docs, "source", "doc_id", "n_tokens",
        Seq("A" -> 0.7, "B" -> 0.3), totalBudget = 10L)
      .select("doc_id", "cum_tokens", "stratum_budget")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // brute-force replay: md5(id) order within source, cum <= floor(10*w)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long): String =
      md.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = Map("A" -> (Seq(1L, 2L, 3L), 7L), "B" -> (Seq(10L, 11L), 3L))
      .flatMap { case (_, (ids, budget)) =>
        val toks = Map(1L -> 4L, 2L -> 3L, 3L -> 5L, 10L -> 2L, 11L -> 6L)
        ids.sortBy(h).scanLeft((0L, 0L)) { case ((_, cum), id) => (id, cum + toks(id)) }
          .tail.takeWhile(_._2 <= budget)
          .map { case (id, cum) => id -> ((cum, budget)) }
      }
    assert(got === expected)
    assert(!got.contains(20L), "source outside the mixture must be dropped")
  }

  test("dsirWeights: target-like docs outweigh off-domain docs; math matches brute force") {
    val target = Seq(
      (100L, "the cat sat on the mat"),
      (101L, "a cat and another cat")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "the cat sat on a mat"),      // near-verbatim target domain
      (2L, "stock prices fell sharply"), // off-domain
      (3L, "qzx vplk wyrt hjkm")         // gibberish: unseen in target
    ).toDF("doc_id", "text")
    val got = Curation.dsirWeights(corpus, target, "doc_id", "text")
      .select("doc_id", "n_tokens", "dsir_weight")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // brute force replay: 3-hex-digit md5 buckets, add-one smoothing
    // over the 4096-bucket space on both sides, avg of log ratios
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(tok: String): String =
      md.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(3)
    val tgtToks = Seq("the cat sat on the mat", "a cat and another cat")
      .flatMap(_.split(" ")).map(bucket)
    val corToks = Seq("the cat sat on a mat", "stock prices fell sharply",
      "qzx vplk wyrt hjkm").flatMap(_.split(" ")).map(bucket)
    val tCnt = tgtToks.groupBy(identity).view.mapValues(_.size).toMap
    val cCnt = corToks.groupBy(identity).view.mapValues(_.size).toMap
    def weight(text: String): Double = {
      val ws = text.split(" ").map(bucket)
      val lws = ws.map { b =>
        math.log((tCnt.getOrElse(b, 0) + 1.0) / (tgtToks.size + 4096.0)) -
        math.log((cCnt.getOrElse(b, 0) + 1.0) / (corToks.size + 4096.0))
      }
      BigDecimal(lws.sum / lws.length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    Seq(1L -> "the cat sat on a mat", 2L -> "stock prices fell sharply",
        3L -> "qzx vplk wyrt hjkm").foreach { case (id, text) =>
      assert(got(id)._1 === text.split(" ").length.toLong, s"doc $id token count")
      assert(got(id)._2 === weight(text), s"doc $id weight")
    }
    // ranking: target-domain > off-domain > gibberish-never-seen-in-target
    assert(got(1L)._2 > got(2L)._2)
  }

  test("tfidfTopTerms ranks distinctive terms above ubiquitous ones, ties by term") {
    val corpus = Seq(
      (1L, "spark spark catalyst shuffle the the the"),
      (2L, "the quick brown fox the"),
      (3L, "the slow brown bear the")
    ).toDF("doc_id", "text")
    val got = Curation.tfidfTopTerms(corpus, "doc_id", "text", k = 2)
      .select("doc_id", "rank", "tok")
      .as[(Long, Int, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    // doc 1: 'spark' tf=2 df=1 beats 'catalyst'/'shuffle' tf=1 df=1 (tie → term asc);
    // 'the' (df=3, idf=0) never ranks
    assert(got(1L) === Seq("spark", "catalyst"))
    // doc 2: quick/fox tf=1 df=1 beat brown (df=2); tie between fox/quick → term asc
    assert(got(2L) === Seq("fox", "quick"))
    assert(got(3L) === Seq("bear", "slow"))
  }

  test("assignSplit is stable under corpus growth and covers all splits") {
    val small = (1L to 200L).map(i => Tuple1(i)).toDF("id")
    val big = (1L to 1000L).map(i => Tuple1(i)).toDF("id")
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val s1 = Curation.assignSplit(small, "id", fr).select("id", "split")
      .as[(Long, String)].collect().toMap
    val s2 = Curation.assignSplit(big, "id", fr).select("id", "split")
      .as[(Long, String)].collect().toMap
    // hash-threshold assignment: a document's split NEVER changes when
    // other documents arrive (rank-based sampling breaks this)
    assert(s1.forall { case (id, sp) => s2(id) == sp })
    val dist = s2.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(dist("train") > 700 && dist("train") < 900)
    assert(dist.keySet === Set("train", "val", "test"))
    intercept[IllegalArgumentException](
      Curation.assignSplit(small, "id", Seq("a" -> 0.5, "b" -> 0.2)))
  }

  test("packSequences: chunk spans tile each shard's token stream exactly") {
    val r = new scala.util.Random(13)
    val docsT = (1L to 300L).map(i => (i, s"src${i % 3}", 1 + r.nextInt(200)))
      .toDF("id", "src", "n")
    val packed = Curation.packSequences(docsT, "src", "id", "n", chunkTokens = 256)
      .select("id", "src", "n", "first_chunk", "last_chunk")
      .as[(Long, String, Int, Long, Long)].collect()
    packed.groupBy(_._2).foreach { case (_, rows) =>
      // replay the shard in md5 order and check every span
      val ordered = rows.sortBy(t => (md5Hex(t._1), t._1))
      var before = 0L
      ordered.foreach { case (_, _, n, first, last) =>
        assert(first === before / 256)
        assert(last === (before + n - 1) / 256)
        before += n
      }
    }
  }

  test("weightedSample biases admission toward heavy rows, deterministically") {
    val r = new scala.util.Random(17)
    val rows = (1L to 2000L).map(i => (i, 1 + r.nextInt(100))).toDF("id", "w")
    val s1 = Curation.weightedSample(rows, "id", "w", expectedK = 100)
      .select("id", "w").as[(Long, Int)].collect()
    val s2 = Curation.weightedSample(rows, "id", "w", expectedK = 100)
      .select("id", "w").as[(Long, Int)].collect()
    assert(s1.map(_._1).sorted === s2.map(_._1).sorted, "sampling must be deterministic")
    assert(s1.length > 50 && s1.length < 200, s"expected ~100 rows, got ${s1.length}")
    val corpusAvg = rows.agg(avg("w")).as[Double].head()
    val sampleAvg = s1.map(_._2).sum.toDouble / s1.length
    assert(sampleAvg > corpusAvg, "token-weighted sampling must favor heavy rows")
  }

  test("gopherRules: each rule trips on its planted violator; keep is the conjunction") {
    val fixture = Seq(
      (0L, "the cat and the dog ran to the old red barn in the warm rain"), // passes all
      (1L, "too short"),                                                    // n_words < 5
      (2L, "12 34 56 78 90 11 22 33"),                                      // no alpha words
      (3L, "internationalization accessibility virtualization parallelization notwithstanding " +
           "crystallographically uncharacteristically electroencephalography"), // mean len > 10
      (4L, "zebra quartz jumps vexed lynx fowl grabs whomp")                 // no stopwords
    ).toDF("doc_id", "text")
    val r = Curation.gopherRules(fixture, "doc_id", "text", minWords = 5)
      .select("doc_id", "n_words", "mean_word_len", "alpha_ratio", "stop_hits",
        "ok_words", "ok_word_len", "ok_alpha", "ok_stop", "keep")
      .as[(Long, Int, Double, Double, Int, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(t => t._1 -> t).toMap
    assert(r(0L)._10, "clean prose must keep")
    assert(!r(1L)._6 && !r(1L)._10, "short doc fails word-count rule")
    assert(!r(2L)._8 && !r(2L)._10, "digit-only doc fails alpha-ratio rule")
    assert(!r(3L)._7 && !r(3L)._10, "jargon wall fails mean-word-length rule")
    assert(!r(4L)._9 && !r(4L)._10, "stopword-free doc fails the real-language rule")
    // brute-force replay of the measurements for doc 0
    val toks = "the cat and the dog ran to the old red barn in the warm rain".split(" ")
    assert(r(0L)._2 === toks.length)
    assert(r(0L)._3 === math.rint(toks.map(_.length).sum.toDouble / toks.length * 1e4) / 1e4)
    assert(r(0L)._5 === toks.count(t => Seq("the", "a", "and", "of", "to", "in", "is").contains(t)))
  }

  test("hashedClassifierScore replays the md5 weight math; <2-token docs score 0.5") {
    val fixture = Seq(
      (0L, "the quick brown fox"),
      (1L, "solo"),
      (2L, "")
    ).toDF("doc_id", "text")
    val got = Curation.hashedClassifierScore(fixture, "doc_id", "text", buckets = 1024)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    // brute-force: bucket = first-32-md5-bits(gram) % 1024,
    // weight = first-32-md5-bits("w"+bucket) % 2001 - 1000
    def h32(s: String): Long = java.lang.Long.parseLong(md5HexOf(s).take(8), 16)
    val grams = Seq("the quick", "quick brown", "brown fox")
    val s = grams.map(g => h32("w" + (h32(g) % 1024).toString) % 2001 - 1000).sum
    val expected = math.rint(1.0 / (1.0 + math.exp(-s.toDouble / 3000.0)) * 1e4) / 1e4
    assert(got(0L) === expected)
    assert(got(1L) === 0.5, "1-token doc has no bigrams -> sigmoid(0)")
    assert(got(2L) === 0.5, "empty doc -> sigmoid(0)")
  }

  test("trainHashedClassifier separates planted classes; scoreWithWeights covers short docs") {
    val labeled = Seq(
      (0L, "good clean prose about science and method", 1),
      (1L, "good clean prose about careful science", 1),
      (2L, "good clean prose on science method details", 1),
      (3L, "spam spam buy now spam click here", 0),
      (4L, "buy now spam click spam here now", 0),
      (5L, "spam click buy here now spam spam", 0)
    ).toDF("doc_id", "text", "label")
    val w = Curation.trainHashedClassifier(labeled, "doc_id", "text", "label",
      buckets = 256, iters = 5, lr = 50.0)
    val scores = Curation.scoreWithWeights(labeled, w, "doc_id", "text", buckets = 256)
      .as[(Long, Double)].collect().toMap
    val pos = Seq(0L, 1L, 2L).map(scores)
    val neg = Seq(3L, 4L, 5L).map(scores)
    assert(pos.min > neg.max,
      s"trained classifier must separate the planted classes: pos=$pos neg=$neg")
    // determinism: a second training run lands on identical weights
    val w2 = Curation.trainHashedClassifier(labeled, "doc_id", "text", "label",
      buckets = 256, iters = 5, lr = 50.0)
    assert(w.orderBy("bucket").collect() === w2.orderBy("bucket").collect())
    // <2-token docs keep a row and score sigmoid(0)=0.5 instead of vanishing
    val short = Seq((9L, "solo"), (10L, "")).toDF("doc_id", "text")
    val s2 = Curation.scoreWithWeights(short, w, "doc_id", "text", buckets = 256)
      .as[(Long, Double)].collect().toMap
    assert(s2 === Map(9L -> 0.5, 10L -> 0.5))
  }

  private def md5HexOf(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  private def md5Hex(id: Long): String = md5HexOf(id.toString)

  // ---------------- global shuffle + equal-token shards ----------------

  test("globalShuffleShards == naive global-window prefix sum, invariant to partition count") {
    import org.apache.spark.sql.expressions.Window
    // 97 docs, token counts 1..40 (co-prime sizes so shard boundaries land
    // mid-document and exercise the start-offset ownership rule)
    val docs = (1L to 97L).map(i => (i, 1L + (i * 7L) % 40L))
      .toDF("doc_id", "n_tokens")
    val got = Curation.globalShuffleShards(docs, "doc_id", "n_tokens",
        numShards = 4, partitions = 5)
      .orderBy("h", "id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq

    // naive oracle: same hash, ONE global window (the scale-killer form)
    val naive = docs
      .withColumn("h",
        ((col("doc_id") % lit(1L << 31)) * lit(2654435761L) + lit(41L)) % lit(1L << 32))
      .withColumn("cum_tokens",
        sum("n_tokens").over(Window.orderBy("h", "doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val total = docs.agg(sum("n_tokens")).as[Long].head()
    val shardTokens = math.max(1L, (total + 3) / 4)
    val expected = naive
      .select(col("doc_id"), col("n_tokens"), col("h"), col("cum_tokens"),
        least((col("cum_tokens") - col("n_tokens")) / lit(shardTokens), lit(3L))
          .cast("long").as("shard"))
      .orderBy("h", "doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === expected)

    // repartitioning differently must not move a single row, cum, or shard
    val again = Curation.globalShuffleShards(docs, "doc_id", "n_tokens",
        numShards = 4, partitions = 11)
      .orderBy("h", "id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(again === got)

    // shard balance: every shard's token mass is within one max-doc of the
    // ideal slice (a doc belongs to the shard where it STARTS)
    val byShard = got.groupBy(_._5).view.mapValues(_.map(_._2).sum).toMap
    assert(byShard.keySet === Set(0L, 1L, 2L, 3L))
    val maxDoc = got.map(_._2).max
    byShard.foreach { case (s, mass) =>
      assert(mass <= shardTokens + maxDoc,
        s"shard $s holds $mass tokens vs slice $shardTokens (+maxDoc $maxDoc)")
    }
  }

  test("bpeEncode applies merges in order; runs merge left-to-right non-overlapping") {
    import graft.pipeline.Curation
    val words = Seq("the", "that", "lll", "x").toDF("word")
    val out = Curation.bpeEncode(words, "word",
        Seq("t" -> "h", "th" -> "e", "l" -> "l"))
      .select("word", "encoded", "n_pieces")
      .as[(String, String, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // "the": t+h -> th, then th+e -> the (merge ORDER matters)
    assert(out("the") === (("the", 1)))
    // "that": th merges, but 'th a t' has no further rule
    assert(out("that") === (("th|a|t", 3)))
    // "lll": leftmost pair merges, the remaining l can't re-pair in the
    // same pass (non-overlapping left-to-right scan)
    assert(out("lll") === (("ll|l", 2)))
    assert(out("x") === (("x", 1)))
  }

  test("domainKl: distinctive domains score high, corpus-like domains near zero, never negative") {
    import graft.pipeline.Curation
    val docs = Seq(
      (1L, "mix", "alpha beta gamma delta"),
      (2L, "mix", "beta gamma delta alpha"),
      (3L, "same", "alpha beta gamma delta"),   // mirrors the corpus mix
      (4L, "odd", "zzz zzz zzz zzz")            // vocabulary of its own
    ).toDF("doc_id", "source", "text")
    val kl = Curation.domainKl(docs, "source", "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(kl.values.forall(_ >= 0.0), s"KL must be non-negative: $kl")
    assert(kl("odd") > kl("same"),
      s"the own-vocabulary domain must out-diverge the corpus-like one: $kl")
    assert(kl("odd") > kl("mix"))
  }

  test("epochPlan: full epochs by integer division; partial pass is the md5 token-budget prefix") {
    import graft.pipeline.Curation
    // source a: 10 tokens corpus, target 25 -> 2 full epochs + 5-token partial
    // source b: 8 tokens corpus, target 25 -> 3 full epochs + 1-token partial
    val docs = Seq(
      (1L, "a", 4L), (2L, "a", 6L),
      (3L, "b", 5L), (4L, "b", 3L)
    ).toDF("id", "src", "toks")
    val plan = Curation.epochPlan(docs, "src", "id", "toks",
        Seq("a" -> 0.5, "b" -> 0.5), totalBudget = 50L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(plan("a")._1 === 10L && plan("a")._3 === 2L && plan("a")._4 === 5L)
    assert(plan("b")._1 === 8L && plan("b")._3 === 3L && plan("b")._4 === 1L)
    // realized partial never exceeds its budget and matches the md5-rank
    // prefix admission (docs too big for the remainder admit nothing)
    assert(plan("a")._6 <= plan("a")._4 && plan("b")._6 <= plan("b")._4)
    // a target below one epoch gives 0 full epochs and only a partial
    val tiny = Curation.epochPlan(docs, "src", "id", "toks",
        Seq("a" -> 1.0, "b" -> 0.0), totalBudget = 6L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(tiny("a") === 0L && !tiny.contains("b") || tiny.get("b").forall(_ == 0L))
  }

  test("neymanSample: variance-heavy strata get the budget; constant strata get none") {
    import graft.pipeline.Curation
    // stratum 'wild': values spread 0..90 (sd ~ 30); 'flat': constant
    // (sd = 0); both size 10 -> all 6 samples land in 'wild'
    val rows = (0 until 10).map(i => (i.toLong, "wild", i * 10L)) ++
               (10 until 20).map(i => (i.toLong, "flat", 50L))
    val df = rows.toDF("id", "stratum", "v")
    val got = Curation.neymanSample(df, "stratum", "id", "v", totalN = 6)
      .select("stratum").as[String].collect()
    assert(got.length === 6 && got.forall(_ == "wild"))
    // equal sizes and sds -> budget splits evenly
    val balanced = (0 until 10).map(i => (i.toLong, "a", (i % 5) * 7L)) ++
                   (10 until 20).map(i => (i.toLong, "b", (i % 5) * 7L))
    val even = Curation.neymanSample(balanced.toDF("id", "stratum", "v"),
        "stratum", "id", "v", totalN = 8)
      .groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(even === Map("a" -> 4L, "b" -> 4L))
    // all-constant corpus fails loudly instead of sampling nothing
    assertThrows[IllegalArgumentException] {
      Curation.neymanSample(
        Seq((1L, "a", 5L), (2L, "a", 5L)).toDF("id", "stratum", "v"),
        "stratum", "id", "v", totalN = 2)
    }
  }
}
