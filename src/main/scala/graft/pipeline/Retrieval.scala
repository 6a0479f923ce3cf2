package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval over the documents table: BM25 scoring of a fixed
  * query-term set against the whole corpus.
  *
  * Reference analog: the hybrid engine's search surface scores documents
  * against query terms server-side (modules/query in the reference tree);
  * here the whole ranking is one declarative Spark plan so Catalyst keeps
  * the term filter on the scan side of the shuffle.
  *
  * Scale shape (the part that must survive 100 TB):
  *  - the corpus is tokenized ONCE with a narrow projection; rows explode
  *    to (doc, term) only AFTER an `isin(queryTerms)` filter, so the
  *    shuffle that builds term frequencies carries |matching tokens| rows,
  *    not |all tokens| — for a handful of query terms that is a tiny
  *    fraction of the corpus;
  *  - document-frequency / IDF is an aggregate over the tf table (≤ terms
  *    × docs rows) whose result is ≤ |queryTerms| rows — broadcast to the
  *    scoring join by AQE;
  *  - corpus stats (N, avgdl) are one count/avg aggregate, two scalars —
  *    driver-scale by construction;
  *  - final top-k is orderBy+limit → TakeOrderedAndProject (per-partition
  *    heaps + driver merge of k rows), never a global sort.
  *
  * Determinism / oracle: per-term contributions are rounded to 6 decimals
  * before the per-doc sum (≤ |queryTerms| quantized addends, so engine
  * summation order cannot move the 4-decimal final rounding), and IDF is
  * rounded to 6 decimals. Ties break by doc_id.
  */
object Retrieval {

  /** Classic BM25: score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    * with the Lucene-style non-negative idf = ln(1 + (N−df+0.5)/(df+0.5)).
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
               topK: Int = 10): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val toks = split(lower(col(textCol)), " ")
    val base = docs.select(col(idCol).as("doc_id"), toks.as("toks"))
      .withColumn("dl", size(col("toks")))

    // two scalars for the whole corpus — computed in one job, compiled
    // into the scoring expression as literals (same shape as the IVF
    // centroid broadcast: driver-scale by construction)
    val statsRow = base.agg(count(lit(1)).cast("double"), avg(col("dl"))).head()
    require(!statsRow.isNullAt(1), "bm25TopK: empty corpus (avgdl undefined)")
    val (nDocs, avgdl) = (statsRow.getDouble(0), statsRow.getDouble(1))

    val tf = base
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("tok"))
      .filter(col("tok").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("dl"), col("tok"))
      .agg(count(lit(1)).cast("double").as("tf"))

    // df/idf: ≤ |queryTerms| rows — AQE broadcasts this side of the join
    val idf = tf.groupBy(col("tok"))
      .agg(count(lit(1)).cast("double").as("df"))
      .withColumn("idf",
        round(log(lit(1.0) + (lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5))), 6))
      .select(col("tok"), col("idf"))

    val contrib = round(
      col("idf") * col("tf") * lit(k1 + 1.0) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl))), 6)

    val scored = tf.join(broadcast(idf), "tok")
      .withColumn("contrib", contrib)
      .groupBy(col("doc_id"))
      .agg(round(sum(col("contrib")), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)

    // rank over ≤ topK rows — the global window runs AFTER the limit, so
    // the single-partition sort it implies touches k rows, not the corpus
    scored.withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))))
      .select(col("doc_id"), col("score"), col("rank"))
      .orderBy(col("rank"))
  }

  /** Reciprocal Rank Fusion (Cormack, Clarke & Büttcher 2009): fuse two
    * ranked retrieval lists by score(d) = Σ_l 1/(K + rank_l(d)) over the
    * lists containing d. Rank-only fusion needs no score calibration
    * between heterogeneous retrievers (BM25 vs embedding cosine) — the
    * standard hybrid-retrieval combiner — and integer ranks make the
    * arithmetic exact cross-engine (one final rounding).
    *
    * Scale shape: both inputs are top-k lists — bounded rows by
    * construction — so the fusion cost is independent of corpus size;
    * the heavy lifting lives in the upstream retrievals (bm25TopK,
    * Similarity.bruteForceTopK), which carry their own scale arguments.
    * The re-rank window runs over ≤ 2k fused rows.
    */
  def rrfFuse(lex: DataFrame, sem: DataFrame, idCol: String,
              kConst: Int = 60, topK: Int = 10): DataFrame = {
    val a = lex.select(col(idCol), col("rank").as("lex_rank"))
    val b = sem.select(col(idCol), col("rank").as("sem_rank"))
    a.join(b, Seq(idCol), "full_outer")
      .withColumn("rrf_score", round(
        coalesce(lit(1.0) / (col("lex_rank") + lit(kConst)), lit(0.0)) +
        coalesce(lit(1.0) / (col("sem_rank") + lit(kConst)), lit(0.0)), 6))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("rrf_score").desc, col(idCol))))
      .filter(col("rank") <= topK)
      .select(col(idCol), col("lex_rank"), col("sem_rank"),
        col("rrf_score"), col("rank"))
      .orderBy(col("rank"))
  }

  /** Per-group relative-threshold gate (Gopher-style "keep the top
    * (1−q) quantile per domain"): a row survives when its score is >= the
    * value at ascending rank ceil(q·n) within its group — a rank-based
    * quantile, so both engines compute the IDENTICAL threshold (no
    * interpolation semantics to reconcile, unlike percentile_cont).
    *
    * Scale shape: one hash partition by group for the ranking window
    * (same shuffle count as any per-stratum sampler here), thresholds are
    * |groups| rows broadcast back. A pathologically hot group skews the
    * window sort; the mixture/temperature samplers in this repo document
    * the same bound, and the fix (pre-agg per (group, score) when scores
    * are discrete) applies unchanged.
    */
  def quantileGate(docs: DataFrame, idCol: String, scoreCol: String,
                   groupCol: String, q: Double = 0.75): DataFrame = {
    require(q > 0.0 && q < 1.0, s"q must be in (0,1): $q")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(scoreCol), col(idCol))
    val ranked = docs
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(groupCol))))
    // long, not int: an int cast wraps negative past ~2.1B rows/group and
    // silently drops the whole group (row_number itself bounds a group at
    // Int.MaxValue rows — beyond that, pre-aggregate per (group, score))
    val thresholds = ranked
      .filter(col("__rn").cast("long") === ceil(lit(q) * col("__n")).cast("long"))
      .select(col(groupCol), col(scoreCol).as("__thr"))
    docs.join(broadcast(thresholds), groupCol)
      .filter(col(scoreCol) >= col("__thr"))
      .drop("__thr")
  }

  /** Inverted-index build: one posting-list row per distinct token —
    * (token, df, postings) with postings the doc-id list sorted
    * ascending. `maxDf` drops tokens appearing in more than that many
    * documents (stop-term elision — the bound that keeps the largest
    * posting row O(maxDf) instead of O(corpus)). Elided terms KEEP
    * their (token, df) row with a NULL postings list — so a serve path
    * can distinguish "term absent from the corpus" (empty result is
    * correct) from "term elided" (a posting-list intersection would be
    * silently wrong; serveConjunctive fails loudly and the caller
    * falls back to a scan).
    *
    * Scale shape: per-doc distinct tokens are a narrow projection
    * (array_distinct before the explode, so a token repeated in a doc
    * costs one row); the only shuffle is the groupBy(token) that builds
    * each posting list, and collect_list groups are bounded by maxDf
    * AFTER the having-filter (Spark evaluates the df count and the list
    * in the same aggregate — a hot stop token still aggregates once,
    * so pair the build with a stopword pre-filter when the corpus has
    * known mega-terms). */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    maxDf: Long = 1000000L): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(array_distinct(split(lower(col(textCol)), " "))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df"), sort_array(collect_list(col("doc_id"))).as("postings"))
      .withColumn("postings",
        when(col("df") <= maxDf, col("postings")).otherwise(lit(null)))

  /** Conjunctive (AND) query served FROM the index: intersect the query
    * terms' posting lists. A doc qualifies iff it appears in all
    * |terms| lists — explode the (few) matching posting rows and count.
    * The scan side never touches the corpus: work is O(Σ df(term)),
    * the classic reason an inverted index beats a table scan for
    * selective conjunctions. Returns (doc_id) rows. */
  def serveConjunctive(index: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    val t = terms.map(_.toLowerCase).distinct
    val rows = index.filter(col("token").isin(t: _*))
    // an ELIDED query term (df > maxDf at build time, postings null)
    // makes the intersection unanswerable from the index — fail loudly
    // so the caller scans instead of silently returning empty/wrong
    val elided = rows.filter(col("postings").isNull)
      .select(col("token")).limit(5).collect().map(_.getString(0))
    if (elided.nonEmpty)
      throw new IllegalArgumentException(
        s"query terms were elided from the index (df > maxDf): " +
        s"${elided.mkString(", ")} — serve this conjunction with a scan")
    rows.select(explode(col("postings")).as("doc_id"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("__hits"))
      .filter(col("__hits") === t.size)
      .select(col("doc_id"))
  }
}
