package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators: benchmark-contamination detection,
  * deterministic sampling (stratified / token-budget), and Gopher-style
  * repetition & entropy quality signals.
  *
  * Everything is pure column algebra over a (doc_id, ord, token) stream —
  * no UDFs, so the hot path stays inside whole-stage codegen, and every
  * construct has an exact DuckDB twin for the oracle gate. Determinism
  * matters as much as scale here: sampling decisions use md5 (engine-
  * portable, data-independent) rather than rand(), so a re-run on a
  * different cluster layout selects the identical corpus subset.
  */
object Curation {

  /** (id, ord, tok) token stream — posexplode keeps the in-doc position
    * so n-grams come from `lead` over one per-doc window (a single
    * shuffle on the id, streamed O(1)-state frames) instead of a
    * positional self-join. */
  def tokenStream(df: DataFrame, idCol: String, textCol: String,
                  lowercase: Boolean = false): DataFrame = {
    val text = if (lowercase) lower(col(textCol)) else col(textCol)
    df.select(col(idCol), posexplode(split(text, " ")).as(Seq("pos", "tok")))
      .select(col(idCol), (col("pos") + 1).as("ord"), col("tok"))
  }

  /** Distinct word n-grams per document: (idCol, gram). */
  def wordNgramSets(df: DataFrame, idCol: String, textCol: String, n: Int,
                    lowercase: Boolean = false): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    val w = Window.partitionBy(col(idCol)).orderBy(col("ord"))
    val parts = (0 until n).map(i => if (i == 0) col("tok") else lead(col("tok"), i).over(w))
    tokenStream(df, idCol, textCol, lowercase)
      .select(col(idCol), concat_ws(" ", parts: _*).as("gram"), parts.last.isNotNull.as("ok"))
      .filter(col("ok"))
      .select(col(idCol), col("gram"))
      .distinct()
  }

  /** Corpus heavy-hitter n-grams: the top-k word n-grams by total
    * occurrence count, with document frequency alongside — the corpus
    * statistic that seeds BPE merge tables, flags boilerplate (high
    * occurrence at low doc spread), and shortlists contamination
    * screens. Ordering is total (occurrences desc, then gram asc) so
    * the cut is engine-portable.
    *
    * Scale shape: occurrences aggregate on the gram key with map-side
    * combine; doc frequency rolls up from the (doc, gram)-distinct
    * aggregate; both are Zipf-bounded (vocab-scale, not corpus-scale)
    * after the partial combine. The final top-k is a limit over the
    * sorted aggregate — TakeOrderedAndProject, never a global sort. */
  def topNgrams(df: DataFrame, idCol: String, textCol: String, n: Int, k: Int,
                lowercase: Boolean = false): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    require(k >= 1, s"k must be >= 1: $k")
    val w = Window.partitionBy(col(idCol)).orderBy(col("ord"))
    val parts = (0 until n).map(i => if (i == 0) col("tok") else lead(col("tok"), i).over(w))
    val grams = tokenStream(df, idCol, textCol, lowercase)
      .select(col(idCol), concat_ws(" ", parts: _*).as("gram"), parts.last.isNotNull.as("ok"))
      .filter(col("ok"))
      .select(col(idCol), col("gram"))
    val occ = grams.groupBy(col("gram")).agg(count(lit(1)).as("occurrences"))
    val dfreq = grams.distinct().groupBy(col("gram")).agg(count(lit(1)).as("doc_freq"))
    occ.join(dfreq, "gram")
      .orderBy(col("occurrences").desc, col("gram").asc)
      .limit(k)
  }

  /** Frequency-ranked vocabulary + integer encoding — the
    * materialization step between raw text and packed training
    * sequences: the top-`vocabSize` tokens get ids 1..V (rank by count
    * desc, ties by token asc — engine-portable), everything else
    * encodes as OOV id 0. Returns (idCol, n_tokens, n_oov, ids) with
    * `ids` in document order.
    *
    * Scale shape: the vocabulary is a Zipf-bounded aggregate + top-V
    * limit (TakeOrderedAndProject — never a global sort of the vocab);
    * the id-assignment window runs AFTER the limit, over V rows only.
    * Encoding is one broadcast join of the tiny vocab into the token
    * stream and a per-doc rollup whose groups are doc-length bounded.
    * The OOV fallback is id 0, not a dropped row — every token of
    * every doc lands in `ids`. */
  def vocabEncode(docs: DataFrame, idCol: String, textCol: String,
                  vocabSize: Int): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be >= 1: $vocabSize")
    val toks = tokenStream(docs, idCol, textCol, lowercase = true)
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(vocabSize)
      .withColumn("token_id",
        row_number().over(Window.orderBy(col("cnt").desc, col("tok"))))
      .select(col("tok"), col("token_id"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
           sum(when(col("token_id").isNull, 1L).otherwise(0L)).as("n_oov"),
           transform(
             array_sort(collect_list(struct(col("ord").as("o"),
               coalesce(col("token_id"), lit(0)).as("tid")))),
             s => s.getField("tid")).as("ids"))
  }

  /** Incremental novelty: each batch document's fraction of distinct
    * word n-grams UNSEEN in the admitted corpus — the streaming form of
    * [[noveltyScore]] (whose min-id ownership needs the whole corpus at
    * once). At warehouse scale the admitted side's distinct-gram set is
    * a PERSISTED table maintained at admit time (append the batch's new
    * grams, exactly the LSH-index admission pattern in
    * Dedup.appendToLshIndex), so each batch pays O(batch grams) plus one
    * equi-join against the gram index — never a corpus rescan.
    *
    * Scale shape: distinct grams per side, one left join on the gram key
    * (fan-out 1: the admitted side is gram-distinct), one per-doc
    * rollup; gram-less batch docs survive at new_frac 0. */
  def noveltyAgainst(admitted: DataFrame, batch: DataFrame,
                     idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val bGrams = wordNgramSets(batch, idCol, textCol, n, lowercase = true)
    val seen = wordNgramSets(admitted, idCol, textCol, n, lowercase = true)
      .select(col("gram")).distinct().withColumn("__seen", lit(1))
    val per = bGrams.join(seen, Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
           sum(when(col("__seen").isNull, 1L).otherwise(0L)).as("__new"))
    batch.select(col(idCol)).join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        round(coalesce(col("__new").cast("double") / col("n_grams"), lit(0.0)), 4)
          .as("new_frac"))
  }

  /** First-occurrence novelty: the fraction of a document's distinct
    * word n-grams that the corpus sees FIRST in that document (owner =
    * min doc_id, a deterministic ingestion-order proxy). High-novelty
    * docs add new content; near-zero novelty flags boilerplate and
    * template spam that exact/near dedup misses because no single pair
    * crosses its threshold.
    *
    * Scale shape: one gram-keyed aggregate for the first owner (map-side
    * combined min), one corpus-scale equi-join on the gram key
    * (shuffle-partitioned, AQE-splittable, fan-out 1 — each gram row
    * meets exactly one owner row), one per-doc rollup. Gram-less docs
    * (< n tokens) are left-joined back with novelty 0, not dropped (the
    * scoreWithWeights coverage rule). */
  def noveltyScore(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3): DataFrame = {
    val grams = wordNgramSets(df, idCol, textCol, n, lowercase = true)
    val first = grams.groupBy(col("gram")).agg(min(col(idCol)).as("__first"))
    val per = grams.join(first, "gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
           sum(when(col("__first") === col(idCol), 1L).otherwise(0L)).as("__novel"))
    df.select(col(idCol)).join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        round(coalesce(col("__novel").cast("double") / col("n_grams"), lit(0.0)), 4)
          .as("novelty"))
  }

  /** Benchmark-contamination report: training documents sharing at least
    * `minShared` distinct word n-grams with an eval-set document.
    *
    * Scale shape: the eval side is the benchmark suite — thousands of
    * docs, not billions — so its gram set is broadcast and the corpus
    * side streams through a hash join without a shuffle; the only wide
    * stage is the (train, eval) pair count, a partial-aggregated rollup
    * of join hits. */
  def contamination(train: DataFrame, eval: DataFrame, idCol: String,
                    textCol: String, n: Int = 3, minShared: Long = 2): DataFrame = {
    val tg = wordNgramSets(train, idCol, textCol, n, lowercase = true)
      .withColumnRenamed(idCol, "train_doc")
    val eg = wordNgramSets(eval, idCol, textCol, n, lowercase = true)
      .withColumnRenamed(idCol, "eval_doc")
    tg.join(broadcast(eg), "gram")
      .groupBy(col("train_doc"), col("eval_doc"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** Exactly `perStratum` rows per stratum, chosen by md5 rank — a
    * deterministic, engine-portable "random" sample that is reproducible
    * across clusters and engines (rand() is neither). One shuffle on the
    * stratum; the rank window streams. */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       perStratum: Int): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= perStratum)
      .drop("__rn")
  }

  /** Neyman-allocation stratified sampling: a total budget of `totalN`
    * rows is split across strata proportionally to N_h·σ_h (stratum
    * size × stratum std-dev of `valueCol`) — the variance-optimal
    * allocation for estimating the population mean (Neyman 1934,
    * public statistics): high-variance strata get more samples, a
    * constant stratum needs almost none. Within each stratum the
    * allocated rows are chosen by md5 rank (the deterministic,
    * engine-portable sampler used throughout).
    *
    * Determinism bridge (oracle parity): σ is rounded to 6 decimals
    * before the share, the share to 9, and the allocation uses
    * floor(x+0.5) — the cross-engine quantization ladder (the
    * sample_temperature pattern) so double ulps can never move a
    * whole row between strata. Because each stratum rounds
    * INDEPENDENTLY (no largest-remainder pass), the realized total can
    * deviate from `totalN` by up to ±strata/2 rows — the budget is a
    * target, not an exact count; callers needing exactness apply a
    * final global md5-rank trim. Constant or single-row strata carry
    * weight 0 and receive 0 rows — callers who need representation
    * floor it with a union of stratifiedSample(1).
    *
    * Scale shape: stratum stats are one hash-aggregate (|strata|
    * rows, broadcast back); the rank window shuffles once on the
    * stratum key — identical cost to stratifiedSample. */
  def neymanSample(df: DataFrame, stratumCol: String, idCol: String,
                   valueCol: String, totalN: Long): DataFrame = {
    require(totalN > 0, s"totalN must be > 0: $totalN")
    val stats = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("__n"),
        round(coalesce(stddev_pop(col(valueCol)), lit(0.0)), 6).as("__sd"))
      .withColumn("__w", col("__n") * col("__sd"))
    val totalRow = stats.agg(sum(col("__w"))).head()
    require(!totalRow.isNullAt(0), "neymanSample: empty corpus")
    val totalW = totalRow.getDouble(0)
    require(totalW > 0.0,
      s"Neyman weights are all zero (every stratum constant in $valueCol)")
    val alloc = stats.select(col(stratumCol),
      floor(lit(totalN.toDouble) * round(col("__w") / lit(totalW), 9) + 0.5)
        .cast("long").as("__alloc"))
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.join(broadcast(alloc), stratumCol)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("__alloc"))
      .drop("__rn", "__alloc")
  }

  /** Per-domain KL divergence KL(P_source || P_corpus) between add-one
    * smoothed unigram LMs — the "how distinctive is this domain"
    * diagnostic that informs mixture design (a source with near-zero
    * KL adds volume, not signal; a high-KL source is where mixture
    * weights matter). Smoothing covers the FULL corpus vocabulary, so
    * tokens absent from a source still contribute (p_s smoothed vs the
    * corpus mass they hold).
    *
    * Scale shape: per-(source, token) and per-token counts are
    * Zipf-bounded aggregates; the sources × vocab grid (the only join)
    * is |sources|·|vocab| — metadata-scale next to the one corpus
    * token scan that feeds it. KL rounds to 4 decimals (the lm-score
    * quantization precedent). */
  def domainKl(df: DataFrame, stratumCol: String, idCol: String,
               textCol: String): DataFrame = {
    val toks = tokenStream(df, idCol, textCol, lowercase = true)
      .join(df.select(col(idCol), col(stratumCol)), idCol)
    val perSrcTok = toks.groupBy(col(stratumCol), col("tok"))
      .agg(count(lit(1)).as("c_st"))
    val perTok = toks.groupBy(col("tok")).agg(count(lit(1)).as("c_t"))
    val vocabSize = perTok.count()
    val totals = toks.groupBy(col(stratumCol)).agg(count(lit(1)).as("n_s"))
    val nTotal = toks.count()
    // |sources| x |vocab| grid — the vocab side is Zipf-bounded, so it
    // BROADCASTS (a plain cross join would plan CartesianProduct; the
    // repo-wide plan sweep bans those)
    val grid = totals.crossJoin(broadcast(perTok))
      .join(perSrcTok, Seq(stratumCol, "tok"), "left")
      .withColumn("c_st", coalesce(col("c_st"), lit(0L)))
    grid.withColumn("p_s",
        (col("c_st") + 1).cast("double") / (col("n_s") + vocabSize))
      .withColumn("p_c",
        (col("c_t") + 1).cast("double") / lit((nTotal + vocabSize).toDouble))
      .groupBy(col(stratumCol))
      .agg(round(sum(col("p_s") * log(col("p_s") / col("p_c"))), 4).as("kl"),
        max(col("n_s")).as("tokens"))
  }

  /** Multi-epoch sampling plan: when a source's token target exceeds
    * its corpus size, the corpus REPEATS — full_epochs = target div
    * corpus_tokens whole passes, plus a partial epoch of the remainder
    * chosen by the deterministic md5-rank token-budget sampler (so the
    * partial pass is the same reproducible subset on every run). The
    * repetition plan of data-constrained pretraining (epoching à la
    * Muennighoff et al. 2023, public result): per source —
    * (corpus_tokens, target_tokens, full_epochs, partial_budget,
    * partial_docs, partial_tokens).
    *
    * Scale shape: corpus masses are one aggregate; the only
    * corpus-sized work is the partial-epoch prefix-sum window (same
    * story as tokenBudgetSample); integer div/mod arithmetic
    * throughout, so both engines agree exactly. */
  def epochPlan(df: DataFrame, stratumCol: String, idCol: String,
                tokenCol: String, mixture: Seq[(String, Double)],
                totalBudget: Long): DataFrame = {
    require(mixture.nonEmpty && mixture.forall(_._2 >= 0.0) &&
      math.abs(mixture.map(_._2).sum - 1.0) < 1e-9,
      s"mixture weights must be >= 0 and sum to 1: $mixture")
    require(mixture.map(_._1).distinct.size == mixture.size,
      s"mixture has duplicate sources: ${mixture.map(_._1)}")
    val spark = df.sparkSession
    import spark.implicits._
    val budgets = mixture.map { case (s, w) =>
      (s, math.floor(totalBudget * w).toLong)
    }.toDF(stratumCol, "target_tokens")
    val base = df.groupBy(col(stratumCol))
      .agg(sum(col(tokenCol)).as("corpus_tokens"))
      .filter(col("corpus_tokens") > 0)
      .join(broadcast(budgets), stratumCol)
      .withColumn("full_epochs",
        expr("target_tokens div corpus_tokens"))
      .withColumn("partial_budget",
        col("target_tokens") - col("full_epochs") * col("corpus_tokens"))
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val partial = df
      .join(broadcast(base.select(col(stratumCol), col("partial_budget"))), stratumCol)
      .withColumn("__cum", sum(col(tokenCol)).over(w))
      .filter(col("__cum") <= col("partial_budget"))
      .groupBy(col(stratumCol))
      .agg(count(lit(1)).as("partial_docs"), sum(col(tokenCol)).as("partial_tokens"))
    base.join(partial, Seq(stratumCol), "left")
      .select(col(stratumCol), col("corpus_tokens"), col("target_tokens"),
        col("full_epochs"), col("partial_budget"),
        coalesce(col("partial_docs"), lit(0L)).as("partial_docs"),
        coalesce(col("partial_tokens"), lit(0L)).as("partial_tokens"))
  }

  /** Byte-pair-encoding APPLICATION with a fixed, ordered merge list —
    * the tokenize step of a trained BPE vocabulary (public algorithm;
    * merges are input, training them is `topNgrams`' job). Each word
    * becomes a space-separated symbol sequence (" h e l l o "), then
    * every merge rule rewrites all non-overlapping " a b " runs
    * left-to-right via LITERAL replace — semantics any engine reproduces
    * bit-for-bit, which is what makes the tokenizer oracle-checkable.
    *
    * Call it on the DISTINCT word set: encoding cost is vocabulary-scale
    * and the corpus joins back by word — the standard trick that makes
    * tokenizing 100 TB a broadcast join instead of per-row string work.
    * Returns the input plus (encoded "pie|ces", n_pieces). */
  def bpeEncode(words: DataFrame, wordCol: String,
                merges: Seq[(String, String)]): DataFrame = {
    val spaced = concat(lit(" "), regexp_replace(col(wordCol), "(.)", "$1 "))
    val mergedSym = merges.foldLeft(spaced) { case (acc, (a, b)) =>
      replace(acc, lit(s" $a $b "), lit(s" $a$b "))
    }
    words
      .withColumn("encoded", replace(trim(mergedSym), lit(" "), lit("|")))
      .withColumn("n_pieces", size(split(col("encoded"), "\\|")))
  }

  /** Class-balanced downsampling: every class keeps exactly
    * min-class-count members (its md5-ordered prefix), so the output is
    * uniform over classes — the standard fix for label skew before
    * training a classifier head on pipeline outputs. Cost: one count
    * aggregation, a one-row broadcast back, and one per-class window —
    * no corpus-wide sort. */
  def balancedSample(df: DataFrame, classCol: String, idCol: String): DataFrame = {
    val minCnt = df.groupBy(col(classCol)).agg(count(lit(1)).as("__cnt"))
      .agg(min(col("__cnt")).as("__min"))
    val w = Window.partitionBy(col(classCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .crossJoin(broadcast(minCnt))
      .filter(col("__rn") <= col("__min"))
      .drop("__rn", "__min")
  }

  /** Token-budget sampling (domain-mixing primitive): per stratum, admit
    * md5-ordered documents while the running token total stays within
    * `budget` — how a training mix takes "N tokens of source X" from an
    * arbitrarily large corpus deterministically. Emits `cum_tokens` so
    * downstream mixing can audit the exact spend per stratum. */
  def tokenBudgetSample(df: DataFrame, stratumCol: String, idCol: String,
                        tokenCol: String, budget: Long): DataFrame = {
    val order = Seq(md5(col(idCol).cast("string")), col(idCol))
    val w = Window.partitionBy(col(stratumCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(col(tokenCol)).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** Domain-mixture sampling (the data-mixing step of a pretraining
    * recipe): given target token PROPORTIONS per source and one global
    * token budget, admit md5-ordered documents per source while that
    * source's running total stays within its share — the deterministic
    * execution of a mixture like "50% web, 30% code, 20% books". The
    * per-source budget is floor(totalBudget · weight); sources absent
    * from the mixture are dropped (weight 0). Emits `cum_tokens` and
    * `stratum_budget` so the realized mix is auditable row by row.
    *
    * Scale shape: one window partitioned by source (same per-shard
    * prefix-sum story as [[tokenBudgetSample]]; for a source so large
    * one partition can't sort it, pre-shard within source and two-level
    * the prefix sums exactly as [[packSequences]] documents), plus one
    * broadcast of the |sources|-row budget table. Determinism contract
    * matches every sampler here: md5 order, engine-portable. */
  def mixtureSample(df: DataFrame, stratumCol: String, idCol: String,
                    tokenCol: String, mixture: Seq[(String, Double)],
                    totalBudget: Long): DataFrame = {
    require(mixture.nonEmpty && mixture.forall(_._2 >= 0.0) &&
      math.abs(mixture.map(_._2).sum - 1.0) < 1e-9,
      s"mixture weights must be >= 0 and sum to 1: $mixture")
    // a repeated source would fan out the budget join (every admitted
    // doc emitted once per duplicate entry) — reject it loudly
    require(mixture.map(_._1).distinct.size == mixture.size,
      s"mixture has duplicate sources: ${mixture.map(_._1)}")
    require(totalBudget > 0, s"totalBudget must be positive: $totalBudget")
    val spark = df.sparkSession
    import spark.implicits._
    val budgets = mixture.map { case (s, w) =>
      (s, math.floor(totalBudget * w).toLong)
    }.toDF(stratumCol, "stratum_budget")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // budget join BEFORE the window: sources outside the mixture drop
    // ahead of the shuffle+sort instead of paying it and then being
    // discarded — identical output (the window partitions on the same
    // key the join filters)
    df.join(broadcast(budgets), stratumCol)
      .withColumn("cum_tokens", sum(col(tokenCol)).over(w))
      .filter(col("cum_tokens") <= col("stratum_budget"))
  }

  /** Temperature-based domain resampling (the multilingual-LM mixing
    * rule): each stratum's budget share is its token mass flattened by
    * `alpha` — share_d = T_d^α / Σ_e T_e^α — so low-resource domains are
    * upsampled relative to their natural frequency (α=1 keeps natural
    * proportions, α→0 approaches uniform). Unlike [[mixtureSample]] the
    * mixture is DERIVED from the corpus, not supplied.
    *
    * Engine-portability of the derived budgets: shares are rounded to 9
    * decimals before the floor(totalBudget·share) cut, which quantizes
    * last-ulp pow() differences between engines far below the rounding
    * bin. Admission inside a budget is the shared md5-order contract.
    *
    * Scale shape: the share computation runs on the |strata|-row totals
    * table (driver-scale; the single-partition window there is over that
    * tiny table, never the corpus), broadcast back into one corpus
    * window — same topology as [[mixtureSample]]. */
  def temperatureSample(df: DataFrame, stratumCol: String, idCol: String,
                        tokenCol: String, alpha: Double,
                        totalBudget: Long): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1]: $alpha")
    require(totalBudget > 0, s"totalBudget must be positive: $totalBudget")
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val budgets = df.groupBy(col(stratumCol))
      .agg(sum(col(tokenCol)).cast("double").as("__t"))
      .withColumn("__p", pow(col("__t"), lit(alpha)))
      .withColumn("stratum_budget",
        floor(lit(totalBudget.toDouble) *
          round(col("__p") / sum(col("__p")).over(wAll), 9)).cast("long"))
      .select(col(stratumCol), col("stratum_budget"))
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.join(broadcast(budgets), stratumCol)
      .withColumn("cum_tokens", sum(col(tokenCol)).over(w))
      .filter(col("cum_tokens") <= col("stratum_budget"))
  }

  /** Deterministic train/val/test assignment: the first 8 md5 hex chars
    * of the id partition [0,1) by lexicographic threshold — engine-
    * portable (pure string compares), reproducible across clusters, and
    * stable under corpus growth (a document's split never changes when
    * other documents arrive, unlike rank-based sampling). `fractions`
    * must sum to ~1; the last split absorbs rounding. */
  def assignSplit(df: DataFrame, idCol: String,
                  fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.nonEmpty && math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1: $fractions")
    val bounds = fractions.scanLeft(0.0)(_ + _._2).tail
    // a cumulative bound that reaches 1.0 (trailing zero fraction) would
    // format as the 9-char "100000000" and lexicographically exclude
    // ~7/8 of hashes; "g" sorts above every 8-char hex string
    val hexBounds = bounds.init.map(f =>
      if (f >= 1.0) "g" else f"${(f * (1L << 32)).toLong}%08x")
    val h = substring(md5(col(idCol).cast("string")), 1, 8)
    // ascending-bound when-chain: the first satisfied threshold wins
    val assigned = hexBounds.zip(fractions.map(_._1)).reverse
      .foldLeft(lit(fractions.last._1)) { case (rest, (bound, name)) =>
        when(h < lit(bound), lit(name)).otherwise(rest)
      }
    df.withColumn("split", assigned)
  }

  /** Sequence packing (the pretraining concat-then-chunk form): within
    * each stratum (shard), documents concatenate in md5 order and the
    * token stream chunks every `chunkTokens`; each document occupies the
    * chunk span [floor(before/chunk), floor((before+n-1)/chunk)] where
    * `before` is the running token total ahead of it in its shard.
    *
    * Sharding IS the scale story: packing is a prefix sum, and a single
    * global ordering would pull every row into one task (the window-rank
    * anti-pattern). Real packed datasets shard anyway (per source /
    * writer task); the per-shard window streams with O(1) state, shards
    * pack in parallel, and (stratum, chunk) ids are what a packed-
    * dataset loader needs to locate any document. */
  def packSequences(df: DataFrame, stratumCol: String, idCol: String,
                    tokenCol: String, chunkTokens: Long): DataFrame = {
    require(chunkTokens > 0)
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(tokenCol)).over(w))
      .withColumn("first_chunk",
        floor((col("__cum") - col(tokenCol)) / chunkTokens).cast("long"))
      .withColumn("last_chunk",
        floor((col("__cum") - 1) / chunkTokens).cast("long"))
      .drop("__cum")
  }

  /** Weighted Bernoulli sampling: admit a document with probability
    * min(1, expectedK · w / Σw) — importance sampling for training mixes
    * (weight = token count ⇒ the sample's token mass tracks the corpus).
    * The coin is the first 32 md5 bits of the id; the decision
    * `u · Σw < expectedK · w · 2³²` runs in DOUBLE on both engines:
    * IEEE multiply is correctly rounded, so identical inputs give
    * bit-identical products everywhere (unlike pow/ln), there is no
    * 64-bit overflow at any corpus size (integer products would wrap
    * once Σw·2³² passes 2⁶³ — ~2 B tokens), and the DuckDB oracle
    * replays the decision exactly. One scan + one broadcast scalar. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     expectedK: Long): DataFrame = {
    require(expectedK > 0)
    val u = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10).cast("double")
    val totals = df.agg(sum(col(weightCol)).cast("double").as("__total_w"))
    df.crossJoin(broadcast(totals))
      .filter(u * col("__total_w") <
        lit(expectedK.toDouble) * col(weightCol).cast("double") * lit(4294967296.0))
      .drop("__total_w")
  }

  /** RE2-safe PII patterns (no lookaround — portable across Java regex,
    * RE2 and DuckDB): conservative by design; a production deployment
    * swaps in its compliance-approved pattern set. */
  val PhonePattern = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val EmailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"

  /** PII scrubbing: phones/emails replaced with typed placeholders,
    * occurrence counts kept for audit. Pure regexp columns — codegen'd,
    * one pass over the text, no UDF. */
  def redactPii(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_phones", size(regexp_extract_all(col(textCol), lit(PhonePattern), lit(0))))
      .withColumn("n_emails", size(regexp_extract_all(col(textCol), lit(EmailPattern), lit(0))))
      // EMAIL first: replacing phones first can mangle a phone-shaped
      // email local part ("12-345-678-9012@corp.com" -> "<PHONE>@corp.com")
      // so the email regex no longer matches and the address leaks while
      // n_emails claims it was redacted
      .withColumn("redacted",
        regexp_replace(regexp_replace(col(textCol), EmailPattern, "<EMAIL>"),
          PhonePattern, "<PHONE>"))

  /** Canonical text normalization (the pre-dedup/pre-fingerprint form):
    * lowercase, non-alphanumerics to spaces, whitespace collapsed,
    * trimmed. Normalizing BEFORE exact dedup merges trivial variants
    * (case, punctuation, spacing) into one fingerprint class. */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** Corpus unigram-LM quality score (the CCNet idea, reduced to the
    * unigram case): score each document by the mean log-probability of
    * its tokens under the corpus's own unigram distribution
    * p(w) = count(w) / total_tokens. Ordinary prose re-uses the corpus's
    * high-mass vocabulary and scores high; OCR noise, gibberish and
    * boilerplate-with-rare-symbols sink. Output: (idCol, n_tokens,
    * avg_logprob), higher = more typical.
    *
    * Scale shape: ONE token hash-aggregate builds the LM (map-side
    * combine; the vocab is Zipf-bounded, orders of magnitude smaller
    * than the corpus), the total count rides a 1-row broadcast, and
    * scoring is an equi-join of the token stream with the vocab —
    * shuffled on the word key, AQE-splittable on stopword skew. Nothing
    * touches the driver. In a standing pipeline the vocab table persists
    * as a catalog table and scores every future batch without a corpus
    * rescan (same serving pattern as the persisted IVF-PQ index). */
  def lmQualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (vocab, total) = unigramLm(df, idCol, textCol)
    scoreWithLm(df, vocab, total, idCol, textCol)
  }

  /** The unigram LM as data: (vocab (tok, cnt), 1-row total (n_total)).
    * Persist both as catalog tables and [[scoreWithLm]] scores every
    * future ingest batch without rescanning the corpus — the serving
    * split mirrors the persisted IVF-PQ index. */
  def unigramLm(df: DataFrame, idCol: String, textCol: String): (DataFrame, DataFrame) = {
    val vocab = tokenStream(df, idCol, textCol, lowercase = true)
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    // total = sum over the vocab-sized aggregate, NOT a second corpus
    // scan — exactly equal (every token occurrence lands in one cnt)
    (vocab, vocab.agg(sum(col("cnt")).cast("double").as("n_total")))
  }

  /** Score a batch against a prebuilt LM. Tokens absent from the vocab
    * (possible only when the batch is not part of the LM corpus) take
    * the floor count 1 — the minimum mass any observed token has — so
    * out-of-vocabulary text degrades smoothly instead of -inf. */
  def scoreWithLm(batch: DataFrame, vocab: DataFrame, total: DataFrame,
                  idCol: String, textCol: String): DataFrame =
    tokenStream(batch, idCol, textCol, lowercase = true)
      .select(col(idCol), col("tok"))
      .join(vocab, Seq("tok"), "left")
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
           round(avg(log(coalesce(col("cnt"), lit(1L)) / col("n_total"))), 4)
             .as("avg_logprob"))

  /** Interpolated bigram-LM quality score — the next step up from
    * [[lmQualityScore]]: each token transition w1→w2 is scored by
    *
    *   log( λ · p(w2|w1) + (1−λ) · p(w2) )
    *
    * with p(w2|w1) = cnt(w1,w2)/cnt(w1·) from the corpus's own bigram
    * counts and the unigram term as the smoothing floor (so an unseen
    * transition degrades to (1−λ)·p_uni instead of −inf). The bigram
    * term is what the unigram score cannot see: a document of real words
    * in scrambled order has a PERFECT unigram score but improbable
    * transitions — word-salad spam, shuffled boilerplate, and
    * keyword-stuffed pages sink here while sinking nowhere else.
    * Output: (idCol, n_bigrams, avg_logprob), higher = more fluent;
    * single-token documents have no transitions → n_bigrams 0,
    * avg_logprob null (no fluency evidence either way).
    *
    * Scale shape: the bigram LM is ONE hash aggregate over the token-
    * pair stream (map-side combine; Zipf-bounded like the unigram vocab,
    * just with a fatter tail), the w1 marginal rolls up from it
    * (no second corpus scan), and scoring is an equi-join of the pair
    * stream against the counts table on (w1,w2) — shuffled on the pair
    * key, AQE-splittable on stopword-pair skew. Like [[unigramLm]], the
    * counts table persists as a catalog table in a standing pipeline and
    * future batches pay only their own scoring scan. */
  def bigramLmScore(df: DataFrame, idCol: String, textCol: String,
                    lambda: Double = 0.7): DataFrame = {
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1]: $lambda")
    val w = Window.partitionBy(col(idCol)).orderBy(col("ord"))
    val pairs = tokenStream(df, idCol, textCol, lowercase = true)
      .select(col(idCol), col("tok").as("w1"), lead(col("tok"), 1).over(w).as("w2"))
      .filter(col("w2").isNotNull)
    val biCnt = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("bi_cnt"))
    // w1 marginal and the unigram LM both roll up from aggregates, not
    // corpus rescans; cnt(w1·) sums bigram counts, the unigram p uses
    // the full token count (every token, not just pair-left positions)
    val w1Cnt = biCnt.groupBy(col("w1")).agg(sum(col("bi_cnt")).as("w1_cnt"))
    val (vocab, total) = unigramLm(df, idCol, textCol)
    val uni = vocab.select(col("tok").as("w2"), col("cnt").as("u_cnt"))
    val scored = pairs
      .join(biCnt, Seq("w1", "w2"), "left")
      .join(w1Cnt, Seq("w1"), "left")
      .join(uni, Seq("w2"))
      .crossJoin(broadcast(total))
      .select(col(idCol),
        log(lit(lambda) * coalesce(col("bi_cnt") / col("w1_cnt"), lit(0.0)) +
            lit(1.0 - lambda) * (col("u_cnt") / col("n_total"))).as("lp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), round(avg(col("lp")), 4).as("avg_logprob"))
    // LEFT from the corpus: a 1-token doc has no transitions and must
    // surface with 0/null, not vanish from the quality report
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
  }

  /** Fixed-size token-window chunking with overlap — the retrieval /
    * context-window prep step (distinct from [[packSequences]], which
    * concatenates ACROSS documents; this splits WITHIN a document and
    * never mixes sources): chunk k of a document covers tokens
    * [k·stride + 1, min(k·stride + size, n)], k = 0..K with
    * K = ceil((n − size)/stride) (0 when n <= size), so every token is
    * covered, consecutive chunks overlap by (size − stride) tokens, and
    * only the last chunk may be short. Output: (idCol, chunk_idx,
    * n_chunk_tokens, chunk_text); ids are (document, index) pairs so a
    * retriever can cite the exact span.
    *
    * Scale shape: pure per-row column algebra — split once, explode the
    * K+1 chunk indexes, slice the token array — a narrow codegen'd map
    * with NO shuffle and no per-document state anywhere; each output row
    * costs O(size) slice work. At 100 TB this pipelines straight from
    * the scan into the embedding/indexing stage. */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     size: Int, stride: Int): DataFrame = {
    require(size >= 1, s"size must be >= 1: $size")
    require(stride >= 1 && stride <= size,
      s"stride must be in [1, size]: stride=$stride size=$size")
    val t = split(col(textCol), " ")
    val n = org.apache.spark.sql.functions.size(t)
    val lastK = when(n <= size, lit(0))
      .otherwise(ceil((n - lit(size)).cast("double") / stride).cast("int"))
    df.select(col(idCol), t.as("__t"), explode(sequence(lit(0), lastK)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        slice(col("__t"), col("chunk_idx") * stride + 1, lit(size)).as("__c"))
      .select(col(idCol), col("chunk_idx"),
        org.apache.spark.sql.functions.size(col("__c")).as("n_chunk_tokens"),
        array_join(col("__c"), " ").as("chunk_text"))
  }

  /** DSIR-style importance weights for target-domain data selection
    * (Data Selection via Importance Resampling, Xie et al. 2023,
    * arXiv:2302.03169 — public paper): score each corpus document by how
    * much more likely its hashed-unigram features are under the TARGET
    * distribution than under the corpus's own,
    *
    *   w(d) = avg over tokens of [ log p̂_tgt(b(tok)) − log p̂_cor(b(tok)) ]
    *
    * with b = a 3-hex-digit md5 bucket (16³ = 4096 hashed features) and
    * add-one smoothing over the full bucket space on both sides. md5
    * bucketing (not xxhash64) keeps the whole decision engine-portable —
    * the same reproducibility contract as the sampling operators — and
    * hashing bounds the feature table at 4096 rows regardless of corpus
    * vocabulary, which is the point of DSIR's hashed variant. The
    * averaged (per-token) form removes document-length bias so the
    * weight ranks "how target-like", not "how long".
    *
    * Output: (idCol, n_tokens, dsir_weight) — higher = more target-like;
    * resampling by weight composes with [[weightedSample]].
    *
    * Scale shape: both bucket LMs are ≤4096-row hash aggregates (one
    * over the target — tiny by definition; one over the corpus token
    * stream, map-side combined). The merged weight table rides ONE
    * broadcast join into the scoring scan of the corpus token stream;
    * the per-doc rollup is a partial-aggregated hash aggregate and
    * nothing touches the driver. The one-shot form here scans the
    * corpus token stream TWICE (LM build + scoring) — deliberately
    * uncached, the same compute-twice-not-cache trade the MinHash
    * pipeline measured (the stream is a cheap codegen'd projection;
    * materializing it costs more than recomputing). In a standing
    * pipeline the weight table persists as a catalog table and every
    * future ingest batch pays only its own scoring scan (same serving
    * split as [[unigramLm]]). */
  def dsirWeights(corpus: DataFrame, target: DataFrame,
                  idCol: String, textCol: String): DataFrame = {
    val nBuckets = 4096.0
    def buckets(df: DataFrame): DataFrame =
      tokenStream(df, idCol, textCol, lowercase = true)
        .select(col(idCol), substring(md5(col("tok")), 1, 3).as("b"))
    def bucketLm(toks: DataFrame): DataFrame =
      toks.groupBy(col("b")).agg(count(lit(1)).as("cnt"))
    val corToks = buckets(corpus)
    val tgtLm = bucketLm(buckets(target))
    val corLm = bucketLm(corToks)
    // totals from the bucket aggregates, not a second corpus scan
    val tgtTotal = tgtLm.agg(sum(col("cnt")).cast("double").as("t_total"))
    val corTotal = corLm.agg(sum(col("cnt")).cast("double").as("c_total"))
    val weights = tgtLm.withColumnRenamed("cnt", "t_cnt")
      .join(corLm.withColumnRenamed("cnt", "c_cnt"), Seq("b"), "full_outer")
      .crossJoin(broadcast(tgtTotal)).crossJoin(broadcast(corTotal))
      .select(col("b"),
        (log((coalesce(col("t_cnt"), lit(0L)) + 1) / (col("t_total") + nBuckets)) -
         log((coalesce(col("c_cnt"), lit(0L)) + 1) / (col("c_total") + nBuckets)))
          .as("lw"))
    corToks.join(broadcast(weights), "b")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
           round(avg(col("lw")), 4).as("dsir_weight"))
  }

  /** Per-document top-k salient terms by smoothed TF-IDF:
    * tf(w,d) · ln((N+1)/(df(w)+1)), ties broken by term (ascending) so
    * the ranking is total and engine-portable. Output: (idCol, rank,
    * tok, tf, df, tfidf).
    *
    * Scale shape: term frequencies aggregate on (doc, term) — partial
    * combine collapses repeats before the shuffle; document frequencies
    * roll up from that result on the term key alone (vocab-sized, tiny
    * next to the corpus); N rides a 1-row broadcast. The per-doc top-k
    * is a row_number window — WindowExec streams each doc's frame after
    * the (doc)-shuffle sort, holding k rows of state, never a per-doc
    * collect. */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String, k: Int = 5): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val toks = tokenStream(df, idCol, textCol, lowercase = true)
      .select(col(idCol), col("tok"))
    val tf = toks.groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val nDocs = df.agg(count(lit(1)).cast("double").as("n_docs"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("tfidf").desc, col("tok").asc)
    tf.join(dfreq, "tok")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", col("tf") * log((col("n_docs") + 1) / (col("df") + 1)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("tok"), col("tf"), col("df"),
        round(col("tfidf"), 4).as("tfidf"))
  }

  /** Gopher-style per-document repetition / diversity signals:
    *  - word_entropy: Shannon entropy (nats) of the unigram distribution
    *    — near-zero entropy is boilerplate or keyword stuffing;
    *  - top_bigram_frac: share of all bigram occurrences taken by the
    *    single most frequent bigram;
    *  - dup_trigram_frac: fraction of trigram occurrences that are
    *    repeats of an earlier trigram in the same document.
    *
    * One token-stream scan fans into three partial-aggregated rollups
    * re-joined on the id — each leg is a hash aggregate with map-side
    * combine, so the whole signal set costs O(tokens) with no
    * per-document state on any single node. */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("ord"))
    val toks = tokenStream(df, idCol, textCol)
    val grams = toks.select(
      col(idCol), col("tok"),
      concat_ws(" ", col("tok"), lead(col("tok"), 1).over(w)).as("bigram"),
      lead(col("tok"), 1).over(w).isNotNull.as("bi_ok"),
      concat_ws(" ", col("tok"), lead(col("tok"), 1).over(w), lead(col("tok"), 2).over(w)).as("trigram"),
      lead(col("tok"), 2).over(w).isNotNull.as("tri_ok"))

    // entropy = ln(N) - sum(c·ln c)/N over unigram counts c (N = Σc):
    // one grouped count plus one rollup, no per-doc distribution held
    val ent = grams.groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(round(log(sum(col("c"))) - sum(col("c") * log(col("c"))) / sum(col("c")), 4)
        .as("word_entropy"))
    val top = grams.filter(col("bi_ok"))
      .groupBy(col(idCol), col("bigram")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(round(max(col("c")).cast("double") / sum(col("c")), 4).as("top_bigram_frac"))
    val dup = grams.filter(col("tri_ok"))
      .groupBy(col(idCol))
      .agg(round(lit(1.0) - countDistinct(col("trigram")).cast("double") / count(lit(1)), 4)
        .as("dup_trigram_frac"))
    // LEFT joins: a 1-2-token doc has no bigram/trigram rows, and inner
    // joins dropped it from the report entirely — exactly the degenerate
    // docs repetition filters exist to catch. No n-grams = no repetition
    // evidence = 0.0.
    ent.join(top, Seq(idCol), "left").join(dup, Seq(idCol), "left")
      .withColumn("top_bigram_frac", coalesce(col("top_bigram_frac"), lit(0.0)))
      .withColumn("dup_trigram_frac", coalesce(col("dup_trigram_frac"), lit(0.0)))
  }

  // ---------- Gopher document-quality rules ----------

  /** Gopher-style document-level quality rules (Rae et al. 2021,
    * arXiv:2112.11446 §A1.1, public paper): per-document measurements
    * plus one boolean per rule and the conjunctive keep decision a
    * pretraining filter applies. Rules covered (the subset whose inputs
    * exist on plain text):
    *  - word count within [minWords, maxWords];
    *  - mean word length within [minMeanLen, maxMeanLen];
    *  - fraction of words containing an alphabetic character
    *    >= minAlphaRatio;
    *  - at least minStopwords stop-word hits (the "real language" test).
    *
    * Pure per-row column algebra — a full-corpus quality pass is one
    * narrow scan with zero shuffles, so at 100 TB it runs at I/O speed
    * and composes in front of dedup/sampling stages for free.
    * Ratios divide exact integer counts once, so values are engine-
    * portable (single rounding of an exact quotient). */
  def gopherRules(df: DataFrame, idCol: String, textCol: String,
                  minWords: Int = 50, maxWords: Int = 100000,
                  minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                  minAlphaRatio: Double = 0.8, minStopwords: Int = 2,
                  stopwords: Seq[String] = TextAnalysis.DefaultStopwords): DataFrame = {
    val toks = split(col(textCol), " ")
    val nWords = size(toks)
    val meanLen = aggregate(transform(toks, t => length(t)),
      lit(0L), (acc, v) => acc + v).cast("double") / nWords
    val alphaRatio = size(filter(toks, t => t.rlike("[A-Za-z]")))
      .cast("double") / nWords
    val stopHits = size(filter(toks, t => lower(t).isInCollection(stopwords)))
    df.select(
        col(idCol), nWords.as("n_words"),
        round(meanLen, 4).as("mean_word_len"),
        round(alphaRatio, 4).as("alpha_ratio"),
        stopHits.as("stop_hits"))
      .withColumn("ok_words",
        col("n_words").between(minWords, maxWords))
      .withColumn("ok_word_len",
        col("mean_word_len").between(minMeanLen, maxMeanLen))
      .withColumn("ok_alpha", col("alpha_ratio") >= minAlphaRatio)
      .withColumn("ok_stop", col("stop_hits") >= minStopwords)
      .withColumn("keep",
        col("ok_words") && col("ok_word_len") && col("ok_alpha") && col("ok_stop"))
  }

  // ---------- hashed-n-gram quality classifier ----------

  /** Feature-hashing bucket of a gram string: first 32 bits of md5, mod
    * `buckets` — engine-portable (DuckDB: CAST('0x'||substr(md5,1,8) AS
    * BIGINT) % buckets). */
  private def gramBucket(gram: Column, buckets: Int): Column =
    conv(substring(md5(gram), 1, 8), 16, 10).cast("long") % buckets

  /** Linear quality-classifier scoring over hashed word bigrams — the
    * fastText-style classifier shape every production pipeline runs
    * (e.g. the CCNet/LLaMA "looks like Wikipedia" filter), with
    * DETERMINISTIC md5-derived integer weights so the score has an exact
    * cross-engine oracle: weight(b) = (first 32 md5 bits of 'w'||b mod
    * 2001) − 1000 ∈ [−1000, 1000]. Per document the bigram weight sum S
    * is exact integer arithmetic (order-independent — no float
    * accumulation across engines), and
    * score = sigmoid(S / (1000 · max(n_bigrams, 1))), rounded once.
    *
    * For scoring with TRAINED weights use `scoreWithWeights`, which
    * takes the weight table `trainHashedClassifier` produces. Scale
    * shape (both): pure per-row column algebra — hashing, lookup-free
    * weight derivation, and the sum all happen inside one narrow
    * projection; a 100 TB scoring pass has zero shuffles. */
  def hashedClassifierScore(df: DataFrame, idCol: String, textCol: String,
                            buckets: Int = 1024): DataFrame = {
    val toks = split(lower(col(textCol)), " ")
    val grams = transform(sequence(lit(0), greatest(size(toks) - 2, lit(0))),
      i => when(i < size(toks) - 1,
        concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2))))
    val weights = transform(grams, g =>
      when(g.isNotNull,
        conv(substring(md5(concat(lit("w"), gramBucket(g, buckets).cast("string"))), 1, 8), 16, 10)
          .cast("long") % 2001 - 1000).otherwise(lit(0L)))
    val s = aggregate(weights, lit(0L), (acc, v) => acc + v)
    val n = greatest(size(toks) - 1, lit(1))
    df.select(col(idCol),
      round(lit(1.0) / (lit(1.0) + exp(-s.cast("double") / (n * lit(1000.0)))), 4)
        .as("score"))
  }

  /** (id, bucket, x) hashed-bigram frequency features: x = occurrences
    * of the bucket in the doc / total bigrams in the doc. */
  private def hashedFeatures(df: DataFrame, idCol: String, textCol: String,
                             buckets: Int): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("ord"))
    val grams = tokenStream(df, idCol, textCol, lowercase = true)
      .select(col(idCol),
        concat_ws(" ", col("tok"), lead(col("tok"), 1).over(w)).as("gram"),
        lead(col("tok"), 1).over(w).isNotNull.as("ok"))
      .filter(col("ok"))
      .select(col(idCol), gramBucket(col("gram"), buckets).as("bucket"))
    val n = grams.groupBy(col(idCol)).agg(count(lit(1)).as("__n"))
    grams.groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("__c"))
      .join(n, Seq(idCol))
      .select(col(idCol), col("bucket"),
        (col("__c").cast("double") / col("__n")).as("x"))
  }

  /** Logistic-regression training over hashed-bigram features, by
    * full-batch gradient descent run AS DATAFRAME JOBS: each iteration
    * is one pass over the feature stream (join with the current weights,
    * per-doc margin, sigmoid, per-bucket gradient aggregation). The
    * weight vector is `buckets` floats — driver-scale by construction
    * (like the IVF centroids), so it rides along as a broadcast join and
    * collects back once per iteration; the corpus itself is never
    * collected, cached once, and scanned `iters` times.
    *
    * `labeled` needs (idCol, textCol, labelCol ∈ {0,1}) — e.g. "is this
    * document Wikipedia-like". Returns (bucket, weight). Deterministic:
    * full-batch gradient, fixed iteration count, no randomness. */
  def trainHashedClassifier(labeled: DataFrame, idCol: String, textCol: String,
                            labelCol: String, buckets: Int = 1024,
                            iters: Int = 20, lr: Double = 50.0): DataFrame = {
    val spark = labeled.sparkSession
    import spark.implicits._
    val feats = hashedFeatures(labeled, idCol, textCol, buckets)
      .join(labeled.select(col(idCol), col(labelCol).cast("double").as("__y")), Seq(idCol))
      .persist()
    try {
      var w = Map.empty[Long, Double].withDefaultValue(0.0)
      for (_ <- 1 to iters) {
        val wDf = broadcast(w.toSeq.toDF("bucket", "w"))
        val margins = feats.join(wDf, Seq("bucket"), "left")
          .groupBy(col(idCol), col("__y"))
          .agg(sum(col("x") * coalesce(col("w"), lit(0.0))).as("__m"))
          .select(col(idCol), col("__y"),
            (lit(1.0) / (lit(1.0) + exp(-col("__m")))).as("__p"))
        // grad_b = Σ_docs (p − y)·x_b  — one keyed aggregation, collected
        // at driver scale (≤ buckets rows)
        val grad = feats.join(margins.select(col(idCol), (col("__p") - col("__y")).as("__e")), Seq(idCol))
          .groupBy(col("bucket")).agg(sum(col("__e") * col("x")).as("g"))
          .collect().map(r => (r.getLong(0), r.getDouble(1)))
        w = grad.foldLeft(w) { case (acc, (b, g)) => acc.updated(b, acc(b) - lr * g) }
      }
      spark.createDataset(w.toSeq).toDF("bucket", "weight")
    } finally feats.unpersist()
  }

  /** Score documents with a trained weight table: sigmoid of the
    * broadcast-joined weight·frequency dot product. One corpus scan, one
    * keyed aggregation back to the id — no corpus-sized shuffle beyond
    * the per-doc rollup. Documents with fewer than 2 tokens have no
    * bigram features; they score sigmoid(0) = 0.5 (matching
    * hashedClassifierScore) instead of vanishing from the output. */
  def scoreWithWeights(df: DataFrame, weights: DataFrame, idCol: String,
                       textCol: String, buckets: Int = 1024): DataFrame = {
    val dots = hashedFeatures(df, idCol, textCol, buckets)
      .join(broadcast(weights), Seq("bucket"), "left")
      .groupBy(col(idCol))
      .agg(sum(col("x") * coalesce(col("weight"), lit(0.0))).as("__dot"))
    df.select(col(idCol)).join(dots, Seq(idCol), "left")
      .select(col(idCol),
        (lit(1.0) / (lit(1.0) + exp(-coalesce(col("__dot"), lit(0.0))))).as("score"))
  }

  // ---------- global shuffle order + equal-token shard manifests ----------

  /** Deterministic global training-order shuffle + exact global running
    * token count + equal-token contiguous shard assignment — the step that
    * turns a curated corpus into N balanced shard manifests in a seeded
    * pseudo-random order.
    *
    * The naive form is `sum(tokens) OVER (ORDER BY h)` — a windowed prefix
    * sum with no partition spec, which Spark plans as ONE partition holding
    * the whole corpus: the canonical single-reducer scale-killer. This
    * implementation is the two-phase exact equivalent:
    *
    *   1. range-repartition on the shuffle key (h, id) — the one corpus
    *      shuffle, same cost as any global sort — and sort within
    *      partitions;
    *   2. one tiny pass collects PER-PARTITION token totals (≤ `partitions`
    *      longs — driver-scale by construction, like the IVF centroids);
    *      their scan becomes each partition's starting offset;
    *   3. one mapPartitions pass streams the per-partition running sum on
    *      top of the broadcast offset — O(1) state, no second corpus
    *      shuffle (a Window.partitionBy(pid) here would re-exchange the
    *      whole corpus on pid just to get partition-local frames).
    *
    * The two passes share the range exchange: both jobs hang off the same
    * shuffled RDD, so Spark reuses the map stage's shuffle files instead
    * of re-partitioning twice.
    *
    * The shuffle key is a Knuth multiplicative hash — engine-portable
    * integer algebra (no xxhash64, which DuckDB lacks), kept inside int64:
    * h = ((id mod 2^31) · 2654435761 + seed) mod 2^32. Shards are
    * contiguous equal-token ranges of that order: a document belongs to
    * the shard where it STARTS (floor(start / ceil(total/numShards))),
    * clamped so rounding never mints shard numShards.
    *
    * Determinism: the hash is data-independent, range-partitioner bounds
    * sampling is seeded by partition index (byteswap32), and ties are
    * impossible (ids are unique) — a re-run on any cluster layout yields
    * byte-identical (order, cum, shard). */
  def globalShuffleShards(df: DataFrame, idCol: String, tokenCol: String,
                          numShards: Int, partitions: Int = 32,
                          seed: Long = 41L): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1: $numShards")
    require(partitions >= 1, s"partitions must be >= 1: $partitions")
    val spark = df.sparkSession
    val hashed = df.select(
        col(idCol).cast("long").as("id"),
        col(tokenCol).cast("long").as("n_tokens"))
      .withColumn("h",
        ((col("id") % lit(1L << 31)) * lit(2654435761L) + lit(seed)) % lit(1L << 32))
    val ranged = hashed
      .repartitionByRange(partitions, col("h"), col("id"))
      .sortWithinPartitions(col("h"), col("id"))
    val rdd = ranged.rdd // one RDD object: both jobs below reuse its shuffle
    val perPartition = rdd.mapPartitionsWithIndex { (i, it) =>
      var s = 0L; it.foreach(r => s += r.getLong(1)); Iterator((i, s))
    }.collect()
    val totalsByIdx = Array.fill(rdd.getNumPartitions)(0L)
    perPartition.foreach { case (i, s) => totalsByIdx(i) = s }
    val offsets = totalsByIdx.scanLeft(0L)(_ + _) // offsets(i) = tokens before partition i
    val total = offsets.last
    val shardTokens = math.max(1L, (total + numShards - 1) / numShards)
    val bcOffsets = spark.sparkContext.broadcast(offsets)
    val lastShard = (numShards - 1).toLong
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var cum = bcOffsets.value(i)
      it.map { r =>
        val tok = r.getLong(1)
        cum += tok
        org.apache.spark.sql.Row(r.getLong(0), tok, r.getLong(2), cum,
          math.min((cum - tok) / shardTokens, lastShard))
      }
    }
    import org.apache.spark.sql.types._
    spark.createDataFrame(out, StructType(Seq(
      StructField("id", LongType), StructField("n_tokens", LongType),
      StructField("h", LongType), StructField("cum_tokens", LongType),
      StructField("shard", LongType))))
  }
}
