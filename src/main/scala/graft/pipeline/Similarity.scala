package graft.pipeline

import graft.functions.TopKAggregator
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Embedding similarity search: brute-force cosine top-k (exact baseline)
  * and random-hyperplane LSH bucketing (the scale path).
  *
  * Scale design (100 TB / billions of vectors):
  *  - the query set is broadcast — the corpus is never shuffled for
  *    brute force; scoring happens per partition and the final ranking
  *    is a bounded-heap partial aggregation (TopKAggregator), so the
  *    exchange carries O(partitions · queries · k) rows — NEVER a
  *    per-query window rank, which would pull every scored corpus row
  *    for a query into one task;
  *  - LSH assigns every vector a small bucket key in one projection;
  *    ANN probes then equi-join on the bucket key (plus neighbor probes
  *    for recall), turning O(N·Q) into O(bucket·Q);
  *  - all arithmetic is higher-order array functions in double precision —
  *    codegen'd, no UDF, deterministic.
  */
object Similarity {

  /** Exact top-k per query via two-phase bounded-heap aggregation: map
    * partitions each reduce to <= k entries per query (partial
    * ObjectHashAggregate), the shuffle merges heaps. Output contract is
    * identical to the window-rank pattern: (query_id, neighbor_id,
    * score, rank), score desc, neighbor_id asc tie-break. */
  private def topKPerQuery(scored: DataFrame, k: Int, idType: DataType): DataFrame =
    TopKAggregator.topKPerGroup(scored, k, idType)

  /** Dot product of two array<float/double> columns in double precision,
    * summed left-to-right (deterministic, engine-portable). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
              lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
                   lit(0.0), (acc, v) => acc + v))

  /** Reference implementation via higher-order functions (interpreted —
    * kept for cross-checking the codegen'd expression). */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Hot-path cosine: fused codegen'd Catalyst expression
    * (graft.functions.CosineSimilarity) — same numerics, ~1000× faster
    * in pairwise joins. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosineSim(a, b)

  /** Exact brute-force top-k: queries broadcast against the corpus;
    * per-partition scoring, bounded-heap top-k merge, deterministic id
    * tie-break. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
    val c = graft.operators.ScaleOut.forCompute(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("vec")), "neighbor_id")
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("vec"), col("query_vec")), 4).as("score"))
    topKPerQuery(scored, k, corpus.schema(idCol).dataType)
  }

  /** Greedy k-center coreset selection (farthest-point traversal,
    * Gonzalez 1985, public algorithm — the 2-approximation for the
    * k-center objective): starting from the lowest-id vector, each
    * round admits the point FARTHEST (cosine distance) from the
    * selected set. The diversity sampler of embedding-space curation:
    * where temperature/mixture samplers balance token MASS, k-center
    * maximizes COVERAGE — every corpus point ends within the selected
    * radius of a center.
    *
    * Scale shape: the per-point min-distance-to-selected column updates
    * with ONE narrow broadcast comparison per round (the new center is
    * a 1-row literal; no join, no shuffle), and the round's argmax is a
    * 1-row aggregate — k rounds of O(corpus) map work, the same
    * iterative discipline as kMeans/PCA here. localCheckpoint per
    * round keeps lineage flat.
    *
    * Determinism: distances round to 6 decimals before the argmax, ties
    * break to the LOWER id; output (rank, vec_id, covered_radius) where
    * covered_radius is the max remaining min-distance BEFORE the pick —
    * the coverage guarantee the selection certifies at each size. */
  def kCenterSelect(corpus: DataFrame, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val spark = corpus.sparkSession
    import spark.implicits._
    // normalize to the (long id, array<float> vec) working types up
    // front — integral ids and any numeric element type are accepted
    // via cast; anything else fails HERE with a typed message instead
    // of a ClassCastException mid-iteration
    import org.apache.spark.sql.types.{ArrayType, ByteType, IntegerType,
      LongType, NumericType, ShortType}
    corpus.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case t => throw new IllegalArgumentException(
        s"kCenterSelect: $idCol must be an integral id column, got $t")
    }
    corpus.schema(vecCol).dataType match {
      case ArrayType(_: NumericType, _) => ()
      case t => throw new IllegalArgumentException(
        s"kCenterSelect: $vecCol must be a numeric array column, got $t")
    }
    val base = corpus.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<float>").as("vec"))
    val firstId = base.agg(min(col("id"))).head().getLong(0)
    val firstVec = base.filter(col("id") === firstId).head().getSeq[Float](1)
    var state = base
      .withColumn("mind", round(lit(1.0) - cosine(col("vec"),
        lit(firstVec.toArray)), 6))
      .localCheckpoint()
    val picks = scala.collection.mutable.ArrayBuffer((1, firstId, 0.0))
    for (r <- 2 to k) {
      val far = state.filter(!col("id").isin(picks.toSeq.map(_._2): _*))
        .orderBy(col("mind").desc, col("id")).limit(1)
        .select(col("id"), col("vec"), col("mind")).head()
      picks += ((r, far.getLong(0), far.getDouble(2)))
      val newVec = far.getSeq[Float](1)
      state = state
        .withColumn("mind", least(col("mind"),
          round(lit(1.0) - cosine(col("vec"), lit(newVec.toArray)), 6)))
        .localCheckpoint()
    }
    picks.toSeq.toDF("rank", "vec_id", "covered_radius")
  }

  /** Recall@k of an approximate top-k against the exact top-k: for
    * each query, |approx ∩ exact| / |exact| — the standard ANN quality
    * gauge, computed in-engine so a recall regression (bad quantizer
    * retrain, wrong nprobe) fails a release gate instead of silently
    * degrading retrieval. Both inputs are (query_id, neighbor_id[,...])
    * top-k tables; output (query_id, recall) — |queries| rows.
    *
    * Scale shape: one left join on (query_id, neighbor_id) + one
    * aggregate, both bounded at queries×k rows — the evaluation costs
    * nothing next to the retrievals themselves. */
  def recallAtK(approx: DataFrame, exact: DataFrame): DataFrame = {
    val hits = approx.select(col("query_id"), col("neighbor_id"))
      .withColumn("__hit", lit(1))
    exact.select(col("query_id"), col("neighbor_id"))
      .join(hits, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(round(sum(coalesce(col("__hit"), lit(0))).cast("double") /
        count(lit(1)), 4).as("recall"))
  }

  /** Matryoshka (MRL-style) two-phase retrieval: score the whole corpus
    * with only the first `prefixDims` dimensions — the cheap pass that
    * motivates matryoshka embeddings: a d/prefixDims-fold cut in
    * arithmetic AND scan bandwidth when the prefix is stored as its own
    * column — keep a `shortlist`-sized pool per query (bounded-heap, no
    * corpus shuffle), then re-rank ONLY the pool with full-dimension
    * cosine. The pool join broadcasts (queries·shortlist rows), so the
    * corpus is scanned exactly twice and never shuffled; at 100 TB the
    * second scan disappears too if the full vectors are fetched by id
    * from a point-lookup layout. Deterministic end to end — the gate
    * oracle replays both phases exactly. */
  def matryoshkaTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     prefixDims: Int, shortlist: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
    val c = graft.operators.ScaleOut.forCompute(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("vec")), "neighbor_id")
    val pre = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(slice(col("vec"), 1, prefixDims),
          slice(col("query_vec"), 1, prefixDims)), 4).as("score"))
    val pool = TopKAggregator.topKPerGroup(pre, shortlist, corpus.schema(idCol).dataType)
      .select(col("query_id"), col("neighbor_id"))
    val rescored = c.join(broadcast(pool), Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("vec"), col("query_vec")), 4).as("score"))
    topKPerQuery(rescored, k, corpus.schema(idCol).dataType)
  }

  /** Hard-negative mining for contrastive training: each query's `k`
    * MOST similar corpus vectors carrying a DIFFERENT label — the
    * near-boundary negatives that actually move an embedding model,
    * mined corpus-wide. Same single-scan broadcast plan as
    * [[bruteForceTopK]]: the label inequality composes into the scan
    * filter, the heap stays bounded, the corpus never shuffles. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    labelCol: String = "label"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"),
      col(labelCol).as("query_label"))
    val c = graft.operators.ScaleOut.forCompute(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("vec"),
        col(labelCol).as("neg_label")), "neighbor_id")
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id") &&
        col("neg_label") =!= col("query_label"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("vec"), col("query_vec")), 4).as("score"))
    topKPerQuery(scored, k, corpus.schema(idCol).dataType)
  }

  /** kNN majority-vote classification: each query's `k` nearest corpus
    * vectors (exact cosine, same two-phase bounded-heap plan as
    * bruteForceTopK) vote with their label; the most common label wins,
    * ties broken by smaller label. The training-pipeline use is label
    * assignment / label-noise auditing over an embedded corpus.
    *
    * Scale shape: the corpus is scanned once (queries broadcast); the
    * neighbor table is O(queries · k) and stays broadcast-small for the
    * label join and the vote, so no corpus-sized shuffle ever happens.
    * Output: (query_id, pred_label, votes), votes = neighbors carrying
    * the winning label. */
  def knnClassify(corpus: DataFrame, queries: DataFrame, k: Int,
                  idCol: String = "vec_id", vecCol: String = "embedding",
                  labelCol: String = "label"): DataFrame = {
    val nn = bruteForceTopK(corpus, queries, k, idCol, vecCol)
    val labels = corpus.select(col(idCol).as("neighbor_id"), col(labelCol))
    // nn is queries·k rows — broadcast it into the corpus-sized label
    // table so the join is a single corpus scan, then vote on the tiny
    // result (per-query groups of <= k rows; the window is metadata-scale)
    val votes = labels.join(broadcast(nn), Seq("neighbor_id"))
      .groupBy(col("query_id"), col(labelCol).as("pred_label"))
      .agg(count(lit(1)).as("votes"))
    import org.apache.spark.sql.expressions.Window
    votes
      .withColumn("rn", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("votes").desc, col("pred_label"))))
      .filter(col("rn") === 1)
      .select(col("query_id"), col("pred_label"), col("votes"))
  }

  // ---------------- embedding drift monitoring ----------------

  /** Per-label centroid drift between a reference corpus slice and a
    * current one — the embedding-space monitoring primitive: when a
    * label's two centroids stop being collinear (cosine well below 1),
    * the incoming data's geometry has moved and downstream ANN indexes /
    * classifiers trained on the reference slice are stale (the rebuild
    * trigger appendToIvfPqIndex's docstring defers to).
    *
    * Scale shape: each side is ONE posexplode + hash aggregate — the d×
    * row fan-out is immediately collapsed by map-side partial avg, so
    * the shuffle carries labels × d partial sums, not corpus rows. The
    * cosine then reduces labels × d mean rows to labels — metadata
    * scale. Means are rounded to 6 decimals (engine portability), the
    * cosine to 4. Labels must appear in BOTH slices to be reported
    * (inner join — a label with no current data is a volume alarm, not
    * a drift measurement). */
  def centroidDrift(ref: DataFrame, cur: DataFrame,
                    labelCol: String = "label",
                    vecCol: String = "embedding"): DataFrame = {
    def sideMeans(df: DataFrame, as: String) =
      df.select(col(labelCol), posexplode(col(vecCol)).as(Seq("pos", "v")))
        .groupBy(col(labelCol), col("pos"))
        .agg(round(avg(col("v").cast("double")), 6).as(as))
    val cosine = sideMeans(ref, "mr").join(sideMeans(cur, "mc"), Seq(labelCol, "pos"))
      .groupBy(col(labelCol))
      .agg(round(sum(col("mr") * col("mc")) /
        (sqrt(sum(col("mr") * col("mr"))) * sqrt(sum(col("mc") * col("mc")))), 4)
        .as("drift_cosine"))
    val nr = ref.groupBy(col(labelCol)).agg(count(lit(1)).as("n_ref"))
    val nc = cur.groupBy(col(labelCol)).agg(count(lit(1)).as("n_cur"))
    cosine.join(nr, labelCol).join(nc, labelCol)
      .select(col(labelCol), col("n_ref"), col("n_cur"), col("drift_cosine"))
  }

  // ---------------- int8 scalar quantization ----------------

  /** Symmetric per-vector int8 quantization: scale = max|v|/127,
    * q_i = floor(v_i/scale + 0.5). floor(x+0.5) instead of round() on
    * purpose — floor has identical semantics in every engine, while
    * round() half-way behavior differs (Spark HALF_UP vs cast-rounding),
    * so the quantized codes admit an exact cross-engine oracle. The
    * 1e-30 floor guards the all-zero vector (codes collapse to 0, not
    * NaN). Emitted as long so downstream integer dot products are exact. */
  def quantizeInt8(vec: Column): Column = {
    val scale = greatest(
      array_max(transform(vec, x => abs(x.cast("double")))), lit(1e-30)) / lit(127.0)
    transform(vec, x => floor(x.cast("double") / scale + lit(0.5)).cast("long"))
  }

  /** Cosine over int8 codes. The per-vector scales CANCEL in the cosine
    * ratio, so this is pure integer arithmetic (exact, order-independent
    * sums — no float-accumulation portability caveat) until the single
    * final division. An all-zero code vector (a zero embedding after
    * quantization) scores 0.0, not NaN — NaN would sort ABOVE every real
    * score in a descending top-k and crown the garbage vector rank-1. */
  def int8Cosine(a: Column, b: Column): Column = {
    def isum(c: Column) =
      aggregate(transform(c, x => x * x), lit(0L), (acc, v) => acc + v)
    val d = aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)
    val denom = sqrt(isum(a).cast("double")) * sqrt(isum(b).cast("double"))
    when(denom === 0.0, lit(0.0)).otherwise(d.cast("double") / denom)
  }

  /** Brute-force top-k over int8-quantized vectors — the memory-scale
    * path: codes are 4-8× smaller than float32 (1 byte of information
    * per dim), so a 100 TB float corpus scans as ~25 TB of codes, and at
    * equal IO the quantized scan ranks 4× more corpus per second. Same
    * broadcast-queries / bounded-heap plan as bruteForceTopK; the
    * quantization is a narrow per-row projection computed once per side.
    * Recall loss vs exact cosine is the operator's documented tradeoff
    * (the int8 grid perturbs each coordinate by <= scale/2). */
  def int8TopK(corpus: DataFrame, queries: DataFrame, k: Int,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      quantizeInt8(col(vecCol)).as("query_q"))
    val c = graft.operators.ScaleOut.forCompute(
      corpus.select(col(idCol).as("neighbor_id"),
        quantizeInt8(col(vecCol)).as("q")), "neighbor_id")
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(int8Cosine(col("q"), col("query_q")), 4).as("score"))
    topKPerQuery(scored, k, corpus.schema(idCol).dataType)
  }

  /** All pairs with rounded cosine >= threshold (near-dup detection).
    * Quadratic — intended for post-LSH candidate sets; kept exact here
    * for oracle checking. */
  def nearDupPairs(corpus: DataFrame, threshold: Double,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = corpus.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val b = corpus.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("score", round(cosine(col("vec_a"), col("vec_b")), 4))
      .filter(col("score") >= threshold)
      .select(col("id_a"), col("id_b"), col("score"))
  }

  /** Exact near-dup pairs WITHOUT a row-level cartesian: deterministic
    * ball-cover candidate pruning.
    *
    * Geometry: on L2-normalized vectors, cosine(a,b) >= T  ⟺
    * ‖â−b̂‖ <= R where R = sqrt(2−2T). Assign every vector to its
    * nearest of `nlist` centroids (cells); let r_i be cell i's radius
    * (max distance of a member to its centroid). For any qualifying pair
    * with a in cell i, b in cell j the triangle inequality forces
    * ‖c_i−c_j‖ <= r_i + r_j + R — so scoring only row pairs whose CELL
    * pair satisfies that bound is complete BY THEOREM, for every corpus
    * and threshold (no probabilistic recall argument, unlike sign-LSH,
    * which provably cannot separate cosine 0.4 from cosine 0.3 with
    * useful band counts: per-plane collision 0.63 vs 0.60).
    *
    * Plan shape: the only quadratic object is the nlist² cell-pair
    * table (driver-built, broadcast); rows flow through ONE broadcast
    * hash join (cell→candidate cell pairs) and ONE equi-join on the
    * partner cell id — no CartesianProduct / BroadcastNestedLoopJoin
    * (PlanSpec-asserted). Pruning power is data-dependent: clustered
    * corpora (real embedding sets) drop most cell pairs; an isotropic
    * random corpus at a sub-random threshold keeps them all — for such
    * corpora every exact algorithm degenerates to ~all pairs, but the
    * plan still shuffles by cell (co-partitioned, spillable) instead of
    * materializing a cartesian. Scores come from the same codegen'd
    * cosine over RAW vectors as nearDupPairs, so output is bit-identical
    * to the all-pairs form on uniform-width corpora (mixed widths are
    * rejected loudly — see the radii check below). */
  def nearDupPairsBallCover(corpus: DataFrame, threshold: Double,
                            nlist: Int = 16, seed: Long = 42L,
                            idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = withNormalized(graft.operators.ScaleOut.forCompute(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("vec")),
      "neighbor_id"), "vec")
    val sample = collectSample(c, "_nvec", 4096)
    val centers = LocalKMeans.fit(sample, nlist, maxIter = 5, seed = seed)
    // localCheckpoint (not persist): the assignment pass feeds the radii
    // action AND both join sides, and Spark won't dedup the common
    // subplan on its own; checkpointing materializes once and truncates
    // lineage without leaking cached blocks across repeated calls
    val assigned = c.select(col("neighbor_id"), col("vec"),
      graft.functions.PqFunctions.nearestCentroid(col("_nvec"), centers).as("cell"),
      graft.functions.PqFunctions.nearestCentroidDist(col("_nvec"), centers).as("cdist"))
      .localCheckpoint()
    // per-cell radii: nlist rows — driver-scale by construction. A null
    // cell means a width-mismatched vector (NearestCentroid's contract);
    // the all-pairs form would still pair two vectors sharing a MINORITY
    // width, which no cell geometry can cover — so the equality claim
    // only holds on uniform-width corpora, and we fail loudly instead of
    // silently dropping pairs.
    val radiiRows = assigned.groupBy("cell").agg(max(col("cdist")).as("r")).collect()
    require(!radiiRows.exists(_.isNullAt(0)),
      "nearDupPairsBallCover requires a uniform-width corpus: found vectors whose " +
        "width differs from the sampled centroid dimension (use nearDupPairs, or " +
        "partition the corpus by width first)")
    val radii = radiiRows.map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // reach from the ROUND-UP boundary: emission tests round(cos,4) >=
    // threshold, so a pair with true cosine down to threshold−5e-5 can
    // round up and be emitted — the geometric bound must cover it
    val reach = math.sqrt(math.max(0.0, 2.0 - 2.0 * (threshold - 0.00005)))
    def centerDist(i: Int, j: Int): Double = {
      var s = 0.0; var t = 0
      while (t < centers(i).length) {
        val x = centers(i)(t) - centers(j)(t); s += x * x; t += 1
      }
      math.sqrt(s)
    }
    // small epsilon so float error on a borderline bound can never
    // prune a cell pair holding an exactly-at-threshold row pair
    val eps = 1e-9
    val cellPairs = (for {
      i <- radii.keys.toSeq; j <- radii.keys.toSeq
      if centerDist(i, j) <= radii(i) + radii(j) + reach + eps
    } yield (i, j)).toDF("cell_a", "cell_b")
    val a = assigned.select(col("neighbor_id").as("id_a"),
      col("vec").as("vec_a"), col("cell").as("cell_a"))
    val b = assigned.select(col("neighbor_id").as("id_b"),
      col("vec").as("vec_b"), col("cell").as("cell_b"))
    a.join(broadcast(cellPairs), Seq("cell_a"))
      .join(b, Seq("cell_b"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("score", round(cosine(col("vec_a"), col("vec_b")), 4))
      .filter(col("score") >= threshold)
      .select(col("id_a"), col("id_b"), col("score"))
  }

  /** SemDeDup's WITHIN-CLUSTER near-dup pairs (Abbas et al. 2023,
    * "SemDeDup: Data-efficient learning at web-scale through semantic
    * deduplication" — the published recipe: k-means the embedding
    * corpus, then compare pairs only INSIDE each cluster): assign every
    * vector to its nearest of `nlist` centroids and emit pairs with
    * cosine >= threshold whose BOTH sides share a cell. One shuffle by
    * cell, O(Σ cell²) scored pairs — with nlist sized to a fixed target
    * cell population (nlist ∝ n) the total is O(n·cellSize), the shape
    * that makes corpus-level semantic dedup affordable at 100 TB.
    *
    * By-design approximation, stated loudly: a qualifying pair whose
    * members land in different cells is NOT emitted (the paper accepts
    * exactly this recall loss; duplicates are near-identical vectors,
    * which co-assign except at cell boundaries). The EXACT dual is
    * [[nearDupPairsBallCover]] — complete by theorem, but on isotropic
    * corpora its triangle-inequality prune cannot discard cell pairs
    * and it degenerates to ~all-pairs scans (its own scaladoc); this is
    * the bounded-cost production variant, that is the oracle-grade
    * exact one. At nlist=1 the two coincide (single cell = all pairs),
    * which the spec pins. */
  def semDeDupPairsWithinCells(corpus: DataFrame, threshold: Double,
                               nlist: Int = 16, seed: Long = 42L,
                               idCol: String = "vec_id",
                               vecCol: String = "embedding"): DataFrame =
    semDeDupPairsOnAssigned(
      semDeDupCellAssignments(corpus, nlist, seed, idCol, vecCol)
        .localCheckpoint(),
      threshold)

  /** The cell DECISIONS of [[semDeDupPairsWithinCells]] — (neighbor_id,
    * vec, cell) — factored out so a declared query can export the
    * assignment as an oracle fixture (within-cell scoring is exact
    * cosine + a recursive closure an external engine replays). */
  def semDeDupCellAssignments(corpus: DataFrame, nlist: Int = 16,
                              seed: Long = 42L, idCol: String = "vec_id",
                              vecCol: String = "embedding"): DataFrame = {
    val c = withNormalized(graft.operators.ScaleOut.forCompute(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("vec")),
      "neighbor_id"), "vec")
    val sample = collectSample(c, "_nvec", 4096)
    val centers = LocalKMeans.fit(sample, nlist, maxIter = 5, seed = seed)
    c.select(col("neighbor_id"), col("vec"),
      graft.functions.PqFunctions.nearestCentroid(col("_nvec"), centers).as("cell"))
  }

  /** [[semDeDupPairsWithinCells]] over a PRECOMPUTED assignment. */
  def semDeDupPairsOnAssigned(assigned: DataFrame,
                              threshold: Double): DataFrame = {
    val a = assigned.select(col("neighbor_id").as("id_a"),
      col("vec").as("vec_a"), col("cell"))
    val b = assigned.select(col("neighbor_id").as("id_b"),
      col("vec").as("vec_b"), col("cell"))
    a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("score", round(cosine(col("vec_a"), col("vec_b")), 4))
      .filter(col("score") >= threshold)
      .select(col("id_a"), col("id_b"), col("score"))
  }

  /** Random-hyperplane LSH bucket key: `planes` sign bits packed into a
    * long. Plane components are deterministic pseudo-randoms from
    * xxhash64(plane, dim) — reproducible across runs and cluster sizes.
    * Codegen'd Catalyst expression with a per-width coefficient cache
    * (the last interpreted HOF on a vector hot path, retired); the HOF
    * reference form below stays for the bit-equality spec. */
  def lshBucket(vec: Column, planes: Int): Column =
    graft.functions.VectorFunctions.lshBucket(vec, planes)

  /** Interpreted higher-order-function reference for [[lshBucket]]. */
  private[graft] def lshBucketHof(vec: Column, planes: Int): Column = {
    // dims derived per row from the vector itself — a hardcoded width would
    // null the plane dot product (element_at past the end) for narrower
    // embeddings and silently collapse every bucket to 0.
    aggregate(
      sequence(lit(0), lit(planes - 1)),
      lit(0L),
      (acc, p) => {
        val planeDot = aggregate(
          sequence(lit(0), size(vec) - 1),
          lit(0.0),
          (dacc, i) => dacc +
            element_at(vec, i + 1).cast("double") *
            ((xxhash64(p, i) % 1000).cast("double") / 500.0))
        acc.bitwiseOR(when(planeDot > 0, call_function("shiftleft", lit(1L), p)).otherwise(lit(0L)))
      })
  }

  /** The `nprobe` probe cells per query, ranked by the ASSIGNMENT metric:
    * corpus vectors join cells by squared-L2 argmin, and for a unit query
    * argmin ‖q̂−c‖² == argmax (q̂·c − ‖c‖²/2), so cells are scored with
    * the ‖c‖²/2 correction (raw inner product diverges from the
    * assignment ordering when centroid norms differ — mild recall loss
    * on queries near cell boundaries). Expects `qn` to carry `query_id`
    * and the normalized `_nvec`. */
  private def probeCells(qn: DataFrame, centers: Array[Array[Double]],
                         nprobe: Int): DataFrame = {
    val spark = qn.sparkSession
    import spark.implicits._
    val centersDf = centers.zipWithIndex
      .map { case (cn, i) => (i, cn.toSeq, cn.map(x => x * x).sum) }.toSeq
      .toDF("cell", "center_vec", "cnorm2")
    val cellScores = qn.crossJoin(broadcast(centersDf))
      .select(col("query_id"), col("cell").as("neighbor_id"),
        (aggregate(zip_with(col("_nvec"), col("center_vec"), (a, b) => a * b),
                   lit(0.0), (acc, v) => acc + v) - col("cnorm2") / 2).as("score"))
    TopKAggregator.topKPerGroup(cellScores, nprobe,
        org.apache.spark.sql.types.IntegerType)
      .select(col("query_id"), col("neighbor_id").as("cell"))
  }

  /** IVF (inverted-file) ANN: k-means coarse quantizer (Spark MLlib)
    * partitions the corpus into `nlist` cells; a query scores only the
    * vectors in its `nprobe` nearest cells. The standard billion-scale
    * layout: cells are the partition key, so at 100 TB the corpus is
    * bucketed/sorted by cell id once and probes touch `nprobe/nlist` of
    * the data. Exact cosine within probed cells — recall is controlled by
    * nprobe, precision is exact. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4, seed: Long = 42L,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // NORMALIZE before the quantizer (same as ivfPqTopK): cells are
    // assigned by L2 and probed by inner product — on unit vectors those
    // orderings agree, on raw vectors they diverge and queries probe
    // cells their true neighbors were never assigned to (silent recall
    // loss on un-normalized embeddings)
    val (probes0, assigned) =
      ivfDecisions(corpus, queries, nlist, nprobe, seed, idCol, vecCol)
    ivfTopKFrom(probes0, assigned, queries, k, idCol, vecCol)
  }

  /** [[ivfTopK]] over ALREADY-COMPUTED quantizer decisions — callers
    * that also export the decisions (oracle fixtures) train the
    * quantizer and assign the corpus exactly once. */
  def ivfTopKFrom(probes0: DataFrame, assigned: DataFrame,
                  queries: DataFrame, k: Int,
                  idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
    val probes = probes0.join(q, "query_id") // re-attach the query vector
    val scored = assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("vec"), col("query_vec")), 4).as("score"))
    // neighbor ids come from the CORPUS side (mixed query/corpus id
    // types are supported — see queryLuts); casting them to the query
    // id type would silently null string/UUID neighbor ids
    topKPerQuery(scored, k, assigned.schema("neighbor_id").dataType)
  }

  /** The quantizer DECISIONS of [[ivfTopK]]'s configuration — (query
    * probe pairs (query_id, cell), corpus assignment carrying
    * (neighbor_id, vec, _nvec, cell)) — factored out so the declared
    * query can EXPORT them as an oracle fixture: the seeded quantizer
    * is engine-defined, but everything downstream of its decisions
    * (probe-restricted candidate set, exact cosine, ranking, top-k)
    * replays declaratively in DuckDB. Deterministic (bounded id-sorted
    * training sample, seeded k-means), so two calls — ivfTopK's own and
    * the fixture export — are identical by construction. */
  def ivfDecisions(corpus: DataFrame, queries: DataFrame,
                   nlist: Int = 16, nprobe: Int = 4, seed: Long = 42L,
                   idCol: String = "vec_id", vecCol: String = "embedding")
      : (DataFrame, DataFrame) = {
    // NORMALIZE before the quantizer (same as ivfPqTopK): cells are
    // assigned by L2 and probed by inner product — on unit vectors those
    // orderings agree, on raw vectors they diverge and queries probe
    // cells their true neighbors were never assigned to (silent recall
    // loss on un-normalized embeddings)
    val c = withNormalized(graft.operators.ScaleOut.forCompute(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("vec")),
      "neighbor_id"), "vec")
    // bounded-sample LocalKMeans + a codegen'd assignment projection:
    // training cost is corpus-size-independent, and the full-corpus pass
    // is one narrow NearestCentroid map (no MLlib fit/transform jobs)
    val sample = collectSample(c, "_nvec", 4096)
    val centers = LocalKMeans.fit(sample, nlist, maxIter = 5, seed = seed)
    val assigned = c.withColumn("cell",
      graft.functions.PqFunctions.nearestCentroid(col("_nvec"), centers))
    // nprobe nearest cells per query, from the broadcast centroid array
    val qn = withNormalized(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec")),
      "query_vec")
    (probeCells(qn, centers, nprobe), assigned)
  }

  // ---------------- product quantization (PQ) ----------------

  private case class PqIndex(coded: DataFrame, codebooks: Array[Array[Array[Double]]],
                             m: Int, ksub: Int, dsub: Int)

  /** L2-normalize `vecCol` into a double-array `_nvec` (inner product on
    * normalized vectors == cosine). */
  private def withNormalized(df: DataFrame, vecCol: String): DataFrame = {
    // codegen'd self-dot for the norm: the interpreted transform+fold
    // pair cost ~2s per sf0.1 pass on its own (float input); other
    // element types keep the HOF form
    val isFloat = df.schema(vecCol).dataType match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, _) => true
      case _ => false
    }
    val n =
      if (isFloat) sqrt(graft.functions.VectorFunctions.dotProduct(col(vecCol), col(vecCol)))
      else sqrt(aggregate(transform(col(vecCol), x => x.cast("double") * x.cast("double")),
                          lit(0.0), (a, v) => a + v))
    // an all-zero vector (padding/dead row) must stay zero, not become
    // NaN: NaN compares false everywhere, so PqEncode would silently
    // give it centroid-0 codes and let it surface as a plausible neighbor
    df.withColumn("_nvec",
      when(n > 0, transform(col(vecCol), x => x.cast("double") / n))
        .otherwise(transform(col(vecCol), _ => lit(0.0))))
  }

  /** Bounded deterministic training sample: the id-smallest `n` vectors,
    * collected to the driver as double arrays. Quantizer training only
    * ever sees this sample, so training cost is independent of corpus
    * size; the full-corpus work (encode/assign) stays distributed. */
  private def collectSample(df: DataFrame, vecCol: String, n: Int): Array[Array[Double]] =
    df.orderBy(col("neighbor_id")).limit(n).select(col(vecCol))
      .collect().map(_.getSeq[Double](0).toArray)

  /** Train per-subspace codebooks and encode every row of `c0` (must carry
    * `_nvec`; `passthrough` columns ride into the codes table).
    *
    * Codebook training: ksub centroids need only a bounded sample and a
    * handful of Lloyd iterations — seeded LocalKMeans on the collected
    * sample (microseconds of arithmetic; the previous m serial MLlib fits
    * were ~5 s of pure scheduler overhead at ANY corpus size). The encode
    * pass covers the full corpus in ONE codegen'd projection (PqEncode);
    * codes ride as one array<int> column. */
  private def buildPqIndex(c0: DataFrame, m: Int, ksub: Int, seed: Long,
                           passthrough: Seq[String],
                           sharedSample: Option[Array[Array[Double]]] = None): PqIndex = {
    // IVF-PQ already collected the identical _nvec sample for the coarse
    // quantizer — reuse it instead of a second distributed top-k collect
    val sample = sharedSample.getOrElse(collectSample(c0, "_nvec", 4096))
    require(sample.nonEmpty, "PQ quantizer training needs a non-empty corpus sample")
    val dims = sample.head.length
    require(dims % m == 0, s"dims=$dims must divide into m=$m subspaces")
    val dsub = dims / m
    val codebooks = Array.tabulate(m) { j =>
      LocalKMeans.fit(sample.map(v => java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub)),
        ksub, maxIter = 5, seed = seed + j)
    }
    val coded = c0.select((Seq(col("neighbor_id"),
      graft.functions.PqFunctions.pqEncode(col("_nvec"), codebooks).as("codes"))
      ++ passthrough.map(col)): _*)
    PqIndex(coded, codebooks, m, ksub, dsub)
  }

  /** Per-query ADC lookup tables: lut[j·ksub + c] = <query_sub_j,
    * centroid_{j,c}> (flat array<double> — one primitive lookup per
    * subspace in the scorer). Queries are the small side — LUTs are
    * computed on the driver and broadcast; scoring a corpus vector is
    * then m lookups + adds. */
  private def queryLuts(queries: DataFrame, idx: PqIndex,
                        idCol: String, vecCol: String): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val rows = withNormalized(queries.select(col(idCol).as("query_id"), col(vecCol)), vecCol)
      .select(col("query_id"), col("_nvec")).collect()
      .map { r =>
        val v = r.getSeq[Double](1).toArray
        val lut = new Array[Double](idx.m * idx.ksub)
        var j = 0
        while (j < idx.m) {
          var c = 0
          while (c < idx.ksub) {
            val cen = idx.codebooks(j)(c)
            var acc = 0.0; var i = 0
            while (i < idx.dsub) { acc += v(j * idx.dsub + i) * cen(i); i += 1 }
            lut(j * idx.ksub + c) = acc; c += 1
          }
          j += 1
        }
        org.apache.spark.sql.Row(r.get(0), lut.toSeq)
      }
    // keep the id's ORIGINAL type — every other ANN path supports
    // string/UUID ids, and .toString.toLong crashed on them
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("query_id",
          queries.schema(idCol).dataType),
        org.apache.spark.sql.types.StructField("lut",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))))
  }

  /** Codegen'd ADC score column over (codes, flat lut). */
  private def adcScore(idx: PqIndex) =
    graft.functions.PqFunctions.adcScore(col("codes"), col("lut"), idx.m, idx.ksub)

  /** PQ-lite (product quantization) ANN — the 100 TB compression path:
    * vectors split into `m` subvectors, each subspace k-means-quantized
    * to `ksub` centroids (MLlib, seeded), every vector stored as m small
    * integer codes (m bytes at ksub<=256 — a 64-dim float vector shrinks
    * 32×). Queries never touch raw corpus vectors: each query precomputes
    * an m×ksub inner-product lookup table against the (tiny, broadcast)
    * codebook, and scoring a corpus vector is m table lookups + adds
    * (asymmetric distance computation). Vectors are L2-normalized first
    * so inner product ≡ cosine.
    *
    * Returns (query_id, neighbor_id, score, rank) like the other ANN
    * paths — approximate scores, recall controlled by m/ksub (ScalaTest
    * checks recall vs brute force; the quantizer decisions export as
    * an oracle fixture — see [[pqTopKWithDecisions]]). */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
             m: Int = 8, ksub: Int = 16, seed: Long = 42L,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    pqTopKWithDecisions(corpus, queries, k, m, ksub, seed, idCol, vecCol)._1

  /** [[pqTopK]] + DECISION EXPORT from ONE trained quantizer: returns
    * (top-k, the coded corpus (neighbor_id, codes), codebook rows
    * (j, c, vec)) — what lets the declared query hand the quantizer's
    * decisions to an external oracle that replays the whole ADC
    * scoring/ranking declaratively (the ann_ivf_topk fixture pattern
    * extended to PQ). */
  def pqTopKWithDecisions(corpus: DataFrame, queries: DataFrame, k: Int,
                          m: Int = 8, ksub: Int = 16, seed: Long = 42L,
                          idCol: String = "vec_id", vecCol: String = "embedding")
      : (DataFrame, DataFrame, Seq[(Int, Int, Seq[Double])]) = {
    val c0 = withNormalized(graft.operators.ScaleOut.forCompute(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol)), "neighbor_id"), vecCol)
    val idx = buildPqIndex(c0, m, ksub, seed, passthrough = Seq.empty)
    val scored = idx.coded.crossJoin(broadcast(queryLuts(queries, idx, idCol, vecCol)))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), round(adcScore(idx), 4).as("score"))
    val cb = for (j <- 0 until m; c <- 0 until ksub)
      yield (j, c, idx.codebooks(j)(c).toSeq)
    (topKPerQuery(scored, k, corpus.schema(idCol).dataType),
      idx.coded.select(col("neighbor_id"), col("codes")), cb)
  }

  /** PQ ANN with an EXACT re-rank: ADC ranks a candidate pool of
    * k·poolFactor neighbors per query from the m-byte codes, then only
    * that pool is re-scored with exact cosine against raw vectors (the
    * standard two-stage serving shape — quantized first pass, exact
    * second pass over a bounded candidate set). The re-rank join
    * broadcasts the candidate list (|Q|·k·poolFactor rows), so the
    * corpus is scanned once and never shuffled. When the ADC pool
    * contains the true top-k (measured deterministically per corpus —
    * the declared gate uses m=16/ksub=128/poolFactor=16, worst true-top-5
    * ADC rank 25 vs pool 80; spec-checked against brute force), the output is
    * BIT-IDENTICAL to bruteForceTopK and carries the same SQL oracle;
    * recall at scale degrades gracefully with quantization error rather
    * than cliff-dropping, because only ranks k..k·poolFactor can hide a
    * true neighbor. */
  def pqTopKRefined(corpus: DataFrame, queries: DataFrame, k: Int,
                    poolFactor: Int = 4, m: Int = 8, ksub: Int = 16, seed: Long = 42L,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cands = pqTopK(corpus, queries, k * poolFactor, m, ksub, seed, idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"))
    val c = graft.operators.ScaleOut.forCompute(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("vec")), "neighbor_id")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
    val scored = c.join(broadcast(cands), "neighbor_id")
      .join(broadcast(q), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("vec"), col("query_vec")), 4).as("score"))
    topKPerQuery(scored, k, corpus.schema(idCol).dataType)
  }

  /** IVF-PQ — the composed billion-scale serving layout: the corpus is
    * partitioned into `nlist` coarse cells (IVF) AND stored as PQ codes;
    * a query probes its `nprobe` nearest cells and ADC-scores only those
    * cells\' codes. Touches nprobe/nlist of a corpus that is itself ~32×
    * smaller than raw vectors — at warehouse scale the codes table is
    * bucketed by cell id, so a probe is a bucket-pruned scan of m-byte
    * codes with a broadcast LUT, no raw vectors anywhere on the read
    * path. Recall is governed by (nprobe, m, ksub); ScalaTest checks it
    * against brute force. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                nlist: Int = 16, nprobe: Int = 4, m: Int = 8, ksub: Int = 16,
                seed: Long = 42L,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    ivfPqTopKWithDecisions(corpus, queries, k, nlist, nprobe, m, ksub,
      seed, idCol, vecCol)._1

  /** [[ivfPqTopK]] + DECISION EXPORT from one trained quantizer pair:
    * (top-k, coded corpus (cell, neighbor_id, codes), PQ codebook rows,
    * query probe pairs) — the oracle-fixture form (see
    * [[pqTopKWithDecisions]]). */
  def ivfPqTopKWithDecisions(corpus: DataFrame, queries: DataFrame, k: Int,
                             nlist: Int = 16, nprobe: Int = 4,
                             m: Int = 8, ksub: Int = 16, seed: Long = 42L,
                             idCol: String = "vec_id",
                             vecCol: String = "embedding")
      : (DataFrame, DataFrame, Seq[(Int, Int, Seq[Double])], DataFrame) = {
    val c0 = withNormalized(graft.operators.ScaleOut.forCompute(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol)), "neighbor_id"), vecCol)
    val sample = collectSample(c0, "_nvec", 4096)
    val coarse = LocalKMeans.fit(sample, nlist, maxIter = 5, seed = seed)
    val withCell = c0.withColumn("cell",
      graft.functions.PqFunctions.nearestCentroid(col("_nvec"), coarse))
    val idx = buildPqIndex(withCell, m, ksub, seed, passthrough = Seq("cell"),
      sharedSample = Some(sample))

    // nprobe nearest cells per query (assignment-metric ranking)
    val qn = withNormalized(queries.select(col(idCol).as("query_id"), col(vecCol)), vecCol)
    val probes = probeCells(qn, coarse, nprobe)

    val scored = idx.coded
      .join(broadcast(probes.join(queryLuts(queries, idx, idCol, vecCol), "query_id")),
            Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), round(adcScore(idx), 4).as("score"))
    val cb = for (j <- 0 until m; c <- 0 until ksub)
      yield (j, c, idx.codebooks(j)(c).toSeq)
    (topKPerQuery(scored, k, corpus.schema(idCol).dataType),
      idx.coded.select(col("cell"), col("neighbor_id"), col("codes")),
      cb, probes)
  }

  // ---------------- persisted serving index (IVF-PQ × catalog) ----------------

  /** Build the IVF-PQ index ONCE as catalog tables — the serving form:
    *  - `{prefix}_codes`: (cell, neighbor_id, codes array<int>) written
    *    range-clustered by cell, so the manifest column bounds
    *    (GraftCatalog stats pruning) let a probe read only the files
    *    holding its cells;
    *  - `{prefix}_centroids`: the coarse centroids and PQ codebooks as
    *    rows (kind, j, c, vec) — tiny, collected at serve time.
    * Build cost (training + full-corpus encode + distributed write) is
    * paid once; serving never touches raw vectors again. Re-running
    * replaces both tables atomically (commitReplace). */
  def buildIvfPqIndexTables(cat: graft.catalog.GraftCatalog, ns: String, prefix: String,
                            corpus: DataFrame, nlist: Int = 16, m: Int = 8, ksub: Int = 16,
                            seed: Long = 42L,
                            idCol: String = "vec_id", vecCol: String = "embedding",
                            codesProps: Map[String, String] = Map.empty): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val c0 = withNormalized(graft.operators.ScaleOut.forCompute(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol)), "neighbor_id"), vecCol)
    val sample = collectSample(c0, "_nvec", 4096)
    val coarse = LocalKMeans.fit(sample, nlist, maxIter = 5, seed = seed)
    val withCell = c0.withColumn("cell",
      graft.functions.PqFunctions.nearestCentroid(col("_nvec"), coarse))
    val idx = buildPqIndex(withCell, m, ksub, seed, passthrough = Seq("cell"),
      sharedSample = Some(sample))

    val centroidRows =
      coarse.zipWithIndex.map { case (v, i) => ("coarse", 0, i, v.toSeq) } ++
      (for (j <- 0 until m; c <- 0 until ksub)
        yield ("pq", j, c, idx.codebooks(j)(c).toSeq))
    Seq(s"${prefix}_codes", s"${prefix}_centroids").foreach { t =>
      if (!cat.tableExists(ns, t)) cat.createTable(ns, t)
    }
    // build-time quantization-error baseline (drift denominator) — one
    // more pass over the corpus the build already scans twice
    val baseErr = Option(withCell
        .agg(org.apache.spark.sql.functions.avg(cellDist2(coarse))).head().get(0))
      .map(_.asInstanceOf[Double])
    cat.commitReplace(ns, s"${prefix}_codes",
      idx.coded.select(col("cell"), col("neighbor_id"), col("codes"))
        .repartitionByRange(math.max(1, nlist / 4), col("cell")),
      propsSet = codesProps ++
        baseErr.map(e => AnnBaseErrProp -> e.toString),
      // a REBUILD over an existing index must clear the old quantizer's
      // last-batch error, or ivfPqDrift reports a stale cross-quantizer
      // ratio right after the rebuild the monitor scheduled — and the
      // monitoring loop schedules another useless one
      propsUnset = Seq(AnnLastErrProp))
    cat.commitReplace(ns, s"${prefix}_centroids",
      centroidRows.toSeq.toDF("kind", "j", "c", "vec"))
  }

  /** Load the (coarse centroids, PQ codebooks) of a persisted index from
    * its tiny `{prefix}_centroids` table — driver-scale by construction
    * (nlist + m·ksub rows). */
  private def loadIndexMeta(cat: graft.catalog.GraftCatalog, ns: String,
                            prefix: String): (Array[Array[Double]], PqIndex) = {
    import cat.spark.implicits._
    val cent = cat.read(ns, s"${prefix}_centroids")
      .select(col("kind"), col("j"), col("c"), col("vec"))
      .as[(String, Int, Int, Seq[Double])].collect()
    val coarse = cent.filter(_._1 == "coarse").sortBy(_._3).map(_._4.toArray)
    val pqRows = cent.filter(_._1 == "pq")
    val m = pqRows.map(_._2).max + 1
    val ksub = pqRows.map(_._3).max + 1
    val byKey = pqRows.map(r => (r._2, r._3) -> r._4).toMap
    val codebooks = Array.tabulate(m, ksub)((j, c) => byKey((j, c)).toArray)
    val dsub = codebooks(0)(0).length
    (coarse, PqIndex(coded = null, codebooks = codebooks, m = m, ksub = ksub, dsub = dsub))
  }

  /** Append a new vector batch to a persisted IVF-PQ index WITHOUT
    * retraining — the production freshness path. The batch is assigned
    * to the EXISTING coarse cells and encoded with the EXISTING
    * codebooks (both loaded from the centroids table), and the codes
    * land as ONE append commit, cell-clustered like the original build
    * so manifest-stats pruning keeps working across old and new files
    * alike. Cost is O(batch): no corpus rescan, no quantizer training,
    * and the serving path needs no change to see the new vectors.
    * Quantization error for the batch is governed by how well the
    * original training sample covers it — periodic re-builds
    * ([[buildIvfPqIndexTables]]) re-train when drift accumulates, the
    * same freshness/rebuild split every production ANN system runs.
    *
    * Pass a stable `commitId` (batch id, stream epoch) to make retries
    * idempotent: a replayed append with an already-committed id raises
    * DuplicateCommitException instead of double-inserting the batch —
    * duplicate codes rows would silently burn top-k slots at serve
    * time. A batch whose vector width does not match the index throws
    * (NearestCentroid assigns it no cell) rather than committing an
    * empty or partial batch that monitoring would read as success. */
  def appendToIvfPqIndex(cat: graft.catalog.GraftCatalog, ns: String, prefix: String,
                         batch: DataFrame, commitId: Option[String] = None,
                         idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    import cat.spark.implicits._
    val (coarse, idx) = loadIndexMeta(cat, ns, prefix)
    val enriched = withNormalized(
        batch.select(col(idCol).as("neighbor_id"), col(vecCol)), vecCol)
      .withColumn("cell",
        graft.functions.PqFunctions.nearestCentroid(col("_nvec"), coarse))
    val assigned = enriched.select(col("cell"), col("neighbor_id"),
      graft.functions.PqFunctions.pqEncode(col("_nvec"), idx.codebooks).as("codes"))
    // width-mismatched vectors assign a null cell by NearestCentroid's
    // contract; committing them would create unreachable rows, and
    // silently dropping them would report success for a batch that was
    // never indexed — count both sides and fail loudly on any mismatch
    // (the same pass records the drift numerator)
    val (nIn, nOk, errAvg) = enriched.agg(count(lit(1)), count(col("cell")),
        org.apache.spark.sql.functions.avg(cellDist2(coarse)))
      .as[(Long, Long, Option[Double])].head()
    require(nOk == nIn,
      s"$nIn-row batch has ${nIn - nOk} vectors whose width does not match " +
        s"index $ns.$prefix (dims=${idx.m * idx.dsub}) — refusing a partial append")
    cat.commitAppend(ns, s"${prefix}_codes",
      assigned.repartitionByRange(math.max(1, coarse.length / 4), col("cell")),
      commitId = commitId,
      propsSet = errAvg.map(e => AnnLastErrProp -> e.toString).toMap)
  }

  /** Base-table identity + staleness watermark recorded on a persisted
    * index's codes table — the serving index follows table commits like
    * a materialized view ([[refreshIvfPqIndex]]). */
  val AnnBaseProp = "graft.ann.base"
  val AnnBaseSeqProp = "graft.ann.base-seq"
  /** Build-time baseline and last-batch quantization error (mean squared
    * L2 to the assigned coarse centroid, normalized vectors) — the DRIFT
    * signal for the freshness/rebuild split. */
  val AnnBaseErrProp = "graft.ann.base-err"
  val AnnLastErrProp = "graft.ann.last-batch-err"
  /** Build parameters recorded on the codes table (`nlist m ksub seed`
    * and `idCol vecCol`) — what lets [[maintainIvfPqIndex]] re-train
    * with the ORIGINAL configuration when the drift monitor fires,
    * instead of asking the caller to re-supply build-time knobs. */
  val AnnParamsProp = "graft.ann.params"
  val AnnColsProp = "graft.ann.cols"

  /** Squared L2 distance from `_nvec` to its assigned coarse centroid —
    * the per-row quantization error (HOF form; runs over batch-sized
    * frames only). */
  private def cellDist2(coarse: Array[Array[Double]]): Column = {
    val centLit = org.apache.spark.sql.functions.typedLit(
      coarse.map(_.toSeq).toSeq)
    aggregate(zip_with(col("_nvec"),
        org.apache.spark.sql.functions.element_at(centLit, col("cell") + 1),
        (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, v) => acc + v)
  }

  /** Quantization-drift ratio of a persisted index: last refresh/append
    * batch's mean error over the build-time baseline. ~1.0 = incoming
    * data still fits the frozen quantizers; sustained >> 1 (rule of
    * thumb 1.5) = schedule a [[buildIvfPqIndexForTable]] rebuild — the
    * standard freshness/retrain split every production ANN deployment
    * monitors. None until both sides are recorded. */
  def ivfPqDrift(cat: graft.catalog.GraftCatalog, ns: String,
                 prefix: String): Option[Double] = {
    val props = cat.tableProperties(ns, s"${prefix}_codes")
    for {
      b <- props.get(AnnBaseErrProp).map(_.toDouble) if b > 0
      l <- props.get(AnnLastErrProp).map(_.toDouble)
    } yield l / b
  }

  /** [[buildIvfPqIndexTables]] over a CATALOG base table, pinning the
    * read to one version and recording it as the codes table's
    * staleness WATERMARK (state + watermark in the same snapshot) —
    * what makes the index changefeed-refreshable. */
  def buildIvfPqIndexForTable(cat: graft.catalog.GraftCatalog, ns: String,
                              prefix: String, baseNs: String, baseName: String,
                              nlist: Int = 16, m: Int = 8, ksub: Int = 16,
                              seed: Long = 42L, idCol: String = "vec_id",
                              vecCol: String = "embedding"): Unit = {
    val head = cat.latest(baseNs, baseName).getOrElse(
      throw new IllegalStateException(
        s"$baseNs.$baseName has no committed version to index"))
    buildIvfPqIndexTables(cat, ns, prefix,
      cat.readSnapshotPublic(baseNs, baseName, head), nlist, m, ksub, seed,
      idCol, vecCol,
      codesProps = Map(AnnBaseProp -> s"$baseNs $baseName",
        AnnBaseSeqProp -> head.seq.toString,
        AnnParamsProp -> s"$nlist $m $ksub $seed",
        AnnColsProp -> s"$idCol $vecCol"))
  }

  /** The MAINTENANCE entry point a scheduled/streaming worker calls
    * (round-14, closing the drift loop): one changefeed refresh, then —
    * when the freshly-recorded batch quantization error reads past
    * `driftBound` times the build-time baseline — ONE full re-train at
    * the current head with the original build parameters. The rebuild
    * resets the baseline and clears the last-batch error
    * ([[buildIvfPqIndexTables]]'s propsUnset), so a stable stream never
    * schedules a second rebuild (no rebuild storm); a genuinely shifted
    * distribution re-trains once and the new quantizers serve it.
    * Returns "noop" | "incremental" | "rebuild". */
  def maintainIvfPqIndex(cat: graft.catalog.GraftCatalog, ns: String,
                         prefix: String, driftBound: Double = 1.5): String = {
    val props = cat.tableProperties(ns, s"${prefix}_codes")
    val Array(idCol, vecCol) = props.get(AnnColsProp)
      .map(_.split(" ")).getOrElse(Array("vec_id", "embedding"))
    val path = refreshIvfPqIndex(cat, ns, prefix, idCol, vecCol)
    if (path == "noop") return path
    ivfPqDrift(cat, ns, prefix) match {
      case Some(d) if d >= driftBound =>
        val base = props.getOrElse(AnnBaseProp, return path)
        val Array(bns, bt) = base.split(" ")
        // refuse-loud, never guess: a pre-round-14 index records no
        // build parameters, and a silent default rebuild would retrain
        // at the wrong nlist/m/ksub — permanently degraded recall and a
        // changed code width with a 200-shaped success
        val Array(nlist, m, ksub, seed) = props.get(AnnParamsProp)
          .map(_.split(" ")).getOrElse(throw new IllegalStateException(
            s"index $ns.$prefix records no $AnnParamsProp (built before " +
              "the parameter-recording build) — drift passed the bound " +
              f"($d%.2f >= $driftBound); rebuild explicitly via " +
              "buildIvfPqIndexForTable with the original parameters"))
        buildIvfPqIndexForTable(cat, ns, prefix, bns, bt,
          nlist.toInt, m.toInt, ksub.toInt, seed.toLong, idCol, vecCol)
        "rebuild"
      case _ => path
    }
  }

  /** CDC-driven refresh of a persisted IVF-PQ index (round-13): follow
    * the base table's changefeed from the recorded watermark — inserts
    * assign to the EXISTING cells and encode with the EXISTING
    * codebooks (O(batch), no retraining), deletes purge their ids from
    * the codes table — and publish batch + new watermark as ONE
    * commitCdcApply snapshot (an UPDATE's delete+insert halves resolve
    * through its key-purge ordering). This is the serving story a
    * 100 TB corpus needs: the index tracks table commits like an MV,
    * paying O(delta) per refresh, with the same deterministic-commitId
    * idempotence as any cdc batch; with the segmented changefeed,
    * base-table compaction between refreshes stays O(delta) too.
    * Freshness vs drift split is [[appendToIvfPqIndex]]'s: quantizers
    * never retrain here — schedule periodic full rebuilds. Returns
    * "noop" or "incremental"; an expired changefeed window surfaces as
    * the underlying read error (rebuild via
    * [[buildIvfPqIndexForTable]]). */
  def refreshIvfPqIndex(cat: graft.catalog.GraftCatalog, ns: String,
                        prefix: String, idCol: String = "vec_id",
                        vecCol: String = "embedding"): String = {
    import cat.spark.implicits._
    val codesT = s"${prefix}_codes"
    val props = cat.tableProperties(ns, codesT)
    val base = props.getOrElse(AnnBaseProp, throw new IllegalArgumentException(
      s"$ns.$codesT records no $AnnBaseProp — build with buildIvfPqIndexForTable"))
    val Array(bns, bt) = base.split(" ")
    val fromSeq = props(AnnBaseSeqProp).toLong
    val headSeq = cat.latest(bns, bt).map(_.seq).getOrElse(-1L)
    if (headSeq == fromSeq) return "noop"
    // the insert filter, the delete-key distinct AND the width/drift
    // probe below each re-execute the changefeed plan — a maintenance-
    // crossing segmented window would pay its MoR scans and anti-joins
    // 3-4x per refresh; checkpoint ONCE (same reason the MV refresh
    // does)
    val changes = cat.changesBetween(bns, bt, fromSeq, headSeq)
      .localCheckpoint()
    val (coarse, idx) = loadIndexMeta(cat, ns, prefix)
    val ins = changes.filter(col("_change_type") === "insert")
    val delKeys = changes.filter(col("_change_type") === "delete")
      .select(col(idCol).as("neighbor_id")).distinct()
    val enriched = withNormalized(
        ins.select(col(idCol).as("neighbor_id"), col(vecCol)), vecCol)
      .withColumn("cell",
        graft.functions.PqFunctions.nearestCentroid(col("_nvec"), coarse))
    val assigned = enriched.select(col("cell"), col("neighbor_id"),
      graft.functions.PqFunctions.pqEncode(col("_nvec"), idx.codebooks).as("codes"))
    // ONE batch pass answers the width guard (same loud refusal as
    // appendToIvfPqIndex: a mismatched batch must never land unreachable
    // rows or report a partial success) AND the drift numerator
    val (nIn, nOk, errAvg) = enriched.agg(count(lit(1)), count(col("cell")),
        org.apache.spark.sql.functions.avg(cellDist2(coarse)))
      .as[(Long, Long, Option[Double])].head()
    require(nOk == nIn,
      s"$nIn-row delta has ${nIn - nOk} vectors whose width does not match " +
        s"index $ns.$prefix (dims=${idx.m * idx.dsub}) — refusing a partial refresh")
    cat.commitCdcApply(ns, codesT,
      assigned.repartitionByRange(math.max(1, coarse.length / 4), col("cell")),
      delKeys, keyCols = Seq("neighbor_id"),
      commitId = Some(s"annrefresh-$fromSeq-$headSeq"),
      propsSet = Map(AnnBaseSeqProp -> headSeq.toString) ++
        errAvg.map(e => AnnLastErrProp -> e.toString)): Unit
    "incremental"
  }

  /** Coarse-cell assignment of `df` under a PERSISTED index's
    * centroids — (idCol, cell). What [[semDeDupIncremental]] restricts
    * candidates with; exposed so oracle fixtures can export the exact
    * decision the engine made. */
  def ivfCellAssignments(cat: graft.catalog.GraftCatalog, ns: String,
                         prefix: String, df: DataFrame,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame = {
    val (coarse, _) = loadIndexMeta(cat, ns, prefix)
    withNormalized(df.select(col(idCol), col(vecCol)), vecCol)
      .select(col(idCol),
        graft.functions.PqFunctions.nearestCentroid(col("_nvec"), coarse)
          .as("cell"))
  }

  /** Incremental SemDeDup against the ADMITTED corpus (round-14): which
    * vectors of an incoming batch have a semantic near-dup
    * (cosine >= tau) among the corpus a persisted IVF(-PQ) index covers
    * — the admission gate a streaming ingest runs BEFORE committing a
    * batch, without recomputing pairs over corpus ∪ batch.
    *
    * Candidates restrict to the batch vector's coarse CELL (the
    * production SemDeDup recipe's within-cell rule, Abbas et al. 2023),
    * read from the index's materialized codes table; scoring is EXACT
    * cosine against the base table's raw vectors at the index's
    * recorded watermark (PQ codes only restrict, never score). Scale
    * shape: assign O(batch), candidate join = codes scan x broadcast
    * batch cells, then ONE column-pruned corpus vector scan joined to
    * the broadcast candidate ids — O(batch · cellSize) scored pairs.
    * A batch whose vector width does not match the index refuses
    * loudly (every row would silently admit otherwise). Output:
    * (incoming_id, existing_id, cosine), threshold applied on the
    * 4-decimal rounded score (cross-engine replayable). */
  def semDeDupIncremental(cat: graft.catalog.GraftCatalog, ns: String,
                          prefix: String, batch: DataFrame, tau: Double,
                          idCol: String = "vec_id",
                          vecCol: String = "embedding"): DataFrame = {
    import cat.spark.implicits._
    val (coarse, _) = loadIndexMeta(cat, ns, prefix)
    val props = cat.tableProperties(ns, s"${prefix}_codes")
    val base = props.getOrElse(AnnBaseProp, throw new IllegalArgumentException(
      s"$ns.${prefix}_codes records no $AnnBaseProp — build with " +
        "buildIvfPqIndexForTable"))
    val Array(bns, bt) = base.split(" ")
    val wm = props(AnnBaseSeqProp).toLong
    val snap = cat.snapshots(bns, bt).find(_.seq == wm).getOrElse(
      throw new IllegalStateException(
        s"index watermark v$wm of $bns.$bt expired — rebuild the index"))
    val qn = withNormalized(
        batch.select(col(idCol).as("incoming_id"), col(vecCol)), vecCol)
      .withColumn("cell",
        graft.functions.PqFunctions.nearestCentroid(col("_nvec"), coarse))
      .select(col("incoming_id"), col("cell"), col(vecCol).as("__qvec"))
      .localCheckpoint() // width guard + candidate join share one pass
    val (nIn, nOk) = qn.agg(count(lit(1)), count(col("cell")))
      .as[(Long, Long)].head()
    require(nOk == nIn,
      s"$nIn-row batch has ${nIn - nOk} vectors whose width does not " +
        s"match index $ns.$prefix — refusing (they would silently admit)")
    val cand = cat.read(ns, s"${prefix}_codes")
      .select(col("cell"), col("neighbor_id").as("existing_id"))
      .join(broadcast(qn), Seq("cell"))
      .filter(col("existing_id") =!= col("incoming_id"))
      .select(col("incoming_id"), col("existing_id"), col("__qvec"))
    val corpus = cat.readSnapshotPublic(bns, bt, snap)
      .select(col(idCol).as("existing_id"), col(vecCol).as("__cvec"))
    corpus.join(broadcast(cand), Seq("existing_id"))
      .select(col("incoming_id"), col("existing_id"),
        round(cosine(col("__qvec"), col("__cvec")), 4).as("cosine"))
      .filter(col("cosine") >= tau)
  }

  /** Serve top-k from the persisted index: centroids/codebooks load from
    * the tiny `{prefix}_centroids` table, per-query LUTs and probe cells
    * compute driver-side (broadcast), and the only distributed work is a
    * stats-pruned scan of the m-byte codes restricted to the probed cell
    * range — no raw corpus vectors anywhere on the read path. Same seed
    * + same corpus ⇒ results identical to the in-memory ivfPqTopK
    * composition (spec-asserted). */
  def servePqTopK(cat: graft.catalog.GraftCatalog, ns: String, prefix: String,
                  queries: DataFrame, k: Int, nprobe: Int = 4,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val (coarse, idx) = loadIndexMeta(cat, ns, prefix)

    val qn = withNormalized(queries.select(col(idCol).as("query_id"), col(vecCol)), vecCol)
    val probes = probeCells(qn, coarse, nprobe)
    val probedCellIds = probes.select("cell").distinct().as[Int].collect()
    if (probedCellIds.isEmpty) { // no queries -> empty result, same shape
      return topKPerQuery(
        spark.emptyDataset[(Long, Long, Double)].toDF("query_id", "neighbor_id", "score"),
        k, queries.schema(idCol).dataType)
    }

    // manifest-stats coarse prune: only files whose cell range intersects
    // the probed span are read at all (files are cell-clustered at build)
    val codes = cat.readWhere(ns, s"${prefix}_codes", "cell",
        Some(probedCellIds.min.toString), Some(probedCellIds.max.toString))
    val scored = codes
      .join(broadcast(probes.join(queryLuts(queries, idx, idCol, vecCol), "query_id")),
            Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), round(adcScore(idx), 4).as("score"))
    topKPerQuery(scored, k, queries.schema(idCol).dataType)
  }

  /** LSH-bucketed ANN: corpus and queries bucketed identically; neighbors
    * searched only within the query's bucket. Returns ranked matches per
    * query (subset recall vs brute force — tune `planes` down for more
    * recall, up for more speed). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, planes: Int = 8,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = graft.operators.ScaleOut.forCompute(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("vec"),
        lshBucket(col(vecCol), planes).as("bucket")), "neighbor_id")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"),
                           lshBucket(col(vecCol), planes).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("vec"), col("query_vec")), 4).as("score"))
    topKPerQuery(scored, k, corpus.schema(idCol).dataType)
  }

  /** Deterministic fixed-iteration Lloyd k-means over the embedding
    * column — the domain-discovery / corpus-partitioning step a
    * training pipeline runs before per-cluster dedup (SemDeDup's
    * clustering stage) or mixture balancing.
    *
    * Determinism (so a second engine can replay it exactly): initial
    * centroids are the `k` lowest-id vectors; assignment is argmin of
    * squared L2 with ties to the lower centroid index; recomputed means
    * round to 6 decimals each iteration, which quantizes away
    * sum-order float noise far below the rounding bin. `iters` full
    * {assign, update} rounds run, then the returned assignment is
    * against the final centroids.
    *
    * Scale shape: centroids are a k×dim driver-scale artifact compiled
    * INTO the scan as codegen'd literals — each iteration is one narrow
    * corpus scan (no join, no corpus shuffle) plus a (k·dim)-row mean
    * aggregation; empty clusters keep their previous centroid. This is
    * the same topology MLlib's k-means runs, minus its sampling-based
    * init (deliberately, for the cross-engine oracle).
    * Output: (idCol, cluster, dist), dist = round(sqrt(d2), 4). */
  def kmeansAssign(corpus: DataFrame, k: Int = 8, iters: Int = 2,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k=$k"); require(iters >= 1, s"iters=$iters")
    val spark = corpus.sparkSession
    import spark.implicits._
    val base = graft.operators.ScaleOut.forCompute(
      corpus.select(col(idCol).as("__id"), col(vecCol).as("__vec"))
        .filter(col("__vec").isNotNull), "__id")
    val init: Array[Array[Double]] = base.orderBy("__id").limit(k)
      .select("__vec").as[Seq[Float]].collect()
      .map(_.toArray.map(_.toDouble))
    require(init.length == k, s"corpus has fewer than k=$k vectors")
    def dist2(c: Array[Double]): Column =
      aggregate(
        zip_with(col("__vec"), typedLit(c.toSeq),
          (x, y) => { val d = x.cast("double") - y; d * d }),
        lit(0.0), (acc, v) => acc + v)
    def assign(centers: Array[Array[Double]]): DataFrame = {
      val dists = array(centers.map(dist2).toIndexedSeq: _*)
      base.withColumn("__dists", dists)
        .withColumn("cluster",
          (array_position(col("__dists"), array_min(col("__dists"))) - 1).cast("int"))
    }
    var centers = init
    for (_ <- 1 to iters) {
      val means = assign(centers)
        .select(col("cluster"), posexplode(col("__vec")))
        .groupBy(col("cluster"), col("pos"))
        .agg(round(avg(col("col").cast("double")), 6).as("m"))
        .collect()
      val next = centers.map(_.clone())
      means.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      centers = next
    }
    assign(centers).select(col("__id").as(idCol), col("cluster"),
      round(sqrt(array_min(col("__dists"))), 4).as("dist"))
  }

  /** Deterministic PCA projection via fixed-iteration power method —
    * the dimension-reduction step an embedding pipeline runs before
    * clustering / ANN indexing (and the whitening stage of SemDeDup
    * variants). Output: (idCol, pc1..pcK), pc_k = round((v−μ)·w_k, 4).
    *
    * Distribution of work: the ONLY corpus-scale computation is the
    * d-vector mean and the d×d second-moment matrix, accumulated per
    * partition (mapPartitions — justified deliberately: the columnar
    * alternative explodes every row into d² cells, multiplying a 100 TB
    * corpus by 4096; a d²-double accumulator per partition collapses to
    * |partitions| rows) and reduced on the driver. Everything after —
    * 64×64 power iteration, deflation — is driver-scale arithmetic, and
    * the projection compiles μ and w_k into ONE corpus scan as literals
    * (no join, same topology as [[kmeansAssign]]).
    *
    * Determinism/engine-portability (the oracle replays all of it in
    * SQL): μ and the covariance entries round to 6 decimals; the power
    * method starts from the exact-representable uniform vector 1/√d
    * when d is a power of 4 (required), runs exactly `iters` rounds,
    * renormalizing and rounding the iterate to 9 decimals each round;
    * the deflation eigenvalue rounds to 6. Every inter-engine sum-order
    * difference sits ~1e-14, far below the tightest rounding bin, so
    * both engines walk identical float paths. Convergence quality is
    * irrelevant to parity: the output is DEFINED as `iters` rounds. */
  def pcaPowerProject(corpus: DataFrame, nComponents: Int = 2, iters: Int = 10,
                      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(nComponents >= 1, s"nComponents=$nComponents")
    require(iters >= 1, s"iters=$iters")
    val spark = corpus.sparkSession
    import spark.implicits._
    val vecs = corpus.select(col(vecCol)).filter(col(vecCol).isNotNull)
      .as[Seq[Float]]
    val dims = vecs.limit(1).collect().headOption
      .getOrElse(throw new IllegalArgumentException(
        "pcaPowerProject: corpus has no non-null vectors")).length
    require(dims > 0, "empty vectors")
    val sqrtD = math.sqrt(dims.toDouble)
    require(sqrtD * sqrtD == dims.toDouble && (dims & (dims - 1)) == 0,
      s"start vector 1/sqrt(d) must be exactly representable: d=$dims")
    // per-partition partial sums: n, Σv, Σ v·vᵀ (upper storage: full d²)
    val partials = vecs.mapPartitions { it =>
      var n = 0L
      val s = new Array[Double](dims)
      val ss = new Array[Double](dims * dims)
      it.foreach { v =>
        require(v.length == dims, s"mixed widths: ${v.length} vs $dims")
        n += 1
        var i = 0
        while (i < dims) {
          val vi = v(i).toDouble
          s(i) += vi
          var j = 0
          while (j < dims) { ss(i * dims + j) += vi * v(j).toDouble; j += 1 }
          i += 1
        }
      }
      Iterator.single((n, s, ss))
    }.collect()
    val n = partials.map(_._1).sum.toDouble
    require(n > 0, "empty corpus")
    def r(x: Double, p: Int): Double = BigDecimal(x)
      .setScale(p, BigDecimal.RoundingMode.HALF_UP).toDouble
    val mu = Array.tabulate(dims)(i => r(partials.map(_._2(i)).sum / n, 6))
    // centered covariance from raw moments against the ROUNDED mean —
    // the algebraic identity the SQL twin computes directly
    val cov = Array.tabulate(dims, dims) { (i, j) =>
      val sij = partials.map(_._3(i * dims + j)).sum
      val si = partials.map(_._2(i)).sum
      val sj = partials.map(_._2(j)).sum
      r(sij / n - mu(i) * (sj / n) - mu(j) * (si / n) + mu(i) * mu(j), 6)
    }
    def powerIterate(c: Array[Array[Double]]): Array[Double] = {
      var w = Array.fill(dims)(1.0 / sqrtD)
      for (_ <- 1 to iters) {
        val u = Array.tabulate(dims)(i => {
          var acc = 0.0; var j = 0
          while (j < dims) { acc += c(i)(j) * w(j); j += 1 }; acc
        })
        val nrm = math.sqrt(u.map(x => x * x).sum)
        require(nrm > 0, "power iteration collapsed to the zero vector")
        w = u.map(x => r(x / nrm, 9))
      }
      w
    }
    val comps = new Array[Array[Double]](nComponents)
    var c = cov
    for (k <- 0 until nComponents) {
      val w = powerIterate(c)
      comps(k) = w
      if (k < nComponents - 1) {
        // deflate: C ← C − λwwᵀ, λ = wᵀCw (both rounded to 6)
        val lam = r(
          (0 until dims).map(i => (0 until dims).map(j => w(i) * c(i)(j) * w(j)).sum).sum, 6)
        val prev = c
        c = Array.tabulate(dims, dims)((i, j) => r(prev(i)(j) - lam * w(i) * w(j), 6))
      }
    }
    val centered = zip_with(col(vecCol), typedLit(mu.toSeq),
      (x, m) => x.cast("double") - m)
    val pcCols = comps.zipWithIndex.map { case (w, k) =>
      round(aggregate(
        zip_with(centered, typedLit(w.toSeq), (x, wi) => x * wi),
        lit(0.0), (acc, v) => acc + v), 4).as(s"pc${k + 1}")
    }
    corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol) +: pcCols.toIndexedSeq: _*)
  }

  /** Per-domain centroid cosine + outlier flag — the curation step that
    * prunes off-topic documents from a labeled/classified corpus: embed,
    * group by domain label, and drop rows whose embedding points away
    * from their domain's mean direction (cos < `threshold`).
    *
    * Centroid = exact per-dimension mean rounded to 6 decimals (the same
    * engine-portability quantization as [[kmeansAssign]]); emitted
    * cosine rounds to 4. The centroid table is |labels|-rows and
    * broadcasts; the corpus is scanned once with one
    * dim-length dot product per row (against ONE centroid, not a
    * pairwise join — the interpreted HOF costs nothing detectable here;
    * the codegen'd expression exists for the pairwise paths).
    * Output: (idCol, labelCol, cos_centroid, is_outlier). */
  def domainOutliers(emb: DataFrame, threshold: Double,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     labelCol: String = "label"): DataFrame = {
    // null labels dropped EXPLICITLY (the centroid join would silently
    // drop them anyway — null never equi-joins null)
    val base = graft.operators.ScaleOut.forCompute(
      emb.filter(col(vecCol).isNotNull && col(labelCol).isNotNull)
        .select(col(idCol), col(labelCol),
          transform(col(vecCol), _.cast("double")).as("__v")), idCol)
    val cents = base
      .select(col(labelCol), posexplode(col("__v")))
      .groupBy(col(labelCol), col("pos"))
      .agg(round(avg(col("col")), 6).as("m"))
      .groupBy(col(labelCol))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        p => p.getField("m")).as("__c"))
    base.join(broadcast(cents), Seq(labelCol))
      .select(col(idCol), col(labelCol),
        round(cosineHof(col("__v"), col("__c")), 4).as("cos_centroid"))
      .withColumn("is_outlier", col("cos_centroid") < threshold)
  }
}
