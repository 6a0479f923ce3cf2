package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Fixed-iteration PageRank over an edge table — the quality-propagation
  * primitive for duplicate/similarity graphs (rank a cluster's documents
  * by how central they are to the cluster, not just by a scalar score).
  *
  * Reference analog: the reference ranks replica regions by a scored
  * graph of region links (modules/query read-routing); this is the same
  * "score by incoming mass" computation generalized to the document
  * similarity graph.
  *
  * Scale shape:
  *  - per iteration: ONE equi-join (edges ⋈ ranks on src) + ONE
  *    hash-aggregate (sum by dst) + a left join back to the node set —
  *    all shuffle-partitioned on the key, no driver state beyond the
  *    dangling-mass scalar (a 1-row aggregate, like the kmeans centroid
  *    collect);
  *  - the per-edge weight table (1/outdeg) is computed once and
  *    localCheckpoint'ed, so no iteration recomputes the degree agg;
  *  - ranks are localCheckpoint'ed each round: each is read twice (the
  *    contribution join and the dangling aggregate) and the checkpoint
  *    keeps lineage flat — the same discipline clusterNearDups uses;
  *  - iteration count is FIXED (caller-chosen), so the whole run is
  *    iters × (join+agg) jobs, log-free and bounded.
  *
  * Determinism: iterates are rounded to 9 decimals per round (the
  * engine-portability quantization kmeans/PCA use), ids break ties.
  */
object GraphOps {

  /** `edges`: directed (src, dst) — symmetrize first for an undirected
    * graph. `nodes`: one `id` column, the full vertex set (isolated
    * vertices keep receiving the teleport + dangling share). Returns
    * (id, pr) with pr rounded to 9 decimals.
    */
  def pageRank(edges: DataFrame, nodes: DataFrame, iters: Int,
               damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).cast("double").as("__deg"))
    // (src, dst, w = 1/outdeg) — materialized once, reused every round
    // with its hash(src) join-output partitioning preserved by the
    // checkpoint, so the per-round contribution join never re-shuffles it
    val e = edges.join(deg, "src")
      .select(col("src"), col("dst"), (lit(1.0) / col("__deg")).as("w"))
      .localCheckpoint()

    // has-out-edge flag joined ONCE and carried through every round's
    // checkpoint (r15): the dangling-mass scalar then reads as a narrow
    // filter-aggregate over the current checkpoint. Round-16: the vertex
    // COUNT rides the same materialization as an `observe` metric — the
    // separate ids checkpoint + count job of r15 are gone.
    val nObs = org.apache.spark.sql.Observation()
    val ids2 = nodes.select(col("id")).distinct()
      .join(deg.select(col("src").as("id"), lit(true).as("__has_out")), Seq("id"), "left")
      .select(col("id"), coalesce(col("__has_out"), lit(false)).as("__has_out"))
      .observe(nObs, count(lit(1)).as("n"))
      .localCheckpoint()
    val n = nObs.get("n").asInstanceOf[Long].toDouble
    require(n > 0, "empty vertex set")

    // each round's dangling mass (rank held by vertices with no
    // out-edges — one scalar, redistributed uniformly, standard PageRank
    // semantics) is an `observe` metric on the SAME action that
    // materializes the iterate (round-16): the r15 form paid a separate
    // 1-row aggregate job per iteration.
    def checkpointWithDangling(df: DataFrame): (DataFrame, Double) = {
      val obs = org.apache.spark.sql.Observation()
      val ck = df.observe(obs,
        coalesce(sum(when(!col("__has_out"), col("pr"))), lit(0.0)).as("d"))
        .localCheckpoint()
      (ck, obs.get("d").asInstanceOf[Double])
    }
    var (pr, dangling) =
      checkpointWithDangling(ids2.withColumn("pr", round(lit(1.0 / n), 9)))
    for (_ <- 1 to iters) {
      val contrib = e.join(pr, e("src") === pr("id"))
        .groupBy(col("dst"))
        .agg(sum(col("pr") * col("w")).as("__in"))
      val d = dangling
      val next = checkpointWithDangling(
        ids2.join(contrib, ids2("id") === contrib("dst"), "left")
          .select(ids2("id"), ids2("__has_out"),
            round(lit((1.0 - damping) / n) +
              lit(damping) * (coalesce(col("__in"), lit(0.0)) + lit(d / n)),
              9).as("pr")))
      pr = next._1; dangling = next._2
    }
    pr.select(col("id"), col("pr"))
  }

  /** Undirected convenience: every (a,b) pair becomes both directed
    * edges. Pairs must already be deduped (a<b). */
  def symmetrize(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionAll(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))

  /** Per-node triangle counts over an undirected graph given as
    * canonical pairs (id_a < id_b) — the local clustering signal on the
    * similarity graph (a near-dup cluster is triangle-dense; a chain of
    * borderline matches is triangle-free, so the count separates "true
    * duplicate cliques" from transitive-closure accidents before any
    * cluster decision).
    *
    * Algorithm: the compact-forward / node-iterator join with DEGREE
    * ORDERING (Schank & Wagner 2005, public algorithm): orient every
    * edge from the lower (degree, id) endpoint to the higher; each
    * triangle is then found EXACTLY ONCE as a wedge at its ≺-lowest
    * vertex closed by the oriented third edge. The orientation bounds
    * the wedge fan-out per vertex by its ORIENTED out-degree — O(m^1.5)
    * wedges total for any graph — where the naive id-ordered form is
    * quadratic at a hub (a boilerplate doc similar to d others alone
    * fans d²/2 wedges). Three equi-joins + one aggregate, no cartesian,
    * no driver state.
    *
    * Output: (id, triangles) for every vertex in `nodes`, 0 for
    * triangle-free vertices. Deterministic integer counts. */
  def triangleCounts(pairs: DataFrame, nodes: DataFrame,
                     idCol: String = "id"): DataFrame = {
    val raw = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
      .distinct().localCheckpoint()
    val deg = raw.select(col("u").as("id")).unionAll(raw.select(col("v").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val lower = col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v"))
    // (src → dst) with dst's degree carried for the wedge-order compare
    val oriented = raw
      .join(deg.select(col("id").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), "v")
      .select(
        when(lower, col("u")).otherwise(col("v")).as("src"),
        when(lower, col("v")).otherwise(col("u")).as("dst"),
        when(lower, col("dv")).otherwise(col("du")).as("ddst"))
      .localCheckpoint()
    val w1 = oriented.select(col("src"), col("dst").as("x"), col("ddst").as("dx"))
    val w2 = oriented.select(col("src"), col("dst").as("y"), col("ddst").as("dy"))
    val tri = w1.join(w2, "src")
      .filter(col("dx") < col("dy") || (col("dx") === col("dy") && col("x") < col("y")))
      .join(oriented.select(col("src").as("x"), col("dst").as("y")), Seq("x", "y"))
      .select(col("src").as("a"), col("x").as("b"), col("y").as("c"))
    // each triangle credits its three corners: ONE pass over the closure
    // join via explode (round-16) — the previous union of three selects
    // over a localCheckpoint'ed triangle table paid a materialization job
    // plus three scans for the same multiset of ids
    val perNode = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("triangles"))
    nodes.select(col(idCol).as("id")).join(perNode, Seq("id"), "left")
      .select(col("id"), coalesce(col("triangles"), lit(0L)).as("triangles"))
  }

  /** k-core of an undirected graph: the maximal subgraph in which every
    * vertex keeps degree >= k — the standard "dense community vs
    * transitive accident" separator on a similarity graph (a borderline
    * chain of near-dup matches dies in the first peel; a template
    * family's clique survives).
    *
    * Iterative peeling to FIXPOINT: each round drops vertices whose
    * current degree < k, which lowers neighbors' degrees, so the peel
    * cascades. Per round: one degree hash-aggregate + two semi-joins
    * (each edge endpoint against the surviving vertex set) — all
    * shuffle-partitioned on the vertex key, no driver state beyond the
    * edge count that detects the fixpoint. Edge/keep sets are
    * localCheckpoint'ed per round (the clusterNearDups lineage
    * discipline). Rounds are bounded by the peel DEPTH of the graph
    * (≤ vertex count worst-case, tiny in practice); `maxRounds` turns a
    * pathological input into a loud error instead of a silent partial
    * core.
    *
    * Input `pairs`: canonical undirected edges (id_a < id_b), deduped.
    * Output: (id, deg) for core members, deg = degree INSIDE the core. */
  def kCore(pairs: DataFrame, k: Int, maxRounds: Int = 30): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    def degrees(e: DataFrame): DataFrame =
      e.select(col("u").as("id")).unionAll(e.select(col("v").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    // the surviving-edge COUNT rides the round's materialization as an
    // `observe` metric (round-16) — the r15 form paid a separate count
    // job per peel round, and these rounds are tiny-data, so per-round
    // job count IS the cost
    def checkpointCounted(df: DataFrame): (DataFrame, Long) = {
      val obs = org.apache.spark.sql.Observation()
      val ck = df.observe(obs, count(lit(1)).as("n")).localCheckpoint()
      (ck, obs.get("n").asInstanceOf[Long])
    }
    var (edges, nEdges) = checkpointCounted(
      pairs.select(col("id_a").as("u"), col("id_b").as("v"))
        .filter(col("u") =!= col("v")).distinct())
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val keep = degrees(edges).filter(col("deg") >= k)
        .select(col("id")).localCheckpoint()
      val (next, n) = checkpointCounted(edges
        .join(keep.select(col("id").as("u")), Seq("u"), "left_semi")
        .join(keep.select(col("id").as("v")), Seq("v"), "left_semi")
        .select(col("u"), col("v")))
      converged = n == nEdges // edges only ever shrink; equal count = no peel
      edges = next; nEdges = n; round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"kCore did not reach a fixpoint in $maxRounds rounds; raise maxRounds")
    degrees(edges)
  }
}
