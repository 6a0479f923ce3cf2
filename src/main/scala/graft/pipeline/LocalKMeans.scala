package graft.pipeline

/** Seeded Lloyd's k-means over an in-memory sample.
  *
  * ANN quantizer training (IVF coarse cells, PQ subspace codebooks) only
  * ever needs a bounded sample — k·iters·|sample| flops on a few thousand
  * rows is microseconds of arithmetic, while an MLlib fit costs a full
  * distributed job per codebook (the PQ path paid m+1 serial fits, ~5 s
  * of pure scheduler overhead at any data scale). Training stays driver-
  * side BY DESIGN, exactly like the broadcast query LUTs: bounded input,
  * deterministic seed, O(sample) memory; the corpus-sized work (encode /
  * assign) runs distributed through codegen'd expressions
  * (graft.functions.PqEncode / NearestCentroid).
  */
private[graft] object LocalKMeans {

  /** @return k × dim centroids (deterministic for a given seed).
    *         Empty clusters re-seed to the point farthest from its
    *         assigned centroid. */
  def fit(points: Array[Array[Double]], k: Int, maxIter: Int, seed: Long): Array[Array[Double]] = {
    require(points.nonEmpty, "k-means needs a non-empty sample")
    val dim = points.head.length
    val rnd = new scala.util.Random(seed)
    val init = rnd.shuffle(points.indices.toVector).take(k)
    // fewer distinct points than k: cycle (duplicate centroids never win
    // an assignment twice, the empty-cluster rule respreads them)
    val centroids = Array.tabulate(k)(i =>
      points(init(i % init.length)).clone())

    val assign = new Array[Int](points.length)
    var iter = 0
    while (iter < maxIter) {
      var p = 0
      while (p < points.length) {
        assign(p) = nearest(centroids, points(p)); p += 1
      }
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      p = 0
      while (p < points.length) {
        val c = assign(p); counts(c) += 1
        val pt = points(p); var i = 0
        while (i < dim) { sums(c)(i) += pt(i); i += 1 }
        p += 1
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var i = 0
          while (i < dim) { centroids(c)(i) = sums(c)(i) / counts(c); i += 1 }
        } else {
          // farthest point from its own centroid takes over the empty slot
          var worst = 0; var worstD = -1.0
          var q = 0
          while (q < points.length) {
            val d = sqDist(points(q), centroids(assign(q)))
            if (d > worstD) { worstD = d; worst = q }
            q += 1
          }
          centroids(c) = points(worst).clone()
          // claim the point for this slot so the NEXT empty cluster in
          // this same sweep picks a different seed — otherwise every
          // empty slot grabs the identical farthest point and duplicate
          // centroids leave cells permanently empty
          assign(worst) = c
        }
        c += 1
      }
      iter += 1
    }
    centroids
  }

  def nearest(centroids: Array[Array[Double]], p: Array[Double]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val d = sqDist(p, centroids(c))
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var i = 0
    while (i < a.length) { val t = a(i) - b(i); d += t * t; i += 1 }
    d
  }
}
