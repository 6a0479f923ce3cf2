package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Verification / reconciliation joins (SURVEY Y16, G8).
  *
  * Reference: legacy/modules/app/.../StateReconciler.java:65-80 verifies
  * every referenced file exists with the right size before promoting a
  * snapshot; the design doc's 缺口报告 ("gap report") SQL
  * (iceberg-arch-geo-distributed-ha.md:1206-1222) is the batch analogue:
  * a left-anti join for missing files + an inner join for size mismatches.
  *
  * Spark-first: one left-outer join produces both classes in a single
  * shuffle; `promotionSafe` is then a zero-row check (count of defects),
  * which Spark computes without materialising the defect rows.
  */
object StateReconciler {

  /** Defect report: one row per referenced file that is missing from, or
    * inconsistent with, the destination listing. Adds a `defect` column
    * ∈ {missing, size_mismatch}. */
  def defects(manifest: DataFrame, dstStat: DataFrame,
              pathCol: String = "path", sizeCol: String = "size_bytes"): DataFrame = {
    val stat = dstStat.select(col(pathCol), col(sizeCol).as("stat_size"))
    JoinKeys.hashKeyedJoin(manifest, stat, Seq(pathCol), "left_outer")
      .filter(col("stat_size").isNull || col("stat_size") =!= col(sizeCol))
      .withColumn("defect",
        when(col("stat_size").isNull, "missing").otherwise("size_mismatch"))
      .drop("stat_size")
  }

  /** verifyAndPromote guard: true iff no defects — the caller then flips
    * visibility (reference StateReconciler.java:79). */
  def promotionSafe(manifest: DataFrame, dstStat: DataFrame): Boolean =
    defects(manifest, dstStat).isEmpty

  /** L0 sampling verification (doc iceberg-arch-hybrid-replica-dr.md:
    * 148-158, 264-267): verify a sample of k = clamp(ceil(total·p), kMin,
    * kMax) files before paying for a full reconcile. The sample is the k
    * hash-smallest paths (md5) — deterministic, engine-portable, unbiased
    * w.r.t. path structure — and orderBy+limit plans as a distributed
    * TakeOrderedAndProject, not a global sort. `total` costs one count
    * job (metadata scale). */
  def sampledDefects(manifest: DataFrame, dstStat: DataFrame, p: Double,
                     kMin: Int, kMax: Int, pathCol: String = "path",
                     sizeCol: String = "size_bytes"): DataFrame = {
    val total = manifest.count()
    val k = math.min(math.max(math.ceil(total * p).toLong, kMin.toLong), kMax.toLong).toInt
    val sample = manifest.orderBy(md5(col(pathCol)), col(pathCol)).limit(k)
    defects(sample, dstStat, pathCol, sizeCol)
  }
}
