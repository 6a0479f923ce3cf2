package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** MinHash signature as ONE narrow projection.
  *
  * The composable pipeline (explode distinct shingles → groupBy(doc) with
  * numHashes min(xxhash64(seed, s)) aggregates) shuffles one row per
  * (doc, shingle) — millions of rows whose only purpose is to be
  * min-reduced right back to one row per document. This expression
  * computes the same signature per document inside the scan projection:
  * no explode, no shuffle, the dedup pipeline's first wide stage becomes
  * the (tiny) LSH band join.
  *
  * Hash parity: slot j of the signature is exactly
  * `min(xxhash64(lit(j), shingle))` — the per-slot seed is Spark's own
  * XxHash64 chain (seed 42 → int j → string), via XxHash64Function, so
  * signatures are bit-identical to the aggregate form and independent of
  * partitioning/cluster size.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
  extends UnaryExpression {

  require(numHashes >= 1, "numHashes must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string> input")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  // per-slot seeds: xxhash64's fold of (42, j) — precomputed once
  @transient private lazy val seeds: Array[Long] =
    MinHashSignature.slotSeeds(numHashes)

  // null for an empty (or all-null) shingle set — the aggregate reference
  // form emits NO signature row for such docs; an all-MaxValue signature
  // would instead make every empty doc collide in every LSH band
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[ArrayData], seeds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |${ev.value} = graft.functions.MinHashSignature.compute($a, $seedsRef);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {

  private[functions] def slotSeeds(numHashes: Int): Array[Long] =
    Array.tabulate(numHashes)(j =>
      XxHash64Function.hash(j, IntegerType, 42L))

  /** Loops live here as JIT-compiled Scala, invoked from generated code —
    * one virtual call per row, still inside whole-stage codegen. */
  /** Returns null when no non-null shingle exists (see nullable note). */
  def compute(arr: ArrayData, seeds: Array[Long]): ArrayData = {
    val m = seeds.length
    val mins = new Array[Long](m)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    var any = false
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val s = arr.getUTF8String(i)
        var j = 0
        while (j < m) {
          val h = XxHash64Function.hash(s, StringType, seeds(j))
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    if (any) new GenericArrayData(mins) else null
  }
}

object MinHashFunctions {
  /** Signature column: array<long> of numHashes seeded min-hashes. */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(shingles), numHashes))
}
