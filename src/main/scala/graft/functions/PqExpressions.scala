package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Codegen'd quantizer expressions — the distributed half of the ANN
  * index build/serve path (the bounded-sample training half lives in
  * graft.pipeline.LocalKMeans).
  *
  * Centroid/codebook constants ride into generated code as reference
  * objects (flat double[]), so the per-row loops are plain primitive
  * arithmetic inside whole-stage codegen: no MLlib model.transform
  * stages, no interpreted higher-order functions, no boxing.
  */

/** Index of the nearest centroid (squared-L2) — the IVF cell
  * assignment. `flat` is k × dim centroids row-major. Accepts
  * array<float> or array<double> vectors. */
case class NearestCentroid(child: Expression, flat: Array[Double], k: Int, dim: Int)
  extends UnaryExpression {

  private def elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et; case _ => NullType
  }
  override def checkInputDataTypes(): TypeCheckResult = elemType match {
    case FloatType | DoubleType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float|double>")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"
  // null for a vector whose width differs from the quantizer's dim —
  // reading past numElements on UnsafeArrayData would return adjacent
  // buffer bytes and assign a silently wrong cell
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    if (x.numElements() != dim) return null
    val isFloat = elemType == FloatType
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < k) {
      var d = 0.0; var i = 0
      while (i < dim) {
        val xi = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
        val t = xi - flat(c * dim + i); d += t * t; i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("centroids", flat, "double[]")
    val get = if (elemType == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val (c, i, d, t, best, bestD) = (ctx.freshName("c"), ctx.freshName("i"),
        ctx.freshName("d"), ctx.freshName("t"), ctx.freshName("best"), ctx.freshName("bestD"))
      s"""
         |if ($v.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $best = 0; double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      double $t = (double) $v.$get($i) - $cb[$c * $dim + $i];
         |      $d += $t * $t;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $c; }
         |  }
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** L2 distance to the nearest centroid — the companion of
  * NearestCentroid for ball-cover pruning: per-cell radii are
  * max(nearest_centroid_dist) and per-row distances tighten the
  * triangle-inequality candidate bound. Same argmin loop, so the
  * distance always refers to the cell NearestCentroid assigns. */
case class NearestCentroidDist(child: Expression, flat: Array[Double], k: Int, dim: Int)
  extends UnaryExpression {

  private def elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et; case _ => NullType
  }
  override def checkInputDataTypes(): TypeCheckResult = elemType match {
    case FloatType | DoubleType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float|double>")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "nearest_centroid_dist"
  // null on width mismatch — see NearestCentroid
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    if (x.numElements() != dim) return null
    val isFloat = elemType == FloatType
    var bestD = Double.MaxValue
    var c = 0
    while (c < k) {
      var d = 0.0; var i = 0
      while (i < dim) {
        val xi = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
        val t = xi - flat(c * dim + i); d += t * t; i += 1
      }
      if (d < bestD) bestD = d
      c += 1
    }
    math.sqrt(bestD)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("centroids", flat, "double[]")
    val get = if (elemType == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val (c, i, d, t, bestD) = (ctx.freshName("c"), ctx.freshName("i"),
        ctx.freshName("d"), ctx.freshName("t"), ctx.freshName("bestD"))
      s"""
         |if ($v.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      double $t = (double) $v.$get($i) - $cb[$c * $dim + $i];
         |      $d += $t * $t;
         |    }
         |    if ($d < $bestD) $bestD = $d;
         |  }
         |  ${ev.value} = java.lang.Math.sqrt($bestD);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** PQ encode: argmin centroid per subspace → array<int> of m codes.
  * `flat` is m × ksub × dsub codebooks row-major; input is the
  * normalized array<double> vector of length m·dsub. */
case class PqEncode(child: Expression, flat: Array[Double], m: Int, ksub: Int, dsub: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<double>")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"
  // null on width mismatch — see NearestCentroid
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    if (x.numElements() != m * dsub) return null
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        var d = 0.0; var i = 0
        while (i < dsub) {
          val t = x.getDouble(j * dsub + i) - flat((j * ksub + c) * dsub + i)
          d += t * t; i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best; j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("codebooks", flat, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val (j, c, i, d, t, best, bestD, codes) = (ctx.freshName("j"), ctx.freshName("c"),
        ctx.freshName("i"), ctx.freshName("d"), ctx.freshName("t"), ctx.freshName("best"),
        ctx.freshName("bestD"), ctx.freshName("codes"))
      s"""
         |if ($v.numElements() != $m * $dsub) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $codes = new int[$m];
         |  for (int $j = 0; $j < $m; $j++) {
         |    int $best = 0; double $bestD = Double.MAX_VALUE;
         |    for (int $c = 0; $c < $ksub; $c++) {
         |      double $d = 0.0;
         |      for (int $i = 0; $i < $dsub; $i++) {
         |        double $t = $v.getDouble($j * $dsub + $i) - $cb[($j * $ksub + $c) * $dsub + $i];
         |        $d += $t * $t;
         |      }
         |      if ($d < $bestD) { $bestD = $d; $best = $c; }
         |    }
         |    $codes[$j] = $best;
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Asymmetric-distance score: sum_j lut[j·ksub + codes[j]] over a
  * per-query flat LUT column (array<double>, m·ksub) and a per-corpus-row
  * codes column (array<int>, m) — m lookups + adds per scored pair. */
case class AdcScore(left: Expression, right: Expression, m: Int, ksub: Int)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires (array<int> codes, array<double> lut)")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_score"
  // null on shape mismatch — see NearestCentroid
  override def nullable: Boolean = true

  override protected def nullSafeEval(codesAny: Any, lutAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val lut = lutAny.asInstanceOf[ArrayData]
    if (codes.numElements() != m || lut.numElements() != m * ksub) return null
    var acc = 0.0; var j = 0
    while (j < m) { acc += lut.getDouble(j * ksub + codes.getInt(j)); j += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val (j, acc) = (ctx.freshName("j"), ctx.freshName("acc"))
      s"""
         |if ($codes.numElements() != $m || $lut.numElements() != $m * $ksub) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $m; $j++) {
         |    $acc += $lut.getDouble($j * $ksub + $codes.getInt($j));
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Z-order (Morton) interleave of two 32-bit keys into one long — the
  * multi-dimensional clustering key: sorting by the interleaved value
  * keeps rows close in BOTH dimensions, so per-file min/max bounds stay
  * tight on each column simultaneously and manifest stats pruning works
  * for predicates on either column off ONE physical layout (the
  * Delta/Iceberg OPTIMIZE ZORDER idea, expressed as a plain cluster-by
  * column). Inputs are truncated to their low 32 bits. */
case class ZOrder2(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case LongType | IntegerType | ShortType | ByteType => true; case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires integral inputs")
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"

  private def toLongBits(v: Any): Long = v match {
    case l: Long => l; case i: Int => i.toLong
    case s: Short => s.toLong; case b: Byte => b.toLong
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrder2.interleave(toLongBits(a), toLongBits(b))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val z = classOf[ZOrder2].getName.stripSuffix("$")
      s"${ev.value} = $z.interleave((long) $a, (long) $b);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {
  /** Spread the low 32 bits of `v` into the even bit positions. */
  private def spread(v: Long): Long = {
    var x = v & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8))  & 0x00ff00ff00ff00ffL
    x = (x | (x << 4))  & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2))  & 0x3333333333333333L
    x = (x | (x << 1))  & 0x5555555555555555L
    x
  }
  /** Morton-interleave two 32-bit values (a in even bits, b in odd). */
  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
}

object PqFunctions {
  def nearestCentroid(vec: Column, centroids: Array[Array[Double]]): Column =
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(vec),
      centroids.flatten, centroids.length, centroids.head.length))

  def nearestCentroidDist(vec: Column, centroids: Array[Array[Double]]): Column =
    ColumnBridge.column(NearestCentroidDist(ColumnBridge.expression(vec),
      centroids.flatten, centroids.length, centroids.head.length))

  def pqEncode(nvec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(nvec),
      codebooks.flatten.flatten, codebooks.length, codebooks.head.length,
      codebooks.head.head.length))

  def adcScore(codes: Column, flatLut: Column, m: Int, ksub: Int): Column =
    ColumnBridge.column(AdcScore(ColumnBridge.expression(codes),
      ColumnBridge.expression(flatLut), m, ksub))

  /** Morton-interleaved clustering key — commit data sorted by this to
    * get manifest-bounds pruning on BOTH input columns. */
  def zorder2(a: Column, b: Column): Column =
    ColumnBridge.column(ZOrder2(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
