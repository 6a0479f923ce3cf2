package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The Iceberg spec's 32-bit hash (spec §Appendix B: murmur3_x86_32 with
  * SEED 0 over a type-specific byte form) — re-implemented from the
  * published algorithm because compatibility is the point: a foreign
  * Iceberg engine pruning an exported bucket-partitioned table computes
  * exactly this hash, so graft's write-time bucket values must match
  * BIT-FOR-BIT or foreign bucket pruning would silently read the wrong
  * partition. (Spark's own Murmur3Hash uses seed 42 and a non-standard
  * byte layout per type — not interchangeable.)
  *
  * Byte forms (spec): int/date promote to LONG (8 little-endian bytes);
  * long/timestamp-micros are the long itself; string/binary hash their
  * UTF-8 / raw bytes. Spec test vectors pinned in PartitionSpecSuite:
  * hashLong(34) == 2017239379, hashBytes("iceberg") == 1210000089.
  *
  * No companion class → Scala emits STATIC forwarders, so generated
  * (Janino) code calls `graft.functions.IcebergHash.bucketLong(...)`
  * directly. */
object IcebergHash {
  private final val C1 = 0xcc9e2d51
  private final val C2 = 0x1b873593

  @inline private def mixK1(k0: Int): Int = {
    var k1 = k0 * C1
    k1 = Integer.rotateLeft(k1, 15)
    k1 * C2
  }
  @inline private def mixH1(h0: Int, k1: Int): Int = {
    var h1 = h0 ^ k1
    h1 = Integer.rotateLeft(h1, 13)
    h1 * 5 + 0xe6546b64
  }
  @inline private def fmix(h0: Int, len: Int): Int = {
    var h1 = h0 ^ len
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^ (h1 >>> 16)
  }

  /** murmur3_x86_32(little-endian 8 bytes of v, seed 0). */
  def hashLong(v: Long): Int = {
    val lo = (v & 0xffffffffL).toInt      // first 4 LE bytes
    val hi = (v >>> 32).toInt             // last 4 LE bytes
    var h1 = mixH1(0, mixK1(lo))
    h1 = mixH1(h1, mixK1(hi))
    fmix(h1, 8)
  }

  /** murmur3_x86_32 over raw bytes, seed 0 (standard tail handling). */
  def hashBytes(data: Array[Byte]): Int = {
    val len = data.length
    val nblocks = len >>> 2
    var h1 = 0
    var i = 0
    while (i < nblocks) {
      val b = i << 2
      val k = (data(b) & 0xff) | ((data(b + 1) & 0xff) << 8) |
        ((data(b + 2) & 0xff) << 16) | ((data(b + 3) & 0xff) << 24)
      h1 = mixH1(h1, mixK1(k))
      i += 1
    }
    val tail = nblocks << 2
    var k1 = 0
    if ((len & 3) >= 3) k1 ^= (data(tail + 2) & 0xff) << 16
    if ((len & 3) >= 2) k1 ^= (data(tail + 1) & 0xff) << 8
    if ((len & 3) >= 1) { k1 ^= data(tail) & 0xff; h1 ^= mixK1(k1) }
    fmix(h1, len)
  }

  /** Iceberg `bucket[n]`: (hash & Integer.MAX_VALUE) % n. */
  def bucketLong(v: Long, n: Int): Int = (hashLong(v) & Integer.MAX_VALUE) % n
  def bucketBytes(b: Array[Byte], n: Int): Int =
    (hashBytes(b) & Integer.MAX_VALUE) % n
}

/** `bucket[n]` partition transform as a codegen'd Catalyst expression.
  * Input types: integral (promoted to long per the spec), date (days
  * int → long), timestamp (micros long), string (UTF-8 bytes), binary.
  * Deterministic and null-preserving, so it is legal as a
  * repartitionByRange clustering key and as a per-file derived stat. */
case class IcebergBucket(child: Expression, n: Int)
    extends UnaryExpression {
  require(n > 0, s"bucket count must be positive, got $n")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ByteType | ShortType | IntegerType | LongType | DateType |
           TimestampType | TimestampNTZType | StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"iceberg_bucket does not support type ${other.simpleString} " +
            "(spec transforms hash integral/date/timestamp/string/binary)")
    }

  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    case StringType =>
      IcebergHash.bucketBytes(input.asInstanceOf[UTF8String].getBytes, n)
    case BinaryType =>
      IcebergHash.bucketBytes(input.asInstanceOf[Array[Byte]], n)
    case _ => // integral / date-days / timestamp-micros, promoted to long
      IcebergHash.bucketLong(input.asInstanceOf[Number].longValue(), n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case StringType => defineCodeGen(ctx, ev, c =>
        s"graft.functions.IcebergHash.bucketBytes($c.getBytes(), $n)")
      case BinaryType => defineCodeGen(ctx, ev, c =>
        s"graft.functions.IcebergHash.bucketBytes($c, $n)")
      case _ => defineCodeGen(ctx, ev, c =>
        s"graft.functions.IcebergHash.bucketLong((long) $c, $n)")
    }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PartitionFunctions {
  /** Iceberg-spec bucket transform of a column (see [[IcebergBucket]]). */
  def icebergBucket(c: Column, n: Int): Column =
    ColumnBridge.column(IcebergBucket(ColumnBridge.expression(c), n))
}
