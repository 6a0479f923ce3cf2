package graft.catalog

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Executor-side single-file parquet writer for [[InternalRow]]s — the
  * write half a DSv2 `BatchWrite` needs (Spark's V1 write bridge covers
  * only INSERT paths; `ReplaceData` / `WriteDelta` physical plans hand
  * each task raw InternalRows). Delegates encoding to Spark's OWN
  * `ParquetWriteSupport`, so files are byte-compatible with what
  * `df.write.parquet` produces — with timestamps pinned to INT64 micros
  * (the catalog's Iceberg-exportable convention, GraftCatalog
  * `withMicrosTimestamps`) independent of any session conf.
  *
  * While writing it tracks, at zero extra IO, exactly the per-file
  * metadata the catalog's commit paths record in manifests: row count
  * plus min/max bounds for every prunable column (same type set as
  * `GraftCatalog.prunableType`; stringified through the same Catalyst
  * `Cast` the staged-stats job's `.cast("string")` uses, so bounds are
  * comparable across both producers). */
private[graft] final class RowParquetWriter(absPath: String,
                                            schema: StructType,
                                            conf: Configuration) {

  private val writer: ParquetWriter[InternalRow] = {
    val c = new Configuration(conf)
    ParquetWriteSupport.setSchema(schema, c)
    // ParquetWriteSupport.init asserts these are present (the file-write
    // path normally inherits them from the session conf via the hadoop
    // conf); values follow the catalog's write convention, NOT whatever
    // the current session happens to have — data files must stay
    // uniform (INT64 micros, no legacy layout, proleptic calendar)
    c.set("spark.sql.parquet.writeLegacyFormat", "false")
    c.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    c.set("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
    c.set("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
    c.set("spark.sql.parquet.fieldId.write.enabled", "true")
    c.set("spark.sql.parquet.variant.annotateLogicalType.enabled", "false")
    new RowParquetWriter.Builder(
      HadoopOutputFile.fromPath(new HPath(absPath), c))
      .withConf(c)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
  }

  private var rows = 0L
  // min/max per prunable field, tracked as CATALYST values (every
  // prunable type is Comparable with catalyst-order semantics: boxed
  // numerics, UTF8String, Boolean, Int days for dates)
  private val statFields: Array[(Int, StructField)] =
    schema.fields.zipWithIndex.collect {
      case (f, i) if GraftCatalog.prunableType(f.dataType) => (i, f)
    }
  private val mins = new Array[Any](statFields.length)
  private val maxs = new Array[Any](statFields.length)

  // UnsafeRow getters return views into reused task buffers — a
  // RETAINED value must be copied or later rows corrupt the bound
  private def retained(v: Any): Any = v match {
    case s: UTF8String => s.clone()
    case d: Decimal => Decimal(d.toJavaBigDecimal)
    case other => other
  }

  private def cmp(a: Any, b: Any): Int =
    a.asInstanceOf[Comparable[Any]].compareTo(b)

  def write(row: InternalRow): Unit = {
    var j = 0
    while (j < statFields.length) {
      val (i, f) = statFields(j)
      if (!row.isNullAt(i)) {
        val v = row.get(i, f.dataType)
        if (mins(j) == null || cmp(v, mins(j)) < 0) mins(j) = retained(v)
        if (maxs(j) == null || cmp(v, maxs(j)) > 0) maxs(j) = retained(v)
      }
      j += 1
    }
    rows += 1
    writer.write(row)
  }

  /** Close and return (file size bytes, row count, manifest stats map
    * incl. the reserved `__rows` count). All-null columns record no
    * bound — exactly the staged-stats job's behavior. */
  def close(): (Long, Long, Map[String, (String, String)]) = {
    writer.close()
    val p = new HPath(absPath)
    val size = p.getFileSystem(conf).getFileStatus(p).getLen
    def str(v: Any, dt: DataType): String = dt match {
      // timestamps record tz-stable epoch MICROS — the catalyst value
      // itself — matching the staged-stats job's unix_micros form
      case org.apache.spark.sql.types.TimestampType => v.toString
      case _ => Cast(Literal(v, dt), StringType, Some("UTC")).eval(null).toString
    }
    val bounds = statFields.zipWithIndex.flatMap { case ((_, f), j) =>
      if (mins(j) == null) None
      else Some(f.name -> ((str(mins(j), f.dataType), str(maxs(j), f.dataType))))
    }.toMap
    (size, rows,
      bounds + (GraftCatalog.RowsStatKey -> ((rows.toString, rows.toString))))
  }

  def abort(): Unit = {
    try writer.close() catch { case _: Exception => () }
    try {
      val p = new HPath(absPath)
      p.getFileSystem(conf).delete(p, false): Unit
    } catch { case _: Exception => () }
  }
}

private[catalog] object RowParquetWriter {
  private final class Builder(file: org.apache.parquet.io.OutputFile)
      extends ParquetWriter.Builder[InternalRow, Builder](file) {
    override def self(): Builder = this
    override def getWriteSupport(conf: Configuration): WriteSupport[InternalRow] =
      new ParquetWriteSupport
  }
}
