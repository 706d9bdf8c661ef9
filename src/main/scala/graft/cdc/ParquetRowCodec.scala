package graft.cdc

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroup
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.hadoop.api.{InitContext, ReadSupport}
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.{ParquetReader, ParquetWriter}
import org.apache.parquet.io.api.{Binary, RecordMaterializer}
import org.apache.parquet.schema.LogicalTypeAnnotation.{TimestampLogicalTypeAnnotation, TimeUnit}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.parquet.schema.{GroupType, LogicalTypeAnnotation, MessageType, Type, Types}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** Scalar parquet ⇄ InternalRow codec for the DSv2 streaming surface —
  * built on parquet-hadoop's PUBLIC example Group API (no
  * `org.apache.spark.sql.execution.*`):
  *
  *  - the `graft-changelog` PartitionReaders read the lake's own data
  *    files (column-projected via a requested-schema pushdown, so a
  *    before-side key probe reads only (url, _lsn));
  *  - the `graft-lake` StreamingWrite DataWriters stage micro-batch rows
  *    as parquet the driver-side merge then reads back vectorized.
  *
  * Scope is the lake's column universe: scalar types only (the web-pages
  * shape plus anything ALTER TABLE can mint — add-column / widen-type
  * registry rules keep it scalar). Nested/array/map columns raise a
  * clear error rather than corrupting silently. Widening (INT32 file →
  * LONG/DOUBLE declared, FLOAT → DOUBLE) follows the schema registry;
  * timestamps handle INT64 MICROS/MILLIS/NANOS and legacy INT96
  * (stats-less pre-pin files) transparently.
  */
private[graft] object ParquetRowCodec {

  /** The driver session's FULL effective hadoopConfiguration as plain
    * pairs, for executor-side readers/writers to rebuild — a bare
    * `new Configuration()` on the executor drops what Spark injected
    * (`spark.hadoop.*`: FS impls, credentials) AND, in client mode,
    * whatever only the driver's HADOOP_CONF_DIR site XMLs carry
    * (review r5, twice: a driver-relative delta was still wrong when
    * executor containers lack the driver's XMLs). Values are read
    * expanded via get(). This is Spark's own SerializableConfiguration
    * pattern re-expressed without the private[spark] class; the factory
    * holding it serializes once per stage (task binaries are broadcast),
    * so the ~tens-of-KB payload is per-stage, not per-task.
    */
  def hadoopConfDelta(spark: org.apache.spark.sql.SparkSession)
      : Seq[(String, String)] = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.asScala.flatMap(e => Option(hc.get(e.getKey)).map(e.getKey -> _))
      .toSeq
  }

  /** Executor side: the driver's effective conf, rebuilt. Entries are
    * applied over a classpath default (quiet on executors that DO have
    * the site XMLs — same values win).
    */
  def confFrom(delta: Seq[(String, String)]): Configuration = {
    val c = new Configuration()
    delta.foreach { case (k, v) => c.set(k, v) }
    c
  }

  // ---------- read side ----------

  /** Column-projecting Group read support: keeps only `wanted` fields of
    * the file's own schema (by name), so unread columns never leave the
    * parquet column store — the reader-side analog of Catalyst column
    * pruning.
    */
  final class ProjectingGroupReadSupport(wanted: Set[String])
      extends ReadSupport[Group] {
    override def init(context: InitContext): ReadSupport.ReadContext = {
      val fs = context.getFileSchema
      val kept = fs.getFields.asScala.filter(f => wanted.contains(f.getName))
      new ReadSupport.ReadContext(new MessageType(fs.getName, kept.asJava))
    }
    override def prepareForRead(conf: Configuration,
        meta: java.util.Map[String, String], fileSchema: MessageType,
        ctx: ReadSupport.ReadContext): RecordMaterializer[Group] =
      new GroupRecordConverter(ctx.getRequestedSchema)
  }

  def openReader(path: String, wanted: Set[String],
      conf: Configuration): ParquetReader[Group] =
    ParquetReader.builder(new ProjectingGroupReadSupport(wanted),
      new org.apache.hadoop.fs.Path(path)).withConf(conf).build()

  /** Per-file-schema resolver: maps a target StructType onto a Group's
    * own (projected) schema once, then converts row-by-row. Fields the
    * file lacks stay null (schema evolution null-backfill); present
    * fields widen per the registry rules.
    */
  final class GroupToRow(target: StructType, fileSchema: GroupType) {
    private val converters: Array[(Group, Int) => Any] =
      target.fields.map(f => conv(f.dataType, f.name, fileSchema))
    private val indices: Array[Int] = target.fields.map(f =>
      if (fileSchema.containsField(f.name)) fileSchema.getFieldIndex(f.name)
      else -1)

    def values(g: Group): Array[Any] = {
      val out = new Array[Any](indices.length)
      var i = 0
      while (i < indices.length) {
        val fi = indices(i)
        if (fi >= 0 && g.getFieldRepetitionCount(fi) > 0)
          out(i) = converters(i)(g, fi)
        i += 1
      }
      out
    }
  }

  private def conv(target: DataType, name: String,
      fs: GroupType): (Group, Int) => Any = {
    if (!fs.containsField(name)) return (_, _) => null
    val pt = fs.getType(name)
    require(pt.isPrimitive, s"ParquetRowCodec: non-scalar column '$name' " +
      s"(${pt}) is outside the lake's streaming column universe")
    val prim = pt.asPrimitiveType.getPrimitiveTypeName
    def unsupported = throw new UnsupportedOperationException(
      s"ParquetRowCodec: cannot read parquet $prim as Spark $target " +
        s"for column '$name'")
    (target, prim) match {
      case (StringType, PrimitiveTypeName.BINARY) =>
        (g, i) => UTF8String.fromBytes(g.getBinary(i, 0).getBytes)
      case (BinaryType, PrimitiveTypeName.BINARY |
          PrimitiveTypeName.FIXED_LEN_BYTE_ARRAY) =>
        (g, i) => g.getBinary(i, 0).getBytes
      case (LongType, PrimitiveTypeName.INT64) => (g, i) => g.getLong(i, 0)
      case (LongType, PrimitiveTypeName.INT32) =>
        (g, i) => g.getInteger(i, 0).toLong
      case (IntegerType, PrimitiveTypeName.INT32) =>
        (g, i) => g.getInteger(i, 0)
      case (ShortType, PrimitiveTypeName.INT32) =>
        (g, i) => g.getInteger(i, 0).toShort
      case (ByteType, PrimitiveTypeName.INT32) =>
        (g, i) => g.getInteger(i, 0).toByte
      case (DoubleType, PrimitiveTypeName.DOUBLE) =>
        (g, i) => g.getDouble(i, 0)
      case (DoubleType, PrimitiveTypeName.FLOAT) =>
        (g, i) => g.getFloat(i, 0).toDouble
      case (DoubleType, PrimitiveTypeName.INT32) =>
        (g, i) => g.getInteger(i, 0).toDouble
      case (DoubleType, PrimitiveTypeName.INT64) =>
        (g, i) => g.getLong(i, 0).toDouble
      case (FloatType, PrimitiveTypeName.FLOAT) =>
        (g, i) => g.getFloat(i, 0)
      case (BooleanType, PrimitiveTypeName.BOOLEAN) =>
        (g, i) => g.getBoolean(i, 0)
      case (DateType, PrimitiveTypeName.INT32) =>
        (g, i) => g.getInteger(i, 0)
      case (TimestampType, PrimitiveTypeName.INT64) =>
        val toMicros: Long => Long =
          pt.getLogicalTypeAnnotation match {
            case t: TimestampLogicalTypeAnnotation => t.getUnit match {
              case TimeUnit.MILLIS => _ * 1000L
              case TimeUnit.MICROS => identity
              case TimeUnit.NANOS => _ / 1000L
            }
            case _ => identity // our own writes are always annotated MICROS
          }
        (g, i) => toMicros(g.getLong(i, 0))
      case (TimestampType, PrimitiveTypeName.INT96) =>
        // legacy Spark INT96: 8 bytes nanos-of-day LE + 4 bytes julian day
        (g, i) => {
          val bytes = g.getInt96(i, 0).getBytes
          val buf = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val nanosOfDay = buf.getLong
          val julianDay = buf.getInt
          (julianDay - 2440588L) * 86400000000L + nanosOfDay / 1000L
        }
      case _ => unsupported
    }
  }

  // ---------- write side (sink staging) ----------

  def messageTypeFor(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      val t: Type = f.dataType match {
        case StringType => Types.optional(PrimitiveTypeName.BINARY)
          .as(LogicalTypeAnnotation.stringType()).named(f.name)
        case BinaryType =>
          Types.optional(PrimitiveTypeName.BINARY).named(f.name)
        case LongType => Types.optional(PrimitiveTypeName.INT64).named(f.name)
        case IntegerType =>
          Types.optional(PrimitiveTypeName.INT32).named(f.name)
        case ShortType => Types.optional(PrimitiveTypeName.INT32)
          .as(LogicalTypeAnnotation.intType(16, true)).named(f.name)
        case ByteType => Types.optional(PrimitiveTypeName.INT32)
          .as(LogicalTypeAnnotation.intType(8, true)).named(f.name)
        case DoubleType =>
          Types.optional(PrimitiveTypeName.DOUBLE).named(f.name)
        case FloatType => Types.optional(PrimitiveTypeName.FLOAT).named(f.name)
        case BooleanType =>
          Types.optional(PrimitiveTypeName.BOOLEAN).named(f.name)
        case TimestampType => Types.optional(PrimitiveTypeName.INT64)
          .as(LogicalTypeAnnotation.timestampType(true, TimeUnit.MICROS))
          .named(f.name)
        case DateType => Types.optional(PrimitiveTypeName.INT32)
          .as(LogicalTypeAnnotation.dateType()).named(f.name)
        case other => throw new UnsupportedOperationException(
          s"ParquetRowCodec: cannot stage Spark $other column '${f.name}' " +
            "(scalar lake columns only)")
      }
      b.addField(t)
    }
    b.named("graft_stage")
  }

  def openWriter(path: String, mt: MessageType,
      conf: Configuration): ParquetWriter[Group] =
    ExampleParquetWriter.builder(new org.apache.hadoop.fs.Path(path))
      .withConf(conf).withType(mt)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()

  /** One InternalRow → Group. Binary payloads go in as REUSED arrays so
    * parquet copies them immediately — the incoming row's buffers are
    * recycled by Spark after write() returns.
    */
  def toGroup(row: InternalRow, schema: StructType, mt: MessageType): Group = {
    val g = new SimpleGroup(mt)
    var i = 0
    while (i < schema.fields.length) {
      if (!row.isNullAt(i)) schema.fields(i).dataType match {
        case StringType =>
          g.add(i, Binary.fromReusedByteArray(row.getUTF8String(i).getBytes))
        case BinaryType =>
          g.add(i, Binary.fromReusedByteArray(row.getBinary(i)))
        case LongType | TimestampType => g.add(i, row.getLong(i))
        case IntegerType | DateType => g.add(i, row.getInt(i))
        case ShortType => g.add(i, row.getShort(i).toInt)
        case ByteType => g.add(i, row.getByte(i).toInt)
        case DoubleType => g.add(i, row.getDouble(i))
        case FloatType => g.add(i, row.getFloat(i))
        case BooleanType => g.add(i, row.getBoolean(i))
        case other => throw new UnsupportedOperationException(
          s"ParquetRowCodec: cannot stage Spark $other")
      }
      i += 1
    }
    g
  }
}
