package graft.sources

import java.io.File
import java.nio.file.{Files, Paths}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.Tables

/** Avro source/sink built from scratch on the avro CORE library — the one
  * mainstream landing format with no reader in the Spark distribution
  * shipped here (the `spark-avro` datasource module is an external
  * artifact; only `avro-1.12.x` core is on the classpath). Row-major and
  * self-describing: the writer embeds the schema in every container file,
  * the reader maps it back to Spark types — like ORC, an explicit read
  * schema is a CHECK, not a parse instruction.
  *
  * Reader: a DataSource V2 `TableProvider` (the [[BusSource]] pattern,
  * batch-side) — one `InputPartition` per container file (Avro splits on
  * sync markers only within a file; file granularity is the natural unit
  * at 128 MB-ish files), each `PartitionReader` streaming GenericRecords
  * straight into `InternalRow`s. No column pruning is pushed down — Avro
  * is row-major, so a narrower read schema saves deserialization CPU but
  * zero IO; the engine's projection prunes after decode.
  *
  * Writer: distributed `foreachPartition` — each task encodes its
  * partition into `part-NNNNN.avro` with deflate compression. This is the
  * fixture/staging sink (local filesystem, driver-written _SUCCESS
  * marker); a production table write would layer the
  * [[graft.operators.VersionedTable]] commit protocol on top, exactly as
  * the parquet sinks do.
  *
  * Supported types (both directions): LONG, INT, STRING, DOUBLE, FLOAT,
  * BOOLEAN, BYTES, each optionally nullable via UNION(null, T) — the
  * relational core; nested records are out of contract (throw loudly).
  */
object AvroSource {

  // ------------------------------------------------------- schema mapping
  def toAvroSchema(schema: StructType, name: String = "row"): Schema = {
    var fields = SchemaBuilder.record(name).namespace("graft").fields()
    schema.fields.foreach { f =>
      val base = f.dataType match {
        case LongType    => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case StringType  => Schema.create(Schema.Type.STRING)
        case DoubleType  => Schema.create(Schema.Type.DOUBLE)
        case FloatType   => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case BinaryType  => Schema.create(Schema.Type.BYTES)
        case dt => throw new IllegalArgumentException(
          s"avro sink: unsupported Spark type $dt for field ${f.name}")
      }
      fields =
        if (f.nullable)
          fields.name(f.name)
            .`type`(Schema.createUnion(Schema.create(Schema.Type.NULL), base))
            .withDefault(null)
        else fields.name(f.name).`type`(base).noDefault()
    }
    fields.endRecord()
  }

  def toSparkType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.LONG    => (LongType, false)
    case Schema.Type.INT     => (IntegerType, false)
    case Schema.Type.STRING  => (StringType, false)
    case Schema.Type.DOUBLE  => (DoubleType, false)
    case Schema.Type.FLOAT   => (FloatType, false)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.BYTES   => (BinaryType, false)
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1 && branches.size <= 2,
        s"avro source: only UNION(null, T) unions are in contract, got $s")
      (toSparkType(nonNull.head)._1, true)
    case t => throw new IllegalArgumentException(
      s"avro source: unsupported avro type $t")
  }

  def toStructType(record: Schema): StructType = {
    require(record.getType == Schema.Type.RECORD,
      s"avro source: top-level schema must be a record, got ${record.getType}")
    StructType(record.getFields.asScala.map { f =>
      val (dt, nullable) = toSparkType(f.schema())
      StructField(f.name(), dt, nullable)
    }.toSeq)
  }

  private[sources] def listAvroFiles(dir: String): Seq[File] = {
    val d = new File(dir)
    require(d.isDirectory, s"avro source: $dir is not a directory")
    d.listFiles().toSeq.filter(f => f.isFile && f.getName.endsWith(".avro"))
      .sortBy(_.getName)
  }

  /** Embedded schema of the first container file — Avro is
    * self-describing, like ORC. */
  def readSchema(dir: String): StructType = {
    val first = listAvroFiles(dir).headOption.getOrElse(
      throw new IllegalArgumentException(s"avro source: no .avro files in $dir"))
    val r = new DataFileReader[GenericRecord](first,
      new GenericDatumReader[GenericRecord]())
    try toStructType(r.getSchema) finally r.close()
  }

  // ----------------------------------------------------------------- sink
  /** Distributed write of `df` as Avro container files under `dir`
    * (overwrite). Values are encoded generically from Row fields; the
    * Spark-to-Avro field order is the DataFrame schema's. */
  def write(df: DataFrame, dir: String): Unit = {
    val schema = df.schema
    val avroJson = toAvroSchema(schema).toString // Schema isn't Serializable
    val d = Paths.get(dir)
    if (Files.exists(d)) { // overwrite: clear previous parts
      val s = Files.list(d)
      try s.iterator().asScala.toList.foreach(p => Files.deleteIfExists(p))
      finally s.close()
    }
    Files.createDirectories(d)
    df.rdd.mapPartitionsWithIndex { (idx, it) =>
      val avroSchema = new Schema.Parser().parse(avroJson)
      val file = new File(dir, f"part-$idx%05d.avro")
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](avroSchema))
      w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
      w.create(avroSchema, file)
      var n = 0L
      try {
        it.foreach { row =>
          val rec = new GenericData.Record(avroSchema)
          var i = 0
          while (i < schema.length) {
            rec.put(i, toAvroValue(row, i, schema.fields(i).dataType))
            i += 1
          }
          w.append(rec)
          n += 1
        }
      } finally w.close()
      Iterator.single(n)
    }.collect() // materialize the write; per-task row counts back
    Files.write(d.resolve("_SUCCESS"), Array.emptyByteArray)
  }

  private def toAvroValue(row: Row, i: Int, dt: DataType): AnyRef =
    if (row.isNullAt(i)) null
    else dt match {
      case LongType    => java.lang.Long.valueOf(row.getLong(i))
      case IntegerType => java.lang.Integer.valueOf(row.getInt(i))
      case StringType  => row.getString(i)
      case DoubleType  => java.lang.Double.valueOf(row.getDouble(i))
      case FloatType   => java.lang.Float.valueOf(row.getFloat(i))
      case BooleanType => java.lang.Boolean.valueOf(row.getBoolean(i))
      case BinaryType  => java.nio.ByteBuffer.wrap(row.getAs[Array[Byte]](i))
      case other => throw new IllegalArgumentException(s"unsupported $other")
    }

  // ------------------------------------------------- staged documents twin
  /** Write-once staging of the documents table as Avro, keyed by
    * (source path, mtime) like the ORC/JSONL/CSV twins. */
  private[graft] def stagedDir(spark: SparkSession, sfDir: String): String = {
    val src = Paths.get(sfDir, "documents.parquet").toAbsolutePath.normalize
    val key = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s"avro:$src:${Files.getLastModifiedTime(src).toMillis}".getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString
    val dir = Paths.get(sys.props("java.io.tmpdir"), s"graft_avro_$key")
    if (!Files.exists(dir.resolve("_SUCCESS"))) {
      write(Tables.documents(spark, sfDir), dir.toString)
    }
    dir.toString
  }

  /** Round-trip proof with the same output contract (and oracle) as the
    * JSONL/CSV/ORC round trips: any encode/decode loss moves the
    * md5-derived content checksum. */
  def roundTripAgg(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.format(classOf[AvroSource].getName)
      .load(stagedDir(spark, sfDir))
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long"))
          .as("content_sum"))
      .orderBy("lang", "source")

  def roundTripAggSql: String = JsonLines.roundTripAggSql
}

/** `spark.read.format(classOf[AvroSource].getName).load(dir)` entry point. */
class AvroSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AvroSource.readSchema(options.get("path"))
  // a user-pinned read schema is allowed — and CHECKED per file by the
  // reader against the embedded schema (the ORC "schema as a check" stance)
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AvroTable(properties.get("path"), schema)
}

final class AvroTable(dir: String, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft_avro($dir)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = tableSchema
        override def toBatch: Batch = new Batch {
          override def planInputPartitions(): Array[InputPartition] =
            AvroSource.listAvroFiles(dir)
              .map(f => AvroInputPartition(f.getAbsolutePath)).toArray
          override def createReaderFactory(): PartitionReaderFactory =
            // a top-level case class: the factory ships to executors, so
            // it must not capture the (non-serializable) Scan/Batch outers
            AvroReaderFactory(tableSchema)
        }
      }
    }
}

final case class AvroInputPartition(path: String) extends InputPartition

final case class AvroReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new AvroPartitionReader(p.asInstanceOf[AvroInputPartition].path, schema)
}

final class AvroPartitionReader(path: String, schema: StructType)
    extends PartitionReader[InternalRow] {
  private val reader = new DataFileReader[GenericRecord](new File(path),
    new GenericDatumReader[GenericRecord]())
  // positional mapping validated once per file: the embedded schema's
  // field names must match the expected read schema — a drifted file
  // fails the scan loudly instead of silently transposing columns
  locally {
    val got = AvroSource.toStructType(reader.getSchema)
    require(got.fieldNames.sameElements(schema.fieldNames),
      s"avro file $path fields ${got.fieldNames.mkString(",")} != " +
        s"expected ${schema.fieldNames.mkString(",")}")
  }
  private var rec: GenericRecord = _
  override def next(): Boolean = {
    if (reader.hasNext) { rec = reader.next(rec); true } else false
  }
  override def get(): InternalRow = {
    val arr = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      arr(i) = fromAvroValue(rec.get(i), schema.fields(i).dataType)
      i += 1
    }
    new GenericInternalRow(arr)
  }
  private def fromAvroValue(v: AnyRef, dt: DataType): Any =
    if (v == null) null
    else dt match {
      case StringType => v match {
        case u: org.apache.avro.util.Utf8 =>
          UTF8String.fromBytes(util.Arrays.copyOf(u.getBytes, u.getByteLength))
        case s => UTF8String.fromString(s.toString)
      }
      case BinaryType => v match {
        case b: java.nio.ByteBuffer =>
          val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
        case a: Array[Byte] => a
      }
      case _ => v // numeric/boolean primitives pass through boxed
    }
  override def close(): Unit = reader.close()
}
