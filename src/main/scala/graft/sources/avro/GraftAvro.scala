package graft.sources.avro

import java.util.UUID
import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `graft-avro`: a DataSource V2 Avro connector built on the core
  * `org.apache.avro` library (the `spark-avro` connector jar is absent
  * from this image — SURVEY.md §2b row "Kafka/Avro connectors"; the Kafka
  * half stays environment-blocked, this closes the Avro half on public
  * connector APIs only).
  *
  *   - READ: `spark.read.format("graft-avro").load(dir)` — schema inferred
  *     from the first file's writer schema; files SPLIT at
  *     `spark.sql.files.maxPartitionBytes` boundaries and re-aligned on
  *     avro sync markers (the container format's split points), so one
  *     giant file still parallelizes across a cluster; column pruning
  *     pushes into the avro decoder via schema-resolution projection (a
  *     pruned READER schema makes the decoder skip the bytes of dropped
  *     columns — avro is row-major, so pruning saves decode CPU, not I/O).
  *   - WRITE: `df.write.format("graft-avro").mode(...).save(dir)` — one
  *     container file per task (snappy block compression by default,
  *     `compression` option: snappy|deflate|null), written to a dotted
  *     temp name and renamed on task commit so readers never see partial
  *     files; `overwrite` maps to DSv2 truncate (old files removed on the
  *     driver before tasks launch).
  *
  * Scale shape: listing + planning is O(files) driver metadata; each task
  * reads exactly its [start, start+length) sync-aligned slice. No state
  * beyond the file list ever sits on the driver.
  */
class GraftAvro extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-avro"
  override def supportsExternalMetadata(): Boolean = true

  private def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    val single = Option(options.get("path")).toSeq
    require(single.nonEmpty, "graft-avro: no path specified")
    single
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val conf = GraftAvro.hadoopConf()
    val files = GraftAvro.listFiles(paths(options), conf)
    require(files.nonEmpty, s"graft-avro: no .avro files under ${paths(options).mkString(",")}")
    AvroConv.toStructType(GraftAvro.fileSchema(files.head.getPath, conf))
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val o = new CaseInsensitiveStringMap(properties)
    new AvroTable(paths(o), schema, o)
  }
}

object GraftAvro {
  def hadoopConf(): Configuration = SparkSession.active.sessionState.newHadoopConf()

  /** Non-hidden `*.avro` files under each root (a root may itself be a
    * file), recursively — same visibility rules as Spark's file sources.
    *
    * Listing is GLOB-based on purpose: `*` never matches the dot-prefixed
    * temp names in-flight writers use, so a temp that vanishes (commit
    * rename) mid-listing is never stat'd — `listFiles`/`listStatus` stat
    * every entry eagerly and throw on exactly that race. The landing
    * contract this implies is the same as Spark's file sources: publish
    * files by ATOMIC RENAME from a hidden name (as the `graft-avro`
    * writer and the lake layer already do).
    */
  def listFiles(roots: Seq[String], conf: Configuration): Seq[FileStatus] = {
    def walk(fs: org.apache.hadoop.fs.FileSystem, dir: Path): Seq[FileStatus] = {
      val entries = Option(fs.globStatus(new Path(dir, "*"))).map(_.toSeq).getOrElse(Nil)
      val files = entries.filter(s => s.isFile && s.getPath.getName.endsWith(".avro") &&
        !s.getPath.getName.startsWith("_"))
      files ++ entries.filter(s => s.isDirectory &&
        !s.getPath.getName.startsWith("_")).flatMap(d => walk(fs, d.getPath))
    }
    roots.flatMap { r =>
      val p = new Path(r)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) Nil
      else if (fs.getFileStatus(p).isFile) Seq(fs.getFileStatus(p))
      else walk(fs, p)
    }.sortBy(_.getPath.toString)
  }

  def fileSchema(p: Path, conf: Configuration): Schema = {
    val in = new FsInput(p, conf)
    try {
      val r = DataFileReader.openReader(in, new GenericDatumReader[GenericRecord]())
      try r.getSchema finally r.close()
    } finally in.close()
  }

  /** Hadoop Configuration is not Serializable; ship its entries and
    * rebuild lazily on the executor.
    */
  final class ConfCarrier(@transient conf: Configuration) extends Serializable {
    private val entries: Array[(String, String)] =
      conf.iterator().asScala.map(e => (e.getKey, e.getValue)).toArray
    @transient private lazy val rebuilt: Configuration = {
      val c = new Configuration(false)
      entries.foreach { case (k, v) => c.set(k, v) }
      c
    }
    def get: Configuration = rebuilt
  }
}

final class AvroTable(
    roots: Seq[String],
    tableSchema: StructType,
    options: CaseInsensitiveStringMap)
  extends Table with SupportsRead with SupportsWrite {

  override def name(): String = s"graft-avro:${roots.mkString(",")}"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(roots, tableSchema,
      Option(options.get("maxFilesPerTrigger")).map(_.toInt))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new AvroWriteBuilder(roots.head, info.schema(),
      Option(options.get("compression")).getOrElse("snappy"))
}

final class AvroScanBuilder(
    roots: Seq[String],
    full: StructType,
    maxFilesPerTrigger: Option[Int] = None)
  extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new AvroScan(roots, full, required, maxFilesPerTrigger)
}

final case class AvroInputPartition(path: String, start: Long, length: Long)
  extends InputPartition

final class AvroScan(
    roots: Seq[String],
    full: StructType,
    required: StructType,
    maxFilesPerTrigger: Option[Int] = None)
  extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(
      checkpointLocation: String): org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new AvroMicroBatchStream(roots, required, checkpointLocation, maxFilesPerTrigger)
  override def description(): String =
    s"graft-avro ${roots.mkString(",")} ReadSchema: ${required.simpleString}"

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = GraftAvro.hadoopConf()
    val files = GraftAvro.listFiles(roots, conf)
    val maxSplit = SparkSession.active.sessionState.conf.filesMaxPartitionBytes
    files.flatMap { f =>
      // sync markers land every ~64 KB (the block size), so any byte range
      // re-aligns to a record boundary; tiny trailing slivers are absorbed
      // by pastSync semantics (a slice with no sync inside reads nothing)
      (0L until f.getLen by maxSplit).map { off =>
        AvroInputPartition(f.getPath.toString, off, math.min(maxSplit, f.getLen - off))
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = GraftAvro.hadoopConf()
    val files = GraftAvro.listFiles(roots, conf)
    require(files.nonEmpty, s"graft-avro: no .avro files under ${roots.mkString(",")}")
    val writerSchema = GraftAvro.fileSchema(files.head.getPath, conf)
    val readerSchema = AvroConv.pruneWriterSchema(writerSchema, required)
    new AvroPartitionReaderFactory(
      readerSchema.toString, required, new GraftAvro.ConfCarrier(conf))
  }
}

final class AvroPartitionReaderFactory(
    readerSchemaJson: String,
    required: StructType,
    conf: GraftAvro.ConfCarrier)
  extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[AvroInputPartition]
    val readerSchema = new Schema.Parser().parse(readerSchemaJson)
    val in = new FsInput(new Path(part.path), conf.get)
    // writer schema comes from the file header; the pruned READER schema
    // drives resolution, so dropped columns are skipped, not decoded
    val datum = new GenericDatumReader[GenericRecord](null: Schema, readerSchema)
    val reader = DataFileReader.openReader(in, datum)
      .asInstanceOf[DataFileReader[GenericRecord]]
    reader.sync(part.start)
    val end = part.start + part.length
    val convert = AvroConv.recordReader(required, readerSchema)

    new PartitionReader[InternalRow] {
      private var row: InternalRow = _
      override def next(): Boolean =
        if (reader.hasNext && !reader.pastSync(end)) {
          row = convert(reader.next())
          true
        } else false
      override def get(): InternalRow = row
      override def close(): Unit = { reader.close() }
    }
  }
}

final class AvroWriteBuilder(root: String, schema: StructType, codec: String)
  extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new AvroBatchWrite(root, schema, codec, doTruncate)
  }
}

final case class AvroCommit(tmp: String, dest: String) extends WriterCommitMessage

final class AvroBatchWrite(root: String, schema: StructType, codec: String, truncate: Boolean)
  extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    // driver-side, before any task launches: make the dir; under truncate
    // semantics remove prior avro files so overwrite is a clean slate
    val conf = GraftAvro.hadoopConf()
    val dir = new Path(root)
    val fs = dir.getFileSystem(conf)
    if (truncate && fs.exists(dir))
      GraftAvro.listFiles(Seq(root), conf).foreach(f => fs.delete(f.getPath, false))
    fs.mkdirs(dir)
    new AvroDataWriterFactory(root, schema, codec, new GraftAvro.ConfCarrier(conf))
  }

  // a task's file becomes visible only via the commit-time rename below;
  // job commit has nothing left to do, job abort sweeps stray temps
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = GraftAvro.hadoopConf()
    messages.filter(_ != null).foreach { case AvroCommit(tmp, _) =>
      val p = new Path(tmp)
      val fs = p.getFileSystem(conf)
      if (fs.exists(p)) fs.delete(p, false)
    }
  }
}

final class AvroDataWriterFactory(
    root: String,
    schema: StructType,
    codec: String,
    conf: GraftAvro.ConfCarrier)
  extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new AvroDataWriter(root, schema, codec, conf, partitionId, taskId)
}

final class AvroDataWriter(
    root: String,
    schema: StructType,
    codec: String,
    conf: GraftAvro.ConfCarrier,
    partitionId: Int,
    taskId: Long)
  extends DataWriter[InternalRow] {

  private val avroSchema = AvroConv.toAvroSchema(schema, "graft_avro")
  private val convert = AvroConv.rowWriter(schema, avroSchema)
  private val fileName = f"part-$partitionId%05d-$taskId-${UUID.randomUUID().toString.take(8)}.avro"
  private val tmpPath = new Path(root, s".$fileName.tmp")
  private val destPath = new Path(root, fileName)
  private val fs = tmpPath.getFileSystem(conf.get)

  private val out = fs.create(tmpPath, true)
  private val writer = {
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](avroSchema))
    w.setCodec(codec match {
      case "snappy" => CodecFactory.snappyCodec()
      case "deflate" => CodecFactory.deflateCodec(6)
      case "null" | "none" | "uncompressed" => CodecFactory.nullCodec()
      case other => sys.error(s"graft-avro: unknown compression '$other'")
    })
    w.create(avroSchema, out)
  }

  override def write(row: InternalRow): Unit = writer.append(convert(row))

  override def commit(): WriterCommitMessage = {
    writer.close()
    require(fs.rename(tmpPath, destPath),
      s"graft-avro: commit rename failed: $tmpPath -> $destPath")
    AvroCommit(tmpPath.toString, destPath.toString)
  }

  override def abort(): Unit = {
    try writer.close() catch { case _: Throwable => () }
    if (fs.exists(tmpPath)) fs.delete(tmpPath, false)
  }

  override def close(): Unit = ()
}
