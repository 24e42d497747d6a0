package graft.sources.avro

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType

/** Offset = the id of the last file-batch this stream has published.
  * Batch contents are pinned by the source's OWN log under the
  * checkpoint dir, so a given (start, end] range always re-plans the
  * same files after a crash or restart.
  */
final case class AvroStreamOffset(batch: Long) extends Offset {
  override def json(): String = s"""{"batch":$batch}"""
}

/** Streaming face of `graft-avro`: a landing-directory micro-batch
  * source (`spark.readStream.format("graft-avro").load(dir)`).
  *
  * Discovery works like Spark's own file source: each trigger lists the
  * directory, files never seen before become the next batch, and the
  * batch's file list is persisted to `<checkpoint>/graft-avro-src/`
  * BEFORE the offset is returned — so the offset range the engine
  * checkpoints always resolves to exactly the same files on replay
  * (exactly-once file admission; a crash between the log write and the
  * engine's own offset commit just re-reads the already-logged batch).
  * Processed data files are never deleted or re-read: `seen` is the
  * union of every logged batch, rebuilt from the log on restart.
  *
  * Scale shape: state is file METADATA only (names in the log, the seen
  * set on the driver) — the 100 TB landing-zone pattern where each
  * trigger admits a bounded batch of container files and the data itself
  * flows straight to executors via the same split-at-sync-marker reads
  * as the batch scan.
  */
final class AvroMicroBatchStream(
    roots: Seq[String],
    required: StructType,
    checkpointLocation: String,
    maxFilesPerTrigger: Option[Int] = None)
  extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val conf = GraftAvro.hadoopConf()
  private val logDir = new Path(checkpointLocation, "graft-avro-src")
  private val fs = logDir.getFileSystem(conf)

  // (batchId -> entries), seen = union of all logged paths; rebuilt from
  // the log so restarts resume where the checkpoint says
  private val batches = scala.collection.mutable.TreeMap.empty[Long, Seq[(String, Long)]]
  private val seen = scala.collection.mutable.HashSet.empty[String]
  private var schemaJson: Option[String] = None
  loadLog()

  private def loadLog(): Unit = {
    if (!fs.exists(logDir)) return
    val it = fs.listStatus(logDir).toSeq
    it.filter(_.getPath.getName.startsWith("batch-")).foreach { st =>
      val id = st.getPath.getName.stripPrefix("batch-").stripSuffix(".list").toLong
      val body = readFully(st.getPath)
      val entries = body.split("\n").filter(_.nonEmpty).toSeq.map { line =>
        val i = line.indexOf('\t')
        (line.substring(i + 1), line.substring(0, i).toLong)
      }
      batches(id) = entries
      entries.foreach { case (p, _) => seen += p }
    }
    val sp = new Path(logDir, "schema.json")
    if (fs.exists(sp)) schemaJson = Some(readFully(sp))
  }

  private def readFully(p: Path): String = {
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      Iterator.continually(in.read(buf)).takeWhile(_ > 0).foreach(out.write(buf, 0, _))
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** Same-directory temp write + rename: the log entry is durable before
    * the offset escapes to the engine.
    */
  private def writeAtomic(p: Path, body: String): Unit = {
    val tmp = new Path(p.getParent, s".${p.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
    require(fs.rename(tmp, p), s"graft-avro stream: log rename failed: $tmp -> $p")
  }

  private def maxBatch: Long = if (batches.isEmpty) -1L else batches.lastKey

  /** Unseen files right now, listing-sorted (stable admission order). */
  private def unseenNow(): Seq[(String, Long)] =
    GraftAvro.listFiles(roots, conf)
      .filterNot(f => seen.contains(f.getPath.toString))
      .map(f => (f.getPath.toString, f.getLen))

  /** Publish `files` as the next batch: log first, then expose. */
  private def publish(files: Seq[(String, Long)]): Long = {
    fs.mkdirs(logDir)
    if (schemaJson.isEmpty) {
      val s = GraftAvro.fileSchema(new Path(files.head._1), conf).toString
      writeAtomic(new Path(logDir, "schema.json"), s)
      schemaJson = Some(s)
    }
    val id = maxBatch + 1
    writeAtomic(new Path(logDir, s"batch-$id.list"),
      files.map { case (p, len) => s"$len\t$p" }.mkString("\n"))
    batches(id) = files
    files.foreach { case (p, _) => seen += p }
    id
  }

  // Trigger.AvailableNow: pin the file SET at prepare time — files that
  // land mid-run wait for the next invocation. Admission still respects
  // maxFilesPerTrigger, so a pinned backlog drains over several capped
  // micro-batches before the engine sees a stable offset and stops.
  private var pinned: Option[scala.collection.mutable.Queue[(String, Long)]] = None
  override def prepareForTriggerAvailableNow(): Unit =
    pinned = Some(scala.collection.mutable.Queue.from(unseenNow()))

  override def initialOffset(): Offset = AvroStreamOffset(-1L)
  override def deserializeOffset(json: String): Offset = {
    val b = json.replaceAll("[^0-9-]", "")
    AvroStreamOffset(b.toLong)
  }

  override def getDefaultReadLimit: org.apache.spark.sql.connector.read.streaming.ReadLimit = {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    maxFilesPerTrigger.map(n => ReadLimit.maxFiles(n)).getOrElse(ReadLimit.allAvailable())
  }

  override def latestOffset(): Offset =
    sys.error("graft-avro stream: unreachable — admission control supplies latestOffset(start, limit)")

  /** One capped admission step: up to `limit` files from the pinned
    * backlog (AvailableNow) or from a fresh listing (continuous).
    */
  override def latestOffset(
      start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    import org.apache.spark.sql.connector.read.streaming.ReadMaxFiles
    val cap = limit match {
      case mf: ReadMaxFiles => mf.maxFiles()
      case _ => maxFilesPerTrigger.getOrElse(Int.MaxValue)
    }
    val files = pinned match {
      case Some(q) => (0 until math.min(cap, q.size)).map(_ => q.dequeue())
      case None => unseenNow().take(cap)
    }
    AvroStreamOffset(if (files.isEmpty) maxBatch else publish(files))
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[AvroStreamOffset].batch, end.asInstanceOf[AvroStreamOffset].batch)
    val maxSplit = org.apache.spark.sql.SparkSession.active.sessionState.conf.filesMaxPartitionBytes
    batches.range(s + 1, e + 1).values.flatten.flatMap { case (path, len) =>
      (0L until len by maxSplit).map { off =>
        AvroInputPartition(path, off, math.min(maxSplit, len - off))
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // prefer the logged writer schema (captures enums etc. that a
    // spark-type round trip cannot reconstruct); fall back to the spark
    // schema for a not-yet-populated landing dir
    val writer = schemaJson
      .map(new org.apache.avro.Schema.Parser().parse(_))
      .getOrElse(AvroConv.toAvroSchema(required, "graft_avro"))
    val reader = AvroConv.pruneWriterSchema(writer, required)
    new AvroPartitionReaderFactory(reader.toString, required, new GraftAvro.ConfCarrier(conf))
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
