package graft.sources.lake


import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.read.{
  Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{
  MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScan, ParquetScanBuilder}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.LakeTable

/** The catalog table's Scan layer: batch scans delegate verbatim to
  * Spark's [[ParquetScanBuilder]]/[[ParquetScan]] over the manifest
  * index (pushdown included), and `toMicroBatchStream` adds the
  * STREAMING face — `spark.readStream.table("graft.db.t")` — with the
  * same manifest-version-offset semantics as the `graft-lake` DSv1
  * source (GraftLake.scala): micro-batch (a, b] reads exactly the files
  * ADDED by pure-append commits in that version range (immutable
  * manifests ⇒ byte-identical replay, exactly-once admission), change
  * commits fail crisply or are skipped wholly under
  * `skipChangeCommits`, `startingVersion` skips the initial snapshot,
  * `maxVersionsPerTrigger` bounds each micro-batch's version span, and
  * Trigger.AvailableNow pins the end version at prepare time. Each
  * micro-batch's partitions are planned by a real [[ParquetScan]] over
  * a [[LakeFileIndex]] of just the added files, so the read path is the
  * same vectorized reader as the batch face.
  */
class LakeScanBuilder(
    spark: SparkSession,
    root: String,
    meta: LakeTable.TableMeta,
    entries: Seq[LakeTable.Entry],
    options: CaseInsensitiveStringMap)
  extends ScanBuilder
  with SupportsPushDownCatalystFilters
  with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {

  private val delegate = ParquetScanBuilder(
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
    new LakeFileIndex(spark, root, meta, entries),
    GraftLake.nullable(meta.schema), GraftLake.nullable(meta.schema), options)

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] =
    delegate.pushFilters(filters)

  override def pushedFilters: Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    delegate.pushedFilters

  override def pruneColumns(requiredSchema: StructType): Unit =
    delegate.pruneColumns(requiredSchema)

  override def build(): Scan =
    new LakeScan(spark, root, meta, delegate.build().asInstanceOf[ParquetScan], options)
}

class LakeScan(
    spark: SparkSession,
    root: String,
    meta: LakeTable.TableMeta,
    delegate: ParquetScan,
    options: CaseInsensitiveStringMap)
  extends Scan {

  override def readSchema(): StructType = delegate.readSchema()

  override def toBatch: Batch = delegate.toBatch

  override def description(): String = s"graft-lake $root ${delegate.description()}"

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    require(!options.getBoolean("readChangeFeed", false),
      "graft-lake: readChangeFeed streaming is served by the DSv1 source — " +
        "use spark.readStream.format(\"graft-lake\").option(\"readChangeFeed\", true)" +
        ".option(\"keyCols\", ...).load(root)")
    new LakeMicroBatchStream(
      spark, root, meta,
      startingVersion = Option(options.get("startingVersion")).map(_.toLong).getOrElse(0L),
      skipChangeCommits = options.getBoolean("skipChangeCommits", false),
      maxVersionsPerTrigger = Option(options.get("maxVersionsPerTrigger")).map(_.toLong))
  }
}

class LakeMicroBatchStream(
    spark: SparkSession,
    root: String,
    meta: LakeTable.TableMeta,
    startingVersion: Long,
    skipChangeCommits: Boolean,
    maxVersionsPerTrigger: Option[Long])
  extends MicroBatchStream
  with SupportsAdmissionControl
  with SupportsTriggerAvailableNow {

  private val window = new VersionWindow(spark, root)

  private def ver(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  @volatile private var pinnedVersion: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    pinnedVersion = Some(LakeTable.snapshot(spark, root).version)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def initialOffset(): Offset = LongOffset(startingVersion)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = Option(start).map(ver).getOrElse(startingVersion)
    val end = window.nextEndVersion(from, pinnedVersion, maxVersionsPerTrigger)
    if (end > 0) LongOffset(end) else null
  }

  override def reportLatestOffset(): Offset = {
    val v = LakeTable.snapshot(spark, root).version
    if (v > startingVersion) LongOffset(v) else null
  }

  override def deserializeOffset(json: String): Offset = LongOffset(json.trim.toLong)

  /** A ParquetScan over exactly `entries` (the per-batch or template
    * planning unit — same vectorized read stack as the batch face).
    */
  private def scanOf(entries: Seq[LakeTable.Entry]): ParquetScan =
    ParquetScanBuilder(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      new LakeFileIndex(spark, root, meta, entries),
      GraftLake.nullable(meta.schema), GraftLake.nullable(meta.schema),
      CaseInsensitiveStringMap.empty())
      .build().asInstanceOf[ParquetScan]

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    scanOf(window.addedEntries(ver(start), ver(end), skipChangeCommits))
      .toBatch.planInputPartitions()

  // the factory captures schema + conf only — partitions carry the files,
  // so one factory serves every micro-batch
  private lazy val factory: PartitionReaderFactory =
    scanOf(Nil).toBatch.createReaderFactory()

  override def createReaderFactory(): PartitionReaderFactory = factory

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}
