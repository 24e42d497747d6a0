package graft.sources.lake

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.vectorized.ColumnarBatch
import org.apache.spark.util.SerializableConfiguration
import org.roaringbitmap.longlong.Roaring64Bitmap

import graft.operators.{Dv, LakeTable}

/** The DSv2 merge-on-read batch: DV-free files flow through the
  * delegate [[ParquetScan]] untouched (vectorized, filter-pushed,
  * column-pruned); each DV'd file becomes ONE whole-file row-based
  * partition whose reader drops the dead positions by DENSE ROW
  * COUNTING — valid because the DV-side scan pushes NO filters (no
  * row-group/page skipping) and never splits a file, so the reader
  * emits every row of the file in order and the running count IS the
  * row's position. Spark re-applies the query's own filters above the
  * scan either way (parquet pushdown is advisory), so results match
  * the clean side exactly. OPTIMIZE materializes vectors and returns
  * files to the vectorized path — MOR's standard read tax, paid only
  * by files that actually carry a vector, only until maintenance runs.
  */
private[lake] class DvBatch(
    clean: Batch,
    dvScan: ParquetScan,
    dvEntries: Seq[LakeTable.Entry],
    root: String,
    conf: SerializableConfiguration)
  extends Batch {

  private lazy val dvBatch: Batch = dvScan.toBatch

  override def planInputPartitions(): Array[InputPartition] = {
    val dvByKey = dvEntries.map(e => Dv.suffixKey(e.rel) -> e).toMap
    // re-pack the delegate's split plan into ONE whole-file partition
    // per DV'd file: position counting must start at 0 and see every row
    val files = dvBatch.planInputPartitions().flatMap {
      case fp: FilePartition => fp.files
      case other => sys.error(s"graft-lake DV scan: unexpected partition $other")
    }
    val dvParts = files.groupBy(_.filePath.toString).values.zipWithIndex.map {
      case (fs, i) =>
        val whole = fs.head.copy(start = 0, length = fs.head.fileSize)
        val key = Dv.suffixKey(Dv.decodeUrlPath(whole.filePath.toString))
        val e = dvByKey.getOrElse(key, sys.error(
          s"graft-lake DV scan: no manifest entry for planned file $key"))
        DvInputPartition(
          FilePartition(i, Array(whole)), s"${graft.operators.LakeTable.dataRoot(root)}/${e.dv.get.rel}"): InputPartition
    }.toArray
    clean.planInputPartitions() ++ dvParts
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DvReaderFactory(clean.createReaderFactory(), dvBatch.createReaderFactory(), conf)
}

/** One whole, never-split DV'd file plus its vector's absolute path. */
private[lake] case class DvInputPartition(
    inner: FilePartition,
    dvPath: String)
  extends InputPartition

private[lake] class DvReaderFactory(
    clean: PartitionReaderFactory,
    dv: PartitionReaderFactory,
    conf: SerializableConfiguration)
  extends PartitionReaderFactory {

  // DV partitions must read row-based (position counting), and
  // DataSourceV2ScanExecBase refuses MIXED columnar/row partitions in
  // one scan — so a snapshot with any DV'd file reads row-based
  // throughout. That is the MOR read tax; OPTIMIZE materializes the
  // vectors and returns the table to pure vectorized scans.
  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = p match {
    case DvInputPartition(inner, dvPath) =>
      new DvRowReader(dv.createReader(inner), Dv.cached(conf.value, dvPath))
    case other => clean.createReader(other)
  }

  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] =
    clean.createColumnarReader(p)
}

/** Skip DV'd positions while counting rows (the dense-order contract
  * documented on [[DvBatch]]).
  */
private[lake] class DvRowReader(
    inner: PartitionReader[InternalRow],
    bm: Roaring64Bitmap)
  extends PartitionReader[InternalRow] {

  private var pos = -1L

  override def next(): Boolean = {
    while (inner.next()) {
      pos += 1
      if (!bm.contains(pos)) return true
    }
    false
  }

  override def get(): InternalRow = inner.get()

  override def close(): Unit = inner.close()
}
