package graft.sources

import org.apache.spark.sql.DataFrame

/** Lake-layout sinks. The partitioned form is the 100 TB default: one
  * directory per partition value means a reader filtering on the
  * partition column PRUNES whole directories at planning time (zero I/O
  * for excluded partitions) — asserted in SinkSpec via PartitionFilters.
  */
object Sinks {

  /** Hive-style partitioned parquet: `path/col=value/part-*.parquet`.
    * Choose low-cardinality partition columns (date, source, language) —
    * one directory and >= 1 file per value; high-cardinality keys belong
    * in bucketing instead (BucketingSpec).
    */
  def partitionedParquet(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Plain columnar snapshot (single table, no partitioning). */
  def parquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)
}
