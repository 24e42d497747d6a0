package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The reference's output contract (SURVEY.md S2/S3): a single text file of
  * `key\tvalue` lines, globally sorted ascending by key-as-string (Hadoop's
  * 1-reducer shuffle sort over Text keys). The coalesce(1) is applied only
  * at the sink, after all distributed work — at cluster scale you'd drop it
  * and keep the range-partitioned sorted output.
  */
object KvTextSink {

  /** Render (key, value...) rows into the reference's line format.
    *
    * Sorted by the FULL rendered line, not the key alone: key order is
    * preserved (`\t` sorts below every printable byte, so "a\t..." still
    * precedes "ab\t..."), and duplicate keys get a deterministic value
    * order — which makes [[write]] and [[writeSharded]] produce the SAME
    * byte stream even when keys repeat. (A key containing a literal tab
    * would blur the key/value boundary — outside the S2 contract.)
    */
  def lines(df: DataFrame): Dataset[String] = {
    import df.sparkSession.implicits._
    val cols: Seq[Column] = df.columns.toIndexedSeq.map(c => col(c).cast("string"))
    df.select(concat_ws("\t", cols: _*).as("line"))
      .orderBy(col("line"))
      .as[String]
  }

  /** Write as a single sorted text file (golden-compare form). */
  def write(df: DataFrame, path: String): Unit =
    lines(df).coalesce(1).write.mode("overwrite").text(path)

  /** The scale form of the S2 contract: `shards` range-partitioned sorted
    * files. Keys are range-partitioned by the sort key and sorted within
    * each partition, so every line of part-file N orders before every
    * line of part-file N+1 — concatenating the files in name order
    * reproduces [[write]]'s single sorted stream, but the sort and the
    * write parallelize across the cluster instead of funneling through
    * one task.
    */
  def writeSharded(df: DataFrame, path: String, shards: Int): Unit = {
    import df.sparkSession.implicits._
    val cols: Seq[Column] = df.columns.toIndexedSeq.map(c => col(c).cast("string"))
    // range-partition and sort by the FULL line (same total order as
    // [[lines]]), so concatenation equivalence holds under duplicate keys
    df.select(concat_ws("\t", cols: _*).as("line"))
      .repartitionByRange(shards, col("line"))
      .sortWithinPartitions(col("line"))
      .as[String]
      .write.mode("overwrite").text(path)
  }

  /** Collect as the reference's `hdfs dfs -cat` output (tests only). */
  def collect(df: DataFrame): Seq[String] = lines(df).collect().toIndexedSeq
}
