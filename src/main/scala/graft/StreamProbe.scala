package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.engine.SparkEngine
import graft.sources.Sources
import graft.streaming.StreamOps

/** Streaming throughput/state probe (not part of the driver contract):
  * replays the `events` fixture in arrival order through MemoryStream
  * micro-batches into the RocksDB-backed stateful operators, at two
  * input scales, and reports rows/sec plus end-of-run state-store size
  * (rows + bytes) per operator — evidence that state stays
  * watermark-bounded (grows with key cardinality inside the watermark,
  * not with rows ingested) while throughput holds as input scales.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.StreamProbe
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEngine.session(master = "local[32]", appName = "graft-streamprobe",
      shufflePartitions = 32)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._

    import org.apache.spark.sql.functions._
    val all = Sources.table(spark, sfDir, "events")
      // fixture parquet type is TIMESTAMP(NANOS), read as epoch-nanos
      // long (SparkEngine aligns the legacy flag) — convert to a real
      // timestamp at micros precision (the q27/q40 convention)
      .select(col("event_id"), timestamp_micros(expr("ts div 1000")).as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[StreamOps.Event]
      .collect()
      .sortBy(_.ts.getTime) // replay in event-time arrival order

    def run(label: String, n: Int, batchRows: Int)(
        build: DataFrame => DataFrame): Unit = {
      implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
      val ms = MemoryStream[StreamOps.Event]
      val ckpt = java.nio.file.Files.createTempDirectory(s"graft-sp-$label").toString
      val q = build(ms.toDS().toDF())
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode("append") // session windows emit on watermark close
        .start()
      try {
        val t0 = System.nanoTime()
        all.take(n).grouped(batchRows).foreach { chunk =>
          ms.addData(chunk.toIndexedSeq)
          q.processAllAvailable()
        }
        val secs = (System.nanoTime() - t0) / 1e9
        val so = q.lastProgress.stateOperators
        val stateRows = so.map(_.numRowsTotal).sum
        val stateBytes = so.map(_.memoryUsedBytes).sum
        println(f"""[streamprobe] {"op":"$label","rows":$n,"secs":$secs%.1f,""" +
          f""""rows_per_sec":${n / secs}%.0f,"state_rows":$stateRows,""" +
          f""""state_bytes":$stateBytes}""")
      } finally q.stop()
    }

    val n = all.length
    for (scale <- Seq(n / 4, n)) {
      run(s"sessionize_rocksdb_$scale", scale, batchRows = 20000)(df =>
        StreamOps.sessionize(df, "ts", org.apache.spark.sql.functions.col("user_id"),
          gap = "30 minutes", lateness = "10 minutes"))
      run(s"dedup_within_watermark_$scale", scale, batchRows = 20000)(df =>
        StreamOps.dedupStream(df, "ts", Seq("event_id"), lateness = "10 minutes"))
    }
    spark.stop()
  }
}
