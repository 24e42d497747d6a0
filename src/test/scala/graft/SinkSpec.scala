package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Sinks

/** Partitioned-parquet layout and the read-side payoff: partition pruning
  * visible in the plan, and only the selected directory's data read.
  */
class SinkSpec extends SparkSpec {
  import spark.implicits._

  test("partitionBy writes value directories; filters prune them at planning") {
    val dir = Files.createTempDirectory("graft-sink").toString
    val df = (1 to 3000).map(i => (i.toLong, s"lang${i % 3}", s"text $i")).toDF("id", "lang", "text")
    Sinks.partitionedParquet(df, dir, Seq("lang"))

    val dirs = new java.io.File(dir).listFiles.filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("lang=lang0", "lang=lang1", "lang=lang2"))

    val filtered = spark.read.parquet(dir).where(col("lang") === "lang1")
    assert(filtered.count() == 1000)
    val p = filtered.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(lang"),
      s"partition filter not pushed to the scan:\n$p")
    // pruning is structural: only the matching directory's files are scanned
    val scanned = filtered.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(scanned.nonEmpty && scanned.forall(_.contains("lang=lang1")))
  }

  test("round-trip preserves rows and the partition column") {
    val dir = Files.createTempDirectory("graft-sink2").toString
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "src", "x")
    Sinks.partitionedParquet(df, dir, Seq("src"))
    val back = spark.read.parquet(dir)
    assert(back.select("id", "src", "x").collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      == Set((1L, "a", 1.5), (2L, "b", 2.5)))
  }
}
