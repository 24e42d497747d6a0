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

  test("dynamic partition pruning: a selective dim join prunes fact partitions at runtime") {
    val dir = Files.createTempDirectory("graft-dpp").toString
    val fact = (1 to 30000).map(i => (i.toLong, s"src${i % 10}", i % 100)).toDF("id", "src", "v")
    Sinks.partitionedParquet(fact, dir, Seq("src"))
    // dim filter selects ONE of the 10 partitions; the fact side only
    // learns which at runtime (through the join), so static pruning can't
    // help — this is exactly the DPP shape of a 100 TB star join. The dim
    // must be a real scan (a local Seq constant-folds its Filter away and
    // DPP sees no selective predicate to reuse).
    val dimDir = Files.createTempDirectory("graft-dpp-dim").toString
    (0 until 10).map(i => (s"src$i", i)).toDF("d_src", "d_id")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).where(col("d_id") === 7)
    val f = spark.read.parquet(dir)
    val q = f.join(dim, f("src") === dim("d_src"))
      .agg(sum(col("v")).as("sv"), count(lit(1)).as("cnt"))
    val row = q.collect().head
    assert(row.getLong(1) == 3000)
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"),
      s"no dynamic partition pruning subquery on the fact scan:\n$p")
  }

  test("schema evolution: mergeSchema unions lake file schemas; unionByName fills gaps") {
    val dir = Files.createTempDirectory("graft-evolve").toString
    // v1 files lack the `source` column a later writer added
    Seq((1L, "t1")).toDF("id", "text").write.parquet(s"$dir/batch=1")
    Seq((2L, "t2", "web")).toDF("id", "text", "source").write.parquet(s"$dir/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "text", "source", "batch"))
    val bySource = merged.select("id", "source").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(bySource == Map(1L -> None, 2L -> Some("web")),
      "old files must surface the new column as null")

    // the DataFrame-level counterpart for in-flight merges
    val v1 = Seq((1L, "t1")).toDF("id", "text")
    val v2 = Seq((2L, "t2", "web")).toDF("id", "text", "source")
    val u = v1.unionByName(v2, allowMissingColumns = true)
    assert(u.count() == 2 && u.columns.toSet == Set("id", "text", "source"))
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
