package graft
import org.apache.spark.sql.SparkSession
import graft.engine.SparkEngine

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":"total","value":N,"unit":"sec",...}.
  *
  * Methodology (judge round-1 findings):
  *   - full materialization through the noop sink, NOT count() — count()
  *     lets Catalyst prune projections and drop the final sort, so e.g. a
  *     CASE WHEN ladder or an ORDER BY would never execute;
  *   - one untimed warm-up pass so JVM/codegen/first-query setup cost is
  *     not attributed to whichever query happens to run first;
  *   - the session comes from SparkEngine.session, i.e. the engine's real
  *     configuration (AQE on, skew-join splitting, UTC) is what's measured.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkEngine.session(master = s"local[$cpus]", appName = "graft-bench",
      shufflePartitions = cpus)

    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      // caches an operator persisted internally during a PREVIOUS query
      // (tracked in ManagedCache) must not subsidize this one's timing
      graft.engine.ManagedCache.unpersistAll()
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}"); return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    // Optional subset for local iteration: SPARK_GRAFT_ONLY=q21,q22
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val queries = SparkEntry.queries.filter { case (n, _) => only.forall(_.exists(n.startsWith)) }

    // Warm-up: full untimed pass (codegen compile, parquet footer reads,
    // JIT). Then two timed passes; report the min per query — GC pauses
    // and scheduler jitter only ever ADD time, so the min is the better
    // estimate of the plan's true cost.
    queries.foreach { case (n, f) => runOnce(n, f) }
    val t1 = queries.map { case (n, f) => n -> runOnce(n, f) }
    val t2 = queries.map { case (n, f) => n -> runOnce(n, f) }
    val results = queries.map { case (n, _) =>
      val (a, b) = (t1(n), t2(n))
      n -> (if (a < 0) b else if (b < 0) a else math.min(a, b))
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => k }.toSeq
    val total = results.values.filter(_ >= 0).sum
    // `failed` is load-bearing: a -1.0 sentinel contributes nothing to the
    // total, so without this field a run with crashed queries looks FASTER
    // than a clean one (round-12 lesson). Nonzero exit below for the same
    // reason — automation must not record a partial bench as a baseline.
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    println(line)
    // Stdout passes through the driver's tail capture, which has truncated
    // per-query timings before (BENCH_r09 lost q05/q73) — persist the full
    // line to a file too so every entry survives regardless of capture.
    // SPARK_GRAFT_ONLY runs skip the write: a one-query iteration must not
    // clobber the full-suite artifact.
    if (only.isEmpty)
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
        (line + "\n").getBytes("UTF-8"))
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(s"[bench] ${failed.size} queries FAILED: ${failed.mkString(",")}")
      sys.exit(1)
    }
  }
}
