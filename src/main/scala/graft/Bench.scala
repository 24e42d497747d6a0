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

    // Host-factor calibration (two rounds of multi-tenant noise made
    // round-over-round comparison archaeology): a fixed, single-threaded,
    // CPU-bound microbenchmark whose time depends only on how fast this
    // machine currently executes a JVM — divide any headline total by
    // `host_factor` before comparing across rounds. REF_SEC is this
    // box measured quiet (round 14); host_factor ≈ 1.0 there, >1.0 when
    // the host is degraded/contended.
    def spin(): Double = {
      var x = 0x9E3779B97F4A7C15L
      var i = 0L
      val n = 400000000L
      val t0 = System.nanoTime()
      while (i < n) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17; x += 0x9E3779B97F4A7C15L; i += 1
      }
      val dt = (System.nanoTime() - t0) / 1e9
      if (x == 42L) System.err.println("") // keep the loop live
      dt
    }
    spin() // JIT warm-up
    val hostSec = math.min(spin(), spin())
    // multi-threaded variant: the SAME loop on one thread per CPU. On an
    // idle host the wall time equals the single-thread time (registers
    // only, no memory traffic — perfect scaling); a wall > single-thread
    // means the box is NOT delivering `cpus` cores right now (neighbor
    // tenancy, cgroup quota), which slows every 32-thread query while the
    // single-thread probe still reads ~1.0 — exactly the r14 signature.
    def spinMt(): Double = {
      val t0 = System.nanoTime()
      val ts = (0 until cpus).map(_ => new Thread { override def run(): Unit = spin() })
      ts.foreach(_.start()); ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    val hostSecMt = math.min(spinMt(), spinMt())
    // memory-bandwidth arm (r14 lesson): the register spin read ~1.0 while
    // real queries ran 1.4x — Spark's hot loops are memory-bound, so the
    // tenancy mode that bites is BANDWIDTH, which only a working set far
    // past LLC can see. STREAM-triad over 3 x 128 MiB arrays,
    // single-threaded, min of 2 timed sweeps after a warm-up.
    // The probe must never OOM the benchmark it serves, and a REDUCED
    // sweep must never masquerade as a full one (a 48 MiB working set
    // fits inside big-server LLCs, so scaling cache bandwidth up 8x
    // would report DRAM bandwidth the host does not have): under a
    // 2 GiB heap, host_factor_mem is simply -1 (unavailable), as it is
    // on allocation failure.
    val triadFull = 16 * 1024 * 1024 // longs per array; 3 arrays = 384 MiB
    val triadN = triadFull
    val hostSecMem =
      if (Runtime.getRuntime.maxMemory() < (2L << 30)) -1.0
      else try {
        val ta = new Array[Long](triadN); val tb = new Array[Long](triadN)
        val tc = new Array[Long](triadN)
        var ti = 0
        while (ti < triadN) { tb(ti) = ti; tc(ti) = 2L * ti; ti += 1 } // touch pages
        def triad(): Double = {
          val t0 = System.nanoTime()
          var i = 0
          while (i < triadN) { ta(i) = tb(i) + 3L * tc(i); i += 1 }
          (System.nanoTime() - t0) / 1e9
        }
        triad() // warm-up
        val best = math.min(triad(), triad())
        if (ta(triadN - 1) == 42L) System.err.println("") // keep the sweep live
        best
      } catch {
        case _: OutOfMemoryError => -1.0
      }
    val refSec = sys.env.getOrElse("SPARK_GRAFT_HOST_REF_SEC", "0.93").toDouble
    // quiet-host reference for the triad, measured round 15 on this box
    val refMemSec = sys.env.getOrElse("SPARK_GRAFT_HOST_REF_MEM_SEC", "0.032").toDouble
    val hostFactor = hostSec / refSec
    val hostFactorMt = hostSecMt / refSec
    val hostFactorMem = if (hostSecMem < 0) -1.0 else hostSecMem / refMemSec

    def line(queries: String) =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$queries,""" +
        s""""failed":$failedJson,"n":${results.size},"host_factor":${f"$hostFactor%.3f"},""" +
        s""""host_factor_mt":${f"$hostFactorMt%.3f"},"host_factor_mem":${f"$hostFactorMem%.3f"},""" +
        s""""host_sec":${f"$hostSec%.3f"},""" +
        s""""host_sec_mt":${f"$hostSecMt%.3f"},"host_sec_mem":${f"$hostSecMem%.3f"},"sf":"$sfDir"}"""
    // The driver keeps only a ~2 KB TAIL of stdout; a full 129-entry map
    // (~5 KB) truncates into unparseable JSON (BENCH_r09/r13 lesson). So
    // stdout carries a line that FITS — totals + the slowest queries in
    // milliseconds — and the complete per-query map (full precision) goes
    // to BENCH_FULL.json, which is the authoritative artifact.
    val top = results.filter(_._2 >= 0).toSeq.sortBy(-_._2).take(20)
      .map { case (k, v) => "\"" + k + "\":" + (math.rint(v * 1000) / 1000) }
      .mkString("{", ",", "}")
    println(line(top))
    // SPARK_GRAFT_ONLY runs skip the write: a one-query iteration must not
    // clobber the full-suite artifact.
    if (only.isEmpty)
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
        (line(qs) + "\n").getBytes("UTF-8"))
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(s"[bench] ${failed.size} queries FAILED: ${failed.mkString(",")}")
      sys.exit(1)
    }
  }
}
