package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine.SparkEngine

/** A/B benchmark for the money-representation swap documented in
  * TpchQueries: the exact-long-cents path (q68_tpch_pricing) vs the
  * decimal(12,2)/(38,6) path (q68PricingDecimal) that replaces it once
  * summed charges approach 2^63 (the ~100 TB regime). Same methodology
  * as [[Bench]] — noop-sink materialization, one untimed warm-up, two
  * timed passes, min per variant — so the number recorded in SURVEY §7b
  * is reproducible with:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.BenchAB"
  */
object BenchAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkEngine.session(master = s"local[$cpus]", appName = "graft-bench-ab",
      shufflePartitions = cpus)

    val variants: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "q68_long_cents" -> graft.queries.TpchQueries.queries("q68_tpch_pricing"),
      "q68_decimal38" -> (graft.queries.TpchQueries.q68PricingDecimal _))

    def runOnce(name: String, fn: (SparkSession, String) => DataFrame): Double = {
      graft.engine.ManagedCache.unpersistAll()
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench-ab] $name: ${e.getMessage}"); return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    variants.foreach { case (n, f) => runOnce(n, f) } // warm-up
    val results = variants.map { case (n, f) =>
      val (a, b) = (runOnce(n, f), runOnce(n, f))
      n -> (if (a < 0) b else if (b < 0) a else math.min(a, b))
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"money_ab","unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
