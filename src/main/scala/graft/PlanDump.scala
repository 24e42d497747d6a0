package graft
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for selected declared queries — the
  * optimization rounds' plan artifact (`plans/rNN/<query>_{before,after}.txt`).
  * A declared query is a harness function returning its final DataFrame;
  * running it executes the harness side effects (table creation, DML),
  * then the returned frame's formatted physical plan is written out.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> q48,q91,...
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, list) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.engine.SparkEngine.session(
      master = s"local[$cpus]", appName = "graft-plandump", shufflePartitions = cpus)
    Files.createDirectories(Paths.get(outDir))
    // exact-or-underscore-prefix match: `q17` selects q17_foo but NOT
    // q170_bar (bare startsWith dumped misleading neighbors)
    val wanted = list.split(",").map(_.trim).toSet
    SparkEntry.queries
      .filter { case (n, _) => wanted.exists(w => n == w || n.startsWith(w + "_")) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
          System.err.println(s"[plandump] wrote $name")
        } catch {
          case e: Throwable => System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
        }
        graft.engine.ManagedCache.unpersistAll()
      }
    spark.stop()
  }
}
