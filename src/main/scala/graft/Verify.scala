package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    // Same session factory as the engine + bench: AQE on, UTC, sized
    // shuffle partitions — verify must exercise the configured engine.
    val spark = graft.engine.SparkEngine.session(
      master = s"local[$cpus]", appName = "graft-verify", shufflePartitions = cpus)
    new java.io.File(outDir).mkdirs()
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // Optional subset for local iteration (mirrors Bench): SPARK_GRAFT_ONLY=q140,q141
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failures(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
      }
      // don't let operator-internal caches accumulate across ~40 queries
      graft.engine.ManagedCache.unpersistAll()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // A query that throws must NOT vanish into a silently-smaller report
    // (round 12: 10 crashed queries were simply absent and the remaining
    // 114 read as a full pass). Dump the failures where the driver and the
    // judge can see them, and exit nonzero so automation can't mistake a
    // partial run for a clean one.
    Files.writeString(Paths.get(s"$outDir/errors.json"),
      failures.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    System.err.println(
      s"[verify] ${selected.size - failures.size}/${selected.size} queries dumped" +
        (if (failures.nonEmpty) s"; FAILED: ${failures.keys.mkString(",")}" else ""))
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
