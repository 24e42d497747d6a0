package graft

import graft.engine.SparkEngine

/** Poor-man's driver profiler for the per-statement gap: samples the main
  * thread's stack every few ms while a loop of warm DML statements runs,
  * then prints the hottest collapsed frames. Attributes the driver-side
  * time between Spark jobs (Catalyst phases, commit I/O, footer reads)
  * that DmlProfile can only report as an undifferentiated gap. Manual
  * probe; not part of the driver contract.
  *
  * Usage: runMain graft.GapProfile [sfDir] [nStatements]
  */
object GapProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(30)
    val spark = SparkEngine.session(master = "local[32]", appName = "graft-gap-profile",
      shufflePartitions = 32)
    spark.conf.set("spark.sql.catalog.graft.warehouse",
      java.nio.file.Files.createTempDirectory("graft-gap-profile").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    graft.sources.Sources.table(spark, dir, "orders").createOrReplaceTempView("p_orders")
    val t = "graft.db.gap"
    spark.sql(s"CREATE TABLE $t (o_orderkey BIGINT, o_orderstatus STRING, " +
      "o_totalprice DOUBLE) PARTITIONED BY (o_orderstatus) " +
      "TBLPROPERTIES (statsCols 'o_orderkey,o_totalprice')")
    spark.sql(s"INSERT INTO $t SELECT o_orderkey, o_orderstatus, " +
      "CAST(o_totalprice AS DOUBLE) FROM p_orders")
    // warm-up: one of each statement shape
    spark.sql(s"UPDATE $t SET o_totalprice = o_totalprice * 2 WHERE o_orderkey % 101 = 5")
    spark.sql(s"DELETE FROM $t WHERE o_orderkey % 103 = 7")
    spark.sql(s"INSERT INTO $t VALUES (3000000001, 'F', 1.5)")

    val main = Thread.currentThread()
    val samples = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
    val sampler = new Thread {
      override def run(): Unit = {
        while (GapProfile.running) {
          val state = main.getState.toString.take(4)
          val st = main.getStackTrace
          if (st.nonEmpty) {
            // keep the innermost 6 "interesting" frames (graft / spark /
            // parquet / hadoop / io), prefixed with the thread state so
            // RUNNABLE driver CPU separates from parked job waits
            val frames = st.iterator.filter { f =>
              val c = f.getClassName
              c.startsWith("graft.") || c.startsWith("org.apache.spark") ||
                c.startsWith("org.apache.parquet") || c.startsWith("java.io") ||
                c.startsWith("org.apache.hadoop")
            }.take(6).map(f => s"${f.getClassName.split("\\.").last}.${f.getMethodName}")
              .mkString("<")
            samples.merge(s"$state $frames", 1L, (a, b) => a + b)
          }
          Thread.sleep(2)
        }
      }
    }
    running = true
    sampler.setDaemon(true)
    sampler.start()
    val t0 = System.nanoTime()
    var i = 0
    while (i < n) {
      spark.sql(s"UPDATE $t SET o_totalprice = o_totalprice * 1.0001 WHERE o_orderkey % 101 = ${i % 50}")
      i += 1
    }
    val wall = (System.nanoTime() - t0) / 1e9
    running = false
    Thread.sleep(50)
    println(f"[gapprofile] $n UPDATE statements in $wall%.2f s (${wall / n}%.3f s each)")
    import scala.jdk.CollectionConverters._
    val top = samples.asScala.toSeq.sortBy(-_._2).take(40)
    val total = samples.asScala.values.map(_.toLong).sum.max(1L)
    top.foreach { case (k, v) =>
      println(f"[gapprofile] ${v.toLong * 100.0 / total}%5.1f%% ($v%6d) $k")
    }
    spark.stop()
  }
  @volatile private var running = false
}
