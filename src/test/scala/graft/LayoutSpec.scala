package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Z-order layout: measures that the clustered write actually changes
  * what the scan READS, not just how files sort. The metric is the
  * FileSourceScanExec numOutputRows after an executed filter query —
  * i.e. rows surviving parquet row-group pruning, before the post-scan
  * filter. No special read path: plain `spark.read.parquet` with
  * default filter pushdown.
  */
class LayoutSpec extends SparkSpec {

  private def scanRows(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, "no FileSourceScanExec in executed plan")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("z-order layout prunes row groups on both axes; linear sort only on its own") {
    val n = 1 << 19 // 512k rows, 64 files => 8k rows/file
    val dir = Files.createTempDirectory("graft-layout").toFile
    dir.deleteOnExit()
    val lin = s"${dir.getAbsolutePath}/linear"
    val zod = s"${dir.getAbsolutePath}/zorder"

    // Deterministic uniform 1024x1024 grid; no correlation between axes.
    val df = spark.range(n).select(
      pmod(xxhash64(col("id")), lit(1024)).as("x"),
      pmod(xxhash64(col("id"), lit(1)), lit(1024)).as("y"),
      col("id").as("payload"))
    Layout.linearWrite(df, col("x"), 64, lin)
    Layout.zorderWrite(df, col("x"), col("y"), 64, zod)

    def read(p: String) = spark.read.parquet(p)
    val box = (d: DataFrame) => d.where(col("x") < 128 && col("y") < 128)
    val yOnly = (d: DataFrame) => d.where(col("y") < 128)

    // Same answer under both layouts.
    val expectBox = box(read(lin)).count()
    assert(box(read(zod)).count() === expectBox)
    assert(yOnly(read(zod)).count() === yOnly(read(lin)).count())

    // Box on (x, y): linear prunes only the x range (~1/8 of rows);
    // z-order's aligned 128x128 box is a contiguous Morton range
    // (~1/64). Assert a conservative 2x gap to stay robust to range
    // boundary placement.
    val linBox = scanRows(box(read(lin)))
    val zodBox = scanRows(box(read(zod)))
    assert(zodBox * 2 <= linBox, s"z-order box scan $zodBox !<< linear $linBox")

    // y-only filter: the linear-by-x layout cannot prune at all (reads
    // everything); z-order still skips most tiles.
    val linY = scanRows(yOnly(read(lin)))
    val zodY = scanRows(yOnly(read(zod)))
    assert(linY >= (n * 9L) / 10, s"linear layout unexpectedly pruned y-filter: $linY of $n")
    assert(zodY * 2 <= linY, s"z-order y-only scan $zodY !<< linear $linY")

    info(s"box scan rows: linear=$linBox zorder=$zodBox (of $n)")
    info(s"y-only scan rows: linear=$linY zorder=$zodY (of $n)")
  }

  test("3-dim z-order: a box filter on (x, y, z) prunes on every axis") {
    val n = 1 << 19
    val dir = Files.createTempDirectory("graft-layout3").toFile
    dir.deleteOnExit()
    val lin = s"${dir.getAbsolutePath}/linear"
    val zod = s"${dir.getAbsolutePath}/zorder3"
    // uniform 256^3 grid, independent axes
    val df = spark.range(n).select(
      pmod(xxhash64(col("id")), lit(256)).as("x"),
      pmod(xxhash64(col("id"), lit(1)), lit(256)).as("y"),
      pmod(xxhash64(col("id"), lit(2)), lit(256)).as("z"),
      col("id").as("payload"))
    Layout.linearWrite(df, col("x"), 64, lin)
    Layout.zorderWrite(df, Seq(col("x"), col("y"), col("z")), 64, zod)
    def read(p: String) = spark.read.parquet(p)
    val box = (d: DataFrame) =>
      d.where(col("x") < 64 && col("y") < 64 && col("z") < 64)
    val zOnly = (d: DataFrame) => d.where(col("z") < 64)
    assert(box(read(zod)).count() === box(read(lin)).count())
    // aligned 64^3 box = 1/64 of the space: the 3-dim tiles prune far
    // below what the x-only linear sort can reach (~1/4 of rows)
    val linBox = scanRows(box(read(lin)))
    val zodBox = scanRows(box(read(zod)))
    assert(zodBox * 2 <= linBox, s"zorder3 box scan $zodBox !<< linear $linBox")
    // a z-only filter: linear-by-x reads everything, zorder3 still skips
    val linZ = scanRows(zOnly(read(lin)))
    val zodZ = scanRows(zOnly(read(zod)))
    assert(linZ >= (n * 9L) / 10, s"linear layout unexpectedly pruned z-filter: $linZ")
    assert(zodZ * 2 <= linZ, s"zorder3 z-only scan $zodZ !<< linear $linZ")
    info(s"3d box scan rows: linear=$linBox zorder3=$zodBox (of $n)")
  }

  test("OPTIMIZE zorderCols: compaction re-clusters on the Morton key, pruning returns") {
    val root = s"${Files.createTempDirectory("graft-zopt")}/t"
    import graft.operators.LakeTable
    val df = spark.range(1 << 16).select(
      pmod(xxhash64(col("id")), lit(256)).as("x"),
      pmod(xxhash64(col("id"), lit(1)), lit(256)).as("y"),
      lit("p").as("p"))
    // four appends: each file spans the whole (x, y) domain — stats prune nothing
    LakeTable.init(spark, root, df.where(col("id") % 4 === 0), "p", statsCols = Seq("x", "y"))
    (1 to 3).foreach(i => LakeTable.append(spark, root,
      df.where(col("id") % 4 === i)))
    val before = LakeTable.snapshot(spark, root)
    assert(before.entries.size === 4)
    val stats = LakeTable.optimize(spark, root, minFilesPerPartition = 2,
      maxRecordsPerFile = 4096, zorderCols = Seq("x", "y"))
    assert(stats.filesRewritten === 4)
    // same contents
    assert(LakeTable.read(spark, root).count() === (1 << 16))
    assert(LakeTable.read(spark, root).agg(sum(col("x"))).head.getLong(0) ===
      df.agg(sum(col("x"))).head.getLong(0))
    // manifest min/max now tight per file in BOTH dimensions: a corner
    // box range-read prunes most files
    val after = LakeTable.snapshot(spark, root)
    assert(after.entries.size >= 4, "maxRecordsPerFile should split the partition")
    val prunedX = LakeTable.readRangeOn(spark, root, "x", 0L, 31L).inputFiles.length
    val prunedY = LakeTable.readRangeOn(spark, root, "y", 0L, 31L).inputFiles.length
    assert(prunedX * 2 <= after.entries.size,
      s"x-range read must skip most z-ordered files: $prunedX of ${after.entries.size}")
    assert(prunedY * 2 <= after.entries.size,
      s"y-range read must skip most z-ordered files: $prunedY of ${after.entries.size}")
  }

  test("compact collapses a many-small-files layout and restores key pruning") {
    val n = 1 << 17 // 128k rows
    val dir = Files.createTempDirectory("graft-compact").toFile
    dir.deleteOnExit()
    val src = s"${dir.getAbsolutePath}/small"
    val out = s"${dir.getAbsolutePath}/compacted"
    val outPlain = s"${dir.getAbsolutePath}/compacted_plain"

    // Simulate per-trigger ingest: 64 appends, each spanning the WHOLE
    // key range (every small file has useless min/max stats).
    val df = spark.range(n).select(
      pmod(xxhash64(col("id")), lit(100000)).as("k"), col("id").as("payload"))
    df.repartition(64).write.mode("overwrite").parquet(src)
    val filesBefore = new java.io.File(src).listFiles().count(_.getName.endsWith(".parquet"))
    assert(filesBefore == 64)

    val totalBytes = new java.io.File(src).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val (before, after) = Layout.compact(
      spark, src, out, targetFileBytes = totalBytes / 8 + 1, clusterBy = Seq(col("k")))
    assert(before == 64 && after <= 8)
    val filesAfter = new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet"))
    assert(filesAfter == after, s"wrote $filesAfter files, planned $after")

    // Content identical (it's a rewrite, not a transformation).
    val a = spark.read.parquet(src); val b = spark.read.parquet(out)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)

    // The small-file layout cannot prune a key filter (every file spans
    // the full range); the clustered compaction prunes most of it.
    val q = (p: String) => spark.read.parquet(p).where(col("k") < 5000)
    val smallScan = scanRows(q(src))
    val compScan = scanRows(q(out))
    assert(smallScan >= (n * 9L) / 10, s"small files unexpectedly pruned: $smallScan of $n")
    assert(compScan * 4 <= smallScan, s"compacted scan $compScan !<< small-file $smallScan")

    // Unclustered compaction must not shuffle: plan has no Exchange.
    Layout.compact(spark, src, outPlain, targetFileBytes = totalBytes / 8 + 1)
    val plainFiles = new java.io.File(outPlain).listFiles().count(_.getName.endsWith(".parquet"))
    assert(plainFiles <= 8)
    val plan = spark.read.parquet(src).coalesce(8).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"coalesce compaction should not shuffle:\n$plan")

    info(s"compaction: $before files -> $filesAfter; key-filter scan $smallScan -> $compScan")
  }
}
