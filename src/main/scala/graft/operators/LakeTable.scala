package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Transactional copy-on-write table on plain parquet — the MERGE INTO
  * upsert the incremental-ingest chain (q113 signature appends, q117
  * incremental groups, streaming sinks) was missing: those paths can
  * append forever, but correcting or upserting previously-written rows
  * required rewriting the whole dataset non-atomically.
  *
  * Design (the lakehouse-log idiom, scaled down to its essentials):
  *
  *   - data files are immutable parquet under `<root>/data/batch-*&#47;`,
  *     each carrying the FULL schema (the partition column is stored in
  *     the file as well as in the directory name, so any file list reads
  *     standalone);
  *   - a SNAPSHOT is a manifest file `<root>/_manifests/v<N>.manifest`
  *     listing `(partitionValue, relativePath)` per live data file; the
  *     current table state is the highest-numbered manifest;
  *   - COMMIT is one atomic same-directory rename (tmp -> vN.manifest).
  *     Rename fails if vN exists — two concurrent writers race to the
  *     same version number and exactly one wins (optimistic concurrency,
  *     the loser retries on a fresh snapshot). A crash anywhere before
  *     the rename leaves only unreferenced data files: readers still see
  *     the previous snapshot, and `vacuum` reclaims the orphans later.
  *     LakeTableSpec proves both properties by construction (uncommitted
  *     batch invisible; duplicate commit refused).
  *
  * MERGE (source wins on key, unmatched source rows insert) is
  * copy-on-write at FILE granularity:
  *
  *   1. matched-partition discovery: one semi-join of the target against
  *      the (broadcast) source keys, aggregated to the distinct partition
  *      values containing a match — metadata-sized result. Files in
  *      partitions with no match and no insert are NOT rewritten; their
  *      manifest entries carry over verbatim (the spec pins unchanged
  *      paths). This handles partition-moving updates correctly: a row
  *      whose new partition value differs still has its OLD file's
  *      partition rewritten, because the match lives there;
  *   2. rewrite = source rows ∪ (affected-partition target rows
  *      anti-joined on key) written once, hash-partitioned by partition
  *      value — one shuffle sized by the affected slice, never the table;
  *   3. commit as above.
  *
  * At 100 TB the cost is proportional to the touched partitions (the
  * usual upsert locality: late-arriving corrections cluster in recent
  * partitions), the manifest is O(files) metadata, and the scheme needs
  * nothing from the filesystem beyond atomic same-dir rename — the same
  * contract HDFS/local give and object-store committers emulate.
  */
object LakeTable {

  case class MergeStats(
      version: Long,
      matchedPartitions: Long,
      filesRewritten: Long,
      filesCarried: Long,
      rowsWritten: Long)

  private val PartDirCol = "__part"

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(root: String) = new Path(root, "_manifests")

  /** (version, entries) of the current snapshot; entries are
    * (partitionValue, relativePath). Version 0 = empty table.
    */
  def snapshot(spark: SparkSession, root: String): (Long, Seq[(String, String)]) = {
    val dir = manifestDir(root)
    val f = fs(spark, dir)
    if (!f.exists(dir)) return (0L, Nil)
    val versions = f.listStatus(dir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
      .map(n => n.stripPrefix("v").stripSuffix(".manifest").toLong)
    if (versions.isEmpty) return (0L, Nil)
    val v = versions.max
    val in = f.open(new Path(dir, s"v$v.manifest"))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val entries = text.split("\n").iterator.filter(_.nonEmpty).map { line =>
      val Array(pv, rel) = line.split("\t", 2)
      (pv, rel)
    }.toSeq
    (v, entries)
  }

  /** Atomically commit `entries` as version `v` (must be prev + 1).
    * Returns false if some other writer committed `v` first.
    * (`private[graft]` so LakeTableSpec can race two commits directly.)
    */
  private[graft] def commit(
      spark: SparkSession,
      root: String,
      v: Long,
      entries: Seq[(String, String)]): Boolean = {
    val dir = manifestDir(root)
    val f = fs(spark, dir)
    f.mkdirs(dir)
    val tmp = new Path(dir, s".tmp-v$v-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write(entries.map { case (pv, rel) => s"$pv\t$rel" }.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    // same-directory rename: atomic; fails (returns false) if the
    // destination exists — exactly one of two racing commits wins
    val ok = f.rename(tmp, new Path(dir, s"v$v.manifest"))
    if (!ok) f.delete(tmp, false)
    ok
  }

  /** Write `df` as a new immutable batch, partitioned by `partitionCol`
    * (stored BOTH in the directory name and inside the files). Returns
    * the manifest entries for the written files. Not visible to readers
    * until a manifest referencing them is committed.
    */
  private def writeBatch(
      spark: SparkSession,
      root: String,
      df: DataFrame,
      partitionCol: String): Seq[(String, String)] = {
    val batch = s"batch-${java.util.UUID.randomUUID().toString.take(8)}"
    val dataDir = new Path(new Path(root, "data"), batch)
    df.withColumn(PartDirCol, col(partitionCol).cast("string"))
      .repartition(col(PartDirCol))
      .write.partitionBy(PartDirCol).mode("append").parquet(dataDir.toString)
    val f = fs(spark, dataDir)
    val it = f.listFiles(dataDir, true)
    Iterator.continually(it).takeWhile(_.hasNext).map(_.next())
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map { s =>
        val p = s.getPath
        val pv = p.getParent.getName match {
          case d if d.startsWith(s"$PartDirCol=") => d.stripPrefix(s"$PartDirCol=")
          case d => sys.error(s"unexpected data layout at $p (dir $d)")
        }
        // URL-decode the partition dir segment (spaces etc.)
        (java.net.URLDecoder.decode(pv, "UTF-8"), s"data/$batch/$PartDirCol=$pv/${p.getName}")
      }.toSeq
  }

  /** Create the table (version 1) from `df`. Fails if it already exists. */
  def init(spark: SparkSession, root: String, df: DataFrame, partitionCol: String): Unit = {
    val (v, _) = snapshot(spark, root)
    require(v == 0, s"LakeTable.init: $root already at version $v")
    val entries = writeBatch(spark, root, df, partitionCol)
    require(commit(spark, root, 1, entries), s"LakeTable.init: concurrent commit at $root")
  }

  /** Current table contents (the committed snapshot only — in-flight or
    * orphaned batches are invisible by construction).
    */
  def read(spark: SparkSession, root: String): DataFrame = {
    val (v, entries) = snapshot(spark, root)
    require(v > 0, s"LakeTable.read: no committed snapshot at $root")
    spark.read.parquet(entries.map(e => s"$root/${e._2}"): _*)
  }

  /** Time travel: the table exactly as committed at `version`. Every
    * manifest is immutable and every data file is immutable, so any
    * version not yet vacuumed reads back bit-for-bit — the audit/debug
    * face of snapshot isolation (NB: `vacuum` keeps only the CURRENT
    * version's files; time travel is for the un-vacuumed window).
    */
  def readVersion(spark: SparkSession, root: String, version: Long): DataFrame = {
    val dir = manifestDir(root)
    val f = fs(spark, dir)
    val mf = new Path(dir, s"v$version.manifest")
    require(f.exists(mf), s"LakeTable.readVersion: no v$version at $root")
    val in = f.open(mf)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val files = text.split("\n").iterator.filter(_.nonEmpty)
      .map(_.split("\t", 2)(1)).toSeq
    spark.read.parquet(files.map(rel => s"$root/$rel"): _*)
  }

  /** MERGE INTO: rows of `source` matching target rows on `keyCols`
    * replace them (source wins); unmatched source rows are inserted.
    * Copy-on-write over the affected partitions only; atomic commit.
    */
  def merge(
      spark: SparkSession,
      root: String,
      source: DataFrame,
      keyCols: Seq[String],
      partitionCol: String): MergeStats =
    mergeImpl(spark, root, source, keyCols, partitionCol, () => ())

  /** [[merge]] with a pre-commit hook — the deterministic injection point
    * LakeTableSpec uses to steal the version number mid-merge and prove
    * the conflict is detected (a real race hits the same rename).
    */
  private[graft] def mergeImpl(
      spark: SparkSession,
      root: String,
      source: DataFrame,
      keyCols: Seq[String],
      partitionCol: String,
      preCommit: () => Unit): MergeStats = {
    val (v, entries) = snapshot(spark, root)
    require(v > 0, s"LakeTable.merge: no committed snapshot at $root")
    val target = read(spark, root)
    val srcKeys = source.select(keyCols.map(col): _*).distinct()

    // partitions holding a matched key (one probe of the target against
    // the broadcast source keys) ∪ partitions receiving source rows
    val matched = target
      .join(broadcast(srcKeys), keyCols, "left_semi")
      .select(col(partitionCol).cast("string")).distinct()
    val affected = matched
      .union(source.select(col(partitionCol).cast("string")).distinct())
      .collect().map(_.getString(0)).toSet

    val (rewrite, carry) = entries.partition(e => affected.contains(e._1))
    // survivors of the affected slice: target rows there whose key has no
    // source match — read ONLY the rewritten files, not the table
    val survivors =
      if (rewrite.isEmpty) None
      else Some(
        spark.read.parquet(rewrite.map(e => s"$root/${e._2}"): _*)
          .join(broadcast(srcKeys), keyCols, "left_anti"))
    val merged = survivors.fold(source)(s => source.unionByName(s))
    val written = writeBatch(spark, root, merged, partitionCol)
    preCommit()
    require(
      commit(spark, root, v + 1, carry ++ written),
      s"LakeTable.merge: concurrent commit at $root (retry on a fresh snapshot)")
    MergeStats(
      version = v + 1,
      matchedPartitions = affected.size,
      filesRewritten = rewrite.size,
      filesCarried = carry.size,
      rowsWritten = written.size)
  }

  /** Transactional COW DELETE: remove every row where `predicate` is
    * TRUE (SQL DELETE semantics — NULL-predicate rows are KEPT). The
    * compliance face of the lake path: opt-out and contamination
    * removals on a training corpus must actually rewrite the bytes, not
    * just filter at read time. Same shape as [[merge]]: only files in
    * partitions CONTAINING a match are rewritten (one probe pass),
    * everything else carries by path; atomic manifest commit; a
    * re-issued delete is a no-op commit (idempotent).
    */
  def delete(
      spark: SparkSession,
      root: String,
      predicate: Column,
      partitionCol: String): MergeStats = {
    val (v, entries) = snapshot(spark, root)
    require(v > 0, s"LakeTable.delete: no committed snapshot at $root")
    val target = read(spark, root)
    val affected = target.where(predicate)
      .select(col(partitionCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSet
    val (rewrite, carry) = entries.partition(e => affected.contains(e._1))
    val written =
      if (rewrite.isEmpty) Nil
      else writeBatch(
        spark, root,
        spark.read.parquet(rewrite.map(e => s"$root/${e._2}"): _*)
          .where(!coalesce(predicate, lit(false))),
        partitionCol)
    require(
      commit(spark, root, v + 1, carry ++ written),
      s"LakeTable.delete: concurrent commit at $root (retry on a fresh snapshot)")
    MergeStats(v + 1, affected.size, rewrite.size, carry.size, written.size)
  }

  /** [[merge]] with optimistic-concurrency retries: a writer that loses
    * the commit race recomputes against the WINNER's snapshot and tries
    * again (its orphaned copy-on-write batch is reclaimed by the next
    * `vacuum`). This is the standard lakehouse-log loop; bounded retries
    * keep a livelocked writer from spinning forever under contention.
    */
  def mergeWithRetry(
      spark: SparkSession,
      root: String,
      source: DataFrame,
      keyCols: Seq[String],
      partitionCol: String,
      maxRetries: Int = 3): MergeStats =
    mergeWithRetryImpl(spark, root, source, keyCols, partitionCol, maxRetries, () => ())

  @annotation.tailrec
  private[graft] def mergeWithRetryImpl(
      spark: SparkSession,
      root: String,
      source: DataFrame,
      keyCols: Seq[String],
      partitionCol: String,
      maxRetries: Int,
      preCommit: () => Unit): MergeStats = {
    val attempt =
      try Right(mergeImpl(spark, root, source, keyCols, partitionCol, preCommit))
      catch {
        case e: IllegalArgumentException
            if e.getMessage != null && e.getMessage.contains("concurrent commit") &&
              maxRetries > 0 =>
          Left(e)
      }
    attempt match {
      case Right(stats) => stats
      case Left(_) =>
        mergeWithRetryImpl(spark, root, source, keyCols, partitionCol, maxRetries - 1, preCommit)
    }
  }

  /** Delete data files no committed manifest references (crash leftovers
    * and files replaced by copy-on-write). Safe any time: the current
    * snapshot's files are kept.
    */
  def vacuum(spark: SparkSession, root: String): Long = {
    val (v, entries) = snapshot(spark, root)
    require(v > 0, s"LakeTable.vacuum: no committed snapshot at $root")
    val live = entries.map(_._2).toSet
    val dataDir = new Path(root, "data")
    val f = fs(spark, dataDir)
    if (!f.exists(dataDir)) return 0L
    val it = f.listFiles(dataDir, true)
    val all = Iterator.continually(it).takeWhile(_.hasNext).map(_.next())
      .filter(_.isFile).map(_.getPath).toSeq
    val rootUri = new Path(root).toUri.getPath
    var removed = 0L
    all.foreach { p =>
      val rel = p.toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
      if (!live.contains(rel)) { f.delete(p, false); removed += 1 }
    }
    removed
  }
}
