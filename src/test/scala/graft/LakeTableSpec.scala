package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.LakeTable

/** Transactional copy-on-write MERGE (LakeTable): content correctness is
  * hash-checked by q130's oracle; this spec pins the TRANSACTIONAL
  * properties the oracle can't see — snapshot isolation around a crash
  * (an uncommitted batch is invisible), copy-on-write locality (files in
  * untouched partitions are carried by path, not rewritten), optimistic
  * concurrency (the second committer of a version is refused), and
  * vacuum reclaiming exactly the unreferenced files.
  */
class LakeTableSpec extends SparkSpec {

  private def freshRoot(): String = {
    val d = Files.createTempDirectory("graft-lake").toFile
    d.deleteOnExit()
    s"${d.getAbsolutePath}/tbl"
  }

  private def baseDf = {
    import spark.implicits._
    // 3 partitions, 300 rows; key = id
    spark.range(300).select(
      col("id").as("k"),
      (col("id") % 3).cast("string").as("p"),
      (col("id") * 10).as("v"))
  }

  test("merge = source-wins upsert; q121-style relational re-derivation matches") {
    val root = freshRoot()
    LakeTable.init(spark, root, baseDf, "p")
    // updates: even keys bump v and MOVE to partition "9" (partition-moving);
    // inserts: new keys 1000..1009 into partition "9"
    val updates = baseDf.where(col("k") % 2 === 0)
      .withColumn("v", col("v") + 1)
      .withColumn("p", lit("9"))
    val inserts = spark.range(1000, 1010).select(
      col("id").as("k"), lit("9").as("p"), lit(-1L).as("v"))
    val stats = LakeTable.merge(spark, root, updates.unionByName(inserts), Seq("k"), "p")
    assert(stats.version === 2)

    val got = LakeTable.read(spark, root).select("k", "p", "v")
    val expected = updates.unionByName(inserts)
      .unionByName(baseDf.where(col("k") % 2 =!= 0))
    assert(got.count() === 310)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("copy-on-write: files of untouched partitions carry over by path") {
    val root = freshRoot()
    LakeTable.init(spark, root, baseDf, "p")
    val (_, before) = LakeTable.snapshot(spark, root)
    // touch ONLY partition "0" (update two rows in place, no moves)
    val src = baseDf.where(col("k") === 0 || col("k") === 3)
      .withColumn("v", col("v") + 100)
    val stats = LakeTable.merge(spark, root, src, Seq("k"), "p")
    val (_, after) = LakeTable.snapshot(spark, root)
    val beforeByPart = before.groupBy(_._1)
    val afterPaths = after.map(_._2).toSet
    // untouched partitions' files still referenced verbatim
    beforeByPart.filter(_._1 != "0").foreach { case (_, entries) =>
      entries.foreach(e => assert(afterPaths.contains(e._2), s"untouched file ${e._2} rewritten"))
    }
    // touched partition's files all replaced
    beforeByPart("0").foreach(e => assert(!afterPaths.contains(e._2)))
    assert(stats.filesCarried === before.count(_._1 != "0"))
    assert(LakeTable.read(spark, root).count() === 300)
  }

  test("crash before commit is invisible; vacuum reclaims the orphans") {
    val root = freshRoot()
    LakeTable.init(spark, root, baseDf, "p")
    val readBefore = LakeTable.read(spark, root).agg(sum("v")).head.getLong(0)
    // simulate a crash mid-merge: the batch directory is written but no
    // manifest ever references it (writeBatch is the merge's first half)
    val orphanDir = s"$root/data/orphan-batch"
    baseDf.limit(50).withColumn("__part", col("p"))
      .write.partitionBy("__part").parquet(orphanDir)
    // readers still see ONLY the committed snapshot
    assert(LakeTable.read(spark, root).agg(sum("v")).head.getLong(0) === readBefore)
    assert(LakeTable.read(spark, root).count() === 300)
    // vacuum removes every unreferenced file; the table is unchanged
    val removed = LakeTable.vacuum(spark, root)
    assert(removed > 0)
    val fs = new org.apache.hadoop.fs.Path(orphanDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val leftIt = fs.listFiles(new org.apache.hadoop.fs.Path(root, "data"), true)
    val leftParquet = Iterator.continually(leftIt).takeWhile(_.hasNext).map(_.next())
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet") &&
        s.getPath.toString.contains("orphan-batch"))
    assert(leftParquet === 0, "vacuum left orphan data files")
    assert(LakeTable.read(spark, root).count() === 300)
    assert(LakeTable.read(spark, root).agg(sum("v")).head.getLong(0) === readBefore)
  }

  test("optimistic concurrency: second commit of the same version is refused") {
    val root = freshRoot()
    LakeTable.init(spark, root, baseDf, "p")
    val (v1, entries1) = LakeTable.snapshot(spark, root)
    assert(v1 === 1)
    // two writers race from the same snapshot: both try to commit v2 —
    // the same-directory rename lets exactly one win
    val winner = LakeTable.commit(spark, root, 2, entries1)
    val loser = LakeTable.commit(spark, root, 2, Nil)
    assert(winner && !loser)
    // the winner's manifest is intact (the loser did not clobber it)
    val (v2, entries2) = LakeTable.snapshot(spark, root)
    assert(v2 === 2 && entries2 === entries1)
    // a stale init must also refuse loudly rather than reset the table
    val ex = intercept[IllegalArgumentException] {
      LakeTable.init(spark, root, baseDf, "p")
    }
    assert(ex.getMessage.contains("already at version"))
  }

  test("time travel: any un-vacuumed version reads back exactly as committed") {
    val root = freshRoot()
    LakeTable.init(spark, root, baseDf, "p")
    val v1Sum = LakeTable.read(spark, root).agg(sum("v")).head.getLong(0)
    val src = baseDf.where(col("k") < 50).withColumn("v", col("v") * 2)
    LakeTable.merge(spark, root, src, Seq("k"), "p")
    // current == v2, history == v1, both stable
    assert(LakeTable.readVersion(spark, root, 1).agg(sum("v")).head.getLong(0) === v1Sum)
    val v2Sum = LakeTable.read(spark, root).agg(sum("v")).head.getLong(0)
    assert(LakeTable.readVersion(spark, root, 2).agg(sum("v")).head.getLong(0) === v2Sum)
    assert(v2Sum === v1Sum + (0 until 50).map(_ * 10).sum)
    // vacuum keeps only the current version's files: v1 gone, v2 intact
    LakeTable.vacuum(spark, root)
    assert(LakeTable.read(spark, root).agg(sum("v")).head.getLong(0) === v2Sum)
    intercept[Exception] {
      LakeTable.readVersion(spark, root, 1).agg(sum("v")).head.getLong(0)
    }
  }

  test("delete: COW locality, NULL-predicate rows kept, idempotent re-issue") {
    val root = freshRoot()
    import spark.implicits._
    // partition "0" carries rows with a NULL v to pin the NULL semantics
    val base = spark.range(300).select(
      col("id").as("k"), (col("id") % 3).cast("string").as("p"),
      when(col("id") % 50 === 0, lit(null).cast("long")).otherwise(col("id") * 10).as("v"))
    LakeTable.init(spark, root, base, "p")
    val (_, before) = LakeTable.snapshot(spark, root)
    // predicate TRUE only in partition "0"; NULL for the null-v rows there
    val stats = LakeTable.delete(spark, root, col("p") === "0" && col("v") < 1000, "p")
    // only partition "0" rewritten; others carried by path
    val (_, after) = LakeTable.snapshot(spark, root)
    val afterPaths = after.map(_._2).toSet
    before.filter(_._1 != "0").foreach(e => assert(afterPaths.contains(e._2)))
    assert(stats.matchedPartitions === 1)
    val got = LakeTable.read(spark, root)
    // deleted: p=0 AND v<1000 AND v NOT NULL -> k in {3,6,...,99} minus nulls
    val expected = base.where(!(col("p") === "0" && coalesce(col("v") < 1000, lit(false))))
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    // NULL-v rows in partition 0 survived (SQL DELETE keeps NULL predicate)
    assert(got.where(col("p") === "0" && col("v").isNull).count() ===
      base.where(col("p") === "0" && col("v").isNull).count())
    // re-issuing the delete is a no-op commit
    val n1 = got.count()
    LakeTable.delete(spark, root, col("p") === "0" && col("v") < 1000, "p")
    assert(LakeTable.read(spark, root).count() === n1)
  }

  test("mergeWithRetry: the race loser recomputes on the winner's snapshot") {
    val root = freshRoot()
    LakeTable.init(spark, root, baseDf, "p")
    // a one-shot saboteur steals the version number BETWEEN the merge's
    // snapshot read and its commit — exactly a losing race. The first
    // attempt must fail the rename; the retry recomputes against the
    // winner's snapshot and lands on the next version.
    var stole = false
    val steal: () => Unit = () =>
      if (!stole) {
        stole = true
        val (v, e) = LakeTable.snapshot(spark, root)
        assert(LakeTable.commit(spark, root, v + 1, e)) // the "winner"
      }
    val src = baseDf.where(col("k") < 10).withColumn("v", col("v") + 7)
    val stats = LakeTable.mergeWithRetryImpl(spark, root, src, Seq("k"), "p", 3, steal)
    assert(stole, "saboteur never ran — the race was not exercised")
    assert(stats.version === 3, s"expected the retry to land v3, got v${stats.version}")
    val got = LakeTable.read(spark, root)
    assert(got.count() === 300)
    assert(got.where(col("k") < 10).agg(sum("v")).head.getLong(0) ===
      (0 until 10).map(_ * 10 + 7).sum)
    // the losing attempt's batch is orphaned, never visible; vacuum eats it
    assert(LakeTable.vacuum(spark, root) > 0)
    assert(LakeTable.read(spark, root).count() === 300)
  }
}
