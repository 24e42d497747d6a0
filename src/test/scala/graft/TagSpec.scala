package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.LakeTable

/** Snapshot tags: named refs that pin a version against vacuum and
  * resolve through `VERSION AS OF 'name'`. Pins: resolution (API + SQL
  * + CALL procedures), name hygiene (numeric names would shadow version
  * travel), duplicate/replace semantics, and the retention contract —
  * a tagged version's files (incl. deletion vectors) survive a
  * zero-retention vacuum, and dropping the tag releases them.
  */
class TagSpec extends SparkSpec {

  private def freshRoot(): String = {
    val d = Files.createTempDirectory("graft-tag").toFile
    d.deleteOnExit()
    s"${d.getAbsolutePath}/tbl"
  }

  private def baseDf = {
    import spark.implicits._
    spark.range(90).select(
      col("id").as("k"), (col("id") % 3).cast("string").as("p"), (col("id") * 10).as("v"))
  }

  test("tag resolution, name hygiene, duplicate and replace semantics") {
    val root = freshRoot()
    LakeTable.init(spark, root, baseDf, "p")
    LakeTable.append(spark, root, baseDf.withColumn("k", col("k") + 1000))
    LakeTable.tag(spark, root, "base", 1)
    assert(LakeTable.resolveTag(spark, root, "base") === Some(1L))
    assert(LakeTable.tags(spark, root) === Map("base" -> 1L))

    intercept[IllegalArgumentException](LakeTable.tag(spark, root, "7", 1))
    intercept[IllegalArgumentException](LakeTable.tag(spark, root, "bad name", 1))
    intercept[IllegalArgumentException](LakeTable.tag(spark, root, "base", 2))
    LakeTable.tag(spark, root, "base", 2, replace = true)
    assert(LakeTable.resolveTag(spark, root, "base") === Some(2L))
    intercept[IllegalArgumentException](LakeTable.tag(spark, root, "x", 99))

    assert(LakeTable.dropTag(spark, root, "base"))
    assert(LakeTable.tags(spark, root).isEmpty)
    assert(!LakeTable.dropTag(spark, root, "base"))
  }

  test("a tag pins its version through vacuum; dropping it releases the files") {
    val root = freshRoot()
    LakeTable.init(spark, root, baseDf, "p")
    LakeTable.tag(spark, root, "training_v1", 1)
    // rewrite everything (COW delete touches all partitions)
    LakeTable.delete(spark, root, col("k") % 2 === 0, "p")
    LakeTable.delete(spark, root, col("k") % 3 === 0, "p")

    LakeTable.vacuum(spark, root, retainMillis = 0L, keepVersions = 1)
    // v1's files survived ONLY because the tag pinned them
    assert(LakeTable.readVersion(spark, root, 1).count() === 90,
      "the tagged snapshot must stay bit-for-bit readable after vacuum")
    // v2 was neither tagged nor within keepVersions — reclaimed
    intercept[IllegalArgumentException](LakeTable.readVersion(spark, root, 2))

    LakeTable.dropTag(spark, root, "training_v1")
    LakeTable.vacuum(spark, root, retainMillis = 0L, keepVersions = 1)
    intercept[IllegalArgumentException](LakeTable.readVersion(spark, root, 1))
    // the head is never affected
    assert(LakeTable.read(spark, root).count() ===
      (0 until 90).count(k => k % 2 != 0 && k % 3 != 0))
  }

  test("expire_snapshots: time-based expiration keeps the window, tags pin through") {
    val root = freshRoot()
    LakeTable.init(spark, root, baseDf, "p")
    LakeTable.append(spark, root, baseDf.withColumn("k", col("k") + 1000))
    LakeTable.append(spark, root, baseDf.withColumn("k", col("k") + 2000))
    LakeTable.append(spark, root, baseDf.withColumn("k", col("k") + 3000))
    LakeTable.tag(spark, root, "keepme", 1)

    // everything is younger than the far past: nothing expires
    assert(LakeTable.expireSnapshots(spark, root,
      olderThanMillis = System.currentTimeMillis() - 3600_000L, keepLast = 1) === 0L)
    assert(LakeTable.readVersion(spark, root, 1).count() === 90)

    // a future cutoff expires all but keep_last — except the tagged pin
    LakeTable.expireSnapshots(spark, root,
      olderThanMillis = System.currentTimeMillis() + 3600_000L, keepLast = 2)
    val e = intercept[Exception](LakeTable.readVersion(spark, root, 2).count())
    assert(e.getMessage.contains("no v2") || e.getMessage.contains("vacuum"),
      e.getMessage)
    assert(LakeTable.readVersion(spark, root, 1).count() === 90, "tag pins v1 live")
    assert(LakeTable.readVersion(spark, root, 3).count() === 270, "kept window reads")
    assert(LakeTable.readVersion(spark, root, 4).count() === 360)
    // an incremental consumer restarting INSIDE the kept window replays
    assert(LakeTable.changesSince(spark, root, 3, 4, Seq("k")).count() === 90)

    // the SQL face composes; keep_last floors at the head
    spark.conf.set("spark.sql.catalog.graft.warehouse",
      Files.createTempDirectory("graft-exp-wh").toString)
    val removed = spark.sql(
      s"CALL graft.system.expire_snapshots(table => '$root', " +
        "older_than => TIMESTAMP '2099-01-01 00:00:00', keep_last => 1)")
      .head.getLong(0)
    val _ = removed
    assert(LakeTable.read(spark, root).count() === 360, "the head always survives")
    intercept[Exception](LakeTable.readVersion(spark, root, 3).count())
    // vacuum after expiration must not trip over dropped manifest docs
    // inside its own version window
    LakeTable.vacuum(spark, root, retainMillis = 0L, keepVersions = 3)
    assert(LakeTable.read(spark, root).count() === 360)
  }

  test("tagging a vacuumed version is refused; a stale pin never wedges vacuum") {
    val root = freshRoot()
    LakeTable.init(spark, root, baseDf, "p")
    LakeTable.delete(spark, root, col("k") % 2 === 0, "p") // v2
    LakeTable.delete(spark, root, col("k") % 3 === 0, "p") // v3
    LakeTable.vacuum(spark, root, retainMillis = 0L, keepVersions = 1)
    // v1 is gone — a tag cannot resurrect it, so tag() must refuse
    // (an accepted-but-unreadable pin would poison every later vacuum)
    val e = intercept[IllegalArgumentException](LakeTable.tag(spark, root, "ghost", 1))
    assert(e.getMessage.contains("not readable"), e.getMessage)
    assert(LakeTable.tags(spark, root).isEmpty)

    // even a pin that BECAME unreadable (written out-of-band, the way a
    // legacy tag file could exist) is tolerated: vacuum skips it
    // instead of aborting until the tag is dropped
    val refs = new org.apache.hadoop.fs.Path(s"$root/_manifests/refs")
    val fs = refs.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(refs)
    val out = fs.create(new org.apache.hadoop.fs.Path(refs, "stale"), true)
    try out.write("1".getBytes("UTF-8")) finally out.close()
    LakeTable.append(spark, root, baseDf) // v4 — pushes v3 out of keepVersions
    val removed = LakeTable.vacuum(spark, root, retainMillis = 0L, keepVersions = 1)
    assert(removed >= 0L) // did not throw
    assert(LakeTable.read(spark, root).count() ===
      90 + (0 until 90).count(k => k % 2 != 0 && k % 3 != 0))
  }

  test("tags pin deletion vectors too; SQL + CALL faces resolve them") {
    val d = Files.createTempDirectory("graft-tag-cat").toString
    spark.conf.set("spark.sql.catalog.graft.warehouse", d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("CREATE TABLE graft.db.tg (k BIGINT, p STRING) PARTITIONED BY (p) " +
      "TBLPROPERTIES (deleteMode 'mor')")
    spark.sql("INSERT INTO graft.db.tg SELECT id, cast(id % 2 as string) FROM range(20)")
    spark.sql("DELETE FROM graft.db.tg WHERE k < 5") // v3: DV commit
    spark.sql("CALL graft.system.tag('db.tg', 'after_clean')") // pins the head (v3)
    val tagged = spark.sql("CALL graft.system.tags('db.tg')").collect()
    assert(tagged.map(r => (r.getString(0), r.getLong(1))).toSeq === Seq(("after_clean", 3L)))

    // move on and OPTIMIZE (supersedes the DV), then vacuum hard
    spark.sql("INSERT INTO graft.db.tg SELECT id, cast(id % 2 as string) FROM range(100, 110)")
    spark.sql("CALL graft.system.optimize('db.tg')")
    spark.sql("CALL graft.system.vacuum('db.tg', 0.0D, 1)")
    // the tagged DV'd snapshot still reads exactly (vector retained)
    assert(spark.sql("SELECT count(*) c FROM graft.db.tg VERSION AS OF 'after_clean'")
      .head.getLong(0) === 15)
    assert(spark.sql("SELECT count(*) c FROM graft.db.tg").head.getLong(0) === 25)
    // unknown tag fails crisply, naming the available ones
    val e = intercept[Exception](
      spark.sql("SELECT * FROM graft.db.tg VERSION AS OF 'nope'").collect())
    assert(e.getMessage.contains("after_clean"), e.getMessage)
    spark.sql("CALL graft.system.drop_tag('db.tg', 'after_clean')")
    assert(spark.sql("CALL graft.system.tags('db.tg')").collect().isEmpty)
  }
}
