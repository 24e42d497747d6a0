package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.llm.{BloomGate, Dedup}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("normalize collapses whitespace and case") {
    val got = Seq("  The\tQuick   Fox\n").toDF("t")
      .select(Dedup.normalize(col("t"))).head().getString(0)
    assert(got == "the quick fox")
  }

  test("shingles: distinct word n-grams; short docs yield an empty set") {
    val df = Seq("a b c d", "a b", "a b a b a b").toDF("t")
    val got = df.select(Dedup.shingles(col("t"), 3)).collect().map(_.getSeq[String](0).toSet)
    assert(got(0) == Set("a b c", "b c d"))
    assert(got(1) == Set.empty[String])
    assert(got(2) == Set("a b a", "b a b")) // distinct
  }

  test("exact dedup groups case/whitespace variants; survivor is min id") {
    val df = Seq(
      (1L, "Hello  World"),
      (2L, "hello world"),
      (3L, "something else")).toDF("doc_id", "text")
    val got = Dedup.exact(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 3L -> 1L))
  }

  test("exactRows keeps the full survivor row") {
    val df = Seq(
      (5L, "dup text", "keep-me"),
      (9L, "DUP   text", "drop-me")).toDF("doc_id", "text", "extra")
    val got = Dedup.exactRows(df, "text", "doc_id").collect()
    assert(got.length == 1)
    assert(got.head.getLong(0) == 5L && got.head.getString(2) == "keep-me")
  }

  test("nearDupPairs finds a planted near-dup and ignores unrelated docs") {
    val base = (1 to 40).map(i => s"token$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 20) "CHANGED" else s"token$i").mkString(" ")
    val unrelated = (1 to 40).map(i => s"other$i").mkString(" ")
    val df = Seq((1L, base), (2L, nearDup), (3L, unrelated)).toDF("doc_id", "text")
    val pairs = Dedup.nearDupPairs(df, "text", "doc_id", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("nearDupPairs reports exact integer Jaccard components") {
    // identical docs: inter == uni
    val t = "one two three four five six"
    val df = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val r = Dedup.nearDupPairs(df, "text", "doc_id").head()
    assert(r.getInt(2) == r.getInt(3) && r.getInt(2) == 4) // 6 words -> 4 tri-shingles
  }

  test("nearDupGroups chains transitively: A~B~C is one group without A~C") {
    val base = (1 to 40).map(i => s"w$i")
    val a = base.mkString(" ")
    val b = base.updated(19, "CHANGED").mkString(" ")
    val c = base.updated(19, "CHANGED").updated(29, "ALSO").mkString(" ")
    val far = (1 to 40).map(i => s"z$i").mkString(" ")
    val df = Seq((1L, a), (2L, b), (3L, c), (9L, far)).toDF("doc_id", "text")
    // threshold 0.8: direct pairs (1,2) and (2,3) qualify, (1,3) does not
    val pairs = Dedup.nearDupPairs(df, "text", "doc_id", threshold = 0.8)
    assert(pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == Set((1L, 2L), (2L, 3L)))
    val groups = Dedup.nearDupGroups(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups == Map(1L -> 1L, 2L -> 1L, 3L -> 1L), "chain must collapse to one group")
    val survivors = Dedup.dedupNearRows(df, "text", "doc_id", threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == Set(1L, 9L))
  }

  test("simhash multiprobe (8 bands, r=1) == 16-band banding: same radius-15 pair set") {
    // both parameterizations pigeonhole-guarantee recall to Hamming 15,
    // so at maxHamming=12 the candidate machinery must be invisible in
    // the output — multiprobe just gets there with 256-value buckets
    // instead of 16-value ones (the at-scale difference)
    val df = graft.sources.Sources.table(spark, "/root/testdata/sf0.001", "documents")
    def pairs(bands: Int, probe: Int) =
      Dedup.simhashNearDupPairs(df, "text", "doc_id",
          maxHamming = 12, bands = bands, probeHamming = probe)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val multiprobe = pairs(8, 1)
    val fineBands = pairs(16, 0)
    assert(multiprobe == fineBands,
      s"multiprobe and 16-band pair sets diverged: ${multiprobe.diff(fineBands)} / ${fineBands.diff(multiprobe)}")
    assert(multiprobe.nonEmpty, "fixture should contain planted near-dup pairs")
  }

  test("fuzzyDecontaminate drops near-matches of the blocklist, not just exact ones") {
    val base = (1 to 40).map(i => s"w$i")
    val contaminated = base.mkString(" ")                       // exact copy of blocklist
    val nearContam = base.updated(19, "CHANGED").mkString(" ")  // J ~ 0.93 vs blocklist
    val clean = (1 to 40).map(i => s"z$i").mkString(" ")
    val corpus = Seq((1L, contaminated), (2L, nearContam), (3L, clean), (4L, "too short"))
      .toDF("doc_id", "text")
    val blocklist = Seq((100L, base.mkString(" "))).toDF("doc_id", "text")
    val survivors = Dedup.fuzzyDecontaminate(corpus, blocklist, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 1 (exact) and 2 (near) are contaminated; 3 is unrelated; 4 has no
    // shingles so it cannot match anything and passes through
    assert(survivors == Set(3L, 4L))
  }

  test("editDistance1Pairs: complete within-1 pairs incl. cliques (deletion neighborhoods)") {
    // substitution (abc~abd), insertion/deletion (ab~abc), an exact
    // clique (two "abc"), and a far string; every true pair must appear
    // because deletion-neighborhood candidates are complete at d <= 1
    val df = Seq((1L, "ab"), (2L, "abc"), (3L, "abd"), (4L, "abc"), (9L, "xyz"))
      .toDF("id", "s")
    val got = graft.operators.llm.FuzzyJoin.editDistance1Pairs(df, "s", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set(
      (1L, 2L, 1), (1L, 3L, 1), (1L, 4L, 1),
      (2L, 3L, 1), (3L, 4L, 1),
      (2L, 4L, 0)))
  }

  test("alternatingStarGroups collapses stars, paths, and an isolated pair") {
    import org.apache.spark.sql.functions.col
    // component 1: path 10-11-12-13-14; component 2: star around 20;
    // component 3: pair (30, 31); edges given in arbitrary orientation
    val pairs = Seq(
      (11L, 10L), (11L, 12L), (13L, 12L), (13L, 14L),
      (20L, 21L), (22L, 20L), (20L, 23L),
      (31L, 30L)).toDF("id_a", "id_b")
    val got = Dedup.alternatingStarGroups(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 14L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L,
      30L -> 30L, 31L -> 30L))
  }

  test("nearDupGroups escalates past maxIter: deep path still fully collapses") {
    import org.apache.spark.sql.functions.col
    // a 41-node path (diameter 40): min-label propagation cannot finish
    // in maxIter=3 rounds, so the operator must hand off to
    // large-star/small-star and STILL return fully-collapsed groups
    val pairs = (0L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.nearDupGroups(pairs, maxIter = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 40L).map(_ -> 0L).toMap,
      "deep component must collapse to the minimum id via the star fallback")
  }

  test("maxBucketSize guard drops degenerate buckets before pairing") {
    // 30 identical docs would otherwise form C(30,2)=435 pairs
    val df = (1 to 30).map(i => (i.toLong, "same text in every doc here")).toDF("doc_id", "text")
    val capped = Dedup.nearDupPairs(df, "text", "doc_id", maxBucketSize = 10)
    assert(capped.count() == 0)
  }

  test("jaccardJoinExact finds a planted near-dup and ignores unrelated docs") {
    val base = (1 to 40).map(i => s"token$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 20) "CHANGED" else s"token$i").mkString(" ")
    val unrelated = (1 to 40).map(i => s"other$i").mkString(" ")
    val df = Seq((1L, base), (2L, nearDup), (3L, unrelated)).toDF("doc_id", "text")
    val pairs = Dedup.jaccardJoinExact(df, "text", "doc_id", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("jaccardJoinExact == brute-force all-pairs (completeness, no LSH miss law)") {
    // the operator's whole claim is determinism: every J >= t pair MUST
    // appear. Compare against the quadratic ground truth on the real
    // sf0.001 documents fixture at two thresholds, including one (0.5)
    // where t*|S| lands exactly on integers — the prefix-length boundary.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sets = docs
      .select(col("doc_id"), Dedup.shingles(col("text"), 3).as("s"))
      .where(size(col("s")) > 0)
    for (t <- Seq(0.5, 0.6)) {
      val got = Dedup.jaccardJoinExact(docs, "text", "doc_id", threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
      val truth = sets.as("a")
        .join(sets.as("b"), col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
          size(array_intersect(col("a.s"), col("b.s"))).as("inter"),
          size(array_union(col("a.s"), col("b.s"))).as("uni"))
        .where(col("inter") >= col("uni") * t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
      assert(got == truth, s"prefix-filtered join diverged from ground truth at t=$t")
      assert(truth.nonEmpty, "fixture lost its planted near-dup pairs")
    }
  }

  test("simhashNearDupPairs: planted near-dup within radius, unrelated beyond it") {
    val base = (1 to 60).map(i => s"token$i").mkString(" ")
    val nearDup = (1 to 60).map(i => if (i == 30) "CHANGED" else s"token$i").mkString(" ")
    val unrelated = (1 to 60).map(i => s"other$i").mkString(" ")
    val df = Seq((1L, base), (2L, nearDup), (3L, unrelated), (4L, "too short")).toDF("doc_id", "text")
    val got = Dedup.simhashNearDupPairs(df, "text", "doc_id", maxHamming = 12, bands = 8)
      .collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(got.head.getInt(2) <= 12)
    // identical docs are at Hamming 0
    val same = Dedup.simhashNearDupPairs(
      Seq((1L, base), (2L, base)).toDF("doc_id", "text"), "text", "doc_id")
    assert(same.head().getInt(2) == 0)
  }

  test("BloomGate.decontaminate == plain anti-join; gate passes only a sliver to the join") {
    val corpus = spark.range(20000).select(
      col("id"), concat(lit("k"), col("id")).as("key"))
    val block = spark.range(20000).where(col("id") % 40 === 0)
      .select(concat(lit("k"), col("id")).as("bkey")) // 500 blocked keys
    val got = BloomGate.decontaminate(
      corpus, block, col("key"), col("bkey"), expectedItems = 500L, fpp = 0.01)
    val expect = corpus.join(block, col("key") === col("bkey"), "left_anti")
    assert(got.count() === 19500L)
    assert(
      got.select("id").except(expect.select("id")).isEmpty
        && expect.select("id").except(got.select("id")).isEmpty,
      "bloom-gated result diverged from the plain anti-join")

    // No false negatives is the load-bearing property: every blocked key
    // must be bloom-positive. And the gate must actually gate — at 1%
    // fpp the positive set is ~500 hits + ~195 fp, far below the corpus.
    val bf = BloomGate.bloomOf(block, col("bkey"), 500L, 0.01).scalar()
    val positives = corpus.where(BloomGate.mightContain(bf, col("key"))).count()
    assert(positives >= 500L, s"bloom gate produced a false negative: $positives < 500")
    assert(positives <= 2000L,
      s"bloom gate passes too much to the verify join: $positives of 20000 (expected ~700)")

    // The filter reaches the plan as a scalar subquery (plan-static,
    // evaluated once) — the same mechanism as injected runtime filters.
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("Subquery") || plan.contains("subquery"),
      s"bloom filter not planned as a scalar subquery:\n$plan")
  }

  test("incrementalNearDupPairs == full recompute restricted to batch-touching pairs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val full = Dedup.nearDupPairs(docs, "text", "doc_id",
        shingleSize = 3, numHashes = 32, bands = 8, threshold = 0.5)
      .where(col("id_a") % 5 === 0 || col("id_b") % 5 === 0)

    // History signatures go through a parquet round trip — the persisted
    // signature table IS the contract (no engine-private state).
    val dir = java.nio.file.Files.createTempDirectory("graft-sigs").toFile
    dir.deleteOnExit()
    val path = s"${dir.getAbsolutePath}/sigs"
    Dedup.signatures(docs.where(col("doc_id") % 5 =!= 0), "text", "doc_id")
      .write.mode("overwrite").parquet(path)
    val history = spark.read.parquet(path)
    val batch = Dedup.signatures(docs.where(col("doc_id") % 5 === 0), "text", "doc_id")

    val inc = Dedup.incrementalNearDupPairs(history, batch, threshold = 0.5)
    val cols = Seq("id_a", "id_b", "inter", "uni")
    assert(
      inc.select(cols.map(col): _*).except(full.select(cols.map(col): _*)).isEmpty
        && full.select(cols.map(col): _*).except(inc.select(cols.map(col): _*)).isEmpty,
      "incremental dedup diverged from restricted full recompute")
    // and it must not leak history-history pairs
    assert(inc.where(col("id_a") % 5 =!= 0 && col("id_b") % 5 =!= 0).isEmpty)
  }

  test("incrementalGroups == full CC recompute, incl. a pair bridging two old groups") {
    // batch 1: two separate chains {1-2-3} and {10-11}, plus {20-21}
    val old = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L)).toDF("id_a", "id_b")
    // batch 2: extends a chain (3-4), bridges two old components (11-20),
    // and adds a brand-new pair (30-31)
    val fresh = Seq((3L, 4L), (11L, 20L), (30L, 31L)).toDF("id_a", "id_b")

    val oldLabels = Dedup.nearDupGroups(old)
    val inc = Dedup.incrementalGroups(oldLabels, fresh)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Dedup.nearDupGroups(old.unionByName(fresh))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == full, s"incremental CC diverged: $inc vs $full")
    // the bridge must have merged {10,11} and {20,21} under min id 10
    assert(inc(21L) == 10L && inc(20L) == 10L && inc(11L) == 10L)
    assert(inc(4L) == 1L && inc(31L) == 30L)
  }

  test("BloomGate.optimalNumBits matches the textbook formula") {
    // 1e9 keys @ 1% fpp ~ 9.585 bits/key ~ 1.2 GB — the sizing claim in
    // the Scaladoc, asserted so the doc can't drift from the code.
    val bits = BloomGate.optimalNumBits(1000000000L, 0.01)
    assert(bits > 9400000000L && bits < 9700000000L, s"unexpected sizing: $bits")
    assert(BloomGate.optimalNumBits(1000L, 0.5) < BloomGate.optimalNumBits(1000L, 0.01))
  }
}
