package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.llm.{Chunking, Sampling}

class SamplingChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("bernoulli: deterministic across runs, rate approximately honored") {
    val df = (1L to 10000L).toDF("id")
    val a = Sampling.bernoulli(df, col("id"), lit(0.3), seed = 7)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.bernoulli(df, col("id"), lit(0.3), seed = 7)
      .collect().map(_.getLong(0)).toSet
    assert(a == b, "hash-derived sampling must be reproducible")
    assert(math.abs(a.size - 3000) < 300, s"rate off: ${a.size}/10000 at 0.3")
    val other = Sampling.bernoulli(df, col("id"), lit(0.3), seed = 8)
      .collect().map(_.getLong(0)).toSet
    assert(a != other, "different seeds must select different rows")
  }

  test("stratified: per-stratum rates honored, unknown strata use the default") {
    val df = (1L to 30000L).map(i => (if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "xx", i))
      .toDF("lang", "id")
    val kept = Sampling.stratified(df, col("lang"), Map("en" -> 0.5, "de" -> 0.1), col("id"))
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(kept("en") - 5000) < 500, s"en rate off: ${kept.get("en")}")
    assert(math.abs(kept("de") - 1000) < 300, s"de rate off: ${kept.get("de")}")
    assert(!kept.contains("xx"), "default rate 0 must drop unlisted strata")
    // deterministic: same seed -> same selection
    val a = Sampling.stratified(df, col("lang"), Map("en" -> 0.5), col("id"))
      .collect().map(_.getLong(1)).toSet
    val b = Sampling.stratified(df, col("lang"), Map("en" -> 0.5), col("id"))
      .collect().map(_.getLong(1)).toSet
    assert(a == b)
  }

  test("perGroup: exactly min(k, |group|) rows, deterministic") {
    val df = (1 to 1000).map(i => (s"g${i % 7}", i.toLong)).toDF("g", "id")
      .unionByName(Seq(("tiny", 9999L)).toDF("g", "id"))
    val s1 = Sampling.perGroup(df, Seq(col("g")), col("id"), k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val s2 = Sampling.perGroup(df, Seq(col("g")), col("id"), k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(s1 == s2)
    val sizes = s1.groupBy(_._1).view.mapValues(_.size).toMap
    assert((0 until 7).forall(i => sizes(s"g$i") == 5))
    assert(sizes("tiny") == 1)
  }

  test("splitLabel: fractions honored, stable under corpus growth, seed-sensitive") {
    val df = (1L to 10000L).toDF("id")
    val fr = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val counts = df.select(Sampling.splitLabel(col("id"), fr, seed = 7).as("s"))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("train") - 8000) < 400, s"train off: $counts")
    assert(math.abs(counts("val") - 1000) < 200, s"val off: $counts")
    assert(math.abs(counts("test") - 1000) < 200, s"test off: $counts")
    // growth-stability: labels computed on a subset match the superset's —
    // adding documents must never relabel existing ones (eval-set
    // contamination guard)
    val subset = (1L to 1000L).toDF("id")
      .select(col("id"), Sampling.splitLabel(col("id"), fr, seed = 7).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val superset = df
      .select(col("id"), Sampling.splitLabel(col("id"), fr, seed = 7).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(subset.forall { case (k, v) => superset(k) == v })
    val other = df.select(Sampling.splitLabel(col("id"), fr, seed = 8).as("s"))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(other != counts, "different seeds must produce a different split")
  }

  test("shuffleShard: balanced shards, contiguous positions, deterministic") {
    val df = (1L to 8000L).toDF("id")
    val got = Sampling.shuffleShard(df, col("id"), shards = 8, seed = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(got.map(_._2).toSet == (0 until 8).toSet)
    // each shard's positions are exactly 1..n (a dense permutation)
    got.groupBy(_._2).foreach { case (sh, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.size),
        s"shard $sh positions are not dense")
      assert(math.abs(rows.size - 1000) < 250, s"shard $sh unbalanced: ${rows.size}")
    }
    val again = Sampling.shuffleShard(df, col("id"), shards = 8, seed = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq,
      "the permutation must be reproducible")
  }

  test("mixtureResample: exact integer quotas, flattening direction, cap, determinism") {
    // skewed corpus: 6400/1600/400/100 docs per source
    val df = ((1L to 6400L).map(("a", _)) ++ (6401L to 8000L).map(("b", _)) ++
      (8001L to 8400L).map(("c", _)) ++ (8401L to 8500L).map(("d", _))).toDF("src", "id")
    val got = Sampling.mixtureResample(df, col("src"), col("id"), seed = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val bySrc = got.groupBy(_._1).view.mapValues(_.size).toMap
    // recompute the quota arithmetic exactly as documented
    val n = Map("a" -> 6400L, "b" -> 1600L, "c" -> 400L, "d" -> 100L)
    val m = n.view.mapValues(v => math.floor(math.sqrt(v.toDouble) * 1e6).toLong).toMap
    val msum = m.values.sum; val target = n.values.sum / 2
    val quota = n.map { case (k, v) => k -> math.min(v, target * m(k) / msum) }
    assert(bySrc == quota.map { case (k, v) => k -> v.toInt },
      s"selected counts $bySrc != integer quotas $quota")
    // temperature flattening: the mega-source's selected share sits below
    // its corpus share, small sources above (capped at their size)
    assert(bySrc("a").toDouble / got.length < 6400.0 / 8500.0)
    assert(bySrc("d") == 100, "a source is never upsampled past its size")
    // per-source ranks are dense 1..quota and the run is reproducible
    got.groupBy(_._1).foreach { case (s, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.size), s"$s ranks not dense")
    }
    val again = Sampling.mixtureResample(df, col("src"), col("id"), seed = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(got.sortBy(_._2).toSeq == again.sortBy(_._2).toSeq)
    // a different seed picks a different membership at the same quotas
    val other = Sampling.mixtureResample(df, col("src"), col("id"), seed = 6)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(other.toSet != got.map(t => (t._1, t._2)).toSet)
  }

  test("weightedPerGroup: exact k, deterministic under repartition, weight-proportional") {
    // 10k rows in one group, 1k of them with 50x the weight of the rest
    val df = spark.range(10000).select(
      lit("g").as("grp"), col("id"),
      when(col("id") < 1000, lit(50.0)).otherwise(lit(1.0)).as("w"))
    val picked = Sampling.weightedPerGroup(
      df, Seq(col("grp")), col("id"), col("w"), k = 500, seed = 3L)
    assert(picked.count() === 500)

    // pure function of (seed, id, w): identical set under repartition
    val again = Sampling.weightedPerGroup(
      df.repartition(13), Seq(col("grp")), col("id"), col("w"), k = 500, seed = 3L)
    assert(picked.select("id").except(again.select("id")).isEmpty
      && again.select("id").except(picked.select("id")).isEmpty)

    // heavy rows are 10% of the population but carry ~85% of the total
    // weight; A-ES must overrepresent them drastically vs uniform (~50)
    val heavy = picked.where(col("id") < 1000).count()
    assert(heavy > 150, s"heavy rows not overrepresented: $heavy of 500")

    // a different seed draws a materially different set
    val other = Sampling.weightedPerGroup(
      df, Seq(col("grp")), col("id"), col("w"), k = 500, seed = 4L)
    assert(picked.select("id").except(other.select("id")).count() > 100)

    // a non-positive weight must fail the job, not hijack the sample
    val bad = df.withColumn("w", when(col("id") === 7, lit(0.0)).otherwise(col("w")))
    val err = intercept[Exception] {
      Sampling.weightedPerGroup(bad, Seq(col("grp")), col("id"), col("w"), k = 5).collect()
    }
    assert(err.getMessage.contains("strictly positive"), s"wrong guard: ${err.getMessage}")
  }

  test("chunking: windows, overlap, short tails, sub-window and blank docs") {
    val df = Seq(
      (1L, "a b c"),       // maxTokens 2, overlap 1 -> [a b], [b c]
      (2L, "a"),           // single sub-window chunk
      (3L, "   "),         // blank -> no chunks
      (4L, "a b c d e")    // [a b], [b c], [c d], [d e]
    ).toDF("doc_id", "text")
    val got = Chunking.byTokens(df, "text", maxTokens = 2, overlap = 1)
      .select("doc_id", "chunk_idx", "chunk_text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(got(1L) == Seq("a b", "b c"))
    assert(got(2L) == Seq("a"))
    assert(!got.contains(3L))
    assert(got(4L) == Seq("a b", "b c", "c d", "d e"))
  }

  test("chunking: native generator matches the built-in HOF composition") {
    val docs = Seq(
      (1L, "a b c d e f g h i j k"),
      (2L, "one"),
      (3L, "  "),
      (4L, (1 to 137).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    for ((mt, ov) <- Seq((2, 1), (4, 0), (50, 10), (5, 4))) {
      val nat = Chunking.byTokens(docs, "text", mt, ov)
        .select("doc_id", "chunk_idx", "chunk_text")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      val ref = Chunking.byTokensBuiltin(docs, "text", mt, ov)
        .select("doc_id", "chunk_idx", "chunk_text")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      assert(nat == ref, s"native != builtin at maxTokens=$mt overlap=$ov")
    }
  }

  test("chunking with zero overlap partitions the tokens exactly") {
    val text = (1 to 10).map(i => s"t$i").mkString(" ")
    val got = Chunking.byTokens(Seq((1L, text)).toDF("doc_id", "text"), "text", maxTokens = 4)
      .orderBy("chunk_idx").select("chunk_text").collect().map(_.getString(0)).toSeq
    assert(got == Seq("t1 t2 t3 t4", "t5 t6 t7 t8", "t9 t10"))
    assert(got.mkString(" ") == text)
  }

  test("greedyPack: next-fit pack assignment per shard, oversized item overflows its own pack") {
    // shard A, budget 10: tokens 4,4,4 -> cum-before 0,4,8 -> packs 0,0,0
    // (third item overflows pack 0 by 2 — next-fit tail); then 25
    // (oversized: cum-before 12 -> pack 1), then 3 -> cum-before 37 -> pack 3
    // (pack 2 skipped entirely by the oversized item). shard B independent.
    val df = Seq(
      ("A", 1L, 4L), ("A", 2L, 4L), ("A", 3L, 4L), ("A", 4L, 25L), ("A", 5L, 3L),
      ("B", 1L, 9L), ("B", 2L, 2L)).toDF("shard", "id", "tok")
    val got = graft.operators.llm.Packing
      .greedyPack(df, Seq(col("shard")), Seq(col("id")), col("tok"), budget = 10L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(got == Map(
      ("A", 1L) -> 0L, ("A", 2L) -> 0L, ("A", 3L) -> 0L,
      ("A", 4L) -> 1L, ("A", 5L) -> 3L,
      ("B", 1L) -> 0L, ("B", 2L) -> 0L))
  }
}
