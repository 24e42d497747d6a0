package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Unit boundaries for the §2b operator families: the grade-ladder and
  * binary-classify thresholds exactly at their cut points, argmax
  * tie-breaks, list-agg canonical order, top-k.
  */
class OperatorSpec extends SparkSpec {
  import spark.implicits._

  test("Classify.ladder hits grade boundaries exactly (lab4:91-103)") {
    val df = Seq(100, 90, 89, 80, 79, 70, 69, 60, 59, 0).toDF("marks")
    val got = df
      .select(
        col("marks"),
        Classify.ladder(
          col("marks"),
          Seq(90.0 -> "A", 80.0 -> "B", 70.0 -> "C", 60.0 -> "D"),
          otherwise = "F").as("g"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got == Map(
      100 -> "A", 90 -> "A", 89 -> "B", 80 -> "B", 79 -> "C",
      70 -> "C", 69 -> "D", 60 -> "D", 59 -> "F", 0 -> "F"))
  }

  test("Classify.binary is Shiny at exactly 30 (lab7:92 uses >=)") {
    val df = Seq(31, 30, 29).toDF("t")
    val got = df
      .select(col("t"), Classify.binary(col("t"), 30.0, "Shiny", "Cool").as("l"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got == Map(31 -> "Shiny", 30 -> "Shiny", 29 -> "Cool"))
  }

  test("argMax takes the max row and breaks ties toward the smallest witness") {
    val df = Seq(
      ("d1", 10, 5), ("d1", 20, 9), ("d1", 20, 3), // tie at 20 -> witness 3
      ("d2", 7, 1)
    ).toDF("d", "trips", "base")
    val got = df
      .transform(AggOps.argMax(Seq("d"), "trips", Seq("base")))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(got == Set(("d1", 20, 3), ("d2", 7, 1)))
  }

  test("argMax and argMaxWindow agree on every group") {
    val df = (1 to 500)
      .map(i => (s"g${i % 13}", i * 7 % 101, i))
      .toDF("g", "v", "id")
    val a = df.transform(AggOps.argMax(Seq("g"), "v", Seq("id")))
      .select("g", "v", "id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    val w = df.transform(AggOps.argMaxWindow(Seq(col("g")), col("v"), Seq(col("id"))))
      .select("g", "v", "id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(a == w)
  }

  test("listAgg canonicalizes the in-group order (S6)") {
    val df = Seq(("m", "zebra"), ("m", "apple"), ("m", "mango")).toDF("k", "v")
    val got = df.transform(AggOps.listAgg(col("k"), col("v"), as = "items")).head()
    assert(got.getString(1) == "apple, mango, zebra")
  }

  test("topK returns k rows per group in order") {
    val df = Seq(("a", 3), ("a", 1), ("a", 5), ("b", 2)).toDF("g", "v")
    val got = df
      .transform(AggOps.topK(Seq(col("g")), Seq(col("v").desc), 2))
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(got == Set(("a", 5), ("a", 3), ("b", 2)))
  }

  test("rowwiseMax is greatest across columns (lab6:93-96)") {
    val df = Seq((1, 9, 4)).toDF("a", "b", "c")
    val got = df.select(AggOps.rowwiseMax(Seq(col("a"), col("b"), col("c")))).head().getInt(0)
    assert(got == 9)
  }

  test("q108 exact-power-sum moments match the builtin floating aggregates") {
    // the hash-verifiable formulation (integer/decimal power sums, final
    // double division) must agree with stddev_samp/corr to floating
    // tolerance — same statistic, minus the merge-order nondeterminism
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val ours = graft.queries.ExtQueries.queries("q108_stats_moments")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val builtin = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy(col("l_returnflag").as("rf"))
      .agg(
        avg(col("l_quantity")).as("m"),
        stddev_samp(col("l_quantity")).as("sd"),
        corr(col("l_quantity"), round(col("l_extendedprice") * 100)).as("co"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(ours.keySet == builtin.keySet)
    for ((k, (m, sd, co)) <- ours) {
      val (bm, bsd, bco) = builtin(k)
      assert(math.abs(m - bm) < 1e-6, s"$k mean: $m vs $bm")
      assert(math.abs(sd - bsd) < 1e-6, s"$k stddev: $sd vs $bsd")
      assert(math.abs(co - bco) < 1e-6, s"$k corr: $co vs $bco")
    }
  }

  test("KvTextSink.write emits a single sorted key\\tvalue text file (S2/S3)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-kvsink").toString + "/out"
    KvTextSink.write(Seq(("b", 2), ("a", 1), ("c", 3)).toDF("k", "v"), dir)
    val parts = new java.io.File(dir).listFiles.filter(_.getName.startsWith("part-"))
    assert(parts.length == 1, "reference contract is exactly one output file")
    val src = scala.io.Source.fromFile(parts.head, "UTF-8")
    try assert(src.getLines().toSeq == Seq("a\t1", "b\t2", "c\t3"))
    finally src.close()
  }

  test("KvTextSink.writeSharded: concatenating shards in name order == single sorted file") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val df = (1 to 5000).map(i => (f"k$i%05d", i)).sortBy(_.hashCode).toDF("k", "v")
    KvTextSink.writeSharded(df, dir, shards = 4)
    val parts = new java.io.File(dir).listFiles
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    assert(parts.length > 1, "sharded write must produce multiple files")
    val concatenated = parts.toSeq.flatMap { f =>
      val s = scala.io.Source.fromFile(f, "UTF-8")
      try s.getLines().toIndexedSeq finally s.close()
    }
    assert(concatenated == KvTextSink.collect(df),
      "name-ordered shard concatenation must reproduce the single sorted stream")
  }

  test("KvTextSink.writeSharded: concat == single file under DUPLICATE keys") {
    // every key appears 40 times with distinct values: the full-line sort
    // must give both write paths the same within-key value order (a
    // key-only sort leaves the tie order to partitioning luck)
    val dir = java.nio.file.Files.createTempDirectory("graft-shards-dup").toString
    val df = (1 to 4000).map(i => (f"k${i % 100}%03d", i)).sortBy(_.hashCode).toDF("k", "v")
    KvTextSink.writeSharded(df, dir, shards = 4)
    val parts = new java.io.File(dir).listFiles
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    val concatenated = parts.toSeq.flatMap { f =>
      val s = scala.io.Source.fromFile(f, "UTF-8")
      try s.getLines().toIndexedSeq finally s.close()
    }
    assert(concatenated == KvTextSink.collect(df),
      "duplicate-key tie order must match between sharded and single-file writes")
  }

  test("approx_count_distinct lands within 5% of exact (sketch surface)") {
    val df = (1 to 20000).map(_ % 5000).toDF("v")
    val approx = df.agg(approx_count_distinct(col("v"))).head().getLong(0)
    assert(math.abs(approx - 5000L) <= 250L, s"approx=$approx vs exact=5000")
  }

  test("wordCount tokenizes on whitespace runs and drops empty tokens (lab2)") {
    val df = Seq("the  cat sat", "the dog", "  ").toDF("text")
    val got = df.transform(TextOps.wordCount(col("text")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("the" -> 2L, "cat" -> 1L, "sat" -> 1L, "dog" -> 1L))
  }

  test("argument guards fail fast with clear messages") {
    val df = Seq((1, 2)).toDF("a", "b")
    assert(intercept[IllegalArgumentException] {
      AggOps.argMax(Seq.empty, "a", Seq("b"))
    }.getMessage.contains("grouping column"))
    assert(intercept[IllegalArgumentException] {
      graft.plans.TopK.perKey(df, Seq(col("a")), Seq(col("b")), 0)
    }.getMessage.contains("k >= 1"))
    assert(intercept[IllegalArgumentException] {
      AggOps.exactPercentiles(Seq("a"), "b", Seq(0.5, 1.5), Seq("x", "y"))(df)
    }.getMessage.contains("[0, 1]"))
  }

  test("exactPercentiles (sort-based) == builtin percentile (map-based)") {
    // awkward group sizes incl. a singleton; values with duplicates; a
    // null value (builtin percentile ignores nulls — so must we); a NULL
    // GROUP KEY with non-null values (the restore join must be null-safe
    // or this group's percentiles silently come back null)
    val rows = Seq("a" -> Some(10.0), "a" -> Some(1.0), "a" -> Some(7.5),
      "a" -> Some(7.5), "a" -> Some(2.0), "a" -> None,
      "b" -> Some(3.0), "b" -> Some(4.0), "c" -> Some(42.0),
      "d" -> None, // all-null group: present in output, null result
      (null: String) -> Some(5.0), (null: String) -> Some(6.0))
    val df = rows.toDF("g", "v")
    val ps = Seq(0.0, 0.25, 0.5, 0.9, 1.0)
    val names = ps.map(p => s"p${(p * 100).toInt}")
    val got = df.transform(AggOps.exactPercentiles(Seq("g"), "v", ps, names))
      .collect().map(r => r.getString(0) ->
        names.indices.map(i => if (r.isNullAt(i + 1)) None else Some(r.getDouble(i + 1)))).toMap
    val exp = df.groupBy("g")
      .agg(expr(s"percentile(v, array(${ps.mkString(",")}))").as("p"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) ps.map(_ => None)
         else r.getSeq[Double](1).toIndexedSeq.map(Some(_)))).toMap
    assert(got.keySet == exp.keySet)
    for (g <- got.keySet; i <- ps.indices) (got(g)(i), exp(g)(i)) match {
      case (Some(a), Some(b)) =>
        assert(math.abs(a - b) < 1e-12,
          s"group $g p=${ps(i)}: count-compressed $a vs builtin $b")
      case (a, b) =>
        assert(a == b, s"group $g p=${ps(i)}: null mismatch $a vs $b")
    }
  }

  test("approx_percentile lands near the exact percentile (sketch surface)") {
    val df = (1 to 20000).map(_.toDouble).toDF("v")
    val approx = df.agg(expr("approx_percentile(v, 0.5, 1000)")).head().getDouble(0)
    assert(math.abs(approx - 10000.5) <= 200, s"approx median $approx vs 10000.5")
  }

  test("Profiler: nulls/distinct/minmax/bytes correct; single scan; approx mode same schema") {
    val df = Seq(
      (Some(1L), Some("b")), (Some(2L), None), (None, Some("a")),
      (Some(2L), Some("ab")), (None, None)
    ).toDF("k", "s")
    val rep = graft.operators.Profiler.profile(df, Seq("k", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    val k = rep("k"); val s = rep("s")
    assert(k.getLong(1) == 5 && k.getLong(2) == 2 && k.getLong(3) == 2)
    assert(k.getString(4) == "1" && k.getString(5) == "2" && k.getLong(6) == 3)
    assert(s.getLong(2) == 2 && s.getLong(3) == 3)
    assert(s.getString(4) == "a" && s.getString(5) == "b") // lexical on strings
    assert(s.getLong(6) == 4) // "b"+"a"+"ab"

    // all-NULL column: distinct 0, min/max NULL, bytes coalesce to 0
    val nul = graft.operators.Profiler.profile(
      Seq((1, Option.empty[String])).toDF("a", "b"), Seq("b")).head()
    assert(nul.getLong(3) == 0 && nul.isNullAt(4) && nul.isNullAt(5) && nul.getLong(6) == 0)

    // TWO column-pruned scans feed all statistics: the hash-aggregable
    // pass (counts/distincts/lengths over the countDistinct Expand) and
    // the sortless string min/max pass. One fused pass read fewer bytes
    // but its string buffers forced SortAggregate over the (#cols+1)-fold
    // Expand — the r22 split trades one extra scan for hash aggregation
    // everywhere (and no Sort anywhere; pinned below).
    val plan = graft.operators.Profiler.profile(df, Seq("k", "s"))
      .queryExecution.executedPlan.toString
    val scans = "LocalTableScan".r.findAllIn(plan).size
    assert(scans == 2, s"profiler should scan exactly twice ($scans scans):\n$plan")
    assert(!plan.contains("Sort ["),
      s"profiler must not sort anything (grouping-free SortAggregate is fine):\n$plan")
    assert(plan.contains("HashAggregate"), s"distinct pass must hash-aggregate:\n$plan")

    // approx mode: same report schema, estimates exact at these sizes
    val approx = graft.operators.Profiler.profile(df, Seq("k", "s"), exact = false)
    assert(approx.schema == graft.operators.Profiler.profile(df, Seq("k", "s")).schema)
    assert(approx.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
      == Map("k" -> 2L, "s" -> 3L))

    // the cost model the Scaladoc claims: exact multi-column distinct
    // rides ONE Expand; approx mode must not pay the Expand at all
    assert(plan.contains("Expand"), s"exact profile should plan an Expand:\n$plan")
    val ap = approx.queryExecution.executedPlan.toString
    assert(!ap.contains("Expand"), s"approx profile must not Expand:\n$ap")
  }

  test("globalRank == naive SinglePartition window (rank + running sums)") {
    // duplicate order values with a unique tie-break; negative sums;
    // more rows than chunks so every chunk is non-trivial
    val rows = (1 to 257).map(i => (i % 13, i, (i * 7 % 29).toLong - 5L, i.toLong % 11))
    val df = rows.toDF("score", "id", "a", "b").repartition(7)
    val order = Seq(col("score").desc, col("id").asc)
    // smallInputRows = 0 forces the CHUNKED path (the scale shape under
    // test); the adaptive default is exercised separately below
    val got = AggOps.globalRank(order, "rn", Seq("a" -> "ca", "b" -> "cb"),
      smallInputRows = 0L)(df)
    assert(got.schema("rn").dataType.typeName == "long")
    val w = org.apache.spark.sql.expressions.Window.orderBy(order: _*)
    val wr = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    val exp = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("ca", sum("a").over(wr))
      .withColumn("cb", sum("b").over(wr))
    def key(d: org.apache.spark.sql.DataFrame) =
      d.select("id", "rn", "ca", "cb").collect()
        .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(key(got) == key(exp))
    // the point of the operator: NO SinglePartition window over the data
    // (the offsets window runs over <= shuffle.partitions rows)
    val winNodes = got.queryExecution.executedPlan.collect {
      case ww: org.apache.spark.sql.execution.window.WindowExec
          if ww.partitionSpec.isEmpty => ww
    }
    winNodes.foreach { ww =>
      val agg = ww.collectFirst {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec
            if a.groupingExpressions.exists(_.name == "__pid") => a
      }
      assert(agg.nonEmpty,
        s"unpartitioned window not over the chunk-count-bounded offsets:\n$ww")
    }

    // the adaptive default routes this sub-threshold input through the
    // PLAIN window (no range exchange, no __pid machinery) with the
    // identical result — the small-input fast path that recovers q128's
    // overhead at low scale
    val small = AggOps.globalRank(order, "rn", Seq("a" -> "ca", "b" -> "cb"))(df)
    assert(key(small) == key(exp))
    assert(small.queryExecution.executedPlan.toString.contains("Window"))
    assert(!small.columns.contains("__pid") &&
      !small.queryExecution.executedPlan.toString.contains("__pid"),
      "sub-threshold input must take the plain-window path")
  }
}
