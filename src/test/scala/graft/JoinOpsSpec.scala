package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, RangeJoin, SkewJoin}

/** Semantics of the join extensions: bucketed range join vs a reference
  * cross-join filter, salted skew join vs the plain join, as-of edge
  * cases.
  */
class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  test("RangeJoin.pointInInterval == cross-join + BETWEEN filter") {
    val rnd = new scala.util.Random(3)
    val intervals = (1 to 50).map { i =>
      val lo = rnd.nextInt(1000).toLong; (i.toLong, lo, lo + rnd.nextInt(200).toLong)
    }
    val points = (1 to 300).map(j => (j.toLong, rnd.nextInt(1400).toLong - 100))
    val l = intervals.toDF("lid", "lo", "hi")
    val r = points.toDF("rid", "p")
    val got = RangeJoin.pointInInterval(l, r, "lo", "hi", "p", bucketWidth = 64)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val expected = (for {
      (lid, lo, hi) <- intervals; (rid, p) <- points if p >= lo && p <= hi
    } yield (lid, rid)).toSet
    assert(got == expected)
  }

  test("RangeJoin honors extra equi-keys (per-entity windows)") {
    val l = Seq((1L, "u1", 0L, 10L), (2L, "u2", 0L, 10L)).toDF("lid", "user", "lo", "hi")
    val r = Seq((10L, "u1", 5L), (11L, "u2", 5L), (12L, "u1", 50L)).toDF("rid", "user", "p")
    val got = RangeJoin.pointInInterval(l, r, "lo", "hi", "p", 16, keys = Seq("user"))
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 11L)))
  }

  test("SkewJoin.salted == plain join, hot key included") {
    val facts = (1 to 2000)
      .map(i => (if (i % 3 == 0) "hot" else s"k${i % 50}", i))
      .toDF("k", "v")
    val dims = (Seq(("hot", "H")) ++ (0 until 50).map(i => (s"k$i", s"d$i"))).toDF("k", "d")
    val salted = SkewJoin.salted(facts, dims, Seq("k"), saltFrom = "v", factor = 8)
      .select("k", "v", "d").collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    val plain = facts.join(dims, "k")
      .select("k", "v", "d").collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(salted == plain)
  }

  test("AsOfJoin: equal timestamps are inclusive; no-predecessor rows get null") {
    val l = Seq((1L, 100L, 10L), (2L, 100L, 5L), (3L, 200L, 8L)).toDF("lid", "k", "ts")
    val r = Seq((100L, 10L, "at10"), (100L, 7L, "at7")).toDF("k", "ts", "tag")
    val got = AsOfJoin(l, r, Seq("k"), "ts", "ts", Seq("tag"))
      .select("lid", "asof_tag").collect()
      .map(x => x.getLong(0) -> Option(x.getString(1))).toMap
    assert(got == Map(
      1L -> Some("at10"), // right row AT the left ts is visible (<= semantics)
      2L -> None,         // ts 5: no click at or before
      3L -> None))        // different key entirely
  }

  test("Resample.forwardFill: daily grid carries the latest observation forward") {
    // user 1: obs at t=5 (v=10) and t=25 (v=20), step 10
    // grid: 10, 20 (fill 10), then 30 > hi=25 -> stops at hi
    val obs = Seq((1L, 5L, 10.0), (1L, 25L, 20.0), (2L, 40L, 7.0))
      .toDF("k", "t", "v")
    val got = graft.operators.Resample.forwardFill(obs, Seq("k"), "t", Seq("v"), step = 10L)
      .select("k", "grid_ts", "asof_v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set(
      (1L, 10L, 10.0), // first boundary after t=5, fills from the t=5 obs
      (1L, 20L, 10.0), // still before the t=25 obs
      (2L, 40L, 7.0))) // single obs exactly on its own boundary
  }

  test("Resample.forwardFill: negative (pre-1970) epochs use floor-division grid") {
    // lo=-15: ceil(-15/10)*10 = -10 (a truncating div would give 0 and
    // silently drop the -10 grid point); lo=-20 sits exactly on a boundary
    val obs = Seq((1L, -15L, 1.0), (1L, 12L, 2.0), (2L, -20L, 3.0), (2L, -3L, 4.0))
      .toDF("k", "t", "v")
    val got = graft.operators.Resample.forwardFill(obs, Seq("k"), "t", Seq("v"), step = 10L)
      .select("k", "grid_ts", "asof_v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set(
      (1L, -10L, 1.0), (1L, 0L, 1.0), (1L, 10L, 1.0),
      (2L, -20L, 3.0), (2L, -10L, 3.0)))
  }

  test("AsOfJoin: null timestamps never match (DuckDB ASOF parity)") {
    val l = Seq(
      (1L, 100L, Some(10L)), // normal: matches the ts-7 right row
      (2L, 100L, None)       // null left ts: no predecessor, null payload
    ).toDF("lid", "k", "ts")
    val r = Seq(
      (100L, Some(7L), "real"),
      // null-ts right row would sort BEFORE every row under asc-nulls-first
      // and become a bogus universal predecessor if not excluded
      (100L, None, "bogus")).toDF("k", "ts", "tag")
    val got = AsOfJoin(l, r, Seq("k"), "ts", "ts", Seq("tag"))
      .select("lid", "asof_tag").collect()
      .map(x => x.getLong(0) -> Option(x.getString(1))).toMap
    assert(got == Map(1L -> Some("real"), 2L -> None))
  }

  test("left outer ON-condition null-extension: filtered matches count as zero (q74)") {
    // the classic outer-join trap: a non-key predicate in the JOIN
    // CONDITION keeps the left row (null-extended); the same predicate
    // as a WHERE silently turns the join inner and drops it
    val cust = Seq(1L, 2L, 3L).toDF("ck")
    val ord = Seq((10L, 1L, "LOW"), (11L, 2L, "URGENT")).toDF("ok", "ock", "prio")
    val onCond = cust
      .join(ord, col("ck") === col("ock") && col("prio") =!= "URGENT", "left_outer")
      .groupBy("ck").agg(count(col("ok")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // cust 2's only order fails the condition -> c=0; cust 3 has none -> c=0
    assert(onCond == Map(1L -> 1L, 2L -> 0L, 3L -> 0L))
    val whereCond = cust
      .join(ord, col("ck") === col("ock"), "left_outer")
      .where(col("prio") =!= "URGENT") // null prio rows fail this too
      .groupBy("ck").agg(count(col("ok")).as("c"))
      .collect().map(r => r.getLong(0)).toSet
    assert(whereCond == Set(1L), "WHERE after outer join must drop null-extended rows")
  }

  test("full outer join null-extends BOTH sides; coalesce folds to zero (q76)") {
    val a = Seq(("d1", 2L), ("d2", 3L)).toDF("da", "na")
    val b = Seq(("d2", 5L), ("d3", 7L)).toDF("db", "nb")
    val got = a.join(b, col("da") === col("db"), "full_outer")
      .select(
        coalesce(col("da"), col("db")).as("d"),
        coalesce(col("na"), lit(0L)).as("na"),
        coalesce(col("nb"), lit(0L)).as("nb"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("d1", 2L, 0L), ("d2", 3L, 5L), ("d3", 0L, 7L)))
  }
}
