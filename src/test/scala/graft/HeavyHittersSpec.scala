package graft

import org.apache.spark.sql.functions._
import graft.functions.HeavyHitters

/** Misra-Gries heavy-hitters aggregate: exact when distinct <= width,
  * heavy items survive when distinct >> width, partial buffers merge
  * correctly across partitions.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("exact regime: distinct <= width reproduces true counts and order") {
    val rows = Seq.fill(30)("a") ++ Seq.fill(20)("b") ++ Seq.fill(20)("c") ++ Seq.fill(5)("d")
    val got = scala.util.Random.shuffle(rows).toDF("item").repartition(8)
      .agg(HeavyHitters.topK(col("item"), width = 16, k = 3).as("t"))
      .select(explode(col("t")).as("e"))
      .select("e.item", "e.cnt")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // b/c tie at 20 breaks by item asc
    assert(got == Seq(("a", 30L), ("b", 20L), ("c", 20L)))
  }

  test("approximate regime: heavy hitters survive a width far below distinct") {
    // 3 planted heavy items (>= 2000 each) in 20000 distinct light items
    // (1 occurrence each): width 64 << 20003 distinct, error <= N/width
    val heavy = Seq("hh1", "hh2", "hh3").flatMap(h => Seq.fill(2000)(h))
    val light = (1 to 20000).map(i => s"light$i")
    val df = scala.util.Random.shuffle(heavy ++ light).toDF("item").repartition(8)
    val got = df
      .agg(HeavyHitters.topK(col("item"), width = 64, k = 3).as("t"))
      .select(explode(col("t")).as("e"))
      .collect().map(_.getStruct(0).getString(0)).toSet
    assert(got == Set("hh1", "hh2", "hh3"),
      s"heavy hitters lost in the sketch: $got")
  }

  test("undercount bound: estimated count within N/width of truth") {
    val n = 26000
    val heavy = Seq.fill(6000)("hh")
    val light = (1 to 20000).map(i => s"l$i")
    val width = 64
    val est = scala.util.Random.shuffle(heavy ++ light).toDF("item").repartition(4)
      .agg(HeavyHitters.topK(col("item"), width = width, k = 1).as("t"))
      .select(explode(col("t")).as("e"))
      .head().getStruct(0).getLong(1)
    assert(est <= 6000, "Misra-Gries never overcounts within a partition chain")
    // the TRUE mergeable-summaries bound — the total decrement across
    // update chains AND merge trims is at most N/width
    assert(est >= 6000 - n / width, s"undercount beyond N/width bound: $est")
  }
}
