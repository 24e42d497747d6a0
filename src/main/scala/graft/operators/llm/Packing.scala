package graft.operators.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Greedy sequence packing: assign ordered items (documents, chunks) to
  * consecutive fixed-token-budget packs — the step between curation and
  * writing training sequences, where documents are concatenated into
  * model-context-sized examples.
  *
  * Contract: items are taken in `order` within each `shard`; an item
  * whose cumulative-before count is in [k*budget, (k+1)*budget) joins
  * pack k. Pack k may overflow `budget` by at most one item's tail
  * (classic greedy next-fit); an item LARGER than the whole budget
  * overflows its own pack — filter such items upstream (or chunk them,
  * [[Chunking]]) if that matters.
  *
  * Scale shape: packing is inherently sequential, so the sequential unit
  * is the SHARD — one window partition per shard, shards packed in
  * parallel (at cluster scale: one shard per output writer task, e.g.
  * hash(doc_id) % writers). Everything is one window running sum + one
  * integer division: no driver state, deterministic for a given order.
  */
object Packing {

  def greedyPack(
      df: DataFrame,
      shard: Seq[Column],
      order: Seq[Column],
      tokens: Column,
      budget: Long,
      as: String = "pack_id"): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(shard: _*).orderBy(order: _*)
    df.withColumn("__cumb", sum(tokens).over(w) - tokens)
      .withColumn(as, expr(s"__cumb div ${budget}L"))
      .drop("__cumb")
  }
}
