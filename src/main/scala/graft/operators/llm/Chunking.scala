package graft.operators.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking for context-window preparation: split each document
  * into overlapping token windows of at most `maxTokens`, stride
  * `maxTokens - overlap`. One Generator (posexplode) per row — no
  * shuffle; chunk text is re-joined from the SAME materialized token
  * array the window indices are computed on.
  *
  * Chunk count = ceil(max(n - overlap, 1) / stride) for n > 0 tokens (a
  * blank document yields no chunks); the final chunk is shorter when the
  * tail doesn't fill a window.
  */
object Chunking {

  private def checkArgs(df: DataFrame, maxTokens: Int, overlap: Int): Unit = {
    require(maxTokens > 0, "maxTokens must be positive")
    require(overlap >= 0 && overlap < maxTokens, "need 0 <= overlap < maxTokens")
    val reserved = Seq("chunk_idx", "chunk_text", "__w", "__n", "__chunks")
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"Chunking reserves output/internal column names $reserved; rename $clash " +
        "(e.g. when re-chunking a previous pass's output)")
  }

  /** Native form: one compiled Generator pass per document
    * (graft.functions.ChunkTokensExpr) — no intermediate chunk array, no
    * interpreted HOF slices. Semantics identical to [[byTokensBuiltin]]
    * (asserted in SamplingChunkingSpec).
    */
  def byTokens(
      df: DataFrame,
      textCol: String,
      maxTokens: Int,
      overlap: Int = 0): DataFrame = {
    checkArgs(df, maxTokens, overlap)
    val carried = df.columns.toIndexedSeq.map(col)
    df.withColumn("__w", Dedup.tokens(col(textCol)))
      .select(carried :+
        org.apache.spark.sql.GraftColumnBridge.column(
          graft.functions.ChunkTokensExpr(
            org.apache.spark.sql.GraftColumnBridge.expression(col("__w")),
            maxTokens, overlap))
          .as(Seq("chunk_idx", "chunk_text")): _*)
  }

  /** Built-in-composition reference form of [[byTokens]] (HOF transform +
    * slice + posexplode). Kept as the cross-check and API fallback.
    */
  def byTokensBuiltin(
      df: DataFrame,
      textCol: String,
      maxTokens: Int,
      overlap: Int = 0): DataFrame = {
    checkArgs(df, maxTokens, overlap)
    val stride = maxTokens - overlap
    val carried = df.columns.toIndexedSeq.map(col)
    df.withColumn("__w", Dedup.tokens(col(textCol)))
      .withColumn("__n", size(array_remove(col("__w"), "")))
      .withColumn(
        "__chunks",
        when(col("__n") > 0,
          transform(
            sequence(
              lit(0),
              ceil(greatest(col("__n") - overlap, lit(1)).cast("double") / stride)
                .cast("int") - 1),
            i => concat_ws(" ", slice(col("__w"), i * stride + 1, lit(maxTokens)))))
          .otherwise(array().cast("array<string>")))
      .select(carried :+ posexplode(col("__chunks")).as(Seq("chunk_idx", "chunk_text")): _*)
  }
}
