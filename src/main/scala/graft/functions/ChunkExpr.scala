package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Generator for context-window chunking: one compiled pass per
  * document emitting (chunk_idx, chunk_text) rows directly.
  *
  * The built-in composition (`transform(sequence(...), i =>
  * concat_ws(" ", slice(tokens, ...)))` + posexplode — kept as
  * `Chunking.byTokensBuiltin`) is semantically identical but every
  * higher-order function is CodegenFallback: the projection drops out of
  * whole-stage codegen, each chunk pays an interpreted slice (array
  * copy) + concat, and the chunk array is materialized before the
  * explode. This generator skips the intermediate array entirely.
  *
  * Semantics (shared with the builtin form and the q43 oracle):
  * chunks of `maxTokens` tokens, stride `maxTokens - overlap`;
  * chunk count = ceil(max(n - overlap, 1) / stride) for n > 0 non-empty
  * tokens; a blank document ([""] after normalization) yields no rows.
  */
case class ChunkTokensExpr(child: Expression, maxTokens: Int, overlap: Int)
  extends UnaryExpression with Generator with CodegenFallback {

  require(maxTokens > 0, "maxTokens must be positive")
  require(overlap >= 0 && overlap < maxTokens, "need 0 <= overlap < maxTokens")

  private val stride = maxTokens - overlap

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_idx", IntegerType, nullable = false),
    StructField("chunk_text", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val arr = v.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val toks = new Array[UTF8String](m)
    var n = 0
    var i = 0
    while (i < m) {
      val t = arr.getUTF8String(i)
      if (t != null && t.numBytes() > 0) { toks(n) = t; n += 1 }
      i += 1
    }
    if (n == 0) return Iterator.empty
    val numChunks = (math.max(n - overlap, 1) + stride - 1) / stride
    val sep = UTF8String.fromString(" ")
    (0 until numChunks).iterator.map { c =>
      val start = c * stride
      val end = math.min(start + maxTokens, n)
      val text = UTF8String.concatWs(sep, java.util.Arrays.copyOfRange(toks, start, end): _*)
      new GenericInternalRow(Array[Any](c, text))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ChunkTokensExpr =
    copy(child = newChild)
}
