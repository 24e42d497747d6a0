package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) interleaving for multi-dimensional data clustering.
  *
  * Sorting a table by `zorder2(x, y)` before writing gives every output
  * file a narrow min/max range in BOTH dimensions, so parquet footer
  * statistics prune row groups for predicates on either column — the
  * standard lake-layout technique for 100 TB fact tables queried along
  * more than one axis (a single-column sort only ever prunes its own
  * column). The key itself is never stored or compared across engines;
  * the correctness contract is the bit math, which q110 hash-verifies
  * against a DuckDB re-derivation of the same interleave.
  *
  * Two-dimensional on purpose: each extra dimension halves the bits per
  * dimension and dilutes the locality of all of them; beyond 2-3 axes
  * the standard advice is partition on the coarse axis and z-order the
  * two selective ones.
  */
object ZOrderImpls {

  /** Spread the low 32 bits of `v` to the even bit positions of a long
    * (classic magic-mask doubling; 5 shift/mask steps).
    */
  def spread(v0: Long): Long = {
    var v = v0 & 0xffffffffL
    v = (v | (v << 16)) & 0x0000ffff0000ffffL
    v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Morton key of two non-negative coordinates (low 32 bits each): x on
    * even bits, y on odd bits. Monotone per 2^k-aligned quadrant, which
    * is what makes an aligned box query a contiguous key range.
    */
  def interleave2(x: Long, y: Long): Long =
    spread(x) | (spread(y) << 1)
}

/** `zorder2(x, y)` — see [[ZOrderImpls]]. Inputs are cast to long by the
  * Column/SQL wrappers; values are taken mod 2^32 (coordinates are
  * expected to be bucket ordinals, not raw money/keys).
  */
case class ZOrder2Expr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"
  override protected def nullSafeEval(x: Any, y: Any): Any =
    ZOrderImpls.interleave2(x.asInstanceOf[Long], y.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.ZOrderImpls.interleave2($x, $y)")
  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): ZOrder2Expr = copy(left = newLeft, right = newRight)
}
