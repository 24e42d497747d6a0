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
  * Dimensions 2-4 get fused magic-mask intrinsics (32 / 21 / 16 bits
  * per axis). Each extra dimension divides the bits per dimension and
  * dilutes the locality of all of them, so beyond 3-4 axes the standard
  * advice stands: partition on the coarse axis and z-order the few
  * selective ones.
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

  /** Spread the low 21 bits of `v` to every 3rd bit position (the
    * standard 3-D Morton magic-mask sequence).
    */
  def spread3(v0: Long): Long = {
    var v = v0 & 0x1fffffL
    v = (v | (v << 32)) & 0x001f00000000ffffL
    v = (v | (v << 16)) & 0x001f0000ff0000ffL
    v = (v | (v << 8)) & 0x100f00f00f00f00fL
    v = (v | (v << 4)) & 0x10c30c30c30c30c3L
    v = (v | (v << 2)) & 0x1249249249249249L
    v
  }

  /** 3-D Morton key (21 bits per dimension). */
  def interleave3(x: Long, y: Long, z: Long): Long =
    spread3(x) | (spread3(y) << 1) | (spread3(z) << 2)

  /** Spread the low 16 bits of `v` to every 4th bit position. */
  def spread4(v0: Long): Long = {
    var v = v0 & 0xffffL
    v = (v | (v << 24)) & 0x000000ff000000ffL
    v = (v | (v << 12)) & 0x000f000f000f000fL
    v = (v | (v << 6)) & 0x0303030303030303L
    v = (v | (v << 3)) & 0x1111111111111111L
    v
  }

  /** 4-D Morton key (16 bits per dimension). */
  def interleave4(a: Long, b: Long, c: Long, d: Long): Long =
    spread4(a) | (spread4(b) << 1) | (spread4(c) << 2) | (spread4(d) << 3)
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

/** `zorder3(x, y, z)` — 21 bits per dimension; see [[ZOrderImpls]]. */
case class ZOrder3Expr(first: Expression, second: Expression, third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder3"
  override protected def nullSafeEval(x: Any, y: Any, z: Any): Any =
    ZOrderImpls.interleave3(
      x.asInstanceOf[Long], y.asInstanceOf[Long], z.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y, z) => s"graft.functions.ZOrderImpls.interleave3($x, $y, $z)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): ZOrder3Expr =
    copy(first = f, second = s, third = t)
}

/** `zorder4(a, b, c, d)` — 16 bits per dimension; see [[ZOrderImpls]]. */
case class ZOrder4Expr(
    first: Expression, second: Expression, third: Expression, fourth: Expression)
  extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder4"
  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    ZOrderImpls.interleave4(
      a.asInstanceOf[Long], b.asInstanceOf[Long],
      c.asInstanceOf[Long], d.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b, c, d) => s"graft.functions.ZOrderImpls.interleave4($a, $b, $c, $d)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): ZOrder4Expr =
    copy(first = f, second = s, third = t, fourth = q)
}
