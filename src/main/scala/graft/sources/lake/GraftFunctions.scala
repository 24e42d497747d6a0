package graft.sources.lake

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{
  BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** V2 catalog functions (`FunctionCatalog`) — the machinery that lets
  * Spark RESOLVE a partition transform to an evaluable expression. The
  * one that matters is `bucket`: when a scan reports
  * `KeyGroupedPartitioning(bucket(n, col))`, Spark loads the `bucket`
  * function from the TABLE's catalog, binds it to the column type, and
  * compares both join sides' bound transforms for storage-partitioned
  * join compatibility (the Iceberg SystemFunctions shape). The bound
  * function MUST agree bit-for-bit with the write path's
  * [[graft.operators.PartitionFn]] — both are Murmur3(col) pmod n over
  * the catalyst-internal value — or partition keys would lie.
  *
  * Also callable from SQL: `SELECT graft.system.bucket(8, x)` routes a
  * row's value to the partition it would be written to.
  */
private[lake] object GraftFunctions {

  val all: Map[String, UnboundFunction] =
    Map("bucket" -> BucketUnbound, "truncate" -> TruncateUnbound)

  /** Resolve a function by name, covering the parameterized
    * `truncate_<w>` family: Spark's KeyGroupedPartitioning accepts only
    * SINGLE-argument transforms (bucket alone is special-cased via
    * numBucketsOpt), so for storage-partitioned joins the truncate
    * WIDTH rides the function NAME — `truncate_3(col)` — instead of an
    * argument. Both join sides resolve the same name to the same bound
    * semantics, which is all the co-partitioning check needs.
    */
  def resolve(name: String): Option[UnboundFunction] = name match {
    case TruncN(w) => Some(new TruncateNUnbound(w.toInt))
    case other => all.get(other)
  }

  private val TruncN = "truncate_(\\d+)".r

  class TruncateNUnbound(w: Int) extends UnboundFunction {
    override def name(): String = s"truncate_$w"
    override def description(): String =
      s"truncate_$w(col): the truncate($w, col) partition transform as a " +
        "single-argument function (the key-grouped join form)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1,
        s"graft truncate_$w takes (col), got ${inputType.catalogString}")
      val dt = inputType.fields(0).dataType
      graft.operators.PartitionFn.validate(s"truncate:$w", dt)
      new TruncateNBound(w, dt)
    }
  }

  class TruncateNBound(w: Int, dt: DataType) extends ScalarFunction[AnyRef] {
    override def name(): String = s"truncate_$w"
    override def canonicalName(): String = s"graft.truncate_$w(${dt.catalogString})"
    override def inputTypes(): Array[DataType] = Array(dt)
    override def resultType(): DataType = dt
    override def isResultNullable: Boolean = true
    override def produceResult(input: InternalRow): AnyRef =
      if (input.isNullAt(0)) null
      else typedTruncate(w, dt, input.get(0, dt))
  }

  /** The truncate value in the COLUMN's type — shared by both truncate
    * faces; must agree bit-for-bit with the PartitionFn write path.
    */
  private def typedTruncate(w: Int, dt: DataType, v: Any): AnyRef = {
    val s = graft.operators.PartitionFn(s"truncate:$w", dt, v)
    dt match {
      case StringType => org.apache.spark.unsafe.types.UTF8String.fromString(s)
      case LongType => Long.box(s.toLong)
      case IntegerType => Int.box(s.toInt)
      case ShortType => Short.box(s.toShort)
      case other => throw new IllegalStateException(
        s"graft truncate over unsupported type ${other.simpleString}")
    }
  }

  object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(n, col): Murmur3 hash of col modulo n — the graft-lake bucket partition transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"graft bucket takes (numBuckets INT, col), got ${inputType.catalogString}")
      new BucketBound(inputType.fields(1).dataType)
    }
  }

  object TruncateUnbound extends UnboundFunction {
    override def name(): String = "truncate"
    override def description(): String =
      "truncate(w, col): string prefix / integral floor-to-width — the graft-lake " +
        "truncate partition transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"graft truncate takes (width INT, col), got ${inputType.catalogString}")
      val dt = inputType.fields(1).dataType
      graft.operators.PartitionFn.validate("truncate:1", dt) // type gate only
      new TruncateBound(dt)
    }
  }

  /** Result type = the COLUMN's type (a prefix is a string, a floored
    * int is an int) — which is also what the partition-key rows carry,
    * so both SPJ sides' TransformExpressions line up.
    */
  class TruncateBound(dt: DataType) extends ScalarFunction[AnyRef] {
    override def name(): String = "truncate"
    override def canonicalName(): String = s"graft.truncate(${dt.catalogString})"
    override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
    override def resultType(): DataType = dt
    override def isResultNullable: Boolean = true
    override def produceResult(input: InternalRow): AnyRef =
      if (input.isNullAt(1)) null
      else typedTruncate(input.getInt(0), dt, input.get(1, dt))
  }

  class BucketBound(dt: DataType) extends ScalarFunction[java.lang.Integer] {
    override def name(): String = "bucket"
    override def canonicalName(): String = s"graft.bucket(${dt.catalogString})"
    override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
    override def resultType(): DataType = IntegerType
    override def isResultNullable: Boolean = true // null routes to the null partition
    override def produceResult(input: InternalRow): java.lang.Integer =
      if (input.isNullAt(1)) null
      else {
        val n = input.getInt(0)
        graft.operators.PartitionFn(s"bucket:$n", dt, input.get(1, dt)).toInt
      }
  }
}
