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

  val all: Map[String, UnboundFunction] = Map("bucket" -> BucketUnbound)

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
