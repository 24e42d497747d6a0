package graft

import org.apache.spark.sql.functions._
import graft.queries.TpchQueries

/** Value properties of the TPC-H module beyond its oracle rows: the
  * exact-decimal money path (the 2^63-headroom swap documented in the
  * module docstring) produces the same totals as the exact-long path,
  * and the q74 customer-distribution accounting is closed (every
  * customer lands in exactly one bucket).
  */
class TpchSuiteSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q68 decimal(38,6) money path == exact-long path") {
    val longPath = TpchQueries.queries("q68_tpch_pricing")(spark, sf)
      .select("l_returnflag", "l_linestatus", "sum_qty",
        "sum_base_cents", "sum_disc_e4", "sum_charge_e6", "cnt")
      .collect().map(_.toSeq).toSeq
    // decimal sums carry the same rounding point (cents / e4 / e6), so
    // scaling them back to integer units must reproduce the longs bit-for-bit
    val decPath = TpchQueries.q68PricingDecimal(spark, sf)
      .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
        (col("sum_base") * 100).cast("long").as("sum_base_cents"),
        (col("sum_disc") * 10000).cast("long").as("sum_disc_e4"),
        (col("sum_charge") * 1000000).cast("long").as("sum_charge_e6"),
        col("cnt"))
      .collect().map(_.toSeq).toSeq
    assert(decPath == longPath)
  }

  test("decimal(38,6) sum overflow RAISES under ANSI — never wraps (2^63-regime contract)") {
    // the long-cents path wraps silently past 2^63 (Java long arithmetic
    // has no overflow signal inside codegen sum), which is exactly why
    // q68PricingDecimal is the contract for the 100 TB regime: drive a
    // decimal(38,6) sum past its 1e32 bound and the engine must raise
    val df = spark.range(4)
      .select(expr("CAST('9.9e31' AS DECIMAL(38,6))").as("v"))
    val thrown = intercept[Throwable] {
      df.agg(sum(col("v")).as("total")).collect()
    }
    val chain = Iterator.iterate(thrown)(_.getCause).takeWhile(_ != null)
      .map(t => s"${t.getClass.getName}: ${String.valueOf(t.getMessage)}")
      .mkString(" | ")
    assert(chain.toLowerCase.contains("overflow")
        || chain.contains("NUMERIC_VALUE_OUT_OF_RANGE")
        || chain.contains("ArithmeticException"),
      s"expected a decimal-overflow error, got: $chain")
  }

  test("q74 custdist accounting is closed: buckets sum to the customer count") {
    val total = TpchQueries.queries("q74_tpch_custdist")(spark, sf)
      .agg(sum("custdist")).collect()(0).getLong(0)
    val customers = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(total == customers,
      "every customer must land in exactly one c_count bucket (outer join lost rows)")
  }
}
