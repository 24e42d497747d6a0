package graft

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The typed-API faces: a Dataset Aggregator[IN, BUF, OUT] (the
  * user-level custom-aggregate escape hatch, distinct from the
  * catalyst-level TypedImperativeAggregate) and join-strategy hints.
  */
object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
    (b._1 + in._1 * in._2, b._2 + in._2)
  override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(r: (Double, Double)): Double =
    if (r._2 == 0) Double.NaN else r._1 / r._2
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

class TypedAggSpec extends SparkSpec {
  import spark.implicits._

  test("Aggregator[IN,BUF,OUT]: typed weighted mean, partial+final merged") {
    val ds = Seq((10.0, 1.0), (20.0, 3.0), (0.0, 0.0)).toDS().repartition(3)
    val got = ds.select(WeightedMean.toColumn).head()
    assert(math.abs(got - 17.5) < 1e-12, s"weighted mean: $got") // (10 + 60) / 4
  }

  test("join strategy hints steer the physical plan") {
    val a = spark.range(10000).toDF("id")
    val b = spark.range(10000).toDF("id")
    def planOf(hint: String) = {
      val q = a.join(b.hint(hint), "id").groupBy().count()
      q.collect()
      q.queryExecution.executedPlan.toString
    }
    assert(planOf("shuffle_hash").contains("ShuffledHashJoin"))
    assert(planOf("merge").contains("SortMergeJoin"))
    assert(planOf("broadcast").contains("BroadcastHashJoin"))
  }
}
