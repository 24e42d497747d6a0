package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Per-key top-k as a first-class operator: custom `LogicalPlan` +
  * `SparkStrategy` + `SparkPlan` (the escalation path for WHOLE-OPERATOR
  * semantics the built-ins can't express efficiently — SURVEY.md §4).
  *
  * The built-in formulation (`row_number` window + filter, AggOps.topK)
  * SORTS every group in full: at 100 TB that is a total sort of each hash
  * partition just to keep k rows. This operator keeps a bounded heap of k
  * rows per key instead — O(rows * log k) compares, O(keys * k) memory —
  * and is planned in two phases like a hash aggregate: a PARTIAL pass
  * reduces every map partition to <= k rows per key before the shuffle,
  * the FINAL pass (hash-clustered by key) merges survivors. Only
  * k * mapPartitions rows per key ever cross the wire.
  */
case class TopKPerKeyPlan(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan)
  extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

/** Plans the logical node as final-over-partial. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      val partial = TopKPerKeyExec(keys, order, k, partial = true, planLater(child))
      TopKPerKeyExec(keys, order, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** Partial pass runs wherever the data already is; the final pass
    * demands hash-clustering by key (Spark inserts the one Exchange).
    */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else if (keys.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(keys) :: Nil

  /** Memory contract: held state is (distinct keys in this pass) x k
    * copied rows on the JVM heap — the same per-key-state shape as a hash
    * aggregate. The PARTIAL pass additionally bounds itself: past
    * `spark.graft.topk.partialFlushRows` held rows it emits everything
    * and resets (emitting more than k per key is correct there — the
    * final pass re-reduces), so an adversarial key cardinality degrades
    * to extra shuffled rows, not an OOM. The FINAL pass's state is
    * bounded by the keys hash-clustered into one partition; for workloads
    * where even that is too much, disable the rewrite
    * (spark.graft.topk.rewrite.enabled=false) to keep the spillable
    * window plan.
    */
  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val isPartial = partial
    val flushThreshold = org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.topk.partialFlushRows", "4000000").toLong
    // (mapPartitions, not the private[spark] mapPartitionsInternal; the
    // closure contains no RDD references so the cleaning pass is moot)
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = GenerateOrdering.generate(sortOrder, childOutput)
      import scala.jdk.CollectionConverters._

      def drain(heaps: java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]])
          : Iterator[InternalRow] =
        heaps.values.asScala.toList.iterator.flatMap { heap =>
          // emit in sort order within each key (deterministic output)
          val arr = heap.toArray(new Array[InternalRow](heap.size))
          java.util.Arrays.sort(arr, ord)
          arr.iterator
        }

      new Iterator[InternalRow] {
        // heap head = WORST kept row (reverse ordering) so one compare
        // decides admission
        private var heaps =
          new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
        private var held = 0L
        private var out: Iterator[InternalRow] = Iterator.empty

        private def fill(): Unit = {
          while (!out.hasNext && iter.hasNext) {
            val row = iter.next()
            val key = keyProj(row)
            var heap = heaps.get(key)
            if (heap == null) {
              // small initial capacity: a large k (callers sometimes pass a
              // huge literal as "effectively unlimited") must not eagerly
              // allocate a k-sized array per distinct key — the heap grows
              // on demand only for keys that actually reach k rows
              heap = new java.util.PriorityQueue[InternalRow](math.min(limit, 16), ord.reverse)
              heaps.put(key.copy(), heap)
            }
            if (heap.size < limit) { heap.add(row.copy()); held += 1 }
            else if (ord.compare(row, heap.peek()) < 0) {
              heap.poll()
              heap.add(row.copy())
            }
            if (isPartial && held >= flushThreshold) {
              out = drain(heaps)
              heaps = new java.util.HashMap()
              held = 0L
            }
          }
          if (!out.hasNext && !iter.hasNext && !heaps.isEmpty) {
            out = drain(heaps)
            heaps = new java.util.HashMap()
            held = 0L
          }
        }

        override def hasNext: Boolean = { fill(); out.hasNext }
        override def next(): InternalRow = { fill(); out.next() }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** User API. Self-registers the strategy on first use (also available via
  * `spark.sql.extensions=graft.functions.GraftExtensions`).
  */
object TopK {

  def register(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ TopKStrategy
    if (!spark.experimental.extraOptimizations.contains(TopKRewriteRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKRewriteRule
  }

  /** The k first rows per key under `order` (use `col.desc`/`col.asc`).
    * Make the order a total order (add a unique tie-break column) for
    * deterministic results.
    *
    * Columns are turned into RESOLVED catalyst expressions by routing
    * them through the analyzer on throwaway Sort/Project plans over the
    * same analyzed child (exprIds line up) — Spark 4's Column is a lazy
    * ColumnNode wrapper that must not leak into a custom plan (it is
    * neither resolved nor serializable).
    */
  def perKey(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.{Project, Sort}
    require(k >= 1, s"TopK.perKey needs k >= 1, got $k")
    val spark = df.sparkSession
    register(spark)
    val child = df.queryExecution.analyzed
    val sortExprs = df.sortWithinPartitions(order: _*)
      .queryExecution.analyzed.collectFirst { case s: Sort => s.order }
      .getOrElse(throw new IllegalArgumentException("order columns required"))
    val keyExprs: Seq[Expression] =
      if (keys.isEmpty) Nil
      else df.select(keys: _*).queryExecution.analyzed
        .collectFirst { case p: Project => p.projectList }
        // throw rather than silently degrade to a GLOBAL top-k
        .getOrElse(throw new IllegalStateException(
          "could not resolve key columns to a Project — key expressions unsupported"))
        .map { case a: Alias => a.child; case e => e }
    GraftColumnBridge.ofRows(spark, TopKPerKeyPlan(keyExprs, sortExprs, k, child))
  }
}
