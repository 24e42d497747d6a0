package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Approximate heavy hitters (top-k frequent items) as a custom
  * `TypedImperativeAggregate` — the Misra-Gries frequency summary.
  *
  * The exact alternative (`groupBy(item).count().orderBy(...).limit(k)`)
  * shuffles one row per DISTINCT item; on a 100 TB corpus of n-grams
  * that's billions of keys through the wire for a 10-row answer. This
  * sketch holds at most `width` counters per partition, partial buffers
  * merge pairwise (mergeable-summary property), and only `width` rows per
  * map partition cross the shuffle.
  *
  * Guarantees (classic Misra-Gries): estimated count is an UNDERcount by
  * at most N/width (N = stream length); every item with true frequency
  * > N/width survives the summary. The bound holds across ANY
  * partial-buffer merge tree: merge() applies the mergeable-summaries
  * trim (subtract the (width+1)-th largest count, drop non-positive —
  * Agarwal et al., "Mergeable Summaries"), not a lossy keep-top-width
  * cut. When the distinct-item count never
  * exceeds `width`, no decrement ever fires and counts are EXACT — which
  * is what the oracle-checked query relies on at verification scale,
  * while HeavyHittersSpec exercises the approximate regime
  * (distinct >> width) separately.
  *
  * Implementation notes (both bit us during bring-up):
  *   - the buffer's value type is `java.lang.Long`, NOT scala.Long — a
  *     primitive-typed `HashMap.get` unboxes a missing key's null to 0L
  *     and silently breaks the containment test;
  *   - stored keys are `item.copy()`: the eval'd UTF8String aliases a
  *     row buffer the scan keeps rewriting (and `clone()` is not a deep
  *     copy when the string exactly fills its backing array).
  *
  * Output: array<struct<item string, cnt long>> — the k most frequent,
  * ordered by (cnt desc, item asc).
  */
case class HeavyHittersAgg(
    child: Expression,
    width: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[UTF8String, java.lang.Long]] {

  require(width >= 1 && k >= 1, "need width >= 1 and k >= 1")

  private type Buf = java.util.HashMap[UTF8String, java.lang.Long]

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): Buf = new java.util.HashMap[UTF8String, java.lang.Long]()

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String]
      val cur = buf.get(item)
      if (cur != null) buf.put(item, java.lang.Long.valueOf(cur.longValue + 1L))
      else if (buf.size < width) buf.put(item.copy(), java.lang.Long.valueOf(1L))
      else {
        // Misra-Gries step: decrement every counter, evict zeros
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue.longValue == 1L) it.remove()
          else e.setValue(java.lang.Long.valueOf(e.getValue.longValue - 1L))
        }
      }
    }
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    b2.forEach { (item, c) =>
      val cur = b1.get(item)
      b1.put(item, if (cur == null) c else java.lang.Long.valueOf(cur.longValue + c.longValue))
    }
    if (b1.size > width) {
      // mergeable-summaries trim (Agarwal et al.): subtract the
      // (width+1)-th largest count from every counter and drop the
      // non-positive ones. This is the Misra-Gries decrement applied in
      // bulk, so the N/width undercount bound holds across ANY merge
      // tree — a plain keep-top-width trim would not subtract and the
      // bound would decay per merge level. Deterministic: survivors and
      // their counts depend only on the count multiset, not on hash-map
      // iteration order.
      val counts = new Array[Long](b1.size)
      var i = 0
      val cit = b1.values().iterator()
      while (cit.hasNext) { counts(i) = cit.next().longValue; i += 1 }
      java.util.Arrays.sort(counts) // ascending; pivot = (width+1)-th largest
      val pivot = counts(counts.length - width - 1)
      val it = b1.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue.longValue - pivot
        if (nv <= 0L) it.remove()
        else e.setValue(java.lang.Long.valueOf(nv))
      }
    }
    b1
  }

  override def eval(buf: Buf): Any = {
    val entries = new java.util.ArrayList(buf.entrySet())
    entries.sort { (a, b) =>
      val c = java.lang.Long.compare(b.getValue.longValue, a.getValue.longValue)
      if (c != 0) c else a.getKey.compareTo(b.getKey)
    }
    val n = math.min(k, entries.size())
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val e = entries.get(i)
      out(i) = new GenericInternalRow(Array[Any](e.getKey, e.getValue.longValue))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.forEach { (item, c) =>
      val bytes = item.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c.longValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[UTF8String, java.lang.Long](n * 2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.put(UTF8String.fromBytes(b), java.lang.Long.valueOf(in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHittersAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "heavy_hitters"
}

object HeavyHitters {
  /** Column-level entry point: `df.agg(HeavyHitters.topK(col("term"), 4096, 10))`. */
  def topK(item: Column, width: Int, k: Int): Column =
    GraftColumnBridge.column(
      HeavyHittersAgg(GraftColumnBridge.expression(item.cast("string")), width, k)
        .toAggregateExpression())
}
