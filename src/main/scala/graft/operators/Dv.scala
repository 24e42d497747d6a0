package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration
import org.roaringbitmap.longlong.Roaring64Bitmap

/** DELETION VECTORS — the merge-on-read delete sidecar (the Delta DV /
  * Iceberg positional-delete shape).
  *
  * A copy-on-write DELETE that matches 0.1% of the rows in a 1 GiB file
  * rewrites the whole gigabyte; at 100 TB a broad-but-sparse delete
  * (GDPR erasure, spam takedown, decontamination against a fresh
  * benchmark) rewrites the table. A deletion vector instead records the
  * POSITIONS of the deleted rows in an immutable per-file bitmap
  * sidecar (`dv/<uuid>.dv`, a serialized 64-bit Roaring bitmap); the
  * data file is untouched, the commit is O(matched rows) metadata, and
  * every read path filters the dead positions out on the fly. OPTIMIZE
  * materializes (rewrites file minus dead rows, drops the DV), restoring
  * pure-columnar scans — the standard write-fast / read-clean split.
  */
private[graft] object Dv {

  /** Directory under the table root holding DV sidecars (sibling of
    * `data/` so the data-file vacuum sweep never sees them).
    */
  val Dir = "dv"

  def serialize(bm: Roaring64Bitmap): Array[Byte] = {
    bm.runOptimize()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    bm.serialize(out)
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Roaring64Bitmap = {
    val bm = new Roaring64Bitmap()
    bm.deserialize(new DataInputStream(new ByteArrayInputStream(bytes)))
    bm
  }

  /** Write a bitmap as a new immutable DV sidecar; returns its rel path
    * under the table root. Invisible until a manifest entry references
    * it (a losing commit racer's DV is an orphan, reclaimed by vacuum's
    * `dv/` sweep).
    */
  def write(spark: SparkSession, root: String, bm: Roaring64Bitmap): String =
    writeFrom(spark.sparkContext.hadoopConfiguration, root, bm)

  /** [[write]] callable from EXECUTOR tasks (Configuration, not
    * SparkSession) with the temp-create + rename publish the streaming
    * writer uses: a killed/speculative attempt leaves only a
    * `.inprogress` temp (never `.dv`, so no reader or vacuum pin ever
    * sees it; vacuum sweeps aged temps). Fresh UUID names make attempts
    * collision-free — the one row that reaches the driver references
    * the one published sidecar, the rest are unreferenced orphans.
    */
  def writeFrom(conf: Configuration, root: String, bm: Roaring64Bitmap): String = {
    val name = java.util.UUID.randomUUID().toString.take(12)
    val rel = s"$Dir/$name.dv"
    val p = new Path(root, rel)
    val f = p.getFileSystem(conf)
    f.mkdirs(p.getParent)
    val tmp = new Path(p.getParent, s".$name.inprogress")
    val out = f.create(tmp, true)
    try out.write(serialize(bm)) finally out.close()
    require(f.rename(tmp, p), s"Dv.writeFrom: publish rename failed for $p")
    rel
  }

  def read(conf: Configuration, abs: String): Roaring64Bitmap = {
    val p = new Path(abs)
    val f = p.getFileSystem(conf)
    val len = f.getFileStatus(p).getLen
    val buf = new Array[Byte](len.toInt)
    val in = f.open(p)
    try in.readFully(0, buf) finally in.close()
    deserialize(buf)
  }

  // DV sidecars are immutable, so a JVM-wide cache is safe; bounded so
  // a long-lived executor scanning many tables cannot accumulate
  // unboundedly (entries are compressed bitmaps — small)
  private val cache =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, Roaring64Bitmap](64, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Roaring64Bitmap]): Boolean =
          size() > 256
      })

  def cached(conf: Configuration, abs: String): Roaring64Bitmap = {
    val hit = cache.get(abs)
    if (hit != null) hit
    else {
      val bm = read(conf, abs)
      cache.put(abs, bm)
      bm
    }
  }

  /** The matching key between a scan row's `_metadata.file_path` and a
    * manifest entry: the last four RAW path segments
    * (`data/<batch>/<partdir>/<name>`). The bare file NAME is NOT
    * unique — one dynamic-partition write task emits the same
    * `part-00000-<jobUuid>` name into every partition directory it
    * touches — but the batch + partition-dir + name triple is.
    */
  def suffixKey(rawPath: String): String = {
    val parts = rawPath.split('/')
    parts.takeRight(4).mkString("/")
  }

  /** `_metadata.file_path` arrives URL-ENCODED (space → %20, and the
    * Hive partition-dir escapes' own '%' doubled to %25); the manifest
    * rel is the RAW on-disk form. One URI decode maps the former onto
    * the latter exactly; a non-URL string (no scheme, raw spaces) falls
    * through unchanged.
    */
  def decodeUrlPath(url: String): String =
    try {
      val p = new java.net.URI(url).getPath
      if (p == null) url else p
    } catch { case _: java.net.URISyntaxException => url }
}

/** Row-level DV membership filter, usable inside whole-stage codegen
  * (reference-object call, the [[graft.functions.StopwordHitsExpr]]
  * pattern). `filePath`/`rowPos` come from the scan's `_metadata`
  * struct. Two source forms: `paths` (file name -> absolute DV sidecar
  * path, loaded lazily executor-side through the JVM-wide cache — the
  * scan shape: the driver ships only path strings, never bitmap bytes)
  * and `inline` (file name -> serialized bitmap, for small derived
  * bitmaps like a CDC diff). A file in neither map has no DV.
  *
  * `keepMembers = false` keeps LIVE rows (scan face: keep what the DV
  * does NOT contain); `true` keeps exactly the DV'd positions (CDC
  * face: read back the rows a delete removed).
  */
case class DvKeepExpr(
    left: Expression,
    right: Expression,
    paths: Map[String, String],
    inline: Map[String, Array[Byte]],
    keepMembers: Boolean,
    conf: SerializableConfiguration)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "dv_keep"

  // per-task memo of RAW file-path -> bitmap (null = no DV): the string
  // decode + suffix-key + map probe runs once per FILE, not per row (a
  // scan partition reads one file; the raw UTF8String repeats)
  @transient private lazy val memo = new java.util.HashMap[UTF8String, Roaring64Bitmap]()

  /** Public so generated code can call through the reference object. */
  def keep(path: UTF8String, pos: Long): Boolean = {
    var bm = memo.get(path)
    if (bm == null && !memo.containsKey(path)) {
      val key = Dv.suffixKey(Dv.decodeUrlPath(path.toString))
      bm = inline.get(key).map(Dv.deserialize)
        .orElse(paths.get(key).map(p => Dv.cached(conf.value, p)))
        .orNull
      // the incoming UTF8String aliases a reused scan buffer — deep-copy
      // before keying the memo (copy(), not clone(): see HeavyHittersAgg)
      memo.put(path.copy(), bm)
    }
    (bm != null && bm.contains(pos)) == keepMembers
  }

  override protected def nullSafeEval(path: Any, pos: Any): Any =
    keep(path.asInstanceOf[UTF8String], pos.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dvKeep", this, classOf[DvKeepExpr].getName)
    defineCodeGen(ctx, ev, (p, i) => s"$ref.keep($p, $i)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Row positions -> one serialized 64-bit Roaring bitmap per group: the
  * aggregate that BUILDS a deletion vector distributedly. Partial
  * buffers are bitmaps, merge is bitmap OR (mergeable-summary shape) —
  * only compressed bitmaps cross the shuffle, one output row per file,
  * regardless of how many rows a delete matches.
  */
case class PosBitmapAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Roaring64Bitmap] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Roaring64Bitmap = new Roaring64Bitmap()

  override def update(buf: Roaring64Bitmap, input: InternalRow): Roaring64Bitmap = {
    val v = child.eval(input)
    if (v != null) buf.addLong(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Roaring64Bitmap, other: Roaring64Bitmap): Roaring64Bitmap = {
    buf.or(other)
    buf
  }

  override def eval(buf: Roaring64Bitmap): Any = Dv.serialize(buf)

  override def serialize(buf: Roaring64Bitmap): Array[Byte] = Dv.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Roaring64Bitmap = Dv.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): PosBitmapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PosBitmapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}
