package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot per-document fingerprint path.
  *
  * The same sketches exist as pure built-in higher-order-function
  * compositions (graft.operators.llm.Fingerprint.*Builtin) — correct, but
  * HOF lambdas are CodegenFallback and interpret ~64 ops per token. These
  * expressions run the identical algorithm as one tight compiled loop per
  * row and participate in whole-stage codegen via `defineCodeGen` (the
  * generated code calls the static hasher below) — measured ~20x faster
  * at 5k docs. This is the brief's escalation path: built-ins first, a
  * native `Expression` with `doGenCode` where the built-ins can't go fast
  * enough, never a black-box UDF.
  */
object HashImpls {

  private final val Seed = 42L // same seed as Spark's xxhash64 built-in

  @inline private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0b

  /** 64-bit SimHash over lower-cased whitespace tokens: each token votes
    * +-1 on every bit of its xxhash64; the vote signs become the output
    * bits. Token boundaries are ASCII-whitespace runs (safe to scan at
    * the byte level — UTF-8 continuation bytes are never ASCII), matching
    * the builtin form's `\s+` normalization.
    */
  def simhash(input: UTF8String): Long = {
    val s = input.toLowerCase
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes()
    val votes = new Array[Int](64)
    var i = 0
    var any = false
    while (i < n) {
      while (i < n && isSpace(s.getByte(i))) i += 1
      val start = i
      while (i < n && !isSpace(s.getByte(i))) i += 1
      if (i > start) {
        any = true
        val h = XXH64.hashUnsafeBytes(base, off + start, i - start, Seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
    }
    if (!any) return 0L
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  // SHA-256 digests are stateless across rows; reuse one instance per
  // thread (getInstance per row would dominate the fingerprint cost)
  private val sha256 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("SHA-256")
  }

  /** First 60 bits of a SHA-256 digest, exactly as an engine reading the
    * first 15 lowercase-hex characters computes them: nibbles 0..14
    * big-endian = bytes 0..6 followed by the high nibble of byte 7.
    */
  @inline private def sha60(md: java.security.MessageDigest): Long = {
    val d = md.digest()
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xfL)
  }

  /** 60-bit SHA-256-derived SimHash over lower-cased whitespace tokens —
    * the ENGINE-PORTABLE fingerprint (token hash = first 15 hex chars of
    * sha256(token), re-derivable by any engine with a SHA-256 primitive;
    * the q29 oracle recomputes it in SQL). Identical algorithm to the
    * HOF reference form `Fingerprint.simhashShaBuiltin`, as one compiled
    * loop per row (the HOF form interprets 60 vote lambdas per token —
    * measured ~18x slower at 5k docs).
    */
  def simhashSha(input: UTF8String): Long = {
    val s = input.toLowerCase
    val bytes = s.getBytes // UTF-8; ASCII-space scan is continuation-safe
    val n = bytes.length
    val md = sha256.get()
    val votes = new Array[Int](60)
    var i = 0
    var any = false
    while (i < n) {
      while (i < n && isSpace(bytes(i))) i += 1
      val start = i
      while (i < n && !isSpace(bytes(i))) i += 1
      if (i > start) {
        any = true
        md.reset()
        md.update(bytes, start, i - start)
        val h = sha60(md)
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
    }
    if (!any) return 0L
    var out = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** SHA-256 chain hash over lower-cased whitespace tokens: h :=
    * sha60(decimal(h) || '|' || token) from h = "0" — order-sensitive,
    * chained on the DECIMAL rendering so every engine's accumulator
    * representation is identical (Spark `conv` output == SQL
    * BIGINT::VARCHAR). Native form of `Fingerprint.shaChainHashBuiltin`.
    */
  def shaChainHash(input: UTF8String): Long = {
    val s = input.toLowerCase
    val bytes = s.getBytes
    val n = bytes.length
    val md = sha256.get()
    var cur = 0L
    var first = true
    var i = 0
    while (i < n) {
      while (i < n && isSpace(bytes(i))) i += 1
      val start = i
      while (i < n && !isSpace(bytes(i))) i += 1
      if (i > start) {
        md.reset()
        // decimal rendering of the accumulator ("0" before any token)
        md.update(java.lang.Long.toString(cur).getBytes(
          java.nio.charset.StandardCharsets.US_ASCII))
        md.update('|'.toByte)
        md.update(bytes, start, i - start)
        cur = sha60(md)
        first = false
      }
    }
    if (first) 0L else cur
  }

  /** Distinct hashes of all `n`-token shingles of a token array: each
    * shingle hashes as a chain of its tokens' bytes (h := xxh64(tok,
    * seed=h), seeded by n), so token boundaries stay significant without
    * materializing concatenated shingle strings. The shingle IDENTITY is
    * its 64-bit hash — downstream MinHash/Jaccard operate on these longs;
    * collision probability is negligible at 2^-64 per pair.
    */
  def shingleHashes(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new Array[Long](m - n + 1)
    var cnt = 0
    var i = 0
    while (i <= m - n) {
      var h = n.toLong
      var j = 0
      while (j < n) {
        val t = tokens.getUTF8String(i + j)
        h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes(), h)
        j += 1
      }
      if (seen.add(h)) { out(cnt) = h; cnt += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, cnt))
  }

  /** MinHash signature of a shingle-hash set: entry i is
    * `min over s of xxh64(s, seed=i)` — `k` independent permutation
    * minima from one pass over the set. An EMPTY set has no signature:
    * returns null (a sentinel like [Long.MaxValue]*k would band-collide
    * every empty document with every other as a perfect duplicate).
    */
  def minHashSig(shingleHashes: ArrayData, k: Int): ArrayData = {
    val m = shingleHashes.numElements()
    if (m == 0) return null
    val sig = new Array[Long](k)
    var i = 0
    while (i < k) {
      var best = Long.MaxValue
      var j = 0
      while (j < m) {
        val h = XXH64.hashLong(shingleHashes.getLong(j), i.toLong)
        if (h < best) best = h
        j += 1
      }
      sig(i) = best
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Band hashes of a signature: `bands` buckets of `len/bands` entries,
    * each chained into one long seeded by its band index.
    */
  def bandHashes(sig: ArrayData, bands: Int): ArrayData = {
    val m = sig.numElements()
    val rows = m / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = b.toLong
      var j = 0
      while (j < rows) {
        h = XXH64.hashLong(sig.getLong(b * rows + j), h)
        j += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Dot product accumulated in double in index order (bit-identical to
    * the zip_with/aggregate reference fold, which widens each element to
    * double before multiplying — the property the cosine oracle
    * comparison relies on). Separate float/double entry points so
    * neither element type pays an array-conversion cast. Null semantics
    * match the reference: a null element or a length mismatch yields
    * null (the HOF's null-padded zip_with poisons its fold the same
    * way), so corrupt rows surface as null cosine instead of a silently
    * wrong score.
    */
  def dotProductF(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  def dotProductD(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Int8 scalar quantization in one native pass: scale = max|x|/127,
    * q[i] = round(x[i]/scale) — EXACTLY the HOF reference form
    * (Similarity.int8QuantizeBuiltin): the max fold skips null elements
    * like `greatest`, rounding is BigDecimal HALF_UP like Spark's
    * `round`, null elements stay null in the output, and the all-zero
    * vector quantizes to zeros.
    */
  def int8Quantize(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var maxabs = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val v = Math.abs(a.getFloat(i).toDouble)
        if (v > maxabs) maxabs = v
      }
      i += 1
    }
    val sc = maxabs / 127.0
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      out(i) =
        if (a.isNullAt(i)) null
        else if (sc > 0)
          Int.box(java.math.BigDecimal.valueOf(a.getFloat(i).toDouble / sc)
            .setScale(0, java.math.RoundingMode.HALF_UP).intValue)
        else Int.box(0)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Integer dot product over int arrays, accumulated in long (exact —
    * no overflow at any realistic dim x 127^2). Null element or length
    * mismatch yields null, matching the zip_with/aggregate reference
    * fold's null poisoning.
    */
  def intDot(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getInt(i).toLong * b.getInt(i).toLong
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  /** Random-hyperplane LSH signature: sign bit of `sum_d vec[d]*w(p,d)`
    * per plane, with deterministic pseudo-weights
    * `w = xxh64(p, d) / Long.MaxValue` — the EXACT formula of the HOF
    * reference (Similarity.hyperplaneBitsBuiltin): seed 42, per-child
    * int-hash chaining, index-order accumulation, so the two forms are
    * bit-identical and interchangeable.
    */
  def hyperplaneBits(vec: ArrayData, planes: Int): ArrayData = {
    val n = vec.numElements()
    val out = new Array[Int](planes)
    var p = 0
    while (p < planes) {
      val seedP = XXH64.hashInt(p, Seed)
      var acc = 0.0
      var d = 0
      while (d < n) {
        val w = XXH64.hashInt(d, seedP).toDouble / Long.MaxValue.toDouble
        acc += vec.getFloat(d).toDouble * w
        d += 1
      }
      // NaN counts as positive: Spark SQL comparisons treat NaN as the
      // greatest double, so the reference `when(proj > 0, 1)` yields 1 —
      // Java's NaN > 0 == false would silently diverge
      out(p) = if (acc > 0 || java.lang.Double.isNaN(acc)) 1 else 0
      p += 1
    }
    new GenericArrayData(out)
  }

  /** Count of array elements present in `words` (pre-built set). */
  def stopwordHits(tokens: ArrayData, words: java.util.HashSet[UTF8String]): Int = {
    val n = tokens.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (words.contains(tokens.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  @inline private def isAsciiPunct(b: Byte): Boolean =
    (b >= '!' && b <= '/') || (b >= ':' && b <= '@') ||
      (b >= '[' && b <= '`') || (b >= '{' && b <= '~')

  /** Count of ASCII punctuation characters — byte-scan equivalent of
    * `length(regexp_replace(text, "[^\\p{Punct}]", ""))` (Java's
    * \p{Punct} is the POSIX ASCII class; UTF-8 continuation bytes are
    * never ASCII, so byte counting equals char counting).
    */
  def punctCount(s: UTF8String): Int = {
    val n = s.numBytes()
    var c = 0
    var i = 0
    while (i < n) {
      if (isAsciiPunct(s.getByte(i))) c += 1
      i += 1
    }
    c
  }

  /** Number of maximal ASCII digit runs — byte-scan equivalent of
    * counting the non-empty pieces of `split(text, "[^0-9]+")`.
    */
  def digitRuns(s: UTF8String): Int = {
    val n = s.numBytes()
    var c = 0
    var inRun = false
    var i = 0
    while (i < n) {
      val d = s.getByte(i) >= '0' && s.getByte(i) <= '9'
      if (d && !inRun) c += 1
      inRun = d
      i += 1
    }
    c
  }

  /** Normalized whitespace tokenization in one byte pass: split on ASCII
    * whitespace runs (Java regex `\s` is ASCII-only), lowercase each
    * token (full Unicode toLowerCase, applied per token — lowercase
    * mappings never produce or consume whitespace, so the split points
    * are identical to lowering first). Exactly equals the built-in
    * `split(trim(regexp_replace(lower(text), "\s+", " ")), " ")`
    * composition, including the blank-document artifact (a single empty
    * token) — property-asserted in EngineProps.
    */
  def tokenize(input: UTF8String): ArrayData = {
    val bytes = input.getBytes // one owned copy; token views point into it
    val n = bytes.length
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    while (i < n) {
      while (i < n && isSpace(bytes(i))) i += 1
      val start = i
      while (i < n && !isSpace(bytes(i))) i += 1
      if (i > start) out.add(UTF8String.fromBytes(bytes, start, i - start).toLowerCase)
    }
    if (out.isEmpty) return new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
    new GenericArrayData(out.toArray)
  }

  /** 64-bit SimHash over a PRE-HASHED feature set (e.g. shingle hashes
    * from [[shingleHashes]]): each feature hash votes +-1 on every bit
    * directly — no re-tokenization. SimHash over shingles separates
    * near-duplicates far better than over unigram tokens when documents
    * share a common vocabulary: the angle between shingle-set vectors
    * tracks Jaccard, while unigram bags of same-domain docs are all
    * nearly parallel. Empty set sketches to 0L (same convention as
    * [[simhash]]).
    */
  def simhashFromHashes(hashes: ArrayData): Long = {
    val m = hashes.numElements()
    if (m == 0) return 0L
    val votes = new Array[Int](64)
    var i = 0
    while (i < m) {
      val h = hashes.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Order-sensitive rolling hash: a chain h := xxhash64(token, seed = h)
    * over lower-cased whitespace tokens, starting at 0. Distinguishes
    * permutations (unlike the bag-of-tokens SimHash).
    */
  def rollingHash(input: UTF8String): Long = {
    val s = input.toLowerCase
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes()
    var h = 0L
    var i = 0
    while (i < n) {
      while (i < n && isSpace(s.getByte(i))) i += 1
      val start = i
      while (i < n && !isSpace(s.getByte(i))) i += 1
      if (i > start) h = XXH64.hashUnsafeBytes(base, off + start, i - start, h)
    }
    h
  }
}

case class ShingleHashesExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  override protected def nullSafeEval(input: Any): Any =
    HashImpls.shingleHashes(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.shingleHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

case class MinHashSigExpr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def nullable: Boolean = true // empty input -> null signature
  override protected def nullSafeEval(input: Any): Any =
    HashImpls.minHashSig(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.HashImpls.minHashSig($c, $k);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

case class BandHashesExpr(child: Expression, bands: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "band_hashes"
  override protected def nullSafeEval(input: Any): Any =
    HashImpls.bandHashes(input.asInstanceOf[ArrayData], bands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.bandHashes($c, $bands)")
  override protected def withNewChildInternal(newChild: Expression): BandHashesExpr =
    copy(child = newChild)
}

/** Membership count against a fixed word list (language-ID / quality
  * scoring hot loop). The set is built once per executor via a transient
  * lazy field; codegen references it through the expression object
  * (addReferenceObj), keeping the probe inside whole-stage codegen.
  */
case class StopwordHitsExpr(child: Expression, words: Seq[String]) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "stopword_hits"

  @transient lazy val wordSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    HashImpls.stopwordHits(input.asInstanceOf[ArrayData], wordSet)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopwordExpr", this, classOf[StopwordHitsExpr].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.stopwordHits($c, $ref.wordSet())")
  }
  override protected def withNewChildInternal(newChild: Expression): StopwordHitsExpr =
    copy(child = newChild)
}

case class PunctCountExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "punct_count"
  override protected def nullSafeEval(input: Any): Any =
    HashImpls.punctCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.punctCount($c)")
  override protected def withNewChildInternal(newChild: Expression): PunctCountExpr =
    copy(child = newChild)
}

case class DigitRunsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "digit_runs"
  override protected def nullSafeEval(input: Any): Any =
    HashImpls.digitRuns(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.digitRuns($c)")
  override protected def withNewChildInternal(newChild: Expression): DigitRunsExpr =
    copy(child = newChild)
}

case class HyperplaneBitsExpr(child: Expression, planes: Int) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "hyperplane_bits"
  override protected def nullSafeEval(input: Any): Any =
    HashImpls.hyperplaneBits(input.asInstanceOf[ArrayData], planes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.hyperplaneBits($c, $planes)")
  override protected def withNewChildInternal(newChild: Expression): HyperplaneBitsExpr =
    copy(child = newChild)
}

/** Both children must share one element type — float or double —
  * selecting the matching no-conversion code path (validated at plan
  * construction in `exprs.dotProduct` and re-checked lazily here).
  */
case class DotProductExpr(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "dot_product"
  override def nullable: Boolean = true // null element / length mismatch -> null

  private lazy val implName: String = left.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => "dotProductF"
    case ArrayType(org.apache.spark.sql.types.DoubleType, _) => "dotProductD"
    case t => throw new IllegalArgumentException(
      s"dot_product expects array<float> or array<double>, got $t")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (implName == "dotProductF")
      HashImpls.dotProductF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else HashImpls.dotProductD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_boxed = graft.functions.HashImpls.$implName($a, $b);
      if (${ev.value}_boxed == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_boxed.doubleValue(); }
    """)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

/** One-pass int8 quantization of an array<float> (see
  * HashImpls.int8Quantize for the exact semantics).
  */
case class Int8QuantizeExpr(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.IntegerType)
  override def prettyName: String = "int8_quantize"

  override protected def nullSafeEval(a: Any): Any =
    HashImpls.int8Quantize(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.int8Quantize($c)")
  override protected def withNewChildInternal(newChild: Expression): Int8QuantizeExpr =
    copy(child = newChild)
}

/** Long-accumulated integer dot product over two array<int> columns. */
case class IntDotExpr(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "int_dot"
  override def nullable: Boolean = true // null element / length mismatch -> null

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashImpls.intDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Long ${ev.value}_boxed = graft.functions.HashImpls.intDot($a, $b);
      if (${ev.value}_boxed == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_boxed.longValue(); }
    """)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDotExpr =
    copy(left = newLeft, right = newRight)
}

case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(input: Any): Any =
    HashImpls.simhash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.simhash($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

case class TokenizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tokenize"
  override protected def nullSafeEval(input: Any): Any =
    HashImpls.tokenize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.tokenize($c)")
  override protected def withNewChildInternal(newChild: Expression): TokenizeExpr =
    copy(child = newChild)
}

case class SimHashFromHashesExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_from_hashes"
  override protected def nullSafeEval(input: Any): Any =
    HashImpls.simhashFromHashes(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.simhashFromHashes($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHashFromHashesExpr =
    copy(child = newChild)
}

case class SimHashSha60Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sha60"
  override protected def nullSafeEval(input: Any): Any =
    HashImpls.simhashSha(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.simhashSha($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHashSha60Expr =
    copy(child = newChild)
}

case class ShaChainHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "sha_chain_hash"
  override protected def nullSafeEval(input: Any): Any =
    HashImpls.shaChainHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.shaChainHash($c)")
  override protected def withNewChildInternal(newChild: Expression): ShaChainHashExpr =
    copy(child = newChild)
}

case class RollingHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash64"
  override protected def nullSafeEval(input: Any): Any =
    HashImpls.rollingHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.rollingHash($c)")
  override protected def withNewChildInternal(newChild: Expression): RollingHash64Expr =
    copy(child = newChild)
}

/** Column-level entry points (no session/registry required). The cast
  * pins the input to StringType (the expressions themselves skip
  * ExpectsInputTypes — its type classes are private[sql] in Spark 4).
  */
object exprs {
  def simhash64(c: Column): Column =
    GraftColumnBridge.column(SimHash64Expr(GraftColumnBridge.expression(c.cast("string"))))
  def rollingHash64(c: Column): Column =
    GraftColumnBridge.column(RollingHash64Expr(GraftColumnBridge.expression(c.cast("string"))))
  def simhashSha60(c: Column): Column =
    GraftColumnBridge.column(SimHashSha60Expr(GraftColumnBridge.expression(c.cast("string"))))
  def shaChainHash(c: Column): Column =
    GraftColumnBridge.column(ShaChainHashExpr(GraftColumnBridge.expression(c.cast("string"))))
  def tokenize(c: Column): Column =
    GraftColumnBridge.column(TokenizeExpr(GraftColumnBridge.expression(c.cast("string"))))
  def simhashFromHashes(hashes: Column): Column =
    GraftColumnBridge.column(SimHashFromHashesExpr(GraftColumnBridge.expression(hashes)))
  def shingleHashes(tokens: Column, n: Int): Column =
    GraftColumnBridge.column(ShingleHashesExpr(GraftColumnBridge.expression(tokens), n))
  def minhashSig(shingleHashes: Column, k: Int): Column =
    GraftColumnBridge.column(MinHashSigExpr(GraftColumnBridge.expression(shingleHashes), k))
  def bandHashes(sig: Column, bands: Int): Column =
    GraftColumnBridge.column(BandHashesExpr(GraftColumnBridge.expression(sig), bands))
  /** No cast is applied: the expression dispatches on the analyzed
    * element type (float and double each get a native no-conversion
    * loop, both accumulating in double exactly like the reference
    * fold's per-element cast("double")); any other input type fails at
    * planning.
    */
  def dotProduct(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProductExpr(
      GraftColumnBridge.expression(a),
      GraftColumnBridge.expression(b)))
  def hyperplaneBits(vec: Column, planes: Int): Column =
    GraftColumnBridge.column(HyperplaneBitsExpr(
      GraftColumnBridge.expression(vec.cast("array<float>")), planes))
  def int8Quantize(vec: Column): Column =
    GraftColumnBridge.column(Int8QuantizeExpr(
      GraftColumnBridge.expression(vec.cast("array<float>"))))
  def intDot(a: Column, b: Column): Column =
    GraftColumnBridge.column(IntDotExpr(
      GraftColumnBridge.expression(a.cast("array<int>")),
      GraftColumnBridge.expression(b.cast("array<int>"))))
  def punctCount(c: Column): Column =
    GraftColumnBridge.column(PunctCountExpr(GraftColumnBridge.expression(c.cast("string"))))
  def stopwordHits(tokens: Column, words: Seq[String]): Column =
    GraftColumnBridge.column(StopwordHitsExpr(GraftColumnBridge.expression(tokens), words))
  def digitRuns(c: Column): Column =
    GraftColumnBridge.column(DigitRunsExpr(GraftColumnBridge.expression(c.cast("string"))))
  def zorder2(x: Column, y: Column): Column =
    GraftColumnBridge.column(ZOrder2Expr(
      GraftColumnBridge.expression(x.cast("long")),
      GraftColumnBridge.expression(y.cast("long"))))
  def zorder3(x: Column, y: Column, z: Column): Column =
    GraftColumnBridge.column(ZOrder3Expr(
      GraftColumnBridge.expression(x.cast("long")),
      GraftColumnBridge.expression(y.cast("long")),
      GraftColumnBridge.expression(z.cast("long"))))
  def zorder4(a: Column, b: Column, c: Column, d: Column): Column =
    GraftColumnBridge.column(ZOrder4Expr(
      GraftColumnBridge.expression(a.cast("long")),
      GraftColumnBridge.expression(b.cast("long")),
      GraftColumnBridge.expression(c.cast("long")),
      GraftColumnBridge.expression(d.cast("long"))))
  /** k-dimensional Morton key: fused intrinsics for 2-4 dims. */
  def zorderN(cols: Seq[Column]): Column = cols match {
    case Seq(x, y) => zorder2(x, y)
    case Seq(x, y, z) => zorder3(x, y, z)
    case Seq(a, b, c, d) => zorder4(a, b, c, d)
    case other => throw new IllegalArgumentException(
      s"zorderN supports 2-4 columns (got ${other.size}); beyond 4 axes the bits " +
        "per dimension stop pruning anything — partition on the coarse axes instead")
  }
}

/** SQL registration (`SELECT simhash64(text) ...`) via
  * `spark.sql.extensions=graft.functions.GraftExtensions`, the standard
  * extension hook — or programmatically through [[GraftExtensions.register]].
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    GraftExtensions.descs.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    ext.injectOptimizerRule(_ => graft.plans.TopKRewriteRule)
    // logical views over graft catalogs: DDL swaps at parse time (Spark
    // refuses view DDL on non-session catalogs before extension rules
    // run), reads substitute via a resolution rule
    ext.injectParser((_, delegate) => new graft.sources.lake.GraftViewSqlParser(delegate))
    ext.injectResolutionRule(s => graft.sources.lake.GraftViewSubstitution(s))
  }
}

object GraftExtensions {

  /** Arity-checked SQL builder that pins the argument to string (the
    * expressions skip ExpectsInputTypes — its type classes are
    * private[sql] — so without the cast a `simhash64(123)` would die
    * with a codegen/ClassCastException deep in execution instead of a
    * plan-time error).
    */
  private def unaryString(name: String, f: Expression => Expression)(
      args: Seq[Expression]): Expression = {
    if (args.length != 1)
      throw new IllegalArgumentException(s"$name expects exactly 1 argument, got ${args.length}")
    f(Cast(args.head, StringType))
  }

  private def unary(name: String, f: Expression => Expression)(
      args: Seq[Expression]): Expression = {
    if (args.length != 1)
      throw new IllegalArgumentException(s"$name expects exactly 1 argument, got ${args.length}")
    f(args.head)
  }

  private def binary(name: String, f: (Expression, Expression) => Expression)(
      args: Seq[Expression]): Expression = {
    if (args.length != 2)
      throw new IllegalArgumentException(s"$name expects exactly 2 arguments, got ${args.length}")
    f(args.head, args(1))
  }

  /** (expr, int-literal) shape — the int must be a foldable literal
    * because it parameterizes the expression itself (shingle size, hash
    * count, band count).
    */
  private def unaryWithInt(name: String, f: (Expression, Int) => Expression)(
      args: Seq[Expression]): Expression = args match {
    case Seq(e, Literal(i: Int, IntegerType)) => f(e, i)
    case _ => throw new IllegalArgumentException(
      s"$name expects (expr, int literal), got ${args.length} args")
  }

  /** The full native surface, callable from pure SQL — the whole MinHash
    * sketch pipeline composes as
    * `band_hashes(minhash_sig(shingle_hashes(split(text, ' '), 3), 32), 8)`.
    */
  private val descs: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq[(String, Seq[Expression] => Expression)](
      "simhash64" -> unaryString("simhash64", SimHash64Expr(_)) _,
      "tokenize" -> unaryString("tokenize", TokenizeExpr(_)) _,
      "rolling_hash64" -> unaryString("rolling_hash64", RollingHash64Expr(_)) _,
      "punct_count" -> unaryString("punct_count", PunctCountExpr(_)) _,
      "digit_runs" -> unaryString("digit_runs", DigitRunsExpr(_)) _,
      "simhash_from_hashes" -> unary("simhash_from_hashes", SimHashFromHashesExpr(_)) _,
      "shingle_hashes" -> unaryWithInt("shingle_hashes", ShingleHashesExpr(_, _)) _,
      "minhash_sig" -> unaryWithInt("minhash_sig", MinHashSigExpr(_, _)) _,
      "band_hashes" -> unaryWithInt("band_hashes", BandHashesExpr(_, _)) _,
      "hyperplane_bits" -> unaryWithInt(
        "hyperplane_bits",
        (e, p) => HyperplaneBitsExpr(Cast(e, ArrayType(org.apache.spark.sql.types.FloatType)), p)) _,
      "dot_product" -> binary("dot_product", DotProductExpr(_, _)) _,
      "int8_quantize" -> unary(
        "int8_quantize",
        e => Int8QuantizeExpr(Cast(e, ArrayType(org.apache.spark.sql.types.FloatType)))) _,
      "int_dot" -> binary(
        "int_dot",
        (a, b) => IntDotExpr(
          Cast(a, ArrayType(org.apache.spark.sql.types.IntegerType)),
          Cast(b, ArrayType(org.apache.spark.sql.types.IntegerType)))) _,
      "zorder2" -> binary(
        "zorder2",
        (x, y) => ZOrder2Expr(Cast(x, LongType), Cast(y, LongType))) _,
      "zorder3" -> { (args: Seq[Expression]) =>
        if (args.length != 3)
          throw new IllegalArgumentException(s"zorder3 expects 3 arguments, got ${args.length}")
        ZOrder3Expr(Cast(args(0), LongType), Cast(args(1), LongType), Cast(args(2), LongType))
      },
      "zorder4" -> { (args: Seq[Expression]) =>
        if (args.length != 4)
          throw new IllegalArgumentException(s"zorder4 expects 4 arguments, got ${args.length}")
        ZOrder4Expr(Cast(args(0), LongType), Cast(args(1), LongType),
          Cast(args(2), LongType), Cast(args(3), LongType))
      },
    ).map { case (name, builder) =>
      (new FunctionIdentifier(name),
        new ExpressionInfo(classOf[HashImpls.type].getName, name),
        builder)
    }

  /** Register on an already-built session (tests, driver-provided
    * sessions). Idempotent: skips names already present, so repeated
    * `align()` calls don't log a replaced-function warning per query.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    descs.foreach { case (id, _, builder) =>
      if (!spark.sessionState.functionRegistry.functionExists(id))
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          id.funcName, builder, "built-in")
    }
}
