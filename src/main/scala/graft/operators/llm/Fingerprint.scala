package graft.operators.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Document fingerprinting: SimHash (near-dup sketch comparable by
  * Hamming distance) and a rolling polynomial content hash. Pure
  * per-row Catalyst expressions — computed in the scan stage, no
  * shuffle, no UDFs.
  */
object Fingerprint {

  /** 64-bit SimHash over whitespace tokens: each token votes ±1 on every
    * bit of its xxhash64; the sign of each bit-sum becomes the output
    * bit. Near-duplicate documents land within a few bits of Hamming
    * distance; nothing like the reference exists — this is the LLM-
    * pipeline extension surface.
    */
  def simhash64(text: Column): Column = graft.functions.exprs.simhash64(text)

  /** Reference implementation of [[simhash64]] in pure Catalyst built-ins
    * (higher-order functions). Algorithmically identical but interpreted
    * (~64 ops/token outside codegen) — kept as the cross-check the spec
    * runs against the native expression, and as the fallback if the
    * catalyst-internal API surface ever shifts.
    */
  def simhash64Builtin(text: Column): Column = {
    // Hash every token ONCE up front: this transform is the aggregate's
    // input, evaluated a single time — putting xxhash64(t) inside the
    // per-bit lambda instead would re-hash the token for each of the 64
    // bits (HOF lambdas re-evaluate their subtrees; no CSE).
    // filter() drops the [""] artifact a blank doc normalizes to, so an
    // empty document sketches to 0L (matching the native expression)
    val tokenHashes = transform(filter(Dedup.tokens(text), t => length(t) > 0), t => xxhash64(t))
    val bitIdx = sequence(lit(0), lit(63))
    // the Scala shiftleft/shiftright helpers take Int amounts only; the
    // SQL functions accept a Column amount, so resolve those by name
    def shrU(c: Column, i: Column) = call_function("shiftrightunsigned", c, i)
    def shl(c: Column, i: Column) = call_function("shiftleft", c, i)
    // votes[i] = sum over tokens of (bit i of xxhash64(token) ? +1 : -1)
    val votes = aggregate(
      tokenHashes,
      array_repeat(lit(0), 64),
      (acc, h) =>
        zip_with(
          acc,
          transform(
            bitIdx,
            i => when(shrU(h, i).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)),
          (a, b) => a + b))
    // pack sign bits: bit i set iff votes[i] > 0
    aggregate(
      zip_with(votes, bitIdx, (v, i) => when(v > 0, shl(lit(1L), i)).otherwise(lit(0L))),
      lit(0L),
      (acc, b) => acc.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Order-sensitive rolling content hash over normalized tokens: a
    * hash chain h := xxhash64(h, token). Distinguishes permutations
    * (unlike SimHash/MinHash, which are bag-of-shingle sketches), and
    * never overflows under ANSI arithmetic (a polynomial `h*31+x` fold
    * would).
    */
  def rollingHash(text: Column): Column = graft.functions.exprs.rollingHash64(text)

  /** Built-in-composition reference form of [[rollingHash]] (hash chain
    * via xxhash64(acc, token); same order-sensitivity, different chain
    * constants than the native expression).
    */
  def rollingHashBuiltin(text: Column): Column =
    aggregate(
      filter(Dedup.tokens(text), t => length(t) > 0),
      lit(0L),
      (acc, t) => xxhash64(acc, t))

  // ---- Engine-portable (SHA-256-derived) fingerprints -----------------
  // The xxhash64 forms above are the fast in-engine sketches (whole-stage
  // codegen, used by the dedup pipelines); their bit patterns are
  // Spark-internal, so no other engine can re-derive them. The two
  // fingerprints below trade per-token SHA-256 cost for PORTABILITY:
  // token hashes are the first 15 hex chars (60 bits — fits a signed
  // long with headroom) of sha2(token, 256), which any engine with a
  // SHA-256 primitive reproduces bit-for-bit. q29 ships these as its
  // hash-compared columns and the DuckDB oracle re-derives both in SQL;
  // FingerprintSpec asserts the same near-dup/ordering semantics as the
  // xxhash64 forms.

  /** 60-bit token hash: first 15 hex chars of sha2(token) as a long. */
  private def shaToken60(t: Column): Column =
    conv(substring(sha2(t, 256), 1, 15), 16, 10).cast("long")

  /** SHA-256-derived SimHash (60 bits): per-token ±1 votes on each bit
    * of the token's 60-bit SHA prefix; bit i of the output is set iff
    * more tokens voted 1 than 0. Empty documents sketch to 0L. Native
    * compiled loop (one MessageDigest per thread); [[simhashShaBuiltin]]
    * is the bit-identical HOF reference form (FingerprintSpec parity).
    */
  def simhashSha(text: Column): Column = graft.functions.exprs.simhashSha60(text)

  /** Built-in-composition reference form of [[simhashSha]]. */
  def simhashShaBuiltin(text: Column): Column = {
    // hash each token ONCE (HOF lambdas re-evaluate subtrees; no CSE)
    val tokenHashes = transform(
      filter(Dedup.tokens(text), t => length(t) > 0), t => shaToken60(t))
    val bitIdx = sequence(lit(0), lit(59))
    def shrU(c: Column, i: Column) = call_function("shiftrightunsigned", c, i)
    def shl(c: Column, i: Column) = call_function("shiftleft", c, i)
    val votes = aggregate(
      tokenHashes,
      array_repeat(lit(0), 60),
      (acc, h) =>
        zip_with(
          acc,
          transform(bitIdx, i => when(shrU(h, i).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)),
          (a, b) => a + b))
    aggregate(
      zip_with(votes, bitIdx, (v, i) => when(v > 0, shl(lit(1L), i)).otherwise(lit(0L))),
      lit(0L),
      (acc, b) => acc.bitwiseOR(b))
  }

  /** SHA-256 chain hash: order-sensitive rolling fingerprint
    * h := sha60(decimal(h) || '|' || token), folded left over the
    * normalized tokens from h = "0". Distinguishes permutations like
    * [[rollingHash]]; chaining on the DECIMAL string rendering keeps the
    * accumulator representation identical across engines. Native
    * compiled loop; [[shaChainHashBuiltin]] is the reference form.
    */
  def shaChainHash(text: Column): Column = graft.functions.exprs.shaChainHash(text)

  /** Built-in-composition reference form of [[shaChainHash]]. */
  def shaChainHashBuiltin(text: Column): Column =
    aggregate(
      filter(Dedup.tokens(text), t => length(t) > 0),
      lit("0"),
      (acc, t) => conv(substring(sha2(concat(acc, lit("|"), t), 256), 1, 15), 16, 10))
      .cast("long")
}
