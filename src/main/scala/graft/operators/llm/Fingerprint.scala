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
}
