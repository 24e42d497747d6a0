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
  def simhash64(text: Column): Column = {
    val toks = Dedup.tokens(text)
    val bitIdx = sequence(lit(0), lit(63))
    // the Scala shiftleft/shiftright helpers take Int amounts only; the
    // SQL functions accept a Column amount, so resolve those by name
    def shrU(c: Column, i: Column) = call_function("shiftrightunsigned", c, i)
    def shl(c: Column, i: Column) = call_function("shiftleft", c, i)
    // votes[i] = sum over tokens of (bit i of xxhash64(token) ? +1 : -1)
    val votes = aggregate(
      toks,
      array_repeat(lit(0), 64),
      (acc, t) =>
        zip_with(
          acc,
          transform(
            bitIdx,
            i => when(shrU(xxhash64(t), i).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)),
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
  def rollingHash(text: Column): Column =
    aggregate(Dedup.tokens(text), lit(0L), (acc, t) => xxhash64(acc, t))
}
