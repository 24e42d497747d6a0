package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.llm.Fingerprint

class FingerprintSpec extends SparkSpec {
  import spark.implicits._

  private val base = (1 to 60).map(i => s"tok$i").mkString(" ")
  private val nearDup = (1 to 60).map(i => if (i == 30) "edited" else s"tok$i").mkString(" ")
  private val unrelated = (1 to 60).map(i => s"other$i").mkString(" ")

  private def fp(texts: String*): Map[String, (Long, Long)] =
    texts.toDF("t")
      .select(col("t"),
        Fingerprint.simhash64(col("t")).as("s"),
        Fingerprint.rollingHash(col("t")).as("r"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("simhash: near-dups land within a few bits; unrelated docs far apart") {
    val m = fp(base, nearDup, unrelated)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(m(base)._1, m(nearDup)._1) <= 12)
    assert(ham(m(base)._1, m(unrelated)._1) >= 20)
  }

  test("hamming64 column matches Long.bitCount") {
    val got = Seq((0x0fL, 0xf0L)).toDF("a", "b")
      .select(Fingerprint.hamming64(col("a"), col("b"))).head().getInt(0)
    assert(got == 8)
  }

  test("rollingHash is order-sensitive where simhash is not") {
    val fwd = "alpha beta gamma delta"
    val rev = "delta gamma beta alpha"
    val m = fp(fwd, rev)
    assert(m(fwd)._2 != m(rev)._2, "permutation must change the rolling hash")
    assert(m(fwd)._1 == m(rev)._1, "simhash is a bag-of-tokens sketch")
  }

  test("fingerprints are deterministic across evaluations") {
    val a = fp(base); val b = fp(base)
    assert(a == b)
  }

  test("native simhash64 expression agrees with the built-in HOF form") {
    // same algorithm, same xxhash seed, same tokenization -> identical
    // output; this is the guard that the codegen'd expression and the
    // pure-Catalyst reference never drift
    val rows = Seq(base, nearDup, unrelated, "Mixed  CASE\ttext", "").toDF("t")
      .select(
        Fingerprint.simhash64(col("t")).as("native"),
        Fingerprint.simhash64Builtin(col("t")).as("builtin"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("native SHA fingerprints agree with the built-in HOF forms and keep the family semantics") {
    // the q29 portable forms: native compiled loop vs pure-Catalyst
    // sha2/conv composition — same tokenization, same 15-hex-nibble
    // truncation, same decimal-rendered chain accumulator
    val rows = Seq(base, nearDup, unrelated, "Mixed  CASE\ttext", "", "  ", "one")
      .toDF("t")
      .select(
        Fingerprint.simhashSha(col("t")).as("sn"),
        Fingerprint.simhashShaBuiltin(col("t")).as("sb"),
        Fingerprint.shaChainHash(col("t")).as("cn"),
        Fingerprint.shaChainHashBuiltin(col("t")).as("cb"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), "simhashSha native != builtin")
      assert(r.getLong(2) == r.getLong(3), "shaChainHash native != builtin")
    }
    // same near-dup/order semantics as the xxhash64 family
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val m = Seq(base, nearDup, unrelated, "alpha beta", "beta alpha").toDF("t")
      .select(col("t"), Fingerprint.simhashSha(col("t")), Fingerprint.shaChainHash(col("t")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(ham(m(base)._1, m(nearDup)._1) <= 12)
    assert(ham(m(base)._1, m(unrelated)._1) >= 18)
    assert(m("alpha beta")._1 == m("beta alpha")._1, "simhash is a bag sketch")
    assert(m("alpha beta")._2 != m("beta alpha")._2, "chain hash is order-sensitive")
  }

  test("expressions are SQL-callable after GraftExtensions registration") {
    graft.functions.GraftExtensions.register(spark)
    Seq(base).toDF("t").createOrReplaceTempView("fp_docs")
    val r = spark.sql("SELECT simhash64(t) AS s, rolling_hash64(t) AS r FROM fp_docs").head()
    assert(r.getLong(0) != 0L && r.getLong(1) != 0L)
  }
}
