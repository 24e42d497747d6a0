package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.llm.TextStats

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](textVal: String, c: org.apache.spark.sql.Column): T =
    Seq(textVal).toDF("t").select(c).head().get(0).asInstanceOf[T]

  test("tokenCount: whitespace runs, blanks, and empty strings") {
    assert(one[Int]("the quick  fox", TextStats.tokenCount(col("t"))) == 3)
    assert(one[Int]("", TextStats.tokenCount(col("t"))) == 0)
    assert(one[Int]("   \t  ", TextStats.tokenCount(col("t"))) == 0)
  }

  test("lineCount and charCount") {
    assert(one[Int]("a\nb\nc", TextStats.lineCount(col("t"))) == 3)
    assert(one[Int]("abcd", TextStats.charCount(col("t"))) == 4)
  }

  test("avgTokenLen averages over normalized tokens") {
    assert(one[Double]("ab abcd", TextStats.avgTokenLen(col("t"))) == 3.0)
  }

  test("punctRatio counts ASCII punctuation fraction") {
    assert(one[Double]("a,b.", TextStats.punctRatio(col("t"))) == 0.5)
    assert(one[Double]("", TextStats.punctRatio(col("t"))) == 0.0)
  }

  test("stopwordRatio matches against the profile") {
    val r = one[Double]("the cat sat", TextStats.stopwordRatio(col("t"), Seq("the", "a")))
    assert(math.abs(r - 1.0 / 3.0) < 1e-9)
  }

  test("topRunCount: most-frequent-element count via sorted-run HOF") {
    def top(xs: Seq[String]): Int =
      Seq(Tuple1(xs)).toDF("a").select(TextStats.topRunCount(col("a"))).head().getInt(0)
    assert(top(Seq("b", "a", "b", "c", "b")) == 3)
    assert(top(Seq("x")) == 1)
    assert(top(Seq.empty) == 0)
    // ties: either run reports its (equal) length
    assert(top(Seq("a", "b", "a", "b")) == 2)
  }

  test("wordNgrams preserves order and multiplicity (unlike shingles)") {
    val got = Seq("a b a b").toDF("t")
      .select(TextStats.wordNgrams(col("t"), 2)).head().getSeq[String](0)
    assert(got == Seq("a b", "b a", "a b"))
    val short = Seq("a").toDF("t")
      .select(TextStats.wordNgrams(col("t"), 2)).head().getSeq[String](0)
    assert(short.isEmpty)
  }

  test("langId picks the profile with the best stopword hit-rate") {
    val df = Seq(
      "the cat is in the house and it is warm",
      "el perro es un animal y la casa es grande",
      "xyzzy plugh qwerty").toDF("t")
    val got = df.select(TextStats.langId(col("t"))).collect().map(_.getString(0)).toSeq
    assert(got == Seq("en", "es", "und"))
  }

  test("qualityScore stays in [0,1] and rewards clean prose over noise") {
    val clean = ("the quick brown fox jumps over the lazy dog and " * 12).trim
    val noisy = "@@!! ## $$%% ^^&&"
    val scores = Seq(clean, noisy).toDF("t")
      .select(TextStats.qualityScore(col("t"), TextStats.langProfiles("en")))
      .collect().map(_.getDouble(0))
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores(0) > scores(1))
  }

  test("subwordCountEstimate adds units for digits and punctuation") {
    assert(one[Int]("hello world", TextStats.subwordCountEstimate(col("t"))) == 2)
    // 2 words + 1 punct + 1 digit run
    assert(one[Int]("hello world-42", TextStats.subwordCountEstimate(col("t"))) == 4)
  }
}
