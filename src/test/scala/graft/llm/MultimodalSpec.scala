package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.llm.Multimodal
import graft.sources.Sources

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("fromDocuments wraps text as typed media records with UTF-8 payloads") {
    val docs = Seq((1L, "hello")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", lit(5))
    val m = Multimodal.fromDocuments(docs).head()
    assert(m.media_id == 1L && m.kind == "text")
    assert(new String(m.payload, "UTF-8") == "hello")
  }

  test("resize keeps every factor-th byte; factor 1 is the identity") {
    def resize(s: String, f: Int): Array[Byte] = {
      val docs = Seq((1L, s)).toDF("doc_id", "text")
      Multimodal.resize(Multimodal.fromDocuments(docs), f).head().payload
    }
    assert(new String(resize("abcdef", 2), "UTF-8") == "ace")
    assert(new String(resize("abcdef", 3), "UTF-8") == "ad")
    assert(new String(resize("abcdef", 1), "UTF-8") == "abcdef")
    // arbitrary (non-ASCII) bytes survive bit-for-bit at factor 1
    val multi = "héllo→"
    assert(resize(multi, 1).toSeq == multi.getBytes("UTF-8").toSeq)
  }

  test("featurize is deterministic and shape-stable (the decoder contract)") {
    val docs = Sources.table(spark, "/root/testdata/sf0.001", "documents")
    val feats = Multimodal.featurize(Multimodal.fromDocuments(docs), dims = 8)
    val a = feats.collect().map(f => f.media_id -> f.features.toSeq).toMap
    val b = Multimodal.featurize(Multimodal.fromDocuments(docs), dims = 8)
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    assert(a == b, "FakeDecoder must be bit-stable across runs")
    assert(a.values.forall(_.length == 8))
    assert(a.nonEmpty)
  }

  test("FakeDecoder derives features from payload bytes alone") {
    val x = Multimodal.FakeDecoder.features("same bytes".getBytes("UTF-8"), 4)
    val y = Multimodal.FakeDecoder.features("same bytes".getBytes("UTF-8"), 4)
    val z = Multimodal.FakeDecoder.features("diff bytes".getBytes("UTF-8"), 4)
    assert(x.toSeq == y.toSeq)
    assert(x.toSeq != z.toSeq)
  }

  test("sampleSegments slices k windows from the payload") {
    val got = Seq("abcdefghij").toDF("t")
      .select(Multimodal.sampleSegments(encode(col("t"), "UTF-8"), k = 3, segLen = 2).as("s"))
      .head().getSeq[Array[Byte]](0)
      .map(b => new String(b, "UTF-8"))
    assert(got.length == 3)
    assert(got.head == "ab", s"first window anchored at start, got $got")
    assert(got.forall(_.length == 2))
  }
}
