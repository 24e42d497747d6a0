package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.llm.Similarity
import graft.sources.Sources

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vdf(rows: (Long, Seq[Float])*) = rows.toDF("vec_id", "embedding")

  test("cosine: orthogonal = 0, identical = 1, opposite = -1, zero-norm = null") {
    val df = vdf(
      1L -> Seq(1f, 0f), 2L -> Seq(0f, 1f), 3L -> Seq(2f, 0f),
      4L -> Seq(-1f, 0f), 5L -> Seq(0f, 0f))
    val q = df.where(col("vec_id") === 1).select(col("embedding").as("qv"))
    val got = df.crossJoin(q)
      .select(col("vec_id"), Similarity.cosine(col("embedding"), col("qv")).as("c"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(got(1L).contains(1.0) && got(3L).contains(1.0))
    assert(got(2L).contains(0.0))
    assert(got(4L).contains(-1.0))
    assert(got(5L).isEmpty)
  }

  test("cosineTopK ranks by similarity with id tie-break, self excluded") {
    val df = vdf(
      1L -> Seq(1f, 0f),
      2L -> Seq(1f, 0.1f), // closest to 1
      3L -> Seq(1f, 1f),
      4L -> Seq(0f, 1f))   // farthest from 1
    val got = Similarity
      .cosineTopK(df, df.where(col("vec_id") === 1), "vec_id", "embedding", k = 3)
      .orderBy("rank")
      .collect().map(_.getLong(1)).toSeq
    assert(got == Seq(2L, 3L, 4L))
  }

  test("topKPerKey local-then-global selection equals a plain global top-k") {
    val df = (1 to 1000).map(i => (i % 7, i * 31 % 997, i)).toDF("g", "score", "id")
      .repartition(8) // force multiple partitions so the local pass matters
    val viaOp = df
      .transform(Similarity.topKPerKey(Seq(col("g")), Seq(col("score").desc, col("id").asc), 5))
      .select("g", "score", "id")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    val expected = (1 to 1000).map(i => (i % 7, i * 31 % 997, i))
      .groupBy(_._1).values
      .flatMap(_.sortBy(t => (-t._2, t._3)).take(5)).toSet
    assert(viaOp == expected)
  }

  test("ANN top-k: high recall on clustered vectors (the contract LSH promises)") {
    // 100 base directions x 5 tightly perturbed copies: every vector's true
    // neighbors are its cluster-mates at cos ≈ 0.99. Hyperplane LSH is
    // built for exactly this case — near-parallel vectors agree on almost
    // every sign bit, so cluster-mates collide in some band w.h.p.
    val rnd = new scala.util.Random(42)
    val dims = 32
    val vecs = for {
      c <- 0 until 100
      base = Array.fill(dims)(rnd.nextGaussian().toFloat)
      rep <- 0 until 5
    } yield ((c * 5 + rep).toLong, base.map(v => v + 0.05f * rnd.nextGaussian().toFloat).toSeq)
    val df = vdf(vecs: _*)
    val q = df.where(col("vec_id") < 25)
    val exact = Similarity.cosineTopK(df, q, "vec_id", "embedding", k = 4)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annTopK(df, q, "vec_id", "embedding", k = 4, planes = 16, bands = 4)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect ann).size.toDouble / exact.size
    info(f"clustered ANN recall@4 = $recall%.2f")
    assert(recall >= 0.9, s"recall $recall below 0.9 on clustered data — LSH regressed")
  }

  test("ANN top-k recall is reported on the (near-random) sf0.001 fixture") {
    // The fixture's embeddings are nearly orthogonal random vectors (no
    // cluster structure), which bounds any LSH's recall — report it and
    // assert only a loose floor as a regression tripwire.
    val e = Sources.table(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.where(col("vec_id") < 10)
    val exact = Similarity.cosineTopK(e, q, "vec_id", "embedding", k = 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annTopK(e, q, "vec_id", "embedding", k = 5, planes = 16, bands = 4)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect ann).size.toDouble / exact.size
    info(f"fixture ANN recall@5 = $recall%.2f (${ann.size} returned)")
    assert(recall >= 0.3, s"recall $recall collapsed — candidate generation broken")
  }

  test("int8-quantized top-k nearly matches the exact ranking on the fixture") {
    // int8 keeps ~7 bits of per-component precision — on 64-dim vectors
    // the cosine error is ~1e-3, so the top-5 sets should almost always
    // agree with the float path (the compressed corpus is the 100 TB
    // storage path; this is its quality contract).
    val e = Sources.table(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.where(col("vec_id") < 10)
    val exact = Similarity.cosineTopK(e, q, "vec_id", "embedding", k = 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = Similarity.quantizedCosineTopK(e, q, "vec_id", "embedding", k = 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect quant).size.toDouble / exact.size
    info(f"int8 recall@5 vs exact = $recall%.2f")
    assert(recall >= 0.9, s"int8 recall $recall below 0.9 — quantization path degraded")
  }

  test("int8Quantize: components bounded by 127, zero vector quantizes to zeros") {
    val df = vdf(
      (1L, Seq(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f)))
      .select(col("vec_id"), Similarity.int8Quantize(col("embedding")).as("qv"))
    val rows = df.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(rows(1L) == Seq(64, -127, 32, 0))
    assert(rows(2L) == Seq(0, 0, 0, 0))
    assert(rows.values.forall(_.forall(v => v >= -127 && v <= 127)))
  }

  test("embeddingNearDups finds planted high-cosine pairs, skips the rest") {
    val rnd = new scala.util.Random(7)
    val dims = 32
    // 50 random vectors + 5 planted near-identical pairs (ids 100x/100x+1)
    val noise = (0 until 50).map(i => (i.toLong, Seq.fill(dims)(rnd.nextGaussian().toFloat)))
    val planted = (0 until 5).flatMap { p =>
      val v = Array.fill(dims)(rnd.nextGaussian().toFloat)
      Seq(
        (1000L + 2 * p, v.toSeq),
        (1001L + 2 * p, v.map(x => x + 0.01f * rnd.nextGaussian().toFloat).toSeq))
    }
    val df = vdf(noise ++ planted: _*)
    val pairs = Similarity.embeddingNearDups(df, "vec_id", "embedding", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 5).map(p => (1000L + 2 * p, 1001L + 2 * p)).toSet
    assert(pairs == expected)
  }

  test("incrementalEmbeddingNearDups == full recompute restricted to batch-touching " +
      "pairs, through a parquet signature round trip") {
    val base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    // plant true near-dups straddling the history/batch boundary
    val dups = Similarity.perturbedCopy(
      base.where(col("vec_id") < 20), "vec_id", "embedding", 10000L)
    val all = base.unionByName(dups)
    def isBatchId(c: org.apache.spark.sql.Column) = c >= 10000 || c % 5 === 0

    // full = one banded run over everything (empty history), restricted
    val sigsAll = Similarity.embeddingSignatures(all, "vec_id", "embedding")
    val full = Similarity.incrementalEmbeddingNearDups(
        sigsAll.limit(0), sigsAll, threshold = 0.5)
      .where(isBatchId(col("id_a")) || isBatchId(col("id_b")))

    // history signatures go through a parquet round trip — the persisted
    // table IS the contract (plain int/long arrays, no private state)
    val dir = java.nio.file.Files.createTempDirectory("graft-esigs").toFile
    dir.deleteOnExit()
    val path = s"${dir.getAbsolutePath}/sigs"
    Similarity.embeddingSignatures(
        all.where(!isBatchId(col("vec_id"))), "vec_id", "embedding")
      .write.mode("overwrite").parquet(path)
    val history = spark.read.parquet(path)
    val batch = Similarity.embeddingSignatures(
      all.where(isBatchId(col("vec_id"))), "vec_id", "embedding")

    val inc = Similarity.incrementalEmbeddingNearDups(history, batch, threshold = 0.5)
    val cols = Seq("id_a", "id_b", "cos")
    assert(
      inc.select(cols.map(col): _*).except(full.select(cols.map(col): _*)).isEmpty
        && full.select(cols.map(col): _*).except(inc.select(cols.map(col): _*)).isEmpty,
      "incremental embedding dedup diverged from restricted full recompute")
    // no history-history leakage, and every planted pair is found
    assert(inc.where(!isBatchId(col("id_a")) && !isBatchId(col("id_b"))).isEmpty)
    val planted = inc.where(col("cos") >= 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((0L until 20L).map(i => (i, i + 10000L)).forall(planted.contains),
      s"planted near-dups missing: $planted")
  }

  test("IVF top-k: high recall on clustered vectors; exact when probing all cells") {
    val rnd = new scala.util.Random(21)
    val dims = 32
    val vecs = for {
      c <- 0 until 40
      base = Array.fill(dims)(rnd.nextGaussian().toFloat)
      rep <- 0 until 5
    } yield ((c * 5 + rep).toLong, base.map(x => x + 0.05f * rnd.nextGaussian().toFloat).toSeq)
    val df = vdf(vecs: _*)
    val q = df.where(col("vec_id") < 20)
    val exact = Similarity.cosineTopK(df, q, "vec_id", "embedding", k = 4)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(df, q, "vec_id", "embedding", k = 4,
        centroids = 16, nprobe = 4)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    info(f"IVF recall@4 = $recall%.2f (centroids=16, nprobe=4)")
    assert(recall >= 0.8, s"IVF recall $recall below 0.8 on clustered data")
    // probing every cell makes IVF exhaustive
    val all = Similarity.ivfTopK(df, q, "vec_id", "embedding", k = 4,
        centroids = 8, nprobe = 8)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(all == exact)
  }

  test("native dot product is bit-identical to the HOF fold") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 50).map(i => (i.toLong, Seq.fill(64)(rnd.nextGaussian().toFloat)))
    val df = vdf(rows: _*)
    val q = df.where(col("vec_id") === 1).select(col("embedding").as("qv"))
    val cmp = df.crossJoin(q).select(
      Similarity.dot(col("embedding"), col("qv")).as("native"),
      Similarity.dotBuiltin(col("embedding"), col("qv")).as("hof"))
      .collect()
    cmp.foreach(r => assert(r.getDouble(0) == r.getDouble(1))) // same fold order -> bit-equal
  }

  test("hyperplaneBits is deterministic and angle-sensitive") {
    val df = vdf(1L -> Seq(1f, 2f, 3f), 2L -> Seq(1.01f, 2f, 3f), 3L -> Seq(-1f, -2f, -3f))
    val bits = df.select(col("vec_id"), Similarity.hyperplaneBits(col("embedding"), 16).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(bits(1L) == bits(2L), "tiny perturbation should not flip bits")
    assert(bits(3L) == bits(1L).map(1 - _), "negation flips every sign bit")
  }

  test("native hyperplaneBits is bit-identical to the HOF reference") {
    val rnd = new scala.util.Random(13)
    val df = vdf((1 to 40).map(i => (i.toLong, Seq.fill(48)(rnd.nextGaussian().toFloat))): _*)
    val cmp = df.select(
      Similarity.hyperplaneBits(col("embedding"), 16).as("native"),
      Similarity.hyperplaneBitsBuiltin(col("embedding"), 16).as("hof"))
      .collect()
    cmp.foreach(r => assert(r.getSeq[Int](0) == r.getSeq[Int](1)))
  }
}
