package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.SparkEngine
import graft.operators.llm.Similarity
import graft.sources.Sources

/** Recall telemetry for the approximate similarity operators at bench
  * scale — the number a user tuning planes/bands/nprobe actually needs,
  * which the unit-scale SimilaritySpec floors (>= 0.9 on 60 planted
  * vectors) cannot provide. Measures, on SPARK_GRAFT_SF_DIR:
  *
  *   - q23  annTopK (hyperplane LSH, the bench configuration) — mean
  *     recall@k against the exact brute-force top-k (q22's oracle);
  *   - q45  ivfTopK in its APPROXIMATE configuration (nprobe <<
  *     centroids; the bench query probes exhaustively and is
  *     hash-verified, so the interesting number is the approximate one);
  *   - q37  embeddingNearDups — pair recall against the exact all-pairs
  *     cosine>=threshold set (the one O(n^2) pass this tool exists to
  *     avoid at scale; affordable offline at sf0.1).
  *
  * Writes one JSON object to RECALL_r{round}.json (arg 1, default
  * "RECALL.json") and prints it.
  */
object Recall {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outPath = args.headOption.getOrElse("RECALL.json")
    val spark = SparkEngine.session(master = "local[32]", appName = "graft-recall",
      shufflePartitions = 32)

    val e = Sources.table(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val q = e.where(col("vec_id") < 10)
    val k = 5

    def topkSet(df: DataFrame): Map[Long, Set[Long]] =
      df.select(col("qid").cast("long"), col("nid").cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._1).map { case (qid, ns) => qid -> ns.map(_._2).toSet }

    def meanRecall(approx: Map[Long, Set[Long]], exact: Map[Long, Set[Long]]): Double = {
      val per = exact.map { case (qid, ex) =>
        approx.getOrElse(qid, Set.empty).intersect(ex).size.toDouble / ex.size }
      per.sum / per.size
    }

    val exactTopk = topkSet(Similarity.cosineTopK(e, q, "vec_id", "embedding", k))
    // q107: int8-quantized brute force — lossy storage, not lossy search;
    // at 64 dims the quantization noise rarely reorders a top-5
    val int8Recall = meanRecall(
      topkSet(Similarity.quantizedCosineTopK(e, q, "vec_id", "embedding", k)),
      exactTopk)
    // tuning sweep: recall@k as planes/bands scale. The bench q23 config
    // is 96/48 (2-bit bands — conclusive candidate coverage on this
    // corpus); the sweep shows what narrower configs give up.
    val annSweep = Seq((16, 4), (32, 8), (64, 16), (64, 32), (96, 48)).map { case (p, b) =>
      val r = meanRecall(
        topkSet(Similarity.annTopK(e, q, "vec_id", "embedding", k, planes = p, bands = b)),
        exactTopk)
      f"""{"planes":$p,"bands":$b,"recall_at_k":$r%.4f}"""
    }
    val ivfSweep = Seq(2, 4, 8).map { n =>
      val r = meanRecall(
        topkSet(Similarity.ivfTopK(e, q, "vec_id", "embedding", k,
          centroids = 16, nprobe = n)),
        exactTopk)
      f"""{"centroids":16,"nprobe":$n,"recall_at_k":$r%.4f}"""
    }
    graft.engine.ManagedCache.unpersistAll()

    // q37: exact all-pairs reference — same score formula and rounding as
    // the operator (round-6 cosine >= threshold), so approx is a strict
    // subset and recall is a pure candidate-coverage number. Stratified
    // by cosine band: hyperplane-LSH recall is a function of the pair's
    // ANGLE, so "recall at threshold" mixes easy true near-dups
    // (cos>=0.8, which the operator exists to find) with borderline
    // pairs barely over the cut — report each band.
    val threshold = 0.3
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("__va"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("__vb"))
    val band = when(col("cos") >= 0.8, "0.8-1.0")
      .when(col("cos") >= 0.5, "0.5-0.8").otherwise("0.3-0.5")
    val exactPairs = a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(Similarity.cosine(col("__va"), col("__vb")), 6).as("cos"))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), band.as("band"))
      .localCheckpoint(true) // one O(n^2) pass, reused by every stratum
    val approxPairs = Similarity.embeddingNearDups(e, "vec_id", "embedding", threshold)
      .select("id_a", "id_b")
    val hits = approxPairs.join(exactPairs, Seq("id_a", "id_b"), "inner")
    def perBand(df: DataFrame): Map[String, Long] =
      df.groupBy("band").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactByBand = perBand(exactPairs)
    val hitByBand = perBand(hits)
    val nExact = exactByBand.values.sum
    val nHit = hitByBand.values.sum
    val strata = exactByBand.toSeq.sortBy(_._1).map { case (bd, ex) =>
      val h = hitByBand.getOrElse(bd, 0L)
      f""""$bd":{"recall":${h.toDouble / ex}%.4f,"exact_pairs":$ex}"""
    }
    graft.engine.ManagedCache.unpersistAll()

    // PLANTED-pair recall at the shipped defaults (32/8): every vector
    // gets a deterministic perturbed copy at cosine >= 0.999
    // (Similarity.perturbedCopy — the q37 gate corpus), and recall is
    // measured against the exact all-pairs cos >= 0.9 set. This is the
    // population the near-dup operator exists to find; the borderline
    // strata above measure the angle-dependent tail, not the operator's
    // fitness (RECALL_r10's 0.45 "pair recall" was 99.9% borderline
    // pairs in [0.3, 0.5) by construction of the fixture corpus).
    val planted = e.unionByName(
      Similarity.perturbedCopy(e, "vec_id", "embedding", idShift = 100000L))
    val pa = planted.select(col("vec_id").as("id_a"), col("embedding").as("__va"))
    val pb = planted.select(col("vec_id").as("id_b"), col("embedding").as("__vb"))
    val plantedExact = pa.join(pb, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(Similarity.cosine(col("__va"), col("__vb")), 6).as("cos"))
      .where(col("cos") >= 0.9)
      .select("id_a", "id_b")
      .localCheckpoint(true)
    val plantedApprox = Similarity.embeddingNearDups(planted, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b")
    val nPlanted = plantedExact.count()
    val nPlantedHit = plantedApprox.join(plantedExact, Seq("id_a", "id_b"), "inner").count()
    graft.engine.ManagedCache.unpersistAll()

    val json =
      f"""{"sf":"$sfDir","k":$k,"queries":${exactTopk.size},
         |"q107_quant_topk":{"recall_at_k":$int8Recall%.4f},
         |"q23_ann_topk":[${annSweep.mkString(",")}],
         |"q45_ivf_topk":[${ivfSweep.mkString(",")}],
         |"q37_embed_neardup":{"threshold":$threshold,"planes":32,"bands":8,
         |"pair_recall":${if (nExact == 0) 1.0 else f"${nHit.toDouble / nExact}%.4f"},
         |"by_cosine_band":{${strata.mkString(",")}},
         |"planted":{"threshold":0.9,"exact_pairs":$nPlanted,
         |"pair_recall":${if (nPlanted == 0) 1.0 else f"${nPlantedHit.toDouble / nPlanted}%.4f"}}}}""".stripMargin.replace("\n", "")
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
