package graft

import org.apache.spark.sql.functions._
import graft.engine.SparkEngine
import graft.operators.llm.{Dedup, Similarity}
import graft.sources.Sources

/** Manual scale probe (not part of the driver contract): replicates the
  * sf0.1 documents/embeddings fixtures N-fold with shifted ids and runs
  * the LSH operators, printing wall times — evidence that candidate
  * generation stays bucket-bounded (near-linear) rather than quadratic as
  * the corpus grows. Usage: runMain graft.ScaleProbe [factor]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(20)
    val spark = SparkEngine.session(master = "local[32]", appName = "graft-scale")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scale] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n rows)")
    }

    val d0 = Sources.table(spark, dir, "documents").select("doc_id", "text")
    val docs = (0 until factor)
      .map(i => d0.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        // perturb text per replica so replicas are near-dups, not exact:
        concat(col("text"), lit(s" replica$i")).as("text")))
      .reduce(_ unionByName _)
    println(s"[scale] corpus: ${factor}x documents")

    time("exact dedup")(Dedup.exact(docs, "text", "doc_id").count())
    time(s"near-dup pairs (MinHash-LSH)")(
      Dedup.nearDupPairs(docs, "text", "doc_id").count())
    time(s"near-dup pairs (exact Jaccard, prefix filter)")(
      Dedup.jaccardJoinExact(docs, "text", "doc_id", threshold = 0.6).count())
    time(s"near-dup pairs (SimHash-Hamming)")(
      Dedup.simhashNearDupPairs(docs, "text", "doc_id").count())
    time(s"near-dup pairs (SimHash multiprobe r=1, radius-15 guarantee)")(
      Dedup.simhashNearDupPairs(docs, "text", "doc_id",
        maxHamming = 12, bands = 8, probeHamming = 1).count())
    graft.engine.ManagedCache.unpersistAll()

    // Connected components at graph scale: chains of diameter 7 are the
    // propagation shape (rounds = diameter, each ONE shuffle join); a
    // single deep chain exercises the large-star/small-star escalation
    // (O(log^2 n) rounds regardless of diameter). Wall time should scale
    // with edges x rounds, never quadratically in nodes.
    val chains = factor * 10000
    val chainLen = 8
    val chainEdges = spark.range(chains.toLong * chainLen)
      .where(col("id") % chainLen =!= (chainLen - 1))
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    time(s"connected components (${chains} chains x $chainLen, diameter 7)") {
      val groups = Dedup.nearDupGroups(chainEdges)
      val n = groups.select("group").distinct().count()
      require(n == chains, s"expected $chains components, got $n")
      n
    }
    val deep = spark.range(2000L)
      .where(col("id") < 1999)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    time("connected components (ONE chain of 2000, escalates to star rounds)") {
      val groups = Dedup.nearDupGroups(deep, maxIter = 10)
      val n = groups.select("group").distinct().count()
      require(n == 1, s"expected 1 component, got $n")
      n
    }
    graft.engine.ManagedCache.unpersistAll()

    // sharded text sink vs the single-task golden form: same byte stream
    // (line-sorted in both paths), but the sort and the write spread
    // across the cluster — the S2 contract's scale path
    val kvOut = java.nio.file.Files.createTempDirectory("graft-scale-kv").toString
    val kv = docs.select(col("doc_id"), length(col("text")).as("len"))
    time("KV sink, sharded (32 range shards)") {
      graft.operators.KvTextSink.writeSharded(kv, s"$kvOut/sharded", shards = 32); 0L
    }
    time("KV sink, single-file (coalesce 1)") {
      graft.operators.KvTextSink.write(kv, s"$kvOut/single"); 0L
    }

    // AQE skew-join rewrite: the most common 100 TB failure mode is one
    // hot shuffle key serializing a join. A zipfian fact (70% of rows on
    // one key) joins a uniform dim; with the skew thresholds scaled to
    // probe volume (the RATIO mechanics are identical at cluster scale),
    // AQE must split the hot partition — visible as skew=true /
    // "skewed" in the executed plan — instead of one straggler task
    // sorting 70% of the fact. The manual salt (RangeJoin.SkewJoin)
    // remains the explicit-control alternative; this probe shows the
    // automatic path fires.
    val skewConfs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1m",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "512k",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val savedConfs = skewConfs.map { case (k, _) => k -> spark.conf.getOption(k) }
    skewConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.range(2000000L).select(
        when(col("id") % 10 < 7, 0L).otherwise(col("id") % 1000).as("k"),
        concat(lit("payload-payload-payload-payload-"), col("id")).as("payload"))
      val dim = spark.range(1000L).select(col("id").as("k"),
        concat(lit("dim-"), col("id")).as("dval"))
      def skewJoinRun(enabled: Boolean): (Double, String) = {
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", enabled.toString)
        // the aggregate keeps payload/dval alive so column pruning can't
        // shrink the skewed partition below the probe thresholds
        val df = fact.join(dim, "k")
          .agg(count(lit(1)).as("n"), sum(length(col("payload"))).as("pbytes"),
            count(col("dval")).as("nd"))
        val t0 = System.nanoTime()
        df.collect()
        ((System.nanoTime() - t0) / 1e9, df.queryExecution.executedPlan.toString)
      }
      val (tOff, _) = skewJoinRun(enabled = false)
      val (tOn, planOn) = skewJoinRun(enabled = true)
      val fired = planOn.contains("skew=true") || planOn.contains("skewed")
      println(f"[scale] AQE skew join (zipfian 70%% hot key, 2M rows): " +
        f"skewJoin=off $tOff%.1f s, skewJoin=on $tOn%.1f s, rewrite fired: $fired")
      if (!fired) println("[scale] WARNING: AQE skew rewrite did not fire at this volume")
    } finally {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      savedConfs.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    val e0 = Sources.table(spark, dir, "embeddings").select("vec_id", "embedding")
    val embs = (0 until factor)
      .map(i => e0.select((col("vec_id") + lit(i * 1000000L)).as("vec_id"), col("embedding")))
      .reduce(_ unionByName _)
    time("ANN top-5 for 100 queries (hyperplane LSH)")(
      Similarity.annTopK(embs, embs.where(col("vec_id") < 100), "vec_id", "embedding", 5).count())
    // threshold 0.8: replica cliques + genuinely near-parallel vectors.
    // (The q37 query uses 0.3 on the UNreplicated corpus; over N exact
    // replicas a loose threshold measures output size, not the operator.)
    time("embedding near-dup pairs (hyperplane LSH)")(
      Similarity.embeddingNearDups(embs, "vec_id", "embedding", threshold = 0.8).count())
    graft.engine.ManagedCache.unpersistAll()

    // LakeTable copy-on-write locality: MERGE cost must track the TOUCHED
    // slice, not the table. Build a table of factor x orders across 32
    // hash partitions, then merge (a) a batch confined to ONE partition
    // and (b) a same-sized batch spread across all 32. Both batches have
    // identical row counts; the narrow merge should rewrite ~1/32 of the
    // files and finish far faster — the 100 TB upsert story (corrections
    // cluster in recent partitions) in miniature.
    {
      import graft.operators.LakeTable
      val lakeRoot = java.nio.file.Files.createTempDirectory("graft-scale-lake").toString
      val o0 = Sources.table(spark, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val big = (0 until factor)
        .map(i => o0.select((col("o_orderkey") + lit(i * 100000000L)).as("o_orderkey"),
          col("o_custkey"), col("o_totalprice")))
        .reduce(_ unionByName _)
        .withColumn("pt", pmod(col("o_custkey"), lit(32)).cast("string"))
      time(s"lake init (${factor}x orders, 32 partitions)") {
        LakeTable.init(spark, s"$lakeRoot/t", big, "pt"); big.count()
      }
      val narrow = big.where(col("pt") === "7").limit(20000)
        .withColumn("o_totalprice", col("o_totalprice") + lit(1.0))
      val wide = big.limit(20000)
        .withColumn("o_totalprice", col("o_totalprice") + lit(1.0))
      time("lake merge, 20k updates confined to 1/32 partitions") {
        val s = LakeTable.merge(spark, s"$lakeRoot/t", narrow, Seq("o_orderkey"), "pt")
        println(s"[scale]   rewrote ${s.filesRewritten} files, carried ${s.filesCarried}")
        s.filesWritten
      }
      time("lake merge, 20k updates spread across all 32 partitions") {
        val s = LakeTable.merge(spark, s"$lakeRoot/t", wide, Seq("o_orderkey"), "pt")
        println(s"[scale]   rewrote ${s.filesRewritten} files, carried ${s.filesCarried}")
        s.filesWritten
      }
    }

    spark.stop()
  }
}
