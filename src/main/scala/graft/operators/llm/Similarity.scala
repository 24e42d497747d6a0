package graft.operators.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search over `array<float>` columns: exact cosine
  * top-k as the verifiable baseline, and a random-hyperplane LSH
  * (SimHash-for-vectors) bucketed variant as the scale path.
  *
  * Scale design:
  *   - the query set is broadcast (small side), the corpus is scanned
  *     exactly once — no shuffle of corpus vectors for the score pass;
  *   - top-k uses local-then-global selection ([[topKPerKey]]): each
  *     partition first reduces to its own top-k, so only k rows per
  *     (query x partition) reach the final per-query selection instead of
  *     the whole corpus;
  *   - the ANN variant buckets both sides by LSH signature and scores
  *     only within buckets — candidate volume is controlled by the number
  *     of hyperplanes, not corpus size squared.
  *
  * All arithmetic is Catalyst higher-order functions (zip_with/aggregate)
  * in whole-stage codegen — no UDFs.
  */
object Similarity {

  /** Dot product of two float-array columns, accumulated in double in
    * index order (matches a sequential SQL-oracle fold exactly). Native
    * compiled loop (graft.functions) — the zip_with/aggregate HOF form
    * below interprets per element and is kept as the reference.
    */
  def dot(a: Column, b: Column): Column = graft.functions.exprs.dotProduct(a, b)

  /** Built-in-composition reference form of [[dot]]. */
  def dotBuiltin(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn > 0, d / nn)
  }

  /** Per-key top-k without shuffling whole groups: local top-k inside
    * each map partition (window over key + partition id), THEN the global
    * per-key top-k over the survivors. Result is deterministic for any
    * input partitioning: a global top-k row is necessarily in its
    * partition's local top-k.
    */
  def topKPerKey(keys: Seq[Column], order: Seq[Column], k: Int): DataFrame => DataFrame =
    df => {
      val local = Window.partitionBy((keys :+ spark_partition_id()): _*).orderBy(order: _*)
      val global = Window.partitionBy(keys: _*).orderBy(order: _*)
      df.withColumn("__lrn", row_number().over(local)).where(col("__lrn") <= k)
        .withColumn("rank", row_number().over(global)).where(col("rank") <= k)
        .drop("__lrn")
    }

  /** Exact brute-force cosine top-k: for each query vector, the k most
    * similar corpus vectors (self excluded). Ranking is by cosine rounded
    * to 6 decimals (descending) with ascending-id tie-break, so the
    * ordering is reproducible bit-for-bit against a SQL oracle computing
    * the same double fold.
    */
  def cosineTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("__qv"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("__cv"))
    c.join(broadcast(q), col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), round(cosine(col("__qv"), col("__cv")), 6).as("cos"))
      .transform(topKPerKey(Seq(col("qid")), Seq(col("cos").desc, col("nid").asc), k))
  }

  /** Per-vector int8 quantization scale: max|x| / 127, so components map
    * into [-127, 127]. Double fold in index order — oracle-reproducible.
    */
  def int8Scale(vec: Column): Column =
    aggregate(vec, lit(0.0), (m, x) => greatest(m, abs(x.cast("double")))) / lit(127.0)

  /** Int8-quantize a float vector: round(x / scale) per component (the
    * all-zero vector quantizes to zeros). 4x smaller than float32 at
    * rest and on the wire — at 100 TB of embeddings the quantized corpus
    * is what should shuffle/broadcast; ranking quality is asserted
    * against the exact path in SimilaritySpec and hash-pinned by q107.
    * Native one-pass compiled loop; [[int8QuantizeBuiltin]] is the
    * bit-identical HOF reference form (asserted in EngineProps).
    */
  def int8Quantize(vec: Column): Column = graft.functions.exprs.int8Quantize(vec)

  /** Built-in-composition reference form of [[int8Quantize]]. */
  def int8QuantizeBuiltin(vec: Column, scale: Column): Column =
    when(scale > lit(0.0),
      transform(vec, x => round(x.cast("double") / scale).cast("int")))
      .otherwise(transform(vec, _ => lit(0)))

  /** Integer dot product (exact, overflow-safe: 64 dims x 127^2 << 2^63).
    * Native compiled loop; [[intDotBuiltin]] is the reference fold.
    */
  def intDot(a: Column, b: Column): Column = graft.functions.exprs.intDot(a, b)

  /** Built-in-composition reference form of [[intDot]]. */
  def intDotBuiltin(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x * y).cast("long")), lit(0L), (acc, v) => acc + v)

  /** Cosine top-k over int8-QUANTIZED vectors: the quantization scales
    * cancel in the cosine, so the score is integer dot products plus one
    * double division — bit-reproducible against a SQL oracle doing the
    * same integer arithmetic (unlike float dot folds, no accumulation-
    * order sensitivity at all). Brute force like [[cosineTopK]]:
    * broadcast queries, local-then-global top-k.
    */
  def quantizedCosineTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    def prep(df: DataFrame, id: String, qv: String, nrm: String) =
      df.select(
          col(idCol).as(id),
          int8Quantize(col(vecCol)).as(qv))
        .withColumn(nrm, sqrt(intDot(col(qv), col(qv)).cast("double")))
    val q = prep(queries, "qid", "__qa", "__qn")
    val c = prep(corpus, "nid", "__ca", "__cn")
    c.join(broadcast(q), col("qid") =!= col("nid"))
      .select(
        col("qid"),
        col("nid"),
        round(
          when(col("__qn") * col("__cn") > 0,
            intDot(col("__qa"), col("__ca")).cast("double") / (col("__qn") * col("__cn"))),
          6).as("qcos"))
      .transform(topKPerKey(Seq(col("qid")), Seq(col("qcos").desc, col("nid").asc), k))
  }

  /** Deterministic pseudo-random hyperplane weight for (plane, dim):
    * xxhash64 scaled into [-1, 1]. No RNG state — reproducible anywhere.
    */
  private def planeWeight(plane: Column, dim: Column): Column =
    xxhash64(plane, dim).cast("double") / lit(Long.MaxValue.toDouble)

  /** Random-hyperplane LSH signature: one sign bit per plane (as an
    * int array, ready for band hashing). Vectors with small angle agree
    * on most bits. Native compiled loop; the HOF reference form below is
    * bit-identical (same weight formula) — asserted in SimilaritySpec.
    */
  def hyperplaneBits(vec: Column, planes: Int = 16): Column =
    graft.functions.exprs.hyperplaneBits(vec, planes)

  /** Built-in-composition reference form of [[hyperplaneBits]]. */
  def hyperplaneBitsBuiltin(vec: Column, planes: Int = 16): Column =
    transform(
      sequence(lit(0), lit(planes - 1)),
      p => {
        val proj = aggregate(
          zip_with(
            vec,
            sequence(lit(0), size(vec) - 1),
            (v, d) => v.cast("double") * planeWeight(p, d)),
          lit(0.0),
          (s, x) => s + x)
        when(proj > 0, 1).otherwise(0)
      })

  /** Approximate cosine top-k: candidates are corpus vectors sharing at
    * least one band of the hyperplane signature with the query (banded,
    * like MinHash-LSH), scored exactly within buckets. Recall < 1 by
    * construction; measure it against [[cosineTopK]] before relying on it.
    */
  def annTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      planes: Int = 16,
      bands: Int = 4): DataFrame = {
    require(planes % bands == 0, "planes must divide evenly into bands")
    val bitsPerBand = planes / bands

    def banded(df: DataFrame, id: String, vec: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(vec),
          hyperplaneBits(col(vecCol), planes).as("__sig"))
        .select(col(id), col(vec),
          posexplode(Dedup.bandHashes(col("__sig"), bands, bitsPerBand))
            .as(Seq("__band", "__bh")))

    val qb = banded(queries, "qid", "__qv")
    val cb = banded(corpus, "nid", "__cv")
    // verify-in-join (the q37/q46 pattern): the cosine is scored INSIDE
    // the band join's output stage, so the candidate dedup exchanges
    // (qid, nid, cos) — never the two embedding arrays. A pair sharing
    // several bands costs a few redundant dot products in-stage; nothing
    // against shuffling full vectors through the distinct.
    cb.join(broadcast(qb),
        col("qid") =!= col("nid") &&
          cb("__band") === qb("__band") && cb("__bh") === qb("__bh"))
      .select(col("qid"), col("nid"), round(cosine(col("__qv"), col("__cv")), 6).as("cos"))
      .distinct()
      .transform(topKPerKey(Seq(col("qid")), Seq(col("cos").desc, col("nid").asc), k))
  }

  /** IVF-style approximate top-k: the complementary ANN scale path to
    * [[annTopK]]'s hyperplane LSH. A deterministic sample of the corpus
    * serves as the centroid codebook (hash-sampled — no training step,
    * no RNG); every corpus vector is assigned to its nearest centroid
    * (one broadcast pass), and each query probes only its `nprobe`
    * closest cells, scoring exactly within them.
    *
    * Scale shape: codebook is broadcast twice (assignment + probe);
    * the corpus shuffles ONCE by cell id; per-query work is
    * `nprobe/centroids` of the corpus. Recall rises with nprobe
    * (= exact when nprobe >= centroids).
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      centroids: Int = 16,
      nprobe: Int = 4,
      seed: Long = 0L): DataFrame = {
    require(nprobe >= 1 && centroids >= 1, "need nprobe >= 1 and centroids >= 1")
    // codebook: bottom-k hash sample of the corpus (deterministic).
    // Collected to the driver once — it is <= `centroids` rows of
    // metadata-scale, and leaving it lazy would re-run the corpus scan
    // for EACH of the two broadcast joins below.
    val spark = corpus.sparkSession
    val cbPlan = corpus
      .select(col(idCol).as("__cell"), col(vecCol).as("__cv0"))
      .orderBy(Sampling.hashUnit(col("__cell"), seed).asc)
      .limit(centroids)
    val codebook = spark.createDataFrame(
      java.util.Arrays.asList(cbPlan.collect(): _*), cbPlan.schema)

    def nearestCells(df: DataFrame, id: String, vec: String, n: Int): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(vec))
        .join(broadcast(codebook))
        .select(col(id), col(vec), col("__cell"),
          cosine(col(vec), col("__cv0")).as("__cc"))
        .transform(topKPerKey(Seq(col(id)), Seq(col("__cc").desc, col("__cell").asc), n))
        .drop("__cc", "rank")

    val assigned = nearestCells(corpus, "nid", "__cv", 1)
    val probes = nearestCells(queries, "qid", "__qv", nprobe)
    assigned.join(probes, Seq("__cell"))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), round(cosine(col("__qv"), col("__cv")), 6).as("cos"))
      .transform(topKPerKey(Seq(col("qid")), Seq(col("cos").desc, col("nid").asc), k))
  }

  /** Deterministic near-duplicate copy of an embedding table: each
    * vector is re-emitted under `idCol + idShift` with every component
    * scaled by `1 + ((id*31 + i) % 7 - 3)/100` (multipliers in
    * [0.97, 1.03], so cosine(original, copy) >= 0.999) and cast back to
    * float. Pure integer-mod + IEEE arithmetic — no RNG, reproducible
    * bit-for-bit by any engine (the q37 oracle re-derives it in SQL).
    * Used to PLANT a true near-dup population: fixtures' random vectors
    * have no high-cosine pairs, so recall of the near-dup operators is
    * unmeasurable on them without planting.
    */
  def perturbedCopy(df: DataFrame, idCol: String, vecCol: String, idShift: Long): DataFrame =
    df.select(
      col(idCol),
      // multiplier = (100 + k)/100 as ONE double division — both engines
      // perform the identical IEEE op sequence (a 1 + k*0.01 form would
      // tempt a DECIMAL literal on the SQL side and drift the last bits).
      // Perturb BEFORE shifting the id: in a single select, Spark's
      // lateral-column-alias resolution binds the lambda's idCol to the
      // RENAMED sibling (id+shift), silently changing the multipliers.
      transform(col(vecCol), (x, i) =>
        (x * ((lit(100) + (col(idCol) * 31 + i) % 7 - 3).cast("double") / lit(100.0)))
          .cast("float")).as(vecCol))
      .select((col(idCol) + idShift).as(idCol), col(vecCol))

  /** Embedding-cosine near-duplicate pairs: all (id_a < id_b) pairs with
    * cosine >= threshold — the vector-space face of near-dedup (catches
    * paraphrases MinHash's lexical shingles miss).
    *
    * Same LSH discipline as [[Dedup.nearDupPairs]]: hyperplane band
    * signatures, pair generation ONLY within buckets (self-equi-join on
    * band hash), exact cosine verification on candidates, and a
    * bucket-size cap so degenerate regions (e.g. a zero-vector pile-up)
    * can't go quadratic. Approximate by construction — a pair missing
    * every shared band is missed; recall is governed by planes/bands.
    *
    * Default 32 planes / 8 bands (4-bit bands): on a planted
    * true-near-dup population (cos >= 0.999 via [[perturbedCopy]]) the
    * per-pair miss probability is ~(1-0.965^4)^8 ~ 2e-12 — measured pair
    * recall 1.0 in RECALL_r11 — while borderline pairs (cos ~ 0.3, the
    * fixtures' background) recall ~0.5: LSH recall is a function of the
    * pair's ANGLE, and these defaults are sized for the population the
    * operator exists to find. The earlier 16/4 default measured 0.45
    * even on mid-band pairs (RECALL_r10) — too few bands to OR over.
    */
  def embeddingNearDups(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      planes: Int = 32,
      bands: Int = 8,
      maxBucketSize: Int = 10000): DataFrame = {
    require(planes % bands == 0, "planes must divide evenly into bands")
    // Exact-duplicate collapse first: web-scale corpora carry heavy
    // EXACT vector duplication (re-crawls, mirrors), and a clique of k
    // identical vectors shares every band — in-bucket candidate work
    // would grow with k^2 (measured quadratic on a replicated probe
    // corpus). The LSH pipeline therefore sees one REPRESENTATIVE per
    // distinct vector; member pairs are expanded back at the end, which
    // is output-sized work (those pairs ARE the answer) while candidate
    // generation stays duplication-independent.
    val grouped = graft.engine.ManagedCache.persist(
      df.select(col(idCol).as("__id"), col(vecCol).as("__v"))
        .groupBy("__v")
        .agg(min(col("__id")).as("__rep"), sort_array(collect_list(col("__id"))).as("__ids")))

    // intra-clique pairs: identical vectors are pairs by definition
    // (cosine computed by the same formula for output parity)
    val intra = grouped.where(size(col("__ids")) > 1)
      .select(
        round(cosine(col("__v"), col("__v")), 6).as("cos"),
        explode(
          flatten(transform(
            sequence(lit(0), size(col("__ids")) - 2),
            i => transform(
              slice(col("__ids"), i + 2, size(col("__ids"))),
              b => struct(element_at(col("__ids"), i + 1).as("id_a"), b.as("id_b"))))))
          .as("__p"))
      .select(col("__p.id_a"), col("__p.id_b"), col("cos"))
      .where(col("cos") >= threshold)

    // cross-clique pairs: the banded pipeline over representatives. The
    // vector+norm ride through the band explode so exact-cosine
    // verification runs INSIDE the band join's output stage (threshold
    // cuts non-pairs before any re-shuffle); persisted because it feeds
    // bucket sizing plus both self-join sides.
    val banded = graft.engine.ManagedCache.persist(
      grouped.select(
          col("__rep"), col("__ids"), col("__v"),
          norm(col("__v")).as("__nm"),
          hyperplaneBits(col("__v"), planes).as("__sig"))
        .select(
          col("__rep"),
          col("__ids"),
          col("__v"),
          col("__nm"),
          posexplode(Dedup.bandHashes(col("__sig"), bands, planes / bands))
            .as(Seq("__band", "__bh"))))
    val sized = banded
      .groupBy("__band", "__bh").agg(count(lit(1)).as("__n"))
      .where(col("__n") <= maxBucketSize)
      .select("__band", "__bh")
    val kept = banded.join(sized, Seq("__band", "__bh"))
    val cross = kept.as("a")
      .join(
        kept.as("b"),
        col("a.__band") === col("b.__band") && col("a.__bh") === col("b.__bh") &&
          col("a.__rep") < col("b.__rep"))
      .select(
        col("a.__ids").as("__as"),
        col("b.__ids").as("__bs"),
        round(
          when(col("a.__nm") * col("b.__nm") > 0,
            dot(col("a.__v"), col("b.__v")) / (col("a.__nm") * col("b.__nm"))),
          6).as("cos"))
      .where(col("cos") >= threshold)
      .distinct()
      // representative pair -> member pairs (output-sized expansion)
      .select(explode(col("__as")).as("__ia"), col("__bs"), col("cos"))
      .select(col("__ia"), explode(col("__bs")).as("__ib"), col("cos"))
      .select(
        least(col("__ia"), col("__ib")).as("id_a"),
        greatest(col("__ia"), col("__ib")).as("id_b"),
        col("cos"))

    intra.unionByName(cross)
  }

  /** Persisted EMBEDDING signature table — the vector-side form of
    * [[Dedup.signatures]] (the q113 shape): one narrow row per vector
    * holding the hyperplane band hashes (candidate generation) and the
    * int8-quantized vector (exact verification) — planes/64 longs plus
    * one int per dimension instead of the float corpus, which is never
    * re-sketched or re-read by later ingests. Plain long/int arrays, so
    * the table round-trips parquet with no engine-private state
    * (SimilaritySpec pins the round trip).
    *
    * Verification cosine runs on the QUANTIZED vectors — per-vector
    * quantization scales cancel in the cosine, so stored int8 is
    * sufficient and every run (full or incremental, today or a year
    * from now) scores a given pair IDENTICALLY: the equality law below
    * needs no float-drift margin.
    */
  def embeddingSignatures(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      planes: Int = 32,
      bands: Int = 8): DataFrame = {
    require(planes % bands == 0, "planes must divide evenly into bands")
    df.select(
      col(idCol).as("id"),
      int8Quantize(col(vecCol)).as("q"),
      Dedup.bandHashes(
        hyperplaneBits(col(vecCol), planes), bands, planes / bands).as("bands"))
  }

  /** Incremental embedding near-dup: all pairs (id_a < id_b,
    * quantized cosine >= `threshold`) that involve AT LEAST ONE vector
    * of `batchSigs`, against history ∪ batch — [[embeddingNearDups]]'s
    * daily-ingest form, mirroring [[Dedup.incrementalNearDupPairs]]:
    *
    *   1. band rows of the BATCH probe band rows of the whole signature
    *      table (equi-join on (band, bandhash) — the history side ships
    *      its band longs only, never vectors, and with the signature
    *      table bucketed on the band hash it needs no shuffle at all);
    *   2. the degenerate-bucket cap counts over the UNION (a boilerplate
    *      bucket is dropped by global size, not per-side size);
    *   3. exact cosine verification on candidates only, from the STORED
    *      quantized vectors — the float corpus is never touched.
    *
    * History-history pairs are excluded by construction (every
    * candidate touches a batch row): earlier runs already emitted them.
    * SimilaritySpec asserts the q113/q117 equality law — incremental
    * output == the full recompute restricted to batch-touching pairs.
    *
    * Both inputs must come from [[embeddingSignatures]] with the same
    * (planes, bands): signatures sketched under different parameters
    * are incomparable.
    */
  def incrementalEmbeddingNearDups(
      historySigs: DataFrame,
      batchSigs: DataFrame,
      threshold: Double,
      maxBucketSize: Int = 10000): DataFrame = {
    // a re-ingested id present on BOTH sides must not duplicate its
    // signature row (duplicate pairs, and cosine verified against the
    // stale vector): the batch row wins, history's is anti-joined out
    // (broadcast of batch ids — the history side never shuffles)
    val all = graft.engine.ManagedCache.persist(
      historySigs.select(col("id"), col("q"), col("bands"))
        .join(Dedup.broadcastIfModest(batchSigs.select(col("id"))), Seq("id"), "left_anti")
        .unionByName(batchSigs.select(col("id"), col("q"), col("bands"))))
    def explodeBands(sigs: DataFrame): DataFrame =
      sigs.select(col("id"), posexplode(col("bands")).as(Seq("__band", "__bh")))
    val allBanded = explodeBands(all)
    val sized = allBanded
      .groupBy("__band", "__bh").agg(count(lit(1)).as("__n"))
      .where(col("__n") <= maxBucketSize)
      .select("__band", "__bh")
    val candidates = explodeBands(batchSigs).as("a")
      .join(allBanded.join(sized, Seq("__band", "__bh")).as("b"),
        col("a.__band") === col("b.__band") && col("a.__bh") === col("b.__bh") &&
          col("a.id") =!= col("b.id"))
      .select(
        least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"))
      .distinct()
    def qn(c: Column): Column = sqrt(intDot(c, c).cast("double"))
    val qa = all.select(col("id").as("id_a"), col("q").as("__qa"))
    val qb = all.select(col("id").as("id_b"), col("q").as("__qb"))
    candidates
      .join(qa, "id_a")
      .join(qb, "id_b")
      .select(
        col("id_a"), col("id_b"),
        round(
          when(qn(col("__qa")) * qn(col("__qb")) > 0,
            intDot(col("__qa"), col("__qb")).cast("double") /
              (qn(col("__qa")) * qn(col("__qb")))),
          6).as("cos"))
      .where(col("cos") >= threshold)
  }
}
