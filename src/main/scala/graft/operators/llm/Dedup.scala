package graft.operators.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for LLM training-data pipelines: exact dedup by
  * normalized-content hash, and near-duplicate detection via MinHash +
  * banded LSH.
  *
  * Scale design (the 100 TB contract):
  *   - exact dedup is ONE hash-partitioned aggregate on a 256-bit content
  *     hash — partial+final HashAggregate, no row payload wider than the
  *     digest crosses the shuffle in the (id, dupes) form;
  *   - near-dup NEVER does all-pairs: MinHash signatures are computed in a
  *     single map pass (no shuffle), then pairs are generated only within
  *     LSH band-buckets (a self-equi-join on the band hash). Candidate
  *     volume is governed by the banding parameters, not O(n^2);
  *   - a bucket-size cap drops degenerate buckets (e.g. boilerplate that
  *     hashes a million docs into one bucket) before they can go
  *     quadratic — the standard web-dedup guard.
  *
  * Everything is Catalyst built-ins (higher-order array functions +
  * xxhash64) — whole-stage codegen'd, no UDFs.
  */
object Dedup {

  /** Broadcast `df` only when its plan-estimated size is comfortably
    * within executor/driver broadcast budgets; past the bound, drop the
    * hint and let the planner pick a shuffle strategy — a huge re-ingest
    * batch must degrade to a slower join, not fail the job at the
    * broadcast cap. (The estimate is the optimizer's own sizeInBytes —
    * file-size-derived for table scans; no extra job.)
    */
  private[llm] def broadcastIfModest(df: DataFrame): DataFrame =
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes <= (256L << 20))
      broadcast(df)
    else df

  /** Canonical text form shared with the DuckDB oracle: lower-case,
    * whitespace runs collapsed to single spaces, trimmed. Computed as
    * the native tokenizer's output re-joined — one byte scan instead of
    * two regex passes; `concat_ws(" ", [""])` = `""` keeps the blank-doc
    * form identical. Parity with [[normalizeBuiltin]] is covered by the
    * tokenizer property (join is separator-exact).
    */
  def normalize(text: Column): Column =
    concat_ws(" ", graft.functions.exprs.tokenize(text))

  /** Built-in-composition reference form of [[normalize]]. */
  def normalizeBuiltin(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Normalized whitespace tokens — the first step of nearly every text
    * operator, so it runs as ONE native byte-scan pass
    * (graft.functions.TokenizeExpr) instead of two regex passes plus a
    * split. Bit-identical to [[tokensBuiltin]] (property-asserted),
    * including the blank-doc `[""]` artifact the downstream counts rely
    * on.
    */
  def tokens(text: Column): Column = graft.functions.exprs.tokenize(text)

  /** Built-in-composition reference form of [[tokens]]. */
  def tokensBuiltin(text: Column): Column = split(normalize(text), " ")

  /** Distinct word n-gram shingles from an ALREADY-MATERIALIZED token
    * array column; empty array when the document has fewer than `n` words
    * (guarded — Spark's `sequence(1, 0)` would otherwise count DOWN).
    *
    * Pass an attribute (a real column), not a derived expression:
    * higher-order functions are CodegenFallback, so an expression subtree
    * referenced inside the lambda is RE-EVALUATED per array element —
    * `slice(split(regexp_replace(...)), i, n)` would re-run the regex for
    * every shingle position. [[shingles]] wraps this for the one-shot
    * convenience form.
    */
  def shinglesFromTokens(w: Column, n: Int): Column =
    when(
      size(w) >= n,
      array_distinct(
        transform(
          sequence(lit(1), size(w) - lit(n - 1)),
          i => concat_ws(" ", slice(w, i, lit(n))))))
      .otherwise(array().cast("array<string>"))

  /** One-shot convenience form of [[shinglesFromTokens]] over raw text.
    * Fine for tests and single-use expressions; inside multi-stage
    * pipelines materialize the token array first (see [[nearDupPairs]]).
    */
  def shingles(text: Column, n: Int = 3): Column =
    shinglesFromTokens(tokens(text), n)

  /** Exact-duplicate groups: one row per distinct normalized text, with
    * the smallest id as the canonical survivor and the duplicate count.
    * The only shuffled payload is (digest, id, count).
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(sha2(normalize(col(textCol)), 256).as("__digest"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dupes"))
      .drop("__digest")

  /** Exact dedup keeping the survivor's FULL row (smallest id wins).
    * min_by is a declarative aggregate — partial+final, map-side reduced.
    */
  def exactRows(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val payload = struct(df.columns.map(col).toIndexedSeq: _*)
    df.groupBy(sha2(normalize(col(textCol)), 256).as("__digest"))
      .agg(min_by(payload, col(idCol)).as("__row"))
      .select("__row.*")
  }

  /** MinHash signature: `numHashes` independent min-over-shingles of
    * seeded xxhash64. Null entries when the shingle set is empty (such
    * docs can't near-dup match and fall out of the band join).
    */
  def minhash(shingleCol: Column, numHashes: Int = 32): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingleCol, s => xxhash64(i, s))))

  /** Band hashes over a MinHash signature: `bands` buckets of
    * `rowsPerBand` signature entries each, hashed to one long per band.
    */
  def bandHashes(sigCol: Column, bands: Int, rowsPerBand: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => xxhash64(b, slice(sigCol, b * lit(rowsPerBand) + lit(1), lit(rowsPerBand))))

  /** Near-duplicate pairs via MinHash-LSH candidate generation + exact
    * Jaccard verification on candidates only.
    *
    * Returns (id_a, id_b, inter, uni) for candidate pairs whose exact
    * shingle-set Jaccard `inter/uni >= threshold`, id_a < id_b. Sizes are
    * integers so the result hash-compares exactly against a SQL oracle.
    *
    * @param maxBucketSize LSH buckets larger than this are discarded
    *   before pair generation (quadratic-blowup guard for degenerate
    *   content at scale).
    */
  def nearDupPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5,
      maxBucketSize: Int = 10000): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide evenly into bands")
    val rowsPerBand = numHashes / bands

    // The whole sketch path is native codegen expressions
    // (graft.functions): shingles are identified by 64-bit chain hashes
    // (never materialized as strings), MinHash minima and band hashes are
    // tight compiled loops. The earlier pure-HOF composition (kept as
    // minhash/bandHashes for reference) interpreted ~k*|shingles| lambda
    // steps per row — measured 5-20x slower.
    //
    // The shingle-hash table is used three times (band generation + both
    // sides of the verification join); persisting it is the local form of
    // writing the signature table out once at cluster scale. Routed
    // through ManagedCache so session owners can reclaim it
    // (ManagedCache.unpersistAll) — the handle is otherwise unreachable.
    val withSets = graft.engine.ManagedCache.persist(
      df.select(col(idCol).as("__id"), tokens(col(textCol)).as("__w"))
        .select(
          col("__id"),
          graft.functions.exprs.shingleHashes(col("__w"), shingleSize).as("__sh"))
        .where(size(col("__sh")) > 0))

    val banded = withSets
      .select(col("__id"), graft.functions.exprs.minhashSig(col("__sh"), numHashes).as("__sig"))
      .select(
        col("__id"),
        posexplode(graft.functions.exprs.bandHashes(col("__sig"), bands))
          .as(Seq("__band", "__bh")))

    // Quadratic-blowup guard: drop buckets above the cap. The count join
    // is co-partitioned with the pair join (same keys), so AQE keeps it
    // on one exchange of `banded`.
    val sized = banded
      .groupBy("__band", "__bh").agg(count(lit(1)).as("__n"))
      .where(col("__n") <= maxBucketSize)
      .select("__band", "__bh")
    val kept = banded.join(sized, Seq("__band", "__bh"))

    val candidates = kept.as("a")
      .join(
        kept.as("b"),
        col("a.__band") === col("b.__band") && col("a.__bh") === col("b.__bh") &&
          col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct()

    // Exact verification only on candidates: join shingle sets back in.
    val sa = withSets.select(col("__id").as("id_a"), col("__sh").as("__sa"))
    val sb = withSets.select(col("__id").as("id_b"), col("__sh").as("__sb"))
    candidates
      .join(sa, "id_a")
      .join(sb, "id_b")
      .select(
        col("id_a"),
        col("id_b"),
        size(array_intersect(col("__sa"), col("__sb"))).as("inter"),
        size(array_union(col("__sa"), col("__sb"))).as("uni"))
      .where(col("inter") >= col("uni") * threshold)
  }

  /** Per-doc signature row for the PERSISTED signature-table pattern:
    * `(id, sh, bands)` — the shingle-hash set (for exact verification)
    * and the LSH band hashes (for candidate generation), both arrays of
    * longs. This is what an ingest job computes ONCE per batch and
    * appends to the signature table; raw text never needs to be touched
    * again for dedup. ~(numHashes/bands + |shingles|) longs per doc —
    * orders of magnitude narrower than the text. Plain long arrays, so
    * the table round-trips parquet with no engine-private state
    * (DedupSpec asserts the round trip).
    *
    * Docs with an empty shingle set are dropped (they cannot near-dup
    * match — same rule as [[nearDupPairs]]).
    */
  /** One (id, band index, band hash) row per stored band of a
    * [[signatures]] table — the LSH bucket key both incremental sides
    * join on.
    */
  private def explodeStoredBands(sigs: DataFrame): DataFrame =
    sigs.select(col("id"), posexplode(col("bands")).as(Seq("__band", "__bh")))

  def signatures(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide evenly into bands")
    df.select(col(idCol).as("id"), tokens(col(textCol)).as("__w"))
      .select(
        col("id"),
        graft.functions.exprs.shingleHashes(col("__w"), shingleSize).as("sh"))
      .where(size(col("sh")) > 0)
      .select(
        col("id"), col("sh"),
        graft.functions.exprs.bandHashes(
          graft.functions.exprs.minhashSig(col("sh"), numHashes), bands).as("bands"))
  }

  /** Incremental near-dup: all pairs (id_a < id_b, exact Jaccard >=
    * `threshold`) that involve AT LEAST ONE document of `batchSigs`,
    * against the union of `historySigs` and `batchSigs` — the daily-
    * ingest form of [[nearDupPairs]].
    *
    * The 100 TB contract this exists for: re-running the batch dedup
    * over (history + today) re-sketches and re-shuffles the entire
    * corpus every day. With a persisted signature table ([[signatures]])
    * the history side is NEVER re-scanned or re-sketched — each ingest
    * appends the new batch's signatures, and the per-batch query is:
    *   1. band rows of the BATCH joined against band rows of the whole
    *     signature table (an equi-join keyed on (band, bandhash); the
    *     history side ships only its band longs, and with the signature
    *     table bucketed/partitioned on the band hash the history side
    *     needs no shuffle at all);
    *   2. the same degenerate-bucket cap as the batch path, counted over
    *     the union (so a boilerplate bucket is dropped by GLOBAL size,
    *     not per-side size);
    *   3. exact Jaccard verification on candidates only, via the STORED
    *     shingle-hash sets — no text access.
    * History-history pairs are excluded by construction (both sides of
    * the candidate join must touch a batch row), which is also the
    * correctness statement: those pairs were already emitted by earlier
    * runs. DedupSpec asserts the equivalence: incremental output ==
    * full-recompute output restricted to pairs touching the batch.
    *
    * Both inputs must come from [[signatures]] with the same parameters
    * (shingleSize/numHashes/bands — signatures sketched under different
    * parameters are incomparable; at cluster scale the parameters are
    * part of the signature table's schema contract).
    */
  def incrementalNearDupPairs(
      historySigs: DataFrame,
      batchSigs: DataFrame,
      threshold: Double = 0.5,
      maxBucketSize: Int = 10000): DataFrame = {
    // a re-ingested id present on BOTH sides must not duplicate its
    // signature row (duplicate pairs, verification against the stale
    // sketch): the batch row wins, history's is anti-joined out
    // (broadcast of batch ids — the history side never shuffles)
    val all = graft.engine.ManagedCache.persist(
      historySigs.select(col("id"), col("sh"), col("bands"))
        .join(Dedup.broadcastIfModest(batchSigs.select(col("id"))), Seq("id"), "left_anti")
        .unionByName(batchSigs.select(col("id"), col("sh"), col("bands"))))

    val allBanded = explodeStoredBands(all)
    // Global bucket cap: sizes counted over history+batch, so a
    // degenerate bucket is dropped even when each side alone is small.
    val sized = allBanded
      .groupBy("__band", "__bh").agg(count(lit(1)).as("__n"))
      .where(col("__n") <= maxBucketSize)
      .select("__band", "__bh")

    // Batch side probes the (capped) full table. Canonical (least,
    // greatest) ordering + distinct collapses the two directions a
    // batch-batch pair generates and dedups multi-band collisions.
    val candidates = explodeStoredBands(batchSigs).as("a")
      .join(allBanded.join(sized, Seq("__band", "__bh")).as("b"),
        col("a.__band") === col("b.__band") && col("a.__bh") === col("b.__bh") &&
          col("a.id") =!= col("b.id"))
      .select(
        least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"))
      .distinct()

    val sa = all.select(col("id").as("id_a"), col("sh").as("__sa"))
    val sb = all.select(col("id").as("id_b"), col("sh").as("__sb"))
    candidates
      .join(sa, "id_a")
      .join(sb, "id_b")
      .select(
        col("id_a"),
        col("id_b"),
        size(array_intersect(col("__sa"), col("__sb"))).as("inter"),
        size(array_union(col("__sa"), col("__sb"))).as("uni"))
      .where(col("inter") >= col("uni") * threshold)
  }

  /** EXACT n-gram-Jaccard similarity self-join via prefix filtering
    * (the PPJoin/AllPairs family) — the deterministic, zero-recall-loss
    * counterpart of [[nearDupPairs]]. MinHash banding trades a tunable
    * miss probability for bucket locality; prefix filtering is COMPLETE:
    * every pair with Jaccard >= `threshold` is guaranteed to collide on
    * a blocking key, so the output is the exact similarity join (which is
    * why the driver can hash-compare it against an all-pairs SQL oracle,
    * with no planted-pair margin argument needed).
    *
    * Blocking law: order all shingles by ascending document frequency
    * (rarest first; frequency computed from the corpus itself, ties by
    * hash value — a deterministic global total order). A pair with
    * |x∩y| >= α must collide within the first |x|-α+1 / |y|-α+1 ordered
    * shingles of each side (prefix-filtering principle: if the prefixes
    * were disjoint, all common shingles would sit in the suffixes, which
    * hold only α-1 slots). Jaccard >= t implies overlap >= ceil(t·|x|)
    * on each side, so each doc blocks on its first |S| - ceil(t·|S|) + 1
    * rarest shingles (the ceil is computed with a 1e-9 slack SUBTRACTED
    * so double rounding can only lengthen the prefix, never break
    * completeness).
    *
    * Scale shape: document frequency is one hash-agg over exploded
    * shingles; the rarest-first rank is a per-doc window (partitioned by
    * doc — no global sort); candidate volume is governed by the rarity
    * of prefix shingles (buckets are df-small BY CONSTRUCTION — the
    * reason prefix filtering needs no maxBucketSize cap), and exact
    * Jaccard verifies inside the candidate join. At 100 TB the df table
    * is a second pass over the corpus — the classic index-then-join
    * trade every exact similarity join pays; when a miss probability of
    * 1e-8 is acceptable, [[nearDupPairs]] is the single-pass choice.
    *
    * Returns (id_a, id_b, inter, uni), id_a < id_b, Jaccard >= threshold.
    */
  def jaccardJoinExact(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      threshold: Double = 0.6): DataFrame = {
    import org.apache.spark.sql.expressions.Window

    val sets = graft.engine.ManagedCache.persist(
      df.select(col(idCol).as("__id"), tokens(col(textCol)).as("__w"))
        .select(
          col("__id"),
          graft.functions.exprs.shingleHashes(col("__w"), shingleSize).as("__sh"))
        .where(size(col("__sh")) > 0))

    val exploded = sets.select(col("__id"), size(col("__sh")).as("__sz"),
      explode(col("__sh")).as("__tok"))
    val dfreq = exploded.groupBy("__tok").agg(count(lit(1)).as("__df"))

    // Rarest-first rank within each doc; block on the prefix only.
    val prefixLen = col("__sz") - ceil(col("__sz") * threshold - lit(1e-9)) + lit(1)
    // the prefix index feeds BOTH sides of the self-join below — without
    // persisting it, the explode -> dfreq-join -> per-doc rank window
    // subtree executes twice in one query (the plan showed two Window
    // operators). Materializing it once is PPJoin's "build the prefix
    // index" step; at cluster scale this is the index you would write out.
    val prefix = graft.engine.ManagedCache.persist(exploded
      .join(dfreq, "__tok")
      .withColumn("__rank",
        row_number().over(
          Window.partitionBy("__id").orderBy(col("__df"), col("__tok"))))
      .where(col("__rank") <= prefixLen)
      .select("__id", "__tok"))

    val candidates = prefix.as("a")
      .join(prefix.as("b"),
        col("a.__tok") === col("b.__tok") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct()

    val sa = sets.select(col("__id").as("id_a"), col("__sh").as("__sa"))
    val sb = sets.select(col("__id").as("id_b"), col("__sh").as("__sb"))
    candidates
      .join(sa, "id_a")
      .join(sb, "id_b")
      .select(
        col("id_a"),
        col("id_b"),
        size(array_intersect(col("__sa"), col("__sb"))).as("inter"),
        size(array_union(col("__sa"), col("__sb"))).as("uni"))
      .where(col("inter") >= col("uni") * threshold)
  }

  /** Fuzzy (n-gram) decontamination: drop every corpus document whose
    * shingle-set Jaccard with ANY blocklist document reaches `threshold`
    * — the near-dup face of exact-digest decontamination (q53). Real
    * eval-leak guards are n-gram-overlap based: a contaminated document
    * that differs from the benchmark text by a few tokens sails through
    * an exact-hash anti-join but not through this.
    *
    * Scale shape mirrors q53's broadcast discipline: the blocklist is
    * the SMALL side — its banded MinHash sketch AND its shingle sets
    * broadcast, the corpus is scanned map-side (band explode + in-join
    * Jaccard verification, no corpus shuffle), and only the matched
    * LOSER ids (tiny) reach the final anti-join. Candidate recall
    * follows the same LSH band law as [[nearDupPairs]] (identical
    * sketch parameters).
    */
  def fuzzyDecontaminate(
      corpus: DataFrame,
      blocklist: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide evenly into bands")
    def sets(df: DataFrame, id: String, sh: String) =
      df.select(col(idCol).as(id), tokens(col(textCol)).as("__w"))
        .select(col(id),
          graft.functions.exprs.shingleHashes(col("__w"), shingleSize).as(sh))
        .where(size(col(sh)) > 0)
    def bandedOf(df: DataFrame, id: String, sh: String, band: String, bh: String) =
      df.select(col(id), col(sh),
          graft.functions.exprs.minhashSig(col(sh), numHashes).as("__sig"))
        .select(col(id), col(sh),
          posexplode(graft.functions.exprs.bandHashes(col("__sig"), bands))
            .as(Seq(band, bh)))

    val cb = bandedOf(sets(corpus, "__cid", "__csh"), "__cid", "__csh", "__cband", "__cbh")
    val bb = bandedOf(sets(blocklist, "__bid", "__bsh"), "__bid", "__bsh", "__bband", "__bbh")
    val losers = cb
      .join(broadcast(bb),
        col("__cband") === col("__bband") && col("__cbh") === col("__bbh"))
      .where(size(array_intersect(col("__csh"), col("__bsh")))
        >= size(array_union(col("__csh"), col("__bsh"))) * threshold)
      .select(col("__cid"))
      .distinct()
    corpus.join(losers, corpus(idCol) === col("__cid"), "left_anti")
  }

  /** SimHash near-duplicate pairs: the third dedup family (exact,
    * MinHash-Jaccard, SimHash-Hamming). One 64-bit fingerprint per doc,
    * computed over the doc's SHINGLE-HASH set in the scan stage —
    * shingles, not unigram tokens: same-domain documents share most of
    * their vocabulary, which leaves every unigram-bag SimHash nearly
    * parallel (measured: background pairs down to Hamming 0-7 on the
    * fixtures), while shingle sets track Jaccard and keep unrelated docs
    * near Hamming 32. Candidates are generated ONLY among docs sharing at
    * least one of `bands` bit-slices of the fingerprint (a self-equi-join
    * on the slice value), then exact Hamming verification on candidates.
    *
    * Pigeonhole guarantee: with per-band probe radius `probeHamming` = r,
    * a pair at Hamming distance d <= bands*(r+1) - 1 must have SOME band
    * with <= r differing bits (else total >= bands*(r+1) > d), and that
    * band's probe set covers it — recall is 1.0 there. r = 0 is plain
    * banding (guaranteed radius bands-1); r = 1 emits the slice value
    * plus its one-bit flips on ONE side of the self-join (1 + 64/bands
    * variants), doubling the guaranteed radius per band count WITHOUT
    * narrowing slices — the scale-relevant trade, since bucket
    * population grows as n / 2^(64/bands): 16 four-bit bands would make
    * buckets n/16 (quadratic candidate growth, and `maxBucketSize`
    * would start DROPPING buckets — recall collapse — exactly when the
    * corpus grows), while 8 eight-bit bands with r=1 hold the same
    * radius-15 guarantee at n/256 buckets. `maxBucketSize` still guards
    * degenerate pile-ups (e.g. empty docs all fingerprint to 0).
    *
    * Scale shape mirrors [[nearDupPairs]]: one map pass for signatures
    * (8 bytes/doc of state — 4-16x smaller than a MinHash signature),
    * band join, verification on candidates only. Returns
    * (id_a, id_b, hamming) with id_a < id_b.
    */
  def simhashNearDupPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 7,
      bands: Int = 8,
      shingleSize: Int = 3,
      maxBucketSize: Int = 10000,
      probeHamming: Int = 0): DataFrame = {
    require(bands >= 1 && 64 % bands == 0, s"bands must divide 64, got $bands")
    require(probeHamming >= 0 && probeHamming <= 1, "probeHamming must be 0 or 1")
    val bits = 64 / bands
    val mask = if (bits == 64) -1L else (1L << bits) - 1L

    // docs with no shingle (< shingleSize tokens) can't meaningfully
    // near-dup match — dropped, same universe rule as nearDupPairs
    val sigs = df
      .select(col(idCol).as("__id"), tokens(col(textCol)).as("__w"))
      .select(
        col("__id"),
        graft.functions.exprs.shingleHashes(col("__w"), shingleSize).as("__sh"))
      .where(size(col("__sh")) > 0)
      .select(
        col("__id"),
        graft.functions.exprs.simhashFromHashes(col("__sh")).as("__f"))

    val slices = (0 until bands).map { b =>
      shiftrightunsigned(col("__f"), b * bits).bitwiseAND(lit(mask))
    }
    // The 8-byte fingerprint rides along through the band explode, so
    // verification happens IN the band join's output stage — the Hamming
    // filter cuts candidate occurrences to true pairs before anything is
    // re-shuffled. (Contrast nearDupPairs, whose verification payload is
    // the whole shingle set: there candidates are deduped first and the
    // sets joined back. A pair sharing several bands costs a few extra
    // XOR+popcounts here — nothing against the distinct-shuffle saved.)
    // persisted: consumed three times (bucket sizing + both sides of the
    // self-join); without it the shingle+fingerprint scan re-runs each
    // time. ~24 bytes x bands per doc — the cluster-scale form writes the
    // fingerprint table once.
    val banded = graft.engine.ManagedCache.persist(
      sigs.select(
        col("__id"),
        col("__f"),
        posexplode(array(slices: _*)).as(Seq("__band", "__bh"))))

    val sized = banded
      .groupBy("__band", "__bh").agg(count(lit(1)).as("__n"))
      .where(col("__n") <= maxBucketSize)
      .select("__band", "__bh")
    val kept = banded.join(sized, Seq("__band", "__bh"))

    // multiprobe: ONE side of the self-join also emits each slice's
    // one-bit flips, so two docs whose slice differs by <= probeHamming
    // bits still meet in the equi-join — same hash-join shape, probe-side
    // fan-out of (1 + slice bits)
    val probed =
      if (probeHamming == 0) kept
      else kept.select(
        col("__id"), col("__f"), col("__band"),
        explode(array(col("__bh") +:
          (0 until bits).map(i => col("__bh").bitwiseXOR(lit(1L << i))): _*)).as("__bh"))

    probed.as("a")
      .join(
        kept.as("b"),
        col("a.__band") === col("b.__band") && col("a.__bh") === col("b.__bh") &&
          col("a.__id") < col("b.__id"))
      .select(
        col("a.__id").as("id_a"),
        col("b.__id").as("id_b"),
        Fingerprint.hamming64(col("a.__f"), col("b.__f")).cast("int").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Incremental connected-components maintenance: yesterday's label
    * table + today's new pairs → today's label table, WITHOUT re-running
    * CC over all historical pairs — the grouping half of the incremental
    * dedup chain ([[incrementalNearDupPairs]] finds the new pairs; this
    * folds them into the standing groups).
    *
    * The trick is standard: an existing component is connectivity-
    * equivalent to its STAR (every member linked to its label), so CC
    * over (star edges of the old labels) ∪ (new pairs) equals CC over
    * (all old pairs) ∪ (new pairs). The old-label side is label-table-
    * sized — #docs-in-groups rows, independent of how many historical
    * PAIRS produced them — and stars are depth-1, so min-label
    * propagation converges in rounds bounded by the NEW pairs' chain
    * depth, not history's. Labels stay canonical (component min id),
    * including when a new pair merges two old components. DedupSpec
    * asserts equivalence with the full recompute across a two-batch
    * split, including a batch-2 pair that bridges two batch-1 groups.
    */
  def incrementalGroups(
      oldLabels: DataFrame,
      newPairs: DataFrame,
      maxIter: Int = 20): DataFrame = {
    val starEdges = oldLabels
      .where(col("id") =!= col("group"))
      .select(col("id").as("id_a"), col("group").as("id_b"))
    nearDupGroups(
      starEdges.unionByName(newPairs.select(col("id_a"), col("id_b"))), maxIter)
  }

  /** Collapse near-dup PAIRS into duplicate GROUPS (connected components
    * of the pair graph): a doc that chains A≈B≈C belongs with both even
    * when A and C aren't directly similar. Iterative min-label
    * propagation — each round every node adopts the smallest label among
    * itself and its neighbors; converges in O(component diameter) rounds
    * (near-dup components are shallow in practice; `maxIter` bounds the
    * driver loop, and each round is one shuffle join). If a component is
    * deeper than `maxIter` hops, the operator ESCALATES to
    * [[alternatingStarGroups]] (large-star/small-star, O(log^2 n) rounds
    * on any shape) instead of returning half-collapsed groups — the
    * contract (pairs in, (id, group) out) is unconditional.
    *
    * Returns (id, group) where group = smallest id in the component.
    */
  def nearDupGroups(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = graft.engine.ManagedCache.persist(
      pairs
        .select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst"))))
    // labels are localCheckpoint'ed (eager) each round, not persisted:
    // an iterated lineage doubles per round (the label plan feeds both
    // the join and the convergence check), and persist caches data
    // without cutting the plan tree — 20 rounds would hand the analyzer
    // a 2^20-node plan. Checkpointing materializes AND truncates;
    // superseded rounds' blocks are reclaimed by the ContextCleaner.
    var labels = edges.select(col("src").as("id")).distinct().withColumn("group", col("id"))
      .localCheckpoint(true)
    val spark = pairs.sparkSession
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val prop = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src")).agg(min(col("group")).as("ngroup"))
      // the convergence count rides the checkpoint MATERIALIZATION as an
      // accumulator (one job per round, not materialize + re-scan): a
      // retried task can only over-count a nonzero round — a zero is
      // exact, because every row of a completed pass was examined — so
      // the worst failure mode is one redundant round, never a premature
      // stop. (Round 21 note: the flag-through-checkpoint form already
      // replaced a third per-round join; this removes the re-scan too.)
      val newGroup = least(col("group"), coalesce(col("ngroup"), col("group")))
      val planned = labels
        .join(prop, labels("id") === prop("src"), "left")
        .select(
          col("id"),
          newGroup.as("group"),
          (newGroup =!= col("group")).as("__ch"))
      val acc = spark.sparkContext.longAccumulator("nearDupGroupsChanged")
      val chIdx = planned.schema.fieldIndex("__ch")
      val ckpt = planned.queryExecution.toRdd.mapPartitions { it =>
        it.map { r =>
          if (!r.isNullAt(chIdx) && r.getBoolean(chIdx)) acc.add(1L)
          r.copy()
        }
      }.localCheckpoint()
      ckpt.count() // materialize eagerly; populates the accumulator
      changed = acc.value
      labels = org.apache.spark.sql.GraftColumnBridge
        .internalFrame(spark, ckpt, planned.schema)
        .drop("__ch")
      i += 1
    }
    // the edge cache is only needed during the loop
    edges.unpersist(blocking = false)
    if (changed > 0) {
      // a component deeper than maxIter hops: diameter-bound propagation
      // is the wrong algorithm — hand off to the logarithmic-round one
      org.slf4j.LoggerFactory.getLogger(getClass).info(
        s"nearDupGroups propagation still changing after maxIter=$maxIter rounds " +
          "(component diameter exceeds maxIter) — escalating to large-star/small-star")
      return alternatingStarGroups(pairs)
    }
    labels
  }

  /** Connected components by alternating large-star/small-star rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14): converges in O(log^2 n) rounds on ANY graph shape — long
    * paths, high-degree hubs — where min-label propagation needs
    * O(diameter) rounds. Each round is two grouped aggregates and a join,
    * all partial+final reduced; no step materializes a neighborhood list,
    * so a billion-edge skewed graph never concentrates in one task.
    *
    *   - large-star: every node connects its LARGER neighbors to the
    *     smallest member of its closed neighborhood;
    *   - small-star: every node connects its smaller neighbors and
    *     itself to its minimum neighbor.
    *
    * Fixpoint = every component is a star rooted at its minimum id.
    * Same contract as [[nearDupGroups]]: (id_a, id_b) pairs in,
    * (id, group = smallest id in component) out.
    */
  def alternatingStarGroups(pairs: DataFrame, maxRounds: Int = 30): DataFrame = {
    // canonical directed edge u -> v with u > v; self-loops dropped
    def canon(df: DataFrame): DataFrame = df.select(
        greatest(col("a"), col("b")).as("u"),
        least(col("a"), col("b")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()

    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("u").as("x"), col("v").as("y"))
        .unionAll(e.select(col("v").as("x"), col("u").as("y")))
      val m = sym.groupBy("x").agg(least(min(col("y")), col("x")).as("m"))
      canon(sym.where(col("y") > col("x"))
        .join(m, "x")
        .select(col("y").as("a"), col("m").as("b")))
    }

    def smallStar(e: DataFrame): DataFrame = {
      // all neighbors of u here are < u, so min(closed nbhd) = min(v)
      val m = e.groupBy("u").agg(min(col("v")).as("m"))
      canon(e.join(m, "u").select(col("v").as("a"), col("m").as("b"))
        .unionAll(m.select(col("u").as("a"), col("m").as("b"))))
    }

    // localCheckpoint (eager) rather than persist: each round references
    // its input several times, so an un-truncated iterated LINEAGE grows
    // exponentially (plan-tree blowup long before any data moves).
    // Checkpointing materializes AND cuts the plan; superseded rounds'
    // blocks are reclaimed by the ContextCleaner once unreferenced. On a
    // multi-node cluster a reliable checkpoint dir is the durable form.
    var edges = canon(pairs.select(col("id_a").as("a"), col("id_b").as("b")))
      .localCheckpoint(true)
    // convergence = edge set stable across a full round (count + content
    // checksum — one tiny aggregate over the candidate edge set;
    // bit_xor is order-independent and cannot overflow under ANSI mode)
    def signature(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var sig = signature(edges)
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      val nsig = signature(next)
      edges = next
      converged = nsig == sig
      sig = nsig
      round += 1
    }
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"alternatingStarGroups hit maxRounds=$maxRounds before the edge set " +
          "stabilized — component collapse may be incomplete")
    // at fixpoint every edge points member -> root (root = component min)
    edges.select(col("u").as("id"), col("v").as("group"))
      .unionByName(edges.select(col("v").as("id"), col("v").as("group")).distinct())
      .distinct()
  }

  /** Full near-dedup: keep one survivor (smallest id) per duplicate
    * group; docs in no group pass through untouched.
    */
  def dedupNearRows(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5): DataFrame = {
    val pairs = nearDupPairs(df, textCol, idCol, shingleSize, numHashes, bands, threshold)
    val losers = nearDupGroups(pairs)
      .where(col("id") =!= col("group"))
      .select(col("id").as("__loser"))
    df.join(losers, df(idCol) === col("__loser"), "left_anti")
  }
}
