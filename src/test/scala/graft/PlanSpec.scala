package graft

import graft.queries.{ExtQueries, LabQueries, LlmQueries, TpchQueries}

/** Physical-plan shape assertions — the properties that decide whether a
  * query survives a 100x scale-up, pinned so a refactor can't silently
  * regress them: column pruning and filter pushdown at the parquet scan,
  * partial (map-side) aggregation before every shuffle, broadcast joins
  * for small dimensions, whole-stage codegen in projection pipelines.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = (LabQueries.queries ++ LlmQueries.queries ++ ExtQueries.queries ++
      TpchQueries.queries)(name)(spark, sf)
    df.collect() // finalize AQE so the string shows the real executed plan
    df.queryExecution.executedPlan.toString
  }

  test("q03 groupmax: map-side partial max + pruned scan") {
    val p = plan("q03_groupmax")
    assert(p.contains("partial_max"), s"no partial aggregation in:\n$p")
    val readSchema = "ReadSchema: struct<(.*?)>".r.findFirstMatchIn(p).map(_.group(1))
    assert(readSchema.exists(cols =>
      cols.contains("l_returnflag") && cols.contains("l_extendedprice")
        && cols.split(",").length == 2),
      s"scan reads more than the two referenced columns: $readSchema")
  }

  test("q08 groupcount: partial count before the shuffle") {
    assert(plan("q08_groupcount").contains("partial_count"))
  }

  test("q09 listagg: small dimension table is broadcast, not shuffled") {
    assert(plan("q09_listagg").contains("BroadcastHashJoin"))
  }

  test("q11 argmax: max_by partial-aggregates map-side (not a window)") {
    val p = plan("q11_argmax")
    assert(p.contains("partial_max_by"), s"argmax lost its partial aggregation:\n$p")
  }

  test("entry(): filter is pushed down to the parquet scan") {
    val p = SparkEntry.entry(spark).queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,0.0)]"),
      s"filter not pushed to scan:\n$p")
  }

  test("q07 classify: projection runs inside whole-stage codegen") {
    val p = plan("q07_classify")
    assert(p.contains("WholeStageCodegen") || p.contains("*("),
      s"no codegen stage marker in:\n$p")
  }

  test("q26 multimodal: embeddings side is broadcast") {
    assert(plan("q26_multimodal").contains("BroadcastHashJoin"))
  }

  test("q20 exact dedup: one hash-partitioned aggregate, partial first") {
    val p = plan("q20_dedup_exact")
    assert(p.contains("partial_min") || p.contains("partial_first"),
      s"dedup shuffle is not map-side reduced:\n$p")
  }

  test("q38 range join: bucketed equi-join, never a nested-loop join") {
    val p = plan("q38_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join degenerated to a nested loop:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), s"no hash/merge equi-join found:\n$p")
  }

  test("q39 part join: dimension side broadcast, aggregate partial-reduced") {
    val p = plan("q39_part_revenue")
    assert(p.contains("BroadcastHashJoin"), s"part should broadcast:\n$p")
    assert(p.contains("partial_count"), s"no map-side partial aggregation:\n$p")
  }

  test("q31 rollup: one Expand + one aggregate shuffle for all grouping sets") {
    val p = plan("q31_rollup")
    assert(p.contains("Expand"), s"rollup should plan through Expand:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size
      <= 2 * 2, // initial + final AQE sections, one agg exchange each
      s"rollup must not shuffle once per grouping set:\n$p")
  }

  test("q33 window functions: both windows share a single exchange") {
    val p = plan("q33_window_rank")
    // rank + running sum over the same partitioning: one hash exchange
    // (x2 for AQE's initial+final printout), not one per window
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      s"windows did not share the exchange:\n$p")
  }

  test("q105 range frame: both frame aggs share one exchange, one Window") {
    val p = plan("q105_range_frame")
    // the value-distance frame is evaluated in the same partition sort as
    // any window — sum+count must share one hash exchange and one Window
    // operator, and the frame must be RANGE, not ROWS
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      s"frame aggs did not share the exchange:\n$p")
    assert("(?i)specifiedwindowframe\\(RangeFrame".r.findAllIn(p).nonEmpty
      || p.contains("RANGE BETWEEN"), s"window frame is not a RANGE frame:\n$p")
  }

  test("q106 histogram: partial agg before the shuffle, two-column scan") {
    val p = plan("q106_histogram")
    assert(p.contains("partial_count"), s"no partial aggregation in:\n$p")
    val readSchema = "ReadSchema: struct<(.*?)>".r.findFirstMatchIn(p).map(_.group(1))
    assert(readSchema.exists(cols =>
      cols.contains("l_quantity") && cols.contains("l_extendedprice")
        && cols.split(",").length == 2),
      s"scan reads more than the two referenced columns: $readSchema")
  }

  test("q47 cube: one Expand, not one scan per grouping set") {
    val p = plan("q47_cube")
    assert(p.contains("Expand"), s"cube should plan through Expand:\n$p")
    assert("FileScan parquet".r.findAllIn(p).size <= 2,
      s"cube must scan the fact table once:\n$p")
  }

  test("q49 lead/lag: both window columns share one exchange") {
    assert("Exchange hashpartitioning".r.findAllIn(plan("q49_lead_lag")).size <= 2)
  }

  test("q53 decontamination: digest list broadcast, anti join never shuffles the corpus") {
    val p = plan("q53_decontam")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"decontamination should be a broadcast anti join:\n$p")
  }

  test("q54 tfidf: top-1 per doc runs on the bounded-heap TopKPerKey operator") {
    val p = plan("q54_tfidf")
    assert(p.contains("TopKPerKey"), s"tfidf top-1 should use TopKPerKeyExec:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"corpus-size scalar should broadcast:\n$p")
  }

  test("q67 fuzzy decontamination: blocklist sketch broadcast into the band join") {
    val p = plan("q67_fuzzy_decontam")
    assert(p.contains("BroadcastHashJoin"),
      s"blocklist bands should broadcast — the corpus must not shuffle:\n$p")
    assert(p.contains("LeftAnti"), s"survivors should come from an anti join:\n$p")
  }

  test("q65 bm25: top-1 per doc on the bounded-heap operator, scalars broadcast") {
    val p = plan("q65_bm25")
    assert(p.contains("TopKPerKey"), s"bm25 top-1 should use TopKPerKeyExec:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"N/avgdl scalars should broadcast:\n$p")
  }

  test("q64 packing: running-sum window partitioned by the writer shard, not language alone") {
    val p = plan("q64_pack")
    val wins = p.linesIterator.filter(_.contains("Window [")).toSeq
    assert(wins.nonEmpty, s"no Window operators found in:\n$p")
    wins.foreach(l => assert(l.contains("writer"),
      s"packing window lost its writer shard (per-language serial sort):\n$l"))
  }

  test("q57 heavy hitters: sketch partial-aggregates before the single-partition shuffle") {
    val p = plan("q57_heavy_hitters")
    assert(p.contains("partial_heavy_hitters"),
      s"sketch must reduce map-side (width rows per partition into the shuffle):\n$p")
  }

  test("q46 simhash near-dup: equi-join candidates, no nested loop, no cartesian") {
    val p = plan("q46_simhash_neardup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"band self-join degenerated:\n$p")
  }

  test("q48 percentiles: CDF ranks resolve chunk-parallel, no per-group serial sort") {
    // every Window that sorts by the VALUE column must also partition by
    // the range-chunk id — a window partitioned by the group columns
    // alone would land each group's whole distinct-value set in one task
    // (the round-3 scale-weak plan). Windows ordered by __pid (the tiny
    // per-chunk offset rollup) are exempt: they hold <= nChunks rows per
    // group by construction.
    val p = plan("q48_percentiles")
    val windowLines = p.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windowLines.nonEmpty, s"no Window operators found in:\n$p")
    // the CDF running sum is the window over `sum(__c)` (raw value
    // counts); the offsets rollups sum `__ct` over <= nChunks rows/group
    val cdfWindows = windowLines.filter(_.contains("sum(__c#"))
    assert(cdfWindows.nonEmpty, s"expected the CDF running-sum window in:\n$p")
    cdfWindows.foreach(l =>
      assert(l.contains("__pid"),
        s"CDF window not chunk-partitioned (per-group serial sort):\n$l"))
  }

  test("q63 global top-k: TakeOrderedAndProject, never a full range sort") {
    val p = plan("q63_top_quality")
    assert(p.contains("TakeOrderedAndProject"),
      s"ORDER BY + LIMIT should plan as bounded top-k:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"global top-k must not range-sort the corpus:\n$p")
  }

  // ---- TPC-H suite (q68-q76): the plan shapes the module docstring
  // promises. Six oracle rows alone can't catch a refactor that silently
  // de-optimizes the flagship suite — these pins can.

  test("q71 discount revenue: ALL predicates reach PushedFilters as raw columns") {
    // the plan's metadata string truncates at 100 chars by default —
    // widen it so the full PushedFilters list is assertable
    val saved = spark.conf.getOption("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try {
      val p = plan("q71_tpch_discount_rev")
      for (pred <- Seq(
        "GreaterThanOrEqual(l_shipdate,", "LessThan(l_shipdate,",
        "GreaterThanOrEqual(l_discount,0.045)", "LessThanOrEqual(l_discount,0.075)",
        "LessThan(l_quantity,24.0)"))
        assert(p.contains(pred), s"predicate $pred not pushed to the parquet scan:\n$p")
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.maxMetadataStringLength", v)
      case None => spark.conf.unset("spark.sql.maxMetadataStringLength")
    }
  }

  test("q68 pricing rollup: partial+final hash aggregation, pruned scan") {
    val p = plan("q68_tpch_pricing")
    assert(p.contains("partial_sum"), s"no map-side partial aggregation:\n$p")
    // the scan's projected column list must be EXACTLY the 7 referenced
    // columns — compare the full set (strip the #id suffixes), so a
    // regression that drags in any unreferenced column (l_comment,
    // l_orderkey, ...) fails, not just the two spot-checked ones
    val scanCols = "FileScan parquet \\[(.*?)\\]".r.findFirstMatchIn(p).map(_.group(1))
    assert(scanCols.isDefined, s"no FileScan in:\n$p")
    val projected = scanCols.get.split(",").map(_.trim.takeWhile(_ != '#')).toSet
    val expected = Set("l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
    assert(projected == expected,
      s"scan projection drifted from the 7 referenced columns: $projected")
  }

  test("q116 histogram rollup: two-column scan, partial counts before the shuffle") {
    val p = plan("q116_hist_quantiles")
    val scanCols = "FileScan parquet \\[(.*?)\\]".r.findFirstMatchIn(p).map(_.group(1))
    assert(scanCols.isDefined, s"no FileScan in:\n$p")
    val projected = scanCols.get.split(",").map(_.trim.takeWhile(_ != '#')).toSet
    assert(projected == Set("l_extendedprice", "l_shipdate"),
      s"histogram sketch scan reads more than its two inputs: $projected")
    // the per-(day,bucket) counts combine map-side: the shuffle carries
    // sketch rows, not raw rows
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"no map-side partial aggregation before the sketch shuffle:\n$p")
  }

  test("q123 percentile-rank: the CDF side joins as a broadcast, rows never re-sort") {
    val p = plan("q123_pct_rank")
    assert(p.contains("BroadcastHashJoin"),
      s"bucket-grain CDF should broadcast to the row side:\n$p")
    // the transform must never sort-merge the row side against the CDF
    // (that would sort the whole table to join a few hundred buckets);
    // the only permissible sorts are the histogram branch's window and
    // the final 10-row output ordering
    assert(!p.contains("SortMergeJoin"),
      s"row side must not sort-merge against the bucket CDF:\n$p")
  }

  test("q69/q72/q73 top-k: TakeOrderedAndProject, never a global range sort") {
    for (q <- Seq("q69_tpch_shipprio", "q72_tpch_returns", "q73_tpch_big_orders")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"),
        s"$q should plan bounded top-k:\n$p")
      assert(!p.contains("Exchange rangepartitioning"),
        s"$q must not range-sort before the limit:\n$p")
    }
  }

  test("q70/q72: nation/region dimensions broadcast, never shuffled") {
    // a bare contains("BroadcastHashJoin") would pass if AQE broadcast
    // some OTHER small side while nation/region shuffle-joined — also
    // assert no shuffle exchange ever hashes the dim keys
    val p70 = plan("q70_tpch_local_volume")
    assert(p70.contains("BroadcastHashJoin"), s"no broadcast join in q70:\n$p70")
    assert(!p70.contains("hashpartitioning(n_nationkey") &&
      !p70.contains("hashpartitioning(r_regionkey"),
      s"nation/region scan reached a shuffle exchange:\n$p70")
    val p72 = plan("q72_tpch_returns")
    assert(p72.contains("BroadcastHashJoin"), s"no broadcast join in q72:\n$p72")
    assert(!p72.contains("hashpartitioning(n_nationkey"),
      s"nation scan reached a shuffle exchange:\n$p72")
  }

  test("q77 correlated EXISTS: decorrelated into one LeftSemi join") {
    val p = plan("q77_tpch_waiting_orders")
    assert(p.contains("LeftSemi"),
      s"EXISTS should rewrite to a semi join:\n$p")
    assert(!p.contains("Subquery"),
      s"per-row subquery execution survived decorrelation:\n$p")
    // the order-date window is a raw-column predicate — it must reach
    // the orders parquet scan, not evaluate post-join
    assert(p.contains("GreaterThanOrEqual(o_orderdate,"),
      s"order-date window not pushed to the orders scan:\n$p")
  }

  test("q78 EXISTS + NOT EXISTS: one LeftSemi + one LeftAnti, no per-row probe") {
    val p = plan("q78_tpch_sole_blame")
    assert(p.contains("LeftSemi"),
      s"EXISTS should rewrite to a semi join:\n$p")
    assert(p.contains("LeftAnti"),
      s"NOT EXISTS should rewrite to an anti join:\n$p")
    assert(!p.contains("Subquery"),
      s"per-row subquery execution survived decorrelation:\n$p")
  }

  test("q79 correlated subquery with join body: decorrelated into one aggregate") {
    val p = plan("q79_tpch_region_best_supplier")
    // the subquery body (supplier⨝nation, max by region) must be pulled
    // out as ONE grouped aggregate joined back on (acctbal, regionkey) —
    // a surviving Subquery node would mean a per-outer-row probe
    assert(!p.contains("Subquery"),
      s"per-row subquery execution survived decorrelation:\n$p")
    assert(p.contains("max(s_acctbal)"),
      s"decorrelated max-aggregate missing from the plan:\n$p")
    assert(p.contains("partial_max"),
      s"the decorrelated aggregate lost its partial (map-side) phase:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"dim/aggregate sides should broadcast at this size:\n$p")
  }

  test("q80 HAVING scalar subquery: global total computed once, not per group") {
    val p = plan("q80_tpch_brand_share")
    // the share threshold is an UNCORRELATED scalar subquery — it must
    // appear as exactly ONE one-shot subquery plan (partial_sum →
    // SinglePartition), broadcast into the HAVING filter; distinct ids
    // (not occurrences) so AQE's initial+final printout can't double-count
    val subqueryIds = "Subquery subquery#(\\d+)".r.findAllMatchIn(p).map(_.group(1)).toSet
    assert(subqueryIds.size == 1,
      s"expected exactly one one-shot scalar subquery, got $subqueryIds:\n$p")
    assert(p.contains("Exchange SinglePartition"),
      s"global-total aggregate should reduce to a single partition:\n$p")
    assert(p.contains("partial_sum"),
      s"revenue aggregation lost its partial phase:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"part dimension should broadcast:\n$p")
  }

  test("q81 grouping sets: ONE Expand + ONE aggregate shuffle for all three sets") {
    val p = plan("q81_grouping_sets")
    assert(p.contains("Expand"), s"grouping sets should plan through Expand:\n$p")
    assert("Expand".r.findAllIn(p).length <= 2, // initial + final AQE sections
      s"grouping sets should plan as exactly one Expand:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 2,
      s"all grouping sets must share one aggregate shuffle:\n$p")
    assert("FileScan parquet".r.findAllIn(p).length <= 2,
      s"grouping sets must scan lineitem once, not once per set:\n$p")
    assert(p.contains("partial_count"),
      s"the Expand output lost its map-side partial aggregation:\n$p")
  }

  test("q82 recursive CTE: executes as an iterative UnionLoop, date pushdown intact") {
    val p = plan("q82_recursive_cummonth")
    assert(p.contains("UnionLoop"),
      s"recursive CTE should execute as UnionLoop:\n$p")
    // the loop body is embedded as a logical plan (planned per iteration),
    // so pushdown shows as the raw-column date filter sitting on the scan
    assert(p.contains("o_orderdate") && p.contains("1997-01-01"),
      s"1997 date window missing from the loop body's orders scan:\n$p")
  }

  test("q83 LATERAL join: correlated LIMIT decorrelated to a per-key window, no per-row subquery") {
    val p = plan("q83_lateral_top2")
    assert(!p.contains("Subquery"),
      s"LATERAL subquery executed per-row instead of decorrelating:\n$p")
    // the correlated ORDER BY + LIMIT 2 must become a per-regionkey
    // top-k (row_number window, or TopKPerKey when the rewrite rule
    // recognizes the filter-drop idiom) joined back once
    assert(p.contains("row_number") || p.contains("TopKPerKey"),
      s"no per-group top-k operator in the decorrelated plan:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"region side should broadcast:\n$p")
  }

  test("SQL front-end queries are pure: running them registers no temp views") {
    // snapshot-based so views registered by OTHER suites sharing the
    // session can't produce false failures — only NEW views fail
    val before = spark.catalog.listTables().collect().map(_.name).toSet
    for (q <- Seq("q50_above_avg", "q52_quality_filter", "q75_tpch_small_qty",
        "q77_tpch_waiting_orders", "q78_tpch_sole_blame",
        "q79_tpch_region_best_supplier", "q80_tpch_brand_share",
        "q81_grouping_sets", "q82_recursive_cummonth", "q83_lateral_top2"))
      plan(q)
    val added = spark.catalog.listTables().collect().map(_.name).toSet -- before
    assert(added.isEmpty,
      s"query functions registered session temp views (side effect): $added")
  }

  test("q75 correlated subquery: decorrelated into one aggregate + join") {
    val p = plan("q75_tpch_small_qty")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"correlated avg should become a join:\n$p")
    assert(!p.contains("Subquery"),
      s"per-row subquery execution survived decorrelation:\n$p")
    assert(p.contains("partial_avg"), s"per-part avg lost its partial agg:\n$p")
  }

  /** The executed-plan string prints BOTH the AQE final and initial
    * plans; scan-count assertions must look at the final section only.
    */
  private def finalPlan(p: String): String =
    p.split("== Initial Plan ==").head

  test("q85 promo share: ONE lineitem scan feeds both conditional sums") {
    val p = plan("q85_tpch_promo_share")
    // two conditional aggregates must come from a single pass — a
    // regression to one-scan-per-sum doubles the 100 TB read
    assert("lineitem\\.parquet".r.findAllIn(finalPlan(p)).size == 1,
      s"promo/total sums scan lineitem more than once:\n$p")
    assert(p.contains("partial_sum"), s"aggregate lost its partial phase:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"part dim should broadcast:\n$p")
  }

  test("q86 top supplier: scalar max runs over the aggregated CTE, not lineitem") {
    val p = plan("q86_tpch_top_supplier")
    val subqueryIds = "Subquery subquery#(\\d+)".r.findAllMatchIn(p).map(_.group(1)).toSet
    assert(subqueryIds.size == 1,
      s"expected exactly one one-shot scalar subquery, got $subqueryIds:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian product in plan:\n$p")
    assert(p.contains("partial_sum"),
      s"per-supplier revenue lost its partial aggregation:\n$p")
    // the quarter window must reach the lineitem scan
    assert(p.contains("GreaterThanOrEqual(l_shipdate,"),
      s"ship-date window not pushed to the lineitem scan:\n$p")
  }

  test("q87 disjunctive predicates: common equi-key extracted, no nested loop") {
    val p = plan("q87_tpch_disjunctive")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"OR-of-ANDs predicate degraded the join to a nested loop:\n$p")
    assert(p.contains("HashJoin"),
      s"p_partkey = l_partkey should remain a hash join:\n$p")
  }

  test("q88 idle-rich: conditional NOT EXISTS decorrelates to LeftAnti, filter pushed") {
    val p = plan("q88_tpch_idle_rich")
    assert(p.contains("LeftAnti"),
      s"NOT EXISTS should rewrite to an anti join:\n$p")
    // the priority filter is a raw-column predicate on orders — it must
    // prune the scan feeding the anti join, not evaluate inside it
    assert(p.contains("EqualTo(o_orderpriority,1-URGENT)"),
      s"priority filter not pushed to the orders scan:\n$p")
  }

  test("q89 nation volume: both nation roles broadcast, dim prune precedes fact joins") {
    val p = plan("q89_tpch_nation_volume")
    assert(!p.contains("CartesianProduct"), s"cartesian product in plan:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"the two nation roles should both broadcast:\n$p")
    // the nation-name disjunction prunes the dim scans (In/EqualTo on n_name)
    assert(p.contains("In(n_name,") || p.contains("EqualTo(n_name,"),
      s"nation-name filter not pushed to the dim scans:\n$p")
  }

  test("q90 market share: ONE aggregate pass over one lineitem scan") {
    val p = plan("q90_tpch_market_share")
    assert("lineitem\\.parquet".r.findAllIn(finalPlan(p)).size == 1,
      s"nation/total sums scan lineitem more than once:\n$p")
    assert(p.contains("partial_sum"), s"aggregate lost its partial phase:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian product in plan:\n$p")
  }

  test("q91 exact jaccard join: equi-join blocking, per-doc window, no all-pairs") {
    val p = plan("q91_jaccard_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"prefix blocking degraded to an all-pairs join:\n$p")
    // the rarest-first rank is a PER-DOC window — a global sort here
    // would serialize the corpus
    assert(p.contains("row_number"), s"prefix rank window missing:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"global single-partition stage in the blocking path:\n$p")
  }

  test("q94 shipmode: date window pushed to the fact scan, partial conditional sums") {
    val p = plan("q94_tpch_shipmode")
    assert(p.contains("GreaterThanOrEqual(l_shipdate,"),
      s"ship-date window not pushed to the lineitem scan:\n$p")
    assert(p.contains("partial_sum"),
      s"conditional counts lost their map-side partial phase:\n$p")
  }

  test("q95 NOT IN: plans a null-aware anti join, not a per-row probe") {
    val p = plan("q95_tpch_supplier_cnt")
    assert(p.contains("LeftAnti"),
      s"NOT IN should plan an anti join:\n$p")
    // NOT IN's three-valued-logic semantics need the null-aware variant —
    // a plain LeftAnti would return wrong results if the exclusion set
    // ever contained a null. BroadcastHashJoinExec prints the
    // isNullAwareAntiJoin flag as the trailing boolean of its argument
    // list: "BroadcastHashJoin [...], [...], LeftAnti, BuildRight, true"
    assert("LeftAnti, Build(Left|Right), true".r.findFirstIn(p).isDefined,
      s"anti join is not null-aware:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"NOT IN degraded to a nested-loop probe:\n$p")
  }

  test("q96 repetition: per-row signals shuffle nothing before the output sort") {
    val p = plan("q96_repetition")
    // every signal (token count, distinct count, top-bigram run) is a
    // per-row HOF — the only exchange allowed is the final orderBy's
    // range partitioning; a hashpartitioning exchange would mean the
    // bigram count fell back to explode+groupBy
    assert(!p.contains("hashpartitioning"),
      s"per-row repetition signals introduced a hash shuffle:\n$p")
  }

  test("q100 profit: dims broadcast, name filter pushed to the part scan, partial agg") {
    val p = plan("q100_tpch_profit")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      s"part/supplier/nation should all broadcast:\n$p")
    assert(p.contains("StringContains(p_name,red)"),
      s"the '%red%' filter did not reach the part scan:\n$p")
    assert(p.contains("partial_sum"),
      s"profit aggregate lost its map-side partial phase:\n$p")
  }

  test("q102 nested IN + correlated HAVING: fully decorrelated, no per-row probe") {
    val p = plan("q102_tpch_dominant_supplier")
    assert(p.contains("LeftSemi"),
      s"IN subqueries should rewrite to semi joins:\n$p")
    assert(!p.contains("Subquery"),
      s"per-row subquery execution survived decorrelation:\n$p")
    assert(p.contains("partial_sum"),
      s"the volume aggregates lost their map-side partial phase:\n$p")
  }

  test("q99 split leakage: gram-keyed equi-join, never a doc x doc cross product") {
    val p = plan("q99_split_leakage")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"leakage audit degraded to an all-pairs comparison:\n$p")
    assert(p.contains("Join") || p.contains("join"),
      s"expected an equi-join on the gram key:\n$p")
  }

  test("runtime bloom-filter pruning: selective dim join filters the fact scan") {
    // the 100 TB shape: a selective dimension predicate should prune the
    // fact-side shuffle via an injected bloom filter (might_contain),
    // not scan-and-shuffle every fact row into the join
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force a shuffle join
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import org.apache.spark.sql.functions._
      val l = spark.read.parquet(s"$sf/lineitem.parquet")
      val p = spark.read.parquet(s"$sf/part.parquet").where(col("p_size") === 1)
      val q = l.join(p, l("l_partkey") === p("p_partkey"))
        .agg(sum(col("l_quantity")).as("qty"))
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter injected on the fact side:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("sweep: no unpartitioned window over data-proportional input, anywhere") {
    // The structural guard that found q128: an empty-partition-spec
    // Window funnels its whole input through ONE task — acceptable only
    // over provably bounded inputs. Sweep EVERY SparkEntry query's
    // optimized plan (construction only — no collect; side-effectful
    // harnesses still run their setup) and require each unpartitioned
    // window to be on the allowlist below, each entry with its
    // boundedness argument. A new query that sneaks one in fails here.
    val bounded: Map[String, String] = Map(
      // histogram-bucket-count-sized CDF (fixed bucket grid, not rows)
      "q123_pct_rank" -> "window over histogram buckets",
      // same grid; the lit(1) partition key constant-folds to empty
      "q126_gap_quantiles" -> "window over histogram buckets",
      // month-count-sized lag (~84 rows over the calendar, not rows)
      "q127_mom_growth" -> "window over months",
      // globalRank: at sweep scale the adaptive size probe picks the
      // plain window (input <= smallInputRows by construction — the
      // SAME bound that makes it safe); at scale it switches to the
      // chunked path whose only unpartitioned window is the offsets
      // rollup over <= spark.sql.shuffle.partitions rows
      "q128_pareto" -> "globalRank: adaptive small-input window / chunked offsets")
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val df =
        try fn(spark, sf)
        catch { case e: Throwable => fail(s"$name failed to construct: $e") }
      val hits = df.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
      if (hits.nonEmpty && !bounded.contains(name)) offenders += name
    }
    assert(offenders.isEmpty,
      s"unpartitioned windows outside the bounded allowlist: ${offenders.mkString(", ")}")
  }
}
