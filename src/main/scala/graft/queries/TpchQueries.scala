package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Sources

/** TPC-H-shaped analytic suite over the driver's TPC-H-ish tables —
  * the classic multi-join/aggregate decision-support patterns a user of
  * a general analytics engine runs daily (pricing rollup, shipping
  * priority, local-supplier volume, forecast revenue, returned items,
  * large orders). The reference lab corpus has no multi-table analytics
  * beyond lab5's matmul join; this module is the engine-extension proof
  * that the join/agg surface composes into real reporting queries.
  *
  * Determinism discipline (hash-compared against DuckDB, no tolerance):
  *   - money is aggregated as exact integers — cents (x100) for plain
  *     sums, 1e-4-dollar units (price-cents x discount-cents) for
  *     `price*(1-disc)` revenue, 1e-6-dollar units for
  *     `price*(1-disc)*(1+tax)` charges. Each per-row product is an
  *     exact integer below 2^53 BEFORE the long cast, so partial-agg
  *     order can't change the total. (At 100 TB the 1e-6 units approach
  *     2^63 headroom — [[q68PricingDecimal]] is the decimal(38,6) swap
  *     for that regime, value-parity-tested in TpchSuiteSpec with the
  *     measured A/B cost in SURVEY §7b.)
  *   - averages derive from the exact integer sums with ONE double
  *     division + round(6) written identically on both sides (a binary
  *     double can never land exactly on a .5e-6 boundary, so HALF_UP vs
  *     away-from-zero rounding modes agree).
  *   - timestamps group/emit as 'yyyy-MM-dd' strings (date_format vs
  *     strftime), never raw timestamps, so renderings can't drift.
  *   - every ORDER BY ends in a unique key so row order is total.
  *
  * Scale shape: lineitem⨝orders⨝customer are shuffle hash joins on
  * their natural keys (AQE re-plans the post-filter small sides);
  * nation/region are broadcast; every filter is a raw-column parquet
  * pushdown on the scan (date/segment/flag/band predicates). PlanSpec
  * pins the suite: q71's PushedFilters (shipdate window, discount band,
  * quantity cap), the q70/q72 broadcast dims, TakeOrderedAndProject for
  * the three top-k queries, q68's partial+final hash-agg, q75's
  * decorrelation into a join, and q77/q78's EXISTS / NOT EXISTS
  * decorrelation into semi/anti joins.
  */
object TpchQueries {

  private def t(s: SparkSession, dir: String, name: String) = Sources.table(s, dir, name)

  /** l_extendedprice in exact cents (integral double < 2^53, cast late). */
  private val priceCents = round(col("l_extendedprice") * 100)
  /** (1 - l_discount) in exact cents. */
  private val discFactorCents = round((lit(1) - col("l_discount")) * 100)
  /** (1 + l_tax) in exact cents. */
  private val taxFactorCents = round((lit(1) + col("l_tax")) * 100)
  /** price*(1-disc) in 1e-4 dollars: product of two exact integers. */
  private val discPriceE4 = (priceCents * discFactorCents).cast("long")
  /** price*(1-disc)*(1+tax) in 1e-6 dollars. */
  private val chargeE6 = (priceCents * discFactorCents * taxFactorCents).cast("long")

  /** avg = exact-long-sum / count, one division, round 6. */
  private def avg6(sumCol: Column, cntCol: Column): Column =
    round(sumCol.cast("double") / cntCol, 6)

  /** The exact-decimal money path for the regime where the 1e-6-dollar
    * long units would overflow 2^63 (roughly >9.2e12 dollars of summed
    * charge — reachable on a 100 TB lineitem). Same q68 rollup with
    * money as decimal(12,2)/(38,6): Spark sums decimals exactly at any
    * scale (overflow raises, never wraps — unlike the long path, whose
    * Java-long sum wraps silently past 2^63 with no signal from codegen;
    * that is the whole rationale for the swap, not just extra digits).
    * TpchSuiteSpec asserts this plan's totals equal the long path's on
    * the fixtures AND that a decimal(38,6) sum past its 1e32 bound
    * raises under ANSI; SURVEY §7b records the measured A/B cost.
    */
  def q68PricingDecimal(s: SparkSession, dir: String): DataFrame = {
    val price = col("l_extendedprice").cast("decimal(12,2)")
    val disc = (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)"))
    val tax = (lit(1).cast("decimal(3,2)") + col("l_tax").cast("decimal(3,2)"))
    t(s, dir, "lineitem")
      .where(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(round(col("l_quantity")).cast("long")).as("sum_qty"),
        sum(price).as("sum_base"),
        sum((price * disc).cast("decimal(38,6)")).as("sum_disc"),
        sum((price * disc * tax).cast("decimal(38,6)")).as("sum_charge"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 pricing summary: one scan, partial+final hash-agg on a
    // 2-value x 2-value key (4 groups — the partial agg collapses 60k
    // rows/task to 4 before the exchange; at 100 TB the shuffle moves
    // bytes proportional to tasks, not rows).
    "q68_tpch_pricing" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          // round-before-cast: Spark's cast truncates toward zero while
          // DuckDB's CAST rounds — round() first so a fractional quantity
          // can never diverge (same discipline as the money columns).
          sum(round(col("l_quantity")).cast("long")).as("sum_qty"),
          sum(priceCents.cast("long")).as("sum_base_cents"),
          sum(discPriceE4).as("sum_disc_e4"),
          sum(chargeE6).as("sum_charge_e6"),
          count(lit(1)).as("cnt"))
        .withColumn("avg_qty", avg6(col("sum_qty"), col("cnt")))
        .withColumn("avg_price", avg6(col("sum_base_cents"), col("cnt") * 100))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // TPC-H Q3 shipping priority: segment-filtered customers ⨝ orders on
    // custkey, ⨝ lineitem on orderkey, top-10 unshipped orders by
    // revenue. The two joins shuffle on their natural keys; the final
    // top-10 is TakeOrderedAndProject (no global sort materialized).
    "q69_tpch_shipprio" -> { (s, dir) =>
      val cutoff = lit("1998-03-15").cast("timestamp")
      val cust = t(s, dir, "customer")
        .where(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val ord = t(s, dir, "orders")
        .where(col("o_orderdate") < cutoff)
        .select(col("o_orderkey"), col("o_custkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"))
      val li = t(s, dir, "lineitem")
        .where(col("l_shipdate") > cutoff)
        .select(col("l_orderkey"), discPriceE4.as("__rev"))
      cust.join(ord, col("c_custkey") === col("o_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy("l_orderkey", "o_date")
        .agg(sum(col("__rev")).as("revenue_e4"))
        .orderBy(col("revenue_e4").desc, col("l_orderkey"))
        .limit(10)
    },

    // TPC-H Q5 local-supplier volume: 6-table join where the supplier
    // must sit in the customer's nation. nation+region broadcast (tiny
    // dims at every SF); customer/orders/lineitem/supplier shuffle on
    // natural keys; the c_nationkey = s_nationkey locality predicate
    // rides the lineitem⨝supplier join condition.
    "q70_tpch_local_volume" -> { (s, dir) =>
      val asiaNations = broadcast(
        t(s, dir, "nation")
          .join(broadcast(t(s, dir, "region").where(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey", "n_name"))
      val ord = t(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
        .join(asiaNations, col("c_nationkey") === col("n_nationkey"))
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), discPriceE4.as("__rev"))
      val supp = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      ord.join(cust, col("o_custkey") === col("c_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .join(supp,
          col("l_suppkey") === col("s_suppkey") &&
            col("s_nationkey") === col("c_nationkey"))
        .groupBy("n_name")
        .agg(sum(col("__rev")).as("revenue_e4"))
        .orderBy(col("revenue_e4").desc, col("n_name"))
    },

    // TPC-H Q6 forecast revenue: pure scan-filter-agg — every predicate
    // (date window, discount band, quantity cap) is a raw-column
    // comparison so ALL of them reach PushedFilters and prune parquet
    // row groups (a derived expression like round(disc*100) would not);
    // the discount band [0.045, 0.075] is exact at 2-decimal discounts.
    // The agg is one global long sum (partial per task, one row final).
    "q71_tpch_discount_rev" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .where(
          col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
            col("l_discount").between(0.045, 0.075) &&
            col("l_quantity") < 24)
        .agg(sum((priceCents * round(col("l_discount") * 100)).cast("long"))
          .as("revenue_e4"))
    },

    // TPC-H Q10 returned-item reporting: who returned the most revenue
    // last quarter. lineitem(R)⨝orders⨝customer⨝nation(broadcast);
    // top-20 customers by lost revenue, TakeOrderedAndProject again.
    "q72_tpch_returns" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
        .where(col("l_returnflag") === "R")
        .select(col("l_orderkey"), discPriceE4.as("__rev"))
      val ord = t(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1998-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-04-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"),
          round(col("c_acctbal") * 100).cast("long").as("acctbal_cents"),
          col("c_nationkey"))
      val nat = broadcast(t(s, dir, "nation").select("n_nationkey", "n_name"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(nat, col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "acctbal_cents", "n_name")
        .agg(sum(col("__rev")).as("revenue_e4"))
        .orderBy(col("revenue_e4").desc, col("c_custkey"))
        .limit(20)
    },

    // TPC-H Q18 large-volume orders: the HAVING-subquery pattern. The
    // qualifying-order set is a lineitem self-aggregation (partial+final
    // on l_orderkey) semi-joined back — at scale the semi-join side is
    // tiny (99.9th-percentile threshold), so AQE broadcasts it.
    "q73_tpch_big_orders" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val big = li.groupBy("l_orderkey")
        .agg(sum(round(col("l_quantity")).cast("long")).as("sum_qty"))
        .where(col("sum_qty") > 300)
      val ord = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
          round(col("o_totalprice") * 100).cast("long").as("totalprice_cents"))
      val cust = t(s, dir, "customer").select("c_custkey", "c_name")
      big.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_date",
          "totalprice_cents", "sum_qty")
        .orderBy(col("totalprice_cents").desc, col("o_orderkey"))
        .limit(100)
    },

    // TPC-H Q13 customer distribution: the LEFT OUTER null-extension
    // query. The o_orderpriority predicate lives in the JOIN CONDITION,
    // not a WHERE — the classic outer-join trap (a WHERE would silently
    // turn the join inner and drop zero-order customers). count(col)
    // skips the null-extended rows, so unmatched customers land in the
    // c_count=0 bucket. Scale: one shuffle join on custkey + two
    // partial+final hash-aggs; no broadcast needed (both sides big).
    "q74_tpch_custdist" -> { (s, dir) =>
      val cust = t(s, dir, "customer").select("c_custkey")
      val ord = t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderpriority")
      cust
        .join(ord,
          col("c_custkey") === col("o_custkey") &&
            col("o_orderpriority") =!= "1-URGENT",
          "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // TPC-H Q17 small-quantity revenue: a CORRELATED scalar subquery
    // through the SQL front-end — proves Catalyst decorrelates the
    // per-row avg into one aggregate + join (PlanSpec pins it: the
    // executed plan has a join on l_partkey and no per-row subquery).
    // The table is referenced as a direct `parquet.`path`` relation so
    // the query function stays pure — no temp-view registration, no
    // session state mutated (every entry in this map must be safely
    // callable concurrently with different dirs).
    // Determinism: quantities are integral doubles, so per-part sums are
    // exact; avg is ONE double division and 0.2*avg ONE multiply,
    // written identically on both engines — the < compare can't flap.
    "q75_tpch_small_qty" -> { (s, dir) =>
      val li = s"parquet.`$dir/lineitem.parquet`"
      s.sql(
        s"""SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           |         AS lost_cents,
           |       count(*) AS cnt
           |FROM $li l1
           |WHERE l1.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
           |                       FROM $li l2
           |                       WHERE l2.l_partkey = l1.l_partkey)""".stripMargin)
    },

    // FULL OUTER join with null extension on BOTH sides: daily order
    // activity vs daily ship activity. Ship dates trail order dates by
    // months, so the calendar tails are one-sided — order-only days
    // null-extend the ship column and vice versa; coalesce folds them
    // to zero. Scale: two partial+final aggs then one shuffle join on
    // the day key (small join — one row per day — but written as the
    // general shuffle shape, not a collect).
    "q76_full_outer_days" -> { (s, dir) =>
      val o = t(s, dir, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("d_ord"))
        .agg(count(lit(1)).as("ord_cnt"))
      val l = t(s, dir, "lineitem")
        .groupBy(date_format(col("l_shipdate"), "yyyy-MM-dd").as("d_ship"))
        .agg(count(lit(1)).as("ship_cnt"))
      o.join(l, col("d_ord") === col("d_ship"), "full_outer")
        .select(
          coalesce(col("d_ord"), col("d_ship")).as("day"),
          coalesce(col("ord_cnt"), lit(0L)).as("n_ord"),
          coalesce(col("ship_cnt"), lit(0L)).as("n_ship"))
        .orderBy("day")
    },

    // TPC-H Q4 shape: correlated EXISTS through the SQL front-end —
    // "orders placed in Q3'97 where at least one line shipped more than
    // 90 days after the order date" (this fixture's lineitem has no
    // commit/receipt dates, so late-shipment is the Q4 'late' proxy; the
    // decorrelation surface is identical). The subquery carries TWO
    // outer references — an equi one (l_orderkey = o_orderkey) and a
    // non-equi one (l_shipdate > o_orderdate + 90 days) — so Catalyst
    // must rewrite it as a LEFT SEMI join on orderkey with the date
    // predicate in the join condition, executed once, never per-row.
    // PlanSpec pins LeftSemi + no per-row subquery. Scale: semi join
    // shuffles both sides once on orderkey; the order-date window is a
    // raw-column parquet pushdown.
    "q77_tpch_waiting_orders" -> { (s, dir) =>
      val ord = s"parquet.`$dir/orders.parquet`"
      val li = s"parquet.`$dir/lineitem.parquet`"
      s.sql(
        s"""SELECT o_orderpriority, count(*) AS order_count
           |FROM $ord o
           |WHERE o.o_orderdate >= TIMESTAMP '1997-07-01'
           |  AND o.o_orderdate <  TIMESTAMP '1997-10-01'
           |  AND EXISTS (SELECT 1 FROM $li l
           |              WHERE l.l_orderkey = o.o_orderkey
           |                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAYS)
           |GROUP BY o_orderpriority
           |ORDER BY o_orderpriority""".stripMargin)
    },

    // TPC-H Q21 shape: nested EXISTS + NOT EXISTS — "suppliers solely to
    // blame for a return on a finished multi-supplier order" (returnflag
    // 'R' stands in for receipt>commit lateness; the double-subquery
    // decorrelation surface is Q21's). EXISTS → LEFT SEMI (another
    // supplier touched the order), NOT EXISTS → LEFT ANTI (no OTHER
    // supplier's line was returned); both correlate on l_orderkey with a
    // non-equi suppkey<>suppkey residual, so each rewrites to ONE join
    // keyed on orderkey — never a per-row probe. Scale: three shuffles
    // on orderkey (fact, semi, anti — same key, AQE reuses exchanges
    // where possible) + a broadcast supplier dim; output ≤ supplier
    // count. Determinism: s_name is unique, so the DESC/ASC order is
    // total.
    "q78_tpch_sole_blame" -> { (s, dir) =>
      val li = s"parquet.`$dir/lineitem.parquet`"
      val ord = s"parquet.`$dir/orders.parquet`"
      val supp = s"parquet.`$dir/supplier.parquet`"
      s.sql(
        s"""SELECT s_name, count(*) AS numwait
           |FROM $li l1
           |JOIN $ord o ON o.o_orderkey = l1.l_orderkey
           |           AND o.o_orderstatus = 'F'
           |JOIN $supp s ON s.s_suppkey = l1.l_suppkey
           |WHERE l1.l_returnflag = 'R'
           |  AND EXISTS (SELECT 1 FROM $li l2
           |              WHERE l2.l_orderkey = l1.l_orderkey
           |                AND l2.l_suppkey <> l1.l_suppkey)
           |  AND NOT EXISTS (SELECT 1 FROM $li l3
           |                  WHERE l3.l_orderkey = l1.l_orderkey
           |                    AND l3.l_suppkey <> l1.l_suppkey
           |                    AND l3.l_returnflag = 'R')
           |GROUP BY s_name
           |ORDER BY numwait DESC, s_name
           |LIMIT 100""".stripMargin)
    },

    // TPC-H Q2 shape: a correlated scalar subquery whose BODY ITSELF JOINS
    // tables — the last decorrelation class after q75 (single-table
    // correlate) and q77/q78 (EXISTS). "Best supplier per region": the
    // subquery computes max(acctbal) over supplier⨝nation correlated on
    // the outer region key, so Catalyst must pull the join+aggregate out,
    // group it by n_regionkey, and join it back — ONE aggregate over the
    // whole supplier table, never a per-row probe (PlanSpec pins: no
    // Subquery node survives, and a max-aggregate join appears instead).
    // Scale: dims all broadcast at any SF; the decorrelated aggregate
    // reads supplier once. Determinism: both engines compare the SAME
    // stored double bit-patterns (max of a set of doubles is one of them,
    // equality is exact); s_name is unique so the order is total.
    "q79_tpch_region_best_supplier" -> { (s, dir) =>
      val supp = s"parquet.`$dir/supplier.parquet`"
      val nat = s"parquet.`$dir/nation.parquet`"
      val reg = s"parquet.`$dir/region.parquet`"
      s.sql(
        s"""SELECT r_name, n_name, s_name,
           |       CAST(round(s_acctbal * 100) AS BIGINT) AS acctbal_cents
           |FROM $supp s
           |JOIN $nat n ON s.s_nationkey = n.n_nationkey
           |JOIN $reg r ON n.n_regionkey = r.r_regionkey
           |WHERE s.s_acctbal = (SELECT max(s2.s_acctbal)
           |                     FROM $supp s2
           |                     JOIN $nat n2 ON s2.s_nationkey = n2.n_nationkey
           |                     WHERE n2.n_regionkey = r.r_regionkey)
           |ORDER BY r_name, s_name""".stripMargin)
    },

    // TPC-H Q11 shape: HAVING gated on a scalar subquery over the SAME
    // fact table — "brands carrying more than 4% of total revenue". The
    // share threshold is exact integer arithmetic (sum*25 > total instead
    // of sum > total*0.04 — no float ever enters the compare), so the
    // gate can't flap between engines. Catalyst evaluates the total as
    // ONE uncorrelated scalar subquery (a second scan + global agg,
    // executed once and broadcast into the filter — PlanSpec pins exactly
    // one Subquery, zero correlated per-row probes). Scale: two scans of
    // lineitem (group-by + global sum), each partial-aggregated; the part
    // dim broadcasts.
    "q80_tpch_brand_share" -> { (s, dir) =>
      val li = s"parquet.`$dir/lineitem.parquet`"
      val part = s"parquet.`$dir/part.parquet`"
      val e4 = "CAST(round(l_extendedprice*100) * round((1-l_discount)*100) AS BIGINT)"
      s.sql(
        s"""SELECT p_brand, CAST(sum($e4) AS BIGINT) AS revenue_e4
           |FROM $li JOIN $part ON l_partkey = p_partkey
           |GROUP BY p_brand
           |HAVING sum($e4) * 25 > (SELECT sum($e4) FROM $li)
           |ORDER BY revenue_e4 DESC, p_brand""".stripMargin)
    },

    // TPC-H Q14 promo-revenue share: one month of lineitem ⨝ part, two
    // conditional sums in ONE aggregate pass (never two scans), share
    // derived from the exact-long sums with one double division. part is
    // broadcast (2k rows at sf0.01; a 100 TB lineitem still only ships
    // the dim). The shipdate window is a raw-column parquet pushdown.
    "q85_tpch_promo_share" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
               col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
      val part = t(s, dir, "part").select("p_partkey", "p_type")
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", discPriceE4).otherwise(lit(0L)))
            .as("promo_e4"),
          sum(discPriceE4).as("total_e4"))
        .withColumn(
          "promo_share_pct",
          round(col("promo_e4").cast("double") * 100 / col("total_e4"), 6))
    },

    // TPC-H Q15 top supplier: a CTE (named derived aggregate) referenced
    // TWICE — once as the join input, once under an uncorrelated scalar
    // max subquery. Exact-long revenue makes the max unambiguous (no
    // float ties), so "the" top supplier is well-defined on both engines.
    // Scale: the quarter window pushes to the lineitem scan; the revenue
    // aggregate is partial+final on suppkey; supplier (small dim)
    // broadcasts; the scalar max is one extra reduction over the ALREADY
    // AGGREGATED per-supplier rows, not a second lineitem scan.
    "q86_tpch_top_supplier" -> { (s, dir) =>
      val li = s"parquet.`$dir/lineitem.parquet`"
      val supp = s"parquet.`$dir/supplier.parquet`"
      val e4 = "CAST(round(l_extendedprice*100) * round((1-l_discount)*100) AS BIGINT)"
      s.sql(
        s"""WITH revenue AS (
           |  SELECT l_suppkey, CAST(sum($e4) AS BIGINT) AS total_e4
           |  FROM $li
           |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           |    AND l_shipdate <  TIMESTAMP '1997-04-01'
           |  GROUP BY l_suppkey)
           |SELECT s_suppkey, s_name, total_e4
           |FROM $supp JOIN revenue ON s_suppkey = l_suppkey
           |WHERE total_e4 = (SELECT max(total_e4) FROM revenue)
           |ORDER BY s_suppkey""".stripMargin)
    },

    // TPC-H Q19 shape: disjunctive OR-of-ANDs predicates mixing part and
    // lineitem attributes. The planner must still extract the common
    // p_partkey equi-join (hash join, never a nested-loop over the OR) and
    // push the part-only disjunction (brand/size triples) to the dim side;
    // the mixed-side residual evaluates post-join. PlanSpec pins: no
    // BroadcastNestedLoopJoin / CartesianProduct in the plan.
    "q87_tpch_disjunctive" -> { (s, dir) =>
      val li = s"parquet.`$dir/lineitem.parquet`"
      val part = s"parquet.`$dir/part.parquet`"
      val e4 = "CAST(round(l_extendedprice*100) * round((1-l_discount)*100) AS BIGINT)"
      s.sql(
        s"""SELECT CAST(sum($e4) AS BIGINT) AS revenue_e4, count(*) AS cnt
           |FROM $li JOIN $part ON p_partkey = l_partkey
           |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1  AND 11)
           |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 20)
           |   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 20 AND 30)""".stripMargin)
    },

    // TPC-H Q22 shape: customers above the positive-balance average with
    // no recent urgent order — an uncorrelated scalar-aggregate gate plus
    // a conditional NOT EXISTS anti-join. The average gate is EXACT
    // integer arithmetic (cents*count > total-cents, no float boundary
    // can flap between engines); Catalyst evaluates the (sum, count) pair
    // once and broadcasts it, and the NOT EXISTS decorrelates to a
    // LeftAnti on custkey with the priority/date filter pushed to the
    // orders scan.
    "q88_tpch_idle_rich" -> { (s, dir) =>
      val cust = s"parquet.`$dir/customer.parquet`"
      val ord = s"parquet.`$dir/orders.parquet`"
      s.sql(
        s"""WITH pos AS (
           |  SELECT CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS s,
           |         count(*) AS n
           |  FROM $cust WHERE c_acctbal > 0)
           |SELECT c_nationkey, count(*) AS numcust,
           |       CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS totacctbal_cents
           |FROM $cust c, pos
           |WHERE CAST(round(c_acctbal*100) AS BIGINT) * pos.n > pos.s
           |  AND NOT EXISTS (SELECT 1 FROM $ord o
           |                  WHERE o.o_custkey = c.c_custkey
           |                    AND o.o_orderpriority = '1-URGENT'
           |                    AND o.o_orderdate >= TIMESTAMP '1998-01-01')
           |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
    },

    // TPC-H Q7 volume shipping: supplier-nation x customer-nation trade
    // flow per ship year. The nation dim joins TWICE under different
    // roles (supplier side / customer side) — both broadcast; the
    // fact-side joins shuffle on their natural keys. The nation-pair
    // disjunction prunes both dim scans BEFORE the fact joins (two-row
    // dims), so the big joins only see matching suppliers/customers.
    "q89_tpch_nation_volume" -> { (s, dir) =>
      val n1 = t(s, dir, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
        .where(col("supp_nation").isin("NATION_1", "NATION_2"))
      val n2 = t(s, dir, "nation")
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
        .where(col("cust_nation").isin("NATION_1", "NATION_2"))
      val li = t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
               col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      li.join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .where(col("supp_nation") =!= col("cust_nation"))
        .groupBy(
          col("supp_nation"), col("cust_nation"),
          date_format(col("l_shipdate"), "yyyy").as("l_year"))
        .agg(sum(discPriceE4).as("revenue_e4"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // TPC-H Q8 market share: NATION_3 suppliers' share of ECONOMY-part
    // revenue sold into AMERICA, per order year. Both sums come from ONE
    // aggregate pass (conditional sum over the supplier-nation name);
    // share = exact-long ratio with one double division. Five dims
    // (part-filtered, supplier, both nations, region) broadcast; only
    // lineitem ⨝ orders ⨝ customer shuffle.
    "q90_tpch_market_share" -> { (s, dir) =>
      val n1 = t(s, dir, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = t(s, dir, "nation")
        .select(col("n_nationkey").as("c_nk"), col("n_regionkey").as("c_rk"))
      val part = t(s, dir, "part")
        .where(col("p_type") === "ECONOMY").select("p_partkey")
      val reg = t(s, dir, "region")
        .where(col("r_name") === "AMERICA").select("r_regionkey")
      val ord = t(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
               col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      t(s, dir, "lineitem")
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .join(broadcast(reg), col("c_rk") === col("r_regionkey"))
        .groupBy(date_format(col("o_orderdate"), "yyyy").as("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_3", discPriceE4).otherwise(lit(0L)))
            .as("nation_e4"),
          sum(discPriceE4).as("total_e4"))
        .withColumn(
          "mkt_share",
          round(col("nation_e4").cast("double") / col("total_e4"), 6))
        .orderBy("o_year")
    },

    // TPC-H Q12 shape: orders ⨝ lineitem with TWO conditional counts in
    // one aggregate pass — high- vs low-priority line counts per return
    // class for a one-year ship window (the fixture has no l_shipmode, so
    // l_returnflag is the grouping stand-in; the shape — join, then
    // bucket the JOINED-IN column under a CASE — is Q12's). Scale: the
    // date window is a raw-column parquet pushdown on the fact scan, the
    // join shuffles once on orderkey, and the conditional sums collapse
    // map-side to 3 groups — the exchange after the join moves rows
    // proportional to tasks, not lineitems.
    "q94_tpch_shipmode" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
               col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select("l_orderkey", "l_returnflag")
      val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t(s, dir, "orders").select("o_orderkey", "o_orderpriority")
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
          sum(when(isHigh, lit(1L)).otherwise(lit(0L))).as("high_line_count"),
          sum(when(isHigh, lit(0L)).otherwise(lit(1L))).as("low_line_count"))
        .orderBy("l_returnflag")
    },

    // TPC-H Q16 shape: NOT IN (subquery) — the one subquery-join class
    // the suite hadn't covered. NOT IN has three-valued-logic semantics
    // (a NULL anywhere in the subquery output empties the result), so
    // Catalyst CANNOT use a plain LeftAnti: it plans a null-aware anti
    // join — BroadcastHashJoin ... LeftAnti ... isNullAwareAntiJoin=true
    // for this single-column case (PlanSpec pins it). Scale: NAAJ
    // REQUIRES broadcasting the exclusion set (a shuffle anti join can't
    // check the null-existence condition locally), which is exactly right
    // here — the blocklist is a filtered dim — but means a HUGE NOT IN
    // side should be rewritten as NOT EXISTS (shuffle-able LeftAnti,
    // cf. q78/q88) once it outgrows the broadcast threshold; the
    // distinct-count aggregate is partial+final on (brand, type, size).
    "q95_tpch_supplier_cnt" -> { (s, dir) =>
      val li = s"parquet.`$dir/lineitem.parquet`"
      val part = s"parquet.`$dir/part.parquet`"
      val supp = s"parquet.`$dir/supplier.parquet`"
      s.sql(
        s"""SELECT p_brand, p_type, p_size,
           |       count(DISTINCT l_suppkey) AS supplier_cnt
           |FROM $li JOIN $part ON l_partkey = p_partkey
           |WHERE p_brand <> 'Brand#1'
           |  AND p_size IN (1, 4, 7, 10, 13)
           |  AND l_suppkey NOT IN (SELECT s_suppkey FROM $supp
           |                        WHERE s_acctbal < 1000)
           |GROUP BY p_brand, p_type, p_size
           |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)
    },

    // TPC-H Q9 shape: product-type profit per supplier nation per order
    // year — the widest remaining classic (5-table join, measure built
    // from MULTIPLE tables' columns: lineitem price/discount/quantity x
    // part cost). The fixture has no partsupp, so unit cost is proxied
    // as 80% of p_retailprice; the shape — revenue minus a joined-in
    // per-part cost, aggregated by two dims — is Q9's. Exact-integer
    // discipline: profit_e4 = disc_price_e4 - retail_cents*80*qty, every
    // term an exact integer in 1e-4 dollars (cents x 80 = 0.8x price in
    // e4 units; quantities are integral). Scale: part/supplier/nation
    // broadcast (name-filtered part prunes first), lineitem ⨝ orders
    // shuffle on orderkey, aggregate is partial+final on (nation, year).
    "q100_tpch_profit" -> { (s, dir) =>
      val part = t(s, dir, "part")
        .where(col("p_name").contains("red")) // Q9's '%green%' substring filter
        .select(col("p_partkey"), round(col("p_retailprice") * 100).as("retail_cents"))
      val nat = t(s, dir, "nation").select(
        col("n_nationkey").as("s_nk"), col("n_name").as("nation"))
      val profitE4 = discPriceE4 -
        (col("retail_cents") * lit(80) * round(col("l_quantity"))).cast("long")
      t(s, dir, "lineitem")
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .join(broadcast(t(s, dir, "supplier").select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("s_nk"))
        .join(t(s, dir, "orders").select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("nation"), date_format(col("o_orderdate"), "yyyy").as("o_year"))
        .agg(sum(profitE4).as("profit_e4"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // TPC-H Q20 shape — the last of the 22: IN (subquery) nesting
    // ANOTHER IN plus a correlated scalar threshold inside HAVING
    // ("suppliers who shipped >20% of some red part's total volume",
    // standing in for Q20's availqty > half-of-shipped gate; the
    // fixtures have no partsupp). The decorrelation stack is Q20's:
    // inner IN → semi join on partkey; the HAVING subquery correlates
    // on the GROUP KEY (l_partkey), so Catalyst pulls it out as one
    // per-part aggregate joined back — never a per-group probe; the
    // outer IN → semi join on suppkey. Exact-integer share gate
    // (sum*5 > total) — no float boundary. Scale: two lineitem
    // aggregates (per supplier-part, per part), both partial+final;
    // part dim broadcasts; supplier never widens the fact rows.
    "q102_tpch_dominant_supplier" -> { (s, dir) =>
      val li = s"parquet.`$dir/lineitem.parquet`"
      val part = s"parquet.`$dir/part.parquet`"
      val supp = s"parquet.`$dir/supplier.parquet`"
      s.sql(
        s"""SELECT s_suppkey, s_name
           |FROM $supp
           |WHERE s_suppkey IN (
           |  SELECT l_suppkey FROM $li l1
           |  WHERE l_partkey IN (SELECT p_partkey FROM $part
           |                      WHERE p_name LIKE '%red%')
           |  GROUP BY l_suppkey, l_partkey
           |  HAVING sum(CAST(round(l_quantity) AS BIGINT)) * 5 >
           |         (SELECT sum(CAST(round(l2.l_quantity) AS BIGINT))
           |          FROM $li l2 WHERE l2.l_partkey = l1.l_partkey))
           |ORDER BY s_suppkey""".stripMargin)
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q68_tpch_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
        |       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        |       CAST(sum(CAST(round(l_extendedprice*100) * round((1-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_e4,
        |       CAST(sum(CAST(round(l_extendedprice*100) * round((1-l_discount)*100) * round((1+l_tax)*100) AS BIGINT)) AS BIGINT) AS sum_charge_e6,
        |       count(*) AS cnt,
        |       round(CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE) / count(*), 6) AS avg_qty,
        |       round(CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE) / (count(*) * 100), 6) AS avg_price
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q69_tpch_shipprio" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date,
        |       CAST(sum(CAST(round(l_extendedprice*100) * round((1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_e4
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate  > TIMESTAMP '1998-03-15'
        |GROUP BY l_orderkey, o_date
        |ORDER BY revenue_e4 DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q70_tpch_local_volume" ->
      """SELECT n_name,
        |       CAST(sum(CAST(round(l_extendedprice*100) * round((1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_e4
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01'
        |GROUP BY n_name
        |ORDER BY revenue_e4 DESC, n_name""".stripMargin,
    "q71_tpch_discount_rev" ->
      """SELECT CAST(sum(CAST(round(l_extendedprice*100) * round(l_discount*100) AS BIGINT)) AS BIGINT) AS revenue_e4
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.045 AND 0.075
        |  AND l_quantity < 24""".stripMargin,
    "q72_tpch_returns" ->
      """SELECT c_custkey, c_name,
        |       CAST(round(c_acctbal*100) AS BIGINT) AS acctbal_cents, n_name,
        |       CAST(sum(CAST(round(l_extendedprice*100) * round((1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_e4
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1998-01-01'
        |  AND o_orderdate <  TIMESTAMP '1998-04-01'
        |GROUP BY c_custkey, c_name, acctbal_cents, n_name
        |ORDER BY revenue_e4 DESC, c_custkey
        |LIMIT 20""".stripMargin,
    "q73_tpch_big_orders" ->
      """SELECT c_name, c_custkey, o_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d') AS o_date,
        |       CAST(round(o_totalprice*100) AS BIGINT) AS totalprice_cents,
        |       CAST(big.sum_qty AS BIGINT) AS sum_qty
        |FROM (SELECT l_orderkey, sum(CAST(round(l_quantity) AS BIGINT)) AS sum_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 300) big
        |JOIN orders   ON big.l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY totalprice_cents DESC, o_orderkey
        |LIMIT 100""".stripMargin,
    "q74_tpch_custdist" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |      FROM customer LEFT OUTER JOIN orders
        |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |      GROUP BY c_custkey) dist
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q75_tpch_small_qty" ->
      """SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |         AS lost_cents,
        |       count(*) AS cnt
        |FROM lineitem l1
        |WHERE l1.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
        |                       FROM lineitem l2
        |                       WHERE l2.l_partkey = l1.l_partkey)""".stripMargin,
    "q76_full_outer_days" ->
      """SELECT coalesce(d_ord, d_ship) AS day,
        |       CAST(coalesce(ord_cnt, 0) AS BIGINT) AS n_ord,
        |       CAST(coalesce(ship_cnt, 0) AS BIGINT) AS n_ship
        |FROM (SELECT strftime(o_orderdate, '%Y-%m-%d') AS d_ord,
        |             count(*) AS ord_cnt
        |      FROM orders GROUP BY 1) o
        |FULL OUTER JOIN
        |     (SELECT strftime(l_shipdate, '%Y-%m-%d') AS d_ship,
        |             count(*) AS ship_cnt
        |      FROM lineitem GROUP BY 1) l
        |ON d_ord = d_ship
        |ORDER BY day""".stripMargin,
    "q77_tpch_waiting_orders" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1997-07-01'
        |  AND o.o_orderdate <  TIMESTAMP '1997-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q78_tpch_sole_blame" ->
      """SELECT s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN orders o ON o.o_orderkey = l1.l_orderkey
        |             AND o.o_orderstatus = 'F'
        |JOIN supplier s ON s.s_suppkey = l1.l_suppkey
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin,
    "q79_tpch_region_best_supplier" ->
      """SELECT r_name, n_name, s_name,
        |       CAST(round(s_acctbal * 100) AS BIGINT) AS acctbal_cents
        |FROM supplier s
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE s.s_acctbal = (SELECT max(s2.s_acctbal)
        |                     FROM supplier s2
        |                     JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        |                     WHERE n2.n_regionkey = r.r_regionkey)
        |ORDER BY r_name, s_name""".stripMargin,
    "q80_tpch_brand_share" ->
      """SELECT p_brand,
        |       CAST(sum(CAST(round(l_extendedprice*100) * round((1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_e4
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |HAVING sum(CAST(round(l_extendedprice*100) * round((1-l_discount)*100) AS BIGINT)) * 25 >
        |       (SELECT sum(CAST(round(l_extendedprice*100) * round((1-l_discount)*100) AS BIGINT)) FROM lineitem)
        |ORDER BY revenue_e4 DESC, p_brand""".stripMargin,
    "q85_tpch_promo_share" ->
      """SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
        |                     THEN CAST(round(l_extendedprice*100) * round((1-l_discount)*100) AS BIGINT)
        |                     ELSE 0 END) AS BIGINT) AS promo_e4,
        |       CAST(sum(CAST(round(l_extendedprice*100) * round((1-l_discount)*100) AS BIGINT)) AS BIGINT) AS total_e4,
        |       round(CAST(sum(CASE WHEN p_type = 'PROMO'
        |                           THEN CAST(round(l_extendedprice*100) * round((1-l_discount)*100) AS BIGINT)
        |                           ELSE 0 END) AS DOUBLE) * 100
        |             / sum(CAST(round(l_extendedprice*100) * round((1-l_discount)*100) AS BIGINT)), 6) AS promo_share_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-09-01'
        |  AND l_shipdate <  TIMESTAMP '1997-10-01'""".stripMargin,
    "q86_tpch_top_supplier" ->
      """WITH revenue AS (
        |  SELECT l_suppkey,
        |         CAST(sum(CAST(round(l_extendedprice*100) * round((1-l_discount)*100) AS BIGINT)) AS BIGINT) AS total_e4
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate <  TIMESTAMP '1997-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_e4
        |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
        |WHERE total_e4 = (SELECT max(total_e4) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,
    "q87_tpch_disjunctive" ->
      """SELECT CAST(sum(CAST(round(l_extendedprice*100) * round((1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_e4,
        |       count(*) AS cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1  AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q88_tpch_idle_rich" ->
      """WITH pos AS (
        |  SELECT CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS s,
        |         count(*) AS n
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT c_nationkey, count(*) AS numcust,
        |       CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS totacctbal_cents
        |FROM customer c, pos
        |WHERE CAST(round(c_acctbal*100) AS BIGINT) * pos.n > pos.s
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '1-URGENT'
        |                    AND o.o_orderdate >= TIMESTAMP '1998-01-01')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q89_tpch_nation_volume" ->
      """SELECT supp_nation, cust_nation, l_year,
        |       CAST(sum(e4) AS BIGINT) AS revenue_e4
        |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |             strftime(l_shipdate, '%Y') AS l_year,
        |             CAST(round(l_extendedprice*100) * round((1-l_discount)*100) AS BIGINT) AS e4
        |      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
        |      JOIN orders ON o_orderkey = l_orderkey
        |      JOIN customer ON c_custkey = o_custkey
        |      JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |      JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |        AND l_shipdate >= TIMESTAMP '1996-01-01'
        |        AND l_shipdate <  TIMESTAMP '1998-01-01') sub
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q90_tpch_market_share" ->
      """SELECT o_year,
        |       CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN e4 ELSE 0 END) AS BIGINT) AS nation_e4,
        |       CAST(sum(e4) AS BIGINT) AS total_e4,
        |       round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN e4 ELSE 0 END) AS DOUBLE)
        |             / sum(e4), 6) AS mkt_share
        |FROM (SELECT strftime(o_orderdate, '%Y') AS o_year,
        |             CAST(round(l_extendedprice*100) * round((1-l_discount)*100) AS BIGINT) AS e4,
        |             n1.n_name AS supp_nation
        |      FROM part JOIN lineitem ON p_partkey = l_partkey
        |      JOIN supplier ON s_suppkey = l_suppkey
        |      JOIN orders ON l_orderkey = o_orderkey
        |      JOIN customer ON o_custkey = c_custkey
        |      JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |      JOIN region ON n2.n_regionkey = r_regionkey
        |      JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        |        AND o_orderdate >= TIMESTAMP '1996-01-01'
        |        AND o_orderdate <  TIMESTAMP '1998-01-01') sub
        |GROUP BY o_year ORDER BY o_year""".stripMargin,
    "q94_tpch_shipmode" ->
      """SELECT l_returnflag,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q95_tpch_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size,
        |       count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1'
        |  AND p_size IN (1, 4, 7, 10, 13)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_acctbal < 1000)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q100_tpch_profit" ->
      """SELECT n_name AS nation, strftime(o_orderdate, '%Y') AS o_year,
        |       CAST(sum(CAST(round(l_extendedprice*100) * round((1-l_discount)*100) AS BIGINT)
        |                - CAST(round(p_retailprice*100) * 80 * round(l_quantity) AS BIGINT)) AS BIGINT) AS profit_e4
        |FROM lineitem
        |JOIN part     ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN orders   ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY n_name, o_year
        |ORDER BY n_name, o_year DESC""".stripMargin,
    "q102_tpch_dominant_supplier" ->
      """SELECT s_suppkey, s_name
        |FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem l1
        |  WHERE l_partkey IN (SELECT p_partkey FROM part
        |                      WHERE p_name LIKE '%red%')
        |  GROUP BY l_suppkey, l_partkey
        |  HAVING sum(CAST(round(l_quantity) AS BIGINT)) * 5 >
        |         (SELECT sum(CAST(round(l2.l_quantity) AS BIGINT))
        |          FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey))
        |ORDER BY s_suppkey""".stripMargin
  )
}
