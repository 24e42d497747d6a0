package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.Sources

/** The ten reference queries (SURVEY.md §2a, labs 2-11) re-expressed over
  * the driver's TPC-H-ish parquet fixtures, each paired with the ANSI SQL
  * the DuckDB oracle runs on the same tables.
  *
  * Conventions shared with the oracle (and required by the driver's
  * hash-compare):
  *   - every computed column is aliased identically on both sides;
  *   - output is deterministically ordered (ORDER BY on both sides);
  *   - group keys derived from timestamps are formatted to strings, and
  *     the session time zone is pinned to UTC in the query path
  *     (SparkEntry aligns the session) so they can't drift from the
  *     timezone-naive DuckDB oracle;
  *   - order-dependent floating-point accumulation (double SUM) is
  *     avoided in hash-compared outputs — aggregate integers, or max/min
  *     which are order-independent.
  */
object LabQueries {

  private def t(s: SparkSession, dir: String, name: String) = Sources.table(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // lab2 WordCount (lab2/WordCount.sh:85-105): token frequency, here over
    // documents.text. explode+split is the Generator form of the tokenizing
    // mapper; the combiner (:114) is Catalyst's partial HashAggregate.
    "q02_wordcount" -> { (s, dir) =>
      t(s, dir, "documents")
        .transform(TextOps.wordCount(col("text")))
        .orderBy("word")
    },

    // lab3 HighestTemperature (lab3:105-109): max per group.
    "q03_groupmax" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .transform(AggOps.groupMax(col("l_returnflag"), col("l_extendedprice"), "max_price"))
        .orderBy("l_returnflag")
    },

    // lab4 StudentGrades (lab4:91-118): CASE WHEN ladder + grouped sorted
    // list-agg (canonicalized per SURVEY.md S6).
    "q04_grades" -> { (s, dir) =>
      t(s, dir, "customer")
        .withColumn(
          "graded",
          concat(
            col("c_name"),
            lit(":"),
            Classify.ladder(
              col("c_acctbal"),
              Seq(7500.0 -> "A", 5000.0 -> "B", 2500.0 -> "C", 0.0 -> "D"),
              otherwise = "F")))
        .transform(AggOps.listAgg(col("c_nationkey"), col("graded"), as = "grades"))
        .orderBy("c_nationkey")
    },

    // lab5 MatrixMultiplication (lab5:88-128): the replicate-join expressed
    // as a real join + grouped dot product; K is arbitrary, values integer.
    // Join-key cardinality 256 (suppkey/custkey-derived, not the 25-value
    // nationkey) so the shuffle join is non-degenerate and AQE has real
    // partitions to balance.
    "q05_matmul" -> { (s, dir) =>
      val a = t(s, dir, "supplier").select(
        (col("s_suppkey") % 32).as("row"),
        (col("s_suppkey") % 256).cast("long").as("col"),
        (col("s_suppkey") % 97).as("val"))
      val b = t(s, dir, "customer").select(
        (col("c_custkey") % 256).cast("long").as("row"),
        (col("c_custkey") % 32).as("col"),
        (col("c_custkey") % 89).as("val"))
      CooMatMul(a, b).orderBy("i", "j")
    },

    // lab6 MaxElectricityConsumption (lab6:93-96,107-113): row-wise max
    // across columns, then max per group.
    "q06_rowmax" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .select(
          col("l_returnflag"),
          AggOps
            .rowwiseMax(Seq(col("l_quantity"), col("l_discount") * 100, col("l_tax") * 100))
            .as("m"))
        .groupBy("l_returnflag")
        .agg(max(col("m")).as("max_m"))
        .orderBy("l_returnflag")
    },

    // lab7 WeatherAnalyzer (lab7:92): stateless binary classification —
    // pure projection, one codegen stage + the final order.
    "q07_classify" -> { (s, dir) =>
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          Classify.binary(col("o_totalprice"), 100000.0, "Shiny", "Cool").as("label"))
        .orderBy("o_orderkey")
    },

    // lab8 ProductSalesAnalyzer (lab8:98-103): count per group.
    "q08_groupcount" -> { (s, dir) =>
      t(s, dir, "orders")
        .transform(AggOps.groupCount(col("o_orderpriority")))
        .orderBy("o_orderpriority")
    },

    // lab9 MovieTagsAnalyzer (lab9:88-93): grouped list-agg after a join;
    // region is tiny -> broadcast-hash join, no shuffle of nation.
    "q09_listagg" -> { (s, dir) =>
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .transform(AggOps.listAgg(col("r_name"), col("n_name"), as = "nations"))
        .orderBy("r_name")
    },

    // lab10 BookPublicationFrequency (lab10:94-98): count per year.
    "q10_yearcount" -> { (s, dir) =>
      t(s, dir, "orders")
        .select(year(col("o_orderdate")).as("yr"))
        .groupBy("yr")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("yr")
    },

    // lab11 UberTripAnalyzer (lab11:100-109): per-group argmax with
    // deterministic tie-break (smallest key wins; the reference's
    // first-seen-wins is input-order-dependent — SURVEY.md S6).
    // max_by form: partial-aggregates map-side, shuffling one candidate
    // per (day x partition) instead of every order row.
    "q11_argmax" -> { (s, dir) =>
      t(s, dir, "orders")
        .withColumn("d", date_format(col("o_orderdate"), "yyyy-MM-dd"))
        .transform(AggOps.argMax(Seq("d"), "o_totalprice", Seq("o_custkey")))
        .select(col("d"), col("o_custkey").as("top_cust"), col("o_totalprice").as("top_price"))
        .orderBy("d")
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q02_wordcount" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(string_split_regex(text, '\s+')) AS word FROM documents) t
        |WHERE length(word) > 0
        |GROUP BY word ORDER BY word""".stripMargin,
    "q03_groupmax" ->
      """SELECT l_returnflag, max(l_extendedprice) AS max_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q04_grades" ->
      """SELECT c_nationkey, string_agg(graded, ', ' ORDER BY graded) AS grades
        |FROM (SELECT c_nationkey, c_name || ':' ||
        |        CASE WHEN c_acctbal >= 7500 THEN 'A'
        |             WHEN c_acctbal >= 5000 THEN 'B'
        |             WHEN c_acctbal >= 2500 THEN 'C'
        |             WHEN c_acctbal >= 0    THEN 'D'
        |             ELSE 'F' END AS graded
        |      FROM customer) t
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q05_matmul" ->
      """SELECT i, j, CAST(sum(va * vb) AS BIGINT) AS val
        |FROM (SELECT s_suppkey % 32 AS i, s_suppkey % 256 AS k, s_suppkey % 97 AS va
        |      FROM supplier) a
        |JOIN (SELECT c_custkey % 256 AS k, c_custkey % 32 AS j, c_custkey % 89 AS vb
        |      FROM customer) b USING (k)
        |GROUP BY i, j ORDER BY i, j""".stripMargin,
    "q06_rowmax" ->
      """SELECT l_returnflag,
        |       max(greatest(l_quantity, l_discount * 100, l_tax * 100)) AS max_m
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q07_classify" ->
      """SELECT o_orderkey,
        |       CASE WHEN o_totalprice >= 100000 THEN 'Shiny' ELSE 'Cool' END AS label
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q08_groupcount" ->
      """SELECT o_orderpriority, count(*) AS cnt
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q09_listagg" ->
      """SELECT r_name, string_agg(n_name, ', ' ORDER BY n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q10_yearcount" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, count(*) AS cnt
        |FROM orders GROUP BY yr ORDER BY yr""".stripMargin,
    "q11_argmax" ->
      """SELECT strftime(o_orderdate, '%Y-%m-%d') AS d,
        |       o_custkey AS top_cust, o_totalprice AS top_price
        |FROM orders
        |QUALIFY row_number() OVER (
        |  PARTITION BY strftime(o_orderdate, '%Y-%m-%d')
        |  ORDER BY o_totalprice DESC, o_custkey) = 1
        |ORDER BY d""".stripMargin
  )
}
