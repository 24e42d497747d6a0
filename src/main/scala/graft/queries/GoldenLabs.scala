package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators._
import graft.sources.Sources

/** The ten reference labs run EXACTLY as the reference runs them: over the
  * reference's own raw text datasets, through the schema-on-read sources
  * (S4 skip-don't-fail, S5 header heuristics), producing rows whose
  * `KvTextSink.lines` rendering reproduces the reference's sorted
  * `part-r-00000` byte-for-byte (modulo the documented S6 canonicalization:
  * list-aggs sorted, argmax ties to smallest witness).
  *
  * This is the migration surface: a user of `BiswajitHemram/hadoop-lab`
  * points each function at the same input file their lab script consumed
  * and gets the same output — no HDFS staging, no job compilation.
  *
  * Each function cites the embedded-Java semantics it reproduces.
  */
object GoldenLabs {

  private def str(n: String) = StructField(n, StringType)
  private def int(n: String) = StructField(n, IntegerType)

  /** lab2 WordCount (lab2/WordCount.sh:85-105): whitespace-token frequency.
    * StringTokenizer ≡ split("\\s+") + explode; the combiner (:114) is the
    * automatic partial HashAggregate.
    */
  def lab2(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path).transform(TextOps.wordCount(col("value")))

  /** lab3 HighestTemperature (lab3/HighestTemperature.sh:83-109): max temp
    * per year. Exact arity 2 (:85) and the parseInt catch (:87-92) — the
    * BOM'd `Year Temperature` header dies via the parse guard, like the
    * reference.
    */
  def lab3(spark: SparkSession, path: String): DataFrame =
    Sources
      .whitespace(spark, path, StructType(Seq(str("year"), int("temp"))))
      .transform(AggOps.groupMax(col("year"), col("temp"), as = "max_temp"))

  /** lab4 StudentGrades (lab4/StudentGrades.sh:78-118): grade ladder at
    * 90/80/70/60 (:91-103), then per-student `subject:grade` list
    * (canonically sorted — the reference's reduce order is unspecified, S6).
    */
  def lab4(spark: SparkSession, path: String): DataFrame =
    Sources
      .delimited(spark, path, ",", StructType(Seq(str("student"), str("subject"), int("marks"))))
      .withColumn(
        "graded",
        concat(
          col("subject"),
          lit(":"),
          Classify.ladder(
            col("marks"),
            Seq(90.0 -> "A", 80.0 -> "B", 70.0 -> "C", 60.0 -> "D"),
            otherwise = "F")))
      .transform(AggOps.listAgg(col("student"), col("graded"), as = "grades"))

  /** lab5 MatrixMultiplication (lab5/MatrixMultiplication.sh:79-128): COO
    * `M,row,col,val` records tag-dispatched into A and B (:88-93), C = A×B.
    * The map-side replication with matrixK=2 hard-coded (:86) is the join
    * in [[CooMatMul]]; K is arbitrary here. Key rendered `i,j` like the
    * reference's output key (:91).
    */
  def lab5(spark: SparkSession, path: String): DataFrame = {
    val coo = Sources.delimited(
      spark,
      path,
      ",",
      StructType(Seq(str("m"), int("row"), int("col"), int("val"))),
      exactArity = false) // reference accepts >= 4 fields (lab5:79)
    val a = coo.where(col("m") === "A").select("row", "col", "val")
    val b = coo.where(col("m") === "B").select("row", "col", "val")
    CooMatMul(a, b).select(concat_ws(",", col("i"), col("j")).as("cell"), col("val"))
  }

  /** lab6 MaxElectricityConsumption (lab6/MaxElectricityConsumption.sh:84-113):
    * per-year max over the 12 monthly columns; the trailing `annual_avg`
    * double is excluded (:93 stops at length-1). Header dies via the month
    * casts (`jan` is not an int) — same effect as `equalsIgnoreCase("year")`
    * (:84).
    */
  def lab6(spark: SparkSession, path: String): DataFrame = {
    val months = Seq(
      "jan", "feb", "march", "april", "may", "june",
      "july", "august", "september", "october", "november", "december")
    val schema = StructType(str("year") +: months.map(int) :+ str("annual_avg"))
    Sources
      .whitespace(spark, path, schema)
      .select(col("year"), AggOps.rowwiseMax(months.map(col)).as("m"))
      .transform(AggOps.groupMax(col("year"), col("m"), as = "max_consumption"))
  }

  /** lab7 WeatherAnalyzer (lab7/WeatherAnalyzer.sh:79-96): classify each day
    * Shiny (maxTemp >= 30, :92) / Cool. MinTemp is ignored (relaxed arity);
    * the `Date MaxTemp MinTemp` header dies via the parse guard (:89-96).
    */
  def lab7(spark: SparkSession, path: String): DataFrame =
    Sources
      .delimited(
        spark,
        path,
        "\\s+",
        StructType(Seq(str("date"), int("maxtemp"))),
        exactArity = false)
      .select(col("date"), Classify.binary(col("maxtemp"), 30.0, "Shiny", "Cool").as("label"))

  /** lab8 ProductSalesAnalyzer (lab8/ProductSalesAnalyzer.sh:78-103):
    * transactions per country = fields[8], header dropped by the explicit
    * `startsWith("Transaction")` prefix test (:85 — the S5 heuristic,
    * needed here because every field parses as a valid string).
    */
  def lab8(spark: SparkSession, path: String): DataFrame =
    Sources
      .delimited(
        spark,
        path,
        ",",
        StructType((0 to 7).map(i => str(s"c$i")) :+ str("country")),
        exactArity = false)
      .where(!col("c0").startsWith("Transaction"))
      .transform(AggOps.groupCount(trim(col("country")).as("country")))

  /** lab9 MovieTagsAnalyzer (lab9/MovieTagsAnalyzer.sh:75-93): `::`-split
    * records, fields >= 3 (:76), tags per movieId comma-joined
    * (canonically sorted, S6).
    */
  def lab9(spark: SparkSession, path: String): DataFrame =
    Sources
      .delimited(
        spark,
        path,
        "::",
        StructType(Seq(str("f0"), str("movie"), str("tag"))),
        exactArity = false)
      .transform(AggOps.listAgg(trim(col("movie")).as("movie"), trim(col("tag")), as = "tags"))

  /** lab10 BookPublicationFrequency (lab10/BookPublicationFrequency.sh:79-98):
    * books per year = fields[3]; `startsWith("ISBN")` header test (:79).
    * Reproduces the reference's naive comma split (:82) — quote-aware CSV
    * would diverge on quoted titles (documented deviation, SURVEY.md §2a).
    */
  def lab10(spark: SparkSession, path: String): DataFrame =
    Sources
      .delimited(
        spark,
        path,
        ",",
        StructType((0 to 2).map(i => str(s"c$i")) :+ str("year")),
        exactArity = false)
      .where(!col("c0").startsWith("ISBN"))
      .transform(AggOps.groupCount(trim(col("year")).as("year")))

  /** lab11 UberTripAnalyzer (lab11/UberTripAnalyzer.sh:81-109): per date,
    * the dispatch base with the most trips plus that count; strict-max scan
    * (:105) canonicalized to smallest-base tie-break (S6). The window
    * variant is used because the tie-break witness is a string; the
    * dataset is per-day argmax so cardinality is tiny post-filter.
    */
  def lab11(spark: SparkSession, path: String): DataFrame =
    Sources
      .delimited(
        spark,
        path,
        ",",
        StructType(Seq(str("base"), str("date"), str("vehicles"), int("trips"))),
        exactArity = false)
      .transform(AggOps.argMaxWindow(Seq(col("date")), col("trips"), Seq(col("base"))))
      .select("date", "base", "trips")

  /** All ten labs, keyed by reference lab number, each `(spark, inputPath)
    * => DataFrame` whose KvTextSink rendering matches the reference run.
    */
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lab2" -> (lab2 _),
    "lab3" -> (lab3 _),
    "lab4" -> (lab4 _),
    "lab5" -> (lab5 _),
    "lab6" -> (lab6 _),
    "lab7" -> (lab7 _),
    "lab8" -> (lab8 _),
    "lab9" -> (lab9 _),
    "lab10" -> (lab10 _),
    "lab11" -> (lab11 _)
  )
}
