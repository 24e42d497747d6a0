package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tokenization / string-shaping operators (SURVEY.md §2b projection
  * family). All are `DataFrame => DataFrame` transforms usable via
  * `.transform(...)` and compile to pure Catalyst expressions (whole-stage
  * codegen'd, no UDFs).
  */
object TextOps {

  /** Whitespace tokenizer: one output row per non-empty token
    * (reference: the StringTokenizer mapper, lab2/WordCount.sh:85-89).
    * The explode is a Catalyst Generator — the map-side flatMap shape.
    */
  def tokenize(input: Column, as: String = "word"): DataFrame => DataFrame =
    df =>
      df.select(explode(split(input, "\\s+")).as(as))
        .where(length(col(as)) > 0)

  /** Word-count: tokenize then hash-aggregate. Catalyst plans this as
    * partial+final HashAggregate, i.e. the reference's combiner
    * (lab2/WordCount.sh:114) is automatic.
    */
  def wordCount(input: Column): DataFrame => DataFrame =
    df =>
      df.transform(tokenize(input))
        .groupBy("word")
        .agg(count(lit(1)).as("cnt"))
}

/** CASE WHEN ladder operators (lab4's grade thresholds, lab7's
  * Shiny/Cool classification).
  */
object Classify {

  /** Descending-threshold ladder: first (threshold, label) whose
    * `value >= threshold` wins; `otherwise` if none do. Mirrors
    * lab4/StudentGrades.sh:91-103 (90/80/70/60 -> A/B/C/D else F).
    */
  def ladder(value: Column, steps: Seq[(Double, String)], otherwise: String): Column = {
    val sorted = steps.sortBy(-_._1)
    sorted.tail
      .foldLeft(when(value >= sorted.head._1, sorted.head._2)) {
        case (acc, (t, label)) => acc.when(value >= t, label)
      }
      .otherwise(otherwise)
  }

  /** Binary classification (lab7/WeatherAnalyzer.sh:92: maxTemp >= 30 ?
    * "Shiny" : "Cool").
    */
  def binary(value: Column, threshold: Double, hi: String, lo: String): Column =
    when(value >= threshold, hi).otherwise(lo)
}
