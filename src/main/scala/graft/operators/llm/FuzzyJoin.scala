package graft.operators.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance-<=1 fuzzy self-join via deletion neighborhoods (the
  * SymSpell scheme): two strings x, y with levenshtein(x, y) <= 1 ALWAYS
  * share an element of {s} ∪ single-deletions(s), so candidate
  * generation is COMPLETE — recall 1.0 by construction, unlike
  * probabilistic LSH banding — and exact levenshtein verification inside
  * the variant join keeps only true pairs. The record-linkage face of
  * the dedup family (near-identical titles, URLs, names).
  *
  * Scale shape follows [[Similarity.embeddingNearDups]]: EXACT-duplicate
  * strings are collapsed to one representative before the variant join
  * (identical strings share every variant — a clique of k would cost k^2
  * in-bucket candidates), intra-clique pairs (distance 0) come from
  * output-sized expansion, and the short string rides the explode so
  * verification runs inside the join stage. Variant fan-out is
  * length+1 rows per DISTINCT string; `maxBucketSize` guards degenerate
  * variant pile-ups (dropping a bucket sacrifices the recall guarantee —
  * it engages only when 10k+ distinct strings sit one edit from a common
  * variant).
  *
  * Returns (id_a, id_b, dist) with id_a < id_b and dist in {0, 1}.
  */
object FuzzyJoin {

  def editDistance1Pairs(
      df: DataFrame,
      strCol: String,
      idCol: String,
      maxBucketSize: Int = 10000): DataFrame = {
    val grouped = graft.engine.ManagedCache.persist(
      df.select(col(idCol).as("__id"), col(strCol).as("__s"))
        .groupBy("__s")
        .agg(min(col("__id")).as("__rep"), sort_array(collect_list(col("__id"))).as("__ids")))

    // intra-clique pairs: identical strings are distance-0 pairs
    val intra = grouped.where(size(col("__ids")) > 1)
      .select(explode(
        flatten(transform(
          sequence(lit(0), size(col("__ids")) - 2),
          i => transform(
            slice(col("__ids"), i + 2, size(col("__ids"))),
            b => struct(element_at(col("__ids"), i + 1).as("id_a"), b.as("id_b"))))))
        .as("__p"))
      .select(col("__p.id_a"), col("__p.id_b"), lit(0).as("dist"))

    // deletion neighborhood: the string itself + each single-deletion
    val variants = expr(
      """array_distinct(concat(
        |  array(__s),
        |  CASE WHEN length(__s) >= 1
        |       THEN transform(sequence(1, length(__s)),
        |                      i -> concat(substr(__s, 1, i - 1), substr(__s, i + 1)))
        |       ELSE array(__s) END))""".stripMargin)
    val banded = graft.engine.ManagedCache.persist(
      grouped.select(col("__rep"), col("__ids"), col("__s"),
        explode(variants).as("__v")))
    val sized = banded.groupBy("__v").agg(count(lit(1)).as("__n"))
      .where(col("__n") <= maxBucketSize)
      .select("__v")
    val kept = banded.join(sized, Seq("__v"))

    val cross = kept.as("a")
      .join(kept.as("b"),
        col("a.__v") === col("b.__v") && col("a.__rep") < col("b.__rep"))
      .select(
        col("a.__ids").as("__as"), col("b.__ids").as("__bs"),
        levenshtein(col("a.__s"), col("b.__s")).as("dist"))
      .where(col("dist") <= 1) // verify-in-join: cut before any re-shuffle
      .distinct()
      .select(explode(col("__as")).as("__ia"), col("__bs"), col("dist"))
      .select(col("__ia"), explode(col("__bs")).as("__ib"), col("dist"))
      .select(
        least(col("__ia"), col("__ib")).as("id_a"),
        greatest(col("__ia"), col("__ib")).as("id_b"),
        col("dist"))

    intra.unionByName(cross)
  }
}
