package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.engine.SparkEngine
import graft.operators.LakeTable

/** Property check for the correlated-DML lift: for RANDOM conditions
  * mixing correlated EXISTS / NOT EXISTS / IN / scalar-compare leaves
  * under AND/OR (over data with NULL outer values and NULL dim cells),
  * `DELETE FROM t WHERE cond` must leave exactly the rows where Spark's
  * own SELECT-context planning says `cond IS NOT TRUE` — i.e. the lift
  * (NNF + staged membership + null-safe splice) agrees with native
  * decorrelation on three-valued truth, row for row. Case count is kept
  * small: every case is a fresh lake table plus a transactional DELETE.
  */
object CorrelatedDmlProps extends Properties("graft.correlatedDml") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = {
    val s = SparkEngine.session(
      master = "local[4]", appName = "graft-corr-props", shufflePartitions = 4)
    import s.implicits._
    // NULL v rows exercise the null-safe membership splice; NULL caps
    // exercise three-valued leaves
    (0L until 20L).map(k => (k, s"p${k % 2}",
      if (k % 5 == 4) Option.empty[Long] else Some((k * 37) % 23)))
      .toDF("k", "p", "v").createOrReplaceTempView("pbase")
    Seq((0L, Some(5L)), (1L, Option.empty[Long]), (2L, Some(17L)),
      (3L, Some(2L)), (4L, Option.empty[Long]), (5L, Some(40L)))
      .toDF("dk", "cap").createOrReplaceTempView("pdim")
    s
  }

  private val genLeaf: Gen[String] = Gen.oneOf(
    Gen.choose(2, 6).map(m =>
      s"EXISTS (SELECT 1 FROM pdim d WHERE d.dk = tt.k % $m AND d.cap > tt.v)"),
    Gen.choose(2, 6).map(m =>
      s"NOT EXISTS (SELECT 1 FROM pdim d WHERE d.dk = tt.k % $m AND d.cap IS NOT NULL)"),
    Gen.choose(2, 6).map(m =>
      s"tt.v IN (SELECT cap FROM pdim d WHERE d.dk = tt.k % $m)"),
    Gen.choose(2, 6).map(m =>
      s"tt.v < (SELECT max(cap) FROM pdim d WHERE d.dk <= tt.k % $m)"))

  private val genCond: Gen[String] = for {
    l1 <- genLeaf
    l2 <- genLeaf
    op <- Gen.oneOf("AND", "OR")
    m <- Gen.choose(2, 5)
  } yield s"($l1) $op (($l2) AND tt.k % $m = 0)"

  private var n = 0

  /** Correlated scalar ASSIGNMENT values: the staged per-tuple lookup
    * must agree with Spark's native per-row evaluation — including the
    * no-match-goes-NULL and NULL-outer-column tuples.
    */
  private val genValue: Gen[String] = Gen.oneOf(
    Gen.choose(2, 6).map(m =>
      s"(SELECT max(cap) FROM pdim d WHERE d.dk = tt.k % $m)"),
    Gen.choose(2, 6).map(m =>
      s"tt.k + (SELECT count(*) FROM pdim d WHERE d.dk <= tt.k % $m AND d.cap IS NOT NULL)"),
    Gen.choose(2, 6).map(m =>
      s"(SELECT sum(cap) FROM pdim d WHERE d.dk = tt.k % $m AND d.cap > tt.v)"))

  property("UPDATE SET <correlated scalar> == native per-row evaluation") =
    forAll(genValue, genLeaf) { (value, cond) =>
      val s = spark
      n += 1
      val root = java.nio.file.Files.createTempDirectory(s"graft-corr-set$n").toString + "/t"
      LakeTable.init(s, root, s.table("pbase"), partitionCol = "p", statsCols = Seq("k"))
      s.sql(s"UPDATE graft.`$root` tt SET v = $value WHERE $cond")
      val got = s.sql(s"SELECT k, v FROM graft.`$root`")
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      val expected = s.sql(
        s"SELECT k, CASE WHEN ($cond) THEN CAST(($value) AS BIGINT) ELSE v END AS v " +
          "FROM pbase tt")
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      if (got != expected)
        println(s"value: $value\ncond: $cond\n" +
          s"diff: ${(got.toSet diff expected.toSet) ++ (expected.toSet diff got.toSet)}")
      got == expected
    }

  property("DELETE WHERE <correlated cond> == rows where cond IS NOT TRUE") =
    forAll(genCond) { cond =>
      val s = spark
      n += 1
      val root = java.nio.file.Files.createTempDirectory(s"graft-corr-prop$n").toString + "/t"
      LakeTable.init(s, root, s.table("pbase"), partitionCol = "p", statsCols = Seq("k"))
      s.sql(s"DELETE FROM graft.`$root` tt WHERE $cond")
      val got = s.sql(s"SELECT k FROM graft.`$root`")
        .collect().map(_.getLong(0)).toSet
      val expected = s.sql(s"SELECT k FROM pbase tt WHERE ($cond) IS NOT TRUE")
        .collect().map(_.getLong(0)).toSet
      if (got != expected)
        println(s"cond: $cond\nextra: ${got -- expected}\nmissing: ${expected -- got}")
      got == expected
    }
}
