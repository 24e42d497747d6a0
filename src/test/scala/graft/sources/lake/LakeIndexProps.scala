package graft.sources.lake

import scala.util.Random

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.operators.LakeTable
import graft.operators.LakeTable.{Entry, TableMeta}

/** Soundness property for the connector's manifest pruning: over random
  * file layouts and random pushed-down predicates, a file containing ANY
  * row the predicate matches is NEVER skipped. (Completeness — skipping
  * as much as possible — is pinned by GraftLakeSpec's scan-metric cases;
  * soundness is the side that silently corrupts results if it breaks,
  * so it gets the randomized law.) Pure metadata: rows are synthesized
  * first and each file's manifest stats are DERIVED from its rows
  * exactly as the writer derives them, so every generated layout is one
  * the write path could produce — including all-NULL stats columns and
  * the null-partition sentinel.
  */
class LakeIndexProps extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("p", IntegerType), StructField("k", LongType),
    StructField("s", StringType), StructField("w", LongType)))
  private val meta = TableMeta(schema, "p", Seq("k", "s"))

  private case class TRow(p: Option[Int], k: Option[Long], s: Option[String], w: Long)

  test("pruning soundness: a file containing any matching row is never skipped") {
    val rnd = new Random(20260814L)
    val pool = Vector("ant", "bee", "cat", "dog", "elk", "fox")
    var prunedSomething = 0
    (1 to 300).foreach { trial =>
      val nFiles = 3 + rnd.nextInt(8)
      val files = (0 until nFiles).map { i =>
        val pv = if (rnd.nextInt(6) == 0) None else Some(rnd.nextInt(5))
        val rows = Seq.fill(1 + rnd.nextInt(12))(TRow(
          pv,
          if (rnd.nextInt(8) == 0) None else Some(rnd.nextInt(1000).toLong),
          if (rnd.nextInt(8) == 0) None else Some(pool(rnd.nextInt(pool.size))),
          rnd.nextLong()))
        (mkEntry(i, pv, rows), rows)
      }
      val conjuncts = Seq.fill(1 + rnd.nextInt(3))(genPred(rnd, pool))
      val index = new LakeFileIndex(spark, "/graft-prop-nonexistent", meta, files.map(_._1))
      val kept = index.pruneEntries(conjuncts.map(_._1)).map(_.rel).toSet
      if (kept.size < files.size) prunedSomething += 1
      files.foreach { case (e, rows) =>
        val hasMatch = rows.exists(r => conjuncts.forall(_._2(r)))
        if (hasMatch) assert(kept.contains(e.rel),
          s"trial $trial: pruned a file containing a matching row " +
            s"(predicate: ${conjuncts.map(_._3).mkString(" AND ")})")
      }
    }
    assert(prunedSomething > 30, s"pruning engaged in only $prunedSomething trials — vacuous run")
  }

  test("canonical numeric equality law: canonNum equal iff cmpStat orders equal") {
    // the O(1) partition-IN membership replaces per-pair cmpStat calls
    // with canonical-form hashing — sound only if canonical equality and
    // cmpStat-equality coincide on every rendering pair the cast-to-string
    // space can produce (incl. -0.0, exponent forms, non-finites)
    val rnd = new Random(42L)
    val specials = Vector("-0.0", "0.0", "0", "0.00", "NaN", "Infinity", "-Infinity",
      "1e3", "1000", "1000.0", "007", "7", "9223372036854775808", "9223372036854775808.0")
    def rendering(): String = rnd.nextInt(4) match {
      case 0 => specials(rnd.nextInt(specials.size))
      case 1 => rnd.nextLong().toString
      case 2 => ((rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(7))).toString
      case _ => s"${rnd.nextInt(100)}.${rnd.nextInt(1000)}"
    }
    (1 to 5000).foreach { _ =>
      val (a, b) = (rendering(), rendering())
      val canonEq = LakeFileIndex.canonNum(a) == LakeFileIndex.canonNum(b)
      val statEq = LakeTable.cmpStat(DoubleType, a, b) == 0
      assert(canonEq === statEq,
        s"law broken for a=$a b=$b: canon(${LakeFileIndex.canonNum(a)}, " +
          s"${LakeFileIndex.canonNum(b)}) vs cmpStat=${LakeTable.cmpStat(DoubleType, a, b)}")
    }
  }

  /** Manifest entry with stats derived from the rows, writer-style:
    * native-typed min/max rendered to string, (None, None) when the
    * column is all-NULL in the file.
    */
  private def mkEntry(i: Int, pv: Option[Int], rows: Seq[TRow]): Entry = {
    def mm[T: Ordering](vs: Seq[T]): (Option[String], Option[String]) =
      if (vs.isEmpty) (None, None)
      else (Some(vs.min.toString), Some(vs.max.toString))
    Entry(
      pv.map(_.toString).getOrElse(LakeTable.NullPartition),
      s"data/batch-prop/f$i.parquet",
      Seq(mm(rows.flatMap(_.k)), mm(rows.flatMap(_.s))))
  }

  /** (pushed-down expression, row-level SQL semantics, description). */
  private def genPred(rnd: Random, pool: Vector[String]): (Expression, TRow => Boolean, String) = {
    val attrP = AttributeReference("p", IntegerType)()
    val attrK = AttributeReference("k", LongType)()
    val attrS = AttributeReference("s", StringType)()
    val attrW = AttributeReference("w", LongType)()
    def litI(v: Int) = Literal.create(v, IntegerType)
    def litL(v: Long) = Literal.create(v, LongType)
    def litS(v: String) = Literal.create(v, StringType)
    rnd.nextInt(11) match {
      case 0 =>
        val v = rnd.nextInt(6)
        (EqualTo(attrP, litI(v)), r => r.p.contains(v), s"p = $v")
      case 1 =>
        val v = rnd.nextInt(1200).toLong
        rnd.nextInt(4) match {
          case 0 => (LessThan(attrK, litL(v)), r => r.k.exists(_ < v), s"k < $v")
          case 1 => (LessThanOrEqual(attrK, litL(v)), r => r.k.exists(_ <= v), s"k <= $v")
          case 2 => (GreaterThan(attrK, litL(v)), r => r.k.exists(_ > v), s"k > $v")
          case _ => (GreaterThanOrEqual(attrK, litL(v)), r => r.k.exists(_ >= v), s"k >= $v")
        }
      case 2 =>
        val v = rnd.nextInt(1200).toLong
        (EqualTo(attrK, litL(v)), r => r.k.contains(v), s"k = $v")
      case 3 =>
        // flipped side: lit OP attr (the parser emits both orders)
        val v = rnd.nextInt(1200).toLong
        (GreaterThan(litL(v), attrK), r => r.k.exists(v > _), s"$v > k")
      case 4 =>
        val v = pool(rnd.nextInt(pool.size))
        (EqualTo(attrS, litS(v)), r => r.s.contains(v), s"s = $v")
      case 5 =>
        val v = pool(rnd.nextInt(pool.size))
        if (rnd.nextBoolean())
          (LessThanOrEqual(attrS, litS(v)), r => r.s.exists(_ <= v), s"s <= $v")
        else
          (GreaterThan(attrS, litS(v)), r => r.s.exists(_ > v), s"s > $v")
      case 6 =>
        val vs = Seq.fill(2 + rnd.nextInt(3))(rnd.nextInt(6))
        (In(attrP, vs.map(litI)), r => r.p.exists(vs.contains), s"p IN $vs")
      case 7 =>
        val vs = Seq.fill(2 + rnd.nextInt(3))(rnd.nextInt(1200).toLong)
        (In(attrK, vs.map(litL)), r => r.k.exists(vs.contains), s"k IN $vs")
      case 8 => (IsNull(attrP), r => r.p.isEmpty, "p IS NULL")
      case 9 => (IsNotNull(attrP), r => r.p.isDefined, "p IS NOT NULL")
      case _ =>
        // no-stats column: pruning must never engage, so any match law
        // holds trivially — this keeps the generator honest about
        // columns the index knows nothing about
        val v = rnd.nextLong()
        (EqualTo(attrW, litL(v)), r => r.w == v, s"w = $v")
    }
  }
}
