package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.engine.SparkEngine
import graft.operators.{AggOps, CooMatMul, KvTextSink, TextOps}
import org.apache.spark.sql.functions._

/** Property-based semantics checks (SURVEY.md §5.3): the distributed
  * operators agree with straightforward sequential folds on random input.
  * Case counts are kept small — every case is a real local Spark job.
  */
object EngineProps extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark =
    SparkEngine.session(master = "local[4]", appName = "graft-props", shufflePartitions = 4)

  private val dim = 4
  /** Sparse COO matrix as cell -> value (Map dedups coordinates, matching
    * CooMatMul's implicit duplicate-sum over unique cells).
    */
  private val genMatrix: Gen[Map[(Int, Int), Int]] =
    Gen.mapOf(for {
      i <- Gen.choose(0, dim - 1)
      j <- Gen.choose(0, dim - 1)
      v <- Gen.choose(-9, 9)
    } yield (i, j) -> v)

  property("CooMatMul == naive O(n^3) multiply (arbitrary K, lab5 generalized)") =
    forAll(genMatrix, genMatrix) { (a, b) =>
      import spark.implicits._
      val adf = a.toSeq.map { case ((i, j), v) => (i, j.toLong, v) }.toDF("row", "col", "val")
      val bdf = b.toSeq.map { case ((i, j), v) => (i.toLong, j, v) }.toDF("row", "col", "val")
      val got = CooMatMul(adf, bdf)
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      // naive: a cell exists iff some k contributes; its value may be 0
      val expected = (for {
        i <- 0 until dim; j <- 0 until dim
        ks = (0 until dim).filter(k => a.contains((i, k)) && b.contains((k, j)))
        if ks.nonEmpty
      } yield (i, j) -> ks.map(k => a((i, k)).toLong * b((k, j))).sum).toMap
      got == expected
    }

  private val genDoc: Gen[List[String]] =
    Gen.listOfN(8, Gen.oneOf("", "cat dog", "the cat", "a  b\tc", "dog"))

  property("wordCount == sequential token fold (lab2)") = forAll(genDoc) { docs =>
    import spark.implicits._
    val got = docs.toDF("text")
      .transform(TextOps.wordCount(col("text")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = docs.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    got == expected
  }

  property("KvTextSink output is globally sorted by key (S2)") =
    forAll(Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty))) { keys =>
      import spark.implicits._
      val lines = KvTextSink.collect(keys.zipWithIndex.toDF("k", "v"))
      val ks = lines.map(_.takeWhile(_ != '\t'))
      ks == ks.sorted
    }

  property("AsOfJoin == naive latest-at-or-before scan") = {
    val genRows = Gen.listOfN(30, for {
      k <- Gen.choose(0, 3); ts <- Gen.choose(0L, 50L)
    } yield (k, ts))
    forAll(genRows, genRows) { (lrows, rrows) =>
      import spark.implicits._
      // unique right (k, ts) so the winner is well-defined
      val rDedup = rrows.distinct.zipWithIndex.map { case ((k, ts), i) => (k, ts, i.toLong) }
      val l = lrows.zipWithIndex.map { case ((k, ts), i) => (i.toLong, k, ts) }
        .toDF("lid", "k", "ts")
      val r = rDedup.toDF("k", "ts", "rid")
      val got = graft.operators.AsOfJoin(l, r, Seq("k"), "ts", "ts", Seq("rid"))
        .select("lid", "asof_rid")
        .collect().map(x => x.getLong(0) -> Option(x.get(1)).map(_.asInstanceOf[Long])).toMap
      val expected = lrows.zipWithIndex.map { case ((k, ts), i) =>
        val cand = rDedup.filter(rr => rr._1 == k && rr._2 <= ts)
        i.toLong -> (if (cand.isEmpty) None else Some(cand.maxBy(_._2)._3))
      }.toMap
      got == expected
    }
  }

  property("exact dedup == sequential normalize-group fold") =
    forAll(Gen.listOfN(20, Gen.oneOf("a B", "A  b", "c", "C ", "d e f"))) { texts =>
      import spark.implicits._
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val got = graft.operators.llm.Dedup.exact(df, "text", "id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = texts.zipWithIndex
        .groupBy(_._1.trim.toLowerCase.replaceAll("\\s+", " "))
        .map { case (_, g) => g.map(_._2.toLong).min -> g.size.toLong }
      got == expected
    }

  property("groupMax == sequential max fold") =
    forAll(Gen.nonEmptyListOf(for {
      g <- Gen.choose(0, 3); v <- Gen.choose(-1000, 1000)
    } yield (s"g$g", v))) { rows =>
      import spark.implicits._
      val got = rows.toDF("g", "v")
        .transform(AggOps.groupMax(col("g"), col("v"), as = "m"))
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      got == rows.groupBy(_._1).map { case (g, vs) => g -> vs.map(_._2).max }
    }

  property("simhashFromHashes is order-invariant (bag-of-features sketch)") =
    forAll(Gen.nonEmptyListOf(Gen.long)) { hs =>
      import spark.implicits._
      val df = Seq((hs, scala.util.Random.shuffle(hs))).toDF("a", "b")
      val r = df.select(
        graft.functions.exprs.simhashFromHashes(col("a")),
        graft.functions.exprs.simhashFromHashes(col("b"))).head()
      r.getLong(0) == r.getLong(1)
    }

  property("exactPercentiles == builtin percentile (random groups/values/cut points)") = {
    val genRows = Gen.nonEmptyListOf(for {
      g <- Gen.choose(0, 2); v <- Gen.choose(-50, 50)
    } yield (s"g$g", v.toDouble + 0.25))
    forAll(genRows, Gen.choose(0.0, 1.0)) { (rows, p) =>
      import spark.implicits._
      val df = rows.toDF("g", "v")
      val got = df.transform(AggOps.exactPercentiles(Seq("g"), "v", Seq(p), Seq("q")))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val exp = df.groupBy("g").agg(expr(s"percentile(v, $p)").as("q"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      got.keySet == exp.keySet &&
        got.keySet.forall(g => math.abs(got(g) - exp(g)) < 1e-9)
    }
  }

  property("heavy hitters (exact regime) == groupBy-count top-k (random streams)") = {
    val genItems = Gen.nonEmptyListOf(Gen.choose(0, 9).map(i => s"item$i"))
    forAll(genItems, Gen.choose(1, 5)) { (items, k) =>
      import spark.implicits._
      val df = items.toDF("item").repartition(3)
      val got = df
        .agg(graft.functions.HeavyHitters.topK(col("item"), width = 32, k = k).as("t"))
        .select(explode(col("t")).as("e"))
        .collect().map(r => (r.getStruct(0).getString(0), r.getStruct(0).getLong(1))).toSeq
      val exp = items.groupBy(identity).view.mapValues(_.size.toLong).toSeq
        .sortBy { case (item, c) => (-c, item) }.take(k)
      got == exp
    }
  }

  property("alternatingStarGroups == union-find (random graphs)") = {
    val genEdges = Gen.nonEmptyListOf(for {
      a <- Gen.choose(0L, 30L); b <- Gen.choose(0L, 30L) if a != b
    } yield (math.min(a, b), math.max(a, b)))
    forAll(genEdges) { edges =>
      import spark.implicits._
      // driver-side union-find oracle: group = min id of the component
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = parent.keys.map(x => x -> find(x)).toMap
      val got = graft.operators.llm.Dedup
        .alternatingStarGroups(edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == expected
    }
  }

  property("editDistance1Pairs == brute-force levenshtein <= 1 (random strings)") = {
    // short strings over a 2-letter alphabet: dense with true pairs,
    // duplicates (cliques), and empty strings — the completeness claim
    // (deletion-neighborhood candidates miss nothing at d <= 1) checked
    // against an exhaustive driver-side DP
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val genStr = Gen.choose(0, 4).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b'))).map(_.mkString)
    forAll(Gen.nonEmptyListOf(genStr)) { strs =>
      import spark.implicits._
      val rows = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val got = graft.operators.llm.FuzzyJoin
        .editDistance1Pairs(rows.toDF("id", "s"), "s", "id")
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exp = (for {
        (ia, sa) <- rows; (ib, sb) <- rows if ia < ib && lev(sa, sb) <= 1
      } yield (ia, ib)).toSet
      got == exp
    }
  }

  property("native tokenize == lower/regex/split composition (incl unicode + blanks)") = {
    val genText = Gen.listOf(Gen.oneOf(
      "cat", "DOG", "ÉtÉ", "İstanbul", "a\tb", "x\n\ny", "", " ", "  ",
      "ß", "tab\there", "123", "!?")).map(_.mkString(" "))
    forAll(Gen.listOfN(8, genText)) { texts =>
      import spark.implicits._
      val df = texts.toDF("t")
      val pairs = df.select(
        graft.operators.llm.Dedup.tokens(col("t")),
        graft.operators.llm.Dedup.tokensBuiltin(col("t"))).collect()
      pairs.forall(r => r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  property("native int8 quantize + int dot == builtin HOF forms (random vectors)") = {
    import graft.operators.llm.Similarity
    val genVec = Gen.listOfN(8, Gen.chooseNum(-10.0f, 10.0f))
    forAll(Gen.listOfN(6, genVec)) { vecs =>
      import spark.implicits._
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      val rows = df.select(
        Similarity.int8Quantize(col("v")).as("nq"),
        Similarity.int8QuantizeBuiltin(col("v"), Similarity.int8Scale(col("v"))).as("bq"))
        .withColumn("nd", Similarity.intDot(col("nq"), col("nq")))
        .withColumn("bd", Similarity.intDotBuiltin(col("bq"), col("bq")))
        .collect()
      rows.forall(r =>
        r.getSeq[Int](0) == r.getSeq[Int](1) && r.getLong(2) == r.getLong(3))
    }
  }

  property("native chunk generator == builtin HOF composition (random docs)") = {
    val genText = Gen.listOf(Gen.oneOf("aa", "b", "ccc", "", " ")).map(_.mkString(" "))
    forAll(Gen.listOfN(6, genText), Gen.choose(1, 6), Gen.choose(0, 5)) { (texts, mt, ovRaw) =>
      val ov = math.min(ovRaw, mt - 1)
      import spark.implicits._
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      def run(f: (org.apache.spark.sql.DataFrame, String, Int, Int) => org.apache.spark.sql.DataFrame) =
        f(df, "text", mt, ov).select("doc_id", "chunk_idx", "chunk_text")
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      run(graft.operators.llm.Chunking.byTokens) ==
        run(graft.operators.llm.Chunking.byTokensBuiltin(_, _, _, _))
    }
  }

  property("native zorder2 == builtin bit-op composition == bit-by-bit reference") = {
    val genCoord = Gen.oneOf(
      Gen.choose(0L, 1023L), // the realistic bucket-ordinal range
      Gen.choose(0L, 0xffffffffL)) // full 32-bit domain incl. the sign-adjacent top bits
    forAll(Gen.listOfN(8, Gen.zip(genCoord, genCoord))) { pts =>
      import spark.implicits._
      val rows = pts.toDF("x", "y").select(
        graft.functions.exprs.zorder2(col("x"), col("y")),
        graft.operators.Layout.zorderKeyBuiltin(col("x"), col("y"))).collect()
      val ref = pts.map { case (x, y) =>
        (0 until 32).foldLeft(0L) { (acc, i) =>
          acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
        }
      }
      rows.zip(ref).forall { case (r, e) => r.getLong(0) == e && r.getLong(1) == e }
    }
  }

  property("native zorder3/zorder4 == builtin reference (bit j of dim i -> j*k+i)") = {
    val gen3 = Gen.oneOf(Gen.choose(0L, 1023L), Gen.choose(0L, 0x1fffffL))
    val gen4 = Gen.oneOf(Gen.choose(0L, 1023L), Gen.choose(0L, 0xffffL))
    forAll(
      Gen.listOfN(6, Gen.zip(gen3, gen3, gen3)),
      Gen.listOfN(6, Gen.zip(gen4, gen4, gen4, gen4))) { (p3, p4) =>
      import spark.implicits._
      def ref(vals: Seq[Long], bits: Int): Long = {
        val k = vals.size
        vals.zipWithIndex.foldLeft(0L) { case (acc, (v, i)) =>
          (0 until bits).foldLeft(acc)((a, j) => a | (((v >> j) & 1L) << (j * k + i)))
        }
      }
      val c3 = Seq(col("x"), col("y"), col("z"))
      val r3 = p3.toDF("x", "y", "z").select(
        graft.functions.exprs.zorderN(c3),
        graft.operators.Layout.zorderKeyBuiltinN(c3)).collect()
      val ok3 = r3.zip(p3).forall { case (r, (x, y, z)) =>
        val e = ref(Seq(x, y, z), 21)
        r.getLong(0) == e && r.getLong(1) == e
      }
      val c4 = Seq(col("a"), col("b"), col("c"), col("d"))
      val r4 = p4.toDF("a", "b", "c", "d").select(
        graft.functions.exprs.zorderN(c4),
        graft.operators.Layout.zorderKeyBuiltinN(c4)).collect()
      val ok4 = r4.zip(p4).forall { case (r, (a, b, c, d)) =>
        val e = ref(Seq(a, b, c, d), 16)
        r.getLong(0) == e && r.getLong(1) == e
      }
      ok3 && ok4
    }
  }
}
