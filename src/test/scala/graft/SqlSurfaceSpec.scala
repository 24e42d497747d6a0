package graft

import org.apache.spark.sql.functions._
import graft.operators.llm.Dedup

/** The native function surface through the SQL front-end: every sketch
  * primitive is callable (and composable) from pure SQL, and agrees with
  * the Column-API form bit-for-bit.
  */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("full MinHash sketch pipeline composes in pure SQL == Column API") {
    Seq((1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "pack my box with five dozen liquor jugs"))
      .toDF("doc_id", "text").createOrReplaceTempView("sqlsurface_docs")
    val viaSql = spark.sql(
      """SELECT doc_id,
        |       band_hashes(minhash_sig(shingle_hashes(
        |         split(trim(regexp_replace(lower(text), '\\s+', ' ')), ' '), 3), 32), 8) AS b
        |FROM sqlsurface_docs""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaApi = spark.table("sqlsurface_docs")
      .select(col("doc_id"),
        graft.functions.exprs.bandHashes(
          graft.functions.exprs.minhashSig(
            graft.functions.exprs.shingleHashes(Dedup.tokens(col("text")), 3), 32), 8).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaSql == viaApi)
  }

  test("scalar natives callable from SQL: simhash chain, punct, digits, dot product") {
    val r = spark.sql(
      """SELECT simhash_from_hashes(shingle_hashes(split('a b c d', ' '), 2)) AS sh,
        |       simhash64('a b c d') AS sh64,
        |       rolling_hash64('a b c d') AS rh,
        |       punct_count('a, b! c?') AS pc,
        |       digit_runs('x12 y345 z') AS dr,
        |       dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp,
        |       hyperplane_bits(array(0.5D, -1.5D), 4) AS hp""".stripMargin).head()
    assert(r.getInt(3) == 3 && r.getInt(4) == 2 && r.getDouble(5) == 11.0)
    assert(r.getSeq[Int](6).length == 4)
    // chain parity with the Column API
    val api = Seq("a b c d").toDF("t").select(
      graft.functions.exprs.simhashFromHashes(
        graft.functions.exprs.shingleHashes(split(col("t"), " "), 2)),
      graft.functions.exprs.simhash64(col("t")),
      graft.functions.exprs.rollingHash64(col("t"))).head()
    assert(r.getLong(0) == api.getLong(0))
    assert(r.getLong(1) == api.getLong(1) && r.getLong(2) == api.getLong(2))
  }

  test("int8 quantize + int dot callable from SQL, parity with the Column API") {
    val r = spark.sql(
      """SELECT int8_quantize(array(0.5D, -1.0D, 0.25D, 0.0D)) AS qv,
        |       int_dot(array(1, 2, 3), array(4, 5, 6)) AS d""".stripMargin).head()
    assert(r.getSeq[Int](0) == Seq(64, -127, 32, 0))
    assert(r.getLong(1) == 32L)
    val api = Seq(Seq(0.5f, -1.0f, 0.25f, 0.0f)).toDF("v")
      .select(graft.functions.exprs.int8Quantize(col("v"))).head()
    assert(r.getSeq[Int](0) == api.getSeq[Int](0))
  }

  test("int parameter must be a literal: clear plan-time error otherwise") {
    val e = intercept[Exception] {
      spark.sql("SELECT shingle_hashes(split('a b', ' '), 1 + length('xx'))").collect()
    }
    assert(e.getMessage.contains("int literal"), s"unexpected error: ${e.getMessage}")
  }

  test("Dataset.groupingSets (typed API) == q81's SQL GROUPING SETS, row for row") {
    // both faces of the grouping-sets surface must agree: the SQL
    // front-end form (q81) and the Spark-4 DataFrame-API form over the
    // same sets ((flag,status),(flag),(ship_year)) with grouping_id()
    val sf = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val y = year(col("l_shipdate"))
    val api = li.groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_returnflag")), Seq(y)),
        col("l_returnflag"), col("l_linestatus"), y)
      .agg(grouping_id().as("gid"), count(lit(1)).as("cnt"),
        sum(round(col("l_quantity")).cast("long")).as("qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        coalesce(col("year(l_shipdate)"), lit(-1)).as("ship_year"),
        col("gid"), col("cnt"), col("qty"))
      .orderBy("gid", "rf", "ls", "ship_year")
      .collect().map(_.toSeq).toSeq
    val sql = graft.queries.ExtQueries.queries("q81_grouping_sets")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(api == sql, s"API and SQL grouping sets disagree:\napi=$api\nsql=$sql")
  }
}
