package graft

import scala.io.Source
import graft.operators.KvTextSink
import graft.queries.GoldenLabs

/** Golden end-to-end parity: each reference lab runs over the reference's
  * OWN dataset (copied into test resources) through the schema-on-read
  * sources, and the KvTextSink rendering must match the committed expected
  * output (independently derived from the labs' embedded-Java semantics —
  * scripts/gen_golden.py documents the derivation and the S6
  * canonicalization).
  *
  * This is the test that finally exercises S2 (sorted single output),
  * S3 (`key\tvalue` lines), S4 (skip-don't-fail parsing, incl. lab3's BOM +
  * header + malformed rows) and S5 (header heuristics) on real inputs.
  */
class GoldenLabSpec extends SparkSpec {

  private val inputs = Map(
    "lab2" -> "input2.txt",
    "lab3" -> "Temperature.txt",
    "lab4" -> "input4.txt",
    "lab5" -> "input5.txt",
    "lab6" -> "electric_consumption.txt",
    "lab7" -> "input7.txt",
    "lab8" -> "productsSold_dataset.txt",
    "lab9" -> "input9.txt",
    "lab10" -> "Books-mini.csv",
    "lab11" -> "uber_dataset.csv"
  )

  private def golden(lab: String): Seq[String] = {
    val src = Source.fromFile(resource(s"golden/$lab.txt"), "UTF-8")
    try src.getLines().toIndexedSeq
    finally src.close()
  }

  for (lab <- inputs.keys.toSeq.sortBy(s => s.drop(3).toInt)) {
    test(s"$lab output matches the reference golden run") {
      val df = GoldenLabs.all(lab)(spark, resource(s"labdata/${inputs(lab)}"))
      assert(KvTextSink.collect(df) == golden(lab))
    }
  }
}
