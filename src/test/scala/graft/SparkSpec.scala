package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.SparkEngine

/** Shared test fixture: one engine-configured local session across all
  * suites (getOrCreate reuses it; scalatest runs suites sequentially in
  * the forked JVM).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession =
    SparkEngine.session(master = "local[4]", appName = "graft-test", shufflePartitions = 4)

  /** Path of a file under src/test/resources. */
  def resource(rel: String): String =
    getClass.getClassLoader.getResource(rel).getPath
}
