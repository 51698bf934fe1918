package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Shared local session for specs. One JVM-wide session (getOrCreate)
  * keeps the suite fast; specs must not mutate session state.
  */
trait SparkSpec extends AnyFunSuite with Matchers {
  lazy val spark: SparkSession = util.configureLocalHarness(SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .appName("graft-test"))
    .getOrCreate()

  /** sf0.001 testdata dir — smoke-scale inputs for specs. */
  val sfDir = "/root/testdata/sf0.001"
}
