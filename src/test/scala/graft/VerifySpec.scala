package graft

import org.apache.spark.sql.functions._

/** Pins the Verify-side gate-row schema contract: a gate DataFrame with
  * any complex-typed (array/map/struct) column must fail loudly before
  * the parquet dump, with a message naming the scalarization fix. This
  * is the guard Ann.scalarizeQuant's scaladoc relies on — the defect
  * class that made the original q143 driver row red can't recur.
  */
class VerifySpec extends SparkSpec {

  test("scalar-only gate schema passes the guard") {
    import spark.implicits._
    val df = Seq((1L, "a", 2.5)).toDF("id", "name", "score")
    noException should be thrownBy Verify.assertScalarSchema("q_ok", df.schema)
  }

  test("array column fails loudly, naming the column and the fix") {
    import spark.implicits._
    val df = Seq((1L, Seq(1, 2, 3))).toDF("vec_id", "qvec")
    val e = intercept[IllegalArgumentException] {
      Verify.assertScalarSchema("q_bad_array", df.schema)
    }
    e.getMessage should include("q_bad_array")
    e.getMessage should include("qvec")
    e.getMessage should include("array_join")
    e.getMessage should include("scalarizeQuant")
  }

  test("map and struct columns are rejected too") {
    import spark.implicits._
    val m = Seq((1L, Map("k" -> 1))).toDF("id", "props")
    intercept[IllegalArgumentException] {
      Verify.assertScalarSchema("q_bad_map", m.schema)
    }.getMessage should include("props")

    val s = Seq((1L, (2, "x"))).toDF("id", "pair")
    intercept[IllegalArgumentException] {
      Verify.assertScalarSchema("q_bad_struct", s.schema)
    }.getMessage should include("pair")
  }

  test("every registered gate query's sf0.001 schema is scalar-only") {
    // The real contract: run the whole registry's plan-time schemas
    // through the guard. Catches a future complex-typed gate column at
    // spec time instead of at the driver's verify run.
    SparkEntry.queries.foreach { case (name, fn) =>
      val schema = fn(spark, sfDir).schema
      noException should be thrownBy Verify.assertScalarSchema(name, schema)
    }
  }
}
