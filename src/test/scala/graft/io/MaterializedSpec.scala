package graft.io

import graft.SparkSpec

/** Regression for the nested-build crash: a `Materialized.of` block that
  * itself calls `Materialized.of` (the undirected-edge table computing
  * the edge table) must not throw. The old computeIfAbsent
  * implementation died with "Recursive update" whenever the two keys
  * hashed to the same ConcurrentHashMap bin — collision-dependent, so
  * it surfaced only on specific (label, fixture) combinations.
  */
class MaterializedSpec extends SparkSpec {

  "Materialized.of" should "allow a build to nest another build" in {
    import spark.implicits._
    // many nested pairs so at least some keys share a bin
    (1 to 64).foreach { i =>
      val outer = Materialized.of(spark, s"mat-spec-outer-$i") {
        val inner = Materialized.of(spark, s"mat-spec-inner-$i") {
          Seq(i).toDF("x")
        }
        inner.selectExpr("x * 2 AS y")
      }
      outer.collect().map(_.getInt(0)).toSeq shouldBe Seq(i * 2)
    }
  }

  it should "return the cached frame on the second call" in {
    import spark.implicits._
    var builds = 0
    def get() = Materialized.of(spark, "mat-spec-count") {
      builds += 1; Seq(1).toDF("x")
    }
    get(); get()
    builds shouldBe 1
  }
}
