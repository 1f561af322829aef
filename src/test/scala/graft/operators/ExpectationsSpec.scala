package graft.operators

import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

class ExpectationsSpec extends SparkSuite with Matchers {
  import spark.implicits._

  private val child = Seq(
    (1L, 1, Some(10.0)), (1L, 2, Some(20.0)), (2L, 1, Some(-3.0)),
    (2L, 1, Some(7.0)), // duplicate (2,1) key
    (9L, 1, None) // orphan parent key + null value
  ).toDF("k", "line", "v")

  private val parent = Seq(1L, 2L, 3L).toDF("pk")

  test("each check counts its planted violations exactly") {
    Expectations.notNull(child, Seq("v")).head().getLong(1) shouldBe 1L
    Expectations.notNull(child, Seq("k", "line")).head().getLong(1) shouldBe 0L
    // one duplicated key group of size 2 → 1 excess row
    Expectations.unique(child, Seq("k", "line")).head().getLong(1) shouldBe 1L
    Expectations.refIntegrity(child, Seq("k"), parent, Seq("pk"), "ref")
      .head().getLong(1) shouldBe 1L
    // -3.0 below range; the NULL is not a range violation
    Expectations.inRange(child, "v", 0, 100).head().getLong(1) shouldBe 1L
    // predicate: nulls count as violations (affirmative contract)
    Expectations.satisfies(child, "pos", "v > 0").head().getLong(1) shouldBe 2L
  }

  test("report unions checks with stable naming") {
    val r = Expectations.report(Seq(
      Expectations.notNull(child, Seq("v")),
      Expectations.unique(child, Seq("k", "line"))))
      .as[(String, Long)].collect().toMap
    r shouldBe Map("not_null(v)" -> 1L, "unique(k,line)" -> 1L)
  }

  test("clean table passes every check with zero violations") {
    val clean = Seq((1L, 1, Some(1.0)), (2L, 1, Some(2.0))).toDF("k", "line", "v")
    val total = Expectations.report(Seq(
      Expectations.notNull(clean, Seq("k", "line", "v")),
      Expectations.unique(clean, Seq("k", "line")),
      Expectations.refIntegrity(clean, Seq("k"), parent, Seq("pk"), "ref"),
      Expectations.inRange(clean, "v", 0, 10),
      Expectations.satisfies(clean, "pos", "v > 0")))
      .agg(org.apache.spark.sql.functions.sum("violations")).head().getLong(0)
    total shouldBe 0L
  }
}
