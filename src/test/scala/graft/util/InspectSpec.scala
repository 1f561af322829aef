package graft.util

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

class InspectSpec extends SparkSuite with Matchers {
  import spark.implicits._

  test("profile: one row per column with rows/nulls/distinct/min/max") {
    val df = Seq(
      (1L, Some("a"), Some(2.5)),
      (2L, Some("a"), None),
      (3L, None, Some(1.0))
    ).toDF("id", "tag", "score")
    val p = Inspect.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    p.keySet shouldBe Set("id", "tag", "score")
    val id = p("id")
    id.getAs[String]("data_type") shouldBe "bigint"
    id.getAs[Long]("n_rows") shouldBe 3L
    id.getAs[Long]("n_nulls") shouldBe 0L
    id.getAs[Long]("n_distinct") shouldBe 3L
    id.getAs[String]("min_value") shouldBe "1"
    id.getAs[String]("max_value") shouldBe "3"
    val tag = p("tag")
    tag.getAs[Long]("n_nulls") shouldBe 1L
    tag.getAs[Long]("n_distinct") shouldBe 1L
    tag.getAs[String]("min_value") shouldBe "a"
    val score = p("score")
    score.getAs[Long]("n_nulls") shouldBe 1L
    score.getAs[String]("max_value") shouldBe "2.5"
  }

  test("profile approx mode keeps the same shape and exact null counts") {
    val df = Seq.tabulate(100)(i => (i.toLong, s"v${i % 7}"))
      .toDF("id", "v")
    val p = Inspect.profile(df, exactDistinct = false).collect()
      .map(r => r.getString(0) -> r).toMap
    p("id").getAs[Long]("n_rows") shouldBe 100L
    p("id").getAs[Long]("n_nulls") shouldBe 0L
    // HLL at default precision is exact-ish at this cardinality band
    p("v").getAs[Long]("n_distinct").toDouble shouldBe 7.0 +- 1.0
    // and the approx plan must NOT expand rows x columns
    Inspect.profile(df, exactDistinct = false)
      .queryExecution.executedPlan.toString should not include "Expand"
  }
}
