package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

class FreqSketchSpec extends SparkSuite with Matchers {
  import spark.implicits._

  private def sketch(df: org.apache.spark.sql.DataFrame, k: Int): Map[String, Long] = {
    val mg = udaf(new FreqSketch.MisraGries(k))
    df.agg(mg(col("item")).as("m"))
      .select(explode(col("m")).as(Seq("item", "cnt")))
      .as[(String, Long)].collect().toMap
  }

  test("k >= cardinality: counts are exact under any partitioning") {
    val ev = graft.util.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type").as("item"))
    val exact = ev.groupBy("item").count().as[(String, Long)].collect().toMap
    // random repartition forces nontrivial partial/merge trees
    sketch(ev.repartition(7), k = 64) shouldBe exact
  }

  test("under compaction: no false negatives above N/(k+1), estimates never exceed truth") {
    val k = 16
    // one heavy item (2000 of 5000 rows) + a 300-item uniform tail —
    // cardinality 301 >> k, so decrements and merge-compaction fire
    val heavy = Seq.fill(2000)("heavy")
    val tail = (0 until 300).flatMap(i => Seq.fill(10)(s"t$i"))
    val n = heavy.size + tail.size
    val df = scala.util.Random.shuffle(heavy ++ tail).toDF("item").repartition(5)
    val est = sketch(df, k)
    est.keySet should contain("heavy")
    // MG bound: c − N/(k+1) ≤ ĉ ≤ c
    est("heavy") should be <= 2000L
    est("heavy") should be >= (2000L - n / (k + 1))
    est.size should be <= k
    est.foreach { case (item, c) =>
      val truth = if (item == "heavy") 2000L else 10L
      c should be <= truth
    }
  }
}
