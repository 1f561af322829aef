package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The SQL surface of the native expressions, installed through
  * SparkSessionExtensions. Builds its own SparkSession (extensions are
  * fixed at session build time) on the shared SparkContext.
  */
class GraftExtensionsSpec extends AnyFunSuite with Matchers {

  test("graft_* functions callable from SQL") {
    val base = graft.SparkSuite.session // shared context
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new GraftExtensions)
      .create()
    try {
      s.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .collect()(0).getDouble(0) shouldBe 11.0 +- 1e-12
      s.sql("SELECT size(graft_shingle_hashes('a b c', 2)) AS n")
        .collect()(0).getInt(0) shouldBe 2
      s.sql("SELECT graft_sorted_intersect_size(array(1L,2L,3L), array(2L,3L,4L)) AS i")
        .collect()(0).getLong(0) shouldBe 2L
      s.sql("SELECT graft_token_stats('a b a').n_distinct_tokens AS d")
        .collect()(0).getLong(0) shouldBe 2L
      s.sql("SELECT graft_simhash64('hello world') = graft_simhash64('hello world') AS eq")
        .collect()(0).getBoolean(0) shouldBe true
    } finally {
      // do NOT close/stop: that would stop the SHARED SparkContext and
      // kill every suite after this one; just restore the base session
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
