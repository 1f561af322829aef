package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions installer exposing graft's native expressions
  * to SQL, so `spark.sql("SELECT graft_dot(a, b) ...")` works anywhere
  * the DataFrame API does:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   // or: .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * }}}
  *
  * | SQL name                    | expression            |
  * |-----------------------------|-----------------------|
  * | graft_dot(a, b)             | [[DotProduct]]        |
  * | graft_shingle_hashes(t, n)  | [[ShingleHashes]]     |
  * | graft_sorted_intersect_size(a, b) | [[SortedIntersectSize]] |
  * | graft_token_stats(t)        | [[TokenStats]]        |
  * | graft_simhash64(t)          | [[SimHash64]]         |
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "", "", "", "", "", "", "scala_udf")

  private def register(ext: SparkSessionExtensions, name: String, usage: String,
                       builder: Seq[Expression] => Expression): Unit =
    ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))

  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator extension: sort-free top-k per key planner strategy
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    register(ext, "graft_dot",
      "graft_dot(a, b) - dot product of two float/double arrays (double)",
      { case Seq(a, b) => DotProduct(a, b) })
    register(ext, "graft_shingle_hashes",
      "graft_shingle_hashes(text, n) - sorted distinct xxhash64 word n-gram shingles",
      { case Seq(t, n) => ShingleHashes(t, n.eval().asInstanceOf[Number].intValue()) })
    register(ext, "graft_sorted_intersect_size",
      "graft_sorted_intersect_size(a, b) - overlap of two sorted bigint arrays",
      { case Seq(a, b) => SortedIntersectSize(a, b) })
    register(ext, "graft_token_stats",
      "graft_token_stats(text) - struct<n_tokens, n_distinct_tokens, sum_token_len>",
      { case Seq(t) => TokenStats(t) })
    register(ext, "graft_simhash64",
      "graft_simhash64(text) - frequency-weighted 64-bit simhash",
      { case Seq(t) => SimHash64(t) })
  }
}
