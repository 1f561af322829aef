package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Contract guards on the driver surface itself. `queries` and
  * `oracleSql` are Scala Maps — a DUPLICATE key would silently shadow
  * an earlier gate (the map compiles, the count just drops by one),
  * and an oracle entry without a query would make the driver's compare
  * report a phantom crash. These are build-time mistakes a type
  * checker can't catch; pin them here.
  */
class SparkEntrySpec extends AnyFunSuite with Matchers {

  test("every oracle has a query; no orphan oracle keys") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    orphans shouldBe empty
  }

  test("registered gate count matches the declared coverage") {
    // bump alongside SURVEY.md §8 when adding gates — a mismatch means
    // either a silently-shadowed duplicate key or a stale coverage map
    SparkEntry.queries.size shouldBe 234
    // the BPE-model-dependent oracles embed the TRAINED model
    // artifacts, so they exist only after a gate run trains the model
    // in this JVM (Verify's dump order guarantees that); every other
    // query must always carry an oracle
    // model-dependent late-bound oracles (BPE chain + trained-centroid
    // prototypes) exist only after a gate run trains the model here
    val lateBound = Set("text_bpe_apply", "text_bpe_encode", "text_pack_ids",
      "cur_pipeline4", "cur_semantic_prototypes")
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    withClue(s"non-late-bound queries missing oracles: ") {
      (unoracled -- lateBound) shouldBe empty
    }
  }

  test("oracle SQL mentions only tables the testdata provides") {
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings",
      // DuckDB built-in TABLE FUNCTION, not testdata: the DSIR oracle
      // spines its smoothed distributions over `FROM range(4096)`
      "range")
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val froms = "(?i)\\bFROM\\s+([a-z_][a-z0-9_]*)".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      // `AS MATERIALIZED (` is the DuckDB CTE-materialization hint the
      // slow multi-consumer oracles carry (cur_pipeline7)
      val cteNames = ("(?i)\\b([a-z_][a-z0-9_]*)\\s*(?:\\([^)]*\\))?" +
        "\\s+AS\\s*(?:MATERIALIZED\\s*)?\\(").r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      // staged oracles (cur_pipeline7) declare TEMP TABLEs so DuckDB
      // evaluates each stage once — their names are local, like CTEs
      val tempNames = "(?i)\\bTEMP\\s+TABLE\\s+([a-z_][a-z0-9_]*)".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val unknown = froms -- tables -- cteNames -- tempNames
      withClue(s"$name references unknown tables: ") { unknown shouldBe empty }
    }
  }
}
