package graft.operators

import org.apache.spark.sql.functions
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

class TextOpsSpec extends SparkSuite with Matchers {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat and the dog", 19L),
    (2L, "aaa bbb ccc", 11L)
  ).toDF("doc_id", "text", "n_chars")

  test("tokenStats counts tokens, distinct tokens, avg length") {
    val r = TextOps.tokenStats(docs).orderBy("doc_id")
      .select("n_tokens", "n_distinct_tokens", "avg_token_len").collect()
    r(0).getLong(0) shouldBe 5
    r(0).getLong(1) shouldBe 4 // "the" repeated
    r(0).getDouble(2) shouldBe 3.0 +- 1e-9
    r(1).getLong(0) shouldBe 3
    r(1).getLong(1) shouldBe 3
  }

  test("tokensUnicode splits punctuation-glued words the whitespace " +
      "tokenizer miscounts") {
    val punct = Seq((1L, "Hello, world! It's 42 degrees... really?", 40L))
      .toDF("doc_id", "text", "n_chars")
    val uni = TextOps.tokenStats(punct, unicode = true).head()
    // letter runs: Hello world It s degrees really; digit runs: 42
    uni.getAs[Long]("n_tokens") shouldBe 7
    uni.getAs[Long]("n_distinct_tokens") shouldBe 7
    // whitespace split sees 6 mark-glued "tokens"
    TextOps.tokenStats(punct).head().getAs[Long]("n_tokens") shouldBe 6
    // on punctuation-free text the two tokenizers agree
    TextOps.tokenStats(docs, unicode = true)
      .orderBy("doc_id").select("n_tokens", "n_distinct_tokens", "avg_token_len")
      .collect() shouldBe
      TextOps.tokenStats(docs)
        .orderBy("doc_id").select("n_tokens", "n_distinct_tokens", "avg_token_len")
        .collect()
  }

  test("unicode option threads through quality/tfidf/unigram") {
    val punct = Seq(
      (1L, "the, cat! the cat runs", 22L),
      (2L, "dogs bark; dogs sleep", 21L)
    ).toDF("doc_id", "text", "n_chars")
    // whitespace mode keys tf-idf on "the," ≠ "the"; unicode merges them
    val uniTerms = TextOps.tfidfTopTerms(punct, k = 10, unicode = true)
      .filter(col("doc_id") === 1).select("term").as[String].collect().toSet
    uniTerms should contain("the")
    uniTerms should not contain "the,"
    val wsTerms = TextOps.tfidfTopTerms(punct, k = 10)
      .filter(col("doc_id") === 1).select("term").as[String].collect().toSet
    wsTerms should contain("the,")
    // unigram logprob: unicode token count drops no words, only marks
    TextOps.unigramLogprob(punct, unicode = true)
      .filter(col("doc_id") === 1).select("n_tokens").as[Long].head() shouldBe 5
    // quality: the stopword "the" is invisible to whitespace mode when
    // comma-glued everywhere, visible to unicode mode
    val punct2 = Seq((1L, "the, cat", 8L)).toDF("doc_id", "text", "n_chars")
    TextOps.qualityScore(punct2).head().getAs[Double]("stopword_ratio") shouldBe 0.0
    TextOps.qualityScore(punct2, unicode = true)
      .head().getAs[Double]("stopword_ratio") shouldBe 0.5
  }

  test("vocabulary store: build + extend == from-scratch scoring, and " +
      "a re-applied shard is a ledgered no-op") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val path = java.nio.file.Files.createTempDirectory("vocab-store").toString
    val t = pmod(col("doc_id"), lit(3))
    TextOps.buildVocab(corpus.filter(t === 0), path)
    TextOps.extendVocab(corpus.filter(t === 1), path, shardId = Some("t1"))
    TextOps.extendVocab(corpus.filter(t === 2), path, shardId = Some("t2"))
    val stored = TextOps.scoreAgainstVocab(corpus, path)
    val scratch = TextOps.unigramLogprob(corpus)
    stored.orderBy("doc_id").collect() shouldBe scratch.orderBy("doc_id").collect()
    // retry: doubled count rows would skew every probability
    TextOps.extendVocab(corpus.filter(t === 2), path, shardId = Some("t2"))
    TextOps.scoreAgainstVocab(corpus, path).orderBy("doc_id").collect() shouldBe
      scratch.orderBy("doc_id").collect()
  }

  test("qualityScore components and weighting") {
    val r = TextOps.qualityScore(docs).orderBy("doc_id").collect()
    val row = r(0)
    row.getAs[Double]("stopword_ratio") shouldBe 0.6 +- 1e-9 // the, and, the
    row.getAs[Double]("type_token_ratio") shouldBe 0.8 +- 1e-9
    row.getAs[Int]("length_ok") shouldBe 0 // 19 chars < 50
    row.getAs[Double]("quality_score") shouldBe (0.6 * 0.3 + 0.8 * 0.5) +- 1e-6
  }

  test("langId predicts via profile overlap with deterministic ties") {
    val multi = Seq(
      (1L, "the fast data", "en"),
      (2L, "el datos tabla fila", "es"),
      (3L, "der daten und zeile", "de"),
      (4L, "zzz qqq", "en") // zero hits everywhere -> declaration-order
                            // tiebreak picks the first profile (en),
                            // matching the oracle's CASE ordering
    ).toDF("doc_id", "text", "lang")
    val r = TextOps.langId(multi).orderBy("doc_id").select("pred_lang").as[String].collect()
    r shouldBe Array("en", "es", "de", "en")
  }

  test("tokenStats kernel agrees with the built-in formulation") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    val toks = TextOps.tokens(col("text"))
    val builtin = real.select(col("doc_id"),
      functions.size(toks).cast("long").as("e_n"),
      functions.size(array_distinct(toks)).cast("long").as("e_d"),
      aggregate(toks, lit(0L), (acc, t) => acc + functions.length(t)).as("e_sum"))
    val fast = TextOps.tokenStats(real)
      .withColumn("sum_len", round(col("avg_token_len") * col("n_tokens")).cast("long"))
    fast.join(builtin, "doc_id")
      .filter(col("n_tokens") =!= col("e_n") || col("n_distinct_tokens") =!= col("e_d"))
      .count() shouldBe 0
  }

  test("bpeTokenStats splits alpha runs, digit runs, and marks") {
    val d = Seq((1L, "abc de4f, x-9!")).toDF("doc_id", "text")
    val r = TextOps.bpeTokenStats(d).head()
    // tokens: abc, de, 4, f, ",", x, -, 9, "!"
    r.getAs[Long]("n_bpe_tokens") shouldBe 9
    r.getAs[Long]("n_alpha_runs") shouldBe 4
    r.getAs[Long]("n_digit_runs") shouldBe 2
    r.getAs[Long]("n_marks") shouldBe 3
  }

  test("fingerprint is order- and multiplicity-insensitive") {
    val d = Seq((1L, "b a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val fp = TextOps.fingerprint(d).orderBy("doc_id").select("fingerprint").as[String].collect()
    fp(0) shouldBe fp(1)
    fp(0) should not be fp(2)
  }

  test("qualityFlags: each rule trips on its planted violation") {
    val good = (1 to 40).map(i => s"w$i the").mkString(" ") // 80 tokens, stopwords, distinct bigrams
    val loops = Array.fill(40)("spam").mkString(" ")        // repetition + no stopword
    val symbols = (1 to 40).map(_ => "@@ the").mkString(" ")
    val d = Seq((1L, good), (2L, loops), (3L, symbols), (4L, "too short the"))
      .toDF("doc_id", "text")
    val r = TextOps.qualityFlags(d)
      .orderBy("doc_id")
      .select("flag_length", "flag_word_len", "flag_symbols", "flag_stopword",
        "flag_repetition", "keep")
      .as[(Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)].collect()
    r(0) shouldBe ((true, true, true, true, true, true))    // survives
    r(1)._5 shouldBe false                                   // loops: repetition trips
    r(1)._6 shouldBe false
    r(2)._3 shouldBe false                                   // symbol ratio trips
    r(3)._1 shouldBe false                                   // too short
    r(3)._6 shouldBe false
  }

  test("repetition flags looping bigrams; short docs emit no row") {
    val d = Seq(
      (1L, "spam spam spam spam spam"), // 4 bigrams, all "spam spam"
      (2L, "all words here are fully distinct tokens"),
      (3L, "one")                       // < 2 tokens → no grams
    ).toDF("doc_id", "text")
    val r = TextOps.repetition(d, n = 2).orderBy("doc_id")
      .as[(Long, Long, Long, Double, Double)].collect()
    r.map(_._1) shouldBe Array(1L, 2L)
    r(0) shouldBe ((1L, 4L, 4L, 1.0, 0.25))
    // 6 bigrams, each unique
    r(1) shouldBe ((2L, 6L, 1L, 0.166667, 1.0))
  }
}
