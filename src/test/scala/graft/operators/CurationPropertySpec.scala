package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Property tests for the round-12 curation operators over generated
  * corpora/pair graphs — plain ScalaCheck generators sampled with
  * fixed seeds (the [[CandlesPropertySpec]] idiom; scalatestplus is
  * not in the offline dependency cache). Each property is checked
  * against a driver-side reference implementation small enough to be
  * obviously correct.
  */
class CurationPropertySpec extends SparkSuite with Matchers {
  import spark.implicits._

  private def sampled[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  // ── keepBestPerComponent vs a union-find reference ─────────────────

  private val graphGen: Gen[(Seq[(Long, Long)], Seq[(Long, Long)])] = for {
    n <- Gen.choose(4, 24)
    nEdges <- Gen.choose(0, n)
    edges <- Gen.listOfN(nEdges, for {
      a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1) if a != b
    } yield (math.min(a, b).toLong, math.max(a, b).toLong))
    quality <- Gen.listOfN(n, Gen.choose(0L, 5L)) // ties likely
  } yield (edges.distinct, (0 until n).map(i => (i.toLong, quality(i))))

  test("keepBestPerComponent matches a union-find argmax reference on random pair graphs") {
    sampled(graphGen, 8).foreach { case (edges, docs) =>
      val pairs = edges.toDF("doc_a", "doc_b")
      val d = docs.toDF("doc_id", "n_chars")
      val got = Dedup.keepBestPerComponent(d, pairs, Seq("n_chars", "doc_id"))
        .select("doc_id").as[Long].collect().sorted

      // reference: driver union-find, then per-root argmax by
      // (n_chars, doc_id) descending — the operator's declared policy
      val parent = scala.collection.mutable.Map(docs.map(x => x._1 -> x._1): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      edges.foreach { case (a, b) => parent(find(a)) = find(b) }
      val q = docs.toMap
      val expect = docs.map(_._1).groupBy(find)
        .values.map(_.maxBy(id => (q(id), id))).toArray.sorted

      withClue(s"edges=$edges quality=$docs: ") { got shouldBe expect }
    }
  }

  // ── capPerStratum bounds + permutation invariance ──────────────────

  private val corpusGen: Gen[(Seq[(Long, String)], Int)] = for {
    n <- Gen.choose(5, 40)
    nStrata <- Gen.choose(1, 5)
    strata <- Gen.listOfN(n, Gen.choose(0, nStrata - 1).map(i => s"s$i"))
    k <- Gen.choose(1, 6)
  } yield ((0 until n).map(i => (i.toLong, strata(i))), k)

  test("capPerStratum keeps exactly min(k, stratum size) per stratum, invariant under partitioning") {
    sampled(corpusGen, 8).foreach { case (docs, k) =>
      val d = docs.toDF("doc_id", "source")
      val capped = Curation.capPerStratum(d, "source", "doc_id", k)
      val got = capped.groupBy("source").count()
        .as[(String, Long)].collect().toMap
      val full = docs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      withClue(s"docs=$docs k=$k: ") {
        full.foreach { case (s, n) => got.getOrElse(s, 0L) shouldBe math.min(n, k.toLong) }
        // pure function of (seed, id): a different physical layout
        // draws the identical survivor set
        Curation.capPerStratum(d.repartition(5), "source", "doc_id", k)
          .select("doc_id").as[Long].collect().sorted shouldBe
          capped.select("doc_id").as[Long].collect().sorted
      }
    }
  }

  // ── epochAllocation closed forms ───────────────────────────────────

  private val massGen: Gen[Seq[(String, Long)]] = for {
    nStrata <- Gen.choose(1, 6)
    masses <- Gen.listOfN(nStrata, Gen.choose(1L, 1000L))
  } yield masses.zipWithIndex.map { case (m, i) => (s"s$i", m) }

  test("epochAllocation: weights form a distribution, allocations exhaust the budget, α=1∧B=A ⟹ 1 epoch everywhere") {
    sampled(massGen, 8).foreach { masses =>
      val d = masses.zipWithIndex
        .map { case ((s, m), i) => (i.toLong, s, m) }
        .toDF("doc_id", "source", "n_chars")
      val total = masses.map(_._2).sum
      val a = Curation.epochAllocation(d, "source", "n_chars",
        alpha = 0.7, budgetTokens = 100000L)
        .as[(String, Long, Double, Double, Double)].collect()
      withClue(s"masses=$masses: ") {
        a.map(_._3).sum shouldBe 1.0 +- 1e-4
        a.map(_._4).sum shouldBe 100000.0 +- 1.0
        a.map(_._2).sum shouldBe total
        Curation.epochAllocation(d, "source", "n_chars",
          alpha = 1.0, budgetTokens = total)
          .as[(String, Long, Double, Double, Double)].collect()
          .foreach(_._5 shouldBe 1.0 +- 1e-4)
      }
    }
  }

  // ── CDC chunking invariants ────────────────────────────────────────

  private val textsGen: Gen[Seq[(Long, String)]] = for {
    nDocs <- Gen.choose(1, 4)
    texts <- Gen.listOfN(nDocs,
      Gen.nonEmptyListOf(Gen.oneOf("aa", "bb", "cc", "dd", "ee"))
        .map(_.mkString(" ")))
  } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("dedupChunksCdc: survivors are in-order token subsequences and the elected chunk multiset is the corpus's distinct chunk set") {
    sampled(textsGen, 8).foreach { docs =>
      val d = docs.toDF("doc_id", "text")
      val out = Dedup.dedupChunksCdc(d).orderBy("doc_id")
        .select("doc_id", "text_dedup").as[(Long, String)].collect()
      val orig = docs.toMap
      withClue(s"docs=$docs: ") {
        out.length shouldBe docs.length // row-stable
        out.foreach { case (id, td) =>
          // surviving text is an in-order subsequence of the original
          val o = orig(id).split(" ")
          val s = if (td.isEmpty) Array.empty[String] else td.split(" ")
          var i = 0
          s.foreach { tok =>
            i = o.indexOf(tok, i)
            i should be >= 0
            i += 1
          }
        }
        // total surviving tokens across the corpus never exceeds the
        // input and is never zero (the first doc's first chunk always
        // survives)
        val kept = out.map(_._2).filter(_.nonEmpty).map(_.split(" ").length).sum
        kept should be > 0
        kept should be <= docs.map(_._2.split(" ").length).sum
      }
    }
  }
}
