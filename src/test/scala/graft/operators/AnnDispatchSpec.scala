package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** r15: the serving dispatchers — annTopKAuto's two-arm choice by
  * measured calibrated budgets, the cross-set residual path, and the
  * measured-at-cap calibration contract (r14 ADVICE).
  */
class AnnDispatchSpec extends SparkSuite with Matchers {

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("annDispatchFrom: decision table — green beats unverified, " +
      "cheaper budget wins among green, ties prefer global") {
    def b(np: Int, rec: Double, ok: Boolean) =
      Pca.CalibratedBudget(np, rec, measured = true, ok)
    // only one arm verified green -> that arm, whatever the budgets
    Pca.annDispatchFrom(b(8, 0.99, ok = true), b(4, 0.80, ok = false), 16)
      .residual shouldBe false
    Pca.annDispatchFrom(b(4, 0.80, ok = false), b(8, 0.99, ok = true), 16)
      .residual shouldBe true
    // both green -> cheaper calibrated budget
    Pca.annDispatchFrom(b(32, 0.99, ok = true), b(8, 0.99, ok = true), 64)
      .residual shouldBe true
    Pca.annDispatchFrom(b(8, 0.99, ok = true), b(32, 0.99, ok = true), 64)
      .residual shouldBe false
    // tie -> global (one eigenproblem + reduced-space scoring)
    Pca.annDispatchFrom(b(8, 0.99, ok = true), b(8, 0.99, ok = true), 16)
      .residual shouldBe false
    // neither green -> least-bad measured recall
    Pca.annDispatchFrom(b(16, 0.70, ok = false), b(16, 0.85, ok = false), 16)
      .residual shouldBe true
  }

  test("annTopKAuto: the dispatched arm is measured-green and the " +
      "auto check holds its contract on the clustered corpus") {
    val clustered = Dedup.materialize(Similarity.clusteredCorpus(emb))
    val model = Pca.fit(clustered, 16)
    val cents = Similarity.coarseCentroids(
      Pca.project(clustered, model, projCol = "embedding"), 16, iters = 3)
    val rmodel = Pca.fitIvfResidual(clustered, kDims = 16, nlist = 16)
    val disp = Pca.annDispatch(clustered, model, cents, rmodel)
    // whatever arm wins, the dispatcher must never serve an unverified
    // budget while the other arm measured green
    val chosen = if (disp.residual) disp.resid else disp.global
    val other = if (disp.residual) disp.global else disp.resid
    withClue(s"chosen=$chosen other=$other:") {
      (chosen.ok || !other.ok) shouldBe true
    }
    chosen.measured shouldBe true
    // the auto check (spread-sample grading) holds through the
    // dispatched path without re-calibrating
    val row = Pca.annAutoCheck(clustered, model, cents, rmodel,
      dispatchOpt = Some(disp)).head()
    row.getBoolean(0) shouldBe true
    row.getBoolean(1) shouldBe true
  }

  test("ivfResidualTopKCross: at nprobe = nlist with an uncut pool the " +
      "answer IS the exact cross reference (probing all cells leaves " +
      "only the exact rerank)") {
    val corpus = emb.filter(pmod(col("vec_id"), lit(5)) =!= 0)
    val queries = emb.filter(pmod(col("vec_id"), lit(5)) === 0)
      .filter(col("vec_id") < 40)
    val n = corpus.count().toInt
    val rmodel = Pca.fitIvfResidual(corpus, kDims = 8)
    val got = Pca.ivfResidualTopKCross(corpus, queries, rmodel, k = 5,
      nprobe = rmodel.nlist, pool = n)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = Similarity.bruteForceTopK(corpus, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    got shouldBe exact
  }

  test("ivfResidualTopKCross: the threshold band drops below-band rows " +
      "(the knnJoinCross contract)") {
    val corpus = emb.filter(pmod(col("vec_id"), lit(5)) =!= 0)
    val queries = emb.filter(pmod(col("vec_id"), lit(5)) === 0)
      .filter(col("vec_id") < 40)
    val n = corpus.count().toInt
    val rmodel = Pca.fitIvfResidual(corpus, kDims = 8)
    val banded = Pca.ivfResidualTopKCross(corpus, queries, rmodel, k = 5,
      nprobe = rmodel.nlist, pool = n, threshold = 0.4).collect()
    banded.foreach(_.getDouble(2) should be >= 0.4)
    val unbanded = Pca.ivfResidualTopKCross(corpus, queries, rmodel, k = 5,
      nprobe = rmodel.nlist, pool = n)
    unbanded.filter(col("cos") >= 0.4).count() shouldBe banded.length.toLong
  }

  test("residualThresholdCross: at nprobe = nlist the probed pair set " +
      "equals the exact cross pairs above threshold") {
    import graft.functions.VectorFunctions
    val corpus = emb.filter(col("vec_id") % 10 =!= 0)
    val bench = emb.filter(col("vec_id") % 10 === 0)
    val rmodel = Pca.fitIvfResidual(corpus, kDims = 8)
    val got = Pca.residualThresholdCross(corpus, bench, rmodel,
      nprobe = rmodel.nlist, threshold = 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = corpus.select(col("vec_id").as("id_a"),
        col("embedding").as("ea"),
        VectorFunctions.norm(col("embedding")).as("na"))
      .join(bench.select(col("vec_id").as("id_b"),
        col("embedding").as("eb"),
        VectorFunctions.norm(col("embedding")).as("nb")))
      .withColumn("cos", round(VectorFunctions.dot(col("ea"), col("eb")) /
        (col("na") * col("nb")), 6))
      .filter(col("cos") >= 0.45)
      .select("id_a", "id_b", "cos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    got shouldBe exact
  }

  test("semanticDeconResidualCheck: both contract flags hold when every " +
      "cell is probed (coverage is then exact by construction)") {
    val corpus = emb.filter(col("vec_id") % 10 =!= 0)
    val bench = emb.filter(col("vec_id") % 10 === 0)
    val rmodel = Pca.fitIvfResidual(corpus, kDims = 8)
    val row = Curation.semanticDeconResidualCheck(corpus, bench, 0.45,
      modelOpt = Some(rmodel), nprobe = rmodel.nlist).head()
    row.getBoolean(0) shouldBe true
    row.getBoolean(1) shouldBe true
  }

  test("crossDispatch: stage-1 analytics — a query-heavy call keeps the " +
      "banded arm without fitting; knnJoinCrossAuto's banded branch " +
      "equals knnJoinCross verbatim") {
    val corpus = emb.filter(pmod(col("vec_id"), lit(5)) =!= 0)
    val queries = emb.filter(pmod(col("vec_id"), lit(5)) === 0)
    // at gate scale the corpus signature amortizes over the query set:
    // analytic residual cost (probe floor × occupancy × kDims per
    // query) exceeds the banded scan, so stage 1 decides banded with
    // rmodel = None — no training paid for a decision training can't
    // change
    val cd = Pca.crossDispatch(corpus, queries.count())
    cd.residual shouldBe false
    cd.rmodel shouldBe None
    cd.analyticResidual should be >= cd.analyticBanded
    val auto = Pca.knnJoinCrossAuto(queries, corpus, 0.4, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val explicit = Similarity.knnJoinCross(queries, corpus, 0.4, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    auto shouldBe explicit
  }

  test("knnJoinCrossAuto: the forced residual branch serves a calibrated " +
      "budget and stays inside the exact answer's band") {
    val corpus = emb.filter(pmod(col("vec_id"), lit(5)) =!= 0)
    val queries = emb.filter(pmod(col("vec_id"), lit(5)) === 0)
      .filter(col("vec_id") < 40)
    val got = Pca.knnJoinCrossAuto(queries, corpus, 0.4, k = 3,
      force = Some(true)).collect()
    // every emitted cosine is exact (rerank contract): re-derive from
    // the exact cross reference rows
    val exact = Similarity.bruteForceTopK(corpus, queries, corpus.count().toInt)
      .select(col("query_id"), col("neighbor_id"), col("cos").as("ref"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    got.foreach { r =>
      r.getDouble(2) shouldBe exact((r.getLong(0), r.getLong(1)))
      r.getDouble(2) should be >= 0.4
    }
  }

  test("calibration ladder: a floor at the cap is still MEASURED at the " +
      "cap (r14 ADVICE — no unverified budget can leave the ladder " +
      "unmarked)") {
    val clustered = Dedup.materialize(Similarity.clusteredCorpus(emb))
    val rmodel = Pca.fitIvfResidual(clustered, kDims = 16, nlist = 16)
    val atCap = Pca.calibrateResidualBudget(clustered, rmodel,
      floor = rmodel.nlist)
    atCap.nprobe shouldBe rmodel.nlist
    atCap.measured shouldBe true
    // and an exhausted ladder reports ok = false with the recall it
    // measured AT the cap, instead of returning the cap silently: at
    // kDims = 1 on the near-isotropic corpus the ranking is too coarse
    // for the bar at ANY probe budget (ranking-bound by construction)
    val coarse = Pca.fitIvfResidual(emb, kDims = 1, nlist = 16)
    val exhausted = Pca.calibrateResidualBudget(emb, coarse, bar = 0.999,
      mult = 1)
    exhausted.measured shouldBe true
    if (!exhausted.ok) {
      exhausted.nprobe shouldBe coarse.nlist
      exhausted.recall should be < 1.0
    }
  }

  test("calibrateThresholdNprobe: a kill-sparse sample refuses to prune " +
      "(returns nlist), and the budget always lands in [floor, nlist]") {
    val corpus = emb.filter(col("vec_id") % 10 =!= 0)
    val bench = emb.filter(col("vec_id") % 10 === 0)
    val rmodel = Pca.fitIvfResidual(corpus, kDims = 8)
    // at threshold 0.45 this corpus holds a handful of kills — far
    // under minEvidence, so the sample carries no information about
    // where kills live and the honest budget is everything
    Pca.calibrateThresholdNprobe(corpus, rmodel.cents, bench,
      threshold = 0.45) shouldBe rmodel.nlist
    // evidence-rich regime (low threshold): the calibration prunes to
    // a measured prefix within the contract bounds
    val np = Pca.calibrateThresholdNprobe(corpus, rmodel.cents, bench,
      threshold = 0.0, floor = 4)
    np should be >= 4
    np should be <= rmodel.nlist
    // and the kill set at the calibrated budget covers the bar (the
    // contract the gate pins at 0.45 via the refuse-to-prune path)
    val row = Curation.semanticDeconResidualCheck(corpus, bench, 0.45,
      modelOpt = Some(rmodel)).head()
    row.getBoolean(0) shouldBe true
    row.getBoolean(1) shouldBe true
  }

  test("residualMoments width guard: the per-task accumulator budget " +
      "refuses a geometry that would silently OOM (quadratic in " +
      "embedding width)") {
    val prev = Pca.maxMomentTaskBytes
    try {
      Pca.maxMomentTaskBytes = 1024L // nlist·(1+d+d²)·8 ≫ 1 KB here
      val e = intercept[org.apache.spark.SparkException] {
        Pca.fitIvfResidual(emb, kDims = 8)
      }
      e.getMessage should include("residualMoments")
    } finally Pca.maxMomentTaskBytes = prev
  }
}
