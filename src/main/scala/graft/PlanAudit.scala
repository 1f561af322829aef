package graft

import org.apache.spark.sql.SparkSession

/** Plan-hygiene sweep: build (don't execute) every gate query's plan
  * and flag operators that are scale smells — cartesian products,
  * nested-loop joins, and single-partition global windows/sorts.
  * Queries whose DESIGN is an exact all-pairs baseline are
  * allowlisted explicitly, so any new flag is a regression signal.
  *
  * Streaming-replay queries execute on construction, so they are
  * skipped here (their plans are spec-audited). A few gates are
  * eager-by-construction without being streaming — dedup_components /
  * dedup_transitive_rows / dedup_components_incremental run the
  * convergence loop and dedup_simhash_pairs runs a sample-sizing
  * count() while their plan is built; they stay in the sweep (the
  * executed jobs are cheap at sf0.001 and their final plans are worth
  * flagging), the "build only" premise just doesn't hold for them.
  */
object PlanAudit {
  // sim_pairs_threshold: declared exact all-pairs baseline.
  // dedup_simhash_pairs: the self-check's brute-force Hamming scan.
  // sim_topk_bruteforce: broadcast queries × one candidate scan under a
  // non-equi predicate IS the O(Q×N) operator, not an accident.
  // sim_topk_pq / sim_topk_ivf_check: self-check gates that embed the
  // brute-force baseline they compare against (and PQ's ADC scan is
  // the same broadcast-queries shape over 8-byte codes).
  // sim_topk_pca: the candidate stage is the DELIBERATELY exhaustive
  // reduced-space scan (isolates projection quality from any index's
  // recall), and the check embeds the brute-force reference — both the
  // sim_topk_bruteforce shape; the at-scale composition swaps the scan
  // for ivfTopK over projected vectors.
  // sim_pairs_auto / sim_knn_auto: the dispatcher's COST-CHOSEN exact
  // arm at this n — the all-pairs scan is the decision, not an
  // accident (the banded arm is gated separately via
  // sim_pairs_auto_banded, which plans the bucketed equi-join).
  private val allPairsByDesign =
    Set("sim_pairs_threshold", "dedup_simhash_pairs", "sim_topk_bruteforce",
      "sim_topk_pq", "sim_topk_ivf_check", "sim_topk_pca",
      "sim_pairs_auto", "sim_knn_auto")
  private val streaming =
    Set("stream_gold_candles_1m", "stream_silver_typed", "stream_spread_join",
      "stream_threshold_alerts", "stream_sessions", "stream_silver_dedup",
      "stream_candles_sliding", "stream_candles_update", "stream_spread_left",
      "stream_candles_store")

  /** The other classic 100 TB trap: a window function with an EMPTY
    * partition spec funnels the whole input through ONE task ("No
    * Partition Defined for Window" — every row is one partition).
    * Checked on the plan TREE, not the string: a global single-row
    * aggregate also plans Exchange SinglePartition and is fine.
    *
    * Recurses through `AdaptiveSparkPlanExec` explicitly: under AQE
    * (default-on) the executed plan root is a LEAF node whose real
    * plan hangs off `inputPlan`, so a plain `TreeNode.exists` never
    * descends and would make this check silently vacuous
    * (spec-pinned in PlanAuditSpec).
    */
  private[graft] def hasGlobalWindow(
      p: org.apache.spark.sql.execution.SparkPlan): Boolean = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      hasGlobalWindow(a.inputPlan)
    case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => true
    // subquery plans hang off expressions, not `children` — without
    // this leg a global window inside a scalar/IN subquery would slip
    // through exactly like the AQE leaf did
    case other => (other.children ++ other.subqueries).exists(hasGlobalWindow)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val smells = Seq("CartesianProduct", "BroadcastNestedLoopJoin")
    var flagged = 0
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (n, _) => streaming(n) }
      .foreach { case (name, fn) =>
        val exec = fn(spark, sfDir).queryExecution.executedPlan
        val plan = exec.toString
        val hits = smells.filter(plan.contains) ++
          (if (hasGlobalWindow(exec)) Seq("GlobalWindow(one-task)") else Nil)
        if (hits.nonEmpty && !allPairsByDesign(name)) {
          flagged += 1
          println(s"[audit] FLAG $name: ${hits.mkString(", ")}")
        } else if (hits.nonEmpty) {
          println(s"[audit] ok (by design) $name: ${hits.mkString(", ")}")
        }
      }
    println(s"[audit] done, $flagged unexpected flags")
    spark.stop()
  }
}
