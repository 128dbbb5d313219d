package graft.queries

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.SparkSpec

/** Plan-shape regression guard: the scale claims made per query in
  * PLANS.md/COVERAGE.md (zero-shuffle scan-stage packs, broadcast dim
  * joins, map-side group-limit top-k) are ASSERTED here against the
  * executed plans, so a future edit that silently adds an exchange or
  * drops a broadcast fails the suite instead of only the bench. */
class PlanShapeSpec extends SparkSpec {

  private final case class Shape(
      name: String, scans: Option[Int], shuffles: Option[Int],
      mustContain: Seq[String] = Nil, mustNotContain: Seq[String] = Nil,
      planTextMustContain: Seq[String] = Nil,
      confs: Seq[(String, String)] = Nil)

  // expectations at sf0.001; AQE runs, so counts come from the
  // materialized adaptive plan
  private val shapes = Seq(
    Shape("lt13_gopher_rules", scans = Some(1), shuffles = Some(0)),
    // lt31: the whole scorecard (5 signal families + fused verdict) is
    // one scan-stage pass — the claim that justifies its existence
    Shape("lt31_curation_scorecard", scans = Some(1), shuffles = Some(0)),
    Shape("f_hof_pack", scans = Some(1), shuffles = Some(0)),
    Shape("f_map_pack", scans = Some(1), shuffles = Some(0)),
    Shape("f_try_pack", scans = Some(1), shuffles = Some(0)),
    Shape("f_variant_pack", scans = Some(1), shuffles = Some(0)),
    Shape("o7_zorder_layout", scans = Some(1), shuffles = Some(0)),
    // lm4: the patch-grid accounting is pure scan-stage column arithmetic
    Shape("lm4_patch_tokens", scans = Some(1), shuffles = Some(0)),
    // lt15: the RETURNED scoring plan is a zero-shuffle literal-map fold
    // (the two bounded stats aggregations run as separate jobs before it)
    Shape("lt15_importance_weights", scans = Some(1), shuffles = Some(0)),
    // lt22: tokenize + window explode + slice all fuse into the scan stage
    Shape("lt22_rag_chunks", scans = Some(1), shuffles = Some(0)),
    Shape("o1_topk", scans = Some(1), shuffles = Some(0),
      mustContain = Seq("TakeOrderedAndProject")),
    // the JOIN itself adds no exchange; the single shuffle is the final
    // per-supplier aggregation's
    Shape("j2_fact_dim_broadcast", scans = None, shuffles = Some(1),
      mustContain = Seq("BroadcastHashJoin")),
    Shape("j12_lateral_topn", scans = None, shuffles = Some(1),
      mustContain = Seq("WindowGroupLimit", "BroadcastHashJoin")),
    // sql8: the 8-relation star must resolve every dim join as a hash
    // join (dims broadcast); any fallback to a nested loop would be a
    // 100 TB catastrophe
    Shape("sql8_market_share", scans = None, shuffles = None,
      mustContain = Seq("BroadcastHashJoin"),
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    // sql19: the OR-of-ANDs predicate must NOT swallow the p_partkey
    // equi-key — the join stays hash, the disjunction filters post-join
    Shape("sql19_disjunctive_revenue", scans = None, shuffles = None,
      mustContain = Seq("BroadcastHashJoin"),
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    // sql21: EXISTS/NOT EXISTS with a non-equi correlated conjunct must
    // decorrelate to hash semi/anti joins on the equi part, never a
    // nested loop over the fact
    Shape("sql21_waiting_suppliers", scans = None, shuffles = None,
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    // bgeo_pair_join: the planner must extract the (cell, cell) equi keys
    // from the mixed join condition — a nested loop over points x points
    // is exactly what the cell blocking exists to prevent
    Shape("bgeo_pair_join", scans = None, shuffles = None,
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    // lq6: the whole manifest (verdict + dup election + split) must stay
    // ONE documents scan and exactly two keyed exchanges — md5(text) for
    // the dup window, (is_keep, lang) for the split windows; a third
    // exchange or second scan means the ledger regressed to the lt6
    // agg+self-join anti-pattern
    Shape("lq6_train_manifest", scans = Some(1), shuffles = Some(2),
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    // lq8: the wipe audit is ONE scan; the exact-distinct wiped-user
    // count expands to Spark's standard two-phase distinct aggregate
    // (an extra (event_type, user) keyed exchange with map-side partials
    // — skew-safe) — a semi/anti-join formulation would triple-scan events
    Shape("lq8_retention_wipe", scans = Some(1), shuffles = Some(2)),
    // lq7: one corpus scan; the group agg and the lang-keyed
    // generalization window each cost one exchange over GROUP-cardinality
    // rows only
    Shape("lq7_k_anonymity", scans = Some(1), shuffles = Some(2)),
    // w13: both windows (row index + frame sums) must share the single
    // user-keyed exchange
    Shape("w13_rolling_slope", scans = Some(1), shuffles = Some(1)),
    // a33: histogram + argmax; the rank filter must push into the
    // shuffle as a group-limit
    Shape("a33_mode", scans = Some(1), shuffles = None,
      mustContain = Seq("WindowGroupLimit")),
    // m3: the merge-law demo reads base and delta as separate scans BY
    // DESIGN (at scale the base is a materialization, not a rescan)
    Shape("m3_incremental_agg", scans = Some(2), shuffles = None),
    // ls12: the 64-row dim-stats table must broadcast onto the corpus —
    // a shuffle join here would re-shuffle the whole exploded corpus
    Shape("ls12_embed_standardize", scans = None, shuffles = None,
      mustContain = Seq("BroadcastHashJoin"),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    // w12: the (type, hour) forecast table must broadcast onto the
    // holdout scan
    Shape("w12_seasonal_backtest", scans = None, shuffles = None,
      mustContain = Seq("BroadcastHashJoin"),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    // lt45: one documents scan, ONE (band, shard) exchange — band alone
    // (~log-many values) would hot-spot; a second exchange means the
    // capacity/pos columns stopped sharing the window partitioning
    Shape("lt45_length_batches", scans = Some(1), shuffles = Some(1),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    // lt46: the epoch table is a broadcast literal (no scan, no shuffle
    // of its own); the corpus pays ONE (epoch, shard) exchange
    Shape("lt46_epoch_shuffle", scans = Some(1), shuffles = Some(1),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    // lt47: the lt45 × lt46 composition keeps ONE keyed exchange — on
    // (epoch, band, shard) — with the epoch table still a broadcast
    // literal; a second exchange means the batch columns stopped sharing
    // the window partitioning
    Shape("lt47_epoch_batches", scans = Some(1), shuffles = Some(1),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    // ls16: every query-side table (terms, df, idf, corpus stats)
    // broadcasts onto the postings — the corpus must never exchange
    // keyed by term, so no sort-merge join may appear anywhere (the
    // 1-row stats cross joins are broadcast nested loops, which are fine)
    Shape("ls16_bm25", scans = None, shuffles = None,
      mustContain = Seq("BroadcastHashJoin"),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    // s7: the skew-stress query MUST keep the salted two-phase shape —
    // the __salt column in the phase-1 grouping is what spreads hot-key
    // 0's 90% of rows across reducers; losing it (or falling back to a
    // one-phase distinct over the raw key) recreates the hot partition
    // the operator exists to prevent
    Shape("s7_skewed_hot_agg", scans = None, shuffles = None,
      mustNotContain = Seq("CartesianProduct", "SortMergeJoin"),
      planTextMustContain = Seq("__salt")),
    // s8: the differentiated skew join must keep __salt in the join key
    // (the hot-key spread) and never degenerate to a nested loop
    Shape("s8_salted_skew_join", scans = None, shuffles = None,
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoopJoin"),
      planTextMustContain = Seq("__salt")),
    // lt48/lt49: the returned plan is ONE documents scan joined against
    // the checkpointed cluster map by id — the split/weight math adds no
    // window and no extra corpus pass
    Shape("lt48_leakage_safe_split", scans = Some(1), shuffles = None,
      mustNotContain = Seq("CartesianProduct")),
    Shape("lt49_soft_dedup_weights", scans = Some(1), shuffles = None,
      mustNotContain = Seq("CartesianProduct")),
    // lt50: the reference count tables must BROADCAST onto the doc-bigram
    // table (Zipf-hot 'prev' keys as shuffle-join keys would re-exchange
    // the corpus by context) — at sf they broadcast outright; at scale
    // AQE's skew handling takes over, but never a corpus sort-merge here
    Shape("lt50_xent_filter", scans = None, shuffles = None,
      mustContain = Seq("BroadcastHashJoin"),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    // o8: bounds/zone/predicate tables are 1-to-32-row broadcasts; the
    // corpus-side work is scan + hash aggregates only — a sort-merge join
    // anywhere means a bounded table stopped broadcasting
    Shape("o8_zone_map_audit", scans = None, shuffles = None,
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    // dq4: every parent key set joins as a hash join (dims broadcast);
    // a nested loop over a fact table would be the 100 TB catastrophe
    Shape("dq4_referential_integrity", scans = None, shuffles = None,
      mustContain = Seq("BroadcastHashJoin"),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct",
        "BroadcastNestedLoopJoin")),
    // lg5: the returned plan reads the round-4 checkpoint (no file scan)
    // and pays ONE id-keyed exchange for the final degree count
    Shape("lg5_kcore", scans = Some(0), shuffles = Some(1),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct",
        "BroadcastNestedLoopJoin")),
    // lq12: the exact confirm is a BROADCAST anti-join over the bounded
    // survivor set (non-equi by nature, so a nested loop — but against a
    // maxSurvivors-capped broadcast, never the corpus); the corpus itself
    // must not sort-merge or cartesian anywhere
    Shape("lq12_pareto_frontier", scans = None, shuffles = None,
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    // ld19: blocking is the ld12 geometry (groupByKey confirm) + one
    // eval-keyed window over confirmed hits — no join pathology may appear
    Shape("ld19_semantic_contamination", scans = None, shuffles = None,
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct",
        "BroadcastNestedLoopJoin")),
    // lq13: one documents scan; the group agg exchange + the QI-keyed
    // window/final-agg exchange — GROUP-cardinality rows only
    Shape("lq13_l_diversity", scans = Some(1), shuffles = Some(2),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    // ls17: the probe-cell candidate join must stay an equi hash join on
    // cell — never a corpus sort-merge or a nested loop over vectors
    Shape("ls17_mips", scans = None, shuffles = None,
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    // w14: all three rolling quantiles + the fence flag share ONE
    // user-keyed exchange — a second exchange means a quantile window
    // stopped sharing the partitioning
    Shape("w14_rolling_tukey", scans = Some(1), shuffles = Some(1),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    // m4: the maintenance join runs over HISTOGRAM-cardinality rows (a
    // full-outer on (key, v) — sort-merge is fine THERE); what must never
    // appear is a cartesian anywhere
    Shape("m4_retractable_agg", scans = None, shuffles = None,
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    // a38: ONE lineitem scan collapses to the (flag, v) weight histogram;
    // the cumulative windows + final agg ride the flag-keyed exchange —
    // value-domain rows only, no joins anywhere
    Shape("a38_weighted_quantiles", scans = Some(1), shuffles = Some(2),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct",
        "BroadcastNestedLoopJoin")),
    // lt52/ls18: drift audits are ONE corpus scan collapsing to a
    // vocabulary/dimension summary; the top-k must ride a
    // TakeOrderedAndProject, never a global sort of the summary
    Shape("lt52_token_drift", scans = Some(1), shuffles = None,
      mustContain = Seq("TakeOrderedAndProject"),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    Shape("ls18_embedding_drift", scans = Some(1), shuffles = None,
      mustContain = Seq("TakeOrderedAndProject"),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    // lt51: the needle tables broadcast onto the shingle postings — the
    // corpus must never exchange keyed by shingle for a 3-needle search,
    // and no scan of text happens outside the candidate confirm
    Shape("lt51_trgm_search", scans = None, shuffles = None,
      mustContain = Seq("BroadcastHashJoin"),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    // e7 SCALE path (threshold forced to 0 so the adaptive guard picks the
    // two-pass branch): the three customer-grain ranks run through
    // Sampling.globalOrderedRank (range-partitioned sort + zipWithIndex,
    // the ld21 two-pass) — the plan must carry NO Window node at all; a
    // PARTITION-BY-less Window here would serialize the whole customer
    // frame through one task at billion-customer scale. Below the
    // threshold the guard deliberately picks the window plan (measured
    // count = a proof of boundedness), which the next Shape pins.
    Shape("e7_rfm_segmentation", scans = None, shuffles = None,
      mustNotContain = Seq("Window", "CartesianProduct"),
      confs = Seq("graft.e7.rankWindowMax" -> "0")),
    // e7 SMALL path: at spec scale the measured customer count is under
    // the default threshold, so the cheap single-task window plan is the
    // correct choice — pin that the guard actually takes it
    Shape("e7_rfm_segmentation", scans = None, shuffles = None,
      mustContain = Seq("Window")))

  /** Flatten INCLUDING materialized AQE query stages (QueryStageExec is a
    * leaf whose real subtree hangs off `.plan`). */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec => Seq(s.plan)
      case other => other.children
    }
    p +: kids.flatMap(flatten)
  }

  shapes.foreach { sh =>
    val suffix = if (sh.confs.isEmpty) ""
      else sh.confs.map { case (k, v) => s"$k=$v" }.mkString(" [", ", ", "]")
    test(s"${sh.name} keeps its documented plan shape$suffix") {
      val saved = sh.confs.map { case (k, _) => k -> spark.conf.getOption(k) }
      // conf-set, construction and collect all sit INSIDE the try: a
      // throwing query would otherwise skip the finally and leak e.g.
      // graft.e7.rankWindowMax=0 into every later test on this session
      // the adaptive scan fanout (Td.fanout) is a SMALL-INPUT layout
      // adaptation — at real scale row groups ≫ cores and it never fires —
      // so the scale shapes pinned here are asserted with it off (its own
      // firing rule is pinned in TdFanoutSpec)
      val saved0 = spark.conf.getOption("graft.scan.fanout")
      try {
        spark.conf.set("graft.scan.fanout", "false")
        sh.confs.foreach { case (k, v) => spark.conf.set(k, v) }
        val df = Registry.queries(sh.name)(spark, Sf0001)
        df.collect() // materialize so AQE finalizes its stages
        val nodes = flatten(df.queryExecution.executedPlan)
        val names = nodes.map(_.nodeName)
        val scanCount = nodes.count {
          case _: FileSourceScanExec | _: BatchScanExec => true
          case _ => false
        }
        val shuffleCount = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
        sh.scans.foreach(n => assert(scanCount == n,
          s"${sh.name}: expected $n scans, got $scanCount:\n${df.queryExecution.executedPlan}"))
        sh.shuffles.foreach(n => assert(shuffleCount == n,
          s"${sh.name}: expected $n shuffles, got $shuffleCount:\n${df.queryExecution.executedPlan}"))
        sh.mustContain.foreach(frag => assert(names.contains(frag),
          s"${sh.name}: plan lacks $frag:\n${df.queryExecution.executedPlan}"))
        sh.mustNotContain.foreach(frag => assert(!names.contains(frag),
          s"${sh.name}: plan contains forbidden $frag:\n${df.queryExecution.executedPlan}"))
        // fragments asserted against the RENDERED plan (grouping keys,
        // join conditions — detail the nodeName list cannot see)
        lazy val planText = nodes.map(_.toString).mkString("\n")
        sh.planTextMustContain.foreach(frag => assert(planText.contains(frag),
          s"${sh.name}: rendered plan lacks $frag:\n${df.queryExecution.executedPlan}"))
      } finally {
        saved0 match {
          case Some(v) => spark.conf.set("graft.scan.fanout", v)
          case None => spark.conf.unset("graft.scan.fanout")
        }
        saved.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None) => spark.conf.unset(k)
        }
        graft.llm.Caches.releaseAll(spark)
      }
    }
  }
}
