package graft

/** Quantitative scale gate: the EXCHANGE BUDGET of every headline
  * operator, pinned. PlanLint catches qualitative scale-killers
  * (SortAggregate, cartesians); this pins the exact number of
  * shuffles the flagship plans are allowed — the "one shuffle, on the
  * right key" claims in SURVEY §2 become machine-checked instead of
  * prose. A future edit that silently adds an exchange (a lost
  * broadcast, an extra repartition, a join that stopped reusing its
  * input's partitioning) fails here by name.
  *
  * Budgets are ceilings measured from the current plans; evals that
  * deliberately run a config ladder (the *_sweep ops) are not listed
  * — their cost is per-config by design.
  */
class ShuffleBudgetSpec extends SparkSpec {

  // op -> (max shuffle exchanges, min broadcast exchanges)
  private val budgets: Seq[(String, Int, Int)] = Seq(
    // the KTable/fold core: ONE hash shuffle on the aggregate key
    ("es_latest_state", 1, 0),
    ("es_state_fold", 1, 0),
    ("es_compaction", 1, 0),
    ("es_changelog", 2, 0),   // two packed aggs, sort-free SHJ between
    ("es_offset_audit", 3, 0), // countDistinct two-phase + ONE tiny-table
                               // exchange for the bucket-grid windows
                               // (|log|/1024 rows — not corpus-scale)
    // metrics: single-pass aggregations
    ("metric_stats", 1, 0),
    ("metric_downsample", 1, 0),
    ("metric_heatmap", 1, 0),
    ("win_tumbling", 1, 0),
    // relational headliners: fact shuffles once, dims broadcast
    ("q1_agg", 1, 0),
    ("q3_join", 1, 2),
    ("q5_multijoin", 1, 4),
    ("q18_having", 2, 1),
    ("outer_join", 2, 0),
    ("topk_custom", 1, 1),
    // behavioral: windows keyed on the one shuffle's key
    ("behavior_transitions", 3, 0),
    ("behavior_pathing", 2, 0),
    // pipeline/text/dedup single-scan reports
    ("dedup_exact", 1, 0),
    ("mm_dedup", 2, 0),
    ("text_hapax", 2, 0),
    ("corpus_card", 2, 0),
    // the k-NN graph: the bucket-count stats pass (skew sizing), two
    // explicit pinned (bucket, salt) exchanges (the self-join's sides
    // are repartitioned by hand — AQE sizes post-shuffle parallelism
    // from PRE-join bytes and coalesced the expanding bucket join to
    // 2 tasks at the sf10 scale smoke; the salt splits the hot
    // cluster's bucket), the salted c-side explode's exchange, and
    // the top-k window's vec_id exchange over the ≤3-per-vector
    // survivors
    ("knn_graph", 5, 0))

  test("headline operators stay inside their pinned exchange budgets") {
    // Other suites cache() shared frames in the one JVM-wide session;
    // a plan that picks up an InMemoryRelation prints the CACHED
    // plan's exchanges inline and double-counts. Budgets are about the
    // cold plan — drop the cache first (later suites just recompute).
    spark.sharedState.cacheManager.clearCache()
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    budgets.foreach { case (name, maxShuffles, minBroadcasts) =>
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      val sh = Seq("Exchange hashpartitioning", "Exchange rangepartitioning",
        "Exchange SinglePartition").map(p => p.r.findAllIn(plan).length).sum
      val bc = "BroadcastExchange".r.findAllIn(plan).length
      if (sh > maxShuffles)
        failures += s"$name: $sh shuffles (budget $maxShuffles)"
      if (bc < minBroadcasts)
        failures += s"$name: $bc broadcasts (expected >= $minBroadcasts — a dim stopped broadcasting)"
    }
    assert(failures.isEmpty, s"exchange-budget violations:\n${failures.mkString("\n")}")
  }
}
