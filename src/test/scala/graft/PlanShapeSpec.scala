package graft

/** Structural plan-shape guards — the `.explain` audits PLANS.md records,
  * automated. These assert the properties that make the flagship plans
  * 100 TB-shaped (filters reaching the parquet scan, column pruning,
  * map-side partial aggregation, hint-driven broadcasts, top-k as
  * TakeOrderedAndProject, semi/anti join strategies) so a refactor that
  * silently regresses one fails a spec instead of waiting for a bench
  * round. Only hint-driven / structural facts are asserted — nothing
  * that AQE or statistics could legitimately re-plan at another scale.
  */
class PlanShapeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("q_filter_project: filters AND projection reach the parquet scan") {
    val p = planOf("q_filter_project")
    assert(p.contains("PushedFilters:"), p.take(400))
    assert(p.contains("GreaterThan(l_discount"), "discount filter not pushed")
    assert(p.contains("LessThan(l_quantity"), "quantity filter not pushed")
    // column pruning: the scan must read only the 5 referenced columns,
    // not the 16-column lineitem schema
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_shipdate") && !readSchema.contains("l_comment"),
      s"scan reads unreferenced columns: $readSchema")
  }

  test("q1_agg: shipdate filter pushed; aggregation is partial (map-side) before the exchange") {
    val p = planOf("q1_agg")
    assert(p.contains("LessThanOrEqual(l_shipdate"), "shipdate filter not pushed")
    assert(p.contains("partial_sum"), "no map-side partial aggregation")
    assert(p.contains("Exchange hashpartitioning(l_returnflag"),
      "group-by exchange missing or keyed wrong")
  }

  test("q3_topk: dimension broadcast honored; top-k is TakeOrderedAndProject, not a full sort") {
    val p = planOf("q3_topk")
    assert(p.contains("BroadcastHashJoin"), "customer broadcast hint not honored")
    assert(p.contains("TakeOrderedAndProject"),
      "ORDER BY + LIMIT did not plan as top-k")
  }

  test("q_semi_anti: semi and anti joins plan as real join strategies") {
    val p = planOf("q_semi_anti")
    assert(p.contains("LeftSemi"), "semi join missing")
    assert(p.contains("LeftAnti"), "anti join missing")
  }

  test("q_lang_id: native marker expression keeps the scan's Project in whole-stage codegen") {
    val p = planOf("q_lang_id")
    assert(p.contains("marker_best"), "native MarkerBest expression not in plan")
    // the Project must sit under a WholeStageCodegen span — a
    // CodegenFallback expression in it would strip the asterisk
    assert(p.linesIterator.exists(l => l.contains("Project") && l.trim.startsWith("*")),
      s"lang-id Project fell out of whole-stage codegen:\n${p.take(600)}")
  }

  test("q_store_search: store predicate reaches the parquet scan of the store table") {
    val p = planOf("q_store_search")
    assert(p.contains("PushedFilters:"), p.take(400))
  }

  test("dim joins broadcast across the TPC-H shapes (q5/q7/q13/q14/q18)") {
    // every one of these joins at least one side that is small at ANY
    // scale (region/nation/part dimension or a pre-aggregated subquery);
    // the plan must carry a BroadcastHashJoin, not shuffle the dim
    Seq("q5_revenue", "q7_volume", "q13_custdist", "q14_promo",
        "q18_large_orders").foreach { q =>
      val p = planOf(q)
      assert(p.contains("BroadcastHashJoin"),
        s"$q has no broadcast join:\n${p.take(800)}")
    }
  }

  test("no CartesianProduct anywhere in the registry (all queries, plans only)") {
    // Registry-wide sweep: build (don't execute) every registered query's
    // physical plan at sf0.001 and assert no CartesianProduct node.
    // Constant 1-row broadcast relations plan as BroadcastNestedLoopJoin,
    // which is fine; an actual CartesianProduct — both sides shuffled for
    // an unkeyed pairing — is never acceptable at any scale. Iterative
    // operators run their driver-side rounds during construction, so this
    // sweep also smoke-builds every plan the bench times.
    val bad = SparkEntry.queries.keys.toSeq.sorted.flatMap { q =>
      val plan = planOf(q)
      if (plan.contains("CartesianProduct")) Some(q) else None
    }
    assert(bad.isEmpty, s"cartesian products in: ${bad.mkString(", ")}")
  }

  test("q_logreg_step: the whole step is ONE partial-aggregatable global sum") {
    val p = planOf("q_logreg_step")
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      "no map-side partial aggregation — the model must ride the agg buffer")
    // a global (no-key) agg exchanges to a single partition; there must be
    // no hash-keyed exchange (no data-row shuffle) anywhere in the step
    assert(!p.contains("Exchange hashpartitioning"),
      s"logreg step shuffles data rows:\n${p.take(600)}")
  }

  test("q_sem_decontaminate: benchmark side broadcast; per-id max partially aggregated") {
    val p = planOf("q_sem_decontaminate")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"benchmark slice not broadcast:\n${p.take(600)}")
    assert(p.contains("partial_max"),
      "per-id struct max not map-side combined before the exchange")
  }

  test("q_mrl_recall / q_hamming_packed: probe side broadcast into the scoring loop") {
    Seq("q_mrl_recall", "q_hamming_packed").foreach { q =>
      val p = planOf(q)
      assert(p.contains("BroadcastNestedLoopJoin"),
        s"$q probe set not broadcast:\n${p.take(600)}")
    }
  }

  test("q_lsh_tune: config grid broadcast against the histogram; census joins hashed") {
    val p = planOf("q_lsh_tune")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"config grid not broadcast:\n${p.take(600)}")
    // the shingle census must be a real hash join on the 8-byte key
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"),
      "shingle census is not an equi-join")
  }

  test("q_mixture_weights: only domain-sized exchanges; the corpus never shuffles rows") {
    val p = planOf("q_mixture_weights")
    // per-domain (sum, count) must combine map-side
    assert(p.contains("partial_avg") || p.contains("partial_sum"),
      "domain aggregation not partial")
    // both normalizer joins ride broadcasts of 1-row/domain-sized relations
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"normalizer constants not broadcast:\n${p.take(600)}")
  }
}
