package graft

import graft.sources.Bucketing
import graft.streaming.Sessionize
import org.apache.spark.sql.functions._

class ScalePathSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed co-located join produces no shuffle Exchange") {
    Bucketing.bucketize(Tables(spark, sf).orders, "b_orders", "o_custkey", 8)
    Bucketing.bucketize(Tables(spark, sf).customer
      .withColumnRenamed("c_custkey", "o_custkey"), "b_customer", "o_custkey", 8)
    // force the shuffle-join path (a broadcast join would hide the point:
    // at 100 TB neither side broadcasts)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.table(spark, "b_orders")
        .join(Bucketing.table(spark, "b_customer"), "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scans not bucketed:\n$plan")
      assert(joined.count() ==
        Tables(spark, sf).orders.join(
          Tables(spark, sf).customer, col("o_custkey") === col("c_custkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("decontaminate plan: benchmark grams broadcast, corpus side never shuffled pre-join") {
    val docs = Tables(spark, sf).documents
    val out = graft.dedup.Dedup.decontaminate(
      docs.filter($"doc_id" % 10 =!= 1), "doc_id", "text",
      docs.filter($"doc_id" % 10 === 1), "text", n = 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"gram join not broadcast:\n$plan")
    // the only Exchanges allowed are for the (tiny) hit-set aggregation and
    // final left join — never a hashpartitioning of the exploded corpus grams
    assert(!plan.contains("SortMergeJoin"), s"corpus grams shuffled for a SMJ:\n$plan")
  }

  test("semDedup pair join is cid-blocked (hash join, never a cross product)") {
    val out = graft.dedup.Dedup.semDedup(
      Tables(spark, sf).embeddings, "vec_id", "embedding", nlist = 8, threshold = 0.3)
    val plan = out.queryExecution.executedPlan.toString
    // the within-cluster prune must be an equi join on the cluster id —
    // a nested-loop/cartesian here is the O(n²) cliff the blocking exists
    // to prevent
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"semDedup pair join degenerated to all-pairs:\n$plan")
    assert(plan.contains("Join") && plan.contains("LeftAnti"),
      s"expected blocked pair join + anti join:\n$plan")
  }

  test("round-4 operator plans: broadcasts where promised, no corpus cross joins") {
    val docs = Tables(spark, sf).documents
    // DSIR: the log-ratio table must come in as a broadcast, never an SMJ
    // of the exploded token stream against it
    val dsir = graft.ops.Curation.dsirWeights(docs, "doc_id", "text", $"lang" === "en")
    val dsirPlan = dsir.queryExecution.executedPlan.toString
    assert(dsirPlan.contains("BroadcastHashJoin"), s"DSIR ratios not broadcast:\n$dsirPlan")
    // perplexity: the bigram-prob rejoin is deliberately NOT hint-forced
    // (bigram types grow ~linearly with corpus size — Heaps' law — so a
    // forced broadcast would blow the driver at scale; AQE picks broadcast
    // when the model actually fits). Contract: no cross join, no forced
    // broadcast on the model side.
    val ppl = graft.ops.Curation.bigramPerplexity(docs, "doc_id", "text")
    val pplPlan = ppl.queryExecution.executedPlan.toString
    assert(!pplPlan.contains("CartesianProduct"), s"ppl cross join:\n$pplPlan")
    // a reintroduced broadcast(probs) hint folds into the Join node as
    // leftHint/rightHint=(strategy=broadcast) in the optimized plan
    // (EliminateResolvedHint always removes the ResolvedHint node itself).
    // Exactly ONE broadcast hint is legitimate: the 1-row vocab-size
    // constants cross join; a second means the Heaps'-law-unbounded model
    // table got force-broadcast again.
    val pplLogical = ppl.queryExecution.optimizedPlan.toString
    val nHints = pplLogical.sliding("strategy=broadcast".length)
      .count(_ == "strategy=broadcast")
    assert(nHints <= 1, s"ppl model force-broadcast hint survived:\n$pplLogical")
    // temperature mix: rates broadcast back, corpus never hash-repartitioned
    val mix = graft.ops.Sampling.temperatureMix(docs, "doc_id", "lang", 0.5)
    val mixPlan = mix.queryExecution.executedPlan.toString
    assert(mixPlan.contains("BroadcastHashJoin"), s"mix rates not broadcast:\n$mixPlan")
    // chunking and gopher stats are scan-stage only: no Exchange at all
    val chunks = graft.ops.Chunking.slidingChunks(docs, "doc_id", "text", 32, 24)
    assert(!chunks.queryExecution.executedPlan.toString.contains("Exchange"),
      "chunking introduced a shuffle")
    val gopher = docs.select($"doc_id" +: graft.functions.TextFunctions.gopherStats($"text"): _*)
    assert(!gopher.queryExecution.executedPlan.toString.contains("Exchange"),
      "gopher stats introduced a shuffle")
    // C4 line battery: per-doc array math only, never a shuffle
    val c4 = graft.ops.Curation.c4LineFilter(
      docs.select($"doc_id", split($"text", " ").as("lines")),
      "doc_id", $"lines", 3, 5, Seq("slow"), Seq("lorem ipsum"))
    assert(!c4.queryExecution.executedPlan.toString.contains("Exchange"),
      "c4 line filter introduced a shuffle")
  }

  test("repetition profile is a pure scan-stage projection (no Exchange)") {
    import graft.functions.TextFunctions
    val out = Tables(spark, sf).documents
      .select($"doc_id" +: TextFunctions.repetitionStats($"text"): _*)
      .select($"doc_id" +: TextFunctions.repetitionMetrics($"__rep"): _*)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"repetition stats shuffle:\n$plan")
  }

  test("gap sessionization via flatMapGroupsWithState (batch path)") {
    val evs = Seq(
      Sessionize.Event(1, 0L, "a"), Sessionize.Event(1, 1000L, "b"),
      Sessionize.Event(1, 100000L, "c"), // gap > 30s → new session
      Sessionize.Event(2, 500L, "x")).toDS()
    val ses = Sessionize.sessions(evs, gapMs = 30000).collect().sortBy(s => (s.userId, s.startMs))
    assert(ses.toSeq == Seq(
      Sessionize.Session(1, 0L, 1000L, 2),
      Sessionize.Session(1, 100000L, 100000L, 1),
      Sessionize.Session(2, 500L, 500L, 1)))
  }

  test("batchSessions agrees with the stateful sessionizer and is one shuffle") {
    val evs = Tables(spark, sf).events.limit(2000)
      .select(col("user_id").as("userId"), unix_millis(col("ts")).as("tsMs"),
        col("event_type").as("eventType"))
      .as[Sessionize.Event]
    val gap = 3600 * 1000L
    val stateful = Sessionize.sessions(evs, gap).collect()
      .map(s => (s.userId, s.startMs, s.endMs, s.nEvents.toLong)).sorted.toSeq
    val declarative = Sessionize.batchSessions(
        evs.toDF(), "userId", "tsMs", gapS = gap) // units cancel: both ms
      .select(col("userId"), col("session_start"), col("session_end"),
        col("n_events"))
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(declarative == stateful && declarative.nonEmpty)
    // the window's hash partitioning on the key must satisfy the final
    // (key, session) grouping: exactly ONE exchange end-to-end
    val plan = Sessionize.batchSessions(evs.toDF(), "userId", "tsMs", gap)
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1, s"expected one exchange:\n$plan")
  }

  test("grouping sets expand to ONE pass (single Expand, single agg shuffle)") {
    val gs = Queries.qGroupingSets.run(spark, sf)
    val plan = gs.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"no Expand:\n$plan")
    assert(plan.split("Exchange").length - 1 == 1, s"expected one exchange:\n$plan")
  }

  test("round-5 operator plans: no cross joins, bounded shuffles") {
    // funnel: three shrinking user_id joins — never a cartesian
    val funnel = Queries.qFunnel.run(spark, sf)
    assert(!funnel.queryExecution.executedPlan.toString.contains("CartesianProduct"))
    // hopping windows: scan-stage explode + ONE shuffle on window start
    val hop = Queries.qHopping.run(spark, sf)
    val hopPlan = hop.queryExecution.executedPlan.toString
    assert(hopPlan.split("Exchange").length - 1 == 1, s"hopping shuffles:\n$hopPlan")
    // audit: one scan of events — a per-check UNION of scans would show
    // one FileScan per check
    val audit = Queries.qDqAudit.run(spark, sf)
    val auditPlan = audit.queryExecution.executedPlan.toString
    assert(auditPlan.split("FileScan|Scan parquet").length - 1 <= 1,
      s"audit re-scans input:\n$auditPlan")
    // unpivot: Expand over the aggregate, no extra exchange beyond the agg's
    val unp = Queries.qUnpivot.run(spark, sf)
    val unpPlan = unp.queryExecution.executedPlan.toString
    assert(unpPlan.contains("Expand") && unpPlan.split("Exchange").length - 1 == 1,
      s"unpivot plan:\n$unpPlan")
  }

  test("robust-stats/TPC-H wave plans: broadcasts + bounded shuffles") {
    // q18: the qualifying-order set joins as a broadcast SEMI join
    val q18 = Queries.q18LargeOrders.run(spark, sf)
    val p18 = q18.queryExecution.executedPlan.toString
    assert(p18.contains("BroadcastHashJoin") && p18.contains("LeftSemi"),
      s"q18 semi join not broadcast:\n$p18")
    // solo-supplier: self anti join must stay an equi join on orderkey,
    // never a nested loop over the fact table
    val solo = Queries.qSoloSupplier.run(spark, sf)
    val pSolo = solo.queryExecution.executedPlan.toString
    assert(!pSolo.contains("CartesianProduct") &&
      !pSolo.contains("BroadcastNestedLoop"),
      s"solo-supplier anti join degenerated:\n$pSolo")
    assert(pSolo.contains("LeftAnti"), s"expected anti join:\n$pSolo")
    // outliers: fence table broadcasts back; events are never shuffled
    // before the join (only the tiny per-type aggregates exchange)
    val out = Queries.qOutliers.run(spark, sf)
    val pOut = out.queryExecution.executedPlan.toString
    assert(pOut.contains("BroadcastHashJoin"), s"fences not broadcast:\n$pOut")
    // transitions + anomaly + ffill: exactly one user_id sort feeds the
    // window work (one Exchange hashpartitioning(user_id...))
    Seq(Queries.qTransitions, Queries.qAnomaly, Queries.qFfill).foreach { q =>
      val p = q.run(spark, sf).queryExecution.executedPlan.toString
      assert(p.split("Exchange hashpartitioning\\(user_id").length - 1 == 1,
        s"${q.name}: expected one user_id exchange:\n$p")
    }
  }

  test("round-6 operator plans: EWMA one shuffle, triangles no cartesian") {
    // EWMA: the groupBy(key) exchange is the ONLY shuffle — the fold is a
    // codegen'd aggregate over the gathered series, and explode adds no
    // exchange. (An accidental window/self-join formulation would add
    // sort-spill exchanges here.)
    val ev = Tables(spark, sf).events
      .withColumn("ts_s", unix_seconds(col("ts").cast("timestamp")))
    val ewma = graft.ops.Smoothing.ewma(ev, "user_id", "ts_s", "event_id", "value", 0.15)
    val ewmaPlan = ewma.queryExecution.executedPlan.toString
    assert(ewmaPlan.split("Exchange").length - 1 == 1,
      s"ewma should be exactly one exchange:\n$ewmaPlan")
    // triangles: every join is a hash/merge join on real keys — the wedge
    // and closure joins must never degrade to a cartesian product, and no
    // node-count-sized relation is broadcast (degree table joins shuffle)
    import spark.implicits._
    val edges = (1L to 400L).flatMap(a => Seq((a, a % 97 + 1000L), (a, a % 89 + 2000L)))
      .toDF("src", "dst")
    val tri = graft.graph.Graph.triangles(edges)
    val triPlan = tri.queryExecution.executedPlan.toString
    assert(!triPlan.contains("CartesianProduct") && !triPlan.contains("BroadcastNestedLoop"),
      s"triangles degraded to a product join:\n$triPlan")
  }

  test("round-6 second-wave plans: blocked joins never degrade to products") {
    // fuzzy match: the first-word blocking must plan as a hash join —
    // a cartesian here means the block key was lost and J-W runs on
    // all part pairs
    val fuzzy = DedupQueries.qFuzzyMatch.run(spark, sf)
    val fuzzyPlan = fuzzy.queryExecution.executedPlan.toString
    assert(!fuzzyPlan.contains("CartesianProduct")
      && !fuzzyPlan.contains("BroadcastNestedLoop"),
      s"fuzzy match lost its block key:\n$fuzzyPlan")
    // itemsets: the pair self-join keys on the order id
    val items = Queries.qItemsets.run(spark, sf)
    val itemsPlan = items.queryExecution.executedPlan.toString
    assert(!itemsPlan.contains("CartesianProduct")
      && !itemsPlan.contains("BroadcastNestedLoop"),
      s"itemsets pair join degraded:\n$itemsPlan")
    // attribution: user-equality join with the 7-day range as residual —
    // equality must drive the join, range must not force a product
    val attr = Queries.qAttribution.run(spark, sf)
    val attrPlan = attr.queryExecution.executedPlan.toString
    assert(!attrPlan.contains("CartesianProduct")
      && !attrPlan.contains("BroadcastNestedLoop"),
      s"attribution range join degraded:\n$attrPlan")
    // cross-repeat adjacency: rank+1 equality self-join, never all-pairs
    val cross = TextQueries.qCrossRepeat.run(spark, sf)
    val crossPlan = cross.queryExecution.executedPlan.toString
    assert(!crossPlan.contains("CartesianProduct")
      && !crossPlan.contains("BroadcastNestedLoop"),
      s"cross-repeat adjacency degraded:\n$crossPlan")
  }

  test("suffix-array build is ONE doc-keyed exchange for all rounds") {
    // every window in the prefix-doubling loop partitions by doc id, so
    // the whole build must plan as a single hash exchange followed by
    // in-partition sorts — a second exchange would mean some round lost
    // the partitioning (e.g. a window keyed on something else)
    import spark.implicits._
    val docs = Seq((1L, "abracadabra"), (2L, "mississippi"))
      .toDF("id", "t")
    val sa = graft.ops.SuffixArrays.suffixRanks(docs, "id", "t", cap = 16)
    val plan = sa.queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1,
      s"suffixRanks should be exactly one exchange:\n$plan")
  }

  test("gap sessionization over real events agrees with window-based count") {
    val evs = Tables(spark, sf).events.limit(2000)
      .select(col("user_id").as("userId"), unix_millis(col("ts")).as("tsMs"),
        col("event_type").as("eventType"))
      .as[Sessionize.Event]
    val gap = 3600 * 1000L
    val got = Sessionize.sessions(evs, gap).count()
    // oracle: session starts = events whose gap from previous > gap
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("userId")).orderBy(col("tsMs"))
    val want = evs.toDF()
      .withColumn("prev", lag(col("tsMs"), 1).over(w))
      .filter(col("prev").isNull || col("tsMs") - col("prev") > gap)
      .count()
    assert(got == want && got > 0)
  }

  // ---- round-9 Catalyst-trap regression gates -------------------------
  // The three traps (PLANS.md / round-9): CollapseProject inlining of
  // let-bound arrays, per-fold-step re-evaluation inside aggregate()
  // lambdas, lateral alias capture. These gates fail loudly if a future
  // Spark upgrade re-inlines or re-shapes the fixed plans.

  private def countOccurrences(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  test("gate: winnow fingerprints — no window/sort, fused native selection") {
    val fps = graft.ops.Winnow.fingerprints(
      Tables(spark, sf).documents, "doc_id", "text")
    val plan = fps.queryExecution.executedPlan.toString
    // the zero-shuffle fused form: no Window, no Sort (the pre-rewrite
    // explode+window shape had both). The only Exchange allowed is the
    // Spread parallelism floor (identity at real split counts).
    assert(!plan.contains("Window"), s"winnow regressed to a window:\n$plan")
    assert(!plan.contains("Sort "), s"winnow regressed to a sort:\n$plan")
    assert(countOccurrences(plan, "Exchange") <= 1,
      s"winnow shuffles beyond the Spread floor:\n$plan")
    // round 17: the whole selection (gram md5 → sliding min → distinct)
    // is ONE native expression — exactly one winnow_fps call site under
    // the explode, and no expression-tree md5 remains (a reappearing
    // md5( means the composed transform/slice form crept back in)
    val f = countOccurrences(plan, "winnow_fps(")
    assert(f == 1, s"fused winnow selection missing ($f call sites):\n$plan")
    assert(countOccurrences(plan, "md5(") == 0,
      s"composed md5 pipeline reappeared beside the fused expression:\n$plan")
  }

  test("gate: cdc chunking — cut-array let-binding survives optimization") {
    val tab = graft.ops.Chunking.cdcChunks(
      Tables(spark, sf).documents, "doc_id", "text")
    val plan = tab.queryExecution.optimizedPlan.toString
    // round 19 (plans.CdcCuts): the boundary lane — gram md5, top-60-bit
    // mod rule, cut selection — is ONE native call site inside the
    // let-bound array; inlining the cut array into its readers would
    // multiply it (the measured 57 s vs 3.9 s trap). The only md5 left
    // in the expression tree is the final chunk_md5.
    val c = countOccurrences(plan, "cdc_cuts(")
    assert(c == 1, s"cdc cut-array let-binding inlined ($c call sites):\n$plan")
    val m = countOccurrences(plan, "md5(")
    assert(m == 1, s"expression-tree md5 beyond chunk_md5 ($m call sites):\n$plan")
  }

  test("gate: series folds stay native single-call (no aggregate() HOF)") {
    val ev = Tables(spark, sf).events
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("value"))
    val out = graft.ops.Smoothing.ewma(
      ev, "user_id", "us", "event_id", "value", 0.3)
    val plan = out.queryExecution.optimizedPlan.toString
    assert(countOccurrences(plan, "ewma_fold") == 1,
      s"ewma fold not exactly one native call:\n$plan")
    assert(!plan.contains("aggregate("),
      s"ewma regressed to the per-step-re-eval aggregate() HOF:\n$plan")
  }
  test("round-10 operator plans: broadcasts and bounded shuffles where promised") {
    // blocklist: phrase table broadcast, no cartesian anywhere
    val bl = graft.ops.Curation.blocklistFilter(
      Tables(spark, sf).documents, "doc_id", "text",
      Seq("table hash", "slow key"))
    val blPlan = bl.queryExecution.executedPlan.toString
    assert(blPlan.contains("BroadcastHashJoin"),
      s"blocklist first-token table not broadcast:\n$blPlan")
    assert(!blPlan.contains("CartesianProduct"),
      s"blocklist degraded to a cross product:\n$blPlan")
    // HRW sharding: assignment is scan-stage — no Exchange before the agg
    val hrw = Tables(spark, sf).documents.select(col("doc_id"),
      graft.ops.Rendezvous.hrwShard(col("doc_id"), 0 until 8).as("shard"))
    assert(!hrw.queryExecution.executedPlan.toString.contains("Exchange"),
      "HRW assignment must not shuffle")
    // adaptive salt: hot set broadcast to both sides, equi-join only
    val ev = Tables(spark, sf).events
    val dim = ev.groupBy(col("user_id")).agg(count(lit(1)).as("t"))
    val sj = graft.ops.SkewOps.adaptiveSaltedJoin(
      ev, dim, "user_id", col("event_id"), salts = 4, hotMinCount = 20L)
    val sjPlan = sj.queryExecution.executedPlan.toString
    assert(sjPlan.contains("BroadcastHashJoin"),
      s"hot-key set not broadcast:\n$sjPlan")
    assert(!sjPlan.contains("CartesianProduct"), "salted join cross product")
    // KMV set algebra: pairwise stage joins the broadcast sketch table
    val toks = Tables(spark, sf).documents
      .select(col("source"), explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
    val km = graft.ops.Kmv.setEstimates(toks, col("w"), "source", k = 16)
    val kmPlan = km.queryExecution.executedPlan.toString
    assert(kmPlan.contains("BroadcastNestedLoopJoin")
        || kmPlan.contains("BroadcastHashJoin"),
      s"sketch pair join must broadcast the tiny sketch table:\n$kmPlan")
  }
}
