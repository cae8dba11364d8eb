package graft

import graft.model.Msg
import graft.ops.{CoreOps, JoinMapItem, MapItem}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

class OpsSpec extends SparkSpec {
  import spark.implicits._

  private def msgs = Seq(("m1", "hello", "x"), ("m2", "world", "y"))
    .toDF("uuid", "payload", "tag")
    .withColumn("meta", map(lit("tag"), col("tag")))
    .withColumn("ctx", map().cast(Msg.ctxType))
    .drop("tag")

  test("setCtx/useCtx roundtrip restores payload and meta") {
    val out = Channel0(
      CoreOps.setCtx("orig"),
      CoreOps.mapPayload("up")(upper),
      CoreOps.emptyMeta,
      CoreOps.useCtx("orig"))
    val r = out.orderBy("uuid").collect()
    assert(r.map(_.getAs[String]("payload")).toSeq == Seq("hello", "world"))
    assert(r.head.getAs[Map[String, String]]("meta") == Map("tag" -> "x"))
  }

  test("sourceQualityGate drops low-mean and low-volume sources wholesale") {
    val df = Seq(
      (1L, "good", 0.9), (2L, "good", 0.7), (3L, "good", 0.8),
      (4L, "bad", 0.1), (5L, "bad", 0.3), (6L, "bad", 0.2),
      (7L, "tiny", 0.9))
      .toDF("doc_id", "source", "q")
    val out = graft.ops.Curation
      .sourceQualityGate(df, "source", col("q"), minMean = 0.5, minDocs = 2)
    // "bad" fails the mean floor, "tiny" the volume floor — entire sources go
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    val r = out.orderBy("doc_id").head()
    assert(r.getAs[Double]("src_mean_quality") == 0.8)
    assert(r.getAs[Long]("src_docs") == 3L)
  }

  private def Channel0(nodes: graft.api.Node*) =
    graft.api.Channel("t").add(nodes: _*).runMain(msgs)

  test("dsirWeights: target-like docs score higher than off-target docs") {
    import graft.ops.Curation
    val df = Seq(
      (1L, "alpha beta alpha beta", true),   // target distribution: alpha/beta
      (2L, "alpha beta gamma delta", true),
      (3L, "alpha beta alpha gamma", false), // raw doc close to target
      (4L, "omega sigma omega sigma", false) // raw doc far from target
    ).toDF("id", "text", "is_t")
    val w = Curation.dsirWeights(df, "id", "text", col("is_t"))
      .select("doc_id", "dsir_weight").as[(Long, Double)].collect().toMap
    assert(w.size == 4)
    // the target-like raw doc must outscore the off-target raw doc
    assert(w(3L) > w(4L), s"expected w(3) > w(4), got $w")
    // weights are finite and deterministic across runs
    val again = Curation.dsirWeights(df, "id", "text", col("is_t"))
      .select("doc_id", "dsir_weight").as[(Long, Double)].collect().toMap
    assert(w == again)
  }

  test("c4LineFilter: line rules, page ban and terminal-punct rule") {
    import graft.ops.Curation
    val df = Seq(
      (1L, Seq("the cat sat down.", "ok", "no javascript here.", "one two three.")),
      (2L, Seq("lorem ipsum dolor sit.", "a perfectly fine line here.")),
      (3L, Seq("no terminal punctuation", "short"))
    ).toDF("id", "lines")
    val out = Curation.c4LineFilter(df, "id", col("lines"),
        minWords = 3, minLines = 2,
        lineBanned = Seq("javascript"), pageBanned = Seq("lorem ipsum"),
        requireTerminalPunct = true)
      .orderBy("doc_id").collect()
    // doc 1: "ok" (<3 words) and the javascript line drop; 2 survive → keep
    assert(out(0).getAs[String]("clean_text") == "the cat sat down.\none two three.")
    assert(out(0).getAs[Int]("n_kept") == 2 && out(0).getAs[Int]("n_dropped") == 2)
    assert(out(0).getAs[Boolean]("page_keep"))
    // doc 2: both lines pass the LINE rules, but the page-level
    // lorem-ipsum ban kills the whole page regardless
    assert(out(1).getAs[Int]("n_kept") == 2 && !out(1).getAs[Boolean]("page_keep"))
    // doc 3: no terminal punctuation anywhere → nothing survives
    assert(out(2).getAs[Int]("n_kept") == 0 && !out(2).getAs[Boolean]("page_keep"))
  }

  test("c4LineFilter: min-words counts real words, not space-split tokens") {
    import graft.ops.Curation
    val df = Seq(
      (1L, Seq("one  two", "   ", "a\tb\tc d")) // double space, all-space, tabs
    ).toDF("id", "lines")
    val out = Curation.c4LineFilter(df, "id", col("lines"),
        minWords = 3, minLines = 1,
        lineBanned = Nil, pageBanned = Nil)
      .collect()(0)
    // "one  two" is 2 words (empty token from the double space must not
    // count), "   " is 0 words, "a\tb\tc d" is 4 real words
    assert(out.getAs[String]("clean_text") == "a\tb\tc d")
    assert(out.getAs[Int]("n_kept") == 1 && out.getAs[Int]("n_dropped") == 2)
  }

  test("bigramPerplexity: common-phrasing docs score lower than rare-bigram docs") {
    import graft.ops.Curation
    val df = Seq(
      (1L, "a b a b a b"),   // only the dominant bigrams
      (2L, "a b a b c d"),   // tail bigrams (b,c),(c,d) raise ppl
      (3L, "x")              // no bigrams → absent from output
    ).toDF("id", "text")
    val out = Curation.bigramPerplexity(df, "id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L)._1 == 5L && out(2L)._1 == 5L) // n-1 bigrams each
    assert(out(1L)._2 < out(2L)._2, s"expected ppl(1) < ppl(2), got $out")
    assert(out.values.forall(_._2 > 0))
  }

  test("audit: one-pass battery counts violations and uniqueness dupes") {
    import graft.ops.Audit
    val df = Seq(
      (1L, Some(5.0), "click"),
      (2L, None, "click"),          // null value
      (2L, Some(-1.0), "view"),     // negative + duplicate id
      (4L, Some(2.0), "weird")      // unknown type
    ).toDF("id", "value", "typ")
    val out = Audit.audit(df,
        rowChecks = Seq(
          "value_not_null" -> col("value").isNull,
          "value_nonneg" -> (col("value") < 0),
          "type_known" -> !col("typ").isin("click", "view")),
        uniqueCols = Seq("id"))
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._4)).toMap
    assert(out == Map(
      "value_not_null" -> (1L, false),
      "value_nonneg" -> (1L, false),
      "type_known" -> (1L, false),
      "unique_id" -> (1L, false)))
    // all-clean input passes everything
    val clean = Audit.audit(df.filter(col("id") === 1),
      Seq("value_not_null" -> col("value").isNull), Seq("id"))
    assert(clean.select("passed").as[Boolean].collect().forall(identity))
  }

  test("cdc latestSnapshot: max-struct reduction, tombstones drop keys, no Window in plan") {
    import graft.ops.Cdc
    val changes = Seq(
      ("k1", 1L, 10L, "v1", Some(false)),
      ("k1", 2L, 11L, "v2", None),         // NULL deleted flag = upsert, must KEEP
      ("k2", 1L, 12L, "x1", Some(false)),
      ("k2", 3L, 13L, "x3", Some(true)),   // latest is a tombstone → k2 gone
      ("k3", 5L, 14L, "z", Some(false))
    ).toDF("key", "ver", "seq", "payload", "deleted")
    val out = Cdc.latestSnapshot(changes, Seq("key"), Seq("ver", "seq"),
        Seq("payload"), deletedCol = Some("deleted"))
      .select("key", "ver", "payload")
      .as[(String, Long, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq(("k1", 2L, "v2"), ("k3", 5L, "z")))
    // the reduction must be a partial-aggregatable max, never a window sort
    val plan = Cdc.latestSnapshot(changes, Seq("key"), Seq("ver", "seq"),
      Seq("payload")).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window sort in CDC plan:\n$plan")
    assert(plan.contains("partial_max") || plan.toLowerCase.contains("partial"),
      s"no map-side partial max:\n$plan")
  }

  test("fellegiSunter: exact milli-ban sums, NULL comparisons read as disagreement") {
    import graft.ops.Linkage
    import graft.ops.Linkage.FieldRule
    val pairs = Seq(
      (1L, 2L, true, Some(true)),   // 2000 + 3000 = 5000 → match
      (1L, 3L, true, Some(false)),  // 2000 − 500 = 1500 → possible
      (1L, 4L, false, Option.empty[Boolean]) // −1000 − 500 → non_match
    ).toDF("a", "b", "f1", "f2")
    val out = Linkage.fellegiSunter(pairs, Seq(
        FieldRule(col("f1"), 2000L, -1000L),
        FieldRule(col("f2"), 3000L, -500L)),
        matchFloor = 4000L, possibleFloor = 0L)
      .select("a", "b", "score_mb", "decision")
      .as[(Long, Long, Long, String)].collect().sortBy(_._2).toSeq
    assert(out == Seq((1L, 2L, 5000L, "match"),
      (1L, 3L, 1500L, "possible"), (1L, 4L, -1500L, "non_match")))
  }

  test("cdc mergeInto: update/insert/delete/no-op-delete/keep semantics in one join") {
    import graft.ops.Cdc
    val target = Seq(
      ("a", "A0", 1.0), // matched, updated
      ("b", "B0", 2.0), // matched, deleted
      ("c", "C0", 3.0)  // unmatched target → kept
    ).toDF("key", "tag", "v")
    val source = Seq(
      ("a", "A1", 9.0, Some(false)),
      ("b", "B1", 0.0, Some(true)),  // tombstone
      ("d", "D1", 4.0, Option.empty[Boolean]), // NULL del = upsert → insert
      ("e", "E1", 5.0, Some(true))   // delete of absent key → no-op
    ).toDF("key", "tag", "v", "del")
    val out = Cdc.mergeInto(target, source, Seq("key"), Seq("tag", "v"), "del")
      .as[(String, String, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq(("a", "A1", 9.0), ("c", "C0", 3.0), ("d", "D1", 4.0)))
  }

  test("cdc mergeInto: multi-row-per-key source FAILS loudly (SQL cardinality rule)") {
    import graft.ops.Cdc
    val target = Seq(("a", 1.0)).toDF("key", "v")
    val source = Seq(("a", 2.0, false), ("a", 3.0, false)).toDF("key", "v", "del")
    val ex = intercept[Exception] {
      Cdc.mergeInto(target, source, Seq("key"), Seq("v"), "del").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => String.valueOf(e.getMessage) +: messages(e.getCause))
    assert(messages(ex).exists(_.contains("one row per key")),
      s"expected the cardinality message, got: $ex")
    // opt-out keeps the old fan-out behavior for by-construction-compact feeds
    val rows = Cdc.mergeInto(target, source, Seq("key"), Seq("v"), "del",
      checkSourceCardinality = false).collect()
    assert(rows.length == 2)
  }

  test("cdc mergeInto: NULL key values merge null-safely") {
    import graft.ops.Cdc
    val target = Seq((Option("x"), 1.0), (Option.empty[String], 2.0)).toDF("key", "v")
    val source = Seq((Option.empty[String], 9.0)).toDF("key", "v")
      .withColumn("del", lit(false))
    val out = Cdc.mergeInto(target, source, Seq("key"), Seq("v"), "del")
      .collect().map(r => (Option(r.getString(0)), r.getDouble(1))).sortBy(_._2).toSeq
    // NULL-keyed target row is UPDATED (null-safe match), not duplicated
    assert(out == Seq((Some("x"), 1.0), (None, 9.0)))
  }

  test("cdc snapshotDiff: added/removed/changed classes, null-safe compare, unchanged dropped") {
    import graft.ops.Cdc
    val oldDf = Seq(
      ("a", Some(1.0)), // unchanged → dropped
      ("b", Some(2.0)), // changed
      ("c", Some(3.0)), // removed
      ("d", None)       // NULL → value: changed (null-safe compare)
    ).toDF("key", "v")
    val newDf = Seq(
      ("a", Some(1.0)),
      ("b", Some(9.0)),
      ("d", Some(4.0)),
      ("e", Some(5.0))  // added
    ).toDF("key", "v")
    val out = Cdc.snapshotDiff(oldDf, newDf, Seq("key"), Seq("v"))
      .collect().map(r => (r.getString(0), r.getString(1),
        Option(r.get(2)), Option(r.get(3)))).sortBy(_._1).toSeq
    assert(out == Seq(
      ("b", "changed", Some(2.0), Some(9.0)),
      ("c", "removed", Some(3.0), None),
      ("d", "changed", None, Some(4.0)),
      ("e", "added", None, Some(5.0))))
  }

  test("cdc snapshotDiff: NULL key values match null-safely, not double-reported") {
    import graft.ops.Cdc
    val oldDf = Seq((Option("x"), 1.0), (Option.empty[String], 2.0)).toDF("key", "v")
    val newDf = Seq((Option("x"), 1.0), (Option.empty[String], 3.0)).toDF("key", "v")
    val out = Cdc.snapshotDiff(oldDf, newDf, Seq("key"), Seq("v"))
      .collect().map(r => (Option(r.getString(0)), r.getString(1))).toSeq
    // the NULL-keyed row changed 2.0 -> 3.0: ONE changed row, never an
    // added+removed pair from a non-matching equi-join
    assert(out == Seq((None, "changed")))
  }

  test("combineCtx builds JSON payload from saved contexts") {
    val out = Channel0(
      CoreOps.setCtx("a"),
      CoreOps.mapPayload("up")(upper),
      CoreOps.setCtx("b"),
      CoreOps.combineCtx(Map("a" -> "orig", "b" -> "loud")))
    val p = out.filter(col("uuid") === "m1").select("payload").as[String].head()
    assert(p == """{"orig":"hello","loud":"HELLO"}""")
  }

  test("mapFields renames, transforms, defaults, joins") {
    val df = Seq((1, "Bob", "VIP")).toDF("id", "name", "seg")
    val out = CoreOps.mapFields(
      items = Seq(
        MapItem(old = "name", newName = "who", transform = upper),
        MapItem(newName = "src", default = "crm")),
      joins = Seq(JoinMapItem(Seq("name", "seg"), "label", "-")),
      recopy = true)(df)
    val r = out.head()
    assert(r.getAs[String]("who") == "BOB")
    assert(r.getAs[String]("src") == "crm")
    assert(r.getAs[String]("label") == "Bob-VIP")
    assert(out.columns.contains("id") && out.columns.contains("seg"))
  }

  test("project fills defaults for missing keys in order") {
    val df = Seq((1, "x")).toDF("a", "b")
    val out = CoreOps.project(Seq("b", "a", "z"), Map("z" -> 0))(df)
    assert(out.columns.toSeq == Seq("b", "a", "z"))
    assert(out.head().getAs[Int]("z") == 0)
  }

  test("worstState picks highest-priority state") {
    val df = Seq((1, Msg.PROCESSED), (1, Msg.ERROR), (2, Msg.PENDING))
      .toDF("key", "state")
    val out = CoreOps.worstStatePerKey(Seq("key"))(df)
      .orderBy("key").select("state").as[String].collect().toSeq
    assert(out == Seq(Msg.ERROR, Msg.PENDING))
  }

  test("yielder explodes arrays preserving other columns") {
    val df = Seq((7, "a b c")).toDF("id", "text")
    val out = CoreOps.yielder(split(col("text"), " "), "tok")(df)
    assert(out.count() == 3)
    assert(out.select("id").distinct().as[Int].head() == 7)
  }

  test("Msg.wrap produces deterministic content-derived uuid") {
    val df = Seq((1, "x")).toDF("a", "b")
    val w1 = Msg.wrap(df).select("uuid").as[String].head()
    val w2 = Msg.wrap(df).select("uuid").as[String].head()
    assert(w1 == w2 && w1.length == 32)
  }

  test("ewma: exact recursive fold per key, ordered, s0 = x0") {
    val df = Seq(
      ("a", 1L, 10L, 10.0), ("a", 2L, 20L, 20.0), ("a", 3L, 30L, 5.0),
      ("b", 1L, 40L, 8.0),
      // out-of-order arrival: ord decides, not input order
      ("c", 2L, 60L, 4.0), ("c", 1L, 50L, 2.0))
      .toDF("k", "o", "id", "x")
    val got = graft.ops.Smoothing.ewma(df, "k", "o", "id", "x", alpha = 0.5)
      .orderBy("k", "id")
      .select("k", "id", "ewma").as[(String, Long, Double)].collect().toSeq
    // a: s=10; 0.5*20+0.5*10=15; 0.5*5+0.5*15=10 | b: 8 | c: 2; 0.5*4+0.5*2=3
    assert(got == Seq(
      ("a", 10L, 10.0), ("a", 20L, 15.0), ("a", 30L, 10.0),
      ("b", 40L, 8.0),
      ("c", 50L, 2.0), ("c", 60L, 3.0)))
  }

  test("ewma rejects alpha outside (0, 1]") {
    val df = Seq(("a", 1L, 1L, 1.0)).toDF("k", "o", "id", "x")
    intercept[IllegalArgumentException] {
      graft.ops.Smoothing.ewma(df, "k", "o", "id", "x", alpha = 0.0)
    }
  }

  test("cusum: one-sided accumulators reset at zero, alarm past h") {
    // target 10, slack 1, h 5; series drifts up then spikes
    val df = Seq(
      ("a", 1L, 1L, 10.0), // sp=max(0,0+10-11)=0, sn=max(0,0+10-10-1)=0
      ("a", 2L, 2L, 14.0), // sp=3, sn=0
      ("a", 3L, 3L, 15.0), // sp=3+4=7 -> alarm, sn=0
      ("a", 4L, 4L, 2.0),  // sp=max(0,7-9)=0, sn=max(0,0+10-2-1)=7 -> alarm
      ("b", 1L, 5L, 9.0))  // sp=0, sn=0
      .toDF("k", "o", "id", "x")
    val got = graft.ops.Smoothing.cusum(df, "k", "o", "id", "x",
        mu0 = 10.0, kappa = 1.0, h = 5.0)
      .orderBy("k", "id")
      .select("k", "id", "s_pos", "s_neg", "alarm")
      .as[(String, Long, Double, Double, Boolean)].collect().toSeq
    assert(got == Seq(
      ("a", 1L, 0.0, 0.0, false), ("a", 2L, 3.0, 0.0, false),
      ("a", 3L, 7.0, 0.0, true), ("a", 4L, 0.0, 7.0, true),
      ("b", 5L, 0.0, 0.0, false)))
  }

  test("holt: level tracks, trend accumulates, init (x0, 0)") {
    // α=0.5, β=0.5 on a clean ramp 10,12,14: s0=10,b0=0;
    // s1=.5*12+.5*10=11, b1=.5*(11-10)+.5*0=0.5;
    // s2=.5*14+.5*(11.5)=12.75, b2=.5*(12.75-11)+.5*.5=1.125
    val df = Seq(("a", 1L, 1L, 10.0), ("a", 2L, 2L, 12.0), ("a", 3L, 3L, 14.0))
      .toDF("k", "o", "id", "x")
    val got = graft.ops.Smoothing.holt(df, "k", "o", "id", "x", 0.5, 0.5)
      .orderBy("id").select("k", "id", "s_level", "s_trend")
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(got == Seq(("a", 1L, 10.0, 0.0), ("a", 2L, 11.0, 0.5),
      ("a", 3L, 12.75, 1.125)))
  }

  test("holtWinters: seasonal register picks up the period-p pattern") {
    // α=0.5, β=0, γ=0.5, period 2 on 10,20,10,20:
    //   i0: s=10, b=0, c0=.5*(10-10)+.5*0=0
    //   i1: cprev=0 → s=.5*20+.5*10=15, c1=.5*(20-15)=2.5
    //   i2: cprev=c0=0 → s=.5*10+.5*15=12.5, c=.5*(10-12.5)+.5*0=-1.25
    //   i3: cprev=c1=2.5 → s=.5*(20-2.5)+.5*12.5=15, c=.5*(20-15)+.5*2.5=3.75
    val df = Seq(("a", 1L, 1L, 10.0), ("a", 2L, 2L, 20.0),
      ("a", 3L, 3L, 10.0), ("a", 4L, 4L, 20.0)).toDF("k", "o", "id", "x")
    val got = graft.ops.Smoothing
      .holtWinters(df, "k", "o", "id", "x", 0.5, 0.0, 0.5, period = 2)
      .orderBy("id").select("id", "s_level", "s_trend", "s_season")
      .as[(Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq((1L, 10.0, 0.0, 0.0), (2L, 15.0, 0.0, 2.5),
      (3L, 12.5, 0.0, -1.25), (4L, 15.0, 0.0, 3.75)))
  }

  test("holtWinters is partition-layout invariant") {
    val df = (1 to 200).map(i =>
      ((i % 5).toString, (i / 5).toLong, i.toLong, (i % 13).toDouble))
      .toDF("k", "o", "id", "x")
    val a = graft.ops.Smoothing
      .holtWinters(df, "k", "o", "id", "x", 0.3, 0.1, 0.2, period = 4)
    val b = graft.ops.Smoothing
      .holtWinters(df.repartition(7), "k", "o", "id", "x", 0.3, 0.1, 0.2, 4)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("seasonalDecompose: MA trend (full frames only), phase means, zero residuals") {
    // x = 1,5,3,7 with period 2, ±1 frame: trend null at the edges,
    // trend(2)=avg(1,5,3)=3, trend(3)=avg(5,3,7)=5 → detr 2 / −2,
    // seasonal(phase1)=2, seasonal(phase0)=−2 → residuals exactly 0
    val df = Seq(("a", 1L, 1L, 1.0), ("a", 2L, 2L, 5.0),
      ("a", 3L, 3L, 3.0), ("a", 4L, 4L, 7.0)).toDF("k", "o", "id", "x")
    val out = graft.ops.Smoothing
      .seasonalDecompose(df, "k", "o", "id", "x", period = 2, halfWindow = 1)
      .orderBy("id")
      .select("id", "phase", "trend", "seasonal", "resid")
      .as[(Long, Int, Double, Double, Double)].collect().toSeq
    assert(out == Seq((2L, 1, 3.0, 2.0, 0.0), (3L, 0, 5.0, -2.0, 0.0)))
  }

  test("holt is partition-layout invariant") {
    val df = (1 to 200).map(i =>
      ((i % 5).toString, (i / 5).toLong, i.toLong, (i % 13).toDouble))
      .toDF("k", "o", "id", "x")
    val a = graft.ops.Smoothing.holt(df, "k", "o", "id", "x", 0.3, 0.1)
    val b = graft.ops.Smoothing.holt(
      df.repartition(7), "k", "o", "id", "x", 0.3, 0.1)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("cusum is partition-layout invariant (fold order is (ord, id))") {
    val df = (1 to 200).map(i =>
      ((i % 5).toString, (i / 5).toLong, i.toLong, (i % 13).toDouble))
      .toDF("k", "o", "id", "x")
    val a = graft.ops.Smoothing.cusum(df, "k", "o", "id", "x", 6.0, 0.5, 4.0)
    val b = graft.ops.Smoothing.cusum(
      df.repartition(7), "k", "o", "id", "x", 6.0, 0.5, 4.0)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }
  test("blocklistFilter: phrase positions, failed candidates, normalization, zero-hit") {
    import graft.ops.Curation
    val docs = Seq(
      (1L, "bad phrase in the middle here"),       // mid-text hit
      (2L, "bad phrase leads this document"),      // at start
      (3L, "this one ends with bad phrase"),       // at end
      (4L, "bad luck only, no full match"),        // first token, verify fails
      (5L, "totally clean text"),                  // clean
      (6L, "weird   spacing  bad   phrase works"), // multi-space normalized
      (7L, "bad phrase and also worse phrase")     // two hits
    ).toDF("doc_id", "text")
    val out = Curation.blocklistFilter(docs, "doc_id", "text",
        Seq("bad phrase", "worse phrase"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[String](2).toList, r.getBoolean(3))).sortBy(_._1).toList
    assert(out == List(
      (1L, 1L, List("bad phrase"), false),
      (2L, 1L, List("bad phrase"), false),
      (3L, 1L, List("bad phrase"), false),
      (4L, 0L, Nil, true),
      (5L, 0L, Nil, true),
      (6L, 1L, List("bad phrase"), false),
      (7L, 2L, List("bad phrase", "worse phrase"), false)), s"got $out")
  }

  test("rankNormalize: ties share a percentile; endpoints are 0 and 1") {
    import graft.ops.Curation
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 20.0), ("a", 4L, 40.0),
      ("b", 5L, 7.0)).toDF("src", "id", "score")
    val got = Curation.rankNormalize(df, "src", "score")
      .collect().map(r => (r.getLong(1), r.getDouble(3))).toMap
    assert(got(1L) == 0.0 && got(4L) == 1.0)
    assert(got(2L) == got(3L), "ties must share a percentile")
    // rank semantics: (rank-1)/(n-1) = (2-1)/3
    assert(math.abs(got(2L) - 0.3333) < 1e-9)
    assert(got(5L) == 0.0, "singleton group sits at 0 (percent_rank)")
  }

  test("kneserNeyBigrams: hand-computed probability on a 3-doc corpus") {
    import graft.functions.TermStats
    // corpus bigrams: (a b) x2, (a c) x1, (d b) x1
    val docs = Seq("a b", "a b", "a c", "d b").toDF("text")
    val got = TermStats.kneserNeyBigrams(docs, "text", minCount = 1L)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    // counts: c(a.)=3, T1(a)=2 {b,c}; c(d.)=1, T1(d)=1; cont(b)=2 {a,d},
    // cont(c)=1; B=3 bigram types
    // P(b|a) = (2-.75)/3 + .75*2/3*(2/3) = 0.41667 + 0.33333 = 0.75
    assert(got(("a", "b")) == ((2L, 0.75)))
    // P(c|a) = (1-.75)/3 + .75*2/3*(1/3) = 0.08333 + 0.16667 = 0.25
    assert(got(("a", "c")) == ((1L, 0.25)))
    // P(b|d) = (1-.75)/1 + .75*1/1*(2/3) = 0.25 + 0.5 = 0.75
    assert(got(("d", "b")) == ((1L, 0.75)))
  }
}
