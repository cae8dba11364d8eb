package graft

import org.apache.spark.sql.functions._

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("funnel: stages require strict ordering, not mere presence") {
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:05:00")),
      (1L, "purchase", ts("2024-01-01 10:10:00")),
      // user 2: clicked BEFORE viewing → stops at view
      (2L, "click", ts("2024-01-01 09:00:00")),
      (2L, "view", ts("2024-01-01 10:00:00")),
      // user 3: view+click, purchase before click → stops at click
      (3L, "view", ts("2024-01-01 08:00:00")),
      (3L, "purchase", ts("2024-01-01 08:30:00")),
      (3L, "click", ts("2024-01-01 09:00:00")),
      // user 4: never viewed
      (4L, "purchase", ts("2024-01-01 12:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val v = ev.filter($"event_type" === "view").groupBy($"user_id").agg(min($"ts").as("t1"))
    val c = ev.filter($"event_type" === "click").join(v, "user_id")
      .filter($"ts" > $"t1").groupBy($"user_id").agg(min($"ts").as("t2"))
    val p = ev.filter($"event_type" === "purchase").join(c, "user_id")
      .filter($"ts" > $"t2").groupBy($"user_id").agg(min($"ts").as("t3"))
    assert(v.count() == 3 && c.count() == 2 && p.count() == 1)
    // the purchaser is user 1 (user 3's purchase predates the click)
    assert(p.select("user_id").as[Long].head() == 1L)
  }

  test("session_window merges events within the gap; end = last + gap") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:20:00")), // within 30 min → same session
      (1L, ts("2024-01-01 11:30:00")), // 70 min later → new session
      (2L, ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "ts")
    val out = ev.groupBy($"user_id", session_window($"ts", "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select($"user_id",
        unix_seconds($"session_window.start").as("s"),
        unix_seconds($"session_window.end").as("e"), $"n")
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    def sec(s: String) = ts(s).getTime / 1000
    assert(out == Seq(
      (1L, sec("2024-01-01 10:00:00"), sec("2024-01-01 10:50:00"), 2L),
      (1L, sec("2024-01-01 11:30:00"), sec("2024-01-01 12:00:00"), 1L),
      (2L, sec("2024-01-01 10:00:00"), sec("2024-01-01 10:30:00"), 1L)))
  }

  test("session_window agrees with batchSessions on session count (real events)") {
    val ev = Tables(spark, sf).events
    val native = ev.groupBy($"user_id", session_window($"ts", "30 minutes"))
      .agg(count(lit(1))).count()
    val manual = graft.streaming.Sessionize.batchSessions(
      ev.select($"user_id", unix_micros($"ts").as("us")),
      "user_id", "us", gapS = 1800L * 1000000 - 1).count()
    // gap semantics differ by strictness at the exact boundary
    // (session_window is end-exclusive: diff == gap starts a new session;
    // batchSessions keeps diff <= gap together) — hence gap-1 micros
    assert(native == manual && native > 0)
  }

  test("cohort: first-week bucketing and week offsets") {
    val ev = Seq(
      (1L, ts("2024-01-02 10:00:00")), // week of Jan 1 (Mon)
      (1L, ts("2024-01-10 10:00:00")), // week of Jan 8 → week_n 1
      (1L, ts("2024-01-11 11:00:00")), // same week → deduped
      (2L, ts("2024-01-10 09:00:00"))  // cohort week Jan 8, week_n 0
    ).toDF("user_id", "ts")
    val first = ev.groupBy($"user_id").agg(date_trunc("week", min($"ts")).as("cw"))
    val out = ev.join(first, "user_id")
      .select($"user_id", $"cw", datediff(date_trunc("week", $"ts"), $"cw").as("dd"))
      .distinct()
      .groupBy($"cw".cast("date").as("cohort_week"), ($"dd" / 7).cast("long").as("week_n"))
      .agg(count(lit(1)).as("n_users"))
      .as[(java.sql.Date, Long, Long)].collect().sortBy(r => (r._1.toString, r._2)).toSeq
    assert(out == Seq(
      (java.sql.Date.valueOf("2024-01-01"), 0L, 1L),
      (java.sql.Date.valueOf("2024-01-01"), 1L, 1L),
      (java.sql.Date.valueOf("2024-01-08"), 0L, 1L)))
  }

  test("histogram: ten closed buckets, max value lands in bucket 9") {
    val ev = (0 to 100).map(i => Tuple1(i.toDouble)).toDF("value")
    val bounds = ev.agg(min($"value").as("lo"), max($"value").as("hi"))
    val out = ev.crossJoin(broadcast(bounds))
      .select(least(lit(9), floor(($"value" - $"lo") * 10 / ($"hi" - $"lo")).cast("long")).as("bucket"))
      .groupBy($"bucket").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(out.keySet == (0L to 9L).toSet)
    assert(out.values.sum == 101L && out(9L) == 11L) // 90..100 inclusive
  }
}
