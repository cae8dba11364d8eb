package graft

import graft.store.{MessageStore, RetryDriver, RetryStore, Search}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Queries.Q

/** Queries exercising the message store search surface (§2.4) — the events
  * table plays the role of a channel's stored message log, wrapped into Msg
  * shape (payload = props, meta = indexed fields, uuid = store id). */
object StoreQueries {

  private def storeDf(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).events.select(
      col("event_id").cast("string").as("uuid"),
      col("ts"),
      col("props").as("payload"),
      map(
        lit("event_type"), col("event_type"),
        lit("user_id"), col("user_id").cast("string"),
        lit("k"), get_json_object(col("props"), "$.k")).as("meta"),
      lit("processed").as("state"))

  /** search(): date range + meta exact + order by timestamp + pagination
    * (msgstore.py:174). */
  val qStoreSearch = Q(
    "q_store_search",
    (s, dir) => {
      MessageStore.search(storeDf(s, dir), Search(
        startDt = Some("2024-01-05 00:00:00"),
        endDt = Some("2024-01-20 00:00:00"),
        metaExact = Map("event_type" -> "click"),
        count = 20,
        start = 10))
        .select(col("uuid"), col("payload"))
    },
    Some("""SELECT CAST(event_id AS VARCHAR) AS uuid, props AS payload
            FROM events
            WHERE event_type = 'click'
              AND ts >= TIMESTAMP '2024-01-05 00:00:00'
              AND ts <= TIMESTAMP '2024-01-20 00:00:00'
            ORDER BY ts, CAST(event_id AS VARCHAR)
            LIMIT 20 OFFSET 10"""))

  /** search(): payload text + regex content match, with preview
    * (is_txt_in_msg / is_regex_in_msg / get_preview_str). */
  val qStoreSearchText = Q(
    "q_store_search_text",
    (s, dir) => {
      MessageStore.search(storeDf(s, dir), Search(
        text = Some("9"),
        rtext = Some("\"k\": 9[0-9]"),
        count = 50))
        .select(col("uuid"), MessageStore.preview(col("payload"), 6).as("preview"))
    },
    Some("""SELECT CAST(event_id AS VARCHAR) AS uuid,
              substring(props, 1, 6) AS preview
            FROM events
            WHERE props LIKE '%9%' AND regexp_matches(props, '"k": 9[0-9]')
            ORDER BY ts, CAST(event_id AS VARCHAR)
            LIMIT 50"""))

  /** search(): meta numeric range (start_/end_) + meta order_by '-k'
    * (msgstore.py:215 filter grammar). */
  val qStoreMetaRange = Q(
    "q_store_meta_range",
    (s, dir) => {
      MessageStore.search(storeDf(s, dir), Search(
        metaStart = Map("k" -> 30.0),
        metaEnd = Map("k" -> 60.0),
        orderBy = "-meta:k",
        count = 25))
        .select(col("uuid"), col("meta")("k").as("k"))
    },
    Some("""SELECT CAST(event_id AS VARCHAR) AS uuid,
              json_extract_string(props, '$.k') AS k
            FROM events
            WHERE CAST(json_extract_string(props, '$.k') AS DOUBLE) >= 30
              AND CAST(json_extract_string(props, '$.k') AS DOUBLE) <= 60
            ORDER BY json_extract_string(props, '$.k') DESC, ts,
              CAST(event_id AS VARCHAR)
            LIMIT 25"""))

  /** total() — store-wide count. */
  val qStoreTotal = Q(
    "q_store_total",
    (s, dir) => storeDf(s, dir).agg(count(lit(1)).as("total")),
    Some("SELECT count(*) AS total FROM events"))

  /** Retry store: per-key attempt numbering + exponential backoff schedule
    * (retry.py RetryFileMsgStore semantics, columnar). */
  val qRetryBackoff = Q(
    "q_retry_backoff",
    (s, dir) => {
      val errors = Tables(s, dir).events.filter(col("event_type") === "error")
      RetryStore.schedule(errors, "user_id", "ts", "event_id")
        .filter(col("attempt") <= 5)
        .select(col("user_id"), col("event_id"), col("attempt"),
          col("backoff_sec"), col("next_try_ms"))
    },
    Some("""SELECT user_id, event_id, attempt, backoff_sec,
              epoch_ms(ts) + backoff_sec * 1000 AS next_try_ms
            FROM (
              SELECT user_id, event_id, ts,
                row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS attempt,
                least(1 * (1::BIGINT << row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)), 3600) AS backoff_sec
              FROM events WHERE event_type = 'error')
            WHERE attempt <= 5"""))

  /** The full retry re-send loop (retry.py:103-241): every error event
    * fails its first handle and parks; re-send rounds re-inject in arrival
    * order at the failing node; a message deterministically succeeds on
    * attempt `(event_id % 4) + 1`, so attempts 1-3 drain most of the park
    * and the %4==3 cohort exhausts to state `error`. emit_seq proves global
    * in-order re-emission (round, then ts). The whole history is closed-form
    * in SQL — the oracle below — while the Spark side genuinely drives
    * Channel.runFrom through RetryDriver rounds. */
  val qRetryResend = Q(
    "q_retry_resend",
    (s, dir) => {
      import graft.api.{Channel, Node}
      val errors = Tables(s, dir).events.filter(col("event_type") === "error")
        .select(col("event_id"), col("ts"), col("props").as("payload"),
          ((col("event_id") % 4) + 1).cast("long").as("succeed_attempt"))
      val sender = Node("send")(_.withColumn("payload", concat(lit("sent:"), col("payload"))))
        .withAutoRetry(col("attempt") < col("succeed_attempt"))
      val chan = Channel("retry_chan").add(sender)
      // initial handle: attempt 0 < succeed_attempt ≥ 1 → everything parks
      val first = chan.run(errors.withColumn("attempt", lit(0L)))
      val r = RetryDriver.resendLoop(chan, first.retries, "ts", "event_id", maxAttempts = 3)
      r.states.select(col("event_id"), col("attempt"), col("retry_state"), col("emit_seq"))
    },
    Some("""SELECT event_id, attempt, retry_state, emit_seq FROM (
              SELECT event_id,
                CAST(least(succeed_attempt, 3) AS BIGINT) AS attempt,
                CASE WHEN ok THEN 'processed' ELSE 'error' END AS retry_state,
                CAST(CASE WHEN ok THEN
                  row_number() OVER (PARTITION BY ok ORDER BY succeed_attempt, ts, event_id)
                END AS BIGINT) AS emit_seq
              FROM (
                SELECT event_id, ts, (event_id % 4) + 1 AS succeed_attempt,
                  ((event_id % 4) + 1) <= 3 AS ok
                FROM events WHERE event_type = 'error'))"""))

  def all: Seq[Q] = Seq(
    qStoreSearch, qStoreSearchText, qStoreMetaRange, qStoreTotal, qRetryBackoff,
    qRetryResend)
}
