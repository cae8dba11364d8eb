package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The message data model — graft's `Message` (reference:
  * pypeman/message.py:16). A message is a row:
  *
  * {{{
  *   uuid         string                       deterministic id (md5 of payload+ts)
  *   ts           timestamp                    creation time
  *   content_type string
  *   payload      string                       the content (JSON for structured)
  *   meta         map<string,string>
  *   state        string                       store state machine
  *   ctx          map<string, struct<payload:string, meta:map<string,string>>>
  * }}}
  *
  * pypeman allocates uuid4 per message; at 10^11 rows a random id breaks
  * re-runs and dedup, so graft derives ids content-deterministically
  * (md5 of payload) — stable across retries and cluster re-executions.
  *
  * Message states and their badness ranking mirror message.py:36-43.
  */
object Msg {

  val WAIT_RETRY = "wait_retry"
  val PENDING = "pending"
  val PROCESSING = "processing"
  val PROCESSED = "processed"
  val REJECTED = "rejected"
  val ERROR = "error"

  /** Less important first — message.py:43 STATES_PRIORITY. */
  val statesPriority: Seq[String] =
    Seq(WAIT_RETRY, PENDING, PROCESSING, PROCESSED, REJECTED, ERROR)

  /** Numeric badness of a state column (higher = worse), codegen CASE. */
  def stateRank(state: Column): Column =
    statesPriority.zipWithIndex.foldLeft(lit(-1)) { case (acc, (s, i)) =>
      when(state === s, lit(i)).otherwise(acc)
    }

  /** Worst state among grouped rows (msgstore.py:110
    * set_state_to_worst_sub_state): max by rank — fully partial-aggregatable,
    * so at scale it map-side combines before the shuffle. */
  def worstState(state: Column): Column =
    max(struct(stateRank(state).as("r"), state.as("s"))).getField("s")

  /** Epoch microseconds of an event-time column, robust to BOTH timestamp
    * flavors: `unix_micros` rejects TIMESTAMP_NTZ (what pandas/pyarrow-
    * written parquet yields in sessions graft doesn't own), so cast first —
    * on an already-TIMESTAMP column the cast is a Catalyst no-op.
    *
    * NTZ caveat: the cast interprets the naive value in the SESSION zone —
    * pypeman's exact naive-local-datetime semantics (message.py:16), and
    * under graft's pinned-UTC sessions the cross-engine-stable naive-as-UTC
    * reading. A column-level helper cannot branch on the input type; code
    * that must be zone-independent for NTZ inputs in foreign sessions
    * should normalize at load instead ([[graft.Tables.events]] shows the
    * cast + from_utc_timestamp pattern). */
  def epochUs(c: Column): Column = unix_micros(c.cast(TimestampType))

  /** Epoch milliseconds; same NTZ robustness as [[epochUs]]. */
  def epochMs(c: Column): Column = unix_millis(c.cast(TimestampType))

  val ctxType: DataType = MapType(StringType,
    StructType(Seq(
      StructField("payload", StringType),
      StructField("meta", MapType(StringType, StringType)))))

  /** Lift a domain DataFrame into message form. Payload = JSON of all
    * columns; original columns are dropped (pypeman messages carry payload
    * only). `tsCol` names the event-time column, if any. */
  def wrap(df: DataFrame, tsCol: Option[String] = None, contentType: String = "application/json"): DataFrame = {
    val payload = to_json(struct(df.columns.map(col).toIndexedSeq: _*))
    val ts = tsCol.map(col).getOrElse(current_timestamp())
    df.select(
      md5(payload).as("uuid"),
      ts.cast("timestamp").as("ts"),
      lit(contentType).as("content_type"),
      payload.as("payload"),
      map().cast(MapType(StringType, StringType)).as("meta"),
      lit(PENDING).as("state"),
      map().cast(ctxType).as("ctx"))
  }

  /** Parse a wrapped payload back into columns given the target schema. */
  def unwrap(df: DataFrame, schema: StructType): DataFrame =
    df.select(from_json(col("payload"), schema).as("p")).select(col("p.*"))

  // ---- JSON interchange (message.py:103-178 to_dict/to_json/from_json) ---

  /** Reference DATE_FORMAT (message.py:13): "%Y-%m-%dT%H:%M:%S.%fZ" —
    * microsecond precision, literal Z. */
  val jsonTsFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"

  /** Schema of the reference's message JSON layout, field order matching
    * to_dict insertion order (message.py:103-131). */
  val jsonSchema: StructType = StructType(Seq(
    StructField("timestamp", StringType),
    StructField("uuid", StringType),
    StructField("store_id", StringType),
    StructField("store_chan_name", StringType),
    StructField("payload", StringType),
    StructField("meta", MapType(StringType, StringType)),
    StructField("ctx", ctxType.asInstanceOf[MapType])))

  /** `Message.to_json` (message.py:133) as a column over Msg rows: the
    * reference's exact field set and order, payload as string (the
    * encode_payload=False branch — pickled payloads are Python-specific;
    * pypeman reads both). Nulls are kept (`store_id: null`), matching
    * json.dumps. */
  def toJsonCol: Column =
    to_json(
      struct(
        date_format(col("ts"), jsonTsFormat).as("timestamp"),
        col("uuid"),
        lit(null).cast(StringType).as("store_id"),
        lit(null).cast(StringType).as("store_chan_name"),
        col("payload"),
        col("meta"),
        col("ctx")),
      java.util.Map.of("ignoreNullFields", "false"))

  /** Serialize Msg rows to the reference's JSON interchange layout. */
  def toJson(df: DataFrame): DataFrame =
    df.select(toJsonCol.as("json"))

  /** `Message.from_json` (message.py:171): parse reference-layout JSON back
    * into Msg rows. content_type is not part of the reference layout —
    * restored as the default. */
  def fromJson(df: DataFrame, jsonCol: String = "json"): DataFrame =
    df.select(from_json(col(jsonCol), jsonSchema).as("m"))
      .select(
        col("m.uuid").as("uuid"),
        to_timestamp(col("m.timestamp"), jsonTsFormat).as("ts"),
        lit("application/text").as("content_type"),
        col("m.payload").as("payload"),
        col("m.meta").as("meta"),
        lit(PENDING).as("state"),
        col("m.ctx").as("ctx"))

  /** `Message.copy` (message.py:71) — immutable rows: identity. */
  def copy(df: DataFrame): DataFrame = df

  /** `Message.renew` (message.py:79): copy with fresh uuid + timestamp.
    * pypeman draws uuid4; graft derives the new id deterministically from
    * (old uuid, payload) so renew is stable across retries and cluster
    * re-execution — same reasoning as wrap's content-derived uuid. */
  def renew(df: DataFrame): DataFrame =
    df.withColumn("uuid", md5(concat_ws("|", col("uuid"), col("payload"))))
      .withColumn("ts", current_timestamp())
}
