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
}
