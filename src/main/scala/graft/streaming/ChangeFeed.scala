package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming change feed — the continuous form of
  * [[graft.ops.Cdc.snapshotDiff]]: per-key latest state lives in
  * checkpointed `GroupState`, and each micro-batch emits the NET
  * transition per touched key (`added` / `changed` / `removed`) against
  * the state carried from all previous batches. The batch/stream pairing
  * mirrors Sessionize: on a batch Dataset every key sees all its upserts
  * in one invocation with empty prior state, so the emitted rows are
  * exactly the `added`-side of a snapshotDiff against the empty table
  * (spec-pinned against the relational form).
  *
  * Versions must totally order a key's upserts; an upsert at or below the
  * state's version is DROPPED (late replay — the recursion is already
  * past it, same discard semantics the watermark paths apply). Tombstones
  * (`deleted = true`) clear visibility and emit `removed` once; a later
  * version re-adds. Intra-batch churn collapses to the net effect — a key
  * added and tombstoned in one batch emits nothing, matching what a
  * snapshot pair separated by that batch would show.
  */
object ChangeFeed {

  final case class Upsert(key: Long, ver: Long, value: Double, deleted: Boolean)

  /** SQL `<=>` double semantics (what the spec-pinned snapshotDiff
    * equivalence requires): NaN equals NaN, -0.0 equals 0.0 — Scala's
    * `!=` would report a NaN→NaN upsert as changed and break the
    * batch-boundary invariant. */
  private def valueDiffers(a: Double, b: Double): Boolean =
    !(a == b || (a.isNaN && b.isNaN))
  final case class KeyState(ver: Long, value: Double, deleted: Boolean)
  final case class Change(
      key: Long, change: String,
      valueOld: Option[Double], valueNew: Option[Double], ver: Long)

  def changes(upserts: Dataset[Upsert]): Dataset[Change] = {
    implicit val se = Encoders.product[KeyState]
    implicit val ce = Encoders.product[Change]
    upserts
      .groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState[KeyState, Change](
        OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        case (key, evs, state: GroupState[KeyState]) =>
          val prev = state.getOption
          val fresh = evs.toSeq
            .filter(e => prev.forall(p => e.ver > p.ver))
            .sortBy(_.ver)
          if (fresh.isEmpty) Iterator.empty
          else {
            val last = fresh.last
            val next = KeyState(last.ver, last.value, last.deleted)
            state.update(next)
            val prevVisible = prev.filter(!_.deleted)
            val nextVisible = Option(next).filter(!_.deleted)
            (prevVisible, nextVisible) match {
              case (None, Some(n)) =>
                Iterator.single(Change(key, "added", None, Some(n.value), n.ver))
              case (Some(p), None) =>
                Iterator.single(Change(key, "removed", Some(p.value), None, next.ver))
              case (Some(p), Some(n)) if valueDiffers(p.value, n.value) =>
                Iterator.single(Change(key, "changed", Some(p.value), Some(n.value), n.ver))
              case _ => Iterator.empty // invisible→invisible or value unchanged
            }
          }
      }
  }
}
