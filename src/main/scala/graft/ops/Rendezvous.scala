package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) hashing — Thaler & Ravishankar
  * 1996; the OTHER classic minimal-disruption sharding scheme next to
  * the consistent-hash ring (q_hash_ring): key → argmax over shards of
  * h(key, shard). Properties the ring needs 16 vnodes to approximate,
  * HRW has by construction: per-shard load is a clean 1/n split of the
  * hash space, and removing a shard moves EXACTLY that shard's keys
  * (every other key keeps its argmax — its winner is still present).
  *
  * Scale shape: the per-key assignment is a `greatest` over |shards|
  * scan-stage structs — zero shuffle, no broadcast table at all (the
  * shard list is plan constants), which is why HRW is the standard
  * choice when |shards| is small and the ring's O(log n) lookup is
  * irrelevant. All hashes ride the portable md5₆₀ lane; ties pin to
  * the larger shard id on both engines (struct max), though a 60-bit
  * tie never fires in practice.
  */
object Rendezvous {

  /** md5₆₀ weight of (key, shard). */
  def weight(key: Column, shard: Int): Column =
    conv(substring(md5(concat(lit("hrw:"), key.cast("string"),
      lit(s":$shard"))), 1, 15), 16, 10).cast("long")

  /** Winning shard id for `key` among `shardIds`. */
  def hrwShard(key: Column, shardIds: Seq[Int]): Column = {
    require(shardIds.nonEmpty, "empty shard set")
    val structs = shardIds.map(sh =>
      struct(weight(key, sh).as("h"), lit(sh.toLong).as("s")))
    val best =
      if (structs.size == 1) structs.head else greatest(structs: _*)
    best.getField("s")
  }
}
