package graft.ops

import graft.plans.MgSketch.mgSketch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact heavy hitters at scale — the two-pass sketch-then-verify shape.
  *
  * Naive exact detection aggregates the FULL key domain (a per-key table
  * as big as the distinct count — at 100 TB often itself huge) just to
  * keep the few hot keys. Here pass 1 is one aggregate producing the
  * Misra–Gries candidate set (≤ k counters per partition cross the
  * network) plus the exact row count; pass 2 recounts ONLY candidate keys
  * (a k-row broadcast semi join — the corpus is never shuffled) and
  * applies the exact threshold. Because every key with count > n/(k+1) is
  * guaranteed into the candidate set, choosing k ≥ 1/phi − 1 makes the
  * result EXACTLY the keys with count > phi·n — sketch-pruned but not
  * approximate.
  */
object HeavyHitters {

  /** Keys of long column `keyCol` with count > phi·n, exactly.
    * `k` must satisfy k + 1 ≥ 1/phi (defaults to the minimal safe
    * capacity ⌈1/phi⌉ when 0). Returns (keyCol, cnt). */
  def exact(df: DataFrame, keyCol: String, phi: Double, k: Int = 0): DataFrame = {
    require(phi > 0 && phi < 1, s"need 0 < phi < 1, got $phi")
    val cap = if (k <= 0) math.ceil(1.0 / phi).toInt else k
    // tolerance on the reciprocal: 1.0/(1.0/m) rounds above m in doubles,
    // which would spuriously reject the mathematically minimal capacity
    require(cap + 1 >= 1.0 / phi - 1e-9,
      s"capacity $cap too small for phi=$phi (needs >= ${1.0 / phi - 1})")
    val sketch = df.agg(
      mgSketch(col(keyCol), cap).as("cands"),
      count(lit(1)).as("n"))
    val cands = sketch
      .select(col("n"), explode(col("cands")).as("c"))
      .select(col("c.id").as("cand_id"), col("n"))
    df.join(broadcast(cands), col(keyCol) === col("cand_id"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"), max(col("n")).as("n"))
      .filter(col("cnt") > lit(phi) * col("n").cast("double"))
      .select(col(keyCol), col("cnt"))
  }
}
