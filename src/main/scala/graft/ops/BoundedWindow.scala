package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions.lit

/** Window spec for a set the CALL SITE guarantees is bounded (a
  * sort+limit shortlist, a parked-retry set — never corpus-sized data).
  *
  * Semantics are identical to a global `Window.orderBy(...)` — every row
  * lands in one partition — but the partition spec is an explicit
  * constant, so `WindowExec` does not emit its "No Partition Defined"
  * warning. That warning must stay MEANINGFUL: three known-bounded sites
  * were spamming it hundreds of times per bench run, which would mask a
  * future genuinely-unbounded offender. Routing the documented-bounded
  * sites through this helper keeps the log clean and makes every
  * remaining occurrence of the warning an actual finding.
  *
  * Do NOT use this on data-sized input: a constant partition key routes
  * the full relation through one task, exactly the degradation the
  * warning exists to flag. */
object BoundedWindow {
  def orderBy(cols: Column*): WindowSpec =
    Window.partitionBy(lit(0)).orderBy(cols: _*)
}
