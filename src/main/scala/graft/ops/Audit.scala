package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit (the Deequ/Great-Expectations shape a
  * production ingest runs before promoting a batch): every check is a
  * violation PREDICATE, the whole battery folds into ONE aggregate over
  * ONE scan — conditional sums for row checks, count-minus-distinct for
  * uniqueness — and the output is one row per check. Reference analogue:
  * pypeman channels gate on per-message condition nodes
  * (pypeman/nodes.py Drop/Reject); this is the set-level form.
  *
  * Scale shape: row checks are scan-stage conditional partial aggs (one
  * tiny exchange for the final merge). Uniqueness checks add one
  * count-distinct each (Catalyst expands them into a shared Expand +
  * two-level agg — still one scan of the input). At 100 TB the audit
  * costs one pass over the batch, independent of check count.
  */
object Audit {

  /** Run row-level checks (name → violation predicate) and uniqueness
    * checks (column whose values must be unique, nulls ignored). Output:
    * check_name, n_bad, n_rows, passed — long format, one row per check. */
  def audit(
      df: DataFrame,
      rowChecks: Seq[(String, Column)],
      uniqueCols: Seq[String] = Nil): DataFrame = {
    require(rowChecks.nonEmpty || uniqueCols.nonEmpty,
      "audit needs at least one check (explode over an empty check array " +
        "has no row type and fails analysis)")
    val names = rowChecks.map(_._1) ++ uniqueCols
    require(names.distinct.size == names.size,
      s"duplicate check names: ${names.diff(names.distinct).distinct.mkString(", ")}")
    // row checks and uniqueness checks get DISJOINT alias prefixes so a
    // row check literally named "unique_<col>" cannot collide with the
    // uniqueness aggregate for <col> (ambiguous-reference at analysis)
    val rowAggs = rowChecks.map { case (name, bad) =>
      sum(when(bad, 1L).otherwise(0L)).as(s"__bad_row_$name")
    }
    val uniqAggs = uniqueCols.map { c =>
      (count(col(c)) - countDistinct(col(c))).as(s"__bad_uniq_$c")
    }
    val agged = df.agg(count(lit(1)).as("__n"), (rowAggs ++ uniqAggs): _*)
    val entries =
      rowChecks.map { case (name, _) =>
        struct(lit(name).as("check_name"), col(s"__bad_row_$name").as("n_bad"))
      } ++ uniqueCols.map { c =>
        struct(lit(s"unique_$c").as("check_name"), col(s"__bad_uniq_$c").as("n_bad"))
      }
    agged
      .select(explode(array(entries: _*)).as("e"), col("__n"))
      .select(col("e.check_name").as("check_name"),
        coalesce(col("e.n_bad"), lit(0L)).as("n_bad"),
        col("__n").as("n_rows"),
        (coalesce(col("e.n_bad"), lit(0L)) === 0).as("passed"))
  }
}
