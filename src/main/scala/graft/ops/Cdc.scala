package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture compaction: reduce an append-only change log to
  * the latest row per key — the batch form of the message store's
  * replay-to-current semantics (reference: pypeman msgstore keeps every
  * message and surfaces the latest state via search/replay;
  * pypeman/msgstore.py).
  *
  * Implemented as `max(struct(version, payload))` — a PARTIAL-
  * aggregatable reduction (map-side combine leaves one candidate row per
  * key per partition; the exchange carries keys, not history), unlike
  * the textbook `row_number() OVER (ORDER BY version DESC)` form, which
  * sorts every change of a key just to take one row. The version struct
  * must totally order changes: pass a tiebreak column (sequence /
  * offset) after the timestamp. The DuckDB oracle runs the window form —
  * two independent formulations checking each other.
  */
object Cdc {

  /** Latest row per key. `versionCols` order changes (later = newer,
    * compared lexicographically as a struct) and MUST totally order each
    * key's changes — on a version tie the winner is undefined, exactly as
    * in the window formulation. `payloadCols` are carried but NEVER
    * compared (payloads may be unorderable types like map, and data must
    * not decide recency). Rows where `deletedCol` is true in the LATEST
    * version are dropped (tombstone compaction). */
  def latestSnapshot(
      changes: DataFrame,
      keyCols: Seq[String],
      versionCols: Seq[String],
      payloadCols: Seq[String],
      deletedCol: Option[String] = None): DataFrame = {
    val carried = versionCols ++ payloadCols ++ deletedCol.toSeq
    // max_by keeps the comparator to the version struct alone; payloads
    // ride along uncompared (max(struct(version ++ payload)) would let
    // payload values break version ties and chokes on unorderable types)
    val out = changes
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(carried.map(col): _*),
        struct(versionCols.map(col): _*)).as("__last"))
      .select(keyCols.map(col) ++ carried.map(c => col(s"__last.$c").as(c)): _*)
    deletedCol match {
      // NULL deleted flags (upserts that never set it) must KEEP the row:
      // a bare !col(d) is NULL for them and the filter would drop the key
      case Some(d) => out.filter(!coalesce(col(d), lit(false))).drop(d)
      case None => out
    }
  }

  /** MERGE INTO (SQL:2003 MERGE / Delta-style upsert) as one relational
    * pass: apply a compacted change set to a base table —
    *   - matched key, source delete flag set   → row removed
    *   - matched key, delete flag clear        → source payload (UPDATE)
    *   - unmatched source, delete flag clear   → row added (INSERT)
    *   - unmatched source, delete flag set     → no-op (delete of absent)
    *   - unmatched target                      → kept as-is
    * `source` must hold ONE row per key — the SQL standard's cardinality
    * rule (a multi-row source makes the update ambiguous); compact with
    * [[latestSnapshot]] first. The rule is ENFORCED, not assumed: a
    * per-key count rides a source-side window and `assert_true` fails
    * the job at execution time on the first duplicate key (silently
    * fanning matched target rows out into duplicates is the worse
    * failure). `checkSourceCardinality = false` opts out when the
    * source is already compacted by construction and the extra
    * source-side exchange matters. A NULL delete flag reads as false
    * (an upsert feed that never sets it must not delete).
    *
    * Scale shape: ONE null-safe full outer join on the key — the same
    * single exchange pair [[snapshotDiff]] pays, and the standard
    * MERGE physical plan everywhere (Delta/Iceberg do exactly this
    * join under their file-pruning layers). No window, no sort; both
    * sides are snapshots (one row per key) so AQE can size/skew-split
    * the exchange freely.
    *
    * Output: keyCols ++ payloadCols, one row per surviving key. */
  def mergeInto(
      target: DataFrame,
      source: DataFrame,
      keyCols: Seq[String],
      payloadCols: Seq[String],
      deleteCol: String,
      checkSourceCardinality: Boolean = true): DataFrame = {
    val t = target.select((keyCols ++ payloadCols).map(col): _*)
      .withColumn("__in_t", lit(true))
      .select(keyCols.map(c => col(c).as(s"${c}__t")) ++
        payloadCols.map(c => col(c).as(s"${c}__pt")) :+ col("__in_t"): _*)
    val checkedSource = if (!checkSourceCardinality) source else {
      // count rides a key-partitioned window (null-safe, no extra join);
      // assert_true lives in a Filter so column pruning can't drop it
      val wk = org.apache.spark.sql.expressions.Window
        .partitionBy(keyCols.map(col): _*)
      source
        .withColumn("__cnt", count(lit(1)).over(wk))
        .filter(assert_true(col("__cnt") === 1,
          lit("mergeInto: source must hold exactly one row per key " +
            "(SQL MERGE cardinality rule); compact with latestSnapshot " +
            "first")).isNull)
        .drop("__cnt")
    }
    val s = checkedSource
      .select((keyCols ++ payloadCols :+ deleteCol).map(col): _*)
      .withColumn("__in_s", lit(true))
      .select(keyCols.map(c => col(c).as(s"${c}__s")) ++
        payloadCols.map(c => col(c).as(s"${c}__ps")) ++
        Seq(col(deleteCol).as("__del"), col("__in_s")): _*)
    val keyEq = keyCols.map(c => col(s"${c}__t") <=> col(s"${c}__s")).reduce(_ && _)
    val inS = coalesce(col("__in_s"), lit(false))
    val del = coalesce(col("__del"), lit(false))
    t.join(s, keyEq, "full_outer")
      // a source delete removes the matched row AND never inserts itself
      .filter(!(inS && del))
      .select(keyCols.map(c =>
        when(coalesce(col("__in_t"), lit(false)), col(s"${c}__t"))
          .otherwise(col(s"${c}__s")).as(c)) ++
        payloadCols.map(c =>
          when(inS, col(s"${c}__ps")).otherwise(col(s"${c}__pt")).as(c)): _*)
  }

  /** Snapshot diff — classify every key across two versions of a table as
    * `added` / `removed` / `changed` (unchanged keys are dropped): the
    * audit primitive for evolving corpora (what changed between last
    * week's crawl snapshot and this week's?). One full outer join on the
    * key; the comparison is null-safe (`<=>`) throughout, so NULL→value
    * and value→NULL transitions classify as changed and NULL key values
    * match instead of double-reporting as added+removed.
    *
    * Cost note: Spark lowers `<=>` join keys to (coalesce, isnull)
    * tuples, so a side already hash-partitioned on the raw key still
    * re-exchanges for the join — one extra exchange pair vs a plain
    * equi-join. Accepted: diff inputs are compacted snapshots (one row
    * per key), so the re-exchange moves the small relation, and silent
    * NULL-key misclassification is the worse failure.
    *
    * Output: keyCols, `change`, then for each compare column `<c>_old` /
    * `<c>_new` (NULL on the absent side for added/removed). */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    val o = oldDf.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__in_old", lit(true))
    val n = newDf.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__in_new", lit(true))
    val renamedO = compareCols.foldLeft(o)((d, c) => d.withColumnRenamed(c, s"${c}_old"))
      .select(keyCols.map(c => col(c).as(s"${c}__o")) ++
        compareCols.map(c => col(s"${c}_old")) :+ col("__in_old"): _*)
    val renamedN = compareCols.foldLeft(n)((d, c) => d.withColumnRenamed(c, s"${c}_new"))
      .select(keyCols.map(c => col(c).as(s"${c}__n")) ++
        compareCols.map(c => col(s"${c}_new")) :+ col("__in_new"): _*)
    // null-safe key equality: a usingColumns full outer join would never
    // match NULL key values, double-reporting an unchanged NULL-keyed row
    // as one added + one removed
    val keyEq = keyCols.map(c => col(s"${c}__o") <=> col(s"${c}__n")).reduce(_ && _)
    val joined = renamedO.join(renamedN, keyEq, "full_outer")
    val inOld = coalesce(col("__in_old"), lit(false))
    val inNew = coalesce(col("__in_new"), lit(false))
    val same = compareCols
      .map(c => col(s"${c}_old") <=> col(s"${c}_new"))
      .reduceOption(_ && _).getOrElse(lit(true))
    joined
      .withColumn("change",
        when(!inOld, lit("added"))
          .when(!inNew, lit("removed"))
          .when(!same, lit("changed")))
      .filter(col("change").isNotNull)
      .select(keyCols.map(c =>
        when(inOld, col(s"${c}__o")).otherwise(col(s"${c}__n")).as(c)) ++
        (col("change") +:
          compareCols.flatMap(c => Seq(col(s"${c}_old"), col(s"${c}_new")))): _*)
  }
}
