package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF JOIN as a reusable operator (r16 — previously inline in the
  * `join_asof` query; promoted so the SQL-text `ASOF JOIN` surface
  * and the DataFrame path share one implementation).
  *
  * Semantics (DuckDB's `ASOF JOIN`, inner): each left row matches the
  * single right row with the same key and the LATEST right time
  * `<=` the left time; left rows with no earlier right row drop.
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

  /** Inner as-of join; output = every left column, then every right
    * column (the matched row's values). Column name sets must be
    * disjoint — the SQL surface strips alias qualifiers, so a shared
    * name would be ambiguous. */
  def asof(left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String): DataFrame = {
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
    val r = right.select(
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
    val matched = l.unionByName(r)
      .withColumn("__asof_m",
        last(col("__asof_r"), ignoreNulls = true).over(w))
      .filter(col("__asof_side") === 1)
      .filter(col("__asof_m").isNotNull) // inner semantics
    matched.select(
      lCols.map(c => matched("__asof_l").getField(c).as(c)) ++
        rCols.map(c => matched("__asof_m").getField(c).as(c)): _*)
  }
}
