package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve for multi-dimensional data clustering.
  *
  * Bit-interleaves two normalized dimensions into one sort key, so a
  * `repartitionByRange(zvalue).sortWithinPartitions(zvalue)` write
  * gives every output file a z-contiguous tile of the (x, y) plane —
  * each file's parquet footer then carries tight min/max stats on
  * BOTH source columns, and a selective filter on EITHER dimension
  * skips most row groups at scan time. Single-column clustering
  * (`sink_clustered`) gets one dimension only; this is the layout
  * Delta/Iceberg expose as OPTIMIZE ZORDER BY, built from plain
  * codegen-friendly bit arithmetic (`shiftright`/`&`/`|` fold into
  * whole-stage codegen; no UDF).
  *
  * Normalization: each dimension is scaled equal-width from its
  * [0, max] domain onto `bits` bits, because raw interleaving of
  * imbalanced domains degenerates (the wide domain's high bits
  * dominate the key and the curve collapses to single-column order).
  * At 100 TB the domain bounds come from table stats or a rank
  * (equal-depth) pass — `range_partition_id` in Delta's
  * implementation; equal-width on a known bound is the stats-free
  * deterministic variant, which is what a driver-checked query needs.
  */
object ZOrder {

  /** Morton key of `x` interleaved with `y` (x in even bit positions,
    * y in odd), after equal-width normalization of each onto `bits`
    * bits via its non-negative inclusive domain bound (pass the ACTUAL
    * data max from stats — see below). Pure integer arithmetic —
    * deterministic and layout-only (the key never reaches query
    * results).
    *
    * Every dimension is stretched onto the FULL bit range even when
    * its domain already fits: a domain left in the low bits (say 15
    * users against a 43 k-minute time axis) contributes no high-order
    * bits, the other dimension dominates the key, and the "z-order"
    * silently degenerates to a single-column sort — measured as zero
    * row-group skipping on the narrow dimension before this rule. The
    * corollary is that `xMax`/`yMax` must be the real data bounds, not
    * a nominal schema domain, or the same collapse happens in scaled
    * form. */
  def zvalue(x: Column, y: Column, xMax: Long, yMax: Long,
      bits: Int = 8): Column = {
    require(bits > 0 && bits <= 16, s"bits=$bits out of (0,16]")
    val top = (1L << bits) - 1
    // Column./ is DOUBLE division — floor+cast keeps the scaled value
    // exactly integral (products here stay < 2^53, where doubles are
    // exact, so the floor is the true integer quotient). The clamp
    // into [0, top] keeps out-of-domain inputs (negative, or beyond
    // the passed bound — stale stats, late rows) from overflowing /
    // sign-extending past `bits` and corrupting the interleave for
    // every OTHER row in their file's min/max range; they degrade to
    // edge-of-curve placement instead.
    def norm(c: Column, bound: Long): Column =
      if (bound <= 0L) lit(0L)
      else least(greatest(
        floor((c.cast("long") * top) / bound).cast("long"), lit(0L)),
        lit(top))
    val xi = norm(x, xMax)
    val yi = norm(y, yMax)
    (0 until bits).map { i =>
      shiftleft(shiftright(xi, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(yi, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }
}
