package graft.streaming

import scala.collection.concurrent.TrieMap

/** Session-wide registry of lake tables (name → manifest-protocol
  * directory) — the seam that lets SQL DML TEXT reach the
  * [[LakeSink]] protocol ops. A name registered here is NOT a catalog
  * table: Spark's analyzer leaves `DELETE FROM name` / `UPDATE name` /
  * `MERGE INTO name` unresolved (no catalog entry), which is exactly
  * the window [[graft.plans.LakeDmlRule]] uses to claim the statement
  * and rewrite it to a runnable protocol command — the same
  * interception pattern every lake format's Spark connector uses.
  *
  * Names are case-insensitive (SQL identifier semantics); multipart
  * identifiers match on their last part so `lake.t` and `t` both hit
  * a registration of `t`.
  */
object LakeCatalog {

  private val tables = TrieMap.empty[String, (String, Boolean, Double)]

  /** `cdc = true` is the table-level change-data-feed property
    * (Delta's `enableChangeDataFeed`): SQL DML against the table runs
    * with change capture, so `table_changes(...)` windows spanning it
    * stay readable. `dvMaxFraction > 0` is the table-level
    * merge-on-read property (Delta's `enableDeletionVectors`, with an
    * explicit threshold): SQL UPDATE/DELETE/MERGE against the table
    * route point DML to the deletion-vector path instead of
    * copy-on-write rewrites. */
  def register(name: String, dir: String, cdc: Boolean = false,
      dvMaxFraction: Double = 0.0): Unit = {
    require(dvMaxFraction >= 0.0 && dvMaxFraction <= 1.0,
      s"dv.maxFraction must be in [0,1], got $dvMaxFraction")
    tables.put(name.toLowerCase(java.util.Locale.ROOT),
      (dir, cdc, dvMaxFraction))
  }

  def unregister(name: String): Unit =
    tables.remove(name.toLowerCase(java.util.Locale.ROOT))

  /** Lake dir for a (possibly multipart) table identifier, if
    * registered. */
  def lookup(ident: Seq[String]): Option[String] =
    ident.lastOption.flatMap(n =>
      tables.get(n.toLowerCase(java.util.Locale.ROOT))).map(_._1)

  /** Is the table's change data feed on? */
  def cdcEnabled(ident: Seq[String]): Boolean =
    ident.lastOption.flatMap(n =>
      tables.get(n.toLowerCase(java.util.Locale.ROOT))).exists(_._2)

  /** The table's merge-on-read threshold (0 = copy-on-write). */
  def dvMaxFraction(ident: Seq[String]): Double =
    ident.lastOption.flatMap(n =>
      tables.get(n.toLowerCase(java.util.Locale.ROOT)))
      .map(_._3).getOrElse(0.0)
}
