package graft

/** Scratch table/path naming shared by every query that persists an
  * intermediate table (bucketed joins, ledgers, sink round-trips).
  *
  * Names are suffixed with a sanitized sfDir so two concurrent runs
  * over different scale factors (Verify at sf0.01 while Bench runs
  * sf0.1, or two users on one host) never clobber each other's files
  * or catalog entries.
  */
object Scratch {
  def runTag(d: String): String =
    d.replaceAll("[^A-Za-z0-9]", "_")

  def tmpPath(name: String, d: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      name + "_" + runTag(d)).toString

  /** For names that already carry a run tag (e.g. ledger tables). */
  def tmpPathRaw(name: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"), name).toString
}
