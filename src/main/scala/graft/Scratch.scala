package graft

/** Scratch table/path naming shared by every query that persists an
  * intermediate table (bucketed joins, ledgers, sink round-trips).
  *
  * Names are suffixed with a sanitized sfDir AND a per-JVM nonce, so
  * neither two runs over different scale factors (Verify at sf0.01
  * while Bench runs sf0.1) nor two concurrent runs at the SAME sf
  * (two users on one host, or a streaming ledger ingest next to an
  * ad-hoc dedup) can clobber each other's files or catalog entries
  * mid-read. Within one JVM the nonce is stable, so a query that
  * writes a scratch table and re-reads it later in the same run
  * resolves the same name. Callers that need a cross-JVM-stable path
  * (none today) would have to pass their own tag.
  */
object Scratch {
  private val jvmNonce: String =
    java.lang.Long.toUnsignedString(
      java.util.concurrent.ThreadLocalRandom.current().nextLong(), 16)

  def runTag(d: String): String =
    d.replaceAll("[^A-Za-z0-9]", "_") + "_" + jvmNonce

  def tmpPath(name: String, d: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      name + "_" + runTag(d)).toString

  /** For names that already carry a run tag (e.g. ledger tables). */
  def tmpPathRaw(name: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"), name).toString

  /** A per-JVM-stable scratch path WITHOUT the sfDir tag — for the
    * one case where a STATIC string and a runtime query in the same
    * JVM must agree on a path: an oracle SQL text (built at object
    * init, before any sfDir is known) that reads files the query
    * writes (sql_lake_export's DuckDB-reads-the-export interop
    * proof). Still nonce'd, so concurrent JVMs never collide. */
  def jvmPath(name: String): String = tmpPathRaw(name + "_" + jvmNonce)
}
