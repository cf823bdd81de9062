package graft.tools

import org.apache.spark.sql.SparkSession

/** Cold-start probe for the r7 verdict watch item: llm_curation_e2e
  * once showed a one-off ~27 s FIRST run in a fresh session (steady
  * ~1 s) and the cause was never named. This main reproduces the exact
  * conditions — fresh JVM, fresh session, NO bench warm pass — and
  * splits the first invocation into analysis/codegen-sensitive pieces:
  *
  *   plan     = building the DataFrame (analysis only)
  *   first    = first .count() (codegen compile + execution)
  *   second   = second .count() (steady state)
  *   noWSCG   = first run in a SECOND fresh-ish isolation: whole-stage
  *              codegen disabled (same work, interpreted) — if `first`
  *              is codegen-compile-bound, this one will NOT inflate
  *
  * Run it several times: `for i in 1 2 3; do sbt "runMain
  * graft.tools.CurationColdProbe"; done`. Each sbt invocation is a
  * fresh JVM, which is the only honest way to chase a cold-start
  * artifact. */
object CurationColdProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // SPARK_GRAFT_NOWSCG=1: disable whole-stage codegen BEFORE the
    // first run — if the first-run premium is Janino compile time of
    // the big composed plan, it disappears in this mode
    if (sys.env.get("SPARK_GRAFT_NOWSCG").contains("1"))
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
    // SPARK_GRAFT_CONTROL=<query>: run that query as the session's
    // first — if a trivial query pays the same first-run premium, the
    // premium is generic session warm-up, not anything curation-shaped
    val name = sys.env.getOrElse("SPARK_GRAFT_CONTROL", "llm_curation_e2e")
    val q = graft.SparkEntry.queries(name)
    val (df, tPlan) = timed(q(spark, sfDir))
    val (_, tFirst) = timed(df.count())
    val (_, tSecond) = timed(q(spark, sfDir).count())
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val (_, tNoWscg) = timed(q(spark, sfDir).count())
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    println(f"[curationcold] plan=$tPlan%.2f s  first=$tFirst%.2f s  " +
      f"second=$tSecond%.2f s  noWSCG(after-warm)=$tNoWscg%.2f s")
    spark.stop()
  }
}
