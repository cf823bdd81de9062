package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` exports one entry per implemented operator from
  * SURVEY.md §2; `oracleSql` carries the DuckDB-equivalent SQL for
  * every deterministically-checkable query (operators whose semantics
  * DuckDB cannot reproduce — approximate sketches, hash-seeded LSH —
  * are declared without an oracle and get the driver's rows-only
  * check).
  */
object SparkEntry {

  /** All declared operators, in SURVEY.md §2 section order.
    *
    * `llm_dedup_near` is the SURVEY §2 row id for near-duplicate
    * detection; the implementation ships as three variants
    * (`llm_dedup_minhash` / `_simhash` / `_ngram`). The §2 id is
    * exported verbatim as an alias of the flagship MinHash+LSH variant
    * so the contract key-set matches §2 line for line.
    */
  val allDefs: Seq[QueryDef] = {
    val base =
      operators.Relational.defs ++
      operators.SqlSurface.defs ++
      operators.Extensions.defs ++
      operators.Scalars.defs ++
      operators.Analytic.defs ++
      operators.EventOps.defs ++
      sources.KinesisFixture.defs ++
      llm.TextOps.defs ++
      llm.VectorOps.defs ++
      llm.MultimodalOps.defs ++
      llm.PipelineOps.defs ++
      llm.BpeOps.defs
    val minhash = base.find(_.name == "llm_dedup_minhash")
      .getOrElse(sys.error("llm_dedup_minhash missing from TextOps.defs"))
    base :+ minhash.copy(name = "llm_dedup_near")
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1-shape pricing summary (SURVEY.md §7 M0). */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
