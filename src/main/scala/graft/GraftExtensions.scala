package graft

import graft.functions.{CosineSimilarity, DotProduct, MinHashSig, NGramHashes, SentenceSplit, SimHash64, SortedIntersectCount}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Standard library deployment hook: add
  * `spark.sql.extensions=graft.GraftExtensions` to a cluster's conf
  * and every session gets the engine's native expressions as SQL
  * functions — usable from pure SQL with whole-stage codegen, no Scala
  * imports required:
  *
  * {{{
  *   SELECT dot_product(a.embedding, b.embedding) FROM ...
  *   SELECT minhash_sig(ngram_hashes(split(text, ' '), 3), 64) FROM ...
  * }}}
  *
  * (Per-session registration without the config is
  * [[graft.functions.VectorFunctions.register]].)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo(classOf[GraftExtensions].getName, name, usage, "", "")

    ext.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - double dot product of two float arrays"),
      (es: Seq[Expression]) => DotProduct(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity", "cosine_similarity(a, b) - cosine of two float arrays"),
      (es: Seq[Expression]) => CosineSimilarity(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("ngram_hashes"),
      info("ngram_hashes", "ngram_hashes(tokens, n) - hashes of word n-grams"),
      (es: Seq[Expression]) => NGramHashes(es.head, intArg(es(1), "n"))))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(hashes, k) - k-slot minhash signature"),
      (es: Seq[Expression]) => MinHashSig(es.head, intArg(es(1), "k"))))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(hashes) - 64-bit weighted simhash"),
      (es: Seq[Expression]) => SimHash64(es.head)))
    ext.injectFunction((FunctionIdentifier("sorted_intersect_count"),
      info("sorted_intersect_count",
        "sorted_intersect_count(a, b) - |A∩B| of sorted long arrays"),
      (es: Seq[Expression]) => SortedIntersectCount(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("split_sentences"),
      info("split_sentences",
        "split_sentences(text) - generator: one row per sentence as (pos, sentence)"),
      (es: Seq[Expression]) => SentenceSplit(es.head)))

    // SQL DML text surface: DELETE FROM / UPDATE / MERGE INTO against
    // a LakeCatalog-registered table dispatches to the copy-on-write
    // manifest protocol (graft.plans.LakeDml).
    ext.injectResolutionRule(graft.plans.LakeDmlRule)

    // table_changes('t', fromV, toV) — the Delta-CDF table-valued
    // function over a registered lake's change data feed. A real TVF
    // registration (not a rewrite rule): the analyzer resolves TVF
    // names eagerly, before extension rules run.
    ext.injectTableFunction((FunctionIdentifier("table_changes"),
      info("table_changes",
        "table_changes(table, fromVersion, toVersion) - row-level " +
          "changes of a lake table as (..., _change_type, _commit_version)"),
      (es: Seq[Expression]) => graft.plans.LakeDml.tableChanges(es)))
    ext.injectTableFunction((FunctionIdentifier("table_history"),
      info("table_history",
        "table_history(table) - commit audit log of a lake table " +
          "(version, n_segments, schema_v, ...)"),
      (es: Seq[Expression]) => graft.plans.LakeDml.tableHistory(es)))

    // Maintenance DDL Spark's grammar lacks (the Delta surface):
    // VACUUM / OPTIMIZE [CLUSTER BY|ZORDER BY] / DESCRIBE HISTORY over
    // registered lake tables — a thin delegating parser that claims
    // ONLY these whole-statement shapes (graft.plans.LakeMaintenanceSql).
    ext.injectParser((_, delegate) =>
      new graft.plans.GraftSqlParser(delegate))
  }
}
