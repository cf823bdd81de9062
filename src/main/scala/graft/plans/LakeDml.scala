package graft.plans

import graft.streaming.{LakeCatalog, LakeSink}

import org.apache.spark.sql.{AnalysisException, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{IntegerType, LongType}

/** SQL DML TEXT surface for the lake protocol: Spark's parser already
  * produces `DeleteFromTable` / `UpdateTable` / `MergeIntoTable`
  * logical nodes for the standard DML grammar — what a plain session
  * lacks is an execution path for tables outside a DSv2 catalog. This
  * rule (injected via [[graft.GraftExtensions]]) claims DML whose
  * target identifier is registered in [[LakeCatalog]] and rewrites the
  * node to a runnable command that dispatches to the copy-on-write
  * protocol op ([[LakeSink.deleteWhere]]/[[LakeSink.updateWhere]]/
  * [[LakeSink.mergeInto]]) — so `spark.sql("DELETE FROM lake_t WHERE
  * …")` is the protocol delete, crash windows and all. Unregistered
  * tables pass through untouched (normal analysis errors apply).
  *
  * Expressions cross from the parsed node into DataFrame-land via
  * their canonical SQL form (`Expression.sql` → `functions.expr`):
  * the statements this surface accepts are over the lake table's own
  * columns, which round-trip exactly; correlated subqueries in DML
  * predicates are out of scope and rejected by the re-parse.
  */
case class LakeDmlRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def lakeDir(p: LogicalPlan): Option[String] = p match {
    case SubqueryAlias(_, child) => lakeDir(child) // MERGE INTO t AS a
    case u: UnresolvedRelation => LakeCatalog.lookup(u.multipartIdentifier)
    case _ => None
  }

  /** Merge keys from an equi-conjunction `t.k = s.k [AND …]`; the
    * column name must match on both sides (same-name key contract of
    * [[LakeSink.mergeInto]]). */
  private def mergeKeys(cond: Expression): Option[Seq[String]] = {
    def leaf(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.nameParts.last)
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val keys = conjuncts(cond).map {
      case EqualTo(l, r) =>
        (leaf(l), leaf(r)) match {
          case (Some(a), Some(b)) if a.equalsIgnoreCase(b) => Some(a)
          case _ => None
        }
      case _ => None
    }
    if (keys.forall(_.isDefined)) Some(keys.flatten) else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {

    case DeleteFromTable(target, cond) if lakeDir(target).isDefined =>
      LakeDeleteCommand(lakeDir(target).get, cond.sql)

    case UpdateTable(target, assignments, cond) if lakeDir(target).isDefined =>
      val pairs = assignments.map {
        case Assignment(k: UnresolvedAttribute, v) => k.nameParts.last -> v.sql
        case Assignment(k: AttributeReference, v) => k.name -> v.sql
        case other => throw new AnalysisException(
          errorClass = "_LEGACY_ERROR_TEMP_3100",
          messageParameters = Map("message" ->
            s"lake UPDATE: unsupported assignment target $other"))
      }
      LakeUpdateCommand(lakeDir(target).get, pairs,
        cond.map(_.sql).getOrElse("true"))

    case m: MergeIntoTable if lakeDir(m.targetTable).isDefined =>
      val dir = lakeDir(m.targetTable).get
      val starShape =
        m.matchedActions.forall {
          case UpdateStarAction(None) => true; case _ => false } &&
        m.matchedActions.size == 1 &&
        m.notMatchedActions.forall {
          case InsertStarAction(None) => true; case _ => false } &&
        m.notMatchedActions.size == 1 &&
        m.notMatchedBySourceActions.isEmpty
      val keys = mergeKeys(m.mergeCondition)
      if (!starShape || keys.isEmpty || keys.get.isEmpty)
        throw new AnalysisException(
          errorClass = "_LEGACY_ERROR_TEMP_3100",
          messageParameters = Map("message" ->
            ("lake MERGE supports WHEN MATCHED THEN UPDATE SET * / " +
              "WHEN NOT MATCHED THEN INSERT * on same-name equi-keys; got: " +
              m.simpleString(3))))
      LakeMergeCommand(dir, m.sourceTable, keys.get)
  }
}

/** `DELETE FROM <lake> WHERE <cond>` → [[LakeSink.deleteWhere]].
  * Returns the protocol op's receipt row. */
case class LakeDeleteCommand(dir: String, condSql: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType)(),
    AttributeReference("segments_rewritten", IntegerType)(),
    AttributeReference("segments_dropped", IntegerType)(),
    AttributeReference("rows_deleted", LongType)())
  override def run(session: SparkSession): Seq[Row] = {
    val (v, rw, dr, del) = LakeSink.deleteWhere(session, dir, expr(condSql))
    Seq(Row(v, rw, dr, del))
  }
}

/** `UPDATE <lake> SET … [WHERE …]` → [[LakeSink.updateWhere]]. */
case class LakeUpdateCommand(dir: String,
    assignments: Seq[(String, String)], condSql: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType)(),
    AttributeReference("segments_rewritten", IntegerType)(),
    AttributeReference("rows_updated", LongType)())
  override def run(session: SparkSession): Seq[Row] = {
    val (v, rw, upd) = LakeSink.updateWhere(session, dir, expr(condSql),
      assignments.map { case (k, sql) => k -> expr(sql) }.toMap)
    Seq(Row(v, rw, upd))
  }
}

/** `MERGE INTO <lake> USING <source> ON t.k = s.k WHEN MATCHED THEN
  * UPDATE SET * WHEN NOT MATCHED THEN INSERT *` →
  * [[LakeSink.mergeInto]]. The source plan (table, view, or subquery)
  * is analyzed lazily at run time. */
case class LakeMergeCommand(dir: String, source: LogicalPlan,
    keys: Seq[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType)(),
    AttributeReference("segments_rewritten", IntegerType)(),
    AttributeReference("rows_updated", LongType)(),
    AttributeReference("rows_inserted", LongType)())
  override def run(session: SparkSession): Seq[Row] = {
    val src = org.apache.spark.sql.graft.PlanBridge.ofRows(session, source)
    val (v, rw, upd, ins) = LakeSink.mergeInto(session, dir, src, keys)
    Seq(Row(v, rw, upd, ins))
  }
}
