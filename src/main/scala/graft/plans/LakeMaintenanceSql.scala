package graft.plans

import graft.streaming.{LakeCatalog, LakeSink}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{IntegerType, LongType, StructType}

/** MAINTENANCE DDL for lake tables — the three statements Spark's
  * grammar does not have (`VACUUM`, `OPTIMIZE`, `DESCRIBE HISTORY`,
  * the Delta surface), added via `injectParser`: a THIN delegating
  * parser that claims exactly these statement shapes when the target
  * is a [[LakeCatalog]]-registered lake and hands EVERYTHING else —
  * including these verbs over unregistered names — to the delegate
  * untouched. This is deliberately not an ANTLR grammar: three
  * anchored regexes over whole statements cannot interfere with any
  * SQL the delegate accepts, which is the safety property a parser
  * extension must prove.
  *
  *   VACUUM t [RETAIN <n> VERSIONS]         → [[LakeSink.vacuum]]
  *   OPTIMIZE t                              → [[LakeSink.compact]]
  *   OPTIMIZE t CLUSTER BY (a[, b …])        → clustered compaction
  *   OPTIMIZE t ZORDER BY (a, b)             → Z-order compaction
  *   DESCRIBE HISTORY t                      → [[LakeSink.history]]
  */
object LakeMaintenanceSql {

  private val Vacuum =
    """(?is)^\s*VACUUM\s+([\w.]+)(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?\s*;?\s*$""".r
  private val Optimize =
    """(?is)^\s*OPTIMIZE\s+([\w.]+)\s*;?\s*$""".r
  private val OptimizeCluster =
    """(?is)^\s*OPTIMIZE\s+([\w.]+)\s+CLUSTER\s+BY\s*\(([^)]+)\)\s*;?\s*$""".r
  private val OptimizeZorder =
    """(?is)^\s*OPTIMIZE\s+([\w.]+)\s+ZORDER\s+BY\s*\(\s*([\w]+)\s*,\s*([\w]+)\s*\)\s*;?\s*$""".r
  private val History =
    """(?is)^\s*DESCRIBE\s+HISTORY\s+([\w.]+)\s*;?\s*$""".r
  // Schema-evolution DDL (r12): valid Spark grammar too, but claimed
  // ONLY for LakeCatalog-registered names (which are deliberately not
  // catalog tables — the delegate would fail them with TABLE_NOT_FOUND
  // anyway), so catalog-table ALTERs are untouched.
  private val AlterRenameCol =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.]+)\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)\s*;?\s*$""".r
  private val AlterDropCol =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.]+)\s+DROP\s+COLUMN\s+(\w+)\s*;?\s*$""".r
  private val AlterAddCol =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.]+)\s+ADD\s+COLUMN\s+(\w+)\s+([\w<>(),. ]+?)\s*;?\s*$""".r

  private def dirOf(ident: String): Option[String] =
    LakeCatalog.lookup(ident.split('.').toSeq)

  /** The claimed plan, or None → delegate. */
  def parse(sqlText: String): Option[LogicalPlan] = sqlText match {
    case Vacuum(t, retain) => dirOf(t).map(d =>
      LakeVacuumCommand(d, Option(retain).map(_.toInt).getOrElse(2)))
    case Optimize(t) => dirOf(t).map(d =>
      LakeOptimizeCommand(d, Nil, None))
    case OptimizeCluster(t, cols) => dirOf(t).map(d =>
      LakeOptimizeCommand(d, cols.split(',').map(_.trim).toSeq, None))
    case OptimizeZorder(t, x, y) => dirOf(t).map(d =>
      LakeOptimizeCommand(d, Nil, Some((x, y))))
    case History(t) => dirOf(t).map(d =>
      LakeSink.history(SparkSession.active, d).queryExecution.analyzed)
    case AlterRenameCol(t, a, b) => dirOf(t).map(d =>
      LakeAlterColumnCommand(d, "rename", a, Some(b), None))
    case AlterDropCol(t, a) => dirOf(t).map(d =>
      LakeAlterColumnCommand(d, "drop", a, None, None))
    case AlterAddCol(t, a, tpe) => dirOf(t).map(d =>
      LakeAlterColumnCommand(d, "add", a, None, Some(tpe)))
    case _ => None
  }
}

/** ALTER TABLE … RENAME/DROP/ADD COLUMN over a lake table — rename and
  * drop are metadata-only via the manifest's COLUMN MAPPING
  * ([[LakeSink.evolveRenameColumn]]/[[LakeSink.evolveDropColumn]]);
  * add is the additive evolution that predates them. Returns the new
  * schema generation. */
case class LakeAlterColumnCommand(dir: String, op: String, col: String,
    to: Option[String], dataType: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("schema_v", LongType)())
  override def run(session: SparkSession): Seq[Row] = {
    val sv = op match {
      case "rename" => LakeSink.evolveRenameColumn(session, dir, col, to.get)
      case "drop" => LakeSink.evolveDropColumn(session, dir, col)
      case "add" => LakeSink.evolveAddColumn(session, dir, col,
        org.apache.spark.sql.types.DataType.fromDDL(dataType.get))
    }
    Seq(Row(sv))
  }
}

case class LakeVacuumCommand(dir: String, retainVersions: Int)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("segments_deleted", IntegerType)(),
    AttributeReference("manifests_deleted", IntegerType)())
  override def run(session: SparkSession): Seq[Row] = {
    val (segs, mans) = LakeSink.vacuum(dir, retainVersions)
    Seq(Row(segs, mans))
  }
}

case class LakeOptimizeCommand(dir: String, clusterBy: Seq[String],
    zorderBy: Option[(String, String)]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType)(),
    AttributeReference("segments_compacted", IntegerType)())
  override def run(session: SparkSession): Seq[Row] = {
    val (v, n) = LakeSink.compact(session, dir,
      clusterBy = clusterBy, zorderBy = zorderBy)
    Seq(Row(v, n))
  }
}

/** The delegating parser: [[LakeMaintenanceSql.parse]] first, delegate
  * for everything else (and for every non-plan parse entry point). */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    LakeMaintenanceSql.parse(sqlText).getOrElse(delegate.parsePlan(sqlText))
  override def parsePlanWithParameters(sqlText: String,
      ctx: ParameterContext): LogicalPlan =
    LakeMaintenanceSql.parse(sqlText)
      .getOrElse(delegate.parsePlanWithParameters(sqlText, ctx))
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
