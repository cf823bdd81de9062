package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, Window => LWindow}
import org.scalatest.funsuite.AnyFunSuite

/** Permanent plan-audit gate: walks EVERY declared query's plan and
  * fails on the scale-killer shapes that correctness tests can't see —
  * an accidental cartesian product, a single-task global window over
  * non-aggregated input, or a driver-materialized relation beyond
  * codebook size. A new query that regresses any of these breaks the
  * build, not the 100 TB run.
  */
class PlanAuditSpec extends AnyFunSuite with SparkFixture {

  /** Documented tiny-side or bounded-scale products, each justified:
    * join_cross is the declared 5×5 cartesian demo; the rest broadcast
    * a provably tiny side (single query vector / ≤16-row plane or
    * centroid sets) that the planner may still print as a cartesian at
    * toy scale. */
  private val cartesianAllow = Set(
    "join_cross", "llm_cosine_topk", "llm_ann_ivf", "llm_embed_neardup",
    "llm_multimodal_project")

  /** Global (unpartitioned) windows are allowed only above an
    * Aggregate — a handful of rows by construction, same rule the
    * dedicated win_ntile_pct test enforces. Queries here may run one
    * over raw-but-constant-size input; none currently need it. */
  private val globalWindowAllow = Set.empty[String]

  /** Driver-materialized LocalRelations must stay codebook-sized. */
  private val maxLocalRows = 1000

  test("no declared query plan contains a scale-killer shape") {
    val problems = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.allDefs.foreach { q =>
      val qe = q.fn(spark, sfDir).queryExecution
      val phys = qe.executedPlan.toString
      if (phys.contains("CartesianProduct") && !cartesianAllow(q.name))
        problems += s"${q.name}: CartesianProduct in the physical plan"
      qe.optimizedPlan.foreach {
        case w: LWindow if w.partitionSpec.isEmpty =>
          val overAggregate =
            w.child.collectFirst { case a: Aggregate => a }.nonEmpty
          if (!overAggregate && !globalWindowAllow(q.name))
            problems += s"${q.name}: global window over non-aggregated input"
        case l: LocalRelation if l.data.size > maxLocalRows =>
          problems += s"${q.name}: LocalRelation with ${l.data.size} rows " +
            "(collect-backed node?)"
        case _ => ()
      }
    }
    assert(problems.isEmpty,
      s"scale-killer plan shapes found:\n${problems.mkString("\n")}")
  }
}
