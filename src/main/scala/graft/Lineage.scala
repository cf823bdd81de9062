package graft

import org.apache.spark.sql.Dataset

/** Lineage truncation for iterative loops (connected components, BPE
  * training, ledger appends): each round's plan must not replay every
  * earlier round, so the loop snapshots its state periodically.
  *
  * Mode seam: `localCheckpoint` materializes to executor block
  * storage — the cheap, correct choice in local mode, but its blocks
  * die with an executor, so an executor-loss-tolerant CLUSTER run
  * needs a RELIABLE `checkpoint()` to the fault-tolerant FS configured
  * via `SparkContext.setCheckpointDir`. This helper picks by exactly
  * that signal: a session with a checkpoint dir gets reliable
  * checkpoints, one without keeps the local-mode behavior. Both are
  * eager so the caller's loop semantics (snapshot NOW, then mutate
  * downstream state) hold in either mode; results are byte-identical
  * (proven in ScaleDesignSpec "reliable checkpoint mode").
  */
object Lineage {
  def truncate[T](ds: Dataset[T]): Dataset[T] =
    if (ds.sparkSession.sparkContext.getCheckpointDir.isDefined)
      ds.checkpoint(eager = true)
    else ds.localCheckpoint(eager = true)

  /** Lazy twin for loops whose NEXT action materializes the round
    * anyway (e.g. the CC loop's changed-count): truncates without
    * paying a second job per round. */
  def truncateLazy[T](ds: Dataset[T]): Dataset[T] =
    if (ds.sparkSession.sparkContext.getCheckpointDir.isDefined)
      ds.checkpoint(eager = false)
    else ds.localCheckpoint(eager = false)
}
