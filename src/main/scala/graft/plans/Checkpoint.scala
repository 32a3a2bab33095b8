package graft.plans

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative operators (the CC loops in
  * [[graft.queries.LlmDedup]]), with the reliability level chosen by
  * the SESSION, not hardcoded at the call site (VERDICT r6 #3):
  *
  *  - when the SparkContext has a checkpoint directory configured
  *    (`sc.setCheckpointDir(...)` — what a cluster job does), rounds
  *    are RELIABLY checkpointed to that directory: the truncated
  *    lineage survives executor loss, so a 100-node CC job resumes
  *    the round instead of recomputing the whole loop;
  *  - otherwise (tests, local exploration) `localCheckpoint` keeps the
  *    round in executor storage — faster, and the blocks are reclaimed
  *    by the ContextCleaner once unreferenced.
  *
  * Both are EAGER: the round materializes before the previous round's
  * blocks are released, which is what makes per-round truncation safe
  * in the first place. Reliable checkpoint files are cleaned by
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` or the
  * job's own directory lifecycle (a bounded number of round
  * directories either way — each round's checkpoint is dropped from
  * lineage as soon as the next round lands).
  */
object Checkpoint {

  /** Session-conf override: `true` forces reliable checkpoints (the
    * context must have a checkpoint dir or Spark throws), `false`
    * forces localCheckpoint, anything else / unset = auto (reliable
    * iff a checkpoint dir is configured). A runtime conf rather than a
    * static so a shared long-lived session (tests, notebooks) can flip
    * it per job.
    */
  val ReliableConf = "graft.checkpoint.reliable"

  /** True iff [[truncate]] will use reliable checkpoints. */
  def reliable(df: DataFrame): Boolean =
    df.sparkSession.conf.get(ReliableConf, "auto") match {
      case "true"  => true
      case "false" => false
      case _       => df.sparkSession.sparkContext.getCheckpointDir.isDefined
    }

  /** Eagerly materialize `df` and cut its lineage — reliably when the
    * session has a checkpoint dir, locally otherwise.
    */
  def truncate(df: DataFrame): DataFrame =
    if (reliable(df)) df.checkpoint() else df.localCheckpoint()

  /** [[truncate]] + row count in as few jobs as the checkpoint mode
    * allows (r19, guide §1.2: an iterative loop pays its per-round
    * fixed cost × rounds, and the star-CC loop ran TWO driver jobs per
    * round — materialize, then count). On the localCheckpoint path the
    * checkpoint is taken LAZILY and the count() action materializes
    * it: count computes every partition (the checkpoint wrapper is a
    * LogicalRDD, opaque to column pruning, so nothing is skipped), and
    * local checkpoint blocks are saved as a side effect of that first
    * full computation — ONE job yields both the truncated relation and
    * its cardinality. On the reliable path the EAGER checkpoint is
    * kept: a reliable checkpoint re-runs lineage to write files, so
    * the lazy order would compute the round twice; there the count is
    * a cheap second job over the checkpointed blocks (exactly the old
    * behavior — cluster semantics unchanged).
    */
  def truncateCounted(df: DataFrame): (DataFrame, Long) = {
    val t = if (reliable(df)) df.checkpoint() else df.localCheckpoint(false)
    (t, t.count())
  }
}
