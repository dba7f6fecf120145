package graft.core

import org.apache.spark.sql.DataFrame

/** The one switch for the local-vs-reliable checkpoint choice.
  *
  * Iterative operators (lineage walks, label-propagation CC, the global
  * rank) must eagerly truncate plan lineage every iteration or the plan
  * tree grows with depth. On local[n] the right tool is
  * `localCheckpoint` (executor-local blocks, no directory needed); on a
  * real cluster those blocks die with an executor, so long jobs want
  * reliable `checkpoint` into the fault-tolerant checkpoint dir. Every
  * pinning operator routes through [[pin]], so ONE session conf flips
  * the whole engine:
  *
  *   spark.conf.set(Checkpoints.ModeKey, "reliable")
  *   spark.sparkContext.setCheckpointDir("hdfs://…/ckpt")
  *
  * Both modes are EAGER — callers rely on the action having run (plan
  * truncated, Observation metrics posted) when pin() returns.
  */
object Checkpoints {
  val ModeKey = "spark.graft.checkpoint.mode"

  /** Truncate `df`'s plan lineage per the session's configured mode:
    * "local" (default) → `localCheckpoint`, "reliable" → `checkpoint`. */
  def pin(df: DataFrame): DataFrame =
    df.sparkSession.conf.getOption(ModeKey).getOrElse("local") match {
      case "reliable" => df.checkpoint()
      case "local"    => df.localCheckpoint()
      case other => throw new IllegalArgumentException(
        s"$ModeKey must be 'local' or 'reliable', got '$other'")
    }
}
