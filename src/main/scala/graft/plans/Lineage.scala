package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Lineage cuts, unified (VERDICT r2 #5): every operator that materializes an
  * intermediate frame must survive executor loss on a real cluster.
  *
  * `cut` uses a RELIABLE checkpoint whenever the session has a checkpoint dir
  * configured (`sc.setCheckpointDir` — cluster deployments), and falls back to
  * an eager `localCheckpoint` otherwise (local/test runs, where executor loss
  * means JVM loss anyway). A bare `localCheckpoint(true)` on a cluster stores
  * blocks on executors only — one lost executor kills the job mid-stage.
  */
object Lineage {

  def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint(true)
    else df.localCheckpoint(true)

  /** Rotating cut for ITERATIVE algorithms (connected components): reliable
    * checkpoints otherwise accumulate one rdd-N directory per round and never
    * get cleaned (`spark.cleaner.referenceTracking.cleanCheckpoints` is off by
    * default) — a long cluster run fills the checkpoint dir without bound.
    *
    * Each `cut` call, once the NEW checkpoint is fully materialized (eager),
    * deletes the files of the round before it: round N is computed by reading
    * round N−1, so N−1 is dead the moment N exists. The final round's files
    * are intentionally kept — the returned frame still reads them.
    *
    * New checkpoint files are discovered by diffing the checkpoint dir before
    * and after the eager cut; `setCheckpointDir` puts each app under its own
    * UUID subdir, so the listing sees only this application's rounds.
    *
    * Constraints (by design): (1) strictly SINGLE-THREADED iterate-then-cut
    * usage — two concurrent Rotating instances in one SparkContext would
    * mis-attribute each other's fresh dirs in the listing diff and delete
    * live rounds; each iterative algorithm owns one instance for its local
    * loop. (2) The FINAL round's files are intentionally retained — the
    * returned frame still reads them; callers that materialize a downstream
    * copy (e.g. their own Lineage.cut) and outlive many invocations should
    * enable `spark.cleaner.referenceTracking.cleanCheckpoints` or clean the
    * checkpoint dir between batches. Rotation bounds growth DURING a run
    * from one-dir-per-iteration to one; it does not manage cross-run
    * lifecycle.
    */
  final class Rotating(df0: DataFrame) {
    private val sc = df0.sparkSession.sparkContext
    private var lastRound: Seq[Path] = Nil

    def cut(df: DataFrame): DataFrame = sc.getCheckpointDir match {
      case None => df.localCheckpoint(true)
      case Some(dir) =>
        val root = new Path(dir)
        val fs = root.getFileSystem(sc.hadoopConfiguration)
        def ls(): Set[String] =
          if (fs.exists(root)) fs.listStatus(root).map(_.getPath.toString).toSet
          else Set.empty
        val before = ls()
        val out = df.checkpoint(true) // eager: materialized on return
        val fresh = (ls() -- before).toSeq.sorted
        lastRound.foreach(p => fs.delete(p, true))
        lastRound = fresh.map(new Path(_))
        out
    }
  }
}
