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
    * Each instance owns a UNIQUE subdirectory of the session checkpoint dir
    * (`graft-rotating-<uuid>/`) and materializes each round as a parquet
    * table `round-N` inside it, reading it back as the returned frame — the
    * same durability as a reliable RDD checkpoint (files on the checkpoint
    * filesystem, lineage fully truncated) with deletion scoped to THIS
    * instance's own rounds. Once round N is fully written, round N−1 is
    * deleted: round N was computed by reading N−1, so N−1 is dead the moment
    * N exists. The final round's files are intentionally kept — the returned
    * frame still reads them.
    *
    * Concurrency (VERDICT/ADVICE r3): safe. The old implementation
    * attributed fresh checkpoint dirs by a before/after listing diff, so a
    * concurrent Rotating instance — or any concurrent plain `Lineage.cut`
    * reliable checkpoint — in the same SparkContext could be mis-attributed
    * and have live files deleted. Per-instance subdirectories remove the
    * shared namespace entirely; any number of concurrent Rotating loops and
    * plain cuts coexist.
    *
    * Constraints: (1) frames must be parquet-expressible (every engine frame
    * is; an exotic caller type that parquet cannot round-trip would fail
    * loudly at write). (2) The FINAL round's files are retained; callers
    * that materialize a downstream copy and outlive many invocations should
    * clean the checkpoint dir between batches. Rotation bounds growth DURING
    * a run from one-dir-per-iteration to one; it does not manage cross-run
    * lifecycle.
    */
  final class Rotating(df0: DataFrame) {
    private val spark = df0.sparkSession
    private val sc = spark.sparkContext
    private val instanceDir: Option[Path] = sc.getCheckpointDir
      .map(d => new Path(d, s"graft-rotating-${java.util.UUID.randomUUID()}"))
    private var round = 0
    private var prev: Option[Path] = None

    def cut(df: DataFrame): DataFrame = instanceDir match {
      case None => df.localCheckpoint(true)
      case Some(root) =>
        val target = new Path(root, s"round-$round")
        round += 1
        df.write.mode("overwrite").parquet(target.toString)
        val out = spark.read.parquet(target.toString)
        val fs = root.getFileSystem(sc.hadoopConfiguration)
        prev.foreach(p => fs.delete(p, true))
        prev = Some(target)
        out
    }
  }
}
