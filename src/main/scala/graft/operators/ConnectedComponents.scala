package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage 4 — transitive clustering by connected components (SURVEY.md §7 M4).
  *
  * Replaces the reference's greedy agglomerative argmax merge
  * (Clusterer.scala:30-71, cutoff 0.9999821007) with large-star/small-star
  * connected components [Kiveris et al., "Connected Components in MapReduce
  * and Beyond", SoCC'14] expressed as iterative Dataset self-joins — the
  * north_rule's named algorithm. At the reference's extreme cutoff the two
  * are equivalent on separable data (SURVEY.md §2.7 C2 note).
  *
  * Node ids are the (string) mention ids; component id = lexicographic min
  * of the component — deterministic, unlike the reference's AtomicInteger
  * NIL ids (RunKBPEntityLinkerSystem.scala:31-34).
  *
  * Scale notes: both steps avoid collect_list — `min(...) over (partition by
  * src)` window aggregations plus projections; every iteration is one shuffle
  * on `src`. `localCheckpoint` per round cuts lineage so plans stay O(1) deep.
  * Convergence when the edge set stops changing (count + bit_xor of row
  * hashes — one cheap aggregate, no expensive except(); overflow-free under
  * ANSI mode).
  */
object ConnectedComponents {

  /** edges: DataFrame(src: String, dst: String), undirected, self-loops ok.
    * nodes: DataFrame(id) — ensures isolated nodes appear in the output.
    * Returns DataFrame(id, component).
    */
  def run(nodes: DataFrame, edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._

    // Iterate over REAL edges only — isolated nodes (the vast majority in
    // dedup workloads) never enter the loop; they default to themselves in
    // the final left join. Iteration cost scales with |E|, not |V|.
    var cur = edges.select($"src", $"dst")
      .select(greatest($"src", $"dst").as("src"), least($"src", $"dst").as("dst"))
      .where($"src" =!= $"dst")
      .distinct()
      .localCheckpoint(true)

    var converged = false
    var iter = 0
    var lastSig = signature(cur)
    while (!converged && iter < maxIter) {
      val afterLarge = largeStar(cur)
      val afterSmall = smallStar(afterLarge).localCheckpoint(true)
      val sig = signature(afterSmall)
      converged = sig == lastSig
      lastSig = sig
      cur = afterSmall
      iter += 1
    }

    // converged edge set: every edge-touched node points at its component
    // min; nodes that never appeared in an edge default to themselves.
    val assigned = cur.select(col("src").as("id"), col("dst"))
      .union(cur.select(col("dst").as("id"), col("dst")))
      .groupBy($"id").agg(min($"dst").as("comp"))
    nodes.select($"id")
      .join(assigned, Seq("id"), "left")
      .select($"id", coalesce($"comp", $"id").as("component"))
  }

  private def signature(edges: DataFrame): (Long, Long) = {
    val row = edges.agg(
      count(lit(1)).as("n"),
      coalesce(bit_xor(xxhash64(col("src"), col("dst"))), lit(0L)).as("h")).head()
    (row.getLong(0), row.getLong(1))
  }

  /** large-star: connect every strictly-larger neighbor of u to the min of
    * u's neighborhood (including u). Window-min instead of collect_list —
    * no per-group array materialization, skew-safe under AQE.
    */
  private[operators] def largeStar(edges: DataFrame): DataFrame = {
    import edges.sparkSession.implicits._
    val bidir = edges.select($"src", $"dst")
      .union(edges.select($"dst".as("src"), $"src".as("dst")))
    val w = Window.partitionBy($"src")
    bidir
      .withColumn("m", least(min($"dst").over(w), $"src"))
      .where($"dst" > $"src")
      .select(col("dst").as("src"), col("m").as("dst"))
      .distinct()
  }

  /** small-star: orient edges high→low, connect all smaller neighbors (and
    * u itself) to the neighborhood min.
    */
  private[operators] def smallStar(edges: DataFrame): DataFrame = {
    import edges.sparkSession.implicits._
    val oriented = edges
      .select(greatest($"src", $"dst").as("src"), least($"src", $"dst").as("dst"))
    val w = Window.partitionBy($"src")
    val withMin = oriented.withColumn("m", min($"dst").over(w))
    withMin.select(col("dst").as("src"), col("m").as("dst"))
      .union(withMin.select($"src", col("m").as("dst")))
      .select(greatest($"src", $"dst").as("src"), least($"src", $"dst").as("dst"))
      .distinct()
  }
}
