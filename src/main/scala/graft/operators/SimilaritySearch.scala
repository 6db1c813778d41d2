package graft.operators

import graft.functions.HyperplaneSigExpr
import org.apache.spark.sql.GraftExpr
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) probe set,
  * one pass over the corpus, per-probe window top-k. Exact; O(corpus ×
  * probes) but fully scan-parallel, no shuffle of the corpus.
  *
  * Scale path: cosine-LSH (random-hyperplane signature buckets with
  * multi-probe by bit-flips) — candidates only from matching buckets, then
  * exact re-rank. Recall tunable via `planes` (bucket granularity) and
  * `probeBits` (how many 1-bit-flipped neighbor buckets to probe).
  */
object SimilaritySearch {

  def hyperplaneSig(vec: Column, planes: Int, seed: Long): Column =
    GraftExpr.column(HyperplaneSigExpr(GraftExpr.expression(vec), planes, seed))

  private def withNorm(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("norm", sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x)))

  private def cosineCol: Column =
    aggregate(zip_with(col("v"), col("qv"), (a, b) => a * b), lit(0.0), (a, x) => a + x) /
      (col("norm") * col("qnorm"))

  /** Exact brute-force top-k: corpus × broadcast(probes). */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = withNorm(corpus, idCol, vecCol)
    val p = withNorm(probes, idCol, vecCol)
      .select(col("id").as("qid"), col("v").as("qv"), col("norm").as("qnorm"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("id"))
    c.crossJoin(broadcast(p))
      .where(col("id") =!= col("qid"))
      .withColumn("cos", cosineCol)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("id"), col("cos"), col("rank"))
  }

  /** LSH-bucketed ANN top-k: MULTIPLE independent hash tables (like the
    * minhash band trick — a near neighbor only needs to collide in ONE
    * table) plus per-table multi-probe (flip each of the first `probeBits`
    * signature bits). Candidates = bucket matches in any table; exact cosine
    * re-rank inside. Single-table flip-probing alone collapses on real data
    * (r1 measured ~13% recall at planes=12); with L tables the miss
    * probability is (1−pᵖˡᵃⁿᵉˢ)ᴸ per probe pair. The corpus side explodes
    * ×tables (narrow, no shuffle — the probe side is the broadcast);
    * candidate fan-in stays bucket-bounded, never a cross join.
    *
    * Recall < 1 by construction; pair with `bruteForceTopK` (see
    * `lshRecall`) to measure it.
    */
  def lshTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
              vecCol: String, k: Int, planes: Int = 8, tables: Int = 4,
              probeBits: Int = 2, seed: Long = 42L): DataFrame = {
    import corpus.sparkSession.implicits._
    def sigs(v: Column): Seq[(Int, Column)] =
      (0 until tables).map(t => t -> hyperplaneSig(v, planes, seed + 1000L * t))

    val c = withNorm(corpus, idCol, vecCol)
      .withColumn("tb", explode(array(sigs(col("v")).map { case (t, s) =>
        struct(lit(t).as("t"), s.as("b")) }: _*)))
      .select(col("id"), col("v"), col("norm"),
        concat(col("tb.t"), lit(":"), col("tb.b")).as("bucket"))

    // probe buckets: per table, the exact bucket + 1-bit flips
    val probeCols = sigs(col("qv")).flatMap { case (t, s) =>
      val variants = s +: (0 until probeBits).map(b => s.bitwiseXOR(lit(1L << b)))
      variants.map(v => concat(lit(t), lit(":"), v))
    }
    val p0 = withNorm(probes, idCol, vecCol)
      .select(col("id").as("qid"), col("v").as("qv"), col("norm").as("qnorm"))
      .withColumn("bucket", explode(array(probeCols: _*)))

    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("id"))
    c.join(broadcast(p0), "bucket")
      .where(col("id") =!= col("qid"))
      .select("qid", "id", "v", "norm", "qv", "qnorm").distinct()
      .withColumn("cos", cosineCol)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("id"), col("cos"), col("rank"))
  }

  /** Per-probe recall of the LSH path against the exact brute-force top-k —
    * the self-check that keeps a silent recall collapse visible (r1 lesson:
    * a rows-only LSH query "passed" while returning 2/15 rows).
    */
  def lshRecall(corpus: DataFrame, probes: DataFrame, idCol: String,
                vecCol: String, k: Int, planes: Int = 8, tables: Int = 4,
                probeBits: Int = 2, seed: Long = 42L): DataFrame = {
    val exact = bruteForceTopK(corpus, probes, idCol, vecCol, k)
      .select(col("qid"), col("id"))
    val approx = lshTopK(corpus, probes, idCol, vecCol, k, planes, tables, probeBits, seed)
      .select(col("qid"), col("id"), lit(1L).as("hit"))
    exact.join(approx, Seq("qid", "id"), "left")
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .withColumn("recall", col("n_hit").cast("double") / col("n_exact"))
  }
}
