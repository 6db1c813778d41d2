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

  /** LSH-bucketed ANN top-k with multi-probe (flip each of the first
    * `probeBits` signature bits). Candidates = bucket matches; exact cosine
    * re-rank inside. Recall < 1 by construction; pair with the brute-force
    * baseline to measure it.
    */
  def lshTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
              vecCol: String, k: Int, planes: Int = 12,
              probeBits: Int = 4, seed: Long = 42L): DataFrame = {
    import corpus.sparkSession.implicits._
    val c = withNorm(corpus, idCol, vecCol)
      .withColumn("bucket", hyperplaneSig(col("v"), planes, seed))
    val p0 = withNorm(probes, idCol, vecCol)
      .select(col("id").as("qid"), col("v").as("qv"), col("norm").as("qnorm"),
        hyperplaneSig(col("v"), planes, seed).as("sig"))
    // multi-probe: original bucket + 1-bit flips of the first probeBits bits
    val flips = (0 until probeBits).map(b => col("sig").bitwiseXOR(lit(1L << b)))
    val probeBuckets = p0.withColumn("bucket",
      explode(array((col("sig") +: flips): _*)))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("id"))
    c.join(broadcast(probeBuckets), "bucket")
      .where(col("id") =!= col("qid"))
      .select("qid", "id", "v", "norm", "qv", "qnorm").distinct()
      .withColumn("cos", cosineCol)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("id"), col("cos"), col("rank"))
  }
}
