package graft.operators

import graft.functions.HyperplaneSigExpr
import graft.plans.Lineage
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

  /** Zero-norm / NaN guard (review r5, both passes): a zero vector has no
    * direction and its cos would be 0/0 = NaN — which Spark ORDERS ABOVE
    * every real number, so an unguarded NaN row would steal rank 1 of
    * every probe's top-k. The norm conjuncts alone do NOT close the hole:
    * a NaN COMPONENT makes the norm itself NaN and NaN > 0 is true under
    * the same ordering, so the result is additionally routed through
    * nanvl. Either way the row scores −1.0 (the cosine floor) and ranks
    * below every genuine neighbor.
    */
  private def cosineCol: Column =
    nanvl(
      when(col("norm") > 0 && col("qnorm") > 0,
        aggregate(zip_with(col("v"), col("qv"), (a, b) => a * b), lit(0.0), (a, x) => a + x) /
          (col("norm") * col("qnorm")))
        .otherwise(lit(-1.0)),
      lit(-1.0))

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

  /** IVF (inverted-file) ANN top-k: k-means-lite coarse quantizer + inverted
    * lists. Centroids are initialized from a deterministic hash-ordered
    * sample, refined with `iters` Lloyd steps where the ASSIGN step is a
    * scan-parallel argmin against the broadcast centroid array and the
    * UPDATE step is one per-(centroid, dimension) hash aggregation; the
    * centroid table itself (nlist × dim doubles) is the only thing that
    * ever reaches the driver — the corpus never does. Probes search the
    * `nprobe` nearest centroids' lists and re-rank exactly.
    *
    * Scale shape: assignment is one map-side pass per Lloyd iteration plus
    * one narrow (cid, pos, sum, n) aggregation; the query join touches
    * ~nprobe/nlist of the corpus per probe, shuffle-free on the corpus side
    * (probe side broadcast). Recall degrades gracefully with nprobe like
    * any IVF index; measure with `ivfRecall`.
    */
  def ivfTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
              vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
              iters: Int = 3, seed: Long = 42L): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val quantScale = (1L << 24).toDouble
    val c = withNorm(corpus, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // deterministic init: hash-ordered sample (stable across partitionings)
    var centroids: Array[Array[Double]] = c
      .select(col("v"), xxhash64(col("id"), lit(seed)).as("hk"))
      .orderBy(col("hk")).limit(nlist)
      .select(col("v")).as[Seq[Double]].collect().map(_.toArray)

    // degenerate-input invariant (self-review r4): an empty corpus must
    // return empty, not NoSuchElementException at centroids.head — the
    // brute-force path on an empty corpus yields exactly the right empty
    // frame with the right schema
    if (centroids.isEmpty) {
      c.unpersist()
      return bruteForceTopK(corpus, probes, idCol, vecCol, k)
    }

    // ONE nested-array literal for the whole centroid table: per-centroid
    // `array(lit, lit, …)` expansion puts nlist×dim literal NODES in the
    // expression tree and whole-stage codegen spends seconds compiling each
    // Lloyd iteration's new plan (measured 30+s for 16×64); a single
    // typedlit keeps the tree O(1) regardless of nlist/dim
    def centroidDists(v: Column): Column = {
      val ctLit = typedlit(centroids.map(_.toSeq).toSeq)
      transform(ctLit, ct =>
        aggregate(zip_with(v, ct, (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x))
    }

    // argmin over the centroid table: the codegen NearestCentroid kernel
    // (r7, guide §1.2) — bit-identical to the former
    // `array_position(d, array_min(d)) - 1` over the interpreted
    // higher-order distance chain (tie-breaks, NaN and dim-mismatch
    // semantics pinned in the expression's scaladoc + FunctionsSpec), with
    // zero per-row allocation instead of a lambda frame per element. Runs
    // once per row per Lloyd iteration plus once for the final assignment —
    // the query's hot loop.
    def nearestCid(v: Column): Column =
      graft.functions.VecFunctions.nearest_centroid(v, centroids.map(_.clone()))

    var it = 0
    while (it < iters) {
      // UPDATE: per-(cid, dimension) mean via posexplode + hash agg; only
      // nlist × dim rows come back to rebuild the broadcast table.
      // The cid assignment lives in its OWN projection below the generator:
      // an expensive expression in the same select as posexplode gets
      // re-evaluated once per GENERATED row (dim× per vector — measured
      // 12-15s vs 0.6s on 2000×64 vectors).
      // Contributions are quantized to fixed-point longs (2^-24 step,
      // ~6e-8 relative on unit-scale embeddings) so the distributed sum is
      // INTEGER-exact: a double sum's last ulp depends on partition merge
      // order, which would make centroids — and therefore the whole index —
      // nondeterministic across runs. Headroom: |x| ≤ 512 quantizes below
      // 2^33, so 2^30 contributions per (cid, dim) stay within a long.
      // `bad` makes poisoned input VISIBLE: the old double sum propagated a
      // NaN component into the centroid (obvious breakage); a fixed-point
      // cast would instead silently map NaN to 0 and saturate beyond the
      // headroom — count such contributions in the same pass and fail loudly
      val sums = c.withColumn("cid", nearestCid(col("v")))
        .select(col("cid"), posexplode(col("v")))
        .groupBy(col("cid"), col("pos"))
        .agg(sum(round(col("col") * quantScale).cast("long")).as("s"),
          count(lit(1)).as("n"),
          sum(when(isnan(col("col")) || abs(col("col")) > 512.0, 1L)
            .otherwise(0L)).as("bad"))
        .collect()
      val poisoned = sums.map(_.getLong(4)).sum
      require(poisoned == 0L,
        s"$poisoned NaN/out-of-range (|x|>512) embedding components reached the IVF centroid update")
      // enforce (not just assert in a comment) the fixed-point headroom: |x|
      // ≤ 512 quantizes below 2^33, so up to 2^30 contributions per (cid,
      // dim) fit a long — beyond that the non-ANSI sum would WRAP silently
      // and produce wrong centroids (ADVICE r3). Same fail-loudly contract
      // as the poisoning check; n is already in this pass
      // strict: exactly 2^30 contributions at the permitted |x| = 512.0
      // boundary (quantized 2^33) would sum to exactly ±2^63 and wrap
      val maxN = if (sums.isEmpty) 0L else sums.map(_.getLong(3)).max
      require(maxN < (1L << 30),
        s"IVF centroid update overflow risk: $maxN contributions on one (cid, dim) " +
          "exceed the 2^30 fixed-point headroom — raise nlist or shard the corpus")
      val dim = centroids.head.length
      val next = centroids.map(_.clone())
      sums.foreach { r =>
        val cid = r.getInt(0); val pos = r.getInt(1)
        next(cid)(pos) = (r.getLong(2).toDouble / quantScale) / r.getLong(3)
      }
      require(next.forall(_.length == dim))
      centroids = next
      it += 1
    }

    val assigned = c.withColumn("cid", nearestCid(col("v")))

    // probe side: nprobe nearest centroids per probe — rank the distance
    // array with its index via two aligned arrays, sort (dist, cid) pairs
    // as 2-element arrays (lexicographic), explode the first nprobe cids
    val probeScored = withNorm(probes, idCol, vecCol)
      .select(col("id").as("qid"), col("v").as("qv"), col("norm").as("qnorm"))
    val probeCids = probeScored
      .withColumn("byDist", array_sort(
        zip_with(centroidDists(col("qv")),
          array(centroids.indices.map(i => lit(i.toDouble)): _*),
          (d, i) => array(d, i))))
      .withColumn("cid", explode(transform(
        slice(col("byDist"), 1, nprobe), x => element_at(x, 2).cast("int"))))
      .select(col("qid"), col("qv"), col("qnorm"), col("cid"))

    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("id"))
    val out = Lineage.cut(assigned.join(broadcast(probeCids), "cid")
      .where(col("id") =!= col("qid"))
      .withColumn("cos", cosineCol)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("id"), col("cos"), col("rank")))
    c.unpersist() // materialized (top-k rows: tiny) by the cut
    out
  }

  /** Per-probe recall of the IVF path against exact brute force. */
  def ivfRecall(corpus: DataFrame, probes: DataFrame, idCol: String,
                vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
                iters: Int = 3, seed: Long = 42L): DataFrame = {
    val exact = bruteForceTopK(corpus, probes, idCol, vecCol, k)
      .select(col("qid"), col("id"))
    val approx = ivfTopK(corpus, probes, idCol, vecCol, k, nlist, nprobe, iters, seed)
      .select(col("qid"), col("id"), lit(1L).as("hit"))
    exact.join(approx, Seq("qid", "id"), "left")
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .withColumn("recall", col("n_hit").cast("double") / col("n_exact"))
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
