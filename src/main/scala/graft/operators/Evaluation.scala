package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Evaluation — pairwise P/R/F1 and B³ (reference Benchmarker.scala:39-135,
  * G8/G9 in SURVEY.md §2.6). The BASELINE.json acceptance gate is pairwise
  * F1 ≥ 0.99 on labeled pairs at shared blocking keys.
  */
object Evaluation {

  final case class PairwiseScores(precision: Double, recall: Double, f1: Double)

  /** `capped` (ADVICE r4): true iff some cluster exceeded `b3`'s
    * maxClusterSize and the scores are therefore sampled ESTIMATES, not
    * exact — the programmatic twin of the SLF4J warning, so callers that
    * need exactness can branch to `b3Exact` instead of parsing logs.
    * `b3Capped` leaves it false: its callers receive the capped-cluster
    * metrics frame itself (empty ⇔ exact) and pay no extra action for a
    * redundant flag.
    */
  final case class B3Scores(precision: Double, recall: Double, f1: Double,
                            capped: Boolean = false)

  /** Pairwise P/R/F1 restricted to candidate pairs (the "at shared blocking
    * keys" clause): `pairs` = (leftId, rightId), `sys` = (mentionId,
    * clusterId), `gold` = (id, gold).
    */
  def pairwiseF1(pairs: DataFrame, sys: DataFrame, gold: DataFrame): PairwiseScores = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val s = sys.select($"mentionId".as("id"), $"clusterId")
    val g = gold.select($"id", $"gold")
    val labeled = pairs
      .join(s.select($"id".as("leftId"), $"clusterId".as("lSys")), "leftId")
      .join(s.select($"id".as("rightId"), $"clusterId".as("rSys")), "rightId")
      .join(g.select($"id".as("leftId"), $"gold".as("lGold")), "leftId")
      .join(g.select($"id".as("rightId"), $"gold".as("rGold")), "rightId")
      .select(
        ($"lSys" === $"rSys").as("sysSame"),
        ($"lGold" === $"rGold").as("goldSame"))
    // coalesce: sum over an EMPTY pair set is NULL, and an empty evaluation
    // input must yield defined scores, not a driver NPE. An EMPTY labeled
    // pair set scores (0,0,0) — consistent with b3 on empty input (a gate
    // keyed on F1 must flag an empty day, not report vacuous perfection);
    // the tp+fp==0 ⇒ p=1 convention applies only to NON-empty pair sets
    // where no pair was predicted/gold positive
    val agg = labeled.agg(
      coalesce(sum(when($"sysSame" && $"goldSame", 1L).otherwise(0L)), lit(0L)).as("tp"),
      coalesce(sum(when($"sysSame" && !$"goldSame", 1L).otherwise(0L)), lit(0L)).as("fp"),
      coalesce(sum(when(!$"sysSame" && $"goldSame", 1L).otherwise(0L)), lit(0L)).as("fn"),
      count(lit(1)).as("n")).head()
    if (agg.getLong(3) == 0L) return PairwiseScores(0.0, 0.0, 0.0)
    val tp = agg.getLong(0).toDouble
    val fp = agg.getLong(1).toDouble
    val fn = agg.getLong(2).toDouble
    val p = if (tp + fp == 0) 1.0 else tp / (tp + fp)
    val r = if (tp + fn == 0) 1.0 else tp / (tp + fn)
    val f1 = if (p + r == 0) 0.0 else 2 * p * r / (p + r)
    PairwiseScores(p, r, f1)
  }

  /** B³ precision/recall/F1 with the reference's `b3Correct` link-type
    * clause (Benchmarker.scala:39-77): a co-member pair counts as correct
    * iff same system set ∧ same gold set ∧ the SCORED mention's link types
    * agree — when both its system and gold links are KB links (`E*`), the
    * exact KB id must match; otherwise KB-vs-NIL must agree. The clause
    * depends only on the scored mention (reference compares sysE1 vs
    * goldE1), so it factors out as a per-mention 0/1 gate on its B³ term.
    * Expressed as two self-joins + hash aggregations — no per-cluster
    * collect.
    */
  /** Default-safe B³ (VERDICT r3 #2): the bare name users call is CAPPED at
    * `maxClusterSize` = 100k co-members per cluster — one million-member NIL
    * blob would otherwise put 10¹² rows through the co-member self-joins.
    * Clusters above the cap contribute through a deterministic ~cap-sized
    * co-member sample (see `b3Capped`); every capped cluster is logged
    * loudly, never silent. Callers that need exactness on small data use
    * `b3Exact`; callers that want the capped-cluster metrics frame use
    * `b3Capped` directly.
    */
  def b3(sys: DataFrame, gold: DataFrame, maxClusterSize: Int = 100000): B3Scores = {
    val (scores, metrics) = b3Capped(sys, gold, maxClusterSize)
    val capped = metrics.limit(20).collect()
    if (capped.nonEmpty) {
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"b3: ${capped.length}${if (capped.length == 20) "+" else ""} cluster(s) above " +
          s"maxClusterSize=$maxClusterSize scored via deterministic co-member sampling " +
          s"(e.g. ${capped.take(3).map(r => s"${r.getAs[String]("side")}:${r.get(0)}=${r.get(1)}").mkString(", ")}); " +
          "use b3Capped for the full metrics frame or b3Exact for exact scores.")
    }
    scores.copy(capped = capped.nonEmpty)
  }

  /** Exact B³ — no co-member sampling. Quadratic in the largest cluster:
    * only for data where the biggest cluster is known-small.
    */
  def b3Exact(sys: DataFrame, gold: DataFrame): B3Scores =
    b3Capped(sys, gold, Int.MaxValue)._1

  /** B³ with a per-cluster expansion bound (VERDICT r2 scale-killer #3): the
    * co-member self-joins go quadratic in the largest cluster — one
    * million-member NIL blob is 10¹² join rows. Clusters above
    * `maxClusterSize` have their CO-MEMBER side thinned to a deterministic
    * ~maxClusterSize-member sample (keep iff xxhash64(id) mod ⌈size/cap⌉ =
    * 0), making each mention's B³ term a sampled estimate over the giant
    * cluster instead of an exact sum; every mention still contributes a
    * term. Never silent: the second return is a metrics frame (side,
    * cluster, size) listing every capped cluster — empty means the scores
    * are exact.
    */
  def b3Capped(sys: DataFrame, gold: DataFrame,
               maxClusterSize: Int): (B3Scores, DataFrame) = {
    // a mention of an over-cap cluster contributes through its SAMPLED
    // co-members; with an expected sample of ~maxClusterSize members the
    // probability of an empty sample (mention silently dropped from the
    // macro-average) is ~e^-maxClusterSize — demand a cap where that is
    // negligible (e^-16 ≈ 1e-7) rather than bias the average quietly
    require(maxClusterSize >= 16,
      s"maxClusterSize must be >= 16 (got $maxClusterSize): smaller caps risk empty co-member samples")
    val spark = sys.sparkSession
    import spark.implicits._
    val m = sys.select($"mentionId".as("id"), $"clusterId")
      .join(gold.select($"id", $"gold"), "id")

    // b3Correct link-type clause for the scored mention (left side)
    val sysKb = $"lc".startsWith("E")
    val goldKb = $"lg".startsWith("E")
    val linkOk = when(sysKb && goldKb, $"lc" === $"lg").otherwise(sysKb === goldKb)

    val l = m.select($"id".as("lid"), $"clusterId".as("lc"), $"gold".as("lg"))
    val r = m.select($"id".as("rid"), $"clusterId".as("rc"), $"gold".as("rg"))

    // deterministic co-member thinning for clusters above the cap
    def thin(key: Column): (DataFrame, DataFrame) = {
      if (maxClusterSize == Int.MaxValue) (r, spark.emptyDataset[(String, Long)].toDF("cluster", "size"))
      else {
        val sizes = r.groupBy(key.as("ck")).agg(count(lit(1)).as("sz"))
        val kept = r.join(sizes, key === $"ck")
          .where($"sz" <= maxClusterSize ||
            pmod(xxhash64($"rid"),
              ceil($"sz".cast("double") / maxClusterSize).cast("long")) === 0L)
          .drop("ck", "sz")
        (kept, sizes.where($"sz" > maxClusterSize)
          .select($"ck".as("cluster"), $"sz".as("size")))
      }
    }
    val (rSys, overSys) = thin($"rc")
    val (rGold, overGold) = thin($"rg")

    // precision: pairs sharing a system cluster (incl. self-pairs).
    // coalesce: avg over an EMPTY mention set is NULL — empty input scores 0
    val prec = l.join(rSys, $"lc" === $"rc")
      .groupBy($"lid")
      .agg(avg(when(($"lg" === $"rg") && linkOk, 1.0).otherwise(0.0)).as("p"))
      .agg(coalesce(avg($"p"), lit(0.0))).head().getDouble(0)
    // recall: pairs sharing a gold cluster
    val rec = l.join(rGold, $"lg" === $"rg")
      .groupBy($"lid")
      .agg(avg(when(($"lc" === $"rc") && linkOk, 1.0).otherwise(0.0)).as("r"))
      .agg(coalesce(avg($"r"), lit(0.0))).head().getDouble(0)
    val f1 = if (prec + rec == 0) 0.0 else 2 * prec * rec / (prec + rec)
    val metrics = overSys.withColumn("side", lit("sys"))
      .unionByName(overGold.withColumn("side", lit("gold")))
    (B3Scores(prec, rec, f1), metrics)
  }
}
