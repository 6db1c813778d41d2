package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P6 — the sports-sense gate, full pipeline shape
  * (SportsSenseLabeller.scala:13-50, SportsSenseTrainingData.scala,
  * SportsSenseFeatures.scala): decides whether a location-shaped name is
  * being used in its SPORTS-TEAM sense ("Seattle beat Portland 3-1"), which
  * drives the C4 type reroute.
  *
  * Reference structure, re-expressed:
  *  1. candidacy (`isCandidateForSportsClassifier`): the name must be in the
  *     location gazetteer (cities ∪ states ∪ countries — here a broadcast
  *     set literal) and the NER type must not be PERSON; non-candidates get
  *     NULL (the reference's `None`).
  *  2. a Naive-Bayes context score (`getNBModel` over context token
  *     counters): re-expressed as Σ_tokens log[P(t|true)/P(t|false)] + log
  *     prior ratio, with the per-word log-ratios as one broadcast map
  *     literal — G2's scoring shape as a row-local column expression.
  *  3. a logistic layer over the feature set (NER one-hots, the NB score,
  *     numNumbers, the score-pattern count, context length — the
  *     SportsSenseFeatures members computable from the mention frame;
  *     the gazetteer-cross-statistics features stay dormant like most of
  *     F12) at the reference's threshold 0.15.
  *
  * `train` fits the logistic layer driver-side on ≤ `sampleCap` labeled
  * rows via [[LogisticTrainer]] — the same altitude as the reference's
  * pretrained `sportsClassifier2012.model` (G1: tiny training sets never
  * justify a distributed optimizer).
  */
object SportsSense {

  /** Trained gate: logistic weights over `features`, plus the NB word
    * log-ratio map and its prior. Threshold is the reference's 0.15.
    */
  final case class Model(weights: Array[Double], nbLogRatio: Map[String, Double],
                         nbPrior: Double, threshold: Double = 0.15)

  /** Candidacy (SportsSenseLabeller.scala:38-49). `gazetteer`: broadcast set
    * of lowercased location names (typedlit).
    */
  def isCandidate(name: Column, nerType: Column, gazetteer: Column): Column =
    array_contains(gazetteer, lower(name)) && nerType =!= "PERSON"

  /** NB context score as one row-local fold over the token array. */
  def nbScore(tokens: Column, logRatio: Map[String, Double], prior: Double): Column = {
    val m = typedlit(logRatio)
    aggregate(tokens, lit(prior),
      (a, t) => a + coalesce(try_element_at(m, lower(t)), lit(0.0)))
  }

  /** The feature columns, in training order. `content` is the raw context
    * text (for the digit-digit score pattern), `tokens` its token array.
    */
  def features(nerType: Column, tokens: Column, content: Column,
               nb: Column): Seq[Column] = Seq(
    when(nerType === "ORGANIZATION", 1.0).otherwise(0.0),
    when(nerType === "PERSON", 1.0).otherwise(0.0),
    when(nerType === "LOCATION", 1.0).otherwise(0.0),
    when(nerType === "ORGANIZATION" || nerType === "PERSON" ||
      nerType === "LOCATION", 0.0).otherwise(1.0),
    nb,
    size(filter(tokens, t => t.rlike("^[0-9]+$"))).cast("double"),
    regexp_count(content, lit("\\d+\\s*[-:]\\s*\\d+")).cast("double"),
    size(tokens).cast("double"))

  private def featureFrame(mentions: DataFrame, m: Model): DataFrame = {
    val nb = nbScore(col("tokens"), m.nbLogRatio, m.nbPrior)
    val fs = features(col("nerType"), col("tokens"), col("content"), nb)
    mentions.withColumns(
      fs.zipWithIndex.map { case (c, i) => s"_f$i" -> c }.toMap)
  }

  /** Fit the logistic layer on labeled mentions (id, name, nerType, tokens,
    * content, label: boolean). The NB word model is estimated first from
    * per-class Laplace-smoothed token frequencies (getNBModel), distributed
    * as one aggregation; only the ≤ `sampleCap` LR sample and the word map
    * reach the driver.
    */
  def train(labeled: DataFrame, sampleCap: Int = 3000,
            vocabCap: Int = 50000): Model = {
    import labeled.sparkSession.implicits._
    // per-word per-class counts -> log ratio map (Laplace +1). The word map
    // is BOUNDED at `vocabCap` (keep the most frequent tokens, deterministic
    // (count, token) order) — only the capped map reaches the driver and the
    // broadcast literal, never the raw web-scale vocabulary; class totals
    // still come from the FULL counts so the kept words' probabilities are
    // unchanged (standard NB frequency-based feature selection)
    val counts = labeled
      .select($"label", explode($"tokens").as("t"))
      .groupBy(lower($"t").as("t"))
      .agg(sum(when($"label", 1L).otherwise(0L)).as("ct"),
        sum(when(!$"label", 1L).otherwise(0L)).as("cf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = counts.agg(sum($"ct"), sum($"cf"), count(lit(1))).head()
    val (nt, nf) = (totals.getLong(0).toDouble, totals.getLong(1).toDouble)
    val vocab = totals.getLong(2).toDouble
    val kept = counts
      .orderBy(($"ct" + $"cf").desc, $"t")
      .limit(vocabCap)
      .collect()
    counts.unpersist()
    val logRatio = kept.map { r =>
      r.getString(0) -> (math.log((r.getLong(1) + 1.0) / (nt + vocab)) -
        math.log((r.getLong(2) + 1.0) / (nf + vocab)))
    }.toMap
    val classTotals = labeled.agg(
      sum(when($"label", 1L).otherwise(0L)),
      sum(when(!$"label", 1L).otherwise(0L))).head()
    val prior = math.log((classTotals.getLong(0) + 1.0) / (classTotals.getLong(1) + 1.0))

    val pre = Model(Array.empty, logRatio, prior)
    val nFeats = features(lit(""), lit(Array.empty[String]), lit(""), lit(0.0)).size
    val rows = Reports.deterministicSample(featureFrame(labeled, pre), Seq("id"), sampleCap)
      .select((0 until nFeats).map(i => col(s"_f$i")) :+ $"label".cast("double").as("y"): _*)
      .collect()
    val ex = rows.map(r => LogisticTrainer.Example(
      Array.tabulate(nFeats)(i => r.getDouble(i)), r.getDouble(nFeats))).toSeq
    pre.copy(weights = LogisticTrainer.fit(ex))
  }

  /** Adds `sportsScore` (σ of the logistic layer) and `sportsSense`
    * (NULL = not a candidate, the reference's None; else score > threshold).
    * `gazetteer`: broadcast set literal of lowercased location names.
    */
  def label(mentions: DataFrame, m: Model, gazetteer: Column): DataFrame = {
    val nFeats = m.weights.length - 1
    val withF = featureFrame(mentions, m)
    val z = (0 until nFeats).foldLeft(lit(m.weights(0))) { (acc, i) =>
      acc + lit(m.weights(i + 1)) * col(s"_f$i")
    }
    withF
      .withColumn("sportsScore", lit(1.0) / (lit(1.0) + exp(-z)))
      .withColumn("sportsSense",
        when(isCandidate(col("name"), col("nerType"), gazetteer),
          col("sportsScore") > m.threshold).otherwise(lit(null).cast("boolean")))
      .drop((0 until nFeats).map(i => s"_f$i"): _*)
  }
}
