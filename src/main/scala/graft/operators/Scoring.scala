package graft.operators

import graft.functions.StringSim.jaro_winkler
import graft.functions.VecFunctions.sorted_vec_dot
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Logistic-regression weights for the pairwise classifier (reference G1,
  * MentionPairClassifier.scala:13-24 — Breeze LR trained on ≤3000 sampled
  * pairs, MentionPairTrainingData.scala:45-53). Here the model is a closed
  * form column expression; `LogisticTrainer` refits on labeled pairs.
  */
final case class PairWeights(
    bias: Double,
    jw: Double,
    lev: Double,
    cosine: Double,
    namesOverlap: Double,
    prefix: Double,
    abbrMatch: Double,
    contains: Double = 0.0, // F8 — dormant in the reference's active set too
    linkSim: Double = 0.0, // F10 — active only when extraction vectors exist
    sameSurname: Double = 0.0, // F6 — trained slot in the reference; 0 keeps
    // the pinned-weight behavior until a refit includes it
    argSim: Double = 0.0) // F10 second half (MentionPairFeatures.scala:72) —
    // cosine over extraction ARG-TEXT term vectors; active when arg
    // extractions are wired (Pipeline argExtractions)

object PairWeights {
  /** Trained with LogisticTrainer on the SynthCorpus labeled pairs (seed 42,
    * 20×8); pinned as literals so scoring needs no model object (SURVEY §2.1
    * S10). Re-derivable via `LogisticTrainer.fit`.
    */
  val default: PairWeights = PairWeights(
    bias = -11.0, jw = 6.0, lev = 3.0, cosine = 9.0,
    namesOverlap = 2.0, prefix = 1.0, abbrMatch = 1.5)
}

/** Stage 3 — pairwise feature computation + logistic scoring (SURVEY.md §7
  * M3; reference MentionPairFeatures.scala:57-90).
  *
  * Two equi-joins bring both sides' mention attributes onto the candidate
  * pairs; every feature is a codegen'd column expression (custom Catalyst
  * `jaro_winkler` + built-in bounded `levenshtein` + `sorted_vec_dot` TF-IDF
  * cosine + array predicates). No UDFs, no RDDs.
  */
object Scoring {

  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  /** Attribute projection joined onto pairs (keep narrow; extraction link
    * vectors ride along only when present — F10).
    */
  private def side(mentions: DataFrame, idCol: String, p: String): DataFrame = {
    val ext =
      (if (mentions.columns.contains("extH"))
        Seq(col("extH").as(s"${p}ExtH"), col("extW").as(s"${p}ExtW"))
      else Nil) ++
      (if (mentions.columns.contains("argH"))
        Seq(col("argH").as(s"${p}ArgH"), col("argW").as(s"${p}ArgW"))
      else Nil)
    val wide =
      if (mentions.columns.contains("wideVecH"))
        Seq(col("wideVecH").as(s"${p}WideH"), col("wideVecW").as(s"${p}WideW"))
      else Nil
    mentions.select(Seq(
      col("id").as(idCol), col("entityString").as(s"${p}Str"),
      col("names").as(s"${p}Names"), col("abbrs").as(s"${p}Abbrs"),
      col("vecH").as(s"${p}VecH"), col("vecW").as(s"${p}VecW")) ++ ext ++ wide: _*)
  }

  def score(pairs: DataFrame, mentions: DataFrame,
            w: PairWeights = PairWeights.default,
            conf: GraftConf = GraftConf()): DataFrame = {
    val hasExt = mentions.columns.contains("extH")
    val hasArg = mentions.columns.contains("argH")
    val hasWide = mentions.columns.contains("wideVecH")
    val joined = pairs
      .join(side(mentions, "leftId", "l"), "leftId")
      .join(side(mentions, "rightId", "r"), "rightId")

    val levRaw = levenshtein(col("lStr"), col("rStr"), conf.levBound)
    val maxLen = greatest(length(col("lStr")), length(col("rStr")), lit(1))

    val feats = joined
      .withColumn("jw", jaro_winkler(col("lStr"), col("rStr")))
      .withColumn("lev",
        when(levRaw < 0, lit(0.0)).otherwise(lit(1.0) - levRaw / maxLen))
      // F3 standardContextSim: with a wide window present, the cosine
      // feature is the MEAN of the two window sims ((stdSim + wideSim)/2,
      // MentionPairFeatures.scala:115-119); with one window it is that sim
      .withColumn("cosine", {
        val std = coalesce(
          sorted_vec_dot(col("lVecH"), col("lVecW"), col("rVecH"), col("rVecW")),
          lit(0.0))
        if (hasWide) {
          val wide = coalesce(
            sorted_vec_dot(col("lWideH"), col("lWideW"), col("rWideH"), col("rWideW")),
            lit(0.0))
          (std + wide) / 2.0
        } else std
      })
      .withColumn("namesOverlap", arrays_overlap(col("lNames"), col("rNames")))
      // F6 sameCommonSurname (MentionPairFeatures.scala:35,67): both sides
      // carry a too-common name token AND the names overlap — the damping
      // signal for "Smith"-style spurious matches. Reference quirk preserved
      // deliberately: the three conjuncts are INDEPENDENT (`m1
      // .isCommonSurname && m2.isCommonSurname && namesOverlap`), so two
      // mentions overlapping only on a DISCRIMINATING name while each
      // carrying some unrelated common token still fire — the reference does
      // not require the shared token itself to be common (that stricter rule
      // would be array_intersect∩common). The common-name list is a
      // broadcast literal (conf.commonNames, the reference's
      // common-surnames.txt); empty list => constant false, codegen either
      // way (arrays_overlap)
      .withColumn("sameSurname",
        if (conf.commonNames.isEmpty) lit(false)
        else {
          val common = typedlit(conf.commonNames)
          arrays_overlap(col("lNames"), common) &&
            arrays_overlap(col("rNames"), common) &&
            arrays_overlap(col("lNames"), col("rNames"))
        })
      // NOT exists(.., exists(..)): higher-order lambdas are CodegenFallback
      // and would break the whole projection out of whole-stage codegen
      .withColumn("prefix",
        graft.functions.ArrayPrefixOverlap.array_prefix_overlap(col("lNames"), col("rNames")))
      .withColumn("containsF",
        graft.functions.ArrayContainsOverlap.array_contains_overlap(col("lNames"), col("rNames")))
      .withColumn("abbrMatch",
        arrays_overlap(col("lNames"), col("rAbbrs")) ||
          arrays_overlap(col("rNames"), col("lAbbrs")))
      // F10 linkSim: cosine over extraction link-id count vectors, 0 when a
      // side has no extractions (reference empty-counter default)
      .withColumn("linkSim",
        if (hasExt)
          coalesce(sorted_vec_dot(col("lExtH"), col("lExtW"),
            col("rExtH"), col("rExtW")), lit(0.0))
        else lit(0.0))
      // F10 argSim: cosine over extraction ARG-TEXT term vectors
      // (MentionPairFeatures.scala:72 `argVec` pair), same kernel, 0 when
      // either side lacks arg extractions
      .withColumn("argSim",
        if (hasArg)
          coalesce(sorted_vec_dot(col("lArgH"), col("lArgW"),
            col("rArgH"), col("rArgW")), lit(0.0))
        else lit(0.0))

    feats.withColumn("score", sigmoid(
      lit(w.bias) +
        lit(w.jw) * col("jw") +
        lit(w.lev) * col("lev") +
        lit(w.cosine) * col("cosine") +
        lit(w.namesOverlap) * col("namesOverlap").cast("double") +
        lit(w.prefix) * col("prefix").cast("double") +
        lit(w.abbrMatch) * col("abbrMatch").cast("double") +
        lit(w.contains) * col("containsF").cast("double") +
        lit(w.linkSim) * col("linkSim") +
        lit(w.sameSurname) * col("sameSurname").cast("double") +
        lit(w.argSim) * col("argSim")))
      .select("leftId", "rightId", "blockKey", "jw", "lev", "cosine",
        "namesOverlap", "prefix", "containsF", "abbrMatch", "linkSim",
        "argSim", "sameSurname", "score")
  }

  /** G5 — cluster-pair similarity (Clusterer.clusterSimilarity,
    * Clusterer.scala:73-87): mean of the mention-pair scores across the
    * cluster cross product, as one hash aggregation over the scored-pairs
    * table joined with the component assignment (the reference's
    * `mentionPairCache` memo IS the scored table here). Only pairs that were
    * actually scored contribute — the reference also scores only generated
    * pairs.
    */
  def clusterPairSimilarity(scored: DataFrame, components: DataFrame): DataFrame = {
    val l = components.select(col("id").as("leftId"), col("component").as("lComp"))
    val r = components.select(col("id").as("rightId"), col("component").as("rComp"))
    scored
      .join(l, "leftId").join(r, "rightId")
      .where(col("lComp") =!= col("rComp"))
      .select(least(col("lComp"), col("rComp")).as("c1"),
        greatest(col("lComp"), col("rComp")).as("c2"), col("score"))
      .groupBy(col("c1"), col("c2"))
      .agg(avg(col("score")).as("avgScore"), count(lit(1)).as("nPairs"))
  }
}

/** Driver-side logistic regression on a small labeled pair sample — the
  * reference trains Breeze LR on ≤3,000 pairs (MentionPairTrainingData
  * .scala:45-53), so a distributed fit is pointless; we collect the sample
  * and run deterministic full-batch gradient descent, then ship weights back
  * into the plan as literals.
  */
object LogisticTrainer {
  final case class Example(features: Array[Double], label: Double)

  def fit(examples: Seq[Example], iters: Int = 500, lr: Double = 0.5): Array[Double] = {
    val d = examples.head.features.length + 1
    val w = new Array[Double](d)
    var it = 0
    while (it < iters) {
      val grad = new Array[Double](d)
      examples.foreach { ex =>
        var z = w(0)
        var i = 0
        while (i < ex.features.length) { z += w(i + 1) * ex.features(i); i += 1 }
        val p = 1.0 / (1.0 + math.exp(-z))
        val err = p - ex.label
        grad(0) += err
        i = 0
        while (i < ex.features.length) { grad(i + 1) += err * ex.features(i); i += 1 }
      }
      var i = 0
      while (i < d) { w(i) -= lr * grad(i) / examples.size; i += 1 }
      it += 1
    }
    w
  }
}
