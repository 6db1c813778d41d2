package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Extraction-side features (reference S3 + F10 + G4): the reference joins a
  * per-document OpenIE extraction store onto mentions and scores pairs with
  * `linkSim` — cosine over per-doc extraction-argument link-id counts
  * (MentionPairFeatures.scala:34,71-72; counts `ExtrSolrHelper.getNodeIds`).
  * Here the store is a plain side table `(id, fbid)` — one row per
  * (document, extracted link id) — and the vectors live in the same sorted
  * (hash, weight) sparse format the TF-IDF vectors use, so the pair cosine
  * is the same codegen `sorted_vec_dot` kernel.
  */
object Extractions {

  /** G4 count-by-id + unit-normalize: (id, fbid) rows → (id, extH sorted
    * array<long>, extW aligned array<double>, unit L2). One map-side
    * combinable count aggregation + one per-id array build — the reference's
    * `groupBy(identity).map(size)` per doc, relationally.
    */
  def linkVectors(extractions: DataFrame): DataFrame = {
    import extractions.sparkSession.implicits._
    extractions
      .groupBy($"id", $"fbid").agg(count(lit(1)).as("n"))
      .select($"id", struct(xxhash64($"fbid").as("h"), $"n".cast("double").as("w")).as("hw"))
      .groupBy($"id")
      .agg(sort_array(collect_list($"hw")).as("hws"))
      .withColumn("norm", sqrt(aggregate($"hws", lit(0.0), (a, x) => a + x("w") * x("w"))))
      .select(
        $"id".as("extId"),
        transform($"hws", x => x("h")).as("extH"),
        transform($"hws", x => x("w") / $"norm").as("extW"))
  }

  /** argVec (the F10 pair of linkVec): term vectors over extraction ARG
    * TEXT per doc (MentionPairFeatures.scala:36 — `argVec` from
    * `getExtrArgs` texts). Tokenize the arg strings, then it is exactly the
    * count-by-id shape; the output plugs into the same `sorted_vec_dot`
    * kernel (argSim = dot of two argVectors rows).
    * Input: (id, argText); output: (extId, extH, extW).
    */
  def argVectors(extractions: DataFrame, argCol: String = "argText"): DataFrame =
    linkVectors(extractions.select(col("id"),
      explode(Mentions.contentTokens(col(argCol))).as("fbid")))

  /** Join extraction link vectors onto a mention frame (left: mentions
    * without extractions keep null vectors → linkSim coalesces to 0 at
    * scoring, mirroring the reference's empty-extraction default).
    */
  def withLinkVectors(mentions: DataFrame, extractions: DataFrame): DataFrame =
    mentions.join(linkVectors(extractions),
      mentions("id") === col("extId"), "left").drop("extId")

  /** Join extraction ARG-TEXT term vectors onto a mention frame as
    * (argH, argW) — the argSim side of F10, same left-join empty default.
    */
  def withArgVectors(mentions: DataFrame, argExtractions: DataFrame,
                     argCol: String = "argText"): DataFrame =
    mentions.join(
      argVectors(argExtractions, argCol)
        .select(col("extId"), col("extH").as("argH"), col("extW").as("argW")),
      mentions("id") === col("extId"), "left").drop("extId")
}
