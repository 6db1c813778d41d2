package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage 2 — blocking (SURVEY.md §7 M2; reference candidate generation B1-B4,
  * SURVEY.md §2.3).
  *
  * Explodes each mention's blocking keys to (key, id) rows, then applies the
  * skew guard: blocks larger than `maxBlockSize` are DROPPED from pair
  * generation but recorded in an overflow metrics frame (never silent —
  * SURVEY.md §7 "cap-per-key with overflow metrics"). Hot keys are the
  * Zipfian "Smith" problem (reference common-surnames.txt guard F6); an
  * oversized block means the key carries no discriminating power, exactly
  * like the reference's too-common-surname rule.
  */
object Blocking {

  final case class Result(blocks: DataFrame, overflow: DataFrame)

  def apply(mentionsWithKeys: DataFrame, conf: GraftConf): Result = {
    import mentionsWithKeys.sparkSession.implicits._
    val exploded = mentionsWithKeys
      .select($"id", explode($"blockKeys").as("key"))
      .where($"key".isNotNull)

    // block sizes: one map-side-combinable aggregation on the key
    val sizes = exploded.groupBy($"key").agg(count(lit(1)).as("blockSize"))
    val keyed = exploded.join(sizes, "key")

    Result(
      blocks = keyed.where($"blockSize" <= conf.maxBlockSize).select($"key", $"id"),
      overflow = sizes.where($"blockSize" > conf.maxBlockSize))
  }

  /** Candidate pairs: sort-merge self-join on blocking key with l.id < r.id
    * (north_rule "sort-merge join for pair generation"; reference all-pairs
    * generator B4, Clusterer.scala:89-93, pruned by blocking instead of the
    * O(n²) cross product). Pairs found under several keys are deduplicated
    * with one more hash aggregation keyed on the pair.
    */
  def candidatePairs(blocks: DataFrame): DataFrame = {
    import blocks.sparkSession.implicits._
    val l = blocks.select($"key", $"id".as("leftId"))
    val r = blocks.select($"key", $"id".as("rightId"))
    l.join(r, Seq("key"))
      .where($"leftId" < $"rightId")
      .groupBy($"leftId", $"rightId")
      .agg(min($"key").as("blockKey"))
  }
}
