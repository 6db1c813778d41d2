package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    val exploded = explodeKeys(mentionsWithKeys)
    fromSizes(exploded, blockSizes(exploded), conf)
  }

  /** (id, key) exploded blocking keys — the shared first step of apply().
    * Narrow (no shuffle); cheap to recompute per consumer.
    */
  def explodeKeys(mentionsWithKeys: DataFrame): DataFrame =
    mentionsWithKeys
      .select(col("id"), explode(col("blockKeys")).as("key"))
      .where(col("key").isNotNull)

  /** Block sizes: one map-side-combinable aggregation on the key. */
  def blockSizes(exploded: DataFrame): DataFrame =
    exploded.groupBy(col("key")).agg(count(lit(1)).as("blockSize"))

  /** Per-key block size PLUS the order-insensitive member-set signature
    * candidatePairs' duplicate-block collapse needs (count, min id, an
    * xxhash64 xor and an independently-seeded xxhash64 decimal SUM) — ONE
    * aggregation serving both the size cap and pair generation (r7, guide
    * §1.2/§2.4: `candidatePairs` previously re-grouped the very rows its
    * caller's `blockSizes` pass had just aggregated, paying a second full
    * exchange of the exploded frame). Callers that compute this can hand it
    * to `fromSizes` (the signature columns ride along harmlessly) and
    * `candidatePairsFromStats`.
    *
    * Why one stream is a SUM (review r7): these are public APIs and a
    * caller's frame may contain duplicate (key, id) rows — under xor a
    * duplicated id cancels pairwise in EVERY xor stream at once, so blocks
    * {a,b,b} and {a,c,c} would share (count, min, xors) with certainty and
    * wrongly collapse. The sum stream is duplicate-sensitive (2·h(b) =
    * 2·h(c) requires an xxhash64 collision), restoring a ~2⁻⁶⁴-per-pair
    * bound for duplicate-bearing inputs and ~2⁻¹²⁸ for distinct-id inputs
    * (both alongside the count+min conjuncts) — the band-key-hash
    * convention. decimal(38,0), not long: ANSI mode errors on long-sum
    * overflow, and the decimal cost applies to one stream only.
    */
  def blockStats(exploded: DataFrame): DataFrame =
    exploded.groupBy(col("key")).agg(
      count(lit(1)).as("blockSize"),
      min(col("id")).as("_mn"),
      bit_xor(xxhash64(col("id"))).as("_hx"),
      sum(xxhash64(lit(0x9E3779B9L), col("id")).cast("decimal(38,0)")).as("_hs"))

  /** Result from precomputed exploded keys + sizes — lets runCheckpointed
    * checkpoint the sizes aggregation ONCE and derive both the blocks and
    * overflow frames from the tiny table, instead of re-running the
    * explode+count per stage (review r5). `sizes` may be a `blockSizes` or
    * `blockStats` frame; the output schemas are identical either way.
    */
  def fromSizes(exploded: DataFrame, sizes: DataFrame, conf: GraftConf): Result =
    Result(
      blocks = exploded.join(sizes.select(col("key"), col("blockSize")), "key")
        .where(col("blockSize") <= conf.maxBlockSize)
        .select(col("key"), col("id"), col("blockSize")),
      overflow = sizes.where(col("blockSize") > conf.maxBlockSize)
        .select(col("key"), col("blockSize")))

  /** Candidate pairs: sort-merge self-join on blocking key with l.id < r.id
    * (north_rule "sort-merge join for pair generation"; reference all-pairs
    * generator B4, Clusterer.scala:89-93, pruned by blocking instead of the
    * O(n²) cross product). Pairs found under several keys are deduplicated
    * with one more hash aggregation keyed on the pair.
    *
    * Skew (north_star "salted name/alias blocking keys"): blocks larger than
    * `saltThreshold` are pair-generated via bucket-pair salting — each row
    * gets salt s = pmod(xxhash64(id), S); the left side of a pair covers
    * bucket pairs (s, s..S-1), the right side (0..s, s), and the join keys on
    * (key, i, j). One hot key's O(n²) pair generation then spreads over
    * S(S+1)/2 shuffle keys instead of landing in a single task. Every
    * unordered pair surfaces exactly once across bucket pairs (twice within
    * the diagonal i = j — removed by the final pair-dedup aggregation, which
    * already exists because a pair can be found under several keys).
    */
  def candidatePairs(blocks: DataFrame, conf: GraftConf = GraftConf()): DataFrame = {
    import blocks.sparkSession.implicits._
    // DUPLICATE-BLOCK COLLAPSE (r7, guide §2.3 — shuffle fewer bytes): two
    // blocking keys with the IDENTICAL member set generate the identical
    // pair set, so only one of them needs to reach pair generation. This is
    // the dominant redundancy of LSH banding on near/exact duplicates: an
    // exact-copy group collides in ALL `bands` bands (16 here), so every
    // pair was generated 16× and merged by the final dedup aggregation —
    // 16× the join fan-out and 16× the rows into the pair-dedup exchange
    // for zero extra pairs (q_skew_dedup measured exactly this shape).
    //
    // One aggregation computes, per key, the block size plus an
    // order-insensitive member-set signature (see blockStats: count, min
    // id, an xxhash64 xor and an independently-seeded duplicate-sensitive
    // decimal sum; collision odds documented there). Per signature group
    // the MIN key survives, so `min(key)` over a pair's representative
    // keys equals the min over ALL its keys — the emitted blockKey is
    // unchanged (the global min key is always its own group's
    // representative).
    //
    // A caller-provided blockSize column is superseded: every caller passes
    // complete blocks for the keys it keeps, so the recomputed count equals
    // the provided value and one aggregation yields size + signature
    // together (no second pass, no trust in the column).
    // Singleton blocks are dropped before the pair join (blockSize >= 2):
    // they generate zero pairs, yet the previous shape carried every one of
    // them through the self-join — on LSH-banded dedup corpora singletons
    // are the overwhelming majority of keys. This also keeps the signature
    // grouping tiny (multi-member keys only).
    val base = blocks.select($"key", $"id")
    pairsWithStats(base, blockStats(base), conf, maxBlockSize = None)
  }

  /** Pair generation over a PRECOMPUTED `blockStats` frame (r7, guide §2.4 —
    * two operations keyed the same way share one aggregation): callers that
    * already aggregated per-key stats for the size cap (Pipeline, ngram
    * dedup) hand them in here instead of letting `candidatePairs` re-group
    * the exploded frame. `maxBlockSize` applies the caller's cap INSIDE the
    * tiny reps frame — the capped keys then never reach the pair join at
    * all, replacing the former exploded⋈sizes pre-filter join (per-key
    * stats are independent of other keys, and a signature group shares one
    * blockSize, so filtering before or after the collapse is equivalent).
    */
  def candidatePairsFromStats(exploded: DataFrame, stats: DataFrame,
                              conf: GraftConf,
                              maxBlockSize: Option[Int]): DataFrame = {
    val base = exploded.select(col("key"), col("id"))
    pairsWithStats(base, stats, conf, maxBlockSize)
  }

  private def pairsWithStats(base: DataFrame, stats: DataFrame,
                             conf: GraftConf,
                             maxBlockSize: Option[Int]): DataFrame = {
    import base.sparkSession.implicits._
    val kept = maxBlockSize.fold(stats)(m => stats.where($"blockSize" <= m))
    val reps = kept.where($"blockSize" >= 2)
      .groupBy($"blockSize", $"_mn", $"_hx", $"_hs")
      .agg(min($"key").as("key"))
      .select($"key", $"blockSize")
    val sized = base.join(reps, "key")

    val cold = sized.where($"blockSize" <= conf.saltThreshold)
    val l = cold.select($"key", $"id".as("leftId"))
    val r = cold.select($"key", $"id".as("rightId"))
    val coldPairs = l.join(r, Seq("key"))
      .where($"leftId" < $"rightId")
      .select($"leftId", $"rightId", $"key")

    val s = conf.saltBuckets
    val hot = sized.where($"blockSize" > conf.saltThreshold)
      .withColumn("salt", pmod(xxhash64($"id"), lit(s.toLong)).cast("int"))
    val hl = hot.select($"key", $"id".as("lid"), $"salt".as("i"),
      explode(sequence($"salt", lit(s - 1))).as("j"))
    val hr = hot.select($"key", $"id".as("rid"),
      explode(sequence(lit(0), $"salt")).as("i"), $"salt".as("j"))
    val hotPairs = hl.join(hr, Seq("key", "i", "j"))
      .where($"lid" =!= $"rid")
      .select(least($"lid", $"rid").as("leftId"),
        greatest($"lid", $"rid").as("rightId"), $"key")

    coldPairs.unionByName(hotPairs)
      .groupBy($"leftId", $"rightId")
      .agg(min($"key").as("blockKey"))
  }

  /** P4 — context-containment pair filter (MentionPairTrainingData
    * .scala:57-70), the reference's main precision guard before scoring:
    * a pair is admitted only if one mention's context vocabulary has a
    * token containing one of the other mention's (lowercased) surface
    * names as a substring. `mentions` must carry (id, names:array<string>,
    * vocab:array<string>, vocab lowercased). Two narrow equi-joins bring
    * the vocab arrays onto the pairs; the predicate is per-row, no extra
    * shuffle. The containment test is the codegen kernel
    * [[graft.functions.ArrayAnyContains]] (r7, guide §1.2): the previous
    * nested `exists(exists(contains))` lambda chain was CodegenFallback and
    * interpreted per (token, name) pair over the full context vocabulary —
    * the filter stage's hot loop; the kernel keeps the whole post-join
    * filter inside whole-stage codegen with identical WHERE semantics
    * (skipped nulls ≡ exists's NULL, which filters like false).
    */
  def contextContainmentFilter(pairs: DataFrame, mentions: DataFrame): DataFrame = {
    import pairs.sparkSession.implicits._
    val side = (idCol: String, p: String) => mentions.select(
      $"id".as(idCol),
      transform($"names", n => lower(n)).as(s"${p}Names"),
      $"vocab".as(s"${p}Vocab"))
    val contained = (vocab: Column, names: Column) =>
      graft.functions.ArrayAnyContains.array_any_contains(vocab, names)
    pairs
      .join(side("leftId", "l"), "leftId")
      .join(side("rightId", "r"), "rightId")
      .where(contained($"lVocab", $"rNames") || contained($"rVocab", $"lNames"))
      .select(pairs.columns.map(col): _*)
  }
}
