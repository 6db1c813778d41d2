package graft.operators

import graft.functions.VecFunctions.minhash_bands
import graft.functions.SimHash64
import org.apache.spark.sql.GraftExpr
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline. Each takes a
  * DataFrame with (id, text) shaped columns and returns assignments
  * (id, dupGroup) or pair candidates — all pure DataFrame transforms.
  *
  * At 100 TB: exact dedup is one hash aggregation (map-side combinable);
  * the near-dup variants block first (LSH bands / simhash chunks) so the
  * candidate self-join never goes quadratic, then verify only candidates.
  */
object Dedup {

  /** Exact dedup by content hash: every row mapped to its group keeper
    * (min id per sha256). One groupBy + one join — no self-join.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val h = sha2(col(textCol), 256)
    val groups = df.select(col(idCol).as("id"), h.as("h"))
    val keepers = groups.groupBy(col("h"))
      .agg(min(col("id")).as("keeper"), count(lit(1)).as("copies"))
    groups.join(keepers, "h")
      .select(col("id"), col("keeper"), col("copies"), col("h"))
  }

  /** MinHash+LSH near-dup: shingle → minhash → band → salted bucket pair
    * generation → verified Jaccard ≥ `threshold` edges → connected
    * components. Returns (id, dupGroup).
    *
    * Pair generation goes through `Blocking.candidatePairs` — NOT a raw
    * bucket self-join: a hot band (boilerplate/license text shared by
    * thousands of docs) would otherwise put an O(n²) pair expansion in a
    * single shuffle key. The salted path spreads a hot bucket over
    * S(S+1)/2 shuffle keys and dedups pairs found under several bands in
    * the same aggregation it needs anyway.
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 conf: GraftConf = GraftConf(), threshold: Double = 0.7): DataFrame = {
    import df.sparkSession.implicits._
    // the tokenize→shingle→minhash frame feeds FOUR consumers (block keys,
    // both verification sides, CC nodes) — persist it or the expensive
    // shingling runs once per consumer
    val toks = df.select(
      col(idCol).cast("string").as("id"),
      filter(split(lower(col(textCol)), "[^a-z0-9]+"), t => length(t) > 0).as("tokens"))
      .withColumn("shingles",
        array_distinct(Mentions.shingleHashes($"tokens", conf.shingleK)))
      .withColumn("bands", minhash_bands($"shingles", conf.minHashes, conf.bands, conf.seed))
      .drop("tokens")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val blocks = toks.select($"id", explode($"bands").as("key"))
    val cand = Blocking.candidatePairs(blocks, conf)
      .select($"leftId", $"rightId")

    // verify candidates with exact shingle Jaccard
    val sides = toks.select($"id", $"shingles")
    val verified = cand
      .join(sides.select($"id".as("leftId"), $"shingles".as("ls")), "leftId")
      .join(sides.select($"id".as("rightId"), $"shingles".as("rs")), "rightId")
      .withColumn("jaccard",
        size(array_intersect($"ls", $"rs")).cast("double") /
          size(array_union($"ls", $"rs")))
      .where($"jaccard" >= threshold)
      .select($"leftId".as("src"), $"rightId".as("dst"))

    val out = ConnectedComponents.run(toks.select($"id"), verified)
      .withColumnRenamed("component", "dupGroup")
      .localCheckpoint(true) // materialize before releasing toks
    toks.unpersist()
    out
  }

  /** SimHash near-dup: 64-bit signature, candidates share one of 4 16-bit
    * chunks (≥1 chunk must be identical when hamming distance ≤ `maxHamming`
    * for maxHamming ≤ 3 by pigeonhole), verified by bit_count(xor) ≤ k.
    *
    * Chunk-key pair generation is salted via `Blocking.candidatePairs` —
    * the all-zero / low-entropy chunk value is a guaranteed hot key on real
    * corpora (VERDICT r1); signatures are joined back onto the deduped
    * pairs as two narrow equi-joins.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String,
              maxHamming: Int = 3, conf: GraftConf = GraftConf()): DataFrame = {
    import df.sparkSession.implicits._
    // signature frame feeds four consumers (chunk keys, two signature-side
    // joins, CC nodes) — persist, same rationale as minhashLsh
    val toks = df.select(
      col(idCol).cast("string").as("id"),
      filter(split(lower(col(textCol)), "[^a-z0-9]+"), t => length(t) > 0).as("tokens"))
      .withColumn("sig", SimHash64.simhash(transform($"tokens", t => xxhash64(t))))
      .drop("tokens")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // 4 chunks of 16 bits: chunk i = bits [16i, 16i+16)
    val chunks = (0 until 4).map(i =>
      struct(lit(i).as("ci"), shiftright($"sig", i * 16).bitwiseAND(lit(0xFFFFL)).as("cv")))
    val blocks = toks.select($"id", explode(array(chunks: _*)).as("c"))
      .select($"id", concat($"c.ci", lit(":"), $"c.cv").as("key"))

    val sigs = toks.select($"id", $"sig")
    val cand = Blocking.candidatePairs(blocks, conf)
      .join(sigs.select($"id".as("leftId"), $"sig".as("lsig")), "leftId")
      .join(sigs.select($"id".as("rightId"), $"sig".as("rsig")), "rightId")
      .withColumn("hamming", bit_count($"lsig".bitwiseXOR($"rsig")))
      .where($"hamming" <= maxHamming)

    val edges = cand.select($"leftId".as("src"), $"rightId".as("dst"))
    val out = ConnectedComponents.run(toks.select($"id"), edges)
      .withColumnRenamed("component", "dupGroup")
      .localCheckpoint(true)
    toks.unpersist()
    out
  }

  /** Token n-gram Jaccard near-dup within explicit blocks (exact, no LSH) —
    * the verification-only path for small blocks.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        blockCol: String, n: Int = 2, threshold: Double = 0.5): DataFrame = {
    import df.sparkSession.implicits._
    val toks = df.select(
      col(idCol).cast("string").as("id"), col(blockCol).as("block"),
      filter(split(lower(col(textCol)), "[^a-z0-9]+"), t => length(t) > 0).as("tokens"))
      .withColumn("grams", array_distinct(Mentions.shingleHashes($"tokens", n)))
    toks.as("l").join(toks.as("r"),
        $"l.block" === $"r.block" && $"l.id" < $"r.id")
      .withColumn("jaccard",
        size(array_intersect($"l.grams", $"r.grams")).cast("double") /
          size(array_union($"l.grams", $"r.grams")))
      .where($"jaccard" >= threshold)
      .select($"l.id".as("leftId"), $"r.id".as("rightId"), $"jaccard")
  }

  /** Embedding-cosine near-dup: random-hyperplane LSH buckets (sign bits of
    * `planes` seeded projections) then verified cosine ≥ threshold within
    * buckets. Scale path for ANN dedup — never a global cross join.
    */
  def embeddingCosine(df: DataFrame, idCol: String, vecCol: String,
                      threshold: Double = 0.95, planes: Int = 8,
                      seed: Long = 42L): DataFrame = {
    import df.sparkSession.implicits._
    val withNorm = df.select(
      col(idCol).cast("string").as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("norm", sqrt(aggregate($"v", lit(0.0), (a, x) => a + x * x)))
    val withSig = withNorm.withColumn("sig",
      SimilaritySearch.hyperplaneSig($"v", planes, seed))
    val cand = withSig.as("l").join(withSig.as("r"),
        $"l.sig" === $"r.sig" && $"l.id" < $"r.id")
      .withColumn("cos",
        aggregate(zip_with($"l.v", $"r.v", (a, b) => a * b), lit(0.0), (a, x) => a + x)
          / ($"l.norm" * $"r.norm"))
      .where($"cos" >= threshold)
      .select($"l.id".as("src"), $"r.id".as("dst"))
    ConnectedComponents.run(withSig.select($"id"), cand)
      .withColumnRenamed("component", "dupGroup")
  }
}
