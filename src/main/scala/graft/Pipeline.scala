package graft

import graft.operators._
import graft.plans.Checkpoint
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end record-linkage pipeline (SURVEY.md §7, north_star):
  *
  *   repo files → mentions (alias expansion, TF-IDF) → blocking keys
  *   → candidate pairs (sort-merge self-join) → pairwise scoring (Catalyst
  *   expressions) → threshold → edges → large-star/small-star connected
  *   components → decisions (cluster ids + confidence)
  *
  * Every stage is DataFrame-in → DataFrame-out; `runCheckpointed` persists
  * each stage with lineage + metrics for mid-run resume.
  */
object Pipeline {

  final case class Result(
      mentions: DataFrame,
      blocks: DataFrame,
      overflow: DataFrame,
      pairs: DataFrame,
      scored: DataFrame,
      components: DataFrame,
      decisions: DataFrame,
      // ONLY the anchors cache that `run` itself creates (kb-derived path),
      // exposed so callers can release it (self-review r4: an un-exposed
      // persisted frame is an unreleasable leak per invocation). None when
      // the caller passed kbAnchors directly — releasing a caller-owned
      // frame behind their back would be worse than the leak.
      anchors: Option[DataFrame] = None)

  def run(spark: SparkSession, files: DataFrame,
          aliasDict: Map[String, String],
          conf: GraftConf = GraftConf(),
          weights: PairWeights = PairWeights.default,
          kbAnchors: Option[DataFrame] = None,
          kb: Option[DataFrame] = None,
          kbWeights: KbWeights = KbWeights.default,
          extractions: Option[DataFrame] = None,
          argExtractions: Option[DataFrame] = None): Result = {
    import spark.implicits._

    // mentions feed four consumers (blocking, both scoring joins, CC nodes)
    // and scored feeds two (edges, confidence) — persist both so the
    // expensive TF-IDF/scoring subplans run once per action set, mirroring
    // what runCheckpointed gets from its stage tables
    val prepared = Mentions.prepare(spark, files, aliasDict, conf)
    // F10: extraction side tables — (id, fbid) → link vectors, and
    // (id, argText) → arg-text term vectors — onto mentions
    val withExt = extractions.fold(prepared)(e =>
      Extractions.withLinkVectors(prepared, e))
    val mentions = argExtractions.fold(withExt)(a =>
      Extractions.withArgVectors(withExt, a))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // mention→KB candidate linking (the reference's flagship op): anchors
    // either passed in directly or built from a KB entity table. Persisted:
    // Decisions.assemble consumes the frame twice (incident-score union and
    // the component-anchor join), and the KbLink subplan (candidate join +
    // per-mention window) is not free to rerun.
    val ownAnchors =
      if (kbAnchors.isDefined) None
      else kb.map { k =>
        val kbVec =
          if (k.columns.contains("intro")) KbLink.introVectors(k, "intro") else k
        // calibrated preset: link() builds the amb aggregate inline — a
        // second pass over the mention frame, served by the persist above
        // (a cache read, not a lineage re-run). Only runCheckpointed below
        // genuinely single-scans the lineage, by making amb its own
        // table-backed stage.
        KbLink.anchors(mentions, kbVec, kbWeights, conf)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      }
    val anchors = kbAnchors.orElse(ownAnchors)

    // ONE per-key stats aggregation feeds the size cap, the overflow frame
    // AND candidatePairs' duplicate-block collapse (r7, guide §2.4:
    // candidatePairs previously re-grouped the exploded frame its caller
    // had just aggregated, and the blocks pre-filter join ran a second
    // exchange of it; the cap now applies inside the tiny reps frame)
    val exploded = Blocking.explodeKeys(mentions)
    val stats = Blocking.blockStats(exploded)
    val blocked = Blocking.fromSizes(exploded, stats, conf)
    val rawPairs = Blocking.candidatePairsFromStats(exploded, stats, conf,
      Some(conf.maxBlockSize))
    // P4 precision guard (opt-in): context vocabulary must contain the
    // other side's name
    val pairs =
      if (conf.contextFilter) Blocking.contextContainmentFilter(rawPairs, mentions)
      else rawPairs
    val scored = Scoring.score(pairs, mentions, weights, conf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val accepted = scored.where($"score" > conf.linkThreshold)
    val edges = accepted.select($"leftId".as("src"), $"rightId".as("dst"))
    // CC output feeds both the result and decisions — persist, or the whole
    // iterative closure reruns per downstream action
    val components = ConnectedComponents.run(mentions.select($"id"), edges,
      maxIter = conf.ccMaxIter)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val decisions = Decisions.assemble(components, accepted, anchors, conf.linkThreshold)

    Result(mentions, blocked.blocks, blocked.overflow, pairs, scored,
      components, decisions, ownAnchors)
  }

  /** Same pipeline with per-stage checkpoint tables (blocks, scored pairs,
    * components — the three the north_rule names) under `checkpointRoot`.
    */
  def runCheckpointed(spark: SparkSession, files: DataFrame,
                      aliasDict: Map[String, String],
                      checkpointRoot: String,
                      conf: GraftConf = GraftConf(),
                      weights: PairWeights = PairWeights.default,
                      kbAnchors: Option[DataFrame] = None,
                      kb: Option[DataFrame] = None,
                      kbWeights: KbWeights = KbWeights.default,
                      extractions: Option[DataFrame] = None,
                      argExtractions: Option[DataFrame] = None): Result = {
    import spark.implicits._
    val cp = new Checkpoint(spark, checkpointRoot)
    // hash covers EVERYTHING that changes stage outputs: conf, weights, the
    // alias dictionary, the corpus input fingerprint (file paths + sizes +
    // mtimes — still parquet-metadata-only, but unlike the old row-count+
    // schema hash it catches same-cardinality content edits; ADVICE r2), and
    // CONTENT fingerprints of the small/medium side frames (kb, directly-
    // passed anchors, extractions).
    // "stage-layout-2": a LAYOUT VERSION inside the hash (review r7) — r7
    // widened the block_sizes stage schema (blockStats signature columns),
    // and a config hash that ignores code layout would let a PRE-r7
    // committed root pass the resume check and then crash the scored stage
    // on the missing columns; bumping this tag makes old roots recompute
    // instead. Bump it whenever a stage table's schema or meaning changes.
    val h = Checkpoint.hash("stage-layout-2", conf, weights, kbWeights,
      aliasDict.toSeq.sorted.mkString(","),
      Checkpoint.inputFingerprint(files),
      kb.map(Checkpoint.fingerprint).getOrElse("nokb"),
      kbAnchors.map(Checkpoint.fingerprint).getOrElse("noanchors"),
      extractions.map(Checkpoint.fingerprint).getOrElse("noext"),
      argExtractions.map(Checkpoint.fingerprint).getOrElse("noarg"))

    val mentions = cp.getOrCompute("mentions", h, Seq("files")) {
      val prepared = Mentions.prepare(spark, files, aliasDict, conf)
      val withExt = extractions.fold(prepared)(e =>
        Extractions.withLinkVectors(prepared, e))
      argExtractions.fold(withExt)(a => Extractions.withArgVectors(withExt, a))
    }
    val anchors = kbAnchors.orElse(kb.map { k =>
      cp.getOrCompute("kb_anchors", h, Seq("mentions")) {
        val kbVec =
          if (k.columns.contains("intro")) KbLink.introVectors(k, "intro") else k
        // calibrated preset: the amb aggregate is its OWN stage, so it is
        // computed from the table-backed mentions stage (not a second
        // evaluation of the corpus lineage) and a resumed run reuses it —
        // with the stage table passed down, the cold checkpointed run scans
        // the mention table exactly once end-to-end (VERDICT r5 #6)
        val amb =
          if (kbWeights.nameAmbiguity != 0.0)
            Some(cp.getOrCompute("name_ambiguity", h, Seq("mentions")) {
              KbLink.nameAmbiguity(mentions, kbVec)
            })
          else None
        KbLink.anchors(mentions, kbVec, kbWeights, conf, amb)
      }
    })
    // block sizes checkpoint ONCE in their own stage (review r5: the blocks
    // and overflow stages each re-ran the explode+count aggregation over
    // the mention table on cold runs); both frames then derive from the
    // tiny sizes table — the explode itself is narrow and cheap per reuse.
    // The stage carries the full blockStats columns (r7) so the scored
    // stage's candidatePairs reuses the aggregation instead of re-grouping
    // the exploded frame (guide §2.4).
    val exploded = Blocking.explodeKeys(mentions)
    val sizes = cp.getOrCompute("block_sizes", h, Seq("mentions")) {
      Blocking.blockStats(exploded)
    }
    val blocked = Blocking.fromSizes(exploded, sizes, conf)
    val blocks = cp.getOrCompute("blocks", h, Seq("block_sizes")) {
      blocked.blocks
    }
    val overflow = cp.getOrCompute("blocks_overflow", h, Seq("block_sizes")) {
      blocked.overflow
    }
    // deps reflect what the stage actually reads since r7: the stats table
    // and the re-exploded mentions (the former blocks-table read is gone)
    val scored = cp.getOrCompute("scored_pairs", h, Seq("block_sizes", "mentions")) {
      val rawPairs = Blocking.candidatePairsFromStats(exploded, sizes, conf,
        Some(conf.maxBlockSize))
      // same P4 guard as run(): the two entry points must score the same pairs
      val filtered =
        if (conf.contextFilter) Blocking.contextContainmentFilter(rawPairs, mentions)
        else rawPairs
      Scoring.score(filtered, mentions, weights, conf)
    }
    val components = cp.getOrCompute("components", h, Seq("scored_pairs")) {
      val edges = scored.where($"score" > conf.linkThreshold)
        .select($"leftId".as("src"), $"rightId".as("dst"))
      ConnectedComponents.run(mentions.select($"id"), edges,
      maxIter = conf.ccMaxIter)
    }
    val decisions = cp.getOrCompute("decisions", h, Seq("components")) {
      Decisions.assemble(components,
        scored.where($"score" > conf.linkThreshold), anchors, conf.linkThreshold)
    }
    val pairs = scored.select($"leftId", $"rightId", $"blockKey")
    // checkpointed stages are table-backed, not persisted — nothing to
    // release, so Result.anchors stays None by its own contract
    Result(mentions, blocks, overflow, pairs, scored, components, decisions)
  }
}
