package graft.model

/** Core schemas of the record-linkage engine.
  *
  * The reference (knowitall/Tac2013EntityLinking) keeps everything in
  * driver-local case classes (KBPQuery.scala:12-77, FormattedOutput.scala:3-8);
  * here each becomes the row type of a typed Dataset so every stage is a pure
  * DataFrame-in -> DataFrame-out transform (SURVEY.md §1.1).
  */

/** Primary input row (BASELINE.json input_hint): one source-code repository
  * file. `repo` plays the entity-bearing "name" role of the reference's
  * KBPQuery.name; `content` plays the mention context (KBPQuery.scala:59-62).
  */
final case class RepoFile(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String
)

/** A mention to resolve — reference KBPQuery (KBPQuery.scala:12-77) with its
  * mutable enrichments flattened to immutable columns.
  */
final case class Mention(
    id: String, // unique mention id (repo/path@commit)
    name: String, // raw surface name (normalized repo token string)
    entityString: String, // expanded alias (reference entityString)
    lang: String,
    content: String
)

/** One (mentionId, blockingKey) row emitted by the blocking stage. */
final case class BlockRow(id: String, key: String)

/** A scored candidate pair — reference MentionPair
  * (MentionPairFeatures.scala:57-90). leftId < rightId.
  */
final case class ScoredPair(
    leftId: String,
    rightId: String,
    blockKey: String,
    jw: Double, // Jaro-Winkler on entity strings (F4)
    lev: Double, // bounded-Levenshtein similarity (north_star pairing of F4)
    cosine: Double, // TF-IDF cosine over content (F2)
    namesOverlap: Boolean, // F5
    prefix: Boolean, // F7
    containsF: Boolean, // F8 (containment excluding exact overlap)
    abbrMatch: Boolean, // F9
    linkSim: Double, // F10 (extraction link-id cosine; 0 without extractions)
    argSim: Double, // F10 second half (extraction arg-text cosine)
    sameSurname: Boolean, // F6 (common-surname damping signal)
    score: Double // logistic score (G1)
)

/** A KB entity — reference EntityInfo + the six KB maps collapsed into one
  * dimension table (WikiMappingHelper.scala:114-204, KBPQuery.scala:144-175):
  * canonical name, aliases (wikiMap surface forms), type, intro text.
  */
final case class KbEntity(
    kbId: String, // E%06d-style id (reference KB node ids)
    kbName: String, // canonical title (kbIdToTitleMap)
    kbType: String, // wikiType / structuredType collapsed
    aliases: Seq[String], // surface forms mapping to this id (wikiMap)
    intro: String // intro paragraph text (kbIdTextMap)
)

/** A connected-component assignment (node -> component root). */
final case class Component(id: String, component: String)

/** Final link decision — reference FormattedOutput (FormattedOutput.scala:3-8).
  * clusterId is a KB id or a NIL id derived from min(mentionId).
  */
final case class Decision(mentionId: String, clusterId: String, confidence: Double)

/** Per-stage, per-partition checkpoint metrics row (north_rule: "resumable
  * from checkpoint with per-partition lineage + metrics").
  */
final case class MetricsRow(
    stage: String,
    partitionId: Int,
    rows: Long
)
