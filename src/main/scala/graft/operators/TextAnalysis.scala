package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * column expressions (codegen'd, scan-parallel, no shuffle).
  */
object TextAnalysis {

  /** Per-language marker token sets for the n-gram/stopword heuristic.
    * Deterministic and tiny — the language with the highest marker-token
    * ratio wins; ties and no-markers fall back to "und".
    */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "with"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "en", "una"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr" -> Seq("le", "la", "les", "de", "et", "est", "une", "que"))

  /** Marker-hit count for one language's marker list. */
  def markerHits(text: Column, lang: String): Column = {
    val toks = split(lower(text), "[^a-z]+")
    size(filter(toks, t => t.isin(markers(lang).map(lit(_)): _*)))
  }

  /** Language-ID: argmax over marker-hit counts with an explicit,
    * SQL-replicable priority chain (en > es > de > fr on ties); no hits →
    * "und". Deterministic so a DuckDB oracle can mirror it verbatim.
    */
  def langId(text: Column): Column = {
    val en = markerHits(text, "en"); val es = markerHits(text, "es")
    val de = markerHits(text, "de"); val fr = markerHits(text, "fr")
    when(greatest(en, es, de, fr) === 0, "und")
      .when(en >= es && en >= de && en >= fr, "en")
      .when(es >= de && es >= fr, "es")
      .when(de >= fr, "de")
      .otherwise("fr")
  }

  /** Quality score in [0,1]: blend of length band, mean token length band,
    * alphabetic ratio and repetition (distinct-token ratio) — the
    * length/punct/stopword-ratio style heuristics of C4/Gopher-style
    * pipelines, deterministic and SQL-only.
    */
  def qualityScore(text: Column): Column = {
    val toks = split(text, "\\s+")
    val nTok = greatest(size(toks), lit(1)).cast("double")
    val meanTokLen = length(text) / nTok
    val alphaRatio =
      (length(text) - length(regexp_replace(text, "[\\p{L}\\p{N} ]", ""))).cast("double") /
        greatest(length(text), lit(1))
    val distinctRatio = size(array_distinct(toks)).cast("double") / nTok
    val lenScore = when(nTok.between(10, 100000), 1.0).otherwise(0.2)
    val tokLenScore = when(meanTokLen.between(2.0, 12.0), 1.0).otherwise(0.3)
    round(lenScore * 0.25 + tokLenScore * 0.25 + alphaRatio * 0.25 + distinctRatio * 0.25, 4)
  }

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column =
    size(split(text, "\\s+")).cast("long")

  /** BPE-ish token count: word pieces + digits + punctuation runs — the
    * regex family used for rough LLM token estimates.
    */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0))).cast("long")

  /** Rolling-hash document fingerprint: xxhash64 of each k-token window,
    * winnowed to the min hash per non-overlapping stride — a compact
    * content signature robust to small edits (winnowing, Schleimer et al.
    * SIGMOD'03). Returns array<long>.
    */
  def fingerprint(text: Column, k: Int = 5, stride: Int = 8): Column = {
    val toks = Mentions.contentTokens(text)
    val windows = Mentions.shingleHashes(toks, k)
    // winnow: group windows into strides, keep min of each
    val nStrides = ceil(size(windows) / lit(stride.toDouble)).cast("int")
    transform(sequence(lit(0), greatest(nStrides - 1, lit(0))),
      s => array_min(slice(windows, s * stride + 1, lit(stride))))
  }

  /** Attach all text-analysis columns to a documents frame. */
  def analyze(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("lang_pred", langId(col(textCol)))
      .withColumn("quality", qualityScore(col(textCol)))
      .withColumn("n_tokens_ws", tokenCountWs(col(textCol)))
      .withColumn("n_tokens_bpe", tokenCountBpe(col(textCol)))
      .withColumn("fp", fingerprint(col(textCol)))
}
