package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S5 — offline KB-dump scrape ETL (reference WikiMappingHelper.scala:
  * 20-28 regexes, 34-99 per-file jobs, 207-239 intro accumulation): the
  * reference's one-time batch job that turns raw KB XML dump files into the
  * structured (id, title, type, name, intro) table the linker consumes
  * (`KbLink.introVectors` / `Pipeline.run(kb = ...)`).
  *
  * Spark-first reframing: the driver-side per-file regex loops become ONE
  * scan over a DataFrame of raw dump-file contents — `regexp_extract_all`
  * per row, explode, field extraction, and the sequential first-paragraph
  * accumulation as a higher-order `aggregate` over the paragraph array.
  * Embarrassingly parallel: no shuffle anywhere except the final narrow
  * id joins (and those co-partition on kbId).
  *
  * At 100 TB: each dump file is independent, so the job scales with input
  * splits; the only driver state is the plan. Entities missing a
  * wiki_text / facts block keep empty intro / null factsClass, mirroring
  * the reference emitting nothing from the corresponding regex job.
  */
object KbEtl {

  // WikiMappingHelper.scala:20 — entity header attributes, fixed order
  private val headerRe =
    """<entity wiki_title="([^"]+)" type="([^"]+)" id="([^"]+)" name="([^"]+)">"""
  // WikiMappingHelper.scala:22 — id paired with its CDATA wiki_text.
  // Deliberate divergence from the reference pattern (`id="..."[\w\W]+?
  // <wiki_text>`): the scan must not cross an entity boundary — with the
  // reference's lazy any-char span, an entity WITHOUT a wiki_text block
  // silently steals the NEXT entity's text (and that entity loses its
  // intro). The tempered span (?:(?!</entity>)[\w\W]) stops at the closing
  // tag, so a textless entity pairs with nothing and keeps an empty intro
  // (spec-covered with the textless entity in first position).
  private val textRe =
    """id="([^"]+)"(?:(?!</entity>)[\w\W])*?<wiki_text><!\[CDATA\[([\w\W]+?)\]\]></wiki_text>"""
  // WikiMappingHelper.scala:26 — facts class on the line after the header
  private val typeRe =
    """id="([^"]+)" name=[^>]+>\n<facts class="([^>]+?)">"""

  /** getKBFirstParagraph (WikiMappingHelper.scala:218-239), as a column:
    * drop the first paragraph (`split("\n\n").tail`), then accumulate
    * paragraphs of MORE than 7 words while the accumulated context is under
    * 1500 words (checked BEFORE each paragraph, so the crossing paragraph
    * is still appended), each with a trailing newline; finally collapse all
    * whitespace to single spaces — which leaves the reference's trailing
    * space when anything was accumulated (quirk preserved).
    */
  /** Java `String.split(" ")` length, as a column: Java's default limit 0
    * REMOVES trailing empty fields (and an all-separator string splits to
    * length 0, while "" splits to length 1) — Spark's split keeps trailing
    * empties for every limit, so a paragraph ending in a space would count
    * one word more and flip the reference's >7 / <1500 boundaries.
    * Randomized-equivalence-tested in KbEtlSpec against a literal
    * reimplementation of the reference loop.
    */
  private def javaWordCount(c: Column): Column = {
    val trimmed = regexp_replace(c, " +$", "")
    when(c === "", 1)
      .otherwise(when(trimmed === "", 0)
        .otherwise(size(split(trimmed, " "))))
  }

  def firstParagraph(text: Column): Column = {
    // trailing empty PARAGRAPHS (Java drops, Spark keeps) are harmless:
    // they never pass the >7-word filter, so no java-split emulation needed
    // on the paragraph split itself
    val all = split(coalesce(text, lit("")), "\n\n")
    val paras = slice(all, lit(2), greatest(size(all) - 1, lit(0)))
    aggregate(
      paras,
      lit(""),
      (ctx, p) => when(
        javaWordCount(ctx) < 1500 && javaWordCount(p) > 7,
        concat(ctx, p, lit("\n"))).otherwise(ctx),
      ctx => regexp_replace(ctx, "\\s+", " "))
  }

  /** getKBIntro (WikiMappingHelper.scala:207-216), the first-SENTENCE
    * sibling of `firstParagraph` used by the reference's `run` job: the
    * OpenNLP sentencer is replaced by a deterministic terminator rule (the
    * S8 policy — no NLP runtime dependencies): the first segment ending at
    * [.!?] followed by whitespace/end; when no terminator exists, the
    * reference's exception fallback `text.take(100)`. Both paths collapse
    * whitespace as the reference does. Abbreviation-aware segmentation
    * ("Dr. Smith") is knowingly coarser than OpenNLP — documented
    * deterministic replacement, same stance as the S8 content features.
    */
  def firstSentence(text: Column): Column = {
    val t = coalesce(text, lit(""))
    val m = regexp_extract(t, "^([\\s\\S]*?[.!?])(\\s|$)", 1)
    regexp_replace(
      when(length(m) > 0, m).otherwise(substring(t, 1, 100)),
      "\\s+", " ")
  }

  /** The dump-scrape job: `raw` carries one row per dump file (or any chunk
    * containing whole `<entity>` blocks) in `xmlCol`. Returns one row per
    * entity header: (kbId, kbName, kbTitle, kbType, factsClass, intro).
    * kbType is the header `type=` attribute; factsClass the reference's
    * separate `getTypes` wikiType sweep (null when absent); intro the
    * accumulated first paragraphs ("" when the entity has no wiki_text).
    */
  def fromDump(raw: DataFrame, xmlCol: String = "xml"): DataFrame = {
    val headers = raw
      .select(explode(regexp_extract_all(col(xmlCol), lit(headerRe), lit(0))).as("h"))
      .select(
        regexp_extract(col("h"), headerRe, 3).as("kbId"),
        regexp_extract(col("h"), headerRe, 4).as("kbName"),
        regexp_extract(col("h"), headerRe, 1).as("kbTitle"),
        regexp_extract(col("h"), headerRe, 2).as("kbType"))
    val texts = raw
      .select(explode(regexp_extract_all(col(xmlCol), lit(textRe), lit(0))).as("t"))
      .select(
        regexp_extract(col("t"), textRe, 1).as("kbId"),
        firstParagraph(regexp_extract(col("t"), textRe, 2)).as("intro"))
    val facts = raw
      .select(explode(regexp_extract_all(col(xmlCol), lit(typeRe), lit(0))).as("f"))
      .select(
        regexp_extract(col("f"), typeRe, 1).as("kbId"),
        regexp_extract(col("f"), typeRe, 2).as("factsClass"))
    headers
      .join(texts, Seq("kbId"), "left")
      .join(facts, Seq("kbId"), "left")
      .select(col("kbId"), col("kbName"), col("kbTitle"), col("kbType"),
        col("factsClass"), coalesce(col("intro"), lit("")).as("intro"))
  }
}
