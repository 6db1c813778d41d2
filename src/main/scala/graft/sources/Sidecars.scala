package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S6 — external sidecar ingestion (reference CorefHelperMethods.scala:32-103):
  * the reference loads three precomputed per-query annotation artifacts into
  * driver maps at startup — `corefStringMentions.txt` (qId → coref string
  * mentions), `namedEntities.txt` (4-line groups: matching/org/location/person
  * named entities per query), `corefmentions.txt` (qId → offset intervals).
  *
  * Spark-first reframing: each sidecar is a TABLE the user brings (computed by
  * any upstream annotator), joined onto the mention frame by id — the
  * load-once driver maps become left equi-joins (J5), co-partitioned with the
  * corpus at scale instead of resident in driver memory. Missing rows land as
  * empty arrays / "None" type, matching the reference's `None` fallbacks when
  * a sidecar file is absent. `Extractions.withLinkVectors` is the same
  * pattern for the OpenIE link-id sidecar (S3/F10).
  *
  * The reference's text formats are also supported for parity: `parseCoref
  * Mentions` (one tab-separated line per query) and `parseNamedEntities`
  * (4-line groups) are pure line parsers — point them at small driver-side
  * files exactly as the reference does; real deployments hand in tables.
  */
object Sidecars {

  /** corefStringMentions sidecar: (id, mentions: array<string>) → adds
    * `corefMentions` (empty array when the sidecar has no row for the id).
    */
  def withCorefMentions(mentions: DataFrame, coref: DataFrame): DataFrame = {
    val empty = array().cast("array<string>")
    mentions
      .join(coref.select(col("id"), col("mentions").as("_cm")), Seq("id"), "left")
      .withColumn("corefMentions", coalesce(col("_cm"), empty))
      .drop("_cm")
  }

  /** namedEntities sidecar: (id, qType, matching, orgs, locs, people) → adds
    * one typed struct column `ner` (reference NamedEntityCollection,
    * CorefHelperMethods.scala:105-110); absent rows get qType "None" and
    * empty entity arrays, the reference's parse defaults.
    */
  def withNamedEntities(mentions: DataFrame, ner: DataFrame): DataFrame = {
    val empty = array().cast("array<string>")
    val n = ner.select(col("id"), col("qType").as("_qType"),
      col("matching").as("_matching"), col("orgs").as("_orgs"),
      col("locs").as("_locs"), col("people").as("_people"))
    mentions.join(n, Seq("id"), "left")
      .withColumn("ner", struct(
        coalesce(col("_qType"), lit("None")).as("qType"),
        coalesce(col("_matching"), empty).as("matching"),
        coalesce(col("_orgs"), empty).as("orgs"),
        coalesce(col("_locs"), empty).as("locs"),
        coalesce(col("_people"), empty).as("people")))
      .drop("_qType", "_matching", "_orgs", "_locs", "_people")
  }

  /** Parse the reference's corefStringMentions format: `qId\tm1\tm2...`
    * (CorefHelperMethods.scala:33-49). Pure; feed `spark.createDataFrame`.
    */
  def parseCorefMentions(lines: Seq[String]): Seq[(String, Seq[String])] =
    lines.filter(_.nonEmpty).map { line =>
      val parts = line.split("\t").toSeq
      (parts.head, parts.tail)
    }

  /** Parse the reference's namedEntities 4-line-group format
    * (CorefHelperMethods.scala:66-103): line 1 = `qId\tqType\tmatching...`,
    * lines 2-4 = `_\t_\torgs... / locs... / people...` (first two fields
    * skipped via drop(2), qType defaults to "None" when absent). A trailing
    * INCOMPLETE group (truncated file) is counted in `malformed`, never
    * dropped silently — same Parsed convention as the other readers.
    */
  def parseNamedEntities(lines: Seq[String])
      : Parsed[(String, String, Seq[String], Seq[String], Seq[String], Seq[String])] = {
    val (full, partial) = lines.grouped(4).toSeq.partition(_.size == 4)
    val rows = full.map { g =>
      val first = g.head.split("\t")
      val qId = first(0)
      val qType = if (first.length > 1) first(1) else "None"
      val matching = first.drop(2).toSeq
      def rest(l: String) = l.split("\t").drop(2).toSeq
      (qId, qType, matching, rest(g(1)), rest(g(2)), rest(g(3)))
    }
    // LINE count, matching the Parsed contract and the sibling parsers
    Parsed(rows, partial.map(_.size).sum)
  }

  /** Parsed rows plus the count of malformed lines SKIPPED (never silent:
    * the reference either throws mid-load or System.err-prints per line;
    * here the caller gets the tally to surface or gate on).
    */
  final case class Parsed[T](rows: Seq[T], malformed: Int)

  /** Parse the reference's gold/system submission `.tab` format
    * (FormattedOutput.readFormattedOutput, FormattedOutput.scala:13-19):
    * `queryId \t kbLink [\t ...]` — only the first two columns are read and
    * the confidence is FORCED to 0.0 (reference quirk: the `confidence`
    * var is never assigned from the line). Lines with fewer than two
    * columns are counted as malformed instead of throwing.
    */
  def parseGoldTab(lines: Seq[String]): Parsed[(String, String, Double)] = {
    val (good, bad) = lines.filter(_.nonEmpty)
      .map(_.split("\t"))
      .partition(_.length >= 2)
    Parsed(good.map(v => (v(0), v(1), 0.0)), bad.size)
  }

  /** Parse the reference's link-classifier training CSV (actually
    * tab-separated; LinkTrainingData.lineToLink, LinkTrainingData
    * .scala:22-36): `label \t queryId \t usedEntityString \t expectedLink
    * [\t ...]`; label is TRIMMED and compared to "CORRECT" (the reference's
    * `label.trim == "CORRECT"`). Shorter lines are the reference's
    * "Malformed training line" stderr path — counted here.
    */
  def parseLinkTrainingCsv(lines: Seq[String])
      : Parsed[(Boolean, String, String, String)] = {
    val (good, bad) = lines.filter(_.nonEmpty)
      .map(_.split("\t"))
      .partition(_.length >= 4)
    Parsed(good.map(v => (v(0).trim == "CORRECT", v(1), v(2), v(3))), bad.size)
  }
}
