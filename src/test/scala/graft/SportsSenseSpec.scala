package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** P6 sports-sense gate: dict candidacy, NB context layer, logistic layer at
  * the reference threshold 0.15, None/NULL for non-candidates.
  */
class SportsSenseSpec extends SparkSpec {
  import spark.implicits._

  private val gaz = typedlit(Seq("seattle", "portland", "kansas"))

  private def doc(sports: Boolean, i: Int) =
    if (sports)
      s"seattle beat portland ${i % 9} - ${(i + 3) % 9} in the championship game " +
        "players scored again tonight season win streak"
    else
      s"seattle is a rainy city in washington state with coffee museums " +
        s"parks and a population near ${i}00000 residents"

  private lazy val labeled = (0 until 120).map { i =>
    val sports = i % 2 == 0
    (s"t$i", "seattle", if (sports) "ORGANIZATION" else "LOCATION",
      doc(sports, i), sports)
  }.toDF("id", "name", "nerType", "content", "label")
    .withColumn("tokens", split(lower($"content"), " "))

  test("trained gate separates sports-sense from location-sense contexts") {
    val model = SportsSense.train(labeled)
    val out = SportsSense.label(labeled, model, gaz)
      .select($"id", $"label", $"sportsSense").collect()
    val wrong = out.count(r => r.getBoolean(1) != r.getBoolean(2))
    assert(wrong == 0, s"$wrong/120 misclassified")
  }

  test("non-candidates get NULL (reference None): not in gazetteer, or PERSON NER") {
    val model = SportsSense.train(labeled)
    val others = Seq(
      ("x1", "kubernetes", "ORGANIZATION", doc(sports = true, 1), true),
      ("x2", "seattle", "PERSON", doc(sports = true, 2), true))
      .toDF("id", "name", "nerType", "content", "label")
      .withColumn("tokens", split(lower($"content"), " "))
    val out = SportsSense.label(others, model, gaz)
      .select($"id", $"sportsSense").collect()
      .map(r => r.getString(0) -> r.isNullAt(1)).toMap
    assert(out("x1") && out("x2"), "non-candidates must be NULL, not false")
  }

  test("gate drives the C4 reroute: sportsSense <=> true reroutes a location anchor") {
    val model = SportsSense.train(labeled)
    // the team entity shares the exact name so the rerouted re-query scores
    // above threshold (the drop path for a fuzzier team name is covered in
    // KbLinkSpec's C4 test); the main pass still anchors E1 — equal-z tie
    // breaks on kbId
    val kb = Seq(
      ("E1", "seattle", "location", Seq.empty[String]),
      ("E2", "seattle", "team", Seq("seattle sounders")))
      .toDF("kbId", "kbName", "kbType", "aliases")
    val mentions = Seq(
      ("m1", "seattle", "seattle", "ORGANIZATION", doc(sports = true, 4)),
      ("m2", "seattle", "seattle", "LOCATION", doc(sports = false, 5)))
      .toDF("id", "name", "entityString", "nerType", "content")
      .withColumn("tokens", split(lower($"content"), " "))
      .withColumn("names", array($"entityString"))
      .withColumn("abbrs", array(Mentions.initialism($"entityString")))
    val gated = SportsSense.label(mentions, model, gaz)
    val anchors = KbLink.anchors(gated, kb)
    val rerouted = KbLink.typeReroute(gated, anchors, kb,
      gate = col("sportsSense") <=> true, fromType = "location", toType = "team")
      .select($"id", $"kbId").as[(String, String)].collect().toMap
    assert(rerouted("m1") == "E2", "sports-sense mention reroutes to the team entity")
    assert(rerouted("m2") == "E1", "location-sense mention keeps its location anchor")
  }
}
