package graft

import graft.operators._
import graft.sources.SynthCorpus
import org.apache.spark.sql.functions._

/** Mention→KB candidate linking (reference flagship,
  * RunKBPEntityLinkerSystem.scala:56-147): candidate generation, scoring,
  * acceptance, back-off re-linking (A8), type reroute (C4), and the
  * KB-anchored end-to-end pipeline.
  */
class KbLinkSpec extends SparkSpec {
  import spark.implicits._

  private def mentionsDf(rows: (String, String)*) =
    rows.toDF("id", "entityString")
      .withColumn("name", $"entityString")
      .withColumn("names", array($"entityString"))
      .withColumn("abbrs", array(Mentions.initialism($"entityString")))

  private def kbDf(rows: (String, String, String, Seq[String])*) =
    rows.toDF("kbId", "kbName", "kbType", "aliases")

  private val kb = kbDf(
    ("E000001", "kubernetes", "software", Seq("k8s")),
    ("E000002", "tensorflow", "software", Seq("tf")),
    ("E000003", "seattle", "location", Seq.empty),
    ("E000004", "seattle sounders", "team", Seq.empty))

  test("exact and alias mentions are accepted; unrelated ones are not") {
    val m = mentionsDf(("m1", "kubernetes"), ("m2", "k8s"), ("m3", "zebra"))
    val got = KbLink.link(m, kb)
      .select($"id", $"kbId", $"accepted").as[(String, String, Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("m1") == ("E000001", true))
    // alias key finds the candidate; exact-title is false but the alias is in
    // kbNames so overlap fires — acceptance comes from the alias-overlap path
    assert(got.get("m2").forall(_._1 == "E000001"))
    assert(!got.contains("m3") || !got("m3")._2) // no candidate or rejected
  }

  test("a one-edit typo without context support stays below the threshold") {
    val m = mentionsDf(("m1", "kubernetez"))
    val got = KbLink.link(m, kb, conf = GraftConf(prefixLen = 6))
      .select($"id", $"kbId", $"accepted", $"z")
      .as[(String, String, Boolean, Double)].collect()
    assert(got.length == 1 && got.head._2 == "E000001" && !got.head._3)
  }

  test("context cosine (intro vectors) lifts a close match over the bar") {
    val vocab = (0 until 20).map(i => s"term$i").mkString(" ")
    val kbVec = KbLink.introVectors(
      kbDf(("E000001", "kubernetes", "software", Seq.empty))
        .withColumn("intro", lit(s"kubernetes $vocab")), "intro")
    // mention carries a unit vector over the same token hash space
    val m = mentionsDf(("m1", "kubernetez"))
      .withColumn("toks", split(lit(s"kubernetez $vocab"), " "))
      .withColumn("vecH", sort_array(transform(array_distinct($"toks"), t => xxhash64(t))))
      .withColumn("vecW", transform($"vecH", _ => lit(1.0) / sqrt(size($"vecH").cast("double"))))
      .drop("toks")
    val without = KbLink.link(m.drop("vecH", "vecW"), kbVec, conf = GraftConf(prefixLen = 6))
      .select($"accepted").as[Boolean].head()
    val withVec = KbLink.link(m, kbVec, conf = GraftConf(prefixLen = 6))
      .select($"accepted", $"z").as[(Boolean, Double)].head()
    assert(!without && withVec._1, s"cosine should flip acceptance, z=${withVec._2}")
  }

  test("backoffAnchors re-links via back-off substrings (A8)") {
    // expansion is 2+ words longer than the name and comma/period-free;
    // back-off span "seattle sounders" hits the KB exactly
    val m = mentionsDf(("m1", "the seattle sounders club"))
      .withColumn("name", lit("sounders"))
    val accepted = KbLink.anchors(m, kb) // main pass: no candidate key matches
    assert(accepted.isEmpty)
    val extra = KbLink.backoffAnchors(m, accepted, kb)
      .select($"id", $"kbId").as[(String, String)].collect()
    assert(extra.toSeq == Seq(("m1", "E000004")))
  }

  test("typeReroute moves a gated location anchor to a team entity (C4)") {
    val m = mentionsDf(("m1", "seattle"), ("m2", "seattle"))
    val anchors = KbLink.anchors(m, kb)
    // both anchored to the location (exact match beats the longer team name)
    assert(anchors.select($"kbId").distinct().as[String].collect().toSeq == Seq("E000003"))
    val gate = $"id" === "m1" // play the sportsSense gate for m1 only
    val rerouted = KbLink.typeReroute(m, anchors, kb, gate, "location", "team")
      .select($"id", $"kbId").as[(String, String)].collect().toMap
    // m1: gate fired but no team candidate scores above threshold for
    // "seattle" vs "seattle sounders" -> anchor dropped (fresh NIL downstream)
    assert(!rerouted.contains("m1"))
    assert(rerouted("m2") == "E000003") // ungated anchor untouched
  }

  test("KB-anchored pipeline: decisions carry the gold E* ids") {
    val files = SynthCorpus.corpus(spark)
    val result = Pipeline.run(spark, files, SynthCorpus.aliasDict,
      kb = Some(SynthCorpus.kb(spark)))
    val d = result.decisions.cache()
    val goldKb = SynthCorpus.goldKb(spark)
    val joined = d.join(goldKb, d("mentionId") === goldKb("id"))
    val n = joined.count()
    val hit = joined.where($"clusterId" === $"goldKbId").count()
    info(s"KB-link accuracy: $hit/$n")
    assert(n == 160)
    assert(hit.toDouble / n >= 0.97, s"KB cluster-id accuracy $hit/$n")
    // anchored confidence comes from the link score (not the 0.55 floor)
    assert(d.where($"clusterId".startsWith("E") && $"confidence" > 0.8).count() > 0)
  }

  test("KbWeights.calibrated strictly improves kb_link_acc on ambiguous names (VERDICT r4 #4)") {
    // fixture pinning BOTH dormant features:
    //  - m_amb ("corex", gold NIL): a generic name contained in five KB
    //    titles; an aliased fuzzy candidate with full context support is
    //    wrongly accepted by the default preset (z ≈ 5.5 > 2.59), and
    //    nameAmbiguity (−4·ln 6 ≈ −7.2) demotes it below the bar;
    //  - m_fn ("Corex One", gold E001): an impostor entity with the SAME
    //    normalized title ("CorexOne") out-scores the true entity via jw +
    //    context cosine under the default preset (both rank exactTitle), and
    //    fullNameMatch (+4.8 on the exact unnormalized string) flips top-1;
    //  - m_ok: unambiguous control — correct under BOTH presets.
    val kb = KbLink.introVectors(Seq(
      ("E001", "Corex One", Seq[String](), "uno intro alpha tokens"),
      ("E002", "CorexOne", Seq[String](), "impostor ctx tokens here"),
      ("E003", "Zulu Quartz", Seq[String](), "zulu intro quartz facts"),
      ("E011", "corex two", Seq("corex"), "ambctx shared tokens now"),
      ("E012", "corex three", Seq[String](), "three intro"),
      ("E013", "corex four", Seq[String](), "four intro"))
      .toDF("kbId", "kbName", "aliases", "intro"), "intro")
    val mentions = KbLink.introVectors(Seq(
      ("m_amb", "corex", "ambctx shared tokens now"),
      ("m_fn", "Corex One", "impostor ctx tokens here"),
      ("m_ok", "Zulu Quartz", "zulu intro quartz facts"))
      .toDF("id", "entityString", "ctx"), "ctx")
      .withColumnRenamed("introVecH", "vecH")
      .withColumnRenamed("introVecW", "vecW")
      .withColumn("names", array($"entityString"))
      .withColumn("abbrs", array(Mentions.initialism($"entityString")))
      .drop("ctx")
    val gold = Map("m_amb" -> "NIL", "m_fn" -> "E001", "m_ok" -> "E003")
    def run(w: KbWeights): (Double, Map[String, (String, Boolean)]) = {
      val got = KbLink.link(mentions, kb, w)
        .select($"id", $"kbId", $"accepted").as[(String, String, Boolean)]
        .collect().map(r => r._1 -> (r._2, r._3)).toMap
      val ok = gold.count { case (id, g) =>
        got.get(id) match {
          case Some((kbId, acc)) => if (g == "NIL") !acc else acc && kbId == g
          case None => g == "NIL"
        }
      }
      (ok.toDouble / gold.size, got)
    }
    val (accDefault, byDefault) = run(KbWeights.default)
    val (accCal, byCal) = run(KbWeights.calibrated)
    // pin the default preset's two failure modes (fixture drift guard)
    assert(byDefault("m_amb")._2, s"default should accept m_amb: $byDefault")
    assert(byDefault("m_fn")._1 == "E002", s"default should pick the impostor: $byDefault")
    assert(byDefault("m_ok") == (("E003", true)))
    // the calibrated preset fixes both without breaking the control
    assert(!byCal("m_amb")._2, s"nameAmbiguity should demote the fuzzy accept: $byCal")
    assert(byCal("m_fn") == (("E001", true)), s"fullNameMatch should rescue the exact string: $byCal")
    assert(byCal("m_ok") == (("E003", true)))
    assert(accCal > accDefault, s"calibrated acc $accCal !> default $accDefault")
    info(f"kb_link_acc default=$accDefault%.2f calibrated=$accCal%.2f")
  }

  test("nameAmbiguityTokenized: agrees on word-aligned hits, pins the subword divergence") {
    val mentions = Seq("Apache Spark", "Unmatched Thing").toDF("entityString")
    val kb = Seq(
      "the apache spark project", // word-aligned phrase: BOTH forms count
      "apache sparkle",           // substring via prefix: BNLJ only
      "xapache spark",            // substring, first token misaligned: BNLJ only
      "apache",                   // shorter than the name: NEITHER (guard path)
      "spark apache"              // both words present, wrong order: NEITHER
    ).toDF("kbName")
    def amb(df: org.apache.spark.sql.DataFrame) = df
      .as[(String, Double)].collect().toMap
    val bnlj = amb(KbLink.nameAmbiguity(mentions, kb))
    val tok = amb(KbLink.nameAmbiguityTokenized(mentions, kb))
    assert(math.abs(bnlj("apache spark") - math.log(1.0 + 3)) < 1e-12, bnlj)
    assert(math.abs(tok("apache spark") - math.log(1.0 + 1)) < 1e-12, tok)
    // every name present in BOTH outputs even with zero hits (left joins)
    assert(bnlj("unmatched thing") == 0.0 && tok("unmatched thing") == 0.0)
    // a repeated word in one title must not double-count (array_distinct)
    val kbDup = Seq("apache spark apache spark").toDF("kbName")
    val tokDup = amb(KbLink.nameAmbiguityTokenized(mentions, kbDup))
    assert(math.abs(tokDup("apache spark") - math.log(2.0)) < 1e-12, tokDup)
    // ...but two KB ROWS sharing one title are two entities and must count
    // twice, matching the BNLJ form (review r6: a title-level distinct
    // undercounted exactly the most-ambiguous names)
    val kbTwo = Seq("apache spark", "apache spark").toDF("kbName")
    assert(math.abs(amb(KbLink.nameAmbiguityTokenized(mentions, kbTwo))("apache spark")
      - math.log(3.0)) < 1e-12)
    assert(math.abs(amb(KbLink.nameAmbiguity(mentions, kbTwo))("apache spark")
      - math.log(3.0)) < 1e-12)
  }
}
