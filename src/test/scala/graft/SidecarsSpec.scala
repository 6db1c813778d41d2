package graft

import graft.operators._
import graft.sources.Sidecars
import org.apache.spark.sql.functions._

/** S6 external sidecar ingestion + the operators that consume it (A7
  * linker-score dispatcher) and the F12 nameAmbiguity precomputed aggregate.
  */
class SidecarsSpec extends SparkSpec {
  import spark.implicits._

  test("sidecar joins: coref mentions and NER struct with reference defaults on misses") {
    val mentions = Seq(("q1", "acme"), ("q2", "globex")).toDF("id", "name")
    val coref = Seq(("q1", Seq("acme corp", "the company"))).toDF("id", "mentions")
    val ner = Seq(("q1", "ORGANIZATION", Seq("acme"), Seq("acme corp"),
      Seq.empty[String], Seq.empty[String]))
      .toDF("id", "qType", "matching", "orgs", "locs", "people")

    val got = Sidecars.withNamedEntities(
      Sidecars.withCorefMentions(mentions, coref), ner)
    val byId = got.collect().map(r => r.getAs[String]("id") -> r).toMap

    assert(byId("q1").getAs[scala.collection.Seq[String]]("corefMentions") == Seq("acme corp", "the company"))
    assert(byId("q2").getAs[scala.collection.Seq[String]]("corefMentions") == Seq.empty)
    val ner1 = byId("q1").getAs[org.apache.spark.sql.Row]("ner")
    assert(ner1.getAs[String]("qType") == "ORGANIZATION")
    assert(ner1.getAs[scala.collection.Seq[String]]("orgs") == Seq("acme corp"))
    val ner2 = byId("q2").getAs[org.apache.spark.sql.Row]("ner")
    assert(ner2.getAs[String]("qType") == "None", "missing sidecar row defaults to None")
    assert(ner2.getAs[scala.collection.Seq[String]]("people") == Seq.empty)
  }

  test("gold .tab reader: cols 0-1, confidence forced 0.0, malformed counted (S7 parity)") {
    val p = Sidecars.parseGoldTab(Seq(
      "q1\tE000001\t0.87",   // extra cols ignored, conf FORCED to 0.0
      "q2\tNIL0001",
      "justonecolumn",       // malformed: skipped + counted, not thrown
      "",                    // blank: ignored entirely
      "q3\tE000002"))
    assert(p.rows == Seq(("q1", "E000001", 0.0), ("q2", "NIL0001", 0.0),
      ("q3", "E000002", 0.0)))
    assert(p.malformed == 1)
  }

  test("link-training CSV reader: label trimmed vs CORRECT, malformed counted (G1 parity)") {
    val p = Sidecars.parseLinkTrainingCsv(Seq(
      " CORRECT \tq1\tAcme Corp\tAcme Corporation\textra",
      "WRONG\tq2\tGlobex\tGlobex Corp",
      "CORRECT\tq3",         // too short: the reference's stderr path
      "incorrect\tq4\tInitech\tInitech Inc"))
    assert(p.rows == Seq(
      (true, "q1", "Acme Corp", "Acme Corporation"),
      (false, "q2", "Globex", "Globex Corp"),
      (false, "q4", "Initech", "Initech Inc")))
    assert(p.malformed == 1)
  }

  test("reference text formats parse (tab line + 4-line groups)") {
    val coref = Sidecars.parseCorefMentions(Seq(
      "q1\tacme corp\tthe company", "q2\tglobex inc"))
    assert(coref == Seq(("q1", Seq("acme corp", "the company")),
      ("q2", Seq("globex inc"))))

    val ner = Sidecars.parseNamedEntities(Seq(
      "q1\tORGANIZATION\tacme",       // qId, qType, matching...
      "q1\tORG\tacme corp\tacme inc", // orgs (first two fields dropped)
      "q1\tLOC",                      // locs: none
      "q1\tPER\tjane doe",            // people
      "q2"))                          // trailing partial group: COUNTED
    assert(ner.rows == Seq(("q1", "ORGANIZATION", Seq("acme"),
      Seq("acme corp", "acme inc"), Seq.empty, Seq("jane doe"))))
    assert(ner.malformed == 1, "a truncated trailing group must be tallied, not silent")
  }

  test("A7 dispatcher: best-scoring coref candidate wins; no-candidate falls back to name") {
    val kb = Seq(
      ("E1", "kubernetes", Seq("k8s")),
      ("E2", "tensorflow", Seq.empty[String]))
      .toDF("kbId", "kbName", "aliases")
    val mentions = Seq(
      // name misses the KB, a coref mention is an exact title -> it wins
      ("m1", "kuberntes-fork", Seq("kubernetes", "that cluster thing")),
      // name itself is the best candidate
      ("m2", "tensorflow", Seq("some lib")),
      // nothing reaches the KB -> fallback to name
      ("m3", "zzz-unknown", Seq("yyy-nothing")))
      .toDF("id", "name", "corefMentions")
    val got = KbLink.bestEntityStringByLinkerScore(mentions, kb)
      .select($"id", $"bestEntityString").as[(String, String)].collect().toMap
    assert(got("m1") == "kubernetes")
    assert(got("m2") == "tensorflow")
    assert(got("m3") == "zzz-unknown")
  }

  test("F15 locationCasing: dotted abbreviations untouched, everything else Word-cased") {
    val got = Seq("new YORK city", "u.s. VIRGIN islands", "TEXAS")
      .toDF("s").select(Aliases.locationCasing($"s")).as[String].collect().toSeq
    assert(got == Seq("New York City", "u.s. Virgin Islands", "Texas"))
  }

  test("A6 searchCoreferences: entity inside a short coref span, longer than name, comma-free, shortest") {
    val doc = "report from the acme corporation of america yesterday; " +
      "acme ltd was mentioned too, and the acme corporation responded."
    def iv(s: Int, e: Int) = (s, e)
    val rows = Seq(
      // "acme corporation" occurs inside the [10,60] coref span (size 50? ->
      // must be < 50: use [12,55]); candidates: shortest qualifying wins
      ("q1", "acme", doc, Seq("acme corporation of america", "acme corporation", "zzz"),
        Seq(iv(10, 55))),
      // span too long (>= 50 chars) disqualifies everything -> name
      ("q2", "acme", doc, Seq("acme corporation"), Seq(iv(0, 120))),
      // " in " rewrite gains a comma -> excluded (reference quirk) -> name
      ("q3", "acme", "the acme in america group said so",
        Seq("acme in america"), Seq(iv(0, 40))),
      // candidate must contain the name (caller gate) -> name
      ("q4", "globex", doc, Seq("acme corporation"), Seq(iv(10, 55))))
      .toDF("id", "name", "doc", "nes", "ivs")
      .withColumn("intervals", transform($"ivs",
        x => struct(x.getField("_1").as("start"), x.getField("_2").as("end"))))
    val got = rows.select($"id",
        Aliases.searchCoreferences($"doc", $"name", $"nes", $"intervals").as("r"))
      .as[(String, String)].collect().toMap
    assert(got("q1") == "acme corporation")
    assert(got("q2") == "acme")
    assert(got("q3") == "acme")
    assert(got("q4") == "globex")
  }

  test("F12 dormant feature set: every column matches the reference's hand arithmetic") {
    val kbAmb = Seq("E1" -> "acme corp").toDF("kbId", "kbName")
    val cands = Seq(
      ("q1", "acme", "acme corp", "acme corp", "engdoc1",
        100L, Seq("acme corp of america"), Seq("acme"), Seq("acme", "road runner")),
      ("q2", "globex", "globex", "initech", "xmldoc9",
        1L, Seq.empty[String], Seq("globex"), Seq.empty[String]))
      .toDF("id", "name", "entityString", "kbName", "doc",
        "inlinks", "corefMentions", "nerMatching", "kbNamedEntities")
    val amb = KbLink.nameAmbiguity(
      Seq("a" -> "acme", "b" -> "globex").toDF("id", "entityString"), kbAmb)
    val got = KbLink.dormantFeatures(cands, Some(amb)).collect()
      .map(r => r.getAs[String]("id") -> r).toMap

    val q1 = got("q1")
    assert(q1.getAs[Double]("originalNameMatch") == 0.0)  // name != kbName
    assert(q1.getAs[Double]("fullNameMatch") == 1.0)      // entityString == kbName
    assert(q1.getAs[Double]("fullNameFound") == 1.0)      // name != entityString
    assert(q1.getAs[Double]("docType") == 0.0)            // eng* doc
    assert(q1.getAs[Double]("fullNameLength") == 2.0)
    assert(q1.getAs[Double]("originalNameLength") == 1.0)
    assert(q1.getAs[Double]("nameLength") == 2.0)
    assert(q1.getAs[Double]("inlinkScore") == math.log(100.0))
    assert(q1.getAs[Double]("corefContextLength") == 4.0) // words in coref context
    assert(q1.getAs[Double]("namedEntityOverlap") == 1.0)
    assert(math.abs(q1.getAs[Double]("nameAmbiguity") - math.log(2.0)) < 1e-12)

    val q2 = got("q2")
    assert(q2.getAs[Double]("fullNameMatch") == 0.0)
    assert(q2.getAs[Double]("fullNameFound") == 0.0)
    assert(q2.getAs[Double]("docType") == 1.0)
    assert(q2.getAs[Double]("corefContextLength") == 0.0)
    assert(q2.getAs[Double]("namedEntityOverlap") == 0.0)
    assert(q2.getAs[Double]("nameAmbiguity") == 0.0)
  }

  test("F12 nameAmbiguity: per-name count of containing KB titles, one broadcast aggregate") {
    val kb = Seq("E1" -> "apache spark", "E2" -> "spark streaming", "E3" -> "flink")
      .toDF("kbId", "kbName")
    val mentions = Seq("a" -> "spark", "b" -> "flink", "c" -> "nothere")
      .toDF("id", "entityString")
    val got = KbLink.nameAmbiguity(mentions, kb)
      .as[(String, Double)].collect().toMap
    assert(math.abs(got("spark") - math.log(3.0)) < 1e-12)  // 2 titles contain it
    assert(math.abs(got("flink") - math.log(2.0)) < 1e-12)  // 1 title
    assert(got("nothere") == 0.0)                            // ln(1+0)
  }

  test("S1 query-XML reader: 2012/2013 shape, 2011 offsets fallback, dropped no-id queries") {
    val xml =
      """<?xml version="1.0"?>
        |<kbpentlink>
        |  <query id="EL_00001"><name>Acme Corp</name><docid>doc_1</docid><beg>100</beg><end>108</end></query>
        |  <query id="EL_00002"><name>Zed</name><docid>doc_2</docid></query>
        |  <query id="EL_00003"><name>Dup</name><name>licate</name><docid>doc_3</docid><beg>x</beg><end>5</end></query>
        |  <query><name>NoId</name><docid>doc_4</docid><beg>1</beg><end>2</end></query>
        |</kbpentlink>""".stripMargin
    val p = graft.sources.QueryXml.parseString(xml)
    assert(p.malformed == 1) // no-id query fails both reference parsers
    val byId = p.rows.map(q => q.queryId -> q).toMap
    assert(byId("EL_00001") ==
      graft.sources.QueryXml.Query("EL_00001", "Acme Corp", "doc_1", 100, 108))
    // missing beg/end -> the reference's 2011 fallback at offsets -1
    assert(byId("EL_00002") ==
      graft.sources.QueryXml.Query("EL_00002", "Zed", "doc_2", -1, -1))
    // duplicated <name> concatenates (scala-xml \\ semantics) and the
    // unparsable <beg> routes through the same 2011 fallback
    assert(byId("EL_00003") ==
      graft.sources.QueryXml.Query("EL_00003", "Duplicate", "doc_3", -1, -1))
    // DOCTYPE (XXE vector) is rejected outright
    intercept[org.xml.sax.SAXParseException] {
      graft.sources.QueryXml.parseString(
        "<!DOCTYPE foo [<!ENTITY x SYSTEM \"file:///etc/passwd\">]><kbpentlink/>")
    }
    // DataFrame surface
    val dir = java.nio.file.Files.createTempDirectory("graft_qxml").toFile
    try {
      val f = new java.io.File(dir, "queries.xml")
      java.nio.file.Files.write(f.toPath,
        xml.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val (df, dropped) = graft.sources.QueryXml.read(spark, f.getPath)
      assert(dropped == 1)
      assert(df.columns.toSeq ==
        Seq("queryId", "name", "docId", "begOffset", "endOffset"))
      assert(df.count() == 3)
    } finally new scala.reflect.io.Directory(dir).deleteRecursively()
  }
}
