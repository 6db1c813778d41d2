package graft

import graft.operators._
import graft.sources.SynthCorpus
import org.apache.spark.sql.functions._

/** Degenerate inputs: every operator must return a sane empty/identity
  * result on empty frames instead of NPE-ing inside a driver-side
  * `.head().getX` on a null aggregate — the failure mode of a scheduled
  * production job whose upstream filter matched nothing that day.
  */
class DegenerateInputSpec extends SparkSpec {
  import spark.implicits._

  private val emptyDocs = Seq.empty[(String, String)].toDF("id", "text")

  test("dedup family on empty input returns empty, not an error") {
    assert(Dedup.exact(emptyDocs, "id", "text").isEmpty)
    assert(Dedup.minhashLsh(emptyDocs, "id", "text").isEmpty)
    assert(Dedup.simhash(emptyDocs, "id", "text").isEmpty)
    val ng = Dedup.ngramJaccard(
      Seq.empty[(String, String, String)].toDF("id", "block", "text"),
      "id", "text", "block")
    assert(ng.pairs.isEmpty && ng.overflow.isEmpty)
    assert(Dedup.embeddingCosine(
      Seq.empty[(String, Seq[Double])].toDF("id", "vec"), "id", "vec").isEmpty)
  }

  test("KbEtl on empty / entity-free / null dumps returns empty or empty intros") {
    val empty = Seq.empty[String].toDF("xml")
    assert(graft.sources.KbEtl.fromDump(empty).isEmpty)
    val noEntities = Seq("just some text with no entity markup at all").toDF("xml")
    assert(graft.sources.KbEtl.fromDump(noEntities).isEmpty)
    val nullXml = Seq[(Integer, String)]((1, null)).toDF("k", "xml").select($"xml")
    assert(graft.sources.KbEtl.fromDump(nullXml).isEmpty)
    assert(Seq[(Integer, String)]((1, null)).toDF("k", "t")
      .select(graft.sources.KbEtl.firstParagraph($"t")).as[String].head() == "")
  }

  test("ivfTopK on an empty corpus returns empty, not NoSuchElementException") {
    val emptyVecs = Seq.empty[(String, Seq[Double])].toDF("id", "vec")
    val probes = Seq(("p1", Seq(1.0, 0.0))).toDF("id", "vec")
    val got = SimilaritySearch.ivfTopK(emptyVecs, probes, "id", "vec", 5)
    assert(got.isEmpty)
    assert(got.columns.toSeq == Seq("qid", "id", "cos", "rank"))
  }

  test("categoryCounts on empty frames returns an empty count table") {
    val sys = Seq.empty[(String, String)].toDF("mentionId", "clusterId")
    val gold = Seq.empty[(String, String)].toDF("id", "gold")
    assert(Reports.categoryCounts(sys, gold).isEmpty)
  }

  test("null/empty/punctuation-only text: singletons in every near-dup op, never merged") {
    // content-free rule (review r5): docs with no alphanumeric tokens all
    // share the degenerate signature (hash-of-"" shingle / identity
    // simhash) and previously merged into one giant group — they carry no
    // similarity signal, so they must come out as SINGLETONS; byte-equal
    // empty text is exact-dedup's job
    val df = Seq(("a", "real content words here"), ("b", null), ("c", null),
      ("d", "!!! ??? ..."), ("e", ""))
      .toDF("id", "text")
    val got = Dedup.minhashLsh(df, "id", "text").as[(String, String)].collect().toMap
    assert(got.keySet == Set("a", "b", "c", "d", "e"), "all docs must be assigned")
    assert(got.forall { case (id, g) => g == id }, s"no merges expected: $got")
    val sh = Dedup.simhash(df, "id", "text").as[(String, String)].collect().toMap
    assert(sh.keySet == got.keySet)
    assert(sh.forall { case (id, g) => g == id }, s"no merges expected: $sh")
    val ta = TextAnalysis.analyze(df, "text")
    assert(ta.count() == 5)
  }

  test("NaN-component embeddings: never a near-dup, never a top-k winner (review r5)") {
    // NaN > 0 is TRUE under Spark's NaN ordering, so a norm-positivity
    // guard alone waves NaN-poisoned vectors through — this pins the
    // !isnan / nanvl layer
    val vecs = Seq(
      ("nan1", Seq(Double.NaN, 1.0, 0.5)),
      ("a1", Seq(1.0, 0.5, 0.25)),
      ("a2", Seq(1.0, 0.5, 0.25)),
      ("b1", Seq(0.1, 0.9, 0.4))).toDF("id", "v")
    val r = Dedup.embeddingCosineDetailed(vecs, "id", "v", threshold = 0.95)
    val groups = r.assignments.as[(String, String)].collect().toMap
    assert(groups("nan1") == "nan1", s"NaN vector must stay a singleton: $groups")
    assert(groups("a1") == groups("a2"))
    assert(r.edges.where($"src" === "nan1" || $"dst" === "nan1").count() == 0)
    val top = SimilaritySearch.bruteForceTopK(
      vecs, vecs.where($"id" === "a1"), "id", "v", k = 3)
      .orderBy($"rank").as[(String, String, Double, Int)].collect()
    assert(top.head._2 == "a2", s"real neighbor must rank 1: ${top.toSeq}")
    assert(top.find(_._2 == "nan1").forall(t => t._3 == -1.0 && t._4 == 3),
      s"NaN vector must score the floor and rank last: ${top.toSeq}")
  }

  test("connected components on empty graphs") {
    val noNodes = Seq.empty[String].toDF("id")
    val noEdges = Seq.empty[(String, String)].toDF("src", "dst")
    assert(ConnectedComponents.run(noNodes, noEdges).isEmpty)
    // nodes without edges: all self-components
    val got = ConnectedComponents.run(Seq("a", "b").toDF("id"), noEdges)
      .as[(String, String)].collect().toMap
    assert(got == Map("a" -> "a", "b" -> "b"))
  }

  test("evaluation on empty frames yields zero scores, not NPE") {
    val sys = Seq.empty[(String, String)].toDF("mentionId", "clusterId")
    val gold = Seq.empty[(String, String)].toDF("id", "gold")
    val b3 = Evaluation.b3(sys, gold)
    assert(b3.precision == 0.0 && b3.recall == 0.0 && b3.f1 == 0.0)
    val pw = Evaluation.pairwiseF1(
      Seq.empty[(String, String)].toDF("leftId", "rightId"), sys, gold)
    // both metrics agree on empty input: zero, never vacuous perfection
    assert(pw.precision == 0.0 && pw.recall == 0.0 && pw.f1 == 0.0)
  }

  test("prCurve and threshold finder on empty scored frames") {
    val scored = Seq.empty[(String, String, Double, Boolean)]
      .toDF("leftId", "rightId", "score", "label")
    assert(Reports.prCurve(scored).isEmpty)
    val labeled = Seq.empty[(String, Double, Boolean, Int)]
      .toDF("id", "score", "label", "fold")
    assert(Reports.bestThreshold(labeled).isEmpty)
  }

  test("full pipeline on an empty corpus: empty decisions, no crash") {
    val files = SynthCorpus.corpus(spark, families = 1, variants = 1)
      .where(lit(false))
    val r = Pipeline.run(spark, files, SynthCorpus.aliasDict)
    assert(r.decisions.isEmpty && r.scored.isEmpty && r.components.isEmpty)
    r.mentions.unpersist(); r.scored.unpersist(); r.components.unpersist()
  }

  test("KbLink on empty mentions / empty KB") {
    val kb = Seq(("E1", "x", Seq.empty[String])).toDF("kbId", "kbName", "aliases")
    val noMentions = Seq.empty[(String, String)].toDF("id", "entityString")
      .withColumn("names", array().cast("array<string>"))
      .withColumn("abbrs", array().cast("array<string>"))
    assert(KbLink.link(noMentions, kb).isEmpty)
    val mentions = Seq(("m1", "x")).toDF("id", "entityString")
      .withColumn("names", array($"entityString"))
      .withColumn("abbrs", array($"entityString"))
    val noKb = Seq.empty[(String, String, Seq[String])].toDF("kbId", "kbName", "aliases")
    assert(KbLink.link(mentions, noKb).isEmpty)
    // calibrated preset on the same degenerate frames: the nameAmbiguity
    // subplan must tolerate empty sides too
    assert(KbLink.link(noMentions, kb, KbWeights.calibrated).isEmpty)
    assert(KbLink.link(mentions, noKb, KbWeights.calibrated).isEmpty)
  }

  test("query-XML reader on empty / query-free documents") {
    val p0 = graft.sources.QueryXml.parseString("<kbpentlink/>")
    assert(p0.rows.isEmpty && p0.malformed == 0)
    // not XML at all -> loud parse error, not a silent empty result
    intercept[Exception] { graft.sources.QueryXml.parseString("") }
    intercept[Exception] { graft.sources.QueryXml.parseString("garbage") }
  }

  test("human-readable sink on empty decisions writes an empty file set, no crash") {
    val decisions = Seq.empty[(String, String, Double)]
      .toDF("mentionId", "clusterId", "confidence")
    val mentions = Seq.empty[(String, String, String)]
      .toDF("id", "name", "entityString")
    val kb = Seq.empty[(String, String)].toDF("kbId", "kbName")
    val dir = java.nio.file.Files.createTempDirectory("graft_hr_empty").toFile
    try {
      val out = new java.io.File(dir, "hr").getPath
      Reports.writeHumanReadableTsv(decisions, mentions, kb, out)
      val lines = new java.io.File(out).listFiles()
        .filter(_.getName.startsWith("part-"))
        .flatMap(f => scala.io.Source.fromFile(f).getLines().toSeq)
      assert(lines.isEmpty)
    } finally new scala.reflect.io.Directory(dir).deleteRecursively()
  }
}
