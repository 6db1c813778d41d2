package graft

import graft.operators._
import graft.sources.SynthCorpus
import org.apache.spark.sql.functions._

/** End-to-end golden test (SURVEY.md §5c): deterministic synthetic corpus
  * with known gold clusters; gates pairwise F1 ≥ 0.99 at shared blocking
  * keys (BASELINE.json metric) and the per-row sha256(content) invariant.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val files = SynthCorpus.corpus(spark).cache()
  private lazy val gold = SynthCorpus.gold(spark).cache()
  private lazy val result =
    Pipeline.run(spark, files, SynthCorpus.aliasDict)

  test("sha256(content) invariant is stable (golden fixture)") {
    val hashes = files
      .select(concat($"repo", lit("/"), $"path").as("k"), sha2($"content", 256).as("h"))
      .orderBy($"k").as[(String, String)].collect()
    assert(hashes.length == 160)
    // corpus-level golden hash: any content drift changes this value
    val combined = java.security.MessageDigest.getInstance("SHA-256")
      .digest(hashes.map(_._2).mkString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val expectedFile = new java.io.File("src/test/resources/corpus_sha256.golden")
    if (!expectedFile.exists()) { // first run pins the fixture
      expectedFile.getParentFile.mkdirs()
      java.nio.file.Files.writeString(expectedFile.toPath, combined)
    }
    val expected = java.nio.file.Files.readString(expectedFile.toPath).trim
    assert(combined == expected, "synthetic corpus content drifted")
  }

  test("blocking recall: every gold pair shares >=1 blocking key") {
    val mentions = Mentions.withBlockKeys(
      Mentions.build(spark, files, SynthCorpus.aliasDict), GraftConf())
    val keys = mentions.select($"id", explode($"blockKeys").as("key"))
    val g = gold.select($"id", $"gold")
    val goldPairs = g.as("l").join(g.as("r"),
        $"l.gold" === $"r.gold" && $"l.id" < $"r.id")
      .select($"l.id".as("leftId"), $"r.id".as("rightId"))
    val sharing = keys.as("a").join(keys.as("b"),
        $"a.key" === $"b.key" && $"a.id" < $"b.id")
      .select($"a.id".as("leftId"), $"b.id".as("rightId")).distinct()
    val missed = goldPairs.join(sharing, Seq("leftId", "rightId"), "left_anti").count()
    val total = goldPairs.count()
    assert(total > 0)
    assert(missed.toDouble / total <= 0.01, s"blocking dropped $missed/$total gold pairs")
  }

  test("pairwise F1 >= 0.99 at shared blocking keys (BASELINE gate)") {
    val scores = Evaluation.pairwiseF1(
      result.pairs.select($"leftId", $"rightId"), result.decisions, gold)
    info(s"pairwise P=${scores.precision} R=${scores.recall} F1=${scores.f1}")
    assert(scores.f1 >= 0.99, s"pairwise F1 ${scores.f1} < 0.99")
  }

  test("B3 report (mirrors reference Benchmarker)") {
    val b3 = Evaluation.b3(result.decisions, gold)
    info(s"B3 P=${b3.precision} R=${b3.recall} F1=${b3.f1}")
    assert(b3.f1 >= 0.95)
  }

  test("decisions: every mention decided exactly once, confidence in [0.55,1]") {
    val d = result.decisions.cache()
    assert(d.count() == 160)
    assert(d.select($"mentionId").distinct().count() == 160)
    val bad = d.where($"confidence" < 0.55 || $"confidence" > 1.0).count()
    assert(bad == 0)
  }

  test("cluster ids are deterministic NIL ids derived from min mention id") {
    val d = result.decisions
    assert(d.where(!$"clusterId".startsWith("NIL:")).count() == 0)
    // representative member exists in its own cluster
    val roots = d.withColumn("root", expr("substring(clusterId, 5)"))
    val orphan = roots.groupBy($"clusterId", $"root")
      .agg(max(when($"mentionId" === $"root", 1).otherwise(0)).as("hasRoot"))
      .where($"hasRoot" === 0).count()
    assert(orphan == 0)
  }

  test("extraction side table feeds linkSim end-to-end (F10, driver-contract path)") {
    val r = Pipeline.run(spark, files, SynthCorpus.aliasDict,
      extractions = Some(SynthCorpus.extractions(spark)))
    // within-family pairs share family-correlated fbids -> linkSim must be
    // strictly positive on scored pairs whose sides share a block
    val withGold = r.scored
      .join(gold.select($"id".as("leftId"), $"gold".as("lg")), "leftId")
      .join(gold.select($"id".as("rightId"), $"gold".as("rg")), "rightId")
    val fam = withGold.where($"lg" === $"rg")
    assert(fam.count() > 0)
    val minFam = fam.agg(min($"linkSim")).head().getDouble(0)
    assert(minFam > 0.5, s"within-family linkSim should be high, min=$minFam")
    // cross-family pairs share only the fb:common noise id -> small, nonzero
    val cross = withGold.where($"lg" =!= $"rg")
    if (cross.count() > 0) {
      val maxCross = cross.agg(max($"linkSim")).head().getDouble(0)
      assert(maxCross < 0.5, s"cross-family linkSim should be small, max=$maxCross")
    }
    r.mentions.unpersist(); r.scored.unpersist(); r.components.unpersist()
  }

  test("arg-text side table feeds argSim end-to-end (F10 second half)") {
    val r = Pipeline.run(spark, files, SynthCorpus.aliasDict,
      extractions = Some(SynthCorpus.extractions(spark)),
      argExtractions = Some(SynthCorpus.argExtractions(spark)))
    assert(r.scored.columns.contains("argSim"))
    val withGold = r.scored
      .join(gold.select($"id".as("leftId"), $"gold".as("lg")), "leftId")
      .join(gold.select($"id".as("rightId"), $"gold".as("rg")), "rightId")
    val fam = withGold.where($"lg" === $"rg")
    assert(fam.count() > 0)
    // within a family, arg texts share canonical + family terms -> high
    val minFam = fam.agg(min($"argSim")).head().getDouble(0)
    assert(minFam > 0.5, s"within-family argSim should be high, min=$minFam")
    // across families only the common0 token overlaps -> small but nonzero
    val cross = withGold.where($"lg" =!= $"rg")
    if (cross.count() > 0) {
      val maxCross = cross.agg(max($"argSim")).head().getDouble(0)
      assert(maxCross < 0.5, s"cross-family argSim should be small, max=$maxCross")
      assert(maxCross > 0.0, "shared common token keeps cross-family argSim nonzero")
    }
    // decisions are unchanged while the argSim weight defaults to 0 — the
    // feature is parity surface until a refit assigns it weight
    val base = Pipeline.run(spark, files, SynthCorpus.aliasDict,
      extractions = Some(SynthCorpus.extractions(spark)))
    val a = r.decisions.orderBy($"mentionId").collect().toSeq
    val b = base.decisions.orderBy($"mentionId").collect().toSeq
    assert(a == b)
    Seq(r, base).foreach { x =>
      x.mentions.unpersist(); x.scored.unpersist(); x.components.unpersist()
    }
  }

  test("q_pipeline_planted matches the closed form (all four regimes)") {
    // independent reconstruction of the planted end-to-end oracle in Scala
    // (same arithmetic the DuckDB SQL performs — NOT engine output): family
    // regimes per p_partkey % 4, F11's floor-quantized confidence with
    // score σ(10) / 0.955 / 0, HALF_UP 6-decimal rounding like Spark round()
    val sf = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q_pipeline_planted")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val pks = spark.read.parquet(s"$sf/part.parquet")
      .select($"p_partkey".cast("long")).as[Long].collect().sorted
    val step = (100.0 - 80.0) / ((1.0 - 0.93) * 100.0)
    def conf(score: Double): Double =
      if (score > 0.93) (math.floor(score * 100.0 - 0.93 * 100.0) * step + 80.0) / 100.0
      else 0.55
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val cStar = r6(conf(1.0 / (1.0 + math.exp(-10.0))))
    val cAnchor = r6(conf(0.955))
    assert(cStar == 0.971429 && cAnchor == 0.857143) // pins the constants
    val expected = pks.flatMap { pk =>
      val name = f"q$pk%05d"
      val r = pk % 4
      val k = if (r == 1 || r == 3) 3 else 1
      val kbBase = f"E$pk%06d"
      (0 until k).map { i =>
        val id = s"org/$name/f$i@c0"
        val cluster = r match {
          case 0 => s"NIL:$id"
          case 1 => s"NIL:org/$name/f0@c0"
          case 2 => kbBase
          case _ => kbBase + "5"
        }
        val c = r match { case 0 => 0.55; case 2 => cAnchor; case _ => cStar }
        (id, cluster, c)
      }
    }
    assert(got.length == expected.length,
      s"row count ${got.length} != expected ${expected.length}")
    got.zip(expected).foreach { case (g, e) => assert(g == e, s"$g != $e") }
  }
}
