package graft

import graft.operators._
import graft.sources.SynthCorpus
import org.apache.spark.sql.functions._

class ScoringSpec extends SparkSpec {
  import spark.implicits._

  test("calibration: dormant F12 features refit on synth KB candidates (info report, no gate)") {
    // VERDICT r3 #9: feed the dormant feature set + nameAmbiguity into a
    // refit on the synthetic corpus and REPORT which features earn weight —
    // turning the parity surface into measured signal. Info-level only.
    val conf = GraftConf()
    val files = SynthCorpus.corpus(spark)
    val mentions = Mentions.prepare(spark, files, SynthCorpus.aliasDict, conf).cache()
    val kb = SynthCorpus.kb(spark)
    // prefixLen=1 for candidate generation only: the default keys are so
    // discriminative on the synthetic corpus that every candidate is the
    // gold entity — 1-char prefixes add cross-family candidates so the
    // refit sees NEGATIVES too
    val cand = KbLink.candidates(mentions, kb, conf.copy(prefixLen = 1))
      .join(mentions.select($"id", $"name", $"entityString"), "id")
      .join(kb.select($"kbId", $"kbName"), "kbId")
    val amb = KbLink.nameAmbiguity(
      mentions.select($"entityString"), kb.select($"kbName"))
    val featCols = Seq("originalNameMatch", "fullNameMatch", "fullNameFound",
      "fullNameLength", "originalNameLength", "nameLength", "nameAmbiguity")
    val labeled = KbLink.dormantFeatures(cand, Some(amb))
      .join(SynthCorpus.goldKb(spark), Seq("id"))
      .withColumn("label", $"kbId" === $"goldKbId")
    val rows = Reports.deterministicSample(labeled, Seq("id", "kbId"), 3000)
      .select(featCols.map(c => col(c).cast("double")) :+
        $"label".cast("double").as("y"): _*)
      .collect()
    val ex = rows.map(r => LogisticTrainer.Example(
      Array.tabulate(featCols.size)(i => r.getDouble(i)),
      r.getDouble(featCols.size))).toSeq
    assert(ex.nonEmpty && ex.exists(_.label == 1.0) && ex.exists(_.label == 0.0))
    val w = LogisticTrainer.fit(ex)
    assert(w.forall(x => !x.isNaN && !x.isInfinite), "refit must stay finite")
    val report = featCols.zipWithIndex
      .map { case (c, i) => f"$c=${w(i + 1)}%.3f" }.mkString(", ")
    info(f"dormant-feature refit on ${ex.size} candidates: bias=${w(0)}%.3f, $report")
    val earning = featCols.zipWithIndex
      .filter { case (_, i) => math.abs(w(i + 1)) > 0.1 }.map(_._1)
    info(s"dormant features earning |w|>0.1: " +
      (if (earning.isEmpty) "none" else earning.mkString(", ")))
    mentions.unpersist()
  }

  test("logistic trainer separates synthetic labeled pairs; refit weights hit the F1 gate") {
    // labeled pairs from the synthetic corpus (reference caps at 3000,
    // MentionPairTrainingData.scala:45-53)
    val files = SynthCorpus.corpus(spark, families = 10, variants = 6)
    val gold = SynthCorpus.gold(spark, families = 10, variants = 6)
    val conf = GraftConf()
    val mentions = Mentions.prepare(spark, files, SynthCorpus.aliasDict, conf).cache()
    val pairs = Blocking.candidatePairs(Blocking(mentions, conf).blocks)
    val feats = Scoring.score(pairs, mentions, PairWeights.default, conf)
      .join(gold.select($"id".as("leftId"), $"gold".as("lg")), "leftId")
      .join(gold.select($"id".as("rightId"), $"gold".as("rg")), "rightId")
      .withColumn("label", $"lg" === $"rg")
      .limit(3000).collect()

    val examples = feats.map { r =>
      LogisticTrainer.Example(
        Array(r.getAs[Double]("jw"), r.getAs[Double]("lev"), r.getAs[Double]("cosine"),
          if (r.getAs[Boolean]("namesOverlap")) 1.0 else 0.0,
          if (r.getAs[Boolean]("prefix")) 1.0 else 0.0,
          if (r.getAs[Boolean]("abbrMatch")) 1.0 else 0.0),
        if (r.getAs[Boolean]("label")) 1.0 else 0.0)
    }.toSeq
    val w = LogisticTrainer.fit(examples)
    // trained model must separate at the reference threshold 0.93
    def p(e: LogisticTrainer.Example): Double = {
      val z = w(0) + e.features.zipWithIndex.map { case (f, i) => f * w(i + 1) }.sum
      1.0 / (1.0 + math.exp(-z))
    }
    val (pos, neg) = examples.partition(_.label == 1.0)
    val tp = pos.count(p(_) > 0.93).toDouble
    val fp = neg.count(p(_) > 0.93).toDouble
    val prec = if (tp + fp == 0) 1.0 else tp / (tp + fp)
    val rec = tp / pos.size
    val f1 = 2 * prec * rec / (prec + rec)
    info(s"refit LR: P=$prec R=$rec F1=$f1 weights=${w.toSeq}")
    assert(f1 >= 0.99, s"refit logistic F1 $f1 below gate")
  }

  test("KB-anchored components keep the KB id (C2/C3 precedence)") {
    val components = Seq(
      ("m1", "m1"), ("m2", "m1"), // component m1 anchored via m2
      ("m3", "m3")) // pure NIL
      .toDF("id", "component")
    val accepted = Seq(("m1", "m2", 0.99)).toDF("leftId", "rightId", "score")
    val kb = Seq(("m2", "E0042")).toDF("id", "kbId")
    val got = Decisions.assemble(components, accepted, Some(kb), 0.93)
      .select($"mentionId", $"clusterId").as[(String, String)].collect().toMap
    assert(got("m1") == "E0042" && got("m2") == "E0042")
    assert(got("m3") == "NIL:m3")
  }

  test("title-fallback anchor confidence floors the decision at 0.8") {
    // exact-title link whose classifier score is BELOW threshold: the
    // reference emits it at fixed confidence 0.8 (kbTitleToIdMap path);
    // without the kbConfidence floor the F11 map would collapse it to 0.55
    val components = Seq(("m1", "m1")).toDF("id", "component")
    val accepted = Seq.empty[(String, String, Double)]
      .toDF("leftId", "rightId", "score")
    val kb = Seq(("m1", "E0042", 0.5, 0.8))
      .toDF("id", "kbId", "kbScore", "kbConfidence")
    val got = Decisions.assemble(components, accepted, Some(kb), 0.93)
      .as[(String, String, Double)].head()
    assert(got == (("m1", "E0042", 0.8)))
  }

  test("blocking skew guard: oversized blocks dropped with overflow metrics") {
    val conf = GraftConf(maxBlockSize = 3)
    val rows = (0 until 10).map(i => (s"id$i", Seq("hot", s"cold$i"))) // "hot" block size 10 > 3
    val df = rows.toDF("id", "blockKeys")
    val res = Blocking(df, conf)
    val overflowKeys = res.overflow.select($"key").as[String].collect().toSet
    assert(overflowKeys == Set("hot"))
    val keptKeys = res.blocks.select($"key").distinct().as[String].collect().toSet
    assert(!keptKeys.contains("hot") && keptKeys.size == 10)
  }

  test("F8 contains + F10 linkSim: features fire and feed the score") {
    val conf = GraftConf()
    val m = Seq(
      ("a", "kube", Seq("kube"), Seq("k"), Seq(1L), Seq(1.0)),
      ("b", "kubernetes", Seq("kubernetes"), Seq("k"), Seq(1L), Seq(1.0)),
      ("c", "zzz", Seq("zzz"), Seq("z"), Seq(9L), Seq(1.0)))
      .toDF("id", "entityString", "names", "abbrs", "vecH", "vecW")
    val ext = Seq(("a", "fb1"), ("a", "fb2"), ("b", "fb1"), ("b", "fb2"), ("c", "fb9"))
      .toDF("id", "fbid")
    val withExt = Extractions.withLinkVectors(m, ext)
    val pairs = Seq(("a", "b", "k"), ("a", "c", "k")).toDF("leftId", "rightId", "blockKey")
    val got = Scoring.score(pairs, withExt,
      PairWeights.default.copy(contains = 1.0, linkSim = 2.0), conf)
      .select($"rightId", $"containsF", $"linkSim")
      .as[(String, Boolean, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // "kubernetes" contains "kube" (not equal) -> F8 true; shared fbids -> linkSim 1
    assert(got("b")._1 && math.abs(got("b")._2 - 1.0) < 1e-12)
    assert(!got("c")._1 && math.abs(got("c")._2) < 1e-12)
    // default weights keep both features dormant: scores match the no-ext run
    val withW = Scoring.score(pairs, withExt, PairWeights.default, conf)
      .select($"rightId", $"score").as[(String, Double)].collect().toMap
    val withoutW = Scoring.score(pairs, m, PairWeights.default, conf)
      .select($"rightId", $"score").as[(String, Double)].collect().toMap
    assert(withW == withoutW)
  }

  test("argVectors: arg-text term vectors feed the same dot kernel (argSim)") {
    val ext = Seq(
      ("a", "Seattle Sounders FC"), ("a", "seattle stadium"),
      ("b", "Seattle Sounders"), ("c", "completely different args"))
      .toDF("id", "argText")
    val v = Extractions.argVectors(ext).cache()
    val l = v.select($"extId".as("li"), $"extH".as("lh"), $"extW".as("lw"))
    val r = v.select($"extId".as("ri"), $"extH".as("rh"), $"extW".as("rw"))
    val sims = l.join(r, $"li" < $"ri")
      .select($"li", $"ri", graft.functions.VecFunctions
        .sorted_vec_dot($"lh", $"lw", $"rh", $"rw").as("argSim"))
      .as[(String, String, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(sims(("a", "b")) > 0.7, s"shared arg terms => high argSim: ${sims(("a", "b"))}")
    assert(sims(("a", "c")) < 0.1 && sims(("b", "c")) < 0.1)
  }

  test("G5 cluster-pair similarity: mean pair score per cluster pair") {
    val scored = Seq(
      ("a", "b", 0.9), ("a", "c", 0.5), ("b", "c", 0.7), ("a", "d", 0.1))
      .toDF("leftId", "rightId", "score")
    val comps = Seq(("a", "X"), ("b", "X"), ("c", "Y"), ("d", "Y")).toDF("id", "component")
    val got = Scoring.clusterPairSimilarity(scored, comps)
      .as[(String, String, Double, Long)].collect()
    // cross-cluster pairs: (a,c)=.5, (b,c)=.7, (a,d)=.1 -> avg 1.3/3; (a,b) intra
    assert(got.length == 1)
    val (c1, c2, avgS, n) = got.head
    assert(c1 == "X" && c2 == "Y" && n == 3L && math.abs(avgS - (1.3 / 3)) < 1e-12)
  }

  test("F3 wide context: cosine becomes the mean of std and wide window sims") {
    val conf = GraftConf(wideContext = true)
    val files = Seq(
      // same family content, DIFFERENT repo/path identifiers -> stdSim 1,
      // wideSim < 1 -> averaged cosine strictly between
      graft.model.RepoFile("orga/kubernetes", "src/a.scala", "c1", "scala", "alpha beta gamma"),
      graft.model.RepoFile("orgb/kubernetes", "lib/b.go", "c2", "go", "alpha beta gamma"))
      .toDF()
    val m = Mentions.prepare(spark, files, Map.empty, conf)
    assert(m.columns.contains("wideVecH"))
    val pairs = {
      val ids = m.select($"id").as[String].collect().sorted
      Seq((ids(0), ids(1), "k")).toDF("leftId", "rightId", "blockKey")
    }
    val got = Scoring.score(pairs, m, PairWeights.default, conf)
      .select($"cosine").as[Double].head()
    // std = 1.0 exactly; wide windows share some tokens (kubernetes, src-ish)
    // but not all -> 0 < wide < 1 -> 0.5 < mean < 1
    assert(got > 0.5 && got < 1.0, s"averaged context sim $got")
  }

  test("pair features: symmetric inputs give jw=lev=cos=1 and score above threshold") {
    val conf = GraftConf()
    val m = Seq(
      ("a", "kubernetes", Seq("kubernetes"), Seq("k"), Seq(1L, 2L), Seq(0.6, 0.8)),
      ("b", "kubernetes", Seq("kubernetes"), Seq("k"), Seq(1L, 2L), Seq(0.6, 0.8)),
      ("c", "postgres", Seq("postgres"), Seq("p"), Seq(9L), Seq(1.0)))
      .toDF("id", "entityString", "names", "abbrs", "vecH", "vecW")
    val pairs = Seq(("a", "b", "k1"), ("a", "c", "k1")).toDF("leftId", "rightId", "blockKey")
    val got = Scoring.score(pairs, m, PairWeights.default, conf)
      .select($"rightId", $"jw", $"lev", $"cosine", $"score")
      .as[(String, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val same = got("b")
    assert(same._2 == 1.0 && same._3 == 1.0 && math.abs(same._4 - 1.0) < 1e-12)
    assert(same._5 > 0.93)
    assert(got("c")._5 < 0.93)
  }

  test("F6 sameCommonSurname: fires only when both sides carry a common name AND names overlap") {
    val m = Seq(
      ("a", "smith", Seq("smith"), Seq("s"), Seq(1L), Seq(1.0)),
      ("b", "smith", Seq("smith"), Seq("s"), Seq(1L), Seq(1.0)),
      ("c", "zhu", Seq("zhu"), Seq("z"), Seq(1L), Seq(1.0)),
      ("d", "smith jones", Seq("smith", "jones"), Seq("sj"), Seq(1L), Seq(1.0)))
      .toDF("id", "entityString", "names", "abbrs", "vecH", "vecW")
    val pairs = Seq(("a", "b", "k"), ("a", "c", "k"), ("a", "d", "k"))
      .toDF("leftId", "rightId", "blockKey")
    val conf = GraftConf(commonNames = Seq("smith", "johnson"))
    val got = Scoring.score(pairs, m, PairWeights.default, conf)
      .select($"rightId", $"sameSurname").as[(String, Boolean)].collect().toMap
    assert(got("b"), "smith-smith overlap of a common name must fire")
    assert(!got("c"), "no overlap, right side not common")
    assert(got("d"), "overlap via the shared common token fires")
    // reference quirk pinned: conjuncts are independent — sides overlapping
    // only on a DISCRIMINATING name still fire when each carries some
    // (different) common token (MentionPairFeatures.scala:35,67)
    val m2 = Seq(
      ("p", "smith", Seq("smith", "acmecorp"), Seq("s"), Seq(1L), Seq(1.0)),
      ("q", "johnson", Seq("johnson", "acmecorp"), Seq("j"), Seq(1L), Seq(1.0)))
      .toDF("id", "entityString", "names", "abbrs", "vecH", "vecW")
    val quirk = Scoring.score(Seq(("p", "q", "k")).toDF("leftId", "rightId", "blockKey"),
        m2, PairWeights.default, conf)
      .select($"sameSurname").as[Boolean].head()
    assert(quirk, "independent-conjunct reference semantics")
    // empty list (default conf): constant false
    val off = Scoring.score(pairs, m, PairWeights.default, GraftConf())
      .select($"sameSurname").as[Boolean].collect()
    assert(off.forall(!_))
  }

  test("bestThresholdRefit: per-fold refit is deterministic and tracks the training data (G11 full)") {
    // separable labeled data: label = (f1 > 0.5); two explicit folds
    def labeled(flipFold: Option[Int]): org.apache.spark.sql.DataFrame = {
      val rows = (0 until 200).map { i =>
        val f1 = (i % 100) / 100.0
        val fold = i / 100
        val raw = f1 > 0.5
        val label = if (flipFold.contains(fold)) !raw else raw
        (s"x$i", label, f1, 1.0 - f1, fold)
      }
      rows.toDF("id", "label", "f1", "f2", "fold")
    }
    val base = Reports.bestThresholdRefit(labeled(None), Seq("f1", "f2"), folds = 2)
      .orderBy($"fold").as[(Int, Double, Double)].collect().toSeq
    assert(base.length == 2)
    // separable data: every fold's refit weights rank it perfectly => F1 = 1
    assert(base.forall(_._3 == 1.0), s"expected perfect per-fold F1: $base")
    assert(base.forall(r => r._2 > 0.0 && r._2 < 1.0))
    // determinism (driver fit is seeded by the deterministic sample)
    val again = Reports.bestThresholdRefit(labeled(None), Seq("f1", "f2"), folds = 2)
      .orderBy($"fold").as[(Int, Double, Double)].collect().toSeq
    assert(base == again)
    // REFIT semantics: inverting fold-1's labels retrains fold-0's weights on
    // inverted data, so fold 0's threshold/F1 must move (fixed weights would
    // leave fold 0 untouched — the r2 bestThreshold behavior)
    val flipped = Reports.bestThresholdRefit(labeled(Some(1)), Seq("f1", "f2"), folds = 2)
      .orderBy($"fold").as[(Int, Double, Double)].collect().toSeq
    assert(flipped.head != base.head,
      s"fold-0 threshold must track its (fold-1) training data: $flipped vs $base")
  }
}
