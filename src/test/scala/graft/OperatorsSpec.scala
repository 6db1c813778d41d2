package graft

import graft.operators.{Aliases, Blocking, Evaluation, Multimodal, Reports, TextAnalysis}
import org.apache.spark.sql.functions._

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("proximitySort: min positive distance before offset, hand-computed (A5)") {
    //           0     6    11    17    23
    val doc = "alpha beta gamma alpha delta"
    val df = Seq((doc, 17, Seq("beta", "alpha", "zeta"))).toDF("doc", "off", "cands")
    val got = df.select(
      Aliases.proximitySort($"doc", $"off", $"cands").as("sorted"),
      Aliases.minDistanceBefore($"doc", $"off", lit("beta")).as("dBeta"),
      Aliases.minDistanceBefore($"doc", $"off", lit("alpha")).as("dAlpha"),
      Aliases.minDistanceBefore($"doc", $"off", lit("zeta")).as("dZeta"))
      .as[(Seq[String], Long, Long, Long)].head()
    assert(got._2 == 11L) // beta@6, 17-6
    assert(got._3 == 17L) // alpha@0 (the @17 occurrence is NOT strictly before)
    assert(got._4 == doc.length.toLong) // absent -> doc length default
    assert(got._1 == Seq("beta", "alpha", "zeta"))
  }

  test("bestThreshold: max-F1 threshold per fold, hand-computed (G11)") {
    val scored = Seq(
      ("a", 0.9, true), ("b", 0.8, false), ("c", 0.7, true), ("d", 0.6, false))
      .toDF("id", "score", "label").withColumn("fold", lit(0))
    val got = Reports.bestThreshold(scored)
      .as[(Int, Double, Double)].head()
    // ranks: f1 = 2/3, 1/2, 4/5, 2/3 -> max at rank 3, score 0.7
    assert(got._1 == 0 && got._2 == 0.7 && math.abs(got._3 - 0.8) < 1e-12)
  }

  test("contextContainmentFilter admits pairs whose vocab contains the other's name (P4)") {
    val mentions = Seq(
      ("m1", Seq("acme"), Seq("the", "acmecorp")),
      ("m2", Seq("corp"), Seq("nothing")),
      ("m3", Seq("xyz"), Seq("zzz"))).toDF("id", "names", "vocab")
    val pairs = Seq(("m1", "m2"), ("m1", "m3"), ("m2", "m3")).toDF("leftId", "rightId")
    val got = Blocking.contextContainmentFilter(pairs, mentions)
      .as[(String, String)].collect().toSet
    // only (m1,m2): m1's vocab token "acmecorp" contains m2's name "corp"
    assert(got == Set(("m1", "m2")))
  }

  test("b3 link-type clause (b3Correct): wrong KB id zeroes the mention's term") {
    val sys = Seq(("m1", "E1"), ("m2", "E1"), ("m3", "NIL:a"), ("m4", "E2"))
      .toDF("mentionId", "clusterId")
    val gold = Seq(("m1", "E1"), ("m2", "E1"), ("m3", "NIL:x"), ("m4", "E9"))
      .toDF("id", "gold")
    val b3 = Evaluation.b3(sys, gold)
    // hand-computed (Benchmarker.scala:39-50): m4 links E2 but gold says E9 ->
    // its precision AND recall terms are 0; others are 1 -> P = R = 3/4
    assert(math.abs(b3.precision - 0.75) < 1e-12, s"P=${b3.precision}")
    assert(math.abs(b3.recall - 0.75) < 1e-12, s"R=${b3.recall}")
  }

  test("backoff strings: all containing sub-spans at least one word longer") {
    val df = Seq(("Smith", "the John Smith Band")).toDF("name", "es")
    val got = df.select(explode(Aliases.backoffStrings($"name", $"es")).as("b"))
      .as[String].collect().toSet
    // reference semantics (GeneralHelperMethods.scala:13-29): contiguous,
    // contains name, >= len(name)+1 words, not the full string
    assert(got == Set("John Smith", "Smith Band", "the John Smith",
      "John Smith Band"))
  }

  test("acronym expansion: initials spell the name; shortest wins") {
    val df = Seq(
      ("UW", Seq("University of Washington", "Underwater World Inc", "nothing")),
      ("IBM", Seq("International Business Machines", "irrelevant")),
      ("plain", Seq("plain old extended", "Xplainer")),
      ("none", Seq[String]())
    ).toDF("name", "cands")
    val got = df.select($"name", Aliases.bestExpansion($"name", $"cands").as("e"))
      .as[(String, String)].collect().toMap
    assert(got("UW") == "Underwater World Inc" || got("UW") == "University of Washington")
    assert(got("IBM") == "International Business Machines")
    // prefix extension, < 4 words (A4 rule); "Xplainer" neither starts nor ends with "plain"
    assert(got("plain") == "plain old extended")
    assert(got("none") == "none")
  }

  test("clusterNilsByAlias merges NIL decisions sharing an alias at conf 0.6") {
    val decisions = Seq(
      ("m1", "NIL:a", 0.9), ("m2", "NIL:b", 0.9), ("m3", "NIL:c", 0.9),
      ("m4", "KB001", 0.95), ("m5", "NIL:e", 0.9)).toDF("mentionId", "clusterId", "confidence")
    val aliases = Seq(("m1", "acme"), ("m2", "acme"), ("m2", "acme2"), ("m3", "zeta"),
      ("m4", "acme")).toDF("mentionId", "alias")
    val got = Aliases.clusterNilsByAlias(decisions, aliases)
      .as[(String, String, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.size == 5) // duplicate alias rows (m2) don't duplicate decisions
    assert(got("m1") == ("NIL:a", 0.6) && got("m2") == ("NIL:a", 0.6))
    // reference rewrites EVERY matched NIL to 0.6, singleton groups included
    // (RunKBPEntityLinkerSystem.scala:180-186)
    assert(got("m3") == ("NIL:c", 0.6))
    assert(got("m4") == ("KB001", 0.95)) // KB rows untouched
    assert(got("m5") == ("NIL:e", 0.9)) // no alias row -> passes through unchanged
  }

  test("langId picks the language with most marker hits") {
    val df = Seq(
      ("the cat is in the house and the dog"), // en
      ("el gato y la casa de los perros"), // es
      ("der hund und die katze ist nicht da"), // de
      ("xyzzy qwerty asdf")) // none
      .toDF("text").withColumn("lang", TextAnalysis.langId($"text"))
    val got = df.as[(String, String)].collect().map(_._2)
    assert(got(0) == "en" && got(1) == "es" && got(2) == "de" && got(3) == "und")
  }

  test("token counts: whitespace and BPE-ish regex") {
    val df = Seq("hello world, it's 42 degrees!").toDF("text")
      .select(TextAnalysis.tokenCountWs($"text").as("ws"),
        TextAnalysis.tokenCountBpe($"text").as("bpe"))
    val (ws, bpe) = df.as[(Long, Long)].head()
    assert(ws == 5)
    // hello|world|,|it|'|s|4|2|degrees|! = 10
    assert(bpe == 10)
  }

  test("fingerprint: stable, bounded, edit-local") {
    val base = (1 to 100).map(i => s"token$i").mkString(" ")
    val edited = base.replace("token50", "zzz")
    val df = Seq(("a", base), ("b", base), ("c", edited)).toDF("id", "text")
      .select($"id", TextAnalysis.fingerprint($"text").as("fp"))
    val got = df.as[(String, Seq[Long])].collect().toMap
    assert(got("a") == got("b"))
    val shared = got("a").toSet.intersect(got("c").toSet).size
    assert(shared >= got("a").size / 2, "one edit should keep most fingerprint strides")
    assert(got("a") != got("c"))
  }

  test("quality score in [0,1], degenerate text scores lower") {
    val df = Seq(
      ("good", "A well formed paragraph with reasonable words and variety here."),
      ("bad", "x x x x x x x x x x x x x x x x x x x x"))
      .toDF("id", "text")
      .select($"id", TextAnalysis.qualityScore($"text").as("q"))
    val got = df.as[(String, Double)].collect().toMap
    assert(got.values.forall(q => q >= 0.0 && q <= 1.0))
    assert(got("good") > got("bad"))
  }

  test("multimodal: batched feature extraction preserves ids, fixed dim") {
    val media = Multimodal.synth(spark, 32)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 32)
    assert(feats.forall(_.features.length == Multimodal.FakeCodec.FeatureDim))
    assert(feats.map(_.id).toSet == media.collect().map(_.id).toSet)
    // deterministic across runs
    val again = Multimodal.extractFeatures(media).collect()
      .map(f => f.id -> f.features.toSeq).toMap
    feats.foreach(f => assert(again(f.id) == f.features.toSeq))
  }

  test("multimodal: real WAV/PCM codec through the same batched seam (VERDICT r4 #9)") {
    // hand-built RIFF/WAVE, 16-bit stereo PCM: first half silence, second
    // half constant amplitude 8192 => mono segment RMS exactly 0.25
    def wav(frames: Int, channels: Int, amp: Short): Array[Byte] = {
      val dataLen = frames * channels * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
      bb.put("fmt ".getBytes); bb.putInt(16)
      bb.putShort(1); bb.putShort(channels.toShort); bb.putInt(16000)
      bb.putInt(16000 * channels * 2); bb.putShort((channels * 2).toShort)
      bb.putShort(16)
      bb.put("data".getBytes); bb.putInt(dataLen)
      (0 until frames).foreach { f =>
        val v: Short = if (f < frames / 2) 0 else amp
        (0 until channels).foreach(_ => bb.putShort(v))
      }
      bb.array()
    }
    val rows = spark.createDataset(Seq(Multimodal.MediaRow("w1",
      Multimodal.MediaMeta("audio", 0, 0, 16000, 100L), wav(1600, 2, 8192))))
    val got = Multimodal.extractFeatures(rows, Multimodal.WavPcmCodec)
      .collect().head
    assert(got.featureDim == 16 && got.features.length == 16)
    (0 until 8).foreach(i => assert(math.abs(got.features(i)) < 1e-6f,
      s"segment $i should be silent: ${got.features.toSeq}"))
    (8 until 16).foreach(i => assert(math.abs(got.features(i) - 0.25f) < 1e-4f,
      s"segment $i RMS should be 0.25: ${got.features.toSeq}"))
    // malformed payloads fail loudly, never a silent zero vector
    intercept[IllegalArgumentException] {
      Multimodal.WavPcmCodec.decodeAndExtract("not a wav at all".getBytes)
    }
    intercept[IllegalArgumentException] { // truncated data chunk overruns
      Multimodal.WavPcmCodec.decodeAndExtract(wav(100, 1, 100).take(50))
    }
  }

  test("multimodal: planted table features are closed-form (golden retirement r6)") {
    // audio rows: BIT-EXACT equality, no tolerance — the dyadic-arithmetic
    // argument in wavConstant's scaladoc is the thing under test here
    val feats = Multimodal.extractFeatures(
        Multimodal.synthPlanted(spark, 24).filter(_.meta.kind == "audio"),
        Multimodal.WavPcmCodec)
      .collect().map(f => f.id -> f.features).toMap
    assert(feats.size == 8)
    feats.foreach { case (id, fs) =>
      val i = id.drop(1).toInt
      val expected = (1 + i % 8) / 16.0f
      assert(fs.length == 16 && fs.forall(_ == expected),
        s"$id: want all-exact $expected, got ${fs.toSeq}")
    }
    // image/video rows: all 16 FakeCodec slots identical (same arithmetic)
    // and within summation noise of B/255
    val fake = Multimodal.extractFeatures(
        Multimodal.synthPlanted(spark, 24).filter(_.meta.kind != "audio"))
      .collect()
    assert(fake.length == 16)
    fake.foreach { f =>
      val i = f.id.drop(1).toInt
      val expected = 0.2f * (1 + i % 5)
      assert(f.features.distinct.length == 1, s"${f.id}: slots differ")
      assert(math.abs(f.features(0) - expected) < 1e-5f,
        s"${f.id}: want ~$expected, got ${f.features(0)}")
    }
  }

  test("multimodal: frame-sample plan from metadata only") {
    val media = Multimodal.synth(spark, 9).toDF()
    val plan = Multimodal.frameSamplePlan(media, everyMs = 500)
    import org.apache.spark.sql.Row
    val byId = plan.collect().groupBy(_.getString(0))
    assert(byId.nonEmpty)
    byId.values.foreach { frames =>
      val times = frames.map(_.getLong(1)).sorted
      assert(times.head == 0L)
      assert(times.sliding(2).forall(p => p.length < 2 || p(1) - p(0) == 500))
    }
  }

  test("category counts when-chain mirrors Benchmarker") {
    val sys = Seq(("m1", "E1"), ("m2", "E2"), ("m3", "NIL:x"), ("m4", "E9"), ("m5", "NIL:y"))
      .toDF("mentionId", "clusterId")
    val gold = Seq(("m1", "E1"), ("m2", "E3"), ("m3", "E2"), ("m4", "NIL7"), ("m5", "NIL9"))
      .toDF("id", "gold")
    val got = Reports.categoryCounts(sys, gold).as[(String, Long)].collect().toMap
    assert(got == Map("CORRECT" -> 1L, "WRONG KB ID" -> 1L, "EXPECTED KB" -> 1L,
      "EXPECTED NIL" -> 1L, "NIL OK" -> 1L))
  }

  test("pr curve: running precision and suffix-max monotonicity") {
    val scored = Seq(
      ("a", "b", 0.99, true), ("c", "d", 0.95, true), ("e", "f", 0.90, false),
      ("g", "h", 0.85, true), ("i", "j", 0.80, false))
      .toDF("leftId", "rightId", "score", "label")
    val got = Reports.prCurve(scored).orderBy($"rank")
      .select($"precision", $"recall", $"precisionAtBest")
      .as[(Double, Double, Double)].collect()
    assert(got(0)._1 == 1.0 && got(1)._1 == 1.0)
    assert(math.abs(got(4)._2 - 1.0) < 1e-12) // all positives found at the end
    // precisionAtBest is non-increasing down the ranking
    assert(got.map(_._3).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("salted hot-block pair generation equals the naive pair set") {
    import graft.operators.{Blocking, GraftConf}
    val conf = GraftConf(saltThreshold = 10, saltBuckets = 4)
    // one hot block (40 ids, > threshold -> salted path) and one cold block
    // (5 ids, <= threshold -> sort-merge path); ids overlap so some pairs
    // are found under both keys and must dedup to the min key
    val hot = (0 until 40).map(i => ("khot", f"id$i%03d"))
    val cold = (0 until 5).map(i => ("kcold", f"id$i%03d"))
    val blocks = (hot ++ cold).toDF("key", "id")
    val got = Blocking.candidatePairs(blocks, conf)
      .select($"leftId", $"rightId", $"blockKey")
      .as[(String, String, String)].collect()
    def naivePairs(ids: Seq[String]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val expected = (naivePairs(hot.map(_._2)) ++ naivePairs(cold.map(_._2))).toSet
    assert(got.map(p => (p._1, p._2)).toSet == expected)
    assert(got.length == expected.size, "pair dedup across keys failed")
    // pairs found under both keys take the lexicographic min key
    val both = got.filter(p => p._1 < "id005" && p._2 < "id005")
    assert(both.nonEmpty && both.forall(_._3 == "kcold"))
  }

  test("candidatePairsFromStats equals candidatePairs with a caller-side cap (r7)") {
    import graft.operators.{Blocking, GraftConf}
    val conf = GraftConf(saltThreshold = 10, saltBuckets = 4, maxBlockSize = 30)
    // four regimes: a capped block (40 > 30, must vanish), a hot-but-kept
    // block (20 ids, > saltThreshold -> salted path), duplicate-member-set
    // keys (kdup1/kdup2 collapse to one representative), and a singleton
    val over = (0 until 40).map(i => ("kover", f"id$i%03d"))
    val hot = (0 until 20).map(i => ("khot", f"id$i%03d"))
    val dup1 = (0 until 5).map(i => ("kdup1", f"dd$i%03d"))
    val dup2 = (0 until 5).map(i => ("kdup2", f"dd$i%03d"))
    val single = Seq(("ksingle", "zz"))
    val blocks = (over ++ hot ++ dup1 ++ dup2 ++ single).toDF("key", "id")
    // old path: the caller pre-filters with a separately aggregated sizes
    // join, then candidatePairs re-aggregates internally
    val sizes = Blocking.blockSizes(blocks)
    val oldWay = Blocking.candidatePairs(
      blocks.join(sizes, "key").where($"blockSize" <= conf.maxBlockSize)
        .select($"key", $"id"), conf)
      .as[(String, String, String)].collect().toSet
    // new path: one shared stats aggregation, cap applied inside
    val newWay = Blocking.candidatePairsFromStats(
      blocks, Blocking.blockStats(blocks), conf, Some(conf.maxBlockSize))
      .as[(String, String, String)].collect().toSet
    assert(newWay == oldWay)
    assert(newWay.nonEmpty && newWay.forall(_._3 != "kover"))
    assert(newWay.exists(_._3 == "kdup1") && !newWay.exists(_._3 == "kdup2"),
      "duplicate member-set keys must collapse to the min representative")
  }

  test("duplicate (key, id) rows must not collapse distinct member sets (r7 review)") {
    import graft.operators.Blocking
    // under an all-xor signature a duplicated id cancels pairwise in every
    // stream at once, so {a,b,b} and {a,c,c} shared (count, min, xors) and
    // K2's pairs vanished; the duplicate-sensitive sum stream keeps them
    // apart. Public candidatePairs callers may legally pass duplicates.
    val blocks = Seq(
      ("K1", "a"), ("K1", "b"), ("K1", "b"),
      ("K2", "a"), ("K2", "c"), ("K2", "c")).toDF("key", "id")
    val got = Blocking.candidatePairs(blocks)
      .as[(String, String, String)].collect().toSet
    // duplicates add no pairs (leftId < rightId is strict) — the two
    // distinct unordered pairs must both survive, each under its own key
    assert(got == Set(("a", "b", "K1"), ("a", "c", "K2")),
      s"distinct member sets merged or pairs lost: $got")
  }

  test("deterministic sample is stable across partitionings") {
    val df = (0 until 500).map(i => (s"id$i", i)).toDF("k", "v")
    val a = Reports.deterministicSample(df, Seq("k"), 50).as[(String, Int)].collect().toSeq
    val b = Reports.deterministicSample(df.repartition(13), Seq("k"), 50)
      .as[(String, Int)].collect().toSeq
    assert(a == b)
    assert(a.length == 50)
  }

  test("b3Capped: giant cluster thinned with metrics row; estimate near exact; small data exact") {
    // mixed giant cluster: 360 gold-A + 40 gold-B members in one system
    // cluster, plus a clean small cluster
    val giant = (0 until 400).map(i =>
      (f"g$i%03d", "NIL:g000", if (i < 360) "NIL:a" else "NIL:b"))
    val small = Seq(("s1", "NIL:s1", "NIL:s"), ("s2", "NIL:s1", "NIL:s"))
    val rows = giant ++ small
    val sys = rows.map(r => (r._1, r._2)).toDF("mentionId", "clusterId")
    val gold = rows.map(r => (r._1, r._3)).toDF("id", "gold")

    val exact = Evaluation.b3Exact(sys, gold)
    val (capped, metrics) = Evaluation.b3Capped(sys, gold, maxClusterSize = 50)
    // the capped run MUST report what it thinned (never silent); the giant
    // cluster exceeds the cap on the sys side and gold-A on the gold side
    val m = metrics.select($"side", $"cluster").as[(String, String)].collect().toSet
    assert(m.contains(("sys", "NIL:g000")) && m.contains(("gold", "NIL:a")), s"metrics: $m")
    // sampled estimate close to the exact score on a homogeneous-ish cluster
    assert(math.abs(capped.precision - exact.precision) < 0.1,
      s"capped P=${capped.precision} vs exact ${exact.precision}")
    assert(math.abs(capped.recall - exact.recall) < 0.1)
    // an uncapped run through the same code path matches b3 (tolerance:
    // the distributed avg's merge order is partition-timing dependent)
    val (uncapped, noMetrics) = Evaluation.b3Capped(sys, gold, Int.MaxValue)
    assert(math.abs(uncapped.precision - exact.precision) < 1e-9)
    assert(math.abs(uncapped.recall - exact.recall) < 1e-9)
    assert(noMetrics.isEmpty)
  }

  test("b3 DEFAULT path is capped-safe (VERDICT r3 #1b): exact under the cap, sampled above it") {
    // a PURE 120-member cluster: the sampled estimate equals the exact score
    // (every co-member term is 1), so the capped default path is checkable
    // to machine precision while still exercising the thinning branch
    val rows = (0 until 120).map(i => (f"m$i%03d", "NIL:c000", "NIL:g")) ++
      Seq(("x1", "NIL:x1", "NIL:x"), ("x2", "NIL:x1", "NIL:x"))
    val sys = rows.map(r => (r._1, r._2)).toDF("mentionId", "clusterId")
    val gold = rows.map(r => (r._1, r._3)).toDF("id", "gold")
    val exact = Evaluation.b3Exact(sys, gold)
    // default cap (100k) not hit -> identical to exact
    val default = Evaluation.b3(sys, gold)
    assert(default == exact, s"default b3 $default != exact $exact under the cap")
    // cap hit (32 < 120) -> thinning branch runs, logs, and on a pure
    // cluster still reproduces the exact score
    val capped = Evaluation.b3(sys, gold, maxClusterSize = 32)
    assert(math.abs(capped.precision - exact.precision) < 1e-9, s"$capped vs $exact")
    assert(math.abs(capped.recall - exact.recall) < 1e-9)
    // ADVICE r4: sampled status is surfaced programmatically, not just logged
    assert(capped.capped, "over-cap b3 must set the capped flag")
    assert(!default.capped && !exact.capped, "exact scores must not claim capping")
  }

  test("human-readable sink writes the reference's 8 columns in order, None for NIL (S9)") {
    val decisions = Seq(("m1", "E000001", 0.9), ("m2", "NIL:m2", 0.6))
      .toDF("mentionId", "clusterId", "confidence")
    val mentions = Seq(
      ("m1", "acme", "acme corporation", "doc1", Seq("Acme Corp ships tools")),
      ("m2", "zed", "zed", "doc2", Seq.empty[String]))
      .toDF("id", "name", "entityString", "doc", "corefMentions")
    val kb = Seq(("E000001", "Acme Corporation", "Acme Corporation is a company"))
      .toDF("kbId", "kbName", "intro")
    val dir = java.nio.file.Files.createTempDirectory("graft_hr_tsv").toFile
    try {
      val out = new java.io.File(dir, "hr").getPath
      Reports.writeHumanReadableTsv(decisions, mentions, kb, out)
      val lines = new java.io.File(out).listFiles()
        .filter(_.getName.startsWith("part-"))
        .flatMap(f => scala.io.Source.fromFile(f).getLines().toSeq)
        .sorted
      // FormattedOutputToHumanReadableOutputConverter.scala:24 column order:
      // queryId, entityString, entityStringUsed, docId, sourceContext,
      // linkId, kbTitle, kbSentence
      assert(lines.length == 2, lines.mkString("|"))
      assert(lines(0).split("\t", -1).toSeq == Seq("m1", "acme",
        "acme corporation", "doc1", "Acme Corp ships tools", "E000001",
        "Acme Corporation", "Acme Corporation is a company"), lines(0))
      assert(lines(1).split("\t", -1).toSeq == Seq("m2", "zed", "zed",
        "doc2", "", "NIL:m2", "None", "None"), lines(1))
    } finally {
      new scala.reflect.io.Directory(dir).deleteRecursively()
    }
  }

  test("submission sink: multi-part ordered default, coalesce(1) opt-in (S9, VERDICT r5 #1)") {
    // decisions are MENTION-sized (one row per repo file, SURVEY §1.3) — the
    // default write must spread over part files while preserving the global
    // mentionId order across part-file indexes; singleFile=true reproduces
    // the reference's literal one-file artifact byte-for-byte
    val decisions = (0 until 240)
      .map(i => (f"m$i%04d", if (i % 3 == 0) s"E$i" else s"NIL:$i",
        0.5 + (i % 40) / 100.0))
      .toDF("mentionId", "clusterId", "confidence")
    val dir = java.nio.file.Files.createTempDirectory("graft_sub_tsv").toFile
    try {
      val multi = new java.io.File(dir, "multi").getPath
      val single = new java.io.File(dir, "single").getPath
      // defeat AQE's small-data partition coalescing so the default write
      // exercises the multi-partition shape the assertion is about
      val aqeKey = "spark.sql.adaptive.coalescePartitions.enabled"
      val old = spark.conf.get(aqeKey)
      try {
        spark.conf.set(aqeKey, "false")
        Reports.writeSubmissionTsv(decisions, multi)
      } finally spark.conf.set(aqeKey, old)
      Reports.writeSubmissionTsv(decisions, single, singleFile = true)
      def parts(p: String) = new java.io.File(p).listFiles()
        .filter(_.getName.startsWith("part-")).sortBy(_.getName)
      assert(parts(multi).length > 1,
        s"default write funneled into ${parts(multi).length} file(s)")
      assert(parts(single).length == 1)
      def lines(fs: Array[java.io.File]) =
        fs.flatMap(f => scala.io.Source.fromFile(f).getLines().toSeq).toSeq
      val multiLines = lines(parts(multi))
      // concatenation in part-index order == the single ordered file ==
      // globally mentionId-sorted rows
      assert(multiLines == lines(parts(single)))
      assert(multiLines == multiLines.sortBy(_.split("\t")(0)))
      assert(multiLines.head == "m0000\tE0\t0.50")
      assert(multiLines.length == 240)
    } finally new scala.reflect.io.Directory(dir).deleteRecursively()
  }

  test("TSV sinks write RAW tabs — no CSV quoting of quote-bearing fields (ADVICE r5)") {
    // the reference prints mkString("\t") through a PrintWriter: a field
    // containing a double quote (coref context, KB sentence) goes out raw;
    // the CSV writer would wrap it in quotes and double the inner ones
    val decisions = Seq(("m1", "E1", 0.9)).toDF("mentionId", "clusterId", "confidence")
    val mentions = Seq(
      ("m1", "acme", "acme \"corp\"", "doc1", Seq("say \"hi\", ok")))
      .toDF("id", "name", "entityString", "doc", "corefMentions")
    val kb = Seq(("E1", "Acme", "intro with \"quotes\"")).toDF("kbId", "kbName", "intro")
    val dir = java.nio.file.Files.createTempDirectory("graft_raw_tsv").toFile
    try {
      val out = new java.io.File(dir, "hr").getPath
      Reports.writeHumanReadableTsv(decisions, mentions, kb, out, singleFile = true)
      val line = new java.io.File(out).listFiles()
        .filter(_.getName.startsWith("part-"))
        .flatMap(f => scala.io.Source.fromFile(f).getLines().toSeq).head
      assert(line == "m1\tacme\tacme \"corp\"\tdoc1\tsay \"hi\", ok\tE1\tAcme\tintro with \"quotes\"",
        s"quoting divergence: [$line]")
    } finally new scala.reflect.io.Directory(dir).deleteRecursively()
  }

  test("gazetteer-validated location expansion (A3/F14/P7): container membership decides") {
    import org.apache.spark.sql.functions.typedlit
    val gaz: Map[String, Seq[String]] = Map(
      "america" -> Seq("canada", "brazil"), "europe" -> Seq("france"))
    val ab: Map[String, String] = Map("ame" -> "america")
    val rows = Seq(
      // wrong container rejected, right container accepted
      ("CANADA", Seq("CANADA, EUROPE", "CANADA, AMERICA", "CANADA AMERICA")),
      // abbreviated container resolves and wins as the shortest valid
      ("BRAZIL", Seq("BRAZIL, AMERICA", "BRAZIL, AME")),
      // member must equal the mention's name — someone else's valid string
      ("FRANCE", Seq("CANADA, AMERICA")),
      // nothing valid at all -> fall back to the name
      ("ZUNKNOWN", Seq("ZUNKNOWN, NOWHERE", "ZUNKNOWN ALONE")))
      .toDF("name", "cands")
    val got = rows.select($"name",
        Aliases.bestLocationExpansion($"name", $"cands",
          typedlit(gaz), typedlit(ab)).as("expanded"))
      .as[(String, String)].collect().toMap
    assert(got("CANADA") == "CANADA, AMERICA")
    assert(got("BRAZIL") == "BRAZIL, AME")
    assert(got("FRANCE") == "FRANCE")
    assert(got("ZUNKNOWN") == "ZUNKNOWN")
  }
}
