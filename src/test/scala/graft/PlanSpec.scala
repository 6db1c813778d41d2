package graft

import graft.operators._
import graft.sources.SynthCorpus
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan quality gates: the properties that matter at 100 TB must
  * hold in the plan, not just in intent — filter/column pushdown into the
  * parquet scan, broadcast of the small join side, custom expressions inside
  * WholeStageCodegen, no cartesian products anywhere in the pipeline.
  */
class PlanSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def executed(df: DataFrame): String =
    df.queryExecution.executedPlan.toString()

  private def optimized(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString()

  test("filters and column pruning reach the parquet scan") {
    val df = SparkEntry.queries("q_filter_project")(spark, sf)
    val plan = executed(df)
    assert(plan.contains("PushedFilters:") &&
      plan.contains("IsNotNull(o_orderstatus)"),
      s"missing pushdown in:\n$plan")
    // scan must not read unused columns (e.g. o_orderdate, o_orderpriority)
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("o_orderpriority") && !readSchema.contains("o_orderdate"),
      s"scan reads pruned columns: $readSchema")
  }

  test("small dimension join is a broadcast hash join") {
    val df = SparkEntry.queries("q_join_agg")(spark, sf)
    val plan = executed(df)
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }

  test("alias dictionary join in the pipeline is broadcast") {
    val files = SynthCorpus.corpus(spark, 5, 4)
    val m = Mentions.build(spark, files, SynthCorpus.aliasDict, GraftConf())
    assert(executed(m).contains("BroadcastHashJoin"))
  }

  test("jaro_winkler and sorted_vec_dot run inside WholeStageCodegen (no fallback)") {
    val files = SynthCorpus.corpus(spark, 5, 4)
    val conf = GraftConf()
    val mentions = Mentions.prepare(spark, files, SynthCorpus.aliasDict, conf)
    val scored = Scoring.score(
      Blocking.candidatePairs(Blocking(mentions, conf).blocks), mentions,
      PairWeights.default, conf)
    // execute THIS df's own QueryExecution (count() would build a new one):
    // with AQE the final codegen-annotated plan only exists after the action
    assert(scored.collect().nonEmpty)
    val plan = executed(scored)
    assert(plan.contains("isFinalPlan=true"), s"AQE plan not finalized:\n$plan")
    // in the final AQE rendering, whole-stage-codegen membership shows as a
    // "*(n)" prefix on the operator line — the jaro_winkler projection must
    // carry one (a CodegenFallback expression anywhere in it would strip it)
    val jwLine = plan.linesIterator.find(_.contains("jaro_winkler"))
      .getOrElse(fail("jaro_winkler not in plan"))
    assert(jwLine.contains("*("),
      s"scoring projection fell out of WholeStageCodegen:\n$jwLine")
  }

  test("no cartesian product anywhere in the pipeline plans") {
    val files = SynthCorpus.corpus(spark, 5, 4)
    val r = Pipeline.run(spark, files, SynthCorpus.aliasDict)
    Seq(r.mentions, r.scored, r.decisions).foreach { df =>
      val plan = executed(df)
      assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
    }
    r.mentions.unpersist(); r.scored.unpersist(); r.components.unpersist()
  }

  test("no CartesianProduct in ANY driver query plan (automated r4 plan audit)") {
    // the by-hand plan audits of r1-r3 automated: every SparkEntry query's
    // physical plan is free of CartesianProductExec (cross-shaped work must
    // go through a broadcast — BroadcastNestedLoopJoin over a bounded probe
    // side is the only sanctioned shape, e.g. q_embed_topk's probes)
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = executed(fn(spark, sf))
      assert(!plan.contains("CartesianProduct"), s"cartesian product in $name:\n$plan")
    }
  }

  test("pair self-join carries the l.id < r.id predicate into the join") {
    val blocks = Seq(("k1", "a"), ("k1", "b"), ("k1", "c")).toDF("key", "id")
    val pairs = Blocking.candidatePairs(blocks)
    val opt = optimized(pairs)
    assert(opt.contains("<") && pairs.count() == 3)
  }

  test("exact dedup is one aggregation + one join, no self-join of raw text") {
    val df = SparkEntry.queries("q_exact_dedup")(spark, sf)
    val plan = executed(df)
    // a single hash-aggregate pair (partial+final) over the hash column
    assert(plan.contains("HashAggregate"))
    assert(!plan.contains("SortMergeJoin"), "exact dedup must not self-join")
  }

  test("nameAmbiguity containment join broadcasts the KB side (no cartesian, no shuffle)") {
    val kb = Seq("E1" -> "apache spark", "E2" -> "flink").toDF("kbId", "kbName")
    val mentions = Seq("a" -> "spark", "b" -> "flink").toDF("id", "entityString")
    val plan = executed(KbLink.nameAmbiguity(mentions, kb))
    assert(plan.contains("BroadcastNestedLoopJoin"), s"expected BNLJ in:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
  }

  test("calibrated preset with a precomputed ambiguity table scans mentions ONCE (r5 #6)") {
    // stand-in for runCheckpointed's stage tables: mentions and the amb
    // aggregate both parquet-backed. With the amb table passed down, link()
    // must scan the mention table exactly once — the inline build (a second
    // evaluation of the mention lineage) only remains for ad-hoc callers
    val dir = java.nio.file.Files.createTempDirectory("graft_amb_plan").toFile
    try {
      val files = SynthCorpus.corpus(spark, 6, 4)
      val conf = GraftConf()
      val mPath = new java.io.File(dir, "mtbl").getPath
      Mentions.prepare(spark, files, SynthCorpus.aliasDict, conf)
        .write.parquet(mPath)
      val mentions = spark.read.parquet(mPath)
      val kb = KbLink.introVectors(SynthCorpus.kb(spark, 6), "intro")
      val ambPath = new java.io.File(dir, "ambtbl").getPath
      KbLink.nameAmbiguity(mentions, kb).write.parquet(ambPath)
      val amb = spark.read.parquet(ambPath)
      def scans(plan: String, marker: String) =
        plan.sliding(marker.length).count(_ == marker)
      val inline = executed(KbLink.link(mentions, kb, KbWeights.calibrated, conf))
      assert(scans(inline, "mtbl") == 2,
        s"expected the inline amb build to scan mentions twice (the documented cost) in:\n$inline")
      val withPre = executed(
        KbLink.link(mentions, kb, KbWeights.calibrated, conf, Some(amb)))
      assert(scans(withPre, "mtbl") == 1,
        s"precomputed ambiguity must leave ONE mention scan in:\n$withPre")
      assert(scans(withPre, "ambtbl") == 1, s"amb table not read in:\n$withPre")
    } finally new scala.reflect.io.Directory(dir).deleteRecursively()
  }

  test("default submission write plans no single-partition exchange (S9 scale guard)") {
    // VERDICT r5 #1 regression guard: the default (multi-part) submission
    // rows must order through a range exchange — never a Coalesce(1) or a
    // SinglePartition exchange that funnels the corpus-sized decision frame
    // through one task
    val decisions = (0 until 50)
      .map(i => (f"m$i%03d", s"NIL:$i", 0.6))
      .toDF("mentionId", "clusterId", "confidence")
    val plan = executed(Reports.submissionRows(decisions))
    assert(plan.contains("rangepartitioning"), s"ordered exchange missing in:\n$plan")
    assert(!plan.contains("Coalesce"), s"single-file funnel in default plan:\n$plan")
    assert(!plan.contains("SinglePartition"), s"single-partition exchange in:\n$plan")
  }

  test("KbLink.link: exactly one shuffle — the top-1 window; mentions never re-shuffled") {
    // VERDICT r2 #8: the r2 plan re-shuffled the wide mention frame into a
    // sort-merge join-back on id; the single-pass shape carries mention
    // attributes through the key explode, so the ONLY shuffle of
    // mention-derived rows is the narrow per-mention window exchange
    val files = SynthCorpus.corpus(spark, 6, 4)
    val conf = GraftConf()
    // materialize the mention frame behind a HARD plan boundary first —
    // the assertion is about KbLink.link's OWN plan on top of it.
    // localCheckpoint, not persist (r7): a persist's printed plan includes
    // the InMemoryRelation's INTERNAL stages, so after the tfidf lineage
    // cut was removed from Mentions.prepare the upstream aggregation
    // exchanges leaked into this count; the checkpoint boundary prints as
    // one scan, which is exactly the "link's own plan" the test pins
    // (Pipeline.run bounds evaluation the same way, via its persist)
    val mentions = Mentions.prepare(spark, files, SynthCorpus.aliasDict, conf)
      .localCheckpoint()
    val kb = KbLink.introVectors(SynthCorpus.kb(spark, 6), "intro")
    val linked = KbLink.link(mentions, kb, KbWeights.default, conf)
    val plan = executed(linked)
    val shuffles = plan.linesIterator
      .count(l => l.contains("Exchange hashpartitioning"))
    assert(shuffles == 1,
      s"expected exactly 1 shuffle (the window), got $shuffles in:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      "mention frame must not be sort-merge re-joined")
  }

  test("KbLink.link with KbWeights.calibrated keeps the one-exchange shape") {
    // the nameAmbiguity activation must join as ONE extra broadcast hash
    // join on the mention stream — never a shuffle of the mention frame,
    // never a sort-merge join (the preset's scale story depends on it)
    val files = SynthCorpus.corpus(spark, 6, 4)
    val conf = GraftConf()
    // localCheckpoint boundary, same rationale as the test above (r7)
    val mentions = Mentions.prepare(spark, files, SynthCorpus.aliasDict, conf)
      .localCheckpoint()
    val kb = KbLink.introVectors(SynthCorpus.kb(spark, 6), "intro")
    val plan = executed(KbLink.link(mentions, kb, KbWeights.calibrated, conf))
    // allowed exchanges: the per-mention window (partitioned on id) plus
    // the name-dimension aggregation INSIDE the broadcast build side of
    // the ambiguity join (partitioned on nameLower — tiny, never the
    // mention frame)
    val exchanges = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.count(_.contains("hashpartitioning(id")) == 1,
      s"expected exactly 1 mention-id shuffle (the window) in:\n$plan")
    assert(exchanges.forall(l =>
      l.contains("hashpartitioning(id") || l.contains("nameLower")),
      s"unexpected exchange of mention-derived rows in:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      "calibrated preset must not sort-merge join the ambiguity frame")
    assert(!plan.contains("CartesianProduct"))
  }
}
