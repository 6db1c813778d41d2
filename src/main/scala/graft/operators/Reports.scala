package graft.operators

import graft.plans.Lineage
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reporting / analysis operators mirroring the reference's Benchmarker and
  * classifier diagnostics (SURVEY.md §2.6 G9/G10, §2.8 O6, §2.1 S9).
  */
object Reports {

  /** G9 — benchmark category counts (Benchmarker.scala:92-130): each
    * mention categorized by a when-chain over (sys, gold) cluster ids;
    * KB ids are `E*`-style (here: non-NIL). Both-NIL mentions split into
    * NIL OK vs WRONG NIL ID by the reference's CLUSTER-SET comparison
    * (`!sysCluster.equals(theirCluster)`): the mention's system cluster
    * must contain exactly the same mentions as its gold cluster. Set
    * equality is relational — |sys cluster| = |gold cluster| = |mentions
    * sharing both ids| — three map-side-combinable aggregations, no
    * per-cluster collect.
    */
  def categoryCounts(sys: DataFrame, gold: DataFrame): DataFrame = {
    import sys.sparkSession.implicits._
    // the joined assignment frame feeds FOUR consumers (itself + the three
    // size aggregations) — persist it or each one re-runs the input join
    val joined = sys.select($"mentionId", $"clusterId".as("sysId"))
      .join(gold.select($"id".as("mentionId"), $"gold".as("goldId")), "mentionId")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sysSize = joined.groupBy($"sysId").agg(count(lit(1)).as("sysSize"))
    val goldSize = joined.groupBy($"goldId").agg(count(lit(1)).as("goldSize"))
    val inter = joined.groupBy($"sysId", $"goldId").agg(count(lit(1)).as("interSize"))
    val sysNil = $"sysId".startsWith("NIL")
    val goldNil = $"goldId".startsWith("NIL")
    val out = Lineage.cut(joined
      .join(sysSize, "sysId").join(goldSize, "goldId")
      .join(inter, Seq("sysId", "goldId"))
      .withColumn("category",
        when(!sysNil && !goldNil && $"sysId" === $"goldId", "CORRECT")
          .when(!sysNil && !goldNil, "WRONG KB ID")
          .when(!sysNil && goldNil, "EXPECTED NIL")
          .when(sysNil && !goldNil, "EXPECTED KB")
          .when($"sysSize" === $"goldSize" && $"goldSize" === $"interSize", "NIL OK")
          .otherwise("WRONG NIL ID"))
      .groupBy($"category").agg(count(lit(1)).as("n"))
      .orderBy($"category")) // materialized (≤6 rows) so joined can release
    joined.unpersist()
    out
  }

  /** G10 — precision-recall curve (LinkClassifier.scala:88-103): rank by
    * score desc, running precision, then suffix-max (the best precision
    * achievable at each recall level).
    *
    * Scale shape: a global `Window.orderBy` funnels the whole pair set
    * through ONE task (r1 VERDICT scale-killer #1). Instead: range-partition
    * on the sort key, run the running sums per partition, and stitch with
    * per-partition prefix offsets (the classic distributed prefix-sum). The
    * suffix-max stitches the same way in reverse. Output is bit-identical
    * to the single-window form (the sort key (score, leftId, rightId) is
    * unique per row, so range boundaries never split ties).
    *
    * The stitch frames are #partitions rows; their prefix/suffix
    * accumulation runs as SINGLE-PARTITION windows over those tiny frames
    * (r7, guide §5 — no collect()/driver loops in query paths: the former
    * collect+loop+re-parallelize per stitch cost two extra driver sync
    * points per call; a no-partition window over O(#partitions) rows is
    * scale-independent, the data itself never funnels through it).
    */
  def prCurve(scored: DataFrame): DataFrame = {
    import scored.sparkSession.implicits._
    val spark = scored.sparkSession
    val nParts = math.max(spark.sessionState.conf.numShufflePartitions / 2, 2)

    val parts = scored
      .repartitionByRange(nParts, $"score".desc, $"leftId", $"rightId")
      .withColumn("pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val byScore = Window.partitionBy($"pid")
      .orderBy($"score".desc, $"leftId", $"rightId")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val suffix = Window.partitionBy($"pid")
      .orderBy($"score".desc, $"leftId", $"rightId")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    // per-partition totals -> prefix offsets (rank, tp) per pid, plus the
    // global positive count (recall denominator) — one tiny frame, windowed
    // in place (pid is unique, so the ordering is deterministic)
    val wPrefix = Window.orderBy($"pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy()
    val offsets = parts.groupBy($"pid")
      .agg(count(lit(1)).as("n"), sum(when($"label", 1L).otherwise(0L)).as("p"))
      .withColumn("rankOff", coalesce(sum($"n").over(wPrefix), lit(0L)))
      .withColumn("tpOff", coalesce(sum($"p").over(wPrefix), lit(0L)))
      .withColumn("nPos", greatest(sum($"p").over(wAll), lit(1L)))
      .select($"pid", $"rankOff", $"tpOff", $"nPos")

    // persisted: the per-partition window pass feeds BOTH the pid-max
    // stitch and the final output — without the persist it runs twice
    // (and a third time inside the lineage cut's materialization)
    val local = parts
      .withColumn("rank", count(lit(1)).over(byScore))
      .withColumn("tp", sum(when($"label", 1L).otherwise(0L)).over(byScore))
      .join(broadcast(offsets), "pid")
      .withColumn("rank", $"rank" + $"rankOff")
      .withColumn("tp", $"tp" + $"tpOff")
      .withColumn("precision", $"tp".cast("double") / $"rank")
      .withColumn("recall", $"tp".cast("double") / $"nPos")
      .withColumn("pBestLocal", max($"precision").over(suffix))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // suffix-max across partitions: per-pid max precision -> reverse prefix
    // max (strictly-later pids only) -> "best precision in any LATER
    // partition"; −∞ for the last pid, exactly as the old driver loop's
    // initial accumulator
    val wSuffix = Window.orderBy($"pid".desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val laterMax = local.groupBy($"pid").agg(max($"precision").as("m"))
      .withColumn("pBestLater",
        coalesce(max($"m").over(wSuffix), lit(Double.NegativeInfinity)))
      .select($"pid", $"pBestLater")

    val out = Lineage.cut(local.join(broadcast(laterMax), "pid")
      .withColumn("precisionAtBest", greatest($"pBestLocal", $"pBestLater"))
      .select($"rank", $"score", $"precision", $"recall", $"precisionAtBest"))
    local.unpersist() // materialized by the cut, then release the cached inputs
    parts.unpersist()
    out
  }

  /** G11 — threshold finder (LinkClassifier.scala:36-86): the reference runs
    * 10 shuffled 90/10 splits, ranks each held-out set by score, and
    * averages the max-F1 thresholds. Deterministic re-expression: folds come
    * from a seeded hash of the id (not Random.shuffle), each fold's ranked
    * running P/R/F1 is a fold-partitioned window (never a global one), and
    * the per-fold threshold = score at max F1 with ties to the HIGHER
    * threshold (the reference's stable sort + `.last`). Divergence: weights
    * are given, not refit per split — our classifier is a closed-form
    * column expression, so the split only measures threshold stability.
    * Input columns: (id, score, label) (+ optional precomputed fold).
    * Output: (fold, bestThreshold, bestF1) — avg() downstream for the
    * reference's single number.
    */
  def bestThreshold(scored: DataFrame, folds: Int = 10): DataFrame = {
    import scored.sparkSession.implicits._
    val withFold =
      if (scored.columns.contains("fold")) scored
      else scored.withColumn("fold", pmod(xxhash64($"id"), lit(folds.toLong)).cast("int"))
    val w = Window.partitionBy($"fold").orderBy($"score".desc, $"id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perFold = Window.partitionBy($"fold")
    val ranked = withFold
      .withColumn("rank", count(lit(1)).over(w))
      .withColumn("tp", sum(when($"label", 1L).otherwise(0L)).over(w))
      .withColumn("npos", sum(when($"label", 1L).otherwise(0L)).over(perFold))
      .withColumn("prec", $"tp".cast("double") / $"rank")
      .withColumn("rec", $"tp".cast("double") / greatest($"npos", lit(1L)))
      .withColumn("f1",
        when($"prec" + $"rec" === 0.0, 0.0)
          .otherwise(lit(2.0) * $"prec" * $"rec" / ($"prec" + $"rec")))
    ranked.groupBy($"fold")
      .agg(max(struct($"f1", $"score")).as("b"))
      .select($"fold", $"b.score".as("bestThreshold"), $"b.f1".as("bestF1"))
  }

  /** G11, full reference semantics — per-fold weight REFIT
    * (LinkClassifier.scala:36-86 retrains on each 90% split before ranking
    * the held-out 10%; the fixed-weight `bestThreshold` above only measures
    * threshold stability). For each fold: deterministically sample ≤
    * `sampleCap` examples from the fold's COMPLEMENT, fit logistic weights
    * driver-side (`LogisticTrainer` — the reference trains Breeze LR on
    * ≤3k pairs, so driver altitude is correct), then rank the held-out fold
    * with THAT fold's weights and take the max-F1 threshold, reusing the
    * fold-partitioned ranking of `bestThreshold`.
    *
    * Input: (id, label, <featureCols>...) (+ optional precomputed fold).
    * Output: (fold, bestThreshold, bestF1) in σ(z) probability space.
    */
  def bestThresholdRefit(labeled: DataFrame, featureCols: Seq[String],
                         folds: Int = 10, sampleCap: Int = 3000): DataFrame = {
    import labeled.sparkSession.implicits._
    val withFold =
      if (labeled.columns.contains("fold")) labeled
      else labeled.withColumn("fold", pmod(xxhash64($"id"), lit(folds.toLong)).cast("int"))
    // one source pass cached; each fold then collects only its ≤sampleCap
    // training sample to the driver
    val cached = withFold.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val weights: Map[Int, Array[Double]] = (0 until folds).map { f =>
      val rows = deterministicSample(cached.where($"fold" =!= f), Seq("id"), sampleCap)
        .select(featureCols.map(c => col(c).cast("double")) :+
          $"label".cast("double").as("y"): _*)
        .collect()
      val ex = rows.map(r => LogisticTrainer.Example(
        Array.tabulate(featureCols.size)(i => r.getDouble(i)),
        r.getDouble(featureCols.size))).toSeq
      f -> LogisticTrainer.fit(ex)
    }.toMap

    // per-fold z with that fold's literal weights (a folds-deep when-chain —
    // tiny, codegen-friendly, no join)
    def zFor(w: Array[Double]): Column =
      featureCols.zipWithIndex.foldLeft(lit(w(0))) { case (acc, (c, i)) =>
        acc + lit(w(i + 1)) * col(c).cast("double")
      }
    val z = (0 until folds).foldLeft(lit(Double.NegativeInfinity)) { (acc, f) =>
      when($"fold" === f, zFor(weights(f))).otherwise(acc)
    }
    val scored = cached.select($"id", $"fold",
      (lit(1.0) / (lit(1.0) + exp(-z))).as("score"), $"label")
    val out = Lineage.cut(bestThreshold(scored, folds))
    cached.unpersist()
    out
  }

  /** O6 — deterministic sampling (MentionPairTrainingData.scala:45-53):
    * the reference's seeded shuffle + cap becomes orderBy(hash) + limit —
    * stable across partitionings, unlike `sample`.
    */
  def deterministicSample(df: DataFrame, keyCols: Seq[String], n: Int): DataFrame =
    df.orderBy(md5(concat_ws(" ", keyCols.map(col): _*)), col(keyCols.head))
      .limit(n)

  /** O6 negatives cap — negatives at most `ratio`× positives (seeded-
    * deterministic pick), mirroring the 10:1 cap.
    */
  def capNegatives(labeled: DataFrame, ratio: Int): DataFrame = {
    import labeled.sparkSession.implicits._
    val nPos = labeled.where($"label").count()
    val pos = labeled.where($"label")
    // clamp: nPos * ratio overflows Int past ~2^31 pairs and a wrapped
    // negative limit throws (or silently truncates) — at the clamp the cap
    // is a no-op anyway (limit of Int.MaxValue rows)
    val cap = math.min(nPos * ratio, Int.MaxValue.toLong).toInt
    val neg = deterministicSample(labeled.where(!$"label"),
      Seq("leftId", "rightId"), cap)
    pos.unionByName(neg)
  }

  /** One raw TSV line per row: tab-joined fields with NO quoting or
    * escaping — byte parity with the reference's `mkString("\t")` through a
    * PrintWriter (ADVICE r5: the CSV writer quotes any field containing a
    * tab/quote/newline, so sourceContext or kbSentence rows would diverge
    * from the reference format; `text()` over one concat column cannot).
    * Fields are null-coalesced to "" because concat_ws SKIPS null arguments
    * (which would silently drop a tab and shift every later column).
    */
  private def tsvLine(fields: Seq[Column]): Column =
    concat_ws("\t", fields.map(f => coalesce(f.cast("string"), lit(""))): _*)

  /** S9 submission rows as a single ordered `line` column — split out from
    * the writer so PlanSpec can assert the default write plans no
    * single-partition exchange.
    */
  def submissionRows(decisions: DataFrame): DataFrame = {
    import decisions.sparkSession.implicits._
    decisions
      // format_string, NOT format_number (review r6): format_number's
      // DecimalFormat rounds HALF_EVEN (0.125 -> "0.12") where the
      // reference's %1.2f goes through java.util.Formatter and rounds
      // HALF_UP (-> "0.13") — format_string IS Formatter, so tie values
      // match the reference byte-for-byte
      .select(tsvLine(Seq($"mentionId", $"clusterId",
        format_string("%1.2f", $"confidence"))).as("line"), $"mentionId")
      .orderBy($"mentionId")
      .select($"line")
  }

  /** S9 — submission-format sink (RunKBPEntityLinkerSystem.scala:233-244):
    * `mentionId \t clusterId \t %1.2f(conf)` TSV.
    *
    * Default is a MULTI-PART write: decisions are one row per MENTION — in
    * this engine's reframing a mention is a repo FILE (SURVEY §1.3), so the
    * sink is corpus-sized and an unconditional single-file funnel is a
    * scale-killer at 100× (VERDICT r5 #1: the r5 `coalesce(1)` justified
    * itself with a wrong "one row per QUERY" claim). Global mentionId order
    * is still total: `orderBy` range-partitions the rows, so concatenating
    * part files in part-index order reproduces the reference's single
    * sorted stream (spec-pinned). `singleFile = true` opts back into the
    * reference's literal one-file artifact for parity dumps.
    */
  def writeSubmissionTsv(decisions: DataFrame, path: String,
                         singleFile: Boolean = false): Unit = {
    val rows = submissionRows(decisions)
    (if (singleFile) rows.coalesce(1) else rows)
      .write.mode("overwrite").text(path)
  }

  /** S9 — human-readable debugging sink (FormattedOutputToHumanReadable
    * OutputConverter.scala:11-27): the reference's second output format, an
    * 8-column TSV joining each decision with its mention surface strings
    * and the linked KB entry — column order exactly the reference's
    * `toString`: queryId, entityString (original name), entityStringUsed
    * (expanded), docId, sourceContext, linkId, kbTitle, kbSentence. NIL
    * links (and any id absent from the KB) print "None" for title and
    * sentence, the reference's `getOrElse` default.
    *
    * `mentions` must carry (id, name, entityString); `doc` and
    * `corefMentions` ride along when present (the reference's kbpQuery.doc
    * and corefSourceContext.mkString(" ")) and default to "" otherwise.
    * `kb` is the broadcast dimension: (kbId, kbName | kbTitle, intro?).
    */
  def writeHumanReadableTsv(decisions: DataFrame, mentions: DataFrame,
                            kb: DataFrame, path: String,
                            singleFile: Boolean = false): Unit = {
    import decisions.sparkSession.implicits._
    val has = (c: String) => mentions.columns.contains(c)
    val mSide = mentions.select(Seq(
      $"id".as("mentionId"), $"name", $"entityString",
      (if (has("doc")) $"doc" else lit("")).as("docId"),
      (if (has("corefMentions"))
        array_join(coalesce($"corefMentions", array().cast("array<string>")), " ")
      else lit("")).as("sourceContext")): _*)
    val kbSide = kb.select(
      col("kbId"),
      (if (kb.columns.contains("kbTitle")) col("kbTitle") else col("kbName"))
        .as("_kbTitle"),
      (if (kb.columns.contains("intro")) col("intro") else lit(null).cast("string"))
        .as("_kbSentence"))
    val rows = decisions.select($"mentionId", $"clusterId")
      .join(mSide, Seq("mentionId"), "left")
      .join(broadcast(kbSide), $"clusterId" === $"kbId", "left")
      // raw tab-joined line (no CSV quoting/escaping — byte parity with the
      // reference's mkString("\t"), see tsvLine): queryId, entityString,
      // entityStringUsed, docId, sourceContext, linkId, kbTitle, kbSentence.
      // tsvLine already coalesces plain nulls to "" — only the two "None"
      // defaults (the reference's getOrElse on the KB lookup) are explicit
      .select(tsvLine(Seq(
        $"mentionId", $"name", $"entityString", $"docId", $"sourceContext",
        $"clusterId",
        coalesce($"_kbTitle", lit("None")),
        coalesce($"_kbSentence", lit("None")))).as("line"), $"mentionId")
      .orderBy($"mentionId")
      .select($"line")
    // multi-part ordered default, coalesce(1) opt-in — same scale rationale
    // as writeSubmissionTsv (this sink joins the full decision frame too,
    // even if its role is debugging output)
    (if (singleFile) rows.coalesce(1) else rows)
      .write.mode("overwrite").text(path)
  }
}
