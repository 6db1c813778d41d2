package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage 5 — final link decisions + confidence (SURVEY.md §7 M5).
  *
  * Component id semantics (reference C1-C3):
  *  - a component containing a KB-anchored mention keeps the KB id — "prefer
  *    keeping E* over NIL" (Clusterer.scala:56-62); ties broken by min kbId
  *  - pure-NIL components get "NIL:" + min(mentionId) — stable, content
  *    derived, replacing the reference's order-dependent AtomicInteger
  *    (RunKBPEntityLinkerSystem.scala:31-34)
  *
  * Confidence is the reference's piecewise-linear map (ConfidenceHelper
  * .scala:6-16, F11): above threshold -> 0.80 + int(100·(score−t))·step/100
  * with step = 20/((1−t)·100); else 0.55. Each mention's score = max score
  * of its accepted incident edges (singletons have none -> 0.55, matching
  * the reference's below-threshold default).
  */
object Decisions {

  /** F11 as a column expression; exact integer-truncation quirk preserved. */
  def confidence(score: org.apache.spark.sql.Column, threshold: Double): org.apache.spark.sql.Column = {
    val step = (100.0 - 80.0) / ((1.0 - threshold) * 100.0)
    when(score > threshold,
      (floor(score * 100.0 - threshold * 100.0) * step + 80.0) / 100.0)
      .otherwise(lit(0.55))
  }

  /** components: (id, component); scored accepted edges: (leftId, rightId,
    * score); optional kbAnchors: (id, kbId[, kbScore][, kbConfidence]).
    * Returns (mentionId, clusterId, confidence). When anchors carry a
    * kbScore, it participates in the mention's best-incident-score max — the
    * reference's KB-linked confidence comes from the link classifier score
    * (RunKBPEntityLinkerSystem.scala:128, getConfidence(t, score)); when
    * they carry a kbConfidence (the title-only fallback's fixed 0.8, or the
    * type-reroute's 0.7), it acts as a FLOOR for that mention — a
    * below-threshold exact-title link must not collapse to 0.55.
    */
  def assemble(components: DataFrame, acceptedEdges: DataFrame,
               kbAnchors: Option[DataFrame], threshold: Double): DataFrame = {
    val spark = components.sparkSession
    import spark.implicits._

    // best incident score per mention (narrow unions + one hash agg);
    // KB anchor scores count as incident evidence
    val edgeScores = acceptedEdges.select($"leftId".as("id"), $"score")
      .union(acceptedEdges.select($"rightId".as("id"), $"score"))
    val allScores = kbAnchors match {
      case Some(kb) if kb.columns.contains("kbScore") =>
        edgeScores.union(kb.select($"id", $"kbScore".as("score")))
      case _ => edgeScores
    }
    val incident = allScores.groupBy($"id").agg(max($"score").as("best"))

    // component -> cluster id (KB id if any member is anchored)
    val compIds = kbAnchors match {
      case Some(kb) =>
        components.join(kb.select($"id", $"kbId"), Seq("id"), "left")
          .groupBy($"component")
          .agg(min($"kbId").as("anchor"))
          .withColumn("clusterId",
            coalesce($"anchor", concat(lit("NIL:"), $"component")))
          .select($"component", $"clusterId")
      case None =>
        components.select($"component").distinct()
          .withColumn("clusterId", concat(lit("NIL:"), $"component"))
    }

    // kbConfidence floor (title-only 0.8 / reroute 0.7) for anchored mentions
    val confFloor = kbAnchors match {
      case Some(kb) if kb.columns.contains("kbConfidence") =>
        Some(kb.select($"id", $"kbConfidence"))
      case _ => None
    }

    val base = components
      .join(compIds, "component")
      .join(incident, Seq("id"), "left")
    val withFloor = confFloor.fold(base)(f => base.join(f, Seq("id"), "left"))
    withFloor.select(
      $"id".as("mentionId"),
      $"clusterId",
      (if (confFloor.isDefined)
         greatest(confidence(coalesce($"best", lit(0.0)), threshold),
           coalesce($"kbConfidence", lit(0.0)))
       else confidence(coalesce($"best", lit(0.0)), threshold)).as("confidence"))
  }
}
