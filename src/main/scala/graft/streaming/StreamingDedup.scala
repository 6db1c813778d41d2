package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming front-door for the training-data pipeline: documents
  * arrive as a stream, get fingerprinted / analyzed / exact-deduped
  * incrementally, and land in the batch tables the linkage pipeline reads.
  *
  * The reference is pure batch (SURVEY.md §1.3 — no streaming construct
  * anywhere), so this is engine capability, not reference parity: the
  * standard "dedup at ingest" shape — watermark + dropDuplicates on content
  * hash keeps state bounded; all per-row enrichment reuses the SAME column
  * expressions as the batch operators (one code path, two run modes).
  */
object StreamingDedup {

  /** Enrich a (possibly streaming) documents frame: content hash, language,
    * quality, token counts. Pure per-row projections — identical plan in
    * micro-batch and batch mode.
    */
  def enrich(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("content_sha", sha2(col(textCol), 256))
      .withColumn("lang_pred", TextAnalysis.langId(col(textCol)))
      .withColumn("quality", TextAnalysis.qualityScore(col(textCol)))
      .withColumn("n_tokens", TextAnalysis.tokenCountWs(col(textCol)))

  /** Exact dedup on the stream: first arrival of each content hash within
    * the watermark wins; later copies are dropped.
    * `dropDuplicatesWithinWatermark` (not plain `dropDuplicates`) is what
    * bounds the state: Spark evicts a hash's dedup entry once the watermark
    * passes its first-arrival event time, so state = one row per distinct
    * hash *inside the watermark window*. Plain `dropDuplicates` without the
    * event-time column in the key set never evicts and grows forever.
    */
  def dedupStream(docs: DataFrame, textCol: String, tsCol: String,
                  watermark: String = "10 minutes"): DataFrame =
    enrich(docs, textCol)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_sha")

  /** Windowed ingest metrics (per source, per window): arrival counts and
    * quality aggregates — the stream-side analogue of the checkpoint
    * metrics tables.
    */
  def ingestMetrics(docs: DataFrame, textCol: String, tsCol: String,
                    sourceCol: String, window_ : String = "5 minutes",
                    watermark: String = "10 minutes"): DataFrame =
    enrich(docs, textCol)
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col(sourceCol))
      .agg(
        count(lit(1)).as("n_docs"),
        approx_count_distinct(col("content_sha")).as("approx_distinct"),
        avg(col("quality")).as("avg_quality"),
        sum(col("n_tokens")).as("total_tokens"))
}
