package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Stage checkpointing with per-partition lineage + metrics (north_rule:
  * "resumable from checkpoint with per-partition lineage + metrics rows").
  *
  * Each stage writes three sibling tables under `root/<stage>/`:
  *   data/      — the stage output (parquet; Iceberg at deploy time — the
  *                sandbox has no Iceberg runtime jar, so the layer is kept
  *                format-pluggable per SURVEY.md §7)
  *   _metrics/  — (stage, partitionId, rows) per output partition
  *   _lineage/  — (stage, configHash, inputs, committed) single row, written
  *                LAST so a crash mid-write is detected as "not committed"
  *
  * `getOrCompute` resumes from a committed checkpoint iff the config hash
  * matches; otherwise recomputes and overwrites — a kill-and-resume restarts
  * at the first uncommitted stage (SURVEY.md §5 resumability test).
  */
final class Checkpoint(spark: SparkSession, root: String) {
  import spark.implicits._

  private def dir(stage: String, part: String) = s"$root/$stage/$part"

  // Hadoop FS, not java.nio (self-review r4): the checkpoint root may be
  // hdfs://, s3a://, or any Hadoop-resolvable path — a driver-local
  // Files.exists probe is always false there and resume would silently
  // never fire while the (Hadoop-FS-backed) writes keep working
  private def exists(p: String): Boolean = {
    val path = new Path(p)
    path.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(path)
  }

  def committed(stage: String, configHash: String): Boolean = {
    val p = dir(stage, "_lineage")
    if (!exists(p)) false
    else
      try {
        val row = spark.read.parquet(p)
          .where($"configHash" === configHash && $"committed")
        !row.isEmpty
      } catch { case _: Throwable => false }
  }

  def getOrCompute(stage: String, configHash: String, inputs: Seq[String])(
      compute: => DataFrame): DataFrame = {
    if (committed(stage, configHash)) {
      spark.read.parquet(dir(stage, "data"))
    } else {
      // INVALIDATE the old commit marker BEFORE overwriting data
      // (self-review r4): a crash after the data overwrite but before the
      // new lineage write would otherwise leave the PREVIOUS config's
      // committed=true row pointing at the new config's (possibly partial)
      // data — a later run under the old config would then resume from
      // wrong data. With the marker deleted first, any crash inside this
      // block leaves the stage "not committed" and it recomputes.
      val lineagePath = new Path(dir(stage, "_lineage"))
      lineagePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(lineagePath, true)
      val df = compute
      df.write.mode(SaveMode.Overwrite).parquet(dir(stage, "data"))
      val data = spark.read.parquet(dir(stage, "data"))
      data.groupBy(spark_partition_id().as("partitionId"))
        .agg(count(lit(1)).as("rows"))
        .withColumn("stage", lit(stage))
        .write.mode(SaveMode.Overwrite).parquet(dir(stage, "_metrics"))
      Seq((stage, configHash, inputs.mkString(","), true))
        .toDF("stage", "configHash", "inputs", "committed")
        .write.mode(SaveMode.Overwrite).parquet(dir(stage, "_lineage"))
      data
    }
  }
}

object Checkpoint {
  /** Deterministic config hash for lineage (content-derived, no wall-clock).
    * SHA-256-backed, 128 bits rendered — the previous 32-bit `String
    * .hashCode` had a real birthday-collision risk (VERDICT r2), and a
    * config-hash collision silently serves stale stage data.
    */
  def hash(parts: Any*): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(parts.map(_.toString).mkString("|").getBytes("UTF-8"))
      .take(16).map(b => f"$b%02x").mkString
  }

  /** Cheap CONTENT fingerprint of a small/medium side frame (KB table,
    * anchors, extractions): schema + row count + order-insensitive SUM of
    * per-row JSON hashes — one map-side-combinable pass, so an edit that
    * keeps the row count constant still changes the hash. Sum (not bit_xor:
    * duplicate rows cancel pairwise under xor — ADVICE r2) over decimal(38)
    * so ANSI mode never overflows below ~10¹⁹ rows.
    */
  def fingerprint(df: DataFrame): String = {
    val row = df
      .select(xxhash64(to_json(struct(df.columns.map(col): _*)))
        .cast("decimal(38,0)").as("h"))
      .agg(count(lit(1)), coalesce(sum(col("h")), lit(0).cast("decimal(38,0)"))).head()
    s"${df.schema.catalogString}|${row.getLong(0)}|${row.getDecimal(1)}"
  }

  /** Metadata-only fingerprint of a file-backed input frame: sorted (path,
    * length, modificationTime) of every input file — an edit that keeps the
    * row count constant still invalidates (ADVICE r2 medium: count+schema
    * alone silently reused stale stages after same-cardinality edits). For
    * in-memory frames (no input files) falls back to the full content
    * fingerprint — one linear pass, paid once per `runCheckpointed` call.
    */
  def inputFingerprint(df: DataFrame): String = {
    val files = df.inputFiles
    if (files.isEmpty) fingerprint(df)
    else {
      val hconf = df.sparkSession.sparkContext.hadoopConfiguration
      val entries = files.sorted.map { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        val st = p.getFileSystem(hconf).getFileStatus(p)
        s"$f:${st.getLen}:${st.getModificationTime}"
      }
      hash(df.schema.catalogString, entries.mkString(";"))
    }
  }
}
