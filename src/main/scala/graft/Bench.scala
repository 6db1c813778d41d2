package graft

import graft.operators.GraftConf
import graft.sources.SynthCorpus
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR at local[SPARK_GRAFT_CPUS], plus the record-linkage
  * headline metric — scored-pairs/sec on a synthetic repo-file corpus sized
  * to the scale factor (BASELINE.md throughput target).
  *
  * Prints ONE JSON line: {"metric","value","unit","queries",...,"sf"}.
  */
object Bench {

  def session(cpus: Int): SparkSession = SparkSession.builder()
    .master(s"local[$cpus]")
    .appName("graft-bench")
    .config("spark.sql.shuffle.partitions", cpus.toString)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Families scaled to the sf dir: sf0.1 -> 2000 families = 16k mentions. */
  def familiesFor(sfDir: String): Int =
    if (sfDir.contains("0.001")) 50
    else if (sfDir.contains("0.01")) 400
    else 2000

  /** One full pipeline run; returns (scoredPairs, seconds). */
  def pipelineThroughput(spark: SparkSession, families: Int): (Long, Double) = {
    val files = SynthCorpus.corpus(spark, families = families, variants = 8)
    val t0 = System.nanoTime()
    val result = Pipeline.run(spark, files, SynthCorpus.aliasDict, GraftConf())
    val nPairs = result.scored.count()
    result.decisions.count() // materialize decisions too (CC + confidence)
    val sec = (System.nanoTime() - t0) / 1e9
    result.mentions.unpersist(); result.scored.unpersist()
    result.components.unpersist()
    (nPairs, sec)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = session(cpus)
    spark.sparkContext.setLogLevel("WARN")

    // JIT/codegen warm-up (not measured): tiny passes over every code path
    val warm = SynthCorpus.corpus(spark, families = 4, variants = 4)
    Pipeline.run(spark, warm, SynthCorpus.aliasDict).decisions.count()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(10).count()

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // headline: scored-pairs/sec of the full linkage pipeline
    val (nPairs, pipeSec) = pipelineThroughput(spark, familiesFor(sfDir))
    val pairsPerSec = nPairs / pipeSec

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum + pipeSec
    println(
      f"""{"metric":"scored_pairs_per_sec","value":$pairsPerSec%.1f,"unit":"pairs/sec","scored_pairs":$nPairs%d,"pipeline_sec":$pipeSec%.3f,"total_sec":$total%.3f,"queries":$qs%s,"sf":"$sfDir%s","cpus":$cpus%d}""")
    spark.stop()
  }
}
