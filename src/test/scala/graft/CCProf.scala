package graft.operators

import graft._
import org.apache.spark.sql.functions._

/** Diagnostic main (r7 optimization): edge-volume profile of the pipeline's
  * connected-components input — how many canonical edges, how many survive
  * the per-partition contraction (i.e. does the driver endgame fire at bench
  * scale, or does the star iteration run?). NOT a benchmark artifact.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.operators.CCProf [families]"
  */
object CCProf {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val fams = args.headOption.map(_.toInt).getOrElse(12000)
    val spark = Bench.session(cpus)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val corpus = Bench.materializedCorpus(spark, fams)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    corpus.count()
    val conf = GraftConf()
    val mentions = Mentions.prepare(spark, corpus, sources.SynthCorpus.aliasDict, conf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = Blocking.candidatePairs(Blocking(mentions, conf).blocks, conf)
    val scored = Scoring.score(pairs, mentions, PairWeights.default, conf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    scored.count()

    val edges = scored.where($"score" > conf.linkThreshold)
      .select($"leftId".as("src"), $"rightId".as("dst"))
    val canonical = edges
      .select(greatest($"src", $"dst").as("src"), least($"src", $"dst").as("dst"))
      .where($"src" =!= $"dst")
    println(s"CCPROF canonical_edges=${canonical.count()}")
    val t0 = System.nanoTime()
    val c1 = ConnectedComponents.localContract(canonical).localCheckpoint(true)
    println(f"CCPROF contracted_pass1=${c1.count()} (${(System.nanoTime()-t0)/1e9}%.2f s)")
    val t1 = System.nanoTime()
    val c2 = ConnectedComponents
      .localContract(c1.repartition(col("src"))).localCheckpoint(true)
    println(f"CCPROF contracted_pass2=${c2.count()} (${(System.nanoTime()-t1)/1e9}%.2f s)")
    spark.stop()
  }
}
