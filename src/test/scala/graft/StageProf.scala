package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Diagnostic main: per-stage wall-time profile of the headline pipeline at
  * bench size. NOT a benchmark artifact — each stage is forced with its own
  * count() after a persist, so the sum exceeds the end-to-end wall (every
  * stage boundary pays a materialization the fused plan would pipeline);
  * the value is the RATIO between stages, which says where optimization
  * effort goes. Usage:
  *
  *   SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.StageProf [families]"
  */
object StageProf {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val fams = args.headOption.map(_.toInt).getOrElse(12000)
    val spark = Bench.session(cpus)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val corpus = Bench.materializedCorpus(spark, fams)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    corpus.count()
    // warm-up: JIT/codegen, same as Bench
    Bench.pipelineThroughput(spark, corpus)
    // drop the warm-up run's leftovers, then RE-persist and RE-materialize
    // the corpus (review r6: clearCache() unregistered the corpus persist
    // too, so every probe and stage below silently paid a full corpus
    // parquet re-scan inside its timer — the ratios skewed toward input
    // scan cost instead of the marginal stage cost this profiler reports)
    spark.catalog.clearCache()
    corpus.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val corpusRows = corpus.count() // materializes; reused by sub:tfidf so
    // the row-count job stays outside that probe's timer

    val conf = GraftConf()
    def timed[A](name: String)(f: => A): A = {
      val l0 = Bench.loadavg(); val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $name%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (load $l0%.1f -> ${Bench.loadavg()}%.1f)")
      r
    }

    // sub-profile of the dominant stage: each probe forces ONE expensive
    // sub-plan via an aggregate that cannot be pruned away. Every probe
    // pays the tokenize pass again (content -> tokens feeds all three), so
    // subtract the tokenize baseline to read the marginal costs.
    val base = Mentions.build(spark, corpus, sources.SynthCorpus.aliasDict, conf)
    timed("sub:tokenize") {
      base.select(sum(size($"tokens"))).collect()
    }
    timed("sub:blockKeys") {
      Mentions.withBlockKeys(base, conf)
        .select(sum(size($"blockKeys"))).collect()
    }
    timed("sub:tfidf") {
      Mentions.tfidfVectors(base.select($"id", $"tokens"), conf, corpusRows)
        .select(sum(size($"vecH"))).collect()
    }

    val mentions = timed("mentions") {
      val m = Mentions.prepare(spark, corpus, sources.SynthCorpus.aliasDict, conf)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      m.count(); m
    }
    val blocks = timed("blocks") {
      val b = Blocking(mentions, conf).blocks
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      b.count(); b
    }
    val pairs = timed("pairs") {
      val p = Blocking.candidatePairs(blocks, conf)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count(); p
    }
    val scored = timed("scored") {
      val sc = Scoring.score(pairs, mentions, PairWeights.default, conf)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      sc.count(); sc
    }
    val components = timed("components") {
      val edges = scored.where($"score" > conf.linkThreshold)
        .select($"leftId".as("src"), $"rightId".as("dst"))
      val c = ConnectedComponents.run(mentions.select($"id"), edges,
          maxIter = conf.ccMaxIter)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      c.count(); c
    }
    timed("decisions") {
      Decisions.assemble(components,
        scored.where($"score" > conf.linkThreshold), None, conf.linkThreshold).count()
    }
    println(s"rows: mentions=${mentions.count()} blocks=${blocks.count()} " +
      s"pairs=${pairs.count()} scored=${scored.count()} components=${components.count()}")
    spark.stop()
  }
}
