package graft

import graft.operators.GraftConf
import graft.sources.SynthCorpus

/** Scaling-efficiency evidence (BASELINE.json: throughput scaling efficiency
  * ≥ 0.8 from N to 4N executors; sandbox stand-in per BASELINE.md — the same
  * job at local[8] vs local[32] on the same input).
  *
  * Runs the full pipeline (the scored-pairs/sec headline job) at both
  * parallelism levels in one JVM (session stopped and rebuilt between runs,
  * shuffle partitions scaled with cores), prints one JSON line with both
  * throughputs and efficiency = (T8 / T32) / 4.
  */
object Scaling {
  def main(args: Array[String]): Unit = {
    val families = sys.env.getOrElse("SPARK_GRAFT_FAMILIES", "2000").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt

    def measure(cpus: Int, warmFull: Boolean): (Long, Double) = {
      val spark = Bench.session(cpus)
      spark.sparkContext.setLogLevel("WARN")
      // steady-state warm-up, not measured: the FIRST full-size run in a JVM
      // pays one-time heap-growth + JIT-at-scale costs (~2-4x) that would
      // corrupt whichever parallelism level runs first
      val warmFams = if (warmFull) families else 4
      Bench.pipelineThroughput(spark, warmFams)
      // best-of-reps to damp GC noise
      val runs = (0 until reps).map(_ => Bench.pipelineThroughput(spark, families))
      spark.stop()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      runs.minBy(_._2)
    }

    val (pairs8, t8) = measure(8, warmFull = true)
    val (pairs32, t32) = measure(32, warmFull = true)
    require(pairs8 == pairs32, s"nondeterministic pair count: $pairs8 vs $pairs32")
    val thr8 = pairs8 / t8
    val thr32 = pairs32 / t32
    val eff = (t8 / t32) / 4.0
    val ceiling = hardwareCeilingSpeedup()
    val effNorm = (t8 / t32) / ceiling
    println(
      f"""{"metric":"scaling_efficiency","value":$eff%.3f,"pairs":$pairs8%d,"t_local8_sec":$t8%.3f,"t_local32_sec":$t32%.3f,"pairs_per_sec_local8":$thr8%.1f,"pairs_per_sec_local32":$thr32%.1f,"hw_ceiling_speedup_8_to_32":$ceiling%.2f,"efficiency_vs_hw_ceiling":$effNorm%.3f,"families":$families%d}""")
  }

  /** Measure what THIS machine can deliver going 8 → 32 plain JVM threads on
    * Spark-free CPU work (Jaro-Winkler over thread-local strings). Shared /
    * throttled vCPUs cap the attainable speedup well below 4× regardless of
    * software; efficiency_vs_hw_ceiling = pipeline speedup / this ceiling
    * separates engine scaling from sandbox hardware. On a real N → 4N
    * EXECUTOR cluster (separate hosts) this ceiling is ~4.
    */
  def hardwareCeilingSpeedup(): Double = {
    def burn(threads: Int, perThreadIters: Int): Double = {
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { t =>
        new Thread(() => {
          val a = s"kubernetes-service-$t"
          val b = s"kuberntes-servcie-$t"
          var acc = 0.0
          var i = 0
          while (i < perThreadIters) {
            acc += graft.functions.JaroWinkler.similarity(a, b); i += 1
          }
          if (acc < 0) println(acc) // defeat DCE
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    burn(8, 50000) // JIT warm-up
    // fixed TOTAL work W: 8 threads do W/8 each, 32 do W/32 each
    val total = 16000000
    val t8 = (0 until 3).map(_ => burn(8, total / 8)).min
    val t32 = (0 until 3).map(_ => burn(32, total / 32)).min
    t8 / t32
  }
}
