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
    // 30000 families (240k mentions, ~2.45M scored pairs) is the standing
    // round-comparable configuration (BASELINE.md scaling sessions r1-r4);
    // the old 2000-family default produced an 11 s fixed-cost-dominated job
    // whose ratio says nothing about scaling (VERDICT r4 #8). The JSON's
    // `families` field pins whatever was actually used.
    val families = sys.env.getOrElse("SPARK_GRAFT_FAMILIES", "30000").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt

    def session(cpus: Int) = {
      val s = Bench.session(cpus)
      s.sparkContext.setLogLevel("WARN")
      s
    }
    def close(s: org.apache.spark.sql.SparkSession): Unit = {
      s.stop()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
    }
    def runOnce(cpus: Int): Bench.Rep = {
      val spark = session(cpus)
      val r = Bench.pipelineThroughput(spark, Bench.materializedCorpus(spark, families))
      close(spark)
      r
    }

    // one full-size warm-up (not measured): the FIRST full-size run in a JVM
    // pays one-time heap-growth + JIT-at-scale costs (~2-4x). JIT state is
    // JVM-wide, so it survives the session rebuilds below.
    { val s = session(8)
      Bench.pipelineThroughput(s, Bench.materializedCorpus(s, families)); close(s) }

    // INTERLEAVE the parallelism levels (8,32,8,32,...) so both sample the
    // same shared-CPU contention regime — measuring all local[8] reps first
    // and all local[32] reps after lets a contention spike land entirely on
    // one level and corrupt the ratio (observed: a spike during the 32-phase
    // turned a ~1.7x speedup into 1.06x). Best-of-reps per level.
    //
    // ADAPTIVE rep count (review r6, the Bench rule ported): minimum `reps`
    // interleaved pairs, cap 6; after the minimum, another pair runs iff at
    // EITHER level (a) the last draw improved that level's best by >10%
    // (still descending toward steady state) or (b) the last draw sits >40%
    // above that level's best (contended window — keep sampling for a quiet
    // one). The r6 fixed-3 run that motivated this ended 155/113/81 at
    // local[8] — monotonically improving with the budget exhausted, exactly
    // the failure mode the Bench rule already closes.
    val runs = scala.collection.mutable.ArrayBuffer.empty[(Bench.Rep, Bench.Rep)]
    var another = true
    // cap at max(6, reps + 2) (ADVICE r6 #3 + review r7): the unconditional
    // 6 silently reduced SPARK_GRAFT_REPS > 6 below the documented "minimum
    // reps interleaved pairs" contract, and a cap EQUAL to the minimum
    // would leave the adaptive continuation no headroom to fire for
    // reps >= 6 — a run still descending at its last requested pair could
    // not draw again. reps + 2 preserves at least two adaptive draws past
    // any requested minimum (default reps=3 keeps the historical cap 6).
    while (runs.size < math.max(6, reps + 2) && (runs.size < reps || another)) {
      def bestOf(side: ((Bench.Rep, Bench.Rep)) => Bench.Rep) =
        if (runs.isEmpty) Double.MaxValue else runs.map(r => side(r).sec).min
      val (pb8, pb32) = (bestOf(_._1), bestOf(_._2))
      runs += ((runOnce(8), runOnce(32)))
      def wantsMore(prevBest: Double, side: ((Bench.Rep, Bench.Rep)) => Bench.Rep) = {
        val best = runs.map(r => side(r).sec).min
        best <= prevBest * 0.9 || side(runs.last).sec > best * 1.4
      }
      another = wantsMore(pb8, _._1) || wantsMore(pb32, _._2)
    }
    val pairs8 = runs.head._1.pairs
    val pairs32 = runs.head._2.pairs
    require(pairs8 == pairs32, s"nondeterministic pair count: $pairs8 vs $pairs32")
    val reps8 = runs.map(_._1.sec).toSeq
    val reps32 = runs.map(_._2.sec).toSeq
    val loads = runs.flatMap(r => Seq(r._1, r._2))
      .map(x => f"[${x.loadBefore}%.2f,${x.loadAfter}%.2f]")
      .mkString("[", ",", "]")
    val t8 = reps8.min
    val t32 = reps32.min
    val thr8 = pairs8 / t8
    val thr32 = pairs32 / t32
    val eff = (t8 / t32) / 4.0
    val ceiling = hardwareCeilingSpeedup()
    val effNorm = (t8 / t32) / ceiling
    def arr(xs: Seq[Double]) = xs.map(x => f"$x%.3f").mkString("[", ",", "]")
    println(
      f"""{"metric":"scaling_efficiency","value":$eff%.3f,"pairs":$pairs8%d,"t_local8_sec":$t8%.3f,"t_local32_sec":$t32%.3f,"reps_local8_sec":${arr(reps8)}%s,"reps_local32_sec":${arr(reps32)}%s,"pairs_per_sec_local8":$thr8%.1f,"pairs_per_sec_local32":$thr32%.1f,"hw_ceiling_speedup_8_to_32":$ceiling%.2f,"efficiency_vs_hw_ceiling":$effNorm%.3f,"reps_loadavg":$loads%s,"families":$families%d}""")
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
