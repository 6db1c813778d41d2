package graft

import org.apache.spark.sql.DataFrame

/** Diagnostic benchmark main (guide §1.4 — noop-sink isolation; NOT part of
  * the driver contract, which is frozen in Bench.scala): times individual
  * queries with repetitions, optionally through the noop sink (computes every
  * column, discards output) instead of the sweep's count() action. Job
  * descriptions label everything.
  *
  * Usage:
  *   sbt "runMain graft.BenchExtra queries q_tf_cosine,q_skew_dedup 3 noop"
  *   sbt "runMain graft.BenchExtra queries q_tf_cosine 3 count"
  * (Pipeline stage profiling lives in the test-side graft.StageProf.)
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same as Bench).
  */
object BenchExtra {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def runNoop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val mode = if (args.nonEmpty) args(0) else "queries"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Bench.session(cpus)
    spark.sparkContext.setLogLevel("WARN")

    mode match {
      case "queries" =>
        require(args.length > 1,
          "usage: BenchExtra queries <q_a,q_b,...> [reps] [count|noop]")
        val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
        val reps = if (args.length > 2) args(2).toInt else 3
        val action = if (args.length > 3) args(3) else "count"
        names.foreach { name =>
          val fn = SparkEntry.queries(name)
          val secs = (1 to reps).map { i =>
            spark.sparkContext.setJobDescription(s"$name rep$i ($action)")
            val (_, s) = time {
              val df = fn(spark, sfDir)
              if (action == "noop") runNoop(df) else df.count()
            }
            s
          }
          println(f"EXTRA $name%-24s load=${Bench.loadavg()}%5.1f " +
            secs.map(s => f"$s%.3f").mkString("[", ",", "]"))
        }

      case other =>
        sys.error(s"unknown mode $other (queries)")
    }
    spark.stop()
  }
}
