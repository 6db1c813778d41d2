package graft

import java.nio.file.{Files, Paths}

/** Diagnostic main (round 7 optimization work — NOT part of the driver
  * contract): dumps `.explain("formatted")` for every SparkEntry query into
  * a directory, so plan shapes (Exchange count, join strategy, PushedFilters,
  * WholeStageCodegen spans) can be committed as before/after evidence.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... \
  *          sbt "runMain graft.PlanDump plans/r07 _before [q_a,q_b]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.length > 0) args(0) else "plans/r07"
    val suffix = if (args.length > 1) args(1) else "_before"
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet) else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Bench.session(cpus)
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        val txt =
          try {
            val df = fn(spark, sfDir)
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
          } catch { case e: Throwable => s"ERROR building plan: $e" }
        Files.write(Paths.get(outDir, s"$name$suffix.txt"),
          txt.getBytes("UTF-8"))
        println(s"dumped $name")
      }
    spark.stop()
  }
}
