package graft

import graft.operators.GraftConf
import graft.plans.Checkpoint
import graft.sources.SynthCorpus
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path}
import scala.reflect.io.Directory

class CheckpointSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String = {
    val p = Files.createTempDirectory("graft-ckpt")
    p.toFile.deleteOnExit()
    p.toString
  }

  test("getOrCompute: computes once, resumes from committed checkpoint") {
    val root = tmpDir()
    val cp = new Checkpoint(spark, root)
    var computed = 0
    def run() = cp.getOrCompute("stage1", "h1", Seq("in")) {
      computed += 1
      Seq((1, "a"), (2, "b")).toDF("k", "v")
    }
    val first = run().collect().toSet
    val second = run().collect().toSet
    assert(computed == 1, "second call must resume, not recompute")
    assert(first == second)
  }

  test("config change invalidates the checkpoint") {
    val root = tmpDir()
    val cp = new Checkpoint(spark, root)
    var computed = 0
    def run(h: String) = cp.getOrCompute("stage1", h, Seq("in")) {
      computed += 1
      Seq((computed, "x")).toDF("k", "v")
    }
    run("h1").count()
    run("h2").count()
    assert(computed == 2)
  }

  test("per-partition metrics and lineage tables are written") {
    val root = tmpDir()
    val cp = new Checkpoint(spark, root)
    cp.getOrCompute("s", "h", Seq("files", "dict")) {
      (0 until 100).toDF("v").repartition(4)
    }.count()
    val metrics = spark.read.parquet(s"$root/s/_metrics")
    assert(metrics.columns.toSet == Set("partitionId", "rows", "stage"))
    assert(metrics.agg(sum($"rows")).head().getLong(0) == 100L)
    val lineage = spark.read.parquet(s"$root/s/_lineage").collect()
    assert(lineage.length == 1)
    val r = lineage.head
    assert(r.getAs[String]("inputs") == "files,dict" && r.getAs[Boolean]("committed"))
  }

  test("kill-and-resume: uncommitted stage (missing lineage) recomputes") {
    val root = tmpDir()
    val cp = new Checkpoint(spark, root)
    var computed = 0
    def run() = cp.getOrCompute("s", "h", Seq("in")) {
      computed += 1
      Seq((1, "a")).toDF("k", "v")
    }
    run().count()
    // simulate crash between data write and lineage commit
    new Directory(new java.io.File(s"$root/s/_lineage")).deleteRecursively()
    run().count()
    assert(computed == 2, "missing commit marker must force recompute")
  }

  test("pipeline end-to-end resume: second run reuses all checkpoints and matches") {
    val root = tmpDir()
    val files = SynthCorpus.corpus(spark, families = 6, variants = 4)
    def run() = Pipeline.runCheckpointed(
      spark, files, SynthCorpus.aliasDict, root, GraftConf())
    val d1 = run().decisions.orderBy($"mentionId").collect()
    val t0 = System.nanoTime()
    val d2 = run().decisions.orderBy($"mentionId").collect()
    val resumeSec = (System.nanoTime() - t0) / 1e9
    info(f"resume pass took $resumeSec%.1fs")
    assert(d1.toSeq == d2.toSeq)
    // all five stages committed
    val stages = Seq("mentions", "blocks", "blocks_overflow", "scored_pairs",
      "components", "decisions")
    stages.foreach { s =>
      assert(Files.exists(Path.of(s"$root/$s/_lineage")), s"missing lineage for $s")
    }
  }
}
