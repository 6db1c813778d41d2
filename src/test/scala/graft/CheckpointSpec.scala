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

  test("calibrated checkpointed run: amb is its own stage; decisions match the direct run (r5 #6)") {
    val root = tmpDir()
    val files = SynthCorpus.corpus(spark, families = 6, variants = 4)
    val kb = Some(SynthCorpus.kb(spark, 6))
    val ck = Pipeline.runCheckpointed(spark, files, SynthCorpus.aliasDict, root,
      GraftConf(), kb = kb, kbWeights = graft.operators.KbWeights.calibrated)
    val d1 = ck.decisions.orderBy($"mentionId").collect()
    // the amb aggregate must be table-backed (its own committed stage), so
    // the cold run evaluated the corpus lineage once and a resume reuses it
    assert(Files.exists(Path.of(s"$root/name_ambiguity/_lineage")),
      "calibrated preset must checkpoint the ambiguity aggregate as its own stage")
    val r = Pipeline.run(spark, files, SynthCorpus.aliasDict, GraftConf(),
      kb = kb, kbWeights = graft.operators.KbWeights.calibrated)
    val d2 = r.decisions.orderBy($"mentionId").collect()
    (Seq(r.mentions, r.scored, r.components) ++ r.anchors).foreach(_.unpersist())
    assert(d1.toSeq == d2.toSeq,
      "checkpointed calibrated decisions must match the direct run bit-for-bit")
  }

  test("fingerprint distinguishes duplicate-row multisets (sum, not xor — ADVICE r2)") {
    // two frames, same row count, each all-duplicates: a bit_xor of per-row
    // hashes cancels BOTH to 0 and collides; the decimal-sum must not
    val a = Seq(("x", 1), ("x", 1)).toDF("k", "v")
    val b = Seq(("y", 2), ("y", 2)).toDF("k", "v")
    assert(Checkpoint.fingerprint(a) != Checkpoint.fingerprint(b))
    // and swapping one duplicated pair for another at constant count
    val c = Seq(("x", 1), ("x", 1), ("z", 3)).toDF("k", "v")
    val d = Seq(("y", 2), ("y", 2), ("z", 3)).toDF("k", "v")
    assert(Checkpoint.fingerprint(c) != Checkpoint.fingerprint(d))
    // determinism across partitionings (order-insensitive combine)
    assert(Checkpoint.fingerprint(c.repartition(7)) == Checkpoint.fingerprint(c))
  }

  test("inputFingerprint: same-cardinality content edit invalidates (ADVICE r2 medium)") {
    val dir = tmpDir() + "/in"
    Seq((1, "a")).toDF("k", "v").write.mode("overwrite").parquet(dir)
    val f1 = Checkpoint.inputFingerprint(spark.read.parquet(dir))
    Seq((1, "b")).toDF("k", "v").write.mode("overwrite").parquet(dir)
    val f2 = Checkpoint.inputFingerprint(spark.read.parquet(dir))
    assert(f1 != f2, "row-count-preserving content edit must change the input fingerprint")
    // non-file-backed frames fall back to the content fingerprint
    val mem = Seq((1, "a")).toDF("k", "v")
    assert(Checkpoint.inputFingerprint(mem) == Checkpoint.fingerprint(mem))
  }

  test("Lineage.cut is reliable when a checkpoint dir is set; Rotating deletes stale rounds") {
    import graft.plans.Lineage
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    val root = tmpDir()
    spark.sparkContext.setCheckpointDir(root)
    try {
      val appDir = new HPath(spark.sparkContext.getCheckpointDir.get)
      val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
      def rounds(): Set[String] =
        if (fs.exists(appDir)) fs.listStatus(appDir).map(_.getPath.getName).toSet
        else Set.empty

      val cut = Lineage.cut(Seq(1, 2, 3).toDF("v"))
      assert(cut.collect().map(_.getInt(0)).toSet == Set(1, 2, 3))
      assert(rounds().nonEmpty, "cut() must write a RELIABLE checkpoint when a dir is set")

      val before = rounds()
      val rot = new Lineage.Rotating(Seq(1).toDF("v"))
      val r1 = rot.cut(Seq(10, 20).toDF("v"))
      val afterR1 = rounds()
      val instDirs = (afterR1 -- before).filter(_.startsWith("graft-rotating-"))
      assert(instDirs.size == 1, s"first rotating cut creates ONE instance dir: $afterR1")
      val inst = new HPath(appDir, instDirs.head)
      def instRounds(): Set[String] =
        fs.listStatus(inst).map(_.getPath.getName).toSet
      assert(instRounds() == Set("round-0"))
      val r2 = rot.cut(r1.withColumn("v", $"v" + 1))
      // round 0's files are deleted once round 1 materializes
      assert(instRounds() == Set("round-1"), s"stale round not deleted: ${instRounds()}")
      assert(r2.collect().map(_.getInt(0)).toSet == Set(11, 21), "final round stays readable")
    } finally spark.sparkContext.setCheckpointDir(null)
  }

  test("Rotating round-trips empty frames and drives a real CC star loop under a checkpoint dir") {
    import graft.plans.Lineage
    import graft.operators.ConnectedComponents
    val root = tmpDir()
    spark.sparkContext.setCheckpointDir(root)
    try {
      // empty frame: the parquet round must preserve schema and read back
      val rot = new Lineage.Rotating(Seq(1).toDF("v"))
      val empty = rot.cut(Seq.empty[(String, String)].toDF("src", "dst"))
      assert(empty.count() == 0 && empty.columns.toSeq == Seq("src", "dst"))
      // driverFinishEdges=0 forces the star iteration, so every round's cut
      // goes through the reliable parquet-rotation path
      val nodes = Seq("a", "b", "c", "d", "e", "f").toDF("id")
      val edges = Seq(("a", "b"), ("b", "c"), ("d", "e")).toDF("src", "dst")
      val got = ConnectedComponents.run(nodes, edges, driverFinishEdges = 0L)
        .as[(String, String)].collect().toMap
      assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a",
        "d" -> "d", "e" -> "d", "f" -> "f"))
    } finally spark.sparkContext.setCheckpointDir(null)
  }

  test("Rotating instances are isolated: concurrent loops + a plain cut never cross-delete (ADVICE r3)") {
    import graft.plans.Lineage
    val root = tmpDir()
    spark.sparkContext.setCheckpointDir(root)
    try {
      import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
      val pool = Executors.newFixedThreadPool(3)
      val latch = new CountDownLatch(1)
      def loop(base: Int): java.util.concurrent.Future[Set[Int]] =
        pool.submit { () =>
          latch.await(10, TimeUnit.SECONDS)
          val rot = new Lineage.Rotating(Seq(base).toDF("v"))
          var cur = rot.cut(Seq(base, base + 1).toDF("v"))
          (0 until 4).foreach { _ => cur = rot.cut(cur.withColumn("v", $"v" + 1)) }
          cur.collect().map(_.getInt(0)).toSet
        }
      val plain = pool.submit { () =>
        latch.await(10, TimeUnit.SECONDS)
        // a concurrent RELIABLE plain cut — the old listing-diff design
        // could mis-attribute its files as a Rotating round and delete them
        Lineage.cut(Seq(1000, 2000).toDF("v"))
      }
      val (fa, fb) = (loop(100), loop(500))
      latch.countDown()
      assert(fa.get(120, TimeUnit.SECONDS) == Set(104, 105), "loop A result intact")
      assert(fb.get(120, TimeUnit.SECONDS) == Set(504, 505), "loop B result intact")
      val plainCut = plain.get(120, TimeUnit.SECONDS)
      // read the plain checkpoint AFTER both rotating loops rotated+deleted
      assert(plainCut.collect().map(_.getInt(0)).toSet == Set(1000, 2000),
        "plain reliable checkpoint must survive concurrent rotations")
      pool.shutdown()
    } finally spark.sparkContext.setCheckpointDir(null)
  }
}
