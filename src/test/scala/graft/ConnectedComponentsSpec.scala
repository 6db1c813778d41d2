package graft

import graft.operators.ConnectedComponents
import org.apache.spark.sql.functions._

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(nodes: Seq[String], edges: Seq[(String, String)]): Map[String, String] = {
    val n = nodes.toDF("id")
    val e = edges.toDF("src", "dst")
    ConnectedComponents.run(n, e).as[(String, String)].collect().toMap
  }

  test("chain collapses to one component rooted at min id") {
    val got = cc(Seq("a", "b", "c", "d", "e"),
      Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e"))
    assert(got.values.toSet == Set("a"))
    assert(got.keySet == Set("a", "b", "c", "d", "e"))
  }

  test("isolated nodes are their own components") {
    val got = cc(Seq("a", "b", "x", "y"), Seq("a" -> "b"))
    assert(got("x") == "x" && got("y") == "y" && got("a") == "a" && got("b") == "a")
  }

  test("two components stay separate; duplicate + reversed edges are fine") {
    val got = cc(Seq("a", "b", "c", "p", "q"),
      Seq("b" -> "a", "a" -> "b", "b" -> "c", "q" -> "p"))
    assert(got("c") == "a" && got("q") == "p")
  }

  test("deterministic across partitionings (label-invariance)") {
    val nodes = (0 until 200).map(i => f"n$i%03d")
    val edges = (0 until 199 by 2).map(i => f"n$i%03d" -> f"n${i + 1}%03d") ++
      (0 until 190 by 10).map(i => f"n$i%03d" -> f"n${i + 5}%03d")
    val a = cc(nodes, edges)
    val b = {
      val n = nodes.toDF("id").repartition(7)
      val e = edges.toDF("src", "dst").repartition(3)
      ConnectedComponents.run(n, e).as[(String, String)].collect().toMap
    }
    assert(a == b)
  }

  test("local contraction preserves connectivity across partition layouts") {
    // long chain whose edges are scattered over many partitions: contraction
    // collapses per-partition runs, the star iteration stitches across —
    // result must match the single-partition answer exactly
    val nodes = (0 until 300).map(i => f"c$i%03d")
    val edges = (0 until 299).map(i => f"c$i%03d" -> f"c${i + 1}%03d")
    val one = cc(nodes, edges)
    val scattered = ConnectedComponents.run(
      nodes.toDF("id"),
      edges.toDF("src", "dst").repartition(17)) // arbitrary scatter
      .as[(String, String)].collect().toMap
    assert(one == scattered)
    assert(one.values.toSet == Set("c000"))
  }

  test("star graph converges in few iterations") {
    val nodes = (0 until 50).map(i => f"s$i%02d")
    val edges = (1 until 50).map(i => f"s00" -> f"s$i%02d")
    val got = cc(nodes, edges)
    assert(got.values.toSet == Set("s00"))
  }

  test("driver endgame and star iteration agree exactly") {
    // a messy deterministic graph: chains, a star, isolated nodes, dup edges
    val rnd = new scala.util.Random(5)
    val nodes = (0 until 120).map(i => f"n$i%03d")
    val edges = (0 until 200).map { _ =>
      val a = rnd.nextInt(120); val b = rnd.nextInt(120)
      f"n$a%03d" -> f"n$b%03d"
    }
    val nodesDf = nodes.toDF("id")
    val edgesDf = edges.toDF("src", "dst").repartition(13)
    val viaDriver = ConnectedComponents.run(nodesDf, edgesDf)
      .as[(String, String)].collect().toMap // contracted <= 500k => endgame
    val viaStars = ConnectedComponents.run(nodesDf, edgesDf, driverFinishEdges = -1L)
      .as[(String, String)].collect().toMap // forced distributed star path
    assert(viaDriver == viaStars)
    assert(viaDriver.size == 120)
  }

  test("non-convergence within maxIter fails loudly, never a silent wrong assignment (review r5)") {
    val nodes = Seq("a", "b", "c").toDF("id")
    val edges = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      // force the star path (driverFinishEdges = -1) with zero allowed
      // iterations: the loop exits unconverged and must throw
      ConnectedComponents.run(nodes, edges, maxIter = 0, driverFinishEdges = -1L)
    }
    assert(e.getMessage.contains("did not converge"), e.getMessage)
  }
}
