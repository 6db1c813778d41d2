package graft

import graft.functions.{JaroWinkler, MinHashBands}
import graft.functions.StringSim.jaro_winkler
import graft.functions.VecFunctions.sorted_vec_dot
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("jaro_winkler known values (standard Winkler vectors)") {
    // canonical published values for the standard algorithm
    assert(math.abs(JaroWinkler.similarity("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-9)
    assert(math.abs(JaroWinkler.similarity("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-9)
    assert(math.abs(JaroWinkler.similarity("JELLYFISH", "SMELLYFISH") - 0.8962962962962964) < 1e-9)
    assert(JaroWinkler.similarity("same", "same") == 1.0)
    assert(JaroWinkler.similarity("", "abc") == 0.0)
    assert(JaroWinkler.similarity("abc", "xyz") == 0.0)
  }

  test("jaro_winkler properties: range, symmetry, identity (seeded fuzz)") {
    val rnd = new scala.util.Random(42)
    def randStr() = (0 until rnd.nextInt(20)).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    (0 until 500).foreach { _ =>
      val a = randStr(); val b = randStr()
      val s = JaroWinkler.similarity(a, b)
      assert(s >= 0.0 && s <= 1.0)
      assert(math.abs(s - JaroWinkler.similarity(b, a)) < 1e-12)
      if (a.nonEmpty) assert(JaroWinkler.similarity(a, a) == 1.0)
    }
  }

  test("jaro_winkler as column expression (codegen path)") {
    val df = Seq(("MARTHA", "MARHTA"), ("kubernetes", "kuberntes"))
      .toDF("a", "b")
      .withColumn("jw", jaro_winkler($"a", $"b"))
    val rows = df.orderBy($"a").collect() // "MARTHA" sorts before "kubernetes"
    assert(math.abs(rows(0).getDouble(2) - 0.9611111111111111) < 1e-9)
    assert(rows(1).getDouble(2) > 0.9)
    // interpreted eval agrees with codegen
    val interp = JaroWinkler.similarity("kubernetes", "kuberntes")
    assert(math.abs(rows(1).getDouble(2) - interp) < 1e-12)
  }

  test("sorted_vec_dot merges sorted sparse vectors; unit vectors give cosine 1") {
    val df = Seq(
      (Seq(1L, 5L, 9L), Seq(0.6, 0.8, 0.0), Seq(1L, 5L), Seq(0.6, 0.8)),
      (Seq(1L, 2L), Seq(1.0, 0.0), Seq(3L, 4L), Seq(1.0, 0.0))
    ).toDF("h1", "w1", "h2", "w2")
      .withColumn("dot", sorted_vec_dot($"h1", $"w1", $"h2", $"w2"))
    val got = df.select($"dot").as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(got(1) == 0.0)
  }

  test("minhash bands: identical inputs share all bands, disjoint share none") {
    def keys(xs: Array[Long]) =
      MinHashBands.bandKeys(ArrayData.toArrayData(xs), 32, 8, 42L).toSeq
    val a = Array(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L)
    assert(keys(a) == keys(a.clone()))
    val b = Array(100L, 200L, 300L, 400L)
    assert(keys(a).toSet.intersect(keys(b).toSet).isEmpty)
    // high-overlap sets share at least one band (32 hashes / 8 bands, r=4)
    val c = a.clone(); c(7) = 99L
    assert(keys(a).toSet.intersect(keys(c).toSet).nonEmpty)
  }

  test("confidence mapping F11 matches reference semantics incl. truncation") {
    import graft.operators.Decisions
    val t = 0.93
    def ref(score: Double): Double = { // ConfidenceHelper.scala:6-16 verbatim
      if (score > t) {
        val step = 20.0 / ((1.0 - t) * 100)
        ((((score * 100) - (t * 100)).toInt * step) + 80) / 100
      } else 0.55
    }
    val scores = Seq(0.0, 0.5, 0.93, 0.931, 0.95, 0.97, 0.99, 0.999, 1.0)
    val got = scores.toDF("s")
      .withColumn("c", Decisions.confidence($"s", t))
      .orderBy($"s").as[(Double, Double)].collect()
    scores.sorted.zip(got).foreach { case (s, (_, c)) =>
      assert(math.abs(c - ref(s)) < 1e-9, s"score=$s got=$c want=${ref(s)}")
    }
  }
}
