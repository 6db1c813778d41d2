package graft

import graft.functions.{JaroWinkler, MinHashBands, SortedLongIntersectCount, SortedVecDot}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests (SURVEY.md §5 strategy) over the pure-JVM kernels of the
  * custom Catalyst expressions — no SparkSession, so thousands of cases run
  * in milliseconds. Spark-plan-level properties (blocking recall, CC
  * idempotence, determinism across partitionings) live in the ScalaTest
  * specs.
  */
object FunctionProps extends Properties("graft.functions") {

  private val word: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))

  property("jaroWinkler in [0,1]") = forAll(word, word) { (a, b) =>
    val s = JaroWinkler.similarity(a, b)
    s >= 0.0 && s <= 1.0
  }

  property("jaroWinkler symmetric") = forAll(word, word) { (a, b) =>
    JaroWinkler.similarity(a, b) == JaroWinkler.similarity(b, a)
  }

  property("jaroWinkler identity") = forAll(word) { a =>
    a.isEmpty || JaroWinkler.similarity(a, a) == 1.0
  }

  property("jaroWinkler detects disjoint alphabets as 0") =
    forAll(Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c')),
      Gen.nonEmptyListOf(Gen.oneOf('x', 'y', 'z'))) { (a, b) =>
      JaroWinkler.similarity(a.mkString, b.mkString) == 0.0
    }

  private val shingles: Gen[Array[Long]] =
    Gen.nonEmptyListOf(Gen.choose(Long.MinValue, Long.MaxValue)).map(_.toArray)

  property("minhash bands: arity, determinism, order/dup invariance") =
    forAll(shingles) { xs =>
      def keys(a: Array[Long]): Seq[Long] =
        MinHashBands.bandKeys(ArrayData.toArrayData(a), 32, 16, 42L).toSeq
      val k = keys(xs)
      k.length == 16 && k == keys(xs.reverse) && k == keys(xs ++ xs)
    }

  property("minhash bands: band collision prob grows with overlap") =
    forAll(Gen.listOfN(60, Gen.choose(Long.MinValue, Long.MaxValue))) { base =>
      val a = base.toArray
      // identical sets collide on every band
      MinHashBands.bandKeys(ArrayData.toArrayData(a), 32, 16, 7L).toSeq ==
        MinHashBands.bandKeys(ArrayData.toArrayData(a.reverse), 32, 16, 7L).toSeq
    }

  private val sparse: Gen[Map[Long, Double]] =
    Gen.mapOf(Gen.zip(Gen.choose(-1000L, 1000L), Gen.choose(-10.0, 10.0)))

  property("sorted_vec_dot equals naive sparse dot, commutes") =
    forAll(sparse, sparse) { (m1, m2) =>
      def arrs(m: Map[Long, Double]) = {
        val s = m.toSeq.sortBy(_._1)
        (ArrayData.toArrayData(s.map(_._1).toArray),
          ArrayData.toArrayData(s.map(_._2).toArray))
      }
      val (h1, w1) = arrs(m1)
      val (h2, w2) = arrs(m2)
      val naive = m1.keysIterator.filter(m2.contains).map(k => m1(k) * m2(k)).sum
      val got = SortedVecDot.dot(h1, w1, h2, w2)
      val gotSwap = SortedVecDot.dot(h2, w2, h1, w1)
      math.abs(got - naive) <= 1e-9 * math.max(1.0, math.abs(naive)) && got == gotSwap
    }

  private val longSet: Gen[Set[Long]] =
    Gen.listOf(Gen.chooseNum(-50L, 50L)).map(_.toSet)

  property("sorted_long_intersect_count equals set intersection, commutes") =
    forAll(longSet, longSet) { (a, b) =>
      def arr(s: Set[Long]) = ArrayData.toArrayData(s.toArray.sorted)
      val got = SortedLongIntersectCount.count(arr(a), arr(b))
      val gotSwap = SortedLongIntersectCount.count(arr(b), arr(a))
      got == a.intersect(b).size && got == gotSwap
    }
}
