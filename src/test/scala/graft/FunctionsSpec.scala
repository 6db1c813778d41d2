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

  test("signature drift pins: minhash bands / hyperplane sig / simhash exact values") {
    // review r6: the planted ANN/blocking oracles are INVARIANT to the
    // signature functions themselves (identical or parallel vectors share a
    // bucket under ANY deterministic signature), so seed / bit-order /
    // banding / weight-derivation drift cannot fail them — it is pinned
    // HERE instead, as exact output values on fixed inputs. A deliberate
    // signature change must update these literals (and invalidates
    // cross-round comparability of block keys — see Mentions.withBlockKeys).
    val df = spark.range(1)
    val mb = df.select(graft.functions.VecFunctions
        .minhash_bands(typedlit(Seq(1L, 2L, 3L)), 32, 16, 42L).as("b"))
      .head.getSeq[Long](0)
    assert(mb == Seq(-2569732219986722342L, 5216023830905175542L,
      -314624701663383936L, 3777864578504640940L, 3651893805533619867L,
      -3237696148506739582L, 5406929370569672698L, 5069083951008136707L,
      4759578107192813882L, -2937527737056187298L, 5816301239224731532L,
      2256147535288906695L, 4495250372419796650L, -8143432167961650251L,
      -8276550322158426841L, -2769264594999020613L), s"minhash bands drifted: $mb")
    val hs1 = df.select(graft.operators.SimilaritySearch
        .hyperplaneSig(typedlit(Seq(1.0, -2.0, 3.0)), 4, 42L).as("s"))
      .head.getLong(0)
    assert(hs1 == 12L, s"hyperplane sig (4 planes, seed 42) drifted: $hs1")
    val hs2 = df.select(graft.operators.SimilaritySearch
        .hyperplaneSig(typedlit(Seq(0.5, 0.5, -1.0)), 16, 1042L).as("s"))
      .head.getLong(0)
    assert(hs2 == 58109L, s"hyperplane sig (16 planes, seed 1042) drifted: $hs2")
    val sh = df.select(graft.functions.SimHash64.simhash(
        array(expr("xxhash64('a')"), expr("xxhash64('b')"))).as("s"))
      .head.getLong(0)
    assert(sh == -9205289395534126912L, s"simhash64 drifted: $sh")
  }

  test("nearest_centroid matches the interpreted argmin tree (r7 IVF kernel)") {
    // the codegen kernel replaced array_position(d, array_min(d)) - 1 over
    // transform(typedlit(cts), ct -> aggregate(zip_with(...))); this pins
    // the equivalence on every edge the scaladoc claims: plain argmin,
    // first-wins ties, NaN-greatest ordering, dim-mismatch skip, null
    // component, and the all-skipped degenerate
    import graft.functions.VecFunctions.nearest_centroid
    val cts = Array(Array(0.0, 0.0), Array(1.0, 1.0), Array(5.0, 5.0))
    def interp(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val ctLit = typedlit(cts.map(_.toSeq).toSeq)
      val d = transform(ctLit, ct =>
        aggregate(zip_with(v, ct, (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x))
      (array_position(d, array_min(d)) - 1).cast("int")
    }
    val vecs = Seq(
      Seq(0.9, 1.1),          // plain: centroid 1
      Seq(0.5, 0.5),          // exact tie between 0 and 1 -> FIRST (0)
      Seq(Double.NaN, 0.0),   // NaN component -> all dists NaN -> cid 0 both ways
      Seq(7.0, 7.0),          // plain: centroid 2
      Seq(1.0, 2.0, 3.0))     // dim mismatch vs every centroid -> null both ways
    val df = vecs.toDF("v")
    val got = df.select(nearest_centroid($"v", cts).as("k"),
      interp($"v").as("e")).collect()
    got.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1) &&
        (r.isNullAt(0) || r.getInt(0) == r.getInt(1)),
        s"kernel ${if (r.isNullAt(0)) "null" else r.getInt(0)} != interpreted " +
          s"${if (r.isNullAt(1)) "null" else r.getInt(1)}")
    }
    assert(got(1).getInt(0) == 0, "tie must keep the first centroid")
    assert(got(4).isNullAt(0), "all-dims-mismatched must be null")
  }

  test("shingle_hashes kernel is bit-identical to the expression tree it replaced (r7)") {
    // the old form, verbatim (Mentions.shingleHashes pre-r7): every value
    // the kernel emits must match it exactly — the minhash band keys (and
    // therefore every LSH block) derive from these hashes
    def old(tokens: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
      when(size(tokens) < k, array(xxhash64(array_join(tokens, " "))))
        .otherwise(transform(
          sequence(lit(0), size(tokens) - k),
          i => xxhash64(array_join(slice(tokens, i + lit(1), lit(k)), " "))))
    val rng = new scala.util.Random(7)
    val rows: Seq[Seq[String]] = Seq(
      Seq.empty[String],              // n = 0 -> hash of ""
      Seq("solo"),                    // n < k
      Seq("a", "b", "c"),             // n < k boundary (k = 4)
      Seq("a", "", "b", "", "c"),     // empty tokens preserved verbatim
      Seq("exact", "four", "token", "row")) ++ // n = k
      (0 until 40).map(_ => Seq.fill(rng.nextInt(30))(
        rng.alphanumeric.take(rng.nextInt(12)).mkString))
    val df = rows.toDF("tokens")
    val got = df.select(
      graft.operators.Mentions.shingleHashes($"tokens", 4).as("kernel"),
      old($"tokens", 4).as("tree")).collect()
    got.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1),
      s"shingle drift on ${r}"))
    // null array -> null, as before
    val nullRow = Seq(Tuple1[Option[Seq[String]]](None)).toDF("tokens")
      .select(graft.operators.Mentions.shingleHashes($"tokens", 4)).head
    assert(nullRow.isNullAt(0))
  }

  test("array_any_contains matches exists(exists(contains)) in WHERE semantics (r7 P4 kernel)") {
    import graft.functions.ArrayAnyContains.array_any_contains
    val rows = Seq(
      (Seq("foobar", "baz"), Seq("oba")),   // substring hit
      (Seq("foo"), Seq("foo")),             // equality counts (unlike F8)
      (Seq("foo"), Seq("foobar")),          // one-directional: no
      (Seq.empty[String], Seq("x")),        // empty vocab: no
      (Seq("abc"), Seq.empty[String]))      // empty names: no
    val df = rows.toDF("vocab", "names")
    val kernel = df.where(array_any_contains($"vocab", $"names")).count()
    val lambda = df.where(exists($"vocab",
      t => exists($"names", n => t.contains(n)))).count()
    assert(kernel == lambda && kernel == 2L)
  }
}
