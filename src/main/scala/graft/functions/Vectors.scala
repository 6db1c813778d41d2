package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftExpr
import org.apache.spark.sql.types._

/** Dot product of two sparse vectors given as parallel sorted arrays
  * (hashes ascending, weights aligned). With unit-normalized weights this IS
  * the cosine similarity — the engine's TF-IDF cosine (reference
  * MentionPairFeatures.scala:212-224, F2 in SURVEY.md §2.4) reduced to a
  * single merge pass. NaN/Infinity guard mirrors the reference (`:220-223`).
  *
  * A merge over sorted arrays is O(n1+n2) with zero allocation — the hot
  * inner loop of pairwise scoring, hence a native expression rather than a
  * Scala UDF (boxing) or `aggregate(map_zip_with(...))` (map building per row).
  */
case class SortedVecDot(h1: Expression, w1: Expression,
                        h2: Expression, w2: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(h1, w1, h2, w2)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_vec_dot"

  override def eval(input: InternalRow): Any = {
    val a = h1.eval(input); val b = w1.eval(input)
    val c = h2.eval(input); val d = w2.eval(input)
    if (a == null || b == null || c == null || d == null) null
    else SortedVecDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData], d.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val e = children.map(_.genCode(ctx))
    val anyNull = e.map(x => x.isNull.toString).mkString(" || ")
    val code = org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper(
      new StringContext(
        s"""
           |${e.map(_.code.toString).mkString("\n")}
           |boolean ${ev.isNull} = ($anyNull);
           |double ${ev.value} = 0.0;
           |if (!${ev.isNull}) {
           |  ${ev.value} = graft.functions.SortedVecDot.dot(
           |    ${e(0).value}, ${e(1).value}, ${e(2).value}, ${e(3).value});
           |}
         """.stripMargin)).code()
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(h1 = c(0), w1 = c(1), h2 = c(2), w2 = c(3))
}

object SortedVecDot {
  def dot(h1: ArrayData, w1: ArrayData, h2: ArrayData, w2: ArrayData): Double = {
    var i = 0; var j = 0
    val n1 = h1.numElements(); val n2 = h2.numElements()
    var acc = 0.0
    while (i < n1 && j < n2) {
      val a = h1.getLong(i); val b = h2.getLong(j)
      if (a == b) { acc += w1.getDouble(i) * w2.getDouble(j); i += 1; j += 1 }
      else if (a < b) i += 1
      else j += 1
    }
    if (java.lang.Double.isNaN(acc) || java.lang.Double.isInfinite(acc)) 0.0 else acc
  }
}

/** MinHash band keys from an array of shingle hashes (array<long>).
  *
  * Implements the Crosswikis-style candidate blocking of the reference's
  * linker stage (RunKBPEntityLinkerSystem.scala:45-49, B1 in SURVEY.md §2.3)
  * as content-shingle LSH: `numHashes` universal-hash permutations
  * min-reduced in ONE pass over the shingle array, then grouped into `bands`
  * band keys (hash of each signature slice). Returns array<long> of length
  * `bands`; null/empty input -> empty array (row blocks on nothing).
  */
case class MinHashBands(child: Expression, numHashes: Int, bands: Int, seed: Long)
    extends Expression {
  require(numHashes % bands == 0, "numHashes must be divisible by bands")
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_bands"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) ArrayData.toArrayData(Array.empty[Long])
    else ArrayData.toArrayData(
      MinHashBands.bandKeys(v.asInstanceOf[ArrayData], numHashes, bands, seed))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val code = org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper(
      new StringContext(
        s"""
           |${c.code.toString}
           |boolean ${ev.isNull} = false;
           |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
           |  org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
           |    ${c.isNull} ? new long[0] :
           |    graft.functions.MinHashBands.bandKeys(
           |      ${c.value}, $numHashes, $bands, ${seed}L));
         """.stripMargin)).code()
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
}

object MinHashBands {
  private final val Prime = 0x9E3779B97F4A7C15L // golden-ratio odd constant

  /** One pass: for each of `numHashes` permutations h_p(x) = mix(x, p, seed),
    * keep the min over all shingles; then hash each band's slice to a key.
    */
  def bandKeys(shingles: ArrayData, numHashes: Int, bands: Int, seed: Long): Array[Long] = {
    val n = shingles.numElements()
    if (n == 0) return Array.empty[Long]
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = shingles.getLong(i)
      var p = 0
      while (p < numHashes) {
        val h = mix(x + seed, p)
        if (h < sig(p)) sig(p) = h
        p += 1
      }
      i += 1
    }
    val rows = numHashes / bands
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = seed + b
      var r = 0
      while (r < rows) { acc = mix(acc ^ sig(b * rows + r), r + 1); r += 1 }
      keys(b) = acc
      b += 1
    }
    keys
  }

  /** splitmix64-style finalizer keyed by permutation index. */
  private def mix(v: Long, p: Int): Long = {
    var z = v + (p + 1) * Prime
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}

object VecFunctions {
  def sorted_vec_dot(h1: Column, w1: Column, h2: Column, w2: Column): Column =
    GraftExpr.column(SortedVecDot(
      GraftExpr.expression(h1), GraftExpr.expression(w1),
      GraftExpr.expression(h2), GraftExpr.expression(w2)))

  def minhash_bands(shingleHashes: Column, numHashes: Int, bands: Int, seed: Long): Column =
    GraftExpr.column(MinHashBands(
      GraftExpr.expression(shingleHashes), numHashes, bands, seed))
}
