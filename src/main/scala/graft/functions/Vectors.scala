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

/** argmin over squared-L2 distances from `child` (array<double>) to a fixed
  * centroid table — the IVF assignment kernel (r7, guide §1.2 per-task
  * work): the former `array_position(d, array_min(d)) - 1` over
  * `transform(typedlit(centroids), ct -> aggregate(zip_with(...)))` ran the
  * whole nlist×dim distance computation through interpreted higher-order
  * functions, allocating a lambda frame per element and an array per
  * centroid, once per row per Lloyd iteration. This expression is one
  * codegen'd primitive loop with ZERO allocation per row.
  *
  * Semantics are IDENTICAL to the replaced expression tree:
  *  - distances accumulate left-to-right (same IEEE sum order as
  *    `aggregate`), so every distance is bit-equal;
  *  - ties keep the FIRST (lowest) centroid index — `array_position` finds
  *    the first element equal to the min, and this loop only replaces the
  *    best on a strictly-smaller compare;
  *  - comparisons use `java.lang.Double.compare`, matching Spark's
  *    NaN-greatest ordering in `array_min` (all-NaN input degenerates to
  *    centroid 0 on both paths, mixed NaN/real picks the real min);
  *  - a centroid whose dimension differs from the row's would have produced
  *    a NULL distance via zip_with's null-padding and been IGNORED by
  *    array_min — the loop skips it the same way; a row with a NULL element
  *    nulled every distance and the final cid — the loop returns null;
  *  - null row → null (UnaryExpression null propagation).
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroid"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else NearestCentroid.argmin(v.asInstanceOf[ArrayData], centroids)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val c = child.genCode(ctx)
    val tmp = ctx.freshName("cid")
    val code = org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper(
      new StringContext(
        s"""
           |${c.code.toString}
           |boolean ${ev.isNull} = ${c.isNull};
           |int ${ev.value} = -1;
           |if (!${ev.isNull}) {
           |  java.lang.Integer $tmp =
           |    graft.functions.NearestCentroid.argmin(${c.value}, $cRef);
           |  if ($tmp == null) { ${ev.isNull} = true; }
           |  else { ${ev.value} = $tmp.intValue(); }
           |}
         """.stripMargin)).code()
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroid {
  def argmin(v: ArrayData, cts: Array[Array[Double]]): java.lang.Integer = {
    val n = v.numElements()
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null // a null component nulls every distance
      i += 1
    }
    var best = -1
    var bestD = 0.0
    var c = 0
    while (c < cts.length) {
      val ct = cts(c)
      if (ct.length == n) { // dim mismatch ≡ zip_with null-padding: skipped
        var d = 0.0
        var k = 0
        while (k < n) {
          val diff = v.getDouble(k) - ct(k)
          d += diff * diff
          k += 1
        }
        if (best < 0 || java.lang.Double.compare(d, bestD) < 0) {
          best = c; bestD = d
        }
      }
      c += 1
    }
    if (best < 0) null else java.lang.Integer.valueOf(best)
  }
}

/** k-shingle xxhash64 hashes over a token array — the fused codegen form of
  * Mentions.shingleHashes' former expression tree (r7, guide §1.2 per-task
  * work):
  *
  *   when(size(t) < k, array(xxhash64(array_join(t, " "))))
  *     .otherwise(transform(sequence(0, size(t) - k),
  *       i => xxhash64(array_join(slice(t, i + 1, k), " "))))
  *
  * which per ROW allocated a sequence array, and per WINDOW a slice
  * ArrayData, a joined UTF8String and a lambda evaluation frame — the
  * dominant cost of minhash block-key construction (every token is copied
  * k times through slices). This kernel exploits that for null-free tokens,
  * `array_join(slice(t, i+1, k), " ")` is a CONTIGUOUS BYTE RANGE of
  * `array_join(t, " ")` (single-space separator, empties included
  * verbatim): it builds the full joined buffer once per row and hashes each
  * window as an offset/length slice of it — zero per-window allocation,
  * identical bytes, identical xxhash64 (seed 42, same as the xxhash64 SQL
  * function). Rows containing a null token fall back to a per-window join
  * that skips nulls exactly like array_join. Null array → null; n < k
  * (including n = 0) → one hash of the full join, as before.
  */
case class ShingleHashes(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(k >= 1, "shingle width k must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else ShingleHashes.hashes(v.asInstanceOf[ArrayData], k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val code = org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper(
      new StringContext(
        s"""
           |${c.code.toString}
           |boolean ${ev.isNull} = ${c.isNull};
           |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
           |if (!${ev.isNull}) {
           |  ${ev.value} = graft.functions.ShingleHashes.hashes(${c.value}, $k);
           |}
         """.stripMargin)).code()
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  private final val Seed = 42L // xxhash64's fixed SQL-function seed
  private final val ByteOffset = org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET

  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  import org.apache.spark.unsafe.types.UTF8String

  def hashes(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (tokens.isNullAt(i)) return hashesWithNulls(tokens, k)
      i += 1
    }
    // single joined buffer; starts(i) = byte offset of token i, ends(i) =
    // end of token i, window [i, i+k) = bytes [starts(i), ends(i+k-1))
    val strs = new Array[UTF8String](n)
    var total = 0
    i = 0
    while (i < n) {
      strs(i) = tokens.getUTF8String(i)
      total += strs(i).numBytes
      i += 1
    }
    if (n > 0) total += n - 1 // single-space separators
    val buf = new Array[Byte](total)
    val starts = new Array[Int](n)
    var off = 0
    i = 0
    while (i < n) {
      if (i > 0) { buf(off) = ' '; off += 1 }
      starts(i) = off
      org.apache.spark.unsafe.Platform.copyMemory(
        strs(i).getBaseObject, strs(i).getBaseOffset,
        buf, ByteOffset + off, strs(i).numBytes)
      off += strs(i).numBytes
      i += 1
    }
    if (n < k) {
      new GenericArrayData(Array(XXH64.hashUnsafeBytes(buf, ByteOffset, total, Seed)))
    } else {
      val out = new Array[Long](n - k + 1)
      i = 0
      while (i <= n - k) {
        val s = starts(i)
        val e = starts(i + k - 1) + strs(i + k - 1).numBytes
        out(i) = XXH64.hashUnsafeBytes(buf, ByteOffset + s, e - s, Seed)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Null-token fallback: per-window array_join semantics (nulls skipped,
    * no separator for them) — correctness parity for inputs the engine's
    * own tokenizers never produce.
    */
  private def hashesWithNulls(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    val sep = UTF8String.fromString(" ")
    def joinHash(from: Int, until: Int): Long = {
      val parts = (from until until).collect {
        case j if !tokens.isNullAt(j) => tokens.getUTF8String(j)
      }
      val s = UTF8String.concatWs(sep, parts: _*)
      XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)
    }
    if (n < k) new GenericArrayData(Array(joinHash(0, n)))
    else new GenericArrayData(
      Array.tabulate(n - k + 1)(i => joinHash(i, i + k)))
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

  def nearest_centroid(vec: Column, centroids: Array[Array[Double]]): Column =
    GraftExpr.column(NearestCentroid(GraftExpr.expression(vec), centroids))
}
