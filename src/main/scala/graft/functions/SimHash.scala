package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpr
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** 64-bit SimHash of an array of feature hashes (array<long>): per-bit
  * majority vote — bit b of the result is 1 iff more features have bit b
  * set than unset. Document fingerprint for near-dup detection
  * [Charikar STOC'02; Manku et al. WWW'07]; one pass, no allocation.
  */
case class SimHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(v: Any): Any =
    SimHash64.simhash64(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64.simhash64($c);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object SimHash64 {
  def simhash64(hashes: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  def simhash(tokenHashes: Column): Column =
    GraftExpr.column(SimHashExpr(GraftExpr.expression(tokenHashes)))
}

/** Random-hyperplane LSH signature of a dense vector (array<double>):
  * `planes` sign bits of Rademacher (+1/-1 pseudo-random, seeded)
  * projections — cosine-LSH bucketing [Charikar STOC'02].
  */
case class HyperplaneSigExpr(child: Expression, planes: Int, seed: Long)
    extends UnaryExpression {
  require(planes <= 64, "at most 64 sign bits")
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  override def nullSafeEval(v: Any): Any =
    HyperplaneSig.sig(v.asInstanceOf[ArrayData], planes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HyperplaneSig.sig($c, $planes, ${seed}L);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object HyperplaneSig {
  def sig(vec: ArrayData, planes: Int, seed: Long): Long = {
    val n = vec.numElements()
    var out = 0L
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var i = 0
      while (i < n) {
        // deterministic Rademacher weight for (plane, dim)
        val r = mix(seed + p * 0x9E3779B97F4A7C15L + i)
        val w = if ((r & 1L) == 0L) 1.0 else -1.0
        dot += w * vec.getDouble(i)
        i += 1
      }
      if (dot >= 0) out |= (1L << p)
      p += 1
    }
    out
  }

  private def mix(v: Long): Long = {
    var z = v
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}
