package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftExpr
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity as a native Catalyst expression with codegen.
  *
  * The reference scores mention pairs with stringmetric's JaroWinklerMetric
  * (reference MentionPairFeatures.scala:64-65, feature F4 in SURVEY.md §2.4).
  * Spark has no built-in, so this is the one genuinely custom scalar function
  * of the engine (SURVEY.md §4). Standard Winkler parameters: prefix scale
  * 0.1, max prefix 4, boost threshold 0.7 (matches DuckDB / rapidfuzz so the
  * driver's oracle can check it bit-for-bit after rounding).
  *
  * Codegen emits a static call — the expression stays inside whole-stage
  * codegen (no virtual eval, no fallback).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinkler.similarity(
      l.asInstanceOf[UTF8String].toString,
      r.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.JaroWinkler.similarity($l.toString(), $r.toString());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  /** Plain-JVM Jaro-Winkler in [0,1]; deterministic, allocation-light. */
  def similarity(s1: String, s2: String): Double = {
    if (s1 == s2) return 1.0
    val len1 = s1.length
    val len2 = s2.length
    if (len1 == 0 || len2 == 0) return 0.0
    val window = math.max(math.max(len1, len2) / 2 - 1, 0)
    val matched1 = new Array[Boolean](len1)
    val matched2 = new Array[Boolean](len2)
    var matches = 0
    var i = 0
    while (i < len1) {
      val lo = math.max(0, i - window)
      val hi = math.min(len2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!matched2(j) && s1.charAt(i) == s2.charAt(j)) {
          matched1(i) = true; matched2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions
    var t = 0
    var k = 0
    i = 0
    while (i < len1) {
      if (matched1(i)) {
        while (!matched2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    // transpositions = mismatched-position count / 2, INTEGER-truncated —
    // Winkler's original convention, matched by rapidfuzz/DuckDB (oracle parity)
    val jaro = (m / len1 + m / len2 + (m - t / 2) / m) / 3.0
    // Winkler boost: common prefix up to 4 chars, only above 0.7
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxPrefix = math.min(4, math.min(len1, len2))
    while (prefix < maxPrefix && s1.charAt(prefix) == s2.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}

object StringSim {
  /** Column wrapper: jaro_winkler(l, r) in [0,1]. */
  def jaro_winkler(l: Column, r: Column): Column =
    GraftExpr.column(
      JaroWinkler(GraftExpr.expression(l), GraftExpr.expression(r)))
}
