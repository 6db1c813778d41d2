package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpr
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** True iff any cross pair (a ∈ left, b ∈ right) has a.startsWith(b) or
  * b.startsWith(a) — the reference's `prefix` feature (F7,
  * MentionPairFeatures.scala:68).
  *
  * The natural `exists(l, a -> exists(r, b -> startswith(...)))` formulation
  * uses higher-order lambdas, which are CodegenFallback in Spark and knock
  * the ENTIRE scoring projection out of whole-stage codegen. This expression
  * does the same O(|l|·|r|) loop (arrays are 1-2 surface names) as a native
  * codegen'd call, keeping the hot pairwise-scoring stage fused.
  */
case class ArrayPrefixOverlap(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "array_prefix_overlap"

  override def nullSafeEval(l: Any, r: Any): Any =
    ArrayPrefixOverlap.overlap(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.ArrayPrefixOverlap.overlap($l, $r);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayPrefixOverlap {
  def overlap(l: ArrayData, r: ArrayData): Boolean = {
    val nl = l.numElements(); val nr = r.numElements()
    var i = 0
    while (i < nl) {
      if (!l.isNullAt(i)) {
        val a = l.getUTF8String(i)
        var j = 0
        while (j < nr) {
          if (!r.isNullAt(j)) {
            val b = r.getUTF8String(j)
            if (a.startsWith(b) || b.startsWith(a)) return true
          }
          j += 1
        }
      }
      i += 1
    }
    false
  }

  def array_prefix_overlap(l: Column, r: Column): Column =
    GraftExpr.column(ArrayPrefixOverlap(GraftExpr.expression(l), GraftExpr.expression(r)))
}

/** True iff any cross pair (a ∈ left, b ∈ right) has a.contains(b) or
  * b.contains(a) with a ≠ b — the reference's `contains` feature (F8,
  * MentionPairFeatures.scala:69: containment excluding exact overlap).
  * Same codegen rationale as [[ArrayPrefixOverlap]].
  */
case class ArrayContainsOverlap(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "array_contains_overlap"

  override def nullSafeEval(l: Any, r: Any): Any =
    ArrayContainsOverlap.overlap(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.ArrayContainsOverlap.overlap($l, $r);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayContainsOverlap {
  def overlap(l: ArrayData, r: ArrayData): Boolean = {
    val nl = l.numElements(); val nr = r.numElements()
    var i = 0
    while (i < nl) {
      if (!l.isNullAt(i)) {
        val a = l.getUTF8String(i)
        var j = 0
        while (j < nr) {
          if (!r.isNullAt(j)) {
            val b = r.getUTF8String(j)
            if (!a.equals(b) && (a.contains(b) || b.contains(a))) return true
          }
          j += 1
        }
      }
      i += 1
    }
    false
  }

  def array_contains_overlap(l: Column, r: Column): Column =
    GraftExpr.column(ArrayContainsOverlap(GraftExpr.expression(l), GraftExpr.expression(r)))
}

/** True iff any a ∈ left CONTAINS some b ∈ right as a substring (equality
  * included, one direction only) — the P4 context-containment predicate
  * (`vocab token contains surface name`, MentionPairTrainingData
  * .scala:57-70). Replaces the nested `exists(vocab, t -> exists(names,
  * n -> t.contains(n)))` lambda chain, which is CodegenFallback: the P4
  * filter evaluates it once per candidate pair over the full context
  * vocabulary, so interpreted lambda dispatch per (token, name) pair was
  * the stage's hot loop (r7, guide §1.2 per-task work — measured on
  * q_pair_filter). Null elements are skipped; in a WHERE clause that is
  * equivalent to exists()'s three-valued logic (its NULL result filters
  * exactly like false).
  */
case class ArrayAnyContains(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "array_any_contains"

  override def nullSafeEval(l: Any, r: Any): Any =
    ArrayAnyContains.anyContains(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.ArrayAnyContains.anyContains($l, $r);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayAnyContains {
  def anyContains(l: ArrayData, r: ArrayData): Boolean = {
    val nl = l.numElements(); val nr = r.numElements()
    var i = 0
    while (i < nl) {
      if (!l.isNullAt(i)) {
        val a = l.getUTF8String(i)
        var j = 0
        while (j < nr) {
          if (!r.isNullAt(j) && a.contains(r.getUTF8String(j))) return true
          j += 1
        }
      }
      i += 1
    }
    false
  }

  def array_any_contains(l: Column, r: Column): Column =
    GraftExpr.column(ArrayAnyContains(GraftExpr.expression(l), GraftExpr.expression(r)))
}

/** |A ∩ B| of two SORTED distinct array<long> via one linear merge — the
  * Jaccard verification kernel for the dedup joins (J6). `array_intersect`
  * builds a hash set and allocates the result array per pair; on sorted
  * long arrays the merge is branch-light primitive compares with NO
  * allocation, and |A ∪ B| falls out as |A| + |B| − |A ∩ B| — worth ~an
  * order of magnitude on the pair-verification hot path where millions of
  * blocked pairs each compare ~100-element shingle sets. Sorting is paid
  * once per ROW at tokenize time (`sort_array`), not once per PAIR.
  * Inputs must be sorted ascending and duplicate-free (the operators build
  * them with `sort_array(array_distinct(...))`).
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_long_intersect_count"

  override def nullSafeEval(l: Any, r: Any): Any =
    SortedLongIntersectCount.count(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.SortedLongIntersectCount.count($l, $r);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedLongIntersectCount {
  def count(l: ArrayData, r: ArrayData): Int = {
    val nl = l.numElements(); val nr = r.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < nl && j < nr) {
      val a = l.getLong(i); val b = r.getLong(j)
      if (a == b) { c += 1; i += 1; j += 1 }
      else if (a < b) i += 1
      else j += 1
    }
    c
  }

  def sorted_long_intersect_count(l: Column, r: Column): Column =
    GraftExpr.column(SortedLongIntersectCount(
      GraftExpr.expression(l), GraftExpr.expression(r)))
}
