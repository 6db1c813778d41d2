package graft

import graft.functions.{HyperplaneSigExpr, JaroWinkler, MinHashBands, SimHashExpr, SortedVecDot}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions registration: exposes the engine's custom Catalyst
  * expressions to SQL —
  *
  *   spark.sql("SELECT jaro_winkler(a, b) FROM t")
  *
  * Enable with
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  * or `.withExtensions(new GraftExtensions)`.
  *
  * No custom Rule/SparkStrategy is registered: every operator of the engine
  * is expressible with built-in logical plans (SURVEY.md §4 — explicit
  * non-goal); only scalar expressions extend Catalyst.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }
  private def longArg(e: Expression, name: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$name must be a long literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      info("jaro_winkler", "jaro_winkler(l, r) - Jaro-Winkler similarity in [0,1]"),
      (args: Seq[Expression]) => JaroWinkler(args(0), args(1))))

    ext.injectFunction((
      FunctionIdentifier("sorted_vec_dot"),
      info("sorted_vec_dot",
        "sorted_vec_dot(h1, w1, h2, w2) - dot product of sorted sparse vectors"),
      (args: Seq[Expression]) => SortedVecDot(args(0), args(1), args(2), args(3))))

    ext.injectFunction((
      FunctionIdentifier("minhash_bands"),
      info("minhash_bands",
        "minhash_bands(shingleHashes, numHashes, bands, seed) - LSH band keys"),
      (args: Seq[Expression]) => MinHashBands(args(0),
        intArg(args(1), "numHashes"), intArg(args(2), "bands"), longArg(args(3), "seed"))))

    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokenHashes) - 64-bit SimHash fingerprint"),
      (args: Seq[Expression]) => SimHashExpr(args(0))))

    ext.injectFunction((
      FunctionIdentifier("hyperplane_sig"),
      info("hyperplane_sig",
        "hyperplane_sig(vec, planes, seed) - cosine-LSH sign-bit bucket"),
      (args: Seq[Expression]) => HyperplaneSigExpr(args(0),
        intArg(args(1), "planes"), longArg(args(2), "seed"))))
  }
}
