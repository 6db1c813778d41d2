package graft

import graft.operators.Aliases
import org.apache.spark.sql.functions._

/** Randomized equivalence against LITERAL reimplementations of the
  * reference's quirky string loops (same method as KbEtlSpec's
  * firstParagraph pin): the column expressions must reproduce the loop
  * output on arbitrary inputs from the loop's non-crashing domain, not
  * just the fixture cases the oracles cover.
  */
class ReferenceParitySpec extends SparkSpec {
  import spark.implicits._

  test("locationCasing matches the reference word loop on its non-crashing domain") {
    // CorefHelperMethods.locationCasing:363-376, transcribed: java split
    // (trailing empties dropped), dot-words untouched, else lower + upcase
    // first char. Empty words crash the reference (newS(0)), so the
    // generator emits single-spaced non-empty words (+ trailing spaces,
    // which java split removes before the loop).
    def reference(str: String): String = {
      var words = List[String]()
      for (s <- str.split(" ")) {
        var newS = s
        if (!s.contains(".")) {
          newS = s.map(_.toLower)
          newS = newS(0).toUpper + newS.tail
        }
        words = words :+ newS
      }
      words.mkString(" ")
    }
    val rnd = new scala.util.Random(99)
    def word() = {
      val chars = "abcXYZ.09"
      val w = (0 until 1 + rnd.nextInt(7)).map(_ => chars(rnd.nextInt(chars.length))).mkString
      if (w.forall(_ == '.')) w + "a" else w // avoid all-dot degenerate? dots are kept as-is anyway
    }
    val strs = (0 until 80).map { _ =>
      (0 until 1 + rnd.nextInt(6)).map(_ => word()).mkString(" ") +
        (" " * rnd.nextInt(3)) // trailing spaces: java split drops them
    }
    val got = strs.toDF("s").select($"s", Aliases.locationCasing($"s"))
      .as[(String, String)].collect().toMap
    strs.foreach(s => assert(got(s) == reference(s), s"diverged on [$s]"))
  }

  test("minDistanceBefore matches the reference indexOf scan exactly") {
    // CorefHelperMethods.sortCandidateStringsByProximity:243-260,
    // transcribed: scan every occurrence, keep min(offset - index) over
    // strictly-positive proximities, default doc length
    def reference(rawDoc: String, begOffset: Int, cand: String): Long = {
      var nextIndex = rawDoc.indexOf(cand)
      var minDistance = rawDoc.length()
      while (nextIndex != -1) {
        val proximity = begOffset - nextIndex
        if (proximity > 0) minDistance = math.min(minDistance, proximity)
        nextIndex = rawDoc.indexOf(cand, nextIndex + 1)
      }
      minDistance.toLong
    }
    val rnd = new scala.util.Random(7)
    // tiny alphabet so candidates repeat and overlap ("aba" in "ababa")
    def text(n: Int) = (0 until n).map(_ => "ab ba"(rnd.nextInt(5))).mkString
    val cases = (0 until 120).map { _ =>
      val doc = text(6 + rnd.nextInt(40))
      val cand =
        if (rnd.nextBoolean()) text(1 + rnd.nextInt(4))
        else "zzz" // absent candidate: doc-length default
      (doc, rnd.nextInt(doc.length + 2), cand)
    }
    val got = cases.toDF("doc", "off", "cand")
      .select($"doc", $"off", $"cand",
        Aliases.minDistanceBefore($"doc", $"off", $"cand"))
      .as[(String, Int, String, Long)].collect()
    got.foreach { case (doc, off, cand, d) =>
      assert(d == reference(doc, off, cand),
        s"diverged on doc=[$doc] off=$off cand=[$cand]: got $d vs ${reference(doc, off, cand)}")
    }
  }
}
