package graft

import graft.sources.KbEtl
import org.apache.spark.sql.functions._

/** S5 dump-scrape ETL — regex extraction pairing and the reference's
  * getKBFirstParagraph boundary semantics (WikiMappingHelper.scala:207-239).
  */
class KbEtlSpec extends SparkSpec {
  import spark.implicits._

  private def intro(text: String): String =
    Seq(text).toDF("t").select(KbEtl.firstParagraph($"t")).as[String].head()

  test("firstParagraph: drops the first paragraph (split.tail)") {
    val got = intro("this title paragraph has plenty of words in it\n\n" +
      "second paragraph carries more than seven words total here")
    assert(got == "second paragraph carries more than seven words total here ")
    assert(!got.contains("title"))
  }

  test("firstParagraph: 7-word paragraphs are skipped, 8-word paragraphs taken") {
    val seven = "one two three four five six seven"
    val eight = "one two three four five six seven eight"
    assert(intro(s"head\n\n$seven") == "")
    assert(intro(s"head\n\n$eight") == eight + " ")
    // a skipped short paragraph still advances to later qualifying ones
    assert(intro(s"head\n\n$seven\n\n$eight") == eight + " ")
  }

  test("firstParagraph: accumulation stops once the context reaches 1500 words") {
    // 250 paragraphs of 10 words each; the reference's word count joins
    // paragraphs with "\n" (no space), so after n paragraphs the count is
    // 9n+1 — the first n with 9n+1 >= 1500 is 167, and the loop checks
    // BEFORE adding, so exactly paragraphs 0..166 are taken
    val paras = (0 until 250).map(i => s"p$i w1 w2 w3 w4 w5 w6 w7 w8 w9")
    val got = intro("head\n\n" + paras.mkString("\n\n"))
    assert(got.contains("p166 "), "paragraph 166 must still be accumulated")
    assert(!got.contains("p167 "), "paragraph 167 must be past the 1500-word stop")
  }

  test("firstParagraph: single-paragraph text yields empty intro; whitespace collapses") {
    assert(intro("only one paragraph here with many words inside it") == "")
    val messy = "head\n\nwords  spread\tacross   whitespace runs in this long paragraph"
    assert(intro(messy) == "words spread across whitespace runs in this long paragraph ")
  }

  test("firstParagraph matches a literal reimplementation of the reference loop on random texts") {
    // WikiMappingHelper.getKBFirstParagraph, transcribed verbatim as the
    // oracle: tail-drop, java-split word counts (limit 0: trailing empties
    // removed), >7-word filter, <1500 check BEFORE each paragraph, "\n"
    // joins, final whitespace collapse
    def reference(text: String): String = {
      val paragraphs = text.split("\n\n").tail
      var context = ""
      var contextSize = context.split(" ").length
      var i = 0
      while (contextSize < 1500 && i < paragraphs.length) {
        val p = paragraphs(i)
        if (p.split(" ").length > 7) context += p + "\n"
        i += 1
        contextSize = context.split(" ").length
      }
      context.replaceAll("\\s+", " ")
    }
    val rnd = new scala.util.Random(4242)
    def word() = (0 until 1 + rnd.nextInt(6)).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    def para() = {
      val n = rnd.nextInt(12) match {
        case 0 => 0
        case 1 => 7 // exactly-7 boundary
        case 2 => 8 // just-over boundary
        case 3 => 200 + rnd.nextInt(300) // pushes the 1500-word stop
        case k => k
      }
      val sep = () => rnd.nextInt(8) match {
        case 0 => "  " // double space: counts an empty field either way
        case 1 => "\t" // tab: merged by the final \s+ collapse
        case _ => " "
      }
      val body = (0 until n).map(_ => word()).mkString(sep())
      if (rnd.nextInt(6) == 0) body + " " else body // trailing space: the limit-0 case
    }
    val texts = (0 until 60).map { _ =>
      ("head" + rnd.nextInt(10)) + "\n\n" +
        (0 until rnd.nextInt(14)).map(_ => para()).mkString("\n\n")
    }
    val got = texts.toDF("t").select($"t", KbEtl.firstParagraph($"t"))
      .as[(String, String)].collect().toMap
    texts.foreach { t =>
      assert(got(t) == reference(t), s"diverged on: ${t.take(120)}...")
    }
  }

  test("firstSentence: terminator rule + the reference's take(100) fallback") {
    def fs(text: String): String =
      Seq(text).toDF("t").select(KbEtl.firstSentence($"t")).as[String].head()
    assert(fs("First sentence here. Second sentence there.") == "First sentence here.")
    assert(fs("Ends with bang! More text") == "Ends with bang!")
    assert(fs("multi\nline   first? rest") == "multi line first?")
    // no terminator anywhere: the reference's exception path takes 100 chars
    val long = "word " * 40 // 200 chars, no terminator
    assert(fs(long) == long.take(100).replaceAll("\\s+", " "))
    assert(fs("short no terminator") == "short no terminator")
    assert(fs("") == "")
  }

  test("fromDump: header/text/facts regexes pair per entity across a multi-entity file") {
    val xml =
      """<entity wiki_title="Zero" type="GPE" id="E000000" name="Zero Entity">
        |</entity>
        |<entity wiki_title="Alpha_Beta" type="ORG" id="E000001" name="Alpha Beta">
        |<facts class="company">
        |<wiki_text><![CDATA[Alpha Beta title line
        |
        |tiny one
        |
        |Alpha Beta is an organization with more than seven words here]]></wiki_text>
        |</entity>
        |<entity wiki_title="Gamma" type="PER" id="E000002" name="Gamma Person">
        |<wiki_text><![CDATA[Gamma title
        |
        |Gamma Person appears with well over seven words in this paragraph]]></wiki_text>
        |</entity>
        |<entity wiki_title="NoText" type="GPE" id="E000003" name="No Text">
        |</entity>""".stripMargin
    val got = KbEtl.fromDump(Seq(xml).toDF("xml"))
      .orderBy($"kbId")
      .as[(String, String, String, String, String, String)]
      .collect()
    assert(got.length == 4)
    // a textless entity in FIRST position must NOT steal the next entity's
    // wiki_text (the reference's lazy any-char regex does exactly that —
    // documented divergence; the tempered span stops at </entity>)
    assert(got(0) == (("E000000", "Zero Entity", "Zero", "GPE", null, "")))
    assert(got(1) == (("E000001", "Alpha Beta", "Alpha_Beta", "ORG", "company",
      "Alpha Beta is an organization with more than seven words here ")))
    // entity 2 has no facts block -> null factsClass; text still pairs to ITS id
    assert(got(2)._1 == "E000002" && got(2)._4 == "PER" && got(2)._5 == null)
    assert(got(2)._6 == "Gamma Person appears with well over seven words in this paragraph ")
    // entity 3 has no wiki_text -> empty intro, never a dropped row
    assert(got(3) == (("E000003", "No Text", "NoText", "GPE", null, "")))
  }
}
