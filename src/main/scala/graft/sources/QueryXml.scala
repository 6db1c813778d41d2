package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S1 — TAC evaluation-query XML reader (reference KBPQuery.scala:91-142),
  * the last reference entry path without a counterpart (VERDICT r4
  * "What's missing #3"): `<kbpentlink><query id="..."><name/><docid/>
  * <beg/><end/></query>...</kbpentlink>` → rows (queryId, name, docId,
  * begOffset, endOffset). Driver-side DOM parse — the query file is the
  * tiny dimension (thousands of rows next to a corpus of billions), the
  * same altitude as the alias dictionary.
  *
  * Reference semantics preserved exactly:
  *  - `name`/`docid` are the CONCATENATED text of all matching descendant
  *    elements (scala-xml `\\(tag).text`) — a missing element yields ""
  *    without complaint, duplicates concatenate;
  *  - `beg`/`end` parse with `String.toInt`, NO trimming; any failure
  *    (missing, duplicated, garbage) sends the query through the 2011
  *    fallback — same id/name/docid with offsets −1
  *    (parseSingle2011KBPQueryFromXML, :115-133);
  *  - a query with no `id` attribute fails BOTH parsers and is dropped —
  *    here counted in `Parsed.malformed` (the reference prints
  *    "returned NONE!"), never silent.
  * DOCTYPE declarations are rejected (XXE hardening — the reference's
  * scala.xml loader resolves external entities; refusing them is the
  * safe superset for untrusted query files).
  */
object QueryXml {

  final case class Query(queryId: String, name: String, docId: String,
                         begOffset: Int, endOffset: Int)

  /** Parse the XML text of one query file. */
  def parseString(xml: String): Sidecars.Parsed[Query] = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setXIncludeAware(false)
    f.setExpandEntityReferences(false)
    val doc = f.newDocumentBuilder().parse(
      new java.io.ByteArrayInputStream(xml.getBytes(java.nio.charset.StandardCharsets.UTF_8)))

    // scala-xml's \\(tag).text analogue: concatenated text of ALL
    // descendant elements with the tag, document order
    def descText(el: org.w3c.dom.Element, tag: String): String = {
      val ns = el.getElementsByTagName(tag)
      (0 until ns.getLength).map(ns.item(_).getTextContent).mkString
    }

    val qs = doc.getDocumentElement.getElementsByTagName("query")
    var malformed = 0
    val rows = (0 until qs.getLength).flatMap { i =>
      val el = qs.item(i).asInstanceOf[org.w3c.dom.Element]
      if (!el.hasAttribute("id")) { malformed += 1; None } // both parsers throw
      else {
        val id = el.getAttribute("id")
        val name = descText(el, "name")
        val docId = descText(el, "docid")
        // the reference's untrimmed toInt: ANY failure -> 2011 fallback
        val offsets =
          try Some((descText(el, "beg").toInt, descText(el, "end").toInt))
          catch { case _: NumberFormatException => None }
        offsets match {
          case Some((b, e)) => Some(Query(id, name, docId, b, e))
          case None => Some(Query(id, name, docId, -1, -1))
        }
      }
    }
    Sidecars.Parsed(rows, malformed)
  }

  /** Read a query file into a DataFrame + dropped-query count. The path
    * resolves through the session's Hadoop FileSystem (review r5) so
    * hdfs:// and s3a:// query files work wherever the rest of the
    * pipeline runs — same rationale as Checkpoint's marker probes.
    */
  def read(spark: SparkSession, path: String): (DataFrame, Int) = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val text =
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    val parsed = parseString(text)
    (parsed.rows.toDF(), parsed.malformed)
  }
}
