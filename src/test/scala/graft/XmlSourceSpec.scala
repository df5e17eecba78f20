package graft

import graft.sources.XmlSource
import org.scalatest.funsuite.AnyFunSuite

/** XmlSource laws: writer↔parser round-trip under entities, CDATA
  * handling, absent/unknown fields, and the DTD/XXE refusal.
  */
class XmlSourceSpec extends AnyFunSuite {

  test("writer -> parser round-trips entity-laden values byte-for-byte") {
    val rows = Seq(
      Seq("a" -> "plain", "b" -> "<tag> & \"quotes\" 'too'"),
      Seq("a" -> "", "b" -> "a]]>b"))
    val bytes = XmlSource.writeXml("root", "REC", rows)
    val got = XmlSource.parseRecords(bytes, "REC")
    assert(got == Seq(
      Map("a" -> "plain", "b" -> "<tag> & \"quotes\" 'too'"),
      Map("a" -> "", "b" -> "a]]>b")))
  }

  test("CDATA sections read as text; absent fields are simply missing from the map") {
    val xml =
      """<?xml version="1.0"?>
        |<root>
        |  <REC><a><![CDATA[raw <" text]]></a></REC>
        |  <REC><b>only-b</b></REC>
        |  <other><a>not a record</a></other>
        |</root>""".stripMargin.getBytes("UTF-8")
    val got = XmlSource.parseRecords(xml, "REC")
    assert(got == Seq(Map("a" -> "raw <\" text"), Map("b" -> "only-b")))
  }

  test("nested (non-leaf) children are skipped structurally, never a parse failure") {
    val xml =
      """<?xml version="1.0"?>
        |<root>
        |  <REC><meta><x>1</x><y>2</y></meta><a>kept</a></REC>
        |  <REC><a>second</a><deep><deeper><z>3</z></deeper></deep></REC>
        |</root>""".stripMargin.getBytes("UTF-8")
    val got = XmlSource.parseRecords(xml, "REC")
    assert(got == Seq(Map("a" -> "kept"), Map("a" -> "second")))
  }

  test("a DTD in the document is refused (XXE hardening)") {
    val xml =
      """<?xml version="1.0"?>
        |<!DOCTYPE root [<!ENTITY x SYSTEM "file:///etc/hostname">]>
        |<root><REC><a>&x;</a></REC></root>""".stripMargin.getBytes("UTF-8")
    intercept[Exception] { XmlSource.parseRecords(xml, "REC") }
  }
}
