package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DocLoader, EnexExtractor, RtfExtractor}

class ExtractorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // NB: scalac consumes \uXXXX escapes even in triple-quoted strings, so
  // the RTF \uN escape is assembled via replace() to keep the literal
  // backslash-u text intact at runtime (8212 decimal = U+2014 em-dash).
  private val rtfDoc =
    """{\rtf1\ansi\deff0{\fonttbl{\f0 Times New Roman;}}
      |{\colortbl;\red0\green0\blue0;}
      |{\*\generator Acme Writer 1.0;}
      |\f0\fs24 Hello \b bold\b0  world\'e9!\par
      |Second\tab line\par
      |Unicode: @UESC@8212? dash.\par
      |}""".stripMargin.replace("@UESC@", "\\" + "u")

  private val enexDoc =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<!DOCTYPE en-export SYSTEM "http://xml.evernote.com/pub/evernote-export3.dtd">
      |<en-export export-date="20240101T000000Z">
      |<note><title>Grocery list</title>
      |<content><![CDATA[<?xml version="1.0"?><!DOCTYPE en-note SYSTEM "x">
      |<en-note><div>milk &amp; eggs</div><div>bread</div></en-note>]]></content>
      |<created>20240101T000000Z</created></note>
      |<note><title>Ideas</title>
      |<content><![CDATA[<en-note>build a <b>spark</b> engine</en-note>]]></content>
      |</note>
      |</en-export>""".stripMargin

  test("RTF extractor: text layer, escapes, skipped destination groups") {
    val text = RtfExtractor.extract(rtfDoc.getBytes("ISO-8859-1"))
    assert(text.contains("Hello bold worldé!"))
    assert(text.contains("Second\tline"))
    assert(text.contains("Unicode: — dash."))
    // destination groups must not leak into the text
    assert(!text.contains("Times New Roman"))
    assert(!text.contains("Acme Writer"))
  }

  test("ENEX extractor: notes as title + tag-stripped body") {
    val text = EnexExtractor.extract(enexDoc.getBytes("UTF-8"))
    assert(text.contains("Grocery list\nmilk & eggs bread"))
    assert(text.contains("Ideas\nbuild a spark engine"))
    assert(!text.contains("CDATA"))
    assert(!text.contains("<div>"))
  }

  test("DocLoader dispatches real extractors and stubs the rest") {
    val dir = Files.createTempDirectory("graft-extract")
    Files.write(dir.resolve("memo.rtf"), rtfDoc.getBytes("ISO-8859-1"))
    Files.write(dir.resolve("notes.enex"), enexDoc.getBytes("UTF-8"))
    Files.write(dir.resolve("plain.txt"), "just text".getBytes("UTF-8"))
    Files.write(dir.resolve("scan.pdf"), Array[Byte](0x25, 0x50, 0x44, 0x46))
    val rows = DocLoader.load(spark, dir.toString).collect()
      .map(r => r.getAs[String]("format") -> r.getAs[String]("text")).toMap
    assert(rows.keySet == Set("rtf", "enex", "txt", "pdf"))
    assert(rows("rtf").contains("Hello bold world"))
    assert(rows("enex").contains("Grocery list"))
    assert(rows("txt") == "just text")
    assert(rows("pdf") == "[unparsed pdf document, 4 bytes]")
  }
}
