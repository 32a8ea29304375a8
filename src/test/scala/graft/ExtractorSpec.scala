package graft

import java.io.ByteArrayOutputStream
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DocLoader, DocxExtractor, EnexExtractor,
  EpubExtractor, OdtExtractor, PdfExtractor, PptxExtractor, RtfExtractor}

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

  /** Build an in-memory ZIP with the given (name, content) entries. */
  private def zip(entries: (String, String)*): Array[Byte] = {
    val buf = new ByteArrayOutputStream()
    val z = new ZipOutputStream(buf)
    entries.foreach { case (name, content) =>
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    z.close()
    buf.toByteArray
  }

  test("DOCX extractor: w:t runs, paragraphs, tabs, entities") {
    val doc = zip(
      "[Content_Types].xml" -> "<Types/>",
      "word/document.xml" ->
        ("""<w:document><w:body>""" +
          """<w:p><w:r><w:t>Hello </w:t></w:r><w:r w:x="1"><w:t>docx &amp; world</w:t></w:r></w:p>""" +
          """<w:p><w:r><w:t>Tabbed</w:t></w:r><w:tab/><w:r><w:t>cell</w:t></w:r></w:p>""" +
          """<w:p><w:r><w:t>page</w:t><w:br w:type="page"/><w:t>break</w:t>""" +
          """<w:tab w:val="x"/><w:t>end</w:t></w:r></w:p>""" +
          """</w:body></w:document>"""))
    val text = DocxExtractor.extract(doc)
    assert(text == "Hello docx & world\nTabbed\tcell\npage\nbreak\tend")
  }

  test("PPTX extractor: slides in number order, a:t runs") {
    val doc = zip(
      "ppt/slides/slide2.xml" ->
        """<p:sld><a:p><a:r><a:t>Second slide</a:t></a:r></a:p></p:sld>""",
      "ppt/slides/slide1.xml" ->
        """<p:sld><a:p><a:r><a:t>Title</a:t></a:r><a:r><a:t>here</a:t></a:r></a:p></p:sld>""",
      "ppt/notesSlides/notesSlide1.xml" ->
        """<p:notes><a:p><a:r><a:t>speaker notes</a:t></a:r></a:p></p:notes>""")
    val text = PptxExtractor.extract(doc)
    assert(text == "Title here\n\nSecond slide")
    assert(!text.contains("speaker notes"))
  }

  test("ODT extractor: paragraphs, headings, tabs") {
    val doc = zip(
      "mimetype" -> "application/vnd.oasis.opendocument.text",
      "content.xml" ->
        ("""<office:document-content><office:body><office:text>""" +
          """<text:h text:outline-level="1">Heading</text:h>""" +
          """<text:p>First <text:span>para</text:span> &gt; here</text:p>""" +
          """<text:p>A<text:tab/>B</text:p>""" +
          """</office:text></office:body></office:document-content>"""))
    val text = OdtExtractor.extract(doc)
    assert(text == "Heading\nFirst para > here\nA\tB")
  }

  test("EPUB extractor: xhtml chapters tag-stripped, head/style dropped") {
    val doc = zip(
      "mimetype" -> "application/epub+zip",
      "META-INF/container.xml" -> "<container/>",
      "OEBPS/ch1.xhtml" ->
        """<html><head><title>meta title</title></head><body><h1>Chapter 1</h1><p>Once upon a time.</p></body></html>""",
      "OEBPS/ch2.xhtml" ->
        """<html><body><p>The end &amp; epilogue.</p></body></html>""")
    val text = EpubExtractor.extract(doc)
    assert(text == "Chapter 1 Once upon a time.\n\nThe end & epilogue.")
    assert(!text.contains("meta title"))
  }

  private def pdf(streams: (String, Boolean)*): Array[Byte] = {
    // minimal PDF shell: header + one stream object per entry;
    // deflate=true wraps the content in a real zlib FlateDecode body
    val out = new ByteArrayOutputStream()
    out.write("%PDF-1.4\n".getBytes("ISO-8859-1"))
    streams.zipWithIndex.foreach { case ((content, deflate), n) =>
      val body =
        if (deflate) {
          val d = new java.util.zip.Deflater()
          d.setInput(content.getBytes("ISO-8859-1")); d.finish()
          val bos = new ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
          d.end(); bos.toByteArray
        } else content.getBytes("ISO-8859-1")
      val filter = if (deflate) " /Filter /FlateDecode" else ""
      out.write((s"${n + 1} 0 obj\n<< /Length ${body.length}$filter >>\n" +
        "stream\n").getBytes("ISO-8859-1"))
      out.write(body)
      out.write("\nendstream\nendobj\n".getBytes("ISO-8859-1"))
    }
    out.write("%%EOF\n".getBytes("ISO-8859-1"))
    out.toByteArray
  }

  test("PDF extractor: raw stream, Tj/TJ/quote ops, escapes, hex strings") {
    val content =
      """BT
        |/F1 12 Tf
        |72 720 Td
        |(Hello \(PDF\) world) Tj
        |0 -14 Td
        |[(Kerned) -120 ( pairs)] TJ
        |(next line) '
        |T*
        |<48657821> Tj
        |ET""".stripMargin
    val doc = pdf(content -> false)
    assert(PdfExtractor.extract(doc) ==
      "Hello (PDF) world\nKerned pairs\nnext line\nHex!")
  }

  test("PDF extractor: FlateDecode stream inflates and extracts") {
    val doc = pdf(
      "BT (First page, compressed.) Tj ET" -> true,
      "BT (Second stream.) Tj ET" -> false)
    assert(PdfExtractor.extract(doc) ==
      "First page, compressed.\nSecond stream.")
  }

  test("PDF extractor: octal escapes and nested parens") {
    val doc = pdf("BT (caf\\351 (nested) \\101BC) Tj ET" -> false)
    assert(PdfExtractor.extract(doc) == "café (nested) ABC")
  }

  test("PDF extractor: BT/ET inside shown strings cannot truncate the span") {
    val doc = pdf("BT (NET income rose) Tj T* (BUDGET beat) Tj ET" -> false)
    assert(PdfExtractor.extract(doc) == "NET income rose\nBUDGET beat")
  }

  test("PDF extractor: 'stream' inside a string is not a stream keyword") {
    val body = "BT (hello world) Tj ET"
    val head = "%PDF-1.4\n1 0 obj\n<< /Title (Downstream report) >>\nendobj\n"
    val obj = s"2 0 obj\n<< /Length ${body.length} >>\nstream\n$body\nendstream\nendobj\n"
    val doc = (head + obj + "%%EOF\n").getBytes("ISO-8859-1")
    assert(PdfExtractor.extract(doc) == "hello world")
  }

  test("PDF extractor: non-Flate filters are skipped, ghost operands dropped") {
    val doc = pdf(
      // DCT "image" whose bytes happen to contain BT..(..)..ET
      "ÿØ BT (garbage) Tj ET ÿÙ" -> false,
      "BT /Span << /ActualText (ghost) >> BDC (real text) Tj EMC ET" -> false)
    // first stream gets a /Filter marker the extractor must skip
    val s = new String(doc, "ISO-8859-1")
      .replaceFirst("<< /Length (\\d+) >>", "<< /Length $1 /Filter /DCTDecode >>")
    assert(PdfExtractor.extract(s.getBytes("ISO-8859-1")) == "real text")
  }

  test("PDF extractor: stray string-openers outside BT stay inert") {
    // inline-image bytes with an unbalanced '(' and a '<' before the
    // real text block must not swallow it
    val doc = pdf("BI /W 8 ID x(y<z EI BT (Caption) Tj ET" -> false)
    assert(PdfExtractor.extract(doc) == "Caption")
  }

  test("PDF extractor: multi-digit indirect /Length is not a direct length") {
    // "/Length 10 0 R" must not backtrack-match as direct length 1;
    // the keyword fallback still bounds the payload correctly
    val body = "BT (indirect len) Tj ET"
    val doc = ("%PDF-1.4\n1 0 obj\n<< /Length 10 0 R >>\nstream\n" +
      body + "\nendstream\nendobj\n%%EOF\n").getBytes("ISO-8859-1")
    assert(PdfExtractor.extract(doc) == "indirect len")
  }

  test("PDF extractor: absurd /Length falls back instead of aborting") {
    val body = "BT (still works) Tj ET"
    val doc = ("%PDF-1.4\n1 0 obj\n<< /Length 99999999999999999999 >>\nstream\n" +
      body + "\nendstream\nendobj\n%%EOF\n").getBytes("ISO-8859-1")
    assert(PdfExtractor.extract(doc) == "still works")
  }

  test("PDF extractor: Type0/Identity-H text decodes through the ToUnicode CMap") {
    def obj(n: Int, dict: String, stream: Option[String]) = stream match {
      case Some(b) =>
        s"$n 0 obj\n<< /Length ${b.length}$dict >>\nstream\n$b\nendstream\nendobj\n"
      case None => s"$n 0 obj\n<< $dict >>\nendobj\n"
    }
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |12 dict begin
        |begincmap
        |1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |4 beginbfchar
        |<0001> <0048>
        |<0002> <0065>
        |<0004> <006F>
        |<0005> <00660066 0069>
        |endbfchar
        |3 beginbfrange
        |<0003> <0003> <006C>
        |<0010> <0012> <0061>
        |<0020> <0021> [<0057> <0058>]
        |endbfrange
        |endcmap
        |CMapName currentdict /CMap defineresource pop
        |end end""".stripMargin
    // 2-byte codes: bfchar singles, an interval bfrange (last-unit
    // increment: 0010..0012 -> a b c), an array bfrange (W X), a
    // ligature expansion (0005 -> "ffi"), an UNMAPPED code (0006 —
    // must drop, not corrupt), then a simple-font switch whose string
    // stays byte-transparent
    val content = "BT /F1 12 Tf <0001 0002 0003 0003 0004 0006> Tj Td " +
      "[<0010> -20 <0011> <0012>] TJ Td <00200021> Tj Td <0005> Tj Td " +
      "/F2 9 Tf (plain bytes) Tj ET"
    val doc = ("%PDF-1.4\n" +
      obj(1, "/Type /Page /Resources << /Font << /F1 4 0 R /F2 8 0 R >> >> /Contents 6 0 R", None) +
      // second page: /Font value is INDIRECT (one level) and binds a
      // different name to the same Type0 font
      obj(2, "/Type /Page /Resources << /Font 9 0 R >> /Contents 7 0 R", None) +
      obj(4, "/Type /Font /Subtype /Type0 /BaseFont /Fake /Encoding /Identity-H /DescendantFonts [10 0 R] /ToUnicode 5 0 R", None) +
      obj(8, "/Type /Font /Subtype /Type1 /BaseFont /Helvetica", None) +
      "9 0 obj\n<< /G1 4 0 R >>\nendobj\n" +
      obj(5, "", Some(cmap)) +
      obj(6, "", Some(content)) +
      obj(7, "", Some("BT /G1 1 Tf <00010002> Tj ET")) +
      "%%EOF\n").getBytes("ISO-8859-1")
    assert(PdfExtractor.extractPages(doc) ==
      Seq("Hello\nabc\nWX\nffi\nplain bytes", "He"))
  }

  test("PDF extractor: page tree aligns pages despite skipped streams") {
    def obj(n: Int, dict: String, stream: Option[String]) = stream match {
      case Some(b) =>
        s"$n 0 obj\n<< /Length ${b.length}$dict >>\nstream\n$b\nendstream\nendobj\n"
      case None => s"$n 0 obj\n<< $dict >>\nendobj\n"
    }
    val doc = ("%PDF-1.4\n" +
      obj(1, " /Filter /DCTDecode", Some("ÿØ jpeg junk BT (x) Tj ET")) +
      obj(2, "/Type /Page /Contents 5 0 R", None) +
      obj(3, "/Type /Page /Contents 9 0 R", None) + // content obj missing
      obj(4, "/Type /Page /Contents 6 0 R", None) +
      obj(5, "", Some("BT (first page) Tj ET")) +
      obj(6, "", Some("BT (third page) Tj ET")) +
      "%%EOF\n").getBytes("ISO-8859-1")
    // image stream is ignored, page order follows the page objects,
    // and the page with missing content stays an EMPTY page so
    // numbering never shifts
    assert(PdfExtractor.extractPages(doc) ==
      Seq("first page", "", "third page"))
    assert(PdfExtractor.extract(doc) == "first page\nthird page")
  }

  test("PDF extractor: /Contents array concatenates one page") {
    val doc = ("%PDF-1.4\n" +
      "1 0 obj\n<< /Type /Page /Contents [3 0 R 4 0 R] >>\nendobj\n" +
      "3 0 obj\n<< >>\nstream\nBT (part a) Tj ET\nendstream\nendobj\n" +
      "4 0 obj\n<< >>\nstream\nBT (part b) Tj ET\nendstream\nendobj\n" +
      "%%EOF\n").getBytes("ISO-8859-1")
    assert(PdfExtractor.extractPages(doc) == Seq("part a\npart b"))
  }

  test("PDF extractor: page-tree edge cases keep numbering stable") {
    val doc = ("%PDF-1.4\n" +
      // key order arbitrary: /Contents BEFORE /Type, tab whitespace
      "1 0 obj\n<< /Contents 10 0 R /Type\t/Page >>\nendobj\n" +
      // a legal EMPTY page: no /Contents at all -> empty page row
      "2 0 obj\n<< /Type /Page /Parent 9 0 R >>\nendobj\n" +
      // /Contents -> bare ARRAY object indirection
      "3 0 obj\n<< /Type /Page /Contents 11 0 R >>\nendobj\n" +
      "11 0 obj\n[12 0 R 13 0 R]\nendobj\n" +
      // the tree node (/Type /Pages) and a /PageLabels dict: no pages
      "4 0 obj\n<< /Type /Pages /Kids [1 0 R 2 0 R 3 0 R] >>\nendobj\n" +
      "5 0 obj\n<< /Type /PageLabels >>\nendobj\n" +
      // content streams; 14 has generation 10 and must NOT be keyed
      // as object 1 by a sloppy header parse
      "10 0 obj\n<< >>\nstream\nBT (alpha) Tj ET\nendstream\nendobj\n" +
      "12 0 obj\n<< >>\nstream\nBT (beta) Tj ET\nendstream\nendobj\n" +
      "13 0 obj\n<< >>\nstream\nBT (gamma) Tj ET\nendstream\nendobj\n" +
      "14 10 obj\n<< >>\nstream\nBT (wrong gen) Tj ET\nendstream\nendobj\n" +
      // '/Type /Page /Contents 99 0 R' as DATA inside a content-less
      // stream payload must not fabricate a phantom page
      "15 0 obj\n<< >>\nstream\nthe string /Type /Page /Contents 99 0 R here\nendstream\nendobj\n" +
      "%%EOF\n").getBytes("ISO-8859-1")
    assert(PdfExtractor.extractPages(doc) ==
      Seq("alpha", "", "beta\ngamma"))
  }

  test("PDF extractor: hostile layouts keep page numbering stable") {
    val doc = ("%PDF-1.4\n" +
      // generation-1 page object still counts as a page
      "1 1 obj\n<< /Type /Page /Contents 10 0 R >>\nendobj\n" +
      // 'stream' as data inside the page dict must not hide /Contents
      "2 0 obj\n<< /Type /Page /N [(video stream note)] /Contents 12 0 R >>\nendobj\n" +
      "10 0 obj\n<< >>\nstream\nBT (gen one page) Tj ET\nendstream\nendobj\n" +
      "12 0 obj\n<< >>\nstream\nBT (after note) Tj ET\nendstream\nendobj\n" +
      // object-header-shaped DATA inside a payload: no phantom page
      "13 0 obj\n<< >>\nstream\nexample 3 0 obj << /Type /Page >> here\nendstream\nendobj\n" +
      "%%EOF\n").getBytes("ISO-8859-1")
    assert(PdfExtractor.extractPages(doc) ==
      Seq("gen one page", "after note"))
  }

  test("DocLoader markdown strip spares identifiers and arithmetic") {
    val dir = Files.createTempDirectory("graft-md2")
    Files.writeString(dir.resolve("tech.md"),
      """call load_db and extract_pages with __init__
        |compute 2 * 3 * 4
        |>> nested quote""".stripMargin)
    val text = DocLoader.load(spark, dir.toString).collect()
      .head.getAs[String]("text")
    assert(text.contains("load_db and extract_pages"), text)
    assert(text.contains("with init"), text) // __init__ IS emphasis
    assert(text.contains("2 * 3 * 4"), text)
    assert(text.contains("nested quote") && !text.contains(">"), text)
  }

  test("PDF extractor: throws on garbage so DocLoader stubs it") {
    intercept[IllegalArgumentException] {
      PdfExtractor.extract("not a pdf at all".getBytes("ISO-8859-1"))
    }
  }

  test("DocLoader strips markdown syntax to text like the reference loader") {
    val dir = Files.createTempDirectory("graft-md")
    Files.writeString(dir.resolve("doc.md"),
      """# Title
        |
        |Some **bold** and _italic_ text with a [link](https://x.y) and
        |`inline code`.
        |
        |- item one
        |2. item two
        |
        |> a quote
        |
        |```scala
        |val hidden = "code"
        |```
        |![alt text](img.png)
        |---
        |End.""".stripMargin)
    val text = DocLoader.load(spark, dir.toString).collect()
      .head.getAs[String]("text")
    assert(text.startsWith("Title"))
    assert(text.contains("Some bold and italic text with a link and"))
    assert(text.contains("inline code."))
    assert(text.contains("item one") && text.contains("item two"))
    assert(text.contains("a quote") && text.contains("End."))
    assert(!text.contains("#") && !text.contains("**")
      && !text.contains("](") && !text.contains("```")
      && !text.contains("hidden") && !text.contains("alt text"))
  }

  test("DocLoader reads one-level-nested files and rejects a missing dir") {
    // the glob readers expand a matched subdirectory one level; the
    // empty-glob guard must agree or nested corpora silently vanish
    val dir = Files.createTempDirectory("graft-nested")
    val sub = Files.createDirectory(dir.resolve("batch1"))
    Files.write(sub.resolve("a.txt"), "hello nested world".getBytes("UTF-8"))
    val rows = DocLoader.load(spark, dir.toString).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("text") == "hello nested world")
    // a typo'd dir must stay a loud failure, not an empty corpus
    intercept[IllegalArgumentException] {
      DocLoader.load(spark, dir.toString + "/no_such_dir")
    }
  }

  test("DocLoader emits (source, page) rows for paged formats") {
    val dir = Files.createTempDirectory("graft-pages")
    Files.write(dir.resolve("two.pdf"), pdf(
      "BT (page one) Tj ET" -> true,
      "BT (page two) Tj ET" -> false))
    val rows = DocLoader.load(spark, dir.toString).collect()
      .map(r => (r.getAs[Long]("page"), r.getAs[String]("text"))).sorted
    assert(rows.toSeq == Seq((0L, "page one"), (1L, "page two")))
  }

  test("DocLoader dispatches real extractors and stubs the rest") {
    val dir = Files.createTempDirectory("graft-extract")
    Files.write(dir.resolve("memo.rtf"), rtfDoc.getBytes("ISO-8859-1"))
    Files.write(dir.resolve("notes.enex"), enexDoc.getBytes("UTF-8"))
    Files.write(dir.resolve("plain.txt"), "just text".getBytes("UTF-8"))
    Files.write(dir.resolve("scan.pdf"), Array[Byte](0x25, 0x50, 0x44, 0x46))
    Files.write(dir.resolve("REPORT.DOCX"), zip( // uppercase ext must load too
      "word/document.xml" ->
        """<w:document><w:body><w:p><w:r><w:t>zip text</w:t></w:r></w:p></w:body></w:document>"""))
    Files.write(dir.resolve("broken.epub"), "not a zip at all".getBytes("UTF-8"))
    Files.write(dir.resolve("blank.odt"), zip( // valid archive, no text
      "content.xml" -> "<office:document-content></office:document-content>"))
    val rows = DocLoader.load(spark, dir.toString).collect()
      .map(r => r.getAs[String]("format") -> r.getAs[String]("text")).toMap
    assert(rows.keySet == Set("rtf", "enex", "txt", "pdf", "docx", "epub", "odt"))
    assert(rows("rtf").contains("Hello bold world"))
    assert(rows("enex").contains("Grocery list"))
    assert(rows("txt") == "just text")
    assert(rows("pdf") == "[unparsed pdf document, 4 bytes]")
    assert(rows("docx") == "zip text")
    // malformed archive (bad ZIP magic) degrades to the placeholder...
    assert(rows("epub") == "[unparsed epub document, 16 bytes]")
    // ...while a VALID archive with no text is a genuinely empty doc,
    // not placeholder text entering the corpus
    assert(rows("odt") == "")
  }
}
