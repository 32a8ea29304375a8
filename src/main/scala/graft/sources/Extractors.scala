package graft.sources

/** Pluggable binary-format text extraction for DocLoader — the
  * distributed equivalent of the reference's per-extension loader
  * classes (conversadocs/bones.py:32-44). Each extractor is a pure
  * bytes→text function, serializable so it runs inside
  * `mapPartitions` on executors; formats with no registered extractor
  * fall back to a clearly-marked placeholder (pdf/doc parsers aren't
  * in this container).
  */
trait BinaryExtractor extends Serializable {
  /** lower-case extensions this extractor handles. */
  def extensions: Set[String]
  def extract(bytes: Array[Byte]): String
}

/** Genuine RTF text extraction (no external parser): a control-word
  * state machine — group tracking, destination-group skipping
  * (fonttbl/colortbl/pict/...), \'hh and \uN escapes, \par|\line|\tab
  * whitespace. Covers the text layer of real-world RTF. */
object RtfExtractor extends BinaryExtractor {
  override val extensions: Set[String] = Set("rtf")

  private val skipDests = Set(
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "themedata",
    "generator", "filetbl", "listtable", "listoverridetable", "xmlnstbl")

  override def extract(bytes: Array[Byte]): String = {
    // RTF is 7-bit with \'hh escapes for the high range
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val out = new StringBuilder
    var i = 0
    var depth = 0
    var skipAbove = Int.MaxValue // skip content while depth >= this
    var prevWasOpen = false      // last char consumed was '{'
    while (i < s.length) {
      s.charAt(i) match {
        case '{' =>
          depth += 1; prevWasOpen = true; i += 1
        case '}' =>
          depth -= 1
          if (depth < skipAbove) skipAbove = Int.MaxValue
          prevWasOpen = false; i += 1
        case '\\' =>
          i += 1
          if (i < s.length) {
            val c = s.charAt(i)
            if (c == '\\' || c == '{' || c == '}') {
              if (depth < skipAbove) out.append(c); i += 1
            } else if (c == '\'') {
              if (i + 2 < s.length) {
                val hex = s.substring(i + 1, i + 3)
                if (depth < skipAbove)
                  out.append(Integer.parseInt(hex, 16).toChar)
                i += 3
              } else i = s.length
            } else if (c == '~') {
              if (depth < skipAbove) out.append(' '); i += 1
            } else if (c == '*') {
              // {\*\dest ...}: an optional destination — skip the group
              if (prevWasOpen && depth < skipAbove) skipAbove = depth
              i += 1
            } else if (c.isLetter) {
              var j = i
              while (j < s.length && s.charAt(j).isLetter) j += 1
              val word = s.substring(i, j)
              var k = j
              if (k < s.length && (s.charAt(k) == '-' || s.charAt(k).isDigit)) {
                k += 1
                while (k < s.length && s.charAt(k).isDigit) k += 1
              }
              val param = s.substring(j, k)
              if (k < s.length && s.charAt(k) == ' ') k += 1 // word delimiter
              if (depth < skipAbove) {
                if (prevWasOpen && skipDests.contains(word)) skipAbove = depth
                else word match {
                  case "par" | "line" | "sect" | "page" => out.append('\n')
                  case "tab" | "cell" => out.append('\t')
                  case "emdash" | "endash" => out.append('-')
                  case "u" if param.nonEmpty =>
                    out.append(param.toInt.toChar)
                    if (k < s.length && s.charAt(k) != '\\' &&
                      s.charAt(k) != '{' && s.charAt(k) != '}') k += 1 // fallback char
                  case _ => () // formatting word: no text
                }
              }
              i = k
            } else i += 1 // unknown escape
          }
          prevWasOpen = false
        case '\r' | '\n' => i += 1 // raw newlines are not RTF text
        case c =>
          if (depth < skipAbove) out.append(c)
          prevWasOpen = false; i += 1
      }
    }
    out.toString.trim
  }
}

/** Shared XML/HTML text helpers for the markup-based extractors. */
private[sources] object XmlText {
  /** Decode the core named entities plus numeric character refs. */
  def decodeEntities(s: String): String = {
    val numeric = "&#(x?)([0-9a-fA-F]+);".r
    val withNums = numeric.replaceAllIn(s, m =>
      scala.util.Try {
        val cp = Integer.parseInt(m.group(2), if (m.group(1).isEmpty) 10 else 16)
        java.util.regex.Matcher.quoteReplacement(new String(Character.toChars(cp)))
      }.getOrElse(m.matched))
    withNums
      .replace("&nbsp;", " ").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'").replace("&amp;", "&")
  }

  /** Drop every tag, decode entities, collapse whitespace. */
  def stripTags(h: String): String =
    decodeEntities(h.replaceAll("(?s)<[^>]*>", " "))
      .replaceAll("\\s+", " ").trim
}

/** Read ZIP entries out of an in-memory archive — docx/pptx/odt/epub
  * are all ZIP-of-XML, so one pure-JVM reader serves four formats.
  * Throws on a non-ZIP payload (bad magic) so callers can distinguish
  * "malformed file" (→ placeholder) from "valid archive with no text"
  * (→ genuinely empty document). */
private[sources] object ZipEntries {
  def read(bytes: Array[Byte], wanted: String => Boolean): Seq[(String, String)] = {
    if (bytes.length < 4 || bytes(0) != 'P'.toByte || bytes(1) != 'K'.toByte)
      throw new java.util.zip.ZipException("not a ZIP archive")
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val out = Seq.newBuilder[(String, String)]
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory && wanted(e.getName)) {
          val buf = new java.io.ByteArrayOutputStream()
          zin.transferTo(buf)
          out += e.getName -> buf.toString("UTF-8")
        }
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.result()
  }
}

/** Evernote export (.enex — bones.py:37 EverNoteLoader): XML of
  * <note> entries whose <content> wraps en-note HTML in CDATA. Emits
  * "title\nbody" per note, tags stripped, core entities decoded. */
object EnexExtractor extends BinaryExtractor {
  override val extensions: Set[String] = Set("enex")

  private val NoteRe = "(?s)<note>(.*?)</note>".r
  private val TitleRe = "(?s)<title>(.*?)</title>".r
  private val CdataRe = "(?s)<content>\\s*<!\\[CDATA\\[(.*?)\\]\\]>".r

  override def extract(bytes: Array[Byte]): String = {
    val xml = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    NoteRe.findAllMatchIn(xml).map { m =>
      val note = m.group(1)
      val title = TitleRe.findFirstMatchIn(note)
        .map(t => XmlText.stripTags(t.group(1)))
      val body = CdataRe.findFirstMatchIn(note)
        .map(c => XmlText.stripTags(c.group(1)))
      (title.toSeq ++ body.toSeq).mkString("\n")
    }.mkString("\n\n")
  }
}

/** OOXML WordprocessingML (.docx — bones.py:34 Docx2txtLoader): ZIP
  * with word/document.xml; visible text lives in <w:t> runs, <w:p>
  * paragraphs become newlines, <w:tab/> tabs. */
object DocxExtractor extends BinaryExtractor {
  override val extensions: Set[String] = Set("docx")

  // text runs, tabs, and breaks in document order; tab/br may carry
  // attributes in real Word output (<w:br w:type="page"/>, styled tabs)
  private val TokRe =
    "(?s)<w:t(?:\\s[^>]*)?>(.*?)</w:t>|<w:tab(?:\\s[^>]*)?/>|<w:br(?:\\s[^>]*)?/>".r

  override def extract(bytes: Array[Byte]): String = {
    val xmls = ZipEntries.read(bytes, _ == "word/document.xml").map(_._2)
    xmls.map { xml =>
      xml.split("</w:p>").map { para =>
        TokRe.findAllMatchIn(para).map { m =>
          if (m.group(1) != null) XmlText.decodeEntities(m.group(1))
          else if (m.matched.startsWith("<w:tab")) "\t"
          else "\n"
        }.mkString
      }.filter(_.nonEmpty).mkString("\n")
    }.mkString("\n").trim
  }
}

/** OOXML PresentationML (.pptx — bones.py:42): one XML per slide
  * under ppt/slides/, text in <a:t> runs; slides ordered by number,
  * separated by blank lines. */
object PptxExtractor extends BinaryExtractor {
  override val extensions: Set[String] = Set("pptx")

  private val SlideRe = "^ppt/slides/slide(\\d+)\\.xml$".r
  private val RunRe = "(?s)<a:t(?:\\s[^>]*)?>(.*?)</a:t>".r

  override def extract(bytes: Array[Byte]): String = {
    val slides = ZipEntries.read(bytes,
        n => SlideRe.findFirstIn(n).isDefined)
      .map { case (name, xml) =>
        val SlideRe(num) = name: @unchecked
        num.toInt -> xml
      }.sortBy(_._1)
    slides.map { case (_, xml) =>
      xml.split("</a:p>").map { para =>
        RunRe.findAllMatchIn(para).map(m => XmlText.decodeEntities(m.group(1)))
          .mkString(" ")
      }.filter(_.nonEmpty).mkString("\n")
    }.mkString("\n\n").trim
  }
}

/** OpenDocument text (.odt — bones.py:40): ZIP with content.xml;
  * <text:p>/<text:h> close as newlines, tabs and line-breaks are
  * elements, everything else tag-stripped. */
object OdtExtractor extends BinaryExtractor {
  override val extensions: Set[String] = Set("odt")

  override def extract(bytes: Array[Byte]): String = {
    val xmls = ZipEntries.read(bytes, _ == "content.xml").map(_._2)
    xmls.map { xml =>
      val marked = xml
        .replace("<text:tab/>", "\t")
        .replace("<text:line-break/>", "\n")
        .replaceAll("</text:[ph]>", "\n")
      XmlText.decodeEntities(marked.replaceAll("(?s)<[^>]*>", ""))
        .split("\n").map(_.trim).filter(_.nonEmpty).mkString("\n")
    }.mkString("\n").trim
  }
}

/** EPUB (.epub — bones.py:36 UnstructuredEPubLoader): ZIP of XHTML
  * chapters; every (x)html entry is tag-stripped, in archive order,
  * separated by blank lines. */
object EpubExtractor extends BinaryExtractor {
  override val extensions: Set[String] = Set("epub")

  private def isHtml(name: String): Boolean = {
    val n = name.toLowerCase
    n.endsWith(".xhtml") || n.endsWith(".html") || n.endsWith(".htm")
  }

  override def extract(bytes: Array[Byte]): String =
    ZipEntries.read(bytes, isHtml)
      .map { case (_, html) =>
        // drop non-content blocks before the generic strip
        XmlText.stripTags(
          html.replaceAll("(?s)<(head|script|style)[^>]*>.*?</\\1>", " "))
      }
      .filter(_.nonEmpty).mkString("\n\n").trim
}

object Extractors {
  val all: Seq[BinaryExtractor] = Seq(RtfExtractor, EnexExtractor,
    DocxExtractor, PptxExtractor, OdtExtractor, EpubExtractor)
  val byExtension: Map[String, BinaryExtractor] =
    all.flatMap(e => e.extensions.map(_ -> e)).toMap
}
