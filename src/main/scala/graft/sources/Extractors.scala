package graft.sources

/** Pluggable binary-format text extraction for DocLoader — the
  * distributed equivalent of the reference's per-extension loader
  * classes (conversadocs/bones.py:32-44). Each extractor is a pure
  * bytes→text function, serializable so it runs inside
  * `mapPartitions` on executors; every binary format in the
  * reference's table has a real pure-JVM extractor here, and a
  * malformed file degrades to DocLoader's clearly-marked placeholder
  * because extractors THROW on bad input.
  */
trait BinaryExtractor extends Serializable {
  /** lower-case extensions this extractor handles. */
  def extensions: Set[String]
  def extract(bytes: Array[Byte]): String

  /** Page-granular extraction where the format has pages (pdf
    * content streams, pptx slides) — the reference's loaders attach
    * (source, page) metadata to every chunk (bones.py load_db).
    * Formats without a page notion yield one page. */
  def extractPages(bytes: Array[Byte]): Seq[String] = Seq(extract(bytes))
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

  override def extract(bytes: Array[Byte]): String =
    extractPages(bytes).mkString("\n\n").trim

  /** One page per slide, in slide-number order. */
  override def extractPages(bytes: Array[Byte]): Seq[String] = {
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
    }
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

/** Text layer of standard PDFs, pure JVM (bones.py:32 PyPDFLoader):
  * locates stream...endstream objects, inflates FlateDecode payloads
  * (java.util.zip.Inflater — zlib IS in the JDK), and replays the
  * content-stream text operators inside BT..ET spans: Tj / ' / " show
  * a string, TJ shows an array of strings (kerning numbers ignored),
  * Td/TD/T* line moves become newlines. Handles PDF string-literal
  * escapes (\\( \\) \\\\ \\n \\r \\t, octal \\ddd, nested parens,
  * line continuations) and <hex> strings.
  *
  * Composite fonts: a font object carrying a /ToUnicode CMap stream
  * (the Type0 /Identity-H case — most real-world PDFs) is decoded
  * through it: the content stream's Tf operator selects the current
  * font by resource name, and every shown string's RAW bytes are
  * grouped into codespace-width codes (2 for Identity-H) and mapped
  * via the CMap's bfchar/bfrange entries to UTF-16BE text. Fonts
  * with no /ToUnicode keep the byte-transparent path (simple fonts
  * read as Latin-1; Identity-H without ToUnicode has no text mapping
  * by construction). Unmapped codes and trailing partial codes drop
  * — PyPDFLoader's behavior. Throws on a missing %PDF- header so
  * DocLoader degrades malformed files to the placeholder. */
object PdfExtractor extends BinaryExtractor {
  override val extensions: Set[String] = Set("pdf")

  private val Latin1 = java.nio.charset.StandardCharsets.ISO_8859_1

  // a direct /Length 123 — (?!\d) stops backtracking from shortening
  // the number so the indirect-ref lookahead can't be sidestepped
  // ("/Length 139 0 R" must not match as 13)
  private val DirectLength = """/Length\s+(\d+)(?!\d)(?!\s*\d+\s+R)""".r

  override def extract(bytes: Array[Byte]): String =
    extractPages(bytes).filter(_.nonEmpty).mkString("\n").trim

  // /Type /Page object window (up to the next endobj), and its
  // /Contents reference(s) — single "N 0 R" or an array of them
  private val ContentsRef = """/Contents\s+(\d+)\s+0\s+R""".r
  private val ContentsArr = """/Contents\s*\[((?:\s*\d+\s+0\s+R)+)\s*\]""".r
  private val RefInArr = """(\d+)\s+0\s+R""".r

  /** Page texts in PAGE-TREE order when the file declares /Type /Page
    * objects with /Contents refs — a skipped image/font stream then
    * cannot shift page numbering, and a page whose content was
    * skipped stays an EMPTY page rather than disappearing (alignment
    * over compactness, matching PyPDFLoader's page enumeration).
    * Files without a parseable page tree fall back to one page per
    * text-bearing content stream. Scope: like the CMap limit above,
    * page dicts packed into compressed object streams (/Type /ObjStm,
    * PDF 1.5+ xref-stream files) are invisible to this scan — such
    * files take the fallback path, so their page NUMBERING (not text)
    * can differ from PyPDFLoader's. Inflating ObjStm payloads into
    * the masked page-tree scan would close that gap. */
  override def extractPages(bytes: Array[Byte]): Seq[String] = {
    require(bytes.length >= 5 &&
      new String(bytes, 0, 5, Latin1) == "%PDF-", "missing %PDF- header")
    val s = new String(bytes, Latin1) // byte-transparent
    val found = streams(s)
    // blank every payload byte before the page-tree/font walks: an
    // object-header-shaped byte run INSIDE a content stream ("3 0 obj
    // << /Type /Page >>" as shown text) must not fabricate pages or
    // font declarations
    val masked = {
      val sb = new StringBuilder(s)
      found.foreach { st =>
        var i = st.start
        while (i < st.end) { sb.setCharAt(i, ' '); i += 1 }
      }
      sb.toString
    }
    val fonts = fontCMaps(masked, found)
    // text per content-candidate stream, keyed by owning object number
    val texts = found.map { st =>
      decodedPayload(st).map(c =>
        st.num -> spanText(new String(c, Latin1), fonts))
    }.flatten
    val pageRefs = pageContentRefs(masked)
    if (pageRefs.nonEmpty) {
      val byObj = texts.filter(_._1 >= 0).toMap
      pageRefs.map { refs =>
        // /Contents may point at a bare array object instead of a
        // stream — resolve that one level of indirection
        val resolved = refs.flatMap(r =>
          if (byObj.contains(r)) Seq(r)
          else arrayObjectRefs(masked, r).getOrElse(Seq(r)))
        resolved.flatMap(byObj.get).filter(_.nonEmpty).mkString("\n").trim
      }
    } else texts.map(_._2).filter(_.nonEmpty)
  }

  /** /Contents object numbers of each /Type /Page object, in document
    * order; empty when no page tree is found. */
  // /Type /Page but not /Pages (any PDF whitespace between, or none
  // — names self-delimit); the lookahead stops /Pages and /PageLabels
  private val TypePage = """/Type[\s]*/Page(?![A-Za-z])""".r

  /** Walks OBJECT dictionary windows ("N G obj" up to the first
    * `stream` keyword or `endobj`), not the raw byte stream — so
    * "/Type /Page" appearing as DATA inside a content stream cannot
    * fabricate phantom pages, and a /Contents key written before
    * /Type (dict key order is arbitrary) is still seen. A /Type /Page
    * object with no parseable /Contents is kept as an EMPTY ref list:
    * the page exists, numbering must not shift. */
  private def pageContentRefs(s: String): Seq[Seq[Long]] = {
    val out = Seq.newBuilder[Seq[Long]]
    var i = s.indexOf("obj")
    while (i >= 0) {
      val k = i + "obj".length
      val prevOk = i > 0 && isWs(s.charAt(i - 1))
      val nextOk = k >= s.length || isWs(s.charAt(k)) || s.charAt(k) == '<'
      // any generation: gen>0 page objects (object-number reuse after
      // incremental update) must still be counted as pages
      if (prevOk && nextOk && isObjHeader(s, i)) {
        val endobj = s.indexOf("endobj", k)
        // keyword-bounded: "stream" as data inside a dict string
        // ("(video stream note)") must not truncate the window before
        // the /Contents key
        val streamKw = nextStreamKeyword(s, k)
        val end = Seq(endobj, streamKw).filter(_ >= 0)
          .minOption.getOrElse(s.length)
        val window = s.substring(k, end)
        if (TypePage.findFirstIn(window).isDefined) {
          val refs = ContentsArr.findFirstMatchIn(window)
            .map(m => RefInArr.findAllMatchIn(m.group(1))
              .map(_.group(1).toLong).toSeq)
            .orElse(ContentsRef.findFirstMatchIn(window)
              .map(m => Seq(m.group(1).toLong)))
          out += refs.getOrElse(Seq.empty)
        }
      }
      i = s.indexOf("obj", i + "obj".length)
    }
    out.result()
  }

  /** One level of indirection: object `num` defined as a bare ARRAY
    * of refs ("7 0 obj [3 0 R 4 0 R] endobj" — a legal /Contents
    * target). */
  private def arrayObjectRefs(s: String, num: Long): Option[Seq[Long]] = {
    val re = ("""(?s)(?<![0-9])""" + num +
      """[\s]+0[\s]+obj[\s]*\[((?:\s*\d+\s+0\s+R)+)\s*\]""").r
    re.findFirstMatchIn(s).map(m =>
      RefInArr.findAllMatchIn(m.group(1)).map(_.group(1).toLong).toSeq)
  }

  /** (object dictionary text, raw payload) per stream...endstream.
    * "stream" is matched as a KEYWORD — preceded by a delimiter
    * (the spec puts it right after the dict's >>) and followed by
    * EOL — so "Downstream" in a title string can't open a bogus
    * stream that swallows the next real one. */
  // PDF whitespace: null, tab, LF, FF, CR, space
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f' ||
      c == '\u0000'

  /** True when the `obj` keyword at objAt is preceded by a "N G "
    * header of ANY generation — the page-tree walk must see gen>0
    * page objects (object-number reuse after incremental update)
    * even though "N 0 R" refs can only target generation 0. */
  private def isObjHeader(s: String, objAt: Int): Boolean = {
    var j = objAt - 1
    while (j >= 0 && isWs(s.charAt(j))) j -= 1
    val genEnd = j
    while (j >= 0 && s.charAt(j).isDigit) j -= 1
    if (j == genEnd) return false
    var k = j
    while (k >= 0 && isWs(s.charAt(k))) k -= 1
    if (k == j) return false
    val numEnd = k
    while (k >= 0 && s.charAt(k).isDigit) k -= 1
    k != numEnd
  }

  /** Next `stream` KEYWORD (delimiter before, EOL after) at or after
    * `from`; -1 if none — "stream" as data inside a dict string
    * ("(video stream note)") is not a keyword. */
  private def nextStreamKeyword(s: String, from: Int): Int = {
    var i = s.indexOf("stream", from)
    while (i >= 0) {
      val k = i + "stream".length
      val prevOk = i > 0 && (isWs(s.charAt(i - 1)) || s.charAt(i - 1) == '>')
      val nextOk = k < s.length && (s.charAt(k) == '\r' || s.charAt(k) == '\n')
      if (prevOk && nextOk) return i
      i = s.indexOf("stream", i + "stream".length)
    }
    -1
  }

  /** Object number of "N G obj" whose `obj` keyword sits at objAt;
    * -1 when the header doesn't parse or the generation isn't 0 (a
    * gen-G object can't be the target of our "N 0 R" refs, and a
    * sloppy parse here would key a stream under the WRONG number). */
  private def objNumberAt(s: String, objAt: Int): Long = {
    var j = objAt - 1
    while (j >= 0 && isWs(s.charAt(j))) j -= 1
    val genEnd = j
    while (j >= 0 && s.charAt(j).isDigit) j -= 1
    if (j == genEnd) return -1L
    val gen = s.substring(j + 1, genEnd + 1)
    var k = j
    while (k >= 0 && isWs(s.charAt(k))) k -= 1
    if (k == j) return -1L // whitespace between number and generation
    val numEnd = k
    while (k >= 0 && s.charAt(k).isDigit) k -= 1
    if (k == numEnd || gen != "0") -1L
    else scala.util.Try(s.substring(k + 1, numEnd + 1).toLong).getOrElse(-1L)
  }

  private final case class StreamObj(num: Long, dict: String,
      payload: String, start: Int, end: Int)

  private def streams(s: String): Seq[StreamObj] = {
    val out = Seq.newBuilder[StreamObj]
    var i = nextStreamKeyword(s, 0)
    while (i >= 0) {
      val k = i + "stream".length
      locally {
        var d = k
        if (s.charAt(d) == '\r') d += 1
        if (d < s.length && s.charAt(d) == '\n') d += 1
        // a DIRECT /Length bounds the payload exactly (binary data may
        // contain the bytes "endstream"); an indirect one (N 0 R)
        // falls back to the keyword scan
        val e = DirectLength.findFirstMatchIn(
            s.substring(math.max(0, s.lastIndexOf("obj", i)), i))
          // a corrupt /Length (overflow, way past EOF) must only
          // disable this shortcut, never abort the whole document
          .flatMap(m => scala.util.Try(m.group(1).toLong).toOption)
          .map(_ + d)
          .filter { e =>
            e <= s.length && {
              val es = s.indexOf("endstream", e.toInt)
              es >= 0 && s.substring(e.toInt, es).forall(c =>
                c == '\r' || c == '\n' || c == ' ')
            }
          }
          .map(_.toInt)
          .getOrElse(s.indexOf("endstream", d))
        if (e >= 0) {
          val objAt = s.lastIndexOf("obj", i)
          val dict = s.substring(math.max(0, objAt), i)
          out += StreamObj(objNumberAt(s, math.max(0, objAt)), dict,
            s.substring(d, e), d, e)
          i = nextStreamKeyword(s, e + "endstream".length)
        } else i = -1
      }
    }
    out.result()
  }

  /** Decoded stream bytes when the payload is a content candidate:
    * only identity and FlateDecode — replaying DCTDecode/LZW/CCITT
    * bytes as operators would inject whatever binary garbage happens
    * to look like BT..(..)..ET. */
  private def decodedPayload(st: StreamObj): Option[Array[Byte]] =
    if (st.dict.contains("/FlateDecode"))
      inflate(st.payload.getBytes(Latin1))
    else if (st.dict.contains("/Filter")) None
    else Some(st.payload.getBytes(Latin1))

  /** Resource font NAME → ToUnicode CMap, for every font object that
    * carries a /ToUnicode stream ref. Two walks over the MASKED doc
    * (payload bytes blanked, so shown text can't forge fonts):
    * object windows with "/ToUnicode N 0 R" give fontObj → CMap
    * (code width defaulting to 2 when the window declares /Type0 or
    * /Identity-H, else 1 — the CMap's own codespacerange overrides);
    * then /Font resource dicts (inline `<<...>>` or one level of
    * indirection) give name → fontObj. A name bound to different
    * fonts on different pages resolves to the LAST binding — the
    * page-local resource scoping a full resolver would track is out
    * of scope, disclosed here. */
  private def fontCMaps(masked: String,
      found: Seq[StreamObj]): Map[String, ToUnicodeCMap] = {
    val ToUni = """/ToUnicode\s+(\d+)\s+0\s+R""".r
    val byObj = scala.collection.mutable.Map.empty[Long, ToUnicodeCMap]
    var i = masked.indexOf("obj")
    while (i >= 0) {
      val k = i + "obj".length
      val prevOk = i > 0 && isWs(masked.charAt(i - 1))
      val nextOk = k >= masked.length || isWs(masked.charAt(k)) ||
        masked.charAt(k) == '<'
      if (prevOk && nextOk && isObjHeader(masked, i)) {
        val endobj = masked.indexOf("endobj", k)
        val streamKw = nextStreamKeyword(masked, k)
        val end = Seq(endobj, streamKw).filter(_ >= 0)
          .minOption.getOrElse(masked.length)
        val window = masked.substring(k, end)
        for (m <- ToUni.findFirstMatchIn(window)) {
          val num = objNumberAt(masked, i)
          val defaultWidth =
            if (window.contains("/Type0") || window.contains("/Identity-H")) 2
            else 1
          for {
            st <- found.find(_.num == m.group(1).toLong)
            bytes <- decodedPayload(st)
          } byObj(num) =
            ToUnicodeCMap.parse(new String(bytes, Latin1), defaultWidth)
        }
      }
      i = masked.indexOf("obj", i + "obj".length)
    }
    if (byObj.isEmpty) return Map.empty
    val NameRef = """/([^\s/<>\[\]()]+)\s+(\d+)\s+0\s+R""".r
    val RefHere = """^(\d+)\s+0\s+R""".r
    val out = scala.collection.mutable.Map.empty[String, ToUnicodeCMap]
    var f = masked.indexOf("/Font")
    while (f >= 0) {
      var j = f + "/Font".length
      // "/FontDescriptor" etc. must not match: the key must END here
      if (j < masked.length &&
          (isWs(masked.charAt(j)) || masked.charAt(j) == '<')) {
        while (j < masked.length && isWs(masked.charAt(j))) j += 1
        val dict: Option[String] =
          if (masked.startsWith("<<", j)) balancedDict(masked, j)
          else RefHere.findFirstMatchIn(
              masked.substring(j, math.min(masked.length, j + 24)))
            .flatMap(m => objDictWindow(masked, m.group(1).toLong))
        for {
          w <- dict
          m <- NameRef.findAllMatchIn(w)
          cm <- byObj.get(m.group(2).toLong)
        } out(m.group(1)) = cm
      }
      f = masked.indexOf("/Font", f + "/Font".length)
    }
    out.toMap
  }

  /** The `<<...>>` window starting at `at` (which must point at the
    * opening `<<`), nesting-aware; None when unbalanced. */
  private def balancedDict(s: String, at: Int): Option[String] = {
    var depth = 0
    var j = at
    while (j + 1 < s.length) {
      if (s.charAt(j) == '<' && s.charAt(j + 1) == '<') { depth += 1; j += 2 }
      else if (s.charAt(j) == '>' && s.charAt(j + 1) == '>') {
        depth -= 1; j += 2
        if (depth == 0) return Some(s.substring(at, j))
      } else j += 1
    }
    None
  }

  /** One level of indirection for resource dicts: the `<<...>>` of
    * "num G obj << ... >> endobj". */
  private def objDictWindow(s: String, num: Long): Option[String] = {
    val re = ("""(?<!\d)""" + num + """\s+\d+\s+obj""").r
    re.findFirstMatchIn(s).flatMap { m =>
      var j = m.end
      while (j < s.length && isWs(s.charAt(j))) j += 1
      if (s.startsWith("<<", j)) balancedDict(s, j) else None
    }
  }

  private def inflate(data: Array[Byte]): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None
        out.write(buf, 0, n)
      }
      Some(out.toByteArray)
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  private def newline(out: StringBuilder): Unit =
    if (out.nonEmpty && out.last != '\n') out.append('\n')

  /** Replay a whole content stream in ONE operator-aware pass. BT/ET
    * are ordinary operator tokens here, so "ET" inside a shown string
    * ("NET income") can never truncate a text span the way a raw
    * indexOf scan would. Strings parse ONLY inside a BT..ET block —
    * outside one, a stray '(' or '<' byte (inline-image data between
    * ID..EI, dict content) must stay inert, not swallow everything up
    * to an accidental closer. Inside a block, only text-showing
    * operators emit; any other operator discards its string operands
    * (an /ActualText (alt) BDC must not leak ghost text). */
  private def spanText(span: String,
      fonts: Map[String, ToUnicodeCMap]): String = {
    val out = new StringBuilder
    val pending = new StringBuilder // strings parsed since the last op
    var inText = false
    // current font's ToUnicode CMap (set by Tf, null = byte path) and
    // the most recent name token (Tf's font-name operand)
    var curMap: ToUnicodeCMap = null
    var lastName: String = null
    def shown(raw: StringBuilder): Unit =
      if (curMap == null) pending.append(raw)
      else pending.append(curMap.decode(raw))
    var j = 0
    while (j < span.length) {
      span.charAt(j) match {
        case '(' if inText =>
          val raw = new StringBuilder
          j = literal(span, j, raw)
          shown(raw)
        case '<' if inText && j + 1 < span.length &&
            span.charAt(j + 1) != '<' =>
          val raw = new StringBuilder
          j = hexString(span, j, raw)
          shown(raw)
        case '/' => // name token: skip so /Td etc. can't look like an op
          val ns = j + 1
          j += 1
          while (j < span.length && !" \t\r\n()<>[]/".contains(span.charAt(j)))
            j += 1
          lastName = span.substring(ns, j)
        case c if c.isLetter || c == '\'' || c == '"' || c == '*' =>
          var k = j
          while (k < span.length && (span.charAt(k).isLetterOrDigit ||
            "*'\"".contains(span.charAt(k)))) k += 1
          span.substring(j, k) match {
            case "BT" => inText = true; pending.clear()
            case "ET" => inText = false; pending.clear()
            case "Tf" => // font select — legal outside BT..ET too
              curMap =
                if (lastName != null) fonts.getOrElse(lastName, null)
                else null
              pending.clear()
            case "Tj" | "TJ" if inText =>
              out.append(pending); pending.clear()
            case "'" | "\"" if inText =>
              newline(out); out.append(pending); pending.clear()
            case "T*" | "Td" | "TD" if inText =>
              newline(out); pending.clear()
            case _ => pending.clear() // non-showing op: drop operands
          }
          j = k
        case _ => j += 1
      }
    }
    out.toString.trim
  }

  /** (string) literal with escapes + balanced nested parens; returns
    * the index after the closing paren. */
  private def literal(span: String, start: Int, out: StringBuilder): Int = {
    var j = start + 1
    var depth = 1
    while (j < span.length && depth > 0) {
      span.charAt(j) match {
        case '\\' if j + 1 < span.length =>
          span.charAt(j + 1) match {
            case 'n' => out.append('\n'); j += 2
            case 'r' => out.append('\r'); j += 2
            case 't' => out.append('\t'); j += 2
            case 'b' => out.append('\b'); j += 2
            case 'f' => out.append('\f'); j += 2
            case '\n' => j += 2 // line continuation
            case '\r' =>
              j += 2; if (j < span.length && span.charAt(j) == '\n') j += 1
            case d if d >= '0' && d <= '7' =>
              var k = j + 1
              var v = 0
              while (k < span.length && k < j + 4 &&
                span.charAt(k) >= '0' && span.charAt(k) <= '7') {
                v = v * 8 + (span.charAt(k) - '0'); k += 1
              }
              out.append(v.toChar); j = k
            case c => out.append(c); j += 2 // \( \) \\ and unknown
          }
        case '(' => depth += 1; out.append('('); j += 1
        case ')' =>
          depth -= 1
          if (depth > 0) out.append(')')
          j += 1
        case c => out.append(c); j += 1
      }
    }
    j
  }

  /** <hex> string; whitespace inside is legal, odd length pads 0. */
  private def hexString(span: String, start: Int, out: StringBuilder): Int = {
    val end = span.indexOf('>', start)
    if (end < 0) return span.length
    val hex = span.substring(start + 1, end).filterNot(_.isWhitespace)
    val padded = if (hex.length % 2 == 0) hex else hex + "0"
    padded.grouped(2).foreach { h =>
      scala.util.Try(Integer.parseInt(h, 16)).foreach(v => out.append(v.toChar))
    }
    end + 1
  }
}

/** A parsed /ToUnicode CMap: fixed code width (bytes per glyph code,
  * from the codespacerange — 2 for Identity-H) plus code → UTF-16BE
  * text (multi-char for ligature expansions). */
private[sources] final case class ToUnicodeCMap(
    width: Int, map: Map[Int, String]) {

  /** Decode raw shown-string bytes (as Latin-1 chars) through the
    * CMap: width-byte big-endian codes, unmapped codes and a trailing
    * partial code drop. */
  def decode(raw: CharSequence): String = {
    val out = new StringBuilder
    var i = 0
    while (i + width <= raw.length) {
      var code = 0
      var j = 0
      while (j < width) { code = (code << 8) | (raw.charAt(i + j) & 0xFF); j += 1 }
      map.get(code).foreach(out.append(_))
      i += width
    }
    out.toString
  }
}

private[sources] object ToUnicodeCMap {

  private val Hex = """<([0-9A-Fa-f\s]+)>""".r

  /** dst hex → UTF-16BE text (4 hex digits per code unit; defensive
    * zero-pad for sloppy producers). */
  private def hexText(h: String): String = {
    val clean = h.filterNot(_.isWhitespace)
    val padded =
      if (clean.length % 4 == 0) clean
      else clean + "0" * (4 - clean.length % 4)
    padded.grouped(4).map(g => Integer.parseInt(g, 16).toChar).mkString
  }

  private def hexInt(h: String): Int =
    Integer.parseInt(h.filterNot(_.isWhitespace), 16)

  /** Total mapped codes are capped: a hostile CMap full of
    * <0000> <FFFF> ranges must not balloon the map unboundedly. */
  private val MaxEntries = 1 << 20

  /** Parse the CMap text: code width from the first codespacerange
    * (falling back to the font-dict hint), then every
    * beginbfchar/endbfchar pair list and beginbfrange/endbfrange
    * entry — both range forms: `<lo> <hi> <dst>` (dst's last UTF-16
    * unit increments across the range, the spec's interval rule) and
    * `<lo> <hi> [<d0> <d1> ...]` (explicit per-code array). */
  def parse(text: String, defaultWidth: Int): ToUnicodeCMap = {
    val width = """(?s)begincodespacerange(.*?)endcodespacerange""".r
      .findFirstMatchIn(text)
      .flatMap(m => Hex.findFirstMatchIn(m.group(1)))
      .map(m => (m.group(1).filterNot(_.isWhitespace).length + 1) / 2)
      .getOrElse(defaultWidth)
    val b = scala.collection.mutable.Map.empty[Int, String]
    for (m <- """(?s)beginbfchar(.*?)endbfchar""".r.findAllMatchIn(text)) {
      Hex.findAllMatchIn(m.group(1)).map(_.group(1)).grouped(2).foreach {
        case Seq(src, dst) if b.size < MaxEntries =>
          b(hexInt(src)) = hexText(dst)
        case _ =>
      }
    }
    for (m <- """(?s)beginbfrange(.*?)endbfrange""".r.findAllMatchIn(text)) {
      val block = m.group(1)
      var i = 0
      def skipWs(): Unit =
        while (i < block.length && block.charAt(i).isWhitespace) i += 1
      def hexTok(): Option[String] = {
        skipWs()
        if (i < block.length && block.charAt(i) == '<') {
          val e = block.indexOf('>', i)
          if (e < 0) { i = block.length; None }
          else { val h = block.substring(i + 1, e); i = e + 1; Some(h) }
        } else None
      }
      var ok = true
      while (ok) {
        (hexTok(), hexTok()) match {
          case (Some(lo), Some(hi)) =>
            skipWs()
            if (i < block.length && block.charAt(i) == '[') {
              i += 1
              var code = hexInt(lo)
              val last = hexInt(hi)
              var d = hexTok()
              while (d.isDefined && code <= last) {
                if (b.size < MaxEntries) b(code) = hexText(d.get)
                code += 1
                d = hexTok()
              }
              skipWs()
              if (i < block.length && block.charAt(i) == ']') i += 1
            } else hexTok() match {
              case Some(dst) =>
                val base = hexText(dst)
                val lo0 = hexInt(lo)
                var code = lo0
                val last = hexInt(hi)
                while (code <= last) {
                  if (b.size < MaxEntries) {
                    val t = base.toCharArray
                    if (t.nonEmpty)
                      t(t.length - 1) = (t(t.length - 1) + (code - lo0)).toChar
                    b(code) = new String(t)
                  }
                  code += 1
                }
              case None => ok = false
            }
          case _ => ok = false
        }
      }
    }
    ToUnicodeCMap(width, b.toMap)
  }
}

/** Legacy Word binary (.doc — bones.py:33): CFB container, text
  * recovered from the WordDocument stream via the [MS-DOC] piece
  * table — Clx at fcClx in the 0Table/1Table stream (fWhichTblStm
  * picks which), PlcPcd mapping each CP range to a file offset that
  * is either CP1252 (fCompressed, bytes at fc/2) or UTF-16LE (at fc).
  * Pre-Word-97 files without a Clx fall back to the contiguous
  * fcMin..fcMax range with fExtChar picking the width. Word's
  * in-text control bytes become whitespace (para/line marks), cell
  * marks become tabs, and field instructions (the 0x13..0x14 half of
  * a field) are dropped, keeping the field's visible result.
  * Encrypted files throw — DocLoader degrades them. */
object DocExtractor extends BinaryExtractor {
  override val extensions: Set[String] = Set("doc")

  private val Cp1252 = java.nio.charset.Charset.forName("windows-1252")
  private val Utf16le = java.nio.charset.StandardCharsets.UTF_16LE

  override def extract(bytes: Array[Byte]): String = {
    val cfb = Cfb.open(bytes)
    val wd = cfb.stream("WordDocument").getOrElse(
      throw new IllegalArgumentException("no WordDocument stream"))
    require(wd.length >= 0x200 && Cfb.u16(wd, 0) == 0xA5EC,
      "not a Word binary FIB")
    val flags = Cfb.u16(wd, 0x0A)
    require((flags & 0x0100) == 0, "encrypted Word document")
    val raw =
      if (wd.length >= 0x01AA && Cfb.i32(wd, 0x01A6) > 0) {
        val tableName = if ((flags & 0x0200) != 0) "1Table" else "0Table"
        val tbl = cfb.stream(tableName).getOrElse(
          throw new IllegalArgumentException(s"no $tableName stream"))
        pieceText(wd, tbl, Cfb.i32(wd, 0x01A2), Cfb.i32(wd, 0x01A6))
      } else {
        // no piece table: contiguous text run, width from fExtChar
        val fcMin = Cfb.i32(wd, 0x18)
        val fcMax = Cfb.i32(wd, 0x1C)
        require(fcMin >= 0 && fcMax >= fcMin && fcMax <= wd.length,
          "bad fcMin/fcMax text range")
        if ((flags & 0x1000) != 0)
          new String(wd, fcMin, fcMax - fcMin, Utf16le)
        else new String(wd, fcMin, fcMax - fcMin, Cp1252)
      }
    clean(raw)
  }

  /** Decode every piece of the PlcPcd inside the Clx at
    * tbl[fcClx, fcClx+lcb). Prc (clxt=0x01) property blocks are
    * skipped; the Pcdt (clxt=0x02) holds the piece table. */
  private def pieceText(wd: Array[Byte], tbl: Array[Byte],
                        fcClx: Int, lcb: Int): String = {
    require(fcClx >= 0 && lcb > 0 && fcClx.toLong + lcb <= tbl.length,
      "Clx out of table-stream range")
    var p = fcClx
    val end = fcClx + lcb
    while (p < end && (tbl(p) & 0xFF) == 0x01) { // Prc: [01][cb:i16][grpprl]
      require(p + 3 <= end, "truncated Prc")
      p += 3 + Cfb.u16(tbl, p + 1)
    }
    require(p + 5 <= end && (tbl(p) & 0xFF) == 0x02, "no Pcdt in Clx")
    val lcbPlc = Cfb.i32(tbl, p + 1)
    val plc = p + 5
    require(lcbPlc >= 4 && (lcbPlc - 4) % 12 == 0 && plc + lcbPlc <= end,
      "bad PlcPcd size")
    val n = (lcbPlc - 4) / 12
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      val cp0 = Cfb.i32(tbl, plc + 4 * i)
      val cp1 = Cfb.i32(tbl, plc + 4 * (i + 1))
      val pcd = plc + 4 * (n + 1) + 8 * i
      val fcRaw = Cfb.i32(tbl, pcd + 2)
      val chars = cp1 - cp0
      require(chars >= 0, "piece CPs not monotone")
      if ((fcRaw & 0x40000000) != 0) { // fCompressed: CP1252 at fc/2
        val fc = (fcRaw & 0x3FFFFFFF) / 2
        require(fc >= 0 && fc + chars <= wd.length, "piece out of range")
        sb.append(new String(wd, fc, chars, Cp1252))
      } else {
        val fc = fcRaw & 0x3FFFFFFF
        require(fc >= 0 && fc + 2L * chars <= wd.length, "piece out of range")
        sb.append(new String(wd, fc, 2 * chars, Utf16le))
      }
      i += 1
    }
    sb.toString
  }

  /** Word stores structure as in-text control characters. */
  private def clean(s: String): String = {
    val sb = new StringBuilder(s.length)
    var fieldDepth = 0   // inside the 0x13..0x14 instruction half
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == 0x13) fieldDepth += 1                     // field begin
      else if (c == 0x14) { if (fieldDepth > 0) fieldDepth -= 1 } // separator
      else if (c == 0x15) ()                             // field end
      else if (fieldDepth > 0) ()                        // drop instructions
      else if (c == '\r' || c == 0x0B || c == '\f') sb.append('\n')
      else if (c == 0x07) sb.append('\t')               // cell / row mark
      else if (c >= ' ' || c == '\n' || c == '\t') sb.append(c)
      // else: other control marks are dropped
      i += 1
    }
    sb.toString.split("\n").map(_.trim.stripSuffix("\t"))
      .mkString("\n").trim
  }
}

/** Legacy PowerPoint binary (.ppt — bones.py:41): CFB container, the
  * "PowerPoint Document" stream is a tree of 8-byte-headed records
  * ([MS-PPT]: ver/instance, type, length; ver nibble 0xF = container,
  * recursed). Text lives in TextBytesAtom (0x0FA8, CP1252) and
  * TextCharsAtom (0x0FA0, UTF-16LE); inside the SlideListWithText
  * container (0x0FF0) each SlidePersistAtom (0x03F3) opens the next
  * slide's text group, which is how the atoms map to pages. Slide
  * order is the SlideListWithText order — correct for normal saves;
  * a reordered deck saved incrementally would need the persist
  * directory to resolve, which this extractor does not chase. */
object PptExtractor extends BinaryExtractor {
  override val extensions: Set[String] = Set("ppt")

  private val Cp1252 = java.nio.charset.Charset.forName("windows-1252")
  private val Utf16le = java.nio.charset.StandardCharsets.UTF_16LE

  override def extract(bytes: Array[Byte]): String =
    extractPages(bytes).filter(_.nonEmpty).mkString("\n\n").trim

  override def extractPages(bytes: Array[Byte]): Seq[String] = {
    val doc = Cfb.open(bytes).stream("PowerPoint Document").getOrElse(
      throw new IllegalArgumentException("no PowerPoint Document stream"))
    val slides = scala.collection.mutable.ArrayBuffer.empty[StringBuilder]
    // text atoms seen before any SlidePersistAtom (master/notes text
    // in malformed fixtures) land in a preamble bucket, emitted first
    // only if no slides exist at all
    val preamble = new StringBuilder

    def bucket(): StringBuilder =
      if (slides.nonEmpty) slides.last else preamble

    def walk(off: Int, end: Int, inSlideList: Boolean): Unit = {
      var p = off
      while (p + 8 <= end) {
        val verInst = Cfb.u16(doc, p)
        val recType = Cfb.u16(doc, p + 2)
        val len = Cfb.i32(doc, p + 4)
        val body = p + 8
        if (len < 0 || body + len > end) return // truncated tail: stop
        if ((verInst & 0xF) == 0xF) {
          walk(body, body + len, inSlideList || recType == 0x0FF0)
        } else recType match {
          case 0x03F3 if inSlideList => // SlidePersistAtom: next slide
            slides += new StringBuilder
          case 0x0FA8 => // TextBytesAtom
            append(bucket(), new String(doc, body, len, Cp1252))
          case 0x0FA0 => // TextCharsAtom
            append(bucket(), new String(doc, body, len - (len % 2), Utf16le))
          case _ =>
        }
        p = body + len
      }
    }
    walk(0, doc.length, inSlideList = false)

    val pages = slides.map(_.toString.trim).toSeq
    if (pages.nonEmpty) pages
    else if (preamble.nonEmpty) Seq(preamble.toString.trim)
    else Seq.empty
  }

  /** PPT paragraphs end in \r; VT (0x0B) is a soft line break. */
  private def append(sb: StringBuilder, t: String): Unit = {
    val s = t.replace('\r', '\n').replace(0x0B.toChar, '\n').trim
    if (s.nonEmpty) {
      if (sb.nonEmpty) sb.append('\n')
      sb.append(s)
    }
  }
}

object Extractors {
  val all: Seq[BinaryExtractor] = Seq(RtfExtractor, EnexExtractor,
    DocxExtractor, PptxExtractor, OdtExtractor, EpubExtractor,
    PdfExtractor, DocExtractor, PptExtractor)
  val byExtension: Map[String, BinaryExtractor] =
    all.flatMap(e => e.extensions.map(_ -> e)).toMap
}
