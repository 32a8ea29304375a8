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

/** Evernote export (.enex — bones.py:37 EverNoteLoader): XML of
  * <note> entries whose <content> wraps en-note HTML in CDATA. Emits
  * "title\nbody" per note, tags stripped, core entities decoded. */
object EnexExtractor extends BinaryExtractor {
  override val extensions: Set[String] = Set("enex")

  private val NoteRe = "(?s)<note>(.*?)</note>".r
  private val TitleRe = "(?s)<title>(.*?)</title>".r
  private val CdataRe = "(?s)<content>\\s*<!\\[CDATA\\[(.*?)\\]\\]>".r

  private def stripTags(h: String): String =
    h.replaceAll("(?s)<[^>]*>", " ")
      .replace("&nbsp;", " ").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'").replace("&amp;", "&")
      .replaceAll("\\s+", " ").trim

  override def extract(bytes: Array[Byte]): String = {
    val xml = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    NoteRe.findAllMatchIn(xml).map { m =>
      val note = m.group(1)
      val title = TitleRe.findFirstMatchIn(note).map(t => stripTags(t.group(1)))
      val body = CdataRe.findFirstMatchIn(note).map(c => stripTags(c.group(1)))
      (title.toSeq ++ body.toSeq).mkString("\n")
    }.mkString("\n\n")
  }
}

object Extractors {
  val all: Seq[BinaryExtractor] = Seq(RtfExtractor, EnexExtractor)
  val byExtension: Map[String, BinaryExtractor] =
    all.flatMap(e => e.extensions.map(_ -> e)).toMap
}
