package graft.operators

import scala.annotation.tailrec

/** Recursive character text splitter — the semantics of LangChain's
  * RecursiveCharacterTextSplitter as used by the reference
  * (conversadocs/bones.py:67-68: chunk_size=1000 chunk_overlap=150
  * with the default hierarchy; bones.py:160-165: the summarize
  * splitter, chunk_size=2000 chunk_overlap=100 with separators
  * ["\n\n", "\n", "(?<=\. )", " ", ""] — a zero-width lookbehind that
  * splits AFTER each sentence-ending ". ").
  *
  * Split on the coarsest separator that appears; recursively re-split
  * any piece still over `chunkSize` with the next separator; then
  * greedily merge adjacent pieces back up to `chunkSize`, carrying
  * `overlap` characters of suffix context between chunks.
  *
  * Separators are literal by default; pass `sepIsRegex = true` to
  * compile them as java.util.regex patterns (the sentence hierarchy
  * needs it). Matched separator text stays attached to the PRECEDING
  * piece, so concatenating pieces reproduces the input; a zero-width
  * match (lookbehind) splits without consuming anything.
  *
  * Deliberate divergence from LangChain: its keep_separator=True
  * prepends the matched separator to the FOLLOWING piece, so chunk
  * text from literal separators ("\n\n", "\n", " ") differs at the
  * boundaries (leading vs trailing whitespace) even though chunk
  * COUNT and coverage match; the zero-width sentence lookbehind is
  * identical under both conventions. Preceding-attachment keeps
  * every piece's trailing context (a chunk ends at its own paragraph
  * break) and round-trips by plain concatenation. Flip attachment if
  * byte-level parity with RecursiveCharacterTextSplitter ever
  * matters.
  *
  * This is genuinely imperative string logic, so it runs as a typed
  * flatMap over the documents Dataset (one doc in, N chunks out,
  * fully parallel) rather than as column expressions.
  */
object Chunker {

  val DefaultSeparators: List[String] = List("\n\n", "\n", " ", "")

  /** bones.py:160-164 summarize hierarchy: paragraph, line, sentence
    * boundary (regex lookbehind), word, hard cut. */
  val SentenceSeparators: List[String] =
    List("\n\n", "\n", "(?<=\\. )", " ", "")

  def split(
      text: String,
      chunkSize: Int,
      overlap: Int,
      separators: List[String] = DefaultSeparators,
      sepIsRegex: Boolean = false): Vector[String] = {
    require(overlap < chunkSize, "overlap must be < chunkSize")
    // compile each regex separator ONCE per call — pieces() recurses
    // per sub-piece, and recompiling 5 patterns per piece would burn
    // scan-time CPU across the whole corpus in the flatMap hot path
    val seps: List[(String, java.util.regex.Pattern)] =
      if (sepIsRegex)
        separators.map(s =>
          s -> (if (s.isEmpty) null else java.util.regex.Pattern.compile(s)))
      else separators.map(_ -> null)
    merge(pieces(text, chunkSize, seps), chunkSize, overlap)
  }

  /** The reference's summarize split (bones.py:160-165):
    * chunk_size=2000, overlap=100, sentence-aware hierarchy. */
  def summarizeSplit(text: String): Vector[String] =
    split(text, 2000, 100, SentenceSeparators, sepIsRegex = true)

  /** The FULL summarize pipeline (bones.py:152-165) is two-stage:
    * `loader.load_and_split()` first — one doc per page, each page
    * further split by the DEFAULT recursive splitter (4000/200,
    * paragraph/line/word hierarchy) — and only then the 2000/100
    * sentence splitter above. Consequence: chunks never span a page
    * boundary, and a >4000-char page is pre-cut at paragraph/word
    * boundaries before the sentence pass sees it — boundaries on
    * multi-page docs differ from running summarizeSplit on the
    * concatenated text (ChunkerSpec pins both effects). */
  def summarizePipeline(pages: Seq[String]): Vector[String] =
    pages.toVector
      .flatMap(split(_, 4000, 200))
      .flatMap(summarizeSplit)

  /** Recursively split until every piece is <= chunkSize (or no
    * separator is left, in which case hard-cut). Each separator
    * carries its pre-compiled Pattern (null = literal matching). */
  private def pieces(
      text: String, chunkSize: Int,
      seps: List[(String, java.util.regex.Pattern)]): Vector[String] =
    if (text.isEmpty) Vector.empty
    else if (text.length <= chunkSize) Vector(text)
    else seps match {
      case Nil => text.grouped(chunkSize).toVector
      case ("", _) :: _ => text.grouped(chunkSize).toVector
      case (sep, pat) :: rest =>
        val parts =
          if (pat != null) splitKeepRegex(text, pat)
          else splitKeep(text, sep)
        if (parts.length <= 1) pieces(text, chunkSize, rest)
        else parts.flatMap(p => pieces(p, chunkSize, rest))
    }

  /** Split on `sep`, keeping the separator attached to the preceding
    * piece so concatenation of pieces reproduces the text. */
  private def splitKeep(text: String, sep: String): Vector[String] = {
    @tailrec
    def loop(from: Int, acc: Vector[String]): Vector[String] =
      text.indexOf(sep, from) match {
        case -1 =>
          if (from < text.length) acc :+ text.substring(from) else acc
        case i => loop(i + sep.length, acc :+ text.substring(from, i + sep.length))
      }
    loop(0, Vector.empty)
  }

  /** Regex variant of splitKeep: pieces end at each match's END, so
    * consumed separators stay with the preceding piece and zero-width
    * matches (e.g. the sentence lookbehind) are pure split points.
    * java.util.regex.Matcher.find advances past zero-width matches on
    * its own, so this terminates. */
  private def splitKeepRegex(
      text: String, p: java.util.regex.Pattern): Vector[String] = {
    val m = p.matcher(text)
    val out = Vector.newBuilder[String]
    var from = 0
    while (m.find()) {
      if (m.end > from) { out += text.substring(from, m.end); from = m.end }
    }
    if (from < text.length) out += text.substring(from)
    out.result()
  }

  /** Greedy merge of pieces into chunks <= chunkSize; each next chunk
    * starts with the last `overlap` characters of the previous one. */
  private def merge(
      parts: Vector[String], chunkSize: Int, overlap: Int): Vector[String] = {
    val out = Vector.newBuilder[String]
    var cur = new StringBuilder
    for (p <- parts) {
      if (cur.nonEmpty && cur.length + p.length > chunkSize) {
        val done = cur.toString
        out += done
        val tail = done.takeRight(overlap)
        cur = new StringBuilder(tail)
      }
      cur ++= p
    }
    if (cur.nonEmpty) out += cur.toString
    out.result()
  }
}
