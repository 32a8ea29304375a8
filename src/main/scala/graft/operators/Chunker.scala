package graft.operators

import scala.annotation.tailrec

/** Recursive character text splitter — the semantics of LangChain's
  * RecursiveCharacterTextSplitter as used by the reference
  * (conversadocs/bones.py:67-68: chunk_size=1000 chunk_overlap=150;
  * bones.py:160-164: separator hierarchy ["\n\n", "\n", " ", ""]).
  *
  * Split on the coarsest separator that appears; recursively re-split
  * any piece still over `chunkSize` with the next separator; then
  * greedily merge adjacent pieces back up to `chunkSize`, carrying
  * `overlap` characters of suffix context between chunks.
  *
  * This is genuinely imperative string logic, so it runs as a typed
  * flatMap over the documents Dataset (one doc in, N chunks out,
  * fully parallel) rather than as column expressions.
  */
object Chunker {

  val DefaultSeparators: List[String] = List("\n\n", "\n", " ", "")

  def split(
      text: String,
      chunkSize: Int,
      overlap: Int,
      separators: List[String] = DefaultSeparators): Vector[String] = {
    require(overlap < chunkSize, "overlap must be < chunkSize")
    merge(pieces(text, chunkSize, separators), chunkSize, overlap)
  }

  /** Recursively split until every piece is <= chunkSize (or no
    * separator is left, in which case hard-cut). */
  private def pieces(
      text: String, chunkSize: Int, seps: List[String]): Vector[String] =
    if (text.isEmpty) Vector.empty
    else if (text.length <= chunkSize) Vector(text)
    else seps match {
      case Nil => text.grouped(chunkSize).toVector
      case "" :: _ => text.grouped(chunkSize).toVector
      case sep :: rest =>
        val parts = splitKeep(text, sep)
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
