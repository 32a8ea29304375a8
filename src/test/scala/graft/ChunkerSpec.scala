package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Chunker

class ChunkerSpec extends AnyFunSuite {

  test("short text is a single chunk") {
    assert(Chunker.split("hello world", 100, 10) == Vector("hello world"))
  }

  test("splits on paragraph separators first") {
    val text = ("a" * 80) + "\n\n" + ("b" * 80) + "\n\n" + ("c" * 80)
    val chunks = Chunker.split(text, 100, 0)
    assert(chunks.nonEmpty)
    assert(chunks.forall(_.length <= 100))
    assert(chunks.mkString == text) // zero overlap → exact coverage
  }

  test("word-level split with overlap carries suffix context") {
    val text = (1 to 100).map(i => s"w$i").mkString(" ")
    val chunks = Chunker.split(text, 50, 10)
    assert(chunks.forall(_.length <= 60)) // size + overlap bound
    // every consecutive pair shares the overlap suffix/prefix
    chunks.sliding(2).foreach {
      case Vector(a, b) => assert(b.startsWith(a.takeRight(10)))
      case _ =>
    }
    // removing the overlap prefix from each later chunk restores the text
    val restored = chunks.head + chunks.tail.map(_.drop(10)).mkString
    assert(restored == text)
  }

  test("hard-cuts a separator-free run") {
    val text = "x" * 250
    val chunks = Chunker.split(text, 100, 0)
    assert(chunks == Vector("x" * 100, "x" * 100, "x" * 50))
  }

  test("reference defaults (1000/150) keep chunks bounded") {
    val text = (1 to 2000).map(i => s"tok$i").mkString(" ")
    val chunks = Chunker.split(text, 1000, 150)
    assert(chunks.forall(_.length <= 1150))
    assert(chunks.length > 1)
  }

  test("sentence hierarchy splits AFTER '. ' like LangChain's lookbehind") {
    // mirrors bones.py:160-164 separators=["\n\n","\n","(?<=\. )"," ",""]
    // with is-regex semantics: the zero-width lookbehind splits at
    // sentence boundaries, keeping ". " with the preceding sentence.
    val s1 = "First sentence here. "
    val s2 = "Second one follows. "
    val s3 = "Third closes it."
    val text = s1 + s2 + s3 // 58 chars, no \n separators
    val chunks = Chunker.split(text, 25, 0,
      Chunker.SentenceSeparators, sepIsRegex = true)
    // each sentence fits in 25 chars, so pieces ARE the sentences
    // (greedy merge cannot combine two without exceeding the size)
    assert(chunks == Vector(s1, s2, s3))
    assert(chunks.mkString == text)
    // a paragraph break still outranks the sentence boundary
    val para = "One. Two. Three." + "\n\n" + "Four. Five. Six."
    val pc = Chunker.split(para, 20, 0,
      Chunker.SentenceSeparators, sepIsRegex = true)
    assert(pc == Vector("One. Two. Three.\n\n", "Four. Five. Six."))
  }

  test("summarizeSplit uses the 2000/100 summarize profile") {
    val sentences = (1 to 300).map(i => s"Sentence number $i ends here.").mkString(" ")
    val chunks = Chunker.summarizeSplit(sentences)
    assert(chunks.length > 1)
    assert(chunks.forall(_.length <= 2100)) // size + overlap bound
    // chunks break at sentence boundaries (every chunk after the first
    // starts at an overlap offset inside a sentence-aligned piece)
    assert(chunks.head.endsWith("ends here. ") || chunks.head.endsWith("ends here."))
  }
}
