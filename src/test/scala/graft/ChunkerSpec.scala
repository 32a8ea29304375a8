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

  test("summarizePipeline: page pre-split then 2000/100, like load_and_split") {
    // bones.py:152-156: summarize() runs loader.load_and_split() (one
    // doc per page, default 4000/200 recursive split) BEFORE the
    // 2000/100 sentence splitter — two-stage, per page. Fixture: three
    // pages, one of them > 4000 chars so stage 1 actually cuts.
    val pageA = (1 to 90).map(i => s"Alpha sentence $i ends here.").mkString(" ")
    val pageB = (1 to 160).map(i => s"Beta sentence $i ends here.").mkString(" ")
    val pageC = "Short final page. Just two sentences."
    assert(pageA.length < 4000 && pageB.length > 4000)
    val pages = Seq(pageA, pageB, pageC)
    val chunks = Chunker.summarizePipeline(pages)
    // chunks never span a page boundary: every chunk is a substring of
    // exactly one page (overlap suffixes come from the same page too)
    chunks.foreach { c =>
      assert(pages.count(_.contains(c)) >= 1, c.take(80))
    }
    // a page under both limits passes through whole
    assert(chunks.last == pageC)
    // stage 1 on the long page runs the DEFAULT hierarchy at 4000/200:
    // equivalent to summarizeSplit over stage-1 pieces, not over the
    // raw page — so the two-stage output differs from the single-stage
    // split of the same page (the fidelity gap the pipeline models)
    assert(Chunker.summarizePipeline(Seq(pageB)) != Chunker.summarizeSplit(pageB))
    // and differs from splitting the concatenated document: the page
    // boundary is a hard cut single-stage splitting would ignore
    assert(chunks != Chunker.summarizeSplit(pages.mkString(" ")))
    // every chunk still respects the stage-2 bound
    assert(chunks.forall(_.length <= 2100))
  }
}
