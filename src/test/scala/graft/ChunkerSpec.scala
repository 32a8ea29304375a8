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
}
