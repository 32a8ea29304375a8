package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.WordPieceFit

/** Pins the WordPiece tokenizer (operators.WordPieceFit): the
  * likelihood argmax on a hand-computed fixture (including the
  * equal-score tie-break and the step where the likelihood choice
  * diverges from BPE's count argmax), greedy longest-match laws, and
  * the registered queries' accounting invariants. */
class WordPieceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("fitLocal follows the hand-computed likelihood argmax") {
    // words {ab: 10, ac: 5}.
    // step 1 symbols: a=15 b=10 c=5 </w>=15
    //   scores: (a,b) 10/150, (b,</w>) 10/150, (a,c) 5/75,
    //           (c,</w>) 5/75 — a four-way EXACT double tie at 1/15
    //   (correctly-rounded division of the same rational) →
    //   (l, r) ascending → (a,b)
    // step 2 symbols: ab=10 a=5 c=5 </w>=15
    //   scores: (ab,</w>) 10/150, (a,c) 5/25 = 0.2, (c,</w>) 5/75
    //   likelihood picks (a,c) — BPE's count argmax would pick
    //   (ab,</w>) with cnt 10: the family genuinely diverges here
    // step 3 symbols: ab=10 ac=5 </w>=15
    //   scores: (ab,</w>) 10/150, (ac,</w>) 5/75 — exact tie → (ab,…)
    val ms = WordPieceFit.fitLocal(Array("ab" -> 10L, "ac" -> 5L), 3)
    assert(ms.map(m => (m.step, m.left, m.right, m.cnt)) == Seq(
      (1L, "a", "b", 10L),
      (2L, "a", "c", 5L),
      (3L, "ab", "</w>", 10L)))
  }

  test("fitLocal stops when every word is fully merged") {
    val ms = WordPieceFit.fitLocal(Array("ab" -> 3L), 10)
    // ab</w> needs exactly 2 merges to collapse to one symbol
    assert(ms.length == 2)
  }

  test("greedy longest-match consumes the longest piece first") {
    val vocab = WordPieceFit.vocabulary(Seq("ab", "ac", "ab</w>"))
    val maxLen = vocab.map(_.length).max
    assert(WordPieceFit.greedyPieces("ab", vocab, maxLen) == 1L) // ab</w>
    assert(WordPieceFit.greedyPieces("ac", vocab, maxLen) == 2L) // ac|</w>
    assert(WordPieceFit.greedyPieces("abc", vocab, maxLen) == 3L) // ab|c|</w>
    assert(WordPieceFit.greedyPieces("xyz", vocab, maxLen) == 4L) // x|y|z|</w>
    assert(WordPieceFit.greedyPieces("aab", vocab, maxLen) == 2L) // a|ab</w>
  }

  test("greedy covers any [a-z0-9] word with the bare alphabet") {
    val vocab = WordPieceFit.vocabulary(Nil)
    val maxLen = vocab.map(_.length).max
    // no merges: every char is one piece, plus the </w> terminal
    for (w <- Seq("a", "q7", "z0z0z0"))
      assert(WordPieceFit.greedyPieces(w, vocab, maxLen) == w.length + 1L)
  }

  test("registered fit matches the local loop on the corpus head") {
    val df = SparkEntry.queries("tokenizer_wordpiece_fit")(spark, sf)
    val rows = df.collect()
    assert(rows.length == 8)
    assert(rows.map(_.getLong(0)).toSeq == (1L to 8L))
    // merged symbols grow out of prior steps: each step's pieces are
    // concatenations of symbols available at that step
    val syms = scala.collection.mutable.Set[String]() ++
      (('a' to 'z') ++ ('0' to '9')).map(_.toString) + "</w>"
    rows.foreach { r =>
      assert(syms.contains(r.getString(1)), s"left ${r.getString(1)}")
      assert(syms.contains(r.getString(2)), s"right ${r.getString(2)}")
      syms += r.getString(3)
    }
    spark.catalog.clearCache()
  }

  test("registered apply keeps the per-doc accounting laws") {
    val df = SparkEntry.queries("tokenizer_wordpiece_apply")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, np) = (r.getLong(1), r.getLong(2))
      // each word is at least 1 piece and at most len+1 single chars;
      // with words present the piece count is at least the word count
      assert(np >= nw, s"${r.getLong(0)}: $np < $nw")
      if (nw == 0) assert(r.isNullAt(3))
      else {
        val ratio = r.getDouble(3)
        assert(ratio >= 1.0 && ratio == math.floor(ratio * 10000 + 0.5) / 10000)
      }
    }
    spark.catalog.clearCache()
  }
}
