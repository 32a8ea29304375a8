package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BpeFit

/** Pins the byte-level BPE (operators.BpeFit.fitBytes /
  * Text.tokenizer_bbpe_*): the hand-computed first merges, byte-hex
  * symbol rendering, the TOTAL-coverage law (any input — non-ASCII,
  * emoji — reassembles exactly from its pieces, the property the
  * 256-symbol base alphabet guarantees by construction), and the
  * registered apply query's accounting invariants. */
class BbpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("hexPairs renders UTF-8 bytes as uppercase hex symbols") {
    assert(BpeFit.hexPairs("ab").toSeq == Seq("61", "62"))
    // 'é' is two UTF-8 bytes — the byte alphabet sees both
    assert(BpeFit.hexPairs("é").toSeq == Seq("C3", "A9"))
    assert(BpeFit.hexPairs(" t").toSeq == Seq("20", "74"))
    assert(BpeFit.hexPairs("").isEmpty)
  }

  test("byte-level merge loop matches the hand-computed fixture") {
    // words {' the': 5, 'the': 3, ' cat': 2} as byte sequences.
    // pair counts: (74,68)=8, (68,65)=8, (20,74)=5, (20,63)=2,
    // (63,61)=2, (61,74)=2 — argmax ties (68,65) vs (74,68) at 8,
    // left-asc tie-break picks (68,65); merge 2 is then (74,6865)=8
    val seqs = Array(
      (BpeFit.hexPairs(" the"), 5L),
      (BpeFit.hexPairs("the"), 3L),
      (BpeFit.hexPairs(" cat"), 2L))
    val merges = BpeFit.fitSeqs(seqs, 2)
    assert(merges.map(m => (m.left, m.right, m.cnt)) ==
      Seq(("68", "65", 8L), ("74", "6865", 8L)), merges)
  }

  test("coverage is total by construction: every input reassembles") {
    // the byte-level law word-level BPE's UNK only approximates: ANY
    // string — unseen, non-ASCII, multi-byte — segments into pieces
    // whose concatenation is exactly its byte sequence
    val corpus = Array(("hello world", 5L), (" the", 4L), ("héllo", 2L))
    val merges = BpeFit.fitSeqs(
      corpus.map { case (w, f) => (BpeFit.hexPairs(w), f) }, 6)
    def segment(w: String): Seq[String] = {
      // the apply path's delimited-replace chain, in-process
      var s = BpeFit.hexPairs(w).mkString("||", "||", "||")
      merges.foreach { m =>
        s = s.replace("|" + m.left + "||" + m.right + "|",
          "|" + m.left + m.right + "|")
      }
      s.split("\\|\\|").toSeq.filter(_.nonEmpty)
    }
    for (w <- Seq("hello", "héllo", "unseen—token", "☃ snow", "xyz",
        " the", "")) {
      val pieces = segment(w)
      assert(pieces.mkString == BpeFit.hexPairs(w).mkString,
        s"'$w' -> $pieces")
      assert(pieces.forall(p => p.nonEmpty && p.length % 2 == 0))
    }
  }

  test("tokenizer_bbpe_apply holds its accounting laws") {
    val rows = graft.queries.Text.bbpeApply.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, nb, np) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(np <= nb, s"pieces $np > bytes $nb") // merges only shrink
      assert(np >= nw, s"pieces $np < words $nw") // >=1 piece per token
      if (nb > 0) {
        val c = r.getDouble(4)
        assert(c > 0 && c <= 1.0, s"compression $c")
      }
    }
  }
}
