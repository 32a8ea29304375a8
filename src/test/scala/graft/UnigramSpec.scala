package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.UnigramFit

/** Pins the unigram-LM tokenizer (operators.UnigramFit): the EM
  * arithmetic on a hand-computed fixture, Viterbi parses and their
  * tie-break, the reassembly/coverage laws over generated words, the
  * distributed-fit == local-fit identity, and the registered apply
  * query's per-doc accounting invariants. */
class UnigramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("one EM iteration matches the hand-computed lattice posteriors") {
    // words {ab: 2, b: 1}, pieces seeded {a:2, ab:2, b:3}, Z=7.
    // word "ab": Z_w = p(ab) + p(a)p(b) = 2/7 + 6/49 = 20/49;
    //   posterior(ab) = 0.7, posterior(a) = posterior(b) = 0.3
    // E-counts: ab = 2·0.7 = 1.4; a = 0.6; b = 0.6 + 1 = 1.6; Z = 3.6
    // p1: a = 1/6, ab = 7/18, b = 4/9
    val fitted = UnigramFit.fitLocal(
      Array("ab" -> 2L, "b" -> 1L), vocabTarget = 10, emIters = 1,
      maxLen = 2).toMap
    assert(fitted.keySet == Set("a", "ab", "b"))
    assert(math.abs(fitted("a") - 1.0 / 6) < 1e-9, fitted("a"))
    assert(math.abs(fitted("ab") - 7.0 / 18) < 1e-9, fitted("ab"))
    assert(math.abs(fitted("b") - 4.0 / 9) < 1e-9, fitted("b"))
  }

  test("EM never decreases the corpus likelihood on the fixture") {
    val words = Array("abab" -> 3L, "aba" -> 2L, "bb" -> 1L, "a" -> 4L)
    def likelihood(model: Map[String, Double]): Double =
      words.map { case (w, f) =>
        // total path probability via the same DP shape Viterbi uses
        val n = w.length
        val alpha = new Array[Double](n + 1)
        alpha(0) = 1.0
        for (i <- 1 to n; l <- 1 to math.min(4, i))
          model.get(w.substring(i - l, i))
            .foreach(p => alpha(i) += alpha(i - l) * p)
        f * math.log(alpha(n))
      }.sum
    val p1 = UnigramFit.fitLocal(words, 20, emIters = 1).toMap
    val p2 = UnigramFit.fitLocal(words, 20, emIters = 2).toMap
    val p3 = UnigramFit.fitLocal(words, 20, emIters = 3).toMap
    assert(likelihood(p2) >= likelihood(p1) - 1e-9,
      s"${likelihood(p1)} -> ${likelihood(p2)}")
    assert(likelihood(p3) >= likelihood(p2) - 1e-9,
      s"${likelihood(p2)} -> ${likelihood(p3)}")
  }

  test("viterbi picks the max-probability parse, longest on ties") {
    // from the fixture's p1: ln(7/18) > ln(1/6) + ln(4/9)
    val m = Map("a" -> -1791759L, "ab" -> -944462L, "b" -> -810930L)
    assert(UnigramFit.viterbi("ab", m, maxLen = 2) == Seq("ab"))
    assert(UnigramFit.viterbi("ba", m, maxLen = 2) == Seq("b", "a"))
    assert(UnigramFit.viterbi("abab", m, maxLen = 2) == Seq("ab", "ab"))
    // exact tie: p(ab) == p(a)·p(b) in micro-nats — longest piece wins
    val tie = Map("a" -> -10L, "b" -> -10L, "ab" -> -20L)
    assert(UnigramFit.viterbi("ab", tie, maxLen = 2) == Seq("ab"))
    // unknown chars segment as single-char UNK pieces, never crash
    assert(UnigramFit.viterbi("xa", m, maxLen = 2) == Seq("x", "a"))
    assert(UnigramFit.viterbi("", m, maxLen = 2) == Seq.empty)
  }

  test("reassembly and coverage laws hold over generated words") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcde"
    val words = Array.fill(60) {
      val n = 1 + rnd.nextInt(10)
      (Array.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString,
        1L + rnd.nextInt(9))
    }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toArray
    val model = UnigramFit.fitLocal(words, vocabTarget = 16).toMap
    // coverage: every alphabet char survives the cut
    alpha.foreach(c =>
      assert(model.contains(c.toString), s"char $c pruned"))
    // the cut respects the target modulo the alphabet guarantee
    assert(model.size <= 16 + alpha.length, model.size)
    val micro = model.map { case (p, pr) =>
      (p, math.floor(math.log(pr) * 1e6 + 0.5).toLong)
    }
    words.foreach { case (w, _) =>
      val pieces = UnigramFit.viterbi(w, micro)
      assert(pieces.mkString == w, s"$w -> $pieces")
      assert(pieces.nonEmpty && pieces.forall(_.nonEmpty))
    }
    // determinism: a rerun is bit-identical
    assert(UnigramFit.fitLocal(words, vocabTarget = 16).toMap == model)
  }

  test("distributed fit equals the local fit, micro-quantized") {
    import spark.implicits._
    val words = Seq(("spark" , 5L), ("scan", 3L), ("scala", 2L),
      ("park", 2L)).toDF("word", "freq")
    val dist = UnigramFit.fit(spark, words, vocabTarget = 12)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val local = UnigramFit.fitLocal(
      Array("spark" -> 5L, "scan" -> 3L, "scala" -> 2L, "park" -> 2L),
      vocabTarget = 12)
      .map { case (p, pr) =>
        (p, math.floor(math.log(pr) * 1e6 + 0.5).toLong)
      }.toSeq
    assert(dist == local)
  }

  test("tokenizer_unigram_fit and _apply hold their accounting laws") {
    val model = graft.queries.Text.unigramFit.run(spark, sf).collect()
    assert(model.nonEmpty)
    assert(model.forall(_.getLong(1) < 0L), "logp must be negative")
    // pieces are distinct and sorted (the published-model contract)
    val pieces = model.map(_.getString(0))
    assert(pieces.toSeq == pieces.toSeq.sorted && pieces.distinct.length
      == pieces.length)

    val rows = graft.queries.Text.unigramApply.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, np) = (r.getLong(1), r.getLong(2))
      // every word is >= 1 piece; a piece is >= 1 char
      assert(np >= nw, s"doc ${r.getLong(0)}: $np pieces < $nw words")
      if (nw > 0) {
        val ratio = r.getDouble(3)
        assert(ratio >= 1.0, s"doc ${r.getLong(0)}: ratio $ratio")
        assert(math.abs(ratio - math.floor(np.toDouble / nw * 10000 + 0.5)
          / 10000) < 1e-12)
      } else assert(r.isNullAt(3))
    }
    spark.catalog.clearCache()
  }
}
