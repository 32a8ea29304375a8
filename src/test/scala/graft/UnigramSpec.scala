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

  test("estepCounts matches the hand-computed lattice posteriors") {
    // the fixture from the EM test, on the 1e-9 probability grid:
    // pieces {a: 2/7, ab: 2/7, b: 3/7}. Word "ab": Z = p(ab) +
    // p(a)p(b); γ(ab) = 0.7, γ(a) = γ(b) = 0.3 → 1e-6-grid counts
    val pm = Map(
      "a" -> math.floor(2.0 / 7 * 1e9 + 0.5).toLong,
      "ab" -> math.floor(2.0 / 7 * 1e9 + 0.5).toLong,
      "b" -> math.floor(3.0 / 7 * 1e9 + 0.5).toLong)
    val g = UnigramFit.estepCounts("ab", pm, maxLen = 2).toMap
    assert(math.abs(g("ab") - 700000L) <= 1, g)
    assert(math.abs(g("a") - 300000L) <= 1, g)
    assert(math.abs(g("b") - 300000L) <= 1, g)
    // single-piece word: all mass on its own parse
    assert(UnigramFit.estepCounts("b", pm, maxLen = 2).toMap
      .apply("b") == 1000000L)
    // coverage law: expected char coverage Σ γ·len(piece) = n·1e6
    // (± per-edge quantization), incl. unknown-char fallback edges
    for (w <- Seq("ab", "abab", "xab", "bbb")) {
      val total = UnigramFit.estepCounts(w, pm, maxLen = 2)
        .map { case (p, gm) => p.length * gm }.sum
      assert(math.abs(total - w.length * 1000000L) <= 8,
        s"$w covers $total")
    }
    assert(UnigramFit.estepCounts("", pm).isEmpty)
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

  test("sampling: deterministic per (word, salt), correct marginals, sharp→Viterbi") {
    // fixture model: P([ab]) = (7/18) / (7/18 + (1/6)(4/9)) = 0.84
    // of the alpha=1 lattice mass for "ab"
    val m = Map("a" -> -1791759L, "ab" -> -944462L, "b" -> -810930L)
    val one = UnigramFit.sampleSegmentation("ab", m, 1.0, "s0")
    // determinism: same (word, salt, alpha) → same parse, always
    (1 to 5).foreach(_ =>
      assert(UnigramFit.sampleSegmentation("ab", m, 1.0, "s0") == one))
    // reassembly holds for every draw; both parses appear across salts
    val draws = (0 until 200).map(i =>
      UnigramFit.sampleSegmentation("ab", m, 1.0, s"s$i"))
    draws.foreach(p => assert(p.mkString == "ab", p))
    val whole = draws.count(_ == Seq("ab"))
    assert(whole > 130 && whole < 198, // E≈168, ±5σ≈±26
      s"P([ab])≈0.84 but sampled $whole/200")
    // sharp temperature concentrates on the Viterbi parse
    val sharp = (0 until 50).map(i =>
      UnigramFit.sampleSegmentation("ab", m, 8.0, s"t$i"))
    assert(sharp.forall(_ == UnigramFit.viterbi("ab", m, maxLen = 4)),
      "alpha=8 must concentrate on the max-probability parse")
    // unknown chars sample like Viterbi's UNK path, never crash
    assert(UnigramFit.sampleSegmentation("xa", m, 1.0, "s0")
      .mkString == "xa")
    assert(UnigramFit.sampleSegmentation("", m, 1.0, "s0") == Seq.empty)
    // a LONG all-unknown word would underflow a linear-space forward
    // pass to an unterminating 0/0 lattice — log space must terminate
    // and reassemble (60 chars ≫ the ~35-char linear underflow point)
    val long = "x" * 60
    assert(UnigramFit.sampleSegmentation(long, m, 1.0, "s0")
      .mkString == long)
  }

  test("tokenizer_unigram_sample holds its accounting laws") {
    val rows = graft.queries.Text.unigramSample.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, nv, ns) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nv >= nw && ns >= nw,
        s"doc ${r.getLong(0)}: words $nw viterbi $nv sampled $ns")
    }
    // rerun is identical (the epoch-salt determinism law, end to end)
    val again = graft.queries.Text.unigramSample.run(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
    spark.catalog.clearCache()
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
