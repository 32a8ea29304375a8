package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every registered operator runs at sf0.001 and the ones that
  * must produce rows do. The value-level gate is the DuckDB oracle
  * (tools/check.py, driver t2); this keeps `sbt test` catching
  * regressions in every query including the rows-only ones. */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // operators whose result can legitimately be small/empty at tiny SF
  // (ann_lsh: 16-bit bands are a near-duplicate candidate generator
  // and this synthetic corpus tops out at pair cos ~0.6 — see the
  // regime note on Vectors.annLsh; VectorSpec gates the planted-dup
  // recall instead)
  private val mayBeEmpty = Set("dedup_embedding", "ann_lsh")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, TestSpark.sf)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q_power_mde holds its internal identities") {
    val r = graft.queries.Stats.powerMde.run(spark, TestSpark.sf)
      .collect().head
    val (nC, nT) = (r.getLong(0), r.getLong(1))
    val meanC = r.getDouble(2)
    val se = r.getDouble(3)
    val mdeAbs = r.getDouble(4)
    val mdeRel = r.getDouble(5)
    val nReq = r.getLong(6)
    assert(nC > 0 && nT > 0 && math.abs(nC - nT) < (nC + nT),
      s"arms $nC/$nT")
    assert(se > 0 && mdeAbs > 0 && nReq >= 1, r.toString)
    // mde_abs = z·se and mde_rel = mde_abs/mean_c, to the 6dp grid
    assert(math.abs(mdeAbs - 2.801585 * se) < 1e-5, s"$mdeAbs vs z*$se")
    assert(math.abs(mdeRel - mdeAbs / meanC) < 1e-5, r.toString)
  }

  test("q_fdr_bh: BH step-up laws hold") {
    val rows = graft.queries.Stats.fdrBh.run(spark, TestSpark.sf)
      .collect().map { r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(4),
          r.getInt(5), r.getDouble(6), r.getInt(7))
      }
    // the family is fixed at the 25 nations, ranks a permutation
    assert(rows.length == 25)
    assert(rows.map(_._5).sorted.toSeq == (1 to 25))
    val byK = rows.sortBy(_._5)
    // declared thresholds are strictly decreasing in k (BH step-up)
    byK.map(_._6).toSeq.sliding(2).foreach { case Seq(a, b) =>
      assert(a > b, s"z_crit not decreasing: $a -> $b")
    }
    // |z| is non-increasing in rank (ranked on the rounded grid)
    byK.map(t => math.abs(t._4)).toSeq.sliding(2).foreach {
      case Seq(a, b) =>
        assert(a >= b, s"|z| increases down the ranks: $a -> $b")
    }
    // the rejection set is exactly the prefix up to k* = max passing k
    val kStar = byK.filter(t => math.abs(t._4) >= t._6)
      .map(_._5).maxOption.getOrElse(0)
    byK.foreach { t =>
      assert((t._7 == 1) == (t._5 <= kStar),
        s"rank ${t._5}: rejected=${t._7}, k*=$kStar")
    }
    // underpowered cells (an arm with n < 2) score z = 0 by contract
    rows.filter(t => t._2 < 2 || t._3 < 2)
      .foreach(t => assert(t._4 == 0d, t.toString))
  }

  test("q_winsor_mean: robust-metric laws hold") {
    val r = graft.queries.Stats.winsorMean.run(spark, TestSpark.sf)
      .collect().head
    val (nC, nT) = (r.getLong(0), r.getLong(1))
    val (v99C, v99T) = (r.getLong(2), r.getLong(3))
    val (wmC, wmT) = (r.getDouble(4), r.getDouble(5))
    val (tmC, tmT) = (r.getDouble(6), r.getDouble(7))
    val (wDiff, zWin) = (r.getDouble(8), r.getDouble(9))
    assert(nC > 0 && nT > 0 && v99C >= 0 && v99T >= 0)
    // trimming drops the tail entirely; winsorizing replaces it with
    // v99 >= every kept value — so trim_mean <= win_mean <= v99
    assert(tmC <= wmC + 1e-9 && wmC <= v99C + 1e-9, r.toString)
    assert(tmT <= wmT + 1e-9 && wmT <= v99T + 1e-9, r.toString)
    // the z statistic carries the diff's sign
    assert(zWin * wDiff >= 0, r.toString)
    assert(math.abs(wDiff - (wmT - wmC)) < 2e-6, r.toString)
  }

  test("q_did: the DiD identity and sign laws hold") {
    val r = graft.queries.Stats.did.run(spark, TestSpark.sf)
      .collect().head
    val (nC, nT) = (r.getLong(0), r.getLong(1))
    val preDiff = r.getDouble(2); val zPre = r.getDouble(3)
    val postDiff = r.getDouble(4); val zPost = r.getDouble(5)
    val didV = r.getDouble(6); val zDid = r.getDouble(7)
    assert(nC > 0 && nT > 0)
    // DiD telescopes: did = post_diff - pre_diff (to the 6dp grid)
    assert(math.abs(didV - (postDiff - preDiff)) < 3e-6, r.toString)
    // each z carries its diff's sign
    assert(zPre * preDiff >= 0 && zPost * postDiff >= 0
      && zDid * didV >= 0, r.toString)
  }

  test("q_srm: guardrail identities hold") {
    val rows = graft.queries.Stats.srm.run(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getInt(4)))
    assert(rows.length == 26)
    val (glob, segs) = rows.partition(_._1 == "_global")
    assert(glob.length == 1 && segs.length == 25)
    // the global row is the exact segment sum
    assert(glob.head._2 == segs.map(_._2).sum
      && glob.head._3 == segs.map(_._3).sum)
    rows.foreach { case (seg, nc, nt, chisq, flag) =>
      val expect =
        if (nc + nt == 0) 0d
        else (nc - nt).toDouble * (nc - nt) / (nc + nt)
      assert(math.abs(chisq - expect) < 1e-5, s"$seg: $chisq vs $expect")
      assert((flag == 1) == (chisq > 3.841459), s"$seg flag")
    }
    // md5-parity assignment on a healthy corpus must not trip the
    // global guardrail
    assert(glob.head._5 == 0, s"global SRM flagged: ${glob.head}")
  }

  test("ann_dim_curve: the full-width row anchors at recall 1.0") {
    val rows = graft.queries.Vectors.annDimCurve.run(spark, TestSpark.sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(8, 16, 32, 64))
    // same truth denominator on every row; recalls are proportions
    assert(rows.map(_._3).distinct.length == 1)
    rows.foreach { case (d, hits, n, rec) =>
      assert(hits >= 0 && hits <= n && rec >= 0.0 && rec <= 1.0,
        s"d=$d: $hits/$n -> $rec")
    }
    // d = 64 IS the truth ranking — recall exactly 1.0 by construction
    assert(rows.last._4 == 1.0, rows.last.toString)
  }

  test("quality_agreement: the kappa identities hold and both raters vary") {
    val r = graft.queries.Quality.agreement.run(spark, TestSpark.sf)
      .collect().head
    val n = r.getLong(0)
    val (a, b, c, d) = (r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4))
    val (po, pe, kappa) = (r.getDouble(5), r.getDouble(6), r.getDouble(7))
    assert(a + b + c + d == n, r.toString)
    // both raters must vary on the corpus — a constant rater makes
    // kappa 0 by definition and the comparison uninformative (the
    // reason the Gopher screen was not chosen as the second rater)
    assert(a + b > 0 && c + d > 0, s"NB rater constant: $r")
    assert(a + c > 0 && b + d > 0, s"heuristic rater constant: $r")
    val e = (a + b).toDouble * (a + c) + (c + d).toDouble * (b + d)
    assert(math.abs(po - (a + d).toDouble / n) < 1e-5, r.toString)
    assert(math.abs(pe - e / n / n) < 1e-5, r.toString)
    // kappa = (po - pe)/(1 - pe) to grid precision
    assert(math.abs(kappa - (po - pe) / (1 - pe)) < 1e-4, r.toString)
    assert(kappa >= -1.0 && kappa <= 1.0, r.toString)
  }

  test("text_good_turing: coverage identities hold") {
    val r = graft.queries.Text.goodTuring.run(spark, TestSpark.sf)
      .collect().head
    val (n, v, n1, n2) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))
    val (p0, cov, chao1) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
    assert(n > 0 && v > 0 && v <= n && n1 <= v && n2 <= v)
    assert(math.abs(p0 - n1.toDouble / n) < 1e-5, r.toString)
    assert(math.abs(p0 + cov - 1.0) < 1e-5, r.toString)
    // Chao1 never estimates fewer species than observed
    assert(chao1 >= v.toDouble, r.toString)
    assert(math.abs(chao1
      - (v + n1.toDouble * (n1 - 1) / (2.0 * (n2 + 1)))) < 1e-4,
      r.toString)
  }

  test("tokenizer_eval: shared word domain agrees, fertility >= 1") {
    val rows = graft.queries.Text.tokenizerEval.run(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows.keySet ==
      Set("bpe", "byte_bpe", "wordpiece", "unigram"))
    // bpe/wordpiece/unigram tokenize the SAME [a-z0-9]+ word stream —
    // their word totals must agree exactly (byte_bpe's space-attached
    // pre-token domain is its own, disclosed)
    assert(rows("bpe")._1 == rows("wordpiece")._1, rows.toString)
    assert(rows("bpe")._1 == rows("unigram")._1, rows.toString)
    // a word is at least one piece under every scheme
    rows.foreach { case (k, (w, p, f)) =>
      assert(p >= w, s"$k: pieces $p < words $w")
      assert(f >= 1.0, s"$k: fertility $f")
    }
  }

  test("count-min estimates are one-sided and tight on heavy hitters") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.Text.freqSketch.run(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    // the query's own CMS-bound flag (what the oracle hash-checks)
    rows.foreach(r => assert(r.getBoolean(2), s"CMS bound violated: $r"))
    // tightness, beyond the eps·N guarantee: rebuild the same
    // fixed-seed sketch and compare estimates to the exact counts
    val tok = graft.sources.Tables.documents(spark, TestSpark.sf)
      .select(explode(expr("graft_tokens(text)")).as("t"))
    val cms = tok.stat.countMinSketch(col("t"), eps = 0.0001,
      confidence = 0.99, seed = 42)
    rows.foreach { r =>
      val exact = r.getLong(1)
      val est = cms.estimateCount(r.getString(0))
      assert(est >= exact, "CMS never underestimates")
      assert(est <= (exact * 1.05).toLong + 100, s"CMS overshoot: $est vs $exact")
    }
  }

  test("approx quantiles land within 2% relative error of exact") {
    import org.apache.spark.sql.functions._
    // the query's own envelope flag (what the oracle hash-checks)
    graft.queries.Core.qApproxQuantiles.run(spark, TestSpark.sf)
      .collect().foreach(r =>
        assert(r.getBoolean(r.fieldIndex("approx_ok")), s"envelope: $r"))
    // tightness beyond the envelope: rebuild the sketch estimate and
    // compare to the exact median
    val exact = graft.queries.Core.qPercentiles.run(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap // p50
    val approx = graft.sources.Tables.lineitem(spark, TestSpark.sf)
      .groupBy(col("l_returnflag"))
      .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
        .as("q50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (flag, p50) =>
      val est = approx(flag)
      assert(math.abs(est - p50) / p50 < 0.02,
        s"$flag: approx p50 $est vs exact $p50")
    }
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("text_perplexity: zero-bigram docs take the LEFT-JOIN null path; " +
      "scores match a hand-computed add-one bigram model") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ppl").toString
    Seq(
      (1L, "", "en", "s", 0L),        // zero tokens
      (2L, "hello", "en", "s", 5L),   // one token -> zero bigrams
      (3L, "a b a b", "en", "s", 7L),
      (4L, "a b c", "en", "s", 5L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val out = graft.queries.Text.perplexity.run(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    Seq(1L, 2L).foreach { id =>
      assert(out(id).getLong(1) == 0L, s"doc $id n_bigrams")
      assert(out(id).isNullAt(2) && out(id).isNullAt(3),
        s"doc $id must have null avg_nll/ppl")
    }
    // corpus model: vocab v=4 {hello,a,b,c}; c2(a,b)=3 c2(b,a)=1
    // c2(b,c)=1; c1(a)=3 c1(b)=2; add-one: p(a,b)=4/7 p(b,·)=2/6
    def r4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000
    val nll3 = -(2 * math.log(4.0 / 7) + math.log(2.0 / 6)) // a b, b a, a b
    val nll4 = -(math.log(4.0 / 7) + math.log(2.0 / 6))     // a b, b c
    assert(out(3L).getLong(1) == 3L && out(4L).getLong(1) == 2L)
    assert(out(3L).getDouble(2) == r4(nll3 / 3), "doc 3 avg_nll")
    assert(out(3L).getDouble(3) == r4(math.exp(nll3 / 3)), "doc 3 ppl")
    assert(out(4L).getDouble(2) == r4(nll4 / 2), "doc 4 avg_nll")
    assert(out(4L).getDouble(3) == r4(math.exp(nll4 / 2)), "doc 4 ppl")
  }
}
