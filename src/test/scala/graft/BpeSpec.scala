package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BpeFit

class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  /** Reference greedy left-to-right non-overlapping merge application
    * over symbol lists — the semantics both merges=64 tests pin the
    * chained-replace apply path against (ONE copy on purpose). */
  private def applyMergesRef(word: String,
      merges: Seq[BpeFit.Merge]): Seq[String] = {
    var syms: Seq[String] = word.map(_.toString) :+ "</w>"
    merges.foreach { m =>
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == m.left &&
            syms(i + 1) == m.right) {
          out += m.left + m.right; i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.toSeq
    }
    syms
  }

  /** The production apply path: the delimited segmentation folded
    * through one codegen'd replace per merge rule. */
  private def chainApply(
      merges: Seq[BpeFit.Merge]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    merges.foldLeft(BpeFit.delimited(col("word"))) { (c, m) =>
      call_function("replace", c,
        lit("|" + m.left + "||" + m.right + "|"),
        lit("|" + m.left + m.right + "|"))
    }
  }

  test("fitLocal reproduces the Sennrich corpus merges exactly") {
    // the ACL-2016 worked example: low:5 lower:2 newest:6 widest:3.
    // Pair counts put (e,s)/(s,t)/(t,</w>) in a 9-way tie — the
    // (cnt desc, l asc, r asc) tiebreak picks (e,s), then the merged
    // symbols cascade: es+t, est+</w>, then the l,o / lo,w chain.
    val words = Array(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L))
    val merges = BpeFit.fitLocal(words, 6)
    val got = merges.map(m => (m.left, m.right, m.cnt))
    assert(got == Seq(
      ("e", "s", 9L),
      ("es", "t", 9L),
      ("est", "</w>", 9L),
      ("l", "o", 7L),
      ("lo", "w", 7L),
      ("e", "w", 6L)), got)
  }

  test("merge application is left-to-right non-overlapping") {
    // 'aaaa' with pair (a,a): left-to-right gives aa|aa, never the
    // overlapping a|aa|a — the same semantics as the oracle's
    // delimited-string replace
    val merges = BpeFit.fitLocal(Array(("aaaa", 1L)), 1)
    assert(merges.head.left == "a" && merges.head.right == "a")
    assert(merges.head.cnt == 3L) // 3 adjacent occurrences counted
    // after one (a,a) merge the word is aa aa </w> — an OVERLAPPING
    // merge would have left a aa a </w> instead. Step 2's candidates
    // are (aa,aa) and (aa,</w>) tied at 1; '<' sorts before 'a', so
    // the (cnt desc, l, r) tiebreak picks (aa,</w>) — both symbols
    // only exist if step 1 consumed non-overlapping runs
    val two = BpeFit.fitLocal(Array(("aaaa", 1L)), 2)
    assert((two(1).left, two(1).right) == ("aa", "</w>"), two)
  }

  test("max pair count is non-increasing across merge steps") {
    // a merge can only create pairs whose occurrence count is bounded
    // by the merged pair's — the argmax sequence must never rise
    val rows = graft.queries.Text.bpeFit.run(spark, sf).collect()
    assert(rows.length == 8)
    assert(rows.map(_.getLong(0)).toSeq == (1L to 8L))
    val cnts = rows.sortBy(_.getLong(0)).map(_.getLong(4))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b },
      cnts.toSeq)
    // merged symbol is the concatenation, and no symbol ever carries
    // the delimiter character the oracle's encoding reserves
    rows.foreach { r =>
      assert(r.getString(3) == r.getString(1) + r.getString(2))
      assert(!r.getString(1).contains("|") && !r.getString(2).contains("|"))
    }
  }

  test("bpe_apply covers every doc with sane segment counts") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.Text.bpeApply.run(spark, sf).collect()
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), length(col("text")).as("nc"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val (nw, nb) = (r.getLong(1), r.getLong(2))
      // every word is >= 1 symbol after merges, and merges only
      // shrink the chars+1-per-word initial segmentation
      assert(nb >= nw, r.toString)
      assert(nb <= docs(r.getLong(0)) + nw, r.toString)
      if (nw > 0) assert(r.getDouble(3) >= 1.0, r.toString)
    }
  }

  test("fit is deterministic across runs") {
    val a = graft.queries.Text.bpeFit.run(spark, sf).collect().map(_.toSeq)
    val b = graft.queries.Text.bpeFit.run(spark, sf).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("chained-replace apply at merges=64 matches a direct segmentation recompute") {
    // production merge counts run 32k-100k, far past the oracle's
    // 8-stage unrolled replay — this pins the chained-replace apply
    // path at merges=64 against a straight-line reference
    // implementation of greedy left-to-right non-overlapping merge
    // application over symbol lists
    import org.apache.spark.sql.functions._
    val words = graft.queries.Text.bpeCappedWords(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val merges = BpeFit.fitLocal(words, 64)
    assert(merges.length == 64, s"corpus exhausted at ${merges.length} merges")
    val got = graft.sources.Tables.documents(spark, sf)
      .select(explode(expr("graft_tokens(text)")).as("word")).distinct()
      .select(col("word"),
        filter(split(chainApply(merges), "\\|\\|"), x => x =!= "").as("segs"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1))
    // the synthetic corpus runs a 31-word vocabulary — every word
    // must round-trip, and the planted set below supplies the depth
    assert(got.length >= 20, s"only ${got.length} distinct words")
    got.foreach { case (w, segs) =>
      val want = applyMergesRef(w, merges)
      assert(segs == want, s"word '$w': $segs != $want")
    }
    // and at least one merged symbol actually fires on the corpus:
    // a vacuous pass (no multi-char symbols) would prove nothing
    assert(got.exists(_._2.exists(s => s.length > 1 && s != "</w>")),
      "no merged symbol appears in any segmentation")
  }

  test("merges=64 on a planted 150-word vocabulary: chain apply = reference apply") {
    // the corpus vocabulary is only 31 words; this planted set forces
    // deep multi-character merge cascades (shared prefixes/suffixes
    // over a 6-letter alphabet) so the 64-rule chain genuinely stacks
    // merged symbols onto merged symbols
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val alphabet = "abcdef"
    val words = (0 until 150).map { i =>
      val len = 4 + rnd.nextInt(7)
      val w = (0 until len).map(_ => alphabet(rnd.nextInt(6))).mkString
      (w, (i % 7 + 1).toLong)
    }.distinct
    val merges = BpeFit.fitLocal(words.toArray, 64)
    assert(merges.length == 64, s"only ${merges.length} merges fit")
    // merged symbols must reach depth: at least one rule's left or
    // right side is itself a multi-char merged symbol
    assert(merges.exists(m => m.left.length > 1 || m.right.length > 1),
      "no cascaded merge in 64 rules")
    val got = words.map(_._1).toDF("word")
      .select(col("word"),
        filter(split(chainApply(merges), "\\|\\|"), x => x =!= "").as("segs"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1))
    got.foreach { case (w, segs) =>
      val want = applyMergesRef(w, merges)
      assert(segs == want, s"word '$w': $segs != $want")
    }
  }
}
