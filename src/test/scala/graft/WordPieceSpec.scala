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

  test("TokenizerIndex: frozen model round-trips; same key keeps it") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tokidx")
      .toString + "/idx"
    val words = Seq(("ab", 10L), ("ac", 5L)).toDF("word", "freq")
    graft.operators.TokenizerIndex.build(spark, words, 3, dir, "k1")
    val v1 = graft.operators.TokenizerIndex.loadVocabulary(spark, dir)
    val direct = graft.operators.WordPieceFit.vocabulary(
      graft.operators.WordPieceFit.fitLocal(
        Array("ab" -> 10L, "ac" -> 5L), 3).map(m => m.left + m.right))
    assert(v1 == direct)
    // same key: the frozen model survives a rebuild attempt with
    // DIFFERENT words — fit-once means the first fit wins
    graft.operators.TokenizerIndex.build(spark,
      Seq(("zz", 99L)).toDF("word", "freq"), 3, dir, "k1")
    assert(graft.operators.TokenizerIndex.loadVocabulary(spark, dir) == v1)
    // new key refits
    graft.operators.TokenizerIndex.build(spark,
      Seq(("zz", 99L)).toDF("word", "freq"), 3, dir, "k2")
    // (the likelihood argmax merges z+</w> first, then z+z</w>)
    assert(graft.operators.TokenizerIndex
      .loadVocabulary(spark, dir).contains("zz</w>"))
  }

  test("tokenizeIngest: micro-batched == one-shot through the " +
      "shared dataflow") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-tokingest")
      .toString
    val (idx, out) = (s"$base/idx", s"$base/out")
    val all = Seq((1L, "aa ab ab ra"), (2L, "ab ab xq"), (3L, "ra zz aa"))
    val words = all.toDF("doc_id", "text")
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.TextExprs.tokens(
          org.apache.spark.sql.functions.col("text"))).as("word"))
      .groupBy("word").count().withColumnRenamed("count", "freq")
    graft.operators.TokenizerIndex.build(spark, words, 4, idx, "spec")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = graft.streaming.StreamOps.tokenizeIngest(spark,
      ms.toDF().toDF("doc_id", "text"), idx, out)
    try {
      ms.addData(all(0), all(1)); q.processAllAvailable()
      ms.addData(all(2)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(out)
      .select("doc_id", "n_words", "n_wp", "wp_ratio")
      .collect().map(_.toSeq).toSet
    val vocab = graft.operators.TokenizerIndex.loadVocabulary(spark, idx)
    val want = graft.queries.Text.wordpieceStatsFrom(spark,
        all.toDF("doc_id", "text"), vocab)
      .collect().map(_.toSeq).toSet
    assert(got == want)
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
