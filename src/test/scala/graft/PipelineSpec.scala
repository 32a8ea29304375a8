package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the round-4 pipeline operators, beyond the
  * DuckDB hash gate: packing-layout laws for seq_pack, gate
  * composition laws for corpus_clean, window laws for q_range_join,
  * and quantization error bounds for vec_quantize_int8. */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("seq_pack: every doc packed once, offsets are next-fit within the sequence") {
    val rows = graft.queries.Pipeline.seqPack.run(spark, sf).collect()
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.length.toLong == nDocs, "one output row per document")
    // within each (shard, seq), docs in doc_id order sit back-to-back
    // and the sequence never exceeds the 512 budget unless it holds a
    // single oversized doc
    rows.groupBy(r => (r.getLong(1), r.getLong(2))).foreach {
      case ((shard, seq), ds) =>
        val sorted = ds.sortBy(_.getLong(0)) // doc_id
        var expectOff = 0L
        sorted.foreach { r =>
          assert(r.getLong(3) == expectOff,
            s"shard $shard seq $seq: offset gap at doc ${r.getLong(0)}")
          expectOff += r.getLong(4) // n_tokens
        }
        assert(expectOff <= 512 || sorted.length == 1,
          s"shard $shard seq $seq overfilled with ${sorted.length} docs")
    }
  }

  test("seq_pack: a doc never moves to an earlier-starting sequence than next-fit allows") {
    // next-fit law: consecutive docs in the same shard either share a
    // sequence or the earlier sequence could not have held the doc
    val rows = graft.queries.Pipeline.seqPack.run(spark, sf).collect()
      .sortBy(_.getLong(0))
    rows.groupBy(_.getLong(1)).foreach { case (_, ds) =>
      ds.sortBy(_.getLong(0)).sliding(2).foreach {
        case Array(a, b) if a.getLong(2) != b.getLong(2) =>
          assert(a.getLong(3) + a.getLong(4) + b.getLong(4) > 512,
            s"doc ${b.getLong(0)} opened a new sequence the old one could hold")
        case _ => ()
      }
    }
  }

  test("corpus_clean: keep is exactly the conjunction of its gates") {
    val rows = graft.queries.Pipeline.corpusClean.run(spark, sf).collect()
    assert(rows.nonEmpty)
    // cols: doc_id, lang_ok, quality_ok, repetition_ok, nb_ok,
    //       not_exact_dup, near_dup_drop, keep
    rows.foreach { r =>
      val expected = r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3) &&
        r.getBoolean(4) && r.getBoolean(5) && !r.getBoolean(6)
      assert(r.getBoolean(7) == expected, s"doc ${r.getLong(0)} keep flag")
    }
    // the learned gate must actually gate: both NB outcomes present
    assert(rows.exists(_.getBoolean(4)) && rows.exists(!_.getBoolean(4)),
      "nb_ok is constant — the NB stage is not discriminating")
  }

  test("corpus_clean: near-dup drops only happen among gate survivors") {
    val rows = graft.queries.Pipeline.corpusClean.run(spark, sf).collect()
    rows.filter(_.getBoolean(6)).foreach { r =>
      assert(r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3)
        && r.getBoolean(4) && r.getBoolean(5),
        s"doc ${r.getLong(0)} marked near-dup but failed a cheaper gate")
    }
  }

  test("corpus_shuffle: a true permutation in fixed shards, reproducible") {
    val rows = graft.queries.Pipeline.corpusShuffle.run(spark, sf).collect()
    val n = rows.length
    assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to n).toSeq,
      "ranks must be exactly 1..n — a permutation, no gaps or ties")
    rows.foreach { r =>
      assert(r.getLong(2) == (r.getLong(1) - 1) / 64, s"shard law: $r")
      assert(r.getLong(3) == (r.getLong(1) - 1) % 64, s"pos law: $r")
    }
    // deterministic: a second run reproduces the identical permutation
    val again = graft.queries.Pipeline.corpusShuffle.run(spark, sf).collect()
    assert(rows.map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      again.map(r => r.getLong(0) -> r.getLong(1)).toMap,
      "same seed must reproduce the same order")
    spark.catalog.clearCache()
  }

  test("quality_dsir: score law and feature-count conservation") {
    val rows = graft.queries.Pipeline.qualityDsir.run(spark, sf).collect()
    spark.catalog.clearCache()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3) == (r.getLong(2) > 0), s"selected law: $r")
    }
    // every token lands in exactly one bucket and is scored once
    val totalTokens = graft.sources.Tables.documents(spark, sf)
      .select(sum(size(graft.functions.TextExprs.tokens(col("text")))))
      .head().getLong(0)
    assert(rows.map(_.getLong(1)).sum == totalTokens,
      "sum of n_feats must equal the corpus token count")
  }

  test("q_range_join matches the naive range predicate") {
    val fast = graft.queries.Events.rangeJoin.run(spark, sf)
      .select("user_id", "event_a", "event_b", "gap_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val e = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
    val naive = e.as("a").join(e.as("b"),
        col("a.user_id") === col("b.user_id")
          && col("b.us") > col("a.us")
          && col("b.us") - col("a.us") <= 300000000L)
      .select(col("a.user_id"), col("a.event_id"), col("b.event_id"),
        (col("b.us") - col("a.us")).as("gap"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(fast == naive, "bucketed range join != naive range join")
    fast.foreach { case (_, _, _, gap) => assert(gap > 0 && gap <= 300000000L) }
  }

  test("vec_quantize_int8: codes bounded, reconstruction error within half a step") {
    val rows = graft.queries.Vectors.quantizeInt8.run(spark, sf).collect()
    assert(rows.nonEmpty)
    // recompute per-dim scales to bound the error
    val scales = graft.sources.Tables.embeddings(spark, sf)
      .select(posexplode(col("embedding")).as(Seq("p", "x")))
      .groupBy((col("p") + 1).cast("long").as("dim"))
      .agg(max(abs(col("x").cast("double"))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val (dim, q, err) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(math.abs(q) <= 127, s"code $q out of int8 range")
      val halfStep = scales(dim) / 254.0
      assert(err <= halfStep + 1e-6, s"dim $dim err $err > half-step $halfStep")
    }
  }

  test("quality_nb model: llr micro-nats match the hand-computed Laplace NB") {
    import spark.implicits._
    // class 1 tokens {a,a,b}, class 0 tokens {b,c}: sh=3 sl=2 v=3
    //   llr(a) = ln(3/6) - ln(1/5) = ln(2.5)          -> 916291
    //   llr(b) = ln(2/6) - ln(2/5) = ln(5/6)          -> -182322
    //   llr(c) = ln(1/6) - ln(2/5) = ln(5/12)         -> -875469
    val labeled = Seq(
      (1L, Seq("a", "a", "b"), 1L),
      (2L, Seq("b", "c"), 0L)).toDF("doc_id", "tk", "label")
    val m = graft.queries.Pipeline.nbModel(labeled).orderBy(col("token"))
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(m == Seq(("a", 2L, 0L, 916291L), ("b", 1L, 1L, -182322L),
      ("c", 0L, 1L, -875469L)))
    spark.catalog.clearCache()
  }

  test("quality_nb_apply: score law, pred/agree consistency, beats the class prior") {
    val rows = graft.queries.Pipeline.qualityNbApply.run(spark, sf).collect()
    spark.catalog.clearCache()
    // scoring reads the MAINTAINED model state (buildOnce lifecycle),
    // not a per-query refit
    // derive the sidecar path from the production helper so a
    // sanitization or sf-dir change cannot silently break this
    val idx = new java.io.File(graft.queries.Pipeline.nbModelOf(spark, sf))
    assert(new java.io.File(idx, "model").isDirectory
      && new java.io.File(idx, "priors").isDirectory
      && new java.io.File(idx, "_GRAFT_INDEX_COMPLETE").isFile,
      "persisted NB model sidecar missing")
    rows.foreach { r =>
      val (label, score, pred, agree) =
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getBoolean(5))
      assert(pred == (if (score > 0) 1L else 0L), s"pred/score mismatch: $r")
      assert(agree == (pred == label), s"agree flag wrong: $r")
    }
    // training-set fit: the learned scorer must beat the constant
    // majority-class classifier (sf0.001 measured: 317/500 agree vs
    // 301/500 majority). The margin is thin BY CONSTRUCTION: the
    // synthetic corpus draws every doc from one token distribution,
    // so bag-of-words carries little beyond doc length — the operator
    // is graded on dataflow shape, and this asserts it still learns.
    val agree = rows.count(_.getBoolean(5))
    val hi = rows.count(_.getLong(1) == 1L)
    val majority = math.max(hi, rows.length - hi)
    assert(agree > majority,
      s"NB agreement $agree <= majority-class baseline $majority")
  }
}
