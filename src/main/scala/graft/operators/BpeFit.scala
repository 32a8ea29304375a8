package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) tokenizer fit — the missing
  * half of "token counting" in a training-data pipeline: not applying
  * a tokenizer but LEARNING one from the corpus (Sennrich et al.,
  * "Neural Machine Translation of Rare Words with Subword Units",
  * ACL 2016 — the merge-rule loop every BPE/GPT-style vocab build
  * runs).
  *
  * Decomposition for 100 TB:
  *   1. word-frequency table — the ONLY corpus-scale pass, an
  *      ordinary map-side-combined groupBy(token).count();
  *   2. vocabulary cap — top-V words by (freq desc, word asc): BPE
  *      statistics concentrate in the head, V bounds the model state
  *      independent of n;
  *   3. merge loop — in-process over the collected V-row word table,
  *      the IvfIndex-Lloyd's philosophy: a tokenizer fit needs
  *      O(V·word_len) state (MB-scale even at V=1M), not the corpus,
  *      and an in-process loop beats `merges` distributed
  *      argmax-round-trip barriers on a 1000-executor cluster. The
  *      corpus is touched exactly once, by pass 1.
  *
  * | parameter | here | scaling rule                                |
  * |-----------|------|---------------------------------------------|
  * | vocabCap  | 2000 | head-coverage knob: ~100k-1M at real corpus |
  * |           |      | scale — still MB-scale driver state; loop   |
  * |           |      | cost is O(merges·V·len), never O(n)         |
  * | merges    | 8    | vocab-size knob (32k-100k in production)    |
  *
  * Every step is deterministic — (freq desc, word asc) cap, argmax
  * tiebreak (cnt desc, left asc, right asc) in binary string order,
  * left-to-right non-overlapping merge application — so the whole fit
  * replays in SQL for the oracle (see Text.bpeFit: symbol sequences
  * as `||s1||s2||…||` delimited strings, a merge = one plain
  * `replace` of `|l||r|` with `|lr|`; the double delimiter gives
  * adjacent matches their own boundary char, making DuckDB's
  * left-to-right `replace` semantics coincide with the merge scan
  * below).
  */
object BpeFit {

  /** One fitted merge rule. */
  final case class Merge(step: Long, left: String, right: String, cnt: Long)

  /** `||c1||c2||…||</w>||` initial symbol string for a word column —
    * the delimited form the apply path chains `replace`s over. */
  def delimited(word: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(lit("||"), regexp_replace(word, "(.)", "$1||"), lit("</w>||"))

  /** `||68||C3||A9||…||` hex-pair symbol string for a word column —
    * the byte-level apply's delimited form (no end marker). */
  def delimitedBytes(word: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    concat(lit("||"),
      regexp_replace(hex(encode(word, "UTF-8")), "(..)", "$1||"))

  /** In-process merge loop over a bounded (word, freq) vocabulary —
    * exposed for property tests. Words split into single-char symbols
    * plus a `</w>` end marker. */
  private[graft] def fitLocal(words: Array[(String, Long)],
      merges: Int): Seq[Merge] =
    fitSeqs(words.map { case (w, f) =>
      (w.map(_.toString).toArray :+ "</w>", f)
    }, merges)

  /** UTF-8 bytes of a word as uppercase hex-pair symbols — the
    * byte-level fit/apply alphabet. Hex pairs are engine-portable
    * (Spark's hex(encode(..)) and DuckDB's hex(..) agree bytewise,
    * both uppercase), collision-free with the `|` delimiters, and
    * ASCII — so (left, right) tie-breaks order identically on both
    * engines even when the underlying bytes are non-ASCII. */
  private[graft] def hexPairs(w: String): Array[String] = {
    val bs = w.getBytes("UTF-8")
    val out = new Array[String](bs.length)
    var i = 0
    while (i < bs.length) {
      out(i) = f"${bs(i) & 0xff}%02X"
      i += 1
    }
    out
  }

  /** BYTE-LEVEL fit (Radford et al. 2019 — the GPT-2/tiktoken family
    * member, the tokenizer most production LLMs actually train):
    * identical decomposition and merge loop, but symbols are UTF-8
    * BYTES (a 256-symbol base alphabet) and there is NO end-of-word
    * marker — coverage is total on ANY input including non-ASCII by
    * construction, the property word-level BPE's UNK handling only
    * approximates. Caller caps the (word, freq) table as in [[fit]]. */
  def fitBytes(spark: SparkSession, words: DataFrame,
      merges: Int): DataFrame = {
    import spark.implicits._
    val vocab = words.select(col("word"), col("freq").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    fitSeqs(vocab.map { case (w, f) => (hexPairs(w), f) }, merges)
      .map(m => (m.step, m.left, m.right, m.left + m.right, m.cnt))
      .toDF("step", "left_sym", "right_sym", "merged", "cnt")
      .orderBy(col("step"))
  }

  /** The merge loop itself, over pre-built symbol sequences — shared
    * by the char-level ([[fitLocal]]) and byte-level ([[fitBytes]])
    * fits. */
  private[graft] def fitSeqs(seqs0: Array[(Array[String], Long)],
      merges: Int): Seq[Merge] = {
    require(merges >= 1, s"merges=$merges must be >= 1")
    var seqs: Array[(Array[String], Long)] = seqs0
    val out = Seq.newBuilder[Merge]
    var step = 1
    var exhausted = false
    while (step <= merges && !exhausted) {
      val cnt = scala.collection.mutable.HashMap.empty[(String, String), Long]
      seqs.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          cnt.update(k, cnt.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (cnt.isEmpty) exhausted = true // every word fully merged
      else {
        // argmax with the oracle's tiebreak: cnt desc, left asc,
        // right asc (ASCII symbols — Java string order == byte order)
        val ((l, r), c) = cnt.minBy { case ((kl, kr), kc) => (-kc, kl, kr) }
        out += Merge(step.toLong, l, r, c)
        seqs = seqs.map { case (syms, f) =>
          if (syms.length < 2) (syms, f)
          else { // left-to-right non-overlapping merge application
            val b = Array.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                b += l + r; i += 2
              } else { b += syms(i); i += 1 }
            }
            (b.result(), f)
          }
        }
        step += 1
      }
    }
    out.result()
  }

  /** Fit `merges` BPE merge rules over a (word, freq) table that the
    * CALLER has already capped (orderBy freq desc, word asc; limit
    * vocabCap) — the collect here is bounded by that cap, exactly as
    * IvfIndex.build's quantizer sample is bounded by its limit.
    * Returns (step, left_sym, right_sym, merged, cnt) in merge order
    * — the merge table IS the fitted tokenizer. */
  def fit(spark: SparkSession, words: DataFrame, merges: Int): DataFrame = {
    import spark.implicits._
    val vocab = words.select(col("word"), col("freq").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    fitLocal(vocab, merges)
      .map(m => (m.step, m.left, m.right, m.left + m.right, m.cnt))
      .toDF("step", "left_sym", "right_sym", "merged", "cnt")
      .orderBy(col("step"))
  }
}
