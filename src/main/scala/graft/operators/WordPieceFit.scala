package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed WordPiece tokenizer fit + greedy apply — the
  * likelihood-scored member of the tokenizer family (Schuster &
  * Nakajima 2012; the BERT vocabulary builder), completing the trio
  * next to tokenizer_bpe_fit (count-argmax merges) and
  * tokenizer_unigram_fit (EM-pruned pieces).
  *
  * FIT is BpeFit's decomposition verbatim (one corpus pass for the
  * capped word-frequency head, then an in-process merge loop over
  * MB-scale state — the corpus is never re-read), with ONE change:
  * the merge argmax maximizes the likelihood gain score
  * `cnt(l,r) / (cnt(l)·cnt(r))` instead of the raw pair count —
  * WordPiece merges the pair whose fusion most increases corpus
  * likelihood under a unigram-over-symbols model, which prefers
  * pairs that co-occur EXCLUSIVELY over pairs that are merely
  * frequent. Symbol counts are recomputed each step from the current
  * segmentations (freq-weighted occurrence counts).
  *
  * Determinism discipline (the hash-gate contract): counts are exact
  * int64; the score is ONE IEEE division of two exactly-representable
  * int64 values (`cnt.toDouble / (cntL*cntR).toDouble`), which both
  * Spark and DuckDB round identically (correctly-rounded division of
  * identical doubles); argmax ties break (score desc, left asc,
  * right asc) in binary string order; merge application is the
  * left-to-right non-overlapping scan that coincides with a plain
  * `replace` over BpeFit's `||`-delimited symbol strings.
  *
  * APPLY is greedy longest-match-first (BERT's MaxMatch): over
  * `word + "</w>"`, at each position consume the longest vocabulary
  * piece. The vocabulary is the fixed [a-z0-9] alphabet + `</w>` +
  * the fitted merges, so every position matches (pieces are always
  * alnum-runs optionally ending in the whole `</w>`, so greedy
  * consumption can never strand mid-marker) and the per-word scan is
  * O(len · maxPieceLen). No Catalyst expression form (a per-word
  * scan loop — the Chunker rule), so apply runs once per DISTINCT
  * word in a mapPartitions with the bounded vocab broadcast, and the
  * oracle replays the greedy scan as a recursive CTE whose
  * longest-match step is an anti-join on "a longer piece also
  * matches here".
  */
object WordPieceFit {

  /** One fitted merge rule. */
  final case class Merge(step: Long, left: String, right: String, cnt: Long)

  /** In-process likelihood-scored merge loop over a bounded
    * (word, freq) vocabulary — exposed for property tests. */
  private[graft] def fitLocal(words: Array[(String, Long)],
      merges: Int): Seq[Merge] = {
    require(merges >= 1, s"merges=$merges must be >= 1")
    var seqs: Array[(Array[String], Long)] = words.map { case (w, f) =>
      (w.map(_.toString).toArray :+ "</w>", f)
    }
    val out = Seq.newBuilder[Merge]
    var step = 1
    var exhausted = false
    while (step <= merges && !exhausted) {
      val pairCnt = scala.collection.mutable.HashMap.empty[(String, String), Long]
      val symCnt = scala.collection.mutable.HashMap.empty[String, Long]
      seqs.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length) {
          symCnt.update(syms(i), symCnt.getOrElse(syms(i), 0L) + f)
          if (i < syms.length - 1) {
            val k = (syms(i), syms(i + 1))
            pairCnt.update(k, pairCnt.getOrElse(k, 0L) + f)
          }
          i += 1
        }
      }
      if (pairCnt.isEmpty) exhausted = true // every word fully merged
      else {
        // argmax on score = cnt/(cntL·cntR); ties (score desc, l, r).
        // Each count casts to double BEFORE the multiply (the oracle
        // does the same: scnt::DOUBLE * scnt::DOUBLE) — an int64
        // product would silently wrap at 100 TB head frequencies
        // (~1e12 each) while doubles never overflow, and both engines
        // perform the identical two roundings, so the argmax row
        // still matches bit-for-bit at any scale.
        val ((l, r), c) = pairCnt.minBy { case ((kl, kr), kc) =>
          (-(kc.toDouble / (symCnt(kl).toDouble * symCnt(kr).toDouble)),
            kl, kr)
        }
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

  /** Fit `merges` WordPiece merge rules over a caller-capped
    * (word, freq) table — BpeFit.fit's contract with the likelihood
    * argmax. Returns (step, left_sym, right_sym, merged, cnt). */
  def fit(spark: SparkSession, words: DataFrame, merges: Int): DataFrame = {
    import spark.implicits._
    val vocab = words.select(col("word"), col("freq").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    fitLocal(vocab, merges)
      .map(m => (m.step, m.left, m.right, m.left + m.right, m.cnt))
      .toDF("step", "left_sym", "right_sym", "merged", "cnt")
      .orderBy(col("step"))
  }

  /** The apply vocabulary: fixed [a-z0-9] alphabet + `</w>` + fitted
    * merge products. Fixed alphabet ⇒ greedy always terminates with
    * full coverage (TextExprs.tokens emits [a-z0-9]+ words only). */
  def vocabulary(mergedPieces: Seq[String]): Set[String] =
    (('a' to 'z') ++ ('0' to '9')).map(_.toString).toSet ++
      Set("</w>") ++ mergedPieces.toSet

  /** Greedy longest-match-first segmentation of one word: returns
    * the number of pieces consumed over `word + "</w>"`. */
  def greedyPieces(word: String, vocab: Set[String], maxLen: Int): Long = {
    val s = word + "</w>"
    var pos = 0
    var n = 0L
    while (pos < s.length) {
      var len = math.min(maxLen, s.length - pos)
      while (len > 1 && !vocab.contains(s.substring(pos, pos + len))) len -= 1
      // len==1 always matches: single [a-z0-9] chars are in the fixed
      // alphabet, and the only multi-char atom "</w>" is reachable
      // before its first char ('<' alone never begins a piece suffix
      // because pieces are alnum-runs + optional whole "</w>")
      if (len == 1 && !vocab.contains(s.substring(pos, pos + 1))) {
        // unreachable with the fixed alphabet; defend anyway
        pos = s.length
        n += 1
      } else {
        pos += len
        n += 1
      }
    }
    n
  }
}
