package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed unigram-LM tokenizer fit — the OTHER production
  * subword algorithm next to [[BpeFit]] (Kudo, "Subword
  * Regularization", ACL 2018; the SentencePiece default). Where BPE
  * grows a vocabulary bottom-up by merging, the unigram model starts
  * from a large candidate set and fits piece probabilities by EM over
  * each word's segmentation lattice, then prunes to the target
  * vocabulary — the probabilistic model BPE lacks (it can score and
  * sample alternative segmentations, the property subword
  * regularization exploits).
  *
  * Decomposition for 100 TB — identical to BpeFit's:
  *   1. word-frequency table: the ONLY corpus-scale pass, one
  *      map-side-combined groupBy(token).count();
  *   2. vocabulary cap: top-V words by (freq desc, word asc) — EM
  *      statistics concentrate in the head, V bounds the model state
  *      independent of corpus size;
  *   3. EM loop: in-process over the collected V-row word table
  *      (O(V · len · maxPieceLen) per iteration — MB-scale at
  *      V = 1M), the corpus never re-read. Fixed iteration count
  *      (the production setting: SentencePiece defaults to a small
  *      constant number of EM sub-iterations per prune round).
  *
  * Determinism discipline (the BpeFit/IvfIndex rule — a fit rerun on
  * the same input must be bit-identical): candidate seeding, all
  * normalization sums, and expected-count accumulation iterate in
  * SORTED piece / word order (never HashMap order), forward-backward
  * is plain sequential double arithmetic, and ties in the final
  * vocabulary cut break on (count desc, piece asc). Log-probs are
  * quantized to integer MICRO-NATS (floor(ln p · 1e6 + 0.5)) in the
  * published model, the quality_nb discipline.
  *
  * Single-char pieces are ALWAYS retained (never pruned) so every
  * word over the fit alphabet segments; a character outside the fit
  * alphabet scores the fixed UNK penalty at apply time — standard
  * <unk> handling, deterministic on both the fit and apply sides.
  */
object UnigramFit {

  /** Fixed per-unknown-char log-prob (micro-nats): harsher than any
    * fitted piece can be, so Viterbi uses known pieces wherever they
    * cover. */
  val UnkMicro: Long = -20000000L

  /** Max candidate piece length. 4 captures the head subwords on the
    * test corpus; production fits use 8-16 — the loop costs scale
    * linearly in it, never in corpus size. */
  val MaxPieceLen: Int = 4

  /** One fitted piece: probability in micro-nats. */
  final case class Piece(piece: String, logp_micro: Long)

  /** Seed candidates: every substring (length 1..maxLen) of every
    * word, weighted by word freq × occurrences; keep the `seedCap`
    * best by (count desc, piece asc) PLUS every single char (coverage
    * guarantee). Sorted-order accumulation for determinism. */
  private[graft] def seed(words: Array[(String, Long)], maxLen: Int,
      seedCap: Int): Array[(String, Long)] = {
    val cnt = scala.collection.mutable.TreeMap.empty[String, Long]
    words.sortBy(_._1).foreach { case (w, f) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        while (l <= maxLen && i + l <= w.length) {
          val p = w.substring(i, i + l)
          cnt.update(p, cnt.getOrElse(p, 0L) + f)
          l += 1
        }
        i += 1
      }
    }
    val all = cnt.toArray
    val kept = all.sortBy { case (p, c) => (-c, p) }.take(seedCap)
    val chars = all.filter(_._1.length == 1)
    (kept ++ chars).distinct.sortBy(_._1)
  }

  /** Forward-backward over one word's segmentation lattice: returns
    * (Z, per-edge posterior visitor). α(i) = Σ paths covering
    * w[0,i); β(i) = Σ paths covering w[i,len). Plain probabilities —
    * fine at word scale (≤ exp(-20)^len underflows only past
    * ~15-char all-unk words, where the posterior is uniform anyway
    * and EM assigns it nothing useful). */
  private def forwardBackward(w: String, lp: collection.Map[String, Double],
      maxLen: Int): (Double, Array[Double], Array[Double]) = {
    val n = w.length
    val alpha = new Array[Double](n + 1)
    val beta = new Array[Double](n + 1)
    alpha(0) = 1.0
    var i = 1
    while (i <= n) {
      var l = 1
      var s = 0.0
      while (l <= maxLen && l <= i) {
        lp.get(w.substring(i - l, i)).foreach(p => s += alpha(i - l) * p)
        l += 1
      }
      alpha(i) = s
      i += 1
    }
    beta(n) = 1.0
    i = n - 1
    while (i >= 0) {
      var l = 1
      var s = 0.0
      while (l <= maxLen && i + l <= n) {
        lp.get(w.substring(i, i + l)).foreach(p => s += beta(i + l) * p)
        l += 1
      }
      beta(i) = s
      i -= 1
    }
    (alpha(n), alpha, beta)
  }

  /** In-process EM fit over a bounded (word, freq) vocabulary —
    * exposed for property tests. Returns the final piece table
    * (probabilities, NOT yet micro-quantized) sorted by piece. */
  private[graft] def fitLocal(words: Array[(String, Long)],
      vocabTarget: Int, emIters: Int = 2,
      maxLen: Int = MaxPieceLen): Array[(String, Double)] = {
    require(vocabTarget >= 1 && emIters >= 1)
    val sortedWords = words.sortBy(_._1)
    val seeded = seed(sortedWords, maxLen, seedCap = vocabTarget * 8)
    // initial probs ∝ seed counts (sorted-order sum)
    var pieces: Array[(String, Double)] = {
      val z = seeded.iterator.map(_._2.toDouble).sum
      seeded.map { case (p, c) => (p, c / z) }
    }
    var iter = 0
    while (iter < emIters) {
      val lp = pieces.toMap
      // E-step: expected piece counts, sorted word order, TreeMap
      // accumulation (deterministic iteration for the M-step sum)
      val ec = scala.collection.mutable.TreeMap.empty[String, Double]
      sortedWords.foreach { case (w, f) =>
        val (z, alpha, beta) = forwardBackward(w, lp, maxLen)
        if (z > 0.0) {
          var i = 0
          while (i < w.length) {
            var l = 1
            while (l <= maxLen && i + l <= w.length) {
              val p = w.substring(i, i + l)
              lp.get(p).foreach { pr =>
                val post = alpha(i) * pr * beta(i + l) / z
                if (post > 0.0) ec.update(p, ec.getOrElse(p, 0.0) + f * post)
              }
              l += 1
            }
            i += 1
          }
        }
      }
      // M-step: renormalize over the surviving support; pieces that
      // received no mass drop out (chars re-seeded by the final cut
      // only if they had mass — a char inside retained pieces only
      // is legitimately prunable mid-EM, coverage is restored below)
      val z = ec.valuesIterator.sum
      pieces = ec.iterator.map { case (p, c) => (p, c / z) }.toArray
      iter += 1
    }
    // final cut: top vocabTarget by (prob desc, piece asc), plus every
    // single char of the fit alphabet (coverage guarantee) at its
    // fitted prob — or, if EM starved it to zero mass, at the floor
    // just above the UNK penalty so it stays strictly preferable
    val byProb = pieces.sortBy { case (p, pr) => (-pr, p) }
    val kept = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    byProb.take(vocabTarget).foreach { case (p, pr) => kept.update(p, pr) }
    val alphabet = sortedWords.iterator.flatMap(_._1.iterator)
      .map(_.toString).toArray.distinct.sorted
    val floor = math.exp(UnkMicro / 1e6 + 1.0)
    alphabet.foreach { ch =>
      if (!kept.contains(ch))
        kept.update(ch, pieces.collectFirst {
          case (p, pr) if p == ch => pr
        }.getOrElse(floor))
    }
    kept.toArray.sortBy(_._1)
  }

  /** Fit over a (word, freq) table the CALLER has already capped
    * (the BpeFit contract — the collect is bounded by that cap).
    * Returns (piece, logp_micro) sorted by piece: the piece table IS
    * the fitted tokenizer. */
  def fit(spark: SparkSession, words: DataFrame, vocabTarget: Int,
      emIters: Int = 2): DataFrame = {
    import spark.implicits._
    val vocab = words.select(col("word"), col("freq").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    fitLocal(vocab, vocabTarget, emIters)
      .map { case (p, pr) =>
        // p_micro: the probability itself on a 1e-9 integer grid
        // (floored at 1), published NEXT TO the micro-nat log — the
        // E-step oracle needs linear-space weights and reading the
        // SAME integer from parquet on both engines removes exp()
        // (whose last-ulp differs between libm and java.lang.Math)
        // from the cross-engine contract entirely
        (p, math.floor(math.log(pr) * 1e6 + 0.5).toLong,
          math.max(1L, math.floor(pr * 1e9 + 0.5).toLong))
      }
      .toSeq.toDF("piece", "logp_micro", "p_micro")
      .orderBy(col("piece"))
  }

  /** Unknown-single-char weight on the E-step's 1e-9 probability
    * grid: round(exp(UnkMicro/1e6)·1e9) = round(2.06e-9·1e9) = 2. */
  val UnkPMicro9: Long = 2L

  /** One E-step's expected piece counts over ONE word's lattice,
    * against frozen 1e-9-grid probabilities `pm` (the published
    * p_micro column): γ(edge) = α(e−l)·p·β(e)/Z, each edge posterior
    * FLOORED onto the 1e-6 grid before any cross-row sum (the
    * ranking-grid rule: both engines compute bit-identical doubles —
    * integer inputs, fixed l=1..maxLen term order, strict IEEE — so
    * the quantization is exact-equal too, and everything downstream
    * is integer arithmetic). The DuckDB oracle replays the identical
    * recursion as two independent carried-window linear CTEs
    * (forward + backward) joined on the edge table — the
    * tokenizer_unigram_apply construction, in probability space.
    * Caller contract: words ≤ ~16 chars (the linear-space forward
    * underflows past ~35 all-unknown chars; the registered query
    * filters its capped-head domain to len ≤ 16 on both engines). */
  def estepCounts(w: String, pm: collection.Map[String, Long],
      maxLen: Int = MaxPieceLen): Seq[(String, Long)] = {
    val n = w.length
    if (n == 0) return Seq.empty
    def pOf(piece: String): Option[Double] =
      pm.get(piece) match {
        case Some(m) => Some(m / 1e9)
        case None =>
          if (piece.length == 1) Some(UnkPMicro9 / 1e9) else None
      }
    val alpha = new Array[Double](n + 1)
    alpha(0) = 1.0
    var i = 1
    while (i <= n) {
      var s = 0.0
      var l = 1
      while (l <= maxLen && l <= i) {
        pOf(w.substring(i - l, i)).foreach(p => s += p * alpha(i - l))
        l += 1
      }
      alpha(i) = s
      i += 1
    }
    val beta = new Array[Double](n + 1)
    beta(n) = 1.0
    i = n - 1
    while (i >= 0) {
      var s = 0.0
      var l = 1
      while (l <= maxLen && i + l <= n) {
        pOf(w.substring(i, i + l)).foreach(p => s += p * beta(i + l))
        l += 1
      }
      beta(i) = s
      i -= 1
    }
    val z = alpha(n)
    val acc = scala.collection.mutable.TreeMap.empty[String, Long]
    i = 1
    while (i <= n) {
      var l = 1
      while (l <= maxLen && l <= i) {
        val piece = w.substring(i - l, i)
        pOf(piece).foreach { p =>
          // identical association to the oracle's
          //   FLOOR(a0 * p * b0 / z * 1e6 + 0.5):
          // ((((α·p)·β)/Z)·1e6)+0.5, left-assoc on both engines
          val gm = math.floor(
            alpha(i - l) * p * beta(i) / z * 1e6 + 0.5).toLong
          acc.update(piece, acc.getOrElse(piece, 0L) + gm)
        }
        l += 1
      }
      i += 1
    }
    acc.toSeq
  }

  /** SUBWORD REGULARIZATION sampling (the unigram model's actual
    * training-time use — Kudo 2018 §3: each epoch samples a DIFFERENT
    * segmentation per word ∝ its tempered lattice probability, the
    * data augmentation BPE cannot express): forward-filtering
    * backward-sampling over the word lattice with piece weights
    * p^alpha. alpha → ∞ approaches Viterbi; alpha → 0 approaches
    * uniform over parses.
    *
    * The "random" draws are DETERMINISTIC md5 hashes of
    * (salt, word, step) mapped onto [0,1) — the corpus_shuffle seed
    * discipline: the same (word, salt) samples the same parse on any
    * engine at any cluster size (crash-rerun and re-shard safe), and
    * a new salt (epoch number) is a fresh independent draw. Unknown
    * single chars ride the [[UnkMicro]] penalty, as Viterbi. */
  def sampleSegmentation(w: String, lp: collection.Map[String, Long],
      alpha: Double, salt: String,
      maxLen: Int = MaxPieceLen): Seq[String] = {
    val n = w.length
    if (n == 0) return Seq.empty
    // LOG-space throughout: a linear-space forward pass underflows to
    // 0 past ~35 consecutive unknown chars (exp(-20)^35 < 2^-1074)
    // and a 0/0 lattice would never terminate; in log space every
    // backward-edge probability is exp(a ratio ≤ 0) — always finite
    def logw(piece: String): Option[Double] =
      lp.get(piece) match {
        case Some(m) => Some(alpha * m / 1e6)
        case None =>
          if (piece.length == 1) Some(alpha * UnkMicro / 1e6) else None
      }
    val fwl = new Array[Double](n + 1)
    var i = 1
    while (i <= n) {
      var l = 1
      var mx = Double.NegativeInfinity
      val terms = new Array[Double](math.min(maxLen, i))
      while (l <= maxLen && l <= i) {
        terms(l - 1) = logw(w.substring(i - l, i)) match {
          case Some(lg) => fwl(i - l) + lg
          case None => Double.NegativeInfinity
        }
        if (terms(l - 1) > mx) mx = terms(l - 1)
        l += 1
      }
      var s = 0.0
      terms.foreach(t => if (t > Double.NegativeInfinity) s += math.exp(t - mx))
      fwl(i) = mx + math.log(s) // mx finite: l=1 always has a weight
      i += 1
    }
    // backward sampling: at position i pick the incoming edge length
    // with probability exp(fwl(i-l) + logw - fwl(i)); the uniform
    // draw is the md5-prefix of (salt, word, draw index) — portable,
    // no rand()
    val lens = List.newBuilder[Int]
    var pos = n
    var step = 0
    while (pos > 0) {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$salt:$w:$step".getBytes("UTF-8"))
      val u = (((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)).toDouble / 4294967296.0
      var acc = 0.0
      var picked = -1
      var l = 1
      while (l <= maxLen && l <= pos && picked < 0) {
        logw(w.substring(pos - l, pos)).foreach { lg =>
          acc += math.exp(fwl(pos - l) + lg - fwl(pos))
          if (u < acc) picked = l
        }
        l += 1
      }
      // float-sum shortfall (acc ≈ 1-ulp < u): the single-char edge
      // is ALWAYS viable (logw is total on length 1), take the
      // longest weighted edge
      if (picked < 0) {
        var ll = math.min(maxLen, pos)
        while (picked < 0 && ll >= 1) {
          if (logw(w.substring(pos - ll, pos)).nonEmpty) picked = ll
          ll -= 1
        }
      }
      lens += picked
      pos -= picked
      step += 1
    }
    val out = List.newBuilder[String]
    var s2 = 0
    lens.result().reverse.foreach { l =>
      out += w.substring(s2, s2 + l); s2 += l
    }
    out.result()
  }

  /** Tie-break radix for [[viterbi]]'s combined DP value: each DP
    * cell holds score·TieK − pieces, so maximizing the single integer
    * maximizes score first and minimizes piece count among score
    * ties. Cross-engine contract: the ORACLE replays the identical
    * combined DP (tokenizer_unigram_apply's recursive CTE), so the
    * reported count is mod(−v, TieK) on BOTH sides — tie-invariant,
    * unlike a backtrack-order count. Words ≥ TieK chars break the
    * radix in TWO ways, both engine-identical (parity preserved):
    * the reported count wraps mod TieK, and — since a piece-count
    * difference ≥ TieK then outweighs one 1-micro-nat score step —
    * the DP can prefer a marginally LOWER-score parse with far fewer
    * pieces. Real words are orders of magnitude shorter than 1024
    * chars; a corpus where they are not should clamp or pre-split
    * tokens before segmentation. */
  val TieK: Long = 1024L

  /** Viterbi segmentation of one word against the fitted piece table
    * (micro-nat log-probs; unknown single chars score [[UnkMicro]]).
    * Deterministic tie-break in TWO layers: the combined DP value
    * score·[[TieK]]−pieces makes the PIECE COUNT unique (max score,
    * then fewest pieces — the engine-replayable invariant the oracle
    * checks); among parses equal on both, boundaries resolve to the
    * longest-final-piece parse (candidates scanned in decreasing
    * length with strict improvement), fixed on any engine.
    * Exposed for the distributed apply's mapPartitions and the spec. */
  def viterbi(w: String, lp: collection.Map[String, Long],
      maxLen: Int = MaxPieceLen): Seq[String] = {
    val n = w.length
    if (n == 0) return Seq.empty
    // best(i) = max over parses of prefix i of score·TieK − pieces
    val best = Array.fill(n + 1)(Long.MinValue)
    val back = new Array[Int](n + 1)
    best(0) = 0L
    var i = 1
    while (i <= n) {
      var l = math.min(maxLen, i)
      while (l >= 1) {
        if (best(i - l) != Long.MinValue) {
          val piece = w.substring(i - l, i)
          val sc = lp.get(piece) match {
            case Some(m) => Some(m)
            case None => if (l == 1) Some(UnkMicro) else None
          }
          sc.foreach { m =>
            if (best(i - l) + m * TieK - 1 > best(i)) {
              best(i) = best(i - l) + m * TieK - 1
              back(i) = l
            }
          }
        }
        l -= 1
      }
      i += 1
    }
    val out = List.newBuilder[String]
    var pos = n
    val rev = List.newBuilder[Int]
    while (pos > 0) { rev += back(pos); pos -= back(pos) }
    val lens = rev.result().reverse
    var s = 0
    lens.foreach { l => out += w.substring(s, s + l); s += l }
    out.result()
  }
}
