package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.Tokenize
import graft.operators.Chunker

/** Property-based checks for the pure-JVM kernels that back the hot
  * paths (no SparkSession — these run on arbitrary generated inputs,
  * where the example-based specs pin concrete cases):
  *
  * - Tokenize.split ≡ the regex contract it replaces, on arbitrary
  *   unicode strings (the DuckDB oracles keep the regex form, so any
  *   divergence is a correctness bug, not a perf one);
  * - Tokenize.count ≡ Tokenize.split(_).length (the optimizer rule
  *   TokenCountRewrite substitutes one for the other);
  * - Chunker.split covers the input losslessly (rebuilding from the
  *   chunks minus the carried overlap reproduces the text) and never
  *   exceeds chunkSize + overlap;
  * - PqIndex.fit returns codebooks of the promised shape with the
  *   sample-capped uniform size adcScore relies on.
  */
object KernelProps extends Properties("kernels") {

  private val anyText: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.alphaNumChar,
    2 -> Gen.oneOf(' ', ' ', '\n', '\t'),
    1 -> Gen.oneOf('.', ',', '!', '-', '_', '@'),
    1 -> Gen.oneOf('é', 'ü', 'Δ', '中', 'K') // incl. Kelvin sign
  )).map(_.mkString)

  private def regexTokens(s: String): List[String] = {
    val m = java.util.regex.Pattern.compile("[a-z0-9]+")
      .matcher(s.toLowerCase(java.util.Locale.ROOT))
    val out = List.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  // AsciiTokens' documented contract: identical to the regex form
  // unless a char's lowercase maps INTO ascii (Kelvin sign → k); the
  // reference regex here mirrors that by lowercasing the same way the
  // SQL form does — so restrict the comparison to inputs where Java's
  // toLowerCase does not create new ascii alnum runs, exactly the
  // corpus guard Verify.scala enforces.
  private def lowercaseSafe(s: String): Boolean =
    s.forall { c =>
      val lower = c.toLower
      !(c > 127 && (lower.isDigit || (lower >= 'a' && lower <= 'z')))
    }

  property("tokenize matches the regex contract") =
    Prop.forAll(anyText) { s =>
      !lowercaseSafe(s) || {
        val fast = Tokenize.split(
          org.apache.spark.unsafe.types.UTF8String.fromString(s))
          .array.toList.map(_.toString)
        fast == regexTokens(s)
      }
    }

  // multilingual soup: Latin accents, sharp s, dotted İ, Kelvin sign,
  // Cyrillic, Greek (incl. final sigma pairs), CJK, Arabic,
  // Devanagari, No/Nl numbers (², ½, Ⅷ), a supplementary-plane
  // letter (𝔘), an emoji (So — separator), and a combining mark
  private val unicodeText: Gen[String] = Gen.listOf(Gen.frequency(
    5 -> Gen.alphaNumChar.map(_.toString),
    2 -> Gen.oneOf(" ", "\n", ".", ",", "-"),
    3 -> Gen.oneOf("á", "É", "ß", "İ", "K", "Ж", "щ", "Σ", "ς", "中",
      "文", "ك", "क"),
    1 -> Gen.oneOf("²", "½", "Ⅷ", "𝔘", "😀",
      "́")
  )).map(_.mkString)

  private def unicodeRegexTokens(s: String): List[String] = {
    // the exact SQL twin: lower() under UTF8_BINARY is
    // UTF8String.toLowerCase, then java-regex \p{L}\p{N} runs
    val lowered = org.apache.spark.unsafe.types.UTF8String
      .fromString(s).toLowerCase.toString
    val m = java.util.regex.Pattern.compile("[\\p{L}\\p{N}]+")
      .matcher(lowered)
    val out = List.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  // Utf8 tokenizer parity law: splitUnicode claims bit-equality with
  // regexp_extract_all(lower(text), '[\p{L}\p{N}]+') with NO corpus
  // restriction — unlike the ASCII fast path, every generated string
  // must agree, including the chars that break the ASCII contract
  // (Kelvin sign, dotted İ, combining marks, supplementary planes).
  property("unicode tokenize matches the \\p{L}\\p{N} regex contract") =
    Prop.forAll(unicodeText) { s =>
      Tokenize.splitUnicode(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
        .array.toList.map(_.toString) == unicodeRegexTokens(s)
    }

  property("token count equals token array length") =
    Prop.forAll(anyText) { s =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
      Tokenize.count(u) == Tokenize.split(u).numElements()
    }

  private val chunkCase: Gen[(String, Int, Int)] = for {
    text <- anyText
    size <- Gen.choose(4, 60)
    over <- Gen.choose(0, size - 1)
  } yield (text, size, over)

  property("chunker is lossless and bounded") =
    Prop.forAll(chunkCase) { case (text, size, over) =>
      val chunks = Chunker.split(text, size, over)
      // bound: a merged chunk is at most the carried overlap plus one
      // piece-run that fits chunkSize
      val bounded = chunks.forall(_.length <= size + over)
      // lossless: drop each chunk's carried prefix (the previous
      // chunk's overlap tail) and concatenate
      val rebuilt = chunks.zipWithIndex.map { case (c, i) =>
        if (i == 0) c
        else c.drop(math.min(over, chunks(i - 1).length))
      }.mkString
      bounded && rebuilt == text
    }

  // TopKAgg backs q_topk_per_key and knn_pq's ADC shortlist: whatever
  // the partition split and arrival order, update+merge must equal
  // the reference sort-take under the total order (score desc by
  // Double.compare, id asc), with NaN scores dropped.
  property("topk aggregate == sort-take under any partitioning") = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val entry: Gen[(Double, Long)] = for {
      s <- Gen.frequency(
        8 -> Gen.choose(-10.0, 10.0),
        1 -> Gen.oneOf(0.0, -0.0, Double.NaN,
          Double.PositiveInfinity, Double.NegativeInfinity),
        // duplicate scores exercise the id tiebreak
        2 -> Gen.oneOf(1.0, 2.0))
      i <- Gen.choose(0L, 30L)
    } yield (s, i)
    Prop.forAll(
      Gen.listOf(entry), Gen.choose(1, 8), Gen.choose(1, 5)) { (xs, k, parts) =>
      val agg = graft.functions.TopKAgg(
        BoundReference(0, DoubleType, nullable = false),
        BoundReference(1, LongType, nullable = false), k)
      // distinct ids (the aggregate's contract: id is a row identity)
      val rows = xs.distinctBy(_._2)
      val partials = rows.grouped(math.max(1, rows.length / parts))
        .map { slice =>
          slice.foldLeft(agg.createAggregationBuffer()) { (b, e) =>
            agg.update(b, InternalRow(e._1, e._2))
          }
        }
      val merged = partials.foldLeft(agg.createAggregationBuffer())(agg.merge)
      val want = rows.filterNot(e => java.lang.Double.isNaN(e._1))
        // the aggregate normalizes -0.0 to +0.0 on entry (SQL ORDER BY
        // treats the zeros equal and tie-breaks by id) — the model must
        // rank AND emit the normalized score
        .map(e => (e._1 + 0.0, e._2))
        .sortWith { (a, b) =>
          val c = java.lang.Double.compare(a._1, b._1)
          c > 0 || (c == 0 && a._2 < b._2)
        }
        .take(k)
      merged.toList == want
    }
  }

  property("rolling window hashes equal the direct per-window fold") =
    Prop.forAll(
      Gen.choose(1, 8),
      Gen.oneOf(40, 60), // text_fingerprint's width and the substring family's
      Gen.listOf(Gen.choose(0L, (1L << 60) - 1))) { (w, modBits, hsList) =>
      // PolyWindowHashes' O(1) rolling recurrence must be bit-equal
      // to the O(w) left fold the HOF form / DuckDB list_reduce
      // compute — for every window, any width, any in-range inputs.
      // The reference fold runs in BigInt: at 60-bit inputs the
      // direct a*B+h overflows a Long, which is exactly the wrap the
      // rolling mask has to be immune to
      val hs = hsList.map(_ & ((1L << modBits) - 1)).toArray
      val B = BigInt(graft.functions.PolyWindowHashes.Base)
      val M = BigInt(1) << modBits
      val direct = (0 to hs.length - w).map { i =>
        hs.slice(i, i + w)
          .foldLeft(BigInt(0))((a, h) => (a * B + h) % M).toLong
      }
      val rolled = graft.functions.PolyWindowHashes.roll(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(hs),
        w, modBits)
      rolled.toSeq == direct
    }

  property("pq codebooks have the promised uniform shape") =
    Prop.forAll(
      // n >= k: fit REJECTS a sample smaller than the codebook size
      // since round 7 (VectorSpec pins the reject); the uniform
      // fitted size adcScore's stride relies on is therefore k itself
      Gen.choose(8, 40),
      Gen.choose(1, 4)) { (n, mPow) =>
      val m = 1 << mPow // 2, 4, 8, 16 subspaces of dim 16/m
      val d = 16
      val rnd = new scala.util.Random(n.toLong * 31 + m)
      val sample = Array.fill(n)(Array.fill(d)(rnd.nextDouble()))
      val k = 8
      val books = graft.operators.PqIndex.fit(sample, m, k)
      books.length == m &&
        books.forall(_.length == k) &&
        books.forall(_.forall(_.length == d / m)) &&
        books.forall(_.forall(_.forall(x => !x.isNaN && !x.isInfinite)))
    }
  property("CUSUM prefix decomposition equals the direct recursion") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.choose(-3.0, 3.0))) { zs =>
      // the batch query computes S_t = C_t - min(0, min_{j<=t} C_j)
      // with C the running sum of (z - k); Page's statistic is the
      // recursion S_t = max(0, S_{t-1} + z_t - k), S_0 = 0 — the two
      // must agree on ANY series (floats are exact here: identical
      // adds in identical order on both sides of the identity)
      val k = 0.5
      val viaPrefix = zs.scanLeft(0.0)(_ + _ - k).tail
        .scanLeft((0.0, 0.0)) { case ((mn, _), c) =>
          (math.min(mn, c), c - math.min(mn, c))
        }.tail.map(_._2)
      val viaRecursion = zs.scanLeft(0.0)((s, z) =>
        math.max(0.0, s + z - k)).tail
      // identical up to float associativity of the shared running sum
      viaPrefix.zip(viaRecursion).forall { case (a, b) =>
        math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b))
      }
    }
}
