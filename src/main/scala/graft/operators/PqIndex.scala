package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Product-quantization codec for embedding columns.
  *
  * The compression half of vector search at 100 TB: each dim-D vector
  * is cut into M subspaces of D/M dims; each subspace gets its own
  * K-centroid codebook (fit like the IVF coarse quantizer: Lloyd's on
  * a bounded driver-side sample — a codebook needs O(M·K·D) info, not
  * the corpus); a vector is stored as M small codes (here 8 bytes
  * total vs 256 for float32 — 32x). Search runs ADC (asymmetric
  * distance computation): per query, ONE M×K table of exact
  * subspace dot products, then every candidate's approximate dot is M
  * table lookups on its codes — no float math per candidate. Encode,
  * table build, and scoring are all column expressions inside
  * WholeStageCodegen; nothing touches the driver but the codebooks.
  *
  * The scale pipeline pairs it with IVF: coarse-quantize to prune the
  * corpus, PQ-score the surviving partitions, exact re-rank the
  * shortlist (knn_pq registers the PQ-score + re-rank half; recall
  * vs brute force is gated in VectorSpec).
  *
  * Parameter scaling (sf0.1 values are NOT 100 TB values):
  *
  * | parameter | here | scaling rule                                  |
  * |-----------|------|-----------------------------------------------|
  * | m subspcs | 8    | compression knob, scales with DIM not n:      |
  * |           |      | stored size is m codes/vector, ADC cost is m  |
  * |           |      | lookups/candidate; dim % m must be 0          |
  * | k/codebook| 16   | quantization-error knob, independent of n     |
  * |           |      | (each codebook sees D/M-dim marginals, not    |
  * |           |      | the corpus); 256 = classic byte-code PQ. Must |
  * |           |      | be ≤ sample size (enforced below)             |
  * | shortlist | 100  | ≥ ~20·topK so ADC error rarely evicts a true  |
  * |           |      | neighbor; independent of n                    |
  *
  * Representation bound (the IvfIndex.LiteralCentroidMax argument):
  * encode/dtab/adcScore inline the m·k·(dim/m) codebook values as
  * plan literals — 1 024 nodes at the 8×16 defaults, ~16 k at
  * classic byte-code PQ (8×256), still tractable; the combination to
  * avoid is large m AND k=256 (m=64 → ~130 k literal nodes), where
  * encoding should switch to a broadcast-joined codebook frame with
  * a per-subspace struct-min — the exact pattern IvfIndex.assignJoin
  * implements for centroids. Unlike IVF's k~√n, BOTH PQ knobs are
  * corpus-size-independent, so the literal form is a design choice
  * per deployment, not a scale cliff.
  */
object PqIndex {

  /** Batch-build the PQ lake layout — the same build/append/persist
    * lifecycle IvfIndex gives the coarse index, applied to the
    * compressed corpus itself. Layout under `indexDir`:
    *   codebooks/ (j, c, ctr array<double>) — M·K rows, the frozen model
    *   codes/     (vec_id, codes array<int>) — the compressed corpus
    * `emb` must carry (vec_id, vn) with vn unit-normalized (ADC
    * approximates cosine only on unit vectors — the knn_pq contract).
    * Codebooks are fit on a bounded hash-ordered sample (the IvfIndex
    * determinism/bias argument), the corpus is touched exactly once by
    * the distributed encode scan, and both halves land as lake tables:
    * at 100 TB the codes table IS the serving representation (32x
    * smaller than float32), so it must live on disk, not be re-derived
    * per query. Returns the fitted codebooks. */
  def build(spark: SparkSession, emb: DataFrame, indexDir: String,
      m: Int, k: Int): Array[Array[Array[Double]]] = {
    val books = fit(IvfIndex.fitSample(emb, "vn"), m, k)
    persistBooks(spark, books, s"$indexDir/codebooks")
    encoded(books, emb).write.mode(SaveMode.Overwrite)
      .parquet(s"$indexDir/codes")
    books
  }

  /** The (j, c, ctr) codebook lake format loadBooks reads — one
    * definition shared by PqIndex.build and IvfPq.build. */
  private[operators] def persistBooks(spark: SparkSession,
      books: Array[Array[Array[Double]]], path: String): Unit = {
    import spark.implicits._
    (for { j <- books.indices; c <- books(j).indices }
      yield (j, c, books(j)(c).toSeq))
      .toDF("j", "c", "ctr").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Incremental append: encode a NEW batch against the FROZEN
    * codebooks and add it to the codes table. Codebooks are
    * deliberately not refit (the IvfIndex.append argument: append
    * stays cheap, monotone, and query-compatible with everything
    * already encoded; refit is an offline decision when quantization
    * error drifts). Encoding is deterministic given the codebooks, so
    * build-half-then-append-half is bit-equal to one full encode —
    * VectorSpec pins that. */
  def append(spark: SparkSession, newEmb: DataFrame,
      indexDir: String): Unit =
    encoded(loadBooks(spark, indexDir), newEmb)
      .write.mode(SaveMode.Append).parquet(s"$indexDir/codes")

  /** Offline refit — run when quantization error drifts. Unlike
    * IvfIndex.refit this CANNOT be self-contained: the codes table is
    * lossy, so refitting the codebooks and re-encoding need the raw
    * vectors the compression discarded. Refit is therefore a full
    * re-derivation over the SOURCE corpus (`emb`, the build input
    * shape) — the honest cost of PQ refit at scale, priced exactly
    * like build: one sample fit + one encode scan. Published via the
    * IndexLifecycle aside-and-rename swap; bit-equal to a fresh build
    * over the same corpus (seeded fit, hash-ordered sample). */
  def refit(spark: SparkSession, emb: DataFrame, indexDir: String,
      m: Int, k: Int): Unit =
    IndexLifecycle.republish(indexDir) { tmp =>
      build(spark, emb, tmp, m, k); ()
    }

  private def encoded(books: Array[Array[Array[Double]]],
      emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), encode(col("vn"), books).as("codes"))

  /** The frozen codebooks, (j, c)-ordered back into the fit shape. */
  def loadBooks(spark: SparkSession,
      indexDir: String): Array[Array[Array[Double]]] = {
    val rows = spark.read.parquet(s"$indexDir/codebooks").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    Array.tabulate(rows.map(_._1).max + 1)(j =>
      rows.filter(_._1 == j).sortBy(_._2).map(_._3))
  }

  /** The maintained codes table (vec_id, codes). */
  def codes(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(s"$indexDir/codes")

  /** Per-subspace codebooks: M arrays of K centroids of D/M dims.
    * Sample is collected hash-ordered by the CALLER (same
    * determinism/bias argument as IvfIndex.build). */
  def fit(sample: Array[Array[Double]], m: Int, k: Int,
      seed: Long = 42L): Array[Array[Array[Double]]] = {
    require(sample.nonEmpty, "codebook sample is empty")
    require(k >= 1, s"PQ codebook size k=$k must be >= 1")
    require(sample.length >= k,
      s"PQ k=$k exceeds the ${sample.length}-row codebook sample — " +
        "shrink k or grow the sample")
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    Array.tabulate(m) { j =>
      val slice = sample.map(v => v.slice(j * sub, (j + 1) * sub))
      // distinct seed per subspace: identical inits would correlate
      // codebooks on correlated subspaces
      IvfIndex.lloyd(slice, k, seed + j, iters = 10)
    }
  }

  private def sub(v: Column, j: Int, width: Int): Column =
    slice(v, j * width + 1, width)

  private def dist2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  private def dotLit(a: Column, ctr: Array[Double]): Column =
    graft.functions.VectorExprs.dot(a,
      array(ctr.toIndexedSeq.map(lit(_)): _*))

  /** codes column: array<int> of length M, code j = argmin_c
    * ||v_sub_j − codebook(j)(c)||². Pure expressions — the encode pass
    * is a scan, exactly how a 100 TB corpus would be compressed. */
  def encode(v: Column, books: Array[Array[Array[Double]]]): Column = {
    val width = books(0)(0).length
    array(books.indices.map { j =>
      val cands = array(books(j).zipWithIndex.toIndexedSeq.map { case (ctr, c) =>
        struct(dist2(sub(v, j, width),
          array(ctr.toIndexedSeq.map(lit(_)): _*)).as("d"),
          lit(c).as("c"))
      }: _*)
      array_min(cands)("c")
    }: _*)
  }

  /** ADC lookup table for a query vector column: array<double> of
    * length M·K, entry [j·K + c] = dot(q_sub_j, codebook(j)(c)). Built
    * once per query row; every candidate afterwards costs M lookups. */
  def dtab(vq: Column, books: Array[Array[Array[Double]]]): Column = {
    val width = books(0)(0).length
    array(books.indices.flatMap { j =>
      books(j).toIndexedSeq.map(ctr => dotLit(sub(vq, j, width), ctr))
    }: _*)
  }

  /** Approximate dot(q, x) from the query's table and x's codes:
    * Σ_j dtab[j·K + codes[j]]. The stride is the FITTED codebook size
    * (lloyd caps k at the sample size — all subspaces share one
    * sample, so the cap is uniform), not the requested k: indexing by
    * a larger requested k would read past dtab's end whenever the
    * training sample was smaller than k. */
  def adcScore(dt: Column, codes: Column,
      books: Array[Array[Array[Double]]]): Column = {
    val k = books(0).length
    books.indices.map(j =>
      element_at(dt, element_at(codes, j + 1) + j * k + 1))
      .reduce(_ + _)
  }
}
