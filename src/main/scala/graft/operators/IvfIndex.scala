package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorExprs.dot

/** Persistable IVF (inverted-file) vector index.
  *
  * The north-star split for vector search at scale — BATCH index
  * construction, not online ANN serving: Spark *batch-builds* the
  * index — k-means coarse quantizer + vectors partitioned on disk by
  * cluster id — and any query path (Spark batch here; an online
  * server in production) loads centroids (tiny, broadcast) and scans
  * only the probed partitions. The quantizer fit itself moved from an
  * MLlib KMeans run to an in-process Lloyd's loop on a sample (see
  * build below) — same estimator, same batch pipeline shape, a
  * fraction of the cost; everything distributed (assignment, layout,
  * probe) is unchanged.
  * The reference's DocArrayInMemorySearch (conversadocs/bones.py:74)
  * is the k=everything, nprobe=everything degenerate case of this.
  *
  * Parameter scaling (sf0.1 values are NOT 100 TB values):
  *
  * | parameter   | here | scaling rule                                |
  * |-------------|------|---------------------------------------------|
  * | k clusters  | 16   | ~√n: probe work is O(nprobe·n/k) and probe  |
  * |             |      | SELECTION is O(k·q), so k ~ √n balances the |
  * |             |      | two; left fixed, per-cluster partitions grow |
  * |             |      | O(n) and the probe degrades to a near-scan  |
  * | nprobe      | 4    | recall knob, independent of n: raise until  |
  * |             |      | recall target holds (cost is linear)        |
  * | sample size | 4096 | ≥ ~10·k rows for stable Lloyd's; must be    |
  * |             |      | ≥ k outright (enforced below) or centroids  |
  * |             |      | duplicate                                   |
  *
  * Representation switch: up to LiteralCentroidMax clusters the
  * k·dim centroid table rides the expression tree as plan literals
  * (a pure projection, no shuffle); past that, the expression tree
  * itself would become the bottleneck (codegen size), so assignment
  * and probe selection switch to a broadcast-joined centroid frame
  * with a struct-min / TopKAgg aggregate — same arithmetic, same
  * (d, cid) tiebreak, one narrow shuffle (VectorSpec asserts both
  * paths agree bit-for-bit). At the √n rule the crossover sits
  * around n ~ 10⁵-10⁶ vectors per index shard.
  *
  * Layout under `indexDir`:
  *   centroids/  (cid int, cv array<double>)           — one row per cluster
  *   vectors/    (vec_id, v, n2, partitioned by cid)   — partition pruning
  *                                                        does the probing
  */
object IvfIndex {

  private def dist2(v: Column, cv: Column): Column =
    aggregate(zip_with(v, cv, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Batch-build: fit the coarse quantizer, assign every vector,
    * write the lake layout. `emb` must have (vec_id, v: array<double>,
    * n2).
    *
    * The quantizer is fit on a bounded driver-side SAMPLE with an
    * in-process Lloyd's loop — the standard IVF shape at scale: a
    * coarse quantizer needs O(k·dim) information, not the corpus, so
    * a 4096-vector sample trains it in milliseconds while the full
    * corpus is only touched once, by the distributed ASSIGNMENT pass
    * below. The sample is hash-ordered (TakeOrdered by
    * xxhash64(vec_id)) — deterministic AND unbiased: an id-prefix
    * sample would skew the centroids on any corpus where vec_id
    * correlates with content (time- or topic-ordered ingest).
    * (An MLlib KMeans fit here cost several distributed passes plus
    * its one-off codegen warmup — more than the rest of the build.)
    * Quantizer quality is guarded by VectorSpec's recall-vs-brute
    * assertion (>= 0.55 on this near-random test corpus, where
    * clusters barely exist; structured corpora probe far better). */
  /** Bounded hash-ordered model-fit sample — deterministic AND
    * unbiased (an id-prefix sample would skew on any corpus where
    * vec_id correlates with content); the ONE sampling contract every
    * index fit shares (IVF, PQ, IVF-PQ). */
  private[operators] def fitSample(emb: DataFrame,
      vecCol: String): Array[Array[Double]] =
    emb.select(col("vec_id"), col(vecCol))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(4096).collect().map(_.getSeq[Double](1).toArray)

  def build(spark: SparkSession, emb: DataFrame, indexDir: String,
      k: Int, seed: Long = 42L): Unit = {
    require(k >= 1, s"IVF cluster count k=$k must be >= 1")
    val sample = fitSample(emb, "v")
    require(sample.length >= k,
      s"IVF k=$k exceeds the ${sample.length}-row quantizer sample — " +
        "fewer training vectors than requested clusters can only " +
        "produce duplicate centroids; shrink k or grow the corpus")
    val centers = lloyd(sample, k, seed, iters = 10)
    // repartition on cid first: otherwise every task writes a file
    // into every cid directory (tasks x k tiny files)
    assignTo(centers, emb).repartition(col("cid"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cid").parquet(s"$indexDir/vectors")
    val centRows = centers.zipWithIndex.map { case (cv, i) => (i, cv.toSeq) }
    import spark.implicits._
    centRows.toSeq.toDF("cid", "cv")
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/centroids")
  }

  /** Incremental append: assign a NEW batch of vectors to the
    * EXISTING quantizer and add them to the partitioned layout. The
    * quantizer is deliberately NOT refit — IVF ingest at scale runs
    * batches against frozen centroids (append is cheap, monotone, and
    * query-compatible with everything already indexed) and refits
    * offline only when drift degrades probe recall. */
  def append(spark: SparkSession, newEmb: DataFrame,
      indexDir: String): Unit =
    assignTo(loadCentroids(spark, indexDir), newEmb)
      .repartition(col("cid")).write.mode(SaveMode.Append)
      .partitionBy("cid").parquet(s"$indexDir/vectors")

  /** Offline requantization — the refit `append` defers: re-fit the
    * coarse quantizer over the FULL appended state, re-assign every
    * vector, rewrite the layout, publish via the IndexLifecycle
    * aside-and-rename swap (marker carried over — source and knobs
    * are unchanged; the refit re-derives from the index's own state).
    * Run when drift degrades probe recall: refit state is BIT-EQUAL
    * to a fresh build over the same vectors (the fit sample is
    * hash-ordered by vec_id, Lloyd's is seeded), so recall returns
    * exactly to fresh-build quality — and the rewrite's
    * repartition-by-cid folds the small files appends accumulate per
    * cell partition, the compaction half for free. */
  def refit(spark: SparkSession, indexDir: String, k: Int,
      seed: Long = 42L): Unit =
    IndexLifecycle.republish(indexDir) { tmp =>
      build(spark,
        spark.read.parquet(s"$indexDir/vectors")
          .select(col("vec_id"), col("v"), col("n2")), tmp, k, seed)
    }

  private[operators] def loadCentroids(spark: SparkSession,
      indexDir: String): Array[Array[Double]] =
    spark.read.parquet(s"$indexDir/centroids")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).map(_._2)

  /** Past this k the centroid table stops being plan literals: the
    * expression tree (k·dim literal nodes) would dominate codegen
    * compile time, so assignment/probing switch to the broadcast-join
    * plan — same arithmetic, same (d, cid) tiebreak, one narrow
    * aggregate instead of a k-wide projection. */
  private[operators] val LiteralCentroidMax = 256

  /** Nearest-centroid assignment of (vec_id, v, n2) rows against the
    * FROZEN centroids of a built index — the coarse-partition step
    * consumers outside the probe path block on (SemDeDup-style
    * semantic dedup groups candidates by this cid). Centroids load
    * once (k·dim values) and ride the plan as literals, or as a
    * broadcast past LiteralCentroidMax; the corpus never shuffles for
    * the assignment itself. */
  def assign(spark: SparkSession, indexDir: String,
      emb: DataFrame): DataFrame =
    assignTo(loadCentroids(spark, indexDir), emb)

  /** Nearest-centroid assignment of (vec_id, v, n2) rows; dispatches
    * on k (see LiteralCentroidMax). */
  private def assignTo(centers: Array[Array[Double]],
      emb: DataFrame): DataFrame =
    if (centers.length <= LiteralCentroidMax) assignLiteral(centers, emb)
    else assignJoin(centers, emb)

  /** k centroids inlined as plan literals — a pure projection, no
    * shuffle, ideal for coarse quantizers. */
  private[graft] def assignLiteral(centers: Array[Array[Double]],
      emb: DataFrame): DataFrame = {
    val centArr = centroidArray(centers)
    emb.withColumn("cid",
      array_min(transform(centArr,
        c => struct(dist2(col("v"), c("cv")).as("d"), c("cid").as("cid"))))("cid"))
  }

  /** The nprobe nearest centroids per query, exploded to one row per
    * (query, cid). Literal path: k-literal transform + array_sort.
    * Join path (k > LiteralCentroidMax): broadcast centroid frame +
    * the bounded TopKAgg on negated distance — same (d, cid) order,
    * no k-wide expression tree. */
  private[graft] def probeSelection(centers: Array[Array[Double]],
      queries: DataFrame, nprobe: Int, useJoin: Boolean): DataFrame =
    if (!useJoin) {
      val centArr = centroidArray(centers)
      queries
        .withColumn("cd", transform(centArr,
          c => struct(dist2(col("vq"), c("cv")).as("d"), c("cid").as("cid"))))
        .withColumn("cid", explode(transform(
          slice(array_sort(col("cd")), 1, nprobe), p => p("cid"))))
        .drop("cd")
    } else {
      val cdf = centroidFrame(queries.sparkSession, centers)
      val sel = queries.select(col("query_id"), col("vq"))
        .crossJoin(broadcast(cdf))
        .groupBy(col("query_id"))
        .agg(graft.functions.TopK.topkBy(-dist2(col("vq"), col("cv")),
          col("ccid").cast("long"), nprobe).as("top"))
        .select(col("query_id"), explode(col("top")("id")).as("lcid"))
        .select(col("query_id"), col("lcid").cast("int").as("cid"))
      queries.join(sel, "query_id")
    }

  /** The centroid table as a small DataFrame for the broadcast-join
    * paths. */
  private def centroidFrame(spark: SparkSession,
      centers: Array[Array[Double]]): DataFrame = {
    import spark.implicits._
    centers.zipWithIndex
      .map { case (cv, i) => (i, cv.toSeq) }.toSeq.toDF("ccid", "cv")
  }

  /** Broadcast-join assignment for large k: explode each vector
    * against the broadcast centroid frame, keep the (d, cid)-minimum
    * per vector — identical result to assignLiteral (the struct min
    * carries the same lexicographic tiebreak), but the centroid table
    * rides the broadcast, not the expression tree. The vector payload
    * (v, n2) travels INSIDE the min struct after the (d, cid)
    * tiebreak fields — cid is unique per centroid so the payload is
    * never compared — keeping this a single corpus scan with map-side
    * partial aggregation instead of scan + re-join. */
  private[graft] def assignJoin(centers: Array[Array[Double]],
      emb: DataFrame): DataFrame =
    emb.crossJoin(broadcast(centroidFrame(emb.sparkSession, centers)))
      .groupBy(col("vec_id"))
      .agg(min(struct(dist2(col("v"), col("cv")).as("d"),
        col("ccid").as("cid"), col("v").as("v"), col("n2").as("n2")))
        .as("m"))
      .select(col("vec_id"), col("m")("v").as("v"),
        col("m")("n2").as("n2"), col("m")("cid").as("cid"))

  /** In-process Lloyd's k-means over the sample: seeded random init,
    * empty clusters keep their previous center. Deterministic for a
    * fixed (sample, seed). Shared with PqIndex (per-subspace codebook
    * fit — same estimator, 8-dim inputs). */
  private[operators] def lloyd(sample: Array[Array[Double]], k: Int, seed: Long,
      iters: Int): Array[Array[Double]] = {
    require(sample.nonEmpty, "quantizer sample is empty")
    val kk = math.min(k, sample.length)
    val dim = sample(0).length
    val rnd = new scala.util.Random(seed)
    var centers = rnd.shuffle(sample.indices.toList).take(kk)
      .map(i => sample(i).clone()).toArray
    var it = 0
    while (it < iters) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Int](kk)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < kk) {
          var d = 0.0; var j = 0
          while (j < dim) { val t = v(j) - centers(c)(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        var j = 0
        while (j < dim) { sums(best)(j) += v(j); j += 1 }
        counts(best) += 1
      }
      centers = Array.tabulate(kk) { c =>
        if (counts(c) == 0) centers(c)
        else { val m = sums(c); var j = 0
          while (j < dim) { m(j) /= counts(c); j += 1 }; m }
      }
      it += 1
    }
    centers
  }

  private def centroidArray(centers: Array[Array[Double]]): Column =
    array(centers.zipWithIndex.toIndexedSeq.map { case (ctr, i) =>
      struct(lit(i).as("cid"), array(ctr.toIndexedSeq.map(lit(_)): _*).as("cv"))
    }: _*)

  /** Probe-query: for each query vector, cosine top-k over the nprobe
    * nearest clusters only. Partition pruning on cid keeps unprobed
    * index partitions unread.
    *
    * The final ranking is the bounded map-side TopKAgg, NOT a
    * per-query row_number window: the window form funnels every
    * candidate in the probed clusters (~n·nprobe/k rows per query)
    * into ONE task's sort, while the aggregate ships at most topK
    * rows per query per partition through the shuffle. Ordering is
    * identical (cos desc, neighbor_id asc tiebreak); NaN cosines
    * (zero-norm vectors) are dropped by TopKAgg — the oracle mirrors
    * that with an explicit NOT isnan filter. */
  def query(spark: SparkSession, indexDir: String, queries: DataFrame,
      topK: Int, nprobe: Int): DataFrame = {
    val centers = loadCentroids(spark, indexDir)
    val probes = probeSelection(centers, queries, nprobe,
      useJoin = centers.length > LiteralCentroidMax)
    val vectors = spark.read.parquet(s"$indexDir/vectors")
      .select(col("vec_id").as("neighbor_id"), col("v").as("vc"),
        col("n2").as("nc"), col("cid"))
    graft.functions.TopK.ranked(
      broadcast(probes).join(vectors, Seq("cid"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("cos",
          dot(col("vq"), col("vc")) / sqrt(col("nq") * col("nc"))),
      "query_id", col("cos"), col("neighbor_id"), topK,
      "neighbor_id", "cos_sim")
  }
}
