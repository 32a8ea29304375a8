package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Vectors

class VectorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def topk(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.map(_.getLong(1)).toSet
      }

  private lazy val brute = topk(Vectors.knnBrute.run(spark, sf))

  private def recall(approx: Map[Long, Set[Long]]): Double = {
    val hits = brute.map { case (q, nb) =>
      approx.getOrElse(q, Set.empty).intersect(nb).size.toDouble / nb.size
    }
    hits.sum / hits.size
  }

  test("brute kNN returns exactly k=5 ranked neighbors per query") {
    val rows = Vectors.knnBrute.run(spark, sf).collect()
    assert(rows.length == 50 * 5)
    val byQ = rows.groupBy(_.getLong(0))
    byQ.values.foreach { rs =>
      val ranks = rs.map(_.getInt(1)).sorted
      assert(ranks.toSeq == (1 to 5))
      // scores non-increasing with rank
      val byRank = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("IVF recall@5 vs brute force") {
    val r = recall(topk(Vectors.knnIvf.run(spark, sf)))
    assert(r >= 0.55, s"IVF recall $r") // near-random vectors: no cluster structure
  }

  test("LSH retrieves planted near-duplicates (the banding regime)") {
    // 16-bit bands discriminate NEAR-duplicates (cos >= ~0.95), not
    // this corpus's mid-similarity pairs (max cos ~0.6) — so the
    // recall gate runs on planted twins: 50 unit vectors, each with a
    // perturbed copy at cos ~0.987 (sigma 0.01/dim). Per-bit
    // agreement p = 1 - theta/pi ~ 0.974, band hit p^16 ~ 0.66,
    // >=1-of-4-bands ~ 0.987 per pair.
    import spark.implicits._
    val rnd = new scala.util.Random(123L)
    def normed(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val rows = Array.fill(50, 64)(rnd.nextGaussian()).zipWithIndex.flatMap {
      case (v, i) =>
        val u = normed(v)
        val twin = normed(u.map(_ + rnd.nextGaussian() * 0.01))
        Seq((i.toLong, u.toSeq), ((i + 1000).toLong, twin.toSeq))
    }
    val df = rows.toSeq.toDF("vec_id", "v")
    val planes = graft.operators.Lsh.hyperplanes(64, 64)
    val b = graft.operators.Lsh.buckets(df, planes, 4, 16)
    val found = b.as("a").join(b.as("c"),
        org.apache.spark.sql.functions.col("a.bucket") === org.apache.spark.sql.functions.col("c.bucket"))
      .filter($"a.vec_id" + 1000L === $"c.vec_id")
      .select($"a.vec_id").distinct().count()
    assert(found >= 45, s"only $found/50 planted near-dup pairs bucket-collide")
  }

  test("LSH bucket occupancy stays bounded (bucket space 2^16 per band)") {
    import org.apache.spark.sql.functions._
    // sf0.1 — the largest local corpus — per the r6 verdict: the old
    // 4-bit bands had 16 buckets/band (mean occupancy n/16, candidate
    // sets O(n) per query); 16-bit bands must keep mean occupancy a
    // small constant and spread the corpus over many buckets.
    val e = Vectors.emb(spark, "/root/testdata/sf0.1")
    val n = e.count()
    val planes = graft.operators.Lsh.hyperplanes(64, 64)
    val b = graft.operators.Lsh.buckets(e, planes, 4, 16).cache()
    val occ = b.groupBy("bucket").count()
      .agg(avg("count").as("mean"), max("count").as("max"),
        count(lit(1)).as("buckets")).collect()(0)
    assert(occ.getDouble(0) <= 4.0,
      s"mean bucket occupancy ${occ.getDouble(0)} > 4 at n=$n")
    assert(occ.getLong(2) >= n / 8,
      s"only ${occ.getLong(2)} distinct buckets for $n vectors x 4 bands")
    b.unpersist()
  }

  test("IVF broadcast-join assignment and probe selection equal the literal plans") {
    import org.apache.spark.sql.functions._
    // the large-k representation (centroids broadcast-joined instead
    // of inlined as plan literals) must agree bit-for-bit with the
    // literal path, including the (d, cid) tiebreak
    val e = Vectors.emb(spark, sf).cache()
    val rnd = new scala.util.Random(99L)
    val centers = Array.fill(20, 64)(rnd.nextGaussian() * 0.05)
    def asg(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      df.select("vec_id", "cid").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(asg(graft.operators.IvfIndex.assignLiteral(centers, e)) ==
      asg(graft.operators.IvfIndex.assignJoin(centers, e)))
    val q = e.filter(col("vec_id") < 50).select(
      col("vec_id").as("query_id"), col("v").as("vq"), col("n2").as("nq"))
    def probes(useJoin: Boolean): Map[Long, Set[Int]] =
      graft.operators.IvfIndex.probeSelection(centers, q, 4, useJoin)
        .select("query_id", "cid").collect()
        .groupBy(_.getLong(0)).map { case (k, rs) =>
          k -> rs.map(_.getInt(1)).toSet
        }
    assert(probes(useJoin = false) == probes(useJoin = true))
  }

  test("index parameter validation rejects k larger than the training sample") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 10-vector corpus, k=16 clusters: more centroids than training
    // rows can only duplicate — both quantizer fits must reject, not
    // silently degrade
    val tiny = spark.range(10).select(col("id").as("vec_id"),
      array(Seq.fill(64)(rand(7)): _*).as("v"))
      .withColumn("n2", lit(1.0))
    intercept[IllegalArgumentException] {
      graft.operators.IvfIndex.build(spark, tiny, "/tmp/graft_ivf_tiny_test",
        k = 16)
    }
    val sample10 = Array.fill(10, 64)(0.5)
    intercept[IllegalArgumentException] {
      graft.operators.PqIndex.fit(sample10, m = 8, k = 16)
    }
    intercept[IllegalArgumentException] { // dim 64 not divisible by 7
      graft.operators.PqIndex.fit(Array.fill(32, 64)(0.5), m = 7, k = 16)
    }
  }

  test("LSH parameter validation rejects inconsistent geometry") {
    import spark.implicits._
    val df = Seq((1L, Seq.fill(64)(0.1))).toDF("vec_id", "v")
    val planes = graft.operators.Lsh.hyperplanes(64, 64)
    intercept[IllegalArgumentException] {
      graft.operators.Lsh.buckets(df, planes, 4, 8) // 4x8 != 64
    }
    intercept[IllegalArgumentException] {
      graft.operators.Lsh.buckets(df, planes, 2, 32) // band value >= 2^32
    }
  }

  test("PQ recall@5 vs brute force") {
    // shortlist-100 ADC + exact re-rank: on near-random vectors the
    // 8x16 codebooks are coarse, but the exact re-rank means recall
    // is the probability the true top-5 reach the ADC shortlist
    val r = recall(topk(Vectors.knnPq.run(spark, sf)))
    assert(r >= 0.55, s"PQ recall $r")
  }

  test("PQ codes are within range and re-rank scores are exact") {
    import org.apache.spark.sql.functions._
    val rows = Vectors.knnPq.run(spark, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    byQ.values.foreach { rs =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to 5))
      val byRank = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
    // the re-ranked cosine of each returned pair equals the brute
    // cosine for the same pair (exact math on the shortlist): spot
    // check through knnBrute's output where the pair overlaps
    val bruteRows = Vectors.knnBrute.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    rows.foreach { r =>
      bruteRows.get((r.getLong(0), r.getLong(2))).foreach { c =>
        assert(math.abs(c - r.getDouble(3)) < 1e-12)
      }
    }
  }

  test("PCA: components orthonormal, variance ordered and axis-optimal") {
    import org.apache.spark.sql.functions._
    val e = queries.Vectors.emb(spark, sf).cache()
    val (mean, comps) = graft.operators.Pca.fit(e, "v", d = 64, k = 2)
    assert(mean.length == 64 && comps.length == 2)
    def dotA(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    assert(math.abs(dotA(comps(0), comps(0)) - 1.0) < 1e-9)
    assert(math.abs(dotA(comps(1), comps(1)) - 1.0) < 1e-9)
    assert(math.abs(dotA(comps(0), comps(1))) < 1e-6, "components not orthogonal")
    // projections through the registered query: Var(p1) >= Var(p2),
    // and PC1 beats every coordinate axis (PCA optimality)
    val rows = queries.Vectors.embedPca.run(spark, sf).collect()
    def variance(xs: Array[Double]): Double = {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / xs.length
    }
    val v1 = variance(rows.map(_.getDouble(1)))
    val v2 = variance(rows.map(_.getDouble(2)))
    assert(v1 >= v2, s"PC variance out of order: $v1 < $v2")
    val raw = e.select("v").collect().map(_.getSeq[Double](0).toArray)
    val maxAxisVar = (0 until 64).map(d => variance(raw.map(_(d)))).max
    assert(v1 >= maxAxisVar - 1e-9, s"PC1 var $v1 < best axis var $maxAxisVar")
  }

  test("PCA stays orthonormal on rank-deficient input") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 100 vectors all on axis 0: one real direction, k=2 requested —
    // the second component must come out orthogonal (a basis axis),
    // never a duplicate of the first
    val df = spark.range(100)
      .select(col("id").as("vec_id"),
        array(col("id").cast("double"), lit(0.0), lit(0.0), lit(0.0)).as("v"))
    val (_, comps) = graft.operators.Pca.fit(df, "v", d = 4, k = 2)
    def dotA(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    assert(math.abs(dotA(comps(0), comps(0)) - 1.0) < 1e-9)
    assert(math.abs(dotA(comps(1), comps(1)) - 1.0) < 1e-9)
    assert(math.abs(dotA(comps(0), comps(1))) < 1e-9,
      s"rank-deficient components not orthogonal: ${comps(0).toSeq} ${comps(1).toSeq}")
  }

  test("embedding near-dup matches a brute-force recompute") {
    val pairs = Vectors.embeddingNearDup.run(spark, sf).collect()
    pairs.foreach(r => assert(r.getAs[Double]("cos_sim") >= 0.5))
  }

  test("IVF incremental append: build on half, append the rest, same recall") {
    import org.apache.spark.sql.functions._
    val e = Vectors.emb(spark, sf).cache()
    val ids = e.select("vec_id").collect().map(_.getLong(0)).sorted
    val cut = ids(ids.length / 2)
    val idx = "/tmp/graft_ivf_append_test"
    graft.operators.IvfIndex.build(spark,
      e.filter(col("vec_id") < cut), idx, k = 16)
    graft.operators.IvfIndex.append(spark, e.filter(col("vec_id") >= cut), idx)
    val q = e.filter(col("vec_id") < 50).select(
      col("vec_id").as("query_id"), col("v").as("vq"), col("n2").as("nq"))
    val got = topk(graft.operators.IvfIndex.query(spark, idx, q,
      topK = 5, nprobe = 4))
    // appended vectors must be as reachable as built ones: recall of
    // the half+append index matches the full-build IVF gate, and the
    // appended id range actually appears among the neighbors
    val r = recall(got)
    assert(r >= 0.5, s"append-index recall $r")
    assert(got.values.flatten.exists(_ >= cut), "no appended vector retrieved")
  }

  test("IVF offline refit: appended state refits bit-equal to a fresh build") {
    import org.apache.spark.sql.functions._
    val e = Vectors.emb(spark, sf).cache()
    val ids = e.select("vec_id").collect().map(_.getLong(0)).sorted
    val cut = ids(ids.length / 2)
    val idx = "/tmp/graft_ivf_refit_test"
    val freshDir = "/tmp/graft_ivf_refit_fresh"
    Seq(idx, freshDir).foreach(d =>
      graft.operators.LakeFs.rmTree(d))
    // drifted index: quantizer fit on the first half only, second
    // half appended under the frozen (now unrepresentative) centroids
    graft.operators.IvfIndex.build(spark,
      e.filter(col("vec_id") < cut), idx, k = 16)
    graft.operators.IvfIndex.append(spark, e.filter(col("vec_id") >= cut), idx)
    val filesBefore = leafParquets(s"$idx/vectors")
    graft.operators.IvfIndex.refit(spark, idx, k = 16)
    // the contract: refit == fresh build over the same vectors, bit-equal
    graft.operators.IvfIndex.build(spark, e, freshDir, k = 16)
    def cents(d: String) = spark.read.parquet(s"$d/centroids")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    assert(cents(idx) == cents(freshDir), "refit centroids != fresh-fit centroids")
    def vecs(d: String) = spark.read.parquet(s"$d/vectors")
      .select(col("vec_id"), col("cid"), col("n2"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(vecs(idx) == vecs(freshDir), "refit assignments != fresh assignments")
    // the compaction half: append-accumulated small files are folded
    val filesAfter = leafParquets(s"$idx/vectors")
    assert(filesAfter < filesBefore,
      s"refit did not fold small files: $filesBefore -> $filesAfter")
  }

  private def leafParquets(dir: String): Int = {
    def walk(f: java.io.File): Int =
      Option(f.listFiles()).toSeq.flatten.map(c =>
        if (c.isDirectory) walk(c)
        else if (c.getName.endsWith(".parquet")) 1 else 0).sum
    walk(new java.io.File(dir))
  }

  test("IVF-PQ recall@5 vs brute force") {
    // probe recall bounds it (same 16-cell/4-probe geometry as IVF);
    // ADC error is mostly absorbed by the 100-deep exact re-rank
    val r = recall(topk(Vectors.knnIvfPq.run(spark, sf)))
    assert(r >= 0.5, s"IVF-PQ recall $r")
  }

  test("IVF-PQ lake lifecycle: append assigns+encodes bit-equal to build") {
    import org.apache.spark.sql.functions._
    val e = Vectors.embNorm(spark, sf).select(col("vec_id"), col("vn")).cache()
    val ids = e.select("vec_id").collect().map(_.getLong(0)).sorted
    val cut = ids(ids.length / 2)
    val idx = "/tmp/graft_ivfpq_append_test"
    val (centers, books) = graft.operators.IvfPq.build(spark,
      e.filter(col("vec_id") < cut), idx, kCells = 16, m = 8, kCodes = 16)
    graft.operators.IvfPq.append(spark, e.filter(col("vec_id") >= cut), idx)
    // cell assignment and codes of the appended half must equal a
    // one-shot encode against the same frozen models
    val persisted = graft.operators.IvfPq.codes(spark, idx).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Int]("cid"), r.getSeq[Int](1))))
      .toMap
    val direct = graft.operators.IvfIndex.assignLiteral(centers,
        e.select(col("vec_id"), col("vn").as("v")))
      .select(col("vec_id"),
        graft.operators.PqIndex.encode(col("v"), books).as("codes"),
        col("cid"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(2), r.getSeq[Int](1)))).toMap
    assert(persisted == direct,
      s"diverging ids: ${(persisted.keySet ++ direct.keySet)
        .filter(k => persisted.get(k) != direct.get(k)).take(5)}")
  }

  test("PQ lake lifecycle: append encodes bit-equal to build, codebooks round-trip") {
    import org.apache.spark.sql.functions._
    val e = Vectors.embNorm(spark, sf).select(col("vec_id"), col("vn")).cache()
    val ids = e.select("vec_id").collect().map(_.getLong(0)).sorted
    val cut = ids(ids.length / 2)
    val idx = "/tmp/graft_pq_append_test"
    val books = graft.operators.PqIndex.build(spark,
      e.filter(col("vec_id") < cut), idx, m = 8, k = 16)
    graft.operators.PqIndex.append(spark, e.filter(col("vec_id") >= cut), idx)
    // the frozen codebooks round-trip through the lake exactly
    val loaded = graft.operators.PqIndex.loadBooks(spark, idx)
    assert(loaded.length == books.length)
    for (j <- books.indices; c <- books(j).indices)
      assert(loaded(j)(c).sameElements(books(j)(c)), s"codebook ($j,$c)")
    // encoding against frozen codebooks is deterministic, so the
    // build-half + append-half codes table is bit-equal to a one-shot
    // encode of the full corpus with the same books — append parity
    val persisted = graft.operators.PqIndex.codes(spark, idx).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val direct = e.select(col("vec_id"),
        graft.operators.PqIndex.encode(col("vn"), books).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(persisted == direct,
      s"persisted codes diverge for ${
        (persisted.keySet ++ direct.keySet)
          .filter(k => persisted.get(k) != direct.get(k)).take(5)}")
  }

  test("PQ and IVF-PQ offline refit: appended state refits bit-equal to a fresh build") {
    import org.apache.spark.sql.functions._
        val e = Vectors.embNorm(spark, sf).select(col("vec_id"), col("vn")).cache()
    val ids = e.select("vec_id").collect().map(_.getLong(0)).sorted
    val cut = ids(ids.length / 2)
    // PQ: refit re-reads the source corpus (codes are lossy)
    val pqIdx = "/tmp/graft_pq_refit_test"
    val pqFresh = "/tmp/graft_pq_refit_fresh"
    Seq(pqIdx, pqFresh).foreach(graft.operators.LakeFs.rmTree)
    graft.operators.PqIndex.build(spark,
      e.filter(col("vec_id") < cut), pqIdx, m = 8, k = 16)
    graft.operators.PqIndex.append(spark, e.filter(col("vec_id") >= cut), pqIdx)
    graft.operators.PqIndex.refit(spark, e, pqIdx, m = 8, k = 16)
    graft.operators.PqIndex.build(spark, e, pqFresh, m = 8, k = 16)
    def pqState(d: String) = (
      spark.read.parquet(s"$d/codebooks").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2))).toSet,
      spark.read.parquet(s"$d/codes").collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap)
    assert(pqState(pqIdx) == pqState(pqFresh), "PQ refit != fresh build")
    // IVF-PQ: both models refit, one assign+encode scan
    val ipIdx = "/tmp/graft_ivfpq_refit_test"
    val ipFresh = "/tmp/graft_ivfpq_refit_fresh"
    Seq(ipIdx, ipFresh).foreach(graft.operators.LakeFs.rmTree)
    graft.operators.IvfPq.build(spark,
      e.filter(col("vec_id") < cut), ipIdx, kCells = 16, m = 8, kCodes = 16)
    graft.operators.IvfPq.append(spark, e.filter(col("vec_id") >= cut), ipIdx)
    graft.operators.IvfPq.refit(spark, e, ipIdx, kCells = 16, m = 8, kCodes = 16)
    graft.operators.IvfPq.build(spark, e, ipFresh, kCells = 16, m = 8, kCodes = 16)
    def ipState(d: String) = (
      spark.read.parquet(s"$d/centroids").collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1))).toSet,
      graft.operators.IvfPq.codes(spark, d).collect()
        .map(r => r.getLong(0) -> ((r.getAs[Int]("cid"), r.getSeq[Int](1))))
        .toMap)
    assert(ipState(ipIdx) == ipState(ipFresh), "IVF-PQ refit != fresh build")
  }
}
