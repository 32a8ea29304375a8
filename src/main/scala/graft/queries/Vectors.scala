package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Vector similarity over the embeddings table (Array[Float], dim 64).
  *
  * All arithmetic is double (floats upcast first) with a strict
  * left-fold sum, mirrored exactly in the DuckDB oracles; the
  * reference's vector store (conversadocs/bones.py:74-78,
  * DocArrayInMemorySearch cosine top-k) maps to `knnBrute`, and the
  * 100 TB scale paths are `knnIvf` (coarse-quantized) and `annLsh`
  * (hyperplane-bucketed), spec-checked by recall against brute force.
  */
object Vectors {

  /** embeddings with double vector + squared norm. */
  private[queries] def emb(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).select(
      col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("n2", graft.functions.VectorExprs.norm2(col("v")))

  // native codegen'd dot — same left-fold order as the HOF form
  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorExprs.dot(a, b)

  private val oracleEmb =
    """e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
      |  FROM embeddings),
      |n AS (
      |  SELECT vec_id, v, list_sum(list_transform(v, x -> x * x)) n2
      |  FROM e)""".stripMargin

  /** Embedding-cosine near-dup pairs (cosine >= 0.5). The checkable
    * query verifies ALL pairs exactly (the corpus max off-pair cosine
    * is ~0.6, so 0.5 exercises the operator); at 100 TB the same
    * verify step runs on annLsh candidates instead of all pairs. */
  val embeddingNearDup: Q = Q(
    "dedup_embedding",
    s"""WITH $oracleEmb,
      |p AS (
      |  SELECT a.vec_id da, b.vec_id db,
      |    list_sum(list_transform(range(1, len(a.v) + 1),
      |      i -> a.v[i] * b.v[i])) / sqrt(a.n2 * b.n2) AS cos
      |  FROM n a JOIN n b ON a.vec_id < b.vec_id)
      |SELECT da AS doc_a, db AS doc_b, ROUND(cos, 4) AS cos_sim
      |FROM p WHERE cos >= 0.5 ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
    val e = emb(s, dir)
    val a = e.select(col("vec_id").as("da"), col("v").as("va"), col("n2").as("na"))
    val b = e.select(col("vec_id").as("db"), col("v").as("vb"), col("n2").as("nb"))
    val cos = dot(col("va"), col("vb")) / sqrt(col("na") * col("nb"))
    a.join(b, col("da") < col("db"))
      .withColumn("cos", cos)
      .filter(col("cos") >= 0.5)
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        round(col("cos"), 4).as("cos_sim"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Brute-force cosine top-5 per query vector (vec_id < 50): the
    * exactness baseline every ANN path is measured against. Query set
    * is broadcast; candidates never shuffle. */
  val knnBrute: Q = Q(
    "knn_brute",
    s"""WITH $oracleEmb,
      |p AS (
      |  SELECT q.vec_id query_id, c.vec_id neighbor_id,
      |    list_sum(list_transform(range(1, len(q.v) + 1),
      |      i -> q.v[i] * c.v[i])) / sqrt(q.n2 * c.n2) AS cos
      |  FROM n q JOIN n c ON q.vec_id < 50 AND c.vec_id <> q.vec_id),
      |r AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY cos DESC, neighbor_id) rn
      |  FROM p)
      |SELECT query_id, rn AS rank, neighbor_id, ROUND(cos, 4) AS cos_sim
      |FROM r WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"), col("v").as("vq"), col("n2").as("nq"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("v").as("vc"),
      col("n2").as("nc"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(q).join(c, col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", dot(col("vq"), col("vc")) / sqrt(col("nq") * col("nc")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("query_id"), col("rn").as("rank"), col("neighbor_id"),
        round(col("cos"), 4).as("cos_sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF top-5: KMeans(16) coarse quantizer (MLlib), search only the
    * nprobe=4 nearest clusters per query. At 100 TB: centroids are
    * broadcast, vectors are partitioned by cluster id, each query
    * probes a small fraction of the data. Rows-only (KMeans has no
    * SQL twin); recall vs knnBrute asserted in VectorSpec. */
  val knnIvf: Q = Q.rowsOnly("knn_ivf") { (s, dir) =>
    val e = emb(s, dir).cache()
    val idx = "/tmp/graft_ivf/" + dir.replaceAll("[^a-zA-Z0-9]", "_")
    graft.operators.IvfIndex.build(s, e, idx, k = 16)
    val q = e.filter(col("vec_id") < 50).select(
      col("vec_id").as("query_id"), col("v").as("vq"), col("n2").as("nq"))
    graft.operators.IvfIndex.query(s, idx, q, topK = 5, nprobe = 4)
      .orderBy(col("query_id"), col("rank"))
  }

  // Deterministic random hyperplanes: 16 planes x 64 dims, fixed seed.
  private def hyperplanes(dim: Int, nPlanes: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(7L)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  /** Random-hyperplane LSH ANN: 16-bit signature, 4x4-bit bands;
    * candidates share a band bucket, then exact cosine re-rank.
    * Rows-only; recall vs knnBrute asserted in VectorSpec. */
  val annLsh: Q = Q.rowsOnly("ann_lsh") { (s, dir) =>
    val planes = hyperplanes(64, 16)
    val e = emb(s, dir)
    val sigBits = planes.zipWithIndex.map { case (p, i) =>
      val proj = aggregate(
        zip_with(col("v"), array(p.map(lit(_)): _*), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    val sig = e.withColumn("sig", sigBits)
    val bandArr = array((0 until 4).map(k =>
      shiftright(col("sig"), 4 * k).bitwiseAND(0xFL)
        .bitwiseOR(lit(k.toLong << 32))): _*)
    val banded = sig.select(col("vec_id"), col("v"), col("n2"),
      explode(bandArr).as("bucket"))
    val q = banded.filter(col("vec_id") < 50).select(
      col("vec_id").as("query_id"), col("v").as("vq"), col("n2").as("nq"),
      col("bucket"))
    val c = banded.select(col("vec_id").as("neighbor_id"), col("v").as("vc"),
      col("n2").as("nc"), col("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(q).join(c, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("vq"), col("nq"),
        col("vc"), col("nc")).distinct()
      .withColumn("cos", dot(col("vq"), col("vc")) / sqrt(col("nq") * col("nc")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("query_id"), col("rn").as("rank"), col("neighbor_id"),
        round(col("cos"), 4).as("cos_sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  val all: Seq[Q] = Seq(embeddingNearDup, knnBrute, knnIvf, annLsh)
}
