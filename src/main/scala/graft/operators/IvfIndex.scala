package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorExprs.dot

/** Persistable IVF (inverted-file) vector index.
  *
  * The north-star split for vector search at scale: Spark
  * *batch-builds* the index — KMeans coarse quantizer + vectors
  * partitioned on disk by cluster id — and any query path (Spark
  * batch here; an online server in production) loads centroids
  * (tiny, broadcast) and scans only the probed partitions.
  * The reference's DocArrayInMemorySearch (conversadocs/bones.py:74)
  * is the k=everything, nprobe=everything degenerate case of this.
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

  /** Batch-build: fit KMeans(k), assign every vector, write the lake
    * layout. `emb` must have (vec_id, v: array<double>, n2). */
  def build(spark: SparkSession, emb: DataFrame, indexDir: String,
      k: Int, seed: Long = 42L): Unit = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val feat = emb.withColumn("features", array_to_vector(col("v")))
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(10)
      .setFeaturesCol("features").fit(feat)
    val centers = model.clusterCenters.map(_.toArray)
    val centArr = centroidArray(centers)
    val assigned = emb.withColumn("cid",
      array_min(transform(centArr,
        c => struct(dist2(col("v"), c("cv")).as("d"), c("cid").as("cid"))))("cid"))
    // repartition on cid first: otherwise every task writes a file
    // into every cid directory (tasks x k tiny files)
    assigned.repartition(col("cid")).write.mode(SaveMode.Overwrite)
      .partitionBy("cid").parquet(s"$indexDir/vectors")
    val centRows = centers.zipWithIndex.map { case (cv, i) => (i, cv.toSeq) }
    import spark.implicits._
    centRows.toSeq.toDF("cid", "cv")
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/centroids")
  }

  private def centroidArray(centers: Array[Array[Double]]): Column =
    array(centers.zipWithIndex.map { case (ctr, i) =>
      struct(lit(i).as("cid"), array(ctr.map(lit(_)): _*).as("cv"))
    }: _*)

  /** Probe-query: for each query vector, cosine top-k over the nprobe
    * nearest clusters only. Partition pruning on cid keeps unprobed
    * index partitions unread. */
  def query(spark: SparkSession, indexDir: String, queries: DataFrame,
      topK: Int, nprobe: Int): DataFrame = {
    val centers = spark.read.parquet(s"$indexDir/centroids")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).map(_._2)
    val centArr = centroidArray(centers)
    val probes = queries
      .withColumn("cd", transform(centArr,
        c => struct(dist2(col("vq"), c("cv")).as("d"), c("cid").as("cid"))))
      .withColumn("cid", explode(transform(
        slice(array_sort(col("cd")), 1, nprobe), p => p("cid"))))
      .drop("cd")
    val vectors = spark.read.parquet(s"$indexDir/vectors")
      .select(col("vec_id").as("neighbor_id"), col("v").as("vc"),
        col("n2").as("nc"), col("cid"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(probes).join(vectors, Seq("cid"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", dot(col("vq"), col("vc")) / sqrt(col("nq") * col("nc")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .select(col("query_id"), col("rn").as("rank"), col("neighbor_id"),
        round(col("cos"), 4).as("cos_sim"))
  }
}
