package graft.tools

import org.apache.spark.sql.DataFrame

/** r17 throwaway probe: stage decomposition of the mm codec queries —
  * times payload SYNTHESIS alone vs synthesis+decode/fingerprint with
  * the noop sink, so the per-task-work target (guide §4.5) is the
  * measured stage, not a guess. Not part of any query path.
  *
  *   tools/run.sh graft.tools.MmProbe /root/testdata/sf0.1
  */
object MmProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = graft.GraftSession.localBench(cpus)
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    import org.apache.spark.sql.functions._
    s.range(1000000).selectExpr("sum(id)").collect()

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[mmprobe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val ids = graft.sources.Tables.documents(s, dir)
      .select(col("doc_id")).as[Long]
    def vidPayloads: DataFrame = ids.mapPartitions(_.map { id =>
      val src = if (id % 11 == 4) id - 1 else id
      val shift = if (id % 11 == 4) 9 else 0
      (id, graft.multimodal.Binary.VideoCodec.plantedGifMixed(src, 6, 5,
        graft.multimodal.Binary.VideoCodec.FingerprintFrames, shift))
    }).toDF("doc_id", "data")
    def imgPayloads: DataFrame = ids.mapPartitions(_.map { id =>
      val src = if (id % 7 == 3) id - 1 else id
      val shift = if (id % 7 == 3) 12 else 0
      (id, graft.multimodal.Binary.ImageCodec.plantedPngMixed(src,
        (12 + src % 5).toInt, (9 + src % 4).toInt, shift))
    }).toDF("doc_id", "data")

    for (p <- 1 to 3) {
      time(s"gif synth only p$p")(noop(vidPayloads))
      time(s"gif synth+fingerprint p$p")(noop(
        graft.multimodal.Binary.VideoCodec.fingerprintVideos(s, vidPayloads)))
      time(s"png synth only p$p")(noop(imgPayloads))
      time(s"png synth+dhash p$p")(noop(
        graft.multimodal.Binary.ImageCodec.hashImages(s, imgPayloads)))
      time(s"png synth+phash p$p")(noop(
        graft.multimodal.Binary.ImageCodec.pHashImages(s, imgPayloads)))
      time(s"full mm_video_dedup p$p")(noop(
        graft.SparkEntry.queries("mm_video_dedup")(s, dir)))
      s.catalog.clearCache(); System.gc()
    }
    s.stop()
  }
}
