package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway stage-decomposition probe for the r16 optimization
  * round — times sub-frames of a dataflow with the noop sink.
  * Not part of any query path; kept for the optimization rounds' A/B reruns. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = graft.GraftSession.localBench(cpus)
    s.sparkContext.setLogLevel("ERROR")
    s.range(1000000).selectExpr("sum(id)").collect()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // full-pipeline A/B: old distinct-exchange sh vs new array_distinct sh
    def pipelineWith(sh0: org.apache.spark.sql.DataFrame): Unit = {
      val sh = sh0.cache()
      val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n")).cache()
      val nd = sz.count()
      val hotK = broadcast(sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
        .filter(col("df") * 2 > lit(nd)).select(col("s")))
      val rare = sh.join(hotK, Seq("s"), "left_anti")
      val cr = rare.select(col("doc_id").as("da"), col("s"))
        .join(rare.select(col("doc_id").as("db"), col("s")), Seq("s"))
        .filter(col("da") < col("db"))
        .groupBy(col("da"), col("db")).agg(count(lit(1)).as("cr"))
        .cache()
      val hot = sh.join(hotK, Seq("s"), "left_semi")
      val ch = cr.select(col("da"), col("db"))
        .join(hot.select(col("doc_id").as("da"), col("s")), "da")
        .join(hot.select(col("doc_id").as("db"), col("s")), Seq("db", "s"))
        .groupBy(col("da"), col("db")).agg(count(lit(1)).as("ch"))
      val inter = cr.join(ch, Seq("da", "db"), "left")
        .select(col("da"), col("db"),
          (col("cr") + coalesce(col("ch"), lit(0L))).as("i"))
      val jac = col("i") / (col("na") + col("nb") - col("i"))
      val out = inter
        .join(sz.select(col("doc_id").as("da"), col("n").as("na")), "da")
        .join(sz.select(col("doc_id").as("db"), col("n").as("nb")), "db")
        .filter(jac >= 0.8)
        .select(col("da"), col("db"), round(jac, 6).as("jaccard"))
        .orderBy(col("da"), col("db"))
      noop(out)
      s.catalog.clearCache(); System.gc()
    }
    val docsAB = graft.sources.Tables.documents(s, dir)
    val shOld = docsAB
      .select(col("doc_id"), explode(graft.functions.TextExprs.gramsN(
        graft.functions.TextExprs.tokens(col("text")), 3)).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("s")).distinct()
    val shNew = graft.queries.Dedup.hashedShinglesOf(docsAB)
    for (p <- 1 to 3) {
      time(s"pipeline OLD sh p$p")(pipelineWith(shOld))
      time(s"pipeline NEW sh p$p")(pipelineWith(shNew))
    }

    // cr variants over a shared cached sh
    locally {
      val sh = graft.queries.Dedup.hashedShinglesOf(docsAB).cache()
      val nd = sh.select(col("doc_id")).distinct().count()
      val hotK = broadcast(sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
        .filter(col("df") * 2 > lit(nd)).select(col("s")))
      val rare = sh.join(hotK, Seq("s"), "left_anti")
      val crOld = rare.select(col("doc_id").as("da"), col("s"))
        .join(rare.select(col("doc_id").as("db"), col("s")), Seq("s"))
        .filter(col("da") < col("db"))
        .groupBy(col("da"), col("db")).agg(count(lit(1)).as("cr"))
      val crNew = rare.groupBy(col("s"))
        .agg(sort_array(collect_set(col("doc_id"))).as("ds"))
        .select(explode(expr(
          "flatten(transform(ds, (x, i) -> " +
            "transform(slice(ds, i + 2, size(ds)), y -> struct(x, y))))"))
          .as("e"))
        .groupBy(col("e.x").as("da"), col("e.y").as("db"))
        .agg(count(lit(1)).as("cr"))
      for (p <- 1 to 3) {
        time(s"crOld p$p")(noop(crOld))
        time(s"crNew p$p")(noop(crNew))
      }
      s.catalog.clearCache(); System.gc()
    }

    // dedup_ngram_jaccard decomposition (run twice; read pass 2)
    for (p <- 1 to 2) {
      println(s"--- pass $p")
      val docs = graft.sources.Tables.documents(s, dir)
      val sh = graft.queries.Dedup.hashedShinglesOf(docs).cache()
      time("sh materialize")(sh.count())
      val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n")).cache()
      val nd = time("sz materialize")(sz.count())
      val hotK = broadcast(sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
        .filter(col("df") * 2 > lit(nd)).select(col("s")))
      val rare = sh.join(hotK, Seq("s"), "left_anti")
      val cr = rare.select(col("doc_id").as("da"), col("s"))
        .join(rare.select(col("doc_id").as("db"), col("s")), Seq("s"))
        .filter(col("da") < col("db"))
        .groupBy(col("da"), col("db")).agg(count(lit(1)).as("cr"))
        .cache()
      time("cr self-join+agg")(cr.count())
      val hot = sh.join(hotK, Seq("s"), "left_semi")
      val ch = cr.select(col("da"), col("db"))
        .join(hot.select(col("doc_id").as("da"), col("s")), "da")
        .join(hot.select(col("doc_id").as("db"), col("s")), Seq("db", "s"))
        .groupBy(col("da"), col("db")).agg(count(lit(1)).as("ch"))
      val inter = cr.join(ch, Seq("da", "db"), "left")
        .select(col("da"), col("db"),
          (col("cr") + coalesce(col("ch"), lit(0L))).as("i"))
      val jac = col("i") / (col("na") + col("nb") - col("i"))
      val out = inter
        .join(sz.select(col("doc_id").as("da"), col("n").as("na")), "da")
        .join(sz.select(col("doc_id").as("db"), col("n").as("nb")), "db")
        .filter(jac >= 0.8)
        .select(col("da"), col("db"), round(jac, 6).as("jaccard"))
        .orderBy(col("da"), col("db"))
      time("hot-correction+jaccard+sort")(noop(out))
      s.catalog.clearCache()
      System.gc()
    }
    s.stop()
  }
}
