package graft.tools

/** Scaling-curve probe (VERDICT r11 #7): run the most expensive
  * queries at two scale factors in one JVM and report the per-query
  * time ratio. A linear operator on this 10× data step should land
  * near 10× (sub-10× when fixed per-query overhead — session, plan,
  * model sidecars — dominates the small-SF run); a clearly
  * super-linear ratio is the smoking gun for a hidden quadratic or a
  * skew collapse that sf0.1 tuning would never surface.
  *
  *   tools/run.sh graft.tools.ScaleProbe [query ...]
  *
  * Protocol per (query, sf): one untimed warm-up run (JIT + codegen +
  * index/sidecar builds — buildOnce makes those one-time costs, and a
  * scaling probe must not bill them to either scale), then two timed
  * runs keeping the MINIMUM (the same excursion logic the bench's q3
  * adjudication exists for). Small SF first so its sidecars exist
  * before the big runs. Output: one aligned row per query plus a
  * machine-grepped `[scale] name ratio` line set.
  */
object ScaleProbe {

  /** Default probe set: the 10 most expensive queries of the r11
    * driver bench (BENCH_r11 pass-2 ordering). */
  private val Default = Seq(
    "dedup_clusters", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "retrieval_hybrid", "retrieval_rrf", "dedup_simhash",
    "retrieval_mmr", "dedup_substring", "qa_pipeline", "seq_pack")

  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else Default
    val small = sys.env.getOrElse("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.01")
    val big = sys.env.getOrElse("SPARK_GRAFT_SF_BIG", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.localBench(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10000000L).selectExpr("sum(id)").collect()

    def timeOne(name: String, dir: String): Double = {
      val fn = graft.SparkEntry.queries(name)
      def run(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val e = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        System.gc()
        e
      }
      run() // warm-up: JIT, codegen, sidecar/index builds
      math.min(run(), run())
    }

    println(f"${"query"}%-26s ${"small"}%8s ${"big"}%8s  ratio  (data step 10x)")
    names.foreach { name =>
      val ts = timeOne(name, small)
      val tb = timeOne(name, big)
      val ratio = tb / math.max(ts, 1e-9)
      println(f"$name%-26s $ts%8.2f $tb%8.2f  ${ratio}%5.1f")
      println(f"[scale] $name ${"%.2f".format(ratio)}")
    }
    spark.stop()
  }
}
