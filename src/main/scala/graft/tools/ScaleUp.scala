package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Deterministic corpus scale-up for scale-portability gates beyond
  * the driver-provided factors: replicate the FACT tables of an
  * existing sfDir `factor`× with per-replica key offsets (PK/FK
  * consistency preserved — lineitem follows orders' key remap, every
  * o_custkey/l_partkey/l_suppkey still resolves against the copied
  * dims), write the result as a new sfDir the whole Verify/check/
  * Bench tooling runs unchanged.
  *
  *   tools/run.sh graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/graft_sf1 10
  *
  * Shape decisions (what a REAL 10× corpus looks like, not a
  * pathological one): events get fresh user cohorts per replica
  * (per-user volumes stay realistic instead of 10× per user);
  * documents keep a 10% cross-replica exact-duplicate rate (every
  * tenth doc replicates verbatim; the rest get a per-replica suffix)
  * so dedup joins see realistic duplicate clusters, not a corpus
  * that is 90% copies; embeddings replicate as-is (duplicate vectors
  * are ties, and ties are the edge case worth scaling). All
  * timestamps are written NTZ micros so DuckDB keeps reading plain
  * TIMESTAMP (the oracle's canonicalization is tz-sensitive). */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    require(!out.startsWith("/root/testdata"), "testdata is read-only")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val s = graft.GraftSession.localBench(cpus)
    s.sparkContext.setLogLevel("ERROR")
    new java.io.File(out).mkdirs()

    // dims copy byte-identical
    for (t <- Seq("region", "nation", "customer", "supplier", "part")) {
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$src/$t.parquet"),
        java.nio.file.Paths.get(s"$out/$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      println(s"copied $t")
    }

    val Off = 1000000000L
    def ntz(df: DataFrame): DataFrame =
      df.schema.fields.filter(_.dataType == TimestampType)
        .foldLeft(df)((d, f) =>
          d.withColumn(f.name, col(f.name).cast("timestamp_ntz")))
    def writeOne(df: DataFrame, t: String): Unit = {
      // single file (the check.py DuckDB views read '<t>.parquet'
      // directly), multi-row-group via the session's 1 MB block size
      // so Spark still splits the scan
      val tmp = s"$out/_tmp_$t"
      ntz(df).coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$out/$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      graft.operators.LakeFs.rmTree(tmp)
      println(s"wrote $t (${df.count()} rows)")
    }
    def replicate(df: DataFrame)(remap: (DataFrame, Int) => DataFrame)
        : DataFrame =
      (0 until factor).map(i => remap(df, i)).reduce(_ unionByName _)

    val orders = s.read.parquet(s"$src/orders.parquet")
    writeOne(replicate(orders) { (d, i) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(i * Off))
    }, "orders")

    val lineitem = s.read.parquet(s"$src/lineitem.parquet")
    writeOne(replicate(lineitem) { (d, i) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(i * Off))
    }, "lineitem")

    // events through the loader's ts normalization (nanos → micros)
    val events = graft.sources.Tables.events(s, src)
    writeOne(replicate(events) { (d, i) =>
      d.withColumn("event_id", col("event_id") + lit(i * Off))
        .withColumn("user_id", col("user_id") + lit(i * 10000L))
    }, "events")

    val docs = s.read.parquet(s"$src/documents.parquet")
    writeOne(replicate(docs) { (d, i) =>
      val text =
        if (i == 0) col("text")
        else when(col("doc_id") % 10 === 0, col("text"))
          .otherwise(concat(col("text"), lit(s" replica $i variant")))
      d.withColumn("doc_id", col("doc_id") + lit(i * 1000000L))
        .withColumn("text", text)
        .withColumn("n_chars", length(col("text")).cast("long"))
    }, "documents")

    val emb = s.read.parquet(s"$src/embeddings.parquet")
    writeOne(replicate(emb) { (d, i) =>
      d.withColumn("vec_id", col("vec_id") + lit(i * 1000000L))
    }, "embeddings")

    s.stop()
    println(s"scaled $src x$factor -> $out")
  }
}
