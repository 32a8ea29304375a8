package graft.tools

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Deterministic document slice of an existing sfDir — the sliced
  * sf1 oracle gate for the shingle family (r14 verdict #3): the 7
  * capped-shingle-pairs queries (corpus_clean, corpus_triplets,
  * dedup_clusters[_incremental], dedup_incremental, dedup_minhash_lsh,
  * dedup_ngram_jaccard) share a pair CTE whose DuckDB materialization
  * exceeds the 48 GB + spill oracle budget at sf1, so the full-corpus
  * sf1 gate could only adjudicate them. Slicing documents to
  * `doc_id % mod == 0` at the DATA level (a derived sfDir both
  * engines read) keeps the gate restriction identical by
  * construction, fits DuckDB's budget (pairs shrink ~mod²), and
  * PRESERVES sf1's cross-replica duplicate-cluster structure: ScaleUp
  * offsets replica doc_ids by 1 000 000 ≡ 0 (mod 4), so a cluster's
  * members either all survive the slice or all drop — the dedup
  * joins still see real 10×-shaped clusters, not orphaned members.
  *
  *   tools/run.sh graft.tools.SliceDocs /tmp/graft_sf1 /tmp/graft_sf1_s4 4
  *
  * All other tables copy byte-identical (the 7 gated queries read
  * only documents, but Verify's table views want the full set). */
object SliceDocs {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val mod = args.lift(2).map(_.toInt).getOrElse(4)
    require(!out.startsWith("/root/testdata"), "testdata is read-only")
    val s = graft.GraftSession.localBench(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    s.sparkContext.setLogLevel("ERROR")
    new java.io.File(out).mkdirs()
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings")) {
      val from = java.nio.file.Paths.get(s"$src/$t.parquet")
      // Files.copy on a DIRECTORY source creates an empty dir without
      // error and the slice would read empty tables — driver testdata
      // is single-file parquet; fail loudly if that ever changes
      require(java.nio.file.Files.isRegularFile(from),
        s"$from is not a single-file parquet table")
      java.nio.file.Files.copy(from,
        java.nio.file.Paths.get(s"$out/$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val docs = s.read.parquet(s"$src/documents.parquet")
      .filter(col("doc_id") % mod === 0)
    val tmp = s"$out/_tmp_documents"
    docs.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$out/documents.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    graft.operators.LakeFs.rmTree(tmp)
    println(s"sliced documents % $mod: ${docs.count()} rows -> $out")
    s.stop()
  }
}
