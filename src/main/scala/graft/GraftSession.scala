package graft

import org.apache.spark.sql.SparkSession

/** One place for the engine's session tuning. Verify/Bench/tests all
  * build through here so the settings the operators rely on (UTC,
  * AQE, right-sized shuffle partitions) are uniform.
  *
  * On a real cluster the same settings apply with
  * `spark.sql.shuffle.partitions` sized to ~2-3x total cores and AQE
  * coalescing handling the rest; nothing in the engine assumes local
  * mode.
  *
  * Scan-side parallelism is file-layout-bound:
  * `spark.sql.files.maxPartitionBytes` (default 128 MB) splits files
  * only at parquet ROW-GROUP boundaries — a single-row-group file is
  * one task no matter the setting. The local testdata tables are
  * exactly that (one file, one row group), so sources.Tables mirrors
  * the big ones once into a 256 KB-row-group layout and the
  * TESTDATA-SCOPED profile `localBench` drops maxPartitionBytes to
  * 512 KB so the mirror actually splits. Plain `local` keeps the
  * defaults: on normal many-file inputs a 512 KB bin-pack would
  * explode task counts for nothing (ADVICE r8) — at 100 TB the input
  * arrives as many multi-row-group files and the defaults are right.
  */
object GraftSession {
  def build(master: String, shufflePartitions: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // keep managed tables (bucketing demos) out of the repo tree
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // r16 (guide §3.1/§9): let the planner pick shuffled-hash joins
      // when the build side fits, and let AQE rewrite sort-merge to
      // shuffled-hash when every post-shuffle partition is small —
      // measured 5-25% on the join-heavy families at sf0.1/32 with no
      // regressions; re-adjudicated r17 with driver-protocol pairs
      // (BENCH.md): SHJ-allowed won 13 of 14 rows, up to 1.9x
      // (dedup_minhash_lsh 1.93 vs 3.20 s). NOT a local-mode
      // constant: the hash join skips the sort at any scale; the
      // per-partition threshold is the memory guard and is
      // env-overridable for cluster profiles. Exposure note (ADVICE
      // r16): preferSortMergeJoin=false also affects STATIC planning
      // — a statically-selected SHJ can OOM a skewed build partition
      // where sort-merge would spill; the 64m threshold only guards
      // the AQE rewrite path. Spill-prone/skewed cluster profiles set
      // SPARK_GRAFT_PREFER_SMJ=true (static selection back to SMJ)
      // and keep the AQE threshold as the safe opt-in.
      .config("spark.sql.join.preferSortMergeJoin",
        sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "false"))
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        sys.env.getOrElse("SPARK_GRAFT_SHJ_LOCALMAP", "64m"))
      // the events table carries TIMESTAMP(NANOS), which Spark 4
      // rejects by default; set once here, not inside a table loader
      // (VERDICT r8 #4 — a loader must not mutate session state)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** local[n] with matching shuffle width and default scan splits —
    * the profile for arbitrary local data. */
  def local(cpus: Int): SparkSession = build(s"local[$cpus]", cpus)

  /** The Bench/Verify/TimeQuery profile: `local` plus scan splits
    * sized to the testdata mirror's 256 KB row groups (see the
    * scaladoc) and a 1 MB WRITE-side `parquet.block.size` so sink
    * outputs and index layouts written during these runs stay
    * splittable when read back at testdata scale. */
  def localBench(cpus: Int): SparkSession = {
    val s = local(cpus)
    // Split size is env-tunable for A/B. r17 measured a finer
    // 64 KB/64 KB split+row-group profile against this 512 KB/256 KB
    // one (the documents/embeddings scan stage is only 2-3 tasks
    // here): the dedup/corpus family was FLAT — its scan stage is
    // ~0.5 s of a 4 s query post-HashedGrams — while every
    // sub-second row paid task-scheduling overhead (text_jsd 1.21 →
    // 1.47 s, vec_quantize_int8 0.50 → 0.69 s), a net loss over 250
    // queries. The coarse profile stays; at sf1+ the same tables are
    // 10x bigger and split 10x wider with no knob change.
    s.conf.set("spark.sql.files.maxPartitionBytes",
      sys.env.getOrElse("SPARK_GRAFT_MAX_PART_BYTES", (512 * 1024).toString))
    s.sparkContext.hadoopConfiguration
      .setInt("parquet.block.size", 1024 * 1024)
    s
  }
}
