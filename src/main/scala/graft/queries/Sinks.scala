package graft.queries

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Lake source/sink round-trips: every query writes a table out in a
  * different format/layout to scratch space, reads it back, and
  * aggregates the read-back copy — so the oracle (which aggregates
  * the original) proves the write+read path is lossless.
  *
  * The reference's loader registry (conversadocs/bones.py:32-44) maps
  * one-to-one onto DataFrameReader formats; writers are the half a
  * batch engine adds.
  */
object Sinks {

  // private[graft]: layout tests derive scratch paths from here
  // instead of re-hardcoding the sanitization (ADVICE r11 pattern)
  private[graft] def scratch(s: SparkSession, dir: String, tag: String): String = {
    val id = dir.replaceAll("[^a-zA-Z0-9]", "_")
    s"/tmp/graft_sinks/$id/$tag"
  }

  /** Hive-style partitioned parquet lake write (partitionBy lang):
    * the layout that gives partition pruning on the read side. */
  val partitionedParquet: Q = Q(
    "sink_partitioned_parquet",
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
    val out = scratch(s, dir, "docs_by_lang")
    Tables.documents(s, dir).write
      .mode(SaveMode.Overwrite).partitionBy("lang").parquet(out)
    s.read.parquet(out)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy(col("lang"))
  }

  /** CSV round-trip with explicit schema on re-read. */
  val csvRoundtrip: Q = Q(
    "sink_csv_roundtrip",
    """SELECT o_orderstatus,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
    val out = scratch(s, dir, "orders_csv")
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        // fixed 2-dp text so the double->text->double trip is exact
        format_number(col("o_totalprice"), 2).as("o_totalprice_s"))
    orders.write.mode(SaveMode.Overwrite).option("header", "true").csv(out)
    s.read.option("header", "true").csv(out)
      .select(col("o_orderstatus"),
        regexp_replace(col("o_totalprice_s"), ",", "")
          .cast("decimal(18,2)").as("p"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("p")).cast("double").as("total"))
      .orderBy(col("o_orderstatus"))
  }

  /** JSON-lines round-trip (the interchange format of data pipelines). */
  val jsonRoundtrip: Q = Q(
    "sink_json_roundtrip",
    """SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS users
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    val out = scratch(s, dir, "events_json")
    Tables.events(s, dir).select(col("event_id"), col("user_id"), col("event_type"))
      .write.mode(SaveMode.Overwrite).json(out)
    s.read.json(out)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("users"))
      .orderBy(col("event_type"))
  }

  /** ORC round-trip — the other columnar lake format. */
  val orcRoundtrip: Q = Q(
    "sink_orc_roundtrip",
    """SELECT l_returnflag, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    val out = scratch(s, dir, "lineitem_orc")
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_quantity"))
      .write.mode(SaveMode.Overwrite).orc(out)
    s.read.orc(out)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
      .orderBy(col("l_returnflag"))
  }

  /** Small-file management: re-write a fragmented table into
    * size-bounded files (maxRecordsPerFile + repartition) — the
    * compaction job every 100 TB lake runs; the read-back aggregate
    * proves losslessness, FileSpec asserts the file layout. */
  val compaction: Q = Q(
    "sink_compaction",
    """SELECT COUNT(*) AS n_rows, CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM documents""".stripMargin) { (s, dir) =>
    val frag = scratch(s, dir, "docs_fragmented")
    val compact = scratch(s, dir, "docs_compact")
    val docs = Tables.documents(s, dir)
    docs.repartition(64).write.mode(SaveMode.Overwrite).parquet(frag) // 64 shards
    s.read.parquet(frag)
      .repartition(2)
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", 1000)
      .parquet(compact)
    s.read.parquet(compact)
      .agg(count(lit(1)).as("n_rows"), sum(col("n_chars")).as("total_chars"))
  }

  /** XML round-trip via the Spark 4 built-in xml source (spark-xml
    * merged into core) — the remaining interchange format of the
    * reference's loader registry family. */
  val xmlRoundtrip: Q = Q(
    "sink_xml_roundtrip",
    """SELECT n_name, COUNT(*) AS n_suppliers,
      |  CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, dir) =>
    val out = scratch(s, dir, "supplier_xml")
    Tables.supplier(s, dir)
      .select(col("s_suppkey"), col("s_nationkey"),
        // fixed 2-dp text so the double->xml-text->double trip is exact
        format_number(col("s_acctbal"), 2).as("s_acctbal_s"))
      .write.mode(SaveMode.Overwrite)
      .option("rootTag", "suppliers").option("rowTag", "supplier")
      .format("xml").save(out)
    s.read.option("rowTag", "supplier").format("xml").load(out)
      .join(Tables.nation(s, dir),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(regexp_replace(col("s_acctbal_s").cast("string"), ",", "")
          .cast("decimal(18,2)")).cast("double").as("total_bal"))
      .orderBy(col("n_name"))
  }

  /** Z-order clustered rewrite (operators.ZOrder): lineitem laid out
    * on the Morton curve of (l_partkey, l_suppkey) so per-file min/max
    * statistics prune scans filtered on EITHER key — the
    * multi-dimensional data-skipping layout (Delta OPTIMIZE ZORDER
    * shape) a hive partitioning cannot give. The read-back aggregate
    * proves the rewrite is lossless (content identical to the
    * source projection); PlanSpec asserts the clustering
    * property itself — mean per-file key spans collapse to tile
    * width on BOTH dimensions vs a plain shuffled write. */
  val zorder: Q = Q(
    "sink_zorder",
    """SELECT l_returnflag, COUNT(*) AS n,
      |  CAST(SUM(l_partkey) AS BIGINT) AS part_sum,
      |  CAST(SUM(l_suppkey) AS BIGINT) AS supp_sum,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    val out = scratch(s, dir, "lineitem_zorder")
    graft.operators.ZOrder.clusteredWrite(
      Tables.lineitem(s, dir).select(col("l_partkey"), col("l_suppkey"),
        col("l_returnflag"), col("l_quantity")),
      "l_partkey", "l_suppkey", out, 16)
    s.read.parquet(out)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_partkey")).as("part_sum"),
        sum(col("l_suppkey")).as("supp_sum"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
      .orderBy(col("l_returnflag"))
  }

  /** Versioned snapshot publish + committed-latest read-back
    * (operators.Snapshots — the minimal Iceberg/Delta marker
    * protocol): each run publishes the lineitem projection as a new
    * immutable snapshot, retires old versions past a 4-deep retention
    * (vacuum — the nightly job), and aggregates what a READER
    * resolves, so the oracle proves the publish→resolve→read path is
    * lossless. Torn-write invisibility, time travel, and vacuum law
    * are spec-graded (SnapshotSpec). */
  val snapshot: Q = Q(
    "sink_snapshot",
    """SELECT l_returnflag, COUNT(*) AS n,
      |  CAST(SUM(l_orderkey) AS BIGINT) AS key_sum,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    val root = scratch(s, dir, "lineitem_snaps")
    graft.operators.Snapshots.publish(
      Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_returnflag"),
        col("l_quantity")),
      root)
    graft.operators.Snapshots.vacuum(root, keep = 4)
    graft.operators.Snapshots.read(s, root)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_orderkey")).as("key_sum"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
      .orderBy(col("l_returnflag"))
  }

  /** MERGE INTO on the versioned lake table
    * (Snapshots.publishMerge): publish a base snapshot of orders,
    * merge one batch of upserts (keys ≡ 3 mod 10 re-priced 2x, keys ≡
    * 7 mod 100 mirrored as NEW negative-key rows) and tombstones
    * (keys ≡ 6 mod 10), and aggregate what a reader resolves — the
    * oracle replays the merge relationally, so matched-replace,
    * append, and delete semantics are all hash-gated. Each run starts
    * from a fresh table root (the merge chain would otherwise
    * compound across runs); the base version stays time-travelable
    * (SnapshotSpec). */
  val snapshotMerge: Q = Q(
    "sink_snapshot_merge",
    """WITH base AS (
      |  SELECT o_orderkey AS k, o_orderstatus AS st,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS p
      |  FROM orders),
      |up AS (
      |  SELECT k, st, CAST(p * 2 AS DECIMAL(18,2)) AS p
      |  FROM base WHERE k % 10 = 3
      |  UNION ALL
      |  SELECT -k, st, p FROM base WHERE k % 100 = 7),
      |del AS (SELECT k FROM base WHERE k % 10 = 6),
      |merged AS (
      |  SELECT * FROM base
      |  WHERE k NOT IN (SELECT k FROM up)
      |    AND k NOT IN (SELECT k FROM del)
      |  UNION ALL SELECT * FROM up)
      |SELECT st, COUNT(*) AS n, CAST(SUM(p) AS DOUBLE) AS total
      |FROM merged GROUP BY st ORDER BY st""".stripMargin) { (s, dir) =>
    val root = scratch(s, dir, "orders_snap_merge")
    graft.operators.LakeFs.rmTree(root)
    val base = Tables.orders(s, dir).select(
      col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
      col("o_totalprice").cast("decimal(18,2)").as("p"))
    graft.operators.Snapshots.publish(base, root)
    val up = base.filter(col("k") % 10 === 3)
      .withColumn("p", (col("p") * 2).cast("decimal(18,2)"))
      .unionByName(base.filter(col("k") % 100 === 7)
        .withColumn("k", -col("k")))
    graft.operators.Snapshots.publishMerge(s, root, "k",
      up, base.filter(col("k") % 10 === 6).select(col("k")))
    graft.operators.Snapshots.read(s, root)
      .groupBy(col("st"))
      .agg(count(lit(1)).as("n"),
        sum(col("p")).cast("double").as("total"))
      .orderBy(col("st"))
  }

  /** MERGE-ON-READ over the append log (Snapshots.readLogMerged):
    * append a base batch of orders, an upsert batch (keys ≡ 3 mod 10
    * re-priced 2x), a tombstone batch (keys ≡ 6 mod 10,
    * publishDeletes), then a SECOND upsert batch (keys ≡ 3 mod 20
    * re-priced 4x — overriding the first batch for those keys), and
    * aggregate what the merge-on-read reader resolves. Latest version
    * wins per key via ONE argmax-struct aggregation (a single shuffle
    * on the merge key, no window sort) — the read a change-heavy
    * table uses between compactions, while every append stayed
    * O(batch). The oracle replays the same latest-wins chain
    * relationally, so upsert-override, tombstone-drop, and
    * append-only-base semantics are all hash-gated; compaction
    * equivalence (compactLogMerged ≡ this read) is spec-pinned
    * (SnapshotSpec). */
  val snapshotMor: Q = Q(
    "sink_snapshot_mor",
    """WITH base AS (
      |  SELECT o_orderkey AS k, o_orderstatus AS st,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS p
      |  FROM orders),
      |merged AS (
      |  SELECT k, st,
      |    CASE WHEN k % 20 = 3 THEN CAST(p * 4 AS DECIMAL(18,2))
      |         WHEN k % 10 = 3 THEN CAST(p * 2 AS DECIMAL(18,2))
      |         ELSE p END AS p
      |  FROM base WHERE k % 10 <> 6)
      |SELECT st, COUNT(*) AS n, CAST(SUM(p) AS DOUBLE) AS total
      |FROM merged GROUP BY st ORDER BY st""".stripMargin) { (s, dir) =>
    val root = scratch(s, dir, "orders_snap_mor")
    graft.operators.LakeFs.rmTree(root)
    val base = Tables.orders(s, dir).select(
      col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
      col("o_totalprice").cast("decimal(18,2)").as("p"))
    graft.operators.Snapshots.publishAppend(base, root)
    graft.operators.Snapshots.publishAppend(
      base.filter(col("k") % 10 === 3)
        .withColumn("p", (col("p") * 2).cast("decimal(18,2)")), root)
    graft.operators.Snapshots.publishDeletes(
      base.filter(col("k") % 10 === 6).select(col("k")), root)
    graft.operators.Snapshots.publishAppend(
      base.filter(col("k") % 20 === 3)
        .withColumn("p", (col("p") * 4).cast("decimal(18,2)")), root)
    graft.operators.Snapshots.readLogMerged(s, root, "k")
      .groupBy(col("st"))
      .agg(count(lit(1)).as("n"),
        sum(col("p")).cast("double").as("total"))
      .orderBy(col("st"))
  }

  /** Manifest-based data skipping on the snapshot table
    * (Snapshots.publishWithStats + readPruned / operators.SnapStats):
    * lineitem is clustered on l_orderkey (range partition + in-file
    * sort → tight per-file ranges), published with a per-file min/max
    * manifest built from footer reads only, and a selective key-range
    * scan resolves through the manifest — files provably outside the
    * range never enter the scan list (the cost that matters at 100k
    * files), the residual filter stays in the plan. The oracle is the
    * plain relational filter, so pruned-read == filter semantics are
    * hash-gated; the strictly-fewer-files property and the
    * missing-stats-keeps-file law are spec-graded (SnapshotSpec). */
  val snapshotPrune: Q = Q(
    "sink_snapshot_prune",
    """SELECT l_returnflag, COUNT(*) AS n,
      |  CAST(SUM(l_orderkey) AS BIGINT) AS key_sum,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      |FROM lineitem WHERE l_orderkey BETWEEN 1000 AND 3000
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    val root = scratch(s, dir, "lineitem_snap_prune")
    graft.operators.LakeFs.rmTree(root)
    val clustered = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
      .repartitionByRange(8, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
    graft.operators.Snapshots.publishWithStats(
      clustered, root, Seq("l_orderkey"))
    graft.operators.Snapshots.readPruned(s, root, "l_orderkey", 1000L, 3000L)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_orderkey")).as("key_sum"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
      .orderBy(col("l_returnflag"))
  }

  /** Per-file Bloom point lookup on the snapshot table
    * (Snapshots.addBloom + readPoint / SnapStats.writeBloom): the
    * snapshot is clustered on l_orderkey, so every file spans nearly
    * the FULL l_partkey range and the min/max manifest cannot prune a
    * partkey probe — the Bloom index (one mergeable BloomAgg pass
    * grouped by input_file_name at publish time) rejects the files
    * that provably cannot hold the key, and the exact equality filter
    * stays in the plan so false positives only cost I/O, never rows.
    * The oracle is the plain relational equality filter; the
    * fewer-files and no-false-drop laws are spec-graded
    * (SnapshotSpec). */
  val snapshotBloom: Q = Q(
    "sink_snapshot_bloom",
    """SELECT l_returnflag, COUNT(*) AS n,
      |  CAST(SUM(l_orderkey) AS BIGINT) AS key_sum
      |FROM lineitem WHERE l_partkey = 100
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    val root = scratch(s, dir, "lineitem_snap_bloom")
    graft.operators.LakeFs.rmTree(root)
    val clustered = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_returnflag"))
      .repartitionByRange(8, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
    graft.operators.Snapshots.publishWithStats(
      clustered, root, Seq("l_orderkey"))
    graft.operators.Snapshots.addBloom(s, root, "l_partkey",
      expectedPerFile = 200000L)
    graft.operators.Snapshots.readPoint(s, root, "l_partkey", 100L)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_orderkey")).as("key_sum"))
      .orderBy(col("l_returnflag"))
  }

  /** CHANGE DATA FEED on the MoR log (Snapshots.readChanges): the
    * same deterministic op chain as sink_snapshot_mor lands on the
    * log, and the query reads the NET row changes between the base
    * version and the latest — Delta-CDF change types (update rows
    * carry both images, a key upserted twice surfaces once with its
    * final image, unchanged keys emit nothing). Cost is the two
    * merged states (one argmax aggregation each) plus ONE full-outer
    * equi-join on the key — no window sort. The oracle derives the
    * identical diff relationally from the batch definitions, so
    * insert/delete/update classification and both images are
    * hash-gated; collapse laws (upsert-twice, insert-then-delete)
    * are spec-pinned (SnapshotSpec). */
  val snapshotCdf: Q = Q(
    "sink_snapshot_cdf",
    """WITH base AS (
      |  SELECT o_orderkey AS k, CAST(o_totalprice AS DECIMAL(18,2)) AS p
      |  FROM orders),
      |diff AS (
      |  SELECT 'delete' AS change_type, k, p FROM base WHERE k % 10 = 6
      |  UNION ALL
      |  SELECT 'update_preimage', k, p FROM base WHERE k % 10 = 3
      |  UNION ALL
      |  SELECT 'update_postimage', k,
      |    CASE WHEN k % 20 = 3 THEN CAST(p * 4 AS DECIMAL(18,2))
      |         ELSE CAST(p * 2 AS DECIMAL(18,2)) END
      |  FROM base WHERE k % 10 = 3)
      |SELECT change_type, COUNT(*) AS n, CAST(SUM(p) AS DOUBLE) AS total
      |FROM diff GROUP BY change_type ORDER BY change_type""".stripMargin) { (s, dir) =>
    val root = scratch(s, dir, "orders_snap_cdf")
    graft.operators.LakeFs.rmTree(root)
    val base = Tables.orders(s, dir).select(
      col("o_orderkey").as("k"),
      col("o_totalprice").cast("decimal(18,2)").as("p"))
    val from = graft.operators.Snapshots.publishAppend(base, root)
    graft.operators.Snapshots.publishAppend(
      base.filter(col("k") % 10 === 3)
        .withColumn("p", (col("p") * 2).cast("decimal(18,2)")), root)
    graft.operators.Snapshots.publishDeletes(
      base.filter(col("k") % 10 === 6).select(col("k")), root)
    val to = graft.operators.Snapshots.publishAppend(
      base.filter(col("k") % 20 === 3)
        .withColumn("p", (col("p") * 4).cast("decimal(18,2)")), root)
    graft.operators.Snapshots.readChanges(s, root, "k", from, to)
      .groupBy(col("change_type"))
      .agg(count(lit(1)).as("n"), sum(col("p")).cast("double").as("total"))
      .orderBy(col("change_type"))
  }

  /** OPTIMIZE ZORDER on the append log (Snapshots.optimize): four
    * interleaved fragmented appends (every batch spans the full key
    * range — the worst layout for data skipping) are folded into ONE
    * z-order-clustered compacted version carrying a per-file min/max
    * manifest over (l_partkey, l_suppkey), and a selective partkey
    * range scan resolves through it — compaction, multi-dimensional
    * clustering, and skipping stats in one data pass, the nightly
    * lake job. The oracle is the plain relational filter, so
    * pruned-read == filter is hash-gated; content preservation,
    * subsumption, and append-stacking are spec-pinned
    * (SnapshotSpec). */
  val snapshotOptimize: Q = Q(
    "sink_snapshot_optimize",
    """SELECT l_returnflag, COUNT(*) AS n,
      |  CAST(SUM(l_partkey) AS BIGINT) AS part_sum,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      |FROM lineitem WHERE l_partkey BETWEEN 100 AND 300
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    val root = scratch(s, dir, "lineitem_snap_opt")
    graft.operators.LakeFs.rmTree(root)
    val src = Tables.lineitem(s, dir)
    (0 until 4).foreach { b =>
      graft.operators.Snapshots.publishAppend(
        src.filter(pmod(col("l_orderkey"), lit(4)) === b)
          .select(col("l_partkey"), col("l_suppkey"),
            col("l_returnflag"), col("l_quantity")), root)
    }
    graft.operators.Snapshots.optimize(s, root, "l_partkey", "l_suppkey")
    graft.operators.Snapshots.readPruned(s, root, "l_partkey", 100L, 300L)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_partkey")).as("part_sum"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
      .orderBy(col("l_returnflag"))
  }

  /** DELETION-VECTOR merge-on-read (Snapshots position deletes — the
    * Delta-DV/Iceberg-v2 shape for KEYLESS tables): append orders as
    * a two-batch raw log, address the doomed rows POSITIONALLY
    * (readLogPos → `_file`/`_pos`, no key column involved — the GDPR
    * point-delete on a keyless event log), publish the vector
    * (O(batch), no copy-on-write rewrite), and aggregate what the DV
    * reader resolves. The oracle replays the delete as a WHERE — the
    * hash proves position addressing deleted exactly the intended
    * rows and nothing else. The CoW-equality law, fold
    * (compactLogDv), travel, and guard surface are spec-graded
    * (SnapshotSpec). */
  val snapshotDv: Q = Q(
    "sink_snapshot_dv",
    """SELECT o_orderstatus AS st, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders WHERE o_orderkey % 10 <> 6
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val root = scratch(s, dir, "orders_snap_dv")
    graft.operators.LakeFs.rmTree(root)
    val base = Tables.orders(s, dir).select(
      col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
      col("o_totalprice").cast("decimal(18,2)").as("p"))
    graft.operators.Snapshots.publishAppend(
      base.filter(col("k") % 2 === 0), root)
    graft.operators.Snapshots.publishAppend(
      base.filter(col("k") % 2 === 1), root)
    val pos = graft.operators.Snapshots.readLogPos(s, root)
    graft.operators.Snapshots.publishPositionDeletes(
      pos.filter(col("k") % 10 === 6).select(col("_file"), col("_pos")),
      root)
    graft.operators.Snapshots.readLogDv(s, root)
      .groupBy(col("st"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("key_sum"),
        sum(col("p")).cast("double").as("total"))
      .orderBy(col("st"))
  }

  /** Scan THROUGH the graftsnap DSv2 connector (the lake-table batch
    * surface): publish lineitem as a two-batch append log, then read
    * it back with `format("graftsnap")` — projection pruned into the
    * page reads, the filter evaluated over VECTORIZED batches (the
    * columnar decode path, default since r14; `columnar=false` is the
    * row-path A/B knob the parity spec and bench delta use). The
    * oracle aggregates the raw table, so window resolution
    * (two-version union) + pruned columnar decode are both under the
    * hash. Quantities are integer-valued doubles in this corpus —
    * cast to BIGINT for exact sums (the graftsnap flat subset carries
    * no decimals by design: ingest logs are primitive-typed). */
  val graftsnapScan: Q = Q(
    "sink_graftsnap_scan",
    """SELECT l_returnflag, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
      |  CAST(SUM(l_orderkey) AS BIGINT) AS key_sum
      |FROM lineitem WHERE l_linenumber <= 4
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    val root = scratch(s, dir, "lineitem_graftsnap")
    graft.operators.LakeFs.rmTree(root)
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"),
      col("l_linenumber"), col("l_returnflag"),
      col("l_quantity").cast("long").as("qty_c"))
    graft.operators.Snapshots.publishAppend(
      li.filter(col("l_orderkey") % 2 === 0), root)
    graft.operators.Snapshots.publishAppend(
      li.filter(col("l_orderkey") % 2 === 1), root)
    s.read.format("graftsnap").load(root)
      .filter(col("l_linenumber") <= 4)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("qty_c")).as("qty_sum"),
        sum(col("l_orderkey")).as("key_sum"))
      .orderBy(col("l_returnflag"))
  }

  val all: Seq[Q] = Seq(partitionedParquet, csvRoundtrip, jsonRoundtrip,
    orcRoundtrip, compaction, xmlRoundtrip, zorder, snapshot, snapshotMerge,
    snapshotMor, snapshotPrune, snapshotBloom, snapshotCdf, snapshotOptimize,
    graftsnapScan, snapshotDv)
}
