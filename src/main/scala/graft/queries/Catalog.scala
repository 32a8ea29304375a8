package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.LakeFs

/** Pure-SQL queries through the lake's DSv2 TableCatalog
  * (sources.GraftCatalog): the whole flow — CREATE TABLE, INSERT
  * INTO, SELECT with VERSION AS OF time travel — runs as SQL text
  * against `graftlake.<table>`, no DataFrame calls on the data path.
  * The oracle reproduces the versions as WHERE-filtered subsets of
  * the raw table (version 1 = the first INSERT's slice, the current
  * window = both slices), so a hash match proves the catalog's
  * resolution (window union + as-of pinning) end to end. */
object Catalog {

  /** Stable lake root: the catalog instance is cached per session
    * under its name, so the root must not vary by sfDir — tables are
    * keyed by sfDir instead. */
  private val LakeRoot = "/tmp/graft_sqlcat_lake"

  private def ensureCatalog(s: SparkSession): Unit = {
    s.conf.set("spark.sql.catalog.graftlake",
      "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.graftlake.root", LakeRoot)
  }

  /** CREATE + 2×INSERT INTO + time-travel SELECT, all SQL. The two
    * INSERTs land as committed snapshot versions 1 and 2; the final
    * query joins the current reader window's aggregate against the
    * VERSION AS OF 1 aggregate, so both resolutions are under the
    * hash. The table is wiped per run — versions are deterministic.
    * (Statuses present only in the %3=1 slice keep n_v1 NULL through
    * the left join; the oracle's LEFT JOIN nulls identically.) */
  val sqlCatalog: Q = Q(
    "q_sql_catalog",
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS p
      |  FROM orders),
      |cur AS (
      |  SELECT o_orderstatus, COUNT(*) AS n_all,
      |    CAST(SUM(p) AS DOUBLE) AS total
      |  FROM base WHERE o_orderkey % 3 IN (0, 1) GROUP BY 1),
      |v1 AS (
      |  SELECT o_orderstatus, COUNT(*) AS n_v1
      |  FROM base WHERE o_orderkey % 3 = 0 GROUP BY 1)
      |SELECT cur.o_orderstatus, cur.n_all, v1.n_v1, cur.total
      |FROM cur LEFT JOIN v1 USING (o_orderstatus)
      |ORDER BY 1""".stripMargin) { (s, dir) =>
    ensureCatalog(s)
    val t = "graftlake.ord_" + graft.queries.Vectors.sanitizeDir(dir)
    LakeFs.rmTree(LakeRoot + "/ord_" + graft.queries.Vectors.sanitizeDir(dir))
    s.sql(s"CREATE TABLE $t (o_orderkey BIGINT, o_orderstatus STRING, " +
      "p DECIMAL(18,2))")
    def insert(residue: Int): Unit = s.sql(
      s"""INSERT INTO $t
         |SELECT o_orderkey, o_orderstatus,
         |  CAST(o_totalprice AS DECIMAL(18,2))
         |FROM parquet.`$dir/orders.parquet`
         |WHERE o_orderkey % 3 = $residue""".stripMargin)
    insert(0) // -> committed version 1
    insert(1) // -> committed version 2
    s.sql(
      s"""SELECT cur.o_orderstatus, cur.n_all, v1.n_v1, cur.total
         |FROM (SELECT o_orderstatus, COUNT(*) AS n_all,
         |        CAST(SUM(p) AS DOUBLE) AS total
         |      FROM $t GROUP BY o_orderstatus) cur
         |LEFT JOIN (SELECT o_orderstatus, COUNT(*) AS n_v1
         |           FROM $t VERSION AS OF 1 GROUP BY o_orderstatus) v1
         |USING (o_orderstatus)
         |ORDER BY o_orderstatus""".stripMargin)
  }

  /** The SQL write surface beyond INSERT, under the hash: CREATE +
    * INSERT + `DELETE FROM … WHERE` (filter-algebra condition →
    * copy-on-write publish) + TRUNCATE-able history — the final
    * SELECT joins post-delete state against the pre-delete VERSION AS
    * OF, so both the delete's row selection AND the preserved history
    * are hash-checked. Oracle replays the delete as WHERE NOT. */
  val sqlDelete: Q = Q(
    "q_sql_delete",
    """WITH base AS (
      |  SELECT o_orderkey AS k, o_orderstatus AS st,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS p
      |  FROM orders),
      |pre AS (
      |  SELECT st, COUNT(*) AS n_pre FROM base GROUP BY 1),
      |post AS (
      |  SELECT st, COUNT(*) AS n_post, CAST(SUM(p) AS DOUBLE) AS total
      |  FROM base
      |  WHERE NOT (st = 'F' AND k < 75000) GROUP BY 1)
      |SELECT post.st, post.n_post, pre.n_pre, post.total
      |FROM post JOIN pre USING (st)
      |ORDER BY st""".stripMargin) { (s, dir) =>
    ensureCatalog(s)
    val id = graft.queries.Vectors.sanitizeDir(dir)
    val t = s"graftlake.del_$id"
    LakeFs.rmTree(s"$LakeRoot/del_$id")
    s.sql(s"CREATE TABLE $t (k BIGINT, st STRING, p DECIMAL(18,2))")
    s.sql(
      s"""INSERT INTO $t
         |SELECT o_orderkey, o_orderstatus,
         |  CAST(o_totalprice AS DECIMAL(18,2))
         |FROM parquet.`$dir/orders.parquet`""".stripMargin)
    s.sql(s"DELETE FROM $t WHERE st = 'F' AND k < 75000")
    s.sql(
      s"""SELECT post.st, post.n_post, pre.n_pre, post.total
         |FROM (SELECT st, COUNT(*) AS n_post,
         |        CAST(SUM(p) AS DOUBLE) AS total
         |      FROM $t GROUP BY st) post
         |JOIN (SELECT st, COUNT(*) AS n_pre
         |      FROM $t VERSION AS OF 1 GROUP BY st) pre
         |USING (st)
         |ORDER BY st""".stripMargin)
  }

  /** SQL UPDATE under the hash: CREATE + INSERT + `UPDATE … SET …
    * WHERE` (expression assignments — concat / arithmetic, beyond the
    * DELETE Filter algebra) + the preserved pre-update version. The
    * oracle replays the update as a CASE projection, so the row
    * selection AND the assignment expressions are both hash-checked,
    * with the VERSION AS OF join proving history stayed intact. */
  val sqlUpdate: Q = Q(
    "q_sql_update",
    """WITH base AS (
      |  SELECT o_orderkey AS k, o_orderstatus AS st,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS p
      |  FROM orders),
      |upd AS (
      |  SELECT k,
      |    CASE WHEN st = 'O' AND k % 10 = 0 THEN st || '_rush' ELSE st
      |      END AS st,
      |    CASE WHEN st = 'O' AND k % 10 = 0
      |      THEN CAST(p * 2 AS DECIMAL(18,2)) ELSE p END AS p
      |  FROM base),
      |pre AS (
      |  SELECT st, COUNT(*) AS n_pre FROM base GROUP BY 1),
      |post AS (
      |  SELECT st, COUNT(*) AS n_post, CAST(SUM(p) AS DOUBLE) AS total
      |  FROM upd GROUP BY 1)
      |SELECT post.st, post.n_post, pre.n_pre, post.total
      |FROM post LEFT JOIN pre USING (st)
      |ORDER BY st""".stripMargin) { (s, dir) =>
    ensureCatalog(s)
    val id = graft.queries.Vectors.sanitizeDir(dir)
    val t = s"graftlake.upd_$id"
    LakeFs.rmTree(s"$LakeRoot/upd_$id")
    s.sql(s"CREATE TABLE $t (k BIGINT, st STRING, p DECIMAL(18,2))")
    s.sql(
      s"""INSERT INTO $t
         |SELECT o_orderkey, o_orderstatus,
         |  CAST(o_totalprice AS DECIMAL(18,2))
         |FROM parquet.`$dir/orders.parquet`""".stripMargin)
    s.sql(s"UPDATE $t SET st = st || '_rush', " +
      s"p = CAST(p * 2 AS DECIMAL(18,2)) WHERE st = 'O' AND k % 10 = 0")
    s.sql(
      s"""SELECT post.st, post.n_post, pre.n_pre, post.total
         |FROM (SELECT st, COUNT(*) AS n_post,
         |        CAST(SUM(p) AS DOUBLE) AS total
         |      FROM $t GROUP BY st) post
         |LEFT JOIN (SELECT st, COUNT(*) AS n_pre
         |           FROM $t VERSION AS OF 1 GROUP BY st) pre
         |USING (st)
         |ORDER BY st""".stripMargin)
  }

  /** SQL MERGE INTO under the hash: the full three-branch merge —
    * matched-delete, matched-update, not-matched-insert, and
    * not-matched-by-source-update — driven by a source built from the
    * same raw table, then aggregated. The oracle decomposes the merge
    * into the equivalent CASE/anti-join algebra over the raw rows, so
    * every branch's row routing and value expressions sit under one
    * hash. Source = customers 0..14999 shifted; target = customers
    * (keyed by c_custkey). */
  val sqlMerge: Q = Q(
    "q_sql_merge",
    """WITH tgt AS (
      |  SELECT c_custkey AS k, c_mktsegment AS seg,
      |    CAST(c_acctbal AS DECIMAL(18,2)) AS bal
      |  FROM customer),
      |src AS (
      |  SELECT c_custkey + 5 AS k, c_mktsegment AS seg,
      |    CAST(c_acctbal AS DECIMAL(18,2)) AS bal
      |  FROM customer WHERE c_custkey % 2 = 0),
      |merged AS (
      |  SELECT t.k,
      |    CASE WHEN s.k IS NOT NULL THEN 'merged_' || s.seg
      |         ELSE 'stale_' || t.seg END AS seg,
      |    CASE WHEN s.k IS NOT NULL THEN s.bal ELSE t.bal END AS bal
      |  FROM tgt t LEFT JOIN src s ON t.k = s.k
      |  WHERE NOT (s.k IS NOT NULL AND s.bal < 0)
      |  UNION ALL
      |  SELECT s.k, 'new_' || s.seg AS seg, s.bal
      |  FROM src s LEFT JOIN tgt t ON s.k = t.k
      |  WHERE t.k IS NULL AND s.bal >= 0)
      |SELECT SUBSTR(seg, 1, 6) AS tag, COUNT(*) AS n,
      |  CAST(SUM(bal) AS DOUBLE) AS total
      |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    ensureCatalog(s)
    val id = graft.queries.Vectors.sanitizeDir(dir)
    val t = s"graftlake.mrg_$id"
    LakeFs.rmTree(s"$LakeRoot/mrg_$id")
    s.sql(s"CREATE TABLE $t (k BIGINT, seg STRING, bal DECIMAL(18,2))")
    s.sql(
      s"""INSERT INTO $t
         |SELECT c_custkey, c_mktsegment, CAST(c_acctbal AS DECIMAL(18,2))
         |FROM parquet.`$dir/customer.parquet`""".stripMargin)
    s.sql(
      s"""MERGE INTO $t t
         |USING (SELECT c_custkey + 5 AS k, c_mktsegment AS seg,
         |         CAST(c_acctbal AS DECIMAL(18,2)) AS bal
         |       FROM parquet.`$dir/customer.parquet`
         |       WHERE c_custkey % 2 = 0) s
         |ON t.k = s.k
         |WHEN MATCHED AND s.bal < 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET seg = 'merged_' || s.seg,
         |  bal = s.bal
         |WHEN NOT MATCHED AND s.bal >= 0 THEN
         |  INSERT (k, seg, bal) VALUES (s.k, 'new_' || s.seg, s.bal)
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET
         |  seg = 'stale_' || seg""".stripMargin)
    s.sql(
      s"""SELECT SUBSTR(seg, 1, 6) AS tag, COUNT(*) AS n,
         |  CAST(SUM(bal) AS DOUBLE) AS total
         |FROM $t GROUP BY SUBSTR(seg, 1, 6) ORDER BY tag""".stripMargin)
  }

  /** SQL RESTORE + SHALLOW CLONE under the hash: CREATE + 2×INSERT,
    * `RESTORE TABLE … TO VERSION AS OF 1` (the bad second batch is
    * subsumed by a NEW version — history below stays travelable),
    * then `CREATE TABLE … SHALLOW CLONE` off the restored state and a
    * divergent INSERT into the clone. The final SELECT joins the
    * restored current state, the PRE-restore history (VERSION AS OF
    * 2), and the clone — so restore's republication, history
    * preservation, zero-copy clone resolution, AND clone-write
    * isolation all sit under one hash. Oracle replays each as a
    * WHERE-subset of the raw table (cur = %3=0, hist = %3∈{0,1},
    * clone = %3∈{0,2}). */
  val sqlRestore: Q = Q(
    "q_sql_restore",
    """WITH base AS (
      |  SELECT o_orderkey AS k, o_orderstatus AS st,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS p
      |  FROM orders),
      |cur AS (
      |  SELECT st, COUNT(*) AS n_cur FROM base
      |  WHERE k % 3 = 0 GROUP BY 1),
      |hist AS (
      |  SELECT st, COUNT(*) AS n_hist FROM base
      |  WHERE k % 3 IN (0, 1) GROUP BY 1),
      |cl AS (
      |  SELECT st, COUNT(*) AS n_clone, CAST(SUM(p) AS DOUBLE) AS total
      |  FROM base WHERE k % 3 IN (0, 2) GROUP BY 1)
      |SELECT cur.st, cur.n_cur, hist.n_hist, cl.n_clone, cl.total
      |FROM cur JOIN hist USING (st) JOIN cl USING (st)
      |ORDER BY st""".stripMargin) { (s, dir) =>
    ensureCatalog(s)
    val id = graft.queries.Vectors.sanitizeDir(dir)
    val t = s"graftlake.rst_$id"
    val c = s"graftlake.rstc_$id"
    LakeFs.rmTree(s"$LakeRoot/rst_$id")
    LakeFs.rmTree(s"$LakeRoot/rstc_$id")
    s.sql(s"CREATE TABLE $t (k BIGINT, st STRING, p DECIMAL(18,2))")
    def insert(tbl: String, residue: Int): Unit = s.sql(
      s"""INSERT INTO $tbl
         |SELECT o_orderkey, o_orderstatus,
         |  CAST(o_totalprice AS DECIMAL(18,2))
         |FROM parquet.`$dir/orders.parquet`
         |WHERE o_orderkey % 3 = $residue""".stripMargin)
    insert(t, 0) // -> committed version 1 (the good batch)
    insert(t, 1) // -> committed version 2 (the "bad" batch)
    s.sql(s"RESTORE TABLE $t TO VERSION AS OF 1")
    s.sql(s"CREATE TABLE $c SHALLOW CLONE $t")
    insert(c, 2) // diverges the clone; must never reach the source
    s.sql(
      s"""SELECT cur.st, cur.n_cur, hist.n_hist, cl.n_clone, cl.total
         |FROM (SELECT st, COUNT(*) AS n_cur FROM $t GROUP BY st) cur
         |JOIN (SELECT st, COUNT(*) AS n_hist
         |      FROM $t VERSION AS OF 2 GROUP BY st) hist
         |USING (st)
         |JOIN (SELECT st, COUNT(*) AS n_clone,
         |        CAST(SUM(p) AS DOUBLE) AS total
         |      FROM $c GROUP BY st) cl
         |USING (st)
         |ORDER BY st""".stripMargin)
  }

  /** PARTITIONED BY under the hash: CREATE … PARTITIONED BY (st) —
    * the hive layout every date/source-partitioned 100 TB table ships
    * with — + 2×INSERT (each version lays its own `st=…` dirs), then
    * a SELECT whose WHERE is on the PARTITION column (pruned to the
    * matching dirs before any footer opens — CatalogSpec pins the
    * file set) joined against a VERSION AS OF 1 aggregate, so
    * partition-value restoration, the window union, pruning
    * correctness, AND time travel over partitioned versions all sit
    * under one hash. The oracle replays both as WHERE-subsets. */
  val sqlPartitioned: Q = Q(
    "q_sql_partitioned",
    """WITH base AS (
      |  SELECT o_orderkey AS k, o_orderstatus AS st,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS p
      |  FROM orders),
      |cur AS (
      |  SELECT st, COUNT(*) AS n_cur, CAST(SUM(p) AS DOUBLE) AS total
      |  FROM base WHERE st IN ('F', 'O') GROUP BY 1),
      |v1 AS (
      |  SELECT st, COUNT(*) AS n_v1 FROM base
      |  WHERE st IN ('F', 'O') AND k % 2 = 0 GROUP BY 1)
      |SELECT cur.st, cur.n_cur, v1.n_v1, cur.total
      |FROM cur JOIN v1 USING (st)
      |ORDER BY st""".stripMargin) { (s, dir) =>
    ensureCatalog(s)
    val id = graft.queries.Vectors.sanitizeDir(dir)
    val t = s"graftlake.prt_$id"
    LakeFs.rmTree(s"$LakeRoot/prt_$id")
    s.sql(s"CREATE TABLE $t (k BIGINT, st STRING, p DECIMAL(18,2)) " +
      "PARTITIONED BY (st)")
    def insert(residue: Int): Unit = s.sql(
      s"""INSERT INTO $t
         |SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)),
         |  o_orderstatus
         |FROM parquet.`$dir/orders.parquet`
         |WHERE o_orderkey % 2 = $residue""".stripMargin)
    insert(0) // -> version 1, its own st=… layout
    insert(1) // -> version 2
    s.sql(
      s"""SELECT cur.st, cur.n_cur, v1.n_v1, cur.total
         |FROM (SELECT st, COUNT(*) AS n_cur,
         |        CAST(SUM(p) AS DOUBLE) AS total
         |      FROM $t WHERE st IN ('F', 'O') GROUP BY st) cur
         |JOIN (SELECT st, COUNT(*) AS n_v1
         |      FROM $t VERSION AS OF 1
         |      WHERE st IN ('F', 'O') GROUP BY st) v1
         |USING (st)
         |ORDER BY st""".stripMargin)
  }

  /** Column surgery under the hash: CREATE + INSERT, then RENAME
    * COLUMN (copy-on-write rewrite), DROP COLUMN (another rewrite),
    * ADD COLUMN (metadata-only), a post-surgery INSERT in the new
    * 3-column shape, and a final aggregate over the evolved table
    * joined with a VERSION AS OF 1 count proving the pre-surgery
    * history stayed travelable in its ORIGINAL physical shape. The
    * oracle replays the surgery as projections over the raw table —
    * a hash match pins rename/drop/add semantics plus history. */
  val sqlAlter: Q = Q(
    "q_sql_alter",
    """WITH base AS (
      |  SELECT o_orderkey AS k, o_orderstatus AS st FROM orders),
      |cur AS (
      |  SELECT k, st AS status, CAST(NULL AS VARCHAR) AS src FROM base
      |  UNION ALL SELECT -1, 'X', 'manual'),
      |agg AS (
      |  SELECT status, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k,
      |    CAST(SUM(CASE WHEN src IS NULL THEN 0 ELSE 1 END) AS BIGINT)
      |      AS n_src
      |  FROM cur GROUP BY status)
      |SELECT status, n, sum_k, n_src,
      |  (SELECT COUNT(*) FROM base) AS n_v1
      |FROM agg ORDER BY status""".stripMargin) { (s, dir) =>
    ensureCatalog(s)
    val id = graft.queries.Vectors.sanitizeDir(dir)
    val t = s"graftlake.alt_$id"
    LakeFs.rmTree(s"$LakeRoot/alt_$id")
    s.sql(s"CREATE TABLE $t (k BIGINT, st STRING, p DECIMAL(18,2))")
    s.sql(
      s"""INSERT INTO $t
         |SELECT o_orderkey, o_orderstatus,
         |  CAST(o_totalprice AS DECIMAL(18,2))
         |FROM parquet.`$dir/orders.parquet`""".stripMargin)
    s.sql(s"ALTER TABLE $t RENAME COLUMN st TO status")
    s.sql(s"ALTER TABLE $t DROP COLUMN p")
    s.sql(s"ALTER TABLE $t ADD COLUMN src STRING")
    s.sql(s"INSERT INTO $t VALUES (-1, 'X', 'manual')")
    s.sql(
      s"""SELECT status, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k,
         |  CAST(SUM(CASE WHEN src IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         |    AS n_src,
         |  (SELECT COUNT(*) FROM $t VERSION AS OF 1) AS n_v1
         |FROM $t GROUP BY status ORDER BY status""".stripMargin)
  }

  /** The change-data-feed TVF under the oracle hash: CREATE + two
    * INSERTs build a keyed MoR history (the second re-inserts every
    * sixth key with a bumped value — latest-wins updates — and adds
    * a disjoint key slice — inserts), then the final statement is
    * pure SQL through the injected `table_changes` table function.
    * The oracle replays the expected net diff from the raw table:
    * update_preimage/update_postimage pairs for the re-inserted
    * keys, insert rows for the new slice, NOTHING for untouched keys
    * — so a hash match proves the TVF's catalog resolution AND
    * readChanges' full-outer diff semantics end to end. */
  val sqlChanges: Q = Q(
    "q_sql_changes",
    """WITH base AS (
      |  SELECT o_orderkey AS k,
      |    CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v
      |  FROM orders)
      |SELECT * FROM (
      |  SELECT 'insert' AS change_type, k, v FROM base WHERE k % 3 = 1
      |  UNION ALL
      |  SELECT 'update_preimage', k, v FROM base WHERE k % 6 = 0
      |  UNION ALL
      |  SELECT 'update_postimage', k, v + 1 FROM base WHERE k % 6 = 0)
      |ORDER BY k, change_type""".stripMargin) { (s, dir) =>
    ensureCatalog(s)
    val short = "chg_" + graft.queries.Vectors.sanitizeDir(dir)
    val t = s"graftlake.$short"
    LakeFs.rmTree(s"$LakeRoot/$short")
    s.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT)")
    s.sql(
      s"""INSERT INTO $t
         |SELECT o_orderkey,
         |  CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
         |FROM parquet.`$dir/orders.parquet`
         |WHERE o_orderkey % 3 = 0""".stripMargin) // -> version 1
    s.sql(
      s"""INSERT INTO $t
         |SELECT o_orderkey,
         |  CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
         |    + CASE WHEN o_orderkey % 6 = 0 THEN 1 ELSE 0 END
         |FROM parquet.`$dir/orders.parquet`
         |WHERE o_orderkey % 6 = 0 OR o_orderkey % 3 = 1""".stripMargin)
    // -> version 2: %6=0 re-keyed with bumped value, %3=1 fresh
    s.sql(
      s"""SELECT change_type, k, v
         |FROM table_changes('$t', 'k', 1, 2)
         |ORDER BY k, change_type""".stripMargin)
  }

  /** Atomic REPLACE under the oracle hash: CREATE + INSERT build
    * version 1, `REPLACE TABLE … AS SELECT` (the staged path — one
    * committed version over the preserved root) rewrites the table
    * to a filtered aggregate, and the final statement joins the
    * post-replace state against the pre-replace VERSION AS OF 1
    * aggregate — hash-checking both the replace's content AND that
    * history survived it (the drop+create fallback would have
    * destroyed version 1). Oracle replays both states as subsets of
    * the raw table. */
  val sqlReplace: Q = Q(
    "q_sql_replace",
    """WITH base AS (
      |  SELECT o_orderkey AS k, o_orderstatus AS st,
      |    CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM orders WHERE o_orderkey % 4 = 0),
      |agg AS (
      |  SELECT st, COUNT(*)::BIGINT AS n, SUM(cents)::BIGINT AS total
      |  FROM base WHERE cents >= 10000000 GROUP BY 1),
      |v1 AS (SELECT st, COUNT(*)::BIGINT AS n_v1 FROM base GROUP BY 1)
      |SELECT agg.st, agg.n, agg.total, v1.n_v1
      |FROM agg JOIN v1 USING (st) ORDER BY st""".stripMargin) {
    (s, dir) =>
      ensureCatalog(s)
      val short = "rep_" + graft.queries.Vectors.sanitizeDir(dir)
      val t = s"graftlake.$short"
      LakeFs.rmTree(s"$LakeRoot/$short")
      s.sql(s"CREATE TABLE $t (k BIGINT, st STRING, cents BIGINT)")
      s.sql(
        s"""INSERT INTO $t
           |SELECT o_orderkey, o_orderstatus,
           |  CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
           |FROM parquet.`$dir/orders.parquet`
           |WHERE o_orderkey % 4 = 0""".stripMargin) // -> version 1
      s.sql(
        s"""REPLACE TABLE $t AS
           |SELECT st, COUNT(*) AS n, SUM(cents) AS total
           |FROM $t WHERE cents >= 10000000 GROUP BY st""".stripMargin)
      s.sql(
        s"""SELECT cur.st, cur.n, cur.total, v1.n_v1
           |FROM $t cur
           |JOIN (SELECT st, COUNT(*) AS n_v1
           |      FROM $t VERSION AS OF 1 GROUP BY st) v1
           |USING (st)
           |ORDER BY cur.st""".stripMargin)
  }

  val all: Seq[Q] = Seq(sqlCatalog, sqlDelete, sqlUpdate, sqlMerge,
    sqlRestore, sqlPartitioned, sqlAlter, sqlChanges, sqlReplace)
}
