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

  val all: Seq[Q] = Seq(sqlCatalog, sqlDelete)
}
