package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Record linkage / fuzzy entity resolution — the classic data-
  * cleaning stage a crawl-scale corpus needs before any join on a
  * human-entered attribute (product names, author strings, venue
  * names). The reference app has no linkage stage; this family is
  * part of the beyond-the-reference pipeline surface, built the way
  * every published ER system (Fellegi-Sunter blocking, Dedoop,
  * Magellan) structures it for scale:
  *
  *   1. AGGREGATE FIRST — fuzzy comparison runs on the DISTINCT
  *      attribute domain, never on raw rows. At 100 TB the row count
  *      is 10^12 but a name domain is 10^6-10^8; the groupBy that
  *      builds the domain is one map-side-combining shuffle and
  *      everything fuzzy happens after it.
  *   2. BLOCK, THEN VERIFY — candidates come from an equi-join on a
  *      cheap blocking key (here the head noun of the name), so the
  *      comparison count is sum of block^2 over blocks, not domain^2.
  *      A production blocker swaps the key (soundex, q-gram LSH —
  *      dedup_minhash_lsh's machinery applies unchanged); the plan
  *      shape is identical.
  *   3. VERIFY is one codegen'd `levenshtein` per candidate — no UDF.
  *
  * PlanSpec pins the no-cartesian/no-BNLJ shape.
  */
object Linkage {

  private def domain(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.part(s, dir)
      .groupBy(col("p_name"), split(col("p_name"), " ").getItem(1).as("blk"))
      .agg(count(lit(1)).as("support"))

  /** Verified fuzzy near-pairs over the distinct part-name domain:
    * block on the head noun, verify edit distance <= 2. Output keeps
    * each side's row support so downstream merge decisions can weigh
    * the variants. */
  val fuzzyNames: Q = Q(
    "er_fuzzy_names",
    """WITH d AS (
      |  SELECT p_name, split_part(p_name, ' ', 2) AS blk,
      |    COUNT(*) AS support
      |  FROM part GROUP BY 1, 2)
      |SELECT a.p_name AS name_a, b.p_name AS name_b,
      |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist,
      |  a.support AS support_a, b.support AS support_b
      |FROM d a JOIN d b ON a.blk = b.blk AND a.p_name < b.p_name
      |WHERE levenshtein(a.p_name, b.p_name) <= 2
      |ORDER BY name_a, name_b""".stripMargin) { (s, dir) =>
    val d = domain(s, dir)
    val a = d.select(col("p_name").as("name_a"), col("blk"),
      col("support").as("support_a"))
    val b = d.select(col("p_name").as("name_b"), col("blk"),
      col("support").as("support_b"))
    a.join(b, Seq("blk"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("edit_dist",
        levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("edit_dist") <= 2)
      .select(col("name_a"), col("name_b"), col("edit_dist"),
        col("support_a"), col("support_b"))
      .orderBy(col("name_a"), col("name_b"))
  }

  /** Single-pass canonicalization: every name maps to the
    * lexicographically smallest of itself and its edit-distance-1
    * block neighbors, then the RAW ROWS join the (tiny, broadcast)
    * mapping and aggregate per canonical entity. One hop only — the
    * full transitive closure is dedup_clusters' job (same union-find
    * machinery applies to this edge list); one-hop min is the
    * deterministic, single-shuffle approximation every blocking
    * survey uses as the merge baseline, and both engines compute the
    * identical mapping. */
  val canonicalize: Q = Q(
    "er_canonicalize",
    """WITH d AS (
      |  SELECT p_name, split_part(p_name, ' ', 2) AS blk
      |  FROM part GROUP BY 1, 2),
      |e AS (
      |  SELECT a.p_name AS nm, b.p_name AS nb
      |  FROM d a JOIN d b ON a.blk = b.blk AND a.p_name <> b.p_name
      |  WHERE levenshtein(a.p_name, b.p_name) <= 1),
      |m AS (
      |  SELECT d.p_name,
      |    LEAST(d.p_name, COALESCE(MIN(e.nb), d.p_name)) AS canon
      |  FROM d LEFT JOIN e ON d.p_name = e.nm GROUP BY d.p_name)
      |SELECT m.canon AS canon_name,
      |  CAST(COUNT(DISTINCT p.p_name) AS BIGINT) AS n_variants,
      |  COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(p.p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS sum_price
      |FROM part p JOIN m ON p.p_name = m.p_name
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import graft.functions.Exact.money
    val d = domain(s, dir).select(col("p_name"), col("blk"))
    val e = d.as("a").join(d.as("b"),
        col("a.blk") === col("b.blk")
          && col("a.p_name") =!= col("b.p_name")
          && levenshtein(col("a.p_name"), col("b.p_name")) <= 1)
      .select(col("a.p_name").as("nm"), col("b.p_name").as("nb"))
    val m = d.join(e, col("p_name") === col("nm"), "left")
      .groupBy(col("p_name"))
      .agg(least(col("p_name"),
        coalesce(min(col("nb")), col("p_name"))).as("canon"))
    // no broadcast hint on m: the canonical mapping spans the whole
    // name DOMAIN (10^6-10^8 at scale — the module doc's sizing), far
    // past broadcastable; AQE broadcasts it when the measured size
    // allows and falls back to a shuffle join beyond that (ADVICE r13
    // — a forced broadcast here OOMs the driver at 100 TB)
    Tables.part(s, dir)
      .join(m, Seq("p_name"))
      .groupBy(col("canon").as("canon_name"))
      .agg(countDistinct(col("p_name")).as("n_variants"),
        count(lit(1)).as("n_rows"),
        sum(money(col("p_retailprice"))).cast("double").as("sum_price"))
      .orderBy(col("canon_name"))
  }

  /** The blocking key of a name — head noun, the family's shared
    * blocker (a production deployment swaps this column for soundex /
    * q-gram LSH without touching the join shape). */
  private[graft] def withBlk(names: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    names.withColumn("blk", split(col("name"), " ").getItem(1))

  /** Batch-involved fuzzy near-pairs — the incremental/ingest twin of
    * [[fuzzyNames]]' pair join (HammingLsh.batchPairs' shape for edit
    * distance): the NEW side drives both joins, new-vs-index and
    * new-vs-new, so per-ingest cost is O(batch-blocks × bucket
    * occupancy), never an index self-join. Inputs are name-domain
    * frames with a `name` column (id sets assumed disjoint — the
    * ingest splits by batch membership); duplicate index rows (the
    * torn-marker replay window) are absorbed by the candidate
    * distinct. */
  private[graft] def batchFuzzyPairs(newNames: org.apache.spark.sql.DataFrame,
      idxNames: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val bn = withBlk(newNames.select(col("name")))
    val bo = withBlk(idxNames.select(col("name")))
    val newOld = bn.as("a").join(bo.as("b"), col("a.blk") === col("b.blk"))
      .select(least(col("a.name"), col("b.name")).as("name_a"),
        greatest(col("a.name"), col("b.name")).as("name_b"))
    val newNew = bn.as("a").join(bn.as("b"),
        col("a.blk") === col("b.blk") && col("a.name") < col("b.name"))
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
    newOld.unionByName(newNew).distinct()
      .withColumn("edit_dist",
        levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("edit_dist").between(1, 2))
      .orderBy(col("name_a"), col("name_b"))
  }

  /** Transitive entity clusters over the fuzzy pair graph — the full
    * closure er_canonicalize's one-hop pass approximates: the edge
    * list from [[fuzzyNames]]' blocked join feeds the SAME min-label
    * propagation engine as dedup_clusters (Dedup.minLabelClusters —
    * edge-count-sized shuffles, one action per round), so a chain
    * old gear — cold gear — gold gear lands in ONE entity even when
    * its endpoints exceed the pair threshold. Output covers every
    * name in the pair graph (singletons have no merge decision to
    * make). Oracle: recursive-CTE reachability closure. */
  val clusters: Q = Q(
    "er_clusters",
    """WITH RECURSIVE d AS (
      |  SELECT p_name, split_part(p_name, ' ', 2) AS blk
      |  FROM part GROUP BY 1, 2),
      |e AS (
      |  SELECT a.p_name AS na, b.p_name AS nb
      |  FROM d a JOIN d b ON a.blk = b.blk AND a.p_name < b.p_name
      |  WHERE levenshtein(a.p_name, b.p_name) <= 2),
      |edges AS (
      |  SELECT na AS x, nb AS y FROM e UNION SELECT nb, na FROM e),
      |reach AS (
      |  SELECT x, x AS y FROM (SELECT DISTINCT x FROM edges)
      |  UNION
      |  SELECT r.x, ed.y FROM reach r JOIN edges ed ON r.y = ed.x)
      |SELECT x AS name, MIN(y) AS entity_id
      |FROM reach GROUP BY x ORDER BY name""".stripMargin) { (s, dir) =>
    val d = domain(s, dir).select(col("p_name"), col("blk"))
    val pairs = d.as("a").join(d.as("b"),
        col("a.blk") === col("b.blk")
          && col("a.p_name") < col("b.p_name")
          && levenshtein(col("a.p_name"), col("b.p_name")) <= 2)
      .select(col("a.p_name").as("da"), col("b.p_name").as("db"))
    Dedup.minLabelClusters(pairs)
      .select(col("doc_id").as("name"), col("cluster_id").as("entity_id"))
      .orderBy(col("name"))
  }

  val all: Seq[Q] = Seq(fuzzyNames, canonicalize, clusters)
}
