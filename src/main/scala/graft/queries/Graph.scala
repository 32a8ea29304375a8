package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Graph analytics over the co-purchase graph — parts are nodes, an
  * edge joins two parts that appear in the SAME order (the classic
  * market-basket projection, lineitem self-joined on the order key).
  *
  * The scale discipline is DEGREE-ORDERED edge orientation (the
  * standard distributed triangle-count trick, Cohen '09 / every
  * GraphX/Giraph implementation since): orient every undirected edge
  * from its lower-(degree, id) endpoint to the higher one. Then each
  * triangle {u,v,w} materializes EXACTLY once (as the wedge at its
  * smallest vertex closed by one edge probe), no per-triangle dedup
  * pass — and, the 100 TB point, the out-degree of every vertex is
  * bounded by ~sqrt(2·|E|) regardless of raw degree skew: the
  * celebrity part that co-occurs with everything gets rank-high
  * orientation and contributes NO wedges, so the wedge join cannot
  * blow up on skewed keys. Wedge generation is one self-join
  * shuffled on the low vertex; closure is one equi-join on the
  * (v, w) pair. Never all-pairs, no windows. */
object Graph {

  /** Top parts by triangle membership in the co-purchase graph, plus
    * the global triangle count. Everything is exact integers. */
  val triangles: Q = Q(
    "q_triangles",
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |edges AS (
      |  SELECT DISTINCT a.p AS x, b.p AS y
      |  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p),
      |deg AS (
      |  SELECT n, COUNT(*) AS d FROM (
      |    SELECT x AS n FROM edges
      |    UNION ALL SELECT y AS n FROM edges) ends
      |  GROUP BY n),
      |oriented AS (
      |  SELECT CASE WHEN (dx.d, e.x) < (dy.d, e.y) THEN e.x ELSE e.y
      |           END AS u,
      |         CASE WHEN (dx.d, e.x) < (dy.d, e.y) THEN e.y ELSE e.x
      |           END AS v,
      |         CASE WHEN (dx.d, e.x) < (dy.d, e.y) THEN dy.d ELSE dx.d
      |           END AS dv
      |  FROM edges e
      |  JOIN deg dx ON e.x = dx.n
      |  JOIN deg dy ON e.y = dy.n),
      |tri AS (
      |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
      |  FROM oriented e1
      |  JOIN oriented e2
      |    ON e1.u = e2.u AND (e1.dv, e1.v) < (e2.dv, e2.v)
      |  JOIN oriented e3 ON e3.u = e1.v AND e3.v = e2.v),
      |members AS (
      |  SELECT n, COUNT(*) AS n_tri FROM (
      |    SELECT a AS n FROM tri
      |    UNION ALL SELECT b AS n FROM tri
      |    UNION ALL SELECT c AS n FROM tri) m
      |  GROUP BY n)
      |SELECT n AS part, n_tri, (SELECT COUNT(*) FROM tri) AS total_tri
      |FROM members
      |ORDER BY n_tri DESC, part
      |LIMIT 10""".stripMargin) { (s, dir) =>
    val (tri, _) = triangleFrames(s, dir)
    val total = tri.agg(count(lit(1)).as("total_tri"))
    // one cached-tri pass for all three corners (was a 3-branch union)
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("n_tri"))
      .crossJoin(broadcast(total))
      .select(col("n").as("part"), col("n_tri"), col("total_tri"))
      .orderBy(col("n_tri").desc, col("part"))
      .limit(10)
  }

  /** Triangles GAINED by adding `newEdges` to a graph currently
    * holding `oldEdges` (both canonical u<v, distinct, disjoint) —
    * the incremental-counting identity every streaming graph engine
    * uses: T(O∪N) − T(O) = #triangles with ≥1 new edge, decomposed
    * by how many new edges the triangle has so each is counted
    * EXACTLY once:
    *   (N,O,O): per new edge, common O-neighbors of its endpoints;
    *   (N,N,O): per pair of new edges sharing a vertex (the shared
    *            vertex is unique), closed by one O edge;
    *   (N,N,N): the batch's own triangles (ordered wedge + close).
    * Cost: O(|N|·deg) joins — the batch drives every join, the old
    * graph is only probed, nothing is ever recounted. */
  private[graft] def triangleDelta(oldEdges: DataFrame,
      newEdges: DataFrame): Long = {
    val o = oldEdges.select(col("u"), col("v"))
    val n = newEdges.select(col("u"), col("v")).cache()
    def sym(e: DataFrame): DataFrame =
      e.select(col("u").as("a"), col("v").as("b"))
        .unionAll(e.select(col("v").as("a"), col("u").as("b")))
    val oSym = sym(o)
    val nSym = sym(n)
    // (N,O,O): new edge (u,v) + common O-neighbor c of u and v
    val noo = n
      .join(oSym.select(col("a").as("u"), col("b").as("c")), "u")
      .join(oSym.select(col("a").as("v"), col("b").as("c")),
        Seq("v", "c"))
      .count()
    // (N,N,O): two new edges at shared vertex a reach (b, c), b<c —
    // already canonical — closed by an O edge (inner join against
    // the DISTINCT O edge set keeps per-wedge multiplicity)
    val nno = nSym.as("e1")
      .join(nSym.as("e2"),
        col("e1.a") === col("e2.a") && col("e1.b") < col("e2.b"))
      .select(col("e1.b").as("u"), col("e2.b").as("v"))
      .join(o, Seq("u", "v"))
      .count()
    // (N,N,N): triangles wholly inside the batch (a<b<c ordering
    // counts each once; canonical edges make the ordered probes free)
    val nnn = n.as("e1")
      .join(n.select(col("u"), col("v").as("w")).as("e2"),
        col("e1.u") === col("e2.u") && col("e1.v") < col("e2.w"))
      .select(col("e1.v").as("u"), col("e2.w").as("v"))
      .join(n, Seq("u", "v"))
      .count()
    n.unpersist()
    noo + nno + nnn
  }

  /** The co-purchase graph q_triangles defines, shared by the other
    * graph queries: canonical x<y edges + per-node degrees.
    *
    * r16 shape: per-order sorted part array → all x<y pairs inline.
    * The old items-distinct + self-join paid one extra exchange AND a
    * join for the same pair set; collect_set dedups (o, p) map-side
    * inside the single groupBy-o exchange.
    *
    * Per-group size assumption (ADVICE r16): this shape buffers one
    * order's ENTIRE item set — and its C(n, 2) pair explosion — in a
    * single aggregate row, where the old self-join spread the same
    * quadratic fan-out across shuffle rows. Total work is identical
    * (TPC-H orders are ≤ 7 lines), but on data with a pathological
    * hot group (one basket containing a large fraction of the
    * catalog) a single row would hold C(n, 2) structs and can OOM a
    * task that the self-join shape merely made slow. On such corpora
    * cap the group first (filter orders by item count, or fall back
    * to the items-distinct + self-join shape above the cap) — the
    * skew-killer cap is the same move the dedup family's hot-shingle
    * gate makes.
    * Degrees come from ONE pass over the cached edges (explode of
    * both endpoints) instead of a two-branch union. */
  private def edgesAndDeg(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val edges = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .groupBy(col("o")).agg(sort_array(collect_set(col("p"))).as("ps"))
      .select(explode(expr(
        "flatten(transform(ps, (x, i) -> " +
          "transform(slice(ps, i + 2, size(ps)), y -> struct(x, y))))"))
        .as("e"))
      .select(col("e.x").as("x"), col("e.y").as("y"))
      .distinct()
      .cache()
    // deg is consumed 2-3 times per query (both oriented sides, the
    // final coefficient join) — cache the |V|-row frame rather than
    // re-aggregating the edge cache per consumer
    val deg = edges.select(explode(array(col("x"), col("y"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("d"))
      .cache()
    (edges, deg)
  }

  /** Degree-ordered oriented edges and their triangle list — the
    * shared dataflow of q_triangles and graph_clustering, computed
    * inside each query's own invocation (shared CODE, never shared
    * state: the r16 optimization rules forbid cross-run sidecars).
    * `tri` is cached: the members explode re-reads it, and uncached
    * each consumer would re-run the whole wedge join (the r14b
    * 150-470 s lesson). */
  private def triangleFrames(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val (edges, deg) = edgesAndDeg(s, dir)
    val lowFirst = struct(col("dx"), col("x")) < struct(col("dy"), col("y"))
    val oriented = edges
      .join(deg.withColumnRenamed("n", "x").withColumnRenamed("d", "dx"),
        "x")
      .join(deg.withColumnRenamed("n", "y").withColumnRenamed("d", "dy"),
        "y")
      .select(
        when(lowFirst, col("x")).otherwise(col("y")).as("u"),
        when(lowFirst, col("y")).otherwise(col("x")).as("v"),
        when(lowFirst, col("dy")).otherwise(col("dx")).as("dv"))
      .cache()
    // wedges at the LOW vertex, closed by one oriented-edge probe
    // (alias-qualified join keys: positional df("col") references on
    // two projections of one cached frame trip Spark's ambiguous-
    // self-join heuristic)
    val e1 = oriented.select(col("u"), col("v").as("b"), col("dv").as("db"))
      .as("e1")
    val e2 = oriented.select(col("u"), col("v").as("c"), col("dv").as("dc"))
      .as("e2")
    val tri = e1.join(e2,
        col("e1.u") === col("e2.u") &&
          struct(col("db"), col("b")) < struct(col("dc"), col("c")))
      .select(col("e1.u").as("a"), col("b"), col("c"))
      .join(oriented.select(col("u").as("b"), col("v").as("c")),
        Seq("b", "c"))
      .select("a", "b", "c")
      .cache()
    (tri, deg)
  }

  /** SQL fragment for the same edge/degree build (oracle side). */
  private val edgesDegSql =
    """items AS (
      |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |edges AS (
      |  SELECT DISTINCT a.p AS x, b.p AS y
      |  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p),
      |deg AS (
      |  SELECT n, COUNT(*) AS d FROM (
      |    SELECT x AS n FROM edges
      |    UNION ALL SELECT y AS n FROM edges) ends
      |  GROUP BY n)"""

  /** Local clustering coefficient — per-node triangle density
    * 2·T(n)/(d·(d−1)), the standard cohesion metric next to
    * q_triangles' global count. Reuses the degree-ordered triangle
    * enumeration (each triangle found once, out-degree bounded
    * √(2·|E|) whatever the skew), then re-attributes counts to all
    * three corners; the coefficient is an integer-ppm DIV — float
    * never enters. Top-20 by (coeff, id): the ordering key is a pure
    * integer pair, so cross-engine rank ties are impossible by
    * construction. */
  val clustering: Q = Q(
    "graph_clustering",
    s"""WITH $edgesDegSql,
      |oriented AS (
      |  SELECT CASE WHEN (dx.d, e.x) < (dy.d, e.y) THEN e.x ELSE e.y
      |           END AS u,
      |         CASE WHEN (dx.d, e.x) < (dy.d, e.y) THEN e.y ELSE e.x
      |           END AS v,
      |         CASE WHEN (dx.d, e.x) < (dy.d, e.y) THEN dy.d ELSE dx.d
      |           END AS dv
      |  FROM edges e
      |  JOIN deg dx ON e.x = dx.n
      |  JOIN deg dy ON e.y = dy.n),
      |tri AS (
      |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
      |  FROM oriented e1
      |  JOIN oriented e2
      |    ON e1.u = e2.u AND (e1.dv, e1.v) < (e2.dv, e2.v)
      |  JOIN oriented e3 ON e3.u = e1.v AND e3.v = e2.v),
      |members AS (
      |  SELECT n, COUNT(*) AS n_tri FROM (
      |    SELECT a AS n FROM tri
      |    UNION ALL SELECT b AS n FROM tri
      |    UNION ALL SELECT c AS n FROM tri) m
      |  GROUP BY n)
      |SELECT deg.n AS part, deg.d,
      |  COALESCE(members.n_tri, 0) AS n_tri,
      |  1000000 * 2 * COALESCE(members.n_tri, 0)
      |    // (deg.d * (deg.d - 1)) AS coeff_ppm
      |FROM deg LEFT JOIN members ON deg.n = members.n
      |WHERE deg.d >= 2
      |ORDER BY coeff_ppm DESC, part
      |LIMIT 20""".stripMargin) { (s, dir) =>
    val (tri, deg) = triangleFrames(s, dir)
    val members = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("n_tri"))
    deg.filter(col("d") >= 2)
      .join(members, Seq("n"), "left")
      .select(col("n").as("part"), col("d"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .select(col("part"), col("d"), col("n_tri"),
        expr("1000000 * 2 * n_tri DIV (d * (d - 1))").as("coeff_ppm"))
      .orderBy(col("coeff_ppm").desc, col("part"))
      .limit(20)
  }

  /** Common-neighbor link prediction — the classic "people who bought
    * X and Y also bought" candidate generator: score every
    * NON-adjacent pair by shared neighbors, plus the integer-ppm
    * Jaccard of (capped) neighbor sets. Scale discipline: wedges are
    * enumerated only at centers with degree ≤ 64 — the published
    * practice for common-neighbor scoring at scale (a hub's wedge set
    * is quadratic in its degree and carries the least signal; the cap
    * bounds per-center work at 64² whatever the skew, so the wedge
    * join is O(|E|·64), never hub-quadratic). The cap is part of the
    * operator's semantics (scores are "common low-degree neighbors")
    * and applied identically in both engines. */
  val linkPredict: Q = Q(
    "graph_link_predict",
    s"""WITH $edgesDegSql,
      |adj AS (
      |  SELECT x AS c, y AS m FROM edges
      |  UNION ALL SELECT y AS c, x AS m FROM edges),
      |small AS (
      |  SELECT adj.c, adj.m FROM adj
      |  JOIN deg ON adj.c = deg.n WHERE deg.d <= 64),
      |wedge AS (
      |  SELECT w1.m AS a, w2.m AS b, COUNT(*) AS cn
      |  FROM small w1 JOIN small w2
      |    ON w1.c = w2.c AND w1.m < w2.m
      |  GROUP BY w1.m, w2.m),
      |cand AS (
      |  SELECT a, b, cn FROM wedge
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM edges WHERE edges.x = wedge.a
      |      AND edges.y = wedge.b))
      |SELECT c.a, c.b, c.cn,
      |  1000000 * c.cn // (da.d + db.d - c.cn) AS jaccard_ppm
      |FROM cand c
      |JOIN deg da ON c.a = da.n
      |JOIN deg db ON c.b = db.n
      |ORDER BY c.cn DESC, c.a, c.b
      |LIMIT 20""".stripMargin) { (s, dir) =>
    val (edges, deg) = edgesAndDeg(s, dir)
    // one cached-edges pass for both directions (explode, not union)
    val adj = edges.select(explode(array(
        struct(col("x").as("c"), col("y").as("m")),
        struct(col("y").as("c"), col("x").as("m")))).as("e"))
      .select(col("e.c").as("c"), col("e.m").as("m"))
    val small = adj.join(
      deg.filter(col("d") <= 64).select(col("n").as("c")), "c")
    val wedge = small.select(col("c"), col("m").as("a")).as("w1")
      .join(small.select(col("c"), col("m").as("b")).as("w2"),
        col("w1.c") === col("w2.c") && col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("cn"))
    val cand = wedge.join(
      edges.select(col("x").as("a"), col("y").as("b")),
      Seq("a", "b"), "left_anti")
    cand
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
      .select(col("a"), col("b"), col("cn"),
        expr("1000000 * cn DIV (da + db - cn)").as("jaccard_ppm"))
      .orderBy(col("cn").desc, col("a"), col("b"))
      .limit(20)
  }

  /** Bounded-hop BFS — single-source shortest paths within 8 hops
    * from the smallest node id, reported as a per-depth profile
    * (count + id range). The hop bound is the operator's DECLARED
    * semantics, and the honest distributed form: an unbounded BFS
    * iterates diameter-many rounds (data-dependent driver control
    * flow), while k-hop is a FIXED 8-round unrolled plan whose cost
    * is ≤ 8 frontier-adjacency equi-joins whatever the graph — the
    * pagerank rule (driver counts iterations, never rows). Every
    * frontier localCheckpoints (the dedup_clusters iterative rule:
    * eager materialization both stops per-level recomputation doubling
    * AND truncates lineage — a cached-only 8-level self-referencing
    * DAG grows a plan tree big enough to OOM the PLANNER), dedup is
    * one anti-join against the visited set, and all outputs are
    * exact integers. The oracle replays the walk as a recursive
    * CTE whose UNION dedups (node, depth) pairs, min-depth folded at
    * the end. */
  val khop: Q = Q(
    "graph_khop",
    s"""WITH RECURSIVE items AS (
      |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |edges AS (
      |  SELECT DISTINCT a.p AS x, b.p AS y
      |  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p),
      |adj AS (
      |  SELECT x AS c, y AS m FROM edges
      |  UNION ALL SELECT y AS c, x AS m FROM edges),
      |walk(node, depth) AS (
      |  SELECT MIN(x), 0 FROM edges
      |  UNION
      |  SELECT adj.m, walk.depth + 1
      |  FROM walk JOIN adj ON walk.node = adj.c
      |  WHERE walk.depth < 8),
      |d AS (SELECT node, MIN(depth) AS depth FROM walk GROUP BY node)
      |SELECT depth, COUNT(*) AS n_nodes, MIN(node) AS min_node,
      |  MAX(node) AS max_node
      |FROM d GROUP BY depth ORDER BY depth""".stripMargin) { (s, dir) =>
    val (edges, _) = edgesAndDeg(s, dir)
    // one cached-edges pass for both directions (explode, not union)
    val adj = edges.select(explode(array(
        struct(col("x").as("c"), col("y").as("m")),
        struct(col("y").as("c"), col("x").as("m")))).as("e"))
      .select(col("e.c").as("c"), col("e.m").as("m"))
      .localCheckpoint()
    val src = edges.agg(min(col("x")).as("node"))
      .select(col("node"), lit(0).as("depth")).localCheckpoint()
    // visited is a LAZY union of the per-level checkpointed frontiers:
    // every leaf is already an ExistingRDD, so the anti-join's right
    // side never recomputes — and the per-level visited checkpoint
    // job (8 extra materializations of an already-materialized union)
    // is gone. Only the new frontier is checkpointed each round.
    var visited = src
    var frontier = src.select(col("node"))
    var d = 1
    var exhausted = false
    // the 8-hop BOUND is the declared semantics; an empty frontier
    // provably contributes nothing at every later depth, so stopping
    // early is result-identical (every remaining round would join an
    // empty build side against the full adj scan — at bench scale the
    // walk saturates by depth 3 and the empty rounds were pure adj
    // re-scans). The emptiness probe reads one partition of the
    // ALREADY-materialized checkpoint, not a new computation.
    while (d <= 8 && !exhausted) {
      val next = frontier.join(adj, col("node") === col("c"))
        .select(col("m").as("node")).distinct()
        .join(visited.select(col("node")), Seq("node"), "left_anti")
        .localCheckpoint()
      exhausted = next.isEmpty
      if (!exhausted) {
        visited = visited.unionByName(
          next.select(col("node"), lit(d).as("depth")))
        frontier = next
      }
      d += 1
    }
    visited.groupBy(col("depth"))
      .agg(count(lit(1)).as("n_nodes"), min(col("node")).as("min_node"),
        max(col("node")).as("max_node"))
      .orderBy(col("depth"))
  }

  val all: Seq[Q] = Seq(triangles, clustering, linkPredict, khop)
}
