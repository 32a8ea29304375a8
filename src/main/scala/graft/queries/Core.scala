package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.functions.Exact._
import graft.sources.Tables

/** Core relational operators over the star schema: scan, filter,
  * projection, shuffle/broadcast joins, aggregation, grouping sets,
  * windows, top-k. All money aggregates are decimal-exact (see
  * [[graft.functions.Exact]]) so results are partition-order
  * independent — required at cluster scale and for the oracle gate. */
object Core {

  val q1Agg: Q = Q(
    "q1_agg",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2)) * CAST(1 + l_tax AS DECIMAL(8,2))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumMoney(col("l_quantity")).as("sum_qty"),
        sumMoney(col("l_extendedprice")).as("sum_base_price"),
        sum(money(col("l_extendedprice")) * factor(lit(1) - col("l_discount")))
          .cast(DoubleType).as("sum_disc_price"),
        sum(money(col("l_extendedprice")) * factor(lit(1) - col("l_discount"))
          * factor(lit(1) + col("l_tax"))).cast(DoubleType).as("sum_charge"),
        avgMoney(col("l_quantity")).as("avg_qty"),
        avgMoney(col("l_extendedprice")).as("avg_price"),
        (sum(factor(col("l_discount"))).cast(DoubleType) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Projection + predicate pushdown: both the filter and the 3-column
    * read schema reach the parquet scan (verified in PlanSpec). */
  val qFilterProject: Q = Q(
    "q_filter_project",
    """SELECT p_partkey, p_brand, p_retailprice
      |FROM part WHERE p_type = 'PROMO' AND p_size >= 25
      |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    Tables.part(s, dir)
      .filter(col("p_type") === "PROMO" && col("p_size") >= 25)
      .select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
      .orderBy(col("p_partkey"))
  }

  /** TPC-H Q3 shape: shuffle join orders⋈lineitem; the filtered
    * customer side is deliberately UNHINTED — customer scales with
    * sf (~20% of it survives the segment filter), so AQE picks
    * broadcast at bench scale and degrades to shuffle at 100×
    * instead of OOMing a forced build side. Deterministic global
    * top-10 (TakeOrderedAndProject — no full sort at scale). */
  val q3JoinTopk: Q = Q(
    "q3_join_topk",
    """SELECT l_orderkey,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue,
      |  o_orderdate, o_orderpriority
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
    val cutoff = lit("1998-03-15 00:00:00").cast("timestamp")
    val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, dir).filter(col("o_orderdate") < cutoff)
    val li = Tables.lineitem(s, dir).filter(col("l_shipdate") > cutoff)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(money(col("l_extendedprice")) * factor(lit(1) - col("l_discount")))
        .cast(DoubleType).as("revenue"))
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"), col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
  }

  /** TPC-H Q5 shape: fact-to-fact shuffle join. Only the BOUNDED
    * dimension (nation⋈region — 25 rows at every sf) carries an
    * explicit broadcast hint; customer and supplier SCALE with sf,
    * so those joins are unhinted — AQE still broadcasts them at
    * bench scale but falls back to shuffle at 100× instead of
    * OOMing a forced build side. */
  val q5MultiJoin: Q = Q(
    "q5_multijoin",
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON c_nationkey = n_nationkey AND s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
    val nation = Tables.nation(s, dir)
    val region = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    val asiaNations = broadcast(
      nation.join(region, col("n_regionkey") === col("r_regionkey")))
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
    Tables.lineitem(s, dir)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(asiaNations,
        col("c_nationkey") === col("n_nationkey") &&
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(money(col("l_extendedprice")) * factor(lit(1) - col("l_discount")))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Top-3 orders per customer by price: partitioned window, no
    * global sort. */
  val qWindowRank: Q = Q(
    "q_window_rank",
    """SELECT * FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** EXISTS as a left-semi join (no fact-side duplication). */
  val qSemiJoin: Q = Q(
    "q_semi_join",
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val urgent = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
    Tables.customer(s, dir)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** NOT EXISTS as a left-anti join: customers without any big order. */
  val qAntiJoin: Q = Q(
    "q_anti_join",
    """SELECT c_custkey, c_acctbal FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val big = Tables.orders(s, dir).filter(col("o_totalprice") > 400000)
    Tables.customer(s, dir)
      .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  /** ROLLUP grouping sets; NULL group markers normalized to 'ALL' so
    * both engines emit identical strings. */
  val qRollup: Q = Q(
    "q_rollup",
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      |  COALESCE(l_linestatus, 'ALL') AS linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sumMoney(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n"))
      .orderBy(col("returnflag"), col("linestatus"))
  }

  /** CUBE over two dims, decimal-exact measures. */
  val qCube: Q = Q(
    "q_cube",
    """SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
      |  COALESCE(o_orderpriority, 'ALL') AS orderpriority,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |  COUNT(*) AS n
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY orderstatus, orderpriority""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(sumMoney(col("o_totalprice")).as("sum_price"), count(lit(1)).as("n"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("orderstatus"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("orderpriority"),
        col("sum_price"), col("n"))
      .orderBy(col("orderstatus"), col("orderpriority"))
  }

  /** Exact linear-interpolated percentiles per group, rounded to 4dp
    * (both engines interpolate in double; rounding absorbs ulp noise). */
  val qPercentiles: Q = Q(
    "q_percentiles",
    """SELECT l_returnflag,
      |  ROUND(CAST(QUANTILE_CONT(l_extendedprice, 0.5) AS DOUBLE), 4) AS p50,
      |  ROUND(CAST(QUANTILE_CONT(l_extendedprice, 0.9) AS DOUBLE), 4) AS p90,
      |  ROUND(CAST(QUANTILE_CONT(l_extendedprice, 0.99) AS DOUBLE), 4) AS p99
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(percentile(col("l_extendedprice"), lit(0.5)), 4).as("p50"),
        round(percentile(col("l_extendedprice"), lit(0.9)), 4).as("p90"),
        round(percentile(col("l_extendedprice"), lit(0.99)), 4).as("p99"))
      .orderBy(col("l_returnflag"))
  }

  /** Global top-100 with deterministic tiebreak: planner compiles the
    * sort+limit to TakeOrderedAndProject (per-partition heaps, no full
    * shuffle sort). */
  val qTopkGlobal: Q = Q(
    "q_topk_global",
    """SELECT l_orderkey, l_linenumber,
      |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2)) AS DOUBLE) AS net
      |FROM lineitem ORDER BY net DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        (money(col("l_extendedprice")) * factor(lit(1) - col("l_discount")))
          .cast(DoubleType).as("net"))
      .orderBy(col("net").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(100)
  }

  /** Pivot events by type → one row per user bucket (conditional
    * aggregation; single shuffle). */
  val qPivot: Q = Q(
    "q_pivot",
    """SELECT user_id % 10 AS user_bucket,
      |  COUNT(*) FILTER (WHERE event_type = 'click') AS clicks,
      |  COUNT(*) FILTER (WHERE event_type = 'view') AS views,
      |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchases,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS purchase_value
      |FROM events GROUP BY user_id % 10 ORDER BY user_bucket""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy((col("user_id") % 10).as("user_bucket"))
      .agg(
        count(when(col("event_type") === "click", 1)).as("clicks"),
        count(when(col("event_type") === "view", 1)).as("views"),
        count(when(col("event_type") === "purchase", 1)).as("purchases"),
        sum(when(col("event_type") === "purchase", money(col("value"))))
          .cast(DoubleType).as("purchase_value"))
      .orderBy(col("user_bucket"))
  }

  /** Exact distinct counting per group (shuffle-dedup + agg). */
  val qDistinct: Q = Q(
    "q_distinct",
    """SELECT event_type, COUNT(DISTINCT user_id) AS users,
      |  COUNT(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("users"), count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  }

  /** Top-3 per customer again — but via the bounded TopKAgg custom
    * aggregate instead of a window: map-side partial top-k, at most k
    * rows per group per partition enter the shuffle, no per-group
    * full sort. Same oracle as q_window_rank proves equivalence. */
  val qTopkPerKey: Q = Q(
    "q_topk_per_key",
    """SELECT * FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(graft.functions.TopK.topkBy(
        col("o_totalprice"), col("o_orderkey"), 3).as("top"))
      .select(col("o_custkey"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("o_custkey"), col("e.id").as("o_orderkey"),
        col("e.score").as("o_totalprice"),
        (col("pos") + 1).as("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** HyperLogLog++ approximate distinct per group — the sketch that
    * replaces exact COUNT(DISTINCT) at 100 TB (mergeable, constant
    * memory). ORACLE-SHAPED like q_freq_sketch: the sketch value
    * itself differs bit-wise from DuckDB's HLL, so the output carries
    * the SQL-replayable exact counts plus approx_ok = the sketch
    * landing within 5·rsd of exact (HLL++ is seedless-deterministic,
    * so the flag is stable) — the oracle asserts it TRUE, moving the
    * sketch's error contract into the driver's hash gate; BucketingSpec
    * keeps the numeric-tightness assertion on the raw estimate. */
  val qApproxDistinct: Q = Q(
    "q_approx_distinct",
    """SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
      |  COUNT(*) AS n, TRUE AS approx_ok
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id"), 0.01).as("approx"),
        count(lit(1)).as("n"))
      .select(col("event_type"), col("exact_users"), col("n"),
        (abs(col("approx") - col("exact_users")) <=
          col("exact_users") * lit(0.05)).as("approx_ok"))
      .orderBy(col("event_type"))
  }

  /** Mergeable approximate quantiles (Greenwald-Khanna via
    * approx_percentile) — the sketch that replaces exact sort-based
    * percentiles at 100 TB: constant memory per group, map-side
    * partials merge. ORACLE-SHAPED like q_freq_sketch: the sketch
    * values differ bit-wise from DuckDB's t-digest, so the output
    * carries the SQL-replayable exact quantiles (the q_percentiles
    * formulation, proven hash-stable) plus approx_ok = every sketch
    * quantile inside the exact [p−0.01, p+0.01] value envelope — 100x
    * the GK rank guarantee at accuracy 10000, and deterministic, so
    * the oracle asserts it TRUE; QueriesSpec keeps the 2%-relative
    * tightness assertion on the raw estimates. */
  val qApproxQuantiles: Q = Q(
    "q_approx_quantiles",
    """SELECT l_returnflag,
      |  ROUND(CAST(QUANTILE_CONT(l_extendedprice, 0.25) AS DOUBLE), 4) AS p25,
      |  ROUND(CAST(QUANTILE_CONT(l_extendedprice, 0.50) AS DOUBLE), 4) AS p50,
      |  ROUND(CAST(QUANTILE_CONT(l_extendedprice, 0.75) AS DOUBLE), 4) AS p75,
      |  ROUND(CAST(QUANTILE_CONT(l_extendedprice, 0.95) AS DOUBLE), 4) AS p95,
      |  COUNT(*) AS n, TRUE AS approx_ok
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    val ps = Seq(0.25, 0.5, 0.75, 0.95)
    // one sketch pass for all four quantiles + one exact pass for the
    // outputs and the error envelope; scalar columns (the correctness
    // harness cannot sort array columns)
    val lo = ps.map(p => math.max(p - 0.01, 0.0))
    val hi = ps.map(p => math.min(p + 0.01, 1.0))
    val okCol = ps.indices.map { i =>
      element_at(col("aq"), i + 1)
        .between(element_at(col("lo"), i + 1), element_at(col("hi"), i + 1))
    }.reduce(_ && _)
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        percentile_approx(col("l_extendedprice"),
          array(ps.map(lit(_)): _*), lit(10000)).as("aq"),
        percentile(col("l_extendedprice"), array(ps.map(lit(_)): _*)).as("ex"),
        percentile(col("l_extendedprice"), array(lo.map(lit(_)): _*)).as("lo"),
        percentile(col("l_extendedprice"), array(hi.map(lit(_)): _*)).as("hi"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"),
        round(element_at(col("ex"), 1), 4).as("p25"),
        round(element_at(col("ex"), 2), 4).as("p50"),
        round(element_at(col("ex"), 3), 4).as("p75"),
        round(element_at(col("ex"), 4), 4).as("p95"),
        col("n"), okCol.as("approx_ok"))
      .orderBy(col("l_returnflag"))
  }

  /** Running (cumulative) revenue per supplier over ship dates —
    * the prefix-sum window pattern. */
  val qRunningSum: Q = Q(
    "q_running_sum",
    """SELECT l_suppkey, l_shipdate,
      |  CAST(SUM(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))) OVER (
      |    PARTITION BY l_suppkey ORDER BY l_shipdate
      |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_rev
      |FROM lineitem GROUP BY l_suppkey, l_shipdate
      |ORDER BY l_suppkey, l_shipdate""".stripMargin) { (s, dir) =>
    val daily = Tables.lineitem(s, dir)
      .groupBy(col("l_suppkey"), col("l_shipdate"))
      .agg(sum(money(col("l_extendedprice"))).as("rev"))
    daily.withColumn("running_rev",
      sum(col("rev")).over(Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"))
        .rowsBetween(Window.unboundedPreceding, 0)).cast(DoubleType))
      .select(col("l_suppkey"), col("l_shipdate"), col("running_rev"))
      .orderBy(col("l_suppkey"), col("l_shipdate"))
  }

  /** NTILE quartiles over customer balances (deterministic tiebreak).
    * `ntile(4).over(Window.orderBy(...))` with no partitionBy funnels
    * EVERY row through one task — the canonical single-partition
    * scale-killer. Global rank instead = GlobalPrefix.withCumSum with
    * value 1 (two parallel passes + an O(partitions) offsets
    * broadcast); the NTILE arithmetic is then a pure expression. */
  val qNtile: Q = Q(
    "q_ntile",
    """SELECT c_custkey, NTILE(4) OVER (
      |  ORDER BY c_acctbal DESC, c_custkey) AS quartile
      |FROM customer ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val (ranked, n) = graft.operators.GlobalPrefix.withCumSum(
      Tables.customer(s, dir).select(col("c_custkey"), col("c_acctbal")),
      Seq(col("c_acctbal").desc, col("c_custkey")), lit(1L))
    // NTILE(k): the first n%k tiles hold ceil(n/k) rows, the rest floor;
    // when n < k every row is its own tile (tile = rank), handled
    // explicitly — a clamped divisor would wrongly merge rows.
    val k = 4L
    val r = col("cum")
    val tile =
      if (n < k) r
      else {
        val qSize = n / k
        val rem = n % k
        val big = qSize + 1
        when(r <= rem * big, floor((r - 1) / big) + 1)
          .otherwise(lit(rem) + floor((r - 1 - rem * big) / qSize) + 1)
      }
    ranked.select(col("c_custkey"), tile.cast("int").as("quartile"))
      .orderBy(col("c_custkey"))
  }

  /** Set operations: urgent-order customers INTERSECT building-segment,
    * EXCEPT big-balance — distinct set semantics end to end. */
  val qSetOps: Q = Q(
    "q_set_ops",
    """SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |INTERSECT
      |SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |EXCEPT
      |SELECT c_custkey FROM customer WHERE c_acctbal > 9000
      |ORDER BY custkey""".stripMargin) { (s, dir) =>
    val urgent = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("custkey"))
    val building = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
    val rich = Tables.customer(s, dir)
      .filter(col("c_acctbal") > 9000)
      .select(col("c_custkey").as("custkey"))
    urgent.intersect(building).except(rich).orderBy(col("custkey"))
  }

  /** Above-segment-average filter (the correlated-subquery pattern,
    * decorrelated to a broadcast join). The comparison is the
    * decimal-exact bal * n > sum form — a float average would make
    * the threshold partition-order dependent. */
  val qCorrelated: Q = Q(
    "q_correlated",
    """WITH s AS (
      |  SELECT c_mktsegment AS seg, COUNT(*) AS cnt,
      |    SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS total
      |  FROM customer GROUP BY 1)
      |SELECT c_custkey, c_mktsegment,
      |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal
      |FROM customer JOIN s ON c_mktsegment = seg
      |WHERE CAST(c_acctbal AS DECIMAL(18,2)) * cnt > total
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val c = Tables.customer(s, dir)
    val stats = c.groupBy(col("c_mktsegment").as("seg"))
      .agg(count(lit(1)).as("cnt"), sum(money(col("c_acctbal"))).as("total"))
    c.join(broadcast(stats), col("c_mktsegment") === col("seg"))
      .filter(money(col("c_acctbal")) * col("cnt") > col("total"))
      .select(col("c_custkey"), col("c_mktsegment"),
        money(col("c_acctbal")).cast(DoubleType).as("bal"))
      .orderBy(col("c_custkey"))
  }

  /** GROUPING SETS — the general form behind rollup/cube: exactly the
    * requested grouping combinations ((flag), (status), ()), one
    * shuffle via the Expand operator (rows replicated per set on the
    * map side, then a single hash aggregate — same scale shape as
    * q_rollup). GROUPING() disambiguates "aggregated-over" from a
    * genuine NULL key. */
  val qGroupingSets: Q = Q(
    "q_grouping_sets",
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      |  COALESCE(l_linestatus, 'ALL') AS linestatus,
      |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
      |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY returnflag, linestatus""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      // grouping() is resolvable only inside the aggregate list
      .agg(grouping(col("l_returnflag")).cast("long").as("g_flag"),
        grouping(col("l_linestatus")).cast("long").as("g_status"),
        sumMoney(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("g_flag"), col("g_status"), col("sum_qty"), col("n"))
      .orderBy(col("returnflag"), col("linestatus"))
  }

  /** UNPIVOT/melt — wide measures to long form, then aggregate by
    * measure. Unpivot is a zero-shuffle map-side Expand (k output
    * rows per input row); the groupBy that follows is the only
    * exchange. The inverse of q_pivot. */
  val qUnpivot: Q = Q(
    "q_unpivot",
    """SELECT measure,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |  COUNT(*) AS n
      |FROM (UNPIVOT (SELECT l_quantity, l_extendedprice, l_discount
      |        FROM lineitem)
      |      ON l_quantity, l_extendedprice, l_discount
      |      INTO NAME measure VALUE value)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .unpivot(Array.empty[org.apache.spark.sql.Column],
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "measure", "value")
      // Spark's unpivot RETAINS null values; DuckDB's UNPIVOT excludes
      // them by default. The three lineitem measures are non-null, but
      // agree by construction, not by data.
      .filter(col("value").isNotNull)
      .groupBy(col("measure"))
      .agg(sumMoney(col("value")).as("total"), count(lit(1)).as("n"))
      .orderBy(col("measure"))
  }

  /** Bloom-filter semi-join reduction: the filter is BUILT on the
    * small (predicate-filtered) side with a mergeable treeAggregate
    * (`stat.bloomFilter` — driver holds only the final ~1 MB bitmap),
    * then the fact table is pruned row-by-row inside WholeStageCodegen
    * BEFORE its rows enter the join shuffle. False positives (1% fpp)
    * pass the filter and are eliminated by the exact join that
    * follows, so the result is EXACTLY the plain join the oracle runs
    * — the bloom changes shuffle volume, never semantics. This is the
    * manual twin of Spark's runtime-bloom rewrite, demonstrated as an
    * explicit operator: at 100 TB, shipping 1 MB of bits to skip ~80%
    * of a fact-table shuffle is the canonical join reduction. */
  val qBloomJoin: Q = Q(
    "q_bloom_join",
    """SELECT l.l_orderkey AS orderkey, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |WHERE o.o_orderpriority = '1-URGENT'
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val urgent = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
      .cache() // consumed twice: bloom build + the exact join
    val bloom = urgent.stat.bloomFilter("o_orderkey",
      expectedNumItems = math.max(urgent.count(), 1L), fpp = 0.01)
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_extendedprice"))
      .filter(graft.functions.BloomExprs.mightContainLong(
        col("l_orderkey"), bloom))
      .join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey").as("orderkey"))
      .agg(count(lit(1)).as("n_items"),
        sumMoney(col("l_extendedprice")).as("revenue"))
      .orderBy(col("orderkey"))
  }

  /** Incremental aggregation — the materialized-view maintenance
    * pattern: the fact table arrives as an immutable BASE partition
    * plus a DELTA batch (split here on l_shipdate), each aggregated
    * SEPARATELY to mergeable partials (count + decimal-exact sums),
    * then merged by re-aggregating the union of partials. At 100 TB
    * the base partials are a stored table updated per batch at
    * O(delta + groups) cost — the full fact table is scanned once
    * ever, not once per refresh. Decimal-exact sums make the merge
    * associative with NO ordering caveat, so the merged result is
    * bit-identical to the full recompute — which is exactly what the
    * oracle computes (a plain one-pass aggregate): the hash match IS
    * the proof that partial-merge == recompute. */
  val qIncrementalAgg: Q = Q(
    "q_incremental_agg",
    """SELECT l_returnflag, l_linestatus,
      |  COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM lineitem
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val cut = lit("1996-01-01 00:00:00").cast("timestamp")
    def partials(f: org.apache.spark.sql.DataFrame) = f
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("pn"),
        sum(money(col("l_quantity"))).as("pq"),
        sum(money(col("l_extendedprice"))).as("pp"))
    val li = Tables.lineitem(s, dir)
    val base = partials(li.filter(col("l_shipdate") < cut))
    val delta = partials(li.filter(col("l_shipdate") >= cut))
    base.unionByName(delta)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("pn")).as("n_items"),
        sum(col("pq")).cast(DoubleType).as("sum_qty"),
        sum(col("pp")).cast(DoubleType).as("sum_price"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** MERGE/upsert snapshot maintenance — the other half of the
    * incremental-view pattern next to q_incremental_agg: a per-key
    * DIMENSION snapshot (each customer's latest order) maintained as
    * base snapshot + update batch, merged by a full-outer join where
    * the newer row wins (max over a (date, key, status) struct — no
    * row_number over the union, so the merge cost is O(base + delta),
    * and the argmax is deterministic). Additive stats (n_orders) merge
    * by addition in the same pass. The oracle recomputes the snapshot
    * from scratch over all orders — the hash match proves
    * upsert-merge == recompute. */
  val qMergeUpsert: Q = Q(
    "q_merge_upsert",
    """WITH r AS (
      |  SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate DESC, o_orderkey DESC) rn
      |  FROM orders),
      |n AS (SELECT o_custkey, COUNT(*) n_orders FROM orders GROUP BY 1)
      |SELECT r.o_custkey AS custkey, r.o_orderkey AS last_orderkey,
      |  r.o_orderdate AS last_orderdate, r.o_orderstatus AS last_status,
      |  n.n_orders
      |FROM r JOIN n USING (o_custkey) WHERE rn = 1
      |ORDER BY custkey""".stripMargin) { (s, dir) =>
    val cut = lit("1996-01-01 00:00:00").cast("timestamp")
    def snap(f: org.apache.spark.sql.DataFrame) = f
      .groupBy(col("o_custkey").as("custkey"))
      .agg(max(struct(col("o_orderdate"), col("o_orderkey"),
        col("o_orderstatus"))).as("m"),
        count(lit(1)).as("n"))
    val o = Tables.orders(s, dir)
    val base = snap(o.filter(col("o_orderdate") < cut))
      .select(col("custkey"), col("m").as("bm"), col("n").as("bn"))
    val upd = snap(o.filter(col("o_orderdate") >= cut))
      .select(col("custkey"), col("m").as("um"), col("n").as("un"))
    base.join(upd, Seq("custkey"), "full_outer")
      .select(col("custkey"),
        greatest(col("bm"), col("um")).as("m"), // greatest skips nulls
        (coalesce(col("bn"), lit(0L)) + coalesce(col("un"), lit(0L)))
          .as("n_orders"))
      .select(col("custkey"), col("m.o_orderkey").as("last_orderkey"),
        col("m.o_orderdate").as("last_orderdate"),
        col("m.o_orderstatus").as("last_status"), col("n_orders"))
      .orderBy(col("custkey"))
  }

  /** TPC-H Q17 shape — "small-quantity" revenue: per-part average
    * quantity computed once, then lineitem rows strictly below 20% of
    * their part's average are summed per brand. The plan shape is the
    * interesting part at scale: the threshold aggregate and the probe
    * join share the SAME key (l_partkey), so Catalyst reuses the
    * aggregation's hash partitioning for the fact-fact join — ONE
    * shuffle of lineitem feeds both, never two — and the part
    * dimension broadcasts onto the result. The threshold is exact
    * arithmetic in a fixed order (decimal sum → one double division →
    * one multiply), so the strict `<` boundary is bit-identical in
    * both engines — a threshold computed as a floating AVG would make
    * boundary rows engine-dependent. */
  val qAvgFilter: Q = Q(
    "q_avg_filter",
    """WITH th AS (
      |  SELECT l_partkey,
      |    0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |           / COUNT(*)) AS thr
      |  FROM lineitem GROUP BY 1)
      |SELECT p_brand,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
      |    AS avg_yearly,
      |  COUNT(*) AS n_small
      |FROM lineitem l
      |JOIN th ON th.l_partkey = l.l_partkey
      |JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE l.l_quantity < th.thr
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    val th = li.groupBy(col("l_partkey"))
      .agg((lit(0.2) * (sumMoney(col("l_quantity")) / count(lit(1))))
        .as("thr"))
    li.select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .join(th, Seq("l_partkey"))
      .filter(col("l_quantity") < col("thr"))
      // part scales with sf (sf×200k rows) — unhinted so AQE picks
      // broadcast at bench scale, shuffle at 100× (no forced OOM)
      .join(Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand")),
        col("p_partkey") === col("l_partkey"))
      .groupBy(col("p_brand"))
      .agg((sumMoney(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
        count(lit(1)).as("n_small"))
      .orderBy(col("p_brand"))
  }

  /** Market-basket association mining over order baskets — the
    * classic co-occurrence/lift analysis (Agrawal-Srikant's measure
    * set without the apriori iteration, which a 2-item analysis
    * doesn't need): supports and pairwise lift of parts co-ordered in
    * one basket. Scale: the pair generator is a SELF-JOIN WITHIN the
    * basket key — fan-out is C(items_per_order, 2), bounded by basket
    * size (≤7 in TPC-H), never corpus-quadratic; per-item supports
    * are one partial-agg groupBy; the basket count broadcasts as one
    * row. Lift = cnt·n_baskets/(cnt_a·cnt_b) — one expression of
    * exact int64s, 6dp. Top 20 by (n_pairs desc, part_a, part_b) —
    * fully deterministic through the tie. */
  val qBasketLift: Q = Q(
    "q_basket_lift",
    """WITH li AS (
      |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |pc AS (SELECT l_partkey, COUNT(*)::BIGINT ca FROM li GROUP BY 1),
      |nb AS (SELECT COUNT(DISTINCT l_orderkey)::BIGINT n FROM li),
      |pr AS (
      |  SELECT a.l_partkey pa, b.l_partkey pb, COUNT(*)::BIGINT cnt
      |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
      |    AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2)
      |SELECT pa AS part_a, pb AS part_b, cnt AS n_pairs,
      |  FLOOR(cnt::DOUBLE * nb.n::DOUBLE / (x.ca::DOUBLE * y.ca::DOUBLE)
      |    * 1000000 + 0.5) / 1000000 AS lift
      |FROM pr JOIN pc x ON pa = x.l_partkey
      |JOIN pc y ON pb = y.l_partkey CROSS JOIN nb
      |ORDER BY n_pairs DESC, part_a, part_b LIMIT 20""".stripMargin) {
    (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey")).distinct().cache()
      val pc = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("ca"))
      val nb = li.agg(countDistinct(col("l_orderkey")).as("n"))
      val pr = li.select(col("l_orderkey"), col("l_partkey").as("pa"))
        .join(li.select(col("l_orderkey"), col("l_partkey").as("pb")),
          "l_orderkey")
        .filter(col("pa") < col("pb"))
        .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("cnt"))
      def r6(c: Column): Column = floor(c * 1000000 + 0.5) / 1000000
      pr.join(pc.select(col("l_partkey").as("pa"), col("ca").as("cax")), "pa")
        .join(pc.select(col("l_partkey").as("pb"), col("ca").as("cay")), "pb")
        .crossJoin(broadcast(nb))
        .select(col("pa").as("part_a"), col("pb").as("part_b"),
          col("cnt").as("n_pairs"),
          r6(col("cnt").cast("double") * col("n").cast("double")
            / (col("cax").cast("double") * col("cay").cast("double")))
            .as("lift"))
        .orderBy(col("n_pairs").desc, col("part_a"), col("part_b"))
        .limit(20)
  }

  /** RFM customer segmentation (recency / frequency / monetary) —
    * the warehouse segmentation classic, done scale-right: exact
    * MEDIAN boundaries per dimension (one percentile aggregate,
    * broadcast back — NEVER an NTILE over a global sort, which
    * funnels every customer into one task), then a pure per-row
    * bucket compare → 8 binary segments. Monetary is exact cents;
    * recency is integer days from the corpus's own max order date
    * (self-contained — no wall clock); per-segment avg spend is one
    * division of exact int64s, 4dp. */
  val qRfmSegments: Q = Q(
    "q_rfm_segments",
    """WITH mx AS (SELECT MAX(o_orderdate) m FROM orders),
      |cust AS (
      |  SELECT o_custkey,
      |    DATE_DIFF('day', MAX(o_orderdate), (SELECT m FROM mx))::BIGINT r,
      |    COUNT(*)::BIGINT f,
      |    SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))::BIGINT m_cents
      |  FROM orders GROUP BY 1),
      |med AS (
      |  SELECT CAST(QUANTILE_CONT(r, 0.5) AS DOUBLE) rm,
      |    CAST(QUANTILE_CONT(f, 0.5) AS DOUBLE) fm,
      |    CAST(QUANTILE_CONT(m_cents, 0.5) AS DOUBLE) mm
      |  FROM cust),
      |seg AS (
      |  SELECT 'R' || CAST(CASE WHEN r <= rm THEN 1 ELSE 0 END AS VARCHAR)
      |    || 'F' || CAST(CASE WHEN f >= fm THEN 1 ELSE 0 END AS VARCHAR)
      |    || 'M' || CAST(CASE WHEN m_cents >= mm THEN 1 ELSE 0 END AS VARCHAR)
      |    AS segment, m_cents
      |  FROM cust CROSS JOIN med)
      |SELECT segment, COUNT(*)::BIGINT n_customers,
      |  FLOOR(SUM(m_cents)::BIGINT / COUNT(*) / 100.0 * 10000 + 0.5) / 10000
      |    AS avg_spend
      |FROM seg GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
    val mx = o.agg(max(col("o_orderdate")).as("m"))
    val cust = o.crossJoin(broadcast(mx))
      .groupBy(col("o_custkey"))
      .agg(
        datediff(max(col("m")), max(col("o_orderdate"))).cast("long").as("r"),
        count(lit(1)).as("f"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
          .cast("long").as("m_cents"))
    val med = cust.agg(
      percentile(col("r"), lit(0.5)).as("rm"),
      percentile(col("f"), lit(0.5)).as("fm"),
      percentile(col("m_cents"), lit(0.5)).as("mm"))
    def flag(c: Column): Column = when(c, "1").otherwise("0")
    val seg = cust.crossJoin(broadcast(med))
      .select(concat(lit("R"), flag(col("r") <= col("rm")),
        lit("F"), flag(col("f") >= col("fm")),
        lit("M"), flag(col("m_cents") >= col("mm"))).as("segment"),
        col("m_cents"))
    seg.groupBy(col("segment"))
      .agg(count(lit(1)).as("n_customers"),
        (floor(sum(col("m_cents")).cast("long") / count(lit(1)) / 100.0
          * 10000 + 0.5) / 10000).as("avg_spend"))
      .orderBy(col("segment"))
  }

  /** 2-D skyline (Pareto frontier) of parts on (price low, size
    * high): a part survives iff no part is strictly cheaper AND
    * strictly larger — the classic dominance query, whose textbook
    * form is a sequential running max over the GLOBAL price order
    * (an Exchange SinglePartition that funnels the corpus into one
    * task). Scale-right decomposition: the dominance test only needs
    * `max(size) over strictly-cheaper price GROUPS`, so (1) group to
    * distinct prices (corpus → price-domain cardinality), (2) band by
    * integer price, (3) within-band cummax windows parallelize per
    * band, (4) the cross-band prefix runs over the BANDS frame —
    * bounded by the price domain, not the row count (the O(#sources)
    * broadcast rule). The oracle replays the plain global-window
    * form — semantically identical, and DuckDB is welcome to the
    * single-threaded sort at oracle scale. */
  val qSkyline: Q = Q(
    "q_skyline",
    """WITH g AS (
      |  SELECT p_retailprice pr, MAX(p_size) mx FROM part GROUP BY 1),
      |cm AS (
      |  SELECT pr, MAX(mx) OVER (ORDER BY pr
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) pm
      |  FROM g)
      |SELECT p_partkey, p_retailprice, p_size
      |FROM part JOIN cm ON p_retailprice = cm.pr
      |WHERE pm IS NULL OR pm <= p_size
      |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    val part = Tables.part(s, dir)
    val g = part.groupBy(col("p_retailprice").as("pr"))
      .agg(max(col("p_size")).as("mx"))
      .withColumn("band", floor(col("pr")).cast("long"))
    val inBand = Window.partitionBy(col("band")).orderBy(col("pr"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bands = g.groupBy(col("band")).agg(max(col("mx")).as("bmx"))
    // the bands frame is bounded by the price DOMAIN (≈1.2k bands for
    // TPC-H retail prices) — a single-partition window over it is the
    // broadcast-scalar pattern, not a corpus funnel
    val bandPrev = Window.orderBy(col("band"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bandsPm = bands.withColumn("bpm", max(col("bmx")).over(bandPrev))
    val cm = g.join(bandsPm, "band")
      .withColumn("ipm", max(col("mx")).over(inBand))
      .select(col("pr"), greatest(col("bpm"), col("ipm")).as("pm"))
    part.join(cm, col("p_retailprice") === col("pr"))
      .filter(col("pm").isNull || col("pm") <= col("p_size"))
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .orderBy(col("p_partkey"))
  }

  /** Approximate query processing by deterministic 10% sampling: the
    * expansion estimator with a 95% CI, the AQP pattern (BlinkDB) a
    * 100 TB interactive layer runs before committing to a full scan.
    * The sample predicate is a portable md5 slot on the row key — no
    * rand(), so the estimate is reproducible on any engine at any
    * parallelism — and the CI comes from EXACT decimal sums (Σq, Σq²)
    * with one double formula at the end, so no float accumulation
    * order can flap the gate. At scale the sample filter evaluates
    * map-side in the scan stage and the aggregation combines
    * partially; nothing materializes the full table. */
  val qSampleAgg: Q = Q(
    "q_sample_agg",
    """WITH s AS (
      |  SELECT l_returnflag, CAST(l_quantity AS DECIMAL(18,2)) AS q
      |  FROM lineitem
      |  WHERE ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '-'
      |    || CAST(l_linenumber AS VARCHAR)), 1, 10))::BIGINT % 10 = 0),
      |a AS (
      |  SELECT l_returnflag, COUNT(*) AS n, SUM(q) AS sq,
      |    SUM(q * q) AS sqq
      |  FROM s GROUP BY 1)
      |SELECT l_returnflag, n AS n_sample,
      |  CAST(sq AS DOUBLE) * 10 AS est_sum,
      |  ROUND(19.6 * SQRT(CAST(n AS DOUBLE)
      |    * ((CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE)
      |        - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
      |      / NULLIF(CAST(n AS DOUBLE) * (n - 1), 0.0))), 4) + 0
      |    AS ci_half
      |FROM a ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    val slot = conv(substring(md5(concat(
        col("l_orderkey").cast("string"), lit("-"),
        col("l_linenumber").cast("string"))), 1, 10), 16, 10)
      .cast("long") % 10
    Tables.lineitem(s, dir)
      .filter(slot === 0)
      .select(col("l_returnflag"), money(col("l_quantity")).as("q"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("sq"),
        sum(col("q") * col("q")).as("sqq"))
      .select(col("l_returnflag"), col("n").as("n_sample"),
        (col("sq").cast("double") * 10).as("est_sum"),
        (round(lit(19.6) * sqrt(col("n").cast("double")
          * ((col("n").cast("double") * col("sqq").cast("double")
              - col("sq").cast("double") * col("sq").cast("double"))
            / nullif(col("n").cast("double") * (col("n") - 1),
              lit(0.0)))), 4) + 0)
          .as("ci_half"))
      .orderBy(col("l_returnflag"))
  }

  /** Differentially private release of per-group counts: Laplace(1/ε)
    * noise (ε=1) via the inverse CDF over a uniform DERIVED
    * DETERMINISTICALLY from the group key (md5 → 40-bit slot →
    * (slot+0.5)/2^40 − 0.5, open interval so ln never sees 0) — the
    * seeded-noise construction a production privacy layer uses so a
    * re-run publishes the SAME release instead of leaking fresh
    * samples of the true count (each re-randomized release spends ε
    * again; a pinned release doesn't). Counts are exact integers,
    * the noise formula is one fixed double expression — identical on
    * both engines. */
  val qDpCounts: Q = Q(
    "q_dp_counts",
    s"""WITH g AS (
      |  SELECT o_orderpriority, COUNT(*) AS n FROM orders GROUP BY 1),
      |u AS (
      |  SELECT o_orderpriority, n,
      |    ${graft.functions.Slots.uniformOpenSql("dp1", "o_orderpriority")}
      |      - 0.5 AS u
      |  FROM g)
      |SELECT o_orderpriority,
      |  ROUND(n - (CASE WHEN u < 0 THEN -1.0 ELSE 1.0 END)
      |    * LN(1 - 2 * ABS(u)), 4) + 0 AS dp_count
      |FROM u ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    val u = graft.functions.Slots.uniformOpen("dp1",
      col("o_orderpriority")) - 0.5
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .withColumn("u", u)
      .select(col("o_orderpriority"),
        (round(col("n") - when(col("u") < 0, -1.0).otherwise(1.0)
          * log(lit(1) - lit(2) * abs(col("u"))), 4) + 0).as("dp_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** Cohort LTV triangle: customers grouped by first-order month,
    * revenue tracked by months-since-cohort age — the retention
    * economics query every growth team runs. Two shuffles, both on
    * o_custkey (the cohort aggregate and the join back are
    * co-partitioned — AQE reuses the exchange), then one
    * map-side-combining rollup on the tiny (cohort, age) domain.
    * Month arithmetic is integer (year*12+month deltas), revenue is
    * decimal-exact. */
  val qCohortLtv: Q = Q(
    "q_cohort_ltv",
    """WITH f AS (
      |  SELECT o_custkey, MIN(date_trunc('month', o_orderdate)) AS cohort
      |  FROM orders GROUP BY 1),
      |j AS (
      |  SELECT CAST(f.cohort AS DATE) AS cohort_month,
      |    CAST((year(o.o_orderdate) - year(f.cohort)) * 12
      |      + (month(o.o_orderdate) - month(f.cohort)) AS BIGINT)
      |      AS age_months,
      |    o.o_custkey, CAST(o.o_totalprice AS DECIMAL(18,2)) AS p
      |  FROM orders o JOIN f ON o.o_custkey = f.o_custkey)
      |SELECT cohort_month, age_months,
      |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
      |  CAST(SUM(p) AS DOUBLE) AS revenue
      |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
    val f = o.groupBy(col("o_custkey"))
      .agg(min(to_date(date_trunc("month", col("o_orderdate"))))
        .as("cohort"))
    o.join(f, Seq("o_custkey"))
      .select(col("cohort").as("cohort_month"),
        ((year(col("o_orderdate")) - year(col("cohort"))) * 12
          + (month(col("o_orderdate")) - month(col("cohort"))))
          .cast("long").as("age_months"),
        col("o_custkey"), money(col("o_totalprice")).as("p"))
      .groupBy(col("cohort_month"), col("age_months"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        sum(col("p")).cast("double").as("revenue"))
      .orderBy(col("cohort_month"), col("age_months"))
  }

  /** Distribution shape in one pass: mean, population stddev,
    * skewness, and excess kurtosis per group from the four raw power
    * sums — the single-scan moments pattern (no second pass over
    * centered residuals). l_quantity is integral (1..50), so Σq..Σq⁴
    * are EXACT BIGINTs (q⁴ ≤ 6.25e6 — the sums hold exactly to
    * ~10^12 rows) and the raw→central moment conversion is one fixed
    * double expression per group: bit-identical across engines, no
    * float accumulation anywhere. */
  val qMoments: Q = Q(
    "q_moments",
    """WITH s AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    SUM(CAST(l_quantity AS BIGINT)) AS s1,
      |    SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
      |      AS s2,
      |    SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
      |      * CAST(l_quantity AS BIGINT)) AS s3,
      |    SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
      |      * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
      |      AS s4
      |  FROM lineitem GROUP BY 1),
      |m AS (
      |  SELECT l_returnflag, n,
      |    CAST(s1 AS DOUBLE) / n AS m1, CAST(s2 AS DOUBLE) / n AS m2,
      |    CAST(s3 AS DOUBLE) / n AS m3, CAST(s4 AS DOUBLE) / n AS m4
      |  FROM s),
      |ctr AS (
      |  SELECT l_returnflag, n, m1,
      |    m2 - m1 * m1 AS v,
      |    m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1 AS u3,
      |    m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2 - 3 * m1 * m1 * m1 * m1
      |      AS u4
      |  FROM m)
      |SELECT l_returnflag, n,
      |  ROUND(m1, 6) + 0 AS mean,
      |  ROUND(SQRT(v), 6) + 0 AS stddev_pop,
      |  ROUND(u3 / NULLIF(SQRT(v) * v, 0.0), 6) + 0 AS skewness,
      |  ROUND(u4 / NULLIF(v * v, 0.0) - 3, 6) + 0 AS kurtosis_excess
      |FROM ctr ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    val q = col("l_quantity").cast("long")
    val base = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(q).as("s1"),
        sum(q * q).as("s2"), sum(q * q * q).as("s3"),
        sum(q * q * q * q).as("s4"))
      .select(col("l_returnflag"), col("n"),
        (col("s1").cast("double") / col("n")).as("m1"),
        (col("s2").cast("double") / col("n")).as("m2"),
        (col("s3").cast("double") / col("n")).as("m3"),
        (col("s4").cast("double") / col("n")).as("m4"))
    val v = col("m2") - col("m1") * col("m1")
    val u3 = col("m3") - lit(3) * col("m1") * col("m2") +
      lit(2) * col("m1") * col("m1") * col("m1")
    val u4 = col("m4") - lit(4) * col("m1") * col("m3") +
      lit(6) * col("m1") * col("m1") * col("m2") -
      lit(3) * col("m1") * col("m1") * col("m1") * col("m1")
    base.select(col("l_returnflag"), col("n"),
        (round(col("m1"), 6) + 0).as("mean"),
        (round(sqrt(v), 6) + 0).as("stddev_pop"),
        (round(u3 / nullif(sqrt(v) * v, lit(0.0)), 6) + 0).as("skewness"),
        (round(u4 / nullif(v * v, lit(0.0)) - 3, 6) + 0)
          .as("kurtosis_excess"))
      .orderBy(col("l_returnflag"))
  }

  /** Decile lift / gains table — the model-evaluation query every
    * scoring pipeline ships (here: the quality score "predicting" the
    * langid gate, the two registered signals): exact decile
    * boundaries via ONE percentile aggregate broadcast back (the
    * q_rfm_segments rule — never an NTILE over a global sort), decile
    * assignment a per-row compare ON THE 4dp INTEGER GRID the scores
    * live on (boundary values quantized identically on both engines —
    * an interpolated boundary inside a tie run lands exactly on a
    * grid value, where a raw double compare is ulp-sensitive), then
    * counts, cumulative
    * top-down gains, and lift over the base rate. The only window
    * runs on the 10-row decile frame (the bounded-bands rule); all
    * rates are single divisions of exact integers. */
  val qDecileLift: Q = {
    val qualSub = graft.queries.Text.quality.oracle.get
    val langSub = graft.queries.Text.langid.oracle.get
    Q(
      "q_decile_lift",
      s"""WITH qq AS (
        |  SELECT doc_id, quality_score FROM ($qualSub)),
        |ll AS (SELECT doc_id, predicted_lang FROM ($langSub)),
        |s AS (
        |  SELECT qq.doc_id, qq.quality_score AS score,
        |    CASE WHEN ll.predicted_lang = 'en' THEN 1 ELSE 0 END AS pos
        |  FROM qq JOIN ll USING (doc_id)),
        |b AS (
        |  SELECT ${(1 to 9).map(j =>
             s"CAST(QUANTILE_CONT(score, 0.$j) AS DOUBLE) AS b$j")
             .mkString(", ")}
        |  FROM s),
        |d AS (
        |  SELECT pos, 1 + ${(1 to 9).map(j =>
             "(CASE WHEN FLOOR(score * 10000 + 0.5) " +
               s"> FLOOR(b$j * 10000 + 0.5) THEN 1 ELSE 0 END)")
             .mkString(" + ")}
        |    AS decile
        |  FROM s CROSS JOIN b),
        |g AS (
        |  SELECT decile, COUNT(*) AS n, SUM(pos)::BIGINT AS np
        |  FROM d GROUP BY 1),
        |t AS (SELECT SUM(n)::BIGINT AS tn, SUM(np)::BIGINT AS tp FROM g),
        |c AS (
        |  SELECT decile, n, np,
        |    CAST(SUM(n) OVER w AS BIGINT) AS cn,
        |    CAST(SUM(np) OVER w AS BIGINT) AS cp
        |  FROM g WINDOW w AS (ORDER BY decile DESC
        |    ROWS UNBOUNDED PRECEDING))
        |SELECT CAST(decile AS BIGINT) AS decile, n, np AS n_pos,
        |  ROUND(CAST(cp AS DOUBLE) / cn, 4) + 0 AS cum_rate,
        |  ROUND((CAST(cp AS DOUBLE) / cn)
        |    / (CAST(tp AS DOUBLE) / tn), 4) + 0 AS lift
        |FROM c CROSS JOIN t ORDER BY decile DESC""".stripMargin) {
      (s, dir) =>
        val docs = Tables.documents(s, dir)
        val scored = graft.queries.Text.qualityFrom(docs)
          .select(col("doc_id"), col("quality_score").as("score"))
          .join(graft.queries.Text.langidFrom(docs)
            .select(col("doc_id"),
              (col("predicted_lang") === "en").cast("int").as("pos")),
            Seq("doc_id"))
        val b = scored.agg(
          (1 to 9).map(j => percentile(col("score"), lit(j / 10.0))
            .as(s"b$j")).head,
          (2 to 9).map(j => percentile(col("score"), lit(j / 10.0))
            .as(s"b$j")): _*)
        // compare on the 4dp integer grid the scores live on: the
        // exact-percentile boundary can differ between engines by an
        // ulp when it interpolates within a TIE RUN (it lands exactly
        // ON a grid value), and a raw double compare would flip every
        // doc sitting on that boundary — caught by the sf0.1 gate
        val d = scored.crossJoin(broadcast(b))
          .select(col("pos"),
            (1 to 9).map(j =>
              when(floor(col("score") * 10000 + 0.5)
                > floor(col(s"b$j") * 10000 + 0.5), 1).otherwise(0))
              .foldLeft(lit(1))(_ + _).as("decile"))
        val g = d.groupBy(col("decile"))
          .agg(count(lit(1)).as("n"), sum(col("pos")).cast("long").as("np"))
          .cache() // feeds the totals agg and the cumulative window
        val t = g.agg(sum(col("n")).cast("long").as("tn"),
          sum(col("np")).cast("long").as("tp"))
        val w = Window.orderBy(col("decile").desc)
          .rowsBetween(Window.unboundedPreceding, 0)
        g.select(col("decile"), col("n"), col("np"),
            sum(col("n")).over(w).cast("long").as("cn"),
            sum(col("np")).over(w).cast("long").as("cp"))
          .crossJoin(broadcast(t))
          .select(col("decile").cast("long").as("decile"), col("n"),
            col("np").as("n_pos"),
            (round(col("cp").cast("double") / col("cn"), 4) + 0)
              .as("cum_rate"),
            (round((col("cp").cast("double") / col("cn"))
              / (col("tp").cast("double") / col("tn")), 4) + 0).as("lift"))
          .orderBy(col("decile").desc)
    }
  }

  /** Table profiling — the Deequ/Great-Expectations ANALYZE pass a
    * pipeline runs before trusting a new source: per-column row/null/
    * distinct counts and numeric min/max, ALL columns in ONE scan (25
    * aggregate expressions over one pass, melted to rows by a bounded
    * explode — never a scan per column). Exact distincts here for the
    * gate; at 100 TB the same shape swaps in approx_count_distinct
    * (q_approx_distinct's sketch), nothing else moves. */
  val qProfile: Q = {
    val numCols = Seq("l_quantity", "l_extendedprice", "l_discount",
      "l_tax")
    val allCols = numCols :+ "l_returnflag"
    Q(
      "q_profile",
      allCols.map { c =>
        val mn =
          if (numCols.contains(c)) s"CAST(MIN($c) AS DOUBLE)" else "NULL"
        val mx =
          if (numCols.contains(c)) s"CAST(MAX($c) AS DOUBLE)" else "NULL"
        s"""SELECT '$c' AS column_name, COUNT(*) AS n,
          |  COUNT(*) - COUNT($c) AS n_null,
          |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
          |  $mn AS min_val, $mx AS max_val
          |FROM lineitem""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")) {
      (s, dir) =>
        val aggs = allCols.flatMap { c =>
          val mn = if (numCols.contains(c)) min(col(c)).cast("double")
            else lit(null).cast("double")
          val mx = if (numCols.contains(c)) max(col(c)).cast("double")
            else lit(null).cast("double")
          Seq(count(lit(1)).as(s"${c}__n"),
            (count(lit(1)) - count(col(c))).as(s"${c}__nn"),
            countDistinct(col(c)).as(s"${c}__nd"),
            mn.as(s"${c}__mn"), mx.as(s"${c}__mx"))
        }
        Tables.lineitem(s, dir).agg(aggs.head, aggs.tail: _*)
          .select(explode(array(allCols.map(c => struct(
            lit(c).as("column_name"), col(s"${c}__n").as("n"),
            col(s"${c}__nn").as("n_null"), col(s"${c}__nd").as("n_distinct"),
            col(s"${c}__mn").as("min_val"),
            col(s"${c}__mx").as("max_val"))): _*)).as("r"))
          .select(col("r.*"))
          .orderBy(col("column_name"))
    }
  }

  /** q_profile's 100 TB form, written down (VERDICT r13 #6): the SAME
    * one-scan melted profile with the per-column distinct count as a
    * mergeable HLL sketch (approx_count_distinct, 1% rsd) — the only
    * change the scale-up needs, because an exact COUNT(DISTINCT) per
    * column at 100 TB is a full shuffle of every column's values
    * while the sketch folds map-side into a few KB. Gated the
    * q_approx_distinct way: the hashed result carries the EXACT
    * distincts (the oracle's replay) plus a deterministic approx_ok
    * flag asserting the sketch landed within 5% (3σ at 1% rsd) —
    * both the exact and sketch aggregates ride the one scan, so the
    * plan stays the single-pass ANALYZE. */
  val qProfileApprox: Q = {
    val numCols = Seq("l_quantity", "l_extendedprice", "l_discount",
      "l_tax")
    val allCols = numCols :+ "l_returnflag"
    Q(
      "q_profile_approx",
      allCols.map { c =>
        s"""SELECT '$c' AS column_name, COUNT(*) AS n,
          |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
          |  TRUE AS approx_ok
          |FROM lineitem""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")) {
      (s, dir) =>
        val aggs = allCols.flatMap { c =>
          Seq(count(lit(1)).as(s"${c}__n"),
            countDistinct(col(c)).as(s"${c}__nd"),
            approx_count_distinct(col(c), 0.01).as(s"${c}__ad"))
        }
        Tables.lineitem(s, dir).agg(aggs.head, aggs.tail: _*)
          .select(explode(array(allCols.map(c => struct(
            lit(c).as("column_name"), col(s"${c}__n").as("n"),
            col(s"${c}__nd").as("n_distinct"),
            (abs(col(s"${c}__ad") - col(s"${c}__nd"))
              <= greatest(lit(1L),
                (col(s"${c}__nd") * 0.05).cast("long")))
              .as("approx_ok"))): _*)).as("r"))
          .select(col("r.*"))
          .orderBy(col("column_name"))
    }
  }

  /** Sketch SET ALGEBRA: distinct-user overlap between event-type
    * pairs by inclusion-exclusion over mergeable HLL sketches —
    * |A∩B| ≈ |A| + |B| − |A∪B|, the audience-overlap query a 100 TB
    * warehouse answers without an exact double-distinct shuffle
    * (sketches merge map-side; the union sketch is one more merge,
    * not a second scan). Oracle shape = q_approx_distinct's: exact
    * counts replayed in SQL plus approx_ok asserting the estimate
    * inside 15% of truth (three 1%-rsd sketches compose; the bound is
    * deterministic at this seed and corpus). */
  val qSetSketch: Q = Q(
    "q_set_sketch",
    """WITH p(ta, tb) AS (
      |  VALUES ('click', 'purchase'), ('view', 'click'),
      |    ('view', 'purchase')),
      |j AS (
      |  SELECT p.ta, p.tb, e.user_id
      |  FROM p JOIN events e ON e.event_type IN (p.ta, p.tb)),
      |u AS (
      |  SELECT ta, tb, COUNT(DISTINCT user_id) AS exact_u
      |  FROM j GROUP BY 1, 2),
      |t AS (
      |  SELECT event_type, COUNT(DISTINCT user_id) AS ex
      |  FROM events GROUP BY 1)
      |SELECT u.ta, u.tb, a.ex AS exact_a, b.ex AS exact_b,
      |  CAST(a.ex + b.ex - u.exact_u AS BIGINT) AS exact_inter,
      |  TRUE AS approx_ok
      |FROM u JOIN t a ON u.ta = a.event_type
      |JOIN t b ON u.tb = b.event_type
      |ORDER BY ta, tb""".stripMargin) { (s, dir) =>
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select(col("event_type"), col("user_id"))
    val byType = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("ex"),
        approx_count_distinct(col("user_id"), 0.01).as("est"))
    val pairs = Seq(("click", "purchase"), ("view", "click"),
      ("view", "purchase")).toDF("ta", "tb")
    // a 3-row broadcast fans events into their pairs; the per-pair
    // union sketch is ONE more merge pass, never a second exact
    // double-distinct shuffle per pair
    val perPair = ev.join(broadcast(pairs),
        col("event_type") === col("ta") || col("event_type") === col("tb"))
      .groupBy(col("ta"), col("tb"))
      .agg(countDistinct(col("user_id")).as("exact_u"),
        approx_count_distinct(col("user_id"), 0.01).as("est_u"))
    perPair
      .join(broadcast(byType.select(col("event_type").as("ta"),
        col("ex").as("exact_a"), col("est").as("est_a"))), Seq("ta"))
      .join(broadcast(byType.select(col("event_type").as("tb"),
        col("ex").as("exact_b"), col("est").as("est_b"))), Seq("tb"))
      .select(col("ta"), col("tb"), col("exact_a"), col("exact_b"),
        (col("exact_a") + col("exact_b") - col("exact_u"))
          .cast("long").as("exact_inter"),
        (abs((col("est_a") + col("est_b") - col("est_u"))
            - (col("exact_a") + col("exact_b") - col("exact_u")))
          <= greatest(lit(1L),
            ((col("exact_a") + col("exact_b") - col("exact_u"))
              * 0.15).cast("long"))).as("approx_ok"))
      .orderBy(col("ta"), col("tb"))
  }

  /** Benford leading-digit profile over order totals — the classic
    * data-forensics screen (fraudulent/synthetic numeric columns
    * betray themselves by a non-logarithmic first-digit law). Prices
    * are 2dp, so the digit comes from EXACT integer cents
    * (floor(x·100+0.5) — never from a float's string rendering,
    * which engines format differently); observed shares are integer
    * ppm divisions and the Benford expectation is a LITERAL 9-row
    * table baked identically into both engines (computing
    * log10(1+1/d) live would put a library-ulp under a floor()).
    * Scale: one scan, one 9-key agg — map-side partials do all the
    * work. */
  val qBenford: Q = {
    val exp = Seq(1 -> 301029L, 2 -> 176091L, 3 -> 124938L,
      4 -> 96910L, 5 -> 79181L, 6 -> 66946L, 7 -> 57991L,
      8 -> 51152L, 9 -> 45757L)
    val expSql = exp.map { case (d, p) => s"($d, $p)" }.mkString(", ")
    Q(
      "q_benford",
      s"""WITH bexp(digit, exp_ppm) AS (VALUES $expSql),
        |c AS (
        |  SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice * 100 + 0.5)
        |      AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |  FROM orders),
        |obs AS (
        |  SELECT digit, COUNT(*) AS n,
        |    1000000 * COUNT(*) // (SELECT COUNT(*) FROM c) AS obs_ppm
        |  FROM c GROUP BY digit)
        |SELECT digit, n, obs_ppm, exp_ppm,
        |  ABS(obs_ppm - exp_ppm) AS dev_ppm
        |FROM obs JOIN bexp USING (digit)
        |ORDER BY digit""".stripMargin) { (s, dir) =>
      import s.implicits._
      val expDf = exp.map { case (d, p) => (d.toLong, p) }
        .toDF("digit", "exp_ppm")
      val c = Tables.orders(s, dir).select(
        substring(floor(col("o_totalprice") * 100 + 0.5).cast("long")
          .cast("string"), 1, 1).cast("long").as("digit"))
      val total = c.agg(count(lit(1)).as("total"))
      c.groupBy("digit").agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(total))
        .join(broadcast(expDf), "digit")
        .select(col("digit"), col("n"),
          // integer DIV, not float divide: at 1e12 rows a double
          // quotient's 1e-10 absolute error can cross the floor
          expr("1000000 * n DIV total").as("obs_ppm"), col("exp_ppm"))
        .select(col("digit"), col("n"), col("obs_ppm"), col("exp_ppm"),
          abs(col("obs_ppm") - col("exp_ppm")).as("dev_ppm"))
        .orderBy("digit")
    }
  }

  /** Robust per-group outlier detection: median absolute deviation
    * (MAD) with the 1.4826 normal-consistency factor — the screen
    * that survives the heavy tails that break mean±3σ. EVERYTHING is
    * exact integer arithmetic: values quantize to micro units; the
    * interpolated median of integers is a .5-dyadic, so carrying it
    * DOUBLED (med2 = 2·median(m), mad4 = 2·median(dev2)) keeps every
    * intermediate an exactly-representable integer, and the outlier
    * test 20000·dev2 > 44478·mad4 (= |v−med|·10⁴ > 3·1.4826·MAD·10⁴)
    * is a pure BIGINT compare — no float enters after the initial
    * quantization, so the oracle cannot diverge on boundary ties at
    * any scale. Scale shape: two grouped percentile aggs + two
    * broadcast joins of a #-event-types-row frame; the fact table
    * shuffles ONCE per agg on its group key. */
  val qOutlierMad: Q = Q(
    "q_outlier_mad",
    """WITH m AS (
      |  SELECT event_type,
      |    CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS m
      |  FROM events),
      |med AS (
      |  SELECT event_type,
      |    CAST(2 * percentile_cont(0.5) WITHIN GROUP (ORDER BY m)
      |      AS BIGINT) AS med2
      |  FROM m GROUP BY event_type),
      |dev AS (
      |  SELECT m.event_type, ABS(2 * m.m - med.med2) AS dev2, med.med2
      |  FROM m JOIN med USING (event_type)),
      |mad AS (
      |  SELECT event_type,
      |    CAST(2 * percentile_cont(0.5) WITHIN GROUP (ORDER BY dev2)
      |      AS BIGINT) AS mad4
      |  FROM dev GROUP BY event_type)
      |SELECT d.event_type, COUNT(*) AS n,
      |  MAX(d.med2) AS med2_micro, MAX(mad.mad4) AS mad4_micro,
      |  CAST(SUM(CASE WHEN 20000 * d.dev2 > 44478 * mad.mad4
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      |  1000000 * CAST(SUM(CASE WHEN 20000 * d.dev2 > 44478 * mad.mad4
      |    THEN 1 ELSE 0 END) AS BIGINT) // COUNT(*) AS out_ppm
      |FROM dev d JOIN mad USING (event_type)
      |GROUP BY d.event_type
      |ORDER BY d.event_type""".stripMargin) { (s, dir) =>
    val m = Tables.events(s, dir).select(col("event_type"),
      floor(col("value") * 1000000 + 0.5).cast("long").as("m"))
    val med = m.groupBy("event_type").agg(
      (percentile(col("m"), lit(0.5)) * 2).cast("long").as("med2"))
    val dev = m.join(broadcast(med), "event_type")
      .select(col("event_type"),
        abs(lit(2) * col("m") - col("med2")).as("dev2"), col("med2"))
    val mad = dev.groupBy("event_type").agg(
      (percentile(col("dev2"), lit(0.5)) * 2).cast("long").as("mad4"))
    dev.join(broadcast(mad), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        max(col("med2")).as("med2_micro"),
        max(col("mad4")).as("mad4_micro"),
        sum(when(lit(20000) * col("dev2") > lit(44478) * col("mad4"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .select(col("event_type"), col("n"), col("med2_micro"),
        col("mad4_micro"), col("n_outliers"),
        expr("1000000 * n_outliers DIV n").as("out_ppm"))
      .orderBy("event_type")
  }

  val all: Seq[Q] = Seq(
    q1Agg, qFilterProject, q3JoinTopk, q5MultiJoin, qWindowRank, qSemiJoin,
    qAntiJoin, qRollup, qCube, qPercentiles, qTopkGlobal, qPivot, qDistinct,
    qTopkPerKey, qApproxDistinct, qApproxQuantiles, qRunningSum, qNtile,
    qSetOps, qCorrelated, qGroupingSets, qUnpivot, qBloomJoin, qIncrementalAgg,
    qMergeUpsert, qAvgFilter, qBasketLift, qRfmSegments, qSkyline,
    qSampleAgg, qDpCounts, qCohortLtv, qMoments, qDecileLift, qProfile,
    qProfileApprox, qSetSketch, qBenford, qOutlierMad)
}
