package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.functions.Exact._
import graft.sources.Tables

/** Time-series operators over the events table. The batch expressions
  * here are written in the same shape their Structured Streaming
  * twins use (see graft.streaming.StreamOps / StreamingSpec):
  * `window()` tumbling aggregation and gap-based sessionization. */
object Events {

  /** Tumbling 1-hour window aggregation — epoch-aligned, identical to
    * DuckDB date_trunc. Streaming twin: readStream + watermark. */
  val windowAgg: Q = Q(
    "events_window_agg",
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(money(col("value"))).cast(DoubleType).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))
  }

  /** Gap sessionization over any (user_id, ts, value) frame: one
    * shuffle on user_id, then two window passes (lag → gap flags,
    * running sum → session ids) and a partial-aggregating groupBy.
    * Boundary contract: a gap of EXACTLY the threshold MERGES (only
    * a strictly-greater gap starts a new session). That is Structured
    * Streaming's empirical session_window behavior — an event landing
    * exactly at prev_ts + gap extends the session — so batch, the
    * DuckDB oracle below, and the streaming twin (StreamOps
    * .sessionAgg) all encode strictly-greater; StreamingSpec pins the
    * boundary on both sides (== merges, +1s splits). */
  private[graft] def sessionizeDf(events: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    events
      .withColumn("new_sess",
        when(lag(col("ts"), 1).over(byUser).isNull ||
          unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(byUser))
            > 1800000000L, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("new_sess")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        sum(money(col("value"))).cast(DoubleType).as("sum_value"))
  }

  /** 30-minute-gap sessionization. No driver-side state; scales to
    * any number of users. */
  val sessionize: Q = Q(
    "events_sessionize",
    """WITH x AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |      THEN 1 ELSE 0 END AS new_sess
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |y AS (
      |  SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM x)
      |SELECT user_id, session_id, COUNT(*) AS n_events,
      |  MIN(ts) AS session_start, MAX(ts) AS session_end,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM y GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin) { (s, dir) =>
    sessionizeDf(Tables.events(s, dir).select(col("user_id"), col("ts"), col("value")))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** As-of join without a theta join: union events + orders tagged by
    * kind, one window pass per user carries the latest order date
    * forward. O(n log n) per user partition — the 100 TB-safe plan
    * (a naive join-then-filter would fan out events × orders). */
  val asofJoin: Q = Q(
    "q_asof_join",
    """SELECT event_id, user_id,
      |  (SELECT MAX(o_orderdate) FROM orders
      |    WHERE o_custkey = user_id AND o_orderdate <= ts) AS last_orderdate,
      |  (SELECT COUNT(*) FROM orders
      |    WHERE o_custkey = user_id AND o_orderdate <= ts) AS n_prior_orders
      |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir).select(
      col("user_id"), col("ts"), lit(1).as("kind"),
      lit(null).cast("timestamp").as("odate"), col("event_id"))
    val ord = Tables.orders(s, dir).select(
      col("o_custkey").as("user_id"), col("o_orderdate").as("ts"),
      lit(0).as("kind"), col("o_orderdate").as("odate"),
      lit(null).cast("long").as("event_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, 0)
    ev.unionByName(ord)
      .withColumn("last_orderdate", max(col("odate")).over(w))
      .withColumn("n_prior_orders",
        sum(when(col("kind") === 0, 1).otherwise(0)).over(w))
      .filter(col("kind") === 1)
      .select(col("event_id"), col("user_id"), col("last_orderdate"),
        col("n_prior_orders"))
      .orderBy(col("event_id"))
  }

  /** Semi-structured extraction: the props JSON column parsed in the
    * engine (get_json_object) and aggregated — the ubiquitous
    * event-payload pattern. */
  val jsonExtract: Q = Q(
    "events_json_extract",
    """SELECT event_type,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  COUNT(json_extract_string(props, '$.k')) AS n_with_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n_with_k"))
      .orderBy(col("event_type"))
  }

  /** The same payload extraction through Spark 4's VARIANT type
    * (parse once into the binary semi-structured encoding, then typed
    * path access) — at 100 TB the parse-once variant column beats
    * per-access get_json_object string re-parsing whenever more than
    * one field is read. Same oracle family as events_json_extract
    * proves value parity of the two access paths. */
  val variantExtract: Q = Q(
    "events_variant_extract",
    """SELECT event_type,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  COUNT(json_extract_string(props, '$.k')) AS n_with_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .select(col("event_type"), try_parse_json(col("props")).as("v"))
      .select(col("event_type"),
        try_variant_get(col("v"), "$.k", "long").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n_with_k"))
      .orderBy(col("event_type"))
  }

  /** Deterministic argmax: each order's highest-quantity line item via
    * a single max(struct(...)) aggregation — no join-back, no window,
    * ties broken by line number inside the struct ordering. */
  val argmaxJoin: Q = Q(
    "q_argmax",
    """SELECT o_orderkey, best_qty, best_line FROM (
      |  SELECT l_orderkey AS o_orderkey, l_quantity AS best_qty,
      |    l_linenumber AS best_line, ROW_NUMBER() OVER (
      |      PARTITION BY l_orderkey
      |      ORDER BY l_quantity DESC, l_linenumber DESC) rn
      |  FROM lineitem) WHERE rn = 1
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(max(struct(col("l_quantity"), col("l_linenumber"))).as("m"))
      .select(col("o_orderkey"), col("m.l_quantity").as("best_qty"),
        col("m.l_linenumber").as("best_line"))
      .orderBy(col("o_orderkey"))
  }

  /** The same as-of semantics through the NATIVE operator
    * (graft.plans.AsOfJoinExec — custom LogicalPlan + Strategy +
    * physical merge): one linear pass over co-partitioned sorted
    * sides, versus the composed union+window. Same oracle family as
    * q_asof_join proves the operator. */
  val asofNative: Q = Q(
    "q_asof_native",
    """SELECT event_id, user_id,
      |  (SELECT MAX(o_orderdate) FROM orders
      |    WHERE o_custkey = user_id AND o_orderdate <= ts) AS last_orderdate
      |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir).select(col("event_id"), col("user_id"), col("ts"))
    // distinct (key, date) pairs: the only payload is the date itself,
    // so tie-order among same-date orders cannot leak into the output
    val ord = Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderdate")).distinct()
    graft.operators.AsOf.join(ev, ord, "user_id", "ts", "o_custkey", "o_orderdate")
      .select(col("event_id"), col("user_id"),
        col("o_orderdate").as("last_orderdate"))
      .orderBy(col("event_id"))
  }

  /** Ordered conversion funnel (view → click → purchase): each stage
    * is the EARLIEST qualifying event strictly after the previous
    * stage. Three filtered aggregations joined on user_id — no
    * self-join fan-out, no window over the full event stream; each
    * pass shuffles one event-type slice. Stage timestamps are exact
    * micros, so min() ties are value-identical across engines. */
  val funnel: Q = Q(
    "events_funnel",
    """WITH u AS (SELECT DISTINCT user_id FROM events),
      |v AS (
      |  SELECT user_id, MIN(ts) AS v_ts FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |c AS (
      |  SELECT e.user_id, MIN(e.ts) AS c_ts FROM events e
      |  JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND e.ts > v.v_ts GROUP BY 1),
      |p AS (
      |  SELECT e.user_id, MIN(e.ts) AS p_ts FROM events e
      |  JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY 1)
      |SELECT u.user_id, v.v_ts, c.c_ts, p.p_ts,
      |  CASE WHEN p.p_ts IS NOT NULL THEN 3
      |       WHEN c.c_ts IS NOT NULL THEN 2
      |       WHEN v.v_ts IS NOT NULL THEN 1 ELSE 0 END AS funnel_stage
      |FROM u LEFT JOIN v ON u.user_id = v.user_id
      |LEFT JOIN c ON u.user_id = c.user_id
      |LEFT JOIN p ON u.user_id = p.user_id
      |ORDER BY u.user_id""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir).select(col("user_id"), col("ts"),
      col("event_type")).cache() // three filtered slices + user universe
    val users = ev.select(col("user_id")).distinct()
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("v_ts"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts") > col("v_ts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("c_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts") > col("c_ts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("p_ts"))
    users.join(v, Seq("user_id"), "left")
      .join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("v_ts"), col("c_ts"), col("p_ts"),
        when(col("p_ts").isNotNull, 3)
          .when(col("c_ts").isNotNull, 2)
          .when(col("v_ts").isNotNull, 1)
          .otherwise(0).as("funnel_stage"))
      .orderBy(col("user_id"))
  }

  /** Weekly retention cohorts: cohort = the week of a user's first
    * event, one output row per (cohort_week, week_offset) with the
    * count of users still active. Two aggregations — per-user-week
    * distinct, then per-cell count — both partial-aggregating; the
    * cohort table joins back broadcast-small. Weeks are integer
    * epoch-micros division (exactly representable in double), so
    * bucketing is bit-identical across engines. */
  val retention: Q = Q(
    "events_retention",
    """WITH uw AS (
      |  SELECT DISTINCT user_id,
      |    CAST(FLOOR(epoch_us(ts) / 604800000000.0) AS BIGINT) AS wk
      |  FROM events),
      |cohort AS (SELECT user_id, MIN(wk) AS c0 FROM uw GROUP BY 1)
      |SELECT c.c0 AS cohort_week, uw.wk - c.c0 AS week_offset,
      |  COUNT(*) AS n_users
      |FROM uw JOIN cohort c ON uw.user_id = c.user_id
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val uw = Tables.events(s, dir)
      .select(col("user_id"),
        floor(unix_micros(col("ts")) / lit(604800000000.0)).cast("long").as("wk"))
      .distinct().cache() // consumed by the cohort agg and the join
    val cohort = uw.groupBy(col("user_id")).agg(min(col("wk")).as("c0"))
    uw.join(cohort, "user_id")
      .groupBy(col("c0").as("cohort_week"), (col("wk") - col("c0")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Range (interval) self-join: pairs of same-user events at most
    * 5 minutes apart. The range predicate alone would force a
    * nested-loop join; this plan makes it an EQUI-join on
    * (user_id, time_bucket): the left side fans out to its own
    * bucket and the next (any b with ta < tb <= ta+W lands in one of
    * the two), the right side keeps its single bucket, and the exact
    * interval predicate filters the bucket collisions — each
    * qualifying pair is found exactly once, no dedup needed.
    * Shuffle volume is 2x the fact table, never O(n²); bucket width
    * = window keeps the fan-out constant. All comparisons are in
    * truncated epoch micros, matching DuckDB's epoch_us on the
    * nanos timestamps. */
  val rangeJoin: Q = Q(
    "q_range_join",
    """SELECT a.user_id, a.event_id AS event_a, b.event_id AS event_b,
      |  epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
      |FROM events a JOIN events b ON a.user_id = b.user_id
      |  AND epoch_us(b.ts) > epoch_us(a.ts)
      |  AND epoch_us(b.ts) - epoch_us(a.ts) <= 300000000
      |ORDER BY 1, 2, 3""".stripMargin) { (s, dir) =>
    val w = 300000000L // 5 min in micros
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      // FLOOR division, not `div` (which truncates toward zero): for
      // pre-1970 timestamps (negative micros) truncation would put
      // -1 and +1 in the same bucket and break the 2-bucket fan-out
      // invariant. pmod is non-negative for a positive modulus, so
      // (us - pmod) is exactly divisible and `div` yields the floor.
      .withColumn("bk0", expr(s"(us - pmod(us, ${w}L)) div ${w}L"))
    val a = e.select(col("user_id"), col("event_id").as("event_a"),
      col("us").as("ta"),
      explode(array(col("bk0"), col("bk0") + 1)).as("bk"))
    val b = e.select(col("user_id"), col("event_id").as("event_b"),
      col("us").as("tb"), col("bk0").as("bk"))
    a.join(b, Seq("user_id", "bk"))
      .filter(col("tb") > col("ta") && col("tb") - col("ta") <= w)
      .select(col("user_id"), col("event_a"), col("event_b"),
        (col("tb") - col("ta")).as("gap_us"))
      .orderBy(col("user_id"), col("event_a"), col("event_b"))
  }

  /** Per-user z-score outliers (|z| > 1.5) with NO floating-point
    * ambiguity: sums are decimal-exact, cast to double only once
    * (values fit 2^53, so the casts and the products after them are
    * IEEE-exact), and the test compares SQUARES — 4(xn−S)² > 9(nQ−S²)
    * is |x−μ| > 1.5σ with no sqrt, no division, no order-dependent
    * float accumulation. One partial-aggregating groupBy; the stats
    * frame (one row per user) joins back with NO broadcast hint on
    * purpose — AQE broadcasts it while small, and at a 100 TB user
    * count it must be allowed to fall back to a shuffle join. */
  val anomaly: Q = Q(
    "events_anomaly",
    """WITH st AS (
      |  SELECT user_id, COUNT(*) n,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) S,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))
      |      * CAST(value AS DECIMAL(18,2))) AS DOUBLE) Q
      |  FROM events GROUP BY 1)
      |SELECT e.event_id, e.user_id, e.value
      |FROM events e JOIN st USING (user_id)
      |WHERE 4 * (CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) * n - S)
      |      * (CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) * n - S)
      |    > 9 * (n * Q - S * S)
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val st = ev.groupBy(col("user_id")).agg(
      count(lit(1)).as("n"),
      sum(money(col("value"))).cast(DoubleType).as("S"),
      sum(money(col("value")) * money(col("value")))
        .cast(DoubleType).as("Q"))
    val xd = money(col("value")).cast(DoubleType)
    val dev = xd * col("n") - col("S")
    ev.join(st, "user_id")
      .filter(lit(4) * dev * dev > lit(9) * (col("n") * col("Q")
        - col("S") * col("S")))
      .select(col("event_id"), col("user_id"), col("value"))
      .orderBy(col("event_id"))
  }

  /** Frequent event paths: the top-20 3-step event-type sequences
    * across all users — the "what do users do next" path-analysis
    * query. One window pass per user (two lead()s, no self-joins, no
    * explode), partial-aggregated counts, global top-k as
    * TakeOrderedAndProject. The window orders by event_id alone:
    * event ids are assigned in timestamp order (asserted against the
    * data), which sidesteps micro-vs-nano timestamp tie ambiguity
    * between engines. */
  val topPaths: Q = Q(
    "events_top_paths",
    """WITH seq AS (
      |  SELECT user_id, event_type AS e1,
      |    lead(event_type, 1) OVER w AS e2,
      |    lead(event_type, 2) OVER w AS e3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
      |SELECT e1, e2, e3, COUNT(*) AS cnt
      |FROM seq WHERE e3 IS NOT NULL
      |GROUP BY 1, 2, 3
      |ORDER BY cnt DESC, e1, e2, e3 LIMIT 20""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"))
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .filter(col("e3").isNotNull)
      .groupBy(col("event_type").as("e1"), col("e2"), col("e3"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("e1"), col("e2"), col("e3"))
      .limit(20)
  }

  /** Type-2 slowly-changing dimension build — the warehouse pattern
    * that turns an event stream into a versioned dimension: per user,
    * each run of consecutive equal event_types collapses to one
    * validity interval [valid_from, valid_to), the last interval open
    * (is_current). Two window passes over ONE shuffle on user_id —
    * lag() marks change points, lead() closes each interval — no
    * self-join, no driver state; the orderBy key is event_id (ids are
    * assigned in timestamp order, sidestepping micro-vs-nano tie
    * ambiguity between engines, as in events_top_paths). */
  val scd2: Q = Q(
    "events_scd2",
    """WITH x AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    CASE WHEN lag(event_type) OVER w IS NULL
      |      OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
      |y AS (
      |  SELECT user_id, event_type, ts, event_id FROM x WHERE chg = 1),
      |z AS (
      |  SELECT user_id, event_type AS status, ts AS valid_from,
      |    lead(ts) OVER w2 AS valid_to,
      |    ROW_NUMBER() OVER w2 AS version
      |  FROM y WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT user_id, version, status, valid_from, valid_to,
      |  valid_to IS NULL AS is_current
      |FROM z ORDER BY user_id, version""".stripMargin) { (s, dir) =>
    val byId = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    // interval window keeps event_id in its key: two change points at
    // the same timestamp would otherwise version nondeterministically
    // (the tie both engines' change-point window already breaks by id)
    val byTs = Window.partitionBy(col("user_id"))
      .orderBy(col("valid_from"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(byId).isNull ||
          lag(col("event_type"), 1).over(byId) =!= col("event_type"), 1)
          .otherwise(0))
      .filter(col("chg") === 1)
      .select(col("user_id"), col("event_type").as("status"),
        col("ts").as("valid_from"), col("event_id"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byTs))
      .withColumn("version", row_number().over(byTs))
      .select(col("user_id"), col("version"), col("status"),
        col("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  /** Fixed-width value histogram per event_type — the profiling query
    * behind every data-quality dashboard. Bin = floor(value/10) over
    * the DECIMAL(18,2) value (exact, so bin edges cannot straddle a
    * float rounding difference between engines); one partial-
    * aggregating groupBy, output rows = O(types x bins). */
  val histogram: Q = Q(
    "events_histogram",
    """SELECT event_type,
      |  CAST(FLOOR(CAST(value AS DECIMAL(18,2)) / 10) AS BIGINT) AS bin,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(col("event_type"),
        floor(money(col("value")) / 10).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(money(col("value"))).cast(DoubleType).as("sum_value"))
      .orderBy(col("event_type"), col("bin"))
  }

  /** Time-series gap filling with forward fill — the resampling pass
    * every downstream model expects: a dense hourly grid per user
    * between that user's first and last active hour, observed sums
    * where they exist, last-observation-carried-forward in the gaps.
    * The grid is GENERATED from each user's span (explode of a
    * sequence — one row per user fans out to its own hours only),
    * never a calendar cross-join; the fill is last(ignoreNulls) over
    * the same user_id partitioning the aggregation already shuffled
    * on. Sums are decimal-exact before the one cast, so fill values
    * hash-match bit-exactly. */
  val gapFill: Q = Q(
    "events_gap_fill",
    """WITH b AS (
      |  SELECT user_id, date_trunc('hour', ts) h,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) sv
      |  FROM events GROUP BY 1, 2),
      |sp AS (SELECT user_id, MIN(h) h0, MAX(h) h1 FROM b GROUP BY 1),
      |grid AS (
      |  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      |  FROM sp),
      |j AS (
      |  SELECT g.user_id, g.h, b.sv
      |  FROM grid g LEFT JOIN b ON g.user_id = b.user_id AND g.h = b.h)
      |SELECT user_id, h AS hour, sv AS sum_value,
      |  LAST_VALUE(sv IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
      |    ROWS UNBOUNDED PRECEDING) AS filled_value
      |FROM j ORDER BY user_id, hour""".stripMargin) { (s, dir) =>
    val b = Tables.events(s, dir)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(sum(money(col("value"))).cast(DoubleType).as("sv"))
      .cache() // consumed by the span agg and the grid join
    val grid = b.groupBy(col("user_id"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR")))
          .as("h"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(b, Seq("user_id", "h"), "left")
      .select(col("user_id"), col("h").as("hour"), col("sv").as("sum_value"),
        last(col("sv"), ignoreNulls = true).over(w).as("filled_value"))
      .orderBy(col("user_id"), col("hour"))
  }

  /** Trailing-hour rolling aggregate per user — the RANGE window
    * frame (value-based, here micros) next to q_running_sum's ROWS
    * frame: each event sees the count and decimal-exact sum of its
    * user's events in the preceding hour INCLUDING timestamp peers
    * (RANGE frames take all order-value ties, so membership is
    * value-determined and engine-independent). One shuffle on
    * user_id; the frame slides in O(1) per row inside the sorted
    * partition — the streaming-compatible trailing-metrics shape. */
  val rolling: Q = Q(
    "events_rolling",
    """SELECT event_id, user_id,
      |  COUNT(*) OVER w AS n_1h,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600000000L, 0)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_1h"),
        sum(money(col("value"))).over(w).cast(DoubleType).as("sum_1h"))
      .orderBy(col("event_id"))
  }

  /** First-order Markov transition matrix over per-user event
    * sequences — P(next = e2 | current = e1), the model behind
    * next-action prediction and anomaly scoring on clickstreams. One
    * lead() over the per-user shuffle builds the bigram stream, one
    * partial-aggregating groupBy counts transitions, and the
    * normalizing row-sums run as a window over the AGGREGATED frame —
    * whose size is bounded by the event-type alphabet squared, not by
    * the corpus, so the second window costs nothing at any scale.
    * Probabilities are one integer-over-integer double division:
    * bit-identical in both engines. */
  val markov: Q = Q(
    "events_markov",
    """WITH b AS (
      |  SELECT event_type AS e1,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
      |      AS e2
      |  FROM events),
      |c AS (SELECT e1, e2, COUNT(*) AS cnt FROM b
      |      WHERE e2 IS NOT NULL GROUP BY 1, 2)
      |SELECT e1, e2, cnt,
      |  CAST(cnt AS DOUBLE) / SUM(cnt) OVER (PARTITION BY e1) AS prob
      |FROM c ORDER BY e1, e2""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        col("event_type").as("e1"))
      .withColumn("e2", lead(col("e1"), 1).over(w))
      .filter(col("e2").isNotNull)
      .groupBy(col("e1"), col("e2"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("prob", col("cnt").cast(DoubleType) /
        sum(col("cnt")).over(Window.partitionBy(col("e1"))))
      .orderBy(col("e1"), col("e2"))
  }

  /** PageRank (3 unrolled iterations, damping 0.85) over the
    * event-type transition graph — "which states does activity
    * concentrate in", the graph-centrality complement to
    * events_markov's local transition probabilities. The scale story
    * is the split: ONE data-sized pass builds the weighted edge list
    * (the same lead+count aggregation as markov), and every iteration
    * after runs on frames bounded by the event-type alphabet (squared
    * for edges) — so iteration cost is independent of corpus size,
    * and the driver loop counts ITERATIONS (3), never rows. Simple
    * variant without dangling-mass redistribution (a sink state keeps
    * its (1-d)/N floor), identical in both engines; ranks rounded to
    * 6dp at the END only (mmr's computed-(1-d) and FLOOR-rounding
    * precedents). */
  val pagerank: Q = Q(
    "events_pagerank",
    { val iter = (k: Int) =>
        s"""r$k AS (
          |  SELECT d.v, (1 - 0.85) / n.n + 0.85 * COALESCE(
          |      SUM(r.r * e.w / o.ow), 0) AS r
          |  FROM d
          |  LEFT JOIN e ON e.e2 = d.v
          |  LEFT JOIN r${k - 1} r ON r.v = e.e1
          |  LEFT JOIN outw o ON o.e1 = e.e1
          |  CROSS JOIN n
          |  GROUP BY d.v, n.n)""".stripMargin
      s"""WITH b AS (
      |  SELECT event_type AS e1,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
      |      AS e2
      |  FROM events),
      |e AS (SELECT e1, e2, COUNT(*)::DOUBLE w FROM b
      |      WHERE e2 IS NOT NULL GROUP BY 1, 2),
      |outw AS (SELECT e1, SUM(w) ow FROM e GROUP BY 1),
      |d AS (SELECT DISTINCT event_type AS v FROM events),
      |n AS (SELECT COUNT(*)::DOUBLE n FROM d),
      |r0 AS (SELECT v, 1.0 / n.n AS r FROM d CROSS JOIN n),
      |${iter(1)},
      |${iter(2)},
      |${iter(3)}
      |SELECT v AS event_type,
      |  FLOOR(r * 1000000 + 0.5) / 1000000 AS pagerank
      |FROM r3 ORDER BY v""".stripMargin }) { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val ev = Tables.events(s, dir)
    val e = ev.select(col("user_id"), col("event_id"),
        col("event_type").as("e1"))
      .withColumn("e2", lead(col("e1"), 1).over(w))
      .filter(col("e2").isNotNull)
      .groupBy(col("e1"), col("e2"))
      .agg(count(lit(1)).cast(DoubleType).as("w"))
      .cache() // alphabet²-bounded; consumed by outw + every iteration
    val outw = e.groupBy(col("e1")).agg(sum(col("w")).as("ow"))
    val d = ev.select(col("event_type").as("v")).distinct().cache()
    val n = d.agg(count(lit(1)).cast(DoubleType).as("n"))
    var r = d.crossJoin(broadcast(n))
      .select(col("v"), (lit(1.0) / col("n")).as("r"))
    (1 to 3).foreach { _ =>
      r = d.join(e, col("e2") === col("v"), "left")
        .join(r.select(col("v").as("_sv"), col("r")),
          col("e1") === col("_sv"), "left")
        .join(outw, Seq("e1"), "left")
        .crossJoin(broadcast(n))
        .groupBy(col("v"), col("n"))
        .agg(((lit(1) - lit(0.85)) / col("n") + lit(0.85) *
          coalesce(sum(col("r") * col("w") / col("ow")), lit(0.0)))
          .as("r"))
        .select(col("v"), col("r"))
    }
    r.select(col("v").as("event_type"),
        (floor(col("r") * 1000000 + 0.5) / 1000000).as("pagerank"))
      .orderBy(col("event_type"))
  }

  /** Multi-touch attribution — the marketing-analytics operator every
    * event warehouse ships (first-touch / last-touch / linear credit
    * of conversion revenue to the touch events that preceded it):
    * each purchase is a conversion whose attribution window is the
    * user's touches (view/click) since their PREVIOUS purchase —
    * epochs assigned by one running purchase-count window, so a
    * purchase's touches join it on (user, epoch) equi-keys, never a
    * range join. Credit arithmetic is EXACT int64 cents (the Exact
    * discipline): first/last credit the whole v_cents to the
    * rank-1/rank-n touch; linear credits v_cents div n to every touch
    * with the remainder pinned to the first (a float v/n share would
    * make the corpus-wide sums order-dependent, exactly what the 4dp
    * gate cannot absorb at scale) — credited totals are exact
    * integers, the final /100.0 is one division of an exact int.
    * Conversions with no touches in their window credit nobody.
    * Scale: per-user windows parallelize, the join is an equi-join,
    * the credit union aggregates map-side. */
  val attribution: Q = Q(
    "events_attribution",
    """WITH ev AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) v_cents,
      |    COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |      0) epoch
      |  FROM events WHERE event_type IN ('view', 'click', 'purchase')),
      |conv AS (
      |  SELECT user_id, epoch, v_cents FROM ev
      |  WHERE event_type = 'purchase'),
      |tr AS (
      |  SELECT t.event_type, c.v_cents,
      |    ROW_NUMBER() OVER (PARTITION BY t.user_id, t.epoch
      |      ORDER BY t.ts, t.event_id) rf,
      |    ROW_NUMBER() OVER (PARTITION BY t.user_id, t.epoch
      |      ORDER BY t.ts DESC, t.event_id DESC) rl,
      |    COUNT(*) OVER (PARTITION BY t.user_id, t.epoch) n
      |  FROM (SELECT * FROM ev WHERE event_type <> 'purchase') t
      |  JOIN conv c ON t.user_id = c.user_id AND t.epoch = c.epoch),
      |cr AS (
      |  SELECT event_type, 'first_touch' model,
      |    CASE WHEN rf = 1 THEN v_cents ELSE 0 END c FROM tr
      |  UNION ALL
      |  SELECT event_type, 'last_touch',
      |    CASE WHEN rl = 1 THEN v_cents ELSE 0 END FROM tr
      |  UNION ALL
      |  SELECT event_type, 'linear',
      |    v_cents // n + CASE WHEN rf = 1 THEN v_cents % n ELSE 0 END
      |  FROM tr)
      |SELECT event_type AS touch_type, model,
      |  SUM(c)::BIGINT / 100.0 AS credited,
      |  SUM(CASE WHEN c > 0 THEN 1 ELSE 0 END)::BIGINT AS n_credited
      |FROM cr GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val ev = Tables.events(s, dir)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("v_cents"),
        coalesce(
          sum(when(col("event_type") === "purchase", 1).otherwise(0))
            .over(byUser.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)).as("epoch"))
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("epoch"), col("v_cents"))
    val byEpoch = Window.partitionBy(col("user_id"), col("epoch"))
    val tr = ev.filter(col("event_type") =!= "purchase")
      .drop("v_cents")
      .join(conv, Seq("user_id", "epoch"))
      .select(col("event_type"), col("v_cents"),
        row_number().over(byEpoch.orderBy(col("ts"), col("event_id")))
          .as("rf"),
        row_number().over(byEpoch.orderBy(col("ts").desc,
          col("event_id").desc)).as("rl"),
        count(lit(1)).over(byEpoch).as("n"))
    val cr = tr.select(col("event_type"), lit("first_touch").as("model"),
        when(col("rf") === 1, col("v_cents")).otherwise(0L).as("c"))
      .unionAll(tr.select(col("event_type"), lit("last_touch"),
        when(col("rl") === 1, col("v_cents")).otherwise(0L)))
      .unionAll(tr.select(col("event_type"), lit("linear"),
        expr("v_cents div n") +
          when(col("rf") === 1, col("v_cents") % col("n")).otherwise(0L)))
    cr.groupBy(col("event_type").as("touch_type"), col("model"))
      .agg((sum(col("c")).cast("long") / 100.0).as("credited"),
        sum(when(col("c") > 0, 1L).otherwise(0L)).cast("long")
          .as("n_credited"))
      .orderBy(col("touch_type"), col("model"))
  }

  /** The per-type hourly count series on a dense calendar spine —
    * shared input of events_autocorr and events_cusum. The spine is
    * CALENDAR-bounded (hours between the corpus min/max — a broadcast
    * 1-row bound), not data-sized: gaps become explicit zero counts so
    * lag alignment is by wall-clock hour, the only defensible series
    * semantics. One map-side-combining shuffle builds the counts; the
    * spine join is a broadcast of the tiny type × hour frame at any
    * corpus size (hours grow with TIME, not bytes). */
  private[graft] def hourlySeries(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(s, dir)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
    val counts = base.groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("c"))
    val spine = base.select(col("event_type")).distinct()
      .crossJoin(broadcast(base.agg(min(col("h")).as("h0"),
        max(col("h")).as("h1"))))
      .select(col("event_type"),
        explode(sequence(col("h0"), col("h1"),
          expr("interval 1 hour"))).as("h"))
    spine.join(counts, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"),
        coalesce(col("c"), lit(0L)).as("c"))
  }

  private val seriesSql =
    """series AS (
      |  SELECT t.event_type, s.h, COALESCE(c.c, 0) AS c
      |  FROM (SELECT DISTINCT event_type FROM events) t
      |  CROSS JOIN (
      |    SELECT unnest(generate_series(
      |      (SELECT MIN(date_trunc('hour', ts)) FROM events),
      |      (SELECT MAX(date_trunc('hour', ts)) FROM events),
      |      INTERVAL 1 HOUR)) AS h) s
      |  LEFT JOIN (
      |    SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS c
      |    FROM events GROUP BY 1, 2) c
      |  ON t.event_type = c.event_type AND s.h = c.h)""".stripMargin

  /** Lag-1 and lag-24 (daily-seasonality) autocorrelation of the
    * hourly count series per event type. Pearson r is computed from
    * EXACT integer sums (n, Σx, Σy, Σxy, Σx², Σy² over BIGINT counts)
    * with ONE double formula at the end — no float accumulation, so
    * the result is bit-identical regardless of partitioning or
    * engine (the corr() aggregate's running co-moments would not be).
    * Constant series (zero variance) yield NULL via NULLIF. Scale:
    * the lag windows partition by type over a calendar-sized series;
    * the sums aggregate map-side. */
  val autocorr: Q = Q(
    "events_autocorr",
    s"""WITH $seriesSql,
      |lagged AS (
      |  SELECT event_type, c,
      |    lag(c, 1) OVER w AS l1, lag(c, 24) OVER w AS l24
      |  FROM series WINDOW w AS (PARTITION BY event_type ORDER BY h)),
      |stacked AS (
      |  SELECT event_type, CAST(1 AS BIGINT) AS lag_h, c AS x, l1 AS y
      |    FROM lagged WHERE l1 IS NOT NULL
      |  UNION ALL
      |  SELECT event_type, 24, c, l24 FROM lagged WHERE l24 IS NOT NULL),
      |sums AS (
      |  SELECT event_type, lag_h, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
      |    SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
      |  FROM stacked GROUP BY 1, 2)
      |SELECT event_type, lag_h,
      |  ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      |    / NULLIF(SQRT((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
      |      * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 0.0), 6)
      |    + 0 AS autocorr
      |FROM sums ORDER BY event_type, lag_h""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val lagged = hourlySeries(s, dir).select(col("event_type"), col("c"),
      lag(col("c"), 1).over(w).as("l1"), lag(col("c"), 24).over(w).as("l24"))
    // melt the two lags with ONE explode instead of a UNION of two
    // filtered projections — a union would duplicate the whole series
    // subtree (spine build, bounds agg, count shuffle) into each branch
    val stacked = lagged.select(col("event_type"), explode(array(
        struct(lit(1L).as("lag_h"), col("c").as("x"), col("l1").as("y")),
        struct(lit(24L).as("lag_h"), col("c").as("x"),
          col("l24").as("y")))).as("kv"))
      .select(col("event_type"), col("kv.lag_h").as("lag_h"),
        col("kv.x").as("x"), col("kv.y").as("y"))
      .filter(col("y").isNotNull)
    stacked.groupBy(col("event_type"), col("lag_h"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("event_type"), col("lag_h"),
        (round((col("n").cast("double") * col("sxy")
            - col("sx").cast("double") * col("sy"))
          / nullif(sqrt((col("n").cast("double") * col("sxx")
              - col("sx").cast("double") * col("sx"))
            * (col("n").cast("double") * col("syy")
              - col("sy").cast("double") * col("sy"))), lit(0.0)), 6)
          + 0).as("autocorr"))
      .orderBy(col("event_type"), col("lag_h"))
  }

  /** Exponentially weighted moving average over each user's last 8
    * values — the streaming-friendly smoother, as one window pass.
    * True EWMA is a recursion (not window-expressible); the K-term
    * truncation is the standard bounded-memory form and what a
    * Structured Streaming state store would keep. Weights
    * α(1−α)^j with α=1/4 are EXACT binary doubles (3^j/4^(j+1)), the
    * 8-term sum is one fixed-order expression tree, and missing lags
    * renormalize the denominator — bit-identical on both engines. */
  val ewma: Q = {
    val weights = (0 until 8).map(j => 0.25 * math.pow(0.75, j))
    val terms = weights.zipWithIndex.map { case (wj, j) =>
      val v = if (j == 0) "value" else s"lag(value, $j) OVER w"
      (s"COALESCE($v * $wj, 0.0)", s"CASE WHEN $v IS NULL THEN 0.0 ELSE $wj END")
    }
    Q(
      "events_ewma",
      s"""SELECT event_id, user_id,
        |  ROUND((${terms.map(_._1).mkString(" + ")})
        |    / (${terms.map(_._2).mkString(" + ")}), 6) + 0 AS ewma
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      def lagV(j: Int): Column =
        if (j == 0) col("value") else lag(col("value"), j).over(w)
      val num = weights.zipWithIndex.map { case (wj, j) =>
        coalesce(lagV(j) * wj, lit(0.0)) }.reduceLeft(_ + _)
      val den = weights.zipWithIndex.map { case (wj, j) =>
        when(lagV(j).isNull, 0.0).otherwise(wj) }.reduceLeft(_ + _)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          (round(num / den, 6) + 0).as("ewma"))
        .orderBy(col("event_id"))
    }
  }

  /** One-sided CUSUM changepoint detection over the hourly count
    * series: standardize by the per-type mean/std (from exact integer
    * sums), then S_t = max(0, S_{t−1} + z_t − k) via the closed form
    * S_t = C_t − min_{j≤t} C_j with C the running sum of (z − k) —
    * two sequential window passes instead of an inexpressible
    * recursion (Page '54's statistic, prefix-decomposed — the prefix
    * min includes the EMPTY prefix C₀ = 0, without which every
    * series' first excursion would read 0). k = 0.5σ slack, alarm at
    * S > 4. Running sums accumulate in the window's
    * pinned order, so the doubles match across engines. */
  val cusum: Q = Q(
    "events_cusum",
    s"""WITH $seriesSql,
      |stats AS (
      |  SELECT event_type, COUNT(*) AS n, SUM(c) AS sx, SUM(c * c) AS sxx
      |  FROM series GROUP BY 1),
      |z AS (
      |  SELECT s.event_type, s.h,
      |    (s.c - CAST(t.sx AS DOUBLE) / t.n)
      |      / NULLIF(SQRT((CAST(t.n AS DOUBLE) * t.sxx
      |        - CAST(t.sx AS DOUBLE) * t.sx)
      |        / (CAST(t.n AS DOUBLE) * (t.n - 1))), 0.0) AS z
      |  FROM series s JOIN stats t ON s.event_type = t.event_type),
      |ct AS (
      |  SELECT event_type, h, SUM(z - 0.5) OVER w AS c
      |  FROM z WINDOW w AS (PARTITION BY event_type ORDER BY h
      |    ROWS UNBOUNDED PRECEDING)),
      |st AS (
      |  SELECT event_type, h, c - LEAST(0.0, MIN(c) OVER w) AS s
      |  FROM ct WINDOW w AS (PARTITION BY event_type ORDER BY h
      |    ROWS UNBOUNDED PRECEDING))
      |SELECT event_type, h AS hour, ROUND(s, 6) + 0 AS cusum,
      |  s > 4.0 AS alarm
      |FROM st ORDER BY event_type, hour""".stripMargin) { (s, dir) =>
    // cached: the calendar-sized series feeds both the stats agg and
    // the z scoring join (caller-owned cleanup — Q's cache contract)
    val series = hourlySeries(s, dir).cache()
    val stats = series.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sx"),
        sum(col("c") * col("c")).as("sxx"))
    val z = series.join(broadcast(stats), Seq("event_type"))
      .select(col("event_type"), col("h"),
        ((col("c") - col("sx").cast("double") / col("n"))
          / nullif(sqrt((col("n").cast("double") * col("sxx")
              - col("sx").cast("double") * col("sx"))
            / (col("n").cast("double") * (col("n") - 1))), lit(0.0))).as("z"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, 0)
    z.withColumn("ct", sum(col("z") - 0.5).over(w))
      .withColumn("s",
        col("ct") - least(lit(0.0), min(col("ct")).over(w)))
      .select(col("event_type"), col("h").as("hour"),
        (round(col("s"), 6) + 0).as("cusum"), (col("s") > 4.0).as("alarm"))
      .orderBy(col("event_type"), col("hour"))
  }

  /** Per-type OLS trend over the hourly count series: slope,
    * intercept, and r² of count-vs-time — the load-growth regression
    * behind every capacity dashboard, as ONE distributed pass. The
    * regressor is the dense 0-based hour index (ROW_NUMBER per type
    * over the calendar spine — small integers at any calendar span,
    * so the six power sums stay exact BIGINTs at any calendar span),
    * the sums aggregate map-side, and the closed-form solution is one
    * fixed double expression over DOUBLE-cast cross products —
    * bit-identical across engines, and the products cannot silently
    * wrap at 100 TB counts (the int64 form would wrap in Spark while
    * DuckDB errors — the WordPiece-denominator lesson). Degenerate
    * (zero-variance) series yield NULL via NULLIF. */
  val trend: Q = Q(
    "events_trend",
    s"""WITH $seriesSql,
      |idx AS (
      |  SELECT event_type, c,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h)
      |      - 1 AS BIGINT) AS t
      |  FROM series),
      |sums AS (
      |  SELECT event_type, COUNT(*) AS n, SUM(t) AS st, SUM(c) AS sc,
      |    SUM(t * c) AS stc, SUM(t * t) AS stt, SUM(c * c) AS scc
      |  FROM idx GROUP BY 1),
      |f AS (
      |  SELECT event_type, n,
      |    CAST(n AS DOUBLE) * stc - CAST(st AS DOUBLE) * sc AS sxy,
      |    CAST(n AS DOUBLE) * stt - CAST(st AS DOUBLE) * st AS sxx,
      |    CAST(n AS DOUBLE) * scc - CAST(sc AS DOUBLE) * sc AS syy,
      |    st, sc
      |  FROM sums)
      |SELECT event_type, n,
      |  ROUND(CAST(sxy AS DOUBLE) / NULLIF(CAST(sxx AS DOUBLE), 0.0), 6)
      |    + 0 AS slope,
      |  ROUND((CAST(sc AS DOUBLE) - (CAST(sxy AS DOUBLE)
      |    / NULLIF(CAST(sxx AS DOUBLE), 0.0)) * st) / n, 6) + 0
      |    AS intercept,
      |  ROUND(CAST(sxy AS DOUBLE) * sxy
      |    / NULLIF(CAST(sxx AS DOUBLE) * syy, 0.0), 6) + 0 AS r2
      |FROM f ORDER BY event_type""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val idx = hourlySeries(s, dir).select(col("event_type"), col("c"),
      (row_number().over(w) - 1).cast("long").as("t"))
    idx.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("t")).as("st"),
        sum(col("c")).as("sc"), sum(col("t") * col("c")).as("stc"),
        sum(col("t") * col("t")).as("stt"),
        sum(col("c") * col("c")).as("scc"))
      .select(col("event_type"), col("n"),
        (col("n").cast("double") * col("stc")
          - col("st").cast("double") * col("sc")).as("sxy"),
        (col("n").cast("double") * col("stt")
          - col("st").cast("double") * col("st")).as("sxx"),
        (col("n").cast("double") * col("scc")
          - col("sc").cast("double") * col("sc")).as("syy"),
        col("st"), col("sc"))
      .select(col("event_type"), col("n"),
        (round(col("sxy").cast("double")
          / nullif(col("sxx").cast("double"), lit(0.0)), 6) + 0).as("slope"),
        (round((col("sc").cast("double") - (col("sxy").cast("double")
            / nullif(col("sxx").cast("double"), lit(0.0))) * col("st"))
          / col("n"), 6) + 0).as("intercept"),
        (round(col("sxy").cast("double") * col("sxy")
          / nullif(col("sxx").cast("double") * col("syy"), lit(0.0)), 6)
          + 0).as("r2"))
      .orderBy(col("event_type"))
  }

  /** Chi-square independence components: is event mix independent of
    * weekday? Observed (type, weekday) counts vs the rank-1 expected
    * table, each type's Σ(o−e)²/e reported as its component (global
    * χ² = their sum; dof = (types−1)·6). Weekday is ISO Monday=0 on
    * both engines. The margins are three tiny broadcast aggregates
    * off one shared count pass; every term is built from exact
    * integer counts via fixed double products (counts·N stay below
    * 2^53, so the doubles are exact), and the 7-term per-type sum is
    * same-sign with ROUND(6) — the retrieval_bm25 float-sum
    * discipline. */
  val chisq: Q = Q(
    "q_chisq",
    """WITH o AS (
      |  SELECT event_type, isodow(ts) - 1 AS dow, COUNT(*) AS o
      |  FROM events GROUP BY 1, 2),
      |r AS (SELECT event_type, SUM(o)::BIGINT AS r FROM o GROUP BY 1),
      |c AS (SELECT dow, SUM(o)::BIGINT AS c FROM o GROUP BY 1),
      |t AS (SELECT SUM(o)::BIGINT AS n FROM o),
      |terms AS (
      |  SELECT o.event_type,
      |    (CAST(o.o AS DOUBLE) * t.n - CAST(r.r AS DOUBLE) * c.c)
      |      * (CAST(o.o AS DOUBLE) * t.n - CAST(r.r AS DOUBLE) * c.c)
      |      / (CAST(r.r AS DOUBLE) * c.c * t.n) AS term
      |  FROM o JOIN r USING (event_type) JOIN c USING (dow) CROSS JOIN t)
      |SELECT event_type, ROUND(SUM(term), 6) + 0 AS chi2_component
      |FROM terms GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val o = Tables.events(s, dir)
      .groupBy(col("event_type"), weekday(col("ts")).as("dow"))
      .agg(count(lit(1)).as("o"))
      .cache() // feeds its own three margins (caller-owned cleanup)
    val r = o.groupBy(col("event_type")).agg(sum(col("o")).as("r"))
    val c = o.groupBy(col("dow")).agg(sum(col("o")).as("c"))
    val t = o.agg(sum(col("o")).as("n"))
    val d = col("o").cast("double") * col("n") -
      col("r").cast("double") * col("c")
    o.join(broadcast(r), Seq("event_type"))
      .join(broadcast(c), Seq("dow"))
      .crossJoin(broadcast(t))
      .select(col("event_type"),
        (d * d / (col("r").cast("double") * col("c") * col("n")))
          .as("term"))
      .groupBy(col("event_type"))
      .agg((round(sum(col("term")), 6) + 0).as("chi2_component"))
      .orderBy(col("event_type"))
  }

  /** Peak concurrency by sweep line: how many sessions were open at
    * once, and when that peak was first reached — the load-planning
    * question whose naive form is a range self-join (sessions ×
    * sessions interval overlap, quadratic in the peak). The sweep
    * decomposition is linear: sessions melt to ±1 boundary events,
    * the global running sum IS the concurrency profile, and its max
    * is the answer. The textbook global window is the canonical
    * single-partition funnel, so the prefix sum runs through
    * GlobalPrefix (range exchange + broadcast offsets). Closed
    * intervals: a session starting exactly when another ends
    * overlaps it — starts order before ends at equal timestamps
    * (negd sort key), both engines. */
  val concurrency: Q = Q(
    "q_concurrency",
    s"""WITH sess AS (
      |  SELECT session_start, session_end FROM (${sessionize.oracle.get})),
      |ev AS (
      |  SELECT session_start AS t, 1 AS d FROM sess
      |  UNION ALL SELECT session_end, -1 FROM sess),
      |c AS (
      |  SELECT t, SUM(d) OVER (ORDER BY t, -d ROWS UNBOUNDED PRECEDING)
      |    AS cur
      |  FROM ev),
      |m AS (SELECT MAX(cur) AS mx FROM c)
      |SELECT CAST(m.mx AS BIGINT) AS max_concurrent,
      |  MIN(c.t) AS first_peak_ts
      |FROM c CROSS JOIN m WHERE c.cur = m.mx GROUP BY m.mx""".stripMargin) {
    (s, dir) =>
    val sess = sessionizeDf(Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("value")))
      .select(col("session_start"), col("session_end"))
    val ev = sess.select(col("session_start").as("t"), lit(1L).as("d"))
      .unionAll(sess.select(col("session_end"), lit(-1L)))
      .withColumn("negd", -col("d"))
    val (c, _) = graft.operators.GlobalPrefix.withCumSum(
      ev, Seq(col("t"), col("negd")), col("d"))
    val cc = c.cache() // feeds the max agg and the argmin join
    val m = cc.agg(max(col("cum")).as("mx"))
    cc.join(broadcast(m), col("cum") === col("mx"))
      .groupBy(col("mx"))
      .agg(min(col("t")).as("first_peak_ts"))
      .select(col("mx").cast("long").as("max_concurrent"),
        col("first_peak_ts"))
  }

  /** Seasonal profile decomposition (the profile half of an STL):
    * each type's hour-of-day load profile — share of its events per
    * clock hour, an exact int/int division — plus a seasonality
    * strength score, the profile's max/min share ratio over exact
    * counts. One map-side-combining groupBy on (type, hour-of-day);
    * the 24-row-per-type profile domain is alphabet-bounded, so the
    * share join is a broadcast at any corpus size. The deviation
    * TWIN is events_anomaly (per-entity z-scores); this is the
    * calendar-shape complement. */
  val seasonalProfile: Q = Q(
    "events_seasonal_profile",
    """WITH o AS (
      |  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
      |    COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |t AS (SELECT event_type, SUM(n)::BIGINT AS tot FROM o GROUP BY 1),
      |x AS (SELECT event_type, MAX(n)::BIGINT mx, MIN(n)::BIGINT mn
      |  FROM o GROUP BY 1)
      |SELECT o.event_type, o.hod, o.n,
      |  ROUND(CAST(o.n AS DOUBLE) / t.tot, 6) + 0 AS share,
      |  ROUND(CAST(x.mx AS DOUBLE) / x.mn, 4) + 0 AS peak_trough_ratio
      |FROM o JOIN t USING (event_type) JOIN x USING (event_type)
      |ORDER BY event_type, hod""".stripMargin) { (s, dir) =>
    val o = Tables.events(s, dir)
      .groupBy(col("event_type"), hour(col("ts")).cast("long").as("hod"))
      .agg(count(lit(1)).as("n"))
      .cache() // feeds its own two margins (caller-owned cleanup)
    val t = o.groupBy(col("event_type")).agg(sum(col("n")).as("tot"))
    val x = o.groupBy(col("event_type")).agg(max(col("n")).as("mx"),
      min(col("n")).as("mn"))
    o.join(broadcast(t), Seq("event_type"))
      .join(broadcast(x), Seq("event_type"))
      .select(col("event_type"), col("hod"), col("n"),
        (round(col("n").cast("double") / col("tot"), 6) + 0).as("share"),
        (round(col("mx").cast("double") / col("mn"), 4) + 0)
          .as("peak_trough_ratio"))
      .orderBy(col("event_type"), col("hod"))
  }

  /** Cumulative unique users per day — the growth curve every
    * dashboard opens with, decomposed the only way it scales: a
    * COUNT(DISTINCT) per expanding window recomputes the whole set
    * per day (quadratic in days × users); the first-seen
    * decomposition is one min(ts) per user (map-side combining), one
    * count per first-seen day, and a running sum over the
    * calendar-bounded day frame. Daily actives ride the same pass. */
  val userGrowth: Q = Q(
    "events_user_growth",
    """WITH f AS (
      |  SELECT user_id, CAST(MIN(ts) AS DATE) AS d0
      |  FROM events GROUP BY 1),
      |n AS (SELECT d0 AS day, COUNT(*) AS new_users FROM f GROUP BY 1),
      |a AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    COUNT(DISTINCT user_id) AS active_users
      |  FROM events GROUP BY 1)
      |SELECT a.day, COALESCE(n.new_users, 0) AS new_users,
      |  CAST(SUM(COALESCE(n.new_users, 0)) OVER (ORDER BY a.day
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative_users,
      |  a.active_users
      |FROM a LEFT JOIN n ON a.day = n.day
      |ORDER BY a.day""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val n = ev.groupBy(col("user_id")).agg(min(col("ts")).as("ts0"))
      .groupBy(to_date(col("ts0")).as("day"))
      .agg(count(lit(1)).as("new_users"))
    val a = ev.groupBy(to_date(col("ts")).as("day"))
      .agg(countDistinct(col("user_id")).as("active_users"))
    // the running sum's window is the day frame — calendar-bounded,
    // the bounded-bands single-partition rule
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    a.join(n, Seq("day"), "left")
      .select(col("day"),
        coalesce(col("new_users"), lit(0L)).as("new_users"),
        col("active_users"))
      .withColumn("cumulative_users",
        sum(col("new_users")).over(w).cast("long"))
      .select(col("day"), col("new_users"), col("cumulative_users"),
        col("active_users"))
      .orderBy(col("day"))
  }

  /** Holt's linear-trend smoothing (α=1/4, β=1/8) as a BATCH query —
    * the registered one-step forecaster whose fold is shared VERBATIM
    * with the streaming twin (StreamOps.holtFold, used by holtState):
    * batch and stream literally cannot drift. Per-user series are
    * calendar/data bounded (≤~100 events/user in this corpus — the
    * bounded-bands rule), so the per-group fold buffer is bounded;
    * the work distributes across users. The DuckDB oracle replays the
    * recurrence as a recursive CTE with the arithmetic WRITTEN
    * IDENTICALLY (IEEE double ops are exactly specified, so the same
    * expression order yields the same bits in both engines); the
    * printed boundary floor-quantizes to 6dp (the text_quality rule,
    * not round(): dyadic α/β land the fold on exact .5e-6 halves
    * where engine HALF_UP conventions differ on negatives). */
  val holt: Q = Q(
    "events_holt",
    """WITH RECURSIVE e AS (
      |  SELECT user_id, event_id, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS rn
      |  FROM events),
      |f(user_id, rn, event_id, n, l, b) AS (
      |  SELECT user_id, rn, event_id, 1, value, CAST(0.0 AS DOUBLE)
      |  FROM e WHERE rn = 1
      |  UNION ALL
      |  SELECT e.user_id, e.rn, e.event_id, f.n + 1,
      |    CASE WHEN f.n = 1 THEN e.value
      |         ELSE 0.25 * e.value + 0.75 * (f.l + f.b) END,
      |    CASE WHEN f.n = 1 THEN e.value - f.l
      |         ELSE 0.125 * ((0.25 * e.value + 0.75 * (f.l + f.b)) - f.l)
      |              + 0.875 * f.b END
      |  FROM f JOIN e ON e.user_id = f.user_id AND e.rn = f.n + 1)
      |SELECT event_id, user_id,
      |  FLOOR(l * 1000000 + 0.5) / 1000000 + 0 AS level,
      |  FLOOR(b * 1000000 + 0.5) / 1000000 + 0 AS trend,
      |  FLOOR((l + b) * 1000000 + 0.5) / 1000000 + 0 AS forecast_next
      |FROM f WHERE n >= 2 ORDER BY event_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val msgs = Tables.events(s, dir).select(
      col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("tsMicros"), col("value"))
      .as[graft.streaming.StreamOps.EwmaMsg]
    msgs.groupByKey(_.user_id)
      .flatMapGroups { (u: Long,
          it: Iterator[graft.streaming.StreamOps.EwmaMsg]) =>
        graft.streaming.StreamOps.holtFold(u, it.toSeq, (0, 0.0, 0.0))
          ._2.iterator
      }
      .toDF()
      .select(col("event_id"), col("user_id"),
        // floor-quantize, not round(): the dyadic α/β coefficients
        // land the fold on EXACT .5e-6 boundaries where the engines'
        // HALF_UP conventions differ on negatives (2 rows at sf0.01)
        (floor(col("level") * 1000000 + 0.5) / 1000000 + 0).as("level"),
        (floor(col("trend") * 1000000 + 0.5) / 1000000 + 0).as("trend"),
        (floor(col("forecast_next") * 1000000 + 0.5) / 1000000 + 0)
          .as("forecast_next"))
      .orderBy(col("event_id"))
  }

  /** Holt-Winters additive seasonal smoothing (period 24, α=1/4,
    * β=1/8, γ=1/16) over each type's hourly count series — the
    * smoother that separates real growth from time-of-day rhythm
    * (events_holt has no seasonal term; events_seasonal_profile has
    * no dynamics). The fold is shared VERBATIM with the streaming
    * twin (StreamOps.hwFold ← hwState): warm-up buffers the first
    * season, the init is purely sequential (l₀ = season-1 mean,
    * b₀ = 0, sᵢ = cᵢ − l₀ — no look-ahead, the property that lets
    * ONE fold serve both engines of execution), then the standard
    * three-term recurrence with the season queue popping s_{t−24} each step.
    *
    * Oracle parity: the recursive CTE carries the season queue as a
    * LIST column with the IDENTICAL IEEE operation order (dyadic
    * coefficients — exact doubles), and the warm-up mean is
    * SUM(BIGINT)/24.0 ≡ the fold's exact integral-double sum;
    * printed on the floor-quantized 6dp grid (the events_holt
    * negative-halves lesson). Scale: series are CALENDAR-bounded —
    * the per-key fold buffer is ≤ hours in the window, work
    * distributes across keys, and the corpus-sized pass is only the
    * hourly count aggregation. */
  val holtWinters: Q = {
    val lNew = "(0.25 * (e.c - r.season[1]) + 0.75 * (r.l + r.b))"
    val bNew = s"(0.125 * ($lNew - r.l) + 0.875 * r.b)"
    val sNew = s"(0.0625 * (e.c - $lNew) + 0.9375 * r.season[1])"
    Q(
      "events_holt_winters",
      s"""WITH RECURSIVE $seriesSql,
        |e AS (
        |  SELECT event_type, c,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
        |  FROM series),
        |l0 AS (
        |  SELECT event_type, CAST(SUM(c) AS DOUBLE) / 24.0 AS l0
        |  FROM e WHERE rn <= 24 GROUP BY 1),
        |r(event_type, rn, l, b, season) AS (
        |  SELECT e.event_type, 24, l0.l0, CAST(0.0 AS DOUBLE),
        |    list(e.c - l0.l0 ORDER BY e.rn)
        |  FROM e JOIN l0 ON e.event_type = l0.event_type
        |  WHERE e.rn <= 24
        |  GROUP BY e.event_type, l0.l0
        |  UNION ALL
        |  SELECT e.event_type, e.rn, $lNew, $bNew,
        |    r.season[2:24] || [$sNew]
        |  FROM r JOIN e
        |    ON e.event_type = r.event_type AND e.rn = r.rn + 1)
        |SELECT event_type, rn,
        |  FLOOR(l * 1000000 + 0.5) / 1000000 + 0 AS level,
        |  FLOOR(b * 1000000 + 0.5) / 1000000 + 0 AS trend,
        |  FLOOR(season[24] * 1000000 + 0.5) / 1000000 + 0 AS seasonal,
        |  FLOOR((l + b + season[1]) * 1000000 + 0.5) / 1000000 + 0
        |    AS forecast_next
        |FROM r WHERE rn >= 25 ORDER BY event_type, rn""".stripMargin) {
      (s, dir) =>
        import s.implicits._
        val wT = Window.partitionBy(col("event_type")).orderBy(col("h"))
        val msgs = hourlySeries(s, dir)
          .select(col("event_type").as("key"),
            row_number().over(wT).cast("long").as("seq_id"),
            col("c").cast("double").as("value"))
          .as[graft.streaming.StreamOps.HwMsg]
        msgs.groupByKey(_.key)
          .flatMapGroups { (k: String,
              it: Iterator[graft.streaming.StreamOps.HwMsg]) =>
            graft.streaming.StreamOps
              .hwFold(k, it.toSeq, (0, 0.0, 0.0, Vector.empty))._2.iterator
          }
          .toDF()
          .select(col("key").as("event_type"), col("seq_id").as("rn"),
            (floor(col("level") * 1000000 + 0.5) / 1000000 + 0)
              .as("level"),
            (floor(col("trend") * 1000000 + 0.5) / 1000000 + 0)
              .as("trend"),
            (floor(col("seasonal") * 1000000 + 0.5) / 1000000 + 0)
              .as("seasonal"),
            (floor(col("forecast_next") * 1000000 + 0.5) / 1000000 + 0)
              .as("forecast_next"))
          .orderBy(col("event_type"), col("rn"))
    }
  }

  val all: Seq[Q] = Seq(windowAgg, sessionize, asofJoin, jsonExtract,
    variantExtract, argmaxJoin, asofNative, funnel, retention, rangeJoin,
    anomaly, topPaths, scd2, histogram, gapFill, rolling, markov, pagerank,
    attribution, autocorr, ewma, cusum, trend, chisq, concurrency,
    seasonalProfile, userGrowth, holt, holtWinters)
}
