package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Geospatial operators — the grid-blocked spatial join discipline
  * (GeoSpark/Sedona's partition-by-cell shape) on deterministic
  * synthetic coordinates: each entity's (lat, lon) is a pure md5
  * function of its key (the corpus_shuffle seed discipline), so both
  * engines derive the identical geometry and the operators are
  * hash-gateable without a geo fixture table.
  *
  * The scale rule is the dedup rule in another metric space: NEVER
  * all-pairs. Candidates come from an equi-join on grid cells sized
  * so the radius cannot span more than adjacent cells (lat 0.5° ≈
  * 55.5 km ≥ 50 km; lon 1.0° ≥ 50 km/cos(50°N) ≈ 0.70° at the box's
  * worst latitude), the small side explodes over its 3×3 neighborhood,
  * and the haversine verify is one fixed expression per candidate.
  * Trig parity note: sin/cos/asin are libm calls on both engines; the
  * ≤ radius compare could only diverge for a pair within an ulp of
  * exactly 50 km — measure-zero for hashed coordinates (the
  * retrieval_bm25 disclosed-determinism argument). */
object Geo {

  import graft.functions.Slots

  /** Deterministic coordinates in a 40..50°N, -5..5°E box. */
  private def coords(df: DataFrame, key: String): DataFrame =
    df.withColumn("lat",
        lit(40.0) + Slots.uniform("geolat", col(key)) * 10)
      .withColumn("lon",
        lit(-5.0) + Slots.uniform("geolon", col(key)) * 10)

  private def coordsSql(key: String): String =
    s"40.0 + ${Slots.uniformSql("geolat", key)} * 10 AS lat, " +
      s"-5.0 + ${Slots.uniformSql("geolon", key)} * 10 AS lon"

  private def cellCols(df: DataFrame): DataFrame =
    df.withColumn("cx", floor(col("lat") / 0.5).cast("long"))
      .withColumn("cy", floor(col("lon") / 1.0).cast("long"))

  private val cellSql =
    "CAST(FLOOR(lat / 0.5) AS BIGINT) AS cx, " +
      "CAST(FLOOR(lon / 1.0) AS BIGINT) AS cy"

  private def hav(lat1: Column, lon1: Column, lat2: Column,
      lon2: Column): Column = {
    val sdla = sin(radians(lat2 - lat1) / 2)
    val sdlo = sin(radians(lon2 - lon1) / 2)
    lit(2 * 6371.0) * asin(sqrt(
      sdla * sdla + cos(radians(lat1)) * cos(radians(lat2)) * sdlo * sdlo))
  }

  /** Customers within 50 km of each supplier — the radius join. The
    * supplier side (the small one) explodes over its 3×3 cell
    * neighborhood; candidates are a (cx, cy) EQUI-join; the verify is
    * one haversine per candidate. Zero-match suppliers keep a row
    * (left join, count 0). At 100 TB the same plan holds with the
    * grid as the shuffle key — cell occupancy bounds candidate
    * fan-out, a hot cell is a standard salting candidate. */
  val radiusJoin: Q = Q(
    "q_geo_radius",
    s"""WITH s AS (
      |  SELECT s_suppkey, ${coordsSql("s_suppkey")} FROM supplier),
      |sc AS (SELECT s_suppkey, lat, lon, $cellSql FROM s),
      |c AS (
      |  SELECT c_custkey, ${coordsSql("c_custkey")} FROM customer),
      |cc AS (SELECT c_custkey, lat, lon, $cellSql FROM c),
      |cand AS (
      |  SELECT s.s_suppkey, s.lat AS slat, s.lon AS slon,
      |    c.lat AS clat, c.lon AS clon
      |  FROM (SELECT sc.*, sc.cx + dx.d AS ncx, sc.cy + dy.d AS ncy
      |        FROM sc, (VALUES (-1), (0), (1)) dx(d),
      |          (VALUES (-1), (0), (1)) dy(d)) s
      |  JOIN cc c ON s.ncx = c.cx AND s.ncy = c.cy),
      |hit AS (
      |  SELECT s_suppkey, COUNT(*) AS n FROM (
      |    SELECT s_suppkey,
      |      2 * 6371.0 * ASIN(SQRT(
      |        SIN(RADIANS(clat - slat) / 2) * SIN(RADIANS(clat - slat) / 2)
      |        + COS(RADIANS(slat)) * COS(RADIANS(clat))
      |          * SIN(RADIANS(clon - slon) / 2)
      |          * SIN(RADIANS(clon - slon) / 2))) AS km
      |    FROM cand) WHERE km <= 50.0 GROUP BY 1)
      |SELECT s.s_suppkey, COALESCE(hit.n, 0) AS n_within
      |FROM s LEFT JOIN hit USING (s_suppkey)
      |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
    val sup = cellCols(coords(
      Tables.supplier(s, dir).select(col("s_suppkey")), "s_suppkey"))
    val cus = cellCols(coords(
      Tables.customer(s, dir).select(col("c_custkey")), "c_custkey"))
      .select(col("c_custkey"), col("lat").as("clat"),
        col("lon").as("clon"), col("cx"), col("cy"))
    val off = Seq(-1L, 0L, 1L)
    val nbr = sup.select(col("s_suppkey"), col("lat").as("slat"),
        col("lon").as("slon"),
        explode(array(off.map(lit): _*)).as("dx"), col("cx"), col("cy"))
      .select(col("s_suppkey"), col("slat"), col("slon"),
        (col("cx") + col("dx")).as("ncx"),
        explode(array(off.map(lit): _*)).as("dy"), col("cy"))
      .select(col("s_suppkey"), col("slat"), col("slon"), col("ncx"),
        (col("cy") + col("dy")).as("ncy"))
    val hits = nbr.join(cus,
        col("ncx") === col("cx") && col("ncy") === col("cy"))
      .filter(hav(col("slat"), col("slon"), col("clat"), col("clon"))
        <= 50.0)
      .groupBy(col("s_suppkey")).agg(count(lit(1)).as("n"))
    sup.select(col("s_suppkey"))
      .join(hits, Seq("s_suppkey"), "left")
      .select(col("s_suppkey"), coalesce(col("n"), lit(0L)).as("n_within"))
      .orderBy(col("s_suppkey"))
  }

  /** Spatial binning heatmap: customer density + exact-decimal
    * account balance per grid cell — the aggregate every map tile
    * renderer runs; one map-side-combining groupBy on integer cell
    * keys, pure-integer/decimal output. */
  val gridAgg: Q = Q(
    "q_geo_grid",
    s"""WITH c AS (
      |  SELECT c_custkey, c_acctbal, ${coordsSql("c_custkey")}
      |  FROM customer),
      |cc AS (SELECT c_custkey, c_acctbal, $cellSql FROM c)
      |SELECT cx, cy, COUNT(*) AS n_customers,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      |FROM cc GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    import graft.functions.Exact.money
    cellCols(coords(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_acctbal")), "c_custkey"))
      .groupBy(col("cx"), col("cy"))
      .agg(count(lit(1)).as("n_customers"),
        sum(money(col("c_acctbal"))).cast("double").as("sum_bal"))
      .orderBy(col("cx"), col("cy"))
  }

  /** The fence polygon for q_geo_polygon: a CONCAVE simple pentagon
    * in the coordinate box (the notch at (45,0) forces real
    * ray-crossing parity — a convex fence would never exercise the
    * >1-crossing branch), vertices as (lat, lon) MICRO-DEGREE
    * integers. One row per directed edge. */
  private val fenceEdges: Seq[(Long, Long, Long, Long)] = {
    val v = Seq((41000000L, -3000000L), (49000000L, -3000000L),
      (49000000L, 3000000L), (45000000L, 0L), (41000000L, 3000000L))
    v.zip(v.tail :+ v.head).map { case ((y1, x1), (y2, x2)) =>
      (x1, y1, x2, y2)
    }
  }

  /** Geofence containment: which events fall inside a polygon fence?
    * Ray casting (even-odd rule, +lon ray) in PURE INTEGER
    * arithmetic: coordinates quantize to micro-degrees (floor of the
    * same IEEE double on both engines), and each edge's crossing
    * test is the exact cross product
    * t = (Xp−X1)(Y2−Y1) − (X2−X1)(Yp−Y1) with the sign of (Y2−Y1)
    * choosing the inequality — no float enters the decision, so the
    * in/out verdict cannot diverge at any scale (products ≤ 1e16 ≪
    * 2^63). The polygon is deliberately CONCAVE (see fenceEdges).
    *
    * Scale shape: polygon edges are a CONSTANT-size literal frame —
    * the "join" is a broadcast cross join with fixed fan-out
    * |edges|, then a map-side parity aggregation per event and a
    * per-type rollup: one scan, one shuffle of per-event parities
    * (groupBy event_id pre-aggregates map-side). At 100 TB with
    * MANY polygons the same plan keys the broadcast by polygon id;
    * a polygon too large to broadcast would go through the grid
    * cells like q_geo_radius. */
  val polygonJoin: Q = {
    val edgeValues = fenceEdges
      .map { case (x1, y1, x2, y2) => s"($x1, $y1, $x2, $y2)" }
      .mkString(", ")
    Q(
      "q_geo_polygon",
      s"""WITH pt AS (
        |  SELECT event_id, event_type,
        |    CAST(FLOOR((-5.0 + ${Slots.uniformSql("geolon", "event_id")}
        |      * 10) * 1000000) AS BIGINT) AS xp,
        |    CAST(FLOOR((40.0 + ${Slots.uniformSql("geolat", "event_id")}
        |      * 10) * 1000000) AS BIGINT) AS yp
        |  FROM events),
        |edges(x1, y1, x2, y2) AS (VALUES $edgeValues),
        |cross_t AS (
        |  SELECT pt.event_id, pt.event_type,
        |    CASE WHEN (e.y1 > pt.yp) <> (e.y2 > pt.yp) THEN
        |      CASE WHEN e.y2 > e.y1
        |        THEN CASE WHEN (pt.xp - e.x1) * (e.y2 - e.y1)
        |          - (e.x2 - e.x1) * (pt.yp - e.y1) < 0 THEN 1 ELSE 0 END
        |        ELSE CASE WHEN (pt.xp - e.x1) * (e.y2 - e.y1)
        |          - (e.x2 - e.x1) * (pt.yp - e.y1) > 0 THEN 1 ELSE 0 END
        |      END ELSE 0 END AS c
        |  FROM pt CROSS JOIN edges e),
        |par AS (
        |  SELECT event_id, event_type,
        |    CASE WHEN SUM(c) % 2 = 1 THEN 1 ELSE 0 END AS inside
        |  FROM cross_t GROUP BY 1, 2)
        |SELECT event_type, COUNT(*)::BIGINT AS n,
        |  SUM(inside)::BIGINT AS n_inside,
        |  (1000000 * SUM(inside)::BIGINT) // COUNT(*) AS inside_ppm
        |FROM par GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val pt = coords(Tables.events(s, dir)
          .select(col("event_id"), col("event_type")), "event_id")
        .select(col("event_id"), col("event_type"),
          floor(col("lon") * 1000000).cast("long").as("xp"),
          floor(col("lat") * 1000000).cast("long").as("yp"))
      val edges = s.createDataFrame(fenceEdges).toDF("x1", "y1", "x2", "y2")
      val t = (col("xp") - col("x1")) * (col("y2") - col("y1")) -
        (col("x2") - col("x1")) * (col("yp") - col("y1"))
      val crossFlag = when((col("y1") > col("yp")) =!= (col("y2") > col("yp")),
        when(col("y2") > col("y1"),
          when(t < 0, 1L).otherwise(0L))
          .otherwise(when(t > 0, 1L).otherwise(0L)))
        .otherwise(0L)
      pt.crossJoin(broadcast(edges))
        .select(col("event_id"), col("event_type"), crossFlag.as("c"))
        .groupBy(col("event_id"), col("event_type"))
        .agg(when(sum(col("c")) % 2 === 1, 1L).otherwise(0L).as("inside"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("inside")).as("n_inside"),
          expr("(1000000 * sum(inside)) div count(1)").as("inside_ppm"))
        .orderBy(col("event_type"))
    }
  }

  val all: Seq[Q] = Seq(radiusJoin, gridAgg, polygonJoin)
}
