package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Sources

/** Spatial grid-join operators (SURVEY §2.13 extension family): the
  * cell-bucketed neighborhood join that replaces the quadratic
  * cross-join for within-radius and nearest-neighbor queries — the
  * standard distributed spatial-join shape (grid/Quadtree partitioning
  * as in SpatialSpark / Apache Sedona, reduced to its equi-join core).
  *
  * The fixtures carry no coordinates, so each entity gets a
  * DETERMINISTIC planar position derived from its key on a
  * 10,000×10,000 integer lattice via the repo's Knuth-hash discipline:
  * `x = ((key mod 2²⁰)·2654435761) mod 10⁴`,
  * `y = ((key mod 2²⁰)·2246822519) mod 10⁴` (suppliers offset by +777
  * into a distinct stream). Pure BIGINT arithmetic — the DuckDB oracle
  * replays every coordinate bit-for-bit, and because the oracle SQL
  * computes the answer by BRUTE-FORCE cross join while the engine uses
  * the grid, a hash-PASS is a proof of grid completeness on the
  * fixture, not just agreement.
  *
  * Scale shape: a within-R join buckets both sides into R×R cells and
  * replicates the SMALLER side to its 3×3 cell neighborhood (9× — a
  * map-side explode, broadcastable when the small side is dim-sized);
  * the join is then a plain cell equi-join — ONE shuffle, with
  * per-task fan-out bounded by cell occupancy (density · R²), never
  * |A|·|B|. The exact integer distance² filter runs inside the joined
  * task. This is the same candidate-then-verify discipline as the
  * MinHash band join ([[Dedup]]) and the IVF cell join ([[Similarity]]).
  */
object Geo {

  private val M1 = 2654435761L
  private val M2 = 2246822519L

  /** Customer points: deterministic lattice coordinates per custkey. */
  private def custPoints(s: SparkSession, d: String): DataFrame =
    Sources.customer(s, d).select(
      col("c_custkey"),
      (col("c_custkey") % 1048576L * M1 % 10000L).as("cx"),
      (col("c_custkey") % 1048576L * M2 % 10000L).as("cy"))

  /** Supplier points: key offset +777 selects a distinct hash stream so
    * supplier k never shadows customer k's position.
    */
  private def suppPoints(s: SparkSession, d: String): DataFrame =
    Sources.supplier(s, d).select(
      col("s_suppkey"),
      ((col("s_suppkey") + 777L) % 1048576L * M1 % 10000L).as("sx"),
      ((col("s_suppkey") + 777L) % 1048576L * M2 % 10000L).as("sy"))

  /** Cell-replicated supplier side: each supplier lands in the 3×3
    * neighborhood of its `cell`-sized grid cell. Cell size == radius
    * guarantees every within-R partner is inside the neighborhood.
    */
  private def suppCells(s: SparkSession, d: String, cell: Long): DataFrame =
    suppPoints(s, d)
      .withColumn("ddx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("ddy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("s_suppkey"), col("sx"), col("sy"),
        (expr(s"sx div $cell") + col("ddx")).as("gx"),
        (expr(s"sy div $cell") + col("ddy")).as("gy"))

  private def withinR(s: SparkSession, d: String, r: Long): DataFrame = {
    val cust = custPoints(s, d)
      .withColumn("gx", expr(s"cx div $r"))
      .withColumn("gy", expr(s"cy div $r"))
    cust.join(suppCells(s, d, r), Seq("gx", "gy"))
      .withColumn("d2",
        (col("cx") - col("sx")) * (col("cx") - col("sx")) +
          (col("cy") - col("sy")) * (col("cy") - col("sy")))
      .filter(col("d2") <= r * r)
  }

  /** `geo_grid_neighbors`: every (customer, supplier) pair within
    * Euclidean distance 500 on the lattice, found via the grid join and
    * verified against the oracle's brute-force quadratic scan. d2 is
    * the exact integer squared distance.
    */
  def gridNeighbors(s: SparkSession, d: String): DataFrame =
    withinR(s, d, 500L)
      .select(col("c_custkey"), col("s_suppkey"), col("d2"))
      .orderBy("c_custkey", "s_suppkey")

  /** `geo_nearest_hub`: each customer's nearest supplier within radius
    * 1500 (argmin on exact d2, smallest suppkey on ties — a total
    * order, so both engines elect the same hub). Customers with no
    * supplier in range are dropped — the honest contract for a
    * grid-bounded nearest: an unbounded nearest would need expanding
    * ring probes, which is a different (iterative) operator. The
    * argmin window partitions by customer — corpus-keyed, fully
    * parallel, never a global sort.
    */
  def nearestHub(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("c_custkey")
      .orderBy(col("d2").asc, col("s_suppkey").asc)
    withinR(s, d, 1500L)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("c_custkey"), col("s_suppkey").as("hub_suppkey"), col("d2"))
      .orderBy("c_custkey")
  }

  /** `geo_cell_density`: the 1000×1000 super-cell census — customer
    * count, supplier count, and exact customer balance cents per cell
    * (the heatmap/partition-planning aggregate). One keyed aggregate
    * per side + an outer join on the ≤100-cell grid.
    */
  def cellDensity(s: SparkSession, d: String): DataFrame = {
    val c = custPoints(s, d)
      .join(Sources.customer(s, d).select(col("c_custkey"), col("c_acctbal")),
        Seq("c_custkey"))
      .groupBy(expr("cx div 1000").as("gx"), expr("cy div 1000").as("gy"))
      .agg(count(lit(1)).as("n_cust"),
        sum(round(col("c_acctbal") * 100).cast("long")).as("bal_cents"))
    val p = suppPoints(s, d)
      .groupBy(expr("sx div 1000").as("gx"), expr("sy div 1000").as("gy"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(p, Seq("gx", "gy"), "full_outer")
      .select(col("gx"), col("gy"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"),
        coalesce(col("bal_cents"), lit(0L)).as("bal_cents"))
      .orderBy("gx", "gy")
  }

  /** Five published hub coordinates (lat, lon) for the spherical
    * nearest-hub query — fixed literals shared verbatim with the
    * oracle.
    */
  private val hubs: Seq[(Long, Double, Double)] = Seq(
    (0L, 48.8566, 2.3522), (1L, 40.7128, -74.006), (2L, 35.6762, 139.6503),
    (3L, -33.8688, 151.2093), (4L, -1.2921, 36.8219))

  /** Spherical nearest hub by haversine (`geo_haversine_hub`, r13):
    * every customer's lattice point maps to (lat, lon) by the published
    * affine (lat = cx/10⁴·170 − 85, lon = cy/10⁴·360 − 180 — poles
    * avoided so cos φ never vanishes), then the nearest of 5 published
    * hubs by great-circle distance. The trig is necessarily double, so
    * the DECISION runs on the repo's quantized-lattice discipline
    * (the ER jwE6 pattern): d_e6 = round(d_km·10⁶) as BIGINT, argmin =
    * `least` over 5 literal structs (d_e6, hub_id) — ties to the lower
    * hub id, no join, no shuffle, pure map-side codegen (the
    * nearestLiteralCentroid shape). Both engines evaluate the
    * IDENTICAL expression tree (12742·asin(sqrt(sin²(Δφ/2) +
    * cosφ₁·cosφ₂·sin²(Δλ/2)))) before the one rounding.
    */
  def haversineHub(s: SparkSession, d: String): DataFrame = {
    val lat = col("cx").cast("double") / 10000.0 * 170.0 - 85.0
    val lon = col("cy").cast("double") / 10000.0 * 360.0 - 180.0
    def distE6(hlat: Double, hlon: Double): org.apache.spark.sql.Column = {
      val dphi = (radians(lit(hlat)) - radians(lat)) / 2.0
      val dlmb = (radians(lit(hlon)) - radians(lon)) / 2.0
      val a = sin(dphi) * sin(dphi) +
        cos(radians(lat)) * cos(radians(lit(hlat))) * sin(dlmb) * sin(dlmb)
      round(lit(12742.0) * asin(sqrt(a)) * 1e6).cast("long")
    }
    custPoints(s, d)
      .withColumn("best", least(hubs.map { case (h, la, lo) =>
        struct(distE6(la, lo).as("d"), lit(h).as("hub"))
      }: _*))
      .select(col("c_custkey"),
        col("best.hub").as("hub_id"),
        graft.functions.Num.roundNorm(
          col("best.d").cast("double") / 1e6, 4).as("dist_km"))
      .orderBy("c_custkey")
  }

  /** Grid DBSCAN (`geo_grid_dbscan`, r13): density clustering reduced
    * to its distributed core — GBSCAN/grid-DBSCAN (Gunawan 2013): bin
    * points into ε-cells, call a cell CORE when it holds ≥ minPts
    * points (ε = 1250, minPts = 4, published constants), and connect
    * 8-adjacent core cells into clusters with the same large-star/
    * small-star CC machinery every pairs→groups pipeline here uses
    * ([[Dedup.connectedGroups]]). Point-level DBSCAN needs a
    * per-neighbor distance pass; the cell-level variant is the standard
    * first reduction at scale because the expensive step collapses to
    * ONE keyed count over the corpus — cluster topology is then decided
    * on the cell table, which is corpus-size / (ε² density) rows, and
    * the adjacency join is a 9-way map-side explode + equi-join, the
    * [[suppCells]] shape, never points×points. The DuckDB oracle
    * brute-forces adjacency (|cells|² is oracle-sized) and replays the
    * CC as a recursive CTE, so a hash-PASS proves the shifted-key
    * candidate set is COMPLETE on the fixture, not just self-consistent.
    * Cluster id = min cell key (the CC canonical), cell key = gx·1000+gy.
    * ε = 500 / minPts = 5 bind at the gate SF (tens of multi-cell
    * clusters at sf0.01); at saturating densities the single giant
    * cluster the query returns IS the correct DBSCAN answer for a
    * near-uniform corpus — density clustering only separates what the
    * density separates.
    */
  def gridDbscan(s: SparkSession, d: String): DataFrame =
    gridDbscanOf(custPoints(s, d))

  /** Core algorithm on any (cx, cy) point table — separated so specs
    * can drive it with synthetic blobs where the expected clusters are
    * known by construction, not just fixture-replayed.
    */
  private[graft] def gridDbscanOf(points: DataFrame): DataFrame = {
    val eps = 500L
    val minPts = 5L
    val core = points
      .select(expr(s"cx div $eps").as("gx"), expr(s"cy div $eps").as("gy"))
      .groupBy("gx", "gy").agg(count(lit(1)).as("n_pts"))
      .filter(col("n_pts") >= minPts)
      .withColumn("cellkey", col("gx") * 1000L + col("gy"))
    val shifted = core
      .withColumn("ddx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("ddy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select((col("gx") + col("ddx")).as("gx"), (col("gy") + col("ddy")).as("gy"),
        col("cellkey").as("id_a"))
    val pairs = shifted
      .join(core.select(col("gx"), col("gy"), col("cellkey").as("id_b")),
        Seq("gx", "gy"))
      .filter(col("id_a") =!= col("id_b"))
      .select("id_a", "id_b")
    val groups = Dedup.connectedGroups(
      pairs, core.select(col("cellkey")), "cellkey")
    groups.join(core.select(col("cellkey").as("id"), col("n_pts")), Seq("id"))
      .groupBy(col("group_id").as("cluster_id"))
      .agg(count(lit(1)).as("n_cells"), sum("n_pts").as("n_points"))
      .orderBy("cluster_id")
  }

  /** Published CCW convex pentagon for the membership test — the
    * "service region" polygon a geo pipeline clips against.
    */
  private[graft] val Pentagon: Seq[(Long, Long)] = Seq(
    (2000L, 1000L), (8000L, 2000L), (9000L, 7000L), (5000L, 9500L),
    (1000L, 6000L))

  /** Point-in-convex-polygon census (`geo_point_in_polygon`, r13): each
    * customer point is tested against the published CCW pentagon via
    * the half-plane rule — inside ⇔ cross(b−a, p−a) ≥ 0 for every edge
    * (boundary counts as inside; the convention is published). Convex
    * membership needs NO ray casting and NO floats: five exact integer
    * cross products, compiled as one whole-stage-codegen expression —
    * there is no join at all; the polygon is a compile-time constant
    * like the KDE grid. One pass + a nation-keyed census with exact
    * basis-point shares. At 100 TB this is the cheapest possible geo
    * clip: a scan-local predicate the planner can even push past
    * projections.
    */
  def pointInPolygon(s: SparkSession, d: String): DataFrame = {
    val edges = Pentagon.zip(Pentagon.tail :+ Pentagon.head)
    val inside = edges.map { case ((ax, ay), (bx, by)) =>
      ((lit(bx) - lit(ax)) * (col("cy") - lit(ay)) -
        (lit(by) - lit(ay)) * (col("cx") - lit(ax))) >= 0L
    }.reduce(_ && _)
    Sources.customer(s, d).select(
        col("c_nationkey"),
        (col("c_custkey") % 1048576L * M1 % 10000L).as("cx"),
        (col("c_custkey") % 1048576L * M2 % 10000L).as("cy"))
      .withColumn("inside", inside)
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_total"),
        sum(col("inside").cast("long")).as("n_inside"))
      .withColumn("share_bp", expr("(10000L * n_inside) div n_total"))
      .orderBy("c_nationkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "geo_point_in_polygon" -> (pointInPolygon _),
    "geo_grid_dbscan" -> (gridDbscan _),
    "geo_haversine_hub" -> (haversineHub _),
    "geo_grid_neighbors" -> (gridNeighbors _),
    "geo_nearest_hub" -> (nearestHub _),
    "geo_cell_density" -> (cellDensity _),
  )

  private val pointsSql =
    """pts AS (
      | SELECT c_custkey,
      |   (c_custkey % 1048576) * 2654435761 % 10000 AS cx,
      |   (c_custkey % 1048576) * 2246822519 % 10000 AS cy
      | FROM customer),
      |spts AS (
      | SELECT s_suppkey,
      |   ((s_suppkey + 777) % 1048576) * 2654435761 % 10000 AS sx,
      |   ((s_suppkey + 777) % 1048576) * 2246822519 % 10000 AS sy
      | FROM supplier)""".stripMargin

  /** Generated from [[hubs]] so the published coordinates cannot drift
    * from their oracle; the mirrored expression tree matches
    * [[haversineHub]] operation-for-operation before the one rounding.
    */
  private def haversineOracle: String = {
    val hubRows = hubs.map { case (h, la, lo) => s"($h, $la, $lo)" }.mkString(", ")
    s"""WITH pts AS (
       | SELECT c_custkey,
       |   ((c_custkey % 1048576) * 2654435761 % 10000)::DOUBLE
       |     / 10000.0 * 170.0 - 85.0 AS lat,
       |   ((c_custkey % 1048576) * 2246822519 % 10000)::DOUBLE
       |     / 10000.0 * 360.0 - 180.0 AS lon
       | FROM customer),
       | cand AS (SELECT c_custkey, h.hub, CAST(round(12742.0 * asin(sqrt(
       |    sin((radians(h.hlat) - radians(lat)) / 2.0)
       |      * sin((radians(h.hlat) - radians(lat)) / 2.0)
       |    + cos(radians(lat)) * cos(radians(h.hlat))
       |      * sin((radians(h.hlon) - radians(lon)) / 2.0)
       |      * sin((radians(h.hlon) - radians(lon)) / 2.0))) * 1e6) AS BIGINT)
       |    AS d_e6
       |  FROM pts CROSS JOIN (VALUES $hubRows) AS h(hub, hlat, hlon)),
       | best AS (SELECT c_custkey, hub, d_e6,
       |    row_number() OVER (PARTITION BY c_custkey ORDER BY d_e6, hub) AS rn
       |  FROM cand)
       |SELECT c_custkey, CAST(hub AS BIGINT) AS hub_id,
       | round(d_e6::DOUBLE / 1e6, 4) + 0.0 AS dist_km
       |FROM best WHERE rn = 1 ORDER BY c_custkey""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "geo_haversine_hub" -> haversineOracle,
    "geo_grid_neighbors" ->
      s"""WITH $pointsSql
         |SELECT c_custkey, s_suppkey,
         |  (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) AS d2
         |FROM pts CROSS JOIN spts
         |WHERE (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) <= 250000
         |ORDER BY c_custkey, s_suppkey""".stripMargin,
    "geo_nearest_hub" ->
      s"""WITH $pointsSql,
         |cand AS (
         | SELECT c_custkey, s_suppkey,
         |   (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) AS d2
         | FROM pts CROSS JOIN spts
         | WHERE (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) <= 2250000),
         |ranked AS (
         | SELECT *, row_number() OVER (PARTITION BY c_custkey
         |   ORDER BY d2 ASC, s_suppkey ASC) AS rn FROM cand)
         |SELECT c_custkey, s_suppkey AS hub_suppkey, d2
         |FROM ranked WHERE rn = 1 ORDER BY c_custkey""".stripMargin,
    // the five half-plane tests replay as exact integer cross products
    "geo_point_in_polygon" ->
      """WITH pts AS (SELECT c_nationkey,
        |   (c_custkey % 1048576) * 2654435761 % 10000 AS cx,
        |   (c_custkey % 1048576) * 2246822519 % 10000 AS cy
        |  FROM customer),
        | t AS (SELECT c_nationkey,
        |   CASE WHEN (8000 - 2000) * (cy - 1000) - (2000 - 1000) * (cx - 2000) >= 0
        |     AND (9000 - 8000) * (cy - 2000) - (7000 - 2000) * (cx - 8000) >= 0
        |     AND (5000 - 9000) * (cy - 7000) - (9500 - 7000) * (cx - 9000) >= 0
        |     AND (1000 - 5000) * (cy - 9500) - (6000 - 9500) * (cx - 5000) >= 0
        |     AND (2000 - 1000) * (cy - 6000) - (1000 - 6000) * (cx - 1000) >= 0
        |    THEN 1 ELSE 0 END AS inside
        |  FROM pts)
        |SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_total,
        | CAST(sum(inside) AS BIGINT) AS n_inside,
        | CAST((10000 * sum(inside)) // count(*) AS BIGINT) AS share_bp
        |FROM t GROUP BY 1 ORDER BY c_nationkey""".stripMargin,
    // brute-force cell adjacency + recursive-CTE CC: a hash-PASS proves
    // the engine's shifted-key candidate join found every adjacency
    "geo_grid_dbscan" ->
      s"""WITH RECURSIVE $pointsSql,
         |core AS (
         | SELECT cx // 500 AS gx, cy // 500 AS gy,
         |   CAST(count(*) AS BIGINT) AS n_pts
         | FROM pts GROUP BY 1, 2 HAVING count(*) >= 5),
         |cells AS (SELECT gx * 1000 + gy AS cellkey, gx, gy, n_pts FROM core),
         |e AS (
         | SELECT a.cellkey AS src, b.cellkey AS dst FROM cells a JOIN cells b
         |  ON abs(a.gx - b.gx) <= 1 AND abs(a.gy - b.gy) <= 1
         |   AND a.cellkey <> b.cellkey),
         |reach(src, dst) AS (
         | SELECT cellkey, cellkey FROM cells
         | UNION
         | SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src),
         |comp AS (SELECT src AS cellkey, min(dst) AS cluster_id
         | FROM reach GROUP BY src)
         |SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_cells,
         | CAST(sum(n_pts) AS BIGINT) AS n_points
         |FROM comp JOIN cells USING (cellkey)
         |GROUP BY 1 ORDER BY cluster_id""".stripMargin,
    "geo_cell_density" ->
      s"""WITH $pointsSql,
         |cc AS (
         | SELECT cx // 1000 AS gx, cy // 1000 AS gy,
         |   CAST(count(*) AS BIGINT) AS n_cust,
         |   CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
         |     AS bal_cents
         | FROM pts JOIN customer USING (c_custkey) GROUP BY 1, 2),
         |sc AS (
         | SELECT sx // 1000 AS gx, sy // 1000 AS gy,
         |   CAST(count(*) AS BIGINT) AS n_supp
         | FROM spts GROUP BY 1, 2)
         |SELECT gx, gy,
         |  CAST(coalesce(n_cust, 0) AS BIGINT) AS n_cust,
         |  CAST(coalesce(n_supp, 0) AS BIGINT) AS n_supp,
         |  CAST(coalesce(bal_cents, 0) AS BIGINT) AS bal_cents
         |FROM cc FULL OUTER JOIN sc USING (gx, gy)
         |ORDER BY gx, gy""".stripMargin,
  )
}
