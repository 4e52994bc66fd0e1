package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Sources

/** Multi-dimensional layout clustering: the Z-order (Morton) key and the
  * bucket-span audit that justifies it.
  *
  * At 100 TB a table is pruned, not scanned: parquet row-group min/max
  * statistics skip files whose range misses the predicate, but a table
  * SORTED on one column has useless statistics for every other column.
  * Interleaving the bits of two (bounded-width) dimension keys into one
  * sort key — Z-ordering, the layout trick behind Delta/Iceberg
  * `OPTIMIZE ZORDER BY` — keeps BOTH dimensions' min/max spans tight in
  * every file, so predicates on either column (or both) prune. The key
  * is pure integer bit arithmetic (five mask-and-shift steps per
  * dimension, codegen'd `shiftleft`/`&`/`|` — no UDF), so the whole
  * layout decision is deterministic and the DuckDB oracle replays it
  * bit-for-bit.
  *
  * Width contract: inputs are masked to 31 bits (the two spread words
  * interleave into ≤ 62 bits — always a positive Long). Dimensions
  * wider than 31 bits z-order on a truncated prefix (shift the raw key
  * right first), exactly like the production systems do at coarser
  * granularity; the fixture keys (custkey ≤ 2¹⁴·sf, order day ≤ 2¹²)
  * sit far inside the bound at any plausible scale factor.
  */
object Layout {

  /** Spread the low 31 bits of `c` so bit i lands at position 2i —
    * the standard 64-bit Morton part1by1 ladder.
    */
  private[ops] def spreadBits(c: Column): Column = {
    var x = c.bitwiseAND(lit(0x7FFFFFFFL))
    x = x.bitwiseOR(shiftleft(x, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x3333333333333333L))
    x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** 62-bit Z-order key of two dimension keys: a's bits at even
    * positions, b's at odd.
    */
  def zorderKey(a: Column, b: Column): Column =
    spreadBits(a).bitwiseOR(shiftleft(spreadBits(b), 1))

  /** Driver-side twin of [[spreadBits]]/[[zorderKey]] for tests. */
  private[ops] def zorderKeyLocal(a: Long, b: Long): Long = {
    def spread(v0: Long): Long = {
      var x = v0 & 0x7FFFFFFFL
      x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
      x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
      x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
      x = (x | (x << 2)) & 0x3333333333333333L
      (x | (x << 1)) & 0x5555555555555555L
    }
    spread(a) | (spread(b) << 1)
  }

  /** Z-order bucket-span audit (`layout_zorder_spans`): grid-normalize
    * each dimension of (custkey, order-day) onto a 16-bit lattice from
    * its corpus min/max — interleaving RAW keys wastes bits whenever
    * the dimensions have different widths (measured on the fixture: the
    * day key is 16× wider, so its high bits alone decided every bucket
    * and the custkey span stayed corpus-wide; range-normalizing first
    * is exactly what the production OPTIMIZE ZORDER implementations
    * do) — then interleave, cut the key space into ≤ 64 equal-width
    * buckets (the stand-ins for the files a clustered write would
    * produce; the shift derives from the max key via the integer log₂
    * ladder, data-dependent but deterministic), and report each
    * bucket's row count and BOTH dimensions' raw min/max spans. Tight
    * spans on both columns in every bucket are exactly the statistics
    * a parquet reader prunes on; the same audit over a single-column
    * sort shows one tight and one corpus-wide span. One projection +
    * one 64-group aggregate; the two 1-row stat aggregates ride in as
    * broadcast attaches.
    */
  def zorderSpans(s: SparkSession, d: String): DataFrame = {
    val base = Sources.orders(s, d).select(
      col("o_custkey").as("ck"),
      datediff(col("o_orderdate"), lit("1992-01-01").cast("date")).cast("long").as("dy"))
    val stats = base.agg(
      min("ck").as("ck_lo"), max("ck").as("ck_hi"),
      min("dy").as("dy_lo"), max("dy").as("dy_hi"))
    // exact integer grid cell: (v − lo)·65535 div max(hi − lo, 1)
    val keyed = base.crossJoin(broadcast(stats))
      .withColumn("z", zorderKey(
        expr("((ck - ck_lo) * 65535) div greatest(ck_hi - ck_lo, 1)"),
        expr("((dy - dy_lo) * 65535) div greatest(dy_hi - dy_lo, 1)")))
    val mz = keyed.agg(max("z").as("mz"))
    keyed.crossJoin(broadcast(mz))
      // integer log2 via binary-string length (the degreeHist trick —
      // exact in both engines); shift so ≤ 64 buckets remain
      .withColumn("bucket",
        expr("shiftright(z, greatest(0, length(bin(mz)) - 6))"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min("ck").as("ck_min"), max("ck").as("ck_max"),
        min("dy").as("dy_min"), max("dy").as("dy_max"))
      .select(col("bucket"), col("n_rows"),
        col("ck_min"), col("ck_max"), (col("ck_max") - col("ck_min")).as("ck_span"),
        col("dy_min"), col("dy_max"), (col("dy_max") - col("dy_min")).as("dy_span"))
      .orderBy("bucket")
  }

  /** Pruning face-off (`layout_prune_compare`): the same 64-file
    * simulation under BOTH layouts — Z-order vs a single-column sort
    * (files = equal value ranges of `ck`, what a sorted write
    * produces) — against three predicates (a ~10% `ck` band, a ~10%
    * `dy` band, and their conjunction; bounds derived from corpus
    * min/max as exact integer percentiles of the span). A file is
    * "scanned" when its min/max spans overlap every band the predicate
    * constrains — the parquet row-group skip rule. The numbers tell
    * the whole layout story: the single-sort layout prunes its own
    * column hard and scans EVERYTHING for the other column's
    * predicate; Z-order prunes BOTH (and the conjunction multiplies).
    * All integer, hash-checked. Bucket tables are 64-row lazy pins —
    * each feeds three predicate aggregates.
    */
  def pruneCompare(s: SparkSession, d: String): DataFrame = {
    val base = Sources.orders(s, d).select(
      col("o_custkey").as("ck"),
      datediff(col("o_orderdate"), lit("1992-01-01").cast("date")).cast("long").as("dy"))
    val stats = base.agg(
      min("ck").as("ck_lo"), max("ck").as("ck_hi"),
      min("dy").as("dy_lo"), max("dy").as("dy_hi"))
    val withStats = base.crossJoin(broadcast(stats))

    def spansOf(bucket: Column): DataFrame =
      graft.io.Checkpoints.pin(
        withStats.withColumn("bucket", bucket)
          .groupBy("bucket")
          .agg(min("ck").as("ck_min"), max("ck").as("ck_max"),
            min("dy").as("dy_min"), max("dy").as("dy_max"),
            // carry the corpus stats for the predicate bounds (equal on
            // every row; max() is just the reduce that keeps them)
            max("ck_lo").as("ck_lo"), max("ck_hi").as("ck_hi"),
            max("dy_lo").as("dy_lo"), max("dy_hi").as("dy_hi")),
        eager = false)

    val zSpans = {
      val keyed = withStats.withColumn("z", zorderKey(
        expr("((ck - ck_lo) * 65535) div greatest(ck_hi - ck_lo, 1)"),
        expr("((dy - dy_lo) * 65535) div greatest(dy_hi - dy_lo, 1)")))
      val mz = keyed.agg(max("z").as("mz"))
      graft.io.Checkpoints.pin(
        keyed.crossJoin(broadcast(mz))
          .withColumn("bucket", expr("shiftright(z, greatest(0, length(bin(mz)) - 6))"))
          .groupBy("bucket")
          .agg(min("ck").as("ck_min"), max("ck").as("ck_max"),
            min("dy").as("dy_min"), max("dy").as("dy_max"),
            max("ck_lo").as("ck_lo"), max("ck_hi").as("ck_hi"),
            max("dy_lo").as("dy_lo"), max("dy_hi").as("dy_hi")),
        eager = false)
    }
    val linSpans = spansOf(
      expr("((ck - ck_lo) * 64) div greatest(ck_hi - ck_lo + 1, 1)"))

    // integer predicate bands: the middle ~10% of each dimension's span
    val ckBand = ("ck_lo + ((ck_hi - ck_lo) * 45) div 100",
      "ck_lo + ((ck_hi - ck_lo) * 55) div 100")
    val dyBand = ("dy_lo + ((dy_hi - dy_lo) * 45) div 100",
      "dy_lo + ((dy_hi - dy_lo) * 55) div 100")
    val ckOverlap = s"ck_min <= ${ckBand._2} AND ck_max >= ${ckBand._1}"
    val dyOverlap = s"dy_min <= ${dyBand._2} AND dy_max >= ${dyBand._1}"

    def audit(spans: DataFrame, layout: String, pred: String, overlapSql: String): DataFrame =
      spans.agg(count(lit(1)).as("n_buckets"),
        sum(when(expr(overlapSql), 1L).otherwise(0L)).as("n_scanned"))
        .select(lit(layout).as("layout"), lit(pred).as("predicate"),
          col("n_buckets"), col("n_scanned"))

    Seq(
      audit(zSpans, "zorder", "ck_band", ckOverlap),
      audit(zSpans, "zorder", "dy_band", dyOverlap),
      audit(zSpans, "zorder", "both", s"($ckOverlap) AND ($dyOverlap)"),
      audit(linSpans, "sorted_ck", "ck_band", ckOverlap),
      audit(linSpans, "sorted_ck", "dy_band", dyOverlap),
      audit(linSpans, "sorted_ck", "both", s"($ckOverlap) AND ($dyOverlap)"),
    ).reduce(_ unionAll _).orderBy("layout", "predicate")
  }

  /** The 8 unrolled Hilbert xy2d rounds (order-8 curve, 256×256 grid)
    * as (column, expression) stages — generated ONCE and shared
    * verbatim by the Spark fold and the oracle's CTE chain (the
    * soundexSql/mod97Sql discipline). The classic loop (s halving from
    * 128; d += s²·((3rx) XOR ry); conditional reflect + swap) is made
    * engine-portable two ways: the XOR collapses to the closed form
    * 3rx + ry − 2·rx·ry on the {0,1}² domain (DuckDB's `^` is POWER,
    * not xor), and the reflect+swap becomes one 3-way CASE per
    * coordinate computed from the PRE-stage columns (simultaneous
    * assignment — a sequential rewrite would read the already-swapped
    * x). Stage i reads hx{i}/hy{i}/hd{i} and defines hx{i+1}/…
    */
  private[ops] def hilbertStages: Seq[(String, String)] = {
    Seq(128, 64, 32, 16, 8, 4, 2, 1).zipWithIndex.flatMap { case (s, i) =>
      val (x, y, dd) = (s"hx$i", s"hy$i", s"hd$i")
      val rx = s"(CASE WHEN ($x & $s) > 0 THEN 1 ELSE 0 END)"
      val ry = s"(CASE WHEN ($y & $s) > 0 THEN 1 ELSE 0 END)"
      Seq(
        s"hd${i + 1}" -> s"$dd + $s * $s * (3 * $rx + $ry - 2 * $rx * $ry)",
        s"hx${i + 1}" ->
          s"(CASE WHEN $ry = 1 THEN $x WHEN $rx = 1 THEN $s - 1 - $y ELSE $y END)",
        s"hy${i + 1}" ->
          s"(CASE WHEN $ry = 1 THEN $y WHEN $rx = 1 THEN $s - 1 - $x ELSE $x END)")
    }
  }

  /** Hilbert vs Morton clustering face-off (`layout_hilbert_compare`,
    * r13): the published metric behind every "Z-order or Hilbert?"
    * clustering decision is the CLUSTER COUNT — how many runs of
    * CONSECUTIVE index values a rectangle query shatters into (Moon
    * et al. 2001: each run is one contiguous scan; fewer/longer runs
    * = fewer seeks and fuller row-groups). Bucket-count comparisons
    * are a trap here: any power-of-4 equal-width cut partitions BOTH
    * curves into the same 2ᵏ×2ᵏ squares (a complete curve subtree IS
    * a square), so their bucket censuses are identical by
    * construction — the run structure inside the index line is where
    * the curves genuinely differ. Audit: the 4096 cells of one
    * DELIBERATELY tile-unaligned 64×64 rectangle (x 40–103, y 20–83)
    * are indexed under both curves (8 generated xy2d stages shared
    * verbatim with the oracle; Morton via the same spread ladder);
    * run starts are cells whose predecessor index is absent — ONE
    * self anti-join on d = d+1, no sort, no window — and the corpus
    * joins in as the count/index-sum census of the customer points
    * landing in the rectangle (a per-curve integer signature). All
    * integer; mean run length ships as an e6 floor.
    */
  def hilbertCompare(s: SparkSession, d: String): DataFrame = {
    def withCurves(df: DataFrame): DataFrame = {
      val hil = hilbertStages.foldLeft(
        df.withColumn("hx0", col("x")).withColumn("hy0", col("y"))
          .withColumn("hd0", lit(0L))) { case (acc, (c, e)) =>
        acc.withColumn(c, expr(e))
      }
      hil.select(col("x"), col("y"), col("hd8").cast("long").as("hilbert"),
        zorderKey(col("x"), col("y")).as("morton"))
    }
    val cells = graft.io.Checkpoints.pin(withCurves(
      s.range(0, 4096).select(expr("id div 64 + 40").as("x"),
        expr("id % 64 + 20").as("y"))),
      eager = false)
    val inRegion = col("x") >= 40L && col("x") <= 103L &&
      col("y") >= 20L && col("y") <= 83L
    val pts = graft.io.Checkpoints.pin(
      withCurves(Sources.customer(s, d).select(
        pmod(col("c_custkey") * lit(2654435761L), lit(4294967296L))
          .mod(lit(256L)).as("x"),
        pmod(col("c_custkey") * lit(2246822519L), lit(4294967296L))
          .mod(lit(256L)).as("y")))
        .filter(inRegion),
      eager = false)
    def arm(curve: String, idx: String): DataFrame = {
      val ids = cells.select(col(idx).as("dd"))
      val starts = ids.join(ids.select((col("dd") + 1L).as("dd")),
        Seq("dd"), "left_anti")
      val cens = ids.agg(count(lit(1)).as("n_cells"))
        .crossJoin(broadcast(starts.agg(count(lit(1)).as("n_clusters"))))
        .crossJoin(broadcast(pts.agg(count(lit(1)).as("n_points"),
          coalesce(sum(col(idx)), lit(0L)).as("sum_idx"))))
      cens.select(lit(curve).as("curve"), col("n_cells"), col("n_clusters"),
        expr("(n_cells * 1000000L) div n_clusters").as("mean_run_e6"),
        col("n_points"), col("sum_idx"))
    }
    arm("hilbert", "hilbert").unionAll(arm("morton", "morton"))
      .orderBy("curve")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "layout_zorder_spans" -> (zorderSpans _),
    "layout_prune_compare" -> (pruneCompare _),
    "layout_hilbert_compare" -> (hilbertCompare _),
  )

  /** The Morton ladder inlined per dimension; constants in decimal
    * (DuckDB hex literals are strings). Every step parenthesized —
    * SQL bitwise precedence differs between engines.
    */
  private def mortonSql(v: String): String = {
    var e = s"($v & 2147483647)"
    e = s"((($e | ($e << 16)) & 281470681808895))"
    e = s"((($e | ($e << 8)) & 71777214294589695))"
    e = s"((($e | ($e << 4)) & 1085102592571150095))"
    e = s"((($e | ($e << 2)) & 3689348814741910323))"
    s"((($e | ($e << 1)) & 6148914691236517205))"
  }

  /** The shared Hilbert stages rendered as a DuckDB CTE chain: stage 1
    * reads `src`, later stages chain on `prefix{i}`; the final CTE is
    * `prefix8`.
    */
  private def hilbertCteChain(prefix: String, src: String): String =
    hilbertStages.grouped(3).zipWithIndex.map {
      case (Seq((cd, ed), (cx, ex), (cy, ey)), i) =>
        val from = if (i == 0) src else s"$prefix$i"
        s"$prefix${i + 1} AS (SELECT *, $ed AS $cd, $ex AS $cx, $ey AS $cy" +
          s" FROM $from)"
      case other => sys.error(s"unexpected stage group: $other")
    }.mkString(",\n ")

  val oracles: Map[String, String] = Map(
    // same generated xy2d stages over the same unaligned 4096-cell
    // rectangle, same anti-join run starts, same point census
    "layout_hilbert_compare" ->
      (s"""WITH grid AS (SELECT CAST(i // 64 + 40 AS BIGINT) AS x,
         |   CAST(i % 64 + 20 AS BIGINT) AS y
         |  FROM (SELECT unnest(generate_series(0, 4095)) AS i)),
         | st0 AS (SELECT x, y, x AS hx0, y AS hy0,
         |   CAST(0 AS BIGINT) AS hd0 FROM grid),
         | ${hilbertCteChain("st", "st0")},
         | cells AS MATERIALIZED (SELECT CAST(hd8 AS BIGINT) AS hilbert,
         |    (${mortonSql("x")} | (${mortonSql("y")} << 1)) AS morton
         |   FROM st8),
         | ph AS (SELECT (c_custkey * 2654435761) % 4294967296 % 256 AS x,
         |    (c_custkey * 2246822519) % 4294967296 % 256 AS y FROM customer),
         | p0 AS (SELECT x, y, x AS hx0, y AS hy0,
         |   CAST(0 AS BIGINT) AS hd0 FROM ph
         |  WHERE x BETWEEN 40 AND 103 AND y BETWEEN 20 AND 83),
         | ${hilbertCteChain("pt", "p0")},
         | pts AS (SELECT CAST(hd8 AS BIGINT) AS hilbert,
         |    (${mortonSql("x")} | (${mortonSql("y")} << 1)) AS morton
         |   FROM pt8),
         | hruns AS (SELECT CAST(count(*) AS BIGINT) AS n_clusters
         |   FROM cells a LEFT JOIN cells b ON a.hilbert = b.hilbert + 1
         |   WHERE b.hilbert IS NULL),
         | mruns AS (SELECT CAST(count(*) AS BIGINT) AS n_clusters
         |   FROM cells a LEFT JOIN cells b ON a.morton = b.morton + 1
         |   WHERE b.morton IS NULL),
         | hp AS (SELECT CAST(count(*) AS BIGINT) AS n_points,
         |    CAST(coalesce(sum(hilbert), 0) AS BIGINT) AS sum_idx FROM pts),
         | mp AS (SELECT CAST(count(*) AS BIGINT) AS n_points,
         |    CAST(coalesce(sum(morton), 0) AS BIGINT) AS sum_idx FROM pts)
         |SELECT * FROM (
         | SELECT 'hilbert' AS curve, CAST(4096 AS BIGINT) AS n_cells,
         |   h.n_clusters, (CAST(4096 AS BIGINT) * 1000000) // h.n_clusters AS mean_run_e6,
         |   hp.n_points, hp.sum_idx FROM hruns h CROSS JOIN hp
         | UNION ALL
         | SELECT 'morton', CAST(4096 AS BIGINT), m.n_clusters,
         |   (CAST(4096 AS BIGINT) * 1000000) // m.n_clusters, mp.n_points, mp.sum_idx
         |  FROM mruns m CROSS JOIN mp)
         |ORDER BY curve""".stripMargin),
    "layout_zorder_spans" ->
      s"""WITH o AS (SELECT o_custkey AS ck,
         |   CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS dy
         |  FROM orders),
         | st AS (SELECT min(ck) AS ck_lo, max(ck) AS ck_hi,
         |   min(dy) AS dy_lo, max(dy) AS dy_hi FROM o),
         | g AS (SELECT ck, dy,
         |   ((ck - ck_lo) * 65535) // greatest(ck_hi - ck_lo, 1) AS gk,
         |   ((dy - dy_lo) * 65535) // greatest(dy_hi - dy_lo, 1) AS gd
         |  FROM o, st),
         | z AS (SELECT ck, dy,
         |   (${mortonSql("gk")} | (${mortonSql("gd")} << 1)) AS z FROM g),
         | m AS (SELECT max(z) AS mz FROM z),
         | b AS (SELECT ck, dy,
         |   z >> greatest(0, length(bin(mz)) - 6) AS bucket FROM z, m)
         |SELECT bucket, count(*) AS n_rows,
         | min(ck) AS ck_min, max(ck) AS ck_max, max(ck) - min(ck) AS ck_span,
         | min(dy) AS dy_min, max(dy) AS dy_max, max(dy) - min(dy) AS dy_span
         |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
    "layout_prune_compare" ->
      s"""WITH o AS (SELECT o_custkey AS ck,
         |   CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS dy
         |  FROM orders),
         | st AS (SELECT min(ck) AS ck_lo, max(ck) AS ck_hi,
         |   min(dy) AS dy_lo, max(dy) AS dy_hi FROM o),
         | g AS (SELECT ck, dy, ck_lo, ck_hi, dy_lo, dy_hi,
         |   ((ck - ck_lo) * 65535) // greatest(ck_hi - ck_lo, 1) AS gk,
         |   ((dy - dy_lo) * 65535) // greatest(dy_hi - dy_lo, 1) AS gd
         |  FROM o, st),
         | z AS (SELECT *, (${mortonSql("gk")} | (${mortonSql("gd")} << 1)) AS z FROM g),
         | m AS (SELECT max(z) AS mz FROM z),
         | zb AS (SELECT z >> greatest(0, length(bin(mz)) - 6) AS bucket,
         |   min(ck) AS ck_min, max(ck) AS ck_max, min(dy) AS dy_min, max(dy) AS dy_max,
         |   max(ck_lo) AS ck_lo, max(ck_hi) AS ck_hi, max(dy_lo) AS dy_lo, max(dy_hi) AS dy_hi
         |  FROM z, m GROUP BY 1),
         | lb AS (SELECT ((ck - ck_lo) * 64) // greatest(ck_hi - ck_lo + 1, 1) AS bucket,
         |   min(ck) AS ck_min, max(ck) AS ck_max, min(dy) AS dy_min, max(dy) AS dy_max,
         |   max(ck_lo) AS ck_lo, max(ck_hi) AS ck_hi, max(dy_lo) AS dy_lo, max(dy_hi) AS dy_hi
         |  FROM g GROUP BY 1),
         | preds(predicate) AS (VALUES ('ck_band'), ('dy_band'), ('both')),
         | layouts AS (
         |   SELECT 'zorder' AS layout, * FROM zb
         |   UNION ALL SELECT 'sorted_ck' AS layout, * FROM lb)
         |SELECT layout, predicate, count(*) AS n_buckets,
         | CAST(sum(CASE WHEN
         |   (predicate IN ('ck_band', 'both')
         |     AND NOT (ck_min <= ck_lo + ((ck_hi - ck_lo) * 55) // 100
         |          AND ck_max >= ck_lo + ((ck_hi - ck_lo) * 45) // 100)) THEN 0
         |  WHEN
         |   (predicate IN ('dy_band', 'both')
         |     AND NOT (dy_min <= dy_lo + ((dy_hi - dy_lo) * 55) // 100
         |          AND dy_max >= dy_lo + ((dy_hi - dy_lo) * 45) // 100)) THEN 0
         |  ELSE 1 END) AS BIGINT) AS n_scanned
         |FROM layouts, preds
         |GROUP BY layout, predicate
         |ORDER BY layout, predicate""".stripMargin,
  )
}
