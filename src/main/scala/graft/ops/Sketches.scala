package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Num.roundNorm
import graft.io.Sources

/** Mergeable sketch operators — the sublinear-state summaries a 100 TB
  * pipeline computes ONCE per partition/day and then merges, instead of
  * re-scanning the corpus per question:
  *
  *  - a Count-Min sketch maintained as a plain relational table
  *    (d·w counter rows from one map-side-combinable aggregate; point
  *    estimates are equi-joins + MIN over the d hash rows). The hash
  *    family is pure 64-bit integer arithmetic, so the whole estimator
  *    is engine-independent and DuckDB replays it bit-for-bit — a
  *    probabilistic structure with an EXACT oracle.
  *  - HyperLogLog daily sketches (Spark's DataSketches `hll_sketch_agg`)
  *    rolled up with `hll_union_agg`: sketch-of-union == union-of-
  *    sketches, which is what makes "distinct users over any window"
  *    answerable from day-grain state without touching raw events.
  *
  * Scale notes: both sketches reduce each partition to bounded state
  * (d·w longs / one lgK=12 HLL register set) with map-side combine; the
  * estimate side touches only sketch rows, never the corpus. The CMS
  * guarantees est ≥ exact (overestimate-only), err ≤ N·e/w w.h.p.
  */
object Sketches {

  // -------------------------------------------------------- Count-Min

  private val P = 2147483647L // 2^31 − 1, prime
  private val W = 512L        // counters per hash row
  private val As = Seq(1103515245L, 1299709L, 15485863L, 32452843L)
  private val Bs = Seq(12345L, 7919L, 104729L, 1299721L)
  private val D = As.size

  /** Row-j bucket of key u: ((u mod P)·A_j + B_j mod P) mod W — products
    * stay under 2^62, so 64-bit integer ops are exact in both engines.
    */
  private def bucket(u: Column, j: Int): Column =
    pmod(pmod(u, lit(P)) * lit(As(j)) + lit(Bs(j)), lit(P)) % lit(W)

  /** The key's d (row, bucket) cells as an array column — shared by the
    * batch sketch, the probe side, and the streaming twin.
    */
  private[graft] def cellArray(u: Column): Column =
    array((0 until D).map(j =>
      struct(lit(j).cast("long").as("j"), bucket(u, j).as("bucket"))): _*)

  /** The sketch itself: one aggregate pass over `events`, exploding each
    * key into its d (row, bucket) cells — at most d·w = 2 048 counter
    * rows out, partial+final combined.
    */
  private[graft] def cmsTable(s: SparkSession, d: String): DataFrame = {
    Sources.events(s, d)
      .select(explode(cellArray(col("user_id"))).as("cell"))
      .groupBy(col("cell.j").as("j"), col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** CMS point estimates for the exact top-10 heaviest users, reported
    * against their true counts: estimate = MIN over the key's d sketch
    * cells (equi-join on (j, bucket) — sketch-sized, never corpus-sized).
    * `overest` is the structure's signed guarantee: always ≥ 0.
    */
  def cmsUsers(s: SparkSession, d: String): DataFrame = {
    val exact = Sources.events(s, d).groupBy("user_id")
      .agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("user_id")).limit(10)
    val probes = exact.select(col("user_id"), col("exact_cnt"),
      explode(cellArray(col("user_id"))).as("cell"))
      .select(col("user_id"), col("exact_cnt"),
        col("cell.j").as("j"), col("cell.bucket").as("bucket"))
    probes.join(cmsTable(s, d), Seq("j", "bucket"))
      .groupBy("user_id", "exact_cnt")
      .agg(min("cnt").as("cms_est"))
      .select(col("user_id"), col("exact_cnt"), col("cms_est"),
        (col("cms_est") - col("exact_cnt")).as("overest"))
      .orderBy(col("exact_cnt").desc, col("user_id"))
  }

  /** CMS join-size estimation (`sketch_join_size`) — the
    * cost-based-optimizer primitive at 100 TB: |A ⨝ B| on a key is
    * estimated from two SKETCHES (per hash row j, Σ_b A_j[b]·B_j[b];
    * min over rows), so planning a join between two petabyte tables
    * reads 2·d·w = 4 096 counters instead of either table. The
    * estimate is an upper bound in expectation (hash collisions only
    * ADD cross terms); the query reports it against the exact size —
    * itself computed from per-key COUNT aggregates, never a
    * materialized join. Integer hashes ⇒ the whole estimator replays
    * exactly in the oracle.
    */
  def joinSizeEst(s: SparkSession, d: String): DataFrame = {
    def sketchOf(df: DataFrame, key: String, out: String): DataFrame =
      df.select(explode(cellArray(col(key))).as("cell"))
        .groupBy(col("cell.j").as("j"), col("cell.bucket").as("bucket"))
        .agg(count(lit(1)).as(out))
    val est = sketchOf(Sources.events(s, d), "user_id", "ca")
      .join(sketchOf(Sources.orders(s, d), "o_custkey", "cb"), Seq("j", "bucket"))
      .groupBy("j").agg(sum(col("ca") * col("cb")).as("est_j"))
      .agg(min("est_j").as("cms_est"))
    val exact = Sources.events(s, d)
      .groupBy(col("user_id")).agg(count(lit(1)).as("na"))
      .join(Sources.orders(s, d)
        .groupBy(col("o_custkey").as("user_id")).agg(count(lit(1)).as("nb")),
        "user_id")
      .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).as("exact_size"))
    est.crossJoin(broadcast(exact)) // 1-row × 1-row attach
      .select(col("cms_est"), col("exact_size"),
        (col("cms_est") - col("exact_size")).as("overest"))
  }

  // ------------------------------------------------------ HyperLogLog

  /** Day-grain HLL state over `events`: per-day distinct-user estimates
    * next to exact counts. This is the table a pipeline PERSISTS — the
    * raw corpus is never re-scanned for a distinct question again.
    * Rows-only by contract (DataSketches registers are not
    * SQL-replayable in the oracle); SketchesSpec pins the error enveloped
    * by the lgK=12 standard deviation and the merge identity.
    */
  def hllDailyUsers(s: SparkSession, d: String): DataFrame =
    Sources.events(s, d)
      .groupBy(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
      .agg(
        hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est_users"),
        count_distinct(col("user_id")).as("exact_users"))
      .select(col("day"), col("est_users"), col("exact_users"),
        roundNorm(abs(col("est_users") - col("exact_users")).cast("double") /
          col("exact_users").cast("double"), 4).as("rel_err"))
      .orderBy("day")

  /** Month-grain rollup MERGING the day-grain sketches (never re-reading
    * events' rows twice): union-of-sketches per month, plus the exact
    * distinct for the error column. The merge is the whole point — at
    * 100 TB the daily table is the only input a rollup needs.
    */
  def hllRollup(s: SparkSession, d: String): DataFrame = {
    val daily = Sources.events(s, d)
      .groupBy(date_format(to_date(col("ts")), "yyyy-MM").as("month"),
        to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sketch"))
    val merged = daily.groupBy("month")
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("est_users"))
    val exact = Sources.events(s, d)
      .groupBy(date_format(to_date(col("ts")), "yyyy-MM").as("month"))
      .agg(count_distinct(col("user_id")).as("exact_users"))
    merged.join(exact, Seq("month"))
      .select(col("month"), col("est_users"), col("exact_users"),
        roundNorm(abs(col("est_users") - col("exact_users")).cast("double") /
          col("exact_users").cast("double"), 4).as("rel_err"))
      .orderBy("month")
  }

  // ----------------------------------------------- Quantile grid sketch

  private val QW = 64L // grid buckets
  private val Qs = Seq(0.5, 0.9, 0.99)

  /** Day-grain fixed-grid histogram over `events.value` — the mergeable
    * quantile sketch in plain relational form (the same "persist bounded
    * state per day, merge for any window" discipline as the HLL daily
    * table, but with EXACT oracle-replayable arithmetic: bucket indexes
    * are floor arithmetic over the global [min, max] range, counts are
    * integers). State per day: ≤ 64 (bucket, cnt) rows.
    */
  def quantileGridDaily(s: SparkSession, d: String): DataFrame = {
    val ev = Sources.events(s, d)
    val bounds = ev.agg(min("value").as("lo"), max("value").as("hi"))
    ev.crossJoin(broadcast(bounds))
      .select(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"),
        least(floor((col("value") - col("lo")) / ((col("hi") - col("lo")) / lit(QW.toDouble))),
          lit(QW - 1)).cast("long").as("bucket"))
      .groupBy("day", "bucket")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("day", "bucket")
  }

  /** Quantile estimates from MERGED day-grain grids (p50/p90/p99): sum
    * the daily bucket counts — the merge is a plain integer aggregate,
    * which is the entire point of the grid form — then linearly
    * interpolate inside the first bucket whose running mass reaches
    * q·N. Reported next to the exact percentile, with the estimate's
    * absolute error bounded by one bucket width. Every step is integer
    * counts + one float expression both engines compute identically, so
    * this probabilistic-class structure carries a FULL oracle like the
    * CMS.
    */
  def quantileGridMerged(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Sources.events(s, d)
    val bounds = ev.agg(min("value").as("lo"), max("value").as("hi"))
    val merged = quantileGridDaily(s, d)
      .groupBy("bucket").agg(sum("cnt").as("cnt"))
    val n = merged.agg(sum("cnt").as("n"))
    // running mass BEFORE each bucket: the two-pass prefix is overkill
    // for ≤64 rows, and the shape guard forbids global windows — a
    // 64-row broadcast self-join computes the exclusive prefix exactly
    val before = merged.as("a")
      .join(broadcast(merged.as("b")), col("b.bucket") < col("a.bucket"), "left")
      .groupBy(col("a.bucket").as("bucket"), col("a.cnt").as("cnt"))
      .agg(coalesce(sum(col("b.cnt")), lit(0L)).as("cum_before"))
    val qdf = Qs.toDF("q")
    val width = (col("hi") - col("lo")) / lit(QW.toDouble)
    val target = col("q") * col("n").cast("double")
    val hit = before.crossJoin(broadcast(qdf))
      .crossJoin(broadcast(n)).crossJoin(broadcast(bounds))
      .filter(col("cum_before").cast("double") < target &&
        target <= (col("cum_before") + col("cnt")).cast("double"))
      .select(col("q"),
        roundNorm(col("lo") + width * (col("bucket").cast("double") +
          (target - col("cum_before").cast("double")) / col("cnt").cast("double")), 4)
          .as("est"))
    val exact = ev
      .agg(expr(s"percentile(value, array(${Qs.mkString(", ")}))").as("ex"))
      .select(posexplode(col("ex")).as(Seq("i", "exact")))
      .join(broadcast(Qs.zipWithIndex.toDF("q", "i")), "i")
      .select(col("q"), roundNorm(col("exact"), 4).as("exact"))
    hit.join(exact, "q")
      .withColumn("abs_err", roundNorm(abs(col("est") - col("exact")), 4))
      .select("q", "est", "exact", "abs_err")
      .orderBy("q")
  }

  /** Theta-sketch set intersection (`sketch_theta_intersect`, r13):
    * the sketch family's one genuinely NEW capability over HLL — HLL
    * unions losslessly but cannot intersect; the KMV/theta sketch
    * (Dasgupta et al.) estimates |A∩B| from the k smallest hash values
    * of each side. Here A/B = distinct customers ordering in 1995/1996
    * (year-over-year repeat-buyer overlap), h = the Knuth hash onto the
    * 2²⁰ lattice (deterministic, so the WHOLE sketch is hash-gated —
    * a seeded-PRNG sketch could only ever be rows-only), k = 64:
    * θ = min(θ_A, θ_B) with θ_side = the k-th smallest distinct hash
    * (2²⁰ when the side has < k values, i.e. exhaustive), and
    * est = |sketch_A ∩ sketch_B ∩ {h < θ}| · 2²⁰ div θ. The exact
    * intersection ships alongside as the accuracy witness — the
    * estimate/exact pair is the CBO-statistics shape
    * ([[joinSizeEst]]'s discipline). Plan: per-side distinct + one
    * rank-≤-k WindowGroupLimit (two |years| partitions), then
    * model-sized (≤ 2k rows) joins; the exact twin is one semi-join
    * count. At 10¹² rows the sketch side stays k-bounded per side —
    * the entire point of KMV.
    */
  def thetaIntersect(s: SparkSession, d: String): DataFrame = {
    val k = 64L
    val yrs = Sources.orders(s, d)
      .select(col("o_custkey"), year(col("o_orderdate")).as("yr"))
      .filter(col("yr").isin(1995, 1996))
    val hashes = yrs
      .select(col("yr"),
        pmod(col("o_custkey") * lit(2654435761L), lit(1048576L)).as("h"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("yr").orderBy(col("h").asc)
    val ranked = hashes.withColumn("rk", row_number().over(w))
    val sketch = graft.io.Checkpoints.pin(
      ranked.filter(col("rk") <= k), eager = false)
    val theta = sketch.groupBy("yr")
      .agg(max("h").as("kth"), count(lit(1)).as("nk"))
      .agg(min(when(col("nk") >= k, col("kth")).otherwise(lit(1048576L)))
        .as("theta"))
    val a = sketch.filter(col("yr") === 1995).select(col("h"))
    val b = sketch.filter(col("yr") === 1996).select(col("h"))
    val common = a.join(b, Seq("h")).crossJoin(broadcast(theta))
      .filter(col("h") < col("theta"))
      .agg(count(lit(1)).as("n_common_below"))
    val exact = yrs.filter(col("yr") === 1995).select("o_custkey").distinct()
      .join(yrs.filter(col("yr") === 1996).select("o_custkey").distinct(),
        Seq("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("exact_common"))
    theta.crossJoin(broadcast(common)).crossJoin(broadcast(exact))
      .select(lit(k).as("k"), col("theta"), col("n_common_below"),
        expr("(n_common_below * 1048576L) div theta").as("est_common"),
        col("exact_common"))
  }

  /** Bloom-filter false-positive audit (`sketch_bloom_fpr`, r13): build
    * a 4096-bit Bloom filter (k = 3 published Knuth-style hashes) over
    * the urgent-order customer set, probe it with every NON-member
    * customer, and report the measured false-positive rate next to the
    * fill-rate prediction (bits_set/m)^k — the filter-sizing feedback a
    * join-pruning planner needs (cf. [[graft.ops.Joins]] bloom-pruned
    * join: this query audits the primitive that join trusts). The
    * ENTIRE trajectory is exact integers: positions are
    * ((key·2654435761 + i·40503) mod 2³²) mod 4096, the filter is the
    * distinct-position table (m-bounded — at 100 TB the filter state
    * is 4096 rows regardless of corpus), membership = all of a probe's
    * DISTINCT positions present (self-collisions handled by comparing
    * distinct counts), and both rates are floor divisions — no doubles
    * anywhere, so the DuckDB replay is bit-exact. Plan: member/probe
    * position streams are map-side; the probe test is one m-bounded
    * broadcast semi-join + two keyed aggs; the final row assembles
    * 1-row aggregates (sanctioned attaches).
    */
  def bloomFpr(s: SparkSession, d: String): DataFrame = {
    val m = 4096L
    def posCol(key: Column, i: Int): Column =
      pmod(key * lit(2654435761L) + lit(i * 40503L), lit(4294967296L)) % m
    val members = Sources.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("key")).distinct()
    val bitset = members
      .select(explode(array(posCol(col("key"), 0), posCol(col("key"), 1),
        posCol(col("key"), 2))).as("pos")).distinct()
    val probes = Sources.customer(s, d)
      .select(col("c_custkey").as("key"))
      .join(members, Seq("key"), "left_anti")
    val probePos = probes
      .select(col("key"), explode(array(posCol(col("key"), 0),
        posCol(col("key"), 1), posCol(col("key"), 2))).as("pos"))
      .distinct()
    val perProbe = probePos
      .join(broadcast(bitset.withColumn("hit", lit(1L))), Seq("pos"), "left")
      .groupBy("key")
      .agg(count(lit(1)).as("n_pos"), sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
    val fp = perProbe.agg(
      count(lit(1)).as("n_probes"),
      sum(when(col("n_hit") === col("n_pos"), 1L).otherwise(0L)).as("n_false_pos"))
    val nm = members.agg(count(lit(1)).as("n_members"))
    val nb = bitset.agg(count(lit(1)).as("n_bits_set"))
    fp.crossJoin(broadcast(nm)).crossJoin(broadcast(nb))
      .select(col("n_members"), col("n_bits_set"), col("n_probes"),
        col("n_false_pos"),
        expr("(n_false_pos * 1000000L) div n_probes").as("fpr_e6"),
        expr(s"(n_bits_set * n_bits_set * n_bits_set * 1000000L) div ${m * m * m}L")
          .as("pred_e6"))
  }

  // ------------------------------------------------------ Count-Sketch

  /** Count-Sketch sign hash: ±1 from an independent affine family —
    * same 2^62-safe integer arithmetic as [[bucket]].
    */
  private val SAs = Seq(49979687L, 67867967L, 86028121L)
  private val SBs = Seq(2750159L, 4256233L, 5800079L)

  private def csBucket(u: Column, j: Int): Column =
    pmod(pmod(u, lit(P)) * lit(As(j)) + lit(Bs(j)), lit(P)) % lit(64L)

  private def csSign(u: Column, j: Int): Column =
    lit(1L) - lit(2L) * (pmod(pmod(u, lit(P)) * lit(SAs(j)) + lit(SBs(j)),
      lit(P)) % lit(2L))

  private def csCellArray(u: Column): Column =
    array((0 until 3).map(j =>
      struct(lit(j).cast("long").as("j"), csBucket(u, j).as("bucket"),
        csSign(u, j).as("sign"))): _*)

  /** Count-Sketch point estimates (`sketch_countsketch`, r13): the
    * SIGNED sibling of [[cmsUsers]] — each update adds ±1 per hash row
    * (Charikar-Chen-Farach-Colton), so colliding keys cancel in
    * expectation and the estimator is UNBIASED where CMS only
    * overestimates; the estimate is the MEDIAN over the 3 per-row
    * signed reads, exact on integers (sort 3 Longs, take the middle —
    * `array_sort` + element_at, no float ever). Same scale shape as
    * the CMS: the sketch is one map-side-combinable aggregate to 3×64
    * signed counter cells, probes are the exact top-10 heavy users
    * (already computed by the CMS query family) equi-joined against
    * sketch-sized state. Reported vs exact counts with the signed
    * error — negative errors PROVE the unbiased-not-overestimate
    * contrast with `sketch_cms_users` under the same hash gate; the
    * whole trajectory (buckets, signs, cells, medians) is integer
    * arithmetic DuckDB replays bit-for-bit.
    */
  def countSketch(s: SparkSession, d: String): DataFrame = {
    val cells = Sources.events(s, d)
      .select(explode(csCellArray(col("user_id"))).as("c"))
      .groupBy(col("c.j").as("j"), col("c.bucket").as("bucket"))
      .agg(sum(col("c.sign")).as("cell"))
    val exact = Sources.events(s, d).groupBy("user_id")
      .agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("user_id")).limit(10)
    val probes = exact.select(col("user_id"), col("exact_cnt"),
      explode(csCellArray(col("user_id"))).as("c"))
      .select(col("user_id"), col("exact_cnt"), col("c.j").as("j"),
        col("c.bucket").as("bucket"), col("c.sign").as("sign"))
    probes.join(cells, Seq("j", "bucket"))
      .groupBy("user_id", "exact_cnt")
      .agg(element_at(array_sort(collect_list(col("sign") * col("cell"))), 2)
        .as("cs_est"))
      .select(col("user_id"), col("exact_cnt"), col("cs_est"),
        (col("cs_est") - col("exact_cnt")).as("err"))
      .orderBy(col("exact_cnt").desc, col("user_id"))
  }

  /** Linear counting (`sketch_linear_counting`, r13): the
    * low-cardinality distinct estimator HLL is BIASED at — set bit
    * h(key) mod m in an m = 1024-bit table, estimate n̂ = m·ln(m/z)
    * from the empty-cell count z (Whang et al. 1990; the occupancy
    * argument is exact for uniform hashing, and LC beats HLL whenever
    * n ≲ m — exactly the per-partition / per-day regime where a
    * pipeline keeps thousands of SMALL sketches). The whole
    * trajectory is integer (positions, fill, z) except the single
    * mirrored ln at the finish; the exact distinct rides along so the
    * row is its own error audit. Plan: one distinct-position
    * aggregate (state ≤ m rows at any corpus size) + the exact-twin
    * count, map-side combinable throughout.
    */
  def linearCounting(s: SparkSession, d: String): DataFrame = {
    val keys = Sources.events(s, d).select(col("user_id"))
    val bits = keys.select(
      (pmod(col("user_id") * lit(2654435761L), lit(4294967296L)) % 1024L)
        .as("pos")).distinct()
      .agg(count(lit(1)).as("n_bits_set"))
    val exact = keys.agg(countDistinct("user_id").as("exact_distinct"))
    def D(c: Column): Column = c.cast("double")
    bits.crossJoin(broadcast(exact)) // 1-row × 1-row attach
      .withColumn("z", lit(1024L) - col("n_bits_set"))
      .select(lit(1024L).as("m"), col("n_bits_set"), col("z"),
        round(lit(1024.0) * log(lit(1024.0) / D(col("z"))), 0).cast("long")
          .as("lc_est"),
        col("exact_distinct"),
        (round(lit(1024.0) * log(lit(1024.0) / D(col("z"))), 0).cast("long")
          - col("exact_distinct")).as("err"))
  }

  /** Unrolled 12-char polynomial word hash (base 31, mod 1e9+7) — one
    * generated expression shared verbatim by engine and oracle (the
    * mod97Sql discipline); substr past the word end yields '' and
    * ascii('') = 0 in BOTH engines, so short words hash as if
    * zero-padded.
    */
  private def charHashSql(c: String): String =
    (1 to 12).foldLeft("CAST(0 AS BIGINT)") { (acc, i) =>
      s"(($acc * 31 + ascii(substr($c, $i, 1))) % 1000000007)"
    }

  /** AMS second-moment sketch (`sketch_ams_f2`, r13): the
    * Alon-Matias-Szegedy F₂ estimator — Z_h = Σ_w f_w·s_h(w) with
    * 4-wise-ish sign hashes s_h ∈ {±1}; E[Z²] = F₂ = Σ f_w², the
    * self-join size that drives CMS join-size estimation
    * ([[cmsJoinSize]]) and repetitiveness audits. The release is the
    * full 16-estimator table (Z_h, Z_h², and the e6 ratio to the
    * exact F₂ computed alongside — at 100 TB the exact column is the
    * audit you can afford once, the sketch is what you maintain), so
    * the hash gate pins every sign, not just the mean; the spec
    * asserts the mean-of-16 is within the AMS variance envelope.
    * All integer: word keys from the shared 12-char polynomial hash,
    * signs from a Knuth multiplicative bit (the word key is reduced
    * mod 2²⁰ BEFORE the (2h+3)·2654435761 mix so the product stays
    * ≤ ~1e17, inside Long). Plan: one (word) shuffle to the vocab
    * table, a ×16 explode of the VOCAB (bounded side), one 16-group
    * sum, a 1-row exact-F₂ attach.
    */
  def amsF2(s: SparkSession, d: String): DataFrame = {
    val types = Sources.documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
    val f2 = types.agg(sum(col("f") * col("f")).as("f2"))
    types.withColumn("wh", expr(charHashSql("w")))
      .withColumn("h", explode(expr("sequence(0L, 15L)")))
      .withColumn("sign", when(
        pmod(col("wh") % 1048576L * (col("h") * 2L + 3L) * 2654435761L,
          lit(4294967296L)) < 2147483648L, 1L).otherwise(-1L))
      .groupBy("h").agg(sum(col("f") * col("sign")).as("z"))
      .crossJoin(broadcast(f2))
      .select(col("h"), col("z"), (col("z") * col("z")).as("z2"),
        col("f2"), expr("(z * z * 1000000L) div f2").as("ratio_e6"))
      .orderBy("h")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_ams_f2" -> (amsF2 _),
    "sketch_linear_counting" -> (linearCounting _),
    "sketch_countsketch" -> (countSketch _),
    "sketch_bloom_fpr" -> (bloomFpr _),
    "sketch_theta_intersect" -> (thetaIntersect _),
    "sketch_cms_users" -> (cmsUsers _),
    "sketch_join_size" -> (joinSizeEst _),
    "sketch_hll_daily" -> (hllDailyUsers _),
    "sketch_hll_rollup" -> (hllRollup _),
    "sketch_qgrid_daily" -> (quantileGridDaily _),
    "sketch_qgrid_quantiles" -> (quantileGridMerged _),
  )

  val oracles: Map[String, String] = Map(
    // the SAME generated char hash, same mod-2^20 reduction and Knuth
    // sign bit, same 16-estimator census with the exact-F2 attach
    "sketch_ams_f2" ->
      (s"""WITH types AS (SELECT w, CAST(count(*) AS BIGINT) AS f
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY w),
        | f2t AS (SELECT CAST(sum(f * f) AS BIGINT) AS f2 FROM types),
        | keyed AS (SELECT w, f, ${charHashSql("w")} AS wh FROM types),
        | est AS (SELECT h, CAST(sum(f * sgn) AS BIGINT) AS z FROM (
        |   SELECT k.f, hh.h,
        |     CASE WHEN (k.wh % 1048576 * (hh.h * 2 + 3) * 2654435761)
        |       % 4294967296 < 2147483648 THEN 1 ELSE -1 END AS sgn
        |    FROM keyed k CROSS JOIN
        |     (SELECT unnest(generate_series(0, 15)) AS h) hh)
        |  GROUP BY h)
        |SELECT CAST(h AS BIGINT) AS h, z, z * z AS z2, f2,
        | (z * z * 1000000) // f2 AS ratio_e6
        |FROM est CROSS JOIN f2t ORDER BY h""".stripMargin),
    // integer bit census, one mirrored ln finish
    "sketch_linear_counting" ->
      """WITH pos AS (SELECT DISTINCT
        |   (user_id * 2654435761) % 4294967296 % 1024 AS pos FROM events),
        | b AS (SELECT CAST(count(*) AS BIGINT) AS n_bits_set FROM pos),
        | ex AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT)
        |    AS exact_distinct FROM events)
        |SELECT CAST(1024 AS BIGINT) AS m, n_bits_set,
        | 1024 - n_bits_set AS z,
        | CAST(round(1024.0 * ln(1024.0 / (1024 - n_bits_set)::DOUBLE))
        |   AS BIGINT) AS lc_est,
        | exact_distinct,
        | CAST(round(1024.0 * ln(1024.0 / (1024 - n_bits_set)::DOUBLE))
        |   AS BIGINT) - exact_distinct AS err
        |FROM b, ex""".stripMargin,
    // signed cells and the 3-read median are pure integers; the
    // quantile_disc middle element equals the engine's sorted-array
    // element 2 of 3 exactly
    "sketch_countsketch" ->
      """WITH hp AS (SELECT * FROM (VALUES
        |   (0, 1103515245, 12345, 49979687, 2750159),
        |   (1, 1299709, 7919, 67867967, 4256233),
        |   (2, 15485863, 104729, 86028121, 5800079)) t(j, a, b, sa, sb)),
        | cells AS (SELECT h.j,
        |    ((user_id % 2147483647) * a + b) % 2147483647 % 64 AS bucket,
        |    1 - 2 * (((user_id % 2147483647) * sa + sb) % 2147483647 % 2)
        |      AS sign
        |  FROM events, hp h),
        | sketch AS (SELECT j, bucket, CAST(sum(sign) AS BIGINT) AS cell
        |  FROM cells GROUP BY 1, 2),
        | top10 AS (SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt
        |  FROM events GROUP BY 1
        |  ORDER BY exact_cnt DESC, user_id LIMIT 10),
        | probes AS (SELECT t.user_id, t.exact_cnt, h.j,
        |    ((t.user_id % 2147483647) * a + b) % 2147483647 % 64 AS bucket,
        |    1 - 2 * (((t.user_id % 2147483647) * sa + sb) % 2147483647 % 2)
        |      AS sign
        |  FROM top10 t, hp h)
        |SELECT p.user_id, p.exact_cnt,
        | CAST(quantile_disc(p.sign * s.cell, 0.5) AS BIGINT) AS cs_est,
        | CAST(quantile_disc(p.sign * s.cell, 0.5) AS BIGINT) - p.exact_cnt
        |   AS err
        |FROM probes p JOIN sketch s ON p.j = s.j AND p.bucket = s.bucket
        |GROUP BY p.user_id, p.exact_cnt
        |ORDER BY exact_cnt DESC, user_id""".stripMargin,
    // the whole Bloom trajectory — positions, fill, probe verdicts,
    // both rates — is exact integer arithmetic in both engines
    "sketch_bloom_fpr" ->
      """WITH mem AS (SELECT DISTINCT o_custkey AS key FROM orders
        |   WHERE o_orderpriority = '1-URGENT'),
        | mpos AS (SELECT DISTINCT
        |    ((key * 2654435761 + i * 40503) % 4294967296) % 4096 AS pos
        |   FROM mem, unnest([0, 1, 2]) AS t(i)),
        | pr AS (SELECT c_custkey AS key FROM customer
        |   WHERE c_custkey NOT IN (SELECT key FROM mem)),
        | ppos AS (SELECT DISTINCT key,
        |    ((key * 2654435761 + i * 40503) % 4294967296) % 4096 AS pos
        |   FROM pr, unnest([0, 1, 2]) AS t(i)),
        | per AS (SELECT p.key, CAST(count(*) AS BIGINT) AS n_pos,
        |    CAST(sum(CASE WHEN m.pos IS NULL THEN 0 ELSE 1 END) AS BIGINT)
        |      AS n_hit
        |   FROM ppos p LEFT JOIN mpos m ON p.pos = m.pos GROUP BY 1),
        | fp AS (SELECT CAST(count(*) AS BIGINT) AS n_probes,
        |    CAST(sum(CASE WHEN n_hit = n_pos THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_false_pos FROM per),
        | nm AS (SELECT CAST(count(*) AS BIGINT) AS n_members FROM mem),
        | nb AS (SELECT CAST(count(*) AS BIGINT) AS n_bits_set FROM mpos)
        |SELECT n_members, n_bits_set, n_probes, n_false_pos,
        | (n_false_pos * 1000000) // n_probes AS fpr_e6,
        | (n_bits_set * n_bits_set * n_bits_set * 1000000) // 68719476736
        |   AS pred_e6
        |FROM fp CROSS JOIN nm CROSS JOIN nb""".stripMargin,
    // the KMV trajectory (ranks, theta, the below-theta census) is
    // replayed exactly; the exact twin certifies the estimate's error
    "sketch_theta_intersect" ->
      """WITH yrs AS (SELECT o_custkey,
        |   CAST(year(o_orderdate) AS BIGINT) AS yr FROM orders
        |  WHERE year(o_orderdate) IN (1995, 1996)),
        | h AS (SELECT DISTINCT yr,
        |   (o_custkey * 2654435761) % 1048576 AS h FROM yrs),
        | r AS (SELECT yr, h, row_number() OVER (PARTITION BY yr
        |   ORDER BY h ASC) AS rk FROM h),
        | sk AS (SELECT yr, h FROM r WHERE rk <= 64),
        | th AS (SELECT CAST(min(CASE WHEN nk >= 64 THEN kth
        |     ELSE 1048576 END) AS BIGINT) AS theta
        |  FROM (SELECT yr, max(h) AS kth, count(*) AS nk FROM sk GROUP BY 1)),
        | com AS (SELECT CAST(count(*) AS BIGINT) AS n_common_below
        |  FROM (SELECT h FROM sk WHERE yr = 1995) a
        |  JOIN (SELECT h FROM sk WHERE yr = 1996) b USING (h)
        |  CROSS JOIN th WHERE a.h < th.theta),
        | ex AS (SELECT CAST(count(*) AS BIGINT) AS exact_common
        |  FROM (SELECT DISTINCT o_custkey FROM yrs WHERE yr = 1995) a
        |  JOIN (SELECT DISTINCT o_custkey FROM yrs WHERE yr = 1996) b
        |   USING (o_custkey))
        |SELECT CAST(64 AS BIGINT) AS k, theta, n_common_below,
        | CAST((n_common_below * 1048576) // theta AS BIGINT) AS est_common,
        | exact_common
        |FROM th CROSS JOIN com CROSS JOIN ex""".stripMargin,
    "sketch_qgrid_daily" ->
      """WITH b AS (SELECT min(value) AS lo, max(value) AS hi FROM events)
        |SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
        | CAST(least(floor((value - lo) / ((hi - lo) / 64.0)), 63) AS BIGINT) AS bucket,
        | count(*) AS cnt
        |FROM events CROSS JOIN b
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "sketch_qgrid_quantiles" ->
      """WITH b AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
        | daily AS (SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
        |   CAST(least(floor((value - lo) / ((hi - lo) / 64.0)), 63) AS BIGINT) AS bucket,
        |   count(*) AS cnt
        |  FROM events CROSS JOIN b GROUP BY 1, 2),
        | merged AS (SELECT bucket, CAST(sum(cnt) AS BIGINT) AS cnt
        |   FROM daily GROUP BY 1),
        | nn AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM merged),
        | bef AS (SELECT a.bucket, a.cnt,
        |   CAST(COALESCE(sum(b2.cnt), 0) AS BIGINT) AS cum_before
        |  FROM merged a LEFT JOIN merged b2 ON b2.bucket < a.bucket
        |  GROUP BY a.bucket, a.cnt),
        | qs AS (SELECT CAST(q AS DOUBLE) AS q
        |   FROM (VALUES (0.5), (0.9), (0.99)) t(q)),
        | hit AS (SELECT q,
        |   round(lo + ((hi - lo) / 64.0) * (CAST(bucket AS DOUBLE) +
        |     (q * CAST(n AS DOUBLE) - CAST(cum_before AS DOUBLE))
        |       / CAST(cnt AS DOUBLE)), 4) + 0.0 AS est
        |  FROM bef CROSS JOIN qs CROSS JOIN nn CROSS JOIN b
        |  WHERE CAST(cum_before AS DOUBLE) < q * CAST(n AS DOUBLE)
        |    AND q * CAST(n AS DOUBLE) <= CAST(cum_before + cnt AS DOUBLE)),
        | ex AS (
        |  SELECT CAST(0.5 AS DOUBLE) AS q,
        |    round(quantile_cont(value, 0.5), 4) + 0.0 AS exact FROM events
        |  UNION ALL SELECT CAST(0.9 AS DOUBLE),
        |    round(quantile_cont(value, 0.9), 4) + 0.0 FROM events
        |  UNION ALL SELECT CAST(0.99 AS DOUBLE),
        |    round(quantile_cont(value, 0.99), 4) + 0.0 FROM events)
        |SELECT hit.q, est, exact, round(abs(est - exact), 4) + 0.0 AS abs_err
        |FROM hit JOIN ex ON hit.q = ex.q
        |ORDER BY hit.q""".stripMargin,
    "sketch_join_size" ->
      """WITH hp(j, a, b) AS (VALUES (0, 1103515245, 12345), (1, 1299709, 7919),
        |   (2, 15485863, 104729), (3, 32452843, 1299721)),
        | ca AS (SELECT hp.j,
        |   ((user_id % 2147483647) * a + b) % 2147483647 % 512 AS bucket,
        |   count(*) AS ca FROM events, hp GROUP BY 1, 2),
        | cb AS (SELECT hp.j,
        |   ((o_custkey % 2147483647) * a + b) % 2147483647 % 512 AS bucket,
        |   count(*) AS cb FROM orders, hp GROUP BY 1, 2),
        | est AS (SELECT CAST(min(est_j) AS BIGINT) AS cms_est FROM (
        |   SELECT ca.j, sum(ca.ca * cb.cb) AS est_j
        |   FROM ca JOIN cb ON ca.j = cb.j AND ca.bucket = cb.bucket
        |   GROUP BY ca.j)),
        | ex AS (SELECT CAST(coalesce(sum(na * nb), 0) AS BIGINT) AS exact_size
        |   FROM (SELECT user_id, count(*) AS na FROM events GROUP BY 1) a
        |   JOIN (SELECT o_custkey AS user_id, count(*) AS nb FROM orders
        |     GROUP BY 1) b USING (user_id))
        |SELECT cms_est, exact_size, cms_est - exact_size AS overest
        |FROM est CROSS JOIN ex""".stripMargin,
    "sketch_cms_users" ->
      """WITH cells AS (
        |  SELECT j.j,
        |    ((user_id % 2147483647) * a + b) % 2147483647 % 512 AS bucket
        |  FROM events, (VALUES (0, 1103515245, 12345), (1, 1299709, 7919),
        |    (2, 15485863, 104729), (3, 32452843, 1299721)) j(j, a, b)),
        | sketch AS (
        |  SELECT j, bucket, count(*) AS cnt FROM cells GROUP BY 1, 2),
        | top10 AS (
        |  SELECT user_id, count(*) AS exact_cnt FROM events GROUP BY 1
        |  ORDER BY exact_cnt DESC, user_id LIMIT 10),
        | probes AS (
        |  SELECT t.user_id, t.exact_cnt, j.j,
        |    ((t.user_id % 2147483647) * a + b) % 2147483647 % 512 AS bucket
        |  FROM top10 t, (VALUES (0, 1103515245, 12345), (1, 1299709, 7919),
        |    (2, 15485863, 104729), (3, 32452843, 1299721)) j(j, a, b))
        |SELECT p.user_id, p.exact_cnt, min(s.cnt) AS cms_est,
        |  min(s.cnt) - p.exact_cnt AS overest
        |FROM probes p JOIN sketch s ON p.j = s.j AND p.bucket = s.bucket
        |GROUP BY p.user_id, p.exact_cnt
        |ORDER BY exact_cnt DESC, user_id""".stripMargin,
  )
}
