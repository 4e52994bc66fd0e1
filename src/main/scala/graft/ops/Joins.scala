package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Generic join operators beyond the built-in kinds (SURVEY §2.4). */
object Joins {

  /** As-of join: for every left row, attach the latest right row with
    * `right.tsCol <= left.tsCol` within the same `key`.
    *
    * Implementation is the union+window pass, NOT a pairwise range join:
    * both sides are tagged and unioned, a single window partitioned by
    * `key` ordered by (ts, side) carries the last-seen right payload
    * forward (`last(_, ignoreNulls = true)`), then left rows are kept.
    * Cost: ONE shuffle on `key` and a sort — linear, vs the quadratic
    * per-key blow-up of `left JOIN right ON r.ts <= l.ts` + max.
    *
    * Right rows sort BEFORE left rows at equal timestamps (side 0 < 1),
    * matching the inclusive `<=` of e.g. DuckDB's ASOF JOIN.
    *
    * Right payload columns come back prefixed `asof_` (null when no right
    * row precedes the left row — as-of LEFT join semantics).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadType = StructType(payloadCols.map(c => right.schema(c)))
    val leftType = StructType(leftCols.map(c => left.schema(c)))

    val l = left.select(
      col(key), col(tsCol), lit(1).as("__side"),
      lit(null).cast(payloadType).as("__payload"),
      struct(leftCols.map(col): _*).as("__left"))
    val r = right.select(
      col(key), col(tsCol), lit(0).as("__side"),
      struct(payloadCols.map(col): _*).as("__payload"),
      lit(null).cast(leftType).as("__left"))

    val w = Window.partitionBy(key).orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val leftBack = leftCols.map(c => col(s"__left.$c").as(c))
    val payloadBack = payloadCols.map(c => col(s"__asof.$c").as(s"asof_$c"))
    carried.select(leftBack ++ payloadBack: _*)
  }

  /** Nearest join: for every left row, the single right row with the
    * same `key` whose timestamp is CLOSEST (either direction) within
    * `tolMicros` — the sensor-fusion / feature-store alignment join that
    * backward-only as-of cannot express. Ties (equal distance before and
    * after) resolve to the earlier right row; right rows sharing the same
    * (key, timestamp) resolve to the minimum payload tuple.
    *
    * Same linear shape as [[asofJoin]]: both sides union once, then TWO
    * window passes over ONE key shuffle — an ascending scan carrying the
    * latest preceding right row and a descending scan carrying the
    * earliest following one — and a per-row pick of the nearer candidate.
    * Never a `|l.ts - r.ts| <= tol` range join (which degenerates to a
    * per-key cross product).
    *
    * Right payload comes back prefixed `near_`, plus `near_delta_us`
    * (non-negative; null when nothing lies within tolerance).
    */
  def nearestJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String,
      payloadCols: Seq[String], tolMicros: Long): DataFrame = {
    val leftCols = left.columns.toSeq
    val withUs = (df: DataFrame) =>
      df.withColumn("__us", expr(s"unix_micros(cast($tsCol as timestamp))"))
    val lu = withUs(left)
    val ru = withUs(right)
    val payloadType = StructType(
      payloadCols.map(c => right.schema(c)) :+ lu.schema("__us"))
    val leftType = StructType(leftCols.map(c => left.schema(c)))

    val l = lu.select(col(key), col("__us"), lit(1).as("__side"),
      lit(null).cast(payloadType).as("__payload"),
      struct(leftCols.map(col): _*).as("__left"))
    val r = ru.select(col(key), col("__us"), lit(0).as("__side"),
      struct(payloadCols.map(col) :+ col("__us"): _*).as("__payload"),
      lit(null).cast(leftType).as("__left"))

    // the trailing `__payload DESC` makes the scan order TOTAL: several
    // right rows can share (key, ts), and without it last(..., ignoreNulls)
    // would pick whichever the shuffle happened to order last. Struct
    // ordering is lexicographic over payloadCols, and min-payload-last
    // under DESC means both scans resolve such ties to the MINIMUM payload
    // tuple (e.g. the smallest click_id) — the same rule a deterministic
    // oracle writes.
    val wB = Window.partitionBy(key)
      .orderBy(col("__us").asc, col("__side").asc, col("__payload").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(key)
      .orderBy(col("__us").desc, col("__side").desc, col("__payload").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val picked = l.unionByName(r)
      .withColumn("__b", last(col("__payload"), ignoreNulls = true).over(wB))
      .withColumn("__f", last(col("__payload"), ignoreNulls = true).over(wF))
      .filter(col("__side") === 1)
      .withColumn("__db", col("__us") - col("__b.__us"))
      .withColumn("__df", col("__f.__us") - col("__us"))
      // prefer the nearer side; exact ties go backward (earlier right row)
      .withColumn("__n", when(
          col("__b").isNotNull && col("__db") <= lit(tolMicros) &&
            (col("__f").isNull || col("__df") > lit(tolMicros) || col("__db") <= col("__df")),
          col("__b"))
        .when(col("__f").isNotNull && col("__df") <= lit(tolMicros), col("__f")))
    val leftBack = leftCols.map(c => col(s"__left.$c").as(c))
    val payloadBack = payloadCols.map(c => col(s"__n.$c").as(s"near_$c"))
    picked.select(leftBack ++ payloadBack :+
      abs(col("__n.__us") - col("__us")).as("near_delta_us"): _*)
  }

  /** Skew-salted equi join (SURVEY §4 "salting for skew"): when one join
    * key carries a disproportionate share of the left side, a plain
    * shuffle join sends that key's rows to ONE reducer. Salting splits
    * each left key into `saltFactor` sub-keys (content-hashed, so the
    * assignment is deterministic) and replicates each right row
    * `saltFactor` times; the join runs on (key, salt) with `saltFactor`×
    * the parallelism on the hot key.
    *
    * AQE's skew-join handling covers many cases at runtime; explicit
    * salting remains the tool when a single key exceeds what one task can
    * hold, or when the skew is known up front. Cost: right side is
    * replicated `saltFactor`× — use for fact-skew joins against small-ish
    * right sides.
    */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    // right/full outer would emit saltFactor null-padded copies of every
    // unmatched right row (it was replicated per salt) — reject up front
    val allowed = Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti", "cross")
    require(allowed.contains(joinType.toLowerCase),
      s"saltedEquiJoin supports $allowed join types; right/full outer would " +
        "duplicate unmatched right rows (one per salt replica)")
    val leftSalted = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(saltFactor.toLong)).cast("int"))
    // replicate via a map-side explode (a Generate node), not a
    // crossJoin(broadcast(salts)) — same rows, but no
    // BroadcastNestedLoopJoin in the caller's plan
    val rightReplicated = right.withColumn("__salt",
      explode(lit((0 until saltFactor).toArray)))
    leftSalted.join(rightReplicated,
        leftSalted(key) === rightReplicated(key) && leftSalted("__salt") === rightReplicated("__salt"),
        joinType)
      .drop(rightReplicated(key))
      .drop("__salt")
  }

  /** Per-group top-k: the k best rows per key by `orderCol` descending
    * (deterministic via `tieBreak`). Plans a WindowGroupLimit — partial
    * top-k before the shuffle.
    */
  def topKPerKey(df: DataFrame, keys: Seq[String], orderCol: String,
      tieBreak: String, k: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol).desc, col(tieBreak))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  // ---------------------------------------------------------- Bloom filter

  /** Build an m-bit Bloom filter (k hash probes per key, xxhash64 family
    * seeded by probe index) over the distinct values of `key` in `keys`
    * — the explicit form of the runtime-filter join pruning Spark's
    * optimizer injects under `spark.sql.optimizer.runtime.bloomFilter`.
    *
    * Scale shape: the build is `explode(k positions) → DISTINCT →
    * collect`, and distinct bit positions are bounded by m (a CONFIG
    * constant), never by the key count — so the driver collect stays
    * model-sized however large the build side. The filter itself is
    * (m/64) longs, broadcast to probers as a literal array.
    */
  def bloomBuild(keys: DataFrame, key: Column, m: Int, k: Int): Array[Long] = {
    require(m % 64 == 0, "m must be a multiple of 64")
    val posCols = (0 until k).map(i => pmod(xxhash64(key, lit(i)), lit(m.toLong)))
    val words = new Array[Long](m / 64)
    keys.select(explode(array(posCols: _*)).as("p")).distinct()
      .collect().foreach { r =>
        val p = r.getLong(0)
        words((p >>> 6).toInt) |= 1L << (p & 63L).toInt
      }
    words
  }

  /** Membership probe against a [[bloomBuild]] filter: true if all k bit
    * positions for `key` are set — no false negatives, false positives
    * bounded by (1 − e^(−kn/m))^k. Pure builtin column arithmetic
    * (xxhash64 / shift / mask over a literal long array), so the probe is
    * a map-side codegen'd predicate: it prunes the fact scan BEFORE the
    * join shuffle, which is the entire point of a runtime filter.
    */
  def bloomContains(key: Column, words: Array[Long], m: Int, k: Int): Column =
    (0 until k).map { i =>
      val p = pmod(xxhash64(key, lit(i)), lit(m.toLong))
      val word = element_at(
        array(words.map(w => lit(w)): _*),
        (call_function("shiftright", p, lit(6)) + lit(1L)).cast("int"))
      call_function("shiftrightunsigned", word, pmod(p, lit(64L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
}
