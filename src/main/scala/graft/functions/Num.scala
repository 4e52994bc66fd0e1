package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, round}

/** Numeric determinism helpers shared by every oracle-checked query.
  *
  * The driver's correctness gate hashes result values BITWISE, so a value
  * that is numerically equal but bit-different across engines fails the
  * hash. The one such class doubles admit is IEEE signed zero: an
  * infinitesimally negative quantity rounds to `-0.0` in one engine and
  * `+0.0` in the other whenever the two engines associate the float ops
  * differently (observed: `pmi` of a ratio ≈ 1, log2 taken of products
  * grouped differently in Spark vs DuckDB). `x + 0.0` is the standard
  * IEEE identity that collapses `-0.0` to `+0.0` and leaves every other
  * double (including NaN and ±Inf) bit-identical — applied on BOTH the
  * Spark side (here) and the oracle SQL (`round(...) + 0.0`).
  */
object Num {

  /** `round(c, scale)` with the signed zero normalized to `+0.0`.
    * Use for every rounded output whose pre-round value can be negative
    * or can reach zero from below (log scores, deltas, correlations,
    * cosines, PMI, regression slopes); plain `round` is fine only for
    * provably non-negative quantities (counts, fractions of counts,
    * norms, squared errors).
    */
  def roundNorm(c: Column, scale: Int): Column = round(c, scale) + lit(0.0)
}
