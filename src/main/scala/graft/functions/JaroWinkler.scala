package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical Jaro-Winkler string similarity (Winkler prefix scale 0.1,
  * max prefix 4, boost threshold 0.7 — the parameterization every major
  * engine ships, so the DuckDB oracle's `jaro_winkler_similarity`
  * replays it value-for-value).
  *
  * Spark has `levenshtein` but no Jaro family, and entity-resolution
  * blocking at 100 TB wants a cheap per-pair score inside whole-stage
  * codegen: a blocked self-join emits O(block²) candidate pairs per
  * block, and the score is evaluated once per pair in the join's
  * generated loop — a scalar UDF there would pay ser/de per candidate.
  * [[JaroWinklerSim]] is a native `BinaryExpression` whose `doGenCode`
  * emits a static call into [[JaroWinkler.similarity]] (the
  * `levenshtein` discipline: the loop lives in one JIT-friendly static
  * method, the call site stays inside the codegen'd stage).
  *
  * Algorithm: match window `max(|a|,|b|)/2 - 1`; transpositions =
  * half the count of order-mismatched matched characters (integer
  * halving — the count is even); `jaro = (m/|a| + m/|b| + (m-t)/m)/3`;
  * Winkler boost `jaro + 0.1·p·(1-jaro)` (p = common prefix ≤ 4)
  * applied only when `jaro > 0.7`. Char-level (UTF-16 units) — the
  * fixtures are ASCII, where code-unit and code-point metrics agree.
  */
object JaroWinkler {

  /** Static hot-path entry — called from generated code.
    *
    * Dispatch (r12 advice item): ASCII strings ≤ 64 bytes — every name
    * field this family blocks on — run a zero-allocation specialization
    * that reads the UTF8String bytes in place and tracks the two match
    * sets as Long bitmasks, so the codegen'd join loop pays no String
    * decode and no heap allocation per candidate pair. Anything longer
    * or non-ASCII (where byte ≠ char) falls back to the general
    * char-level path; both compute the identical canonical score (the
    * spec cross-checks them on shared inputs).
    */
  def similarity(a: UTF8String, b: UTF8String): Double =
    if (a.numBytes <= 64 && b.numBytes <= 64 && a.isFullAscii && b.isFullAscii)
      similarityAscii(a, b)
    else
      similarityChars(a.toString, b.toString)

  /** ASCII ≤ 64-byte specialization: bytes read in place, match flags
    * in two Long bitmasks — no per-pair allocation at all.
    */
  private def similarityAscii(a: UTF8String, b: UTF8String): Double = {
    val l1 = a.numBytes
    val l2 = b.numBytes
    if (l1 == 0 && l2 == 0) return 1.0
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    var m1 = 0L
    var m2 = 0L
    var matches = 0
    var i = 0
    while (i < l1) {
      val c = a.getByte(i)
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (((m2 >>> j) & 1L) == 0L && b.getByte(j) == c) {
          m1 |= 1L << i; m2 |= 1L << j; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var trans = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (((m1 >>> i) & 1L) != 0L) {
        while (((m2 >>> k) & 1L) == 0L) k += 1
        if (a.getByte(i) != b.getByte(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val t = trans / 2
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var p = 0
    val maxP = math.min(4, math.min(l1, l2))
    while (p < maxP && a.getByte(p) == b.getByte(p)) p += 1
    jaro + 0.1 * p * (1.0 - jaro)
  }

  /** General char-level path (UTF-16 units) for long or non-ASCII
    * input.
    */
  private def similarityChars(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 && l2 == 0) return 1.0
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val c = s1.charAt(i)
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s2.charAt(j) == c) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var trans = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val t = trans / 2
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var p = 0
    val maxP = math.min(4, math.min(l1, l2))
    while (p < maxP && s1.charAt(p) == s2.charAt(p)) p += 1
    jaro + 0.1 * p * (1.0 - jaro)
  }
}

/** `jaro_winkler(str, str): double` — registered by [[GraftExtensions]]. */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.similarity($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaro_winkler"
}
