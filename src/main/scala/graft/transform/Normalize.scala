package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** RAW-layer row normalization (reference `utils.py:300-307`).
  *
  * The reference's transform step does exactly two things to every batch:
  *  1. for each known date column present, parse-or-NULL then re-serialize
  *     to a `"yyyy-MM-dd HH:mm:ss"` STRING (`pd.to_datetime(errors="coerce")
  *     .dt.strftime(...)`, `utils.py:301-305`) — unparseable values become
  *     NULL;
  *  2. force all column names lowercase (`utils.py:307`).
  *
  * The engine reproduces both, and additionally keeps a *typed*
  * `TimestampType` twin column (`<col>_ts`) plus a `DateType` partition
  * twin (`<col>_date`): at 100 TB the typed twins are what make partition
  * pruning and min/max row-group skipping possible, while the string column
  * preserves the reference's observable output bit-for-bit.
  */
object Normalize {

  /** The reference's date-column allowlist (`DATE_COLUMNS`,
    * `config.py:134-145`), lowercased, plus the fixture date fields so the
    * same normalizer drives both reference-shaped and fixture inputs.
    */
  val dateColumns: Seq[String] = Seq(
    "dtalteracao", "dtnascimento", "dtcadastro", "dtemissao", "dtmovimento",
    "dtrecebimento", "dtpagamento", "dtvencimento", "dtiniciotabela",
    "dtfimtabela",
    // fixture date fields (FIXTURES.md): they play dtmovimento's role
    "l_shipdate", "o_orderdate", "ts",
  )

  val canonicalFormat = "yyyy-MM-dd HH:mm:ss"

  /** Lowercase every column name (reference `utils.py:307`). */
  def lowercaseColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.toLowerCase): _*)

  /** Parse-or-NULL a string/timestamp column to TimestampType. Spark 4
    * runs in ANSI mode where `to_timestamp` THROWS on malformed input;
    * `try_to_timestamp` restores pandas' `errors="coerce"` semantics
    * (unparseable -> NULL) that the reference relies on (`utils.py:301`).
    */
  private def coerceTs(c: org.apache.spark.sql.Column) = try_to_timestamp(c)

  /** Full RAW normalization: lowercase names, then for every known date
    * column normalize to canonical string and (if `typedTwins`) add
    * `<col>_ts` / `<col>_date` typed twins.
    *
    * All expressions are built-in Catalyst functions — the whole transform
    * stays inside whole-stage codegen; no UDFs.
    */
  def normalize(input: DataFrame, typedTwins: Boolean = true): DataFrame = {
    val df = lowercaseColumns(input)
    val present = df.schema.fields.filter(f => dateColumns.contains(f.name))
    present.foldLeft(df) { (acc, f) =>
      val ts = f.dataType match {
        case TimestampType => col(f.name)
        case _ => coerceTs(col(f.name))
      }
      val withStr = acc.withColumn(f.name, date_format(ts, canonicalFormat))
      if (typedTwins)
        withStr
          .withColumn(f.name + "_ts", ts)
          .withColumn(f.name + "_date", to_date(ts))
      else withStr
    }
  }

  /** The day-granularity predicate used by delete-range idempotency:
    * the reference compares `DATE(LOWER(field)) BETWEEN DATE(lo) AND
    * DATE(hi)` on the string-typed column (`utils.py:266-269`); `LOWER` is
    * a no-op on digits, `DATE()` truncates the time component. Spark form:
    * `to_date(col) between lo and hi` — Catalyst folds the literals and
    * pushes the comparison down to Parquet row groups.
    */
  def dayRangePredicate(field: String, lo: String, hi: String) =
    to_date(col(field)).between(lit(lo), lit(hi))
}
