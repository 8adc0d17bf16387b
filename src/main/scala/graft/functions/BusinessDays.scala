package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Business-day (Mon–Fri) arithmetic in closed form — the lead-time
  * metric ops dashboards want instead of raw calendar days. No UDF, no
  * calendar table, no generate_series-per-row: one integer expression
  * per date, so it rides whole-stage codegen and mirrors into oracle
  * SQL (`//`, `%`, `least` in DuckDB — exact on both engines).
  *
  * Derivation: shift epoch-days by +3 so multiples of 7 land on
  * Mondays (1970-01-01 is a Thursday); each full week contributes 5
  * weekdays and a remainder of r days starting Monday contributes
  * min(r, 5). The constant −3 tail of the weekday count cancels in any
  * difference, so the index drops it. Valid for dates ≥ 1970-01-01:
  * the quotient is computed as floor(x/7.0), which equals integer
  * division only for non-negative x (and is float-exact for any
  * epoch-day magnitude — x < 2⁵² keeps /7.0 within one ulp, never
  * crossing an integer boundary).
  */
object BusinessDays {

  /** Monotone weekday index of a non-negative epoch-day column:
    * differences of this index over two dates are exact business-day
    * spans. */
  def weekdayIndex(day: Column): Column =
    lit(5L) * floor((day + 3).cast("double") / 7).cast("long") +
      least((day + 3).cast("long") % 7, lit(5L))

  /** Epoch-day of a date column (days since 1970-01-01). */
  def epochDay(d: Column): Column = datediff(d, to_date(lit("1970-01-01")))

  /** Weekdays (Mon–Fri) in the half-open date range [a, b): exact
    * BIGINT, negative when b < a (anti-symmetric, so lead-time sums
    * stay consistent under reversed pairs). */
  def busdaysBetween(a: Column, b: Column): Column =
    weekdayIndex(epochDay(b)) - weekdayIndex(epochDay(a))
}
