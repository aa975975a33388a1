package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable decimal rounding.
  *
  * Spark's `round(x, n)` on DOUBLE goes through `BigDecimal.valueOf(x)` —
  * i.e. it rounds the SHORTEST DECIMAL REPRESENTATION half-up — while
  * DuckDB rounds the true binary value. A mean like 36360.715 (binary
  * 36360.71499…) therefore rounds to .72 in Spark but .71 in DuckDB
  * (observed at sf0.001, q_kpi_category; SURVEY.md §7.5 risk #1).
  *
  * `floor(x·10ⁿ + 0.5) / 10ⁿ` sidesteps the ambiguity: every step is a
  * plain IEEE-754 double op, so Spark and DuckDB produce bit-identical
  * results from bit-identical inputs. Both sides of every oracle-compared
  * query use this form. (Semantics: half-up toward +∞ — matches round
  * HALF_UP for the non-negative metrics it guards.)
  */
object Rounding {
  def roundN(c: Column, n: Int): Column = {
    val p = math.pow(10, n) // exact for n <= 15
    floor(c * p + 0.5) / p
  }

  /** The same formula as DuckDB SQL text (1e2 etc. are exact doubles). */
  def roundNSql(expr: String, n: Int): String =
    s"floor(($expr) * 1e$n + 0.5) / 1e$n"
}
