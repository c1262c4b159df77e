package graft.regrid

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bit-portable rounding used wherever a float result must hash-match an
  * external SQL oracle.
  *
  * `floor(x * 10^d + 0.5) / 10^d` is pure IEEE double arithmetic: any
  * engine evaluating the same expression text produces the same bits,
  * unlike `round()` whose tie/implementation semantics vary by engine.
  * It absorbs last-ULP differences in transcendental functions
  * (JVM `Math.cos` vs C libm) that would otherwise break hash compares.
  */
object Rounding {
  def roundN(c: Column, digits: Int): Column = {
    val m = math.pow(10.0, digits)
    floor(c * lit(m) + lit(0.5)) / lit(m)
  }
  /** 9 decimals — field values (magnitude ≲ 1e3). */
  def r9(c: Column): Column = roundN(c, 9)
  /** 12 decimals — weights (magnitude ≤ 1). */
  def r12(c: Column): Column = roundN(c, 12)

  /** The same helpers as DuckDB SQL text (for oracle generation). */
  def sqlRoundN(e: String, digits: Int): String = {
    val m = s"1.0e$digits"
    s"floor(($e) * $m + 0.5e0) / $m"
  }
  def sqlR9(e: String): String = sqlRoundN(e, 9)
  def sqlR12(e: String): String = sqlRoundN(e, 12)

  /** Double literal for DuckDB SQL. Plain `0.4` is DECIMAL in DuckDB —
    * exponent notation forces DOUBLE so arithmetic matches Spark. */
  def sqlLit(d: Double): String = {
    val s = d.toString
    if (s.contains('E') || s.contains('e')) s else s + "e0"
  }
}
