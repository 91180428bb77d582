package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic rounding.
  *
  * `round(x, k)` is NOT portable: Spark routes doubles through
  * `BigDecimal.valueOf` (shortest decimal string), DuckDB rounds the
  * binary value — at apparent-half boundaries (e.g. 527483.955 whose
  * nearest double is a hair below) they disagree by one ulp of the last
  * kept digit. `floor(x·10ᵏ + 0.5) / 10ᵏ` is pure IEEE arithmetic: given
  * bit-identical inputs both engines produce bit-identical outputs.
  *
  * Assumes non-negative x (all rounded measures here are counts, prices,
  * ratios, durations). The oracle twin is the same formula spelled in SQL:
  * `floor(x * 10^k + 0.5) / 10^k.0`.
  */
object PortableRound {
  def r(c: Column, k: Int): Column = {
    val f = math.pow(10, k)
    floor(c * f + lit(0.5)) / f
  }
}
