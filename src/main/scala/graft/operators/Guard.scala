package graft.operators

import org.apache.spark.sql.{DataFrame, Row}

/** Fail-fast guard for the driver-sized-model collect class: every
  * `collect()` that materializes a model on the driver is bounded BY
  * CONSTRUCTION (channel-transition matrices, ≤PacfMaxLag ACF rows,
  * queries·k² MMR candidate pairs) — but a violated assumption
  * (pathological input, a future edit widening a candidate stage) must
  * fail with a named limit, not a driver OOM. `limit(max+1)` bounds what
  * is ever shipped to the driver; the `require` names the site.
  */
object Guard {
  def boundedCollect(df: DataFrame, max: Int, what: String): Array[Row] = {
    val rows = df.limit(max + 1).collect()
    require(rows.length <= max,
      s"$what exceeded its $max-row driver-model bound — refusing to " +
      "materialize an unbounded model on the driver")
    rows
  }
}
