package graft.pipeline

/** Shared arithmetic guards for the mergeable-summary family
  * ([[Diagnostics]] score histograms, [[Sampling]] value histograms):
  * one definition of the loud DECIMAL→BIGINT downcast, so the
  * threshold and the error-message shape the specs assert on cannot
  * silently diverge between modules (r11 review). */
private[pipeline] object Guards {

  /** Loud DECIMAL→BIGINT downcast: per-group counts must fit a BIGINT
    * (the same bound the DuckDB-oracle BIGINT columns carry); past it
    * the statistic fails instead of wrapping. Upstream running-count
    * windows are long-typed, so this guard is also what makes their
    * wrap regime unreachable: it trips at the same totals that would
    * make them wrap, on every action. */
  def guardedBigint(c: String, what: String): String =
    s"""CASE WHEN $c <= 9223372036854775807 THEN CAST($c AS BIGINT)
         ELSE CAST(raise_error(concat('$what exceeds BIGINT range: ',
           CAST($c AS STRING))) AS BIGINT) END"""
}
