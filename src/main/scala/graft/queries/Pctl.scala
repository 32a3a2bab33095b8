package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{expr, round}

/** The ONE exact-percentile recipe (VERDICT r11 #7): every gate that
  * reads an interpolated percentile goes through this pair, so a new
  * gate cannot introduce a divergent rounding variant. Both engines
  * use linear interpolation at rank q·(n−1): Spark's `percentile`
  * (exact, sort-based) and DuckDB's `quantile_cont`; rounding to a
  * fixed scale BEFORE any comparison or ranking keeps interpolation
  * ulps out of the hash compare (the repo-wide float policy,
  * [[LlmCuration.dsirWeights]]).
  */
object Pctl {
  /** Spark side: round-`scale` exact percentile of `e` (a column name
    * or expression string) at fraction `q`.
    */
  def p(e: String, q: Double, scale: Int = 6): Column =
    round(expr(s"percentile($e, $q)"), scale)

  /** DuckDB oracle fragment mirroring [[p]] — interpolate, then round
    * at the same scale.
    */
  def sql(e: String, q: Double, scale: Int = 6): String =
    s"round(quantile_cont($e, $q), $scale)"

  /** Multi-quantile variant of [[p]]: one sort serves every fraction,
    * each element rounded at the same scale.
    */
  def pArray(e: String, qs: Seq[Double], scale: Int = 6): Column = {
    import org.apache.spark.sql.functions.transform
    transform(expr(s"percentile($e, array(${qs.mkString(",")}))"),
      f => round(f, scale))
  }

  /** DuckDB oracle fragment mirroring [[pArray]]. */
  def sqlArray(e: String, qs: Seq[Double], scale: Int = 6): String =
    s"list_transform(quantile_cont($e, [${qs.mkString(",")}]), " +
      s"f -> round(f, $scale))"
}
