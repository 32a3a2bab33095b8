package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

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

  /** Exact interpolated percentiles WITHOUT the buffer-everything
    * `Percentile` TypedImperativeAggregate (VERDICT r15 #2): Spark's
    * exact `percentile` materializes EVERY value of a group in its
    * aggregation buffer, which is fine on bounded grids but a
    * scale-killer on fact-sized groups. This device computes the SAME
    * answer — bit-equal to [[p]], so every DuckDB oracle is
    * unchanged — from a distinct-value histogram:
    *
    *   (parts × value) histogram  →  [[DistRank.prefixLt]] cumulative
    *   counts (bucketed, no single-partition sort)  →  broadcast the
    *   tiny per-(group, fraction) straddling order-statistic indexes
    *   ⌊q·(n−1)⌋ / ⌈q·(n−1)⌉ onto the histogram  →  interpolate with
    *   Spark's own `Percentile.getPercentile` formula
    *   `lo + (hi − lo)·(pos − ⌊pos⌋)` in the same IEEE double order.
    *
    * Bit-equality argument: `percentile` computes pos = (n−1)·q in
    * double, takes the order statistics at ⌊pos⌋/⌈pos⌉ of the sorted
    * multiset (exactly the histogram rows with cnt_lt ≤ idx <
    * cnt_lt + eq), casts them to double and interpolates — every
    * arithmetic step here is the same op on the same values
    * (PctlDistSpec proves equality on randomized data, ties included).
    *
    * Scale shape: one map-combined hash aggregate over the fact
    * relation; everything after is distinct-value-sized, bucketed by
    * the device — no task buffers or sorts more than |distinct|/1024
    * rows. The straddle join is a broadcast of ≤ |groups|·|qs|·2 rows
    * with an equi-key on the group (plus a range residual); with no
    * parts it is a broadcast nested-loop against the histogram —
    * 2·|qs| rows, constant-bounded.
    *
    * Output: one row per group — `parts` columns plus one
    * round-`scale` double column per named fraction. Null values are
    * skipped like the aggregate does. Rows of an empty group don't
    * exist (no histogram rows), matching `percentile`'s null-group
    * absence under GROUP BY.
    */
  /** `bounded = true` variant of [[dist]] for value columns whose
    * DISTINCT-VALUE DOMAIN is provably corpus-size-independent (2-dp
    * cent buckets, 1..50 quantities, document-length counts): the
    * cumulative counts come from ONE partitioned window over the
    * per-group histogram instead of the two-level bucket device —
    * zero extra broadcasts, zero persists, one shuffle. A per-group
    * histogram sort is safe exactly when the domain is bounded (a
    * 40k-row sort per group at ANY corpus size); for fact-correlated
    * domains use the default device. Grouped callers only: a global
    * bounded window would be the unpartitioned-window class the
    * census exists to catch.
    */
  def distBounded(rows: DataFrame, parts: Seq[String], v: String,
                  qs: Seq[(String, Double)], scale: Int = 6,
                  countAs: Option[String] = None): DataFrame = {
    require(parts.nonEmpty, "distBounded is for grouped calls; " +
      "use dist for global quantiles")
    dist(rows, parts, v, qs, scale, bounded = true, countAs = countAs)
  }

  /** Optional extra output: `countAs = Some(name)` appends the group
    * size (count of non-null `v` rows) as a BIGINT column — the device
    * already carries it as the rank-position denominator, so callers
    * that would otherwise run a SEPARATE count aggregate over the fact
    * (one more full scan) get it for free.
    */
  def dist(rows: DataFrame, parts: Seq[String], v: String,
           qs: Seq[(String, Double)], scale: Int = 6,
           bounded: Boolean = false,
           countAs: Option[String] = None): DataFrame = {
    require(qs.nonEmpty)
    val pc = parts.map(col)
    val hist = rows.filter(col(v).isNotNull)
      .groupBy((pc :+ col(v).as("__v")): _*)
      .agg(count(lit(1)).as("__eq"))
    // groupTotals rides the device's own bounds broadcast, so the
    // group size n lands on every histogram row for free — no sizes
    // aggregate, no index relation, no straddle join (r16 perf pass:
    // the join-based straddle cost two extra broadcast jobs per call)
    val pre =
      if (bounded) {
        val wCum = org.apache.spark.sql.expressions.Window
          .partitionBy(pc: _*).orderBy(col("__v"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val wTot = org.apache.spark.sql.expressions.Window.partitionBy(pc: _*)
        hist
          .withColumn("__eq_lt",
            coalesce(sum(col("__eq")).over(wCum), lit(0L)))
          .withColumn("__eq_tot", sum(col("__eq")).over(wTot))
      } else DistRank.prefixLt(hist, parts, "__v", Seq("__eq"),
        groupTotals = true)
    val qlits = array(qs.map { case (nm, q) =>
      struct(lit(nm).as("__qn"), lit(q).as("__q"))
    }: _*)
    // inline straddle: explode the fraction literals onto the
    // histogram (projection only), keep the rows whose 0-based sorted
    // index span [cnt_lt, cnt_lt + eq) covers ⌊q·(n−1)⌋ or ⌈q·(n−1)⌉
    val cand = pre
      .select((pc :+ col("__v") :+ col("__eq") :+ col("__eq_lt") :+
        col("__eq_tot") :+ explode(qlits).as("__f")): _*)
      .withColumn("__pos",
        (col("__eq_tot") - 1L).cast(DoubleType) * col("__f.__q"))
      .withColumn("__lo", floor(col("__pos")).cast(LongType))
      .withColumn("__hi", ceil(col("__pos")).cast(LongType))
      .withColumn("__isLo",
        col("__lo") >= col("__eq_lt") &&
          col("__lo") < col("__eq_lt") + col("__eq"))
      .withColumn("__isHi",
        col("__hi") >= col("__eq_lt") &&
          col("__hi") < col("__eq_lt") + col("__eq"))
      .filter(col("__isLo") || col("__isHi"))
    val interpolated = cand
      .groupBy((pc :+ col("__f.__qn").as("__qn") :+ col("__pos")): _*)
      .agg(min(when(col("__isLo"), col("__v"))).as("__vlo"),
        min(when(col("__isHi"), col("__v"))).as("__vhi"),
        min(col("__eq_tot")).as("__n"))
      // Percentile.getPercentile's own double order:
      // lower + (higher − lower) · (position − ⌊position⌋)
      .withColumn("__val", round(
        col("__vlo").cast(DoubleType) +
          (col("__vhi").cast(DoubleType) - col("__vlo").cast(DoubleType)) *
            (col("__pos") - floor(col("__pos")).cast(DoubleType)), scale))
    val aggCols = qs.map { case (nm, _) =>
      min(when(col("__qn") === nm, col("__val"))).as(nm) } ++
      countAs.map(nm => min(col("__n")).as(nm))
    (if (parts.isEmpty) interpolated.groupBy() else interpolated.groupBy(pc: _*))
      .agg(aggCols.head, aggCols.tail: _*)
  }
}
