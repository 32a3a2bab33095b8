package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DecimalType, DoubleType,
  IntegerType, LongType, ShortType}

/** The ONE exact-percentile recipe (VERDICT r11 #7): every gate that
  * reads an interpolated percentile goes through this pair, so a new
  * gate cannot introduce a divergent rounding variant. Both engines
  * use linear interpolation at rank q·(n−1): Spark's `percentile`
  * (exact, sort-based) and DuckDB's `quantile_cont`; rounding to a
  * fixed scale BEFORE any comparison or ranking keeps interpolation
  * ulps out of the hash compare (the repo-wide float policy,
  * [[LlmCuration.dsirWeights]]).
  *
  * ==Device choice — the decision table (VERDICT r17 #3)==
  *
  * Four exact-percentile devices coexist on this surface; each wins
  * in exactly one regime, measured in r16/r17 benches. Pick by the
  * GROUP's row-domain, not by taste — every existing call site is
  * pinned to its documented regime by PctlRegimeSpec, so a new call
  * must name its regime there:
  *
  *  - '''buffering `percentile` aggregate''' ([[p]]/[[pArray]]) —
  *    groups provably GRID-SIZED (calendar²-bounded pair grids,
  *    ≤ ~300k rows/group at ANY corpus size). The
  *    TypedImperativeAggregate buffers every group value, which is
  *    fine there and measured 1.3–1.8× FASTER than any histogram
  *    device (r17: ops_sen_slope / st_trend_mk stay put). Censused in
  *    PlanAuditSpec.percentileAggAllowed — fact-sized groups fail the
  *    audit.
  *  - '''[[distBounded]]''' (one per-group histogram window) — value
  *    DOMAIN corpus-size-independent (2-dp cent buckets, 1..50
  *    quantities, length counts): the histogram is domain-sized, so
  *    one partitioned sort over it is safe at any corpus size.
  *    Cheapest device: zero broadcasts, zero persists, one shuffle.
  *  - '''[[dist]] (sparse straddle)''' — NEAR-DISTINCT fact domains
  *    (raw doubles, prices in cents at corpus scale): nothing
  *    fact-sized is shuffled, persisted or sorted; three column-pruned
  *    input scans (see the INPUT CONTRACT below — enforced at build
  *    time).
  *  - '''[[distHist]]''' — per-value counts ALREADY EXIST as grid
  *    algebra (psi_drift's rest = pooled − own) or the weighting is
  *    semantic ("value occurs w times"): weighted percentiles without
  *    materializing the expansion. Same bounded/sparse split as above
  *    via the `bounded` flag.
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
    *   (parts × value) histogram  →  bucket-level totals + exclusive
    *   carry ([[DistRank.bucketOf]]'s monotone decomposition)  →
    *   restrict the histogram to the ≤ 2·|qs|·|groups| buckets whose
    *   index interval contains a wanted order statistic
    *   ⌊q·(n−1)⌋ / ⌈q·(n−1)⌉  →  per-bucket prefix + carry on just
    *   those rows  →  interpolate with
    *   Spark's own `PercentileBase.getPercentile` expression
    *   `(⌈pos⌉ − pos)·lo + (pos − ⌊pos⌋)·hi` (integral pos → lo) in
    *   the same IEEE double order.
    *
    * Bit-equality argument: `percentile` computes pos = (n−1)·q in
    * double, takes the order statistics at ⌊pos⌋/⌈pos⌉ of the sorted
    * multiset (exactly the histogram rows with cnt_lt ≤ idx <
    * cnt_lt + eq), casts them to double and interpolates — every
    * arithmetic step here is the same op on the same values
    * (PctlDistSpec proves equality on randomized data, ties included).
    *
    * Scale shape: one map-combined hash aggregate over the fact
    * relation; everything after is distinct-value-sized or smaller.
    * Bucket totals map-combine to ≤ |groups|·1024 rows; the only
    * ordered windows are the tiny bucket carry and the per-bucket
    * prefix over CANDIDATE buckets only (≤ |distinct|/1024 rows
    * each) — the full histogram is never sorted, at any scale. The
    * candidate restriction is an equi-join on (group, bucket) whose
    * build side is ≤ 2·|qs|·|groups| rows.
    *
    * Output: one row per group — `parts` columns plus one
    * round-`scale` double column per named fraction. Null values are
    * skipped like the aggregate does. Rows of an empty group don't
    * exist (no histogram rows), matching `percentile`'s null-group
    * absence under GROUP BY.
    *
    * INPUT CONTRACT: the sparse path scans `rows` THREE times
    * (bounds, bucket counts, candidate restriction) — free on a
    * column-pruned table scan; callers whose input is a join or other
    * derived relation should `DistRank.tracked(...)` it first (the
    * [[StatTests.brownForsythe]] pattern) so the build runs once.
    * The value expression must also be TOTAL under ANSI (no throwing
    * subexpression reachable on rows a join condition would exclude):
    * the device's not-null pre-filter can be merged into an upstream
    * join residual in any order, so e.g. a division whose divisor a
    * join condition keeps nonzero must still be branch-guarded (the
    * [[StatTests]] senSlope ANSI lesson).
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
    * size as a BIGINT column — the device already carries it as the
    * rank-position denominator, so callers that would otherwise run a
    * SEPARATE count aggregate over the fact (one more full scan) get
    * it for free. SEMANTICS (ADVICE r16): this is the count of
    * NON-NULL `v` rows — the device filters nulls before building the
    * histogram, exactly the population the percentiles are computed
    * over — i.e. SQL `COUNT(v)`, not `COUNT(*)`. Oracles of countAs
    * consumers must write `COUNT(<v>)`. Under [[distHist]] it is the
    * TOTAL WEIGHT of the group (the expanded multiset's row count).
    */
  def dist(rows: DataFrame, parts: Seq[String], v: String,
           qs: Seq[(String, Double)], scale: Int = 6,
           bounded: Boolean = false,
           countAs: Option[String] = None): DataFrame =
    distW(rows.filter(col(v).isNotNull)
        .select((parts.map(col) :+ col(v).as("__v") :+ lit(1L).as("__w")): _*),
      parts, qs, scale, bounded, countAs)

  /** [[dist]] over a PRE-AGGREGATED weighted value histogram: each
    * input row says "value `v` occurs `w` times" (rows with w ≤ 0 or
    * null v are ignored; duplicate (parts, v) rows are summed). Same
    * output, bit-equal to `percentile` over the expanded multiset —
    * for callers whose per-value counts already exist as grid algebra
    * (the [[DataOps.psiDrift]] rest-of-corpus deciles: rest counts =
    * pooled − own, so the 4×-fact rest FAN never needs to be
    * materialized at all).
    */
  def distHist(hist: DataFrame, parts: Seq[String], v: String, w: String,
               qs: Seq[(String, Double)], scale: Int = 6,
               bounded: Boolean = false,
               countAs: Option[String] = None): DataFrame = {
    // ADVICE r17: a fractional weight in (0,1) passes the w > 0 filter
    // and silently truncates to 0 under cast(Long) (1.9 → 1), quietly
    // diverging from the "value v occurs w times" multiset contract.
    // Integral weight TYPES are trusted; anything else must carry
    // integral VALUES, enforced loudly per row (the psmAtt
    // enforce-the-envelope pattern) on the already-required filter
    // pass — zero extra scans.
    val integralType = hist.schema(w).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case d: DecimalType if d.scale == 0                => true
      case _                                             => false
    }
    // rows the device documents as IGNORED (null v/w, w <= 0) stay
    // ignored — the assert polices only rows that would contribute,
    // so e.g. a sentinel -0.5 weight is dropped like any w <= 0, not
    // escalated into a job failure the contract never promised
    val guarded =
      if (integralType) hist
      else hist.filter(coalesce(assert_true(
        col(v).isNull || col(w).isNull || col(w) <= 0 ||
          col(w) === floor(col(w)),
        lit(s"distHist: weight '$w' must be integral — " +
          "the device's multiset contract is 'value v occurs w times'")),
        lit(true)))
    distW(guarded.filter(col(v).isNotNull && col(w) > 0)
        .select((parts.map(col) :+ col(v).as("__v") :+
          col(w).cast(LongType).as("__w")): _*),
      parts, qs, scale, bounded, countAs)
  }

  /** Build-time enforcement of the sparse path's 3-scan INPUT CONTRACT
    * (VERDICT r17 #2): the sparse device scans its input three times
    * (bounds, bucket counts, candidate restriction) — free on a
    * column-pruned scan or a tracked-persisted relation, silently 3×
    * on an expensive unpersisted subplan. The input's OPTIMIZED plan
    * (cache substitution applied, so a [[DistRank.tracked]] input
    * bottoms out at an InMemoryRelation leaf) must contain no join,
    * aggregate, window, generator, sort or shuffle node; violations
    * fail at gate-construction time with the fix named, like the
    * PlanAuditSpec censuses fail at test time. PctlDistSpec pins both
    * directions (a raw join input throws; the same input tracked
    * passes).
    */
  private def requireOneScanInput(in: DataFrame): Unit = {
    import org.apache.spark.sql.catalyst.plans.logical._
    // collectWithSubqueries: a scalar/EXISTS subquery inside a filter
    // is exactly as expensive to re-run three times as a top-level
    // join — it must not slip past the census by hiding in an
    // expression
    val offenders = in.queryExecution.optimizedPlan.collectWithSubqueries {
      case p: Join => p.nodeName
      case p: Aggregate => p.nodeName
      case p: Window => p.nodeName
      case p: Generate => p.nodeName
      case p: Sort => p.nodeName
      case p: Expand => p.nodeName
      case p: RepartitionOperation => p.nodeName
    }
    require(offenders.isEmpty,
      "Pctl sparse-path input contract: the device scans its input " +
        s"THREE times, but this input's plan contains ${offenders.distinct.mkString(", ")} — " +
        "wrap the input in DistRank.tracked(...) (the brownForsythe " +
        "pattern) so the subplan materializes once, or use " +
        "distBounded if the value domain is corpus-size-independent")
  }

  private def distW(in0: DataFrame, parts: Seq[String],
                    qs: Seq[(String, Double)], scale: Int,
                    bounded: Boolean,
                    countAs: Option[String]): DataFrame = {
    require(qs.nonEmpty)
    val pc = parts.map(col)
    val qlits = array(qs.map { case (nm, q) =>
      struct(lit(nm).as("__qn"), lit(q).as("__q"))
    }: _*)
    // SPARSE STRADDLE (r17, VERDICT r16 #2): the device only ever
    // reads the ≤ 2·|qs| tie blocks per group that straddle
    // ⌊q·(n−1)⌋/⌈q·(n−1)⌉ — so it needs neither the full
    // distinct-value histogram the r16 device hash-aggregated,
    // persisted and window-sorted (fact-sized on near-distinct
    // domains like sk_quantile_reservoir's extendedprice — the
    // VERDICT r16 stress case), nor any fact-sized shuffle at all:
    //   pass 1: per-group [min, max, n] (map-combined, no shuffle of
    //     data) → broadcast;
    //   pass 2: per-(group, bucket) counts under
    //     [[DistRank.bucketOf]]'s monotone bucketing (map-combined to
    //     ≤ |groups|·1024 rows) → exclusive bucket carry (tiny
    //     window) → CANDIDATE buckets = those whose [carry,
    //     carry+total) index interval contains a wanted order
    //     statistic (inline literal explode, no join);
    //   pass 3: equi-join the input down to candidate buckets
    //     (≤ 2·|qs|·|groups| buckets, ~n/1024 rows each), build the
    //     tie histogram and per-bucket exclusive prefix on just those
    //     rows — carry + local prefix = the global cumulative on
    //     exactly the tie blocks that matter.
    // A tie block lives in one bucket (bucketOf is monotone), so the
    // bucket holding index k holds the whole straddling block;
    // bit-equality vs `percentile` is untouched (PctlDistSpec).
    // At 100 TB: three column-pruned scans of the input, nothing
    // fact-sized is ever shuffled, persisted or sorted — the largest
    // shuffle is the bucket-count grid, the largest sort one bucket
    // of one group.
    val pre =
      if (bounded) {
        val hist0 = in0
          .groupBy((pc :+ col("__v")): _*)
          .agg(sum(col("__w")).as("__eq"))
        val wCum = org.apache.spark.sql.expressions.Window
          .partitionBy(pc: _*).orderBy(col("__v"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val wTot = org.apache.spark.sql.expressions.Window.partitionBy(pc: _*)
        hist0
          .withColumn("__eq_lt",
            coalesce(sum(col("__eq")).over(wCum), lit(0L)))
          .withColumn("__eq_tot", sum(col("__eq")).over(wTot))
      } else {
        requireOneScanInput(in0)
        val in = in0
        val vType = in.schema("__v").dataType
        val bounds =
          (if (parts.isEmpty) in.groupBy() else in.groupBy(pc: _*))
            .agg(min(col("__v")).as("__blo"), max(col("__v")).as("__bhi"),
              sum(col("__w")).as("__n"))
        val withB =
          (if (parts.isEmpty) in.crossJoin(broadcast(bounds))
           else in.join(broadcast(bounds), parts))
            .withColumn("__b",
              DistRank.bucketOf(col("__v"), col("__blo"), col("__bhi"), vType))
            .drop("__blo", "__bhi")
        val bcnt = withB.groupBy((pc :+ col("__b")): _*)
          .agg(sum(col("__w")).as("__bt"), min(col("__n")).as("__n"))
        val carryParts = if (parts.isEmpty) Seq(lit(0)) else pc
        val wCarry = org.apache.spark.sql.expressions.Window
          .partitionBy(carryParts: _*).orderBy(col("__b"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val candB = bcnt
          .withColumn("__blt", coalesce(sum(col("__bt")).over(wCarry), lit(0L)))
          .select((pc :+ col("__b") :+ col("__blt") :+ col("__bt") :+
            col("__n") :+ explode(qlits).as("__f")): _*)
          .withColumn("__kpos",
            (col("__n") - 1L).cast(DoubleType) * col("__f.__q"))
          .filter(
            (floor(col("__kpos")).cast(LongType) >= col("__blt") &&
              floor(col("__kpos")).cast(LongType) < col("__blt") + col("__bt")) ||
              (ceil(col("__kpos")).cast(LongType) >= col("__blt") &&
                ceil(col("__kpos")).cast(LongType) < col("__blt") + col("__bt")))
          .groupBy((pc :+ col("__b")): _*)
          .agg(min(col("__blt")).as("__blt"), min(col("__n")).as("__n"))
        val wLoc = org.apache.spark.sql.expressions.Window
          .partitionBy((pc :+ col("__b")): _*).orderBy(col("__v"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        // ADVICE r17: candB is ≤ 2·|qs|·|groups| rows by construction,
        // but its plan (windows/explode/aggregates) carries no
        // row-count stats Spark trusts at planning time (the r16
        // psi_drift precedent) — without the hint this join can plan
        // sort-merge and shuffle+sort the fact-sized probe side,
        // breaking the "nothing fact-sized is ever shuffled or
        // sorted" contract. AQE's conversion would come only AFTER
        // the probe-side shuffle write; the hint keeps it broadcast
        // from the first plan.
        withB.select((pc :+ col("__v") :+ col("__w") :+ col("__b")): _*)
          .join(broadcast(candB), parts :+ "__b")
          .groupBy((pc :+ col("__b") :+ col("__blt") :+ col("__n") :+
            col("__v")): _*)
          .agg(sum(col("__w")).as("__eq"))
          .withColumn("__eq_lt",
            col("__blt") + coalesce(sum(col("__eq")).over(wLoc), lit(0L)))
          .withColumn("__eq_tot", col("__n"))
      }
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
      // PercentileBase.getPercentile's own double expression ORDER
      // (Spark 4.1.2): integral position returns the lower key
      // directly; otherwise
      //   (higher − position)·lower + (position − lower)·higher
      // with lower = ⌊pos⌋, higher = ⌈pos⌉. ADVICE r16: the lerp form
      // lo + (hi−lo)·frac can differ from this by an ulp before the
      // round, so the device mirrors Spark's order exactly — the
      // PctlDistSpec bit-equality claim holds by construction, not by
      // luck. DuckDB quantile_cont lerps; round-`scale` keeps that
      // cross-engine ulp out of every oracle compare (repo float
      // policy, [[LlmCuration.dsirWeights]]).
      .withColumn("__val", round(
        when(ceil(col("__pos")) === floor(col("__pos")),
          col("__vlo").cast(DoubleType))
          .otherwise(
            (ceil(col("__pos")).cast(DoubleType) - col("__pos")) *
              col("__vlo").cast(DoubleType) +
              (col("__pos") - floor(col("__pos")).cast(DoubleType)) *
                col("__vhi").cast(DoubleType)), scale))
    val aggCols = qs.map { case (nm, _) =>
      min(when(col("__qn") === nm, col("__val"))).as(nm) } ++
      countAs.map(nm => min(col("__n")).as(nm))
    (if (parts.isEmpty) interpolated.groupBy() else interpolated.groupBy(pc: _*))
      .agg(aggCols.head, aggCols.tail: _*)
  }
}
