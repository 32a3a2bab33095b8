package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 extension tranche B: monotone calibration, rank
  * correlation on time series, cumulative-hazard survival, and the
  * superlative price indices — four classics that complete families
  * already on the surface ([[StatOps.calibrationEce]],
  * [[StatOps.spearman]], [[StatOps.survivalKm]],
  * [[DataOps.priceIndex]]). Same float policy as [[StatOps]]: exact
  * integers through aggregation, one double crossing written
  * identically in the Spark plan and the DuckDB oracle, round-6
  * output, `+ 0.0` oracle normalization on negative-capable columns.
  */
object StatMore {

  /** Isotonic regression (PAV) calibration of an activity-score
    * reliability diagram — the standard post-hoc calibrator
    * (Zadrozny & Elkan 2002) that replaces the raw per-bin rates
    * with the closest MONOTONE fit, pooling adjacent violators.
    * Score: a customer's order count, binned by ⌊n/2⌋ capped at 9
    * (pure integers — no floating bin boundary); outcome: the
    * customer ever placed a 1-URGENT order. The raw rates are noisy
    * and locally non-monotone (bins 1→2 and 5→6 invert at sf0.01),
    * so the fit genuinely pools. Rather than iterate the
    * pool-adjacent-violators loop, the fit evaluates the closed-form
    * minimax characterization iso(i) = max_{j≤i} min_{k≥i}
    * mean(y[j..k]) (Robertson, Wright & Dykstra 1988, thm 1.4.4) —
    * every interval mean is ONE double division of two exact integer
    * interval sums (prefix-sum differences), and min/max over doubles
    * is order-free, so both engines agree bitwise.
    *
    * Scale shape: one fact hash aggregate to customers, one hash
    * aggregate to the ≤10-bin grid; the pair/interval relations are
    * bin²-sized literals (≤55 rows) regardless of fact size — the
    * iterative PAV loop becomes three grid-sized joins.
    */
  def isotonicCalib(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.t(s, dir, "customer")
      .select(col("c_custkey"))
      .join(Tables.t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderpriority")),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_ord"),
        max(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L))
          .as("label"))
      .select(least(lit(9L), expr("n_ord DIV 2")).as("bin"), col("label"))
    val bins = cust.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("label")).as("n_pos"))
    val wCum = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bins
      .withColumn("cw", sum(col("n")).over(wCum))
      .withColumn("cp", sum(col("n_pos")).over(wCum))
    val lo = cum.select(col("bin").as("jbin"), col("n").as("jn"),
      col("n_pos").as("jp"), col("cw").as("jcw"), col("cp").as("jcp"))
    val hi = cum.select(col("bin").as("kbin"), col("cw").as("kcw"),
      col("cp").as("kcp"))
    // both non-equi sides are capped at 10 rows by the least(9, ·)
    // bin cap — broadcast so the interval joins plan as BNLJ over a
    // literal-bounded grid, never a shuffled cartesian
    val pairs = lo.join(broadcast(hi), col("jbin") <= col("kbin"))
      .select(col("jbin"), col("kbin"),
        ((col("kcp") - col("jcp") + col("jp")).cast(DoubleType) /
          (col("kcw") - col("jcw") + col("jn")).cast(DoubleType)).as("avg"))
    val iso = pairs
      .join(broadcast(bins.select(col("bin"))),
        col("jbin") <= col("bin") && col("kbin") >= col("bin"))
      .groupBy(col("bin"), col("jbin"))
      .agg(min(col("avg")).as("mn"))
      .groupBy(col("bin"))
      .agg(max(col("mn")).as("iso"))
    bins.join(iso, "bin")
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("n_pos").cast(DoubleType) / col("n").cast(DoubleType), 6)
          .as("raw_rate"),
        round(col("iso"), 6).as("iso_rate"))
      .orderBy(col("bin"))
  }

  val isotonicCalibOracle: String =
    """WITH cust AS (
      |  SELECT c.c_custkey,
      |    LEAST(9, COUNT(o.o_orderkey) // 2) AS bin,
      |    MAX(CASE WHEN o.o_orderpriority = '1-URGENT'
      |      THEN 1 ELSE 0 END) AS label
      |  FROM customer c
      |  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      |  GROUP BY c.c_custkey),
      |bins AS (
      |  SELECT bin, COUNT(*) AS n, CAST(SUM(label) AS BIGINT) AS n_pos
      |  FROM cust GROUP BY bin),
      |cum AS (
      |  SELECT bin, n, n_pos,
      |    SUM(n) OVER (ORDER BY bin
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
      |    SUM(n_pos) OVER (ORDER BY bin
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp
      |  FROM bins),
      |pairs AS (
      |  SELECT j.bin AS jbin, k.bin AS kbin,
      |    CAST(k.cp - j.cp + j.n_pos AS DOUBLE)
      |      / CAST(k.cw - j.cw + j.n AS DOUBLE) AS avg
      |  FROM cum j JOIN cum k ON j.bin <= k.bin),
      |mins AS (
      |  SELECT b.bin, p.jbin, MIN(p.avg) AS mn
      |  FROM pairs p JOIN bins b ON p.jbin <= b.bin AND p.kbin >= b.bin
      |  GROUP BY b.bin, p.jbin),
      |iso AS (SELECT bin, MAX(mn) AS iso FROM mins GROUP BY bin)
      |SELECT b.bin, CAST(b.n AS BIGINT) AS n, b.n_pos,
      |  round(CAST(b.n_pos AS DOUBLE) / CAST(b.n AS DOUBLE), 6) AS raw_rate,
      |  round(i.iso, 6) AS iso_rate
      |FROM bins b JOIN iso i USING (bin) ORDER BY bin""".stripMargin

  /** Kendall's τ-b (Kendall 1938; τ-b tie correction, Kendall 1945)
    * between a nation's monthly order REVENUE and monthly order COUNT
    * series — the trend-agreement diagnostic ("do revenue and volume
    * move together month-over-month?") that, unlike
    * [[StatOps.spearman]]'s rank correlation, is a direct probability
    * statement about concordant pairs and is the basis of the
    * Mann–Kendall trend family already on the surface
    * (`st_trend_mk`). Concordant/discordant/tie counts are pure
    * integer comparisons over exact revenue cents; τ-b crosses to
    * double ONCE: (C−D)/√((n₀−t_x)(n₀−t_y)).
    *
    * Scale shape: one fact hash aggregate to the (nation × month)
    * grid (a broadcast dim join for the name), one within-nation
    * grid self-join (month²-sized, never fact-sized), one hash
    * aggregate to the 25-row nation grid. Degenerate nations (all
    * months tied on either series) are filtered relationally before
    * the division on both engines.
    */
  def kendallTau(s: SparkSession, dir: String): DataFrame = {
    val dec0 = DecimalType(38, 0)
    // customer is data-bounded (grows with SF) — no broadcast hint,
    // AQE picks the strategy; nation is spec-constant (25 rows)
    val grid = Tables.t(s, dir, "orders")
      .join(Tables.t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"),
        date_trunc("month", col("o_orderdate").cast(TimestampType))
          .cast(DateType).as("month"),
        round(col("o_totalprice") * 100).cast(LongType).as("cents"))
      .groupBy(col("n_name"), col("month"))
      .agg(sum(col("cents").cast(dec0)).cast(LongType).as("rev"),
        count(lit(1)).as("cnt"))
    val a = grid.select(col("n_name").as("nn"), col("month").as("m1"),
      col("rev").as("r1"), col("cnt").as("c1"))
    val b = grid.select(col("n_name").as("nn2"), col("month").as("m2"),
      col("rev").as("r2"), col("cnt").as("c2"))
    val pairs = a.join(b, col("nn") === col("nn2") && col("m1") < col("m2"))
      .select(col("nn"),
        (col("r2") - col("r1")).as("dx"), (col("c2") - col("c1")).as("dy"))
    val agg = pairs.groupBy(col("nn"))
      .agg(count(lit(1)).as("n0"),
        sum(when((col("dx") > 0 && col("dy") > 0) ||
          (col("dx") < 0 && col("dy") < 0), 1L).otherwise(0L))
          .as("concordant"),
        sum(when((col("dx") > 0 && col("dy") < 0) ||
          (col("dx") < 0 && col("dy") > 0), 1L).otherwise(0L))
          .as("discordant"),
        sum(when(col("dx") === 0, 1L).otherwise(0L)).as("ties_rev"),
        sum(when(col("dy") === 0, 1L).otherwise(0L)).as("ties_cnt"))
    val months = grid.groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_months"))
    agg.join(months, col("nn") === col("n_name"))
      .filter(col("n0") > col("ties_rev") && col("n0") > col("ties_cnt"))
      .select(col("n_name"), col("n_months"), col("concordant"),
        col("discordant"), col("ties_rev"), col("ties_cnt"),
        round((col("concordant") - col("discordant")).cast(DoubleType) /
          sqrt(((col("n0") - col("ties_rev")) *
            (col("n0") - col("ties_cnt"))).cast(DoubleType)), 6)
          .as("tau_b"))
      .orderBy(col("n_name"))
  }

  val kendallTauOracle: String =
    """WITH grid AS (
      |  SELECT n.n_name,
      |    CAST(date_trunc('month', CAST(o.o_orderdate AS TIMESTAMP))
      |      AS DATE) AS month,
      |    CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev,
      |    COUNT(*) AS cnt
      |  FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT a.n_name, b.rev - a.rev AS dx, b.cnt - a.cnt AS dy
      |  FROM grid a JOIN grid b
      |    ON a.n_name = b.n_name AND a.month < b.month),
      |agg AS (
      |  SELECT n_name, COUNT(*) AS n0,
      |    CAST(SUM(CASE WHEN (dx > 0 AND dy > 0) OR (dx < 0 AND dy < 0)
      |      THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
      |    CAST(SUM(CASE WHEN (dx > 0 AND dy < 0) OR (dx < 0 AND dy > 0)
      |      THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
      |    CAST(SUM(CASE WHEN dx = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS ties_rev,
      |    CAST(SUM(CASE WHEN dy = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS ties_cnt
      |  FROM pairs GROUP BY 1),
      |months AS (SELECT n_name, COUNT(*) AS n_months FROM grid GROUP BY 1)
      |SELECT a.n_name, m.n_months, a.concordant, a.discordant,
      |  a.ties_rev, a.ties_cnt,
      |  round(CAST(a.concordant - a.discordant AS DOUBLE)
      |    / sqrt(CAST((a.n0 - a.ties_rev) * (a.n0 - a.ties_cnt)
      |      AS DOUBLE)), 6) + 0.0 AS tau_b
      |FROM agg a JOIN months m USING (n_name)
      |WHERE a.n0 > a.ties_rev AND a.n0 > a.ties_cnt
      |ORDER BY a.n_name""".stripMargin

  /** Nelson–Aalen cumulative hazard (Nelson 1972; Aalen 1978) with
    * the Breslow survival transform exp(−H) and Aalen's variance —
    * the hazard-space counterpart of [[StatOps.survivalKm]] over the
    * SAME lifetime construction (hour-grain user lifetimes,
    * 12-hour right-censoring window): H(t) = Σ_{u≤t} d_u/n_u,
    * Var = Σ d(n−d)/n³. KM answers "what fraction survives to t";
    * Nelson–Aalen answers "how much churn pressure has accumulated
    * by t" and is the additive form hazard-ratio models build on.
    * Each step's d/n and d(n−d)/n³ is computed once in double from
    * exact integers; the cumulative sums ride DECIMAL(38,12) through
    * the ordered window, exp/sqrt cross last.
    *
    * Scale shape: identical to [[StatOps.survivalKm]] — one fact
    * aggregate to users, one to the distinct-lifetime grid, windows
    * over grid-sized relations.
    */
  def nelsonAalen(s: SparkSession, dir: String): DataFrame = {
    val HourUs = 3600000000L
    val CensorHours = 12
    val d12 = DecimalType(38, 12)
    val users = Tables.t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(min(unix_micros(col("ts"))).as("first_us"),
        max(unix_micros(col("ts"))).as("last_us"))
    val bounds = users.agg(max(col("last_us")).as("end_us"))
    val lives = users.crossJoin(broadcast(bounds))
      .select(expr(s"(last_us - first_us) DIV $HourUs").as("t"),
        (col("last_us") < col("end_us") - CensorHours * HourUs)
          .cast(LongType).as("churn"))
    val grid = lives.groupBy(col("t"))
      .agg(count(lit(1)).as("c"), sum(col("churn")).as("d"))
    val wDesc = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAsc = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("n_risk", sum(col("c")).over(wDesc))
      .filter(col("d") > 0)
      .withColumn("h",
        col("d").cast(DoubleType) / col("n_risk").cast(DoubleType))
      .withColumn("v",
        col("d").cast(DoubleType) *
          (col("n_risk") - col("d")).cast(DoubleType) /
          (col("n_risk").cast(DoubleType) * col("n_risk").cast(DoubleType) *
            col("n_risk").cast(DoubleType)))
      .withColumn("hc", sum(col("h").cast(d12)).over(wAsc).cast(DoubleType))
      .withColumn("vc", sum(col("v").cast(d12)).over(wAsc).cast(DoubleType))
      .select(col("t").as("t_hours"), col("n_risk"), col("d").as("n_churn"),
        round(col("hc"), 6).as("cum_hazard"),
        round(sqrt(col("vc")), 6).as("na_se"),
        round(exp(-col("hc")), 6).as("breslow_surv"))
      .orderBy(col("t_hours"))
  }

  val nelsonAalenOracle: String =
    """WITH users AS (
      |  SELECT user_id, MIN(epoch_us(ts)) AS first_us,
      |    MAX(epoch_us(ts)) AS last_us
      |  FROM events GROUP BY 1),
      |bounds AS (SELECT MAX(last_us) AS end_us FROM users),
      |lives AS (
      |  SELECT (last_us - first_us) // 3600000000 AS t,
      |    CASE WHEN last_us < end_us - 12 * 3600000000
      |      THEN 1 ELSE 0 END AS churn
      |  FROM users CROSS JOIN bounds),
      |grid AS (SELECT t, COUNT(*) AS c, CAST(SUM(churn) AS BIGINT) AS d
      |  FROM lives GROUP BY 1),
      |risk AS (
      |  SELECT t, c, d,
      |    CAST(SUM(c) OVER (ORDER BY t DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS n_risk
      |  FROM grid),
      |steps AS (
      |  SELECT t, n_risk, d,
      |    CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS h,
      |    CAST(d AS DOUBLE) * CAST(n_risk - d AS DOUBLE)
      |      / (CAST(n_risk AS DOUBLE) * CAST(n_risk AS DOUBLE)
      |        * CAST(n_risk AS DOUBLE)) AS v
      |  FROM risk WHERE d > 0),
      |acc AS (
      |  SELECT t, n_risk, d,
      |    CAST(SUM(CAST(h AS DECIMAL(38,12))) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |      AS hc,
      |    CAST(SUM(CAST(v AS DECIMAL(38,12))) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |      AS vc
      |  FROM steps)
      |SELECT t AS t_hours, n_risk, d AS n_churn,
      |  round(hc, 6) AS cum_hazard,
      |  round(sqrt(vc), 6) AS na_se,
      |  round(exp(-hc), 6) AS breslow_surv
      |FROM acc ORDER BY t_hours""".stripMargin

  /** Törnqvist and Walsh SUPERLATIVE price indices by ship month —
    * the two index-number-theory completions of
    * [[DataOps.priceIndex]]'s Laspeyres/Paasche/Fisher trio
    * (Diewert 1976 showed superlative indices are exact for flexible
    * preference aggregators; Törnqvist is what national statistics
    * agencies publish as the "chained superlative CPI"). Same
    * part-month unit-value grid and common-basket discipline:
    * ln P_T = Σ ½(s⁰ᵢ+sᵗᵢ)·ln(pᵗᵢ/p⁰ᵢ) with revenue shares within
    * the common basket; P_W = Σ √(q⁰qᵗ)·pᵗ / Σ √(q⁰qᵗ)·p⁰. Unit
    * values are round-6 ratios of exact cents; every per-part term
    * is a fixed-order double expression; the basket totals and the
    * term sums ride order-independent DECIMAL(38,12).
    *
    * Scale shape: one fact pass to the (part × month) grid; basket
    * totals are one grid-sized window; the index is one hash
    * aggregate to the month grid — the fact is touched once.
    */
  def tornqvistIndex(s: SparkSession, dir: String): DataFrame = {
    val d12 = DecimalType(38, 12)
    val li = Tables.t(s, dir, "lineitem")
      .select(col("l_partkey").as("part"),
        date_trunc("month", col("l_shipdate")).cast(DateType).as("month"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast(LongType).as("ec"),
        expr("CAST(round(l_quantity) AS BIGINT)").as("q"))
    val grid = li.groupBy(col("part"), col("month"))
      .agg(sum(col("ec")).as("ec"), sum(col("q")).as("q"))
      .withColumn("p", round(col("ec").cast(DoubleType) /
        col("q").cast(DoubleType), 6))
    val baseMonth = grid.agg(min(col("month")).as("base_month"))
    val base = grid.join(broadcast(baseMonth),
        col("month") === col("base_month"))
      .select(col("part"), col("p").as("p0"), col("q").as("q0"))
    val joined = grid.join(base, "part")
    val wMonth = Window.partitionBy(col("month"))
    val terms = joined
      .withColumn("tot0",
        sum((col("p0") * col("q0")).cast(d12)).over(wMonth)
          .cast(DoubleType))
      .withColumn("tott",
        sum((col("p") * col("q")).cast(d12)).over(wMonth).cast(DoubleType))
      .withColumn("lnterm",
        lit(0.5) * (col("p0") * col("q0") / col("tot0") +
          col("p") * col("q") / col("tott")) * log(col("p") / col("p0")))
      .withColumn("w", sqrt((col("q0") * col("q")).cast(DoubleType)))
    terms.groupBy(col("month"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("lnterm").cast(d12)).cast(DoubleType).as("lnt"),
        sum((col("p") * col("w")).cast(d12)).as("wn"),
        sum((col("p0") * col("w")).cast(d12)).as("wd"))
      .select(col("month"), col("n_parts"),
        round(exp(col("lnt")), 6).as("tornqvist"),
        round(col("wn").cast(DoubleType) / col("wd").cast(DoubleType), 6)
          .as("walsh"))
      .orderBy(col("month"))
  }

  val tornqvistIndexOracle: String =
    """WITH li AS (
      |  SELECT l_partkey AS part,
      |    CAST(date_trunc('month', CAST(l_shipdate AS TIMESTAMP)) AS DATE)
      |      AS month,
      |    CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
      |      AS ec,
      |    CAST(round(l_quantity) AS BIGINT) AS q
      |  FROM lineitem),
      |grid AS (
      |  SELECT part, month, round(CAST(SUM(ec) AS DOUBLE)
      |      / CAST(SUM(q) AS DOUBLE), 6) AS p,
      |    CAST(SUM(q) AS BIGINT) AS q
      |  FROM li GROUP BY 1, 2),
      |base AS (
      |  SELECT part, p AS p0, q AS q0 FROM grid
      |  WHERE month = (SELECT MIN(month) FROM grid)),
      |joined AS (
      |  SELECT g.month, g.p, g.q, b.p0, b.q0
      |  FROM grid g JOIN base b USING (part)),
      |tot AS (
      |  SELECT *,
      |    CAST(SUM(CAST(p0 * q0 AS DECIMAL(38,12)))
      |      OVER (PARTITION BY month) AS DOUBLE) AS tot0,
      |    CAST(SUM(CAST(p * q AS DECIMAL(38,12)))
      |      OVER (PARTITION BY month) AS DOUBLE) AS tott
      |  FROM joined),
      |terms AS (
      |  SELECT month,
      |    0.5 * (p0 * q0 / tot0 + p * q / tott) * ln(p / p0) AS lnterm,
      |    p * sqrt(CAST(q0 * q AS DOUBLE)) AS wnum,
      |    p0 * sqrt(CAST(q0 * q AS DOUBLE)) AS wden
      |  FROM tot)
      |SELECT month, COUNT(*) AS n_parts,
      |  round(exp(CAST(SUM(CAST(lnterm AS DECIMAL(38,12))) AS DOUBLE)), 6)
      |    AS tornqvist,
      |  round(CAST(SUM(CAST(wnum AS DECIMAL(38,12))) AS DOUBLE)
      |    / CAST(SUM(CAST(wden AS DECIMAL(38,12))) AS DOUBLE), 6) AS walsh
      |FROM terms GROUP BY month ORDER BY month""".stripMargin

  /** Mixture sequential probability ratio test (mSPRT) with
    * always-valid p-values (Johari, Koomen, Pekelis & Walsh 2017,
    * "Peeking at A/B tests") — the anytime-valid experiment readout
    * that lets a dashboard be refreshed daily WITHOUT inflating the
    * false-positive rate, unlike [[StatOps.abLift]]'s fixed-horizon
    * z-test. Day-by-day cumulative enrollment/conversion counts per
    * arm (first-event day enrolls a user, first qualifying purchase
    * converts — both exact integers via grid-sized cumulative
    * windows); per day the normal-approximation mixture likelihood
    * ratio with mixture variance τ² = 10⁻⁴:
    * ln Λ_n = ½·ln(V/(V+τ²)) + δ̂²τ²/(2V(V+τ²)), V = p̂(1−p̂)(1/n_a+1/n_b);
    * the always-valid p is p_n = min_{m≤n} min(1, 1/Λ_m) =
    * exp(−max_{m≤n} max(0, ln Λ_m)) — a running MAX over doubles
    * (order-free), in log space so Λ can never overflow. Days where
    * V = 0 (no conversions yet, or all users converted) are excluded
    * relationally on both engines before any division.
    *
    * Scale shape: one fact hash aggregate to users, one to the
    * (arm × day) delta grid, cumulative windows over the calendar
    * grid — the fact is touched once; everything after is
    * calendar-sized.
    */
  def sprtAb(s: SparkSession, dir: String): DataFrame = {
    val Tau2 = 0.0001
    val users = Tables.t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(min(col("ts").cast(DateType)).as("enroll_day"),
        min(when(col("event_type") === "purchase" &&
            get_json_object(col("props"), "$.k").cast(IntegerType) >= 95,
          col("ts").cast(DateType))).as("conv_day"))
      .select(when(col("user_id") % 2 === 0, "A").otherwise("B").as("arm"),
        col("enroll_day"), col("conv_day"))
    val days = Tables.t(s, dir, "events")
      .select(col("ts").cast(DateType).as("day")).distinct()
    val enr = users.groupBy(col("enroll_day"))
      .agg(sum(when(col("arm") === "A", 1L).otherwise(0L)).as("ea"),
        sum(when(col("arm") === "B", 1L).otherwise(0L)).as("eb"))
    val cnv = users.filter(col("conv_day").isNotNull)
      .groupBy(col("conv_day"))
      .agg(sum(when(col("arm") === "A", 1L).otherwise(0L)).as("ca"),
        sum(when(col("arm") === "B", 1L).otherwise(0L)).as("cb"))
    val wCum = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val grid = days
      .join(enr, col("day") === col("enroll_day"), "left")
      .join(cnv, col("day") === col("conv_day"), "left")
      .select(col("day"), coalesce(col("ea"), lit(0L)).as("ea"),
        coalesce(col("eb"), lit(0L)).as("eb"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
      .select(col("day"),
        sum(col("ea")).over(wCum).as("n_a"),
        sum(col("eb")).over(wCum).as("n_b"),
        sum(col("ca")).over(wCum).as("conv_a"),
        sum(col("cb")).over(wCum).as("conv_b"))
      .filter(col("n_a") > 0 && col("n_b") > 0 &&
        col("conv_a") + col("conv_b") > 0 &&
        col("conv_a") + col("conv_b") < col("n_a") + col("n_b"))
    val pa = col("conv_a").cast(DoubleType) / col("n_a").cast(DoubleType)
    val pb = col("conv_b").cast(DoubleType) / col("n_b").cast(DoubleType)
    val pp = (col("conv_a") + col("conv_b")).cast(DoubleType) /
      (col("n_a") + col("n_b")).cast(DoubleType)
    val vn = pp * (lit(1.0) - pp) *
      (lit(1.0) / col("n_a").cast(DoubleType) +
        lit(1.0) / col("n_b").cast(DoubleType))
    val lnLam = lit(0.5) * log(col("v") / (col("v") + lit(Tau2))) +
      col("delta") * col("delta") * lit(Tau2) /
        (lit(2.0) * col("v") * (col("v") + lit(Tau2)))
    grid
      .withColumn("delta", pa - pb)
      .withColumn("v", vn)
      .withColumn("lnl", lnLam)
      .withColumn("run",
        max(greatest(col("lnl"), lit(0.0))).over(wCum))
      .select(col("day"), col("n_a"), col("conv_a"), col("n_b"),
        col("conv_b"),
        round(col("delta"), 6).as("delta"),
        round(col("lnl"), 6).as("ln_lambda"),
        round(exp(-col("run")), 6).as("p_always_valid"))
      .orderBy(col("day"))
  }

  val sprtAbOracle: String =
    """WITH users AS (
      |  SELECT user_id,
      |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
      |    MIN(CAST(ts AS DATE)) AS enroll_day,
      |    MIN(CASE WHEN event_type = 'purchase'
      |      AND TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) >= 95
      |      THEN CAST(ts AS DATE) END) AS conv_day
      |  FROM events GROUP BY 1, 2),
      |days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
      |enr AS (
      |  SELECT enroll_day AS day,
      |    SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS ea,
      |    SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS eb
      |  FROM users GROUP BY 1),
      |cnv AS (
      |  SELECT conv_day AS day,
      |    SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS ca,
      |    SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS cb
      |  FROM users WHERE conv_day IS NOT NULL GROUP BY 1),
      |grid AS (
      |  SELECT d.day,
      |    CAST(SUM(COALESCE(e.ea, 0)) OVER w AS BIGINT) AS n_a,
      |    CAST(SUM(COALESCE(e.eb, 0)) OVER w AS BIGINT) AS n_b,
      |    CAST(SUM(COALESCE(c.ca, 0)) OVER w AS BIGINT) AS conv_a,
      |    CAST(SUM(COALESCE(c.cb, 0)) OVER w AS BIGINT) AS conv_b
      |  FROM days d
      |  LEFT JOIN enr e ON d.day = e.day
      |  LEFT JOIN cnv c ON d.day = c.day
      |  WINDOW w AS (ORDER BY d.day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |f AS (
      |  SELECT * FROM grid
      |  WHERE n_a > 0 AND n_b > 0 AND conv_a + conv_b > 0
      |    AND conv_a + conv_b < n_a + n_b),
      |stats AS (
      |  SELECT day, n_a, n_b, conv_a, conv_b,
      |    CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
      |      - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS delta,
      |    (CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
      |      * (1.0 - CAST(conv_a + conv_b AS DOUBLE)
      |        / CAST(n_a + n_b AS DOUBLE))
      |      * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)) AS v
      |  FROM f),
      |lam AS (
      |  SELECT *,
      |    0.5 * ln(v / (v + 0.0001))
      |      + delta * delta * 0.0001 / (2.0 * v * (v + 0.0001)) AS lnl
      |  FROM stats),
      |run AS (
      |  SELECT *,
      |    MAX(GREATEST(lnl, 0.0)) OVER (ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r
      |  FROM lam)
      |SELECT day, n_a, conv_a, n_b, conv_b,
      |  round(delta, 6) + 0.0 AS delta,
      |  round(lnl, 6) + 0.0 AS ln_lambda,
      |  round(exp(-r), 6) AS p_always_valid
      |FROM run ORDER BY day""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("ops_isotonic_calib", isotonicCalib, Some(isotonicCalibOracle)),
    QueryDef("ops_kendall_tau", kendallTau, Some(kendallTauOracle)),
    QueryDef("ops_nelson_aalen", nelsonAalen, Some(nelsonAalenOracle)),
    QueryDef("ops_tornqvist_index", tornqvistIndex,
      Some(tornqvistIndexOracle)),
    QueryDef("ops_sprt_ab", sprtAb, Some(sprtAbOracle)),
  )
}
