package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Core relational operator coverage (scan/filter/project, joins of all
  * types, hash aggregation, windows, set ops, rollup) over the shared
  * TPC-H-ish testdata.
  *
  * Float discipline: money-ish doubles are cast to DECIMAL(18,2) before
  * summation so results are exact, deterministic under any partitioning /
  * aggregation order, and bit-identical to the DuckDB oracle; final
  * values are cast back to DOUBLE for a stable cross-engine schema.
  *
  * Scale notes: aggregations are partial→final hash aggs (one shuffle on
  * the group keys); genuinely small dims (region, nation) carry explicit
  * `broadcast` hints; fact-fact joins are left to Catalyst/AQE which
  * shuffle-hash or sort-merge on the join key and handle skew at runtime.
  */
object Relational {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def one: Column = lit(1).cast(DecimalType(3, 2)) // exact 1.00

  /** TPC-H Q1-shaped pricing summary: full-scan + 2-key hash agg. */
  def q1Pricing(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.t(s, dir, "lineitem")
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast(DoubleType).as("sum_base_price"),
        // round the scale-4/6 money sums to cents IN DECIMAL before
        // the double cast: a scale-6 sum's unscaled int passes 2^53 at
        // ~10× this corpus, where DuckDB's int128→double step goes
        // inexact while Spark's BigDecimal conversion stays correctly
        // rounded (the ops_bartlett divergence class) — at scale 2 the
        // conversion is exact to ~10000×. Decimal round() (NOT a
        // decimal down-CAST, which DuckDB truncates) rounds half away
        // from zero identically on both engines.
        round(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount")))), 2)
          .cast(DoubleType).as("sum_disc_price"),
        round(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))) * (one + dec(col("l_tax")))), 2)
          .cast(DoubleType).as("sum_charge"),
        (sum(dec(col("l_quantity"))).cast(DoubleType) / count(lit(1))).as("avg_qty"),
        (sum(dec(col("l_discount"))).cast(DoubleType) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"),
      )
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1PricingOracle: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      | CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1.00 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_disc_price,
      | CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1.00 - CAST(l_discount AS DECIMAL(18,2))) * (1.00 + CAST(l_tax AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_charge,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      | CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      | COUNT(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-shaped: selective dim filter → two fact joins → agg → top-k. */
  def q3TopOrders(s: SparkSession, dir: String): DataFrame = {
    val cutoff = to_timestamp(lit("1998-01-01"))
    val cust = Tables.t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.t(s, dir, "orders").filter(col("o_orderdate") < cutoff)
    val li = Tables.t(s, dir, "lineitem").filter(col("l_shipdate") > cutoff)
    // cust is a 1/5 slice of a fact-scale table — no broadcast hint;
    // AQE picks broadcast at small SF and shuffle join at scale.
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
        .cast(DoubleType).as("revenue"))
      .select(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3TopOrdersOracle: String =
    """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1.00 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |  AND l_shipdate > TIMESTAMP '1998-01-01'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** TPC-H Q5-shaped: 6-way star join, revenue by nation. */
  def q5RegionVolume(s: SparkSession, dir: String): DataFrame = {
    val region = Tables.t(s, dir, "region").filter(col("r_name") === "ASIA")
    val nation = Tables.t(s, dir, "nation")
    val cust = Tables.t(s, dir, "customer")
    val ord = Tables.t(s, dir, "orders")
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1999-01-01")))
    val li = Tables.t(s, dir, "lineitem")
    val supp = Tables.t(s, dir, "supplier")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5RegionVolumeOracle: String =
    """SELECT n_name,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1.00 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** Semi join (EXISTS): orders having at least one returned lineitem. */
  def semiJoin(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.t(s, dir, "orders")
    val returned = Tables.t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
    ord.join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), col("o_orderstatus"))
      .orderBy(col("o_orderkey"))
  }

  val semiJoinOracle: String =
    """SELECT o_orderkey, o_orderstatus FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |ORDER BY o_orderkey""".stripMargin

  /** Anti join (NOT EXISTS): customers with no orders in a recent window.
    * The window keeps the surviving set non-empty (~600 rows at sf0.01)
    * so the oracle comparison exercises real anti-join output — an
    * unfiltered version returns 0 rows on this data and proves nothing.
    */
  def antiJoin(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.t(s, dir, "customer")
    val recent = Tables.t(s, dir, "orders")
      .filter(col("o_orderdate") >= to_timestamp(lit("2001-01-01")))
    cust.join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  val antiJoinOracle: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |  AND o_orderdate >= TIMESTAMP '2001-01-01')
      |ORDER BY c_custkey""".stripMargin

  /** Left outer join against a filtered dim, null side defaulted —
    * the J1 shape (002_views_techno.sql:41-43 + :36). The dim is ~90% of
    * `customer` (itself fact-scale at 100 TB), so no broadcast hint —
    * AQE broadcasts at small SF and shuffle-joins at scale.
    */
  def leftJoinDim(s: SparkSession, dir: String): DataFrame = {
    val dim = Tables.t(s, dir, "customer")
      .filter(col("c_acctbal") > 0)
      .select(col("c_custkey"), col("c_name"))
    Tables.t(s, dir, "orders")
      .join(dim, col("o_custkey") === col("c_custkey"), "left")
      .select(
        col("o_orderkey"),
        coalesce(col("c_name"), lit("")).as("cust_name"),
        col("c_custkey").isNull.as("unmatched"),
      )
      .orderBy(col("o_orderkey"))
  }

  val leftJoinDimOracle: String =
    """SELECT o_orderkey, COALESCE(c_name, '') AS cust_name,
      |  c_custkey IS NULL AS unmatched
      |FROM orders LEFT JOIN
      |  (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 0) d
      |  ON o_custkey = c_custkey
      |ORDER BY o_orderkey""".stripMargin

  /** Ranking window: top-3 orders per customer by totalprice. */
  def windowTopK(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  val windowTopKOracle: String =
    """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  /** BAND (non-equi range) join: facts bucketed against a literal
    * band dimension via `lo <= x < hi` — the lookup-table pattern
    * (price tiers, score bands, SLA buckets) that has no equi-key.
    * The 4-row dimension broadcasts (constant-bounded — PlanAuditSpec
    * whitelist) and the fact streams once through a
    * BroadcastNestedLoopJoin; at any scale this stays one corpus pass,
    * because the nested-loop side is a literal.
    */
  def bandJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bands = Seq(
      (1, 0, 10, "low"), (2, 10, 25, "mid"),
      (3, 25, 40, "high"), (4, 40, 1000, "bulk"),
    ).toDF("band_id", "lo", "hi", "band")
    Tables.t(s, dir, "lineitem")
      .join(broadcast(bands),
        col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
      .groupBy(col("band_id"), col("band"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(dec(col("l_extendedprice"))).cast(DoubleType).as("revenue"),
      )
      .orderBy(col("band_id"))
  }

  val bandJoinOracle: String =
    """WITH bands(band_id, lo, hi, band) AS (VALUES
      |  (1, 0, 10, 'low'), (2, 10, 25, 'mid'),
      |  (3, 25, 40, 'high'), (4, 40, 1000, 'bulk'))
      |SELECT band_id, band, COUNT(*) AS n_items,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN bands ON l_quantity >= lo AND l_quantity < hi
      |GROUP BY band_id, band ORDER BY band_id""".stripMargin

  /** The remaining ranking/distribution window family in one gate:
    * rank, dense_rank, percent_rank, cume_dist, ntile, lag/lead with
    * defaults, first_value over a running frame. Ordering key is the
    * UNIQUE (o_totalprice, o_orderkey) pair so every function is
    * deterministic; percent_rank/cume_dist are exact integer ratios in
    * both engines — round(,6) guards the display anyway.
    */
  def windowRankSuite(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.t(s, dir, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        round(percent_rank().over(w), 6).as("prnk"),
        round(cume_dist().over(w), 6).as("cdist"),
        ntile(4).over(w).as("quartile"),
        lag(col("o_orderkey"), 1, -1L).over(w).as("prev_key"),
        lead(col("o_orderkey"), 1, -1L).over(w).as("next_key"),
        first_value(col("o_orderkey")).over(wRun).as("top_key"),
      )
      .orderBy(col("o_custkey"), col("rnk"))
  }

  val windowRankSuiteOracle: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      | RANK() OVER w AS rnk,
      | DENSE_RANK() OVER w AS drnk,
      | round(PERCENT_RANK() OVER w, 6) AS prnk,
      | round(CUME_DIST() OVER w, 6) AS cdist,
      | NTILE(4) OVER w AS quartile,
      | LAG(o_orderkey, 1, -1) OVER w AS prev_key,
      | LEAD(o_orderkey, 1, -1) OVER w AS next_key,
      | FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
      |   ORDER BY o_totalprice DESC, o_orderkey
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS top_key
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      |ORDER BY o_custkey, rnk""".stripMargin

  /** Running-total window over an ordered event stream, exact decimal. */
  def windowRunningSum(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.t(s, dir, "events")
      .withColumn("running_value", sum(dec(col("value"))).over(w).cast(DoubleType))
      .select(col("user_id"), col("event_id"), col("event_type"), col("running_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val windowRunningSumOracle: String =
    """SELECT user_id, event_id, event_type,
      | CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
      |   PARTITION BY user_id ORDER BY event_id
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
      |FROM events ORDER BY user_id, event_id""".stripMargin

  /** Value-window suite — the navigation functions [[windowRankSuite]]
    * doesn't cover: IGNORE NULLS first/last/nth (last-non-null over a
    * running frame IS forward-fill, the time-series gap-repair
    * primitive), whole-partition last_value via an explicit
    * both-unbounded frame, and lag/lead with defaults and offset 2.
    * Nulls are planted deterministically (every 7th event id) so the
    * ignore-nulls paths are non-vacuous; values pass through unrounded
    * (raw parquet doubles are bit-identical in both engines).
    */
  def windowValueSuite(s: SparkSession, dir: String): DataFrame = {
    val nv = when(pmod(col("event_id"), lit(7)) === 0, lit(null).cast(DoubleType))
      .otherwise(col("value"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.t(s, dir, "events")
      .withColumn("nv", nv)
      .select(
        col("user_id"), col("event_id"), col("nv"),
        first(col("nv"), ignoreNulls = true).over(wRun).as("first_nn"),
        last(col("nv"), ignoreNulls = true).over(wRun).as("ffill"),
        nth_value(col("nv"), 2, ignoreNulls = true).over(wRun).as("nth2_nn"),
        last(col("value")).over(wAll).as("part_last"),
        lag(col("value"), 1, -1.0).over(w).as("lag_def"),
        lead(col("value"), 2).over(w).as("lead2"),
      )
      .orderBy(col("user_id"), col("event_id"))
  }

  val windowValueSuiteOracle: String =
    """WITH e AS (SELECT user_id, event_id, value,
      |  CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS nv FROM events)
      |SELECT user_id, event_id, nv,
      | FIRST_VALUE(nv IGNORE NULLS) OVER wrun AS first_nn,
      | LAST_VALUE(nv IGNORE NULLS) OVER wrun AS ffill,
      | NTH_VALUE(nv, 2 IGNORE NULLS) OVER wrun AS nth2_nn,
      | LAST_VALUE(value) OVER (PARTITION BY user_id ORDER BY event_id
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS part_last,
      | LAG(value, 1, -1.0) OVER (PARTITION BY user_id ORDER BY event_id) AS lag_def,
      | LEAD(value, 2) OVER (PARTITION BY user_id ORDER BY event_id) AS lead2
      |FROM e
      |WINDOW wrun AS (PARTITION BY user_id ORDER BY event_id
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin

  /** UNION / INTERSECT / EXCEPT semantics in one result, tagged per
    * branch. Scale shape: ONE pass over the fact — a conditional flag
    * aggregate per user — then the three set-branches derive from the
    * flags (r1's version re-scanned `events` per branch, 6 scans total).
    * INTERSECT = both flags, EXCEPT = buy and not err, UNION = either.
    */
  def setOps(s: SparkSession, dir: String): DataFrame = {
    val flags = Tables.t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("buy"),
        max(when(col("event_type") === "error", 1).otherwise(0)).as("err"),
      )
    val isBuy = col("buy") === 1
    val isErr = col("err") === 1
    val tags = array(
      when(isBuy && isErr, lit("both")),
      when(isBuy && !isErr, lit("buy_only")),
      when(isBuy || isErr, lit("either")),
    )
    flags
      .select(explode(filter(tags, t => t.isNotNull)).as("op"), col("user_id"))
      .orderBy(col("op"), col("user_id"))
  }

  val setOpsOracle: String =
    """WITH b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
      |     e AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
      |SELECT 'both' AS op, user_id FROM (SELECT user_id FROM b INTERSECT SELECT user_id FROM e)
      |UNION ALL
      |SELECT 'buy_only' AS op, user_id FROM (SELECT user_id FROM b EXCEPT SELECT user_id FROM e)
      |UNION ALL
      |SELECT 'either' AS op, user_id FROM (SELECT user_id FROM b UNION SELECT user_id FROM e)
      |ORDER BY op, user_id""".stripMargin

  /** ROLLUP grouping-sets aggregation with explicit null ordering. */
  def rollupAgg(s: SparkSession, dir: String): DataFrame = {
    Tables.t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("l_quantity"))).cast(DoubleType).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  val rollupAggOracle: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** CUBE grouping-sets (all 4 subsets of the 2 keys) — completes the
    * grouping-sets family next to [[rollupAgg]].
    */
  def cubeAgg(s: SparkSession, dir: String): DataFrame = {
    Tables.t(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("l_extendedprice"))).cast(DoubleType).as("sum_price"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  val cubeAggOracle: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** Explicit GROUPING SETS — deliberately NOT expressible as rollup
    * or cube (it includes the (l_linestatus) set rollup skips and
    * omits (l_returnflag)), with `grouping()` indicator columns: the
    * only way to tell a subtotal row's NULL from a data NULL, which
    * null-ordering alone (the [[rollupAgg]]/[[cubeAgg]] device) cannot.
    */
  def groupingSetsAgg(s: SparkSession, dir: String): DataFrame = {
    Tables.t(s, dir, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping(col("l_returnflag")).cast(LongType).as("g_rf"),
        grouping(col("l_linestatus")).cast(LongType).as("g_ls"),
        count(lit(1)).as("n"),
        sum(dec(col("l_quantity"))).cast(DoubleType).as("sum_qty"))
      .orderBy(col("g_rf"), col("g_ls"),
        col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  val groupingSetsAggOracle: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
      | CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
      | COUNT(*) AS n,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
      |ORDER BY g_rf, g_ls, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** TPC-H Q14-shaped promo revenue share: fact-dim join on partkey +
    * conditional (CASE-guarded) aggregation, decimal-exact. The only
    * query over `part`, and the canonical "conditional numerator /
    * total denominator" shape.
    */
  def q14Promo(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1998-01-01")))
    val part = Tables.t(s, dir, "part")
    val disc = dec(col("l_extendedprice")) * (one - dec(col("l_discount")))
    li.join(part, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        sum(when(col("p_type") === "PROMO", disc).otherwise(lit(0).cast(DecimalType(18, 2))))
          .cast(DoubleType).as("promo_revenue"),
        sum(disc).cast(DoubleType).as("total_revenue"),
        count(lit(1)).as("n_lines"),
      )
      .orderBy(col("p_brand"))
  }

  val q14PromoOracle: String =
    """SELECT p_brand,
      | CAST(SUM(CASE WHEN p_type = 'PROMO'
      |   THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1.00 - CAST(l_discount AS DECIMAL(18,2)))
      |   ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1.00 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue,
      | COUNT(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** Statistical aggregates (moments + correlation) per event_type —
    * one partial→final hash agg with CONSTANT per-group state (each is
    * a few running sums), so the scale posture holds at any group
    * cardinality. Quantiles are deliberately absent here: exact
    * percentile buffers every value per group (unbounded state at
    * 100 TB); the engine's quantile ops are [[Pctl.dist]] (exact,
    * histogram-based, r16) and approx_percentile (t-digest, constant
    * state — accuracy-gated in SkewAsOfSpec since an approximation
    * cannot hash-match an exact oracle). Doubles are
    * rounded to 6dp, which makes merge-order ulp flips of the hash
    * compare vanishingly unlikely (not impossible — only the DECIMAL
    * queries are exact by construction).
    */
  def statsAgg(s: SparkSession, dir: String): DataFrame = {
    Tables.t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(avg(col("value")), 6).as("avg_value"),
        round(stddev_samp(col("value")), 6).as("sd_value"),
        round(var_samp(col("value")), 6).as("var_value"),
        round(corr(col("value"), col("user_id").cast(DoubleType)), 6).as("corr_user"),
      )
      .orderBy(col("event_type"))
  }

  val statsAggOracle: String =
    """SELECT event_type, COUNT(*) AS n,
      | round(AVG(value), 6) AS avg_value,
      | round(STDDEV_SAMP(value), 6) AS sd_value,
      | round(VAR_SAMP(value), 6) AS var_value,
      | round(CORR(value, CAST(user_id AS DOUBLE)), 6) AS corr_user
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Distinct aggregate alongside plain aggregates. */
  def distinctAgg(s: SparkSession, dir: String): DataFrame = {
    Tables.t(s, dir, "lineitem")
      .groupBy(col("l_suppkey"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_lines"),
        sum(dec(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
      )
      .orderBy(col("l_suppkey"))
  }

  val distinctAggOracle: String =
    """SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS n_parts, COUNT(*) AS n_lines,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin

  /** FULL OUTER join: customers against an order aggregate — preserves
    * customers with no orders AND any dangling order keys; null-side
    * handling made explicit with flags. One shuffle on the key, same
    * as inner.
    */
  def fullOuterJoin(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.t(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val ord = Tables.t(s, dir, "orders")
      .filter(col("o_orderdate") >= to_timestamp(lit("1998-06-01")))
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
    cust.join(ord, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        coalesce(col("c_mktsegment"), lit("<none>")).as("mktsegment"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        col("c_custkey").isNull.as("order_only"),
        col("o_custkey").isNull.as("customer_only"),
      )
      .orderBy(col("custkey"))
  }

  val fullOuterJoinOracle: String =
    """WITH o AS (SELECT o_custkey, COUNT(*) AS n_orders FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1998-06-01' GROUP BY o_custkey)
      |SELECT COALESCE(c_custkey, o_custkey) AS custkey,
      |  COALESCE(c_mktsegment, '<none>') AS mktsegment,
      |  COALESCE(n_orders, 0) AS n_orders,
      |  c_custkey IS NULL AS order_only,
      |  o_custkey IS NULL AS customer_only
      |FROM customer FULL OUTER JOIN o ON c_custkey = o_custkey
      |ORDER BY custkey""".stripMargin

  /** RANGE-frame window: per-part rolling revenue over a VALUE range
    * (±5 days around each lineitem's ship epoch-day), not a row count —
    * the frame Spark's rangeBetween expresses and rows-frames cannot.
    */
  def rangeFrameWindow(s: SparkSession, dir: String): DataFrame = {
    val day = floor(unix_micros(col("l_shipdate").cast(TimestampType)) / lit(86400000000L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_partkey")).orderBy(col("ship_day"))
      .rangeBetween(-5, 5)
    Tables.t(s, dir, "lineitem")
      .filter(col("l_partkey") <= 100)
      .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
        day.as("ship_day"), dec(col("l_extendedprice")).as("price"))
      .withColumn("window_revenue",
        sum(col("price")).over(w).cast(DoubleType))
      .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
        col("ship_day"), col("window_revenue"))
      .orderBy(col("l_partkey"), col("ship_day"), col("l_orderkey"), col("l_linenumber"))
  }

  val rangeFrameWindowOracle: String =
    """SELECT l_partkey, l_orderkey, l_linenumber, ship_day,
      |  CAST(SUM(price) OVER (PARTITION BY l_partkey ORDER BY ship_day
      |    RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS DOUBLE) AS window_revenue
      |FROM (SELECT l_partkey, l_orderkey, l_linenumber,
      |    CAST(floor(epoch_us(CAST(l_shipdate AS TIMESTAMP)) / 86400000000) AS BIGINT) AS ship_day,
      |    CAST(l_extendedprice AS DECIMAL(18,2)) AS price
      |  FROM lineitem WHERE l_partkey <= 100)
      |ORDER BY l_partkey, ship_day, l_orderkey, l_linenumber""".stripMargin

  /** Pivot (wide conditional aggregation): quantity by return flag,
    * spread across line statuses. Values are DECLARED (not discovered)
    * so the output schema is static — the scalable form: discovery
    * pivot needs an extra distinct pass and an unbounded column count.
    */
  def pivotAgg(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(sum(dec(col("l_quantity"))).cast(DoubleType))
      .orderBy(col("l_returnflag"))

  val pivotAggOracle: String =
    """SELECT l_returnflag,
      | CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS F,
      | CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS O
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Unpivot (wide → long melt), the inverse reshaping of [[pivotAgg]]:
    * part's two numeric attributes become (metric, value) rows via
    * Spark's native unpivot (Catalyst `Expand` — one scan, row count ×
    * number of measures, no shuffle at all until the output sort).
    */
  def unpivotLong(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "part")
      .select(col("p_partkey"), col("p_size").cast(DoubleType).as("size"),
        col("p_retailprice").cast(DoubleType).as("retailprice"))
      .unpivot(Array(col("p_partkey")), Array(col("size"), col("retailprice")),
        "metric", "value")
      .orderBy(col("p_partkey"), col("metric"))

  val unpivotLongOracle: String =
    """SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS "value" FROM part
      |UNION ALL
      |SELECT p_partkey, 'retailprice', CAST(p_retailprice AS DOUBLE) FROM part
      |ORDER BY p_partkey, metric""".stripMargin

  /** SCD2 interval derivation — the standard slowly-changing-dimension
    * transform: a per-key ordered event/snapshot stream becomes
    * validity intervals via lead() (valid_to = next change's timestamp,
    * NULL = current). Applied to the events table per user; the same
    * shape turns re-ingested dimension snapshots (the artists feed)
    * into bitemporal history.
    *
    * Scale shape: one window pass partitioned by the key — per-key
    * sorts only, the partition count is the user cardinality, no global
    * order anywhere.
    */
  def scd2Intervals(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_id"), col("event_type").as("state"),
        col("ts").as("valid_from"), col("valid_to"))
      .orderBy(col("user_id"), col("valid_from"), col("event_id"))
  }

  val scd2IntervalsOracle: String =
    """SELECT user_id, event_id, event_type AS state,
      |  CAST(ts AS TIMESTAMP) AS valid_from,
      |  LEAD(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id
      |    ORDER BY CAST(ts AS TIMESTAMP), event_id) AS valid_to
      |FROM events
      |ORDER BY user_id, valid_from, event_id""".stripMargin

  /** Per-shard quality binning: ntile quartiles of documents by length
    * WITHIN each source shard (global ntile would need a global sort —
    * per-shard is both the scalable plan and what a sharded corpus
    * wants), with per-bin summary stats. Ties broken by doc_id so the
    * binning is total-ordered and engine-reproducible.
    */
  def qualityBins(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("n_chars"), col("doc_id"))
    Tables.t(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("bin", ntile(4).over(w))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy(col("source"), col("bin"))
  }

  val qualityBinsOracle: String =
    """SELECT source, bin, COUNT(*) AS n_docs,
      |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
      |FROM (SELECT doc_id, source, n_chars,
      |  NTILE(4) OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS bin
      |  FROM documents)
      |GROUP BY source, bin ORDER BY source, bin""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q1_pricing", q1Pricing, Some(q1PricingOracle)),
    QueryDef("q3_top_orders", q3TopOrders, Some(q3TopOrdersOracle)),
    QueryDef("q5_region_volume", q5RegionVolume, Some(q5RegionVolumeOracle)),
    QueryDef("join_semi", semiJoin, Some(semiJoinOracle)),
    QueryDef("join_anti", antiJoin, Some(antiJoinOracle)),
    QueryDef("j1_left_join_dim", leftJoinDim, Some(leftJoinDimOracle)),
    QueryDef("w1_window_topk", windowTopK, Some(windowTopKOracle)),
    QueryDef("w2_running_sum", windowRunningSum, Some(windowRunningSumOracle)),
    QueryDef("w4_rank_suite", windowRankSuite, Some(windowRankSuiteOracle)),
    QueryDef("w5_value_suite", windowValueSuite, Some(windowValueSuiteOracle)),
    QueryDef("j4_band_join", bandJoin, Some(bandJoinOracle)),
    QueryDef("set_ops", setOps, Some(setOpsOracle)),
    QueryDef("rollup_agg", rollupAgg, Some(rollupAggOracle)),
    QueryDef("cube_agg", cubeAgg, Some(cubeAggOracle)),
    QueryDef("grouping_sets_agg", groupingSetsAgg, Some(groupingSetsAggOracle)),
    QueryDef("stats_agg", statsAgg, Some(statsAggOracle)),
    QueryDef("q14_promo", q14Promo, Some(q14PromoOracle)),
    QueryDef("distinct_agg", distinctAgg, Some(distinctAggOracle)),
    QueryDef("dim_scd2", scd2Intervals, Some(scd2IntervalsOracle)),
    QueryDef("ta_quality_bins", qualityBins, Some(qualityBinsOracle)),
    QueryDef("join_full", fullOuterJoin, Some(fullOuterJoinOracle)),
    QueryDef("w3_range_frame", rangeFrameWindow, Some(rangeFrameWindowOracle)),
    QueryDef("pivot_agg", pivotAgg, Some(pivotAggOracle)),
    QueryDef("rel_unpivot", unpivotLong, Some(unpivotLongOracle)),
  )
}
