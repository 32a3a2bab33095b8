package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fourth relational tranche: the remaining TPC-H query shapes, adapted
  * to this star schema (the testdata has no `partsupp`, `l_shipmode`,
  * or `c_phone`, so Q2/Q9/Q22 substitute the nearest relation the
  * schema supports while keeping each query's SHAPE — the thing the
  * optimizer and the scale design care about):
  *
  *  - Q2:  min-cost supplier per part inside a region (correlated-min
  *         semantics, decorrelated into one per-part aggregate);
  *  - Q9:  profit by nation × order-year across a five-table star;
  *  - Q10: top returned-revenue customers (join → agg → top-k);
  *  - Q15: top supplier by windowed revenue via an uncorrelated scalar
  *         MAX subquery (the "revenue view" shape);
  *  - Q17: small-quantity parts vs 20% of their own average quantity
  *         (correlated AVG, phrased multiplicatively so the threshold
  *         compares exactly in DECIMAL on both engines);
  *  - Q19: disjunctive brand/size/quantity predicates (OR-of-ANDs)
  *         with the implied per-side envelopes pre-pushed;
  *  - Q22: positive-balance customers idle since a cutoff
  *         (uncorrelated scalar AVG threshold + anti join).
  *
  * Money math stays in DECIMAL end-to-end and every threshold is an
  * integer-multiply rephrasing of the fractional original, so boundary
  * rows resolve identically on both engines.
  */
object TpchMore {

  private def dec(c: Column) = c.cast(DecimalType(18, 2))
  private def qty(c: Column) = c.cast(DecimalType(12, 2))
  private def one = lit(1).cast(DecimalType(3, 2))

  /** Q2 shape: for LARGE parts of size <= 10, the EUROPE supplier(s)
    * whose best offer equals the part's best regional offer. "Offer" =
    * MIN line price per (part, supplier) — the partsupp stand-in this
    * schema supports. The classic correlated-min subquery decorrelates
    * into one per-part MIN over the region-scoped offers, joined back:
    * two keyed aggregates + broadcast dims, no per-row re-scan.
    */
  def q2MinCostSupp(s: SparkSession, dir: String): DataFrame = {
    val offers = Tables.t(s, dir, "lineitem")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(dec(col("l_extendedprice"))).as("min_price"))
    val euroSupp = Tables.t(s, dir, "supplier")
      .join(broadcast(Tables.t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.t(s, dir, "region").filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val parts = Tables.t(s, dir, "part")
      .filter(col("p_size") <= 10 && col("p_type") === "LARGE")
      .select(col("p_partkey"), col("p_name"))
    // scope offers to the filtered parts BEFORE the per-part min: the
    // min is per-part, so restricting parts first is loss-less and at
    // scale skips aggregating offers for parts the query never reads
    val euroOffers = offers
      .join(parts, col("l_partkey") === col("p_partkey"))
      .join(euroSupp, col("l_suppkey") === col("s_suppkey"))
    // per-part regional best as a WINDOW min, not groupBy+self-join:
    // the join form re-executes the whole offers subtree for the `best`
    // side (no exchange reuse — the aggregate diverges the plans); the
    // window is one exchange on l_partkey over a single computation
    val bw = org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))
    euroOffers
      .withColumn("best_price", min(col("min_price")).over(bw))
      .filter(col("min_price") === col("best_price"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"),
        col("min_price").cast(DoubleType).as("min_price"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
  }

  private val q2Oracle: String =
    """WITH offers AS (
      |  SELECT l_partkey, l_suppkey,
      |    MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS min_price
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
      |  CAST(o.min_price AS DOUBLE) AS min_price
      |FROM offers o
      |JOIN part p ON o.l_partkey = p.p_partkey
      |JOIN supplier s ON o.l_suppkey = s.s_suppkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |WHERE p.p_size <= 10 AND p.p_type = 'LARGE' AND r.r_name = 'EUROPE'
      |  AND o.min_price = (
      |    SELECT MIN(o2.min_price) FROM offers o2
      |    JOIN supplier s2 ON o2.l_suppkey = s2.s_suppkey
      |    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
      |    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      |    WHERE o2.l_partkey = o.l_partkey AND r2.r_name = 'EUROPE')
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey""".stripMargin

  /** Q9 shape: profit by (supplier nation, order year) across
    * lineitem × orders × supplier × nation × part. Profit =
    * price × (1 − discount − tax) in DECIMAL (the schema has no
    * ps_supplycost to subtract). Five-table star: fact shuffles on its
    * join keys, nation broadcasts, the filtered part dim stays small.
    */
  def q9ProfitMap(s: SparkSession, dir: String): DataFrame = {
    val amount = dec(col("l_extendedprice")) *
      (one - dec(col("l_discount")) - dec(col("l_tax")))
    Tables.t(s, dir, "lineitem")
      .join(Tables.t(s, dir, "part").filter(col("p_type") === "PROMO").select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.t(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).cast(LongType).as("o_year"))
      .agg(sum(amount).cast(DoubleType).as("sum_profit"))
      .orderBy(col("n_name"), col("o_year").desc)
  }

  private val q9Oracle: String =
    """SELECT n_name, EXTRACT(year FROM o_orderdate) AS o_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1.00 - CAST(l_discount AS DECIMAL(18,2))
      |            - CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_profit
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_type = 'PROMO'
      |GROUP BY 1, 2 ORDER BY n_name, o_year DESC""".stripMargin

  /** Q10 shape: top-20 customers by returned-line revenue in a
    * half-year window — fact join → per-customer aggregate → global
    * top-k (a single 20-row final sort after the keyed agg).
    */
  def q10ReturnedTop(s: SparkSession, dir: String): DataFrame = {
    val lo = to_timestamp(lit("1996-01-01"))
    val hi = to_timestamp(lit("1996-07-01"))
    val rev = dec(col("l_extendedprice")) * (one - dec(col("l_discount")))
    Tables.t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      .join(Tables.t(s, dir, "orders")
          .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum(rev).cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  private val q10Oracle: String =
    """SELECT c_custkey, c_name, c_acctbal, n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1.00 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-07-01'
      |GROUP BY 1, 2, 3, 4
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** Q15 shape: supplier(s) achieving the maximum quarterly revenue.
    * The "revenue view" is one keyed aggregate; the threshold is an
    * uncorrelated scalar MAX over that same aggregate (`.scalar()` —
    * evaluated once, compared in exact DECIMAL, so ties surface as
    * multiple rows rather than an arbitrary pick).
    */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val lo = to_timestamp(lit("1996-01-01"))
    val hi = to_timestamp(lit("1996-04-01"))
    val rev = Tables.t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .groupBy(col("l_suppkey"))
      .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount")))).as("total_revenue"))
    rev.where(col("total_revenue") === rev.select(max(col("total_revenue"))).scalar())
      .join(Tables.t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_revenue").cast(DoubleType).as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  private val q15Oracle: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |      * (1.00 - CAST(l_discount AS DECIMAL(18,2)))) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY 1)
      |SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** Q17 shape: yearly revenue forfeited by small-quantity lines of one
    * brand — lines with quantity under 20% of their part's average.
    * The correlated AVG decorrelates into one per-part (sum, count)
    * aggregate, scoped to the brand's parts before aggregating (the
    * avg is per part, so the scope is loss-less); the 20% threshold is
    * `5 × qty × count < sum` — all-integer/DECIMAL math, no fractional
    * rounding for engines to disagree on.
    */
  def q17SmallQty(s: SparkSession, dir: String): DataFrame = {
    val brandParts = Tables.t(s, dir, "part")
      .filter(col("p_brand") === "Brand#23").select(col("p_partkey"))
    val li = Tables.t(s, dir, "lineitem")
      .join(brandParts, col("l_partkey") === col("p_partkey"))
    // the correlated per-part (sum, count) as WINDOW aggregates over
    // the same rows — the groupBy+join form scans and joins the
    // brand-scoped fact twice (the aggregate side defeats exchange
    // reuse); the window is one exchange on l_partkey over one scan
    val pw = org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))
    li.withColumn("sum_qty", sum(qty(col("l_quantity"))).over(pw))
      .withColumn("cnt", count(lit(1)).over(pw))
      .filter(qty(col("l_quantity")) * lit(5) * col("cnt") < col("sum_qty"))
      .agg((sum(dec(col("l_extendedprice"))).cast(DoubleType) / lit(7.0)).as("avg_yearly"))
  }

  private val q17Oracle: String =
    """WITH pq AS (
      |  SELECT l_partkey AS pk,
      |    SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty, COUNT(*) AS cnt
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_brand = 'Brand#23' GROUP BY 1)
      |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN pq ON l_partkey = pk
      |WHERE p_brand = 'Brand#23'
      |  AND CAST(l_quantity AS DECIMAL(12,2)) * 5 * cnt < sum_qty""".stripMargin

  /** Q19 shape: disjunctive brand × size × quantity predicates. The OR
    * spans both sides of the join, so neither engine can push it
    * whole; the implied per-side ENVELOPES (the union of each arm's
    * brand/size domain on part, the quantity range on lineitem) are
    * stated explicitly so the scans prune before the join and the
    * exact OR only re-checks survivors.
    */
  def q19Disjunctive(s: SparkSession, dir: String): DataFrame = {
    val parts = Tables.t(s, dir, "part")
      .filter((col("p_brand") === "Brand#12" && col("p_size").between(1, 5)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 15)))
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val arm = (brand: String, sizeHi: Int, qLo: Int, qHi: Int) =>
      col("p_brand") === brand && col("p_size").between(1, sizeHi) &&
        col("l_quantity").between(qLo, qHi)
    Tables.t(s, dir, "lineitem")
      .filter(col("l_quantity").between(1, 30))
      .join(parts, col("l_partkey") === col("p_partkey"))
      .filter(arm("Brand#12", 5, 1, 11) || arm("Brand#23", 10, 10, 20) ||
        arm("Brand#34", 15, 20, 30))
      .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
        .cast(DoubleType).as("revenue"))
  }

  private val q19Oracle: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |  * (1.00 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
      |       AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
      |       AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** Q22 shape: per-segment count and balance of above-average-balance
    * customers with no order since the cutoff. The average is an
    * uncorrelated scalar over positive balances, phrased as
    * `balance × n > total` (exact DECIMAL × integer — no division);
    * "idle" is an anti join against the cutoff-filtered orders.
    */
  def q22IdleCustomers(s: SparkSession, dir: String): DataFrame = {
    val cutoff = to_timestamp(lit("1999-01-01"))
    val pos = Tables.t(s, dir, "customer").filter(col("c_acctbal") > 0)
      .agg(sum(qty(col("c_acctbal"))).as("tot"), count(lit(1)).as("n"))
    val active = Tables.t(s, dir, "orders")
      .filter(col("o_orderdate") >= cutoff).select(col("o_custkey"))
    Tables.t(s, dir, "customer")
      .join(active, col("c_custkey") === col("o_custkey"), "left_anti")
      .where(qty(col("c_acctbal")) * pos.select(col("n")).scalar() >
        pos.select(col("tot")).scalar())
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("numcust"),
        sum(qty(col("c_acctbal"))).cast(DoubleType).as("totacctbal"))
      .orderBy(col("c_mktsegment"))
  }

  private val q22Oracle: String =
    """WITH pos AS (
      |  SELECT SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS tot, COUNT(*) AS n
      |  FROM customer WHERE c_acctbal > 0)
      |SELECT c_mktsegment, COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
      |FROM customer c
      |WHERE CAST(c_acctbal AS DECIMAL(12,2)) * (SELECT n FROM pos) > (SELECT tot FROM pos)
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |    WHERE o.o_custkey = c.c_custkey
      |      AND o.o_orderdate >= TIMESTAMP '1999-01-01')
      |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q2_min_cost_supp", q2MinCostSupp, Some(q2Oracle)),
    QueryDef("q9_profit_map", q9ProfitMap, Some(q9Oracle)),
    QueryDef("q10_returned_top", q10ReturnedTop, Some(q10Oracle)),
    QueryDef("q15_top_supplier", q15TopSupplier, Some(q15Oracle)),
    QueryDef("q17_small_qty", q17SmallQty, Some(q17Oracle)),
    QueryDef("q19_disjunctive", q19Disjunctive, Some(q19Oracle)),
    QueryDef("q22_idle_customers", q22IdleCustomers, Some(q22Oracle)),
  )
}
