package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Third tranche of relational coverage: the TPC-H subquery shapes the
  * reference's SQL surface implies but rounds 1-6 didn't exercise —
  * EXISTS / NOT EXISTS predicate subqueries (declared with the Dataset
  * subquery API and decorrelated by Catalyst's
  * RewritePredicateSubquery into semi/anti joins), an uncorrelated
  * scalar subquery in a HAVING-style predicate, an outer join with a
  * join-level (not WHERE-level) predicate, and IN-with-HAVING.
  *
  * Scale notes: every EXISTS/NOT EXISTS here decorrelates to a hash
  * semi/anti join keyed on the order key — one shuffle each, no
  * per-row re-scans (asserted in SubqueriesSpec). The q11 global-total
  * scalar subquery is a one-row aggregate evaluated once and broadcast
  * into the predicate, not recomputed per group. Money math runs in
  * DECIMAL so thresholds compare exactly on both engines — no
  * double-ulp boundary rows.
  */
object Subqueries {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))
  private def one = lit(1).cast(DecimalType(3, 2))

  /** TPC-H Q4-shaped: orders in a quarter having at least one line
    * shipped after the order date — a correlated EXISTS declared as a
    * subquery (`Dataset.exists()` + `.outer()` correlation marks);
    * Catalyst rewrites it to a left semi join on l_orderkey with the
    * l_shipdate > o_orderdate condition inside the join.
    */
  def q4ExistsPriority(s: SparkSession, dir: String): DataFrame = {
    val lo = to_timestamp(lit("1996-01-01"))
    val hi = to_timestamp(lit("1996-04-01"))
    val ord = Tables.t(s, dir, "orders").as("o")
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
    val hasLate = Tables.t(s, dir, "lineitem").as("l")
      .where(col("l.l_orderkey") === col("o.o_orderkey").outer() &&
        col("l.l_shipdate") > col("o.o_orderdate").outer())
      .exists()
    ord.where(hasLate)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  private val q4Oracle: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-04-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q11-shaped: supplier nations whose revenue share exceeds a
    * fixed fraction of the global total. The threshold is an
    * UNCORRELATED scalar subquery (one-row aggregate, evaluated once);
    * all sums stay in DECIMAL and the 4% threshold is phrased as
    * `val * 25 > total` (an exact integer multiply — multiplying the
    * wide total by 0.04 would force a scale-reduction round that the
    * two engines are not guaranteed to perform identically), so the
    * row set is identical on both engines even for groups sitting at
    * the boundary.
    */
  def q11ValueShare(s: SparkSession, dir: String): DataFrame = {
    val rev = dec(col("l_extendedprice")) * (one - dec(col("l_discount")))
    val byNation = Tables.t(s, dir, "lineitem")
      .join(Tables.t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey"))
      .agg(sum(rev).as("val"))
    val total = byNation.select(sum(col("val")).as("t"))
    byNation
      .where(col("val") * lit(25) > total.scalar())
      .join(broadcast(Tables.t(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      // cents round IN DECIMAL before the double cast: the scale-4
      // sum's unscaled int would pass 2^53 at ~100× this corpus (the
      // ops_bartlett conversion-divergence class); decimal round()
      // matches across engines where a decimal down-CAST does not
      // (DuckDB truncates those)
      .select(col("n_name"),
        round(col("val"), 2).cast(DoubleType).as("value"))
      .orderBy(col("value").desc, col("n_name"))
  }

  private val q11Oracle: String =
    """WITH sv AS (
      |  SELECT s_nationkey,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |        * (1.00 - CAST(l_discount AS DECIMAL(18,2)))) AS val
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  GROUP BY s_nationkey)
      |SELECT n_name, CAST(round(val, 2) AS DOUBLE) AS value
      |FROM sv JOIN nation ON s_nationkey = n_nationkey
      |WHERE val * 25 > (SELECT SUM(val) FROM sv)
      |ORDER BY value DESC, n_name""".stripMargin

  /** TPC-H Q13-shaped order-count distribution: LEFT OUTER join with
    * the filter in the JOIN condition (customers with zero qualifying
    * orders must survive with count 0), then a second aggregation over
    * the first's result — the classic two-level "histogram of group
    * sizes" shape.
    */
  def q13OrderDist(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.t(s, dir, "customer")
    val ord = Tables.t(s, dir, "orders")
    cust.join(ord,
        col("c_custkey") === col("o_custkey") &&
          col("o_orderpriority") =!= "1-URGENT",
        "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  private val q13Oracle: String =
    """SELECT c_count, COUNT(*) AS custdist FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q18-shaped large-order lookup: IN-with-HAVING expressed as
    * an aggregate-then-join (the decorrelated form Catalyst would
    * produce anyway), DECIMAL-exact quantity threshold, fully
    * deterministic top-100 (unique o_orderkey tie-break).
    */
  def q18LargeOrders(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_quantity"))).as("sum_qty"))
      .filter(col("sum_qty") > lit(BigDecimal("250")))
    Tables.t(s, dir, "orders")
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_totalprice").cast(DoubleType).as("total_price"),
        col("sum_qty").cast(DoubleType).as("sum_qty"))
      .orderBy(col("total_price").desc, col("o_orderkey"))
      .limit(100)
  }

  private val q18Oracle: String =
    """SELECT c_name, c_custkey, o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
      |  CAST(o_totalprice AS DOUBLE) AS total_price,
      |  CAST(sum_qty AS DOUBLE) AS sum_qty
      |FROM orders
      |JOIN (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
      |      FROM lineitem GROUP BY l_orderkey
      |      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250) big
      |  ON o_orderkey = big.l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY total_price DESC, o_orderkey LIMIT 100""".stripMargin

  /** TPC-H Q21-shaped "sole failing supplier": EXISTS (another supplier
    * contributed to the order) AND NOT EXISTS (another supplier also
    * returned lines) — both declared as correlated predicate
    * subqueries over the same fact table and decorrelated by Catalyst
    * into one semi and one anti hash join on the order key.
    */
  def q21SoleSupplier(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.t(s, dir, "lineitem")
    val base = li.as("l1")
      .filter(col("l1.l_returnflag") === "R")
      .join(Tables.t(s, dir, "orders").filter(col("o_orderstatus") === "F"),
        col("l1.l_orderkey") === col("o_orderkey"))
    val otherSupplier = li.as("l2")
      .where(col("l2.l_orderkey") === col("l1.l_orderkey").outer() &&
        col("l2.l_suppkey") =!= col("l1.l_suppkey").outer())
      .exists()
    val otherReturned = li.as("l3")
      .where(col("l3.l_orderkey") === col("l1.l_orderkey").outer() &&
        col("l3.l_suppkey") =!= col("l1.l_suppkey").outer() &&
        col("l3.l_returnflag") === "R")
      .exists()
    base.where(otherSupplier && !otherReturned)
      .join(Tables.t(s, dir, "supplier"), col("l1.l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  private val q21Oracle: String =
    """SELECT s_name, COUNT(*) AS numwait
      |FROM lineitem l1
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |JOIN supplier ON s_suppkey = l1.l_suppkey
      |WHERE l1.l_returnflag = 'R' AND o_orderstatus = 'F'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q4_exists_priority", q4ExistsPriority, Some(q4Oracle)),
    QueryDef("q11_value_share", q11ValueShare, Some(q11Oracle)),
    QueryDef("q13_order_dist", q13OrderDist, Some(q13Oracle)),
    QueryDef("q18_large_orders", q18LargeOrders, Some(q18Oracle)),
    QueryDef("q21_sole_supplier", q21SoleSupplier, Some(q21Oracle)),
  )
}
