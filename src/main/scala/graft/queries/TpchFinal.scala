package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fifth (final) relational tranche — the last five TPC-H query shapes
  * the suite didn't yet carry, adapted to this star schema the same way
  * TpchMore adapts Q2/Q9/Q17 (no `partsupp`, `l_shipmode`,
  * `l_receiptdate`, or complaint-text supplier names — each query keeps
  * its SHAPE, substituting the nearest relation the schema supports):
  *
  *  - Q6:  single-table scan-aggregate with three range predicates —
  *         the pushdown showcase (every filter reaches the parquet
  *         scan; no join, no shuffle beyond the final partial-agg);
  *  - Q8:  market share of one supplier nation inside one region's
  *         demand for a part type, by order year (eight-relation star;
  *         the share is a conditional sum over the same joined rows);
  *  - Q12: conditional priority counts per line class after a
  *         fact-to-fact join (`l_returnflag` stands in for the missing
  *         `l_shipmode`; CASE-sums, not two filtered joins);
  *  - Q16: distinct-supplier counts per part attribute for a size
  *         IN-list, excluding a NOT-IN supplier set (negative balance
  *         stands in for the complaints LIKE — 6 suppliers at sf0.01,
  *         so the exclusion provably bites);
  *  - Q20: suppliers who dominate the supply of any prefix-named part
  *         in one year (shipped share > 1/2 — the `ps_availqty > 0.5 ×
  *         qty` correlated threshold re-expressed over the lineitem
  *         stand-in), filtered to one nation.
  *
  * Money/quantity math in DECIMAL end-to-end; fractional thresholds
  * are integer-multiply rephrasings (`2 × sq > tot`, not
  * `sq > 0.5 × tot`) so boundary rows resolve identically on both
  * engines.
  */
object TpchFinal {

  private def dec(c: Column) = c.cast(DecimalType(18, 2))
  private def qty(c: Column) = c.cast(DecimalType(12, 2))
  private def dsc(c: Column) = c.cast(DecimalType(4, 2))
  private def one = lit(1).cast(DecimalType(3, 2))

  /** Q6 shape: forecast revenue change — one scan, three range
    * predicates, one aggregate. All three predicates push to the
    * parquet reader (PushedFilters), the scan reads exactly the four
    * referenced columns, and the only exchange is the single-row
    * partial→final aggregate. The discount band compares in
    * DECIMAL(4,2) so 0.05/0.07 are exact on both engines.
    */
  def q6Forecast(s: SparkSession, dir: String): DataFrame = {
    val lo = to_timestamp(lit("1996-01-01"))
    val hi = to_timestamp(lit("1997-01-01"))
    Tables.t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi &&
        dsc(col("l_discount")).between(lit(0.05).cast(DecimalType(4, 2)),
          lit(0.07).cast(DecimalType(4, 2))) &&
        col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice")) * dsc(col("l_discount")))
        .cast(DoubleType).as("revenue"))
  }

  private val q6Oracle: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |  * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND CAST(l_discount AS DECIMAL(4,2)) BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  /** Q8 shape: NATION_3's share of EUROPE customers' STANDARD-part
    * revenue, by order year. The eight-relation star joins the fact
    * once; the share is a conditional sum over those same rows (CASE
    * inside the aggregate, not a second scan or a self-join). Both
    * sums stay DECIMAL; only the final ratio divides, in DOUBLE,
    * rounded to 6 so the last-ulp of the division can't flip the hash.
    * Dims broadcast; the fact shuffles once per join key.
    */
  def q8MarketShare(s: SparkSession, dir: String): DataFrame = {
    val vol = dec(col("l_extendedprice")) * (one - dec(col("l_discount")))
    val custRegion = Tables.t(s, dir, "customer")
      .join(broadcast(Tables.t(s, dir, "nation")
          .withColumnRenamed("n_name", "cn_name")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.t(s, dir, "region").filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val suppNation = Tables.t(s, dir, "supplier")
      .join(broadcast(Tables.t(s, dir, "nation").select(
          col("n_nationkey").as("sn_key"), col("n_name").as("sn_name"))),
        col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("sn_name"))
    Tables.t(s, dir, "lineitem")
      .join(Tables.t(s, dir, "part").filter(col("p_type") === "STANDARD")
          .select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(custRegion, col("o_custkey") === col("c_custkey"))
      .join(suppNation, col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast(LongType).as("o_year"))
      .agg(
        sum(when(col("sn_name") === "NATION_3", vol).otherwise(lit(0).cast(DecimalType(18, 2))))
          .as("nation_vol"),
        sum(vol).as("total_vol"))
      .select(col("o_year"),
        round(col("nation_vol").cast(DoubleType) / col("total_vol").cast(DoubleType), 6)
          .as("mkt_share"))
      .orderBy(col("o_year"))
  }

  private val q8Oracle: String =
    """SELECT EXTRACT(year FROM o_orderdate) AS o_year,
      |  round(
      |    CAST(SUM(CASE WHEN sn.n_name = 'NATION_3'
      |      THEN CAST(l_extendedprice AS DECIMAL(18,2))
      |        * (1.00 - CAST(l_discount AS DECIMAL(18,2)))
      |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
      |    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |        * (1.00 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE),
      |    6) AS mkt_share
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation cn ON c_nationkey = cn.n_nationkey
      |JOIN region ON cn.n_regionkey = r_regionkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation sn ON s_nationkey = sn.n_nationkey
      |WHERE p_type = 'STANDARD' AND r_name = 'EUROPE'
      |GROUP BY 1 ORDER BY o_year""".stripMargin

  /** Q12 shape: per line-class counts of high- vs low-priority orders
    * shipped in one year (`l_returnflag` ∈ {A, R} stands in for the
    * two ship modes). One fact-to-fact join, then CASE-sums — the
    * priority split costs zero extra scans or joins; the year filter
    * and flag IN-list push to the lineitem scan.
    */
  def q12PriorityClass(s: SparkSession, dir: String): DataFrame = {
    val lo = to_timestamp(lit("1996-01-01"))
    val hi = to_timestamp(lit("1997-01-01"))
    val high = col("o_orderpriority") === "1-URGENT" || col("o_orderpriority") === "2-HIGH"
    Tables.t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi &&
        col("l_returnflag").isin("A", "R"))
      .join(Tables.t(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("l_returnflag"))
  }

  private val q12Oracle: String =
    """SELECT l_returnflag,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_returnflag IN ('A', 'R')
      |GROUP BY 1 ORDER BY l_returnflag""".stripMargin

  /** Q16 shape: how many distinct suppliers serve each (brand, type,
    * size) bucket, for an IN-list of sizes, excluding one brand, one
    * type, and a NOT-IN supplier set (negative account balance — the
    * complaints stand-in; non-empty, so the anti join provably
    * removes rows). The part-supplier relation is the DISTINCT
    * (l_partkey, l_suppkey) projection of the fact — the partsupp
    * stand-in. The NOT IN compiles to a broadcast anti join (keys are
    * non-null by schema); the distinct count is one keyed aggregate.
    */
  def q16SupplierCnt(s: SparkSession, dir: String): DataFrame = {
    val rel = Tables.t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val complaints = Tables.t(s, dir, "supplier")
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    val parts = Tables.t(s, dir, "part")
      .filter(col("p_brand") =!= "Brand#23" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    // no broadcast hint on the exclusion set: it is data-bounded (a
    // predicate over supplier, not a constant-size dim), so the join
    // strategy stays with AQE — at sf-test it broadcasts anyway
    rel
      .join(complaints, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(parts, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  private val q16Oracle: String =
    """SELECT p_brand, p_type, p_size,
      |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) rel
      |JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#23' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** Q20 shape: suppliers in NATION_7 who dominated the 1996 supply of
    * any 'small'-prefixed part — shipped share strictly over one half.
    * The classic nested-IN + correlated-availqty threshold
    * decorrelates into: prefix-scoped per-(part, supplier) quantity
    * sums, the per-part total as a WINDOW over that aggregate (one
    * exchange, no self-join), `2 × sq > tot`, then a semi join into
    * supplier. The name-prefix IN-list scopes the fact before any
    * aggregation; nation broadcasts.
    */
  def q20DominantSupp(s: SparkSession, dir: String): DataFrame = {
    val lo = to_timestamp(lit("1996-01-01"))
    val hi = to_timestamp(lit("1997-01-01"))
    val smallParts = Tables.t(s, dir, "part")
      .filter(col("p_name").startsWith("small")).select(col("p_partkey"))
    val shipped = Tables.t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .join(smallParts, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(qty(col("l_quantity"))).as("sq"))
    val pw = Window.partitionBy(col("l_partkey"))
    val dominant = shipped
      .withColumn("tot", sum(col("sq")).over(pw))
      .filter(col("sq") * lit(2) > col("tot"))
      .select(col("l_suppkey")).distinct()
    Tables.t(s, dir, "supplier")
      .join(broadcast(Tables.t(s, dir, "nation").filter(col("n_name") === "NATION_7")),
        col("s_nationkey") === col("n_nationkey"))
      .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_name"), col("s_acctbal"))
      .orderBy(col("s_name"))
  }

  private val q20Oracle: String =
    """WITH shipped AS (
      |  SELECT l_partkey, l_suppkey,
      |    SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sq
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_name LIKE 'small%'
      |    AND l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1997-01-01'
      |  GROUP BY 1, 2),
      |dominant AS (
      |  SELECT DISTINCT l_suppkey FROM shipped s
      |  WHERE s.sq * 2 > (SELECT SUM(s2.sq) FROM shipped s2
      |                    WHERE s2.l_partkey = s.l_partkey))
      |SELECT s_name, s_acctbal
      |FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name = 'NATION_7'
      |  AND s_suppkey IN (SELECT l_suppkey FROM dominant)
      |ORDER BY s_name""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q6_forecast", q6Forecast, Some(q6Oracle)),
    QueryDef("q8_market_share", q8MarketShare, Some(q8Oracle)),
    QueryDef("q12_priority_class", q12PriorityClass, Some(q12Oracle)),
    QueryDef("q16_supplier_cnt", q16SupplierCnt, Some(q16Oracle)),
    QueryDef("q20_dominant_supp", q20DominantSupp, Some(q20Oracle)),
  )
}
