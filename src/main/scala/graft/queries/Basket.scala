package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Market-basket affinity: association rules (support, confidence,
  * lift) over brands co-purchased within an order — the co-occurrence
  * analysis behind "bought together" recommendations and assortment
  * planning. The directed self-join emits both rule directions in one
  * pass.
  *
  * Scale shape: the item relation is DISTINCT (order, brand) — bounded
  * by orders × |brand vocabulary|, and the self-join key is the order,
  * so pair volume is Σ b_o·(b_o−1) with b_o ≤ 25 brands per order: a
  * per-key-bounded quadratic, never corpus². The brand marginals are a
  * |vocabulary|-row relation joined onto the pair counts, and the
  * order count is the same bounded driver scalar as tfidf's N. All
  * three metrics are single divisions of exact integers, so round(,6)
  * is engine-stable.
  */
object Basket {

  private val MinPairOrders = 5L

  def assocRules(s: SparkSession, dir: String): DataFrame = {
    val items = Tables.t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
      .join(Tables.t(s, dir, "part").select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("okey"), col("p_brand").as("brand"))
      .distinct()
    // basket count folded into the plan as a broadcast 1-row relation
    // (VERDICT r13 #5) — the query is one lazy plan, no driver job
    val n = items.agg(countDistinct(col("okey")).cast(DoubleType).as("n_baskets"))
    val marginals = items.groupBy(col("brand")).agg(count(lit(1)).as("n_brand"))
    val a = items.select(col("okey"), col("brand").as("ante"))
    val b = items.select(col("okey"), col("brand").as("cons"))
    val pairs = a.join(b, "okey")
      .filter(col("ante") =!= col("cons"))
      .groupBy(col("ante"), col("cons")).agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= MinPairOrders)
    pairs
      .join(marginals.withColumnRenamed("brand", "ante")
        .withColumnRenamed("n_brand", "n_ante"), "ante")
      .join(marginals.withColumnRenamed("brand", "cons")
        .withColumnRenamed("n_brand", "n_cons"), "cons")
      .crossJoin(broadcast(n))
      .select(col("ante"), col("cons"), col("n_both"),
        round(col("n_both").cast(DoubleType) / col("n_baskets"), 6).as("support"),
        round(col("n_both").cast(DoubleType) / col("n_ante"), 6).as("confidence"),
        round(col("n_both").cast(DoubleType) * col("n_baskets")
          / (col("n_ante") * col("n_cons")), 6).as("lift"))
      .orderBy(col("ante"), col("cons"))
  }

  val assocRulesOracle: String =
    s"""WITH items AS (SELECT DISTINCT l_orderkey AS okey, p_brand AS brand
       |  FROM lineitem JOIN part ON l_partkey = p_partkey),
       |n AS (SELECT CAST(COUNT(DISTINCT okey) AS DOUBLE) AS n FROM items),
       |marg AS (SELECT brand, COUNT(*) AS n_brand FROM items GROUP BY 1),
       |pairs AS (SELECT a.brand AS ante, b.brand AS cons, COUNT(*) AS n_both
       |  FROM items a JOIN items b ON a.okey = b.okey AND a.brand <> b.brand
       |  GROUP BY 1, 2 HAVING COUNT(*) >= $MinPairOrders)
       |SELECT p.ante, p.cons, p.n_both,
       |  round(CAST(p.n_both AS DOUBLE) / n.n, 6) AS support,
       |  round(CAST(p.n_both AS DOUBLE) / ma.n_brand, 6) AS confidence,
       |  round(CAST(p.n_both AS DOUBLE) * n.n / (ma.n_brand * mc.n_brand), 6) AS lift
       |FROM pairs p
       |JOIN marg ma ON p.ante = ma.brand
       |JOIN marg mc ON p.cons = mc.brand
       |CROSS JOIN n
       |ORDER BY p.ante, p.cons""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("bk_assoc_rules", assocRules, Some(assocRulesOracle)),
  )
}
