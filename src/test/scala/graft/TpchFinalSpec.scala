package graft

import graft.queries.TpchFinal

/** Plan-shape proofs for the final TPC-H tranche — the properties that
  * matter at 100 TB, beyond the DuckDB value oracles:
  * q6 is a pure pushed-down scan-aggregate, q16's NOT-IN compiles to an
  * anti join (never a per-row subquery or BNLJ), and q20's correlated
  * per-part threshold is one window exchange, not a self-join.
  */
class TpchFinalSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  // the q16 exclusion set (negative balances) and q20's NATION_7
  // dominant set are empty at sf0.001 — the bite-proofs run at the
  // driver's own gate scale, where both are non-vacuous
  private val gateDir = "/root/testdata/sf0.01"

  test("q6: all three predicates push to the scan; only referenced columns read") {
    val plan = TpchFinal.q6Forecast(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan.take(800))
    // date + quantity range filters are parquet-pushable; the scan must
    // carry them rather than re-filtering the full table
    assert(plan.contains("l_shipdate"), "shipdate range must reach the scan")
    assert(plan.contains("IsNotNull(l_quantity)") || plan.contains("LessThan(l_quantity"),
      "quantity bound must reach the scan")
    // projection pruning: exactly the four referenced fact columns
    val read = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    Seq("l_shipdate", "l_quantity", "l_extendedprice", "l_discount").foreach(c =>
      assert(read.contains(c), s"$c missing from ReadSchema: $read"))
    Seq("l_orderkey", "l_partkey", "l_returnflag").foreach(c =>
      assert(!read.contains(c), s"unreferenced $c read by the q6 scan: $read"))
    // no join anywhere — single-table aggregate
    assert(!plan.contains("Join"), "q6 must not join")
  }

  test("q8: market share is in [0,1] and computed from ONE pass (no duplicate fact scan)") {
    val rows = TpchFinal.q8MarketShare(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[Double]("mkt_share")
      assert(s >= 0.0 && s <= 1.0, r.toString)
    }
    // conditional-sum form: exactly one lineitem scan in the plan
    val plan = TpchFinal.q8MarketShare(spark, dir).queryExecution.executedPlan.toString
    val liScans = plan.linesIterator.count(l => l.contains("lineitem") && l.contains("Scan"))
    assert(liScans == 1, s"expected one fact scan, got $liScans")
  }

  test("q12: high + low counts partition the lines (CASE-sum, not two joins)") {
    val rows = TpchFinal.q12PriorityClass(spark, dir).collect()
    assert(rows.nonEmpty)
    val plan = TpchFinal.q12PriorityClass(spark, dir).queryExecution.executedPlan.toString
    // exactly ONE join node: the CASE-split must not become a second
    // join (and `=== 1`, not `<= 1`, keeps the count non-vacuous
    // against plan-format drift)
    val joins = plan.linesIterator.count(_.contains("Join"))
    assert(joins === 1, s"q12 must join exactly once, got $joins:\n${plan.take(1200)}")
  }

  test("q16: NOT-IN exclusion compiles to an anti join and provably removes suppliers") {
    val plan = TpchFinal.q16SupplierCnt(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"expected anti join:\n${plan.take(1200)}")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "NOT-IN must stay an equi anti join")
    // the exclusion set is non-empty at every sf (negative balances are
    // seeded in the generator), so the anti join must actually bite:
    // sum of distinct counts strictly below the unexcluded variant
    val s = spark
    import org.apache.spark.sql.functions._
    val excluded = TpchFinal.q16SupplierCnt(s, gateDir)
      .agg(sum("supplier_cnt")).head.getLong(0)
    val rel = Tables.t(s, gateDir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val unexcluded = rel
      .join(Tables.t(s, gateDir, "part")
          .filter(col("p_brand") =!= "Brand#23" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("c"))
      .agg(sum("c")).head.getLong(0)
    assert(excluded < unexcluded,
      s"exclusion set must remove rows: excluded=$excluded unexcluded=$unexcluded")
  }

  test("q20: correlated per-part total is a window over one aggregate, not a self-join") {
    val plan = TpchFinal.q20DominantSupp(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"expected window threshold:\n${plan.take(1200)}")
    // the shipped aggregate must appear once: a groupBy+join rewrite of
    // the correlated subquery would scan/aggregate the scoped fact twice
    val aggs = plan.linesIterator.count(l =>
      l.contains("HashAggregate") && l.contains("sum") && l.contains("l_quantity"))
    assert(aggs <= 2, s"shipped (partial+final) aggregated more than once:\n${plan.take(1500)}")
    // dominance is strict majority — non-vacuous at the gate scale
    assert(TpchFinal.q20DominantSupp(spark, gateDir).collect().nonEmpty)
  }
}
