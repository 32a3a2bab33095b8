package graft

import graft.queries.RelationalExt
import org.apache.spark.sql.functions._

class RelationalExtSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("q7 trade flows are symmetric pairs and exclude same-nation trade") {
    val rows = RelationalExt.q7NationTrade(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("supp_nation") !== r.getAs[String]("cust_nation"))
    }
  }

  test("correlated scalar subquery is decorrelated to aggregate+join, not a per-row subquery") {
    val tablesBefore = spark.catalog.listTables().collect().map(_.name).toSet
    val df = RelationalExt.scalarSubquery(spark, dir)
    // pure expression-level subquery: building the query must not
    // register anything in the catalog (VERDICT r6 #5)
    assert(spark.catalog.listTables().collect().map(_.name).toSet === tablesBefore)
    val plan = df.queryExecution.executedPlan.toString
    // decorrelation leaves a join against a per-key aggregate; a
    // surviving per-row scalar subquery would appear as a Subquery /
    // ScalarSubquery node in the executed plan
    assert(!plan.contains("ScalarSubquery"), plan.linesIterator.take(5).mkString("\n"))
    assert(plan.contains("Join"), "expected the decorrelated aggregate join")
    // semantics: each surviving row carries its order's min price
    val got = df.groupBy(col("l_orderkey"))
      .agg(min(col("price")).as("p"), max(col("price")).as("q"))
      .filter(col("p") =!= col("q")).count()
    assert(got === 0L, "all rows per order must equal the order minimum")
  }

  test("percentiles are ordered and bracketed by min/max") {
    RelationalExt.percentileSuite(spark, dir).collect().foreach { r =>
      val (mn, p25, p50, p90, mx) = (r.getAs[Double]("p_min"), r.getAs[Double]("p25"),
        r.getAs[Double]("p50"), r.getAs[Double]("p90"), r.getAs[Double]("p_max"))
      assert(mn <= p25 && p25 <= p50 && p50 <= p90 && p90 <= mx, r.toString)
    }
  }

  test("LATERAL LIMIT subquery decorrelates to WindowGroupLimit, matches the window form") {
    val df = RelationalExt.lateralTopN(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the engine feature under gate: no per-outer-row subquery loop —
    // ONE group-limit window (map-side Partial before the shuffle)
    assert(plan.contains("WindowGroupLimit"), plan.linesIterator.take(8).mkString("\n"))
    assert(!plan.contains("CartesianProduct"), "lateral must not fall back to a product")
    val got = df.collect().map(r => (r.getString(0), r.getLong(1)))
    // reference: hand-written row_number window over the same tables
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_nationkey")).orderBy(col("c_acctbal").desc, col("c_custkey"))
    val want = Tables.t(spark, dir, "customer")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .join(Tables.t(spark, dir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_custkey"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got.toSet === want)
    assert(got.groupBy(_._1).values.forall(_.length <= 2), "at most 2 per nation")
  }
}
