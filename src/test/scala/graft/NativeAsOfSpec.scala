package graft

import graft.queries.AsOfJoin
import org.apache.spark.sql.functions._

/** The native whole-operator as-of join ([[graft.plans.AsOfJoinExec]])
  * against its composition twin and its declared physical contract.
  */
class NativeAsOfSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("native as-of equals the union+window composition row-for-row (sf0.01)") {
    val native = AsOfJoin.eventsAsOfOrdersNative(spark, dir).collect().map(_.toString)
    val comp = AsOfJoin.eventsAsOfOrders(spark, dir).collect().map(_.toString)
    assert(native.length > 0 && native.sameElements(comp))
  }

  test("physical contract: AsOfJoin node, per-side exchange+sort, no union/window") {
    val plan = AsOfJoin.eventsAsOfOrdersNative(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin "), plan.take(800))
    // each side shuffles only itself on its key — the design point vs
    // the composition (which co-shuffles the union)
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning(user_id")) === 2)
    assert(!plan.contains("Union"), "native path must not union the sides")
    assert(!plan.contains("RunningWindowFunction") && !plan.contains("Window "),
      "native path must not fall back to the window composition")
  }

  test("tie inclusive, later rows invisible, no-history nulls, null left time nulls") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (1L, 1L, ts("2024-01-02 00:00:00")),  // exact tie with state@01-02
      (2L, 1L, ts("2024-01-03 00:00:00")),  // between states
      (3L, 2L, ts("2024-01-01 00:00:00")),  // key with no history
      (4L, 1L, null.asInstanceOf[Timestamp]), // null time → no match
      (5L, 3L, ts("2024-01-01 00:00:00"))   // key entirely absent on right
    ).toDF("event_id", "k", "t")
    val right = Seq(
      (1L, ts("2024-01-02 00:00:00"), "a"),
      (1L, ts("2024-01-04 00:00:00"), "b"), // in the future of every left row
      (2L, ts("2024-06-01 00:00:00"), "z")  // future-only history
    ).toDF("k", "t", "state")
    val got = AsOfJoin.nativeAsOf(left, right, "k", "t", "t", Seq("state"))
      .select(col("event_id"), col("state")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got === Map(
      1L -> Some("a"), // <= is inclusive
      2L -> Some("a"), // 01-04 not yet visible
      3L -> None,      // only future history
      4L -> None,      // null left time matches nothing
      5L -> None,      // no history at all
    ))
  }

  test("mixed time types are rejected loudly, not compared as garbage") {
    val (events, orders) = AsOfJoin.j3Sides(spark, "/root/testdata/sf0.001")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.nativeAsOf(events, orders, "user_id", "event_date", "order_date",
        Seq("last_order_price"))
    }
    assert(e.getMessage.contains("time types differ"))
  }

  test("ambiguous column names are rejected, not silently first-match bound") {
    import spark.implicits._
    val left = Seq((1L, 2L)).toDF("k", "t")
    val dup = Seq((1L, 2L, "a")).toDF("k", "t", "state")
      .select(col("k"), col("t"), col("state"), lit("b").as("state"))
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.nativeAsOf(left, dup, "k", "t", "t", Seq("state"))
    }
    assert(e.getMessage.contains("must bind exactly once"))
  }

  test("self-join lineage (shared exprIds) is rejected with a fix hint") {
    import spark.implicits._
    val df = Seq((1L, 2L, "a")).toDF("k", "t", "state")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.nativeAsOf(df, df, "k", "t", "t", Seq("state"))
    }
    assert(e.getMessage.contains("share attribute lineage"))
  }

  test("the tolerance variant rides the native exec, not the composition") {
    val plan = AsOfJoin.eventsAsOfOrdersTolerance(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin "), plan.take(800))
    assert(!plan.contains("Union"), "tolerance must not fall back to the union+window path")
  }
}
