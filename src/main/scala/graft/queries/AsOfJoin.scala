package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each left row the latest right row with
  * right.time <= left.time per key — the standard enrichment for
  * event streams against slowly-changing state (DuckDB/kdb ASOF JOIN;
  * Spark has no built-in).
  *
  * Implemented by COMPOSITION (the preference order's first rung): tag
  * and union both sides, then a single struct-valued `last(ignoreNulls)
  * over (partition by key order by (time, side) rows unbounded
  * preceding)` window (atomic — all payload fields come from the same
  * right row), keep the left rows. Exactly ONE shuffle on the key —
  * the same cost as the sort-merge pass a native as-of operator would
  * do, with no range-explosion join (a naive `left.t >= right.t` theta
  * join materializes the full history per event before aggregation;
  * this never forms those rows).
  *
  * Tie semantics: a right row AT the left timestamp is visible
  * (`<=`), enforced by ordering right (side=0) before left (side=1)
  * within equal times. The right side must be unique per (key, time) —
  * pre-aggregate it — or the pick among equals is nondeterministic
  * (same caveat as DuckDB ASOF).
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, key: String, leftTime: String,
      rightTime: String, payload: Seq[String]): DataFrame = {
    val leftTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    // payloads travel as ONE struct so the as-of fill is atomic: with
    // per-column last(ignoreNulls) windows, a right row holding a null
    // payload field would have that field back-filled from an OLDER
    // right row, fabricating a state that never existed
    val rightTagged = right.select(
      col(key), col(rightTime).as("__t"), lit(0).as("__side"),
      struct(payload.map(col): _*).as("__p"))
    val unioned = rightTagged.unionByName(leftTagged, allowMissingColumns = true)
    val w = Window.partitionBy(col(key)).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
    payload.foldLeft(filled)((df, p) => df.withColumn(p, col("__p").getField(p)))
      .filter(col("__side") === 1)
      .drop("__t", "__side", "__p")
  }

  /** The NATIVE as-of path — [[graft.plans.AsOfJoinPlan]] planned by
    * [[graft.plans.AsOfJoinStrategy]] into the sort-merge
    * [[graft.plans.AsOfJoinExec]] (each side shuffles only itself;
    * O(1) merge state; left order preserved). Same key-name-on-both-
    * sides contract and `<=` tie semantics as [[asOf]] — the spec
    * proves row-level equivalence, and `j3_asof_native` gates this
    * exec against DuckDB's own ASOF LEFT JOIN.
    */
  def nativeAsOf(left: DataFrame, right: DataFrame, key: String, leftTime: String,
      rightTime: String, payload: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    graft.functions.VectorFunctions.register(spark) // idempotent; adds the strategy
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    // binding is BY NAME on the analyzed plans, so it must be strict:
    // a duplicate name would silently bind the first match, and a
    // self-join (sides sharing attribute lineage, hence exprIds) would
    // hand the custom binary node conflicting ids that the analyzer's
    // dedup pass is not guaranteed to rewrite for an unknown node type
    require(lp.outputSet.intersect(rp.outputSet).isEmpty,
      "as-of sides share attribute lineage (self-join): re-create one side " +
        "with fresh attributes (e.g. spark.createDataFrame(df.rdd, df.schema)) " +
        s"— shared: ${lp.outputSet.intersect(rp.outputSet).map(_.name).mkString(", ")}")
    def attr(pl: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) = {
      val ms = pl.output.filter(_.name == n)
      require(ms.size == 1,
        s"column $n must bind exactly once, found ${ms.size} of " +
          s"[${pl.output.map(_.name).mkString(", ")}]")
      ms.head
    }
    val (lk, rk) = (attr(lp, key), attr(rp, key))
    val (lt, rt) = (attr(lp, leftTime), attr(rp, rightTime))
    // the merge compares raw ordinal values — mixed physical types
    // (date int vs timestamp long) would compare garbage, so insist
    // the caller aligns them (no silent coercion in a custom node)
    require(lk.dataType == rk.dataType,
      s"as-of key types differ: ${lk.dataType} vs ${rk.dataType}")
    require(lt.dataType == rt.dataType,
      s"as-of time types differ: ${lt.dataType} vs ${rt.dataType}")
    org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      graft.plans.AsOfJoinPlan(lp, rp, lk, rk, lt, rt, payload.map(attr(rp, _))))
  }

  /** j3: every event enriched with the user's latest order state as of
    * the event date (orders pre-aggregated per (custkey, date); right
    * side restricted to custkey < 100 so the no-history null path is
    * real, not vacuous).
    */
  private[graft] def j3Sides(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val orders = Tables.t(s, dir, "orders")
      .filter(col("o_custkey") < 100)
      .groupBy(col("o_custkey").as("user_id"), col("o_orderdate").as("order_date"))
      .agg(max(col("o_totalprice")).as("last_order_price"))
      .withColumn("last_order_date", col("order_date"))
    val events = Tables.t(s, dir, "events")
      .select(col("event_id"), col("user_id"), to_date(col("ts")).as("event_date"))
    (events, orders)
  }

  def eventsAsOfOrders(s: SparkSession, dir: String): DataFrame = {
    val (events, orders) = j3Sides(s, dir)
    asOf(events, orders, "user_id", "event_date", "order_date",
      Seq("last_order_date", "last_order_price"))
      .select(col("event_id"), col("user_id"), col("event_date"),
        col("last_order_date"), col("last_order_price"))
      .orderBy(col("event_id"))
  }

  /** The same j3 query through the native exec — gated against the
    * identical DuckDB ASOF oracle, so the custom operator's output is
    * pinned cell-for-cell by an independent engine's native ASOF.
    */
  def eventsAsOfOrdersNative(s: SparkSession, dir: String): DataFrame = {
    val (events, orders) = j3Sides(s, dir)
    // align the time types explicitly (event_date is DATE, order_date
    // TIMESTAMP_NTZ — both midnights, so `<=` semantics are unchanged;
    // the composition path gets the same coercion implicitly from
    // unionByName)
    val eventsTs = events.withColumn("event_ts",
      col("event_date").cast(org.apache.spark.sql.types.TimestampNTZType))
    nativeAsOf(eventsTs, orders, "user_id", "event_ts", "order_date",
      Seq("last_order_date", "last_order_price"))
      .select(col("event_id"), col("user_id"), col("event_date"),
        col("last_order_date"), col("last_order_price"))
      .orderBy(col("event_id"))
  }

  val eventsAsOfOrdersOracle: String =
    """WITH od AS (
      |  SELECT o_custkey AS user_id, o_orderdate AS order_date,
      |    MAX(o_totalprice) AS last_order_price
      |  FROM orders WHERE o_custkey < 100 GROUP BY 1, 2),
      |ev AS (
      |  SELECT event_id, user_id,
      |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS event_date
      |  FROM events)
      |SELECT ev.event_id, ev.user_id, ev.event_date,
      |  od.order_date AS last_order_date, od.last_order_price
      |FROM ev ASOF LEFT JOIN od
      |  ON ev.user_id = od.user_id AND od.order_date <= ev.event_date
      |ORDER BY event_id""".stripMargin

  // splits the testdata's staleness range for real: events sit in
  // 2024-01, the as-of-matched order dates in 1998-10..2001-07, so
  // 8500 days (≈ back to late 2000) nulls ~30% of matched states and
  // keeps the rest — either extreme would gate the operator vacuously
  private val ToleranceDays = 8500

  /** As-of with a MAX-STALENESS tolerance — the feature-store variant:
    * state older than [[ToleranceDays]] at event time is as good as no
    * state (a model must not train on a stale feature as if it were
    * current). Runs over the NATIVE sort-merge exec ([[nativeAsOf]] —
    * measured ~35% under the union+window composition at both growth
    * scales, so the tolerance rides the cheaper operator); the
    * staleness bound is a post-projection either way, and it nulls
    * BOTH payload fields together (a half-nulled state row would
    * fabricate a feature vector that never existed).
    */
  def eventsAsOfOrdersTolerance(s: SparkSession, dir: String): DataFrame = {
    val fresh = col("last_order_date") >=
      (col("event_date").cast(org.apache.spark.sql.types.TimestampNTZType)
        - expr(s"INTERVAL $ToleranceDays DAY"))
    val (events, orders) = j3Sides(s, dir)
    val eventsTs = events.withColumn("event_ts",
      col("event_date").cast(org.apache.spark.sql.types.TimestampNTZType))
    nativeAsOf(eventsTs, orders, "user_id", "event_ts", "order_date",
      Seq("last_order_date", "last_order_price"))
      .select(col("event_id"), col("user_id"), col("event_date"),
        when(fresh, col("last_order_date")).as("last_order_date"),
        when(fresh, col("last_order_price")).as("last_order_price"))
      .orderBy(col("event_id"))
  }

  val eventsAsOfOrdersToleranceOracle: String =
    s"""WITH od AS (
       |  SELECT o_custkey AS user_id, o_orderdate AS order_date,
       |    MAX(o_totalprice) AS last_order_price
       |  FROM orders WHERE o_custkey < 100 GROUP BY 1, 2),
       |ev AS (
       |  SELECT event_id, user_id,
       |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS event_date
       |  FROM events),
       |base AS (
       |  SELECT ev.event_id, ev.user_id, ev.event_date,
       |    od.order_date AS last_order_date, od.last_order_price
       |  FROM ev ASOF LEFT JOIN od
       |    ON ev.user_id = od.user_id AND od.order_date <= ev.event_date)
       |SELECT event_id, user_id, event_date,
       |  CASE WHEN last_order_date >= CAST(event_date AS TIMESTAMP)
       |      - INTERVAL $ToleranceDays DAY THEN last_order_date END AS last_order_date,
       |  CASE WHEN last_order_date >= CAST(event_date AS TIMESTAMP)
       |      - INTERVAL $ToleranceDays DAY THEN last_order_price END AS last_order_price
       |FROM base ORDER BY event_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("j3_asof_join", eventsAsOfOrders, Some(eventsAsOfOrdersOracle)),
    QueryDef("j3_asof_native", eventsAsOfOrdersNative, Some(eventsAsOfOrdersOracle)),
    QueryDef("j5_asof_tolerance", eventsAsOfOrdersTolerance,
      Some(eventsAsOfOrdersToleranceOracle)),
  )
}
