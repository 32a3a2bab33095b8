package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DuckDB-gated batch executions of the streaming transforms: the same
  * logical operators [[graft.streaming.EventsStream]] runs as a stream
  * (event-time window bucketing, per-type aggregation) run here in
  * batch over `events.parquet`, so the driver's oracle gates the
  * streaming SEMANTICS — StreamingSpec covers the runtime behaviors
  * (watermark emission, state eviction, exactly-once) that batch can't.
  *
  * Sums go through DECIMAL so the cross-engine hash compare is exact
  * (the streaming job itself sums doubles; aggregation math is not the
  * property under test — bucketing is).
  */
object StreamingGates {

  /** 5-minute event-time tumbling buckets per event_type — the exact
    * grouping expression of EventsStream.windowedCounts.
    */
  def windowedAgg(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "events")
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("total_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))
      .orderBy(col("window_start"), col("event_type"))

  // time_bucket produces the same epoch-aligned 5-minute buckets as
  // Spark's window(); the oracle reconstructs start/end explicitly.
  val windowedAggOracle: String =
    """SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS window_start,
      | time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) + INTERVAL '5 minutes' AS window_end,
      | event_type, COUNT(*) AS n_events,
      | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY 1, 2, 3
      |ORDER BY window_start, event_type""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("st_windowed_agg", windowedAgg, Some(windowedAggOracle)),
  )
}
