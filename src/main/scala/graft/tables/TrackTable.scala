package graft.tables

import graft.etl.TemporalFixups
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** K6 — the curated fact table sink, re-expressing the reference's
  * MergeTree layout (001_init_spotify_tracks.sql:20-22):
  * `PARTITION BY toYYYYMM(ingest_ts) ORDER BY (ingest_ts, track_id)`.
  *
  * Spark shape:
  *  - Hive-style directory partitioning on `ingest_month` gives the same
  *    partition pruning ClickHouse gets from its partition key: a filter
  *    on `ingest_month` never touches other months' files.
  *  - `repartitionByRange(ingest_month, ingest_ts, track_id)` +
  *    `sortWithinPartitions` is the MergeTree ORDER BY analogue: rows in
  *    each parquet file are (ingest_ts, track_id)-ordered, so row-group
  *    min/max stats are tight and time-range scans skip row groups.
  *
  * Scale note: range repartitioning (not `repartition(col)`) is what
  * keeps this writable at 100 TB — a single hot month spreads over many
  * range partitions instead of hammering one task, and each task still
  * writes at most a handful of month directories.
  */
object TrackTable {

  val partitionCol = "ingest_month"

  /** Append curated track rows (schema [[graft.schema.Schemas.trackSchema]])
    * as a partitioned, internally-ordered parquet table.
    */
  def append(curated: DataFrame, path: String): Unit =
    curated
      .withColumn(partitionCol, TemporalFixups.toYyyyMm(col("ingest_ts")))
      .repartitionByRange(col(partitionCol), col("ingest_ts"), col("track_id"))
      .sortWithinPartitions(col(partitionCol), col("ingest_ts"), col("track_id"))
      .write
      .mode("append")
      .partitionBy(partitionCol)
      .parquet(path)

  /** Read the table back (partition pruning applies to `ingest_month`
    * filters automatically).
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
