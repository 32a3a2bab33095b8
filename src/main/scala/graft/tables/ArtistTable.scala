package graft.tables

import graft.etl.TemporalFixups
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The artist-DIMENSION table sink — the reference's missing
  * `spotify_artists` DDL (002_views_techno.sql:14 reads a table no
  * migration creates; the feed exists in
  * airflow/dags/spotify_artist_genres_to_kafka.py:101-108), closed here
  * explicitly at the storage layer (SURVEY §7.1).
  *
  * Same MergeTree-analogue layout as [[TrackTable]]: Hive partitioning
  * on `ingest_month` (dimension snapshots arrive per ingest run, and
  * latest-state reads prune to recent months), range-repartitioned and
  * ordered by (ingest_ts, artist_id) within files so argMax-style
  * latest-state scans get tight row-group stats.
  *
  * Scale note: a dimension is re-ingested in full snapshots, so the
  * table grows with snapshots × catalog; `vArtistLatest` over the
  * read-back table is a partial→final hash agg on artist_id — one
  * shuffle regardless of snapshot count, and month pruning bounds the
  * scan when the caller knows the snapshot horizon.
  */
object ArtistTable {

  val partitionCol = "ingest_month"

  /** Append curated artist rows (schema
    * [[graft.schema.Schemas.artistSchema]]) as a partitioned,
    * internally-ordered parquet dimension table.
    */
  def append(curated: DataFrame, path: String): Unit =
    curated
      .withColumn(partitionCol, TemporalFixups.toYyyyMm(col("ingest_ts")))
      .repartitionByRange(col(partitionCol), col("ingest_ts"), col("artist_id"))
      .sortWithinPartitions(col(partitionCol), col("ingest_ts"), col("artist_id"))
      .write
      .mode("append")
      .partitionBy(partitionCol)
      .parquet(path)

  /** Read the dimension back (partition pruning applies to
    * `ingest_month` filters automatically); drops the layout column so
    * the shape round-trips to [[graft.schema.Schemas.artistSchema]].
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop(partitionCol)
}
