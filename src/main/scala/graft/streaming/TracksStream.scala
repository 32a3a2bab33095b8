package graft.streaming

import graft.etl.Normalize
import graft.schema.Schemas
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** S7 + K5 — the reference's streaming heart, Spark-first:
  * Kafka topic `ravelytics.spotify.tracks` (JSONEachRow) → tolerant-parse
  * materialized view → partitioned table
  * (001_init_spotify_tracks.sql:25-47 source, :50-74 MV).
  *
  * Structured Streaming mapping:
  *  - source: `readStream` over Kafka, or over a JSON-lines directory —
  *    both yield a `value: String` column, so the transform chain is
  *    byte-identical either way and the offline sandbox (no broker, no
  *    kafka connector jar) tests the real pipeline end to end;
  *  - transform: `from_json(value, rawTrackSchema)` then the exact MV
  *    expression list via [[Normalize.curateTracks]] — the same module
  *    the batch path uses, so batch/stream semantics cannot drift;
  *  - sink: checkpointed append parquet, partitioned like K6;
  *    `Trigger.AvailableNow` gives batch-equivalent runs (and the
  *    at-least-once → exactly-once upgrade over the reference's CH
  *    Kafka-engine offset handling comes free with checkpointing).
  *
  * The whole job is a stateless narrow map (no watermark, no stateful
  * op — SURVEY §2.8): one whole-stage-codegen stage per micro-batch,
  * horizontally scalable to any number of Kafka partitions.
  */
object TracksStream {

  /** JSONEachRow values → raw track columns. `from_json` is tolerant the
    * way the CH Kafka engine is (`input_format_null_as_default`, 001:46):
    * malformed rows yield nulls, which [[Normalize.curateTracks]] then
    * defaults — in-stream parse tolerance, never a poison-pill crash.
    */
  def parseValues(values: DataFrame): DataFrame =
    Normalize.defaultRawTracks(
      values
        .select(from_json(col("value"), Schemas.rawTrackSchema).as("r"))
        .select(col("r.*")))

  /** value:String stream/batch → curated rows (the MV expression list). */
  def curate(values: DataFrame): DataFrame =
    Normalize.curateTracks(parseValues(values))

  /** File-based stand-in for the Kafka source: a directory of JSON-lines
    * files, one raw track record per line (exactly a Kafka value).
    */
  def fileSource(spark: SparkSession, inDir: String): DataFrame =
    spark.readStream.text(inDir) // text source already yields `value: String`

  /** Broker-backed source. The default `format="kafka"` requires the
    * spark-sql-kafka connector on the cluster classpath (resolved by
    * name at runtime; not present in the offline sandbox, so nothing
    * here forces the class to load); `format="graftbus"` reads the
    * SAME (key, value, topic, partition, offset, timestamp) contract
    * from the embedded [[graft.bus.BusBroker]] — per-partition offsets,
    * earliest replay, commit-after-batch — executing the consume path
    * end-to-end in-process (BusRoundTripSpec).
    */
  /** The source option surface, spelled EXACTLY as the real
    * spark-sql-kafka connector documents it — `subscribe`,
    * `kafka.bootstrap.servers`, `startingOffsets`. Exposed so
    * BusRoundTripSpec can mirror-check the embedded bus against these
    * names: the documented config-swap (`format("kafka")` ↔
    * `format("graftbus")`) stays one line only while both connectors
    * accept the same spellings.
    */
  private[graft] def sourceOptions(brokers: String, topic: String): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> brokers,
      "subscribe" -> topic,
      "startingOffsets" -> "earliest",
    )

  def kafkaSource(spark: SparkSession, brokers: String, topic: String,
      format: String = "kafka"): DataFrame =
    spark.readStream
      .format(format)
      .options(sourceOptions(brokers, topic))
      .load()
      .selectExpr("CAST(value AS STRING) AS value")

  /** K5: run the MV — source → curate → checkpointed append parquet,
    * partitioned by ingest month (K6 layout). AvailableNow processes
    * everything currently in the source, then stops (batch-equivalent
    * semantics, same as a CH MV that has caught up).
    */
  def run(values: DataFrame, tablePath: String, checkpoint: String): StreamingQuery =
    curate(values)
      .withColumn("ingest_month", graft.etl.TemporalFixups.toYyyyMm(col("ingest_ts")))
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", tablePath)
      .option("checkpointLocation", checkpoint)
      .partitionBy("ingest_month")
      .trigger(Trigger.AvailableNow())
      .start()

  /** Convenience: file-source MV run (the offline/test entry point). */
  def runFromFiles(spark: SparkSession, inDir: String, tablePath: String,
      checkpoint: String): StreamingQuery =
    run(fileSource(spark, inDir), tablePath, checkpoint)
}
