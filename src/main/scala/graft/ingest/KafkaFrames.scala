package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K2/K3/K4 — Kafka produce, Spark-first.
  *
  * The reference's confluent producers (spotify_metadata_to_kafka.py:52-70
  * unkeyed tracks; spotify_artist_genres_to_kafka.py:113-132 keyed
  * artists) become `to_json(struct(*))` frames written with the Kafka
  * sink. Frame construction is separated from the write so the message
  * shape is unit-testable without a broker, and the write distributes
  * across executors instead of a single driver-side producer loop —
  * the 100 TB version of `flush(10)`.
  */
object KafkaFrames {

  /** K2: unkeyed JSONEachRow messages — one JSON object per row, all
    * columns, topic `ravelytics.spotify.tracks` shape.
    */
  def trackMessages(tracks: DataFrame): DataFrame =
    tracks.select(to_json(struct(tracks.columns.map(col).toSeq: _*)).as("value"))

  /** K3: keyed messages — key = artist_id (partition affinity per
    * artist), value = full record JSON.
    */
  def artistMessages(artists: DataFrame): DataFrame =
    artists.select(
      col("artist_id").as("key"),
      to_json(struct(artists.columns.map(col).toSeq: _*)).as("value"))

  /** Write a (key?, value) frame to the message transport. The default
    * `format="kafka"` needs the spark-sql-kafka connector on the
    * cluster classpath (resolved by name at runtime, so the offline
    * sandbox never loads Kafka classes); `format="graftbus"` routes the
    * SAME producer frames through the embedded [[graft.bus.BusBroker]]
    * — identical (key?, value) contract, distributed task writers, and
    * per-partition delivery accounting — which is how the produce path
    * executes end-to-end in-process (BusRoundTripSpec).
    */
  def writeKafka(frame: DataFrame, brokers: String, topic: String,
      format: String = "kafka"): Unit =
    frame.write
      .format(format)
      .mode("append") // a topic is an append-only log; DSv2 requires it explicit
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", topic)
      .save()

  /** A4 — what the last produce run(s) to `topic` delivered, counted
    * from the distributed writers' commit messages exactly the way the
    * reference counts producer delivery callbacks
    * (spotify_metadata_to_kafka.py:52-70 returns `delivered`). Embedded
    * transport only: the Kafka connector surfaces delivery failure by
    * failing the task (so a successful save IS delivered == rows).
    */
  def deliveryReport(topic: String): Option[graft.bus.DeliveryReport] =
    graft.bus.BusBroker.deliveryReport(topic)
}

/** K4 — topic auto-create (spotify_artist_genres_to_kafka.py:60-72).
  * AdminClient lives in kafka-clients, which ships with the Kafka
  * connector on a real cluster; behind a trait so offline tests stub it
  * and the reference's list→create-if-absent flow is still exercised.
  */
trait TopicAdmin {
  def listTopics(): Set[String]
  def createTopic(name: String, partitions: Int, replication: Short): Unit
}

object TopicAdmin {
  /** Reference flow: create (1 partition, RF 1) only when absent. */
  def ensureTopic(admin: TopicAdmin, topic: String,
      partitions: Int = 1, replication: Short = 1): Boolean =
    if (admin.listTopics().contains(topic)) false
    else { admin.createTopic(topic, partitions, replication); true }
}

/** The embedded transport's admin — the live (in-JVM) implementation of
  * the reference's list→create-if-absent flow; a cluster binds the
  * kafka-clients AdminClient behind the same trait.
  */
object BusTopicAdmin extends TopicAdmin {
  override def listTopics(): Set[String] = graft.bus.BusBroker.listTopics()
  override def createTopic(name: String, partitions: Int, replication: Short): Unit =
    graft.bus.BusBroker.createTopic(name, partitions) // replication: single-JVM log
}
