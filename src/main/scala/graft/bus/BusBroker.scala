package graft.bus

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

/** One record in a bus partition log — the Kafka message shape the
  * reference's producers emit (spotify_metadata_to_kafka.py:52-70
  * unkeyed JSON values; spotify_artist_genres_to_kafka.py keyed):
  * binary key (nullable), binary value, broker-assigned timestamp.
  */
final case class BusRecord(key: Array[Byte], value: Array[Byte], timestampMs: Long)

/** What a producer run delivered — the counterpart of the reference's
  * delivery-callback counting (`_produce_to_kafka` returns `delivered`,
  * raises on errors): total plus per-partition counts, aggregated from
  * the distributed writers' commit messages (A4).
  */
final case class DeliveryReport(topic: String, delivered: Long, perPartition: Map[Int, Long])

/** In-JVM embedded broker: topic → fixed partition array → append-only
  * log with dense offsets. This is the TEST/EMBEDDED transport behind
  * the same produce/consume contract the Kafka connector serves on a
  * real cluster (topic/partition/offset identity, key→partition
  * affinity, earliest-offset replay, committed-offset tracking) — the
  * sandbox has no Kafka jars, so the contract is executed against this
  * broker in-process and the `format("kafka")` path stays a
  * config-swap (see [[graft.ingest.KafkaFrames.writeKafka]]).
  *
  * Single-JVM by design (local[n] executors share the process; a real
  * cluster uses a real broker). Thread-safe: appends synchronize per
  * partition log, metadata lives in concurrent maps.
  */
object BusBroker {

  val DefaultPartitions = 2

  private val topics = TrieMap.empty[String, Array[ArrayBuffer[BusRecord]]]
  private val committed = TrieMap.empty[String, Array[Long]]
  private val deliveries = TrieMap.empty[String, DeliveryReport]
  private val roundRobin = new java.util.concurrent.atomic.AtomicInteger(0)

  /** K4 flow: create iff absent (reference: list → create-if-absent). */
  def createTopic(name: String, partitions: Int = DefaultPartitions): Unit = {
    require(partitions > 0, s"partitions must be positive, got $partitions")
    topics.putIfAbsent(name, Array.fill(partitions)(ArrayBuffer.empty[BusRecord]))
  }

  def listTopics(): Set[String] = topics.keySet.toSet

  /** Auto-creates on first touch (Kafka's auto.create.topics.enable
    * default) so a producer never races topic setup in tests.
    */
  private def logsOf(topic: String): Array[ArrayBuffer[BusRecord]] = {
    createTopic(topic)
    topics(topic)
  }

  def numPartitions(topic: String): Int = logsOf(topic).length

  /** Kafka's default-partitioner semantics: keyed records hash to a
    * stable partition (per-key affinity — K3's contract), unkeyed
    * records spread round-robin.
    */
  def partitionFor(topic: String, key: Array[Byte]): Int = {
    val n = numPartitions(topic)
    if (key == null) math.floorMod(roundRobin.getAndIncrement(), n)
    else math.floorMod(java.util.Arrays.hashCode(key), n)
  }

  /** Append one record; returns (partition, offset). */
  def append(topic: String, key: Array[Byte], value: Array[Byte]): (Int, Long) = {
    require(value != null, s"bus record value must not be null (topic $topic)")
    val p = partitionFor(topic, key)
    val log = logsOf(topic)(p)
    log.synchronized {
      log += BusRecord(key, value, System.currentTimeMillis())
      (p, log.length - 1L)
    }
  }

  /** Exclusive end offset per partition (next offset to be written). */
  def endOffsets(topic: String): Array[Long] =
    logsOf(topic).map(log => log.synchronized(log.length.toLong))

  def read(topic: String, partition: Int, offset: Long): BusRecord = {
    val log = logsOf(topic)(partition)
    log.synchronized(log(offset.toInt))
  }

  // ------------------------------------------------------ consumer side

  /** Record the offsets a streaming read has committed (the engine
    * calls this after a micro-batch is durably processed) — observable
    * so the round-trip spec can prove offset commit happened.
    */
  def recordCommit(topic: String, offsets: Array[Long]): Unit =
    committed.put(topic, offsets.clone())

  def committedOffsets(topic: String): Option[Array[Long]] =
    committed.get(topic).map(_.clone())

  // ------------------------------------------------------ producer side

  /** Aggregate of the most recent producer run's writer commit
    * messages for `topic` (A4) — cumulative across batches.
    */
  def recordDelivery(topic: String, perPartition: Map[Int, Long]): Unit = {
    val prev = deliveries.get(topic)
    val merged = prev.map(_.perPartition).getOrElse(Map.empty) ++
      perPartition.map { case (p, c) =>
        p -> (prev.flatMap(_.perPartition.get(p)).getOrElse(0L) + c)
      }
    deliveries.put(topic, DeliveryReport(topic, merged.values.sum, merged))
  }

  def deliveryReport(topic: String): Option[DeliveryReport] = deliveries.get(topic)

  /** Test isolation: drop every topic, offset, and report. */
  def reset(): Unit = {
    topics.clear(); committed.clear(); deliveries.clear(); roundRobin.set(0)
  }
}
