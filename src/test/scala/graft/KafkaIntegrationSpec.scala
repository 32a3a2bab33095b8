package graft

import graft.ingest.KafkaFrames
import graft.streaming.TracksStream
import org.apache.spark.sql.functions._

/** REAL spark-sql-kafka round-trip (VERDICT r11 #6): the embedded bus
  * (BusRoundTripSpec) executes the produce→consume→MV contract
  * in-process and mirror-checks the option SPELLINGS; this spec proves
  * those spellings against the actual connector by running the same
  * loop through a real broker — `writeKafka(format="kafka")` →
  * `kafkaSource(format="kafka")` → the checkpointed MV — and asserting
  * parity with the file-source path.
  *
  * GATED: runs only when BOTH a broker is reachable
  * (`KAFKA_BOOTSTRAP=host:port` in the environment) and the
  * spark-sql-kafka connector is on the classpath; cancels (reported as
  * canceled, not passed) otherwise — the offline sandbox has neither,
  * a single-node dev broker has both. `tools/kafka_smoke.sh` remains
  * the cluster-side spark-shell variant of the same loop.
  */
class KafkaIntegrationSpec extends SparkSpec {

  private val bootstrap = sys.env.get("KAFKA_BOOTSTRAP")

  private def connectorPresent: Boolean =
    try {
      Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
      true
    } catch { case _: ClassNotFoundException => false }

  private val raw = Seq(
    """{"ingest_ts":"2026-01-01T00:00:00Z","track_id":"it1","track_name":"A","artists":["x"],"artist_ids":["ax"],"album_id":"al","album_name":"Al","release_date":"2020-01-02","popularity":5,"added_at":"2026-01-01T00:00:00Z","external_url":"u"}""",
    """{"ingest_ts":"2026-01-01T00:00:01Z","track_id":"it2","track_name":"B","artists":["y"],"artist_ids":["ay"],"album_id":"al","album_name":"Al","release_date":"2021","popularity":7,"added_at":"2026-01-01T00:00:01Z","external_url":"u"}""",
  )

  test("real-connector produce → topic → streaming MV round-trips with file-path parity") {
    assume(bootstrap.isDefined,
      "set KAFKA_BOOTSTRAP=host:port to run the real-broker integration")
    assume(connectorPresent,
      "spark-sql-kafka-0-10 connector not on classpath")
    val brokers = bootstrap.get
    val topic = s"graft_it_${System.currentTimeMillis()}"
    import spark.implicits._

    // produce through the library's frame builder + sink (K2 contract)
    KafkaFrames.writeKafka(raw.toDF("value"), brokers, topic)

    // consume through the real connector into the checkpointed MV
    val out = tmpDir("kit-out"); val ck = tmpDir("kit-ck")
    TracksStream.run(TracksStream.kafkaSource(spark, brokers, topic), out, ck)
      .awaitTermination(120000)
    val got = spark.read.parquet(out)
    assert(got.count() === raw.size.toLong)
    assert(got.filter(col("track_id").isNull || col("track_id") === "").count() === 0L)

    // parity: the same values through the file source yield identical
    // curated rows — the connector path adds/loses nothing
    val in = tmpDir("kit-in")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(in, "a.jsonl"), raw.mkString("\n"))
    val fOut = tmpDir("kit-fout"); val fCk = tmpDir("kit-fck")
    TracksStream.runFromFiles(spark, in, fOut, fCk).awaitTermination(120000)
    val fileRows = spark.read.parquet(fOut).orderBy(col("track_id")).collect().toSeq
    val kafkaRows = got.orderBy(col("track_id")).collect().toSeq
    assert(kafkaRows === fileRows)
  }
}
