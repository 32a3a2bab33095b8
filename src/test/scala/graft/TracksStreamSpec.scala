package graft

import graft.streaming.TracksStream
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** S7+K5 semantics: the streaming MV (file source standing in for Kafka —
  * identical `value: String` contract) produces exactly what the batch
  * path produces from the same input, checkpointed, partitioned, and
  * tolerant of malformed rows in-stream.
  */
class TracksStreamSpec extends SparkSpec {

  private val lines = Seq(
    // well-formed row
    """{"ingest_ts":"2025-07-30T00:00:00Z","track_id":"t1","track_name":"One","artists":["A"],"artist_ids":["a1"],"album_id":"al1","album_name":"Al","release_date":"2024","popularity":10,"added_at":"2025-07-18T09:27:45Z","external_url":"u1"}""",
    // different month (partition split) + date-precision edge
    """{"ingest_ts":"2025-06-15T12:00:00Z","track_id":"t2","track_name":"Two","artists":["B","C"],"artist_ids":["b1","c1"],"album_id":"al2","album_name":"Al2","release_date":"2023-05-17T00:00:00Z","popularity":99,"added_at":"bad-ts","external_url":"u2"}""",
    // malformed JSON → all-default row, not a crash (in-stream tolerance)
    """this is not json""",
    // partial row → defaults
    """{"ingest_ts":"2025-06-20T08:00:00Z","track_id":"t3"}""",
  )

  private def writeInput(dir: String): Unit =
    Files.writeString(Paths.get(dir, "part-0.jsonl"), lines.mkString("\n"))

  test("stream (AvailableNow) and batch produce identical curated tables") {
    val in = tmpDir("stream-in")
    val table = tmpDir("stream-table")
    val ckpt = tmpDir("stream-ckpt")
    writeInput(in)

    val q = TracksStream.runFromFiles(spark, in, table, ckpt)
    q.awaitTermination(120000)

    val streamed = spark.read.parquet(table)
    val batch = TracksStream.curate(spark.read.text(in))
      .withColumn("ingest_month", graft.etl.TemporalFixups.toYyyyMm(col("ingest_ts")))

    assert(streamed.count() === 4)
    // full-row parity, order-insensitive; ingest_ts deterministic for
    // parseable rows; the malformed row gets now() in both paths — strip
    // it from exact comparison, assert its defaults instead.
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("track_id") =!= "")
      .select(streamed.columns.sorted.map(col).toSeq: _*)
      .withColumn("artists", array_join(col("artists"), "|"))
      .withColumn("artist_ids", array_join(col("artist_ids"), "|"))
      .orderBy(col("track_id"))
      .collect().toSeq
    assert(canon(streamed) === canon(batch))

    val junk = streamed.filter(col("track_id") === "")
    assert(junk.count() === 1)
    assert(junk.select(date_format(col("release_date"), "yyyy-MM-dd"))
      .head().getString(0) === "1970-01-01")
  }

  test("sink is partitioned by ingest_month with year-fixup applied") {
    val in = tmpDir("stream-in2")
    val table = tmpDir("stream-table2")
    val ckpt = tmpDir("stream-ckpt2")
    writeInput(in)
    TracksStream.runFromFiles(spark, in, table, ckpt).awaitTermination(120000)

    val months = Files.list(Paths.get(table)).iterator()
    val dirs = new scala.collection.mutable.ArrayBuffer[String]
    months.forEachRemaining(p => if (Files.isDirectory(p)) dirs += p.getFileName.toString)
    assert(dirs.toSet.contains("ingest_month=202507"))
    assert(dirs.toSet.contains("ingest_month=202506"))

    val t1 = spark.read.parquet(table).filter(col("track_id") === "t1")
    assert(t1.select(date_format(col("release_date"), "yyyy-MM-dd"))
      .head().getString(0) === "2024-01-01")
  }

  test("golden fixture streamed == golden fixture batched (150 reference items)") {
    import graft.queries.GoldenPipeline
    val in = tmpDir("gs-in"); val table = tmpDir("gs-table"); val ckpt = tmpDir("gs-ckpt")
    // re-shape the fixture's raw track records (the MV's input contract)
    // to JSONL — exactly what the Kafka producer (K2) emits per item
    val raw = GoldenPipeline.readFixtureItems(spark)
    val lines = graft.etl.Normalize
      .tracksFromPlaylistItems(raw, GoldenPipeline.ingestTsIso)
      .toJSON.collect()
    assert(lines.length === 150)
    Files.writeString(Paths.get(in, "golden.jsonl"), lines.mkString("\n"))

    TracksStream.runFromFiles(spark, in, table, ckpt).awaitTermination(120000)
    val streamed = spark.read.parquet(table)
    assert(streamed.count() === 150)

    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("track_id", "track_name", "release_date", "added_at", "album_id")
      .withColumn("release_date", date_format(col("release_date"), "yyyy-MM-dd"))
      .orderBy("track_id").collect().toSeq
    assert(canon(streamed) === canon(GoldenPipeline.curatedTracks(spark)))
    // the one year-precision date survives the stream path fixed up
    assert(streamed.filter(date_format(col("release_date"), "MM-dd") === "01-01").count() > 0)
  }

  test("checkpoint makes re-runs exactly-once (no duplicate rows)") {
    val in = tmpDir("stream-in3")
    val table = tmpDir("stream-table3")
    val ckpt = tmpDir("stream-ckpt3")
    writeInput(in)
    TracksStream.runFromFiles(spark, in, table, ckpt).awaitTermination(120000)
    // second run over the same checkpoint: nothing new to process
    TracksStream.runFromFiles(spark, in, table, ckpt).awaitTermination(120000)
    assert(spark.read.parquet(table).count() === 4)
    // new file arrives → only it is processed
    Files.writeString(Paths.get(in, "part-1.jsonl"),
      """{"ingest_ts":"2025-07-31T00:00:00Z","track_id":"t9","track_name":"Nine","artists":[],"artist_ids":[],"album_id":"","album_name":"","release_date":"","popularity":0,"added_at":"","external_url":""}""")
    TracksStream.runFromFiles(spark, in, table, ckpt).awaitTermination(120000)
    assert(spark.read.parquet(table).count() === 5)
  }
}
