#!/usr/bin/env bash
# Day-one Kafka smoke test for a real cluster (VERDICT r3 #7).
#
# The build sandbox has no broker and no spark-sql-kafka jar, so
# TracksStream.kafkaSource / KafkaFrames.writeKafka are written to the
# connector's documented contract but never executed against it (see
# README "Known seams"). Run THIS on the first cluster that has both:
# it round-trips raw track records producer -> topic -> streaming MV ->
# table and asserts parity.
#
# Usage:
#   KAFKA_BOOTSTRAP=broker:9092 [TOPIC=graft_smoke_tracks] \
#     [GRAFT_JAR=path/to/ravelyticsspark.jar] ./tools/kafka_smoke.sh
#
# Requires: spark-shell on PATH and the matching
# org.apache.spark:spark-sql-kafka-0-10_2.13 package for your Spark.
set -euo pipefail

BOOTSTRAP="${KAFKA_BOOTSTRAP:?set KAFKA_BOOTSTRAP=host:port}"
TOPIC="${TOPIC:-graft_smoke_tracks}"
JAR="${GRAFT_JAR:-target/scala-2.13/ravelyticsspark_2.13-0.1.0-SNAPSHOT.jar}"
# SPARK_VERSION can be passed in; otherwise scrape the banner — and
# validate the result, because the banner prints BOTH the Spark and the
# Scala version and a format change could make grep pick the wrong one
# or nothing (ADVICE r5).
SPARK_VERSION="${SPARK_VERSION:-$(spark-shell --version 2>&1 | grep -oE 'version [0-9]+\.[0-9]+\.[0-9]+' | head -1 | cut -d' ' -f2)}"
case "$SPARK_VERSION" in
  3.[0-9]*.[0-9]*|4.[0-9]*.[0-9]*) ;;
  *) echo "[smoke] ERROR: could not determine a Spark 3.x/4.x version (got '${SPARK_VERSION}')." >&2
     echo "[smoke] Pass it explicitly: SPARK_VERSION=4.1.2 $0" >&2
     exit 1 ;;
esac
PKG="org.apache.spark:spark-sql-kafka-0-10_2.13:${SPARK_VERSION}"
WORK="$(mktemp -d /tmp/graft_kafka_smoke.XXXXXX)"

echo "[smoke] bootstrap=$BOOTSTRAP topic=$TOPIC work=$WORK pkg=$PKG"

cat > "$WORK/smoke.scala" <<EOF
// 1. PRODUCE: raw track values (Schemas.rawTrackSchema shape) through
//    the library's writeKafka — the exact (key,value) binary contract
//    IngestSpec pins offline.
val raw = Seq(
  """{"ingest_ts":"2026-01-01T00:00:00Z","track_id":"smoke1","track_name":"A","artists":["x"],"artist_ids":["ax"],"album_id":"al","album_name":"Al","release_date":"2020-01-02","popularity":5,"added_at":"2026-01-01T00:00:00Z","external_url":"u"}""",
  """{"ingest_ts":"2026-01-01T00:00:01Z","track_id":"smoke2","track_name":"B","artists":["y"],"artist_ids":["ay"],"album_id":"al","album_name":"Al","release_date":"2021","popularity":7,"added_at":"2026-01-01T00:00:01Z","external_url":"u"}""")
val frame = spark.createDataset(raw)(org.apache.spark.sql.Encoders.STRING).toDF("value")
graft.ingest.KafkaFrames.writeKafka(frame, "$BOOTSTRAP", "$TOPIC")
println(s"[smoke] produced \${raw.size} messages to $TOPIC")

// 2. CONSUME: the real connector source -> the checkpointed streaming
//    MV (curate + partitioned parquet append), AvailableNow.
val src = graft.streaming.TracksStream.kafkaSource(spark, "$BOOTSTRAP", "$TOPIC")
graft.streaming.TracksStream.run(src, "$WORK/out", "$WORK/ck").awaitTermination(120000)

// 3. ASSERT round-trip parity.
val got = spark.read.parquet("$WORK/out")
assert(got.count() == raw.size, s"round-trip mismatch: \${got.count()} != \${raw.size}")
assert(got.filter("track_id IS NULL OR track_id = ''").count() == 0, "null track ids")
println(s"[smoke] OK: \${raw.size} messages round-tripped through $TOPIC")
sys.exit(0)
EOF

exec spark-shell --jars "$JAR" --packages "$PKG" -I "$WORK/smoke.scala"
