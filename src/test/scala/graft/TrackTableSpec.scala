package graft

import graft.tables.TrackTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

/** K6: the partitioned+ordered table writer, and the proof that an
  * `ingest_month` filter actually prunes partitions at the physical-plan
  * level (SURVEY §4's one storage-level requirement).
  */
class TrackTableSpec extends SparkSpec {
  import spark.implicits._

  private def curatedRows(n: Int, month: String) = {
    val ts = s"2025-$month-15T10:00:00Z"
    (1 to n).map(i => (f"2025-$month-${10 + i % 15}T10:00:${i % 60}%02dZ", f"t$i%03d"))
      .toDF("ingest_raw", "track_id")
      .select(
        col("ingest_raw").try_cast("timestamp").as("ingest_ts"),
        col("track_id"),
        lit("name").as("track_name"),
        array(lit("A")).as("artists"),
        array(lit("a")).as("artist_ids"),
        lit("al").as("album_id"),
        lit("Al").as("album_name"),
        to_date(lit("2024-01-01")).as("release_date"),
        lit(5).as("popularity"),
        lit(ts).try_cast("timestamp").as("added_at"),
        lit("u").as("external_url"),
      )
  }

  test("append writes hive-partitioned dirs ordered within files") {
    val path = tmpDir("tracktable")
    TrackTable.append(curatedRows(30, "07").unionByName(curatedRows(20, "06")), path)

    val back = TrackTable.read(spark, path)
    assert(back.count() === 50)
    assert(back.select("ingest_month").distinct().as[String].collect().sorted
      === Array("202506", "202507"))

    // ORDER BY (ingest_ts, track_id) within each written file
    val fileOrdered = back
      .withColumn("f", input_file_name())
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("f")
          .orderBy(monotonically_increasing_id())))
      .withColumn("lag_ts", lag("ingest_ts", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("f")
          .orderBy("rn")))
      .filter(col("lag_ts").isNotNull && col("lag_ts") > col("ingest_ts"))
    assert(fileOrdered.count() === 0)
  }

  test("an ingest_month filter prunes partitions in the physical plan") {
    val path = tmpDir("tracktable2")
    TrackTable.append(curatedRows(30, "07").unionByName(curatedRows(20, "06")), path)

    val pruned = TrackTable.read(spark, path).filter(col("ingest_month") === "202507")
    // physical proof #1: only files under the selected partition dir are
    // actually read at execution time (df.inputFiles would ignore the
    // filter — it lists the whole relation)
    val filesRead = pruned.select(input_file_name().as("f")).distinct().as[String].collect()
    assert(filesRead.nonEmpty)
    assert(filesRead.forall(_.contains("ingest_month=202507")))
    // physical proof #2: the scan node carries the partition filter
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }
    assert(scan.isDefined)
    assert(scan.get.partitionFilters.nonEmpty)
    assert(pruned.count() === 30)
  }
}
