package graft

import graft.tables.ArtistTable
import graft.views.TechnoViews
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

/** The artist-dimension sink (reference gap: 002_views_techno.sql:14
  * reads `spotify_artists` but no migration creates it): partition
  * layout, pruning, and — the semantic contract — `vArtistLatest` over
  * the read-back table equals the same view over the in-memory frames.
  */
class ArtistTableSpec extends SparkSpec {
  import spark.implicits._

  private def snapshot(month: String, day: Int, genre: String) =
    (1 to 40).map(i => f"a$i%03d").toDF("artist_id")
      .select(
        lit(s"2025-$month-${f"$day%02d"}T08:00:00Z").try_cast("timestamp").as("ingest_ts"),
        col("artist_id"),
        concat(lit("artist "), col("artist_id")).as("artist_name"),
        array(lit(genre), col("artist_id")).as("genres"),
        lit(7).as("popularity"),
        lit(100L).as("followers_total"),
      )

  test("append writes month-partitioned dirs; ingest_month filter prunes") {
    val path = tmpDir("artisttable")
    ArtistTable.append(snapshot("06", 20, "pop").unionByName(snapshot("07", 5, "techno")), path)

    val back = spark.read.parquet(path)
    assert(back.count() === 80)
    assert(back.select("ingest_month").distinct().as[String].collect().sorted
      === Array("202506", "202507"))

    val pruned = back.filter(col("ingest_month") === "202507")
    val filesRead = pruned.select(input_file_name().as("f")).distinct().as[String].collect()
    assert(filesRead.nonEmpty && filesRead.forall(_.contains("ingest_month=202507")))
    val scan = pruned.queryExecution.executedPlan.collectFirst { case s: FileSourceScanExec => s }
    assert(scan.isDefined && scan.get.partitionFilters.nonEmpty)
  }

  test("vArtistLatest over the read-back table equals the in-memory cascade input") {
    val path = tmpDir("artisttable2")
    val stale = snapshot("06", 20, "pop")
    val fresh = snapshot("07", 5, "techno")
    ArtistTable.append(stale.unionByName(fresh), path)

    val fromTable = TechnoViews.vArtistLatest(ArtistTable.read(spark, path))
      .orderBy("artist_id")
    val fromMemory = TechnoViews.vArtistLatest(stale.unionByName(fresh))
      .orderBy("artist_id")
    assert(fromTable.schema === fromMemory.schema)
    assert(fromTable.collect().toSeq === fromMemory.collect().toSeq)
    // and the latest snapshot actually won
    assert(fromTable.filter(array_contains(col("genres"), "techno")).count() === 40)
  }
}
