package graft

import graft.etl.Normalize
import graft.queries.GoldenPipeline
import graft.views.TechnoViews
import org.apache.spark.sql.functions._

/** End-to-end golden test over the reference's only correctness artifact:
  * the 150-item playlist fixture (SURVEY §5). Asserts the documented edge
  * cases: 1 year-precision release date, 92 multi-artist tracks, total
  * null-defaulting, and the full techno-cascade semantics incl. argMax
  * latest-wins.
  */
class GoldenFixtureSpec extends SparkSpec {

  private lazy val items = GoldenPipeline.readFixtureItems(spark).cache()
  private lazy val curated = GoldenPipeline.curatedTracks(spark).cache()

  test("fixture loads 150 items with the declared schema") {
    assert(items.count() === 150)
  }

  test("normalize keeps all 150 tracks (every item has a track id)") {
    assert(curated.count() === 150)
  }

  test("92 of 150 tracks are multi-artist (M:N via artist_ids)") {
    assert(curated.filter(size(col("artist_ids")) > 1).count() === 92)
  }

  test("year-precision release date fixes up to -01-01 (001:61-70)") {
    val d = curated.filter(col("track_id") === "7jkxUiHq2h9v2YDm9yg9mY")
      .select(date_format(col("release_date"), "yyyy-MM-dd")).head().getString(0)
    assert(d === "2024-01-01")
    // and it is the only year-precision date in the fixture
    val januaryFirsts = curated
      .filter(date_format(col("release_date"), "MM-dd") === "01-01")
    assert(januaryFirsts.count() >= 1)
  }

  test("no nulls survive normalization (input_format_null_as_default)") {
    val anyNull = curated.columns
      .map(c => sum(when(col(c).isNull, 1).otherwise(0)))
      .reduce(_ + _)
    assert(curated.agg(anyNull.as("n")).head().getLong(0) === 0L)
  }

  test("added_at parses from the item; ingest_ts is the run stamp") {
    val row = curated.orderBy(col("track_id")).limit(1)
      .select(
        date_format(col("ingest_ts"), "yyyy-MM-dd HH:mm:ss"),
        col("added_at") <= col("ingest_ts"))
      .head()
    assert(row.getString(0) === "2025-07-30 00:00:00")
    assert(row.getBoolean(1)) // all fixture added_at are before the run
  }

  test("techno cascade: argMax picks the fresh snapshot, flag matches rule") {
    val flagged = GoldenPipeline.goldenTechno(spark, "").cache()
    assert(flagged.count() > 0)
    // the fresh rule: any track with a digit-prefixed artist id is techno
    val expected = curated
      .select(col("track_id"),
        exists(col("artist_ids"),
          id => substring(id, 1, 1).between("0", "9")).as("want"))
      .groupBy(col("track_id")).agg(max(col("want")).as("want"))
    val joined = flagged.join(expected, "track_id")
    assert(joined.filter(col("is_techno") =!= col("want")).count() === 0)
    // the stale snapshot ('pop' for everyone) must never leak through
    assert(flagged.filter(col("all_genres").contains("pop")).count() === 0)
    flagged.unpersist()
  }

  test("view cascade registers and resolves through spark.sql") {
    val ids = curated.select(explode(col("artist_ids")).as("artist_id")).distinct()
    val artists = ids.select(
      to_timestamp(lit("2025-07-30 00:00:00")).as("ingest_ts"),
      col("artist_id"),
      lit("a").as("artist_name"),
      array(lit("Techno")).as("genres"),
      lit(0).as("popularity"),
      lit(0L).as("followers_total"))
    TechnoViews.registerAll(spark, curated, artists)
    val n = spark.sql(
      "SELECT count(*) FROM v_track_is_techno WHERE is_techno").head().getLong(0)
    assert(n === 150) // every artist has genre Techno → every track flagged
  }

  test("P3: items with empty track ids are dropped, not defaulted in") {
    import spark.implicits._
    val twoGood = items.limit(2)
    val raw = Normalize.tracksFromPlaylistItems(twoGood, GoldenPipeline.ingestTsIso)
    assert(raw.count() === 2)
    // a null track yields an empty id → filtered
    val nullTrack = Seq("""{"added_at":"2025-07-18T09:27:45Z","track":null}""").toDS()
    val parsed = spark.read.schema(graft.schema.Schemas.rawPlaylistItemSchema).json(nullTrack)
    assert(Normalize.tracksFromPlaylistItems(parsed, GoldenPipeline.ingestTsIso).count() === 0)
  }
}
