package graft

import graft.etl.Normalize
import graft.schema.Schemas
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Null-totality property for normalization (SURVEY §5.4): arbitrary
  * missing/null fields in raw JSON produce typed defaults, never nulls —
  * the reference's `or ""` / `or 0` + input_format_null_as_default
  * semantics.
  */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def parseItems(jsons: Seq[String]) =
    spark.read.schema(Schemas.rawPlaylistItemSchema).json(jsons.toDS())

  test("null-totality: random field dropout still yields zero nulls (property)") {
    // generate playlist items with every field independently present/absent
    val fieldGen: Gen[String] = for {
      hasName <- Gen.oneOf(true, false)
      hasPop <- Gen.oneOf(true, false)
      hasAlbum <- Gen.oneOf(true, false)
      hasRel <- Gen.oneOf(true, false)
      hasArtists <- Gen.oneOf(true, false)
      hasAdded <- Gen.oneOf(true, false)
      hasUrls <- Gen.oneOf(true, false)
      id <- Gen.identifier.map(_.take(8))
    } yield {
      val album =
        if (!hasAlbum) ""
        else s""""album":{"id":"al","name":"A"${if (hasRel) ""","release_date":"2024"""" else ""}},"""
      val artists =
        if (!hasArtists) ""
        else """"artists":[{"id":"a1","name":null},{"id":null,"name":"N"}],"""
      s"""{${if (hasAdded) """"added_at":"2025-07-18T09:27:45Z",""" else ""}
         |"track":{"id":"$id",${if (hasName) """"name":"T",""" else ""}
         |$album $artists
         |${if (hasUrls) """"external_urls":{"spotify":"http://x"},""" else ""}
         |"popularity":${if (hasPop) "55" else "null"}}}""".stripMargin.replaceAll("\n", "")
    }
    val samples = Gen.listOfN(120, fieldGen).pureApply(Gen.Parameters.default, Seed(7L))
    val curated = Normalize.curateTracks(
      Normalize.tracksFromPlaylistItems(parseItems(samples), "2025-07-30T00:00:00Z"))
    val anyNull = curated.columns
      .map(c => sum(when(col(c).isNull, 1).otherwise(0))).reduce(_ + _)
    assert(curated.agg(anyNull).head().getLong(0) === 0L)
    assert(curated.count() === samples.size) // every item kept (ids present)
    // array elements are null-defaulted too, not just the arrays
    val nullElems = curated
      .filter(exists(col("artists"), a => a.isNull) || exists(col("artist_ids"), a => a.isNull))
    assert(nullElems.count() === 0)
  }

  test("artistsFromPayload: id guard, trim, genre default (P2)") {
    val raw = spark.read.schema(graft.ingest.Pipelines.artistPayloadSchema).json(Seq(
      """{"id":"a1","name":"  Ben Klock  ","genres":["Techno"],"popularity":70,"followers":{"total":12345}}""",
      """{"id":"a2","name":"NoGenres","popularity":null,"followers":null}""",
      """{"id":null,"name":"dropme"}""",
      """{"id":"","name":"dropme2"}""",
    ).toDS())
    val out = Normalize.curateArtists(
      Normalize.artistsFromPayload(raw, "2025-07-30T00:00:00Z"))
    val rows = out.orderBy("artist_id").collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[String]("artist_name") === "Ben Klock")
    assert(rows(0).getAs[Long]("followers_total") === 12345L)
    assert(rows(1).getAs[Seq[String]]("genres") === Seq.empty)
    assert(rows(1).getAs[Int]("popularity") === 0)
  }

  test("defaultRawTracks: a fully-null row becomes typed defaults") {
    val nullRow = spark.read.schema(Schemas.rawTrackSchema).json(Seq("{}").toDS())
    val out = Normalize.defaultRawTracks(nullRow).head()
    assert(out.getAs[String]("track_id") === "")
    assert(out.getAs[Seq[String]]("artists") === Seq.empty)
    assert(out.getAs[Int]("popularity") === 0)
  }
}
