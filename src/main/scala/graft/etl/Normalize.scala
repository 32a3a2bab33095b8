package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Record normalization (reference P1/P2/P3) as pure column expressions.
  *
  * The reference performs these per-dict in Python
  * (spotify_metadata_to_kafka.py:30-49, spotify_artist_genres_to_kafka.py:94-110);
  * here they are declarative `select`s that Catalyst fuses into one
  * codegen stage — no UDFs, no driver loops.
  *
  * Null discipline: ClickHouse columns are non-Nullable with
  * default-on-null (`input_format_null_as_default=1`), and the Python
  * producers mirror it with `or ""` / `or 0`. We therefore `coalesce`
  * every field to its type default — nulls must not propagate.
  */
object Normalize {

  private def str(c: Column): Column = coalesce(c, lit(""))

  /** P1 (spotify_metadata_to_kafka.py:30-49): playlist items → raw track
    * records. Input has the shape of [[graft.schema.Schemas.rawPlaylistItemSchema]]
    * (one item per row); output matches rawTrackSchema.
    *
    * - artists/artist_ids: name/id per artist, null-defaulted to ""
    * - release_date: defaulted to "1970-01-01" pre-fixup (py:41)
    * - added_at: defaulted to the run's ingest timestamp string (py:47)
    * - popularity: `int(x or 0)` → try_cast + coalesce 0
    */
  def tracksFromPlaylistItems(items: DataFrame, ingestTsIso: String): DataFrame =
    items.select(
      lit(ingestTsIso).as("ingest_ts"),
      str(col("track.id")).as("track_id"),
      str(col("track.name")).as("track_name"),
      coalesce(transform(col("track.artists"), a => str(a.getField("name"))),
        array().cast("array<string>")).as("artists"),
      coalesce(transform(col("track.artists"), a => str(a.getField("id"))),
        array().cast("array<string>")).as("artist_ids"),
      str(col("track.album.id")).as("album_id"),
      str(col("track.album.name")).as("album_name"),
      coalesce(col("track.album.release_date"), lit("1970-01-01")).as("release_date"),
      coalesce(col("track.popularity").try_cast(IntegerType), lit(0)).as("popularity"),
      coalesce(col("added_at"), lit(ingestTsIso)).as("added_at"),
      str(col("track.external_urls.spotify")).as("external_url"),
    ).filter(col("track_id") =!= "") // P3 (py:85-86)

  /** P2 (spotify_artist_genres_to_kafka.py:94-110): artist API payloads →
    * raw artist records. Guard: id present; name stripped; genres default [].
    */
  def artistsFromPayload(artists: DataFrame, ingestTsIso: String): DataFrame =
    artists
      .filter(col("id").isNotNull && col("id") =!= "")
      .select(
        lit(ingestTsIso).as("ingest_ts"),
        col("id").as("artist_id"),
        trim(str(col("name"))).as("artist_name"),
        coalesce(col("genres"), array().cast("array<string>")).as("genres"),
        coalesce(col("popularity").try_cast(IntegerType), lit(0)).as("popularity"),
        coalesce(col("followers.total").try_cast("long"), lit(0L)).as("followers_total"),
      )

  /** Schema-on-read null defaulting for raw track records — the Spark
    * analogue of ClickHouse's `input_format_null_as_default = 1` on the
    * Kafka source table (001:46): a malformed or partial JSON row lands
    * as defaults, never as nulls and never as a poison-pill failure.
    */
  def defaultRawTracks(raw: DataFrame): DataFrame = {
    val emptyArr = array().cast("array<string>")
    raw.select(
      str(col("ingest_ts")).as("ingest_ts"),
      str(col("track_id")).as("track_id"),
      str(col("track_name")).as("track_name"),
      coalesce(col("artists"), emptyArr).as("artists"),
      coalesce(col("artist_ids"), emptyArr).as("artist_ids"),
      str(col("album_id")).as("album_id"),
      str(col("album_name")).as("album_name"),
      str(col("release_date")).as("release_date"),
      coalesce(col("popularity"), lit(0)).as("popularity"),
      str(col("added_at")).as("added_at"),
      str(col("external_url")).as("external_url"),
    )
  }

  /** Raw track records → curated rows (the MV expression list,
    * 001:53-73). Composes [[TemporalFixups]]; used identically by the
    * batch writer and the streaming sink.
    */
  def curateTracks(raw: DataFrame): DataFrame = {
    import TemporalFixups._
    val ingest = ingestTsOrNow(col("ingest_ts"))
    raw.select(
      ingest.as("ingest_ts"),
      col("track_id"),
      col("track_name"),
      col("artists"),
      col("artist_ids"),
      col("album_id"),
      col("album_name"),
      releaseDateFix(col("release_date")).as("release_date"),
      col("popularity"),
      addedAtOrIngest(col("added_at"), ingest).as("added_at"),
      col("external_url"),
    )
  }

  /** Raw artist records → curated dimension rows. */
  def curateArtists(raw: DataFrame): DataFrame = {
    import TemporalFixups._
    raw.select(
      ingestTsOrNow(col("ingest_ts")).as("ingest_ts"),
      col("artist_id"),
      col("artist_name"),
      coalesce(col("genres"), array().cast("array<string>")).as("genres"),
      coalesce(col("popularity"), lit(0)).as("popularity"),
      coalesce(col("followers_total"), lit(0L)).as("followers_total"),
    )
  }
}
