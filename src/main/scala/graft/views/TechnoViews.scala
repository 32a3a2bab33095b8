package graft.views

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The analytic view cascade (002_views_techno.sql), Spark-first.
  *
  * Each view exists both as a DataFrame-producing function (composable,
  * testable) and as a registered temp view (so `spark.sql` text queries
  * resolve the same cascade Catalyst-inlined, exactly as ClickHouse
  * inlines its non-materialized views).
  *
  * Scale notes (100 TB design):
  * - `vArtistLatest` is a per-key latest-state aggregate; Catalyst plans
  *   it partial→final hash agg (one shuffle on artist_id).
  * - The dimension side of the join is bounded by the artist CATALOG, not
  *   by a constant — so no forced `broadcast()` hint: AQE broadcasts it
  *   when its runtime size is under the threshold and falls back to a
  *   shuffle join when a real-world artist dim (genre arrays included)
  *   outgrows the driver. A hard hint here would OOM at 100× dim scale.
  * - `collect_list` order is nondeterministic under parallelism; the
  *   cascade only ever does set-membership on the result (002:50), so we
  *   `array_sort` the final distinct array to make output canonical
  *   without changing semantics.
  */
object TechnoViews {

  /** v_artist_latest (002:9-15): argMax(artist_name|genres, ingest_ts)
    * per artist — latest-state snapshot of a re-ingested dimension.
    * `max_by` is Spark's built-in argMax.
    */
  def vArtistLatest(artists: DataFrame): DataFrame =
    artists.groupBy(col("artist_id")).agg(
      max_by(col("artist_name"), col("ingest_ts")).as("artist_name"),
      max_by(col("genres"), col("ingest_ts")).as("genres"),
    )

  /** v_track_artists (002:18-24): one row per (track, artist) via
    * arrayJoin(artist_ids) → explode.
    */
  def vTrackArtists(tracks: DataFrame): DataFrame =
    tracks.select(
      col("ingest_ts"), col("track_id"), col("track_name"),
      explode(col("artist_ids")).as("artist_id"),
    )

  /** v_track_genres (002:27-44): LEFT JOIN artist-latest, groupArray the
    * genre arrays per track, flatten, lower, distinct. The left-join null
    * side becomes an empty array (002:36) — `coalesce(genres, array())`.
    */
  def vTrackGenres(trackArtists: DataFrame, artistLatest: DataFrame): DataFrame =
    trackArtists.alias("ta")
      .join(artistLatest.alias("al"),
        col("ta.artist_id") === col("al.artist_id"), "left")
      .groupBy(col("ta.ingest_ts"), col("ta.track_id"), col("ta.track_name"))
      .agg(
        array_sort(array_distinct(transform(
          flatten(collect_list(coalesce(col("al.genres"), array().cast("array<string>")))),
          g => lower(g)))).as("all_genres"),
      )

  /** v_track_is_techno (002:47-58): lower the genres, filter the ones
    * containing 'techno', flag length(matched) > 0.
    */
  def vTrackIsTechno(trackGenres: DataFrame): DataFrame = {
    val lowered = transform(col("all_genres"), g => lower(g))
    val matched = filter(lowered, g => g.contains("techno"))
    trackGenres.select(
      col("ingest_ts"), col("track_id"), col("track_name"), col("all_genres"),
      matched.as("matched"),
      (size(matched) > 0).as("is_techno"),
    )
  }

  /** Register the full cascade as temp views over the given base tables,
    * mirroring 002's `CREATE VIEW` set; `spark.sql("SELECT … FROM
    * v_track_is_techno")` then plans the whole inlined tree.
    */
  def registerAll(spark: SparkSession, tracks: DataFrame, artists: DataFrame): Unit = {
    tracks.createOrReplaceTempView("spotify_tracks")
    artists.createOrReplaceTempView("spotify_artists")
    val al = vArtistLatest(artists)
    al.createOrReplaceTempView("v_artist_latest")
    val ta = vTrackArtists(tracks)
    ta.createOrReplaceTempView("v_track_artists")
    val tg = vTrackGenres(ta, al)
    tg.createOrReplaceTempView("v_track_genres")
    vTrackIsTechno(tg).createOrReplaceTempView("v_track_is_techno")
  }
}
