package graft.queries

import graft.QueryDef
import graft.etl.Normalize
import graft.schema.Schemas
import graft.views.TechnoViews
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's OWN end-to-end pipeline, driver-gated: the golden
  * playlist fixture (data/raw/spotify/playlist_18vUeZ9BdtMRNV6gI8RnR6_
  * 2025-07-30.json — 150 items, 1 year-precision date, 92 multi-artist
  * tracks) read with the declared schema, pushed through the real
  * [[Normalize]] → [[graft.etl.TemporalFixups]] → [[TechnoViews]] code,
  * and compared against a DuckDB re-derivation over the same JSON.
  *
  * This is what un-deadens the parity modules (VERDICT r1 #2): every
  * CORRECTNESS run now executes P1/P3, the MV expression list, and the
  * full 002 view cascade on reference data, not just analogues.
  *
  * Array columns are emitted as '|'-joined canonical strings (driver
  * compare can't hash arrays); the fixed ingest timestamp makes every
  * run byte-deterministic.
  */
object GoldenPipeline {

  val fixturePath =
    "/root/reference/data/raw/spotify/playlist_18vUeZ9BdtMRNV6gI8RnR6_2025-07-30.json"
  val ingestTsIso = "2025-07-30T00:00:00Z"

  def readFixtureItems(s: SparkSession): DataFrame =
    s.read.schema(Schemas.rawPlaylistItemSchema)
      .option("multiLine", true)
      .json(fixturePath)

  /** Curated tracks off the fixture (S6 → P1/P3 → MV fixups). */
  def curatedTracks(s: SparkSession): DataFrame =
    Normalize.curateTracks(
      Normalize.tracksFromPlaylistItems(readFixtureItems(s), ingestTsIso))

  /** `ref_golden_curate`: the normalize+curate output, one row per kept
    * playlist item.
    */
  def goldenCurate(s: SparkSession, dir: String): DataFrame =
    curatedTracks(s).select(
      col("ingest_ts"),
      col("track_id"),
      col("track_name"),
      array_join(col("artists"), "|").as("artists"),
      array_join(col("artist_ids"), "|").as("artist_ids"),
      col("album_id"),
      col("album_name"),
      col("release_date"),
      col("popularity"),
      col("added_at"),
      col("external_url"),
    ).orderBy(col("track_id"), col("added_at"))

  private val duckItems =
    s"""read_json('$fixturePath', format='array', columns={
       |  'added_at': 'VARCHAR',
       |  'track': 'STRUCT(id VARCHAR, name VARCHAR, popularity BIGINT,
       |            preview_url VARCHAR,
       |            external_urls STRUCT(spotify VARCHAR),
       |            album STRUCT(id VARCHAR, name VARCHAR, release_date VARCHAR,
       |                         release_date_precision VARCHAR),
       |            artists STRUCT(id VARCHAR, name VARCHAR)[])'})""".stripMargin

  val goldenCurateOracle: String =
    s"""SELECT
       | TIMESTAMP '2025-07-30 00:00:00' AS ingest_ts,
       | COALESCE(track.id, '') AS track_id,
       | COALESCE(track.name, '') AS track_name,
       | array_to_string(list_transform(track.artists, a -> COALESCE(a.name, '')), '|') AS artists,
       | array_to_string(list_transform(track.artists, a -> COALESCE(a.id, '')), '|') AS artist_ids,
       | COALESCE(track.album.id, '') AS album_id,
       | COALESCE(track.album.name, '') AS album_name,
       | CASE WHEN length(rd) = 4 AND regexp_matches(rd, '^[0-9]{4}$$')
       |      THEN COALESCE(TRY_CAST(rd || '-01-01' AS DATE), DATE '1970-01-01')
       |      ELSE COALESCE(TRY_CAST(substr(rd, 1, 10) AS DATE), DATE '1970-01-01') END AS release_date,
       | CAST(COALESCE(track.popularity, 0) AS INTEGER) AS popularity,
       | COALESCE(TRY_CAST(added_at AS TIMESTAMP), TIMESTAMP '2025-07-30 00:00:00') AS added_at,
       | COALESCE(track.external_urls.spotify, '') AS external_url
       |FROM (
       |  SELECT *, COALESCE(track.album.release_date, '1970-01-01') AS rd
       |  FROM $duckItems)
       |WHERE COALESCE(track.id, '') <> ''
       |ORDER BY track_id, added_at""".stripMargin

  /** `ref_techno_cascade`: the full 002 view cascade — explode artist_ids
    * (J2) → argMax latest artist state (A1) → left join (J1) → groupArray
    * + flatten + lower + distinct (A2/§2.7) → techno filter + flag — over
    * a deterministic two-snapshot synthetic `spotify_artists` dimension
    * derived from the fixture's own artist ids (the stale snapshot says
    * everyone is 'pop', the fresh one applies a digit-prefix rule; the
    * cascade must pick the fresh one via argMax).
    */
  /** Deterministic two-snapshot synthetic `spotify_artists` dimension
    * derived from the fixture's own artist ids — shared by the DF-API
    * and SQL-text cascade gates.
    */
  def syntheticArtists(tracks: DataFrame): DataFrame = {
    val ids = tracks.select(explode(col("artist_ids")).as("artist_id")).distinct()
    def snap(ts: String, name: String, genres: org.apache.spark.sql.Column) =
      ids.select(
        to_timestamp(lit(ts)).as("ingest_ts"),
        col("artist_id"),
        lit(name).as("artist_name"),
        genres.as("genres"),
        lit(0).as("popularity"),
        lit(0L).as("followers_total"),
      )
    val freshGenres = when(substring(col("artist_id"), 1, 1).between("0", "9"),
      array(lit("Hard Techno"))).otherwise(array(lit("house")))
    snap("2025-07-29 00:00:00", "stale", array(lit("pop")))
      .unionByName(snap("2025-07-30 00:00:00", "fresh", freshGenres))
  }

  def goldenTechno(s: SparkSession, dir: String): DataFrame = {
    val tracks = curatedTracks(s)
    val artists = syntheticArtists(tracks)
    val al = TechnoViews.vArtistLatest(artists)
    val ta = TechnoViews.vTrackArtists(tracks)
    val flagged = TechnoViews.vTrackIsTechno(TechnoViews.vTrackGenres(ta, al))
    flagged.select(
      col("track_id"),
      col("track_name"),
      array_join(col("all_genres"), "|").as("all_genres"),
      array_join(col("matched"), "|").as("matched"),
      col("is_techno"),
    ).orderBy(col("track_id"), col("track_name"))
  }

  /** `ref_techno_sql`: the SAME cascade, but resolved the way the
    * reference actually reads it — SQL text over the registered view
    * set (002:47-58, Superset's access path). [[TechnoViews.registerAll]]
    * mirrors 002's `CREATE VIEW` statements; the query below is the
    * analyst-facing `SELECT` that Catalyst inlines through all four
    * views. Gated against the same DuckDB oracle as the DF-API form, so
    * the gate proves text-SQL resolution ≡ DataFrame composition.
    */
  def goldenTechnoSql(s: SparkSession, dir: String): DataFrame = {
    val tracks = curatedTracks(s)
    TechnoViews.registerAll(s, tracks, syntheticArtists(tracks))
    s.sql(
      """SELECT track_id, track_name,
        |  array_join(all_genres, '|') AS all_genres,
        |  array_join(matched, '|') AS matched,
        |  is_techno
        |FROM v_track_is_techno
        |ORDER BY track_id, track_name""".stripMargin)
  }

  val goldenTechnoOracle: String =
    s"""WITH tracks AS (
       |  SELECT COALESCE(track.id, '') AS track_id,
       |         COALESCE(track.name, '') AS track_name,
       |         list_transform(track.artists, a -> COALESCE(a.id, '')) AS artist_ids
       |  FROM $duckItems
       |  WHERE COALESCE(track.id, '') <> ''),
       |ta AS (
       |  SELECT track_id, track_name, unnest(artist_ids) AS artist_id FROM tracks),
       |ids AS (SELECT DISTINCT artist_id FROM ta),
       |snaps AS (
       |  SELECT TIMESTAMP '2025-07-29 00:00:00' AS ingest_ts, artist_id, ['pop'] AS genres FROM ids
       |  UNION ALL
       |  SELECT TIMESTAMP '2025-07-30 00:00:00', artist_id,
       |    CASE WHEN substr(artist_id, 1, 1) BETWEEN '0' AND '9'
       |         THEN ['Hard Techno'] ELSE ['house'] END FROM ids),
       |al AS (SELECT artist_id, arg_max(genres, ingest_ts) AS genres FROM snaps GROUP BY artist_id),
       |tg AS (
       |  SELECT ta.track_id, ta.track_name,
       |    list_sort(list_distinct(list_transform(
       |      flatten(list(COALESCE(al.genres, []))), g -> lower(g)))) AS all_genres
       |  FROM ta LEFT JOIN al USING (artist_id)
       |  GROUP BY ta.track_id, ta.track_name)
       |SELECT track_id, track_name,
       |  array_to_string(all_genres, '|') AS all_genres,
       |  array_to_string(list_filter(all_genres, g -> contains(g, 'techno')), '|') AS matched,
       |  len(list_filter(all_genres, g -> contains(g, 'techno'))) > 0 AS is_techno
       |FROM tg ORDER BY track_id, track_name""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("ref_golden_curate", goldenCurate, Some(goldenCurateOracle)),
    QueryDef("ref_techno_cascade", goldenTechno, Some(goldenTechnoOracle)),
    QueryDef("ref_techno_sql", goldenTechnoSql, Some(goldenTechnoOracle)),
  )
}
