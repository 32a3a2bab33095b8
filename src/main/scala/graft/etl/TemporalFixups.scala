package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, TimestampType}

/** Pure column expressions replicating the reference MV's tolerant
  * temporal parsing (001_init_spotify_tracks.sql:53-73). Shared by the
  * batch and streaming paths so their semantics cannot drift.
  *
  * All functions are total: they never throw on garbage input (ANSI mode
  * is on in Spark 4, so plain casts would throw — we use try_* forms).
  */
object TemporalFixups {

  /** `parseDateTimeBestEffortOrNull(s)` (001:54,72): best-effort ISO
    * parse, null on failure. Reference producers emit ISO-8601 `...Z`
    * (spotify_metadata_to_kafka.py:74); try_cast also tolerates
    * `yyyy-MM-dd HH:mm:ss` and plain dates.
    */
  def bestEffortTs(c: Column): Column = c.try_cast(TimestampType)

  /** `coalesce(parseDateTimeBestEffortOrNull(ingest_ts), now())` (001:54). */
  def ingestTsOrNow(c: Column): Column = coalesce(bestEffortTs(c), current_timestamp())

  /** `coalesce(parseDateTimeBestEffortOrNull(added_at), ingest_ts)` (001:72). */
  def addedAtOrIngest(addedAt: Column, ingestTs: Column): Column =
    coalesce(bestEffortTs(addedAt), ingestTs)

  /** The release-date fixup (001:58-70), bit-for-bit:
    * {{{
    * coalesce(
    *   toDateOrNull(
    *     if(length(s) = 4 AND match(s, '^[0-9]{4}$'), concat(s, '-01-01'),
    *        left(s, 10))),
    *   toDate('1970-01-01'))
    * }}}
    * Year-precision "2024" → 2024-01-01; full timestamps truncate to the
    * date prefix; anything unparseable → epoch date.
    */
  def releaseDateFix(c: Column): Column = {
    val normalized = when(length(c) === 4 && c.rlike("^[0-9]{4}$"), concat(c, lit("-01-01")))
      .otherwise(substring(c, 1, 10))
    // Strict yyyy-MM-dd shape before the cast: Spark's date cast accepts
    // loose forms the reference's toDateOrNull rejects (e.g. "99999" as
    // year +99999, "2024-1-1"), so guard to the exact 10-char form.
    val dated = when(normalized.rlike("^[0-9]{4}-[0-9]{2}-[0-9]{2}$"), normalized.try_cast(DateType))
    coalesce(dated, to_date(lit("1970-01-01")))
  }

  /** `toYYYYMM(ts)` (001:21) — the partition column for the tracks table. */
  def toYyyyMm(ts: Column): Column = date_format(ts, "yyyyMM")
}
