package graft.ingest

import java.nio.file.{Files, Path, Paths}
import java.time.Instant
import java.time.format.DateTimeFormatter
import java.time.ZoneOffset
import scala.jdk.CollectionConverters._

/** K1 + S5 — the raw landing zone.
  *
  * K1 (spotify_ingest.py:128-134): dump the accumulated playlist items to
  * a UTC-stamped `playlist_{id}_{ts}.json` file (a single JSON array,
  * matching the reference fixture's shape exactly).
  *
  * S5 (spotify_metadata_to_kafka.py:17-27): resolve the newest landed
  * file by mtime — the downstream DAGs always process "latest run only".
  */
object Landing {

  private val stamp = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HHmmss'Z'")
    .withZone(ZoneOffset.UTC)

  /** K1: land raw item JSON strings as one `[...]` array file. */
  def landRaw(items: Seq[String], rawDir: String, playlistId: String,
      ts: Instant): Path = {
    val dir = Paths.get(rawDir)
    Files.createDirectories(dir)
    val f = dir.resolve(s"playlist_${playlistId}_${stamp.format(ts)}.json")
    Files.writeString(f, items.mkString("[", ",", "]"))
    f
  }

  /** S5: newest `*.json` by mtime; None when the dir is empty/absent
    * (downstream then no-ops — P4 semantics).
    */
  def latestRawFile(rawDir: String): Option[Path] = {
    val dir = Paths.get(rawDir)
    if (!Files.isDirectory(dir)) None
    else {
      val stream = Files.list(dir) // must close: holds a directory fd
      try stream.iterator().asScala
        .filter(p => p.toString.endsWith(".json") && Files.isRegularFile(p))
        .maxByOption(p => Files.getLastModifiedTime(p).toMillis)
      finally stream.close()
    }
  }
}
