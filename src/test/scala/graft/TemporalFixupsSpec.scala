package graft

import graft.etl.TemporalFixups
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Unit + property coverage of the MV's tolerant temporal expressions
  * (001:53-73). The property: `releaseDateFix` is TOTAL — any string
  * (or null) yields a valid non-null date, never a throw (SURVEY §5.4).
  */
class TemporalFixupsSpec extends SparkSpec {
  import spark.implicits._

  private def fixed(inputs: Seq[String]): Map[String, String] =
    inputs.toDF("s")
      .select(col("s"), date_format(TemporalFixups.releaseDateFix(col("s")), "yyyy-MM-dd").as("d"))
      .collect().map(r => Option(r.getString(0)).getOrElse("<null>") -> r.getString(1)).toMap

  test("releaseDateFix: year → -01-01, timestamp → prefix, garbage → epoch") {
    val out = fixed(Seq("2024", "2023-05-17", "2023-05-17T10:11:12Z",
      "not-a-date", "", "0000", "99999", "2024-13-45"))
    assert(out("2024") === "2024-01-01")
    assert(out("2023-05-17") === "2023-05-17")
    assert(out("2023-05-17T10:11:12Z") === "2023-05-17")
    assert(out("not-a-date") === "1970-01-01")
    assert(out("") === "1970-01-01")
    assert(out("99999") === "1970-01-01")   // 5 digits: not the year branch
    assert(out("2024-13-45") === "1970-01-01") // month 13: unparseable
  }

  test("releaseDateFix is total over arbitrary strings (property)") {
    val gen = Gen.listOfN(400, Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.numStr,
      Gen.listOfN(4, Gen.numChar).map(_.mkString),
      Gen.const(null: String),
    ))
    val samples = gen.pureApply(Gen.Parameters.default, Seed(42L))
    val df = samples.toDF("s")
      .select(TemporalFixups.releaseDateFix(col("s")).as("d"))
    // never throws, never null, always a real date
    assert(df.filter(col("d").isNull).count() === 0)
    assert(df.count() === 400)
    // 4-digit-year inputs hit the year branch exactly
    val years = samples.filter(s => s != null && s.matches("^[0-9]{4}$"))
    if (years.nonEmpty) {
      val out = fixed(years)
      years.foreach { y =>
        val expected =
          if (y.toInt >= 1 && y.toInt <= 9999) f"${y.toInt}%04d-01-01" else "1970-01-01"
        assert(out(y) === expected, s"input $y")
      }
    }
  }

  test("bestEffortTs: ISO-Z, space-separated, and garbage") {
    val rows = Seq("2025-07-18T09:27:45Z", "2025-07-18 09:27:45", "nope", null)
      .toDF("s")
      .select(date_format(TemporalFixups.bestEffortTs(col("s")), "yyyy-MM-dd HH:mm:ss").as("t"))
      .collect().map(r => Option(r.getString(0)))
    assert(rows(0) === Some("2025-07-18 09:27:45")) // Z = UTC, session is UTC
    assert(rows(1) === Some("2025-07-18 09:27:45"))
    assert(rows(2) === None)
    assert(rows(3) === None)
  }

  test("addedAtOrIngest falls back to ingest_ts (001:72)") {
    val out = Seq(("bad", "2025-07-30T00:00:00Z"))
      .toDF("added_at", "ingest_raw")
      .select(date_format(TemporalFixups.addedAtOrIngest(col("added_at"),
        TemporalFixups.ingestTsOrNow(col("ingest_raw"))), "yyyy-MM-dd").as("d"))
      .head().getString(0)
    assert(out === "2025-07-30")
  }

  test("toYyyyMm yields the partition key format (001:21)") {
    val out = Seq("2025-07-30T10:00:00Z").toDF("s")
      .select(TemporalFixups.toYyyyMm(TemporalFixups.bestEffortTs(col("s"))))
      .head().getString(0)
    assert(out === "202507")
  }
}
