package graft

import graft.operators.Skew
import graft.queries.AsOfJoin
import org.apache.spark.sql.functions._

/** Salted-join equivalence and as-of join semantics. */
class SkewAsOfSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("salted join == plain join on skewed data, dim replicated by salts") {
    import spark.implicits._
    // 90% of fact rows on one key — the classic hot-key shape
    val fact = (1 to 1000).map(i => (if (i <= 900) 1L else (i % 50).toLong, i.toLong))
      .toDF("k", "row_id")
    val dim = (0L to 49L).map(k => (k, s"dim$k")).toDF("k", "payload")

    val plain = fact.join(dim, "k").select("row_id", "payload")
    val salted = Skew.saltedJoin(fact, dim, "k", col("row_id"), salts = 8)
      .select("row_id", "payload")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)

    // fact rows for the hot key actually spread over multiple salt buckets
    val buckets = fact.withColumn("__salt", pmod(xxhash64(col("row_id")), lit(8)))
      .filter(col("k") === 1).select("__salt").distinct().count()
    assert(buckets > 4)
  }

  test("as-of join: latest right row at-or-before left time, null before history") {
    import spark.implicits._
    val quotes = Seq((1L, 10, "a"), (1L, 20, "b"), (2L, 15, "c"))
      .toDF("k", "t", "q")
    val trades = Seq((1L, 5, 100), (1L, 10, 101), (1L, 25, 102), (2L, 14, 103), (3L, 9, 104))
      .toDF("k", "t", "trade_id")
    val out = AsOfJoin.asOf(trades, quotes, "k", "t", "t", Seq("q"))
      .select("trade_id", "q").collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out === Map(
      100 -> null,  // before any quote for k=1
      101 -> "a",   // quote AT trade time is visible (<=)
      102 -> "b",   // latest prior
      103 -> null,  // k=2 quote is later
      104 -> null,  // no quotes for k=3
    ))
  }

  test("approx sketches track exact within tolerance (HLL, quantiles)") {
    val docs = spark.read.parquet(s"$dir/events.parquet")
    val row = docs.agg(
      approx_count_distinct(col("user_id")).as("approx_users"),
      countDistinct(col("user_id")).as("exact_users"),
      percentile_approx(col("value"), lit(0.5), lit(1000)).as("p50_approx"),
      expr("percentile(value, 0.5)").as("p50_exact"),
    ).head()
    val (au, eu) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(au - eu) / eu < 0.05, s"HLL $au vs exact $eu")
    assert(math.abs(row.getDouble(2) - row.getDouble(3)) <=
      math.abs(row.getDouble(3)) * 0.05 + 1e-6)
  }
}
