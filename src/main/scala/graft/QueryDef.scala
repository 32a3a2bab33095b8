package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark implementation plus (where the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle over the same
  * parquet tables. Bench runs every registered query.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)

/** Testdata table access ([[TESTDATA.md]]): one parquet file per table. */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is nanosecond parquet, which Spark 4 rejects outright.
      // The session (built via graft.Sessions) sets
      // spark.sql.legacy.parquet.nanosAsLong=true so nanos arrive as
      // long; truncating to a microsecond timestamp matches DuckDB's
      // CAST(ts AS TIMESTAMP), so both engines see identical instants.
      // (testdata timestamps are all post-epoch, so integer DIV == floor.)
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts DIV 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
}
