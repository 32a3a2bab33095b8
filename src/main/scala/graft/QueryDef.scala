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

/** The driver-comparator output contract: gated query results are
  * hashed by a pandas `sort_values → factorize` pipeline, which dies
  * with "unhashable type: numpy.ndarray" on ANY array/map/struct cell
  * (CORRECTNESS_r01; re-learned in r13 when `sk_hll_distinct` shipped a
  * raw `registers` array). Nested values must be canonicalized to a
  * '|'-joined string (`array_join`) BEFORE the final select. Verify
  * enforces this fail-loud so a local tools/check.py pass (which CAN
  * hash lists) can never again hide a driver failure.
  */
object OutputContract {
  import org.apache.spark.sql.types._

  /** Top-level columns the driver's pandas comparator cannot hash. */
  def unhashableColumns(schema: StructType): Seq[String] =
    schema.fields.collect {
      case f if f.dataType.isInstanceOf[ArrayType] ||
        f.dataType.isInstanceOf[MapType] ||
        f.dataType.isInstanceOf[StructType] => s"${f.name}: ${f.dataType.simpleString}"
    }.toSeq
}

/** Testdata table access ([[TESTDATA.md]]): one parquet file per table. */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts has shipped as BOTH nanosecond parquet (rounds 1-9,
      // arriving as LONG under spark.sql.legacy.parquet.nanosAsLong=true)
      // and plain microsecond parquet (round 10+, arriving as a
      // timestamp). Guard on the ACTUAL column type instead of assuming
      // one encoding — the unconditional `ts DIV 1000` broke all 27
      // events queries in round 10 when the data switched to micros
      // (ADVICE r10 #3). Every branch lands on session-zone TIMESTAMP
      // truncated to micros, which matches DuckDB's CAST(ts AS
      // TIMESTAMP) — both engines see identical instants (session tz is
      // UTC; testdata is post-epoch so integer DIV == floor).
      import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
      import org.apache.spark.sql.types._
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case LongType         => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
        case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
        case TimestampType    => df
        case other => throw new IllegalStateException(
          s"events.ts: expected LONG (nanosAsLong), TIMESTAMP_NTZ, or " +
            s"TIMESTAMP, got $other — new testdata encoding needs a branch here")
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
}
