package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink format coverage beyond parquet: ORC, CSV and JSON must
  * round-trip the engine's row shapes losslessly, and the columnar
  * formats must keep the scan-level optimizations (predicate pushdown,
  * column pruning) the 100 TB posture depends on. spark-avro is not on
  * this classpath (only Avro's serialization jars ship with core), so
  * Avro is intentionally absent.
  */
class FormatsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def docs = Tables.t(spark, dir, "documents")

  test("ORC round-trips documents exactly, with snappy and zlib") {
    Seq("snappy", "zlib").foreach { codec =>
      val out = tmpDir(s"fmt-orc-$codec")
      docs.write.mode("overwrite").option("compression", codec).orc(out)
      val back = spark.read.orc(out)
      assert(back.schema === docs.schema)
      assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
    }
  }

  test("ORC scans push filters and prune columns like parquet") {
    val out = tmpDir("fmt-orc-scan")
    docs.write.mode("overwrite").orc(out)
    val plan = spark.read.orc(out)
      .filter(col("n_chars") > 300)
      .select(col("doc_id"), col("n_chars"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,300)]"),
      s"ORC should push the n_chars filter:\n${plan.take(800)}")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,n_chars:bigint>"),
      "ORC should prune to the projected columns")
  }

  test("CSV round-trips flat columns with declared schema + header") {
    val flat = docs.select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    val out = tmpDir("fmt-csv")
    flat.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read
      .schema(StructType(Seq(
        StructField("doc_id", LongType), StructField("lang", StringType),
        StructField("source", StringType), StructField("n_chars", LongType))))
      .option("header", "true").csv(out)
    assert(back.exceptAll(flat).isEmpty && flat.exceptAll(back).isEmpty)
  }

  test("CSV quotes and escapes delimiter-bearing text losslessly") {
    import spark.implicits._
    val tricky = Seq(
      (1L, """plain text"""),
      (2L, """comma, inside"""),
      (3L, """quote " inside"""),
      (4L, "newline \n inside"),
    ).toDF("id", "s")
    val out = tmpDir("fmt-csv-quote")
    tricky.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read
      .schema(StructType(Seq(StructField("id", LongType), StructField("s", StringType))))
      .option("header", "true").option("multiLine", "true").csv(out)
    assert(back.exceptAll(tricky).isEmpty && tricky.exceptAll(back).isEmpty)
  }

  test("JSON lines round-trip nested arrays with declared schema") {
    val nested = docs.select(col("doc_id"), split(col("text"), " ").as("tokens"),
      struct(col("lang"), col("source")).as("meta"))
    val out = tmpDir("fmt-json")
    nested.write.mode("overwrite").json(out)
    val back = spark.read.schema(nested.schema).json(out)
    assert(back.exceptAll(nested).isEmpty && nested.exceptAll(back).isEmpty)
  }

  test("partitioned ORC write prunes partitions at the scan") {
    val out = tmpDir("fmt-orc-part")
    docs.write.mode("overwrite").partitionBy("lang").orc(out)
    val plan = spark.read.orc(out).filter(col("lang") === "en")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"lang filter should become a partition filter:\n${plan.take(800)}")
  }
}
