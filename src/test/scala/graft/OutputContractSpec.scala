package graft

/** Mechanical guard for the driver-comparator output contract
  * (VERDICT r13 #1b): the driver's pandas `sort_values → factorize`
  * compare cannot hash array/map/struct cells, so NO gated query may
  * emit a nested top-level column — it must be canonicalized to a
  * '|'-joined string first (the CORRECTNESS_r01 convention,
  * ReferenceOps.genrePipeline). This slipped through twice (r12, r13)
  * because the local tools/check.py mirror CAN hash lists; schema-only
  * analysis is cheap (no execution), so every registered query is
  * swept here on every `sbt test`.
  */
class OutputContractSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("no gated query output schema contains array/map/struct columns") {
    val offenders = SparkEntry.allDefs.sortBy(_.name).flatMap { d =>
      val nested = OutputContract.unhashableColumns(d.fn(spark, dir).schema)
      if (nested.nonEmpty) Some(s"${d.name}: ${nested.mkString(", ")}") else None
    }
    assert(offenders.isEmpty,
      "pandas-unhashable gated outputs (array_join them per the r01 " +
        s"convention):\n${offenders.mkString("\n")}")
  }

  test("bench-only twins honor the same contract (Bench executes them)") {
    val offenders = SparkEntry.benchOnlyDefs.sortBy(_.name).flatMap { d =>
      val nested = OutputContract.unhashableColumns(d.fn(spark, dir).schema)
      if (nested.nonEmpty) Some(s"${d.name}: ${nested.mkString(", ")}") else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("the guard is red on a deliberately array-emitting fixture") {
    import org.apache.spark.sql.functions._
    val fixture = spark.range(3).select(
      col("id"), array(col("id"), col("id") * 2).as("pair"))
    val nested = OutputContract.unhashableColumns(fixture.schema)
    assert(nested == Seq("pair: array<bigint>"),
      s"guard must flag the raw array column, got: $nested")
    // and the canonicalized form passes
    val fixed = fixture.select(col("id"), array_join(col("pair"), "|").as("pair"))
    assert(OutputContract.unhashableColumns(fixed.schema).isEmpty)
  }

  test("map and struct cells are flagged too (pandas dicts are unhashable)") {
    import org.apache.spark.sql.functions._
    val fixture = spark.range(1).select(
      map(lit("k"), col("id")).as("m"),
      struct(col("id").as("a")).as("s"))
    assert(OutputContract.unhashableColumns(fixture.schema).size == 2)
  }
}
