package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** The size(filter(...)) > 0 → exists(...) optimizer rule: plan shape
  * changes, results don't.
  */
class ExistsRewriteSpec extends SparkSpec {

  test("rewrites size-filter-gt-0 to exists in the optimized plan") {
    VectorFunctions.register(spark)
    // parquet-backed source — a LocalRelation would be constant-folded
    // to literals before the plan shape can be observed
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        (size(filter(split(col("text"), " "), s => length(s) > 5)) > 0).as("has_long"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("exists("), s"expected exists-rewrite in:\n$optimized")
    assert(!optimized.contains("size("), s"size(filter) should be gone:\n$optimized")
    // semantics preserved vs the unrewritten form (computed via >= 1,
    // which the rule leaves alone)
    val control = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        (size(filter(split(col("text"), " "), s => length(s) > 5)) >= 1).as("has_long"))
    assert(df.orderBy("doc_id").collect().toSeq ===
      control.orderBy("doc_id").collect().toSeq)
  }

  test("indexed (element, index) filter lambdas are NOT rewritten and still execute") {
    // ArrayExists takes a single binder; rewriting a two-arg filter
    // lambda would MatchError at execution. The rule must skip it.
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        (size(filter(split(col("text"), " "), (s, i) => length(s) > 5 && i >= 0)) > 0)
          .as("has_long"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("exists("),
      s"indexed-filter form must not be rewritten:\n$optimized")
    // must execute without MatchError
    assert(df.count() > 0)
  }

  test("the genre pipeline's has_zh column hits the rewrite") {
    VectorFunctions.register(spark)
    val plan = graft.queries.ReferenceOps
      .genrePipeline(spark, "/root/testdata/sf0.001")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("exists("), s"genrePipeline should use exists:\n${plan.take(2000)}")
  }
}
