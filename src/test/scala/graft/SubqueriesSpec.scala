package graft

import graft.queries.{Subqueries, TrainingPrep}
import org.apache.spark.sql.functions._

/** Plan-shape and semantic checks for the TPC-H subquery tranche and
  * the training-prep operators. The correctness gates pin the VALUES
  * against DuckDB; these tests pin the PLANS — at 100 TB the
  * difference between a decorrelated semi join and a per-row re-scan
  * is the whole query.
  */
class SubqueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q4 EXISTS decorrelates to a left semi join (no per-row subquery)") {
    val plan = Subqueries.q4ExistsPriority(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected LeftSemi in:\n$plan")
    assert(!plan.toLowerCase.contains("exists("),
      s"predicate subquery should be rewritten away:\n$plan")
  }

  test("q21 EXISTS + NOT EXISTS decorrelate to one semi and one anti join") {
    val plan = Subqueries.q21SoleSupplier(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected LeftSemi in:\n$plan")
    assert(plan.contains("LeftAnti"), s"expected LeftAnti in:\n$plan")
  }

  test("q11 global total is a one-row scalar subquery, not a per-group re-aggregate") {
    val qe = Subqueries.q11ValueShare(spark, dir).queryExecution
    // the uncorrelated aggregate survives as a scalar-subquery node
    // evaluated once (physical Subquery), never a join that would
    // recompute it per row
    assert(qe.executedPlan.toString.contains("Subquery"),
      s"expected a scalar Subquery node in:\n${qe.executedPlan}")
    // threshold semantics: every returned nation holds > 4% of the
    // DECIMAL-exact global total
    val rows = Subqueries.q11ValueShare(spark, dir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getDouble(1)).sum // returned rows only, lower bound
    assert(rows.forall(_.getDouble(1) > 0))
    assert(total > 0)
  }

  test("q13 outer join keeps every customer: histogram matches a direct recount") {
    val rows = Subqueries.q13OrderDist(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // recompute the same histogram from raw tables with a hand-rolled
    // retention-safe shape (count per customer from the orders side,
    // then re-attach order-less customers with 0) — an inner-join slip
    // in q13 would disagree whenever a zero bucket exists, and the
    // total always equals the customer count
    val cust = spark.read.parquet(s"$dir/customer.parquet")
    val perCust = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
    val expected = cust.join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(coalesce(col("n"), lit(0L)).as("c_count"))
      .groupBy("c_count").agg(count(lit(1)).as("custdist"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == expected)
    assert(rows.values.sum == cust.count(), "every customer lands in exactly one bucket")
  }

  test("q18 threshold is DECIMAL-exact: every row's quantity sum exceeds 250") {
    val rows = Subqueries.q18LargeOrders(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getDouble(5) > 250.0))
  }

  test("chunking is shuffle-free compute: only the gate sort exchanges") {
    val plan = TrainingPrep.chunkSliding(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"chunking must not shuffle on any key:\n$plan")
  }

  test("chunks tile each document: union of chunk tokens == doc tokens, stride overlap held") {
    // collect_list gives no intra-group order, so group+sort driver-side
    val chunks = TrainingPrep.chunkSliding(spark, dir).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
      .groupBy(_._1)
      .view.mapValues(_.sortBy(_._2).map(_._3.split(" ").toSeq)).toMap
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    assert(chunks.keySet == docs.keySet)
    docs.foreach { case (docId, toks) =>
      val chunkToks = chunks(docId)
      // stride tiling: chunk i starts at i*S, so concatenating each
      // chunk's first S tokens (all of the last chunk) rebuilds the doc
      val rebuilt = chunkToks.init.flatMap(_.take(24)) ++ chunkToks.last
      assert(rebuilt == toks, s"doc $docId not tiled: $rebuilt vs $toks")
      assert(chunkToks.size - 1 == (toks.size - 1) / 24,
        s"doc $docId chunk count off")
    }
  }

  test("contamination: benchmark docs are excluded and planted near-dups are caught") {
    val rows = TrainingPrep.contamination(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(0) % 29 != 0), "bench split must not be scored")
    assert(rows.forall(r => r.getLong(2) <= r.getLong(1)), "hits bounded by grams")
    // the documents table plants near-duplicate pairs; with a 1/29
    // bench split some dup crosses the boundary and scores overlap > 0
    assert(rows.exists(_.getDouble(3) > 0.5),
      "expected at least one contaminated doc (near-dup across the split)")
  }

  test("token entropy bounds: 0 <= H <= ln(n_tokens), ttr = distinct/total") {
    val rows = TrainingPrep.tokenEntropy(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, d, h, ttr) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
      // 1e-5 slack: the gate rounds H to 6 decimals, which can nudge a
      // uniform-distribution doc's H just past the exact ln bound
      assert(h >= 0.0 && h <= math.log(n.toDouble) + 1e-5,
        s"doc ${r.getLong(0)}: H=$h out of [0, ln($n)]")
      assert(math.abs(ttr - d.toDouble / n) < 1e-6)
      // uniform-over-distinct upper bound: H <= ln(n_distinct)
      assert(h <= math.log(d.toDouble) + 1e-5)
    }
  }
}
