package graft

import graft.tables.Bucketing
import org.apache.spark.sql.functions._

/** Proof that bucketed writes eliminate the join shuffle: the physical
  * plan of a join between two same-bucketed tables has no Exchange.
  */
class BucketingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("same-bucketed tables join with zero shuffle") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")

    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get("spark-warehouse", t)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 8)
    Bucketing.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 8)

    // at sf0.001 the planner prefers broadcast (also shuffle-free, but
    // not the property under test); disable it to surface the bucketed
    // SortMergeJoin path a fact-to-fact join would take at scale
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.coLocatedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join:\n$plan")

      // and it still computes the right thing
      val viaBuckets = joined.agg(count(lit(1)), sum("l_quantity")).head()
      val direct = orders.join(lineitem, "o_orderkey")
        .agg(count(lit(1)), sum("l_quantity")).head()
      assert(viaBuckets === direct)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
