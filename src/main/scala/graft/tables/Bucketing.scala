package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins — the storage-level shuffle eliminator for
  * repeated fact-to-fact joins (SURVEY §4 names partitioning as the one
  * storage requirement; this is its join-side complement).
  *
  * Writing both sides bucketed by the join key into the warehouse means
  * a subsequent equi-join reads pre-hashed buckets and Catalyst plans a
  * SortMergeJoin with NO Exchange on either side: at 100 TB this is the
  * difference between re-shuffling the fact table on every run of a
  * recurring pipeline and shuffling once at write time.
  *
  * Spark bucketing requires a table catalog (`saveAsTable`) — plain
  * parquet paths carry no bucket metadata.
  */
object Bucketing {

  /** Write `df` as a managed bucketed table (overwrite). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key. With equal
    * bucket counts the planner proves co-partitioning and emits no
    * shuffle (assert via the plan: no "Exchange" above either scan).
    */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
