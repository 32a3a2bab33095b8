package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Pre-fan spreading for compute-heavy projections over unsplittable
  * inputs (spark_optimization_guide §2.5 "input skew: one huge
  * unsplittable file ... repartition immediately after the read").
  *
  * The bench testdata ships each table as ONE single-row-group parquet
  * file, so a scan is ONE task no matter how expensive the per-row
  * work stacked on it is — a Monte-Carlo hash fan (⌈R/4⌉ md5s per row
  * × an R-way explode) runs serially on one core of 32 (r18 profile:
  * 2.4 s single-task stages in the bootstrap/permutation gates). A
  * plain `repartition(cols)` does not fix it: AQE sizes the exchange
  * by BYTES and coalesces the few-MB shuffle right back to 1-2
  * partitions, blind to the downstream fan cost. An EXPLICIT partition
  * count is respected by AQE, so the fan actually spreads.
  *
  * The count is the session's `defaultParallelism` (total cores), not
  * a constant: on the bench box that is `local[n]`'s n, on a cluster
  * the executor-core total — the natural width for a CPU-bound fan.
  * Hash-partitioned on a DETERMINISTIC key column (never rand() —
  * retried tasks must reproduce their rows, SPARK-38388), so the row
  * set is unchanged and replays are stable. On a many-file production
  * layout the exchange moves only the already-projected narrow rows
  * once, before the fan multiplies them R-fold.
  */
object Spread {
  def byKey(df: DataFrame, key: Column): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, key)
}
