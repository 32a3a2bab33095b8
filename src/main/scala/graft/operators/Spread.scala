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
  * The count is `max(defaultParallelism, spark.sql.shuffle.partitions)`
  * (VERDICT r18 #3: `defaultParallelism` ALONE is a scale bug — a
  * 100 TB fact arrives in thousands of scan tasks, and repartitioning
  * it down to exactly #cores would produce multi-GB tasks with no
  * retry granularity; `spark.sql.shuffle.partitions` is the knob that
  * is raised with corpus size, so taking the max keeps the fan at
  * data-proportional width on a cluster while still forcing full core
  * width on the bench box, where both values equal the core count).
  * Hash-partitioned on a DETERMINISTIC key column (never rand() —
  * retried tasks must reproduce their rows, SPARK-38388), so the row
  * set is unchanged and replays are stable. On a many-file production
  * layout the exchange moves only the already-projected narrow rows
  * once, before the fan multiplies them R-fold.
  *
  * CAP CAVEAT (ADVICE r18): an explicit-count repartition disables
  * AQE coalescing AND skew-splitting for this one exchange — per-task
  * slices are |input|/width with no runtime skew remedy. That is the
  * point (AQE's byte-sizing is exactly what serialised the fan), but
  * it means the key must spread well: callers pass high-cardinality
  * deterministic ids (event_id, o_orderkey), never a low-cardinality
  * or hot-keyed column.
  */
object Spread {
  def byKey(df: DataFrame, key: Column): DataFrame = {
    val s = df.sparkSession
    val width = math.max(s.sparkContext.defaultParallelism,
      s.conf.get("spark.sql.shuffle.partitions", "200").toInt)
    df.repartition(width, key)
  }
}
