package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed equi-joins: when one join key carries a
  * disproportionate share of the fact rows, a plain shuffle join lands
  * that key's entire volume on one task. Salting splits each fact key
  * into `salts` sub-keys (deterministically, from a row-identifying
  * column — no rand(), so retries/replays are stable) and replicates
  * the dimension row once per salt; the join then spreads the hot key
  * over `salts` tasks.
  *
  * AQE's skew-join handling (on by default) covers sort-merge joins at
  * runtime; explicit salting remains the tool when the skew is extreme
  * enough that even one AQE split is too large, when the join is
  * broadcast-ineligible, or for aggregations (salt → partial agg →
  * unsalt → final agg).
  *
  * Replication factor is `salts` on the DIMENSION side only — the fact
  * table is never duplicated.
  */
object Skew {

  /** Inner-join `fact` to `dim` on `key`, salted `salts` ways using
    * `factRowId` (any column, ideally high-cardinality) to spread fact
    * rows across salt buckets.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      factRowId: Column, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt", pmod(xxhash64(factRowId), lit(salts)))
    val saltedDim = dim
      .withColumn("__salt", explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
