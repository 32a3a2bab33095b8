package graft.media

import graft.media.MediaFeatures.MediaFeature
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Image near-duplicate pairs over DECODED features — the multimodal
  * leg of the dedup family: two images whose normalized luminance
  * histograms (from [[ImageDecoder]]) are within an L1 budget are
  * near-dups (same exposure signature — the first-pass screen a crawl
  * pipeline runs before any pixel-level compare).
  *
  * Scale shape (the [[graft.queries.LlmDedup]] banding discipline —
  * never all-pairs): candidates BLOCK on the histogram's argmax bin —
  * a near-identical image keeps its dominant-luminance bin, so true
  * near-dups collide while the corpus splits into `featureDim`-way
  * buckets; the exact L1 test runs on within-bucket pairs only.
  * Approximate by construction (a pair straddling two argmax bins at
  * near-equal mass is missed — the simhash-band recall trade, stated);
  * candidate volume is Σ_bucket n_b², measured sub-quadratic in
  * [[ImageNearDupSpec]].
  */
object ImageNearDup {

  /** Dominant-luminance bin (1-based; first occurrence on ties) — the
    * shared blocking key.
    */
  private val argmaxBin =
    expr("array_position(features, array_max(features))")

  /** Dominant-luminance blocking key + exact within-block L1 compare.
    * Emits (id_a < id_b, l1) for pairs with L1 ≤ `maxL1`.
    */
  def histNearDupPairs(feats: Dataset[MediaFeature], maxL1: Double): DataFrame = {
    val df = feats.toDF().select(col("media_id"), col("features"))
      .withColumn("fd", transform(col("features"),
        x => x.cast(org.apache.spark.sql.types.DoubleType)))
      .withColumn("bkey", argmaxBin)
      .select(col("media_id"), col("fd"), col("bkey"))
    val l1 = aggregate(
      zip_with(col("a_fd"), col("b_fd"), (x, y) => abs(x - y)),
      lit(0.0), (acc, x) => acc + x)
    df.as("a").join(df.as("b"),
        col("a.bkey") === col("b.bkey") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        col("a.fd").as("a_fd"), col("b.fd").as("b_fd"))
      .withColumn("l1", l1)
      .filter(col("l1") <= maxL1)
      .select(col("id_a"), col("id_b"), round(col("l1"), 6).as("l1"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Candidate-pair count per blocking bucket — the growth-curve probe
    * ([[ImageNearDupSpec]] asserts Σ n_b² ≪ n²).
    */
  def candidateCounts(feats: Dataset[MediaFeature]): DataFrame =
    feats.toDF().select(col("media_id"), col("features"))
      .withColumn("bkey", argmaxBin)
      .groupBy(col("bkey")).agg(count(lit(1)).as("n"))
      .select(col("bkey"), col("n"),
        expr("n * (n - 1) DIV 2").as("pairs"))
}
