package graft

import org.apache.spark.sql.functions._
import graft.queries.QuantileOps

/** Driver-side imperative replays for the round-17 additions, on the
  * house pattern: each oracle-gated query also proves its algebra
  * against an independently-coded reference at sf0.001, so a mistake
  * both engines would replay identically still fails.
  */
class Round17GatesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Spark 4.1.2 PercentileBase.getPercentile order on a sorted
    * multiset (integral position returns the lower key).
    */
  private def pct(sorted: IndexedSeq[Long], q: Double): Double = {
    val pos = (sorted.length - 1).toDouble * q
    val lo = math.floor(pos).toLong
    val hi = math.ceil(pos).toLong
    if (hi == lo) sorted(lo.toInt).toDouble
    else (hi - pos) * sorted(lo.toInt).toDouble +
      (pos - lo) * sorted(hi.toInt).toDouble
  }

  test("cu_token_weighted_len replays an explicit multiset expansion") {
    val docs = Tables.t(spark, dir, "documents")
      .select(col("source"), col("n_chars"),
        size(split(col("text"), " ")).as("w"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val got = QuantileOps.tokenWeightedLen(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(got.nonEmpty)
    assert(got.map(_._1).toSeq === got.map(_._1).toSeq.sorted)
    val bySrc = docs.groupBy(_._1)
    assert(got.map(_._1).toSet === bySrc.keySet)
    got.foreach { case (src, mass, p25, p50, p75, p90) =>
      // the semantic definition, literally: repeat each length w
      // times, sort, interpolate
      val expanded = bySrc(src)
        .flatMap { case (_, len, w) => Seq.fill(w)(len) }.sorted.toIndexedSeq
      assert(mass === expanded.length.toLong, s"token_mass for $src")
      assert(p25 === r6(pct(expanded, 0.25)), s"p25 for $src")
      assert(p50 === r6(pct(expanded, 0.50)), s"p50 for $src")
      assert(p75 === r6(pct(expanded, 0.75)), s"p75 for $src")
      assert(p90 === r6(pct(expanded, 0.90)), s"p90 for $src")
      assert(p25 <= p50 && p50 <= p75 && p75 <= p90)
    }
    // the weighted median is token-mass-weighted: heavier (longer)
    // docs pull it at or above the unweighted doc-median
    val docMedians = bySrc.view.mapValues { ds =>
      pct(ds.map(_._2).sorted.toIndexedSeq, 0.5)
    }.toMap
    val pulled = got.count { case (src, _, _, p50, _, _) =>
      p50 >= docMedians(src) }
    assert(pulled * 2 >= got.length,
      "weighted medians should mostly sit at/above doc medians " +
        "(token mass grows with length)")
  }

  test("ops_weighted_quantiles replays an explicit multiset expansion") {
    val li = Tables.t(spark, dir, "lineitem")
      .selectExpr("l_returnflag AS grp",
        "CAST(round(l_extendedprice * 100) AS LONG) AS cents",
        "CAST(l_quantity AS LONG) AS w")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = QuantileOps.weightedQuantiles(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.nonEmpty)
    val byGrp = li.groupBy(_._1)
    assert(got.map(_._1).toSet === byGrp.keySet)
    got.foreach { case (grp, mass, wp25, wp50, wp75) =>
      val expanded = byGrp(grp)
        .flatMap { case (_, c, w) => Seq.fill(w.toInt)(c) }
        .sorted.toIndexedSeq
      assert(mass === expanded.length.toLong, s"unit_mass for $grp")
      assert(wp25 === r6(pct(expanded, 0.25)), s"wp25 for $grp")
      assert(wp50 === r6(pct(expanded, 0.50)), s"wp50 for $grp")
      assert(wp75 === r6(pct(expanded, 0.75)), s"wp75 for $grp")
      assert(wp25 <= wp50 && wp50 <= wp75)
      // total weight = sum of quantities, pinned independently
      assert(mass === byGrp(grp).map(_._3).sum)
    }
  }
}
