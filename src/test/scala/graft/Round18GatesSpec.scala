package graft

import org.apache.spark.sql.functions._
import graft.queries.QuantileOps

/** Driver-side imperative replays for the round-18 additions
  * (VERDICT r17 #6 — weighted drift/inequality on the r17 weighted-
  * percentile devices), on the house pattern: each oracle-gated query
  * also proves its algebra against an independently-coded reference
  * at sf0.001, so a mistake both engines would replay identically
  * still fails.
  */
class Round18GatesSpec extends SparkSpec {

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

  test("cu_weighted_psi replays the token-expanded PSI construction") {
    val docs = Tables.t(spark, dir, "documents")
      .select(col("source"), col("n_chars"),
        size(split(col("text"), " ")).as("w"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val got = QuantileOps.weightedPsi(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    assert(got.map(_._1).toSeq === got.map(_._1).toSeq.sorted)
    // the token expansion, literally: each doc's length repeated
    // token-count times
    val tokens = docs.flatMap { case (s, len, w) => Seq.fill(w)((s, len)) }
    val bySrc = tokens.groupBy(_._1)
    assert(got.map(_._1).toSet === bySrc.keySet)
    got.foreach { case (src, mass, psi) =>
      val own = bySrc(src).map(_._2)
      val rest = tokens.collect { case (s, len) if s != src => len }
        .sorted.toIndexedSeq
      assert(mass === own.length.toLong, s"token_mass for $src")
      // rest-of-corpus decile fences, rounded like the engine's device
      val fences = (1 to 9).map(i => r6(pct(rest, i / 10.0)))
      def bin(len: Long): Int = fences.count(f => len.toDouble > f)
      val cOwn = (0 until 10).map(b => own.count(bin(_) == b).toLong)
      val cRest = (0 until 10).map(b => rest.count(bin(_) == b).toLong)
      val nOwn = cOwn.sum; val nRest = cRest.sum
      val expected = r6((0 until 10).map { b =>
        val p = (cOwn(b) + 1).toDouble / (nOwn + 10)
        val q = (cRest(b) + 1).toDouble / (nRest + 10)
        BigDecimal((p - q) * math.log(p / q)).setScale(12,
          BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble)
      assert(psi === expected, s"psi for $src")
      assert(psi >= -1e-6, s"smoothed PSI is nonnegative-ish for $src")
    }
  }

  test("ops_weighted_gini replays the unit-expanded Gini formula") {
    val li = Tables.t(spark, dir, "lineitem")
      .selectExpr("l_returnflag AS grp",
        "CAST(round(l_extendedprice * 100) AS LONG) AS cents",
        "CAST(l_quantity AS LONG) AS w")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = QuantileOps.weightedGini(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    val byGrp = li.groupBy(_._1)
    assert(got.map(_._1).toSet === byGrp.keySet)
    got.foreach { case (grp, mass, totalCents, gini) =>
      // the semantic definition, literally: expand, sort ascending,
      // G = (2·Σ i·x_i − (n+1)·Σ x) / (n·Σ x) with 1-based i
      val expanded = byGrp(grp)
        .flatMap { case (_, c, w) => Seq.fill(w.toInt)(c) }
        .sorted
      val n = expanded.length.toLong
      assert(mass === n, s"unit_mass for $grp")
      assert(mass === byGrp(grp).map(_._3).sum, s"quantity sum for $grp")
      val sx = expanded.map(BigInt(_)).sum
      assert(totalCents === sx.toLong, s"total_cents for $grp")
      val six = expanded.zipWithIndex
        .map { case (x, i) => BigInt(i + 1) * x }.sum
      val expected = r6((BigDecimal(2 * six) - BigDecimal((n + 1) * sx))
        .toDouble / (BigDecimal(n) * BigDecimal(sx)).toDouble)
      assert(gini === expected, s"gini_w for $grp")
      assert(gini >= 0.0 && gini < 1.0, s"gini_w in [0, 1) for $grp")
    }
    // the weighted Gini must differ from the row-level (unweighted)
    // Gini somewhere — otherwise the weights aren't load-bearing and
    // the gate would pass on a broken weight column
    val unweighted = byGrp.map { case (grp, rows) =>
      val ex = rows.map(_._2).sorted
      val n = ex.length.toLong
      val sx = ex.map(BigInt(_)).sum
      val six = ex.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
      grp -> r6((BigDecimal(2 * six) - BigDecimal((n + 1) * sx)).toDouble /
        (BigDecimal(n) * BigDecimal(sx)).toDouble)
    }
    assert(got.exists { case (grp, _, _, g) => g != unweighted(grp) },
      "quantity weighting should move the Gini on at least one flag")
  }
}
