package graft

import graft.queries.StatTests

/** Driver-side reference check for the round-15 gate, on the house
  * pattern: the oracle-gated query also proves its algebra against an
  * independently-coded imperative reference at sf0.001, so a mistake
  * both engines would replay identically still fails.
  */
class Round15GatesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("ops_wilcoxon_signed replays an imperative signed-rank computation") {
    val got = StatTests.wilcoxonSigned(spark, dir).collect()
    assert(got.length === 1)
    val row = got.head

    // imperative reference: collect events, split at the micros
    // midpoint, per-user pre/post micro-unit sums, drop zero diffs,
    // midrank |d|, W+ and the tie-corrected z
    val ev = Tables.t(spark, dir, "events")
      .selectExpr("user_id", "unix_micros(ts) AS us",
        "CAST(round(value * 1000000) AS LONG) AS vm")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val mid = {
      val us = ev.map(_._2)
      // floorDiv matches Spark's DIV / DuckDB's // on the positive sum
      Math.floorDiv(us.min + us.max, 2L)
    }
    val byUser = ev.groupBy(_._1).map { case (_, rows) =>
      val pre = rows.filter(_._2 < mid).map(_._3).sum
      val post = rows.filter(_._2 >= mid).map(_._3).sum
      post - pre
    }.filter(_ != 0L).toSeq
    val n = byUser.size.toLong
    val nPos = byUser.count(_ > 0).toLong
    // doubled midranks over |d|
    val sortedAd = byUser.map(math.abs).sorted
    val rankMin = sortedAd.zipWithIndex.groupBy(_._1)
      .map { case (v, xs) => v -> (xs.map(_._2).min + 1L) }
    val ties = sortedAd.groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
    def r2(ad: Long): Long = 2L * rankMin(ad) + ties(ad) - 1L
    val w2p = byUser.filter(_ > 0).map(d => BigInt(r2(math.abs(d)))).sum
    val tie3 = ties.values.map(t => BigInt(t) * t * t - t).sum
    val varW = n.toDouble * (n + 1).toDouble * (2 * n + 1).toDouble / 24.0 -
      tie3.toDouble / 48.0
    val z = (w2p - BigInt(n) * (n + 1) / 2).toDouble / (2.0 * math.sqrt(varW))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    assert(row.getAs[Long]("n_pairs") === n)
    assert(row.getAs[Long]("n_pos") === nPos)
    assert(row.getAs[Long]("n_neg") === n - nPos)
    assert(row.getAs[Double]("w_plus") === w2p.toDouble / 2.0)
    assert(row.getAs[Double]("z_score") === r6(z))
    // sanity: the test actually exercised ties and both signs
    assert(nPos > 0 && nPos < n, "degenerate sign split")
  }

  test("ops_psm_att replays an imperative cell-level matching pass") {
    // exact half-up rational rounding, the gate's integer surface
    def hup(num: Long, den: Long): Long = (num * 2 + den) / (den * 2)
    // imperative reference: per-user aggregates, 10 activity cells,
    // exact propensities, nearest-propensity caliper match, ATT
    val byUser = Tables.t(spark, dir, "events")
      .selectExpr("user_id", "event_type", "CAST(round(value * 1000000) AS LONG) AS vm")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1).map { case (_, rows) =>
        val clicks = rows.count(_._2 == "click").toLong
        val errs = rows.count(_._2 == "error").toLong
        val y = rows.filter(_._2 == "purchase").map(_._3).sum
        (math.min(9L, clicks / 2), if (errs >= 14) 1L else 0L, y)
      }.toSeq
    val cells = byUser.groupBy(_._1).map { case (cell, rows) =>
      val n = rows.size.toLong
      val nT = rows.count(_._2 == 1L).toLong
      val syT = rows.filter(_._2 == 1L).map(_._3).sum
      val syC = rows.filter(_._2 == 0L).map(_._3).sum
      (cell, n, nT, n - nT, syT, syC, nT.toDouble / n.toDouble)
    }.toSeq
    val donors = cells.filter(_._4 > 0)
    // (cell, n_cell, n_t, prop_ppm, m_cell, m_p_ppm, meanT, meanC, eff)
    val expected = cells.filter(_._3 > 0).flatMap {
      case (cell, n, nT, _, syT, _, p) =>
        val cands = donors.filter(d => math.abs(p - d._7) <= 0.1)
        if (cands.isEmpty) None
        else {
          val m = cands.minBy(d => (math.abs(p - d._7), d._1))
          val meanT = hup(syT, nT)
          val meanC = hup(m._6, m._4)
          Some((cell, n, nT, hup(nT * 1000000L, n), m._1,
            hup(m._3 * 1000000L, m._2), meanT, meanC, meanT - meanC))
        }
    }.sortBy(_._1)

    val got = graft.queries.StatTests.psmAtt(spark, dir).collect()
    val perCell = got.filter(_.getLong(0) >= 0)
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
    assert(perCell.toSeq === expected)
    assert(got.filter(_.getLong(0) >= 0).forall(_.isNullAt(9)))

    val attRow = got.filter(_.getLong(0) == -1L)
    assert(attRow.length === 1)
    val wsum = expected.map { case (_, _, nT, _, _, _, _, _, eff) =>
      nT * eff
    }.sum
    val nTot = expected.map(_._3).sum
    assert(attRow.head.getLong(2) === nTot)
    assert(attRow.head.getLong(9) === wsum)
    assert((1 to 8).filterNot(_ == 2).forall(attRow.head.isNullAt))
    // sanity: matching is non-degenerate (several treated cells, at
    // least one non-self match is possible in principle)
    assert(expected.size >= 3)
  }

  test("ops_rdd_sharp replays an imperative local-linear OLS pass") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byUser = Tables.t(spark, dir, "events")
      .selectExpr("user_id", "event_type", "CAST(round(value * 1000000) AS LONG) AS vm")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      // .toSeq BEFORE .map: mapping a Map to (x, y) pairs would
      // DEDUPLICATE users sharing the same x
      .groupBy(_._1).toSeq.map { case (_, rows) =>
        val x = rows.count(_._2 == "click").toLong
        val y = rows.filter(_._2 == "purchase").map(_._3).sum
        (x, y)
      }.filter { case (x, _) => math.abs(x - 13) <= 6 }
    def fit(side: Seq[(Long, Long)]): (Long, Double, Double) = {
      val n = side.size.toLong
      val ds = side.map { case (x, _) => x - 13L }
      val sx = ds.sum
      val sxx = ds.map(d => d * d).sum
      val sy = side.map(r => BigInt(r._2)).sum
      val sxy = side.map { case (x, y) => BigInt(x - 13L) * y }.sum
      val den = (n * sxx - sx * sx).toDouble
      val a = (BigInt(sxx) * sy - BigInt(sx) * sxy).toDouble / den / 1000000.0
      val b = (BigInt(n) * sxy - BigInt(sx) * sy).toDouble / den / 1000000.0
      (n, a, b)
    }
    val (nL, aL, bL) = fit(byUser.filter(_._1 < 13))
    val (nR, aR, bR) = fit(byUser.filter(_._1 >= 13))
    // non-degenerate design on both sides: OLS needs >= 2 distinct d
    assert(nL >= 2 && nR >= 2)
    assert(byUser.filter(_._1 < 13).map(_._1).distinct.size >= 2)
    assert(byUser.filter(_._1 >= 13).map(_._1).distinct.size >= 2)

    val got = graft.queries.StatTests.rddSharp(spark, dir).collect()
    assert(got.length === 1)
    val row = got.head
    assert(row.getAs[Long]("n_l") === nL)
    assert(row.getAs[Long]("n_r") === nR)
    assert(row.getAs[Double]("alpha_left") === r6(aL))
    assert(row.getAs[Double]("alpha_right") === r6(aR))
    assert(row.getAs[Double]("slope_left") === r6(bL))
    assert(row.getAs[Double]("slope_right") === r6(bR))
    assert(row.getAs[Double]("effect") === r6(aR - aL))
  }

  test("ops_tost_equiv replays imperative Welch moments and the TOST decision") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ev = Tables.t(spark, dir, "events")
      .selectExpr("event_type", "user_id", "CAST(round(value * 1000000) AS LONG) AS vm")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = graft.queries.StatTests.tostEquiv(spark, dir).collect()
    assert(got.map(_.getString(0)).toSeq === ev.map(_._1).distinct.sorted.toSeq)
    got.foreach { row =>
      val t = row.getString(0)
      val a = ev.filter(e => e._1 == t && e._2 % 2 == 0).map(_._3)
      val b = ev.filter(e => e._1 == t && e._2 % 2 != 0).map(_._3)
      assert(row.getAs[Long]("n_a") === a.length.toLong)
      assert(row.getAs[Long]("n_b") === b.length.toLong)
      def mv(xs: Array[Long]): (Double, Double) = {
        val n = xs.length.toLong
        val sx = xs.map(BigInt(_)).sum
        val sxx = xs.map(x => BigInt(x) * x).sum
        val v = (BigInt(n) * sxx - sx * sx).toDouble / (n * (n - 1)).toDouble
        (sx.toDouble / n.toDouble, v / n.toDouble)
      }
      val (ma, va) = mv(a); val (mb, vb) = mv(b)
      val diff = ma - mb
      val se = math.sqrt(va + vb)
      val tLo = (diff + 50000.0) / se
      val tHi = (diff - 50000.0) / se
      assert(row.getAs[Double]("mean_diff") === r6(diff / 1000000.0) + 0.0)
      assert(row.getAs[Double]("se") === r6(se / 1000000.0))
      assert(row.getAs[Double]("t_lower") === r6(tLo) + 0.0)
      assert(row.getAs[Double]("t_upper") === r6(tHi) + 0.0)
      assert(row.getAs[Long]("equivalent") ===
        (if (tLo >= 1.645 && tHi <= -1.645) 1L else 0L))
    }
  }

  test("ta_burrows_delta replays an imperative z-score pass and is symmetric-complete") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = Tables.t(spark, dir, "documents")
      .selectExpr("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val cnt = docs.flatMap { case (src, t) => t.split(" ").map(src -> _) }
      .groupBy(identity).map { case ((src, w), xs) => (src, w, xs.length.toLong) }
      .toSeq
    val nSrc = cnt.groupBy(_._1).map { case (s0, xs) => s0 -> xs.map(_._3).sum }
    val topW = cnt.groupBy(_._2).map { case (w, xs) => w -> xs.map(_._3).sum }
      .toSeq.sortBy { case (w, c) => (-c, w) }.take(50).map(_._1)
    val srcs = nSrc.keys.toSeq.sorted
    val r = (for { s0 <- srcs; w <- topW } yield {
      val c = cnt.find(x => x._1 == s0 && x._2 == w).map(_._3).getOrElse(0L)
      (s0, w) -> c.toDouble / nSrc(s0).toDouble
    }).toMap
    val kept = topW.flatMap { w =>
      val vals = srcs.map(s0 => r((s0, w)))
      val mean = vals.map(BigDecimal(_).setScale(12, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble / srcs.size.toDouble
      val variance = vals.map(v => BigDecimal((v - mean) * (v - mean))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble /
        (srcs.size - 1).toDouble
      if (variance > 0.0) Some(w -> ((mean, math.sqrt(variance)))) else None
    }.toMap
    def z(s0: String, w: String): Double = {
      val (m, sd) = kept(w); (r((s0, w)) - m) / sd
    }
    val got = graft.queries.TextScores.burrowsDelta(spark, dir).collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2), x.getDouble(3)))
    // one row per unordered source pair
    assert(got.length === srcs.size * (srcs.size - 1) / 2)
    got.foreach { case (a, b, k, delta) =>
      assert(a < b)
      assert(k === kept.size.toLong)
      val expect = kept.keys.toSeq.map(w =>
        BigDecimal(math.abs(z(a, w) - z(b, w)))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble / kept.size.toDouble
      assert(delta === r6(expect), s"delta($a,$b)")
      assert(delta >= 0.0)
    }
  }
}
