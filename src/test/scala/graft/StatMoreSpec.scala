package graft

import graft.queries.{StatMore, StatOps}

/** Driver-side replays and invariant proofs for the round-13
  * tranche-B gates ([[queries.StatMore]]): isotonic calibration is
  * checked against a REAL iterative pool-adjacent-violators run (the
  * minimax closed form must agree with the algorithm it replaces),
  * Kendall τ-b against a brute-force pair count, Nelson–Aalen against
  * its defining sums plus the exp(−H) ≥ KM product-limit inequality,
  * and the superlative indices against base-month identity and a full
  * term-by-term replay.
  */
class StatMoreSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("ops_isotonic_calib: minimax fit equals an actual PAV run, " +
    "is monotone, and preserves the weighted mean") {
    val rows = StatMore.isotonicCalib(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(rows.length >= 3, "needs a non-degenerate bin grid")
    // monotone non-decreasing (the defining constraint)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._5 <= b._5 + 1e-12, s"iso not monotone at bin ${b._1}")
    }
    // real PAV: pool adjacent violators until monotone
    case class Block(w: Long, y: Long) { def mean: Double = y.toDouble / w }
    var blocks = rows.map(r => (Block(r._2, r._3), 1)).toVector
    var changed = true
    while (changed) {
      changed = false
      val i = blocks.indices.dropRight(1)
        .find(i => blocks(i)._1.mean > blocks(i + 1)._1.mean + 1e-15)
      i.foreach { i =>
        val (a, ca) = blocks(i); val (b, cb) = blocks(i + 1)
        blocks = blocks.patch(i, Seq((Block(a.w + b.w, a.y + b.y), ca + cb)), 2)
        changed = true
      }
    }
    val pav = blocks.flatMap { case (blk, cnt) => Seq.fill(cnt)(blk.mean) }
    rows.map(_._5).zip(pav).zipWithIndex.foreach { case ((got, want), i) =>
      assert(got === r6(want), s"bin ${rows(i)._1}: minimax $got != PAV $want")
    }
    // PAV preserves the weighted total: Σ n·iso = Σ n_pos
    val tot = rows.map(r => r._2.toDouble * r._5).sum
    assert(math.abs(tot - rows.map(_._3).sum.toDouble) < 1e-3,
      s"weighted total drifted: $tot vs ${rows.map(_._3).sum}")
    // raw rates replay
    rows.foreach { r =>
      assert(r._4 === r6(r._3.toDouble / r._2), s"raw rate bin ${r._1}")
    }
  }

  test("ops_kendall_tau: brute-force pair recount replays every nation") {
    val got = StatMore.kendallTau(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(got.nonEmpty)
    // rebuild the (nation, month) grid driver-side from the raw tables
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("CAST(o_custkey AS BIGINT)",
        "CAST(date_trunc('month', o_orderdate) AS DATE) AS m",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents").collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2)))
    val c2n = spark.read.parquet(s"$dir/customer.parquet")
      .selectExpr("CAST(c_custkey AS BIGINT)", "CAST(c_nationkey AS BIGINT)")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nName = spark.read.parquet(s"$dir/nation.parquet")
      .selectExpr("CAST(n_nationkey AS BIGINT)", "n_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val grid = o.groupBy(r => (nName(c2n(r._1)), r._2))
      .map { case ((n, m), rs) => (n, m, rs.map(_._3).sum, rs.size.toLong) }
      .toSeq
    for ((nation, nMonths, cc, dd, tx, ty, tau) <- got) {
      val series = grid.filter(_._1 == nation).sortBy(_._2)
      assert(series.size.toLong === nMonths, s"$nation months")
      var (c, d, t1, t2, n0) = (0L, 0L, 0L, 0L, 0L)
      for (i <- series.indices; j <- (i + 1) until series.size) {
        val dx = series(j)._3 - series(i)._3
        val dy = series(j)._4 - series(i)._4
        n0 += 1
        if (dx == 0) t1 += 1
        if (dy == 0) t2 += 1
        if (dx > 0 && dy > 0 || dx < 0 && dy < 0) c += 1
        else if (dx > 0 && dy < 0 || dx < 0 && dy > 0) d += 1
      }
      assert((c, d, t1, t2) === ((cc, dd, tx, ty)), s"$nation pair counts")
      val want = (c - d).toDouble / math.sqrt(((n0 - t1) * (n0 - t2)).toDouble)
      assert(tau === r6(want), s"$nation tau_b")
      assert(tau >= -1.0 && tau <= 1.0, s"$nation tau out of range")
    }
  }

  test("ops_nelson_aalen: defining sums replay and exp(-H) dominates KM") {
    val na = StatMore.nelsonAalen(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(na.nonEmpty)
    // replay H and Var from the (n_risk, d) columns the gate itself emits
    var h = BigDecimal(0); var v = BigDecimal(0)
    for ((t, n, d, hc, se, br) <- na) {
      h += BigDecimal(d.toDouble / n.toDouble)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      v += BigDecimal(d.toDouble * (n - d).toDouble /
          (n.toDouble * n.toDouble * n.toDouble))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      assert(hc === r6(h.toDouble), s"t=$t cum_hazard")
      assert(se === r6(math.sqrt(v.toDouble)), s"t=$t na_se")
      assert(br === r6(math.exp(-h.toDouble)), s"t=$t breslow")
    }
    // hazard accumulates; survival decays
    na.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._4 && a._6 >= b._6, s"ordering at t=${b._1}")
    }
    // exp(-Σ d/n) ≥ Π (1 - d/n): Breslow dominates Kaplan-Meier
    val km = StatOps.survivalKm(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    na.foreach { case (t, _, _, _, _, br) =>
      km.get(t).foreach(s => assert(br >= s - 1e-9, s"t=$t Breslow < KM"))
    }
  }

  test("ops_sprt_ab: day-walk replay, always-valid p is monotone " +
    "non-increasing, and the statistic matches the mixture formula") {
    val got = StatMore.sprtAb(spark, dir).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7)))
    assert(got.nonEmpty)
    // p_n is non-increasing by construction (running max in log space)
    got.sliding(2).foreach { case Array(a, b) =>
      assert(b._8 <= a._8 + 1e-12, s"p increased at ${b._1}")
      // cumulative counts never decrease
      assert(b._2 >= a._2 && b._3 >= a._3 && b._4 >= a._4 && b._5 >= a._5,
        s"cumulative count decreased at ${b._1}")
    }
    got.foreach { r => assert(r._8 > 0.0 && r._8 <= 1.0, s"${r._1} p range") }
    // replay the mixture formula from the emitted cumulative counts
    var runMax = 0.0
    for ((day, na, ca, nb, cb, delta, lnl, p) <- got) {
      val pa = ca.toDouble / na.toDouble
      val pb = cb.toDouble / nb.toDouble
      val pp = (ca + cb).toDouble / (na + nb).toDouble
      val v = pp * (1.0 - pp) * (1.0 / na.toDouble + 1.0 / nb.toDouble)
      val wantLnl = 0.5 * math.log(v / (v + 0.0001)) +
        (pa - pb) * (pa - pb) * 0.0001 / (2.0 * v * (v + 0.0001))
      runMax = math.max(runMax, math.max(wantLnl, 0.0))
      assert(delta === r6(pa - pb), s"$day delta")
      assert(lnl === r6(wantLnl), s"$day ln_lambda")
      assert(p === r6(math.exp(-runMax)), s"$day p_always_valid")
    }
    // enrollment sanity: final day covers every user exactly once
    val nUsers = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("CAST(user_id AS BIGINT)").distinct().count()
    val last = got.last
    assert(last._2 + last._4 === nUsers, "final enrollment != user count")
  }

  test("ops_tornqvist_index: base month is identity and both indices " +
    "replay term-by-term against the unit-value grid") {
    val got = StatMore.tornqvistIndex(spark, dir).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(got.nonEmpty)
    // rebuild the part-month unit-value grid driver-side
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .selectExpr("CAST(l_partkey AS BIGINT)",
        "CAST(date_trunc('month', l_shipdate) AS DATE) AS m",
        "CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT) AS ec",
        "CAST(round(l_quantity) AS BIGINT) AS q").collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2), r.getLong(3)))
    val grid = li.groupBy(r => (r._1, r._2)).map { case ((p, m), rs) =>
      val ec = rs.map(_._3).sum; val q = rs.map(_._4).sum
      (p, m, r6(ec.toDouble / q.toDouble), q)
    }.toSeq
    val base = grid.filter(_._2 == grid.map(_._2).min)
      .map(g => g._1 -> (g._3, g._4)).toMap
    for ((month, nParts, torn, walsh) <- got) {
      val cur = grid.filter(g => g._2 == month && base.contains(g._1))
      assert(cur.size.toLong === nParts, s"$month basket size")
      var lnT = BigDecimal(0); var wn = BigDecimal(0); var wd = BigDecimal(0)
      val tot0 = cur.map { g => val (p0, q0) = base(g._1)
        BigDecimal(p0 * q0).setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble
      val tott = cur.map(g =>
        BigDecimal(g._3 * g._4).setScale(12, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      for ((part, _, p, q) <- cur) {
        val (p0, q0) = base(part)
        val term = 0.5 * (p0 * q0 / tot0 + p * q / tott) * math.log(p / p0)
        val w = math.sqrt((q0 * q).toDouble)
        lnT += BigDecimal(term).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        wn += BigDecimal(p * w).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        wd += BigDecimal(p0 * w).setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }
      assert(torn === r6(math.exp(lnT.toDouble)), s"$month tornqvist")
      assert(walsh === r6(wn.toDouble / wd.toDouble), s"$month walsh")
      if (month == grid.map(_._2).min) {
        assert(torn === 1.0 && walsh === 1.0, "base month must be identity")
      }
      assert(torn > 0 && walsh > 0)
    }
  }
}
