package graft

import graft.queries.StatOps
import org.apache.spark.sql.functions._

/** Invariants for the statistical-analysis operators beyond what their
  * DuckDB oracles pin: closed-form identities re-derived driver-side
  * from the raw data (exact integer arithmetic mirroring the operators'
  * own float policy), plus the structural properties (complete grids,
  * bounded statistics) a hash-match alone wouldn't explain.
  */
class StatOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("gini: bounded, complete, and equal to a driver-side reference per segment") {
    val rows = StatOps.gini(spark, dir).collect()
    assert(rows.map(_.getString(0)).distinct.length === rows.length)
    rows.foreach { r =>
      val g = r.getDouble(3)
      assert(g >= 0.0 && g < 1.0, s"gini out of range: $r")
    }
    // driver reference: exact integer formula over collected spends
    val spends = Tables.t(spark, dir, "orders")
      .select(col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("c"))
      .groupBy("o_custkey").agg(sum(col("c")).as("cents"))
      .join(Tables.t(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("cents")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).sorted).toMap
    rows.foreach { r =>
      val xs = spends(r.getString(0))
      val n = xs.length.toLong
      val s = xs.map(BigInt(_)).sum
      val s1 = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
      val want = math.rint(((2 * s1 - (n + 1) * s).toDouble / (n * s).toDouble) * 1e6) / 1e6
      assert(r.getLong(1) === n && math.abs(r.getDouble(3) - want) < 1e-9,
        s"$r vs $want")
    }
  }

  test("trimmed mean: interior location, ~80% kept, agrees with a fence-filtered reference") {
    val rows = StatOps.trimmedMean(spark, dir).collect()
    assert(rows.nonEmpty)
    val fences = Tables.t(spark, dir, "events").groupBy(col("event_type"))
      .agg(round(expr("percentile(value, 0.1)"), 6).as("lo"),
        round(expr("percentile(value, 0.9)"), 6).as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val vals = Tables.t(spark, dir, "events")
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1))).toMap
    rows.foreach { r =>
      val t = r.getString(0)
      val (lo, hi) = fences(t)
      val kept = vals(t).filter(v => v >= lo && v <= hi)
      assert(r.getLong(2) === kept.length.toLong, s"$t n_kept")
      // ~80% interior (exact percentiles on ~2000 values)
      assert(kept.length.toDouble / vals(t).length > 0.75 &&
        kept.length.toDouble / vals(t).length < 0.85, s"$t kept fraction")
      val want = math.rint(kept.map(v => math.rint(v * 1e6).toLong)
        .map(BigInt(_)).sum.toDouble / kept.length.toDouble / 1e6 * 1e6) / 1e6
      assert(math.abs(r.getDouble(3) - want) < 1e-9, s"$t: ${r.getDouble(3)} vs $want")
      assert(r.getDouble(3) >= lo && r.getDouble(3) <= hi, s"$t: mean outside fences")
    }
  }

  test("chi2: complete grid, marginal-consistent expectations, V in [0,1]") {
    val rows = StatOps.chi2Assoc(spark, dir).collect()
    val segs = rows.map(_.getString(0)).distinct
    val pris = rows.map(_.getString(1)).distinct
    assert(rows.length === segs.length * pris.length, "grid incomplete")
    val n = rows.map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val rowTot = rows.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    val colTot = rows.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    val bigN = n.values.sum
    rows.foreach { r =>
      val e = (rowTot(r.getString(0)) * colTot(r.getString(1))).toDouble / bigN.toDouble
      assert(math.abs(r.getDouble(3) - math.rint(e * 1e6) / 1e6) < 1e-9, s"expected: $r vs $e")
      assert(r.getDouble(4) >= 0.0)
      assert(r.getDouble(6) >= 0.0 && r.getDouble(6) <= 1.0, s"cramers_v: $r")
    }
    // chi2 column is the (decimal) sum of the unrounded parts — re-derive
    val parts = rows.map { r =>
      val e = (rowTot(r.getString(0)) * colTot(r.getString(1))).toDouble / bigN.toDouble
      val d = r.getLong(2).toDouble - e
      d * d / e
    }
    assert(math.abs(rows.head.getDouble(5) - math.rint(parts.sum * 1e6) / 1e6) < 1e-5)
  }

  test("spearman: within [-1,1] and equal to an exact mid-rank reference") {
    val rows = StatOps.spearman(spark, dir).collect()
    assert(rows.nonEmpty)
    val data = Tables.t(spark, dir, "orders")
      .join(Tables.t(spark, dir, "lineitem")
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("y")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("x"), col("y"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(r => (r.getLong(1), r.getLong(2)))).toMap
    def ranks2(xs: Seq[Long]): Map[Long, Long] = {
      // 2*mid-rank = 2*min_rank + ties - 1, exactly the operator's carry
      val sorted = xs.sorted
      val minRank = sorted.zipWithIndex.groupBy(_._1)
        .view.mapValues(g => (g.map(_._2).min + 1).toLong).toMap
      val cnt = xs.groupBy(identity).view.mapValues(_.length.toLong).toMap
      xs.distinct.map(v => v -> (2 * minRank(v) + cnt(v) - 1)).toMap
    }
    rows.foreach { r =>
      val rho = r.getDouble(2)
      assert(rho >= -1.0 && rho <= 1.0, s"$r")
      val pts = data(r.getString(0))
      val rx = ranks2(pts.map(_._1))
      val ry = ranks2(pts.map(_._2))
      val n = BigInt(pts.length)
      val xs = pts.map(p => BigInt(rx(p._1)))
      val ys = pts.map(p => BigInt(ry(p._2)))
      val (sx, sy) = (xs.sum, ys.sum)
      val sxx = xs.map(v => v * v).sum
      val syy = ys.map(v => v * v).sum
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val want = (n * sxy - sx * sy).toDouble /
        (math.sqrt((n * sxx - sx * sx).toDouble) * math.sqrt((n * syy - sy * sy).toDouble))
      assert(math.abs(rho - math.rint(want * 1e6) / 1e6) < 1e-9,
        s"${r.getString(0)}: $rho vs $want")
    }
  }

  test("mann-whitney: U identity, exact mid-rank reference, z sign tracks the rank sums") {
    val rows = StatOps.mannWhitney(spark, dir).collect()
    assert(rows.nonEmpty)
    val data = Tables.t(spark, dir, "events")
      .select(col("event_type"), col("user_id"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1) % 2 == 0, r.getDouble(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val pts = data(r.getString(0))
      val (nA, nB) = (pts.count(_._2).toLong, pts.count(!_._2).toLong)
      assert(r.getLong(1) === nA && r.getLong(2) === nB)
      // exact mid-ranks via the 2r carry
      val sorted = pts.map(_._3).sorted
      val minRank = sorted.zipWithIndex.groupBy(_._1)
        .view.mapValues(g => (g.map(_._2).min + 1).toLong).toMap
      val cnt = pts.map(_._3).groupBy(identity).view.mapValues(_.length.toLong).toMap
      val s2a = pts.filter(_._2).map(p => BigInt(2 * minRank(p._3) + cnt(p._3) - 1)).sum
      val uA = (s2a - BigInt(nA) * BigInt(nA + 1)).toDouble / 2.0
      assert(r.getDouble(3) === uA, s"u_a: $r vs $uA")
      // U_A + U_B = n_A n_B (the rank-sum identity)
      val s2b = pts.filterNot(_._2).map(p => BigInt(2 * minRank(p._3) + cnt(p._3) - 1)).sum
      val uB = (s2b - BigInt(nB) * BigInt(nB + 1)).toDouble / 2.0
      assert(uA + uB === (nA * nB).toDouble, s"U identity: $uA + $uB")
      // z from the tie-corrected formula
      val tie3 = cnt.values.map(t => BigInt(t) * t * t - t).sum
      val n = nA + nB
      val varU = (nA * nB).toDouble / 12.0 *
        ((n + 1).toDouble - tie3.toDouble / (n * (n - 1)).toDouble)
      val z = (uA - (nA * nB).toDouble / 2.0) / math.sqrt(varU)
      assert(math.abs(r.getDouble(4) - math.rint(z * 1e6) / 1e6) < 1e-9, s"z: $r vs $z")
    }
  }

  test("did: cells partition the events; estimate equals the four-mean identity") {
    val r = StatOps.didEstimate(spark, dir).collect().head
    val total = Tables.t(spark, dir, "events").count()
    assert(r.getLong(0) + r.getLong(1) + r.getLong(2) + r.getLong(3) === total,
      "arm×period cells must partition the event stream")
    // the estimate is exactly (postA-preA)-(postB-preB) on the
    // unrounded means — re-derive from raw micro sums
    val ev = Tables.t(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        round(col("value") * 1000000).cast("long").as("vm")).collect()
      .map(e => (e.getLong(0), e.getLong(1), e.getLong(2)))
    val mid = (ev.map(_._2).min + ev.map(_._2).max) / 2
    def cellMean(a: Boolean, pre: Boolean): Double = {
      val c = ev.filter(e => (e._1 % 2 == 0) == a && (e._2 < mid) == pre)
      c.map(e => BigInt(e._3)).sum.toDouble / c.length.toDouble / 1e6
    }
    val did = (cellMean(true, false) - cellMean(true, true)) -
      (cellMean(false, false) - cellMean(false, true))
    assert(math.abs(r.getDouble(10) - math.rint(did * 1e6) / 1e6) < 1e-9,
      s"did: ${r.getDouble(10)} vs $did")
    assert(math.abs(r.getDouble(4) - math.rint(cellMean(true, true) * 1e6) / 1e6) < 1e-9)
  }

  test("cuped: theta from pooled moments; weighted adjusted mean preserves the pooled mean") {
    val rows = StatOps.cuped(spark, dir).collect().sortBy(_.getString(0))
    assert(rows.length === 2)
    val theta = rows.head.getDouble(4)
    assert(theta === rows.last.getDouble(4), "theta is pooled, same on both rows")
    val vr = rows.head.getDouble(5)
    assert(vr >= 0.0 && vr <= 1.0, s"var_reduction out of [0,1]: $vr")
    // CUPED adjusts each arm by theta*(xbar_arm - xbar); user-weighted
    // across arms those offsets cancel, so the pooled adjusted mean
    // equals the pooled raw mean — the defining invariant of the method
    val n = rows.map(_.getLong(1))
    val pooledRaw = rows.zip(n).map { case (r, k) => r.getDouble(2) * k }.sum / n.sum
    val pooledAdj = rows.zip(n).map { case (r, k) => r.getDouble(3) * k }.sum / n.sum
    assert(math.abs(pooledRaw - pooledAdj) < 1e-4,
      s"pooled mean must survive the adjustment: $pooledRaw vs $pooledAdj")
    // the adjustment must actually move the per-arm means (covariate
    // imbalance exists on this fixed corpus)
    assert(rows.exists(r => r.getDouble(2) != r.getDouble(3)))
  }

  test("woe/iv: cross-ratio identity, IV sums the parts, good+bad partitions the orders") {
    val rows = StatOps.woeIv(spark, dir).collect()
    assert(rows.nonEmpty)
    val total = Tables.t(spark, dir, "orders").count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum === total,
      "good+bad must partition the joined orders")
    val g = rows.map(_.getLong(1)).sum
    val b = rows.map(_.getLong(2)).sum
    rows.foreach { r =>
      val woe = math.log((r.getLong(1) * b).toDouble / (r.getLong(2) * g).toDouble)
      assert(math.abs(r.getDouble(3) - math.rint(woe * 1e6) / 1e6) < 1e-9, s"woe: $r")
      val part = (r.getLong(1).toDouble / g.toDouble - r.getLong(2).toDouble / b.toDouble) * woe
      assert(math.abs(r.getDouble(4) - math.rint(part * 1e6) / 1e6) < 1e-9, s"part: $r")
      // every iv_part is non-negative (sign of the two factors agrees)
      assert(r.getDouble(4) >= 0.0, r.toString)
    }
    // IV column equals the decimal sum of unrounded parts
    val ivRef = rows.map { r =>
      val woe = math.log((r.getLong(1) * b).toDouble / (r.getLong(2) * g).toDouble)
      (r.getLong(1).toDouble / g.toDouble - r.getLong(2).toDouble / b.toDouble) * woe
    }.sum
    assert(math.abs(rows.head.getDouble(5) - math.rint(ivRef * 1e6) / 1e6) < 1e-5)
  }

  test("target encode: out-of-fold means exclude the fold; grid covers category x fold") {
    import graft.queries.TrainingPrep
    val rows = TrainingPrep.targetEncode(spark, dir).collect()
    val data = Tables.t(spark, dir, "orders")
      .select(col("o_orderpriority"), (col("o_orderkey") % 5).as("fold"),
        round(col("o_totalprice") * 100).cast("long").as("cents")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val cats = data.map(_._1).distinct
    assert(rows.length === cats.length * 5, "grid must cover category x fold")
    rows.foreach { r =>
      val (cat, fold) = (r.getString(0), r.getLong(1))
      val out = data.filter(d => d._1 == cat && d._2 != fold)
      val want = out.map(d => BigInt(d._3)).sum.toDouble / out.length.toDouble / 100.0
      assert(math.abs(r.getDouble(3) - math.rint(want * 1e6) / 1e6) < 1e-9,
        s"$cat/$fold: ${r.getDouble(3)} vs $want")
      assert(r.getLong(2) === data.count(d => d._1 == cat && d._2 == fold).toLong)
      // leakage check: the encoded value differs from the naive
      // all-fold mean (the fold's own rows are genuinely excluded)
      val all = data.filter(_._1 == cat)
      val naive = all.map(d => BigInt(d._3)).sum.toDouble / all.length.toDouble / 100.0
      assert(math.abs(want - naive) > 1e-9, s"$cat/$fold: no exclusion effect")
    }
  }

  test("bpe merges: top-k pairs match a driver-side pair count; ranks dense") {
    import graft.queries.TrainingPrep
    val rows = TrainingPrep.bpeMerges(spark, "/root/testdata/sf0.001").collect()
    assert(rows.map(_.getLong(0)).toSeq === (1L to 20L), "ranks must be dense 1..20")
    val counts = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select(col("text")).collect().foreach { r =>
        r.getString(0).split(" ").filter(_.length >= 2).foreach { w =>
          (0 until w.length - 1).foreach(i => counts(w.substring(i, i + 2)) += 1)
        }
      }
    val want = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    rows.zip(want).foreach { case (r, (p, n)) =>
      assert(r.getString(1) === p && r.getLong(2) === n,
        s"rank ${r.getLong(0)}: (${r.getString(1)},${r.getLong(2)}) vs ($p,$n)")
    }
  }

  test("correlogram: agrees with the spot-check gate at lag 24; one dominant lag per type") {
    import graft.queries.StreamingGates
    val rows = StreamingGates.correlogram(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 2 && r.getLong(1) <= 48, s"lag range: $r")
      assert(r.getDouble(3) >= -1.0 && r.getDouble(3) <= 1.0, s"acf bound: $r")
    }
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      assert(rs.count(_.getBoolean(4)) === 1, s"$t: exactly one dominant lag")
      val dom = rs.find(_.getBoolean(4)).get
      // the dominant lag carries the max rounded autocorrelation
      assert(rs.forall(r => math.rint(r.getDouble(3) * 1e6) <=
        math.rint(dom.getDouble(3) * 1e6) + 1), s"$t: dominant not maximal")
    }
    // cross-gate consistency: the ACF at lag 24 must equal the
    // lag-autocorr gate's value (time-reversal symmetry of the
    // pair moments makes the two constructions identical)
    val spot = StreamingGates.lagAutocorr(spark, dir).collect()
      .filter(_.getAs[Int]("lag") == 24)
      .map(r => r.getString(0) -> r.getAs[Double]("autocorr")).toMap
    rows.filter(_.getLong(1) == 24L).foreach { r =>
      assert(math.abs(r.getDouble(3) - spot(r.getString(0))) < 2e-6,
        s"lag-24 disagreement: $r vs ${spot(r.getString(0))}")
    }
  }

  test("control chart: limits replay from the bar series; flags agree with the limits") {
    import graft.queries.StreamingGates
    val rows = StreamingGates.controlChart(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      val byHour = rs.sortBy(_.getTimestamp(1).getTime)
      // moving ranges: |bar_t - bar_{t-1}|, first bar has none
      assert(byHour.head.isNullAt(3), s"$t: first bar must have no range")
      byHour.sliding(2).foreach {
        case Array(a, b) =>
          val want = math.rint(math.abs(b.getDouble(2) - a.getDouble(2)) * 1e6) / 1e6
          assert(math.abs(b.getDouble(3) - want) < 1e-9, s"$t: mr at $b")
        case _ =>
      }
      // limits are constant per type and replay from the series
      assert(rs.map(_.getDouble(4)).distinct.length === 1, s"$t: UCL not constant")
      val meanBar = byHour.map(r => BigDecimal(r.getDouble(2))).sum / byHour.length
      val mrs = byHour.drop(1).map(r => BigDecimal(r.getDouble(3)))
      val meanMr = mrs.sum / mrs.length
      val ucl = math.rint((meanBar.toDouble + 2.66 * meanMr.toDouble) * 1e6) / 1e6
      assert(math.abs(rs.head.getDouble(4) - ucl) < 1e-6, s"$t: UCL ${rs.head.getDouble(4)} vs $ucl")
      // every flag agrees with the emitted limits
      rs.foreach { r =>
        assert(r.getBoolean(6) ===
          (r.getDouble(2) > r.getDouble(4) || r.getDouble(2) < r.getDouble(5)),
          s"$t: flag mismatch $r")
      }
      // non-degenerate on this stream: some bars are in control
      assert(rs.exists(!_.getBoolean(6)), s"$t: all bars flagged")
    }
  }

  test("mann-kendall: S replays exactly from the bars; z continuity-corrected; slope is a median") {
    import graft.queries.StreamingGates
    val rows = StreamingGates.trendMk(spark, dir).collect()
    assert(rows.nonEmpty)
    val bars = StreamingGates.hourlyBars(spark, dir).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getDouble(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val series = bars(r.getString(0)).sortBy(_._2)
      val n = series.length.toLong
      assert(r.getLong(1) === n)
      val pairs = for {
        i <- series.indices; j <- (i + 1) until series.length
      } yield (series(i)._3, series(j)._3,
        (series(j)._2 - series(i)._2) / 3600000L)
      val sRef = pairs.map { case (a, b, _) => math.signum(b - a).toLong }.sum
      assert(r.getLong(2) === sRef, s"S: $r vs $sRef")
      val ties = series.map(_._3).groupBy(identity).values.map(_.length.toLong)
      val tieTerm = ties.map(t => t * (t - 1) * (2 * t + 5)).sum
      val varS = (n * (n - 1) * (2 * n + 5) - tieTerm).toDouble / 18.0
      val zRef =
        if (sRef > 0) (sRef - 1).toDouble / math.sqrt(varS)
        else if (sRef < 0) (sRef + 1).toDouble / math.sqrt(varS)
        else 0.0
      assert(math.abs(r.getDouble(3) - math.rint(zRef * 1e6) / 1e6) < 1e-9, s"z: $r")
      // the Sen slope is a genuine median: at least half the pairwise
      // slopes on each side (within the round-6 output precision)
      val slopes = pairs.map { case (a, b, dh) => (b - a) / dh.toDouble }
      val below = slopes.count(_ <= r.getDouble(4) + 1e-6)
      val above = slopes.count(_ >= r.getDouble(4) - 1e-6)
      assert(below >= slopes.length / 2 && above >= slopes.length / 2,
        s"sen slope not a median: $r")
    }
  }

  test("twap: equals an exact interval-weighted reference; bounded by the day's extremes") {
    import graft.queries.StreamingGates
    val small = "/root/testdata/sf0.001"
    val rows = StreamingGates.twap(spark, small).collect()
    assert(rows.nonEmpty)
    val events = Tables.t(spark, small, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    val byDay = events.groupBy(e => (e._1, e._2.toInstant
      .atZone(java.time.ZoneOffset.UTC).toLocalDate))
    def us(t: java.sql.Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.getNanos / 1000L
    rows.foreach { r =>
      val key = (r.getLong(0), r.getDate(1).toLocalDate)
      val es = byDay(key).sortBy(e => (us(e._2), e._3))
      val gaps = es.sliding(2).collect { case Array(a, b) =>
        (math.rint(a._4 * 1e6).toLong, us(b._2) - us(a._2))
      }.toSeq
      val span = gaps.map(_._2).sum
      assert(r.getLong(3) === span, s"span: $r")
      assert(r.getLong(2) === gaps.length.toLong, s"n_intervals: $r")
      val want = math.rint(gaps.map { case (vm, d) => BigInt(vm) * BigInt(d) }.sum.toDouble
        / span.toDouble / 1e6 * 1e6) / 1e6
      assert(math.abs(r.getDouble(4) - want) < 1e-9, s"twap: $r vs $want")
      // bounded by the day's interior extremes (last event excluded)
      val vs = es.dropRight(1).map(_._4)
      assert(r.getDouble(4) >= vs.min - 1e-6 && r.getDouble(4) <= vs.max + 1e-6, r.toString)
    }
  }

  test("npmi collocations: bounded to [-1,1], min-count respected, exact reference") {
    import graft.queries.LlmCuration
    val small = "/root/testdata/sf0.001"
    val rows = LlmCuration.npmiColloc(spark, small).collect()
    assert(rows.nonEmpty)
    // reference counts from the raw corpus
    val bigrams = Tables.t(spark, small, "documents")
      .select(col("text")).collect().flatMap { r =>
        val t = r.getString(0).split(" ")
        t.dropRight(1).zip(t.drop(1))
      }
    val cb = bigrams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cp = bigrams.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cw = bigrams.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val b = bigrams.length.toLong
    assert(rows.length === cb.count(_._2 >= 10), "output must be exactly the >=10 pairs")
    rows.foreach { r =>
      val (p, w) = (r.getString(0), r.getString(1))
      assert(r.getLong(2) >= 10, s"min count: $r")
      assert(r.getLong(2) === cb((p, w)) && r.getLong(3) === cp(p) &&
        r.getLong(4) === cw(w), s"counts: $r")
      val want = math.rint(math.log(r.getLong(2).toDouble * b /
        (cp(p).toDouble * cw(w).toDouble)) /
        math.log(b.toDouble / r.getLong(2).toDouble) * 1e6) / 1e6
      assert(math.abs(r.getDouble(5) - want) < 1e-9, s"$r vs $want")
      assert(r.getDouble(5) >= -1.0 && r.getDouble(5) <= 1.0, r.toString)
    }
  }

  test("lorenz: deciles partition each segment, cum_share monotone to 1, gini-consistent") {
    val rows = StatOps.lorenzDeciles(spark, dir).collect()
    val gin = StatOps.gini(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.groupBy(_.getString(0)).foreach { case (seg, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq === (1L to 10L), s"$seg: deciles not dense")
      assert(sorted.map(_.getLong(2)).sum === gin(seg)._1, s"$seg: customers must partition")
      assert(sorted.map(_.getLong(3)).sum === gin(seg)._2, s"$seg: cents must partition")
      val shares = sorted.map(_.getDouble(4))
      shares.sliding(2).foreach(p => assert(p(0) <= p(1) + 1e-9, s"$seg: not monotone"))
      assert(math.abs(shares.last - 1.0) < 1e-6, s"$seg: last share ${shares.last}")
      // ascending-spend deciles ⇒ the curve sits under the diagonal
      sorted.dropRight(1).foreach { r =>
        assert(r.getDouble(4) <= r.getLong(1) / 10.0 + 1e-9,
          s"$seg: Lorenz curve above the diagonal at $r")
      }
    }
  }

  test("survival: KM equals a driver-side product-limit replay; monotone non-increasing") {
    val rows = StatOps.survivalKm(spark, dir).collect()
    assert(rows.nonEmpty, "the censor horizon must leave observed churns")
    val users = Tables.t(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(min(unix_micros(col("ts"))).as("f"), max(unix_micros(col("ts"))).as("l"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val end = users.map(_._2).max
    val hourUs = 3600000000L
    val lives = users.map { case (f, l) =>
      ((l - f) / hourUs, l < end - 12 * hourUs)
    }
    // product-limit replay over distinct churn times
    val churnTimes = lives.filter(_._2).map(_._1).distinct.sorted
    var surv = 1.0
    val want = churnTimes.map { t =>
      val atRisk = lives.count(_._1 >= t).toLong
      val churns = lives.count(x => x._1 == t && x._2).toLong
      surv *= (atRisk - churns).toDouble / atRisk.toDouble
      t -> ((atRisk, churns, surv))
    }.toMap
    assert(rows.length === churnTimes.length)
    rows.foreach { r =>
      val (n, d, sv) = want(r.getLong(0))
      assert(r.getLong(1) === n && r.getLong(2) === d, s"risk set: $r")
      // exp(Σln) replay vs sequential product: equal to float noise
      assert(math.abs(r.getDouble(3) - sv) < 1e-6, s"$r vs $sv")
    }
    val ss = rows.sortBy(_.getLong(0)).map(_.getDouble(3))
    ss.sliding(2).foreach(p => assert(p(0) >= p(1) - 1e-9, "S(t) must not increase"))
    assert(ss.head < 1.0 && ss.last > 0.0, "curve must move and stay positive here")
  }

  test("welch t: exact moment reference, dof between min(n)-1 and n_a+n_b-2") {
    val rows = StatOps.welchTTest(spark, dir).collect()
    assert(rows.nonEmpty)
    val data = Tables.t(spark, dir, "events")
      .select(col("event_type"), (col("user_id") % 2 === 0).as("a"),
        round(col("value") * 1000000).cast("long").as("vm")).collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getLong(2))).groupBy(_._1)
    rows.foreach { r =>
      val pts = data(r.getString(0))
      def arm(a: Boolean) = {
        val xs = pts.filter(_._2 == a).map(_._3)
        val n = xs.length.toLong
        val sx = xs.map(BigInt(_)).sum
        val sxx = xs.map(x => BigInt(x) * x).sum
        val se = (BigInt(n) * sxx - sx * sx).toDouble / (n * (n - 1)).toDouble / n.toDouble
        (n, sx.toDouble / n.toDouble, se)
      }
      val (na, ma, sea) = arm(true); val (nb, mb, seb) = arm(false)
      assert(r.getLong(1) === na && r.getLong(2) === nb)
      val t = (ma - mb) / math.sqrt(sea + seb)
      assert(math.abs(r.getDouble(5) - math.rint(t * 1e6) / 1e6) < 1e-9, s"t: $r vs $t")
      val dof = (sea + seb) * (sea + seb) /
        (sea * sea / (na - 1).toDouble + seb * seb / (nb - 1).toDouble)
      assert(math.abs(r.getDouble(6) - math.rint(dof * 1e6) / 1e6) < 1e-9, s"dof: $r")
      // Welch dof bracket
      assert(r.getDouble(6) >= math.min(na, nb).toDouble - 1 - 1e-6 &&
        r.getDouble(6) <= (na + nb).toDouble - 2 + 1e-6, s"dof bracket: $r")
      assert(math.signum(r.getDouble(5)) ===
        math.signum(r.getDouble(3) - r.getDouble(4)), "t sign vs mean diff")
    }
  }

  test("span corruption: substituting targets back into the input reconstructs the doc") {
    import graft.queries.TrainingPrep
    val small = "/root/testdata/sf0.001"
    val rows = TrainingPrep.spanCorrupt(spark, small).collect()
    val texts = Tables.t(spark, small, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length === texts.size, "every document gets a row")
    var totalTokens = 0L; var totalMasked = 0L
    rows.foreach { r =>
      val (input, target) = (r.getString(3), r.getString(4))
      val original = texts(r.getLong(0))
      // round-trip: fill each <X> sentinel with the next target block
      val targets = if (target.isEmpty) Array.empty[String]
        else target.split("<X>", -1)
      assert(input.sliding(3).count(_ == "<X>") === targets.length,
        s"doc ${r.getLong(0)}: sentinel/target count mismatch")
      val it = targets.iterator
      val rebuilt = input.split(" ", -1)
        .flatMap(seg =>
          if (seg == "<X>") it.next().split(" ", -1).toSeq else Seq(seg))
        .mkString(" ")
      assert(rebuilt === original, s"doc ${r.getLong(0)}: reconstruction failed")
      assert(r.getLong(1) === original.split(" ").length.toLong)
      val maskedCount = targets.map(t => if (t.isEmpty) 0 else t.split(" ").length).sum
      assert(r.getLong(2) === maskedCount.toLong, s"doc ${r.getLong(0)}: masked count")
      totalTokens += r.getLong(1); totalMasked += r.getLong(2)
    }
    // ~1/7 of blocks masked → masked token share in a loose band
    val share = totalMasked.toDouble / totalTokens.toDouble
    assert(share > 0.07 && share < 0.22, s"masked share $share outside band")
  }

  test("power/mde: required n brackets the observed effect; formula replays exactly") {
    val r = StatOps.powerMde(spark, dir).collect().head
    val ab = StatOps.abLift(spark, dir).collect().head
    assert(r.getLong(0) === ab.getLong(0) && r.getLong(1) === ab.getLong(2),
      "arm sizes must match the lift gate")
    val (nA, cA, nB, cB) = (ab.getLong(0), ab.getLong(1), ab.getLong(2), ab.getLong(3))
    val (pA, pB) = (cA.toDouble / nA, cB.toDouble / nB)
    val z2 = (1.959964 + 0.841621) * (1.959964 + 0.841621)
    val varSum = pA * (1 - pA) + pB * (1 - pB)
    val nReq = math.ceil(z2 * varSum / ((pA - pB) * (pA - pB))).toLong
    assert(r.getLong(4) === nReq, s"n_required: $r vs $nReq")
    val mde = math.sqrt(z2 * varSum / nA)
    assert(math.abs(r.getDouble(5) - math.rint(mde * 1e6) / 1e6) < 1e-9, s"mde: $r")
    // the bracket identity: at exactly n_required per arm the MDE
    // equals the observed difference (up to the ceiling)
    assert(math.sqrt(z2 * varSum / nReq) <= math.abs(pA - pB) + 1e-12,
      "MDE at required n must not exceed the observed effect")
    assert(math.sqrt(z2 * varSum / (nReq - 1)) > math.abs(pA - pB) - 1e-9,
      "one fewer user must not suffice")
  }

  test("abc/xyz: Pareto classes ordered, shares monotone, cv replays from raw moments") {
    import graft.queries.DataOps
    val rows = DataOps.abcXyz(spark, dir).collect()
    assert(rows.nonEmpty)
    // cum_share is monotone along descending revenue and ends at 1
    val byRev = rows.sortBy(r => (-r.getLong(2), r.getLong(0)))
    byRev.map(_.getDouble(3)).sliding(2).foreach {
      case Array(a, b) => assert(a <= b + 1e-9, "cum_share not monotone"); case _ =>
    }
    assert(math.abs(byRev.last.getDouble(3) - 1.0) < 1e-6)
    // class boundaries agree with the emitted shares / cvs
    rows.foreach { r =>
      val want = if (r.getDouble(3) <= 0.8) "A" else if (r.getDouble(3) <= 0.95) "B" else "C"
      assert(r.getString(4) === want, s"abc: $r")
      val wantX = if (r.getDouble(5) < 0.5) "X" else if (r.getDouble(5) < 1.0) "Y" else "Z"
      assert(r.getString(6) === wantX, s"xyz: $r")
    }
    // all three revenue classes are populated, and classes are
    // CONTIGUOUS along the revenue order (A then B then C — on this
    // deliberately uniform-ish catalog A is NOT a small head, which
    // is itself the correct reading: low concentration)
    val classes = rows.groupBy(_.getString(4)).view.mapValues(_.length).toMap
    assert(classes.keySet === Set("A", "B", "C"))
    val seq = byRev.map(_.getString(4)).toSeq
    assert(seq === seq.sorted, "classes must be contiguous down the revenue order")
    // spot cv replay from raw quantities for five parts
    val raw = Tables.t(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_quantity").cast("long").as("q")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1))).toMap
    rows.take(5).foreach { r =>
      val qs = raw(r.getLong(0))
      val n = qs.length.toDouble
      val mean = qs.sum.toDouble / n
      val varS = (n * qs.map(q => q.toDouble * q).sum - math.pow(qs.sum.toDouble, 2)) /
        (n * (n - 1))
      assert(math.abs(r.getDouble(5) - math.rint(math.sqrt(varS) / mean * 1e6) / 1e6) < 1e-6,
        s"cv: $r")
    }
  }

  test("burstiness: cf/df identity, fano >= 0, function-word floor at 1") {
    import graft.queries.LlmCuration
    val rows = LlmCuration.burstiness(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 20, s"min df: $r")
      assert(r.getLong(2) >= r.getLong(1), "cf >= df by construction")
      val want = math.rint(r.getLong(2).toDouble / r.getLong(1).toDouble * 1e6) / 1e6
      assert(math.abs(r.getDouble(3) - want) < 1e-9, s"burstiness: $r")
      assert(r.getDouble(3) >= 1.0, "mean tf per containing doc is >= 1")
      assert(r.getDouble(4) >= 0.0, s"fano: $r")
    }
  }

  test("concurrency: two-level prefix decomposition equals a global driver-side sweep") {
    import graft.queries.StreamingGates
    val rows = StreamingGates.concurrency(spark, dir).collect()
    assert(rows.nonEmpty)
    val sessions = StreamingGates.sessionizeBatch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000 +
        r.getTimestamp(1).getNanos / 1000 % 1000,
        r.getTimestamp(2).getTime * 1000 + r.getTimestamp(2).getNanos / 1000 % 1000))
    // single global sweep: (us, -delta, user) — starts before ends at
    // ties (closed intervals; zero-length sessions register 1)
    val bounds = sessions.flatMap { case (u, s0, e0) =>
      Seq((s0, 1L, u), (e0, -1L, u))
    }.sortBy { case (t, d, u) => (t, -d, u) }
    var running = 0L
    val perDay = scala.collection.mutable.Map.empty[String, (Long, Long)] // peak, peakUs
    bounds.foreach { case (t, d, _) =>
      running += d
      assert(running >= 0, "concurrency must never go negative")
      val day = java.time.Instant.ofEpochMilli(t / 1000)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
      val (pk, pts) = perDay.getOrElse(day, (Long.MinValue, 0L))
      if (running > pk) perDay(day) = (running, t)
    }
    assert(running === 0L, "every started session must end")
    assert(rows.length === perDay.size)
    rows.foreach { r =>
      val day = r.getDate(0).toLocalDate.toString
      val (pk, pts) = perDay(day)
      assert(r.getLong(1) === pk, s"$day: peak ${r.getLong(1)} vs $pk")
      val gotUs = r.getTimestamp(2).getTime * 1000 +
        r.getTimestamp(2).getNanos / 1000 % 1000
      assert(gotUs === pts, s"$day: peak ts $gotUs vs $pts")
      assert(r.getLong(3) === sessions.count { case (_, s0, _) =>
        java.time.Instant.ofEpochMilli(s0 / 1000)
          .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString == day
      }.toLong, s"$day: sessions started")
    }
  }

  test("ab lift: arms partition the users, z matches the pooled formula, sign agrees") {
    val r = StatOps.abLift(spark, dir).collect().head
    val (nA, cA, nB, cB) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val users = Tables.t(spark, dir, "events")
      .select(col("user_id")).distinct().count()
    assert(nA + nB === users, "arms must partition the user set")
    assert(cA <= nA && cB <= nB && cA > 0 && cB > 0, "conversion must be interior")
    val (pA, pB) = (cA.toDouble / nA.toDouble, cB.toDouble / nB.toDouble)
    assert(pA > 0 && pA < 1 && pB > 0 && pB < 1, "rates must be interior (z well-defined)")
    val pHat = (cA + cB).toDouble / (nA + nB).toDouble
    val z = (pA - pB) / math.sqrt(pHat * (1.0 - pHat) * (1.0 / nA + 1.0 / nB))
    assert(math.abs(r.getDouble(8) - math.rint(z * 1e6) / 1e6) < 1e-9, s"z: $r vs $z")
    assert(math.signum(r.getDouble(8)) === math.signum(r.getDouble(6)), "z sign vs lift sign")
  }
}
