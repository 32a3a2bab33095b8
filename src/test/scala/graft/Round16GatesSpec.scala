package graft

import graft.queries.QuantileOps

/** Driver-side reference check for the round-16 quantile tranche, on
  * the house pattern: each oracle-gated query also proves its algebra
  * against an independently-coded imperative reference at sf0.001, so
  * a mistake both engines would replay identically still fails.
  */
class Round16GatesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Spark `Percentile.getPercentile`'s linear interpolation at rank
    * q·(n−1) over a sorted sequence, replayed imperatively.
    */
  private def interp(sorted: IndexedSeq[Double], q: Double): Double = {
    val pos = (sorted.length - 1).toDouble * q
    val lo = math.floor(pos).toLong
    val hi = math.ceil(pos).toLong
    val vlo = sorted(lo.toInt)
    val vhi = sorted(hi.toInt)
    r6(vlo + (vhi - vlo) * (pos - lo.toDouble))
  }

  private def events(): Map[String, IndexedSeq[Double]] =
    Tables.t(spark, dir, "events")
      .selectExpr("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (t, xs) =>
        t -> xs.map(_._2).sorted.toIndexedSeq
      }

  test("ops_tukey_fences replays an imperative quartile-fence pass") {
    val byType = events()
    val got = QuantileOps.tukeyFences(spark, dir).collect()
    assert(got.length === byType.size)
    got.foreach { row =>
      val vs = byType(row.getString(0))
      val q1 = interp(vs, 0.25)
      val q3 = interp(vs, 0.75)
      val iqr = r6(q3 - q1)
      val loI = r6(q1 - 1.5 * iqr) + 0.0
      val hiI = r6(q3 + 1.5 * iqr) + 0.0
      val loO = r6(q1 - 3.0 * iqr) + 0.0
      val hiO = r6(q3 + 3.0 * iqr) + 0.0
      assert(row.getAs[Long]("n_events") === vs.length.toLong)
      assert(row.getAs[Double]("q1") === q1)
      assert(row.getAs[Double]("q3") === q3)
      assert(row.getAs[Double]("iqr") === iqr)
      assert(row.getAs[Double]("lo_inner") === loI)
      assert(row.getAs[Double]("hi_inner") === hiI)
      assert(row.getAs[Double]("lo_outer") === loO)
      assert(row.getAs[Double]("hi_outer") === hiO)
      val mild = vs.count(v =>
        (v < loI || v > hiI) && v >= loO && v <= hiO).toLong
      val extreme = vs.count(v => v < loO || v > hiO).toLong
      assert(row.getAs[Long]("n_mild") === mild)
      assert(row.getAs[Long]("n_extreme") === extreme)
    }
    // non-degenerate: the heavy-tailed value column must flag some
    assert(got.map(_.getAs[Long]("n_extreme")).sum > 0)
  }

  test("ops_bowley_skew replays an imperative octile-shape pass") {
    val ord = Tables.t(spark, dir, "orders")
      .join(Tables.t(spark, dir, "customer"),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey"))
      .selectExpr("c_mktsegment", "CAST(round(o_totalprice * 100) AS LONG)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (seg, xs) =>
        seg -> xs.map(_._2.toDouble).sorted.toIndexedSeq
      }
    val got = QuantileOps.bowleySkew(spark, dir).collect()
    assert(got.length === ord.size)
    got.foreach { row =>
      val vs = ord(row.getString(0))
      val e = (1 to 7).map(i => i -> interp(vs, i / 8.0)).toMap
      assert(row.getAs[Double]("q1_cents") === e(2))
      assert(row.getAs[Double]("q2_cents") === e(4))
      assert(row.getAs[Double]("q3_cents") === e(6))
      assert(row.getAs[Double]("bowley_skew") ===
        r6((e(6) + e(2) - 2.0 * e(4)) / (e(6) - e(2))) + 0.0)
      assert(row.getAs[Double]("moors_kurt") ===
        r6(((e(7) - e(5)) + (e(3) - e(1))) / (e(6) - e(2))) + 0.0)
      assert(row.getAs[Double]("qcd") ===
        r6((e(6) - e(2)) / (e(6) + e(2))))
    }
  }

  test("ops_qq_deciles replays an imperative own-vs-rest decile pass") {
    val byType = events()
    val got = QuantileOps.qqDeciles(spark, dir).collect()
    assert(got.length === byType.size * 9)
    got.foreach { row =>
      val t = row.getString(0)
      val d = row.getLong(1).toInt
      val own = interp(byType(t), d / 10.0)
      val rest = interp(
        byType.filter(_._1 != t).values.flatten.toIndexedSeq.sorted, d / 10.0)
      assert(row.getAs[Double]("q_own") === own)
      assert(row.getAs[Double]("q_rest") === rest)
      assert(row.getAs[Double]("gap") === r6(own - rest) + 0.0)
    }
    // non-degenerate: some type must actually drift from the rest
    assert(got.exists(r => math.abs(r.getAs[Double]("gap")) > 1e-6))
  }

  test("ops_ansari_bradley replays an imperative midscore-rank pass") {
    val rows = Tables.t(spark, dir, "events")
      .selectExpr("event_type", "CAST(round(value * 100) AS LONG)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val nAll = rows.length.toLong
    // per distinct pooled value: the midscore = average of
    // a(r) = min(r, N+1−r) over the tie block's rank interval
    val sorted = rows.map(_._2).sorted
    val rankMin = sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, xs) => v -> (xs.map(_._2).min + 1L) }
    val tieC = sorted.groupBy(identity).map { case (v, xs) => v -> xs.length.toLong }
    def midscore(v: Long): Double = {
      val a = rankMin(v)
      val bb = a + tieC(v) - 1
      val scores = (a to bb).map(r => math.min(r, nAll + 1 - r))
      scores.sum.toDouble / scores.length.toDouble
    }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = QuantileOps.ansariBradley(spark, dir).collect()
    val byType = rows.groupBy(_._1)
    assert(got.length === byType.size)
    got.foreach { row =>
      val vs = byType(row.getString(0)).map(_._2)
      assert(row.getAs[Long]("n_s") === vs.length.toLong)
      assert(row.getAs[Long]("n_all") === nAll)
      // mirror the engine's per-block double division then Σ exactly:
      // group values, one division per distinct value
      val stat = vs.groupBy(identity).map { case (v, xs) =>
        BigDecimal(xs.length.toDouble * midscore(v))
          .setScale(12, BigDecimal.RoundingMode.HALF_EVEN)
      }.sum.toDouble
      assert(math.abs(row.getAs[Double]("ab_stat") - r6(stat)) < 1e-5,
        s"${row.getString(0)}: ${row.getAs[Double]("ab_stat")} vs ${r6(stat)}")
    }
    // dispersion actually separates the types
    assert(got.map(_.getAs[Double]("ab_stat")).distinct.length > 1)
  }

  test("cu_length_filter replays an imperative band-filter pass") {
    val bySrc = Tables.t(spark, dir, "documents")
      .selectExpr("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (s0, xs) =>
        s0 -> xs.map(_._2.toDouble).sorted.toIndexedSeq
      }
    val got = QuantileOps.lengthFilter(spark, dir).collect()
    assert(got.length === bySrc.size)
    got.foreach { row =>
      val vs = bySrc(row.getString(0))
      val lo = interp(vs, 0.05)
      val hi = interp(vs, 0.95)
      assert(row.getAs[Long]("n_docs") === vs.length.toLong)
      assert(row.getAs[Double]("lo") === lo)
      assert(row.getAs[Double]("hi") === hi)
      val kept = vs.count(v => v >= lo && v <= hi).toLong
      assert(row.getAs[Long]("n_kept") === kept)
    }
    // the filter must actually drop tail documents somewhere
    assert(got.exists(r => r.getAs[Long]("n_kept") < r.getAs[Long]("n_docs")))
  }

  test("ta_len_profile replays an imperative length-percentile pass") {
    val bySrc = Tables.t(spark, dir, "documents")
      .selectExpr("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (s0, xs) =>
        s0 -> xs.map(_._2.toDouble).sorted.toIndexedSeq
      }
    val got = QuantileOps.lenProfile(spark, dir).collect()
    assert(got.length === bySrc.size)
    got.foreach { row =>
      val vs = bySrc(row.getString(0))
      assert(row.getAs[Long]("n_docs") === vs.length.toLong)
      Seq("p10" -> 0.1, "p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75,
        "p90" -> 0.9, "p99" -> 0.99).foreach { case (nm, q) =>
        assert(row.getAs[Double](nm) === interp(vs, q), nm)
      }
      assert(row.getAs[Double]("iqr") ===
        r6(interp(vs, 0.75) - interp(vs, 0.25)))
    }
  }
}
