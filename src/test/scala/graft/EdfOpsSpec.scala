package graft

import graft.queries.EdfOps

/** Driver-side reference checks for the round-15 EDF tranche, on the
  * house pattern: each oracle-gated query also proves its algebra
  * against an independently-coded imperative reference at sf0.001, so
  * a mistake both engines would replay identically still fails.
  */
class EdfOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** (type → sorted pooled buckets with per-type and pooled inclusive
    * cumulative counts) — the imperative ECDF grid both stats replay.
    */
  private lazy val refGrid: (Seq[Long], Map[String, Array[Long]], Array[Long], Map[String, Long], Long) = {
    val ev = Tables.t(spark, dir, "events")
      .selectExpr("event_type", "CAST(round(value * 100) AS LONG) AS b")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val buckets = ev.map(_._2).distinct.sorted.toSeq
    val types = ev.map(_._1).distinct
    val perType = types.map { t =>
      val cnt = ev.filter(_._1 == t).groupBy(_._2).map { case (b, xs) => b -> xs.length.toLong }
      var run = 0L
      t -> buckets.map { b => run += cnt.getOrElse(b, 0L); run }.toArray
    }.toMap
    val cntAll = ev.groupBy(_._2).map { case (b, xs) => b -> xs.length.toLong }
    var run = 0L
    val cumAll = buckets.map { b => run += cntAll(b); run }.toArray
    val l = buckets.map(cntAll).toArray
    // re-purpose: cumAll is inclusive; l kept separately below
    (buckets, perType, cumAll, perType.map { case (t, c) => t -> c.last }, ev.length.toLong)
  }

  test("ops_cvm_test replays an imperative tie-aware ECDF computation") {
    val (buckets, perType, cumAll, nS, nAll) = refGrid
    val ev = Tables.t(spark, dir, "events")
      .selectExpr("event_type", "CAST(round(value * 100) AS LONG) AS b")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val cntAll = ev.groupBy(_._2).map { case (b, xs) => b -> xs.length.toLong }
    val got = EdfOps.cvmTest(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet === perType.keySet)
    perType.keySet.foreach { t =>
      val n = nS(t); val m = nAll - n
      val num = buckets.indices.map { i =>
        val d = BigInt(perType(t)(i)) * nAll - BigInt(n) * cumAll(i)
        BigInt(cntAll(buckets(i))) * d * d
      }.sum
      val expect = r6(num.toDouble / ((n * m).toDouble * (nAll * nAll).toDouble))
      assert(got(t)._1 === n, s"n_s for $t")
      assert(got(t)._2 === expect, s"cvm for $t")
      assert(got(t)._2 >= 0.0)
    }
  }

  test("ops_anderson_darling replays the A2kN k=2 collapse") {
    val (buckets, perType, cumAll, nS, nAll) = refGrid
    val ev = Tables.t(spark, dir, "events")
      .selectExpr("event_type", "CAST(round(value * 100) AS LONG) AS b")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val cntAll = ev.groupBy(_._2).map { case (b, xs) => b -> xs.length.toLong }
    val got = EdfOps.andersonDarling(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    perType.keySet.foreach { t =>
      val n = nS(t); val m = nAll - n
      val tsum = buckets.indices.filter(i => cumAll(i) < nAll).map { i =>
        val d = BigInt(perType(t)(i)) * nAll - BigInt(n) * cumAll(i)
        val num = (BigInt(cntAll(buckets(i))) * d * d).toDouble
        val den = (BigInt(cumAll(i)) * (nAll - cumAll(i))).toDouble
        BigDecimal(num / den).setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      val expect = r6(tsum.toDouble / (n * m).toDouble)
      assert(got(t)._1 === n, s"n_s for $t")
      assert(got(t)._2 === expect, s"ad for $t")
      assert(got(t)._2 >= 0.0)
    }
  }

  test("ops_ad_ksample replays the Scholz-Stephens k-sample collapse") {
    val (buckets, perType, cumAll, nS, nAll) = refGrid
    val ev = Tables.t(spark, dir, "events")
      .selectExpr("event_type", "CAST(round(value * 100) AS LONG) AS b")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val cntAll = ev.groupBy(_._2).map { case (b, xs) => b -> xs.length.toLong }
    val got = graft.queries.EdfOps.adKSample(spark, dir).collect()
    assert(got.length === 1)
    val row = got.head
    assert(row.getLong(0) === perType.size.toLong) // k
    assert(row.getLong(1) === nAll)                // n_all
    val osum = perType.keySet.toSeq.map { t =>
      val n = nS(t)
      val tsum = buckets.indices.filter(i => cumAll(i) < nAll).map { i =>
        val d = BigInt(perType(t)(i)) * nAll - BigInt(n) * cumAll(i)
        val num = (BigInt(cntAll(buckets(i))) * d * d).toDouble
        val den = (BigInt(cumAll(i)) * (nAll - cumAll(i))).toDouble
        BigDecimal(num / den).setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      BigDecimal(tsum.toDouble / n.toDouble)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    }.sum
    assert(row.getDouble(2) === r6(osum.toDouble / nAll.toDouble), "a2kn")
    assert(row.getDouble(2) >= 0.0)
  }

  test("ops_energy_distance replays a brute-force all-pairs computation") {
    // an INDEPENDENT algebra: the gate integrates cumulative counts
    // over value segments; this replay sums |difference| over every
    // pair explicitly — agreement pins the segment-integral identity
    val ev = Tables.t(spark, dir, "events")
      .selectExpr("event_type", "CAST(round(value * 100) AS LONG) AS b")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val nAll = ev.length.toLong
    val got = graft.queries.EdfOps.energyDistance(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq === ev.map(_._1).distinct.sorted.toSeq)
    got.foreach { case (t, n, eDist, tStat) =>
      val xs = ev.filter(_._1 == t).map(_._2)
      val ys = ev.filter(_._1 != t).map(_._2)
      assert(n === xs.length.toLong)
      val m = ys.length.toLong
      // |x−y| ≤ the cent range and there are ≤10⁶ pairs at sf0.001:
      // a Long accumulator is exact with orders of magnitude to spare
      def pairSum(a: Array[Long], b: Array[Long]): Long =
        a.foldLeft(0L)((acc, x) =>
          acc + b.foldLeft(0L)((acc2, y) => acc2 + math.abs(x - y)))
      val aXY = pairSum(xs, ys).toDouble / (n * m).toDouble
      val bXX = pairSum(xs, xs).toDouble / (n * n).toDouble
      val cYY = pairSum(ys, ys).toDouble / (m * m).toDouble
      val e = 2.0 * aXY - bXX - cYY
      assert(eDist === r6(e / 100.0), s"e_dist for $t")
      assert(tStat === r6((n * m).toDouble / nAll.toDouble * e / 100.0),
        s"t_stat for $t")
      assert(eDist >= 0.0)
    }
  }

  /** Chunked-draw uniform (r17): world r reads 32-bit word
    * (r−1) mod 4 of md5(id:cvmperm:⌊(r−1)/4⌋) — one md5 serves four
    * worlds, the derivation the gate and its oracle both compute.
    */
  private def md5u32(id: Long, r: Int): Long = {
    val chunk = (r - 1) / 4
    val w = (r - 1) % 4
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$id:cvmperm:$chunk".getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(w * 8, w * 8 + 8), 16)
  }

  test("ops_cvm_permutation replays a full imperative permutation pass") {
    val ev = Tables.t(spark, dir, "events")
      .selectExpr("event_id", "event_type", "CAST(round(value * 100) AS LONG) AS b")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val buckets = ev.map(_._3).distinct.sorted
    val nAll = ev.length.toLong
    val cntAll = ev.groupBy(_._3).map { case (b, xs) => b -> xs.length.toLong }
    var run = 0L
    val cumAll = buckets.map { b => run += cntAll(b); b -> run }.toMap
    val types = ev.map(_._2).distinct.sorted
    val nS = types.map(t => t -> ev.count(_._2 == t).toLong).toMap

    def cvmOf(memberAt: Map[Long, Long], n: Long): Double = {
      if (n <= 0 || n >= nAll) return 0.0
      var cum = 0L
      val num = buckets.map { b =>
        cum += memberAt.getOrElse(b, 0L)
        val d = BigInt(cum) * nAll - BigInt(n) * cumAll(b)
        BigInt(cntAll(b)) * d * d
      }.sum
      num.toDouble / ((n * (nAll - n)).toDouble * (nAll * nAll).toDouble)
    }

    val tObs = types.map { t =>
      val at = ev.filter(_._2 == t).groupBy(_._3)
        .map { case (b, xs) => b -> xs.length.toLong }
      t -> cvmOf(at, nS(t))
    }.toMap

    val expected = types.map { t =>
      val ge = (1 to 19).count { r =>
        val members = ev.filter { case (id, _, _) =>
          md5u32(id, r) * nAll < nS(t) * 4294967296L
        }
        val at = members.groupBy(_._3).map { case (b, xs) => b -> xs.length.toLong }
        cvmOf(at, members.length.toLong) >= tObs(t)
      }
      t -> ((ge + 1).toDouble / 20.0)
    }.toMap

    val got = graft.queries.EdfOps.cvmPermutation(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq === types)
    got.foreach { case (t, n, stat, p) =>
      assert(n === nS(t))
      assert(stat === r6(tObs(t)), s"cvm_stat for $t")
      assert(p === r6(expected(t)), s"p_perm for $t")
      assert(p >= 0.05 - 1e-9 && p <= 1.0)
    }
  }

  test("ops_cvmperm_xxhash twin shares schema and the hash-independent observed statistic") {
    val gate = graft.queries.EdfOps.cvmPermutation(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val twin = graft.queries.EdfOps.cvmPermutationXx(spark, dir)
    assert(twin.schema.fieldNames.toSeq ===
      Seq("event_type", "n_s", "cvm_stat", "p_perm"))
    val tw = twin.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    // t_obs never touches the relabel hash: the twin must agree on it
    assert(tw === gate)
  }

  test("cu_quantile_norm maps each midquantile to the exact pooled order statistic") {
    val docs = Tables.t(spark, dir, "documents")
      .selectExpr("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val pooledSorted = docs.map(_._2).sorted
    val nAll = pooledSorted.length.toLong
    val got = EdfOps.quantileNorm(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))

    // one output row per distinct (source, n_chars)
    assert(got.map(r => (r._1, r._2)).distinct.length === got.length)
    assert(got.map(r => (r._1, r._2)).toSet === docs.map(d => (d._1, d._2)).toSet)

    val bySrc = docs.groupBy(_._1)
    got.foreach { case (src, v, q, mapped) =>
      val vals = bySrc(src).map(_._2)
      val n = vals.length.toLong
      val cLt = vals.count(_ < v).toLong
      val cEq = vals.count(_ == v).toLong
      val mid2 = 2 * cLt + cEq + 1
      assert(q === r6(mid2.toDouble / (2.0 * n)), s"quantile at ($src,$v)")
      // k-th pooled order statistic, k = ceil(mid2*N / 2n)
      val k = (mid2 * nAll + 2 * n - 1) / (2 * n)
      assert(k >= 1 && k <= nAll)
      assert(mapped === pooledSorted((k - 1).toInt), s"mapped at ($src,$v)")
    }
    // monotone within source: a larger value never maps lower
    got.groupBy(_._1).values.foreach { rows =>
      rows.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) => assert(a._4 <= b._4, s"monotonicity in ${a._1}")
        case _           =>
      }
    }
  }
}
