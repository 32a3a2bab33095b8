package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Cross-DERIVATION properties for the statistical surface: each
  * operator's production formula (the rank/moment algebra the Spark
  * plan and the DuckDB oracle both execute) is checked against an
  * INDEPENDENT classical definition of the same statistic on random
  * inputs — so a shared algebra bug that both engines replay
  * identically (which the hash-match gate cannot see, by design)
  * still fails a test.
  *
  *  - Gini rank formula ≡ the mean-absolute-difference identity
  *    G = Σᵢⱼ|xᵢ−xⱼ| / (2n²·x̄);
  *  - the integer 2·mid-rank carry ≡ naive average-of-positions ranks;
  *  - Mann–Whitney U from rank sums ≡ the direct pair count
  *    U_A = #{a>b} + ½·#{a=b};
  *  - Kendall-style MK statistic S ≡ pairwise sign count under
  *    arbitrary tie patterns.
  *
  * Deterministic scalacheck sampling (fixed seed, pureApply) keeps the
  * suite replayable — the house convention (TemporalFixupsSpec).
  */
class StatPropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  // value pools with heavy tie mass — ties are where rank algebra breaks
  private val valuesGen: Gen[List[Long]] =
    Gen.chooseNum(2, 120).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 12L)))

  test("gini rank formula equals the mean-absolute-difference identity on random data") {
    val runs = samples(Gen.listOfN(60, valuesGen.map(_.map(_ + 1))), 7L) // positive
    runs.foreach { xs =>
      val n = xs.length.toLong
      val sorted = xs.sorted
      val s = sorted.map(BigInt(_)).sum
      val s1 = sorted.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
      val viaRanks = (2 * s1 - (n + 1) * s).toDouble / (n * s).toDouble
      // independent derivation: G = Σ|xi−xj| / (2 n Σx)
      val mad = (for (a <- xs; b <- xs) yield BigInt((a - b).abs)).sum
      val viaMad = mad.toDouble / (2 * n).toDouble / s.toDouble
      assert(math.abs(viaRanks - viaMad) < 1e-12, s"$viaRanks vs $viaMad on n=$n")
    }
  }

  test("the 2*mid-rank carry equals naive average-of-positions ranks on random ties") {
    val runs = samples(Gen.listOfN(60, valuesGen), 11L)
    runs.foreach { xs =>
      val sorted = xs.sorted
      // naive: average the 1-based positions of each tie block
      val positions = sorted.zipWithIndex.groupBy(_._1)
        .view.mapValues(g => g.map(_._2 + 1).sum.toDouble / g.length).toMap
      // production carry: 2r_avg = 2*min_rank + ties − 1 (integer)
      val minRank = sorted.zipWithIndex.groupBy(_._1)
        .view.mapValues(g => (g.map(_._2).min + 1).toLong).toMap
      val cnt = xs.groupBy(identity).view.mapValues(_.length.toLong).toMap
      xs.distinct.foreach { v =>
        val carried = (2 * minRank(v) + cnt(v) - 1).toDouble / 2.0
        assert(carried === positions(v), s"value $v: $carried vs ${positions(v)}")
      }
    }
  }

  test("U from the rank sum equals the direct pair count on random two-sample data") {
    val gen = for {
      a <- valuesGen
      b <- valuesGen
    } yield (a, b)
    val runs = samples(Gen.listOfN(40, gen), 13L)
    runs.foreach { case (a, b) =>
      val all = a ++ b
      val sorted = all.sorted
      val minRank = sorted.zipWithIndex.groupBy(_._1)
        .view.mapValues(g => (g.map(_._2).min + 1).toLong).toMap
      val cnt = all.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val s2a = a.map(v => BigInt(2 * minRank(v) + cnt(v) - 1)).sum
      val nA = BigInt(a.length)
      val uViaRanks = (s2a - nA * (nA + 1)).toDouble / 2.0
      // independent derivation: count dominated pairs directly
      val uDirect = (for (x <- a; y <- b) yield {
        if (x > y) 1.0 else if (x == y) 0.5 else 0.0
      }).sum
      assert(uViaRanks === uDirect, s"$uViaRanks vs $uDirect")
    }
  }

  test("MK variance numerator stays non-negative and S bounded under arbitrary ties") {
    val runs = samples(Gen.listOfN(60, valuesGen), 17L)
    runs.foreach { xs =>
      val n = xs.length.toLong
      val s = (for (i <- xs.indices; j <- (i + 1) until xs.length)
        yield math.signum(xs(j) - xs(i)).toLong).sum
      val maxPairs = n * (n - 1) / 2
      assert(math.abs(s) <= maxPairs, "S exceeds the pair count")
      val ties = xs.groupBy(identity).values.map(_.length.toLong)
      val tieTerm = ties.map(t => t * (t - 1) * (2 * t + 5)).sum
      val varNum = n * (n - 1) * (2 * n + 5) - tieTerm
      assert(varNum >= 0, s"tie correction overshoots: $varNum")
      // all-equal input degenerates exactly to zero variance and S=0
      if (xs.distinct.length == 1) assert(s == 0 && varNum == 0)
    }
  }

  test("KW H via the S2 sums equals the textbook between-group rank variance") {
    val runs = samples(Gen.listOfN(60, valuesGen), 23L)
    runs.foreach { xs =>
      // k deterministic groups round-robin so group sizes differ
      val groups = xs.zipWithIndex.groupBy(_._2 % 3).values
        .map(_.map(_._1)).filter(_.nonEmpty).toList
      val all = groups.flatten
      val n = all.length.toLong
      if (n >= 2 && groups.size >= 2) {
        val minRank = all.distinct
          .map(v => v -> (all.count(_ < v) + 1).toLong).toMap
        val cnt = all.groupBy(identity).view.mapValues(_.length.toLong).toMap
        def s2(g: List[Long]): BigInt =
          g.map(v => BigInt(2 * minRank(v) + cnt(v) - 1)).sum
        // production route: H = 3·Σ(S2²/n_i)/(N(N+1)) − 3(N+1)
        val t = groups.map(g => s2(g).toDouble * s2(g).toDouble / g.length).sum
        val viaS2 = 3.0 * t / (n * (n + 1)).toDouble - 3.0 * (n + 1)
        // textbook: H = 12/(N(N+1))·Σ n_i(r̄_i − r̄)² with midranks
        val rbar = (n + 1).toDouble / 2.0
        val between = groups.map { g =>
          val ri = s2(g).toDouble / (2.0 * g.length)
          g.length * (ri - rbar) * (ri - rbar)
        }.sum
        val viaDef = 12.0 / (n * (n + 1)).toDouble * between
        assert(math.abs(viaS2 - viaDef) < 1e-7, s"$viaS2 vs $viaDef n=$n")
        // H is nonnegative up to float fuzz
        assert(viaS2 > -1e-7)
      }
    }
  }

  test("AUC from the midrank sum equals the direct pair probability") {
    val runs = samples(Gen.listOfN(60, Gen.zip(valuesGen, valuesGen)), 29L)
    runs.foreach { case (pos, neg) =>
      val all = pos ++ neg
      val minRank = all.distinct
        .map(v => v -> (all.count(_ < v) + 1).toLong).toMap
      val cnt = all.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val s2pos = pos.map(v => BigInt(2 * minRank(v) + cnt(v) - 1)).sum
      val n1 = BigInt(pos.length); val n0 = BigInt(neg.length)
      // production route: (S2⁺ − n₁(n₁+1)) / (2 n₁ n₀)
      val viaRanks = (s2pos - n1 * (n1 + 1)).toDouble /
        (2.0 * (n1 * n0).toDouble)
      // definition: P(pos > neg) + ½ P(tie)
      val viaPairs = (for (p <- pos; q <- neg) yield {
        if (p > q) 1.0 else if (p == q) 0.5 else 0.0
      }).sum / (pos.length.toDouble * neg.length)
      assert(math.abs(viaRanks - viaPairs) < 1e-12, s"$viaRanks vs $viaPairs")
      // AUC is rank-based: invariant under a strictly monotone transform
      val tPos = pos.map(x => x * x * 2 + 3) // strictly increasing on [0,12]
      val tNeg = neg.map(x => x * x * 2 + 3)
      val tAll = tPos ++ tNeg
      val tMin = tAll.distinct.map(v => v -> (tAll.count(_ < v) + 1).toLong).toMap
      val tCnt = tAll.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val tS2 = tPos.map(v => BigInt(2 * tMin(v) + tCnt(v) - 1)).sum
      val tAuc = (tS2 - n1 * (n1 + 1)).toDouble / (2.0 * (n1 * n0).toDouble)
      assert(math.abs(tAuc - viaRanks) < 1e-12, "AUC not rank-invariant")
    }
  }

  test("Shapley subset-weight sum equals the permutation average on random games") {
    val bits = Seq(1, 2, 4, 8)
    val weights = Map(0 -> 6L, 1 -> 2L, 2 -> 2L, 3 -> 6L) // |S|!(3−|S|)!
    val vGen = Gen.listOfN(16, Gen.chooseNum(0L, 50L))
    val games = samples(Gen.listOfN(40, vGen), 31L)
    games.foreach { vList =>
      val v = vList.toArray
      val perms = bits.permutations.toSeq
      bits.foreach { bit =>
        // production route: Σ_{S∌i} w(|S|)(v(S∪i)−v(S)) / 4!
        val viaSubsets = (0 until 16)
          .filter(s => (s & bit) == 0)
          .map(s => weights(java.lang.Integer.bitCount(s)) *
            (v(s | bit) - v(s)))
          .sum.toDouble / 24.0
        // definition: average marginal contribution over orderings
        val viaPerms = perms.map { p =>
          val before = p.takeWhile(_ != bit).sum
          (v(before | bit) - v(before)).toDouble
        }.sum / perms.size
        assert(math.abs(viaSubsets - viaPerms) < 1e-9,
          s"bit $bit: $viaSubsets vs $viaPerms")
      }
      // efficiency axiom on the subset-weight route
      val sumPhi = bits.map { bit =>
        (0 until 16).filter(s => (s & bit) == 0)
          .map(s => weights(java.lang.Integer.bitCount(s)) *
            (v(s | bit) - v(s))).sum.toDouble / 24.0
      }.sum
      assert(math.abs(sumPhi - (v(15) - v(0)).toDouble) < 1e-9, "efficiency")
    }
  }

  test("Theil index is nonnegative, ≤ ln N, scale-invariant, zero iff equal") {
    val runs = samples(Gen.listOfN(60, valuesGen.map(_.map(_ + 1))), 37L)
    def theil(xs: List[Long]): Double = {
      val n = xs.length.toDouble
      val tot = xs.map(BigInt(_)).sum.toDouble
      xs.map(x => (x / tot) * math.log(n * x / tot)).sum
    }
    runs.foreach { xs =>
      val t = theil(xs)
      assert(t >= -1e-12, s"negative Theil $t")
      assert(t <= math.log(xs.length.toDouble) + 1e-12, s"Theil above ln N")
      // scale invariance: measuring in cents vs dollars changes nothing
      assert(math.abs(theil(xs.map(_ * 100)) - t) < 1e-9, "not scale-invariant")
      if (xs.distinct.length == 1) assert(math.abs(t) < 1e-12)
    }
  }
}
