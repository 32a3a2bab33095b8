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
}
