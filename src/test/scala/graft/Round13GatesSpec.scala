package graft

import graft.queries.{LlmVectors, StatOps, TextScores}

/** Driver-side reference checks for the round-13 gates, on the house
  * pattern: every oracle-gated query also proves its algebra against an
  * independently-coded reference at sf0.001, so a shared mistake both
  * engines would replay identically still fails.
  */
class Round13GatesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("ta_ttr_diversity: counts and ratios replay a driver-side recount") {
    val got = TextScores.ttrDiversity(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toSeq
    assert(got.nonEmpty)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, nTok, nTyp, nHap, ttr, hapr, guiraud) <- got) {
      val toks = docs(id).toLowerCase.split(" ", -1)
      val counts = toks.groupBy(identity).view.mapValues(_.length).toMap
      assert(nTok === toks.length.toLong, s"doc $id tokens")
      assert(nTyp === counts.size.toLong, s"doc $id types")
      assert(nHap === counts.valuesIterator.count(_ == 1).toLong, s"doc $id hapax")
      assert(ttr === r6(counts.size.toDouble / toks.length), s"doc $id ttr")
      assert(hapr === r6(counts.valuesIterator.count(_ == 1).toDouble / counts.size),
        s"doc $id hapax_ratio")
      assert(guiraud === r6(counts.size.toDouble / math.sqrt(toks.length.toDouble)),
        s"doc $id guiraud")
    }
  }

  // shared embedding loader for the two vector-gate replays
  private def embMap(): Map[Long, Array[Double]] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS emb")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap

  test("sim_sq8_topk: codes, integer scores, and ranking replay driver-side SQ8") {
    val got = LlmVectors.sq8Topk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    val emb = embMap()
    // replay: L2-normalize, global symmetric scale, int8 codes
    val normed = emb.view.mapValues { v =>
      val nrm = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / nrm)
    }.toMap
    val s = normed.values.map(_.map(math.abs).max).max
    val codes = normed.view
      .mapValues(_.map(x => math.floor(x * 127.0 / s + 0.5).toLong)).toMap
    // every code is a true signed int8 value
    assert(codes.values.forall(_.forall(c => c >= -127 && c <= 127)))
    val qs = got.map(_._1).distinct
    for (q <- qs) {
      val ranked = got.filter(_._1 == q).sortBy(_._2)
      // replay: integer code dot, (score desc, vec_id) order
      val ref = emb.keys.filter(_ != q).toSeq
        .map(v => (v, codes(v).zip(codes(q)).map(p => p._1 * p._2).sum))
        .sortBy { case (v, s) => (-s, v) }.take(ranked.length)
      assert(ranked.map(r => (r._3, r._4)).toSeq === ref, s"q $q")
    }
    // SQ8 at 8 bits preserves most of the exact cosine top-5 on this
    // corpus — sanity that the quantizer is a usable ANN, not noise
    val exact = LlmVectors.topkExact(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
    val overlap = qs.map(q => got.filter(_._1 == q).map(_._3)
      .count(exact(q).map(_._2).toSet)).sum.toDouble / qs.size
    assert(overlap >= 4.0, s"mean SQ8/exact top-5 overlap $overlap < 4")
  }

  test("sim_knn_classify: votes and argmax replay a driver-side kNN pass") {
    val got = LlmVectors.knnClassify(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.nonEmpty)
    val emb = embMap()
    val labels = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "CAST(label AS BIGINT) AS label").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def cos9(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map(p => p._1 * p._2).sum
      val c = d / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
      BigDecimal(c).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val split = 64L
    val train = emb.keys.filter(_ >= split).toSeq
    for ((q, trueLab, pred, votes, correct) <- got) {
      assert(q < split)
      assert(trueLab === labels(q))
      val nbrs = train.map(v => (v, cos9(emb(v), emb(q))))
        .sortBy { case (v, c) => (-c, v) }.take(5).map(_._1)
      val voteMap = nbrs.groupBy(labels).view.mapValues(_.size).toMap
      val (refPred, refVotes) = voteMap.toSeq
        .sortBy { case (lab, n) => (-n, lab) }.head
      assert((pred, votes) === ((refPred, refVotes.toLong)), s"q $q")
      assert(correct === (if (pred == trueLab) 1L else 0L))
    }
    // every test vector got exactly one prediction
    assert(got.map(_._1).distinct.length === got.length)
    assert(got.length === emb.keys.count(_ < split))
  }

  test("cu_filter_funnel: attrition counts replay a driver-side cascade") {
    val got = graft.queries.TrainingPrep.filterFunnel(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.length === 4)
    val stops = Set("the", "a", "of", "and", "in", "to")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("lang", "n_chars", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    // independent cascade: filter the doc list step by step
    val s0 = docs
    val s1 = s0.filter(_._1 == "en")
    val s2 = s1.filter(d => d._2 >= 100 && d._2 <= 500)
    def toks(t: String) = t.split(" ", -1)
    val s3 = s2.filter { d =>
      val tk = toks(d._3); tk.distinct.length.toDouble / tk.length >= 0.3
    }
    val s4 = s3.filter { d =>
      val tk = toks(d._3); tk.count(stops).toDouble / tk.length <= 0.5
    }
    val expect = Seq(
      (1L, "lang_en", s0.length, s0.length - s1.length, s1.length),
      (2L, "len_100_500", s1.length, s1.length - s2.length, s2.length),
      (3L, "ttr_min_03", s2.length, s2.length - s3.length, s3.length),
      (4L, "stopfrac_max_05", s3.length, s3.length - s4.length, s4.length),
    ).map(t => (t._1, t._2, t._3.toLong, t._4.toLong, t._5.toLong))
    assert(got.toSeq === expect)
    // the funnel must actually attrit somewhere (non-degenerate fixture)
    assert(s4.length < s0.length && s4.nonEmpty)
  }

  test("ops_jackknife_se: LOO means and SE replay driver-side moments") {
    val got = StatOps.jackknifeSe(spark, dir).collect()
    val buckets = got.filter(_.getLong(0) >= 0)
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val all = got.filter(_.getLong(0) === -1L).head
    val events = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("user_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val perUser = events.filter(_._2 == "purchase").groupBy(_._1)
      .map { case (u, es) => (u, es.map(e => math.round(e._3 * 1000000)).sum) }
    val byBucket = perUser.groupBy(_._1 % 10)
      .map { case (b, us) => (b, us.size.toLong, us.map(_._2).map(BigInt(_)).sum) }
      .toSeq.sortBy(_._1)
    val nn = byBucket.map(_._2).sum
    val ss = byBucket.map(_._3).sum
    val refLoo = byBucket.map { case (b, n, sy) =>
      (b, n, r6((ss - sy).toDouble / (nn - n).toDouble / 1000000.0))
    }
    assert(buckets.toSeq === refLoo)
    val ds = refLoo.map(t => BigInt(math.round(t._3 * 1000000)))
    val g = BigInt(10)
    val a = g * ds.map(d => d * d).sum - ds.sum * ds.sum
    val refSe = r6(math.sqrt((BigInt(9) * a).toDouble) / 10 / 1000000.0)
    assert(all.getDouble(4) === refSe)
    assert(all.getDouble(3) === r6(ss.toDouble / nn.toDouble / 1000000.0))
    assert(all.getLong(1) === nn)
  }

  test("ta_dup_ngram_frac: coverage replays a driver-side position walk") {
    val got = graft.queries.LlmText.dupNgramFrac(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.nonEmpty)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    var anyCovered = false
    for ((id, nTok, nGrams, nRep, cov, frac) <- got) {
      val tk = docs(id).split(" ", -1)
      assert(nTok === tk.length.toLong)
      val grams = (0 to tk.length - 3).map(i => (i, tk.slice(i, i + 3).mkString(" ")))
      val cnt = grams.groupBy(_._2).view.mapValues(_.size).toMap
      assert(nGrams === cnt.size.toLong, s"doc $id distinct grams")
      assert(nRep === cnt.valuesIterator.count(_ >= 2).toLong, s"doc $id repeated")
      val covered = grams.filter(g => cnt(g._2) >= 2)
        .flatMap(g => g._1 to g._1 + 2).distinct.size
      assert(cov === covered.toLong, s"doc $id coverage")
      assert(frac === r6(covered.toDouble / tk.length), s"doc $id frac")
      if (covered > 0) anyCovered = true
    }
    assert(anyCovered, "fixture has no repeated 3-grams anywhere — probe is dead")
  }

  test("sk_hll_distinct: registers and estimate replay a driver-side HLL") {
    val got = graft.queries.Sketches.hllDistinct(spark, dir).collect().head
    val m = 64
    // independent register build over the same md5-60bit hash
    val keys = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("CAST(o_custkey AS STRING) AS k").collect().map(_.getString(0))
    def h60(sv: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(sv.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val regs = Array.fill(m)(0L)
    for (k <- keys) {
      val h = h60(k)
      val bucket = (h / 18014398509481984L).toInt
      val w = h % 18014398509481984L
      val rank = if (w == 0) 55L else 55L - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rank > regs(bucket)) regs(bucket) = rank
    }
    // registers ship as the '|'-joined canonical string (OutputContract,
    // r14: the driver's pandas compare cannot hash array cells)
    assert(got.getString(4).split('|').map(_.toLong).toSeq === regs.toSeq,
      "register mismatch")
    val sScaled = regs.map(r => 1L << (55 - r)).sum
    assert(got.getLong(3) === sScaled)
    val vZero = regs.count(_ == 0L)
    assert(got.getLong(2) === vZero.toLong)
    val num = 0.709 * m * m * math.pow(2, 55)
    val raw = num / sScaled.toDouble
    val refEst =
      if (raw <= 2.5 * m && vZero > 0) r6(m.toDouble * math.log(m.toDouble / vZero))
      else r6(raw)
    assert(got.getDouble(5) === refEst)
    val exact = keys.distinct.length
    assert(got.getLong(1) === exact.toLong)
    // the estimator is a real estimator: within 5 standard errors
    // (1.04/sqrt(64) ≈ 13%) of truth on this fixture
    assert(math.abs(got.getDouble(6)) < 5 * 1.04 / math.sqrt(m.toDouble),
      s"rel_error ${got.getDouble(6)} implausibly large")
  }

  test("st_cohort_ltv: curve replays a driver-side cohort walk") {
    val got = graft.queries.StreamingGates.cohortLtv(spark, dir).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(got.nonEmpty)
    val rows = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("user_id", "event_type", "value",
        "CAST(date_trunc('week', ts) AS DATE) AS wk").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getDate(3)))
    val firstWk = rows.groupBy(_._1).view.mapValues(_.map(_._4).minBy(_.getTime)).toMap
    val sizes = firstWk.values.groupBy(identity).view.mapValues(_.size).toMap
    val byAge = rows.filter(_._2 == "purchase")
      .map { case (u, _, v, wk) =>
        val cw = firstWk(u)
        ((cw, (wk.toLocalDate.toEpochDay - cw.toLocalDate.toEpochDay) / 7),
          math.round(v * 1000000))
      }
      .groupBy(_._1).view
      .mapValues(vs => (vs.size.toLong, vs.map(_._2).sum)).toMap
    val ref = byAge.toSeq
      .sortBy { case ((cw, age), _) => (cw.toString, age) }
      .groupBy(_._1._1).toSeq.flatMap { case (cw, entries) =>
        var cum = 0L
        entries.sortBy(_._1._2).map { case ((_, age), (np, vm)) =>
          cum += vm
          (cw.toString, age, sizes(cw).toLong, np,
            r6(cum.toDouble / sizes(cw) / 1000000.0))
        }
      }.sortBy(t => (t._1, t._2))
    assert(got.toSeq === ref)
  }

  test("ops_ipw_ate: strata, positivity filter, and ATE replay driver-side") {
    val got = StatOps.ipwAte(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(7)) None else Some(r.getDouble(7))))
    assert(got.nonEmpty)
    val events = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("user_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val users = events.groupBy(_._1).map { case (u, es) =>
      val nClick = es.count(_._2 == "click")
      val nErr = es.count(_._2 == "error")
      val y = es.filter(_._2 == "purchase")
        .map(e => math.round(e._3 * 1000000)).sum
      (math.min(3L, nClick / 5), if (nErr >= 14) 1 else 0, y)
    }.toSeq
    val strata = users.groupBy(_._1).map { case (st, us) =>
      val t = us.filter(_._2 == 1); val c = us.filter(_._2 == 0)
      (st, us.size.toLong, t.size.toLong, c.size.toLong,
        t.map(_._3).sum, c.map(_._3).sum)
    }.filter(s => s._3 > 0 && s._4 > 0).toSeq.sortBy(_._1)
    val refRows = strata.map { case (st, n, nt, nc, syt, syc) =>
      val eff = r6(syt.toDouble / nt / 1000000.0 - syc.toDouble / nc / 1000000.0)
      (st, n, nt, nc, Some(eff))
    }
    // ALL row: DECIMAL-exact n_s × effect6 reweight, one division
    val wsum = refRows.map { case (_, n, _, _, eff) =>
      BigDecimal(n) * BigDecimal(eff.get)
    }.sum
    val nAll = refRows.map(_._2).sum
    val all = (-1L, nAll, refRows.map(_._3).sum, refRows.map(_._4).sum,
      Some(r6(wsum.toDouble / nAll)))
    assert(got.toSeq === (all +: refRows), "strata or ATE mismatch")
  }

  // shared md5-derived 60-bit hash (the Sketches.h60 device), replayed
  // independently of Spark's conv/substring pipeline
  private def md5h60(sv: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(sv.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Chunked bootstrap draw (r17): resample r reads 8-hex window
    * (r−1) mod 4 of md5(key:boot⌊(r−1)/4⌋) — the gate's and oracle's
    * derivation.
    */
  private def bootU8(key: Long, r: Int): String = {
    val w = (r - 1) % 4
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"$key:boot${(r - 1) / 4}".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(w * 8, w * 8 + 8)
  }

  // the engine's Σ-through-DECIMAL(38,12) device: each double term is
  // rounded to 12 dp (HALF_UP, Spark's cast semantics) before the sum
  private def decSum12(xs: Iterable[Double]): Double =
    xs.map(x => BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble

  test("sk_kmv_intersect: theta algebra replays a driver-side sketch build") {
    val got = graft.queries.Sketches.kmvIntersect(spark, dir).collect().head
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .selectExpr("l_orderkey", "l_returnflag")
      .filter("l_returnflag IN ('A','R')").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val setA = li.filter(_._2 == "A").map(_._1).toSet
    val setB = li.filter(_._2 == "R").map(_._1).toSet
    val k = graft.functions.KmvSketch.K
    val kA = setA.toSeq.map(x => md5h60(x.toString)).sorted.take(k)
    val kB = setB.toSeq.map(x => md5h60(x.toString)).sorted.take(k)
    val theta = math.min(kA.last, kB.last)
    val keptA = kA.filter(_ < theta).toSet
    val keptB = kB.filter(_ < theta).toSet
    assert(got.getLong(0) === setA.size.toLong)
    assert(got.getLong(1) === setB.size.toLong)
    assert(got.getLong(2) === (setA intersect setB).size.toLong)
    assert(got.getLong(3) === (setA union setB).size.toLong)
    assert(got.getLong(4) === theta)
    assert(got.getLong(5) === (keptA union keptB).size.toLong)
    assert(got.getLong(6) === (keptA intersect keptB).size.toLong)
    val pow60 = math.pow(2, 60)
    assert(got.getDouble(7) ===
      r6((keptA union keptB).size.toDouble * pow60 / theta.toDouble))
    assert(got.getDouble(8) ===
      r6((keptA intersect keptB).size.toDouble * pow60 / theta.toDouble))
    // the estimates estimate: within 4 relative standard errors of truth
    // wherever the sketch is saturated (rse ≈ 1/sqrt(k-1))
    val rse = 4.0 / math.sqrt((k - 1).toDouble)
    val union = (setA union setB).size.toDouble
    assert(math.abs(got.getDouble(7) - union) / union < rse)
  }

  test("ops_fdr_bh: step-up threshold replays the BH procedure over the welch grid") {
    val got = StatOps.fdrBh(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4), r.getInt(5)))
    assert(got.nonEmpty)
    val welch = StatOps.welchTTest(spark, dir).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("t_stat")).toSeq
    val m = welch.size
    val ranked = welch
      .map { case (et, t) => (et, t, r6(2.0 / (1.0 + math.exp(1.702 * math.abs(t))))) }
      .sortBy { case (et, _, p) => (p, et) }
      .zipWithIndex
      .map { case ((et, t, p), i) =>
        (et, t, p, (i + 1).toLong, r6((i + 1).toDouble * 0.1 / m.toDouble))
      }
    val kMax = ranked.collect { case (_, _, p, rk, crit) if p <= crit => rk }
      .foldLeft(0L)(math.max)
    val ref = ranked.map { case (et, t, p, rk, crit) =>
      (et, t, p, rk, crit, if (rk <= kMax) 1 else 0)
    }
    assert(got.toSeq === ref)
    // p-values are honest probabilities and monotone in rank
    assert(ref.forall(r => r._3 > 0.0 && r._3 <= 1.0))
    assert(ref.map(_._3) === ref.map(_._3).sorted)
  }

  test("ops_kruskal_wallis: midranks, H, and tie correction replay driver-side") {
    val got = StatOps.kruskalWallis(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(got.nonEmpty)
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("event_type", "CAST(round(value * 1000000) AS BIGINT) AS vm")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = ev.length
    // midrank in halves: 2*midrank = 2*min_rank + (ties - 1)
    val byVm = ev.map(_._2).groupBy(identity).view.mapValues(_.length).toMap
    val minRank = {
      val sorted = ev.map(_._2).sorted
      sorted.distinct.map(v => v -> (sorted.indexWhere(_ == v) + 1).toLong).toMap
    }
    val r2 = ev.map { case (g, v) => (g, 2L * minRank(v) + byVm(v) - 1L) }
    val groups = r2.groupBy(_._1).map { case (g, xs) =>
      (g, xs.length.toLong, xs.map(_._2).sum)
    }.toSeq.sortBy(_._1)
    val tie3 = byVm.values.map(t => t.toLong * t * t - t).sum
    val ssd = decSum12(groups.map { case (_, ni, s2) =>
      s2.toDouble * s2.toDouble / ni.toDouble
    })
    val h = 3.0 * ssd / (n.toLong * (n + 1L)).toDouble - 3.0 * (n + 1L).toDouble
    val c = 1.0 - tie3.toDouble / (n.toLong * n * n - n).toDouble
    val ref = groups.map { case (g, ni, s2) =>
      (g, ni, s2, r6(s2.toDouble / (2.0 * ni.toDouble)), r6(h), r6(c), r6(h / c))
    }
    got.zip(ref).foreach { case (a, b) =>
      assert(a._1 === b._1); assert(a._2 === b._2); assert(a._3 === b._3)
      assert(math.abs(a._4 - b._4) <= 1e-9, s"mean_rank ${a._1}")
      assert(math.abs(a._5 - b._5) <= 1e-9, s"h_stat")
      assert(math.abs(a._6 - b._6) <= 1e-9, s"tie_c")
      assert(math.abs(a._7 - b._7) <= 1e-9, s"h_adj")
    }
    // H is nonnegative and the tie correction is a (0,1] shrinker
    assert(got.head._5 >= 0.0 && got.head._6 > 0.0 && got.head._6 <= 1.0)
  }

  test("ops_bootstrap_poisson: hash draws, weights, and SE replay driver-side") {
    val got = StatOps.bootstrapPoisson(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(got.nonEmpty)
    val hexCdf = Seq("5e2d58d8", "bc5ab1b1", "eb715e1d", "fb239797",
      "ff1025f5", "ffd90f3b")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("o_orderpriority", "o_orderkey",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val bootR = 25
    val ref = orders.groupBy(_._1).map { case (pri, os) =>
      val means = (1 to bootR).map { r =>
        var sw = 0L; var swc = 0L
        os.foreach { case (_, key, cents) =>
          val u8 = bootU8(key, r)
          val w = hexCdf.indexWhere(u8 < _) match {
            case -1 => 6L
            case k => k.toLong
          }
          sw += w; swc += w * cents
        }
        swc.toDouble / sw.toDouble
      }
      val mbar = decSum12(means) / bootR.toDouble
      val sdev2 = decSum12(means.map(x => (x - mbar) * (x - mbar)))
      val n = os.length.toLong
      val sc = os.map(_._3).sum
      (pri, n, r6(sc.toDouble / n.toDouble / 100.0), r6(mbar / 100.0),
        r6(math.sqrt(sdev2 / (bootR - 1).toDouble) / 100.0),
        r6(means.min / 100.0), r6(means.max / 100.0))
    }.toSeq.sortBy(_._1)
    got.zip(ref).foreach { case (a, b) =>
      assert(a._1 === b._1); assert(a._2 === b._2)
      assert(math.abs(a._3 - b._3) <= 1e-9, s"mean_price ${a._1}")
      assert(math.abs(a._4 - b._4) <= 1e-9, s"boot_mean ${a._1}")
      assert(math.abs(a._5 - b._5) <= 1e-9, s"boot_se ${a._1}")
      assert(math.abs(a._6 - b._6) <= 1e-9, s"boot_lo ${a._1}")
      assert(math.abs(a._7 - b._7) <= 1e-9, s"boot_hi ${a._1}")
    }
    // the bootstrap mean tracks the sample mean (they estimate the same
    // thing) and the envelope brackets it
    got.foreach { r =>
      assert(math.abs(r._4 - r._3) < 5 * r._5 + 1e-6, s"boot mean far: $r")
      assert(r._6 <= r._4 && r._4 <= r._7, s"envelope: $r")
    }
  }

  test("ops_auc_roc: midrank U statistic replays a driver-side pair count") {
    val got = StatOps.aucRoc(spark, dir).collect().head
    val users = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("user_id", "event_type",
        "CAST(get_json_object(props, '$.k') AS INT) AS k")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1 else r.getInt(2)))
      .groupBy(_._1).toSeq.map { case (_, es) =>
        (es.length.toLong,
          if (es.exists(e => e._2 == "purchase" && e._3 >= 95)) 1L else 0L)
      }
    val nPos = users.count(_._2 == 1L).toLong
    val nNeg = users.size - nPos
    // AUC by definition: P(score_pos > score_neg) + 0.5 P(tie), exact
    // pair count over the (pos, neg) grid — independent of any ranking
    val pos = users.filter(_._2 == 1L).map(_._1)
    val neg = users.filter(_._2 == 0L).map(_._1)
    var wins2 = 0L
    for (p <- pos; q <- neg)
      wins2 += (if (p > q) 2L else if (p == q) 1L else 0L)
    assert(got.getLong(0) === users.size.toLong)
    assert(got.getLong(1) === nPos)
    assert(got.getLong(2) === nNeg)
    val auc = wins2.toDouble / (2.0 * (nPos * nNeg).toDouble)
    assert(math.abs(got.getDouble(3) - r6(auc)) <= 1e-9, "auc")
    assert(math.abs(got.getDouble(4) - r6(2.0 * auc - 1.0)) <= 2e-6, "gini")
    // score is genuinely informative on this fixture
    assert(got.getDouble(3) > 0.5)
  }

  test("ops_calibration_ece: integer binning and ECE replay driver-side") {
    val got = StatOps.calibrationEce(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(got.nonEmpty)
    val users = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("user_id", "event_type",
        "CAST(get_json_object(props, '$.k') AS INT) AS k")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1 else r.getInt(2)))
      .groupBy(_._1).toSeq.map { case (_, es) =>
        (es.length.toLong,
          if (es.exists(e => e._2 == "purchase" && e._3 >= 95)) 1L else 0L)
      }
    val n = users.size.toLong
    val bins = users.groupBy { case (cnt, _) => (10 * cnt) / (cnt + 10) }
      .map { case (b, us) =>
        val conf = decSum12(us.map { case (cnt, _) =>
          cnt.toDouble / (cnt + 10).toDouble }) / us.size
        val obs = us.count(_._2 == 1L).toDouble / us.size
        (b, us.size.toLong, us.count(_._2 == 1L).toLong, conf, obs)
      }.toSeq.sortBy(_._1)
    val ece = decSum12(bins.map { case (_, nb, _, conf, obs) =>
      nb.toDouble * math.abs(obs - conf) }) / n.toDouble
    got.zip(bins).foreach { case (a, (b, nb, np, conf, obs)) =>
      assert(a._1 === b, "bin"); assert(a._2 === nb); assert(a._3 === np)
      assert(math.abs(a._4 - r6(conf)) <= 1e-9, s"conf bin $b")
      assert(math.abs(a._5 - r6(obs)) <= 1e-9, s"obs bin $b")
      assert(math.abs(a._6 - r6(math.abs(obs - conf))) <= 1e-9, s"gap bin $b")
      assert(math.abs(a._7 - r6(ece)) <= 1e-9, s"ece")
    }
    // ECE is a [0,1] mass-weighted gap and the bins partition the users
    assert(got.head._7 >= 0.0 && got.head._7 <= 1.0)
    assert(got.map(_._2).sum === n)
  }

  test("ops_cohens_kappa: contingency and kappa replay driver-side raters") {
    val got = StatOps.cohensKappa(spark, dir).collect().head
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("text", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val cells = docs.map { case (text, nChars) =>
      val toks = text.split(" ", -1)
      val a = if (nChars >= 250) 1 else 0
      val b = if (toks.distinct.length * 2 >= toks.length) 1 else 0
      (a, b)
    }
    val n = cells.length.toLong
    val n11 = cells.count(c => c._1 == 1 && c._2 == 1).toLong
    val n10 = cells.count(c => c._1 == 1 && c._2 == 0).toLong
    val n01 = cells.count(c => c._1 == 0 && c._2 == 1).toLong
    val n00 = cells.count(c => c._1 == 0 && c._2 == 0).toLong
    val x = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    assert(got.getLong(0) === n); assert(got.getLong(1) === n11)
    assert(got.getLong(2) === n10); assert(got.getLong(3) === n01)
    assert(got.getLong(4) === n00)
    assert(got.getDouble(5) === r6((n11 + n00).toDouble / n))
    assert(got.getDouble(6) === r6(x.toDouble / (n * n).toDouble))
    assert(got.getDouble(7) ===
      r6((n * (n11 + n00) - x).toDouble / (n * n - x).toDouble))
    // kappa is a real agreement statistic: above chance, below perfect
    assert(got.getDouble(7) > -1.0 && got.getDouble(7) < 1.0)
  }

  test("ops_logrank_test: O-E and variance replay a driver-side time walk") {
    val got = StatOps.logrankTest(spark, dir).collect().head
    val censorH = 12L
    val users = graft.Tables.t(spark, dir, "events")
      .selectExpr("user_id", "unix_micros(ts) AS us").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (u, es) =>
        (u, es.map(_._2).min, es.map(_._2).max)
      }.toSeq
    val endUs = users.map(_._3).max
    val hourUs = 3600000000L
    val lives = users.map { case (u, first, last) =>
      (if (u % 2 == 0) "A" else "B", (last - first) / hourUs,
        if (last < endUs - censorH * hourUs) 1L else 0L)
    }
    val ts = lives.map(_._2).distinct.sorted
    var oe = List.empty[Double]; var vv = List.empty[Double]
    var ca = 0L; var cb = 0L
    for (t <- ts) {
      val n1 = lives.count(l => l._1 == "A" && l._2 >= t).toLong
      val n2 = lives.count(l => l._1 == "B" && l._2 >= t).toLong
      val d1 = lives.filter(l => l._1 == "A" && l._2 == t).map(_._3).sum
      val d2 = lives.filter(l => l._1 == "B" && l._2 == t).map(_._3).sum
      val nT = (n1 + n2).toDouble; val dT = (d1 + d2).toDouble
      if (d1 + d2 > 0 && n1 + n2 > 1) {
        ca += d1; cb += d2
        oe ::= d1.toDouble - dT * n1.toDouble / nT
        vv ::= dT * (n1.toDouble / nT) * (n2.toDouble / nT) *
          (nT - dT) / (nT - 1.0)
      }
    }
    val oeS = decSum12(oe); val vS = decSum12(vv)
    assert(got.getLong(0) === ca); assert(got.getLong(1) === cb)
    assert(math.abs(got.getDouble(2) - r6(oeS)) <= 1e-9, "o_minus_e")
    assert(math.abs(got.getDouble(3) - r6(vS)) <= 1e-9, "var")
    assert(math.abs(got.getDouble(4) - r6(oeS * oeS / vS)) <= 1e-6, "chi2")
    // chi2 is nonnegative and the variance positive
    assert(got.getDouble(3) > 0.0 && got.getDouble(4) >= 0.0)
  }

  test("ops_bootstrap_xxhash: production twin agrees with the gated twin's algebra") {
    val md5 = StatOps.bootstrapPoisson(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(4)))
    val xx = StatOps.bootstrapPoissonXx(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(4)))
    // same grid, same n, IDENTICAL full-sample means (only the draw
    // stream differs); SEs estimate the same sampling noise scale
    assert(md5.map(t => (t._1, t._2, t._3)).toSeq ===
      xx.map(t => (t._1, t._2, t._3)).toSeq)
    md5.zip(xx).foreach { case (a, b) =>
      assert(b._4 > 0.0 && a._4 > 0.0)
      assert(b._4 / a._4 < 4.0 && a._4 / b._4 < 4.0,
        s"SE scales diverge: ${a._1} md5=${a._4} xx=${b._4}")
    }
  }

  test("sk_hll_union: register merge and set estimates replay driver-side") {
    val got = graft.queries.Sketches.hllUnion(spark, dir).collect().head
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .selectExpr("l_orderkey", "l_returnflag")
      .filter("l_returnflag IN ('A','R')").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val m = 64
    def regsOf(keys: Set[Long]): Array[Long] = {
      val regs = Array.fill(m)(0L)
      for (key <- keys) {
        val h = md5h60(key.toString)
        val b = (h / 18014398509481984L).toInt
        val w = h % 18014398509481984L
        val rank = if (w == 0) 55L
          else 55L - (64 - java.lang.Long.numberOfLeadingZeros(w))
        if (rank > regs(b)) regs(b) = rank
      }
      regs
    }
    def est(regs: Array[Long]): Double = {
      val sS = regs.map(r => 1L << (55 - r)).sum
      val v = regs.count(_ == 0L)
      val raw = 0.709 * m * m * math.pow(2, 55) / sS.toDouble
      if (raw <= 2.5 * m && v > 0) r6(m.toDouble * math.log(m.toDouble / v))
      else r6(raw)
    }
    val setA = li.filter(_._2 == "A").map(_._1).toSet
    val setB = li.filter(_._2 == "R").map(_._1).toSet
    val (ra, rb) = (regsOf(setA), regsOf(setB))
    val ru = ra.zip(rb).map(p => math.max(p._1, p._2))
    // the union sketch is LOSSLESS: identical to sketching A ∪ B
    assert(ru.toSeq === regsOf(setA union setB).toSeq)
    assert(got.getLong(0) === setA.size.toLong)
    assert(got.getLong(1) === setB.size.toLong)
    assert(got.getLong(2) === (setA union setB).size.toLong)
    assert(got.getLong(3) === (setA intersect setB).size.toLong)
    assert(got.getLong(4) === ra.count(_ == 0L).toLong)
    assert(got.getLong(5) === rb.count(_ == 0L).toLong)
    assert(got.getLong(6) === ru.count(_ == 0L).toLong)
    assert(got.getDouble(7) === est(ra))
    assert(got.getDouble(8) === est(rb))
    assert(got.getDouble(9) === est(ru))
    assert(got.getDouble(10) === r6(est(ra) + est(rb) - est(ru)))
    // inclusion–exclusion lands near the true overlap (wide HLL bars
    // at m = 64: 3 sketches × ~13% rse on this fixture)
    val trueInter = (setA intersect setB).size.toDouble
    assert(math.abs(got.getDouble(10) - trueInter) <
      0.8 * (setA union setB).size, s"inter est ${got.getDouble(10)}")
  }

  test("ops_cmh_test: stratum cells, chi2, and MH odds ratio replay driver-side") {
    val got = StatOps.cmhTest(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7),
        r.getDouble(8), r.getDouble(9)))
    assert(got.nonEmpty)
    val users = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("user_id", "event_type",
        "CAST(get_json_object(props, '$.k') AS INT) AS k")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1 else r.getInt(2)))
      .groupBy(_._1).toSeq.map { case (u, es) =>
        val clicks = es.count(_._2 == "click").toLong
        val conv =
          if (es.exists(e => e._2 == "purchase" && e._3 >= 95)) 1L else 0L
        (math.min(3L, clicks / 5L), if (u % 2 == 0) 1L else 0L, conv)
      }
    val strata = users.groupBy(_._1).toSeq.map { case (st, us) =>
      val nA = us.count(_._2 == 1L).toLong
      val nB = us.size - nA
      val a = us.count(u => u._2 == 1L && u._3 == 1L).toLong
      val c = us.count(u => u._2 == 0L && u._3 == 1L).toLong
      (st, us.size.toLong, nA, nB, a, c)
    }.filter(s => s._2 > 1 && s._3 > 0 && s._4 > 0).sortBy(_._1)
    val terms = strata.map { case (st, n, nA, nB, a, c) =>
      val b = nA - a; val d = nB - c; val m1 = a + c; val m0 = b + d
      val e = nA.toDouble * m1.toDouble / n.toDouble
      val v = nA.toDouble * nB.toDouble * m1.toDouble * m0.toDouble /
        (n.toDouble * n.toDouble * (n.toDouble - 1.0))
      (st, n, nA, nB, a, c, e, v,
        a.toDouble - e, a.toDouble * d.toDouble / n.toDouble,
        b.toDouble * c.toDouble / n.toDouble)
    }
    val sumAe = decSum12(terms.map(_._9))
    val sumV = decSum12(terms.map(_._8))
    val orNum = decSum12(terms.map(_._10))
    val orDen = decSum12(terms.map(_._11))
    got.zip(terms).foreach { case (g, t) =>
      assert(g._1 === t._1); assert(g._2 === t._2); assert(g._3 === t._3)
      assert(g._4 === t._4); assert(g._5 === t._5); assert(g._6 === t._6)
      assert(math.abs(g._7 - r6(t._7)) <= 1e-9, s"e_a stratum ${t._1}")
      assert(math.abs(g._8 - r6(t._8)) <= 1e-9, s"v_i stratum ${t._1}")
      assert(math.abs(g._9 - r6(sumAe * sumAe / sumV)) <= 1e-6, "chi2")
      assert(math.abs(g._10 - r6(orNum / orDen)) <= 1e-6, "or_mh")
    }
    // the test is a real chi-square: nonnegative, OR positive
    assert(got.head._9 >= 0.0 && got.head._10 > 0.0)
  }

  test("ta_kn_bigram: counts, continuation mass, and sum-to-1 replay driver-side") {
    val got = graft.queries.LlmCuration.knBigram(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7)))
    assert(got.length === 30)
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("text").collect().map(_.getString(0))
    val bigrams = texts.flatMap { t =>
      val tk = t.split(" ", -1); tk.dropRight(1).zip(tk.drop(1))
    }
    val cb = bigrams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cw1 = bigrams.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val n1f = cb.keys.toSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n1p = cb.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val b = cb.size.toLong
    val d = 0.75
    def pkn(w1: String, w2: String): Double =
      (cb((w1, w2)).toDouble - d) / cw1(w1).toDouble +
        d * n1f(w1).toDouble / cw1(w1).toDouble *
          (n1p(w2).toDouble / b.toDouble)
    val refTop = cb.toSeq.map { case ((w1, w2), c) => (w1, w2, c) }
      .sortBy { case (w1, w2, c) => (-c, w1, w2) }.take(30)
    got.zip(refTop).foreach { case (g, (w1, w2, c)) =>
      assert((g._1, g._2, g._3) === ((w1, w2, c)))
      assert(g._4 === cw1(w1)); assert(g._5 === n1f(w1))
      assert(g._6 === n1p(w2)); assert(g._7 === b)
      assert(math.abs(g._8 - r6(pkn(w1, w2))) <= 1e-9, s"p_kn $w1 $w2")
    }
    // the KN identity: for a context w1, Σ_observed (c−D)/c(w1·) +
    // λ(w1)·Σ_vocab P_cont = 1 — checked on the top row's context
    val w1 = got.head._1
    val obs = cb.keys.toSeq.filter(_._1 == w1).map { k =>
      (cb(k).toDouble - d) / cw1(w1).toDouble }.sum
    val lam = d * n1f(w1).toDouble / cw1(w1).toDouble
    val contAll = n1p.values.map(_.toDouble / b.toDouble).sum
    assert(math.abs(contAll - 1.0) < 1e-9, "continuation mass")
    assert(math.abs(obs + lam * contAll - 1.0) < 1e-9, s"KN sums to 1 for '$w1'")
  }

  test("st_forecast_eval: RMSE/MAPE/sMAPE replay a driver-side bar walk") {
    val got = graft.queries.StreamingGates.forecastEval(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.nonEmpty)
    val bars = graft.Tables.t(spark, dir, "events")
      .selectExpr("event_type", "date_trunc('hour', ts) AS hour", "value")
      .collect().map(r => ((r.getString(0), r.getTimestamp(1)), r.getDouble(2)))
      .groupBy(_._1).map { case (k, vs) =>
        val s = vs.map(v => BigDecimal(v._2).setScale(12,
          BigDecimal.RoundingMode.HALF_UP)).sum
        k -> r6(s.toDouble / vs.size)
      }
    val hourMs = 3600000L
    val ref = bars.keys.toSeq.groupBy(_._1).toSeq.map { case (typ, ks) =>
      val pairs = ks.flatMap { case (_, h) =>
        bars.get((typ, new java.sql.Timestamp(h.getTime - 24 * hourMs)))
          .map(fc => (bars((typ, h)), fc))
      }
      val n = pairs.size
      val sse = decSum12(pairs.map { case (bb, fc) => (bb - fc) * (bb - fc) })
      val nz = pairs.filter { case (bb, _) => math.abs(bb) > 0.0 }
      val sape = decSum12(nz.map { case (bb, fc) =>
        math.abs(bb - fc) / math.abs(bb) })
      val ssm = decSum12(pairs.map { case (bb, fc) =>
        if (math.abs(bb) + math.abs(fc) > 0.0)
          2.0 * math.abs(bb - fc) / (math.abs(bb) + math.abs(fc))
        else 0.0 })
      (typ, n.toLong, nz.size.toLong, r6(math.sqrt(sse / n)),
        r6(sape / nz.size), r6(ssm / n))
    }.sortBy(_._1)
    got.zip(ref).foreach { case (a, b) =>
      assert(a._1 === b._1); assert(a._2 === b._2); assert(a._3 === b._3)
      assert(math.abs(a._4 - b._4) <= 1e-9, s"rmse ${a._1}")
      assert(math.abs(a._5 - b._5) <= 1e-9, s"mape ${a._1}")
      assert(math.abs(a._6 - b._6) <= 1e-9, s"smape ${a._1}")
    }
    // sMAPE is bounded [0, 2] by construction; RMSE ≥ MAE-like floors
    got.foreach { r => assert(r._6 >= 0.0 && r._6 <= 2.0) }
  }

  test("st_shapley_attrib: exact Shapley values replay a permutation-definition pass") {
    val got = graft.queries.StreamingGates.shapleyAttrib(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    assert(got.length === 4)
    val chans = Seq("view" -> 1L, "click" -> 2L, "signup" -> 4L, "error" -> 8L)
    val users = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("user_id", "event_type",
        "CAST(get_json_object(props, '$.k') AS INT) AS k")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1 else r.getInt(2)))
      .groupBy(_._1).toSeq.map { case (_, es) =>
        val mask = chans.collect {
          case (n, b) if es.exists(_._2 == n) => b }.sum
        val conv =
          if (es.exists(e => e._2 == "purchase" && e._3 >= 95)) 1L else 0L
        (mask, conv)
      }
    def v(coal: Long): Long =
      users.collect { case (m, c) if (m & coal) == m => c }.sum
    // Shapley by the PERMUTATION definition (average marginal
    // contribution over all 4! channel orderings) — independent of the
    // engine's factorial-weighted subset sum
    val perms = chans.map(_._2).permutations.toSeq
    val refPhi = chans.map { case (name, bit) =>
      val contribs = perms.map { p =>
        val before = p.takeWhile(_ != bit).sum
        (v(before | bit) - v(before)).toDouble
      }
      name -> contribs.sum / perms.size
    }.toMap
    got.foreach { case (name, phi, vFull, vEmpty) =>
      assert(math.abs(phi - r6(refPhi(name))) <= 1e-9, s"phi $name")
      assert(vFull === v(15L)); assert(vEmpty === v(0L))
    }
    // efficiency axiom: Σφ = v(full) − v(∅)
    val sumPhi = got.map(_._2).sum
    assert(math.abs(sumPhi - (v(15L) - v(0L)).toDouble) < 1e-4,
      s"efficiency: $sumPhi vs ${v(15L) - v(0L)}")
  }

  test("ops_theil_index: per-segment entropy terms replay driver-side") {
    val got = StatOps.theilIndex(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    val spend = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("o_custkey", "CAST(round(o_totalprice * 100) AS BIGINT) AS c")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).toSeq.map { case (k, cs) => (k, cs.map(_._2).sum) }
    val segOf = spark.read.parquet(s"$dir/customer.parquet")
      .selectExpr("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val ref = spend.flatMap { case (k, c) => segOf.get(k).map(s => (s, c)) }
      .groupBy(_._1).toSeq.map { case (seg, xs) =>
        val n = xs.size.toLong
        val tot = xs.map(_._2).sum
        val theil = decSum12(xs.map { case (_, x) =>
          (x.toDouble / tot.toDouble) *
            math.log(n.toDouble * x.toDouble / tot.toDouble) })
        (seg, n, tot, theil)
      }.sortBy(_._1)
    got.zip(ref).foreach { case (a, b) =>
      assert(a._1 === b._1); assert(a._2 === b._2); assert(a._3 === b._3)
      assert(math.abs(a._4 - r6(b._4)) <= 1e-9, s"theil ${a._1}")
    }
    // Theil is nonnegative and below its ln N ceiling
    got.foreach { r =>
      assert(r._4 >= 0.0 && r._4 <= math.log(r._2.toDouble), r) }
  }

  test("ops_capture_recapture: sample overlap and estimators replay driver-side") {
    val got = StatOps.captureRecapture(spark, dir).collect().head
    val keys = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("o_orderkey").collect().map(_.getLong(0))
    def inS(k: Long, salt: String): Boolean =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"$k$salt".getBytes("UTF-8")).map("%02x".format(_))
        .mkString.take(4) < "4000"
    val n1 = keys.count(inS(_, ":cap1")).toLong
    val n2 = keys.count(inS(_, ":cap2")).toLong
    val m = keys.count(k => inS(k, ":cap1") && inS(k, ":cap2")).toLong
    assert(got.getLong(0) === keys.length.toLong)
    assert(got.getLong(1) === n1); assert(got.getLong(2) === n2)
    assert(got.getLong(3) === m)
    assert(got.getDouble(4) === r6(n1.toDouble * n2.toDouble / m.toDouble))
    assert(got.getDouble(5) ===
      r6((n1 + 1).toDouble * (n2 + 1).toDouble / (m + 1).toDouble - 1.0))
    // Chapman lands near truth: within 5 SEs of the estimator
    val nTrue = keys.length.toDouble
    val se = math.sqrt((n1 + 1).toDouble * (n2 + 1) * (n1 - m) * (n2 - m) /
      ((m + 1).toDouble * (m + 1) * (m + 2)))
    assert(math.abs(got.getDouble(5) - nTrue) < 5 * se,
      s"Chapman ${got.getDouble(5)} vs true $nTrue (se $se)")
  }

  test("cu_pii_scrub: masks and counts replay java.util.regex driver-side") {
    val got = graft.queries.LlmCuration.piiScrub(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .selectExpr("c_custkey", "c_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}".r
    val phone = "[0-9]{3}-[0-9]{3}-[0-9]{4}".r
    val ref = cust.map { case (k, name) =>
      val text = s"contact ${name.toLowerCase.replace('#', '.')}@example.com" +
        f" or call ${k % 900 + 100}%03d-555-${k % 10000}%04d ref #$k"
      val scrubbed = phone.replaceAllIn(
        email.replaceAllIn(text, "[EMAIL]"), "[PHONE]")
      (k, scrubbed, email.findAllIn(text).size.toLong,
        phone.findAllIn(text).size.toLong)
    }
    assert(got.toSeq === ref.toSeq)
    // every row had exactly one email and one phone, and neither survives
    assert(ref.forall(r => r._3 === 1L && r._4 === 1L))
    assert(ref.forall(r => !r._2.contains("@example.com")))
  }

  test("gr_rich_club: phi(k) replays a brute-force subgraph density count") {
    val got = graft.queries.GraphMore.richClub(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    // independent derivation: materialize the undirected edge set and
    // node degrees, then for each k literally take the induced subgraph
    // of nodes with degree > k and count its edges — no histograms, no
    // suffix sums, the textbook definition verbatim
    val sym = graft.queries.Graph.supportEdges(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val deg = sym.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val und = sym.filter { case (a, b) => a < b }.toSet
    val ks = deg.values.toSeq.distinct.sorted
    val ref = ks.flatMap { k =>
      val club = deg.filter(_._2 > k).keySet
      val ec = und.count { case (a, b) => club(a) && club(b) }.toLong
      val n = club.size.toLong
      if (n > 1)
        Some((k, n, ec, r6(2.0 * ec / (n.toDouble * (n - 1)))))
      else None
    }
    assert(got.toSeq.sortBy(_._1) === ref.sortBy(_._1))
    // phi is a density: bounded, and the full-graph row (k < min degree
    // never appears; smallest k is a real degree) stays in [0, 1]
    assert(got.forall(r => r._4 >= 0.0 && r._4 <= 1.0))
  }

  // ------------------------------------------------- tranche C gates

  test("ops_cliffs_delta: brute-force pair counting + the U-statistic identity") {
    val got = graft.queries.StatTests.cliffsDelta(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getString(4))).toSeq
    assert(got.size === 5)
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("event_type", "user_id % 2 = 0 AS isA", "value").collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getDouble(2)))
    for ((t, na, nb, delta, mag) <- got) {
      val as = ev.filter(e => e._1 == t && e._2).map(_._3)
      val bs = ev.filter(e => e._1 == t && !e._2).map(_._3)
      assert(na === as.length.toLong && nb === bs.length.toLong)
      // the textbook definition verbatim: count every (a, b) pair
      var gt = 0L; var lt = 0L
      for (a <- as; b <- bs) { if (a > b) gt += 1 else if (a < b) lt += 1 }
      val num = gt - lt
      val den = na * nb
      assert(delta === r6(num.toDouble / den.toDouble), s"$t delta")
      val expMag =
        if (math.abs(num) * 1000 < den * 147) "negligible"
        else if (math.abs(num) * 1000 < den * 330) "small"
        else if (math.abs(num) * 1000 < den * 474) "medium"
        else "large"
      assert(mag === expMag, s"$t magnitude")
    }
    // cross-derivation: δ = (2·U_A − n_a·n_b)/(n_a·n_b) from the
    // Mann–Whitney gate's exact U — the two gates must agree bitwise
    val u = graft.queries.StatOps.mannWhitney(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    for ((t, na, nb, delta, _) <- got) {
      val (una, unb, ua) = u(t)
      assert(una === na && unb === nb)
      assert(delta === r6((2.0 * ua - na * nb) / (na * nb)), s"$t vs U")
    }
  }

  test("ops_brown_forsythe: textbook deviation-form W replays the identity-form gate") {
    val got = graft.queries.StatTests.brownForsythe(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got.size === 5)
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .selectExpr("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val cents = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("o_custkey", "CAST(round(o_totalprice * 100) AS BIGINT)")
      .collect().map(r => (cust(r.getLong(0)), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toArray).toMap
    def median(a: Array[Long]): Double =
      if (a.length % 2 == 1) a(a.length / 2).toDouble
      else (a(a.length / 2 - 1) + a(a.length / 2)) / 2.0
    // textbook direct-deviation form (the gate uses the Σx²−(Σx)²/n
    // identity on doubled-integer deviations — independent arithmetic)
    val z = cents.map { case (seg, xs) =>
      val m = median(xs); seg -> xs.map(x => math.abs(x - m))
    }
    val zbar = z.map { case (s, v) => s -> v.sum / v.length }
    val grand = z.values.flatten.sum / z.values.map(_.length).sum
    val k = z.size
    val bigN = z.values.map(_.length).sum
    val between = z.map { case (s, v) =>
      v.length * math.pow(zbar(s) - grand, 2) }.sum
    val within = z.map { case (s, v) =>
      v.map(x => math.pow(x - zbar(s), 2)).sum }.sum
    val refW = (bigN - k).toDouble / (k - 1).toDouble * between / within
    for ((seg, n, med, mad, w, df1, df2) <- got) {
      assert(n === cents(seg).length.toLong)
      assert(med === r6(median(cents(seg))), s"$seg median")
      assert(mad === r6(z(seg).sum / z(seg).length), s"$seg mean_absdev")
      assert(math.abs(w - refW) < 6e-7, s"$seg w_stat $w vs $refW")
      assert(df1 === (k - 1).toLong && df2 === (bigN - k).toLong)
    }
  }

  test("ops_friedman: textbook mean-rank chi-square replays the doubled-rank gate") {
    val got = graft.queries.StatTests.friedmanTest(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5), r.getDouble(6))).toSeq
    assert(got.size === 5)
    val cells = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("date_trunc('month', o_orderdate) AS b", "o_orderpriority",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS c").collect()
      .map(r => ((r.get(0).toString, r.getString(1)), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val k = cells.keys.map(_._2).toSet.size
    val full = cells.groupBy(_._1._1).filter(_._2.size == k)
    val b = full.size
    // mean ranks the classroom way: sort the block, average tied spans
    val rankSums = scala.collection.mutable.Map.empty[String, Double]
    for ((_, cell) <- full) {
      val sorted = cell.toSeq.sortBy(_._2)
      val byVal = sorted.zipWithIndex.groupBy(_._1._2)
      for ((_, grp) <- byVal) {
        val mean = grp.map(_._2 + 1).sum.toDouble / grp.size
        for (((key, _), _) <- grp)
          rankSums(key._2) = rankSums.getOrElse(key._2, 0.0) + mean
      }
    }
    val chi2 = 12.0 / (b * k * (k + 1)) *
      rankSums.values.map(r => r * r).sum - 3.0 * b * (k + 1)
    for ((prio, nb, rs2, meanRank, chi, df, w) <- got) {
      assert(nb === b.toLong)
      assert(rs2 === (2 * rankSums(prio)).round, s"$prio rank_sum2")
      assert(meanRank === r6(rankSums(prio) / b), s"$prio mean_rank")
      assert(math.abs(chi - chi2) < 6e-7, s"chi2 $chi vs $chi2")
      assert(df === (k - 1).toLong)
      assert(math.abs(w - chi2 / (b * (k - 1))) < 6e-7, s"kendall_w")
    }
  }

  test("ops_sen_slope: brute-force pairwise-slope median replays the gate") {
    val got = graft.queries.StatTests.senSlope(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got.size === 25)
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .selectExpr("c_custkey", "CAST(c_nationkey AS BIGINT)").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nat = spark.read.parquet(s"$dir/nation.parquet")
      .selectExpr("CAST(n_nationkey AS BIGINT)", "n_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val grid = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("o_custkey",
        "CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS mi",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS c").collect()
      .map(r => ((nat(cust(r.getLong(0))), r.getLong(1)), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .groupBy(_._1._1).view
      .mapValues(_.map { case ((_, mi), rev) => (mi, rev) }.sortBy(_._1))
      .toMap
    for ((name, nMonths, nPairs, sen) <- got) {
      val pts = grid(name)
      assert(nMonths === pts.size.toLong)
      val slopes = (for {
        i <- pts.indices; j <- (i + 1) until pts.size
      } yield (pts(j)._2 - pts(i)._2).toDouble /
        (pts(j)._1 - pts(i)._1).toDouble).sorted
      assert(nPairs === slopes.size.toLong)
      val m = if (slopes.size % 2 == 1) slopes(slopes.size / 2)
        else (slopes(slopes.size / 2 - 1) + slopes(slopes.size / 2)) / 2.0
      assert(math.abs(sen - m) <= 1e-6 + math.abs(m) * 1e-9,
        s"$name sen $sen vs $m")
    }
  }

  test("ops_emd_drift: unit-bin CDF walk replays the gap-weighted gate exactly") {
    val got = graft.queries.StatTests.emdDrift(spark, dir).collect()
    assert(got.length === 1)
    val r = got(0)
    val (na, nb, nBins, emdB, emdD) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getDouble(3), r.getDouble(4))
    val rows = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("CAST(o_orderdate AS DATE) AS d",
        "CAST(round(o_totalprice * 100) AS BIGINT) DIV 1000000 AS bin")
      .collect().map(x => (x.getDate(0).toLocalDate, x.getLong(1)))
    val d0 = rows.map(_._1).min
    val d1 = rows.map(_._1).max
    val cutoff = d0.plusDays(java.time.temporal.ChronoUnit.DAYS
      .between(d0, d1) / 2)
    val a = rows.filter(_._1.isBefore(cutoff)).map(_._2)
    val b = rows.filterNot(_._1.isBefore(cutoff)).map(_._2)
    assert(na === a.length.toLong && nb === b.length.toLong)
    assert(nBins === rows.map(_._2).distinct.length.toLong)
    // independent derivation: walk EVERY unit bin in the occupied
    // range (the gate instead weights occupied bins by forward gaps)
    var num = BigInt(0); var ca = 0L; var cb = 0L
    for (bin <- rows.map(_._2).min until rows.map(_._2).max) {
      ca += a.count(_ == bin); cb += b.count(_ == bin)
      num += (BigInt(ca) * nb - BigInt(cb) * na).abs
    }
    assert(emdB === r6(num.toDouble / (na.toDouble * nb.toDouble)))
    assert(emdD === r6(num.toDouble / (na.toDouble * nb.toDouble) * 10000.0))
  }

  test("ops_hhi: independently aggregated shares replay HHI, its normalization, and 1/HHI") {
    val got = graft.queries.StatTests.hhiConcentration(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    assert(got.nonEmpty)
    val supp = spark.read.parquet(s"$dir/supplier.parquet")
      .selectExpr("s_suppkey", "CAST(s_nationkey AS BIGINT)").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val natReg = spark.read.parquet(s"$dir/nation.parquet")
      .selectExpr("CAST(n_nationkey AS BIGINT)", "CAST(n_regionkey AS BIGINT)")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val regName = spark.read.parquet(s"$dir/region.parquet")
      .selectExpr("CAST(r_regionkey AS BIGINT)", "r_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rev = spark.read.parquet(s"$dir/lineitem.parquet")
      .selectExpr("l_suppkey",
        "CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)")
      .collect()
      .map(r => ((regName(natReg(supp(r.getLong(0)))), r.getLong(0)),
        BigInt(r.getLong(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .groupBy(_._1._1).view.mapValues(_.map(_._2)).toMap
    for ((region, n, cents, hhi, hhiNorm, eff) <- got) {
      val rs = rev(region)
      assert(n === rs.size.toLong)
      val s = rs.sum; val q = rs.map(x => x * x).sum
      assert(cents === s.toLong)
      assert(hhi === r6(q.toDouble / (s * s).toDouble), s"$region hhi")
      assert(hhiNorm === r6((BigInt(n) * q - s * s).toDouble /
        ((s * s).toDouble * (n - 1).toDouble)), s"$region hhi_norm")
      assert(eff === r6((s * s).toDouble / q.toDouble), s"$region eff")
      // the inequality ladder: 1/n ≤ HHI ≤ 1, eff ≤ n
      assert(hhi >= 1.0 / n - 1e-9 && hhi <= 1.0 + 1e-9)
      assert(eff <= n + 1e-9)
    }
  }

  test("ta_lm_perplexity: driver-side KN scoring replays every document") {
    val got = graft.queries.TextEval.lmPerplexity(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    assert(got.nonEmpty)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
    val bgs = docs.map { case (id, t) =>
      id -> t.dropRight(1).zip(t.drop(1)).toSeq }
    val all = bgs.flatMap(_._2)
    val cb = all.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cw1 = all.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val n1f = cb.keys.toSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n1p = cb.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val bTypes = cb.size.toLong
    def pkn(bg: (String, String)): Double =
      (cb(bg) - 0.75) / cw1(bg._1) +
        0.75 * n1f(bg._1) / cw1(bg._1) * (n1p(bg._2).toDouble / bTypes)
    // the gate's Σ rides DECIMAL(38,12): quantize each ln P to 12 dp
    // (HALF_UP, the Cast semantic) and sum exactly
    val refMap = bgs.filter(_._2.nonEmpty).map { case (id, bs) =>
      val lnsum = bs.map(bg => BigDecimal(math.log(pkn(bg)))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      id -> (bs.size.toLong, lnsum)
    }.toMap
    assert(got.size === refMap.size)
    for ((id, t, avg, ppl) <- got) {
      val (refT, lnsum) = refMap(id)
      assert(t === refT, s"doc $id n_bigrams")
      assert(avg === r6(lnsum / refT), s"doc $id avg_lnp")
      assert(ppl === r6(math.exp(-lnsum / refT)), s"doc $id perplexity")
      assert(ppl >= 1.0 - 1e-9)
    }
  }

  test("ta_ndcg_eval: a from-scratch IR-metrics replay agrees on every query") {
    val got = graft.queries.TextEval.ndcgEval(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7),
        r.getDouble(8), r.getDouble(9))).toSeq
    assert(got.size === 5)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ", -1)))
    val tf = docs.flatMap { case (id, src, toks) =>
      toks.groupBy(identity).map { case (w, g) => (w, id, src, g.length.toLong) }
    }
    val dfm = tf.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val queries = dfm.toSeq.sortBy { case (w, d) => (-d, w) }.take(5)
    val srcTot = docs.flatMap(d => d._3.map(_ => d._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nRelBySrc = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    def dec12(x: Double): BigDecimal =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    for ((w, dfGot, nRel, nRet, p10, mrr, dcg, idcg, ndcg, ap) <- got) {
      assert(dfGot === dfm(w), s"$w df")
      val target = docs.flatMap(d => d._3.filter(_ == w).map(_ => d._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toSeq
        .map { case (src, ct) => (src, ct.toDouble / srcTot(src)) }
        .sortBy { case (src, rt) => (-rt, src) }.head._1
      assert(nRel === nRelBySrc(target), s"$w n_relevant")
      val retrieved = tf.filter(_._1 == w)
        .sortBy { case (_, id, _, t) => (-t, id) }.take(20)
      assert(nRet === retrieved.size.toLong)
      val rels = retrieved.map { case (_, _, src, _) =>
        if (src == target) 1L else 0L }
      assert(p10 === r6(rels.take(10).sum / 10.0), s"$w p@10")
      val firstRel = rels.indexWhere(_ == 1L)
      assert(mrr === r6(if (firstRel < 0) 0.0 else 1.0 / (firstRel + 1)),
        s"$w mrr")
      val refDcg = rels.take(10).zipWithIndex.collect {
        case (1L, i) => dec12(1.0 / math.log(i + 2.0)) }.sum.toDouble
      assert(dcg === r6(refDcg), s"$w dcg")
      val refIdcg = (1 to math.min(nRel, 10L).toInt)
        .map(p => dec12(1.0 / math.log(p + 1.0))).sum.toDouble
      assert(idcg === r6(refIdcg), s"$w idcg")
      assert(ndcg === r6(refDcg / refIdcg), s"$w ndcg")
      var relcum = 0L
      val apTerms = rels.zipWithIndex.collect { case (1L, i) =>
        relcum += 1; dec12(relcum.toDouble / (i + 1)) }
      val refAp = apTerms.sum.toDouble / math.min(nRel, 20L)
      assert(ap === r6(refAp), s"$w ap@20")
      assert(ndcg >= -1e-9 && ndcg <= 1.0 + 1e-9)
    }
  }

  test("ops_hill_tail: sorted order statistics replay the Hill curve") {
    val got = graft.queries.StatTests.hillTail(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    assert(got.nonEmpty)
    val cents = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("CAST(round(o_totalprice * 100) AS BIGINT)").collect()
      .map(_.getLong(0)).sorted(Ordering[Long].reverse)
    def dec12(x: Double): BigDecimal =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    for ((k, thr, alpha, tail) <- got) {
      val xk1 = cents(k.toInt) // 0-indexed: the (k+1)-th largest
      assert(thr === r6(xk1.toDouble / 100.0), s"k=$k threshold")
      val lnsum = cents.take(k.toInt)
        .map(x => dec12(math.log(x.toDouble / xk1.toDouble))).sum.toDouble
      assert(alpha === r6(k.toDouble / lnsum), s"k=$k alpha")
      assert(tail === r6(lnsum / k.toDouble), s"k=$k tail_index")
      assert(alpha > 0)
    }
  }

  test("ops_page_trend: textbook ordered-rank L and z replay the doubled-rank gate") {
    val got = graft.queries.StatTests.pageTrend(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got.size === 5)
    val cells = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("date_trunc('month', o_orderdate) AS b", "o_orderpriority",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS c").collect()
      .map(r => ((r.get(0).toString, r.getString(1)), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val k = cells.keys.map(_._2).toSet.size
    val full = cells.groupBy(_._1._1).filter(_._2.size == k)
    val b = full.size
    val rankSums = scala.collection.mutable.Map.empty[String, Double]
    for ((_, cell) <- full) {
      val sorted = cell.toSeq.sortBy(_._2)
      val byVal = sorted.zipWithIndex.groupBy(_._1._2)
      for ((_, grp) <- byVal) {
        val mean = grp.map(_._2 + 1).sum.toDouble / grp.size
        for (((key, _), _) <- grp)
          rankSums(key._2) = rankSums.getOrElse(key._2, 0.0) + mean
      }
    }
    val l = rankSums.map { case (trt, rs) => trt.take(1).toLong * rs }.sum
    val e = b.toDouble * k * (k + 1) * (k + 1) / 4.0
    val sd = k * (k + 1) * math.sqrt(b.toDouble * (k - 1)) / 12.0
    val refZ = (l - e) / sd
    for ((prio, j, nb, meanRank, l2, z) <- got) {
      assert(j === prio.take(1).toLong)
      assert(nb === b.toLong)
      assert(meanRank === r6(rankSums(prio) / b), s"$prio mean_rank")
      assert(math.abs(z - refZ) < 6e-7, s"z $z vs $refZ")
    }
    // the doubled carry is exact: Σⱼ j·R2ⱼ = 2L
    assert(got.head._5 === (2 * l).round)
  }

  test("ops_cohens_d: direct-deviation moments replay the identity-form gate") {
    val got = graft.queries.StatTests.cohensD(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toSeq
    assert(got.size === 5)
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("event_type", "user_id % 2 = 0 AS isA",
        "CAST(round(value * 100) AS BIGINT)").collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getLong(2)))
    for ((t, na, nb, md, sp, d, g) <- got) {
      val as = ev.filter(e => e._1 == t && e._2).map(_._3.toDouble)
      val bs = ev.filter(e => e._1 == t && !e._2).map(_._3.toDouble)
      assert(na === as.length.toLong && nb === bs.length.toLong)
      val ma = as.sum / as.length; val mb = bs.sum / bs.length
      val ssa = as.map(x => (x - ma) * (x - ma)).sum
      val ssb = bs.map(x => (x - mb) * (x - mb)).sum
      val refSp = math.sqrt((ssa + ssb) / (na + nb - 2))
      val refD = (ma - mb) / refSp
      assert(math.abs(md - (ma - mb) / 100.0) < 6e-7, s"$t mean_diff")
      assert(math.abs(sp - refSp / 100.0) < 6e-7, s"$t pooled_sd")
      assert(math.abs(d - refD) < 6e-7, s"$t cohens_d")
      assert(math.abs(g - refD * (1.0 - 3.0 / (4.0 * (na + nb) - 9.0)))
        < 6e-7, s"$t hedges_g")
    }
  }

  test("ta_good_turing: frequency-of-frequencies and Turing counts replay exactly") {
    val got = graft.queries.TextEval.goodTuring(spark, dir).collect()
    assert(got.nonEmpty)
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("text").collect().flatMap(_.getString(0).split(" ", -1))
    val counts = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val fof = counts.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val nTokens = toks.length.toLong
    val vTypes = counts.size.toLong
    // the mass identity Σ r·N_r = N pins the whole table
    assert(fof.map { case (r, n) => r * n }.sum === nTokens)
    assert(got.length === fof.size)
    for (row <- got) {
      val r = row.getLong(0)
      assert(row.getLong(1) === fof(r), s"r=$r n_r")
      assert(row.getLong(3) === nTokens && row.getLong(4) === vTypes)
      fof.get(r + 1) match {
        case Some(n1) =>
          assert(row.getLong(2) === n1, s"r=$r n_r1")
          assert(row.getDouble(5) ===
            r6((r + 1).toDouble * n1 / fof(r)), s"r=$r r_star")
          assert(row.getDouble(6) ===
            r6(n1.toDouble * (r + 1) / nTokens), s"r=$r class_mass")
        case None =>
          assert(row.isNullAt(2) && row.isNullAt(5) && row.isNullAt(6),
            s"r=$r null tail")
      }
      assert(row.getDouble(7) ===
        r6(if (r == 1) fof(1).toDouble / nTokens else 0.0), s"r=$r p0")
    }
  }

  test("gr_degree_gini: sorted-rank Gini and histogram entropy replay exactly") {
    val got = graft.queries.GraphMore.degreeGini(spark, dir).collect()
    assert(got.length === 1)
    val r = got(0)
    val deg = graft.queries.Graph.supportEdges(spark, dir).collect()
      .map(x => (x.getLong(0), x.getLong(1)))
      .groupBy(_._1).view.mapValues(_.length.toLong).toSeq
      .map { case (node, d) => (d, node) }.sorted
    val n = deg.size.toLong
    val sd = deg.map(x => BigInt(x._1)).sum
    val sid = deg.zipWithIndex.map { case ((d, _), i) =>
      BigInt(i + 1) * d }.sum
    assert(r.getLong(0) === n && r.getLong(1) === sd.toLong)
    assert(r.getLong(2) === deg.map(_._1).max)
    assert(r.getDouble(3) === r6(sd.toDouble / n))
    assert(r.getDouble(4) ===
      r6((2 * sid - (n + 1) * sd).toDouble / (BigInt(n) * sd).toDouble))
    val hist = deg.map(_._1).groupBy(identity).view.mapValues(_.size).toMap
    val h = hist.values.map { nk =>
      BigDecimal(-(nk.toDouble / n) * math.log(nk.toDouble / n))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP) }.sum.toDouble
    assert(r.getDouble(5) === r6(h))
    // hub inequality is a Gini: 0 ≤ G < 1, entropy ≥ 0
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) < 1.0)
    assert(r.getDouble(5) >= 0.0)
  }

  test("ops_seasonal_mk: brute-force per-season sign pairs replay S, Var, and Z") {
    val got = graft.queries.StatTests.seasonalMk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got.nonEmpty)
    val grid = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("CAST(month(o_orderdate) AS BIGINT)",
        "CAST(year(o_orderdate) AS BIGINT)",
        "CAST(round(o_totalprice * 100) AS BIGINT)").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .groupBy(_._1._1).view
      .mapValues(_.map { case ((_, y), rev) => (y, rev) }.sortBy(_._1))
      .toMap
    var sTot = 0L; var v18Tot = 0L
    val ref = grid.view.mapValues { pts =>
      var sg = 0L
      for (i <- pts.indices; j <- (i + 1) until pts.size)
        sg += java.lang.Long.signum(pts(j)._2 - pts(i)._2).toLong
      val nY = pts.size.toLong
      val tcorr = pts.map(_._2).groupBy(identity).values
        .map(g => { val t = g.size.toLong; t * (t - 1) * (2 * t + 5) }).sum
      (nY, sg, nY * (nY - 1) * (2 * nY + 5) - tcorr)
    }.toMap
    for ((_, (nY, sg, v18)) <- ref if nY > 1) { sTot += sg; v18Tot += v18 }
    val refZ =
      if (sTot > 0) (sTot - 1).toDouble / math.sqrt(v18Tot / 18.0)
      else if (sTot < 0) (sTot + 1).toDouble / math.sqrt(v18Tot / 18.0)
      else 0.0
    for ((g, nY, sg, v18, st, z) <- got) {
      val (refNy, refSg, refV18) = ref(g)
      assert(nY === refNy && sg === refSg && v18 === refV18, s"season $g")
      assert(st === sTot)
      assert(math.abs(z - refZ) < 6e-7, s"z $z vs $refZ")
    }
  }

  test("ops_anova_f: textbook direct-deviation F replays the identity-form gate") {
    val got = graft.queries.StatTests.anovaF(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7))).toSeq
    assert(got.size === 5)
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .selectExpr("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val groups = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("o_custkey", "CAST(round(o_totalprice * 100) AS BIGINT)")
      .collect().map(r => (cust(r.getLong(0)), r.getLong(1).toDouble))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val k = groups.size
    val n = groups.values.map(_.length).sum
    val grand = groups.values.flatten.sum / n
    val ssb = groups.values.map { v =>
      val m = v.sum / v.length; v.length * (m - grand) * (m - grand) }.sum
    val ssw = groups.values.map { v =>
      val m = v.sum / v.length; v.map(x => (x - m) * (x - m)).sum }.sum
    val refF = ssb / (k - 1) / (ssw / (n - k))
    val refEta = ssb / (ssb + ssw)
    val msw = ssw / (n - k)
    val refOmega = (ssb - (k - 1) * msw) / (ssb + ssw + msw)
    for ((seg, ng, mean, f, df1, df2, eta2, omega2) <- got) {
      val v = groups(seg)
      assert(ng === v.length.toLong)
      assert(math.abs(mean - v.sum / v.length / 100.0) < 6e-7, s"$seg mean")
      assert(math.abs(f - refF) < 6e-7, s"f $f vs $refF")
      assert(df1 === (k - 1).toLong && df2 === (n - k).toLong)
      assert(math.abs(eta2 - refEta) < 6e-7)
      assert(math.abs(omega2 - refOmega) < 6e-7)
    }
    // consistency with the Brown-Forsythe gate's frame: same groups
    val bf = graft.queries.StatTests.brownForsythe(spark, dir).collect()
    assert(bf.map(_.getLong(1)).sorted.toSeq ===
      got.map(_._2).sorted.toSeq)
  }

  test("ops_odds_ratio: a brute-force 2x2 replay agrees on every readout") {
    val got = graft.queries.StatTests.oddsRatio(spark, dir).collect()
    assert(got.length === 1)
    val r = got(0)
    val conv = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("user_id", "event_type",
        "TRY_CAST(get_json_object(props, '$.k') AS INT) AS kv").collect()
      .map(x => (x.getLong(0), x.getString(1),
        if (x.isNullAt(2)) -1 else x.getInt(2)))
      .groupBy(_._1).view.mapValues(evs =>
        evs.exists(e => e._2 == "purchase" && e._3 >= 95)).toMap
    val a = conv.count { case (u, c) => u % 2 == 0 && c }.toLong
    val b = conv.count { case (u, c) => u % 2 == 0 && !c }.toLong
    val c = conv.count { case (u, cv) => u % 2 != 0 && cv }.toLong
    val d = conv.count { case (u, cv) => u % 2 != 0 && !cv }.toLong
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((a, b, c, d)))
    val or = a.toDouble * d / (b.toDouble * c)
    val se = math.sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)
    assert(r.getDouble(4) === r6(or))
    assert(r.getDouble(5) === r6(math.log(or)))
    assert(r.getDouble(6) === r6(se))
    assert(math.abs(r.getDouble(7) - math.exp(math.log(or) - 1.96 * se))
      < 6e-7)
    assert(math.abs(r.getDouble(8) - math.exp(math.log(or) + 1.96 * se))
      < 6e-7)
    assert(r.getDouble(9) ===
      r6((a.toDouble / (a + b)) / (c.toDouble / (c + d))))
    // the CI straddles the point estimate
    assert(r.getDouble(7) <= r.getDouble(4) && r.getDouble(4) <= r.getDouble(8))
  }

  test("ta_cli_ari: per-document character counts replay both indices") {
    val got = graft.queries.TextScores.cliAri(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    assert(got.nonEmpty)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // exact HALF_UP of the defining rationals — the gate's integer
    // rounding must agree with BigDecimal exact division everywhere,
    // including the power-of-two half-boundary docs (e.g. w = 64)
    def r6ratRef(num: Long, w: Long): Double =
      (BigDecimal(num) / BigDecimal(100 * w))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for ((id, nw, nc, ns, cli, ari) <- got) {
      val toks = docs(id).split(" ", -1)
      val chars = toks.map(_.length).sum.toLong
      assert(nw === toks.length.toLong && nc === chars && ns === 1L)
      val w = toks.length.toLong
      assert(cli === r6ratRef(588 * chars - 1580 * w - 2960, w),
        s"doc $id cli")
      assert(ari === r6ratRef(471 * chars + 50 * w * w - 2143 * w, w),
        s"doc $id ari")
      // the textbook double form agrees to within a rounding cell
      assert(math.abs(ari - (4.71 * (chars.toDouble / w) + 0.5 * w -
        21.43)) < 1e-6 + 1e-9, s"doc $id ari vs double form")
    }
  }

  test("ops_tukey_hsd: textbook pairwise replay from raw group values") {
    val got = graft.queries.StatTests.tukeyHsd(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7),
        r.getDouble(8), r.getLong(9))).toSeq
    assert(got.size === 10) // C(5,2) segment pairs
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .selectExpr("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val groups = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("o_custkey", "CAST(round(o_totalprice * 100) AS BIGINT)")
      .collect().map(r => (cust(r.getLong(0)), r.getLong(1).toDouble))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val k = groups.size
    val n = groups.values.map(_.length).sum
    val ssw = groups.values.map { v =>
      val m = v.sum / v.length; v.map(x => (x - m) * (x - m)).sum }.sum
    val msw = ssw / (n - k)
    for ((sa, sb, na, nb, ma, mb, diff, se, q, dfw) <- got) {
      assert(sa < sb)
      val va = groups(sa); val vb = groups(sb)
      assert(na === va.length.toLong && nb === vb.length.toLong)
      val meanA = va.sum / va.length / 100.0
      val meanB = vb.sum / vb.length / 100.0
      assert(math.abs(ma - meanA) < 6e-7, s"$sa mean")
      assert(math.abs(mb - meanB) < 6e-7, s"$sb mean")
      assert(math.abs(diff - (meanA - meanB)) < 6e-7, s"$sa/$sb diff")
      val seRef = math.sqrt(msw / 2 *
        (1.0 / va.length + 1.0 / vb.length)) / 100.0
      assert(math.abs(se - seRef) < 6e-7, s"$sa/$sb se")
      assert(math.abs(q - math.abs(meanA - meanB) / seRef) < 6e-6,
        s"$sa/$sb q")
      assert(dfw === (n - k).toLong)
    }
    // the ANOVA gate's frame is the licensing omnibus: same df
    val af = graft.queries.StatTests.anovaF(spark, dir).collect()
    assert(af.map(_.getLong(5)).toSet === Set((n - k).toLong))
  }

  test("ops_dunn_test: global-midrank pairwise replay with tie correction") {
    val got = graft.queries.StatTests.dunnTest(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7),
        r.getLong(8), r.getInt(9))).toSeq
    assert(got.size === 10)
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("event_type", "CAST(round(value * 1000000) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val n = ev.size
    val byVal = ev.map(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val rankStart = scala.collection.mutable.Map[Long, Long]()
    var acc = 1L
    for (v <- byVal.keys.toSeq.sorted) { rankStart(v) = acc; acc += byVal(v) }
    def midrank(v: Long): Double = rankStart(v) + (byVal(v) - 1) / 2.0
    val groups = ev.groupBy(_._1).view
      .mapValues(_.map(x => midrank(x._2))).toMap
    val tie3 = byVal.values.map(t => t.toDouble * t * t - t).sum
    val varBase = n.toDouble * (n + 1) / 12.0 - tie3 / (12.0 * (n - 1))
    val kk = groups.size
    for ((ga, gb, na, nb, mra, mrb, z, p, m, rej) <- got) {
      assert(ga < gb)
      val va = groups(ga); val vb = groups(gb)
      assert(na === va.size.toLong && nb === vb.size.toLong)
      val ra = va.sum / va.size; val rb = vb.sum / vb.size
      assert(math.abs(mra - ra) < 6e-7, s"$ga mean rank")
      assert(math.abs(mrb - rb) < 6e-7, s"$gb mean rank")
      val zRef = (ra - rb) /
        math.sqrt(varBase * (1.0 / va.size + 1.0 / vb.size))
      assert(math.abs(z - zRef) < 6e-6, s"$ga/$gb z")
      val pRef = 2.0 / (1.0 + math.exp(1.702 * math.abs(zRef)))
      assert(math.abs(p - pRef) < 6e-6, s"$ga/$gb p")
      assert(m === (kk * (kk - 1) / 2).toLong)
      assert(rej === (if (pRef * m < 0.05) 1 else 0), s"$ga/$gb rejected")
    }
    // consistency: Dunn's global midranks ARE ops_kruskal_wallis's
    val kw = StatOps.kruskalWallis(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    for ((ga, gb, _, _, mra, mrb, _, _, _, _) <- got) {
      assert(math.abs(kw(ga) - mra) < 1e-9)
      assert(math.abs(kw(gb) - mrb) < 1e-9)
    }
  }

  test("ops_mcnemar: brute paired before/after replay, exact integer rounding") {
    val got = graft.queries.StatTests.mcnemar(spark, dir).collect()
    assert(got.length === 1)
    val r = got(0)
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("user_id", "event_type",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS us",
        "TRY_CAST(get_json_object(props, '$.k') AS INT) AS kv").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2),
        if (x.isNullAt(3)) -1 else x.getInt(3)))
    val mid = (ev.map(_._3).min + ev.map(_._3).max) / 2
    val users = ev.groupBy(_._1).view.mapValues { es =>
      (es.exists(e => e._2 == "purchase" && e._4 >= 95 && e._3 < mid),
        es.exists(e => e._2 == "purchase" && e._4 >= 95 && e._3 >= mid))
    }.toMap
    val b = users.values.count { case (p, q) => p && !q }.toLong
    val c = users.values.count { case (p, q) => !p && q }.toLong
    assert(r.getLong(0) === users.values.count(v => v._1 && v._2).toLong)
    assert(r.getLong(1) === b && r.getLong(2) === c)
    assert(r.getLong(3) === users.values.count(v => !v._1 && !v._2).toLong)
    def r6rat(num: BigInt, den: BigInt): Double =
      (BigDecimal(num) / BigDecimal(den))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // the gate's two-level integer division must equal exact HALF_UP
    assert(r.getDouble(4) ===
      r6rat(BigInt(b - c) * BigInt(b - c), BigInt(b + c)))
    val adj = math.max(math.abs(b - c) - 1, 0L)
    assert(r.getDouble(5) === r6rat(BigInt(adj) * BigInt(adj), BigInt(b + c)))
    assert(r.getLong(6) === 1L)
  }

  test("ops_cochran_q: brute flag replay and the L(k-L) denominator identity") {
    val got = graft.queries.StatTests.cochranQ(spark, dir).collect()
    assert(got.length === 1)
    val r = got(0)
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("user_id", "event_type", "value").collect()
      .map(x => (x.getLong(0), x.getString(1),
        if (x.isNullAt(2)) -1.0 else x.getDouble(2)))
    val users = ev.groupBy(_._1).view.mapValues { es =>
      def f(t: String) = es.exists(e => e._2 == t && e._3 >= 75)
      (f("click"), f("view"), f("purchase"))
    }.toMap.values.toSeq
    val g1 = users.count(_._1).toLong
    val g2 = users.count(_._2).toLong
    val g3 = users.count(_._3).toLong
    val ls = users.map(u => Seq(u._1, u._2, u._3).count(identity).toLong)
    val t = ls.sum; val sl2 = ls.map(l => l * l).sum
    assert(r.getLong(0) === users.size.toLong)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((g1, g2, g3)))
    assert(r.getLong(4) === t && r.getLong(5) === sl2)
    // denominator identity: 3T − ΣL² = Σ L(3−L) ≥ 0, > 0 iff some
    // user's flags VARY across treatments
    assert(3 * t - sl2 === ls.map(l => l * (3 - l)).sum)
    assert(3 * t - sl2 > 0, "flags saturated — Q degenerate, pick a " +
      "different high-value threshold")
    val num = BigInt(2) * Seq(g1, g2, g3)
      .map(g => BigInt(3 * g - t) * BigInt(3 * g - t)).sum
    val den = BigInt(3) * BigInt(3 * t - sl2)
    def r6rat(nn: BigInt, d: BigInt): Double =
      (BigDecimal(nn) / BigDecimal(d))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(6) === r6rat(num, den))
    assert(r.getLong(7) === 2L)
  }

  test("ops_mood_median: brute 2xk table replay against the grand median") {
    val got = graft.queries.StatTests.moodMedian(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6))).toSeq
    assert(got.size === 5)
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .selectExpr("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("o_custkey", "CAST(round(o_totalprice * 100) AS BIGINT)")
      .collect().map(r => (cust(r.getLong(0)), r.getLong(1)))
    val sorted = rows.map(_._2).sorted
    val nAll = sorted.length
    // 2·(exact interpolated median) — the Pctl percentile(.,0.5) device
    val m2 = sorted((nAll - 1) / 2) + sorted(nAll / 2)
    val bySeg = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val his = bySeg.view.mapValues(v => v.count(x => 2 * x > m2).toLong).toMap
    val ns = bySeg.view.mapValues(_.length.toLong).toMap
    val nn = ns.values.sum
    val hiTot = his.values.sum
    val loTot = nn - hiTot
    def part(seg: String): Double = {
      def term(o: Long, t: Long): Double = {
        val num = (BigInt(nn) * o - BigInt(ns(seg)) * t).toDouble
        num * num / (BigInt(nn) * ns(seg) * t).toDouble
      }
      term(his(seg), hiTot) + term(ns(seg) - his(seg), loTot)
    }
    val chi2 = bySeg.keys.map(part).sum
    for ((seg, n, hi, lo, p, c2, df) <- got) {
      assert(n === ns(seg) && hi === his(seg) && lo === n - hi)
      assert(math.abs(p - part(seg)) < 6e-6, s"$seg part")
      assert(math.abs(c2 - chi2) < 6e-6, s"chi2 $c2 vs $chi2")
      assert(df === (bySeg.size - 1).toLong)
    }
  }

  test("ops_bartlett: textbook pooled-ln replay of T and the group SDs") {
    val got = graft.queries.StatTests.bartlett(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5))).toSeq
    assert(got.size === 5)
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .selectExpr("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val groups = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("o_custkey", "CAST(round(o_totalprice * 100) AS BIGINT)")
      .collect().map(r => (cust(r.getLong(0)), r.getLong(1).toDouble))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val k = groups.size
    val n = groups.values.map(_.length).sum
    def variance(v: Seq[Double]): Double = {
      val m = v.sum / v.length
      v.map(x => (x - m) * (x - m)).sum / (v.length - 1)
    }
    val ssw = groups.values.map(v => (v.length - 1) * variance(v)).sum
    val sp2 = ssw / (n - k)
    val sumNlnv = groups.values
      .map(v => (v.length - 1) * math.log(variance(v))).sum
    val sumInv = groups.values.map(v => 1.0 / (v.length - 1)).sum
    val cFac = 1.0 + (sumInv - 1.0 / (n - k)) / (3.0 * (k - 1))
    val tRef = ((n - k) * math.log(sp2) - sumNlnv) / cFac
    for ((seg, ng, sd, t, c, df) <- got) {
      val v = groups(seg)
      assert(ng === v.length.toLong)
      assert(math.abs(sd - math.sqrt(variance(v)) / 100.0) < 6e-6,
        s"$seg sd")
      assert(math.abs(t - tRef) < 6e-6, s"t $t vs $tRef")
      assert(math.abs(c - cFac) < 6e-7)
      assert(df === (k - 1).toLong)
    }
    // Brown-Forsythe (the robust sibling) sees the same group frame
    val bf = graft.queries.StatTests.brownForsythe(spark, dir).collect()
    assert(bf.map(_.getLong(1)).sorted.toSeq === got.map(_._2).sorted.toSeq)
  }

  test("ops_jonckheere: brute O(n^2) pairwise replay of 2JT, 2E, and z") {
    val got = graft.queries.StatTests.jonckheere(spark, dir).collect()
    assert(got.length === 1)
    val r = got(0)
    val rows = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("CAST(substr(o_orderpriority, 1, 1) AS INT) AS g",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS v").collect()
      .map(x => (x.getInt(0), x.getLong(1)))
    val n = rows.length
    // doubled JT by definition: over every cross-group ordered pair,
    // 2 for x<y, 1 for a tie
    var jt2 = 0L
    for (a <- rows; b <- rows if a._1 < b._1) {
      if (a._2 < b._2) jt2 += 2L
      else if (a._2 == b._2) jt2 += 1L
    }
    assert(r.getLong(2) === jt2, s"jt_x2 ${r.getLong(2)} vs $jt2")
    val ns = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap.values
    val e2 = (n.toLong * n - ns.map(x => x * x).sum) / 2
    assert(r.getLong(3) === e2)
    assert(r.getLong(1) === n.toLong)
    val ties = rows.groupBy(_._2).view.mapValues(_.size.toLong)
      .values.toSeq
    def s1(xs: Iterable[Long], f: Long => Double) = xs.map(f).sum
    val aT = n.toDouble * (n - 1) * (2.0 * n + 5) -
      s1(ns, x => x.toDouble * (x - 1) * (2.0 * x + 5)) -
      s1(ties, x => x.toDouble * (x - 1) * (2.0 * x + 5))
    val bT = s1(ns, x => x.toDouble * (x - 1) * (x - 2)) *
      s1(ties, x => x.toDouble * (x - 1) * (x - 2)) /
      (36.0 * n.toDouble * (n - 1) * (n - 2))
    val cT = s1(ns, x => x.toDouble * (x - 1)) *
      s1(ties, x => x.toDouble * (x - 1)) /
      (8.0 * n.toDouble * (n - 1))
    val varJt = aT / 72.0 + bT + cT
    assert(math.abs(r.getDouble(4) - math.sqrt(varJt)) < 6e-6, "sd_jt")
    val zRef = (jt2 - e2).toDouble / (2.0 * math.sqrt(varJt))
    assert(math.abs(r.getDouble(5) - zRef) < 6e-6, s"z ${r.getDouble(5)} vs $zRef")
  }

  test("ta_textrank: exact integer PageRank replay of the word co-occurrence graph") {
    val got = graft.queries.TextScores.textrank(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got.size === 25)
    val stops = Set("the", "a", "of", "and", "in", "to")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("lower(text)").collect().map(_.getString(0))
    val pairCnt = scala.collection.mutable.Map[(String, String), Long]()
      .withDefaultValue(0L)
    for (text <- docs) {
      val t = text.split(" ", -1)
      for (i <- t.indices; k <- 1 to 2 if i + k < t.length) {
        val (a, b) = (t(i), t(i + k))
        if (!stops(a) && !stops(b) && a != b) {
          val key = if (a < b) (a, b) else (b, a)
          pairCnt(key) += 1L
        }
      }
    }
    val adj = scala.collection.mutable.Map[String, List[(String, Long)]]()
      .withDefaultValue(Nil)
    for (((x, y), w) <- pairCnt) {
      adj(x) = (y, w) :: adj(x); adj(y) = (x, w) :: adj(y)
    }
    val strength = adj.view.mapValues(_.map(_._2).sum).toMap
    val degree = adj.view.mapValues(_.size.toLong).toMap
    val n = adj.size
    val scale = 1000000000000L
    val base = (scale * 3L / 20L) / n
    var rank = adj.keys.map(_ -> scale / n).toMap
    for (_ <- 1 to 5) {
      val m = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      for ((src, nbrs) <- adj; (dst, w) <- nbrs)
        m(dst) += rank(src) * w / strength(src)
      rank = adj.keys.map(k => k -> (base + 85L * m(k) / 100L)).toMap
    }
    val top = rank.toSeq.sortBy { case (w, r) => (-r, w) }.take(25)
    assert(got.map(x => (x._1, x._4)) === top)
    for ((w, d, st, _) <- got)
      assert(d === degree(w) && st === strength(w), s"$w degree/strength")
  }

  test("ops_fdr_by: staircase replay and BY-conservative-vs-BH containment") {
    val got = graft.queries.StatTests.fdrBy(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getInt(6))).toSeq
    assert(got.nonEmpty)
    val m = got.size
    val hm = (1 to m).map(i => 1.0 / i).sum
    // ranks are 1..m in p order; crit = rk*alpha/(m*Hm)
    for ((_, p, rk, hmGot, crit, _) <- got) {
      assert(math.abs(hmGot - hm) < 6e-7)
      assert(math.abs(crit - r6(rk * 0.1 / (m * hm))) < 1e-9, s"rk $rk crit")
      assert(p >= 0 && p <= 1)
    }
    val kMax = got.filter(x => x._2 <= x._5).map(_._3).maxOption.getOrElse(0L)
    for ((_, _, rk, _, _, rej) <- got)
      assert(rej === (if (rk <= kMax) 1 else 0))
    // BY controls under dependence by being MORE conservative than BH:
    // its rejection set is a subset, type by type
    val bh = StatOps.fdrBh(spark, dir).collect()
      .map(r => r.getString(0) -> r.getInt(5)).toMap
    for ((t, _, _, _, _, rej) <- got if rej == 1)
      assert(bh(t) === 1, s"BY rejected $t but BH did not")
  }

  test("ops_k_anonymity: brute QI-class recount of k buckets and l-diversity") {
    val got = graft.queries.DataOps.kAnonymity(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got.nonEmpty)
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .selectExpr("CAST(c_nationkey AS BIGINT)", "c_mktsegment",
        "CAST(floor(c_acctbal / 100) AS BIGINT)").collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getString(1)))
    val classes = cust.groupBy(_._1).view
      .mapValues(v => (v.length.toLong, v.map(_._2).distinct.length.toLong))
      .values.toSeq
    val nTot = classes.map(_._1).sum
    val byBucket = classes.groupBy { case (k, _) => math.min(k, 10L) }
    assert(got.map(_._1).toSet === byBucket.keySet)
    for ((kb, nCls, nRec, pct, minL, avgL) <- got) {
      val cls = byBucket(kb)
      assert(nCls === cls.size.toLong)
      assert(nRec === cls.map(_._1).sum)
      assert(pct === r6(cls.map(_._1).sum.toDouble / nTot))
      assert(minL === cls.map(_._2).min)
      assert(avgL === r6(cls.map(_._2).sum.toDouble / cls.size))
    }
    // every record is in exactly one bucket
    assert(got.map(_._3).sum === nTot)
  }

  test("st_page_hinkley: running-mean replay with exact decimal accumulation") {
    val got = graft.queries.StreamingGates.pageHinkley(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getTimestamp(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got.nonEmpty)
    val bars = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("event_type",
        "date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour",
        "CAST(value AS DECIMAL(38,12)) AS v")
      .groupBy("event_type", "hour")
      .agg(org.apache.spark.sql.functions.expr(
        "CAST(round(round(CAST(SUM(v) AS DOUBLE) / COUNT(*), 6) * 1e6) AS BIGINT) AS b6"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
    for ((t, nHours, peakHour, phBar, phRel) <- got) {
      val series = bars.filter(_._1 == t).sortBy(_._2.getTime)
      assert(nHours === series.length.toLong)
      val s6 = series.map(_._3).sum
      var sc = 0L
      var m = BigDecimal(0)
      var runmin = BigDecimal(0)
      var best: (BigDecimal, java.sql.Timestamp) = null
      for (((_, h, b6), idx) <- series.zipWithIndex) {
        sc += b6
        val dev = BigDecimal(b6.toDouble - sc.toDouble / (idx + 1))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
        m += dev
        if (idx == 0 || m < runmin) runmin = m
        val ph = m - runmin
        if (best == null || ph > best._1) best = (ph, h)
      }
      assert(peakHour === best._2, s"$t peak hour")
      assert(math.abs(phBar - r6((best._1 / BigDecimal(1e6)).toDouble)) < 1e-9,
        s"$t ph_bar")
      assert(math.abs(phRel -
        r6((best._1.toDouble * series.length / s6))) < 6e-7, s"$t ph_rel")
    }
  }

  test("ops_gumbel_moments: brute block-maxima moment replay") {
    val got = graft.queries.StatTests.gumbelMoments(spark, dir).collect()
    assert(got.length === 1)
    val r = got(0)
    val maxima = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("date_trunc('month', CAST(o_orderdate AS DATE)) AS mo",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS c").collect()
      .map(x => (x.get(0).toString, x.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).max).values.toSeq
    val n = maxima.length
    assert(r.getLong(0) === n.toLong && n > 1)
    val sx = maxima.sum
    val sxx = maxima.map(m => m * m).sum
    val mean = sx.toDouble / n
    val sd = math.sqrt((sxx.toDouble - mean * mean * n) / (n - 1))
    val beta = sd * math.sqrt(6.0) / math.Pi
    val mu = mean - 0.5772156649015329 * beta
    def rl(p: Double) = (mu - beta * math.log(-math.log(p))) / 100.0
    assert(math.abs(r.getDouble(1) - mean / 100.0) < 1e-6)
    assert(math.abs(r.getDouble(2) - sd / 100.0) < 1e-6)
    assert(math.abs(r.getDouble(3) - beta / 100.0) < 1e-6)
    assert(math.abs(r.getDouble(4) - mu / 100.0) < 1e-6)
    assert(math.abs(r.getDouble(5) - rl(0.9)) < 1e-6)
    assert(math.abs(r.getDouble(6) - rl(0.99)) < 1e-6)
    // Gumbel orderings that must hold by construction
    assert(r.getDouble(6) > r.getDouble(5), "rl99 > rl90")
    assert(r.getDouble(3) > 0 && r.getDouble(2) > 0)
  }

  test("ops_best_split: exhaustive threshold sweep replays the stump") {
    val got = graft.queries.StatTests.bestSplit(spark, dir).collect()
    assert(got.length === 1)
    val r = got(0)
    val rows = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("CAST(round(o_totalprice * 100) AS BIGINT) DIV 1000000 AS bin",
        "CASE WHEN CAST(substr(o_orderpriority, 1, 1) AS INT) <= 2 THEN 1 ELSE 0 END AS pos")
      .collect().map(x => (x.getLong(0), x.getInt(1).toLong))
    val nn = rows.length.toLong
    val pp = rows.map(_._2).sum
    val byBin = rows.groupBy(_._1).view
      .mapValues(v => (v.length.toLong, v.map(_._2).sum)).toMap
    def gini(n: Long, p: Long): Double = {
      val q = n - p
      (n.toDouble * n - p.toDouble * p - q.toDouble * q) / (nn.toDouble * n)
    }
    var best: (Double, Long, Long, Long) = null // (g, bin, nl, pl)
    var nl = 0L; var pl = 0L
    for (b <- byBin.keys.toSeq.sorted) {
      nl += byBin(b)._1; pl += byBin(b)._2
      if (nl < nn) {
        val g = gini(nl, pl) + gini(nn - nl, pp - pl)
        if (best == null || g < best._1) best = (g, b, nl, pl)
      }
    }
    assert(r.getLong(0) === best._2, "split_bin")
    assert(r.getLong(1) === (best._2 + 1) * 10000L)
    assert(r.getLong(2) === best._3 && r.getLong(3) === nn - best._3)
    assert(r.getLong(4) === best._4 && r.getLong(5) === pp - best._4)
    val gRoot = (nn.toDouble * nn - pp.toDouble * pp -
      (nn - pp).toDouble * (nn - pp)) / (nn.toDouble * nn)
    assert(math.abs(r.getDouble(6) - gRoot) < 6e-7)
    assert(math.abs(r.getDouble(7) - best._1) < 6e-7)
    assert(math.abs(r.getDouble(8) - (gRoot - best._1)) < 6e-7)
    // splitting never increases weighted Gini
    assert(r.getDouble(8) >= 0.0)
  }

  test("ops_raking: IPF replay converges column margins to the customer targets") {
    val got = graft.queries.DataOps.raking(spark, dir).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.nonEmpty)
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .selectExpr("c_custkey", "c_mktsegment",
        "CAST(c_nationkey AS BIGINT)").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val custMap = cust.map(c => c._1 -> (c._2, c._3)).toMap
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("o_custkey").collect().map(r => custMap(r.getLong(0)))
    val cells = orders.groupBy(identity).view.mapValues(_.length.toLong)
      .toMap
    val nOrd = orders.length.toLong
    val nCust = cust.length.toLong
    val segT = cust.groupBy(_._2).view
      .mapValues(_.length.toDouble * nOrd / nCust).toMap
    val natT = cust.groupBy(_._3).view
      .mapValues(_.length.toDouble * nOrd / nCust).toMap
    var w = cells.map { case (k, n) => k -> n.toDouble }
    def marginSum(vals: Iterable[Double]): Double =
      vals.map(v => BigDecimal(v).setScale(12, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
    for (_ <- 1 to 3) {
      val rs = w.groupBy(_._1._1).view.mapValues(m => marginSum(m.values)).toMap
      w = w.map { case (k, v) => k -> v * segT(k._1) / rs(k._1) }
      val csm = w.groupBy(_._1._2).view.mapValues(m => marginSum(m.values)).toMap
      w = w.map { case (k, v) => k -> v * natT(k._2) / csm(k._2) }
    }
    assert(got.keySet === cells.keySet)
    for ((k, (n, wGot, fGot)) <- got) {
      assert(n === cells(k))
      assert(math.abs(wGot - w(k)) < 6e-6, s"$k weight")
      assert(math.abs(fGot - w(k) / cells(k)) < 6e-6, s"$k factor")
    }
    // the final step was the column step: nation margins match targets
    for ((nat, t) <- natT) {
      val achieved = w.collect { case ((_, n2), v) if n2 == nat => v }.sum
      assert(math.abs(achieved - t) < 1e-6 * math.max(t, 1.0), s"nation $nat margin")
    }
  }

  test("ops_mutual_info: brute contingency replay and the MI bounds") {
    val got = graft.queries.StatTests.mutualInfo(spark, dir).collect()
    assert(got.length === 1)
    val r = got(0)
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .selectExpr("c_custkey", "c_mktsegment").collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    val pairs = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("o_custkey", "o_orderpriority").collect()
      .map(x => (cust(x.getLong(0)), x.getString(1)))
    val n = pairs.length.toDouble
    val cells = pairs.groupBy(identity).view.mapValues(_.length).toMap
    val rows = pairs.groupBy(_._1).view.mapValues(_.length).toMap
    val cols = pairs.groupBy(_._2).view.mapValues(_.length).toMap
    val mi = cells.map { case ((sg, pr), c) =>
      c / n * math.log(c * n / (rows(sg).toDouble * cols(pr)))
    }.sum
    def ent(m: Map[String, Int]) =
      -m.values.map(v => v / n * math.log(v / n)).sum
    assert(r.getLong(0) === pairs.length.toLong)
    assert(r.getLong(1) === cells.size.toLong)
    assert(math.abs(r.getDouble(2) - mi) < 6e-6, s"mi ${r.getDouble(2)} vs $mi")
    assert(math.abs(r.getDouble(3) - ent(rows)) < 6e-6)
    assert(math.abs(r.getDouble(4) - ent(cols)) < 6e-6)
    assert(math.abs(r.getDouble(5) -
      mi / math.sqrt(ent(rows) * ent(cols))) < 6e-6)
    // information-theoretic bounds
    assert(r.getDouble(2) >= -1e-9)
    assert(r.getDouble(2) <= math.min(r.getDouble(3), r.getDouble(4)) + 1e-9)
  }

  test("ta_fightin_words: brute log-odds replay picks the same distinctive terms") {
    val got = graft.queries.TextScores.fightinWords(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getString(5))).toSeq
    assert(got.size === 40)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("lang = 'en'", "lower(text)").collect()
      .map(r => (r.getBoolean(0), r.getString(1)))
    val counts = scala.collection.mutable.Map[String, (Long, Long)]()
      .withDefaultValue((0L, 0L))
    for ((isA, text) <- docs; w <- text.split(" ", -1)) {
      val (a, b) = counts(w)
      counts(w) = if (isA) (a + 1, b) else (a, b + 1)
    }
    val na = counts.values.map(_._1).sum.toDouble
    val nb = counts.values.map(_._2).sum.toDouble
    val cc = na + nb
    val a0 = 1000.0
    def zOf(ya: Long, yb: Long): (Double, Double) = {
      val alpha = a0 * (ya + yb) / cc
      val d = math.log((ya + alpha) / (na + a0 - ya - alpha)) -
        math.log((yb + alpha) / (nb + a0 - yb - alpha))
      val z = d / math.sqrt(1.0 / (ya + alpha) + 1.0 / (yb + alpha))
      (r6(d), r6(z))
    }
    val scored = counts.toSeq.map { case (w, (ya, yb)) =>
      val (d, z) = zOf(ya, yb); (w, ya, yb, d, z)
    }
    val top = scored.sortBy(x => (-x._5, x._1)).take(20)
      .map(x => (x._1, x._2, x._3, x._4, x._5, "en"))
    val bot = scored.sortBy(x => (x._5, x._1)).take(20)
      .map(x => (x._1, x._2, x._3, x._4, x._5, "rest"))
    val expect = (top ++ bot)
      .sortBy(x => (-x._5, x._1, x._6))
    assert(got === expect)
  }
}
