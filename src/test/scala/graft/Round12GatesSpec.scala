package graft

import graft.queries.{DataOps, Graph, LlmCuration, LlmVectors, StatOps, StreamingGates}
import org.apache.spark.sql.functions._

/** Driver-side reference checks for the round-12 gates, on the
  * house pattern: every oracle-gated query also proves its algebra
  * against an independently-coded reference at sf0.001, so a shared
  * mistake both engines would replay identically still fails.
  */
class Round12GatesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("st_runs_test: runs count and z replay a driver-side sweep") {
    val got = StreamingGates.runsTest(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(5))).toSeq
    assert(got.nonEmpty)
    // reference: collect the bars, dichotomize, count runs in order
    val bars = graft.queries.StreamingGates.hourlyBars(spark, dir)
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2)))
      .groupBy(_._1)
    for ((typ, nRuns, nAbove, nBelow, z) <- got) {
      val series = bars(typ).sortBy(_._2.getTime).map(_._3)
      val med = {
        val s = series.sorted
        val n = s.length
        val m = if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
        BigDecimal(m).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      val signs = series.filter(_ != med).map(_ > med)
      val refRuns = if (signs.isEmpty) 0
        else 1 + signs.sliding(2).count(p => p.length == 2 && p(0) != p(1))
      val refAbove = signs.count(identity)
      assert((nRuns, nAbove, nBelow) === ((refRuns.toLong, refAbove.toLong,
        (signs.length - refAbove).toLong)), s"type $typ")
      val n1 = refAbove.toDouble; val n2 = (signs.length - refAbove).toDouble
      val n = n1 + n2
      val e = 2 * n1 * n2 / n + 1
      val v = 2 * n1 * n2 * (2 * n1 * n2 - n) / (n * n * (n - 1))
      val zRaw = (refRuns - e) / math.sqrt(v)
      val refZ = BigDecimal(zRaw)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(z - refZ) < 2e-6, s"type $typ: z $z vs ref $refZ")
      assert(RoundingAudit.safe6(zRaw), s"type $typ: z sits on a rounding boundary")
    }
  }

  test("gr_harmonic: equals a driver-side 2-hop BFS over the support graph") {
    val got = Graph.harmonic(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    val edges = Graph.supportEdges(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    for ((node, n1, n2, hc) <- got) {
      val h1 = adj(node)
      val h2 = h1.flatMap(adj(_)) -- h1 - node
      assert(n1 === h1.size.toLong, s"node $node n1")
      assert(n2 === h2.size.toLong, s"node $node n2")
      assert(hc === (2 * h1.size + h2.size) / 2.0, s"node $node hc")
    }
  }

  test("ta_heaps_fit: sane Heaps exponents and an exact doc count per lang") {
    val got = LlmCuration.heapsFit(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(4)))
    assert(got.nonEmpty)
    val docCounts = Tables.t(spark, dir, "documents")
      .groupBy(col("lang")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, nDocs, beta, r2) <- got) {
      assert(nDocs === docCounts(lang))
      // natural-text vocabulary growth is sublinear but real
      assert(beta > 0.0 && beta < 1.0, s"$lang beta=$beta")
      assert(r2 >= 0.0 && r2 <= 1.0 + 1e-9, s"$lang r2=$r2")
    }
  }

  test("ops_elasticity: OLS replays a driver-side reference per brand") {
    val got = StatOps.elasticity(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(4)))
    assert(got.nonEmpty)
    val li = Tables.t(spark, dir, "lineitem")
      .select(col("l_partkey"), expr("CAST(round(l_quantity) AS BIGINT)").as("u"))
      .groupBy(col("l_partkey")).agg(sum(col("u")).as("q")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pts = Tables.t(spark, dir, "part")
      .select(col("p_partkey"), col("p_brand"),
        expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("c")).collect()
      .flatMap(r => li.get(r.getLong(0)).map(q =>
        (r.getString(1), math.log(r.getLong(2).toDouble), math.log(q.toDouble))))
      .groupBy(_._1)
    for ((brand, nParts, slope, r2) <- got) {
      val xs = pts(brand).map(_._2); val ys = pts(brand).map(_._3)
      assert(nParts === xs.length.toLong, s"$brand n")
      val n = xs.length.toDouble
      val cov = n * xs.zip(ys).map(p => p._1 * p._2).sum - xs.sum * ys.sum
      val vx = n * xs.map(x => x * x).sum - xs.sum * xs.sum
      assert(math.abs(slope - cov / vx) < 1e-4, s"$brand slope")
      assert(r2 >= 0.0 && r2 <= 1.0 + 1e-9, s"$brand r2")
      assert(RoundingAudit.safe6(cov / vx), s"$brand slope on a rounding boundary")
    }
  }

  test("gr_ktruss: fixed rounds reach the true fixpoint; support >= k-2 holds") {
    val got = Graph.kTruss(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty, "k-truss is degenerate at spec scale")
    // reference: peel to the TRUE fixpoint on the collected graph
    var und = Graph.supportEdges(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).filter(p => p._1 < p._2).toSet
    def support(es: Set[(Long, Long)]): Map[(Long, Long), Int] = {
      val adj = (es ++ es.map(_.swap)).groupBy(_._1)
        .map { case (k, v) => k -> v.map(_._2) }
      es.iterator.map { case (u, v) =>
        (u, v) -> (adj(u) intersect adj(v)).size
      }.toMap
    }
    var changed = true
    while (changed) {
      val sup = support(und)
      val next = und.filter(e => sup(e) >= 1)
      changed = next != und
      und = next
    }
    assert(got.map(e => (e._1, e._2)).toSet === und,
      "fixed-rounds truss != true fixpoint (raise TrussRounds)")
    val finalSup = support(und)
    for ((u, v, s) <- got) {
      assert(s === finalSup((u, v)).toLong, s"support of ($u,$v)")
      assert(s >= 1L, s"edge ($u,$v) in truss with zero support")
    }
  }

  test("st_rolling_p95: saturated windows agree with a driver-side trailing percentile") {
    val got = StreamingGates.rollingP95(spark, dir).collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(3), r.getDouble(4)))
    assert(got.nonEmpty)
    val bars = StreamingGates.hourlyBars(spark, dir).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getDouble(2)))
      .groupBy(_._1)
    def p95(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val rank = 0.95 * (s.length - 1)
      val lo = s(rank.toInt)
      val hi = s(math.min(rank.toInt + 1, s.length - 1))
      val v = lo + (rank - rank.toInt) * (hi - lo)
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    for ((typ, hour, nw, p) <- got) {
      val h = hour.getTime
      val window = bars(typ)
        .filter(b => b._2 <= h && b._2 > h - 24L * 3600000L).map(_._3)
      assert(nw === window.length.toLong, s"$typ $hour window size")
      assert(math.abs(p - p95(window)) < 2e-6, s"$typ $hour p95")
    }
  }

  test("st_attrib_position: credits sum to ~1 per purchase, U-shape end weights") {
    val got = StreamingGates.attribPosition(spark, dir).collect()
      .map(r => (r.getLong(1), r.getInt(3).toLong, r.getLong(4), r.getDouble(5)))
    assert(got.nonEmpty)
    for ((pid, rows) <- got.groupBy(_._1)) {
      val k = rows.head._3
      assert(rows.length.toLong === k, s"purchase $pid touch count")
      val total = rows.map(_._4).sum
      assert(math.abs(total - 1.0) < 1e-4, s"purchase $pid credits sum $total")
      if (k >= 3) {
        val byPos = rows.map(r => r._2 -> r._4).toMap
        assert(byPos(1L) === 0.4 && byPos(k) === 0.4, s"purchase $pid ends")
        assert(rows.filter(r => r._2 > 1 && r._2 < k)
          .forall(r => math.abs(r._4 - 0.2 / (k - 2)) < 1e-5), s"purchase $pid mids")
      }
    }
    // the touch SET matches the raw attribution gate's
    val raw = StreamingGates.attributionBatch(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    val mine = StreamingGates.attribPosition(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(mine === raw)
  }

  test("ta_bigram_novelty: first doc is fully novel; a driver recount agrees on a sample") {
    val got = LlmCuration.bigramNovelty(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(got.nonEmpty)
    assert(got.head._4 === 1.0, "first document must be 100% novel")
    // driver recount over the full corpus, checked on every 25th doc
    val docs = Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val seen = scala.collection.mutable.Set.empty[String]
    val ref = docs.map { case (id, text) =>
      val toks = text.split(" ")
      val bgs = toks.sliding(2).filter(_.length == 2)
        .map(a => a(0) + " " + a(1)).toSet
      val novel = bgs.count(!seen(_))
      seen ++= bgs
      id -> (bgs.size.toLong, novel.toLong)
    }.toMap
    for ((id, nb, nn, nov) <- got if id % 25 == 0) {
      assert((nb, nn) === ref(id), s"doc $id counts")
      val expect = BigDecimal(nn.toDouble / nb)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(nov === expect, s"doc $id novelty")
    }
  }

  test("st_cusum2: level 1 equals the single-shift locator; segments partition the series") {
    val got = StreamingGates.cusum2(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getTimestamp(3), r.getDouble(4)))
    assert(got.nonEmpty)
    val single = StreamingGates.cusumShift(spark, dir).collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2))).toSeq
    val l1 = got.filter(_._2 == 1).map(r => (r._1, r._4, r._5)).toSeq
    assert(l1.sortBy(_._1) === single.sortBy(_._1),
      "level-1 must equal the cusumShift gate")
    // each type has exactly one 'all', one 'left', one 'right' row
    for ((typ, rows) <- got.groupBy(_._1)) {
      assert(rows.map(r => (r._2, r._3)).toSet ===
        Set((1, "all"), (2, "left"), (2, "right")), s"type $typ segments")
      val all = rows.find(_._2 == 1).get._4
      val left = rows.find(r => r._3 == "left").get._4
      val right = rows.find(r => r._3 == "right").get._4
      assert(!left.after(all), s"type $typ: left locator beyond the split")
      assert(right.after(all), s"type $typ: right locator not after the split")
    }
  }

  test("ta_js_divergence: bounds hold and one pair replays driver-side") {
    val got = LlmCuration.jsDivergence(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    val ln2 = math.log(2.0)
    for ((a, b, _, jsd) <- got) {
      assert(a < b, "pairs must be ordered once")
      assert(jsd >= 0.0 && jsd <= ln2 + 1e-9, s"($a,$b) jsd=$jsd out of [0, ln2]")
    }
    // driver replay of the first pair
    val (sa, sb, v, jsd) = got.head
    val cnt = Tables.t(spark, dir, "documents")
      .filter(col("source").isin(sa, sb))
      .select(col("source"), explode(split(col("text"), " ")).as("t"))
      .groupBy(col("source"), col("t")).agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val vocab = cnt.keys.map(_._2).toSet
    assert(v === vocab.size.toLong)
    val na = cnt.collect { case ((s, _), c) if s == sa => c }.sum
    val nb = cnt.collect { case ((s, _), c) if s == sb => c }.sum
    val terms = vocab.toSeq.map { t =>
      val p = (cnt.getOrElse((sa, t), 0L) + 1).toDouble / (na + vocab.size)
      val q = (cnt.getOrElse((sb, t), 0L) + 1).toDouble / (nb + vocab.size)
      val m = (p + q) / 2
      p * math.log(p / m) + q * math.log(q / m)
    }
    val ref = terms.sum / 2
    assert(math.abs(jsd - ref) < 1e-5, s"jsd $jsd vs driver $ref")
  }

  test("sim_ann_recall: matches a recall recomputed from the two gated lists") {
    val got = LlmVectors.annRecall(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    val exact = LlmVectors.topkExact(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
    val ann = LlmVectors.annTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
    for ((q, hits, recall) <- got) {
      val ex = exact(q).map(_._2).toSet
      val an = ann.get(q).map(_.map(_._2).toSet).getOrElse(Set.empty)
      assert(hits === (ex intersect an).size.toLong, s"q $q hits")
      assert(recall === BigDecimal(hits.toDouble / ex.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, s"q $q recall")
      assert(recall >= 0.0 && recall <= 1.0)
    }
  }

  test("ops_gains_curve: monotone shares reaching 1, lift decreasing to 1") {
    val got = StatOps.gainsCurve(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).sortBy(_._1)
    assert(got.length === 10)
    // cumulative shares are non-decreasing and end at exactly 1
    assert(got.map(_._4).sliding(2).forall(p => p(0) <= p(1) + 1e-9))
    assert(got.last._4 === 1.0 && got.last._5 === 1.0)
    assert(got.last._6 === 1.0, "final lift must be exactly 1 (everyone targeted)")
    // internal consistency: share columns replay from the counts
    val tUsers = got.map(_._2).sum; val tResp = got.map(_._3).sum
    var cu = 0L; var cr = 0L
    for ((_, nu, re, rs, us, _) <- got) {
      cu += nu; cr += re
      assert(rs === BigDecimal(cr.toDouble / tResp)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(us === BigDecimal(cu.toDouble / tUsers)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("ops_churn_fit: OLS replays driver-side from the retention grid") {
    val got = StatOps.churnFit(spark, dir).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty, "no cohort with >= 3 weeks at spec scale")
    val grid = StreamingGates.retentionBatch(spark, dir).collect()
      .map(r => (r.getDate(0).toString,
        (r.getDate(1).toLocalDate.toEpochDay -
          r.getDate(0).toLocalDate.toEpochDay) / 7, r.getLong(2)))
      .groupBy(_._1)
    for ((cw, nWeeks, decay) <- got) {
      val pts = grid(cw).map(p => (p._2.toDouble, math.log(p._3.toDouble)))
      assert(nWeeks === pts.length.toLong)
      val n = pts.length.toDouble
      val cov = n * pts.map(p => p._1 * p._2).sum - pts.map(_._1).sum * pts.map(_._2).sum
      val vx = n * pts.map(p => p._1 * p._1).sum - math.pow(pts.map(_._1).sum, 2)
      assert(math.abs(decay - cov / vx) < 1e-4, s"cohort $cw decay")
      assert(RoundingAudit.safe6(cov / vx), s"cohort $cw decay on a rounding boundary")
    }
  }

  test("ops_seasonality_strength: bounded in [0,1] and SS identity holds") {
    val got = StatOps.seasonalityStrength(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.nonEmpty)
    for ((typ, ssh, ssr, st) <- got) {
      assert(st >= 0.0 && st <= 1.0, s"$typ strength $st")
      assert(ssh >= 0.0 && ssr >= 0.0)
      // strength replays from the (rounded) SS columns within rounding slop
      assert(math.abs(st - ssh / (ssh + ssr)) < 1e-4, s"$typ identity")
    }
  }

  test("ops_price_index: base month is exactly 1, Fisher between Laspeyres and Paasche") {
    val got = DataOps.priceIndex(spark, dir).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).sortBy(_._1)
    assert(got.length >= 2, "need at least two months for an index")
    val (_, _, l0, p0, f0) = got.head
    assert(l0 === 1.0 && p0 === 1.0 && f0 === 1.0, "base month must index at 1")
    for ((m, n, l, p, f) <- got) {
      assert(n > 0, s"$m empty basket")
      assert(l > 0 && p > 0, s"$m non-positive index")
      // Fisher is the geometric mean: strictly between (or equal to)
      // its two factors
      assert(f >= math.min(l, p) - 1e-6 && f <= math.max(l, p) + 1e-6,
        s"$m fisher $f outside [$l, $p]")
    }
  }

  test("sim_mmr_rerank: the unrolled picks replay a driver-side greedy MMR") {
    val got = LlmVectors.mmrRerank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byQ = got.groupBy(_._1)
    assert(byQ.nonEmpty)
    // reference: greedy over the same round-6 candidate relation
    val emb = Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos6(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map(p => p._1 * p._2).sum
      val c = d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    for ((q, picks) <- byQ) {
      val ranked = picks.sortBy(_._2).map(_._3)
      assert(ranked.distinct.length === ranked.length, s"q $q dup picks")
      // candidate pool: top-10 by rounded cosine, vec_id tie-break
      val pool = emb.keys.filter(_ != q).toSeq
        .map(v => (v, cos6(emb(v), emb(q))))
        .sortBy { case (v, c) => (-c, v) }.take(10)
      val poolMap = pool.toMap
      var picked = Vector.empty[Long]
      for (_ <- 1 to ranked.length) {
        val remaining = pool.filterNot(p => picked.contains(p._1))
        val next = remaining.map { case (v, rel) =>
          val ms = if (picked.isEmpty) 0.0
            else picked.map(p => cos6(emb(v), emb(p))).max
          (v, rel - ms)
        }.minBy { case (v, margin) =>
          (-BigDecimal(margin).setScale(9, BigDecimal.RoundingMode.HALF_UP)
            .toDouble, v)
        }._1
        picked :+= next
      }
      assert(ranked.toVector === picked, s"q $q: $ranked vs $picked")
      assert(ranked.forall(poolMap.contains), s"q $q pick outside pool")
    }
  }

  test("ta_readability: scores replay a driver-side syllable count") {
    val got = graft.queries.TextScores.readability(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5),
        r.getDouble(6))).toSeq
    assert(got.nonEmpty)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val vg = "[aeiouy]+".r
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for ((id, nW, nSyl, ease, fk) <- got) {
      val toks = docs(id).toLowerCase.split(" ", -1)
      val refSyl = toks.map(t => math.max(1, vg.findAllIn(t).length)).map(_.toLong).sum
      assert(nW === toks.length.toLong, s"doc $id words")
      assert(nSyl === refSyl, s"doc $id syllables")
      val spw = refSyl.toDouble / toks.length
      assert(ease === r6(206.835 - 1.015 * toks.length - 84.6 * spw), s"doc $id ease")
      assert(fk === r6(0.39 * toks.length + 11.8 * spw - 15.59), s"doc $id fk")
    }
  }

  test("ta_rake_keywords: top phrases replay a driver-side RAKE pass") {
    val got = graft.queries.TextScores.rakeKeywords(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length === 25)
    val stops = Set("the", "a", "of", "and", "in", "to")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("text").collect().map(_.getString(0))
    // the in-band split device assumes the delimiter never appears in
    // a corpus token (ADVICE r12) — assert it, don't hope
    assert(!docs.exists(_.contains(graft.queries.TextScores.PhraseDelim)),
      "documents.text contains the RAKE phrase delimiter \\u0007 — " +
        "pick a different delimiter in TextScores.phrases")
    // candidate phrases: maximal stopword-free runs over lowercased text
    val phrases = docs.flatMap { t =>
      val runs = scala.collection.mutable.Buffer.empty[Vector[String]]
      var cur = Vector.empty[String]
      for (w <- t.toLowerCase.split(" ", -1)) {
        if (stops(w)) { if (cur.nonEmpty) runs += cur; cur = Vector.empty }
        else cur :+= w
      }
      if (cur.nonEmpty) runs += cur
      runs
    }
    val deg = scala.collection.mutable.Map.empty[String, Long]
    val freq = scala.collection.mutable.Map.empty[String, Long]
    for (p <- phrases; w <- p) {
      deg(w) = deg.getOrElse(w, 0L) + p.length
      freq(w) = freq.getOrElse(w, 0L) + 1L
    }
    // ADVICE r12: mirror the gate's DOUBLE arithmetic exactly — Spark
    // rounds the binary double (BigDecimal.valueOf semantics), so the
    // replay must divide in Double too, not in exact decimals, or a
    // decimal-halfway quotient flakes the === compare
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val wscore = deg.keys.map(w =>
      w -> r6(deg(w).toDouble / freq(w).toDouble)).toMap
    val byPhrase = phrases.groupBy(_.mkString(" "))
    val scored = byPhrase.map { case (ph, occs) =>
      // the gate sums round-6 word scores as DECIMAL(38,12) (exact for
      // 6-dp inputs), then divides as DOUBLE
      val sumWs = occs.flatMap(_.map(w => BigDecimal(wscore(w)))).sum
      (ph, occs.head.length.toLong, occs.length.toLong,
        r6(sumWs.toDouble / occs.length))
    }.toSeq
    val refTop = scored.sortBy { case (ph, _, _, sc) => (-sc, ph) }.take(25)
    assert(got.toSeq === refTop)
  }
}
