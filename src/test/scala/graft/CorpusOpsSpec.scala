package graft

import graft.queries.{DataOps, LlmCuration, TrainingPrep}
import org.apache.spark.sql.functions._

/** Invariants for the round-8 corpus-statistics operators — the
  * properties their DuckDB oracles can't express: CDC boundary
  * resynchronization under prefix shifts, fuzzy-link blocking
  * soundness, and vocabulary-statistic algebra.
  */
class CorpusOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("ngram_shingles: matches a reference sliding-window set on random token arrays") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val rnd = new scala.util.Random(42)
    val docs = (0 until 50).map { i =>
      val n = rnd.nextInt(30) // includes < width arrays (empty shingle set)
      (i.toLong, (0 until n).map(_ => s"w${rnd.nextInt(6)}").mkString(" "))
    }
    for (width <- Seq(2, 4, 7)) {
      val got = docs.toDF("doc_id", "text")
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .select(col("doc_id"), call_function("ngram_shingles", col("tk"), lit(width)))
        .collect()
        .groupBy(_.getLong(0))
        .view.mapValues(rs => (rs.head.getInt(1), rs.map(_.getString(2)).toSet)).toMap
      docs.foreach { case (id, text) =>
        val tk = if (text.isEmpty) Array.empty[String] else text.split(" ")
        val want = tk.sliding(width).filter(_.length == width)
          .map(_.mkString(" ")).toSet
        val (nSh, shs) = got.getOrElse(id, (0, Set.empty[String]))
        assert(shs == want, s"doc $id width $width: $shs != $want")
        assert(nSh == want.size, s"doc $id width $width: n_sh $nSh != ${want.size}")
      }
    }
  }

  test("PSI drift: non-negative, equals a driver-side reference computation") {
    val sf01 = "/root/testdata/sf0.01"
    val rows = DataOps.psiDrift(spark, sf01).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(1) >= 0.0, r.toString))
    // reference PSI for one type, same construction
    val all = Tables.t(spark, sf01, "events")
      .select(col("event_type"), round(col("value") * 100).cast("long").as("b"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val t = rows.head.getString(0)
    val own = all.filter(_._1 == t).map(_._2.toDouble).sorted
    val rest = all.filter(_._1 != t).map(_._2.toDouble).sorted
    def pct(v: Array[Double], q: Double): Double = {
      val pos = q * (v.length - 1)
      val (lo, hi) = (math.floor(pos).toInt, math.ceil(pos).toInt)
      math.rint((v(lo) + (v(hi) - v(lo)) * (pos - lo)) * 1e6) / 1e6
    }
    val fences = (1 to 9).map(k => pct(rest, k / 10.0))
    def bins(v: Array[Double]) =
      v.groupBy(x => fences.count(x > _)).view.mapValues(_.length).toMap
    val (bo, br) = (bins(own), bins(rest))
    val psi = (0 until 10).map { i =>
      val p = (bo.getOrElse(i, 0) + 1).toDouble / (own.length + 10)
      val q = (br.getOrElse(i, 0) + 1).toDouble / (rest.length + 10)
      (p - q) * math.log(p / q)
    }.sum
    val got = rows.find(_.getString(0) == t).get.getDouble(1)
    assert(math.abs(got - psi) < 1e-5, s"$t: psi $got vs reference $psi")
  }

  test("KS drift: stat in [0,1], equals a driver-side exact two-sample KS per type") {
    val sf01 = "/root/testdata/sf0.01"
    val rows = DataOps.ksDrift(spark, sf01).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0, r.toString))
    // driver-side reference: exact D = max |ECDF_s - ECDF_rest| over
    // the same centi-unit buckets
    val all = Tables.t(spark, sf01, "events")
      .select(col("event_type"), round(col("value") * 100).cast("long").as("b"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val buckets = all.map(_._2).distinct.sorted
    rows.foreach { r =>
      val t = r.getString(0)
      val mine = all.filter(_._1 == t).map(_._2)
      val rest = all.filter(_._1 != t).map(_._2)
      val d = buckets.map { thr =>
        val fs = mine.count(_ <= thr).toDouble / mine.length
        val fr = rest.count(_ <= thr).toDouble / rest.length
        math.abs(fs - fr)
      }.max
      assert(math.abs(r.getDouble(2) - d) < 1e-5,
        s"$t: ks ${r.getDouble(2)} vs reference $d")
    }
  }

  test("zipf fit: negative slope, r2 in (0,1], equals a driver-side OLS") {
    val rows = LlmCuration.zipfFit(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) < 0, s"zipf slope must be negative: $r")
      val r2 = r.getDouble(4)
      assert(r2 > 0.0 && r2 <= 1.0 + 1e-9, s"r2 out of range: $r")
    }
    // driver-side reference OLS over one language's (rank, freq) table
    val lang = rows.head.getString(0)
    val freqs = Tables.t(spark, dir, "documents")
      .filter(col("lang") === lang)
      .select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, c) => (-c, t) }
    val xs = freqs.indices.map(i => math.log(i + 1.0))
    val ys = freqs.map(f => math.log(f._2.toDouble))
    val n = xs.length.toDouble
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val got = rows.find(_.getString(0) == lang).get.getDouble(2)
    assert(math.abs(got - slope) < 1e-4, s"$lang slope $got vs reference $slope")
  }

  test("lag autocorrelation: values in [-1,1]; the diurnal synthetic data correlates at lag 24") {
    val rows = graft.queries.StreamingGates.lagAutocorr(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ac = r.getDouble(3)
      assert(ac >= -1.0 - 1e-9 && ac <= 1.0 + 1e-9, r.toString)
      assert(r.getLong(2) > 0)
    }
    assert(rows.map(_.getInt(1)).toSet == Set(1, 24))
  }

  test("temperature mixture flattens: shares sum to 1, factors cross 1 in the right direction") {
    val rows = LlmCuration.temperatureMix(spark, dir).collect()
    assert(rows.nonEmpty)
    def spread(c: String) = {
      val v = rows.map(_.getAs[Double](c)); v.max / v.min
    }
    // α < 1 compresses the share ratio — the operator's whole point
    assert(spread("temp_share") < spread("share"),
      s"temperature failed to flatten: ${spread("temp_share")} !< ${spread("share")}")
    assert(math.abs(rows.map(_.getAs[Double]("temp_share")).sum - 1.0) < 1e-3)
    // below-average sources upsample (factor > 1), above-average downsample
    val mean = 1.0 / rows.length
    rows.foreach { r =>
      val (p, f) = (r.getAs[Double]("share"), r.getAs[Double]("sample_factor"))
      if (p < mean * 0.8) assert(f > 1.0, s"low-resource not upsampled: $r")
      if (p > mean * 1.2) assert(f < 1.0, s"high-resource not downsampled: $r")
    }
  }

  test("CUSUM locator finds a planted level shift at the exact boundary hour") {
    import spark.implicits._
    // 100 hourly bars at level 10.0, then 100 at 12.0: max |cusum| of
    // (b - mean) lands exactly at the last pre-shift hour (index 99)
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val bars = (0 until 200).map { h =>
      ("shifted", new java.sql.Timestamp(t0.getTime + h * 3600L * 1000),
        if (h < 100) 10.0 else 12.0)
    }.toDF("event_type", "hour", "bar")
    val rows = graft.queries.StreamingGates.cusumOverBars(bars).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getTimestamp(1).getTime == t0.getTime + 99 * 3600L * 1000,
      s"shift located at ${r.getTimestamp(1)}, expected hour 99")
    // magnitude: at the boundary, cusum = 100 * (10 - 11) = -100 units
    assert(math.abs(r.getDouble(2) - 100.0) < 1e-6, r.toString)
    // and the corpus gate is well-formed
    val gate = graft.queries.StreamingGates.cusumShift(spark, dir).collect()
    assert(gate.nonEmpty)
    gate.foreach(g => assert(g.getDouble(2) >= 0.0))
  }

  test("rendezvous sharding: 8→9 moves only the new shard's winners (~1/9), nothing else") {
    val at8 = DataOps.shardAssignN(spark, dir, 8).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val at9 = DataOps.shardAssignN(spark, dir, 9).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(at8.keySet == at9.keySet)
    // balance at 8: no shard more than 2x the uniform share
    val byShard = at8.values.groupBy(identity).view.mapValues(_.size)
    assert(byShard.size == 8 && byShard.values.max <= at8.size / 8 * 2,
      s"unbalanced: ${byShard.toMap}")
    val moved = at8.keys.filter(d => at8(d) != at9(d)).toSeq
    // THE rendezvous property: a doc moves iff the NEW shard (8) wins
    // its rendezvous — movers all land on 8, stayers keep their shard
    moved.foreach(d => assert(at9(d) == 8,
      s"doc $d moved to ${at9(d)}, not the new shard — HRW violated"))
    val frac = moved.size.toDouble / at8.size
    assert(frac > 0.03 && frac < 0.25,
      s"moved fraction $frac implausible for 1/9 expectation")
  }

  test("ccnet buckets: per-lang terciles balanced, head scores >= tail scores, full cover") {
    val rows = LlmCuration.ccnetBuckets(spark, dir).collect()
    assert(rows.nonEmpty)
    val nDocs = Tables.t(spark, dir, "documents").count()
    assert(rows.length == nDocs, "every document must land in a band")
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val byBand = rs.groupBy(_.getAs[String]("band")).view.mapValues(_.length)
      assert(byBand.keySet.subsetOf(Set("head", "middle", "tail")))
      // ntile(3): band sizes differ by at most 1
      if (rs.length >= 3) {
        assert(byBand.values.max - byBand.values.min <= 1,
          s"$lang terciles unbalanced: ${byBand.toMap}")
        // band assignment must be monotone in the score
        val minHead = rs.filter(_.getAs[String]("band") == "head")
          .map(_.getAs[Double]("avg_ll")).min
        val maxTail = rs.filter(_.getAs[String]("band") == "tail")
          .map(_.getAs[Double]("avg_ll")).max
        assert(minHead >= maxTail, s"$lang head/tail overlap: $minHead < $maxTail")
      }
    }
  }

  test("seasonal naive: daily cycle beats persistence on the synthetic diurnal data") {
    val rows = graft.queries.StreamingGates.seasonalNaive(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_eval") > 0)
      assert(r.getAs[Double]("mae_naive") >= 0 && r.getAs[Double]("mae_seasonal") >= 0)
      val mase = r.getAs[java.lang.Double]("mase")
      if (mase != null) assert(mase > 0, r.toString)
    }
  }

  test("vocab stats: ratios bounded, hapax <= vocab <= tokens, all langs present") {
    val rows = LlmCuration.vocabStats(spark, dir).collect()
    assert(rows.map(_.getAs[String]("lang")).toSet === Set("en", "fr", "es", "de", "zh"))
    rows.foreach { r =>
      val (v, t, h) = (r.getAs[Long]("vocab_size"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("hapax_cnt"))
      assert(h <= v && v <= t, r.toString)
      Seq("hapax_ratio", "top_share", "type_token_ratio").foreach { c =>
        val x = r.getAs[Double](c)
        assert(x >= 0.0 && x <= 1.0, s"$c out of range: $r")
      }
    }
  }

  /** The property fixed-window chunking lacks and CDC exists to
    * provide: insert a prefix, and after the first boundary the chunk
    * stream realigns, so the shared suffix dedups against the
    * unshifted original.
    */
  test("CDC chunking resynchronizes after a prefix insertion") {
    val text = ("alpha beta gamma delta " * 24).trim // 96 tokens
    val shifted = "zig zag zog " + text
    val tmp = tmpDir("cdc")
    val docs = Seq((1L, text), (2L, shifted))
    spark.createDataFrame(docs).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val hits = TrainingPrep.cdcChunk(spark, tmp).collect()
    // the two docs must share at least one identical chunk spanning
    // both (n_docs == 2): the boundary positions depend only on token
    // CONTENT, so the 3-token offset cannot keep the streams apart
    assert(hits.exists(_.getAs[Long]("n_docs") == 2L),
      s"no cross-doc chunk survived the shift: ${hits.mkString("; ")}")
  }

  test("CDC chunking is total for single-token documents (no reversed sequence read)") {
    // sequence(2, 1) reverses to [2, 1] — unguarded, element_at(tk, 2)
    // on a 1-token doc is an out-of-bounds read (a crash under ANSI
    // mode). The doc must flow through as one un-deduped chunk.
    val tmp = tmpDir("cdc1")
    val docs = Seq((1L, "solo"), (2L, "solo"), (3L, "alpha beta"))
    spark.createDataFrame(docs).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val hits = TrainingPrep.cdcChunk(spark, tmp).collect()
    // the two 1-token docs share the identical chunk "solo"
    assert(hits.exists(r => r.getAs[Long]("n_tokens") == 1L &&
      r.getAs[Long]("n_docs") == 2L), s"1-token chunk lost: ${hits.mkString("; ")}")
  }

  test("CDC chunks partition each document: token counts re-add to doc length") {
    // over the real corpus: sum of chunk tokens (INCLUDING singletons,
    // so rebuild without the >1 filter) equals total corpus tokens
    val docs = Tables.t(spark, dir, "documents")
    val total = docs.select(sum(size(split(col("text"), " ")))).head.getLong(0)
    val tk = col("tk")
    val n = size(tk)
    val starts = concat(array(lit(1)),
      filter(sequence(lit(2), n), i =>
        substring(md5(element_at(tk, i).cast("binary")), 1, 1).isin("0", "1")))
    val ends = concat(slice(starts, lit(2), size(starts) - 1), array(n + 1))
    val chunks = zip_with(starts, ends, (st, en) => en - st)
    val chunked = docs.select(split(col("text"), " ").as("tk"))
      .select(explode(chunks).as("len"))
      .agg(sum(col("len"))).head.getLong(0)
    assert(chunked === total, s"chunks must partition tokens: $chunked vs $total")
  }

  test("weighted sample: length-biased — sampled docs are longer than the corpus mean") {
    val sf01 = "/root/testdata/sf0.01"
    val sampled = LlmCuration.weightedSample(spark, sf01)
      .agg(avg(col("n_chars"))).head.getDouble(0)
    val corpus = Tables.t(spark, sf01, "documents")
      .agg(avg(col("n_chars"))).head.getDouble(0)
    // A-ES by n_chars makes longer docs proportionally likelier; on
    // this fixed corpus + fixed hash the gap is deterministic and wide
    assert(sampled > corpus,
      s"weighting must bias the sample long: sampled=$sampled corpus=$corpus")
    // exactly k per group, ranks contiguous
    val perGroup = LlmCuration.weightedSample(spark, sf01)
      .groupBy(col("source")).agg(count(lit(1)).as("n"), max(col("sample_rank")).as("mx"))
      .collect()
    perGroup.foreach { r =>
      assert(r.getAs[Long]("n") === 8L && r.getAs[Long]("mx") === 8L, r.toString)
    }
  }

  test("Benford screen: complete digit grid, fractions sum to 1, chi2 matches a driver reference") {
    val rows = DataOps.benford(spark, "/root/testdata/sf0.01").collect()
    val byFlag = rows.groupBy(_.getString(0))
    byFlag.foreach { case (flag, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq === (1 to 9), s"$flag: digit grid incomplete")
      assert(rs.map(_.getLong(2)).sum === rs.head.getLong(3), s"$flag: counts must sum to total")
      val fracSum = rs.map(_.getDouble(4)).sum
      assert(math.abs(fracSum - 1.0) < 1e-4, s"$flag: obs_frac sums to $fracSum")
      rs.foreach(r => assert(r.getDouble(6) >= 0.0, s"chi2 part negative: $r"))
    }
    // driver-side reference on one flag: first digit from the cents string
    val flag = byFlag.keys.min
    val prices = Tables.t(spark, "/root/testdata/sf0.01", "lineitem")
      .filter(col("l_returnflag") === flag).select(col("l_extendedprice"))
      .collect().map(_.getDouble(0))
    val wantCounts = prices.map(p => math.rint(p * 100).toLong.toString.head.asDigit)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    byFlag(flag).foreach { r =>
      assert(r.getLong(2) === wantCounts.getOrElse(r.getInt(1), 0L), r.toString)
    }
    // the synthetic uniform prices must FAIL Benford loudly — the screen detects
    assert(rows.map(_.getDouble(6)).sum > 100.0, "uniform prices must not conform")
  }

  test("MAD anomaly screen: flags agree with the 3-MAD rule, medians are genuine medians") {
    import graft.queries.StreamingGates
    val rows = StreamingGates.madAnomaly(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (t, rs) =>
      val med = rs.head.getDouble(3)
      val mad = rs.head.getDouble(4)
      // median property: at least half the bars on each side (within rounding)
      val below = rs.count(_.getDouble(2) <= med)
      val above = rs.count(_.getDouble(2) >= med)
      assert(below >= rs.length / 2 && above >= rs.length / 2, s"$t: med=$med not a median")
      rs.foreach { r =>
        val dev = math.rint(math.abs(r.getDouble(2) - med) * 1e6) / 1e6
        assert(r.getBoolean(6) === (dev > mad * 3), s"flag mismatch: $r")
        if (mad > 0)
          assert(math.abs(r.getDouble(5) - math.rint(dev / mad * 1e6) / 1e6) < 1e-9, r.toString)
      }
    }
    // non-degenerate on this corpus: both flagged and unflagged bars exist
    assert(rows.exists(_.getBoolean(6)) && rows.exists(!_.getBoolean(6)))
  }

  test("fuzzy link: pairs stay inside their block, ordered, within distance") {
    val rows = DataOps.fuzzyLink(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty, "the fuzzy matcher must find catalog near-names")
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("name_a"), r.getAs[String]("name_b"))
      assert(a < b, "canonical pair order")
      assert(a.split(" ")(1) === b.split(" ")(1), "block key (noun) must agree")
      assert(r.getAs[Long]("dist") <= 2L)
      assert(a.split(" ")(0) !== b.split(" ")(0), "identical names can't pair (a<b)")
    }
  }
}
