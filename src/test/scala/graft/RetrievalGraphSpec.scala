package graft

import graft.queries.{Graph, Retrieval, StreamingGates}
import org.apache.spark.sql.functions._

/** Invariants of the round-8 retrieval/graph/time-series operators —
  * the DuckDB gates pin exact values at sf0.01; these pin the
  * PROPERTIES that make each operator what it claims to be, at
  * sf0.001.
  */
class RetrievalGraphSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("BM25: ranks are contiguous from 1 per query, scores positive and non-increasing") {
    val rows = Retrieval.bm25TopK(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("qterm")).foreach { case (q, rs) =>
      val byRank = rs.sortBy(_.getAs[Int]("rank"))
      assert(byRank.map(_.getAs[Int]("rank")).toSeq == (1 to byRank.length),
        s"ranks not contiguous for $q")
      val scores = byRank.map(_.getAs[Double]("bm25"))
      assert(scores.forall(_ > 0), s"non-positive BM25 score for $q")
      // non-increasing in rank order (ties broken by doc_id)
      scores.sliding(2).foreach { case Array(a, b) => assert(a >= b) case _ => }
    }
  }

  test("hybrid RRF: scores rebuild from the rank columns; exemplar tops its query's fusion") {
    val rows = Retrieval.hybridRrf(spark, dir).collect()
    assert(rows.nonEmpty)
    val lexTop = Retrieval.bm25TopK(spark, dir).collect()
      .filter(_.getAs[Int]("rank") == 1)
      .map(r => r.getAs[String]("qterm") -> r.getAs[Long]("doc_id")).toMap
    rows.groupBy(_.getString(0)).foreach { case (q, rs) =>
      val byRank = rs.sortBy(_.getAs[Int]("rank"))
      assert(byRank.map(_.getAs[Int]("rank")).toSeq === (1 to byRank.length),
        s"$q: fused ranks not contiguous")
      byRank.foreach { r =>
        val lex = Option(r.getAs[Integer]("lex_rank")).map(_.toInt)
        val sem = Option(r.getAs[Integer]("sem_rank")).map(_.toInt)
        assert(lex.nonEmpty || sem.nonEmpty, s"$q: row in neither list: $r")
        val want = lex.map(k => 1.0 / (60 + k)).getOrElse(0.0) +
          sem.map(k => 1.0 / (60 + k)).getOrElse(0.0)
        assert(math.abs(r.getAs[Double]("rrf") - math.rint(want * 1e6) / 1e6) < 1e-9,
          s"$q: rrf mismatch $r vs $want")
      }
      // fused scores non-increasing in rank order
      byRank.map(_.getAs[Double]("rrf")).sliding(2).foreach {
        case Array(a, b) => assert(a >= b, s"$q: fusion not sorted"); case _ =>
      }
      // the exemplar is lex#1 AND sem#1 (cosine with itself) — the
      // maximum achievable RRF score, so it must lead the fusion
      val top = byRank.head
      assert(top.getAs[Long]("doc_id") === lexTop(q), s"$q: exemplar not on top")
      assert(top.getAs[Integer]("lex_rank") === 1 &&
        top.getAs[Integer]("sem_rank") === 1, s"$q: exemplar list ranks: $top")
    }
  }

  test("BM25: a doc with more occurrences of the query term outranks fewer, same length") {
    // synthetic check of the core monotonicity: tf up → score up,
    // holding dl and df fixed (two docs, same length, different tf)
    import spark.implicits._
    val docs = Seq(
      (1L, "apple apple apple pear plum"),
      (2L, "apple pear plum peach grape")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("tmp_bm25_docs")
    // score formula mirror at k1=1.2, b=0.75, N=2, df=2, dl=avgdl=5:
    // score(tf) = ln(1 + (N-df+.5)/(df+.5)) * tf*2.2/(tf+1.2)
    def score(tf: Double) = math.log((2 - 2 + 0.5) / (2 + 0.5) + 1) * tf * 2.2 / (tf + 1.2)
    assert(score(3) > score(1))
  }

  test("PageRank: mass is conserved within rounding and ranks are positive") {
    val rows = Graph.pageRank(spark, dir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("rank")).sum
    // fixed-point floor division loses up to ~1 unit per EDGE per
    // iteration (the outdeg split) plus a few per node — measured
    // ~4k units on 160 nodes / 5 iters. 1 ppm of total mass bounds it
    // with 2 orders of margin while still catching a real leak (a
    // dropped node or mis-damped iteration shifts whole percents).
    val scale = 1000000000000L
    assert(total <= scale, "mass exceeds the invariant total")
    assert(total > scale - scale / 1000000L, s"mass leaked beyond flooring: $total vs $scale")
    rows.foreach(r => assert(r.getAs[Long]("rank") > 0))
  }

  test("PageRank: node set is customers ∪ suppliers of the trade graph, constant across iterations") {
    val rows = Graph.pageRank(spark, dir).collect()
    val kinds = rows.map(_.getAs[String]("kind")).toSet
    assert(kinds == Set("customer", "supplier"))
    // every supplier trades (TPC-H referential integrity) so all 10
    // sf0.001 suppliers must rank
    assert(rows.count(_.getAs[String]("kind") == "supplier") == 10)
  }

  test("OHLC: low <= open/close <= high, counts positive, bars keyed uniquely") {
    val rows = StreamingGates.ohlcBars(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (o, h, l, c) = (r.getAs[Double]("open"), r.getAs[Double]("high"),
        r.getAs[Double]("low"), r.getAs[Double]("close"))
      assert(l <= o && o <= h, s"open outside [low, high]: $r")
      assert(l <= c && c <= h, s"close outside [low, high]: $r")
      assert(r.getAs[Long]("n_events") > 0)
    }
    val keys = rows.map(r => (r.getAs[String]("event_type"), r.get(1)))
    assert(keys.distinct.length == keys.length, "duplicate bars")
  }

  test("k-hop BFS: bipartite parity per hop, seeds are the min-nation suppliers") {
    val rows = Graph.kHop(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val hop = r.getAs[Long]("hop")
      assert(hop >= 0 && hop <= 3)
      // the trade graph is bipartite: even hops land on suppliers
      // (the seed side), odd hops on customers
      val expected = if (hop % 2 == 0) "supplier" else "customer"
      assert(r.getAs[String]("kind") == expected, s"parity violated: $r")
    }
    val seeds = rows.filter(_.getAs[Long]("hop") == 0L).map(_.getAs[Long]("key")).toSet
    val sup = Tables.t(spark, dir, "supplier")
    val seedNation = sup.agg(min(col("s_nationkey"))).head()
      .get(0).asInstanceOf[Number].longValue
    val expectedSeeds = sup.filter(col("s_nationkey") === seedNation)
      .select(col("s_suppkey").cast("long")).collect().map(_.getLong(0)).toSet
    assert(seeds == expectedSeeds, "hop-0 set is not the seed set")
  }

  test("top paths: at most 10 rows, counts positive and non-increasing") {
    val rows = StreamingGates.topPaths(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.forall(_ > 0))
    ns.sliding(2).foreach { case Array(a, b) => assert(a >= b) case _ => }
  }

  test("association rules: lift is symmetric, confidence bounded, support <= confidence") {
    val rows = graft.queries.Basket.assocRules(spark, dir).collect()
    assert(rows.nonEmpty)
    val byPair = rows.map(r => (r.getAs[String]("ante"), r.getAs[String]("cons")) -> r).toMap
    rows.foreach { r =>
      val (a, c) = (r.getAs[String]("ante"), r.getAs[String]("cons"))
      val conf = r.getAs[Double]("confidence")
      assert(conf > 0 && conf <= 1, s"confidence out of range: $r")
      assert(r.getAs[Double]("support") <= conf + 1e-9, s"support > confidence: $r")
      // lift(a→b) = lift(b→a) by definition (n_ab·N / (n_a·n_b));
      // the reverse rule exists whenever the forward one does
      byPair.get((c, a)).foreach { rev =>
        assert(math.abs(r.getAs[Double]("lift") - rev.getAs[Double]("lift")) < 2e-6)
      }
    }
  }

  test("as-of tolerance: stale states null atomically, strictly more nulls than plain as-of") {
    val plain = graft.queries.AsOfJoin.eventsAsOfOrders(spark, dir).collect()
    val tol = graft.queries.AsOfJoin.eventsAsOfOrdersTolerance(spark, dir).collect()
    assert(plain.length == tol.length)
    val plainNulls = plain.count(_.isNullAt(plain.head.fieldIndex("last_order_price")))
    val tolNulls = tol.count(_.isNullAt(tol.head.fieldIndex("last_order_price")))
    // the bound must BITE (strictly more nulls) without nulling
    // everything (some state survives as fresh)
    assert(tolNulls > plainNulls, s"tolerance never fired: $tolNulls vs $plainNulls")
    assert(tolNulls < tol.length, "tolerance nulled every row — vacuous gate")
    // atomicity: date and price are null together, never half a state
    tol.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("last_order_date")) ==
        r.isNullAt(r.fieldIndex("last_order_price")), s"half-nulled state: $r")
    }
  }

  test("RFM: segments are well-formed and the corpus is non-degenerate across scores") {
    val rows = graft.queries.DataOps.rfmSegments(spark, dir).collect()
    assert(rows.nonEmpty)
    val seg = "R([123])F([123])M([123])".r
    rows.foreach { r =>
      assert(r.getAs[Long]("recency_days") >= 0)
      assert(r.getAs[Long]("frequency") > 0)
      r.getAs[String]("segment") match {
        case seg(_, _, _) => ()
        case other => fail(s"malformed segment: $other")
      }
    }
    // a threshold set that maps every user to one bucket would make
    // the gate pass on anything — require real spread
    assert(rows.map(_.getAs[String]("segment")).distinct.length > 1)
  }

  test("transition matrix: per-from probabilities sum to 1 within rounding") {
    val rows = StreamingGates.transitionMatrix(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (f, rs) =>
      val psum = rs.map(_.getAs[Double]("p")).sum
      assert(math.abs(psum - 1.0) < 1e-4, s"probabilities for $f sum to $psum")
    }
    // transition counts must equal events minus one per user (every
    // event except each user's last has a successor)
    val nTrans = rows.map(_.getAs[Long]("n")).sum
    val e = Tables.t(spark, dir, "events")
    val expected = e.count() - e.select(col("user_id")).distinct().count()
    assert(nTrans == expected, s"$nTrans transitions vs expected $expected")
  }
}
