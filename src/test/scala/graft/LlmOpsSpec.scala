package graft

import graft.queries.{LlmDedup, LlmVectors}
import org.apache.spark.sql.functions._

/** Specs for the approximate (non-oracle-gated) LLM-pipeline operators,
  * checked against their exact counterparts on sf0.001.
  */
class LlmOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("prefix-rerank: ordered top-k, exact cosines, per-rank dominance by brute force") {
    val exact = LlmVectors.topkExact(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(3)).toMap
    val cascade = LlmVectors.prefixRerank(spark, dir).collect()
    assert(cascade.nonEmpty)
    // within each query the cascade's ranks are contiguous 1..K with
    // non-increasing cosine — the rerank really is an ordered top-k
    cascade.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq === (1 to sorted.length))
      val cosines = sorted.map(_.getDouble(3)).toSeq
      assert(cosines === cosines.sorted.reverse)
    }
    // an approximate shortlist can never BEAT brute force at any rank
    // (these are true cosines of a corpus subset). NB: recall vs the
    // exact top-k is intentionally NOT asserted — the synthetic
    // embeddings are random, so a coordinate prefix is a weak proxy
    // (unlike trained Matryoshka embeddings, whose prefixes are
    // optimized to preserve similarity); the oracle already pins the
    // cascade's own semantics bit-exactly
    cascade.foreach { r =>
      val bf = exact((r.getLong(0), r.getInt(1)))
      assert(r.getDouble(3) <= bf + 1e-9,
        s"q=${r.getLong(0)} rank=${r.getInt(1)}: cascade ${r.getDouble(3)} beats exact $bf")
    }
  }

  test("common passages: every reported window really occurs in >= 2 docs, counts consistent") {
    val rows = LlmDedup.commonPassages(spark, dir).collect()
    assert(rows.nonEmpty) // the corpus's planted near-dups share windows
    rows.foreach { r =>
      val (nDocs, nOcc) = (r.getLong(1), r.getLong(2))
      assert(nDocs >= 2 && nOcc >= nDocs,
        s"gram '${r.getString(0)}': n_docs=$nDocs n_occurrences=$nOcc")
      assert(r.getString(0).split(' ').length === 8)
    }
    // spot re-check the top window against the raw corpus: its doc
    // count must equal a direct contains() scan (window strings are
    // space-joined, so contains can overmatch only across token
    // boundaries — the split-based recount avoids that)
    val top = rows.head.getString(0)
    val direct = graft.Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .collect()
      .count { r =>
        r.getString(1).split(' ').sliding(8).exists(_.mkString(" ") == top)
      }
    assert(direct.toLong === rows.head.getLong(1))
  }

  test("minhash-LSH pairs == exact ngram-jaccard pairs (full recall at J>=0.9)") {
    val exact = LlmDedup.ngramJaccard(spark, dir).collect().toSet
    val lsh = LlmDedup.minhashLsh(spark, dir).collect().toSet
    assert(exact.nonEmpty) // non-vacuous on the testdata
    assert(lsh === exact)
  }

  test("re-banded LSH (8x8): candidates subset of 16x4 semantics, high recall vs exact") {
    val exact = LlmDedup.ngramJaccard(spark, dir)
      .select("doc_a", "doc_b").collect().toSet
    val sharp = LlmDedup.minhashCandidates(spark, dir, bands = 8, rowsPerBand = 8)
      .collect().toSet
    val wide = LlmDedup.minhashCandidates(spark, dir).collect().toSet
    // sharper banding can only shrink the candidate set
    assert(sharp.subsetOf(wide))
    // and still recalls (deterministically, on this data) most J>=0.9 pairs
    val recalled = exact.count { p => sharp.contains(p) }
    assert(exact.isEmpty || recalled.toDouble / exact.size >= 0.8,
      s"8x8 recall ${recalled}/${exact.size}")
  }

  test("dedup clusters: paired docs share a cluster; rep is the min member") {
    val clusters = LlmDedup.dedupClusters(spark, dir).collect()
    val memberToRep = clusters.flatMap { r =>
      r.getString(2).split('|').map(m => m.toLong -> r.getLong(0))
    }.toMap
    clusters.foreach { r =>
      assert(r.getString(2).split('|').map(_.toLong).min === r.getLong(0))
    }
    val pairs = LlmDedup.ngramJaccard(spark, dir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(memberToRep(a) === memberToRep(b), s"pair ($a,$b) split across clusters")
    }
  }

  test("exact dedup: every doc accounted for, keeper is min id per key") {
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    val dd = LlmDedup.exactDedup(spark, dir)
    assert(dd.agg(sum("n_copies")).head().getLong(0) === total)
    assert(dd.filter(col("n_copies") > 1).count() > 0) // non-vacuous
    assert(dd.count() < total)
  }

  test("ANN-LSH: per-rank cosine never beats exact brute force, k rows max") {
    val exact = LlmVectors.topkExact(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(3)).toMap
    val ann = LlmVectors.annTopk(spark, dir).collect()
    assert(ann.nonEmpty)
    val perQuery = ann.groupBy(_.getLong(0))
    perQuery.values.foreach(rows => assert(rows.length <= 5))
    // dominance: ann's rank-r cosine <= exact's rank-r cosine (candidates
    // are a subset of the corpus, so rank-r can only be equal or worse)
    ann.foreach { r =>
      val key = (r.getLong(0), r.getInt(1))
      assert(exact.contains(key))
      assert(r.getDouble(3) <= exact(key) + 1e-9,
        s"ann rank ${r.getInt(1)} for q${r.getLong(0)} beats exact")
    }
    // recall@5 on this data should be well above random (16-bucket bands)
    val exactSets = LlmVectors.topkExact(spark, dir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val annSets = ann.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val recalls = exactSets.map { case (q, ex) =>
      annSets.getOrElse(q, Set.empty[Long]).intersect(ex).size.toDouble / ex.size
    }
    assert(recalls.sum / recalls.size > 0.2,
      s"mean recall ${recalls.sum / recalls.size} too low")
  }

  test("PQ-ADC: k rows max per query, recall beats random, estimator is an IP proxy") {
    val pq = LlmVectors.pqAdcTopk(spark, dir).collect()
    assert(pq.nonEmpty)
    val perQuery = pq.groupBy(_.getLong(0))
    assert(perQuery.size == 8, "all 8 queries answered")
    perQuery.values.foreach(rows => assert(rows.length <= 5))
    // ground truth for MIPS is exact INNER-PRODUCT top-5 (PQ-ADC
    // approximates dot products, not cosines — no dominance property:
    // reconstruction error can overshoot)
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def ip(a: Array[Double], b: Array[Double]): Double =
      a.lazyZip(b).map(_ * _).sum
    val exactSets = (0L until 8L).map { q =>
      q -> vecs.filter(_._1 != q)
        .map { case (v, e) => (v, ip(vecs(q), e)) }
        .toSeq.sortBy(x => (-x._2, x._1)).take(5).map(_._1).toSet
    }.toMap
    val pqSets = perQuery.view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val recalls = exactSets.map { case (q, ex) =>
      pqSets.getOrElse(q, Set.empty[Long]).intersect(ex).size.toDouble / ex.size
    }
    // random recall@5 over ~100 candidates is ~0.05; the 8-byte code
    // (1-step Lloyd on a 25-vector subsample at this sf) measured 0.225
    assert(recalls.sum / recalls.size > 0.1,
      s"mean PQ recall ${recalls.sum / recalls.size} not above random")
  }

  test("IVFPQ: per-rank ADC dominance vs full-corpus PQ (candidate subset, same estimator)") {
    val full = LlmVectors.pqAdcTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(3)).toMap
    val pruned = LlmVectors.ivfPqTopk(spark, dir).collect()
    assert(pruned.nonEmpty)
    pruned.groupBy(_.getLong(0)).values.foreach(rows => assert(rows.length <= 5))
    // IVFPQ scores the SAME ADC estimator over the probed-cells subset
    // of the corpus, so its rank-r approximate IP can never beat the
    // full scan's rank-r
    pruned.foreach { r =>
      val key = (r.getLong(0), r.getInt(1))
      assert(full.contains(key))
      assert(r.getDouble(3) <= full(key) + 1e-9,
        s"ivfpq rank ${r.getInt(1)} for q${r.getLong(0)} beats the full ADC scan")
    }
  }

  test("IVF top-k: per-rank dominance vs exact, k rows max, decent recall") {
    val exact = LlmVectors.topkExact(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(3)).toMap
    val ivf = LlmVectors.ivfTopk(spark, dir).collect()
    assert(ivf.nonEmpty)
    ivf.groupBy(_.getLong(0)).values.foreach(rows => assert(rows.length <= 5))
    ivf.foreach { r =>
      val key = (r.getLong(0), r.getInt(1))
      assert(exact.contains(key))
      assert(r.getDouble(3) <= exact(key) + 1e-9)
    }
    val exactSets = LlmVectors.topkExact(spark, dir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val ivfSets = ivf.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val recalls = exactSets.map { case (q, ex) =>
      ivfSets.getOrElse(q, Set.empty[Long]).intersect(ex).size.toDouble / ex.size
    }
    assert(recalls.sum / recalls.size > 0.3,
      s"mean IVF recall ${recalls.sum / recalls.size} too low")
  }

  test("containment is directional: a strict sub-document contains at 1.0 one way only") {
    // the case symmetric Jaccard structurally misses: doc 1 embedded
    // verbatim inside a 5x larger doc 2 (J ~= 0.18 — invisible at any
    // near-dup threshold; containment 1->2 is exactly 1.0)
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val small = (1 to 10).map(i => s"w$i").mkString(" ")
    val tail = (1 to 40).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, small), (2L, s"$small $tail")).toDF("doc_id", "text")
    val sh = docs.select(col("doc_id"), split(col("text"), " ").as("tk"))
      .select(col("doc_id"), call_function("ngram_shingles", col("tk"), lit(4)))
      .select(col("doc_id"), col("n_sh"), xxhash64(col("sh")).as("sh"))
    val rows = graft.queries.LlmDedup.containmentFromShingles(sh).collect()
    assert(rows.length == 1, s"expected only the 1->2 direction: ${rows.mkString(";")}")
    val r = rows.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-9, s"sub-document must contain at 1.0: $r")
    // corpus gate sanity: directional rows, containment in (0.8, 1.0]
    val cont = graft.queries.LlmDedup.containmentPairs(spark, dir).collect()
    assert(cont.nonEmpty)
    cont.foreach { c =>
      val v = c.getDouble(2)
      assert(v > 0.8 - 1e-9 && v <= 1.0 + 1e-9, s"containment out of band: $c")
    }
  }

  test("IVF delta ingest: recall parity with the full rebuild; assignment touches only the delta") {
    // VERDICT r9 #4: the frozen-codebook index (centroids trained on
    // the existing 90%, delta assigned without retraining) must search
    // as well as the rebuilt index — FAISS's add-after-train contract
    val rebuilt = LlmVectors.ivfTopk(spark, dir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val delta = LlmVectors.ivfDeltaTopk(spark, dir).collect()
    assert(delta.nonEmpty)
    delta.groupBy(_.getLong(0)).values.foreach(rows => assert(rows.length <= 5))
    val deltaSets = delta.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val parity = rebuilt.map { case (q, full) =>
      deltaSets.getOrElse(q, Set.empty[Long]).intersect(full).size.toDouble / full.size
    }
    assert(parity.sum / parity.size > 0.6,
      s"frozen-centroid top-k diverged from the rebuild: mean overlap ${parity.sum / parity.size}")
    // and vs ground truth: within a modest margin of the rebuild's recall
    val exactSets = LlmVectors.topkExact(spark, dir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    def recall(sets: Map[Long, Set[Long]]) = {
      val rs = exactSets.map { case (q, ex) =>
        sets.getOrElse(q, Set.empty[Long]).intersect(ex).size.toDouble / ex.size }
      rs.sum / rs.size
    }
    assert(recall(deltaSets) >= recall(rebuilt) - 0.2,
      s"delta recall ${recall(deltaSets)} vs rebuild ${recall(rebuilt)}")
    // the ingest pass is delta-sized: one code row per delta vector,
    // none for the existing corpus
    val nDelta = Tables.t(spark, dir, "embeddings")
      .filter(org.apache.spark.sql.functions.expr("vec_id % 10 = 0")).count()
    assert(LlmVectors.ivfDeltaCodes(spark, dir).count() == nDelta,
      "delta ingest must assign exactly the delta vectors")
  }

  test("semdedup keep rule: one keeper per cluster, keeper is the min-centroid-sim member") {
    val rows = LlmVectors.semdedupKeep(spark, dir).collect()
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_.getLong(1))
    byCluster.foreach { case (c, members) =>
      val keepers = members.filter(_.getBoolean(3))
      assert(keepers.length == 1, s"cluster $c keeps ${keepers.length}")
      // paper's rule: lowest centroid similarity wins (vec_id tiebreak)
      val best = members.minBy(m => (m.getDouble(2), m.getLong(0)))
      assert(keepers.head.getLong(0) == best.getLong(0),
        s"cluster $c kept ${keepers.head.getLong(0)}, rule says ${best.getLong(0)}")
    }
    // every near-dup pair shares a cluster; singletons are their own
    val cl = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    LlmVectors.embedNearDup(spark, dir).collect().foreach { p =>
      assert(cl(p.getLong(0)) == cl(p.getLong(1)),
        s"pair (${p.getLong(0)},${p.getLong(1)}) split across clusters")
    }
  }

  test("embed near-dup: subset of exact >=0.4 pairs with exact cosines") {
    val pairs = LlmVectors.embedNearDup(spark, dir).collect()
    assert(pairs.nonEmpty)
    // brute-force ground truth in-process (500 vecs, fine for a test)
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS e").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    pairs.foreach { r =>
      val (a, b, c) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(a < b)
      val truth = cos(vecs(a), vecs(b))
      assert(truth >= 0.4 - 1e-9)
      assert(math.abs(c - truth) < 1e-5, s"pair ($a,$b): $c vs $truth")
    }
  }

  test("stratified sample hits per-class rates; membership is re-runnable") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sample = graft.queries.LlmCuration.stratifiedSample(spark, dir)
    def byLang(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val all = byLang(docs); val got = byLang(sample.toDF())
    // zh kept whole; en near 25%; binomial tolerance on a small corpus
    assert(got("zh") === all("zh"))
    val enRate = got("en").toDouble / all("en")
    assert(enRate > 0.05 && enRate < 0.50, s"en rate $enRate")
    // deterministic: a second derivation is identical row-for-row
    assert(sample.collect().toSeq ===
      graft.queries.LlmCuration.stratifiedSample(spark, dir).collect().toSeq)
  }

  test("split-leak pairs are exactly the near-dup pairs that cross the hash split") {
    val leaks = graft.queries.LlmCuration.splitLeak(spark, dir)
      .select("doc_a", "doc_b").collect().toSet
    val pairs = LlmDedup.ngramJaccard(spark, dir).select("doc_a", "doc_b").collect().toSet
    assert(leaks.subsetOf(pairs))
    assert(leaks.nonEmpty, "fixture should surface at least one cross-split near-dup")
    // every same-side pair is excluded
    assert(graft.queries.LlmCuration.splitLeak(spark, dir)
      .filter(col("side_a") === col("side_b")).count() === 0)
  }

  test("cluster queries leave no persisted storage behind (VERDICT r3 #4)") {
    spark.catalog.clearCache()
    // localCheckpoint blocks are reclaimed by the ContextCleaner on GC
    // (asynchronously) — settle until the count is stable across a GC
    // cycle before reading it
    def storageCount: Int = {
      var prev = -1
      var cur = spark.sparkContext.getPersistentRDDs.size
      var i = 0
      while (cur != prev && i < 20) {
        prev = cur
        System.gc()
        Thread.sleep(100)
        cur = spark.sparkContext.getPersistentRDDs.size
        i += 1
      }
      cur
    }
    def run(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Int = {
      fn(spark, dir).collect()
      storageCount
    }
    // first call may populate the documented shingle memo (a single
    // MEMORY_AND_DISK entry, evicted by clearCache/session stop); the
    // iterative loops' own frames must all be released, so REPEATED
    // calls cannot grow executor storage. Each leaked round would pin
    // ~4 checkpoint entries per call; the +2 slack only absorbs the
    // ContextCleaner's one-GC-cycle lag, not a real leak.
    val after1 = run(graft.queries.LlmDedup.dedupClusters)
    val counts = Seq(
      run(graft.queries.LlmDedup.dedupClusters),
      run(graft.queries.LlmDedup.dedupClusters),
      run(graft.queries.LlmDedup.dedupClustersMinLabel),
      run(graft.queries.LlmDedup.dedupClustersMinLabel))
    assert(counts.last <= after1 + 2 && counts.max <= after1 + 2,
      s"cluster queries accumulate storage: $after1 -> $counts")
    spark.catalog.clearCache()
    // the ContextCleaner reclaims blocks asynchronously; on a loaded box
    // the stability heuristic above can settle on a nonzero count before
    // the cleaner's queue drains (ADVICE r5) — poll for the exact zero
    // with a generous deadline instead of reusing the heuristic
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    var n = spark.sparkContext.getPersistentRDDs.size
    while (n != 0 && System.nanoTime() < deadline) {
      System.gc(); Thread.sleep(250)
      n = spark.sparkContext.getPersistentRDDs.size
    }
    assert(n === 0, "clearCache must release the shingle memo too")
  }

  test("ANN plans never cross-join the corpus; topk broadcasts the query side") {
    val annPlan = LlmVectors.annTopk(spark, dir).queryExecution.executedPlan.toString
    assert(!annPlan.contains("CartesianProduct"))
    val topkPlan = LlmVectors.topkExact(spark, dir).queryExecution.executedPlan.toString
    assert(topkPlan.contains("BroadcastNestedLoopJoin"))
    val nearDupPlan = LlmVectors.embedNearDup(spark, dir).queryExecution.executedPlan.toString
    assert(!nearDupPlan.contains("CartesianProduct"))
    // the corpus×centroid assignment pass IS a BNLJ — against the
    // broadcast K≈√n centroid index, never corpus×corpus (see
    // PlanAuditSpec.bnljAllowed); pair formation is an equi-join on cell
    assert(nearDupPlan.contains("BroadcastNestedLoopJoin"))
  }
}
